"""XOR float codec (Gorilla-family, byte-aligned, split-stream) — the
lightweight-compression scheme for float64 columns (metrics, sensor
values): XOR each value with its predecessor, then store only the
significant bytes of the XOR delta.  Slowly-drifting series XOR to values
with many leading/trailing zero BYTES, so most deltas need 0-3 payload
bytes.

Unlike classic Gorilla's bit-granular sequential coder, this variant is
byte-aligned and SPLIT-STREAM — ``[n:u64][control bytes x n][payload]``
where control = ``(trailing_zero_bytes << 4) | n_significant_bytes`` —
so both encode and decode are fully vectorizable: payload offsets are a
cumsum over the control stream, byte scatter/gather is fancy indexing,
and the XOR prefix undo is ``np.bitwise_xor.accumulate``.  No per-value
Python, no bit twiddling loops.

This codec is deliberately NOT in the format REGISTRY: the on-disk format's
type system mirrors the reference's DataType (ints + strings,
src/lib.rs:59-66 — floats are not representable there), so the float codec
is a TRANSPORT-level tool for Ray pipeline batches carrying float columns,
with its own roundtrip contract (bit-identical, NaN/inf/-0.0 included).
"""

from __future__ import annotations

import numpy as np

_MAGIC = 0xF10A  # stream sanity word


def encode(vals: np.ndarray) -> bytes:
    """float64 ndarray -> bytes; bit-exact roundtrip with :func:`decode`
    (NaN payloads, infinities and signed zeros survive — everything is
    uint64 bit patterns, float semantics never touch the path)."""
    v = np.ascontiguousarray(vals, dtype=np.float64)
    u = v.view(np.uint64)
    n = u.size
    x = np.empty(n, dtype=np.uint64)
    if n:
        x[0] = u[0]
        np.bitwise_xor(u[1:], u[:-1], out=x[1:])
    b = x.view(np.uint8).reshape(n, 8) if n else \
        np.zeros((0, 8), dtype=np.uint8)
    nz = b != 0
    any_nz = nz.any(axis=1)
    tz = np.where(any_nz, nz.argmax(axis=1), 0).astype(np.uint8)
    top = np.where(any_nz, 7 - nz[:, ::-1].argmax(axis=1), 0)
    nsig = np.where(any_nz, top - tz + 1, 0).astype(np.uint8)
    control = ((tz << 4) | nsig).astype(np.uint8)
    # segmented gather of each row's significant bytes
    total = int(nsig.sum())
    row = np.repeat(np.arange(n, dtype=np.int64), nsig)
    ends = np.cumsum(nsig.astype(np.int64))
    starts = ends - nsig
    intra = np.arange(total, dtype=np.int64) - np.repeat(starts, nsig)
    payload = b[row, tz[row].astype(np.int64) + intra]
    header = np.array([_MAGIC, n], dtype=np.uint64).view(np.uint8)
    return header.tobytes() + control.tobytes() + payload.tobytes()


def decode(buf: bytes) -> np.ndarray:
    raw = np.frombuffer(buf, dtype=np.uint8)
    head = raw[:16].view(np.uint64)
    if head[0] != _MAGIC:
        raise ValueError("xorfloat: bad magic")
    n = int(head[1])
    control = raw[16:16 + n]
    tz = (control >> 4).astype(np.int64)
    nsig = (control & 0x0F).astype(np.int64)
    payload = raw[16 + n:]
    total = int(nsig.sum())
    if payload.size != total:
        raise ValueError("xorfloat: truncated payload")
    b = np.zeros((n, 8), dtype=np.uint8)
    row = np.repeat(np.arange(n, dtype=np.int64), nsig)
    ends = np.cumsum(nsig)
    starts = ends - nsig
    intra = np.arange(total, dtype=np.int64) - np.repeat(starts, nsig)
    b[row, tz[row] + intra] = payload
    x = b.reshape(-1).view(np.uint64)
    u = np.bitwise_xor.accumulate(x)
    return u.view(np.float64).copy()


def encoded_size(vals: np.ndarray) -> int:
    """Exact encoded byte count without materializing the stream."""
    v = np.ascontiguousarray(vals, dtype=np.float64)
    u = v.view(np.uint64)
    n = u.size
    x = np.empty(n, dtype=np.uint64)
    if n:
        x[0] = u[0]
        np.bitwise_xor(u[1:], u[:-1], out=x[1:])
    b = x.view(np.uint8).reshape(n, 8) if n else \
        np.zeros((0, 8), dtype=np.uint8)
    nz = b != 0
    any_nz = nz.any(axis=1)
    tz = np.where(any_nz, nz.argmax(axis=1), 0)
    top = np.where(any_nz, 7 - nz[:, ::-1].argmax(axis=1), 0)
    nsig = np.where(any_nz, top - tz + 1, 0)
    return 16 + n + int(nsig.sum())
