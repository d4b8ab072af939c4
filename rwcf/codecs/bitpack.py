"""Bit-packing codec (north-rule extension; not in the reference): fixed-width
LSB-first packing of the zigzag/unsigned value stream. Page layout:
``[width:u8][packed bits]`` with a fixed value count per page so pages decode
independently (page-parallel, unlike the reference's sequential reader,
src/decode.rs:52-66). All arithmetic stays in the column's native width —
an int32 token stream is never widened to int64, which halves memory traffic
on the hot path."""

from __future__ import annotations

import math

import numpy as np

from .. import format as fmt
from . import base

_UNSIGNED = {"u8": np.uint8, "i8": np.uint8, "u16": np.uint16, "i16": np.uint16,
             "u32": np.uint32, "i32": np.uint32, "u64": np.uint64, "i64": np.uint64}


def to_unsigned_native(vals: np.ndarray, dtype: str) -> np.ndarray:
    """Zigzag (signed) / reinterpret (unsigned) in the column's own width."""
    np_t = fmt.DTYPES[dtype][2]
    ut = _UNSIGNED[dtype]
    v = np.ascontiguousarray(vals, dtype=np_t)
    if fmt.is_signed(dtype):
        bits = np_t.itemsize * 8 - 1
        return ((v << 1) ^ (v >> bits)).view(ut)
    return v.view(ut)


def from_unsigned_native(u: np.ndarray, dtype: str) -> np.ndarray:
    np_t = fmt.DTYPES[dtype][2]
    ut = _UNSIGNED[dtype]
    u = u.astype(ut, copy=False)
    if fmt.is_signed(dtype):
        st = np.dtype(np_t)
        return ((u >> 1).view(st.type)) ^ -((u & 1).view(st.type))
    return u.view(np_t)


def _plan_values_per_page(global_width: int, page_target: int) -> int:
    if global_width == 0:
        return 1 << 20
    return max(1, (page_target * 8) // global_width)


def _encode_packed_pages(u: np.ndarray, page_target: int):
    """Shared by bitpack/dict: per-page width + packed payload."""
    n = u.size
    gw = base.bit_width(int(u.max())) if n else 0
    vpp = _plan_values_per_page(gw, page_target)
    chunks = []
    byte_lengths = []
    for s in range(0, max(n, 1), vpp):
        page_vals = u[s:s + vpp]
        if page_vals.size == 0:
            break
        w = base.bit_width(int(page_vals.max()))
        body = base.pack_bits(page_vals, w)
        chunks.append(np.concatenate(([np.uint8(w)], body)))
        byte_lengths.append(1 + body.size)
    payload = np.concatenate(chunks) if chunks else np.empty(0, dtype=np.uint8)
    pages = base.fixed_count_pages(n, vpp, byte_lengths)
    return payload, pages


def _decode_packed_pages(payload: np.ndarray, pages,
                         out_dtype=np.uint64) -> np.ndarray:
    outs = []
    for p in pages:
        w = int(payload[p.file_offset])
        body = payload[p.file_offset + 1: p.file_offset + p.byte_length]
        outs.append(base.unpack_bits(body, w, p.values_count, out_dtype))
    return np.concatenate(outs) if outs else np.empty(0, dtype=out_dtype)


class BitpackCodec(base.Codec):
    id = "bitpack"

    def supports(self, dtype: str) -> bool:
        return not fmt.is_string(dtype)

    def encode(self, chunk, dtype: str, page_target: int):
        u = to_unsigned_native(np.asarray(chunk), dtype)
        payload, pages = _encode_packed_pages(u, page_target)
        return b"", payload, pages

    def decode(self, payload, pages, meta, dtype: str, n: int):
        u = _decode_packed_pages(payload, pages, _UNSIGNED[dtype])
        return from_unsigned_native(u[:n], dtype)

    def estimate_size(self, sample, dtype: str, n_total: int,
                      payload_total: int) -> float:
        if fmt.is_string(dtype):
            return math.inf
        vals = np.asarray(sample)
        if vals.size == 0:
            return 11.0
        u = to_unsigned_native(vals, dtype)
        w = base.bit_width(int(u.max()))
        return w / 8.0 * n_total
