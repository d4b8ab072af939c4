"""FSST-style string compression (north-rule extension).

Inspired by "FSST: Fast Random Access String Compression" (VLDB 2020, see
PAPERS.md): a per-partition symbol table maps frequent substrings (2..8
bytes) to single code bytes, preserving per-string random access. This
implementation diverges from the paper where the paper's byte-code VM is
replaced by something that vectorizes well in pure Python/numpy:

- code bytes are drawn from byte values *absent* from the chunk's payload
  (so no escape byte is ever needed; decode substitutions are independent
  and order-free);
- the table is trained by iterative greedy gain selection on a small sample
  (re-counting after each batch of picks, like the paper's generations);
- encode/decode are whole-corpus ``bytes.replace`` passes (C speed), with
  per-string boundaries kept via a reserved separator byte on encode and
  via vectorized per-string code counts on decode.

If the payload uses all 256 byte values the codec reports itself
inapplicable (estimate = inf) and the selector falls back.

Storage: pages of length-prefixed *encoded* strings (same page layout as the
plain string codec); meta = ``[n_syms:uvarint][per sym: code:u8 len:u8
bytes]``.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np

from .. import format as fmt
from .. import varint
from . import base

_TRAIN_BYTES = 16 * 1024
_MAX_SYM_LEN = 8
_BATCH = 24
_ROUNDS = 8


def _free_codes(payload: np.ndarray) -> np.ndarray:
    hist = np.bincount(payload, minlength=256)
    return np.flatnonzero(hist == 0)


def _train(sample_corpus: bytes, codes: list[int], sep: int) -> list[tuple[int, bytes]]:
    """Greedy symbol selection; returns [(code_byte, symbol_bytes)] in
    application order."""
    symbols: list[tuple[int, bytes]] = []
    corpus = sample_corpus
    forbidden = {sep} | set(codes)
    avail = list(codes)
    for _ in range(_ROUNDS):
        if not avail:
            break
        counts: Counter[bytes] = Counter()
        n = len(corpus)
        for L in range(2, _MAX_SYM_LEN + 1):
            counts.update(corpus[i:i + L] for i in range(n - L + 1))
        picks = []
        ranked = sorted(((len(s) - 1) * c - (len(s) + 2), s)
                        for s, c in counts.items() if c > 1)
        ranked.reverse()
        for gain, sym in ranked:
            if gain <= 0 or len(picks) >= min(_BATCH, len(avail)):
                break
            if any(b in forbidden for b in sym):
                continue
            picks.append(sym)
        if not picks:
            break
        for sym in picks:
            code = avail.pop(0)
            symbols.append((code, sym))
            corpus = corpus.replace(sym, bytes([code]))
    return symbols


def _serialize_meta(symbols: list[tuple[int, bytes]]) -> bytes:
    head = varint.encode_uvarint(np.array([len(symbols)], dtype=np.uint64)).tobytes()
    body = b"".join(bytes([code, len(sym)]) + sym for code, sym in symbols)
    return head + body


def _parse_meta(meta: bytes) -> list[tuple[int, bytes]]:
    mbuf = np.frombuffer(meta, dtype=np.uint8)
    r = fmt._Reader(mbuf)
    n = r.uvarint()
    out = []
    for _ in range(n):
        code = int(mbuf[r.pos]); slen = int(mbuf[r.pos + 1]); r.pos += 2
        out.append((code, r.take(slen)))
    return out


def _with_separators(lengths: np.ndarray, payload: np.ndarray, sep: int) -> bytes:
    """payload with one sep byte after every string (vectorized scatter)."""
    n = lengths.size
    P = int(lengths.sum())
    out = np.full(P + n, sep, dtype=np.uint8)
    if P:
        dest = np.arange(P, dtype=np.int64) + np.repeat(np.arange(n, dtype=np.int64),
                                                        lengths)
        out[dest] = payload
    return out.tobytes()


class FsstCodec(base.Codec):
    id = "fsst"

    def supports(self, dtype: str) -> bool:
        return fmt.is_string(dtype)

    def encode(self, chunk, dtype: str, page_target: int):
        lengths, payload = chunk
        free = _free_codes(payload)
        symbols: list[tuple[int, bytes]] = []
        enc_lengths, enc_payload = lengths, payload
        if free.size >= 2 and payload.size:
            sep = int(free[0])
            codes = [int(c) for c in free[1:]]
            sample = _with_separators(*_sample_rows(lengths, payload), sep)[:_TRAIN_BYTES]
            symbols = _train(sample, codes, sep)
            if symbols:
                corpus = _with_separators(lengths, payload, sep)
                for code, sym in symbols:
                    corpus = corpus.replace(sym, bytes([code]))
                enc = np.frombuffer(corpus, dtype=np.uint8)
                sep_pos = np.flatnonzero(enc == sep)
                enc_lengths = np.diff(np.concatenate(([-1], sep_pos))) - 1
                enc_payload = enc[enc != sep]
        meta = _serialize_meta(symbols)
        hw = varint.uvarint_width(enc_lengths.astype(np.uint64))
        out = varint.encode_str_column(enc_lengths, enc_payload)
        pages = base.paginate_widths(hw + enc_lengths,
                                     np.ones(enc_lengths.size, dtype=np.int64),
                                     page_target)
        return meta, out, pages

    def decode(self, payload, pages, meta, dtype: str, n: int):
        symbols = _parse_meta(meta)
        enc_lengths, enc_payload = varint.decode_str_column(payload, n)
        if not symbols:
            return enc_lengths, enc_payload
        # per-string decoded lengths via vectorized code counts
        extra = np.zeros(n, dtype=np.int64)
        ends = np.cumsum(enc_lengths)
        for code, sym in symbols:
            pos = np.flatnonzero(enc_payload == code)
            if pos.size:
                sid = np.searchsorted(ends, pos, side="right")
                np.add.at(extra, sid, len(sym) - 1)
        dec_lengths = enc_lengths + extra
        corpus = enc_payload.tobytes()
        for code, sym in symbols:  # order-free: codes are unique & absent from syms
            corpus = corpus.replace(bytes([code]), sym)
        dec_payload = np.frombuffer(corpus, dtype=np.uint8)
        assert dec_payload.size == int(dec_lengths.sum())
        return dec_lengths, dec_payload

    def estimate_size(self, sample, dtype: str, n_total: int,
                      payload_total: int) -> float:
        if not fmt.is_string(dtype):
            return math.inf
        lengths, payload = sample
        if lengths.size == 0:
            return 11.0
        free = _free_codes(payload)
        if free.size < 2:
            return math.inf
        sep = int(free[0])
        codes = [int(c) for c in free[1:]]
        corpus = _with_separators(lengths, payload, sep)[:_TRAIN_BYTES]
        symbols = _train(corpus, codes, sep)
        if not symbols:
            return math.inf
        enc = corpus
        for code, sym in symbols:
            enc = enc.replace(sym, bytes([code]))
        ratio = len(enc) / max(1, len(corpus))
        meta_bytes = sum(len(s) + 2 for _, s in symbols) + 2
        hw = varint.uvarint_width(lengths.astype(np.uint64))
        return ratio * payload_total + float(hw.mean()) * n_total + meta_bytes


def _sample_rows(lengths: np.ndarray, payload: np.ndarray, max_rows: int = 2048):
    if lengths.size <= max_rows:
        return lengths, payload
    stride = lengths.size // max_rows
    idx = np.arange(0, lengths.size, stride)[:max_rows]
    starts = np.cumsum(lengths) - lengths
    from .rle import _gather_segments
    return lengths[idx], _gather_segments(payload, starts[idx], lengths[idx])
