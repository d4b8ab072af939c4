"""Codec protocol + shared vector kernels (bit packing, pagination).

The ``Codec`` protocol is rwcf's user-extension surface — it generalizes the
reference's single ``use_rle: bool`` knob (src/lib.rs:25) into "codec id per
column chunk", exactly the direction the reference's own roadmap names
("Automatically determine if RLE should be applied. Dictionary encoding…",
wills-columnar-format.org:196-204).
"""

from __future__ import annotations

import numpy as np

from .. import format as fmt
from .. import oracle

PageInfo = fmt.PageInfo


class Codec:
    """One compression scheme for one column chunk.

    encode(chunk, dtype, page_target) -> (meta: bytes, payload: np.uint8,
                                          pages: list[PageInfo])
    decode(payload, pages, meta, dtype, n) -> chunk
    estimate_size(sample, dtype, n_total, payload_total) -> float
        estimated *total* encoded bytes for the full chunk, given a sample
        (selector contract; math.inf = not applicable to this data).
    """

    id: str = ""

    def supports(self, dtype: str) -> bool:
        raise NotImplementedError

    def encode(self, chunk, dtype: str, page_target: int):
        raise NotImplementedError

    def decode(self, payload: np.ndarray, pages: list[PageInfo], meta: bytes,
               dtype: str, n: int):
        raise NotImplementedError

    def estimate_size(self, sample, dtype: str, n_total: int,
                      payload_total: int) -> float:
        raise NotImplementedError


# ---------------------------------------------------------------------------
# shared kernels
# ---------------------------------------------------------------------------

def to_unsigned_stream(values: np.ndarray, dtype: str) -> np.ndarray:
    """Map a numeric chunk to the uint64 varint domain (zigzag for signed)."""
    from .. import varint
    if fmt.is_signed(dtype):
        return varint.zigzag(values.astype(np.int64, copy=False))
    return values.astype(np.uint64, copy=False)


def from_unsigned_stream(u: np.ndarray, dtype: str) -> np.ndarray:
    from .. import varint
    np_t = fmt.DTYPES[dtype][2]
    if fmt.is_signed(dtype):
        return varint.unzigzag(u).astype(np_t, copy=False)
    return u.astype(np_t, copy=False)


def bit_width(max_val: int) -> int:
    return int(max_val).bit_length()


def pack_bits(vals: np.ndarray, width: int) -> np.ndarray:
    """LSB-first fixed-width packing into bytes.

    Group-reshape scheme: 8 consecutive values occupy exactly ``width``
    output bytes, so each output byte column is a fixed shift/or combination
    of at most 3 value columns — sequential vectorized writes, no scattered
    ``ufunc.at``, and uint32 arithmetic when the width allows (halves memory
    traffic for token-sized ints)."""
    n = vals.size
    if width == 0 or n == 0:
        return np.empty(0, dtype=np.uint8)
    dt = np.uint32 if width <= 24 else np.uint64
    pad = (-n) % 8
    v = vals.astype(dt, copy=False)
    if pad:
        v = np.concatenate([v, np.zeros(pad, dtype=dt)])
    g = v.reshape(-1, 8)
    out = np.empty((g.shape[0], width), dtype=np.uint8)
    for j in range(width):
        bitlo = 8 * j
        acc = None
        k = bitlo // width
        while k < 8 and k * width < bitlo + 8:
            off = k * width - bitlo
            term = (g[:, k] << dt(off)) if off >= 0 else (g[:, k] >> dt(-off))
            acc = term if acc is None else acc | term
            k += 1
        out[:, j] = acc.astype(np.uint8) if acc is not None else 0
    return out.reshape(-1)[: (n * width + 7) // 8]


def unpack_bits(buf: np.ndarray, width: int, n: int,
                out_dtype=np.uint64) -> np.ndarray:
    """Inverse of :func:`pack_bits`; ``out_dtype`` avoids widening copies
    when the caller works in a narrow native dtype."""
    if width == 0:
        return np.zeros(n, dtype=out_dtype)
    dt = np.uint32 if width <= 24 else np.uint64
    ngroups = (n + 7) // 8
    need = ngroups * width
    b = np.zeros(need, dtype=np.uint8)
    b[: buf.size] = buf[:need] if buf.size >= need else buf
    b = b.reshape(ngroups, width).astype(dt)
    out = np.empty((ngroups, 8), dtype=dt)
    mask = dt((1 << width) - 1) if width < (32 if dt is np.uint32 else 64) \
        else dt(np.iinfo(dt).max)
    for k in range(8):
        bitlo = k * width
        j0 = bitlo // 8
        j1 = (bitlo + width - 1) // 8
        acc = None
        for j in range(j0, j1 + 1):
            off = 8 * j - bitlo
            term = (b[:, j] << dt(off)) if off >= 0 else (b[:, j] >> dt(-off))
            acc = term if acc is None else acc | term
        out[:, k] = acc & mask
    return out.reshape(-1)[:n].astype(out_dtype, copy=False)


def paginate_widths(item_widths: np.ndarray, item_values: np.ndarray,
                    target: int) -> list[PageInfo]:
    """Reference greedy pagination (post-append >= target check) over
    per-item encoded widths; returns PageInfo incl. byte lengths."""
    return [PageInfo(p.file_offset, p.values_count, p.encoded_values_count,
                     p.byte_length)
            for p in oracle.paginate(item_widths, item_values, target)]


def fixed_count_pages(n: int, values_per_page: int,
                      page_byte_lengths: list[int]) -> list[PageInfo]:
    """PageInfo list for codecs that chunk by fixed value count."""
    pages = []
    off = 0
    start = 0
    for i, bl in enumerate(page_byte_lengths):
        cnt = min(values_per_page, n - start)
        pages.append(PageInfo(off, cnt, cnt, bl))
        off += bl
        start += cnt
    return pages
