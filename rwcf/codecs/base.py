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
    """LSB-first fixed-width packing of uint64 values into bytes.

    Word-arithmetic scatter (no per-bit matrix): each value is shifted to
    its bit offset and OR-ed into up to 9 destination bytes. ~100x faster
    than an unpackbits-style bit matrix at 1M values."""
    n = vals.size
    if width == 0 or n == 0:
        return np.empty(0, dtype=np.uint8)
    v = vals.astype(np.uint64, copy=False)
    bit_pos = np.arange(n, dtype=np.int64) * width
    byte_pos = bit_pos >> 3
    shift = (bit_pos & 7).astype(np.uint64)
    nbytes = (n * width + 7) // 8
    out = np.zeros(nbytes + 9, dtype=np.uint8)
    low = v << shift  # uint64 wraps: keeps bits 0..63 of the shifted value
    nspan = min(8, (width + 7 + 7) // 8)
    for b in range(nspan):
        np.bitwise_or.at(out, byte_pos + b,
                         ((low >> np.uint64(8 * b)) & np.uint64(0xFF)).astype(np.uint8))
    if width + 7 > 64:  # bits beyond the 64-bit word land in a 9th byte
        nz = shift > 0
        high = np.zeros(n, dtype=np.uint64)
        high[nz] = v[nz] >> (np.uint64(64) - shift[nz])
        np.bitwise_or.at(out, byte_pos + 8,
                         (high & np.uint64(0xFF)).astype(np.uint8))
    return out[:nbytes]


def unpack_bits(buf: np.ndarray, width: int, n: int) -> np.ndarray:
    if width == 0:
        return np.zeros(n, dtype=np.uint64)
    bits = np.unpackbits(buf, count=n * width, bitorder="little").reshape(n, width)
    shifts = np.arange(width, dtype=np.uint64)
    out = np.zeros(n, dtype=np.uint64)
    for j in range(width):  # width <= 64 iterations, each vectorized over n
        out |= bits[:, j].astype(np.uint64) << shifts[j]
    return out


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
