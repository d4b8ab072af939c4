"""Reference-format size oracle: ``v0_encoded_size(column, use_rle) -> int``.

Computes, analytically and without materializing any bytes, the exact size
in bytes of the file the reference engine would write for one column —
pages + footer + 8-byte footer length (layout per
/root/reference/wills-columnar-format.org:591-601).

The byte budget reproduces the reference's pinned assertions:
- whole-file totals: 22 B for 8 small i64 (src/test_lib.rs:54-68), 38 B for
  6 short strings plain (src/test_lib.rs:119-133), 34 B for the same with
  RLE (src/test_lib.rs:176-199);
- per-value widths: src/test_bincode.rs:14-53;
- pagination: greedy fill with post-append >= 2048-byte check
  (src/encode.rs:44, src/encode.rs:53-101), so pages overshoot by up to
  one value/run and break only on whole values/runs.

This oracle defines the "reference compressed footprint" target
(BASELINE.md): footprint(table) = sum over columns of
min(v0_encoded_size(col, False), v0_encoded_size(col, True)).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from . import varint

MIN_TARGET_PAGE_SIZE = 2048  # reference's page target, src/encode.rs:44

#: reference DataType categories (src/lib.rs:59-66)
UNSIGNED_BYTE = "u8"
SIGNED_BYTE = "i8"
UNSIGNED_INT = "uint"
SIGNED_INT = "int"
STRING = "str"


def _as_ints(values, dtype) -> np.ndarray:
    """Exact Python-int -> numpy conversion (no float64 round-trip, which
    would corrupt values near 2**64)."""
    arr = np.asarray(values)
    if arr.dtype.kind in ("i", "u"):
        return arr.astype(dtype, copy=False)
    return np.fromiter((int(v) for v in values), dtype=dtype, count=len(values))


@dataclass
class PageSpec:
    file_offset: int
    values_count: int
    encoded_values_count: int
    byte_length: int


def value_widths(values, kind: str) -> np.ndarray:
    """Encoded byte width per value for the given reference type category."""
    if kind in (UNSIGNED_BYTE, SIGNED_BYTE):
        return np.ones(len(values), dtype=np.int64)
    if kind == UNSIGNED_INT:
        return varint.uvarint_width(_as_ints(values, np.uint64))
    if kind == SIGNED_INT:
        return varint.svarint_width(_as_ints(values, np.int64))
    if kind == STRING:
        lens = np.array([len(s.encode() if isinstance(s, str) else s) for s in values],
                        dtype=np.uint64)
        return varint.uvarint_width(lens) + lens.astype(np.int64)
    raise ValueError(f"unknown kind {kind!r}")


def run_lengths(values) -> tuple[np.ndarray, np.ndarray]:
    """Maximal adjacent runs (reference rle semantics, src/rle.rs:28-43).

    Returns (indices of run-start values, run lengths).
    """
    n = len(values)
    if n == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    arr = values if isinstance(values, np.ndarray) else np.asarray(values, dtype=object)
    change = np.flatnonzero(arr[1:] != arr[:-1]) + 1
    starts = np.concatenate(([0], change))
    lens = np.diff(np.concatenate((starts, [n])))
    return starts.astype(np.int64), lens.astype(np.int64)


def paginate(item_widths: np.ndarray, item_values_counts: np.ndarray,
             target: int = MIN_TARGET_PAGE_SIZE) -> list[PageSpec]:
    """Greedy reference pagination: a page closes at the first item whose
    append makes the page >= target bytes (post-append check)."""
    n = item_widths.size
    pages: list[PageSpec] = []
    if n == 0:
        return pages
    cum = np.cumsum(item_widths)
    cumv = np.cumsum(item_values_counts)
    pos = 0
    base = 0
    vbase = 0
    offset = 0
    while pos < n:
        idx = int(np.searchsorted(cum, base + target, side="left"))
        idx = min(idx, n - 1)  # include the overshooting item; last page may undershoot
        nbytes = int(cum[idx] - base)
        pages.append(PageSpec(
            file_offset=offset,
            values_count=int(cumv[idx] - vbase),
            encoded_values_count=idx - pos + 1,
            byte_length=nbytes,
        ))
        offset += nbytes
        base = int(cum[idx])
        vbase = int(cumv[idx])
        pos = idx + 1
    return pages


def footer_size(pages: list[PageSpec]) -> int:
    """bincode(Footer) size: data_type u8-variant(1) + use_rle bool(1) +
    vec len varint + per page i64-zigzag offset + 2 usize varints
    (src/lib.rs:52-73)."""
    total = 1 + 1
    total += int(varint.uvarint_width(np.array([len(pages)], dtype=np.uint64))[0])
    if pages:
        offs = np.array([p.file_offset for p in pages], dtype=np.int64)
        vc = np.array([p.values_count for p in pages], dtype=np.uint64)
        ec = np.array([p.encoded_values_count for p in pages], dtype=np.uint64)
        total += int(varint.svarint_width(offs).sum())
        total += int(varint.uvarint_width(vc).sum())
        total += int(varint.uvarint_width(ec).sum())
    return total


def plan_column(values, kind: str, use_rle: bool,
                target: int = MIN_TARGET_PAGE_SIZE) -> tuple[list[PageSpec], int]:
    """Page layout + total file size the reference would produce."""
    if use_rle:
        starts, lens = run_lengths(values)
        if starts.size:
            vw = value_widths([values[int(i)] for i in starts], kind)
            rw = varint.uvarint_width(lens.astype(np.uint64))
            item_w = vw + rw
        else:
            item_w = np.empty(0, dtype=np.int64)
        pages = paginate(item_w, lens, target)
    else:
        item_w = value_widths(values, kind)
        pages = paginate(item_w, np.ones(len(values), dtype=np.int64), target)
    data_bytes = int(item_w.sum())
    total = data_bytes + footer_size(pages) + 8  # + u64le footer length
    return pages, total


def v0_encoded_size(values, kind: str, use_rle: bool,
                    target: int = MIN_TARGET_PAGE_SIZE) -> int:
    """Exact reference file size in bytes for one column."""
    return plan_column(values, kind, use_rle, target)[1]


def reference_footprint(values, kind: str) -> int:
    """min(plain, rle) — grants the reference the better use_rle choice
    (it would otherwise have to guess, org:958-963)."""
    return min(v0_encoded_size(values, kind, False), v0_encoded_size(values, kind, True))
