"""Drop-in parity API: the reference's three public functions, 1:1.

The reference exposes exactly ``encode_column`` / ``decode_column`` /
``decode_footer`` (src/lib.rs:25-48). This module mirrors that surface —
same semantics, same byte format (reference mode: bincode varints, greedy
>=2048-byte pages, trailer-last footer), same decode contract (an iterator
of ``Values(value, run_length)`` tuples even when RLE is off, via the
``Values::single`` convention, src/rle.rs:18-24; category-level type check
at decode, src/decode.rs:44-50) — so a user of the reference crate can port
call sites mechanically while the heavy pipelines use the Ray-native engine
underneath.
"""

from __future__ import annotations

import io
from dataclasses import dataclass
from typing import Iterable, Iterator, NamedTuple

import numpy as np

from . import format as fmt


class Values(NamedTuple):
    """Mirror of rle::Values (src/rle.rs:8-15)."""
    value: object
    run_length: int


@dataclass
class Footer:
    """Mirror of the reference Footer (src/lib.rs:52-57)."""
    data_type: str        # reference category: u8/i8/uint/int/str
    use_rle: bool
    pages: list[fmt.PageInfo]


_CATEGORY_DTYPE = {"u8": "u8", "i8": "i8", "uint": "u64", "int": "i64",
                   "str": "str"}


def _infer_dtype(values: list) -> str:
    """Reference type inference (src/lib.rs:86-113). Vec / fixed-array
    values are rejected ON PURPOSE: the reference's ``DataType`` has no
    sequence discriminant (``ALL_DATA_TYPE``, src/lib.rs:78-84), so its
    own ``encode_column::<Vec<_>>`` panics "unsupported data type"
    (src/encode.rs:17) — rejecting here IS parity. (src/test_bincode.rs:
    45-52 pins Vec/array *bincode sizes*, which rwcf/oracle.py reproduces;
    the reference never wires those types into the column API. The engine
    path handles list<int32> natively via the tokens stream.)"""
    if not values:
        return "i64"
    v = values[0]
    if isinstance(v, str):
        return "str"
    if isinstance(v, (np.integer, int)):
        try:
            arr = np.asarray(values)
        except OverflowError:  # numpy>=2 refuses >=2**63 Python ints here
            arr = np.asarray(values, dtype=np.uint64)
        if arr.dtype.kind == "u":
            return {1: "u8", 2: "u16", 4: "u32", 8: "u64"}[arr.dtype.itemsize]
        if arr.dtype.kind == "i":
            return {1: "i8", 2: "i16", 4: "i32", 8: "i64"}[arr.dtype.itemsize]
        return "i64" if min(values) < 0 else ("u64" if max(values) >= 2**63
                                              else "i64")
    raise TypeError(f"unsupported data type: {type(v)}")  # src/encode.rs:17


def _to_chunk(values: list, dtype: str):
    if dtype == "str":
        encs = [s.encode() for s in values]  # encode each string once
        payload = np.frombuffer(b"".join(encs), dtype=np.uint8)
        lens = np.array([len(e) for e in encs], dtype=np.int64)
        return lens, payload
    return np.array(values, dtype=fmt.DTYPES[dtype][2])


def encode_column(data: Iterable, w: io.RawIOBase | None = None,
                  use_rle: bool = False) -> Footer:
    """Mirror of ``encode_column`` (src/lib.rs:25-33): encode an iterable of
    values into the reference byte format, write it to ``w`` (if given), and
    return the Footer."""
    values = list(data)
    dtype = _infer_dtype(values)
    enc = fmt.encode_chunk(_to_chunk(values, dtype), dtype,
                           "rle" if use_rle else "plain",
                           page_target=fmt.MIN_TARGET_PAGE_SIZE)
    blob = fmt.write_column_file(enc, reference_mode=True)
    if w is not None:
        w.write(blob)
    footer = Footer(data_type=fmt.DTYPES[dtype][0], use_rle=use_rle,
                    pages=enc.pages)
    footer._bytes = blob  # convenience for byte-level tests
    return footer


def decode_footer(data: bytes) -> Footer:
    """Mirror of ``decode_footer`` (src/lib.rs:45-48): metadata only."""
    enc = fmt.read_column_file(data)
    return Footer(data_type=fmt.DTYPES[enc.dtype][0],
                  use_rle=enc.codec == "rle", pages=enc.pages)


def decode_column(data: bytes, dtype: str | None = None) -> Iterator[Values]:
    """Mirror of ``decode_column`` (src/lib.rs:36-43): lazily yields
    ``Values(value, run_length)`` tuples — run_length 1 when RLE is off
    (``Values::single``), maximal runs when on. ``dtype`` requests a decode
    type; like the reference, a category mismatch errors at CALL time
    (src/decode.rs:44-50) and a value that does not fit the narrower
    requested width errors during iteration (bincode would return a decode
    error per tuple).

    Streaming contract (src/decode.rs:52-66): decoding is page-at-a-time —
    O(page) live memory, never the whole column (the reference proves this
    at 1M values, src/test_lib.rs:229-243; mirrored with a pages-decoded
    assertion in tests/test_api.py). Errors surface mid-iteration: a
    corrupt page raises only when iteration first reaches it, after every
    tuple of the preceding pages has been yielded — the reference's
    per-item ``Result`` semantics at page granularity."""
    enc = fmt.read_column_file(data)
    if dtype is not None:
        fmt.assert_decodable(enc, dtype)  # eager, before the generator body
    return _decode_column_iter(enc, dtype)


def _decode_column_iter(enc, dtype: str | None) -> Iterator[Values]:
    if dtype is not None and not fmt.is_string(enc.dtype) \
            and fmt.DTYPES[dtype][2] != fmt.DTYPES[enc.dtype][2]:
        # narrowing request: decode at the stored width and range-check each
        # value — silent modular wrapping would corrupt data where the
        # reference's bincode decode errors
        info = np.iinfo(fmt.DTYPES[dtype][2])
        for v in _raw_values(enc):
            if not (info.min <= v.value <= info.max):
                raise OverflowError(
                    f"value {v.value} does not fit requested {dtype}")
            yield v
        return
    yield from _raw_values(enc)


def _raw_values(enc) -> Iterator[Values]:
    """Page-at-a-time lazy decode: one page's tuples are materialized per
    step (mirrors the one-tuple-per-next() reference loop at page
    granularity, src/decode.rs:52-66 — O(page) memory either way)."""
    for pi in range(len(enc.pages)):
        if enc.pages[pi].values_count == 0:
            continue  # skip empty pages, src/decode.rs:55
        yield from _page_values(fmt.slice_pages(enc, [pi]))


def _page_values(page) -> Iterator[Values]:
    if page.codec == "rle":
        from .codecs import REGISTRY
        runs, lens = REGISTRY["rle"].decode_runs(page.payload, page.pages,
                                                 page.meta, page.dtype)
        if fmt.is_string(page.dtype):
            slens, spayload = runs
            offs = np.cumsum(slens) - slens
            for i in range(len(slens)):
                s = spayload[offs[i]:offs[i] + slens[i]].tobytes().decode()
                yield Values(s, int(lens[i]))
        else:
            for v, rl in zip(runs.tolist(), lens.tolist()):
                yield Values(v, int(rl))
    else:
        chunk = fmt.decode_chunk(page)
        if fmt.is_string(page.dtype):
            slens, spayload = chunk
            offs = np.cumsum(slens) - slens
            for i in range(len(slens)):
                yield Values(spayload[offs[i]:offs[i] + slens[i]]
                             .tobytes().decode(), 1)
        else:
            for v in chunk.tolist():
                yield Values(v, 1)
