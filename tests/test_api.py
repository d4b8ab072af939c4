"""Drop-in parity API: literal transcriptions of the reference's own tests
(src/test_lib.rs) against rwcf.api."""

import io

import numpy as np
import pytest

from rwcf import api
from rwcf import format as fmt


def roundtrip(values, use_rle=False, dtype=None):
    buf = io.BytesIO()
    footer = api.encode_column(iter(values), buf, use_rle)
    return footer, buf.getvalue()


def test_encode_decode_several():
    # src/test_lib.rs:34-45 — the 9-type matrix, two values each
    cases = [
        np.array([-1, -1], dtype=np.int8),
        np.array([1, 2], dtype=np.uint8),
        np.array([-1, 1], dtype=np.int16),
        np.array([1, 2], dtype=np.uint16),
        np.array([-1, 1], dtype=np.int32),
        np.array([1, 2], dtype=np.uint32),
        np.array([-1, 1], dtype=np.int64),
        np.array([1, 2], dtype=np.uint64),
        ["a", "b"],
    ]
    for values in cases:
        _, data = roundtrip(list(values))
        out = list(api.decode_column(data))
        assert out == [api.Values(v, 1) for v in
                       (values.tolist() if hasattr(values, "tolist") else values)]


def test_encode_decode_integer_22_bytes():
    # src/test_lib.rs:49-110 — exact byte count + tuple-by-tuple equality
    data_vals = [-1, 10, 10, 10, 11, 12, 12, 10]
    footer, data = roundtrip(data_vals)
    assert len(data) == 22
    assert list(api.decode_column(data)) == [api.Values(v, 1) for v in data_vals]


def test_encode_decode_string_38_bytes():
    # src/test_lib.rs:114-167
    vals = ["foo", "foo", "foo", "bar", "baz", "foo"]
    footer, data = roundtrip(vals)
    assert len(data) == 38
    assert list(api.decode_column(data)) == [api.Values(v, 1) for v in vals]


def test_encode_decode_string_with_rle_34_bytes():
    # src/test_lib.rs:171-225
    vals = ["foo", "foo", "foo", "bar", "baz", "foo"]
    footer, data = roundtrip(vals, use_rle=True)
    assert len(data) == 34
    assert list(api.decode_column(data)) == [
        api.Values("foo", 3), api.Values("bar", 1),
        api.Values("baz", 1), api.Values("foo", 1)]


def test_encode_many_values_several_pages():
    # src/test_lib.rs:229-243 — 1M x -1i64, >1 page, footer round-trips
    values = np.full(1_000_000, -1, dtype=np.int64)
    footer, data = roundtrip(list(values))
    assert len(footer.pages) > 1
    f2 = api.decode_footer(data)
    assert f2.use_rle is False
    assert [(p.file_offset, p.values_count, p.encoded_values_count)
            for p in f2.pages] == \
        [(p.file_offset, p.values_count, p.encoded_values_count)
         for p in footer.pages]
    n = 0
    for v in api.decode_column(data):
        assert v == api.Values(-1, 1)
        n += 1
    assert n == 1_000_000


def test_decode_on_wrong_data_type_fails():
    # src/test_lib.rs:246-257
    _, data = roundtrip([-1])
    for bad in ("u64", "str", "i8", "u8"):
        with pytest.raises(fmt.UnsupportedDataType):
            list(api.decode_column(data, dtype=bad))
    list(api.decode_column(data, dtype="i16"))  # same category: ok


def test_decode_narrowing_overflow_errors():
    # narrowing within a category is allowed (category check, src/lib.rs:92-113)
    # but a value that does not fit the narrower width must error, not wrap
    _, data = roundtrip([-1, 10, 100_000])
    with pytest.raises(OverflowError):
        list(api.decode_column(data, dtype="i16"))
    # and the category mismatch errors at CALL time, before iteration
    with pytest.raises(fmt.UnsupportedDataType):
        api.decode_column(data, dtype="u64")


def test_decode_is_lazy_page_at_a_time(monkeypatch):
    """The streaming-memory contract the reference proves at 1M values
    (src/test_lib.rs:229-243): decode materializes one PAGE at a time,
    never the whole column. Pinned by counting page decodes as iteration
    advances."""
    _, data = roundtrip([7] * 1_000_000)
    footer = api.decode_footer(data)
    n_pages = len(footer.pages)
    assert n_pages > 1  # >=2048-byte pages => many pages at 1M values

    calls = []
    orig = fmt.decode_chunk

    def counting(enc):
        calls.append(enc.pages[0].values_count)
        return orig(enc)

    monkeypatch.setattr(api.fmt, "decode_chunk", counting)
    it = api.decode_column(data)
    first_page_rows = footer.pages[0].values_count
    got = [next(it) for _ in range(first_page_rows)]
    # consumed exactly one page's worth of values -> exactly ONE page decoded
    assert len(calls) == 1
    assert all(v == api.Values(7, 1) for v in got)
    rest = list(it)
    assert len(calls) == n_pages  # one decode per page, none up front
    assert len(got) + len(rest) == 1_000_000
    assert all(v == api.Values(7, 1) for v in rest)


def test_decode_error_surfaces_mid_iteration(monkeypatch):
    """Per-item error semantics (src/decode.rs:53-66 yields Result per
    tuple): a corrupt tail page raises only when iteration reaches it —
    every tuple of the preceding pages is yielded first."""
    _, data = roundtrip(list(range(1_000_000)))
    footer = api.decode_footer(data)
    n_pages = len(footer.pages)
    assert n_pages > 2
    good_rows = sum(p.values_count for p in footer.pages[:-1])

    orig = fmt.decode_chunk
    seen = []

    def corrupt_last(enc):
        seen.append(1)
        if len(seen) == n_pages:  # the tail page is corrupt
            raise IOError("corrupt page payload")
        return orig(enc)

    monkeypatch.setattr(api.fmt, "decode_chunk", corrupt_last)
    it = api.decode_column(data)
    got = []
    with pytest.raises(IOError):
        for v in it:
            got.append(v)
    assert len(got) == good_rows  # everything before the corrupt page arrived
    assert got[0] == api.Values(0, 1)
    assert got[-1] == api.Values(good_rows - 1, 1)


def test_decode_rle_lazy_pages(monkeypatch):
    """Laziness holds on the RLE path too (runs decode per page)."""
    vals = [i // 1000 for i in range(500_000)]  # 500 runs of 1000
    _, data = roundtrip(vals, use_rle=True)
    footer = api.decode_footer(data)
    assert len(footer.pages) > 1

    from rwcf.codecs import REGISTRY
    rle = REGISTRY["rle"]
    calls = []
    orig = rle.decode_runs

    def counting(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(type(rle), "decode_runs",
                        staticmethod(lambda *a, **k: counting(*a, **k)))
    it = api.decode_column(data)
    first = next(it)
    assert first == api.Values(0, 1000)
    assert len(calls) == 1  # only the first page decoded so far
    rest = list(it)
    assert len(calls) == len(footer.pages)
    total = first.run_length + sum(v.run_length for v in rest)
    assert total == 500_000


def test_vec_values_rejected_like_reference():
    """The reference's DataType has no Vec/array discriminant, so its
    encode_column::<Vec<_>> panics "unsupported data type"
    (src/encode.rs:17, src/lib.rs:78-84); the parity API rejects the same
    way. (Vec bincode SIZES from src/test_bincode.rs:45-52 are pinned via
    rwcf/oracle.py in tests/test_varint.py.)"""
    with pytest.raises(TypeError, match="unsupported data type"):
        api.encode_column([[1, 2, 3], [4, 5]])


def test_compressed_group_count_matches_expanded(ray_session):
    # GROUP BY in the compressed domain: per-value totals from RLE run
    # tuples must equal the expanded column's value_counts
    import duckdb
    import pandas as pd

    import __ray_entry__ as entry_mod
    sf = "/root/testdata/sf0.001"
    out = entry_mod.queries()["compressed_group_count"](sf).to_pandas() \
        .sort_values("lang", ignore_index=True)
    exp = duckdb.sql(
        f"SELECT lang, count(*) AS n FROM "
        f"read_parquet('{sf}/documents.parquet') "
        f"GROUP BY 1 ORDER BY 1").df()
    assert out["lang"].tolist() == exp["lang"].tolist()
    assert out["n_rows"].tolist() == exp["n"].astype("int64").tolist()
