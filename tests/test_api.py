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
