"""Codec round-trips + byte-exact parity of plain/rle with the reference
format (sizes via the oracle, which itself reproduces
src/test_lib.rs:54-68,119-133,176-199)."""

import numpy as np
import pytest

from rwcf import format as fmt
from rwcf import oracle, varint
from rwcf.codecs import REGISTRY


def mk_chunk(values, dtype):
    if dtype == "str":
        payload = np.frombuffer("".join(values).encode(), dtype=np.uint8)
        lens = np.array([len(s.encode()) for s in values], dtype=np.int64)
        return lens, payload
    return np.array(values, dtype=fmt.DTYPES[dtype][2])


def chunk_equal(a, b, dtype):
    if dtype == "str":
        return np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1])
    return np.array_equal(np.asarray(a), np.asarray(b)) and \
        np.asarray(b).dtype == fmt.DTYPES[dtype][2]


TYPE_MATRIX = [
    # mirrors src/test_lib.rs:34-45 plus varint boundary values (FIXTURES.md F2)
    ("i8", [-1, -1, 127, -128, 0]),
    ("u8", [1, 2, 255, 0, 250]),
    ("i16", [-1, 1, 32767, -32768, 126]),
    ("u16", [1, 2, 250, 251, 65535]),
    ("i32", [-1, 1, 2**31 - 1, -2**31, 0]),
    ("u32", [1, 2, 65536, 2**32 - 1, 250]),
    ("i64", [-1, 1, 2**63 - 1, -2**63, 125]),
    ("u64", [1, 2, 2**32, 2**64 - 1, 251]),
    ("str", ["a", "b", "", "é中文", "x" * 5000]),
]


@pytest.mark.parametrize("codec_id", list(REGISTRY))
@pytest.mark.parametrize("dtype,values", TYPE_MATRIX)
def test_roundtrip_type_matrix(codec_id, dtype, values):
    codec = REGISTRY[codec_id]
    if not codec.supports(dtype):
        pytest.skip("codec does not support dtype")
    chunk = mk_chunk(values, dtype)
    enc = fmt.encode_chunk(chunk, dtype, codec_id, page_target=2048)
    out = fmt.decode_chunk(enc)
    assert chunk_equal(chunk, out, dtype)
    assert sum(p.values_count for p in enc.pages) == len(values)


@pytest.mark.parametrize("codec_id", list(REGISTRY))
@pytest.mark.parametrize("dtype", ["i64", "u32", "str"])
def test_roundtrip_empty(codec_id, dtype):
    codec = REGISTRY[codec_id]
    if not codec.supports(dtype):
        pytest.skip()
    chunk = mk_chunk([], dtype)
    enc = fmt.encode_chunk(chunk, dtype, codec_id)
    out = fmt.decode_chunk(enc)
    assert fmt.chunk_len(out, dtype) == 0


@pytest.mark.parametrize("codec_id", list(REGISTRY))
def test_roundtrip_random_int_runs(codec_id):
    if not REGISTRY[codec_id].supports("i64"):
        pytest.skip()
    rng = np.random.default_rng(3)
    # runs + outliers + negatives: exercises page boundaries at 2048 B target
    vals = np.repeat(rng.integers(-1000, 1000, 5000), rng.integers(1, 7, 5000))
    chunk = vals.astype(np.int64)
    enc = fmt.encode_chunk(chunk, "i64", codec_id, page_target=2048)
    assert len(enc.pages) > 1
    out = fmt.decode_chunk(enc)
    assert np.array_equal(out, chunk)


@pytest.mark.parametrize("codec_id", ["plain", "rle", "dict", "fsst"])
def test_roundtrip_random_strings(codec_id):
    rng = np.random.default_rng(4)
    words = ["doc-%012d" % i for i in range(50)] + ["foo", "bar", ""]
    vals = [words[i] for i in rng.integers(0, len(words), 8000)]
    vals = [w for v in vals for w in ([v] * 3 if v == "foo" else [v])]
    chunk = mk_chunk(vals, "str")
    enc = fmt.encode_chunk(chunk, "str", codec_id, page_target=2048)
    out = fmt.decode_chunk(enc)
    assert chunk_equal(chunk, out, "str")


# --- byte-exact parity with the reference format ---------------------------

def test_plain_matches_oracle_ints():
    vals = np.array([-1, 10, 10, 10, 11, 12, 12, 10], dtype=np.int64)
    enc = fmt.encode_chunk(vals, "i64", "plain", page_target=2048)
    data = fmt.write_column_file(enc, reference_mode=True)
    assert len(data) == 22  # src/test_lib.rs:54-68
    assert len(data) == oracle.v0_encoded_size(vals, oracle.SIGNED_INT, False)


def test_plain_matches_oracle_strings():
    vals = ["foo", "foo", "foo", "bar", "baz", "foo"]
    enc = fmt.encode_chunk(mk_chunk(vals, "str"), "str", "plain", page_target=2048)
    data = fmt.write_column_file(enc, reference_mode=True)
    assert len(data) == 38  # src/test_lib.rs:119-133
    # data section: 6 strings x (1 len byte + 3 payload)
    assert enc.payload.size == 24


def test_rle_matches_oracle_strings():
    vals = ["foo", "foo", "foo", "bar", "baz", "foo"]
    enc = fmt.encode_chunk(mk_chunk(vals, "str"), "str", "rle", page_target=2048)
    data = fmt.write_column_file(enc, reference_mode=True)
    assert len(data) == 34  # src/test_lib.rs:176-199
    assert enc.pages[0].encoded_values_count == 4
    assert enc.pages[0].values_count == 6


@pytest.mark.parametrize("use_rle", [False, True])
@pytest.mark.parametrize("dtype,values", TYPE_MATRIX)
def test_file_size_matches_oracle_everywhere(dtype, values, use_rle):
    chunk = mk_chunk(values, dtype)
    enc = fmt.encode_chunk(chunk, dtype, "rle" if use_rle else "plain",
                           page_target=2048)
    data = fmt.write_column_file(enc, reference_mode=True)
    kind = fmt.DTYPES[dtype][0]
    assert len(data) == oracle.v0_encoded_size(values, kind, use_rle)


def test_multipage_million_constant():
    # src/test_lib.rs:229-243 — 1M identical i64, plain: >1 page, decode equal
    vals = np.full(1_000_000, -1, dtype=np.int64)
    enc = fmt.encode_chunk(vals, "i64", "plain", page_target=2048)
    assert len(enc.pages) > 1
    data = fmt.write_column_file(enc, reference_mode=True)
    assert len(data) == oracle.v0_encoded_size(vals, oracle.SIGNED_INT, False)
    rt = fmt.read_column_file(data)
    assert rt.codec == "plain" and rt.n_values == 1_000_000
    out = fmt.decode_chunk(rt)
    assert np.array_equal(out, vals)
    # rle collapses to a single run
    enc_r = fmt.encode_chunk(vals, "i64", "rle", page_target=2048)
    assert len(enc_r.pages) == 1
    assert enc_r.pages[0].encoded_values_count == 1
    assert np.array_equal(fmt.decode_chunk(enc_r), vals)


def test_v1_container_roundtrip_all_codecs():
    rng = np.random.default_rng(5)
    vals = np.repeat(rng.integers(0, 2000, 3000), rng.integers(1, 5, 3000)).astype(np.int64)
    for codec_id in ["plain", "rle", "bitpack", "for", "dict"]:
        enc = fmt.encode_chunk(vals, "i64", codec_id)
        data = fmt.write_column_file(enc)
        rt = fmt.read_column_file(data)
        assert rt.codec == codec_id and rt.dtype == "i64"
        assert np.array_equal(fmt.decode_chunk(rt), vals)


def test_compressed_domain_sum():
    # src/test_rle.rs:8-17 — sum computable from runs without expansion
    vals = np.repeat(np.array([3, 7, 3], dtype=np.int64), [5, 2, 4])
    enc = fmt.encode_chunk(vals, "i64", "rle")
    rv, lens = REGISTRY["rle"].decode_runs(enc.payload, enc.pages, enc.meta, "i64")
    assert int((rv * lens).sum()) == int(vals.sum())
    assert sum(p.encoded_values_count for p in enc.pages) == 3


def test_rle_page_breaks_on_run_boundaries():
    # one giant run must not be split mid-run (src/encode.rs:66-72)
    vals = np.concatenate([np.full(100_000, 5), np.arange(10)]).astype(np.int64)
    enc = fmt.encode_chunk(vals, "i64", "rle", page_target=2048)
    assert enc.pages[0].values_count >= 100_000
    assert np.array_equal(fmt.decode_chunk(enc), vals)


def test_decode_on_wrong_type_category_fails():
    # mirrors src/test_lib.rs:246-257 (F5): i64-written column must reject
    # u64/str/i8/u8 requests but accept i16 (category check only — the
    # reference does not record width, src/lib.rs:92-113)
    enc = fmt.encode_chunk(np.array([-1], dtype=np.int64), "i64", "plain")
    for bad in ("u64", "str", "i8", "u8"):
        with pytest.raises(fmt.UnsupportedDataType):
            fmt.assert_decodable(enc, bad)
    fmt.assert_decodable(enc, "i16")  # same category: allowed
    fmt.assert_decodable(enc, "i64")
    senc = fmt.encode_chunk(mk_chunk(["a"], "str"), "str", "plain")
    with pytest.raises(fmt.UnsupportedDataType):
        fmt.assert_decodable(senc, "i64")


def test_for_u64_high_range():
    # regression: u64 page minimum >= 2**63 must not overflow the svarint
    # min header (stored as the two's-complement int64 view)
    vals = np.array([2**63 + 5, 2**63 + 100, 2**64 - 1, 2**63], dtype=np.uint64)
    enc = fmt.encode_chunk(vals, "u64", "for")
    assert np.array_equal(fmt.decode_chunk(enc), vals)
    data = fmt.write_column_file(enc)
    assert np.array_equal(fmt.decode_chunk(fmt.read_column_file(data)), vals)


def test_nulls_rejected_loudly():
    import pyarrow as pa
    arr = pa.array(["a", None, "c"], pa.string())
    with pytest.raises(ValueError, match="null"):
        fmt.chunk_from_arrow(arr)
    iarr = pa.array([1, None, 3], pa.int64())
    with pytest.raises(ValueError, match="null"):
        fmt.chunk_from_arrow(iarr)


def test_single_huge_value_overshoots_page():
    # FIXTURES.md F4 multipage_mixed: one value whose encoded size alone
    # exceeds the 2048-byte target sits alone in its page (post-append size
    # check, src/encode.rs:84-89)
    vals = ["x" * 5000, "a", "b"]
    enc = fmt.encode_chunk(mk_chunk(vals, "str"), "str", "plain",
                           page_target=2048)
    assert enc.pages[0].encoded_values_count == 1
    assert enc.pages[0].byte_length == 3 + 5000
    data = fmt.write_column_file(enc, reference_mode=True)
    assert len(data) == oracle.v0_encoded_size(vals, oracle.STRING, False)
    out = fmt.decode_chunk(fmt.read_column_file(data))
    assert chunk_equal(mk_chunk(vals, "str"), out, "str")


@pytest.mark.parametrize("codec_id", ["plain", "rle", "bitpack", "for",
                                      "delta", "dict"])
def test_slice_pages_all_int_codecs(codec_id):
    # every codec's pages must decode independently (selective page decode)
    rng = np.random.default_rng(12)
    vals = np.repeat(rng.integers(0, 3000, 20_000),
                     rng.integers(1, 4, 20_000)).astype(np.int64)
    enc = fmt.encode_chunk(vals, "i64", codec_id, page_target=4096)
    if len(enc.pages) < 3:
        pytest.skip("needs multiple pages")
    sub = fmt.slice_pages(enc, [0, 2])
    out = fmt.decode_chunk(sub)
    c = [p.values_count for p in enc.pages]
    expect = np.concatenate([vals[:c[0]], vals[c[0] + c[1]:c[0] + c[1] + c[2]]])
    assert np.array_equal(out, expect), codec_id


@pytest.mark.parametrize("codec_id", ["plain", "rle", "dict", "fsst"])
def test_slice_pages_string_codecs(codec_id):
    vals = [f"doc-{i % 500:09d}" for i in range(6000)]
    vals = [v for v in vals for _ in (range(2) if v.endswith("3") else range(1))]
    chunk = mk_chunk(vals, "str")
    enc = fmt.encode_chunk(chunk, "str", codec_id, page_target=4096)
    if len(enc.pages) < 2:
        pytest.skip("needs multiple pages")
    sub = fmt.slice_pages(enc, [1])
    dl, dp = fmt.decode_chunk(sub)
    start = enc.pages[0].values_count
    cnt = enc.pages[1].values_count
    want = vals[start:start + cnt]
    assert np.array_equal(dl, [len(w) for w in want])
    assert dp.tobytes().decode() == "".join(want)
