"""Property-based codec round-trips (hypothesis, fixed seeds/profiles —
SURVEY.md §5 test plan)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from rwcf import format as fmt
from rwcf import oracle, varint
from rwcf.codecs import REGISTRY

SETTINGS = dict(max_examples=60, deadline=None, derandomize=True)


@given(st.lists(st.integers(0, 2**64 - 1), max_size=200))
@settings(**SETTINGS)
def test_uvarint_roundtrip(vals):
    v = np.array(vals, dtype=np.uint64)
    assert np.array_equal(varint.decode_uvarint(varint.encode_uvarint(v), v.size), v)


@given(st.lists(st.integers(-2**63, 2**63 - 1), max_size=200))
@settings(**SETTINGS)
def test_svarint_roundtrip(vals):
    v = np.array(vals, dtype=np.int64)
    assert np.array_equal(varint.decode_svarint(varint.encode_svarint(v), v.size), v)


@given(st.lists(st.integers(-2**31, 2**31 - 1), max_size=300),
       st.sampled_from(["plain", "rle", "bitpack", "for", "dict"]))
@settings(**SETTINGS)
def test_i32_codecs_roundtrip(vals, codec):
    chunk = np.array(vals, dtype=np.int32)
    enc = fmt.encode_chunk(chunk, "i32", codec, page_target=64)
    out = fmt.decode_chunk(enc)
    assert np.array_equal(out, chunk)
    assert out.dtype == np.int32 or chunk.size == 0


@given(st.lists(st.text(max_size=40), max_size=120),
       st.sampled_from(["plain", "rle", "dict", "fsst"]))
@settings(**SETTINGS)
def test_string_codecs_roundtrip(vals, codec):
    payload = np.frombuffer("".join(vals).encode(), dtype=np.uint8)
    lens = np.array([len(s.encode()) for s in vals], dtype=np.int64)
    enc = fmt.encode_chunk((lens, payload), "str", codec, page_target=128)
    dl, dp = fmt.decode_chunk(enc)
    assert np.array_equal(dl, lens)
    assert np.array_equal(dp, payload)


@given(st.lists(st.integers(-1000, 1000), max_size=150),
       st.booleans())
@settings(**SETTINGS)
def test_reference_file_size_matches_oracle(vals, use_rle):
    """Our plain/rle writer is byte-count-identical to the analytic oracle
    (itself pinned to the reference's assertions) for arbitrary inputs."""
    chunk = np.array(vals, dtype=np.int64)
    enc = fmt.encode_chunk(chunk, "i64", "rle" if use_rle else "plain",
                           page_target=2048)
    data = fmt.write_column_file(enc, reference_mode=True)
    assert len(data) == oracle.v0_encoded_size(chunk, oracle.SIGNED_INT, use_rle)


@given(st.lists(st.integers(0, 2**20), min_size=1, max_size=400),
       st.integers(1, 64))
@settings(**SETTINGS)
def test_pack_unpack_bits(vals, width):
    v = np.array(vals, dtype=np.uint64) & np.uint64((1 << width) - 1)
    packed = REGISTRY  # noqa: F841  (keep import used)
    from rwcf.codecs import base
    out = base.unpack_bits(base.pack_bits(v, width), width, v.size)
    assert np.array_equal(out, v)


@given(st.lists(st.one_of(st.none(), st.integers(-2**31, 2**31 - 1)),
                max_size=300),
       st.sampled_from(["plain", "rle", "bitpack", "for", "dict"]))
@settings(**SETTINGS)
def test_nullable_i32_roundtrip(vals, codec):
    """v2 validity container: arbitrary null patterns round-trip
    null-exactly through every int codec (round 5)."""
    import pyarrow as pa
    arr = pa.array(vals, pa.int32())
    dense, validity = fmt.split_validity(arr)
    chunk = dense.to_numpy(zero_copy_only=False).astype(np.int32)
    enc = fmt.encode_chunk(chunk, "i32", codec, page_target=64)
    enc.validity = validity
    back = fmt.read_column_file(fmt.write_column_file(enc))
    out = fmt.chunk_to_arrow(fmt.decode_chunk(back), "i32")
    if back.validity is not None:
        out = fmt.apply_validity(out, back.validity)
    assert out.equals(arr)


@given(st.lists(st.booleans(), max_size=400))
@settings(**SETTINGS)
def test_validity_runs_roundtrip_property(bits):
    v = np.array(bits, dtype=bool)
    assert np.array_equal(fmt.validity_from_runs(fmt.runs_from_validity(v)),
                          v)
