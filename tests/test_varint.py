"""Varint layer: mirrors /root/reference/src/test_bincode.rs:14-53 plus
randomized round-trips."""

import numpy as np
import pytest

from rwcf import varint


def usize(v):
    return int(varint.uvarint_width(np.array([v], dtype=np.uint64))[0])


def ssize(v):
    return int(varint.svarint_width(np.array([v], dtype=np.int64))[0])


def test_encoding_size_reference_pins():
    # src/test_bincode.rs:17-20 — small numbers are 1 byte
    assert usize(1) == 1
    assert ssize(-1) == 1
    # src/test_bincode.rs:24 — 255u16 takes 3 bytes (varint marker + u16le)
    assert usize(255) == 3
    # boundaries of the bincode varint scheme
    assert usize(250) == 1
    assert usize(251) == 3
    assert usize(65535) == 3
    assert usize(65536) == 5
    assert usize(2**32 - 1) == 5
    assert usize(2**32) == 9
    assert usize(2**64 - 1) == 9
    # zigzag widths: zigzag(v>=0)=2v, zigzag(v<0)=-2v-1
    assert ssize(125) == 1   # zigzag=250, still 1 byte
    assert ssize(127) == 3   # zigzag=254 >= 251
    assert ssize(-125) == 1  # zigzag=249
    assert ssize(-126) == 3  # zigzag=251


def test_zigzag_roundtrip():
    v = np.array([0, -1, 1, -2, 2, np.iinfo(np.int64).min, np.iinfo(np.int64).max],
                 dtype=np.int64)
    assert np.array_equal(varint.unzigzag(varint.zigzag(v)), v)
    assert varint.zigzag(np.array([-1], dtype=np.int64))[0] == 1
    assert varint.zigzag(np.array([1], dtype=np.int64))[0] == 2


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_uvarint_roundtrip_random(seed):
    rng = np.random.default_rng(seed)
    # mix all width classes
    v = np.concatenate([
        rng.integers(0, 251, 1000, dtype=np.uint64),
        rng.integers(251, 1 << 16, 1000, dtype=np.uint64),
        rng.integers(1 << 16, 1 << 32, 1000, dtype=np.uint64),
        rng.integers(1 << 32, (1 << 63), 1000).astype(np.uint64),
    ])
    rng.shuffle(v)
    buf = varint.encode_uvarint(v)
    assert buf.size == int(varint.uvarint_width(v).sum())
    out = varint.decode_uvarint(buf, v.size)
    assert np.array_equal(out, v)


def test_svarint_roundtrip():
    rng = np.random.default_rng(7)
    v = rng.integers(-(1 << 40), 1 << 40, 5000, dtype=np.int64)
    v[:4] = [0, -1, np.iinfo(np.int64).min, np.iinfo(np.int64).max]
    buf = varint.encode_svarint(v)
    assert np.array_equal(varint.decode_svarint(buf, v.size), v)


def test_str_column_roundtrip():
    strs = ["foo", "", "a" * 300, "bar", "é中文", "x" * 70000]
    payload = np.frombuffer("".join(strs).encode(), dtype=np.uint8)
    lens = np.array([len(s.encode()) for s in strs], dtype=np.int64)
    buf = varint.encode_str_column(lens, payload)
    # "string" takes 7 bytes: len prefix 1 + 6 (src/test_bincode.rs:42)
    one = varint.encode_str_column(np.array([6]), np.frombuffer(b"string", dtype=np.uint8))
    assert one.size == 7
    dlens, dpayload = varint.decode_str_column(buf, len(strs))
    assert np.array_equal(dlens, lens)
    assert np.array_equal(dpayload, payload)


def test_empty():
    assert varint.encode_uvarint(np.empty(0, dtype=np.uint64)).size == 0
    assert varint.decode_uvarint(np.empty(0, dtype=np.uint8), 0).size == 0
    lens, payload = varint.decode_str_column(np.empty(0, dtype=np.uint8), 0)
    assert lens.size == 0 and payload.size == 0
