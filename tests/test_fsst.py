"""FSST-style codec edge cases."""

import numpy as np
import pytest

from rwcf import format as fmt
from rwcf.codecs import fsst
from tests.test_codecs import chunk_equal, mk_chunk


def test_all_256_bytes_present_falls_back_gracefully():
    # payload covering every byte value -> no free codes -> no symbols,
    # but encode/decode still round-trips (plain-equivalent layout)
    raw = bytes(range(256)) * 4
    lens = np.full(8, 128, dtype=np.int64)
    payload = np.frombuffer(raw[:1024], dtype=np.uint8)
    codec = fsst.FsstCodec()
    assert codec.estimate_size((lens, payload), "str", 8, 1024) == float("inf")
    meta, out, pages = codec.encode((lens, payload), "str", 2048)
    dl, dp = codec.decode(out, pages, meta, "str", 8)
    assert np.array_equal(dl, lens) and np.array_equal(dp, payload)


def test_symbol_substitution_correctness_adversarial():
    # strings where symbols overlap and repeat across boundaries
    vals = ["abcabcabc", "bcabca", "cabcab", "abc", "", "xyzxyzxyz"] * 200
    chunk = mk_chunk(vals, "str")
    enc = fmt.encode_chunk(chunk, "str", "fsst", page_target=2048)
    out = fmt.decode_chunk(enc)
    assert chunk_equal(chunk, out, "str")
    assert enc.encoded_bytes < int(chunk[0].sum())  # actually compressed


def test_unicode_multibyte_boundaries():
    vals = ["héllo wörld", "héllo", "wörld", "日本語テキスト"] * 300
    chunk = mk_chunk(vals, "str")
    enc = fmt.encode_chunk(chunk, "str", "fsst")
    out = fmt.decode_chunk(enc)
    assert chunk_equal(chunk, out, "str")


def test_deterministic_training():
    vals = ["doc-%09d" % (i % 977) for i in range(5000)]
    chunk = mk_chunk(vals, "str")
    e1 = fmt.encode_chunk(chunk, "str", "fsst")
    e2 = fmt.encode_chunk(chunk, "str", "fsst")
    assert e1.meta == e2.meta
    assert np.array_equal(e1.payload, e2.payload)


def test_meta_roundtrip():
    syms = [(200, b"abc"), (201, b"\x00\x01"), (255, b"x" * 8)]
    assert fsst._parse_meta(fsst._serialize_meta(syms)) == syms
