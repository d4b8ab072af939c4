"""Codec auto-selector (SURVEY.md §2.3): sample -> estimate -> min choice."""

import numpy as np

from rwcf import format as fmt
from rwcf import selector
from tests.test_codecs import chunk_equal, mk_chunk


def test_selector_prefers_rle_on_runs():
    # org:267-281 "good example": long runs
    vals = np.repeat(np.arange(20, dtype=np.int64), 5000)
    choice = selector.choose_codec(vals, "i64")
    # rle collapses 100k values to 20 tuples; must beat the packed codecs
    assert choice.codec == "rle"


def test_selector_avoids_rle_on_alternation():
    # org:288-300 "bad example": strict alternation — rle strictly worse
    vals = np.tile(np.array([100_000, 200_000], dtype=np.int64), 5000)
    choice = selector.choose_codec(vals, "i64")
    assert choice.estimates["rle"] > choice.estimates[choice.codec]
    assert choice.codec != "rle"


def test_selector_picks_dict_for_low_cardinality_strings():
    vals = (["source-alpha"] * 700 + ["source-beta"] * 200 + ["source-gamma"] * 100) * 10
    rng = np.random.default_rng(0)
    vals = [vals[i] for i in rng.permutation(len(vals))]  # kill runs
    chunk = mk_chunk(vals, "str")
    choice = selector.choose_codec(chunk, "str")
    assert choice.codec == "dict"


def test_selector_picks_small_width_codec_for_clustered_ints():
    rng = np.random.default_rng(1)
    vals = (rng.integers(0, 1 << 14, 50_000)).astype(np.int64) + 1_000_000_000
    choice = selector.choose_codec(vals, "i64")
    assert choice.codec == "for"  # subtract base -> 14-bit deltas


def test_selector_roundtrip_auto():
    rng = np.random.default_rng(2)
    for dtype, chunk in [
        ("i64", np.repeat(rng.integers(0, 50, 2000), rng.integers(1, 9, 2000)).astype(np.int64)),
        ("i32", rng.integers(0, 50257, 30_000).astype(np.int32)),
        ("str", mk_chunk(["doc-%012d" % i for i in range(5000)], "str")),
        ("str", mk_chunk(["s%d" % (i % 5) for i in range(5000)], "str")),
    ]:
        enc, choice = selector.encode_auto(chunk, dtype)
        out = fmt.decode_chunk(enc)
        assert chunk_equal(chunk, out, dtype), (dtype, choice.codec)
        # actual size should be in the ballpark of the estimate (same order)
        assert enc.encoded_bytes <= max(2.5 * choice.estimate + 1024, 4096), \
            (dtype, choice.codec, enc.encoded_bytes, choice.estimate)


def test_selector_fsst_wins_on_common_prefix_unique_strings():
    chunk = mk_chunk(["doc-%012d" % i for i in range(20000)], "str")
    choice = selector.choose_codec(chunk, "str")
    # unique strings: dict can't win; shared 'doc-00000' prefixes favor fsst
    assert choice.codec == "fsst"
    enc = fmt.encode_chunk(chunk, "str", "fsst")
    # must actually compress: < 1 byte less than raw payload per string at least
    assert enc.encoded_bytes < int(chunk[0].sum())


def test_selector_picks_dd_on_regular_cadence():
    # evenly spaced timestamps (int64 us on a 1 ms tick): second diffs
    # are ~0, so double-delta's packed width collapses below delta's
    ts = (np.arange(60_000, dtype=np.int64) * 1_000
          + 1_700_000_000_000_000)
    choice = selector.choose_codec(ts, "i64")
    assert choice.codec == "dd"
    assert choice.estimates["dd"] < choice.estimates["delta"]


def test_selector_picks_cascade_on_clustered_low_cardinality_strings():
    # lang-like column AFTER a sort: few values, long runs — dict alone
    # pays per-value index bits, rle alone pays per-run string payloads,
    # the cascade pays per-run varint tuples
    vals = (["en"] * 20_000 + ["de"] * 15_000 + ["fr"] * 9_000
            + ["en"] * 6_000)
    chunk = mk_chunk(vals, "str")
    choice = selector.choose_codec(chunk, "str")
    assert choice.codec == "dictrle"
    assert choice.estimates["dictrle"] < choice.estimates["dict"]
    assert choice.estimates["dictrle"] < choice.estimates["rle"]


def test_cascade_unclustered_estimates_inf():
    # unclustered codes: the cascade must bow out instead of underbidding
    import math
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 4, 30_000).astype(np.int64)
    from rwcf.codecs import REGISTRY
    est = REGISTRY["dictrle"].estimate_size(vals, "i64", 30_000, 0)
    assert math.isinf(est)


def test_dd_beats_delta_encoded_bytes_on_cadence():
    from rwcf.codecs import REGISTRY
    ts = (np.arange(200_000, dtype=np.int64) * 1_000_000
          + 1_700_000_000_000_000)
    _, p_delta, _ = REGISTRY["delta"].encode(ts, "i64", 65536)
    _, p_dd, _ = REGISTRY["dd"].encode(ts, "i64", 65536)
    assert p_dd.size * 100 < p_delta.size  # >100x smaller on pure cadence
