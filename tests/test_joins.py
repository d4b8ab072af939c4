"""Two-sided distributed hash-join (rwcf.joins) + the distributed dedup
verification and clustering built on it (round-2 operators)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from rwcf import dedup
from rwcf.joins import hash_join


def test_hash_join_matches_pandas_merge(ray_session):
    import ray.data as rd
    rng = np.random.default_rng(3)
    l = pd.DataFrame({"k": rng.integers(0, 50, 200).astype(np.int64),
                      "x": rng.integers(0, 1000, 200).astype(np.int64)})
    r = pd.DataFrame({"id": rng.integers(0, 50, 80).astype(np.int64),
                      "y": rng.integers(0, 1000, 80).astype(np.int64)})
    got = hash_join(rd.from_pandas(l).repartition(4),
                    rd.from_pandas(r).repartition(3),
                    on="k", right_on="id", buckets=8).to_pandas()
    want = l.merge(r, left_on="k", right_on="id")
    key = ["k", "x", "id", "y"]
    got = got[key].sort_values(key).reset_index(drop=True)
    want = want[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_hash_join_string_keys_and_collisions(ray_session):
    import ray.data as rd
    l = pd.DataFrame({"k": ["a", "b", "c", "b"], "v": [1, 2, 3, 4]})
    r = pd.DataFrame({"k": ["b", "c", "d"], "v": [20, 30, 40]})
    got = hash_join(rd.from_pandas(l), rd.from_pandas(r), on="k",
                    buckets=4).to_pandas()
    assert set(got.columns) == {"k", "v", "k_r", "v_r"}
    got = got.sort_values(["k", "v"]).reset_index(drop=True)
    assert got["k"].tolist() == ["b", "b", "c"]
    assert got["v"].tolist() == [2, 4, 3]
    assert got["v_r"].tolist() == [20, 20, 30]


def test_hash_join_empty_result(ray_session):
    import ray.data as rd
    l = pd.DataFrame({"k": np.array([1, 2], np.int64)})
    r = pd.DataFrame({"id": np.array([7, 8], np.int64)})
    got = hash_join(rd.from_pandas(l), rd.from_pandas(r), on="k",
                    right_on="id").to_pandas()
    assert len(got) == 0


def _docs_ds_10x(n=60):
    """~10x the unit corpus: distinct base docs + planted copies at ten
    offsets — the VERDICT round-2 'verify path at 10x corpus' fixture."""
    from tests.test_dedup import make_docs
    t, _ = make_docs(n)
    base = t.to_pandas()
    frames = [base]
    for k in range(1, 10):
        c = base.copy()
        c["doc_id"] = c["doc_id"] + 1_000_000 * k
        frames.append(c)
    return pd.concat(frames, ignore_index=True)


def test_verify_pairs_distributed_matches_driver_verify(ray_session):
    """The bucketed-join verify leg must agree with the (small-N) driver
    verify on a 10x corpus, with no full-corpus collect in the pipeline."""
    import ray.data as rd
    df = _docs_ds_10x()
    ds = rd.from_pandas(df).repartition(8)
    cand_ds = dedup.distinct_pairs(dedup.minhash_lsh_candidates_ds(ds))
    got = (dedup.verify_pairs_distributed(cand_ds, ds, threshold=0.8,
                                          mode="jaccard")
           .to_pandas()[["a_id", "b_id"]]
           .sort_values(["a_id", "b_id"]).reset_index(drop=True))
    # driver-side reference on the same candidates
    cand = cand_ds.to_pandas()
    texts = df.set_index("doc_id")["text"].to_dict()
    want = (dedup.verify_pairs_jaccard(texts, cand, threshold=0.8)
            [["a_id", "b_id"]].sort_values(["a_id", "b_id"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))
    assert len(got) > 0


def test_verify_pairs_distributed_equality_mode(ray_session):
    import ray.data as rd
    df = pd.DataFrame({"doc_id": np.arange(6, dtype=np.int64),
                       "text": ["aa", "bb", "aa", "cc", "bb", "zz"]})
    pairs = pd.DataFrame({"a_id": np.array([0, 1, 0, 3], np.int64),
                          "b_id": np.array([2, 4, 1, 5], np.int64)})
    got = (dedup.verify_pairs_distributed(rd.from_pandas(pairs),
                                          rd.from_pandas(df),
                                          mode="equality")
           .to_pandas()[["a_id", "b_id"]]
           .sort_values(["a_id", "b_id"]).reset_index(drop=True))
    assert got.values.tolist() == [[0, 2], [1, 4]]


def test_jaccard_blocked_pipeline_matches_driver(ray_session):
    """The Ray-native blocked-jaccard pipeline equals the driver-side
    blocked enumeration it replaced."""
    import ray.data as rd
    df = _docs_ds_10x(30)
    got = (dedup.jaccard_blocked_pairs(rd.from_pandas(df).repartition(6),
                                       threshold=0.8)
           .to_pandas()[["a_id", "b_id"]]
           .sort_values(["a_id", "b_id"]).reset_index(drop=True))
    # driver reference: same blocking (byte length), same verify
    df2 = df.copy()
    df2["blk"] = df2["text"].str.encode("utf-8").str.len()
    pairs = []
    for _, g in df2.groupby("blk"):
        if len(g) < 2:
            continue
        ids = np.sort(g["doc_id"].to_numpy())
        ai, bi = np.triu_indices(ids.size, k=1)
        pairs.append(pd.DataFrame({"a_id": ids[ai], "b_id": ids[bi]}))
    cand = pd.concat(pairs)
    texts = df.set_index("doc_id")["text"].to_dict()
    want = (dedup.verify_pairs_jaccard(texts, cand, 0.8)[["a_id", "b_id"]]
            .sort_values(["a_id", "b_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_cluster_pairs_distributed_matches_union_find(ray_session):
    import ray.data as rd
    rng = np.random.default_rng(11)
    # random sparse graph incl. chains (exercises multi-round propagation)
    a = rng.integers(0, 200, 150)
    b = rng.integers(0, 200, 150)
    chain = np.arange(300, 316)
    pairs = pd.DataFrame({
        "a_id": np.concatenate([a, chain[:-1]]).astype(np.int64),
        "b_id": np.concatenate([b, chain[1:]]).astype(np.int64)})
    pairs = pairs[pairs.a_id != pairs.b_id].reset_index(drop=True)
    got = (dedup.cluster_pairs_ds(rd.from_pandas(pairs).repartition(4))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want = dedup.cluster_pairs(pairs).sort_values("doc_id") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_dedup_survivors_distributed_matches_driver(ray_session):
    import ray.data as rd
    ids = np.arange(50, dtype=np.int64)
    pairs = pd.DataFrame({"a_id": np.array([1, 2, 10], np.int64),
                          "b_id": np.array([2, 3, 40], np.int64)})
    ids_ds = rd.from_pandas(pd.DataFrame({"doc_id": ids}))
    got = (dedup.dedup_survivors_ds(rd.from_pandas(pairs), ids_ds)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want = dedup.dedup_survivors(pairs, ids).sort_values("doc_id") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_empty_pairs_pipelines(ray_session):
    """A clean corpus (zero duplicate pairs) must flow through the
    distributed verify / clustering / survivors paths, not crash on the
    schema-less empty Dataset (round-2 review finding)."""
    import ray.data as rd
    empty_pairs = rd.from_pandas(pd.DataFrame(
        {"a_id": pd.Series([], dtype="int64"),
         "b_id": pd.Series([], dtype="int64")}))
    docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(5, dtype=np.int64),
         "text": ["a", "b", "c", "d", "e"]}))
    # a *materialized* empty dataset loses its schema entirely — the
    # worst case the guards must handle
    really_empty = empty_pairs.materialize()
    v = dedup.verify_pairs_distributed(really_empty, docs,
                                       mode="equality").to_pandas()
    assert len(v) == 0
    cl = dedup.cluster_pairs_ds(really_empty).to_pandas()
    assert len(cl) == 0
    surv = (dedup.dedup_survivors_ds(really_empty,
                                     docs.select_columns(["doc_id"]))
            .to_pandas().sort_values("doc_id"))
    assert surv["doc_id"].tolist() == [0, 1, 2, 3, 4]


def test_hash_join_rejects_schemaless_input(ray_session):
    import ray.data as rd
    empty = rd.from_pandas(pd.DataFrame({"k": pd.Series([], dtype="int64")})) \
        .materialize()
    other = rd.from_pandas(pd.DataFrame({"k": np.array([1], np.int64)}))
    if empty.schema() is None:  # ray drops the schema of empty datasets
        with pytest.raises(ValueError, match="schema-less"):
            hash_join(empty, other, on="k")


@pytest.fixture()
def join_frames():
    rng = np.random.default_rng(11)
    l = pd.DataFrame({"k": rng.integers(0, 40, 150).astype(np.int64),
                      "x": rng.integers(0, 1000, 150).astype(np.int64)})
    r = pd.DataFrame({"id": rng.integers(20, 60, 50).astype(np.int64),
                      "y": rng.integers(0, 1000, 50).astype(np.int64)})
    return l, r


@pytest.mark.parametrize("broadcast", [False, True])
def test_hash_join_left(ray_session, join_frames, broadcast):
    import ray.data as rd
    l, r = join_frames
    got = hash_join(rd.from_pandas(l).repartition(4),
                    rd.from_pandas(r).repartition(3),
                    on="k", right_on="id", buckets=8, how="left",
                    broadcast=broadcast).to_pandas()
    want = l.merge(r, left_on="k", right_on="id", how="left")
    key = ["k", "x", "id", "y"]
    got = got[key].sort_values(key).reset_index(drop=True)
    want = want[key].sort_values(key).reset_index(drop=True)
    # unmatched rows carry nulls in id/y: compare as nullable Int64
    for c in ("id", "y"):
        got[c] = got[c].astype("Int64")
        want[c] = want[c].astype("Int64")
    pd.testing.assert_frame_equal(got, want)


@pytest.mark.parametrize("how", ["semi", "anti"])
@pytest.mark.parametrize("broadcast", [False, True])
def test_hash_join_semi_anti(ray_session, join_frames, how, broadcast):
    import ray.data as rd
    l, r = join_frames
    got = hash_join(rd.from_pandas(l).repartition(4),
                    rd.from_pandas(r).repartition(3),
                    on="k", right_on="id", buckets=8, how=how,
                    broadcast=broadcast).to_pandas()
    inkeys = l["k"].isin(set(r["id"]))
    want = l[inkeys] if how == "semi" else l[~inkeys]
    key = ["k", "x"]
    got = got[key].sort_values(key).reset_index(drop=True)
    want = want[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    # semi/anti must never emit right columns
    assert list(got.columns) == key


def test_broadcast_join_plan_has_no_all_to_all(ray_session, join_frames):
    """The small-side broadcast plan is a pure map over the left side:
    its executed plan must contain NO shuffle operator (the verdict's
    acceptance check for the dimension-table lookup path)."""
    import ray.data as rd
    l, r = join_frames
    # inputs deliberately NOT repartitioned: the assertion below must see
    # only the join's own operators in the executed plan
    out = hash_join(rd.from_pandas(l), rd.from_pandas(r),
                    on="k", right_on="id", buckets=8, broadcast=True)
    mat = out.materialize()
    stats = mat.stats()
    for op in ("Sort", "Repartition", "Aggregate", "RandomShuffle"):
        assert op not in stats, f"broadcast plan ran an all-to-all: {op}"
    # and it produces exactly the shuffle join's rows
    shuf = hash_join(rd.from_pandas(l).repartition(4),
                     rd.from_pandas(r).repartition(3),
                     on="k", right_on="id", buckets=8).to_pandas()
    key = ["k", "x", "id", "y"]
    a = mat.to_pandas()[key].sort_values(key).reset_index(drop=True)
    b = shuf[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def _range_want(l, r, lv, lo, hi):
    cand = l.merge(r, how="cross")
    return cand[(cand[lo] <= cand[lv]) & (cand[lv] <= cand[hi])]


def test_range_join_matches_cross_filter(ray_session):
    import ray.data as rd
    from rwcf.joins import range_join
    rng = np.random.default_rng(11)
    l = pd.DataFrame({"eid": np.arange(300, dtype=np.int64),
                      "v": rng.uniform(-50, 450, 300)})
    # mixed widths incl. intervals spanning many chunks and negatives
    lo = rng.uniform(-60, 440, 60)
    r = pd.DataFrame({"rid": np.arange(60, dtype=np.int64),
                      "lo": lo, "hi": lo + rng.uniform(0, 120, 60)})
    got = range_join(rd.from_pandas(l).repartition(5),
                     rd.from_pandas(r).repartition(3),
                     left_val="v", right_lo="lo", right_hi="hi",
                     chunk=25.0, buckets=8).to_pandas()
    want = _range_want(l, r, "v", "lo", "hi")
    key = ["eid", "rid"]
    got = got[key].sort_values(key).reset_index(drop=True)
    want = want[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    # every pair exactly once (the meet-in-one-bin guarantee)
    assert not got.duplicated().any()


def test_range_join_bounds_inclusive_and_edges(ray_session):
    import ray.data as rd
    from rwcf.joins import range_join
    # values sitting exactly on interval bounds AND on chunk boundaries
    l = pd.DataFrame({"eid": np.arange(6, dtype=np.int64),
                      "v": [0.0, 10.0, 20.0, -10.0, 25.0, 5.0]})
    r = pd.DataFrame({"rid": np.array([0, 1, 2], dtype=np.int64),
                      "lo": [0.0, -10.0, 20.0],
                      "hi": [20.0, 0.0, 20.0]})
    got = range_join(rd.from_pandas(l), rd.from_pandas(r),
                     left_val="v", right_lo="lo", right_hi="hi",
                     chunk=10.0, buckets=4).to_pandas()
    want = _range_want(l, r, "v", "lo", "hi")
    key = ["eid", "rid"]
    got = got[key].sort_values(key).reset_index(drop=True)
    want = want[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_range_join_no_matches_and_name_collision(ray_session):
    import ray.data as rd
    from rwcf.joins import range_join
    l = pd.DataFrame({"id": np.arange(4, dtype=np.int64),
                      "v": [1.0, 2.0, 3.0, 4.0]})
    r = pd.DataFrame({"id": np.array([7], dtype=np.int64),
                      "lo": [100.0], "hi": [200.0]})
    out = range_join(rd.from_pandas(l), rd.from_pandas(r),
                     left_val="v", right_lo="lo", right_hi="hi",
                     chunk=10.0, buckets=4).materialize()
    assert out.count() == 0
    # columns survive on the empty result (Dataset schema; a 0-row
    # to_pandas drops columns — Ray quirk, not an operator property)
    assert set(out.schema().names) == {"id", "v", "id_r", "lo", "hi"}


def test_bloom_filter_membership_and_fp_rate():
    from rwcf.joins import _bloom_positions, bloom_member
    m_bits = 1 << 20
    keys = np.arange(0, 100_000, dtype=np.int64)
    arr = np.zeros(m_bits // 64, dtype=np.uint64)
    pos = _bloom_positions(keys, m_bits).reshape(-1)
    np.bitwise_or.at(arr, pos >> 6, np.uint64(1) << (pos & 63).astype(np.uint64))
    # no false negatives, ever
    assert bloom_member(keys, arr, m_bits).all()
    # false positives bounded: ~1.2% expected at n=100k, m=1Mi, k=4
    absent = np.arange(1_000_000, 1_100_000, dtype=np.int64)
    fp = bloom_member(absent, arr, m_bits).mean()
    assert fp < 0.03, fp


@pytest.mark.parametrize("how", ["inner", "semi"])
def test_hash_join_bloom_prune_same_result(ray_session, join_frames, how):
    import ray.data as rd
    l, r = join_frames
    kw = dict(on="k", right_on="id", buckets=8, how=how)
    plain = hash_join(rd.from_pandas(l).repartition(4),
                      rd.from_pandas(r).repartition(3), **kw).to_pandas()
    pruned = hash_join(rd.from_pandas(l).repartition(4),
                       rd.from_pandas(r).repartition(3),
                       bloom_bits=1 << 16, **kw).to_pandas()
    cols = sorted(plain.columns)
    a = plain[cols].sort_values(cols).reset_index(drop=True)
    b = pruned[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_hash_join_bloom_rejects_outer_modes(ray_session, join_frames):
    import ray.data as rd
    l, r = join_frames
    for how in ("left",):
        with pytest.raises(ValueError, match="bloom"):
            hash_join(rd.from_pandas(l), rd.from_pandas(r), on="k",
                      right_on="id", how=how, bloom_bits=1 << 16)


def test_hash_join_bloom_prunes_before_shuffle(ray_session):
    """A join where only 1% of left keys can match: the bloom prefilter
    must drop (almost) all non-matching left rows before the exchange."""
    import ray.data as rd
    from rwcf.joins import bloom_member, build_bloom
    rng = np.random.default_rng(5)
    l = pd.DataFrame({"k": np.arange(20_000, dtype=np.int64),
                      "x": rng.integers(0, 9, 20_000).astype(np.int64)})
    r = pd.DataFrame({"k": np.arange(0, 20_000, 100, dtype=np.int64),
                      "y": np.arange(200, dtype=np.int64)})
    rds = rd.from_pandas(r).repartition(2)
    bloom = build_bloom(rds.select_columns(["k"]), "k", m_bits=1 << 18)
    kept = bloom_member(l["k"].to_numpy(), bloom, 1 << 18)
    # all 200 true matches kept, fp-bounded leak of the other 19800
    assert kept[l["k"].to_numpy() % 100 == 0].all()
    assert kept.sum() < 200 + 0.03 * 19_800
    got = hash_join(rd.from_pandas(l).repartition(4), rds, on="k",
                    buckets=8, bloom_bits=1 << 18).to_pandas()
    assert len(got) == 200


def test_hash_join_bloom_anti_bypass_same_result(ray_session, join_frames):
    import ray.data as rd
    l, r = join_frames
    kw = dict(on="k", right_on="id", buckets=8, how="anti")
    plain = hash_join(rd.from_pandas(l).repartition(4),
                      rd.from_pandas(r).repartition(3), **kw).to_pandas()
    pruned = hash_join(rd.from_pandas(l).repartition(4),
                       rd.from_pandas(r).repartition(3),
                       bloom_bits=1 << 16, **kw).to_pandas()
    cols = sorted(plain.columns)
    a = plain[cols].sort_values(cols).reset_index(drop=True)
    b = pruned[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_left_join_preserves_big_int64_payloads(ray_session):
    """An unmatched left row must not coerce the right int64 payload
    through float64 (which silently rounds values above 2^53)."""
    import ray.data as rd
    big = 2**62 + 12345  # not float64-representable
    l = pd.DataFrame({"k": np.array([1, 2, 3], np.int64)})
    r = pd.DataFrame({"k": np.array([1, 2], np.int64),
                      "payload": np.array([big, big + 1], np.int64)})
    out = hash_join(rd.from_pandas(l), rd.from_pandas(r), on="k",
                    how="left", buckets=4)
    # assert on ARROW (a null-bearing int64 would coerce to float64 in
    # to_pandas and re-corrupt in the test harness itself)
    t = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    assert t.schema.field("payload").type == pa.int64()
    by_k = dict(zip(t.column("k").to_pylist(), t.column("payload").to_pylist()))
    assert by_k == {1: big, 2: big + 1, 3: None}


def test_asof_join_preserves_big_int64_payloads(ray_session):
    import ray.data as rd
    from rwcf.joins import asof_join
    big = 2**62 + 7
    l = pd.DataFrame({"k": np.array([1, 1], np.int64),
                      "ts": np.array([10, 1], np.int64)})
    r = pd.DataFrame({"k": np.array([1], np.int64),
                      "rts": np.array([5], np.int64),
                      "payload": np.array([big], np.int64)})
    out = asof_join(rd.from_pandas(l), rd.from_pandas(r), on="k",
                    left_ts="ts", right_ts="rts", buckets=2)
    t = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    by_ts = dict(zip(t.column("ts").to_pylist(),
                     t.column("payload").to_pylist()))
    assert by_ts == {1: None, 10: big}  # ts=1 precedes every right row


@pytest.mark.parametrize("how", ["right", "outer"])
def test_hash_join_right_outer(ray_session, join_frames, how):
    import ray.data as rd
    l, r = join_frames
    got = hash_join(rd.from_pandas(l).repartition(4),
                    rd.from_pandas(r).repartition(3),
                    on="k", right_on="id", buckets=8, how=how).to_pandas()
    want = l.merge(r, left_on="k", right_on="id", how=how)
    key = ["k", "x", "id", "y"]
    got = got[key].sort_values(key).reset_index(drop=True)
    want = want[key].sort_values(key).reset_index(drop=True)
    for c in key:  # both sides may carry nulls
        got[c] = got[c].astype("Int64")
        want[c] = want[c].astype("Int64")
    pd.testing.assert_frame_equal(got, want)


def test_hash_join_outer_preserves_big_ints(ray_session):
    # unmatched rows must not coerce int64 through float64 (2^53 rounding)
    import ray.data as rd
    big = (1 << 62) + 12345
    l = pd.DataFrame({"k": np.array([1, 2], np.int64),
                      "x": np.array([big, big + 1], np.int64)})
    r = pd.DataFrame({"id": np.array([2, 3], np.int64),
                      "y": np.array([big + 2, big + 3], np.int64)})
    out = hash_join(rd.from_pandas(l), rd.from_pandas(r), on="k",
                    right_on="id", how="outer", buckets=4)
    # assert at the ARROW layer: int64-with-nulls stays int64 there
    # (Dataset.to_pandas view converts nullable ints to float64 — a
    # pandas-semantics display concern, not an engine precision loss)
    t = pa.concat_tables(
        b for b in out.iter_batches(batch_format="pyarrow") if b.num_rows)
    assert t.schema.field("x").type == pa.int64()
    xs = set(t.column("x").drop_null().to_pylist())
    ys = set(t.column("y").drop_null().to_pylist())
    assert xs == {big, big + 1} and ys == {big + 2, big + 3}
    assert t.num_rows == 3  # k=1 left-only, k=2 matched, id=3 right-only


def test_hash_join_right_outer_reject_broadcast_and_bloom(ray_session):
    import ray.data as rd
    l = pd.DataFrame({"k": [1], "x": [1]})
    r = pd.DataFrame({"id": [1], "y": [1]})
    for how in ("right", "outer"):
        with pytest.raises(ValueError, match="broadcast"):
            hash_join(rd.from_pandas(l), rd.from_pandas(r), on="k",
                      right_on="id", how=how, broadcast=True)
        with pytest.raises(ValueError, match="bloom_bits"):
            hash_join(rd.from_pandas(l), rd.from_pandas(r), on="k",
                      right_on="id", how=how, bloom_bits=1 << 10)


def test_outer_join_coverage_query(ray_session):
    import duckdb

    import __ray_entry__ as entry_mod
    sf = "/root/testdata/sf0.001"
    out = entry_mod.queries()["outer_join_coverage"](sf).to_pandas() \
        .sort_values("side", ignore_index=True)
    exp = duckdb.sql(
        f"WITH d AS (SELECT doc_id, n_chars FROM "
        f"read_parquet('{sf}/documents.parquet') WHERE doc_id % 2 = 0),"
        f" e AS (SELECT vec_id, label FROM "
        f"read_parquet('{sf}/embeddings.parquet') WHERE vec_id % 3 = 0)"
        f" SELECT CASE WHEN doc_id IS NOT NULL AND vec_id IS NOT NULL "
        f"THEN 'both' WHEN doc_id IS NOT NULL THEN 'doc_only' "
        f"ELSE 'vec_only' END AS side, count(*) AS n, "
        f"sum(coalesce(n_chars, 0)) AS s "
        f"FROM d FULL JOIN e ON doc_id = vec_id "
        f"GROUP BY 1 ORDER BY 1").df()
    assert out["side"].tolist() == exp["side"].tolist()
    assert out["n_rows"].tolist() == exp["n"].astype("int64").tolist()
    assert out["sum_nchars"].tolist() == exp["s"].astype("int64").tolist()


@pytest.mark.parametrize("how", ["inner", "left", "outer"])
def test_hash_join_nested_payload_columns(ray_session, how):
    """List-typed payload columns (embeddings) survive the shuffle join:
    Acero rejects nested non-key fields, so the in-bucket merge joins
    slim sides and gathers nested columns by row index — unmatched outer
    rows must come back as NULL lists, matched ones bit-identical."""
    import ray.data as rd
    l = pa.table({"k": pa.array([1, 2, 3, 4], pa.int64()),
                  "vec": pa.array([[1.0, 2.0], [3.0], [], [4.0, 5.0]],
                                  pa.list_(pa.float32()))})
    r = pa.table({"id": pa.array([2, 3, 5], pa.int64()),
                  "emb": pa.array([[9.0], [8.0, 7.0], [6.0]],
                                  pa.list_(pa.float32())),
                  "w": pa.array([10, 20, 30], pa.int64())})
    ds = hash_join(rd.from_arrow(l), rd.from_arrow(r), on="k",
                   right_on="id", how=how, buckets=4)
    # collect as Arrow: Ray's to_pandas TensorArray cast chokes on
    # null-bearing list columns, which is exactly what outer joins emit
    got = pa.concat_tables(
        ds.iter_batches(batch_format="pyarrow", batch_size=None)
    ).to_pandas()
    ldf = l.to_pandas()
    rdf = r.to_pandas().rename(columns={"id": "id", "emb": "emb", "w": "w"})
    want = ldf.merge(rdf, left_on="k", right_on="id", how=how)
    assert len(got) == len(want)
    got = got.sort_values(["k", "id"], na_position="last",
                          ignore_index=True)
    want = want.sort_values(["k", "id"], na_position="last",
                            ignore_index=True)
    for i in range(len(got)):
        gv, wv = got["vec"][i], want["vec"][i]
        assert (gv is None and (wv is None or wv is np.nan)) or \
            np.array_equal(np.asarray(gv), np.asarray(wv))
        ge, we = got["emb"][i], want["emb"][i]
        if we is None or (isinstance(we, float) and np.isnan(we)):
            assert ge is None
        else:
            assert np.array_equal(np.asarray(ge), np.asarray(we))
