"""Cost-based scan planner: the partition statistics view is
manifest-accurate, plan_scan picks the cheapest metadata-pruned access
path (zone map / bloom / token index / full), and planned_scan's
execution matches a brute-force full-decode filter exactly.
"""

import numpy as np
import pyarrow.parquet as pq
import pytest

from rwcf import fixtures, invindex, pipeline, planner


@pytest.fixture(scope="module")
def store(tmp_path_factory, ray_session):
    """Clustered store: rows sorted by doc_id (zero-padded strings), a
    bloom sidecar on doc_id, small partitions so pruning has targets."""
    tmp = tmp_path_factory.mktemp("planner")
    path = fixtures.tokens_parquet(300, seed=11, cache_dir=str(tmp / "tok"),
                                   row_group_size=60)
    out = str(tmp / "out")
    cfg = pipeline.EncodeConfig(out_dir=out,
                                partition_token_budget=15_000,
                                bloom_bits_per_key=10)
    pipeline.encode_job(path, cfg, concurrency=2).materialize()
    return out, path


def test_partition_stats_view_matches_manifest(store):
    out, _ = store
    st = planner.partition_stats(out).to_pandas()
    rows = pipeline.load_manifest(out)
    assert len(st) == len(rows) > 1
    by_pid = {r["pid"]: r for r in rows}
    for _, s in st.iterrows():
        r = by_pid[s["pid"]]
        assert s["n_rows"] == r["n_rows"]
        assert s["live_rows"] == r["n_rows"] - len(r.get("deleted_rows")
                                                   or ())
        assert s["encoded_bytes"] == r["encoded_bytes"]
        assert s["has_bloom"]
        assert "tokens=" in s["codecs"]
        assert s["doc_id_min"] <= s["doc_id_max"]
    assert st["n_tokens"].sum() == sum(r["n_tokens"] for r in rows)


def test_plan_eq_uses_zonemap_and_bloom(store):
    out, path = store
    ids = pq.read_table(path, columns=["doc_id"]).column("doc_id") \
        .to_pylist()
    probe = sorted(ids)[len(ids) // 2]
    plan = planner.plan_scan(out, "doc_id", "eq", probe)
    assert plan["strategy"] in ("zonemap+bloom", "bloom")
    assert 1 <= plan["partitions_read"] < plan["partitions_total"]
    # a key that exists nowhere: zone maps may admit a range but the
    # bloom probes must reject essentially everything
    miss = planner.plan_scan(out, "doc_id", "eq", "zz-not-a-doc")
    assert miss["partitions_read"] <= 1
    assert miss["prune_ratio"] > 0.5


def test_plan_between_zonemap(store):
    out, path = store
    ids = sorted(pq.read_table(path, columns=["doc_id"]).column("doc_id")
                 .to_pylist())
    lo, hi = ids[10], ids[40]
    plan = planner.plan_scan(out, "doc_id", "between", lo, hi)
    assert plan["strategy"] == "zonemap"
    assert plan["partitions_read"] < plan["partitions_total"]
    assert plan["est_live_rows"] >= 31


def test_planned_scan_matches_full_decode(store):
    out, path = store
    ids = sorted(pq.read_table(path, columns=["doc_id"]).column("doc_id")
                 .to_pylist())
    lo, hi = ids[5], ids[60]
    ds, plan = planner.planned_scan(out, "doc_id", "between", lo, hi,
                                    columns=["doc_id", "n_tok"],
                                    concurrency=2)
    got = ds.to_pandas().sort_values("doc_id", ignore_index=True)
    full = pipeline.decode_job(out, columns=["doc_id", "n_tok"],
                               concurrency=2).to_pandas()
    want = full[(full["doc_id"] >= lo) & (full["doc_id"] <= hi)] \
        .sort_values("doc_id", ignore_index=True)
    assert got.equals(want)
    assert plan["partitions_read"] < plan["partitions_total"]

    ds2, plan2 = planner.planned_scan(out, "doc_id", "eq", ids[7],
                                      columns=["doc_id", "source"],
                                      concurrency=2)
    got2 = ds2.to_pandas()
    assert got2["doc_id"].tolist() == [ids[7]]
    assert plan2["partitions_read"] <= plan2["partitions_total"]


def test_plan_contains_tokens_routes_through_index(store):
    out, path = store
    # no index yet -> full scan strategy
    t = pq.read_table(path, columns=["tokens"])
    needle = [int(t.column("tokens")[0][0].as_py())]
    plan0 = planner.plan_scan(out, "tokens", "contains_tokens", needle)
    assert plan0["strategy"] == "full"
    invindex.build_token_index(out, concurrency=2)
    plan1 = planner.plan_scan(out, "tokens", "contains_tokens", needle)
    assert plan1["strategy"] == "token_index"
    assert plan1["partitions_read"] <= plan1["partitions_total"]
    # execution equals the brute-force contains check
    ds, _ = planner.planned_scan(out, "tokens", "contains_tokens", needle,
                                 concurrency=2)
    got = set(ds.to_pandas()["doc_id"])
    dec = pipeline.decode_job(out, columns=["doc_id", "n_tok", "tokens"],
                              concurrency=2).to_pandas()
    want = {d for d, toks in zip(dec["doc_id"], dec["tokens"])
            if needle[0] in np.asarray(toks)}
    assert got == want and got


def test_plan_full_when_no_stats_column(store):
    out, _ = store
    plan = planner.plan_scan(out, "nope", "eq", "x")
    # unknown column: no stats -> nothing prunes -> full
    assert plan["strategy"] == "full"
    assert plan["partitions_read"] == plan["partitions_total"]
    with pytest.raises(ValueError, match="op must be"):
        planner.plan_scan(out, "doc_id", "like", "x")


def test_ordered_limit_scan_prunes_and_matches(store):
    from rwcf import planner as pl
    out, path = store
    full = pipeline.decode_job(out, columns=["doc_id", "n_tok"],
                               concurrency=2).to_pandas()
    ds, plan = pl.ordered_limit_scan(out, "doc_id", 25,
                                     columns=["doc_id", "n_tok"],
                                     concurrency=2)
    got = ds.to_pandas()
    want = full.sort_values("doc_id", ignore_index=True).head(25)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["n_tok"].tolist() == want["n_tok"].tolist()
    # the clustered store answers ORDER BY LIMIT from a partition prefix
    assert plan["partitions_read"] < plan["partitions_total"]

    ds_d, plan_d = pl.ordered_limit_scan(out, "doc_id", 10,
                                         columns=["doc_id"],
                                         descending=True, concurrency=2)
    want_d = sorted(full["doc_id"], reverse=True)[:10]
    assert ds_d.to_pandas()["doc_id"].tolist() == want_d
    assert plan_d["partitions_read"] < plan_d["partitions_total"]


def test_ordered_limit_scan_respects_tombstones(store, tmp_path):
    from rwcf import planner as pl
    out, path = store
    full = pipeline.decode_job(out, columns=["doc_id"],
                               concurrency=2).to_pandas()
    first = sorted(full["doc_id"])[:3]
    pipeline.delete_docs(out, first, concurrency=2)
    try:
        ds, _ = pl.ordered_limit_scan(out, "doc_id", 5,
                                      columns=["doc_id"], concurrency=2)
        got = ds.to_pandas()["doc_id"].tolist()
        want = sorted(set(full["doc_id"]) - set(first))[:5]
        assert got == want
    finally:
        # undo for the module-scoped store fixture
        import os
        mdir = os.path.join(out, "manifest")
        for n in os.listdir(mdir):
            if n.endswith(".del.json"):
                os.remove(os.path.join(mdir, n))


def test_plan_scan_multi_intersects(store):
    from rwcf import planner as pl
    out, path = store
    ids = sorted(pq.read_table(path, columns=["doc_id"]).column("doc_id")
                 .to_pylist())
    lo, hi = ids[0], ids[50]
    multi = pl.plan_scan_multi(out, [("doc_id", "between", lo, hi),
                                     ("doc_id", "eq", ids[7])])
    single = pl.plan_scan(out, "doc_id", "eq", ids[7])
    assert set(multi["pids"]) <= set(single["pids"])
    assert multi["partitions_read"] <= single["partitions_read"]
    assert multi["strategy"].count("+") >= 1
    assert len(multi["per_pred"]) == 2


# ---------------------------------------------------------------------------
# join planning
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def join_stores(tmp_path_factory, ray_session):
    """Three stores over one 300-row tokens table: two co-bucketed on
    doc_id (-> spj), one plain tokens store + one small plain side table
    (-> broadcast), and the same pair with a tiny broadcast limit
    (-> hash)."""
    import os
    import pyarrow as pa
    import ray.data as rd
    from rwcf import spj

    tmp = tmp_path_factory.mktemp("planjoin")
    path = fixtures.tokens_parquet(300, seed=13, cache_dir=str(tmp / "tok"),
                                   row_group_size=100)
    side_dir = str(tmp / "sidepq")

    def derive(t):
        import pyarrow.compute as pc
        return pa.table({
            "doc_id": t.column("doc_id"),
            "len4": pc.cast(pc.bit_wise_and(t.column("n_tok"), 3),
                            pa.int32())})

    rd.read_parquet(path).map_batches(derive, batch_format="pyarrow") \
        .write_parquet(side_dir)
    side_files = [os.path.join(side_dir, f) for f in os.listdir(side_dir)
                  if f.endswith(".parquet")]

    ba = str(tmp / "ba")
    spj.bucket_store(path, pipeline.EncodeConfig(
        out_dir=ba, partition_token_budget=20_000), "doc_id", 4) \
        .materialize()
    bb = str(tmp / "bb")
    spj.bucket_store(side_files, pipeline.EncodeConfig(
        out_dir=bb, columns=["doc_id", "len4"],
        partition_token_budget=200), "doc_id", 4).materialize()

    plain = str(tmp / "plain")
    pipeline.encode_job(path, pipeline.EncodeConfig(
        out_dir=plain, partition_token_budget=20_000)).materialize()
    plain_side = str(tmp / "pside")
    pipeline.encode_job(side_files, pipeline.EncodeConfig(
        out_dir=plain_side, columns=["doc_id", "len4"],
        partition_token_budget=200)).materialize()

    src = rd.read_parquet(path).to_pandas()
    side = rd.read_parquet(side_files).to_pandas()
    return {"ba": ba, "bb": bb, "plain": plain, "pside": plain_side,
            "src": src, "side": side}


def _join_exp(js):
    return js["src"][["doc_id", "n_tok"]].merge(js["side"], on="doc_id")


def test_plan_join_picks_spj_for_cobucketed(join_stores):
    import pandas as pd
    plan = planner.plan_join(join_stores["ba"], join_stores["bb"])
    assert plan["strategy"] == "spj"
    assert plan["est_bytes_exchanged"] == 0
    ds, plan2 = planner.planned_join(
        join_stores["ba"], join_stores["bb"],
        columns_l=["doc_id", "n_tok"], columns_r=["doc_id", "len4"])
    assert plan2["strategy"] == "spj"
    got = ds.to_pandas()
    exp = _join_exp(join_stores)
    cols = ["doc_id", "n_tok", "len4"]
    pd.testing.assert_frame_equal(
        got[cols].sort_values(cols).reset_index(drop=True),
        exp[cols].sort_values(cols).reset_index(drop=True),
        check_dtype=False)


def test_plan_join_picks_broadcast_for_small_side(join_stores):
    import pandas as pd
    plan = planner.plan_join(join_stores["plain"], join_stores["pside"])
    assert plan["strategy"] == "broadcast"
    assert plan["est_bytes_exchanged"] == plan["right"]["decoded_bytes"]
    ds, _ = planner.planned_join(
        join_stores["plain"], join_stores["pside"],
        columns_l=["doc_id", "n_tok"], columns_r=["doc_id", "len4"])
    got = ds.to_pandas()
    exp = _join_exp(join_stores)
    cols = ["doc_id", "n_tok", "len4"]
    pd.testing.assert_frame_equal(
        got[cols].sort_values(cols).reset_index(drop=True),
        exp[cols].sort_values(cols).reset_index(drop=True),
        check_dtype=False)


def test_plan_join_merge_and_hash_fallbacks(join_stores):
    import pandas as pd
    # side too big to broadcast, but both stores' zone ranges are
    # key-clustered (sequential fixture) -> the metadata fanout is ~1
    # and the planner picks the zero-exchange range-merge join
    plan = planner.plan_join(join_stores["plain"], join_stores["pside"],
                             broadcast_row_limit=10)
    assert plan["strategy"] == "merge"
    assert plan["merge_fanout"] is not None and plan["merge_fanout"] <= 4
    assert plan["est_bytes_exchanged"] == 0
    ds, _ = planner.planned_join(
        join_stores["plain"], join_stores["pside"],
        columns_l=["doc_id", "n_tok"], columns_r=["doc_id", "len4"],
        broadcast_row_limit=10)
    got = ds.to_pandas()
    exp = _join_exp(join_stores)
    cols = ["doc_id", "n_tok", "len4"]
    pd.testing.assert_frame_equal(
        got[cols].sort_values(cols).reset_index(drop=True),
        exp[cols].sort_values(cols).reset_index(drop=True),
        check_dtype=False)
    # outer joins can neither broadcast nor range-merge -> hash
    plan2 = planner.plan_join(join_stores["plain"], join_stores["pside"],
                              how="outer")
    assert plan2["strategy"] == "hash"
    ds2, _ = planner.planned_join(
        join_stores["plain"], join_stores["pside"],
        columns_l=["doc_id", "n_tok"], columns_r=["doc_id", "len4"],
        how="outer")
    got2 = ds2.to_pandas()
    exp2 = join_stores["src"][["doc_id", "n_tok"]].merge(
        join_stores["side"], on="doc_id", how="outer")
    pd.testing.assert_frame_equal(
        got2[cols].sort_values(cols).reset_index(drop=True),
        exp2[cols].sort_values(cols).reset_index(drop=True),
        check_dtype=False)


def test_spj_snapshot_time_travel(join_stores, tmp_path):
    """Join AS OF a snapshot: rows appended to a bucketed store after the
    snapshot are invisible to snapshot_b."""
    import os
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pqt
    from rwcf import spj

    bb = join_stores["bb"]
    snap = pipeline.create_snapshot(bb, note="pre-append")["snapshot"]
    extra = pa.table({"doc_id": pa.array(["zzz-1", "zzz-2"]),
                      "len4": pa.array([9, 9], pa.int32())})
    ep = str(tmp_path / "extra.parquet")
    pqt.write_table(extra, ep)
    spj.bucket_store([ep], pipeline.EncodeConfig(
        out_dir=bb, columns=["doc_id", "len4"],
        partition_token_budget=200), "doc_id", 4).materialize()

    now = spj.storage_partitioned_join(
        join_stores["bb"], join_stores["bb"],
        columns_a=["doc_id", "len4"], columns_b=["doc_id"]).to_pandas()
    assert (now["len4"] == 9).sum() == 2
    old = spj.storage_partitioned_join(
        join_stores["bb"], join_stores["bb"],
        columns_a=["doc_id", "len4"], columns_b=["doc_id"],
        snapshot_a=snap, snapshot_b=snap).to_pandas()
    assert (old["len4"] == 9).sum() == 0
    assert len(old) == len(join_stores["side"])


def test_planned_join_pushdown_all_strategies(join_stores):
    import pandas as pd
    exp = _join_exp(join_stores)
    exp = exp[exp["len4"] <= 1]
    cols = ["doc_id", "n_tok", "len4"]
    w = {"col": "len4", "between": (0, 1)}
    for kw in (
        {},                                  # spj stores
        {"broadcast_row_limit": 10},         # merge (clustered ranges)
    ):
        ds, plan = planner.planned_join(
            join_stores["ba"] if not kw else join_stores["plain"],
            join_stores["bb"] if not kw else join_stores["pside"],
            columns_l=["doc_id", "n_tok"], columns_r=["doc_id", "len4"],
            where_r=w, **kw)
        got = ds.to_pandas()
        pd.testing.assert_frame_equal(
            got[cols].sort_values(cols).reset_index(drop=True),
            exp[cols].sort_values(cols).reset_index(drop=True),
            check_dtype=False)
    # broadcast strategy with filters on both sides
    ds, plan = planner.planned_join(
        join_stores["plain"], join_stores["pside"],
        columns_l=["doc_id", "n_tok"], columns_r=["doc_id", "len4"],
        where_l={"col": "n_tok", "between": (0, 1 << 30)}, where_r=w)
    assert plan["strategy"] in ("broadcast", "merge")
    got = ds.to_pandas()
    pd.testing.assert_frame_equal(
        got[cols].sort_values(cols).reset_index(drop=True),
        exp[cols].sort_values(cols).reset_index(drop=True),
        check_dtype=False)


def test_plan_eq_probes_int_bloom_with_int(tmp_path, ray_session):
    """Round-5 regression: an eq-plan over an INT-key bloom column must
    probe with the int hash path — a str(value) probe would hash down
    the string path and prune partitions that DO contain the value."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from rwcf import fixtures as fx
    path = fx.tokens_parquet(300, seed=17, cache_dir=str(tmp_path),
                             row_group_size=100)
    t = pq_.read_table(path)
    uid = pa.array((np.arange(t.num_rows) * 104729 % 10**6)
                   .astype(np.int64))
    t = t.append_column("uid", uid)
    src = str(tmp_path / "u.parquet")
    pq_.write_table(t, src, row_group_size=100)
    out = str(tmp_path / "enc")
    cfg = pipeline.EncodeConfig(
        out_dir=out, partition_token_budget=30_000,
        columns=["doc_id", "tokens", "n_tok", "source", "uid"],
        bloom_bits_per_key=10, bloom_columns=("uid",))
    pipeline.encode_job(src, cfg).materialize()

    probe = int(uid[137].as_py())
    ds, plan = planner.planned_scan(out, "uid", "eq", probe,
                                    columns=["doc_id", "uid"])
    got = ds.to_pandas()
    assert len(got) >= 1 and (got["uid"] == probe).all()
    assert "bloom" in plan["strategy"]


def test_plan_isnull_access_path(tmp_path, ray_session):
    """plan_scan op='isnull' prunes on the null_count zone map and the
    executed scan filters exactly."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from rwcf import fixtures as fx
    path = fx.tokens_parquet(400, seed=18, cache_dir=str(tmp_path),
                             row_group_size=100)
    t = pq_.read_table(path)
    idx = np.arange(t.num_rows)
    # nulls only in the FIRST quarter of rows -> later partitions prune
    score = pa.array((idx % 50).astype(np.int64), pa.int64(),
                     mask=(idx < 100) & (idx % 2 == 0))
    t = t.append_column("score", score)
    src = str(tmp_path / "n.parquet")
    pq_.write_table(t, src, row_group_size=100)
    out = str(tmp_path / "enc")
    cfg = pipeline.EncodeConfig(
        out_dir=out, partition_token_budget=25_000,
        columns=["doc_id", "tokens", "n_tok", "source", "score"])
    pipeline.encode_job(src, cfg).materialize()

    ds, plan = planner.planned_scan(out, "score", "isnull", True,
                                    columns=["doc_id", "score"])
    got = ds.to_pandas()
    assert len(got) == 50 and got["score"].isna().all()
    assert plan["strategy"] == "nullmap"
    assert plan["partitions_read"] < plan["partitions_total"]

    ds2, plan2 = planner.planned_scan(out, "score", "isnull", False,
                                      columns=["doc_id", "score"])
    got2 = ds2.to_pandas()
    assert len(got2) == 350 and got2["score"].notna().all()
