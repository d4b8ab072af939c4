"""Storage-partitioned join (rwcf.spj): co-bucketed stores join with zero
exchanges — the write-once-shuffle / join-forever-free layout."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from rwcf import documents, pipeline, spj
from rwcf.joins import hash_bucket

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def stores(tmp_path_factory, ray_session):
    import ray.data as rd
    work = str(tmp_path_factory.mktemp("spj"))
    tokens_dir = documents.tokens_parquet_for(SF, work)
    paths = documents.parquet_files(tokens_dir)

    cfg_a = pipeline.EncodeConfig(out_dir=os.path.join(work, "a"),
                                  partition_token_budget=200_000)
    spj.bucket_store(paths, cfg_a, key="doc_id", n_buckets=8).materialize()

    # side table WITHOUT token payloads (exercises the n_tok-free encode)
    stats_dir = os.path.join(work, "bstats")

    def derive(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t.column("doc_id"),
            "len8": pc.cast(pc.bit_wise_and(t.column("n_tok"), 7),
                            pa.int32()),
            "source": t.column("source")})

    rd.read_parquet(paths).map_batches(derive, batch_format="pyarrow") \
        .write_parquet(stats_dir)
    cfg_b = pipeline.EncodeConfig(
        out_dir=os.path.join(work, "b"),
        columns=["doc_id", "len8", "source"],
        partition_token_budget=50_000)
    spj.bucket_store(documents.parquet_files(stats_dir), cfg_b,
                     key="doc_id", n_buckets=8).materialize()

    # PARTIAL b-side store: rows from buckets {0,1,2} only, so left/anti
    # joins hit genuinely missing right-side buckets
    part_dir = os.path.join(work, "bpart")

    def keep012(t: pa.Table) -> pa.Table:
        b = hash_bucket(np.asarray(t.column("doc_id").combine_chunks()),
                        buckets=8)
        return t.filter(pa.array(b <= 2))

    rd.read_parquet(stats_dir).map_batches(keep012, batch_format="pyarrow") \
        .write_parquet(part_dir)
    cfg_p = pipeline.EncodeConfig(
        out_dir=os.path.join(work, "bp"),
        columns=["doc_id", "len8", "source"],
        partition_token_budget=50_000)
    spj.bucket_store(documents.parquet_files(part_dir), cfg_p,
                     key="doc_id", n_buckets=8).materialize()

    src = rd.read_parquet(paths).to_pandas()
    side = rd.read_parquet(stats_dir).to_pandas()
    side_part = rd.read_parquet(part_dir).to_pandas()
    return {"a": cfg_a.out_dir, "b": cfg_b.out_dir, "bp": cfg_p.out_dir,
            "src": src, "side": side, "side_part": side_part}


def _canon(df, cols):
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_bucketspec_committed_and_guarded(stores):
    spec = spj.read_bucketspec(stores["a"])
    assert spec == {"key": "doc_id", "n_buckets": 8, "hash": "rwcf-fnv1a"}
    # idempotent identical re-commit; different spec refuses
    spj.write_bucketspec(stores["a"], "doc_id", 8)
    with pytest.raises(ValueError, match="refusing"):
        spj.write_bucketspec(stores["a"], "doc_id", 16)


def test_bucket_lineage_is_consistent(stores):
    rows = pipeline.load_manifest(stores["a"])
    assert rows, "bucketed store has partitions"
    for r in rows:
        lin = r["lineage"]
        assert lin["bucket_key"] == "doc_id" and lin["n_buckets"] == 8
        # every doc in the partition hashes to the lineage bucket
        t = pipeline.decode_partition(r, columns=["doc_id"])
        b = hash_bucket(np.asarray(t.column("doc_id").combine_chunks()),
                        buckets=8)
        assert (b == lin["bucket"]).all()


def test_inner_join_matches_pandas(stores):
    ds = spj.storage_partitioned_join(
        stores["a"], stores["b"],
        columns_a=["doc_id", "tokens", "n_tok"],
        columns_b=["doc_id", "len8", "source"], how="inner")
    got = ds.to_pandas()
    exp = stores["src"][["doc_id", "n_tok"]].merge(stores["side"],
                                                   on="doc_id")
    cols = ["doc_id", "n_tok", "len8", "source"]
    pd.testing.assert_frame_equal(_canon(got, cols), _canon(exp, cols),
                                  check_dtype=False)
    # nested payload survived the slim-join gather bit-exact
    row = got.sort_values("doc_id").iloc[0]
    src_row = stores["src"].set_index("doc_id").loc[row["doc_id"]]
    assert list(row["tokens"]) == list(src_row["tokens"])


def test_join_plan_has_no_shuffle(stores):
    ds = spj.storage_partitioned_join(
        stores["a"], stores["b"], columns_a=["doc_id", "n_tok"],
        columns_b=["doc_id", "len8"])
    ds = ds.materialize()
    stats = ds.stats()
    assert "AllToAll" not in stats and "Sort" not in stats \
        and "RandomShuffle" not in stats


def test_left_join_null_fills_missing_buckets(stores):
    ds = spj.storage_partitioned_join(
        stores["a"], stores["bp"], columns_a=["doc_id", "n_tok"],
        columns_b=["doc_id", "len8"], how="left")
    got = ds.to_pandas()
    exp = stores["src"][["doc_id", "n_tok"]].merge(
        stores["side_part"][["doc_id", "len8"]], on="doc_id", how="left")
    cols = ["doc_id", "n_tok", "len8"]
    pd.testing.assert_frame_equal(_canon(got, cols), _canon(exp, cols),
                                  check_dtype=False)
    assert got["len8"].isna().any(), "missing buckets must null-fill"


def test_semi_and_anti_partition_the_left_side(stores):
    semi = spj.storage_partitioned_join(
        stores["a"], stores["bp"], columns_a=["doc_id", "n_tok"],
        columns_b=["doc_id"], how="semi").to_pandas()
    anti = spj.storage_partitioned_join(
        stores["a"], stores["bp"], columns_a=["doc_id", "n_tok"],
        columns_b=["doc_id"], how="anti").to_pandas()
    present = set(stores["side_part"]["doc_id"])
    assert set(semi["doc_id"]) == set(stores["src"]["doc_id"]) & present
    assert set(anti["doc_id"]) == set(stores["src"]["doc_id"]) - present
    assert len(semi) + len(anti) == len(stores["src"])


def test_outer_join_covers_both_sides(stores):
    # outer with the partial side: identical to left here (b ⊆ a keyspace)
    ds = spj.storage_partitioned_join(
        stores["a"], stores["bp"], columns_a=["doc_id", "n_tok"],
        columns_b=["doc_id", "len8"], how="outer")
    got = ds.to_pandas()
    exp = stores["src"][["doc_id", "n_tok"]].merge(
        stores["side_part"][["doc_id", "len8"]], on="doc_id", how="outer")
    cols = ["doc_id", "n_tok", "len8"]
    pd.testing.assert_frame_equal(_canon(got, cols), _canon(exp, cols),
                                  check_dtype=False)


def test_incompatible_specs_raise(stores, tmp_path):
    import ray.data as rd
    other = str(tmp_path / "other")
    # same data, DIFFERENT n_buckets -> must refuse to join
    stats = pa.Table.from_pandas(stores["side"])
    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    import pyarrow.parquet as pq
    pq.write_table(stats, os.path.join(src_dir, "part-0.parquet"))
    cfg = pipeline.EncodeConfig(out_dir=other,
                                columns=["doc_id", "len8", "source"],
                                partition_token_budget=50_000)
    spj.bucket_store([os.path.join(src_dir, "part-0.parquet")], cfg,
                     key="doc_id", n_buckets=4).materialize()
    with pytest.raises(ValueError, match="incompatible"):
        spj.storage_partitioned_join(stores["a"], other)
    with pytest.raises(ValueError, match="bucketspec missing"):
        spj.storage_partitioned_join(stores["a"], str(tmp_path / "nope"))


def test_multiway_join_matches_pandas(stores):
    ds = spj.storage_partitioned_join_multi(
        [stores["a"], stores["b"], stores["bp"]],
        columns=[["doc_id", "n_tok"], ["doc_id", "len8"],
                 ["doc_id", "source"]])
    got = ds.to_pandas()
    exp = stores["src"][["doc_id", "n_tok"]] \
        .merge(stores["side"][["doc_id", "len8"]], on="doc_id") \
        .merge(stores["side_part"][["doc_id", "source"]], on="doc_id")
    cols = ["doc_id", "n_tok", "len8", "source"]
    pd.testing.assert_frame_equal(_canon(got, cols), _canon(exp, cols),
                                  check_dtype=False)
    st = ds.materialize().stats()
    assert "AllToAll" not in st and "Sort" not in st


def test_multiway_validates_specs(stores, tmp_path):
    with pytest.raises(ValueError, match="bucketspec missing"):
        spj.storage_partitioned_join_multi(
            [stores["a"], str(tmp_path / "missing")])
    with pytest.raises(ValueError, match="at least two"):
        spj.storage_partitioned_join_multi([stores["a"]])


def test_incremental_append_and_bucketed_compaction(stores, tmp_path):
    """A second batch of files APPENDS per-bucket partitions (input-tagged
    pids, no collision with batch 1); compaction on the bucketed store
    merges only within buckets, carries bucket lineage forward, and the
    zero-shuffle join stays correct afterwards."""
    import ray.data as rd
    import pyarrow.parquet as pq
    src = stores["src"]

    half1 = pa.table({"doc_id": pa.array(src["doc_id"][:250].astype(str)),
                      "val": pa.array(np.arange(250, dtype=np.int32))})
    half2 = pa.table({"doc_id": pa.array(src["doc_id"][250:].astype(str)),
                      "val": pa.array(np.arange(250, 500, dtype=np.int32))})
    d1, d2 = str(tmp_path / "h1.parquet"), str(tmp_path / "h2.parquet")
    pq.write_table(half1, d1)
    pq.write_table(half2, d2)

    out = str(tmp_path / "inc")
    cfg = pipeline.EncodeConfig(out_dir=out, columns=["doc_id", "val"],
                                partition_token_budget=64)
    spj.bucket_store([d1], cfg, key="doc_id", n_buckets=8).materialize()
    n1 = len(pipeline.load_manifest(out))
    spj.bucket_store([d2], cfg, key="doc_id", n_buckets=8).materialize()
    rows = pipeline.load_manifest(out)
    assert len(rows) > n1, "second batch must append new partitions"
    assert len({r["pid"] for r in rows}) == len(rows)

    ds = spj.storage_partitioned_join(
        stores["a"], out, columns_a=["doc_id", "n_tok"],
        columns_b=["doc_id", "val"], how="inner")
    got = ds.to_pandas()
    assert len(got) == 500 and set(got["val"]) == set(range(500))

    # compact: tiny budget forced many sub-partitions above; merge them
    res = pipeline.compact_partitions(out, target_tokens=1 << 20)
    assert res["parts_after"] < res["parts_before"]
    for r in pipeline.load_manifest(out):
        lin = r["lineage"]
        assert "bucket" in lin, "compacted rows must keep bucket lineage"
        if "compaction_of" in lin:
            t = pipeline.decode_partition(r, columns=["doc_id"])
            b = hash_bucket(
                np.asarray(t.column("doc_id").combine_chunks()), buckets=8)
            assert (b == lin["bucket"]).all(), "no cross-bucket merge"
    got2 = spj.storage_partitioned_join(
        stores["a"], out, columns_a=["doc_id", "n_tok"],
        columns_b=["doc_id", "val"], how="inner").to_pandas()
    pd.testing.assert_frame_equal(
        _canon(got, ["doc_id", "val"]), _canon(got2, ["doc_id", "val"]),
        check_dtype=False)


def test_materialized_join_view_incremental(stores, tmp_path):
    """Join view refresh is bucket-granular: an UPDATE touching one doc
    re-materializes exactly that doc's bucket; untouched view partitions
    keep their files."""
    import shutil
    from rwcf import update as upd

    # mutate a COPY of the b store (module fixture must stay pristine);
    # untouched partitions still resolve via their absolute paths
    bcopy = str(tmp_path / "bcopy")
    shutil.copytree(stores["b"], bcopy)

    view = str(tmp_path / "view")
    r1 = spj.materialize_join_view(
        view, stores["a"], bcopy,
        columns_a=["doc_id", "n_tok"], columns_b=["doc_id", "len8"])
    assert r1["refreshed"] == r1["buckets"] > 0 and r1["fresh"] == 0
    got = pipeline.decode_job(view).to_pandas()
    exp = stores["src"][["doc_id", "n_tok"]].merge(
        stores["side"][["doc_id", "len8"]], on="doc_id")
    cols = ["doc_id", "n_tok", "len8"]
    pd.testing.assert_frame_equal(_canon(got, cols), _canon(exp, cols),
                                  check_dtype=False)

    # no-op refresh: every bucket fingerprint is current
    r2 = spj.materialize_join_view(
        view, stores["a"], bcopy,
        columns_a=["doc_id", "n_tok"], columns_b=["doc_id", "len8"])
    assert r2["refreshed"] == 0 and r2["fresh"] == r2["buckets"]

    # update ONE doc on the b side -> exactly one bucket re-materializes
    mtimes = {r["pid"]: os.path.getmtime(r["file"])
              for r in pipeline.load_manifest(view)}
    upd.update_where(bcopy, "len8", 77, pred_col="doc_id", eq="7")
    r3 = spj.materialize_join_view(
        view, stores["a"], bcopy,
        columns_a=["doc_id", "n_tok"], columns_b=["doc_id", "len8"])
    assert r3["refreshed"] == 1 and r3["fresh"] == r3["buckets"] - 1
    got2 = pipeline.decode_job(view).to_pandas()
    assert (got2.loc[got2["doc_id"] == "7", "len8"] == 77).all()
    rest = got2[got2["doc_id"] != "7"].reset_index(drop=True)
    pd.testing.assert_frame_equal(
        _canon(rest, cols),
        _canon(exp[exp["doc_id"] != "7"], cols), check_dtype=False)
    kept = 0
    for r in pipeline.load_manifest(view):
        if r["pid"] in mtimes:
            assert os.path.getmtime(r["file"]) == mtimes[r["pid"]]
            kept += 1
    assert kept == r3["buckets"] - 1

    # the view is itself a bucketed store -> chains into further SPJs
    assert spj.read_bucketspec(view) == spj.read_bucketspec(stores["a"])
    again = spj.storage_partitioned_join(
        view, stores["b"], columns_a=["doc_id", "n_tok", "len8"],
        columns_b=["doc_id", "source"]).to_pandas()
    assert len(again) == len(exp)


def test_fsck_audits_bucket_assignment(stores, tmp_path):
    import json
    import shutil
    # clean bucketed store: every bucket_assignment row ok (deep proves
    # row-level hashes)
    rep = pipeline.fsck_store(stores["b"], deep=True).to_pandas()
    ba = rep[rep["check"] == "bucket_assignment"]
    assert len(ba) == len(pipeline.load_manifest(stores["b"]))
    assert ba["ok"].all()

    # injection: copy the store, point one manifest row at a WRONG bucket
    # — shallow fsck still passes (value in range), deep catches it
    bad = str(tmp_path / "bad")
    shutil.copytree(stores["b"], bad)
    mdir = os.path.join(bad, "manifest")
    mfile = sorted(f for f in os.listdir(mdir) if f.endswith(".json"))[0]
    with open(os.path.join(mdir, mfile)) as f:
        row = json.load(f)
    row["lineage"]["bucket"] = (row["lineage"]["bucket"] + 1) % 8
    # partition files are referenced by absolute path: keep data readable
    with open(os.path.join(mdir, mfile), "w") as f:
        json.dump(row, f)
    rep2 = pipeline.fsck_store(bad, deep=True).to_pandas()
    ba2 = rep2[rep2["check"] == "bucket_assignment"]
    assert not ba2["ok"].all(), "deep fsck must flag the wrong bucket"
    assert (~ba2["ok"]).sum() == 1

def test_fsck_plain_store_has_no_bucket_rows(stores, tmp_path):
    import pyarrow.parquet as pq
    src = str(tmp_path / "p.parquet")
    pq.write_table(pa.table({"doc_id": pa.array(["1", "2"]),
                             "val": pa.array([1, 2], pa.int32())}), src)
    cfg = pipeline.EncodeConfig(out_dir=str(tmp_path / "plain"),
                                columns=["doc_id", "val"])
    pipeline.encode_job([src], cfg).materialize()
    rep = pipeline.fsck_store(cfg.out_dir).to_pandas()
    assert not (rep["check"] == "bucket_assignment").any()
    assert rep["ok"].all()


def test_bucket_store_resume_reuses_partitions(stores):
    # re-running bucket_store over the same input touches no partition
    # files (manifest rows resolve from disk) — mtimes unchanged
    import ray.data as rd
    rows = pipeline.load_manifest(stores["b"])
    mtimes = {r["pid"]: os.path.getmtime(r["file"]) for r in rows}
    side_files = sorted({os.path.dirname(r["file"]) for r in rows})
    cfg = pipeline.EncodeConfig(
        out_dir=stores["b"], columns=["doc_id", "len8", "source"],
        partition_token_budget=50_000)
    # rebuild the same parquet input list from the fixture's stats dir
    stats_dir = os.path.join(os.path.dirname(stores["b"]), "bstats")
    spj.bucket_store(documents.parquet_files(stats_dir), cfg,
                     key="doc_id", n_buckets=8).materialize()
    rows2 = pipeline.load_manifest(stores["b"])
    assert {r["pid"] for r in rows2} == set(mtimes)
    for r in rows2:
        assert os.path.getmtime(r["file"]) == mtimes[r["pid"]]


# ---------------------------------------------------------------------------
# range-merge join over clustered stores
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def clustered_stores(tmp_path_factory, ray_session):
    """Two stores CLUSTERED by doc_id (disjoint zone ranges) + the raw
    frames, plus an UNclustered store for the fanout guard."""
    import ray.data as rd
    from rwcf import fixtures
    tmp = tmp_path_factory.mktemp("rmj")
    path = fixtures.tokens_parquet(400, seed=21,
                                   cache_dir=str(tmp / "tok"),
                                   row_group_size=100)
    a = str(tmp / "a")
    pipeline.encode_job(path, pipeline.EncodeConfig(
        out_dir=a, partition_token_budget=10_000)).materialize()
    pipeline.cluster_store(a, by="doc_id", target_tokens=10_000)

    side_dir = str(tmp / "spq")

    def derive(t):
        return pa.table({
            "doc_id": t.column("doc_id"),
            "len4": pc.cast(pc.bit_wise_and(t.column("n_tok"), 3),
                            pa.int32())})

    rd.read_parquet(path).map_batches(derive, batch_format="pyarrow") \
        .write_parquet(side_dir)
    sfiles = [os.path.join(side_dir, f) for f in os.listdir(side_dir)
              if f.endswith(".parquet")]
    b = str(tmp / "b")
    pipeline.encode_job(sfiles, pipeline.EncodeConfig(
        out_dir=b, columns=["doc_id", "len4"],
        partition_token_budget=50)).materialize()
    pipeline.cluster_store(b, by="doc_id", target_tokens=50)

    # genuinely UNclustered side: GLOBALLY interleave rows by key hash
    # (one file, hash order) so every 50-row partition's [min,max] spans
    # nearly the whole doc_id domain
    import pyarrow.parquet as pqt
    whole = pqt.read_table(sfiles)
    h = hash_bucket(np.asarray(whole.column("doc_id").combine_chunks()),
                    buckets=997)
    whole = whole.take(pa.array(np.argsort(h, kind="stable")))
    shuf = str(tmp / "shuffled.parquet")
    pqt.write_table(whole, shuf, row_group_size=100)
    unclustered = str(tmp / "u")
    pipeline.encode_job([shuf], pipeline.EncodeConfig(
        out_dir=unclustered, columns=["doc_id", "len4"],
        partition_token_budget=50)).materialize()

    src = rd.read_parquet(path).to_pandas()
    side = rd.read_parquet(sfiles).to_pandas()
    return {"a": a, "b": b, "u": unclustered, "src": src, "side": side}


def test_range_merge_join_matches_pandas(clustered_stores):
    cs = clustered_stores
    ds = spj.range_merge_join(cs["a"], cs["b"],
                              columns_a=["doc_id", "n_tok"],
                              columns_b=["doc_id", "len4"])
    got = ds.to_pandas()
    exp = cs["src"][["doc_id", "n_tok"]].merge(cs["side"], on="doc_id")
    cols = ["doc_id", "n_tok", "len4"]
    pd.testing.assert_frame_equal(_canon(got, cols), _canon(exp, cols),
                                  check_dtype=False)
    st = ds.materialize().stats()
    assert "AllToAll" not in st and "Sort" not in st


def test_range_merge_join_semi_anti_left(clustered_stores):
    cs = clustered_stores
    # restrict b to half the key space by deleting rows
    import shutil
    semi = spj.range_merge_join(cs["a"], cs["b"],
                                columns_a=["doc_id"],
                                columns_b=["doc_id"],
                                how="semi").to_pandas()
    anti = spj.range_merge_join(cs["a"], cs["b"],
                                columns_a=["doc_id"],
                                columns_b=["doc_id"],
                                how="anti").to_pandas()
    assert len(semi) == len(cs["src"]) and len(anti) == 0
    left = spj.range_merge_join(cs["a"], cs["b"],
                                columns_a=["doc_id", "n_tok"],
                                columns_b=["doc_id", "len4"],
                                how="left").to_pandas()
    assert len(left) == len(cs["src"]) and left["len4"].notna().all()


def test_range_merge_join_fanout_guard(clustered_stores):
    cs = clustered_stores
    with pytest.raises(ValueError, match="fanout"):
        spj.range_merge_join(cs["a"], cs["u"],
                             columns_a=["doc_id"],
                             columns_b=["doc_id", "len4"],
                             max_avg_fanout=1.5)
    with pytest.raises(ValueError, match="not supported"):
        spj.range_merge_join(cs["a"], cs["b"], how="outer")


def test_pushdown_prunes_and_matches(stores):
    """Predicate pushdown through the SPJ: zone maps prune partitions
    pre-decode, exact row filter applies in-task, results == post-join
    filter."""
    # bucketed stores sort by doc_id within bucket, so a doc_id range
    # predicate prunes sub-partitions via zone maps
    where = {"col": "len8", "between": (0, 3)}
    ds = spj.storage_partitioned_join(
        stores["a"], stores["b"], columns_a=["doc_id", "n_tok"],
        columns_b=["doc_id", "len8"], where_b=where)
    got = ds.to_pandas()
    exp = stores["src"][["doc_id", "n_tok"]].merge(
        stores["side"][["doc_id", "len8"]], on="doc_id")
    exp = exp[exp["len8"].between(0, 3)]
    cols = ["doc_id", "n_tok", "len8"]
    pd.testing.assert_frame_equal(_canon(got, cols), _canon(exp, cols),
                                  check_dtype=False)

    # pred column NOT in the output: decoded transiently, then dropped
    ds2 = spj.storage_partitioned_join(
        stores["a"], stores["b"], columns_a=["doc_id"],
        columns_b=["doc_id"], where_b=where, how="semi")
    semi = ds2.to_pandas()
    assert set(semi.columns) == {"doc_id"}
    assert set(semi["doc_id"]) == set(exp["doc_id"])

    # zone-map prune actually skips partitions for a clustered predicate
    rows = pipeline.load_manifest(stores["a"])
    lo = min(r["stats"]["doc_id"]["min"] for r in rows)
    kept = spj.prune_rows(rows, {"col": "doc_id", "eq": lo})
    assert 0 < len(kept) < len(rows)

    # illegal pushdowns refuse
    with pytest.raises(ValueError, match="preserved-side"):
        spj.storage_partitioned_join(
            stores["a"], stores["b"], how="left",
            where_a={"col": "n_tok", "between": (0, 10)})
    with pytest.raises(ValueError, match="outer-join"):
        spj.storage_partitioned_join(
            stores["a"], stores["b"], how="outer",
            where_b={"col": "len8", "eq": 1})


def test_refresh_view_from_committed_spec(stores, tmp_path):
    import shutil
    bcopy = str(tmp_path / "bc2")
    shutil.copytree(stores["b"], bcopy)
    view = str(tmp_path / "view2")
    spj.materialize_join_view(view, stores["a"], bcopy,
                              columns_a=["doc_id", "n_tok"],
                              columns_b=["doc_id", "len8"])
    spec = spj.read_viewspec(view)
    assert spec and spec["how"] == "inner"
    # definition is committed: a different definition refuses
    with pytest.raises(ValueError, match="already defined"):
        spj.materialize_join_view(view, stores["a"], bcopy,
                                  columns_a=["doc_id"],
                                  columns_b=["doc_id", "len8"])
    # one-call refresh picks up a side-store change
    from rwcf import update as upd
    upd.update_where(bcopy, "len8", 55, pred_col="doc_id", eq="11")
    res = spj.refresh_view(view)
    assert res["refreshed"] == 1
    got = pipeline.decode_job(view).to_pandas()
    assert (got.loc[got["doc_id"] == "11", "len8"] == 55).all()
    with pytest.raises(ValueError, match="viewspec"):
        spj.refresh_view(str(tmp_path / "notaview"))


def test_bucket_store_from_dataset(stores, tmp_path):
    import ray.data as rd
    out = str(tmp_path / "dsbucket")
    side = rd.from_pandas(stores["side"][["doc_id", "len8"]])
    cfg = pipeline.EncodeConfig(out_dir=out, columns=["doc_id", "len8"],
                                partition_token_budget=100)
    with pytest.raises(ValueError, match="run_tag"):
        spj.bucket_store(side, cfg, key="doc_id", n_buckets=8)
    spj.bucket_store(side, cfg, key="doc_id", n_buckets=8,
                     run_tag="batch-1").materialize()
    got = spj.storage_partitioned_join(
        stores["a"], out, columns_a=["doc_id", "n_tok"],
        columns_b=["doc_id", "len8"]).to_pandas()
    assert len(got) == len(stores["src"])


def test_view_freshness_probe(stores, tmp_path):
    import shutil
    from rwcf import update as upd
    bcopy = str(tmp_path / "bc3")
    shutil.copytree(stores["b"], bcopy)
    view = str(tmp_path / "view3")
    spj.materialize_join_view(view, stores["a"], bcopy,
                              columns_a=["doc_id", "n_tok"],
                              columns_b=["doc_id", "len8"])
    f0 = spj.view_freshness(view)
    assert f0["stale"] == 0 and f0["fresh"] == f0["buckets"] > 0
    upd.update_where(bcopy, "len8", 42, pred_col="doc_id", eq="3")
    f1 = spj.view_freshness(view)
    assert f1["stale"] == 1
    # the probe writes nothing: refresh still reports 1 bucket to do
    assert spj.refresh_view(view)["refreshed"] == 1
    assert spj.view_freshness(view)["stale"] == 0
