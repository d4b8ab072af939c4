"""Sort-order clustering maintenance (Delta OPTIMIZE-style): global
re-sort makes zone maps selective, committed as one atomic manifest
shard shadowing every pre-cluster partition; idempotent per epoch.
"""

import os

import pyarrow.parquet as pq
import pytest

from rwcf import fixtures, pipeline


@pytest.fixture()
def store(tmp_path, ray_session):
    path = fixtures.tokens_parquet(300, seed=23,
                                   cache_dir=str(tmp_path / "tok"),
                                   row_group_size=100)
    out = str(tmp_path / "out")
    cfg = pipeline.EncodeConfig(out_dir=out, partition_token_budget=30_000)
    pipeline.encode_job(path, cfg, concurrency=2).materialize()
    return {"out": out, "src": path}


def _admitting(out, col, probe):
    rows = pipeline.load_manifest(out)
    return sum(1 for r in rows
               if r["stats"][col]["min"] <= probe <= r["stats"][col]["max"]), \
        len(rows)


def _decoded(out):
    df = pipeline.decode_job(out, columns=["doc_id", "n_tok", "source"],
                             concurrency=2).to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


def test_cluster_makes_zone_maps_selective(store):
    out = store["out"]
    before_df = _decoded(out)
    probe = sorted(before_df["source"].unique())[2]
    adm_before, parts_before = _admitting(out, "source", probe)
    # unsorted ingest: interleaved sources make nearly every partition admit
    assert adm_before >= parts_before - 1 and adm_before > 1

    res = pipeline.cluster_store(out, by="source", target_tokens=30_000,
                                 concurrency=2)
    assert res["committed"] is True
    adm_after, parts_after = _admitting(out, "source", probe)
    assert parts_after > 1
    assert adm_after < parts_after, "clustering must make zone maps prune"

    # the rewrite is content-lossless
    after_df = _decoded(out)
    assert before_df.equals(after_df)

    # each clustered partition holds a disjoint sorted key range
    rows = sorted(pipeline.load_manifest(out), key=lambda r: r["pid"])
    spans = sorted((r["stats"]["source"]["min"], r["stats"]["source"]["max"])
                   for r in rows)
    for (a_lo, a_hi), (b_lo, b_hi) in zip(spans, spans[1:]):
        assert a_hi <= b_lo or (a_hi, a_lo) == (b_hi, b_lo) or a_hi <= b_hi


def test_cluster_idempotent_and_resumable(store):
    out = store["out"]
    res1 = pipeline.cluster_store(out, by="source", target_tokens=30_000,
                                  concurrency=2)
    assert res1["committed"] is True
    rows1 = {r["pid"] for r in pipeline.load_manifest(out)}
    # same epoch would only recur if the pid set were unchanged — but the
    # clustered pids replaced it, so a rerun starts a NEW epoch over the
    # already-clustered layout and still converges losslessly
    res2 = pipeline.cluster_store(out, by="source", target_tokens=30_000,
                                  concurrency=2)
    assert res2["epoch"] != res1["epoch"]
    assert {r["pid"] for r in pipeline.load_manifest(out)} != rows1
    assert len(_decoded(out)) == 300


@pytest.fixture()
def wide_store(tmp_path, ray_session):
    path = fixtures.tokens_parquet(900, seed=29,
                                   cache_dir=str(tmp_path / "tok"),
                                   row_group_size=150)
    out = str(tmp_path / "out")
    cfg = pipeline.EncodeConfig(out_dir=out, partition_token_budget=15_000)
    pipeline.encode_job(path, cfg, concurrency=2).materialize()
    return {"out": out, "src": path}


def _admit_frac(out, col, lo, hi):
    rows = pipeline.load_manifest(out)
    n = sum(1 for r in rows
            if not (r["stats"][col]["max"] < lo
                    or r["stats"][col]["min"] > hi))
    return n / len(rows), len(rows)


def test_zorder_prunes_on_every_listed_dimension(wide_store):
    out = wide_store["out"]
    before_df = _decoded(out)
    src_probe = sorted(before_df["source"].unique())[1]
    n_lo, n_hi = 120, 160

    res = pipeline.cluster_store(out, by=["source", "n_tok"],
                                 order="zorder", target_tokens=15_000,
                                 concurrency=2)
    assert res["committed"] is True
    # lossless rewrite
    ntk = pipeline.decode_job(out, columns=["doc_id", "n_tok"],
                              concurrency=2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert ntk["n_tok"].tolist() == before_df["n_tok"].tolist()

    f_src, parts = _admit_frac(out, "source", src_probe, src_probe)
    f_ntk, _ = _admit_frac(out, "n_tok", n_lo, n_hi)
    assert parts > 4
    # z-order: BOTH dimensions prune (a linear sort by source would leave
    # every partition admitting every n_tok range)
    assert f_src < 1.0
    assert f_ntk < 1.0


def test_zorder_beats_linear_on_second_dimension(wide_store, tmp_path):
    out = wide_store["out"]
    # linear clustering by source first: n_tok zone maps stay useless
    pipeline.cluster_store(out, by="source", target_tokens=15_000,
                           concurrency=2)
    f_lin, parts = _admit_frac(out, "n_tok", 120, 160)
    res = pipeline.cluster_store(out, by=["source", "n_tok"],
                                 order="zorder", target_tokens=15_000,
                                 concurrency=2)
    assert res["committed"] is True
    f_z, _ = _admit_frac(out, "n_tok", 120, 160)
    assert f_z < f_lin, (f_z, f_lin)


def test_zorder_validation(store):
    with pytest.raises(ValueError, match="2-4 columns"):
        pipeline.cluster_store(store["out"], by="source", order="zorder")
    with pytest.raises(ValueError, match="unknown order"):
        pipeline.cluster_store(store["out"], by="source", order="hilbert")


def test_cluster_materializes_deletes_and_respects_snapshots(store):
    out = store["out"]
    ids = sorted(pq.read_table(store["src"]).column("doc_id").to_pylist())
    pipeline.create_snapshot(out)
    pipeline.delete_docs(out, ids[:3], concurrency=2)
    pipeline.cluster_store(out, by="source", target_tokens=30_000,
                           concurrency=2)
    df = _decoded(out)
    assert len(df) == 297 and not set(ids[:3]) & set(df["doc_id"])
    # no tombstone sidecars survive the rewrite
    assert not any(r.get("deleted_rows") for r in pipeline.load_manifest(out))
    # the pre-cluster snapshot still time-travels (gc kept pinned files)
    old = pipeline.decode_job(out, columns=["doc_id"], concurrency=2,
                              snapshot="snap-00000").to_pandas()
    assert sorted(old["doc_id"]) == ids


def test_incremental_cluster_rewrites_only_overlaps(store, tmp_path):
    """Round-5: cluster_store_incremental re-sorts ONLY partitions whose
    `by` ranges strictly overlap (new ingest + intruded clusters);
    interior-disjoint partitions keep their files and mtimes, and the
    clustered invariant is restored."""
    import pyarrow as pa
    out = store["out"]
    pipeline.cluster_store(out, by="doc_id", target_tokens=15_000,
                           concurrency=2)
    before_df = _decoded(out)

    # fresh clustered store (unique keys -> strictly disjoint ranges):
    # nothing overlaps -> no-op epoch
    res0 = pipeline.cluster_store_incremental(out, by="doc_id",
                                              target_tokens=15_000)
    assert res0["committed"] is False and res0["parts_rewritten"] == 0

    # append rows whose doc_ids INTRUDE into the first cluster's range
    # (suffixing an existing mid-range id sorts right after it)
    base = pq.read_table(store["src"]).slice(0, 20)
    ids = [f"doc-{i:012d}x" for i in range(3, 23)]
    new = base.set_column(base.schema.get_field_index("doc_id"), "doc_id",
                          pa.array(ids, pa.string()))
    new_path = str(tmp_path / "new.parquet")
    pq.write_table(new, new_path, row_group_size=10)
    cfg = pipeline.EncodeConfig(out_dir=out,
                                partition_token_budget=15_000)
    pipeline.encode_job(new_path, cfg, concurrency=2).materialize()

    rows = pipeline.load_manifest(out)
    mtimes = {r["pid"]: os.path.getmtime(r["file"]) for r in rows}
    lo_new, hi_new = min(ids), max(ids)
    clean = {r["pid"] for r in rows
             if r["stats"]["doc_id"]["max"] < lo_new
             or r["stats"]["doc_id"]["min"] > hi_new}
    assert clean, "fixture must leave some partitions outside the new range"

    res = pipeline.cluster_store_incremental(out, by="doc_id",
                                             target_tokens=15_000)
    assert res["committed"] is True
    assert 0 < res["parts_rewritten"] < res["parts_before"]

    after_rows = pipeline.load_manifest(out)
    after_pids = {r["pid"] for r in after_rows}
    for p in clean:  # untouched: same pid, same file mtime
        assert p in after_pids
        r = next(r for r in after_rows if r["pid"] == p)
        assert os.path.getmtime(r["file"]) == mtimes[p]

    # strict-disjointness restored store-wide
    sp = sorted((r["stats"]["doc_id"]["min"], r["stats"]["doc_id"]["max"])
                for r in after_rows)
    for (lo1, hi1), (lo2, hi2) in zip(sp, sp[1:]):
        assert hi1 < lo2, (sp,)

    # decode equality: every original + appended row present exactly once
    got = _decoded(out)
    exp_ids = set(before_df["doc_id"]) | set(ids)
    assert set(got["doc_id"]) == exp_ids
    assert len(got) == len(before_df) + len(ids)

    # idempotent: rerun is a no-op (nothing overlaps anymore)
    res2 = pipeline.cluster_store_incremental(out, by="doc_id",
                                              target_tokens=15_000)
    assert res2["committed"] is False and res2["parts_rewritten"] == 0
