"""Snapshots / time travel over the manifest: AS-OF reads survive later
deletes, upserts, compaction and GC; expiry releases pinned partitions.

The reference is a write-once single-file format (src/lib.rs:29); the
snapshot layer versions the mandated multi-partition store the way
Iceberg/Delta version a table — O(partitions) metadata sidecars over
immutable data files, never a data copy.
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rwcf import fixtures, pipeline


def _rows(pairs):
    ids, texts = zip(*pairs)
    toks = [np.frombuffer(t.encode(), dtype=np.uint8).astype(np.int32)
            for t in texts]
    offsets = np.concatenate(([0], np.cumsum([t.size for t in toks])))
    la = pa.LargeListArray.from_arrays(
        offsets.astype(np.int64),
        pa.array(np.concatenate(toks), pa.int32())).cast(pa.list_(pa.int32()))
    return pa.table({
        "doc_id": pa.array(list(ids), pa.string()),
        "tokens": la,
        "n_tok": pa.array([t.size for t in toks], pa.int32()),
        "source": pa.array(["upsert"] * len(ids), pa.string()),
    })


DELETED = ["doc-000000000003", "doc-000000000201"]
UPDATED = [("doc-000000000005", "rewritten-5")]


@pytest.fixture()
def store(tmp_path, ray_session):
    path = fixtures.tokens_parquet(300, seed=91,
                                   cache_dir=str(tmp_path / "tok"),
                                   row_group_size=100)
    out = str(tmp_path / "out")
    cfg = pipeline.EncodeConfig(out_dir=out, partition_token_budget=30_000,
                                bloom_bits_per_key=10)
    pipeline.encode_job(path, cfg, concurrency=2).materialize()
    return {"out": out, "src": path}


def _ids(out, snapshot=None):
    df = pipeline.decode_job(out, columns=["doc_id"], concurrency=2,
                             snapshot=snapshot).to_pandas()
    return sorted(df["doc_id"])


def test_time_travel_across_mutations_and_gc(store):
    out = store["out"]
    orig = sorted(pq.read_table(store["src"]).column("doc_id").to_pylist())

    s0 = pipeline.create_snapshot(out, note="pristine")
    assert s0["snapshot"] == "snap-00000"
    assert s0["n_rows"] == 300

    pipeline.delete_docs(out, DELETED, concurrency=2)
    s1 = pipeline.create_snapshot(out, note="post-delete")
    assert s1["n_rows"] == 298

    pipeline.upsert_docs(out, _rows(UPDATED), concurrency=2)
    pipeline.compact_partitions(out, target_tokens=10**9, concurrency=2)

    # current view: deletes + upsert applied, store compacted
    cur = _ids(out)
    want_cur = sorted(set(orig) - set(DELETED) | {UPDATED[0][0]})
    assert cur == want_cur
    # time travel: snap-00000 is the pristine corpus, bit-identical
    assert _ids(out, snapshot="snap-00000") == orig
    dec0 = pipeline.decode_job(out, snapshot="snap-00000",
                               concurrency=2).to_pandas() \
        .set_index("doc_id").sort_index()
    src = pq.read_table(store["src"]).to_pandas() \
        .set_index("doc_id").sort_index()
    assert all(np.array_equal(a, b)
               for a, b in zip(dec0["tokens"], src["tokens"]))
    # snap-00001 sees the deletes but not the upsert
    assert _ids(out, snapshot="snap-00001") == sorted(set(orig) - set(DELETED))

    snaps = pipeline.list_snapshots(out)
    assert [s["snapshot"] for s in snaps] == ["snap-00000", "snap-00001"]
    assert snaps[0]["note"] == "pristine"
    assert snaps[1]["deleted_rows"] == 2

    # compaction's gc ran with snapshots live: pinned members survive
    pinned = pipeline._snapshot_pinned_pids(out)
    live = {r["pid"] for r in pipeline.load_manifest(out)}
    assert pinned - live, "snapshots should pin replaced (pre-compaction) pids"

    # expiry releases the pins; gc then reclaims, and time travel raises
    pipeline.expire_snapshot(out, "snap-00000")
    pipeline.expire_snapshot(out, "snap-00001")
    gc = pipeline.gc_store(out)
    assert gc["files"] > 0
    assert _ids(out) == want_cur  # current view untouched by gc
    with pytest.raises(FileNotFoundError):
        pipeline.load_manifest(out, snapshot="snap-00000")


def test_snapshot_is_immutable_under_later_delete(store):
    out = store["out"]
    pipeline.create_snapshot(out)
    pipeline.delete_docs(out, DELETED, concurrency=2)
    # later tombstones must not leak into the old snapshot's view
    assert len(_ids(out, snapshot="snap-00000")) == 300
    assert len(_ids(out)) == 298


def test_snapshot_sequence_and_expire_missing(store):
    out = store["out"]
    a = pipeline.create_snapshot(out)
    b = pipeline.create_snapshot(out)
    assert (a["snapshot"], b["snapshot"]) == ("snap-00000", "snap-00001")
    assert pipeline.expire_snapshot(out, "snap-00000")["expired"]
    c = pipeline.create_snapshot(out)
    assert c["snapshot"] == "snap-00002"  # ids never reused after expiry
    assert pipeline.expire_snapshot(out, "snap-09999")["expired"] is None


# ---------------------------------------------------------------------------
# CDC scan between snapshots
# ---------------------------------------------------------------------------

NEW_DOC = [("doc-999999999999", "brand-new-cdc-doc")]


def _cdc_sorted(out, a, b=None):
    ds = pipeline.cdc_scan(out, a, to_snapshot=b, buckets=4, concurrency=2)
    assert set(ds.schema().names) == {"doc_id", "op"}
    df = ds.to_pandas()
    if df.empty:  # this Ray's to_pandas drops columns on 0-row datasets
        return []
    return sorted(map(tuple, df[["doc_id", "op"]].itertuples(index=False)))


def test_cdc_scan_logical_delta_with_pruning(store):
    out = store["out"]
    pipeline.create_snapshot(out, note="pristine")
    pipeline.delete_docs(out, DELETED, concurrency=2)
    pipeline.upsert_docs(out, _rows(UPDATED + NEW_DOC), concurrency=2)
    pipeline.create_snapshot(out, note="mutated")

    plan = pipeline.cdc_plan(out, "snap-00000", "snap-00001")
    # most partitions are untouched by the 4-doc delta: pruned unread
    assert plan["pruned"] > 0
    assert plan["changed_from"] < plan["parts_from"]
    assert plan["changed_to"] <= plan["changed_from"] + 2  # + upsert parts

    want = sorted([(d, "delete") for d in DELETED]
                  + [(UPDATED[0][0], "update"), (NEW_DOC[0][0], "insert")])
    assert _cdc_sorted(out, "snap-00000", "snap-00001") == want
    # current view == snap-00001: empty delta both ways
    assert _cdc_sorted(out, "snap-00001") == []
    assert _cdc_sorted(out, "snap-00000", "snap-00000") == []


def test_cdc_scan_invariant_to_compaction_rewrite(store):
    out = store["out"]
    pipeline.create_snapshot(out)
    pipeline.delete_docs(out, DELETED, concurrency=2)
    pipeline.upsert_docs(out, _rows(UPDATED), concurrency=2)
    pipeline.create_snapshot(out)
    # rewrite every partition: physical layout churns, logical delta must not
    res = pipeline.compact_partitions(out, target_tokens=10**9, concurrency=2)
    assert res["parts_after"] < res["parts_before"]

    want = sorted([(d, "delete") for d in DELETED]
                  + [(UPDATED[0][0], "update")])
    assert _cdc_sorted(out, "snap-00000") == want
    # snap-00001 -> compacted current: pure rewrite, no logical change,
    # even though zero partitions could be pruned at the manifest level
    plan = pipeline.cdc_plan(out, "snap-00001")
    assert plan["pruned"] == 0
    assert _cdc_sorted(out, "snap-00001") == []


def test_incremental_source_stats_matches_full(store):
    out = store["out"]
    pipeline.create_snapshot(out)
    prev = pipeline.source_stats_job(out, snapshot="snap-00000",
                                     concurrency=2)
    pipeline.delete_docs(out, DELETED, concurrency=2)
    pipeline.upsert_docs(out, _rows(UPDATED + NEW_DOC), concurrency=2)
    # physical rewrite between the snapshots must not disturb the delta
    pipeline.compact_partitions(out, target_tokens=10**9, concurrency=2)

    inc = pipeline.incremental_source_stats(out, "snap-00000", prev) \
        .sort_values("source").reset_index(drop=True)
    full = pipeline.source_stats_job(out, concurrency=2) \
        .sort_values("source").reset_index(drop=True)
    assert inc.equals(full)
    # rolling an empty delta forward is the identity
    pipeline.create_snapshot(out)
    again = pipeline.incremental_source_stats(out, "snap-00001", full) \
        .sort_values("source").reset_index(drop=True)
    assert again.equals(full)


def test_snapshot_tags_resolve_and_guard(tmp_path, ray_session):
    from rwcf import fixtures, pipeline
    path = fixtures.tokens_parquet(120, seed=97,
                                   cache_dir=str(tmp_path / "tok"),
                                   row_group_size=40)
    out = str(tmp_path / "out")
    cfg = pipeline.EncodeConfig(out_dir=out,
                                partition_token_budget=15_000)
    pipeline.encode_job(path, cfg, concurrency=2).materialize()
    snap = pipeline.create_snapshot(out, note="pristine")["snapshot"]
    res = pipeline.tag_snapshot(out, "golden")  # latest by default
    assert res["snapshot"] == snap
    assert pipeline.list_tags(out) == {"golden": snap}

    ids = pq.read_table(path).column("doc_id").to_pylist()
    pipeline.delete_docs(out, ids[:3], concurrency=2)
    # every snapshot reader resolves the tag through load_manifest
    by_tag = pipeline.decode_job(out, columns=["doc_id"], concurrency=2,
                                 snapshot="golden").to_pandas()
    by_id = pipeline.decode_job(out, columns=["doc_id"], concurrency=2,
                                snapshot=snap).to_pandas()
    assert sorted(by_tag["doc_id"]) == sorted(by_id["doc_id"])
    assert len(by_tag) == 120  # pre-delete view

    import pytest as _pytest
    with _pytest.raises(ValueError, match="still referenced"):
        pipeline.expire_snapshot(out, snap)
    # re-tag moves the ref atomically; delete_tag releases the guard
    snap2 = pipeline.create_snapshot(out, note="post-delete")["snapshot"]
    pipeline.tag_snapshot(out, "golden", snap2)
    assert pipeline.expire_snapshot(out, snap)["expired"] == snap
    assert len(pipeline.decode_job(out, columns=["doc_id"], concurrency=2,
                                   snapshot="golden").to_pandas()) == 117
    pipeline.delete_tag(out, "golden")
    with _pytest.raises(FileNotFoundError):
        pipeline.resolve_ref(out, "golden")


def test_expire_snapshots_retention_policy(store, tmp_path):
    """Bulk retention: keep the newest N + tagged + live branch bases;
    expired snapshots release their gc pins; dry_run plans without
    deleting; keep_tagged=False drops the tag along with its snapshot."""
    out = store["out"]
    import pyarrow.parquet as pq
    ids = pq.read_table(store["src"]).column("doc_id").to_pylist()
    s0 = pipeline.create_snapshot(out, note="s0")["snapshot"]
    pipeline.delete_docs(out, ids[:2], concurrency=2)
    s1 = pipeline.create_snapshot(out, note="s1")["snapshot"]
    pipeline.delete_docs(out, ids[2:4], concurrency=2)
    s2 = pipeline.create_snapshot(out, note="s2")["snapshot"]
    s3 = pipeline.create_snapshot(out, note="s3")["snapshot"]
    pipeline.tag_snapshot(out, "golden", s1)
    br = pipeline.create_branch(out, "ret")  # base = fresh snapshot s4

    # newest = the branch base; keep_last=1 protects only it, plus the
    # tag on s1 and the branch base (doubly protected)
    plan = pipeline.expire_snapshots(out, keep_last=1, dry_run=True)
    assert plan["expired"] == [] \
        and set(plan["would_expire"]) == {s0, s2, s3}
    # still all present
    assert {s["snapshot"] for s in pipeline.list_snapshots(out)} == \
        {s0, s1, s2, s3, br["base"]}

    res = pipeline.expire_snapshots(out, keep_last=1)
    assert set(res["expired"]) == {s0, s2, s3}
    kept = {s["snapshot"] for s in pipeline.list_snapshots(out)}
    assert kept == {s1, br["base"]}  # tagged + branch base

    # grace window protects young snapshots regardless of count
    res2 = pipeline.expire_snapshots(out, keep_last=0, keep_tagged=True,
                                     older_than_s=3600)
    assert res2["expired"] == []

    # dropping tagged history removes the tag too (no dangling refs)
    pipeline.delete_branch(out, "ret")
    res3 = pipeline.expire_snapshots(out, keep_last=0, keep_tagged=False)
    assert s1 in res3["expired"]
    assert "golden" not in pipeline.list_tags(out)
    assert pipeline.list_snapshots(out) == []
    # the store itself is untouched by retention
    assert len(_ids(out)) == 300 - 4
