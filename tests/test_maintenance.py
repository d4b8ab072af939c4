"""vacuum(): the stats-driven maintenance autopilot composes compaction,
retention, manifest folding, gc and token-index upkeep — idempotent,
no-op on a healthy store, and the data is bit-identical afterwards.
"""

import os

import pyarrow.parquet as pq
import pytest

from rwcf import fixtures, invindex, maintenance, pipeline


@pytest.fixture()
def store(tmp_path, ray_session):
    path = fixtures.tokens_parquet(300, seed=29,
                                   cache_dir=str(tmp_path / "tok"),
                                   row_group_size=50)
    out = str(tmp_path / "out")
    cfg = pipeline.EncodeConfig(out_dir=out,
                                partition_token_budget=15_000)
    pipeline.encode_job(path, cfg, concurrency=2).materialize()
    return {"out": out, "src": path}


def _ids(out):
    return sorted(pipeline.decode_job(out, columns=["doc_id"],
                                      concurrency=2).to_pandas()["doc_id"])


def test_vacuum_full_lifecycle(store, tmp_path):
    out = store["out"]
    ids = pq.read_table(store["src"]).column("doc_id").to_pylist()
    invindex.build_token_index(out, concurrency=2)
    # dirty the store: tombstones, history, many small partitions
    pipeline.delete_docs(out, ids[:5], concurrency=2)
    for i in range(3):
        pipeline.create_snapshot(out, note=f"s{i}")
    before = _ids(out)
    n_parts_before = len(pipeline.load_manifest(out))

    plan = maintenance.maintenance_plan(out, target_tokens=200_000,
                                        retention_keep_last=1)
    assert plan["compaction_groups"] >= 1
    assert plan["tombstone_heavy"] or plan["compaction_members"] > 1
    assert len(plan["expirable_snapshots"]) == 2

    # keep_last=0: expire ALL history so the compacted-away members are
    # actually reclaimable (a surviving snapshot would rightly pin them,
    # keeping their index shards non-orphaned — tested separately below)
    res = maintenance.vacuum(out, target_tokens=200_000,
                             retention_keep_last=0, concurrency=2)
    # compaction merged small partitions and materialized tombstones
    after_rows = pipeline.load_manifest(out)
    assert len(after_rows) < n_parts_before
    assert not any(r.get("deleted_rows") for r in after_rows)
    assert len(pipeline.list_snapshots(out)) == 0
    # data unchanged
    assert _ids(out) == before
    # the index followed the rewrite: orphans gone, new pids indexed,
    # token search still answers
    assert res["index_orphans_removed"] >= 1
    live = {r["pid"] for r in after_rows}
    shards = {n[:-8] for n in os.listdir(os.path.join(out, "index",
                                                      "tokens"))}
    assert live <= shards
    tok = int(pq.read_table(store["src"]).column("tokens")[0][0].as_py())
    assert invindex.token_partitions(out, [tok]) <= live

    # second vacuum is a no-op
    res2 = maintenance.vacuum(out, target_tokens=200_000,
                              retention_keep_last=0, concurrency=2)
    assert res2["plan"]["compaction_groups"] == 0
    assert res2["plan"]["expirable_snapshots"] == []
    assert res2["index_orphans_removed"] == 0
    assert _ids(out) == before


def test_vacuum_noop_on_healthy_store(store):
    out = store["out"]
    # one pass makes it healthy at this target...
    maintenance.vacuum(out, target_tokens=200_000, concurrency=2)
    before = _ids(out)
    plan = maintenance.maintenance_plan(out, target_tokens=200_000)
    assert plan["compaction_groups"] == 0
    assert plan["loose_manifests"] == 0  # folded by the first pass
    res = maintenance.vacuum(out, target_tokens=200_000, concurrency=2)
    assert "compaction" not in res
    assert res["gc"] == {"files": 0, "manifests": 0}
    assert _ids(out) == before


def test_vacuum_respects_pinned_snapshots(store):
    """Partitions pinned by a surviving snapshot stay readable through
    it after vacuum (gc refuses them; time travel still works)."""
    out = store["out"]
    snap = pipeline.create_snapshot(out, note="keep")["snapshot"]
    pipeline.tag_snapshot(out, "golden", snap)
    maintenance.vacuum(out, target_tokens=200_000,
                       retention_keep_last=0, concurrency=2)
    # tagged snapshot survived retention and still decodes
    assert [s["snapshot"] for s in pipeline.list_snapshots(out)] == [snap]
    old = pipeline.decode_job(out, columns=["doc_id"], concurrency=2,
                              snapshot="golden").to_pandas()
    assert len(old) == 300
