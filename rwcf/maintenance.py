"""Store maintenance autopilot: stats-driven OPTIMIZE / VACUUM.

:func:`maintenance_plan` inspects ONLY metadata (manifest rows, snapshot
sidecars, index shard listing) and reports what upkeep the store needs:
small-partition compaction groups, tombstone-heavy partitions, loose
manifest JSONs to fold, snapshots past retention, orphan token-index
shards. :func:`vacuum` executes exactly that plan through the store's
existing primitives — ``compact_partitions`` (merge + materialize
deletes, atomic ``replaces`` commit), ``compact_manifest``,
``expire_snapshots`` retention, ``gc_store``, plus an orphan-shard sweep
for the persistent token index — so a long-running ingest can run one
idempotent ``vacuum()`` between jobs and keep scan cost flat as the
partition count grows.

Every step is O(partitions-that-need-work), crash-safe (each primitive
commits atomically and re-runs to completion) and a no-op on a healthy
store. The reference is a single write-once file with no maintenance
surface (src/lib.rs:29); this plays the role of Delta OPTIMIZE/VACUUM /
Iceberg rewrite_data_files + expire_snapshots for the mandated
10^12-sequence mutable-store extension.
"""

from __future__ import annotations

import os

from . import pipeline


def _orphan_index_shards(out_dir: str) -> list[str]:
    """Token-index shards whose pid no longer exists in ANY manifest row
    (not even as a replaced/compacted-away member) — pure disk waste;
    searches never read them (they list shards from live rows)."""
    from . import invindex
    idx = invindex._index_dir(out_dir)
    if not os.path.isdir(idx):
        return []
    live = {r["pid"] for r in
            pipeline.load_manifest(out_dir, include_replaced=True)}
    return sorted(
        os.path.join(idx, n) for n in os.listdir(idx)
        if n.endswith(".parquet") and n[:-8] not in live)


def maintenance_plan(out_dir: str, target_tokens: int = 8_000_000,
                     dead_frac: float = 0.1,
                     retention_keep_last: int | None = None) -> dict:
    """What a vacuum would do, from metadata only (no data IO)."""
    rows = pipeline.load_manifest(out_dir)
    groups = pipeline.plan_compaction(rows, target_tokens)
    heavy = [r["pid"] for r in rows
             if r["n_rows"]
             and len(r.get("deleted_rows") or ()) / r["n_rows"] > dead_frac]
    mdir = os.path.join(out_dir, "manifest")
    loose = len([n for n in os.listdir(mdir)
                 if n.endswith(".json") and not n.endswith(".del.json")
                 and n != "shadowed.json"]) \
        if os.path.isdir(mdir) else 0
    snaps = pipeline.list_snapshots(out_dir)
    expirable = []
    if retention_keep_last is not None:
        expirable = pipeline.expire_snapshots(
            out_dir, keep_last=retention_keep_last,
            dry_run=True)["would_expire"]
    return {
        "partitions": len(rows),
        "compaction_groups": len(groups),
        "compaction_members": sum(len(g) for g in groups),
        "tombstone_heavy": heavy,
        "loose_manifests": loose,
        "snapshots": len(snaps),
        "expirable_snapshots": expirable,
        "orphan_index_shards": len(_orphan_index_shards(out_dir)),
    }


def vacuum(out_dir: str, target_tokens: int = 8_000_000,
           dead_frac: float = 0.1,
           retention_keep_last: int | None = None,
           retention_older_than_s: float | None = None,
           refresh_index: bool = True,
           concurrency: int | None = None) -> dict:
    """Run the maintenance the plan calls for; returns plan + outcomes.

    Order matters: retention FIRST (dropping dead snapshots releases
    their gc pins, so the compaction that follows can actually reclaim
    the partitions it shadows), then compaction (which also materializes
    tombstones away and gc's), then manifest folding, then the index
    sweep — with an incremental ``build_token_index`` so compacted
    partitions get fresh shards and token search stays available."""
    plan = maintenance_plan(out_dir, target_tokens, dead_frac,
                            retention_keep_last)
    result: dict = {"plan": plan}
    if retention_keep_last is not None and plan["expirable_snapshots"]:
        result["retention"] = pipeline.expire_snapshots(
            out_dir, keep_last=retention_keep_last,
            older_than_s=retention_older_than_s)
    if plan["compaction_groups"]:
        result["compaction"] = pipeline.compact_partitions(
            out_dir, target_tokens=target_tokens,
            concurrency=concurrency)
    result["manifest"] = pipeline.compact_manifest(out_dir)
    result["gc"] = pipeline.gc_store(out_dir)
    from . import invindex
    had_index = os.path.isdir(invindex._index_dir(out_dir))
    orphans = _orphan_index_shards(out_dir)
    for p in orphans:
        os.remove(p)
    result["index_orphans_removed"] = len(orphans)
    if refresh_index and had_index:
        result["index"] = invindex.build_token_index(
            out_dir, concurrency=concurrency)
    return result
