"""Row-level deletes via tombstone sidecars: every reader filters them,
deletes are idempotent and crash-safe, compaction materializes them away.

The reference has no mutation path at all (write-once byte sink,
src/lib.rs:29); deletes belong to the mandated scale extension — the
position-delete design Iceberg/Delta use, over this store's manifest.
"""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rwcf import fixtures, pipeline


@pytest.fixture(scope="module")
def store(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("delstore")
    path = fixtures.tokens_parquet(500, seed=31, cache_dir=str(d / "tok"),
                                   row_group_size=125)
    out = str(d / "out")
    cfg = pipeline.EncodeConfig(out_dir=out, partition_token_budget=40_000,
                                bloom_bits_per_key=10)
    pipeline.encode_job(path, cfg, concurrency=2).materialize()
    return {"out": out, "src": path, "cfg": cfg}


DEAD = [f"doc-{i:012d}" for i in (3, 77, 240, 241, 499)]


def _live_src(src_path):
    t = pq.read_table(src_path)
    mask = [d not in DEAD for d in t.column("doc_id").to_pylist()]
    return t.filter(pa.array(mask))


def test_delete_docs_and_all_readers(store):
    res = pipeline.delete_docs(store["out"], DEAD, concurrency=2)
    assert res["rows_deleted"] == len(DEAD)
    assert res["partitions"] >= 1

    # decode_job: deleted rows invisible, everything else bit-identical
    dec = pipeline.decode_job(store["out"], concurrency=2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    src = _live_src(store["src"]).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert dec["doc_id"].tolist() == src["doc_id"].tolist()
    assert all(np.array_equal(a, b) for a, b in
               zip(dec["tokens"], src["tokens"]))

    # verify_job: both lineage modes honor tombstones
    ver = pipeline.verify_job(store["out"], concurrency=2).to_pandas()
    assert ver["equal"].all()

    # point lookup: dead keys gone, live keys found
    found = pipeline.lookup_docs(store["out"],
                                 DEAD + ["doc-" + "0" * 11 + "5"],
                                 concurrency=2).to_pandas()
    assert set(found["doc_id"]) == {"doc-" + "0" * 11 + "5"}

    # range scan spanning two dead ids returns only live rows
    lo, hi = "doc-000000000238", "doc-000000000243"
    got = pipeline.range_scan_docs(store["out"], lo, hi,
                                   concurrency=2).to_pandas()
    assert set(got["doc_id"]) == {f"doc-{i:012d}" for i in (238, 239, 242,
                                                            243)}

    # idempotent: re-deleting the same keys is a no-op
    res2 = pipeline.delete_docs(store["out"], DEAD, concurrency=2)
    assert res2["rows_deleted"] == 0


def test_delete_late_materialization_and_stats(store):
    # late_materialized_sum over a store with tombstones == oracle over
    # live rows only
    src = _live_src(store["src"])
    mask = pa.compute.equal(src.column("source"), "src3")
    want_rows = pa.compute.sum(pa.compute.cast(mask, pa.int64())).as_py()
    want_sum = pa.compute.sum(
        pa.compute.if_else(mask, src.column("n_tok"),
                           pa.scalar(0, pa.int32())).cast(pa.int64())).as_py()
    got = pipeline.late_materialized_sum(store["out"], "source", "src3",
                                         "n_tok", concurrency=2)
    assert int(got["n_rows"][0]) == want_rows
    assert int(got["sum_val"][0]) == want_sum

    # stats_only_minmax: falls back to live-row extrema on tombstoned
    # partitions (a deleted row may hold the physical min/max)
    live_n = src.column("n_tok").to_numpy()
    mm = pipeline.stats_only_minmax(store["out"], "n_tok", concurrency=2)
    assert int(mm["lo"][0]) == int(live_n.min())
    assert int(mm["hi"][0]) == int(live_n.max())


def test_tombstone_union_and_crash_artifacts(store):
    # a second delete of different keys union-merges per-partition
    more = ["doc-000000000100"]
    res = pipeline.delete_docs(store["out"], more, concurrency=2)
    assert res["rows_deleted"] == 1
    tombs = [n for n in os.listdir(os.path.join(store["out"], "manifest"))
             if n.endswith(".del.json")]
    assert tombs
    total = 0
    for n in tombs:
        t = json.load(open(os.path.join(store["out"], "manifest", n)))
        assert t["deleted_rows"] == sorted(set(t["deleted_rows"]))
        total += len(t["deleted_rows"])
    assert total == len(DEAD) + 1
    # a leftover .tmp file (simulated crash) is ignored by readers
    junk = os.path.join(store["out"], "manifest", tombs[0] + ".tmp999")
    open(junk, "w").write("{corrupt")
    n_rows = pipeline.decode_job(store["out"], concurrency=2) \
        .count()
    assert n_rows == 500 - len(DEAD) - 1
    os.remove(junk)


def test_compaction_materializes_deletes(store):
    res = pipeline.compact_partitions(store["out"], target_tokens=400_000,
                                      concurrency=2)
    assert res["groups"] >= 1
    rows = pipeline.load_manifest(store["out"])
    # merged partitions carry no tombstones; any untouched singleton may
    mdir = os.path.join(store["out"], "manifest")
    for r in rows:
        if r["pid"].startswith("cmp-"):
            assert not r.get("deleted_rows")
            assert not os.path.exists(
                os.path.join(mdir, f"{r['pid']}.del.json"))
    # decoded view unchanged by the rewrite
    dec = pipeline.decode_job(store["out"], concurrency=2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(dec) == 500 - len(DEAD) - 1
    assert not set(DEAD) & set(dec["doc_id"])


def test_concurrent_tombstone_merges_lose_nothing(tmp_path):
    """Racing writer JOBS union-merging the same partition's tombstone
    serialize on the per-pid lockfile — every writer's positions land
    (without the lock, read-merge-replace loses whole writers' sets)."""
    import threading

    mdir = str(tmp_path / "manifest")
    os.makedirs(mdir)
    row = {"pid": "p-race"}
    n_writers, per = 16, 25
    errs = []

    def writer(i):
        try:
            pos = np.arange(i * per, (i + 1) * per, dtype=np.int64)
            # two half-batches so each thread re-enters the lock
            pipeline._merge_tombstone(mdir, dict(row), pos[: per // 2])
            pipeline._merge_tombstone(mdir, dict(row), pos[per // 2:])
        except Exception as e:  # surfaced below — threads swallow raises
            errs.append(e)

    ts = [threading.Thread(target=writer, args=(i,)) for i in range(n_writers)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    with open(os.path.join(mdir, "p-race.del.json")) as f:
        tomb = json.load(f)
    assert tomb["deleted_rows"] == list(range(n_writers * per))
    assert tomb["n"] == n_writers * per
    # lock released (no leftover .lock forcing the next writer to age-out)
    assert not [n for n in os.listdir(mdir) if n.endswith(".lock")]


def test_tombstone_stale_lock_broken(tmp_path):
    """A lockfile left by a crashed writer ages out instead of wedging
    every future delete on that partition."""
    mdir = str(tmp_path / "manifest")
    os.makedirs(mdir)
    tpath = os.path.join(mdir, "p-stale.del.json")
    lock = tpath + ".lock"
    with open(lock, "w") as f:
        f.write("dead")
    old = __import__("time").time() - 600
    os.utime(lock, (old, old))
    n = pipeline._merge_tombstone(mdir, {"pid": "p-stale"},
                                  np.array([1, 2, 3]))
    assert n == 3
    assert not os.path.exists(lock)
