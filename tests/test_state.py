"""Persistent incremental dedup index: filter_seen / commit_new."""

import os

import numpy as np
import pyarrow as pa

from rwcf import state


def tbl(texts, ids=None):
    ids = list(range(len(texts))) if ids is None else ids
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_incremental_ingestion_rounds(ray_session, tmp_path):
    import ray.data as rd
    idx = str(tmp_path / "index")

    day1 = ["alpha doc", "beta doc", "gamma doc"]
    ds1 = rd.from_arrow(tbl(day1))
    # empty index: everything passes
    kept = state.filter_seen(ds1, idx).to_pandas()
    assert sorted(kept["text"]) == sorted(day1)
    assert state.commit_new(ds1, idx, run_id="day1") == 3

    # day 2 = one repeat + two new
    day2 = ["beta doc", "delta doc", "epsilon doc"]
    ds2 = rd.from_arrow(tbl(day2, ids=[10, 11, 12]))
    kept2 = state.filter_seen(ds2, idx).to_pandas()
    assert sorted(kept2["text"]) == ["delta doc", "epsilon doc"]
    assert state.commit_new(
        rd.from_arrow(tbl(kept2["text"].tolist(), ids=[11, 12])),
        idx, run_id="day2") == 2

    # day 3 = all previously seen
    ds3 = rd.from_arrow(tbl(["alpha doc", "delta doc"], ids=[20, 21]))
    assert len(state.filter_seen(ds3, idx).to_pandas()) == 0


def test_commit_idempotent_and_atomic(ray_session, tmp_path):
    import ray.data as rd
    idx = str(tmp_path / "index")
    ds = rd.from_arrow(tbl(["a", "b", "a"]))  # in-run dup collapses
    assert state.commit_new(ds, idx, run_id="r1") == 2
    # same run_id again: no-op, index unchanged
    assert state.commit_new(ds, idx, run_id="r1") == 0
    h1, h2 = state.load_index(idx)
    assert h1.size == 2
    # another run's in-flight tmp dir is LEFT alone (concurrent commits
    # of different run_ids must not clobber each other); only this
    # run_id's own stale tmp dir is swept before re-committing
    os.makedirs(os.path.join(idx, ".tmp-other-run"))
    os.makedirs(os.path.join(idx, ".tmp-r2"))  # r2's own crashed attempt
    assert state.commit_new(
        rd.from_arrow(tbl(["c"])), idx, run_id="r2") == 1
    assert os.path.exists(os.path.join(idx, ".tmp-other-run"))
    assert not os.path.exists(os.path.join(idx, ".tmp-r2"))
    assert state.load_index(idx)[0].size == 3


def test_base2_is_odd_and_h2_sees_past_byte_64():
    # an EVEN base b has b^i = 0 mod 2^64 for i >= 64, making h2 blind to
    # everything after a document's first 64 bytes — the 128-bit composite
    # key would collapse to h1 alone for prefix-sharing documents
    # (templated crawl headers). Regression for the 2026-08-18 fix.
    assert int(state._BASE2) % 2 == 1
    prefix = "H" * 64  # shared 64-byte prefix
    a = tbl([prefix + "tail one"])
    b = tbl([prefix + "tail two"])
    (h1a,), (h2a,) = state.doc_keys(a)
    (h1b,), (h2b,) = state.doc_keys(b)
    assert h1a != h1b
    assert h2a != h2b  # fails with the old even base


def test_pair_member_rejects_h1_collision():
    # same h1, different h2 must NOT count as a member (the reason the
    # index stores a 128-bit composite, not one 64-bit hash)
    idx_h1 = np.array([5, 5, 9], dtype=np.uint64)
    idx_h2 = np.array([100, 200, 1], dtype=np.uint64)
    h1 = np.array([5, 5, 9, 7], dtype=np.uint64)
    h2 = np.array([200, 300, 1, 1], dtype=np.uint64)
    got = state.pair_member(idx_h1, idx_h2, h1, h2)
    assert got.tolist() == [True, False, True, False]


def test_composition_with_dedup_exact(ray_session, tmp_path):
    import ray.data as rd

    from rwcf import dedup
    idx = str(tmp_path / "index")
    texts = ["x doc", "x doc", "y doc"]  # in-run dup
    ds = rd.from_arrow(tbl(texts))
    survivors = dedup.dedup_exact(ds)
    fresh = state.filter_seen(survivors, idx)
    n = state.commit_new(fresh, idx, run_id="run-a")
    assert n == 2  # x once + y
    # next run: the previously committed content is filtered out
    again = state.filter_seen(
        rd.from_arrow(tbl(["x doc", "z doc"], ids=[7, 8])), idx).to_pandas()
    assert again["text"].tolist() == ["z doc"]


def test_rebuild_shard_migrates_stale_keys(ray_session, tmp_path):
    """rebuild_shard recomputes a shard from its SOURCE rows under the
    current hash bases and atomically replaces it — the migration path
    for pre-2026-08-18 even-base shards (which stored wrong h2 keys the
    filter can never match)."""
    import pyarrow.parquet as pq
    import ray.data as rd
    idx = str(tmp_path / "index")
    texts = ["alpha doc", "beta doc", "gamma doc"]
    src = str(tmp_path / "day1.parquet")
    pq.write_table(tbl(texts), src)
    assert state.commit_new(rd.from_arrow(tbl(texts)), idx, "day1") == 3

    # simulate a stale-base shard: overwrite with garbage h2 keys
    shard = os.path.join(idx, "shard-day1.parquet")
    t = pq.read_table(shard)
    pq.write_table(pa.table({"h1": t.column("h1"),
                             "h2": pa.array(np.zeros(len(t), np.int64))}),
                   shard)
    stale = state.filter_seen(rd.from_arrow(tbl(texts)), idx).to_pandas()
    assert len(stale) == 3  # stale keys match nothing -> dups readmitted

    n = state.rebuild_shard(idx, "day1", src)
    assert n == 3
    fixed = state.filter_seen(rd.from_arrow(tbl(texts)), idx).to_pandas()
    assert len(fixed) == 0  # index filters again

    # unknown run id refuses (nothing to replace)
    import pytest
    with pytest.raises(FileNotFoundError):
        state.rebuild_shard(idx, "nope", src)


def test_rebuild_index_cli(ray_session, tmp_path):
    import json as _json
    import subprocess
    import sys

    import pyarrow.parquet as pq
    import ray.data as rd
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    idx = str(tmp_path / "index")
    texts = ["one doc", "two doc"]
    src = str(tmp_path / "run.parquet")
    pq.write_table(tbl(texts), src)
    state.commit_new(rd.from_arrow(tbl(texts)), idx, "runA")
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, "-m", "rwcf", "rebuild-index", idx,
         "--run-id", "runA", "--source", src, "--num-cpus", "2"],
        capture_output=True, text=True, env=env, cwd=repo)
    assert out.returncode == 0, out.stderr[-2000:]
    res = _json.loads(out.stdout.strip().splitlines()[-1])
    assert res["keys"] == 2 and res["run_id"] == "runA"
