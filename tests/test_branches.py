"""Branch refs: mutable named lineages over snapshots (Iceberg branch
semantics). A branch forks main at a snapshot; WAP batches publish ONTO
the branch invisibly to main readers; merge_branch fast-forwards main
atomically; delete_branch discards unreachable branch data.
"""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rwcf import fixtures, pipeline


@pytest.fixture()
def store(tmp_path, ray_session):
    path = fixtures.tokens_parquet(150, seed=83,
                                   cache_dir=str(tmp_path / "tok"),
                                   row_group_size=50)
    out = str(tmp_path / "out")
    cfg = pipeline.EncodeConfig(out_dir=out,
                                partition_token_budget=20_000)
    pipeline.encode_job(path, cfg, concurrency=2).materialize()
    return out


def _batch_parquet(tmp_path, pairs, name="batch"):
    toks = [np.frombuffer(t.encode(), dtype=np.uint8).astype(np.int32)
            for _, t in pairs]
    offsets = np.concatenate(([0], np.cumsum([t.size for t in toks])))
    la = pa.LargeListArray.from_arrays(
        offsets.astype(np.int64),
        pa.array(np.concatenate(toks), pa.int32())).cast(pa.list_(pa.int32()))
    t = pa.table({
        "doc_id": pa.array([d for d, _ in pairs], pa.string()),
        "tokens": la,
        "n_tok": pa.array([t.size for t in toks], pa.int32()),
        "source": pa.array(["branch"] * len(pairs), pa.string()),
    }).cast(pipeline.TOKENS_SCHEMA)
    path = str(tmp_path / f"{name}.parquet")
    pq.write_table(t, path)
    return path


def _ids(out, snapshot=None):
    return set(pipeline.decode_job(out, columns=["doc_id"], concurrency=2,
                                   snapshot=snapshot)
               .to_pandas()["doc_id"])


def _commit_to_branch(store, tmp_path, name, pairs, batch_name):
    batch = _batch_parquet(tmp_path, pairs, name=batch_name)
    st = pipeline.stage_append(store, batch)
    return pipeline.publish_staged(store, st["staging_id"], branch=name)


def test_branch_commit_invisible_to_main_visible_on_branch(
        store, tmp_path):
    base = _ids(store)
    pipeline.create_branch(store, "dev")
    res = _commit_to_branch(store, tmp_path, "dev",
                            [("br-1", "abc"), ("br-2", "defg")], "b1")
    assert res["branch"] == "dev" and res["published"] >= 1
    # main readers see nothing; branch readers see base + the commit
    assert _ids(store) == base
    assert _ids(store, snapshot="dev") == base | {"br-1", "br-2"}
    # metadata view
    [b] = pipeline.list_branches(store)
    assert b["branch"] == "dev" and b["n_rows"] == 2 and not b["merged"]
    # a second commit stacks on the same branch
    _commit_to_branch(store, tmp_path, "dev", [("br-3", "hij")], "b2")
    assert _ids(store, snapshot="dev") == base | {"br-1", "br-2", "br-3"}
    assert _ids(store) == base


def test_branch_isolated_from_main_mutation(store, tmp_path):
    """Main-side deletes after the fork never leak into the branch view
    (the base snapshot pins fork-time tombstone state), and a diverged
    main refuses the fast-forward merge."""
    base = _ids(store)
    victim = sorted(base)[0]
    pipeline.create_branch(store, "iso")
    pipeline.delete_docs(store, [victim])
    assert victim not in _ids(store)
    assert victim in _ids(store, snapshot="iso")  # fork-time view
    _commit_to_branch(store, tmp_path, "iso", [("iso-1", "xy")], "biso")
    assert _ids(store, snapshot="iso") == base | {"iso-1"}
    with pytest.raises(ValueError, match="diverged"):
        pipeline.merge_branch(store, "iso")


def test_merge_branch_fast_forward(store, tmp_path):
    base = _ids(store)
    pipeline.create_branch(store, "ff")
    _commit_to_branch(store, tmp_path, "ff",
                      [("ff-1", "abc"), ("ff-2", "de")], "bff")
    res = pipeline.merge_branch(store, "ff")
    assert res["fast_forward"] and res["merged_partitions"] >= 1
    # branch rows are now main rows; the ref is gone; no markers remain
    assert _ids(store) == base | {"ff-1", "ff-2"}
    assert pipeline.list_branches(store) == []
    assert not any(r.get("branch")
                   for r in pipeline.load_manifest(store))
    # merged rows pass the store's deep fsck (real, committed data)
    assert pipeline.fsck_store(store, deep=True).to_pandas()["ok"].all()


def test_merge_branch_crash_between_flip_and_cleanup(store, tmp_path):
    """The ref flip IS the merge: if cleanup never runs, the merged ref
    keeps branch rows visible on main; re-running merge finishes the
    demotion idempotently."""
    base = _ids(store)
    pipeline.create_branch(store, "cr")
    _commit_to_branch(store, tmp_path, "cr", [("cr-1", "zz")], "bcr")
    # simulate the crash: flip the ref by hand, skip cleanup
    bpath = os.path.join(store, "branches", "cr.json")
    with open(bpath) as f:
        ref = json.load(f)
    ref["merged"] = True
    with open(bpath, "w") as f:
        json.dump(ref, f)
    assert _ids(store) == base | {"cr-1"}  # visible through merged ref
    res = pipeline.merge_branch(store, "cr")  # completes cleanup only
    assert res["merged_partitions"] == 1
    assert _ids(store) == base | {"cr-1"}
    assert pipeline.list_branches(store) == []


def test_delete_branch_discards_unreachable_data(store, tmp_path):
    base = _ids(store)
    pipeline.create_branch(store, "tmp")
    _commit_to_branch(store, tmp_path, "tmp", [("tmp-1", "qq")], "btmp")
    marked = [r for r in pipeline.load_manifest(store,
                                                include_replaced=True)
              if r.get("branch") == "tmp"]
    assert marked and all(os.path.exists(r["file"]) for r in marked)
    res = pipeline.delete_branch(store, "tmp")
    assert res["deleted"] and res["files_removed"] == len(marked)
    assert not any(os.path.exists(r["file"]) for r in marked)
    assert _ids(store) == base
    assert pipeline.fsck_store(store).to_pandas()["ok"].all()


def test_branch_base_snapshot_expiry_guard(store, tmp_path):
    info = pipeline.create_branch(store, "pin")
    with pytest.raises(ValueError, match="branch:pin"):
        pipeline.expire_snapshot(store, info["base"])
    pipeline.delete_branch(store, "pin")
    assert pipeline.expire_snapshot(store, info["base"])["expired"] \
        == info["base"]


def test_branch_api_guards(store, tmp_path):
    pipeline.create_branch(store, "g1")
    with pytest.raises(FileExistsError):
        pipeline.create_branch(store, "g1")
    with pytest.raises(ValueError, match="invalid branch name"):
        pipeline.create_branch(store, "snap-00000")
    batch = _batch_parquet(tmp_path, [("g-1", "aa")], name="bg")
    st = pipeline.stage_append(store, batch)
    with pytest.raises(FileNotFoundError, match="no branch"):
        pipeline.publish_staged(store, st["staging_id"], branch="nope")
    # cdc between main and a branch head = exactly the branch's commits
    pipeline.publish_staged(store, st["staging_id"], branch="g1")
    snap = pipeline.create_snapshot(store)["snapshot"]
    delta = pipeline.cdc_scan(store, snap, "g1").to_pandas()
    assert set(delta["doc_id"]) == {"g-1"}
    assert set(delta["op"]) == {"insert"}


def test_branch_marker_survives_manifest_compaction(store, tmp_path):
    """compact_manifest folds loose rows into a parquet shard; the branch
    marker must survive the round-trip or staged rows would leak into
    the main view (regression: detail-key allowlist)."""
    base = _ids(store)
    pipeline.create_branch(store, "mc")
    _commit_to_branch(store, tmp_path, "mc", [("mc-1", "kk")], "bmc")
    res = pipeline.compact_manifest(store)
    assert res["compacted"] >= 1
    assert _ids(store) == base          # still invisible on main
    assert _ids(store, snapshot="mc") == base | {"mc-1"}
    pipeline.merge_branch(store, "mc")
    assert _ids(store) == base | {"mc-1"}
