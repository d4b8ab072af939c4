"""Write-audit-publish: staged batches are a complete invisible store
(auditable with fsck/verify), promotion is atomic per partition and
crash-resumable, abort leaves the main store byte-untouched.
"""

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
        "source": pa.array(["wap"] * len(pairs), pa.string()),
    }).cast(pipeline.TOKENS_SCHEMA)
    path = str(tmp_path / f"{name}.parquet")
    pq.write_table(t, path)
    return path


def _ids(out):
    return set(pipeline.decode_job(out, columns=["doc_id"], concurrency=2)
               .to_pandas()["doc_id"])


def test_wap_staged_invisible_then_published(store, tmp_path):
    base = _ids(store)
    batch = _batch_parquet(tmp_path, [("wap-1", "abc"), ("wap-2", "defg")])
    st = pipeline.stage_append(store, batch)
    assert st["n_rows"] == 2
    # AUDIT surface: the staging dir is a full store
    fsck = pipeline.fsck_store(st["staging_dir"], deep=True).to_pandas()
    assert fsck["ok"].all()
    ver = pipeline.verify_job(st["staging_dir"]).to_pandas()
    assert ver["equal"].all()
    # invisible until publish
    assert _ids(store) == base
    res = pipeline.publish_staged(store, st["staging_id"])
    assert res["published"] == st["partitions"] and res["skipped"] == 0
    assert _ids(store) == base | {"wap-1", "wap-2"}
    assert not os.path.isdir(st["staging_dir"])
    # published rows pass the main store's own deep fsck
    assert pipeline.fsck_store(store, deep=True).to_pandas()["ok"].all()


def test_wap_abort_leaves_store_untouched(store, tmp_path):
    base = _ids(store)
    batch = _batch_parquet(tmp_path, [("bad-1", "zzz")], name="bad")
    st = pipeline.stage_append(store, batch)
    assert pipeline.abort_staged(store, st["staging_id"])["aborted"]
    assert _ids(store) == base
    assert not os.path.isdir(st["staging_dir"])


def test_wap_publish_idempotent_and_crash_resumable(store, tmp_path):
    batch = _batch_parquet(tmp_path, [("wap-3", "hij")], name="b3")
    st = pipeline.stage_append(store, batch)
    # crash simulation: data file promoted but manifest row not yet
    # committed — re-running publish recommits from the staged row
    row = pipeline.load_manifest(st["staging_dir"])[0]
    dst = os.path.join(store, "parts", os.path.basename(row["file"]))
    os.replace(row["file"], dst)
    res = pipeline.publish_staged(store, st["staging_id"])
    assert res["published"] == 1
    assert "wap-3" in _ids(store)
    # restaging + republishing the same inputs cannot duplicate rows
    st2 = pipeline.stage_append(store, batch)
    res2 = pipeline.publish_staged(store, st2["staging_id"])
    assert res2["published"] == 0 and res2["skipped"] >= 1
    ids = pipeline.decode_job(store, columns=["doc_id"], concurrency=2) \
        .to_pandas()["doc_id"]
    assert (ids == "wap-3").sum() == 1


def test_wap_failed_audit_rejected(store, tmp_path):
    batch = _batch_parquet(tmp_path, [("wap-4", "klm")], name="b4")
    st = pipeline.stage_append(store, batch)
    row = pipeline.load_manifest(st["staging_dir"])[0]
    with open(row["file"], "r+b") as f:  # corrupt the staged payload
        f.seek(3)
        b = f.read(1)
        f.seek(3)
        f.write(bytes([b[0] ^ 0xFF]))
    fsck = pipeline.fsck_store(st["staging_dir"], deep=True).to_pandas()
    assert not fsck[fsck["check"] == "section_crc"]["ok"].all()
    pipeline.abort_staged(store, st["staging_id"])
    assert "wap-4" not in _ids(store)
