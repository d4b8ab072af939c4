"""Rollback / RESTORE-to-snapshot: the write-side complement of time
travel — the CURRENT store state reverts to a committed snapshot by
applying only the reverse CDC delta (inserts since the snapshot are
tombstoned; deletes/updates since are re-upserted with payloads read
AS OF the snapshot), while history stays time-travelable.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rwcf import fixtures, pipeline


def _rows(pairs, source="mut"):
    toks = [np.frombuffer(t.encode(), dtype=np.uint8).astype(np.int32)
            for _, t in pairs]
    offsets = np.concatenate(([0], np.cumsum([t.size for t in toks])))
    la = pa.LargeListArray.from_arrays(
        offsets.astype(np.int64),
        pa.array(np.concatenate(toks), pa.int32())).cast(pa.list_(pa.int32()))
    return pa.table({
        "doc_id": pa.array([d for d, _ in pairs], pa.string()),
        "tokens": la,
        "n_tok": pa.array([t.size for t in toks], pa.int32()),
        "source": pa.array([source] * len(pairs), pa.string()),
    })


@pytest.fixture()
def store(tmp_path, ray_session):
    path = fixtures.tokens_parquet(250, seed=61,
                                   cache_dir=str(tmp_path / "tok"),
                                   row_group_size=50)
    out = str(tmp_path / "out")
    cfg = pipeline.EncodeConfig(out_dir=out,
                                partition_token_budget=25_000,
                                bloom_bits_per_key=10)
    pipeline.encode_job(path, cfg, concurrency=2).materialize()
    ids = pq.read_table(path).column("doc_id").to_pylist()
    return {"out": out, "ids": ids}


def _content(out, snapshot=None):
    df = pipeline.decode_job(out, concurrency=2,
                             snapshot=snapshot).to_pandas()
    df["tokens"] = df["tokens"].map(lambda t: bytes(np.asarray(t, np.uint8)))
    return df.sort_values("doc_id").reset_index(drop=True)


def test_rollback_restores_snapshot_state(store):
    out = store["out"]
    snap = pipeline.create_snapshot(out, note="pristine")["snapshot"]
    before = _content(out)

    pipeline.delete_docs(out, store["ids"][:2], concurrency=2)
    pipeline.upsert_docs(out, _rows([(store["ids"][5], "updated-five"),
                                     ("zz-new", "fresh")]))

    res = pipeline.rollback_to_snapshot(out, snap)
    # forward delta: 2 deletes + 1 update reverted, 1 insert removed
    assert res["restored"] == 3 and res["deleted"] == 1, res
    assert _content(out).equals(before)
    # restored payloads are the snapshot versions, fetched AS OF snap
    got = pipeline.lookup_docs(out, [store["ids"][5]],
                               concurrency=2).to_pandas()
    assert bytes(np.asarray(got["tokens"][0], np.uint8)) != b"updated-five"


def test_rollback_survives_compaction(store):
    out = store["out"]
    snap = pipeline.create_snapshot(out, note="pristine")["snapshot"]
    before = _content(out)

    pipeline.delete_docs(out, store["ids"][:3], concurrency=2)
    pipeline.upsert_docs(out, _rows([("zz-post", "late-arrival")]))
    # physical rewrite between mutation and rollback: the snapshot pins
    # the pre-compaction files, so AS-OF payload lookups still resolve
    pipeline.compact_partitions(out, target_tokens=100_000, concurrency=2)

    res = pipeline.rollback_to_snapshot(out, snap)
    assert res["restored"] == 3 and res["deleted"] == 1, res
    assert _content(out).equals(before)


def test_rollback_idempotent_and_history_intact(store):
    out = store["out"]
    snap = pipeline.create_snapshot(out, note="pristine")["snapshot"]
    before = _content(out)
    # empty delta: no-op
    assert pipeline.rollback_to_snapshot(out, snap) \
        == {"delta_rows": 0, "deleted": 0, "restored": 0}

    pipeline.delete_docs(out, [store["ids"][9]], concurrency=2)
    mid = pipeline.create_snapshot(out, note="mutated")["snapshot"]
    mutated = _content(out)

    pipeline.rollback_to_snapshot(out, snap)
    assert _content(out).equals(before)
    # converged: a second rollback sees an empty delta
    assert pipeline.rollback_to_snapshot(out, snap)["delta_rows"] == 0
    # history stays intact: both snapshots still time-travel
    assert _content(out, snapshot=snap).equals(before)
    assert _content(out, snapshot=mid).equals(mutated)


def test_lookup_docs_as_of_snapshot(store):
    out = store["out"]
    key = store["ids"][7]
    snap = pipeline.create_snapshot(out)["snapshot"]
    old = pipeline.lookup_docs(out, [key], concurrency=2).to_pandas()
    pipeline.upsert_docs(out, _rows([(key, "rewritten")]))

    cur = pipeline.lookup_docs(out, [key], concurrency=2).to_pandas()
    assert bytes(np.asarray(cur["tokens"][0], np.uint8)) == b"rewritten"
    asof = pipeline.lookup_docs(out, [key], concurrency=2,
                                snapshot=snap).to_pandas()
    assert np.array_equal(np.asarray(asof["tokens"][0]),
                          np.asarray(old["tokens"][0]))
