"""MERGE INTO semantics composed from the store's mutation primitives:
matched-by-live-doc_id decided via the index-grade point lookup, then
update (append-then-shadow), delete (tombstone) or ignore arms.

The reference is a write-once byte sink (src/lib.rs:29); MERGE belongs
to the mandated scale extension.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rwcf import fixtures, pipeline


def _rows(pairs):
    """TOKENS_SCHEMA table from (doc_id, text) pairs."""
    toks = [np.frombuffer(t.encode(), dtype=np.uint8).astype(np.int32)
            for _, t in pairs]
    offsets = np.concatenate(([0], np.cumsum([t.size for t in toks])))
    la = pa.LargeListArray.from_arrays(
        offsets.astype(np.int64),
        pa.array(np.concatenate(toks) if toks else np.array([], np.int32),
                 pa.int32())).cast(pa.list_(pa.int32()))
    return pa.table({
        "doc_id": pa.array([d for d, _ in pairs], pa.string()),
        "tokens": la,
        "n_tok": pa.array([t.size for t in toks], pa.int32()),
        "source": pa.array(["merge"] * len(pairs), pa.string()),
    })


@pytest.fixture()
def store(tmp_path, ray_session):
    path = fixtures.tokens_parquet(200, seed=41,
                                   cache_dir=str(tmp_path / "tok"),
                                   row_group_size=50)
    out = str(tmp_path / "out")
    cfg = pipeline.EncodeConfig(out_dir=out, partition_token_budget=20_000,
                                bloom_bits_per_key=10)
    pipeline.encode_job(path, cfg, concurrency=2).materialize()
    ids = pq.read_table(path).column("doc_id").to_pylist()
    return {"out": out, "ids": ids}


def _ids(out):
    df = pipeline.decode_job(out, columns=["doc_id"], concurrency=2) \
        .to_pandas()
    return sorted(df["doc_id"])


def test_merge_update_insert_is_upsert(store):
    src = _rows([(store["ids"][3], "updated"), ("zz-new-1", "fresh")])
    res = pipeline.merge_docs(store["out"], src)
    assert res["matched"] == 1 and res["not_matched"] == 1
    assert res["updated"] == 1 and res["inserted"] == 1
    assert _ids(store["out"]) == sorted(store["ids"] + ["zz-new-1"])
    # the matched row carries its NEW payload
    got = pipeline.lookup_docs(store["out"], [store["ids"][3]],
                               concurrency=2).to_pandas()
    assert bytes(np.asarray(got["tokens"][0], np.uint8)) == b"updated"


def test_merge_delete_insert(store):
    src = _rows([(store["ids"][0], "x"), (store["ids"][7], "x"),
                 ("zz-new-2", "fresh")])
    res = pipeline.merge_docs(store["out"], src, when_matched="delete")
    assert res == {**res, "matched": 2, "not_matched": 1,
                   "deleted": 2, "inserted": 1, "updated": 0}
    expect = sorted(set(store["ids"]) - {store["ids"][0], store["ids"][7]}
                    | {"zz-new-2"})
    assert _ids(store["out"]) == expect


def test_merge_ignore_arms(store):
    src = _rows([(store["ids"][1], "x"), ("zz-new-3", "fresh")])
    res = pipeline.merge_docs(store["out"], src, when_matched="ignore",
                              when_not_matched="ignore")
    assert res["inserted"] == res["updated"] == res["deleted"] == 0
    assert _ids(store["out"]) == sorted(store["ids"])

    # insert-only merge (WHEN NOT MATCHED THEN INSERT)
    res = pipeline.merge_docs(store["out"], src, when_matched="ignore")
    assert res["inserted"] == 1 and res["updated"] == 0
    assert _ids(store["out"]) == sorted(store["ids"] + ["zz-new-3"])


def test_merge_idempotent(store):
    src = _rows([(store["ids"][5], "v2"), ("zz-new-4", "fresh")])
    pipeline.merge_docs(store["out"], src)
    after1 = _ids(store["out"])
    res2 = pipeline.merge_docs(store["out"], src)
    # second run: the new row now MATCHES and re-updates to the same
    # content; the store converges
    assert res2["matched"] == 2
    assert _ids(store["out"]) == after1


def test_merge_validation(store):
    src = _rows([("a", "b")])
    with pytest.raises(ValueError, match="when_matched"):
        pipeline.merge_docs(store["out"], src, when_matched="upsert")
    with pytest.raises(ValueError, match="when_not_matched"):
        pipeline.merge_docs(store["out"], src, when_not_matched="drop")
