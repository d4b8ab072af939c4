"""CDC replication: a replica store holding the primary's snapshot
state rolls forward by applying only the CDC delta — deletes
tombstone, inserts/updates upsert with tokens fetched point-to-point —
and converges to bit-identical content.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rwcf import fixtures, pipeline


def _rows(pairs, source="repl"):
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
def pair(tmp_path, ray_session):
    path = fixtures.tokens_parquet(250, seed=53,
                                   cache_dir=str(tmp_path / "tok"),
                                   row_group_size=50)
    stores = {}
    for name in ("primary", "replica"):
        out = str(tmp_path / name)
        cfg = pipeline.EncodeConfig(out_dir=out,
                                    partition_token_budget=25_000,
                                    bloom_bits_per_key=10)
        pipeline.encode_job(path, cfg, concurrency=2).materialize()
        stores[name] = out
    ids = pq.read_table(path).column("doc_id").to_pylist()
    return {**stores, "ids": ids}


def _content(out):
    df = pipeline.decode_job(out, columns=["doc_id", "n_tok"],
                             concurrency=2).to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


def test_replicate_applies_exact_delta(pair):
    snap = pipeline.create_snapshot(pair["primary"])["snapshot"]
    # mutate the primary: delete 2, update 1, insert 1
    pipeline.delete_docs(pair["primary"], pair["ids"][:2], concurrency=2)
    pipeline.upsert_docs(pair["primary"],
                         _rows([(pair["ids"][5], "updated-five"),
                                ("zz-new", "fresh")]))

    res = pipeline.replicate_cdc(pair["primary"], pair["replica"], snap)
    assert res["deleted"] == 2 and res["applied"] == 2
    assert _content(pair["replica"]).equals(_content(pair["primary"]))

    # token payloads themselves match on the touched rows
    got = pipeline.lookup_docs(pair["replica"],
                               [pair["ids"][5], "zz-new"],
                               concurrency=2).to_pandas() \
        .set_index("doc_id")["tokens"]
    assert bytes(np.asarray(got[pair["ids"][5]], np.uint8)) \
        == b"updated-five"
    assert bytes(np.asarray(got["zz-new"], np.uint8)) == b"fresh"


def test_replicate_idempotent_and_empty_delta(pair):
    snap = pipeline.create_snapshot(pair["primary"])["snapshot"]
    # empty delta: nothing to do
    res = pipeline.replicate_cdc(pair["primary"], pair["replica"], snap)
    assert res == {"delta_rows": 0, "deleted": 0, "applied": 0}

    pipeline.delete_docs(pair["primary"], [pair["ids"][9]], concurrency=2)
    pipeline.replicate_cdc(pair["primary"], pair["replica"], snap)
    after1 = _content(pair["replica"])
    # re-running the same replication converges (upsert content-hash
    # keyed, re-deletes are no-ops)
    res2 = pipeline.replicate_cdc(pair["primary"], pair["replica"], snap)
    assert res2["deleted"] == 0
    assert _content(pair["replica"]).equals(after1)
    assert after1.equals(_content(pair["primary"]))


def test_replicate_survives_primary_compaction(pair):
    snap = pipeline.create_snapshot(pair["primary"])["snapshot"]
    pipeline.delete_docs(pair["primary"], pair["ids"][:3], concurrency=2)
    # physical churn on the primary must NOT replicate as logical change
    pipeline.compact_partitions(pair["primary"], target_tokens=100_000,
                                concurrency=2)
    res = pipeline.replicate_cdc(pair["primary"], pair["replica"], snap)
    assert res["deleted"] == 3 and res["applied"] == 0
    assert _content(pair["replica"]).equals(_content(pair["primary"]))
