"""Predicate deletes on arbitrary row-aligned columns (delete_where):
the Iceberg-v2-equality-delete role resolved to position tombstones via
the index-grade path (zone maps -> Bloom -> page zone maps -> predicate
column pages only), so every existing reader honors them unchanged.

The reference is a write-once byte sink (src/lib.rs:29); predicate
deletes belong to the mandated scale extension.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rwcf import fixtures, pipeline


@pytest.fixture()
def store(tmp_path, ray_session):
    path = fixtures.tokens_parquet(500, seed=37,
                                   cache_dir=str(tmp_path / "tok"),
                                   row_group_size=125)
    out = str(tmp_path / "out")
    cfg = pipeline.EncodeConfig(out_dir=out, partition_token_budget=40_000,
                                bloom_bits_per_key=10)
    pipeline.encode_job(path, cfg, concurrency=2).materialize()
    return {"out": out, "src": pq.read_table(path)}


def _decoded_ids(out):
    df = pipeline.decode_job(out, columns=["doc_id"], concurrency=2) \
        .to_pandas()
    return sorted(df["doc_id"])


def test_equality_delete_on_source(store):
    src = store["src"]
    dead_src = "wiki"
    live = src.filter(pa.compute.not_equal(src.column("source"), dead_src))
    n_dead = src.num_rows - live.num_rows
    assert n_dead > 0

    res = pipeline.delete_where(store["out"], "source", values=[dead_src],
                                concurrency=2)
    assert res["rows_deleted"] == n_dead
    assert _decoded_ids(store["out"]) == \
        sorted(live.column("doc_id").to_pylist())

    # live rows stay bit-identical through the tombstoned decode
    dec = pipeline.decode_job(store["out"], concurrency=2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    ref = live.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert all(np.array_equal(a, b) for a, b in
               zip(dec["tokens"], ref["tokens"]))

    # idempotent: re-running the same predicate deletes nothing new
    res2 = pipeline.delete_where(store["out"], "source", values=[dead_src],
                                 concurrency=2)
    assert res2["rows_deleted"] == 0


def test_range_delete_on_n_tok(store):
    src = store["src"]
    lo, hi = 100, 220
    n_tok = np.asarray(src.column("n_tok"))
    mask = (n_tok < lo) | (n_tok > hi)
    res = pipeline.delete_where(store["out"], "n_tok", lo=lo, hi=hi,
                                concurrency=2)
    assert res["rows_deleted"] == int((~mask).sum()) > 0
    assert _decoded_ids(store["out"]) == \
        sorted(np.asarray(src.column("doc_id"))[mask].tolist())

    # one-sided range composes with the previous tombstones
    res2 = pipeline.delete_where(store["out"], "n_tok", lo=5000,
                                 concurrency=2)
    mask &= ~(n_tok >= 5000)
    assert res2["rows_deleted"] == int((n_tok >= 5000).sum())
    assert _decoded_ids(store["out"]) == \
        sorted(np.asarray(src.column("doc_id"))[mask].tolist())


def test_delete_where_prunes_partitions(store):
    # a probe matching NOTHING must touch zero partitions (zone maps
    # reject every partition before any page IO)
    res = pipeline.delete_where(store["out"], "source",
                                values=["no-such-source"], concurrency=2)
    assert res == {"partitions": 0, "rows_deleted": 0}
    res = pipeline.delete_where(store["out"], "n_tok",
                                lo=10_000_000, concurrency=2)
    assert res == {"partitions": 0, "rows_deleted": 0}


def test_delete_where_validation(store):
    with pytest.raises(ValueError, match="exactly one"):
        pipeline.delete_where(store["out"], "source")
    with pytest.raises(ValueError, match="exactly one"):
        pipeline.delete_where(store["out"], "source", values=["x"], lo=1)
    with pytest.raises(ValueError, match="row-aligned"):
        pipeline.delete_where(store["out"], "tokens", values=[1])


def test_compaction_materializes_predicate_deletes(store):
    pipeline.delete_where(store["out"], "source", values=["code", "news"],
                          concurrency=2)
    before = _decoded_ids(store["out"])
    pipeline.compact_partitions(store["out"], target_tokens=80_000,
                                concurrency=2)
    rows = pipeline.load_manifest(store["out"])
    assert not any(r.get("deleted_rows") for r in rows)
    assert _decoded_ids(store["out"]) == before
