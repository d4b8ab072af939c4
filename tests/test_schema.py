"""Schema evolution: field-id log, rename/add/drop resolved by readers
across physically heterogeneous partitions, defaults for pre-add
partitions, version stamping, and compaction upgrade-on-rewrite.

The reference format is single-schema write-once (src/lib.rs:25-48);
this layer versions the store's logical schema the way Iceberg does —
stable field ids, O(versions) metadata, zero data rewrites on evolve.
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rwcf import fixtures, pipeline, schema


def _tokens_table(ids, texts, extra=None, src_name="source"):
    toks = [np.frombuffer(t.encode(), dtype=np.uint8).astype(np.int32)
            for t in texts]
    offsets = np.concatenate(([0], np.cumsum([t.size for t in toks])))
    la = pa.LargeListArray.from_arrays(
        offsets.astype(np.int64),
        pa.array(np.concatenate(toks), pa.int32())).cast(pa.list_(pa.int32()))
    cols = {
        "doc_id": pa.array(list(ids), pa.string()),
        "tokens": la,
        "n_tok": pa.array([t.size for t in toks], pa.int32()),
        src_name: pa.array(["b2"] * len(ids), pa.string()),
    }
    for name, arr in (extra or {}).items():
        cols[name] = arr
    return pa.table(cols)


@pytest.fixture()
def store(tmp_path, ray_session):
    path = fixtures.tokens_parquet(120, seed=17,
                                   cache_dir=str(tmp_path / "tok"),
                                   row_group_size=40)
    out = str(tmp_path / "out")
    cfg = pipeline.EncodeConfig(out_dir=out, partition_token_budget=20_000)
    pipeline.encode_job(path, cfg, concurrency=2).materialize()
    return {"out": out, "src": path}


def _scan_df(out, columns=None):
    return schema.scan(out, columns=columns, concurrency=2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)


def test_base_store_scans_unevolved(store):
    out = store["out"]
    assert schema.current_version(out) == 0
    df = _scan_df(out)
    assert list(df.columns) == ["doc_id", "tokens", "n_tok", "source"]
    assert len(df) == 120


def test_rename_add_drop_lifecycle(store):
    out = store["out"]
    src = pq.read_table(store["src"]).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    schema.rename_column(out, "source", "src")
    schema.add_column(out, "quality", "i64", default=0)
    assert schema.current_version(out) == 2

    # old partitions surface under the new name + default-filled add
    df = _scan_df(out)
    assert list(df.columns) == ["doc_id", "tokens", "n_tok", "src",
                                "quality"]
    assert (df["src"] == src["source"]).all()
    assert (df["quality"] == 0).all()

    # a second ingest under the evolved schema carries real values and a
    # stamped version
    t = _tokens_table(["zz-1", "zz-2"], ["alpha", "beta"], src_name="src",
                      extra={"quality": pa.array([7, 9], pa.int64())})
    staged = os.path.join(out, "batch2.parquet")
    pq.write_table(t, staged, row_group_size=2)
    cfg2 = pipeline.EncodeConfig(out_dir=out, columns=None)
    pipeline.encode_job(staged, cfg2, concurrency=2).materialize()
    assert cfg2.schema_version == 2
    new_rows = [r for r in pipeline.load_manifest(out)
                if r.get("schema_version") == 2]
    assert new_rows and all(
        {"src", "quality"} <= {c["column"] for c in r["columns"]}
        for r in new_rows)

    df = _scan_df(out)
    assert len(df) == 122
    got = df.set_index("doc_id")["quality"]
    assert got["zz-1"] == 7 and got["zz-2"] == 9
    assert set(got.drop(["zz-1", "zz-2"])) == {0}

    # column pruning through the evolved view
    df2 = _scan_df(out, columns=["doc_id", "quality"])
    assert list(df2.columns) == ["doc_id", "quality"]

    # rename chain: the field id keeps anchoring both physical names
    schema.rename_column(out, "src", "origin")
    df3 = _scan_df(out, columns=["doc_id", "origin"])
    assert (df3["origin"].sort_values().values
            == df["src"].sort_values().values).all()

    # drop removes the field from every read
    schema.drop_column(out, "origin")
    assert "origin" not in _scan_df(out).columns
    with pytest.raises(KeyError):
        schema.resolution(out, columns=["origin"])


def test_compaction_upgrades_to_current_schema(store):
    out = store["out"]
    schema.rename_column(out, "source", "src")
    schema.add_column(out, "quality", "i32", default=5)
    before = _scan_df(out)

    res = pipeline.compact_partitions(out, target_tokens=10**9,
                                      concurrency=2)
    assert res["parts_after"] < res["parts_before"]
    rows = pipeline.load_manifest(out)
    # physically rewritten under the live schema: renamed + materialized
    for r in rows:
        names = {c["column"] for c in r["columns"]}
        assert "src" in names and "quality" in names
        assert "source" not in names
        assert r.get("schema_version") == 2

    after = _scan_df(out)
    assert before.equals(after)
    assert (after["quality"] == 5).all()


def test_drop_then_compact_sheds_bytes(store):
    out = store["out"]
    schema.drop_column(out, "source")
    bytes_before = sum(r["encoded_bytes"] for r in pipeline.load_manifest(out))
    pipeline.compact_partitions(out, target_tokens=10**9, concurrency=2)
    rows = pipeline.load_manifest(out)
    assert all("source" not in {c["column"] for c in r["columns"]}
               for r in rows)
    assert sum(r["encoded_bytes"] for r in rows) < bytes_before
    assert list(_scan_df(out).columns) == ["doc_id", "tokens", "n_tok"]


def test_guards(store):
    out = store["out"]
    with pytest.raises(ValueError):
        schema.drop_column(out, "doc_id")       # core
    with pytest.raises(ValueError):
        schema.rename_column(out, "tokens", "t")  # core
    with pytest.raises(KeyError):
        schema.drop_column(out, "nope")
    with pytest.raises(ValueError):
        schema.add_column(out, "source", "i32", 0)  # name taken
    with pytest.raises(ValueError):
        schema.add_column(out, "x", "f64", 0.0)     # unsupported dtype
    with pytest.raises((pa.ArrowInvalid, pa.ArrowTypeError)):
        schema.add_column(out, "x", "i32", "not-an-int")
    assert schema.current_version(out) == 0  # nothing committed
    # round 5: default=None is now a legal OPTIONAL add (null fill);
    # old partitions surface the field as all-null
    schema.add_column(out, "optional_x", "i32", None)
    assert schema.current_version(out) == 1
    t = schema.scan(out, columns=["doc_id", "optional_x"]).to_pandas()
    assert len(t) and t["optional_x"].isna().all()
    schema.drop_column(out, "optional_x")  # leave the store as before


def test_scan_respects_deletes_and_snapshots(store):
    out = store["out"]
    ids = sorted(pq.read_table(store["src"]).column("doc_id").to_pylist())
    pipeline.create_snapshot(out)
    schema.add_column(out, "flag", "i32", default=1)
    pipeline.delete_docs(out, ids[:2], concurrency=2)
    df = _scan_df(out)
    assert len(df) == 118 and (df["flag"] == 1).all()
    # time travel composes with the evolved view (current schema, old rows)
    snap = schema.scan(out, snapshot="snap-00000", concurrency=2) \
        .to_pandas()
    assert len(snap) == 120 and (snap["flag"] == 1).all()
