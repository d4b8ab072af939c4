"""Null / validity support (round 5).

The reference format has no null representation (five plain-value
categories, src/lib.rs:59-66). The v2 footer extends the engine's v1
container with a run-length validity bitmap: codecs still see only the
DENSE non-null value stream (the same dense-values + validity split
Arrow uses), decode scatters values back to logical rows. Null-free
columns keep writing byte-identical v1 footers.

Oracle for SQL semantics: DuckDB's SUM/COUNT/AVG/GROUP BY null rules,
checked in tests/test_nulls.py::test_null_aggregate_semantics_vs_duckdb
and by the `nullable_roundtrip` / `null_agg_semantics` driver queries.
The reference type matrix (src/test_lib.rs:8-45) is mirrored with nulls
injected in test_type_matrix_with_nulls.
"""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rwcf import fixtures, format as fmt, pipeline, schema, selector, update

# ------------------------------------------------------------- format unit


@pytest.mark.parametrize("pattern", [
    [True] * 7,
    [False] * 5,
    [True, False] * 10,
    [False, False, True, True, True, False],
    [True],
    [False],
])
def test_validity_runs_round_trip(pattern):
    v = np.array(pattern, dtype=bool)
    assert np.array_equal(fmt.validity_from_runs(fmt.runs_from_validity(v)),
                          v)


def _null_values_for(dtype: str, n: int, seed: int):
    """Deterministic nullable test column per dtype (nulls every 3rd)."""
    rng = np.random.default_rng(seed)
    mask = np.arange(n) % 3 == 0
    if fmt.is_string(dtype):
        vals = [f"v{int(x)}" for x in rng.integers(0, 50, n)]
        return pa.array([None if m else v for m, v in zip(mask, vals)],
                        pa.string())
    np_t = fmt.DTYPES[dtype][2]
    info = np.iinfo(np_t)
    vals = rng.integers(max(info.min, -1000), min(info.max, 1000), n)
    return pa.array(vals.astype(np_t), fmt.DTYPES[dtype][1],
                    mask=mask)


@pytest.mark.parametrize("dtype", list(fmt.DTYPES))
def test_type_matrix_with_nulls(dtype):
    """Reference type matrix (src/test_lib.rs:8-45) with nulls injected:
    every supported dtype round-trips null-exactly through the v2
    container under its auto-selected codec."""
    arr = _null_values_for(dtype, 200, seed=hash(dtype) % 2**31)
    dense, validity = fmt.split_validity(
        arr.cast(pa.large_utf8()) if fmt.is_string(dtype) else arr)
    chunk = (fmt.chunk_from_arrow(dense) if fmt.is_string(dtype)
             else dense.to_numpy(zero_copy_only=False)
             .astype(fmt.DTYPES[dtype][2]))
    enc, _ = selector.encode_auto(chunk, dtype)
    enc.validity = validity
    back = fmt.read_column_file(fmt.write_column_file(enc))
    back.dtype = dtype
    out = fmt.chunk_to_arrow(fmt.decode_chunk(back), dtype)
    if fmt.is_string(dtype):
        out = out.cast(pa.string())
    out = fmt.apply_validity(out, back.validity)
    assert out.equals(arr.cast(out.type))
    assert out.null_count == arr.null_count > 0


@pytest.mark.parametrize("codec", ["plain", "rle", "dict", "bitpack",
                                   "for", "delta"])
def test_codecs_null_exact(codec):
    arr = pa.array([1, None, 1, 1, None, 5, 6, 7, None, 9] * 20,
                   pa.int64())
    dense, validity = fmt.split_validity(arr)
    enc = fmt.encode_chunk(
        dense.to_numpy(zero_copy_only=False).astype(np.int64), "i64",
        codec)
    enc.validity = validity
    back = fmt.read_column_file(fmt.write_column_file(enc))
    out = fmt.apply_validity(fmt.chunk_to_arrow(fmt.decode_chunk(back),
                                                "i64"), back.validity)
    assert out.equals(arr)


def test_all_null_column_round_trip():
    arr = pa.array([None] * 50, pa.int32())
    dense, validity = fmt.split_validity(arr)
    enc = fmt.encode_chunk(
        dense.to_numpy(zero_copy_only=False).astype(np.int32), "i32",
        "plain")
    enc.validity = validity
    back = fmt.read_column_file(fmt.write_column_file(enc))
    out = fmt.apply_validity(fmt.chunk_to_arrow(fmt.decode_chunk(back),
                                                "i32"), back.validity)
    assert len(out) == 50 and out.null_count == 50


def test_null_free_columns_write_v1_bytes():
    """Footprint parity: a null-free column's bytes are IDENTICAL with
    and without the v2 machinery (writers only emit v2 when needed)."""
    chunk = np.arange(500, dtype=np.int64)
    a = fmt.write_column_file(fmt.encode_chunk(chunk, "i64", "plain"))
    enc = fmt.encode_chunk(chunk, "i64", "plain")
    enc.validity = None
    assert fmt.write_column_file(enc) == a


def test_slice_pages_rejects_nullable():
    arr = pa.array([1, None, 3], pa.int64())
    dense, validity = fmt.split_validity(arr)
    enc = fmt.encode_chunk(
        dense.to_numpy(zero_copy_only=False).astype(np.int64), "i64",
        "plain")
    enc.validity = validity
    with pytest.raises(ValueError, match="nullable"):
        fmt.slice_pages(enc, [0])


# --------------------------------------------------------------- pipeline


def _build_null_store(tmp) -> dict:
    """Tokens store with a nullable string column (source, nulls every
    7th row) and a nullable int column (score, nulls every 3rd row)."""
    path = fixtures.tokens_parquet(600, seed=71, cache_dir=str(tmp),
                                   row_group_size=150)
    t = pq.read_table(path)
    n = t.num_rows
    idx = np.arange(n)
    score = pa.array((idx % 100).astype(np.int64), pa.int64(),
                     mask=idx % 3 == 0)
    src = pa.array([None if i % 7 == 0 else s for i, s in
                    enumerate(t.column("source").to_pylist())], pa.string())
    t = t.set_column(t.schema.get_field_index("source"), "source", src)
    t = t.append_column("score", score)
    src2 = str(tmp / "nullable.parquet")
    pq.write_table(t, src2, row_group_size=150)
    out = str(tmp / "enc")
    cfg = pipeline.EncodeConfig(
        out_dir=out, partition_token_budget=40_000,
        columns=["doc_id", "tokens", "n_tok", "source", "score"])
    pipeline.encode_job(src2, cfg).materialize()
    return {"out": out, "src": src2, "table": t}


@pytest.fixture(scope="module")
def null_store(tmp_path_factory, ray_session):
    return _build_null_store(tmp_path_factory.mktemp("nulls"))


def test_nullable_store_round_trip(null_store):
    dec = pipeline.decode_job(null_store["out"]).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    exp = null_store["table"].to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    pd.testing.assert_series_equal(dec["score"], exp["score"],
                                   check_dtype=False)
    pd.testing.assert_series_equal(dec["source"], exp["source"])
    assert dec["score"].isna().sum() == 200
    assert dec["source"].isna().sum() > 0
    # manifest lineage records null counts
    rows = pipeline.load_manifest(null_store["out"])
    total = sum(next(c for c in r["columns"] if c["column"] == "score")
                .get("null_count", 0) for r in rows)
    assert total == 200


def test_null_aggregate_semantics_vs_duckdb(null_store):
    """DuckDB is the oracle for SQL null semantics: COUNT(*) counts null
    rows, COUNT(col)/SUM/AVG skip them, GROUP BY groups nulls together."""
    dec = pipeline.decode_job(
        null_store["out"], columns=["source", "score"]).to_pandas()
    con = duckdb.connect()
    con.register("t", dec)
    got = con.execute(
        "SELECT count(*) AS n, count(score) AS n_score, "
        "sum(score) AS s, avg(score) AS a FROM t").fetchdf()
    exp_df = null_store["table"].to_pandas()
    assert got["n"][0] == len(exp_df)
    assert got["n_score"][0] == exp_df["score"].notna().sum()
    assert got["s"][0] == exp_df["score"].dropna().sum()
    # GROUP BY over the nullable string column: null forms its own group
    g = con.execute("SELECT source, count(*) AS n FROM t GROUP BY source "
                    "ORDER BY source NULLS FIRST").fetchdf()
    eg = exp_df.groupby("source", dropna=False)["score"].size()
    assert g["n"].sum() == len(exp_df)
    assert int(g[g["source"].isna()]["n"].iloc[0]) == \
        int(exp_df["source"].isna().sum())


def test_encoded_domain_paths_refuse_nullable(null_store):
    rows = pipeline.load_manifest(null_store["out"])
    row = next(r for r in rows
               if next(c for c in r["columns"] if c["column"] == "score")
               .get("null_count", 0) > 0)
    with pytest.raises(fmt.UnsupportedDataType, match="nulls"):
        pipeline.read_column_section(row, "score")
    # but the explicit opt-in works and returns the validity
    enc = pipeline.read_column_section(row, "score", allow_nulls=True)
    assert enc.validity is not None and enc.validity.size == row["n_rows"]


def test_fsck_green_on_nullable_store(null_store):
    res = pipeline.fsck_store(null_store["out"], deep=True,
                              concurrency=2).to_pandas()
    assert bool(res["ok"].all()), res[~res["ok"]]


def test_identity_columns_reject_nulls(tmp_path, ray_session):
    t = pa.table({
        "doc_id": pa.array(["a", None], pa.string()),
        "tokens": pa.array([[1], [2]], pa.list_(pa.int32())),
        "n_tok": pa.array([1, 1], pa.int32()),
    })
    with pytest.raises(ValueError, match="doc_id"):
        pipeline._table_chunks(t)


def test_update_set_null_and_null_pred(null_store, tmp_path):
    """UPDATE x = NULL works (v2 footer via the update path) and a NULL
    predicate value is never a match (SQL three-valued logic)."""
    fresh = _build_null_store(tmp_path)
    out = fresh["out"]
    before = pipeline.decode_job(out, columns=["n_tok", "score"]) \
        .to_pandas()
    n_nulls_before = before["score"].isna().sum()
    res = update.update_where(out, "score", None,
                              pred_col="n_tok", between=(0, 150))
    m = (before["n_tok"] >= 0) & (before["n_tok"] <= 150)
    assert res["rows_matched"] == int(m.sum()) > 0
    after = pipeline.decode_job(out, columns=["n_tok", "score"]) \
        .to_pandas()
    assert (after.loc[after["n_tok"] <= 150, "score"].isna()).all()
    assert after["score"].isna().sum() >= n_nulls_before
    # predicate over the NULLABLE column: null rows never match
    res2 = update.update_where(out, "source", "hit",
                               pred_col="score", between=(-10**9, 10**9))
    assert res2["rows_matched"] == int(after["score"].notna().sum())


def test_schema_optional_add_and_compaction_upgrade(null_store, tmp_path):
    """Iceberg optional add: default=None surfaces all-null on old
    partitions; compaction's upgrade-on-rewrite materializes the column
    PHYSICALLY as all-null (v2 footer) and the scan stays null-exact."""
    fresh = _build_null_store(tmp_path)
    out = fresh["out"]
    schema.add_column(out, "opt", "i64", None)
    t = schema.scan(out, columns=["doc_id", "opt"]).to_pandas()
    assert len(t) == 600 and t["opt"].isna().all()
    pipeline.compact_partitions(out, target_tokens=10**9)
    rows = pipeline.load_manifest(out)
    assert all(any(c["column"] == "opt" and
                   c.get("null_count") == r["n_rows"]
                   for c in r["columns"]) for r in rows)
    t2 = schema.scan(out, columns=["doc_id", "opt"]).to_pandas()
    assert len(t2) == 600 and t2["opt"].isna().all()
    # the nullable registered column also survives the rewrite null-exact
    # (compaction on an evolved store rewrites the REGISTERED schema;
    # the unregistered custom 'score' column drops by design)
    t3 = pipeline.decode_job(out, columns=["source"]).to_pandas()
    assert t3["source"].isna().sum() == null_store["table"] \
        .to_pandas()["source"].isna().sum()


def test_isnull_predicate_prunes_and_filters(null_store):
    """IS NULL / IS NOT NULL as a declarative predicate: the manifest
    null_count zone map prunes partitions before any IO, the in-task
    filter is exact (round-5 null-aware pruning)."""
    from rwcf import spj
    rows = pipeline.load_manifest(null_store["out"])
    w_null = {"col": "score", "isnull": True}
    w_notnull = {"col": "score", "isnull": False}
    kept_null = spj.prune_rows(rows, w_null)
    # partitions without nulls in score are pruned for IS NULL
    assert all(any(c["column"] == "score" and c.get("null_count", 0) > 0
                   for c in r["columns"]) or
               (r["stats"]["score"].get("null_count") or 0) > 0
               for r in kept_null)
    # exact filter parity vs pandas on a decoded partition
    t = pipeline.decode_partition(rows[0], columns=["doc_id", "score"])
    got_null = spj._row_filter(t, w_null).num_rows
    got_notnull = spj._row_filter(t, w_notnull).num_rows
    df = t.to_pandas()
    assert got_null == int(df["score"].isna().sum())
    assert got_notnull == int(df["score"].notna().sum())
    assert got_null + got_notnull == len(df)


def test_update_where_isnull(null_store, tmp_path):
    """UPDATE ... WHERE col IS NULL: fill nulls via the predicate path
    (null-count zone maps admit only partitions that hold nulls)."""
    fresh = _build_null_store(tmp_path)
    out = fresh["out"]
    before = pipeline.decode_job(out, columns=["score"]).to_pandas()
    n_nulls = int(before["score"].isna().sum())
    assert n_nulls > 0

    res = update.update_where(
        out, "score",
        lambda old, mask: pa.compute.fill_null(old, -1),
        pred_col="score", isnull=True)
    assert res["rows_matched"] == n_nulls
    after = pipeline.decode_job(out, columns=["score"]).to_pandas()
    assert int(after["score"].isna().sum()) == 0
    assert int((after["score"] == -1).sum()) == n_nulls


def test_nullable_column_through_bucket_join(tmp_path, ray_session):
    """A nullable attribute column rides through the bucket store and
    the zero-shuffle storage-partitioned join null-exactly (Acero join
    + validity scatter)."""
    import ray.data as rd

    from rwcf import spj
    n = 200
    ids = [f"d{i:04d}" for i in range(n)]
    t_a = pa.table({
        "doc_id": pa.array(ids, pa.string()),
        "val": pa.array(np.arange(n, dtype=np.int64)),
    })
    score = pa.array(np.arange(n, dtype=np.int64), pa.int64(),
                     mask=np.arange(n) % 4 == 0)
    t_b = pa.table({"doc_id": pa.array(ids, pa.string()), "score": score})
    pa_dir = str(tmp_path / "a.parquet")
    pb_dir = str(tmp_path / "b.parquet")
    pq.write_table(t_a, pa_dir)
    pq.write_table(t_b, pb_dir)
    sa, sb = str(tmp_path / "sa"), str(tmp_path / "sb")
    spj.bucket_store(pa_dir, pipeline.EncodeConfig(
        out_dir=sa, columns=["doc_id", "val"],
        partition_token_budget=50), "doc_id", 4).materialize()
    spj.bucket_store(pb_dir, pipeline.EncodeConfig(
        out_dir=sb, columns=["doc_id", "score"],
        partition_token_budget=50), "doc_id", 4).materialize()
    got = spj.storage_partitioned_join(sa, sb).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(got) == n
    assert got["score"].isna().sum() == 50
    ok = got["score"].notna()
    assert (got.loc[ok, "score"].astype("int64")
            == got.loc[ok, "val"].astype("int64")).all()


def test_null_key_join_semantics_vs_duckdb(ray_session):
    """SQL null-key semantics through the distributed hash join: null
    keys never match (inner drops, left/outer preserve with null fill,
    semi drops, anti keeps) — DuckDB is the oracle."""
    import ray.data as rd

    from rwcf import joins
    a = pa.table({"k": pa.array(["x", None, "y", "z"], pa.string()),
                  "va": pa.array([1, 2, 3, 4], pa.int64())})
    b = pa.table({"k": pa.array(["x", None, "y"], pa.string()),
                  "vb": pa.array([10, 20, 30], pa.int64())})
    con = duckdb.connect()
    con.register("a", a.to_pandas())
    con.register("b", b.to_pandas())
    cases = {
        "inner": "SELECT a.k, va, vb FROM a JOIN b ON a.k=b.k",
        "left": "SELECT a.k, va, vb FROM a LEFT JOIN b ON a.k=b.k",
        "outer": "SELECT a.k, va, vb FROM a FULL JOIN b ON a.k=b.k",
        "semi": "SELECT a.k, va FROM a SEMI JOIN b ON a.k=b.k",
        "anti": "SELECT a.k, va FROM a ANTI JOIN b ON a.k=b.k",
    }
    def check(got, sql, label):
        exp = con.execute(sql).fetchdf()
        cols = [c for c in ["va", "vb"] if c in exp.columns]
        g = got[cols].fillna(-99).astype("int64") \
            .sort_values(cols, ignore_index=True)
        e = exp[cols].fillna(-99).astype("int64") \
            .sort_values(cols, ignore_index=True)
        pd.testing.assert_frame_equal(g, e, obj=label)

    for how, sql in cases.items():
        check(joins.hash_join(rd.from_arrow(a), rd.from_arrow(b),
                              on="k", how=how, buckets=2).to_pandas(),
              sql, f"shuffle:{how}")
        if how in ("inner", "left", "semi", "anti"):  # broadcast modes
            check(joins.hash_join(rd.from_arrow(a), rd.from_arrow(b),
                                  on="k", how=how,
                                  broadcast=True).to_pandas(),
                  sql, f"broadcast:{how}")
        if how in ("inner", "semi", "anti"):  # bloom prefilter modes
            check(joins.hash_join(rd.from_arrow(a), rd.from_arrow(b),
                                  on="k", how=how, buckets=2,
                                  bloom_bits=1 << 12).to_pandas(),
                  sql, f"bloom:{how}")


def test_verify_job_covers_nullable_custom_store(null_store):
    """verify_job's bit-exact source comparison covers the partition's
    OWN columns (round-5 fix: it previously hardcoded the base tokens
    schema and broke on custom/nullable stores) — null-exact, since
    Table.equals compares validity."""
    v = pipeline.verify_job(null_store["out"]).to_pandas()
    assert len(v) > 0
    assert bool(v["equal"].all()), v[~v["equal"]]
    assert (v["mode"] == "source").all()


def test_delete_where_on_nullable_column(tmp_path, ray_session):
    """Predicate delete on a NULLABLE column: hits map through the
    validity scatter to LOGICAL tombstone positions (the dense-indexed
    page path would have tombstoned the wrong rows); NULL never matches
    the predicate."""
    fresh = _build_null_store(tmp_path)
    out = fresh["out"]
    before = pipeline.decode_job(out).to_pandas()
    target = (before["score"] >= 50) & before["score"].notna()
    res = pipeline.delete_where(out, "score", lo=50, hi=10**9)
    assert res["rows_deleted"] == int(target.sum()) > 0
    after = pipeline.decode_job(out).to_pandas()
    assert len(after) == len(before) - int(target.sum())
    # the surviving rows are exactly the complement — doc_id-exact
    exp_ids = set(before.loc[~target, "doc_id"])
    assert set(after["doc_id"]) == exp_ids
    # null-score rows all survive (NULL never matches)
    assert after["score"].isna().sum() == before["score"].isna().sum()


def test_compaction_preserves_nulls(tmp_path, ray_session):
    """Plain compaction (no schema evolution) of a nullable custom store
    re-encodes through the validity split and stays null-exact."""
    fresh = _build_null_store(tmp_path)
    out = fresh["out"]
    before = pipeline.decode_job(out).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    res = pipeline.compact_partitions(out, target_tokens=10**9)
    assert res.get("compacted") or res.get("partitions_written") or True
    after = pipeline.decode_job(out).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    pd.testing.assert_series_equal(after["score"], before["score"],
                                   check_dtype=False)
    pd.testing.assert_series_equal(after["source"], before["source"])
    assert len(pipeline.load_manifest(out)) < 5  # actually compacted


def test_cdc_scan_nullable_source(tmp_path, ray_session):
    """CDC between snapshots on a store whose source column holds nulls:
    hashing is null-aware (NULL hashes distinctly from ''), so a
    NULL -> value backfill IS an update and untouched null rows are
    not phantom changes."""
    fresh = _build_null_store(tmp_path)
    out = fresh["out"]
    s0 = pipeline.create_snapshot(out, note="base")["snapshot"]
    res = update.update_where(out, "source", "backfilled",
                              pred_col="source", isnull=True)
    assert res["rows_matched"] > 0
    s1 = pipeline.create_snapshot(out, note="filled")["snapshot"]
    delta = pipeline.cdc_scan(out, s0, s1).to_pandas()
    assert (delta["op"] == "update").all()
    assert len(delta) == res["rows_matched"]


def test_spj_pushdown_isnull_through_join(tmp_path, ray_session):
    """IS NOT NULL pushed THROUGH the zero-shuffle storage-partitioned
    join: null_count zone maps prune the b-side partitions before any
    decode, the in-task filter is exact."""
    import ray.data as rd

    from rwcf import spj
    n = 160
    ids = [f"d{i:04d}" for i in range(n)]
    t_a = pa.table({"doc_id": pa.array(ids, pa.string()),
                    "val": pa.array(np.arange(n, dtype=np.int64))})
    score = pa.array(np.arange(n, dtype=np.int64), pa.int64(),
                     mask=np.arange(n) % 2 == 0)
    t_b = pa.table({"doc_id": pa.array(ids, pa.string()),
                    "score": score})
    pa_p, pb_p = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    pq.write_table(t_a, pa_p)
    pq.write_table(t_b, pb_p)
    sa, sb = str(tmp_path / "sa"), str(tmp_path / "sb")
    spj.bucket_store(pa_p, pipeline.EncodeConfig(
        out_dir=sa, columns=["doc_id", "val"],
        partition_token_budget=40), "doc_id", 4).materialize()
    spj.bucket_store(pb_p, pipeline.EncodeConfig(
        out_dir=sb, columns=["doc_id", "score"],
        partition_token_budget=40), "doc_id", 4).materialize()
    got = spj.storage_partitioned_join(
        sa, sb, where_b={"col": "score", "isnull": False}) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    # inner join after b-side IS NOT NULL filter: odd indices only
    assert len(got) == n // 2
    assert got["score"].notna().all()
    assert (got["val"] % 2 == 1).all()
