"""Partial-column UPDATE (rwcf.update): one column section re-encodes,
every other section byte-copies; atomic replaces-commit; readers, deletes,
snapshots and fsck all stay coherent."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from rwcf import documents, pipeline, update

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def store(tmp_path, ray_session):
    work = str(tmp_path)
    tokens_dir = documents.tokens_parquet_for(SF, work)
    cfg = pipeline.EncodeConfig(out_dir=os.path.join(work, "out"),
                                partition_token_budget=100_000,
                                bloom_bits_per_key=10,
                                bloom_columns=("doc_id", "source"))
    pipeline.encode_job(documents.parquet_files(tokens_dir), cfg) \
        .materialize()
    src = __import__("ray.data", fromlist=["x"]) \
        .read_parquet(documents.parquet_files(tokens_dir)).to_pandas()
    return cfg.out_dir, src


def _decoded(out):
    return pipeline.decode_job(out).to_pandas()


def test_update_matches_reference_semantics(store):
    out, src = store
    pipeline.delete_docs(out, ["3", "17"])
    snap = pipeline.create_snapshot(out, note="pre-update")["snapshot"]
    before = {r["pid"]: os.path.getmtime(r["file"])
              for r in pipeline.load_manifest(out)}

    res = update.update_where(out, "source", "redacted",
                              pred_col="n_tok", between=(200, 400))
    exp = src[~src["doc_id"].isin(["3", "17"])].copy()
    m = exp["n_tok"].between(200, 400)
    assert res["rows_matched"] == int(m.sum()) and m.sum() > 0
    exp.loc[m, "source"] = "redacted"

    got = _decoded(out)
    cols = ["doc_id", "n_tok", "source"]
    pd.testing.assert_frame_equal(
        got[cols].sort_values("doc_id").reset_index(drop=True),
        exp[cols].sort_values("doc_id").reset_index(drop=True),
        check_dtype=False)
    # token payloads byte-identical (they were copied, never re-encoded)
    gt = got.sort_values("doc_id").reset_index(drop=True)
    et = exp.sort_values("doc_id").reset_index(drop=True)
    for i in range(0, len(gt), 97):
        assert list(gt["tokens"][i]) == list(et["tokens"][i])

    # only matched partitions rewrote; the rest kept their files
    after = {r["pid"]: r for r in pipeline.load_manifest(out)}
    for pid, mt in before.items():
        if pid in after:  # untouched partition: same file, same mtime
            assert os.path.getmtime(after[pid]["file"]) == mt
    rewritten = [r for r in after.values()
                 if "update_of" in (r.get("lineage") or {})]
    assert len(rewritten) == res["partitions_rewritten"] > 0
    for r in rewritten:
        # untouched sections carry the OLD codec metadata verbatim
        assert r["lineage"]["set_col"] == "source"
        assert r["replaces"] == [r["lineage"]["update_of"]]

    # time travel: the pre-update snapshot still reads old values
    old = pipeline.decode_job(out, snapshot=snap).to_pandas()
    assert set(old["source"]) == set(src["source"])

    # value idempotence: re-running the same UPDATE rewrites nothing
    res2 = update.update_where(out, "source", "redacted",
                               pred_col="n_tok", between=(200, 400))
    assert res2["partitions_rewritten"] == 0
    assert res2["rows_matched"] == res["rows_matched"]

    # the store still passes a deep integrity audit
    rep = pipeline.fsck_store(out, deep=True).to_pandas()
    assert rep["ok"].all()


def test_update_preserves_bloom_lookups(store):
    out, src = store
    update.update_where(out, "source", "neo", pred_col="doc_id", eq="42")
    hits = pipeline.lookup_docs(out, ["42"]).to_pandas()
    assert len(hits) == 1
    got = _decoded(out)
    assert (got.loc[got["doc_id"] == "42", "source"] == "neo").all()
    # the rebuilt source bloom admits the new value's partitions
    rows = [r for r in pipeline.load_manifest(out)
            if "update_of" in (r.get("lineage") or {})]
    assert rows and all("source" in (r.get("bloom") or {}) for r in rows)


def test_update_guards(store, tmp_path):
    out, _ = store
    with pytest.raises(ValueError, match="cannot update 'tokens'"):
        update.update_where(out, "tokens", b"", pred_col="doc_id", eq="1")
    with pytest.raises(ValueError, match="cannot update 'n_tok'"):
        update.update_where(out, "n_tok", 0, pred_col="doc_id", eq="1")
    # bucket key of a bucketed store is protected
    from rwcf import spj
    bdir = str(tmp_path / "bk")
    os.makedirs(bdir)
    spj.write_bucketspec(bdir, "doc_id", 8)
    with pytest.raises(ValueError, match="bucket key"):
        update.update_where(bdir, "doc_id", "x", pred_col="doc_id", eq="1")


def test_derive_column_materializes_computed_section(store):
    import pyarrow.compute as pc
    out, src = store

    def quality(t: pa.Table) -> pa.Array:
        return pc.cast(pc.bit_wise_and(t.column("n_tok"), 255),
                       pa.int32()).combine_chunks()

    res = update.derive_column(out, "quality", quality, ["n_tok"])
    assert res["column"] == "quality"
    got = _decoded(out)
    assert "quality" in got.columns
    assert (got["quality"] == (got["n_tok"] & 255)).all()
    # token payloads byte-copied, still exact
    gt = got.sort_values("doc_id").reset_index(drop=True)
    et = src.sort_values("doc_id").reset_index(drop=True)
    assert list(gt["tokens"][0]) == list(et["tokens"][0])
    # re-deriving an existing column refuses; store untouched
    n1 = len(pipeline.load_manifest(out))
    with pytest.raises(ValueError, match="already exists"):
        update.derive_column(out, "quality", quality, ["n_tok"])
    assert len(pipeline.load_manifest(out)) == n1
    # deep fsck stays green (copied sections, new section, blooms)
    rep = pipeline.fsck_store(out, deep=True).to_pandas()
    assert rep["ok"].all()
    # zone maps for the derived column support pruning immediately
    rows = pipeline.load_manifest(out)
    assert all("quality" in (r.get("stats") or {}) for r in rows)


def test_drop_column_physically_reclaims_bytes(store):
    out, src = store
    before = sum(r["encoded_bytes"] for r in pipeline.load_manifest(out))
    res = update.drop_column(out, "source")
    assert res["partitions_rewritten"] > 0
    rows = pipeline.load_manifest(out)
    after = sum(r["encoded_bytes"] for r in rows)
    assert after < before
    got = _decoded(out)
    assert "source" not in got.columns
    assert set(got.columns) >= {"doc_id", "tokens", "n_tok"}
    # source bloom sidecar dropped with its column
    assert all("source" not in (r.get("bloom") or {}) for r in rows)
    assert all("source" not in (r.get("stats") or {}) for r in rows)
    pd.testing.assert_frame_equal(
        got[["doc_id", "n_tok"]].sort_values("doc_id")
        .reset_index(drop=True),
        src[["doc_id", "n_tok"]].sort_values("doc_id")
        .reset_index(drop=True), check_dtype=False)
    rep = pipeline.fsck_store(out, deep=True).to_pandas()
    assert rep["ok"].all()
    with pytest.raises(ValueError, match="core column"):
        update.drop_column(out, "tokens")


def test_update_callable_set_fn(store):
    out, src = store

    def tagger(old: pa.Array, mask: np.ndarray) -> pa.Array:
        vals = old.to_pylist()
        for i in np.flatnonzero(mask):
            vals[i] = vals[i] + "-x"
        return pa.array(vals, old.type)

    res = update.update_where(out, "source", tagger,
                              pred_col="doc_id", isin=["7", "8", "9"])
    assert res["rows_matched"] == 3
    got = _decoded(out)
    hit = got[got["doc_id"].isin(["7", "8", "9"])]
    assert hit["source"].str.endswith("-x").all()
    rest = got[~got["doc_id"].isin(["7", "8", "9"])]
    assert not rest["source"].str.endswith("-x").any()


def test_update_on_evolved_store_resolves_renames(store):
    """After rename source->origin, UPDATE on the LOGICAL name rewrites
    the old physical sections; a column added after partitions were
    written refuses with a compaction hint."""
    from rwcf import schema
    out, src = store
    schema.rename_column(out, "source", "origin")
    res = update.update_where(out, "origin", "renamed-hit",
                              pred_col="doc_id", isin=["5", "6"])
    assert res["rows_matched"] == 2 and res["partitions_rewritten"] >= 1
    got = schema.scan(out).to_pandas()
    assert (got.loc[got["doc_id"].isin(["5", "6"]), "origin"]
            == "renamed-hit").all()
    assert (~got.loc[~got["doc_id"].isin(["5", "6"]), "origin"]
            .eq("renamed-hit")).all()

    schema.add_column(out, "grade", "i32", 1)
    with pytest.raises(ValueError, match="no physical section"):
        update.update_where(out, "grade", 2, pred_col="doc_id", eq="5")
    # upgrade-on-rewrite materializes it; then the update works
    pipeline.compact_partitions(out, target_tokens=1 << 22)
    res2 = update.update_where(out, "grade", 2, pred_col="doc_id", eq="5")
    assert res2["rows_matched"] == 1
    got2 = schema.scan(out).to_pandas()
    assert (got2.loc[got2["doc_id"] == "5", "grade"] == 2).all()
    assert (got2.loc[got2["doc_id"] != "5", "grade"] == 1).all()


def test_drop_column_on_evolved_store(store):
    """drop_column resolves renames through the schema log and retires
    the field; derive_column on an evolved store refuses loudly."""
    from rwcf import schema
    out, src = store
    schema.rename_column(out, "source", "origin")
    res = update.drop_column(out, "origin")
    assert res["partitions_rewritten"] > 0
    got = schema.scan(out).to_pandas()
    assert "origin" not in got.columns and "source" not in got.columns
    rows = pipeline.load_manifest(out)
    assert all(all(c["column"] != "source" for c in r["columns"])
               for r in rows), "physical sections gone"
    with pytest.raises(ValueError, match="not supported"):
        update.derive_column(out, "extra",
                             lambda t: t.column("n_tok"), ["n_tok"])
