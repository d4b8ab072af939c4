"""End-to-end lifecycle integration: every store feature composing on ONE
bucketed store — ingest -> snapshot -> update -> derive -> delete ->
append -> join view -> compaction -> fsck -> CDC -> planner — with the
ground truth tracked in pandas at every step."""

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from rwcf import documents, pipeline, planner, spj, update

SF = "/root/testdata/sf0.001"


def _canon(df, cols):
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_full_lifecycle_composes(tmp_path, ray_session):
    import ray.data as rd
    work = str(tmp_path)
    tokens_dir = documents.tokens_parquet_for(SF, work)
    paths = documents.parquet_files(tokens_dir)
    truth = rd.read_parquet(paths).to_pandas()  # doc_id, tokens, n_tok, source

    # 1. bucketed ingest (batch 1 = docs with int(doc_id) < 400)
    def first_batch(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column("doc_id"), pa.int64())
        return t.filter(pc.less(ids, 400))

    b1 = os.path.join(work, "b1")
    rd.read_parquet(paths).map_batches(first_batch,
                                       batch_format="pyarrow") \
        .write_parquet(b1)
    out = os.path.join(work, "store")
    cfg = pipeline.EncodeConfig(out_dir=out,
                                partition_token_budget=50_000,
                                bloom_bits_per_key=10)
    spj.bucket_store(documents.parquet_files(b1), cfg,
                     key="doc_id", n_buckets=8).materialize()
    state = truth[truth["doc_id"].astype(int) < 400].copy()

    # 2. snapshot the initial state
    snap0 = pipeline.create_snapshot(out, note="v0")["snapshot"]

    # 3. partial-column UPDATE
    update.update_where(out, "source", "cleaned",
                        pred_col="n_tok", between=(250, 500))
    state.loc[state["n_tok"].between(250, 500), "source"] = "cleaned"

    # 4. derive a computed column (one appended section per partition)
    update.derive_column(
        out, "quality",
        lambda t: pc.cast(pc.bit_wise_and(t.column("n_tok"), 63),
                          pa.int32()).combine_chunks(),
        ["n_tok"])
    state["quality"] = state["n_tok"] & 63

    # 5. row-level deletes
    pipeline.delete_docs(out, ["10", "20"])
    state = state[~state["doc_id"].isin(["10", "20"])]

    # 6. incremental bucketed append (batch 2 = the remaining docs);
    #    the appended batch is pre-derived so schemas line up
    def second_batch(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column("doc_id"), pa.int64())
        t = t.filter(pc.greater_equal(ids, 400))
        q = pc.cast(pc.bit_wise_and(t.column("n_tok"), 63), pa.int32())
        return t.append_column("quality", q)

    b2 = os.path.join(work, "b2")
    rd.read_parquet(paths).map_batches(second_batch,
                                       batch_format="pyarrow") \
        .write_parquet(b2)
    cfg2 = pipeline.EncodeConfig(
        out_dir=out, partition_token_budget=50_000,
        columns=["doc_id", "tokens", "n_tok", "source", "quality"],
        bloom_bits_per_key=10)
    spj.bucket_store(documents.parquet_files(b2), cfg2,
                     key="doc_id", n_buckets=8).materialize()
    late = truth[truth["doc_id"].astype(int) >= 400].copy()
    late["quality"] = late["n_tok"] & 63
    state = pd.concat([state, late], ignore_index=True)

    # current reads match the tracked truth
    got = pipeline.decode_job(out).to_pandas()
    cols = ["doc_id", "n_tok", "source", "quality"]
    pd.testing.assert_frame_equal(_canon(got, cols), _canon(state, cols),
                                  check_dtype=False)

    # 7. materialized join view over the store x a side store
    side_pq = os.path.join(work, "side")

    def derive_side(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t.column("doc_id"),
                         "len8": pc.cast(
                             pc.bit_wise_and(t.column("n_tok"), 7),
                             pa.int32())})

    rd.read_parquet(paths).map_batches(derive_side,
                                       batch_format="pyarrow") \
        .write_parquet(side_pq)
    sidecfg = pipeline.EncodeConfig(out_dir=os.path.join(work, "sideb"),
                                    columns=["doc_id", "len8"],
                                    partition_token_budget=10_000)
    spj.bucket_store(documents.parquet_files(side_pq), sidecfg,
                     key="doc_id", n_buckets=8).materialize()
    view = os.path.join(work, "view")
    spj.materialize_join_view(view, out, sidecfg.out_dir,
                              columns_a=["doc_id", "quality"],
                              columns_b=["doc_id", "len8"])
    vgot = pipeline.decode_job(view).to_pandas()
    vexp = state[["doc_id", "quality"]].merge(
        truth[["doc_id", "n_tok"]].assign(
            len8=lambda d: d["n_tok"] & 7)[["doc_id", "len8"]],
        on="doc_id")
    vcols = ["doc_id", "quality", "len8"]
    pd.testing.assert_frame_equal(_canon(vgot, vcols),
                                  _canon(vexp, vcols), check_dtype=False)

    # 8. compaction (bucket-aware) materializes deletes; reads unchanged
    res = pipeline.compact_partitions(out, target_tokens=1 << 21)
    assert res["parts_after"] <= res["parts_before"]
    got2 = pipeline.decode_job(out).to_pandas()
    pd.testing.assert_frame_equal(_canon(got2, cols), _canon(state, cols),
                                  check_dtype=False)
    # the view sees the compaction (fingerprints changed), refresh
    # converges and its content is unchanged
    spj.refresh_view(view)
    vgot2 = pipeline.decode_job(view).to_pandas()
    pd.testing.assert_frame_equal(_canon(vgot2, vcols),
                                  _canon(vexp, vcols), check_dtype=False)

    # 9. deep fsck green through all of it (incl. bucket_assignment)
    rep = pipeline.fsck_store(out, deep=True).to_pandas()
    assert rep["ok"].all()
    assert (rep["check"] == "bucket_assignment").any()

    # 10. time travel to v0 still reads the pristine first batch
    old = pipeline.decode_job(out, snapshot=snap0).to_pandas()
    exp0 = truth[truth["doc_id"].astype(int) < 400]
    pd.testing.assert_frame_equal(
        _canon(old, ["doc_id", "n_tok", "source"]),
        _canon(exp0, ["doc_id", "n_tok", "source"]), check_dtype=False)

    # 11. CDC since v0 explains exactly the net mutations
    delta = pipeline.cdc_scan(out, snap0).to_pandas()
    changed = set(delta["doc_id"])
    assert {"10", "20"} <= changed  # deletes
    assert set(late["doc_id"]) <= changed  # appended batch
    upd_ids = set(exp0.loc[exp0["n_tok"].between(250, 500), "doc_id"]) \
        - {"10", "20"}
    assert upd_ids <= changed

    # 12. the planner routes store x side to the zero-exchange SPJ
    plan = planner.plan_join(out, sidecfg.out_dir)
    assert plan["strategy"] == "spj"
