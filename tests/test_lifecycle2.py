"""Second lifecycle composition: the snapshot/ref surfaces chained —
WAP-stage -> audit -> publish onto a BRANCH -> branch scan -> merge ->
tag -> partial UPDATE -> rollback to the tag -> retention -> vacuum ->
deep fsck — with ground truth tracked in pandas throughout."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from rwcf import documents, maintenance, pipeline, update

SF = "/root/testdata/sf0.001"


def _canon(df, cols):
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_snapshot_ref_surfaces_compose(tmp_path, ray_session):
    import ray.data as rd
    work = str(tmp_path)
    tokens_dir = documents.tokens_parquet_for(SF, work)
    paths = documents.parquet_files(tokens_dir)
    truth = rd.read_parquet(paths).to_pandas()
    cols = ["doc_id", "n_tok", "source"]

    # base store = docs with int(doc_id) < 450
    def base_batch(t: pa.Table) -> pa.Table:
        return t.filter(pc.less(pc.cast(t.column("doc_id"), pa.int64()),
                                450))

    b1 = os.path.join(work, "b1")
    rd.read_parquet(paths).map_batches(base_batch,
                                       batch_format="pyarrow") \
        .write_parquet(b1)
    out = os.path.join(work, "store")
    cfg = pipeline.EncodeConfig(out_dir=out,
                                partition_token_budget=100_000)
    pipeline.encode_job(documents.parquet_files(b1), cfg).materialize()
    base = truth[truth["doc_id"].astype(int) < 450]

    # 1. branch forked from the current state
    pipeline.create_branch(out, "dev")

    # 2. WAP: stage the remaining docs, audit them, publish ONTO the branch
    def tail_batch(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(
            pc.cast(t.column("doc_id"), pa.int64()), 450))

    b2 = os.path.join(work, "b2")
    rd.read_parquet(paths).map_batches(tail_batch,
                                       batch_format="pyarrow") \
        .write_parquet(b2)
    st = pipeline.stage_append(out, documents.parquet_files(b2))
    srep = pipeline.fsck_store(st["staging_dir"], deep=True).to_pandas()
    assert srep["ok"].all()  # audit the invisible batch
    # main readers see NOTHING staged
    assert len(pipeline.decode_job(out).to_pandas()) == len(base)
    pipeline.publish_staged(out, st["staging_id"], branch="dev")

    # 3. branch scan sees base + staged; main still does not
    bgot = pipeline.decode_job(out, snapshot="dev").to_pandas()
    pd.testing.assert_frame_equal(_canon(bgot, cols), _canon(truth, cols),
                                  check_dtype=False)
    assert len(pipeline.decode_job(out).to_pandas()) == len(base)

    # 4. fast-forward merge -> main sees everything; tag the state
    pipeline.merge_branch(out, "dev")
    mgot = pipeline.decode_job(out).to_pandas()
    pd.testing.assert_frame_equal(_canon(mgot, cols), _canon(truth, cols),
                                  check_dtype=False)
    snap = pipeline.create_snapshot(out, note="merged")["snapshot"]
    pipeline.tag_snapshot(out, "v1", snap)

    # 5. partial-column UPDATE after the tag
    update.update_where(out, "source", "post-tag",
                        pred_col="n_tok", between=(300, 600))
    cur = truth.copy()
    cur.loc[cur["n_tok"].between(300, 600), "source"] = "post-tag"
    ugot = pipeline.decode_job(out).to_pandas()
    pd.testing.assert_frame_equal(_canon(ugot, cols), _canon(cur, cols),
                                  check_dtype=False)
    # tag still reads the pre-update state
    tgot = pipeline.decode_job(out, snapshot="v1").to_pandas()
    pd.testing.assert_frame_equal(_canon(tgot, cols), _canon(truth, cols),
                                  check_dtype=False)

    # 6. rollback to the tag (reverse CDC delta) -> current == v1
    pipeline.rollback_to_snapshot(out, "v1")
    rgot = pipeline.decode_job(out).to_pandas()
    pd.testing.assert_frame_equal(_canon(rgot, cols), _canon(truth, cols),
                                  check_dtype=False)

    # 7. retention + compaction + gc via the vacuum autopilot (the tag
    #    and branch base stay protected), then a deep fsck
    res = maintenance.vacuum(out, target_tokens=1 << 21,
                             retention_keep_last=1)
    assert "plan" in res
    vgot = pipeline.decode_job(out).to_pandas()
    pd.testing.assert_frame_equal(_canon(vgot, cols), _canon(truth, cols),
                                  check_dtype=False)
    # the tagged ref survived retention and still time-travels
    tgot2 = pipeline.decode_job(out, snapshot="v1").to_pandas()
    pd.testing.assert_frame_equal(_canon(tgot2, cols),
                                  _canon(truth, cols), check_dtype=False)
    rep = pipeline.fsck_store(out, deep=True).to_pandas()
    assert rep["ok"].all()
