"""Resumable partitioned-parquet sink (rwcf.sinks)."""

import glob
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from rwcf import sinks


def _corpus(n=500):
    rng = np.random.default_rng(3)
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "score": rng.integers(0, 100, n).astype(np.int64)})


def test_write_partitioned_roundtrip_and_resume(ray_session, tmp_path):
    import ray.data as rd
    out = str(tmp_path / "sink")
    df = _corpus()
    ds = rd.from_pandas(df).repartition(5)

    commits = sinks.write_partitioned(ds, out, "doc_id",
                                      buckets=8).to_pandas()
    assert len(commits) == 8 and not commits["skipped"].any()
    files = sorted(glob.glob(os.path.join(out, "part-*.parquet")))
    assert len(files) == 8 and not glob.glob(os.path.join(out, "*.tmp*"))

    back = pq.read_table(files).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(back, df)

    # resume: delete one partition; rerun must rewrite ONLY that one
    victim = files[3]
    keep_mtime = {f: os.path.getmtime(f) for f in files if f != victim}
    victim_bytes = open(victim, "rb").read()
    os.remove(victim)
    commits2 = sinks.write_partitioned(rd.from_pandas(df), out, "doc_id",
                                       buckets=8).to_pandas()
    assert commits2["skipped"].sum() == 7
    for f, m in keep_mtime.items():
        assert os.path.getmtime(f) == m, "untouched partition rewritten"
    # determinism: the rewritten partition is byte-identical
    assert open(victim, "rb").read() == victim_bytes


def test_write_partitioned_deterministic_across_batchings(ray_session,
                                                          tmp_path):
    import ray.data as rd
    df = _corpus(200)
    outs = []
    for rep, parts in enumerate((1, 7)):
        out = str(tmp_path / f"s{rep}")
        sinks.write_partitioned(rd.from_pandas(df).repartition(parts), out,
                                "doc_id", buckets=4,
                                resume=False).materialize()
        outs.append({os.path.basename(f): open(f, "rb").read()
                     for f in glob.glob(os.path.join(out, "*.parquet"))})
    assert outs[0] == outs[1]
