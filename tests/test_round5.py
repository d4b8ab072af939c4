"""Round-5 regression tests for the round-4 ADVICE findings:

1. spj._local_join: nested left column colliding with a scalar right
   column must get Acero-parity suffixing (no duplicate names).
2. update.update_where: repeated updates of a bloom-indexed column keep
   the sidecar size stable (bits_per_key persisted, no geometric growth).
3. CLI `rwcf update`: --eq / --value argv strings are cast to the stored
   column dtype (integer predicates and integer set-columns work).
4. planner.plan_join: spj strategy only chosen when the join type is
   executable by storage_partitioned_join (how='right' falls through).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from rwcf import fixtures, pipeline, planner, spj, update

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------- 1. spj

def _nested_tables():
    ta = pa.table({
        "k": pa.array([1, 2, 3], pa.int64()),
        "x": pa.array([[1, 2], [3], [4, 5]], pa.list_(pa.int32())),
        "a_only": pa.array([10, 20, 30], pa.int64()),
    })
    tb = pa.table({
        "k": pa.array([2, 3, 4], pa.int64()),
        "x": pa.array([200, 300, 400], pa.int64()),  # scalar, same name
        "b_only": pa.array(["p", "q", "r"], pa.string()),
    })
    return ta, tb


def test_local_join_nested_scalar_name_collision():
    ta, tb = _nested_tables()
    m = spj._local_join(ta, tb, "k", "inner", "_r")
    # Acero parity: right-side scalar 'x' is suffixed, nested left 'x'
    # keeps its name; every name unique
    assert sorted(m.column_names) == sorted(
        ["k", "x", "a_only", "x_r", "b_only"])
    assert len(set(m.column_names)) == len(m.column_names)
    got = m.to_pandas().sort_values("k").reset_index(drop=True)
    assert got["k"].tolist() == [2, 3]
    assert [list(v) for v in got["x"]] == [[3], [4, 5]]
    assert got["x_r"].tolist() == [200, 300]
    # pure-Acero path on the scalar projection agrees on naming
    acero = ta.drop_columns(["x"]).join(
        tb, keys="k", join_type="inner", right_suffix="_r",
        coalesce_keys=True)
    assert "x_r" in acero.column_names or "x" in acero.column_names
    # column('x') must not raise (the reported failure mode)
    m.column("x")


def test_local_join_nested_nested_collision():
    ta, tb = _nested_tables()
    tb = tb.set_column(
        tb.schema.get_field_index("x"), "x",
        pa.array([[20], [30], [40]], pa.list_(pa.int32())))
    m = spj._local_join(ta, tb, "k", "left outer", "_r")
    assert sorted(m.column_names) == sorted(
        ["k", "x", "a_only", "x_r", "b_only"])
    got = m.to_pandas().sort_values("k").reset_index(drop=True)
    assert got["k"].tolist() == [1, 2, 3]
    # unmatched left row null-fills the right nested column
    first = got["x_r"].iloc[0]
    assert first is None or (np.isscalar(first) and pd.isna(first))
    assert list(got["x"].iloc[0]) == [1, 2]


# ------------------------------------------------------------- 2. bloom

@pytest.fixture()
def bloom_store(tmp_path, ray_session):
    path = fixtures.tokens_parquet(400, seed=51, cache_dir=str(tmp_path),
                                   row_group_size=200)
    out = str(tmp_path / "out")
    cfg = pipeline.EncodeConfig(out_dir=out, partition_token_budget=40_000,
                                bloom_bits_per_key=10,
                                bloom_columns=("doc_id", "source"))
    pipeline.encode_job(path, cfg).materialize()
    return out


def test_repeated_update_keeps_bloom_size_stable(bloom_store):
    out = bloom_store

    def bloom_meta():
        return [(r["pid"].split("-u")[0],
                 r["bloom"]["source"]["m_bits"],
                 r["bloom"]["source"].get("bits_per_key"))
                for r in pipeline.load_manifest(out) if r.get("bloom")]

    base = bloom_meta()
    assert base and all(bp == 10 for _, _, bp in base)
    m0 = {pid: m for pid, m, _ in base}
    for i in range(4):
        update.update_where(out, "source", f"v{i}",
                            pred_col="n_tok", between=(0, 10**9))
    after = bloom_meta()
    # same logical partitions, identical m_bits each round — the ADVICE
    # bug doubled m_bits per rebuild (16384 -> 32768 -> 65536 ...)
    assert {pid for pid, _, _ in after} == set(m0)
    for pid, m, bp in after:
        assert m == m0[pid], f"{pid}: m_bits drifted {m0[pid]} -> {m}"
        assert bp == 10


def test_legacy_bloom_meta_without_bits_per_key(bloom_store):
    out = bloom_store
    # simulate pre-round-5 manifests: strip the persisted field
    mdir = os.path.join(out, "manifest")
    for f in os.listdir(mdir):
        p = os.path.join(mdir, f)
        with open(p) as fh:
            row = json.load(fh)
        for bm in (row.get("bloom") or {}).values():
            bm.pop("bits_per_key", None)
        with open(p, "w") as fh:
            json.dump(row, fh)
    sizes = [r["bloom"]["source"]["m_bits"]
             for r in pipeline.load_manifest(out) if r.get("bloom")]
    for i in range(3):
        update.update_where(out, "source", f"w{i}",
                            pred_col="n_tok", between=(0, 10**9))
    after = [r["bloom"]["source"]["m_bits"]
             for r in pipeline.load_manifest(out) if r.get("bloom")]
    # floor-derived fallback is a FIXED POINT: no further doubling
    assert sorted(after) == sorted(sizes)


# --------------------------------------------------------------- 3. CLI

def _run_cli(*args):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run([sys.executable, "-m", "rwcf", *args],
                         capture_output=True, text=True, env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_cli_update_numeric_eq_and_value(tmp_path, ray_session):
    import pyarrow.parquet as pq
    import ray.data as rd
    path = fixtures.tokens_parquet(300, seed=52, cache_dir=str(tmp_path),
                                   row_group_size=150)
    # add an integer side column so --value hits an int set-column
    t = pq.read_table(path)
    t = t.append_column("score", pa.array(
        (np.arange(t.num_rows) % 5).astype(np.int32)))
    src2 = str(tmp_path / "with_score.parquet")
    pq.write_table(t, src2, row_group_size=150)
    out = str(tmp_path / "enc")
    cfg = pipeline.EncodeConfig(
        out_dir=out, partition_token_budget=30_000,
        columns=["doc_id", "tokens", "n_tok", "source", "score"])
    pipeline.encode_job(src2, cfg).materialize()

    # integer --eq on an int32 pred column + integer --value on an
    # int32 set column: pre-fix this died with ArrowNotImplementedError
    exp_eq = int((t.column("score").to_numpy() == 2).sum())
    r = _run_cli("update", out, "--set-col", "score", "--value", "99",
                 "--pred-col", "score", "--eq", "2", "--num-cpus", "2")
    assert r["rows_matched"] == exp_eq > 0

    dec = pipeline.decode_job(out, columns=["doc_id", "score"]).to_pandas()
    assert (dec["score"] == 99).sum() == exp_eq
    assert not (dec["score"] == 2).any()

    # string column whose value LOOKS numeric must stay a string
    r2 = _run_cli("update", out, "--set-col", "source", "--value", "123",
                  "--pred-col", "score", "--eq", "99", "--num-cpus", "2")
    assert r2["rows_matched"] == exp_eq
    dec2 = pipeline.decode_job(out, columns=["source"]).to_pandas()
    assert (dec2["source"] == "123").sum() == exp_eq


# ----------------------------------------------------------- 4. planner

@pytest.fixture(scope="module")
def right_join_stores(tmp_path_factory, ray_session):
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data as rd
    tmp = tmp_path_factory.mktemp("planner_right")
    path = fixtures.tokens_parquet(300, seed=53, cache_dir=str(tmp / "tok"),
                                   row_group_size=100)
    side_dir = str(tmp / "side")

    def derive(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t.column("doc_id"),
            "len4": pc.cast(pc.bit_wise_and(t.column("n_tok"), 3),
                            pa.int32())})

    rd.read_parquet(path).map_batches(derive, batch_format="pyarrow") \
        .write_parquet(side_dir)
    side_files = [os.path.join(side_dir, f) for f in os.listdir(side_dir)
                  if f.endswith(".parquet")]
    ba, bb = str(tmp / "ba"), str(tmp / "bb")
    spj.bucket_store(path, pipeline.EncodeConfig(
        out_dir=ba, partition_token_budget=20_000), "doc_id", 4) \
        .materialize()
    spj.bucket_store(side_files, pipeline.EncodeConfig(
        out_dir=bb, columns=["doc_id", "len4"],
        partition_token_budget=200), "doc_id", 4).materialize()
    import ray.data as _rd
    return {"ba": ba, "bb": bb,
            "src": _rd.read_parquet(path).to_pandas(),
            "side": _rd.read_parquet(side_files).to_pandas()}


def test_plan_join_right_falls_through_spj(right_join_stores):
    js = right_join_stores
    # co-bucketed stores still plan spj for supported join types
    assert planner.plan_join(js["ba"], js["bb"])["strategy"] == "spj"
    # 'right' is NOT executable by storage_partitioned_join -> the
    # planner must not select spj (pre-fix: planned_join raised)
    plan = planner.plan_join(js["ba"], js["bb"], how="right")
    assert plan["strategy"] != "spj"
    ds, plan2 = planner.planned_join(
        js["ba"], js["bb"], how="right",
        columns_l=["doc_id", "n_tok"], columns_r=["doc_id", "len4"])
    assert plan2["strategy"] == plan["strategy"]
    got = ds.to_pandas()
    exp = js["src"][["doc_id", "n_tok"]].merge(
        js["side"], on="doc_id", how="right")
    assert len(got) == len(exp)
    g = got.sort_values(["doc_id"]).reset_index(drop=True)
    e = exp.sort_values(["doc_id"]).reset_index(drop=True)
    pd.testing.assert_series_equal(g["len4"].astype("int64"),
                                   e["len4"].astype("int64"),
                                   check_names=False)


def test_cli_update_set_null_and_isnull(tmp_path, ray_session):
    """Round-5 CLI surface: --set-null writes NULLs through the section
    rewrite (v2 validity footer) and --isnull/--notnull route the
    predicate; exactly one of --value/--set-null is enforced."""
    path = fixtures.tokens_parquet(200, seed=54, cache_dir=str(tmp_path),
                                   row_group_size=100)
    out = str(tmp_path / "enc")
    cfg = pipeline.EncodeConfig(out_dir=out, partition_token_budget=30_000)
    pipeline.encode_job(path, cfg).materialize()

    r = _run_cli("update", out, "--set-col", "source", "--set-null",
                 "--pred-col", "n_tok", "--between", "0", "200",
                 "--num-cpus", "2")
    dec = pipeline.decode_job(out, columns=["n_tok", "source"]).to_pandas()
    n_nulled = int((dec["n_tok"] <= 200).sum())
    assert r["rows_matched"] == n_nulled > 0
    assert int(dec["source"].isna().sum()) == n_nulled

    r2 = _run_cli("update", out, "--set-col", "source",
                  "--value", "backfilled", "--pred-col", "source",
                  "--isnull", "--num-cpus", "2")
    assert r2["rows_matched"] == n_nulled
    dec2 = pipeline.decode_job(out, columns=["source"]).to_pandas()
    assert int(dec2["source"].isna().sum()) == 0
    assert int((dec2["source"] == "backfilled").sum()) == n_nulled

    # exactly one of --value/--set-null
    import subprocess
    import sys
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    bad = subprocess.run(
        [sys.executable, "-m", "rwcf", "update", out, "--set-col",
         "source", "--pred-col", "n_tok", "--eq", "5"],
        capture_output=True, text=True, env=env, cwd=REPO)
    assert bad.returncode != 0
