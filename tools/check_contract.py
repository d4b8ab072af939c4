import json
import sys
import time

import duckdb
import pandas as pd
import ray

ray.init(address="local", num_cpus=8, include_dashboard=False,
         ignore_reinit_error=True, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False

sys.path.insert(0, "/root/repo")
import __ray_entry__ as entry_mod

# --sf overrides the checked scale (the graft driver itself runs sf0.01;
# --sf /root/testdata/sf0.1 gives scale-robustness evidence), --only runs
# a comma-separated subset of queries
SF = "/root/testdata/sf0.01"
if "--sf" in sys.argv:
    SF = sys.argv[sys.argv.index("--sf") + 1]
ONLY = None
if "--only" in sys.argv:
    ONLY = set(sys.argv[sys.argv.index("--only") + 1].split(","))

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")


def to_df(res):
    import pyarrow as pa
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


t0 = time.time()
e = entry_mod.entry()
df = to_df(e)
print(f"entry(): {len(df)} rows in {time.time()-t0:.1f}s; schema={list(df.columns)}")
assert len(df) >= 0

qs = entry_mod.queries()
sqls = entry_mod.oracle_sql()
results = {}
for name, fn in qs.items():
    if ONLY is not None and name not in ONLY:
        continue
    t0 = time.time()
    try:
        mine = to_df(fn(SF))
        dt = time.time() - t0
        if name in sqls:
            ora = con.execute(sqls[name]).fetchdf()
            a, b = canon(mine), canon(ora)
            ok_rows = len(a) == len(b)
            ok_cols = list(a.columns) == list(b.columns)
            ok_vals = False
            if ok_rows and ok_cols:
                try:
                    pd.testing.assert_frame_equal(a, b, check_dtype=False)
                    ok_vals = True
                except AssertionError as ex:
                    ok_vals = str(ex)[:200]
            results[name] = {"rows": len(a), "oracle_rows": len(b),
                             "cols_match": ok_cols, "vals": ok_vals,
                             "sec": round(dt, 2)}
        else:
            results[name] = {"rows": len(mine), "rows_only": True,
                             "sec": round(dt, 2)}
    except Exception as ex:
        results[name] = {"error": f"{type(ex).__name__}: {ex}"[:300]}
    print(name, "->", results[name])

fails = [k for k, v in results.items()
         if v.get("error") or v.get("vals") not in (True, None)]
print("FAILS:", fails)

# machine-readable evidence: the graft driver records CORRECTNESS rows for
# only the first 50 queries() entries per round; this dump covers ALL of
# them (pass --out to write it, e.g. CONTRACT_FULL_r04.json at repo root)
if "--out" in sys.argv:
    out_path = sys.argv[sys.argv.index("--out") + 1]
    with open(out_path, "w") as f:
        json.dump({"sf_dir": SF, "n_queries": len(results),
                   "fails": fails, "results": results}, f, indent=1)
    print("wrote", out_path)
ray.shutdown()
