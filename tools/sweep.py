"""Driver-identical full-registry sweep (the CORRECTNESS protocol replica).

Runs every __ray_entry__.queries() entry at SF (default sf0.01) and compares
to its oracle_sql() in DuckDB with the driver's column-sorted row-sorted
exact value compare. Exit 0 = all green. Run from anywhere; resolves the
repo from its own location."""
import os, sys, time
import duckdb
import pandas as pd
import ray

ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.chdir(_REPO)
import ray.data

import __ray_entry__ as entry_mod

SF = os.environ.get("SF", "/root/testdata/sf0.01")
TABLES = ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def _to_pandas(r):
    return r.to_pandas() if not isinstance(r, pd.DataFrame) else r

def _canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)

qs = entry_mod.queries()
oracles = entry_mod.oracle_sql()
t0 = time.time()
green = rows_only = 0
fails = []
for i, (name, fn) in enumerate(qs.items()):
    try:
        got = _canon(_to_pandas(fn(SF)))
        if name not in oracles:
            assert got.shape[1] >= 1
            rows_only += 1
        else:
            want = _canon(con.execute(oracles[name]).fetchdf())
            assert list(got.columns) == list(want.columns), ("cols", list(got.columns), list(want.columns))
            assert len(got) == len(want), ("rows", len(got), len(want))
            pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
            green += 1
    except Exception as e:
        fails.append((name, repr(e)[:300]))
        print(f"[FAIL] {name}: {repr(e)[:300]}", flush=True)
    if (i + 1) % 25 == 0:
        print(f"[sweep] {i+1}/{len(qs)} done ({time.time()-t0:.0f}s)", flush=True)
print(f"[sweep] oracle-gated green: {green}, rows-only: {rows_only}, fails: {len(fails)}, wall: {time.time()-t0:.0f}s")
for n, e in fails:
    print("FAIL", n, e)
ray.shutdown()
sys.exit(1 if fails else 0)
