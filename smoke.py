"""Driver-environment smoke: runs EXACTLY what the round driver runs, in one
script with a ~10-minute budget, so a session can prove the driver path end
to end (not just pytest) before handing off.

  1. ray.init() happens HERE, before importing __ray_entry__ — the driver
     owns the session; the entry module and queries must not re-init.
  2. entry() must run and produce >=0 rows with a stable schema.
  3. The first N (default 50, env GRAFT_SMOKE_N) queries() entries are run at
     sf0.001 and compared against oracle_sql() in DuckDB — row count, sorted
     column names, order-insensitive values (the driver's gate).
  4. bench.py runs headline-only (GRAFT_BENCH_SUITE=0, small corpus) in a
     subprocess and must print a parseable JSON line with rc=0.

Exit 0 = every step green. Usage: `python smoke.py` from /root/repo.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SMOKE_SF_DIR", "/root/testdata/sf0.001")
N_QUERIES = int(os.environ.get("GRAFT_SMOKE_N", "50"))
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
]


def _canon(df):
    import pandas as pd  # noqa: F401

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _to_pandas(result):
    import pandas as pd

    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pd.DataFrame):
        return result
    return result.to_pandas()  # pyarrow.Table


def main() -> int:
    t_start = time.perf_counter()
    import ray

    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
             include_dashboard=False, ignore_reinit_error=True,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as entry_mod

    failures: list[str] = []

    # -- step 1: entry() ----------------------------------------------------
    t0 = time.perf_counter()
    try:
        res = entry_mod.entry()
        df = _to_pandas(res)
        assert df.shape[0] >= 0 and df.shape[1] >= 1
        print(f"[smoke] entry(): {df.shape[0]} rows x {df.shape[1]} cols "
              f"({time.perf_counter() - t0:.1f}s)", flush=True)
    except Exception as e:  # noqa: BLE001
        failures.append(f"entry(): {e!r}")
        print(f"[smoke] entry() FAILED: {e!r}", flush=True)

    # -- step 2: first-N queries vs DuckDB oracles --------------------------
    import duckdb
    import pandas as pd

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')")
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = list(queries)[:N_QUERIES]
    n_green = n_rows_only = 0
    for name in names:
        t0 = time.perf_counter()
        try:
            got = _canon(_to_pandas(queries[name](SF_DIR)))
            sql = oracles.get(name)
            if sql is None:
                assert got.shape[1] >= 1
                n_rows_only += 1
            else:
                want = _canon(con.execute(sql).fetchdf())
                assert list(got.columns) == list(want.columns), (
                    list(got.columns), list(want.columns))
                assert len(got) == len(want), (len(got), len(want))
                pd.testing.assert_frame_equal(
                    got, want, check_dtype=False, check_exact=True)
            n_green += 1
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: {type(e).__name__}: {str(e)[:200]}")
            print(f"[smoke] query {name} FAILED ({time.perf_counter()-t0:.1f}s)",
                  flush=True)
    print(f"[smoke] queries: {n_green}/{len(names)} green "
          f"({n_rows_only} rows-only) in "
          f"{time.perf_counter() - t_start:.1f}s total", flush=True)
    ray.shutdown()

    # -- step 3: bench headline in a subprocess -----------------------------
    env = dict(os.environ, GRAFT_BENCH_SUITE="0",
               GRAFT_KG_DOCS=os.environ.get("GRAFT_SMOKE_KG_DOCS", "5000"),
               GRAFT_SF_DIR=SF_DIR)
    p = subprocess.run([sys.executable, "bench.py"], env=env,
                       capture_output=True, text=True, timeout=900,
                       cwd=os.path.dirname(os.path.abspath(__file__)))
    parsed = None
    for line in reversed((p.stdout or "").strip().splitlines()):
        try:
            parsed = json.loads(line)
            break
        except (json.JSONDecodeError, ValueError):
            continue
    if p.returncode != 0 or parsed is None or parsed.get("value") is None:
        failures.append(f"bench: rc={p.returncode} parsed={parsed is not None}")
        print(f"[smoke] bench FAILED rc={p.returncode}:"
              f" {(p.stderr or '')[-300:]}", flush=True)
    else:
        print(f"[smoke] bench headline: {parsed['value']}s "
              f"({parsed['docs_per_sec']} docs/s)", flush=True)

    dt = time.perf_counter() - t_start
    if failures:
        print(f"[smoke] RED in {dt:.0f}s — {len(failures)} failure(s):")
        for f in failures:
            print(f"  - {f}")
        return 1
    print(f"[smoke] GREEN in {dt:.0f}s — entry + {len(names)} queries + bench")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
