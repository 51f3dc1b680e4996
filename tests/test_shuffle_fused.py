"""The exchange's two entry shapes (streamed map_batches partial vs the
fused-into-map-task partial for materialized inputs) must be row-identical —
including on empty inputs and on inputs whose blocks carry drifted dtypes
(the pandas-roundtripped empty-bucket float upcast that poisons a naive
concat).

Helpers are defined INSIDE each test: module-level functions pickle by
reference and Ray workers cannot import test modules (see memory note on
worker-class pickling).
"""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from research_knowledge_graph_ray.stages.shuffle import hash_exchange_apply


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return df[sorted(df.columns)].sort_values(sorted(df.columns)).reset_index(drop=True)


def _mk_partial_final():
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("k", as_index=False).agg(n=("v", "size"), s=("v", "sum"))
        for c in ("k", "n", "s"):
            g[c] = g[c].astype(np.int64)
        return g

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("k", as_index=False).agg(n=("n", "sum"), s=("s", "sum"))
        for c in ("k", "n", "s"):
            g[c] = g[c].astype(np.int64)
        return g

    return partial, final


def test_fused_matches_streamed(ray_session):
    partial, final = _mk_partial_final()
    rng = np.random.default_rng(11)
    df = pd.DataFrame({"k": rng.integers(0, 57, 5000).astype(np.int64),
                       "v": np.arange(5000, dtype=np.int64)})
    streamed = ray.data.from_pandas(df).map_batches(
        lambda d: d, batch_format="pandas")  # lineage → streamed path
    fused = ray.data.from_pandas(df).materialize()  # → fused path
    got_s = hash_exchange_apply(streamed, ["k"], partial, final,
                                n_buckets=5, fmt="pandas").to_pandas()
    got_f = hash_exchange_apply(fused, ["k"], partial, final,
                                n_buckets=5, fmt="pandas").to_pandas()
    want = final(partial(df))
    pd.testing.assert_frame_equal(_canon(got_s), _canon(want))
    pd.testing.assert_frame_equal(_canon(got_f), _canon(want))


def test_fused_chained_exchange(ray_session):
    """Exchange output (from_arrow_refs) feeding a second exchange rides the
    fused path; two-phase result must equal the one-shot aggregate."""
    partial, final = _mk_partial_final()
    rng = np.random.default_rng(3)
    df = pd.DataFrame({"k": rng.integers(0, 23, 3000).astype(np.int64),
                       "v": rng.integers(0, 100, 3000).astype(np.int64)})
    phase1 = hash_exchange_apply(
        ray.data.from_pandas(df).materialize(), ["k"], partial, final,
        n_buckets=7, fmt="pandas")
    phase2 = hash_exchange_apply(phase1, ["k"], final, final,
                                 n_buckets=3, fmt="pandas")
    want = final(partial(df))
    pd.testing.assert_frame_equal(_canon(phase2.to_pandas()), _canon(want))


def test_fused_skips_empty_drifted_blocks(ray_session):
    """A materialized input holding an EMPTY block whose dtypes drifted
    (string column read back as float64 — the empty-bucket pandas roundtrip)
    must not poison the exchange concat."""
    good = pa.table({"k": pa.array([1, 2, 1], type=pa.int64()),
                     "v": pa.array([10, 20, 30], type=pa.int64()),
                     "name": pa.array(["a", "b", "c"], type=pa.string())})
    drifted = pa.table({"k": pa.array([], type=pa.float64()),
                        "v": pa.array([], type=pa.float64()),
                        "name": pa.array([], type=pa.float64())})
    ds = ray.data.from_arrow_refs([ray.put(good), ray.put(drifted)])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("k", as_index=False).agg(n=("v", "size"))
        g["k"] = g["k"].astype(np.int64)
        g["n"] = g["n"].astype(np.int64)
        return g

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("k", as_index=False).agg(n=("n", "sum"))
        g["k"] = g["k"].astype(np.int64)
        g["n"] = g["n"].astype(np.int64)
        return g

    out = hash_exchange_apply(ds, ["k"], part, fin, n_buckets=4,
                              fmt="pandas").to_pandas()
    want = pd.DataFrame({"k": [1, 2], "n": [2, 1]}).astype(np.int64)
    pd.testing.assert_frame_equal(_canon(out), _canon(want))


def test_fused_all_empty_input(ray_session):
    """All-empty materialized input: the exchange must not crash; result has
    zero rows."""
    partial, final = _mk_partial_final()
    empty = pa.table({"k": pa.array([], type=pa.int64()),
                      "v": pa.array([], type=pa.int64())})
    ds = ray.data.from_arrow_refs([ray.put(empty)])
    out = hash_exchange_apply(ds, ["k"], partial, final, n_buckets=4,
                              fmt="pandas")
    assert out.count() == 0
