"""Exact distributed quantiles (stages/stats.py) vs brute-force sorting."""

import math

import numpy as np
import pandas as pd
import pytest
import ray.data

from research_knowledge_graph_ray.stages import stats


def _disc(vals, q):
    s = np.sort(vals)
    return float(s[max(1, math.ceil(q * len(s))) - 1])


def test_group_quantiles_exact():
    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "g": rng.choice(["x", "y", "z"], 5000),
            "v": np.round(rng.lognormal(4, 1.5, 5000), 3),
        }
    )
    ds = ray.data.from_pandas(df)
    got = stats.exact_group_quantiles(ds, "v", "g", [0.5, 0.9, 0.99])
    for _, row in got.iterrows():
        vals = df.loc[df["g"] == row["g"], "v"].to_numpy()
        for q in (0.5, 0.9, 0.99):
            assert row[f"p{q * 100:g}"] == _disc(vals, q)


def test_quantiles_constant_column():
    ds = ray.data.from_pandas(pd.DataFrame({"v": np.full(100, 7.25)}))
    got = stats.exact_group_quantiles(ds, "v", None, [0.5, 0.99])
    assert got["p50"].iloc[0] == 7.25 and got["p99"].iloc[0] == 7.25


def test_quantiles_spike_cap(monkeypatch):
    # a distribution spiked into one bucket beyond the cap raises loudly
    monkeypatch.setattr(stats, "_CAND_CAP", 10)
    ds = ray.data.from_pandas(
        pd.DataFrame({"v": np.concatenate([np.zeros(100), [1.0]])})
    )
    with pytest.raises(ValueError, match="n_hist"):
        stats.exact_group_quantiles(ds, "v", None, [0.5], n_hist=4)


def test_hll_distinct_error_bound():
    rng = np.random.default_rng(5)
    vals = rng.integers(0, 60_000, 150_000)
    exact = len(np.unique(vals))
    est = stats.hll_distinct(ray.data.from_pandas(pd.DataFrame({"v": vals})), "v")
    assert abs(est - exact) / exact < 0.05  # ~3 sigma at p=12

    # linear-counting regime: tiny cardinality stays tight too
    small = ray.data.from_pandas(pd.DataFrame({"v": np.arange(300) % 37}))
    assert abs(stats.hll_distinct(small, "v") - 37) / 37 < 0.05


def test_approx_distinct_custkey_vs_exact(sf_dir):
    import duckdb

    got = int(stats.approx_distinct_custkey(sf_dir)["n_approx"].iloc[0])
    exact = duckdb.sql(
        f"SELECT COUNT(DISTINCT o_custkey) FROM read_parquet('{sf_dir}/orders.parquet')"
    ).fetchone()[0]
    assert abs(got - exact) / exact < 0.05
