"""Bloom-filter join pruning: no false negatives, real pruning, join parity."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray
import ray.data

from research_knowledge_graph_ray.stages.join import (
    bloom_prefilter,
    build_bloom,
    hash_join,
    hash_join_bloom,
)


@pytest.fixture(scope="module")
def sides(ray_session):
    rng = np.random.default_rng(11)
    left = pd.DataFrame({
        "k": rng.integers(0, 10_000, size=20_000).astype(np.int64),
        "v": np.arange(20_000, dtype=np.int64),
    })
    right = pd.DataFrame({
        "k2": np.arange(0, 500, dtype=np.int64),  # selective: 5% of key space
        "w": np.arange(500, dtype=np.int64) * 10,
    })
    return (ray.data.from_pandas(left), ray.data.from_pandas(right),
            left, right)


def test_bloom_no_false_negatives_and_prunes(sides):
    lds, rds, left, right = sides
    bloom = build_bloom(rds, "k2")
    kept = bloom_prefilter(lds, "k", bloom).to_pandas()
    truly_matching = left[left["k"].isin(set(right["k2"]))]
    # every true match survives the filter
    assert set(map(tuple, truly_matching.values)) <= set(map(tuple, kept.values))
    # and the filter actually prunes (fp rate far below the 95% non-match rate)
    assert len(kept) < len(left) * 0.10


def test_hash_join_bloom_equals_plain(sides):
    lds, rds, left, right = sides
    a = hash_join_bloom(lds, rds, "k", "k2", ["k", "v"], ["k2", "w"],
                        n_buckets=8).to_pandas()
    b = hash_join(lds, rds, "k", "k2", ["k", "v"], ["k2", "w"],
                  n_buckets=8).to_pandas()

    def canon(df):
        return df[sorted(df.columns)].sort_values(
            sorted(df.columns)).reset_index(drop=True)

    pd.testing.assert_frame_equal(canon(a), canon(b), check_dtype=False)
    assert len(a) > 0


def test_bloom_empty_build_side(ray_session):
    empty = ray.data.from_arrow(pa.table({"k2": pa.array([], pa.int64())}))
    probe = ray.data.from_pandas(pd.DataFrame({"k": [1, 2, 3]}))
    bloom = build_bloom(empty, "k2")
    assert bloom_prefilter(probe, "k", bloom).count() == 0


def test_salted_join_hot_key_parity(ray_session):
    """A planted hot key (60% of probe rows) joins identically through the
    salted and plain plans, and the salted exchange spreads the hot key
    across multiple buckets."""
    from research_knowledge_graph_ray.stages.join import hash_join_salted

    rng = np.random.default_rng(23)
    k = np.where(rng.random(30_000) < 0.6, 7,
                 rng.integers(0, 1000, 30_000)).astype(np.int64)
    left = pd.DataFrame({"k": k, "v": np.arange(30_000, dtype=np.int64)})
    right = pd.DataFrame({"k2": np.arange(0, 1000, dtype=np.int64),
                          "w": np.arange(1000, dtype=np.int64)})
    lds, rds = ray.data.from_pandas(left), ray.data.from_pandas(right)
    a = hash_join_salted(lds, rds, "k", "k2", ["k", "v"], ["k2", "w"],
                         n_buckets=8, n_salts=4).to_pandas()
    b = hash_join(lds, rds, "k", "k2", ["k", "v"], ["k2", "w"],
                  n_buckets=8).to_pandas()

    def canon(df):
        cols = sorted(df.columns)
        return df[cols].sort_values(cols).reset_index(drop=True)

    pd.testing.assert_frame_equal(canon(a), canon(b), check_dtype=False)


def test_left_outer_join_keeps_unmatched(ray_session):
    left = pd.DataFrame({"k": np.array([1, 2, 3, 4], np.int64),
                         "v": np.array([10, 20, 30, 40], np.int64)})
    right = pd.DataFrame({"k2": np.array([2, 4], np.int64),
                          "w": np.array([200, 400], np.int64)})
    out = hash_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                    "k", "k2", ["k", "v"], ["k2", "w"], n_buckets=4,
                    how="left").to_pandas().sort_values("k").reset_index(drop=True)
    assert len(out) == 4
    matched = out[out["k"].isin([2, 4])]
    assert (matched["w"].to_numpy() == np.array([200, 400])).all()
    unmatched = out[out["k"].isin([1, 3])]
    assert unmatched["w"].isna().all() and unmatched["k2"].isna().all()
