"""Bucketed layout: write once, join with no exchange; layout invariants."""

import os

import numpy as np
import pandas as pd
import pytest

import ray
import ray.data

from research_knowledge_graph_ray.stages.bucketed import (
    bucketed_join,
    write_bucketed,
)
from research_knowledge_graph_ray.stages.join import hash_join


@pytest.fixture()
def layouts(ray_session, tmp_path):
    rng = np.random.default_rng(5)
    a = pd.DataFrame({"k": rng.integers(0, 200, 2000).astype(np.int64),
                      "v": np.arange(2000, dtype=np.int64)})
    b = pd.DataFrame({"k2": np.arange(0, 150, dtype=np.int64),
                      "w": np.arange(150, dtype=np.int64) * 7})
    da = write_bucketed(ray.data.from_pandas(a), "k", str(tmp_path / "a"),
                        n_buckets=8)
    db = write_bucketed(ray.data.from_pandas(b), "k2", str(tmp_path / "b"),
                        n_buckets=8)
    return da, db, a, b


def test_bucketed_join_matches_hash_join(layouts):
    da, db, a, b = layouts
    got = bucketed_join(da, db, "k", "k2", ["k", "v"], ["k2", "w"]).to_pandas()
    want = hash_join(ray.data.from_pandas(a), ray.data.from_pandas(b),
                     "k", "k2", ["k", "v"], ["k2", "w"]).to_pandas()

    def canon(df):
        cols = sorted(df.columns)
        return df[cols].sort_values(cols).reset_index(drop=True)

    pd.testing.assert_frame_equal(canon(got), canon(want), check_dtype=False)
    assert len(got) > 0


def test_bucket_layout_disjoint_and_complete(layouts):
    da, _db, a, _b = layouts
    import pyarrow.parquet as pq

    seen = []
    for d in sorted(os.listdir(da)):
        if not d.startswith("bucket="):
            continue
        t = pq.read_table(os.path.join(da, d, "part.parquet"))
        seen.append(t.to_pandas())
    allrows = pd.concat(seen, ignore_index=True)
    assert len(allrows) == len(a)  # complete
    # disjoint: a key appears in exactly one bucket
    key_buckets = {}
    for i, df in enumerate(seen):
        for k in df["k"].unique():
            assert k not in key_buckets, f"key {k} in two buckets"
            key_buckets[k] = i


def test_bucketed_join_rejects_mismatched_layouts(layouts, tmp_path):
    da, db, a, _b = layouts
    with pytest.raises(ValueError, match="co-partitioning"):
        bucketed_join(da, db, "v", "k2", ["k", "v"], ["k2", "w"])
    dc = write_bucketed(ray.data.from_pandas(a), "k", str(tmp_path / "c"),
                        n_buckets=4)
    with pytest.raises(ValueError, match="bucket counts"):
        bucketed_join(dc, db, "k", "k2", ["k", "v"], ["k2", "w"])
