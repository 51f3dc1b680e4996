"""Bucketed grouped aggregation — the engine's workhorse shuffle primitive.

Ray Data's built-in ``groupby().aggregate()`` accumulates per *row* in Python
(measured ~10× slower than a hash-bucket shuffle + vectorized pandas combine on
this build: 45s vs 4.2s for 300k rows / 30k groups on 32 CPUs). This module
implements the classic partial-aggregate → hash-partition → final-aggregate
plan explicitly:

1. ``partial_fn`` runs vectorized inside ``map_batches`` and shrinks each
   batch (per-batch combiner);
2. rows are bucketed by ``crc32(key) % n_buckets`` — an integer shuffle key,
   so the all-to-all exchange moves pre-shrunk rows and sorts on ints;
3. ``final_fn`` runs once per bucket (vectorized pandas over the whole
   bucket), with the guarantee that all rows of a group land in one bucket.

``n_buckets`` bounds shuffle parallelism; at cluster scale set it ≳ total
cores. Skewed groups are bounded by the upstream per-batch combiners.
"""

from __future__ import annotations

import zlib
from typing import Callable

import numpy as np
import pandas as pd

import ray.data

BUCKET_COL = "__bucket"


def add_bucket_column(df: pd.DataFrame, keys: list[str], n_buckets: int) -> pd.DataFrame:
    key = df[keys[0]].astype(str)
    for k in keys[1:]:
        key = key + "\x00" + df[k].astype(str)
    df = df.copy()
    df[BUCKET_COL] = np.fromiter(
        (zlib.crc32(s.encode("utf-8")) % n_buckets for s in key),
        dtype=np.int64, count=len(key),
    )
    return df


def bucketed_group_apply(
    ds: "ray.data.Dataset",
    bucket_keys: list[str],
    partial_fn: Callable[[pd.DataFrame], pd.DataFrame],
    final_fn: Callable[[pd.DataFrame], pd.DataFrame],
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """partial per batch → hash shuffle on ``bucket_keys`` → final per bucket.

    ``partial_fn`` must preserve the bucket keys; ``final_fn`` sees every row
    of each group together (all rows of a key share a bucket).
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = partial_fn(df)
        if len(out) == 0:
            out = out.copy()
            out[BUCKET_COL] = pd.Series(dtype=np.int64)
            return out
        return add_bucket_column(out, bucket_keys, n_buckets)

    def final(group: pd.DataFrame) -> pd.DataFrame:
        return final_fn(group.drop(columns=[BUCKET_COL]))

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(BUCKET_COL)
        .map_groups(final, batch_format="pandas")
    )


def grouped_aggregate(
    ds: "ray.data.Dataset",
    keys: list[str],
    agg_fn: Callable[[pd.DataFrame], pd.DataFrame],
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """Shortcut when one associative ``agg_fn`` serves as both partial and
    final combine (``agg_fn(concat(agg_fn(x), agg_fn(y))) == agg_fn(x+y)``)."""
    return bucketed_group_apply(ds, keys, agg_fn, agg_fn, n_buckets)
