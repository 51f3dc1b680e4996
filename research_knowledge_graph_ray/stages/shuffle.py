"""Hash-partitioned exchange — the engine's workhorse shuffle primitive.

Why not ``Dataset.groupby``: Ray Data's built-in grouped aggregation is
sort-based and accumulates per row in Python; measured on this build
(1.5M rows, 32 CPUs): ``groupby().aggregate()`` ≈ 45s, ``groupby(int)
.map_groups`` ≈ 15s *even with an identity kernel*, ``sort`` on a string key
≈ 70s — versus ≈ 2s for a plain Arrow C++ hash aggregation of the same data.
The Dataset API cannot express a hash-partitioned exchange with vectorized
combine, so this is one of the few places the engine drops to raw Ray tasks
(SURVEY.md §2 guidance: last-resort, documented):

    map tasks:    partial_fn per block (Arrow kernels) → split rows into
                  ``n_buckets`` sub-tables by ``crc32(key) % n_buckets``
    reduce tasks: concat one bucket's pieces from every block → final_fn

Guarantee: all rows of a key land in exactly one bucket, so ``final_fn`` sees
each group whole. ``partial_fn`` must be a shrinking combine (pre-aggregation)
and ``final_fn`` must be associative with it.

Partitioning assumptions (documented per the north rule):
- ``n_buckets`` bounds reduce-side parallelism; set ≳ cluster cores at scale.
- skew: a single hot *key* is bounded by the map-side partial combine (one row
  per key per block reaches the reduce); a hot *bucket* only matters if many
  hot keys collide — mitigated by salting upstream (see link.py capping).
- the exchange materializes both sides in the object store (like any
  all-to-all); blocks spill under pressure.
"""

from __future__ import annotations

import zlib
from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _bucket_ids(table: pa.Table, keys: list[str], n_buckets: int) -> np.ndarray:
    cols = [table[k].to_pylist() for k in keys]
    if len(cols) == 1:
        it = (str(v) for v in cols[0])
    else:
        it = ("\x00".join(str(v) for v in row) for row in zip(*cols))
    return np.fromiter(
        (zlib.crc32(s.encode("utf-8")) % n_buckets for s in it),
        dtype=np.int64, count=table.num_rows,
    )


def _split_by_bucket(table: pa.Table, keys: list[str], n_buckets: int) -> list[pa.Table]:
    if table.num_rows == 0:
        return [table] * n_buckets
    b = _bucket_ids(table, keys, n_buckets)
    order = np.argsort(b, kind="stable")
    sorted_tab = table.take(pa.array(order))
    sorted_b = b[order]
    bounds = np.searchsorted(sorted_b, np.arange(n_buckets + 1))
    return [
        sorted_tab.slice(bounds[i], bounds[i + 1] - bounds[i]) for i in range(n_buckets)
    ]


def _to_fmt(table: pa.Table, fmt: str):
    return table.to_pandas() if fmt == "pandas" else table


def _from_fmt(obj, fmt: str) -> pa.Table:
    if fmt == "pandas":
        return pa.Table.from_pandas(obj, preserve_index=False)
    return obj


def _map_stage(block: pa.Table, keys, partial_fn, n_buckets: int, fmt: str):
    out = _from_fmt(partial_fn(_to_fmt(block, fmt)), fmt)
    pieces = _split_by_bucket(out, keys, n_buckets)
    return tuple(pieces) if n_buckets > 1 else pieces[0]


def _reduce_stage(final_fn, fmt: str, *pieces: pa.Table) -> pa.Table:
    pieces = [p for p in pieces if p is not None and p.num_rows >= 0]
    merged = pa.concat_tables([p for p in pieces if p.num_rows > 0] or pieces[:1],
                              promote_options="default")
    return _from_fmt(final_fn(_to_fmt(merged, fmt)), fmt)


def hash_exchange_apply(
    ds: "ray.data.Dataset",
    keys: list[str],
    partial_fn: Callable,
    final_fn: Callable,
    n_buckets: int = 64,
    fmt: str = "pyarrow",
) -> "ray.data.Dataset":
    """partial per block → hash-split by ``keys`` → final per bucket.

    ``partial_fn``/``final_fn`` take and return a ``pa.Table`` (fmt="pyarrow")
    or a ``pandas.DataFrame`` (fmt="pandas"); the partial output must contain
    ``keys``."""
    refs = ds.to_arrow_refs()
    if not refs:
        return ds
    map_task = ray.remote(num_returns=n_buckets)(_map_stage)
    reduce_task = ray.remote(_reduce_stage)
    piece_refs = [
        map_task.remote(r, keys, partial_fn, n_buckets, fmt) for r in refs
    ]
    if n_buckets == 1:
        piece_refs = [[r] for r in piece_refs]
    out_refs = [
        reduce_task.remote(final_fn, fmt, *[p[b] for p in piece_refs])
        for b in range(n_buckets)
    ]
    return ray.data.from_arrow_refs(out_refs)


def bucketed_group_apply(
    ds: "ray.data.Dataset",
    bucket_keys: list[str],
    partial_fn: Callable[[pd.DataFrame], pd.DataFrame],
    final_fn: Callable[[pd.DataFrame], pd.DataFrame],
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """pandas-kernel convenience wrapper over :func:`hash_exchange_apply`."""
    return hash_exchange_apply(ds, bucket_keys, partial_fn, final_fn, n_buckets, fmt="pandas")


def grouped_aggregate(
    ds: "ray.data.Dataset",
    keys: list[str],
    agg_fn: Callable[[pd.DataFrame], pd.DataFrame],
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """Shortcut when one associative ``agg_fn`` serves as both partial and
    final combine."""
    return bucketed_group_apply(ds, keys, agg_fn, agg_fn, n_buckets)


# ---------------------------------------------------------------------------
# Arrow aggregation helpers (C++ hash-aggregation kernels)
# ---------------------------------------------------------------------------


def arrow_group_agg(
    table: pa.Table, keys: list[str], aggs: list[tuple[str, str]]
) -> pa.Table:
    """``group_by(keys).aggregate(aggs)`` with output columns renamed back to
    their input names (Arrow appends ``_min``/``_max``/... suffixes)."""
    out = table.group_by(keys).aggregate(aggs)
    rename = {f"{col}_{fn}": col for col, fn in aggs}
    return out.rename_columns([rename.get(c, c) for c in out.column_names])
