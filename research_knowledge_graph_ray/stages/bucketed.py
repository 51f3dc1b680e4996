"""Bucketed (hash-partitioned) table layout: shuffle once, join many times.

The scale pattern the brief prescribes — pick ONE partitioning key and reuse
it across stages: ``write_bucketed`` pays the exchange once and persists the
layout as ``bucket=K/`` parquet directories; ``bucketed_join`` then joins two
co-bucketed tables with NO exchange at all (bucket K of A can only match
bucket K of B), reading matching bucket pairs directly into join tasks. On a
100 TB fact table joined repeatedly against co-bucketed dimensions this
removes every all-to-all after the first.

The bucket function is stages/shuffle.py's `_bucket_ids` (same hash the
exchanges use), so datasets bucketed by ANY of this repo's operators
co-partition with these files.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .shuffle import hash_exchange_apply


def write_bucketed(ds: "ray.data.Dataset", key: str, out_dir: str,
                   n_buckets: int = 16) -> str:
    """One exchange on ``key``, then one parquet directory per bucket
    (``out_dir/bucket=K/part.parquet``). Returns ``out_dir``."""
    import pyarrow.parquet as pq

    import shutil

    ident = lambda t: t  # noqa: E731
    bucketed = hash_exchange_apply(ds, [key], ident, ident, n_buckets=n_buckets)
    refs = bucketed.to_arrow_refs()  # block b == bucket b, in order
    # a re-written layout must never mix with a previous dataset's buckets
    # (stale bucket=K dirs from a larger n_buckets, or a bucket file a
    # degenerate empty skips) — clear before declaring the layout
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    @ray.remote
    def write_one(tab: pa.Table, path: str) -> int:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        if tab.num_columns == 0:  # schema-less degenerate empty — no file;
            return 0              # bucketed_join treats a missing side as 0 rows
        # empty-but-typed buckets ARE written so joins always see a schema
        pq.write_table(tab, path)
        return tab.num_rows

    ray.get([
        write_one.remote(ref, os.path.join(out_dir, f"bucket={b}", "part.parquet"))
        for b, ref in enumerate(refs)
    ])
    with open(os.path.join(out_dir, "_BUCKETS.txt"), "w") as f:
        f.write(f"{key}\n{n_buckets}\n")
    return out_dir


@ray.remote
def _join_bucket(path_a: str, path_b: str, left_on: str, right_on: str,
                 left_cols: list, right_cols: list) -> pa.Table:
    import pyarrow.parquet as pq

    if not (os.path.exists(path_a) and os.path.exists(path_b)):
        # a missing side (schema-less degenerate bucket) — inner join is
        # empty; emit object-typed empties, concat promotes against the
        # typed non-empty blocks
        cols = list(left_cols) + [c for c in right_cols if c not in left_cols]
        return pa.Table.from_pandas(pd.DataFrame(columns=cols),
                                    preserve_index=False)
    a = pq.read_table(path_a, columns=left_cols).to_pandas()
    b = pq.read_table(path_b, columns=right_cols).to_pandas()
    out = a.merge(b, left_on=left_on, right_on=right_on, how="inner",
                  sort=False)
    return pa.Table.from_pandas(out, preserve_index=False)


def bucketed_join(dir_a: str, dir_b: str, left_on: str, right_on: str,
                  left_cols: list, right_cols: list) -> "ray.data.Dataset":
    """Inner join of two co-bucketed layouts with NO exchange: one task per
    bucket pair, each a local pandas merge over two parquet reads. Requires
    both layouts bucketed with the same n_buckets on their join keys."""

    def meta(d):
        with open(os.path.join(d, "_BUCKETS.txt")) as f:
            key, n = f.read().split()
        return key, int(n)

    ka, na = meta(dir_a)
    kb, nb = meta(dir_b)
    if na != nb:
        raise ValueError(f"bucket counts differ: {na} vs {nb}")
    if ka != left_on or kb != right_on:
        raise ValueError(
            f"layouts bucketed on ({ka}, {kb}), join asked on "
            f"({left_on}, {right_on}) — co-partitioning does not apply")
    refs = [
        _join_bucket.remote(
            os.path.join(dir_a, f"bucket={b}", "part.parquet"),
            os.path.join(dir_b, f"bucket={b}", "part.parquet"),
            left_on, right_on, left_cols, right_cols)
        for b in range(na)
    ]
    return ray.data.from_arrow_refs(refs)
