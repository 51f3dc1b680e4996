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

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


_HASH_TAIL = 8  # bytes of each key's suffix fed into the vectorized hash


def _col_hash(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Vectorized content hash of a string column.

    Operates directly on the Arrow offsets/data buffers (no Python per row):
    a polynomial hash of each value's last ``_HASH_TAIL`` bytes plus its
    length. Keys here are content hashes (sha1/md5 hex) or id strings with
    varying suffixes, so the suffix is the high-entropy end — hashing the
    *prefix* would collapse common-prefix ids like ``doc-00001``/``doc-00002``
    into one bucket."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        # integer fast path: hash the values directly (splitmix64 finalizer)
        # instead of casting the column to strings — measured ~5× cheaper on
        # a 600k-row int64 key column, and every relational/basket exchange
        # keys on int64. Nulls collapse to one sentinel (one bucket), same
        # guarantee as the string path.
        x = col.cast(pa.int64())
        if x.null_count:
            x = x.fill_null(-(1 << 62) + 3)
        z = x.to_numpy(zero_copy_only=False).astype(np.uint64)
        z = (z + np.uint64(0x9E3779B97F4A7C15))
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))
    col = col.cast(pa.large_string())  # offsets become int64
    offs = np.frombuffer(col.buffers()[1], dtype=np.int64)[col.offset : col.offset + len(col) + 1]
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    starts, ends = offs[:-1], offs[1:]
    h = (ends - starts).astype(np.uint64) * np.uint64(1000003)
    if data.size == 0:
        return h
    for k in range(1, _HASH_TAIL + 1):
        pos = ends - k
        # a position before the value's own start (short/empty key) must not
        # read a neighbor's bytes — equal keys would hash to different buckets
        # across blocks, breaking the all-rows-of-a-key-in-one-bucket guarantee
        valid = pos >= starts
        safe = np.minimum(np.where(valid, pos, 0), data.size - 1)
        byte = np.where(valid, data[safe], 0).astype(np.uint64)
        h = h * np.uint64(16777619) + byte * np.uint64(k)
    return h


def _bucket_ids(table: pa.Table, keys: list[str], n_buckets: int) -> np.ndarray:
    h = _col_hash(table[keys[0]])
    for k in keys[1:]:
        h = h * np.uint64(1099511628211) + _col_hash(table[k])
    return (h % np.uint64(n_buckets)).astype(np.int64)


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


@ray.remote
def _map_stage(keys, n_buckets: int, partial_fn, fmt: str, *blocks: pa.Table):
    blocks = tuple(b for b in blocks if b.num_columns > 0) or blocks[:1]
    if partial_fn is not None and blocks[0].num_columns > 0:
        # fused combine: the partial runs inside the exchange's map task, so
        # an already-materialized input needs NO extra Dataset execution
        # (each execution costs ~0.5s of fixed driver-side latency). Applied
        # PER BLOCK before the concat, and ONLY to non-empty blocks — exactly
        # the streamed path's semantics (map_batches never feeds empty
        # blocks), since empty blocks from upstream exchanges/joins can carry
        # drifted dtypes (pandas-roundtrip float upcast) that would poison
        # the concat.
        nonempty = tuple(b for b in blocks if b.num_rows > 0)
        if not nonempty:
            empty = pa.table({})  # columnless: reduce filters it against
            return tuple([empty] * n_buckets) if n_buckets > 1 else empty
        blocks = tuple(_from_fmt(partial_fn(_to_fmt(b, fmt)), fmt) for b in nonempty)
    merged = pa.concat_tables(blocks, promote_options="default") if len(blocks) > 1 else blocks[0]
    if merged.num_columns == 0:
        return tuple([merged] * n_buckets) if n_buckets > 1 else merged
    pieces = _split_by_bucket(merged, keys, n_buckets)
    return tuple(pieces) if n_buckets > 1 else pieces[0]


@ray.remote
def _reduce_stage(final_fn, fmt: str, in_schema: pa.Schema | None,
                  *pieces: pa.Table) -> pa.Table:
    # Ray Data can emit schema-less empty blocks; drop them so final_fn never
    # sees a columnless frame. A bucket fed only by columnless pieces gets an
    # empty table in the PARTIAL schema, so final_fn still produces a
    # correctly-typed (empty) output and the result Dataset keeps its schema.
    valid = [p for p in pieces if p.num_columns > 0]
    if not valid:
        if in_schema is None or len(in_schema) == 0:
            return pieces[0]
        valid = [in_schema.empty_table()]
    merged = pa.concat_tables([p for p in valid if p.num_rows > 0] or valid[:1],
                              promote_options="default")
    return _from_fmt(final_fn(_to_fmt(merged, fmt)), fmt)


def hash_exchange_apply(
    ds: "ray.data.Dataset",
    keys: list[str],
    partial_fn: Callable,
    final_fn: Callable,
    n_buckets: int = 32,
    fmt: str = "pyarrow",
) -> "ray.data.Dataset":
    """partial per block → hash-split by ``keys`` → final per bucket.

    ``partial_fn``/``final_fn`` take and return a ``pa.Table`` (fmt="pyarrow")
    or a ``pandas.DataFrame`` (fmt="pandas"); the partial output must contain
    ``keys``.

    Two entry shapes, same exchange:

    - streaming input (lineage not yet executed): the partial combine runs as
      a streamed ``map_batches`` stage (whole-block batches), so only the
      *shrunk* partial outputs are pinned in the object store — the exchange
      never duplicates its full input. This is the 100-TB path for exchanges
      fed straight off a corpus scan.
    - materialized input (``.materialize()`` output or a chained exchange's
      ``from_arrow_refs`` result — blocks already pinned): the partial is
      FUSED into the exchange's raw map tasks, skipping the per-stage Dataset
      execution entirely (~0.5s fixed driver latency each; the flagship's
      record stream feeds four consumers × multiple exchange phases, so the
      fixed costs dominated the small-scale wall time)."""
    from ray.data.dataset import MaterializedDataset

    fused = isinstance(ds, MaterializedDataset)
    if fused:
        refs = ds.to_arrow_refs()  # free: blocks already exist
        map_partial = partial_fn
    else:
        shrunk = ds.map_batches(
            partial_fn, batch_format=fmt, batch_size=None, zero_copy_batch=True
        )
        refs = shrunk.to_arrow_refs()
        map_partial = None
    if not refs:
        return ds

    # bound the scatter width: coalesce partial blocks so the exchange moves
    # ~n_map × n_buckets pieces with n_map ≈ cluster cores
    n_map = max(8, int(ray.cluster_resources().get("CPU", 8)))
    chunk = max(1, -(-len(refs) // n_map))
    if fused:
        # fused groups hold UNSHRUNK input blocks (the streamed path groups
        # already-shrunk partials), so cap group size in BYTES too — a wide
        # materialized input must not hand one map task a multi-GB fetch
        try:
            avg = max(1, int(ds.size_bytes() or 0) // max(1, len(refs)))
            chunk = max(1, min(chunk, (256 << 20) // avg))
        except Exception:  # noqa: BLE001 — metadata unavailable
            pass
    groups = [refs[i : i + chunk] for i in range(0, len(refs), chunk)]

    piece_refs = [
        _map_stage.options(num_returns=n_buckets).remote(
            keys, n_buckets, map_partial, fmt, *g)
        for g in groups
    ]
    if n_buckets == 1:
        piece_refs = [[r] for r in piece_refs]
    # partial-output schema lets empty buckets emit correctly-typed empties
    # (no driver-side barrier; reduce outputs stream into the next stage).
    # Derived after map submission: in the fused path it runs the partial on
    # an empty typed table driver-side, which may block on the input's first
    # block metadata — the map tasks are already in flight by then.
    if fused:
        try:
            sch = ds.schema()
            empty_in = pa.schema(list(zip(sch.names, sch.types))).empty_table()
            in_schema = _from_fmt(partial_fn(_to_fmt(empty_in, fmt)), fmt).schema
        except Exception:  # noqa: BLE001 — partial can't run on empty input
            in_schema = None
    else:
        try:
            sch = shrunk.schema()
            in_schema = pa.schema(list(zip(sch.names, sch.types)))
        except Exception:  # noqa: BLE001 — schema unavailable on degenerate input
            in_schema = None

    out_refs = [
        _reduce_stage.remote(final_fn, fmt, in_schema, *[p[b] for p in piece_refs])
        for b in range(n_buckets)
    ]
    return ray.data.from_arrow_refs(out_refs)


def bucketed_group_apply(
    ds: "ray.data.Dataset",
    bucket_keys: list[str],
    partial_fn: Callable[[pd.DataFrame], pd.DataFrame],
    final_fn: Callable[[pd.DataFrame], pd.DataFrame],
    n_buckets: int = 32,
) -> "ray.data.Dataset":
    """pandas-kernel convenience wrapper over :func:`hash_exchange_apply`."""
    return hash_exchange_apply(ds, bucket_keys, partial_fn, final_fn, n_buckets, fmt="pandas")


def grouped_aggregate(
    ds: "ray.data.Dataset",
    keys: list[str],
    agg_fn: Callable[[pd.DataFrame], pd.DataFrame],
    n_buckets: int = 32,
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
