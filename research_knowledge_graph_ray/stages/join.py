"""Distributed joins: partitioned hash join and as-of join.

The engine broadcasts small sides (see relational.py) — these operators cover
the *both-sides-large* case: tag each side, hash-partition the union on the
join key through the exchange, and join per bucket with vectorized pandas
(`merge` / `merge_asof`). The guide's "explicit partitioned hash join"
pattern; Ray Data's built-in ``Dataset.join`` is avoided for the same reason
as its groupby (per-row Python accumulation).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .shuffle import bucketed_group_apply

_TAG = "__side"


def _as_key_arrow(col: pa.ChunkedArray) -> pa.ChunkedArray:
    """Arrow twin of :func:`_as_key`: integer keys stay int64, everything
    else stringifies — both sides normalize through the same rule."""
    if pa.types.is_integer(col.type):
        return col.cast(pa.int64())
    return col.cast(pa.string())


def _as_key(s: pd.Series) -> pd.Series:
    """Join-key normalization: integer keys stay int64 (the exchange hashes
    them natively — no string cast, and the per-bucket merge runs on int64);
    everything else stringifies as before. Both sides of a join normalize
    through this same function, so dtypes agree bucket-side."""
    import numpy as np
    from pandas.api.types import is_integer_dtype

    return s.astype(np.int64) if is_integer_dtype(s) else s.astype(str)


def _tag(ds: "ray.data.Dataset", side: str, cols: list[str]) -> "ray.data.Dataset":
    def add(df: pd.DataFrame) -> pd.DataFrame:
        df = df[cols].copy()
        df[_TAG] = side
        return df

    return ds.map_batches(add, batch_format="pandas")


def _tag_keyed(
    ds: "ray.data.Dataset", side: str, cols: list[str], on: str
) -> "ray.data.Dataset":
    """Project + side-tag + join-key in ONE map stage (tag and key used to be
    two chained ``map_batches`` — on a read that shatters into hundreds of
    small blocks that doubled the per-block task count for zero work)."""

    def add(df: pd.DataFrame) -> pd.DataFrame:
        df = df[cols].copy()
        df[_TAG] = side
        df["__key"] = _as_key(df[on])
        return df

    return ds.map_batches(add, batch_format="pandas")


def hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    left_on: str,
    right_on: str,
    left_cols: list[str],
    right_cols: list[str],
    n_buckets: int = 32,
    how: str = "inner",
) -> "ray.data.Dataset":
    """Hash join of two large Datasets, partitioned on the join key.

    Both sides flow through ONE exchange keyed on a unified ``__key`` column;
    each reduce bucket splits by side tag and merges with pandas. Column sets
    must be disjoint apart from the keys. ``how`` is ``"inner"`` or
    ``"left"`` (left-outer: unmatched left rows keep NaN right columns —
    partition-correct because every row of a key lands in one bucket)."""
    if how not in ("inner", "left"):
        raise ValueError(f"how={how!r}: only 'inner' and 'left' supported")

    l = _tag_keyed(left, "l", left_cols, left_on)
    r = _tag_keyed(right, "r", right_cols, right_on)
    both = l.union(r)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        # select each side's known columns explicitly — inferring sides by
        # dropping all-null columns would silently lose a legitimately
        # all-null column within a bucket
        # reindex, not select: a bucket fed only by one side's blocks lacks
        # the other side's columns entirely (inner join correctly yields 0 rows)
        lt = df[df[_TAG] == "l"].reindex(columns=left_cols + ["__key"])
        rt = df[df[_TAG] == "r"].reindex(columns=right_cols + ["__key"])
        out = lt.merge(rt, on="__key", how=how)
        return out.drop(columns=["__key"])

    return bucketed_group_apply(both, ["__key"], lambda df: df, final, n_buckets)


def hash_join_salted(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    left_on: str,
    right_on: str,
    left_cols: list[str],
    right_cols: list[str],
    n_buckets: int = 32,
    n_salts: int = 8,
) -> "ray.data.Dataset":
    """Skew-resistant inner hash join: a HOT join key (one key holding a
    large fraction of the big side's rows) funnels into a single reduce
    bucket under plain hash_join. Salting splits the big (left) side's rows
    per key across ``n_salts`` sub-keys and replicates the small-per-key
    (right) side's rows to every salt — hot-key work fans out ``n_salts``
    ways at the cost of ×n_salts duplication of the matching right rows
    only. Output is row-identical to hash_join (tested)."""
    import numpy as np

    def salt_left(df: pd.DataFrame) -> pd.DataFrame:
        df = df[left_cols].copy()
        df[_TAG] = "l"
        salt = np.arange(len(df), dtype=np.int64) % n_salts
        df["__key"] = df[left_on].astype(str) + "#" + pd.Series(salt).astype(str).values
        return df

    def salt_right(df: pd.DataFrame) -> pd.DataFrame:
        df = df[right_cols].copy()
        df[_TAG] = "r"
        reps = []
        for s in range(n_salts):
            rep = df.copy()
            rep["__key"] = rep[right_on].astype(str) + f"#{s}"
            reps.append(rep)
        return pd.concat(reps, ignore_index=True)

    both = left.map_batches(salt_left, batch_format="pandas").union(
        right.map_batches(salt_right, batch_format="pandas"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        lt = df[df[_TAG] == "l"].reindex(columns=left_cols + ["__key"])
        rt = df[df[_TAG] == "r"].reindex(columns=right_cols + ["__key"])
        return lt.merge(rt, on="__key").drop(columns=["__key"])

    return bucketed_group_apply(both, ["__key"], lambda df: df, final, n_buckets)


def semi_anti_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    left_on: str,
    right_on: str,
    left_cols: list[str],
    anti: bool = False,
    n_buckets: int = 32,
) -> "ray.data.Dataset":
    """Partitioned semi-join (``anti=False``: keep left rows WITH a match) /
    anti-join (``anti=True``: keep left rows WITHOUT a match). The right side
    pre-shrinks to distinct keys per block before the exchange — only keys
    move, never right payloads — so the both-sides-large case costs one
    key-only shuffle."""

    l = _tag_keyed(left, "l", left_cols, left_on)

    def right_keys(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"__key": _as_key(df[right_on]).drop_duplicates()})
        out[_TAG] = "r"
        return out

    r = right.map_batches(right_keys, batch_format="pandas")
    both = l.union(r)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if _TAG not in df.columns:
            return df
        rt = df[df[_TAG] == "r"].drop_duplicates("__key")
        return pd.concat([df[df[_TAG] == "l"], rt], ignore_index=True)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        lt = df[df[_TAG] == "l"].reindex(columns=left_cols + ["__key"])
        rkeys = set(df[df[_TAG] == "r"]["__key"])
        keep = ~lt["__key"].isin(rkeys) if anti else lt["__key"].isin(rkeys)
        return lt[keep].drop(columns="__key")

    return bucketed_group_apply(both, ["__key"], partial, final, n_buckets)


def asof_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    by_left: str,
    by_right: str,
    ts_left: str,
    ts_right: str,
    left_cols: list[str],
    right_cols: list[str],
    n_buckets: int = 16,
    direction: str = "backward",
) -> "ray.data.Dataset":
    """As-of join: for each left row, the nearest right row for the same key
    — ``direction="backward"`` takes the greatest ``ts_right ≤ ts_left``,
    ``"forward"`` the smallest ``ts_right ≥ ts_left``. Inner semantics
    (unmatched left rows dropped). Right side must be unique per
    (key, ts_right) for determinism — pre-aggregate if not.

    Both sides hash-partition on the key through one exchange; each bucket
    sorts and runs ``pd.merge_asof`` (the guide's as-of pattern)."""

    l = _tag_keyed(left, "l", left_cols, by_left)
    r = _tag_keyed(right, "r", right_cols, by_right)
    both = l.union(r)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        lt = df[df[_TAG] == "l"].reindex(columns=left_cols + ["__key"])
        rt = df[df[_TAG] == "r"].reindex(columns=right_cols + ["__key"])
        out_cols = [c for c in left_cols + right_cols if c not in (by_right,)]
        if not len(lt) or not len(rt):
            return pd.DataFrame(columns=out_cols)
        lt = lt.sort_values([ts_left]).reset_index(drop=True)
        rt = rt.sort_values([ts_right]).reset_index(drop=True)
        out = pd.merge_asof(
            lt, rt, left_on=ts_left, right_on=ts_right, left_by="__key",
            right_by="__key", direction=direction,
        )
        out = out.dropna(subset=[c for c in right_cols if c != by_right][:1])
        out = out.drop(columns=["__key", ts_right], errors="ignore")
        return out[[c for c in out_cols if c in out.columns]]

    return bucketed_group_apply(both, ["__key"], lambda df: df, final, n_buckets)


def range_count_join(
    probe: "ray.data.Dataset",
    build: "ray.data.Dataset",
    probe_on: str,
    build_on: str,
    probe_cols: list[str],
    build_ts: str,
    probe_start: str,
    probe_end: str,
    out_count: str = "n",
    n_buckets: int = 32,
    probe_casts: dict[str, str] | None = None,
) -> "ray.data.Dataset":
    """Range (interval) join, aggregated: for each ``probe`` row, count the
    ``build`` rows with the same key whose ``build_ts`` falls in
    ``[probe_start, probe_end)``. Inner semantics — probe rows with zero
    matches are dropped.

    One tagged exchange on the equality key co-locates both sides; each
    bucket then sorts the build side ONCE by (key, ts) and answers every
    probe interval with two lexicographic ``np.searchsorted`` calls on a
    structured array — no per-key Python loop, no pair materialization, so
    a probe interval covering millions of build rows costs O(log n), not
    O(n). This is the windowed-count pattern an as-of join can't express
    (asof = nearest single row; range = all rows in an interval).

    Arrow end-to-end: both tag/key map stages and the bucket reduce run on
    ``pa.Table`` batches (zero-copy off the object store); the searchsorted
    kernel itself was always numpy."""
    import numpy as np

    from .shuffle import hash_exchange_apply

    pcols = list(dict.fromkeys(probe_cols + [probe_on, probe_start, probe_end]))

    def tag(side: str, cols: list[str], on: str):
        def add(t: pa.Table) -> pa.Table:
            t = t.select(cols)
            return t.append_column(
                _TAG, pa.array([side] * t.num_rows)
            ).append_column("__key", _as_key_arrow(t[on]))

        return add

    p = probe.map_batches(tag("p", pcols, probe_on),
                          batch_format="pyarrow", zero_copy_batch=True)
    b = build.map_batches(tag("b", [build_on, build_ts], build_on),
                          batch_format="pyarrow", zero_copy_batch=True)
    both = p.union(b)
    _dt = np.dtype([("k", np.int64), ("t", np.int64)])
    cast_types = {c: pa.from_numpy_dtype(np.dtype(d))
                  for c, d in (probe_casts or {}).items()}

    def _empty_out(t: pa.Table) -> pa.Table:
        # typed empty: probe_casts pins columns a one-sided bucket can't see
        # (its concat schema lacks the probe side entirely); remaining types
        # come from whatever the promoted schema does carry
        fields = []
        for c in probe_cols:
            if c in cast_types:
                typ = cast_types[c]
            elif c in t.column_names:
                typ = t.schema.field(c).type
            else:
                typ = pa.null()  # unified into the real type at concat
            fields.append(pa.field(c, typ))
        fields.append(pa.field(out_count, pa.int64()))
        return pa.schema(fields).empty_table()

    def _ts_i64(col: pa.ChunkedArray) -> np.ndarray:
        return (col.to_numpy(zero_copy_only=False)
                .astype("datetime64[us]").astype(np.int64))

    def final(t: pa.Table) -> pa.Table:
        names = set(t.column_names)
        need = {_TAG, "__key", build_ts, probe_start, probe_end, *probe_cols}
        if t.num_rows == 0 or not need.issubset(names):
            return _empty_out(t)
        pt = t.filter(pc.equal(t[_TAG], "p"))
        bt = t.filter(pc.equal(t[_TAG], "b"))
        if pt.num_rows == 0 or bt.num_rows == 0:
            return _empty_out(t)
        # dense per-bucket key ranks give an int64 lexicographic composite
        p_keys = pt["__key"].to_numpy(zero_copy_only=False)
        keys, b_rank = np.unique(bt["__key"].to_numpy(zero_copy_only=False),
                                 return_inverse=True)
        arr = np.empty(bt.num_rows, dtype=_dt)
        arr["k"] = b_rank
        arr["t"] = _ts_i64(bt[build_ts])
        arr.sort()
        p_rank = np.searchsorted(keys, p_keys)
        # probe keys absent from the build side map to a rank whose (k, t)
        # range is empty, so lo == hi and the row drops out below
        in_build = (p_rank < len(keys)) & (
            keys[np.minimum(p_rank, len(keys) - 1)] == p_keys
        )
        q_lo = np.zeros(pt.num_rows, dtype=_dt)
        q_hi = np.zeros(pt.num_rows, dtype=_dt)
        q_lo["k"] = p_rank * in_build
        q_hi["k"] = p_rank * in_build
        q_lo["t"] = _ts_i64(pt[probe_start])
        q_hi["t"] = _ts_i64(pt[probe_end])
        n = np.searchsorted(arr, q_hi) - np.searchsorted(arr, q_lo)
        n = np.where(in_build, n, 0).astype(np.int64)
        keep = n > 0
        out = pt.select(probe_cols).filter(pa.array(keep)).append_column(
            out_count, pa.array(n[keep]))
        for c, typ in cast_types.items():
            i = out.schema.get_field_index(c)
            if out.schema.field(i).type != typ:
                out = out.set_column(i, c, out[c].cast(typ))
        return out

    return hash_exchange_apply(both, ["__key"], lambda t: t, final, n_buckets)


# ---------------------------------------------------------------------------
# Bloom-filter join pruning
# ---------------------------------------------------------------------------

BLOOM_BITS = 1 << 20  # 128 KiB bitmap — broadcastable; ~0.1% fp at 100k keys
BLOOM_HASHES = 4


def build_bloom(ds: "ray.data.Dataset", col: str,
                m_bits: int = BLOOM_BITS, k: int = BLOOM_HASHES):
    """Bloom filter over a key column, built distributed: each block emits a
    partial bitmap (one binary row), the driver ORs the partials (k·128 KiB,
    not keys). No false negatives by construction; false positives only cost
    wasted shuffle rows, never wrong join output."""
    import numpy as np
    import pyarrow as pa

    from .shuffle import _col_hash

    words = m_bits // 64

    def partial(t: pa.Table) -> pa.Table:
        h = _col_hash(t[col].cast(pa.large_string()))
        bm = np.zeros(words, np.uint64)
        h2 = h * np.uint64(0x9E3779B97F4A7C15) | np.uint64(1)
        for i in range(k):
            idx = (h + np.uint64(i) * h2) % np.uint64(m_bits)
            np.bitwise_or.at(bm, (idx >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (idx & np.uint64(63)))
        return pa.table({"bm": pa.array([bm.tobytes()], type=pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    bm = np.zeros(words, np.uint64)
    # an all-empty dataset to_pandas()-es to a ZERO-COLUMN frame — a zero
    # bitmap is the correct filter for an empty build side (drops everything)
    for raw in (parts["bm"] if "bm" in parts.columns else ()):
        bm |= np.frombuffer(raw, np.uint64)
    return ray.put((bm, m_bits, k))


def bloom_prefilter(ds: "ray.data.Dataset", col: str, bloom_ref) -> "ray.data.Dataset":
    """Drop rows whose key is definitely absent from the bloomed side —
    BEFORE the join exchange, so pruned rows never ship."""
    import numpy as np
    import pyarrow as pa

    from .shuffle import _col_hash

    def filt(t: pa.Table) -> pa.Table:
        bm, m_bits, k = ray.get(bloom_ref)
        h = _col_hash(t[col].cast(pa.large_string()))
        h2 = h * np.uint64(0x9E3779B97F4A7C15) | np.uint64(1)
        keep = np.ones(len(h), bool)
        for i in range(k):
            idx = (h + np.uint64(i) * h2) % np.uint64(m_bits)
            bit = (bm[(idx >> np.uint64(6)).astype(np.int64)]
                   >> (idx & np.uint64(63))) & np.uint64(1)
            keep &= bit.astype(bool)
        return t.filter(pa.array(keep))

    return ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)


def hash_join_bloom(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    left_on: str,
    right_on: str,
    left_cols: list[str],
    right_cols: list[str],
    n_buckets: int = 32,
) -> "ray.data.Dataset":
    """hash_join with the probe (left) side bloom-pruned by the build (right)
    side's keys. Use when the right side is SELECTIVE (e.g. a filtered
    dimension): at 100 TB the probe rows that would never match are dropped
    at the map side instead of crossing the exchange."""
    bloom = build_bloom(right, right_on)
    return hash_join(bloom_prefilter(left, left_on, bloom), right,
                     left_on, right_on, left_cols, right_cols, n_buckets)


def probe_key_skew(ds: "ray.data.Dataset", key: str,
                   n_buckets: int = 8) -> dict[str, int]:
    """Exact key-distribution probe for join planning: one KEY-ONLY exchange
    of per-block partial value counts (the key_skew_report machinery inlined
    for a single column). Returns n_rows, n_distinct, top_cnt and the skew
    factor ``top_cnt·n_distinct·1e9 // n_rows`` (1e9 ⇒ uniform)."""
    from .shuffle import bucketed_group_apply

    def part(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(key, as_index=False).size()
               .rename(columns={"size": "n"}))
        return out

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"rows": pd.Series(dtype=np.int64),
                                 "distinct": pd.Series(dtype=np.int64),
                                 "top": pd.Series(dtype=np.int64)})
        g = df.groupby(key)["n"].sum()
        return pd.DataFrame({"rows": [int(g.sum())], "distinct": [len(g)],
                             "top": [int(g.max())]})

    s = bucketed_group_apply(ds, [key], part, fin, n_buckets=n_buckets).to_pandas()
    n_rows, n_distinct, top = int(s["rows"].sum()), int(s["distinct"].sum()), int(s["top"].max())
    skew_e9 = top * n_distinct * 10**9 // n_rows if n_rows else 10**9
    return {"n_rows": n_rows, "n_distinct": n_distinct, "top_cnt": top,
            "skew_e9": skew_e9}


def auto_hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    left_on: str,
    right_on: str,
    left_cols: list[str],
    right_cols: list[str],
    n_buckets: int = 32,
    skew_threshold_e9: int = 4 * 10**9,
    n_salts: int = 8,
) -> tuple["ray.data.Dataset", dict]:
    """Adaptive join planning: probe the big (left) side's key distribution
    with :func:`probe_key_skew` and dispatch to the plain partitioned
    :func:`hash_join` or the skew-resistant :func:`hash_join_salted` when
    the hottest key exceeds ``skew_threshold_e9`` (default: 4× uniform —
    below that, salting's build-side replication costs more than the hot
    bucket). Returns (joined, plan) where ``plan`` records the probe stats
    and the chosen strategy — the adaptive-execution step a 100 TB job runs
    BEFORE funneling one reduce bucket. The probe re-executes the (lazy)
    left plan once; cache/materialize upstream if that pass is expensive."""
    stats = probe_key_skew(left.select_columns([left_on]), left_on)
    salted = stats["skew_e9"] >= skew_threshold_e9
    if salted:
        joined = hash_join_salted(left, right, left_on, right_on,
                                  left_cols, right_cols,
                                  n_buckets=n_buckets, n_salts=n_salts)
    else:
        joined = hash_join(left, right, left_on, right_on,
                           left_cols, right_cols, n_buckets=n_buckets)
    return joined, {**stats, "strategy": "salted" if salted else "plain",
                    "threshold_e9": skew_threshold_e9}
