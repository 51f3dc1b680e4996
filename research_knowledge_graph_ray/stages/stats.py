"""Distributed order statistics.

Exact quantiles over a numeric column without a global sort: a fixed-width
histogram pass locates the bucket holding each target rank, then a single
candidate-collection pass fetches only those buckets' values for local
selection. Three streaming passes, no all-to-all exchange — the classic
rank-refinement selection. Bucket counts and the candidate set are the only
driver-side state; both are tiny unless the distribution is pathologically
spiked, and the candidate cap turns that case into a loud error (raise
``n_hist``) instead of a silent OOM.

Reference parity note: the reference exposes no statistics layer; this is
part of the brief-mandated large-scale-pipeline operator families (dataset
profiling before training-data curation).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Max, Min

from .shuffle import grouped_aggregate

_CAND_CAP = 5_000_000


def exact_group_quantiles(
    ds: "ray.data.Dataset",
    value_col: str,
    group_col: str | None,
    qs: list[float],
    n_hist: int = 2048,
) -> pd.DataFrame:
    """Exact ``percentile_disc``-semantics quantiles per group.

    Returns one row per group with a ``p{q*100:g}`` column per requested
    quantile: the smallest value whose cumulative distribution reaches q
    (sorted[ceil(q*n)-1]), matching DuckDB/ANSI ``percentile_disc``."""
    agg = ds.aggregate(Min(value_col), Max(value_col))
    lo, hi = float(agg[f"min({value_col})"]), float(agg[f"max({value_col})"])
    if not math.isfinite(lo):
        raise ValueError(f"no finite values in {value_col}")
    width = (hi - lo) or 1.0
    edges_scale = n_hist / width

    def bucket_of(v: np.ndarray) -> np.ndarray:
        return np.clip(((v - lo) * edges_scale).astype(np.int64), 0, n_hist - 1)

    def hist_partial(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        b = bucket_of(v)
        g = (t[group_col].cast(pa.string()).combine_chunks() if group_col
             else pa.nulls(len(v), pa.string()).fill_null(""))
        counted = pa.table(
            {"g": g, "b": b, "cnt": np.ones(len(v), dtype=np.int64)}
        ).group_by(["g", "b"]).aggregate([("cnt", "sum")])
        return counted.rename_columns(
            ["cnt" if c == "cnt_sum" else c for c in counted.column_names])

    def hist_sum(t: pa.Table) -> pa.Table:
        from .shuffle import arrow_group_agg

        return arrow_group_agg(t, ["g", "b"], [("cnt", "sum")])

    from .shuffle import hash_exchange_apply

    hist = hash_exchange_apply(
        ds.map_batches(hist_partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["g", "b"], hist_sum, hist_sum,
    ).to_pandas()  # groups × n_hist rows — driver-sized by construction

    # per group: cumulative counts → (bucket, within-bucket rank) per quantile
    needed: dict[tuple[str, int], list[tuple[float, int]]] = {}
    for g, gh in hist.groupby("g"):
        gh = gh.sort_values("b")
        counts = gh["cnt"].to_numpy(np.int64)
        buckets = gh["b"].to_numpy(np.int64)
        cum = np.concatenate([[0], np.cumsum(counts)])
        n = int(cum[-1])
        for q in qs:
            rank = max(1, math.ceil(q * n))  # 1-based percentile_disc rank
            i = int(np.searchsorted(cum, rank, side="left")) - 1
            i = max(0, min(i, len(buckets) - 1))
            needed.setdefault((g, int(buckets[i])), []).append((q, rank - int(cum[i])))

    need_keys = set(needed)
    total_cand = int(
        hist.set_index(["g", "b"]).loc[list(need_keys), "cnt"].sum()
    )
    if total_cand > _CAND_CAP:
        raise ValueError(
            f"candidate set {total_cand} rows exceeds cap {_CAND_CAP}; "
            f"re-run with larger n_hist (distribution is spiked)"
        )
    by_g: dict[str, list[int]] = {}
    for g, b in need_keys:
        by_g.setdefault(g, []).append(b)
    need_ref = ray.put({g: np.array(sorted(bs), dtype=np.int64)
                        for g, bs in by_g.items()})

    def candidates(t: pa.Table) -> pa.Table:
        wanted = ray.get(need_ref)  # group -> sorted needed buckets (tiny)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        b = bucket_of(v)
        if group_col:
            g_np = np.asarray(t[group_col].cast(pa.string()).to_pylist(),
                              dtype=object)
        else:
            g_np = np.full(len(v), "", dtype=object)
        mask = np.zeros(len(v), dtype=bool)
        for gval, bks in wanted.items():  # |groups| iterations, all-numpy body
            mask |= (g_np == gval) & np.isin(b, bks)
        return pa.table({"g": pa.array(g_np[mask].tolist(), type=pa.string()),
                         "b": b[mask], "v": v[mask]})

    cand = ds.map_batches(candidates, batch_format="pyarrow",
                          zero_copy_batch=True).to_pandas()

    rows: dict[str, dict[str, float]] = {}
    for (g, b), wants in needed.items():
        vals = np.sort(cand[(cand["g"] == g) & (cand["b"] == b)]["v"].to_numpy())
        for q, k in wants:
            rows.setdefault(g, {})[f"p{q * 100:g}"] = float(vals[k - 1])

    out = pd.DataFrame(
        [{**({group_col: g} if group_col else {}), **cols} for g, cols in rows.items()]
    )
    cols_order = ([group_col] if group_col else []) + [f"p{q * 100:g}" for q in qs]
    return out[cols_order].sort_values(cols_order[0]).reset_index(drop=True)


def price_quantiles(sf_dir: str) -> pd.DataFrame:
    """(l_returnflag, p50, p90, p99) — exact per-flag l_extendedprice
    quantiles; column-pruned read, three streaming passes."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_returnflag", "l_extendedprice"]
    )
    return exact_group_quantiles(
        ds, "l_extendedprice", "l_returnflag", [0.5, 0.9, 0.99]
    )


def hll_distinct(ds: "ray.data.Dataset", col: str, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT col) via HyperLogLog with 2**p registers.

    Per-block partials compute register maxima locally (one deterministic
    64-bit hash pass, numpy bit ops), emit only non-zero (register, rank)
    rows, and a grouped max merges them — the sketch, not the values, crosses
    the exchange, so the network cost is O(2**p) regardless of input size.
    Standard error ≈ 1.04/sqrt(2**p) (~1.6% at p=12). Flajolet et al. 2007
    estimator with small-range linear counting correction."""
    m = 1 << p

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[col], index=False).to_numpy(np.uint64)
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # sentinel stop bit
        # rank = leading zeros of the remaining 64-p bits, + 1
        lz = np.zeros(len(h), dtype=np.int64)
        cur = rest.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            mask = cur < (np.uint64(1) << np.uint64(64 - shift))
            lz[mask] += shift
            cur[mask] = cur[mask] << np.uint64(shift)
        rank = np.minimum(lz + 1, 64 - p + 1)
        out = pd.DataFrame({"reg": idx, "rank": rank})
        return out.groupby("reg", as_index=False).agg(rank=("rank", "max"))

    merged = grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas"),
        ["reg"],
        lambda df: df.groupby("reg", as_index=False).agg(rank=("rank", "max")),
        n_buckets=8,
    ).to_pandas()  # <= 2**p rows

    regs = np.zeros(m, dtype=np.float64)
    regs[merged["reg"].to_numpy(np.int64)] = merged["rank"].to_numpy(np.float64)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs))
    zeros = int(np.sum(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)  # linear counting for small cardinality
    return float(est)


def approx_distinct_custkey(sf_dir: str) -> pd.DataFrame:
    """One row (n_approx,) — HLL-approximate distinct o_custkey. Rows-only
    driver check (approximate by construction); the error bound is pinned by
    tests/test_stats.py against the exact count."""
    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    return pd.DataFrame({"n_approx": [int(round(hll_distinct(ds, "o_custkey")))]})


# ~3-sigma relative error for HLL at p=12 (1.04/sqrt(4096) ≈ 1.6% per sigma),
# in basis points — the bound the oracle-gated variant asserts as data.
HLL_BOUND_BP = 500


def approx_distinct_custkey_gated(sf_dir: str) -> pd.DataFrame:
    """One row (n_exact, hll_in_bound) — the oracle-gatable restatement of the
    HLL sketch (VERDICT r2 #7, the knn_topk_ivf precedent): n_exact is the
    EXACT distinct count computed distributedly (key-only exchange: per-block
    local uniques → grouped count, values never leave as rows), and
    hll_in_bound certifies |HLL − exact| ≤ HLL_BOUND_BP/1e4 · exact. The
    deterministic hash makes the estimate reproducible, so the gate is stable,
    and DuckDB can restate both columns exactly."""
    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    est = hll_distinct(ds, "o_custkey")

    def local_unique(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"o_custkey": df["o_custkey"].unique()})

    uniq = grouped_aggregate(
        ds.map_batches(local_unique, batch_format="pandas"),
        ["o_custkey"], local_unique, n_buckets=8)
    n_exact = int(uniq.count())
    in_bound = int(abs(est - n_exact) * 10_000 <= HLL_BOUND_BP * n_exact)
    return pd.DataFrame({"n_exact": pd.array([n_exact], dtype="int64"),
                         "hll_in_bound": pd.array([in_bound], dtype="int32")})


# ---------------------------------------------------------------------------
# Sufficient-statistics regression / correlation, grouped mode, histogram,
# z-score outliers — dataset-profiling primitives for training-data curation.
# Every float in the outputs is derived from EXACT integer sums (the only
# values that cross the exchange), so the DuckDB oracle can restate the same
# formula over HUGEINT sums and match bit-for-bit.
# ---------------------------------------------------------------------------

_ISUM_STEP = 1 << 16  # chunked exact sum: 2^16 × 1e14 (max y²) < 2^63


def _isum(a: np.ndarray) -> int:
    """Exact Python-int sum of an int64 array (chunk partials stay < 2^63)."""
    return sum(int(a[i : i + _ISUM_STEP].sum()) for i in range(0, len(a), _ISUM_STEP))


def _round_e9(v: float) -> int:
    """ROUND(v * 1e9) with DuckDB semantics (half away from zero).

    Compares the exact fractional part instead of computing ``s + 0.5``,
    which double-rounds once |s| exceeds 2^52 (the float spacing there is 1,
    so adding 0.5 rounds ties to even before the floor)."""
    s = abs(v) * 1e9
    f = math.floor(s)
    if s - f >= 0.5:
        f += 1
    return int(f) if v >= 0 else -int(f)


def _round_e9_vec(v: np.ndarray) -> np.ndarray:
    """Vectorized :func:`_round_e9` — identical IEEE ops per element (abs,
    ×1e9, floor, exact-fraction compare), so results are bit-identical to
    the scalar version while avoiding a per-row Python loop."""
    s = np.abs(v) * 1e9
    f = np.floor(s)
    f = f + (s - f >= 0.5)
    return np.where(v >= 0, f, -f).astype(np.int64)


def linear_sufficient_stats(
    ds: "ray.data.Dataset", x_col: str, y_col: str, y_cents: bool = True
) -> dict[str, int]:
    """Exact integer sufficient statistics (n, Σx, Σy, Σx², Σy², Σxy) for a
    linear fit of ``y_col`` on ``x_col``.

    Per-block partials are six exact integers serialized as decimal strings
    (sums exceed int64 at scale); the driver folds one tiny row per block.
    x is assumed integer-valued, y cents-exact when ``y_cents`` — both are
    range-checked so a violated assumption raises instead of silently
    rounding. No shuffle: this is a pure map + O(blocks) driver fold."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        xf = df[x_col].to_numpy(np.float64)
        yf = df[y_col].to_numpy(np.float64) * (100.0 if y_cents else 1.0)
        x = np.rint(xf).astype(np.int64)
        y = np.rint(yf).astype(np.int64)
        if np.abs(xf - x).max(initial=0.0) > 1e-6 or np.abs(yf - y).max(initial=0.0) > 1e-6:
            raise ValueError(f"{x_col}/{y_col} not integer/cents-exact")
        return pd.DataFrame(
            {
                "n": [len(x)],
                "sx": [str(_isum(x))],
                "sy": [str(_isum(y))],
                "sxx": [str(_isum(x * x))],
                "syy": [str(_isum(y * y))],
                "sxy": [str(_isum(x * y))],
            }
        )

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()  # O(blocks) rows
    return {
        "n": int(parts["n"].sum()),
        **{c: sum(int(v) for v in parts[c]) for c in ("sx", "sy", "sxx", "syy", "sxy")},
    }


def price_qty_regression(sf_dir: str) -> pd.DataFrame:
    """One row (n, corr_e9, slope_e9, intercept_e9) — Pearson correlation and
    OLS fit of l_extendedprice (cents) on l_quantity across all of lineitem.

    The classic sufficient-statistics reduction: six exact integers summarize
    the whole table, so the op is one streaming pass + O(blocks) driver fold
    at any scale. Fixed-point e9 outputs give the oracle bit-exact parity."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_quantity", "l_extendedprice"]
    )
    s = linear_sufficient_stats(ds, "l_quantity", "l_extendedprice")
    n, sx, sy, sxx, syy, sxy = (s[k] for k in ("n", "sx", "sy", "sxx", "syy", "sxy"))
    num = float(n * sxy - sx * sy)
    den_x = float(n * sxx - sx * sx)
    den_y = float(n * syy - sy * sy)
    slope = num / den_x
    return pd.DataFrame(
        {
            "n": [n],
            "corr_e9": [_round_e9(num / math.sqrt(den_x * den_y))],
            "slope_e9": [_round_e9(slope)],
            "intercept_e9": [_round_e9((float(sy) - slope * float(sx)) / float(n))],
        }
    )


def user_top_event(sf_dir: str) -> "ray.data.Dataset":
    """(user_id, top_event, cnt) — grouped mode: each user's most frequent
    event type, ties broken lexicographically.

    Partial (user, type) counts shrink each block before the single exchange
    on user_id; the per-bucket final pass sums counts and keeps the argmax
    row. Count rows per user are bounded by the type vocabulary, so the
    exchange moves O(users × |types|), never O(events)."""
    from .shuffle import bucketed_group_apply

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )

    def part(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby(["user_id", "event_type"], as_index=False)
            .size()
            .rename(columns={"size": "cnt"})
        )

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df = df.groupby(["user_id", "event_type"], as_index=False).agg(cnt=("cnt", "sum"))
        df = df.sort_values(
            ["user_id", "cnt", "event_type"], ascending=[True, False, True]
        ).drop_duplicates("user_id", keep="first")
        out = df.rename(columns={"event_type": "top_event"})[
            ["user_id", "top_event", "cnt"]
        ]
        # empty buckets: pandas object → Arrow null; pin the string dtype so
        # every output block carries the same schema
        return out.astype({"top_event": "string"})

    return bucketed_group_apply(ds, ["user_id"], part, fin)


def order_price_histogram(sf_dir: str, width: float = 25_000.0) -> "ray.data.Dataset":
    """(bucket, n_orders, sum_cents) — fixed-width histogram of o_totalprice.

    Map-side partials collapse each block to O(|buckets|) rows; the combine
    is a tiny exchange over bucket ids. Constant (data-independent) bin edges
    keep the op one-pass and the SQL restatement trivial."""
    from .shuffle import bucketed_group_apply

    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_totalprice"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        p = df["o_totalprice"].to_numpy(np.float64)
        out = pd.DataFrame(
            {
                "bucket": np.floor(p / width).astype(np.int64),
                "n_orders": np.int64(1),
                "sum_cents": np.rint(p * 100.0).astype(np.int64),
            }
        )
        return out.groupby("bucket", as_index=False).agg(
            n_orders=("n_orders", "sum"), sum_cents=("sum_cents", "sum")
        )

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("bucket", as_index=False).agg(
            n_orders=("n_orders", "sum"), sum_cents=("sum_cents", "sum")
        )

    return bucketed_group_apply(ds, ["bucket"], part, fin, n_buckets=4)


def value_outliers(sf_dir: str, z: float = 3.0) -> pd.DataFrame:
    """(event_id, cents) — events whose value sits more than ``z`` population
    standard deviations from the mean (events.value is heavy-tailed).

    Two streaming passes: exact integer (n, Σy, Σy²) → driver-computed
    mean/std broadcast into a vectorized filter map. Nothing but the six-int
    summary ever leaves a worker in pass one."""
    path = f"{sf_dir}/events.parquet"
    s = linear_sufficient_stats(
        ray.data.read_parquet(path, columns=["value"]).map_batches(
            lambda df: df.assign(_one=np.int64(1)), batch_format="pandas"
        ),
        "_one",
        "value",
    )
    n, sy, syy = s["n"], s["sy"], s["syy"]
    mean = float(sy) / float(n)
    std = math.sqrt(float(n * syy - sy * sy)) / float(n)
    lo, hi = mean - z * std, mean + z * std

    def pick(df: pd.DataFrame) -> pa.Table:
        cents = np.rint(df["value"].to_numpy(np.float64) * 100.0).astype(np.int64)
        m = (cents < lo) | (cents > hi)
        return pa.table(
            {
                "event_id": pa.array(df["event_id"].to_numpy()[m], type=pa.int64()),
                "cents": pa.array(cents[m], type=pa.int64()),
            }
        )

    out = ray.data.read_parquet(path, columns=["event_id", "value"]).map_batches(
        pick, batch_format="pandas"
    ).to_pandas()  # z-tail-bound by construction (≤ n/z² via Chebyshev)
    if "event_id" not in out.columns:  # all-empty blocks lose schema in Ray
        out = pd.DataFrame({"event_id": pd.Series(dtype=np.int64),
                            "cents": pd.Series(dtype=np.int64)})
    return out


def table_profile(sf_dir: str, table: str = "orders") -> pd.DataFrame:
    """(col, n_rows, n_null, n_distinct) — exact one-table column profiler.

    Null/row counts are map-side partials folded on the driver. Exact
    distinct counts use ONE tagged exchange over per-block-distinct
    (col, val) string pairs — each block contributes a value at most once per
    column, so the exchange moves the sum of per-block vocabularies, not the
    table. (At extreme scale swap in :func:`hll_distinct` per column — the
    sketch path is already tested; this is the exact-profile variant.)"""
    from .shuffle import bucketed_group_apply

    ds = ray.data.read_parquet(f"{sf_dir}/{table}.parquet")
    cols = ds.schema().names

    def base(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "col": cols,
                "n_rows": np.int64(len(df)),
                "n_null": [int(df[c].isna().sum()) for c in cols],
            }
        )

    totals = (
        ds.map_batches(base, batch_format="pandas")
        .to_pandas()
        .groupby("col", as_index=False)
        .agg(n_rows=("n_rows", "sum"), n_null=("n_null", "sum"))
    )

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        frames = [
            pd.DataFrame({"col": c, "val": df[c].dropna().astype(str).unique()})
            for c in cols
        ]
        return pd.concat(frames, ignore_index=True)

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["col", "val"])

    def count_distinct(df: pd.DataFrame) -> pd.DataFrame:
        g = df.drop_duplicates(["col", "val"]).groupby("col", as_index=False).size()
        return g.rename(columns={"size": "n_distinct"})

    nd = (
        bucketed_group_apply(ds.map_batches(pairs, batch_format="pandas"),
                             ["col", "val"], dedup, count_distinct)
        .to_pandas()  # ≤ buckets × |cols| rows
        .groupby("col", as_index=False)
        .agg(n_distinct=("n_distinct", "sum"))
    )
    out = totals.merge(nd, on="col", how="left").fillna({"n_distinct": 0})
    out["n_distinct"] = out["n_distinct"].astype(np.int64)
    return out.sort_values("col").reset_index(drop=True)


def embedding_pca(sf_dir: str, k: int = 4) -> pd.DataFrame:
    """(component, eigenvalue, var_explained) — PCA over the embeddings table
    via distributed covariance sufficient statistics.

    Per-block partials are (n, Σx ∈ R^d, XᵀX ∈ R^{d×d}) — d² floats per
    block, independent of row count — folded on the driver, where the d×d
    eigendecomposition runs (d is model-sized, never data-sized). The classic
    pattern for embedding whitening / dim-reduction before clustering.
    Approximate by construction (float sums); pinned against single-machine
    numpy PCA by tests/test_profiling_ops.py, rows-only for the driver."""

    def partial(batch: pa.Table) -> pd.DataFrame:
        x = np.vstack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        return pd.DataFrame(
            {
                "n": [x.shape[0]],
                "s": [np.ascontiguousarray(x.sum(axis=0)).tobytes()],
                "xtx": [np.ascontiguousarray(x.T @ x).tobytes()],
            }
        )

    parts = (
        ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()  # O(blocks) rows of d + d² floats
    )
    n = int(parts["n"].sum())
    s = np.sum([np.frombuffer(b, dtype=np.float64) for b in parts["s"]], axis=0)
    d = s.shape[0]
    xtx = np.sum(
        [np.frombuffer(b, dtype=np.float64).reshape(d, d) for b in parts["xtx"]],
        axis=0,
    )
    mean = s / n
    cov = xtx / n - np.outer(mean, mean)
    evals = np.linalg.eigvalsh(cov)[::-1]  # descending
    total = float(evals.sum())
    top = evals[:k]
    return pd.DataFrame(
        {
            "component": np.arange(k, dtype=np.int64),
            "eigenvalue": top,
            "var_explained": top / total,
        }
    )


_MOMENT_SCALE = 1_000_000


def embedding_moments(sf_dir: str) -> pd.DataFrame:
    """(i, j, m) — the upper triangle of the EXACT integer second-moment
    (Gram) matrix of the embeddings table, ``m = Σ_rows q_i·q_j`` with
    ``q = floor(x·10⁶)`` per coordinate.

    This is the oracle gate for the distributed heart of
    :func:`embedding_pca`: the same one-pass sufficient-statistics dataflow
    (per-block d×d partials, fold, never the rows), but quantized to int64 so
    summation order cannot perturb a single bit — the SQL restatement
    (``EMBEDDING_MOMENTS_SQL``) unnests the vectors and self-joins per
    ``vec_id``, and matches exactly. The float PCA itself stays rows-only
    (eigendecomposition is not SQL-expressible); this query pins everything
    up to the driver-side eigensolve.

    Per-block partial is one d²-int64 buffer regardless of row count; the
    driver folds O(blocks) of them (model-sized, never data-sized — the same
    shape as the PCA partials above). Overflow bound: |q| ≤ S·max|x|, so
    ``n·(S·max|x|)² < 2⁶³`` holds up to ~3×10⁷ rows at max|x|≈0.55; at corpus
    scale drop the scale to 10⁴ (bound then ~3×10¹¹ rows) — the gate only
    needs a fixed documented quantizer, not 10⁶ specifically.

    Reference parity note: no counterpart in the reference — brief-mandated
    embedding-pipeline profiling (covariance/whitening statistics before
    clustering or dedup)."""

    def partial(batch: pa.Table) -> pd.DataFrame:
        x = np.vstack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        q = np.floor(x * _MOMENT_SCALE).astype(np.int64)
        return pd.DataFrame({"g": [np.ascontiguousarray(q.T @ q).tobytes()],
                             "d": [np.int64(q.shape[1])],
                             "n": [np.int64(q.shape[0])],
                             "qmax": [np.int64(np.abs(q).max(initial=0))]})

    parts = (
        ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()  # O(blocks) rows of d² int64 each
    )
    # runtime enforcement of the documented bound: |m| <= n·max|q|² entrywise,
    # checked in unbounded Python ints — int64 would otherwise wrap silently
    # (DuckDB's SUM promotes to HUGEINT, so the oracle would quietly diverge)
    n_total = int(parts["n"].sum())
    qmax = int(parts["qmax"].max())
    if n_total * qmax * qmax >= 2**63:
        raise OverflowError(
            f"embedding_moments int64 bound exceeded: n={n_total}, "
            f"max|q|={qmax} -> n*max|q|^2 >= 2^63; lower _MOMENT_SCALE "
            f"(see docstring) for this corpus size")
    d = int(parts["d"].iloc[0])
    g = np.zeros((d, d), dtype=np.int64)
    for b in parts["g"]:
        g += np.frombuffer(b, dtype=np.int64).reshape(d, d)
    iu = np.triu_indices(d)
    return pd.DataFrame({
        "i": (iu[0] + 1).astype(np.int64),
        "j": (iu[1] + 1).astype(np.int64),
        "m": g[iu],
    })


EMBEDDING_MOMENTS_SQL = f"""
WITH q AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) AS i,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * {_MOMENT_SCALE})
              AS BIGINT) AS qx
  FROM embeddings
)
SELECT a.i AS i, b.i AS j, SUM(a.qx * b.qx) AS m
FROM q a JOIN q b ON a.vec_id = b.vec_id AND b.i >= a.i
GROUP BY 1, 2
ORDER BY 1, 2
"""


def quantity_cume_dist(sf_dir: str) -> pd.DataFrame:
    """(l_returnflag, qty, n, cume_e9) — CUME_DIST of l_quantity within each
    return flag, stated over the bounded value domain.

    The score-percentile-normalization pattern: per-block partial counts per
    (flag, value) collapse each block to O(|flags| × |domain|) rows, one tiny
    exchange merges them, and the cumulative distribution is a domain-sized
    driver cumsum. ``cume_e9 = cum * 1e9 // tot`` is exact integer arithmetic
    on both sides. At scale the resulting CDF table is broadcast back into a
    map stage to attach a percentile to every row (the quartile query shows
    that half of the pattern); the exchange only ever moves domain-bounded
    partials, never rows."""
    from .shuffle import bucketed_group_apply

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_returnflag", "l_quantity"]
    )

    def part(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "l_returnflag": df["l_returnflag"].astype(str),
                "qty": np.rint(df["l_quantity"].to_numpy(np.float64)).astype(np.int64),
            }
        )
        return out.groupby(["l_returnflag", "qty"], as_index=False).size().rename(
            columns={"size": "n"}
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["l_returnflag", "qty"], as_index=False).agg(n=("n", "sum"))

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return merge(df).astype({"l_returnflag": "string"})

    counts = (
        bucketed_group_apply(ds.map_batches(part, batch_format="pandas"),
                             ["l_returnflag", "qty"], merge, fin)
        .to_pandas()  # |flags| × |domain| rows — domain-bounded by construction
        .sort_values(["l_returnflag", "qty"])
        .reset_index(drop=True)
    )
    cum = counts.groupby("l_returnflag")["n"].cumsum().to_numpy(np.int64)
    tot = counts.groupby("l_returnflag")["n"].transform("sum").to_numpy(np.int64)
    counts["cume_e9"] = np.array(
        [int(c) * 10**9 // int(t) for c, t in zip(cum, tot)], dtype=np.int64
    )
    return counts


def exact_group_quantiles_cont(
    ds: "ray.data.Dataset",
    cents_col: str,
    group_col: str | None,
    qs: list[float],
    n_hist: int = 2048,
) -> pd.DataFrame:
    """Exact ``percentile_cont``-semantics (linearly interpolated) quantiles
    per group over an INTEGER-valued column.

    Same three-pass histogram rank-refinement as
    :func:`exact_group_quantiles`, but each quantile fetches the two bracket
    order statistics at 0-based rank h = (n-1)·q and interpolates
    ``lo + (hi - lo) * frac``. With integer values and q a multiple of 1/4,
    every term is exactly representable in float64, so the result matches
    DuckDB's percentile_cont bit-for-bit. Returns ``p{q*100:g}`` float
    columns."""
    agg = ds.aggregate(Min(cents_col), Max(cents_col))
    lo, hi = float(agg[f"min({cents_col})"]), float(agg[f"max({cents_col})"])
    if not math.isfinite(lo):
        raise ValueError(f"no finite values in {cents_col}")
    width = (hi - lo) or 1.0
    edges_scale = n_hist / width

    def bucket_of(v: np.ndarray) -> np.ndarray:
        return np.clip(((v - lo) * edges_scale).astype(np.int64), 0, n_hist - 1)

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df[group_col] if group_col else pd.Series("", index=df.index)
        out = pd.DataFrame(
            {"g": g.astype(str), "b": bucket_of(df[cents_col].to_numpy(np.float64))}
        )
        return out.groupby(["g", "b"], as_index=False).size().rename(
            columns={"size": "cnt"}
        )

    hist = grouped_aggregate(
        ds.map_batches(hist_partial, batch_format="pandas"),
        ["g", "b"],
        lambda df: df.groupby(["g", "b"], as_index=False).agg(cnt=("cnt", "sum")),
    ).to_pandas()

    # per group and quantile: the two bracket ranks (1-based) + the fraction
    needed: dict[tuple[str, int], list[tuple[float, int, int]]] = {}
    fracs: dict[tuple[str, float], float] = {}
    for g, gh in hist.groupby("g"):
        gh = gh.sort_values("b")
        counts = gh["cnt"].to_numpy(np.int64)
        buckets = gh["b"].to_numpy(np.int64)
        cum = np.concatenate([[0], np.cumsum(counts)])
        n = int(cum[-1])
        for q in qs:
            h = (n - 1) * q  # 0-based fractional rank; exact for q = k/4
            fracs[(g, q)] = h - math.floor(h)
            for side, rank in enumerate(
                (int(math.floor(h)) + 1, int(math.ceil(h)) + 1)
            ):
                i = int(np.searchsorted(cum, rank, side="left")) - 1
                i = max(0, min(i, len(buckets) - 1))
                needed.setdefault((g, int(buckets[i])), []).append(
                    (q, rank - int(cum[i]), side)
                )

    need_keys = set(needed)
    total_cand = int(hist.set_index(["g", "b"]).loc[list(need_keys), "cnt"].sum())
    if total_cand > _CAND_CAP:
        raise ValueError(
            f"candidate set {total_cand} rows exceeds cap {_CAND_CAP}; "
            f"re-run with larger n_hist (distribution is spiked)"
        )
    need_ref = ray.put({f"{g}|{b}" for g, b in need_keys})

    def candidates(df: pd.DataFrame) -> pa.Table:
        keys = ray.get(need_ref)
        g = (df[group_col] if group_col else pd.Series("", index=df.index)).astype(str)
        v = df[cents_col].to_numpy(np.float64)
        b = bucket_of(v)
        mask = (g + "|" + pd.Series(b, index=g.index).astype(str)).isin(keys).to_numpy()
        return pa.table(
            {
                "g": pa.array(g[mask].tolist(), type=pa.string()),
                "b": pa.array(b[mask]),
                "v": pa.array(v[mask]),
            }
        )

    cand = ds.map_batches(candidates, batch_format="pandas").to_pandas()

    bracket: dict[str, dict[float, list[float]]] = {}
    for (g, b), wants in needed.items():
        vals = np.sort(cand[(cand["g"] == g) & (cand["b"] == b)]["v"].to_numpy())
        for q, k, side in wants:
            bracket.setdefault(g, {}).setdefault(q, [0.0, 0.0])[side] = float(
                vals[k - 1]
            )
    rows = {
        g: {
            f"p{q * 100:g}": pair[0] + (pair[1] - pair[0]) * fracs[(g, q)]
            for q, pair in by_q.items()
        }
        for g, by_q in bracket.items()
    }
    out = pd.DataFrame(
        [{**({group_col: g} if group_col else {}), **cols} for g, cols in rows.items()]
    )
    cols_order = ([group_col] if group_col else []) + [f"p{q * 100:g}" for q in qs]
    return out[cols_order].sort_values(cols_order[0]).reset_index(drop=True)


def price_quantiles_cont(sf_dir: str) -> pd.DataFrame:
    """(o_orderstatus, p25_e4, p50_e4, p75_e4) — interpolated
    (``percentile_cont``) quartiles of o_totalprice per order status, in
    exact 1e-4-dollar fixed point.

    Prices are converted to exact integer cents FIRST (so interpolation at
    quarter fractions is exact float64 arithmetic on both sides), then the
    e4 output is cents·100 — a bit-exact integer on the Ray and DuckDB
    sides alike."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderstatus", "o_totalprice"]
    ).map_batches(
        lambda df: pd.DataFrame(
            {
                "o_orderstatus": df["o_orderstatus"].astype(str),
                "cents": np.rint(
                    df["o_totalprice"].to_numpy(np.float64) * 100.0
                ).astype(np.int64),
            }
        ),
        batch_format="pandas",
    )
    q = exact_group_quantiles_cont(ds, "cents", "o_orderstatus", [0.25, 0.5, 0.75])
    out = pd.DataFrame({"o_orderstatus": q["o_orderstatus"]})
    for col, name in (("p25", "p25_e4"), ("p50", "p50_e4"), ("p75", "p75_e4")):
        out[name] = np.rint(q[col].to_numpy(np.float64) * 100.0).astype(np.int64)
    return out


def value_outliers_mad(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """(event_id, cents, dev) — robust (median/MAD) outlier filter: events
    whose |value − median| exceeds ``k`` × MAD (median absolute deviation).

    The robust twin of :func:`value_outliers` — mean/std are dragged by the
    very outliers being hunted; median/MAD are not. Dataflow: the exact
    streaming-quantile operator finds the median of cents, a second
    quantile pass finds the median of |cents − med| (both integer-valued, so
    ``percentile_disc`` parity is exact), then one shuffle-free vectorized
    filter compares integers — no float thresholds to disagree at the
    boundary."""
    path = f"{sf_dir}/events.parquet"

    def cents_map(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"cents": np.rint(df["value"].to_numpy(np.float64) * 100.0).astype(np.int64)}
        )

    cents_ds = ray.data.read_parquet(path, columns=["value"]).map_batches(
        cents_map, batch_format="pandas"
    )
    med = int(exact_group_quantiles(cents_ds, "cents", None, [0.5]).iloc[0]["p50"])

    dev_ds = cents_ds.map_batches(
        lambda df: pd.DataFrame({"dev": np.abs(df["cents"].to_numpy(np.int64) - med)}),
        batch_format="pandas",
    )
    mad = int(exact_group_quantiles(dev_ds, "dev", None, [0.5]).iloc[0]["p50"])
    thr = k * mad

    def pick(df: pd.DataFrame) -> pa.Table:
        cents = np.rint(df["value"].to_numpy(np.float64) * 100.0).astype(np.int64)
        dev = np.abs(cents - med)
        m = dev > thr
        return pa.table(
            {
                "event_id": pa.array(df["event_id"].to_numpy()[m], type=pa.int64()),
                "cents": pa.array(cents[m], type=pa.int64()),
                "dev": pa.array(dev[m], type=pa.int64()),
            }
        )

    out = ray.data.read_parquet(path, columns=["event_id", "value"]).map_batches(
        pick, batch_format="pandas"
    ).to_pandas()  # k·MAD-tail-bound by construction
    if "event_id" not in out.columns:  # all-empty blocks lose schema in Ray
        out = pd.DataFrame({"event_id": pd.Series(dtype=np.int64),
                            "cents": pd.Series(dtype=np.int64),
                            "dev": pd.Series(dtype=np.int64)})
    return out


def event_type_drift(sf_dir: str) -> pd.DataFrame:
    """(event_type, n_first, n_second, ratio_e9) — distribution drift between
    the first and second halves of the events time range.

    The dataset-drift monitor every training-data pipeline runs before
    mixing a new crawl in: one Min/Max pass pins the midpoint, then one
    streaming pass emits per-block (type, half) partial counts —
    O(|types| × 2) rows per block, folded on the driver. ``ratio_e9`` is
    exact integer arithmetic (−1 when the type is absent from the first
    half). Nothing data-sized ever leaves a worker."""
    path = f"{sf_dir}/events.parquet"
    agg = ray.data.read_parquet(path, columns=["ts"]).aggregate(Min("ts"), Max("ts"))
    t_lo = pd.Timestamp(agg["min(ts)"]).value // 1000  # ns → us
    t_hi = pd.Timestamp(agg["max(ts)"]).value // 1000
    mid = (t_lo + t_hi) // 2

    def part(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        first = us <= mid
        out = pd.DataFrame(
            {
                "event_type": df["event_type"].astype(str),
                "n_first": first.astype(np.int64),
                "n_second": (~first).astype(np.int64),
            }
        )
        return out.groupby("event_type", as_index=False).agg(
            n_first=("n_first", "sum"), n_second=("n_second", "sum")
        )

    parts = (
        ray.data.read_parquet(path, columns=["ts", "event_type"])
        .map_batches(part, batch_format="pandas")
        .to_pandas()  # O(blocks × |types|) rows
        .groupby("event_type", as_index=False)
        .agg(n_first=("n_first", "sum"), n_second=("n_second", "sum"))
    )
    parts["ratio_e9"] = np.array(
        [
            int(b) * 10**9 // int(a) if a > 0 else -1
            for a, b in zip(parts["n_first"], parts["n_second"])
        ],
        dtype=np.int64,
    )
    return parts.sort_values("event_type").reset_index(drop=True)


def table_checksum(sf_dir: str, table: str = "orders") -> pd.DataFrame:
    """One row (n_rows, checksum) — order-independent content checksum of the
    orders table: SUM of the 32-bit md5 key of each row's canonical string
    ``orderkey|cents``.

    The migration/replication integrity check: because the fold is a SUM, it
    is insensitive to row order and partitioning, so the same data yields
    the same checksum at any parallelism — and a single changed/dropped row
    changes it. Per-block partial sums are the only thing that leaves a
    worker (one int per block). md5 keeps the hash restatable in SQL; at
    open-web scale the per-row digest dominates compute and a vectorized
    64-bit mix (e.g. the exchange's CRC family) is the drop-in swap."""
    import hashlib

    ds = ray.data.read_parquet(
        f"{sf_dir}/{table}.parquet", columns=["o_orderkey", "o_totalprice"]
    )

    def part(df: pd.DataFrame) -> pd.DataFrame:
        keys = df["o_orderkey"].to_numpy(np.int64)
        cents = np.rint(df["o_totalprice"].to_numpy(np.float64) * 100.0).astype(
            np.int64
        )
        s = sum(
            int.from_bytes(
                hashlib.md5(f"{k}|{c}".encode()).digest()[:4], "big"
            )
            for k, c in zip(keys, cents)
        )
        return pd.DataFrame({"n_rows": [len(df)], "csum": [s]})

    parts = ds.map_batches(part, batch_format="pandas").to_pandas()
    return pd.DataFrame(
        {
            "n_rows": [int(parts["n_rows"].sum())],
            "checksum": [int(parts["csum"].sum())],
        }
    )


def order_quartiles(sf_dir: str) -> pd.DataFrame:
    """(quartile, n_orders, sum_cents) — value-based NTILE: orders bucketed
    by the exact p25/p50/p75 of o_totalprice.

    Composes the exact-quantile operator (three streaming passes, no sort)
    with a broadcast threshold filter — value-based buckets (v ≤ p25 → q1)
    rather than row-position NTILE, so equal values never straddle a
    boundary and the result is deterministic at any parallelism."""
    path = f"{sf_dir}/orders.parquet"
    ds = ray.data.read_parquet(path, columns=["o_totalprice"])
    qdf = exact_group_quantiles(ds, "o_totalprice", None, [0.25, 0.5, 0.75])
    t25, t50, t75 = (float(qdf.iloc[0][c]) for c in ("p25", "p50", "p75"))

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        v = df["o_totalprice"].to_numpy(np.float64)
        q = 1 + (v > t25).astype(np.int64) + (v > t50) + (v > t75)
        out = pd.DataFrame({"quartile": q,
                            "cents": np.rint(v * 100).astype(np.int64)})
        return out.groupby("quartile", as_index=False).agg(
            n_orders=("cents", "size"), sum_cents=("cents", "sum"))

    parts = (
        ray.data.read_parquet(path, columns=["o_totalprice"])
        .map_batches(bucket, batch_format="pandas")
        .to_pandas()  # ≤ 4 rows per block
    )
    return (
        parts.groupby("quartile", as_index=False)
        .agg(n_orders=("n_orders", "sum"), sum_cents=("sum_cents", "sum"))
        .sort_values("quartile")
        .reset_index(drop=True)
    )


_SKEW_SPECS = [
    ("orders", "o_custkey", "orders.o_custkey"),
    ("lineitem", "l_suppkey", "lineitem.l_suppkey"),
    ("lineitem", "l_partkey", "lineitem.l_partkey"),
]


def key_skew_report(sf_dir: str) -> pd.DataFrame:
    """(col, n_rows, n_distinct, top_cnt, skew_e9) — the pre-flight skew
    diagnostic for join/aggregation keys: per key column, the hottest key's
    count and the skew factor top_cnt·n_distinct·1e9 // n_rows (1e9 ⇒
    perfectly uniform; ≫1e9 ⇒ salt this key).

    This is the tool that decides between hash_join and hash_join_salted
    BEFORE a 100 TB job funnels one reduce bucket. Per column: per-block
    partial value counts → one exchange on the value → each bucket emits a
    single (rows, distinct, max) summary row (values are disjoint across
    buckets, so the driver fold of sums/max is exact)."""
    from .shuffle import bucketed_group_apply

    rows = []
    for table, col, label in _SKEW_SPECS:
        ds = ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=[col])

        def part(df: pd.DataFrame, col=col) -> pd.DataFrame:
            return (df.groupby(col, as_index=False).size()
                    .rename(columns={"size": "n"}))

        def fin(df: pd.DataFrame, col=col) -> pd.DataFrame:
            if df.empty:
                return pd.DataFrame({"rows": pd.Series(dtype=np.int64),
                                     "distinct": pd.Series(dtype=np.int64),
                                     "top": pd.Series(dtype=np.int64)})
            g = df.groupby(col, as_index=False).agg(n=("n", "sum"))
            return pd.DataFrame({"rows": [int(g["n"].sum())],
                                 "distinct": [len(g)],
                                 "top": [int(g["n"].max())]})

        s = bucketed_group_apply(ds, [col], part, fin, n_buckets=8).to_pandas()
        n_rows, n_distinct, top = (int(s["rows"].sum()), int(s["distinct"].sum()),
                                   int(s["top"].max()))
        rows.append({"col": label, "n_rows": n_rows, "n_distinct": n_distinct,
                     "top_cnt": top,
                     "skew_e9": top * n_distinct * 10**9 // n_rows})
    return pd.DataFrame(rows).sort_values("col").reset_index(drop=True)


def order_price_rank(sf_dir: str, n_hist: int = 2048) -> "ray.data.Dataset":
    """(o_orderkey, cents, price_rank) — EXACT global RANK() of every order
    by o_totalprice (ties share the min rank), without a global sort.

    The distributed rank-attach pattern: one histogram pass pins per-bucket
    global offsets (value → bucket is order-preserving, so offsets are just
    the cumulative histogram); one exchange co-locates each bucket; each
    reducer sorts only its own bucket and adds its offset. Equal values
    always share a bucket (the bucket is a function of the value), so tie
    groups never straddle reducers and min-rank ties are bucket-local.
    Skewed value ranges only widen one bucket — the loud candidate-cap
    failure mode of the quantile operator applies, never a silent straggler
    at the scale of the whole table."""
    from .shuffle import bucketed_group_apply

    path = f"{sf_dir}/orders.parquet"

    def cents_map(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderkey": df["o_orderkey"].to_numpy(np.int64),
                "cents": np.rint(
                    df["o_totalprice"].to_numpy(np.float64) * 100.0
                ).astype(np.int64),
            }
        )

    ds = ray.data.read_parquet(
        path, columns=["o_orderkey", "o_totalprice"]
    ).map_batches(cents_map, batch_format="pandas")

    agg = ds.aggregate(Min("cents"), Max("cents"))
    lo, hi = int(agg["min(cents)"]), int(agg["max(cents)"])
    width = (hi - lo) or 1
    scale = n_hist / width

    def bucket_of(v: np.ndarray) -> np.ndarray:
        return np.clip(((v - lo) * scale).astype(np.int64), 0, n_hist - 1)

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        b = bucket_of(df["cents"].to_numpy(np.int64))
        c = np.bincount(b, minlength=n_hist)
        nz = np.nonzero(c)[0]
        return pd.DataFrame({"b": nz, "cnt": c[nz]})

    counts = (
        ds.map_batches(hist, batch_format="pandas")
        .to_pandas()  # ≤ n_hist rows per block
        .groupby("b", as_index=False)
        .agg(cnt=("cnt", "sum"))
        .sort_values("b")
    )
    full = np.zeros(n_hist, dtype=np.int64)
    full[counts["b"].to_numpy(np.int64)] = counts["cnt"].to_numpy(np.int64)
    offsets = np.concatenate([[0], np.cumsum(full)[:-1]])  # rows below bucket

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["b"] = bucket_of(df["cents"].to_numpy(np.int64))
        return df

    def rank_bucket(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"o_orderkey": pd.Series(dtype=np.int64),
                              "cents": pd.Series(dtype=np.int64),
                              "price_rank": pd.Series(dtype=np.int64)})
        if df.empty:
            return empty
        out = []
        for b, g in df.groupby("b", sort=False):
            v = g["cents"].to_numpy(np.int64)
            order = np.argsort(v, kind="stable")
            sv = v[order]
            # min rank of each tie group = index of first equal value
            first_idx = np.searchsorted(sv, v, side="left")
            out.append(pd.DataFrame(
                {"o_orderkey": g["o_orderkey"].to_numpy(np.int64),
                 "cents": v,
                 "price_rank": int(offsets[b]) + first_idx + 1}))
        return pd.concat(out, ignore_index=True)

    return bucketed_group_apply(
        ds.map_batches(keyed, batch_format="pandas"), ["b"],
        lambda df: df, rank_bucket,
    )


def customer_balance_zscore(sf_dir: str) -> "ray.data.Dataset":
    """(c_custkey, c_nationkey, z_e6) — per-nation z-score normalization of
    customer account balance (grouped feature scaling): z = (x − μ_g)/σ_g
    expressed entirely in integers as (n·x − S)·10⁶ // isqrt(n·Q − S²),
    with DuckDB's truncate-toward-zero division mirrored for negative z.
    isqrt is exact on both sides (math.isqrt here; FLOOR(SQRT(double)) ± 1
    correction in the oracle), so no float ever enters the comparison.

    Two streaming passes: per-block (n, Σx, Σx², min, max) partials per
    nation (group-domain-bounded, folded with Python ints on the driver),
    then a broadcast vectorized map. Raises loudly if a group's n·10⁶·|n·x−S|
    could exceed int64 (≈8M rows/group at cent scale) — the documented swap
    is object-int partials as in linear_sufficient_stats.

    Degenerate groups (single customer, or all balances equal → σ = 0) emit
    z_e6 = 0 for every member: the numerator n·x − S is identically zero
    there, so the convention is the 0/0 limit, implemented as a denominator
    clamp to 1 and stated identically in the oracle."""
    import math as _math

    path = f"{sf_dir}/customer.parquet"
    ds = ray.data.read_parquet(path, columns=["c_nationkey", "c_acctbal"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        x = np.rint(df["c_acctbal"].to_numpy(np.float64) * 100.0).astype(np.int64)
        g = pd.DataFrame({"nat": df["c_nationkey"].to_numpy().astype(np.int64),
                          "x": x, "xx": x * x, "one": np.int64(1)})
        return g.groupby("nat", as_index=False).agg(
            n=("one", "sum"), s=("x", "sum"), q=("xx", "sum"),
            lo=("x", "min"), hi=("x", "max"))

    parts = (ds.map_batches(part, batch_format="pandas")
             .to_pandas())  # O(blocks × |nations|) — group-domain-bounded
    stats: dict[int, tuple[int, int, int]] = {}
    for nat, g in parts.groupby("nat"):
        n = int(g["n"].sum()); s = int(g["s"].sum()); q = int(g["q"].sum())
        lo, hi = int(g["lo"].min()), int(g["hi"].max())
        big = n * q - s * s
        if big < 0:  # impossible by Cauchy-Schwarz — only int64 overflow
            raise OverflowError(f"variance partials wrapped for group {nat}")
        worst = max(abs(n * lo - s), abs(n * hi - s)) * 10**6
        if worst >= 1 << 62:
            raise OverflowError(
                "group too large for int64 z-score path; use object-int partials")
        # big == 0 → degenerate group: clamp the denominator so every
        # member's 0-numerator lands on z = 0 (docstring convention)
        stats[int(nat)] = (n, s, max(_math.isqrt(big), 1))

    n_map = {k: v[0] for k, v in stats.items()}
    s_map = {k: v[1] for k, v in stats.items()}
    d_map = {k: v[2] for k, v in stats.items()}

    def zmap(df: pd.DataFrame) -> pd.DataFrame:
        nat = df["c_nationkey"].to_numpy().astype(np.int64)
        x = np.rint(df["c_acctbal"].to_numpy(np.float64) * 100.0).astype(np.int64)
        n = pd.Series(nat).map(n_map).to_numpy(np.int64)
        s = pd.Series(nat).map(s_map).to_numpy(np.int64)
        d = pd.Series(nat).map(d_map).to_numpy(np.int64)
        num = (n * x - s) * 10**6
        z = np.sign(num) * (np.abs(num) // d)  # truncate toward zero
        return pd.DataFrame({"c_custkey": df["c_custkey"].to_numpy(np.int64),
                             "c_nationkey": nat,
                             "z_e6": z.astype(np.int64)})

    return ray.data.read_parquet(
        path, columns=["c_custkey", "c_nationkey", "c_acctbal"]
    ).map_batches(zmap, batch_format="pandas")


CUSTOMER_BALANCE_ZSCORE_SQL = """
WITH c AS (SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS nat,
                  CAST(ROUND(c_acctbal * 100) AS BIGINT) AS x FROM customer),
g AS (SELECT nat, COUNT(*) AS n, SUM(x) AS s, SUM(x * x) AS q
      FROM c GROUP BY 1),
g2 AS (SELECT nat, n, s, n * q - s * s AS big FROM g),
g3 AS (SELECT nat, n, s, big,
              CAST(FLOOR(SQRT(CAST(big AS DOUBLE))) AS BIGINT) AS d0 FROM g2),
g4 AS (SELECT nat, n, s,
              -- GREATEST(..., 1): degenerate (zero-variance) groups clamp
              -- the denominator so the all-zero numerators land on z = 0
              GREATEST(CASE WHEN (d0 + 1) * (d0 + 1) <= big THEN d0 + 1
                            WHEN d0 * d0 > big THEN d0 - 1
                            ELSE d0 END, 1) AS d FROM g3)
SELECT c.c_custkey, c.nat AS c_nationkey,
       CAST(((g4.n * c.x - g4.s) * 1000000) // g4.d AS BIGINT) AS z_e6
FROM c JOIN g4 USING (nat)
"""


_FK_RELATIONS: list[tuple[str, str, str, str, str]] = [
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
]


def fk_integrity(sf_dir: str) -> pd.DataFrame:
    """(relation, n_rows, n_keys, orphan_rows, orphan_keys) — referential-
    integrity report over the schema's four FK relations: child rows/keys
    plus how many reference a missing parent.

    Per relation, ONE key-only exchange of a tagged union: child blocks
    shrink to per-block (key, count) partials, parent blocks to distinct
    keys — payloads never move. Each reducer resolves membership locally and
    emits one summary row per bucket; the driver fold is O(relations ×
    buckets). The semi/anti-join shape repurposed as a data-quality
    aggregate."""
    from concurrent.futures import ThreadPoolExecutor

    from .shuffle import bucketed_group_apply

    # dataset handles are created serially here — read_parquet's lazy
    # filesystem-module imports are not thread-safe; the threads below only
    # drive execution of already-constructed plans
    specs = [
        (rel, ckey,
         ray.data.read_parquet(f"{sf_dir}/{ctab}.parquet", columns=[ckey]),
         pkey,
         ray.data.read_parquet(f"{sf_dir}/{ptab}.parquet", columns=[pkey]))
        for rel, ctab, ckey, ptab, pkey in _FK_RELATIONS
    ]

    def one_relation(spec):
        rel, ckey, child, pkey, parent = spec

        def cpart(df: pd.DataFrame, ckey=ckey) -> pd.DataFrame:
            g = (df.groupby(ckey, as_index=False).size()
                 .rename(columns={ckey: "k", "size": "cnt"}))
            g["side"] = np.int64(0)
            return g.astype({"k": np.int64, "cnt": np.int64})

        def ppart(df: pd.DataFrame, pkey=pkey) -> pd.DataFrame:
            out = pd.DataFrame({"k": df[pkey].drop_duplicates().to_numpy(np.int64)})
            out["cnt"] = np.int64(0)
            out["side"] = np.int64(1)
            return out

        u = (child.map_batches(cpart, batch_format="pandas")
             .union(parent.map_batches(ppart, batch_format="pandas")))

        def fin(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                return pd.DataFrame({"n_rows": [0], "n_keys": [0],
                                     "orphan_rows": [0], "orphan_keys": [0]},
                                    dtype=np.int64)
            g = df.groupby("k").agg(cnt=("cnt", "sum"), par=("side", "max"))
            is_child = g["cnt"] > 0
            orphan = is_child & (g["par"] == 0)
            return pd.DataFrame(
                {
                    "n_rows": [int(g["cnt"].sum())],
                    "n_keys": [int(is_child.sum())],
                    "orphan_rows": [int(g.loc[orphan, "cnt"].sum())],
                    "orphan_keys": [int(orphan.sum())],
                },
                dtype=np.int64,
            )

        part_rows = bucketed_group_apply(u, ["k"], lambda df: df, fin).to_pandas()
        s = part_rows.sum()
        return (rel, int(s["n_rows"]), int(s["n_keys"]),
                int(s["orphan_rows"]), int(s["orphan_keys"]))

    # the four key-only exchanges are independent — overlap them (threads
    # only drive scheduling; the work runs in Ray tasks)
    with ThreadPoolExecutor(len(_FK_RELATIONS)) as ex:
        rows = list(ex.map(one_relation, specs))
    out = pd.DataFrame(rows, columns=["relation", "n_rows", "n_keys",
                                      "orphan_rows", "orphan_keys"])
    for c in out.columns[1:]:
        out[c] = out[c].astype(np.int64)
    return out


FK_INTEGRITY_SQL = """
SELECT 'lineitem.l_orderkey->orders' AS relation,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_keys,
       CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS orphan_rows,
       CAST(COUNT(DISTINCT CASE WHEN o.o_orderkey IS NULL THEN l_orderkey END)
            AS BIGINT) AS orphan_keys
FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
UNION ALL
SELECT 'lineitem.l_partkey->part',
       CAST(COUNT(*) AS BIGINT), CAST(COUNT(DISTINCT l_partkey) AS BIGINT),
       CAST(SUM(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(COUNT(DISTINCT CASE WHEN p.p_partkey IS NULL THEN l_partkey END)
            AS BIGINT)
FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
UNION ALL
SELECT 'lineitem.l_suppkey->supplier',
       CAST(COUNT(*) AS BIGINT), CAST(COUNT(DISTINCT l_suppkey) AS BIGINT),
       CAST(SUM(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(COUNT(DISTINCT CASE WHEN s.s_suppkey IS NULL THEN l_suppkey END)
            AS BIGINT)
FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
UNION ALL
SELECT 'orders.o_custkey->customer',
       CAST(COUNT(*) AS BIGINT), CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
       CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(COUNT(DISTINCT CASE WHEN c.c_custkey IS NULL THEN o_custkey END)
            AS BIGINT)
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
"""


def daily_type_corr(sf_dir: str, type_x: str = "click",
                    type_y: str = "purchase") -> pd.DataFrame:
    """One row (n_days, corr_e9) — Pearson correlation of two event-type
    daily time series (``type_x`` vs ``type_y`` counts per day, zero-filled
    over every day with any event): the cross-signal monitoring query of an
    event pipeline.

    Day-domain-bounded throughout: per-block partials collapse to O(|days|)
    rows (counts for the two types per day), the combine is calendar-sized,
    and the six sufficient sums fold with Python ints; the corr is the same
    identical-double expression both engines evaluate (the
    price_qty_regression recipe)."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type"])
    day_us = 86_400_000_000

    def part(df: pd.DataFrame) -> pd.DataFrame:
        d = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64) // day_us
        et = df["event_type"].to_numpy()
        out = pd.DataFrame({"d": d,
                            "x": (et == type_x).astype(np.int64),
                            "y": (et == type_y).astype(np.int64)})
        return out.groupby("d", as_index=False).agg(x=("x", "sum"),
                                                    y=("y", "sum"))

    days = (ds.map_batches(part, batch_format="pandas")
            .to_pandas()  # O(blocks × |days|)
            .groupby("d", as_index=False).agg(x=("x", "sum"), y=("y", "sum")))
    n = len(days)
    xs = [int(v) for v in days["x"]]
    ys = [int(v) for v in days["y"]]
    sx, sy = sum(xs), sum(ys)
    sxx = sum(v * v for v in xs)
    syy = sum(v * v for v in ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    num = float(n * sxy - sx * sy)
    den_x = float(n * sxx - sx * sx)
    den_y = float(n * syy - sy * sy)
    return pd.DataFrame({"n_days": [np.int64(n)],
                         "corr_e9": [np.int64(_round_e9(
                             num / math.sqrt(den_x * den_y)))]})


DAILY_TYPE_CORR_SQL = """
WITH c AS (SELECT epoch_us(ts) // 86400000000 AS d,
                  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                       AS HUGEINT) AS x,
                  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS HUGEINT) AS y
           FROM events GROUP BY 1),
s AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x*x) AS sxx, SUM(y*y) AS syy, SUM(x*y) AS sxy FROM c),
t AS (SELECT CAST(n AS BIGINT) AS n_days,
             CAST(n*sxy - sx*sy AS DOUBLE) AS num,
             CAST(n*sxx - sx*sx AS DOUBLE) AS den_x,
             CAST(n*syy - sy*sy AS DOUBLE) AS den_y FROM s)
SELECT n_days,
       CAST(ROUND(num / sqrt(den_x * den_y) * 1000000000) AS BIGINT) AS corr_e9
FROM t
"""


def hourly_anomalies(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """(event_type, h, cnt) — temporal anomaly detection: hours whose event
    count deviates more than ``k`` population standard deviations from that
    type's hourly mean (over observed hours). The |z| > k test is evaluated
    ENTIRELY in integers — (n·c − S)² > k²·(n·Q − S²) — so no sqrt, no
    float, bit-exact oracle parity by construction.

    One exchange on event_type of per-block (type, hour) partial counts;
    each reducer holds a type's calendar-bounded hour table, folds the
    sufficient sums with Python ints (HUGEINT-parity at any magnitude) and
    emits only the flagged rows."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "ts"])
    hour_us = 3_600_000_000
    k2 = k * k

    def part(df: pd.DataFrame) -> pd.DataFrame:
        h = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64) // hour_us
        out = pd.DataFrame({"event_type": df["event_type"], "h": h,
                            "cnt": np.int64(1)})
        return out.groupby(["event_type", "h"], as_index=False).agg(
            cnt=("cnt", "sum"))

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        if not df.empty:
            g = df.groupby(["event_type", "h"], as_index=False).agg(
                cnt=("cnt", "sum"))
            for et, t in g.groupby("event_type"):
                cs = [int(v) for v in t["cnt"]]
                n, s = len(cs), sum(cs)
                q = sum(c * c for c in cs)
                d = n * q - s * s
                for h, c in zip(t["h"], cs):
                    num = n * c - s
                    if num * num > k2 * d:
                        rows.append((et, int(h), c))
        return pd.DataFrame(rows, columns=["event_type", "h", "cnt"]).astype(
            {"h": np.int64, "cnt": np.int64}) if rows else pd.DataFrame(
            {"event_type": pd.Series(dtype="string"),
             "h": pd.Series(dtype=np.int64),
             "cnt": pd.Series(dtype=np.int64)})

    from .shuffle import bucketed_group_apply

    out = bucketed_group_apply(ds, ["event_type"], part, fin,
                               n_buckets=4).to_pandas()
    return out.sort_values(["event_type", "h"]).reset_index(drop=True)


HOURLY_ANOMALIES_SQL = """
WITH c AS (SELECT event_type, epoch_us(ts) // 3600000000 AS h,
                  CAST(COUNT(*) AS HUGEINT) AS cnt
           FROM events GROUP BY 1, 2),
s AS (SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(cnt) AS sm, SUM(cnt * cnt) AS q
      FROM c GROUP BY 1)
SELECT c.event_type, CAST(c.h AS BIGINT) AS h, CAST(c.cnt AS BIGINT) AS cnt
FROM c JOIN s USING (event_type)
WHERE (s.n * c.cnt - s.sm) * (s.n * c.cnt - s.sm)
      > 9 * (s.n * s.q - s.sm * s.sm)
"""

# ---------------------------------------------------------------------------
# Skyline (Pareto frontier) — dominance query
# ---------------------------------------------------------------------------

_SKYLINE_CAP = 2_000_000  # local-skyline union rows before final selection


def _skyline_2d(df: pd.DataFrame) -> pd.DataFrame:
    """Rows not dominated under (maximize ``p``, maximize ``d``).

    A row survives iff its ``d`` equals its price group's max AND strictly
    exceeds every strictly-higher price group's max; ties on (p, d) all
    survive (neither dominates the other). Vectorized: per-price max, then a
    shifted running max down the price-descending order."""
    if not len(df):
        return df
    gmax = df.groupby("p")["d"].max().sort_index(ascending=False)
    run = gmax.cummax().shift(1)  # best d among strictly higher prices
    keep_price = gmax.index[(run.isna() | (gmax > run)).to_numpy()]
    kp = df["p"].isin(set(keep_price))
    kd = df["d"].to_numpy() == df["p"].map(gmax).to_numpy()
    return df[kp & kd]


def skyline_orders(sf_dir: str) -> pd.DataFrame:
    """(o_orderkey, o_totalprice, o_orderdate) — the Pareto frontier of
    orders maximizing both price and recency: no other order is ≥ on both
    axes and > on one.

    Distributed dominance pruning: every global skyline point is a skyline
    point of its own block, so a per-block vectorized skyline shrinks each
    block to its frontier (typically O(log n) rows for non-degenerate data)
    and only that union — capped loudly — reaches the final single-task
    selection. No all-to-all exchange; one streamed pass. Reference parity
    note: no counterpart — brief-mandated analytics family (multi-criteria
    top-k / dominance pruning)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_totalprice", "o_orderdate"],
    )

    def local(df: pd.DataFrame) -> pd.DataFrame:
        df = df.rename(columns={"o_totalprice": "p", "o_orderdate": "d"})
        return _skyline_2d(df)

    cand = ds.map_batches(local, batch_format="pandas").to_pandas()
    if len(cand) > _SKYLINE_CAP:
        raise ValueError(
            f"local-skyline union {len(cand)} rows exceeds cap {_SKYLINE_CAP};"
            " data is anti-correlated on the two axes — use a grid-partition"
            " skyline instead"
        )
    out = _skyline_2d(cand).rename(columns={"p": "o_totalprice",
                                            "d": "o_orderdate"})
    out = out[["o_orderkey", "o_totalprice", "o_orderdate"]]
    return out.sort_values("o_orderkey").reset_index(drop=True)


SKYLINE_ORDERS_SQL = """
WITH pts AS (SELECT o_orderkey, o_totalprice, o_orderdate FROM orders),
grp AS (SELECT o_totalprice, MAX(o_orderdate) AS dmax
        FROM pts GROUP BY o_totalprice),
run AS (SELECT o_totalprice, dmax,
               MAX(dmax) OVER (ORDER BY o_totalprice DESC
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) AS better_d
        FROM grp)
SELECT pts.o_orderkey, pts.o_totalprice, pts.o_orderdate
FROM pts JOIN run USING (o_totalprice)
WHERE pts.o_orderdate = run.dmax
  AND (run.better_d IS NULL OR run.dmax > run.better_d)
"""


def benford_totalprice(sf_dir: str) -> pd.DataFrame:
    """(digit, cnt, share_e9) — leading-digit distribution of the integer
    part of o_totalprice (Benford data-quality screen). One streamed pass of
    integer digit extraction + a 9-row partial-count reduce; the share is an
    integer floor division so both sides are exact."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_totalprice"]
    )

    def part(df: pd.DataFrame) -> pd.DataFrame:
        v = np.floor(df["o_totalprice"].to_numpy(np.float64)).astype(np.int64)
        v = v[v > 0]
        # strip trailing decimal digits until one remains
        while True:
            big = v >= 10
            if not big.any():
                break
            v = np.where(big, v // 10, v)
        digit, cnt = np.unique(v, return_counts=True)
        return pd.DataFrame({"digit": digit.astype(np.int64),
                             "cnt": cnt.astype(np.int64)})

    counts = (
        ds.map_batches(part, batch_format="pandas")
        .to_pandas()
        .groupby("digit", as_index=False)
        .agg(cnt=("cnt", "sum"))
    )
    total = int(counts["cnt"].sum())
    counts["share_e9"] = (counts["cnt"] * 1_000_000_000 // total).astype(np.int64)
    return counts.sort_values("digit").reset_index(drop=True)


BENFORD_TOTALPRICE_SQL = """
WITH d AS (SELECT CAST(SUBSTR(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
                              AS VARCHAR), 1, 1) AS BIGINT) AS digit
           FROM orders WHERE o_totalprice >= 1),
c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS cnt FROM d GROUP BY digit)
SELECT digit, cnt,
       CAST(cnt * 1000000000 // (SELECT SUM(cnt) FROM c) AS BIGINT) AS share_e9
FROM c
"""


def _exact_medians_multi(ds: "ray.data.Dataset", cols: tuple,
                         n_hist: int = 2048) -> list[int]:
    """Exact percentile_disc(0.5) of several int64 columns in THREE streamed
    passes total (one fused Min/Max aggregate, one fused histogram pass, one
    fused candidate pass) — the multi-column fusion of
    :func:`exact_group_quantiles`'s rank-refinement recipe, used where
    calling it per column would re-scan the input 3× per column. Each column
    gets its OWN histogram range (a shared range would collapse
    differently-scaled metrics into one bucket and blow the candidate cap);
    the bucket math mirrors exact_group_quantiles exactly."""
    aggs = []
    for c in cols:
        aggs += [Min(c), Max(c)]
    a = ds.aggregate(*aggs)
    lo = {c: float(a[f"min({c})"]) for c in cols}
    scale = {c: n_hist / ((float(a[f"max({c})"]) - lo[c]) or 1.0)
             for c in cols}

    def bucket_of(c: str, v: np.ndarray) -> np.ndarray:
        return np.clip(((v - lo[c]) * scale[c]).astype(np.int64),
                       0, n_hist - 1)

    def hist(t: pa.Table) -> pd.DataFrame:
        out = []
        for c in cols:
            b = bucket_of(c, t[c].to_numpy(zero_copy_only=False)
                          .astype(np.float64))
            cnt = np.bincount(b, minlength=n_hist)
            nz = np.nonzero(cnt)[0]
            out.append(pd.DataFrame({"col": c, "b": nz,
                                     "cnt": cnt[nz].astype(np.int64)}))
        return pd.concat(out, ignore_index=True)

    folded = (ds.map_batches(hist, batch_format="pyarrow",
                             zero_copy_batch=True)
              .to_pandas()  # ≤ |cols|·n_hist rows per block — bounded
              .groupby(["col", "b"], as_index=False).agg(cnt=("cnt", "sum")))

    need: dict[str, tuple[int, int]] = {}  # col -> (median bucket, k within)
    for c in cols:
        gh = folded[folded["col"] == c].sort_values("b")
        counts = gh["cnt"].to_numpy(np.int64)
        buckets = gh["b"].to_numpy(np.int64)
        cum = np.concatenate([[0], np.cumsum(counts)])
        rank = max(1, math.ceil(0.5 * int(cum[-1])))  # percentile_disc rank
        i = max(0, min(int(np.searchsorted(cum, rank, side="left")) - 1,
                       len(buckets) - 1))
        need[c] = (int(buckets[i]), rank - int(cum[i]))
    need_ref = ray.put({c: b for c, (b, _k) in need.items()})

    def cand(t: pa.Table) -> pd.DataFrame:
        wanted = ray.get(need_ref)
        out = []
        for c in cols:
            v = t[c].to_numpy(zero_copy_only=False).astype(np.float64)
            keep = bucket_of(c, v) == wanted[c]
            out.append(pd.DataFrame({"col": c, "v": v[keep]}))
        return pd.concat(out, ignore_index=True)

    cands = ds.map_batches(cand, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    meds = []
    for c in cols:
        vals = np.sort(cands[cands["col"] == c]["v"].to_numpy())
        meds.append(int(vals[need[c][1] - 1]))
    return meds


def rfm_segments(sf_dir: str) -> pd.DataFrame:
    """(segment, n_customers) — classic RFM segmentation: each customer's
    recency (last order date), frequency (order count) and monetary (total
    cents) are compared to the corpus medians, yielding a 3-bit segment code
    (R=4, F=2, M=1 when at/above the median). The marketing-analytics
    workload shape: big-table grouped aggregate → tiny exact order
    statistics → broadcast thresholds → bounded histogram.

    Per-customer partials are associative (max, count-sum, cents-sum), so
    blocks pre-combine before the ONE custkey exchange; the per-customer
    Dataset stays in the object store (never pulled to the driver — it is
    customer-bound, i.e. grows with the corpus). The three medians come from
    :func:`_exact_medians_multi` (the exact_group_quantiles histogram
    rank-refinement fused across all three metrics: 3 streamed passes total,
    driver folds bounded by 3·n_hist) and mirror DuckDB percentile_disc
    exactly (sorted index ceil(n/2)-1); the segmentation itself is a
    broadcast-threshold map_batches whose partials are 8-row bincounts.
    Output is ≤8 rows."""
    from .shuffle import grouped_aggregate

    def part(df: pd.DataFrame) -> pd.DataFrame:
        # serves as partial AND final combine (associative): raw order rows
        # on the first call, already-partial (last_d, f, m) rows after.
        # last_d is carried as int64 epoch-micros (max-compatible, and
        # exactly representable in the quantile histogram's float64 space —
        # date micros ≈ 1.7e15 < 2^53)
        if "o_orderdate" in df.columns:
            df = pd.DataFrame({
                "o_custkey": df["o_custkey"].to_numpy(np.int64),
                "last_d": df["o_orderdate"].to_numpy("datetime64[us]")
                .astype(np.int64),
                "f": np.ones(len(df), dtype=np.int64),
                "m": np.rint(df["o_totalprice"].to_numpy(np.float64)
                             * 100.0).astype(np.int64),
            })
        else:
            df = df[["o_custkey", "last_d", "f", "m"]]
        return (df.groupby("o_custkey", as_index=False)
                .agg(last_d=("last_d", "max"), f=("f", "sum"),
                     m=("m", "sum")))

    per_cust = grouped_aggregate(
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey", "o_orderdate", "o_totalprice"]),
        ["o_custkey"], part, n_buckets=16,
    ).materialize()  # distributed — reused by the median + seg passes

    rd, fd, md = _exact_medians_multi(per_cust, ("last_d", "f", "m"))

    def seg_partial(t: pa.Table) -> pa.Table:
        seg = (
            (t["last_d"].to_numpy(zero_copy_only=False).astype(np.int64)
             >= rd).astype(np.int64) * 4
            + (t["f"].to_numpy(zero_copy_only=False) >= fd).astype(np.int64) * 2
            + (t["m"].to_numpy(zero_copy_only=False) >= md).astype(np.int64)
        )
        cnt = np.bincount(seg, minlength=8).astype(np.int64)
        return pa.table({"segment": np.arange(8, dtype=np.int64),
                         "n_customers": cnt})

    # 8 rows per block cross to the driver — segment-bounded, not
    # customer-bound
    folded = (per_cust.map_batches(seg_partial, batch_format="pyarrow",
                                   zero_copy_batch=True)
              .to_pandas()
              .groupby("segment", as_index=False)["n_customers"].sum())
    folded = folded[folded["n_customers"] > 0]
    return pd.DataFrame({
        "segment": folded["segment"].to_numpy(np.int64),
        "n_customers": folded["n_customers"].to_numpy(np.int64),
    }).reset_index(drop=True)


RFM_SEGMENTS_SQL = """
WITH c AS (SELECT o_custkey, MAX(o_orderdate) AS last_d,
                  CAST(COUNT(*) AS BIGINT) AS f,
                  SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS m
           FROM orders GROUP BY 1),
t AS (SELECT percentile_disc(0.5) WITHIN GROUP (ORDER BY last_d) AS rd,
             percentile_disc(0.5) WITHIN GROUP (ORDER BY f) AS fd,
             percentile_disc(0.5) WITHIN GROUP (ORDER BY m) AS md
      FROM c)
SELECT CAST((CASE WHEN last_d >= (SELECT rd FROM t) THEN 4 ELSE 0 END)
          + (CASE WHEN f >= (SELECT fd FROM t) THEN 2 ELSE 0 END)
          + (CASE WHEN m >= (SELECT md FROM t) THEN 1 ELSE 0 END)
        AS BIGINT) AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM c GROUP BY 1
"""


def clv_by_cohort(sf_dir: str) -> pd.DataFrame:
    """(cohort_year, n_customers, total_cents, avg_cents) — customer
    lifetime value grouped by acquisition cohort (the year of the
    customer's FIRST order): how much revenue each signup generation has
    produced, and per-customer average as an exact integer floor-division.

    Associative per-customer partials (min year, cents sum) combine inside
    blocks before ONE custkey exchange; the cohort rollup is a SECOND
    grouped_aggregate keyed by year — its partials collapse each block to
    |years| rows before the exchange, so the customer-bound table never
    reaches the driver and only a |years|-bounded result is pulled."""
    from .shuffle import grouped_aggregate

    def part(df: pd.DataFrame) -> pd.DataFrame:
        if "o_orderdate" in df.columns:
            df = pd.DataFrame({
                "o_custkey": df["o_custkey"].to_numpy(np.int64),
                "y": df["o_orderdate"].to_numpy("datetime64[Y]")
                .astype(np.int64) + 1970,
                "cents": np.rint(df["o_totalprice"].to_numpy(np.float64)
                                 * 100.0).astype(np.int64),
            })
        else:
            df = df[["o_custkey", "y", "cents"]]
        return (df.groupby("o_custkey", as_index=False)
                .agg(y=("y", "min"), cents=("cents", "sum")))

    per_cust = grouped_aggregate(
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey", "o_orderdate", "o_totalprice"]),
        ["o_custkey"], part, n_buckets=16,
    )

    def cohort(df: pd.DataFrame) -> pd.DataFrame:
        # partial AND final combine: per-customer rows on the first call
        # (discriminated by o_custkey), |years|-row partials after
        if "o_custkey" in df.columns:
            df = pd.DataFrame({
                "y": df["y"].to_numpy(np.int64),
                "n_customers": np.ones(len(df), dtype=np.int64),
                "total_cents": df["cents"].to_numpy(np.int64),
            })
        else:
            df = df[["y", "n_customers", "total_cents"]]
        return (df.groupby("y", as_index=False)
                .agg(n_customers=("n_customers", "sum"),
                     total_cents=("total_cents", "sum")))

    g = grouped_aggregate(per_cust, ["y"], cohort,
                          n_buckets=4).to_pandas()  # |years|-bounded
    return pd.DataFrame({
        "cohort_year": g["y"].to_numpy(np.int64),
        "n_customers": g["n_customers"].to_numpy(np.int64),
        "total_cents": g["total_cents"].to_numpy(np.int64),
        "avg_cents": (g["total_cents"].to_numpy(np.int64)
                      // g["n_customers"].to_numpy(np.int64)),
    }).sort_values("cohort_year").reset_index(drop=True)


CLV_BY_COHORT_SQL = """
WITH c AS (SELECT o_custkey,
             MIN(CAST(year(o_orderdate) AS BIGINT)) AS y,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
           FROM orders GROUP BY 1)
SELECT y AS cohort_year, CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(cents) AS BIGINT) AS total_cents,
       CAST(SUM(cents) // COUNT(*) AS BIGINT) AS avg_cents
FROM c GROUP BY y ORDER BY y
"""


def nation_supplier_hhi(sf_dir: str) -> pd.DataFrame:
    """(n_name, n_suppliers, hhi_e8) — supplier revenue concentration per
    nation as a Herfindahl–Hirschman index over exact integer basis-point
    shares (share_e4 = supplier_cents·10⁴ // nation_cents; HHI = Σ share²,
    ≤ 10⁸). The market-concentration screen: a nation whose supply revenue
    sits with few suppliers is a fragility/skew flag — the same shape as a
    hot-key diagnostic over any partitioning column.

    Lineitem collapses to per-supplier cent partials inside each scan block
    before ONE suppkey exchange; the per-supplier Dataset stays distributed
    (never pulled to the driver — it grows with the catalog·corpus). The
    supplier→nation map broadcasts (catalog-bound, ray.put once), a first
    bounded pass folds |nations| revenue totals on the driver, the totals
    broadcast back, and a second pass emits per-nation (count, Σshare²)
    partials — every driver fold is |nations|-bounded. Floor-division
    shares are mirrored exactly in SQL."""
    import pyarrow.parquet as pq
    from .shuffle import grouped_aggregate

    def part(df: pd.DataFrame) -> pd.DataFrame:
        if "l_extendedprice" in df.columns:
            df = pd.DataFrame({
                "l_suppkey": df["l_suppkey"].to_numpy(np.int64),
                "cents": np.rint(df["l_extendedprice"]
                                 .to_numpy(np.float64) * 100.0)
                .astype(np.int64),
            })
        else:
            df = df[["l_suppkey", "cents"]]
        return df.groupby("l_suppkey", as_index=False).agg(
            cents=("cents", "sum"))

    per_supp = grouped_aggregate(
        ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                              columns=["l_suppkey", "l_extendedprice"]),
        ["l_suppkey"], part, n_buckets=16,
    ).materialize()  # distributed — reused by the two bounded passes below

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"]).to_pandas()
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"]).to_pandas()
    nname_of = dict(zip(nat["n_nationkey"].to_numpy(np.int64),
                        nat["n_name"].astype(str)))
    supp_nation_ref = ray.put({
        int(k): nname_of[int(v)]
        for k, v in zip(supp["s_suppkey"].to_numpy(np.int64),
                        supp["s_nationkey"].to_numpy(np.int64))
        if int(v) in nname_of
    })

    def attach_nation(t: pa.Table) -> pd.DataFrame:
        sn = ray.get(supp_nation_ref)
        names = pd.Series(t["l_suppkey"].to_numpy(zero_copy_only=False)).map(sn)
        keep = names.notna().to_numpy()
        return pd.DataFrame({
            "n_name": names.to_numpy(dtype=object)[keep],
            "cents": t["cents"].to_numpy(zero_copy_only=False)[keep],
        })

    def nation_tot(t: pa.Table) -> pd.DataFrame:
        return (attach_nation(t).groupby("n_name", as_index=False)
                .agg(cents=("cents", "sum")))

    tot_by_nation = (per_supp.map_batches(nation_tot, batch_format="pyarrow",
                                          zero_copy_batch=True)
                     .to_pandas()  # |nations| rows per block — bounded
                     .groupby("n_name")["cents"].sum().to_dict())

    def hhi_partial(t: pa.Table) -> pd.DataFrame:
        df = attach_nation(t)
        tot = df["n_name"].map(tot_by_nation).to_numpy(np.int64)
        share_e4 = df["cents"].to_numpy(np.int64) * 10000 // tot
        df = df.assign(sq=share_e4 * share_e4, one=np.int64(1))
        return (df.groupby("n_name", as_index=False)
                .agg(n_suppliers=("one", "sum"), hhi_e8=("sq", "sum")))

    g = (per_supp.map_batches(hhi_partial, batch_format="pyarrow",
                              zero_copy_batch=True)
         .to_pandas()  # |nations| rows per block — bounded
         .groupby("n_name", as_index=False)
         .agg(n_suppliers=("n_suppliers", "sum"), hhi_e8=("hhi_e8", "sum")))
    return (pd.DataFrame({"n_name": g["n_name"].astype(str),
                          "n_suppliers": g["n_suppliers"]
                          .to_numpy(np.int64),
                          "hhi_e8": g["hhi_e8"].to_numpy(np.int64)})
            .sort_values("n_name").reset_index(drop=True))


NATION_SUPPLIER_HHI_SQL = """
WITH s AS (SELECT l_suppkey,
             SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS cents
           FROM lineitem GROUP BY 1),
j AS (SELECT n_name, cents,
        SUM(cents) OVER (PARTITION BY n_name) AS tot
      FROM s JOIN supplier ON l_suppkey = s_suppkey
             JOIN nation ON s_nationkey = n_nationkey),
sh AS (SELECT n_name, cents * 10000 // tot AS share_e4 FROM j)
SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       CAST(SUM(share_e4 * share_e4) AS BIGINT) AS hhi_e8
FROM sh GROUP BY n_name ORDER BY n_name
"""


# ---------------------------------------------------------------------------
# Mergeable fixed-bin quantile sketch (bounded-error, bloom/CMS doctrine)
# ---------------------------------------------------------------------------

_QSK_BINS = 256
_QSK_PCTS = (1, 5, 25, 50, 75, 95, 99)


def price_quantile_sketch(sf_dir: str) -> pd.DataFrame:
    """(pct, est_cents, bin_w_cents) — quantiles of o_totalprice from a
    fixed-width histogram sketch: per-block partials are FIXED {bins}-bin
    int64 count vectors (mergeable by addition — the quantile member of the
    sketch suite next to HLL/Misra-Gries/CMS/Bloom), folded on the driver;
    the estimate for percentile p is the upper edge of the first bin whose
    cumulative count reaches ``ceil(p·n/100)``, so the error is bounded by
    one bin width (pinned vs the exact quantiles in pytest; the bound itself
    is emitted as ``bin_w_cents``).

    All arithmetic is integer-exact over cents (bin width ``(max−min)//B
    + 1``, index ``(v−min)//w``), so the DuckDB oracle rebuilds the
    identical histogram and the estimates are value-hash gated — the same
    doctrine that gates the Bloom bitmap and the CMS matrix. Two streamed
    passes (min/max, then histogram); contrast `price_quantiles`, the exact
    three-pass rank-refinement path.

    Reference parity note: no counterpart in the reference — brief-mandated
    sketch family (mergeable quantile summary under fixed memory).""".format(
        bins=_QSK_BINS)
    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_totalprice"])

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "c": np.rint(df["o_totalprice"].to_numpy(np.float64) * 100)
                 .astype(np.int64)})

    cds = ds.map_batches(cents, batch_format="pandas")
    mm = cds.aggregate(Min("c"), Max("c"))
    lo, hi = int(mm["min(c)"]), int(mm["max(c)"])
    w = (hi - lo) // _QSK_BINS + 1  # covers hi: (hi-lo)//w < B

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        idx = (df["c"].to_numpy(np.int64) - lo) // w
        counts = np.bincount(idx, minlength=_QSK_BINS).astype(np.int64)
        return pd.DataFrame({"h": [counts.tobytes()],
                             "n": [np.int64(len(df))]})

    parts = cds.map_batches(hist, batch_format="pandas").to_pandas()
    h = np.zeros(_QSK_BINS, dtype=np.int64)
    for b in parts["h"]:
        h += np.frombuffer(b, dtype=np.int64)
    n = int(parts["n"].sum())
    cum = np.cumsum(h)
    out = []
    for p in _QSK_PCTS:
        target = -(-p * n // 100)  # ceil(p·n/100)
        b = int(np.searchsorted(cum, target))
        out.append((p, lo + (b + 1) * w))
    return pd.DataFrame(out, columns=["pct", "est_cents"]).assign(
        bin_w_cents=np.int64(w)).astype(
        {"pct": np.int64, "est_cents": np.int64, "bin_w_cents": np.int64})


def price_quantile_sketch_sql() -> str:
    pcts = ", ".join(f"({p})" for p in _QSK_PCTS)
    return f"""
WITH c AS (SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c FROM orders),
g AS (SELECT MIN(c) AS lo, MAX(c) AS hi, COUNT(*) AS n FROM c),
w AS (SELECT lo, n, (hi - lo) // {_QSK_BINS} + 1 AS w FROM g),
hist AS (SELECT (c.c - w.lo) // w.w AS b, COUNT(*) AS cnt
         FROM c, w GROUP BY 1),
cum AS (SELECT b, SUM(cnt) OVER (ORDER BY b) AS cum FROM hist),
pcts(pct) AS (VALUES {pcts})
SELECT CAST(p.pct AS BIGINT) AS pct,
       CAST(w.lo + (MIN(cum.b) + 1) * w.w AS BIGINT) AS est_cents,
       CAST(w.w AS BIGINT) AS bin_w_cents
FROM pcts p, w, cum
WHERE cum.cum >= CAST(CEIL(p.pct * w.n / 100.0) AS BIGINT)
GROUP BY p.pct, w.lo, w.w
ORDER BY pct
"""


# ---------------------------------------------------------------------------
# Distribution drift (PSI) and robust (trimmed) group statistics
# ---------------------------------------------------------------------------

_PSI_BINS = 20
_PSI_SPLIT = "1998-01-01"


def psi_drift(sf_dir: str, n_bins: int = _PSI_BINS) -> pd.DataFrame:
    """(bin, cnt_a, cnt_b, psi_term_e9) — per-bucket Population Stability
    Index terms of the order-price distribution between two time periods
    (orders before vs from ``1998-01-01``): the standard drift monitor a
    training-data pipeline runs between ingestion snapshots.

    Plan: one streamed min/max pass fixes the global fixed-width binning
    (exactly the ``price_quantile_sketch`` recipe), then one streamed pass
    emits per-block (bin, period) counts — O(n_bins·2) rows per block, folded
    on the driver (bin-domain-bounded, ≤ 2·n_bins rows total). Each PSI term
    ``(p_a − p_b)·ln(p_a/p_b)`` is a single identical-double expression over
    exact integer counts (the ``daily_type_corr`` float recipe), emitted
    per-bin so no float summation-order issue exists; bins where either side
    is empty emit 0 (smoothing-free convention, stated in the oracle too).

    Reference parity note: no counterpart in the reference — brief-mandated
    dataset-drift family.
    """
    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_totalprice", "o_orderdate"])
    split_us = np.datetime64(_PSI_SPLIT, "us").astype(np.int64)

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "c": np.rint(df["o_totalprice"].to_numpy(np.float64) * 100)
                 .astype(np.int64),
            "p": (df["o_orderdate"].to_numpy().astype("datetime64[us]")
                  .astype(np.int64) >= split_us).astype(np.int64)})

    cds = ds.map_batches(cents, batch_format="pandas")
    mm = cds.aggregate(Min("c"), Max("c"))
    lo, hi = int(mm["min(c)"]), int(mm["max(c)"])
    w = (hi - lo) // n_bins + 1

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        idx = (df["c"].to_numpy(np.int64) - lo) // w
        p = df["p"].to_numpy(np.int64)
        a = np.bincount(idx[p == 0], minlength=n_bins).astype(np.int64)
        b = np.bincount(idx[p == 1], minlength=n_bins).astype(np.int64)
        return pd.DataFrame({"ha": [a.tobytes()], "hb": [b.tobytes()]})

    parts = cds.map_batches(hist, batch_format="pandas").to_pandas()
    ha = np.zeros(n_bins, dtype=np.int64)
    hb = np.zeros(n_bins, dtype=np.int64)
    for ba, bb in zip(parts["ha"], parts["hb"]):
        ha += np.frombuffer(ba, dtype=np.int64)
        hb += np.frombuffer(bb, dtype=np.int64)
    na, nb = float(int(ha.sum())), float(int(hb.sum()))
    rows = []
    for i in range(n_bins):
        ca, cb = int(ha[i]), int(hb[i])
        if ca == 0 and cb == 0:
            continue
        if ca > 0 and cb > 0:
            pa_, pb_ = float(ca) / na, float(cb) / nb
            term = _round_e9((pa_ - pb_) * math.log(pa_ / pb_))
        else:
            term = 0
        rows.append((i, ca, cb, term))
    return pd.DataFrame(rows, columns=["bin", "cnt_a", "cnt_b",
                                       "psi_term_e9"]).astype(np.int64)


PSI_DRIFT_SQL = f"""
WITH c AS (SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c,
                  CASE WHEN o_orderdate >= TIMESTAMP '{_PSI_SPLIT}'
                       THEN 1 ELSE 0 END AS p
           FROM orders),
g AS (SELECT MIN(c) AS lo, MAX(c) AS hi FROM c),
w AS (SELECT lo, (hi - lo) // {_PSI_BINS} + 1 AS w FROM g),
h AS (SELECT (c.c - w.lo) // w.w AS bin,
             CAST(SUM(CASE WHEN p = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
             CAST(SUM(CASE WHEN p = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_b
      FROM c, w GROUP BY 1),
n AS (SELECT CAST(SUM(cnt_a) AS DOUBLE) AS na,
             CAST(SUM(cnt_b) AS DOUBLE) AS nb FROM h)
SELECT CAST(bin AS BIGINT) AS bin, cnt_a, cnt_b,
       CASE WHEN cnt_a > 0 AND cnt_b > 0 THEN
         CAST(ROUND((CAST(cnt_a AS DOUBLE)/na - CAST(cnt_b AS DOUBLE)/nb)
              * ln((CAST(cnt_a AS DOUBLE)/na) / (CAST(cnt_b AS DOUBLE)/nb))
              * 1000000000) AS BIGINT)
       ELSE 0 END AS psi_term_e9
FROM h, n
"""


_TRIM_PCT = 5


def trimmed_stats(sf_dir: str, trim_pct: int = _TRIM_PCT) -> pd.DataFrame:
    """(o_orderpriority, n_kept, sum_kept_cents) — trimmed (winsor-style
    drop, not clamp) per-group money stats: per priority class, drop the
    ``floor(n·trim_pct/100)`` cheapest and most expensive orders, then the
    exact integer count/sum of the survivors. The robust-mean building block
    for outlier-resistant dataset profiling.

    Trimming by value-ordered rank depends only on the value MULTISET, so
    the distributed plan never sorts rows: per-block (priority, cents) value
    counts → one hash exchange on priority → each reducer holds a
    value-domain-bounded count table, finds the two cut ranks via cumulative
    counts and folds the kept mass with Python ints (HUGEINT-parity). Same
    doctrine as ``exact_group_quantiles``; no row-level shuffle, no sort.

    Reference parity note: no counterpart in the reference — brief-mandated
    profiling family (robust statistics before curation thresholds).
    """
    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_orderpriority", "o_totalprice"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "pri": df["o_orderpriority"],
            "c": np.rint(df["o_totalprice"].to_numpy(np.float64) * 100)
                 .astype(np.int64)})
        return out.groupby(["pri", "c"], as_index=False).size().rename(
            columns={"size": "n"})

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        if not df.empty:
            g = df.groupby(["pri", "c"], as_index=False).agg(n=("n", "sum"))
            for pri, t in g.groupby("pri"):
                t = t.sort_values("c")
                cs = t["c"].to_numpy(np.int64)
                ns = t["n"].to_numpy(np.int64)
                n = int(ns.sum())
                k = n * trim_pct // 100
                cum = np.cumsum(ns)
                # kept ranks are (k, n-k]; per value row, kept multiplicity =
                # overlap of its rank interval (cum-n_i, cum] with (k, n-k]
                lo_r = cum - ns
                kept = np.minimum(cum, n - k) - np.maximum(lo_r, k)
                kept = np.maximum(kept, 0)
                n_kept = int(kept.sum())
                s = sum(int(c) * int(m) for c, m in zip(cs, kept) if m > 0)
                rows.append((pri, n_kept, s))
        return pd.DataFrame(rows, columns=["o_orderpriority", "n_kept",
                                           "sum_kept_cents"]).astype(
            {"n_kept": np.int64, "sum_kept_cents": np.int64}) if rows else \
            pd.DataFrame({"o_orderpriority": pd.Series(dtype="string"),
                          "n_kept": pd.Series(dtype=np.int64),
                          "sum_kept_cents": pd.Series(dtype=np.int64)})

    from .shuffle import bucketed_group_apply

    out = bucketed_group_apply(ds, ["pri"], part, fin, n_buckets=4).to_pandas()
    return out.sort_values("o_orderpriority").reset_index(drop=True)


TRIMMED_STATS_SQL = f"""
WITH c AS (SELECT o_orderpriority AS pri,
                  CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
           FROM orders),
r AS (SELECT pri, c,
             ROW_NUMBER() OVER (PARTITION BY pri ORDER BY c) AS rk,
             COUNT(*) OVER (PARTITION BY pri) AS n
      FROM c)
SELECT pri AS o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(c) AS BIGINT) AS sum_kept_cents
FROM r WHERE rk > n * {_TRIM_PCT} // 100 AND rk <= n - n * {_TRIM_PCT} // 100
GROUP BY pri
"""


def label_balance(sf_dir: str) -> pd.DataFrame:
    """(label, n, share_e9, entropy_term_e9) — class-imbalance report over
    the embeddings label column: per-class counts, share, and the Shannon
    entropy contribution ``−p·ln p`` (summing the column gives the corpus'
    label entropy in nats·1e9) — the balance check run before training on a
    labeled corpus.

    Per-block label counts (label-domain-bounded Arrow group_by) fold on the
    driver; each float column is one identical-double expression over exact
    integer counts, emitted PER LABEL (the psi_drift recipe — no
    cross-engine float-sum order exists)."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["label"])

    def part(batch: pa.Table) -> pa.Table:
        g = batch.group_by("label").aggregate([([], "count_all")])
        return pa.table({"label": g["label"].cast(pa.int64()),
                         "n": g["count_all"].cast(pa.int64())})

    counts = (ds.map_batches(part, batch_format="pyarrow",
                             zero_copy_batch=True)
              .to_pandas()  # O(blocks × |labels|)
              .groupby("label", as_index=False).agg(n=("n", "sum")))
    total = float(int(counts["n"].sum()))
    rows = []
    for lab, n in zip(counts["label"], counts["n"]):
        n = int(n)
        p = float(n) / total
        rows.append((int(lab), n, _round_e9(p), _round_e9(-p * math.log(p))))
    out = pd.DataFrame(rows, columns=["label", "n", "share_e9",
                                      "entropy_term_e9"]).astype(np.int64)
    return out.sort_values("label").reset_index(drop=True)


LABEL_BALANCE_SQL = """
WITH c AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n
           FROM embeddings GROUP BY label),
t AS (SELECT CAST(SUM(n) AS DOUBLE) AS total FROM c)
SELECT CAST(label AS BIGINT) AS label, n,
       CAST(ROUND(CAST(n AS DOUBLE) / total * 1000000000) AS BIGINT)
         AS share_e9,
       CAST(ROUND(-(CAST(n AS DOUBLE) / total)
                  * ln(CAST(n AS DOUBLE) / total) * 1000000000) AS BIGINT)
         AS entropy_term_e9
FROM c, t
"""


_STD_SCALE = 1_000_000


def _round_e6_vec(v: np.ndarray) -> np.ndarray:
    """Vectorized ROUND(v·1e6), half away from zero (the `_round_e9_vec`
    recipe at e6 — identical IEEE ops per element)."""
    s = np.abs(v) * 1e6
    f = np.floor(s)
    f = f + (s - f >= 0.5)
    return np.where(v >= 0, f, -f).astype(np.int64)


def embedding_standardize(sf_dir: str) -> "ray.data.Dataset":
    """(vec_id, i, z_e6) — per-dimension z-score standardization of the
    embedding column (the whitening-lite preprocessing step before
    clustering / cosine work when dimensions have unequal scales).

    Exactness recipe: coordinates quantize once to the repo's
    ``floor(x·1e6 + 0.5)`` int64 grid, so the per-dim sufficient statistics
    (Σq, Σq², n) are EXACT integers (one d-vector pair per block, driver
    fold with the `embedding_moments` overflow guard); mean and std are then
    one identical-double expression each, broadcast into a second streaming
    pass whose per-coordinate ``(q−μ)/σ`` is elementwise-identical IEEE in
    numpy and DuckDB. Long-form output so every value is hash-gated.
    Zero-variance dimensions emit 0 (guarded in both engines).

    Reference parity note: no counterpart in the reference — brief-mandated
    embedding-pipeline preprocessing family."""

    def suff(batch: pa.Table) -> pd.DataFrame:
        emb = batch["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        x = emb.flatten().to_numpy(zero_copy_only=False).reshape(
            batch.num_rows, -1).astype(np.float64)
        q = np.floor(x * _STD_SCALE + 0.5).astype(np.int64)
        return pd.DataFrame({
            "s": [q.sum(axis=0).tobytes()],
            "qq": [(q * q).sum(axis=0).tobytes()],
            "n": [np.int64(q.shape[0])],
            "qmax": [np.int64(np.abs(q).max(initial=0))]})

    parts = (ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                   columns=["embedding"])
             .map_batches(suff, batch_format="pyarrow", zero_copy_batch=True)
             .to_pandas())
    n_total = int(parts["n"].sum())
    qmax = int(parts["qmax"].max())
    if n_total * qmax * qmax >= 2 ** 63:
        raise OverflowError(
            f"embedding_standardize int64 bound exceeded: n={n_total}, "
            f"max|q|={qmax}; lower _STD_SCALE for this corpus size")
    s = np.zeros(len(np.frombuffer(parts["s"].iloc[0], dtype=np.int64)),
                 dtype=np.int64)
    qq = np.zeros_like(s)
    for bs, bq in zip(parts["s"], parts["qq"]):
        s += np.frombuffer(bs, dtype=np.int64)
        qq += np.frombuffer(bq, dtype=np.int64)
    nd = float(n_total)
    mu = s.astype(np.float64) / nd
    sd = np.sqrt((qq.astype(np.float64) - s.astype(np.float64)
                  * s.astype(np.float64) / nd) / nd)
    mu_ref = ray.put(mu)
    sd_ref = ray.put(sd)

    def zscore(batch: pa.Table) -> pd.DataFrame:
        m, d_ = ray.get(mu_ref), ray.get(sd_ref)
        emb = batch["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        x = emb.flatten().to_numpy(zero_copy_only=False).reshape(
            batch.num_rows, -1).astype(np.float64)
        q = np.floor(x * _STD_SCALE + 0.5)
        safe = np.where(d_ == 0, 1.0, d_)
        z = (q - m[None, :]) / safe[None, :]
        z[:, d_ == 0] = 0.0
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n, d = z.shape
        return pd.DataFrame({
            "vec_id": np.repeat(ids, d),
            "i": np.tile(np.arange(1, d + 1, dtype=np.int64), n),
            "z_e6": _round_e6_vec(z.ravel())})

    return ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(zscore, batch_format="pyarrow", zero_copy_batch=True)


EMBEDDING_STANDARDIZE_SQL = f"""
WITH x AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * {_STD_SCALE} + 0.5)
              AS BIGINT) AS qx
  FROM embeddings),
s AS (SELECT i, CAST(SUM(qx) AS DOUBLE) AS sx,
             CAST(SUM(qx * qx) AS DOUBLE) AS qq,
             CAST(COUNT(*) AS DOUBLE) AS n
      FROM x GROUP BY i),
m AS (SELECT i, sx / n AS mu, sqrt((qq - sx * sx / n) / n) AS sd FROM s)
SELECT x.vec_id, CAST(x.i AS BIGINT) AS i,
       CAST(CASE WHEN m.sd = 0 THEN 0
                 ELSE ROUND((CAST(x.qx AS DOUBLE) - m.mu) / m.sd * 1000000)
            END AS BIGINT) AS z_e6
FROM x JOIN m USING (i)
"""


# ---------------------------------------------------------------------------
# Deterministic Poisson bootstrap
# ---------------------------------------------------------------------------

# Poisson(1) CDF thresholds scaled to 2^32 as exact integers (computed once
# from math.exp(-1)/k!): a uniform u32 maps to the inverse-CDF weight by
# counting thresholds <= u32. Weights past 8 occurrences carry ~2e-5 of the
# mass and clamp to 8 — stated in the oracle identically.
_BOOT_THRESH = (1580030168, 3160060337, 3950075421, 4213413783,
                4279248373, 4292415291, 4294609777, 4294923276)
_BOOT_REPS = 16


def bootstrap_ci(sf_dir: str, n_reps: int = _BOOT_REPS) -> pd.DataFrame:
    """(replicate, n, sum_cents, mean_e6) — deterministic Poisson bootstrap
    of the mean order price: each replicate re-weights every order by a
    Poisson(1) draw keyed on ``md5(orderkey|replicate)`` (the hash_sample
    recipe — no RNG state, so replicates are reproducible across runs,
    retries and cluster sizes, and restatable in SQL). Per-replicate totals
    give the bootstrap distribution of the mean — the standard
    scale-friendly resampling scheme (each row is weighted independently,
    so the pass streams; a true multinomial resample would need global
    coordination).

    One corpus pass emits per-block (replicate, n, sum) partials; the
    driver fold is replicate-bounded. ``mean_e6`` is exact integer floor
    division done in Python ints (sum_cents·1e6 overflows int64 past ~9e12
    cents — HUGEINT in the oracle)."""
    import hashlib

    thresh = np.asarray(_BOOT_THRESH, dtype=np.int64)

    def per_rep(df: pd.DataFrame) -> pd.DataFrame:
        ok = df["o_orderkey"].to_numpy(np.int64)
        cents = np.rint(df["o_totalprice"].to_numpy(np.float64) * 100
                        ).astype(np.int64)
        reps = []
        for r in range(n_reps):
            u = np.fromiter(
                (int.from_bytes(
                    hashlib.md5(f"{int(o)}|{r}".encode()).digest()[:4], "big")
                 for o in ok),
                dtype=np.int64, count=len(ok))
            w = np.searchsorted(thresh, u, side="right")
            # decimal-string carry (linear_sufficient_stats recipe): the
            # cross-block fold must not wrap int64 at corpus scale
            reps.append((r, int(w.sum()), str(int((w * cents).sum()))))
        return pd.DataFrame(reps, columns=["replicate", "n", "sum_cents"])

    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_orderkey", "o_totalprice"])
    parts = ds.map_batches(per_rep, batch_format="pandas").to_pandas()
    rows = []
    for rep, sub in parts.groupby("replicate"):
        n = int(sub["n"].sum())
        sc = sum(int(v) for v in sub["sum_cents"])  # unbounded Python ints
        # a replicate can draw zero total weight on a tiny input; emit -1
        # (stated in the oracle identically) rather than divide by zero
        rows.append((int(rep), n, sc, sc * 1_000_000 // n if n else -1))
    g = pd.DataFrame(rows, columns=["replicate", "n", "sum_cents", "mean_e6"])
    return (g.astype(np.int64).sort_values("replicate")
            .reset_index(drop=True))


def bootstrap_ci_sql(n_reps: int = _BOOT_REPS) -> str:
    cases = " ".join(
        f"WHEN u32 < {t} THEN {k}" for k, t in enumerate(_BOOT_THRESH))
    return f"""
WITH o AS (SELECT CAST(o_orderkey AS VARCHAR) AS ok,
                  CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders),
r AS (SELECT range AS rep FROM range({n_reps})),
u AS (SELECT rep, cents,
        ('0x' || substr(md5(ok || '|' || CAST(rep AS VARCHAR)), 1, 8))::UBIGINT
          AS u32
      FROM o, r),
w AS (SELECT rep, cents, CASE {cases} ELSE 8 END AS w FROM u)
SELECT CAST(rep AS BIGINT) AS replicate, CAST(SUM(w) AS BIGINT) AS n,
       CAST(SUM(w * cents) AS BIGINT) AS sum_cents,
       CAST(CASE WHEN SUM(w) = 0 THEN -1
                 ELSE CAST(SUM(w * cents) AS HUGEINT) * 1000000
                      // CAST(SUM(w) AS HUGEINT) END AS BIGINT) AS mean_e6
FROM w GROUP BY 1
"""


BOOTSTRAP_CI_SQL = bootstrap_ci_sql()


def regression_by_group(sf_dir: str, group_col: str = "l_returnflag") -> pd.DataFrame:
    """(group, n, corr_e9, slope_e9, intercept_e9) — per-returnflag OLS fit
    of l_extendedprice (cents) on l_quantity: the grouped twin of
    :func:`price_qty_regression` (segment-level price-model audit).

    Per-block partials carry the six exact integer sufficient stats PER
    GROUP (decimal strings — sums exceed int64 at scale); the driver fold is
    group-domain-bounded (ship modes), and each group's fit is the same
    identical-double expression as the global op. Degenerate groups
    (zero x or y variance) emit corr = slope = 0 and intercept = mean y —
    stated in the oracle identically."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = np.rint(df["l_quantity"].to_numpy(np.float64)).astype(np.int64)
        y = np.rint(df["l_extendedprice"].to_numpy(np.float64) * 100
                    ).astype(np.int64)
        g = pd.DataFrame({"group": df[group_col], "x": x, "y": y,
                          "xx": x * x, "yy": y * y, "xy": x * y})
        agg = g.groupby("group", as_index=False).agg(
            n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"),
            sxx=("xx", "sum"), syy=("yy", "sum"), sxy=("xy", "sum"))
        for c in ("sx", "sy", "sxx", "syy", "sxy"):
            agg[c] = agg[c].map(lambda v: str(int(v)))
        return agg

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[group_col, "l_quantity", "l_extendedprice"])
    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    rows = []
    for grp, sub in parts.groupby("group"):
        n = int(sub["n"].sum())
        sx, sy, sxx, syy, sxy = (
            sum(int(v) for v in sub[c])
            for c in ("sx", "sy", "sxx", "syy", "sxy"))
        num = float(n * sxy - sx * sy)
        den_x = float(n * sxx - sx * sx)
        den_y = float(n * syy - sy * sy)
        if den_x > 0 and den_y > 0:
            slope = num / den_x
            corr = _round_e9(num / math.sqrt(den_x * den_y))
            slope_e9 = _round_e9(slope)
            icept = _round_e9((float(sy) - slope * float(sx)) / float(n))
        else:
            corr, slope_e9 = 0, 0
            icept = _round_e9(float(sy) / float(n))
        rows.append((grp, n, corr, slope_e9, icept))
    out = pd.DataFrame(rows, columns=["group", "n", "corr_e9", "slope_e9",
                                      "intercept_e9"])
    for c in out.columns[1:]:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("group").reset_index(drop=True)


REGRESSION_BY_GROUP_SQL = """
WITH b AS (SELECT l_returnflag AS grp,
                  CAST(ROUND(l_quantity) AS HUGEINT) AS x,
                  CAST(ROUND(l_extendedprice * 100) AS HUGEINT) AS y
           FROM lineitem),
s AS (SELECT grp, CAST(COUNT(*) AS HUGEINT) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x*x) AS sxx, SUM(y*y) AS syy, SUM(x*y) AS sxy
      FROM b GROUP BY 1),
t AS (SELECT grp, CAST(n AS BIGINT) AS n,
             CAST(n*sxy - sx*sy AS DOUBLE) AS num,
             CAST(n*sxx - sx*sx AS DOUBLE) AS den_x,
             CAST(n*syy - sy*sy AS DOUBLE) AS den_y,
             CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd FROM s)
SELECT grp AS "group", n,
  CAST(CASE WHEN den_x > 0 AND den_y > 0
            THEN ROUND(num / sqrt(den_x * den_y) * 1000000000)
            ELSE 0 END AS BIGINT) AS corr_e9,
  CAST(CASE WHEN den_x > 0 AND den_y > 0
            THEN ROUND(num / den_x * 1000000000) ELSE 0 END AS BIGINT)
    AS slope_e9,
  CAST(CASE WHEN den_x > 0 AND den_y > 0
            THEN ROUND((syd - (num / den_x) * sxd) / CAST(n AS DOUBLE)
                       * 1000000000)
            ELSE ROUND(syd / CAST(n AS DOUBLE) * 1000000000)
       END AS BIGINT) AS intercept_e9
FROM t
"""


# ---------------------------------------------------------------------------
# Embedding mean-vector drift
# ---------------------------------------------------------------------------

_EMB_DRIFT_SPLIT_MOD = 2


def embedding_mean_drift(sf_dir: str) -> pd.DataFrame:
    """(dim, n_a, n_b, sum_a_q, sum_b_q, delta_e6) — per-dimension drift of
    the embedding mean vector between two ingest halves (vec_id parity):
    the centroid-shift monitor a re-embedding pipeline runs after a model
    or preprocphrase change — a shifted mean in specific dimensions
    localizes WHAT moved, which the scalar cosine drift can't.

    Coordinates are quantized exactly like the kmeans trainer
    (floor(x*1e6), translation-checked), so sums are exact integers; one
    streamed pass emits per-block per-dim partials (2·d ints), the fold is
    dimension-bounded, and delta_e6 = sum_a_q//n_a − sum_b_q//n_b is pure
    integer floor math — sign-safe because the _KM_OFFSET translation keeps
    every quantized coordinate nonnegative (the documented kmeans bound).
    A one-sided split (every vec_id on one parity) emits the sentinel
    delta_e6 = -1, stated identically in the oracle."""

    from .similarity import _km_quant

    def partial(batch: pa.Table) -> pd.DataFrame:
        ids, q = _km_quant(batch)
        side = (ids % _EMB_DRIFT_SPLIT_MOD == 0)
        rows = []
        for tag, m in (("a", side), ("b", ~side)):
            if m.any():
                s = q[m].sum(axis=0)
                rows.append(pd.DataFrame({
                    "dim": np.arange(q.shape[1], dtype=np.int64),
                    "side": tag, "n": int(m.sum()),
                    "s": [str(int(v)) for v in s]}))
        if not rows:
            return pd.DataFrame({"dim": pd.Series(dtype=np.int64),
                                 "side": pd.Series(dtype=str),
                                 "n": pd.Series(dtype=np.int64),
                                 "s": pd.Series(dtype=str)})
        return pd.concat(rows, ignore_index=True)

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    rows = []
    for dim, sub in parts.groupby("dim"):
        a = sub[sub["side"] == "a"]
        b = sub[sub["side"] == "b"]
        na = int(a["n"].sum())
        nb = int(b["n"].sum())
        sa = sum(int(v) for v in a["s"])
        sb = sum(int(v) for v in b["s"])
        # one-sided split (every vec_id shares a parity): sentinel -1, the
        # bootstrap_ci/rich_club convention, stated identically in the SQL
        delta = (-1 if na == 0 or nb == 0
                 else (sa * 1_000_000 // na) - (sb * 1_000_000 // nb))
        rows.append((int(dim), na, nb, sa, sb, delta))
    out = pd.DataFrame(rows, columns=["dim", "n_a", "n_b", "sum_a_q",
                                      "sum_b_q", "delta_e6"])
    return out.astype(np.int64).sort_values("dim").reset_index(drop=True)


def embedding_mean_drift_sql() -> str:
    from .similarity import _KM_OFFSET, _KM_SCALE

    return f"""
WITH x AS (
  SELECT vec_id % {_EMB_DRIFT_SPLIT_MOD} = 0 AS side_a,
         generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(FLOOR(unnest(embedding)::DOUBLE * {_KM_SCALE}) AS BIGINT)
           + {_KM_OFFSET} AS q
  FROM embeddings),
g AS (
  SELECT dim,
         CAST(SUM(CASE WHEN side_a THEN 1 ELSE 0 END) AS HUGEINT)
           AS n_a,
         CAST(SUM(CASE WHEN side_a THEN 0 ELSE 1 END) AS HUGEINT)
           AS n_b,
         CAST(SUM(CASE WHEN side_a THEN q ELSE 0 END) AS HUGEINT)
           AS sum_a_q,
         CAST(SUM(CASE WHEN side_a THEN 0 ELSE q END) AS HUGEINT)
           AS sum_b_q
  FROM x GROUP BY 1)
SELECT CAST(dim AS BIGINT) AS dim,
       CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(sum_a_q AS BIGINT) AS sum_a_q,
       CAST(sum_b_q AS BIGINT) AS sum_b_q,
       CAST(CASE WHEN n_a = 0 OR n_b = 0 THEN -1
                 ELSE sum_a_q * 1000000 // n_a - sum_b_q * 1000000 // n_b
            END AS BIGINT) AS delta_e6
FROM g
"""


# ---------------------------------------------------------------------------
# Deterministic randomization test
# ---------------------------------------------------------------------------

_PERM_REPS = 64
_PERM_SRC_A = "src0"
_PERM_SRC_B = "src1"


def permutation_test(sf_dir: str, n_reps: int = _PERM_REPS,
                     src_a: str = _PERM_SRC_A,
                     src_b: str = _PERM_SRC_B) -> pd.DataFrame:
    """(n_reps, n_a, n_b, obs_diff_num, n_extreme, p_bp) — deterministic
    randomization test for the mean document-length difference between two
    sources: under each replicate every doc is re-assigned a side by
    ``md5(doc_id|rep)`` with P(a) = n_a/(n_a+n_b), and the replicate is
    extreme iff its |mean difference| ≥ the observed one. p = share of
    extreme replicates — the significance companion to ks_drift (which
    gives the statistic but no calibrated p).

    Mean differences never materialize as floats: |sa/na − sb/nb| ≥
    |SA/NA − SB/NB| is evaluated by integer cross-multiplication in
    unbounded Python ints (the products are O(n²·Σx²) — far past int64;
    HUGEINT covers the oracle at test scale, stated there). Replicate
    sides are pure hash functions (bootstrap_ci recipe): one tiny count
    pass then one streamed pass with per-block (rep, side, n, sum)
    partials carried as decimal strings; the fold is replicate-bounded.
    Degenerate replicates (either side empty) count as extreme (stated in
    the oracle)."""
    import hashlib

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "source", "n_chars"])

    def base_counts(df: pd.DataFrame) -> pd.DataFrame:
        m = df[df["source"].isin([src_a, src_b])]
        side_b = (m["source"] == src_b).astype(int)
        g = pd.DataFrame({"side": side_b,
                          "x": m["n_chars"].astype(np.int64)})
        out = g.groupby("side", as_index=False).agg(
            n=("x", "size"), s=("x", "sum"))
        out["s"] = out["s"].map(lambda v: str(int(v)))
        return out

    base = ds.map_batches(base_counts, batch_format="pandas").to_pandas()
    n_a = int(base.loc[base["side"] == 0, "n"].sum())
    n_b = int(base.loc[base["side"] == 1, "n"].sum())
    s_a = sum(int(v) for v in base.loc[base["side"] == 0, "s"])
    s_b = sum(int(v) for v in base.loc[base["side"] == 1, "s"])
    thr = n_a * (1 << 32) // (n_a + n_b)

    def per_rep(df: pd.DataFrame) -> pd.DataFrame:
        m = df[df["source"].isin([src_a, src_b])]
        ids = m["doc_id"].to_numpy(np.int64)
        x = m["n_chars"].to_numpy(np.int64)
        rows = []
        for r in range(n_reps):
            u = np.fromiter(
                (int.from_bytes(
                    hashlib.md5(f"{int(d)}|{r}".encode()).digest()[:4],
                    "big")
                 for d in ids), dtype=np.int64, count=len(ids))
            a = u < thr
            rows.append((r, int(a.sum()), str(int(x[a].sum())),
                         int((~a).sum()), str(int(x[~a].sum()))))
        return pd.DataFrame(rows, columns=["rep", "na", "sa", "nb", "sb"])

    parts = ds.map_batches(per_rep, batch_format="pandas").to_pandas()
    obs_num = abs(s_a * n_b - s_b * n_a)
    n_extreme = 0
    for r, sub in parts.groupby("rep"):
        na = int(sub["na"].sum())
        nb = int(sub["nb"].sum())
        sa = sum(int(v) for v in sub["sa"])
        sb = sum(int(v) for v in sub["sb"])
        if na == 0 or nb == 0:
            n_extreme += 1
            continue
        # |sa/na - sb/nb| >= |SA/NA - SB/NB|  <=>  cross-multiplied form
        if abs(sa * nb - sb * na) * (n_a * n_b) >= obs_num * (na * nb):
            n_extreme += 1
    p_bp = 10000 * n_extreme // n_reps
    return pd.DataFrame(
        [[n_reps, n_a, n_b, obs_num, n_extreme, p_bp]],
        columns=["n_reps", "n_a", "n_b", "obs_diff_num", "n_extreme",
                 "p_bp"]).astype(np.int64)


def permutation_test_sql(n_reps: int = _PERM_REPS,
                         src_a: str = _PERM_SRC_A,
                         src_b: str = _PERM_SRC_B) -> str:
    return f"""
WITH d AS (SELECT doc_id, CAST(n_chars AS HUGEINT) AS x,
                  CASE WHEN source = '{src_b}' THEN 1 ELSE 0 END AS side
           FROM documents WHERE source IN ('{src_a}', '{src_b}')),
base AS (SELECT
    CAST(SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS n_a,
    CAST(SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS n_b,
    SUM(CASE WHEN side = 0 THEN x ELSE 0 END) AS s_a,
    SUM(CASE WHEN side = 1 THEN x ELSE 0 END) AS s_b
  FROM d),
thr AS (SELECT n_a * 4294967296 // (n_a + n_b) AS t FROM base),
r AS (SELECT range AS rep FROM range({n_reps})),
asg AS (SELECT rep, x,
          ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' ||
                              CAST(rep AS VARCHAR)), 1, 8))::UBIGINT
            < (SELECT t FROM thr) AS is_a
        FROM d, r),
reps AS (SELECT rep,
    CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS HUGEINT) AS na,
    SUM(CASE WHEN is_a THEN x ELSE 0 END) AS sa,
    CAST(SUM(CASE WHEN is_a THEN 0 ELSE 1 END) AS HUGEINT) AS nb,
    SUM(CASE WHEN is_a THEN 0 ELSE x END) AS sb
  FROM asg GROUP BY 1),
ex AS (SELECT rep,
    CASE WHEN na = 0 OR nb = 0 THEN 1
         WHEN ABS(sa * nb - sb * na) * (base.n_a * base.n_b)
              >= ABS(base.s_a * base.n_b - base.s_b * base.n_a) * (na * nb)
         THEN 1 ELSE 0 END AS extreme
  FROM reps, base)
SELECT CAST({n_reps} AS BIGINT) AS n_reps,
       CAST(base.n_a AS BIGINT) AS n_a, CAST(base.n_b AS BIGINT) AS n_b,
       CAST(ABS(base.s_a * base.n_b - base.s_b * base.n_a) AS BIGINT)
         AS obs_diff_num,
       CAST((SELECT SUM(extreme) FROM ex) AS BIGINT) AS n_extreme,
       CAST(10000 * (SELECT SUM(extreme) FROM ex) // {n_reps} AS BIGINT)
         AS p_bp
FROM base
"""


PERMUTATION_TEST_SQL = permutation_test_sql()


def revenue_concentration(sf_dir: str) -> pd.DataFrame:
    """(n_customers, threshold_cents, n_top, top_revenue_cents,
    total_revenue_cents, share_bp) — Pareto concentration of revenue: the
    share held by customers at or above the P90 of per-customer totals
    (the 80/20 audit every commercial dataset profile runs; here it also
    sizes the hot-key tail every exchange has to survive).

    Per-customer totals are ONE custkey exchange (key + cents only); the
    P90 threshold comes from the exact counting-quantile machinery
    (:func:`exact_group_quantiles` over the totals Dataset — never a
    sort); the concentration pass folds three scalars per block. Ties at
    the threshold count as top on both engines (>= threshold,
    percentile_disc value). Exact integers end-to-end."""
    from .shuffle import hash_exchange_apply

    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_custkey", "o_totalprice"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["o_totalprice"].to_numpy(np.float64) * 100
                        ).astype(np.int64)
        g = pd.DataFrame({"ck": df["o_custkey"].astype(np.int64),
                          "cents": cents})
        return g.groupby("ck", as_index=False)["cents"].sum()

    totals = hash_exchange_apply(
        ds, ["ck"], part,
        lambda df: df.groupby("ck", as_index=False)["cents"].sum(),
        fmt="pandas").materialize()
    thr = int(exact_group_quantiles(totals, "cents", None, [0.9])
              .iloc[0]["p90"])

    def conc(df: pd.DataFrame) -> pd.DataFrame:
        c = df["cents"].to_numpy(np.int64)
        top = c >= thr
        return pd.DataFrame({
            "n": [len(c)], "n_top": [int(top.sum())],
            "top_sum": [str(int(c[top].sum()))],
            "tot_sum": [str(int(c.sum()))]})

    parts = totals.map_batches(conc, batch_format="pandas").to_pandas()
    n = int(parts["n"].sum())
    n_top = int(parts["n_top"].sum())
    top_sum = sum(int(v) for v in parts["top_sum"])
    tot_sum = sum(int(v) for v in parts["tot_sum"])
    share_bp = top_sum * 10000 // tot_sum if tot_sum else -1
    return pd.DataFrame(
        [[n, thr, n_top, top_sum, tot_sum, share_bp]],
        columns=["n_customers", "threshold_cents", "n_top",
                 "top_revenue_cents", "total_revenue_cents", "share_bp"]
    ).astype(np.int64)


REVENUE_CONCENTRATION_SQL = """
WITH t AS (SELECT o_custkey,
                  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                       AS BIGINT) AS cents
           FROM orders GROUP BY 1),
q AS (SELECT CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY cents)
               AS BIGINT) AS thr FROM t)
SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
       (SELECT thr FROM q) AS threshold_cents,
       CAST(SUM(CASE WHEN cents >= (SELECT thr FROM q) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_top,
       CAST(SUM(CASE WHEN cents >= (SELECT thr FROM q) THEN cents
                     ELSE 0 END) AS BIGINT) AS top_revenue_cents,
       CAST(SUM(cents) AS BIGINT) AS total_revenue_cents,
       CAST(SUM(CASE WHEN cents >= (SELECT thr FROM q) THEN cents
                     ELSE 0 END) * 10000 // SUM(cents) AS BIGINT)
         AS share_bp
FROM t
"""


def revenue_gini(sf_dir: str, n_hist: int = 2048) -> pd.DataFrame:
    """(n_customers, total_cents, gini_e9) — exact Gini coefficient of
    per-customer revenue: G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) over values
    sorted ascending (ROW_NUMBER ranks; tie order is irrelevant to the sum
    because tied values contribute x·Σranks regardless of order, but the
    custkey tie-break is stated for determinism). The inequality summary
    behind :func:`revenue_concentration`'s single Pareto point.

    Per-customer totals are ONE custkey exchange; ranks attach with the
    order_price_rank recipe (histogram offsets + per-bucket local sort —
    no global sort); per-bucket (n, Σx, Σ rank·x) partials carry decimal
    strings (rank·x is O(n²·x) — far past int64), the driver folds in
    Python ints, and the single division is one identical-double (HUGEINT
    oracle)."""
    from .shuffle import bucketed_group_apply, hash_exchange_apply

    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_custkey", "o_totalprice"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["o_totalprice"].to_numpy(np.float64) * 100
                        ).astype(np.int64)
        g = pd.DataFrame({"ck": df["o_custkey"].astype(np.int64),
                          "cents": cents})
        return g.groupby("ck", as_index=False)["cents"].sum()

    totals = hash_exchange_apply(
        ds, ["ck"], part,
        lambda df: df.groupby("ck", as_index=False)["cents"].sum(),
        fmt="pandas").materialize()

    agg = totals.aggregate(Min("cents"), Max("cents"))
    lo, hi = int(agg["min(cents)"]), int(agg["max(cents)"])
    width = (hi - lo) or 1
    scale = n_hist / width

    def bucket_of(v: np.ndarray) -> np.ndarray:
        return np.clip(((v - lo) * scale).astype(np.int64), 0, n_hist - 1)

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        b = bucket_of(df["cents"].to_numpy(np.int64))
        c = np.bincount(b, minlength=n_hist)
        nz = np.nonzero(c)[0]
        return pd.DataFrame({"b": nz, "cnt": c[nz]})

    counts = (totals.map_batches(hist, batch_format="pandas").to_pandas()
              .groupby("b", as_index=False).agg(cnt=("cnt", "sum")))
    full = np.zeros(n_hist, dtype=np.int64)
    full[counts["b"].to_numpy(np.int64)] = counts["cnt"].to_numpy(np.int64)
    offsets = np.concatenate([[0], np.cumsum(full)[:-1]])
    off_ref = ray.put(offsets)

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["b"] = bucket_of(df["cents"].to_numpy(np.int64))
        return df

    def bucket_partial(df: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(off_ref)
        rows = []
        for b, g in df.groupby("b", sort=False):
            g = g.sort_values(["cents", "ck"])
            x = g["cents"].to_numpy(np.int64)
            ranks = offs[int(b)] + 1 + np.arange(len(x), dtype=np.int64)
            # rank·x overflows int64 (O(n²·x)), so the products run as
            # Python ints — but through ONE numpy object-dtype C loop
            # instead of a per-row interpreter loop (exactness kept)
            srx = int((ranks.astype(object) * x.astype(object)).sum())
            rows.append((len(x), str(int(x.sum())), str(srx)))
        if not rows:
            return pd.DataFrame({"n": pd.Series(dtype=np.int64),
                                 "sx": pd.Series(dtype=str),
                                 "srx": pd.Series(dtype=str)})
        return pd.DataFrame(rows, columns=["n", "sx", "srx"])

    parts = bucketed_group_apply(
        totals.map_batches(keyed, batch_format="pandas"), ["b"],
        lambda d: d, bucket_partial).to_pandas()
    n = int(parts["n"].sum())
    sx = sum(int(v) for v in parts["sx"])
    srx = sum(int(v) for v in parts["srx"])
    num = 2 * srx - (n + 1) * sx
    den = n * sx
    gini_e9 = _round_e9(float(num) / float(den)) if den else -1
    return pd.DataFrame([[n, sx, gini_e9]],
                        columns=["n_customers", "total_cents", "gini_e9"]
                        ).astype(np.int64)


REVENUE_GINI_SQL = """
WITH t AS (SELECT o_custkey,
                  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                       AS HUGEINT) AS cents
           FROM orders GROUP BY 1),
r AS (SELECT cents,
             CAST(ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS HUGEINT)
               AS rn
      FROM t),
s AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, SUM(cents) AS sx,
             SUM(rn * cents) AS srx FROM r)
SELECT CAST(n AS BIGINT) AS n_customers, CAST(sx AS BIGINT) AS total_cents,
       CAST(ROUND(CAST(2 * srx - (n + 1) * sx AS DOUBLE)
                  / CAST(n * sx AS DOUBLE) * 1000000000) AS BIGINT)
         AS gini_e9
FROM s
"""


def theil_terms(sf_dir: str) -> "ray.data.Dataset":
    """(o_custkey, cents, term_e9) — per-customer Theil-T inequality terms
    ``(x/S)·ln(n·x/S)``: summing them gives the Theil index, but the sum is
    deliberately NOT emitted — a cross-row float sum has engine-dependent
    order, while each per-row term is one identical-double expression from
    exact integers (the psi_drift/token_label_mi doctrine). The
    decomposable complement of :func:`revenue_gini` (Theil splits cleanly
    into between/within-group parts downstream).

    One custkey exchange for exact totals; (n, S) fold to two scalars
    broadcast into a zero-shuffle scoring pass. Zero-revenue customers emit
    term 0 (lim x→0 x·ln x = 0, stated in the oracle)."""
    from .shuffle import hash_exchange_apply

    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_custkey", "o_totalprice"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["o_totalprice"].to_numpy(np.float64) * 100
                        ).astype(np.int64)
        g = pd.DataFrame({"ck": df["o_custkey"].astype(np.int64),
                          "cents": cents})
        return g.groupby("ck", as_index=False)["cents"].sum()

    totals = hash_exchange_apply(
        ds, ["ck"], part,
        lambda df: df.groupby("ck", as_index=False)["cents"].sum(),
        fmt="pandas").materialize()

    def scalars(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": [len(df)],
                             "s": [str(int(df["cents"].sum()))]})

    sc = totals.map_batches(scalars, batch_format="pandas").to_pandas()
    n = int(sc["n"].sum())
    s = sum(int(v) for v in sc["s"])
    ref = ray.put((n, s))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        nn, ss = ray.get(ref)
        x = df["cents"].to_numpy(np.int64).astype(np.float64)
        share = x / float(ss)
        with np.errstate(divide="ignore", invalid="ignore"):
            term = np.where(x > 0,
                            share * np.log(float(nn) * x / float(ss)), 0.0)
        return pd.DataFrame({"o_custkey": df["ck"].astype(np.int64),
                             "cents": df["cents"].astype(np.int64),
                             "term_e9": _round_e9_vec(term)})

    return totals.map_batches(score, batch_format="pandas")


THEIL_TERMS_SQL = """
WITH t AS (SELECT o_custkey,
                  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                       AS BIGINT) AS cents
           FROM orders GROUP BY 1),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS s FROM t)
SELECT o_custkey, cents,
       CAST(CASE WHEN cents > 0
            THEN ROUND((CAST(cents AS DOUBLE) / CAST(n.s AS DOUBLE))
                       * LN(CAST(n.n AS DOUBLE) * CAST(cents AS DOUBLE)
                            / CAST(n.s AS DOUBLE)) * 1000000000)
            ELSE 0 END AS BIGINT) AS term_e9
FROM t, n
"""
