"""Generic relational operators over the TPC-H-ish testdata tables.

These exercise the engine's groupby/join/sort/filter building blocks with
exact DuckDB oracles. All float aggregation uses scaled-integer math
(cents / basis points) so Ray and DuckDB sums compare bit-exactly — raw
double summation order differs between engines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Sum

Q1_CUTOFF = "1998-09-01"


def _cents(col) -> pa.Array:
    return pc.round(pc.multiply(col, 100)).cast(pa.int64())


def q1_pricing_summary(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q1-style pricing summary with integer-exact money math."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                 "l_discount", "l_shipdate"],
    )

    def partial(batch: pa.Table) -> pd.DataFrame:
        batch = batch.filter(pc.less_equal(batch["l_shipdate"], pa.scalar(np.datetime64(Q1_CUTOFF, "us"))))
        cents = _cents(batch["l_extendedprice"])
        disc_bp = pc.round(pc.multiply(batch["l_discount"], 10000)).cast(pa.int64())
        disc_price = pc.multiply(cents, pc.subtract(pa.scalar(10000, type=pa.int64()), disc_bp))
        df = pd.DataFrame(
            {
                "l_returnflag": batch["l_returnflag"].to_numpy(zero_copy_only=False),
                "l_linestatus": batch["l_linestatus"].to_numpy(zero_copy_only=False),
                "qty": pc.round(batch["l_quantity"]).cast(pa.int64()).to_numpy(),
                "base": cents.to_numpy(),
                "disc": disc_price.to_numpy(),
            }
        )
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("qty", "sum"), sum_base_price_cents=("base", "sum"),
            sum_disc_price=("disc", "sum"), count_order=("qty", "size"),
        )
        return g

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_base_price_cents", alias_name="sum_base_price_cents"),
        Sum("sum_disc_price", alias_name="sum_disc_price"),
        Sum("count_order", alias_name="count_order"),
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
           * (10000 - CAST(ROUND(l_discount*10000) AS BIGINT))) AS BIGINT) AS sum_disc_price,
  CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF} 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def revenue_by_nation(sf_dir: str) -> "ray.data.Dataset":
    """orders ⋈ customer ⋈ nation, grouped by nation.

    The dimension side (customer→nation name) is tiny → broadcast once with
    ray.put and looked up per batch; only orders stream."""
    import pyarrow.parquet as pq

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    nk_to_name = dict(zip(nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist()))
    cust_to_nation = {
        c: nk_to_name[nk]
        for c, nk in zip(cust["c_custkey"].to_pylist(), cust["c_nationkey"].to_pylist())
    }
    ref = ray.put(cust_to_nation)

    def partial(batch: pa.Table) -> pd.DataFrame:
        m = ray.get(ref)
        df = pd.DataFrame(
            {
                "n_name": [m[c] for c in batch["o_custkey"].to_pylist()],
                "cents": _cents(batch["o_totalprice"]).to_numpy(),
            }
        )
        return df.groupby("n_name", as_index=False).agg(
            n_orders=("cents", "size"), revenue_cents=("cents", "sum")
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    return orders.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).groupby(
        "n_name"
    ).aggregate(
        Sum("n_orders", alias_name="n_orders"), Sum("revenue_cents", alias_name="revenue_cents")
    )


REVENUE_BY_NATION_SQL = """
SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def top10_orders(sf_dir: str) -> "ray.data.Dataset":
    """Global top-10 by price (distributed sort + limit, deterministic tiebreak)."""
    return ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    ).sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)


TOP10_ORDERS_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def events_by_type(sf_dir: str) -> pd.DataFrame:
    """Per event type: count, exact distinct users, integer-exact value sum."""
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id", "value"]
    )

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "event_type": batch["event_type"].to_numpy(zero_copy_only=False),
                "cents": _cents(batch["value"]).to_numpy(),
            }
        )
        return df.groupby("event_type", as_index=False).agg(
            n_events=("cents", "size"), sum_value_cents=("cents", "sum")
        )

    base = ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).groupby(
        "event_type"
    ).aggregate(
        Sum("n_events", alias_name="n_events"), Sum("sum_value_cents", alias_name="sum_value_cents")
    ).to_pandas()

    # exact COUNT(DISTINCT user_id): distinct pairs per batch, then a single
    # bucketed shuffle on event_type with nunique per bucket
    from ..stages.shuffle import bucketed_group_apply

    users = bucketed_group_apply(
        ev,
        ["event_type"],
        lambda df: df[["event_type", "user_id"]].drop_duplicates(),
        lambda df: df.groupby("event_type", as_index=False).agg(n_users=("user_id", "nunique")),
        n_buckets=8,
    ).to_pandas()
    out = base.merge(users[["event_type", "n_users"]], on="event_type")
    out = out[["event_type", "n_events", "n_users", "sum_value_cents"]]
    for c in ("n_events", "n_users", "sum_value_cents"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("event_type").reset_index(drop=True)


EVENTS_BY_TYPE_SQL = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events GROUP BY event_type
"""


def orders_by_month(sf_dir: str) -> "ray.data.Dataset":
    """(ym, n_orders) — orders per calendar month (ym = year*100+month)."""
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderdate"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        s = pd.Series(batch["o_orderdate"].to_numpy(zero_copy_only=False))
        ym = (s.dt.year * 100 + s.dt.month).astype(np.int64)
        g = ym.value_counts().sort_index()
        return pd.DataFrame({"ym": g.index.to_numpy(np.int64), "n_orders": g.to_numpy(np.int64)})

    return orders.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).groupby(
        "ym"
    ).aggregate(Sum("n_orders", alias_name="n_orders"))


ORDERS_BY_MONTH_SQL = """
SELECT CAST(YEAR(o_orderdate)*100 + MONTH(o_orderdate) AS BIGINT) AS ym,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders GROUP BY 1
"""


def orders_running_total(sf_dir: str) -> pd.DataFrame:
    """(ym, n_orders, sum_cents, cum_cents) — global cumulative revenue by
    calendar month: each month's totals plus the running total over all
    months ≤ it.

    The distributed-prefix-sum pattern at its cheapest: per-block partials
    collapse every block to O(|months|) rows, one tiny combine produces the
    month table (bounded by the date range, never by row count), and the
    prefix sum is a domain-sized driver cumsum — the same
    partial → bounded-combine → prefix-offset shape sample_char_budget uses
    at row granularity. Exact integer cents throughout."""
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )

    def partial(batch: pa.Table) -> pd.DataFrame:
        s = pd.Series(batch["o_orderdate"].to_numpy(zero_copy_only=False))
        out = pd.DataFrame(
            {
                "ym": (s.dt.year * 100 + s.dt.month).astype(np.int64),
                "n_orders": np.int64(1),
                "sum_cents": np.rint(
                    batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
                ).astype(np.int64),
            }
        )
        return out.groupby("ym", as_index=False).agg(
            n_orders=("n_orders", "sum"), sum_cents=("sum_cents", "sum")
        )

    months = (
        orders.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()  # O(blocks × |months|) rows — month-domain-bounded
        .groupby("ym", as_index=False)
        .agg(n_orders=("n_orders", "sum"), sum_cents=("sum_cents", "sum"))
        .sort_values("ym")
        .reset_index(drop=True)
    )
    months["cum_cents"] = months["sum_cents"].cumsum().astype(np.int64)
    return months


ORDERS_RUNNING_TOTAL_SQL = """
WITH m AS (SELECT CAST(YEAR(o_orderdate)*100 + MONTH(o_orderdate) AS BIGINT) AS ym,
                  CAST(COUNT(*) AS BIGINT) AS n_orders,
                  CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT)
                    AS sum_cents
           FROM orders GROUP BY 1)
SELECT ym, n_orders, sum_cents,
       CAST(SUM(sum_cents) OVER (ORDER BY ym ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS cum_cents
FROM m
"""


def orders_rollup(sf_dir: str) -> pd.DataFrame:
    """(year, month, n_orders, total_cents) — GROUP BY ROLLUP(year, month):
    detail rows, per-year subtotals (month = -1) and a grand total
    (year = month = -1), sentinel -1 instead of NULL so value hashing is
    null-free on both sides.

    Scale shape: one distributed partial pass (per-block groupby on
    (year, month)) + one small exchange produce the detail aggregate, which
    is bounded by |years| x 12 regardless of input size; the two coarser
    rollup levels re-aggregate THAT table driver-side — no second scan of
    the input."""
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        s = pd.Series(batch["o_orderdate"].to_numpy(zero_copy_only=False))
        df = pd.DataFrame({
            "year": s.dt.year.astype(np.int64),
            "month": s.dt.month.astype(np.int64),
            "cents": _cents(batch["o_totalprice"]).to_numpy(),
        })
        return df.groupby(["year", "month"], as_index=False).agg(
            n_orders=("cents", "size"), total_cents=("cents", "sum"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["year", "month"], as_index=False).agg(
            n_orders=("n_orders", "sum"), total_cents=("total_cents", "sum"))

    from ..stages.shuffle import bucketed_group_apply

    detail = bucketed_group_apply(
        orders.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["year", "month"], final, final, n_buckets=8,
    ).to_pandas()

    years = detail.groupby("year", as_index=False).agg(
        n_orders=("n_orders", "sum"), total_cents=("total_cents", "sum"))
    years["month"] = -1
    grand = pd.DataFrame({
        "year": [-1], "month": [-1],
        "n_orders": [detail["n_orders"].sum()],
        "total_cents": [detail["total_cents"].sum()],
    })
    out = pd.concat([detail, years, grand], ignore_index=True)
    for c in ("year", "month", "n_orders", "total_cents"):
        out[c] = out[c].astype(np.int64)
    return out[["year", "month", "n_orders", "total_cents"]]


ORDERS_ROLLUP_SQL = """
SELECT CAST(COALESCE(y, -1) AS BIGINT) AS year,
       CAST(COALESCE(m, -1) AS BIGINT) AS month,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS total_cents
FROM (SELECT YEAR(o_orderdate) AS y, MONTH(o_orderdate) AS m,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders)
GROUP BY ROLLUP (y, m)
"""


def events_hourly(sf_dir: str) -> "ray.data.Dataset":
    """Tumbling-window aggregate: events per (event_type, hour window).

    Ray Data has no event-time windows; a tumbling window over an ordered log
    is exactly a groupby on the floored timestamp (SURVEY §2.10 — the
    reference has no streaming semantics either; this is the batch-native
    window the guide prescribes)."""
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        s = pd.Series(batch["ts"].to_numpy(zero_copy_only=False))
        ymdh = (
            s.dt.year * 1000000 + s.dt.month * 10000 + s.dt.day * 100 + s.dt.hour
        ).astype(np.int64)
        df = pd.DataFrame(
            {"event_type": batch["event_type"].to_numpy(zero_copy_only=False), "ymdh": ymdh}
        )
        g = df.groupby(["event_type", "ymdh"], as_index=False).size()
        return g.rename(columns={"size": "n_events"})

    from ..stages.shuffle import bucketed_group_apply

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["event_type", "ymdh"], as_index=False).agg(
            n_events=("n_events", "sum")
        )

    out = ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return bucketed_group_apply(out, ["event_type", "ymdh"], final, final, n_buckets=16)


EVENTS_HOURLY_SQL = """
SELECT event_type,
       CAST(YEAR(ts)*1000000 + MONTH(ts)*10000 + DAY(ts)*100 + HOUR(ts) AS BIGINT) AS ymdh,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events GROUP BY 1, 2
"""

PIVOT_TYPES = ["click", "error", "purchase", "signup", "view"]


def events_daily_pivot(sf_dir: str, types: list[str] = PIVOT_TYPES) -> "ray.data.Dataset":
    """(ymd, n_click, n_error, n_purchase, n_signup, n_view) — PIVOT: one row
    per day with a count column per event type (conditional aggregation).

    Per-block partial: vectorized crosstab (groupby day × type, unstacked to
    the fixed column set — unknown types are ignored, so the schema is stable
    regardless of which types a block contains). Final: tiny per-day sum of
    the partials behind one exchange on the day key. Output is |days| rows —
    the wide step shrinks to the partial table immediately."""
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])
    cols = [f"n_{t}" for t in types]

    def partial(batch: pa.Table) -> pd.DataFrame:
        s = pd.Series(batch["ts"].to_numpy(zero_copy_only=False))
        ymd = (s.dt.year * 10000 + s.dt.month * 100 + s.dt.day).astype(np.int64)
        df = pd.DataFrame(
            {"ymd": ymd, "event_type": batch["event_type"].to_numpy(zero_copy_only=False)}
        )
        g = df.groupby(["ymd", "event_type"]).size().unstack(fill_value=0)
        g = g.reindex(columns=types, fill_value=0)
        g.columns = cols
        return g.reset_index().astype(np.int64)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("ymd", as_index=False)[cols].sum().astype(np.int64)

    from ..stages.shuffle import bucketed_group_apply

    out = ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return bucketed_group_apply(out, ["ymd"], final, final, n_buckets=8)


EVENTS_DAILY_PIVOT_SQL = """
SELECT CAST(YEAR(ts)*10000 + MONTH(ts)*100 + DAY(ts) AS BIGINT) AS ymd,
       CAST(COUNT(*) FILTER (WHERE event_type = 'click')    AS BIGINT) AS n_click,
       CAST(COUNT(*) FILTER (WHERE event_type = 'error')    AS BIGINT) AS n_error,
       CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
       CAST(COUNT(*) FILTER (WHERE event_type = 'signup')   AS BIGINT) AS n_signup,
       CAST(COUNT(*) FILTER (WHERE event_type = 'view')     AS BIGINT) AS n_view
FROM events GROUP BY 1
"""

def orders_cube(sf_dir: str) -> pd.DataFrame:
    """(year, o_orderstatus, n_orders, total_cents) — GROUP BY CUBE: all four
    grouping sets (year × status, year, status, grand total); sentinel -1 /
    'ALL' instead of NULL so value hashing is null-free on both sides.

    Scale shape mirrors orders_rollup: one distributed partial pass + one
    small exchange produce the finest (year, status) aggregate — bounded by
    |years| × |statuses| regardless of input size — and the three coarser
    cube levels re-aggregate THAT table driver-side, no second input scan."""
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderdate", "o_orderstatus", "o_totalprice"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        s = pd.Series(batch["o_orderdate"].to_numpy(zero_copy_only=False))
        df = pd.DataFrame({
            "year": s.dt.year.astype(np.int64),
            "o_orderstatus": batch["o_orderstatus"].to_numpy(zero_copy_only=False),
            "cents": _cents(batch["o_totalprice"]).to_numpy(),
        })
        return df.groupby(["year", "o_orderstatus"], as_index=False).agg(
            n_orders=("cents", "size"), total_cents=("cents", "sum"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["year", "o_orderstatus"], as_index=False).agg(
            n_orders=("n_orders", "sum"), total_cents=("total_cents", "sum"))

    from ..stages.shuffle import bucketed_group_apply

    detail = bucketed_group_apply(
        orders.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["year", "o_orderstatus"], final, final, n_buckets=8,
    ).to_pandas()

    def _coarse(keys: list[str]) -> pd.DataFrame:
        g = detail.groupby(keys, as_index=False).agg(
            n_orders=("n_orders", "sum"), total_cents=("total_cents", "sum"))
        if "year" not in keys:
            g["year"] = -1
        if "o_orderstatus" not in keys:
            g["o_orderstatus"] = "ALL"
        return g

    grand = pd.DataFrame({
        "year": [-1], "o_orderstatus": ["ALL"],
        "n_orders": [detail["n_orders"].sum()],
        "total_cents": [detail["total_cents"].sum()],
    })
    out = pd.concat(
        [detail, _coarse(["year"]), _coarse(["o_orderstatus"]), grand],
        ignore_index=True)
    for c in ("year", "n_orders", "total_cents"):
        out[c] = out[c].astype(np.int64)
    return out[["year", "o_orderstatus", "n_orders", "total_cents"]]


ORDERS_CUBE_SQL = """
SELECT CAST(COALESCE(y, -1) AS BIGINT) AS year,
       COALESCE(s, 'ALL') AS o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM (SELECT YEAR(o_orderdate) AS y, o_orderstatus AS s, o_totalprice
      FROM orders)
GROUP BY CUBE(y, s)
"""


def customer_year_setops(sf_dir: str) -> "ray.data.Dataset":
    """(o_custkey, op) — distributed INTERSECT / EXCEPT: customers who ordered
    in 1995 and/or 1996, classified 'both' / 'y1995_only' / 'y1996_only'.

    Set membership is computed as two boolean partials per block (max is the
    associative combine), so the exchange moves at most one row per (customer,
    block) — never the order rows themselves. One exchange on o_custkey; the
    final per-bucket pass ORs the flags and emits the set-op class."""
    from ..stages.shuffle import bucketed_group_apply

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    )

    def part(df: pd.DataFrame) -> pd.DataFrame:
        yr = df["o_orderdate"].dt.year
        m = yr.isin([1995, 1996])
        out = pd.DataFrame(
            {
                "o_custkey": df["o_custkey"][m],
                "a": (yr[m] == 1995).astype(np.int64),
                "b": (yr[m] == 1996).astype(np.int64),
            }
        )
        return out.groupby("o_custkey", as_index=False).agg(
            a=("a", "max"), b=("b", "max")
        )

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_custkey", as_index=False).agg(a=("a", "max"), b=("b", "max"))
        op = np.where(
            (g["a"] == 1) & (g["b"] == 1),
            "both",
            np.where(g["a"] == 1, "y1995_only", "y1996_only"),
        )
        return pd.DataFrame({"o_custkey": g["o_custkey"], "op": op}).astype(
            {"op": "string"}
        )

    return bucketed_group_apply(ds, ["o_custkey"], part, fin)


def props_k_stats(sf_dir: str) -> "ray.data.Dataset":
    """(event_type, n, sum_k, max_k) — aggregate over a field extracted from
    the semi-structured ``props`` JSON column.

    Extraction is a vectorized RE2 fast-path for the flat integer field
    (pc.extract_regex — no per-row json.loads in the hot loop; equivalence
    with a real JSON parser is pinned by tests). Partial aggregates per block,
    one tiny exchange on event_type."""
    from ..stages.shuffle import bucketed_group_apply

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"]
    )

    def part(batch: pa.Table) -> pd.DataFrame:
        ex = pc.extract_regex(batch["props"], pattern=r'"k":\s*(?P<k>-?\d+)')
        k = pc.struct_field(ex, "k").cast(pa.int64())
        if k.null_count:
            raise ValueError("props row without an integer 'k' field")
        df = pd.DataFrame(
            {
                "event_type": batch["event_type"].to_pandas(),
                "k": k.to_pandas(),
            }
        )
        return df.groupby("event_type", as_index=False).agg(
            n=("k", "size"), sum_k=("k", "sum"), max_k=("k", "max")
        )

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("event_type", as_index=False).agg(
            n=("n", "sum"), sum_k=("sum_k", "sum"), max_k=("max_k", "max")
        )

    return bucketed_group_apply(
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type"],
        lambda df: df,
        fin,
        n_buckets=4,
    )


def revenue_mom_growth(sf_dir: str) -> pd.DataFrame:
    """(ym, rev_cents, prev_cents, growth_e9) — month-over-month revenue
    growth: each calendar month's revenue, the previous month's, and the
    relative change as an e9 fixed point (first month / non-positive prev
    → −1).

    Aggregated-LAG shape: the heavy work is the same month-domain-bounded
    partial pass as :func:`orders_running_total` (every block collapses to
    O(|months|) rows, one tiny combine); the LAG itself runs on the
    domain-sized month table on the driver — a window function whose
    partition count, not the row count, is the cost. Growth uses Python-int
    division with DuckDB's truncate-toward-zero semantics exactly."""
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )

    def partial(batch: pa.Table) -> pd.DataFrame:
        s = pd.Series(batch["o_orderdate"].to_numpy(zero_copy_only=False))
        out = pd.DataFrame(
            {
                "ym": (s.dt.year * 100 + s.dt.month).astype(np.int64),
                "rev_cents": np.rint(
                    batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
                ).astype(np.int64),
            }
        )
        return out.groupby("ym", as_index=False).agg(rev_cents=("rev_cents", "sum"))

    months = (
        orders.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()  # O(blocks × |months|) — month-domain-bounded
        .groupby("ym", as_index=False)
        .agg(rev_cents=("rev_cents", "sum"))
        .sort_values("ym")
        .reset_index(drop=True)
    )
    prev_cents: list[int] = []
    growth: list[int] = []
    prev = -1
    for rev in months["rev_cents"].tolist():
        rev = int(rev)
        prev_cents.append(prev)
        if prev > 0:
            num = (rev - prev) * 10**9
            # DuckDB's integer `/`//`` truncates toward zero on a negative
            # numerator; Python floors — mirror truncation exactly
            growth.append(num // prev if num >= 0 else -((-num) // prev))
        else:
            growth.append(-1)
        prev = rev
    months["prev_cents"] = np.asarray(prev_cents, dtype=np.int64)
    months["growth_e9"] = np.asarray(growth, dtype=np.int64)
    return months


REVENUE_MOM_GROWTH_SQL = """
WITH m AS (SELECT year(o_orderdate) * 100 + month(o_orderdate) AS ym,
                  SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_cents
           FROM orders GROUP BY 1),
l AS (SELECT ym, rev_cents,
             LAG(rev_cents) OVER (ORDER BY ym) AS prev FROM m)
SELECT CAST(ym AS BIGINT) AS ym, rev_cents,
       CAST(COALESCE(prev, -1) AS BIGINT) AS prev_cents,
       CAST(CASE WHEN prev IS NULL OR prev <= 0 THEN -1
                 ELSE ((rev_cents - prev) * 1000000000) // prev
            END AS BIGINT) AS growth_e9
FROM l
"""


def snapshot_diff(sf_dir: str) -> "ray.data.Dataset":
    """(o_orderkey, status, a_cents, b_cents) — CDC-style table diff between
    two deterministic snapshots of ``orders``: A omits keys ≡0 (mod 7),
    B omits keys ≡1 and bumps the price of keys ≡2 by one dollar. Output is
    only the differences — ``added`` (B-only), ``removed`` (A-only),
    ``changed`` (both, different value) — with −1 for a missing side.

    One tagged exchange on the key: the map side derives both snapshots'
    rows from a single scan (a real diff would read two snapshot tables into
    the same exchange — or, co-bucketed via stages/bucketed.py layouts,
    skip the exchange entirely); each key lands whole in one reducer, which
    outer-merges the ≤2 rows per key locally and keeps the mismatches. Rows
    leaving the exchange are ≤2× the table; the output is diff-sized."""
    from ..stages.shuffle import bucketed_group_apply

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )

    def part(df: pd.DataFrame) -> pd.DataFrame:
        k = df["o_orderkey"].to_numpy(np.int64)
        v = np.rint(df["o_totalprice"].to_numpy() * 100.0).astype(np.int64)
        m = k % 7
        a_mask = m != 0
        b_mask = m != 1
        bv = v + np.where(m == 2, 100, 0)
        return pd.DataFrame(
            {
                "o_orderkey": np.concatenate([k[a_mask], k[b_mask]]),
                "side": np.concatenate(
                    [
                        np.zeros(int(a_mask.sum()), np.int64),
                        np.ones(int(b_mask.sum()), np.int64),
                    ]
                ),
                "v": np.concatenate([v[a_mask], bv[b_mask]]),
            }
        )

    _EMPTY = pd.DataFrame(
        {
            "o_orderkey": pd.Series(dtype=np.int64),
            "status": pd.Series(dtype=object),
            "a_cents": pd.Series(dtype=np.int64),
            "b_cents": pd.Series(dtype=np.int64),
        }
    )

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return _EMPTY.copy()
        a = df[df["side"] == 0][["o_orderkey", "v"]].rename(columns={"v": "a_cents"})
        b = df[df["side"] == 1][["o_orderkey", "v"]].rename(columns={"v": "b_cents"})
        m = a.merge(b, on="o_orderkey", how="outer")
        a_c, b_c = m["a_cents"], m["b_cents"]
        keep = (a_c.isna() | b_c.isna() | (a_c != b_c)).to_numpy()
        out = pd.DataFrame(
            {
                "o_orderkey": m["o_orderkey"].to_numpy(np.int64),
                "status": np.where(
                    a_c.isna(), "added", np.where(b_c.isna(), "removed", "changed")
                ),
                "a_cents": a_c.fillna(-1).astype(np.int64),
                "b_cents": b_c.fillna(-1).astype(np.int64),
            }
        )[keep]
        return out.reset_index(drop=True)

    return bucketed_group_apply(orders, ["o_orderkey"], part, fin)


SNAPSHOT_DIFF_SQL = """
WITH a AS (SELECT o_orderkey AS k, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v
           FROM orders WHERE o_orderkey % 7 <> 0),
b AS (SELECT o_orderkey AS k,
             CAST(ROUND(o_totalprice * 100) AS BIGINT)
               + CASE WHEN o_orderkey % 7 = 2 THEN 100 ELSE 0 END AS v
      FROM orders WHERE o_orderkey % 7 <> 1)
SELECT CAST(COALESCE(a.k, b.k) AS BIGINT) AS o_orderkey,
       CASE WHEN a.k IS NULL THEN 'added'
            WHEN b.k IS NULL THEN 'removed'
            ELSE 'changed' END AS status,
       CAST(COALESCE(a.v, -1) AS BIGINT) AS a_cents,
       CAST(COALESCE(b.v, -1) AS BIGINT) AS b_cents
FROM a FULL OUTER JOIN b ON a.k = b.k
WHERE a.k IS NULL OR b.k IS NULL OR a.v <> b.v
"""


def revenue_share_by_nation(sf_dir: str) -> pd.DataFrame:
    """(n_name, revenue_cents, share_e9) — ratio-to-report window: each
    nation's revenue and its exact integer share of the global total
    (rev·10⁹ // Σrev). One pass: the nation-domain-bounded aggregate from
    :func:`revenue_by_nation` lands on the driver, where the total and the
    per-row ratio are Python-int exact; nothing global is recomputed."""
    agg = revenue_by_nation(sf_dir).to_pandas()  # |nations|-bounded
    total = int(agg["revenue_cents"].sum())
    share = [int(r) * 10**9 // total for r in agg["revenue_cents"]]
    return pd.DataFrame(
        {
            "n_name": agg["n_name"],
            "revenue_cents": agg["revenue_cents"].astype(np.int64),
            "share_e9": np.asarray(share, dtype=np.int64),
        }
    ).sort_values("n_name").reset_index(drop=True)


REVENUE_SHARE_BY_NATION_SQL = """
WITH r AS (SELECT n_name,
                  SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS revenue_cents
           FROM orders
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           GROUP BY n_name)
SELECT n_name, CAST(revenue_cents AS BIGINT) AS revenue_cents,
       CAST(revenue_cents * 1000000000 // SUM(revenue_cents) OVER ()
            AS BIGINT) AS share_e9
FROM r
"""


def revenue_by_balance_decile(sf_dir: str) -> pd.DataFrame:
    """(decile, n_orders, revenue_cents) — orders aggregated by the balance
    decile of their customer: bucketize-by-learned-thresholds then
    join-through-aggregate (the feature-binning step of a training pipeline).

    Three cheap distributed passes: exact percentile_disc deciles of
    c_acctbal via the histogram rank-refinement operator (no sort), then a
    broadcast customer→decile map (dimension-sized; swap for a hash join at
    corpus-sized dimensions) applied inside the streamed orders aggregation.
    Thresholds are actual data values, so both engines compare identical
    doubles — no epsilon."""
    import pyarrow.parquet as pq

    from ..stages.stats import exact_group_quantiles

    cust_ds = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                    columns=["c_acctbal"])
    qs = [i / 10.0 for i in range(1, 10)]
    qdf = exact_group_quantiles(cust_ds, "c_acctbal", None, qs)
    thr = np.array([float(qdf.iloc[0][f"p{int(q * 100)}"]) for q in qs])

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_acctbal"])
    bal = cust["c_acctbal"].to_numpy()
    dec = 1 + (bal[:, None] > thr[None, :]).sum(axis=1).astype(np.int64)
    c2d = dict(zip(cust["c_custkey"].to_pylist(), dec.tolist()))
    ref = ray.put(c2d)

    def partial(batch: pa.Table) -> pd.DataFrame:
        m = ray.get(ref)
        df = pd.DataFrame(
            {
                "decile": [m[c] for c in batch["o_custkey"].to_pylist()],
                "cents": _cents(batch["o_totalprice"]).to_numpy(),
            }
        )
        return df.groupby("decile", as_index=False).agg(
            n_orders=("cents", "size"), revenue_cents=("cents", "sum"))

    parts = (ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_custkey", "o_totalprice"])
             .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
             .to_pandas())  # ≤10 rows per block
    out = (parts.groupby("decile", as_index=False)
           .agg(n_orders=("n_orders", "sum"),
                revenue_cents=("revenue_cents", "sum"))
           .sort_values("decile").reset_index(drop=True))
    return out.astype({"decile": np.int64, "n_orders": np.int64,
                       "revenue_cents": np.int64})


REVENUE_BY_BALANCE_DECILE_SQL = """
WITH t AS (SELECT
    percentile_disc(0.1) WITHIN GROUP (ORDER BY c_acctbal) AS t1,
    percentile_disc(0.2) WITHIN GROUP (ORDER BY c_acctbal) AS t2,
    percentile_disc(0.3) WITHIN GROUP (ORDER BY c_acctbal) AS t3,
    percentile_disc(0.4) WITHIN GROUP (ORDER BY c_acctbal) AS t4,
    percentile_disc(0.5) WITHIN GROUP (ORDER BY c_acctbal) AS t5,
    percentile_disc(0.6) WITHIN GROUP (ORDER BY c_acctbal) AS t6,
    percentile_disc(0.7) WITHIN GROUP (ORDER BY c_acctbal) AS t7,
    percentile_disc(0.8) WITHIN GROUP (ORDER BY c_acctbal) AS t8,
    percentile_disc(0.9) WITHIN GROUP (ORDER BY c_acctbal) AS t9
  FROM customer),
d AS (SELECT c_custkey,
             1 + CAST(c_acctbal > t.t1 AS INT) + CAST(c_acctbal > t.t2 AS INT)
               + CAST(c_acctbal > t.t3 AS INT) + CAST(c_acctbal > t.t4 AS INT)
               + CAST(c_acctbal > t.t5 AS INT) + CAST(c_acctbal > t.t6 AS INT)
               + CAST(c_acctbal > t.t7 AS INT) + CAST(c_acctbal > t.t8 AS INT)
               + CAST(c_acctbal > t.t9 AS INT) AS decile
      FROM customer, t)
SELECT CAST(decile AS BIGINT) AS decile, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders JOIN d ON o_custkey = d.c_custkey
GROUP BY decile
"""


def above_nation_avg(sf_dir: str) -> "ray.data.Dataset":
    """(c_custkey, c_name, c_nationkey, acctbal_cents) — customers whose
    balance strictly exceeds their nation's average: the correlated-subquery
    shape, decorrelated into one tiny group aggregate + a broadcast filter.

    The per-nation (Σcents, count) pairs — nation-domain-bounded — are
    computed in one streamed partial-sum pass and broadcast; the filter then
    streams the big side with the exact integer cross-multiplication
    ``cents·n > Σcents`` (no float averages, no epsilon on either engine).
    At corpus-sized group domains the broadcast swaps for a hash join on the
    group key — same plan shape."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal"],
    )

    def part(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["c_acctbal"].to_numpy(np.float64) * 100).astype(np.int64)
        out = pd.DataFrame({"k": df["c_nationkey"].astype(np.int64), "s": cents})
        g = out.groupby("k", as_index=False).agg(s=("s", "sum"), n=("s", "size"))
        return g

    stats = (
        ds.map_batches(part, batch_format="pandas")
        .to_pandas()
        .groupby("k", as_index=False)
        .agg(s=("s", "sum"), n=("n", "sum"))
    )
    # dense-index the nation domain so the filter is pure fancy indexing
    kmax = int(stats["k"].max())
    s_arr = np.zeros(kmax + 1, dtype=np.int64)
    n_arr = np.zeros(kmax + 1, dtype=np.int64)
    s_arr[stats["k"].to_numpy(np.int64)] = stats["s"].to_numpy(np.int64)
    n_arr[stats["k"].to_numpy(np.int64)] = stats["n"].to_numpy(np.int64)
    sums_ref = ray.put((s_arr, n_arr))

    def filt(df: pd.DataFrame) -> pd.DataFrame:
        s_a, n_a = ray.get(sums_ref)
        cents = np.rint(df["c_acctbal"].to_numpy(np.float64) * 100).astype(np.int64)
        k = df["c_nationkey"].to_numpy(np.int64)
        s = s_a[k]
        n = n_a[k]
        keep = cents * n > s
        out = df.loc[keep, ["c_custkey", "c_name"]].copy()
        out["c_nationkey"] = k[keep]
        out["acctbal_cents"] = cents[keep]
        return out

    return ds.map_batches(filt, batch_format="pandas")


ABOVE_NATION_AVG_SQL = """
WITH n AS (SELECT c_nationkey,
                  SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS s,
                  CAST(COUNT(*) AS BIGINT) AS k
           FROM customer GROUP BY c_nationkey)
SELECT c.c_custkey, c.c_name, CAST(c.c_nationkey AS BIGINT) AS c_nationkey,
       CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS acctbal_cents
FROM customer c JOIN n USING (c_nationkey)
WHERE CAST(ROUND(c.c_acctbal * 100) AS BIGINT) * n.k > n.s
"""


def events_unpivot(sf_dir: str) -> "ray.data.Dataset":
    """(ymd, event_type, n) — UNPIVOT/melt: the wide daily pivot folded back
    to long form, one row per (day, type) with n > 0. Round-trips the PIVOT
    operator: melt is row-local (each wide row explodes to ≤ |types| long
    rows in place), so the only exchange is the one already inside
    events_daily_pivot."""
    wide = events_daily_pivot(sf_dir)

    def melt(df: pd.DataFrame) -> pd.DataFrame:
        long = df.melt(id_vars=["ymd"], var_name="event_type", value_name="n")
        long["event_type"] = long["event_type"].str.removeprefix("n_")
        long = long[long["n"] > 0]
        return long.astype({"ymd": np.int64, "n": np.int64})

    return wide.map_batches(melt, batch_format="pandas")


EVENTS_UNPIVOT_SQL = """
SELECT CAST(YEAR(ts)*10000 + MONTH(ts)*100 + DAY(ts) AS BIGINT) AS ymd,
       event_type, CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY 1, 2
"""


_BOX_PRICE = (50_000.0, 150_000.0)
_BOX_CUST = (10.0, 60.0)


def orders_box_probe(sf_dir: str) -> pd.DataFrame:
    """(o_orderstatus, n_orders, sum_cents) for a 2-D box predicate
    (totalprice × custkey), answered THROUGH a Z-order layout: orders are
    rewritten once as Morton-clustered zone-mapped parquet
    (:func:`~..stages.layout.write_zorder`) and the box read opens only the
    files whose 2-D envelope intersects — the multi-column analogue of the
    sorted/zone-map layout query. The aggregate is integer-exact cents.

    At 100 TB the write is a one-time layout job (one histogram pass + one
    order-preserving exchange) amortized over every subsequent box probe;
    here it runs inline so the oracle exercises the full write→prune→read
    path every time."""
    import tempfile

    from ..stages.layout import read_pruned_box, write_zorder

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderstatus", "o_custkey", "o_totalprice"])
    out_dir = tempfile.mkdtemp(prefix="zorder_orders_")
    write_zorder(ds, "o_totalprice", "o_custkey", out_dir, n_files=16)
    box = read_pruned_box(out_dir, _BOX_PRICE[0], _BOX_PRICE[1],
                          _BOX_CUST[0], _BOX_CUST[1])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"o_orderstatus": pd.Series(dtype=object),
                                 "n_orders": pd.Series(dtype=np.int64),
                                 "sum_cents": pd.Series(dtype=np.int64)})
        cents = np.rint(df["o_totalprice"].to_numpy(np.float64) * 100.0
                        ).astype(np.int64)
        out = pd.DataFrame({"o_orderstatus": df["o_orderstatus"],
                            "cents": cents})
        return out.groupby("o_orderstatus", as_index=False).agg(
            n_orders=("cents", "size"), sum_cents=("cents", "sum"))

    parts = box.map_batches(partial, batch_format="pandas").to_pandas()
    out = parts.groupby("o_orderstatus", as_index=False).agg(
        n_orders=("n_orders", "sum"), sum_cents=("sum_cents", "sum"))
    return (out.sort_values("o_orderstatus").reset_index(drop=True)
            .astype({"n_orders": np.int64, "sum_cents": np.int64}))


ORDERS_BOX_PROBE_SQL = f"""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS sum_cents
FROM orders
WHERE o_totalprice BETWEEN {_BOX_PRICE[0]} AND {_BOX_PRICE[1]}
  AND o_custkey BETWEEN {_BOX_CUST[0]} AND {_BOX_CUST[1]}
GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def revenue_rollup(sf_dir: str) -> pd.DataFrame:
    """(n_name, o_year, lvl, n_orders, revenue_cents) — GROUP BY
    ROLLUP(nation, year): the (nation, year) grain plus the per-nation and
    grand-total subtotal levels, integer-exact money. ``lvl`` is the standard
    grouping id (0 = finest, 1 = nation subtotal, 3 = grand total); rolled-up
    dimensions render as 'ALL' / 0.

    Dataflow: the rollup lattice NEVER needs extra passes — one broadcast
    dimension lookup + per-batch partial aggregation produces the finest
    grain (nations × years, domain-bounded), and every coarser level is a
    re-aggregation of that tiny table on the driver. At 100 TB the single
    streamed pass over orders is the only corpus-sized work."""
    import pyarrow.parquet as pq

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    nk = dict(zip(nation["n_nationkey"].to_pylist(),
                  nation["n_name"].to_pylist()))
    c2n = {c: nk[n] for c, n in zip(cust["c_custkey"].to_pylist(),
                                    cust["c_nationkey"].to_pylist())}
    ref = ray.put(c2n)

    def partial(batch: pa.Table) -> pd.DataFrame:
        m = ray.get(ref)
        df = pd.DataFrame({
            "n_name": [m[c] for c in batch["o_custkey"].to_pylist()],
            "o_year": pc.year(batch["o_orderdate"]).to_numpy(
                zero_copy_only=False).astype(np.int64),
            "cents": _cents(batch["o_totalprice"]).to_numpy(),
        })
        return df.groupby(["n_name", "o_year"], as_index=False).agg(
            n_orders=("cents", "size"), revenue_cents=("cents", "sum"))

    fine = (ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .groupby(["n_name", "o_year"], as_index=False)
        .agg(n_orders=("n_orders", "sum"),
             revenue_cents=("revenue_cents", "sum")))

    fine["lvl"] = np.int64(0)
    by_nation = fine.groupby("n_name", as_index=False).agg(
        n_orders=("n_orders", "sum"), revenue_cents=("revenue_cents", "sum"))
    by_nation["o_year"] = np.int64(0)
    by_nation["lvl"] = np.int64(1)
    total = pd.DataFrame({
        "n_name": ["ALL"], "o_year": np.array([0], dtype=np.int64),
        "lvl": np.array([3], dtype=np.int64),
        "n_orders": np.array([fine["n_orders"].sum()], dtype=np.int64),
        "revenue_cents": np.array([fine["revenue_cents"].sum()],
                                  dtype=np.int64)})
    cols = ["n_name", "o_year", "lvl", "n_orders", "revenue_cents"]
    out = pd.concat([fine[cols], by_nation[cols], total[cols]],
                    ignore_index=True)
    out = out.astype({"o_year": np.int64, "lvl": np.int64,
                      "n_orders": np.int64, "revenue_cents": np.int64})
    return (out.sort_values(["lvl", "n_name", "o_year"])
            .reset_index(drop=True))


REVENUE_ROLLUP_SQL = """
WITH base AS (
  SELECT n_name,
         CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey)
SELECT COALESCE(n_name, 'ALL') AS n_name,
       COALESCE(o_year, 0) AS o_year,
       CAST(GROUPING(n_name) * 2 + GROUPING(o_year) AS BIGINT) AS lvl,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS revenue_cents
FROM base GROUP BY ROLLUP(n_name, o_year)
ORDER BY lvl, n_name, o_year
"""


_Q3_DATE = "1995-03-15"
_Q3_SEGMENT = "BUILDING"


def q3_shipping_priority(sf_dir: str) -> pd.DataFrame:
    """(l_orderkey, revenue_de4, o_orderdate) — TPC-H Q3 shape adapted to the
    testdata schema (no o_shippriority column): top-10 unshipped orders of
    one market segment by discounted revenue, integer-exact money
    (cents × (10000 − discount_bp), the q1 convention).

    Both joins are BIG-BIG at corpus scale, so neither side broadcasts:
    (1) orders ⋈ building-segment customers through the tagged one-exchange
    hash join; (2) lineitem partials — pre-aggregated per orderkey INSIDE the
    scan batch before anything moves — union the order rows through ONE
    exchange on orderkey, and each reducer finishes the per-order revenue and
    keeps only its local top-10, so the driver ranks n_buckets × 10 rows."""
    from ..stages.shuffle import arrow_group_agg, hash_exchange_apply

    cutoff = np.datetime64(_Q3_DATE, "us")

    from ..sources.tables import read_table

    cust = read_table(
        sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]
    ).map_batches(
        lambda t: t.filter(pc.equal(t["c_mktsegment"], _Q3_SEGMENT))
        .select(["c_custkey"]),
        batch_format="pyarrow", zero_copy_batch=True)

    def orders_f(t: pa.Table) -> pa.Table:
        return t.filter(pc.less(t["o_orderdate"], pa.scalar(cutoff))).select(
            ["o_orderkey", "o_custkey", "o_orderdate"])

    orders = read_table(
        sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(orders_f, batch_format="pyarrow", zero_copy_batch=True)

    # bloom-pruned: the building-segment customer side is selective (~1/5 of
    # customers), so probe orders that can never match are dropped at the map
    # side instead of crossing the exchange — at 100 TB this cuts the phase-1
    # exchange to the matching-order stream
    from ..stages.join import hash_join_bloom

    obld = hash_join_bloom(orders, cust, "o_custkey", "c_custkey",
                           ["o_orderkey", "o_custkey", "o_orderdate"],
                           ["c_custkey"], n_buckets=16)

    def li_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"], pa.scalar(cutoff)))
        cents = _cents(t["l_extendedprice"])
        bp = pc.round(pc.multiply(t["l_discount"], 10000)).cast(pa.int64())
        rev = pc.multiply(cents, pc.subtract(pa.scalar(10000, pa.int64()), bp))
        g = arrow_group_agg(
            pa.table({"l_orderkey": t["l_orderkey"], "rev": rev}),
            ["l_orderkey"], [("rev", "sum")])
        n = g.num_rows
        return g.append_column("__side", pa.array(["li"] * n)).append_column(
            "__key", g["l_orderkey"].cast(pa.int64()).combine_chunks())

    li = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]
    ).map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True)

    def ob_view(t: pa.Table) -> pa.Table:
        # hash_join may emit float-upcast keys out of empty buckets — pin
        # int64 so both sides' __key agree (the exchange hashes ints natively)
        ok = t["o_orderkey"].cast(pa.int64()).combine_chunks()
        return pa.table({"l_orderkey": ok, "o_orderdate": t["o_orderdate"],
                         "__side": pa.array(["o"] * len(ok)), "__key": ok})

    ob = obld.map_batches(ob_view, batch_format="pyarrow", zero_copy_batch=True)

    _q3_schema = pa.schema([("l_orderkey", pa.int64()),
                            ("revenue_de4", pa.int64()),
                            ("o_orderdate", pa.timestamp("us"))])

    def final(t: pa.Table) -> pa.Table:
        # all-arrow bucket reduce: the exchange concat promotes the two
        # sides' schemas (missing cols null-filled), so split on __side
        if t.num_rows == 0 or "__side" not in t.column_names:
            return _q3_schema.empty_table()
        lt = t.filter(pc.equal(t["__side"], "li"))
        ot = t.filter(pc.equal(t["__side"], "o"))
        if lt.num_rows == 0 or ot.num_rows == 0:
            return _q3_schema.empty_table()
        rev = arrow_group_agg(
            pa.table({"l_orderkey": lt["l_orderkey"].cast(pa.int64()),
                      "revenue_de4": lt["rev"].cast(pa.int64())}),
            ["l_orderkey"], [("revenue_de4", "sum")])
        dates = arrow_group_agg(
            pa.table({"l_orderkey": ot["l_orderkey"].cast(pa.int64()),
                      "o_orderdate": ot["o_orderdate"].cast(pa.timestamp("us"))}),
            ["l_orderkey"], [("o_orderdate", "min")])  # dedup (dates equal per key)
        out = rev.join(dates, keys="l_orderkey", join_type="inner")
        idx = pc.sort_indices(out, sort_keys=[("revenue_de4", "descending"),
                                              ("l_orderkey", "ascending")])
        return out.take(idx[:10]).select(
            ["l_orderkey", "revenue_de4", "o_orderdate"])

    parts = hash_exchange_apply(li.union(ob), ["__key"], lambda t: t,
                                final, n_buckets=16).to_pandas()
    if "revenue_de4" not in parts.columns:  # all-empty → schema-less
        return pd.DataFrame({"l_orderkey": pd.Series(dtype=np.int64),
                             "revenue_de4": pd.Series(dtype=np.int64),
                             "o_orderdate": pd.Series(dtype="datetime64[us]")})
    out = parts.sort_values(["revenue_de4", "l_orderkey"],
                            ascending=[False, True]).head(10)
    return out.reset_index(drop=True)[["l_orderkey", "revenue_de4",
                                       "o_orderdate"]]


Q3_SHIPPING_PRIORITY_SQL = f"""
SELECT l_orderkey,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                * (10000 - CAST(ROUND(l_discount * 10000) AS BIGINT)))
            AS BIGINT) AS revenue_de4,
       o_orderdate
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = '{_Q3_SEGMENT}'
  AND o_orderdate < TIMESTAMP '{_Q3_DATE} 00:00:00'
  AND l_shipdate > TIMESTAMP '{_Q3_DATE} 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue_de4 DESC, l_orderkey LIMIT 10
"""


_Q4_LO = "1995-07-01"  # testdata order dates start 1995-01-01
_Q4_HI = "1995-10-01"


def q4_order_priority(sf_dir: str) -> pd.DataFrame:
    """(o_orderpriority, n_orders) — TPC-H Q4 shape adapted to the testdata
    schema (no commit/receipt dates): orders of one quarter that have at
    least one RETURNED lineitem (l_returnflag = 'R'), counted by priority.

    The EXISTS is a big-big SEMI-JOIN: lineitem collapses to distinct
    returned orderkeys inside each scan batch (key-only partials), unions
    with the quarter's order rows through ONE exchange on orderkey, and each
    reducer emits |priorities|-bounded counts — the driver sums ≤
    n_buckets × |priorities| rows."""
    from ..stages.shuffle import arrow_group_agg, hash_exchange_apply

    lo = np.datetime64(_Q4_LO, "us")
    hi = np.datetime64(_Q4_HI, "us")

    def orders_f(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
                    pc.less(t["o_orderdate"], pa.scalar(hi)))
        t = t.filter(m)
        return pa.table({"k": t["o_orderkey"].cast(pa.int64()),
                         "o_orderpriority": t["o_orderpriority"],
                         "__side": pa.array(["o"] * t.num_rows)})

    def li_keys(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], "R"))
        keys = np.unique(t["l_orderkey"].to_numpy(zero_copy_only=False)
                         .astype(np.int64))
        return pa.table({"k": keys,
                         "o_orderpriority": pa.array([""] * len(keys)),
                         "__side": pa.array(["li"] * len(keys))})

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(orders_f, batch_format="pyarrow", zero_copy_batch=True)
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_returnflag"]
    ).map_batches(li_keys, batch_format="pyarrow", zero_copy_batch=True)

    _q4_schema = pa.schema([("o_orderpriority", pa.string()),
                            ("n_orders", pa.int64())])

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "__side" not in t.column_names:
            return _q4_schema.empty_table()
        ot = t.filter(pc.equal(t["__side"], "o"))
        has = np.unique(t.filter(pc.equal(t["__side"], "li"))["k"]
                        .to_numpy(zero_copy_only=False).astype(np.int64))
        if ot.num_rows == 0 or len(has) == 0:
            return _q4_schema.empty_table()
        ok = ot["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(has, ok)
        keep_mask = (pos < len(has)) & (has[np.minimum(pos, len(has) - 1)] == ok)
        keep = ot.filter(pa.array(keep_mask))
        counted = pa.table({
            "o_orderpriority": keep["o_orderpriority"].cast(pa.string()),
            "n_orders": np.ones(keep.num_rows, dtype=np.int64),
        })
        return arrow_group_agg(counted, ["o_orderpriority"],
                               [("n_orders", "sum")])

    parts = hash_exchange_apply(orders.union(li), ["k"], lambda t: t,
                                final, n_buckets=16).to_pandas()
    if "o_orderpriority" not in parts.columns:  # all-empty → schema-less
        return pd.DataFrame({"o_orderpriority": pd.Series(dtype=object),
                             "n_orders": pd.Series(dtype=np.int64)})
    out = parts.groupby("o_orderpriority", as_index=False).agg(
        n_orders=("n_orders", "sum")).astype({"n_orders": np.int64})
    return out.sort_values("o_orderpriority").reset_index(drop=True)


Q4_ORDER_PRIORITY_SQL = f"""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '{_Q4_LO} 00:00:00'
  AND o_orderdate < TIMESTAMP '{_Q4_HI} 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


_Q5_REGION = "ASIA"
_Q5_LO = "1996-01-01"
_Q5_HI = "1997-01-01"


def q5_local_supplier_volume(sf_dir: str) -> pd.DataFrame:
    """(n_name, revenue_de4) — TPC-H Q5: revenue from lineitems where the
    supplier and the ordering customer share a nation, restricted to one
    region and one order year; integer-exact money (the q1/q3
    cents × (10000 − discount_bp) convention).

    The distinguishing Q5 feature is the TWO-SIDED nation equality
    (c_nationkey = s_nationkey), which needs both the customer's and the
    supplier's nation at the same lineitem row. Plan: nation/region (25/5
    rows) broadcast everywhere; orders ⋈ region-filtered customers through
    the bloom-pruned one-exchange hash join (q3's phase 1 — the big-big
    side); lineitem scan attaches the supplier's nation from the broadcast
    supplier→nation map (suppliers are the catalog-bound dimension here; at
    a scale where supplier outgrows a broadcast the same tagged-union
    exchange on l_suppkey is the documented swap) and pre-aggregates to
    (orderkey, s_nat) partials INSIDE the batch; ONE exchange on orderkey
    joins the two streams, applies the nation equality, and collapses to
    |nations|-bounded (nationkey, revenue) partials per bucket — the driver
    folds n_buckets × 25 rows."""
    import pyarrow.parquet as pq

    from ..sources.tables import read_table
    from ..stages.join import hash_join_bloom
    from ..stages.shuffle import arrow_group_agg, hash_exchange_apply

    lo = np.datetime64(_Q5_LO, "us")
    hi = np.datetime64(_Q5_HI, "us")

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    region = pq.read_table(f"{sf_dir}/region.parquet")
    rk = {r: k for k, r in zip(region["r_regionkey"].to_pylist(),
                               region["r_name"].to_pylist())}[_Q5_REGION]
    asia = {int(nk) for nk, g in zip(nation["n_nationkey"].to_pylist(),
                                     nation["n_regionkey"].to_pylist())
            if g == rk}
    nk_name = dict(zip(nation["n_nationkey"].to_pylist(),
                       nation["n_name"].to_pylist()))

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    sk = supp["s_suppkey"].to_numpy().astype(np.int64)
    sn = supp["s_nationkey"].to_numpy().astype(np.int64)
    lut = np.full(int(sk.max()) + 1, -1, dtype=np.int64)
    lut[sk] = np.where(np.isin(sn, list(asia)), sn, -1)
    lut_ref = ray.put(lut)
    asia_arr = pa.array(sorted(asia), pa.int32())

    cust = read_table(
        sf_dir, "customer", columns=["c_custkey", "c_nationkey"]
    ).map_batches(
        lambda t: t.filter(pc.is_in(t["c_nationkey"], value_set=asia_arr)),
        batch_format="pyarrow", zero_copy_batch=True)

    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: t.filter(pc.and_(
            pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
            pc.less(t["o_orderdate"], pa.scalar(hi))))
        .select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow", zero_copy_batch=True)

    obld = hash_join_bloom(orders, cust, "o_custkey", "c_custkey",
                           ["o_orderkey", "o_custkey"],
                           ["c_custkey", "c_nationkey"], n_buckets=16)

    def ob_view(t: pa.Table) -> pa.Table:
        ok = t["o_orderkey"].cast(pa.int64()).combine_chunks()
        return pa.table({
            "__key": ok,
            "c_nat": t["c_nationkey"].cast(pa.int64()).combine_chunks(),
            "__side": pa.array(["o"] * len(ok)),
        })

    ob = obld.map_batches(ob_view, batch_format="pyarrow", zero_copy_batch=True)

    def li_partial(t: pa.Table) -> pa.Table:
        lv = ray.get(lut_ref)
        skey = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        snat = np.where(skey < len(lv), lv[np.minimum(skey, len(lv) - 1)], -1)
        keep = snat >= 0
        cents = _cents(t["l_extendedprice"]).to_numpy(zero_copy_only=False)
        bp = pc.round(pc.multiply(t["l_discount"], 10000)).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        rev = cents[keep] * (10000 - bp[keep])
        g = arrow_group_agg(
            pa.table({
                "__key": pa.array(
                    t["l_orderkey"].to_numpy(zero_copy_only=False)
                    .astype(np.int64)[keep]),
                "s_nat": pa.array(snat[keep]),
                "rev": pa.array(rev),
            }),
            ["__key", "s_nat"], [("rev", "sum")])
        return g.append_column("__side", pa.array(["li"] * g.num_rows))

    li = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    ).map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True)

    _out_schema = pa.schema([("nationkey", pa.int64()),
                             ("revenue_de4", pa.int64())])

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "__side" not in t.column_names:
            return _out_schema.empty_table()
        lt = t.filter(pc.equal(t["__side"], "li"))
        ot = t.filter(pc.equal(t["__side"], "o"))
        if lt.num_rows == 0 or ot.num_rows == 0:
            return _out_schema.empty_table()
        left = pa.table({"__key": lt["__key"].cast(pa.int64()).combine_chunks(),
                         "s_nat": lt["s_nat"].cast(pa.int64()).combine_chunks(),
                         "rev": lt["rev"].cast(pa.int64()).combine_chunks()})
        right = pa.table({"__key": ot["__key"].cast(pa.int64()).combine_chunks(),
                          "c_nat": ot["c_nat"].cast(pa.int64()).combine_chunks()})
        j = left.join(right, keys="__key", join_type="inner")
        j = j.filter(pc.equal(j["s_nat"], j["c_nat"]))
        return arrow_group_agg(
            pa.table({"nationkey": j["s_nat"],
                      "revenue_de4": j["rev"]}),
            ["nationkey"], [("revenue_de4", "sum")])

    parts = hash_exchange_apply(li.union(ob), ["__key"], lambda t: t,
                                final, n_buckets=16).to_pandas()
    if "nationkey" not in parts.columns:  # all-empty → schema-less
        return pd.DataFrame({"n_name": pd.Series(dtype=object),
                             "revenue_de4": pd.Series(dtype=np.int64)})
    out = parts.groupby("nationkey", as_index=False).agg(
        revenue_de4=("revenue_de4", "sum"))
    out["n_name"] = out["nationkey"].map(nk_name)
    out = out.sort_values(["revenue_de4", "n_name"],
                          ascending=[False, True]).reset_index(drop=True)
    return out[["n_name", "revenue_de4"]].astype({"revenue_de4": np.int64})


Q5_LOCAL_SUPPLIER_VOLUME_SQL = f"""
SELECT n_name,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                * (10000 - CAST(ROUND(l_discount * 10000) AS BIGINT)))
            AS BIGINT) AS revenue_de4
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND r_name = '{_Q5_REGION}'
  AND o_orderdate >= TIMESTAMP '{_Q5_LO} 00:00:00'
  AND o_orderdate < TIMESTAMP '{_Q5_HI} 00:00:00'
GROUP BY n_name
ORDER BY revenue_de4 DESC, n_name
"""


def orders_no_returns(sf_dir: str) -> pd.DataFrame:
    """(o_orderpriority, n_orders) — the ANTI-join twin of
    :func:`q4_order_priority`: orders of the same quarter with ZERO returned
    lineitems (NOT EXISTS), counted by priority. Same one-exchange tagged
    union of key-only distinct returned orderkeys + quarter orders; the
    reducer keeps the orders whose key is ABSENT from the returned set —
    correctness hinges on the empty-probe case (no returned keys in a
    bucket ⇒ every order in that bucket survives), which the semi-join can
    shortcut but the anti-join must not."""
    from ..stages.shuffle import arrow_group_agg, hash_exchange_apply

    lo = np.datetime64(_Q4_LO, "us")
    hi = np.datetime64(_Q4_HI, "us")

    def orders_f(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
                    pc.less(t["o_orderdate"], pa.scalar(hi)))
        t = t.filter(m)
        return pa.table({"k": t["o_orderkey"].cast(pa.int64()),
                         "o_orderpriority": t["o_orderpriority"],
                         "__side": pa.array(["o"] * t.num_rows)})

    def li_keys(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], "R"))
        keys = np.unique(t["l_orderkey"].to_numpy(zero_copy_only=False)
                         .astype(np.int64))
        return pa.table({"k": keys,
                         "o_orderpriority": pa.array([""] * len(keys)),
                         "__side": pa.array(["li"] * len(keys))})

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(orders_f, batch_format="pyarrow", zero_copy_batch=True)
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_returnflag"]
    ).map_batches(li_keys, batch_format="pyarrow", zero_copy_batch=True)

    _schema = pa.schema([("o_orderpriority", pa.string()),
                         ("n_orders", pa.int64())])

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "__side" not in t.column_names:
            return _schema.empty_table()
        ot = t.filter(pc.equal(t["__side"], "o"))
        if ot.num_rows == 0:
            return _schema.empty_table()
        has = np.unique(t.filter(pc.equal(t["__side"], "li"))["k"]
                        .to_numpy(zero_copy_only=False).astype(np.int64))
        ok = ot["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(has) == 0:
            keep = ot  # anti-join: empty probe side keeps EVERY order
        else:
            pos = np.searchsorted(has, ok)
            in_set = (pos < len(has)) & (has[np.minimum(pos, len(has) - 1)] == ok)
            keep = ot.filter(pa.array(~in_set))
        if keep.num_rows == 0:
            return _schema.empty_table()
        counted = pa.table({
            "o_orderpriority": keep["o_orderpriority"].cast(pa.string()),
            "n_orders": np.ones(keep.num_rows, dtype=np.int64),
        })
        return arrow_group_agg(counted, ["o_orderpriority"],
                               [("n_orders", "sum")])

    parts = hash_exchange_apply(orders.union(li), ["k"], lambda t: t,
                                final, n_buckets=16).to_pandas()
    if "o_orderpriority" not in parts.columns:  # all-empty → schema-less
        return pd.DataFrame({"o_orderpriority": pd.Series(dtype=object),
                             "n_orders": pd.Series(dtype=np.int64)})
    out = parts.groupby("o_orderpriority", as_index=False).agg(
        n_orders=("n_orders", "sum")).astype({"n_orders": np.int64})
    return out.sort_values("o_orderpriority").reset_index(drop=True)


ORDERS_NO_RETURNS_SQL = f"""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '{_Q4_LO} 00:00:00'
  AND o_orderdate < TIMESTAMP '{_Q4_HI} 00:00:00'
  AND NOT EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


_Q7_NATION_A = "NATION_1"
_Q7_NATION_B = "NATION_2"
_Q7_LO = "1995-01-01"
_Q7_HI = "1997-01-01"


def q7_volume_shipping(sf_dir: str) -> pd.DataFrame:
    """(supp_nation, cust_nation, l_year, revenue_de4) — TPC-H Q7: trade
    volume between two nations by ship year, both directions (supplier in A
    shipping to customers in B and vice versa); integer-exact money.

    Same plan skeleton as :func:`q5_local_supplier_volume` (the two-sided
    nation predicate needs customer AND supplier nation at the lineitem
    row), with the pair filter applied in the reducer: orders ⋈ two-nation
    customers through the bloom-pruned exchange join; lineitem (ship-date
    windowed) attaches the supplier nation from the broadcast map and
    pre-aggregates (orderkey, s_nat, year) partials in-batch; ONE orderkey
    exchange joins, keeps cross-nation pairs only, and collapses to
    2×|years|-bounded partials."""
    import pyarrow.parquet as pq

    from ..sources.tables import read_table
    from ..stages.join import hash_join_bloom
    from ..stages.shuffle import arrow_group_agg, hash_exchange_apply

    lo = np.datetime64(_Q7_LO, "us")
    hi = np.datetime64(_Q7_HI, "us")

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    name_nk = dict(zip(nation["n_name"].to_pylist(),
                       nation["n_nationkey"].to_pylist()))
    nk_name = {v: k for k, v in name_nk.items()}
    nk_a, nk_b = int(name_nk[_Q7_NATION_A]), int(name_nk[_Q7_NATION_B])
    pair = pa.array([nk_a, nk_b], pa.int32())

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    sk = supp["s_suppkey"].to_numpy().astype(np.int64)
    sn = supp["s_nationkey"].to_numpy().astype(np.int64)
    lut = np.full(int(sk.max()) + 1, -1, dtype=np.int64)
    lut[sk] = np.where(np.isin(sn, [nk_a, nk_b]), sn, -1)
    lut_ref = ray.put(lut)

    cust = read_table(
        sf_dir, "customer", columns=["c_custkey", "c_nationkey"]
    ).map_batches(
        lambda t: t.filter(pc.is_in(t["c_nationkey"], value_set=pair)),
        batch_format="pyarrow", zero_copy_batch=True)

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    obld = hash_join_bloom(orders, cust, "o_custkey", "c_custkey",
                           ["o_orderkey", "o_custkey"],
                           ["c_custkey", "c_nationkey"], n_buckets=16)

    def ob_view(t: pa.Table) -> pa.Table:
        ok = t["o_orderkey"].cast(pa.int64()).combine_chunks()
        return pa.table({
            "__key": ok,
            "c_nat": t["c_nationkey"].cast(pa.int64()).combine_chunks(),
            "__side": pa.array(["o"] * len(ok)),
        })

    ob = obld.map_batches(ob_view, batch_format="pyarrow", zero_copy_batch=True)

    def li_partial(t: pa.Table) -> pa.Table:
        lv = ray.get(lut_ref)
        t = t.filter(pc.and_(
            pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
            pc.less(t["l_shipdate"], pa.scalar(hi))))
        skey = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        snat = np.where(skey < len(lv), lv[np.minimum(skey, len(lv) - 1)], -1)
        keep = snat >= 0
        yr = (t["l_shipdate"].to_numpy(zero_copy_only=False)
              .astype("datetime64[Y]").astype(np.int64) + 1970)
        cents = _cents(t["l_extendedprice"]).to_numpy(zero_copy_only=False)
        bp = pc.round(pc.multiply(t["l_discount"], 10000)).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        rev = cents[keep] * (10000 - bp[keep])
        g = arrow_group_agg(
            pa.table({
                "__key": pa.array(
                    t["l_orderkey"].to_numpy(zero_copy_only=False)
                    .astype(np.int64)[keep]),
                "s_nat": pa.array(snat[keep]),
                "l_year": pa.array(yr[keep]),
                "rev": pa.array(rev),
            }),
            ["__key", "s_nat", "l_year"], [("rev", "sum")])
        return g.append_column("__side", pa.array(["li"] * g.num_rows))

    li = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
                 "l_shipdate"]
    ).map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True)

    _out_schema = pa.schema([("s_nat", pa.int64()), ("c_nat", pa.int64()),
                             ("l_year", pa.int64()),
                             ("revenue_de4", pa.int64())])

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "__side" not in t.column_names:
            return _out_schema.empty_table()
        lt = t.filter(pc.equal(t["__side"], "li"))
        ot = t.filter(pc.equal(t["__side"], "o"))
        if lt.num_rows == 0 or ot.num_rows == 0:
            return _out_schema.empty_table()
        left = pa.table({"__key": lt["__key"].cast(pa.int64()).combine_chunks(),
                         "s_nat": lt["s_nat"].cast(pa.int64()).combine_chunks(),
                         "l_year": lt["l_year"].cast(pa.int64()).combine_chunks(),
                         "rev": lt["rev"].cast(pa.int64()).combine_chunks()})
        right = pa.table({"__key": ot["__key"].cast(pa.int64()).combine_chunks(),
                          "c_nat": ot["c_nat"].cast(pa.int64()).combine_chunks()})
        j = left.join(right, keys="__key", join_type="inner")
        j = j.filter(pc.not_equal(j["s_nat"], j["c_nat"]))  # cross-nation only
        return arrow_group_agg(
            pa.table({"s_nat": j["s_nat"], "c_nat": j["c_nat"],
                      "l_year": j["l_year"], "revenue_de4": j["rev"]}),
            ["s_nat", "c_nat", "l_year"], [("revenue_de4", "sum")])

    parts = hash_exchange_apply(li.union(ob), ["__key"], lambda t: t,
                                final, n_buckets=16).to_pandas()
    if "s_nat" not in parts.columns:  # all-empty → schema-less
        return pd.DataFrame({"supp_nation": pd.Series(dtype=object),
                             "cust_nation": pd.Series(dtype=object),
                             "l_year": pd.Series(dtype=np.int64),
                             "revenue_de4": pd.Series(dtype=np.int64)})
    out = parts.groupby(["s_nat", "c_nat", "l_year"], as_index=False).agg(
        revenue_de4=("revenue_de4", "sum"))
    out["supp_nation"] = out["s_nat"].map(nk_name)
    out["cust_nation"] = out["c_nat"].map(nk_name)
    out = out.sort_values(["supp_nation", "cust_nation", "l_year"]
                          ).reset_index(drop=True)
    return out[["supp_nation", "cust_nation", "l_year", "revenue_de4"]
               ].astype({"l_year": np.int64, "revenue_de4": np.int64})


Q7_VOLUME_SHIPPING_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                * (10000 - CAST(ROUND(l_discount * 10000) AS BIGINT)))
            AS BIGINT) AS revenue_de4
FROM supplier
JOIN lineitem ON s_suppkey = l_suppkey
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = '{_Q7_NATION_A}' AND n2.n_name = '{_Q7_NATION_B}')
    OR (n1.n_name = '{_Q7_NATION_B}' AND n2.n_name = '{_Q7_NATION_A}'))
  AND l_shipdate >= TIMESTAMP '{_Q7_LO} 00:00:00'
  AND l_shipdate < TIMESTAMP '{_Q7_HI} 00:00:00'
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


_Q6_LO = "1996-01-01"
_Q6_HI = "1997-01-01"
_Q6_DISC_LO_BP = 500   # discount in [0.05, 0.07] at 1e4 scale
_Q6_DISC_HI_BP = 700
_Q6_MAX_QTY = 24


def q6_forecast_revenue(sf_dir: str) -> pd.DataFrame:
    """(revenue_de4,) one row — TPC-H Q6 forecasting-revenue-change: the sum
    of l_extendedprice × l_discount over one ship year for small-quantity,
    mid-discount lineitems; integer-exact (cents × discount_bp).

    Pure scan-side map: filters + per-block scalar partials, driver adds
    block sums — no exchange at all, the cheapest plan shape there is (the
    predicate prunes to four columns at the read)."""
    from ..sources.tables import read_table

    lo = np.datetime64(_Q6_LO, "us")
    hi = np.datetime64(_Q6_HI, "us")

    def part(t: pa.Table) -> pa.Table:
        bp = pc.round(pc.multiply(t["l_discount"], 10000)).cast(pa.int64())
        mask = pc.and_(
            pc.and_(pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
                    pc.less(t["l_shipdate"], pa.scalar(hi))),
            pc.and_(
                pc.and_(pc.greater_equal(bp, _Q6_DISC_LO_BP),
                        pc.less_equal(bp, _Q6_DISC_HI_BP)),
                pc.less(t["l_quantity"], _Q6_MAX_QTY)))
        k = t.filter(mask)
        kbp = pc.round(pc.multiply(k["l_discount"], 10000)).cast(pa.int64())
        rev = pc.sum(pc.multiply(_cents(k["l_extendedprice"]), kbp))
        return pa.table({"revenue_de4": pa.array(
            [rev.as_py() if rev.is_valid else 0], pa.int64())})

    parts = read_table(
        sf_dir, "lineitem",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"]
    ).map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    return pd.DataFrame(
        {"revenue_de4": [np.int64(parts["revenue_de4"].sum())]})


Q6_FORECAST_REVENUE_SQL = f"""
SELECT CAST(COALESCE(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                         * CAST(ROUND(l_discount * 10000) AS BIGINT)), 0)
            AS BIGINT) AS revenue_de4
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{_Q6_LO} 00:00:00'
  AND l_shipdate < TIMESTAMP '{_Q6_HI} 00:00:00'
  AND CAST(ROUND(l_discount * 10000) AS BIGINT)
      BETWEEN {_Q6_DISC_LO_BP} AND {_Q6_DISC_HI_BP}
  AND l_quantity < {_Q6_MAX_QTY}
"""


def cheapest_supplier_per_part(sf_dir: str) -> "ray.data.Dataset":
    """(l_partkey, l_suppkey, avg_price_e4) — TPC-H Q2 shape adapted to the
    testdata schema (no partsupp table): for every part, the supplier with
    the lowest average extended price across its lineitems (ties → lowest
    suppkey).

    Two-level grouped argmin at lineitem scale: each scan batch pre-collapses
    to (partkey, suppkey, cents_sum, n) partials — the combiner-before-
    shuffle rule, so the exchange moves one row per (part, supplier, block),
    never raw lineitems; each reducer finishes its partkeys locally. The
    average is the exact integer cents·10⁴//n, so the argmin and the SQL
    oracle compare identical integers (no float boundary)."""
    from ..stages.shuffle import bucketed_group_apply

    def partial(t: pa.Table) -> pd.DataFrame:
        cents = np.rint(t["l_extendedprice"].to_numpy(zero_copy_only=False)
                        * 100.0).astype(np.int64)
        df = pd.DataFrame({
            "l_partkey": t["l_partkey"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "l_suppkey": t["l_suppkey"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "cents": cents,
            "n": np.int64(1),
        })
        return (df.groupby(["l_partkey", "l_suppkey"], as_index=False)
                .agg(cents=("cents", "sum"), n=("n", "sum")))

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice"]
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def argmin(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"l_partkey": pd.Series(dtype=np.int64),
                              "l_suppkey": pd.Series(dtype=np.int64),
                              "avg_price_e4": pd.Series(dtype=np.int64)})
        if df.empty:
            return empty
        g = (df.groupby(["l_partkey", "l_suppkey"], as_index=False)
             .agg(cents=("cents", "sum"), n=("n", "sum")))
        g["avg_price_e4"] = (g["cents"].to_numpy(np.int64) * 10000
                             // g["n"].to_numpy(np.int64))
        g = g.sort_values(["l_partkey", "avg_price_e4", "l_suppkey"],
                          kind="stable")
        best = g.drop_duplicates("l_partkey", keep="first")
        return pd.DataFrame({
            "l_partkey": best["l_partkey"].to_numpy(np.int64),
            "l_suppkey": best["l_suppkey"].to_numpy(np.int64),
            "avg_price_e4": best["avg_price_e4"].to_numpy(np.int64),
        })

    return bucketed_group_apply(ds, ["l_partkey"], lambda df: df, argmin,
                                n_buckets=16)


CHEAPEST_SUPPLIER_SQL = """
WITH ps AS (SELECT l_partkey, l_suppkey,
              SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS cents,
              CAST(COUNT(*) AS BIGINT) AS n
            FROM lineitem GROUP BY 1, 2),
a AS (SELECT l_partkey, l_suppkey, cents * 10000 // n AS avg_price_e4,
        ROW_NUMBER() OVER (PARTITION BY l_partkey
                           ORDER BY cents * 10000 // n, l_suppkey) AS rn
      FROM ps)
SELECT CAST(l_partkey AS BIGINT) AS l_partkey,
       CAST(l_suppkey AS BIGINT) AS l_suppkey,
       CAST(avg_price_e4 AS BIGINT) AS avg_price_e4
FROM a WHERE rn = 1
"""


_Q10_LO = "1997-07-01"
_Q10_HI = "1997-10-01"


def q10_returned_items(sf_dir: str) -> pd.DataFrame:
    """(c_custkey, c_name, n_name, acctbal_cents, revenue_de4) — TPC-H Q10
    shape: top-20 customers by lost revenue from RETURNED lineitems on one
    quarter's orders. Integer-exact money (cents × (10000 − discount_bp)).

    Three join levels, none broadcast on the big side: (1) lineitem R-rows
    pre-aggregate (l_orderkey, rev) inside each scan batch; (2) the quarter's
    orders union those partials through ONE orderkey exchange, reducers emit
    (o_custkey, rev) partials — orderkey-bounded rows collapse to
    custkey-bounded; (3) customer rows union those through ONE custkey
    exchange, reducers attach n_name from the broadcast 25-row nation map
    and keep only a LOCAL top-20, so the driver ranks n_buckets×20 rows.
    Customer is corpus-sized and never broadcast (the q3 doctrine)."""
    import pyarrow.parquet as pq

    from ..sources.tables import read_table
    from ..stages.shuffle import arrow_group_agg, hash_exchange_apply

    lo = np.datetime64(_Q10_LO, "us")
    hi = np.datetime64(_Q10_HI, "us")
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    nk_to_name = dict(zip(nation["n_nationkey"].to_pylist(),
                          nation["n_name"].to_pylist()))

    def li_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], "R"))
        cents = _cents(t["l_extendedprice"])
        bp = pc.round(pc.multiply(t["l_discount"], 10000)).cast(pa.int64())
        rev = pc.multiply(cents, pc.subtract(pa.scalar(10000, pa.int64()), bp))
        g = arrow_group_agg(
            pa.table({"k": t["l_orderkey"].cast(pa.int64()), "rev": rev}),
            ["k"], [("rev", "sum")])
        return g.append_column("__side", pa.array(["li"] * g.num_rows))

    def orders_f(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
                    pc.less(t["o_orderdate"], pa.scalar(hi)))
        t = t.filter(m)
        return pa.table({"k": t["o_orderkey"].cast(pa.int64()),
                         "rev": pa.nulls(t.num_rows, pa.int64()),
                         "o_custkey": t["o_custkey"].cast(pa.int64()),
                         "__side": pa.array(["o"] * t.num_rows)})

    li = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"]
    ).map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True)
    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_custkey"]
    ).map_batches(orders_f, batch_format="pyarrow", zero_copy_batch=True)

    _mid = pa.schema([("c", pa.int64()), ("rev", pa.int64())])

    def join1(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "__side" not in t.column_names:
            return _mid.empty_table()
        lt = t.filter(pc.equal(t["__side"], "li"))
        ot = t.filter(pc.equal(t["__side"], "o"))
        if lt.num_rows == 0 or ot.num_rows == 0:
            return _mid.empty_table()
        rev = arrow_group_agg(
            pa.table({"k": lt["k"].cast(pa.int64()),
                      "rev": lt["rev"].cast(pa.int64())}),
            ["k"], [("rev", "sum")])
        ok = pa.table({"k": ot["k"].cast(pa.int64()),
                       "c": ot["o_custkey"].cast(pa.int64())})
        j = rev.join(ok, keys="k", join_type="inner")
        return arrow_group_agg(
            pa.table({"c": j["c"], "rev": j["rev"]}), ["c"], [("rev", "sum")])

    per_cust = hash_exchange_apply(li.union(orders), ["k"], lambda t: t,
                                   join1, n_buckets=16)

    def cust_f(t: pa.Table) -> pa.Table:
        return pa.table({"c": t["c_custkey"].cast(pa.int64()),
                         "rev": pa.nulls(t.num_rows, pa.int64()),
                         "c_name": t["c_name"],
                         "acct": _cents(t["c_acctbal"]),
                         "nk": t["c_nationkey"].cast(pa.int64()),
                         "__side2": pa.array(["cu"] * t.num_rows)})

    def rev_view(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "c" not in t.column_names:
            t = _mid.empty_table()
        return pa.table({"c": t["c"].cast(pa.int64()),
                         "rev": t["rev"].cast(pa.int64()),
                         "c_name": pa.nulls(t.num_rows, pa.string()),
                         "acct": pa.nulls(t.num_rows, pa.int64()),
                         "nk": pa.nulls(t.num_rows, pa.int64()),
                         "__side2": pa.array(["rv"] * t.num_rows)})

    cust = read_table(
        sf_dir, "customer",
        columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"]
    ).map_batches(cust_f, batch_format="pyarrow", zero_copy_batch=True)
    revs = per_cust.map_batches(rev_view, batch_format="pyarrow",
                                zero_copy_batch=True)

    _out = pa.schema([("c_custkey", pa.int64()), ("c_name", pa.string()),
                      ("n_name", pa.string()), ("acctbal_cents", pa.int64()),
                      ("revenue_de4", pa.int64())])

    def join2(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "__side2" not in t.column_names:
            return _out.empty_table()
        rt = t.filter(pc.equal(t["__side2"], "rv"))
        ct = t.filter(pc.equal(t["__side2"], "cu"))
        if rt.num_rows == 0 or ct.num_rows == 0:
            return _out.empty_table()
        rev = arrow_group_agg(
            pa.table({"c": rt["c"].cast(pa.int64()),
                      "revenue_de4": rt["rev"].cast(pa.int64())}),
            ["c"], [("revenue_de4", "sum")])
        cu = pa.table({"c": ct["c"].cast(pa.int64()), "c_name": ct["c_name"],
                       "acctbal_cents": ct["acct"].cast(pa.int64()),
                       "nk": ct["nk"].cast(pa.int64())})
        j = rev.join(cu, keys="c", join_type="inner")
        names = pa.array([nk_to_name[k] for k in j["nk"].to_pylist()],
                         pa.string())
        out = pa.table({"c_custkey": j["c"], "c_name": j["c_name"],
                        "n_name": names,
                        "acctbal_cents": j["acctbal_cents"],
                        "revenue_de4": j["revenue_de4"]})
        idx = pc.sort_indices(out, sort_keys=[("revenue_de4", "descending"),
                                              ("c_custkey", "ascending")])
        return out.take(idx[:20])

    parts = hash_exchange_apply(revs.union(cust), ["c"], lambda t: t,
                                join2, n_buckets=16).to_pandas()
    if "c_custkey" not in parts.columns:
        parts = pd.DataFrame(columns=[f.name for f in _out])
    out = parts.sort_values(["revenue_de4", "c_custkey"],
                            ascending=[False, True]).head(20)
    return out.reset_index(drop=True).astype(
        {"c_custkey": np.int64, "acctbal_cents": np.int64,
         "revenue_de4": np.int64})


Q10_RETURNED_ITEMS_SQL = f"""
SELECT c_custkey, c_name, n_name,
       CAST(ROUND(c_acctbal * 100) AS BIGINT) AS acctbal_cents,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                * (10000 - CAST(ROUND(l_discount * 10000) AS BIGINT)))
            AS BIGINT) AS revenue_de4
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '{_Q10_LO} 00:00:00'
  AND o_orderdate < TIMESTAMP '{_Q10_HI} 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name, acctbal_cents
ORDER BY revenue_de4 DESC, c_custkey
LIMIT 20
"""


_Q14_LO = "1997-09-01"
_Q14_HI = "1997-10-01"


def q14_promo_revenue(sf_dir: str) -> pd.DataFrame:
    """(promo_de4, total_de4, promo_share_e9) one row — TPC-H Q14 promotion
    effect: the share of one ship-month's discounted revenue coming from
    PROMO-type parts.

    The part table is the catalog-bound dimension: its (p_partkey →
    is_promo) map is built once driver-side and broadcast into the scan
    closure (`ray.put` inlining; the tagged-union exchange on l_partkey is
    the documented swap if parts outgrow broadcast size). The lineitem pass
    is then pure scan-side partials — two int64 sums per block, zero
    exchange (the q6 plan shape with one broadcast lookup added). The final
    share is one identical-double division of exact ints."""
    import pyarrow.parquet as pq

    from ..sources.tables import read_table

    lo = np.datetime64(_Q14_LO, "us")
    hi = np.datetime64(_Q14_HI, "us")
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type"])
    promo_keys = pa.array(
        part.filter(pc.equal(part["p_type"], "PROMO"))["p_partkey"]
        .to_numpy(zero_copy_only=False).astype(np.int64))
    promo_ref = ray.put(promo_keys)

    def partial(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
                    pc.less(t["l_shipdate"], pa.scalar(hi)))
        t = t.filter(m)
        keys = ray.get(promo_ref)
        cents = _cents(t["l_extendedprice"])
        bp = pc.round(pc.multiply(t["l_discount"], 10000)).cast(pa.int64())
        rev = pc.multiply(cents, pc.subtract(pa.scalar(10000, pa.int64()), bp))
        is_promo = pc.is_in(t["l_partkey"].cast(pa.int64()), value_set=keys)
        total = pc.sum(rev)
        promo = pc.sum(pc.if_else(is_promo, rev, pa.scalar(0, pa.int64())))
        return pa.table({
            "promo_de4": pa.array([promo.as_py() or 0], pa.int64()),
            "total_de4": pa.array([total.as_py() or 0], pa.int64())})

    parts = read_table(
        sf_dir, "lineitem",
        columns=["l_shipdate", "l_partkey", "l_extendedprice", "l_discount"]
    ).map_batches(partial, batch_format="pyarrow",
                  zero_copy_batch=True).to_pandas()
    promo = int(parts["promo_de4"].sum())
    total = int(parts["total_de4"].sum())
    share = _round_e9_local(float(promo) / float(total)) if total else 0
    return pd.DataFrame({"promo_de4": [np.int64(promo)],
                         "total_de4": [np.int64(total)],
                         "promo_share_e9": [np.int64(share)]})


def _round_e9_local(v: float) -> int:
    """DuckDB ROUND(v·1e9), half away from zero (the stats recipe)."""
    import math

    s = abs(v) * 1e9
    f = math.floor(s)
    if s - f >= 0.5:
        f += 1
    return int(f) if v >= 0 else -int(f)


Q14_PROMO_REVENUE_SQL = f"""
WITH r AS (
  SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT)
         * (10000 - CAST(ROUND(l_discount * 10000) AS BIGINT)) AS rev,
         p_type
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '{_Q14_LO} 00:00:00'
    AND l_shipdate < TIMESTAMP '{_Q14_HI} 00:00:00'),
s AS (SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END)
                  AS BIGINT) AS promo_de4,
             CAST(SUM(rev) AS BIGINT) AS total_de4 FROM r)
SELECT promo_de4, total_de4,
       CAST(ROUND(CAST(promo_de4 AS DOUBLE) / CAST(total_de4 AS DOUBLE)
                  * 1000000000) AS BIGINT) AS promo_share_e9
FROM s
"""


_Q17_BRAND = "Brand#1"


def q17_small_qty_revenue(sf_dir: str) -> pd.DataFrame:
    """(n_small, revenue_cents) one row — TPC-H Q17 small-quantity-order
    revenue: total extended price of lineitems whose quantity is below 20 %
    of the per-part average quantity, for one brand's parts.

    The correlated scalar subquery (per-part AVG over the same table)
    becomes a grouped self-aggregation: the brand's partkeys are a
    catalog-bound broadcast filter (the q14 recipe); each scan batch then
    collapses to (partkey, qty) partials carrying (cnt, sum_cents) — qty is
    1..50 integral, so partial rows are bounded by |parts of brand| × 50,
    never raw lineitems. ONE partkey exchange reassembles each part's exact
    (sum_qty, n) and evaluates the avg predicate by integer
    cross-multiplication 5·q·n < sum_qty (0.2·avg with zero float
    boundary), summing the surviving cents.

    Reference parity: the reference has no relational layer; this is part
    of the engine's §2.5/§2.4 aggregation+join surface (SURVEY.md) used by
    curation pipelines for per-key outlier gating at 100 TB."""
    import pyarrow.parquet as pq

    from ..sources.tables import read_table
    from ..stages.shuffle import arrow_group_agg, hash_exchange_apply

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand"])
    brand_keys = pa.array(
        part.filter(pc.equal(part["p_brand"], _Q17_BRAND))["p_partkey"]
        .to_numpy(zero_copy_only=False).astype(np.int64))
    brand_ref = ray.put(brand_keys)

    def partial(t: pa.Table) -> pa.Table:
        keys = ray.get(brand_ref)
        t = t.filter(pc.is_in(t["l_partkey"].cast(pa.int64()),
                              value_set=keys))
        q = pc.round(t["l_quantity"]).cast(pa.int64())
        g = arrow_group_agg(
            pa.table({"pk": t["l_partkey"].cast(pa.int64()),
                      "q": q,
                      "cnt": pa.array(np.ones(t.num_rows, np.int64)),
                      "cents": _cents(t["l_extendedprice"])}),
            ["pk", "q"], [("cnt", "sum"), ("cents", "sum")])
        return g

    li = read_table(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice"]
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    _out = pa.schema([("n_small", pa.int64()), ("revenue_cents", pa.int64())])

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "pk" not in t.column_names:
            return _out.empty_table()
        g = arrow_group_agg(t, ["pk", "q"], [("cnt", "sum"), ("cents", "sum")])
        pk = g["pk"].to_numpy(zero_copy_only=False).astype(np.int64)
        q = g["q"].to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = g["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = g["cents"].to_numpy(zero_copy_only=False).astype(np.int64)
        # per-part exact (sum_qty, n) via a second tiny group
        pg = arrow_group_agg(
            pa.table({"pk": pk, "sq": q * cnt, "n": cnt}),
            ["pk"], [("sq", "sum"), ("n", "sum")])
        ppk = pg["pk"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ppk)
        ppk, sq, n = (ppk[order],
                      pg["sq"].to_numpy(zero_copy_only=False)[order],
                      pg["n"].to_numpy(zero_copy_only=False)[order])
        pos = np.searchsorted(ppk, pk)
        small = 5 * q * n[pos] < sq[pos]  # q < 0.2·(sq/n), integer-exact
        return pa.table({
            "n_small": pa.array([int(cnt[small].sum())], pa.int64()),
            "revenue_cents": pa.array([int(cents[small].sum())], pa.int64()),
        })

    parts = hash_exchange_apply(li, ["pk"], lambda t: t, final,
                                n_buckets=16).to_pandas()
    if "n_small" not in parts.columns:
        return pd.DataFrame({"n_small": [np.int64(0)],
                             "revenue_cents": [np.int64(0)]})
    return pd.DataFrame({
        "n_small": [np.int64(parts["n_small"].sum())],
        "revenue_cents": [np.int64(parts["revenue_cents"].sum())]})


Q17_SMALL_QTY_REVENUE_SQL = f"""
WITH b AS (SELECT p_partkey FROM part WHERE p_brand = '{_Q17_BRAND}'),
l AS (SELECT l_partkey, CAST(ROUND(l_quantity) AS BIGINT) AS q,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem JOIN b ON l_partkey = p_partkey),
a AS (SELECT l_partkey, SUM(q) AS sq, CAST(COUNT(*) AS BIGINT) AS n
      FROM l GROUP BY 1)
SELECT CAST(COALESCE(SUM(CASE WHEN 5 * q * n < sq THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_small,
       CAST(COALESCE(SUM(CASE WHEN 5 * q * n < sq THEN cents ELSE 0 END), 0)
            AS BIGINT) AS revenue_cents
FROM l JOIN a USING (l_partkey)
"""


_Q18_MIN_QTY = 250


def q18_large_orders(sf_dir: str) -> pd.DataFrame:
    """(o_custkey, o_orderkey, totalprice_cents, total_qty) — TPC-H Q18
    large-volume-customer shape: orders whose total lineitem quantity
    exceeds a threshold, ranked by order value (top 100, orderkey
    tiebreak). Integer-exact money and quantities.

    GROUP-HAVING + join-back in ONE exchange: lineitem scan batches
    pre-collapse to (orderkey, qty) partials; orders rows ride the same
    tagged union keyed by orderkey, so each reducer owns an orderkey
    range, finishes the HAVING sum locally, joins the surviving keys to
    their order row, and emits only a LOCAL top-100 — the driver ranks
    n_buckets×100 rows. (The testdata schema carries no c_name; the
    customer join-back of canonical Q18 is q10's demonstrated second
    exchange and is elided here.)"""
    from ..sources.tables import read_table
    from ..stages.shuffle import arrow_group_agg, hash_exchange_apply

    def li_partial(t: pa.Table) -> pa.Table:
        g = arrow_group_agg(
            pa.table({"k": t["l_orderkey"].cast(pa.int64()),
                      "qty": pc.round(t["l_quantity"]).cast(pa.int64())}),
            ["k"], [("qty", "sum")])
        return pa.table({"k": g["k"], "qty": g["qty"],
                         "cust": pa.nulls(g.num_rows, pa.int64()),
                         "price": pa.nulls(g.num_rows, pa.int64()),
                         "__side": pa.array(["li"] * g.num_rows)})

    def orders_f(t: pa.Table) -> pa.Table:
        return pa.table({"k": t["o_orderkey"].cast(pa.int64()),
                         "qty": pa.nulls(t.num_rows, pa.int64()),
                         "cust": t["o_custkey"].cast(pa.int64()),
                         "price": _cents(t["o_totalprice"]),
                         "__side": pa.array(["o"] * t.num_rows)})

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"]
                    ).map_batches(li_partial, batch_format="pyarrow",
                                  zero_copy_batch=True)
    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    ).map_batches(orders_f, batch_format="pyarrow", zero_copy_batch=True)

    _out = pa.schema([("o_custkey", pa.int64()), ("o_orderkey", pa.int64()),
                      ("totalprice_cents", pa.int64()),
                      ("total_qty", pa.int64())])

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "__side" not in t.column_names:
            return _out.empty_table()
        lt = t.filter(pc.equal(t["__side"], "li"))
        ot = t.filter(pc.equal(t["__side"], "o"))
        if lt.num_rows == 0 or ot.num_rows == 0:
            return _out.empty_table()
        qty = arrow_group_agg(
            pa.table({"k": lt["k"].cast(pa.int64()),
                      "qty": lt["qty"].cast(pa.int64())}),
            ["k"], [("qty", "sum")])
        qty = qty.filter(pc.greater(qty["qty"], _Q18_MIN_QTY))
        if qty.num_rows == 0:
            return _out.empty_table()
        ok = pa.table({"k": ot["k"].cast(pa.int64()),
                       "cust": ot["cust"].cast(pa.int64()),
                       "price": ot["price"].cast(pa.int64())})
        j = qty.join(ok, keys="k", join_type="inner")
        out = pa.table({"o_custkey": j["cust"], "o_orderkey": j["k"],
                        "totalprice_cents": j["price"],
                        "total_qty": j["qty"]})
        idx = pc.sort_indices(out, sort_keys=[
            ("totalprice_cents", "descending"), ("o_orderkey", "ascending")])
        return out.take(idx[:100])

    parts = hash_exchange_apply(li.union(orders), ["k"], lambda t: t,
                                final, n_buckets=16).to_pandas()
    if "o_orderkey" not in parts.columns:
        parts = pd.DataFrame(columns=[f.name for f in _out])
    out = parts.sort_values(["totalprice_cents", "o_orderkey"],
                            ascending=[False, True]).head(100)
    return out.reset_index(drop=True).astype(
        {c: np.int64 for c in out.columns})


Q18_LARGE_ORDERS_SQL = f"""
WITH q AS (SELECT l_orderkey, CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT))
                                   AS BIGINT) AS total_qty
           FROM lineitem GROUP BY 1
           HAVING SUM(CAST(ROUND(l_quantity) AS BIGINT)) > {_Q18_MIN_QTY})
SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
       CAST(o_orderkey AS BIGINT) AS o_orderkey,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS totalprice_cents,
       total_qty
FROM orders JOIN q ON o_orderkey = l_orderkey
ORDER BY totalprice_cents DESC, o_orderkey
LIMIT 100
"""


def q21_blame_supplier(sf_dir: str) -> pd.DataFrame:
    """(l_suppkey, n_orders) top-20 — TPC-H Q21 waiting-supplier shape on
    the testdata schema: suppliers who were the SOLE supplier with returned
    ('R') lineitems on a multi-supplier order, counted per supplier. (The
    canonical query's commit/receipt-date lateness predicate maps to the
    returnflag here — same EXISTS(other supplier) ∧ NOT EXISTS(other late
    supplier) correlated shape.)

    Plan: scan batches pre-collapse to (orderkey, suppkey, any_R) partials
    (max-combine keeps them mergeable across blocks); ONE orderkey exchange
    lets each reducer evaluate the within-order predicate — ≥2 distinct
    suppliers, exactly one flagged — and emit supplier-domain-bounded
    (suppkey, n) partials the driver folds."""
    from ..sources.tables import read_table
    from ..stages.shuffle import arrow_group_agg, hash_exchange_apply

    def partial(t: pa.Table) -> pa.Table:
        r = pc.if_else(pc.equal(t["l_returnflag"], "R"),
                       pa.scalar(1, pa.int64()), pa.scalar(0, pa.int64()))
        return arrow_group_agg(
            pa.table({"k": t["l_orderkey"].cast(pa.int64()),
                      "s": t["l_suppkey"].cast(pa.int64()), "r": r}),
            ["k", "s"], [("r", "max")])

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_suppkey", "l_returnflag"]
                    ).map_batches(partial, batch_format="pyarrow",
                                  zero_copy_batch=True)

    _out = pa.schema([("l_suppkey", pa.int64()), ("n_orders", pa.int64())])

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "k" not in t.column_names:
            return _out.empty_table()
        g = arrow_group_agg(t, ["k", "s"], [("r", "max")])
        per_order = arrow_group_agg(
            pa.table({"k": g["k"], "ns": pa.array(
                np.ones(g.num_rows, np.int64)), "nr": g["r"]}),
            ["k"], [("ns", "sum"), ("nr", "sum")])
        hit = per_order.filter(pc.and_(
            pc.greater_equal(per_order["ns"], 2),
            pc.equal(per_order["nr"], 1)))
        if hit.num_rows == 0:
            return _out.empty_table()
        flagged = g.filter(pc.equal(g["r"], 1))
        j = flagged.join(hit.select(["k"]), keys="k", join_type="inner")
        return arrow_group_agg(
            pa.table({"l_suppkey": j["s"],
                      "n_orders": pa.array(np.ones(j.num_rows, np.int64))}),
            ["l_suppkey"], [("n_orders", "sum")])

    parts = hash_exchange_apply(li, ["k"], lambda t: t, final,
                                n_buckets=16).to_pandas()
    if "l_suppkey" not in parts.columns:
        return pd.DataFrame({"l_suppkey": pd.Series(dtype=np.int64),
                             "n_orders": pd.Series(dtype=np.int64)})
    out = parts.groupby("l_suppkey", as_index=False).agg(
        n_orders=("n_orders", "sum"))
    out = out.sort_values(["n_orders", "l_suppkey"],
                          ascending=[False, True]).head(20)
    return out.reset_index(drop=True).astype(np.int64)


Q21_BLAME_SUPPLIER_SQL = """
WITH ls AS (SELECT l_orderkey, l_suppkey,
                   MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS r
            FROM lineitem GROUP BY 1, 2),
o AS (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS ns,
             CAST(SUM(r) AS BIGINT) AS nr
      FROM ls GROUP BY 1)
SELECT CAST(l_suppkey AS BIGINT) AS l_suppkey,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM ls JOIN o USING (l_orderkey)
WHERE ns >= 2 AND nr = 1 AND r = 1
GROUP BY 1 ORDER BY n_orders DESC, l_suppkey LIMIT 20
"""


_Q22_CUTOFF = "2000-01-01"


def q22_idle_rich_customers(sf_dir: str) -> pd.DataFrame:
    """(c_mktsegment, n_cust, sum_acctbal_cents) — TPC-H Q22
    global-sales-opportunity shape: customers with above-average positive
    account balance and NO orders since a cutoff date, aggregated by
    market segment. (The phone-prefix predicate of canonical Q22 maps to
    the segment grouping here; the testdata has no c_phone.)

    Two scalar+anti-join stages, both exchange-light: (1) one streamed
    scalar pass over customer computes the exact positive-balance
    sufficient stats (n_pos, sum_pos_cents) as per-block int partials —
    the avg predicate is then the integer cross-multiplication
    bal_cents·n_pos > sum_pos_cents, no float boundary; (2) recent orders
    collapse to key-only distinct custkeys per block and ride ONE custkey
    exchange with the balance-qualified customer rows, where each reducer
    anti-joins (NOT EXISTS) and emits segment-domain-bounded partials."""
    from ..sources.tables import read_table
    from ..stages.shuffle import arrow_group_agg, hash_exchange_apply

    cutoff = np.datetime64(_Q22_CUTOFF, "us")

    def bal_partial(t: pa.Table) -> pa.Table:
        cents = _cents(t["c_acctbal"])
        pos = pc.greater(cents, 0)
        n = pc.sum(pos.cast(pa.int64()))
        s = pc.sum(pc.if_else(pos, cents, pa.scalar(0, pa.int64())))
        return pa.table({"n_pos": pa.array([n.as_py() or 0], pa.int64()),
                         "s_pos": pa.array([s.as_py() or 0], pa.int64())})

    stats = read_table(sf_dir, "customer", columns=["c_acctbal"]
                       ).map_batches(bal_partial, batch_format="pyarrow",
                                     zero_copy_batch=True).to_pandas()
    n_pos = int(stats["n_pos"].sum())
    s_pos = int(stats["s_pos"].sum())

    def cust_f(t: pa.Table) -> pa.Table:
        cents = _cents(t["c_acctbal"])
        # bal > avg_pos  ⟺  bal_cents·n_pos > sum_pos_cents (ints)
        keep = pc.greater(pc.multiply(cents, pa.scalar(n_pos, pa.int64())),
                          pa.scalar(s_pos, pa.int64()))
        t = t.filter(keep)
        return pa.table({"k": t["c_custkey"].cast(pa.int64()),
                         "seg": t["c_mktsegment"].cast(pa.string()),
                         "bal": _cents(t["c_acctbal"]),
                         "__side": pa.array(["c"] * t.num_rows)})

    def orders_keys(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["o_orderdate"], pa.scalar(cutoff)))
        keys = np.unique(t["o_custkey"].to_numpy(zero_copy_only=False)
                         .astype(np.int64))
        return pa.table({"k": keys,
                         "seg": pa.nulls(len(keys), pa.string()),
                         "bal": pa.nulls(len(keys), pa.int64()),
                         "__side": pa.array(["o"] * len(keys))})

    cust = read_table(sf_dir, "customer",
                      columns=["c_custkey", "c_acctbal", "c_mktsegment"]
                      ).map_batches(cust_f, batch_format="pyarrow",
                                    zero_copy_batch=True)
    orders = read_table(sf_dir, "orders",
                        columns=["o_custkey", "o_orderdate"]
                        ).map_batches(orders_keys, batch_format="pyarrow",
                                      zero_copy_batch=True)

    _out = pa.schema([("c_mktsegment", pa.string()), ("n_cust", pa.int64()),
                      ("sum_acctbal_cents", pa.int64())])

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "__side" not in t.column_names:
            return _out.empty_table()
        ct = t.filter(pc.equal(t["__side"], "c"))
        if ct.num_rows == 0:
            return _out.empty_table()
        active = np.unique(t.filter(pc.equal(t["__side"], "o"))["k"]
                           .to_numpy(zero_copy_only=False).astype(np.int64))
        ck = ct["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(active) == 0:
            keep = ct  # empty probe side: every qualified customer is idle
        else:
            pos = np.searchsorted(active, ck)
            hit = (pos < len(active)) & (
                active[np.minimum(pos, len(active) - 1)] == ck)
            keep = ct.filter(pa.array(~hit))
        if keep.num_rows == 0:
            return _out.empty_table()
        return arrow_group_agg(
            pa.table({"c_mktsegment": keep["seg"].cast(pa.string()),
                      "n_cust": pa.array(np.ones(keep.num_rows, np.int64)),
                      "sum_acctbal_cents": keep["bal"].cast(pa.int64())}),
            ["c_mktsegment"], [("n_cust", "sum"), ("sum_acctbal_cents", "sum")])

    parts = hash_exchange_apply(cust.union(orders), ["k"], lambda t: t,
                                final, n_buckets=16).to_pandas()
    if "c_mktsegment" not in parts.columns:
        return pd.DataFrame({"c_mktsegment": pd.Series(dtype=object),
                             "n_cust": pd.Series(dtype=np.int64),
                             "sum_acctbal_cents": pd.Series(dtype=np.int64)})
    out = parts.groupby("c_mktsegment", as_index=False).agg(
        n_cust=("n_cust", "sum"),
        sum_acctbal_cents=("sum_acctbal_cents", "sum"))
    return out.sort_values("c_mktsegment").reset_index(drop=True).astype(
        {"n_cust": np.int64, "sum_acctbal_cents": np.int64})


Q22_IDLE_RICH_SQL = f"""
WITH s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pos,
                  CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                  AS s_pos
           FROM customer WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT) > 0)
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_cust,
       CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
       AS sum_acctbal_cents
FROM customer, s
WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT) * n_pos > s_pos
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '{_Q22_CUTOFF} 00:00:00')
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def q9_product_profit(sf_dir: str) -> pd.DataFrame:
    """(n_name, l_year, profit_de4) — TPC-H Q9 product-type profit shape on
    the testdata schema (no partsupp: p_retailprice stands in for supplycost):
    per supplier nation and ship year, Σ(discounted revenue − retail cost ×
    quantity), integer-exact at the de4 (cents × basis-point) grid.

    The cheapest possible plan for a three-dimension join: BOTH dimension
    sides (part → retail cents, supplier → nation) are catalog-bound
    broadcast maps, so the lineitem pass is pure scan-side partials bounded
    by |nations| × |years| per block, with a driver fold — ZERO exchange
    (the q6/q14 doctrine extended to two lookups)."""
    import pyarrow.parquet as pq

    from ..sources.tables import read_table

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_retailprice"])
    pk = part["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    retail = np.rint(part["p_retailprice"].to_numpy(zero_copy_only=False)
                     * 100.0).astype(np.int64)
    plut = np.zeros(int(pk.max()) + 1, dtype=np.int64)
    plut[pk] = retail

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    sk = supp["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    sn = supp["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    slut = np.full(int(sk.max()) + 1, -1, dtype=np.int64)
    slut[sk] = sn
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    nk_name = dict(zip(nation["n_nationkey"].to_pylist(),
                       nation["n_name"].to_pylist()))
    luts = ray.put((plut, slut))

    def partial(t: pa.Table) -> pa.Table:
        pl, sl = ray.get(luts)
        pkey = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        skey = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        nat = sl[skey]
        yr = (t["l_shipdate"].to_numpy(zero_copy_only=False)
              .astype("datetime64[Y]").astype(np.int64) + 1970)
        cents = _cents(t["l_extendedprice"]).to_numpy(zero_copy_only=False)
        bp = pc.round(pc.multiply(t["l_discount"], 10000)).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        qty = pc.round(t["l_quantity"]).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        profit = cents * (10000 - bp) - pl[pkey] * qty * 10000
        df = pd.DataFrame({"nk": nat, "l_year": yr, "profit_de4": profit})
        g = df.groupby(["nk", "l_year"], as_index=False).agg(
            profit_de4=("profit_de4", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = read_table(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_extendedprice",
                 "l_discount", "l_shipdate"]
    ).map_batches(partial, batch_format="pyarrow",
                  zero_copy_batch=True).to_pandas()
    out = parts.groupby(["nk", "l_year"], as_index=False).agg(
        profit_de4=("profit_de4", "sum"))
    out["n_name"] = out["nk"].map(nk_name)
    out = out.sort_values(["n_name", "l_year"]).reset_index(drop=True)
    return out[["n_name", "l_year", "profit_de4"]].astype(
        {"l_year": np.int64, "profit_de4": np.int64})


Q9_PRODUCT_PROFIT_SQL = """
SELECT n_name, CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                * (10000 - CAST(ROUND(l_discount * 10000) AS BIGINT))
                - CAST(ROUND(p_retailprice * 100) AS BIGINT)
                  * CAST(ROUND(l_quantity) AS BIGINT) * 10000)
            AS BIGINT) AS profit_de4
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY 1, 2 ORDER BY 1, 2
"""


_Q8_REGION = "ASIA"
_Q8_NATION = "NATION_2"
_Q8_TYPE = "PROMO"
_Q8_LO = "1995-01-01"
_Q8_HI = "1997-01-01"


def q8_market_share(sf_dir: str) -> pd.DataFrame:
    """(o_year, nation_de4, total_de4, share_e9) — TPC-H Q8 national market
    share: within one region's customers buying one part type over a
    two-year window, the share of revenue supplied by one nation, per order
    year. Integer-exact money; one identical-double division per year.

    The q5/q7 skeleton with conditional partials: region customers come
    from the orders⋈customer bloom exchange join (customer is corpus-sized,
    never broadcast); the part-type key set and supplier→nation map are
    catalog-bound broadcasts into the lineitem scan, which pre-aggregates
    (orderkey, rev_nation, rev_total); ONE orderkey exchange attaches the
    order year and collapses to |years|-bounded partials."""
    import pyarrow.parquet as pq

    from ..sources.tables import read_table
    from ..stages.join import hash_join_bloom
    from ..stages.shuffle import arrow_group_agg, hash_exchange_apply

    lo = np.datetime64(_Q8_LO, "us")
    hi = np.datetime64(_Q8_HI, "us")

    region = pq.read_table(f"{sf_dir}/region.parquet")
    rk = dict(zip(region["r_name"].to_pylist(),
                  region["r_regionkey"].to_pylist()))[_Q8_REGION]
    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    region_nk = pa.array(
        nation.filter(pc.equal(nation["n_regionkey"], rk))["n_nationkey"]
        .to_numpy(zero_copy_only=False).astype(np.int32))
    target_nk = dict(zip(nation["n_name"].to_pylist(),
                         nation["n_nationkey"].to_pylist()))[_Q8_NATION]

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type"])
    type_keys = pa.array(
        part.filter(pc.equal(part["p_type"], _Q8_TYPE))["p_partkey"]
        .to_numpy(zero_copy_only=False).astype(np.int64))

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    sk = supp["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    sn = supp["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    slut = np.full(int(sk.max()) + 1, -1, dtype=np.int64)
    slut[sk] = sn
    bcast = ray.put((type_keys, slut))

    cust = read_table(
        sf_dir, "customer", columns=["c_custkey", "c_nationkey"]
    ).map_batches(
        lambda t: t.filter(pc.is_in(t["c_nationkey"], value_set=region_nk)),
        batch_format="pyarrow", zero_copy_batch=True)

    def orders_pre(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
                    pc.less(t["o_orderdate"], pa.scalar(hi)))
        return t.filter(m)

    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(orders_pre, batch_format="pyarrow", zero_copy_batch=True)
    obld = hash_join_bloom(orders, cust, "o_custkey", "c_custkey",
                           ["o_orderkey", "o_custkey", "o_orderdate"],
                           ["c_custkey"], n_buckets=16)

    def ob_view(t: pa.Table) -> pa.Table:
        yr = (t["o_orderdate"].to_numpy(zero_copy_only=False)
              .astype("datetime64[Y]").astype(np.int64) + 1970)
        return pa.table({
            "__key": t["o_orderkey"].cast(pa.int64()).combine_chunks(),
            "o_year": pa.array(yr),
            "rev_nat": pa.nulls(t.num_rows, pa.int64()),
            "rev_all": pa.nulls(t.num_rows, pa.int64()),
            "__side": pa.array(["o"] * t.num_rows)})

    ob = obld.map_batches(ob_view, batch_format="pyarrow", zero_copy_batch=True)

    def li_partial(t: pa.Table) -> pa.Table:
        keys, sl = ray.get(bcast)
        t = t.filter(pc.is_in(t["l_partkey"].cast(pa.int64()),
                              value_set=keys))
        cents = _cents(t["l_extendedprice"]).to_numpy(zero_copy_only=False)
        bp = pc.round(pc.multiply(t["l_discount"], 10000)).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        rev = cents * (10000 - bp)
        skey = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        is_nat = sl[skey] == target_nk
        g = arrow_group_agg(
            pa.table({
                "__key": t["l_orderkey"].cast(pa.int64()),
                "o_year": pa.nulls(t.num_rows, pa.int64()),
                "rev_nat": pa.array(np.where(is_nat, rev, 0)),
                "rev_all": pa.array(rev)}),
            ["__key"], [("o_year", "max"), ("rev_nat", "sum"),
                        ("rev_all", "sum")])
        return g.append_column("__side", pa.array(["li"] * g.num_rows))

    li = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
                 "l_discount"]
    ).map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True)

    _mid = pa.schema([("o_year", pa.int64()), ("rev_nat", pa.int64()),
                      ("rev_all", pa.int64())])

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "__side" not in t.column_names:
            return _mid.empty_table()
        lt = t.filter(pc.equal(t["__side"], "li"))
        ot = t.filter(pc.equal(t["__side"], "o"))
        if lt.num_rows == 0 or ot.num_rows == 0:
            return _mid.empty_table()
        lg = arrow_group_agg(
            pa.table({"__key": lt["__key"].cast(pa.int64()).combine_chunks(),
                      "rev_nat": lt["rev_nat"].cast(pa.int64()).combine_chunks(),
                      "rev_all": lt["rev_all"].cast(pa.int64()).combine_chunks()}),
            ["__key"], [("rev_nat", "sum"), ("rev_all", "sum")])
        ok = pa.table({"__key": ot["__key"].cast(pa.int64()).combine_chunks(),
                       "o_year": ot["o_year"].cast(pa.int64()).combine_chunks()})
        j = lg.join(ok, keys="__key", join_type="inner")
        return arrow_group_agg(
            pa.table({"o_year": j["o_year"], "rev_nat": j["rev_nat"],
                      "rev_all": j["rev_all"]}),
            ["o_year"], [("rev_nat", "sum"), ("rev_all", "sum")])

    parts = hash_exchange_apply(li.union(ob), ["__key"], lambda t: t,
                                final, n_buckets=16).to_pandas()
    if "o_year" not in parts.columns:
        return pd.DataFrame({"o_year": pd.Series(dtype=np.int64),
                             "nation_de4": pd.Series(dtype=np.int64),
                             "total_de4": pd.Series(dtype=np.int64),
                             "share_e9": pd.Series(dtype=np.int64)})
    out = parts.groupby("o_year", as_index=False).agg(
        nation_de4=("rev_nat", "sum"), total_de4=("rev_all", "sum"))
    out["share_e9"] = [
        np.int64(_round_e9_local(float(n) / float(d))) if d else np.int64(0)
        for n, d in zip(out["nation_de4"], out["total_de4"])]
    return out.sort_values("o_year").reset_index(drop=True).astype(
        {"o_year": np.int64, "nation_de4": np.int64, "total_de4": np.int64,
         "share_e9": np.int64})


Q8_MARKET_SHARE_SQL = f"""
WITH r AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT)
         * (10000 - CAST(ROUND(l_discount * 10000) AS BIGINT)) AS rev,
         (SELECT n_name FROM nation WHERE n_nationkey = s_nationkey)
         = '{_Q8_NATION}' AS is_nat
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region ON cn.n_regionkey = r_regionkey
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE r_name = '{_Q8_REGION}' AND p_type = '{_Q8_TYPE}'
    AND o_orderdate >= TIMESTAMP '{_Q8_LO} 00:00:00'
    AND o_orderdate < TIMESTAMP '{_Q8_HI} 00:00:00'),
s AS (SELECT o_year,
             CAST(SUM(CASE WHEN is_nat THEN rev ELSE 0 END) AS BIGINT)
             AS nation_de4,
             CAST(SUM(rev) AS BIGINT) AS total_de4
      FROM r GROUP BY 1)
SELECT o_year, nation_de4, total_de4,
       CASE WHEN total_de4 = 0 THEN 0
            ELSE CAST(ROUND(CAST(nation_de4 AS DOUBLE)
                            / CAST(total_de4 AS DOUBLE)
                            * 1000000000) AS BIGINT) END AS share_e9
FROM s ORDER BY o_year
"""


_Q13_EXCLUDE = "1-URGENT"


def q13_customer_distribution(sf_dir: str) -> pd.DataFrame:
    """(c_count, custdist) — TPC-H Q13 customer order-count distribution:
    how many customers placed exactly k (non-urgent) orders, INCLUDING the
    zero-order customers the left-outer join exists for.

    The outer join never materializes pairs: both sides stream key-only
    rows into ONE custkey exchange — customer emits (ck, 0), orders emits
    per-block (ck, n) count partials — and each reducer collapses its
    custkeys to a count-of-counts histogram, so the driver folds rows
    bounded by buckets × max-orders-per-customer, never customers."""
    from ..sources.tables import read_table
    from ..stages.shuffle import arrow_group_agg, hash_exchange_apply

    cust = read_table(sf_dir, "customer", columns=["c_custkey"]).map_batches(
        lambda t: pa.table({"ck": t["c_custkey"].cast(pa.int64()),
                            "n": pa.array(np.zeros(t.num_rows, np.int64))}),
        batch_format="pyarrow", zero_copy_batch=True)

    def orders_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["o_orderpriority"], _Q13_EXCLUDE))
        g = arrow_group_agg(
            pa.table({"ck": t["o_custkey"].cast(pa.int64()),
                      "n": pa.array(np.ones(t.num_rows, np.int64))}),
            ["ck"], [("n", "sum")])
        return g

    orders = read_table(
        sf_dir, "orders", columns=["o_custkey", "o_orderpriority"]
    ).map_batches(orders_partial, batch_format="pyarrow",
                  zero_copy_batch=True)

    _out = pa.schema([("c_count", pa.int64()), ("custdist", pa.int64())])

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "ck" not in t.column_names:
            return _out.empty_table()
        g = arrow_group_agg(t, ["ck"], [("n", "sum")])
        counts, freq = np.unique(
            g["n"].to_numpy(zero_copy_only=False).astype(np.int64),
            return_counts=True)
        return pa.table({"c_count": pa.array(counts),
                         "custdist": pa.array(freq.astype(np.int64))})

    parts = hash_exchange_apply(cust.union(orders), ["ck"], lambda t: t,
                                final, n_buckets=16).to_pandas()
    if "c_count" not in parts.columns:
        return pd.DataFrame({"c_count": pd.Series(dtype=np.int64),
                             "custdist": pd.Series(dtype=np.int64)})
    out = parts.groupby("c_count", as_index=False).agg(
        custdist=("custdist", "sum"))
    out = out.sort_values(["custdist", "c_count"],
                          ascending=[False, False]).reset_index(drop=True)
    return out.astype({"c_count": np.int64, "custdist": np.int64})


Q13_CUSTOMER_DISTRIBUTION_SQL = f"""
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
  SELECT c_custkey, CAST(COUNT(o_custkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN (
    SELECT o_custkey FROM orders WHERE o_orderpriority <> '{_Q13_EXCLUDE}') o
    ON c_custkey = o_custkey
  GROUP BY c_custkey) t
GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""


_Q15_LO = "1996-01-01"
_Q15_HI = "1996-04-01"


def q15_top_supplier(sf_dir: str) -> pd.DataFrame:
    """(s_suppkey, s_name, total_revenue_de4) — TPC-H Q15 top supplier:
    the supplier(s) with maximum discounted revenue in one quarter, ties
    kept (the view + scalar-max shape).

    Supplier is catalog-bound, so the whole query is scan-side partials:
    each lineitem block collapses to per-suppkey revenue sums (≤ |suppliers|
    rows), the driver folds and takes the max — zero exchange."""
    import pyarrow.parquet as pq

    from ..sources.tables import read_table

    lo = np.datetime64(_Q15_LO, "us")
    hi = np.datetime64(_Q15_HI, "us")

    def partial(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
                    pc.less(t["l_shipdate"], pa.scalar(hi)))
        t = t.filter(m)
        cents = _cents(t["l_extendedprice"]).to_numpy(zero_copy_only=False)
        bp = pc.round(pc.multiply(t["l_discount"], 10000)).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "s_suppkey": t["l_suppkey"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "rev": cents * (10000 - bp)})
        g = df.groupby("s_suppkey", as_index=False).agg(rev=("rev", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = read_table(
        sf_dir, "lineitem",
        columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"]
    ).map_batches(partial, batch_format="pyarrow",
                  zero_copy_batch=True).to_pandas()
    if len(parts) == 0:
        return pd.DataFrame({"s_suppkey": pd.Series(dtype=np.int64),
                             "s_name": pd.Series(dtype=object),
                             "total_revenue_de4": pd.Series(dtype=np.int64)})
    rev = parts.groupby("s_suppkey", as_index=False).agg(
        total_revenue_de4=("rev", "sum"))
    top = rev[rev["total_revenue_de4"] == rev["total_revenue_de4"].max()]
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_name"]).to_pandas()
    out = top.merge(supp, on="s_suppkey").sort_values(
        "s_suppkey").reset_index(drop=True)
    return out[["s_suppkey", "s_name", "total_revenue_de4"]].astype(
        {"s_suppkey": np.int64, "total_revenue_de4": np.int64})


Q15_TOP_SUPPLIER_SQL = f"""
WITH r AS (
  SELECT l_suppkey AS s_suppkey,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                  * (10000 - CAST(ROUND(l_discount * 10000) AS BIGINT)))
              AS BIGINT) AS total_revenue_de4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{_Q15_LO} 00:00:00'
    AND l_shipdate < TIMESTAMP '{_Q15_HI} 00:00:00'
  GROUP BY 1)
SELECT s_suppkey, s_name, total_revenue_de4
FROM r JOIN supplier USING (s_suppkey)
WHERE total_revenue_de4 = (SELECT MAX(total_revenue_de4) FROM r)
ORDER BY s_suppkey
"""


_Q19_CLAUSES = [
    ("Brand#11", 1, 5, 1, 11),
    ("Brand#22", 1, 10, 10, 20),
    ("Brand#33", 1, 15, 20, 30),
]


def q19_disjunctive_revenue(sf_dir: str) -> pd.DataFrame:
    """(revenue_de4) one row — TPC-H Q19 discounted revenue under an
    OR-of-ANDs predicate mixing part attributes (brand, size) with lineitem
    attributes (quantity).

    Part attributes become two catalog-bound broadcast LUTs (brand-clause
    id and size per partkey); every clause evaluates as a vectorized mask
    over the lineitem scan, so the whole disjunction is a single pass with
    scalar partials — zero exchange, zero join."""
    import pyarrow.parquet as pq

    from ..sources.tables import read_table

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand", "p_size"])
    pk = part["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    brand = part["p_brand"].to_pylist()
    size = part["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
    clause_id = np.full(int(pk.max()) + 1, -1, dtype=np.int64)
    size_lut = np.zeros(int(pk.max()) + 1, dtype=np.int64)
    size_lut[pk] = size
    bmap = {b: i for i, (b, *_rest) in enumerate(_Q19_CLAUSES)}
    cid = np.array([bmap.get(b, -1) for b in brand], dtype=np.int64)
    clause_id[pk] = cid
    luts = ray.put((clause_id, size_lut))

    def partial(t: pa.Table) -> pa.Table:
        cl, sl = ray.get(luts)
        pkey = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        qty = pc.round(t["l_quantity"]).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        c = cl[pkey]
        s = sl[pkey]
        keep = np.zeros(len(pkey), dtype=bool)
        for i, (_b, slo, shi, qlo, qhi) in enumerate(_Q19_CLAUSES):
            keep |= ((c == i) & (s >= slo) & (s <= shi)
                     & (qty >= qlo) & (qty <= qhi))
        cents = _cents(t["l_extendedprice"]).to_numpy(zero_copy_only=False)
        bp = pc.round(pc.multiply(t["l_discount"], 10000)).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        rev = int((cents[keep] * (10000 - bp[keep])).sum())
        return pa.table({"revenue_de4": pa.array([rev], pa.int64())})

    parts = read_table(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"]
    ).map_batches(partial, batch_format="pyarrow",
                  zero_copy_batch=True).to_pandas()
    return pd.DataFrame(
        {"revenue_de4": [np.int64(parts["revenue_de4"].sum())]})


Q19_DISJUNCTIVE_SQL = """
SELECT CAST(COALESCE(SUM(
         CAST(ROUND(l_extendedprice * 100) AS BIGINT)
         * (10000 - CAST(ROUND(l_discount * 10000) AS BIGINT))), 0)
       AS BIGINT) AS revenue_de4
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE """ + " OR ".join(
    f"""(p_brand = '{b}' AND p_size BETWEEN {slo} AND {shi}
     AND CAST(ROUND(l_quantity) AS BIGINT) BETWEEN {qlo} AND {qhi})"""
    for b, slo, shi, qlo, qhi in _Q19_CLAUSES)


_Q2_SIZE_LO = 10
_Q2_SIZE_HI = 20
_Q2_TYPE = "LARGE"
_Q2_PACK = 1 << 21  # suppkey fits below; packed min = lexicographic argmin


def q2_min_cost_supplier(sf_dir: str) -> pd.DataFrame:
    """(s_acctbal_cents, s_name, n_name, p_partkey, min_price_cents) —
    TPC-H Q2 minimum-cost-supplier shape on the testdata schema: for every
    part of one size/type class, the supplier offering the lowest observed
    price (lineitem extendedprice stands in for partsupp supplycost),
    suppkey as the deterministic tiebreak, top 100 by account balance.

    The correlated MIN subquery is ONE partkey exchange of packed-int64
    argmin partials (price_cents << 21 | suppkey — integer min IS the
    lexicographic (price, suppkey) argmin, the similarity.py:225 trick);
    supplier/nation attributes are catalog-bound driver-side joins on the
    ≤|parts| result."""
    import pyarrow.parquet as pq

    from ..sources.tables import read_table
    from ..stages.shuffle import arrow_group_agg, hash_exchange_apply

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_size", "p_type"])
    m = pc.and_(pc.and_(pc.greater_equal(part["p_size"], _Q2_SIZE_LO),
                        pc.less_equal(part["p_size"], _Q2_SIZE_HI)),
                pc.equal(part["p_type"], _Q2_TYPE))
    keys = pa.array(part.filter(m)["p_partkey"]
                    .to_numpy(zero_copy_only=False).astype(np.int64))
    keys_ref = ray.put(keys)

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["l_partkey"].cast(pa.int64()),
                              value_set=ray.get(keys_ref)))
        cents = _cents(t["l_extendedprice"]).to_numpy(zero_copy_only=False)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return arrow_group_agg(
            pa.table({"pk": t["l_partkey"].cast(pa.int64()),
                      "packed": pa.array(cents * _Q2_PACK + sk)}),
            ["pk"], [("packed", "min")])

    li = read_table(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_suppkey", "l_extendedprice"]
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    _out = pa.schema([("pk", pa.int64()), ("packed", pa.int64())])

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "pk" not in t.column_names:
            return _out.empty_table()
        return arrow_group_agg(t, ["pk"], [("packed", "min")])

    parts = hash_exchange_apply(li, ["pk"], lambda t: t, final,
                                n_buckets=16).to_pandas()
    cols = ["s_acctbal_cents", "s_name", "n_name", "p_partkey",
            "min_price_cents"]
    if "pk" not in parts.columns or len(parts) == 0:
        return pd.DataFrame({c: pd.Series(dtype=(object if c in
                            ("s_name", "n_name") else np.int64))
                             for c in cols})
    parts["p_partkey"] = parts["pk"]
    parts["min_price_cents"] = parts["packed"] // _Q2_PACK
    parts["s_suppkey"] = parts["packed"] % _Q2_PACK
    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_name", "s_nationkey", "s_acctbal"]
    ).to_pandas()
    supp["s_acctbal_cents"] = np.rint(
        supp["s_acctbal"] * 100).astype(np.int64)
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"]).to_pandas()
    out = (parts.merge(supp, on="s_suppkey")
           .merge(nation, left_on="s_nationkey", right_on="n_nationkey"))
    out = out.sort_values(
        ["s_acctbal_cents", "n_name", "s_name", "p_partkey"],
        ascending=[False, True, True, True]).head(100).reset_index(drop=True)
    return out[cols].astype({"s_acctbal_cents": np.int64,
                             "p_partkey": np.int64,
                             "min_price_cents": np.int64})


Q2_MIN_COST_SUPPLIER_SQL = f"""
WITH cand AS (SELECT p_partkey FROM part
              WHERE p_size BETWEEN {_Q2_SIZE_LO} AND {_Q2_SIZE_HI}
                AND p_type = '{_Q2_TYPE}'),
mp AS (SELECT l_partkey AS p_partkey,
              MIN(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                  * {_Q2_PACK} + l_suppkey) AS packed
       FROM lineitem JOIN cand ON l_partkey = p_partkey GROUP BY 1)
SELECT CAST(ROUND(s_acctbal * 100) AS BIGINT) AS s_acctbal_cents,
       s_name, n_name, p_partkey,
       CAST(packed // {_Q2_PACK} AS BIGINT) AS min_price_cents
FROM mp JOIN supplier ON packed % {_Q2_PACK} = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
ORDER BY s_acctbal_cents DESC, n_name, s_name, p_partkey LIMIT 100
"""


_Q16_BRAND_NOT = "Brand#45"
_Q16_TYPE_NOT = "PROMO"
_Q16_SIZES = (1, 5, 9, 13, 17, 21, 25, 29)
_Q16_COMPLAINT_SUFFIX = "7"


def q16_supplier_part_counts(sf_dir: str) -> pd.DataFrame:
    """(p_brand, p_type, p_size, supplier_cnt) — TPC-H Q16 supplier count
    per part-attribute group: distinct suppliers observed shipping parts of
    each (brand, type, size) class, excluding complaint-list suppliers
    (lineitem stands in for partsupp as the part↔supplier association).

    COUNT(DISTINCT) across groups partitions on SUPPKEY, not the group key:
    the scan emits block-distinct (group-id, suppkey) pairs, one suppkey
    exchange dedups globally (each supplier lives in exactly one bucket, so
    per-group partial counts add without double-counting), and the driver
    folds rows bounded by |groups| × buckets."""
    import pyarrow.parquet as pq

    from ..sources.tables import read_table
    from ..stages.shuffle import arrow_group_agg, hash_exchange_apply

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand", "p_type", "p_size"])
    m = pc.and_(pc.and_(pc.not_equal(part["p_brand"], _Q16_BRAND_NOT),
                        pc.not_equal(part["p_type"], _Q16_TYPE_NOT)),
                pc.is_in(part["p_size"],
                         value_set=pa.array(list(_Q16_SIZES),
                                            part["p_size"].type)))
    part = part.filter(m)
    pk = part["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    groups = pd.DataFrame({
        "p_brand": part["p_brand"].to_pylist(),
        "p_type": part["p_type"].to_pylist(),
        "p_size": part["p_size"].to_numpy(zero_copy_only=False)
        .astype(np.int64)}).drop_duplicates().reset_index(drop=True)
    gkey = {(b, t, s): i for i, (b, t, s) in enumerate(
        zip(groups["p_brand"], groups["p_type"], groups["p_size"]))}
    gid_of_part = np.array(
        [gkey[(b, t, int(s))] for b, t, s in zip(
            part["p_brand"].to_pylist(), part["p_type"].to_pylist(),
            part["p_size"].to_numpy(zero_copy_only=False))],
        dtype=np.int64)
    max_pk = int(pk.max()) if len(pk) else 0
    gid_lut = np.full(max_pk + 1, -1, dtype=np.int64)
    gid_lut[pk] = gid_of_part

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_name"])
    bad = pa.array(
        supp.filter(pc.ends_with(supp["s_name"], _Q16_COMPLAINT_SUFFIX))
        ["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64))
    bcast = ray.put((gid_lut, bad))

    def partial(t: pa.Table) -> pa.Table:
        gl, badkeys = ray.get(bcast)
        pkey = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ok = (pkey <= len(gl) - 1) & (gl[np.minimum(pkey, len(gl) - 1)] >= 0)
        t = t.filter(pa.array(ok))
        t = t.filter(pc.invert(pc.is_in(
            t["l_suppkey"].cast(pa.int64()), value_set=badkeys)))
        pkey = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = pa.table({"gid": pa.array(gl[pkey]),
                      "sk": t["l_suppkey"].cast(pa.int64())})
        return d.group_by(["gid", "sk"]).aggregate([])

    li = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_suppkey"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)

    _out = pa.schema([("gid", pa.int64()), ("n", pa.int64())])

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "gid" not in t.column_names:
            return _out.empty_table()
        d = t.group_by(["gid", "sk"]).aggregate([])
        return arrow_group_agg(
            pa.table({"gid": d["gid"],
                      "n": pa.array(np.ones(d.num_rows, np.int64))}),
            ["gid"], [("n", "sum")])

    parts = hash_exchange_apply(li, ["sk"], lambda t: t, final,
                                n_buckets=16).to_pandas()
    if "gid" not in parts.columns or len(parts) == 0:
        return pd.DataFrame({"p_brand": pd.Series(dtype=object),
                             "p_type": pd.Series(dtype=object),
                             "p_size": pd.Series(dtype=np.int64),
                             "supplier_cnt": pd.Series(dtype=np.int64)})
    agg = parts.groupby("gid", as_index=False).agg(supplier_cnt=("n", "sum"))
    out = groups.join(agg.set_index("gid"), how="inner")
    out = out.sort_values(
        ["supplier_cnt", "p_brand", "p_type", "p_size"],
        ascending=[False, True, True, True]).reset_index(drop=True)
    return out[["p_brand", "p_type", "p_size", "supplier_cnt"]].astype(
        {"p_size": np.int64, "supplier_cnt": np.int64})


Q16_SUPPLIER_PART_COUNTS_SQL = f"""
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> '{_Q16_BRAND_NOT}' AND p_type <> '{_Q16_TYPE_NOT}'
  AND p_size IN {_Q16_SIZES}
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                        WHERE s_name LIKE '%{_Q16_COMPLAINT_SUFFIX}')
GROUP BY 1, 2, 3 ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


_Q20_PREFIX = "small"
_Q20_LO = "1996-01-01"
_Q20_HI = "1997-01-01"


def q20_dominant_suppliers(sf_dir: str) -> pd.DataFrame:
    """(s_suppkey, s_name) — TPC-H Q20 nested-semi-join shape: suppliers
    who shipped MORE THAN HALF of some prefix-named part's total quantity
    in one year (availqty > 0.5·sum(qty) restated over the observed
    shipments; integer cross-multiplication 2·q > total avoids the 0.5).

    Prefix partkeys broadcast into the scan; per-block (partkey, suppkey)
    qty partials; ONE partkey exchange evaluates the correlated total and
    emits the qualifying suppkeys (supplier-domain-bounded); the final
    name join is a catalog lookup on the driver."""
    import pyarrow.parquet as pq

    from ..sources.tables import read_table
    from ..stages.shuffle import arrow_group_agg, hash_exchange_apply

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_name"])
    keys = pa.array(
        part.filter(pc.starts_with(part["p_name"], _Q20_PREFIX))
        ["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64))
    keys_ref = ray.put(keys)
    lo = np.datetime64(_Q20_LO, "us")
    hi = np.datetime64(_Q20_HI, "us")

    def partial(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
                    pc.less(t["l_shipdate"], pa.scalar(hi)))
        t = t.filter(m)
        t = t.filter(pc.is_in(t["l_partkey"].cast(pa.int64()),
                              value_set=ray.get(keys_ref)))
        return arrow_group_agg(
            pa.table({"pk": t["l_partkey"].cast(pa.int64()),
                      "sk": t["l_suppkey"].cast(pa.int64()),
                      "q": pc.round(t["l_quantity"]).cast(pa.int64())}),
            ["pk", "sk"], [("q", "sum")])

    li = read_table(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"]
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    _out = pa.schema([("sk", pa.int64())])

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "pk" not in t.column_names:
            return _out.empty_table()
        g = arrow_group_agg(t, ["pk", "sk"], [("q", "sum")])
        df = g.to_pandas()
        tot = df.groupby("pk")["q"].transform("sum")
        win = df.loc[2 * df["q"] > tot, "sk"].drop_duplicates()
        return pa.table({"sk": pa.array(win.to_numpy(np.int64))})

    parts = hash_exchange_apply(li, ["pk"], lambda t: t, final,
                                n_buckets=16).to_pandas()
    if "sk" not in parts.columns or len(parts) == 0:
        return pd.DataFrame({"s_suppkey": pd.Series(dtype=np.int64),
                             "s_name": pd.Series(dtype=object)})
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_name"]).to_pandas()
    sk = parts["sk"].drop_duplicates()
    out = supp[supp["s_suppkey"].isin(set(sk))].sort_values(
        "s_suppkey").reset_index(drop=True)
    return out[["s_suppkey", "s_name"]].astype({"s_suppkey": np.int64})


Q20_DOMINANT_SUPPLIERS_SQL = f"""
WITH pp AS (SELECT p_partkey FROM part WHERE p_name LIKE '{_Q20_PREFIX}%'),
agg AS (SELECT l_partkey, l_suppkey,
               SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS q
        FROM lineitem JOIN pp ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '{_Q20_LO} 00:00:00'
          AND l_shipdate < TIMESTAMP '{_Q20_HI} 00:00:00'
        GROUP BY 1, 2),
tot AS (SELECT l_partkey, SUM(q) AS tq FROM agg GROUP BY 1)
SELECT DISTINCT s_suppkey, s_name
FROM agg JOIN tot USING (l_partkey)
JOIN supplier ON l_suppkey = s_suppkey
WHERE 2 * q > tq ORDER BY s_suppkey
"""


_Q12_LO = "1996-01-01"
_Q12_HI = "1997-01-01"
_Q12_HIGH = ("1-URGENT", "2-HIGH")


def q12_priority_lines(sf_dir: str) -> pd.DataFrame:
    """(l_returnflag, high_line_count, low_line_count) — TPC-H Q12 shape on
    the testdata schema (no l_shipmode: l_returnflag takes its place as the
    grouping column; the orders join still carries the priority split).

    Both sides are corpus-sized, so this is ONE orderkey exchange: lineitem
    blocks collapse to (orderkey, flag)-keyed line counts, orders blocks
    ship (orderkey, is_high) bits, and each reducer joins locally and emits
    flag×2-bounded partials for a driver fold."""
    from ..sources.tables import read_table
    from ..stages.shuffle import arrow_group_agg, hash_exchange_apply

    lo = np.datetime64(_Q12_LO, "us")
    hi = np.datetime64(_Q12_HI, "us")

    def li_partial(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
                    pc.less(t["l_shipdate"], pa.scalar(hi)))
        t = t.filter(m)
        g = arrow_group_agg(
            pa.table({"__key": t["l_orderkey"].cast(pa.int64()),
                      "flag": t["l_returnflag"],
                      "n": pa.array(np.ones(t.num_rows, np.int64))}),
            ["__key", "flag"], [("n", "sum")])
        return g.append_column("hi", pa.nulls(g.num_rows, pa.int64()))

    li = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_returnflag", "l_shipdate"]
    ).map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True)

    def o_view(t: pa.Table) -> pa.Table:
        is_hi = pc.is_in(t["o_orderpriority"],
                         value_set=pa.array(list(_Q12_HIGH))).cast(pa.int64())
        return pa.table({"__key": t["o_orderkey"].cast(pa.int64()),
                         "flag": pa.nulls(t.num_rows, pa.string()),
                         "n": pa.nulls(t.num_rows, pa.int64()),
                         "hi": is_hi})

    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"]
    ).map_batches(o_view, batch_format="pyarrow", zero_copy_batch=True)

    _out = pa.schema([("l_returnflag", pa.string()),
                      ("high_line_count", pa.int64()),
                      ("low_line_count", pa.int64())])

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "flag" not in t.column_names:
            return _out.empty_table()
        lt = t.filter(pc.is_valid(t["flag"]))
        ot = t.filter(pc.is_valid(t["hi"]))
        if lt.num_rows == 0 or ot.num_rows == 0:
            return _out.empty_table()
        lg = arrow_group_agg(
            pa.table({"__key": lt["__key"].cast(pa.int64()).combine_chunks(),
                      "flag": lt["flag"].combine_chunks(),
                      "n": lt["n"].cast(pa.int64()).combine_chunks()}),
            ["__key", "flag"], [("n", "sum")])
        ok = pa.table({"__key": ot["__key"].cast(pa.int64()).combine_chunks(),
                       "hi": ot["hi"].cast(pa.int64()).combine_chunks()})
        j = lg.join(ok, keys="__key", join_type="inner")
        n = j["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        hi_bit = j["hi"].to_numpy(zero_copy_only=False).astype(np.int64)
        return arrow_group_agg(
            pa.table({"l_returnflag": j["flag"],
                      "high_line_count": pa.array(n * hi_bit),
                      "low_line_count": pa.array(n * (1 - hi_bit))}),
            ["l_returnflag"],
            [("high_line_count", "sum"), ("low_line_count", "sum")])

    parts = hash_exchange_apply(li.union(orders), ["__key"], lambda t: t,
                                final, n_buckets=16).to_pandas()
    if "l_returnflag" not in parts.columns or len(parts) == 0:
        return pd.DataFrame({"l_returnflag": pd.Series(dtype=object),
                             "high_line_count": pd.Series(dtype=np.int64),
                             "low_line_count": pd.Series(dtype=np.int64)})
    out = parts.groupby("l_returnflag", as_index=False).agg(
        high_line_count=("high_line_count", "sum"),
        low_line_count=("low_line_count", "sum"))
    out = out.sort_values("l_returnflag").reset_index(drop=True)
    return out.astype({"high_line_count": np.int64,
                       "low_line_count": np.int64})


Q12_PRIORITY_LINES_SQL = f"""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('{_Q12_HIGH[0]}',
                '{_Q12_HIGH[1]}') THEN 1 ELSE 0 END) AS BIGINT)
       AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('{_Q12_HIGH[0]}',
                '{_Q12_HIGH[1]}') THEN 0 ELSE 1 END) AS BIGINT)
       AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '{_Q12_LO} 00:00:00'
  AND l_shipdate < TIMESTAMP '{_Q12_HI} 00:00:00'
GROUP BY 1 ORDER BY 1
"""


_Q11_NUM = 3  # keep parts with value > 1.5 x the mean part value
_Q11_DEN = 2


def q11_important_stock(sf_dir: str) -> pd.DataFrame:
    """(p_partkey, value_cents) — TPC-H Q11 important-stock shape: parts
    whose total shipped value (price × quantity) exceeds a multiple of the
    MEAN part value, descending by value (lineitem stands in for partsupp
    availqty × supplycost; the mean-relative threshold is the
    scale-invariant restatement of Q11's fixed global fraction — a fixed
    fraction empties as |parts| grows).

    The correlated global-scalar HAVING needs no second pass: ONE partkey
    exchange yields exact per-part values, the driver folds bucket
    subtotals into (total, n_parts) and applies the integer
    cross-multiplied threshold value·DEN·n > NUM·total in Python ints
    (arbitrary precision — no wrap at any scale)."""
    from ..sources.tables import read_table
    from ..stages.shuffle import arrow_group_agg, hash_exchange_apply

    def partial(t: pa.Table) -> pa.Table:
        cents = _cents(t["l_extendedprice"]).to_numpy(zero_copy_only=False)
        qty = pc.round(t["l_quantity"]).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        return arrow_group_agg(
            pa.table({"pk": t["l_partkey"].cast(pa.int64()),
                      "v": pa.array(cents * qty)}),
            ["pk"], [("v", "sum")])

    li = read_table(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice"]
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    _out = pa.schema([("pk", pa.int64()), ("v", pa.int64())])

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "pk" not in t.column_names:
            return _out.empty_table()
        return arrow_group_agg(t, ["pk"], [("v", "sum")])

    parts = hash_exchange_apply(li, ["pk"], lambda t: t, final,
                                n_buckets=16).to_pandas()
    if "pk" not in parts.columns or len(parts) == 0:
        return pd.DataFrame({"p_partkey": pd.Series(dtype=np.int64),
                             "value_cents": pd.Series(dtype=np.int64)})
    total = int(parts["v"].sum())
    n = len(parts)
    keep = parts[parts["v"].astype(object) * _Q11_DEN * n
                 > _Q11_NUM * total]
    out = keep.rename(columns={"pk": "p_partkey", "v": "value_cents"})
    out = out.sort_values(["value_cents", "p_partkey"],
                          ascending=[False, True]).reset_index(drop=True)
    return out[["p_partkey", "value_cents"]].astype(
        {"p_partkey": np.int64, "value_cents": np.int64})


Q11_IMPORTANT_STOCK_SQL = f"""
WITH v AS (SELECT l_partkey AS p_partkey,
                  CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                           * CAST(ROUND(l_quantity) AS BIGINT))
                       AS BIGINT) AS value_cents
           FROM lineitem GROUP BY 1)
SELECT p_partkey, value_cents FROM v
WHERE CAST(value_cents AS HUGEINT) * {_Q11_DEN}
      * (SELECT COUNT(*) FROM v)
      > CAST({_Q11_NUM} AS HUGEINT) * (SELECT SUM(value_cents) FROM v)
ORDER BY value_cents DESC, p_partkey
"""
