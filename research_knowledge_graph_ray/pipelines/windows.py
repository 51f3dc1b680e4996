"""Windowed / ordered-log operators over the events table.

Ray Data has no event-time windows; window semantics are expressed as
partition-by-key + sort-within-partition, per the guide: tumbling windows are
a floored-timestamp groupby (relational.events_hourly), session windows are a
per-key cumulative-gap scan, and as-of enrichment is a partitioned merge_asof
(stages/join.py). Each has an exact DuckDB oracle (window functions /
ASOF JOIN)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..stages.join import asof_join, hash_join
from ..stages.shuffle import bucketed_group_apply

SESSION_GAP_MIN = 60


def events_sessions(sf_dir: str, gap_minutes: int = SESSION_GAP_MIN) -> "ray.data.Dataset":
    """Session windows per user: a new session starts when the gap to the
    previous event exceeds ``gap_minutes``. Output one row per session:
    (user_id, session_id, n_events, start_us, end_us).

    Ordering assumption: events sort by (ts, event_id) within each user —
    stated per the guide; the DuckDB oracle uses the same window order."""

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_id", "ts"])
    gap = np.timedelta64(gap_minutes, "m")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        # fully vectorized sessionization: one sort of the whole bucket, then
        # diff + user-change mask + cumsum — no per-user Python loop
        if not len(df):
            return pd.DataFrame(
                {"user_id": pd.Series(dtype=np.int64),
                 "session_id": pd.Series(dtype=np.int64),
                 "n_events": pd.Series(dtype=np.int64),
                 "start_us": pd.Series(dtype=np.int64),
                 "end_us": pd.Series(dtype=np.int64)}
            )
        df = df.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
        new_user = df["user_id"].ne(df["user_id"].shift())
        brk = new_user | (df["ts"].diff() > gap)
        sid = brk.groupby(df["user_id"].to_numpy()).cumsum().astype(np.int64)
        agg = (
            df.assign(_g=brk.cumsum(), session_id=sid)
            .groupby("_g", sort=False)
            .agg(user_id=("user_id", "first"), session_id=("session_id", "first"),
                 n_events=("event_id", "size"), start=("ts", "min"), end=("ts", "max"))
        )
        return pd.DataFrame(
            {
                "user_id": agg["user_id"].to_numpy().astype(np.int64),
                "session_id": agg["session_id"].to_numpy(),
                "n_events": agg["n_events"].to_numpy().astype(np.int64),
                "start_us": agg["start"].astype("datetime64[us]").astype(np.int64).to_numpy(),
                "end_us": agg["end"].astype("datetime64[us]").astype(np.int64).to_numpy(),
            }
        )

    # identity partial: the session scan needs every row of a user together
    return bucketed_group_apply(ev, ["user_id"], lambda df: df, final, n_buckets=8)


EVENTS_SESSIONS_SQL = f"""
WITH x AS (
  SELECT user_id, event_id, ts,
    CASE WHEN LAG(ts) OVER w IS NULL
           OR ts - LAG(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTES
         THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, ts,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
  FROM x)
SELECT user_id, CAST(sid AS BIGINT) AS session_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(epoch_us(MIN(ts)) AS BIGINT) AS start_us,
       CAST(epoch_us(MAX(ts)) AS BIGINT) AS end_us
FROM s GROUP BY user_id, sid
"""


def events_latest_order(sf_dir: str) -> "ray.data.Dataset":
    """As-of enrichment: each event joined to the user's most recent order at
    or before the event time (inner). Exercises the partitioned merge_asof."""
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "user_id", "ts"])
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_custkey", "o_orderdate", "o_orderkey"])

    # determinism: one order per (custkey, date) — keep max orderkey
    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["o_custkey", "o_orderdate"], as_index=False).agg(
            o_orderkey=("o_orderkey", "max"))

    orders_u = bucketed_group_apply(orders, ["o_custkey"], dedup, dedup, n_buckets=8)

    out = asof_join(
        ev, orders_u,
        by_left="user_id", by_right="o_custkey",
        ts_left="ts", ts_right="o_orderdate",
        left_cols=["event_id", "user_id", "ts"],
        right_cols=["o_custkey", "o_orderdate", "o_orderkey"],
    )

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": df["event_id"].astype(np.int64),
                "user_id": df["user_id"].astype(np.int64),
                "o_orderkey": df["o_orderkey"].astype(np.int64),
            }
        )

    return out.map_batches(project, batch_format="pandas")


EVENTS_LATEST_ORDER_SQL = """
WITH o AS (SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
           FROM orders GROUP BY 1, 2)
SELECT e.event_id, e.user_id, o.o_orderkey
FROM events e
ASOF JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
"""


SLIDE_HOURS, SLIDE_STEP_HOURS = 6, 2


def events_sliding(sf_dir: str, window_h: int = SLIDE_HOURS,
                   step_h: int = SLIDE_STEP_HOURS) -> "ray.data.Dataset":
    """Sliding (hopping) window: events per (event_type, 6h window hopping
    every 2h). Each event replicates into window_h/step_h windows INSIDE the
    batch (vectorized np.repeat — replication factor is the constant w/s,
    never data-dependent), then per-batch partial counts flow into one
    grouped exchange — the hopping-window analogue of the tumbling
    events_hourly. Window key = epoch-hours of the window start."""
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])
    n_win = window_h // step_h

    def partial(batch: pa.Table) -> pd.DataFrame:
        s = pd.Series(batch["ts"].to_numpy(zero_copy_only=False))
        eh = (s.astype("datetime64[s]").astype(np.int64) // 3600).to_numpy()
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        # windows covering hour h start at step*floor(h/step) - k*step,
        # k = 0..n_win-1, keeping only starts with h < start + window
        base = (eh // step_h) * step_h
        starts = np.repeat(base, n_win) - np.tile(
            np.arange(n_win, dtype=np.int64) * step_h, len(eh))
        types = np.repeat(et, n_win)
        hours = np.repeat(eh, n_win)
        keep = hours < starts + window_h
        df = pd.DataFrame({"event_type": types[keep], "win_start_h": starts[keep]})
        return df.groupby(["event_type", "win_start_h"], as_index=False).size().rename(
            columns={"size": "n_events"})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["event_type", "win_start_h"], as_index=False).agg(
            n_events=("n_events", "sum"))
        out["win_start_h"] = out["win_start_h"].astype(np.int64)
        out["n_events"] = out["n_events"].astype(np.int64)
        return out

    parts = ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return bucketed_group_apply(parts, ["event_type", "win_start_h"], final, final,
                                n_buckets=16)


EVENTS_SLIDING_SQL = f"""
WITH e AS (SELECT event_type,
                  CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS eh FROM events),
w AS (SELECT e.event_type,
             (eh // {SLIDE_STEP_HOURS}) * {SLIDE_STEP_HOURS}
               - k.k * {SLIDE_STEP_HOURS} AS win_start_h, eh
      FROM e, (SELECT UNNEST(range(0, {SLIDE_HOURS // SLIDE_STEP_HOURS})) AS k) k)
SELECT event_type, CAST(win_start_h AS BIGINT) AS win_start_h,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM w WHERE eh < win_start_h + {SLIDE_HOURS}
GROUP BY 1, 2
"""


def top_orders_per_customer(sf_dir: str, k: int = 3) -> "ray.data.Dataset":
    """Per-group top-k: each customer's k most expensive orders (price desc,
    orderkey asc tiebreak). Per-batch partial top-k per customer shrinks
    blocks BEFORE the customer-keyed exchange — the grouped analogue of the
    global partial-top-k pattern in knn_topk."""
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderkey", "o_totalprice"])

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        if "cents" not in df.columns:
            df = pd.DataFrame(
                {"o_custkey": df["o_custkey"].astype(np.int64),
                 "o_orderkey": df["o_orderkey"].astype(np.int64),
                 "cents": (df["o_totalprice"] * 100).round().astype(np.int64)})
        df = df.sort_values(["o_custkey", "cents", "o_orderkey"],
                            ascending=[True, False, True])
        out = df.groupby("o_custkey", as_index=False).head(k)
        out["rank"] = out.groupby("o_custkey").cumcount().astype(np.int64) + 1
        return out[["o_custkey", "o_orderkey", "cents", "rank"]]

    return bucketed_group_apply(orders, ["o_custkey"], topk, topk, n_buckets=8)


TOP_ORDERS_PER_CUSTOMER_SQL = """
SELECT o_custkey, o_orderkey, cents, rank FROM (
  SELECT o_custkey, o_orderkey,
         CAST(ROUND(o_totalprice*100) AS BIGINT) AS cents,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
              ORDER BY ROUND(o_totalprice*100) DESC, o_orderkey) AS BIGINT) AS rank
  FROM orders)
WHERE rank <= 3
"""


def customers_without_orders(sf_dir: str, year: int = 1995) -> "ray.data.Dataset":
    """Anti-join: customers with no order in ``year`` — the key-only-shuffle
    semi/anti pattern (right side reduced to distinct keys per block before
    the exchange; row-group date filter pushed to the read)."""
    import datetime

    import pyarrow.compute as pc

    from ..stages.join import semi_anti_join

    customers = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                      columns=["c_custkey", "c_name"])
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"],
        filter=(pc.field("o_orderdate") >= datetime.datetime(year, 1, 1))
        & (pc.field("o_orderdate") < datetime.datetime(year + 1, 1, 1)),
    )
    out = semi_anti_join(customers, orders, "c_custkey", "o_custkey",
                         ["c_custkey", "c_name"], anti=True, n_buckets=8)

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"c_custkey": df["c_custkey"].astype(np.int64),
                             "c_name": df["c_name"].astype(str)})

    return out.map_batches(project, batch_format="pandas")


CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1995)
"""


def _order_cents(sf_dir: str) -> "ray.data.Dataset":
    """orders projected to (o_custkey, cents) with the shared integer-cents
    rounding rule — ONE definition so every money-join query stays
    oracle-exact together."""
    import pyarrow.compute as pc

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_custkey", "o_totalprice"])

    def cents(batch: pa.Table) -> pd.DataFrame:
        return pd.DataFrame(
            {"o_custkey": batch["o_custkey"].to_numpy(zero_copy_only=False),
             "cents": pc.round(pc.multiply(batch["o_totalprice"], 100))
             .cast(pa.int64()).to_numpy()}
        )

    return orders.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)


def _order_totals_agg(df: pd.DataFrame) -> pd.DataFrame:
    """Two-phase per-customer totals combine shared by the join variants."""
    if "cents" in df.columns:  # partial pass over joined rows
        g = df.groupby(["c_custkey", "c_name"], as_index=False).agg(
            n_orders=("cents", "size"), total_cents=("cents", "sum"))
    else:  # final combine over partials
        g = df.groupby(["c_custkey", "c_name"], as_index=False).agg(
            n_orders=("n_orders", "sum"), total_cents=("total_cents", "sum"))
    for c in ("c_custkey", "n_orders", "total_cents"):
        g[c] = g[c].astype(np.int64)
    return g


def customer_order_totals(sf_dir: str) -> "ray.data.Dataset":
    """orders ⋈ customer as a two-sided partitioned hash join (no broadcast),
    then per-customer totals — the both-sides-large join pattern."""
    customers = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                      columns=["c_custkey", "c_name"])
    joined = hash_join(
        _order_cents(sf_dir), customers,
        left_on="o_custkey", right_on="c_custkey",
        left_cols=["o_custkey", "cents"], right_cols=["c_custkey", "c_name"],
    )
    return bucketed_group_apply(joined, ["c_custkey"], _order_totals_agg,
                                _order_totals_agg, n_buckets=8)


CUSTOMER_ORDER_TOTALS_SQL = """
SELECT c_custkey, c_name, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
"""


def purchase_attribution(sf_dir: str, days: int = 7) -> "ray.data.Dataset":
    """(event_id, n_prior) — for each purchase event, how many same-user
    events landed in the preceding ``days`` days (strictly before the
    purchase). The attribution-window pattern: a range join events⋈events on
    user_id, answered per bucket by one build-side sort plus two
    lexicographic searchsorted probes (stages/join.py::range_count_join) —
    never a per-pair materialization."""
    from ..stages.join import range_count_join

    def probe_view(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "purchase"))
        start = pc.subtract(
            t["ts"], pa.scalar(np.timedelta64(days, "D").astype("timedelta64[us]")))
        return pa.table({"event_id": t["event_id"], "user_id": t["user_id"],
                         "start": start, "end": t["ts"]})

    probe = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    ).map_batches(probe_view, batch_format="pyarrow", zero_copy_batch=True)
    build = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )
    return range_count_join(
        probe, build, "user_id", "user_id",
        ["event_id"], "ts", "start", "end",
        out_count="n_prior", n_buckets=16,
        probe_casts={"event_id": "int64"},
    )


def vip_order_totals(sf_dir: str, min_acctbal: float = 9000.0) -> "ray.data.Dataset":
    """Per-VIP-customer order totals — the SELECTIVE-build-side join pattern:
    the filtered customer side blooms its keys (stages/join.py::build_bloom,
    128 KiB broadcast), and non-matching orders are dropped at the map side
    BEFORE the exchange — at 100 TB ~91% of order rows never ship."""
    import pyarrow.compute as pc

    from ..stages.join import hash_join_bloom

    vips = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_acctbal"],
    ).map_batches(
        lambda t: t.filter(pc.greater(t["c_acctbal"], min_acctbal))
        .select(["c_custkey", "c_name"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    joined = hash_join_bloom(
        _order_cents(sf_dir),
        vips, left_on="o_custkey", right_on="c_custkey",
        left_cols=["o_custkey", "cents"], right_cols=["c_custkey", "c_name"],
    )
    return bucketed_group_apply(joined, ["c_custkey"], _order_totals_agg,
                                _order_totals_agg, n_buckets=8)


VIP_ORDER_TOTALS_SQL = """
SELECT c_custkey, c_name, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE c_acctbal > 9000
GROUP BY c_custkey, c_name
"""


def customer_order_counts_all(sf_dir: str) -> "ray.data.Dataset":
    """EVERY customer with order count and total (0 for order-less customers)
    — the left-outer-join pattern (hash_join how='left'); NaN right columns
    from unmatched rows aggregate to 0 via count/sum skip-NaN semantics."""
    customers = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                      columns=["c_custkey", "c_name"])
    joined = hash_join(
        customers,
        _order_cents(sf_dir),
        left_on="c_custkey", right_on="o_custkey",
        left_cols=["c_custkey", "c_name"], right_cols=["o_custkey", "cents"],
        how="left",
    )

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        if "cents" in df.columns:
            g = df.groupby(["c_custkey", "c_name"], as_index=False).agg(
                n_orders=("cents", "count"),   # count skips NaN
                total_cents=("cents", "sum"))  # sum of all-NaN group = 0
        else:
            g = df.groupby(["c_custkey", "c_name"], as_index=False).agg(
                n_orders=("n_orders", "sum"), total_cents=("total_cents", "sum"))
        for c in ("c_custkey", "n_orders", "total_cents"):
            g[c] = g[c].astype(np.int64)
        return g

    return bucketed_group_apply(joined, ["c_custkey"], agg, agg, n_buckets=8)


CUSTOMER_ORDER_COUNTS_ALL_SQL = """
SELECT c_custkey, c_name, CAST(COUNT(o_custkey) AS BIGINT) AS n_orders,
       CAST(COALESCE(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)), 0) AS BIGINT)
           AS total_cents
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
"""


def customer_order_totals_salted(sf_dir: str) -> "ray.data.Dataset":
    """customer_order_totals routed through the SALTED hash join
    (stages/join.py::hash_join_salted, the hot-key mitigation): shares the
    exchange join's SQL oracle, proving the salted plan is row-identical."""
    from ..stages.join import hash_join_salted

    customers = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                      columns=["c_custkey", "c_name"])
    joined = hash_join_salted(
        _order_cents(sf_dir),
        customers,
        left_on="o_custkey", right_on="c_custkey",
        left_cols=["o_custkey", "cents"], right_cols=["c_custkey", "c_name"],
        n_salts=4,
    )
    return bucketed_group_apply(joined, ["c_custkey"], _order_totals_agg,
                                _order_totals_agg, n_buckets=8)


def bucketed_order_totals(sf_dir: str) -> "ray.data.Dataset":
    """customer_order_totals computed over a BUCKETED table layout
    (stages/bucketed.py): both tables are hash-bucketed on the customer key
    once (persisted as bucket=K/ parquet), then the join runs with NO
    exchange — one local merge task per co-bucketed pair. Same SQL oracle as
    the exchange-based join proves the layouts agree."""
    import hashlib

    from ..stages.bucketed import bucketed_join, write_bucketed

    customers = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                      columns=["c_custkey", "c_name"])
    # deterministic per-input path, overwritten in place by write_bucketed —
    # repeated query runs reuse one layout dir instead of leaking tmp copies
    root = ("/tmp/rkg_bucketed_layout_"
            + hashlib.md5(sf_dir.encode()).hexdigest()[:10])
    write_bucketed(_order_cents(sf_dir), "o_custkey", f"{root}/orders",
                   n_buckets=8)
    write_bucketed(customers, "c_custkey", f"{root}/customer", n_buckets=8)
    joined = bucketed_join(f"{root}/orders", f"{root}/customer",
                           "o_custkey", "c_custkey",
                           ["o_custkey", "cents"], ["c_custkey", "c_name"])

    # blocks are already bucketed by key, so the aggregate needs no second
    # exchange either: one local groupby per block
    return joined.map_batches(_order_totals_agg, batch_format="pandas",
                              batch_size=None)


def customer_rolling(sf_dir: str, window: int = 3) -> "ray.data.Dataset":
    """(o_orderkey, o_custkey, sum_last3_cents) — per-customer rolling sum
    over the last ``window`` orders (ROWS window-1 PRECEDING .. CURRENT ROW,
    ordered by date then key). One hash exchange on the partition key, then a
    fully vectorized per-bucket scan: grouped cumsum minus the cumsum shifted
    ``window`` rows within the group — no per-row or per-customer Python loop.
    Integer-cents sums keep the DuckDB window-function oracle exact."""

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"])

    def cents(batch: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc
        return pd.DataFrame({
            "o_orderkey": batch["o_orderkey"].to_numpy(zero_copy_only=False),
            "o_custkey": batch["o_custkey"].to_numpy(zero_copy_only=False),
            "o_orderdate": batch["o_orderdate"].to_numpy(zero_copy_only=False),
            "cents": pc.round(pc.multiply(batch["o_totalprice"], 100))
            .cast(pa.int64()).to_numpy(),
        })

    def roll(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"],
                            kind="mergesort").reset_index(drop=True)
        c = df.groupby("o_custkey", sort=False)["cents"].cumsum()
        prev = (df.assign(_c=c).groupby("o_custkey", sort=False)["_c"]
                .shift(window).fillna(0))
        out = df[["o_orderkey", "o_custkey"]].copy()
        # cumsum values < 2^53 — float round-trip through shift/fillna is exact
        out["sum_last3_cents"] = (c - prev).astype(np.int64)
        out["o_orderkey"] = out["o_orderkey"].astype(np.int64)
        out["o_custkey"] = out["o_custkey"].astype(np.int64)
        return out

    return bucketed_group_apply(
        orders.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True),
        ["o_custkey"], lambda df: df, roll, n_buckets=16)


def order_rank_in_month(sf_dir: str, top: int = 5) -> "ray.data.Dataset":
    """(o_orderkey, ym, rnk) — ROW_NUMBER ranking of orders by price within
    their calendar month, top ``top`` per month kept. One exchange on the
    partition key (ym), then a single sort + grouped cumcount per bucket —
    the rank/dense-rank window family, fully vectorized."""
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_totalprice"])

    def prep(batch: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc
        s = pd.Series(batch["o_orderdate"].to_numpy(zero_copy_only=False))
        return pd.DataFrame({
            "o_orderkey": batch["o_orderkey"].to_numpy(zero_copy_only=False),
            "ym": (s.dt.year * 100 + s.dt.month).astype(np.int64),
            "cents": pc.round(pc.multiply(batch["o_totalprice"], 100))
            .cast(pa.int64()).to_numpy(),
        })

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ym", "cents", "o_orderkey"],
                            ascending=[True, False, True],
                            kind="mergesort").reset_index(drop=True)
        rnk = df.groupby("ym", sort=False).cumcount().to_numpy() + 1
        out = df.assign(rnk=rnk)[rnk <= top]
        return pd.DataFrame({
            "o_orderkey": out["o_orderkey"].astype(np.int64),
            "ym": out["ym"].astype(np.int64),
            "rnk": out["rnk"].astype(np.int64),
        })

    return bucketed_group_apply(
        orders.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["ym"], lambda df: df, rank, n_buckets=8)


ORDER_RANK_IN_MONTH_SQL = """
SELECT o_orderkey, ym, rnk FROM (
  SELECT o_orderkey,
         CAST(YEAR(o_orderdate)*100 + MONTH(o_orderdate) AS BIGINT) AS ym,
         CAST(ROW_NUMBER() OVER (
              PARTITION BY YEAR(o_orderdate)*100 + MONTH(o_orderdate)
              ORDER BY CAST(ROUND(o_totalprice*100) AS BIGINT) DESC, o_orderkey)
              AS BIGINT) AS rnk
  FROM orders)
WHERE rnk <= 5
"""


CUSTOMER_ROLLING_SQL = """
SELECT o_orderkey, o_custkey,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
       AS sum_last3_cents
FROM orders
"""


PURCHASE_ATTRIBUTION_SQL = """
SELECT p.event_id, CAST(COUNT(b.event_id) AS BIGINT) AS n_prior
FROM events p JOIN events b
  ON b.user_id = p.user_id
 AND b.ts >= p.ts - INTERVAL 7 DAY AND b.ts < p.ts
WHERE p.event_type = 'purchase'
GROUP BY p.event_id
"""

def customer_order_gaps(sf_dir: str) -> "ray.data.Dataset":
    """(o_orderkey, o_custkey, gap_days) — days since the customer's
    previous order (LAG window; first order of a customer → -1). One hash
    exchange on the partition key, then a vectorized per-bucket scan:
    sort by (custkey, date, orderkey), grouped shift, day diff — the
    LAG/LEAD window family with no per-customer Python loop."""
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def prep(batch: pa.Table) -> pd.DataFrame:
        days = (batch["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
                .to_numpy() // 86_400_000_000)
        return pd.DataFrame({
            "o_orderkey": batch["o_orderkey"].to_numpy(zero_copy_only=False),
            "o_custkey": batch["o_custkey"].to_numpy(zero_copy_only=False),
            "day": days,
        })

    def gaps(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "day", "o_orderkey"],
                            kind="mergesort").reset_index(drop=True)
        prev = df.groupby("o_custkey", sort=False)["day"].shift(1)
        gap = (df["day"] - prev).fillna(-1).astype(np.int64)
        return pd.DataFrame({
            "o_orderkey": df["o_orderkey"].astype(np.int64),
            "o_custkey": df["o_custkey"].astype(np.int64),
            "gap_days": gap,
        })

    return bucketed_group_apply(
        orders.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["o_custkey"], lambda df: df, gaps, n_buckets=16)


CUSTOMER_ORDER_GAPS_SQL = """
SELECT o_orderkey, o_custkey,
       CAST(COALESCE(DATE_DIFF('day',
            LAG(o_orderdate) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
            o_orderdate), -1) AS BIGINT) AS gap_days
FROM orders
"""


def nation_year_revenue(sf_dir: str) -> "ray.data.Dataset":
    """(n_name, yr, revenue) — discounted lineitem revenue per nation-year:
    a multi-stage join plan (lineitem ⋈ orders big-big, customer→nation
    broadcast).

    Plan shape: lineitem pre-aggregates per order WITHIN each block before
    the exchange (the join then moves order-level partials, not line items);
    one partitioned hash join on orderkey; the two dimension hops ride a
    single broadcast dict; final (nation, year) rollup is a tiny exchange.
    Revenue uses the Q1 integer idiom (cents × (10000 − discount_bp)) so the
    oracle matches bit-for-bit."""
    import pyarrow.parquet as pq

    from ..stages.shuffle import bucketed_group_apply, grouped_aggregate

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    nk = dict(zip(nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist()))
    # broadcast as a sorted-key/value numpy pair: per-batch lookup is one
    # vectorized searchsorted + fancy index (no per-row dict .map), and no
    # density assumption on the custkey space
    ck = cust["c_custkey"].to_numpy()
    order = np.argsort(ck, kind="stable")
    ref = ray.put((
        ck[order],
        np.asarray([nk[k] for k in cust["c_nationkey"].to_pylist()],
                   dtype=object)[order],
    ))

    def li_partial(t: pa.Table) -> pa.Table:
        cents = np.rint(t["l_extendedprice"].to_numpy(zero_copy_only=False)
                        .astype(np.float64) * 100).astype(np.int64)
        bp = np.rint(t["l_discount"].to_numpy(zero_copy_only=False)
                     .astype(np.float64) * 10000).astype(np.int64)
        key = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = pa.table({"__key": key, "rev": cents * (10000 - bp)}).group_by(
            ["__key"]).aggregate([("rev", "sum")])
        g = g.rename_columns(
            ["rev" if c == "rev_sum" else c for c in g.column_names])
        return g.append_column("__side", pa.array(["l"] * g.num_rows))

    from ..sources.tables import read_table

    li = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    ).map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True)

    def ord_prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "__key": t["o_orderkey"].cast(pa.int64()),
            "o_custkey": t["o_custkey"],
            "yr": pc.year(t["o_orderdate"]).cast(pa.int64()),
            "__side": pa.array(["o"] * t.num_rows),
        })

    orders = read_table(
        sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(ord_prep, batch_format="pyarrow", zero_copy_batch=True)

    # FUSED reduce (r3 #5): the orderkey exchange's reducer merges the two
    # sides, resolves nation via the broadcast lookup and rolls up to
    # (n_name, yr) partials IN the bucket — the order-grain joined table
    # never materializes in the object store; only ~|nations×years| rows per
    # bucket leave the reduce. Int64 keys ride the exchange's native integer
    # hash (no string cast anywhere on the hot path).
    _ny_schema = pa.schema([("n_name", pa.string()), ("yr", pa.int64()),
                            ("revenue", pa.int64())])

    def fused_final(t: pa.Table) -> pa.Table:
        from ..stages.shuffle import arrow_group_agg

        keys, names = ray.get(ref)
        if (t.num_rows == 0
                or not {"__side", "__key", "rev", "o_custkey",
                        "yr"} <= set(t.column_names)):
            return _ny_schema.empty_table()
        lt = t.filter(pc.equal(t["__side"], "l"))
        ot = t.filter(pc.equal(t["__side"], "o"))
        if lt.num_rows == 0 or ot.num_rows == 0:
            return _ny_schema.empty_table()
        j = lt.select(["__key", "rev"]).join(
            ot.select(["__key", "o_custkey", "yr"]), keys="__key",
            join_type="inner")
        if j.num_rows == 0:
            return _ny_schema.empty_table()
        idx = np.searchsorted(
            keys, j["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64))
        out = pa.table({
            "n_name": pa.array(names[idx].tolist(), type=pa.string()),
            "yr": j["yr"].to_numpy(zero_copy_only=False).astype(np.int64),
            "revenue": j["rev"].to_numpy(zero_copy_only=False).astype(np.int64),
        })
        return arrow_group_agg(out, ["n_name", "yr"], [("revenue", "sum")])

    from ..stages.shuffle import arrow_group_agg, hash_exchange_apply

    parts = hash_exchange_apply(
        li.union(orders), ["__key"], lambda t: t, fused_final, n_buckets=32)

    def roll(t: pa.Table) -> pa.Table:
        return arrow_group_agg(t, ["n_name", "yr"], [("revenue", "sum")])

    return hash_exchange_apply(parts, ["n_name", "yr"], roll, roll, n_buckets=4)


def events_hourly_dense(sf_dir: str) -> "ray.data.Dataset":
    """(event_type, h, n_events) — gap-filled tumbling window: every
    (type, epoch-hour) slot between the global min and max hour appears,
    zero-filled where no events landed.

    The dense frame is generated DISTRIBUTED (ray.data.range over the hour
    span × broadcast type list) and left-joined against the hourly counts —
    the gap-fill never materializes on the driver, so an arbitrarily long
    time range streams like any other table."""
    from ray.data.aggregate import Max, Min

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "ts"])

    def hour_partial(batch: pa.Table) -> pd.DataFrame:
        us = batch["ts"].to_numpy(zero_copy_only=False).view("int64")
        df = pd.DataFrame({
            "event_type": batch["event_type"].to_numpy(zero_copy_only=False),
            "h": us // 3_600_000_000,
        })
        g = df.groupby(["event_type", "h"], as_index=False).size()
        return g.rename(columns={"size": "n"})

    counts = bucketed_group_apply(
        ev.map_batches(hour_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type", "h"],
        lambda df: df,
        lambda df: df.groupby(["event_type", "h"], as_index=False).agg(n=("n", "sum")),
        n_buckets=8,
    )

    def keyed_counts(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"key": df["event_type"] + "|" + df["h"].astype(str),
                             "n": df["n"].astype(np.int64)})

    hr = counts.map_batches(
        lambda df: df[["h"]], batch_format="pandas"
    ).aggregate(Min("h"), Max("h"))
    hmin, hmax = int(hr["min(h)"]), int(hr["max(h)"])
    types = sorted(
        counts.map_batches(lambda df: df[["event_type"]].drop_duplicates(),
                           batch_format="pandas")
        .to_pandas()["event_type"].unique()
    )
    ty_ref = ray.put(types)

    def dense(batch: dict) -> pd.DataFrame:
        tys = ray.get(ty_ref)
        h = batch["id"] + hmin
        return pd.DataFrame({
            "event_type": np.repeat(tys, len(h)),
            "h": np.tile(h, len(tys)),
        }).assign(key=lambda d: d["event_type"] + "|" + d["h"].astype(str))

    grid = ray.data.range(hmax - hmin + 1).map_batches(dense, batch_format="numpy")
    joined = hash_join(
        grid, counts.map_batches(keyed_counts, batch_format="pandas"),
        left_on="key", right_on="key",
        left_cols=["key", "event_type", "h"], right_cols=["key", "n"],
        how="left", n_buckets=8,
    )

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": df["event_type"].astype("string"),
            "h": df["h"].astype(np.int64),
            "n_events": df["n"].fillna(0).astype(np.int64),
        })

    return joined.map_batches(fin, batch_format="pandas")


def latest_event_per_user(sf_dir: str) -> "ray.data.Dataset":
    """(user_id, ts, event_id, event_type) — snapshot compaction: each user's
    most recent event (ties on ts broken by highest event_id).

    The CDC/upsert-compaction primitive (MERGE INTO's read side): per-block
    argmax partials mean the exchange moves ≤1 row per (user, block) — the
    event stream itself never shuffles. Same shape at any update-log size."""

    def keep_latest(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        out = df.drop_duplicates("user_id", keep="last")
        return out[["user_id", "ts", "event_id", "event_type"]].astype(
            {"event_type": "string"}
        )

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )
    return bucketed_group_apply(ev, ["user_id"], keep_latest, keep_latest,
                                n_buckets=8)


def user_retention(sf_dir: str) -> pd.DataFrame:
    """(cohort_d, d, n_users) — cohort retention: users grouped by the day of
    their first event (cohort), counted on every day they were active.

    One exchange, no self-join: the per-block partial is DISTINCT
    (user_id, day) — O(users × active-days), already heavily shrunk — and
    each user lands wholly in one bucket, so the reducer derives the cohort
    (min day) AND the per-(cohort, day) user counts locally; the final
    combine sums day²-bounded partials on the driver. The classic
    analytics query that naively needs events ⋈ first-seen; here first-seen
    rides the same exchange."""
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])
    day_us = 86_400_000_000

    def part(df: pd.DataFrame) -> pd.DataFrame:
        d = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64) // day_us
        return pd.DataFrame({"user_id": df["user_id"].to_numpy(np.int64),
                             "d": d}).drop_duplicates()

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"cohort_d": pd.Series(dtype=np.int64),
                                 "d": pd.Series(dtype=np.int64),
                                 "n_users": pd.Series(dtype=np.int64)})
        df = df.drop_duplicates(["user_id", "d"])
        df = df.assign(cohort_d=df.groupby("user_id")["d"].transform("min"))
        return (df.groupby(["cohort_d", "d"], as_index=False)
                .agg(n_users=("user_id", "size")))

    parts = bucketed_group_apply(ev, ["user_id"], part, fin).to_pandas()
    return (parts.groupby(["cohort_d", "d"], as_index=False)
            .agg(n_users=("n_users", "sum"))
            .sort_values(["cohort_d", "d"]).reset_index(drop=True))


USER_RETENTION_SQL = """
WITH dd AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS d
            FROM events),
f AS (SELECT user_id, MIN(d) AS cohort_d FROM dd GROUP BY 1)
SELECT CAST(f.cohort_d AS BIGINT) AS cohort_d, CAST(dd.d AS BIGINT) AS d,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM dd JOIN f USING (user_id) GROUP BY 1, 2
"""


def signup_purchase_funnel(sf_dir: str) -> "ray.data.Dataset":
    """(user_id, t_signup_us, t_purchase_us, converted) — two-step funnel:
    for every user who signed up, the first signup time and the first
    purchase AT OR AFTER it (−1 / converted=0 when none).

    Stateful sequence matching expressed as one exchange on user_id: the
    per-block partial filters to the two step types and projects three
    columns; the reducer holds each user's full (tiny) step history and
    resolves the 'B after A' constraint locally — the constraint is why
    per-type MIN partials would be wrong (a purchase before signup must not
    count), so the partial shrinks by FILTER, not by aggregation."""
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type", "ts"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin(["signup", "purchase"])]
        return pd.DataFrame(
            {"user_id": df["user_id"].to_numpy(np.int64),
             "event_type": df["event_type"].astype(str),
             "ts_us": df["ts"].to_numpy().astype("datetime64[us]")
             .astype(np.int64)}
        )

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"user_id": pd.Series(dtype=np.int64),
                              "t_signup_us": pd.Series(dtype=np.int64),
                              "t_purchase_us": pd.Series(dtype=np.int64),
                              "converted": pd.Series(dtype=np.int64)})
        if df.empty:
            return empty
        s = (df[df["event_type"] == "signup"]
             .groupby("user_id", as_index=False).agg(t_signup_us=("ts_us", "min")))
        if s.empty:
            return empty
        p = df[df["event_type"] == "purchase"].merge(s, on="user_id", sort=False)
        p = p[p["ts_us"] >= p["t_signup_us"]]
        pb = p.groupby("user_id", as_index=False).agg(tb=("ts_us", "min"))
        out = s.merge(pb, on="user_id", how="left", sort=False)
        conv = out["tb"].notna()
        out["t_purchase_us"] = out["tb"].fillna(-1).astype(np.int64)
        out["converted"] = conv.astype(np.int64)
        return out[["user_id", "t_signup_us", "t_purchase_us", "converted"]]

    return bucketed_group_apply(ev, ["user_id"], part, fin, n_buckets=8)


SIGNUP_PURCHASE_FUNNEL_SQL = """
WITH s AS (SELECT user_id, MIN(epoch_us(ts)) AS ta FROM events
           WHERE event_type = 'signup' GROUP BY 1),
p AS (SELECT s.user_id, MIN(epoch_us(e.ts)) AS tb
      FROM s JOIN events e ON e.user_id = s.user_id
           AND e.event_type = 'purchase' AND epoch_us(e.ts) >= s.ta
      GROUP BY 1)
SELECT s.user_id, CAST(s.ta AS BIGINT) AS t_signup_us,
       CAST(COALESCE(p.tb, -1) AS BIGINT) AS t_purchase_us,
       CAST(CASE WHEN p.tb IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
         AS converted
FROM s LEFT JOIN p USING (user_id)
"""


def rolling_active_users(sf_dir: str, window_days: int = 7) -> pd.DataFrame:
    """(d, n_users) — rolling 7-day active users: for each report day ``d``
    (up to the last observed day), the number of distinct users with ≥1
    event in ``[d − window + 1, d]``.

    Windowed COUNT DISTINCT without a window join: per-block partials shrink
    to DISTINCT (user, day); ONE exchange on user_id co-locates each user's
    whole day set, and the reducer expands every active day to the ``w``
    report days it covers (np.repeat/np.tile — replication factor is the
    constant window size, never data-dependent), dedups per (user, report
    day) locally and emits per-day partial counts. Cross-bucket sums are
    exact because each user contributes at most 1 per report day from
    exactly one bucket. The driver combine is O(days) — calendar-bounded.
    A tiny separate min/max pass pins the last report day (the
    event_type_drift precedent)."""
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])
    day_us = 86_400_000_000
    mx_d = int(pd.Timestamp(ev.max("ts")).value // 1000 // day_us)
    w = int(window_days)

    def part(df: pd.DataFrame) -> pd.DataFrame:
        d = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64) // day_us
        return pd.DataFrame({"user_id": df["user_id"].to_numpy(np.int64),
                             "d": d}).drop_duplicates()

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"d": pd.Series(dtype=np.int64),
                                 "n_users": pd.Series(dtype=np.int64)})
        df = df.drop_duplicates(["user_id", "d"])
        n = len(df)
        r = np.repeat(df["d"].to_numpy(np.int64), w) + np.tile(
            np.arange(w, dtype=np.int64), n)
        u = np.repeat(df["user_id"].to_numpy(np.int64), w)
        e = pd.DataFrame({"user_id": u, "d": r}).drop_duplicates()
        e = e[e["d"] <= mx_d]
        return e.groupby("d", as_index=False).agg(n_users=("user_id", "size"))

    parts = bucketed_group_apply(ev, ["user_id"], part, fin).to_pandas()
    return (parts.groupby("d", as_index=False)
            .agg(n_users=("n_users", "sum"))
            .sort_values("d").reset_index(drop=True))


ROLLING_ACTIVE_USERS_SQL = """
WITH dd AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS d
            FROM events),
mx AS (SELECT MAX(d) AS m FROM dd),
ex AS (SELECT DISTINCT user_id, d + i AS r
       FROM dd CROSS JOIN range(7) t(i))
SELECT CAST(r AS BIGINT) AS d, CAST(COUNT(*) AS BIGINT) AS n_users
FROM ex WHERE r <= (SELECT m FROM mx) GROUP BY r
"""


def event_transitions(sf_dir: str) -> pd.DataFrame:
    """(prev_type, next_type, n) — first-order Markov transition counts over
    each user's time-ordered event stream (ties broken by event_id; a
    user's first event has prev_type='<start>').

    Sequential-pattern mining as one exchange: each user's full (tiny)
    history lands in one bucket, the reducer sorts by (user, ts, event_id)
    and takes a grouped shift — no per-user Python loop — and emits
    |types|²-bounded partial counts; the driver combine is
    transition-matrix-sized, independent of corpus size."""
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "event_id", "event_type"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "t": df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64),
            "event_id": df["event_id"].to_numpy(np.int64),
            "event_type": df["event_type"],
        })

    def trans(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"prev_type": pd.Series(dtype="string"),
                                 "next_type": pd.Series(dtype="string"),
                                 "n": pd.Series(dtype=np.int64)})
        df = df.sort_values(["user_id", "t", "event_id"],
                            kind="mergesort").reset_index(drop=True)
        prev = (df.groupby("user_id", sort=False)["event_type"].shift(1)
                .fillna("<start>"))
        out = pd.DataFrame({"prev_type": prev, "next_type": df["event_type"],
                            "n": np.int64(1)})
        return out.groupby(["prev_type", "next_type"], as_index=False).agg(
            n=("n", "sum"))

    parts = bucketed_group_apply(
        ev.map_batches(prep, batch_format="pandas"),
        ["user_id"], lambda df: df, trans, n_buckets=16).to_pandas()
    return (parts.groupby(["prev_type", "next_type"], as_index=False)
            .agg(n=("n", "sum"))
            .sort_values(["prev_type", "next_type"]).reset_index(drop=True))


EVENT_TRANSITIONS_SQL = """
WITH s AS (SELECT event_type AS next_type,
                  COALESCE(LAG(event_type) OVER (
                      PARTITION BY user_id ORDER BY ts, event_id),
                    '<start>') AS prev_type
           FROM events)
SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
FROM s GROUP BY 1, 2
"""


def user_activity_segments(sf_dir: str) -> pd.DataFrame:
    """(segment, n_users) — engagement segmentation: users bucketed by their
    count of distinct active days (≤24 / 25-26 / 27-28 / 29+ — edges sit
    inside this corpus's 22-30-day activity spread so every scale exercises
    multiple buckets).

    distinct-then-bucket-then-count in ONE exchange: per-block partials are
    DISTINCT (user, day); each user's day set lands whole in one bucket, so
    the reducer counts days and buckets locally, emitting 4-row partials."""
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])
    day_us = 86_400_000_000

    def part(df: pd.DataFrame) -> pd.DataFrame:
        d = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64) // day_us
        return pd.DataFrame({"user_id": df["user_id"].to_numpy(np.int64),
                             "d": d}).drop_duplicates()

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"segment": pd.Series(dtype="string"),
                                 "n_users": pd.Series(dtype=np.int64)})
        days = (df.drop_duplicates(["user_id", "d"])
                .groupby("user_id").size().to_numpy(np.int64))
        seg = np.select([days <= 24, days <= 26, days <= 28],
                        ["<=24", "25-26", "27-28"], default="29+")
        out = (pd.DataFrame({"segment": seg})
               .groupby("segment", as_index=False).size()
               .rename(columns={"size": "n_users"}))
        return out.astype({"n_users": np.int64})

    parts = bucketed_group_apply(ev, ["user_id"], part, fin).to_pandas()
    return (parts.groupby("segment", as_index=False)
            .agg(n_users=("n_users", "sum"))
            .sort_values("segment").reset_index(drop=True))


USER_ACTIVITY_SEGMENTS_SQL = """
WITH dd AS (SELECT user_id,
                   COUNT(DISTINCT epoch_us(ts) // 86400000000) AS days
            FROM events GROUP BY 1)
SELECT CASE WHEN days <= 24 THEN '<=24' WHEN days <= 26 THEN '25-26'
            WHEN days <= 28 THEN '27-28' ELSE '29+' END AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM dd GROUP BY 1
"""


def events_debounced(sf_dir: str, gap_s: int = 21_600) -> pd.DataFrame:
    """(event_type, n_total, n_dropped) — debounce report: an event is a
    duplicate when the same user fired the same type within ``gap_s``
    seconds of the PREVIOUS such event (LAG semantics — each event compares
    to its immediate predecessor, the stateless form of repeat-event
    suppression; default 6 h, inside this corpus's 5 h+ same-(user,type)
    gap floor so the rule fires at every scale).

    One exchange on user_id; the reducer sorts each user's (type, ts,
    event_id) stream once and takes a grouped diff — no per-user loop;
    |types|-bounded partials out."""
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "event_id", "event_type"])
    gap_us = gap_s * 1_000_000

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "t": df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64),
            "event_id": df["event_id"].to_numpy(np.int64),
            "event_type": df["event_type"],
        })

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"event_type": pd.Series(dtype="string"),
                                 "n_total": pd.Series(dtype=np.int64),
                                 "n_dropped": pd.Series(dtype=np.int64)})
        df = df.sort_values(["user_id", "event_type", "t", "event_id"],
                            kind="mergesort").reset_index(drop=True)
        prev = df.groupby(["user_id", "event_type"], sort=False)["t"].shift(1)
        dropped = ((df["t"] - prev) <= gap_us).fillna(False)
        out = pd.DataFrame({"event_type": df["event_type"],
                            "one": np.int64(1),
                            "drp": dropped.to_numpy().astype(np.int64)})
        return (out.groupby("event_type", as_index=False)
                .agg(n_total=("one", "sum"), n_dropped=("drp", "sum")))

    parts = bucketed_group_apply(
        ev.map_batches(prep, batch_format="pandas"),
        ["user_id"], lambda df: df, fin, n_buckets=16).to_pandas()
    return (parts.groupby("event_type", as_index=False)
            .agg(n_total=("n_total", "sum"), n_dropped=("n_dropped", "sum"))
            .sort_values("event_type").reset_index(drop=True))


EVENTS_DEBOUNCED_SQL = """
WITH s AS (SELECT event_type,
                  epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                      PARTITION BY user_id, event_type
                      ORDER BY ts, event_id) AS gap
           FROM events)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(CASE WHEN gap IS NOT NULL AND gap <= 21600000000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
FROM s GROUP BY 1
"""


ATTRIB_WINDOW_US = 7 * 86_400_000_000


def linear_attribution(sf_dir: str) -> pd.DataFrame:
    """(click_event_id, user_id, attributed_cents) — multi-touch (linear)
    revenue attribution: each purchase's value splits equally across the
    same user's clicks in the prior 7 days (clicks at or before the
    purchase), floor shares with the remainder credited to the EARLIEST
    qualifying click (ts, event_id tiebreak) — exact integer conservation,
    no float splits. Purchases with no qualifying click stay unattributed.

    ONE exchange on user_id over the two filtered event types; the reducer
    is FULLY vectorized across every user in its bucket — one lexsort merges
    purchases' window endpoints into the click stream (a running click count
    gives each purchase's [lo, hi) window), interval credits apply via a
    difference array + cumsum — no per-user or per-purchase Python loop,
    emitting per-click partial credits that sum exactly to the attributable
    purchase total."""
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "user_id", "ts",
                                        "event_type", "value"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        m = df["event_type"].isin(["click", "purchase"]).to_numpy()
        df = df[m]
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "event_id": df["event_id"].to_numpy(np.int64),
            "t": df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64),
            "is_p": (df["event_type"] == "purchase").to_numpy().astype(np.int64),
            "cents": np.rint(df["value"].to_numpy(np.float64) * 100.0
                             ).astype(np.int64),
        })

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"click_event_id": pd.Series(dtype=np.int64),
             "user_id": pd.Series(dtype=np.int64),
             "attributed_cents": pd.Series(dtype=np.int64)})
        if df.empty:
            return empty
        clk = df[df["is_p"] == 0].sort_values(["user_id", "t", "event_id"])
        pur = df[df["is_p"] == 1]
        if clk.empty or pur.empty:
            return empty
        cu = clk["user_id"].to_numpy(np.int64)
        ct = clk["t"].to_numpy(np.int64)
        cid = clk["event_id"].to_numpy(np.int64)
        users, counts = np.unique(cu, return_counts=True)
        ustart = np.r_[0, np.cumsum(counts)]
        # purchases of users with no clicks attribute nothing — drop early
        pu = pur["user_id"].to_numpy(np.int64)
        pos = np.searchsorted(users, pu)
        has = (pos < len(users)) & (users[np.minimum(pos, len(users) - 1)] == pu)
        pu, pos = pu[has], pos[has]
        pt = pur["t"].to_numpy(np.int64)[has]
        cents = pur["cents"].to_numpy(np.int64)[has]

        # window endpoints as running click counts: merge each endpoint value
        # into the (user, t)-sorted click stream (clicks BEFORE queries on
        # ties = searchsorted side='right') and read off the cumulative
        # click count — one lexsort for all users and both endpoints
        def count_le(qt: np.ndarray) -> np.ndarray:
            au = np.r_[cu, pu]
            at = np.r_[ct, qt]
            isq = np.r_[np.zeros(len(cu), np.int8), np.ones(len(pu), np.int8)]
            order = np.lexsort((isq, at, au))
            run = np.cumsum(isq[order] == 0)
            out = np.empty(len(au), dtype=np.int64)
            out[order] = run
            return out[len(cu):] - ustart[pos]

        hi = count_le(pt)
        lo = count_le(pt - ATTRIB_WINDOW_US)
        n = hi - lo
        v = n > 0
        g_lo = ustart[pos[v]] + lo[v]
        g_hi = ustart[pos[v]] + hi[v]
        share = cents[v] // n[v]
        rem = cents[v] % n[v]
        # interval adds via difference array + cumsum (remainder → earliest)
        diff = np.zeros(len(ct) + 1, dtype=np.int64)
        np.add.at(diff, g_lo, share)
        np.add.at(diff, g_hi, -share)
        credit = np.cumsum(diff[:-1])
        np.add.at(credit, g_lo, rem)
        tdiff = np.zeros(len(ct) + 1, dtype=np.int64)
        np.add.at(tdiff, g_lo, 1)
        np.add.at(tdiff, g_hi, -1)
        # a zero-share participant (floor share 0, not earliest) still
        # appears — the SQL join keeps it with SUM 0
        keep = np.cumsum(tdiff[:-1]) > 0
        return pd.DataFrame({"click_event_id": cid[keep],
                             "user_id": cu[keep],
                             "attributed_cents": credit[keep]})

    parts = bucketed_group_apply(ev, ["user_id"], part, fin,
                                 n_buckets=16).to_pandas()
    return (parts.sort_values("click_event_id").reset_index(drop=True))


LINEAR_ATTRIBUTION_SQL = """
WITH p AS (SELECT event_id AS pid, user_id, epoch_us(ts) AS pt,
                  CAST(ROUND(value * 100) AS BIGINT) AS cents
           FROM events WHERE event_type = 'purchase'),
c AS (SELECT event_id AS cid, user_id, epoch_us(ts) AS ct
      FROM events WHERE event_type = 'click'),
j AS (SELECT p.pid, p.cents, c.cid, c.ct, c.user_id
      FROM p JOIN c ON p.user_id = c.user_id
       AND c.ct <= p.pt AND c.ct > p.pt - 604800000000),
j2 AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY pid ORDER BY ct, cid) AS rn,
               COUNT(*) OVER (PARTITION BY pid) AS n
       FROM j)
SELECT cid AS click_event_id, CAST(user_id AS BIGINT) AS user_id,
       CAST(SUM(cents // n + CASE WHEN rn = 1 THEN cents % n ELSE 0 END)
            AS BIGINT) AS attributed_cents
FROM j2 GROUP BY cid, user_id
"""


def customer_order_totals_auto(sf_dir: str) -> "ray.data.Dataset":
    """customer_order_totals through the ADAPTIVE join planner
    (stages/join.py::auto_hash_join): a key-distribution probe picks plain
    vs salted at runtime. Shares the exchange join's SQL oracle — whichever
    plan the probe picks must be row-identical."""
    from ..stages.join import auto_hash_join

    customers = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                      columns=["c_custkey", "c_name"])
    joined, _plan = auto_hash_join(
        _order_cents(sf_dir), customers,
        left_on="o_custkey", right_on="c_custkey",
        left_cols=["o_custkey", "cents"], right_cols=["c_custkey", "c_name"],
    )
    return bucketed_group_apply(joined, ["c_custkey"], _order_totals_agg,
                                _order_totals_agg, n_buckets=8)


def late_events(sf_dir: str) -> "ray.data.Dataset":
    """(user_id, n_late, n_events) — out-of-order-arrival monitor: per user,
    how many events arrived (in event_id order, the ingest sequence) with a
    timestamp behind the running maximum already seen for that user. The
    streaming-ingest data-quality signal that sizes watermark lateness
    allowances.

    One user-key exchange; inside each bucket the scan is one sort +
    grouped cummax/shift — no per-user Python loop."""
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_id", "ts"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"user_id": pd.Series(dtype=np.int64),
                                 "n_late": pd.Series(dtype=np.int64),
                                 "n_events": pd.Series(dtype=np.int64)})
        df = df.sort_values(["user_id", "event_id"]).reset_index(drop=True)
        g = df.groupby("user_id", sort=False)
        prev_max = g["ts"].cummax().groupby(df["user_id"].to_numpy()).shift(1)
        late = (df["ts"] < prev_max).to_numpy()
        out = pd.DataFrame({"user_id": df["user_id"].to_numpy(np.int64),
                            "late": late.astype(np.int64)})
        return out.groupby("user_id", as_index=False).agg(
            n_late=("late", "sum"), n_events=("late", "size")
        ).astype({"n_late": np.int64, "n_events": np.int64})

    return bucketed_group_apply(ev, ["user_id"], lambda df: df, final,
                                n_buckets=8)


LATE_EVENTS_SQL = """
WITH x AS (
  SELECT user_id, ts,
         MAX(ts) OVER (PARTITION BY user_id ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mx
  FROM events)
SELECT user_id,
       CAST(SUM(CASE WHEN ts < mx THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM x GROUP BY user_id
"""


def events_next_purchase(sf_dir: str) -> "ray.data.Dataset":
    """Forward as-of enrichment: each event joined to the same user's NEXT
    purchase event at or after its time (inner; a purchase matches itself) —
    the time-to-conversion lookahead, exercising
    ``asof_join(direction="forward")`` through the same single key exchange
    as the backward variant."""
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "user_id", "ts",
                                        "event_type"])

    def as_left(df: pd.DataFrame) -> pd.DataFrame:
        return df[["event_id", "user_id", "ts"]]

    # right side: purchases, unique per (user, ts) — keep max event_id
    def as_purchases(df: pd.DataFrame) -> pd.DataFrame:
        p = df[df["event_type"] == "purchase"]
        p = p.groupby(["user_id", "ts"], as_index=False).agg(
            purchase_event_id=("event_id", "max"))
        return pd.DataFrame({"p_user": p["user_id"], "p_ts": p["ts"],
                             "purchase_event_id": p["purchase_event_id"]})

    left = ev.map_batches(as_left, batch_format="pandas")
    purchases = bucketed_group_apply(
        ev.map_batches(as_purchases, batch_format="pandas"),
        ["p_user"],
        lambda df: df,
        lambda df: df.groupby(["p_user", "p_ts"], as_index=False).agg(
            purchase_event_id=("purchase_event_id", "max")),
        n_buckets=8,
    )

    out = asof_join(
        left, purchases,
        by_left="user_id", by_right="p_user",
        ts_left="ts", ts_right="p_ts",
        left_cols=["event_id", "user_id", "ts"],
        right_cols=["p_user", "p_ts", "purchase_event_id"],
        direction="forward",
    )

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": df["event_id"].astype(np.int64),
                "user_id": df["user_id"].astype(np.int64),
                "purchase_event_id": df["purchase_event_id"].astype(np.int64),
            }
        )

    return out.map_batches(project, batch_format="pandas")


EVENTS_NEXT_PURCHASE_SQL = """
WITH p AS (SELECT user_id AS p_user, ts AS p_ts,
                  MAX(event_id) AS purchase_event_id
           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
SELECT e.event_id, e.user_id, p.purchase_event_id
FROM events e
ASOF JOIN p ON e.user_id = p.p_user AND e.ts <= p.p_ts
"""


_JOURNEY_K = 20


def user_journeys(sf_dir: str, gap_minutes: int = SESSION_GAP_MIN,
                  k: int = _JOURNEY_K) -> pd.DataFrame:
    """(path, n_sessions) — the top-k most common session journeys: each
    session's ordered event-type sequence joined with '>', counted across
    all sessions. The product-analytics "common paths" report.

    One user-key exchange (the same sessionization scan as events_sessions);
    path strings are built per bucket with an ordered groupby join, partial
    path counts shrink before the driver-side final count + top-k (path
    vocabulary is report-sized; at web scale the final count becomes one
    more exchange on the path hash)."""
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_id", "ts",
                                        "event_type"])
    gap = np.timedelta64(gap_minutes, "m")

    def paths(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"path": pd.Series(dtype=object),
                                 "n_sessions": pd.Series(dtype=np.int64)})
        df = df.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
        new_user = df["user_id"].ne(df["user_id"].shift())
        brk = new_user | (df["ts"].diff() > gap)
        path = (
            df.assign(_g=brk.cumsum())
            .groupby("_g", sort=False)["event_type"]
            .agg(">".join)
        )
        return (
            path.value_counts()
            .rename_axis("path")
            .reset_index(name="n_sessions")
            .astype({"n_sessions": np.int64})
        )

    parts = bucketed_group_apply(ev, ["user_id"], lambda df: df, paths,
                                 n_buckets=8).to_pandas()
    out = parts.groupby("path", as_index=False).agg(
        n_sessions=("n_sessions", "sum"))
    out = out.sort_values(["n_sessions", "path"],
                          ascending=[False, True]).head(k)
    return out.reset_index(drop=True).astype({"n_sessions": np.int64})


USER_JOURNEYS_SQL = f"""
WITH x AS (
  SELECT user_id, event_id, ts, event_type,
    CASE WHEN LAG(ts) OVER w IS NULL
           OR ts - LAG(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTES
         THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, event_id, ts, event_type,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
  FROM x),
p AS (
  SELECT user_id, sid,
         STRING_AGG(event_type, '>' ORDER BY ts, event_id) AS path
  FROM s GROUP BY user_id, sid)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM p GROUP BY path
ORDER BY n_sessions DESC, path LIMIT {_JOURNEY_K}
"""


_WM_LATE_US = 3_600_000_000  # 1 h allowed lateness
_WM_BUCKETS = 32
_WM_SEED = -(2 ** 62)  # "no watermark yet" sentinel (µs epoch, far below any ts)


def watermark_drops(sf_dir: str, late_us: int = _WM_LATE_US) -> pd.DataFrame:
    """(event_type, n_dropped, n_total) — streaming watermark semantics over
    the ingest log: processing in event_id (arrival) order with watermark =
    max(ts seen) − allowed lateness, how many events per type would a
    streaming engine drop as too late. The companion to late_events (per-user
    reorder counts): this is the GLOBAL drop decision a watermark policy
    makes.

    Distributed global prefix max at row granularity: events range-partition
    into contiguous event_id buckets (order-preserving, like the layout
    exchange), a cheap per-block stats pass gives each bucket's max ts so the
    driver computes the K-bounded prefix-before offsets, and ONE exchange
    co-locates each bucket where a vectorized running max (seeded with the
    bucket's prefix) decides every row. Output is |types|-bounded."""
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "event_type"])

    import pyarrow.parquet as pq
    ids = pq.read_table(f"{sf_dir}/events.parquet",
                        columns=["event_id"])["event_id"].to_numpy()
    lo, hi = int(ids.min()), int(ids.max())
    span = max(1, hi - lo + 1)

    def bucket_of(eid: np.ndarray) -> np.ndarray:
        return (eid - lo) * _WM_BUCKETS // span

    # pass 1: per-bucket max ts partials (blocks × K bounded)
    def bmax(df: pd.DataFrame) -> pd.DataFrame:
        b = bucket_of(df["event_id"].to_numpy(np.int64))
        t = df["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        out = pd.DataFrame({"b": b, "t": t})
        return out.groupby("b", as_index=False).agg(t=("t", "max"))

    bm = (ev.map_batches(bmax, batch_format="pandas").to_pandas()
          .groupby("b", as_index=False).agg(t=("t", "max")).sort_values("b"))
    # prefix[k] = max ts over all buckets < k
    dense = np.full(_WM_BUCKETS, _WM_SEED, dtype=np.int64)
    dense[bm["b"].to_numpy(np.int64)] = bm["t"].to_numpy(np.int64)
    prefix = np.full(_WM_BUCKETS, _WM_SEED, dtype=np.int64)
    prefix[1:] = np.maximum.accumulate(dense)[:-1]
    prefix_ref = ray.put(prefix)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__b"] = bucket_of(df["event_id"].to_numpy(np.int64))
        return df

    def count_drops(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"event_type": pd.Series(dtype=object),
                                 "n_dropped": pd.Series(dtype=np.int64),
                                 "n_total": pd.Series(dtype=np.int64)})
        pre = ray.get(prefix_ref)
        df = df.sort_values(["__b", "event_id"]).reset_index(drop=True)
        t = df["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        b = df["__b"].to_numpy(np.int64)
        # per-bucket running max seeded by the bucket's global prefix;
        # ≤ _WM_BUCKETS segments per reducer, vectorized within each
        starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
        wm = np.empty_like(t)
        for s_i, s in enumerate(starts):
            e = starts[s_i + 1] if s_i + 1 < len(starts) else len(t)
            seg = t[s:e]
            runmax = np.maximum.accumulate(np.r_[pre[b[s]], seg[:-1]])
            wm[s:e] = runmax
        dropped = t < wm - late_us
        out = pd.DataFrame({"event_type": df["event_type"],
                            "d": dropped.astype(np.int64)})
        return out.groupby("event_type", as_index=False).agg(
            n_dropped=("d", "sum"), n_total=("d", "size")
        ).astype({"n_dropped": np.int64, "n_total": np.int64})

    parts = bucketed_group_apply(
        ev.map_batches(tag, batch_format="pandas"), ["__b"],
        lambda df: df, count_drops, n_buckets=8,
    ).to_pandas()
    out = parts.groupby("event_type", as_index=False).agg(
        n_dropped=("n_dropped", "sum"), n_total=("n_total", "sum"))
    return out.sort_values("event_type").reset_index(drop=True).astype(
        {"n_dropped": np.int64, "n_total": np.int64})


WATERMARK_DROPS_SQL = """
WITH x AS (
  SELECT event_type, ts,
         MAX(ts) OVER (ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
  FROM events)
SELECT event_type,
       CAST(SUM(CASE WHEN ts < wm - INTERVAL 1 HOUR THEN 1 ELSE 0 END)
            AS BIGINT) AS n_dropped,
       CAST(COUNT(*) AS BIGINT) AS n_total
FROM x GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Hopping (sliding) window aggregate — the overlapping-window member of the
# window family (tumbling=events_hourly, session=events_sessions,
# rolling-distinct=rolling_active_users, watermark=watermark_drops)
# ---------------------------------------------------------------------------

_HOP_US = 3_600_000_000          # hop: 1 hour
_HOP_WINDOW_HOPS = 2             # window: 2 hops = 2 hours


def events_hopping(sf_dir: str) -> "ray.data.Dataset":
    """(win_hour, n_events, value_cents) — 2-hour windows hopping every hour:
    each event lands in exactly ``window/hop = 2`` windows, identified by
    their start hour (hours since epoch).

    A hopping window over an ordered log is a bounded fan-out + groupby:
    the per-batch kernel replicates each row to its 2 covering window ids
    (np.concatenate — replication factor is the constant window/hop ratio,
    never data-dependent) and collapses to (win, count, cents-sum) partials
    INSIDE the batch, so the single exchange is calendar-bounded (one row
    per window per block), not event-bounded."""
    from ..stages.shuffle import arrow_group_agg, bucketed_group_apply

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "value"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        us = batch["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        h = us // _HOP_US
        cents = np.round(
            batch["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        win = np.concatenate(
            [h - j for j in range(_HOP_WINDOW_HOPS)])
        c = np.tile(cents, _HOP_WINDOW_HOPS)
        t = arrow_group_agg(
            pa.table({"win_hour": pa.array(win),
                      "n_events": pa.array(np.ones(len(win), np.int64)),
                      "value_cents": pa.array(c)}),
            ["win_hour"], [("n_events", "sum"), ("value_cents", "sum")])
        return t.to_pandas()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("win_hour", as_index=False).agg(
            n_events=("n_events", "sum"), value_cents=("value_cents", "sum"))

    out = ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return bucketed_group_apply(out, ["win_hour"], final, final, n_buckets=8)


EVENTS_HOPPING_SQL = f"""
WITH b AS (
  SELECT epoch_us(ts) // {_HOP_US} AS h,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events),
x AS (
  SELECT h - unnest(generate_series(0, {_HOP_WINDOW_HOPS - 1})) AS win_hour,
         cents
  FROM b)
SELECT CAST(win_hour AS BIGINT) AS win_hour,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(cents) AS BIGINT) AS value_cents
FROM x GROUP BY 1 ORDER BY 1
"""


def event_type_islands(sf_dir: str) -> pd.DataFrame:
    """(user_id, event_type, valid_from, valid_to, n_events) — gaps-and-
    islands: collapse each user's consecutive runs of the same event type
    into validity intervals (the SCD-style history build / state-transition
    compaction every warehouse pipeline carries).

    One exchange on user_id (the op inherently needs per-user time order);
    the reducer is fully vectorized across its bucket: one lexsort by
    (user, ts, event_id), boundary mask where user OR type changes, cumsum
    island ids, one groupby min/max/count. No per-user Python loop."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_id", "ts", "event_type"])

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                "user_id": pd.Series(dtype=np.int64),
                "event_type": pd.Series(dtype="string"),
                "valid_from": pd.Series(dtype="datetime64[us]"),
                "valid_to": pd.Series(dtype="datetime64[us]"),
                "n_events": pd.Series(dtype=np.int64)})
        df = df.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
        u = df["user_id"].to_numpy()
        et = df["event_type"].to_numpy()
        new = np.ones(len(df), dtype=bool)
        new[1:] = (u[1:] != u[:-1]) | (et[1:] != et[:-1])
        df["grp"] = np.cumsum(new)
        out = df.groupby(["grp"], as_index=False).agg(
            user_id=("user_id", "first"), event_type=("event_type", "first"),
            valid_from=("ts", "min"), valid_to=("ts", "max"),
            n_events=("ts", "size"))
        return out.drop(columns=["grp"]).astype({"user_id": np.int64,
                                                 "n_events": np.int64})

    from ..stages.shuffle import bucketed_group_apply

    out = bucketed_group_apply(ds, ["user_id"], lambda d: d, fin,
                               n_buckets=16).to_pandas()
    return out.sort_values(["user_id", "valid_from",
                            "event_type"]).reset_index(drop=True)


EVENT_TYPE_ISLANDS_SQL = """
WITH e AS (SELECT user_id, event_id, ts, event_type,
                  LAG(event_type) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id) AS prev
           FROM events),
g AS (SELECT user_id, ts, event_type,
             SUM(CASE WHEN prev IS NULL OR prev <> event_type
                      THEN 1 ELSE 0 END) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS grp
      FROM e)
SELECT user_id, event_type, MIN(ts) AS valid_from, MAX(ts) AS valid_to,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM g GROUP BY user_id, event_type, grp
"""


# ---------------------------------------------------------------------------
# Day-of-week seasonality profile
# ---------------------------------------------------------------------------

def events_seasonality(sf_dir: str) -> pd.DataFrame:
    """(dow, n_days, n_events, mean_per_day_e6, share_bp) — day-of-week
    seasonality profile of the event stream: events per weekday, the mean
    daily volume for that weekday, and its share of all traffic — the
    baseline profile an anomaly monitor (events_hourly / hourly_anomalies)
    normalizes against. ISO dow (Mon=1..Sun=7), matching DuckDB's
    ``isodow``.

    One pass of per-block (date, dow) count partials; the driver fold is
    bounded by the DATE DOMAIN (days in the stream — thousands at most for
    years of data; the ks_drift-style stated bound). All integers except
    one floor division per row."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def per_day(df: pd.DataFrame) -> pd.DataFrame:
        ts = pd.to_datetime(df["ts"])
        d = pd.DataFrame({"date": ts.dt.date.astype(str),
                          "dow": ts.dt.isocalendar().day.astype(np.int64)})
        return d.groupby(["date", "dow"], as_index=False).size()

    parts = ds.map_batches(per_day, batch_format="pandas").to_pandas()
    days = parts.groupby(["date", "dow"], as_index=False)["size"].sum()
    total = int(days["size"].sum())
    g = days.groupby("dow", as_index=False).agg(
        n_days=("date", "nunique"), n_events=("size", "sum"))
    g["mean_per_day_e6"] = (g["n_events"] * 1_000_000 // g["n_days"])
    g["share_bp"] = g["n_events"] * 10000 // total
    return (g[["dow", "n_days", "n_events", "mean_per_day_e6", "share_bp"]]
            .astype(np.int64).sort_values("dow").reset_index(drop=True))


EVENTS_SEASONALITY_SQL = """
WITH d AS (SELECT CAST(ts AS DATE) AS date,
                  CAST(isodow(ts) AS BIGINT) AS dow
           FROM events),
day_counts AS (SELECT date, dow, CAST(COUNT(*) AS BIGINT) AS n
               FROM d GROUP BY 1, 2),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM day_counts)
SELECT dow, CAST(COUNT(DISTINCT date) AS BIGINT) AS n_days,
       CAST(SUM(n) AS BIGINT) AS n_events,
       CAST(SUM(n) * 1000000 // COUNT(DISTINCT date) AS BIGINT)
         AS mean_per_day_e6,
       CAST(SUM(n) * 10000 // (SELECT t FROM tot) AS BIGINT) AS share_bp
FROM day_counts GROUP BY dow
"""


# ---------------------------------------------------------------------------
# Duplicate-delivery audit
# ---------------------------------------------------------------------------

# tuned so both classes bind on the synthetic stream (measured same-key
# gap p10 ~ 71k/161k s at sf0.001/0.01 — the Gopher-threshold precedent)
_EVDUP_WINDOW_S = 200_000


def events_dup_audit(sf_dir: str,
                     window_s: int = _EVDUP_WINDOW_S) -> pd.DataFrame:
    """(event_type, n_events, n_dups, dup_bp) — duplicate-delivery audit:
    an event is a duplicate iff the SAME (user, type, props) payload was
    already delivered within ``window_s`` seconds — the at-least-once
    ingestion idempotency check every event pipeline runs.

    ONE exchange on the payload key (user, type, props) co-locates each
    key's deliveries; the reducer sorts its own small group by time and
    compares adjacent gaps (LAG semantics, stated in the oracle); output
    partials are type-domain-bounded."""
    from ..stages.shuffle import bucketed_group_apply

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "props", "ts"])

    def audit(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "event_type", "props", "ts"])
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        same = ((df["user_id"].to_numpy() == df["user_id"].shift().to_numpy())
                & (df["event_type"].to_numpy()
                   == df["event_type"].shift().to_numpy())
                & (df["props"].to_numpy() == df["props"].shift().to_numpy()))
        gap_ok = np.zeros(len(df), dtype=bool)
        if len(df) > 1:
            gap_ok[1:] = (us[1:] - us[:-1]) <= window_s * 1_000_000
        dup = same & gap_ok
        out = pd.DataFrame({"event_type": df["event_type"],
                            "dup": dup.astype(np.int64)})
        return out.groupby("event_type", as_index=False).agg(
            n_events=("dup", "size"), n_dups=("dup", "sum"))

    parts = bucketed_group_apply(
        ds, ["user_id", "event_type", "props"], lambda d: d,
        audit).to_pandas()
    g = parts.groupby("event_type", as_index=False).sum()
    g["dup_bp"] = g["n_dups"] * 10000 // g["n_events"]
    return (g[["event_type", "n_events", "n_dups", "dup_bp"]]
            .astype({"n_events": np.int64, "n_dups": np.int64,
                     "dup_bp": np.int64})
            .sort_values("event_type").reset_index(drop=True))


def events_dup_audit_sql(window_s: int = _EVDUP_WINDOW_S) -> str:
    return f"""
WITH l AS (
  SELECT event_type,
         CASE WHEN LAG(ts) OVER (PARTITION BY user_id, event_type, props
                                 ORDER BY ts) IS NOT NULL
               AND epoch_us(ts) - epoch_us(
                     LAG(ts) OVER (PARTITION BY user_id, event_type, props
                                   ORDER BY ts)) <= CAST({window_s} AS BIGINT) * 1000000
              THEN 1 ELSE 0 END AS dup
  FROM events)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(dup) AS BIGINT) AS n_dups,
       CAST(SUM(dup) * 10000 // COUNT(*) AS BIGINT) AS dup_bp
FROM l GROUP BY 1
"""


EVENTS_DUP_AUDIT_SQL = events_dup_audit_sql()
