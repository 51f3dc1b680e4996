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

    # constant across iterations: materialize once, not per round
    zero = nodes.map_batches(
        lambda df: df.assign(m=np.float64(0.0)), batch_format="pandas"
    ).materialize()

    for _ in range(iters):
        contrib = hash_join(
            ranks, edges_deg, "node", "src",
            ["node", "r"], ["src", "dst", "c"],
            n_buckets=8,
        ).map_batches(
            lambda df: pd.DataFrame(
                {
                    "node": df["dst"].astype(np.int64),
                    "m": df["r"].astype(np.float64) / df["c"].astype(np.float64),
                }
            ),
            batch_format="pandas",
        )

        def merge(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby("node", as_index=False).agg(m=("m", "sum"))

        ranks = grouped_aggregate(contrib.union(zero), ["node"], merge, n_buckets=8
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


def triangle_counts(sf_dir: str) -> "ray.data.Dataset":
    """(term, n_tri) — per-entity triangle membership counts over the term
    co-occurrence graph.

    Degree-ordered wedge enumeration, the scale-safe classic: every edge is
    oriented from its lower-(degree, term) endpoint to the higher one, so
    each wedge is emitted exactly once by the LOWEST-degree vertex of its
    triangle and total wedge volume is bounded by the graph arboricity
    (sum of d_low per edge), not by max-degree². Dataflow: one exchange to
    build per-vertex neighbor lists and emit wedges, one exchange to
    intersect wedges with the edge set (tagged union keyed on the closing
    pair), one grouped sum per term. The degree table is vocabulary-bound
    (distinct entity terms), so it is broadcast via ``ray.put`` rather than
    joined — the same small-side rule the entity canonicalizer documents.

    Orientation affects only who *finds* a triangle, never which triangles
    exist, so the output is orientation-independent and matches the
    lexicographic three-way self-join the SQL oracle states."""
    # lazy import: pipelines depend on stages; this one query-layer operator
    # reuses the pipeline-level co-occurrence builder without a module cycle
    from ..pipelines.kgflat import cooccurrence

    co = cooccurrence(sf_dir).map_batches(
        lambda df: pd.DataFrame(
            {"ta": df["term_a"].astype(str), "tb": df["term_b"].astype(str)}
        ),
        batch_format="pandas",
    ).materialize()

    def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        both = pd.concat([df["ta"], df["tb"]], ignore_index=True)
        return both.value_counts().rename_axis("term").reset_index(name="d")

    def deg_final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("term", as_index=False).agg(d=("d", "sum"))

    deg_df = bucketed_group_apply(co, ["term"], deg_partial, deg_final).to_pandas()
    deg_ref = ray.put(dict(zip(deg_df["term"], deg_df["d"].astype(np.int64))))

    def orient(df: pd.DataFrame) -> pd.DataFrame:
        dmap = ray.get(deg_ref)
        da = df["ta"].map(dmap).to_numpy()
        db = df["tb"].map(dmap).to_numpy()
        # src = lower (degree, term); ties keep the lex order ta<tb
        a_first = da <= db
        return pd.DataFrame(
            {
                "src": np.where(a_first, df["ta"], df["tb"]),
                "dst": np.where(a_first, df["tb"], df["ta"]),
            }
        )

    oriented = co.map_batches(orient, batch_format="pandas")

    def wedge_final(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for src, g in df.groupby("src"):
            nb = np.unique(g["dst"].to_numpy())
            if len(nb) < 2:
                continue
            iu, ju = np.triu_indices(len(nb), k=1)
            outs.append(
                pd.DataFrame(
                    {"b": nb[iu], "c": nb[ju], "apex": src, "is_edge": np.int8(0)}
                )
            )
        if not outs:
            return pd.DataFrame(
                {"b": pd.Series(dtype=str), "c": pd.Series(dtype=str),
                 "apex": pd.Series(dtype=str),
                 "is_edge": pd.Series(dtype=np.int8)}
            )
        return pd.concat(outs, ignore_index=True)

    wedges = bucketed_group_apply(oriented, ["src"], lambda df: df, wedge_final)

    # the closing pair (b, c) is lexicographically unordered after degree
    # orientation — canonicalize to the lex order the edge set uses
    def canon_pair(df: pd.DataFrame) -> pd.DataFrame:
        lo = np.minimum(df["b"], df["c"])
        hi = np.maximum(df["b"], df["c"])
        return df.assign(b=lo, c=hi)

    edge_rows = co.map_batches(
        lambda df: pd.DataFrame(
            {"b": df["ta"], "c": df["tb"], "apex": "", "is_edge": np.int8(1)}
        ),
        batch_format="pandas",
    )
    tagged = wedges.map_batches(canon_pair, batch_format="pandas").union(edge_rows)

    def close_final(df: pd.DataFrame) -> pd.DataFrame:
        present = df.loc[df["is_edge"] == 1, ["b", "c"]].drop_duplicates()
        tri = df[df["is_edge"] == 0].merge(present, on=["b", "c"])
        if tri.empty:
            return pd.DataFrame(
                {"term": pd.Series(dtype=str), "n_tri": pd.Series(dtype=np.int64)}
            )
        members = pd.concat([tri["apex"], tri["b"], tri["c"]], ignore_index=True)
        return members.value_counts().rename_axis("term").reset_index(name="n_tri")

    partial_counts = bucketed_group_apply(
        tagged, ["b", "c"], lambda df: df, close_final
    )
    return grouped_aggregate(
        partial_counts,
        ["term"],
        lambda df: df.groupby("term", as_index=False).agg(n_tri=("n_tri", "sum")),
    )


def components(sf_dir: str) -> "ray.data.Dataset":
    """(term, component) — connected components of the term co-occurrence
    graph; ``component`` is the lexicographically smallest member term.

    Thin query-layer wrapper over the fully distributed min-label-propagation
    CC (:func:`..stages.canonicalize.connected_components_ds` — no edge set or
    label table on the driver). Propagation runs to *fixpoint* (scalar
    checksum convergence), which is exactly the transitive closure the
    recursive-CTE oracle states, so the comparison is iteration-count-free."""
    from ..pipelines.kgflat import cooccurrence
    from .canonicalize import connected_components_ds

    co = cooccurrence(sf_dir).map_batches(
        lambda df: pd.DataFrame(
            {"a": df["term_a"].astype(str), "b": df["term_b"].astype(str)}
        ),
        batch_format="pandas",
    )
    return connected_components_ds(co).map_batches(
        lambda df: pd.DataFrame({"term": df["node"], "component": df["label"]}),
        batch_format="pandas",
    )


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
