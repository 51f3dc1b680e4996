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
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

import ray

from .join import hash_join
from .shuffle import bucketed_group_apply, grouped_aggregate, hash_exchange_apply

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


@ray.remote
def _pr_prep_bucket(edges_tab) -> "object":
    """(src, dst) bucket → (src, dst, c) with the out-degree computed
    LOCALLY: the bucket holds every edge of each of its srcs (bucketed by
    src), so degree is a within-bucket transform — no degree join."""
    import pyarrow as pa

    if edges_tab.num_columns == 0 or edges_tab.num_rows == 0:
        return pa.table({"src": pa.array([], pa.int64()),
                         "dst": pa.array([], pa.int64()),
                         "c": pa.array([], pa.int64())})
    df = edges_tab.to_pandas()
    df["c"] = df.groupby("src")["dst"].transform("size").astype(np.int64)
    return pa.Table.from_pandas(df[["src", "dst", "c"]], preserve_index=False)


@ray.remote
def _pr_contrib(edges_tab, ranks_tab, n_buckets: int):
    """One superstep, scatter side: join the pinned edge bucket with its
    co-partitioned rank bucket (both keyed by the same hash of src/node),
    emit (node=dst, m=r/c) contributions split by dst bucket."""
    import pyarrow as pa

    from .shuffle import _split_by_bucket

    empty = pa.table({"node": pa.array([], pa.int64()),
                      "m": pa.array([], pa.float64())})
    if (edges_tab.num_rows == 0 or ranks_tab.num_rows == 0):
        return tuple([empty] * n_buckets) if n_buckets > 1 else empty
    e = edges_tab.to_pandas()
    r = ranks_tab.to_pandas()
    j = e.merge(r, left_on="src", right_on="node", how="inner", sort=False)
    out = pa.Table.from_pandas(
        pd.DataFrame({"node": j["dst"].astype(np.int64),
                      "m": j["r"].to_numpy(np.float64) / j["c"].to_numpy(np.float64)}),
        preserve_index=False)
    pieces = _split_by_bucket(out, ["node"], n_buckets)
    return tuple(pieces) if n_buckets > 1 else pieces[0]


@ray.remote
def _pr_apply(nodes_tab, base_r: float, damping: float, *pieces):
    """One superstep, gather side: sum this bucket's incoming contributions,
    left-join onto the bucket's node set (dangling/unreached nodes get 0),
    apply teleport + damping."""
    import pyarrow as pa

    nodes = nodes_tab.to_pandas()
    valid = [p for p in pieces if p.num_columns > 0 and p.num_rows > 0]
    if valid:
        m = (pa.concat_tables(valid).to_pandas()
             .groupby("node", as_index=False).agg(m=("m", "sum")))
        nodes = nodes.merge(m, on="node", how="left", sort=False)
        nodes["m"] = nodes["m"].fillna(0.0)
    else:
        nodes = nodes.assign(m=np.float64(0.0))
    nodes["r"] = base_r + damping * nodes["m"].to_numpy(np.float64)
    return pa.Table.from_pandas(nodes[["node", "r"]], preserve_index=False)


@ray.remote
def _pr_out(ranks_tab):
    import pyarrow as pa

    df = ranks_tab.to_pandas()
    return pa.Table.from_pandas(
        pd.DataFrame({"node": df["node"].astype(np.int64),
                      "rank_e9": np.floor(df["r"] * 1e9 + 0.5).astype(np.int64)}),
        preserve_index=False)


def pagerank(sf_dir: str, iters: int = 5, n_buckets: int = 8) -> "ray.data.Dataset":
    """(node, rank_e9) — `iters` damped PageRank iterations over the
    supplier→part graph; dangling mass is dropped (mirrored exactly in SQL).

    Pregel-style pinned-partition loop: the edge set is hash-bucketed by src
    ONCE and stays in the object store; ranks are co-partitioned by the same
    hash, so each superstep is B contribution tasks (local join, split by
    dst bucket) + a B×B scatter of the SHRUNK contribution pieces + B apply
    tasks — the edges never move again after round 0 (vs re-exchanging both
    join sides every round). Out-degrees are a within-bucket transform, not
    a join, because bucketing by src co-locates all of a src's edges.
    rank_e9 rounds away the sub-1e-15 float summation-order noise."""
    # materialized once: BOTH the bucketing exchange and the node-set
    # aggregation consume it — without this the edge scan/transform runs twice
    edges = _supplier_part_edges(sf_dir).materialize()

    # bucket edges by src once (identity exchange: bucket b = block b),
    # then attach local out-degrees per bucket
    ident = lambda t: t  # noqa: E731
    e_bucketed = hash_exchange_apply(edges, ["src"], ident, ident,
                                     n_buckets=n_buckets)
    E = [_pr_prep_bucket.remote(ref) for ref in e_bucketed.to_arrow_refs()]

    def nodes_of(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": pd.concat([df["src"], df["dst"]], ignore_index=True)}
        ).drop_duplicates()

    nodes_ds = grouped_aggregate(
        edges.map_batches(nodes_of, batch_format="pandas"),
        ["node"], lambda df: df.drop_duplicates(), n_buckets=n_buckets,
    ).materialize()
    n = nodes_ds.count()
    N = nodes_ds.to_arrow_refs()  # bucket b = block b, same hash as E
    init, base_r = 1.0 / n, _TELEPORT / n

    R = [_pr_apply.remote(N[b], init, 0.0) for b in range(n_buckets)]
    for _ in range(iters):
        cps = [
            _pr_contrib.options(num_returns=n_buckets).remote(E[b], R[b], n_buckets)
            for b in range(n_buckets)
        ]
        if n_buckets == 1:
            cps = [[c] for c in cps]
        R = [
            _pr_apply.remote(N[b], base_r, _DAMPING,
                             *[cps[src][b] for src in range(n_buckets)])
            for b in range(n_buckets)
        ]

    return ray.data.from_arrow_refs([_pr_out.remote(r) for r in R])


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
    co, deg_df = _co_graph(sf_dir)
    return _triangles(co, deg_df)


def _co_graph(sf_dir: str):
    """Materialized (ta, tb) co-occurrence edge set + its vocabulary-bound
    degree table (driver-sized by construction — distinct entity terms)."""
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
    return co, deg_df


def _triangles(co: "ray.data.Dataset", deg_df: pd.DataFrame) -> "ray.data.Dataset":
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


def clustering_coefficient(sf_dir: str) -> pd.DataFrame:
    """(term, d, n_tri, coeff_e9) — local clustering coefficient per entity
    over the term co-occurrence graph, for every term with degree ≥ 2.

    coeff = 2·T / (d·(d−1)); ``coeff_e9`` is exact floor-division integer
    arithmetic (2·T·1e9 // d·(d−1)) so the DuckDB restatement matches
    bit-for-bit. Triangle counts come from the degree-ordered wedge
    enumeration (:func:`triangle_counts` internals — arboricity-bounded, no
    max-degree² blowup); degrees ride the same single co-occurrence build.
    Both final tables are vocabulary-bound, so the merge is driver-sized by
    the same argument the degree broadcast already documents."""
    co, deg_df = _co_graph(sf_dir)
    tri = _triangles(co, deg_df).to_pandas()  # vocabulary-bound
    out = deg_df.merge(tri, on="term", how="left").fillna({"n_tri": 0})
    out = out[out["d"] >= 2].copy()
    out["d"] = out["d"].astype(np.int64)
    out["n_tri"] = out["n_tri"].astype(np.int64)
    out["coeff_e9"] = np.array(
        [
            2 * int(t) * 10**9 // (int(d) * (int(d) - 1))
            for d, t in zip(out["d"], out["n_tri"])
        ],
        dtype=np.int64,
    )
    return out[["term", "d", "n_tri", "coeff_e9"]].sort_values("term").reset_index(
        drop=True
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


_BASKET_CAP = 4096  # parts per order before pair emission goes loudly quadratic

_PAIRS_SCHEMA = pa.schema([("pa", pa.int64()), ("pb", pa.int64()),
                           ("co", pa.int64())])


def _sorted_degree_ref(deg: pd.DataFrame):
    """Broadcast the catalog-bound degree table as parallel SORTED arrays:
    np.searchsorted lookups in the consumers replace a per-row dict .map()."""
    dk = deg["l_partkey"].to_numpy(np.int64)
    dv = deg["d"].to_numpy(np.int64)
    o = np.argsort(dk, kind="stable")
    return ray.put((dk[o], dv[o]))


def _basket_distinct(t: pa.Table) -> pa.Table:
    # Arrow C++ hash-distinct; pin key dtypes so empty upstream blocks can't
    # leak drifted types into the exchange concat
    t = pa.table({"l_orderkey": t["l_orderkey"].cast(pa.int64()),
                  "l_partkey": t["l_partkey"].cast(pa.int64())})
    return t.group_by(["l_orderkey", "l_partkey"]).aggregate([])


def _basket_pairs(t: pa.Table) -> pa.Table:
    # fully vectorized within-basket pair emission: no per-order Python
    # loop — group offsets + repeat/cumsum index arithmetic generate all
    # (i < j) index pairs for every basket in one shot
    t = _basket_distinct(t)
    o = t["l_orderkey"].to_numpy(zero_copy_only=False)
    p = t["l_partkey"].to_numpy(zero_copy_only=False)
    n = len(p)
    if n == 0:
        return _PAIRS_SCHEMA.empty_table()
    order = np.lexsort((p, o))
    o, p = o[order], p[order]
    if p.max() >= 1 << 31:
        raise ValueError("partkey exceeds 2^31: widen the pair packing")
    new = np.empty(n, dtype=bool)
    new[0] = True
    new[1:] = o[1:] != o[:-1]
    gstart = np.flatnonzero(new)
    sizes = np.diff(np.append(gstart, n))
    if sizes.max(initial=0) > _BASKET_CAP:
        raise ValueError(
            f"basket of {sizes.max()} parts exceeds cap {_BASKET_CAP}")
    g = np.cumsum(new) - 1
    r = np.arange(n, dtype=np.int64) - gstart[g]
    cnt = sizes[g] - r - 1  # pairs whose left element sits here
    total = int(cnt.sum())
    if total == 0:
        return _PAIRS_SCHEMA.empty_table()
    a_idx = np.repeat(np.arange(n, dtype=np.int64), cnt)
    block_start = np.repeat(np.cumsum(cnt) - cnt, cnt)
    b_idx = a_idx + (np.arange(total, dtype=np.int64) - block_start) + 1
    # parts sorted within each basket ⇒ pa < pb by construction
    key = (p[a_idx] << np.int64(32)) | p[b_idx]
    uniq, counts = np.unique(key, return_counts=True)
    return pa.table({"pa": (uniq >> np.int64(32)).astype(np.int64),
                     "pb": (uniq & np.int64(0x7FFFFFFF)).astype(np.int64),
                     "co": counts.astype(np.int64)})


def _basket_pair_stats(sf_dir: str):
    """(co Dataset, deg DataFrame) — exact pair co-occurrence counts over
    order baskets plus per-part distinct-order degrees (catalog-bound)."""
    from ..sources.tables import read_table

    from .shuffle import hash_exchange_apply

    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def co_sum(t: pa.Table) -> pa.Table:
        from .shuffle import arrow_group_agg

        return arrow_group_agg(t, ["pa", "pb"], [("co", "sum")])

    co = hash_exchange_apply(
        hash_exchange_apply(ds, ["l_orderkey"], _basket_distinct, _basket_pairs),
        ["pa", "pb"], co_sum, co_sum)

    # part degrees: |N(part)| = distinct orders per part (catalog-bound table,
    # broadcast once — swap for a hash join if the catalog outgrows memory)
    def deg_final(t: pa.Table) -> pa.Table:
        d = _basket_distinct(t)  # global dedup post-exchange
        out = d.group_by(["l_partkey"]).aggregate([("l_orderkey", "count")])
        return out.rename_columns(
            ["d" if c == "l_orderkey_count" else c for c in out.column_names])

    deg = hash_exchange_apply(
        ds, ["l_partkey"], _basket_distinct, deg_final).to_pandas()
    return co, deg


def item_jaccard(sf_dir: str, min_co: int = 2) -> "ray.data.Dataset":
    """(pa, pb, co, jaccard_e9) — item-item Jaccard similarity over the
    order–part bipartite graph ("bought together"): for parts a, b with
    order-neighborhoods N(a), N(b), J = |N∩N| / |N∪N|, emitted when the
    co-occurrence count reaches ``min_co``.

    Dataflow: distinct (order, part) partials → exchange on order → per-order
    pair emission (bounded by the basket size, capped loudly) with partial
    pair counts → exchange on the pair → exact co counts; part degrees ride
    the first pass and are broadcast (catalog-bound, not order-bound). The
    e9 fixed point is computed from exact integers on both sides."""
    co, deg = _basket_pair_stats(sf_dir)
    deg_ref = _sorted_degree_ref(deg)

    def score(t: pa.Table) -> pa.Table:
        from .stats import _round_e9_vec

        dk, dv = ray.get(deg_ref)
        t = t.filter(pc.greater_equal(t["co"], min_co))
        if t.num_rows == 0:
            return pa.schema([("pa", pa.int64()), ("pb", pa.int64()),
                              ("co", pa.int64()),
                              ("jaccard_e9", pa.int64())]).empty_table()
        pa_v = t["pa"].to_numpy(zero_copy_only=False)
        pb_v = t["pb"].to_numpy(zero_copy_only=False)
        co_v = t["co"].to_numpy(zero_copy_only=False)
        # vectorized degree lookup: binary search into the sorted broadcast
        da = dv[np.searchsorted(dk, pa_v)]
        db = dv[np.searchsorted(dk, pb_v)]
        j = _round_e9_vec(co_v.astype(np.float64)
                          / (da + db - co_v).astype(np.float64))
        return pa.table({"pa": pa_v, "pb": pb_v, "co": co_v, "jaccard_e9": j})

    return co.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def assoc_rules(sf_dir: str, min_co: int = 2) -> "ray.data.Dataset":
    """(ante, cons, support, n_ante, n_cons, n_orders, conf_e9, lift_e9) —
    association-rule mining over order baskets: for each directional rule
    ante→cons with pair support ≥ ``min_co``, confidence = support/|N(ante)|
    and lift = support·n_orders / (|N(ante)|·|N(cons)|), both as e9 fixed
    points derived from exact integers (products stay < 2^53, so the single
    IEEE division matches DuckDB bit-for-bit).

    Reuses the item-Jaccard pair exchange (one basket pass + one pair
    exchange); the basket count and part degrees are catalog-bound
    broadcasts. Reference parity note: no counterpart in the reference —
    brief-mandated analytics family (co-occurrence mining is the
    market-basket twin of the KG co-occurrence operator)."""
    from ..sources.tables import read_table
    from .shuffle import hash_exchange_apply

    co, deg = _basket_pair_stats(sf_dir)
    # n_orders: distinct basket count — reuse the degree identity
    # Σ_parts |N(part)| counts each (order, part) once, so distinct orders
    # need their own tiny exchange
    def ok_distinct(t: pa.Table) -> pa.Table:
        return pa.table(
            {"l_orderkey": t["l_orderkey"].cast(pa.int64())}
        ).group_by(["l_orderkey"]).aggregate([])

    n_orders = int(
        hash_exchange_apply(
            read_table(sf_dir, "lineitem", columns=["l_orderkey"]),
            ["l_orderkey"], ok_distinct, ok_distinct,
        ).count()
    )
    deg_ref = _sorted_degree_ref(deg)

    _rules_schema = pa.schema(
        [(c, pa.int64()) for c in ("ante", "cons", "support", "n_ante",
                                   "n_cons", "n_orders", "conf_e9", "lift_e9")])

    def rules(t: pa.Table) -> pa.Table:
        from .stats import _round_e9_vec

        dk, dv = ray.get(deg_ref)
        t = t.filter(pc.greater_equal(t["co"], min_co))
        if t.num_rows == 0:
            return _rules_schema.empty_table()
        pa_v = t["pa"].to_numpy(zero_copy_only=False)
        pb_v = t["pb"].to_numpy(zero_copy_only=False)
        co_v = t["co"].to_numpy(zero_copy_only=False)
        # both rule directions from one pair row
        ante = np.concatenate([pa_v, pb_v])
        cons = np.concatenate([pb_v, pa_v])
        sup = np.concatenate([co_v, co_v])
        na = dv[np.searchsorted(dk, ante)]
        nc = dv[np.searchsorted(dk, cons)]
        conf = _round_e9_vec(sup.astype(np.float64) / na.astype(np.float64))
        # documented bound: products < 2^53, so int64 products then one IEEE
        # division match the scalar (and DuckDB) path bit-for-bit
        lift = _round_e9_vec((sup * n_orders).astype(np.float64)
                             / (na * nc).astype(np.float64))
        return pa.table({
            "ante": ante, "cons": cons, "support": sup,
            "n_ante": na, "n_cons": nc,
            "n_orders": np.full(len(ante), n_orders, dtype=np.int64),
            "conf_e9": conf, "lift_e9": lift,
        })

    return co.map_batches(rules, batch_format="pyarrow", zero_copy_batch=True)


ASSOC_RULES_SQL = """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
co AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb,
              CAST(COUNT(*) AS BIGINT) AS co
       FROM op a JOIN op b
         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       GROUP BY 1, 2 HAVING COUNT(*) >= 2),
deg AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS d FROM op GROUP BY 1),
n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n FROM lineitem),
dir AS (SELECT pa AS ante, pb AS cons, co FROM co
        UNION ALL SELECT pb, pa, co FROM co)
SELECT dir.ante, dir.cons, dir.co AS support,
       da.d AS n_ante, db.d AS n_cons, (SELECT n FROM n) AS n_orders,
       CAST(ROUND(dir.co / CAST(da.d AS DOUBLE) * 1000000000.0)
            AS BIGINT) AS conf_e9,
       CAST(ROUND(CAST(dir.co * (SELECT n FROM n) AS DOUBLE)
                  / (da.d * db.d) * 1000000000.0) AS BIGINT) AS lift_e9
FROM dir JOIN deg da ON dir.ante = da.l_partkey
         JOIN deg db ON dir.cons = db.l_partkey
"""


_W_MAX = 5  # sparsifier: keep supplier–part edges whose min quantity ≤ this


def _sp_weighted_edges(sf_dir: str, w_max: int = _W_MAX) -> "ray.data.Dataset":
    """(src, dst, w) — weighted supplier–part edges: w = MIN(l_quantity) per
    distinct pair, kept only when w ≤ ``w_max`` (sparsifies the otherwise
    near-uniform bipartite graph so core/peeling structure exists). One
    exchange on the pair key; per-block min partials shrink first."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_partkey", "l_quantity"],
    )

    def part(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "src": df["l_suppkey"].astype(np.int64),
                "dst": df["l_partkey"].astype(np.int64) + _PART_OFFSET,
                "w": np.rint(df["l_quantity"].to_numpy()).astype(np.int64),
            }
        )
        return out.groupby(["src", "dst"], as_index=False).agg(w=("w", "min"))

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["src", "dst"], as_index=False).agg(w=("w", "min"))
        return out[out["w"] <= w_max].reset_index(drop=True)

    return bucketed_group_apply(ds, ["src", "dst"], part, fin)


def _symmetrize(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    def both(df: pd.DataFrame) -> pd.DataFrame:
        return pd.concat(
            [
                df.rename(columns={"src": "u", "dst": "v"})[["u", "v", "w"]],
                df.rename(columns={"src": "v", "dst": "u"})[["u", "v", "w"]],
            ],
            ignore_index=True,
        )

    return edges.map_batches(both, batch_format="pandas")


def kcore(sf_dir: str, k: int = 3, max_rounds: int = 8) -> pd.DataFrame:
    """(node, deg) — the k-core of the weight-sparsified supplier–part graph:
    the maximal subgraph where every node keeps degree ≥ k, with each
    surviving node's degree inside the core.

    Distributed iterative peeling: the edge set (materialized once) never
    moves after build; each round is one streamed filter-to-alive pass +
    degree exchange whose output is node-catalog-bound, and the alive set —
    catalog-bound state, suppliers + parts — is re-broadcast via ray.put.
    At corpus-sized node sets the alive flag would ride a hash semi-join
    against the edges instead of a broadcast (same round structure). Runs to
    FIXPOINT and raises if ``max_rounds`` doesn't reach it, so the
    fixed-iteration SQL restatement (:func:`kcore_sql`) is exact by
    construction."""
    sym = _symmetrize(_sp_weighted_edges(sf_dir)).materialize()
    alive: set | None = None  # None → all nodes alive
    for _ in range(max_rounds):
        alive_ref = ray.put(alive)

        def deg_part(df: pd.DataFrame) -> pd.DataFrame:
            a = ray.get(alive_ref)
            if a is not None:
                df = df[df["u"].isin(a) & df["v"].isin(a)]
            return (df.groupby("u", as_index=False).size()
                    .rename(columns={"size": "d"}))

        def deg_fin(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby("u", as_index=False).agg(d=("d", "sum"))

        deg = bucketed_group_apply(sym, ["u"], deg_part, deg_fin).to_pandas()
        if "d" not in deg.columns:  # every block filtered to empty (sparse
            # graph peeled bare, or an empty sparsified edge set) — the
            # schema-less all-empty gotcha; the core is empty
            return pd.DataFrame({"node": pd.Series(dtype=np.int64),
                                 "deg": pd.Series(dtype=np.int64)})
        new_alive = set(deg[deg["d"] >= k]["u"].astype(np.int64))
        if alive is not None and new_alive == alive:
            out = deg[deg["u"].isin(alive)].rename(columns={"u": "node", "d": "deg"})
            out = out.astype({"node": np.int64, "deg": np.int64})
            return out.sort_values("node").reset_index(drop=True)
        alive = new_alive
        if not alive:
            return pd.DataFrame({"node": pd.Series(dtype=np.int64),
                                 "deg": pd.Series(dtype=np.int64)})
    raise RuntimeError(f"kcore did not reach fixpoint in {max_rounds} rounds")


def kcore_sql(k: int = 3, iters: int = 8) -> str:
    """Exact fixed-iteration chained-CTE restatement of :func:`kcore`
    (``iters`` must be ≥ the peel fixpoint, which :func:`kcore` enforces)."""
    head = f"""
WITH e0 AS (SELECT l_suppkey AS s, l_partkey + {_PART_OFFSET} AS p,
                   CAST(MIN(l_quantity) AS BIGINT) AS w
            FROM lineitem GROUP BY 1, 2
            HAVING CAST(MIN(l_quantity) AS BIGINT) <= {_W_MAX}),
sym AS (SELECT s AS u, p AS v FROM e0 UNION ALL SELECT p, s FROM e0),
a0 AS (SELECT DISTINCT u AS n FROM sym)"""
    steps = []
    for t in range(1, iters + 1):
        steps.append(f"""
a{t} AS MATERIALIZED (SELECT sym.u AS n FROM sym
         JOIN a{t-1} x ON sym.u = x.n JOIN a{t-1} y ON sym.v = y.n
         GROUP BY sym.u HAVING COUNT(*) >= {k})""")
    tail = f"""
SELECT CAST(sym.u AS BIGINT) AS node, CAST(COUNT(*) AS BIGINT) AS deg
FROM sym JOIN a{iters} x ON sym.u = x.n JOIN a{iters} y ON sym.v = y.n
GROUP BY sym.u"""
    return head + "," + ",".join(steps) + tail


@ray.remote
def _sssp_scatter(edges_tab, frontier_tab, n_buckets: int):
    """One relaxation round, scatter side: join the pinned edge bucket with
    its co-partitioned FRONTIER (nodes improved last round only), emit
    (v, nd=d+w) candidates pre-minned per v and split by v bucket."""
    import pyarrow as pa

    from .shuffle import _split_by_bucket

    empty = pa.table({"v": pa.array([], pa.int64()),
                      "nd": pa.array([], pa.int64())})
    if (edges_tab.num_rows == 0 or frontier_tab.num_rows == 0
            or frontier_tab.num_columns == 0):
        return tuple([empty] * n_buckets) if n_buckets > 1 else empty
    e = edges_tab.to_pandas()
    f = frontier_tab.to_pandas()
    j = e.merge(f, left_on="u", right_on="node", how="inner", sort=False)
    if j.empty:
        return tuple([empty] * n_buckets) if n_buckets > 1 else empty
    out = (pd.DataFrame({"v": j["v"].astype(np.int64),
                         "nd": (j["d"].to_numpy(np.int64)
                                + j["w"].to_numpy(np.int64))})
           .groupby("v", as_index=False).agg(nd=("nd", "min")))
    pieces = _split_by_bucket(pa.Table.from_pandas(out, preserve_index=False),
                              ["v"], n_buckets)
    return tuple(pieces) if n_buckets > 1 else pieces[0]


@ray.remote(num_returns=3)
def _sssp_gather(dist_tab, *pieces):
    """One relaxation round, gather side: min-merge this bucket's incoming
    candidates into its distance slice. Returns (new_dist, new_frontier,
    n_improved) — the scalar count is all the driver ever reads."""
    import pyarrow as pa

    d = (dist_tab.to_pandas() if dist_tab.num_columns
         else pd.DataFrame({"node": pd.Series(dtype=np.int64),
                            "d": pd.Series(dtype=np.int64)}))
    valid = [p for p in pieces if p.num_columns > 0 and p.num_rows > 0]
    empty_f = pa.table({"node": pa.array([], pa.int64()),
                        "d": pa.array([], pa.int64())})
    if not valid:
        return (pa.Table.from_pandas(d, preserve_index=False), empty_f, 0)
    cand = (pa.concat_tables(valid).to_pandas()
            .groupby("v", as_index=False).agg(nd=("nd", "min"))
            .rename(columns={"v": "node"}))
    m = d.merge(cand, on="node", how="outer", sort=False)
    old = m["d"].to_numpy(np.float64)   # NaN where unseen
    new = m["nd"].to_numpy(np.float64)  # NaN where no candidate
    better = ~np.isnan(new) & (np.isnan(old) | (new < old))
    m["d"] = np.where(better, new, old).astype(np.int64)
    front = m[better][["node", "d"]].astype({"node": np.int64, "d": np.int64})
    dist = m[["node", "d"]].astype({"node": np.int64, "d": np.int64})
    return (pa.Table.from_pandas(dist, preserve_index=False),
            pa.Table.from_pandas(front, preserve_index=False),
            int(better.sum()))


def sssp_ds(sym: "ray.data.Dataset", src: int, max_rounds: int = 10,
            n_buckets: int = 8) -> "ray.data.Dataset":
    """(node, dist) — single-source shortest paths over a symmetric weighted
    edge Dataset ``(u, v, w)`` as a pinned-partition FRONTIER JOIN (the same
    Pregel shape as :func:`pagerank`): the edge set is hash-bucketed by ``u``
    once and never moves again; distances live as co-partitioned per-bucket
    slices in the object store; each round scatters only the FRONTIER (nodes
    improved last round) through a B×B exchange of pre-minned candidate
    pieces and gathers per-bucket min-merges. The driver touches nothing but
    B scalar improved-counts per round — no distance map, no node table, no
    per-round broadcast — so the node set can exceed any driver-side bound.
    Runs to FIXPOINT and raises past ``max_rounds``."""
    from .shuffle import _split_by_bucket

    ident = lambda t: t  # noqa: E731
    e_bucketed = hash_exchange_apply(sym, ["u"], ident, ident,
                                     n_buckets=n_buckets)
    E = e_bucketed.to_arrow_refs()
    n_buckets = len(E)  # degenerate inputs may yield fewer blocks

    import pyarrow as pa
    seed = pa.table({"node": pa.array([src], pa.int64()),
                     "d": pa.array([0], pa.int64())})
    seed_pieces = _split_by_bucket(seed, ["node"], n_buckets)
    D = [ray.put(p) for p in seed_pieces]
    F = list(D)

    for _ in range(max_rounds):
        cps = [
            _sssp_scatter.options(num_returns=n_buckets).remote(
                E[b], F[b], n_buckets)
            for b in range(n_buckets)
        ]
        if n_buckets == 1:
            cps = [[c] for c in cps]
        outs = [
            _sssp_gather.remote(D[b], *[cps[s][b] for s in range(n_buckets)])
            for b in range(n_buckets)
        ]
        D = [o[0] for o in outs]
        F = [o[1] for o in outs]
        if sum(ray.get([o[2] for o in outs])) == 0:  # scalar-only fixpoint
            return ray.data.from_arrow_refs(D)
    raise RuntimeError(f"sssp did not reach fixpoint in {max_rounds} rounds")


def sssp(sf_dir: str, max_rounds: int = 10) -> pd.DataFrame:
    """(node, dist) — SSSP (Bellman-Ford layers) on the weight-sparsified
    supplier–part graph from the smallest supplier key, edge cost = the
    pair's min quantity. Thin wrapper over the distributed frontier-join
    core (:func:`sssp_ds`); only the node-catalog-bound RESULT lands on the
    driver, sorted for the oracle compare."""
    edges = _sp_weighted_edges(sf_dir)
    src = int(edges.min("src"))
    sym = _symmetrize(edges)
    out = sssp_ds(sym, src, max_rounds=max_rounds).to_pandas()
    out = out.rename(columns={"d": "dist"}).astype(
        {"node": np.int64, "dist": np.int64})
    return out.sort_values("node").reset_index(drop=True)


def sssp_sql(iters: int = 10) -> str:
    """Exact fixed-iteration Bellman-Ford restatement of :func:`sssp`."""
    head = f"""
WITH e0 AS (SELECT l_suppkey AS s, l_partkey + {_PART_OFFSET} AS p,
                   CAST(MIN(l_quantity) AS BIGINT) AS w
            FROM lineitem GROUP BY 1, 2
            HAVING CAST(MIN(l_quantity) AS BIGINT) <= {_W_MAX}),
sym AS (SELECT s AS u, p AS v, w FROM e0 UNION ALL SELECT p, s, w FROM e0),
d0 AS (SELECT MIN(s) AS n, CAST(0 AS BIGINT) AS d FROM e0)"""
    steps = []
    for t in range(1, iters + 1):
        steps.append(f"""
d{t} AS MATERIALIZED (SELECT n, MIN(d) AS d FROM (
           SELECT n, d FROM d{t-1}
           UNION ALL
           SELECT sym.v AS n, d{t-1}.d + sym.w AS d
           FROM sym JOIN d{t-1} ON sym.u = d{t-1}.n)
         GROUP BY n)""")
    tail = f"""
SELECT CAST(n AS BIGINT) AS node, CAST(d AS BIGINT) AS dist FROM d{iters}"""
    return head + "," + ",".join(steps) + tail


_PPR_SEEDS = (1, 2, 3)  # deterministic seed suppliers (keys exist at every sf)


@ray.remote
def _ppr_apply(nodes_tab, damping: float, *pieces):
    """Personalized gather: like _pr_apply but the teleport mass is a
    per-node ``base`` column (non-zero only on the seed set)."""
    import pyarrow as pa

    nodes = nodes_tab.to_pandas()
    valid = [p for p in pieces if p.num_columns > 0 and p.num_rows > 0]
    if valid:
        m = (pa.concat_tables(valid).to_pandas()
             .groupby("node", as_index=False).agg(m=("m", "sum")))
        nodes = nodes.merge(m, on="node", how="left", sort=False)
        nodes["m"] = nodes["m"].fillna(0.0)
    else:
        nodes = nodes.assign(m=np.float64(0.0))
    nodes["r"] = nodes["base"].to_numpy(np.float64) + damping * nodes["m"].to_numpy(np.float64)
    return pa.Table.from_pandas(nodes[["node", "base", "r"]], preserve_index=False)


def personalized_pagerank(sf_dir: str, iters: int = 5,
                          n_buckets: int = 8) -> "ray.data.Dataset":
    """(node, rank_e9) — personalized PageRank from a fixed seed set
    (suppliers {1,2,3}): teleport mass returns only to the seeds, giving
    proximity-to-seeds scores (the recommendation / related-entity random
    walk) instead of global importance.

    Identical pinned-partition Pregel loop to :func:`pagerank` — the ONLY
    change is the teleport vector, which rides the co-partitioned node
    table as a ``base`` column (non-zero on seeds), so the per-superstep
    dataflow, edge pinning and cost are unchanged."""
    edges = _supplier_part_edges(sf_dir).materialize()
    ident = lambda t: t  # noqa: E731
    e_bucketed = hash_exchange_apply(edges, ["src"], ident, ident,
                                     n_buckets=n_buckets)
    E = [_pr_prep_bucket.remote(ref) for ref in e_bucketed.to_arrow_refs()]

    seeds = set(_PPR_SEEDS)
    k = float(len(seeds))

    def nodes_of(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"node": pd.concat([df["src"], df["dst"]], ignore_index=True)}
        ).drop_duplicates()
        out["base"] = np.where(out["node"].isin(seeds), _TELEPORT / k, 0.0)
        return out

    def nodes_fin(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates("node")

    nodes_ds = grouped_aggregate(
        edges.map_batches(nodes_of, batch_format="pandas"),
        ["node"], nodes_fin, n_buckets=n_buckets,
    ).materialize()
    N = nodes_ds.to_arrow_refs()  # bucket b = block b, same hash as E

    @ray.remote
    def init_ranks(nodes_tab):
        import pyarrow as pa

        df = nodes_tab.to_pandas()
        df["r"] = np.where(df["node"].isin(seeds), 1.0 / k, 0.0)
        return pa.Table.from_pandas(df[["node", "base", "r"]],
                                    preserve_index=False)

    R = [init_ranks.remote(N[b]) for b in range(n_buckets)]
    for _ in range(iters):
        cps = [
            _pr_contrib.options(num_returns=n_buckets).remote(E[b], R[b], n_buckets)
            for b in range(n_buckets)
        ]
        if n_buckets == 1:
            cps = [[c] for c in cps]
        R = [
            _ppr_apply.remote(N[b], _DAMPING,
                              *[cps[src][b] for src in range(n_buckets)])
            for b in range(n_buckets)
        ]
    return ray.data.from_arrow_refs([_pr_out.remote(r) for r in R])


def personalized_pagerank_sql(iters: int = 5) -> str:
    """Exact fixed-iteration restatement of :func:`personalized_pagerank`."""
    seeds_list = ", ".join(str(s) for s in _PPR_SEEDS)
    k = len(_PPR_SEEDS)
    head = f"""
WITH e AS (SELECT DISTINCT l_suppkey AS src,
                  l_partkey + {_PART_OFFSET} AS dst FROM lineitem),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
deg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS c FROM e GROUP BY src),
nb AS (SELECT node, CASE WHEN node IN ({seeds_list})
                         THEN {_TELEPORT} / {k}.0 ELSE 0.0 END AS base
       FROM nodes),
r0 AS (SELECT node, CASE WHEN node IN ({seeds_list})
                         THEN 1.0 / {k}.0 ELSE 0.0 END AS r FROM nodes)"""
    steps = []
    for t in range(1, iters + 1):
        steps.append(f"""
r{t} AS MATERIALIZED (SELECT nb.node, nb.base + {_DAMPING}*COALESCE(s.m, 0) AS r
         FROM nb LEFT JOIN (
           SELECT e.dst AS node, SUM(r{t-1}.r / deg.c) AS m
           FROM e JOIN r{t-1} ON e.src = r{t-1}.node
                  JOIN deg ON e.src = deg.src
           GROUP BY e.dst) s ON nb.node = s.node)""")
    tail = f"""
SELECT node, CAST(ROUND(r * 1000000000) AS BIGINT) AS rank_e9 FROM r{iters}"""
    return head + "," + ",".join(steps) + tail


# ---------------------------------------------------------------------------
# HITS (hubs & authorities) — all-integer fixed-iteration variant
# ---------------------------------------------------------------------------

_HITS_SCALE = 1_000_000


def hits(sf_dir: str, iters: int = 3) -> pd.DataFrame:
    """(node, kind, score_e6) — HITS over the bipartite supplier→part graph:
    suppliers are hubs, parts are authorities. Kleinberg's update
    (a = Eᵀh, h = Ea) run for ``iters`` full rounds, with the usual L2
    normalization replaced by an EXACT integer rescale ``s·10⁶ // max(s)``
    after every half-step — every score is an integer at every step, so the
    DuckDB oracle matches bit-for-bit (no float summation-order noise, the
    lesson of rank_e9 rounding flake risk).

    Dataflow per half-step: the DISTINCT edge set (materialized once,
    :func:`_supplier_part_edges`) is scanned with the current score vector
    broadcast via ``ray.put`` (catalog-bound: |suppliers|+|parts| entries,
    never corpus-bound); per-block partials pre-collapse to (node, Σ) —
    catalog-bound per block — and fold directly on the driver, which needs
    the full score table each half-step anyway for the max-rescale +
    re-broadcast (no exchange; the same catalog-bound driver step as the
    assoc_rules degree broadcast). Overflow bound: scores ≤ 10⁶
    post-rescale, so int64 half-step sums hold to degree < 9.2e12; the
    rescale multiply itself runs in Python ints (arbitrary precision) so
    no degree wraps it.

    Reference parity note: no counterpart in the reference — brief-mandated
    graph-analytics family (link-analysis twin of :func:`pagerank`, which
    the reference motivates via influential-entity ranking,
    src/db/repository.py:259-335)."""
    edges = _supplier_part_edges(sf_dir).materialize()

    def _half_step(score: dict, join_key: str, group_key: str) -> pd.Series:
        ref = ray.put(score)

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            s = ray.get(ref)
            m = df[join_key].map(s)
            out = (
                pd.DataFrame({"node": df[group_key], "s": m})
                .groupby("node", as_index=False)["s"].sum()
            )
            out["s"] = out["s"].astype(np.int64)
            return out

        # per-block partials are already ≤ one row per node on this side
        # (catalog-bound), and the rescale needs the full score table on the
        # driver anyway — fold partials directly instead of paying an
        # exchange per half-step (integer sums, order-independent)
        parts = edges.map_batches(partial, batch_format="pandas").to_pandas()
        out = parts.groupby("node", as_index=False)["s"].sum()
        out["s"] = out["s"].astype(np.int64)
        mx = int(out["s"].max())
        # rescale in PYTHON ints (catalog-bound table): s·10⁶ would wrap
        # int64 for node degree ≥ ~9.2e6; arbitrary precision keeps the
        # recurrence exact at any degree (DuckDB promotes the same multiply
        # to HUGEINT-or-raise rather than wrapping)
        out["s"] = np.fromiter(
            ((int(v) * _HITS_SCALE) // mx for v in out["s"]),
            np.int64, len(out))
        return out

    # hubs start at 10^6 on every distinct src (block-distinct partials,
    # catalog-bound driver dedup — same shape as the half-step fold)
    h = dict.fromkeys(_distinct_src(edges).tolist(), _HITS_SCALE)
    a_tab = None
    for _ in range(iters):
        a_tab = _half_step(h, "src", "dst")
        a = dict(zip(a_tab["node"], a_tab["s"]))
        h_tab = _half_step(a, "dst", "src")
        h = dict(zip(h_tab["node"], h_tab["s"]))

    hubs = pd.DataFrame({"node": list(h.keys()), "score_e6": list(h.values())})
    hubs["kind"] = "hub"
    auths = a_tab.rename(columns={"s": "score_e6"})
    auths["kind"] = "auth"
    out = pd.concat([hubs, auths[["node", "score_e6", "kind"]]],
                    ignore_index=True)
    out["node"] = out["node"].astype(np.int64)
    out["score_e6"] = out["score_e6"].astype(np.int64)
    return out[["node", "kind", "score_e6"]]


def hits_sql(iters: int = 3) -> str:
    """Exact all-integer restatement of :func:`hits` as chained CTEs."""
    head = f"""
WITH e AS (SELECT DISTINCT l_suppkey AS src,
                  l_partkey + {_PART_OFFSET} AS dst FROM lineitem),
h0 AS (SELECT DISTINCT src AS node, CAST({_HITS_SCALE} AS BIGINT) AS s FROM e)"""
    steps = []
    for t in range(1, iters + 1):
        steps.append(f"""
a{t}r AS (SELECT e.dst AS node, SUM(h{t-1}.s) AS s
          FROM e JOIN h{t-1} ON e.src = h{t-1}.node GROUP BY e.dst),
a{t} AS (SELECT node, s * {_HITS_SCALE} // (SELECT MAX(s) FROM a{t}r) AS s
         FROM a{t}r),
h{t}r AS (SELECT e.src AS node, SUM(a{t}.s) AS s
          FROM e JOIN a{t} ON e.dst = a{t}.node GROUP BY e.src),
h{t} AS (SELECT node, s * {_HITS_SCALE} // (SELECT MAX(s) FROM h{t}r) AS s
         FROM h{t}r)""")
    tail = f"""
SELECT node, 'hub' AS kind, CAST(s AS BIGINT) AS score_e6 FROM h{iters}
UNION ALL
SELECT node, 'auth' AS kind, CAST(s AS BIGINT) AS score_e6 FROM a{iters}"""
    return head + "," + ",".join(steps) + tail


# ---------------------------------------------------------------------------
# Shared helpers for the walk/sampling family (one definition — the three
# consumers below must never drift apart)
# ---------------------------------------------------------------------------


def _symmetrized_edges(e: "ray.data.Dataset") -> "ray.data.Dataset":
    """Both directions of every (src, dst) edge, materialized once."""

    def sym(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "src": np.concatenate([df["src"].to_numpy(np.int64),
                                   df["dst"].to_numpy(np.int64)]),
            "dst": np.concatenate([df["dst"].to_numpy(np.int64),
                                   df["src"].to_numpy(np.int64)]),
        })

    return e.map_batches(sym, batch_format="pandas").materialize()


def _distinct_src(e: "ray.data.Dataset") -> np.ndarray:
    """Sorted distinct src nodes — block-distinct partials, catalog-bound
    driver dedup (the HITS fold shape)."""
    return (e.map_batches(
        lambda df: df[["src"]].drop_duplicates(), batch_format="pandas"
    ).to_pandas()["src"].drop_duplicates().sort_values()
        .to_numpy(np.int64))


# ---------------------------------------------------------------------------
# Deterministic random walks (DeepWalk/node2vec corpus-generation shape)
# ---------------------------------------------------------------------------

_WALK_STEPS = 3


def graph_walks(sf_dir: str, steps: int = _WALK_STEPS) -> pd.DataFrame:
    """(walk_id, step, node) — one walk per supplier node over the UNDIRECTED
    supplier↔part graph, ``steps`` hops each: the corpus-generation kernel of
    DeepWalk/node2vec (walk sequences feeding a skip-gram embedder).

    "Random" is a deterministic hash draw so the walk is exactly restatable
    in SQL: at step t the walk at ``cur`` moves to the neighbor minimizing
    ``md5('{walk_id}-{t}-{neighbor}')`` (hex-string order; neighbor-id
    tie-break) — independent draws per (walk, step) like seeded RNG, and
    identical at any parallelism (the md5-derived determinism convention of
    `epoch_shuffle` / `dsir_resample`).

    Dataflow per step: the frontier is one position per walk (catalog-bound
    — |suppliers| rows) and is broadcast via ``ray.put``; the symmetrized
    edge set (materialized once) is scanned with per-block argmin partials
    per walk — ≤ |walks| rows per block — folded on the driver (the HITS
    fold shape). md5-per-candidate-edge is Python-loop work, the documented
    price of SQL-checkability (see `rolling_fingerprint`); swap a seeded
    integer hash for production and the dataflow is unchanged. At corpus
    scale (walks from every node) the broadcast frontier becomes a
    frontier JOIN exactly like :func:`sssp`'s — the per-step dataflow is
    already written as scan + per-walk argmin, which that join preserves.

    Reference parity note: no counterpart in the reference — brief-mandated
    graph-representation-learning input family (walk corpus ahead of a
    skip-gram embedding stage)."""
    import hashlib

    e = _supplier_part_edges(sf_dir).materialize()
    edges = _symmetrized_edges(e)
    starts = _distinct_src(e)  # one walk per supplier node (catalog-bound)
    pos = dict(zip(starts.tolist(), starts.tolist()))  # walk_id -> cur node
    rows = [pd.DataFrame({"walk_id": starts, "step": np.int64(0),
                          "node": starts})]

    for t in range(1, steps + 1):
        ref = ray.put(pos)

        def part(df: pd.DataFrame, t=t) -> pd.DataFrame:
            p = ray.get(ref)
            # map cur-node -> walk_ids landed there (a node can host many)
            by_node: dict = {}
            for w, c in p.items():
                by_node.setdefault(c, []).append(w)
            src = df["src"].to_numpy(np.int64)
            dst = df["dst"].to_numpy(np.int64)
            # vectorized prefilter: only edges incident to the frontier
            # reach the md5 loop (at corpus scale most edges drop here)
            m = np.isin(src, np.fromiter(by_node, np.int64, len(by_node)))
            src, dst = src[m], dst[m]
            best: dict = {}
            for s, d in zip(src, dst):
                ws = by_node.get(int(s))
                for w in ws:
                    key = hashlib.md5(f"{w}-{t}-{d}".encode()).hexdigest()
                    cur_best = best.get(w)
                    if cur_best is None or (key, d) < cur_best:
                        best[w] = (key, int(d))
            return pd.DataFrame({
                "walk_id": np.fromiter(best.keys(), np.int64, len(best)),
                "k": [v[0] for v in best.values()],
                "node": np.fromiter((v[1] for v in best.values()), np.int64,
                                    len(best)),
            })

        parts = edges.map_batches(part, batch_format="pandas").to_pandas()
        parts = parts.sort_values(["walk_id", "k", "node"]) \
                     .drop_duplicates("walk_id", keep="first")
        pos = dict(zip(parts["walk_id"].astype(np.int64),
                       parts["node"].astype(np.int64)))
        rows.append(pd.DataFrame({
            "walk_id": parts["walk_id"].to_numpy(np.int64),
            "step": np.int64(t),
            "node": parts["node"].to_numpy(np.int64),
        }))

    out = pd.concat(rows, ignore_index=True)
    return out.sort_values(["walk_id", "step"]).reset_index(drop=True)


def graph_walks_sql(steps: int = _WALK_STEPS) -> str:
    """Exact chained-CTE restatement of :func:`graph_walks`."""
    head = f"""
WITH de AS (SELECT DISTINCT l_suppkey AS src,
                   l_partkey + {_PART_OFFSET} AS dst FROM lineitem),
e AS (SELECT src, dst FROM de UNION ALL SELECT dst AS src, src AS dst FROM de),
w0 AS (SELECT DISTINCT src AS walk_id, src AS node FROM de)"""
    steps_sql = []
    for t in range(1, steps + 1):
        steps_sql.append(f"""
w{t} AS (
  SELECT w.walk_id, e.dst AS node
  FROM w{t-1} w JOIN e ON e.src = w.node
  QUALIFY ROW_NUMBER() OVER (
    PARTITION BY w.walk_id
    ORDER BY md5(CAST(w.walk_id AS VARCHAR) || '-{t}-'
                 || CAST(e.dst AS VARCHAR)), e.dst) = 1)""")
    tail = "\nUNION ALL\n".join(
        f"SELECT walk_id, CAST({t} AS BIGINT) AS step, node FROM w{t}"
        for t in range(0, steps + 1))
    return (head + "," + ",".join(steps_sql)
            + "\nSELECT * FROM (\n" + tail
            + "\n) ORDER BY walk_id, step")


_SKIPGRAM_WINDOW = 2


def walk_skipgrams(sf_dir: str, window: int = _SKIPGRAM_WINDOW) -> pd.DataFrame:
    """(src, ctx, n) — skip-gram co-occurrence counts over the
    :func:`graph_walks` corpus (window ``±window`` inside each walk): the
    (center, context) pair table a DeepWalk/node2vec embedder trains on —
    the composition that turns the walk corpus into model input.

    Rides the deterministic walk table (catalog-bound here: one walk per
    supplier × steps+1 positions), so pair generation is one vectorized
    self-merge on (walk_id, |Δstep| ≤ window) and the count table is
    edge-vocabulary-bounded. At corpus scale (walks from every node) the
    SAME generation runs as a per-walk map stage — walks are generated
    partition-local, pairs pre-aggregate per block, and one (src, ctx)
    exchange merges counts; nothing in the kernel changes.

    Reference parity note: no counterpart in the reference — completes the
    brief-mandated graph-representation-learning input family started by
    :func:`graph_walks`."""
    walks = graph_walks(sf_dir)
    m = walks.merge(walks, on="walk_id", suffixes=("_a", "_b"))
    d = (m["step_a"] - m["step_b"]).abs()
    m = m[(d >= 1) & (d <= window)]
    out = (m.groupby(["node_a", "node_b"], as_index=False).size()
           .rename(columns={"node_a": "src", "node_b": "ctx", "size": "n"}))
    out["src"] = out["src"].astype(np.int64)
    out["ctx"] = out["ctx"].astype(np.int64)
    out["n"] = out["n"].astype(np.int64)
    return (out.sort_values(["src", "ctx"]).reset_index(drop=True)
            [["src", "ctx", "n"]])


def walk_skipgrams_sql(window: int = _SKIPGRAM_WINDOW,
                       steps: int = _WALK_STEPS) -> str:
    """:func:`walk_skipgrams` restated over the :func:`graph_walks_sql`
    walk CTEs (same chained-QUALIFY walk construction, then a windowed
    self-join)."""
    walks = graph_walks_sql(steps)
    return f"""
WITH walks AS ({walks})
SELECT a.node AS src, b.node AS ctx, CAST(COUNT(*) AS BIGINT) AS n
FROM walks a JOIN walks b
  ON a.walk_id = b.walk_id
 AND abs(a.step - b.step) BETWEEN 1 AND {window}
GROUP BY 1, 2
ORDER BY 1, 2"""


_SAMPLE_FANOUT = 3


def neighbor_sample(sf_dir: str, fanout: int = _SAMPLE_FANOUT) -> pd.DataFrame:
    """(root, hop, parent, node) — fixed-fanout 2-hop neighborhood sampling
    per supplier root over the symmetrized supplier↔part graph: the
    GraphSAGE/GNN minibatch primitive (Hamilton et al. 2017), with the
    random draw replaced by md5 ranking so the sample is deterministic and
    exactly restatable — hop 1 keeps each root's ``fanout`` neighbors of
    smallest ``md5('{root}-1-{nbr}')``, hop 2 keeps ``fanout`` per sampled
    parent keyed by ``md5('{root}-2-{parent}-{nbr}')`` (independent draws
    per (root, parent), like seeded RNG streams).

    Dataflow per hop: the frontier is catalog-bound (roots, then
    roots×fanout pairs), broadcast via ``ray.put``; per-block partials keep
    only the local top-``fanout`` per frontier key before a driver merge of
    ≤ |frontier|·fanout rows per block (the graph_walks fold shape, with
    top-F in place of argmin; the same vectorized isin prefilter guards the
    md5 loop). At corpus scale the frontier broadcast becomes the sssp-style
    frontier join — the per-hop kernel is unchanged.

    Reference parity note: no counterpart in the reference — completes the
    brief-mandated graph-representation-learning family (walk corpus →
    skip-grams → GNN neighborhood sampling)."""
    import hashlib

    e = _supplier_part_edges(sf_dir).materialize()
    edges = _symmetrized_edges(e)
    roots = _distinct_src(e)

    def hop(frontier: dict, hopno: int) -> pd.DataFrame:
        """frontier: key-tuple -> frontier node; returns sampled rows."""
        ref = ray.put(frontier)

        def part(df: pd.DataFrame, hopno=hopno) -> pd.DataFrame:
            fr = ray.get(ref)
            by_node: dict = {}
            for key, cur in fr.items():
                by_node.setdefault(cur, []).append(key)
            src = df["src"].to_numpy(np.int64)
            dst = df["dst"].to_numpy(np.int64)
            m = np.isin(src, np.fromiter(by_node, np.int64, len(by_node)))
            src, dst = src[m], dst[m]
            rows = []
            for s, d in zip(src, dst):
                for key in by_node[int(s)]:
                    tag = "-".join(str(x) for x in key)
                    rows.append((key, hashlib.md5(
                        f"{tag}-{hopno}-{d}".encode()).hexdigest(), int(d)))
            if not rows:
                return pd.DataFrame({"key": pd.Series(dtype=object),
                                     "k": pd.Series(dtype=str),
                                     "node": pd.Series(dtype=np.int64)})
            out = pd.DataFrame(rows, columns=["key", "k", "node"])
            # local top-fanout per frontier key before leaving the block
            out = out.sort_values(["k", "node"]).groupby(
                "key", sort=False).head(fanout)
            return out

        parts = edges.map_batches(part, batch_format="pandas").to_pandas()
        parts = parts.sort_values(["k", "node"]).groupby(
            "key", sort=False).head(fanout)
        return parts

    h1 = hop({(int(r),): int(r) for r in roots}, 1)
    rows1 = pd.DataFrame({
        "root": [k[0] for k in h1["key"]],
        "hop": np.int64(1),
        "parent": [k[0] for k in h1["key"]],
        "node": h1["node"].to_numpy(np.int64),
    })
    h2 = hop({(int(k[0]), int(n)): int(n)
              for k, n in zip(h1["key"], h1["node"])}, 2)
    rows2 = pd.DataFrame({
        "root": [k[0] for k in h2["key"]],
        "hop": np.int64(2),
        "parent": [k[1] for k in h2["key"]],
        "node": h2["node"].to_numpy(np.int64),
    })
    out = pd.concat([rows1, rows2], ignore_index=True)
    out = out.astype({"root": np.int64, "hop": np.int64,
                      "parent": np.int64, "node": np.int64})
    return (out.sort_values(["root", "hop", "parent", "node"])
            .reset_index(drop=True))


def neighbor_sample_sql(fanout: int = _SAMPLE_FANOUT) -> str:
    """Exact restatement of :func:`neighbor_sample`."""
    return f"""
WITH de AS (SELECT DISTINCT l_suppkey AS src,
                   l_partkey + {_PART_OFFSET} AS dst FROM lineitem),
e AS (SELECT src, dst FROM de UNION ALL SELECT dst AS src, src AS dst FROM de),
roots AS (SELECT DISTINCT src AS root FROM de),
h1 AS (
  SELECT r.root, e.dst AS node
  FROM roots r JOIN e ON e.src = r.root
  QUALIFY ROW_NUMBER() OVER (
    PARTITION BY r.root
    ORDER BY md5(CAST(r.root AS VARCHAR) || '-1-' || CAST(e.dst AS VARCHAR)),
             e.dst) <= {fanout}),
h2 AS (
  SELECT h1.root, h1.node AS parent, e.dst AS node
  FROM h1 JOIN e ON e.src = h1.node
  QUALIFY ROW_NUMBER() OVER (
    PARTITION BY h1.root, h1.node
    ORDER BY md5(CAST(h1.root AS VARCHAR) || '-' || CAST(h1.node AS VARCHAR)
                 || '-2-' || CAST(e.dst AS VARCHAR)), e.dst) <= {fanout})
SELECT root, CAST(1 AS BIGINT) AS hop, root AS parent, node FROM h1
UNION ALL
SELECT root, CAST(2 AS BIGINT) AS hop, parent, node FROM h2
ORDER BY root, hop, parent, node"""


# ---------------------------------------------------------------------------
# Community detection: synchronous label propagation (Raghavan et al. 2007)
# ---------------------------------------------------------------------------

_LP_ITERS = 3


@ray.remote
def _lp_contrib(edges_tab, labels_tab, n_buckets: int):
    """One superstep, scatter side: join the pinned src-bucketed edge set
    with its co-partitioned label bucket, emit per-(dst, label) COUNT
    partials split by dst bucket — the partial collapse happens inside the
    task so only (node, label, c) rows ever cross the wire (bounded by the
    bucket's distinct (dst, label) pairs, shrinking as labels converge)."""
    import pyarrow as pa

    from .shuffle import _split_by_bucket

    empty = pa.table({"node": pa.array([], pa.int64()),
                      "label": pa.array([], pa.int64()),
                      "c": pa.array([], pa.int64())})
    if edges_tab.num_rows == 0 or labels_tab.num_rows == 0:
        return tuple([empty] * n_buckets) if n_buckets > 1 else empty
    e = edges_tab.to_pandas()
    lab = labels_tab.to_pandas()
    j = e.merge(lab, left_on="src", right_on="node", how="inner", sort=False)
    g = (j.groupby(["dst", "label"], as_index=False, sort=False)
         .agg(c=("label", "size")))
    out = pa.Table.from_pandas(
        pd.DataFrame({"node": g["dst"].astype(np.int64),
                      "label": g["label"].astype(np.int64),
                      "c": g["c"].astype(np.int64)}),
        preserve_index=False)
    pieces = _split_by_bucket(out, ["node"], n_buckets)
    return tuple(pieces) if n_buckets > 1 else pieces[0]


@ray.remote
def _lp_apply(*pieces):
    """One superstep, gather side: sum this bucket's (node, label) counts,
    then per node keep the most frequent label, smallest label on ties —
    the deterministic synchronous LPA update, matching the SQL's
    ROW_NUMBER ORDER BY c DESC, label ASC exactly."""
    import pyarrow as pa

    valid = [p for p in pieces if p.num_columns > 0 and p.num_rows > 0]
    if not valid:
        return pa.table({"node": pa.array([], pa.int64()),
                         "label": pa.array([], pa.int64())})
    df = (pa.concat_tables(valid).to_pandas()
          .groupby(["node", "label"], as_index=False).agg(c=("c", "sum")))
    df = df.sort_values(["node", "c", "label"],
                        ascending=[True, False, True], kind="stable")
    win = df.drop_duplicates("node", keep="first")
    return pa.Table.from_pandas(
        win[["node", "label"]].astype(np.int64).reset_index(drop=True),
        preserve_index=False)


def label_propagation(sf_dir: str, iters: int = _LP_ITERS,
                      n_buckets: int = 8,
                      edges: "ray.data.Dataset | None" = None
                      ) -> "ray.data.Dataset":
    """(node, community) — `iters` synchronous label-propagation rounds over
    the symmetrized supplier↔part graph; init label(v) = v, update label(v) =
    most frequent neighbor label with smallest-label tie-break (Raghavan et
    al. 2007, made deterministic by the synchronous schedule + integer
    tie-break so the chained-CTE SQL oracle replays it bit-for-bit).

    Dataflow is the PageRank Pregel shape: edges are hash-bucketed by src
    ONCE and pinned in the object store; labels are co-partitioned by the
    same hash, so each round is B scatter tasks (local join, per-(dst,label)
    count partials, split by dst bucket) + B argmax-gather tasks. Edges
    never move after round 0 and per-round traffic is (node, label, c) rows
    only — at 100 TB the label table is node-bound and the partials shrink
    as communities coalesce. Every node of the symmetrized graph has ≥ 1
    neighbor, so the contributions cover the full node set each round (the
    inner-join semantics the SQL states).

    Reference parity note: no counterpart in the reference (query-layer
    traversals only); completes the graph-analytics family (PageRank / PPR /
    HITS / k-core / SSSP / CC / triangles) with its standard community op.
    """
    if edges is None:  # caller may pass the materialized edge set to share
        edges = _symmetrized_edges(_supplier_part_edges(sf_dir))
    ident = lambda t: t  # noqa: E731
    e_bucketed = hash_exchange_apply(edges, ["src"], ident, ident,
                                     n_buckets=n_buckets)
    E = e_bucketed.to_arrow_refs()

    @ray.remote
    def init_labels(edges_tab):
        df = edges_tab.to_pandas()
        nodes = df["src"].drop_duplicates().astype(np.int64)
        return pa.Table.from_pandas(
            pd.DataFrame({"node": nodes, "label": nodes}),
            preserve_index=False)

    # bucket b's srcs ARE its co-partitioned node set (same hash, and the
    # symmetrized edge set contains every node as a src)
    L = [init_labels.remote(E[b]) for b in range(n_buckets)]
    for _ in range(iters):
        cps = [
            _lp_contrib.options(num_returns=n_buckets).remote(E[b], L[b], n_buckets)
            for b in range(n_buckets)
        ]
        if n_buckets == 1:
            cps = [[c] for c in cps]
        L = [
            _lp_apply.remote(*[cps[src][b] for src in range(n_buckets)])
            for b in range(n_buckets)
        ]

    @ray.remote
    def out(tab):
        df = tab.to_pandas()
        return pa.Table.from_pandas(
            pd.DataFrame({"node": df["node"].astype(np.int64),
                          "community": df["label"].astype(np.int64)}),
            preserve_index=False)

    return ray.data.from_arrow_refs([out.remote(r) for r in L])


def _label_prop_ctes(iters: int) -> list[str]:
    """Shared CTE chain (edge set + ``iters`` synchronous rounds) — final
    labels land in ``l{iters}``; used by the label_propagation AND
    graph_modularity oracles so both replay the identical propagation."""
    ctes = [
        f"de AS (SELECT DISTINCT l_suppkey AS src, "
        f"l_partkey + {_PART_OFFSET} AS dst FROM lineitem)",
        "e AS (SELECT src, dst FROM de "
        "UNION ALL SELECT dst AS src, src AS dst FROM de)",
        "l0 AS (SELECT DISTINCT src AS node, src AS label FROM e)",
    ]
    for k in range(1, iters + 1):
        ctes.append(f"""l{k} AS (
  SELECT node, label FROM (
    SELECT e.dst AS node, l.label, COUNT(*) AS c
    FROM e JOIN l{k - 1} l ON l.node = e.src GROUP BY 1, 2)
  QUALIFY ROW_NUMBER() OVER (
    PARTITION BY node ORDER BY c DESC, label ASC) = 1)""")
    return ctes


def label_propagation_sql(iters: int = _LP_ITERS) -> str:
    """Exact chained-CTE restatement of :func:`label_propagation`."""
    return ("WITH " + ",\n".join(_label_prop_ctes(iters))
            + f"\nSELECT node, label AS community FROM l{iters} ORDER BY node")


def graph_modularity(sf_dir: str, iters: int = _LP_ITERS,
                     n_buckets: int = 8) -> pd.DataFrame:
    """(community, n_nodes, intra2, d_sum, term_e9) — Newman modularity
    terms of the label-propagation partition: per community c,
    ``term = intra2_c/M2 − (d_c/M2)²`` over the symmetrized (directed-pair)
    edge set, where intra2_c counts directed intra-community edges, d_c sums
    member degrees, and M2 is the total directed edge count; Σ terms is the
    modularity Q of the partition (Newman & Girvan 2004). The term is
    deliberately emitted PER COMMUNITY, not summed — each is one
    identical-double from exact integers (the theil_terms doctrine), while a
    cross-row float sum would be engine-order-dependent.

    Dataflow: the communities come from the oracle-gated
    :func:`label_propagation` Pregel; TWO tagged-union hash exchanges attach
    the src then dst community to each edge (labels are node-bound state,
    the same class the propagation itself shuffles), with per-bucket
    (community, n_nodes/d_sum/intra2) partials; one community-keyed
    grouped_aggregate combines them, M2 folds to one scalar, and a final
    zero-shuffle pass computes the term with unbounded-int numerators
    (intra2·M2 and d² pass int64 at ~3e9 directed edges → object dtype here,
    HUGEINT in the oracle)."""
    from .shuffle import bucketed_group_apply, grouped_aggregate
    from .stats import _round_e9_vec

    # ONE edge build shared with the propagation (already materialized by
    # _symmetrized_edges) — no second lineitem scan / distinct exchange
    edges = _symmetrized_edges(_supplier_part_edges(sf_dir))
    lab = label_propagation(sf_dir, iters=iters, n_buckets=n_buckets,
                            edges=edges)

    # unified tagged schema (kind, node, c, v): kind 0 = edge row (node=key,
    # c carries the other endpoint or the src community), 1 = d_sum partial,
    # 2 = n_nodes partial, 3 = label row, 4 = intra2 partial
    def tag_edges(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "kind": np.zeros(len(df), dtype=np.int64),
            "node": df["src"].to_numpy(np.int64),
            "c": df["dst"].to_numpy(np.int64),
            "v": np.ones(len(df), dtype=np.int64)})

    def tag_labels(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "kind": np.full(len(df), 3, dtype=np.int64),
            "node": df["node"].to_numpy(np.int64),
            "c": df["community"].to_numpy(np.int64),
            "v": np.ones(len(df), dtype=np.int64)})

    tagged_labels = lab.map_batches(tag_labels, batch_format="pandas")

    def attach_src(df: pd.DataFrame) -> pd.DataFrame:
        labs = df[df["kind"] == 3]
        cmap = dict(zip(labs["node"].to_numpy(np.int64),
                        labs["c"].to_numpy(np.int64)))
        ed = df[df["kind"] == 0]
        c_src = ed["node"].map(cmap).to_numpy(np.int64)
        out = [pd.DataFrame({"kind": np.zeros(len(ed), dtype=np.int64),
                             "node": ed["c"].to_numpy(np.int64),  # the dst
                             "c": c_src,
                             "v": np.ones(len(ed), dtype=np.int64)})]
        d_part = pd.Series(c_src).value_counts()
        out.append(pd.DataFrame({"kind": 1, "node": -1,
                                 "c": d_part.index.to_numpy(np.int64),
                                 "v": d_part.to_numpy(np.int64)}))
        n_part = labs["c"].value_counts()
        out.append(pd.DataFrame({"kind": 2, "node": -1,
                                 "c": n_part.index.to_numpy(np.int64),
                                 "v": n_part.to_numpy(np.int64)}))
        return pd.concat(out, ignore_index=True)

    pass_a = bucketed_group_apply(
        edges.map_batches(tag_edges, batch_format="pandas")
        .union(tagged_labels),
        ["node"], lambda d: d, attach_src, n_buckets=n_buckets)

    def attach_dst(df: pd.DataFrame) -> pd.DataFrame:
        labs = df[df["kind"] == 3]
        cmap = dict(zip(labs["node"].to_numpy(np.int64),
                        labs["c"].to_numpy(np.int64)))
        ed = df[df["kind"] == 0]
        c_dst = ed["node"].map(cmap).to_numpy(np.int64)
        intra = pd.Series(ed["c"].to_numpy(np.int64)[
            ed["c"].to_numpy(np.int64) == c_dst]).value_counts()
        out = [df[df["kind"].isin([1, 2])],
               pd.DataFrame({"kind": 4, "node": -1,
                             "c": intra.index.to_numpy(np.int64),
                             "v": intra.to_numpy(np.int64)})]
        return pd.concat(out, ignore_index=True)

    pass_b = bucketed_group_apply(
        pass_a.union(tagged_labels), ["node"], lambda d: d, attach_dst,
        n_buckets=n_buckets)

    def comb(df: pd.DataFrame) -> pd.DataFrame:
        if "kind" in df.columns:  # first (partial) call: raw tagged rows
            df = pd.DataFrame({
                "c": df["c"].to_numpy(np.int64),
                "n_nodes": np.where(df["kind"] == 2, df["v"], 0),
                "d_sum": np.where(df["kind"] == 1, df["v"], 0),
                "intra2": np.where(df["kind"] == 4, df["v"], 0)})
        return df.groupby("c", as_index=False).agg(
            n_nodes=("n_nodes", "sum"), d_sum=("d_sum", "sum"),
            intra2=("intra2", "sum"))

    per_c = grouped_aggregate(pass_b, ["c"], comb,
                              n_buckets=n_buckets).materialize()
    m2_raw = per_c.sum("d_sum")  # None on an all-empty Dataset
    if not m2_raw:
        # empty edge set: the SQL oracle returns 0 rows; raise loudly
        # instead of dividing by zero (the classifier_kappa convention)
        raise ValueError("graph_modularity: empty edge set")
    m2 = int(m2_raw)

    def term(df: pd.DataFrame) -> pd.DataFrame:
        intra2 = df["intra2"].to_numpy(np.int64)
        d = df["d_sum"].to_numpy(np.int64)
        # exact big-int numerator (object dtype), then ONE double division —
        # the same CAST(num AS DOUBLE)/CAST(m2*m2 AS DOUBLE) the SQL states
        num = intra2.astype(object) * m2 - d.astype(object) * d.astype(object)
        v = np.array([float(x) for x in num], dtype=np.float64) \
            / float(m2 * m2)
        return pd.DataFrame({
            "community": df["c"].to_numpy(np.int64),
            "n_nodes": df["n_nodes"].to_numpy(np.int64),
            "intra2": intra2, "d_sum": d,
            "term_e9": _round_e9_vec(v)})

    return (per_c.map_batches(term, batch_format="pandas").to_pandas()
            .sort_values("community")
            .reset_index(drop=True))  # community-bound output table


def graph_modularity_sql(iters: int = _LP_ITERS) -> str:
    ctes = _label_prop_ctes(iters) + [
        "mm AS (SELECT CAST(COUNT(*) AS HUGEINT) AS m2 FROM e)",
        "deg AS (SELECT src AS node, CAST(COUNT(*) AS HUGEINT) AS d "
        "FROM e GROUP BY 1)",
        f"lab AS (SELECT node, label FROM l{iters})",
        "cstats AS (SELECT l.label AS community,"
        " CAST(COUNT(*) AS HUGEINT) AS n_nodes,"
        " CAST(SUM(deg.d) AS HUGEINT) AS d_sum"
        " FROM lab l JOIN deg ON deg.node = l.node GROUP BY 1)",
        "intra AS (SELECT ls.label AS community,"
        " CAST(COUNT(*) AS HUGEINT) AS intra2"
        " FROM e JOIN lab ls ON e.src = ls.node"
        " JOIN lab ld ON e.dst = ld.node"
        " WHERE ls.label = ld.label GROUP BY 1)",
    ]
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT cstats.community,
       CAST(cstats.n_nodes AS BIGINT) AS n_nodes,
       CAST(COALESCE(intra.intra2, 0) AS BIGINT) AS intra2,
       CAST(cstats.d_sum AS BIGINT) AS d_sum,
       CAST(ROUND(CAST(COALESCE(intra.intra2, 0) * mm.m2
                       - cstats.d_sum * cstats.d_sum AS DOUBLE)
                  / CAST(mm.m2 * mm.m2 AS DOUBLE) * 1000000000)
         AS BIGINT) AS term_e9
FROM cstats LEFT JOIN intra USING (community), mm
ORDER BY community""")


GRAPH_MODULARITY_SQL = graph_modularity_sql()


# ---------------------------------------------------------------------------
# k-truss (iterative edge peeling by triangle support)
# ---------------------------------------------------------------------------

_TRUSS_K = 4
_TRUSS_ROUNDS = 2


def _edge_support(co: "ray.data.Dataset") -> "ray.data.Dataset":
    """(ta, tb, sup) — per-edge triangle support of the lex-ordered edge set,
    via the degree-oriented wedge enumeration of :func:`_triangles` (each
    triangle found exactly once from its lowest-degree vertex, then credited
    to all THREE of its edges). Orientation affects only who finds a
    triangle, never the support counts, so the output matches the
    lexicographic three-way self-join the SQL states."""
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
        a_first = da <= db
        return pd.DataFrame({
            "src": np.where(a_first, df["ta"], df["tb"]),
            "dst": np.where(a_first, df["tb"], df["ta"]),
        })

    oriented = co.map_batches(orient, batch_format="pandas")

    def wedge_final(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for src, g in df.groupby("src"):
            nb = np.unique(g["dst"].to_numpy())
            if len(nb) < 2:
                continue
            iu, ju = np.triu_indices(len(nb), k=1)
            outs.append(pd.DataFrame(
                {"b": nb[iu], "c": nb[ju], "apex": src,
                 "is_edge": np.int8(0)}))
        if not outs:
            return pd.DataFrame(
                {"b": pd.Series(dtype=str), "c": pd.Series(dtype=str),
                 "apex": pd.Series(dtype=str),
                 "is_edge": pd.Series(dtype=np.int8)})
        return pd.concat(outs, ignore_index=True)

    wedges = bucketed_group_apply(oriented, ["src"], lambda df: df, wedge_final)

    def canon_pair(df: pd.DataFrame) -> pd.DataFrame:
        lo = np.minimum(df["b"], df["c"])
        hi = np.maximum(df["b"], df["c"])
        return df.assign(b=lo, c=hi)

    edge_rows = co.map_batches(
        lambda df: pd.DataFrame(
            {"b": df["ta"], "c": df["tb"], "apex": "",
             "is_edge": np.int8(1)}),
        batch_format="pandas")
    tagged = wedges.map_batches(canon_pair, batch_format="pandas").union(edge_rows)

    _sup_cols = {"ta": pd.Series(dtype=str), "tb": pd.Series(dtype=str),
                 "sup": pd.Series(dtype=np.int64)}

    def close_edges(df: pd.DataFrame) -> pd.DataFrame:
        present = df.loc[df["is_edge"] == 1, ["b", "c"]].drop_duplicates()
        tri = df[df["is_edge"] == 0].merge(present, on=["b", "c"])
        if tri.empty:
            return pd.DataFrame(_sup_cols)
        ap, b, c = (tri["apex"].to_numpy(), tri["b"].to_numpy(),
                    tri["c"].to_numpy())
        e = pd.DataFrame({
            "ta": np.concatenate([np.minimum(ap, b), np.minimum(ap, c), b]),
            "tb": np.concatenate([np.maximum(ap, b), np.maximum(ap, c), c]),
        })
        return (e.groupby(["ta", "tb"], as_index=False).size()
                .rename(columns={"size": "sup"}))

    partial = bucketed_group_apply(tagged, ["b", "c"], lambda df: df,
                                   close_edges)
    return grouped_aggregate(
        partial, ["ta", "tb"],
        lambda df: df.groupby(["ta", "tb"], as_index=False)
        .agg(sup=("sup", "sum")))


def ktruss(sf_dir: str, k: int = _TRUSS_K,
           rounds: int = _TRUSS_ROUNDS) -> "ray.data.Dataset":
    """(ta, tb) — edges surviving `rounds` k-truss peeling iterations over
    the term co-occurrence graph: each round recomputes per-edge triangle
    support WITHIN the current subgraph and drops edges with support
    < k−2 (edges in no triangle drop immediately — they never appear in the
    support table). Bounded rounds for a deterministic oracle (the kcore
    ``max_rounds`` doctrine); at convergence this is the exact k-truss, and
    the cohesive core it extracts is the standard community-backbone
    operator one step above k-core.

    Per round: one vocabulary-bound degree pass (broadcast — recomputed so
    wedge fan-out follows the SHRINKING graph's skew, though support counts
    are orientation-independent either way), one src exchange emitting
    degree-oriented wedges (volume bounded by arboricity, not max-degree²),
    one closing-pair exchange crediting each found triangle to its three
    edges, one edge-key sum. Edge sets only shrink, so every round is
    cheaper than the last."""
    from ..pipelines.kgflat import cooccurrence

    co = cooccurrence(sf_dir).map_batches(
        lambda df: pd.DataFrame({"ta": df["term_a"].astype(str),
                                 "tb": df["term_b"].astype(str)}),
        batch_format="pandas").materialize()
    thresh = k - 2
    # adaptive peel (dedup_ensemble closure precedent): the co-occurrence
    # graph is VOCABULARY-bounded, so under the edge cap the whole peel
    # runs as local joins — one driver pass beats rounds × (degree pass +
    # two exchanges) of fixed per-stage latency. The distributed loop
    # remains the past-cap path with identical round semantics.
    if co.count() <= _TRUSS_DRIVER_CAP:
        e = co.to_pandas()
        for _ in range(rounds):
            if e.empty:
                break
            w = e.merge(e, left_on="tb", right_on="ta",
                        suffixes=("1", "2"))
            t = w.merge(e, left_on=["ta1", "tb2"], right_on=["ta", "tb"])
            tri = t[["ta1", "tb1", "tb2"]]
            pairs = pd.concat([
                tri.rename(columns={"ta1": "ta", "tb1": "tb"})[["ta", "tb"]],
                tri.rename(columns={"ta1": "ta", "tb2": "tb"})[["ta", "tb"]],
                tri.rename(columns={"tb1": "ta", "tb2": "tb"})[["ta", "tb"]],
            ], ignore_index=True)
            sup = pairs.groupby(["ta", "tb"], as_index=False).size()
            e = (sup[sup["size"] >= thresh][["ta", "tb"]]
                 .reset_index(drop=True))
        import ray.data as rd

        return rd.from_pandas(e.astype({"ta": str, "tb": str})
                              if len(e) else
                              pd.DataFrame({"ta": pd.Series(dtype=str),
                                            "tb": pd.Series(dtype=str)}))
    for _ in range(rounds):
        sup = _edge_support(co)
        co = sup.map_batches(
            lambda df: df.loc[df["sup"] >= thresh, ["ta", "tb"]],
            batch_format="pandas").materialize()
    return co


def ktruss_sql(k: int = _TRUSS_K, rounds: int = _TRUSS_ROUNDS,
               unnest_sql: str | None = None) -> str:
    """Exact restatement of :func:`ktruss` (bounded peeling rounds as
    chained three-way-join CTEs). ``unnest_sql`` is the documents→terms
    explode the co-occurrence oracle uses (injected by the registry to
    avoid a stages→pipelines import)."""
    from ..pipelines.registry import _UNNEST

    u = unnest_sql if unnest_sql is not None else _UNNEST
    ctes = [
        f"dt AS (SELECT DISTINCT doc_id, term FROM ({u}))",
        "co0 AS (SELECT a.term AS ta, b.term AS tb FROM dt a JOIN dt b "
        "ON a.doc_id = b.doc_id AND a.term < b.term GROUP BY 1, 2)",
    ]
    for r in range(1, rounds + 1):
        p = f"co{r - 1}"
        ctes.append(f"""t{r} AS (
  SELECT e1.ta AS a, e1.tb AS b, e2.tb AS c
  FROM {p} e1 JOIN {p} e2 ON e1.tb = e2.ta
       JOIN {p} e3 ON e3.ta = e1.ta AND e3.tb = e2.tb),
s{r} AS (
  SELECT ta, tb, COUNT(*) AS sup FROM (
    SELECT a AS ta, b AS tb FROM t{r}
    UNION ALL SELECT a, c FROM t{r}
    UNION ALL SELECT b, c FROM t{r})
  GROUP BY 1, 2),
co{r} AS (SELECT ta, tb FROM s{r} WHERE sup >= {k - 2})""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT ta, tb FROM co{rounds} ORDER BY ta, tb")


_TRUSS_DRIVER_CAP = 1 << 21  # edges; vocabulary-bounded graph in practice

_LP_TOPK = 50
_LP_MIN_CO = 2


def link_prediction(sf_dir: str, k: int = _LP_TOPK,
                    min_co: int = _LP_MIN_CO) -> pd.DataFrame:
    """(part_a, part_b, cn, ra_e9, pa) top-k — common-neighbor link
    prediction over the part co-purchase graph: parts are adjacent when
    they appear together in ≥ ``min_co`` orders; NON-adjacent pairs are
    ranked by shared-neighbor evidence. Three classic scores, all
    integer-exact: ``cn`` = common-neighbor count, ``ra_e9`` = resource
    allocation Σ_z 10⁹//d(z) (integer division per apex, order-free int
    sum — the Adamic-Adar family without the float-log summation hazard),
    ``pa`` = preferential attachment d(a)·d(b).

    Plan: the thresholded edge set comes from the assoc_rules basket
    machinery (distinct-basket partials → orderkey exchange → vectorized
    pair emission → pair exchange); its graph-degree map is catalog-bound
    and broadcasts. The symmetric adjacency then rides ONE apex-keyed
    exchange — each reducer owns complete neighborhoods and emits all
    neighbor pairs with the apex's RA term via the same group-offset index
    arithmetic as :func:`_basket_pairs` (no per-apex Python loop; int64
    ``np.add.reduceat`` keeps the RA sums exact) — and a pair-keyed second
    exchange sums wedge evidence, drops existing edges (tagged-union
    anti-join) and keeps a LOCAL top-k, so the driver ranks k×buckets
    rows. Wedge fan-out is Σd² — inherent to the score (the oracle pays it
    too); the `_BASKET_CAP` guard raises loudly on a degree that would
    blow it up (the J6 hot-key doctrine: cap/salt + log, never silently).

    Reference parity: generalizes the reference's shared-node candidate
    generation (`src/services/graph_service.py:231-296`) from "≥1 shared
    node → candidate" to ranked multi-evidence scoring."""
    from .shuffle import arrow_group_agg, hash_exchange_apply

    co, _ = _basket_pair_stats(sf_dir)
    edges = co.map_batches(
        lambda t: t.filter(pc.greater_equal(t["co"], min_co))
        .select(["pa", "pb"]),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    # graph degree (≠ basket degree): adjacent-part count per part in the
    # thresholded edge set — catalog-bound, computed driver-side
    edf = edges.to_pandas()
    both = pd.concat([edf["pa"], edf["pb"]], ignore_index=True)
    deg = both.value_counts().sort_index()
    dk = deg.index.to_numpy(np.int64)
    dv = deg.to_numpy(np.int64)
    deg_ref = ray.put((dk, dv))

    def sym(t: pa.Table) -> pa.Table:
        s = np.concatenate([t["pa"].to_numpy(zero_copy_only=False),
                            t["pb"].to_numpy(zero_copy_only=False)])
        d = np.concatenate([t["pb"].to_numpy(zero_copy_only=False),
                            t["pa"].to_numpy(zero_copy_only=False)])
        return pa.table({"s": s.astype(np.int64), "t": d.astype(np.int64)})

    und = edges.map_batches(sym, batch_format="pyarrow", zero_copy_batch=True)

    _wedge_schema = pa.schema([
        ("x", pa.int64()), ("y", pa.int64()), ("cn", pa.int64()),
        ("ra_e9", pa.int64()), ("is_edge", pa.int8())])

    def wedge_final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "s" not in t.column_names:
            return _wedge_schema.empty_table()
        s = t["s"].to_numpy(zero_copy_only=False).astype(np.int64)
        nb = t["t"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(s)
        order = np.lexsort((nb, s))
        s, nb = s[order], nb[order]
        if nb.max(initial=0) >= 1 << 31:
            raise ValueError("partkey exceeds 2^31: widen the pair packing")
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = s[1:] != s[:-1]
        gstart = np.flatnonzero(new)
        sizes = np.diff(np.append(gstart, n))
        if sizes.max(initial=0) > _BASKET_CAP:
            raise ValueError(
                f"neighborhood of {sizes.max()} exceeds cap {_BASKET_CAP}")
        g = np.cumsum(new) - 1
        r = np.arange(n, dtype=np.int64) - gstart[g]
        cnt = sizes[g] - r - 1
        total = int(cnt.sum())
        if total == 0:
            return _wedge_schema.empty_table()
        a_idx = np.repeat(np.arange(n, dtype=np.int64), cnt)
        block_start = np.repeat(np.cumsum(cnt) - cnt, cnt)
        b_idx = a_idx + (np.arange(total, dtype=np.int64) - block_start) + 1
        dk_, dv_ = ray.get(deg_ref)
        ra = 10**9 // dv_[np.searchsorted(dk_, s[a_idx])]
        key = (nb[a_idx] << np.int64(32)) | nb[b_idx]
        ks = np.argsort(key, kind="stable")
        key_s, ra_s = key[ks], ra[ks]
        bnd = np.empty(len(key_s), dtype=bool)
        bnd[0] = True
        bnd[1:] = key_s[1:] != key_s[:-1]
        starts = np.flatnonzero(bnd)
        uniq = key_s[starts]
        cn = np.diff(np.append(starts, len(key_s))).astype(np.int64)
        ra_sum = np.add.reduceat(ra_s, starts)  # int64-exact
        return pa.table({
            "x": (uniq >> np.int64(32)).astype(np.int64),
            "y": (uniq & np.int64(0x7FFFFFFF)).astype(np.int64),
            "cn": cn, "ra_e9": ra_sum.astype(np.int64),
            "is_edge": np.zeros(len(uniq), np.int8)})

    wedges = hash_exchange_apply(und, ["s"], lambda t: t, wedge_final)

    edge_rows = edges.map_batches(
        lambda t: pa.table({
            "x": t["pa"].cast(pa.int64()), "y": t["pb"].cast(pa.int64()),
            "cn": pa.array(np.zeros(t.num_rows, np.int64)),
            "ra_e9": pa.array(np.zeros(t.num_rows, np.int64)),
            "is_edge": pa.array(np.ones(t.num_rows, np.int8))}),
        batch_format="pyarrow", zero_copy_batch=True)

    _out = pa.schema([("part_a", pa.int64()), ("part_b", pa.int64()),
                      ("cn", pa.int64()), ("ra_e9", pa.int64()),
                      ("pa", pa.int64())])

    def score_final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "is_edge" not in t.column_names:
            return _out.empty_table()
        wt = t.filter(pc.equal(t["is_edge"], 0))
        if wt.num_rows == 0:
            return _out.empty_table()
        sc = arrow_group_agg(wt.select(["x", "y", "cn", "ra_e9"]),
                             ["x", "y"], [("cn", "sum"), ("ra_e9", "sum")])
        et = t.filter(pc.equal(t["is_edge"], 1))
        if et.num_rows > 0:
            ek = ((et["x"].to_numpy(zero_copy_only=False).astype(np.int64)
                   << np.int64(32))
                  | et["y"].to_numpy(zero_copy_only=False).astype(np.int64))
            ek = np.unique(ek)
            sk = ((sc["x"].to_numpy(zero_copy_only=False).astype(np.int64)
                   << np.int64(32))
                  | sc["y"].to_numpy(zero_copy_only=False).astype(np.int64))
            pos = np.searchsorted(ek, sk)
            hit = (pos < len(ek)) & (ek[np.minimum(pos, len(ek) - 1)] == sk)
            sc = sc.filter(pa.array(~hit))
        if sc.num_rows == 0:
            return _out.empty_table()
        dk_, dv_ = ray.get(deg_ref)
        xa = sc["x"].to_numpy(zero_copy_only=False).astype(np.int64)
        ya = sc["y"].to_numpy(zero_copy_only=False).astype(np.int64)
        pav = (dv_[np.searchsorted(dk_, xa)]
               * dv_[np.searchsorted(dk_, ya)]).astype(np.int64)
        out = pa.table({"part_a": xa, "part_b": ya,
                        "cn": sc["cn"].cast(pa.int64()),
                        "ra_e9": sc["ra_e9"].cast(pa.int64()),
                        "pa": pav})
        idx = pc.sort_indices(out, sort_keys=[
            ("cn", "descending"), ("ra_e9", "descending"),
            ("part_a", "ascending"), ("part_b", "ascending")])
        return out.take(idx[:k])

    parts = hash_exchange_apply(wedges.union(edge_rows), ["x", "y"],
                                lambda t: t, score_final).to_pandas()
    if "part_a" not in parts.columns:
        parts = pd.DataFrame(columns=[f.name for f in _out])
    out = parts.sort_values(["cn", "ra_e9", "part_a", "part_b"],
                            ascending=[False, False, True, True]).head(k)
    return out.reset_index(drop=True).astype(np.int64)


def link_prediction_sql(k: int = _LP_TOPK, min_co: int = _LP_MIN_CO) -> str:
    """Exact restatement of :func:`link_prediction` (wedge join + anti-join
    against the ≥min_co co-purchase edge set; ``//`` keeps RA integer)."""
    return f"""
WITH b AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem),
co AS (SELECT a.p AS ta, b.p AS tb FROM b a JOIN b b
       ON a.k = b.k AND a.p < b.p GROUP BY 1, 2
       HAVING COUNT(*) >= {min_co}),
und AS (SELECT ta AS s, tb AS t FROM co UNION ALL SELECT tb, ta FROM co),
deg AS (SELECT s AS term, CAST(COUNT(*) AS BIGINT) AS d FROM und GROUP BY 1),
wed AS (SELECT u1.t AS x, u2.t AS y, u1.s AS apex
        FROM und u1 JOIN und u2 ON u1.s = u2.s AND u1.t < u2.t),
sc AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS cn,
              CAST(SUM(1000000000 // d) AS BIGINT) AS ra_e9
       FROM wed JOIN deg ON apex = term GROUP BY 1, 2),
ne AS (SELECT sc.x, sc.y, sc.cn, sc.ra_e9 FROM sc
       LEFT JOIN co ON sc.x = co.ta AND sc.y = co.tb WHERE co.ta IS NULL)
SELECT CAST(x AS BIGINT) AS part_a, CAST(y AS BIGINT) AS part_b, cn, ra_e9,
       CAST(da.d * db.d AS BIGINT) AS pa
FROM ne JOIN deg da ON x = da.term JOIN deg db ON y = db.term
ORDER BY cn DESC, ra_e9 DESC, part_a, part_b LIMIT {k}
"""


def degree_assortativity(sf_dir: str) -> pd.DataFrame:
    """(n_edges, sum_dxdy, r_e9) one row — degree assortativity of the
    entity co-occurrence graph: the Pearson correlation of endpoint degrees
    over the directed (symmetrized) edge list. Positive r = hubs attach to
    hubs; the standard structural health check before sampling walks or
    training GNN-style models on the graph.

    Six exact integer sufficient statistics summarize the whole edge
    stream (the ``price_qty_regression`` recipe): degrees come from the
    vocabulary-bound broadcast map, each block folds its (dx, dy) partial
    sums, the driver adds O(blocks) rows, and r is ONE identical-double
    expression over exact ints — no float summation order anywhere."""
    import math

    co, deg_df = _co_graph(sf_dir)
    dmap_ref = ray.put(dict(zip(deg_df["term"], deg_df["d"].astype(np.int64))))

    def part(df: pd.DataFrame) -> pd.DataFrame:
        dmap = ray.get(dmap_ref)
        dx = pd.concat([df["ta"], df["tb"]], ignore_index=True).map(dmap) \
            .to_numpy(np.int64)
        dy = pd.concat([df["tb"], df["ta"]], ignore_index=True).map(dmap) \
            .to_numpy(np.int64)
        return pd.DataFrame({
            "n": [np.int64(len(dx))], "sx": [dx.sum()], "sy": [dy.sum()],
            "sxx": [(dx * dx).sum()], "syy": [(dy * dy).sum()],
            "sxy": [(dx * dy).sum()]})

    parts = co.map_batches(part, batch_format="pandas").to_pandas()
    n = int(parts["n"].sum())
    sx, sy = int(parts["sx"].sum()), int(parts["sy"].sum())
    sxx, syy = int(parts["sxx"].sum()), int(parts["syy"].sum())
    sxy = int(parts["sxy"].sum())
    den = float(n * sxx - sx * sx) * float(n * syy - sy * sy)
    if den <= 0:
        r_e9 = 0
    else:
        from .stats import _round_e9
        r_e9 = _round_e9(float(n * sxy - sx * sy) / math.sqrt(den))
    return pd.DataFrame({"n_edges": [np.int64(n)],
                         "sum_dxdy": [np.int64(sxy)],
                         "r_e9": [np.int64(r_e9)]})


def degree_assortativity_sql(unnest_sql: str | None = None) -> str:
    """Exact restatement of :func:`degree_assortativity` — the same integer
    sufficient stats, the same single double expression for r."""
    from ..pipelines.registry import _UNNEST

    u = unnest_sql if unnest_sql is not None else _UNNEST
    return f"""
WITH dt AS (SELECT DISTINCT doc_id, term FROM ({u})),
co AS (SELECT a.term AS ta, b.term AS tb FROM dt a JOIN dt b
       ON a.doc_id = b.doc_id AND a.term < b.term GROUP BY 1, 2),
und AS (SELECT ta AS s, tb AS t FROM co UNION ALL SELECT tb, ta FROM co),
deg AS (SELECT s AS term, CAST(COUNT(*) AS BIGINT) AS d FROM und GROUP BY 1),
e AS (SELECT da.d AS dx, db.d AS dy FROM und
      JOIN deg da ON s = da.term JOIN deg db ON t = db.term),
st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(dx) AS sx, SUM(dy) AS sy,
              SUM(dx * dx) AS sxx, SUM(dy * dy) AS syy,
              SUM(dx * dy) AS sxy FROM e)
SELECT n AS n_edges, CAST(sxy AS BIGINT) AS sum_dxdy,
       CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE)
                 * CAST(n * syy - sy * sy AS DOUBLE) <= 0 THEN 0
            ELSE CAST(ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE))
                 * 1000000000) AS BIGINT) END AS r_e9
FROM st
"""


# ---------------------------------------------------------------------------
# A-priori frequent triples (size-3 itemsets)
# ---------------------------------------------------------------------------

_ITEMSETS3_CAP = 256  # pruned-basket cap before triple enumeration (loud)

_TRIPLES_SCHEMA = pa.schema([("p1", pa.int64()), ("p2", pa.int64()),
                             ("p3", pa.int64()), ("n", pa.int64())])


def _in_sorted(sorted_arr: np.ndarray, vals: np.ndarray) -> np.ndarray:
    if len(sorted_arr) == 0:
        return np.zeros(len(vals), dtype=bool)
    idx = np.minimum(np.searchsorted(sorted_arr, vals), len(sorted_arr) - 1)
    return sorted_arr[idx] == vals


def itemsets3(sf_dir: str, min_sup: int = 2) -> "ray.data.Dataset":
    """(p1, p2, p3, support) — frequent size-3 itemsets over order baskets
    with support >= ``min_sup``: the A-priori step past the pair mining of
    :func:`assoc_rules`.

    The PRUNE is the scale story, not the enumeration: pass 1 reuses the
    pair exchange to get frequent pairs, whose packed keys are broadcast
    once (the A-priori candidate table — broadcast-sized by construction,
    since min_sup grows with the corpus precisely to keep it so). Pass 2 is
    ONE orderkey exchange; inside each bucket a basket first drops items in
    no frequent pair, then enumerates triples of the SURVIVORS only
    (size-templated index arithmetic, no per-order Python beyond the
    distinct-size loop), and keeps a candidate only when all three sub-pairs
    are frequent — the downward-closure property guarantees no frequent
    triple is lost, which is why the brute 3-way self-join oracle matches
    exactly. A final triple-key exchange sums partial counts. Pruned
    baskets past ``_ITEMSETS3_CAP`` raise loudly (cubic enumeration needs
    the cap raised deliberately, not silently)."""
    from itertools import combinations

    from ..sources.tables import read_table
    from .shuffle import arrow_group_agg, hash_exchange_apply

    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def co_sum(t: pa.Table) -> pa.Table:
        return arrow_group_agg(t, ["pa", "pb"], [("co", "sum")])

    co = hash_exchange_apply(
        hash_exchange_apply(ds, ["l_orderkey"], _basket_distinct,
                            _basket_pairs),
        ["pa", "pb"], co_sum, co_sum)

    fp = co.map_batches(
        lambda t: t.filter(pc.greater_equal(t["co"], min_sup)),
        batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    if len(fp):
        pk = np.sort((fp["pa"].to_numpy(np.int64) << np.int64(32))
                     | fp["pb"].to_numpy(np.int64))
        items = np.unique(np.concatenate(
            [fp["pa"].to_numpy(np.int64), fp["pb"].to_numpy(np.int64)]))
    else:
        pk = np.array([], dtype=np.int64)
        items = np.array([], dtype=np.int64)
    cand_ref = ray.put((pk, items))

    def triples(t: pa.Table) -> pa.Table:
        pk_s, items_s = ray.get(cand_ref)
        t = _basket_distinct(t)  # global dedup post-exchange
        o = t["l_orderkey"].to_numpy(zero_copy_only=False)
        p = t["l_partkey"].to_numpy(zero_copy_only=False)
        keep = _in_sorted(items_s, p)
        o, p = o[keep], p[keep]
        n = len(p)
        if n == 0:
            return _TRIPLES_SCHEMA.empty_table()
        order = np.lexsort((p, o))
        o, p = o[order], p[order]
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = o[1:] != o[:-1]
        gstart = np.flatnonzero(new)
        sizes = np.diff(np.append(gstart, n))
        if sizes.max(initial=0) > _ITEMSETS3_CAP:
            raise ValueError(
                f"pruned basket of {sizes.max()} frequent-pair items exceeds "
                f"cap {_ITEMSETS3_CAP}; raise it deliberately")
        i1 = []
        i2 = []
        i3 = []
        tmpl_cache: dict[int, np.ndarray] = {}
        for s in np.unique(sizes):
            s = int(s)
            if s < 3:
                continue
            tmpl = tmpl_cache.setdefault(
                s, np.array(list(combinations(range(s), 3)), dtype=np.int64))
            starts = gstart[sizes == s]
            idx = starts[:, None, None] + tmpl[None, :, :]
            idx = idx.reshape(-1, 3)
            i1.append(idx[:, 0])
            i2.append(idx[:, 1])
            i3.append(idx[:, 2])
        if not i1:
            return _TRIPLES_SCHEMA.empty_table()
        a = p[np.concatenate(i1)]
        b = p[np.concatenate(i2)]
        c = p[np.concatenate(i3)]
        # downward closure: every sub-pair must be frequent
        m = (_in_sorted(pk_s, (a << np.int64(32)) | b)
             & _in_sorted(pk_s, (a << np.int64(32)) | c)
             & _in_sorted(pk_s, (b << np.int64(32)) | c))
        if not m.any():
            return _TRIPLES_SCHEMA.empty_table()
        df = pd.DataFrame({"p1": a[m], "p2": b[m], "p3": c[m]})
        g = df.groupby(["p1", "p2", "p3"], as_index=False).size()
        return pa.table({"p1": g["p1"].to_numpy(np.int64),
                         "p2": g["p2"].to_numpy(np.int64),
                         "p3": g["p3"].to_numpy(np.int64),
                         "n": g["size"].to_numpy(np.int64)})

    def tri_sum(t: pa.Table) -> pa.Table:
        return arrow_group_agg(t, ["p1", "p2", "p3"], [("n", "sum")])

    tri = hash_exchange_apply(
        hash_exchange_apply(ds, ["l_orderkey"], _basket_distinct, triples),
        ["p1", "p2", "p3"], tri_sum, tri_sum)

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["n"], min_sup))
        return pa.table({"p1": t["p1"].cast(pa.int64()),
                         "p2": t["p2"].cast(pa.int64()),
                         "p3": t["p3"].cast(pa.int64()),
                         "support": t["n"].cast(pa.int64())})

    return tri.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)


def itemsets3_sql(min_sup: int = 2) -> str:
    return f"""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS p1, b.l_partkey AS p2, c.l_partkey AS p3,
       CAST(COUNT(*) AS BIGINT) AS support
FROM op a
JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
JOIN op c ON a.l_orderkey = c.l_orderkey AND b.l_partkey < c.l_partkey
GROUP BY 1, 2, 3 HAVING COUNT(*) >= {min_sup}
"""


ITEMSETS3_SQL = itemsets3_sql()


# ---------------------------------------------------------------------------
# Double-sweep diameter estimate
# ---------------------------------------------------------------------------

def graph_diameter(sf_dir: str, max_rounds: int = 10) -> pd.DataFrame:
    """(src_a, ecc_a, src_b, ecc_b, n_reached) — double-sweep diameter
    lower bound of the weight-sparsified supplier-part graph: SSSP from the
    smallest node gives its eccentricity and farthest node b; SSSP from b
    gives ecc_b — the classic 2-sweep bound (exact on trees, near-tight in
    practice). Eccentricities are over the REACHED component (standard for
    disconnected graphs); argmax ties break to the smallest node.

    Pure composition: two runs of the pinned-partition frontier-join SSSP
    core — the edge set is bucketed once per sweep, distances never land on
    the driver except as the node-catalog-bound result used to pick the
    next source."""
    edges = _sp_weighted_edges(sf_dir)
    src_a = int(edges.min("src"))
    sym = _symmetrize(edges).materialize()
    d1 = sssp_ds(sym, src_a, max_rounds=max_rounds).to_pandas()
    d1 = d1.sort_values(["d", "node"], ascending=[False, True])
    ecc_a = int(d1.iloc[0]["d"])
    src_b = int(d1.iloc[0]["node"])
    d2 = sssp_ds(sym, src_b, max_rounds=max_rounds).to_pandas()
    ecc_b = int(d2["d"].max())
    return pd.DataFrame(
        [[src_a, ecc_a, src_b, ecc_b, len(d2)]],
        columns=["src_a", "ecc_a", "src_b", "ecc_b", "n_reached"]
    ).astype(np.int64)


def graph_diameter_sql(iters: int = 10) -> str:
    """Two chained fixed-iteration Bellman-Ford unrollings; sweep 2's
    source is sweep 1's (max d, min node) row."""

    def chain(tag: str, d0: str) -> str:
        steps = [f"{tag}0 AS MATERIALIZED ({d0})"]
        for t in range(1, iters + 1):
            steps.append(f"""
{tag}{t} AS MATERIALIZED (SELECT n, MIN(d) AS d FROM (
           SELECT n, d FROM {tag}{t-1}
           UNION ALL
           SELECT sym.v AS n, {tag}{t-1}.d + sym.w AS d
           FROM sym JOIN {tag}{t-1} ON sym.u = {tag}{t-1}.n)
         GROUP BY n)""")
        return ",".join(steps)

    head = f"""
WITH e0 AS (SELECT l_suppkey AS s, l_partkey + {_PART_OFFSET} AS p,
                   CAST(MIN(l_quantity) AS BIGINT) AS w
            FROM lineitem GROUP BY 1, 2
            HAVING CAST(MIN(l_quantity) AS BIGINT) <= {_W_MAX}),
sym AS (SELECT s AS u, p AS v, w FROM e0 UNION ALL SELECT p, s, w FROM e0),
srca AS (SELECT MIN(s) AS n FROM e0),"""
    c1 = chain("da", "SELECT n, CAST(0 AS BIGINT) AS d FROM srca")
    pick = f"""
far AS (SELECT n, d FROM da{iters} ORDER BY d DESC, n LIMIT 1)"""
    c2 = chain("db", "SELECT n, CAST(0 AS BIGINT) AS d FROM far")
    tail = f"""
SELECT CAST((SELECT n FROM srca) AS BIGINT) AS src_a,
       CAST((SELECT d FROM far) AS BIGINT) AS ecc_a,
       CAST((SELECT n FROM far) AS BIGINT) AS src_b,
       CAST((SELECT MAX(d) FROM db{iters}) AS BIGINT) AS ecc_b,
       CAST((SELECT COUNT(*) FROM db{iters}) AS BIGINT) AS n_reached"""
    return head + c1 + "," + pick + "," + c2 + tail


GRAPH_DIAMETER_SQL = graph_diameter_sql()


# ---------------------------------------------------------------------------
# Hub-removal robustness
# ---------------------------------------------------------------------------

_ROBUST_HUBS = 5
_ROBUST_CC_DRIVER_CAP = 1 << 21  # edges; past this the distributed CC runs


def graph_robustness(sf_dir: str, n_hubs: int = _ROBUST_HUBS) -> pd.DataFrame:
    """(n_removed, n_nodes, n_edges, n_components, largest_cc) — targeted-
    attack robustness of the sparsified supplier-part graph: remove the
    ``n_hubs`` highest-degree nodes (ties to the smallest node id), then
    measure what remains — the fragmentation audit behind 'is this graph
    held together by a few hubs'.

    Degrees ride one key-only exchange (node-catalog-bounded); the hub set
    is a fixed-size broadcast filter on the edge stream; components run on
    the distributed min-label CC. Only 5 scalars land on the driver."""
    from .shuffle import hash_exchange_apply

    edges = _sp_weighted_edges(sf_dir).materialize()
    sym = _symmetrize(edges)

    def deg_part(t: pa.Table) -> pa.Table:
        return (pa.table({"node": t["u"].cast(pa.int64())})
                .group_by("node").aggregate([([], "count_all")])
                .rename_columns(["node", "deg"]))

    def deg_fin(t: pa.Table) -> pa.Table:
        return (t.group_by("node").aggregate([("deg", "sum")])
                .rename_columns(["node", "deg"]))

    deg = hash_exchange_apply(sym, ["node"], deg_part, deg_fin).to_pandas()
    hubs = set(deg.sort_values(["deg", "node"], ascending=[False, True])
               .head(n_hubs)["node"].astype(int))
    h_ref = ray.put(np.asarray(sorted(hubs), dtype=np.int64))

    def strip(df: pd.DataFrame) -> pd.DataFrame:
        hs = ray.get(h_ref)
        keep = (~df["u"].isin(hs)) & (~df["v"].isin(hs))
        sub = df[keep]
        # orient one direction so edges count once
        sub = sub[sub["u"] < sub["v"]]
        return pd.DataFrame({"a": sub["u"].astype(np.int64),
                             "b": sub["v"].astype(np.int64)})

    rest = sym.map_batches(strip, batch_format="pandas").materialize()
    n_edges = rest.count()
    # adaptive closure (dedup_ensemble precedent): small edge sets close on
    # the driver; past the cap the distributed min-label CC runs
    if not n_edges:
        n_nodes, n_comp, largest = 0, 0, -1
    elif n_edges <= _ROBUST_CC_DRIVER_CAP:
        from .canonicalize import driver_component_summary

        up = rest.to_pandas()  # edge-count-bounded (just checked)
        n_nodes, n_comp, largest = driver_component_summary(up, "a", "b")
    else:
        from .canonicalize import connected_components_ds

        labels = connected_components_ds(rest)
        n_nodes = labels.count()
        sizes = labels.groupby("label").count()
        n_comp = sizes.count()
        largest = int(sizes.max("count()"))
    return pd.DataFrame(
        [[len(hubs), n_nodes, n_edges, n_comp, largest]],
        columns=["n_removed", "n_nodes", "n_edges", "n_components",
                 "largest_cc"]).astype(np.int64)


def graph_robustness_sql(n_hubs: int = _ROBUST_HUBS) -> str:
    return f"""
WITH RECURSIVE
e0 AS (SELECT l_suppkey AS s, l_partkey + {_PART_OFFSET} AS p,
              CAST(MIN(l_quantity) AS BIGINT) AS w
       FROM lineitem GROUP BY 1, 2
       HAVING CAST(MIN(l_quantity) AS BIGINT) <= {_W_MAX}),
sym AS (SELECT s AS u, p AS v FROM e0 UNION ALL SELECT p, s FROM e0),
deg AS (SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM sym
        GROUP BY 1),
hubs AS (SELECT node FROM deg ORDER BY deg DESC, node LIMIT {n_hubs}),
rest AS (SELECT u AS a, v AS b FROM sym
         WHERE u < v AND u NOT IN (SELECT node FROM hubs)
           AND v NOT IN (SELECT node FROM hubs)),
re AS (SELECT a, b FROM rest UNION SELECT b, a FROM rest),
nodes AS (SELECT DISTINCT a AS n FROM re),
reach(n, m) AS (
  SELECT n, n FROM nodes
  UNION
  SELECT r.n, re.b FROM reach r JOIN re ON r.m = re.a),
comp AS (SELECT n, MIN(m) AS c FROM reach GROUP BY n),
cl AS (SELECT c, COUNT(*) AS sz FROM comp GROUP BY c)
SELECT CAST((SELECT COUNT(*) FROM hubs) AS BIGINT) AS n_removed,
       CAST((SELECT COUNT(*) FROM comp) AS BIGINT) AS n_nodes,
       CAST((SELECT COUNT(*) FROM rest) AS BIGINT) AS n_edges,
       CAST((SELECT COUNT(*) FROM cl) AS BIGINT) AS n_components,
       CAST(COALESCE((SELECT MAX(sz) FROM cl), -1) AS BIGINT) AS largest_cc
FROM (SELECT 1)
"""


GRAPH_ROBUSTNESS_SQL = graph_robustness_sql()


# ---------------------------------------------------------------------------
# BFS with shortest-path counts + exact pair-dependency betweenness
# ---------------------------------------------------------------------------

@ray.remote
def _bfs_scatter(edges_tab, frontier_tab, n_buckets: int):
    """Level-synchronous BFS scatter: join the pinned edge bucket with its
    frontier slice (all at level L), emit (v, sig) path-count candidates
    pre-summed per v and split by v bucket."""
    import pyarrow as pa

    from .shuffle import _split_by_bucket

    empty = pa.table({"v": pa.array([], pa.int64()),
                      "sig": pa.array([], pa.int64())})
    if (edges_tab.num_rows == 0 or frontier_tab.num_rows == 0
            or frontier_tab.num_columns == 0):
        return tuple([empty] * n_buckets) if n_buckets > 1 else empty
    e = edges_tab.to_pandas()
    f = frontier_tab.to_pandas()
    j = e.merge(f, left_on="u", right_on="node", how="inner", sort=False)
    if j.empty:
        return tuple([empty] * n_buckets) if n_buckets > 1 else empty
    out = (pd.DataFrame({"v": j["v"].astype(np.int64),
                         "sig": j["sig"].astype(np.int64)})
           .groupby("v", as_index=False).agg(sig=("sig", "sum")))
    # wrap shows up as negative after an int64 sum — check both bounds
    if int(out["sig"].max()) >= 1 << 62 or int(out["sig"].min()) < 0:
        raise OverflowError("BFS path count approaching int64; this graph "
                            "needs big-int sigma carry")
    pieces = _split_by_bucket(pa.Table.from_pandas(out, preserve_index=False),
                              ["v"], n_buckets)
    return tuple(pieces) if n_buckets > 1 else pieces[0]


@ray.remote(num_returns=3)
def _bfs_gather(state_tab, level: int, *pieces):
    """Level-synchronous BFS gather: candidates for UNSEEN nodes become the
    next frontier with d = level and sigma = the cross-bucket sum (every
    shortest path to a level-L+1 node passes a level-L node, so the sum is
    the exact path count). Seen nodes are final — candidates ignored."""
    import pyarrow as pa

    st = (state_tab.to_pandas() if state_tab.num_columns
          else pd.DataFrame({"node": pd.Series(dtype=np.int64),
                             "d": pd.Series(dtype=np.int64),
                             "sig": pd.Series(dtype=np.int64)}))
    empty_f = pa.table({"node": pa.array([], pa.int64()),
                        "sig": pa.array([], pa.int64())})
    valid = [p for p in pieces if p.num_columns > 0 and p.num_rows > 0]
    if not valid:
        return (pa.Table.from_pandas(st, preserve_index=False), empty_f, 0)
    cand = (pa.concat_tables(valid).to_pandas()
            .groupby("v", as_index=False).agg(sig=("sig", "sum"))
            .rename(columns={"v": "node"}))
    if len(cand) and (int(cand["sig"].max()) >= 1 << 62
                      or int(cand["sig"].min()) < 0):
        raise OverflowError("BFS path count approaching int64")
    new = cand[~cand["node"].isin(st["node"])]
    if new.empty:
        return (pa.Table.from_pandas(st, preserve_index=False), empty_f, 0)
    add = pd.DataFrame({"node": new["node"].astype(np.int64),
                        "d": np.int64(level),
                        "sig": new["sig"].astype(np.int64)})
    st2 = pd.concat([st, add], ignore_index=True)
    front = add[["node", "sig"]]
    return (pa.Table.from_pandas(st2, preserve_index=False),
            pa.Table.from_pandas(front, preserve_index=False),
            int(len(add)))


_BFS_LEVELS = 20


def bfs_sigma_ds(sym: "ray.data.Dataset", src: int,
                 max_rounds: int = _BFS_LEVELS,
                 n_buckets: int = 8) -> "ray.data.Dataset":
    """(node, d, sig) — BFS levels + exact shortest-path counts from
    ``src`` over an unweighted symmetric edge Dataset (u, v): the Brandes
    forward pass, as the same pinned-partition frontier join as
    :func:`sssp_ds` (edges bucketed once; per-bucket state slices in the
    object store; the driver reads one scalar per round).

    Truncation semantics: if the frontier is still growing at
    ``max_rounds``, the ≤``max_rounds``-level PARTIAL state is returned —
    matching the unrolled-CTE SQL oracles (pair_betweenness /
    graph_hop_histogram), which stop at the same level cap; nodes farther
    than ``max_rounds`` hops are simply absent on both sides."""
    from .shuffle import _split_by_bucket

    ident = lambda t: t  # noqa: E731
    e_bucketed = hash_exchange_apply(sym, ["u"], ident, ident,
                                     n_buckets=n_buckets)
    E = e_bucketed.to_arrow_refs()
    n_buckets = len(E)

    seed = pa.table({"node": pa.array([src], pa.int64()),
                     "d": pa.array([0], pa.int64()),
                     "sig": pa.array([1], pa.int64())})
    seed_f = pa.table({"node": pa.array([src], pa.int64()),
                       "sig": pa.array([1], pa.int64())})
    D = [ray.put(p) for p in _split_by_bucket(seed, ["node"], n_buckets)]
    F = [ray.put(p) for p in _split_by_bucket(seed_f, ["node"], n_buckets)]

    for level in range(1, max_rounds + 1):
        cps = [
            _bfs_scatter.options(num_returns=n_buckets).remote(
                E[b], F[b], n_buckets)
            for b in range(n_buckets)
        ]
        if n_buckets == 1:
            cps = [[c] for c in cps]
        outs = [
            _bfs_gather.remote(D[b], level,
                               *[cps[s][b] for s in range(n_buckets)])
            for b in range(n_buckets)
        ]
        D = [o[0] for o in outs]
        F = [o[1] for o in outs]
        grew = sum(ray.get([o[2] for o in outs]))
        if grew == 0:
            break
    # no else-raise: a frontier still growing at max_rounds yields the
    # partial state, mirroring the oracle's fixed-depth unrolled CTE
    import ray.data as rd

    return rd.from_arrow_refs(D)


_BTW_SRC = 1
_BTW_DST = 2


def pair_betweenness(sf_dir: str, src: int = _BTW_SRC,
                     dst: int = _BTW_DST) -> pd.DataFrame:
    """(node, d_from_src, sigma_prod, sigma_st, share_e9) — exact
    pair-dependency betweenness for the fixed supplier pair (src, dst) on
    the sparsified supplier-part graph: a node v lies on a shortest
    src-dst path iff d_s(v) + d_t(v) = d(s,t), and its share of those
    paths is σ_s(v)·σ_t(v) / σ_st — the Brandes pair dependency, with
    path counts EXACT integers (no δ-recursion floats). Endpoints
    excluded, rows sorted by node.

    Two runs of the frontier-join BFS-σ core + one node hash join; the
    single share division is one identical-double from exact ints."""
    from .shuffle import bucketed_group_apply
    from .stats import _round_e9_vec

    edges = _sp_weighted_edges(sf_dir)
    sym = (_symmetrize(edges)
           .map_batches(lambda df: df[["u", "v"]], batch_format="pandas")
           .materialize())
    fs = bfs_sigma_ds(sym, src).to_pandas().rename(
        columns={"d": "ds", "sig": "sigs"})
    ft = bfs_sigma_ds(sym, dst).to_pandas().rename(
        columns={"d": "dt", "sig": "sigt"})
    j = fs.merge(ft, on="node", how="inner", sort=False)
    t_row = j[j["node"] == dst]
    if t_row.empty:
        return pd.DataFrame(columns=["node", "d_from_src", "sigma_prod",
                                     "sigma_st", "share_e9"]).astype(np.int64)
    D = int(t_row.iloc[0]["ds"])
    sigma_st = int(t_row.iloc[0]["sigs"])
    on = j[(j["ds"] + j["dt"] == D)
           & (j["node"] != src) & (j["node"] != dst)]
    # Python-int products: two guarded int64 factors can still overflow
    # their product; raise loudly like the oracle's HUGEINT->BIGINT cast
    prod_py = [int(a) * int(b)
               for a, b in zip(on["sigs"], on["sigt"])]
    if any(p >= 1 << 63 for p in prod_py):
        raise OverflowError("sigma product exceeds int64; truncate the "
                            "ranking or carry big-int sigma")
    prod = np.asarray(prod_py, dtype=np.int64)
    share = _round_e9_vec(prod.astype(np.float64) / float(sigma_st))
    out = pd.DataFrame({
        "node": on["node"].to_numpy(np.int64),
        "d_from_src": on["ds"].to_numpy(np.int64),
        "sigma_prod": prod,
        "sigma_st": np.full(len(on), sigma_st, dtype=np.int64),
        "share_e9": share})
    return out.sort_values("node").reset_index(drop=True)


def pair_betweenness_sql(src: int = _BTW_SRC, dst: int = _BTW_DST,
                         levels: int = _BFS_LEVELS) -> str:
    """Unrolled level-synchronous BFS-σ from each endpoint (seen-set
    accumulated across levels), then the pair-dependency join."""

    def chain(tag: str, start: str) -> str:
        parts = [f"{tag}l0 AS (SELECT {start} AS node, 0 AS d, "
                 f"CAST(1 AS HUGEINT) AS sig)",
                 f"{tag}s0 AS (SELECT node FROM {tag}l0)"]
        for t in range(1, levels + 1):
            parts.append(f"""
{tag}l{t} AS MATERIALIZED (
  SELECT e.v AS node, {t} AS d, SUM(p.sig) AS sig
  FROM {tag}l{t-1} p JOIN sym e ON e.u = p.node
  WHERE e.v NOT IN (SELECT node FROM {tag}s{t-1})
  GROUP BY e.v)""")
            parts.append(f"""
{tag}s{t} AS MATERIALIZED (SELECT node FROM {tag}s{t-1}
  UNION ALL SELECT node FROM {tag}l{t})""")
        alls = " UNION ALL ".join(f"SELECT * FROM {tag}l{t}"
                                  for t in range(levels + 1))
        parts.append(f"{tag}all AS ({alls})")
        return ",".join(parts)

    return f"""
WITH e0 AS (SELECT l_suppkey AS s, l_partkey + {_PART_OFFSET} AS p,
                   CAST(MIN(l_quantity) AS BIGINT) AS w
            FROM lineitem GROUP BY 1, 2
            HAVING CAST(MIN(l_quantity) AS BIGINT) <= {_W_MAX}),
sym AS (SELECT s AS u, p AS v FROM e0 UNION ALL SELECT p, s FROM e0),
{chain("fa", str(src))},
{chain("fb", str(dst))},
tt AS (SELECT d AS dd, sig AS sst FROM faall WHERE node = {dst})
SELECT CAST(a.node AS BIGINT) AS node, CAST(a.d AS BIGINT) AS d_from_src,
       CAST(a.sig * b.sig AS BIGINT) AS sigma_prod,
       CAST(tt.sst AS BIGINT) AS sigma_st,
       CAST(ROUND(CAST(a.sig * b.sig AS DOUBLE) / CAST(tt.sst AS DOUBLE)
                  * 1000000000) AS BIGINT) AS share_e9
FROM faall a JOIN fball b USING (node), tt
WHERE a.d + b.d = tt.dd AND a.node <> {src} AND a.node <> {dst}
"""


PAIR_BETWEENNESS_SQL = pair_betweenness_sql()


# ---------------------------------------------------------------------------
# Seed-set closeness centrality + hop histogram
# ---------------------------------------------------------------------------

_CLOSENESS_SEEDS = (1, 2, 3)


def graph_closeness(sf_dir: str,
                    seeds: tuple = _CLOSENESS_SEEDS) -> pd.DataFrame:
    """(seed, n_reached, sum_dist, closeness_e9) — exact closeness
    centrality of a fixed seed set on the weight-sparsified supplier-part
    graph: closeness = (n_reached − 1) / Σ dist over the reached component
    (the standard disconnected-graph convention). One frontier-join SSSP
    run per seed; the division is integer floor at e9 — no floats at all.
    """
    edges = _sp_weighted_edges(sf_dir)
    sym = _symmetrize(edges).materialize()
    rows = []
    for s in seeds:
        d = sssp_ds(sym, int(s)).to_pandas()
        n = len(d)
        sd = int(d["d"].sum())
        clo = (n - 1) * 1_000_000_000 // sd if sd else 0
        rows.append((int(s), n, sd, clo))
    return pd.DataFrame(rows, columns=["seed", "n_reached", "sum_dist",
                                       "closeness_e9"]).astype(np.int64)


def graph_closeness_sql(seeds: tuple = _CLOSENESS_SEEDS,
                        iters: int = 10) -> str:
    def chain(tag: str, src: int) -> str:
        steps = [f"{tag}0 AS (SELECT CAST({src} AS BIGINT) AS n, "
                 f"CAST(0 AS BIGINT) AS d)"]
        for t in range(1, iters + 1):
            steps.append(f"""
{tag}{t} AS MATERIALIZED (SELECT n, MIN(d) AS d FROM (
           SELECT n, d FROM {tag}{t-1}
           UNION ALL
           SELECT sym.v AS n, {tag}{t-1}.d + sym.w AS d
           FROM sym JOIN {tag}{t-1} ON sym.u = {tag}{t-1}.n)
         GROUP BY n)""")
        return ",".join(steps)

    chains = ",".join(chain(f"c{i}", int(s)) for i, s in enumerate(seeds))
    sels = " UNION ALL ".join(f"""
SELECT CAST({int(s)} AS BIGINT) AS seed,
       CAST(COUNT(*) AS BIGINT) AS n_reached,
       CAST(SUM(d) AS BIGINT) AS sum_dist,
       CAST(CASE WHEN SUM(d) > 0
                 THEN (COUNT(*) - 1) * 1000000000 // SUM(d)
                 ELSE 0 END AS BIGINT) AS closeness_e9
FROM c{i}{iters}""" for i, s in enumerate(seeds))
    return f"""
WITH e0 AS (SELECT l_suppkey AS s, l_partkey + {_PART_OFFSET} AS p,
                   CAST(MIN(l_quantity) AS BIGINT) AS w
            FROM lineitem GROUP BY 1, 2
            HAVING CAST(MIN(l_quantity) AS BIGINT) <= {_W_MAX}),
sym AS (SELECT s AS u, p AS v, w FROM e0 UNION ALL SELECT p, s, w FROM e0),
{chains}
{sels}
"""


GRAPH_CLOSENESS_SQL = graph_closeness_sql()


def graph_hop_histogram(sf_dir: str, src: int = _BTW_SRC) -> pd.DataFrame:
    """(d, n_nodes, sum_sigma) — BFS hop histogram from a fixed source:
    how many nodes sit at each unweighted hop distance and how many
    shortest paths reach that shell (Σσ). The expansion profile that sizes
    frontier rounds for every BFS-shaped op (SSSP, sampling, diameter).

    One run of the frontier-join BFS-σ core; the histogram fold is
    hop-domain-bounded (graph diameter)."""
    edges = _sp_weighted_edges(sf_dir)
    sym = (_symmetrize(edges)
           .map_batches(lambda df: df[["u", "v"]], batch_format="pandas")
           .materialize())
    st = bfs_sigma_ds(sym, src).to_pandas()
    g = st.groupby("d", as_index=False).agg(
        n_nodes=("node", "size"), sum_sigma=("sig", "sum"))
    return (g.astype(np.int64).sort_values("d").reset_index(drop=True))


def graph_hop_histogram_sql(src: int = _BTW_SRC,
                            levels: int = _BFS_LEVELS) -> str:
    parts = [f"l0 AS (SELECT CAST({src} AS BIGINT) AS node, 0 AS d, "
             f"CAST(1 AS HUGEINT) AS sig)",
             "s0 AS (SELECT node FROM l0)"]
    for t in range(1, levels + 1):
        parts.append(f"""
l{t} AS MATERIALIZED (
  SELECT e.v AS node, {t} AS d, SUM(p.sig) AS sig
  FROM l{t-1} p JOIN sym e ON e.u = p.node
  WHERE e.v NOT IN (SELECT node FROM s{t-1})
  GROUP BY e.v)""")
        parts.append(f"""
s{t} AS MATERIALIZED (SELECT node FROM s{t-1}
  UNION ALL SELECT node FROM l{t})""")
    alls = " UNION ALL ".join(f"SELECT * FROM l{t}" for t in range(levels + 1))
    return f"""
WITH e0 AS (SELECT l_suppkey AS s, l_partkey + {_PART_OFFSET} AS p,
                   CAST(MIN(l_quantity) AS BIGINT) AS w
            FROM lineitem GROUP BY 1, 2
            HAVING CAST(MIN(l_quantity) AS BIGINT) <= {_W_MAX}),
sym AS (SELECT s AS u, p AS v FROM e0 UNION ALL SELECT p, s FROM e0),
{",".join(parts)},
f AS ({alls})
SELECT CAST(d AS BIGINT) AS d, CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(SUM(sig) AS BIGINT) AS sum_sigma
FROM f GROUP BY d
"""


GRAPH_HOP_HISTOGRAM_SQL = graph_hop_histogram_sql()


# ---------------------------------------------------------------------------
# Rich-club coefficient
# ---------------------------------------------------------------------------

_RICH_KS = (2, 4, 8, 16)


def rich_club(sf_dir: str, ks: tuple = _RICH_KS) -> pd.DataFrame:
    """(k, n_rich, e_rich, phi_bp) — rich-club coefficient of the
    sparsified supplier-part graph: for each degree threshold k, the share
    of possible edges actually present among nodes of degree > k
    (phi = 2·E_rich / (n·(n−1))). A rising phi(k) says hubs preferentially
    interconnect — the structural signal behind hub-removal fragility
    (graph_robustness's analytical twin).

    Degrees ride one key-only exchange (node-catalog-bounded); each
    threshold's rich set is a bounded broadcast filter over the edge
    stream; per-threshold edge counts are streamed scalars. Exact
    integers throughout."""
    from .shuffle import hash_exchange_apply

    edges = _sp_weighted_edges(sf_dir).materialize()
    sym = _symmetrize(edges).materialize()

    def deg_part(t: pa.Table) -> pa.Table:
        return (pa.table({"node": t["u"].cast(pa.int64())})
                .group_by("node").aggregate([([], "count_all")])
                .rename_columns(["node", "deg"]))

    def deg_fin(t: pa.Table) -> pa.Table:
        return (t.group_by("node").aggregate([("deg", "sum")])
                .rename_columns(["node", "deg"]))

    deg = hash_exchange_apply(sym, ["node"], deg_part, deg_fin).to_pandas()
    rows = []
    for k in ks:
        rich = np.sort(deg.loc[deg["deg"] > k, "node"].to_numpy(np.int64))
        r_ref = ray.put(rich)

        def count_rich(df: pd.DataFrame) -> pd.DataFrame:
            rs = ray.get(r_ref)
            m = (df["u"].isin(rs) & df["v"].isin(rs)
                 & (df["u"] < df["v"]))
            return pd.DataFrame({"e": [int(m.sum())]})

        e_rich = int(sym.map_batches(count_rich, batch_format="pandas")
                     .to_pandas()["e"].sum())
        n = len(rich)
        denom = n * (n - 1)  # 2 * C(n,2)
        phi_bp = 2 * e_rich * 10000 // denom if denom else -1
        rows.append((int(k), n, e_rich, phi_bp))
    return pd.DataFrame(rows, columns=["k", "n_rich", "e_rich", "phi_bp"]
                        ).astype(np.int64)


def rich_club_sql(ks: tuple = _RICH_KS) -> str:
    sels = " UNION ALL ".join(f"""
SELECT CAST({k} AS BIGINT) AS k,
       CAST((SELECT COUNT(*) FROM deg WHERE deg > {k}) AS BIGINT) AS n_rich,
       CAST((SELECT COUNT(*) FROM e0 e
             WHERE e.s IN (SELECT node FROM deg WHERE deg > {k})
               AND e.p IN (SELECT node FROM deg WHERE deg > {k}))
            AS BIGINT) AS e_rich,
       CAST(CASE WHEN (SELECT COUNT(*) FROM deg WHERE deg > {k}) >= 2
            THEN 2 * (SELECT COUNT(*) FROM e0 e
                      WHERE e.s IN (SELECT node FROM deg WHERE deg > {k})
                        AND e.p IN (SELECT node FROM deg WHERE deg > {k}))
                 * 10000
                 // ((SELECT COUNT(*) FROM deg WHERE deg > {k})
                     * ((SELECT COUNT(*) FROM deg WHERE deg > {k}) - 1))
            ELSE -1 END AS BIGINT) AS phi_bp""" for k in ks)
    return f"""
WITH e0 AS (SELECT l_suppkey AS s, l_partkey + {_PART_OFFSET} AS p,
                   CAST(MIN(l_quantity) AS BIGINT) AS w
            FROM lineitem GROUP BY 1, 2
            HAVING CAST(MIN(l_quantity) AS BIGINT) <= {_W_MAX}),
sym AS (SELECT s AS u, p AS v FROM e0 UNION ALL SELECT p, s FROM e0),
deg AS (SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM sym
        GROUP BY 1)
{sels}
"""


RICH_CLUB_SQL = rich_club_sql()
