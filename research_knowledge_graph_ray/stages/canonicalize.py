"""Entity linking + canonicalization + node/edge materialization.

Replaces the reference's sequential DB lookup-or-create dedup
(reference: src/services/ingestion_service.py:105-129,
src/db/repository.py:115-130) with pure data-parallel operations:

1. content-hash node ids make same-key entities collide by construction;
2. an *alias + embedding* linking stage emits coreference edges between
   entities that exact keys miss ("3DGS" vs "3D Gaussian Splatting"):
   exact alias-table hits plus pairs sharing an LSH band with label-embedding
   cosine ≥ τ — a deterministic near-dup semantic both the engine and the
   sequential oracle compute independently;
3. connected-component union-find merges coreferent ids (canonical = min id);
   driver-side union-find when the alias graph is provably small (≪ corpus),
   distributed min-label propagation otherwise;
4. nodes/edges materialize via groupby-aggregate with per-batch partial
   aggregation before the shuffle (exact triple dedup mirrors the reference's
   ``UNIQUE(from,to,type)`` constraint, sql/schema.sql:36).

Order-independence: the reference's first-writer-wins (ingestion order) is
replaced by deterministic min-tiebreaks (min doc_id provenance, lexicographic
min display label) — the emitted *triple set* is identical because triples
depend only on content-hash ids (SURVEY.md §7.5).
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions.ids import node_id as make_node_id
from ..functions.normalize import label_key, normalize_label
from ..schemas import EDGES_SCHEMA, NODES_SCHEMA
from .embed import DEFAULT_DIM, embed_texts, lsh_band_keys, lsh_planes
from .shuffle import arrow_group_agg, hash_exchange_apply

# Default alias table (surface form key -> canonical form key, per type).
# In production this is a curated KB table broadcast to every worker.
DEFAULT_COSINE_TAU = 0.92
CC_DRIVER_LIMIT = 1_000_000  # alias graphs above this use distributed propagation


def build_alias_key_map(aliases: dict[str, str], entity_type: str = "method") -> dict:
    """{(type, alias_label_key): (type, canon_label_key)} from a surface-alias map."""
    out = {}
    for alias, canon in aliases.items():
        out[(entity_type, label_key(normalize_label(alias)))] = (
            entity_type,
            label_key(normalize_label(canon)),
        )
    return out


# ---------------------------------------------------------------------------
# Coreference edge generation (deterministic semantic, shared with the oracle)
# ---------------------------------------------------------------------------


def alias_exact_edges(
    entities: Iterable[tuple[str, str, str]], alias_key_map: dict
) -> list[tuple[str, str]]:
    """Exact alias-table hits: (node_id, node_id_of_canonical_key) pairs.

    ``entities`` yields (node_id, node_type, normalized_label).
    """
    edges = []
    for nid, ntype, label in entities:
        tgt = alias_key_map.get((ntype, label_key(label)))
        if tgt is not None:
            edges.append((nid, make_node_id(tgt[0], tgt[1])))
    return edges


def lsh_cosine_pairs_semantics(
    ids: list[str],
    types: list[str],
    labels: list[str],
    tau: float = DEFAULT_COSINE_TAU,
    dim: int = DEFAULT_DIM,
) -> set[tuple[str, str]]:
    """The near-dup-label semantic: same type, shared LSH band, cosine ≥ τ.

    Pure/sequential — used by the oracle AND as the per-bucket kernel of the
    distributed path (both produce exactly this set).
    """
    planes = lsh_planes(dim)
    vecs = embed_texts([f"{t}:{l.lower()}" for t, l in zip(types, labels)], dim)
    bands = lsh_band_keys(vecs, planes)
    buckets: dict[tuple, list[int]] = {}
    for i, (t, ks) in enumerate(zip(types, bands)):
        for k in ks:
            buckets.setdefault((t, k), []).append(i)
    pairs: set[tuple[str, str]] = set()
    for members in buckets.values():
        if len(members) < 2:
            continue
        vs = vecs[members]
        sims = vs @ vs.T
        for a in range(len(members)):
            for b in range(a + 1, len(members)):
                ia, ib = members[a], members[b]
                if ids[ia] == ids[ib]:
                    continue
                if sims[a, b] >= tau:
                    x, y = sorted((ids[ia], ids[ib]))
                    pairs.add((x, y))
    return pairs


def _explode_endpoints(
    t: pa.Table, with_doc: bool = False, with_attrs: bool = False
) -> pa.Table:
    names = ["node_id", "node_type", "label"] + (["doc_id"] if with_doc else [])
    subj_cols = [t["subj_id"], t["subj_type"], t["subj_norm"]]
    obj_cols = [t["obj_id"], t["obj_type"], t["obj_norm"]]
    if with_doc:
        subj_cols.append(t["doc_id"])
        obj_cols.append(t["doc_id"])
    if with_attrs:
        # props describe the OBJECT entity of mention/meta records; the
        # subject side carries the empty sentinel
        names += ["props"]
        n = t.num_rows
        subj_cols += [pa.array(["{}"] * n, type=pa.string())]
        obj_cols += [t["obj_props"]]
    return pa.concat_tables(
        [pa.table(dict(zip(names, subj_cols))), pa.table(dict(zip(names, obj_cols)))]
    )


def distinct_entities_ds(validated: "ray.data.Dataset") -> "ray.data.Dataset":
    """Distinct (node_id, node_type, label) over both endpoints of all records.

    Paper nodes are excluded: linking operates on *extracted entity* labels
    only (doc-id labels are near-identical strings and must never merge)."""

    def agg(t: pa.Table) -> pa.Table:
        if "subj_id" in t.column_names:  # first (partial) pass sees validated rows
            t = _explode_endpoints(t)
            t = t.filter(pc.invert(pc.equal(t["node_type"], "paper")))
        return arrow_group_agg(t, ["node_id"], [("node_type", "min"), ("label", "min")])

    return hash_exchange_apply(validated, ["node_id"], agg, agg)


class LshBucketEmitter:
    """map_batches stage: entity rows → (bucket, node_id, node_type, label) rows."""

    def __init__(self, dim: int = DEFAULT_DIM):
        self.dim = dim
        self.planes = lsh_planes(dim)

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        ids = batch["node_id"].to_pylist()
        types = batch["node_type"].to_pylist()
        labels = batch["label"].to_pylist()
        vecs = embed_texts([f"{t}:{l.lower()}" for t, l in zip(types, labels)], self.dim)
        bands = lsh_band_keys(vecs, self.planes)
        rows = {"bucket": [], "node_id": [], "node_type": [], "label": []}
        for i, ks in enumerate(bands):
            for k in ks:
                rows["bucket"].append(f"{types[i]}|{k}")
                rows["node_id"].append(ids[i])
                rows["node_type"].append(types[i])
                rows["label"].append(labels[i])
        return pd.DataFrame(rows)


_LSH_EMITTER_CACHE: dict = {}


def coref_edges_ds(
    entities: "ray.data.Dataset",
    alias_key_map: dict,
    tau: float = DEFAULT_COSINE_TAU,
    dim: int = DEFAULT_DIM,
) -> "ray.data.Dataset":
    """Distributed coreference-edge generation.

    Alias-table hits are a broadcast lookup inside map_batches (no shuffle);
    LSH pairs shuffle only the small distinct-entity table by bucket.
    """
    alias_ref = ray.put(alias_key_map)

    def alias_stage(batch: pa.Table) -> pd.DataFrame:
        amap = ray.get(alias_ref)
        rows = alias_exact_edges(
            zip(batch["node_id"].to_pylist(), batch["node_type"].to_pylist(),
                batch["label"].to_pylist()),
            amap,
        )
        return pd.DataFrame({"a": [r[0] for r in rows], "b": [r[1] for r in rows]})

    alias_edges = entities.map_batches(alias_stage, batch_format="pyarrow")

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        sub = group.drop_duplicates(subset=["node_id"])
        pairs = lsh_cosine_pairs_semantics(
            sub["node_id"].tolist(), sub["node_type"].tolist(), sub["label"].tolist(),
            tau=tau, dim=dim,
        )
        return pd.DataFrame({"a": [p[0] for p in pairs], "b": [p[1] for p in pairs]})

    # trivial-state stage (plane matrix only) → stateless task with a
    # per-worker-process cache, like the other deterministic stages; a fixed
    # actor-pool size would throttle a pure-CPU stage on big machines
    def emit_buckets(batch: pa.Table) -> pd.DataFrame:
        if dim not in _LSH_EMITTER_CACHE:
            _LSH_EMITTER_CACHE[dim] = LshBucketEmitter(dim)
        return _LSH_EMITTER_CACHE[dim](batch)

    lsh_edges = (
        entities.map_batches(emit_buckets, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    return alias_edges.union(lsh_edges)


# ---------------------------------------------------------------------------
# Connected components (union-find)
# ---------------------------------------------------------------------------


def connected_components_driver(edges: Iterable[tuple[str, str]]) -> dict[str, str]:
    """Union-find over the (small) alias graph; canonical = min id in component.

    Returns only non-identity mappings. Valid because the coreference graph is
    vocabulary-bound (≪ corpus size) — documented partitioning assumption.
    """
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in list(parent) if find(x) != x}


def driver_component_summary(pairs, a_col: str = "a",
                             b_col: str = "b") -> tuple[int, int, int]:
    """(n_nodes, n_components, largest) — union-find closure of a
    DRIVER-SIZED pair DataFrame (the adaptive small-side path shared by
    dedup_ensemble / graph_robustness; callers must have checked their
    edge-count cap first — the distributed min-label CC is the past-cap
    twin)."""
    from collections import Counter

    if a_col not in pairs.columns:  # schema-less all-empty pair frame
        return 0, 0, -1

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(pairs[a_col].astype(int), pairs[b_col].astype(int)):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    nodes = set(pairs[a_col].astype(int)) | set(pairs[b_col].astype(int))
    sizes = Counter(find(x) for x in nodes)
    largest = max(sizes.values()) if sizes else -1
    return len(nodes), len(sizes), largest


def connected_components_ds(
    edges_ds: "ray.data.Dataset", max_iters: int = 16
) -> "ray.data.Dataset":
    """Fully distributed connected components: ``(node, label)`` Dataset with
    ``label = min node id of the component`` — the 100 TB-scale path.

    Neither the edge set nor the label table ever lands on the driver: each
    min-label-propagation round is two hash-partitioned exchanges —
    (1) labels join onto the symmetrized edges keyed on the label-owner
    endpoint, emitting ``(x, label(y))`` candidates; (2) groupby-min on x
    merges candidates with current labels. Convergence is detected by a
    driver-side *scalar* checksum aggregate (sum of row hashes), never by
    materializing labels. Works for string or integer node ids.

    Partitioning assumption: converges in O(component diameter) rounds —
    upstream edge generation should emit *star* topologies per bucket
    (see :func:`~..stages.dedup.minhash_dedup_clusters`), keeping diameters
    at O(#overlapping buckets), not O(cluster size).
    """
    from .shuffle import bucketed_group_apply

    def symmetrize(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"x": pd.concat([df["a"], df["b"]], ignore_index=True),
             "y": pd.concat([df["b"], df["a"]], ignore_index=True)}
        ).drop_duplicates()

    sym = edges_ds.map_batches(symmetrize, batch_format="pandas").materialize()

    # initial labels: label(x) = min(x, min neighbor) in one exchange
    def min_nb(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("x", as_index=False).agg(y=("y", "min"))

    labels = bucketed_group_apply(sym, ["x"], min_nb, min_nb).map_batches(
        lambda df: pd.DataFrame({"node": df["x"], "label": df[["x", "y"]].min(axis=1)}),
        batch_format="pandas",
    ).materialize()

    def checksum(ds: "ray.data.Dataset") -> int:
        import zlib

        def hash_rows(df: pd.DataFrame) -> pd.DataFrame:
            s = (df["node"].astype(str) + ":" + df["label"].astype(str)).map(
                lambda v: zlib.crc32(v.encode())
            )
            return pd.DataFrame({"h": [np.int64(s.sum() & 0x7FFFFFFFFFFF)]})

        return int(ds.map_batches(hash_rows, batch_format="pandas").sum("h") or 0)

    prev_sum = checksum(labels)
    for _ in range(max_iters):
        # one exchange keyed on the label OWNER: edge rows (k=y, x=x) meet
        # label rows (k=node, label); each bucket joins locally and emits
        # (x, label(y)) candidates. Side is tagged explicitly; the unused
        # column is filled with k-valued dummies so dtypes stay native
        # (a NaN marker would coerce int64 node ids to float64).
        edge_rows = sym.map_batches(
            lambda df: pd.DataFrame(
                {"k": df["y"], "x": df["x"], "label": df["y"], "__side": "e"}),
            batch_format="pandas",
        )
        label_rows = labels.map_batches(
            lambda df: pd.DataFrame(
                {"k": df["node"], "x": df["node"], "label": df["label"],
                 "__side": "l"}),
            batch_format="pandas",
        )

        def premerge(df: pd.DataFrame) -> pd.DataFrame:
            labs = df[df["__side"] == "l"].groupby("k", as_index=False).agg(
                x=("x", "min"), label=("label", "min"))
            labs["__side"] = "l"
            edges = df[df["__side"] == "e"].drop_duplicates(["k", "x"])
            return pd.concat([labs, edges], ignore_index=True)

        def propagate(df: pd.DataFrame) -> pd.DataFrame:
            labs = df[df["__side"] == "l"].groupby("k", as_index=False).agg(
                label=("label", "min"))
            edges = df[df["__side"] == "e"][["k", "x"]]
            m = edges.merge(labs, on="k")[["x", "label"]]
            own = labs.rename(columns={"k": "x"})
            out = pd.concat([m, own], ignore_index=True)
            return out.groupby("x", as_index=False).agg(label=("label", "min"))

        cand = bucketed_group_apply(
            edge_rows.union(label_rows), ["k"], premerge, propagate
        ).map_batches(
            lambda df: df.rename(columns={"x": "node"}), batch_format="pandas"
        )

        def combine(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby("node", as_index=False).agg(label=("label", "min"))

        labels = bucketed_group_apply(
            cand.union(labels), ["node"], combine, combine
        ).materialize()

        cur_sum = checksum(labels)
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


def connected_components_distributed(
    edges_ds: "ray.data.Dataset", max_iters: int = 8
) -> dict[str, str]:
    """Min-label propagation over an edge Dataset (scale path for the
    *vocabulary-bound* coreference mapping).

    Runs :func:`connected_components_ds` (no driver edge set) and collects only
    the non-identity rows — the mapping is small even when the edge list
    required distribution — then path-compresses with driver union-find."""
    labels = connected_components_ds(edges_ds, max_iters=max_iters)
    pdf = labels.map_batches(
        lambda df: df[df["node"] != df["label"]], batch_format="pandas"
    ).to_pandas()
    return connected_components_driver(zip(pdf["node"], pdf["label"]))


def compute_canonical_mapping_from_validated(
    validated: "ray.data.Dataset",
    alias_key_map: dict,
    tau: float = DEFAULT_COSINE_TAU,
    dim: int = DEFAULT_DIM,
    small_entity_limit: int = 200_000,
) -> dict[str, str]:
    """Entity linking in ONE dataset execution for the common case.

    Per-block distinct entities are tiny (vocabulary-bound — the documented
    partitioning assumption), so they are pulled to the driver and the alias +
    LSH + union-find chain runs locally with the exact same pure semantic
    functions the distributed path uses. Past ``small_entity_limit`` distinct
    rows the full distributed path (exchange + bucketed LSH + label
    propagation) takes over."""

    def partial(t: pa.Table) -> pa.Table:
        t = _explode_endpoints(t)
        t = t.filter(pc.invert(pc.equal(t["node_type"], "paper")))
        return arrow_group_agg(t, ["node_id"], [("node_type", "min"), ("label", "min")])

    partial_ds = validated.map_batches(
        partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    try:
        pdf = partial_ds.to_pandas(limit=small_entity_limit)
    except ValueError:
        return compute_canonical_mapping(distinct_entities_ds(validated), alias_key_map,
                                         tau=tau, dim=dim)
    if len(pdf) == 0:
        return {}
    ents = pdf.groupby("node_id", as_index=False).agg(
        node_type=("node_type", "min"), label=("label", "min")
    )
    edges = alias_exact_edges(
        zip(ents["node_id"], ents["node_type"], ents["label"]), alias_key_map
    )
    edges += list(
        lsh_cosine_pairs_semantics(
            ents["node_id"].tolist(), ents["node_type"].tolist(),
            ents["label"].tolist(), tau=tau, dim=dim,
        )
    )
    return connected_components_driver(edges)


def compute_canonical_mapping(
    entities: "ray.data.Dataset",
    alias_key_map: dict,
    tau: float = DEFAULT_COSINE_TAU,
    dim: int = DEFAULT_DIM,
    driver_limit: int = CC_DRIVER_LIMIT,
) -> dict[str, str]:
    """Coreference edges → union-find → {node_id: canonical_node_id}.

    The distinct-entity table is materialized once (it feeds both the alias
    and the LSH stage) and the edge list is pulled with ``to_pandas(limit)``
    in a single execution — the coreference graph is vocabulary-bound, so the
    driver union-find path is the norm; the distributed label-propagation
    path engages only past ``driver_limit`` edges."""
    entities = entities.materialize()
    edges = coref_edges_ds(entities, alias_key_map, tau=tau, dim=dim).materialize()
    try:
        pdf = edges.to_pandas(limit=driver_limit)
    except ValueError:
        return connected_components_distributed(edges)
    return connected_components_driver(zip(pdf["a"], pdf["b"]))


def make_remap_fn(mapping: dict[str, str]):
    """Broadcast-lookup remap of subj_id/obj_id as a plain ``pa.Table →
    pa.Table`` callable (None for an empty mapping).

    Handed to the downstream consumers (:func:`build_nodes`,
    :func:`build_edges`, linking) as their ``pre`` hook so the remap FUSES
    into each consumer's first exchange partial — the record stream stays the
    single materialized intermediate and no per-consumer map execution (or
    second object-store copy) is spent on the rewrite."""
    if not mapping:
        return None
    olds = pa.array(list(mapping.keys()), type=pa.string())
    news = pa.array(list(mapping.values()), type=pa.string())
    ref = ray.put((olds, news))

    def remap(batch: pa.Table) -> pa.Table:
        o, n = ray.get(ref)

        def map_col(col):
            # vectorized dictionary substitution: index_in → take → coalesce
            idx = pc.index_in(col, value_set=o)
            return pc.coalesce(pc.take(n, idx), col)

        batch = batch.set_column(
            batch.schema.get_field_index("subj_id"), "subj_id", map_col(batch["subj_id"]))
        batch = batch.set_column(
            batch.schema.get_field_index("obj_id"), "obj_id", map_col(batch["obj_id"]))
        return batch

    return remap


def apply_canonical_mapping(
    validated: "ray.data.Dataset", mapping: dict[str, str]
) -> "ray.data.Dataset":
    """Rewrite subj_id/obj_id through the canonical mapping (broadcast lookup)."""
    remap = make_remap_fn(mapping)
    if remap is None:
        return validated
    return validated.map_batches(remap, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Node / edge materialization (groupby-aggregate with per-batch partials)
# ---------------------------------------------------------------------------

# provenance packing: "{doc_id rjust _PAD}\x1f{rationale}\x1f{evidence}" —
# lexicographic min() of the packed string selects the min-doc_id record
# (argmin trick → fully vectorized aggregate instead of per-group Python)
_PAD = 24
_SEP = "\x1f"


N_DOC_SALTS = 16


def _pack_attr(doc_id: pa.ChunkedArray | pa.Array, value, empty: str):
    """``"{doc_id rjust _PAD}\\x1f{value}"`` — null when value == empty.

    Lexicographic min of the packed string selects the value from the minimal
    doc_id that carries one: the deterministic restatement of the reference's
    cross-paper first-writer-wins node create
    (src/services/ingestion_service.py:105-129)."""
    packed = pc.binary_join_element_wise(
        pc.utf8_lpad(doc_id, _PAD, padding=" "), value, _SEP
    )
    return pc.if_else(pc.equal(value, empty), pa.scalar(None, type=pa.string()), packed)


def _unpack_attr(col, empty: str):
    parts = pc.split_pattern(col, _SEP, max_splits=1)
    return pc.fill_null(pc.list_element(parts, 1), empty)


def describe_node(props: str) -> str:
    """Node description derived from the merged properties JSON — costs no
    extra string column in the record stream. Papers: the title; extracted
    entities: the first surviving surface form (validation_agent.py:79-86)."""
    if props == "{}":
        return ""
    import json

    d = json.loads(props)
    if "title" in d:
        return d["title"] or ""
    if "surface" in d:
        return f"{d.get('etype', '')} mentioned as '{d['surface']}'"
    return ""


def build_nodes(validated: "ray.data.Dataset", pre=None) -> "ray.data.Dataset":
    """NODES_SCHEMA table: per canonical node — type, min display label,
    min-doc description/properties, n_docs. ``pre`` (optional) is a
    table→table hook fused ahead of the first partial — the canonical remap
    rides the exchange's map tasks instead of its own map stage.

    Salted two-phase aggregation (explicit hot-key handling): a domain-hot
    entity is mentioned by a large fraction of all docs, and its distinct
    (node_id, doc_id) rows cannot be combined below one-row-per-doc — a
    single-key exchange would funnel them all into one reduce bucket.
    Phase 1 exchanges on (node_id, salt=hash(doc_id)%S): the doc space is
    partitioned by the salt, so per-salt distinct-doc counts are disjoint and
    sum exactly. Phase 2 exchanges the ~|nodes|×S partials on node_id alone.

    Description/properties merge (reference M7/A2 semantics,
    src/agents/validation_agent.py:73-91 within-doc + first-writer-wins
    cross-doc): the min-(doc_id, value) packed record wins — carried through
    both phases as nullable packed strings so null (absent) never beats a
    real value. Paper-node attrs arrive as ``__PAPER_META__`` records fused
    into the extraction pass (stages/extract.py::meta_record) and flow
    through the SAME exchange — no corpus-sized broadcast, no second scan.
    """

    def partial1(t: pa.Table) -> pa.Table:
        from .shuffle import _col_hash

        if pre is not None:
            t = pre(t)
        ex = _explode_endpoints(t, with_doc=True, with_attrs=True)
        salt_np = (_col_hash(ex["doc_id"]) % np.uint64(N_DOC_SALTS)).astype(np.int64)
        ex = ex.append_column("salt", pa.array(salt_np, type=pa.int64()))
        ex = ex.append_column("ppack", _pack_attr(ex["doc_id"], ex["props"], "{}"))
        return arrow_group_agg(
            ex, ["node_id", "doc_id", "salt"],
            [("node_type", "min"), ("label", "min"), ("ppack", "min")],
        )

    def final1(t: pa.Table) -> pa.Table:
        per_doc = arrow_group_agg(
            t, ["node_id", "doc_id", "salt"],
            [("node_type", "min"), ("label", "min"), ("ppack", "min")],
        )
        agg = arrow_group_agg(
            per_doc, ["node_id", "salt"],
            [("node_type", "min"), ("label", "min"),
             ("ppack", "min"), ("doc_id", "count")],
        )
        return agg.rename_columns(
            ["node_id", "salt", "node_type", "label", "ppack", "n_docs"])

    per_salt = hash_exchange_apply(validated, ["node_id", "salt"], partial1, final1)

    def combine(t: pa.Table) -> pa.Table:
        agg = arrow_group_agg(
            t, ["node_id"],
            [("node_type", "min"), ("label", "min"),
             ("ppack", "min"), ("n_docs", "sum")],
        )
        return agg.rename_columns(
            ["node_id", "node_type", "label", "ppack", "n_docs"])

    agg = hash_exchange_apply(per_salt, ["node_id"], combine, combine)

    def finalize(batch: pa.Table) -> pa.Table:
        def col(name):
            c = batch[name].cast(pa.string())
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
        def arr(a):
            return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
        props = arr(_unpack_attr(batch["ppack"], "{}"))
        desc = pa.array([describe_node(p) for p in props.to_pylist()],
                        type=pa.string())
        return pa.Table.from_arrays(
            [
                col("node_id"), col("node_type"), col("label"),
                desc, props,
                (batch["n_docs"].cast(pa.int64()).combine_chunks()
                 if isinstance(batch["n_docs"], pa.ChunkedArray)
                 else batch["n_docs"].cast(pa.int64())),
            ],
            schema=NODES_SCHEMA,
        )

    return agg.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


def build_edges(validated: "ray.data.Dataset", pre=None) -> "ray.data.Dataset":
    """EDGES_SCHEMA table: exact triple dedup on (src, dst, type).

    Confidence = max over duplicates; provenance (doc_id, rationale, evidence)
    from the minimal doc_id — deterministic stand-in for the reference's
    first-insert-wins UNIQUE constraint (sql/schema.sql:36). ``pre``: optional
    table→table hook fused ahead of the partial pass (the canonical remap).
    """

    def agg(t: pa.Table) -> pa.Table:
        if "subj_id" in t.column_names:  # first (partial) pass sees validated rows
            if pre is not None:
                t = pre(t)
            # paper-attr records are node metadata, not edges
            t = t.filter(pc.not_equal(t["pred"], "__PAPER_META__"))
            packed = pc.binary_join_element_wise(
                pc.utf8_lpad(t["doc_id"], _PAD, padding=" "),
                t["rationale"], t["evidence_span"], _SEP,
            )
            t = pa.table(
                {
                    "src_id": t["subj_id"], "dst_id": t["obj_id"],
                    "edge_type": t["pred"], "confidence": t["confidence"],
                    "packed": packed,
                }
            )
        return arrow_group_agg(
            t, ["src_id", "dst_id", "edge_type"],
            [("confidence", "max"), ("packed", "min")],
        )

    # bucket on src_id alone: all duplicates of a triple share src_id, and the
    # shuffle key stays short
    deduped = hash_exchange_apply(validated, ["src_id"], agg, agg)

    def finalize(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(batch["packed"], _SEP, max_splits=2)
        flat = parts.combine_chunks() if isinstance(parts, pa.ChunkedArray) else parts
        doc_id = pc.utf8_ltrim_whitespace(pc.list_element(flat, 0))
        rationale = pc.list_element(flat, 1)
        evidence = pc.list_element(flat, 2)
        def col(name, typ):
            c = batch[name].cast(typ)
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
        def arr(a, typ):
            a = a.cast(typ)
            return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
        return pa.Table.from_arrays(
            [
                col("src_id", pa.string()), col("dst_id", pa.string()),
                col("edge_type", pa.string()), col("confidence", pa.float32()),
                arr(rationale, pa.string()), arr(evidence, pa.string()),
                arr(doc_id, pa.string()),
            ],
            schema=EDGES_SCHEMA,
        )

    return deduped.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)
