"""Sequential single-process oracle re-statement of the pipeline semantics.

This is the correctness yardstick for the distributed engine: a deliberately
naive, dict-and-loop implementation in the spirit of the reference's
one-paper-at-a-time flow (reference: src/main.py:124-134,
src/services/ingestion_service.py:31-174, src/services/graph_service.py:167-316).
It shares only the *semantic-defining* pure functions with the engine
(per-doc extraction rules, label normalization, id hashing, the LSH near-dup
definition) — all distributed orchestration (groupby merges, union-find,
blocking, pair dedup) is re-implemented sequentially and independently, so an
engine/oracle match validates the Ray plumbing.

Triple P/R vs this oracle is the gate (BASELINE.json: P/R ≥ 0.95; exact match
expected for the deterministic extractor).

Documented deviations from reference quirks (applied consistently in BOTH the
engine and this oracle, so the emitted triple set is unaffected):
- ``task`` entities are normalized like every other type. The reference's
  validation pass accidentally omits tasks (src/agents/validation_agent.py:47-54
  rebuilds the result without them), so raw task labels reach the DB and
  case-variants create distinct nodes there. Normalizing them is the
  order-free, strictly-more-deduplicated behavior (SURVEY.md §7.5 item 7).
- first-writer-wins merges (ingestion-order dependent) are replaced by
  deterministic min-tiebreaks; see stages/canonicalize.py.
"""

from __future__ import annotations

from collections import defaultdict

import pyarrow as pa

from ..functions.ids import node_id as make_node_id
from ..functions.ids import paper_node_id
from ..functions.normalize import label_key, normalize_label
from ..sources.corpus import ALIASES
from ..stages.canonicalize import (
    DEFAULT_COSINE_TAU,
    _PAD,
    _SEP,
    build_alias_key_map,
    lsh_cosine_pairs_semantics,
)
from ..stages.extract import compile_patterns, extract_doc_records
from ..stages.link import BLOCKING_TYPES, DEFAULT_MAX_DOCS_PER_ENTITY


def oracle_build_graph(
    docs_table: pa.Table,
    *,
    vocab: dict | None = None,
    aliases: dict | None = None,
    entity_linking: bool = True,
    link: bool = True,
    tau: float = DEFAULT_COSINE_TAU,
    max_docs_per_entity: int = DEFAULT_MAX_DOCS_PER_ENTITY,
):
    """Returns (nodes, edges): lists of dicts matching NODES/EDGES_SCHEMA columns."""
    mention_res, triple_res = compile_patterns(vocab)

    # --- extraction + validation, one doc at a time -----------------------
    validated = []  # dicts with doc_id, subj/obj type+raw+norm+id, pred, conf, rationale, evidence
    paper_meta: dict[str, dict] = {}  # doc_id -> metadata (paper-node attrs)
    for row in docs_table.to_pylist():
        from ..stages.metadata import doc_meta_from_spans

        spans = row["spans"]
        paper_meta[row["doc_id"]] = doc_meta_from_spans(
            row["doc_id"],
            [s["kind"] for s in spans], [s["text"] for s in spans],
            [s["media_ref"] for s in spans],
        )
        text = "\n".join(s["text"] for s in row["spans"])
        for (doc_id, st, sl, pred, ot, ol, conf, rat, ev, oprops) in extract_doc_records(
            row["doc_id"], text, mention_res, triple_res
        ):
            if st == "paper":
                s_norm = sl
                s_id = paper_node_id(doc_id)
            else:
                s_norm = normalize_label(sl)
                s_id = make_node_id(st, s_norm)
            o_norm = normalize_label(ol)
            o_id = make_node_id(ot, o_norm)
            if not pred.strip() or not s_norm.strip() or not o_norm.strip():
                continue
            conf = max(0.0, min(1.0, 0.5 if conf is None else float(conf)))
            validated.append(
                dict(doc_id=doc_id, subj_type=st, subj_norm=s_norm, subj_id=s_id,
                     pred=pred, obj_type=ot, obj_norm=o_norm, obj_id=o_id,
                     confidence=conf, rationale=rat, evidence_span=ev,
                     obj_props=oprops)
            )

    # --- entity linking: alias + LSH edges → BFS components ---------------
    mapping: dict[str, str] = {}
    if entity_linking:
        alias_key_map = build_alias_key_map(ALIASES if aliases is None else aliases)
        ents: dict[str, tuple[str, str]] = {}
        for r in validated:
            if r["subj_type"] != "paper":
                ents.setdefault(r["subj_id"], (r["subj_type"], r["subj_norm"]))
            if r["obj_type"] != "paper":
                ents.setdefault(r["obj_id"], (r["obj_type"], r["obj_norm"]))
        adj: dict[str, set[str]] = defaultdict(set)
        for nid, (ntype, label) in ents.items():
            tgt = alias_key_map.get((ntype, label_key(label)))
            if tgt is not None:
                canon = make_node_id(tgt[0], tgt[1])
                adj[nid].add(canon)
                adj[canon].add(nid)
        ids = list(ents)
        pairs = lsh_cosine_pairs_semantics(
            ids, [ents[i][0] for i in ids], [ents[i][1] for i in ids], tau=tau
        )
        for a, b in pairs:
            adj[a].add(b)
            adj[b].add(a)
        # BFS connected components; canonical = min id
        seen: set[str] = set()
        for start in sorted(adj):
            if start in seen:
                continue
            comp, frontier = {start}, [start]
            while frontier:
                x = frontier.pop()
                for y in adj[x]:
                    if y not in comp:
                        comp.add(y)
                        frontier.append(y)
            seen |= comp
            canon = min(comp)
            for x in comp:
                if x != canon:
                    mapping[x] = canon
        for r in validated:
            r["subj_id"] = mapping.get(r["subj_id"], r["subj_id"])
            r["obj_id"] = mapping.get(r["obj_id"], r["obj_id"])

    # --- nodes: per canonical id — min type, min label, n distinct docs,
    #     description/properties from the minimal (doc_id, value) record
    #     carrying one (cross-doc first-writer-wins, deterministically) ------
    import json as _json

    from ..stages.canonicalize import describe_node

    node_docs: dict[str, set] = defaultdict(set)
    node_label: dict[str, str] = {}
    node_type: dict[str, str] = {}
    node_ppack: dict[str, tuple] = {}
    for r in validated:
        for side in ("subj", "obj"):
            nid, ntype, lbl = r[f"{side}_id"], r[f"{side}_type"], r[f"{side}_norm"]
            node_docs[nid].add(r["doc_id"])
            if nid not in node_label or lbl < node_label[nid]:
                node_label[nid] = lbl
            if nid not in node_type or ntype < node_type[nid]:
                node_type[nid] = ntype
            props = r["obj_props"] if side == "obj" else "{}"
            if props != "{}":
                k = (r["doc_id"].rjust(_PAD), props)
                if nid not in node_ppack or k < node_ppack[nid]:
                    node_ppack[nid] = k
    # paper-node attrs from metadata (engine analogue: the fused
    # __PAPER_META__ record, which also counts the paper's own doc — every
    # ingested doc yields a paper node)
    for doc_id, meta in paper_meta.items():
        pid = paper_node_id(doc_id)
        node_docs.setdefault(pid, set()).add(doc_id)
        node_label.setdefault(pid, doc_id)
        node_type.setdefault(pid, "paper")
        props = _json.dumps(
            {"title": meta["title"], "abstract": meta["abstract"],
             "year": meta["year"], "venue": meta["venue"],
             "authors": list(meta["authors"])}
        )
        if props != "{}":
            k = (doc_id.rjust(_PAD), props)
            if pid not in node_ppack or k < node_ppack[pid]:
                node_ppack[pid] = k
    nodes = [
        dict(node_id=nid, node_type=node_type[nid], label=node_label[nid],
             description=describe_node(node_ppack.get(nid, ("", "{}"))[1]),
             properties=node_ppack.get(nid, ("", "{}"))[1],
             n_docs=len(node_docs[nid]))
        for nid in node_docs
    ]

    # --- intra-doc edges: exact dedup, max conf, min-doc provenance -------
    best: dict[tuple, tuple[float, str]] = {}
    for r in validated:
        k = (r["subj_id"], r["obj_id"], r["pred"])
        packed = f"{r['doc_id'].rjust(_PAD)}{_SEP}{r['rationale']}{_SEP}{r['evidence_span']}"
        conf, pk = best.get(k, (-1.0, None))
        best[k] = (max(conf, r["confidence"]), packed if pk is None or packed < pk else pk)
    edges = []
    for (src, dst, et), (conf, packed) in best.items():
        d, rat, ev = packed.split(_SEP, 2)
        edges.append(
            dict(src_id=src, dst_id=dst, edge_type=et, confidence=round(conf, 6),
                 rationale=rat, evidence_span=ev, doc_id=d.lstrip())
        )

    # --- cross-doc linking ------------------------------------------------
    if link:
        ent_docs: dict[str, set] = defaultdict(set)
        ent_info: dict[str, tuple[str, str]] = {}
        for r in validated:
            if r["pred"] == "INTRODUCES" and r["obj_type"] in BLOCKING_TYPES:
                ent_docs[r["obj_id"]].add(r["doc_id"])
                info = (r["obj_type"], r["obj_norm"])
                if r["obj_id"] not in ent_info or info[1] < ent_info[r["obj_id"]][1]:
                    ent_info[r["obj_id"]] = info
        pair_counts: dict[tuple, dict] = {}
        for eid, docs in ent_docs.items():
            capped = sorted(docs)[:max_docs_per_entity]
            etype, label = ent_info[eid]
            for i in range(len(capped)):
                for j in range(i + 1, len(capped)):
                    k = (capped[i], capped[j])
                    agg = pair_counts.setdefault(
                        k, {"method": 0, "dataset": 0, "concept": 0, "label": label}
                    )
                    agg[etype] += 1
                    if label < agg["label"]:
                        agg["label"] = label
        for (da, db), agg in pair_counts.items():
            nm, nd, nc = agg["method"], agg["dataset"], agg["concept"]
            # full cross-doc vocabulary; IMPROVES_ON/EXTENDS/REFINES_CONCEPT
            # inverted (reference: relationship_linking_agent.py:82-97,144-154)
            if nm >= 3:
                et, conf, src, dst = "IMPROVES_ON", 0.90, db, da
            elif nm == 2:
                et, conf, src, dst = "EXTENDS", 0.85, db, da
            elif nm >= 1 and nd >= 1:
                et, conf, src, dst = "COMPARES_TO", 0.80, da, db
            elif nc >= 2:
                et, conf, src, dst = "REFINES_CONCEPT", 0.78, db, da
            elif nm + nd + nc >= 2:
                et, conf, src, dst = "SIMILAR_TO", 0.75, da, db
            else:
                continue
            edges.append(
                dict(src_id=paper_node_id(src), dst_id=paper_node_id(dst), edge_type=et,
                     confidence=conf,
                     rationale=f"shared: methods={nm}, datasets={nd}, concepts={nc}",
                     evidence_span=agg["label"], doc_id=da)
            )

    return nodes, edges


def triple_prf(engine_edges, oracle_edges):
    """Precision/recall/F1 of the (src, dst, type) triple sets."""
    eng = {(e["src_id"], e["dst_id"], e["edge_type"]) for e in engine_edges}
    ora = {(e["src_id"], e["dst_id"], e["edge_type"]) for e in oracle_edges}
    tp = len(eng & ora)
    p = tp / len(eng) if eng else 1.0
    r = tp / len(ora) if ora else 1.0
    f = 2 * p * r / (p + r) if (p + r) else 0.0
    return p, r, f
