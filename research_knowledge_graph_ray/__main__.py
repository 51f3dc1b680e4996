"""CLI mirroring the reference's entry points (src/main.py: ingest/query/visualize).

Usage:
    python -m research_knowledge_graph_ray ingest <input> --out DIR [--no-link]
        [--no-entity-linking] [--embed] [--checkpoint DIR] [--json|--text|--synthetic N]
    python -m research_knowledge_graph_ray query <out_dir> <kind> [--doc DOC_ID] [--k K]
        kinds: nodes | edges | improvements | concepts | datasets | metrics |
               similar | subgraph | top-entities |
               ask --doc "<question>" --corpus <documents parquet>
    python -m research_knowledge_graph_ray visualize <out_dir> --html PATH [--limit N]

The CLI owns its Ray session (scripts only — library code never calls
ray.init, per the driver contract).
"""

from __future__ import annotations

import argparse
import os
import sys


def _init_ray():
    import ray

    if not ray.is_initialized():
        if os.environ.get("RAY_JOB_ID"):
            # launched via `ray job submit` — attach to the running cluster;
            # CPU/memory budgets belong to the cluster, never the CLI flags
            # (the production path the north rule names: the same commands
            # run unchanged under the job server on a multi-node cluster)
            ray.init(address="auto", ignore_reinit_error=True,
                     logging_level="ERROR")
        else:
            ray.init(address="local",
                     num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "0") or 0)
                     or None,
                     include_dashboard=False, ignore_reinit_error=True,
                     logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def cmd_ingest(args) -> int:
    _init_ray()
    import ray.data

    from .pipelines.construct import build_graph
    from .sources.adapter import read_flat_documents_as_spans
    from .sources.corpus import generate_documents
    from .sources.files import (
        read_csv_corpus,
        read_json_corpus,
        read_jsonl_corpus,
        read_text_corpus,
    )

    # resolve the input mode ONCE (explicit format flags always win;
    # extension auto-detection applies only when no flag was given) — the
    # same string keys the checkpoint fingerprint below, so the dispatch
    # and the invalidation can never drift apart
    if args.synthetic:
        in_mode = "synthetic"
    elif args.json:
        in_mode = "json"
    elif getattr(args, "jsonl", False):
        in_mode = "jsonl"
    elif getattr(args, "csv", False):
        in_mode = "csv"
    elif args.text:
        in_mode = "text"
    elif args.input.endswith((".jsonl", ".jsonl.gz")):
        in_mode = "jsonl"
    elif args.input.endswith(".csv"):
        in_mode = "csv"
    else:
        in_mode = "parquet"

    if getattr(args, "remove", ""):
        docs = None  # removal re-finishes from the checkpoint, no input read
    elif in_mode == "synthetic":
        docs = ray.data.from_arrow(generate_documents(
            args.synthetic, seed=42, start=getattr(args, "synthetic_start", 0)))
    elif in_mode == "json":
        docs = read_json_corpus(args.input)
    elif in_mode == "jsonl":
        docs = read_jsonl_corpus(args.input)
    elif in_mode == "csv":
        docs = read_csv_corpus(args.input)
    elif in_mode == "text":
        docs = read_text_corpus([args.input])
    elif os.path.isdir(args.input) or args.input.endswith(".parquet"):
        # parquet span table, or a flat documents table lifted via the adapter
        ds = ray.data.read_parquet(args.input)
        if "spans" in [f for f in ds.schema().names]:
            docs = ds
        else:
            docs = read_flat_documents_as_spans(os.path.dirname(args.input) or ".")
    else:
        print(f"unrecognized input: {args.input}", file=sys.stderr)
        return 2

    # checkpoint fingerprint identifies the INPUT: a re-run against the same
    # checkpoint dir with different input must invalidate, not silently skip.
    # Built from cheap input identity (mode, path/N, source mtime+size) — no
    # extra pass over the corpus just to count it.
    fingerprint = ""
    if args.checkpoint:
        mode = in_mode  # the single resolved mode — dispatch and
        # invalidation key can never disagree
        ident = str(args.synthetic) if args.synthetic else args.input
        stat = ""
        if args.input and os.path.exists(args.input):
            if os.path.isdir(args.input):
                sizes = sorted(
                    (fn, os.path.getsize(os.path.join(args.input, fn)))
                    for fn in os.listdir(args.input))
                stat = str(hash(tuple(sizes)))
            else:
                st = os.stat(args.input)
                stat = f"{st.st_size}:{int(st.st_mtime)}"
        fingerprint = f"{mode}:{ident}:{stat}"

    if getattr(args, "remove", ""):
        # exact removal from the extraction checkpoint: filter cached
        # records, re-finish the graph — byte-identical to a full rebuild of
        # the reduced corpus (pipelines/incremental.py::rebuild_without)
        if not args.checkpoint or not os.path.isdir(
                os.path.join(args.checkpoint, "validated")):
            print("--remove requires --checkpoint with a prior ingest's "
                  "validated records", file=sys.stderr)
            return 2
        from .pipelines.incremental import rebuild_without

        gone = [s for s in args.remove.split(",") if s]
        res = rebuild_without(
            args.checkpoint, gone,
            entity_linking=not args.no_entity_linking,
            link=not args.no_link)
    elif getattr(args, "append", False):
        # incremental update: docs are the INCREMENT; the existing graph in
        # --out is extended without reprocessing old documents (requires a
        # prior non-append ingest with --no-entity-linking; see
        # pipelines/incremental.py for the exactness preconditions)
        base_p = os.path.join(args.out, "base_edges")
        if not os.path.isdir(base_p):
            print(f"--append requires an existing graph with state at {args.out}",
                  file=sys.stderr)
            return 2
        from .pipelines.incremental import update_graph

        old_nodes = ray.data.read_parquet(os.path.join(args.out, "nodes"))
        old_base = ray.data.read_parquet(base_p)
        cross_p = os.path.join(args.out, "cross_edges")
        old_cross = (ray.data.read_parquet(cross_p)
                     if os.path.isdir(cross_p) else None)
        mapping_p = os.path.join(args.out, "mapping.json")
        frozen = None
        if os.path.exists(mapping_p):
            import json
            with open(mapping_p) as f:
                frozen = json.load(f)
        res = update_graph(old_nodes, old_base, old_cross, docs,
                           link=not args.no_link, frozen_mapping=frozen)
    else:
        res = build_graph(
            docs,
            link=not args.no_link,
            entity_linking=not args.no_entity_linking,
            embed_docs=args.embed,
            checkpoint_dir=args.checkpoint,
            checkpoint_fingerprint=fingerprint,
        )
    os.makedirs(args.out, exist_ok=True)
    import shutil

    def write_tmp(name, ds):
        tmp = os.path.join(args.out, f".tmp_{name}")
        shutil.rmtree(tmp, ignore_errors=True)
        ds.write_parquet(tmp)
        return tmp

    # stream every output into a tmp dir FIRST, then swap: append mode reads
    # the old graph lazily from these same directories, and write_parquet
    # into an existing dir would otherwise accumulate stale files.
    # base/cross execute their pipelines exactly ONCE; the combined edges
    # view and all counts re-read the already-written tmp parquet instead of
    # re-running the linking pipelines.
    outputs = ["nodes", "edges"]
    write_tmp("nodes", res.nodes)
    edge_tmp_dirs = []
    if res.base_edges is not None:
        edge_tmp_dirs.append(write_tmp("base_edges", res.base_edges))
        outputs.append("base_edges")
    if res.cross_edges is not None:
        edge_tmp_dirs.append(write_tmp("cross_edges", res.cross_edges))
        outputs.append("cross_edges")
    edges_from_files = res.edges
    if edge_tmp_dirs:  # a list argument to read_parquet means files, not dirs
        parts = [ray.data.read_parquet(d) for d in edge_tmp_dirs]
        edges_from_files = parts[0]
        for p in parts[1:]:
            edges_from_files = edges_from_files.union(p)
    write_tmp("edges", edges_from_files)
    n_nodes = ray.data.read_parquet(os.path.join(args.out, ".tmp_nodes")).count()
    n_edges = ray.data.read_parquet(os.path.join(args.out, ".tmp_edges")).count()
    for name in outputs:
        final = os.path.join(args.out, name)
        shutil.rmtree(final, ignore_errors=True)
        os.replace(os.path.join(args.out, f".tmp_{name}"), final)
    # remove sidecar state this run did NOT produce — a later --append must
    # never consume a previous configuration's leftovers
    for stale in ("base_edges", "cross_edges"):
        if stale not in outputs:
            shutil.rmtree(os.path.join(args.out, stale), ignore_errors=True)
    mapping_p = os.path.join(args.out, "mapping.json")
    if res.canonical_mapping:
        # persists so later --append runs reuse it (frozen mapping)
        import json
        with open(mapping_p, "w") as f:
            json.dump(res.canonical_mapping, f)
    elif os.path.exists(mapping_p):
        os.remove(mapping_p)
    if res.embeddings is not None:
        print(f"embeddings: {res.embeddings.count()}")
    print(f"ingested: {n_nodes} nodes, {n_edges} edges -> {args.out}")
    return 0


def _load_graph(out_dir: str):
    import ray.data

    return (ray.data.read_parquet(os.path.join(out_dir, "nodes")),
            ray.data.read_parquet(os.path.join(out_dir, "edges")))


def cmd_query(args) -> int:
    _init_ray()
    from .pipelines import graphquery as gq

    nodes, edges = _load_graph(args.out_dir)
    kind = args.kind
    if kind == "nodes":
        print(nodes.to_pandas().head(args.k).to_string())
    elif kind == "edges":
        print(edges.to_pandas().head(args.k).to_string())
    elif kind == "top-entities":
        df = nodes.to_pandas().sort_values(["n_docs", "label"], ascending=[False, True])
        print(df[df["node_type"] != "paper"].head(args.k).to_string())
    elif kind in ("concepts", "datasets", "metrics"):
        if not args.doc:
            print("--doc required", file=sys.stderr)
            return 2
        print(gq.doc_neighbors_of_type(edges, nodes, args.doc, kind[:-1]).to_string())
    elif kind == "improvements":
        print(gq.doc_improvements(edges, args.doc).to_string())
    elif kind == "similar":
        print(sorted(gq.similar_docs(edges, args.doc)))
    elif kind == "subgraph":
        from .functions.ids import paper_node_id

        print(gq.bfs_subgraph(edges, paper_node_id(args.doc), max_depth=2).to_string())
    elif kind == "ask":
        # full RAG loop (reference qa_service.py): retrieval over the corpus
        # + deterministic answer synthesis; needs the original corpus
        if not args.corpus:
            print("ask requires --corpus <documents parquet>", file=sys.stderr)
            return 2
        import ray.data

        from .sources.adapter import flat_batch_to_spans

        ds = ray.data.read_parquet(args.corpus)
        if "spans" not in ds.schema().names:
            ds = ds.map_batches(flat_batch_to_spans, batch_format="pyarrow",
                                zero_copy_batch=True)
        res = gq.answer_question(ds, args.doc or "", k=min(args.k, 5))
        print(res["answer"])
    else:
        print(f"unknown query kind: {kind}", file=sys.stderr)
        return 2
    return 0


def cmd_visualize(args) -> int:
    _init_ray()
    from .pipelines.viz import graph_to_html, subgraph_to_html

    nodes, edges = _load_graph(args.out_dir)
    nrecs = nodes.to_pandas().to_dict("records")
    erecs = edges.to_pandas().to_dict("records")
    common = dict(
        node_type_filter=args.node_type or None,
        physics=not args.no_physics,
        show_edge_labels=not args.no_edge_labels,
    )
    if args.root:
        # Subgraph view (reference: visualize_subgraph, graph_visualizer.py:266)
        path = subgraph_to_html(
            nrecs, erecs, args.root, args.html, max_depth=args.depth, **common
        )
    else:
        path = graph_to_html(nrecs, erecs, args.html, max_nodes=args.limit, **common)
    print(f"wrote {path}")
    return 0


def cmd_run(args) -> int:
    """Execute any registered query (the same registry __ray_entry__ serves)
    over an sf_dir of parquet tables; print the head or write parquet."""
    import pandas as pd

    from .pipelines.registry import QUERIES

    if not args.name or args.name == "list":
        for name, (_, sql) in sorted(QUERIES.items()):
            print(f"{name}\t{'sql-checked' if sql else 'rows-only'}")
        return 0
    if args.name not in QUERIES:
        print(f"unknown query '{args.name}' — run with 'list' to enumerate",
              file=sys.stderr)
        return 2
    fn, _ = QUERIES[args.name]
    res = fn(args.sf_dir)
    import ray.data

    if isinstance(res, ray.data.Dataset):
        if args.out:
            res.write_parquet(args.out)
            print(f"wrote {args.out}")
            return 0
        df = res.limit(max(args.head, 1)).to_pandas()
        n = "(streamed)"
    else:
        df = res.to_pandas() if not isinstance(res, pd.DataFrame) else res
        n = str(len(df))
        if args.out:
            df.to_parquet(args.out)
            print(f"wrote {args.out}")
            return 0
        df = df.head(args.head)
    with pd.option_context("display.width", 200, "display.max_columns", 50):
        print(df.to_string(index=False))
    print(f"rows: {n}")
    return 0


def cmd_curate(args) -> int:
    """Run the composed curation pipeline and print the funnel report."""
    import json as _json

    from .pipelines.curate import curate_corpus

    report = curate_corpus(
        args.sf_dir, args.out,
        keep_langs=tuple(s for s in args.langs.split(",") if s),
        budget=args.budget, n_parts=args.parts,
        order_seed=args.order_seed)
    print(_json.dumps(report))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="research_knowledge_graph_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    pi = sub.add_parser("ingest")
    pi.add_argument("input", nargs="?", default="")
    pi.add_argument("--out", required=True)
    pi.add_argument("--no-link", action="store_true")
    pi.add_argument("--no-entity-linking", action="store_true")
    pi.add_argument("--embed", action="store_true")
    pi.add_argument("--checkpoint", default=None)
    pi.add_argument("--json", action="store_true", help="input is JSON paper dicts")
    pi.add_argument("--jsonl", action="store_true",
                    help="input is Dolma-style line-delimited JSON "
                    "(auto-detected for .jsonl/.jsonl.gz)")
    pi.add_argument("--csv", action="store_true",
                    help="input is a CSV with doc_id,text columns "
                    "(auto-detected for .csv)")
    pi.add_argument("--text", action="store_true", help="input is a text file")
    pi.add_argument("--synthetic", type=int, default=0, help="generate N synthetic docs")
    pi.add_argument("--remove", default="",
                    help="comma-separated doc_ids to remove: re-finishes the "
                    "graph from the extraction checkpoint without "
                    "reprocessing (byte-identical to a reduced rebuild)")
    pi.add_argument("--append", action="store_true",
                    help="treat input as an increment to the existing graph in --out")
    pi.add_argument("--synthetic-start", type=int, default=0,
                    help="first synthetic doc index (append-ordered increments)")
    pi.set_defaults(fn=cmd_ingest)

    pq = sub.add_parser("query")
    pq.add_argument("out_dir")
    pq.add_argument("kind")
    pq.add_argument("--doc", default="")
    pq.add_argument("--k", type=int, default=20)
    pq.add_argument("--corpus", default="", help="corpus parquet for 'ask'")
    pq.set_defaults(fn=cmd_query)

    pv = sub.add_parser("visualize")
    pv.add_argument("out_dir")
    pv.add_argument("--html", required=True)
    pv.add_argument("--limit", type=int, default=300)
    pv.add_argument("--node-type", default="",
                    help="keep only nodes of this type (reference node_type_filter)")
    pv.add_argument("--root", default="",
                    help="render the BFS subgraph from this node id instead")
    pv.add_argument("--depth", type=int, default=2,
                    help="subgraph BFS depth (with --root)")
    pv.add_argument("--no-physics", action="store_true")
    pv.add_argument("--no-edge-labels", action="store_true")
    pv.set_defaults(fn=cmd_visualize)

    pc_ = sub.add_parser(
        "curate", help="full training-corpus curation: quality → lang → "
        "exact dedup → near-dup dedup → pack → partitioned parquet")
    pc_.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    pc_.add_argument("--out", required=True)
    pc_.add_argument("--budget", type=int, default=512,
                     help="token budget per packed sequence")
    pc_.add_argument("--langs", default="en",
                     help="comma-separated predicted languages to keep")
    pc_.add_argument("--parts", type=int, default=8,
                     help="output partition count")
    pc_.add_argument("--order-seed", type=int, default=None,
                     help="also write order-<seed>.parquet: the "
                     "deterministic epoch training order over kept docs")
    pc_.set_defaults(fn=cmd_curate)

    pr = sub.add_parser("run", help="run any registry query over an sf_dir")
    pr.add_argument("name", nargs="?", default="",
                    help="query name (omit or pass 'list' to enumerate)")
    pr.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    pr.add_argument("--head", type=int, default=20)
    pr.add_argument("--out", default="", help="optional parquet output path")
    pr.set_defaults(fn=cmd_run)

    args = p.parse_args(argv)
    rc = args.fn(args)
    import ray

    if ray.is_initialized():
        ray.shutdown()
    return rc


if __name__ == "__main__":
    sys.exit(main())
