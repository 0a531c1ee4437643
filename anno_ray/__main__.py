"""anno_ray CLI — thin argparse front-end over the library + pipelines.

Mirrors the reference CLI surface (anno/src/cli/commands/mod.rs:5-22:
extract, pipeline, crossdoc, batch, models, info, ...) on Ray Data:

  python -m anno_ray extract [--file F | --text T | -]   per-doc extraction
  python -m anno_ray kg --pages DIR --out DIR            flagship pipeline
  python -m anno_ray crossdoc --dir DIR | --jsonl F      cross-doc clusters
  python -m anno_ray export --kg DIR --format cypher     graph export
  python -m anno_ray stats --kg DIR                      corpus stats
  python -m anno_ray models                              available extractors

On a cluster, submit the same commands via:
  ray job submit --working-dir . -- python -m anno_ray kg --pages ... --out ...
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 log_to_driver=False)


def cmd_extract(args) -> int:
    from .core.document import process_document

    if args.text is not None:
        raw = args.text
    elif args.file == "-" or (args.file is None and not sys.stdin.isatty()):
        raw = sys.stdin.read()
    elif args.file:
        with open(args.file, encoding="utf-8") as f:
            raw = f.read()
    else:
        print("error: provide --text, --file, or pipe stdin", file=sys.stderr)
        return 2
    res = process_document(args.url or "cli://doc", raw, is_html=not args.plain)
    if args.format == "json":
        out = {
            "url": res.url,
            "text": res.text if args.with_text else None,
            "mentions": [
                {"text": m.text, "label": m.label, "start": m.start, "end": m.end,
                 "conf": m.conf, "negated": m.negated, "track_id": m.track_id,
                 "kb_id": m.kb_id}
                for m in res.mentions
            ],
            "tracks": [
                {"track_id": t.track_id, "canonical": t.canonical_surface,
                 "type": t.entity_type, "size": len(t.mention_idxs)}
                for t in res.tracks
            ],
            "triples": res.triples,
        }
        print(json.dumps(out, ensure_ascii=False, indent=None if args.compact else 1))
    else:  # human
        for m in res.mentions:
            flags = "!" if m.negated else " "
            print(f"{m.label:8s} {m.conf:.2f}{flags}[{m.start}:{m.end}] {m.text}")
        if res.triples:
            print("--- triples ---")
            for t in res.triples:
                print(f"({t['subj']}, {t['pred']}, {t['obj']})  conf={t['conf']}")
    return 0


def cmd_kg(args) -> int:
    from .pipelines.kg import run_kg_pipeline

    _ensure_ray(args.num_cpus)
    stats = run_kg_pipeline(args.pages, args.out, resume=not args.no_resume,
                            mode=args.mode)
    print(json.dumps(stats))
    return 0


def cmd_crossdoc(args) -> int:
    import pyarrow as pa

    from .sources.readers import read_docs_jsonl, read_text_dir
    from .stages import canonicalize as canon
    from .stages.corpus_stats import cluster_importance, filter_clusters, rank_clusters
    from .stages.extract import extract_docs, mentions_table

    _ensure_ray(args.num_cpus)
    if args.dir:
        pages = read_text_dir(args.dir)
    elif args.jsonl:
        pages = read_docs_jsonl(args.jsonl)
    else:
        print("error: provide --dir or --jsonl", file=sys.stderr)
        return 2
    docs = extract_docs(pages).materialize()
    mentions = mentions_table(docs).materialize()
    surfaces = canon.collect_surfaces(
        canon.surface_groups(mentions, type_col="label", surface_col="norm_surface")
    )
    edges = canon.fuzzy_edges(surfaces, mode=args.mode)
    mapping = canon.build_canonical_map(surfaces, edges)
    with_canon = canon.attach_canonical(mentions, mapping, type_col="label")
    clusters = cluster_importance(with_canon)
    if args.cross_doc_only or args.min_cluster_size:
        clusters = filter_clusters(
            clusters,
            min_cluster_size=args.min_cluster_size,
            cross_doc_only=args.cross_doc_only,
        )
    top = rank_clusters(clusters, max_clusters=args.max_clusters).to_pandas()
    for _, row in top.iterrows():
        print(
            f"[{row.entity_type}] {row.canonical_name}  docs={row.doc_count} "
            f"mentions={row.mention_count}"
        )
    return 0


def cmd_export(args) -> int:
    import duckdb

    from .core.graph_export import export

    con = duckdb.connect()
    nodes = con.execute(
        f"SELECT * FROM read_parquet('{args.kg}/nodes/part=*/data.parquet')"
    ).fetch_arrow_table()
    edges = con.execute(
        f"SELECT * FROM read_parquet('{args.kg}/edges/part=*/data.parquet')"
        + (f" LIMIT {args.limit}" if args.limit else "")
    ).fetch_arrow_table()
    print(export(nodes, edges, args.format))
    return 0


def cmd_stats(args) -> int:
    from .pipelines.kg import docs_dataset
    from .stages.corpus_stats import doc_stats

    _ensure_ray(args.num_cpus)
    import os

    docs = docs_dataset(args.kg) if os.path.isdir(
        os.path.join(args.kg, "docs")
    ) else None
    if docs is None:
        print("error: no docs stage under --kg dir", file=sys.stderr)
        return 2
    print(doc_stats(docs).to_string(index=False))
    return 0


def cmd_eval(args) -> int:
    """Triple-set P/R between two edge parquet dirs (J4 exact-match join)."""
    import duckdb

    from .functions.eval import triple_pr

    con = duckdb.connect()
    pred = con.execute(
        f"SELECT url, subj, pred, obj FROM read_parquet('{args.pred}')"
    ).fetch_arrow_table()
    gold = con.execute(
        f"SELECT url, subj, pred, obj FROM read_parquet('{args.gold}')"
    ).fetch_arrow_table()
    r = triple_pr(pred, gold)
    print(json.dumps({
        "precision": round(r.precision, 4), "recall": round(r.recall, 4),
        "f1": round(r.f1, 4), "n_pred": r.n_pred, "n_gold": r.n_gold,
        "n_match": r.n_match,
    }))
    return 0 if (r.precision >= args.gate and r.recall >= args.gate) else 1


def cmd_strata(args) -> int:
    """Leiden communities over a kg output (the strata command).

    --distributed routes through the modularity-guided label-propagation
    path (stages/communities.py) — the edge list never materializes on the
    driver; the default driver Leiden matches the reference objective."""
    import duckdb

    from .core import leiden

    if args.distributed:
        import glob as _glob

        import ray.data

        from .stages.communities import communities_table, label_propagation

        files = sorted(
            _glob.glob(f"{args.kg}/edges/part=*/data.parquet")
        )
        ds = ray.data.read_parquet(files, columns=["subj_node", "obj_node"])
        labels = label_propagation(
            ds, src_col="subj_node", dst_col="obj_node",
            resolution=args.resolution,
        )
        tbl = communities_table(labels)
        from collections import Counter

        comms = tbl.column("community").to_pylist()
        sizes = Counter(comms)
        print(
            f"{len(sizes)} communities over {tbl.num_rows} nodes; "
            f"largest: {sizes.most_common(5)}"
        )
        return 0

    con = duckdb.connect()
    edges = con.execute(
        f"SELECT subj_node, obj_node FROM read_parquet('{args.kg}/edges/part=*/data.parquet')"
    ).fetch_arrow_table()
    pairs: dict = {}
    for u, v in zip(edges.column("subj_node").to_pylist(), edges.column("obj_node").to_pylist()):
        if u != v:
            key = (u, v) if u < v else (v, u)
            pairs[key] = pairs.get(key, 0.0) + 1.0
    edge_list = [(u, v, w) for (u, v), w in pairs.items()]
    if args.levels > 1:
        out = leiden.hierarchical_cluster(edge_list, base_resolution=args.resolution, levels=args.levels)
        for node in sorted(out)[: args.limit]:
            print(node, json.dumps(out[node]))
    else:
        comm = leiden.cluster(edge_list, resolution=args.resolution)
        from collections import Counter

        sizes = Counter(comm.values())
        print(f"{len(sizes)} communities over {len(comm)} nodes; largest: {sizes.most_common(5)}")
    return 0


def cmd_debug(args) -> int:
    """Entity-highlighted HTML debug page for one document (S7)."""
    from .core.document import process_document
    from .core.html_render import render_document_html

    if args.file:
        with open(args.file, encoding="utf-8", errors="replace") as f:
            raw = f.read()
        is_html = raw.lstrip().startswith("<")
        res = process_document(args.file, raw, is_html=is_html)
    else:
        res = process_document("stdin", args.text or "", is_html=False)
    page = render_document_html(res)
    if args.out:
        with open(args.out, "w", encoding="utf-8") as f:
            f.write(page)
        print(args.out)
    else:
        print(page)
    return 0


def cmd_models(_args) -> int:
    from .functions import registry

    for name in registry.available():
        ex = registry.get_extractor(name)
        bs = getattr(ex, "batch_size", None)
        print(f"{name:12s} batch_size_hint={bs}")
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="anno_ray", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("extract", help="extract one document")
    p.add_argument("--text"); p.add_argument("--file")
    p.add_argument("--url", default=None)
    p.add_argument("--plain", action="store_true", help="input is plain text, skip HTML sniff")
    p.add_argument("--format", choices=["human", "json"], default="human")
    p.add_argument("--with-text", action="store_true")
    p.add_argument("--compact", action="store_true")
    p.set_defaults(fn=cmd_extract)

    p = sub.add_parser("kg", help="flagship KG pipeline")
    p.add_argument("--pages", required=True); p.add_argument("--out", required=True)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--mode", default="cdcr", choices=["cdcr", "coalesce"])
    p.add_argument("--num-cpus", type=int, default=None)
    p.set_defaults(fn=cmd_kg)

    p = sub.add_parser("crossdoc", help="cross-document clusters")
    p.add_argument("--dir"); p.add_argument("--jsonl")
    p.add_argument("--mode", default="cdcr", choices=["cdcr", "coalesce"])
    p.add_argument("--max-clusters", type=int, default=20)
    p.add_argument("--min-cluster-size", type=int, default=0)
    p.add_argument("--cross-doc-only", action="store_true")
    p.add_argument("--num-cpus", type=int, default=None)
    p.set_defaults(fn=cmd_crossdoc)

    p = sub.add_parser("export", help="export graph (cypher/networkx/jsonld)")
    p.add_argument("--kg", required=True)
    p.add_argument("--format", default="cypher", choices=["cypher", "networkx", "jsonld"])
    p.add_argument("--limit", type=int, default=None)
    p.set_defaults(fn=cmd_export)

    p = sub.add_parser("stats", help="corpus stats from a kg out dir")
    p.add_argument("--kg", required=True)
    p.add_argument("--num-cpus", type=int, default=None)
    p.set_defaults(fn=cmd_stats)

    p = sub.add_parser("eval", help="triple P/R between two edge tables")
    p.add_argument("--pred", required=True, help="parquet glob of predicted triples")
    p.add_argument("--gold", required=True, help="parquet glob of gold triples")
    p.add_argument("--gate", type=float, default=0.95)
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser("strata", help="Leiden communities over a kg output")
    p.add_argument("--kg", required=True)
    p.add_argument("--resolution", type=float, default=1.0)
    p.add_argument("--levels", type=int, default=1)
    p.add_argument("--limit", type=int, default=20)
    p.add_argument("--distributed", action="store_true",
                   help="label-propagation scale path (edges stay distributed)")
    p.set_defaults(fn=cmd_strata)

    p = sub.add_parser("debug", help="entity-highlighted HTML page for one doc")
    p.add_argument("--text")
    p.add_argument("--file")
    p.add_argument("--out")
    p.set_defaults(fn=cmd_debug)

    p = sub.add_parser("models", help="list available extractors")
    p.set_defaults(fn=cmd_models)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
