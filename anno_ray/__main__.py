"""anno_ray CLI — thin argparse front-end over the library + pipelines.

Mirrors the reference CLI surface (anno/src/cli/commands/mod.rs:5-22:
extract, pipeline, crossdoc, batch, models, info, ...) on Ray Data:

  python -m anno_ray extract [--file F | --text T | -]   per-doc extraction
  python -m anno_ray kg --pages DIR --out DIR            flagship pipeline
  python -m anno_ray crossdoc --dir DIR | --jsonl F      cross-doc clusters
  python -m anno_ray export --kg DIR --format cypher     graph export
  python -m anno_ray stats --kg DIR                      corpus stats
  python -m anno_ray models                              available extractors
  python -m anno_ray validate F.jsonl ...                annotation lint
  python -m anno_ray analyze --text T                    all extractors + agreement
  python -m anno_ray compare --a regex --b heuristic     extractor diff
  python -m anno_ray enhance --file doc.json             re-process w/ options
  python -m anno_ray query --kg DIR --type PER           node table filters
  python -m anno_ray batch --dir D --out O               parallel batch extract
  python -m anno_ray cache list|clear                    on-disk cache mgmt
  python -m anno_ray config [--save F]                   scale/dispatch config
  python -m anno_ray info                                versions + features
  python -m anno_ray benchmark [--docs N]                per-extractor docs/sec
  python -m anno_ray graph pagerank|degree|components    graph analytics on a kg
  python -m anno_ray corpus PATH --quantiles C --distinct C  column analyses

On a cluster, submit the same commands via:
  ray job submit --working-dir . -- python -m anno_ray kg --pages ... --out ...
"""

from __future__ import annotations

import argparse
import json
import os
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


def cmd_validate(args) -> int:
    """Validate JSONL annotation files (anno-cli validate analog,
    validate.rs): span bounds, start<end, required fields. Exit 1 on any
    invalid record."""
    total_errors = 0
    for path in args.files:
        n_docs = 0
        errors: list[str] = []
        with open(path, encoding="utf-8") as f:
            for lineno, line in enumerate(f, 1):
                line = line.strip()
                if not line:
                    continue
                n_docs += 1
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError as e:
                    errors.append(f"line {lineno}: invalid JSON ({e})")
                    continue
                text = rec.get("text")
                if not isinstance(rec.get("url", rec.get("id", "")), str):
                    errors.append(f"line {lineno}: url/id must be a string")
                mentions = rec.get("mentions") or rec.get("signals") or []
                for k, m in enumerate(mentions):
                    s, e_, lab = m.get("start"), m.get("end"), m.get("label")
                    if not isinstance(s, int) or not isinstance(e_, int):
                        errors.append(f"line {lineno} mention {k}: non-int span")
                        continue
                    if s < 0 or e_ <= s:
                        errors.append(
                            f"line {lineno} mention {k}: bad span [{s}:{e_}]"
                        )
                    if isinstance(text, str) and e_ > len(text):
                        errors.append(
                            f"line {lineno} mention {k}: span [{s}:{e_}] exceeds "
                            f"text length {len(text)}"
                        )
                    if not lab:
                        errors.append(f"line {lineno} mention {k}: empty label")
                    mt = m.get("text")
                    if (
                        isinstance(text, str) and isinstance(mt, str)
                        and isinstance(s, int) and isinstance(e_, int)
                        and 0 <= s < e_ <= len(text) and text[s:e_] != mt
                    ):
                        errors.append(
                            f"line {lineno} mention {k}: text mismatch "
                            f"({text[s:e_]!r} != {mt!r})"
                        )
        status = "OK" if not errors else f"{len(errors)} error(s)"
        print(f"{path}: {n_docs} docs, {status}")
        for err in errors[: args.max_errors]:
            print(f"  {err}")
        total_errors += len(errors)
    return 1 if total_errors else 0


def cmd_analyze(args) -> int:
    """Run EVERY registered extractor on one text and report agreement
    (anno-cli analyze analog: 'deep analysis with multiple models')."""
    from .functions import registry

    if args.file:
        with open(args.file, encoding="utf-8") as f:
            text = f.read()
    else:
        text = args.text or sys.stdin.read()
    spans_by_model: dict[str, set] = {}
    for name in registry.available():
        ex = registry.get_extractor(name)
        ms = ex(text)
        spans_by_model[name] = {(m.start, m.end, m.label) for m in ms}
        print(f"=== {name}: {len(ms)} mentions ===")
        for m in sorted(ms, key=lambda m: (m.start, m.end)):
            print(f"  {m.label:8s} [{m.start}:{m.end}] {m.text}")
    names = sorted(spans_by_model)
    if len(names) > 1:
        print("--- pairwise span agreement (jaccard) ---")
        for i, a in enumerate(names):
            for b in names[i + 1:]:
                u = spans_by_model[a] | spans_by_model[b]
                jac = len(spans_by_model[a] & spans_by_model[b]) / len(u) if u else 1.0
                print(f"  {a} vs {b}: {jac:.3f}")
    return 0


def cmd_corpus(args) -> int:
    """Distributed column analyses over an arbitrary parquet table: exact
    quantiles (histogram narrowing) and/or HLL approximate distinct counts.
    Prints one JSON object."""
    import json

    import ray.data

    _ensure_ray(args.num_cpus)
    out: dict = {"path": args.path}
    if args.quantiles:
        from .stages.quantiles import column_quantiles

        qs = tuple(float(q) for q in args.qs.split(","))
        ds = ray.data.read_parquet(args.path, columns=[args.quantiles])
        got = column_quantiles(ds, args.quantiles, qs)
        out["quantiles"] = {str(q): got[q] for q in qs}
    if args.distinct:
        from .stages.sketches import hll_count_distinct

        cols = tuple(c.strip() for c in args.distinct.split(","))
        ds = ray.data.read_parquet(args.path, columns=list(cols))
        out["approx_distinct"] = {
            ",".join(cols): int(round(hll_count_distinct(ds, cols)))
        }
    if not args.quantiles and not args.distinct:
        print("nothing to do: pass --quantiles and/or --distinct", file=sys.stderr)
        return 2
    print(json.dumps(out))
    return 0


def cmd_graph(args) -> int:
    """Graph analytics over a materialized kg output dir: PageRank top-k,
    degree stats, or connected-component summary. Prints JSON lines."""
    import glob as _glob
    import json

    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    import ray.data

    _ensure_ray(args.num_cpus)
    edge_files = sorted(
        _glob.glob(os.path.join(args.kg, "edges", "part=*", "data.parquet"))
    )
    if not edge_files:
        print(f"no edge partitions under {args.kg}/edges", file=sys.stderr)
        return 2
    edges = ray.data.read_parquet(edge_files, columns=["subj_node", "obj_node"])

    def _collect(ds):
        if isinstance(ds, pa.Table):
            return ds
        return pa.concat_tables(
            [ray.get(r) for r in ds.to_arrow_refs()], promote_options="permissive"
        )

    if args.what == "pagerank":
        from .stages.graph_analytics import pagerank

        t = _collect(pagerank(edges, iterations=args.iterations))
        t = t.take(pc.sort_indices(
            t, sort_keys=[("pr_norm", "descending"), ("node_id", "ascending")]
        ))
        for i in range(min(args.top, t.num_rows)):
            print(json.dumps({
                "node_id": t.column("node_id")[i].as_py(),
                "pr_norm": t.column("pr_norm")[i].as_py(),
            }))
    elif args.what == "degree":
        from .stages.graph_analytics import degree_stats

        t = _collect(degree_stats(edges))
        tot = pc.add(t.column("out_deg"), t.column("in_deg"))
        t = t.append_column("total_deg", tot)
        t = t.take(pc.sort_indices(
            t, sort_keys=[("total_deg", "descending"), ("node_id", "ascending")]
        ))
        for i in range(min(args.top, t.num_rows)):
            print(json.dumps({
                "node_id": t.column("node_id")[i].as_py(),
                "out_deg": t.column("out_deg")[i].as_py(),
                "in_deg": t.column("in_deg")[i].as_py(),
            }))
    else:  # components
        from .stages.graph_analytics import connected_components

        t = _collect(connected_components(edges))
        comp = t.group_by("component").aggregate([("component_size", "max")])
        comp = comp.take(pc.sort_indices(
            comp,
            sort_keys=[("component_size_max", "descending"), ("component", "ascending")],
        ))
        print(json.dumps({"nodes": t.num_rows, "components": comp.num_rows}))
        for i in range(min(args.top, comp.num_rows)):
            print(json.dumps({
                "component": comp.column("component")[i].as_py(),
                "size": comp.column("component_size_max")[i].as_py(),
            }))
    return 0


def cmd_compare(args) -> int:
    """Compare two extractors on the same text: shared / only-A / only-B
    spans (anno-cli compare --models analog)."""
    from .functions import registry

    if args.file:
        with open(args.file, encoding="utf-8") as f:
            text = f.read()
    else:
        text = args.text or sys.stdin.read()
    a = registry.get_extractor(args.a)(text)
    b = registry.get_extractor(args.b)(text)
    sa = {(m.start, m.end, m.label): m for m in a}
    sb = {(m.start, m.end, m.label): m for m in b}
    both = sorted(set(sa) & set(sb))
    only_a = sorted(set(sa) - set(sb))
    only_b = sorted(set(sb) - set(sa))
    print(f"both={len(both)} only_{args.a}={len(only_a)} only_{args.b}={len(only_b)}")
    for tag, keys, src in (("=", both, sa), ("<", only_a, sa), (">", only_b, sb)):
        for k in keys:
            m = src[k]
            print(f"{tag} {m.label:8s} [{m.start}:{m.end}] {m.text}")
    return 0


def cmd_enhance(args) -> int:
    """Re-process a JSON document record with extra stages toggled
    (anno-cli enhance analog: add coref tracks / KB links to an existing
    document). Input: JSON {url, text|html} on --file or stdin."""
    from .core.document import process_document

    raw = sys.stdin.read() if (args.file in (None, "-")) else open(
        args.file, encoding="utf-8"
    ).read()
    rec = json.loads(raw)
    content = rec.get("html") or rec.get("text") or ""
    res = process_document(
        rec.get("url", "enhance://doc"),
        content,
        is_html="html" in rec,
        coref_strategy=args.coref,
    )
    out = {
        "url": res.url,
        "text": res.text,
        "mentions": [
            {"text": m.text, "label": m.label, "start": m.start, "end": m.end,
             "conf": m.conf, "track_id": m.track_id, "kb_id": m.kb_id}
            for m in res.mentions
        ],
        "tracks": [
            {"track_id": t.track_id, "canonical": t.canonical_surface,
             "type": t.entity_type, "size": len(t.mention_idxs)}
            for t in res.tracks
        ],
        "triples": res.triples,
    }
    print(json.dumps(out, ensure_ascii=False))
    return 0


def cmd_query(args) -> int:
    """Query/filter the canonical node table of a kg output
    (anno-cli query analog: filter entities by type/name/frequency)."""
    import duckdb

    con = duckdb.connect()
    where = []
    if args.type:
        esc_t = args.type.replace("'", "''")
        where.append(f"node_type = '{esc_t}'")
    if args.name_contains:
        esc = args.name_contains.replace("'", "''")
        where.append(f"name LIKE '%{esc}%'")
    if args.min_mentions:
        where.append(f"mentions_count >= {int(args.min_mentions)}")
    sql = (
        f"SELECT node_id, node_type, name, mentions_count "
        f"FROM read_parquet('{args.kg}/nodes/part=*/data.parquet')"
        + (" WHERE " + " AND ".join(where) if where else "")
        + f" ORDER BY mentions_count DESC, node_id LIMIT {args.limit}"
    )
    for row in con.execute(sql).fetchall():
        print(f"{row[1]:8s} {row[3]:6d}  {row[2]}  ({row[0]})")
    return 0


def cmd_batch(args) -> int:
    """Batch-extract a directory of text files or a JSONL corpus to JSONL
    docs via the Ray pipeline (anno-cli batch analog — whose --parallel flag
    is an accepted-but-unimplemented placeholder, batch.rs:100-107; this one
    actually fans out)."""
    from .sources.readers import read_docs_jsonl, read_text_dir
    from .sources.sinks import write_docs_jsonl
    from .stages.extract import extract_docs

    _ensure_ray(args.num_cpus)
    if args.dir:
        pages = read_text_dir(args.dir)
    elif args.jsonl:
        pages = read_docs_jsonl(args.jsonl)
    else:
        print("error: provide --dir or --jsonl", file=sys.stderr)
        return 2
    docs = extract_docs(pages, coref_strategy=args.coref)
    write_docs_jsonl(docs, args.out)
    print(args.out)
    return 0


def cmd_cache(args) -> int:
    """Manage on-disk engine caches: fixture corpora, kg canonical-mapping
    resume artifacts (anno-cli cache analog)."""
    import glob as _glob
    import os
    import shutil

    roots = sorted(
        _glob.glob("/tmp/anno_ray_pages_*") + _glob.glob("/tmp/anno_bench_pages_*")
    )
    if args.action == "list":
        total = 0
        for r in roots:
            size = sum(
                os.path.getsize(os.path.join(dp, f))
                for dp, _, fs in os.walk(r) for f in fs
            )
            total += size
            print(f"{r}  {size / 1e6:.1f} MB")
        print(f"total: {total / 1e6:.1f} MB in {len(roots)} cache dirs")
        return 0
    if args.action == "clear":
        for r in roots:
            shutil.rmtree(r, ignore_errors=True)
            print(f"removed {r}")
        return 0
    print("error: action must be list|clear", file=sys.stderr)
    return 2


def cmd_config(args) -> int:
    """Show (or save) the engine's effective scale/dispatch configuration
    (anno-cli config analog)."""
    from .pipelines.kg import BROADCAST_MAP_MAX, DRIVER_SURFACE_MAX
    from .stages.canonicalize import _BAND_TASK_MIN
    from .stages.communities import LEIDEN_DRIVER_MAX
    from .stages.dedup import (
        _BUCKET_PARTITIONS,
        _CC_DRIVER_MAX_PAIRS,
        _NGRAM_BROADCAST_MAX,
        _VERIFY_BROADCAST_MAX,
    )

    cfg = {
        "driver_surface_max": DRIVER_SURFACE_MAX,
        "broadcast_map_max": BROADCAST_MAP_MAX,
        "band_task_min": _BAND_TASK_MIN,
        "leiden_driver_max_edges": LEIDEN_DRIVER_MAX,
        "minhash_verify_broadcast_max_docs": _VERIFY_BROADCAST_MAX,
        "minhash_cc_driver_max_pairs": _CC_DRIVER_MAX_PAIRS,
        "ngram_verify_broadcast_max_pairs": _NGRAM_BROADCAST_MAX,
        "bucket_shuffle_partitions": _BUCKET_PARTITIONS,
    }
    text = json.dumps(cfg, indent=1)
    if args.save:
        with open(args.save, "w", encoding="utf-8") as f:
            f.write(text + "\n")
        print(args.save)
    else:
        print(text)
    return 0


def cmd_info(_args) -> int:
    """Runtime/feature report (anno-cli info analog): versions + optional
    backend availability."""
    import numpy
    import pyarrow

    import ray

    print(f"python    {sys.version.split()[0]}")
    print(f"ray       {ray.__version__}")
    print(f"pyarrow   {pyarrow.__version__}")
    print(f"numpy     {numpy.__version__}")
    for feature, mod in [
        ("onnxruntime (M1/M2 live inference)", "onnxruntime"),
        ("PIL (image decode)", "PIL"),
        ("duckdb (oracle/query)", "duckdb"),
        ("polars", "polars"),
    ]:
        try:
            __import__(mod)
            print(f"feature {feature}: available")
        except ImportError:
            print(f"feature {feature}: NOT available (stubbed)")
    from .functions import registry

    print("extractors:", ", ".join(registry.available()))
    return 0


def cmd_benchmark(args) -> int:
    """Micro-benchmark every registered extractor over synthetic CC pages
    (anno-cli benchmark analog, per-backend docs/sec)."""
    import time

    from .core.html import resolve_content
    from .fixtures.pages import generate_pages_table
    from .functions import registry

    pages = generate_pages_table(0, args.docs, seed=42)
    texts = [
        resolve_content(h.decode("utf-8", "replace") if isinstance(h, (bytes, bytearray)) else h)
        for h in pages.column("html").to_pylist()
    ]
    for name in registry.available():
        ex = registry.get_extractor(name)
        ex(texts[0])  # warm (regex compile etc.)
        t0 = time.time()
        n_mentions = sum(len(ex(t)) for t in texts)
        dt = time.time() - t0
        print(
            f"{name:12s} {args.docs / dt:8.1f} docs/s  "
            f"{1e3 * dt / args.docs:7.2f} ms/doc  {n_mentions} mentions"
        )
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

    p = sub.add_parser("validate", help="validate JSONL annotation files")
    p.add_argument("files", nargs="+")
    p.add_argument("--max-errors", type=int, default=20)
    p.set_defaults(fn=cmd_validate)

    p = sub.add_parser("analyze", help="run all extractors on one text + agreement")
    p.add_argument("--text"); p.add_argument("--file")
    p.set_defaults(fn=cmd_analyze)

    p = sub.add_parser("compare", help="diff two extractors on the same text")
    p.add_argument("--a", required=True); p.add_argument("--b", required=True)
    p.add_argument("--text"); p.add_argument("--file")
    p.set_defaults(fn=cmd_compare)

    p = sub.add_parser("enhance", help="re-process a JSON doc with extra stages")
    p.add_argument("--file", default=None, help="JSON record ('-' or omit for stdin)")
    p.add_argument("--coref", default="cli", choices=["cli", "simple"])
    p.set_defaults(fn=cmd_enhance)

    p = sub.add_parser("query", help="filter canonical nodes of a kg output")
    p.add_argument("--kg", required=True)
    p.add_argument("--type"); p.add_argument("--name-contains")
    p.add_argument("--min-mentions", type=int, default=0)
    p.add_argument("--limit", type=int, default=20)
    p.set_defaults(fn=cmd_query)

    p = sub.add_parser("batch", help="batch-extract a dir/JSONL corpus to JSONL")
    p.add_argument("--dir"); p.add_argument("--jsonl")
    p.add_argument("--out", required=True)
    p.add_argument("--coref", default="cli", choices=["cli", "simple"])
    p.add_argument("--num-cpus", type=int, default=None)
    p.set_defaults(fn=cmd_batch)

    p = sub.add_parser("cache", help="list/clear on-disk engine caches")
    p.add_argument("action", choices=["list", "clear"])
    p.set_defaults(fn=cmd_cache)

    p = sub.add_parser("config", help="show/save engine scale configuration")
    p.add_argument("--save", default=None)
    p.set_defaults(fn=cmd_config)

    p = sub.add_parser("info", help="runtime versions + feature availability")
    p.set_defaults(fn=cmd_info)

    p = sub.add_parser("benchmark", help="per-extractor docs/sec microbenchmark")
    p.add_argument("--docs", type=int, default=50)
    p.set_defaults(fn=cmd_benchmark)

    p = sub.add_parser(
        "graph", help="graph analytics (pagerank/degree/components) over a kg output"
    )
    p.add_argument("what", choices=["pagerank", "degree", "components"])
    p.add_argument("--kg", required=True, help="kg output dir (with edges/)")
    p.add_argument("--top", type=int, default=20)
    p.add_argument("--iterations", type=int, default=10)
    p.add_argument("--num-cpus", type=int, default=None)
    p.set_defaults(fn=cmd_graph)

    p = sub.add_parser(
        "corpus", help="distributed column analyses over a parquet table"
    )
    p.add_argument("path", help="parquet file/dir/glob")
    p.add_argument("--quantiles", metavar="COL",
                   help="exact quantiles of a numeric column")
    p.add_argument("--qs", default="0.25,0.5,0.9,0.99",
                   help="comma-separated quantiles (default 0.25,0.5,0.9,0.99)")
    p.add_argument("--distinct", metavar="COLS",
                   help="HyperLogLog approx distinct of comma-joined columns")
    p.add_argument("--num-cpus", type=int, default=None)
    p.set_defaults(fn=cmd_corpus)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
