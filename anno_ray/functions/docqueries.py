"""Document/text/embedding queries for the driver contract.

Each function takes ``sf_dir`` and returns a result whose columns match the
paired oracle SQL (where one exists). Implementations are Ray-Data-first:
column-pruned reads, vectorized kernels, partial aggregation before shuffles.
"""

from __future__ import annotations

import glob
import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..ray_utils import register_for_ray


def _read(sf_dir: str, table: str, columns: list[str] | None = None):
    import ray.data

    register_for_ray()
    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"), columns=columns
    )


def docs_by_lang(sf_dir: str):
    """Groupby rollup on the documents table."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "documents", ["lang", "n_chars"])
    out = ds.groupby("lang").aggregate(Count(), Sum("n_chars"))
    return out.map_batches(
        lambda b: b.rename_columns(
            [
                {"count()": "n_docs", "sum(n_chars)": "total_chars"}.get(c, c)
                for c in b.column_names
            ]
        ),
        batch_format="pyarrow",
    )


_TOKEN_RE = re.compile(r"[^ \t\n\r\f]+")  # ASCII ws split == RE2 \S+ on these docs


def doc_token_stats(sf_dir: str):
    """Token counting (whitespace tokens) rolled up per lang."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "documents", ["lang", "text"])

    def kernel(b: pa.Table) -> pa.Table:
        texts = [t or "" for t in b.column("text").to_pylist()]
        return pa.table(
            {
                "lang": b.column("lang"),
                "n_tokens": pa.array(
                    [len(_TOKEN_RE.findall(t)) for t in texts], pa.int64()
                ),
            }
        )

    out = ds.map_batches(kernel, batch_format="pyarrow").groupby("lang").aggregate(
        Sum("n_tokens"), Count()
    )
    return out.map_batches(
        lambda b: b.rename_columns(
            [
                {"sum(n_tokens)": "total_tokens", "count()": "n_docs"}.get(c, c)
                for c in b.column_names
            ]
        ),
        batch_format="pyarrow",
    )


def dedup_docs_exact(sf_dir: str):
    """Exact dedup summary: total docs vs distinct texts (hash-partitioned)."""
    import pandas as pd

    from ..stages.dedup import exact_dedup_ids

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    groups = exact_dedup_ids(ds, text_col="text", id_col="doc_id")
    n_distinct = groups.count()
    n_docs = ds.count()
    return pd.DataFrame({"n_docs": [n_docs], "n_distinct": [n_distinct]})


def top_words(sf_dir: str, k: int = 20):
    """Token explode -> partial counts per block -> groupby-sum -> top-k.
    The per-block combiner keeps hot tokens from flooding the shuffle."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["text"])

    def kernel(b: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for t in b.column("text").to_pylist():
            c.update(w.lower() for w in _TOKEN_RE.findall(t or ""))
        toks = sorted(c)
        return pa.table(
            {
                "word": pa.array(toks, pa.string()),
                "n": pa.array([c[t] for t in toks], pa.int64()),
            }
        )

    counts = (
        ds.map_batches(kernel, batch_format="pyarrow").groupby("word").aggregate(Sum("n"))
    )
    counts = counts.map_batches(
        lambda b: b.rename_columns(
            [{"sum(n)": "n"}.get(c, c) for c in b.column_names]
        ),
        batch_format="pyarrow",
    )
    return counts.sort(["n", "word"], descending=[True, False]).limit(k)


def docs_containing_word(sf_dir: str, word: str = "table"):
    """String-filter kernel: count docs whose text contains the word."""
    import pandas as pd

    ds = _read(sf_dir, "documents", ["text"])

    def kernel(b: pa.Table) -> pa.Table:
        mask = pc.match_substring(b.column("text"), word)
        return pa.table({"hit": pa.array([int(pc.sum(pc.cast(mask, pa.int64())).as_py() or 0)], pa.int64())})

    total = sum(
        r["hit"] for r in ds.map_batches(kernel, batch_format="pyarrow").take_all()
    )
    return pd.DataFrame({"n_docs": [total]})


def _query_head(ds, n_queries: int):
    """The n_queries query vectors (vec_id 0..n-1) via a cheap distributed
    filter — NOT a global sort: vec_ids are dense 0-based, so a predicate
    selects the head without moving the corpus."""
    import ray

    head = ds.filter(
        expr=f"vec_id < {n_queries}"
    )
    tbl = pa.concat_tables(
        [ray.get(r) for r in head.to_arrow_refs()], promote_options="permissive"
    )
    order = pc.sort_indices(tbl, sort_keys=[("vec_id", "ascending")])
    tbl = tbl.take(order)
    qids = tbl.column("vec_id").to_pylist()
    qm = np.array(tbl.column("embedding").to_pylist(), dtype=np.float32)
    return qids, qm


def ann_cosine_topk(sf_dir: str, n_queries: int = 10, k: int = 5):
    """Brute-force cosine top-k: first n_queries vectors vs the corpus."""
    from ..stages.similarity import cosine_topk

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qids, qm = _query_head(ds, n_queries)
    out = cosine_topk(ds, qids, qm, k=k)
    return out.select(["query_id", "rank", "neighbor_id"])  # pa.Table


def ann_lsh_topk(sf_dir: str, n_queries: int = 10, k: int = 5):
    """LSH-bucketed approximate variant (rows-only check; recall measured in
    tests against the exact result)."""
    from ..stages.similarity import lsh_cosine_topk

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qids, qm = _query_head(ds, n_queries)
    return lsh_cosine_topk(ds, qids, qm, k=k)


def ann_ivf_topk(sf_dir: str, n_queries: int = 10, k: int = 5):
    """IVF (k-means coarse quantizer) approximate variant — the
    data-adaptive ANN scale path (rows-only; recall vs exact pinned in
    tests)."""
    from ..stages.similarity import ivf_cosine_topk

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qids, qm = _query_head(ds, n_queries)
    return ivf_cosine_topk(ds, qids, qm, k=k)


def embedding_near_dups(sf_dir: str):
    import ray

    from ..stages.similarity import embedding_near_dup_pairs

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = embedding_near_dup_pairs(ds, threshold=0.9)
    # contract-sized collect with a STABLE schema: Ray's empty pipelines
    # yield column-less blocks, so an all-negative corpus (the sf0.01 case —
    # max pairwise cosine ~0.51) must still return the typed pair table
    schema = pa.schema(
        [("id_a", pa.int64()), ("id_b", pa.int64()), ("cosine", pa.float64())]
    )
    tbls = [t for t in (ray.get(r) for r in out.to_arrow_refs()) if t.num_columns]
    if not tbls:
        return schema.empty_table()
    return pa.concat_tables(tbls, promote_options="permissive")


def minhash_near_dups(sf_dir: str):
    from ..stages.dedup import minhash_lsh_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return minhash_lsh_pairs(ds, threshold=0.8)


def simhash_near_dups(sf_dir: str):
    from ..stages.dedup import simhash_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return simhash_pairs(ds, max_hamming=8)


def lang_detect_distribution(sf_dir: str):
    """Detected-language histogram (reference lang.rs heuristic; rows-only)."""
    from ray.data.aggregate import Count

    from ..stages.text_analysis import language_id

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = language_id(ds).groupby("detected_lang").aggregate(Count())
    return out.map_batches(
        lambda b: b.rename_columns(
            [{"count()": "n_docs"}.get(c, c) for c in b.column_names]
        ),
        batch_format="pyarrow",
    )


def quality_by_lang(sf_dir: str):
    from ray.data.aggregate import Mean

    from ..stages.text_analysis import quality_scores

    ds = _read(sf_dir, "documents", ["lang", "text"])
    out = quality_scores(ds).groupby("lang").aggregate(Mean("quality_score"))

    def fin(b: pa.Table) -> pa.Table:
        b = b.rename_columns(
            [{"mean(quality_score)": "avg_quality"}.get(c, c) for c in b.column_names]
        )
        i = b.column_names.index("avg_quality")
        # round-6 on both sides (pc.round = half away from zero = DuckDB ROUND)
        return b.set_column(i, "avg_quality", pc.round(b.column("avg_quality"), ndigits=6))

    return out.map_batches(fin, batch_format="pyarrow")


def doc_fingerprints(sf_dir: str):
    from ..stages.text_analysis import fingerprints

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return fingerprints(ds).select_columns(["doc_id", "fingerprint"])


def _pages_dir_for(sf_dir: str) -> str:
    """Deterministic synthetic CC-style pages sized to the sf tier, cached
    under /tmp (seed fixed -> byte-reproducible)."""
    import ray

    from ..fixtures.pages import write_pages_parquet

    n_docs = _read(sf_dir, "documents", ["doc_id"]).count()
    n_pages = max(50, n_docs)
    out = f"/tmp/anno_ray_pages_{n_pages}"
    marker = os.path.join(out, "_DONE")
    if not os.path.exists(marker):
        write_pages_parquet(out, n_pages, seed=42, pages_per_file=max(50, n_pages // 8))
        with open(marker, "w", encoding="utf-8") as f:
            f.write("ok")
    return out


def _synthetic_pages(sf_dir: str):
    import ray.data

    # prune at the read (same columns as kg.py's _PAGE_COLUMNS): a CC-scale
    # pages table carries warc/header metadata the extract never touches
    return ray.data.read_parquet(
        _pages_dir_for(sf_dir), columns=["url", "html", "lang"]
    )


def kg_mentions(sf_dir: str):
    """Full fused extraction (P1-P8, C1, J1) over synthetic CC-style pages."""
    from ..stages.extract import extract_docs, mentions_table

    docs = extract_docs(_synthetic_pages(sf_dir))
    return mentions_table(docs)


def kg_triples(sf_dir: str):
    """Flagship (subj, pred, obj) triple extraction over CC-style pages."""
    from ..stages.extract import extract_docs, triples_table

    docs = extract_docs(_synthetic_pages(sf_dir))
    return triples_table(docs)


def kg_nodes(sf_dir: str):
    """Full KG pipeline -> canonical sorted nodes table."""
    import duckdb

    from ..pipelines.kg import run_kg_pipeline

    pages = _pages_dir_for(sf_dir)
    out = pages + "_kg"
    run_kg_pipeline(pages, out)
    con = duckdb.connect()
    return con.execute(
        f"SELECT * FROM read_parquet('{out}/nodes/part=*/data.parquet') ORDER BY node_id"
    ).fetch_arrow_table()


def kg_edges(sf_dir: str):
    """Full KG pipeline -> canonical sorted edges table."""
    import duckdb

    from ..pipelines.kg import run_kg_pipeline

    pages = _pages_dir_for(sf_dir)
    out = pages + "_kg"
    run_kg_pipeline(pages, out)
    con = duckdb.connect()
    return con.execute(
        f"SELECT * FROM read_parquet('{out}/edges/part=*/data.parquet') "
        "ORDER BY subj_node, pred, obj_node, url"
    ).fetch_arrow_table()


def multimodal_decode(sf_dir: str):
    """Image-decode plumbing over deterministic fake media (rows-only)."""
    import ray.data

    from ..stages.multimodal import decode_images, synthetic_media_table

    media = ray.data.from_arrow(synthetic_media_table(200))
    out = decode_images(media, fake=True)
    return out.select_columns(["media_id", "height", "width", "channels"])


def top_words_sketch(sf_dir: str, k: int = 20, block_k: int = 512, slack: int = 64):
    """CERTIFIED sketch top-k: exact top-k words without shuffling the full
    vocabulary.

    Pass 1 truncates each block's word counts to its top ``block_k`` entries
    and records the largest DROPPED count as that block's error bound; the
    groupby-sum over truncated partials yields lower-bound counts and a
    global bound B = sum of per-block bounds (any word's true count exceeds
    its lower bound by at most B). Pass 2 exactly recounts only the top
    ``k + slack`` candidates (broadcast set, combiner partials). The result
    is CERTIFIED equal to the exact top-k iff the k-th candidate's exact
    count strictly exceeds threshold + B, where threshold is the best
    possible lower bound of any non-candidate; otherwise it falls back to
    the exact full groupby (same output contract either way, so the SQL
    oracle is the plain GROUP BY/ORDER BY/LIMIT).

    Scale shape: the shuffle moves <= block_k + 1 rows per block in pass 1
    and <= k + slack rows per block in pass 2 — never the full vocabulary.
    """
    from collections import Counter

    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["text"])

    def partial_kernel(b: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in b.column("text").to_pylist():
            c.update(w.lower() for w in _TOKEN_RE.findall(t or ""))
        # top block_k by (count desc, word asc); bound = best dropped count
        items = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
        kept, dropped = items[:block_k], items[block_k:]
        bound = dropped[0][1] if dropped else 0
        # "" cannot be a \S+ token -> safe marker row for the block bound
        # (Ray's groupby sort rejects None keys)
        words = [w for w, _ in kept] + [""]
        ns = [n for _, n in kept] + [0]
        bounds = [0] * len(kept) + [bound]
        return pa.table(
            {
                "word": pa.array(words, pa.string()),
                "n": pa.array(ns, pa.int64()),
                "bound": pa.array(bounds, pa.int64()),
            }
        )

    lower = (
        ds.map_batches(partial_kernel, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n"), Sum("bound"))
        .take_all()
    )  # <= blocks x block_k words; at huge scale take top-N via sort+limit
    total_bound = sum(r["sum(bound)"] for r in lower if r["word"] == "")
    ranked = sorted(
        (r for r in lower if r["word"] != ""),
        key=lambda r: (-r["sum(n)"], r["word"]),
    )
    cand = [r["word"] for r in ranked[: k + slack]]
    threshold = ranked[k + slack]["sum(n)"] if len(ranked) > k + slack else 0

    cand_set = set(cand)

    def exact_kernel(b: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in b.column("text").to_pylist():
            c.update(
                w
                for w in (w.lower() for w in _TOKEN_RE.findall(t or ""))
                if w in cand_set
            )
        toks = sorted(c)
        return pa.table(
            {
                "word": pa.array(toks, pa.string()),
                "n": pa.array([c[t] for t in toks], pa.int64()),
            }
        )

    exact = (
        ds.map_batches(exact_kernel, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n"))
        .take_all()
    )
    exact_ranked = sorted(exact, key=lambda r: (-r["sum(n)"], r["word"]))[:k]
    certified = (
        len(exact_ranked) == k
        and exact_ranked[-1]["sum(n)"] > threshold + total_bound
    ) or (
        # exhaustive candidates: nothing was dropped anywhere AND every
        # surviving word is in the candidate set
        total_bound == 0 and len(ranked) <= k + slack
    )
    if not certified:
        # bound too loose for this data/block_k: exact fallback, same contract
        return top_words(sf_dir, k)
    return pa.table(
        {
            "word": pa.array([r["word"] for r in exact_ranked], pa.string()),
            "n": pa.array([r["sum(n)"] for r in exact_ranked], pa.int64()),
        }
    )


def distinct_counts_hll(sf_dir: str):
    """HyperLogLog approximate COUNT(DISTINCT) over three columns of
    different cardinality regimes. Deterministic (fixed hash, p=14), so
    golden-pinned; accuracy vs exact is separately gated in
    tests/test_sketches.py (~0.8% expected error at p=14)."""
    import ray.data

    from ..stages.sketches import hll_count_distinct

    specs = [
        ("events", "user_id"),
        ("documents", "lang"),
        ("lineitem", "l_partkey"),
    ]
    names, ests = [], []
    for table, col in specs:
        ds = ray.data.read_parquet(
            os.path.join(sf_dir, f"{table}.parquet"), columns=[col]
        )
        names.append(f"{table}.{col}")
        ests.append(int(round(hll_count_distinct(ds, col))))
    return pa.table(
        {
            "column": pa.array(names, pa.string()),
            "approx_distinct": pa.array(ests, pa.int64()),
        }
    )


def multimodal_real_decode(sf_dir: str):
    """REAL image decode (PPM/BMP via core/media_codecs, fake=False) over
    deterministic synthetic payloads: exact dims + the first feature value
    (red-channel mean, rounded for a stable pin)."""
    import numpy as np
    import ray.data

    from ..stages.multimodal import decode_images, synthetic_real_media_table

    tbl = synthetic_real_media_table(150, seed=42)
    imgs = tbl.filter(np.isin(np.array(tbl.column("kind")), ["image"]))
    out = decode_images(ray.data.from_arrow(imgs), fake=False)

    def finish(b: pa.Table) -> pa.Table:
        feat0 = pa.array(
            [round(float(f[0]), 4) for f in b.column("features").to_pylist()],
            pa.float64(),
        )
        return b.select(
            ["media_id", "height", "width", "channels"]
        ).append_column("red_mean", feat0)

    return out.map_batches(finish, batch_format="pyarrow")


def audio_mfcc_frames(sf_dir: str):
    """REAL WAV PCM decode + numpy MFCC (fake=False) over deterministic sine
    clips: per-frame rows with the c0 (log-energy) coefficient rounded for a
    stable pin. Frame counts are a pure function of each clip's duration."""
    import numpy as np
    import ray.data

    from ..stages.multimodal import audio_features, synthetic_real_media_table

    tbl = synthetic_real_media_table(150, seed=42)
    auds = tbl.filter(np.isin(np.array(tbl.column("kind")), ["audio"]))
    out = audio_features(ray.data.from_arrow(auds), hop_sec=0.25, fake=False)

    def finish(b: pa.Table) -> pa.Table:
        c0 = pa.array(
            [round(float(v[0]), 3) for v in b.column("mfcc").to_pylist()],
            pa.float64(),
        )
        return b.select(["media_id", "frame_idx"]).append_column("c0", c0)

    return out.map_batches(finish, batch_format="pyarrow")


def kg_clusters(sf_dir: str):
    """Top canonical clusters by (doc_count, mention_count) over CC pages."""
    from ..stages import canonicalize as canon
    from ..stages.corpus_stats import cluster_importance, rank_clusters
    from ..stages.extract import extract_docs, mentions_table

    docs = extract_docs(_synthetic_pages(sf_dir))
    mentions = mentions_table(docs).materialize()
    surfaces = canon.collect_surfaces(
        canon.surface_groups(mentions, type_col="label", surface_col="norm_surface")
    )
    edges = canon.fuzzy_edges(surfaces)
    mapping = canon.build_canonical_map(surfaces, edges)
    with_canon = canon.attach_canonical(mentions, mapping, type_col="label")
    return rank_clusters(cluster_importance(with_canon), max_clusters=25)


def eval_ner_modes(sf_dir: str):
    """SemEval Strict/Exact/Partial/Type eval of the zero-shot NER stage
    against the stacked-NER mentions, distributed per document (J4 analog).

    Pattern: tag + union the two mention sets, co-locate per url with one
    groupby shuffle, run the greedy per-doc matcher in map_groups, micro-sum
    (tp, fp, fn) per mode, then the tiny P/R/F1 table on the driver."""
    from ray.data.aggregate import Sum

    from ..stages.extract import extract_docs, mentions_table
    from ..stages.model_ner import zero_shot_ner
    from .eval import MODES, _prf, mode_counts

    docs = extract_docs(_synthetic_pages(sf_dir), with_text=True).materialize()

    def _tag_gold(b: pa.Table) -> pa.Table:
        mask = pc.is_in(b.column("label"), value_set=pa.array(["PER", "ORG", "LOC"]))
        b = b.filter(mask)
        return pa.table(
            {
                "url": b.column("url"),
                "start": b.column("start"),
                "end": b.column("end"),
                "label": b.column("label"),
                "src": pa.array(["g"] * b.num_rows, pa.string()),
            }
        )

    gold = mentions_table(docs).map_batches(_tag_gold, batch_format="pyarrow")
    pred = zero_shot_ner(
        docs.map_batches(
            lambda b: b.select(["url", "text"]), batch_format="pyarrow"
        ),
        labels=["PER", "ORG", "LOC"],
        fake=True,
    ).map_batches(
        lambda b: pa.table(
            {
                "url": b.column("url"),
                "start": b.column("start"),
                "end": b.column("end"),
                "label": b.column("label"),
                "src": pa.array(["p"] * b.num_rows, pa.string()),
            }
        ),
        batch_format="pyarrow",
    )

    # coarse hash partitioning (canonicalize.py idiom), NOT one Ray group per
    # url: the per-doc matcher runs per url INSIDE each partition and the
    # (tp, fp, fn) micro-sums commute, so wall time is partition-count-bound
    # even at millions of documents
    num_partitions = 256

    def _part_col(b: pa.Table) -> pa.Table:
        import zlib

        parts = [
            zlib.crc32(u.encode("utf-8")) % num_partitions
            for u in b.column("url").to_pylist()
        ]
        return b.append_column("part", pa.array(parts, pa.int32()))

    def _partition_counts(group: pa.Table) -> pa.Table:
        from collections import defaultdict

        by_url: dict[str, tuple[list, list]] = defaultdict(lambda: ([], []))
        for r in group.to_pylist():
            by_url[r["url"]][0 if r["src"] == "g" else 1].append(r)
        totals = {mode: [0, 0, 0] for mode in MODES}
        for url in by_url:
            g, p = by_url[url]
            # deterministic in-doc order (position-sorted, like the extractors)
            g.sort(key=lambda r: (r["start"], r["end"], r["label"]))
            p.sort(key=lambda r: (r["start"], r["end"], r["label"]))
            for mode in MODES:
                tp, fp, fn = mode_counts(p, g, mode)
                acc = totals[mode]
                acc[0] += tp
                acc[1] += fp
                acc[2] += fn
        return pa.table(
            {
                "mode": pa.array(list(MODES), pa.string()),
                "tp": pa.array([totals[m][0] for m in MODES], pa.int64()),
                "fp": pa.array([totals[m][1] for m in MODES], pa.int64()),
                "fn": pa.array([totals[m][2] for m in MODES], pa.int64()),
            }
        )

    counts = (
        gold.union(pred)
        .map_batches(_part_col, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_partition_counts, batch_format="pyarrow")
        .groupby("mode")
        .aggregate(Sum("tp"), Sum("fp"), Sum("fn"))
    )
    import ray

    tbl = pa.concat_tables(
        [ray.get(r) for r in counts.to_arrow_refs()], promote_options="permissive"
    )
    rows = sorted(
        zip(
            tbl.column("mode").to_pylist(),
            tbl.column("sum(tp)").to_pylist(),
            tbl.column("sum(fp)").to_pylist(),
            tbl.column("sum(fn)").to_pylist(),
        )
    )
    out = {"mode": [], "precision": [], "recall": [], "f1": [],
           "tp": [], "fp": [], "fn": []}
    for mode, tp, fp, fn in rows:
        p, r, f = _prf(tp, fp, fn)
        out["mode"].append(mode)
        out["precision"].append(round(p, 6))
        out["recall"].append(round(r, 6))
        out["f1"].append(round(f, 6))
        out["tp"].append(tp)
        out["fp"].append(fp)
        out["fn"].append(fn)
    import pandas as pd

    return pd.DataFrame(out)


def bert_ner_mentions(sf_dir: str):
    """M2 BERT token-classification stage over CC-style pages (rows-only;
    deterministic fake scorer — no ONNX runtime in this container; the
    real encode/decode path is stub-session-tested)."""
    from ..stages.extract import extract_docs
    from ..stages.model_ner import bert_ner

    docs = extract_docs(_synthetic_pages(sf_dir), with_text=True)
    out = bert_ner(
        docs.map_batches(
            lambda b: b.select(["url", "text"]), batch_format="pyarrow"
        ),
        fake=True,
    )
    return out.select_columns(["url", "label", "start", "end"])


def coref_quality(sf_dir: str):
    """Full coref-metric suite (B3, MUC, CEAFe, CEAFm, LEA, BLANC, CoNLL-F1)
    comparing the C2 SimpleCorefResolver track partition against the C1
    rule-based partition, per document, distributed.

    Pattern: one map_batches pass runs BOTH resolvers per doc and emits one
    metric row per (doc, metric); a Mean aggregate macro-averages across the
    corpus. Deterministic (both resolvers are)."""
    import pandas as pd
    import ray
    from ray.data.aggregate import Mean

    def kernel(b: pa.Table) -> pa.Table:
        from ..core.document import process_document
        from ..functions.coref_metrics import (
            b_cubed,
            blanc,
            ceaf_e,
            ceaf_m,
            conll_f1,
            lea,
            muc,
        )

        out_metric, out_val = [], []
        for url, html in zip(
            b.column("url").to_pylist(), b.column("html").to_pylist()
        ):
            raw = html.decode("utf-8", "replace") if isinstance(html, (bytes, bytearray)) else html
            r1 = process_document(url, raw)  # C1
            r2 = process_document(url, raw, coref_strategy="simple")  # C2

            def chains(res):
                by: dict[int, list] = {}
                for m in res.mentions:
                    if m.track_id >= 0:
                        by.setdefault(m.track_id, []).append((m.start, m.end))
                return [sorted(v) for v in sorted(by.values())]

            c1, c2 = chains(r1), chains(r2)
            a1 = {m: i for i, ch in enumerate(c1) for m in ch}
            a2 = {m: i for i, ch in enumerate(c2) for m in ch}
            vals = {
                "b3_f1": b_cubed(a2, a1)[2],
                "muc_f1": muc(a2, a1)[2],
                "ceaf_e_f1": ceaf_e(c2, c1)[2],
                "ceaf_m_f1": ceaf_m(c2, c1)[2],
                "lea_f1": lea(c2, c1)[2],
                "blanc_f1": blanc(c2, c1)[2],
                "conll_f1": conll_f1(c2, c1),
            }
            for k, v in vals.items():
                out_metric.append(k)
                out_val.append(float(v))
        return pa.table(
            {
                "metric": pa.array(out_metric, pa.string()),
                "value": pa.array(out_val, pa.float64()),
            }
        )

    pages = _synthetic_pages(sf_dir)
    agg = (
        pages.map_batches(kernel, batch_format="pyarrow", batch_size=32)
        .groupby("metric")
        .aggregate(Mean("value"))
    )
    tbl = pa.concat_tables(
        [ray.get(r) for r in agg.to_arrow_refs()], promote_options="permissive"
    )
    rows = sorted(
        zip(tbl.column("metric").to_pylist(), tbl.column("mean(value)").to_pylist())
    )
    return pd.DataFrame(
        {
            "metric": [r[0] for r in rows],
            "macro_avg": [round(r[1], 6) for r in rows],
        }
    )


def minhash_dedup_keep(sf_dir: str):
    """Connected-component dedup decision list: (doc_id, keep_id) for every
    doc in a near-dup cluster (rows-only)."""
    from ..stages.dedup import minhash_dedup_ids

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return minhash_dedup_ids(ds, threshold=0.8)


def kg_communities(sf_dir: str):
    """Communities over the canonical edge graph (strata C7).

    Below LEIDEN_DRIVER_MAX edges: driver Leiden (reference-quality
    modularity local moving). Above: distributed weighted label propagation —
    the edge list is aggregated, joined, and scored entirely as Ray Data
    operations; the driver only ever holds the final (node, community)
    result."""
    import pandas as pd
    import ray.data

    from ..pipelines.kg import run_kg_pipeline
    from ..stages.communities import (
        LEIDEN_DRIVER_MAX,
        communities_table,
        label_propagation,
    )

    pages = _pages_dir_for(sf_dir)
    out = pages + "_kg"
    run_kg_pipeline(pages, out)
    edge_files = sorted(
        glob.glob(os.path.join(out, "edges", "part=*", "data.parquet"))
    )
    edges_ds = ray.data.read_parquet(edge_files, columns=["subj_node", "obj_node"])
    n_edges = edges_ds.count()
    if n_edges <= LEIDEN_DRIVER_MAX:
        import duckdb

        from ..core import leiden

        con = duckdb.connect()
        edges_tbl = con.execute(
            f"SELECT subj_node, obj_node FROM read_parquet('{out}/edges/part=*/data.parquet')"
        ).fetch_arrow_table()
        pairs = {}
        for u, v in zip(
            edges_tbl.column("subj_node").to_pylist(),
            edges_tbl.column("obj_node").to_pylist(),
        ):
            if u != v:
                key = (u, v) if u < v else (v, u)
                pairs[key] = pairs.get(key, 0.0) + 1.0
        edge_list = [(u, v, w) for (u, v), w in pairs.items()]
        comm = leiden.cluster(edge_list, resolution=1.0, seed=42)
        rows = sorted(comm.items())
        return pd.DataFrame(
            {"node_id": [r[0] for r in rows], "community": [r[1] for r in rows]}
        )
    labels = label_propagation(edges_ds, src_col="subj_node", dst_col="obj_node")
    tbl = communities_table(labels)
    return pd.DataFrame(
        {
            "node_id": tbl.column("node_id").to_pylist(),
            "community": tbl.column("community").to_pylist(),
        }
    )


def kg_pagerank(sf_dir: str):
    """PageRank centrality over the canonical KG edge graph.

    Full pipeline -> distributed PageRank (stages/graph_analytics.py): the
    edge Dataset stays in the cluster for all 10 iterations; only the rank
    vector moves. The SQL oracle runs an independent 10-iteration unrolled
    implementation over the pinned golden edges — rounded ranks match
    bit-exactly (same damping/dangling semantics, 6-dp contract)."""
    import ray.data

    from ..pipelines.kg import run_kg_pipeline
    from ..stages.graph_analytics import pagerank

    pages = _pages_dir_for(sf_dir)
    out = pages + "_kg"
    run_kg_pipeline(pages, out)
    edge_files = sorted(
        glob.glob(os.path.join(out, "edges", "part=*", "data.parquet"))
    )
    edges = ray.data.read_parquet(edge_files, columns=["subj_node", "obj_node"])
    pr = pagerank(edges)
    if not isinstance(pr, pa.Table):
        import ray

        pr = pa.concat_tables(
            [ray.get(r) for r in pr.to_arrow_refs()], promote_options="permissive"
        )
    return pr.take(pc.sort_indices(pr, sort_keys=[("node_id", "ascending")]))


def kg_degree_stats(sf_dir: str):
    """Per-node in/out degree over the DISTINCT canonical edge set."""
    import ray.data

    from ..pipelines.kg import run_kg_pipeline
    from ..stages.graph_analytics import degree_stats

    pages = _pages_dir_for(sf_dir)
    out = pages + "_kg"
    run_kg_pipeline(pages, out)
    edge_files = sorted(
        glob.glob(os.path.join(out, "edges", "part=*", "data.parquet"))
    )
    edges = ray.data.read_parquet(edge_files, columns=["subj_node", "obj_node"])
    return degree_stats(edges)


def kg_components(sf_dir: str):
    """Weakly-connected components over the canonical KG edge graph.

    Surfaces the 10M-key-proven min-label-propagation machinery
    (stages/components.py) as a first-class analytic: (node_id, component,
    component_size), component = min node id. The SQL oracle runs an
    independent 12-round unrolled min-label propagation over the pinned
    golden edges (the graph converges in 7 rounds; the Ray side iterates
    to fixpoint with pointer doubling, so both reach the same labels)."""
    import ray
    import ray.data

    from ..pipelines.kg import run_kg_pipeline
    from ..stages.graph_analytics import connected_components

    pages = _pages_dir_for(sf_dir)
    out = pages + "_kg"
    run_kg_pipeline(pages, out)
    edge_files = sorted(
        glob.glob(os.path.join(out, "edges", "part=*", "data.parquet"))
    )
    edges = ray.data.read_parquet(edge_files, columns=["subj_node", "obj_node"])
    cc = connected_components(edges)
    tbl = pa.concat_tables(
        [ray.get(r) for r in cc.to_arrow_refs()], promote_options="permissive"
    )
    return tbl.take(pc.sort_indices(tbl, sort_keys=[("node_id", "ascending")]))


def ngram_jaccard_pairs(sf_dir: str):
    """Exact char-3-gram Jaccard over consecutive-doc candidate pairs.

    Oracle-gates the dedup verification scorer
    (stages/dedup.verify_pairs_ngram_jaccard) itself: the SQL oracle
    recomputes the same 3-gram sets with substr/generate_series and the
    same set-Jaccard in pure DuckDB. Consecutive (i, i+1) pairs keep the
    pair list linear in the corpus (a deterministic stand-in for an LSH
    candidate list)."""
    from ..stages.dedup import verify_pairs_ngram_jaccard

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def _pairs(b: pa.Table) -> pa.Table:
        # candidate (i, i+1) for every OBSERVED doc id; pairs whose id_b does
        # not exist in the corpus are dropped by the verify step on BOTH
        # dispatch paths (inner join / broadcast existence filter), exactly
        # mirroring the SQL oracle's `JOIN d b ON b.doc_id = a.doc_id + 1` —
        # no contiguity or 0-based assumption on doc_id
        return pa.table(
            {
                "id_a": b.column("doc_id"),
                "id_b": pc.add(b.column("doc_id"), 1),
            }
        )

    pairs = ds.map_batches(_pairs, batch_format="pyarrow")
    out = verify_pairs_ngram_jaccard(pairs=pairs, ds=ds, text_col="text", id_col="doc_id")
    if not isinstance(out, pa.Table):
        import ray

        out = pa.concat_tables(
            [ray.get(r) for r in out.to_arrow_refs()], promote_options="permissive"
        )
    out = out.set_column(
        out.column_names.index("jaccard"), "jaccard",
        pc.round(out.column("jaccard"), ndigits=6),
    )
    return out.take(pc.sort_indices(out, sort_keys=[("id_a", "ascending")]))
