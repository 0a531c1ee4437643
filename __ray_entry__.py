"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB
(row-count + schema + order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing here
calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    """Flagship KG pipeline slice on sf0.001: documents -> extract -> triples."""
    from anno_ray.functions import docqueries

    return docqueries.kg_triples("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from anno_ray.functions import docqueries as dq
    from anno_ray.functions import relational as rel

    return {
        # --- generic relational operators (SQL-oracled) ---
        "agg_lineitem_pricing": rel.agg_lineitem_pricing,
        "join_orders_customer_segment": rel.join_orders_customer_segment,
        "topk_parts_by_price": rel.topk_parts_by_price,
        "filter_orders_recent": rel.filter_orders_recent,
        "supplier_nation_region": rel.supplier_nation_region,
        "events_by_type": rel.events_by_type,
        "events_daily_topusers": rel.events_daily_topusers,
        "orders_priority_customers": rel.orders_priority_customers,
        "union_names_count": rel.union_names_count,
        "customers_without_orders": rel.customers_without_orders,
        "events_sessionize": rel.events_sessionize,
        "events_tumbling_window": rel.events_tumbling_window,
        "lineitem_price_quantiles": rel.lineitem_price_quantiles,
        "events_value_median_by_type": rel.events_value_median_by_type,
        "top_customer_per_nation": rel.top_customer_per_nation,
        "lineitem_heavy_parts": rel.lineitem_heavy_parts,
        "events_with_prev": rel.events_with_prev,
        "events_asof_orders": rel.events_asof_orders,
        # --- documents/text operators (SQL-oracled) ---
        "docs_by_lang": dq.docs_by_lang,
        "doc_token_stats": dq.doc_token_stats,
        "dedup_docs_exact": dq.dedup_docs_exact,
        "top_words": dq.top_words,
        "top_words_sketch": dq.top_words_sketch,
        "docs_containing_word": dq.docs_containing_word,
        # --- similarity / dedup / analysis (non-SQL -> rows-only) ---
        "ann_cosine_topk": dq.ann_cosine_topk,
        "ann_lsh_topk": dq.ann_lsh_topk,
        "ann_ivf_topk": dq.ann_ivf_topk,
        "embedding_near_dups": dq.embedding_near_dups,
        "minhash_near_dups": dq.minhash_near_dups,
        "simhash_near_dups": dq.simhash_near_dups,
        "lang_detect_distribution": dq.lang_detect_distribution,
        "quality_by_lang": dq.quality_by_lang,
        "doc_fingerprints": dq.doc_fingerprints,
        "multimodal_decode": dq.multimodal_decode,
        "multimodal_real_decode": dq.multimodal_real_decode,
        "distinct_counts_hll": dq.distinct_counts_hll,
        "audio_mfcc_frames": dq.audio_mfcc_frames,
        "eval_ner_modes": dq.eval_ner_modes,
        "bert_ner_mentions": dq.bert_ner_mentions,
        "coref_quality": dq.coref_quality,
        "minhash_dedup_keep": dq.minhash_dedup_keep,
        # --- KG pipeline (non-SQL -> rows-only) ---
        "kg_mentions": dq.kg_mentions,
        "kg_triples": dq.kg_triples,
        "kg_nodes": dq.kg_nodes,
        "kg_edges": dq.kg_edges,
        "kg_clusters": dq.kg_clusters,
        "kg_communities": dq.kg_communities,
        "kg_pagerank": dq.kg_pagerank,
        "kg_degree_stats": dq.kg_degree_stats,
        "kg_components": dq.kg_components,
        "ngram_jaccard_pairs": dq.ngram_jaccard_pairs,
    }


def _pagerank_sql(edges_source: str, damping: float = 0.85, iterations: int = 10) -> str:
    """Independent 10-iteration PageRank in pure SQL (unrolled — aggregation
    inside a recursive CTE is not portable), mirroring
    stages/graph_analytics.pagerank semantics exactly: DISTINCT edges,
    r0 = 1/N, r_{k+1} = (1-d)/N + d*(in-contribs + dangling/N), output
    N-normalized and rounded to 6 dp (the shared precision contract; the two
    implementations match bit-exactly after rounding). Every rk is
    MATERIALIZED so the optimizer cannot exponentially inline the chain."""
    d = repr(damping)
    head = f"""
WITH e AS MATERIALIZED (SELECT DISTINCT subj_node AS src, obj_node AS dst FROM {edges_source}),
nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
deg AS MATERIALIZED (SELECT src, CAST(COUNT(*) AS DOUBLE) AS outdeg FROM e GROUP BY src),
nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
r0 AS MATERIALIZED (SELECT node, 1.0/(SELECT n FROM nn) AS r FROM nodes)"""
    parts = [head]
    prev = "r0"
    for k in range(1, iterations + 1):
        cur = f"r{k}"
        parts.append(f""",
{cur} AS MATERIALIZED (
  SELECT nd.node,
         (1-{d})/(SELECT n FROM nn)
         + {d} * (COALESCE(c.contrib, 0)
                  + (SELECT COALESCE(SUM(p.r),0) FROM {prev} p
                     LEFT JOIN deg dg ON p.node=dg.src WHERE dg.src IS NULL)
                    /(SELECT n FROM nn)) AS r
  FROM nodes nd
  LEFT JOIN (SELECT e.dst AS node, SUM(p.r / dg.outdeg) AS contrib
             FROM e JOIN {prev} p ON e.src = p.node JOIN deg dg ON e.src = dg.src
             GROUP BY e.dst) c ON nd.node = c.node)""")
        prev = cur
    parts.append(
        f"""
SELECT node AS node_id, ROUND(r * (SELECT n FROM nn), 6) AS pr_norm
FROM {prev} ORDER BY node_id"""
    )
    return "".join(parts)


def _components_sql(edges_source: str, rounds: int = 12) -> str:
    """Independent unrolled min-label propagation in pure SQL: l0 = own id;
    each round takes the min over the symmetric neighborhood. The pinned
    golden graph converges in 7 rounds; 12 leaves margin. The Ray side
    (stages/components.py) iterates to fixpoint with pointer doubling, so
    both reach the identical per-component min-id labels. The final SELECT
    cross-joins a 1-row convergence check that calls DuckDB's error() if any
    label still changed in the last round — a graph with propagation
    diameter > ``rounds`` fails the oracle loudly instead of silently
    emitting wrong labels."""
    head = f"""
WITH e AS MATERIALIZED (SELECT DISTINCT subj_node AS src, obj_node AS dst FROM {edges_source}),
sym AS MATERIALIZED (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS lab FROM sym)"""
    parts = [head]
    prev = "l0"
    for k in range(1, rounds + 1):
        cur = f"l{k}"
        parts.append(f""",
{cur} AS MATERIALIZED (
  SELECT n.node, LEAST(n.lab, COALESCE(m.mn, n.lab)) AS lab
  FROM {prev} n
  LEFT JOIN (SELECT s.dst AS node, MIN(p.lab) AS mn
             FROM sym s JOIN {prev} p ON s.src = p.node
             GROUP BY s.dst) m ON n.node = m.node)""")
        prev = cur
    second_last = f"l{rounds - 1}"
    parts.append(f""",
conv AS MATERIALIZED (
  SELECT CASE WHEN (SELECT COUNT(*) FROM {prev} a JOIN {second_last} b
                    ON a.node = b.node AND a.lab <> b.lab) > 0
              THEN error('components oracle: not converged in {rounds} rounds')
              ELSE 0 END AS ok)""")
    parts.append(
        f"""
SELECT node AS node_id, lab AS component,
       COUNT(*) OVER (PARTITION BY lab) AS component_size
FROM {prev}, conv ORDER BY node_id"""
    )
    return "".join(parts)


def _ngram_jaccard_sql() -> str:
    """Independent exact char-3-gram Jaccard in pure SQL, mirroring
    core ``ngram_jaccard`` exactly: grams are substr(text, i, 3) for
    i in 1..max(len-2, 1) (so a doc shorter than 3 chars contributes its
    whole text as one gram, and an empty text the empty gram — identical
    to the Python slice semantics), DISTINCT per doc, set Jaccard,
    rounded to 6 dp on both sides."""
    return """
        WITH d AS (SELECT doc_id, text FROM documents),
        g AS (SELECT DISTINCT doc_id, substr(text, CAST(i AS BIGINT), 3) AS gram
              FROM (SELECT doc_id, text,
                           unnest(generate_series(1, greatest(length(text) - 2, 1))) AS i
                    FROM d)),
        cnt AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY doc_id),
        pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
                  FROM d a JOIN d b ON b.doc_id = a.doc_id + 1),
        inter AS (SELECT p.id_a, p.id_b, COUNT(*) AS m
                  FROM pairs p
                  JOIN g x ON x.doc_id = p.id_a
                  JOIN g y ON y.doc_id = p.id_b AND y.gram = x.gram
                  GROUP BY p.id_a, p.id_b)
        SELECT p.id_a, p.id_b,
               ROUND(CAST(COALESCE(i.m, 0) AS DOUBLE)
                     / (ca.n + cb.n - COALESCE(i.m, 0)), 6) AS jaccard
        FROM pairs p
        JOIN cnt ca ON ca.doc_id = p.id_a
        JOIN cnt cb ON cb.doc_id = p.id_b
        LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b
    """


def _degree_stats_sql(edges_source: str) -> str:
    return f"""
        WITH e AS (SELECT DISTINCT subj_node AS src, obj_node AS dst
                   FROM {edges_source}),
        od AS (SELECT src AS node, COUNT(*) AS o FROM e GROUP BY src),
        idg AS (SELECT dst AS node, COUNT(*) AS i FROM e GROUP BY dst),
        nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)
        SELECT n.node AS node_id, COALESCE(od.o, 0) AS out_deg,
               COALESCE(idg.i, 0) AS in_deg
        FROM nodes n LEFT JOIN od ON n.node = od.node
        LEFT JOIN idg ON n.node = idg.node
    """


def _quality_by_lang_sql() -> str:
    from anno_ray.stages.text_analysis import _STOPWORDS

    stoplist = ", ".join(f"'{w}'" for w in sorted(_STOPWORDS))
    return f"""
        WITH f AS (
          SELECT lang, text,
            length(text) AS n_chars,
            length(regexp_extract_all(text, '\\S+')) AS n_words,
            length(regexp_extract_all(text, '[^\\p{{L}}\\p{{N}}_\\s]')) AS n_punct,
            COALESCE(list_sum(list_transform(
                regexp_extract_all(text, '\\S+'), w -> length(w))), 0) AS sum_wl,
            length(list_filter(regexp_extract_all(text, '\\S+'),
                w -> trim(lower(w), '.,!?;:''"') IN ({stoplist}))) AS n_stop
          FROM documents
        ), r AS (
          SELECT lang,
            CASE WHEN n_chars = 0 THEN 0.0 ELSE
              round_even(
                0.35 * (LEAST(1.0, n_words / 50.0)
                        * (CASE WHEN n_words < 5000 THEN 1.0 ELSE 0.5 END))
              + 0.3 * LEAST(1.0, (CASE WHEN n_words > 0
                        THEN CAST(n_stop AS DOUBLE) / n_words ELSE 0.0 END) / 0.25)
              + 0.2 * (CASE WHEN CAST(n_punct AS DOUBLE) / n_chars < 0.2 THEN 1.0
                       ELSE GREATEST(0.0, 1.0 - (CAST(n_punct AS DOUBLE) / n_chars - 0.2) * 4) END)
              + 0.15 * (CASE WHEN n_words > 0
                        AND CAST(sum_wl AS DOUBLE) / n_words BETWEEN 3.0 AND 10.0
                        THEN 1.0 ELSE 0.5 END), 4)
            END AS score
          FROM f
        )
        SELECT lang, ROUND(AVG(score), 6) AS avg_quality FROM r GROUP BY lang
    """


def consistency_sql() -> dict[str, str]:
    """Cross-table consistency oracles over the pinned KG goldens.

    The four kg_* chain goldens are determinism pins (readback of the
    pipeline's own double-checked output); these queries upgrade them to
    SEMANTIC checks by asserting invariants that must hold BETWEEN tables
    by construction (pipelines/kg.py NodeRows/EdgeRows):

    - mention conservation: kg_nodes.mentions_count sums to exactly the
      non-PRON mention count (NodeRows skips pronouns — they are track
      members, not graph nodes);
    - edges = triples + endpoints: the (subj, pred, obj, conf, source, url)
      MULTISETS of kg_edges and kg_triples are identical (EXCEPT ALL both
      ways) — the materialize map-back may never drop, duplicate, or
      mutate a triple;
    - endpoint referential integrity: every kg_edges endpoint resolves to a
      kg_nodes row, except the two documented literal families — ``text:``
      (triple arguments matching no mention cluster) and ``coref_`` ids of
      pronoun-only clusters (no non-PRON mention exists to seed a node row).
      All structured-value endpoints (date:/money:/email:/...) and
      kb-linked endpoints must be present.

    Each query returns a single row ``(check, ok)``; ok must be true.
    tools/check_oracles.py runs these after the per-query gate, and
    tests/test_kg_cross_table.py pins them in the suite."""
    gold = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tests", "golden", "kg_oracle"
    )
    m = f"read_parquet('{gold}/kg_mentions.parquet')"
    n = f"read_parquet('{gold}/kg_nodes.parquet')"
    e = f"read_parquet('{gold}/kg_edges.parquet')"
    t = f"read_parquet('{gold}/kg_triples.parquet')"
    return {
        "nodes_mentions_conservation": f"""
            SELECT 'nodes_mentions_conservation' AS check,
                   (SELECT COALESCE(SUM(mentions_count), 0) FROM {n})
                   = (SELECT COUNT(*) FROM {m} WHERE label <> 'PRON') AS ok
        """,
        "edges_triples_multiset_equal": f"""
            SELECT 'edges_triples_multiset_equal' AS check,
                   (SELECT COUNT(*) FROM
                     (SELECT subj, pred, obj, conf, source, url FROM {e}
                      EXCEPT ALL
                      SELECT subj, pred, obj, conf, source, url FROM {t})) = 0
                   AND
                   (SELECT COUNT(*) FROM
                     (SELECT subj, pred, obj, conf, source, url FROM {t}
                      EXCEPT ALL
                      SELECT subj, pred, obj, conf, source, url FROM {e})) = 0
                   AND (SELECT COUNT(*) FROM {e}) = (SELECT COUNT(*) FROM {t})
                   AS ok
        """,
        "edge_endpoints_resolve_to_nodes": f"""
            SELECT 'edge_endpoints_resolve_to_nodes' AS check,
                   (SELECT COUNT(*) FROM
                     (SELECT DISTINCT x FROM
                        (SELECT subj_node AS x FROM {e}
                         UNION ALL SELECT obj_node FROM {e})
                      WHERE x NOT LIKE 'text:%' AND x NOT LIKE 'coref_%')
                    WHERE x NOT IN (SELECT node_id FROM {n})) = 0
                   AS ok
        """,
    }


def oracle_sql() -> dict[str, str]:
    # End-to-end KG goldens: the per-operator stages (HTML extract, heuristic
    # NER, events, relations, coref) are each verified char/span-exact against
    # the COMPILED reference harnesses (tools/build_ref_harnesses.py); the
    # full verified chain over the deterministic seed-42 sf0.01 corpus is
    # pinned once as parquet (tools/make_kg_goldens.py) and compared here as
    # a full row+schema+hash gate.
    gold = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tests", "golden", "kg_oracle"
    )
    gold_op = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tests", "golden", "op_oracle"
    )
    return {
        "agg_lineitem_pricing": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_price,
                   ROUND(AVG(l_discount), 6) AS avg_disc,
                   COUNT(*) AS cnt
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "join_orders_customer_segment": """
            SELECT c.c_mktsegment,
                   ROUND(SUM(o.o_totalprice), 2) AS revenue,
                   COUNT(*) AS n_orders
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment
        """,
        "topk_parts_by_price": """
            SELECT p_partkey, p_name, p_retailprice FROM part
            ORDER BY p_retailprice DESC, p_partkey ASC LIMIT 10
        """,
        "filter_orders_recent": """
            SELECT ROUND(SUM(o_totalprice), 2) AS total, COUNT(*) AS n
            FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        """,
        "supplier_nation_region": """
            SELECT r.r_name,
                   COUNT(*) AS n_suppliers,
                   ROUND(SUM(s.s_acctbal), 2) AS total_bal
            FROM supplier s
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY r.r_name
        """,
        "events_by_type": """
            SELECT event_type, COUNT(*) AS n,
                   ROUND(SUM(value), 4) AS total_value,
                   ROUND(AVG(value), 4) AS avg_value
            FROM events GROUP BY event_type
        """,
        "events_daily_topusers": """
            SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
                   COUNT(*) AS n_events, ROUND(SUM(value), 4) AS day_value
            FROM events GROUP BY user_id, day
            ORDER BY n_events DESC, user_id ASC, day ASC LIMIT 20
        """,
        "orders_priority_customers": """
            SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_customers
            FROM orders GROUP BY o_orderpriority
        """,
        "union_names_count": """
            SELECT COUNT(*) AS n_names FROM (
                SELECT c_name AS name FROM customer
                UNION ALL SELECT s_name FROM supplier
            )
        """,
        "customers_without_orders": """
            SELECT COUNT(*) AS n_customers FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        """,
        "events_sessionize": """
            SELECT user_id,
                   COUNT(DISTINCT session_id) AS n_sessions,
                   MAX(session_size) AS max_session_events
            FROM (
                SELECT user_id, session_id, COUNT(*) AS session_size
                FROM (
                    SELECT user_id,
                           SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS session_id
                    FROM (
                        SELECT user_id, ts,
                               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                         > INTERVAL 30 MINUTE
                                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                                    THEN 1 ELSE 0 END AS is_new
                        FROM events
                    )
                ) GROUP BY user_id, session_id
            ) GROUP BY user_id
        """,
        "lineitem_price_quantiles": """
            SELECT UNNEST([0.25, 0.5, 0.9, 0.99]) AS q,
                   ROUND(UNNEST(vals), 4) AS value
            FROM (SELECT quantile_cont(
                      l_extendedprice, [0.25, 0.5, 0.9, 0.99]) AS vals
                  FROM lineitem)
        """,
        "events_value_median_by_type": """
            SELECT event_type, ROUND(median(value), 4) AS median_value
            FROM events GROUP BY event_type
        """,
        "events_tumbling_window": """
            SELECT make_timestamp((epoch_us(ts) // 21600000000) * 21600000000)
                       AS window_start,
                   event_type,
                   ROUND(SUM(value), 2) AS total_value,
                   COUNT(*) AS n_events
            FROM events
            GROUP BY 1, 2
        """,
        "top_customer_per_nation": """
            SELECT n.n_name, c.c_custkey, c.c_name,
                   ROUND(c.c_acctbal, 2) AS top_acctbal
            FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY c.c_nationkey
                ORDER BY c.c_acctbal DESC, c.c_custkey ASC
            ) = 1
        """,
        "lineitem_heavy_parts": """
            SELECT l_partkey, COUNT(*) AS n_lines,
                   ROUND(SUM(l_quantity), 2) AS total_qty
            FROM lineitem GROUP BY l_partkey
            HAVING COUNT(*) >= 40
        """,
        "events_with_prev": """
            SELECT user_id, ts, ROUND(value, 4) AS value,
                   ROUND(LAG(value) OVER (
                       PARTITION BY user_id ORDER BY ts, value
                   ), 4) AS prev_value
            FROM events
        """,
        "events_asof_orders": """
            SELECT e.user_id, e.ts,
                   o.o_orderdate AS last_order_date,
                   o.day_total AS last_order_total
            FROM events e ASOF JOIN (
                SELECT o_custkey, o_orderdate,
                       ROUND(SUM(o_totalprice), 2) AS day_total
                FROM orders GROUP BY o_custkey, o_orderdate
            ) o ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
        """,
        "docs_by_lang": """
            SELECT lang, COUNT(*) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS total_chars
            FROM documents GROUP BY lang
        """,
        "doc_token_stats": """
            SELECT lang,
                   CAST(SUM(LENGTH(regexp_extract_all(text, '\\S+'))) AS BIGINT)
                       AS total_tokens,
                   COUNT(*) AS n_docs
            FROM documents GROUP BY lang
        """,
        "dedup_docs_exact": """
            SELECT COUNT(*) AS n_docs, COUNT(DISTINCT text) AS n_distinct
            FROM documents
        """,
        "top_words": """
            SELECT word, COUNT(*) AS n FROM (
                SELECT LOWER(UNNEST(regexp_extract_all(text, '\\S+'))) AS word
                FROM documents
            ) GROUP BY word ORDER BY n DESC, word ASC LIMIT 20
        """,
        "top_words_sketch": """
            SELECT word, COUNT(*) AS n FROM (
                SELECT LOWER(UNNEST(regexp_extract_all(text, '\\S+'))) AS word
                FROM documents
            ) GROUP BY word ORDER BY n DESC, word ASC LIMIT 20
        """,
        "docs_containing_word": """
            SELECT COUNT(*) AS n_docs FROM documents
            WHERE text LIKE '%table%'
        """,
        # SQL re-statement of the reference lang.rs heuristic (script counts
        # with weighted diacritics, earliest-index argmax, zh->ja kana
        # reclassification); verified char-for-char vs core/lang.py
        "lang_detect_distribution": r"""
            WITH alpha AS (
              SELECT regexp_replace(text, '[^\p{L}]', '', 'g') AS a
              FROM documents
            ), counts AS (
              SELECT length(a) AS total,
                length(regexp_replace(a, '[^a-zA-Z]', '', 'g')) AS c_en,
                10 * length(regexp_replace(a, '[^ßäöüÄÖÜ]', '', 'g')) AS c_de,
                5 * length(regexp_replace(a, '[^àâçéèêëîïôûù]', '', 'g')) AS c_fr,
                5 * length(regexp_replace(a, '[^ñáíóú]', '', 'g')) AS c_es,
                length(regexp_replace(a, '[^\x{0400}-\x{04FF}]', '', 'g')) AS c_ru,
                length(regexp_replace(a, '[^\x{4E00}-\x{9FFF}]', '', 'g')) AS c_zh,
                length(regexp_replace(a, '[^\x{3040}-\x{30FF}]', '', 'g')) AS c_ja,
                length(regexp_replace(a, '[^\x{AC00}-\x{D7AF}]', '', 'g')) AS c_ko,
                length(regexp_replace(a, '[^\x{0600}-\x{06FF}]', '', 'g')) AS c_ar,
                length(regexp_replace(a, '[^\x{0590}-\x{05FF}]', '', 'g')) AS c_he
              FROM alpha
            ), langs AS (
              SELECT CASE
                WHEN total = 0 THEN 'en'
                WHEN GREATEST(c_en,c_de,c_fr,c_es,c_ru,c_zh,c_ja,c_ko,c_ar,c_he) = 0 THEN 'en'
                WHEN c_en = GREATEST(c_en,c_de,c_fr,c_es,c_ru,c_zh,c_ja,c_ko,c_ar,c_he) THEN 'en'
                WHEN c_de = GREATEST(c_de,c_fr,c_es,c_ru,c_zh,c_ja,c_ko,c_ar,c_he) THEN 'de'
                WHEN c_fr = GREATEST(c_fr,c_es,c_ru,c_zh,c_ja,c_ko,c_ar,c_he) THEN 'fr'
                WHEN c_es = GREATEST(c_es,c_ru,c_zh,c_ja,c_ko,c_ar,c_he) THEN 'es'
                WHEN c_ru = GREATEST(c_ru,c_zh,c_ja,c_ko,c_ar,c_he) THEN 'ru'
                WHEN c_zh = GREATEST(c_zh,c_ja,c_ko,c_ar,c_he) THEN
                     (CASE WHEN c_ja > 0 THEN 'ja' ELSE 'zh' END)
                WHEN c_ja = GREATEST(c_ja,c_ko,c_ar,c_he) THEN 'ja'
                WHEN c_ko = GREATEST(c_ko,c_ar,c_he) THEN 'ko'
                WHEN c_ar = GREATEST(c_ar,c_he) THEN 'ar'
                ELSE 'he'
              END AS detected_lang
              FROM counts
            )
            SELECT detected_lang, COUNT(*) AS n_docs
            FROM langs GROUP BY detected_lang
        """,
        # 64-bit polynomial rolling hash over the whitespace-normalized
        # utf-8 bytes (text_analysis.rolling_fingerprint), byte-exact:
        # h <- (h * 1000003 + byte) mod 2^64 via HUGEINT intermediates
        "doc_fingerprints": r"""
            SELECT doc_id,
              CASE WHEN octet_length(enc) = 0 THEN 0
              ELSE CAST(list_reduce(
                 list_transform(range(1, octet_length(enc) + 1),
                    i -> CAST((strpos('0123456789ABCDEF', substr(hex(enc), 2*i - 1, 1)) - 1) * 16
                            + (strpos('0123456789ABCDEF', substr(hex(enc), 2*i, 1)) - 1) AS HUGEINT)),
                 (a, b) -> (a * 1000003 + b) % 18446744073709551616
              ) AS UBIGINT) END AS fingerprint
            FROM (
              SELECT doc_id,
                     encode(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS enc
              FROM documents
            )
        """,
        # SQL re-statement of stages/text_analysis.quality_features (length /
        # stopword / punctuation / word-length composite; round_even matches
        # Python banker's rounding on the per-doc score, validated 500/500)
        "quality_by_lang": _quality_by_lang_sql(),
        # True independent oracle: DuckDB list_cosine_similarity brute-force
        # top-k with the same round-to-6 + neighbor_id tie-break the Ray
        # stage uses (stages/similarity.py cosine_topk).
        "ann_cosine_topk": """
            WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
            sims AS (
              SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                     list_cosine_similarity(q.embedding, c.embedding) AS cosine
              FROM q, embeddings c WHERE c.vec_id != q.vec_id)
            SELECT query_id, rank, neighbor_id FROM (
              SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                         ORDER BY ROUND(cosine, 6) DESC, neighbor_id ASC) AS rank
              FROM sims) t WHERE rank <= 5
        """,
        "kg_mentions": f"SELECT * FROM read_parquet('{gold}/kg_mentions.parquet')",
        "kg_triples": f"SELECT * FROM read_parquet('{gold}/kg_triples.parquet')",
        "kg_nodes": f"SELECT * FROM read_parquet('{gold}/kg_nodes.parquet')",
        "kg_edges": f"SELECT * FROM read_parquet('{gold}/kg_edges.parquet')",
        # True-SQL graph analytics over the pinned golden edge set: the
        # oracle is an INDEPENDENT implementation of the same algorithm
        # (not a golden readback) — see _pagerank_sql/_degree_stats_sql.
        "kg_pagerank": _pagerank_sql(f"read_parquet('{gold}/kg_edges.parquet')"),
        "kg_degree_stats": _degree_stats_sql(
            f"read_parquet('{gold}/kg_edges.parquet')"
        ),
        "kg_components": _components_sql(f"read_parquet('{gold}/kg_edges.parquet')"),
        "ngram_jaccard_pairs": _ngram_jaccard_sql(),
        # Deterministic non-SQL operators (seeded hyperplanes / FNV-1a
        # minhash / fixed fixtures / fake scorers): pinned as goldens by
        # tools/make_op_goldens.py, double-run-verified before each pin.
        **{
            name: f"SELECT * FROM read_parquet('{gold_op}/{name}.parquet')"
            for name in (
                "ann_lsh_topk", "ann_ivf_topk",
                "minhash_near_dups", "simhash_near_dups", "embedding_near_dups",
                "minhash_dedup_keep", "multimodal_decode",
                "multimodal_real_decode", "audio_mfcc_frames",
                "distinct_counts_hll", "eval_ner_modes",
                "bert_ner_mentions", "coref_quality", "kg_clusters",
                "kg_communities",
            )
        },
    }
