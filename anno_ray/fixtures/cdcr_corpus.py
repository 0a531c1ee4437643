"""Cross-document coreference fixture corpus (FIXTURES.md §3).

Mirrors the reference's built-in CDCR datasets
(/root/reference/anno/src/eval/cdcr.rs:684-1038): 5 domains (tech, political,
sports, financial, science), 3-6 short docs each, the same identity surfacing
under varying forms ("Elon Musk" / "Musk", "Apple" / "Apple Inc"), plus
decoys sharing words ("Apple Records"). Every doc carries known gold identity
labels for cluster purity/completeness checks.

``skewed_corpus`` adds the head-entity stress variant: one surface form
appearing in >=30% of docs, to exercise the combiner/salting path.
"""

from __future__ import annotations

import pyarrow as pa

# (domain, doc_id, text, {surface -> gold identity})
_DOCS: list[tuple[str, str, str, dict[str, str]]] = [
    # --- tech ---
    ("tech", "tech1",
     "Elon Musk announced that Tesla Inc will build a new factory in Berlin.",
     {"Elon Musk": "musk", "Tesla Inc": "tesla", "Berlin": "berlin"}),
    ("tech", "tech2",
     "Musk said the company plans to hire thousands. Tesla shares rose 5%.",
     {"Musk": "musk", "Tesla": "tesla"}),
    ("tech", "tech3",
     "Apple released a new phone. Apple Inc reported record revenue.",
     {"Apple": "apple", "Apple Inc": "apple"}),
    ("tech", "tech4",
     "The band signed with Apple Records in London decades ago.",
     {"Apple Records": "apple_records", "London": "london"}),
    # --- political ---
    ("political", "pol1",
     "Angela Merkel met Emmanuel Macron in Paris to discuss the treaty.",
     {"Angela Merkel": "merkel", "Emmanuel Macron": "macron", "Paris": "paris"}),
    ("political", "pol2",
     "Merkel returned to Berlin after the summit. She praised the agreement.",
     {"Merkel": "merkel", "Berlin": "berlin"}),
    ("political", "pol3",
     "President Macron addressed the parliament in Paris yesterday.",
     {"Macron": "macron", "Paris": "paris"}),
    # --- sports ---
    ("sports", "spo1",
     "Serena Williams won the final in London. Williams dominated the match.",
     {"Serena Williams": "serena", "Williams": "serena", "London": "london"}),
    ("sports", "spo2",
     "Venus Williams lost the semifinal. Venus praised her sister Serena Williams.",
     {"Venus Williams": "venus", "Serena Williams": "serena"}),
    # --- financial ---
    ("financial", "fin1",
     "Goldman Sachs reported earnings. The Goldman Sachs Group beat estimates.",
     {"Goldman Sachs": "goldman", "Goldman Sachs Group": "goldman"}),
    ("financial", "fin2",
     "Morgan Stanley and Goldman Sachs both raised their forecasts.",
     {"Morgan Stanley": "morgan", "Goldman Sachs": "goldman"}),
    # --- science ---
    ("science", "sci1",
     "Marie Curie discovered radium. Curie won two Nobel prizes.",
     {"Marie Curie": "curie", "Curie": "curie"}),
    ("science", "sci2",
     "Albert Einstein developed relativity. Einstein worked in Princeton.",
     {"Albert Einstein": "einstein", "Einstein": "einstein"}),
    ("science", "sci3",
     "Einstein and Marie Curie met at the Solvay conference in Brussels.",
     {"Einstein": "einstein", "Marie Curie": "curie", "Brussels": "brussels"}),
]


def corpus_table() -> pa.Table:
    """(url, html, lang, domain) pages table for the extract stage."""
    return pa.table(
        {
            "url": pa.array([f"cdcr://{d[1]}" for d in _DOCS], pa.string()),
            "html": pa.array([d[2].encode("utf-8") for d in _DOCS], pa.binary()),
            "lang": pa.array(["en"] * len(_DOCS), pa.string()),
            "domain": pa.array([d[0] for d in _DOCS], pa.string()),
        }
    )


def gold_identities() -> dict[tuple[str, str], str]:
    """(url, surface) -> gold identity id."""
    out = {}
    for _domain, doc_id, _text, golds in _DOCS:
        for surface, ident in golds.items():
            out[(f"cdcr://{doc_id}", surface)] = ident
    return out


def skewed_corpus(n_docs: int = 60, head_ratio: float = 0.4) -> pa.Table:
    """Head-entity skew variant: "US" appears in head_ratio of docs."""
    urls, htmls = [], []
    fillers = [
        "Alice Parker visited Madrid to meet Robert Walker.",
        "Globex Inc acquired Initech Ltd for $3 billion.",
        "Jane Miller works for Acme Corp in Toronto.",
    ]
    n_head = int(n_docs * head_ratio)
    for i in range(n_docs):
        base = fillers[i % len(fillers)]
        if i < n_head:
            text = f"The US announced new policies. {base} Officials in the US agreed."
        else:
            text = base
        urls.append(f"skew://{i}")
        htmls.append(text.encode("utf-8"))
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "html": pa.array(htmls, pa.binary()),
            "lang": pa.array(["en"] * n_docs, pa.string()),
        }
    )
