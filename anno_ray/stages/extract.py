"""Extract stage: pages -> docs/mentions/triples as Ray Data transforms.

The fused per-document kernel (anno_ray.core.document.process_document) runs
P1-P8 + C1 + C3/C4 + J1 in ONE ``map_batches`` pass — mirroring the
reference's per-doc loop (anno/src/cli/commands/pipeline.rs:134-176) but
batched over zero-copy Arrow blocks.

Scale notes (100 TB design):
- the wide ``html`` column never leaves this stage: the kernel's output rows
  carry only extracted text stats + narrow list<struct> columns, so all
  downstream shuffles move ~1-5% of the input bytes;
- the kernel is stateless (regexes + gazetteers compiled at module import,
  once per worker process) -> plain tasks, no actor pool needed; model-backed
  extractors (GLiNER-style) plug in as callable classes via ``extractor_cls``;
- ``mentions_table``/``triples_table`` are cheap Arrow explodes; run them off
  a checkpointed/materialized docs dataset to avoid recomputing extraction.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa

from ..core.document import process_document
from ..core.lang import detect_language
from ..ray_utils import register_for_ray

# Arrow schemas for the nested outputs ---------------------------------------

MENTION_STRUCT = pa.struct(
    [
        ("text", pa.string()),
        ("label", pa.string()),
        ("start", pa.int64()),
        ("end", pa.int64()),
        ("conf", pa.float64()),
        ("pattern", pa.string()),
        ("source", pa.string()),
        ("negated", pa.bool_()),
        ("quantifier", pa.string()),
        ("track_id", pa.int64()),
        ("norm_surface", pa.string()),
        ("kb_id", pa.string()),
    ]
)

TRACK_STRUCT = pa.struct(
    [
        ("track_id", pa.int64()),
        ("canonical_surface", pa.string()),
        ("entity_type", pa.string()),
        ("size", pa.int64()),
        ("kb_id", pa.string()),
    ]
)

TRIPLE_STRUCT = pa.struct(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("conf", pa.float64()),
        ("subj_label", pa.string()),
        ("obj_label", pa.string()),
        ("subj_start", pa.int64()),
        ("obj_start", pa.int64()),
        ("source", pa.string()),
    ]
)

DOCS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("lang", pa.string()),
        ("detected_lang", pa.string()),
        ("n_chars", pa.int64()),
        ("n_mentions", pa.int64()),
        ("n_events", pa.int64()),
        ("mentions", pa.list_(MENTION_STRUCT)),
        ("tracks", pa.list_(TRACK_STRUCT)),
        ("triples", pa.list_(TRIPLE_STRUCT)),
    ]
)


def extract_batch(
    batch: pa.Table,
    *,
    html_col: str = "html",
    url_col: str = "url",
    lang_col: str = "lang",
    with_text: bool = False,
    alias_table: dict | None = None,
    coref_strategy: str = "cli",
) -> pa.Table:
    """Kernel: one Arrow batch of pages -> one Arrow batch of doc results."""
    urls = batch.column(url_col).to_pylist()
    htmls = batch.column(html_col).to_pylist()
    langs = (
        batch.column(lang_col).to_pylist()
        if lang_col in batch.column_names
        else [""] * len(urls)
    )

    # flat column accumulators + per-doc offsets -> ListArray(StructArray)
    # assembly (an order of magnitude cheaper than list-of-dicts conversion)
    doc_url, doc_lang, doc_dlang, doc_nchars, doc_nment, doc_nev = [], [], [], [], [], []
    texts_out: list[str] = []

    m_off = [0]
    m_text, m_label, m_start, m_end, m_conf = [], [], [], [], []
    m_pattern, m_source, m_negated, m_quant, m_track, m_norm, m_kb = [], [], [], [], [], [], []

    t_off = [0]
    t_id, t_surface, t_type, t_size, t_kb = [], [], [], [], []

    r_off = [0]
    r_subj, r_pred, r_obj, r_conf = [], [], [], []
    r_slabel, r_olabel, r_sstart, r_ostart, r_source = [], [], [], [], []

    for url, html, lang in zip(urls, htmls, langs):
        raw = html.decode("utf-8", errors="replace") if isinstance(html, (bytes, bytearray)) else (html or "")
        res = process_document(
            url, raw, alias_table=alias_table, coref_strategy=coref_strategy
        )
        doc_url.append(url)
        doc_lang.append(lang or "")
        doc_dlang.append(detect_language(res.text))
        doc_nchars.append(len(res.text))
        doc_nment.append(len(res.mentions))
        doc_nev.append(res.n_events)
        if with_text:
            texts_out.append(res.text)

        track_kb: dict[int, str] = {}
        for m in res.mentions:
            m_text.append(m.text); m_label.append(m.label)
            m_start.append(m.start); m_end.append(m.end); m_conf.append(m.conf)
            m_pattern.append(m.pattern); m_source.append(m.source)
            m_negated.append(m.negated); m_quant.append(m.quantifier)
            m_track.append(m.track_id); m_norm.append(m.norm_surface)
            m_kb.append(m.kb_id)
            if m.track_id >= 0 and m.kb_id:
                track_kb[m.track_id] = m.kb_id
        m_off.append(len(m_text))

        for t in res.tracks:
            t_id.append(t.track_id); t_surface.append(t.canonical_surface)
            t_type.append(t.entity_type); t_size.append(len(t.mention_idxs))
            t_kb.append(track_kb.get(t.track_id, ""))
        t_off.append(len(t_id))

        for tr in res.triples:
            r_subj.append(tr["subj"]); r_pred.append(tr["pred"]); r_obj.append(tr["obj"])
            r_conf.append(tr["conf"]); r_slabel.append(tr["subj_label"])
            r_olabel.append(tr["obj_label"]); r_sstart.append(tr["subj_start"])
            r_ostart.append(tr["obj_start"]); r_source.append(tr["source"])
        r_off.append(len(r_subj))

    def _list_struct(offsets, struct_type, columns):
        struct = pa.StructArray.from_arrays(
            [pa.array(c, struct_type.field(i).type) for i, c in enumerate(columns)],
            fields=list(struct_type),
        )
        return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), struct)

    cols: dict[str, Any] = {
        "url": pa.array(doc_url, pa.string()),
        "lang": pa.array(doc_lang, pa.string()),
        "detected_lang": pa.array(doc_dlang, pa.string()),
        "n_chars": pa.array(doc_nchars, pa.int64()),
        "n_mentions": pa.array(doc_nment, pa.int64()),
        "n_events": pa.array(doc_nev, pa.int64()),
        "mentions": _list_struct(
            m_off, MENTION_STRUCT,
            [m_text, m_label, m_start, m_end, m_conf, m_pattern, m_source,
             m_negated, m_quant, m_track, m_norm, m_kb],
        ),
        "tracks": _list_struct(
            t_off, TRACK_STRUCT, [t_id, t_surface, t_type, t_size, t_kb]
        ),
        "triples": _list_struct(
            r_off, TRIPLE_STRUCT,
            [r_subj, r_pred, r_obj, r_conf, r_slabel, r_olabel, r_sstart,
             r_ostart, r_source],
        ),
    }
    if with_text:
        cols["text"] = pa.array(texts_out, pa.string())
    return pa.table(cols)


def text_batch(
    batch: pa.Table, *, html_col: str = "html", url_col: str = "url"
) -> pa.Table:
    """Minimal P1-only kernel: (url, html) -> (url, text). The byte-identical
    contract surface."""
    urls = batch.column(url_col).to_pylist()
    htmls = batch.column(html_col).to_pylist()
    from ..core.html import resolve_content

    texts = [
        resolve_content(
            h.decode("utf-8", errors="replace") if isinstance(h, (bytes, bytearray)) else (h or "")
        )
        for h in htmls
    ]
    return pa.table({"url": pa.array(urls, pa.string()), "text": pa.array(texts, pa.string())})


def extract_docs(
    pages,
    *,
    html_col: str = "html",
    url_col: str = "url",
    lang_col: str = "lang",
    with_text: bool = False,
    alias_table: dict | None = None,
    coref_strategy: str = "cli",
    batch_size: int = 64,
):
    """pages Dataset -> docs Dataset (narrow, html dropped)."""
    import functools

    register_for_ray()

    fn = functools.partial(
        extract_batch,
        html_col=html_col,
        url_col=url_col,
        lang_col=lang_col,
        with_text=with_text,
        alias_table=alias_table,
        coref_strategy=coref_strategy,
    )
    return pages.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def _explode(batch: pa.Table, list_col: str, parent_cols: list[str]) -> pa.Table:
    """Explode a list<struct> column; parent columns are repeated per child."""
    col = batch.column(list_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lengths = pa.compute.list_value_length(col).fill_null(0).to_numpy(zero_copy_only=False)
    flat = pa.compute.list_flatten(col)
    import numpy as np

    parent_idx = np.repeat(np.arange(len(batch), dtype=np.int64), lengths)
    cols: dict[str, pa.Array] = {}
    for pc in parent_cols:
        cols[pc] = batch.column(pc).take(pa.array(parent_idx))
    st = flat
    for f_idx in range(st.type.num_fields):
        f = st.type.field(f_idx)
        cols[f.name] = pa.compute.struct_field(st, f_idx)
    return pa.table(cols)


def mentions_table(docs, parent_cols: list[str] | None = None):
    """docs Dataset -> flat mentions Dataset (url, mention fields)."""
    pc = parent_cols or ["url"]
    register_for_ray()
    return docs.map_batches(
        lambda b: _explode(b, "mentions", pc), batch_format="pyarrow"
    )


def triples_table(docs, parent_cols: list[str] | None = None):
    """docs Dataset -> flat triples Dataset (url, subj, pred, obj, ...)."""
    pc = parent_cols or ["url"]
    register_for_ray()
    return docs.map_batches(
        lambda b: _explode(b, "triples", pc), batch_format="pyarrow"
    )


def tracks_table(docs, parent_cols: list[str] | None = None):
    """docs Dataset -> flat tracks Dataset (url, track fields)."""
    pc = parent_cols or ["url"]
    register_for_ray()
    return docs.map_batches(
        lambda b: _explode(b, "tracks", pc), batch_format="pyarrow"
    )
