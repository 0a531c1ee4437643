"""Chunked re-extraction for oversized documents (StreamingCapable analog).

Reference: ``StreamingCapable`` (/root/reference/anno/src/lib.rs:179-195) —
extract per chunk, shift every span by the chunk offset, recommended chunk
size 10,000 chars. This module adds the two safety properties the trait
leaves to the caller:

- chunk boundaries snap BACK to the nearest whitespace, so no word (and
  hence no entity surface) is ever split mid-token;
- an optional overlap region re-extracts the seam and drops mentions already
  emitted by the previous chunk (dedup by shifted (start, end, label)).

Two surfaces:

- ``extract_streaming(extractor, text)`` — library-level, single process;
- ``chunk_docs(ds, ...)`` — Ray-level: flat-map oversized rows into
  (url, chunk_ofs, text) rows so extraction parallelizes WITHIN a document;
  downstream mention spans are global after adding ``chunk_ofs``.
"""

from __future__ import annotations

RECOMMENDED_CHUNK_CHARS = 10_000


def chunk_spans(
    text: str, chunk_chars: int = RECOMMENDED_CHUNK_CHARS
) -> list[tuple[int, int]]:
    """(start, end) char spans covering ``text``; each < chunk_chars except
    unbreakable single words; boundaries only at whitespace."""
    n = len(text)
    if n <= chunk_chars:
        return [(0, n)] if n else []
    spans = []
    start = 0
    while start < n:
        end = min(start + chunk_chars, n)
        if end < n:
            cut = text.rfind(" ", start, end)
            for ws in ("\n", "\t"):
                cut = max(cut, text.rfind(ws, start, end))
            if cut > start:
                end = cut + 1  # keep the separator with the left chunk
        spans.append((start, end))
        start = end
    return spans


def extract_streaming(
    extractor,
    text: str,
    *,
    chunk_chars: int = RECOMMENDED_CHUNK_CHARS,
    overlap: int = 256,
):
    """Run ``extractor(chunk) -> [Mention]`` per chunk, shift spans to global
    offsets (lib.rs:184-190). Each chunk's extraction window extends
    ``overlap`` chars past its core span, and a mention is accepted only
    from the chunk whose CORE contains its start — so entities straddling a
    boundary are extracted whole (the reference's default trait impl
    truncates them), exactly matching whole-document extraction for any
    entity shorter than ``overlap``. Entities whose typing needs more than
    ``overlap`` chars of right context may still differ; raise it for such
    extractors. Position-sorted output like the direct extractors."""
    from dataclasses import replace

    out = []
    seen: set[tuple[int, int, str]] = set()
    spans = chunk_spans(text, chunk_chars)
    for k, (start, end) in enumerate(spans):
        window_end = min(len(text), end + overlap) if k < len(spans) - 1 else end
        for m in extractor(text[start:window_end]):
            g_start = m.start + start
            if g_start >= end:
                continue  # starts in the overlap tail: the next chunk owns it
            key = (g_start, m.end + start, m.label)
            if key in seen:
                continue
            seen.add(key)
            out.append(
                m if start == 0 else replace(m, start=g_start, end=m.end + start)
            )
    out.sort(key=lambda m: (m.start, m.end, m.label))
    return out


def chunk_docs(
    ds,
    *,
    text_col: str = "text",
    url_col: str = "url",
    chunk_chars: int = RECOMMENDED_CHUNK_CHARS,
):
    """Dataset of (url, text) -> Dataset of (url, chunk_id, chunk_ofs, text)
    where oversized texts are whitespace-snapped chunks and small texts pass
    through as one row. Downstream extraction output spans become global by
    adding ``chunk_ofs`` — the Ray-side StreamingCapable: a single huge doc
    no longer serializes one worker."""
    import pyarrow as pa

    from ..ray_utils import register_for_ray

    register_for_ray()

    def kernel(b: pa.Table) -> pa.Table:
        urls = b.column(url_col).to_pylist()
        texts = b.column(text_col).to_pylist()
        out_url, out_cid, out_ofs, out_text = [], [], [], []
        for u, t in zip(urls, texts):
            t = t or ""
            for cid, (s, e) in enumerate(chunk_spans(t, chunk_chars) or [(0, 0)]):
                out_url.append(u)
                out_cid.append(cid)
                out_ofs.append(s)
                out_text.append(t[s:e])
        return pa.table(
            {
                url_col: pa.array(out_url, pa.string()),
                "chunk_id": pa.array(out_cid, pa.int32()),
                "chunk_ofs": pa.array(out_ofs, pa.int64()),
                text_col: pa.array(out_text, pa.string()),
            }
        )

    return ds.map_batches(kernel, batch_format="pyarrow")
