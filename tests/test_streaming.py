"""StreamingCapable analog (core/streaming.py): chunked re-extraction with
offset shifting must agree with whole-document extraction
(lib.rs:179-195)."""

from __future__ import annotations

import pyarrow as pa


def _sample_text(n_blocks: int) -> str:
    block = (
        "John Smith met Jane Doe in Paris on March 5, 2021 and Acme Corp "
        "paid $4.2 million while Globex Inc watched from Berlin. "
    )
    return block * n_blocks


def test_chunk_spans_cover_and_snap():
    from anno_ray.core.streaming import chunk_spans

    text = _sample_text(50)
    spans = chunk_spans(text, 1000)
    # full cover, no gaps/overlaps
    assert spans[0][0] == 0 and spans[-1][1] == len(text)
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        assert e1 == s2
        assert e1 - s1 <= 1000
        # boundary after whitespace: previous char is a separator
        assert text[e1 - 1] in " \n\t"


def test_chunk_spans_unbreakable_word():
    from anno_ray.core.streaming import chunk_spans

    text = "x" * 2500  # one giant token: hard split is the only option
    spans = chunk_spans(text, 1000)
    assert spans == [(0, 1000), (1000, 2000), (2000, 2500)]


def test_extract_streaming_matches_whole_doc():
    from anno_ray.core.regex_ner import extract as extract_regex
    from anno_ray.core.streaming import extract_streaming

    text = _sample_text(120)  # ~14 KB, several chunks at the default size
    whole = extract_regex(text)
    chunked = extract_streaming(extract_regex, text, chunk_chars=2000)
    assert [(m.start, m.end, m.label) for m in chunked] == sorted(
        (m.start, m.end, m.label) for m in whole
    )
    # every shifted span slices back to its surface
    for m in chunked:
        assert text[m.start:m.end] == m.text


def test_chunk_docs_dataset(ray_session):
    import ray.data

    from anno_ray.core.streaming import chunk_docs

    big = _sample_text(40)
    ds = ray.data.from_arrow(
        pa.table({"url": ["a", "b"], "text": [big, "short text"]})
    )
    rows = chunk_docs(ds, chunk_chars=1000).to_pandas()
    a = rows[rows.url == "a"].sort_values("chunk_id")
    assert len(a) > 3
    # offsets reconstruct the original doc exactly
    assert "".join(a.text) == big
    assert list(a.chunk_ofs) == [0] + list(a.text.str.len().cumsum())[:-1]
    b = rows[rows.url == "b"]
    assert len(b) == 1 and b.iloc[0].chunk_ofs == 0
