"""Tests for coref metrics, interval index, model-NER actor plumbing, sinks."""

from __future__ import annotations

import pytest

from anno_ray.core.interval_index import IntervalIndex, span_distance, span_iou, span_overlaps
from anno_ray.functions.coref_metrics import b_cubed, muc, purity_completeness


def test_b_cubed_perfect_and_degenerate():
    gold = {"a": 0, "b": 0, "c": 1}
    assert b_cubed(gold, gold) == (1.0, 1.0, 1.0)
    all_one = {"a": 0, "b": 0, "c": 0}
    p, r, f = b_cubed(all_one, gold)
    assert r == 1.0 and p < 1.0
    singletons = {"a": 0, "b": 1, "c": 2}
    p, r, f = b_cubed(singletons, gold)
    assert p == 1.0 and r < 1.0


def test_muc():
    gold = {"a": 0, "b": 0, "c": 1, "d": 1}
    assert muc(gold, gold) == (1.0, 1.0, 1.0)
    merged = {"a": 0, "b": 0, "c": 0, "d": 0}
    p, r, f = muc(merged, gold)
    assert r == 1.0 and p < 1.0


def test_purity_completeness():
    gold = {"a": 0, "b": 0, "c": 1, "d": 1}
    pu, co = purity_completeness(gold, gold)
    assert pu == 1.0 and co == 1.0
    split = {"a": 0, "b": 1, "c": 2, "d": 3}
    pu, co = purity_completeness(split, gold)
    assert pu == 1.0 and co == 0.5


def test_interval_index():
    spans = [(0, 5), (3, 8), (10, 12), (0, 20)]
    ix = IntervalIndex(spans)
    assert ix.overlapping(4, 6) == [0, 1, 3]
    assert ix.containing(11) == [2, 3]
    assert ix.contained_in(0, 9) == [0, 1]
    assert ix.overlapping(100, 110) == []
    assert span_overlaps((0, 5), (4, 6)) and not span_overlaps((0, 5), (5, 6))
    assert span_iou((0, 10), (5, 15)) == 5 / 15
    assert span_distance((0, 5), (8, 10)) == 3
    assert span_distance((8, 10), (0, 5)) == 3
    assert span_distance((0, 5), (3, 6)) == 0


def test_zero_shot_actor_plumbing(ray_session):
    import ray.data

    from anno_ray.stages.model_ner import ZeroShotNERActor, zero_shot_ner

    ds = ray.data.from_items(
        [
            {"url": "u1", "text": "Alice visited Berlin with Bob."},
            {"url": "u2", "text": "nothing capitalized here"},
        ]
    )
    out = zero_shot_ner(ds, ["person", "place"], fake=True, concurrency=(1, 2)).to_pandas()
    assert set(out[out.url == "u1"].text) >= {"Alice", "Berlin"}
    assert len(out[out.url == "u2"]) == 0
    # spans slice back into the text
    row = out[out.text == "Berlin"].iloc[0]
    assert "Alice visited Berlin with Bob."[row.start : row.end] == "Berlin"
    # strict mode (no runtime) raises at actor construction
    with pytest.raises(NotImplementedError):
        ZeroShotNERActor(["x"], fake=False)
    # per-actor LRU prompt cache: same labels hit the cache
    actor = ZeroShotNERActor(["person"], fake=True)
    k1 = actor._encode_prompt(("person",))["key"]
    k2 = actor._encode_prompt(("person",))["key"]
    assert k1 == k2 and len(actor.prompt_cache) == 1


def test_sinks(ray_session, tmp_path):
    import ray.data

    from anno_ray.fixtures.pages import generate_pages_table
    from anno_ray.sources.sinks import mentions_tsv, write_docs_jsonl
    from anno_ray.stages.extract import extract_docs, mentions_table

    pages = ray.data.from_arrow(generate_pages_table(0, 10))
    docs = extract_docs(pages).materialize()
    out = str(tmp_path / "jsonl")
    write_docs_jsonl(docs, out)
    import glob
    import json

    files = glob.glob(out + "/*.json")
    assert files
    line = open(files[0]).readline()
    d = json.loads(line)
    assert "signals" in d and "relations" in d and d["url"].startswith("https://")

    tsv = mentions_tsv(mentions_table(docs))
    header = tsv.splitlines()[0].split("\t")
    assert "label" in header and len(tsv.splitlines()) > 10


# --- real-model ONNX seam (M1/M2): encode/span/decode with a stub session ----

class _StubSession:
    """onnxruntime.InferenceSession.run contract: feeds -> [logit tensor].
    Emits +10 logits for the spans configured, -10 elsewhere."""

    def __init__(self, hot_spans, n_classes, shape3d=False):
        self.hot = hot_spans  # {(word_idx, width, class_idx)}
        self.n_classes = n_classes
        self.shape3d = shape3d
        self.calls = 0

    def run(self, _names, feeds):
        import numpy as np

        from anno_ray.stages.model_ner import MAX_SPAN_WIDTH

        self.calls += 1
        n_words = int(feeds["text_lengths"][0][0])
        if self.shape3d:
            out = np.full((1, n_words * MAX_SPAN_WIDTH, self.n_classes), -10.0, np.float32)
            for (w, wd, c) in self.hot:
                out[0, w * MAX_SPAN_WIDTH + wd, c] = 10.0
        else:
            out = np.full((1, n_words, MAX_SPAN_WIDTH, self.n_classes), -10.0, np.float32)
            for (w, wd, c) in self.hot:
                out[0, w, wd, c] = 10.0
        return [out]


def _toy_tokenize(word):
    # deterministic multi-subword tokenizer: one token per 4 chars
    return [1000 + (hash(word) % 100) + i for i in range((len(word) + 3) // 4)]


def test_encode_prompt_layout():
    from anno_ray.stages.model_ner import (
        TOKEN_END,
        TOKEN_ENT,
        TOKEN_SEP,
        TOKEN_START,
        encode_prompt,
    )

    tok = lambda w: [500] if w == "person" else [600, 601] if w == "Johnathan" else [700]
    ids, attn, wmask, n_words, n_types = encode_prompt(
        tok, ["Johnathan", "works"], ["person"]
    )
    assert ids == [TOKEN_START, TOKEN_ENT, 500, TOKEN_SEP, 600, 601, 700, TOKEN_END]
    # word ids are 1-based on each word's FIRST subword only
    assert wmask == [0, 0, 0, 0, 1, 0, 2, 0]
    assert attn == [1] * len(ids)
    assert n_words == 2 and n_types == 1


def test_make_span_tensors():
    from anno_ray.stages.model_ner import MAX_SPAN_WIDTH, make_span_tensors

    span_idx, span_mask = make_span_tensors(3)
    assert span_idx.shape == (3 * MAX_SPAN_WIDTH, 2)
    assert int(span_mask.sum()) == 3 + 2 + 1  # widths clipped at text end
    # dim layout: start*12 + width -> (start, start+width)
    assert list(span_idx[0]) == [0, 0]
    assert list(span_idx[1]) == [0, 1]
    assert list(span_idx[MAX_SPAN_WIDTH]) == [1, 1]


def test_decode_output_4d_and_3d():
    import numpy as np

    from anno_ray.stages.model_ner import MAX_SPAN_WIDTH, decode_output

    text = "John works at Acme Corp"
    words = text.split()
    out = np.full((1, 5, MAX_SPAN_WIDTH, 2), -10.0, np.float32)
    out[0, 0, 0, 0] = 10.0  # "John" -> class 0
    out[0, 3, 1, 1] = 10.0  # "Acme Corp" -> class 1
    ments = decode_output(out, text, words, ["person", "org"], 0.5)
    got = {(m.text, m.label) for m in ments}
    assert got == {("John", "PER"), ("Acme Corp", "ORG")}
    assert all(m.conf > 0.99 for m in ments)
    assert all(text[m.start:m.end] == m.text for m in ments)

    out3 = np.full((1, 5 * MAX_SPAN_WIDTH, 2), -10.0, np.float32)
    out3[0, 0 * MAX_SPAN_WIDTH + 0, 0] = 10.0
    out3[0, 3 * MAX_SPAN_WIDTH + 1, 1] = 10.0
    ments3 = decode_output(out3, text, words, ["person", "org"], 0.5)
    assert {(m.text, m.label) for m in ments3} == got


def test_decode_spans_past_text_end_skipped():
    import numpy as np

    from anno_ray.stages.model_ner import MAX_SPAN_WIDTH, decode_output

    out = np.full((1, 2, MAX_SPAN_WIDTH, 1), -10.0, np.float32)
    out[0, 1, 5, 0] = 10.0  # end_word = 6 >= 2 words -> skipped
    assert decode_output(out, "a b", ["a", "b"], ["person"], 0.5) == []


def test_actor_real_path_with_stub_session():
    import pyarrow as pa

    from anno_ray.stages.model_ner import ZeroShotNERActor

    actor = ZeroShotNERActor(["person", "org"], fake=True, threshold=0.5)
    stub = _StubSession({(0, 0, 0), (3, 1, 1)}, n_classes=2)
    actor.fake = False
    actor.model = stub
    actor.tokenizer = _toy_tokenize

    batch = pa.table(
        {
            "url": pa.array(["u1", "u2"]),
            "text": pa.array(["John works at Acme Corp", "John works at Acme Corp"]),
        }
    )
    out = actor(batch)
    assert out.num_rows == 4  # 2 mentions per doc
    assert set(out.column("label").to_pylist()) == {"PER", "ORG"}
    assert stub.calls == 2  # one inference per doc
    # prompt-encoding LRU: second identical text reused the cached encoding
    assert len(actor.prompt_cache) == 1


def test_gliner_feed_contract_pinned():
    """Pin the EXACT ONNX feed names, dtypes and shapes the actor builds to
    the reference session signature (gliner_onnx.rs:305-362: six feeds
    input_ids/attention_mask/words_mask/text_lengths/span_idx/span_mask with
    shapes (1,seq)x3 int64, (1,1) int64, (1,spans,2) int64, (1,spans) bool;
    output [batch, num_words, max_width, num_types]). Catches feed-name or
    shape drift against a real GLiNER export without needing a runtime."""
    import numpy as np

    from anno_ray.stages.model_ner import MAX_SPAN_WIDTH, ZeroShotNERActor

    captured: dict = {}

    class _CaptureSession:
        def run(self, _names, feeds):
            captured.update(feeds)
            n_words = int(feeds["text_lengths"][0][0])
            return [
                np.full((1, n_words, MAX_SPAN_WIDTH, 2), -10.0, np.float32)
            ]

    actor = ZeroShotNERActor(["person", "org"], fake=True, threshold=0.5)
    actor.fake = False
    actor.model = _CaptureSession()
    actor.tokenizer = _toy_tokenize

    text = "John works at Acme Corp today"
    n_words = len(text.split())
    actor._extract_real(text)

    # the six reference feed names, nothing more, nothing less
    assert set(captured) == {
        "input_ids", "attention_mask", "words_mask",
        "text_lengths", "span_idx", "span_mask",
    }
    seq = captured["input_ids"].shape[1]
    for name in ("input_ids", "attention_mask", "words_mask"):
        assert captured[name].shape == (1, seq)
        assert captured[name].dtype == np.int64
    assert captured["text_lengths"].shape == (1, 1)
    assert captured["text_lengths"].dtype == np.int64
    assert int(captured["text_lengths"][0, 0]) == n_words
    n_spans = n_words * MAX_SPAN_WIDTH
    assert captured["span_idx"].shape == (1, n_spans, 2)
    assert captured["span_idx"].dtype == np.int64
    assert captured["span_mask"].shape == (1, n_spans)
    assert captured["span_mask"].dtype == np.bool_
    # span rows follow the gline-rs layout: row w*W+width = (w, w+width),
    # masked valid only when the span end stays inside the text
    si = captured["span_idx"][0]
    sm = captured["span_mask"][0]
    for w in range(n_words):
        for width in range(MAX_SPAN_WIDTH):
            row = w * MAX_SPAN_WIDTH + width
            if sm[row]:
                assert si[row, 0] == w and si[row, 1] == w + width
                assert w + width < n_words
    # attention mask is all ones over the packed sequence
    assert captured["attention_mask"].sum() == seq
    # words_mask marks exactly one (first) subtoken per text word
    assert (captured["words_mask"] > 0).sum() == n_words


def test_actor_without_runtime_raises():
    import pytest

    from anno_ray.stages.model_ner import ZeroShotNERActor

    with pytest.raises((NotImplementedError, ValueError)):
        ZeroShotNERActor(["person"], fake=False)


def test_multimodal_resize_and_audio(ray_session):
    import ray.data

    from anno_ray.stages.multimodal import (
        audio_features,
        resize_images,
        synthetic_media_table,
    )

    media = ray.data.from_arrow(synthetic_media_table(24))
    resized = resize_images(media, max_side=128, fake=True).take_all()
    assert len(resized) == 24
    for r in resized:
        assert max(r["height"], r["width"]) <= 128
        assert isinstance(r["payload"], bytes) and len(r["payload"]) == 32

    # audio: meta carries duration -> frame-level feature rows
    import json

    audio = ray.data.from_items(
        [
            {"media_id": 1, "payload": b"aaaa", "meta": json.dumps({"duration_sec": 2.0})},
            {"media_id": 2, "payload": b"bbbb", "meta": json.dumps({"duration_sec": 0.4})},
        ]
    )
    rows = audio_features(audio, hop_sec=0.5, fake=True).take_all()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
        assert len(r["mfcc"]) == 13
    assert len(by_id[1]) == 4  # 2.0s / 0.5s hop
    assert len(by_id[2]) == 1  # sub-hop clip still yields one frame

    # strict mode raises the documented gate
    import pytest

    from anno_ray.stages.multimodal import AudioFeatures, ResizeImage

    with pytest.raises(NotImplementedError):
        ResizeImage(fake=False).resize_impl(b"x")
    with pytest.raises(NotImplementedError):
        AudioFeatures(fake=False).features_impl(b"x", "")


# --- M2: BERT BIO decode (onnx.rs:271-560) ------------------------------------

def _bio_logits(seq: list[str], id2label=None):
    """Build (1, seq, n_labels) logits that argmax to the given label names."""
    import numpy as np

    from anno_ray.stages.model_ner import BERT_DEFAULT_ID2LABEL

    id2label = id2label or BERT_DEFAULT_ID2LABEL
    lab2id = {v: k for k, v in id2label.items()}
    n = len(id2label)
    out = np.full((1, len(seq), n), -5.0, np.float32)
    for i, lab in enumerate(seq):
        out[0, i, lab2id[lab]] = 5.0
    return out


def test_bio_decode_basic_and_special_token_flush():
    from anno_ray.stages.model_ner import decode_bio_logits

    text = "John Smith works at Acme Corp"
    #        0123456789...
    # tokens: [CLS] John Smith works at Acme Corp [SEP]
    offsets = [(0, 0), (0, 4), (5, 10), (11, 16), (17, 19), (20, 24), (25, 29), (0, 0)]
    labels = ["O", "B-PER", "I-PER", "O", "O", "B-ORG", "I-ORG", "O"]
    ms = decode_bio_logits(_bio_logits(labels), text, offsets)
    assert [(m.text, m.label, m.start, m.end) for m in ms] == [
        ("John Smith", "PER", 0, 10),
        ("Acme Corp", "ORG", 20, 29),
    ]
    # softmax confidence of a 5-vs-(-5) argmax over 9 labels
    import math

    expect = 1.0 / (1.0 + 8 * math.exp(-10.0))
    assert abs(ms[0].conf - expect) < 1e-3
    # the final [SEP] (0,0) flushed the last entity; an entity open at the
    # sequence end is also flushed (onnx.rs:548-560)
    ms2 = decode_bio_logits(
        _bio_logits(["B-LOC"]), "Paris", [(0, 5)]
    )
    assert [(m.text, m.label) for m in ms2] == [("Paris", "LOC")]


def test_bio_adjacent_b_merge_and_i_conf_quirks():
    from anno_ray.stages.model_ner import decode_bio_logits

    text = "NewYork City"
    # subword split: New ##York  City  — two B-LOC tokens touching
    offsets = [(0, 3), (3, 7), (8, 12)]
    ms = decode_bio_logits(_bio_logits(["B-LOC", "B-LOC", "I-LOC"]), text, offsets)
    # adjacent same-type B merges (onnx.rs should_merge: start <= prev_end+1)
    assert [(m.text, m.start, m.end) for m in ms] == [("NewYork City", 0, 12)]

    # I after a DIFFERENT type flushes and opens a new entity
    text2 = "Acme Paris"
    ms2 = decode_bio_logits(
        _bio_logits(["B-ORG", "I-LOC"]), text2, [(0, 4), (5, 10)]
    )
    assert [(m.text, m.label) for m in ms2] == [("Acme", "ORG"), ("Paris", "LOC")]

    # reference discriminant quirk: ALL unknown (Other) labels share one
    # type key, so I-GADGET extends B-WIDGET — and takes the NEW label
    custom = {0: "O", 1: "B-WIDGET", 2: "I-GADGET"}
    ms3 = decode_bio_logits(
        _bio_logits(["B-WIDGET", "I-GADGET"], id2label=custom),
        text2,
        [(0, 4), (5, 10)],
        id2label=custom,
    )
    assert [(m.text, m.label, m.start, m.end) for m in ms3] == [
        ("Acme Paris", "GADGET", 0, 10)
    ]


def test_bert_actor_stub_session_and_fake_path(ray_session):
    import numpy as np
    import pyarrow as pa

    from anno_ray.stages.model_ner import BertNERActor, bert_ner

    # fake path end-to-end through the Dataset stage
    import ray.data

    ds = ray.data.from_arrow(
        pa.table({"url": ["u1"], "text": ["John Smith visited Acme Corp"]})
    )
    out = bert_ner(ds, fake=True).to_pandas()
    assert len(out) >= 2 and set(out.columns) == {"url", "text", "label", "start", "end", "conf"}

    # stub-session real path: feeds contract (three (1, seq) int64 feeds)
    captured = {}

    class _Stub:
        def run(self, _names, feeds):
            captured.update(feeds)
            seq = feeds["input_ids"].shape[1]
            from anno_ray.stages.model_ner import BERT_DEFAULT_ID2LABEL

            out = np.full((1, seq, len(BERT_DEFAULT_ID2LABEL)), -5.0, np.float32)
            out[:, :, 0] = 5.0  # all "O"
            out[0, 1, 3] = 10.0  # token 1 -> B-PER
            return [out]

    actor = BertNERActor(fake=True)
    actor.fake = False
    actor.model = _Stub()

    def toy_tokenizer(text):
        ids, offs = [101], [(0, 0)]
        pos = 0
        for w in text.split():
            s = text.index(w, pos)
            pos = s + len(w)
            ids.append(1000 + len(w))
            offs.append((s, s + len(w)))
        ids.append(102)
        offs.append((0, 0))
        return ids, offs

    actor.tokenizer = toy_tokenizer
    ms = actor._extract_real("Alice met Bob")
    assert [(m.text, m.label, m.start, m.end) for m in ms] == [("Alice", "PER", 0, 5)]
    assert set(captured) == {"input_ids", "attention_mask", "token_type_ids"}
    seq = captured["input_ids"].shape[1]
    for k in captured:
        assert captured[k].shape == (1, seq) and captured[k].dtype == np.int64
    assert captured["attention_mask"].sum() == seq
    assert captured["token_type_ids"].sum() == 0


def test_bert_tokenizer_offsets_contract():
    """M2 tokenizer seam (onnx.rs:277-292): a hand-built tiny-vocab
    WordPiece tokenizer must satisfy the offsets contract the BIO decode
    depends on — specials as (0,0) pairs at both ends, char-indexed
    subword offsets covering each word contiguously — and drifted
    implementations must be REJECTED."""
    import pytest

    from anno_ray.stages.model_ner import (
        decode_bio_logits,
        validate_tokenizer_offsets,
    )

    VOCAB = {"[CLS]": 0, "[SEP]": 1, "un": 2, "##happ": 3, "##iness": 4,
             "paris": 5, "in": 6, "[UNK]": 7}
    PIECES = ["##iness", "##happ", "paris", "un", "in"]

    def tiny_wordpiece(text):
        """greedy-longest-match wordpiece with HF get_offsets() semantics."""
        ids, offsets = [VOCAB["[CLS]"]], [(0, 0)]
        pos = 0
        for word in text.split():
            start = text.index(word, pos)
            pos = start + len(word)
            w = word.lower()
            i = 0
            first = True
            while i < len(w):
                match = None
                for p in sorted(PIECES, key=len, reverse=True):
                    stem = p[2:] if p.startswith("##") else p
                    cont = p.startswith("##")
                    if cont == (not first) and w[i:].startswith(stem):
                        match = (p, len(stem))
                        break
                if match is None:
                    ids.append(VOCAB["[UNK]"])
                    offsets.append((start + i, start + len(w)))
                    break
                ids.append(VOCAB[match[0]])
                offsets.append((start + i, start + i + match[1]))
                i += match[1]
                first = False
        ids.append(VOCAB["[SEP]"])
        offsets.append((0, 0))
        return ids, offsets

    text = "unhappiness in Paris"
    ids, offsets = tiny_wordpiece(text)
    # pinned layout: [CLS] un ##happ ##iness in paris [SEP]
    assert ids == [0, 2, 3, 4, 6, 5, 1]
    assert offsets == [(0, 0), (0, 2), (2, 6), (6, 11), (12, 14), (15, 20), (0, 0)]
    validate_tokenizer_offsets(tiny_wordpiece, text)

    # decode integration: subword offsets must slice the right chars
    import numpy as np
    id2label = {0: "O", 1: "B-PER", 2: "I-PER", 3: "B-LOC", 4: "I-LOC"}
    logits = np.full((len(ids), 5), -8.0, dtype=np.float32)
    labels = ["O", "B-PER", "I-PER", "I-PER", "O", "B-LOC", "O"]
    lut = {v: k for k, v in id2label.items()}
    for ti, lab in enumerate(labels):
        logits[ti, lut[lab]] = 8.0
    ms = decode_bio_logits(logits, text, offsets, id2label)
    assert [(m.text, m.label, m.start, m.end) for m in ms] == [
        ("unhappiness", "PER", 0, 11),
        ("Paris", "LOC", 15, 20),
    ]

    # drift 1: dropping the special-token pairs (ids/offsets still aligned
    # but no flush markers) must be rejected
    def no_specials(t):
        i, o = tiny_wordpiece(t)
        return i[1:-1], o[1:-1]

    with pytest.raises(ValueError):
        validate_tokenizer_offsets(no_specials, text)

    # drift 2: byte-indexed offsets on non-ASCII text must be rejected
    def byte_indexed(t):
        i, o = tiny_wordpiece(t)
        enc = t.encode("utf-8")
        def to_bytes(cs): return len(t[:cs].encode("utf-8"))
        return i, [
            (0, 0) if (s, e) == (0, 0) else (to_bytes(s), to_bytes(e))
            for s, e in o
        ]

    accented = "café in Paris"   # é shifts byte offsets off char offsets
    with pytest.raises(ValueError):
        validate_tokenizer_offsets(byte_indexed, accented)

    # drift 3: specials reported with a non-(0,0) sentinel
    def bad_special(t):
        i, o = tiny_wordpiece(t)
        o = [(1, 1) if p == (0, 0) else p for p in o]
        return i, o

    with pytest.raises(ValueError):
        validate_tokenizer_offsets(bad_special, text)

    # drift 4 (the classic HF-drop-in failure): off-by-one offsets —
    # inclusive-end spans ((s, e-1)) slice a truncated piece and must be
    # rejected (onnx.rs:282-292 offsets are exclusive-end char indices)
    def inclusive_end(t):
        i, o = tiny_wordpiece(t)
        return i, [(s, e - 1) if (s, e) != (0, 0) else (0, 0) for s, e in o]

    with pytest.raises(ValueError):
        validate_tokenizer_offsets(inclusive_end, text)

    # drift 5: start shifted one char right (leading-whitespace slice on
    # the following word) must be rejected
    def shifted_start(t):
        i, o = tiny_wordpiece(t)
        return i, [
            (s + 1, e + 1) if (s, e) != (0, 0) and e + 1 <= len(t) else (s, e)
            for s, e in o
        ]

    with pytest.raises(ValueError):
        validate_tokenizer_offsets(shifted_start, text)
