"""Model-backed NER as a stateful actor-pool stage (M1/M2/M3 pattern).

The reference hosts ONNX models behind a session pool with a per-session LRU
prompt-embedding cache (/root/reference/anno/src/backends/gliner_onnx.rs:
116-380, session_pool.rs:62-100). On Ray the whole pattern collapses to a
callable CLASS passed to ``map_batches(..., concurrency=(n, m))``:

- ``__init__`` loads the model ONCE per actor (the session-pool analog);
- the LRU label-prompt cache is per-actor state (exactly the reference's
  per-session cache design, gliner_onnx.rs:125,236-251);
- ``batch_size`` balances latency vs throughput per the reference's
  ``optimal_batch_size`` hints.

No ONNX runtime ships in this container, so ``_load_model`` is gated behind
an import-try: with no runtime present the stage either raises (strict) or
uses a deterministic fake scorer (tests/benches) — the Ray-side plumbing is
real either way.
"""

from __future__ import annotations

import hashlib
from collections import OrderedDict

import numpy as np
import pyarrow as pa

from ..core.types import Mention
from ..ray_utils import register_for_ray

PROMPT_CACHE_SIZE = 100  # gliner_onnx.rs:125 LruCache size

# GLiNER ONNX constants (gliner_onnx.rs:38-44)
MAX_SPAN_WIDTH = 12
TOKEN_START = 1
TOKEN_END = 2
TOKEN_ENT = 128002
TOKEN_SEP = 128003


# --- real-model inference path (gliner_onnx.rs:285-660) ----------------------
#
# These functions are the load/tokenize/encode/decode seam: with an ONNX
# runtime + model + tokenizer present, the actor runs REAL zero-shot NER; in
# this container they are exercised by unit tests with a stub session
# (tests/test_metrics_index_model.py) so dropping a model file in makes the
# stage live without code changes.


def encode_prompt(
    tokenize, text_words: list[str], entity_types: list[str]
) -> tuple[list[int], list[int], list[int], int, int]:
    """Word-by-word GLiNER prompt encoding (gliner_onnx.rs:488-563).

    ``tokenize(word) -> list[int]`` is the subword tokenizer (HF tokenizers'
    ``encode(word, add_special_tokens=False).ids``). Layout:
    START, (<<ENT>> type-tokens)*, <<SEP>>, text word tokens (words_mask
    carries the 1-based word id on each word's FIRST subword), END.
    Returns (input_ids, attention_mask, words_mask, num_words, num_types).
    """
    input_ids: list[int] = [TOKEN_START]
    words_mask: list[int] = [0]
    for entity_type in entity_types:
        input_ids.append(TOKEN_ENT)
        words_mask.append(0)
        for tok in tokenize(entity_type):
            input_ids.append(tok)
            words_mask.append(0)
    input_ids.append(TOKEN_SEP)
    words_mask.append(0)
    word_id = 0
    for word in text_words:
        toks = tokenize(word)
        word_id += 1
        for k, tok in enumerate(toks):
            input_ids.append(tok)
            words_mask.append(word_id if k == 0 else 0)
    input_ids.append(TOKEN_END)
    words_mask.append(0)
    return input_ids, [1] * len(input_ids), words_mask, word_id, len(entity_types)


def make_span_tensors(num_words: int) -> tuple[np.ndarray, np.ndarray]:
    """span_idx (num_words*12, 2) + span_mask, gline-rs layout
    (gliner_onnx.rs:568-615): dim = start*12 + width, span = (start,
    start+width), masked true only while start+width < num_words."""
    num_spans = num_words * MAX_SPAN_WIDTH
    span_idx = np.zeros((num_spans, 2), dtype=np.int64)
    span_mask = np.zeros(num_spans, dtype=bool)
    for start in range(num_words):
        for width in range(min(MAX_SPAN_WIDTH, num_words - start)):
            dim = start * MAX_SPAN_WIDTH + width
            span_idx[dim, 0] = start
            span_idx[dim, 1] = start + width
            span_mask[dim] = True
    return span_idx, span_mask


def word_span_to_char_offsets(
    text: str, words: list[str], start_word: int, end_word: int
) -> tuple[int, int]:
    """Sequential-search word->char offsets (gliner_onnx.rs:874-930; the
    reference searches by byte — identical to char indices for ASCII; we
    index by chars, the Entity offset contract)."""
    if not words or start_word >= len(words) or end_word >= len(words) or start_word > end_word:
        return (0, 0)
    pos = 0
    start_c = 0
    end_c = len(text)
    for idx, word in enumerate(words):
        found = text.find(word, pos)
        if found < 0:
            break
        if idx == start_word:
            start_c = found
        if idx == end_word:
            end_c = found + len(word)
            break
        pos = found + len(word)
    return (start_c, end_c)


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def map_entity_type(type_str: str) -> str:
    """Zero-shot label -> canonical label (gliner_onnx.rs:862-872)."""
    t = type_str.lower()
    return {
        "person": "PER", "per": "PER",
        "organization": "ORG", "org": "ORG",
        "location": "LOC", "loc": "LOC", "gpe": "LOC",
        "date": "DATE", "time": "DATE",
        "money": "MONEY", "currency": "MONEY",
        "percent": "PERCENT", "percentage": "PERCENT",
    }.get(t, type_str)


def decode_output(
    output: np.ndarray,
    text: str,
    text_words: list[str],
    entity_types: list[str],
    threshold: float,
) -> list[Mention]:
    """Span-logit tensor -> mentions (gliner_onnx.rs:640-860). Accepts both
    exported shapes: [1, num_words, max_width, num_classes] and
    [1, num_spans, num_classes] (span dim = word*12 + width). Sigmoid then
    threshold; span text sliced from the source text."""
    out: list[Mention] = []
    n = len(text_words)
    arr = np.asarray(output, dtype=np.float32)
    if arr.size == 0:
        return out
    if arr.ndim == 4 and arr.shape[0] == 1:
        scores = _sigmoid(arr[0])
        for word_idx in range(min(arr.shape[1], n)):
            for width in range(min(arr.shape[2], MAX_SPAN_WIDTH)):
                end_word = word_idx + width
                if end_word >= n:
                    continue
                for class_idx in range(min(arr.shape[3], len(entity_types))):
                    score = float(scores[word_idx, width, class_idx])
                    if score >= threshold:
                        s, e = word_span_to_char_offsets(
                            text, text_words, word_idx, end_word
                        )
                        out.append(
                            Mention(
                                text[s:e], map_entity_type(entity_types[class_idx]),
                                s, e, score, "zero_shot", "model",
                            )
                        )
    elif arr.ndim == 3 and arr.shape[0] == 1:
        scores = _sigmoid(arr[0])
        for span_idx in range(arr.shape[1]):
            word_idx = span_idx // MAX_SPAN_WIDTH
            width = span_idx % MAX_SPAN_WIDTH
            end_word = word_idx + width
            if word_idx >= n or end_word >= n:
                continue
            for class_idx in range(min(arr.shape[2], len(entity_types))):
                score = float(scores[span_idx, class_idx])
                if score >= threshold:
                    s, e = word_span_to_char_offsets(
                        text, text_words, word_idx, end_word
                    )
                    out.append(
                        Mention(
                            text[s:e], map_entity_type(entity_types[class_idx]),
                            s, e, score, "zero_shot", "model",
                        )
                    )
    return out


class _LRU(OrderedDict):
    def __init__(self, maxsize: int):
        super().__init__()
        self.maxsize = maxsize

    def get_or(self, key, compute):
        if key in self:
            self.move_to_end(key)
            return self[key]
        val = compute()
        self[key] = val
        if len(self) > self.maxsize:
            self.popitem(last=False)
        return val


class ZeroShotNERActor:
    """GLiNER-style zero-shot NER actor.

    Constructor args are plain data (picklable); the heavy model load happens
    here, once per actor.
    """

    def __init__(
        self,
        labels: list[str],
        model_path: str | None = None,
        threshold: float = 0.5,
        fake: bool = False,
    ):
        self.labels = list(labels)
        self.threshold = threshold
        self.fake = fake
        self.prompt_cache = _LRU(PROMPT_CACHE_SIZE)
        self.model = self._load_model(model_path)

    def _load_model(self, model_path: str | None):
        """Real path: ONNX session + HF tokenizer loaded once per actor
        (gliner_onnx.rs:116-280). With a runtime + ``model_path`` pointing at
        a GLiNER ONNX export (tokenizer.json beside it), this stage runs live
        — no code change needed; only the import gate is container-specific."""
        if self.fake:
            return "fake"
        try:
            import onnxruntime
        except ImportError:
            raise NotImplementedError(
                "no ONNX runtime in this container; construct with fake=True "
                "to exercise the actor-pool plumbing with the deterministic "
                "stand-in scorer"
            ) from None
        if not model_path:
            raise ValueError("model_path required when fake=False")
        session = onnxruntime.InferenceSession(model_path)
        self.tokenizer = self._load_tokenizer(model_path)
        return session

    @staticmethod
    def _load_tokenizer(model_path: str):
        import os

        from tokenizers import Tokenizer  # HF tokenizers

        tok_path = os.path.join(os.path.dirname(model_path), "tokenizer.json")
        tok = Tokenizer.from_file(tok_path)
        return lambda word: tok.encode(word, add_special_tokens=False).ids

    def _prompt_key(self, labels: tuple[str, ...]) -> int:
        # FNV-style label-set hash, the cache key scheme of
        # gliner_onnx.rs:382-416
        h = 0xCBF29CE484222325
        for lab in labels:
            for b in lab.encode("utf-8"):
                h = ((h ^ b) * 0x100000001B3) & ((1 << 64) - 1)
        return h

    def _encode_prompt(self, labels: tuple[str, ...]):
        key = self._prompt_key(labels)
        return self.prompt_cache.get_or(key, lambda: {"key": key, "labels": labels})

    def _extract_one(self, text: str) -> list[Mention]:
        if not self.fake:
            return self._extract_real(text)
        # deterministic fake: "detect" capitalized words whose blake2 hash
        # selects a label; stands in for span-classification inference
        _prompt = self._encode_prompt(tuple(self.labels))
        out: list[Mention] = []
        pos = 0
        for word in text.split():
            start = text.index(word, pos)
            pos = start + len(word)
            clean = word.strip(".,!?;:'\"()")
            if len(clean) > 2 and clean[0].isupper():
                h = hashlib.blake2b(clean.lower().encode(), digest_size=4).digest()
                score = 0.5 + (h[0] / 512)
                if score >= self.threshold:
                    label = self.labels[h[1] % len(self.labels)]
                    s = start + (len(word) - len(word.lstrip(".,!?;:'\"(")))
                    out.append(
                        Mention(clean, label, s, s + len(clean), round(score, 4),
                                "zero_shot", "model")
                    )
        return out

    def _extract_real(self, text: str) -> list[Mention]:
        """Full GLiNER inference round trip (gliner_onnx.rs:285-380): encode
        prompt (LRU-cached per actor), build span tensors, run the session,
        decode. ``self.model`` is any object with onnxruntime's
        ``run(None, feeds) -> [output]`` contract — the unit tests drive this
        with a stub session, the production path with a real one."""
        if not text:
            return []
        text_words = text.split()
        if not text_words:
            return []
        key = (
            hashlib.blake2b(text.encode("utf-8"), digest_size=8).digest(),
            self._prompt_key(tuple(sorted(self.labels))),
        )
        input_ids, attention_mask, words_mask, n_words, _n_types = (
            self.prompt_cache.get_or(
                key,
                lambda: encode_prompt(self.tokenizer, text_words, self.labels),
            )
        )
        span_idx, span_mask = make_span_tensors(n_words)
        feeds = {
            "input_ids": np.asarray([input_ids], dtype=np.int64),
            "attention_mask": np.asarray([attention_mask], dtype=np.int64),
            "words_mask": np.asarray([words_mask], dtype=np.int64),
            "text_lengths": np.asarray([[n_words]], dtype=np.int64),
            "span_idx": span_idx[None, :, :],
            "span_mask": span_mask[None, :],
        }
        outputs = self.model.run(None, feeds)
        return decode_output(
            outputs[0], text, text_words, self.labels, self.threshold
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        texts = batch.column("text").to_pylist()
        out_url, out_text, out_label, out_start, out_end, out_conf = [], [], [], [], [], []
        for url, text in zip(urls, texts):
            for m in self._extract_one(text or ""):
                out_url.append(url)
                out_text.append(m.text)
                out_label.append(m.label)
                out_start.append(m.start)
                out_end.append(m.end)
                out_conf.append(m.conf)
        return pa.table(
            {
                "url": pa.array(out_url, pa.string()),
                "text": pa.array(out_text, pa.string()),
                "label": pa.array(out_label, pa.string()),
                "start": pa.array(out_start, pa.int64()),
                "end": pa.array(out_end, pa.int64()),
                "conf": pa.array(out_conf, pa.float64()),
            }
        )


def zero_shot_ner(
    ds,
    labels: list[str],
    *,
    threshold: float = 0.5,
    fake: bool = False,
    concurrency=(1, 4),
    batch_size: int = 16,
    num_cpus: float = 1,
):
    """(url, text) Dataset -> mention rows via the zero-shot actor pool."""
    register_for_ray()
    return ds.map_batches(
        ZeroShotNERActor,
        fn_constructor_kwargs={
            "labels": labels, "threshold": threshold, "fake": fake,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )


# --- M2: BERT token-classification NER (onnx.rs BertNEROnnx) ------------------
#
# Same seam design as the GLiNER path: encode/run/decode are code-complete
# and unit-tested against a stub session; a real onnxruntime session +
# tokenizer drop in without code changes.

# onnx.rs:229-238 fallback id2label (CoNLL-2003 layout)
BERT_DEFAULT_ID2LABEL = {
    0: "O",
    1: "B-MISC", 2: "I-MISC",
    3: "B-PER", 4: "I-PER",
    5: "B-ORG", 6: "I-ORG",
    7: "B-LOC", 8: "I-LOC",
}


def _bio_type_key(entity_label: str) -> str:
    """Type-merge key replicating the reference's discriminant comparison
    (onnx.rs:476-480 std::mem::discriminant): the known types are distinct,
    but ALL EntityType::Other(...) values share one discriminant — so any
    two unknown labels merge."""
    lab = entity_label.upper()
    return lab if lab in ("PER", "ORG", "LOC") else "OTHER"


def decode_bio_logits(
    logits: np.ndarray,
    text: str,
    offsets: list[tuple[int, int]],
    id2label: dict[int, str] | None = None,
) -> list[Mention]:
    """BIO decode of token-classification logits, replicating
    ``BertNEROnnx::decode_output`` (onnx.rs:336-560) exactly:

    - special tokens (char_start == char_end) FLUSH the open entity;
    - per-token argmax; confidence = softmax prob of the argmax
      (1 / sum(exp(l - max)), onnx.rs:421-430);
    - "O" flushes; "B-X" merges into the open entity when the type key
      matches AND char_start <= prev_end + 1 (adjacent subwords), else
      flushes and opens; "I-X" extends a type-matching open entity
      (keeping the OPEN entity's confidence) or flushes and opens;
    - emitted text is trimmed but the span keeps the raw offsets
      (reference behavior); whitespace-only surfaces are dropped.
    """
    if logits.ndim == 3:
        logits = logits[0]
    id2label = id2label or BERT_DEFAULT_ID2LABEL
    n_text = len(text)
    out: list[Mention] = []
    current: tuple[int, int, str, str, float] | None = None
    # (start, end, mention_label, type_key, conf)

    def flush():
        nonlocal current
        if current is None:
            return
        s, e, lab, _tk, conf = current
        current = None
        surface = text[s:e] if 0 <= s < e <= n_text else ""
        if surface.strip():
            out.append(
                Mention(surface.strip(), lab, s, e, round(float(conf), 4),
                        "bio", "bert_onnx")
            )

    seq_len = min(logits.shape[0], len(offsets))
    for ti in range(seq_len):
        cs, ce = offsets[ti]
        if cs == ce:
            flush()
            continue
        row = logits[ti]
        max_idx = int(np.argmax(row))
        exp_sum = float(np.sum(np.exp(row - row[max_idx])))
        conf = 1.0 / exp_sum if exp_sum > 0 else 0.0
        label = id2label.get(max_idx, f"LABEL_{max_idx}")
        if label == "O":
            flush()
            continue
        if label.startswith("B-"):
            bio, ent = "B", label[2:]
        elif label.startswith("I-"):
            bio, ent = "I", label[2:]
        else:
            bio, ent = "B", label
        tk = _bio_type_key(ent)
        mention_label = tk if tk != "OTHER" else ent.upper()
        if bio == "B":
            if current is not None and current[3] == tk and cs <= current[1] + 1:
                # adjacent same-type B: merge, keep the open entity's label
                # and confidence (onnx.rs:476-492)
                current = (current[0], ce, current[2], current[3], current[4])
            else:
                flush()
                current = (cs, ce, mention_label, tk, conf)
        else:  # "I"
            if current is not None and current[3] == tk:
                # extend; the reference keeps the open conf but takes the
                # NEW entity_type value (same discriminant) — visible only
                # for Other(...) labels (onnx.rs:517-525)
                current = (current[0], ce, mention_label, tk, current[4])
            else:
                flush()
                current = (cs, ce, mention_label, tk, conf)
    flush()
    return out


def validate_tokenizer_offsets(tokenize_with_offsets, text: str) -> None:
    """Contract check for a ``tokenize_with_offsets(text) -> (ids, offsets)``
    implementation against the conventions the BIO decode depends on
    (onnx.rs:277-292 ``encode(text, true)`` + ``get_offsets()``):

    - ids and offsets are the same length (one offset pair per token,
      special tokens INCLUDED — the decode relies on their (0, 0) pairs to
      flush open entities);
    - every offset is (start, end) with 0 <= start <= end <= len(text);
      special tokens are exactly (0, 0); real tokens have start < end;
    - the sequence starts and ends with a special token ([CLS]/[SEP] when
      add_special_tokens=True);
    - real-token offsets are non-decreasing and CHARACTER-indexed: the
      slice text[start:end] must be non-empty and contain no leading/
      trailing whitespace for word-piece tokens (a byte-indexed tokenizer
      drop-in fails this on any non-ASCII text);
    - real-token offsets TILE the text exactly: together they cover every
      non-whitespace character once and cover no whitespace. This is what
      catches the classic drop-in failures — inclusive-end spans (s, e-1)
      leave the last char of every word uncovered; one-shifted starts
      cover a space — that per-token checks cannot see.

    Raises ValueError on the first violation; call once at actor init with
    a clean multi-word probe text (no control chars) when plugging a real
    HF tokenizer so drift is caught before decoding."""
    ids, offsets = tokenize_with_offsets(text)
    if len(ids) != len(offsets):
        raise ValueError(
            f"ids/offsets length mismatch: {len(ids)} vs {len(offsets)}"
        )
    if not offsets:
        raise ValueError("empty encoding (specials must always be present)")
    if offsets[0] != (0, 0) or offsets[-1] != (0, 0):
        raise ValueError(
            f"first/last token must be special (0, 0) pairs, got "
            f"{offsets[0]} / {offsets[-1]}"
        )
    prev_end = 0
    n = len(text)
    for i, (s, e) in enumerate(offsets):
        if s == e:
            if (s, e) != (0, 0):
                raise ValueError(f"special token at {i} must be (0, 0), got {(s, e)}")
            continue
        if not (0 <= s < e <= n):
            raise ValueError(f"offset {(s, e)} at {i} out of bounds for len {n}")
        if s < prev_end - 0:
            # overlapping tokens are allowed by HF only for specials; real
            # tokens must advance
            if s < prev_end and e <= prev_end:
                raise ValueError(f"non-monotonic offsets at {i}: {(s, e)}")
        piece = text[s:e]
        if not piece or piece != piece.strip():
            raise ValueError(
                f"offset {(s, e)} at {i} does not slice a clean char span "
                f"(got {piece!r}) — byte-indexed offsets?"
            )
        prev_end = e
    covered = [0] * n
    for s, e in offsets:
        if (s, e) == (0, 0):
            continue
        for j in range(s, e):
            covered[j] += 1
    for j, c in enumerate(covered):
        is_space = text[j].isspace()
        if c == 0 and not is_space:
            raise ValueError(
                f"char {j} ({text[j]!r}) covered by no token — "
                f"inclusive-end (off-by-one) offsets?"
            )
        if c > 0 and is_space:
            raise ValueError(
                f"whitespace char {j} covered by a token — shifted offsets?"
            )
        if c > 1:
            raise ValueError(f"char {j} covered by {c} overlapping tokens")


class BertNERActor:
    """Actor-pool BERT NER (M2): ``__init__`` holds session + tokenizer once
    per actor; ``__call__`` decodes batches. ``tokenizer`` seam:
    ``tokenize_with_offsets(text) -> (input_ids, offsets)`` where offsets
    include the special tokens as (0, 0) pairs (HF tokenizers'
    ``encoding.get_offsets()`` contract, onnx.rs:282-292)."""

    def __init__(
        self,
        *,
        threshold: float = 0.0,
        fake: bool = False,
        model_path: str | None = None,
        id2label: dict[int, str] | None = None,
    ):
        self.threshold = threshold
        self.fake = fake
        self.id2label = id2label or BERT_DEFAULT_ID2LABEL
        self.model = None
        self.tokenizer = None
        if not fake:
            try:
                import onnxruntime  # noqa: F401
            except ImportError as e:
                raise NotImplementedError(
                    "BertNERActor(fake=False) needs onnxruntime (not in this "
                    "container); the encode/decode path is unit-tested with "
                    "a stub session"
                ) from e

    def _extract_real(self, text: str) -> list[Mention]:
        """Full round trip (onnx.rs:271-334): tokenize with offsets, build
        the three (1, seq) int64 feeds, run, BIO-decode 'logits'."""
        if not text:
            return []
        input_ids, offsets = self.tokenizer(text)
        seq = len(input_ids)
        feeds = {
            "input_ids": np.asarray([input_ids], dtype=np.int64),
            "attention_mask": np.ones((1, seq), dtype=np.int64),
            "token_type_ids": np.zeros((1, seq), dtype=np.int64),
        }
        outputs = self.model.run(None, feeds)
        ms = decode_bio_logits(outputs[0], text, offsets, self.id2label)
        return [m for m in ms if m.conf >= self.threshold]

    def _extract_fake(self, text: str) -> list[Mention]:
        """Deterministic stand-in: capitalized words hashed to BIO types."""
        out: list[Mention] = []
        pos = 0
        for word in text.split():
            start = text.index(word, pos)
            pos = start + len(word)
            clean = word.strip(".,!?;:'\"()")
            if len(clean) > 2 and clean[0].isupper():
                h = hashlib.blake2b(clean.lower().encode(), digest_size=2).digest()
                lab = ("PER", "ORG", "LOC", "MISC")[h[0] % 4]
                s = start + (len(word) - len(word.lstrip(".,!?;:'\"(")))
                out.append(
                    Mention(clean, lab, s, s + len(clean),
                            round(0.6 + h[1] / 1024, 4), "bio", "bert_onnx")
                )
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        texts = batch.column("text").to_pylist()
        cols = {"url": [], "text": [], "label": [], "start": [], "end": [], "conf": []}
        for url, text in zip(urls, texts):
            ms = (
                self._extract_fake(text or "")
                if self.fake or self.model is None
                else self._extract_real(text or "")
            )
            for m in ms:
                cols["url"].append(url)
                cols["text"].append(m.text)
                cols["label"].append(m.label)
                cols["start"].append(m.start)
                cols["end"].append(m.end)
                cols["conf"].append(m.conf)
        return pa.table(
            {
                "url": pa.array(cols["url"], pa.string()),
                "text": pa.array(cols["text"], pa.string()),
                "label": pa.array(cols["label"], pa.string()),
                "start": pa.array(cols["start"], pa.int64()),
                "end": pa.array(cols["end"], pa.int64()),
                "conf": pa.array(cols["conf"], pa.float64()),
            }
        )


def bert_ner(
    ds,
    *,
    threshold: float = 0.0,
    fake: bool = False,
    concurrency=(1, 4),
    batch_size: int = 16,
    num_cpus: float = 1,
):
    """(url, text) Dataset -> mention rows via the BERT actor pool (M2)."""
    register_for_ray()
    return ds.map_batches(
        BertNERActor,
        fn_constructor_kwargs={"threshold": threshold, "fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )
