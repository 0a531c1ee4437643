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

import pyarrow as pa

from ..core.types import Mention
from ..ray_utils import register_for_ray

PROMPT_CACHE_SIZE = 100  # gliner_onnx.rs:125 LruCache size


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
        if self.fake:
            return "fake"
        try:
            import onnxruntime  # noqa: F401
        except ImportError:
            raise NotImplementedError(
                "no ONNX runtime in this container; construct with fake=True "
                "to exercise the actor-pool plumbing with the deterministic "
                "stand-in scorer"
            ) from None
        raise NotImplementedError("real model loading not wired in this build")

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
