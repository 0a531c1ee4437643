"""User-extension surface (SURVEY 2.11): pluggable extractors + lexicons.

Mirrors the reference's sealed ``Model`` trait
(/root/reference/anno/src/lib.rs:116-135) and capability traits
(lib.rs:145-215) as a Python protocol + registry:

- an **Extractor** is any callable ``(text: str) -> list[Mention]`` with
  optional attributes ``name``, ``batch_size`` (the ``BatchCapable``
  ``optimal_batch_size`` analog -> map_batches batch_size hint) and
  ``supported_types``;
- ``register``/``get_extractor`` manage the name registry (the analog of the
  reference's backend catalog/router, backends/catalog.rs);
- ``build_stack`` composes registered layers with a conflict strategy — the
  ``StackedNER::builder`` equivalent (stacked.rs:128-160);
- ``Lexicon`` providers supply alias tables for the linker (the ``Lexicon``
  trait, anno-core/src/entity.rs:885-906).
"""

from __future__ import annotations

from collections.abc import Callable

from ..core import heuristic_ner, regex_ner, stacked
from ..core.types import Mention

Extractor = Callable[[str], list[Mention]]

_REGISTRY: dict[str, Extractor] = {}


def register(name: str, extractor: Extractor, *, batch_size: int | None = None) -> None:
    if batch_size is not None:
        try:
            extractor.batch_size = batch_size  # type: ignore[attr-defined]
        except AttributeError:
            pass
    _REGISTRY[name] = extractor


def get_extractor(name: str) -> Extractor:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown extractor {name!r}; available: {sorted(_REGISTRY)}"
        ) from None


def available() -> list[str]:
    return sorted(_REGISTRY)


def build_stack(
    layer_names: list[str], strategy: str = stacked.PRIORITY
) -> Extractor:
    """Compose registered layers into one stacked extractor."""
    layers = [get_extractor(n) for n in layer_names]

    def run(text: str) -> list[Mention]:
        return stacked.extract(text, layers=layers, strategy=strategy)

    run.name = "+".join(layer_names)  # type: ignore[attr-defined]
    return run


class DictLexicon:
    """Exact-lookup alias table: surface -> (kb_id, description).
    The HashMapLexicon analog (entity.rs:885-964)."""

    def __init__(self, table: dict[str, tuple[str, str]]):
        self.table = {k.lower(): v for k, v in table.items()}

    def lookup(self, surface: str) -> tuple[str, str]:
        return self.table.get(surface.lower(), ("", ""))


class MockExtractor:
    """Deterministic test double (the reference MockModel, lib.rs:286-419):
    returns fixed mentions for texts containing trigger substrings."""

    name = "mock"
    batch_size = 64

    def __init__(self, table: dict[str, tuple[str, str]] | None = None):
        # substring -> (label, conf)
        self.table = table or {"MOCKENT": ("PER", 0.99)}

    def __call__(self, text: str) -> list[Mention]:
        out = []
        for needle, (label, conf) in self.table.items():
            start = 0
            while True:
                i = text.find(needle, start)
                if i == -1:
                    break
                out.append(Mention(needle, label, i, i + len(needle), conf, "mock", "mock"))
                start = i + len(needle)
        out.sort(key=lambda m: m.start)
        return out


# default registry contents (the always-available reference backends)
register("regex", regex_ner.extract, batch_size=64)
register("heuristic", heuristic_ner.extract, batch_size=16)
register("stacked", stacked.extract)
register("mock", MockExtractor())
