"""S3: URL resolver + CompositeResolver plugin chain.

Port of /root/reference/anno/src/ingest/url_resolver.rs:173-299:

- ``UrlResolver`` protocol: ``can_resolve(url)`` + ``resolve(url) ->
  ResolvedContent`` (text, metadata, source_url);
- ``HttpResolver``: GET with a 60 s timeout, non-200 -> error, HTML sniffing
  by leading ``<`` (after whitespace) -> byte-identical extractor (P1), else
  plain text; network access is feature-gated in the reference
  ("eval-advanced") and environment-gated here (this container has no
  network — the resolver raises the same kind of actionable error the
  reference raises without the feature);
- ``FileResolver``: ``file://`` URLs and bare paths (the CLI's file input),
  same content sniffing;
- ``CompositeResolver``: ordered chain with ``add_resolver`` plugin hook —
  the user-extension surface (SURVEY 2.11).

Batch use: ``resolve_urls(ds)`` maps a Dataset of url rows through a
resolver chain inside ``map_batches`` — each worker holds its own chain.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Protocol

from ..core.html import resolve_content


@dataclass(slots=True)
class ResolvedContent:
    text: str
    metadata: dict[str, str] = field(default_factory=dict)
    source_url: str = ""


class UrlResolver(Protocol):
    def can_resolve(self, url: str) -> bool: ...

    def resolve(self, url: str) -> ResolvedContent: ...


def _sniff_and_extract(content: str, url: str, source: str) -> ResolvedContent:
    """HTML sniff by leading '<' (url_resolver.rs:219-228), then the
    byte-identical P1 extractor; else plain text."""
    if content.lstrip().startswith("<"):
        return ResolvedContent(
            text=resolve_content(content),
            metadata={"content-type": "text/html", "source": source},
            source_url=url,
        )
    return ResolvedContent(
        text=content,
        metadata={"content-type": "text/plain", "source": source},
        source_url=url,
    )


class HttpResolver:
    """http(s):// resolver. The reference gates the network path behind the
    'eval-advanced' feature and errors actionably without it; this container
    has no network, so the same gate is expressed as ``allow_network``."""

    def __init__(self, *, allow_network: bool = False, timeout_sec: float = 60.0):
        self.allow_network = allow_network
        self.timeout_sec = timeout_sec

    def can_resolve(self, url: str) -> bool:
        return url.startswith("http://") or url.startswith("https://")

    def resolve(self, url: str) -> ResolvedContent:
        if not self.allow_network:
            raise ValueError(
                "URL resolution over the network is disabled in this "
                "environment; construct HttpResolver(allow_network=True) "
                "where outbound HTTP is permitted (reference analog: the "
                "'eval-advanced' feature gate, url_resolver.rs:236-247)"
            )
        from urllib.request import urlopen

        with urlopen(url, timeout=self.timeout_sec) as resp:  # noqa: S310
            if getattr(resp, "status", 200) != 200:
                raise ValueError(f"HTTP {resp.status} fetching {url}")
            content = resp.read().decode("utf-8", errors="replace")
        return _sniff_and_extract(content, url, "http")


class FileResolver:
    """file:// URLs and bare filesystem paths (the CLI file input path)."""

    def can_resolve(self, url: str) -> bool:
        import os

        if url.startswith("file://"):
            return True
        return not ("://" in url) and os.path.exists(url)

    def resolve(self, url: str) -> ResolvedContent:
        path = url[len("file://"):] if url.startswith("file://") else url
        with open(path, encoding="utf-8", errors="replace") as f:
            content = f.read()
        return _sniff_and_extract(content, url, "file")


class CallableResolver:
    """Adapter: (can_resolve_fn, resolve_fn) pair as a resolver — the
    lightest plugin form for user schemes (e.g. s3://, warc://)."""

    def __init__(
        self,
        can_resolve: Callable[[str], bool],
        resolve: Callable[[str], ResolvedContent],
    ):
        self._can = can_resolve
        self._resolve = resolve

    def can_resolve(self, url: str) -> bool:
        return self._can(url)

    def resolve(self, url: str) -> ResolvedContent:
        return self._resolve(url)


class CompositeResolver:
    """Ordered resolver chain (url_resolver.rs:250-299): first resolver whose
    ``can_resolve`` returns True wins; unknown schemes raise."""

    def __init__(self, resolvers: list | None = None):
        if resolvers is None:
            resolvers = [HttpResolver(), FileResolver()]
        self.resolvers = list(resolvers)

    def add_resolver(self, resolver) -> None:
        self.resolvers.append(resolver)

    def can_resolve(self, url: str) -> bool:
        return any(r.can_resolve(url) for r in self.resolvers)

    def resolve(self, url: str) -> ResolvedContent:
        for r in self.resolvers:
            if r.can_resolve(url):
                return r.resolve(url)
        raise ValueError(f"No resolver available for URL: {url}")


def resolve_urls(ds, *, make_chain: Callable[[], CompositeResolver] | None = None):
    """Dataset of (url) rows -> (url, text, content_type) via a per-worker
    resolver chain (stateless map_batches; the chain builder runs once per
    task, like the extractor automata)."""
    import pyarrow as pa

    from ..ray_utils import register_for_ray

    register_for_ray()
    factory = make_chain or CompositeResolver

    def kernel(b: pa.Table) -> pa.Table:
        chain = factory()
        texts, ctypes = [], []
        for url in b.column("url").to_pylist():
            rc = chain.resolve(url)
            texts.append(rc.text)
            ctypes.append(rc.metadata.get("content-type", ""))
        return pa.table(
            {
                "url": b.column("url"),
                "text": pa.array(texts, pa.string()),
                "content_type": pa.array(ctypes, pa.string()),
            }
        )

    return ds.map_batches(kernel, batch_format="pyarrow")
