"""Input connectors (S1/S2/S4): directory text reader, JSONL doc import,
pages parquet.

- ``read_text_dir``: walk a directory for .txt/.md (configurable extensions,
  recursive) into (url, html, lang) page rows — the Ray-native version of the
  reference's directory reader (anno/src/cli/commands/crossdoc.rs:527-575);
- ``read_docs_jsonl``: one JSON document per line with (id|doc_id|url,
  text) fields — the GroundedDocument-JSONL import path
  (crossdoc.rs:245-424) reduced to the columns the engine consumes;
- ``read_pages``: the north-rule parquet shape (url, warc_ts, html, text,
  lang) with column pruning.
"""

from __future__ import annotations

import os

import pyarrow as pa

from ..ray_utils import register_for_ray

DEFAULT_EXTENSIONS = (".txt", ".md")


def read_text_dir(
    path: str,
    *,
    extensions: tuple[str, ...] = DEFAULT_EXTENSIONS,
    recursive: bool = True,
):
    """Directory of text files -> pages Dataset (url=file://..., html=bytes)."""
    import ray.data

    register_for_ray()
    paths: list[str] = []
    if recursive:
        for root, _dirs, files in os.walk(path):
            for f in sorted(files):
                if f.endswith(extensions):
                    paths.append(os.path.join(root, f))
    else:
        paths = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(extensions)
        )
    ds = ray.data.read_binary_files(paths, include_paths=True)

    def to_pages(batch: pa.Table) -> pa.Table:
        file_paths = batch.column("path").to_pylist()
        payloads = batch.column("bytes").to_pylist()
        return pa.table(
            {
                "url": pa.array([f"file://{p}" for p in file_paths], pa.string()),
                "html": pa.array(payloads, pa.binary()),
                "lang": pa.array([""] * len(file_paths), pa.string()),
            }
        )

    return ds.map_batches(to_pages, batch_format="pyarrow")


def read_docs_jsonl(path: str):
    """JSONL docs -> pages Dataset. Accepts id/doc_id/url + text fields."""
    import ray.data

    register_for_ray()
    ds = ray.data.read_json(path)

    def to_pages(batch: pa.Table) -> pa.Table:
        cols = batch.column_names
        n = batch.num_rows
        if "url" in cols:
            urls = [str(u) for u in batch.column("url").to_pylist()]
        elif "doc_id" in cols:
            urls = [f"doc://{i}" for i in batch.column("doc_id").to_pylist()]
        elif "id" in cols:
            urls = [f"doc://{i}" for i in batch.column("id").to_pylist()]
        else:
            urls = [f"doc://row{i}" for i in range(n)]
        texts = (
            batch.column("text").to_pylist() if "text" in cols else [""] * n
        )
        langs = (
            [str(x) for x in batch.column("lang").to_pylist()]
            if "lang" in cols
            else [""] * n
        )
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "html": pa.array(
                    [(t or "").encode("utf-8") for t in texts], pa.binary()
                ),
                "lang": pa.array(langs, pa.string()),
            }
        )

    return ds.map_batches(to_pages, batch_format="pyarrow")


def read_pages(path: str, *, columns: list[str] | None = None):
    """North-rule pages parquet (url, warc_ts, html, text, lang), pruned."""
    import ray.data

    register_for_ray()
    return ray.data.read_parquet(path, columns=columns or ["url", "html", "lang"])
