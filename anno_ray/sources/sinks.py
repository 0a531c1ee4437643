"""Output writers (S5): JSONL / TSV / grounded-JSON exports.

The canonical outputs are the sorted node/edge Parquet tables
(state/writer.py); these writers cover the reference's serialization
surfaces (anno-cli/src/main.rs:448-561 extract writers; crossdoc output
section; pipeline.rs:220-297): per-doc grounded JSON (text stats + mentions
+ tracks + triples), flat mentions TSV, and plain JSONL.
"""

from __future__ import annotations

import json

import pyarrow as pa

from ..ray_utils import register_for_ray


def write_docs_jsonl(docs, path_dir: str):
    """docs Dataset -> JSONL files, one grounded document per line
    (columns renamed to the grounded-document field names)."""
    register_for_ray()

    def rename(batch: pa.Table) -> pa.Table:
        names = {"mentions": "signals", "triples": "relations"}
        return batch.rename_columns(
            [names.get(c, c) for c in batch.column_names]
        )

    docs.map_batches(rename, batch_format="pyarrow").write_json(path_dir)
    return path_dir


def mentions_tsv(mentions) -> str:
    """Flat mentions Dataset -> TSV string (small results; driver-side)."""
    tbl = (
        mentions
        if isinstance(mentions, pa.Table)
        else pa.concat_tables(
            [b for b in mentions.iter_batches(batch_format="pyarrow")],
            promote_options="permissive",
        )
    )
    cols = tbl.column_names
    out = ["\t".join(cols)]
    for row in tbl.to_pylist():
        out.append(
            "\t".join(
                str(row[c]).replace("\t", " ").replace("\n", " ") for c in cols
            )
        )
    return "\n".join(out) + "\n"


def write_parquet(ds, path: str, **kwargs):
    """Thin passthrough (symmetry with readers)."""
    return ds.write_parquet(path, **kwargs)
