"""Per-partition lineage manifests + checkpoint resume (north-rule O3/resume).

Output layout (the reference has no checkpointing — grounded.rs:2924 holds the
whole corpus in one heap; this module is the from-scratch scale design):

    out_dir/
      <stage>/part=<partition_id>/*.parquet     # idempotent per partition
      <stage>/_manifests/<partition_id>.json    # written AFTER the data

A manifest records the input fragment list, row count, content hash and
timestamps. Resume = list manifests, skip input fragments whose partition is
complete, re-run the rest. Writes are idempotent because a partition's output
directory is derived from the partition id and fully rewritten.
"""

from __future__ import annotations

import hashlib
import json
import os
import time


def manifest_dir(out_dir: str, stage: str) -> str:
    return os.path.join(out_dir, stage, "_manifests")


def partition_dir(out_dir: str, stage: str, partition_id: str) -> str:
    return os.path.join(out_dir, stage, f"part={partition_id}")


def completed_partitions(out_dir: str, stage: str) -> dict[str, dict]:
    """partition_id -> manifest for all completed partitions."""
    mdir = manifest_dir(out_dir, stage)
    if not os.path.isdir(mdir):
        return {}
    out = {}
    for name in os.listdir(mdir):
        if not name.endswith(".json"):
            continue
        try:
            with open(os.path.join(mdir, name), encoding="utf-8") as f:
                m = json.load(f)
            out[m["partition_id"]] = m
        except (json.JSONDecodeError, KeyError, OSError):
            continue  # partial/corrupt manifest == incomplete partition
    return out


def write_partition(
    out_dir: str,
    stage: str,
    partition_id: str,
    table,
    inputs: list[str],
    metrics: dict | None = None,
    side_tables: dict | None = None,
) -> dict:
    """Write one partition's parquet + manifest (manifest last = commit).

    ``side_tables`` ({name: pa.Table}) are small per-partition byproducts
    (e.g. the distinct-surface combiner output) committed under the same
    manifest: they are written BEFORE the manifest, so a partition is only
    ever observed complete with all its side tables present."""
    import pyarrow.parquet as pq

    pdir = partition_dir(out_dir, stage, partition_id)
    os.makedirs(pdir, exist_ok=True)
    data_path = os.path.join(pdir, "data.parquet")
    tmp_path = data_path + ".tmp"
    pq.write_table(table, tmp_path)
    os.replace(tmp_path, data_path)
    for name, side in (side_tables or {}).items():
        # side tables live under an underscore-prefixed sibling dir so the
        # stage's own `read_parquet(<stage dir>)` globs never see them
        sdir = os.path.join(out_dir, stage, "_side", name)
        os.makedirs(sdir, exist_ok=True)
        spath = os.path.join(sdir, f"{partition_id}.parquet")
        pq.write_table(side, spath + ".tmp")
        os.replace(spath + ".tmp", spath)

    h = hashlib.blake2b(digest_size=16)
    with open(data_path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)

    manifest = {
        "partition_id": partition_id,
        "stage": stage,
        "inputs": inputs,
        "num_rows": table.num_rows,
        "content_hash": h.hexdigest(),
        "written_at": time.time(),
        "metrics": metrics or {},
    }
    mdir = manifest_dir(out_dir, stage)
    os.makedirs(mdir, exist_ok=True)
    mpath = os.path.join(mdir, f"{partition_id}.json")
    tmp_m = mpath + ".tmp"
    with open(tmp_m, "w", encoding="utf-8") as f:
        json.dump(manifest, f)
    os.replace(tmp_m, mpath)
    return manifest


def pending_inputs(
    out_dir: str, stage: str, inputs: list[str], partition_of
) -> tuple[list[str], list[str]]:
    """Split inputs into (pending, skipped) based on completed manifests.

    ``partition_of(input) -> partition_id``. An input is skipped iff its
    partition's manifest exists AND lists it.
    """
    done = completed_partitions(out_dir, stage)
    done_inputs = set()
    for m in done.values():
        done_inputs.update(m.get("inputs", []))
    pending = [p for p in inputs if p not in done_inputs]
    skipped = [p for p in inputs if p in done_inputs]
    return pending, skipped
