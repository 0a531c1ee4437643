"""Deterministic sorted partitioned parquet writer.

Globally-sorted output with byte-reproducible files, the resume-friendly
materialize layout of the north rule:

1. partition boundaries are derived DETERMINISTICALLY from a boundary-key
   list (e.g. the canonical mapping's node ids) — not from Ray's internal
   sort sampling, which varies run to run;
2. rows are routed to their range partition inside ``map_batches``
   (np.searchsorted — vectorized);
3. ``groupby(partition).map_groups`` sorts each partition's rows and writes
   ``part=<k>/data.parquet`` + a lineage manifest; bytes are identical across
   re-runs because both membership and in-partition order are deterministic;
4. global order = concatenation of partitions in id order.

Each partition is written independently -> a failed run resumes by re-running
only partitions without manifests.
"""

from __future__ import annotations

import bisect

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..ray_utils import register_for_ray
from . import manifests as mf


def boundaries_from_keys(keys: list[str], num_partitions: int) -> list[str]:
    """K-1 deterministic range cuts from a sorted (or sortable) key sample."""
    if num_partitions <= 1 or not keys:
        return []
    ks = sorted(set(keys))
    cuts = []
    for i in range(1, num_partitions):
        idx = (i * len(ks)) // num_partitions
        if 0 < idx < len(ks):
            cuts.append(ks[idx])
    return sorted(set(cuts))


def _assign_partitions(batch: pa.Table, key: str, cuts: list[str]) -> pa.Table:
    keys = batch.column(key).to_pylist()
    if cuts:
        pids = np.searchsorted(np.array(cuts, dtype=object), np.array(keys, dtype=object), side="right")
    else:
        pids = np.zeros(len(keys), dtype=np.int64)
    return batch.append_column("__part", pa.array(pids.astype(np.int64), pa.int64()))


def write_sorted(
    ds,
    out_dir: str,
    stage: str,
    *,
    sort_keys: list[str],
    partition_key: str | None = None,
    boundary_keys: list[str] | None = None,
    num_partitions: int = 8,
    resume: bool = True,
) -> dict:
    """Write a Dataset as deterministic sorted range partitions + manifests."""
    register_for_ray()
    pk = partition_key or sort_keys[0]
    cuts = boundaries_from_keys(boundary_keys or [], num_partitions) if boundary_keys else []

    done = mf.completed_partitions(out_dir, stage) if resume else {}

    def write_group(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"partition_id": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64())})
        pid_val = group.column("__part")[0].as_py()
        pid = f"{pid_val:05d}"
        group = group.drop_columns(["__part"])
        order = pc.sort_indices(
            group, sort_keys=[(k, "ascending") for k in sort_keys]
        )
        group = group.take(order)
        if pid in done:
            return pa.table({"partition_id": pa.array([pid], pa.string()),
                             "rows": pa.array([0], pa.int64())})
        mf.write_partition(
            out_dir, stage, pid, group,
            inputs=[f"range<{pid}>"],
            metrics={"rows": group.num_rows},
        )
        return pa.table({"partition_id": pa.array([pid], pa.string()),
                         "rows": pa.array([group.num_rows], pa.int64())})

    routed = ds.map_batches(
        lambda b: _assign_partitions(b, pk, cuts), batch_format="pyarrow"
    )
    stats = routed.groupby("__part").map_groups(write_group, batch_format="pyarrow")
    rows = stats.to_pandas()
    return {
        "stage": stage,
        "partitions": int(rows.shape[0]),
        "rows_written": int(rows["rows"].sum()) if rows.shape[0] else 0,
    }


def read_stage(out_dir: str, stage: str):
    """Read a written stage back as a Dataset (partition order = key order)."""
    import os

    import ray.data

    base = os.path.join(out_dir, stage)
    parts = sorted(
        os.path.join(base, d, "data.parquet")
        for d in os.listdir(base)
        if d.startswith("part=")
    )
    return ray.data.read_parquet(parts)
