"""Deterministic sorted partitioned parquet writer.

Globally-sorted output with byte-reproducible files, the resume-friendly
materialize layout of the north rule:

1. partition boundaries are derived DETERMINISTICALLY from a boundary-key
   list (e.g. the canonical mapping's node ids) — not from Ray's internal
   sort sampling, which varies run to run;
2. a TWO-PHASE filesystem shuffle replaces an object-store sort:
   - phase 1 (map): each input block splits its rows by range partition and
     appends partial parquet files under ``_spill/part=<k>/``;
   - phase 2 (merge): one Ray task per partition reads that partition's
     partials, sorts on (sort_keys + all remaining columns) for a total
     deterministic order, and writes ``part=<k>/data.parquet`` + manifest.
   This is the pattern that survives 100 TB: partials land next to the
   output (object store in production), merges are independent + resumable
   per partition, and no single shuffle materializes the whole table.
3. global order = concatenation of partitions in id order; bytes are
   identical across re-runs because membership and in-partition order are
   both deterministic.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..ray_utils import register_for_ray
from . import manifests as mf


def boundaries_from_keys(keys: list[str], num_partitions: int) -> list[str]:
    """K-1 deterministic range cuts from a sortable key universe."""
    if num_partitions <= 1 or not keys:
        return []
    ks = sorted(set(keys))
    cuts = []
    for i in range(1, num_partitions):
        idx = (i * len(ks)) // num_partitions
        if 0 < idx < len(ks):
            cuts.append(ks[idx])
    return sorted(set(cuts))


def weighted_boundaries(
    keys: list[str], counts: list[int] | np.ndarray, num_partitions: int
) -> list[str]:
    """K-1 range cuts weighted by observed per-key ROW VOLUME (not just the
    key universe): equal-frequency quantiles over the sampled distribution.

    ``boundaries_from_keys`` splits the distinct-key universe evenly, which
    balances NOTHING when row volume is skewed — in the KG materialize the
    non-coref node-id families (date:/email:/text: endpoints) all sorted past
    the last coref cut and one partition received 30% of all edge rows (a
    10.4 s sort straggler at 96k pages). Sampling actual keys and cutting at
    volume quantiles is the standard range-partitioner fix (what Spark's
    RangePartitioner does via sampling)."""
    if num_partitions <= 1 or not keys:
        return []
    ks = np.asarray(keys, dtype=object)
    cs = np.asarray(counts, dtype=np.int64)
    order = np.argsort(ks, kind="stable")
    ks, cs = ks[order], cs[order]
    cum = np.cumsum(cs)
    total = int(cum[-1])
    if total <= 0:
        return []
    cuts = []
    for i in range(1, num_partitions):
        idx = int(np.searchsorted(cum, (i * total) / num_partitions, side="left"))
        if 0 < idx < len(ks):
            cuts.append(str(ks[idx]))
    return sorted(set(cuts))


def _batch_tag(batch: pa.Table, key: str) -> str:
    """Deterministic per-batch tag -> idempotent spill filenames under task
    retry (a retried block overwrites its own partials instead of appending
    duplicates). Hashes EVERY key value, not a sample: two distinct batches
    with equal row counts and coincidentally equal sampled keys must not
    collide (they would silently overwrite each other's spill files).
    One join + one hash update (vectorized) — the per-row blake2b loop this
    replaces was ~0.2 s per 100k-row batch in the fused materialize pass."""
    import hashlib

    h = hashlib.blake2b(digest_size=10)
    h.update(str(batch.num_rows).encode())
    vals = pc.cast(batch.column(key), pa.string()).to_pylist()
    joined = "\x1f".join("\x1eNULL" if v is None else v for v in vals)
    h.update(joined.encode("utf-8", "replace"))
    return h.hexdigest()


def spill_batch(
    batch: pa.Table, spill_dir: str, key: str, cuts: np.ndarray | None, tag_key: str
) -> int:
    """Split one batch by range partition and write partials; returns rows."""
    import pyarrow.parquet as pq

    if batch.num_rows == 0:
        return 0
    keys = np.array(batch.column(key).to_pylist(), dtype=object)
    if cuts is not None and len(cuts):
        pids = np.searchsorted(cuts, keys, side="right")
    else:
        pids = np.zeros(len(keys), dtype=np.int64)
    order = np.argsort(pids, kind="stable")
    sorted_pids = pids[order]
    starts = np.flatnonzero(np.r_[True, sorted_pids[1:] != sorted_pids[:-1]])
    ends = np.r_[starts[1:], len(sorted_pids)]
    tag = _batch_tag(batch, tag_key)
    for s, e in zip(starts, ends):
        pid = int(sorted_pids[s])
        part = batch.take(pa.array(order[s:e]))
        pdir = os.path.join(spill_dir, f"part={pid:05d}")
        os.makedirs(pdir, exist_ok=True)
        tmp = os.path.join(pdir, f"{tag}.parquet.tmp")
        pq.write_table(part, tmp)
        os.replace(tmp, os.path.join(pdir, f"{tag}.parquet"))
    return batch.num_rows


class _SpillWriter:
    """Phase-1 kernel: split each batch by range partition, append partials."""

    def __init__(self, spill_dir: str, key: str, cuts: list[str]):
        self.spill_dir = spill_dir
        self.key = key
        self.cuts = np.array(cuts, dtype=object) if cuts else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = spill_batch(batch, self.spill_dir, self.key, self.cuts, self.key)
        return pa.table({"rows": pa.array([rows], pa.int64())})


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
    fingerprint: str | None = None,
) -> dict:
    """Write a Dataset as deterministic sorted range partitions + manifests."""
    import ray

    register_for_ray()
    pk = partition_key or sort_keys[0]
    cuts = (
        boundaries_from_keys(boundary_keys or [], num_partitions)
        if boundary_keys
        else []
    )
    n_parts = len(cuts) + 1

    done = mf.completed_partitions(out_dir, stage) if resume else {}
    if resume and fingerprint is not None:
        # a completed partition only counts if it was derived from the SAME
        # upstream generation (docs + mapping); stale ones are rewritten
        done = {
            pid: m
            for pid, m in done.items()
            if m.get("metrics", {}).get("fingerprint") == fingerprint
        }
    spill_dir = os.path.join(out_dir, stage, "_spill")
    shutil.rmtree(spill_dir, ignore_errors=True)

    # phase 1: spill partials (streaming; consumes the dataset once)
    try:
        pool_hi = max(4, int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        pool_hi = 8
    spilled = ds.map_batches(
        _SpillWriter,
        fn_constructor_args=(spill_dir, pk, cuts),
        batch_format="pyarrow",
        concurrency=(1, pool_hi) if pool_hi >= 12 else (1, max(2, pool_hi - 1)),
    )
    total_in = sum(r["rows"] for r in spilled.take_all())
    try:  # persist ds.stats() for the spill pass (observability)
        os.makedirs(os.path.join(out_dir, stage), exist_ok=True)
        with open(
            os.path.join(out_dir, stage, "_ray_stats.txt"), "w", encoding="utf-8"
        ) as f:
            f.write(spilled.stats())
    except Exception:
        pass

    stats = merge_spilled(
        spill_dir, out_dir, stage,
        sort_keys=sort_keys, n_parts=n_parts, done=done, fingerprint=fingerprint,
    )
    stats["rows_in"] = int(total_in)
    return stats


def merge_spilled(
    spill_dir: str,
    out_dir: str,
    stage: str,
    *,
    sort_keys: list[str],
    n_parts: int,
    done: dict | None = None,
    fingerprint: str | None = None,
) -> dict:
    """Phase 2: one merge task per partition (independent -> resumable).

    ``fingerprint`` identifies the upstream inputs (docs + canonical mapping);
    it is recorded in each partition manifest so a later resume can invalidate
    partitions written from a different generation of the inputs."""
    import ray

    done = done or {}

    @ray.remote
    def merge_partition(pid: int) -> tuple:
        import time as _time

        import pyarrow.parquet as pq

        t_a = _time.time()
        pid_s = f"{pid:05d}"
        pdir = os.path.join(spill_dir, f"part={pid_s}")
        if not os.path.isdir(pdir):
            tbl = None
        else:
            files = sorted(
                os.path.join(pdir, f)
                for f in os.listdir(pdir)
                if f.endswith(".parquet")
            )
            # threaded multi-file read (partitioning=None: the part=NNNNN
            # dir name must not be hive-inferred as a column); file order
            # does not matter because the sort below is a TOTAL order over
            # all columns (only fully identical rows can tie, and those are
            # byte-interchangeable)
            tbl = pq.read_table(files, partitioning=None) if files else None
        if tbl is None or tbl.num_rows == 0:
            return 0, 0.0, 0.0, 0.0
        # one ragged chunk per spill file makes the multi-key sort ~3.5x
        # slower (scattered buffers defeat the comparator's cache locality);
        # compacting first is ~0.02 s and pays for itself many times over
        # (A/B on the 14.25M-row merge fan: 9-12 s wall -> 4.6-7 s)
        tbl = tbl.combine_chunks()
        t_b = _time.time()
        # total deterministic order: sort keys first, then every other column
        all_keys = list(sort_keys) + [
            c for c in tbl.column_names if c not in sort_keys
        ]
        order = pc.sort_indices(
            tbl, sort_keys=[(k, "ascending") for k in all_keys]
        )
        tbl = tbl.take(order)
        t_c = _time.time()
        mf.write_partition(
            out_dir, stage, pid_s, tbl,
            inputs=[f"range<{pid_s}>"],
            metrics={"rows": tbl.num_rows, "fingerprint": fingerprint},
        )
        t_d = _time.time()
        return tbl.num_rows, t_b - t_a, t_c - t_b, t_d - t_c

    pending = [p for p in range(n_parts) if f"{p:05d}" not in done]
    # clear stale output before rewriting: a previous generation may have
    # used a different partition layout (data-dependent cuts), so any part
    # dir/manifest that is not a kept completed partition is removed — a
    # pending partition that ends up EMPTY this run would otherwise leave
    # the old generation's rows on disk
    stage_dir = os.path.join(out_dir, stage)
    if os.path.isdir(stage_dir):
        keep = {f"part={pid}" for pid in (done or {})}
        for d in os.listdir(stage_dir):
            if d.startswith("part=") and d not in keep:
                shutil.rmtree(os.path.join(stage_dir, d), ignore_errors=True)
        man_dir = os.path.join(stage_dir, "_manifests")
        if os.path.isdir(man_dir):
            for f in os.listdir(man_dir):
                if f.endswith(".json") and f[:-5] not in (done or {}):
                    try:
                        os.remove(os.path.join(man_dir, f))
                    except OSError:
                        pass
    results = ray.get([merge_partition.remote(p) for p in pending])
    if not os.environ.get("ANNO_KEEP_SPILL"):  # debug: keep partials for analysis
        shutil.rmtree(spill_dir, ignore_errors=True)
    return {
        "stage": stage,
        "partitions": n_parts,
        "rows_written": int(sum(r[0] for r in results)),
        "partitions_skipped": n_parts - len(pending),
        # summed task-side phase seconds (cpu-seconds across the merge fan;
        # divide by cluster CPUs for the wall-clock contribution)
        "merge_read_s": round(sum(r[1] for r in results), 2),
        "merge_sort_s": round(sum(r[2] for r in results), 2),
        "merge_write_s": round(sum(r[3] for r in results), 2),
    }


def read_stage(out_dir: str, stage: str):
    """Read a written stage back as a Dataset (partition order = key order)."""
    import ray.data

    base = os.path.join(out_dir, stage)
    parts = sorted(
        os.path.join(base, d, "data.parquet")
        for d in os.listdir(base)
        if d.startswith("part=")
    )
    return ray.data.read_parquet(parts)
