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


class _SpillFunnel:
    """Per-node spill-consolidation writer actor (Spark-style shuffle-file
    consolidation). Producer tasks send their per-partition batch slices
    here instead of each writing its own file; the funnel buffers rows per
    (family, partition) and flushes CONSOLIDATED parquet files, so the
    spill-file count is O(n_funnels x n_parts x flushes) — independent of
    the task count (the raw pattern is n_tasks x n_parts files, which at
    192k pages meant 27.7k tiny files and an open/footer-bound merge).

    Retry idempotency is by CONTENT TAG: every (family, pid, tag) is
    recorded in ``_seen`` and a duplicate send (a retried producer task
    re-emitting the same batch) is dropped. A funnel DEATH loses its
    buffered rows and its seen-set — the failure domain is the whole spill
    stage (clear the spill dir and re-run), exactly like losing a shuffle
    file in Spark resubmits the map stage. Producers ``ray.get`` their
    append before returning, so task completion implies delivery.

    Placement note (multi-node): instantiate one funnel per node with
    ``NodeAffinitySchedulingStrategy`` so producer->funnel traffic stays on
    the node-local object store and files per partition = n_nodes x
    flushes. In this single-node sandbox the group is sharded by CPU
    budget instead and routed by ``pid % n`` (each partition converges to
    ONE funnel — push-based-shuffle shape, strictly fewer files)."""

    def __init__(self, flush_rows: int = 400_000, max_buffer_rows: int = 2_000_000):
        import uuid

        self.flush_rows = flush_rows
        self.max_buffer_rows = max_buffer_rows
        self._buf: dict[tuple, list] = {}
        self._rows: dict[tuple, int] = {}
        self._total = 0
        self._seen: set = set()
        self._seq = 0
        self._uid = uuid.uuid4().hex[:8]

    def append(self, spill_dir: str, parts: list) -> int:
        """parts: [(pid, tag, table), ...] — one slice per range partition."""
        accepted = 0
        for pid, tag, tbl in parts:
            sk = (spill_dir, pid, tag)
            if sk in self._seen:
                continue  # retried producer task: content already accepted
            self._seen.add(sk)
            key = (spill_dir, pid)
            self._buf.setdefault(key, []).append(tbl)
            self._rows[key] = self._rows.get(key, 0) + tbl.num_rows
            self._total += tbl.num_rows
            accepted += tbl.num_rows
            if self._rows[key] >= self.flush_rows:
                self._flush(key)
        while self._total >= self.max_buffer_rows and self._rows:
            self._flush(max(self._rows, key=self._rows.get))
        return accepted

    def _flush(self, key: tuple) -> None:
        import pyarrow.parquet as pq

        spill_dir, pid = key
        tbls = self._buf.pop(key, [])
        self._total -= self._rows.pop(key, 0)
        if not tbls:
            return
        # compact before writing: a hundred ragged slice-chunks would write
        # as many tiny row groups, making the downstream merge read
        # footer/row-group-bound again — the exact failure consolidation
        # exists to avoid
        tbl = pa.concat_tables(tbls, promote_options="permissive").combine_chunks()
        pdir = os.path.join(spill_dir, f"part={int(pid):05d}")
        os.makedirs(pdir, exist_ok=True)
        self._seq += 1
        name = f"c{self._uid}-{self._seq:06d}"
        tmp = os.path.join(pdir, f"{name}.parquet.tmp")
        pq.write_table(tbl, tmp)
        os.replace(tmp, os.path.join(pdir, f"{name}.parquet"))

    def flush_all(self) -> bool:
        for key in list(self._buf):
            self._flush(key)
        return True


def create_spill_funnels(n: int | None = None, *, flush_rows: int = 400_000):
    """Spawn the consolidation funnel group. ``n`` defaults to one funnel
    per ~8 CPUs (the write path is compression-bound; more funnels only
    add files). Each funnel reserves half a CPU: they are I/O-dominated,
    and a full-CPU reservation can deadlock a small cluster where the
    producer pool, the input read tasks, and the funnels all compete for
    the same handful of slots. Returns a list of actor handles."""
    import ray

    if n is None:
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        n = max(1, cpus // 4)
    actor = ray.remote(num_cpus=0.5)(_SpillFunnel)
    return [actor.remote(flush_rows=flush_rows) for _ in range(n)]


def close_spill_funnels(funnels) -> None:
    """Flush every funnel's buffers to disk, then release the actors.
    MUST run after the producing map_batches has fully completed and
    before any merge task reads the spill dirs."""
    import ray

    ray.get([f.flush_all.remote() for f in funnels])
    for f in funnels:
        ray.kill(f)


def spill_batch(
    batch: pa.Table,
    spill_dir: str,
    key: str,
    cuts: np.ndarray | None,
    tag_key: str,
    funnels: list | None = None,
) -> int:
    """Split one batch by range partition and write partials; returns rows.

    With ``funnels`` (consolidation actor handles), each partition slice is
    routed to ``funnels[pid % n]`` and the call blocks until the funnel has
    accepted it (so a completed producer task implies delivered rows);
    without, each slice is written directly as a content-tag-named file
    (idempotent under retry by overwrite)."""
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
    if funnels:
        import ray

        # ONE append call per batch: all partition slices ride together to a
        # single funnel picked by the batch tag (content-stable, so a retried
        # task lands on the same funnel and the seen-set dedups it). Files
        # per partition = n_funnels x flushes — task-count-independent —
        # at one actor round-trip per batch instead of one per partition.
        parts = [
            (int(sorted_pids[s]), tag, batch.take(pa.array(order[s:e])))
            for s, e in zip(starts, ends)
        ]
        fi = int(tag[:8], 16) % len(funnels)
        ray.get(funnels[fi].append.remote(spill_dir, parts))
        return batch.num_rows
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

    def __init__(self, spill_dir: str, key: str, cuts: list[str], funnels=None):
        self.spill_dir = spill_dir
        self.key = key
        self.cuts = np.array(cuts, dtype=object) if cuts else None
        self.funnels = funnels

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = spill_batch(
            batch, self.spill_dir, self.key, self.cuts, self.key,
            funnels=self.funnels,
        )
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

    # phase 1: spill partials (streaming; consumes the dataset once).
    # Wide layouts route through consolidation funnels so the spill-file
    # count stays O(n_funnels x n_parts), never O(n_tasks x n_parts)
    # (ANNO_SPILL_FUNNELS=0 disables, >0 forces the funnel count).
    try:
        pool_hi = max(4, int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        pool_hi = 8
    env_funnels = int(os.environ.get("ANNO_SPILL_FUNNELS", "-1"))
    funnels = None
    if env_funnels != 0 and (env_funnels > 0 or n_parts > 32):
        funnels = create_spill_funnels(env_funnels if env_funnels > 0 else None)
    try:
        spilled = ds.map_batches(
            _SpillWriter,
            fn_constructor_args=(spill_dir, pk, cuts, funnels),
            batch_format="pyarrow",
            concurrency=(1, pool_hi) if pool_hi >= 12 else (1, max(2, pool_hi - 1)),
        )
        total_in = sum(r["rows"] for r in spilled.take_all())
    finally:
        if funnels:
            close_spill_funnels(funnels)
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
