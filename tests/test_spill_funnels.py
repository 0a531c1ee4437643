"""Spill-consolidation funnel gates.

The funnel path changes WHERE spill rows land (consolidated per-partition
files from writer actors) but must never change WHAT the merge produces:
the phase-2 sort is a total order, so output bytes depend only on the row
multiset per partition. These tests pin (1) byte-identical final output
between the direct and funnel spill paths, (2) content-tag retry dedup,
(3) the consolidation factor itself (files per partition independent of
producer-task count).
"""

from __future__ import annotations

import glob
import hashlib
import os

import pyarrow as pa


def _rows(n: int) -> pa.Table:
    import numpy as np

    rng = np.random.RandomState(7)
    keys = [f"k{int(v):07d}" for v in rng.randint(0, 5000, n)]
    return pa.table(
        {
            "subj_node": pa.array(keys, pa.string()),
            "pred": pa.array([f"p{i % 11}" for i in range(n)], pa.string()),
            "obj_node": pa.array([f"o{i % 97}" for i in range(n)], pa.string()),
        }
    )


def _md5s(out_dir: str, stage: str) -> list[str]:
    return [
        hashlib.md5(open(p, "rb").read()).hexdigest()
        for p in sorted(glob.glob(os.path.join(out_dir, stage, "part=*", "data.parquet")))
    ]


def test_funnel_and_direct_spill_write_identical_output(ray_session, tmp_path, monkeypatch):
    import ray.data

    from anno_ray.state.writer import write_sorted

    tbl = _rows(20_000)
    cuts_src = sorted(set(tbl.column("subj_node").to_pylist()))
    outs = {}
    for mode, env in (("direct", "0"), ("funnel", "3")):
        monkeypatch.setenv("ANNO_SPILL_FUNNELS", env)
        out = str(tmp_path / mode)
        ds = ray.data.from_arrow(tbl).repartition(8)
        write_sorted(
            ds, out, "edges",
            sort_keys=["subj_node", "pred", "obj_node"],
            boundary_keys=cuts_src, num_partitions=40, resume=False,
        )
        outs[mode] = _md5s(out, "edges")
    assert outs["direct"] == outs["funnel"] and len(outs["direct"]) > 0


def test_funnel_consolidates_file_count(ray_session, tmp_path, monkeypatch):
    """With many producer blocks, the funnel path must write far fewer
    spill files than blocks x partitions (the direct pattern)."""
    import ray.data

    from anno_ray.state.writer import write_sorted

    monkeypatch.setenv("ANNO_SPILL_FUNNELS", "2")
    monkeypatch.setenv("ANNO_KEEP_SPILL", "1")
    tbl = _rows(20_000)
    cuts_src = sorted(set(tbl.column("subj_node").to_pylist()))
    out = str(tmp_path / "consolidated")
    n_blocks = 16
    ds = ray.data.from_arrow(tbl).repartition(n_blocks)
    write_sorted(
        ds, out, "edges",
        sort_keys=["subj_node", "pred", "obj_node"],
        boundary_keys=cuts_src, num_partitions=40, resume=False,
    )
    spill_files = glob.glob(os.path.join(out, "edges", "_spill", "part=*", "*.parquet"))
    n_parts = len(glob.glob(os.path.join(out, "edges", "part=*")))
    # direct pattern would be ~n_blocks x n_parts; funnels flush at most a
    # few files per partition regardless of the producer count
    assert len(spill_files) <= 3 * n_parts, (len(spill_files), n_parts)
    monkeypatch.delenv("ANNO_KEEP_SPILL")


def test_funnel_retry_content_tag_dedup(ray_session, tmp_path):
    """A retried producer re-sending the same (pid, tag, slice) must not
    duplicate rows in the flushed spill files."""
    import pyarrow.parquet as pq

    from anno_ray.state.writer import close_spill_funnels, create_spill_funnels

    funnels = create_spill_funnels(1)
    import ray

    spill_dir = str(tmp_path / "spill")
    part = pa.table({"subj_node": pa.array(["a", "b"], pa.string())})
    # first delivery + an identical retry + a DIFFERENT batch with same pid
    ray.get(funnels[0].append.remote(spill_dir, [(0, "tagA", part)]))
    ray.get(funnels[0].append.remote(spill_dir, [(0, "tagA", part)]))
    other = pa.table({"subj_node": pa.array(["c"], pa.string())})
    ray.get(funnels[0].append.remote(spill_dir, [(0, "tagB", other)]))
    close_spill_funnels(funnels)
    files = glob.glob(os.path.join(spill_dir, "part=00000", "*.parquet"))
    total = sum(pq.read_table(f).num_rows for f in files)
    assert total == 3  # 2 from tagA once + 1 from tagB


def test_fused_materialize_byte_identical_across_spill_modes(ray_session, tmp_path, monkeypatch):
    """The FULL fused KG materialize must write byte-identical nodes/edges
    parquet whether spill rows go direct-to-file or through consolidation
    funnels — the spill mode is transport, never semantics."""
    from anno_ray.fixtures.pages import write_pages_parquet
    from anno_ray.pipelines.kg import run_kg_pipeline

    pages = str(tmp_path / "pages")
    write_pages_parquet(pages, 60, seed=42, pages_per_file=15)
    sums = {}
    for mode, env in (("direct", "0"), ("funnel", "2")):
        monkeypatch.setenv("ANNO_SPILL_FUNNELS", env)
        out = str(tmp_path / f"kg_{mode}")
        run_kg_pipeline(pages, out, resume=False)
        sums[mode] = {
            stage: _md5s(out, stage) for stage in ("nodes", "edges")
        }
    assert sums["direct"] == sums["funnel"]
    assert len(sums["direct"]["edges"]) > 0
