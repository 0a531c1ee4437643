"""End-to-end robustness over degenerate corpora: empty input, single page,
empty/None html. These exercise materialize's degenerate branches (zero
mentions, zero edges, single spill partial) that only trigger off the happy
path of the synthetic fixture corpus."""

from __future__ import annotations

import glob
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from anno_ray.fixtures.pages import generate_pages_table

SCHEMA = generate_pages_table(0, 1).schema


def _mk_corpus(name: str, tbl: pa.Table) -> str:
    d = f"/tmp/anno_edge_{name}"
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    pq.write_table(tbl, os.path.join(d, "pages_00000.parquet"))
    return d


def _count_rows(out_dir: str, family: str) -> int:
    files = glob.glob(os.path.join(out_dir, family, "**", "*.parquet"), recursive=True)
    return sum(pq.read_metadata(f).num_rows for f in files)


def _run(pages_dir: str, out_name: str, **kw) -> tuple[str, dict]:
    from anno_ray.pipelines.kg import run_kg_pipeline

    out = f"/tmp/anno_edge_out_{out_name}"
    shutil.rmtree(out, ignore_errors=True)
    stats = run_kg_pipeline(pages_dir, out, resume=False, **kw)
    return out, stats


def test_empty_corpus(ray_session):
    """Zero input rows: pipeline completes, writes zero-row node/edge output."""
    d = _mk_corpus("empty", SCHEMA.empty_table())
    out, stats = _run(d, "empty")
    assert _count_rows(out, "nodes") == 0
    assert _count_rows(out, "edges") == 0
    # resume over the finished empty run must be a no-op, not a crash
    from anno_ray.pipelines.kg import run_kg_pipeline

    run_kg_pipeline(d, out, resume=True)
    assert _count_rows(out, "nodes") == 0


def test_single_page(ray_session):
    """A one-page corpus exercises the single-spill/single-partition path."""
    d = _mk_corpus("single", generate_pages_table(0, 1))
    out, stats = _run(d, "single")
    assert _count_rows(out, "nodes") > 0
    assert _count_rows(out, "edges") > 0
    # node ids must still be unique in the degenerate single-partition case
    nodes = pq.read_table(glob.glob(out + "/nodes/**/*.parquet", recursive=True)[0])
    ids = nodes.column("node_id").to_pylist()
    assert len(ids) == len(set(ids))


def test_empty_and_null_html(ray_session):
    """Rows with b'' / NULL html must flow through (empty doc), not crash."""
    t = generate_pages_table(0, 4)
    html = pa.array(
        [b"", None, b"<html><body></body></html>", t.column("html")[3].as_py()],
        pa.binary(),
    )
    t = t.set_column(t.schema.get_field_index("html"), "html", html)
    d = _mk_corpus("deghtml", t)
    out, stats = _run(d, "deghtml")
    docs = pa.concat_tables(
        pq.read_table(f)
        for f in glob.glob(out + "/docs/part=*/*.parquet")
    )
    assert docs.num_rows == 4  # every input row produces a doc row
    nchars = {u: x for u, x in zip(docs.column("url").to_pylist(),
                                   docs.column("n_chars").to_pylist())}
    urls = t.column("url").to_pylist()
    assert nchars[urls[0]] == 0  # empty html -> empty text
    assert nchars[urls[1]] == 0  # NULL html -> empty text
    # only the real page contributes mentions
    assert _count_rows(out, "nodes") > 0


def test_output_layout_cluster_size_independent():
    """The materialize partition layout derives from data volume only: two
    fresh Ray processes at different num_cpus over the same corpus must write
    byte-identical nodes/edges parquet files (round-4 invariant — a resume
    after resizing the cluster keeps every completed partition valid)."""
    import hashlib
    import subprocess
    import sys

    pages = "/tmp/anno_edge_pages_csz"
    if not os.path.exists(os.path.join(pages, "_DONE")):
        from anno_ray.fixtures.pages import write_pages_parquet

        write_pages_parquet(pages, 120, seed=42, pages_per_file=30)
        open(os.path.join(pages, "_DONE"), "w").close()

    script = """
import sys
sys.path.insert(0, "/root/repo")
import ray
ray.init(address="local", num_cpus=int(sys.argv[1]),
         include_dashboard=False)
from anno_ray.pipelines.kg import run_kg_pipeline
run_kg_pipeline(sys.argv[2], sys.argv[3], resume=False)
ray.shutdown()
"""
    digests = {}
    for ncpu in (2, 5):
        out = f"/tmp/anno_edge_out_csz_{ncpu}"
        shutil.rmtree(out, ignore_errors=True)
        env = dict(os.environ, PYTHONPATH="/root/repo")
        # fresh process so each run owns its own Ray at the given size
        subprocess.run(
            [sys.executable, "-c", script, str(ncpu), pages, out],
            check=True, env=env, capture_output=True, timeout=600,
        )
        h = hashlib.blake2b()
        for f in sorted(
            glob.glob(os.path.join(out, "nodes", "**", "*.parquet"), recursive=True)
        ) + sorted(
            glob.glob(os.path.join(out, "edges", "**", "*.parquet"), recursive=True)
        ):
            h.update(os.path.relpath(f, out).encode())
            h.update(open(f, "rb").read())
        digests[ncpu] = h.hexdigest()
    assert digests[2] == digests[5], digests


def test_events_tumbling_window_alignment(ray_session):
    """Hand-built events: epoch-aligned 6h windows, exact counts and sums."""
    import datetime as dt

    d = "/tmp/anno_edge_tumble"
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (base + dt.timedelta(hours=0), "a", 1.0),   # window 00:00
        (base + dt.timedelta(hours=5, minutes=59), "a", 2.0),  # window 00:00
        (base + dt.timedelta(hours=6), "a", 4.0),   # window 06:00 (boundary)
        (base + dt.timedelta(hours=7), "b", 8.0),   # window 06:00
    ]
    pq.write_table(
        pa.table(
            {
                "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
                "event_type": pa.array([r[1] for r in rows]),
                "value": pa.array([r[2] for r in rows]),
            }
        ),
        os.path.join(d, "events.parquet"),
    )
    from anno_ray.functions.relational import events_tumbling_window

    got = events_tumbling_window(d, hours=6).to_pandas()
    got["window_start"] = got["window_start"].astype("datetime64[us]")
    expect = {
        (base, "a"): (3.0, 2),
        (base + dt.timedelta(hours=6), "a"): (4.0, 1),
        (base + dt.timedelta(hours=6), "b"): (8.0, 1),
    }
    assert len(got) == 3
    for _, r in got.iterrows():
        key = (r["window_start"].to_pydatetime(), r["event_type"])
        assert expect[key] == (r["total_value"], r["n_events"]), (key, r)


def test_events_value_median_by_type_interpolation(ray_session):
    """Hand-built groups: odd size (exact middle) and even size
    (interpolated), matching DuckDB median/quantile_cont semantics."""
    d = "/tmp/anno_edge_median"
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(["a", "a", "a", "b", "b", "b", "b"]),
                "value": pa.array([3.0, 1.0, 2.0, 10.0, 40.0, 20.0, 30.0]),
            }
        ),
        os.path.join(d, "events.parquet"),
    )
    from anno_ray.functions.relational import events_value_median_by_type

    got = events_value_median_by_type(d).to_pandas()
    meds = dict(zip(got["event_type"], got["median_value"]))
    assert meds == {"a": 2.0, "b": 25.0}
