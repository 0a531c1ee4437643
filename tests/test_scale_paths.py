"""Scale-path equivalence: the distributed canonicalize + join-based
materialize (the 100x path) must produce EXACTLY the same mapping and the
same node/edge content as the driver-side broadcast path."""

from __future__ import annotations

import glob
import os
import shutil

import pyarrow as pa
import pytest

from anno_ray.fixtures.pages import write_pages_parquet

PAGES_DIR = "/tmp/anno_scale_pages"
OUT_A = "/tmp/anno_scale_kg_driver"
OUT_B = "/tmp/anno_scale_kg_dist"
N_PAGES = 90


@pytest.fixture(scope="module")
def pages_dir(ray_session):
    if not os.path.exists(os.path.join(PAGES_DIR, "_DONE")):
        write_pages_parquet(PAGES_DIR, N_PAGES, seed=7, pages_per_file=30)
        open(os.path.join(PAGES_DIR, "_DONE"), "w").close()
    return PAGES_DIR


def _read_stage_sorted(out, stage, cols):
    import duckdb

    con = duckdb.connect()
    col_sql = ", ".join(cols)
    return con.execute(
        f"SELECT {col_sql} FROM read_parquet('{out}/{stage}/part=*/data.parquet') "
        f"ORDER BY {col_sql}"
    ).fetch_arrow_table()


@pytest.fixture(scope="module")
def both_runs(pages_dir):
    from anno_ray.pipelines.kg import run_kg_pipeline

    shutil.rmtree(OUT_A, ignore_errors=True)
    shutil.rmtree(OUT_B, ignore_errors=True)
    stats_a = run_kg_pipeline(pages_dir, OUT_A, resume=False)
    # force the fully distributed path: banded LSH edges, min-label
    # propagation components, join-based map-back
    stats_b = run_kg_pipeline(
        pages_dir, OUT_B, resume=False, max_driver_surfaces=0
    )
    return stats_a, stats_b


def test_mapping_content_identical(both_runs):
    import duckdb

    con = duckdb.connect()
    a = con.execute(
        f"SELECT * FROM read_parquet('{OUT_A}/canonical/mapping.parquet') "
        "ORDER BY entity_type, norm_surface"
    ).fetch_arrow_table()
    b = con.execute(
        f"SELECT * FROM read_parquet('{OUT_B}/canonical/mapping/*.parquet') "
        "ORDER BY entity_type, norm_surface"
    ).fetch_arrow_table()
    assert a.num_rows == b.num_rows > 0
    assert a.equals(b.cast(a.schema))


def test_nodes_identical(both_runs):
    cols = ["node_id", "node_type", "name", "mentions_count", "first_seen"]
    a = _read_stage_sorted(OUT_A, "nodes", cols)
    b = _read_stage_sorted(OUT_B, "nodes", cols)
    assert a.num_rows == b.num_rows > 0
    assert a.equals(b.cast(a.schema))


def test_edges_identical(both_runs):
    cols = ["subj", "pred", "obj", "subj_node", "obj_node", "conf", "source", "url"]
    a = _read_stage_sorted(OUT_A, "edges", cols)
    b = _read_stage_sorted(OUT_B, "edges", cols)
    assert a.num_rows == b.num_rows > 0
    assert a.equals(b.cast(a.schema))


def test_joined_path_globally_sorted(both_runs):
    """The joined materialize still writes globally sorted output
    (concatenation of part dirs in id order)."""
    import duckdb

    con = duckdb.connect()
    nodes = con.execute(
        f"SELECT node_id FROM read_parquet('{OUT_B}/nodes/part=*/data.parquet')"
    ).fetchall()
    assert nodes == sorted(nodes)
    edges = con.execute(
        "SELECT subj_node, pred, obj_node FROM "
        f"read_parquet('{OUT_B}/edges/part=*/data.parquet')"
    ).fetchall()
    assert edges == sorted(edges)


def test_stale_edge_partitions_invalidated(pages_dir, tmp_path):
    """Manifests record the (docs, mapping) fingerprint: when the docs change,
    previously completed edge partitions must be rewritten, not kept."""
    import json

    from anno_ray.pipelines.kg import run_kg_pipeline

    out = str(tmp_path / "kg")
    run_kg_pipeline(pages_dir, out, resume=False)
    man = sorted(glob.glob(os.path.join(out, "edges", "_manifests", "*.json")))
    assert man
    fp0 = json.load(open(man[0]))["metrics"]["fingerprint"]
    assert fp0
    # simulate changed docs: corrupt one docs manifest content hash
    docs_man = sorted(glob.glob(os.path.join(out, "docs", "_manifests", "*.json")))
    m = json.load(open(docs_man[0]))
    m["content_hash"] = "deadbeef"
    json.dump(m, open(docs_man[0], "w"))
    # canonical + materialize resume against the "changed" docs: edge
    # partitions must be recomputed (skipped == 0), not kept
    from anno_ray.pipelines.kg import run_canonicalize_stage, run_materialize_stage

    mapping = run_canonicalize_stage(out, resume=True)
    stats = run_materialize_stage(out, mapping)
    assert stats["edges"]["partitions_skipped"] == 0
