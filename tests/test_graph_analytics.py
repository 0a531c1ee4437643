"""PageRank + degree stats (stages/graph_analytics.py).

The 6-dp bit-parity with the independent unrolled SQL implementation is
gated by the driver oracle (`kg_pagerank`); here we pin the algorithm
against a plain-numpy reference on hand graphs, the joined scale path
against the broadcast path, and the conservation invariant."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _ref_pagerank(edges, d=0.85, iters=10):
    """Dense textbook reference: same semantics as the stage docstring."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for u, _ in set(edges):
        out[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for u, v in set(edges):
            contrib[idx[v]] += r[idx[u]] / out[idx[u]]
        dangling = r[out == 0].sum()
        r = (1 - d) / n + d * (contrib + dangling / n)
    return {v: r[idx[v]] * n for v in nodes}


def _edges_ds(pairs):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "subj_node": pa.array([p[0] for p in pairs], pa.string()),
                "obj_node": pa.array([p[1] for p in pairs], pa.string()),
            }
        )
    )


GRAPH = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
    ("d", "c"), ("d", "c"),  # duplicate edge must collapse (DISTINCT)
    ("e", "c"),  # e is a source-only node; "sink" has no out-edges
    ("c", "sink"),
]


def test_pagerank_matches_dense_reference(ray_session):
    from anno_ray.stages.graph_analytics import pagerank

    got = pagerank(_edges_ds(GRAPH))
    want = _ref_pagerank(GRAPH)
    assert got.num_rows == len(want)
    for node, pr in zip(
        got.column("node_id").to_pylist(), got.column("pr_norm").to_pylist()
    ):
        assert pr == pytest.approx(want[node], abs=2e-6), node


def test_pagerank_mass_conserved(ray_session):
    from anno_ray.stages.graph_analytics import pagerank

    got = pagerank(_edges_ds(GRAPH))
    # dangling redistribution keeps total rank mass at exactly 1 (mean
    # normalized rank 1.0) up to rounding
    mean = sum(got.column("pr_norm").to_pylist()) / got.num_rows
    assert mean == pytest.approx(1.0, abs=1e-5)


def test_pagerank_joined_path_matches_broadcast(ray_session):
    from anno_ray.stages.graph_analytics import pagerank

    broadcast = pagerank(_edges_ds(GRAPH), iterations=4)
    joined = pagerank(_edges_ds(GRAPH), iterations=4, max_broadcast_nodes=1)
    jt = joined if isinstance(joined, pa.Table) else pa.concat_tables(
        [b for b in joined.to_arrow_refs_resolved()]
        if hasattr(joined, "to_arrow_refs_resolved")
        else [__import__("ray").get(r) for r in joined.to_arrow_refs()],
        promote_options="permissive",
    )
    bd = dict(
        zip(broadcast.column("node_id").to_pylist(),
            broadcast.column("pr_norm").to_pylist())
    )
    jd = dict(
        zip(jt.column("node_id").to_pylist(), jt.column("pr_norm").to_pylist())
    )
    assert set(bd) == set(jd)
    for k in bd:
        assert bd[k] == pytest.approx(jd[k], abs=2e-6), k


def test_pagerank_empty(ray_session):
    from anno_ray.stages.graph_analytics import pagerank

    got = pagerank(_edges_ds([]))
    assert got.num_rows == 0


def test_degree_stats(ray_session):
    import ray

    from anno_ray.stages.graph_analytics import degree_stats

    ds = degree_stats(_edges_ds(GRAPH))
    tbl = pa.concat_tables(
        [ray.get(r) for r in ds.to_arrow_refs()], promote_options="permissive"
    )
    got = {
        n: (o, i)
        for n, o, i in zip(
            tbl.column("node_id").to_pylist(),
            tbl.column("out_deg").to_pylist(),
            tbl.column("in_deg").to_pylist(),
        )
    }
    # distinct edges: (d,c) duplicate collapses
    assert got == {
        "a": (2, 1),
        "b": (1, 1),
        "c": (2, 4),
        "d": (1, 0),
        "e": (1, 0),
        "sink": (0, 1),
    }


def test_connected_components(ray_session):
    import ray

    from anno_ray.stages.graph_analytics import connected_components

    # two components: {a,b,c,d,e,sink} is one (GRAPH is connected through c);
    # add an isolated pair {x,y}
    cc = connected_components(_edges_ds(GRAPH + [("x", "y")]))
    tbl = pa.concat_tables(
        [ray.get(r) for r in cc.to_arrow_refs()], promote_options="permissive"
    )
    got = {
        n: (c, s)
        for n, c, s in zip(
            tbl.column("node_id").to_pylist(),
            tbl.column("component").to_pylist(),
            tbl.column("component_size").to_pylist(),
        )
    }
    assert got["x"] == ("x", 2) and got["y"] == ("x", 2)
    for n in ["a", "b", "c", "d", "e", "sink"]:
        assert got[n] == ("a", 6), n


def test_connected_components_joined_sizes_match_broadcast(ray_session):
    """Forcing the component-size hash-join path (max_broadcast_components=1)
    must produce the identical (node, component, size) set as the broadcast
    dict path — the dispatch is a perf threshold, never a semantics fork."""
    import ray

    from anno_ray.stages.graph_analytics import connected_components

    def _rows(ds):
        tbl = pa.concat_tables(
            [ray.get(r) for r in ds.to_arrow_refs()], promote_options="permissive"
        )
        return sorted(
            zip(
                tbl.column("node_id").to_pylist(),
                tbl.column("component").to_pylist(),
                tbl.column("component_size").to_pylist(),
            )
        )

    edges = GRAPH + [("x", "y")]
    broadcast = _rows(connected_components(_edges_ds(edges)))
    joined = _rows(
        connected_components(_edges_ds(edges), max_broadcast_components=1)
    )
    assert broadcast == joined and len(broadcast) == 8
