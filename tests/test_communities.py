"""Distributed label-propagation communities (the kg_communities scale path)."""

from __future__ import annotations

import pyarrow as pa
import pytest


def _edge_table(edges):
    return pa.table(
        {
            "src": pa.array([e[0] for e in edges], pa.string()),
            "dst": pa.array([e[1] for e in edges], pa.string()),
        }
    )


@pytest.fixture()
def two_cliques():
    """Two dense 5-cliques joined by a single bridge edge."""
    a = [f"a{i}" for i in range(5)]
    b = [f"b{i}" for i in range(5)]
    edges = []
    for grp in (a, b):
        for i in range(5):
            for j in range(i + 1, 5):
                edges.append((grp[i], grp[j]))
    edges.append(("a0", "b0"))
    return a, b, edges


def test_lpa_separates_cliques(ray_session, two_cliques):
    from anno_ray.stages.communities import communities_table, label_propagation

    a, b, edges = two_cliques
    labels = label_propagation(_edge_table(edges))
    tbl = communities_table(labels)
    comm = dict(
        zip(tbl.column("node_id").to_pylist(), tbl.column("community").to_pylist())
    )
    assert len(comm) == 10  # every non-isolated node labeled
    assert len({comm[n] for n in a}) == 1
    assert len({comm[n] for n in b}) == 1
    assert comm[a[0]] != comm[b[0]]
    # densified ids ordered by min member
    assert comm[a[0]] == 0 and comm[b[0]] == 1


def test_lpa_deterministic(ray_session, two_cliques):
    from anno_ray.stages.communities import communities_table, label_propagation

    _, _, edges = two_cliques
    t1 = communities_table(label_propagation(_edge_table(edges)))
    t2 = communities_table(label_propagation(_edge_table(edges)))
    assert t1.equals(t2)


def test_lpa_respects_weights(ray_session):
    """x is connected to both cliques but with 3x the weight toward clique B
    (parallel edges) -> must land in B's community."""
    from anno_ray.stages.communities import communities_table, label_propagation

    edges = [("a0", "a1"), ("a1", "a2"), ("a0", "a2")]
    edges += [("b0", "b1"), ("b1", "b2"), ("b0", "b2")]
    edges += [("x", "a0")]
    edges += [("x", "b0")] * 3
    tbl = communities_table(label_propagation(_edge_table(edges)))
    comm = dict(
        zip(tbl.column("node_id").to_pylist(), tbl.column("community").to_pylist())
    )
    assert comm["x"] == comm["b0"]
    assert comm["x"] != comm["a0"]


def test_lpa_positive_modularity_vs_leiden(ray_session, two_cliques):
    """On a clearly clustered graph LPA's partition has positive modularity
    and the same community count as driver Leiden."""
    from anno_ray.core import leiden
    from anno_ray.stages.communities import communities_table, label_propagation

    _, _, edges = two_cliques
    weighted = [(u, v, 1.0) for u, v in edges]
    lcomm = leiden.cluster(weighted, resolution=1.0, seed=42)
    tbl = communities_table(label_propagation(_edge_table(edges)))
    comm = dict(
        zip(tbl.column("node_id").to_pylist(), tbl.column("community").to_pylist())
    )
    q = leiden.modularity(weighted, comm)
    assert q > 0.25  # optimal two-clique split has q = 0.2766
    assert len(set(comm.values())) == len(set(lcomm.values()))
    # identical partition (both find the optimal clique split)
    assert comm == lcomm
