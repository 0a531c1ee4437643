"""Tests for Leiden community detection (C7)."""

from __future__ import annotations

from anno_ray.core import leiden


def _two_cliques():
    edges = []
    a = [f"a{i}" for i in range(5)]
    b = [f"b{i}" for i in range(5)]
    for grp in (a, b):
        for i in range(len(grp)):
            for j in range(i + 1, len(grp)):
                edges.append((grp[i], grp[j], 1.0))
    edges.append(("a0", "b0", 0.1))  # weak bridge
    return edges, a, b


def test_two_cliques_split():
    edges, a, b = _two_cliques()
    comm = leiden.cluster(edges, seed=42)
    assert len({comm[x] for x in a}) == 1
    assert len({comm[x] for x in b}) == 1
    assert comm[a[0]] != comm[b[0]]


def test_deterministic():
    edges, _, _ = _two_cliques()
    assert leiden.cluster(edges, seed=7) == leiden.cluster(edges, seed=7)


def test_modularity_positive_for_good_partition():
    edges, a, b = _two_cliques()
    comm = leiden.cluster(edges)
    good = leiden.modularity(edges, comm)
    trivial = leiden.modularity(edges, {n: 0 for n in comm})
    assert good > trivial


def test_hierarchical_levels():
    edges, _, _ = _two_cliques()
    out = leiden.hierarchical_cluster(edges, levels=2)
    some = next(iter(out.values()))
    assert set(some) == {"level_0_community", "level_1_community"}


def test_empty():
    assert leiden.cluster([]) == {}
