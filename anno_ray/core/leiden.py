"""Leiden-style community detection over the node/edge tables (C7, strata).

Reimplements the reference's modularity local-moving with resolution and
deterministic seeded visiting order (/root/reference/strata/src/leiden.rs:
58-226) and the hierarchical wrapper (resolutions r * 2^level,
strata/src/lib.rs:80-105). The reference recomputes global modularity per
candidate move (O(E) each); we use the standard incremental delta-modularity
formulation — identical objective, orders of magnitude faster. Like the
reference, this is single-level local moving only (the reference stubs out
the Leiden refinement/aggregation phase).

Note ``cluster`` is edge-driven: nodes that appear in no edge are absent
from the returned mapping — callers holding a node table must treat missing
nodes as singleton communities (see stages/communities.py, which does).

Runs driver-side on the post-canonicalization graph (nodes/edges fit after
the big shuffles); the distributed label-propagation variant in
stages/communities.py replaces it for graphs that don't.
"""

from __future__ import annotations

from collections import defaultdict


def _seeded_shuffle(items: list, seed: int, iteration: int) -> list:
    """Deterministic LCG shuffle (the reference's seed+iteration scheme)."""
    out = list(items)
    state = (seed + iteration) * 0x9E3779B97F4A7C15 & ((1 << 64) - 1)
    n = len(out)
    for i in range(n):
        state = (state * 1103515245 + 12345) & ((1 << 64) - 1)
        j = (state % (n - i)) + i
        out[i], out[j] = out[j], out[i]
    return out


def cluster(
    edges: list[tuple[str, str, float]],
    *,
    resolution: float = 1.0,
    seed: int = 42,
    max_iterations: int = 100,
) -> dict[str, int]:
    """Edge list (u, v, weight) -> node -> community id (0-based, dense).

    Local moving with incremental delta modularity:
      delta(i -> C) = (k_{i,in C} - resolution * k_i * K_C / (2m)) / m
    """
    adj: dict[str, dict[str, float]] = defaultdict(dict)
    for u, v, w in edges:
        if u == v:
            continue
        adj[u][v] = adj[u].get(v, 0.0) + w
        adj[v][u] = adj[v].get(u, 0.0) + w

    nodes = sorted(adj)
    if not nodes:
        return {}
    degree = {u: sum(adj[u].values()) for u in nodes}
    two_m = sum(degree.values())
    if two_m == 0:
        return {u: i for i, u in enumerate(nodes)}

    community = {u: i for i, u in enumerate(nodes)}
    comm_degree = {community[u]: degree[u] for u in nodes}

    improved = True
    iteration = 0
    while improved and iteration < max_iterations:
        improved = False
        iteration += 1
        for u in _seeded_shuffle(nodes, seed, iteration):
            cu = community[u]
            ku = degree[u]
            # weights from u into each neighboring community
            into: dict[int, float] = defaultdict(float)
            for v, w in adj[u].items():
                into[community[v]] += w
            # remove u from its community
            comm_degree[cu] -= ku
            best_c = cu
            base = into.get(cu, 0.0) - resolution * ku * comm_degree[cu] / two_m
            best_delta = base
            for c, w_in in into.items():
                if c == cu:
                    continue
                delta = w_in - resolution * ku * comm_degree[c] / two_m
                if delta > best_delta + 1e-12:
                    best_delta = delta
                    best_c = c
            comm_degree[best_c] = comm_degree.get(best_c, 0.0) + ku
            if best_c != cu:
                community[u] = best_c
                improved = True

    # densify community ids deterministically (by min node id in community)
    by_comm: dict[int, list[str]] = defaultdict(list)
    for u, c in community.items():
        by_comm[c].append(u)
    ordered = sorted(by_comm.values(), key=lambda members: min(members))
    return {u: i for i, members in enumerate(ordered) for u in members}


def modularity(
    edges: list[tuple[str, str, float]],
    community: dict[str, int],
    resolution: float = 1.0,
) -> float:
    """Q = (1/2m) * sum over same-community edges of
    [w - resolution * k_u * k_v / 2m] (leiden.rs:183-226)."""
    degree: dict[str, float] = defaultdict(float)
    m = 0.0
    for u, v, w in edges:
        degree[u] += w
        degree[v] += w
        m += w
    if m == 0:
        return 0.0
    q = 0.0
    for u, v, w in edges:
        if community.get(u) == community.get(v):
            q += w - resolution * degree[u] * degree[v] / (2.0 * m)
    return q / (2.0 * m)


def hierarchical_cluster(
    edges: list[tuple[str, str, float]],
    *,
    base_resolution: float = 1.0,
    levels: int = 3,
    seed: int = 42,
) -> dict[str, dict[str, int]]:
    """Levels at resolution base * 2^level: node -> {level_i_community: id}
    (strata/src/lib.rs:80-105)."""
    out: dict[str, dict[str, int]] = defaultdict(dict)
    for level in range(levels):
        res = base_resolution * (2.0 ** level)
        comm = cluster(edges, resolution=res, seed=seed)
        for node, c in comm.items():
            out[node][f"level_{level}_community"] = c
    return dict(out)
