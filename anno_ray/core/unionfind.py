"""Union-find with iterative path compression.

Matches the semantics of the reference's two implementations
(/root/reference/coalesce/src/resolver.rs:100-148 recursive;
/root/reference/anno/src/eval/cdcr.rs:556-578 iterative): union(i, j) points
root(i) at root(j). Cluster membership is merge-order independent; our
cluster representatives are chosen by explicit min-ordering downstream, so
results are deterministic under any edge order (a deliberate improvement over
the reference's HashMap-order-dependent representative pick,
resolver.rs:161-173).
"""

from __future__ import annotations


class UnionFind:
    __slots__ = ("parent",)

    def __init__(self, n: int) -> None:
        self.parent = list(range(n))

    def find(self, i: int) -> int:
        parent = self.parent
        root = i
        while parent[root] != root:
            root = parent[root]
        while parent[i] != root:
            parent[i], i = root, parent[i]
        return root

    def union(self, i: int, j: int) -> None:
        ri, rj = self.find(i), self.find(j)
        if ri != rj:
            self.parent[ri] = rj

    def groups(self) -> dict[int, list[int]]:
        out: dict[int, list[int]] = {}
        for i in range(len(self.parent)):
            out.setdefault(self.find(i), []).append(i)
        return out


def connected_components(n: int, edges) -> list[int]:
    """Component id (min member index) for each of n items given edge pairs."""
    uf = UnionFind(n)
    for i, j in edges:
        uf.union(i, j)
    comp_min: dict[int, int] = {}
    roots = [uf.find(i) for i in range(n)]
    for i, r in enumerate(roots):
        if r not in comp_min or i < comp_min[r]:
            comp_min[r] = min(comp_min.get(r, i), i)
    return [comp_min[r] for r in roots]
