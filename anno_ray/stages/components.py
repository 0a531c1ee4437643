"""Generic distributed connected components over Ray Data.

Min-label propagation + pointer doubling: per round every node takes the min
label over itself and its neighbors, then one pointer jump
``label <- label(label)`` halves the remaining chain depth, so the loop
converges in O(log diameter) rounds. Each round is two hash joins plus a
groupby-min over narrow (k, label) pairs — no driver-side union-find, no
driver materialization of nodes or edges (the web-scale replacement for
``core.unionfind``; reference merge semantics:
/root/reference/coalesce/src/resolver.rs:161-217 union-find, re-expressed as
a Ray Data fixpoint).

Used by ``stages.canonicalize.build_canonical_map_distributed`` (keys =
"type\\x00surface" strings) and ``stages.dedup.minhash_dedup_ids`` (keys =
doc ids). Labels converge to the MIN key of each component under the key
type's natural order, which is exactly the deterministic representative both
callers want.

Convergence detection is a vectorized order-independent signature of the
(k, label) multiset (pandas siphash per row, wrap-sum): one cheap scan of
the already-materialized label Dataset per round, instead of the per-row
Python blake2b pass this replaced (which dominated the 10M-key benchmark).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..ray_utils import register_for_ray


def multiset_signature(ds, cols: tuple[str, ...] = ("k", "label")) -> int:
    """Order-independent 64-bit signature of a Dataset's row multiset over
    ``cols``: vectorized per-row keyed siphash, wrap-summed. One cheap scan
    of a materialized Dataset — the convergence check for every fixpoint
    loop in this package (replaced a per-row Python blake2b pass that
    dominated the 10M-key canonicalization benchmark).

    NUL-safety: pandas' object-string hashing treats values as C strings and
    TRUNCATES at the first embedded ``\\x00`` byte — and this package's
    composite keys are exactly ``type\\x00surface``, which once made every
    row hash identically and the convergence check never fire (the loop ran
    to max_iters). Rows are therefore serialized to a single NUL-free string
    (columns joined with ``\\x1e``, NULs replaced by ``\\x1f``) before
    hashing; only that combined column is ever hashed."""

    def _sig_batch(b: pa.Table) -> pa.Table:
        import pandas as pd

        if b.num_rows == 0:
            return pa.table({"sig": pa.array([0], pa.uint64())})
        parts = [
            pc.fill_null(pc.cast(b.column(c), pa.string()), "\x1f\x1f")
            for c in cols
        ]
        joined = parts[0] if len(parts) == 1 else pc.binary_join_element_wise(
            *parts, "\x1e"
        )
        safe = pc.replace_substring(joined, "\x00", "\x1f")
        arr = safe.to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(arr).astype(np.uint64)
        with np.errstate(over="ignore"):
            acc = int(np.sum(h, dtype=np.uint64))
        return pa.table({"sig": pa.array([acc], pa.uint64())})

    total = 0
    for r in ds.map_batches(_sig_batch, batch_format="pyarrow").take_all():
        total = (total + int(r["sig"])) & ((1 << 64) - 1)
    return total


def _signature(labels_ds) -> int:
    return multiset_signature(labels_ds, ("k", "label"))


def min_label_components(
    labels,
    sym_edges,
    *,
    max_iters: int = 32,
    num_partitions: int | None = None,
):
    """Fixpoint of min-label propagation over an undirected graph.

    Args:
        labels: Dataset with columns (k, label) — one row per node, label
            initialized to k (any orderable Arrow type, consistent across
            both inputs).
        sym_edges: Dataset with columns (src, dst) containing BOTH directions
            of every edge.
        num_partitions: hash-join partition count; derived from the node
            count when omitted.

    Returns the converged labels Dataset (k, label): label = min key of k's
    component.
    """
    register_for_ray()
    from ray.data.aggregate import Min

    labels = labels.materialize()
    sym = sym_edges.materialize()
    if num_partitions is None:
        n = labels.count()
        num_partitions = min(64, max(2, n // 100_000 + 2))

    # key/label Arrow types, captured once: small inputs make Ray emit
    # SCHEMA-LESS empty blocks out of joins/groupbys, and a later hash join
    # on such a block fails with "No match ... FieldRef.Name(label)". Every
    # per-round kernel below therefore rebuilds a TYPED empty block when its
    # input block is empty/degenerate, keeping the whole fixpoint
    # schema-stable regardless of block layout.
    sch = labels.schema()
    _types = dict(zip(sch.names, sch.types))
    k_t, lab_t = _types["k"], _types["label"]

    def _typed_empty() -> pa.Table:
        return pa.table({"k": pa.array([], k_t), "label": pa.array([], lab_t)})

    def _labels_norm(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "k" not in b.column_names:
            return _typed_empty()
        return b.select(["k", "label"])

    def _sym_norm(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "src" not in b.column_names:
            return pa.table({"src": pa.array([], k_t), "dst": pa.array([], k_t)})
        return b.select(["src", "dst"])

    labels = labels.map_batches(_labels_norm, batch_format="pyarrow").materialize()
    sym = sym.map_batches(_sym_norm, batch_format="pyarrow").materialize()

    def _prop_kernel(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "dst" not in b.column_names:
            return _typed_empty()
        return pa.table({"k": b.column("dst"), "label": b.column("label")})

    def _rename_min(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "k" not in b.column_names:
            return _typed_empty()
        return b.rename_columns(
            [{"min(label)": "label"}.get(c, c) for c in b.column_names]
        )

    def _lookup_kernel(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "k" not in b.column_names:
            return pa.table(
                {"k2": pa.array([], k_t), "label2": pa.array([], lab_t)}
            )
        return pa.table({"k2": b.column("k"), "label2": b.column("label")})

    def _double_kernel(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "k" not in b.column_names:
            return _typed_empty()
        return pa.table(
            {
                "k": b.column("k"),
                "label": pc.coalesce(
                    pc.min_element_wise(b.column("label"), b.column("label2")),
                    b.column("label"),
                ),
            }
        )

    old_sig = _signature(labels)
    for _ in range(max_iters):
        # neighbor min propagation: each edge endpoint offers its label to
        # the other side; groupby-min merges offers with the node's own label
        prop = sym.join(
            labels, join_type="inner", num_partitions=num_partitions,
            on=("src",), right_on=("k",),
        ).map_batches(_prop_kernel, batch_format="pyarrow")
        stepped = (
            labels.union(prop).groupby("k").aggregate(Min("label"))
            .map_batches(_rename_min, batch_format="pyarrow")
        ).materialize()
        # pointer doubling: label <- label(label). `stepped` has one row per
        # k (groupby output) and lookup keys are unique, so the left-outer
        # join yields exactly one row per k — no post-join groupby needed.
        as_lookup = stepped.map_batches(_lookup_kernel, batch_format="pyarrow")
        labels = (
            stepped.join(
                as_lookup, join_type="left_outer", num_partitions=num_partitions,
                on=("label",), right_on=("k2",),
            )
            .map_batches(_double_kernel, batch_format="pyarrow")
        ).materialize()
        new_sig = _signature(labels)
        if new_sig == old_sig:
            break
        old_sig = new_sig
    return labels


# below this many pairs the component computation runs as a driver
# union-find instead of the distributed fixpoint: Ray 2.49 forwards EMPTY
# blocks through map_batches without calling the UDF, so a small input whose
# hash partitions go empty ships schema-less blocks into the fixpoint's
# joins and they fail ("No match ... FieldRef.Name(label)"). At distributed
# scale (>=~100k keys per partition by construction of num_partitions) an
# empty hash partition cannot occur, so the wart only bites small graphs —
# which the driver handles exactly (same min-id labels) and faster anyway.
_CC_DRIVER_MAX_PAIRS = 100_000


def components_from_pairs(
    pairs_ds,
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 32,
    num_partitions: int | None = None,
    max_driver_pairs: int = _CC_DRIVER_MAX_PAIRS,
):
    """Connected components directly from an (id_a, id_b) pair Dataset.

    Nodes are the distinct ids touched by any pair (isolated docs are not
    emitted — matching the driver union-find in ``dedup.minhash_dedup_ids``).
    Returns a Dataset (k, label) with label = min id of the component.
    """
    import ray
    import ray.data

    register_for_ray()
    pairs_ds = pairs_ds.materialize()

    if pairs_ds.count() <= max_driver_pairs:
        from ..core.unionfind import UnionFind

        tbls = [
            t
            for t in (ray.get(r) for r in pairs_ds.to_arrow_refs())
            if t.num_rows and id_a in t.column_names
        ]
        a_list: list = []
        b_list: list = []
        for t in tbls:
            a_list.extend(t.column(id_a).to_pylist())
            b_list.extend(t.column(id_b).to_pylist())
        ids: dict = {}
        for x in a_list + b_list:
            if x not in ids:
                ids[x] = len(ids)
        uf = UnionFind(len(ids))
        for x, y in zip(a_list, b_list):
            uf.union(ids[x], ids[y])
        rev = list(ids.keys())
        best: dict[int, object] = {}
        for x, i in ids.items():
            r = uf.find(i)
            cur = best.get(r)
            if cur is None or x < cur:
                best[r] = x
        out = pa.table(
            {
                "k": pa.array(rev),
                "label": pa.array([best[uf.find(ids[x])] for x in rev]),
            }
        )
        if out.num_rows == 0:
            out = pa.table(
                {"k": pa.array([], pa.string()), "label": pa.array([], pa.string())}
            )
        return ray.data.from_arrow(out)

    def _sym(b: pa.Table) -> pa.Table:
        a = b.column(id_a).combine_chunks()
        c = b.column(id_b).combine_chunks()
        return pa.table(
            {
                "src": pa.chunked_array([a, c]),
                "dst": pa.chunked_array([c, a]),
            }
        )

    sym = pairs_ds.map_batches(_sym, batch_format="pyarrow")

    def _node_block(b: pa.Table) -> pa.Table:
        u = pc.unique(b.column("src"))
        return pa.table({"k": u})

    nodes = (
        sym.map_batches(_node_block, batch_format="pyarrow")
        .groupby("k")
        .count()
        .map_batches(
            lambda b: pa.table({"k": b.column("k"), "label": b.column("k")}),
            batch_format="pyarrow",
        )
    )
    return min_label_components(
        nodes, sym, max_iters=max_iters, num_partitions=num_partitions
    )
