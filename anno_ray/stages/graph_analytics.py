"""Distributed graph analytics over canonical (src, dst) edge tables.

PageRank as a Ray-Data-native iterative operator (the reference exposes
per-cluster importance ranking — corpus_stats.rs cluster_importance — but
no whole-graph centrality; this is one of the additions a KG-construction
engine needs at web scale, where "which canonical entities matter" is a
first-class product output).

Design (scale-first):
- the EDGE table is the 100-TB-scale object and stays distributed for the
  whole computation; it is materialized ONCE (iterative algorithms re-read
  their working set; Ray's object store spills it) and only the rank
  vector — one float per node — moves per iteration;
- per iteration: every edge block computes partial contribution sums per
  dst against a broadcast (node-ids, out-degree, ranks) lookup — a
  map_batches COMBINER, so the shuffle that follows carries at most
  n_nodes rows per block, never n_edges; a small groupby("i").sum
  finishes the per-node sum; the driver folds in damping + dangling mass
  and broadcasts the next rank vector via ray.put (n_nodes doubles);
- above ``max_broadcast_nodes`` the rank vector no longer fits a single
  broadcast; ``_pagerank_joined`` runs the same iteration as partitioned
  hash joins (edges ⋈ ranks on src), dispatched on observed node count
  like every other size threshold in this repo.

Semantics (pinned, mirrored exactly by the SQL oracle in __ray_entry__):
  edges are DISTINCT (src, dst) pairs; N = |{src} ∪ {dst}|;
  r_0(v) = 1/N;
  r_{k+1}(v) = (1-d)/N + d * ( Σ_{(u,v)∈E} r_k(u)/outdeg(u)  +  D_k/N )
  where D_k = Σ r_k(u) over dangling nodes (outdeg(u) = 0).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..ray_utils import register_for_ray

# above this node count the broadcast rank vector stops being cheap to ship
# every iteration (5M nodes = 40 MB of ranks + the id array); the joined
# path takes over
_PAGERANK_BROADCAST_MAX_NODES = 5_000_000


def _distinct_edges(edges_ds, src: str, dst: str):
    """Project to DISTINCT (src, dst) — reuses the NUL-safe coarse-partition
    DISTINCT from the dedup stage (same shape: pair table, no value cols)."""
    from .dedup import distinct_pairs

    pairs = edges_ds.map_batches(
        lambda b: pa.table({"id_a": b.column(src), "id_b": b.column(dst)}),
        batch_format="pyarrow",
    )
    return distinct_pairs(pairs, [])


def pagerank(
    edges_ds,
    *,
    src: str = "subj_node",
    dst: str = "obj_node",
    damping: float = 0.85,
    iterations: int = 10,
    max_broadcast_nodes: int = _PAGERANK_BROADCAST_MAX_NODES,
) -> pa.Table:
    """PageRank over a distributed edge Dataset -> (node_id, pr_norm) table.

    ``pr_norm`` is the N-normalized rank (mean exactly 1.0 before damping
    losses), rounded to 6 decimals — the precision contract shared with the
    SQL oracle. The returned table is driver-sized (one row per node) on
    the broadcast path; the joined path returns a Ray Dataset instead.
    """
    import ray

    register_for_ray()
    empty = pa.table(
        {"node_id": pa.array([], pa.string()), "pr_norm": pa.array([], pa.float64())}
    )
    edges = _distinct_edges(edges_ds, src, dst).materialize()
    if edges.count() == 0:
        return empty

    # The dispatch decision is made from DISTRIBUTED counts only — the
    # driver never materializes the node universe before knowing it is
    # broadcast-sized. |src ∪ dst| <= |src| + |dst|, so two groupby counts
    # give a cheap upper bound; only when that bound exceeds the threshold
    # is the exact distinct-node count computed (still distributed).
    deg_ds = edges.groupby("id_a").count().materialize()
    n_upper = deg_ds.count() + edges.groupby("id_b").count().count()
    if n_upper > max_broadcast_nodes:
        nodes_ds = _node_universe(edges).materialize()
        n_exact = nodes_ds.count()
        if n_exact > max_broadcast_nodes:
            return _pagerank_joined(
                edges, nodes_ds, n_exact, damping=damping, iterations=iterations
            )

    # broadcast path: the universe is n <= max_broadcast_nodes — safe to
    # collect ids + degrees to the driver (this path broadcasts the rank
    # vector every iteration anyway, so the driver holds O(n) by design)
    deg_tbl = pa.concat_tables(
        [
            t
            for t in (ray.get(r) for r in deg_ds.to_arrow_refs())
            if t.num_rows and "id_a" in t.column_names
        ]
        or [pa.table({"id_a": pa.array([], pa.string()),
                      "count()": pa.array([], pa.int64())})],
        promote_options="permissive",
    )
    dst_tbl = pa.concat_tables(
        [
            t
            for t in (ray.get(r) for r in edges.groupby("id_b").count().to_arrow_refs())
            if t.num_rows and "id_b" in t.column_names
        ]
        or [pa.table({"id_b": pa.array([], pa.string()),
                      "count()": pa.array([], pa.int64())})],
        promote_options="permissive",
    )
    src_ids = deg_tbl.column("id_a").to_pylist()
    all_ids = sorted(set(src_ids) | set(dst_tbl.column("id_b").to_pylist()))
    n = len(all_ids)
    if n == 0:
        return empty

    idx = {v: i for i, v in enumerate(all_ids)}
    outdeg = np.zeros(n, dtype=np.float64)
    for s, c in zip(src_ids, deg_tbl.column("count()").to_pylist()):
        outdeg[idx[s]] = float(c)
    nodes_arr = pa.array(all_ids, pa.string())
    static_ref = ray.put((nodes_arr, outdeg))

    dangling_mask = outdeg == 0.0
    r = np.full(n, 1.0 / n, dtype=np.float64)

    def _contrib(batch: pa.Table, *, static_ref, rank_ref) -> pa.Table:
        nodes_arr, outdeg = ray.get(static_ref)
        ranks = ray.get(rank_ref)
        si = pc.index_in(batch.column("id_a"), value_set=nodes_arr).to_numpy(
            zero_copy_only=False
        )
        di = pc.index_in(batch.column("id_b"), value_set=nodes_arr).to_numpy(
            zero_copy_only=False
        )
        w = ranks[si] / outdeg[si]  # every src has outdeg >= 1 by construction
        uniq, inv = np.unique(di, return_inverse=True)
        sums = np.bincount(inv, weights=w)
        return pa.table(
            {
                "i": pa.array(uniq.astype(np.int64), pa.int64()),
                "s": pa.array(sums, pa.float64()),
            }
        )

    from ray.data.aggregate import Sum

    # below ~100k nodes the driver (which holds the rank vector on this
    # path anyway) sums the per-block partials directly — same asymptotics,
    # none of the per-iteration Ray shuffle fixed cost (~1-2 s x 10 iters);
    # above, a distributed groupby reduces the partials to n_nodes rows
    # before anything reaches the driver
    driver_combine = n <= 100_000

    # the iterative loop runs as RAW Ray tasks over the materialized edge
    # block refs, not per-iteration Dataset pipelines: an iterative numeric
    # fixpoint is the documented case where the Dataset API genuinely
    # doesn't fit — 10 streaming-executor spin-ups add seconds of fixed
    # cost, and the per-iteration operator/object churn has been observed
    # to trip Ray 2.49's reference_count.cc:581 check in long sessions
    block_refs = edges.to_arrow_refs() if driver_combine else None

    @ray.remote
    def _contrib_task(block: pa.Table, static, ranks):
        nodes_arr, outdeg = static
        if block.num_rows == 0 or "id_a" not in block.column_names:
            return np.zeros(0, np.int64), np.zeros(0, np.float64)
        si = pc.index_in(block.column("id_a"), value_set=nodes_arr).to_numpy(
            zero_copy_only=False
        )
        di = pc.index_in(block.column("id_b"), value_set=nodes_arr).to_numpy(
            zero_copy_only=False
        )
        w = ranks[si] / outdeg[si]
        uniq, inv = np.unique(di, return_inverse=True)
        return uniq.astype(np.int64), np.bincount(inv, weights=w)

    for _ in range(iterations):
        rank_ref = ray.put(r)
        contrib = np.zeros(n, dtype=np.float64)
        if driver_combine:
            for uniq, sums in ray.get(
                [_contrib_task.remote(b, static_ref, rank_ref) for b in block_refs]
            ):
                np.add.at(contrib, uniq, sums)
        else:
            partials = edges.map_batches(
                _contrib,
                batch_format="pyarrow",
                fn_kwargs={"static_ref": static_ref, "rank_ref": rank_ref},
            )
            agg = pa.concat_tables(
                [
                    ray.get(ref)
                    for ref in partials.groupby("i").aggregate(Sum("s")).to_arrow_refs()
                ],
                promote_options="permissive",
            )
            if agg.num_rows:
                ii = agg.column("i").to_numpy(zero_copy_only=False).astype(np.int64)
                contrib[ii] = agg.column("sum(s)").to_numpy(zero_copy_only=False)
        dangling = float(r[dangling_mask].sum())
        r = (1.0 - damping) / n + damping * (contrib + dangling / n)

    return pa.table(
        {
            "node_id": nodes_arr,
            "pr_norm": pc.round(pa.array(r * n, pa.float64()), ndigits=6),
        }
    )


def _node_universe(edges):
    """Distinct node ids of a distinct-edge Dataset, as a Dataset of
    ``node`` — never collected to the driver."""

    def _nodes(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "id_a" not in b.column_names:
            return pa.table({"node": pa.array([], pa.string())})
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [
                        b.column("id_a").combine_chunks(),
                        b.column("id_b").combine_chunks(),
                    ]
                )
            }
        )

    def _keys(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "node" not in b.column_names:
            return pa.table({"node": pa.array([], pa.string())})
        return b.select(["node"])

    return (
        edges.map_batches(_nodes, batch_format="pyarrow")
        .groupby("node")
        .count()
        .map_batches(_keys, batch_format="pyarrow")
    )


# typed empty blocks for the joined-path kernels: Ray 2.49 hash partitions
# can go empty and arrive schema-less ('No match FieldRef' on b.column)
_RANKS_SCHEMA = pa.schema(
    [("node", pa.string()), ("outdeg", pa.float64()), ("r", pa.float64())]
)


def _pagerank_joined(edges, nodes_ds, n: int, *, damping: float, iterations: int):
    """Scale path: the rank vector itself is a Dataset; each iteration is
    edges ⋈ ranks (partitioned hash join on src) -> per-dst groupby sum ->
    left join back onto the node universe. ``nodes_ds`` is the distributed
    node universe (column ``node``) and ``n`` its count — the driver holds
    only the two scalar aggregates (dangling mass, node count), never the
    id list.

    Returns a Ray Dataset of (node_id, pr_norm)."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    nodes = nodes_ds.repartition(max(2, n // 1_000_000 + 1))

    def _deg_rows(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "id_a" not in b.column_names:
            return pa.table(
                {"dnode": pa.array([], pa.string()),
                 "outdeg": pa.array([], pa.float64())}
            )
        return pa.table(
            {
                "dnode": b.column("id_a"),
                "outdeg": pc.cast(b.column("count()"), pa.float64()),
            }
        )

    deg = edges.groupby("id_a").count().map_batches(
        _deg_rows, batch_format="pyarrow"
    )
    njoin = max(2, n // 1_000_000 + 2)

    def _init_ranks(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "node" not in b.column_names:
            return _RANKS_SCHEMA.empty_table()
        return pa.table(
            {
                "node": b.column("node"),
                "outdeg": pc.fill_null(b.column("outdeg"), 0.0),
                "r": pa.array([1.0 / n] * b.num_rows, pa.float64()),
            }
        )

    # ranks carries outdeg along so the per-iteration join is single
    ranks = nodes.join(
        deg, join_type="left_outer", num_partitions=njoin,
        on=("node",), right_on=("dnode",),
    ).map_batches(_init_ranks, batch_format="pyarrow").materialize()

    def _dangling_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "outdeg" not in b.column_names:
            return pa.table({"s": pa.array([0.0], pa.float64())})
        return pa.table(
            {
                "s": pa.array(
                    [
                        pc.sum(
                            pc.if_else(
                                pc.equal(b.column("outdeg"), 0.0),
                                b.column("r"),
                                pa.scalar(0.0),
                            )
                        ).as_py()
                        or 0.0
                    ],
                    pa.float64(),
                )
            }
        )

    def _contrib_rows(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "id_b" not in b.column_names:
            return pa.table(
                {"cnode": pa.array([], pa.string()),
                 "c": pa.array([], pa.float64())}
            )
        return pa.table(
            {
                "cnode": b.column("id_b"),
                "c": pc.divide(b.column("r"), b.column("outdeg")),
            }
        )

    for _ in range(iterations):
        dangling = sum(
            row["s"]
            for row in ranks.map_batches(
                _dangling_partial, batch_format="pyarrow"
            ).take_all()
        )
        contrib = (
            edges.join(
                ranks, join_type="inner", num_partitions=njoin,
                on=("id_a",), right_on=("node",),
            )
            .map_batches(_contrib_rows, batch_format="pyarrow")
            .groupby("cnode")
            .aggregate(Sum("c"))
        )
        base = (1.0 - damping) / n + damping * dangling / n

        def _update(b: pa.Table, *, base=base) -> pa.Table:
            if b.num_rows == 0 or "node" not in b.column_names:
                return _RANKS_SCHEMA.empty_table()
            return pa.table(
                {
                    "node": b.column("node"),
                    "outdeg": b.column("outdeg"),
                    "r": pc.add(
                        pa.scalar(base),
                        pc.multiply(
                            pa.scalar(damping),
                            pc.fill_null(b.column("sum(c)"), 0.0),
                        ),
                    ),
                }
            )

        ranks = ranks.join(
            contrib, join_type="left_outer", num_partitions=njoin,
            on=("node",), right_on=("cnode",),
        ).map_batches(_update, batch_format="pyarrow").materialize()

    def _final(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "node" not in b.column_names:
            return pa.table(
                {"node_id": pa.array([], pa.string()),
                 "pr_norm": pa.array([], pa.float64())}
            )
        return pa.table(
            {
                "node_id": b.column("node"),
                "pr_norm": pc.round(
                    pc.multiply(b.column("r"), pa.scalar(float(n))), ndigits=6
                ),
            }
        )

    return ranks.map_batches(_final, batch_format="pyarrow")


def degree_stats(edges_ds, *, src: str = "subj_node", dst: str = "obj_node"):
    """Per-node in/out degree over DISTINCT edges -> Dataset
    (node_id, out_deg, in_deg). One union + one groupby — both sides of the
    degree are counted in a single shuffle instead of two joined ones."""
    from ray.data.aggregate import Sum

    register_for_ray()
    edges = _distinct_edges(edges_ds, src, dst)

    def _tag(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "node_id": pa.concat_arrays(
                    [
                        b.column("id_a").combine_chunks(),
                        b.column("id_b").combine_chunks(),
                    ]
                ),
                "out_d": pa.array([1] * n + [0] * n, pa.int64()),
                "in_d": pa.array([0] * n + [1] * n, pa.int64()),
            }
        )

    out = (
        edges.map_batches(_tag, batch_format="pyarrow")
        .groupby("node_id")
        .aggregate(Sum("out_d"), Sum("in_d"))
    )
    return out.map_batches(
        lambda b: pa.table(
            {
                "node_id": b.column("node_id"),
                "out_deg": b.column("sum(out_d)"),
                "in_deg": b.column("sum(in_d)"),
            }
        ),
        batch_format="pyarrow",
    )


def connected_components(
    edges_ds,
    *,
    src: str = "subj_node",
    dst: str = "obj_node",
    max_broadcast_components: int = 1_000_000,
):
    """Weakly-connected components over the distinct undirected edge graph
    -> Dataset (node_id, component, component_size).

    The heavy lifting is ``stages/components.components_from_pairs`` (the
    min-label propagation + pointer-doubling machinery already proven at
    10M keys); this surfaces it as a first-class graph-analytics operator.
    ``component`` = min node id in the component (the fixpoint the
    propagation converges to). Component sizes dispatch on the OBSERVED
    component count: usually components << nodes and a driver-dict
    broadcast is one cheap ray.put, but a pair-heavy sparse graph can have
    ~n/2 components — above ``max_broadcast_components`` the sizes are
    attached by a partitioned hash join instead, so the driver never holds
    a nodes-scale structure."""
    import ray

    from .components import components_from_pairs

    register_for_ray()
    pairs = edges_ds.map_batches(
        lambda b: pa.table({"id_a": b.column(src), "id_b": b.column(dst)}),
        batch_format="pyarrow",
    )
    labels = components_from_pairs(pairs).materialize()
    counts = labels.groupby("label").count().materialize()
    n_components = counts.count()

    empty = pa.table(
        {
            "node_id": pa.array([], pa.string()),
            "component": pa.array([], pa.string()),
            "component_size": pa.array([], pa.int64()),
        }
    )

    if n_components > max_broadcast_components:
        # scale path: sizes via partitioned hash join on the label
        def _size_rows(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "label" not in b.column_names:
                return pa.table(
                    {"slabel": pa.array([], pa.string()),
                     "component_size": pa.array([], pa.int64())}
                )
            return pa.table(
                {
                    "slabel": b.column("label"),
                    "component_size": pc.cast(b.column("count()"), pa.int64()),
                }
            )

        sizes_ds = counts.map_batches(_size_rows, batch_format="pyarrow")
        njoin = max(2, n_components // 1_000_000 + 2)

        def _project(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "label" not in b.column_names:
                return empty
            return pa.table(
                {
                    "node_id": b.column("k"),
                    "component": b.column("label"),
                    "component_size": b.column("component_size"),
                }
            )

        return labels.join(
            sizes_ds, join_type="inner", num_partitions=njoin,
            on=("label",), right_on=("slabel",),
        ).map_batches(_project, batch_format="pyarrow")

    sizes: dict = {}
    for ref in counts.to_arrow_refs():
        t = ray.get(ref)
        # Ray emits schema-less empty blocks for empty groups — skip them
        if t.num_rows == 0 or "label" not in t.column_names:
            continue
        for lab, c in zip(t.column("label").to_pylist(), t.column("count()").to_pylist()):
            sizes[lab] = int(c)
    sizes_ref = ray.put(sizes)

    def _annot(b: pa.Table, *, sizes_ref) -> pa.Table:
        if b.num_rows == 0 or "label" not in b.column_names:
            return empty
        s = ray.get(sizes_ref)
        labs = b.column("label").to_pylist()
        return pa.table(
            {
                "node_id": b.column("k"),
                "component": b.column("label"),
                "component_size": pa.array([s[x] for x in labs], pa.int64()),
            }
        )

    return labels.map_batches(
        _annot, batch_format="pyarrow", fn_kwargs={"sizes_ref": sizes_ref}
    )
