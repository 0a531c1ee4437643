"""Community detection over the canonical edge graph (C7, strata analog).

Two paths, dispatched on edge count:

- **driver Leiden** (core/leiden.py) below the threshold — matches the
  reference's modularity local-moving (/root/reference/strata/src/leiden.rs:
  58-226) and is the quality baseline;
- **distributed modularity-guided label propagation** above it — the edges
  Dataset is never materialized on the driver. Each round every node
  evaluates moving to each neighboring community C with the SAME objective
  the driver Leiden uses (leiden.rs:183-226 modularity, incremental form):

      delta(i -> C) = w(i, C) - resolution * k_i * K_C / (2m)

  where w(i, C) is the weight from i into C, k_i the node's weighted degree
  and K_C the community's total degree. The degree penalty is what plain LPA
  lacks: it stops a label from flooding loosely connected regions ("label
  imperialism") because big communities pay a growing cost. Staying put is
  always a candidate (delta computed with i's own degree excluded from its
  community) and wins ties, which damps oscillation; remaining ties break by
  a per-(node, label) hash — deterministic but not globally biased. Each
  round only nodes selected by a hash of (node, round) apply their move (the
  synchronous-update analog of Leiden's sequential visiting order); a
  fixpoint is declared when the labeling survives several consecutive rounds
  unchanged. Everything is joins + groupbys over Ray Data; per round: one
  neighbor-label join, one community-degree aggregate, three annotation
  joins, one argmin groupby.

Isolated nodes (present in the node table but in no edge) are not labeled by
either path — callers treat them as singleton communities, per the contract
documented in core/leiden.py.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from ..ray_utils import register_for_ray

# above this many edges, kg_communities switches to label propagation
LEIDEN_DRIVER_MAX = 200_000


def _rank(delta: float, is_current: bool, label: str, node: str) -> str:
    """Sortable string whose MIN is (max delta, prefer current label, then a
    deterministic per-(node, label) hash tie-break)."""
    h = hashlib.blake2b(f"{node}\x00{label}".encode("utf-8"), digest_size=4).hexdigest()
    return f"{1e12 - float(delta):026.6f}\x00{0 if is_current else 1}\x00{h}\x00{label}"


def label_propagation(
    edges,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    resolution: float = 1.0,
    max_rounds: int = 24,
    num_partitions: int | None = None,
):
    """Distributed modularity-guided label propagation over a Ray Data edge
    list -> Dataset (node, label). Labels are node ids; densify with
    ``communities_table``. Deterministic across runs."""
    import ray.data
    from ray.data.aggregate import Max, Min, Sum

    register_for_ray()
    if isinstance(edges, pa.Table):
        edges = ray.data.from_arrow(edges)

    def _sym(b: pa.Table) -> pa.Table:
        src = b.column(src_col).to_pylist()
        dst = b.column(dst_col).to_pylist()
        if weight_col is not None:
            w = [float(x) for x in b.column(weight_col).to_pylist()]
        else:
            w = [1.0] * len(src)
        keep_s, keep_d, keep_w = [], [], []
        for s, d, x in zip(src, dst, w):
            if s == d:
                continue
            keep_s.append(s); keep_d.append(d); keep_w.append(x)
        return pa.table(
            {
                "src": pa.array(keep_s + keep_d, pa.string()),
                "dst": pa.array(keep_d + keep_s, pa.string()),
                "w": pa.array(keep_w + keep_w, pa.float64()),
            }
        )

    def _ren(names: dict):
        return lambda b: b.rename_columns(
            [names.get(c, c) for c in b.column_names]
        )

    sym = edges.map_batches(_sym, batch_format="pyarrow")
    # collapse parallel edges once: (src, dst) -> total weight
    adj = (
        sym.groupby(["src", "dst"]).aggregate(Sum("w"))
        .map_batches(_ren({"sum(w)": "w"}), batch_format="pyarrow")
        .materialize()
    )
    if num_partitions is None:
        num_partitions = min(64, max(2, adj.count() // 200_000 + 2))

    # weighted degree per node + 2m (scalar)
    deg = (
        adj.groupby("src").aggregate(Sum("w"))
        .map_batches(_ren({"src": "dnode", "sum(w)": "k"}), batch_format="pyarrow")
        .materialize()
    )
    two_m = sum(
        r["s"]
        for r in deg.map_batches(
            lambda b: pa.table(
                {"s": pa.array([float(pa.compute.sum(b.column("k")).as_py() or 0.0)])}
            ),
            batch_format="pyarrow",
        ).take_all()
    )
    if two_m <= 0:
        two_m = 1.0

    labels = deg.map_batches(
        lambda b: pa.table({"node": b.column("dnode"), "label": b.column("dnode")}),
        batch_format="pyarrow",
    ).materialize()

    def _signature(ds_) -> int:
        from .components import multiset_signature

        return multiset_signature(ds_, ("node", "label"))

    def _active(node: str, rnd: int) -> bool:
        d = hashlib.blake2b(f"{node}\x00{rnd}".encode("utf-8"), digest_size=1)
        return bool(d.digest()[0] & 1)

    old_sig = _signature(labels)
    stable_rounds = 0
    for rnd in range(max_rounds):
        # community total degree K_C under the current labeling
        comm_deg = (
            labels.join(
                deg, join_type="inner", num_partitions=num_partitions,
                on=("node",), right_on=("dnode",),
            )
            .map_batches(
                lambda b: pa.table({"clabel": b.column("label"), "k": b.column("k")}),
                batch_format="pyarrow",
            )
            .groupby("clabel")
            .aggregate(Sum("k"))
            .map_batches(_ren({"sum(k)": "K"}), batch_format="pyarrow")
        )
        # w(i -> label) over neighbors
        scores = (
            adj.join(
                labels, join_type="inner", num_partitions=num_partitions,
                on=("dst",), right_on=("node",),
            )
            .map_batches(
                lambda b: pa.table(
                    {
                        "cnode": b.column("src"),
                        "cand": b.column("label"),
                        "w_in": b.column("w"),
                    }
                ),
                batch_format="pyarrow",
            )
        )
        # staying put is always a candidate (w_in contributes 0 extra rows;
        # Max merges it with the real score when neighbors share the label)
        stay = labels.map_batches(
            lambda b: pa.table(
                {
                    "cnode": b.column("node"),
                    "cand": b.column("label"),
                    "w_in": pa.array([0.0] * b.num_rows, pa.float64()),
                }
            ),
            batch_format="pyarrow",
        )
        cand = (
            scores.union(stay)
            .groupby(["cnode", "cand"])
            .aggregate(Sum("w_in"))
            .map_batches(_ren({"sum(w_in)": "w_in"}), batch_format="pyarrow")
        )
        cand = cand.join(
            comm_deg, join_type="inner", num_partitions=num_partitions,
            on=("cand",), right_on=("clabel",),
        )
        cand = cand.join(
            deg, join_type="inner", num_partitions=num_partitions,
            on=("cnode",), right_on=("dnode",),
        )
        cand = cand.join(
            labels, join_type="inner", num_partitions=num_partitions,
            on=("cnode",), right_on=("node",),
        )

        gamma = resolution
        tm = two_m

        def _enc(b: pa.Table) -> pa.Table:
            nodes = b.column("cnode").to_pylist()
            cands = b.column("cand").to_pylist()
            w_in = b.column("w_in").to_pylist()
            Ks = b.column("K").to_pylist()
            ks = b.column("k").to_pylist()
            curs = b.column("label").to_pylist()
            ranks = []
            for node, lab, w, K, k_i, cur in zip(nodes, cands, w_in, Ks, ks, curs):
                is_cur = lab == cur
                K_eff = K - (k_i if is_cur else 0.0)
                delta = w - gamma * k_i * K_eff / tm
                ranks.append(_rank(delta, is_cur, lab, node))
            return pa.table(
                {
                    "node2": pa.array(nodes, pa.string()),
                    "rank": pa.array(ranks, pa.string()),
                }
            )

        best = (
            cand.map_batches(_enc, batch_format="pyarrow")
            .groupby("node2")
            .aggregate(Min("rank"))
            .map_batches(
                lambda b: pa.table(
                    {
                        "node2": b.column("node2"),
                        "new_label": pa.array(
                            [
                                r.split("\x00", 3)[3]
                                for r in b.column("min(rank)").to_pylist()
                            ],
                            pa.string(),
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
        )

        def _merge(b: pa.Table) -> pa.Table:
            nodes = b.column("node").to_pylist()
            old = b.column("label").to_pylist()
            new = b.column("new_label").to_pylist()
            out = [
                n_lab
                if (n_lab is not None and _active(node, rnd))
                else o_lab
                for node, o_lab, n_lab in zip(nodes, old, new)
            ]
            return pa.table(
                {
                    "node": pa.array(nodes, pa.string()),
                    "label": pa.array(out, pa.string()),
                }
            )

        labels = (
            labels.join(
                best, join_type="left_outer", num_partitions=num_partitions,
                on=("node",), right_on=("node2",),
            )
            .map_batches(_merge, batch_format="pyarrow")
            .materialize()
        )
        new_sig = _signature(labels)
        if new_sig == old_sig:
            stable_rounds += 1
            # several distinct active subsets must pass unchanged before
            # declaring a fixpoint (one unchanged round could be luck)
            if stable_rounds >= 3:
                break
        else:
            stable_rounds = 0
        old_sig = new_sig
    return labels


def communities_table(labels_ds) -> pa.Table:
    """Densify label strings into 0-based community ids ordered by the
    community's min node id (matching core/leiden.py's densification). The
    driver holds the FINAL (node, label) assignment only — use this for
    result-sized outputs; at larger scale keep the labels Dataset and write
    it to parquet instead."""
    import ray

    tables = [ray.get(r) for r in labels_ds.to_arrow_refs()]
    tables = [t for t in tables if t.num_rows]
    if not tables:
        return pa.table(
            {"node_id": pa.array([], pa.string()), "community": pa.array([], pa.int64())}
        )
    tbl = pa.concat_tables(tables, promote_options="permissive")
    nodes = tbl.column("node").to_pylist()
    labels = tbl.column("label").to_pylist()
    by_label: dict[str, list[str]] = {}
    for n, l in zip(nodes, labels):
        by_label.setdefault(l, []).append(n)
    ordered = sorted(by_label.values(), key=min)
    comm_of = {n: i for i, members in enumerate(ordered) for n in members}
    rows = sorted(comm_of.items())
    return pa.table(
        {
            "node_id": pa.array([r[0] for r in rows], pa.string()),
            "community": pa.array([r[1] for r in rows], pa.int64()),
        }
    )
