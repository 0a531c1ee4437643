"""Generic relational operators, Ray-Data-first, with DuckDB-matching names.

Each function takes ``sf_dir`` and returns a Dataset/pandas DataFrame whose
column names match the paired oracle SQL in ``__ray_entry__.oracle_sql``.
These exercise the engine's wide operators (groupby-aggregate with partial
combine, hash join via broadcast small side, sort+limit top-k, filter+project
pushdown) against the TPC-H-ish driver tables.

Money-typed aggregates are rounded to 2 decimals on BOTH sides to absorb
float summation-order differences between distributed and single-process
execution.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

from ..ray_utils import register_for_ray


def _read(sf_dir: str, table: str, columns: list[str] | None = None):
    import ray.data

    register_for_ray()
    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"), columns=columns
    )


def _rename(names: dict[str, str]):
    def fn(b: pa.Table) -> pa.Table:
        return b.rename_columns([names.get(c, c) for c in b.column_names])

    return fn


def _round_cols(cols: list[str], ndigits: int = 2):
    def fn(b: pa.Table) -> pa.Table:
        for c in cols:
            if c in b.column_names:
                i = b.column_names.index(c)
                b = b.set_column(
                    i, c, pc.round(b.column(c), ndigits=ndigits)
                )
        return b

    return fn


def _broadcast_lookup(mapping: dict, default: str = ""):
    """Broadcast a small int->str map once (``ray.put`` of two sorted numpy
    arrays — zero-copy plasma reads in every task) and return a vectorized
    ``searchsorted`` attach/membership kernel for task-pool ``map_batches``.

    Plain-function closure => Ray task pool: no actor spin-up for a
    kB-sized lookup side (the ann round-3 lesson), and the per-batch work is
    one sort-lookup instead of a Python dict probe per row.
    """
    import numpy as np
    import ray

    keys = np.fromiter(mapping.keys(), dtype=np.int64, count=len(mapping))
    order = np.argsort(keys, kind="stable")
    vals = np.asarray([str(v) for v in mapping.values()], dtype=object)[order]
    ref = ray.put((keys[order], vals))

    def lookup(batch_keys: "np.ndarray"):
        import ray as _r

        sk, sv = _r.get(ref)
        if len(sk) == 0:
            hit = np.zeros(len(batch_keys), dtype=bool)
            return hit, np.full(len(batch_keys), default, dtype=object)
        pos = np.searchsorted(sk, batch_keys)
        pos = np.minimum(pos, len(sk) - 1)
        hit = sk[pos] == batch_keys
        out = np.where(hit, sv[pos], default)
        return hit, out

    return lookup


def agg_lineitem_pricing(sf_dir: str):
    """TPC-H Q1-style groupby-aggregate (partial combine inside Ray's
    hash aggregate)."""
    from ray.data.aggregate import Count, Mean, Sum

    ds = _read(
        sf_dir, "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )
    out = (
        ds.groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity"), Sum("l_extendedprice"), Mean("l_discount"), Count()
        )
    )
    return out.map_batches(
        _rename(
            {
                "sum(l_quantity)": "sum_qty",
                "sum(l_extendedprice)": "sum_price",
                "mean(l_discount)": "avg_disc",
                "count()": "cnt",
            }
        ),
        batch_format="pyarrow",
    ).map_batches(_round_cols(["sum_qty", "sum_price"]), batch_format="pyarrow").map_batches(
        _round_cols(["avg_disc"], 6), batch_format="pyarrow"
    )


def join_orders_customer_segment(sf_dir: str):
    """Broadcast hash join (small customer side shipped once via ray.put)
    + groupby revenue rollup."""
    import ray

    customers = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    cust_tbl = pa.concat_tables(
        [ray.get(r) for r in customers.to_arrow_refs()], promote_options="permissive"
    )
    seg_of = dict(
        zip(
            cust_tbl.column("c_custkey").to_pylist(),
            cust_tbl.column("c_mktsegment").to_pylist(),
        )
    )
    lookup = _broadcast_lookup(seg_of)

    def attach_segment(b: pa.Table) -> pa.Table:
        keys = b.column("o_custkey").to_numpy(zero_copy_only=False)
        _, segs = lookup(keys)
        return b.append_column("c_mktsegment", pa.array(segs, pa.string()))

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    joined = orders.map_batches(attach_segment, batch_format="pyarrow")
    from ray.data.aggregate import Count, Sum

    out = joined.groupby("c_mktsegment").aggregate(Sum("o_totalprice"), Count())
    return out.map_batches(
        _rename({"sum(o_totalprice)": "revenue", "count()": "n_orders"}),
        batch_format="pyarrow",
    ).map_batches(_round_cols(["revenue"]), batch_format="pyarrow")


def topk_parts_by_price(sf_dir: str):
    """Global top-k: sort + limit."""
    ds = _read(sf_dir, "part", ["p_partkey", "p_name", "p_retailprice"])
    return ds.sort(["p_retailprice", "p_partkey"], descending=[True, False]).limit(10)


def filter_orders_recent(sf_dir: str):
    """Filter + project + aggregate (predicate applied in Arrow kernels)."""
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def flt(b: pa.Table) -> pa.Table:
        import datetime

        mask = pc.greater_equal(
            b.column("o_orderdate"), pa.scalar(datetime.datetime(1997, 1, 1))
        )
        return b.filter(mask)

    from ray.data.aggregate import Count, Sum

    out = ds.map_batches(flt, batch_format="pyarrow").aggregate(
        Sum("o_totalprice"), Count()
    )
    import pandas as pd

    return pd.DataFrame(
        {
            "total": [round(out["sum(o_totalprice)"], 2)],
            "n": [out["count()"]],
        }
    )


def supplier_nation_region(sf_dir: str):
    """Two-level broadcast join: supplier -> nation -> region, then rollup."""
    import ray

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"])
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"])
    n_tbl = pa.concat_tables([ray.get(r) for r in nation.to_arrow_refs()])
    r_tbl = pa.concat_tables([ray.get(r) for r in region.to_arrow_refs()])
    region_of_nation = {}
    rname = dict(
        zip(r_tbl.column("r_regionkey").to_pylist(), r_tbl.column("r_name").to_pylist())
    )
    for nk, rk in zip(
        n_tbl.column("n_nationkey").to_pylist(), n_tbl.column("n_regionkey").to_pylist()
    ):
        region_of_nation[nk] = rname.get(rk, "")
    lookup = _broadcast_lookup(region_of_nation)

    def attach_region(b: pa.Table) -> pa.Table:
        keys = b.column("s_nationkey").to_numpy(zero_copy_only=False)
        _, rs = lookup(keys)
        return b.append_column("r_name", pa.array(rs, pa.string()))

    supplier = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey", "s_acctbal"])
    from ray.data.aggregate import Count, Sum

    out = (
        supplier.map_batches(attach_region, batch_format="pyarrow")
        .groupby("r_name")
        .aggregate(Count(), Sum("s_acctbal"))
    )
    return out.map_batches(
        _rename({"count()": "n_suppliers", "sum(s_acctbal)": "total_bal"}),
        batch_format="pyarrow",
    ).map_batches(_round_cols(["total_bal"]), batch_format="pyarrow")


def events_by_type(sf_dir: str):
    """Event-stream rollup: count + rounded sum/mean per type."""
    from ray.data.aggregate import Count, Mean, Sum

    ds = _read(sf_dir, "events", ["event_type", "value"])
    out = ds.groupby("event_type").aggregate(Count(), Sum("value"), Mean("value"))
    return out.map_batches(
        _rename(
            {"count()": "n", "sum(value)": "total_value", "mean(value)": "avg_value"}
        ),
        batch_format="pyarrow",
    ).map_batches(_round_cols(["total_value", "avg_value"], 4), batch_format="pyarrow")


def events_daily_topusers(sf_dir: str):
    """Time-bucketed aggregate + top-k: busiest (user, day) pairs."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def day_col(b: pa.Table) -> pa.Table:
        days = pc.floor_temporal(b.column("ts"), unit="day")
        return b.append_column("day", days)

    from ray.data.aggregate import Count, Sum

    out = (
        ds.map_batches(day_col, batch_format="pyarrow")
        .groupby(["user_id", "day"])
        .aggregate(Count(), Sum("value"))
    )
    out = out.map_batches(
        _rename({"count()": "n_events", "sum(value)": "day_value"}),
        batch_format="pyarrow",
    ).map_batches(_round_cols(["day_value"], 4), batch_format="pyarrow")
    return out.sort(["n_events", "user_id", "day"], descending=[True, False, False]).limit(20)


def orders_priority_customers(sf_dir: str):
    """COUNT(DISTINCT) via two-level groupby: distinct (priority, custkey)
    first (combiner-friendly), then count per priority."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_custkey"])
    distinct = (
        ds.groupby(["o_orderpriority", "o_custkey"])
        .aggregate(Count())
    )
    out = distinct.groupby("o_orderpriority").aggregate(Count())
    return out.map_batches(
        _rename({"count()": "n_customers"}), batch_format="pyarrow"
    ).map_batches(
        lambda b: b.select(["o_orderpriority", "n_customers"]),
        batch_format="pyarrow",
    )


def union_names_count(sf_dir: str):
    """ds.union: customer + supplier name rows, total count."""
    import pandas as pd

    c = _read(sf_dir, "customer", ["c_name"]).map_batches(
        lambda b: b.rename_columns(["name"]), batch_format="pyarrow"
    )
    s = _read(sf_dir, "supplier", ["s_name"]).map_batches(
        lambda b: b.rename_columns(["name"]), batch_format="pyarrow"
    )
    u = c.union(s)
    return pd.DataFrame({"n_names": [u.count()]})


def customers_without_orders(sf_dir: str):
    """ANTI join: customers with no orders.

    The big (fact) side is first reduced DISTRIBUTEDLY to its distinct keys —
    a per-block set combiner then a groupby — so only the customer-sized
    distinct-key set ever reaches the driver/broadcast, never a fact-table
    projection."""
    import pandas as pd
    import ray

    orders = _read(sf_dir, "orders", ["o_custkey"])

    def _distinct_block(b: pa.Table) -> pa.Table:
        keys = pc.unique(b.column("o_custkey"))
        return pa.table({"o_custkey": keys})

    distinct = (
        orders.map_batches(_distinct_block, batch_format="pyarrow")
        .groupby("o_custkey")
        .count()
    )
    custkeys_with_orders = set()
    for ref in distinct.to_arrow_refs():
        t = ray.get(ref)
        custkeys_with_orders.update(t.column("o_custkey").to_pylist())
    lookup = _broadcast_lookup(dict.fromkeys(custkeys_with_orders, "1"))

    def anti_join(b: pa.Table) -> pa.Table:
        keys = b.column("c_custkey").to_numpy(zero_copy_only=False)
        hit, _ = lookup(keys)
        return b.filter(pa.array(~hit))

    customers = _read(sf_dir, "customer", ["c_custkey"])
    n = customers.map_batches(anti_join, batch_format="pyarrow").count()
    return pd.DataFrame({"n_customers": [n]})


def events_value_median_by_type(sf_dir: str, num_partitions: int = 32):
    """Exact per-group median (quantile_cont 0.5) of value per event_type.

    Groups are co-located by coarse hash partition (complete types per
    partition) and each partition computes every contained type's median in
    ONE vectorized lexsort pass — the house idiom, group-count-independent.
    Co-location implies a type's values fit one worker; for unbounded
    per-group volumes compose ``stages.quantiles.column_quantiles`` per
    group instead (histogram narrowing needs no co-location).
    """
    import numpy as np
    import pandas as pd

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def _part(b: pa.Table) -> pa.Table:
        et = pd.util.hash_array(
            np.asarray(b.column("event_type").to_pandas(), dtype=object)
        ).astype(np.uint64)
        return b.append_column(
            "part", pa.array((et % num_partitions).astype(np.int32), pa.int32())
        )

    def medians_partition(group: pa.Table) -> pa.Table:
        et = np.asarray(group.column("event_type").to_pandas(), dtype=object)
        val = group.column("value").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        if len(et) == 0:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "median_value": pa.array([], pa.float64()),
                }
            )
        codes, uniques = pd.factorize(et, sort=True)
        order = np.lexsort((val, codes))
        c, v = codes[order], val[order]
        starts = np.searchsorted(c, np.arange(len(uniques)))
        ends = np.append(starts[1:], len(c))
        meds = []
        for s, e in zip(starts, ends):
            g = v[s:e]
            r = (len(g) - 1) / 2.0
            k = int(np.floor(r))
            meds.append(
                float(g[k]) if r == k else float(g[k] + (r - k) * (g[k + 1] - g[k]))
            )
        return pa.table(
            {
                "event_type": pa.array(list(uniques), pa.string()),
                "median_value": pa.array(
                    [round(m, 4) for m in meds], pa.float64()
                ),
            }
        )

    out = (
        ds.map_batches(_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(medians_partition, batch_format="pyarrow")
    )
    return out.sort("event_type")


def lineitem_price_quantiles(sf_dir: str):
    """Exact interpolated quantiles of l_extendedprice via the distributed
    histogram-narrowing operator (stages/quantiles.py) — no global sort, no
    driver materialization."""
    from ..stages.quantiles import column_quantiles

    qs = (0.25, 0.5, 0.9, 0.99)
    ds = _read(sf_dir, "lineitem", ["l_extendedprice"])
    got = column_quantiles(ds, "l_extendedprice", qs)
    return pa.table(
        {
            "q": pa.array(list(qs), pa.float64()),
            "value": pa.array(
                [round(got[q], 4) for q in qs], pa.float64()
            ),
        }
    )


def events_tumbling_window(sf_dir: str, hours: int = 6):
    """Tumbling-window aggregate: epoch-aligned fixed windows over the event
    stream, counts + value sums per (window_start, event_type).

    Scale shape: the per-batch Arrow hash aggregate is the COMBINER — each
    batch collapses to at most (windows x types) partial rows before the
    global groupby, so the shuffle moves kB-sized partials, never raw events.
    Window assignment is integer floor-division on the us timestamp (epoch-
    aligned, matching DuckDB ``epoch_us // width * width``).
    """
    import numpy as np

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
    width_us = hours * 3600 * 1_000_000

    def partial(b: pa.Table) -> pa.Table:
        ts = b.column("ts").to_numpy(zero_copy_only=False)
        us = ts.astype("datetime64[us]").astype(np.int64)
        win = (us // width_us) * width_us
        t = pa.table(
            {
                "window_start": pa.array(
                    win.astype("datetime64[us]"), pa.timestamp("us")
                ),
                "event_type": b.column("event_type"),
                "value": b.column("value"),
            }
        )
        agg = t.group_by(["window_start", "event_type"]).aggregate(
            [("value", "sum"), ("value", "count")]
        )
        return agg.rename_columns(
            ["window_start", "event_type", "value_sum", "n_events"]
        )

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["window_start", "event_type"])
        .aggregate(Sum("value_sum"), Sum("n_events"))
    )
    out = out.map_batches(
        _rename(
            {"sum(value_sum)": "total_value", "sum(n_events)": "n_events"}
        ),
        batch_format="pyarrow",
    ).map_batches(_round_cols(["total_value"], 2), batch_format="pyarrow")
    return out.sort(["window_start", "event_type"])


def events_sessionize(sf_dir: str, gap_minutes: int = 30, num_partitions: int = 256):
    """Stateful windowed aggregate: per-user sessions split on >gap idle.

    NOT groupby(user).map_groups — one Ray group per user is pathological at
    millions of users (per-group task overhead dominates). Instead the
    COARSE-HASH-PARTITION idiom the canonicalize stage established
    (canonicalize.py ``part = key % N``): one shuffle into a fixed number of
    partitions that each co-locate complete users, then a fully vectorized
    numpy lexsort + run-detection kernel computes every user's sessions in
    one pass over the partition. Wall time is partition-count-, not
    user-count-, bound. Returns per-user session counts + max session length
    (deterministic).
    """
    import numpy as np

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    gap_us = gap_minutes * 60 * 1_000_000

    def _part(b: pa.Table) -> pa.Table:
        uid = b.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column(
            "part", pa.array((uid % num_partitions).astype(np.int32), pa.int32())
        )

    def sessions_partition(group: pa.Table) -> pa.Table:
        uid = group.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = (
            group.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype("int64")
        )
        if len(uid) == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n_sessions": pa.array([], pa.int64()),
                    "max_session_events": pa.array([], pa.int64()),
                }
            )
        order = np.lexsort((ts, uid))
        u, t = uid[order], ts[order]
        new_user = np.r_[True, u[1:] != u[:-1]]
        brk = new_user | np.r_[False, (t[1:] - t[:-1]) > gap_us]
        starts = np.flatnonzero(brk)
        sizes = np.diff(np.r_[starts, len(u)])
        sess_user = u[starts]
        ub = np.flatnonzero(np.r_[True, sess_user[1:] != sess_user[:-1]])
        n_sessions = np.diff(np.r_[ub, len(sizes)])
        max_events = np.maximum.reduceat(sizes, ub)
        return pa.table(
            {
                "user_id": pa.array(sess_user[ub], pa.int64()),
                "n_sessions": pa.array(n_sessions, pa.int64()),
                "max_session_events": pa.array(max_events.astype(np.int64), pa.int64()),
            }
        )

    return (
        ds.map_batches(_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(sessions_partition, batch_format="pyarrow")
    )


def top_customer_per_nation(sf_dir: str, num_partitions: int = 256):
    """Argmax-per-group (window-function analog): the highest-acctbal
    customer in each nation, ties broken by smallest custkey.

    ROW_NUMBER() OVER (PARTITION BY ... ORDER BY ...) = 1, Ray-native and
    group-count-independent: a per-block COMBINER reduces each block to at
    most one candidate row per nation before any shuffle, then a coarse-hash
    partition (``key % N``, the canonicalize.py idiom — NOT one Ray group
    per key) finishes the argmax with one vectorized lexsort per partition.
    The nation-name annotation is a broadcast join (nation is tiny)."""
    import numpy as np
    import ray

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"])
    n_tbl = pa.concat_tables(
        [ray.get(r) for r in nation.to_arrow_refs()], promote_options="permissive"
    )
    names = dict(
        zip(n_tbl.column("n_nationkey").to_pylist(), n_tbl.column("n_name").to_pylist())
    )

    ds = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey", "c_acctbal"])

    def _best_rows(b: pa.Table, with_part: bool) -> pa.Table:
        """Vectorized argmax per nation: lexsort by (nation, -bal, custkey),
        keep each nation run's first row."""
        nk = b.column("c_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(nk) == 0:
            out = b.select(["c_nationkey", "c_custkey", "c_name", "c_acctbal"])
            return out.append_column("part", pa.array([], pa.int32())) if with_part else out
        bal = b.column("c_acctbal").to_numpy(zero_copy_only=False).astype(np.float64)
        ck = b.column("c_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ck, -bal, nk))
        snk = nk[order]
        firsts = order[np.r_[True, snk[1:] != snk[:-1]]]
        out = b.select(["c_nationkey", "c_custkey", "c_name", "c_acctbal"]).take(
            pa.array(firsts)
        )
        if with_part:
            out = out.append_column(
                "part",
                pa.array(
                    (nk[firsts] % num_partitions).astype(np.int32), pa.int32()
                ),
            )
        return out

    combined = ds.map_batches(
        lambda b: _best_rows(b, True), batch_format="pyarrow"
    )

    def finish_pick(group: pa.Table) -> pa.Table:
        best = _best_rows(group, False)
        nks = best.column("c_nationkey").to_pylist()
        return pa.table(
            {
                "n_name": pa.array([names.get(nk, "") for nk in nks], pa.string()),
                "c_custkey": best.column("c_custkey"),
                "c_name": best.column("c_name"),
                "top_acctbal": pc.round(
                    pc.cast(best.column("c_acctbal"), pa.float64()), ndigits=2
                ),
            }
        )

    return combined.groupby("part").map_groups(finish_pick, batch_format="pyarrow")


def lineitem_heavy_parts(sf_dir: str, min_lines: int = 40):
    """GROUP BY + HAVING: parts appearing on at least min_lines lineitems."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity"])
    agg = ds.groupby("l_partkey").aggregate(Count(), Sum("l_quantity"))
    agg = agg.map_batches(
        _rename({"count()": "n_lines", "sum(l_quantity)": "total_qty"}),
        batch_format="pyarrow",
    )

    def _having(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater_equal(b.column("n_lines"), min_lines))
        return pa.table(
            {
                "l_partkey": b.column("l_partkey"),
                "n_lines": b.column("n_lines"),
                "total_qty": pc.round(
                    pc.cast(b.column("total_qty"), pa.float64()), ndigits=2
                ),
            }
        )

    return agg.map_batches(_having, batch_format="pyarrow")


def events_with_prev(sf_dir: str, num_partitions: int = 256):
    """Windowed LAG: each event annotated with the same user's previous
    event value (NULL for a user's first event).

    LAG(value) OVER (PARTITION BY user_id ORDER BY ts, value), Ray-native:
    coarse hash partition (`user % N`) + ONE vectorized lexsort + shift per
    partition — group-count-independent, the same idiom as sessionize."""
    import numpy as np

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def _part(b: pa.Table) -> pa.Table:
        uid = b.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column(
            "part", pa.array((uid % num_partitions).astype(np.int32), pa.int32())
        )

    def lag_partition(group: pa.Table) -> pa.Table:
        uid = group.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = (
            group.column("ts").to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype("int64")
        )
        val = group.column("value").to_numpy(zero_copy_only=False).astype(np.float64)
        if len(uid) == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "ts": pa.array([], pa.timestamp("us")),
                    "value": pa.array([], pa.float64()),
                    "prev_value": pa.array([], pa.float64()),
                }
            )
        order = np.lexsort((val, ts, uid))
        u, t, v = uid[order], ts[order], val[order]
        prev = np.r_[np.nan, v[:-1]]
        new_user = np.r_[True, u[1:] != u[:-1]]
        prev[new_user] = np.nan
        # pc.round: half-away-from-zero, matching DuckDB ROUND and the
        # sibling operators (np.round/Python round are half-to-even and
        # would diverge from the oracle on exact .00005 ties)
        prev_arr = pa.array(prev, pa.float64(), from_pandas=True)  # NaN -> null
        return pa.table(
            {
                "user_id": pa.array(u, pa.int64()),
                "ts": pa.array(t.astype("datetime64[us]"), pa.timestamp("us")),
                "value": pc.round(
                    pa.array(v, pa.float64()), ndigits=4,
                    round_mode="half_towards_infinity",
                ),
                "prev_value": pc.round(
                    prev_arr, ndigits=4, round_mode="half_towards_infinity"
                ),
            }
        )

    return (
        ds.map_batches(_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(lag_partition, batch_format="pyarrow")
    )


def events_asof_orders(sf_dir: str, num_partitions: int = 256):
    """AS-OF join: each event picks the same customer's LATEST order with
    o_orderdate <= ts (DuckDB `ASOF JOIN` semantics, inner: events with no
    prior order are dropped). Orders are pre-aggregated per
    (custkey, orderdate) so the as-of target is unique and deterministic.

    Ray-native: tag + union the two (narrow) row sets, coarse hash
    partition by the key, ONE vectorized lexsort per partition with orders
    sorting before events at equal timestamps, then an index
    forward-fill — no per-key groups, no sort of either full table."""
    import numpy as np

    from ray.data.aggregate import Sum

    events = _read(sf_dir, "events", ["user_id", "ts"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])
    day_totals = (
        orders.groupby(["o_custkey", "o_orderdate"]).aggregate(Sum("o_totalprice"))
        .map_batches(
            _rename({"sum(o_totalprice)": "day_total"}), batch_format="pyarrow"
        )
    )

    def _tag_orders(b: pa.Table) -> pa.Table:
        key = b.column("o_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        t = (
            b.column("o_orderdate").to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype("int64")
        )
        tot = pc.round(pc.cast(b.column("day_total"), pa.float64()), ndigits=2)
        return pa.table(
            {
                "part": pa.array((key % num_partitions).astype(np.int32), pa.int32()),
                "key": pa.array(key, pa.int64()),
                "t": pa.array(t, pa.int64()),
                "tag": pa.array(np.zeros(len(key), np.int8), pa.int8()),
                "total": tot,
            }
        )

    def _tag_events(b: pa.Table) -> pa.Table:
        key = b.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        t = (
            b.column("ts").to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype("int64")
        )
        return pa.table(
            {
                "part": pa.array((key % num_partitions).astype(np.int32), pa.int32()),
                "key": pa.array(key, pa.int64()),
                "t": pa.array(t, pa.int64()),
                "tag": pa.array(np.ones(len(key), np.int8), pa.int8()),
                "total": pa.array([None] * len(key), pa.float64()),
            }
        )

    tagged = day_totals.map_batches(_tag_orders, batch_format="pyarrow").union(
        events.map_batches(_tag_events, batch_format="pyarrow")
    )

    def asof_partition(group: pa.Table) -> pa.Table:
        key = group.column("key").to_numpy(zero_copy_only=False).astype(np.int64)
        t = group.column("t").to_numpy(zero_copy_only=False).astype(np.int64)
        tag = group.column("tag").to_numpy(zero_copy_only=False).astype(np.int8)
        total = group.column("total").to_numpy(zero_copy_only=False).astype(np.float64)
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "ts": pa.array([], pa.timestamp("us")),
                "last_order_date": pa.array([], pa.timestamp("us")),
                "last_order_total": pa.array([], pa.float64()),
            }
        )
        if len(key) == 0:
            return empty
        # orders (tag 0) sort before events (tag 1) at equal time: an order
        # AT the event timestamp is visible to the event (<=, ASOF JOIN)
        order = np.lexsort((tag, t, key))
        k, tt, tg, tot = key[order], t[order], tag[order], total[order]
        n = len(k)
        idx = np.where(tg == 0, np.arange(n), -1)
        last = np.maximum.accumulate(idx)
        ev = tg == 1
        valid = ev & (last >= 0)
        valid[valid] &= k[last[valid]] == k[valid]  # never cross a key boundary
        if not valid.any():
            return empty
        return pa.table(
            {
                "user_id": pa.array(k[valid], pa.int64()),
                "ts": pa.array(tt[valid].astype("datetime64[us]"), pa.timestamp("us")),
                "last_order_date": pa.array(
                    tt[last[valid]].astype("datetime64[us]"), pa.timestamp("us")
                ),
                # day_total was already pc.round-ed to 2dp in _tag_orders;
                # re-rounding here with np.round (half-to-even) could flip
                # exact .xx5 ties vs the DuckDB oracle — pass through as-is
                "last_order_total": pa.array(tot[last[valid]], pa.float64()),
            }
        )

    return tagged.groupby("part").map_groups(asof_partition, batch_format="pyarrow")
