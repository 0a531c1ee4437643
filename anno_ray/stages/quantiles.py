"""Distributed EXACT quantiles without a global sort.

``column_quantiles`` computes exact interpolated quantiles (DuckDB/NumPy
``quantile_cont`` semantics) over a numeric Dataset column using iterative
histogram narrowing:

1. One aggregate pass gets (count, min, max).
2. Each narrowing round is ONE ``map_batches`` scan emitting per-block
   histogram partials for every active search interval (kB-sized: at most
   ``bins`` rows per interval per block), combined by a tiny
   ``groupby(interval, bin).sum``. The driver walks the cumulative counts to
   find the bin holding each needed rank, then recurses into just those bins.
3. When every candidate interval holds <= ``collect_cap`` rows (or all its
   values are identical), a final filtered collect pulls only those rows to
   the driver for the exact rank lookup + interpolation.

Interval membership is defined by a CHAIN of bin-index selections — level r
membership is "parent membership AND parent-grid bin index == b", computed
with the identical float operations the parent histogram used — never by
fresh lo/hi float comparisons. This makes every round's partition exactly
consistent with the previous round's counts (no boundary drift), so the rank
arithmetic is exact.

Scale shape: every pass streams the full column but moves only histogram
partials (bins x intervals rows) and, at the end, <= collect_cap x n_ranks
actual values. Nothing resembling the dataset ever reaches the driver, and
there is no all-to-all shuffle — the combine groupby is over <= intervals x
bins keys. Skewed/duplicate-heavy columns terminate via the all-duplicates
shortcut rather than degenerate collects.

The reference repo has no quantile operator; this is part of the
training-data analysis extension set (corpus length/score distributions).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..ray_utils import register_for_ray

_MAX_ROUNDS = 6


def _member_mask(v: np.ndarray, root: tuple[float, float],
                 chain: tuple[tuple[float, float, int], ...],
                 bins: int) -> np.ndarray:
    """Membership for the interval identified by ``chain`` under ``root``.

    Reproduces bit-for-bit the idx arithmetic each parent histogram used, so
    counts agree exactly across rounds."""
    lo0, hi0 = root
    m = (v >= lo0) & (v <= hi0)
    for plo, phi, b in chain:
        w = phi - plo
        idx = np.clip(((v - plo) / w * bins).astype(np.int64), 0, bins - 1)
        m &= idx == b
    return m


def _child_bounds(iv: dict, b: int, bins: int) -> tuple[float, float]:
    lo, hi = iv["lo"], iv["hi"]
    w = (hi - lo) / bins
    return lo + b * w, hi if b == bins - 1 else lo + (b + 1) * w


def _histogram_pass(ds, col: str, intervals: list[dict], bins: int) -> dict:
    """One scan: per-interval fixed-bin histograms, combined to the driver.

    Returns {interval_id: np.ndarray[bins] of counts}."""
    from ray.data.aggregate import Sum

    register_for_ray()
    ivs = [
        (iv["iid"], iv["root"], iv["chain"], iv["lo"], iv["hi"])
        for iv in intervals
    ]

    def kernel(b: pa.Table) -> pa.Table:
        v = b.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        out_iid: list[int] = []
        out_bin: list[int] = []
        out_cnt: list[int] = []
        for iid, root, chain, lo, hi in ivs:
            w = hi - lo
            if w <= 0:
                continue
            x = v[_member_mask(v, root, chain, bins)]
            if x.size == 0:
                continue
            idx = np.clip(((x - lo) / w * bins).astype(np.int64), 0, bins - 1)
            bc = np.bincount(idx, minlength=bins)
            nz = np.nonzero(bc)[0]
            out_iid += [iid] * len(nz)
            out_bin += nz.tolist()
            out_cnt += bc[nz].tolist()
        return pa.table(
            {
                "iid": pa.array(out_iid, pa.int64()),
                "bin": pa.array(out_bin, pa.int64()),
                "cnt": pa.array(out_cnt, pa.int64()),
            }
        )

    rows = (
        ds.map_batches(kernel, batch_format="pyarrow")
        .groupby(["iid", "bin"])
        .aggregate(Sum("cnt"))
        .take_all()
    )
    hists: dict[int, np.ndarray] = {
        iv["iid"]: np.zeros(bins, np.int64) for iv in intervals
    }
    for r in rows:
        hists[r["iid"]][r["bin"]] = r["sum(cnt)"]
    return hists


def _collect_pass(ds, col: str, intervals: list[dict], bins: int) -> dict:
    """Final scan: pull only the rows inside the (small) candidate intervals.

    Returns {interval_id: sorted np.ndarray of values}."""
    ivs = [(iv["iid"], iv["root"], iv["chain"]) for iv in intervals]

    def kernel(b: pa.Table) -> pa.Table:
        v = b.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        out_iid: list[int] = []
        out_val: list[float] = []
        for iid, root, chain in ivs:
            x = v[_member_mask(v, root, chain, bins)]
            out_iid += [iid] * x.size
            out_val += x.tolist()
        return pa.table(
            {
                "iid": pa.array(out_iid, pa.int64()),
                "val": pa.array(out_val, pa.float64()),
            }
        )

    rows = ds.map_batches(kernel, batch_format="pyarrow").take_all()
    out: dict[int, list[float]] = {iv["iid"]: [] for iv in intervals}
    for r in rows:
        out[r["iid"]].append(r["val"])
    return {k: np.sort(np.asarray(v, np.float64)) for k, v in out.items()}


def column_quantiles(
    ds,
    col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    *,
    bins: int = 4096,
    collect_cap: int = 200_000,
) -> dict[float, float]:
    """Exact interpolated quantiles of ``ds[col]`` (quantile_cont semantics).

    Returns {q: value}. NaNs are ignored; an all-NaN/empty column returns
    {q: None}."""
    register_for_ray()

    # NaN-aware (count, min, max): Arrow's Count/Min/Max treat NaN as a
    # value, but the narrowing kernels drop NaNs — the rank arithmetic must
    # use the same population. One scan, one tiny row per block.
    def stats_kernel(b: pa.Table) -> pa.Table:
        v = b.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        return pa.table(
            {
                "cnt": pa.array([v.size], pa.int64()),
                "mn": pa.array([float(v.min()) if v.size else None]),
                "mx": pa.array([float(v.max()) if v.size else None]),
            }
        )

    parts = ds.map_batches(stats_kernel, batch_format="pyarrow").take_all()
    n = sum(p["cnt"] for p in parts)
    if not n:
        return {q: None for q in qs}
    root = (
        min(p["mn"] for p in parts if p["mn"] is not None),
        max(p["mx"] for p in parts if p["mx"] is not None),
    )

    # ranks needed for interpolation: floor and ceil of (n-1)*q
    need: set[int] = set()
    for q in qs:
        r = (n - 1) * q
        need.add(int(np.floor(r)))
        need.add(int(np.ceil(r)))

    # state per needed rank k: its current interval (root + chain of bin
    # picks) and how many values of the whole column sort strictly before it
    state = {
        k: {"root": root, "chain": (), "lo": root[0], "hi": root[1],
            "offset": 0, "count": n}
        for k in need
    }
    resolved: dict[int, float] = {}

    for _ in range(_MAX_ROUNDS):
        active = {}
        for k, s in state.items():
            if k in resolved:
                continue
            if s["hi"] - s["lo"] <= 0:
                # all remaining candidates are identical values
                resolved[k] = s["lo"]
            elif s["count"] > collect_cap:
                active[k] = s
        if not active:
            break
        # dedup identical intervals so the scan computes each histogram once
        uniq: dict[tuple, dict] = {}
        for k, s in active.items():
            key = s["chain"]
            uniq.setdefault(
                key,
                {"iid": len(uniq), "root": s["root"], "chain": s["chain"],
                 "lo": s["lo"], "hi": s["hi"], "ranks": []},
            )["ranks"].append(k)
        hists = _histogram_pass(ds, col, list(uniq.values()), bins)
        for iv in uniq.values():
            h = hists[iv["iid"]]
            cum = np.cumsum(h)
            for k in iv["ranks"]:
                s = state[k]
                local = k - s["offset"]  # rank within this interval
                b = int(np.searchsorted(cum, local + 1))
                below = int(cum[b - 1]) if b else 0
                new_lo, new_hi = _child_bounds(iv, b, bins)
                state[k] = {
                    "root": s["root"],
                    "chain": s["chain"] + ((iv["lo"], iv["hi"], b),),
                    "lo": new_lo,
                    "hi": new_hi,
                    "offset": s["offset"] + below,
                    "count": int(h[b]),
                }

    # collect the remaining (small) intervals and do the exact rank lookup
    pending = [k for k in state if k not in resolved]
    if pending:
        uniq = {}
        for k in pending:
            s = state[k]
            uniq.setdefault(
                s["chain"],
                {"iid": len(uniq), "root": s["root"], "chain": s["chain"],
                 "ranks": []},
            )["ranks"].append(k)
        vals = _collect_pass(ds, col, list(uniq.values()), bins)
        for iv in uniq.values():
            arr = vals[iv["iid"]]
            for k in iv["ranks"]:
                resolved[k] = float(arr[k - state[k]["offset"]])

    out: dict[float, float] = {}
    for q in qs:
        r = (n - 1) * q
        k0, k1 = int(np.floor(r)), int(np.ceil(r))
        frac = r - k0
        v0, v1 = resolved[k0], resolved[k1]
        out[q] = v0 if frac == 0 else v0 + frac * (v1 - v0)
    return out
