"""Distributed cardinality sketch: HyperLogLog over a Dataset column.

The combiner-friendliest operator there is: every block collapses to one
fixed 2^p-byte register array inside ``map_batches``; merging is an
element-wise max, so the driver receives one small array per block and the
shuffle moves nothing else. At 100 TB the sketch cost is (blocks x 2^p)
bytes regardless of row count — this is how a pipeline answers "how many
distinct documents/urls/ngrams" without the exact-distinct shuffle.

Standard HLL (Flajolet et al.) with the small/large-range corrections.
Hashing is ``pd.util.hash_array`` over a NUL-escaped string join — the same
deterministic, process-stable (PYTHONHASHSEED-independent) vectorized hash
the components/dedup stages use; the NUL escape matters because
``hash_array`` truncates object strings at embedded NULs (see
components.multiset_signature).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..ray_utils import register_for_ray


def _hash_column(tbl: pa.Table, cols: tuple[str, ...]) -> np.ndarray:
    """Deterministic 64-bit hashes of the NUL-escaped joined columns."""
    import pandas as pd

    parts = [
        pc.fill_null(pc.cast(tbl.column(c), pa.string()), "\x1f\x1f")
        for c in cols
    ]
    joined = parts[0] if len(parts) == 1 else pc.binary_join_element_wise(
        *parts, "\x1e"
    )
    safe = pc.replace_substring(joined, "\x00", "\x1f")
    arr = np.asarray(safe.to_pandas(), dtype=object)
    return pd.util.hash_array(arr).astype(np.uint64)


def _registers_from_hashes(h: np.ndarray, p: int) -> np.ndarray:
    """HLL register array (2^p,) uint8 from 64-bit hashes: register index =
    top p bits, value = 1 + leading-zero count of the remaining 64-p bits."""
    m = 1 << p
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    # sentinel bit caps rho at 64-p+1 and keeps `rest` nonzero (the low p
    # positions vacated by the shift would otherwise read as phantom zeros)
    rest = (h << np.uint64(p)) | (np.uint64(1) << np.uint64(p - 1))
    # exact bit length via 32-bit halves: any uint32 is exact in float64,
    # so floor(log2(x)) + 1 is the true bit length (log2 is monotonic and
    # its rounding error can't cross an integer at 32-bit magnitudes)
    hi = (rest >> np.uint64(32)).astype(np.float64)
    lo = (rest & np.uint64(0xFFFFFFFF)).astype(np.float64)
    bl = np.where(
        hi > 0,
        33 + np.floor(np.log2(np.maximum(hi, 1.0))),
        1 + np.floor(np.log2(np.maximum(lo, 1.0))),
    ).astype(np.int64)
    rho = 64 - bl + 1  # 1 + leading zeros
    regs = np.zeros(m, np.uint8)
    np.maximum.at(regs, idx, rho.astype(np.uint8))
    return regs


def _estimate(regs: np.ndarray, p: int) -> float:
    m = float(1 << p)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            return m * np.log(m / zeros)  # small-range linear counting
    two64 = 2.0**64
    if est > two64 / 30.0:
        return -two64 * np.log(1.0 - est / two64)
    return est


def hll_count_distinct(ds, cols, *, p: int = 14) -> float:
    """Approximate COUNT(DISTINCT cols) with ~1.04/sqrt(2^p) relative error
    (~0.8% at the default p=14; 16 KiB of registers per block partial)."""
    register_for_ray()
    cols = (cols,) if isinstance(cols, str) else tuple(cols)

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            regs = np.zeros(1 << p, np.uint8)
        else:
            regs = _registers_from_hashes(_hash_column(b, cols), p)
        return pa.table({"regs": pa.array([regs], pa.list_(pa.uint8()))})

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    merged = np.zeros(1 << p, np.uint8)
    for row in parts:
        merged = np.maximum(merged, np.asarray(row["regs"], np.uint8))
    return float(_estimate(merged, p))
