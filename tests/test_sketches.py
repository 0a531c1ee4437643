"""HyperLogLog sketch (stages/sketches.py): accuracy vs exact distinct,
merge/partition invariance, NUL-safe hashing, determinism."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

P = 14
BOUND = 3 * 1.04 / np.sqrt(1 << P)  # 3 sigma of the standard HLL error


def _ds(values, parts=8):
    import ray

    ds = ray.data.from_arrow(pa.table({"id": values}))
    return ds.repartition(parts) if parts else ds


def test_hll_accuracy_across_cardinalities(ray_session):
    from anno_ray.stages.sketches import hll_count_distinct

    for true_n in (50, 1_000, 30_000, 300_000):
        vals = [f"doc-{i}" for i in range(true_n)] * 2
        est = hll_count_distinct(_ds(vals), "id", p=P)
        assert abs(est - true_n) / true_n < max(BOUND, 0.02), (true_n, est)


def test_hll_partition_invariant(ray_session):
    """Register merge is max: the estimate must not depend on block layout."""
    from anno_ray.stages.sketches import hll_count_distinct

    vals = [f"u{i % 5_000}" for i in range(20_000)]
    est1 = hll_count_distinct(_ds(vals, parts=1), "id", p=P)
    est16 = hll_count_distinct(_ds(vals, parts=16), "id", p=P)
    assert est1 == est16


def test_hll_nul_safe_ids(ray_session):
    """Ids differing only after an embedded NUL must count as distinct
    (pd.util.hash_array truncates object strings at NUL without escaping)."""
    from anno_ray.stages.sketches import hll_count_distinct

    vals = [f"type\x00surface-{i}" for i in range(2_000)]
    est = hll_count_distinct(_ds(vals), "id", p=P)
    assert abs(est - 2_000) / 2_000 < max(BOUND, 0.02), est


def test_hll_multi_column_and_ints(ray_session):
    import ray

    from anno_ray.stages.sketches import hll_count_distinct

    t = pa.table(
        {
            "a": pa.array([i % 100 for i in range(10_000)], pa.int64()),
            "b": pa.array([i % 7 for i in range(10_000)], pa.int64()),
        }
    )
    est = hll_count_distinct(ray.data.from_arrow(t), ("a", "b"), p=P)
    assert abs(est - 700) / 700 < max(BOUND, 0.02), est


def test_hll_registers_match_bit_exact_reference():
    """Vectorized register computation vs a pure-Python bit_length oracle."""
    from anno_ray.stages.sketches import _registers_from_hashes

    rng = np.random.RandomState(7)
    h = rng.randint(0, 2**63, 5_000, dtype=np.int64).astype(np.uint64)
    h = h * np.uint64(2) + (rng.rand(5_000) > 0.5).astype(np.uint64)
    for p in (4, 10, 14):
        regs = _registers_from_hashes(h, p)
        ref = np.zeros(1 << p, np.uint8)
        for x in h.tolist():
            idx = x >> (64 - p)
            rest = ((x << p) & (2**64 - 1)) | (1 << (p - 1))
            rho = 64 - rest.bit_length() + 1
            ref[idx] = max(ref[idx], rho)
        assert np.array_equal(regs, ref), p


def test_hll_empty(ray_session):
    from anno_ray.stages.sketches import hll_count_distinct

    est = hll_count_distinct(_ds(pa.array([], pa.string()), parts=0), "id")
    assert est == 0.0


def test_top_words_sketch_matches_exact(ray_session):
    """Certified sketch path and exact path agree; a degenerate block_k that
    can't certify falls back and still agrees."""
    from anno_ray.functions.docqueries import top_words, top_words_sketch

    sf = "/root/testdata/sf0.001"
    exact = top_words(sf).to_pandas().reset_index(drop=True)
    sketch = top_words_sketch(sf).to_pandas().reset_index(drop=True)
    assert sketch.equals(exact)
    # block_k=1 drops nearly everything: bound blows up -> exact fallback
    fallback = top_words_sketch(sf, block_k=1, slack=2)
    fallback = fallback.to_pandas().reset_index(drop=True)
    assert fallback.equals(exact)
