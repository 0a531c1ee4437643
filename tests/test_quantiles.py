"""Distributed exact-quantile operator (stages/quantiles.py): differential
vs numpy's quantile_cont over adversarial distributions, with collect_cap
forced low so the histogram-narrowing rounds actually execute."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

QS = (0.01, 0.25, 0.5, 0.9, 0.99)


def _check(ray_session, values: np.ndarray, **kw):
    import ray

    from anno_ray.stages.quantiles import column_quantiles

    ds = ray.data.from_arrow(pa.table({"x": values})).repartition(8)
    got = column_quantiles(ds, "x", QS, **kw)
    exp = np.quantile(values, QS)
    for q, e in zip(QS, exp):
        assert got[q] == pytest.approx(e, abs=1e-9), (q, got[q], e)


def test_quantiles_normal_forced_narrowing(ray_session):
    v = np.random.RandomState(0).randn(50_000) * 100
    # bins=64 + cap=500 forces several narrowing rounds before the collect
    _check(ray_session, v, bins=64, collect_cap=500)


def test_quantiles_heavy_duplicates(ray_session):
    v = np.random.RandomState(1).randint(0, 50, 50_000).astype(np.float64)
    _check(ray_session, v, bins=64, collect_cap=500)


def test_quantiles_extreme_skew(ray_session):
    rng = np.random.RandomState(2)
    v = np.concatenate([np.zeros(49_000), rng.exponential(5, 1_000)])
    _check(ray_session, v, bins=64, collect_cap=500)


def test_quantiles_tiny_and_constant(ray_session):
    _check(ray_session, np.random.RandomState(3).randn(7))
    _check(ray_session, np.full(1_000, 3.14))


def test_quantiles_nan_and_empty(ray_session):
    import ray

    from anno_ray.stages.quantiles import column_quantiles

    v = np.array([1.0, np.nan, 3.0, np.nan, 2.0])
    ds = ray.data.from_arrow(pa.table({"x": v}))
    got = column_quantiles(ds, "x", (0.5,))
    assert got[0.5] == pytest.approx(2.0)

    empty = ray.data.from_arrow(pa.table({"x": pa.array([], pa.float64())}))
    assert column_quantiles(empty, "x", (0.5,)) == {0.5: None}
