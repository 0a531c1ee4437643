"""Unit tests for the vectorized broadcast-join helper and the typed-empty
result contract of the embedding near-dup query."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def test_broadcast_lookup_hits_misses(ray_session):
    from anno_ray.functions.relational import _broadcast_lookup

    lookup = _broadcast_lookup({10: "a", 3: "b", 77: "c"})
    hit, vals = lookup(np.array([3, 4, 77, 10, -1], dtype=np.int64))
    assert hit.tolist() == [True, False, True, True, False]
    assert vals.tolist() == ["b", "", "c", "a", ""]


def test_broadcast_lookup_empty_map(ray_session):
    from anno_ray.functions.relational import _broadcast_lookup

    lookup = _broadcast_lookup({})
    hit, vals = lookup(np.array([1, 2], dtype=np.int64))
    assert hit.tolist() == [False, False]
    assert vals.tolist() == ["", ""]


def test_broadcast_lookup_inside_map_batches(ray_session):
    """The closure must survive by-value pickling into Ray task workers."""
    import ray.data

    from anno_ray.functions.relational import _broadcast_lookup

    lookup = _broadcast_lookup({i: f"v{i}" for i in range(0, 100, 2)})

    def attach(b: pa.Table) -> pa.Table:
        keys = b.column("k").to_numpy(zero_copy_only=False)
        _, vals = lookup(keys)
        return b.append_column("v", pa.array(vals, pa.string()))

    ds = ray.data.from_arrow(pa.table({"k": pa.array(range(10), pa.int64())}))
    out = ds.map_batches(attach, batch_format="pyarrow").to_pandas()
    assert out["v"].tolist() == [
        "v0", "", "v2", "", "v4", "", "v6", "", "v8", "",
    ]


def test_embedding_near_dups_empty_keeps_schema(ray_session, tmp_path):
    """An all-negative corpus must still return the typed pair table
    (Ray empty pipelines drop schema; the query boundary restores it)."""
    import pyarrow.parquet as pq

    from anno_ray.functions.docqueries import embedding_near_dups

    rng = np.random.default_rng(7)
    # orthogonal-ish random vectors: no pair close to cosine 0.9
    vecs = rng.normal(size=(40, 16)).astype(np.float64)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(40), pa.int64()),
            "embedding": pa.array([list(v) for v in vecs], pa.list_(pa.float64())),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    out = embedding_near_dups(str(tmp_path))
    assert out.num_rows == 0
    assert out.schema == pa.schema(
        [("id_a", pa.int64()), ("id_b", pa.int64()), ("cosine", pa.float64())]
    )
