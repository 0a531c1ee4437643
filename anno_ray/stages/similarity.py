"""Similarity search over embedding columns (list<float>).

- ``cosine_topk``: brute-force exact top-k against a broadcast query matrix —
  one numpy matmul per batch (the baseline; exact).
- ``lsh_cosine_topk``: random-hyperplane LSH bucketing — the scale path:
  only vectors sharing a bucket with a query are scored.
- ``embedding_near_dup_pairs``: near-duplicate detection over the corpus
  itself via LSH buckets + per-bucket cosine verification.

All kernels are vectorized; query matrices are shipped once via ``ray.put``
and loaded per actor in ``__init__`` (broadcast join pattern).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..ray_utils import register_for_ray


def _to_matrix(col) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float32)
    n = len(arr)
    if n == 0:
        return np.zeros((0, 0), dtype=np.float32)
    dim = len(flat) // n
    return flat.reshape(n, dim)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class CosineTopK:
    """Actor-pool kernel: per-batch matmul against the broadcast queries."""

    def __init__(self, query_ref, k: int, id_col: str, vec_col: str):
        import ray

        queries = ray.get(query_ref) if not isinstance(query_ref, tuple) else query_ref
        self.query_ids, qm = queries
        self.qm = _normalize(np.asarray(qm, dtype=np.float32))  # (q, d)
        self.qm64 = self.qm.astype(np.float64)
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        m = _normalize(_to_matrix(batch.column(self.vec_col)))  # (n, d)
        if m.shape[0] == 0:
            return pa.table(
                {"query_id": pa.array([], pa.int64()),
                 "neighbor_id": pa.array([], pa.int64()),
                 "cosine": pa.array([], pa.float64())}
            )
        # f32 BLAS matmul is used for candidate SELECTION only: its summation
        # order depends on the block shape (kernel tiling), so the same pair
        # can score 0.202356 in one layout and 0.202357 in another — enough to
        # flip round(cos, 6) and break run-to-run hash stability across
        # num_cpus. The emitted score is recomputed below as a float64
        # per-pair product-sum over the fixed embedding dim, which is
        # layout-invariant (each pair's reduction order depends only on d).
        sims = self.qm @ m.T  # (q, n)
        n = m.shape[0]
        # select a small margin past k so a BLAS ulp at the selection
        # boundary cannot exclude a true top-k candidate
        kk = min(self.k + 8, n)
        m64 = m.astype(np.float64)
        q_out, n_out, s_out = [], [], []
        for qi in range(sims.shape[0]):
            idx = (
                np.argpartition(-sims[qi], kk - 1)[:kk] if kk < n else np.arange(n)
            )
            exact = np.sum(m64[idx] * self.qm64[qi], axis=1)
            q_out.extend([self.query_ids[qi]] * len(idx))
            n_out.extend(ids[idx].tolist())
            s_out.extend(exact.tolist())
        return pa.table(
            {
                "query_id": pa.array(q_out, pa.int64()),
                "neighbor_id": pa.array(n_out, pa.int64()),
                "cosine": pa.array(s_out, pa.float64()),
            }
        )


def cosine_topk(
    ds,
    query_ids: list[int],
    query_matrix,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
):
    """Exact top-k neighbors for each query vector. Two-phase: per-block
    partial top-k inside the actor pool, then a final combine of the (tiny)
    candidate set on the driver."""
    import ray

    register_for_ray()
    qm = np.asarray(query_matrix, dtype=np.float32)
    if qm.nbytes <= 4 << 20:
        # tiny query matrix: ship it in the task closure — a task pool has
        # no actor spin-up latency, and "broadcast via ray.put + actor
        # __init__" only pays off when the shared side is big
        kern = CosineTopK((list(query_ids), qm), k, id_col, vec_col)
        partial = ds.map_batches(kern, batch_format="pyarrow")
    else:
        ref = ray.put((list(query_ids), qm))
        partial = ds.map_batches(
            CosineTopK,
            fn_constructor_args=(ref, k, id_col, vec_col),
            batch_format="pyarrow",
            concurrency=(1, 8),
        )
    # distributed tree-reduce combine: per-block partial top-k tables are
    # merged in Ray tasks, fan-in _COMBINE_FANIN, until one table remains.
    # The driver only ever holds object refs and the final q x k rows —
    # never the blocks x q x k candidate set (which at 10^5 blocks with
    # 1k queries would be a driver sink).
    refs = partial.to_arrow_refs()
    merge = ray.remote(_merge_topk_partials)
    while len(refs) > 1:
        refs = [
            merge.remote(k, exclude_self, *refs[i : i + _COMBINE_FANIN])
            for i in range(0, len(refs), _COMBINE_FANIN)
        ]
    top = (
        _merge_topk_partials(k, exclude_self)
        if not refs
        else ray.get(merge.remote(k, exclude_self, refs[0]))
    )
    # finalize: q x k rows — attach ranks (already sorted by query, then
    # by (-cosine, neighbor_id) inside each query)
    q = top.column("query_id").to_numpy(zero_copy_only=False)
    if len(q) == 0:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
    starts = np.r_[0, np.flatnonzero(q[1:] != q[:-1]) + 1]
    lens = np.diff(np.r_[starts, len(q)])
    ranks = np.arange(len(q)) - np.repeat(starts, lens) + 1
    return pa.table(
        {
            "query_id": top.column("query_id"),
            "rank": pa.array(ranks, pa.int64()),
            "neighbor_id": top.column("neighbor_id"),
            "cosine": pa.array(
                np.round(top.column("cosine").to_numpy(zero_copy_only=False), 6),
                pa.float64(),
            ),
        }
    )


_COMBINE_FANIN = 32


def _merge_topk_partials(k: int, exclude_self: bool, *tables: pa.Table) -> pa.Table:
    """Merge partial top-k tables -> top-k rows per query_id (vectorized).

    Deterministic order inside each query: higher cosine first (rounded to
    6 places for tie-stability, matching the scoring contract), then
    smaller neighbor_id. Runs inside Ray tasks as the tree-reduce combine
    for ``cosine_topk``."""
    tabs = [t for t in tables if t is not None and t.num_rows]
    if not tabs:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
    tbl = pa.concat_tables(tabs, promote_options="permissive").combine_chunks()
    q = tbl.column("query_id").to_numpy(zero_copy_only=False)
    n = tbl.column("neighbor_id").to_numpy(zero_copy_only=False)
    s = tbl.column("cosine").to_numpy(zero_copy_only=False)
    if exclude_self:
        keep = q != n
        q, n, s = q[keep], n[keep], s[keep]
    if len(q) == 0:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
    order = np.lexsort((n, -np.round(s, 6), q))
    q, n, s = q[order], n[order], s[order]
    starts = np.r_[0, np.flatnonzero(q[1:] != q[:-1]) + 1]
    lens = np.diff(np.r_[starts, len(q)])
    pos = np.arange(len(q)) - np.repeat(starts, lens)
    keep = pos < k
    return pa.table(
        {
            "query_id": pa.array(q[keep], pa.int64()),
            "neighbor_id": pa.array(n[keep], pa.int64()),
            "cosine": pa.array(s[keep], pa.float64()),
        }
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).astype(np.float32)


def lsh_cosine_topk(
    ds,
    query_ids: list[int],
    query_matrix,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
):
    """Approximate top-k: random-hyperplane buckets; only bucket-sharing
    vectors are scored. ~(2^n_planes / n_tables)x less compute at high
    recall for clustered data."""
    import ray

    register_for_ray()
    qm = np.asarray(query_matrix, dtype=np.float32)
    dim = qm.shape[1]
    planes = [_hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)]
    q_sigs = [
        (np.sign(qm @ p.T) > 0).astype(np.uint8) for p in planes
    ]  # n_tables x (q, planes)
    # query bucket sets per table
    q_buckets = []
    for t in range(n_tables):
        packed = np.packbits(q_sigs[t], axis=1)[:, 0]
        q_buckets.append({int(b) for b in packed})
    # planes + query-bucket sets are a few KB: ship them in the task
    # closure (no actor pool spin-up for a tiny shared side)
    def bucket_filter(b: pa.Table) -> pa.Table:
        m = _to_matrix(b.column(vec_col))
        if m.shape[0] == 0:
            return b.slice(0, 0)
        keep = np.zeros(m.shape[0], dtype=bool)
        for t, p in enumerate(planes):
            sig = (np.sign(m @ p.T) > 0).astype(np.uint8)
            packed = np.packbits(sig, axis=1)[:, 0]
            keep |= np.isin(packed, list(q_buckets[t]))
        return b.filter(pa.array(keep))

    candidates = ds.map_batches(bucket_filter, batch_format="pyarrow")
    return cosine_topk(
        candidates, query_ids, qm, k=k, id_col=id_col, vec_col=vec_col
    )


def _kmeans_cosine(sample: np.ndarray, n_clusters: int, n_iter: int = 12) -> np.ndarray:
    """Deterministic spherical k-means (Lloyd) over L2-normalized vectors:
    init = evenly spaced rows of the (caller-sorted) sample, assignment by
    max dot product, centroids re-normalized each round. No RNG — same
    input, same centroids, every run."""
    sample = _normalize(sample.astype(np.float32))
    n = sample.shape[0]
    n_clusters = min(n_clusters, n)
    idx = np.linspace(0, n - 1, n_clusters).astype(np.int64)
    centroids = sample[idx].copy()
    for _ in range(n_iter):
        assign = np.argmax(sample @ centroids.T, axis=1)
        for c in range(n_clusters):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _normalize(centroids)
    return centroids


def ivf_cosine_topk(
    ds,
    query_ids: list[int],
    query_matrix,
    *,
    k: int = 5,
    n_clusters: int = 64,
    n_probe: int = 8,
    sample_size: int = 10_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """IVF (inverted-file) approximate top-k — the data-adaptive scale path
    next to the hyperplane-LSH variant.

    1. a deterministic corpus sample (``vec_id % rate == 0``) trains a
       spherical k-means coarse quantizer on the driver (sample x dim only);
    2. queries probe their ``n_probe`` nearest cells;
    3. one map_batches pass assigns each corpus vector to its cell
       (vectorized argmax against the broadcast centroid matrix) and keeps
       only vectors in probed cells;
    4. exact ``cosine_topk`` runs over the surviving candidates.

    At 10^9 vectors the full matmul scans ~n_probe/n_clusters of the corpus;
    centroids are a few KB and ride task closures. Fully deterministic.
    """
    import ray

    register_for_ray()
    qm = _normalize(np.asarray(query_matrix, dtype=np.float32))

    # deterministic bounded sample for training (never the whole corpus)
    n_total = ds.count()
    rate = max(1, n_total // sample_size)

    def _sample(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (ids % rate) == 0
        return b.filter(pa.array(keep))

    sampled = []
    for ref in ds.map_batches(_sample, batch_format="pyarrow").to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows:
            sampled.append(t)
    sample_tbl = pa.concat_tables(sampled, promote_options="permissive")
    order = pa.compute.sort_indices(sample_tbl, sort_keys=[(id_col, "ascending")])
    sample_m = _to_matrix(sample_tbl.take(order).column(vec_col))
    centroids = _kmeans_cosine(sample_m, n_clusters)

    probe = np.argsort(-(qm @ centroids.T), axis=1)[:, : min(n_probe, centroids.shape[0])]
    probed = np.zeros(centroids.shape[0], dtype=bool)
    probed[np.unique(probe)] = True

    def cell_filter(b: pa.Table) -> pa.Table:
        m = _normalize(_to_matrix(b.column(vec_col)))
        if m.shape[0] == 0:
            return b.slice(0, 0)
        cells = np.argmax(m @ centroids.T, axis=1)
        return b.filter(pa.array(probed[cells]))

    candidates = ds.map_batches(cell_filter, batch_format="pyarrow")
    return cosine_topk(
        candidates, query_ids, qm, k=k, id_col=id_col, vec_col=vec_col
    )


# candidate-doc count above which near-dup verification switches from a
# broadcast vec dict to partitioned hash joins: at 768-d float32 a vec is
# ~3 KB, so 100k docs = ~300 MB per worker-cached dict — past that the
# vectors must be attached by joins, never broadcast
_VEC_BROADCAST_MAX = 100_000

# per-worker cache of the broadcast normalized-vec dict (the _SIG_DICT_CACHE
# idiom from stages/dedup.py: ray.get of a plain dict deserializes per call)
_VEC_DICT_CACHE: dict[str, dict] = {}


def _cached_vec_dict(vec_ref) -> dict:
    import ray

    key = vec_ref.hex()
    hit = _VEC_DICT_CACHE.get(key)
    if hit is None:
        raw = ray.get(vec_ref)
        hit = {k: np.frombuffer(v, dtype=np.float32) for k, v in raw.items()}
        _VEC_DICT_CACHE.clear()  # only ever one live broadcast per worker
        _VEC_DICT_CACHE[key] = hit
    return hit


def _lsh_bucket_runs(group: pa.Table):
    """Per-(table, bucket) member index arrays inside one coarse partition:
    lexsort + run detection, no per-bucket Ray task (the repo's coarse-hash
    idiom — a groupby over millions of tiny buckets pays seconds of
    per-group overhead)."""
    tables = group.column("table_id").to_numpy(zero_copy_only=False).astype(np.int64)
    buckets = group.column("bucket").to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(tables)
    if n < 2:
        return
    order = np.lexsort((buckets, tables))
    st, sb = tables[order], buckets[order]
    starts = np.flatnonzero(np.r_[True, (st[1:] != st[:-1]) | (sb[1:] != sb[:-1])])
    ends = np.r_[starts[1:], n]
    for s, e in zip(starts, ends):
        if e - s >= 2:
            yield order[s:e]


def embedding_near_dup_pairs(
    ds,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 10,
    n_tables: int = 6,
    seed: int = 42,
    max_bucket: int = 1024,
    num_partitions: int = 256,
    max_broadcast_docs: int = _VEC_BROADCAST_MAX,
):
    """Corpus self-join near-dup via LSH buckets + cosine verification.

    The bucket shuffle moves (part, id, table_id, bucket) ONLY — vector
    payloads cross the shuffle ZERO times (they previously rode it
    ~3 KB/row x n_tables). Below ``max_broadcast_docs`` the normalized
    vectors are broadcast once (ray.put, per-worker cached) and buckets
    verify against the cached matrix; above, candidate pairs are deduped
    ids-only and the two vectors are attached by narrow partitioned hash
    joins — the stages/dedup.py minhash two-path pattern."""
    import ray

    register_for_ray()

    def norm_vec_rows(b: pa.Table) -> pa.Table:
        m = _to_matrix(b.column(vec_col))
        if m.shape[0] == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()), "vec": pa.array([], pa.binary())}
            )
        mn = _normalize(m)
        return pa.table(
            {
                id_col: b.column(id_col),
                "vec": pa.array([mn[i].tobytes() for i in range(m.shape[0])], pa.binary()),
            }
        )

    vecs_ds = ds.map_batches(norm_vec_rows, batch_format="pyarrow").materialize()
    n_docs = vecs_ds.count()

    def band_rows(b: pa.Table) -> pa.Table:
        m = _to_matrix(b.column(vec_col))
        ids = b.column(id_col).to_pylist()
        if m.shape[0] == 0:
            return pa.table(
                {"part": pa.array([], pa.int32()),
                 id_col: pa.array([], pa.int64()),
                 "table_id": pa.array([], pa.int32()),
                 "bucket": pa.array([], pa.int64())}
            )
        dim = m.shape[1]
        out_id, out_t, out_b = [], [], []
        for t in range(n_tables):
            p = _hyperplanes(dim, n_planes, seed + t)
            sig = (np.sign(m @ p.T) > 0).astype(np.uint8)
            packed = np.packbits(sig, axis=1)
            buckets = packed[:, 0].astype(np.int64)
            if n_planes > 8:
                buckets = buckets * 256 + packed[:, 1].astype(np.int64)
            out_id.extend(ids)
            out_t.extend([t] * len(ids))
            out_b.extend(int(x) for x in buckets)
        barr = np.asarray(out_b, dtype=np.int64)
        tarr = np.asarray(out_t, dtype=np.int64)
        part = ((barr * np.int64(2654435761) + tarr) % num_partitions).astype(np.int32)
        return pa.table(
            {
                "part": pa.array(part, pa.int32()),
                id_col: pa.array(out_id, pa.int64()),
                "table_id": pa.array(tarr.astype(np.int32), pa.int32()),
                "bucket": pa.array(barr, pa.int64()),
            }
        )

    rows = ds.map_batches(band_rows, batch_format="pyarrow")
    from .dedup import distinct_pairs

    if n_docs <= max_broadcast_docs:
        vec_ref = ray.put(
            {
                i: v
                for t in (ray.get(r) for r in vecs_ds.to_arrow_refs())
                for i, v in zip(t.column(id_col).to_pylist(), t.column("vec").to_pylist())
            }
        )

        def partition_pairs_verified(group: pa.Table) -> pa.Table:
            vecs = _cached_vec_dict(vec_ref)
            all_ids = group.column(id_col).to_pylist()
            a_out, b_out, s_out = [], [], []
            for members in _lsh_bucket_runs(group):
                ids = [all_ids[i] for i in members]
                n = len(ids)
                if n > max_bucket:
                    ids = sorted(ids)[:max_bucket]
                    n = max_bucket
                mat = np.stack([vecs[i] for i in ids])
                sims = mat @ mat.T
                ii, jj = np.triu_indices(n, k=1)
                hits = sims[ii, jj] >= threshold
                for i, j, s in zip(ii[hits], jj[hits], sims[ii, jj][hits]):
                    if ids[i] == ids[j]:
                        continue
                    lo, hi = sorted((ids[i], ids[j]))
                    a_out.append(lo)
                    b_out.append(hi)
                    s_out.append(round(float(s), 6))
            return pa.table(
                {
                    "id_a": pa.array(a_out, pa.int64()),
                    "id_b": pa.array(b_out, pa.int64()),
                    "cosine": pa.array(s_out, pa.float64()),
                }
            )

        pairs = rows.groupby("part").map_groups(
            partition_pairs_verified, batch_format="pyarrow"
        )
        # cosine is a pure function of the two vectors: cross-table
        # duplicates carry identical scores -> dedup = distributed DISTINCT
        return distinct_pairs(pairs, ["cosine"])

    # scale path: ids-only candidate pairs -> DISTINCT -> vecs via joins
    def partition_pairs(group: pa.Table) -> pa.Table:
        all_ids = group.column(id_col).to_pylist()
        a_out, b_out = [], []
        for members in _lsh_bucket_runs(group):
            ids = [all_ids[i] for i in members]
            n = len(ids)
            if n > max_bucket:
                ids = sorted(ids)[:max_bucket]
                n = max_bucket
            for i in range(n):
                for j in range(i + 1, n):
                    if ids[i] == ids[j]:
                        continue
                    lo, hi = sorted((ids[i], ids[j]))
                    a_out.append(lo)
                    b_out.append(hi)
        return pa.table(
            {"id_a": pa.array(a_out, pa.int64()), "id_b": pa.array(b_out, pa.int64())}
        )

    cand = rows.groupby("part").map_groups(partition_pairs, batch_format="pyarrow")
    uniq = distinct_pairs(cand, [])
    njoin = min(64, max(2, n_docs // 500_000 + 2))
    vec_a = vecs_ds.map_batches(
        lambda b: pa.table({"ja": b.column(id_col), "vec_a": b.column("vec")}),
        batch_format="pyarrow",
    )
    vec_b = vecs_ds.map_batches(
        lambda b: pa.table({"jb": b.column(id_col), "vec_b": b.column("vec")}),
        batch_format="pyarrow",
    )
    joined = uniq.join(
        vec_a, join_type="inner", num_partitions=njoin,
        on=("id_a",), right_on=("ja",),
    ).join(
        vec_b, join_type="inner", num_partitions=njoin,
        on=("id_b",), right_on=("jb",),
    )

    def _score(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"id_a": pa.array([], pa.int64()),
                 "id_b": pa.array([], pa.int64()),
                 "cosine": pa.array([], pa.float64())}
            )
        va = np.stack([np.frombuffer(v, np.float32) for v in b.column("vec_a").to_pylist()])
        vb = np.stack([np.frombuffer(v, np.float32) for v in b.column("vec_b").to_pylist()])
        sims = np.einsum("ij,ij->i", va, vb)
        keep = sims >= threshold  # filter on RAW sims (broadcast-path parity)
        kept = b.select(["id_a", "id_b"]).filter(pa.array(keep))
        return kept.append_column(
            "cosine",
            pa.array([round(float(s), 6) for s in sims[keep]], pa.float64()),
        )

    return joined.map_batches(_score, batch_format="pyarrow")
