"""Canonicalization: distributed cross-document entity clustering (D2+D3).

Reference semantics: tracks cluster when similarity >= threshold with an
entity-type gate, via union-find — ``Resolver::resolve_inter_doc_coref``
(/root/reference/coalesce/src/resolver.rs:56-217, Jaccard, threshold 0.7) and
``CDCRResolver::resolve`` (/root/reference/anno/src/eval/cdcr.rs:480-579,
string_similarity >= 0.5 with LSH blocking). Both modes supported.

Ray-Data-native design (NOT the reference's all-pairs O(n^2)):

1. **Exact pass** — mentions/tracks collapse to DISTINCT
   (type, norm_surface) keys via per-block pre-aggregation inside
   ``map_batches`` followed by a small groupby-sum. The pre-agg is the
   combiner that defuses head-entity skew: a surface appearing in 30% of all
   docs contributes ONE row per block to the shuffle, not one per mention.
2. **Fuzzy pass** — LSH minhash banding (5x3 over char 3-grams, per the
   reference's LSHBlocker) over the distinct surfaces only; band buckets are
   the shuffle key; per-bucket pairwise similarity (capped bucket size with
   overflow logging — the reference leaves buckets unbounded) yields an edge
   list MUCH smaller than the corpus.
3. **Merge** — union-find over the edge list produces connected components;
   cluster representative and canonical_id are the lexicographic-min member
   (deterministic under any merge order — a documented divergence from the
   reference's HashMap-order "first member" pick, resolver.rs:161-173;
   membership is identical).
4. **Map-back** — the surface->canonical mapping is broadcast via ``ray.put``
   and applied inside ``map_batches`` (broadcast hash join; no shuffle of the
   big table).

Scale path (the DEFAULT above ``pipelines.kg.DRIVER_SURFACE_MAX`` distinct
surfaces): ``fuzzy_edges`` switches to a coarse-hash-partitioned banded
groupby (one shuffle, vectorized bucket scoring per partition), the merge to
``build_canonical_map_distributed`` (min-label propagation + pointer
doubling over Ray joins; the surface table never touches the driver), and
the map-back to partitioned hash joins (pipelines/kg.py joined materialize).
Pair scoring prefers embedding cosine when both surfaces carry an
``embedding`` column (coalesce resolver semantics), with surface-similarity
fallback. Proven at 10M distinct surfaces: tools/bench_scale_canonical.py.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..core.minhash import batch_band_hashes, batch_signatures
from ..core.normalize import (
    embedding_similarity,
    jaccard_similarity,
    string_similarity,
)
from ..ray_utils import register_for_ray

MODE_CDCR = "cdcr"          # string_similarity >= 0.5 (eval/cdcr.rs defaults)
MODE_COALESCE = "coalesce"  # pure word-Jaccard >= 0.7 (coalesce/resolver.rs)

_TYPE_GROUPS = {
    "per": "PER", "person": "PER",
    "org": "ORG", "organization": "ORG",
    "loc": "LOC", "location": "LOC", "gpe": "LOC",
}


def type_group(label: str) -> str:
    return _TYPE_GROUPS.get(label.lower(), label.upper())


def _embeddings_of(tbl: pa.Table):
    """Optional per-surface embeddings (list<float> column named
    'embedding'); None when absent."""
    if "embedding" not in tbl.column_names:
        return None
    return tbl.column("embedding").to_pylist()


def _pair_scorer(surfaces, embs, mode: str):
    """Reference scoring preference (coalesce/src/resolver.rs:128-136): when
    BOTH sides carry an embedding, score by cosine normalized to [0,1]
    ((cos+1)/2, resolver.rs:280-296); otherwise fall back to the mode's
    surface similarity. Surface-LSH blocking still gates which pairs are
    scored — a documented difference from the reference's all-pairs loop."""
    string_sim = string_similarity if mode == MODE_CDCR else jaccard_similarity

    if embs is None:
        return lambda i, j: string_sim(surfaces[i], surfaces[j])

    def score(i: int, j: int) -> float:
        ea, eb = embs[i], embs[j]
        if ea is not None and eb is not None and len(ea) and len(eb):
            return embedding_similarity(ea, eb)
        return string_sim(surfaces[i], surfaces[j])

    return score


def canonical_hash(entity_type: str, norm_surface: str) -> int:
    """Deterministic 63-bit id from the cluster-representative key (replaces
    the reference's global ``next_identity_id`` counter, grounded.rs:2957)."""
    h = hashlib.blake2b(
        f"{entity_type}\x00{norm_surface}".encode("utf-8"), digest_size=8
    ).digest()
    return int.from_bytes(h, "big") >> 1


# --- 1. exact pass -----------------------------------------------------------

def _preagg_surfaces(batch: pa.Table, type_col: str, surface_col: str) -> pa.Table:
    """Per-block combiner: collapse rows to distinct (type, surface) + count."""
    types = batch.column(type_col).to_pylist()
    surfaces = batch.column(surface_col).to_pylist()
    counts: dict[tuple[str, str], int] = defaultdict(int)
    for t, s in zip(types, surfaces):
        if not s:
            continue
        counts[(type_group(t), s)] += 1
    keys = sorted(counts)
    return pa.table(
        {
            "entity_type": pa.array([k[0] for k in keys], pa.string()),
            "norm_surface": pa.array([k[1] for k in keys], pa.string()),
            "n_mentions": pa.array([counts[k] for k in keys], pa.int64()),
        }
    )


def surface_groups(
    ds,
    type_col: str = "entity_type",
    surface_col: str = "norm_surface",
):
    """Dataset of mention/track rows -> distinct surface Dataset
    (entity_type, norm_surface, n_mentions)."""
    register_for_ray()
    pre = ds.map_batches(
        lambda b: _preagg_surfaces(b, type_col, surface_col),
        batch_format="pyarrow",
    )
    return pre.groupby(["entity_type", "norm_surface"]).sum("n_mentions")


# --- 2. fuzzy pass -----------------------------------------------------------

def _band_rows(
    batch: pa.Table, num_bands: int, rows_per_band: int, num_partitions: int = 256
) -> pa.Table:
    """surfaces -> (part, band, band_hash, entity_type, norm_surface) rows.

    ``part = band_hash % num_partitions`` is the COARSE shuffle key: grouping
    by the raw (band, band_hash) would create millions of 1-2 row groups and
    per-group overhead would dominate; grouping by ``part`` co-locates all
    rows of a bucket while keeping the group count fixed, and the per-group
    kernel resolves the fine buckets vectorized."""
    surfaces = batch.column("norm_surface").to_pylist()
    types = batch.column("entity_type").to_pylist()
    sigs = batch_signatures(surfaces, num_bands, rows_per_band)
    bands = batch_band_hashes(sigs, num_bands, rows_per_band)
    n = len(surfaces)
    out_type: list[str] = []
    out_surface: list[str] = []
    out_band: list[int] = []
    out_hash: list[int] = []
    for b in range(num_bands):
        out_type.extend(types)
        out_surface.extend(surfaces)
        out_band.extend([b] * n)
        out_hash.extend(int(x) for x in bands[:, b])
    hash_arr = np.array(out_hash, dtype=np.uint64)
    cols = {
        "part": pa.array(
            (hash_arr % np.uint64(num_partitions)).astype(np.int64), pa.int64()
        ),
        "entity_type": pa.array(out_type, pa.string()),
        "norm_surface": pa.array(out_surface, pa.string()),
        "band": pa.array(out_band, pa.int32()),
        "band_hash": pa.array(hash_arr, pa.uint64()),
    }
    embs = _embeddings_of(batch)
    if embs is not None:
        cols["embedding"] = pa.array(embs * num_bands)
    return pa.table(cols)


def _bucket_edges(
    group: pa.Table,
    mode: str,
    threshold: float,
    require_type_match: bool,
    max_bucket: int,
) -> pa.Table:
    """Pairwise similarity inside one (band, band_hash) bucket -> edges."""
    types = group.column("entity_type").to_pylist()
    surfaces = group.column("norm_surface").to_pylist()
    embs = _embeddings_of(group)
    n = len(surfaces)
    ea, eb, et_a, et_b = [], [], [], []
    overflow = 0
    if n > max_bucket:
        # skew defense: deterministically keep the lexicographically first
        # max_bucket members; the exact pass already merged identical keys,
        # and hot buckets beyond the cap are overwhelmingly hash collisions.
        overflow = n - max_bucket
        order = sorted(range(n), key=lambda i: (surfaces[i], types[i]))[:max_bucket]
        types = [types[i] for i in order]
        surfaces = [surfaces[i] for i in order]
        if embs is not None:
            embs = [embs[i] for i in order]
        n = max_bucket
    sim = _pair_scorer(surfaces, embs, mode)
    for i in range(n):
        for j in range(i + 1, n):
            if require_type_match and types[i] != types[j]:
                continue
            if surfaces[i] == surfaces[j]:
                continue  # same surface, (possibly) different type: no edge
            if sim(i, j) >= threshold:
                ea.append(surfaces[i]); eb.append(surfaces[j])
                et_a.append(types[i]); et_b.append(types[j])
    if overflow:
        import logging

        logging.getLogger(__name__).warning(
            "LSH bucket overflow: %d surfaces dropped beyond cap %d",
            overflow, max_bucket,
        )
    return pa.table(
        {
            "type_a": pa.array(et_a, pa.string()),
            "surface_a": pa.array(ea, pa.string()),
            "type_b": pa.array(et_b, pa.string()),
            "surface_b": pa.array(eb, pa.string()),
        }
    )


def _edges_from_banded_partition(
    group: pa.Table,
    mode: str,
    threshold: float,
    require_type_match: bool,
    max_bucket: int,
) -> pa.Table:
    """One coarse hash partition of band rows -> edges.

    Finds the fine (band, band_hash) buckets with a numpy lexsort + run
    detection (no per-bucket task), then scores pairs inside each bucket with
    the SAME deterministic overflow selection as _bucket_edges. Duplicate
    edges across partitions/bands are tolerated (union-find and min-label
    propagation are idempotent); within the partition a seen-set dedups."""
    types = group.column("entity_type").to_pylist()
    surfaces = group.column("norm_surface").to_pylist()
    embs = _embeddings_of(group)
    bands = group.column("band").to_numpy(zero_copy_only=False).astype(np.int64)
    hashes = group.column("band_hash").to_numpy(zero_copy_only=False).astype(np.uint64)
    n = len(surfaces)
    if n < 2:
        return pa.table(
            {
                "type_a": pa.array([], pa.string()),
                "surface_a": pa.array([], pa.string()),
                "type_b": pa.array([], pa.string()),
                "surface_b": pa.array([], pa.string()),
            }
        )
    sim = _pair_scorer(surfaces, embs, mode)
    order = np.lexsort((hashes, bands))
    sb = bands[order]
    sh = hashes[order]
    starts = np.flatnonzero(np.r_[True, (sb[1:] != sb[:-1]) | (sh[1:] != sh[:-1])])
    ends = np.r_[starts[1:], n]
    seen: set[tuple[str, str, str, str]] = set()
    ea, eb, et_a, et_b = [], [], [], []
    overflow = 0
    for s, e in zip(starts, ends):
        if e - s < 2:
            continue
        members = order[s:e]
        if len(members) > max_bucket:
            overflow += len(members) - max_bucket
            members = sorted(
                members, key=lambda i: (surfaces[i], types[i])
            )[:max_bucket]
        for x in range(len(members)):
            i = members[x]
            for y in range(x + 1, len(members)):
                j = members[y]
                if require_type_match and types[i] != types[j]:
                    continue
                if surfaces[i] == surfaces[j]:
                    continue
                key = (types[i], surfaces[i], types[j], surfaces[j])
                if key in seen:
                    continue
                seen.add(key)
                if sim(i, j) >= threshold:
                    ea.append(surfaces[i]); eb.append(surfaces[j])
                    et_a.append(types[i]); et_b.append(types[j])
    if overflow:
        import logging

        logging.getLogger(__name__).warning(
            "LSH bucket overflow: %d surfaces dropped beyond cap %d",
            overflow, max_bucket,
        )
    return pa.table(
        {
            "type_a": pa.array(et_a, pa.string()),
            "surface_a": pa.array(ea, pa.string()),
            "type_b": pa.array(et_b, pa.string()),
            "surface_b": pa.array(eb, pa.string()),
        }
    )


def _edges_from_surface_table(
    tbl: pa.Table,
    mode: str,
    threshold: float,
    require_type_match: bool,
    num_bands: int,
    rows_per_band: int,
    max_bucket: int,
) -> pa.Table:
    """Vectorized single-task edge computation: band all surfaces, group
    buckets with one lexsort, score pairs inside each bucket. Avoids Ray's
    per-group task overhead, which dominates when buckets are tiny."""
    types = tbl.column("entity_type").to_pylist()
    surfaces = tbl.column("norm_surface").to_pylist()
    embs = _embeddings_of(tbl)
    sigs = batch_signatures(surfaces, num_bands, rows_per_band)
    bands = batch_band_hashes(sigs, num_bands, rows_per_band)  # (n, bands)
    n = len(surfaces)
    sim = _pair_scorer(surfaces, embs, mode)
    seen_pairs: set[tuple[int, int]] = set()
    ea, eb, et_a, et_b = [], [], [], []
    overflow = 0
    for band in range(num_bands):
        col = bands[:, band]
        order = np.argsort(col, kind="stable")
        sorted_vals = col[order]
        starts = np.flatnonzero(
            np.r_[True, sorted_vals[1:] != sorted_vals[:-1]]
        )
        ends = np.r_[starts[1:], len(sorted_vals)]
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            members = order[s:e]
            if len(members) > max_bucket:
                # same deterministic skew defense as the distributed path
                # (_bucket_edges): keep the lexicographically smallest
                # (surface, type) members, so single-task and distributed
                # modes produce identical edges on overflowing buckets.
                overflow += len(members) - max_bucket
                members = sorted(
                    members, key=lambda i: (surfaces[i], types[i])
                )[:max_bucket]
            for x in range(len(members)):
                i = members[x]
                for y in range(x + 1, len(members)):
                    j = members[y]
                    key = (i, j) if i < j else (j, i)
                    if key in seen_pairs:
                        continue
                    seen_pairs.add(key)
                    if require_type_match and types[i] != types[j]:
                        continue
                    if surfaces[i] == surfaces[j]:
                        continue
                    if sim(i, j) >= threshold:
                        ea.append(surfaces[i]); eb.append(surfaces[j])
                        et_a.append(types[i]); et_b.append(types[j])
    if overflow:
        import logging

        logging.getLogger(__name__).warning(
            "LSH bucket overflow: %d surfaces dropped beyond cap %d",
            overflow, max_bucket,
        )
    return pa.table(
        {
            "type_a": pa.array(et_a, pa.string()),
            "surface_a": pa.array(ea, pa.string()),
            "type_b": pa.array(et_b, pa.string()),
            "surface_b": pa.array(eb, pa.string()),
        }
    )


# surface count above which the sub-threshold "one vectorized task" edge
# pass fans out band- and bucket-chunk-parallel (identical output, pinned by
# tests): a single serial task just under ``max_task_surfaces`` would be a
# multi-minute one-core straggler while the cluster idles
_BAND_TASK_MIN = 150_000


def _edges_band_parallel(
    surf_tbl: pa.Table,
    mode: str,
    threshold: float,
    require_type_match: bool,
    num_bands: int,
    rows_per_band: int,
    max_bucket: int,
    *,
    n_chunks: int | None = None,
) -> pa.Table:
    """Task-parallel version of ``_edges_from_surface_table`` with
    byte-identical output: banding runs in row chunks, bucket scoring runs in
    (band, chunk-of-buckets) tasks, and the driver concatenates results in
    band/bucket order and dedups pairs across bands (within one band buckets
    partition the surfaces, so no intra-band duplicates exist — the only
    cross-task dedup needed is the cross-band one the single-task seen-set
    performed)."""
    import ray

    n = surf_tbl.num_rows
    if n_chunks is None:
        try:
            n_chunks = max(4, int(ray.cluster_resources().get("CPU", 8)) // num_bands)
        except Exception:
            n_chunks = 8
    ref = ray.put(surf_tbl)

    @ray.remote
    def _band_chunk(t, start: int, count: int):
        # ray auto-dereferences the ObjectRef arg: `t` IS the shared table
        sigs = batch_signatures(
            t.column("norm_surface").slice(start, count).to_pylist(),
            num_bands, rows_per_band,
        )
        return batch_band_hashes(sigs, num_bands, rows_per_band)

    step = max(20_000, n // (n_chunks * num_bands) + 1)
    bands = np.vstack(
        ray.get(
            [_band_chunk.remote(ref, s, min(step, n - s)) for s in range(0, n, step)]
        )
    )

    @ray.remote
    def _score_runs(t, flat, run_starts):
        types = t.column("entity_type").to_pylist()
        surfaces = t.column("norm_surface").to_pylist()
        embs = _embeddings_of(t)
        sim = _pair_scorer(surfaces, embs, mode)
        ea, eb, et_a, et_b = [], [], [], []
        overflow = 0
        bounds = list(run_starts) + [len(flat)]
        for r in range(len(run_starts)):
            members = flat[bounds[r]:bounds[r + 1]]
            if len(members) > max_bucket:
                overflow += len(members) - max_bucket
                members = sorted(
                    members, key=lambda i: (surfaces[i], types[i])
                )[:max_bucket]
            for x in range(len(members)):
                i = members[x]
                for y in range(x + 1, len(members)):
                    j = members[y]
                    if require_type_match and types[i] != types[j]:
                        continue
                    if surfaces[i] == surfaces[j]:
                        continue
                    if sim(i, j) >= threshold:
                        ea.append(surfaces[i]); eb.append(surfaces[j])
                        et_a.append(types[i]); et_b.append(types[j])
        if overflow:
            import logging

            logging.getLogger(__name__).warning(
                "LSH bucket overflow: %d surfaces dropped beyond cap %d",
                overflow, max_bucket,
            )
        return pa.table(
            {
                "type_a": pa.array(et_a, pa.string()),
                "surface_a": pa.array(ea, pa.string()),
                "type_b": pa.array(et_b, pa.string()),
                "surface_b": pa.array(eb, pa.string()),
            }
        )

    futs = []
    for band in range(num_bands):
        col = bands[:, band]
        order = np.argsort(col, kind="stable")
        sorted_vals = col[order]
        starts = np.flatnonzero(np.r_[True, sorted_vals[1:] != sorted_vals[:-1]])
        ends = np.r_[starts[1:], len(sorted_vals)]
        keep = (ends - starts) >= 2
        starts, ends = starts[keep], ends[keep]
        if not len(starts):
            continue
        # chunk the runs, balanced by pairwise cost, preserving run order
        costs = (ends - starts).astype(np.float64) ** 2
        cum = np.cumsum(costs)
        per = cum[-1] / n_chunks
        chunk_of_run = np.minimum((cum - 1e-9) // max(per, 1e-9), n_chunks - 1)
        for c in range(n_chunks):
            idx = np.flatnonzero(chunk_of_run == c)
            if not len(idx):
                continue
            flat = np.concatenate([order[starts[r]:ends[r]] for r in idx])
            run_starts = np.cumsum(
                np.r_[0, (ends[idx] - starts[idx])[:-1]]
            ).astype(np.int64)
            futs.append(_score_runs.remote(ref, flat, run_starts))

    parts = ray.get(futs)
    # cross-band dedup must be orientation-free: a pair emits as (A, B) in
    # one band's bucket and may emit as (B, A) in another's (member order is
    # per-bucket), exactly like the single-task unordered (i, j) seen-set
    seen: set[tuple] = set()
    keep_tables = []
    for t in parts:
        if not t.num_rows:
            continue
        mask = []
        for ta, sa, tb, sb in zip(
            t.column("type_a").to_pylist(), t.column("surface_a").to_pylist(),
            t.column("type_b").to_pylist(), t.column("surface_b").to_pylist(),
        ):
            key = ((ta, sa), (tb, sb)) if (sa, ta) <= (sb, tb) else ((tb, sb), (ta, sa))
            if key in seen:
                mask.append(False)
            else:
                seen.add(key)
                mask.append(True)
        keep_tables.append(t.filter(pa.array(mask, pa.bool_())))
    if not keep_tables:
        return pa.table(
            {
                "type_a": pa.array([], pa.string()),
                "surface_a": pa.array([], pa.string()),
                "type_b": pa.array([], pa.string()),
                "surface_b": pa.array([], pa.string()),
            }
        )
    return pa.concat_tables(keep_tables)


def fuzzy_edges(
    surfaces_ds,
    *,
    mode: str = MODE_CDCR,
    threshold: float | None = None,
    require_type_match: bool = True,
    num_bands: int = 5,
    rows_per_band: int = 3,
    max_bucket: int = 256,
    max_task_surfaces: int = 2_000_000,
    band_task_min: int = _BAND_TASK_MIN,
    n_surfaces: int | None = None,
):
    """Distinct surfaces -> similarity edges via LSH buckets.

    Distinct-surface tables up to ``band_task_min`` are scored in ONE
    vectorized Ray task (per-group task overhead would otherwise dominate:
    LSH buckets are tiny); between ``band_task_min`` and
    ``max_task_surfaces`` the same computation fans out band- and
    bucket-chunk-parallel with byte-identical output (no one-core straggler
    just under the dispatch point). Beyond that, the fully distributed
    band-groupby path takes over. Callers that already counted the input
    pass ``n_surfaces`` to skip a second scan.
    """
    import ray

    register_for_ray()
    if threshold is None:
        threshold = 0.5 if mode == MODE_CDCR else 0.7

    # decide the path WITHOUT collecting the table when the input is a large
    # Dataset: count() is a metadata/aggregate op, not a driver materialize
    if n_surfaces is None:
        if isinstance(surfaces_ds, pa.Table):
            n_surfaces = surfaces_ds.num_rows
        else:
            n_surfaces = surfaces_ds.count()

    if n_surfaces <= max_task_surfaces:
        surf_tbl = _to_table(
            surfaces_ds, ["entity_type", "norm_surface", "embedding"]
        )
        if n_surfaces > band_task_min:
            return _edges_band_parallel(
                surf_tbl, mode, threshold, require_type_match,
                num_bands, rows_per_band, max_bucket,
            )

        @ray.remote
        def _task(tbl):
            return _edges_from_surface_table(
                tbl, mode, threshold, require_type_match,
                num_bands, rows_per_band, max_bucket,
            )

        return ray.get(_task.remote(surf_tbl))
    surfaces_ds = _as_dataset(surfaces_ds)

    # coarse hash partitioning: ONE shuffle, fixed group count, buckets
    # resolved vectorized inside each group (see _band_rows docstring)
    coarse_parts = 256
    banded = surfaces_ds.map_batches(
        lambda b: _band_rows(b, num_bands, rows_per_band, coarse_parts),
        batch_format="pyarrow",
    )
    return banded.groupby("part").map_groups(
        lambda g: _edges_from_banded_partition(
            g, mode, threshold, require_type_match, max_bucket
        ),
        batch_format="pyarrow",
    )


def collect_surfaces(surfaces_ds) -> pa.Table:
    """Materialize the distinct-surface Dataset into one Arrow table."""
    return _to_table(surfaces_ds, ["entity_type", "norm_surface", "sum(n_mentions)"])


# --- 3. merge ----------------------------------------------------------------

def build_canonical_map(surfaces_ds, edges_ds) -> pa.Table:
    """Union-find over fuzzy edges -> mapping table
    (entity_type, norm_surface, canonical_id, canonical_name).

    Driver-side merge over the COMPACT edge list (<< corpus size); see module
    docstring for the swap-in path at extreme scale.
    """
    surf_tbl = _to_table(surfaces_ds, ["entity_type", "norm_surface"])
    types = surf_tbl.column("entity_type").to_pylist()
    surfaces = surf_tbl.column("norm_surface").to_pylist()
    keys = list(zip(types, surfaces))
    index = {k: i for i, k in enumerate(keys)}

    from ..core.unionfind import UnionFind

    uf = UnionFind(len(keys))
    edge_tbl = _to_table(edges_ds, ["type_a", "surface_a", "type_b", "surface_b"])
    for ta, sa, tb, sb in zip(
        edge_tbl.column("type_a").to_pylist(),
        edge_tbl.column("surface_a").to_pylist(),
        edge_tbl.column("type_b").to_pylist(),
        edge_tbl.column("surface_b").to_pylist(),
    ):
        ia = index.get((ta, sa))
        ib = index.get((tb, sb))
        if ia is not None and ib is not None:
            uf.union(ia, ib)

    # representative = lexicographic min (entity_type, norm_surface) member
    rep: dict[int, int] = {}
    for i in range(len(keys)):
        r = uf.find(i)
        if r not in rep or keys[i] < keys[rep[r]]:
            rep[r] = i

    canon_ids = []
    canon_names = []
    for i in range(len(keys)):
        r = uf.find(i)
        rk = keys[rep[r]]
        canon_ids.append(canonical_hash(rk[0], rk[1]))
        canon_names.append(rk[1])
    return pa.table(
        {
            "entity_type": pa.array(types, pa.string()),
            "norm_surface": pa.array(surfaces, pa.string()),
            "canonical_id": pa.array(canon_ids, pa.int64()),
            "canonical_name": pa.array(canon_names, pa.string()),
        }
    )


def _to_table(ds_or_table, columns: list[str]) -> pa.Table:
    if isinstance(ds_or_table, pa.Table):
        return ds_or_table.select([c for c in columns if c in ds_or_table.column_names])
    import ray.data

    if isinstance(ds_or_table, ray.data.Dataset):
        tables = []
        for ref in ds_or_table.to_arrow_refs():
            import ray

            t = ray.get(ref)
            if t.num_rows:
                tables.append(t.select([c for c in columns if c in t.column_names]))
        if not tables:
            return pa.table({c: pa.array([], pa.string()) for c in columns})
        return pa.concat_tables(tables, promote_options="permissive")
    raise TypeError(type(ds_or_table))


# --- 4. map-back (broadcast join) -------------------------------------------

class CanonicalMapper:
    """Stateful map_batches callable: builds the lookup dict ONCE per actor
    from the broadcast mapping (ray.put object ref), then annotates batches.

    The constructor takes the object ref so each actor pays deserialization
    once, not per batch — the broadcast-small-side join pattern (J1 analog).
    """

    def __init__(self, mapping_ref, type_col: str, surface_col: str):
        import ray

        mapping: pa.Table = ray.get(mapping_ref) if not isinstance(mapping_ref, pa.Table) else mapping_ref
        self.lookup: dict[tuple[str, str], tuple[int, str]] = {}
        for t, s, cid, cname in zip(
            mapping.column("entity_type").to_pylist(),
            mapping.column("norm_surface").to_pylist(),
            mapping.column("canonical_id").to_pylist(),
            mapping.column("canonical_name").to_pylist(),
        ):
            self.lookup[(t, s)] = (cid, cname)
        self.type_col = type_col
        self.surface_col = surface_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        types = batch.column(self.type_col).to_pylist()
        surfaces = batch.column(self.surface_col).to_pylist()
        cids = np.empty(len(types), dtype=np.int64)
        cnames: list[str] = []
        for k, (t, s) in enumerate(zip(types, surfaces)):
            hit = self.lookup.get((type_group(t), s))
            if hit is None:
                cids[k] = canonical_hash(type_group(t), s)
                cnames.append(s)
            else:
                cids[k] = hit[0]
                cnames.append(hit[1])
        batch = batch.append_column("canonical_id", pa.array(cids, pa.int64()))
        batch = batch.append_column("canonical_name", pa.array(cnames, pa.string()))
        return batch


def attach_canonical(
    ds,
    mapping: pa.Table,
    *,
    type_col: str = "label",
    surface_col: str = "norm_surface",
    concurrency: int | None = None,
):
    """Annotate a Dataset with canonical_id/name via broadcast lookup."""
    import ray

    register_for_ray()
    ref = ray.put(mapping)
    return ds.map_batches(
        CanonicalMapper,
        fn_constructor_args=(ref, type_col, surface_col),
        batch_format="pyarrow",
        concurrency=concurrency or (1, 8),
    )


# --- 3b. distributed merge (scale path) --------------------------------------

def _as_dataset(ds_or_table):
    import ray.data

    if isinstance(ds_or_table, pa.Table):
        return ray.data.from_arrow(ds_or_table)
    return ds_or_table


def build_canonical_map_distributed(
    surfaces,
    edges,
    *,
    max_iters: int = 24,
    num_partitions: int | None = None,
    as_dataset: bool = False,
):
    """Connected components via iterated min-label propagation + pointer
    doubling on Ray Data — the web-scale replacement for the driver-side
    union-find when the distinct-surface table no longer fits one process.

    Per round: label(k) <- min(label(k), min label over neighbors), then one
    pointer-jump label(k) <- label(label(k)). Converges in O(log diameter)
    rounds; each round is two hash joins + groupby-min over (k, label) pairs.
    Produces EXACTLY the same mapping as ``build_canonical_map``
    (representative = lexicographic-min member; verified in tests).

    Fully dataset-native: ``surfaces``/``edges`` may be Datasets and are never
    collected to the driver; with ``as_dataset=True`` the mapping comes back
    as a Dataset too, so driver RSS stays bounded regardless of the distinct
    surface count (the default pa.Table return is for sub-threshold callers
    and tests).
    """
    from .components import min_label_components

    register_for_ray()
    surfaces_ds = _as_dataset(surfaces)
    edges_ds = _as_dataset(edges)

    def _label_rows(b: pa.Table) -> pa.Table:
        ks = [
            f"{t}\x00{s}"
            for t, s in zip(
                b.column("entity_type").to_pylist(),
                b.column("norm_surface").to_pylist(),
            )
        ]
        arr = pa.array(ks, pa.string())
        return pa.table({"k": arr, "label": arr})

    labels = surfaces_ds.map_batches(_label_rows, batch_format="pyarrow")

    def _sym_rows(b: pa.Table) -> pa.Table:
        ka = [
            f"{t}\x00{s}"
            for t, s in zip(
                b.column("type_a").to_pylist(), b.column("surface_a").to_pylist()
            )
        ]
        kb = [
            f"{t}\x00{s}"
            for t, s in zip(
                b.column("type_b").to_pylist(), b.column("surface_b").to_pylist()
            )
        ]
        return pa.table(
            {
                "src": pa.array(ka + kb, pa.string()),
                "dst": pa.array(kb + ka, pa.string()),
            }
        )

    sym = edges_ds.map_batches(_sym_rows, batch_format="pyarrow")
    labels = min_label_components(
        labels, sym, max_iters=max_iters, num_partitions=num_partitions
    )

    def _mapping_rows(b: pa.Table) -> pa.Table:
        types_out, surfaces_out, cids, cnames = [], [], [], []
        for k, lab in zip(b.column("k").to_pylist(), b.column("label").to_pylist()):
            t, sfc = k.split("\x00", 1)
            rt, rs = (lab or k).split("\x00", 1)
            types_out.append(t)
            surfaces_out.append(sfc)
            cids.append(canonical_hash(rt, rs))
            cnames.append(rs)
        return pa.table(
            {
                "entity_type": pa.array(types_out, pa.string()),
                "norm_surface": pa.array(surfaces_out, pa.string()),
                "canonical_id": pa.array(cids, pa.int64()),
                "canonical_name": pa.array(cnames, pa.string()),
            }
        )

    mapping = labels.map_batches(_mapping_rows, batch_format="pyarrow")
    if as_dataset:
        return mapping
    return _to_table(
        mapping, ["entity_type", "norm_surface", "canonical_id", "canonical_name"]
    )
