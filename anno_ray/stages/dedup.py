"""Deduplication suite for large-scale training-data pipelines.

All operators are Ray-Data-native and shuffle-aware:

- ``exact_dedup``       — content-hash partition + per-group first (one
                          shuffle of (hash, id) pairs, not full rows);
- ``minhash_lsh_pairs`` — shingle -> minhash -> band -> bucket groupby ->
                          candidate pairs verified by signature similarity;
- ``minhash_dedup``     — connected components over verified pairs -> keep
                          min doc per cluster;
- ``simhash64``         — 64-bit simhash over token hashes; near-dup pairs by
                          banded equality (4x16-bit bands -> Hamming<=3-ish
                          recall) verified by true Hamming distance;
- ``ngram_jaccard_pairs`` — exact n-gram Jaccard verification for candidate
                          pairs (the expensive step, run only inside buckets).

Embedding-cosine near-dup lives in stages/similarity.py.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..core.minhash import batch_band_hashes, batch_signatures
from ..ray_utils import register_for_ray


# --- exact dedup -------------------------------------------------------------

def _content_hash_col(batch: pa.Table, text_col: str, id_col: str) -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    hashes = [
        hashlib.blake2b((t or "").encode("utf-8"), digest_size=16).hexdigest()
        for t in texts
    ]
    return pa.table(
        {
            "content_hash": pa.array(hashes, pa.string()),
            id_col: batch.column(id_col),
        }
    )


def exact_dedup_ids(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Dataset -> (content_hash, keep_id=min id, n_copies). Shuffles only the
    narrow (hash, id) projection."""
    from ray.data.aggregate import Count, Min

    register_for_ray()
    hashed = ds.map_batches(
        lambda b: _content_hash_col(b, text_col, id_col), batch_format="pyarrow"
    )
    out = hashed.groupby("content_hash").aggregate(Min(id_col), Count())
    return out.map_batches(
        lambda b: b.rename_columns(
            [
                {"min(%s)" % id_col: "keep_id", "count()": "n_copies"}.get(c, c)
                for c in b.column_names
            ]
        ),
        batch_format="pyarrow",
    )


# --- minhash LSH near-dup ----------------------------------------------------

def _sig_table(
    batch: pa.Table, text_col: str, id_col: str, num_bands: int, rows_per_band: int
) -> pa.Table:
    """One row per doc: (id, sig bytes) — the signature leaves the worker
    ONCE, not once per band."""
    texts = [t or "" for t in batch.column(text_col).to_pylist()]
    sigs = batch_signatures(texts, num_bands, rows_per_band)
    return pa.table(
        {
            id_col: batch.column(id_col),
            "sig": pa.array(
                [sigs[i].tobytes() for i in range(len(texts))], pa.binary()
            ),
        }
    )


# fixed coarse-shuffle partition count for bucket co-location (the
# canonicalize.py idiom: groupby the raw (band, band_hash) key would make
# one Ray group per bucket — tiny groups whose per-group overhead dominates)
_BUCKET_PARTITIONS = 256


def _band_rows(
    batch: pa.Table, id_col: str, num_bands: int, rows_per_band: int
) -> pa.Table:
    """(id, sig) -> (part, id, band, band_hash) rows: the ONLY payload that
    crosses the bucket shuffle is ~24 bytes/row, not the full signature, and
    ``part = band_hash % N`` is the COARSE shuffle key (fine buckets are
    resolved vectorized inside each partition)."""
    ids = batch.column(id_col).to_pylist()
    sigs = np.vstack(
        [np.frombuffer(s, dtype=np.uint64) for s in batch.column("sig").to_pylist()]
    ) if batch.num_rows else np.zeros((0, num_bands * rows_per_band), dtype=np.uint64)
    bands = batch_band_hashes(sigs, num_bands, rows_per_band)
    n = len(ids)
    out_id, out_band, out_hash = [], [], []
    for b in range(num_bands):
        out_id.extend(ids)
        out_band.extend([b] * n)
        out_hash.extend(int(x) for x in bands[:, b])
    hash_arr = np.array(out_hash, dtype=np.uint64)
    return pa.table(
        {
            "part": pa.array(
                (hash_arr % np.uint64(_BUCKET_PARTITIONS)).astype(np.int32),
                pa.int32(),
            ),
            id_col: pa.array(out_id),
            "band": pa.array(out_band, pa.int32()),
            "band_hash": pa.array(hash_arr, pa.uint64()),
        }
    )


def distinct_pairs(pairs_ds, value_cols: list[str], num_partitions: int = 64):
    """Distributed DISTINCT on (id_a, id_b): coarse hash partition + one
    vectorized drop-duplicates per partition.

    Replaces ``groupby([id_a, id_b]).aggregate(...)`` for pair dedup: a
    Ray aggregate over millions of 1-5 row groups spends seconds in
    per-group overhead (measured 5.9s vs 0.9s on 135k pairs), while every
    duplicate of a pair carries IDENTICAL value columns (est_jaccard /
    hamming / cosine are pure functions of the two members), so keeping the
    first occurrence is exact."""
    import pandas as pd

    def _ppart(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column("ppart", pa.array([], pa.int32()))
        # NUL-safe partition key: pandas' object-string hashing truncates at
        # embedded \x00 (C-string semantics) — this repo's composite ids are
        # exactly `type\x00surface`, which would pile every pair into a few
        # partitions. Join the id columns NUL-free first (the
        # components.multiset_signature idiom), then hash the one column.
        joined = pc.binary_join_element_wise(
            pc.fill_null(pc.cast(b.column("id_a"), pa.string()), "\x1f\x1f"),
            pc.fill_null(pc.cast(b.column("id_b"), pa.string()), "\x1f\x1f"),
            "\x1e",
        )
        safe = pc.replace_substring(joined, "\x00", "\x1f")
        h = pd.util.hash_array(
            safe.to_numpy(zero_copy_only=False)
        ).astype(np.uint64)
        b = b.append_column(
            "ppart",
            pa.array((h % num_partitions).astype(np.int32), pa.int32()),
        )
        # the escaped key rides along so the in-partition dedup is NUL-safe
        # too: pandas drop_duplicates/factorize on raw object strings ALSO
        # truncates at \x00 and would collapse distinct composite ids
        return b.append_column("pkey", safe)

    cols = ["id_a", "id_b"] + value_cols

    def _distinct(group: pa.Table) -> pa.Table:
        keep = ~pd.Series(
            group.column("pkey").to_numpy(zero_copy_only=False)
        ).duplicated()
        return group.select(cols).filter(pa.array(keep.to_numpy()))

    return (
        pairs_ds.map_batches(_ppart, batch_format="pyarrow")
        .groupby("ppart")
        .map_groups(_distinct, batch_format="pyarrow")
    )


def _bucket_runs(group: pa.Table):
    """Yield per-bucket member index arrays inside one coarse partition:
    lexsort by (band, band_hash) + run detection, no per-bucket Ray task."""
    bands = group.column("band").to_numpy(zero_copy_only=False).astype(np.int64)
    hashes = group.column("band_hash").to_numpy(zero_copy_only=False).astype(np.uint64)
    n = len(bands)
    if n < 2:
        return
    order = np.lexsort((hashes, bands))
    sb, sh = bands[order], hashes[order]
    starts = np.flatnonzero(np.r_[True, (sb[1:] != sb[:-1]) | (sh[1:] != sh[:-1])])
    ends = np.r_[starts[1:], n]
    for s, e in zip(starts, ends):
        if e - s >= 2:
            yield order[s:e]


# candidate-doc count above which pair verification switches from a
# broadcast sig dict to partitioned hash joins
_VERIFY_BROADCAST_MAX = 500_000

# per-worker-process cache of the broadcast signature dict: ray.get of a
# plain dict deserializes per call, so cache it by object-ref hex once per
# worker instead of once per bucket task
_SIG_DICT_CACHE: dict[str, dict] = {}


def _cached_sig_dict(sig_ref) -> dict:
    import ray

    key = sig_ref.hex()
    hit = _SIG_DICT_CACHE.get(key)
    if hit is None:
        raw = ray.get(sig_ref)
        hit = {k: np.frombuffer(v, dtype=np.uint64) for k, v in raw.items()}
        _SIG_DICT_CACHE.clear()  # only ever one live broadcast per worker
        _SIG_DICT_CACHE[key] = hit
    return hit


def minhash_lsh_pairs(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_bands: int = 5,
    rows_per_band: int = 3,
    threshold: float = 0.7,
    max_bucket: int = 512,
):
    """Near-dup candidate pairs (id_a < id_b, est_jaccard >= threshold).

    Pipeline: sig table (one sig per doc) -> band rows (id, band, band_hash
    only — signatures do NOT ride the bucket shuffle) -> per-bucket candidate
    pairs -> pair dedup -> signature verification (broadcast sig dict below
    _VERIFY_BROADCAST_MAX docs, two narrow hash joins above)."""
    import ray

    register_for_ray()
    sigs_ds = ds.map_batches(
        lambda b: _sig_table(b, text_col, id_col, num_bands, rows_per_band),
        batch_format="pyarrow",
    ).materialize()
    rows = sigs_ds.map_batches(
        lambda b: _band_rows(b, id_col, num_bands, rows_per_band),
        batch_format="pyarrow",
    )
    n_docs = sigs_ds.count()

    if n_docs <= _VERIFY_BROADCAST_MAX:
        # verify INSIDE the buckets against a broadcast sig dict (cached once
        # per worker process): sig bytes cross the shuffle ZERO times, and
        # pairs are pruned before the dedup groupby. One coarse partition per
        # Ray group; fine buckets resolved by _bucket_runs.
        sig_ref = ray.put(
            {
                i: s
                for t in (ray.get(r) for r in sigs_ds.to_arrow_refs())
                for i, s in zip(t.column(id_col).to_pylist(), t.column("sig").to_pylist())
            }
        )

        def partition_pairs_verified(group: pa.Table) -> pa.Table:
            sigs = _cached_sig_dict(sig_ref)
            all_ids = group.column(id_col).to_pylist()
            a_out, b_out, sim_out = [], [], []
            for members in _bucket_runs(group):
                ids = [all_ids[i] for i in members]
                n = len(ids)
                if n > max_bucket:
                    ids = sorted(ids)[:max_bucket]
                    n = max_bucket
                # vectorized in-bucket verification: pairwise fraction of
                # agreeing minhash rows in ONE broadcasted comparison
                # (signature_similarity semantics) — hot dup buckets are
                # O(n^2) pairs and a per-pair Python loop dominates the stage
                mat = np.stack([sigs[i] for i in ids])
                eq = (mat[:, None, :] == mat[None, :, :]).mean(axis=2)
                ii, jj = np.triu_indices(n, k=1)
                hits = eq[ii, jj] >= threshold
                for i, j, s in zip(ii[hits], jj[hits], eq[ii, jj][hits]):
                    if ids[i] == ids[j]:
                        continue
                    lo, hi = sorted((ids[i], ids[j]))
                    a_out.append(lo)
                    b_out.append(hi)
                    sim_out.append(float(s))
            t = group.column(id_col).type
            return pa.table(
                {
                    "id_a": pa.array(a_out, t),
                    "id_b": pa.array(b_out, t),
                    "est_jaccard": pa.array(sim_out, pa.float64()),
                }
            )

        pairs = rows.groupby("part").map_groups(
            partition_pairs_verified, batch_format="pyarrow"
        )
        # est_jaccard is a pure function of the two signatures, so cross-band
        # duplicates carry identical scores: dedup = distributed DISTINCT
        return distinct_pairs(pairs, ["est_jaccard"])

    # scale path: ids-only buckets -> pair dedup -> join-based verification
    def partition_pairs(group: pa.Table) -> pa.Table:
        all_ids = group.column(id_col).to_pylist()
        a_out, b_out = [], []
        for members in _bucket_runs(group):
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
        t = group.column(id_col).type
        return pa.table({"id_a": pa.array(a_out, t), "id_b": pa.array(b_out, t)})

    pairs = rows.groupby("part").map_groups(
        partition_pairs, batch_format="pyarrow"
    )
    # a pair can surface from several bands -> dedup by (id_a, id_b)
    uniq = distinct_pairs(pairs, [])

    # two narrow hash joins annotate each pair with its two sigs
    njoin = min(64, max(2, n_docs // 500_000 + 2))
    sig_a = sigs_ds.map_batches(
        lambda b: pa.table({"ja": b.column(id_col), "sig_a": b.column("sig")}),
        batch_format="pyarrow",
    )
    sig_b = sigs_ds.map_batches(
        lambda b: pa.table({"jb": b.column(id_col), "sig_b": b.column("sig")}),
        batch_format="pyarrow",
    )
    j = uniq.join(
        sig_a, join_type="inner", num_partitions=njoin, on=("id_a",), right_on=("ja",)
    ).join(
        sig_b, join_type="inner", num_partitions=njoin, on=("id_b",), right_on=("jb",)
    )

    def _score(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "id_a": b.column("id_a"),
                    "id_b": b.column("id_b"),
                    "est_jaccard": pa.array([], pa.float64()),
                }
            )
        # vectorized signature_similarity: row-wise fraction of agreeing
        # minhash rows over the whole joined batch at once
        sa = np.stack(
            [np.frombuffer(s, dtype=np.uint64) for s in b.column("sig_a").to_pylist()]
        )
        sb = np.stack(
            [np.frombuffer(s, dtype=np.uint64) for s in b.column("sig_b").to_pylist()]
        )
        sims = (sa == sb).mean(axis=1)
        out = pa.table(
            {
                "id_a": b.column("id_a"),
                "id_b": b.column("id_b"),
                "est_jaccard": pa.array(sims, pa.float64()),
            }
        )
        return out.filter(pc.greater_equal(out.column("est_jaccard"), threshold))

    return j.map_batches(_score, batch_format="pyarrow")


# verified-pair count above which the connected-component clustering runs
# as distributed min-label propagation instead of a driver union-find: the
# pair list scales with the corpus DUPLICATION DENSITY, not its row count,
# so a dup-heavy crawl makes it corpus-sized
_CC_DRIVER_MAX_PAIRS = 500_000


def minhash_dedup_ids(
    ds,
    *,
    max_driver_pairs: int = _CC_DRIVER_MAX_PAIRS,
    return_dataset: bool | None = None,
    **kwargs,
):
    """Cluster near-dup pairs (connected components) -> (doc_id, keep_id).

    Below ``max_driver_pairs`` verified pairs: driver union-find over the
    collected pair list (returns a sorted pa.Table). Above: distributed
    min-label propagation + pointer doubling (stages/components.py — the
    same machinery proven at 10M keys for surface canonicalization);
    returns a Dataset of (doc_id, keep_id) and the pair list never touches
    the driver. keep_id = min doc id per component on BOTH paths (min-label
    propagation converges to exactly the min id), pinned equal by tests.

    ``return_dataset`` pins the return TYPE independent of the data-size
    dispatch (the default None keeps the size-dependent legacy behavior,
    which switches type at the threshold): True always returns a Ray
    Dataset; False always returns a sorted pa.Table — an explicit opt-in to
    collecting the id->keep mapping on the driver, whose size scales with
    corpus duplication density. Sort order: the Table paths are sorted by
    doc_id; Dataset results are unsorted (sort after consuming if needed).
    """
    import ray

    from ..core.unionfind import UnionFind

    pairs_ds = minhash_lsh_pairs(ds, **kwargs)
    if not isinstance(pairs_ds, pa.Table):
        pairs_ds = pairs_ds.materialize()
        n_pairs = pairs_ds.count()
        if n_pairs > max_driver_pairs:
            from .components import components_from_pairs

            labels = components_from_pairs(pairs_ds, id_a="id_a", id_b="id_b")
            out_ds = labels.map_batches(
                lambda b: pa.table(
                    {"doc_id": b.column("k"), "keep_id": b.column("label")}
                ),
                batch_format="pyarrow",
            )
            if return_dataset is False:
                tbl = pa.concat_tables(
                    [ray.get(r) for r in out_ds.to_arrow_refs()],
                    promote_options="permissive",
                )
                return tbl.take(
                    pc.sort_indices(tbl, sort_keys=[("doc_id", "ascending")])
                )
            return out_ds
    tbl = pa.concat_tables(
        [ray.get(r) for r in pairs_ds.to_arrow_refs()], promote_options="permissive"
    )
    ids: dict = {}
    order: list = []
    a_list = tbl.column("id_a").to_pylist() if tbl.num_rows else []
    b_list = tbl.column("id_b").to_pylist() if tbl.num_rows else []
    for x in a_list + b_list:
        if x not in ids:
            ids[x] = len(order)
            order.append(x)
    uf = UnionFind(len(order))
    for x, y in zip(a_list, b_list):
        uf.union(ids[x], ids[y])
    rep: dict[int, object] = {}
    for x in order:
        r = uf.find(ids[x])
        if r not in rep or x < rep[r]:
            rep[r] = x
    rows = sorted((x, rep[uf.find(ids[x])]) for x in order)
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows]),
            "keep_id": pa.array([r[1] for r in rows]),
        }
    )
    if return_dataset:
        import ray.data

        return ray.data.from_arrow(tbl)
    return tbl


# --- simhash -----------------------------------------------------------------

# per-worker token -> {-1,+1}^64 cache: corpus vocabulary repeats heavily, so
# each distinct token is hashed once per worker process, not once per use
_TOKEN_BITS_CACHE: dict[str, np.ndarray] = {}
_TOKEN_BITS_CACHE_MAX = 1_000_000


def _token_bits(tok: str) -> np.ndarray:
    bits = _TOKEN_BITS_CACHE.get(tok)
    if bits is None:
        h = hashlib.blake2b(tok.encode("utf-8"), digest_size=8).digest()
        bits = (
            np.unpackbits(np.frombuffer(h, dtype=np.uint8)).astype(np.int8) * 2 - 1
        )
        if len(_TOKEN_BITS_CACHE) >= _TOKEN_BITS_CACHE_MAX:
            _TOKEN_BITS_CACHE.clear()
        _TOKEN_BITS_CACHE[tok] = bits
    return bits


def _simhash64(tokens: list[str]) -> int:
    if not tokens:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for tok in tokens:
        acc += _token_bits(tok)
    out = 0
    for i, v in enumerate(acc):
        if v > 0:
            out |= 1 << (63 - i)
    return out


def simhash_table(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """(id, simhash uint64, 4x16-bit band values for bucketing)."""
    register_for_ray()

    def kernel(b: pa.Table) -> pa.Table:
        texts = [t or "" for t in b.column(text_col).to_pylist()]
        hashes = [_simhash64(t.lower().split()) for t in texts]
        cols = {
            id_col: b.column(id_col),
            "simhash": pa.array(hashes, pa.uint64()),
        }
        for band in range(4):
            cols[f"band{band}"] = pa.array(
                [(h >> (band * 16)) & 0xFFFF for h in hashes], pa.uint16()
            )
        return pa.table(cols)

    return ds.map_batches(kernel, batch_format="pyarrow")


def simhash_pairs(ds, *, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3):
    """Near-dup pairs by banded simhash (any equal 16-bit band -> candidate;
    verified by true Hamming distance)."""
    sims = simhash_table(ds, text_col=text_col, id_col=id_col)

    def band_rows(b: pa.Table) -> pa.Table:
        """Coarse partition key ``part = (val*4 + band) % N``: one Ray group
        per partition, fine (band, val) buckets resolved vectorized inside
        (the canonicalize.py idiom — a group per raw bucket would mean up to
        4 * 65536 tiny Ray groups)."""
        ids, hs = b.column(id_col).to_pylist(), b.column("simhash").to_pylist()
        out_id, out_h, out_band, out_val = [], [], [], []
        for band in range(4):
            vals = b.column(f"band{band}").to_pylist()
            out_id.extend(ids)
            out_h.extend(hs)
            out_band.extend([band] * len(ids))
            out_val.extend(vals)
        val_arr = np.array(out_val, dtype=np.int64)
        band_arr = np.array(out_band, dtype=np.int64)
        return pa.table(
            {
                "part": pa.array(
                    ((val_arr * 4 + band_arr) % _BUCKET_PARTITIONS).astype(np.int32),
                    pa.int32(),
                ),
                id_col: pa.array(out_id),
                "simhash": pa.array(out_h, pa.uint64()),
                "band": pa.array(band_arr.astype(np.int32), pa.int32()),
                "val": pa.array(val_arr.astype(np.uint16), pa.uint16()),
            }
        )

    def partition_pairs(group: pa.Table) -> pa.Table:
        all_ids = group.column(id_col).to_pylist()
        all_hs = group.column("simhash").to_pylist()
        bands = group.column("band").to_numpy(zero_copy_only=False).astype(np.int64)
        vals = group.column("val").to_numpy(zero_copy_only=False).astype(np.int64)
        a_out, b_out, d_out = [], [], []
        n = len(all_ids)
        if n >= 2:
            order = np.lexsort((vals, bands))
            sb, sv = bands[order], vals[order]
            starts = np.flatnonzero(
                np.r_[True, (sb[1:] != sb[:-1]) | (sv[1:] != sv[:-1])]
            )
            ends = np.r_[starts[1:], n]
            for s, e in zip(starts, ends):
                if e - s < 2:
                    continue
                members = order[s:e]
                for x in range(len(members)):
                    i = members[x]
                    for y in range(x + 1, len(members)):
                        j = members[y]
                        if all_ids[i] == all_ids[j]:
                            continue
                        d = bin(all_hs[i] ^ all_hs[j]).count("1")
                        if d <= max_hamming:
                            lo, hi = sorted((all_ids[i], all_ids[j]))
                            a_out.append(lo)
                            b_out.append(hi)
                            d_out.append(d)
        return pa.table(
            {
                "id_a": pa.array(a_out),
                "id_b": pa.array(b_out),
                "hamming": pa.array(d_out, pa.int32()),
            }
        )

    pairs = (
        sims.map_batches(band_rows, batch_format="pyarrow")
        .groupby("part")
        .map_groups(partition_pairs, batch_format="pyarrow")
    )
    # hamming is a pure function of the two simhashes: dedup = DISTINCT
    return distinct_pairs(pairs, ["hamming"])


# --- exact n-gram Jaccard verification --------------------------------------

def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    """Exact char-n-gram Jaccard (the verification scorer for candidates)."""
    sa = {a[i : i + n] for i in range(max(1, len(a) - n + 1))}
    sb = {b[i : i + n] for i in range(max(1, len(b) - n + 1))}
    if not sa and not sb:
        return 1.0
    union = len(sa | sb)
    return len(sa & sb) / union if union else 0.0


# candidate-pair count above which exact-ngram verification switches from a
# broadcast text dict to partitioned hash joins: with dense candidates the
# touched-text set approaches the corpus and must not live on the driver
_NGRAM_BROADCAST_MAX = 100_000


def verify_pairs_ngram_jaccard(
    ds,
    pairs,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_broadcast_pairs: int = _NGRAM_BROADCAST_MAX,
):
    """Join candidate pairs back to texts and score exact n-gram Jaccard.

    ``pairs`` is a table/Dataset of (id_a, id_b). Below
    ``max_broadcast_pairs`` the candidate-touched texts are gathered into one
    broadcast dict (fast at fixture scale; returns pa.Table). Above, the
    texts are attached via two partitioned hash joins against the docs table
    — the same shape as the minhash join-verify scale path — and a Dataset
    comes back; no driver text dict is ever built.
    """
    import ray

    register_for_ray()
    pairs_is_table = isinstance(pairs, pa.Table)
    if pairs_is_table:
        n_pairs = pairs.num_rows
    else:
        # keep the materialized handle: counting a throwaway materialize()
        # would re-execute the whole LSH banding + bucket scoring pipeline
        # a second time when the join path consumes `pairs` below
        pairs = pairs.materialize()
        n_pairs = pairs.count()

    if n_pairs > max_broadcast_pairs:
        import ray.data

        pairs_ds = ray.data.from_arrow(pairs) if pairs_is_table else pairs
        docs = ds.map_batches(
            lambda b: pa.table(
                {id_col: b.column(id_col), text_col: b.column(text_col)}
            ),
            batch_format="pyarrow",
        )
        njoin = min(64, max(2, n_pairs // 100_000 + 2))
        txt_a = docs.map_batches(
            lambda b: pa.table({"ja": b.column(id_col), "text_a": b.column(text_col)}),
            batch_format="pyarrow",
        )
        txt_b = docs.map_batches(
            lambda b: pa.table({"jb": b.column(id_col), "text_b": b.column(text_col)}),
            batch_format="pyarrow",
        )
        j = pairs_ds.join(
            txt_a, join_type="inner", num_partitions=njoin,
            on=("id_a",), right_on=("ja",),
        ).join(
            txt_b, join_type="inner", num_partitions=njoin,
            on=("id_b",), right_on=("jb",),
        )

        def _score(b: pa.Table) -> pa.Table:
            sims = [
                ngram_jaccard(ta or "", tb or "", n)
                for ta, tb in zip(
                    b.column("text_a").to_pylist(), b.column("text_b").to_pylist()
                )
            ]
            return pa.table(
                {
                    "id_a": b.column("id_a"),
                    "id_b": b.column("id_b"),
                    "jaccard": pa.array(sims, pa.float64()),
                }
            )

        return j.map_batches(_score, batch_format="pyarrow")

    if not pairs_is_table:
        pairs = pa.concat_tables(
            [ray.get(r) for r in pairs.to_arrow_refs()], promote_options="permissive"
        )
    need = set(pairs.column("id_a").to_pylist()) | set(pairs.column("id_b").to_pylist())

    texts: dict = {}
    for ref in ds.select_columns([id_col, text_col]).to_arrow_refs():
        t = ray.get(ref)
        for i, txt in zip(t.column(id_col).to_pylist(), t.column(text_col).to_pylist()):
            if i in need:
                texts[i] = txt or ""
    # existence semantics must match the join path: a pair whose id is absent
    # from the corpus is DROPPED (the inner joins above drop it), never
    # scored against an empty string
    ida = pairs.column("id_a").to_pylist()
    idb = pairs.column("id_b").to_pylist()
    keep = [a in texts and b in texts for a, b in zip(ida, idb)]
    if not all(keep):
        pairs = pairs.filter(pa.array(keep))
        ida = pairs.column("id_a").to_pylist()
        idb = pairs.column("id_b").to_pylist()
    sims = [ngram_jaccard(texts[a], texts[b], n) for a, b in zip(ida, idb)]
    return pairs.append_column("jaccard", pa.array(sims, pa.float64()))
