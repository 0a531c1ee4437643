"""Flagship KG-construction pipeline: pages parquet -> canonical node/edge parquet.

Stages (all Ray Data, streaming):

  A. extract   — per input-file shards: read pages (column-pruned), run the
                 fused extract kernel, write ``out/docs/part=<k>`` + manifest.
                 TRUE per-partition resume: completed shards are skipped
                 (keyed by stable path-derived pids + coref strategy).
  B. canonical — mentions -> distinct surfaces (combiner + small groupby) ->
                 LSH fuzzy edges -> components -> surface->canonical mapping.
                 Below DRIVER_SURFACE_MAX distinct surfaces: single-task
                 vectorized edge scoring + driver union-find (fastest at
                 test/bench scale). Above: coarse-hash-partitioned banded
                 groupby + distributed min-label propagation — the surface
                 table never touches the driver.
  C. materialize — canonicalized nodes (dedup by node_id with count/min
                 aggregation) and edges (triples with canonical endpoint
                 ids), globally sorted, written as parquet + fingerprinted
                 per-partition manifests. Map-back is a broadcast dict below
                 BROADCAST_MAP_MAX mapping entries, partitioned hash joins
                 above.

Run:  python -m anno_ray.pipelines.kg --pages <dir> --out <dir>
      [--coref cli|simple] [--max-driver-surfaces N] [--no-resume]
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import pyarrow.compute as pc

from ..core.normalize import normalize_entity_name
from ..ray_utils import register_for_ray
from ..state import manifests as mf
from ..stages import canonicalize as canon
from ..stages.extract import _explode, extract_batch
from ..state.writer import spill_batch

_PAGE_COLUMNS = ["url", "html", "lang"]


def _shard_pid(path: str) -> str:
    """Stable partition id from the input path's basename (NOT its position in
    the current directory listing): if files are added/removed between runs, a
    pending file can never collide with a different file's completed
    partition. Basenames are unique within one pages dir; the hash suffix
    guards against sanitization collisions."""
    import hashlib
    import re as _re

    base = os.path.splitext(os.path.basename(path))[0]
    safe = _re.sub(r"[^A-Za-z0-9_.-]", "_", base)[:64]
    h = hashlib.blake2b(base.encode("utf-8"), digest_size=4).hexdigest()
    return f"{safe}-{h}"



class ExtractShard:
    """Actor-pool task: one input parquet file -> one docs partition + manifest."""

    def __init__(self, out_dir: str, coref_strategy: str = "cli"):
        self.out_dir = out_dir
        self.coref_strategy = coref_strategy

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        paths = batch.column("path").to_pylist()
        pids = batch.column("pid").to_pylist()
        rows = []
        for path, pid in zip(paths, pids):
            t0 = time.time()
            # stream row groups instead of reading the whole shard: a
            # production 1 GB shard decompresses to several GB; iter_batches
            # caps this worker's input residency at one 64-page batch while
            # feeding the identical chunked-extract loop
            pf = pq.ParquetFile(path)
            out_parts = []
            n = pf.metadata.num_rows
            for chunk in pf.iter_batches(batch_size=64, columns=_PAGE_COLUMNS):
                out_parts.append(
                    extract_batch(
                        pa.Table.from_batches([chunk]),
                        coref_strategy=self.coref_strategy,
                    )
                )
            docs = (
                pa.concat_tables(out_parts)
                if out_parts
                else extract_batch(pq.read_table(path, columns=_PAGE_COLUMNS))
            )
            pf.close()
            # per-shard distinct-surface partial (the canonicalize stage's
            # combiner, run WHILE the mentions are already in memory): the
            # canonicalize groupby then reads these kB-sized partials
            # instead of re-scanning + re-exploding the docs parquet
            mentions = _explode(docs.select(["url", "mentions"]), "mentions", ["url"])
            ner = mentions.filter(
                pc.is_in(mentions.column("label"),
                         value_set=pa.array(["PER", "ORG", "LOC"]))
            )
            surf_partial = canon._preagg_surfaces(ner, "label", "norm_surface")
            mf.write_partition(
                self.out_dir,
                "docs",
                pid,
                docs,
                inputs=[path],
                metrics={
                    "pages": n,
                    "mentions": int(pc.sum(docs.column("n_mentions")).as_py() or 0),
                    "seconds": time.time() - t0,
                    "coref_strategy": self.coref_strategy,
                },
                side_tables={"surfaces": surf_partial},
            )
            rows.append({"pid": pid, "pages": n})
        return pa.table(
            {
                "pid": pa.array([r["pid"] for r in rows], pa.string()),
                "pages": pa.array([r["pages"] for r in rows], pa.int64()),
            }
        )


def run_extract_stage(
    pages_dir: str,
    out_dir: str,
    *,
    resume: bool = True,
    concurrency: int | None = None,
    coref_strategy: str = "cli",
) -> dict:
    """Stage A. Returns stats including skipped (resumed) shard count."""
    import ray
    import ray.data

    register_for_ray()
    files = sorted(
        os.path.join(pages_dir, f)
        for f in os.listdir(pages_dir)
        if f.endswith(".parquet")
    )
    if resume:
        # a completed shard only counts if it was extracted with the SAME
        # coref strategy — otherwise resume would mix generations
        done = mf.completed_partitions(out_dir, "docs")
        done_inputs: set[str] = set()
        for m in done.values():
            if m.get("metrics", {}).get("coref_strategy", "cli") == coref_strategy:
                done_inputs.update(m.get("inputs", []))
        pending = [p for p in files if p not in done_inputs]
        skipped = [p for p in files if p in done_inputs]
    else:
        pending, skipped = files, []

    if pending:
        items = [{"path": p, "pid": _shard_pid(p)} for p in pending]
        shards = ray.data.from_items(items)
        if concurrency is None:
            # fixed-size pool sized to the cluster: the lazy (2, N) ramp-up
            # left most cores idle for the first seconds of the stage
            try:
                ncpu = int(ray.cluster_resources().get("CPU", 8))
            except Exception:
                ncpu = 8
            concurrency = max(1, min(ncpu, len(pending)))
        res = shards.map_batches(
            ExtractShard,
            fn_constructor_args=(out_dir, coref_strategy),
            batch_size=1,
            batch_format="pyarrow",
            concurrency=concurrency,
            num_cpus=1,
        )
        res.materialize()
    return {"shards_total": len(files), "shards_run": len(pending), "shards_skipped": len(skipped)}


def docs_dataset(out_dir: str, columns: list[str] | None = None):
    import ray.data

    return ray.data.read_parquet(os.path.join(out_dir, "docs"), columns=columns)


def _docs_fingerprint(out_dir: str) -> str:
    """Hash of the docs-stage manifests: identifies the extract output."""
    import hashlib

    done = mf.completed_partitions(out_dir, "docs")
    h = hashlib.blake2b(digest_size=16)
    for pid in sorted(done):
        h.update(pid.encode())
        h.update(done[pid].get("content_hash", "").encode())
    return h.hexdigest()


# Above this many DISTINCT (type, surface) keys the canonicalize stage routes
# through the fully distributed path: banded-groupby LSH edges + min-label
# propagation/pointer doubling for the components, and the materialize
# map-back becomes partitioned hash joins instead of a broadcast dict. At CC
# scale distinct NER surfaces are 10^8-10^9 — far past any driver heap.
DRIVER_SURFACE_MAX = 2_000_000
# Above this many mapping entries the broadcast-dict map-back (~100 B/entry
# of per-actor Python dict) is replaced by hash joins even if the mapping
# arrived as a driver table.
BROADCAST_MAP_MAX = 1_000_000
# Below this many TOTAL bytes of per-shard surface partials the driver
# combines them with one Arrow hash aggregate instead of a Ray all-to-all
# (the Ray Aggregate costs ~5s of fixed scheduling overhead regardless of
# size; 32 MB of partial parquet is a few million rows — trivially
# driver-sized, while a 100 TB corpus's partials blow past this and take
# the distributed branch).
DRIVER_PARTIALS_MAX_BYTES = 32 << 20


def run_canonicalize_stage(
    out_dir: str,
    *,
    mode: str = canon.MODE_CDCR,
    resume: bool = True,
    max_driver_surfaces: int = DRIVER_SURFACE_MAX,
):
    """Stage B: mentions -> canonical mapping (persisted + resumable: when the
    docs stage is unchanged since the last run, the saved mapping is reused
    instead of recomputing the shuffle).

    Returns a ``pa.Table`` below ``max_driver_surfaces`` distinct surfaces
    (driver-side union-find over the compact LSH edge list — cheapest by far
    at test/bench scale) and a ``ray.data.Dataset`` above it (distributed
    connected components; the driver never holds the surface table)."""
    import pyarrow.parquet as pq

    from ..stages.extract import mentions_table

    mdir = os.path.join(out_dir, "canonical")
    fp = _docs_fingerprint(out_dir)
    meta_path = os.path.join(mdir, "_manifest.json")
    map_path = os.path.join(mdir, "mapping.parquet")
    map_dir = os.path.join(mdir, "mapping")
    if resume and os.path.exists(meta_path):
        try:
            with open(meta_path, encoding="utf-8") as f:
                meta = json.load(f)
            if meta.get("docs_fingerprint") == fp and meta.get("mode") == mode:
                if meta.get("kind") == "distributed" and os.path.isdir(map_dir):
                    import ray.data

                    return ray.data.read_parquet(map_dir)
                if os.path.exists(map_path):
                    return pq.read_table(map_path)
        except (json.JSONDecodeError, OSError):
            pass

    # the extract shards commit a kB-sized distinct-surface combiner partial
    # next to each docs partition; when every completed partition has one,
    # the wide docs re-scan (read + mentions explode + filter) is skipped
    # entirely and this stage aggregates the partials (identical math: the
    # partial IS _preagg_surfaces over the shard's PER/ORG/LOC mentions)
    import ray.data as _rd

    done = mf.completed_partitions(out_dir, "docs")
    partials = [
        os.path.join(out_dir, "docs", "_side", "surfaces", f"{pid}.parquet")
        for pid in sorted(done)
    ]
    surfaces_tbl: pa.Table | None = None
    if partials and all(os.path.exists(p) for p in partials):
        total_bytes = sum(os.path.getsize(p) for p in partials)
        if total_bytes <= DRIVER_PARTIALS_MAX_BYTES:
            # the partials are kB-sized per shard BY DESIGN; combining a few
            # MB of them through a Ray all-to-all Aggregate costs ~5s of pure
            # scheduling overhead per run (measured: 2,601 surfaces from 128
            # partials), so below a byte budget the driver combines them with
            # one Arrow hash aggregate — identical math, order-normalized by
            # the sort (every downstream consumer is order-insensitive:
            # union-find representative is the lexicographic min, bucket caps
            # sort before truncating)
            import pyarrow.parquet as _pq

            t = _pq.read_table(partials, partitioning=None)
            g = t.group_by(["entity_type", "norm_surface"]).aggregate(
                [("n_mentions", "sum")]
            )
            g = g.take(
                pc.sort_indices(
                    g,
                    sort_keys=[
                        ("entity_type", "ascending"),
                        ("norm_surface", "ascending"),
                    ],
                )
            )
            surfaces_tbl = pa.table(
                {
                    "entity_type": g.column("entity_type"),
                    "norm_surface": g.column("norm_surface"),
                    "sum(n_mentions)": g.column("n_mentions_sum"),
                }
            )
        else:
            pre = _rd.read_parquet(partials)
            surfaces_ds = pre.groupby(["entity_type", "norm_surface"]).sum(
                "n_mentions"
            )
    else:
        # fallback (outputs from older runs without partials)
        docs = docs_dataset(out_dir, columns=["url", "mentions"])
        mentions = mentions_table(docs)

        # only PER/ORG/LOC surfaces participate in cross-doc clustering
        def _ner_only(b: pa.Table) -> pa.Table:
            mask = pc.is_in(
                b.column("label"), value_set=pa.array(["PER", "ORG", "LOC"])
            )
            return b.filter(mask)

        ner = mentions.map_batches(_ner_only, batch_format="pyarrow")
        surfaces_ds = canon.surface_groups(
            ner, type_col="label", surface_col="norm_surface"
        )
    if surfaces_tbl is not None:
        n_surfaces = surfaces_tbl.num_rows
        if n_surfaces > max_driver_surfaces:
            # rare combo (tiny partial bytes but huge surface count): hand
            # the driver-combined table back to the distributed path
            surfaces_ds = _rd.from_arrow(surfaces_tbl).materialize()
    else:
        # materialize the distinct-surface Dataset ONCE; the edge pass and
        # the merge both consume it, avoiding a second execution of
        # explode+groupby
        surfaces_ds = surfaces_ds.materialize()
        n_surfaces = surfaces_ds.count()
        try:  # persist ds.stats() for the wide stage (observability)
            os.makedirs(mdir, exist_ok=True)
            with open(
                os.path.join(mdir, "_ray_stats.txt"), "w", encoding="utf-8"
            ) as f:
                f.write(surfaces_ds.stats())
        except Exception:
            pass

    os.makedirs(mdir, exist_ok=True)
    if n_surfaces <= max_driver_surfaces:
        surfaces = (
            surfaces_tbl
            if surfaces_tbl is not None
            else canon.collect_surfaces(surfaces_ds)
        )
        edges = canon.fuzzy_edges(surfaces, mode=mode, n_surfaces=n_surfaces)
        mapping = canon.build_canonical_map(surfaces, edges)
        pq.write_table(mapping, map_path)
        with open(meta_path, "w", encoding="utf-8") as f:
            json.dump(
                {"docs_fingerprint": fp, "mode": mode, "kind": "driver",
                 "rows": mapping.num_rows},
                f,
            )
        return mapping

    # scale path: the surface table never touches the driver
    import ray.data
    import shutil as _shutil

    edges_ds = canon.fuzzy_edges(
        surfaces_ds, mode=mode, max_task_surfaces=max_driver_surfaces,
        n_surfaces=n_surfaces,
    )
    mapping_ds = canon.build_canonical_map_distributed(
        surfaces_ds, edges_ds, as_dataset=True
    )
    _shutil.rmtree(map_dir, ignore_errors=True)
    mapping_ds.write_parquet(map_dir)
    with open(meta_path, "w", encoding="utf-8") as f:
        json.dump(
            {"docs_fingerprint": fp, "mode": mode, "kind": "distributed",
             "rows": n_surfaces},
            f,
        )
    return ray.data.read_parquet(map_dir)


_NER_LABELS = ("PER", "ORG", "LOC")


def _node_id_col(labels, norms, kb_ids, cids) -> list[str]:
    out = []
    for lab, s, kb, cid in zip(labels, norms, kb_ids, cids):
        if kb:
            out.append(kb)
        elif lab in _NER_LABELS:
            out.append(f"coref_{cid}")
        else:
            out.append(f"{lab.lower()}:{s.replace(' ', '_')}")
    return out


class NodeRows:
    """mentions batch -> per-block pre-aggregated node rows (combiner)."""

    def __init__(self, mapping_ref):
        self.mapper = canon.CanonicalMapper(mapping_ref, "label", "norm_surface")

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = self.mapper(batch)
        labels = batch.column("label").to_pylist()
        norms = batch.column("norm_surface").to_pylist()
        kbs = batch.column("kb_id").to_pylist()
        cids = batch.column("canonical_id").to_pylist()
        cnames = batch.column("canonical_name").to_pylist()
        starts = batch.column("start").to_pylist()
        node_ids = _node_id_col(labels, norms, kbs, cids)
        agg: dict[str, list] = {}
        for nid, lab, cname, start in zip(node_ids, labels, cnames, starts):
            if lab == "PRON":
                continue  # pronouns are track members, not graph nodes
            cur = agg.get(nid)
            if cur is None:
                agg[nid] = [lab, cname, 1, start]
            else:
                cur[2] += 1
                if start < cur[3]:
                    cur[3] = start
        keys = sorted(agg)
        return pa.table(
            {
                "node_id": pa.array(keys, pa.string()),
                "node_type": pa.array([agg[k][0] for k in keys], pa.string()),
                "name": pa.array([agg[k][1] for k in keys], pa.string()),
                "mentions_count": pa.array([agg[k][2] for k in keys], pa.int64()),
                "first_seen": pa.array([agg[k][3] for k in keys], pa.int64()),
            }
        )


class EdgeRows:
    """triples batch -> edges with canonical endpoint node ids."""

    def __init__(self, mapping_ref):
        import ray

        mapping = ray.get(mapping_ref) if not isinstance(mapping_ref, pa.Table) else mapping_ref
        self.lookup: dict[tuple[str, str], int] = {}
        self.kb_free_lookup: dict[str, tuple[str, int]] = {}
        for t, s, cid in zip(
            mapping.column("entity_type").to_pylist(),
            mapping.column("norm_surface").to_pylist(),
            mapping.column("canonical_id").to_pylist(),
        ):
            self.lookup[(t, s)] = cid
            # untyped endpoint resolution (event triples): PER > ORG > LOC
            prio = {"PER": 0, "ORG": 1, "LOC": 2}.get(t, 9)
            cur = self.kb_free_lookup.get(s)
            if cur is None or prio < {"PER": 0, "ORG": 1, "LOC": 2}.get(cur[0], 9):
                self.kb_free_lookup[s] = (t, cid)
        self._cache: dict[tuple[str, str], str] = {}

    def _endpoint(self, text: str, label: str) -> str:
        key = (text, label)
        hit = self._cache.get(key)
        if hit is not None:
            return hit
        out = self._endpoint_uncached(text, label)
        self._cache[key] = out
        return out

    def _endpoint_uncached(self, text: str, label: str) -> str:
        s = normalize_entity_name(text)
        if label in _NER_LABELS:
            cid = self.lookup.get((label, s))
            if cid is not None:
                return f"coref_{cid}"
            return f"coref_{canon.canonical_hash(label, s)}"
        hit = self.kb_free_lookup.get(s)
        if hit is not None:
            return f"coref_{hit[1]}"
        if label:
            return f"{label.lower()}:{s.replace(' ', '_')}"
        return f"text:{s.replace(' ', '_')}"

    def _endpoint_col(self, texts, labels) -> pa.Array:
        """Vectorized endpoint resolution: dictionary-encode (text, label)
        pairs so ``_endpoint`` (normalize + dict lookups) runs once per
        UNIQUE pair, then ``take`` maps results back — surfaces repeat
        heavily across a docs block, so this is ~5-20x fewer Python calls
        than the per-row list comprehension it replaces."""
        key = pc.binary_join_element_wise(texts, labels, "\x00")
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        d = key.dictionary_encode()
        mapped = []
        for k in d.dictionary.to_pylist():
            text, _, label = k.rpartition("\x00")
            mapped.append(
                self._endpoint(text, _CANON_LABEL.get(label.lower(), label))
            )
        return pc.take(pa.array(mapped, pa.string()), d.indices)

    def __call__(self, batch: pa.Table) -> pa.Table:
        src_ids = self._endpoint_col(batch.column("subj"), batch.column("subj_label"))
        dst_ids = self._endpoint_col(batch.column("obj"), batch.column("obj_label"))
        return pa.table(
            {
                "subj": batch.column("subj"),
                "pred": batch.column("pred"),
                "obj": batch.column("obj"),
                "subj_node": src_ids,
                "obj_node": dst_ids,
                "conf": batch.column("conf"),
                "source": batch.column("source"),
                "url": batch.column("url"),
            }
        )


class FusedMaterialize:
    """ONE pass over docs blocks: explodes mentions -> pre-aggregated node
    partial rows spilled by node range partition, and triples -> canonical
    edges spilled by edge range partition (both side outputs with
    retry-idempotent filenames). Returns only a per-block row-count row, so
    NO Ray shuffle touches the materialize stage at all — both families
    merge from the filesystem partials (the object-store groupby this
    replaces cost ~6 s just to move 37 MB of node partials)."""

    def __init__(
        self,
        mapping: pa.Table,
        cuts: list[str],
        spill_dir: str,
        node_cuts: list[str],
        node_spill_dir: str,
        funnels: list | None = None,
    ):
        import numpy as np

        self.node_fn = NodeRows(mapping)
        self.edge_fn = EdgeRows(mapping)
        self.cuts = np.array(cuts, dtype=object) if cuts else None
        self.spill_dir = spill_dir
        self.node_cuts = np.array(node_cuts, dtype=object) if node_cuts else None
        self.node_spill_dir = node_spill_dir
        self.funnels = funnels

    def __call__(self, batch: pa.Table) -> pa.Table:
        mentions = _explode(batch.select(["url", "mentions"]), "mentions", ["url"])
        node_partial = self.node_fn(mentions)
        spill_batch(
            node_partial, self.node_spill_dir, "node_id", self.node_cuts, "node_id",
            funnels=self.funnels,
        )
        triples = _explode(batch.select(["url", "triples"]), "triples", ["url"])
        edges = self.edge_fn(triples)
        spill_batch(
            edges, self.spill_dir, "subj_node", self.cuts, "url",
            funnels=self.funnels,
        )
        return pa.table(
            {
                "node_rows": pa.array([node_partial.num_rows], pa.int64()),
                "edge_rows": pa.array([edges.num_rows], pa.int64()),
            }
        )


def _sample_edge_cuts(
    out_dir: str,
    mapping: pa.Table,
    *,
    sample_files: int = 8,
    rows_per_part: int = 400_000,
    max_parts: int = 256,
) -> tuple[list[str], int]:
    """Volume-weighted range cuts for the materialize stage, from a
    DETERMINISTIC sample of docs partitions (every k-th part file by sorted
    name — independent of cluster size, so resumed runs and different
    num_cpus produce byte-identical output).

    Samples the actual subj_node distribution instead of cutting the
    canonical-id universe evenly: edge volume is heavily skewed (hub
    entities; the date:/email:/text: endpoint families sort entirely past
    the coref_ id range), and unweighted cuts left 30% of all edge rows in
    the final partition. Returns (cuts, n_parts)."""
    import glob as _glob

    import numpy as np
    import ray

    files = sorted(
        _glob.glob(os.path.join(out_dir, "docs", "part=*", "data.parquet"))
    )
    if not files:
        return [], 1
    step = max(1, len(files) // sample_files)
    sampled = files[::step][:sample_files]
    map_ref = ray.put(mapping)

    @ray.remote
    def _subj_counts(path: str):
        import pyarrow.parquet as pq

        t = pq.read_table(path, columns=["url", "triples"])
        tr = _explode(t, "triples", ["url"])
        if tr.num_rows == 0:
            return [], [], 0
        ef = EdgeRows(map_ref)
        sn = ef._endpoint_col(tr.column("subj"), tr.column("subj_label"))
        vc = sn.value_counts()
        return (
            vc.field("values").to_pylist(),
            vc.field("counts").to_pylist(),
            tr.num_rows,
        )

    register_for_ray()
    parts = ray.get([_subj_counts.remote(p) for p in sampled])
    counts: dict[str, int] = {}
    sampled_rows = 0
    for keys, cnts, n in parts:
        sampled_rows += n
        for k, c in zip(keys, cnts):
            counts[k] = counts.get(k, 0) + c
    if not counts:
        return [], 1
    est_total = int(sampled_rows * (len(files) / max(1, len(sampled))))
    # partition count derives from DATA VOLUME only (never cluster size):
    # the same corpus produces the same partition layout on any cluster, so
    # output files — not just logical content — are reproducible across
    # cluster resizes, and a resume after scaling the cluster up/down still
    # matches every completed partition. Floor of 8 keeps small corpora
    # wide enough to overlap merge tasks with the fused pass.
    n_parts = int(min(max_parts, max(8, est_total // rows_per_part + 1)))
    from ..state.writer import weighted_boundaries

    ks = list(counts.keys())
    cuts = weighted_boundaries(ks, [counts[k] for k in ks], n_parts)
    return cuts, len(cuts) + 1


def _mapping_row_hashes(b: pa.Table) -> pa.Table:
    """Order-independent per-block signature: sum of per-row hashes."""
    import hashlib

    acc = 0
    for t, s, cid in zip(
        b.column("entity_type").to_pylist(),
        b.column("norm_surface").to_pylist(),
        b.column("canonical_id").to_pylist(),
    ):
        d = hashlib.blake2b(f"{t}\x00{s}\x00{cid}".encode("utf-8"), digest_size=8).digest()
        acc = (acc + int.from_bytes(d, "big")) & ((1 << 64) - 1)
    return pa.table({"sig": pa.array([acc], pa.uint64())})


def _materialize_fingerprint(out_dir: str, mapping, layout=None) -> str:
    """Identifies the (docs, canonical mapping, partition layout) generation
    an edges/nodes partition was derived from. A resumed run invalidates
    completed partitions whose recorded fingerprint differs — preventing a
    mixed-generation graph when docs or the mapping changed. Row-order
    independent (sum of per-row hashes), so the driver-table and distributed
    mapping paths fingerprint identically for the same mapping.

    ``layout`` is the (cuts, n_parts) range layout of this run. It MUST be
    part of the fingerprint: two layouts cover the key space with different
    overlapping ranges, so keeping a completed partition from layout A while
    writing layout B's partitions around it double-counts every row in the
    overlap (this exact bug once shipped a 168k-row edges table for a 74k
    -triple corpus after a resume across a partition-count change)."""
    import hashlib

    if isinstance(mapping, pa.Table):
        sig = _mapping_row_hashes(mapping).column("sig")[0].as_py()
    else:
        sig = sum(
            r["sig"]
            for r in mapping.map_batches(
                _mapping_row_hashes, batch_format="pyarrow"
            ).take_all()
        ) & ((1 << 64) - 1)
    h = hashlib.blake2b(digest_size=16)
    h.update(_docs_fingerprint(out_dir).encode())
    h.update(str(sig).encode())
    if layout is not None:
        cuts, n_parts = layout
        h.update(str(int(n_parts)).encode())
        for c in cuts:
            h.update(b"\x00")
            h.update(str(c).encode("utf-8", "replace"))
    return h.hexdigest()


def run_materialize_stage(out_dir: str, mapping) -> dict:
    """Stage C: sorted canonical node/edge parquet + manifests.

    Dispatch: a driver-sized mapping table uses the fused single-pass
    broadcast map-back; a Dataset mapping (or an oversized table) uses the
    partitioned hash-join map-back, which never builds a per-actor Python
    dict of the whole mapping."""
    if isinstance(mapping, pa.Table) and mapping.num_rows <= BROADCAST_MAP_MAX:
        return _run_materialize_broadcast(out_dir, mapping)
    return _run_materialize_joined(out_dir, canon._as_dataset(mapping))


def _combine_node_partials(tbl: pa.Table) -> pa.Table:
    """Final node combine for one range partition: Arrow's native hash
    aggregation (min/min/sum/min — same semantics as the Ray
    ``groupby(node_id).aggregate(Min, Min, Sum, Min)`` this replaces, which
    spent ~280 CPU-seconds on 561k partial rows in Ray's sort-based
    aggregate; a pandas groupby was still ~60x slower than this on string
    mins), sorted by node_id."""
    g = tbl.group_by("node_id").aggregate(
        [
            ("node_type", "min"),
            ("name", "min"),
            ("mentions_count", "sum"),
            ("first_seen", "min"),
        ]
    )
    names = {
        "node_type_min": "node_type",
        "name_min": "name",
        "mentions_count_sum": "mentions_count",
        "first_seen_min": "first_seen",
    }
    g = g.rename_columns([names.get(c, c) for c in g.column_names])
    g = g.take(pc.sort_indices(g, sort_keys=[("node_id", "ascending")]))
    return g.select(["node_id", "node_type", "name", "mentions_count", "first_seen"])


def _merge_node_spills(node_spill_dir: str, out_dir: str, n_parts: int) -> dict:
    """One task per node range partition: read partials, combine, write."""
    import ray

    @ray.remote
    def _merge(pid: int) -> int:
        import pyarrow.parquet as pq

        pid_s = f"{pid:05d}"
        pdir = os.path.join(node_spill_dir, f"part={pid_s}")
        if not os.path.isdir(pdir):
            return 0
        files = sorted(
            os.path.join(pdir, f) for f in os.listdir(pdir) if f.endswith(".parquet")
        )
        if not files:
            return 0
        tbl = pq.read_table(files, partitioning=None)
        if tbl.num_rows == 0:
            return 0
        # compact the one-chunk-per-spill-file layout before the hash
        # aggregation + sort (same cache-locality win as the edges merge)
        tbl = _combine_node_partials(tbl.combine_chunks())
        mf.write_partition(
            out_dir, "nodes", pid_s, tbl,
            inputs=[f"range<{pid_s}>"],
            metrics={"rows": tbl.num_rows, "fingerprint": None},
        )
        return tbl.num_rows

    written = ray.get([_merge.remote(p) for p in range(n_parts)])
    return {
        "stage": "nodes",
        "partitions": n_parts,
        "rows_written": int(sum(written)),
        "partitions_skipped": 0,
    }


def _run_materialize_broadcast(out_dir: str, mapping: pa.Table) -> dict:
    """Fused single-pass materialize with broadcast-dict map-back (the
    fastest path while the mapping fits comfortably in one actor's heap).

    Partition boundaries come from a volume-weighted sample of the actual
    edge keys (``_sample_edge_cuts``), not the canonical-id universe: the
    sampled cuts balance edge rows across partitions (the unweighted cuts
    left 30% of rows in one 10-second-sort straggler partition). Node rows
    combine per range partition via ONE coarse int-keyed groupby and are
    written directly — no Ray string-keyed Aggregate, no second spill."""
    import shutil

    from ..state import manifests as mfst
    from ..state.writer import merge_spilled

    register_for_ray()
    t_s = time.time()
    cuts, n_parts = _sample_edge_cuts(out_dir, mapping)
    if not cuts:
        # degenerate corpus (no triples in sample): fall back to the
        # canonical-id universe so nodes still get a usable partitioning
        from ..state.writer import boundaries_from_keys

        boundary = sorted(
            f"coref_{cid}"
            for cid in set(mapping.column("canonical_id").to_pylist())
        )
        n_parts = max(1, min(8, len(boundary)))
        cuts = boundaries_from_keys(boundary, n_parts)
        n_parts = len(cuts) + 1

    spill_dir = os.path.join(out_dir, "edges", "_spill")
    shutil.rmtree(spill_dir, ignore_errors=True)
    node_spill_dir = os.path.join(out_dir, "nodes", "_spill")
    # nodes are always fully rewritten (resume=False semantics of the old
    # write_sorted call) — clear stale partitions from any previous layout
    shutil.rmtree(os.path.join(out_dir, "nodes"), ignore_errors=True)
    # node partitions are a coarse subsample of the edge cuts (node tables
    # are ~100x smaller than edge tables; 8-ish partitions suffice and keep
    # the spill file count down)
    node_stride = max(1, (len(cuts) + 7) // 8)
    node_cuts = cuts[node_stride - 1 :: node_stride]
    node_n_parts = len(node_cuts) + 1

    t0 = time.time()
    docs = docs_dataset(out_dir, columns=["url", "mentions", "triples"])
    fused = FusedMaterialize(mapping, cuts, spill_dir, node_cuts, node_spill_dir)
    # batch_size trades fused-pass granularity against spill-file count:
    # n_tasks ~ corpus/batch_size and each task writes <= n_parts files, so
    # the spill-file total is O(n_tasks x n_parts) — QUADRATIC-ish in corpus
    # size at a fixed batch size. At 192k pages the fixed 768 produced
    # 250 tasks x 111 partitions = 27.7k tiny files and the merge became
    # open/footer-bound (355 CPU-s of read for 47 s of write). Scale the
    # batch with the corpus, floored for small-corpus parallelism and
    # capped so one task's exploded mentions+triples stay ~tens of MB.
    # DATA-derived only (pages count), so the spill layout — like the
    # partition layout — is identical across cluster sizes.
    n_pages = sum(
        int(m.get("metrics", {}).get("pages", 0))
        for m in mf.completed_partitions(out_dir, "docs").values()
    )
    fused_batch = int(
        os.environ.get("ANNO_FUSED_BATCH", min(4096, max(768, n_pages // 64)))
    )
    # per-node spill consolidation: the raw pattern writes n_tasks x n_parts
    # files, which grows linearly with tasks once fused_batch caps at 4096
    # (10^9 pages -> ~244k tasks -> tens of millions of spill files). Above
    # the measured harm threshold the spill slices route through
    # writer-funnel actors that flush consolidated per-partition files —
    # O(n_funnels x n_parts), task-count-independent. The threshold comes
    # from an interleaved same-session A/B (each pair alternated to cancel
    # host clock drift): at 96k pages (2.2k files) direct wins 7.7 vs 9.4 s
    # and at 192k (4.2k files) 15.0 vs 21.6 s — the consolidation hop costs
    # an extra object-store copy of every edge row — while in the forced
    # explosion regime (fused_batch=768 at 192k -> 18.7k files, the exact
    # shape of the round-4 incident) the funnel path wins (see BASELINE.md
    # round-5 table). ANNO_SPILL_FUNNELS=0 disables; >0 forces the count.
    from ..state.writer import close_spill_funnels, create_spill_funnels

    env_funnels = int(os.environ.get("ANNO_SPILL_FUNNELS", "-1"))
    est_files = (max(1, n_pages // fused_batch)) * (n_parts + node_n_parts)
    funnels = None
    if env_funnels != 0 and (env_funnels > 0 or est_files > 8192):
        funnels = create_spill_funnels(env_funnels if env_funnels > 0 else None)
        fused.funnels = funnels
    try:
        counts = docs.map_batches(
            fused, batch_format="pyarrow", batch_size=fused_batch
        ).take_all()
    finally:
        if funnels:
            close_spill_funnels(funnels)
    rows_in = {
        "node_rows": int(sum(r["node_rows"] for r in counts)),
        "edge_rows": int(sum(r["edge_rows"] for r in counts)),
    }
    nodes_stats = _merge_node_spills(node_spill_dir, out_dir, node_n_parts)
    shutil.rmtree(node_spill_dir, ignore_errors=True)
    nodes_stats["rows_in"] = rows_in["node_rows"]
    t1 = time.time()

    fp = _materialize_fingerprint(out_dir, mapping, layout=(cuts, n_parts))
    t_fp = time.time()
    edges_done = {
        pid: m
        for pid, m in mfst.completed_partitions(out_dir, "edges").items()
        if m.get("metrics", {}).get("fingerprint") == fp
    }
    edges_stats = merge_spilled(
        spill_dir, out_dir, "edges",
        sort_keys=["subj_node", "pred", "obj_node"], n_parts=n_parts,
        done=edges_done, fingerprint=fp,
    )
    t2 = time.time()

    for stage in ("nodes", "edges"):
        os.makedirs(os.path.join(out_dir, stage), exist_ok=True)
        with open(os.path.join(out_dir, stage, "_SUCCESS"), "w", encoding="utf-8") as f:
            json.dump({"stage": stage}, f)
    return {
        "nodes": nodes_stats, "edges": edges_stats,
        "phase_seconds": {
            "cuts_sample": round(t0 - t_s, 2),
            "fused_pass_and_nodes": round(t1 - t0, 2),
            "fingerprint": round(t_fp - t1, 2),
            "edges_merge": round(t2 - t_fp, 2),
        },
    }


# --- join-based map-back (scale path) ----------------------------------------

def _boundary_sample(mapping_ds, n_map: int, target: int = 100_000) -> list[str]:
    """Deterministic bounded sample of canonical node keys for range cuts.

    canonical_id is a uniform 63-bit hash, so ``cid % rate == 0`` is a
    deterministic, data-dependent ~1/rate sample; the driver holds only the
    sample, never the mapping."""
    import ray

    rate = max(1, n_map // target)

    def _s(b: pa.Table) -> pa.Table:
        cids = b.column("canonical_id").to_pylist()
        keep = sorted({f"coref_{c}" for c in cids if c % rate == 0})
        return pa.table({"key": pa.array(keep, pa.string())})

    keys: set[str] = set()
    for ref in mapping_ds.map_batches(_s, batch_format="pyarrow").to_arrow_refs():
        keys.update(ray.get(ref).column("key").to_pylist())
    return sorted(keys)


def _lookup_dataset(mapping_ds):
    """mapping Dataset -> endpoint-lookup Dataset (jk, cid, cname).

    Two key families, matching the broadcast path's two dicts:
      'T\\x00<type>\\x00<surface>' — exact (type, surface) lookup
        (CanonicalMapper / EdgeRows.lookup analog);
      'U\\x00<surface>'            — untyped endpoint resolution for event
        triples, min PER>ORG>LOC priority per surface
        (EdgeRows.kb_free_lookup analog; priorities are unique per surface,
        so groupby-min reproduces the dict exactly).
    """
    from ray.data.aggregate import Min

    prio = {"PER": 0, "ORG": 1, "LOC": 2}

    def _typed(b: pa.Table) -> pa.Table:
        ts = b.column("entity_type").to_pylist()
        ss = b.column("norm_surface").to_pylist()
        return pa.table(
            {
                "jk": pa.array(
                    [f"T\x00{t}\x00{s}" for t, s in zip(ts, ss)], pa.string()
                ),
                "cid": pc.cast(b.column("canonical_id"), pa.int64()),
                "cname": b.column("canonical_name"),
            }
        )

    def _untyped_pre(b: pa.Table) -> pa.Table:
        ts = b.column("entity_type").to_pylist()
        ss = b.column("norm_surface").to_pylist()
        cids = b.column("canonical_id").to_pylist()
        cnames = b.column("canonical_name").to_pylist()
        return pa.table(
            {
                "jk": pa.array([f"U\x00{s}" for s in ss], pa.string()),
                "val": pa.array(
                    [
                        f"{prio.get(t, 9)}\x00{cid:020d}\x00{cn}"
                        for t, cid, cn in zip(ts, cids, cnames)
                    ],
                    pa.string(),
                ),
            }
        )

    def _untyped_post(b: pa.Table) -> pa.Table:
        col = "min(val)" if "min(val)" in b.column_names else "val"
        vals = [v.split("\x00", 2) for v in b.column(col).to_pylist()]
        return pa.table(
            {
                "jk": b.column("jk"),
                "cid": pa.array([int(v[1]) for v in vals], pa.int64()),
                "cname": pa.array([v[2] for v in vals], pa.string()),
            }
        )

    typed = mapping_ds.map_batches(_typed, batch_format="pyarrow")
    untyped = (
        mapping_ds.map_batches(_untyped_pre, batch_format="pyarrow")
        .groupby("jk")
        .aggregate(Min("val"))
        .map_batches(_untyped_post, batch_format="pyarrow")
    )
    return typed.union(untyped).materialize()


_CANON_LABEL = {"per": "PER", "org": "ORG", "loc": "LOC"}


def _node_partials(batch: pa.Table) -> pa.Table:
    """docs batch -> per-block pre-aggregated mention partials keyed for the
    mapping join: (jk, label, norm_surface, kb_id, n, first_seen). The
    per-block combiner is what keeps hot surfaces from flooding the join."""
    m = _explode(batch.select(["url", "mentions"]), "mentions", ["url"])
    labels = m.column("label").to_pylist()
    norms = m.column("norm_surface").to_pylist()
    kbs = m.column("kb_id").to_pylist()
    starts = m.column("start").to_pylist()
    agg: dict[tuple, list] = {}
    for lab, s, kb, start in zip(labels, norms, kbs, starts):
        if lab == "PRON":
            continue
        key = (lab, s, kb)
        cur = agg.get(key)
        if cur is None:
            agg[key] = [1, start]
        else:
            cur[0] += 1
            if start < cur[1]:
                cur[1] = start
    keys = sorted(agg)
    return pa.table(
        {
            "jk": pa.array(
                [f"T\x00{canon.type_group(k[0])}\x00{k[1]}" for k in keys],
                pa.string(),
            ),
            "label": pa.array([k[0] for k in keys], pa.string()),
            "norm_surface": pa.array([k[1] for k in keys], pa.string()),
            "kb_id": pa.array([k[2] for k in keys], pa.string()),
            "n": pa.array([agg[k][0] for k in keys], pa.int64()),
            "first_seen": pa.array([agg[k][1] for k in keys], pa.int64()),
        }
    )


def _node_rows_post(batch: pa.Table) -> pa.Table:
    """joined partials -> node rows (hash fallback for unmapped surfaces)."""
    labels = batch.column("label").to_pylist()
    norms = batch.column("norm_surface").to_pylist()
    kbs = batch.column("kb_id").to_pylist()
    cids = batch.column("m_cid").to_pylist()
    cnames = batch.column("m_cname").to_pylist()
    for i, cid in enumerate(cids):
        if cid is None:
            cids[i] = canon.canonical_hash(canon.type_group(labels[i]), norms[i])
            cnames[i] = norms[i]
    node_ids = _node_id_col(labels, norms, kbs, cids)
    return pa.table(
        {
            "node_id": pa.array(node_ids, pa.string()),
            "node_type": pa.array(labels, pa.string()),
            "name": pa.array(cnames, pa.string()),
            "mentions_count": batch.column("n"),
            "first_seen": batch.column("first_seen"),
        }
    )


def _edge_rows_jk(batch: pa.Table) -> pa.Table:
    """docs batch -> exploded triples with join keys for both endpoints."""
    t = _explode(batch.select(["url", "triples"]), "triples", ["url"])

    def _jk_cols(texts, labels):
        jks, labs, norms = [], [], []
        for text, l in zip(texts, labels):
            lab = _CANON_LABEL.get(l.lower(), l)
            s = normalize_entity_name(text)
            labs.append(lab)
            norms.append(s)
            jks.append(
                f"T\x00{lab}\x00{s}" if lab in _NER_LABELS else f"U\x00{s}"
            )
        return jks, labs, norms

    sjk, slab, snorm = _jk_cols(
        t.column("subj").to_pylist(), t.column("subj_label").to_pylist()
    )
    ojk, olab, onorm = _jk_cols(
        t.column("obj").to_pylist(), t.column("obj_label").to_pylist()
    )
    return pa.table(
        {
            "subj": t.column("subj"),
            "pred": t.column("pred"),
            "obj": t.column("obj"),
            "conf": t.column("conf"),
            "source": t.column("source"),
            "url": t.column("url"),
            "subj_jk": pa.array(sjk, pa.string()),
            "subj_lab": pa.array(slab, pa.string()),
            "subj_norm": pa.array(snorm, pa.string()),
            "obj_jk": pa.array(ojk, pa.string()),
            "obj_lab": pa.array(olab, pa.string()),
            "obj_norm": pa.array(onorm, pa.string()),
        }
    )


def _endpoint_ids(jks, labs, norms, cids) -> list[str]:
    out = []
    for jk, lab, s, cid in zip(jks, labs, norms, cids):
        if cid is not None:
            out.append(f"coref_{cid}")
        elif jk.startswith("T\x00"):
            out.append(f"coref_{canon.canonical_hash(lab, s)}")
        elif lab:
            out.append(f"{lab.lower()}:{s.replace(' ', '_')}")
        else:
            out.append(f"text:{s.replace(' ', '_')}")
    return out


def _edge_rows_post(batch: pa.Table) -> pa.Table:
    subj_node = _endpoint_ids(
        batch.column("subj_jk").to_pylist(),
        batch.column("subj_lab").to_pylist(),
        batch.column("subj_norm").to_pylist(),
        batch.column("s_cid").to_pylist(),
    )
    obj_node = _endpoint_ids(
        batch.column("obj_jk").to_pylist(),
        batch.column("obj_lab").to_pylist(),
        batch.column("obj_norm").to_pylist(),
        batch.column("o_cid").to_pylist(),
    )
    return pa.table(
        {
            "subj": batch.column("subj"),
            "pred": batch.column("pred"),
            "obj": batch.column("obj"),
            "subj_node": pa.array(subj_node, pa.string()),
            "obj_node": pa.array(obj_node, pa.string()),
            "conf": batch.column("conf"),
            "source": batch.column("source"),
            "url": batch.column("url"),
        }
    )


_NODE_FAM_COLS = ["jk", "label", "norm_surface", "kb_id", "n", "first_seen"]
_EDGE_FAM_COLS = [
    "subj", "pred", "obj", "conf", "source", "url",
    "subj_jk", "subj_lab", "subj_norm", "obj_jk", "obj_lab", "obj_norm",
]


def _fused_families(batch: pa.Table) -> pa.Table:
    """ONE pass over a docs block -> union-schema table carrying BOTH spill
    families: fam='n' rows are pre-aggregated node partials (mentions
    explode), fam='e' rows are triples with endpoint join keys. Downstream
    filters split the materialized combined Dataset, so the docs parquet is
    read and exploded exactly once (the joined-path analog of the broadcast
    path's FusedMaterialize side spills)."""
    nodes = _node_partials(batch)
    edges = _edge_rows_jk(batch)
    all_cols = _NODE_FAM_COLS + _EDGE_FAM_COLS
    types = {c: nodes.schema.field(c).type for c in _NODE_FAM_COLS}
    types.update({c: edges.schema.field(c).type for c in _EDGE_FAM_COLS})

    def pad(t: pa.Table, fam: str) -> pa.Table:
        cols = {"fam": pa.array([fam] * t.num_rows, pa.string())}
        for c in all_cols:
            cols[c] = (
                t.column(c) if c in t.column_names else pa.nulls(t.num_rows, types[c])
            )
        return pa.table(cols)

    return pa.concat_tables([pad(nodes, "n"), pad(edges, "e")])


def _run_materialize_joined(out_dir: str, mapping_ds) -> dict:
    """Partitioned hash-join map-back: no per-actor dict of the mapping, no
    driver materialization of mapping or boundary set. ONE fused pass over
    the (column-pruned) docs parquet emits both node partials and keyed
    triples into a combined materialized Dataset (object-store resident,
    spillable); the node and edge branches filter their family out and join
    against the mapping-derived lookup Dataset."""
    from ray.data.aggregate import Min, Sum

    from ..state.writer import write_sorted

    register_for_ray()
    mapping_ds = mapping_ds.materialize()
    n_map = mapping_ds.count()
    njoin = min(64, max(2, n_map // 100_000 + 2))
    # partition count derives from DATA VOLUME only (never cluster size):
    # the layout — and therefore the output files and any resumed partition's
    # validity — must be identical across cluster resizes (same rule as the
    # broadcast path's _sample_edge_cuts)
    n_parts = min(256, max(8, n_map // 50_000 + 1))
    boundary = _boundary_sample(mapping_ds, n_map)
    lookup = _lookup_dataset(mapping_ds)
    fp = _materialize_fingerprint(out_dir, mapping_ds, layout=(boundary, n_parts))

    docs = docs_dataset(out_dir, columns=["url", "mentions", "triples"])
    combined = docs.map_batches(_fused_families, batch_format="pyarrow").materialize()

    # --- nodes ---
    partials = combined.filter(expr="fam == 'n'").map_batches(
        lambda b: b.select(_NODE_FAM_COLS), batch_format="pyarrow"
    )
    lookup_n = lookup.map_batches(
        lambda b: pa.table(
            {"njk": b.column("jk"), "m_cid": b.column("cid"), "m_cname": b.column("cname")}
        ),
        batch_format="pyarrow",
    )
    joined = partials.join(
        lookup_n, join_type="left_outer", num_partitions=njoin,
        on=("jk",), right_on=("njk",),
    )
    node_rows = joined.map_batches(_node_rows_post, batch_format="pyarrow")
    nodes = node_rows.groupby("node_id").aggregate(
        Min("node_type"), Min("name"), Sum("mentions_count"), Min("first_seen")
    )

    def _rename(b: pa.Table) -> pa.Table:
        names = {
            "min(node_type)": "node_type", "min(name)": "name",
            "sum(mentions_count)": "mentions_count", "min(first_seen)": "first_seen",
        }
        return b.rename_columns([names.get(c, c) for c in b.column_names])

    nodes = nodes.map_batches(_rename, batch_format="pyarrow")
    nodes_stats = write_sorted(
        nodes, out_dir, "nodes",
        sort_keys=["node_id"], boundary_keys=boundary, num_partitions=n_parts,
        resume=False, fingerprint=fp,
    )

    # --- edges ---
    trip = combined.filter(expr="fam == 'e'").map_batches(
        lambda b: b.select(_EDGE_FAM_COLS), batch_format="pyarrow"
    )
    lookup_s = lookup.map_batches(
        lambda b: pa.table({"sjk": b.column("jk"), "s_cid": b.column("cid")}),
        batch_format="pyarrow",
    )
    lookup_o = lookup.map_batches(
        lambda b: pa.table({"ojk": b.column("jk"), "o_cid": b.column("cid")}),
        batch_format="pyarrow",
    )
    j1 = trip.join(
        lookup_s, join_type="left_outer", num_partitions=njoin,
        on=("subj_jk",), right_on=("sjk",),
    )
    j2 = j1.join(
        lookup_o, join_type="left_outer", num_partitions=njoin,
        on=("obj_jk",), right_on=("ojk",),
    )
    edges = j2.map_batches(_edge_rows_post, batch_format="pyarrow")
    edges_stats = write_sorted(
        edges, out_dir, "edges",
        sort_keys=["subj_node", "pred", "obj_node"],
        boundary_keys=boundary, num_partitions=n_parts,
        resume=True, fingerprint=fp,
    )

    for stage in ("nodes", "edges"):
        os.makedirs(os.path.join(out_dir, stage), exist_ok=True)
        with open(os.path.join(out_dir, stage, "_SUCCESS"), "w", encoding="utf-8") as f:
            json.dump({"stage": stage}, f)
    return {"nodes": nodes_stats, "edges": edges_stats}


def run_kg_pipeline(
    pages_dir: str,
    out_dir: str,
    *,
    resume: bool = True,
    mode: str = canon.MODE_CDCR,
    max_driver_surfaces: int = DRIVER_SURFACE_MAX,
    coref_strategy: str = "cli",
) -> dict:
    t0 = time.time()
    s_extract = run_extract_stage(
        pages_dir, out_dir, resume=resume, coref_strategy=coref_strategy
    )
    t1 = time.time()
    mapping = run_canonicalize_stage(
        out_dir, mode=mode, resume=resume, max_driver_surfaces=max_driver_surfaces
    )
    t2 = time.time()
    s_mat = run_materialize_stage(out_dir, mapping)
    t3 = time.time()
    stats = {
        "extract": s_extract,
        "canonical_surfaces": (
            mapping.num_rows if isinstance(mapping, pa.Table) else mapping.count()
        ),
        "materialize": s_mat,
        "stage_seconds": {
            "extract": round(t1 - t0, 2),
            "canonicalize": round(t2 - t1, 2),
            "materialize": round(t3 - t2, 2),
        },
        "seconds": t3 - t0,
    }
    with open(os.path.join(out_dir, "run_stats.json"), "w", encoding="utf-8") as f:
        json.dump(stats, f, indent=1)
    return stats


def main() -> None:
    import argparse

    import ray

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pages", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--mode", default=canon.MODE_CDCR, choices=[canon.MODE_CDCR, canon.MODE_COALESCE])
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument(
        "--coref", default="cli", choices=["cli", "simple"],
        help="within-doc coref strategy: cli = C1 rule-based (reference "
        "pipeline default), simple = C2 SimpleCorefResolver",
    )
    ap.add_argument(
        "--max-driver-surfaces", type=int, default=DRIVER_SURFACE_MAX,
        help="distinct-surface count above which the fully distributed "
        "canonicalize + join map-back path is used (set 0 to force it)",
    )
    args = ap.parse_args()

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
        )
    stats = run_kg_pipeline(
        args.pages, args.out, resume=not args.no_resume, mode=args.mode,
        max_driver_surfaces=args.max_driver_surfaces,
        coref_strategy=args.coref,
    )
    print(json.dumps(stats))
    ray.shutdown()


if __name__ == "__main__":
    main()
