"""Flagship KG-construction pipeline: pages parquet -> canonical node/edge parquet.

Stages (all Ray Data, streaming):

  A. extract   — per input-file shards: read pages (column-pruned), run the
                 fused extract kernel, write ``out/docs/part=<k>`` + manifest.
                 TRUE per-partition resume: completed shards are skipped.
  B. canonical — mentions -> distinct surfaces (combiner + small groupby) ->
                 LSH fuzzy edges -> union-find -> surface->canonical mapping
                 (broadcast).
  C. materialize — canonicalized nodes (dedup by node_id with count/min
                 aggregation) and edges (triples with canonical endpoint ids),
                 globally sorted, written as parquet + per-file manifests.

Run:  python -m anno_ray.pipelines.kg --pages <dir> --out <dir> [--resume]
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
from ..stages.extract import extract_batch

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

    def __init__(self, out_dir: str):
        self.out_dir = out_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        paths = batch.column("path").to_pylist()
        pids = batch.column("pid").to_pylist()
        rows = []
        for path, pid in zip(paths, pids):
            t0 = time.time()
            table = pq.read_table(path, columns=_PAGE_COLUMNS)
            out_parts = []
            n = table.num_rows
            step = 64
            for s in range(0, n, step):
                out_parts.append(extract_batch(table.slice(s, min(step, n - s))))
            docs = (
                pa.concat_tables(out_parts)
                if out_parts
                else extract_batch(table)
            )
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
                },
            )
            rows.append({"pid": pid, "pages": n})
        return pa.table(
            {
                "pid": pa.array([r["pid"] for r in rows], pa.string()),
                "pages": pa.array([r["pages"] for r in rows], pa.int64()),
            }
        )


def run_extract_stage(
    pages_dir: str, out_dir: str, *, resume: bool = True, concurrency: int | None = None
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
        pending, skipped = mf.pending_inputs(out_dir, "docs", files, None)
    else:
        pending, skipped = files, []

    if pending:
        items = [{"path": p, "pid": _shard_pid(p)} for p in pending]
        shards = ray.data.from_items(items)
        res = shards.map_batches(
            ExtractShard,
            fn_constructor_args=(out_dir,),
            batch_size=1,
            batch_format="pyarrow",
            concurrency=concurrency or (2, 32),
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


def run_canonicalize_stage(
    out_dir: str, *, mode: str = canon.MODE_CDCR, resume: bool = True
) -> pa.Table:
    """Stage B: mentions -> canonical mapping table (persisted + resumable:
    when the docs stage is unchanged since the last run, the saved mapping is
    reused instead of recomputing the shuffle)."""
    import pyarrow.parquet as pq

    from ..stages.extract import mentions_table

    mdir = os.path.join(out_dir, "canonical")
    fp = _docs_fingerprint(out_dir)
    meta_path = os.path.join(mdir, "_manifest.json")
    map_path = os.path.join(mdir, "mapping.parquet")
    if resume and os.path.exists(meta_path) and os.path.exists(map_path):
        try:
            with open(meta_path, encoding="utf-8") as f:
                meta = json.load(f)
            if meta.get("docs_fingerprint") == fp and meta.get("mode") == mode:
                return pq.read_table(map_path)
        except (json.JSONDecodeError, OSError):
            pass

    # prune at the read: only url + the mentions column leave storage
    docs = docs_dataset(out_dir, columns=["url", "mentions"])
    mentions = mentions_table(docs)

    # only PER/ORG/LOC surfaces participate in cross-doc clustering
    def _ner_only(b: pa.Table) -> pa.Table:
        mask = pc.is_in(b.column("label"), value_set=pa.array(["PER", "ORG", "LOC"]))
        return b.filter(mask)

    ner = mentions.map_batches(_ner_only, batch_format="pyarrow")
    surfaces_ds = canon.surface_groups(ner, type_col="label", surface_col="norm_surface")
    # collect the (small) distinct-surface table ONCE; both the edge pass and
    # the merge consume it, avoiding a second execution of the explode+groupby
    surfaces_ds = surfaces_ds.materialize()
    surfaces = canon.collect_surfaces(surfaces_ds)
    try:  # persist ds.stats() for the wide stage (observability)
        os.makedirs(mdir, exist_ok=True)
        with open(os.path.join(mdir, "_ray_stats.txt"), "w", encoding="utf-8") as f:
            f.write(surfaces_ds.stats())
    except Exception:
        pass
    edges = canon.fuzzy_edges(surfaces, mode=mode)
    mapping = canon.build_canonical_map(surfaces, edges)

    os.makedirs(mdir, exist_ok=True)
    pq.write_table(mapping, map_path)
    with open(meta_path, "w", encoding="utf-8") as f:
        json.dump({"docs_fingerprint": fp, "mode": mode, "rows": mapping.num_rows}, f)
    return mapping


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

    def __call__(self, batch: pa.Table) -> pa.Table:
        subjs = batch.column("subj").to_pylist()
        objs = batch.column("obj").to_pylist()
        subj_labels = batch.column("subj_label").to_pylist()
        obj_labels = batch.column("obj_label").to_pylist()

        canon_label = {"per": "PER", "org": "ORG", "loc": "LOC"}
        src_ids = [
            self._endpoint(s, canon_label.get(l.lower(), l)) for s, l in zip(subjs, subj_labels)
        ]
        dst_ids = [
            self._endpoint(o, canon_label.get(l.lower(), l)) for o, l in zip(objs, obj_labels)
        ]
        return pa.table(
            {
                "subj": pa.array(subjs, pa.string()),
                "pred": batch.column("pred"),
                "obj": pa.array(objs, pa.string()),
                "subj_node": pa.array(src_ids, pa.string()),
                "obj_node": pa.array(dst_ids, pa.string()),
                "conf": batch.column("conf"),
                "source": batch.column("source"),
                "url": batch.column("url"),
            }
        )


class FusedMaterialize:
    """ONE pass over docs blocks: explodes mentions -> node partial rows
    (returned) and triples -> canonical edges spilled by range partition
    (side output with retry-idempotent filenames). Halves the docs reads and
    removes a full dataset pass vs separate node/edge pipelines."""

    def __init__(self, mapping: pa.Table, cuts: list[str], spill_dir: str):
        import numpy as np

        self.node_fn = NodeRows(mapping)
        self.edge_fn = EdgeRows(mapping)
        self.cuts = np.array(cuts, dtype=object) if cuts else None
        self.spill_dir = spill_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..stages.extract import _explode
        from ..state.writer import spill_batch

        mentions = _explode(batch.select(["url", "mentions"]), "mentions", ["url"])
        node_partial = self.node_fn(mentions)
        triples = _explode(batch.select(["url", "triples"]), "triples", ["url"])
        edges = self.edge_fn(triples)
        spill_batch(edges, self.spill_dir, "subj_node", self.cuts, "url")
        return node_partial


def _materialize_fingerprint(out_dir: str, mapping: pa.Table) -> str:
    """Identifies the (docs, canonical mapping) generation an edges/nodes
    partition was derived from. A resumed run invalidates completed
    partitions whose recorded fingerprint differs — preventing a
    mixed-generation graph when docs or the mapping changed."""
    import hashlib

    h = hashlib.blake2b(digest_size=16)
    h.update(_docs_fingerprint(out_dir).encode())
    for col in ("entity_type", "norm_surface", "canonical_id"):
        for chunk in mapping.column(col).chunks:
            for v in chunk:
                h.update(str(v.as_py()).encode("utf-8", "replace"))
                h.update(b"\x00")
    return h.hexdigest()


def run_materialize_stage(out_dir: str, mapping: pa.Table) -> dict:
    """Stage C: sorted canonical node/edge parquet + manifests (fused pass)."""
    import shutil

    from ..state import manifests as mfst
    from ..state.writer import boundaries_from_keys, merge_spilled, write_sorted

    register_for_ray()
    boundary = sorted(
        f"coref_{cid}" for cid in set(mapping.column("canonical_id").to_pylist())
    )
    n_parts = max(1, min(64, len(boundary) // 64 + 1))
    cuts = boundaries_from_keys(boundary, n_parts)

    spill_dir = os.path.join(out_dir, "edges", "_spill")
    shutil.rmtree(spill_dir, ignore_errors=True)

    docs = docs_dataset(out_dir, columns=["url", "mentions", "triples"])
    fused = FusedMaterialize(mapping, cuts, spill_dir)
    node_rows = docs.map_batches(fused, batch_format="pyarrow")

    # nodes: small final combine + deterministic sorted write
    from ray.data.aggregate import Min, Sum

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
    # consuming `nodes` drives the fused pass (and hence the edge spills)
    nodes_stats = write_sorted(
        nodes, out_dir, "nodes",
        sort_keys=["node_id"], boundary_keys=boundary, num_partitions=n_parts,
        resume=False,
    )

    fp = _materialize_fingerprint(out_dir, mapping)
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
) -> dict:
    t0 = time.time()
    s_extract = run_extract_stage(pages_dir, out_dir, resume=resume)
    mapping = run_canonicalize_stage(out_dir, mode=mode, resume=resume)
    s_mat = run_materialize_stage(out_dir, mapping)
    stats = {
        "extract": s_extract,
        "canonical_surfaces": mapping.num_rows,
        "materialize": s_mat,
        "seconds": time.time() - t0,
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
    args = ap.parse_args()

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
        )
    stats = run_kg_pipeline(
        args.pages, args.out, resume=not args.no_resume, mode=args.mode
    )
    print(json.dumps(stats))
    ray.shutdown()


if __name__ == "__main__":
    main()
