"""Scale proof for the distributed canonicalization path.

Synthesizes N distinct (type, surface) keys AS A DATASET (never on the
driver), with embedded fuzzy families (name variants that LSH must bucket
together), then runs the exact scale path the KG pipeline uses above
DRIVER_SURFACE_MAX:

    fuzzy_edges(banded groupby)  ->  build_canonical_map_distributed
    (min-label propagation + pointer doubling)  ->  mapping parquet

and reports wall time per stage + DRIVER peak RSS, which must stay bounded
(the whole point: at 10^8-10^9 CC surfaces the driver can never hold the
surface table).

    python tools/bench_scale_canonical.py --surfaces 10000000 --num-cpus 32
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


FIRST = ["acme", "globex", "initech", "umbrella", "stark", "wayne", "tyrell",
         "cyberdyne", "aperture", "hooli", "pied", "vandelay", "wonka",
         "oceanic", "gringotts"]
SECOND = ["corp", "inc", "ltd", "gmbh", "labs", "systems", "holdings",
          "industries", "partners", "group"]
VARIANTS = ["", " corporation", " international", " co"]


def surfaces_dataset(n: int):
    """N distinct surfaces; every 8th key is a fuzzy variant of a base key
    (same family index), so the LSH pass has real merge work to do."""
    import pyarrow as pa
    import ray.data

    def gen(batch):
        ids = batch["id"]
        types, surfs = [], []
        for i in ids:
            i = int(i)
            fam = i // 8
            # fixed-width family token: equal-length tokens can't be proper
            # substrings of each other, so fuzzy similarity stays WITHIN a
            # family (components of <=8) — the realistic NER-surface regime,
            # not one giant substring-chained component
            base = (
                f"{FIRST[fam % len(FIRST)]} "
                f"{SECOND[(fam // len(FIRST)) % len(SECOND)]} f{fam:09d} g{fam:09d}"
            )
            if i % 8 == 0:
                s = base
            elif i % 8 == 1:
                s = base + VARIANTS[1 + (fam % 3)]
            else:
                # variant token carries the family id so cross-family word
                # overlap stays at {FIRST, SECOND} = 2 of ~8 (Jaccard 0.25,
                # below the 0.5 gate) — merges happen WITHIN families only
                s = f"{base} u{fam % 100000:05d}{i % 8}"
            types.append("ORG")
            surfs.append(s)
        return pa.table(
            {
                "entity_type": pa.array(types, pa.string()),
                "norm_surface": pa.array(surfs, pa.string()),
            }
        )

    return ray.data.range(n).map_batches(gen, batch_format="numpy")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--surfaces", type=int, default=10_000_000)
    ap.add_argument("--num-cpus", type=int, default=32)
    ap.add_argument("--out", default="/tmp/anno_scale_canonical")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, log_to_driver=False)

    from anno_ray.stages import canonicalize as canon

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024  # MiB

    t0 = time.time()
    surfaces = surfaces_dataset(args.surfaces).materialize()
    n = surfaces.count()
    t_gen = time.time() - t0

    t0 = time.time()
    # force the distributed banded path regardless of count
    edges = canon.fuzzy_edges(surfaces, mode=canon.MODE_CDCR, max_task_surfaces=0)
    edges = edges.materialize()
    n_edges = edges.count()
    t_edges = time.time() - t0

    t0 = time.time()
    mapping = canon.build_canonical_map_distributed(
        surfaces, edges, as_dataset=True
    )
    import shutil

    shutil.rmtree(args.out, ignore_errors=True)
    mapping.write_parquet(args.out)
    t_cc = time.time() - t0

    import ray.data

    mapping_rows = ray.data.read_parquet(args.out).count()
    merged = ray.data.read_parquet(args.out).filter(
        expr="norm_surface != canonical_name"
    ).count()

    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
    print(
        json.dumps(
            {
                "metric": "canonicalize_scale_path",
                "surfaces": n,
                "edges": n_edges,
                "mapping_rows": mapping_rows,
                "merged_surfaces": merged,
                "gen_sec": round(t_gen, 1),
                "edges_sec": round(t_edges, 1),
                "cc_sec": round(t_cc, 1),
                "total_sec": round(t_gen + t_edges + t_cc, 1),
                "driver_rss_start_mb": rss0,
                "driver_rss_peak_mb": rss1,
                "num_cpus": args.num_cpus,
            }
        )
    )
    assert mapping_rows == n, (mapping_rows, n)
    ray.shutdown()


if __name__ == "__main__":
    main()
