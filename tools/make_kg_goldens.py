"""Generate the pinned end-to-end KG golden parquets for the oracle gate.

The per-operator stages (HTML extract, heuristic NER, events, relations,
coref C1/C2) are each verified char/span-exact against the COMPILED
reference harnesses in /tmp (tools/build_ref_harnesses.py); this script runs
the full verified chain ONCE over the deterministic 500-page sf0.01 corpus
(seed 42 — the exact corpus `queries()['kg_*']` builds at sf0.01) and pins
the end-to-end surface as parquet goldens under tests/golden/kg_oracle/.
The `oracle_sql()` entries for kg_mentions / kg_triples / kg_nodes /
kg_edges then read these files, turning the four KG-tail queries into full
row+schema+hash comparisons in the driver's correctness gate.

Regenerate (only after an INTENDED semantic change, with the differential
harness suite green):  PYTHONPATH=/root/repo python tools/make_kg_goldens.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLD_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden", "kg_oracle",
)


def main() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)

    from anno_ray.functions import docqueries as dq

    sf_dir = "/root/testdata/sf0.01"
    os.makedirs(GOLD_DIR, exist_ok=True)
    for name, fn in [
        ("kg_mentions", dq.kg_mentions),
        ("kg_triples", dq.kg_triples),
        ("kg_nodes", dq.kg_nodes),
        ("kg_edges", dq.kg_edges),
    ]:
        res = fn(sf_dir)
        if not isinstance(res, pa.Table):
            res = pa.concat_tables(
                [ray.get(r) for r in res.to_arrow_refs()],
                promote_options="permissive",
            )
        path = os.path.join(GOLD_DIR, f"{name}.parquet")
        pq.write_table(res, path)
        print(f"{name}: {res.num_rows} rows -> {path}")
    ray.shutdown()


if __name__ == "__main__":
    main()
