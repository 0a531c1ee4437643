"""Pin deterministic rows-only queries as parquet goldens for the oracle gate.

Complement to tools/make_kg_goldens.py: the similarity / dedup / eval / model
queries are fully deterministic (seeded hyperplanes, FNV-1a minhash, fixed
fixtures, fake scorers) but not SQL-expressible, so the driver's gate only
recorded a rows-only check for them.  This script runs each candidate TWICE
in the same session, pins it as a golden parquet under
tests/golden/op_oracle/ ONLY if the two runs match exactly (order-insensitive,
all columns stringified — the driver's comparison), and prints a summary.
``oracle_sql()`` then serves ``SELECT * FROM read_parquet(<golden>)`` so the
driver records a full row+schema+hash comparison.

Regenerate only after an INTENDED semantic change:
    PYTHONPATH=/root/repo python tools/make_op_goldens.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLD_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden", "op_oracle",
)

# Deterministic non-SQL queries worth pinning.  The two approximate ANN
# variants are pinned as determinism regressions on top of their more
# meaningful recall-vs-exact gates (tests/test_ops_misc.py); the already
# true-SQL-oracled queries (lang_detect_distribution etc.) are excluded.
CANDIDATES = [
    "ann_lsh_topk",
    "ann_ivf_topk",
    "minhash_near_dups",
    "simhash_near_dups",
    "embedding_near_dups",
    "minhash_dedup_keep",
    "multimodal_decode",
    "multimodal_real_decode",
    "audio_mfcc_frames",
    "distinct_counts_hll",
    "eval_ner_modes",
    "bert_ner_mentions",
    "coref_quality",
    "kg_clusters",
    "kg_communities",
]


def _to_table(res):
    import pyarrow as pa
    import ray

    if isinstance(res, pa.Table):
        return res
    import pandas as pd

    if isinstance(res, pd.DataFrame):
        return pa.Table.from_pandas(res, preserve_index=False)
    return pa.concat_tables(
        [ray.get(r) for r in res.to_arrow_refs()], promote_options="permissive"
    )


def _norm(tbl):
    """Driver-comparison view: columns sorted by name, rows sorted, str values."""
    df = tbl.to_pandas().astype(str)
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> None:
    import pyarrow.parquet as pq
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)

    import __ray_entry__ as entry

    qs = entry.queries()
    sf_dir = "/root/testdata/sf0.01"
    os.makedirs(GOLD_DIR, exist_ok=True)
    only = set(sys.argv[1:])  # optional: pin just the named queries
    pinned, skipped = [], []
    for name in CANDIDATES:
        if only and name not in only:
            continue
        t1 = _to_table(qs[name](sf_dir))
        t2 = _to_table(qs[name](sf_dir))
        if _norm(t1).equals(_norm(t2)):
            path = os.path.join(GOLD_DIR, f"{name}.parquet")
            pq.write_table(t1, path)
            pinned.append(name)
            print(f"PINNED  {name}: {t1.num_rows} rows -> {path}")
        else:
            skipped.append(name)
            print(f"SKIP    {name}: double-run mismatch (NOT deterministic)")
    print(f"pinned={len(pinned)} skipped={skipped}")
    ray.shutdown()


if __name__ == "__main__":
    main()
