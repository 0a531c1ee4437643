"""Corpus statistics + cluster ranking/filter operators (A1/A3/O2/D5).

- ``doc_stats``: per-document counters already computed by the extract stage
  rolled up corpus-wide (signals/tracks/negated counts, avg confidence) —
  the distributed analog of ``GroundedDocument::stats`` (grounded.rs:1633)
  + corpus rollups;
- ``cluster_importance``: per-canonical-cluster doc_count + mention_count
  (cdcr.rs:177-198);
- ``rank_clusters``: sort by (doc_count desc, size desc, name desc) +
  truncate (crossdoc.rs:509-520);
- ``filter_clusters``: min_cluster_size / cross_doc_only / type filters
  (crossdoc.rs:489-506).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..ray_utils import register_for_ray


def doc_stats(docs):
    """docs Dataset -> one-row corpus stats table."""
    from ray.data.aggregate import Count, Mean, Sum

    register_for_ray()
    out = docs.aggregate(
        Count(),
        Sum("n_mentions"),
        Sum("n_events"),
        Sum("n_chars"),
        Mean("n_mentions"),
    )
    import pandas as pd

    return pd.DataFrame(
        {
            "n_docs": [out["count()"]],
            "n_mentions": [out["sum(n_mentions)"]],
            "n_events": [out["sum(n_events)"]],
            "n_chars": [out["sum(n_chars)"]],
            "avg_mentions_per_doc": [round(out["mean(n_mentions)"], 4)],
        }
    )


def mention_stats(mentions):
    """mentions Dataset -> per-label counts + avg confidence + negated count."""
    from ray.data.aggregate import Count, Mean, Sum

    register_for_ray()

    def prep(b: pa.Table) -> pa.Table:
        neg = pc.cast(b.column("negated"), pa.int64())
        return pa.table(
            {
                "label": b.column("label"),
                "conf": b.column("conf"),
                "negated_i": neg,
            }
        )

    out = (
        mentions.map_batches(prep, batch_format="pyarrow")
        .groupby("label")
        .aggregate(Count(), Mean("conf"), Sum("negated_i"))
    )
    return out.map_batches(
        lambda b: b.rename_columns(
            [
                {
                    "count()": "n_mentions",
                    "mean(conf)": "avg_conf",
                    "sum(negated_i)": "n_negated",
                }.get(c, c)
                for c in b.column_names
            ]
        ),
        batch_format="pyarrow",
    )


def cluster_importance(mentions_with_canonical):
    """mentions (with canonical_id/canonical_name attached) ->
    (canonical_id, canonical_name, entity_type, doc_count, mention_count).

    Two-level: per-block distinct (cluster, url) combiner, then exact
    distinct-doc counting in the groupby (cdcr.rs:177-198 semantics)."""
    register_for_ray()

    def preagg(b: pa.Table) -> pa.Table:
        seen: dict[tuple, list] = {}
        for cid, cname, lab, url in zip(
            b.column("canonical_id").to_pylist(),
            b.column("canonical_name").to_pylist(),
            b.column("label").to_pylist(),
            b.column("url").to_pylist(),
        ):
            key = (cid, url)
            cur = seen.get(key)
            if cur is None:
                seen[key] = [cname, lab, 1]
            else:
                cur[2] += 1
        keys = sorted(seen)
        return pa.table(
            {
                "canonical_id": pa.array([k[0] for k in keys], pa.int64()),
                "url": pa.array([k[1] for k in keys], pa.string()),
                "canonical_name": pa.array([seen[k][0] for k in keys], pa.string()),
                "entity_type": pa.array([seen[k][1] for k in keys], pa.string()),
                "mention_count": pa.array([seen[k][2] for k in keys], pa.int64()),
            }
        )

    from ray.data.aggregate import Count, Min, Sum

    per_doc = mentions_with_canonical.map_batches(preagg, batch_format="pyarrow")
    # second combine: (cluster, url) rows may repeat across blocks
    per_doc = (
        per_doc.groupby(["canonical_id", "url"])
        .aggregate(Min("canonical_name"), Min("entity_type"), Sum("mention_count"))
    )
    out = per_doc.map_batches(
        lambda b: b.rename_columns(
            [
                {
                    "min(canonical_name)": "canonical_name",
                    "min(entity_type)": "entity_type",
                    "sum(mention_count)": "mention_count",
                }.get(c, c)
                for c in b.column_names
            ]
        ),
        batch_format="pyarrow",
    )
    clusters = out.groupby("canonical_id").aggregate(
        Min("canonical_name"), Min("entity_type"), Count(), Sum("mention_count")
    )
    return clusters.map_batches(
        lambda b: b.rename_columns(
            [
                {
                    "min(canonical_name)": "canonical_name",
                    "min(entity_type)": "entity_type",
                    "count()": "doc_count",
                    "sum(mention_count)": "mention_count",
                }.get(c, c)
                for c in b.column_names
            ]
        ),
        batch_format="pyarrow",
    )


def rank_clusters(clusters, max_clusters: int = 20):
    """Sort by (doc_count desc, mention_count desc, name desc) + truncate
    (crossdoc.rs:509-520)."""
    return clusters.sort(
        ["doc_count", "mention_count", "canonical_name"],
        descending=[True, True, True],
    ).limit(max_clusters)


def filter_clusters(
    clusters,
    *,
    min_cluster_size: int = 0,
    cross_doc_only: bool = False,
    entity_type: str | None = None,
):
    """min size / cross-doc / type filters (crossdoc.rs:489-506)."""
    register_for_ray()

    def flt(b: pa.Table) -> pa.Table:
        mask = pc.greater_equal(b.column("mention_count"), pa.scalar(min_cluster_size))
        if cross_doc_only:
            mask = pc.and_(mask, pc.greater(b.column("doc_count"), pa.scalar(1)))
        if entity_type is not None:
            mask = pc.and_(
                mask, pc.equal(b.column("entity_type"), pa.scalar(entity_type))
            )
        return b.filter(mask)

    return clusters.map_batches(flt, batch_format="pyarrow")


def sample_docs(ds, fraction: float = 0.1, seed: int = 42):
    """Seeded random sample (O4; the eval-sampling analog)."""
    register_for_ray()
    return ds.random_sample(fraction, seed=seed)
