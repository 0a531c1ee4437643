"""Cross-table consistency gates over the pinned KG goldens.

The kg_* chain goldens (tests/golden/kg_oracle/) are determinism pins of the
verified pipeline output; these tests assert SEMANTIC invariants BETWEEN the
tables — the class of check a per-table readback can never provide. Pure
DuckDB over the committed parquet: no Ray session needed, so a golden re-pin
that silently breaks cross-table consistency fails the suite immediately.
SQL lives in ``__ray_entry__.consistency_sql()`` (also run by
tools/check_oracles.py) so the driver-visible tooling and the test suite
share one definition.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entrymod  # noqa: E402

GOLD = os.path.join(os.path.dirname(__file__), "golden", "kg_oracle")


@pytest.mark.parametrize("name", sorted(entrymod.consistency_sql()))
def test_consistency(name):
    import duckdb

    sql = entrymod.consistency_sql()[name]
    rows = duckdb.connect().execute(sql).fetchall()
    assert len(rows) == 1 and rows[0][0] == name
    assert rows[0][1] is True, f"cross-table invariant violated: {name}"


def test_pronoun_only_carveout_is_bounded():
    """The endpoint-integrity carve-out (coref_ ids absent from kg_nodes)
    must be exactly the pronoun-only clusters — a small fixed fraction of
    all coref endpoints. If a re-pin suddenly drops a large share of coref
    endpoints from the node table, that is a map-back regression the scoped
    invariant above would not catch on its own."""
    import duckdb

    con = duckdb.connect()
    present, total = con.execute(
        f"""
        SELECT SUM(CASE WHEN x IN (SELECT node_id FROM
                     read_parquet('{GOLD}/kg_nodes.parquet')) THEN 1 ELSE 0 END),
               COUNT(*)
        FROM (SELECT DISTINCT x FROM
                (SELECT subj_node AS x FROM read_parquet('{GOLD}/kg_edges.parquet')
                 UNION ALL
                 SELECT obj_node FROM read_parquet('{GOLD}/kg_edges.parquet'))
              WHERE x LIKE 'coref_%')
        """
    ).fetchone()
    assert total > 0
    # >= 90% of coref endpoints must resolve to node rows (pinned corpus:
    # 364/375; the 11 absentees are pronoun-only clusters)
    assert present / total >= 0.9, (present, total)
