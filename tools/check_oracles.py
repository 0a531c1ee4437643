"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry at the given sf_dir, converts the result to
pandas, and (where an oracle exists) compares against DuckDB on row count,
column-name set, and order-insensitive value equality with column names
sorted — mirroring the driver's CORRECTNESS check.

Usage: PYTHONPATH=/root/repo python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def to_pandas(res):
    import pandas as pd
    import pyarrow as pa

    try:
        import ray.data

        if isinstance(res, ray.data.Dataset):
            return res.to_pandas()
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        return res.to_pandas()
    if isinstance(res, pd.DataFrame):
        return res
    raise TypeError(type(res))


def norm_frame(df):
    import pandas as pd

    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    # normalize float formatting
    for c in df.columns:
        if str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
        if str(df[c].dtype).startswith("uint"):
            df[c] = df[c].astype("int64", errors="ignore")
    return df


def main() -> int:
    import duckdb

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, log_to_driver=False)

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = norm_frame(to_pandas(fn(sf_dir)))
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            continue
        dt = time.time() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"rows  {name}: {len(mine)} rows ({dt:.1f}s) [rows-only check]")
            continue
        want = norm_frame(con.execute(sql).fetchdf())
        ok_cols = list(mine.columns) == list(want.columns)
        ok_rows = len(mine) == len(want)
        ok_vals = False
        detail = ""
        if ok_cols and ok_rows:
            try:
                import pandas.testing as pdt

                pdt.assert_frame_equal(
                    mine, want, check_dtype=False, check_exact=False, rtol=1e-6, atol=1e-6
                )
                ok_vals = True
            except AssertionError as e:
                ok_vals = False
                detail = str(e).split("\n")[0]
        if ok_cols and ok_rows and ok_vals:
            print(f"OK    {name}: {len(mine)} rows ({dt:.1f}s)")
        else:
            failures.append(name)
            print(
                f"FAIL  {name}: cols={ok_cols} rows={ok_rows}({len(mine)}vs{len(want)}) vals={ok_vals}"
            )
            if not ok_cols:
                print(f"      mine: {list(mine.columns)}  want: {list(want.columns)}")
            elif not ok_vals:
                print(f"      {detail}")
                print("      mine:", mine.head(3).to_dict("records"))
                print("      want:", want.head(3).to_dict("records"))
    # cross-table consistency oracles over the pinned KG goldens (pure SQL;
    # semantic invariants BETWEEN tables that a per-table readback can't see)
    for name, sql in getattr(entrymod, "consistency_sql", dict)().items():
        if only and name not in only:
            continue
        row = con.execute(sql).fetchall()[0]
        if row[1] is True:
            print(f"OK    [consistency] {name}")
        else:
            failures.append(name)
            print(f"FAIL  [consistency] {name}: {row}")
    print("FAILURES:", failures if failures else "none")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
