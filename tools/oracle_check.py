"""Self-check: run every workloads.QUERIES entry against its DuckDB oracle
the way the driver does (row count + schema + order-insensitive values).

Usage: python3 tools/oracle_check.py [--window] [name ...]
  --window   check exactly the driver's gate window (first 50 entries);
             mutually exclusive with explicit names
  (no args)  check ALL registry entries, parked ones included
"""

from __future__ import annotations

import argparse
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from fspann_query_system_spark.session import get_spark          # noqa: E402
from fspann_query_system_spark.workloads import (QUERIES,        # noqa: E402
                                                 oracle_sql_map)

SF = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    """Dtype-sensitive canonical value, mirroring the driver's fetchdf-based
    hash: an int64 6 and a float64 6.0 must NOT compare equal (DuckDB
    sum(<integer>) -> HUGEINT -> float64 through fetchdf is exactly the drift
    this must catch; Python's 6.0 == 6 would mask it)."""
    if hasattr(v, "item"):          # numpy scalar -> python, keeping the class
        v = v.item()
    # Spark None and DuckDB NULL (float NaN through fetchdf) must land on
    # one sentinel: NaN != NaN would otherwise fail every comparison and
    # make the row sort order-fragile.
    if v is None or (isinstance(v, float) and v != v):
        return ("n",)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, float):
        return ("f", round(v, 9))
    if isinstance(v, bytes):
        return ("y", v)
    return ("s", str(v))


def rows_normalized(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--window", action="store_true",
                    help="check the driver's gate window (first 50 entries)")
    ap.add_argument("names", nargs="*", help="specific registry entries")
    opts = ap.parse_args()
    if opts.window and opts.names:
        ap.error("--window and explicit names are mutually exclusive")
    if opts.window:
        # exactly the driver's correctness gate: the first 50 registry
        # entries, in registry order
        names = list(QUERIES)[:50]
    else:
        names = opts.names or list(QUERIES)
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        ap.error(f"unknown query names: {unknown}")
    spark = get_spark("oracle-check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    oracles = oracle_sql_map()
    n_pass = n_fail = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = QUERIES[name](spark, SF)
            s_cols = [c.lower() for c in sdf.columns]
            s_rows = [tuple(r) for r in sdf.collect()]
            if name not in oracles:
                print(f"  {name:28s} rows-only: {len(s_rows)} rows "
                      f"({time.time()-t0:.1f}s)")
                continue
            # fetchdf (NOT fetchall) — the driver goes through pandas, where
            # HUGEINT becomes float64; fetchall would hide that dtype drift.
            ddf = con.sql(oracles[name]).fetchdf()
            d_cols = [c.lower() for c in ddf.columns]
            d_rows = list(ddf.itertuples(index=False, name=None))
            a = rows_normalized(s_cols, s_rows)
            b = rows_normalized(d_cols, d_rows)
            if sorted(s_cols) != sorted(d_cols):
                print(f"✗ {name:28s} SCHEMA: spark={sorted(s_cols)} duck={sorted(d_cols)}")
                n_fail += 1
            elif len(a) != len(b):
                print(f"✗ {name:28s} ROWS: spark={len(a)} duck={len(b)}")
                n_fail += 1
            elif a != b:
                diffs = [(x, y) for x, y in zip(a, b) if x != y]
                print(f"✗ {name:28s} VALUES: {len(diffs)} differing rows; "
                      f"first: spark={diffs[0][0]} duck={diffs[0][1]}")
                n_fail += 1
            else:
                print(f"✓ {name:28s} {len(a)} rows ({time.time()-t0:.1f}s)")
                n_pass += 1
        except Exception as e:
            print(f"✗ {name:28s} ERROR: {type(e).__name__}: {str(e).splitlines()[0][:140]}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"{len(names) - n_pass - n_fail} rows-only")


if __name__ == "__main__":
    main()
