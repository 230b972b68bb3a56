#!/usr/bin/env python
"""Mirror the driver's correctness gate at its own scale (sf0.01).

Runs every ``driver_registry()`` entry on Spark and its DuckDB oracle on
the same parquet tables, compares with the driver's semantics (columns
sorted by name, every cell stringified, order-insensitive multiset of
rows), and prints one status line per entry plus a summary. pytest runs
the identical comparison at sf0.001 on every commit
(tests/test_queries_oracle.py, tests/test_suites.py); this script exists
to re-check at the driver's sf0.01 before a round closes.

Usage: python scripts/gate_mirror.py [sf_dir]   (default /root/testdata/sf0.01)
Exit 0 iff every entry matches.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    import duckdb

    sys.path.insert(0, REPO)
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import __spark_entry__ as se
    from etl_spark.session import get_spark
    from tests.conftest import assert_pdf_equal

    spark = get_spark("gate_mirror")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries, oracles = se.queries(), se.oracle_sql()
    bad = []
    for name, fn in queries.items():
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
            if name not in oracles:
                status = f"rows-only ({len(got)} rows)"
                if len(got) == 0:
                    raise AssertionError("0 rows")
            else:
                want = con.execute(oracles[name]).df()
                assert sorted(got.columns) == sorted(want.columns), (
                    sorted(got.columns), sorted(want.columns))
                assert_pdf_equal(got, want, sorted(got.columns)[:3])
                status = f"OK ({len(got)} rows)"
        except Exception as exc:  # noqa: BLE001
            status = f"FAIL: {exc!r:.300}"
            bad.append(name)
        print(f"{name:32s} {time.time() - t0:6.2f}s  {status}", flush=True)
    print(f"\n{len(queries) - len(bad)}/{len(queries)} entries match at {sf_dir}")
    if bad:
        print("FAILED:", bad)
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
