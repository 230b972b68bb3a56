"""Mirror of the driver's correctness gate: every queries() entry vs its
DuckDB oracle_sql() at sf0.001 (driver runs sf0.01 — same data shape)."""

import duckdb
import pytest

from etl_spark.queries import ORACLES, QUERIES
from tests.conftest import assert_pdf_equal

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    if name not in ORACLES:
        pytest.skip("rows-only query (no SQL oracle)")
    got = QUERIES[name](spark, SF_DIR).toPandas()
    want = duck.execute(ORACLES[name]).df()
    assert sorted(got.columns) == sorted(want.columns)
    key_cols = [c for c in got.columns]
    assert_pdf_equal(got, want, sorted(key_cols)[:3])


def test_entry_smoke(spark):
    import __spark_entry__ as se

    df = se.entry(spark)
    assert df.count() > 0
    assert set(se.queries()) >= set(se.oracle_sql())
