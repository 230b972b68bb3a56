"""Driver-registry suites vs DuckDB — mirror of the driver's gate over
the UNION ALL suite entries (etl_spark.queries_suites), plus contract
checks that the folded registry still covers every fine-grained query."""

import duckdb
import pytest

from etl_spark.queries import ORACLES, QUERIES
from etl_spark.queries_suites import SUITE_MEMBERS, SUITE_SPECS, driver_registry
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
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", sorted(SUITE_SPECS))
def test_suite_matches_oracle(spark, duck, name):
    q, o = driver_registry()
    got = q[name](spark, SF_DIR).toPandas()
    want = duck.execute(o[name]).df()
    assert len(got) > 0
    assert sorted(got.columns) == sorted(want.columns)
    assert_pdf_equal(got, want, sorted(got.columns)[:3])


def test_driver_registry_contract():
    q, o = driver_registry()
    # HARD CAP — do not raise: the round driver's correctness sweep runs
    # at most ~50 registry entries per round. Round 3 shipped 69 entries
    # and 13 of them were silently never re-checked (only green in an old
    # round's artifact); the suite folding exists precisely to keep every
    # fine-grained query covered within the cap. Adding entry #51 would
    # reintroduce the stale-entry problem — fold new queries into a
    # UNION-ALL suite instead (SUITE_SPECS).
    assert len(q) <= 50
    assert set(o) == set(q)
    # every fine-grained query is either registered directly or suited
    assert set(QUERIES) - set(q) == set(SUITE_MEMBERS)
    # suite members all exist and carry oracles (the suite SQL embeds them)
    for member in SUITE_MEMBERS:
        assert member in QUERIES and member in ORACLES
    import __spark_entry__ as se

    sq = se.queries()
    assert list(sq) == se._SWEEP_ORDER  # declared order is exhaustive
    assert set(sq) == set(q)
