"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the engine's flagship LWW-dedup query at sf0.001;
``queries()``/``oracle_sql()`` expose the operator-coverage registry from
``etl_spark.queries`` (one entry per SURVEY.md §2 operator family, each
paired with a DuckDB-runnable oracle).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["w1_lww_dedup"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
