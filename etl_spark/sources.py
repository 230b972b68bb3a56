"""External-source ingest surface (SURVEY §2.1 S1/S5/S6).

  * ``read_partitioned_csv``  — hive-partitioned CSV report trees
    (reference: the AppsFlyer data-locker scan,
    /root/reference/dataproc-appsflyer/spark_job_data_locker.py:407-417 —
    ``basePath`` partition discovery, quote/escape options, null token)
    with the cast-normalization pass done once at ingest
    (spark_job_data_locker.py:339-379 — P8).
  * ``ingest_records``        — driver-fetched JSON records (currency
    API pattern, /root/reference/etl/dags/DAG_get_currencies_data.py:33-56)
    appended through the exactly-once CDC apply path.
  * ``ingest_pandas``         — pandas frame via Arrow (store-report
    pattern, /root/reference/etl/dags/external_sources/stores/itunes/
    store_itunes.py:100-130), same apply path.

Everything lands through ``cdc.apply.apply_batch``: external sources get
the same epoch fencing, schema evolution, lineage, and LWW semantics as
the binlog tail — one sink discipline for the whole engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .cdc.apply import ApplyStats, apply_batch
from .lake.table import LakeTable


def read_partitioned_csv(
    spark: SparkSession,
    paths: list[str] | str,
    base_path: str,
    casts: dict[str, str] | None = None,
    delimiter: str = ",",
    null_value: str = "null",
) -> DataFrame:
    """Scan a hive-partitioned CSV tree (``dt=.../b=.../part.csv``).

    ``basePath`` keeps partition-column discovery rooted even when only
    sub-dirs are listed (so ``dt``/``b`` become real columns that prune);
    ``casts`` normalizes column types once at ingest so every downstream
    query reads typed data (no per-query cast trees).
    """
    df = (
        spark.read.option("basePath", base_path)
        .option("delimiter", delimiter)
        .option("escape", '"')
        .option("nullValue", null_value)
        .csv(paths if isinstance(paths, list) else [paths], header=True)
    )
    if casts:
        df = df.withColumns({c: F.col(c).cast(t) for c, t in casts.items() if c in df.columns})
    return df


def _as_changes(df: DataFrame, op_ts_col: str, lsn_col: str) -> DataFrame:
    out = df.withColumn("op", F.lit("I"))
    # rename (not copy) the source's ordering columns — a leftover
    # 'fetched_at' would ride into the payload and be schema-evolved into
    # the lake table permanently
    if op_ts_col != "op_ts":
        out = out.withColumn("op_ts", F.col(op_ts_col)).drop(op_ts_col)
    if lsn_col != "lsn":
        out = out.withColumn("lsn", F.col(lsn_col).cast("long")).drop(lsn_col)
    return out


def _empty_changes(spark: SparkSession, table: LakeTable) -> DataFrame:
    """Zero-row CHANGE_SCHEMA-shaped frame in the table's own schema —
    lets an empty source answer flow through apply_batch and fence its
    epoch exactly like a data-carrying one."""
    from pyspark.sql import types as T

    st = T.StructType(
        [T.StructField("op", T.StringType())]
        + list(table.schema().to_struct().fields)
        + [
            T.StructField("op_ts", T.TimestampType()),
            T.StructField("lsn", T.LongType()),
        ]
    )
    # over range(0), NOT createDataFrame([], st): an empty LocalTableScan
    # plans zero tasks, so apply_batch's Observation never fires and
    # Observation.get dies on the metric-less result; a zero-row Range
    # still runs a task and the observed aggregates produce their row
    return spark.range(0).select(
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in st.fields]
    )


def ingest_records(
    spark: SparkSession,
    table: LakeTable,
    records: list[dict],
    epoch: int,
    source: str,
    op_ts_col: str = "op_ts",
    lsn_col: str = "lsn",
) -> ApplyStats:
    """Append driver-side records (REST fetch, config pull) exactly-once.

    Records become INSERT changes and run through the standard apply —
    re-running a crashed ingest with the same (source, epoch) is a no-op.
    An EMPTY batch (a routine source answer, e.g. no currency updates
    this hour) still commits, fencing the epoch — createDataFrame cannot
    infer a schema from zero records, so the empty change frame is built
    from the table's schema instead.
    """
    if not records:
        return apply_batch(table, _empty_changes(spark, table), epoch, source=source)
    df = spark.createDataFrame(records)
    return apply_batch(table, _as_changes(df, op_ts_col, lsn_col), epoch, source=source)


def ingest_pandas(
    spark: SparkSession,
    table: LakeTable,
    pdf,
    epoch: int,
    source: str,
    op_ts_col: str = "op_ts",
    lsn_col: str = "lsn",
) -> ApplyStats:
    """Append a pandas frame (report files parsed driver-side) via Arrow,
    through the same exactly-once apply path. An empty frame fences the
    epoch like ``ingest_records``."""
    if len(pdf) == 0:
        return apply_batch(table, _empty_changes(spark, table), epoch, source=source)
    df = spark.createDataFrame(pdf)
    return apply_batch(table, _as_changes(df, op_ts_col, lsn_col), epoch, source=source)


def bootstrap_snapshot(
    table: LakeTable,
    snapshot: DataFrame,
    snapshot_lsn: int,
    snapshot_op_ts: str,
    source: str = "bootstrap",
) -> ApplyStats:
    """Bootstrap a table from a FULL SNAPSHOT of the source system, then
    hand off to the change stream without gaps or duplicates — the
    standard CDC cold-start (Debezium's initial-snapshot phase).

    The snapshot rows are applied as inserts stamped at
    ``(snapshot_op_ts, snapshot_lsn)`` — the source's consistent-read
    point (e.g. the binlog position the snapshot transaction saw). The
    LWW fold then makes the handoff seam-free in BOTH directions:

      * stream replay may safely START BEFORE the snapshot point
        (overlap): changes at or below ``(snapshot_op_ts, snapshot_lsn)``
        lose to the snapshot rows — no duplicates, no regressions;
      * changes after the snapshot point win — no gaps, provided the
        stream is resumed from no later than the snapshot position
        (the operator's contract, same as any CDC system).

    Exactly-once per (source, epoch=0): re-running a crashed bootstrap
    is fenced. O(snapshot) — one pass through the ordinary apply.
    """
    changes = snapshot.select(
        "*",
        F.lit("I").alias("op"),
        F.to_timestamp(F.lit(snapshot_op_ts)).alias("op_ts"),
        F.lit(int(snapshot_lsn)).cast("long").alias("lsn"),
    )
    return apply_batch(table, changes, epoch=0, source=source)
