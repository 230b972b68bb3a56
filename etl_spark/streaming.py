"""Structured Streaming analytics over the change stream (SURVEY §2.10).

``windowed_activity`` — event-time tumbling-window aggregation with a
watermark over the CDC log: the engine's T2 surface (the reference closes
day partitions by a collector-timestamp watermark,
/root/reference/etl/dags/user_history/event_partition.py:28-63; here the
same role is played by ``withWatermark`` + ``window``).

Late rows are still MERGED by the CDC path (T3: late data is flagged,
never dropped — see cdc.apply); the watermark here only bounds the
streaming aggregation state, exactly what it is for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def windowed_activity(
    spark: SparkSession,
    change_log_dir: str,
    schema: T.StructType,
    window_size: str = "1 hour",
    watermark_delay: str = "2 hours",
    max_files_per_trigger: int | None = 16,
) -> DataFrame:
    """Streaming DataFrame: per event-time window, change counts by op.

    State is bounded by the watermark: windows older than
    ``watermark_delay`` behind the max observed op_ts are finalized and
    dropped from state — at 10^10 events, unbounded window state is the
    difference between a stream that runs for months and one that OOMs.
    """
    reader = spark.readStream.schema(schema).option("recursiveFileLookup", "true")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(change_log_dir)
    return (
        stream.withWatermark("op_ts", watermark_delay)
        .groupBy(F.window("op_ts", window_size).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_changes"),
            F.sum(F.when(F.col("op") == "I", 1).otherwise(0)).alias("n_inserts"),
            F.sum(F.when(F.col("op") == "U", 1).otherwise(0)).alias("n_updates"),
            F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("n_deletes"),
            F.approx_count_distinct("conv_id").alias("approx_convs"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_changes", "n_inserts", "n_updates", "n_deletes", "approx_convs",
        )
    )
