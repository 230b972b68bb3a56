"""Derived transforms over the transcripts table — the engine's analog of
the reference's enrich/aggregate layer (`_raw` → `_main`):

  * ``conversation_summary``  — per-conversation rollup: turn counts,
    first/last timestamps, role mix, tool usage (reference
    sessionization: /root/reference/etl/dags/user_history/include/fact/
    insert_sessions.sql:22-60 — W5/W7/A1-A3 shapes)
  * ``first_turns``           — first event per conversation with
    NULL-demoting sort (reference registration: fact/
    insert_registration.sql:18-23 — W2)
  * ``daily_activity``        — per-day activity snapshot (reference
    daily partition aggregates — T1/A1)

All take the *logical table state* (``LakeTable.snapshot_df()`` or any
DataFrame with the transcripts schema) so they compose with the CDC
engine: replay → snapshot → derive. Pure built-in expressions; at scale
each is one hash-agg shuffle on conv_id (pre-aggregated before any join,
the reference's manual agg-below-join optimization, SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def conversation_summary(transcripts: DataFrame) -> DataFrame:
    """One row per conversation: counts, time bounds, role/tool mix."""
    return transcripts.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.max("turn_idx").alias("max_turn_idx"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.sum(F.when(F.col("role") == "user", 1).otherwise(0)).alias("n_user"),
        F.sum(F.when(F.col("role") == "assistant", 1).otherwise(0)).alias("n_assistant"),
        F.countDistinct("tool").alias("n_distinct_tools"),
        F.sum(F.length("text")).alias("total_chars"),
    )


def first_turns(transcripts: DataFrame) -> DataFrame:
    """First turn per conversation, preferring rows with a non-null tool
    (NULL-demoting sort), then earliest (ts, turn_idx)."""
    w = Window.partitionBy("conv_id").orderBy(
        F.col("tool").isNull().asc(), F.col("ts").asc(), F.col("turn_idx").asc()
    )
    return (
        transcripts.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("conv_id", "turn_idx", "role", "tool", "ts")
    )


def daily_activity(transcripts: DataFrame) -> DataFrame:
    """Per-day snapshot: active conversations, turns, tool-call share."""
    return (
        transcripts.groupBy(F.to_date("ts").alias("day_"))
        .agg(
            F.countDistinct("conv_id").alias("active_convs"),
            F.count(F.lit(1)).alias("n_turns"),
            F.round(
                F.sum(F.when(F.col("tool").isNotNull(), 1).otherwise(0))
                / F.count(F.lit(1)),
                4,
            ).alias("tool_call_ratio"),
        )
        .where(F.col("day_").isNotNull())
    )
