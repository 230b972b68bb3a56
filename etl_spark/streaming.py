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

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

CONV_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_changes", T.LongType()),
        T.StructField("max_turn_idx", T.LongType()),
        T.StructField("last_op_ts", T.TimestampType()),
    ]
)

CONV_PROGRESS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("n_changes", T.LongType()),
        T.StructField("max_turn_idx", T.LongType()),
        T.StructField("last_op_ts", T.TimestampType()),
    ]
)


def _read_change_stream(spark, change_log_dir, schema, max_files_per_trigger):
    """One reader construction for every streaming entry point — the
    three surfaces must not drift apart on reader options."""
    reader = spark.readStream.schema(schema).option("recursiveFileLookup", "true")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(change_log_dir)


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
    stream = _read_change_stream(spark, change_log_dir, schema, max_files_per_trigger)
    return (
        stream.withWatermark("op_ts", watermark_delay)  # bounds agg state
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


def streaming_sessions(
    spark: SparkSession,
    change_log_dir: str,
    schema: T.StructType,
    gap: str = "30 minutes",
    watermark_delay: str = "2 hours",
    max_files_per_trigger: int | None = 16,
) -> DataFrame:
    """Live sessionization via ``session_window``: per conversation, rows
    within ``gap`` of each other merge into one session whose bounds grow
    as events arrive; the watermark finalizes sessions once event time
    moves past them (the streaming form of the reference's sessions
    table, fact/insert_sessions.sql:20-45 — batch W5 computes the same
    split with a LAG window, see queries.w5_sessions).

    State = one open session per active conversation, closed and evicted
    at the watermark — bounded regardless of stream length. Dynamic
    gap-merging (two micro-batches landing adjacent halves of a session)
    is handled by Spark's session-window state merge, which a
    hand-rolled LAG over a stream cannot do.
    """
    stream = _read_change_stream(spark, change_log_dir, schema, max_files_per_trigger)
    return (
        stream.where(F.col("op") != "D")
        .withWatermark("op_ts", watermark_delay)
        .groupBy(F.col("conv_id"), F.session_window("op_ts", gap).alias("s"))
        .agg(
            F.count(F.lit(1)).alias("n_changes"),
            F.max("turn_idx").alias("max_turn_idx"),
        )
        .select(
            "conv_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_changes",
            "max_turn_idx",
        )
    )


_DURATION_UNIT_MS = {
    "ms": 1, "millisecond": 1, "milliseconds": 1,
    "s": 1000, "second": 1000, "seconds": 1000,
    "m": 60_000, "min": 60_000, "minute": 60_000, "minutes": 60_000,
    "h": 3_600_000, "hour": 3_600_000, "hours": 3_600_000,
    "d": 86_400_000, "day": 86_400_000, "days": 86_400_000,
}


def _duration_ms(duration: str | int) -> int:
    """'30 minutes' / '2 hours' / raw ms int → milliseconds (PySpark's
    ``GroupState.setTimeoutDuration`` only takes the int form)."""
    if isinstance(duration, int):
        return duration
    parts = duration.strip().lower().split()
    if len(parts) == 2 and parts[1] in _DURATION_UNIT_MS:
        return int(float(parts[0]) * _DURATION_UNIT_MS[parts[1]])
    raise ValueError(f"unparseable duration {duration!r} (want '<n> <unit>')")


def _progress_update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    idle_timeout_ms: int | None,
) -> Iterator[pd.DataFrame]:
    """State-update function behind ``conversation_progress`` (module-level
    so the timeout branch is unit-testable against a fake GroupState)."""
    if state.hasTimedOut:
        # idle eviction: the last emitted update already carried this
        # conversation's final totals — drop the state, emit nothing
        state.remove()
        return
    (conv_id,) = key
    if state.exists:
        n, mx, last = state.get
    else:
        n, mx, last = 0, -1, None
    for pdf in pdfs:
        n += len(pdf)
        if len(pdf):
            mx = max(mx, int(pdf["turn_idx"].max()))
            batch_last = pdf["op_ts"].max()
            last = batch_last if last is None else max(last, batch_last)
    state.update((n, mx, last))
    if idle_timeout_ms is not None:
        state.setTimeoutDuration(idle_timeout_ms)
    yield pd.DataFrame(
        {"conv_id": [conv_id], "n_changes": [n],
         "max_turn_idx": [mx], "last_op_ts": [last]}
    )


def conversation_progress(
    spark: SparkSession,
    change_log_dir: str,
    schema: T.StructType,
    max_files_per_trigger: int | None = 16,
    idle_timeout: str | None = None,
) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``
    (SURVEY §2.10 / the north rule's Arrow-vectorized stateful path):
    per-conversation running progress (change count, max turn index,
    last change time) maintained in Spark's state store across
    micro-batches.

    Unlike the table-as-state pattern (cdc.apply — the reference's T4
    carry-forward), this keeps state IN the streaming state store:
    the right tool when the derived state is small per key and consumers
    need per-trigger updates rather than a committed table. Each group's
    rows arrive as an iterator of Arrow-backed pandas frames — vectorized
    per batch, never per row.

    State-size bound: per-key state is a few dozen bytes, but the KEY
    universe is every conversation ever seen — unbounded on a 10^10-event
    stream where conv_ids keep arriving. ``idle_timeout`` (e.g.
    ``"2 hours"``) is the scale lever: conversations idle past it are
    evicted from the state store (processing-time timeout), so state
    tracks the ACTIVE conversation set instead of the historical one. A
    conversation resuming after eviction restarts its counters — accept
    that for a monitoring surface, or use the table-as-state CDC path
    (cdc.apply) when exact lifetime totals are required. Default ``None``
    keeps exact totals (fine while the key universe is bounded).

    Harness note: with a timeout armed, ``processAllAvailable()`` blocks
    indefinitely (the engine always holds a pending timeout wakeup) —
    drive timeout-enabled queries with a real trigger loop and
    ``stop()``, as production does.
    """

    timeout_ms = None if idle_timeout is None else _duration_ms(idle_timeout)

    def _update(key, pdfs, state):
        yield from _progress_update(key, pdfs, state, timeout_ms)

    stream = _read_change_stream(spark, change_log_dir, schema, max_files_per_trigger)
    return (
        stream.select("conv_id", "turn_idx", "op_ts")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _update,
            outputStructType=CONV_PROGRESS_SCHEMA,
            stateStructType=CONV_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if idle_timeout is not None
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
