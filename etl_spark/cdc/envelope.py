"""Debezium-style change-event envelope → typed change rows.

The wire format a binlog/WAL tail actually delivers (Kafka Connect /
Debezium's public envelope): one JSON document per change with

    {"payload": {"before": {...}|null, "after": {...}|null,
                 "op": "c"|"u"|"d"|"r", "ts_ms": <epoch millis>,
                 "source": {"lsn": <long>, ...}}}

This adapter turns a DataFrame with a ``value`` string column (a Kafka
topic read, a file tail, a REST relay) into the engine's CHANGE_SCHEMA
shape — entirely JVM-side (one ``from_json`` + projections; no Python in
the row path), so it composes with both batch ingest and
``readStream`` → ``apply_batch`` unchanged.

Semantics:
  * op mapping: ``c``/``r`` (create / snapshot-read) → ``I``; ``u`` → ``U``;
    ``d`` → ``D``.
  * row image: ``after`` for c/u/r; ``before`` for d — tombstones keep the
    before-image event time (``ts``), matching the engine's change-log
    contract (FIXTURES.md §2: null-free time stats for window pruning).
  * ``op_ts`` from ``ts_ms`` (epoch millis), ``lsn`` from ``source.lsn``
    — the (op_ts, lsn) strict total order the LWW dedup needs.
  * malformed JSON / missing payload: ``from_json`` yields NULL; rows are
    routed to a ``_corrupt`` flag, not dropped silently — callers decide
    (the quality-gate operator can make corrupt-rate a blocking check).

Reference parity: the reference ingests pre-landed BigQuery rows and
never parses a binlog itself; this is the missing front door a
PySpark-native CDC engine needs (reference's closest analogue is the
JSON extraction in appsflyer/update_user_map.sql:36 — JSON_VALUE over a
string column, same engine-side pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def envelope_schema(payload_schema: T.StructType) -> T.StructType:
    """The envelope struct for ``from_json``, parameterized by the target
    table's payload schema (before/after are full row images)."""
    return T.StructType([
        T.StructField("payload", T.StructType([
            T.StructField("before", payload_schema, True),
            T.StructField("after", payload_schema, True),
            T.StructField("op", T.StringType(), True),
            T.StructField("ts_ms", T.LongType(), True),
            T.StructField("source", T.StructType([
                T.StructField("lsn", T.LongType(), True),
            ]), True),
        ]), True),
    ])


def parse_debezium(
    df: DataFrame,
    payload_schema: T.StructType,
    value_col: str = "value",
    keep_corrupt: bool = False,
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> DataFrame:
    """Parse envelope JSON strings in ``df[value_col]`` into CHANGE_SCHEMA
    rows: ``(op, <payload columns...>, op_ts, lsn)``.

    With ``keep_corrupt=True`` a ``_corrupt`` boolean column marks rows
    whose JSON failed to parse, whose op was unrecognized, or whose row
    image is unusable — any ``key_cols`` column NULL (e.g. an ``u`` event
    with ``after=null``, or a ``d`` from a REPLICA IDENTITY NOTHING
    upstream with ``before=null``: structurally valid envelopes that
    would otherwise collapse into one bogus NULL-key group in the LWW
    dedup). Default drops them; counting is the caller's gate's job.
    Works identically on batch and streaming frames. ``key_cols`` names
    not present in ``payload_schema`` are ignored.
    """
    env = F.from_json(F.col(value_col), envelope_schema(payload_schema))
    p = env["payload"]
    op = (
        F.when(p["op"].isin("c", "r"), "I")
        .when(p["op"] == "u", "U")
        .when(p["op"] == "d", "D")
    )
    image = F.when(p["op"] == "d", p["before"]).otherwise(p["after"])
    out = df.select(
        op.alias("op"),
        image.alias("_img"),
        F.timestamp_millis(p["ts_ms"]).alias("op_ts"),
        p["source"]["lsn"].alias("lsn"),
    ).select(
        "op",
        *[F.col("_img")[f.name].alias(f.name) for f in payload_schema.fields],
        "op_ts",
        "lsn",
    )
    corrupt = F.col("op").isNull() | F.col("op_ts").isNull() | F.col("lsn").isNull()
    names = {f.name for f in payload_schema.fields}
    for k in key_cols:
        if k in names:
            corrupt = corrupt | F.col(k).isNull()
    if keep_corrupt:
        return out.withColumn("_corrupt", corrupt)
    return out.where(~corrupt)


def to_debezium(changes: DataFrame, payload_cols: list[str]) -> DataFrame:
    """Inverse adapter (testing / relay): CHANGE_SCHEMA rows → envelope
    JSON strings in a ``value`` column. Deletes carry the payload as the
    before-image, inserts/updates as the after-image — a lossless
    round-trip through ``parse_debezium`` for op ∈ {I, U, D}."""
    payload = F.struct(*[F.col(c) for c in payload_cols])
    is_del = F.col("op") == "D"
    env = F.struct(
        F.struct(
            F.when(is_del, payload).alias("before"),
            F.when(~is_del, payload).alias("after"),
            F.when(is_del, "d").when(F.col("op") == "U", "u").otherwise("c").alias("op"),
            F.unix_millis(F.col("op_ts")).alias("ts_ms"),
            F.struct(F.col("lsn").alias("lsn")).alias("source"),
        ).alias("payload"),
    )
    return changes.select(F.to_json(env).alias("value"))
