"""Round-2 coverage queries: CDC wire format, approx sketches, and
multi-level aggregation.

* ``cdc_envelope_roundtrip`` — the binlog front door (`cdc/envelope.py`)
  as a driver-gate query: change rows derived from ``events``,
  serialized to Debezium envelope JSON (`to_debezium`), parsed back
  (`parse_debezium`, one JVM-side ``from_json``). The oracle states the
  parse contract directly — op mapping c/u/d, before-image for deletes,
  epoch-millis op_ts, source.lsn ordering key. (Reference's only
  JSON-wire handling is JSON_VALUE, appsflyer/update_user_map.sql:36 —
  the full envelope contract is engine-new surface per the north rule.)
* ``a_approx_sketches`` — HLL + approx-quantile with their error
  contracts checked in-query (`operators/sketches.py`).
* ``a_grouping_sets`` / ``a_pivot_counts`` — one-pass multi-level
  aggregation and explicit-values pivot.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .cdc.engine import TRANSCRIPT_SCHEMA
from .cdc.envelope import parse_debezium, to_debezium
from .queries import _t, register

_SKETCH_ORACLE = """
SELECT event_type,
       count(DISTINCT user_id)               AS n_exact,
       TRUE                                  AS hll_ok,
       round(quantile_cont(value, 0.5), 3)   AS p50_exact,
       round(quantile_cont(value, 0.95), 3)  AS p95_exact,
       TRUE                                  AS p50_ok,
       TRUE                                  AS p95_ok
FROM events GROUP BY event_type
"""


@register("a_approx_sketches", _SKETCH_ORACLE)
def a_approx_sketches(spark, sf_dir):
    """HLL distinct + approx-quantile profile with its error contract
    checked in-query (the *_ok flags must all come back TRUE for the
    hash to match the oracle's literals)."""
    from .operators.sketches import distinct_profile, quantile_profile

    ev = _t(spark, sf_dir, "events")
    d = distinct_profile(ev, "event_type", "user_id")
    q = quantile_profile(ev, "event_type", "value")
    return d.join(q, "event_type")


# --------------------------------------------------------------------------
# A-family breadth: multi-level aggregation (GROUPING SETS / rollup) and
# PIVOT. The reference builds its weekly/monthly derivates as separate
# statements per level (insert_user_history_derivates.sql:26-45); GROUPING
# SETS computes every level in ONE pass over the data — at 100 TB that is
# one scan instead of one per level (Spark plans a single Expand + hash
# agg; partial aggregation still applies).

_GSETS_ORACLE = """
SELECT coalesce(event_type, '<all>') AS event_type,
       coalesce(strftime(CAST(date_trunc('month', ts) AS DATE), '%Y-%m'), '<all>')
         AS month_,
       count(*) AS n_events,
       CAST(grouping(event_type) AS INT) AS g_type,
       CAST(grouping(date_trunc('month', ts)) AS INT) AS g_month
FROM events
GROUP BY GROUPING SETS ((event_type, date_trunc('month', ts)), (event_type), ())
"""


@register("a_grouping_sets", _GSETS_ORACLE)
def a_grouping_sets(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("month", "ts").alias("_m")
    )
    out = ev.groupingSets(
        [["event_type", "_m"], ["event_type"], []], "event_type", "_m"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.grouping("event_type").cast("int").alias("g_type"),
        F.grouping("_m").cast("int").alias("g_month"),
    )
    return out.select(
        F.coalesce("event_type", F.lit("<all>")).alias("event_type"),
        F.coalesce(F.date_format("_m", "yyyy-MM"), F.lit("<all>")).alias("month_"),
        "n_events",
        "g_type",
        "g_month",
    )


_PIVOT_ORACLE = """
SELECT user_id,
       CAST(coalesce(sum(CASE WHEN event_type = 'click' THEN 1 END), 0) AS BIGINT) AS n_click,
       CAST(coalesce(sum(CASE WHEN event_type = 'view' THEN 1 END), 0) AS BIGINT) AS n_view,
       CAST(coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 END), 0) AS BIGINT) AS n_purchase,
       CAST(coalesce(sum(CASE WHEN event_type = 'error' THEN 1 END), 0) AS BIGINT) AS n_error
FROM events GROUP BY user_id
"""


@register("a_pivot_counts", _PIVOT_ORACLE)
def a_pivot_counts(spark, sf_dir):
    """PIVOT with an EXPLICIT value list — at scale, never let pivot infer
    the distinct values (that is an extra full scan + a driver collect)."""
    ev = _t(spark, sf_dir, "events")
    kinds = ["click", "view", "purchase", "error"]
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "user_id", *[F.coalesce(F.col(k), F.lit(0)).alias(f"n_{k}") for k in kinds]
    )


_ENVELOPE_ORACLE = """
SELECT CASE WHEN event_type = 'purchase' THEN 'D'
            WHEN event_type = 'error'    THEN 'U'
            ELSE 'I' END                              AS op,
       'u' || CAST(user_id AS VARCHAR)                AS conv_id,
       CAST(event_id % 997 AS INT)                    AS turn_idx,
       event_type                                     AS role,
       props                                          AS text,
       CAST(NULL AS VARCHAR)                          AS tool,
       epoch_us(date_trunc('second', ts))             AS ts_us,
       epoch_us(date_trunc('second', ts))             AS op_ts_us,
       event_id                                       AS lsn
FROM events WHERE event_id % 7 = 0
"""


@register("cdc_envelope_roundtrip", _ENVELOPE_ORACLE)
def cdc_envelope_roundtrip(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").where(F.col("event_id") % 7 == 0)
    src = ev.select(
        F.when(F.col("event_type") == "purchase", "D")
        .when(F.col("event_type") == "error", "U")
        .otherwise("I")
        .alias("op"),
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("conv_id"),
        (F.col("event_id") % 997).cast("int").alias("turn_idx"),
        F.col("event_type").alias("role"),
        F.col("props").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.date_trunc("second", F.col("ts")).alias("ts"),
        F.date_trunc("second", F.col("ts")).alias("op_ts"),
        F.col("event_id").alias("lsn"),
    )
    wire = to_debezium(src, payload_cols=[f.name for f in TRANSCRIPT_SCHEMA.fields])
    out = parse_debezium(wire, TRANSCRIPT_SCHEMA)
    # gate convention (queries.py header): timestamps export as epoch
    # micros — raw TIMESTAMP columns only hash-match the oracle while the
    # session tz stays pinned UTC
    return out.select(
        "op", "conv_id", "turn_idx", "role", "text", "tool",
        F.unix_micros("ts").alias("ts_us"),
        F.unix_micros("op_ts").alias("op_ts_us"),
        "lsn",
    )
