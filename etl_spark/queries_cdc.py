"""CDC wire-format coverage queries: Debezium envelope parse.

The engine's binlog front door (`cdc/envelope.py`) exercised as a
driver-gate query: deterministic change rows are derived from the shared
``events`` table, serialized to Debezium envelope JSON (`to_debezium`),
parsed back (`parse_debezium`, one JVM-side ``from_json``), and the typed
change stream is returned. The oracle states the parse contract directly
over the same base rows — op mapping c/u/d, before-image for deletes,
epoch-millis op_ts, source.lsn ordering key.

Reference parity: the reference's only JSON-wire handling is
JSON_VALUE extraction (appsflyer/update_user_map.sql:36); a from-scratch
CDC engine needs the full envelope contract, so this is engine-new
surface per the north rule (binlog/WAL-style change stream).
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


_ENVELOPE_ORACLE = """
SELECT CASE WHEN event_type = 'purchase' THEN 'D'
            WHEN event_type = 'error'    THEN 'U'
            ELSE 'I' END                              AS op,
       'u' || CAST(user_id AS VARCHAR)                AS conv_id,
       CAST(event_id % 997 AS INT)                    AS turn_idx,
       event_type                                     AS role,
       props                                          AS text,
       CAST(NULL AS VARCHAR)                          AS tool,
       date_trunc('second', ts)                       AS ts,
       date_trunc('second', ts)                       AS op_ts,
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
    return parse_debezium(wire, TRANSCRIPT_SCHEMA)
