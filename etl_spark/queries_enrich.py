"""Trailing-window and densification enrichments from the reference's
user-history layer:

  * ``w_rolling_28d``     — days-active-in-last-28-days + trailing event
                            count per user per active day (reference:
                            user_history/insert_user_history.sql:128-130,
                            appsflyer/insert_appsflyer_user_history.sql:136
                            — the MAU/engagement rolling metrics).
  * ``d_date_spine_ffill``— date-spine densification + forward-fill of a
                            sparse per-key daily series (reference:
                            currency/create_currency_rate_table.sql — a
                            day-partitioned rate table consumed as "the
                            last known rate as of day D").

Scale notes: the rolling metric pre-aggregates to one row per (user, day)
FIRST, so the range window scans at most 28 tiny rows per user-day and
"COUNT(DISTINCT date_)" degenerates to a plain frame count — no
collect_set, no distinct-over-window (which Spark refuses anyway). The
spine densification cross-joins the SMALL key dimension (event types ~
currency codes) against a generated day sequence — rows out = |keys| ×
|days|, never a function of the fact-table row count; the fill is one
ordered window per key.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .queries import _t, _us, register

# --------------------------------------------------------------------------
# W — trailing 28-day activity window per user
# (reference: insert_user_history.sql:128-130 `days_active_last_28_days`)


@register(
    "w_rolling_28d",
    """
    WITH daily AS (
      SELECT user_id, date_trunc('day', ts) AS day_,
             count(*) AS n_events
      FROM events GROUP BY 1, 2
    )
    SELECT user_id,
           epoch_us(day_) AS day_us,
           n_events,
           CAST(count(*) OVER w AS BIGINT) AS days_active_28d,
           CAST(sum(n_events) OVER w AS BIGINT) AS events_28d
    FROM daily
    WINDOW w AS (
      PARTITION BY user_id
      ORDER BY date_diff('day', DATE '1970-01-01', day_)
      RANGE BETWEEN 27 PRECEDING AND CURRENT ROW)
    """,
)
def w_rolling_28d(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day_")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.datediff(F.col("day_"), F.lit("1970-01-01")))
        .rangeBetween(-27, 0)
    )
    return daily.select(
        "user_id",
        _us("day_").alias("day_us"),
        "n_events",
        F.count(F.lit(1)).over(w).alias("days_active_28d"),
        F.sum("n_events").over(w).alias("events_28d"),
    )


# --------------------------------------------------------------------------
# D — date-spine densification + forward-fill
# (reference: currency/create_currency_rate_table.sql — sparse daily rates
# read as "last known rate"; the spine makes the carry-forward explicit)


@register(
    "d_date_spine_ffill",
    """
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day_,
             max(value) AS rate
      FROM events GROUP BY 1, 2
    ), bounds AS (
      SELECT min(day_) AS lo, max(day_) AS hi FROM daily
    ), spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day_
      FROM bounds
    ), dense AS (
      SELECT k.event_type, s.day_, d.rate
      FROM (SELECT DISTINCT event_type FROM daily) k
      CROSS JOIN spine s
      LEFT JOIN daily d USING (event_type, day_)
    )
    SELECT event_type,
           epoch_us(day_) AS day_us,
           round(last_value(rate IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY day_
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS rate_ffill,
           (rate IS NULL) AS is_filled
    FROM dense
    """,
)
def d_date_spine_ffill(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    # max, not avg: order-independent and EXACT on the 2-decimal doubles,
    # so the forward-filled copies hash identically on both engines (an
    # averaged double hit a round(4) boundary: 38.37875 split both ways)
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day_")
    ).agg(F.max("value").alias("rate"))
    spine = daily.agg(
        F.min("day_").alias("lo"), F.max("day_").alias("hi")
    ).select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day_")
    )
    keys = daily.select("event_type").distinct()
    dense = keys.crossJoin(F.broadcast(spine)).join(
        daily, ["event_type", "day_"], "left"
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day_")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return dense.select(
        "event_type",
        _us("day_").alias("day_us"),
        F.round(F.last("rate", ignorenulls=True).over(w), 2).alias("rate_ffill"),
        F.col("rate").isNull().alias("is_filled"),
    )


# --------------------------------------------------------------------------
# J — AS-OF (point-in-time) join: each event enriched with the customer's
# latest order at or before the event time (operators/temporal.py; DuckDB's
# native ASOF LEFT JOIN is the oracle)


@register(
    "j_asof_join",
    """
    WITH b0 AS (
      SELECT o_custkey AS user_id, CAST(o_orderdate AS TIMESTAMP) AS bts,
             o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                ORDER BY o_orderkey DESC) AS rn
      FROM orders
    ), b AS (
      SELECT user_id, bts, o_orderkey, o_totalprice FROM b0 WHERE rn = 1
    )
    SELECT p.user_id,
           epoch_us(p.ts) AS ts_us,
           p.event_id,
           b.o_orderkey AS last_orderkey,
           b.o_totalprice AS last_totalprice
    FROM (SELECT user_id, ts, event_id FROM events) p
    ASOF LEFT JOIN b ON p.user_id = b.user_id AND p.ts >= b.bts
    """,
)
def j_asof_join(spark, sf_dir):
    from .operators.temporal import asof_join

    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("odate"),
        F.col("o_orderkey").alias("last_orderkey"),
        F.col("o_totalprice").alias("last_totalprice"),
    )
    out = asof_join(
        ev, orders, key=["user_id"], probe_ts="ts", build_ts="odate",
        dedup_order=["last_orderkey"],
    )
    return out.select(
        "user_id", _us("ts").alias("ts_us"), "event_id",
        "last_orderkey", "last_totalprice",
    )
