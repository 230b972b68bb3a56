"""Derivates layer + remaining SURVEY §2 gaps: periodic rollups
(weekly/monthly, reference insert_user_history_derivates.sql:26-45),
AVG-over-window session quality (W7, fact/insert_sessions.sql:41),
cross-system tolerance reconciliation (store_itunes.yaml:1-53), and the
two join families that previously had no dedicated registry entry —
CROSS join (J5, currency fan-out create_currency_rate_table.sql) and the
yesterday-vs-today theta self-join (J11,
tests/user_history/mandatory/count.yaml day-over-day compare).

Each entry is paired with a DuckDB oracle (driver contract).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .operators.reconcile import tolerance_compare
from .queries import _dec, _t, register

# --------------------------------------------------------------------------
# W7 — AVG over a window (full-partition frame), the session-quality
# pattern: every row carries its group's average.
# Reference: fact/insert_sessions.sql:41
#   (session_quality = AVG(data_quality) OVER (PARTITION BY session)).


@register(
    "w7_window_avg_quality",
    # The averages sum EXACT decimals, then do one double division: a
    # plain float avg() over a window accumulates in shuffle-partition
    # row order, so a value sitting on a round(4) boundary flips between
    # runs — an order-independent exact sum is the only hashable form.
    """
    SELECT user_id, event_id,
           round(CAST(sum(CAST(value AS DECIMAL(18,6)))
                        OVER (PARTITION BY user_id, CAST(ts AS DATE)) AS DOUBLE)
                 / count(*) OVER (PARTITION BY user_id, CAST(ts AS DATE)), 4)
             AS day_avg_value,
           round(CAST(sum(CAST(value AS DECIMAL(18,6)))
                        OVER (PARTITION BY user_id) AS DOUBLE)
                 / count(*) OVER (PARTITION BY user_id), 4)
             AS user_avg_value,
           count(*) OVER (PARTITION BY user_id, CAST(ts AS DATE))
             AS day_n_events
    FROM events
    """,
)
def w7_window_avg_quality(spark, sf_dir):
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w_day = Window.partitionBy("user_id", F.to_date("ts"))
    w_user = Window.partitionBy("user_id")
    dec = F.col("value").cast("decimal(18,6)")

    def wavg(w):
        return F.round(
            F.sum(dec).over(w).cast("double") / F.count(F.lit(1)).over(w), 4
        )

    return ev.select(
        "user_id",
        "event_id",
        wavg(w_day).alias("day_avg_value"),
        wavg(w_user).alias("user_avg_value"),
        F.count(F.lit(1)).over(w_day).alias("day_n_events"),
    )


# --------------------------------------------------------------------------
# Derivates — weekly rollup (ISO week, Monday start).
# Reference: insert_user_history_derivates.sql:26-35
#   (DATE_TRUNC(date_, WEEK(MONDAY)), delete+insert per day).
# Scale shape: single partial-agg shuffle on (week, event_type);
# incremental maintenance = recompute only weeks touched by the new day
# (the engine's delete+insert partition sink, S7).


@register(
    "d_weekly_rollup",
    """
    SELECT strftime(CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE),
                    '%Y-%m-%d') AS week_start,
           event_type,
           count(*) AS n_events,
           count(DISTINCT user_id) AS active_users,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 3) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def d_weekly_rollup(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("week", F.to_date("ts")), "yyyy-MM-dd").alias(
                "week_start"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("active_users"),
            F.round(F.sum(_dec("value")).cast("double"), 3).alias("total_value"),
        )
    )


# --------------------------------------------------------------------------
# Derivates — monthly rollup.
# Reference: insert_user_history_derivates.sql:36-45 (DATE_TRUNC MONTH).


@register(
    "d_monthly_rollup",
    """
    SELECT strftime(CAST(date_trunc('month', CAST(ts AS DATE)) AS DATE),
                    '%Y-%m') AS month_,
           count(*) AS n_events,
           count(DISTINCT user_id) AS active_users,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purchases,
           round(CAST(sum(CASE WHEN event_type = 'purchase'
                    THEN CAST(value AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE), 3)
             AS revenue
    FROM events
    GROUP BY 1
    """,
)
def d_monthly_rollup(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    is_p = F.col("event_type") == "purchase"
    return (
        ev.groupBy(F.date_format("ts", "yyyy-MM").alias("month_"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("active_users"),
            F.sum(F.when(is_p, 1).otherwise(0)).alias("n_purchases"),
            F.round(F.sum(F.when(is_p, _dec("value")).otherwise(0)).cast("double"), 3).alias(
                "revenue"
            ),
        )
    )


# --------------------------------------------------------------------------
# Reconciliation — booked order totals vs line-item-computed totals per
# order month, 5% band. In TPC-H o_totalprice is derived from the lines,
# so a healthy pipeline reconciles within rounding — exactly the
# reference's store-revenue invariant.


@register(
    "recon_order_totals",
    """
    WITH booked AS (
      SELECT strftime(CAST(date_trunc('month', o_orderdate) AS DATE), '%Y-%m')
               AS month_,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS booked_total
      FROM orders GROUP BY 1
    ), computed AS (
      SELECT strftime(CAST(date_trunc('month', o.o_orderdate) AS DATE), '%Y-%m')
               AS month_,
             round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                        * (1 + CAST(l.l_tax AS DECIMAL(18,2)))) AS DOUBLE), 2)
               AS computed_total
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1
    )
    SELECT coalesce(b.month_, c.month_) AS month_,
           b.booked_total, c.computed_total,
           round(abs(b.booked_total - c.computed_total)
                 / greatest(abs(c.computed_total), 1e-12), 6) AS rel_diff,
           coalesce(abs(b.booked_total - c.computed_total)
                    / greatest(abs(c.computed_total), 1e-12) <= 0.05,
                    false) AS within_tol
    FROM booked b FULL OUTER JOIN computed c USING (month_)
    """,
)
def recon_order_totals(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    month = F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM")
    booked = o.groupBy(month.alias("month_")).agg(
        F.round(F.sum(_dec("o_totalprice")).cast("double"), 2).alias("booked_total")
    )
    gross = _dec("l_extendedprice") * (1 - _dec("l_discount")) * (1 + _dec("l_tax"))
    computed = (
        li.join(o.select("o_orderkey", "o_orderdate"), li.l_orderkey == o.o_orderkey)
        .groupBy(month.alias("month_"))
        .agg(F.round(F.sum(gross).cast("double"), 2).alias("computed_total"))
    )
    return tolerance_compare(
        booked, computed, ["month_"], "booked_total", "computed_total", 0.05
    )


# --------------------------------------------------------------------------
# J5 — CROSS join with a dedicated entry (previously only transitive via
# cosine_topk). Reference: currency fan-out — every (date, currency)
# pair exists even without a rate (create_currency_rate_table.sql:9-21).


@register(
    "j5_cross_join",
    """
    SELECT r.r_name, n.n_name,
           (r.r_regionkey = n.n_regionkey) AS is_home
    FROM region r CROSS JOIN nation n
    """,
)
def j5_cross_join(spark, sf_dir):
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    return r.crossJoin(n).select(
        "r_name",
        "n_name",
        (F.col("r_regionkey") == F.col("n_regionkey")).alias("is_home"),
    )


# --------------------------------------------------------------------------
# J11 — yesterday-vs-today theta self-join: day-over-day growth per user
# (equi on user + date-shift, theta on the measure). Reference:
# tests/user_history/mandatory/count.yaml — snapshot row count today
# must be >= yesterday; the generalized operator compares any measure
# across adjacent days.


@register(
    "j11_theta_self_join",
    """
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day_,
             count(*) AS n_events,
             round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 3) AS daily_value
      FROM events GROUP BY 1, 2
    )
    SELECT t.user_id, strftime(t.day_, '%Y-%m-%d') AS day_str,
           t.daily_value AS today_value, y.daily_value AS yesterday_value,
           round(t.daily_value - y.daily_value, 3) AS growth
    FROM daily t JOIN daily y
      ON t.user_id = y.user_id
     AND t.day_ = y.day_ + INTERVAL 1 DAY
     AND t.daily_value > y.daily_value
    """,
)
def j11_theta_self_join(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day_")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(_dec("value")).cast("double"), 3).alias("daily_value"),
    )
    t, y = daily.alias("t"), daily.alias("y")
    return (
        t.join(
            y,
            (F.col("t.user_id") == F.col("y.user_id"))
            & (F.col("t.day_") == F.date_add(F.col("y.day_"), 1))
            & (F.col("t.daily_value") > F.col("y.daily_value")),
        )
        .select(
            F.col("t.user_id").alias("user_id"),
            F.date_format("t.day_", "yyyy-MM-dd").alias("day_str"),
            F.col("t.daily_value").alias("today_value"),
            F.col("y.daily_value").alias("yesterday_value"),
            F.round(F.col("t.daily_value") - F.col("y.daily_value"), 3).alias("growth"),
        )
    )
