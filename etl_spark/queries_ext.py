"""SURVEY §2 operator families not covered by the core registry:
two-level rank (W3), running last_value (W6), composite-key join (J2),
null-safe join (J8), range-bounded join (J9), misc aggregates (A5-A7),
type-normalization projection (P8), union assembly (U1), SHA-256
pseudonymization map (F2/S9), and the accumulating-snapshot carry-forward
(T4). Each paired with a DuckDB oracle; registered into the shared
registry (driver contract).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .queries import _dec, _t, _us, register

# --------------------------------------------------------------------------
# W3 — latest-version pick via two-level rank
# (reference: insert_user_history.sql:71-89 — VAT current-row per country)


@register(
    "w3_latest_version",
    """
    WITH lv1 AS (
      SELECT l_partkey, l_suppkey, l_shipdate, l_extendedprice,
             row_number() OVER (
               PARTITION BY l_partkey, l_suppkey
               ORDER BY l_shipdate DESC, l_orderkey DESC, l_linenumber DESC) AS rn1
      FROM lineitem
    ), lv2 AS (
      SELECT *, row_number() OVER (
               PARTITION BY l_partkey
               ORDER BY l_shipdate DESC, l_suppkey ASC) AS rn2
      FROM lv1 WHERE rn1 = 1
    )
    SELECT l_partkey, l_suppkey AS current_suppkey,
           epoch_us(l_shipdate) AS latest_ship_us,
           round(l_extendedprice, 2) AS latest_price
    FROM lv2 WHERE rn2 = 1
    """,
)
def w3_latest_version(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    w1 = Window.partitionBy("l_partkey", "l_suppkey").orderBy(
        F.col("l_shipdate").desc(), F.col("l_orderkey").desc(), F.col("l_linenumber").desc()
    )
    lv1 = li.withColumn("rn1", F.row_number().over(w1)).where(F.col("rn1") == 1)
    w2 = Window.partitionBy("l_partkey").orderBy(
        F.col("l_shipdate").desc(), F.col("l_suppkey").asc()
    )
    return (
        lv1.withColumn("rn2", F.row_number().over(w2))
        .where(F.col("rn2") == 1)
        .select(
            "l_partkey",
            F.col("l_suppkey").alias("current_suppkey"),
            _us("l_shipdate").alias("latest_ship_us"),
            F.round("l_extendedprice", 2).alias("latest_price"),
        )
    )


# --------------------------------------------------------------------------
# W6 — LAST_VALUE with default frame (running last) + outer MAX
# (reference: insert_user_history.sql:51-55 — value at latest session)


@register(
    "w6_running_last",
    """
    WITH r AS (
      SELECT user_id,
             last_value(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_last,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT user_id, running_last AS latest_event_type
    FROM r WHERE rn = 1
    """,
)
def w6_running_last(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wd = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("running_last", F.last("event_type").over(w))
        .withColumn("rn", F.row_number().over(wd))
        .where(F.col("rn") == 1)
        .select("user_id", F.col("running_last").alias("latest_event_type"))
    )


# --------------------------------------------------------------------------
# J2 — composite-key USING join (reference: fact/insert_sessions.sql:82,
# insert_appsflyer_aggregated_user_history.sql:724-725)


@register(
    "j2_composite_key_join",
    """
    WITH ps AS (
      SELECT l_partkey, l_suppkey, count(*) AS n_lines,
             round(sum(l_quantity), 2) AS total_qty
      FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT l.l_orderkey, l.l_partkey, l.l_suppkey,
           ps.n_lines, ps.total_qty
    FROM lineitem l
    JOIN ps USING (l_partkey, l_suppkey)
    WHERE l.l_linenumber = 1
    """,
)
def j2_composite_key_join(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.count(F.lit(1)).alias("n_lines"), F.round(F.sum("l_quantity"), 2).alias("total_qty")
    )
    return (
        li.where(F.col("l_linenumber") == 1)
        .join(ps, ["l_partkey", "l_suppkey"])
        .select("l_orderkey", "l_partkey", "l_suppkey", "n_lines", "total_qty")
    )


# --------------------------------------------------------------------------
# J8 — null-safe equi join (reference MERGE ON IFNULL(a,'null')=IFNULL(b,'null'),
# update_user_map.sql:210-226)


@register(
    "j8_null_safe_join",
    """
    WITH a AS (
      SELECT json_extract_string(props, '$.k') AS k, count(*) AS n_events
      FROM events GROUP BY 1
    ), b AS (
      SELECT json_extract_string(props, '$.k') AS k, round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 3) AS total
      FROM events GROUP BY 1
    )
    SELECT a.k AS k, a.n_events, b.total
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    """,
)
def j8_null_safe_join(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").alias("k")
    a = ev.select(k).groupBy("k").agg(F.count(F.lit(1)).alias("n_events"))
    b = ev.select(k, "value").groupBy("k").agg(F.round(F.sum(_dec("value")).cast("double"), 3).alias("total"))
    return a.join(b, a["k"].eqNullSafe(b["k"])).select(
        a["k"].alias("k"), "n_events", "total"
    )


# --------------------------------------------------------------------------
# J9 — range-bounded lookup join (reference: insert_appsflyer_user_history.sql:76-83
# — equi key + date BETWEEN window)


@register(
    "j9_range_join",
    """
    SELECT o.o_orderkey, count(*) AS n_in_window,
           round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS window_price
    FROM orders o
    JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate BETWEEN o.o_orderdate AND o.o_orderdate + INTERVAL 60 DAY
    GROUP BY o.o_orderkey
    """,
)
def j9_range_join(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (li.l_orderkey == o.o_orderkey)
            & li.l_shipdate.between(o.o_orderdate, F.timestamp_add("DAY", F.lit(60), o.o_orderdate)),
        )
        .groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_in_window"),
            F.round(F.sum(_dec("l_extendedprice")).cast("double"), 2).alias("window_price"),
        )
    )


# --------------------------------------------------------------------------
# A5/A6/A7 — misc aggregates: deterministic any-value, sorted string_agg,
# SUM(DISTINCT) (reference: gdpr_delete_request.sql:13,
# insert_user_history.sql:21, insert_appsflyer_user_history.sql:27)


@register(
    "a_misc_aggs",
    """
    SELECT l_returnflag,
           min(l_linestatus) AS any_status,
           string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS status_csv,
           round(sum(DISTINCT l_quantity), 2) AS sum_distinct_qty,
           count(DISTINCT l_suppkey) AS n_supp
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a_misc_aggs(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.min("l_linestatus").alias("any_status"),
        F.concat_ws(",", F.array_sort(F.collect_set("l_linestatus"))).alias("status_csv"),
        F.round(F.sum_distinct(F.col("l_quantity")), 2).alias("sum_distinct_qty"),
        F.countDistinct("l_suppkey").alias("n_supp"),
    )


# --------------------------------------------------------------------------
# P8 — type-normalization projection pass (reference:
# spark_job_data_locker.py:339-379 — cast loop by name/type table)


@register(
    "p8_cast_normalize",
    """
    SELECT o_orderkey,
           CAST(o_custkey AS VARCHAR)            AS custkey_str,
           TRY_CAST(o_orderpriority AS BIGINT)   AS prio_int,
           CAST(floor(o_totalprice) AS BIGINT)   AS price_int,
           strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_date,
           (o_orderstatus = 'O')                 AS is_open
    FROM orders
    """,
)
def p8_cast_normalize(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_custkey").cast("string").alias("custkey_str"),
        F.col("o_orderpriority").try_cast("bigint").alias("prio_int"),
        F.floor("o_totalprice").cast("bigint").alias("price_int"),
        F.date_format(F.col("o_orderdate"), "yyyy-MM-dd").alias("order_date"),
        (F.col("o_orderstatus") == "O").alias("is_open"),
    )


# --------------------------------------------------------------------------
# U1 — UNION ALL assembly of per-type slices (reference: the _TABLE_SUFFIX
# wildcard union, fact/insert_registration.sql:12-14; update_user_map.sql:54-120)


@register(
    "u1_union_assembly",
    """
    WITH unioned AS (
      SELECT user_id, 'click' AS src, value FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT user_id, 'view' AS src, value FROM events WHERE event_type = 'view'
      UNION ALL
      SELECT user_id, 'purchase' AS src, value FROM events WHERE event_type = 'purchase'
    )
    SELECT user_id, src, count(*) AS n, round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 3) AS total
    FROM unioned GROUP BY user_id, src
    """,
)
def u1_union_assembly(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    slices = [
        ev.where(F.col("event_type") == t).select(
            "user_id", F.lit(t).alias("src"), "value"
        )
        for t in ("click", "view", "purchase")
    ]
    unioned = slices[0].unionByName(slices[1]).unionByName(slices[2])
    return unioned.groupBy("user_id", "src").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum(_dec("value")).cast("double"), 3).alias("total")
    )


# --------------------------------------------------------------------------
# F2/S9 — pseudonymization: SHA-256 map of user ids, joined back
# (reference: mod_load_data_gdpr.sql:27-52 — MERGE map + field rewrite)


@register(
    "f_pseudonymize",
    """
    WITH pmap AS (
      SELECT DISTINCT user_id,
             sha256('pepper|' || CAST(user_id AS VARCHAR)) AS pseudo
      FROM events
    )
    SELECT p.pseudo, count(*) AS n_events,
           round(CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE), 3) AS total_value
    FROM events e JOIN pmap p USING (user_id)
    GROUP BY p.pseudo
    """,
)
def f_pseudonymize(spark, sf_dir):
    from .functions import pseudonymize

    ev = _t(spark, sf_dir, "events")
    pmap = ev.select("user_id").distinct().select(
        "user_id", pseudonymize("user_id").alias("pseudo")
    )
    return (
        ev.join(pmap, "user_id")
        .groupBy("pseudo")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(_dec("value")).cast("double"), 3).alias("total_value"),
        )
    )


# --------------------------------------------------------------------------
# T4 — accumulating snapshot with carry-forward totals (reference:
# insert_user_history.sql:267-287 — x_total = prev_total + today). The
# engine's operational form is MERGE state-in-table; the query form is the
# equivalent running total per user per active day.


@register(
    "t4_carry_forward_totals",
    """
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day_,
             count(*) AS daily_events,
             round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 3) AS daily_value
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    )
    SELECT user_id, strftime(day_, '%Y-%m-%d') AS day_str,
           daily_events, daily_value,
           CAST(sum(daily_events) OVER w AS BIGINT) AS total_events,
           round(sum(daily_value) OVER w, 3) AS total_value,
           row_number() OVER w AS active_day_nr
    FROM daily
    WINDOW w AS (PARTITION BY user_id ORDER BY day_
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def t4_carry_forward_totals(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day_")).agg(
        F.count(F.lit(1)).alias("daily_events"),
        F.round(F.sum(_dec("value")).cast("double"), 3).alias("daily_value"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day_")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily.select(
        "user_id",
        F.date_format("day_", "yyyy-MM-dd").alias("day_str"),
        "daily_events",
        "daily_value",
        F.sum("daily_events").over(w).alias("total_events"),
        F.round(F.sum("daily_value").over(w), 3).alias("total_value"),
        F.row_number().over(w).alias("active_day_nr"),
    )


# --------------------------------------------------------------------------
# The reference's flagship: config-driven accumulating snapshot
# (insert_user_history.sql:151-311 / user_history_parser.py:59-209),
# day-by-day incremental advance — compared against a full-history
# recompute in the oracle.


@register(
    "snapshot_user_history",
    """
    WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS date_, event_type, value FROM events),
    last_day AS (SELECT max(date_) AS d FROM ev),
    daily AS (
      SELECT user_id, date_,
             count(*) AS n_events,
             sum(CASE WHEN event_type = 'purchase'
                      THEN CAST(coalesce(value, 0) AS DECIMAL(18,2))
                      ELSE CAST(0 AS DECIMAL(18,2)) END) AS revenue,
             max(value) AS max_value
      FROM ev GROUP BY user_id, date_
    )
    SELECT d.user_id,
           strftime(min(d.date_), '%Y-%m-%d') AS registration_date,
           strftime((SELECT d FROM last_day), '%Y-%m-%d') AS date_,
           coalesce(max(CASE WHEN d.date_ = (SELECT d FROM last_day) THEN d.n_events END), 0) AS n_events,
           round(CAST(coalesce(max(CASE WHEN d.date_ = (SELECT d FROM last_day) THEN d.revenue END), 0) AS DOUBLE), 3) AS revenue,
           round(coalesce(max(CASE WHEN d.date_ = (SELECT d FROM last_day) THEN d.max_value END), 0), 3) AS max_value,
           CAST(sum(d.n_events) AS BIGINT) AS n_events_total,
           round(CAST(sum(d.revenue) AS DOUBLE), 3) AS revenue_total,
           round(max(d.max_value), 3) AS max_value_total
    FROM daily d GROUP BY d.user_id
    """,
)
def snapshot_user_history(spark, sf_dir):
    from .plans import MaterializedField, run_snapshot_pipeline

    fields = [
        MaterializedField("n_events", "count(*)", "bigint", totals=True),
        MaterializedField(
            "revenue",
            # exact decimal sum: order-independent, hash-stable (see _dec)
            "sum(CASE WHEN event_type = 'purchase'"
            " THEN CAST(coalesce(value, 0) AS DECIMAL(18,2))"
            " ELSE CAST(0 AS DECIMAL(18,2)) END)",
            "decimal(28,2)", totals=True,
        ),
        MaterializedField(
            "max_value", "max(value)", "double",
            totals=True, formula="greatest({prev}, {new})",
        ),
    ]
    ev = _t(spark, sf_dir, "events").withColumn("date_", F.to_date("ts"))
    snap = run_snapshot_pipeline(ev, fields, user_col="user_id")
    return snap.select(
        "user_id",
        F.date_format("registration_date", "yyyy-MM-dd").alias("registration_date"),
        F.date_format("date_", "yyyy-MM-dd").alias("date_"),
        "n_events",
        F.round(F.col("revenue").cast("double"), 3).alias("revenue"),
        F.round("max_value", 3).alias("max_value"),
        "n_events_total",
        F.round(F.col("revenue_total").cast("double"), 3).alias("revenue_total"),
        F.round("max_value_total", 3).alias("max_value_total"),
    )
