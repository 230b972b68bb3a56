"""Operator-coverage queries for the driver's correctness gate.

Each entry implements one operator family from SURVEY.md §2 as idiomatic
DataFrame code over the driver's parquet tables, paired with an ANSI-SQL
oracle that DuckDB runs on the same data. Conventions for hash-stable
comparison (driver sorts columns by name, hashes values):

  * every computed column aliased identically in Spark and SQL;
  * timestamps exported as epoch microseconds (``*_us``) — avoids
    tz/format drift between Spark (session UTC) and DuckDB (naive);
  * floating aggregates rounded (3-4 dp) on BOTH sides — Spark and DuckDB
    sum in different orders, so raw double sums differ in the last ulps.

Reference citations per query point at the construct being re-expressed.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .cdc.dedup import lww_dedup

# --------------------------------------------------------------------------
# helpers

def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")



def _us(col) -> "F.Column":
    """Epoch microseconds; testdata timestamps are TIMESTAMP_NTZ, so cast
    (session tz is pinned UTC → matches DuckDB's naive epoch_us)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def _dec(col) -> "F.Column":
    """Exact decimal view of a 2-decimal money-ish double column.

    Float SUMs in an unordered hash aggregation accumulate in shuffle
    row order, so a result sitting on a round() boundary can flip between
    runs — a hashed correctness gate must sum EXACTLY. The fixtures'
    doubles all carry ≤2 decimals, so DECIMAL(18,2) represents them
    exactly in both Spark and DuckDB; arithmetic/sums in decimal are
    order-independent, and the final cast back to double is the same
    deterministic conversion on both engines. (Sums over integer-valued
    doubles and ORDERED window frames don't need this — those are
    already order-safe / fixed-order.)"""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,2)")

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


# --------------------------------------------------------------------------
# W1 — the engine's flagship: last-writer-wins dedup rank
# (reference: mod_load_data_get_data.sql:10-32, DESC per north rule)

@register(
    "w1_lww_dedup",
    """
    WITH ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
           round(value, 3) AS value_r, props
    FROM ranked WHERE rn = 1
    """,
)
def w1_lww_dedup(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    out = lww_dedup(ev, key=["user_id", "event_type"], order=["ts", "event_id"])
    return out.select(
        "user_id", "event_type",
        _us("ts").alias("ts_us"), "event_id",
        F.round("value", 3).alias("value_r"), "props",
    )


# --------------------------------------------------------------------------
# A1-A4 — hash aggregation with conditional/distinct aggregates
# (reference: insert_user_history.sql:59-69,124-128)

@register(
    "a1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                         AS sum_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_base_price,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS sum_disc_price,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,2)))
                          * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE), 2) AS sum_charge,
           round(avg(l_quantity), 4)                                         AS avg_qty,
           round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
                 / count(l_discount), 4)                                     AS avg_disc,
           count(*)                                                          AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def a1_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") <= "1998-09-02")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum(_dec("l_extendedprice")).cast("double"), 2).alias("sum_base_price"),
        F.round(F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount"))).cast("double"), 2).alias("sum_disc_price"),
        F.round(F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount")) * (1 + _dec("l_tax"))).cast("double"), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.sum(_dec("l_discount")).cast("double") / F.count("l_discount"), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "a2_user_metrics",
    """
    SELECT user_id,
           count(*)                                                   AS n_events,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT)                                            AS n_purchases,
           count(DISTINCT CASE WHEN event_type = 'purchase'
                               THEN CAST(ts AS DATE) END)             AS purchase_days,
           round(CAST(sum(CASE WHEN event_type = 'purchase'
                          THEN CAST(value AS DECIMAL(18,2)) ELSE 0 END)
                      AS DOUBLE), 3)                                  AS revenue,
           round(max(value), 3)                                       AS max_value
    FROM events
    GROUP BY user_id
    HAVING count(*) > 1
    """,
)
def a2_user_metrics(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    is_p = F.col("event_type") == "purchase"
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(is_p, 1).otherwise(0)).alias("n_purchases"),
            F.countDistinct(F.when(is_p, F.to_date("ts"))).alias("purchase_days"),
            F.round(F.sum(F.when(is_p, _dec("value")).otherwise(0)).cast("double"), 3).alias("revenue"),
            F.round(F.max("value"), 3).alias("max_value"),
        )
        .where(F.col("n_events") > 1)
    )


# --------------------------------------------------------------------------
# W2 — first-event pick with NULL-demoting sort (insert_registration.sql:18-23)

@register(
    "w2_first_event",
    """
    WITH ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY user_id
        ORDER BY (props IS NULL), ts ASC, event_id ASC) AS rn
      FROM events
    )
    SELECT user_id, event_type AS first_event_type,
           epoch_us(ts) AS first_ts_us, event_id AS first_event_id
    FROM ranked WHERE rn = 1
    """,
)
def w2_first_event(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("props").isNull().asc(), F.col("ts").asc(), F.col("event_id").asc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("first_event_type"),
            _us("ts").alias("first_ts_us"),
            F.col("event_id").alias("first_event_id"),
        )
    )


# --------------------------------------------------------------------------
# W5/W7 — sessionization: gap>30min split, then per-session bounds
# (reference: fact/insert_sessions.sql:38-41)

@register(
    "w5_sessions",
    """
    WITH g AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT *, sum(new_sess) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM g
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           epoch_us(min(ts)) AS start_us, epoch_us(max(ts)) AS end_us,
           count(*) AS n_events,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 3) AS session_value
    FROM s GROUP BY user_id, session_seq
    """,
)
def w5_sessions(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.withColumn(
        "new_sess",
        F.when(
            (_us("ts") - F.lag(_us("ts")).over(w) > 1_800_000_000)
            | F.lag("ts").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    s = g.withColumn(
        "session_seq",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return s.groupBy("user_id", "session_seq").agg(
        _us(F.min("ts")).alias("start_us"),
        _us(F.max("ts")).alias("end_us"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(_dec("value")).cast("double"), 3).alias("session_value"),
    )


# --------------------------------------------------------------------------
# W8 — LAG gap detection (event_loss.yaml:14-19)

@register(
    "w8_lag_gaps",
    """
    WITH g AS (
      SELECT user_id,
             event_id - lag(event_id) OVER (
               PARTITION BY user_id ORDER BY event_id) - 1 AS gap
      FROM events
    )
    SELECT user_id, count(*) AS n_pairs,
           CAST(sum(CASE WHEN gap > 0 THEN gap ELSE 0 END) AS BIGINT) AS missing,
           max(gap) AS max_gap
    FROM g WHERE gap IS NOT NULL GROUP BY user_id
    """,
)
def w8_lag_gaps(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    g = ev.withColumn("gap", F.col("event_id") - F.lag("event_id").over(w) - 1)
    return (
        g.where(F.col("gap").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.when(F.col("gap") > 0, F.col("gap")).otherwise(0)).alias("missing"),
            F.max("gap").alias("max_gap"),
        )
    )


# --------------------------------------------------------------------------
# J1 — LEFT join fact ⟕ pre-aggregated metrics (insert_user_history.sql:293-296)

@register(
    "j1_left_join_preagg",
    """
    WITH m AS (
      SELECT o_custkey, count(*) AS n_orders, round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_total
      FROM orders GROUP BY o_custkey
    )
    SELECT c.c_custkey, c.c_name, c.c_mktsegment,
           coalesce(m.n_orders, 0) AS n_orders,
           coalesce(m.sum_total, 0.0) AS sum_total
    FROM customer c LEFT JOIN m ON c.c_custkey = m.o_custkey
    """,
)
def j1_left_join_preagg(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    m = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum(_dec("o_totalprice")).cast("double"), 2).alias("sum_total"),
    )
    return (
        c.join(m, c.c_custkey == m.o_custkey, "left")
        .select(
            "c_custkey", "c_name", "c_mktsegment",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("sum_total", F.lit(0.0)).alias("sum_total"),
        )
    )


# --------------------------------------------------------------------------
# J3 — FULL OUTER cohort join with coalesced keys
# (insert_appsflyer_aggregated_user_history.sql:341-361)

@register(
    "j3_full_outer_cohort",
    """
    WITH a AS (
      SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_,
             count(*) AS n_orders, round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS order_total
      FROM orders GROUP BY 1
    ), b AS (
      SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m-%d') AS month_,
             count(*) AS n_lines, round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS ship_total
      FROM lineitem GROUP BY 1
    )
    SELECT coalesce(a.month_, b.month_) AS month_,
           coalesce(a.n_orders, 0) AS n_orders,
           coalesce(a.order_total, 0.0) AS order_total,
           coalesce(b.n_lines, 0) AS n_lines,
           coalesce(b.ship_total, 0.0) AS ship_total
    FROM a FULL OUTER JOIN b ON a.month_ = b.month_
    """,
)
def j3_full_outer_cohort(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    a = o.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum(_dec("o_totalprice")).cast("double"), 2).alias("order_total"),
    )
    b = li.groupBy(
        F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM-dd").alias("month_")
    ).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.sum(_dec("l_extendedprice")).cast("double"), 2).alias("ship_total"),
    )
    return (
        a.join(b, "month_", "full_outer")
        .select(
            "month_",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("order_total", F.lit(0.0)).alias("order_total"),
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
            F.coalesce("ship_total", F.lit(0.0)).alias("ship_total"),
        )
    )


# --------------------------------------------------------------------------
# J6/J7 — anti / semi joins (mod_data_insert.sql:5-6; gdpr_delete_request.sql:31-35)

@register(
    "j6_anti_join",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
    """,
)
def j6_anti_join(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "j7_semi_join",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
    """,
)
def j7_semi_join(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 100000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


# --------------------------------------------------------------------------
# J1-small — broadcast dimension chain (insert_user_history.sql:104-108 VAT join)

@register(
    "j_broadcast_dims",
    """
    SELECT r.r_name AS region, n.n_name AS nation,
           count(*) AS n_lines,
           round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def j_broadcast_dims(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount"))).cast("double"), 2).alias("revenue"),
        )
    )


# --------------------------------------------------------------------------
# W4-style — top-k per group via rank (spark_job_cost_etl.py:358-363)

@register(
    "topk_orders_per_customer",
    """
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
      FROM orders
    )
    SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice, rk
    FROM ranked WHERE rk <= 3
    """,
)
def topk_orders_per_customer(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        o.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("totalprice"), "rk")
    )


# --------------------------------------------------------------------------
# U1/U2/U3 — set operations (update_user_map.sql:54-120; event_loss.yaml:37-47)

@register(
    "u_set_ops",
    """
    SELECT DISTINCT user_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day_
    FROM events WHERE event_type = 'purchase'
    EXCEPT
    SELECT DISTINCT user_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day_
    FROM events WHERE event_type = 'error'
    """,
)
def u_set_ops(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    day = F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day_")
    buys = ev.where(F.col("event_type") == "purchase").select("user_id", day).distinct()
    errs = ev.where(F.col("event_type") == "error").select("user_id", day).distinct()
    # EXCEPT DISTINCT directly — inputs are already distinct, so
    # exceptAll().distinct() computes the same set with one extra
    # hash-aggregate stage
    return buys.subtract(errs)


# --------------------------------------------------------------------------
# Scalar-function suite: date_trunc, JSON extraction, hash/pseudonymization
# (mod_load_data_gdpr.sql:33 TO_BASE64(SHA256(...)); update_user_map.sql:36 JSON_VALUE)

@register(
    "f_scalar_suite",
    """
    SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week_,
           count(*) AS n,
           round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
           max(sha256(concat(event_type, '|', CAST(event_id AS VARCHAR)))) AS max_hash,
           max(greatest(value, 100.0)) AS max_ge
    FROM events GROUP BY 1
    """,
)
def f_scalar_suite(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_format(F.date_trunc("week", "ts"), "yyyy-MM-dd").alias("week_")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(F.get_json_object("props", "$.k").cast("long")), 4).alias("avg_k"),
        F.max(
            F.sha2(F.concat(F.col("event_type"), F.lit("|"), F.col("event_id").cast("string")), 256)
        ).alias("max_hash"),
        F.max(F.greatest(F.col("value"), F.lit(100.0))).alias("max_ge"),
    )


# --------------------------------------------------------------------------
# Text analysis over documents (training-data pipeline ops)

_STOPWORDS = "the a of and to in is it on for"


@register(
    "doc_stats",
    f"""
    WITH t AS (
      SELECT lang, source, n_chars,
             regexp_split_to_array(trim(text), '\\s+') AS toks
      FROM documents
    )
    SELECT lang, source,
           count(*)                                       AS n_docs,
           round(avg(len(toks)), 4)                       AS avg_tokens,
           round(avg(n_chars), 4)                         AS avg_chars,
           round(avg(CAST(len(list_filter(toks,
                 x -> list_contains({_STOPWORDS.split()!r}, x))) AS DOUBLE)
                 / len(toks)), 4)                         AS stopword_ratio
    FROM t GROUP BY lang, source
    """,
)
def doc_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    stop = F.array(*[F.lit(w) for w in _STOPWORDS.split()])
    t = d.select(
        "lang", "source", "n_chars",
        F.size(toks).alias("n_toks"),
        F.size(F.filter(toks, lambda x: F.array_contains(stop, x))).alias("n_stop"),
    )
    return t.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_toks"), 4).alias("avg_tokens"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.round(F.avg(F.col("n_stop").cast("double") / F.col("n_toks")), 4).alias("stopword_ratio"),
    )


@register(
    "doc_exact_dedup",
    """
    SELECT md5(substr(lower(text), 1, 40)) AS text_hash,
           count(*) AS n_dups, min(doc_id) AS keep_id
    FROM documents GROUP BY 1 HAVING count(*) > 1
    """,
)
def doc_exact_dedup(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5(F.substring(F.lower(F.col("text")), 1, 40)).alias("text_hash"))
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min("doc_id").alias("keep_id"))
        .where(F.col("n_dups") > 1)
    )


@register(
    "doc_fingerprint",
    """
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
      FROM documents
    )
    SELECT doc_id,
           list_min(list_transform(toks, x -> md5(x))) AS min_sig,
           list_max(list_transform(toks, x -> md5(x))) AS max_sig,
           len(list_distinct(toks)) AS n_distinct_tokens
    FROM t
    """,
)
def doc_fingerprint(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    sigs = F.transform(toks, lambda x: F.md5(x))
    return d.select(
        "doc_id",
        F.array_min(sigs).alias("min_sig"),
        F.array_max(sigs).alias("max_sig"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
    )


# --------------------------------------------------------------------------
# Similarity search: brute-force cosine top-k (ANN baseline)

@register(
    "sim_cosine_topk",
    """
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             list_dot_product(CAST(q.qv AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
               / (sqrt(list_dot_product(CAST(q.qv AS DOUBLE[]), CAST(q.qv AS DOUBLE[])))
                * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))) AS cos
      FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rk
      FROM scored
    )
    SELECT query_id, neighbor_id, round(cos, 4) AS cos_r, rk
    FROM ranked WHERE rk <= 5
    """,
)
def sim_cosine_topk(spark, sf_dir):
    from .operators.similarity import cosine_topk

    e = _t(spark, sf_dir, "embeddings")
    qd = e.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    return cosine_topk(e, qd, k=5)


# --------------------------------------------------------------------------
# extension registries (import side effect: they register into QUERIES/ORACLES)

from . import (  # noqa: E402,F401
    queries_cdc,
    queries_corpus,
    queries_derivates,
    queries_enrich,
    queries_ext,
)
