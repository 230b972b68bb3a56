"""Config-driven accumulating snapshot (reference user_history semantics):
day-by-day incremental advance must equal a full-history recompute, and
no user may ever disappear from the snapshot."""

import duckdb
import pytest
from pyspark.sql import functions as F

from etl_spark.datagen import gen_events
from etl_spark.plans import MaterializedField, advance_snapshot, run_snapshot_pipeline
from tests.conftest import assert_pdf_equal

FIELDS = [
    MaterializedField("n_events", "count(*)", "bigint", totals=True),
    MaterializedField(
        "revenue",
        "sum(CASE WHEN event_name = 'purchase' THEN coalesce(paid_usd, 0) ELSE 0 END)",
        "double",
        totals=True,
    ),
    MaterializedField(
        "max_event_index", "max(event_index)", "bigint",
        totals=True, formula="greatest({prev}, {new})",
    ),
    MaterializedField("n_logins", "sum(CASE WHEN event_name = 'login' THEN 1 ELSE 0 END)", "bigint"),
]


@pytest.fixture(scope="module")
def events_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("plans") / "events")
    gen_events(spark, 20_000, n_users=120, n_days=6).write.mode("overwrite").parquet(path)
    return path


def test_incremental_equals_full_recompute(spark, events_path):
    ev = spark.read.parquet(events_path)
    got = run_snapshot_pipeline(ev, FIELDS).toPandas()
    got["registration_date"] = got["registration_date"].astype(str)
    got["date_"] = got["date_"].astype(str)
    got["revenue"] = got["revenue"].round(3)
    got["revenue_total"] = got["revenue_total"].round(3)

    want = duckdb.sql(f"""
      WITH ev AS (SELECT * FROM read_parquet('{events_path}/*.parquet')),
      last_day AS (SELECT max(date_) AS d FROM ev),
      daily AS (
        SELECT unique_id, date_,
               count(*) AS n_events,
               sum(CASE WHEN event_name = 'purchase' THEN coalesce(paid_usd, 0) ELSE 0 END) AS revenue,
               max(event_index) AS max_event_index,
               sum(CASE WHEN event_name = 'login' THEN 1 ELSE 0 END) AS n_logins
        FROM ev GROUP BY unique_id, date_
      )
      SELECT d.unique_id,
             strftime(min(d.date_), '%Y-%m-%d') AS registration_date,
             strftime((SELECT d FROM last_day), '%Y-%m-%d') AS date_,
             coalesce(max(CASE WHEN d.date_ = (SELECT d FROM last_day) THEN d.n_events END), 0) AS n_events,
             round(coalesce(max(CASE WHEN d.date_ = (SELECT d FROM last_day) THEN d.revenue END), 0), 3) AS revenue,
             coalesce(max(CASE WHEN d.date_ = (SELECT d FROM last_day) THEN d.max_event_index END), 0) AS max_event_index,
             CAST(coalesce(max(CASE WHEN d.date_ = (SELECT d FROM last_day) THEN d.n_logins END), 0) AS BIGINT) AS n_logins,
             CAST(sum(d.n_events) AS BIGINT) AS n_events_total,
             round(sum(d.revenue), 3) AS revenue_total,
             max(d.max_event_index) AS max_event_index_total
      FROM daily d GROUP BY d.unique_id
    """).df()
    assert_pdf_equal(got, want, ["unique_id"])


def test_no_user_ever_disappears(spark, events_path):
    """Reference invariant tests/user_history/mandatory/count.yaml:1-8:
    snapshot membership is monotone."""
    ev = spark.read.parquet(events_path)
    days = [str(r[0]) for r in ev.select("date_").distinct().orderBy("date_").collect()]
    snap = None
    seen = set()
    for day in days:
        snap = advance_snapshot(snap, ev.where(F.col("date_") == day), FIELDS, day)
        users = {r.unique_id for r in snap.select("unique_id").collect()}
        assert seen <= users  # nobody dropped
        assert len(users) == len(seen | users)
        seen = users
    # registration dims immutable (count.yaml:37-52): min-date users keep day-0 date
    regs = {r.unique_id: str(r.registration_date)
            for r in snap.select("unique_id", "registration_date").collect()}
    first_day_users = {r.unique_id for r in ev.where(F.col("date_") == days[0])
                       .select("unique_id").distinct().collect()}
    assert all(regs[u] == days[0] for u in first_day_users)


def test_algebraic_equals_iterative(spark, events_path):
    """The backfill optimizer (one two-level agg) must be value-identical
    to the day-by-day fold it replaces — including NULL-seeded totals."""
    ev = spark.read.parquet(events_path)
    fast = run_snapshot_pipeline(ev, FIELDS, algebraic=True).toPandas()
    loop = run_snapshot_pipeline(ev, FIELDS, algebraic=False).toPandas()
    for df in (fast, loop):
        for c in ("revenue", "revenue_total"):
            df[c] = df[c].round(3)
    assert_pdf_equal(fast, loop, ["unique_id"])


def test_non_associative_formula_falls_back(spark, events_path):
    decay = [MaterializedField("n_events", "count(*)", "double",
                               totals=True, formula="{prev} * 0.5 + {new}")]
    ev = spark.read.parquet(events_path)
    with pytest.raises(ValueError, match="non-associative"):
        run_snapshot_pipeline(ev, decay, algebraic=True)
    # auto mode silently takes the loop; result exists and keeps all users
    out = run_snapshot_pipeline(ev, decay)
    assert out.count() == ev.select("unique_id").distinct().count()
