"""Incremental daily/weekly/monthly rollups driven by partition-close
marks (reference insert_user_history_derivates.sql)."""

import datetime as dt

import duckdb
import pytest
from pyspark.sql import functions as F

from etl_spark.cdc.apply import apply_batch
from etl_spark.cdc.engine import CdcEngine
from etl_spark.cdc.partitions import close_due_partitions
from etl_spark.datagen import gen_changes
from etl_spark.rollups import create_rollup_views, refresh_rollups
from tests.conftest import assert_pdf_equal


@pytest.fixture()
def setup(spark, tmp_path):
    eng = CdcEngine(spark, str(tmp_path / "tbl"), num_buckets=4)
    log = gen_changes(spark, 150_000, n_convs=60, n_epochs=3).cache()
    for ep in range(2):
        apply_batch(eng.table, log.where(F.col("epoch") == ep).drop("epoch"), epoch=ep)
    far = dt.datetime(2026, 1, 1)
    close_due_partitions(eng.table, now=far)  # closes every day (forced)
    return eng.table, log, str(tmp_path / "rollups")


def _oracle_daily(table, days):
    pdf = table.snapshot_df().toPandas()
    con = duckdb.connect()
    con.register("t", pdf)
    return con.execute(
        """
        SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day_,
               count(*) AS n_turns,
               count(DISTINCT conv_id) AS active_convs,
               CAST(sum(CASE WHEN tool IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS tool_calls,
               CAST(sum(length(text)) AS BIGINT) AS total_chars
        FROM t WHERE CAST(CAST(ts AS DATE) AS VARCHAR) IN ({})
        GROUP BY 1
        """.format(",".join(f"'{d}'" for d in days))
    ).df()


def test_initial_refresh_matches_oracle(spark, setup):
    table, log, dst = setup
    res = refresh_rollups(table, dst)
    assert res["days"], "closed days must be computed on first refresh"
    views = create_rollup_views(spark, dst)
    assert set(views) == {"rollup_daily", "rollup_weekly", "rollup_monthly"}
    got = spark.table("rollup_daily").toPandas()
    got["day_"] = got["day_"].astype(str)
    want = _oracle_daily(table, res["days"])
    assert_pdf_equal(got, want, ["day_"])
    # weekly is per-source COUNT DISTINCT, not a fold of daily
    wk = spark.table("rollup_weekly").toPandas()
    assert (wk.active_convs <= got.active_convs.sum()).all()

    # idempotent: nothing to do the second time
    assert refresh_rollups(table, dst) == {"days": [], "weeks": [], "months": [], "restated": []}


def test_restatement_recomputes_only_changed_days(spark, setup):
    """Late data into CLOSED days: restatements() flags exactly the
    affected days from metadata, the next refresh re-derives exactly
    those days and their weeks/months (nothing else recomputes), and a
    further refresh is a no-op."""
    from etl_spark.cdc.partitions import restatements
    from etl_spark.rollups import _week_start

    table, log, dst = setup
    first = refresh_rollups(table, dst)
    assert first["restated"] == []  # first-time closures, not restatements
    # late data lands in SOME closed days (a time slice of epoch 2) →
    # exactly those leaf sets change → exactly those days re-state
    late_batch = log.where(
        (F.col("epoch") == 2) & (F.col("ts") < F.lit("2025-01-01 12:00:00"))
    ).drop("epoch")
    apply_batch(table, late_batch, epoch=2)
    table.refresh()
    flagged = {r["day"] for r in restatements(table)}
    assert flagged, "metadata-only restatement detection must fire"
    res = refresh_rollups(table, dst)
    assert res["days"], "restated closed days must recompute"
    # exactly the flagged days — closed days without late data stay put
    assert set(res["days"]) == flagged
    assert set(res["restated"]) == flagged  # all were previously rolled up
    untouched = set(first["days"]) - flagged
    assert untouched, "fixture must leave some closed days without late data"
    # exactly the affected weeks re-derive
    want_weeks = sorted({str(_week_start(dt.date.fromisoformat(d))) for d in flagged})
    assert res["weeks"] == want_weeks
    create_rollup_views(spark, dst)
    got = spark.table("rollup_daily").toPandas()
    got["day_"] = got["day_"].astype(str)
    got = got[got.day_.isin(res["days"])].reset_index(drop=True)
    want = _oracle_daily(table, res["days"])
    assert_pdf_equal(got, want, ["day_"])
    # exactly once: nothing left to re-state
    again = refresh_rollups(table, dst)
    assert again == {"days": [], "weeks": [], "months": [], "restated": []}
    log.unpersist()
