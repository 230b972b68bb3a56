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


def test_erased_day_republishes_zero_row(spark, setup):
    """A recomputed day whose snapshot went to zero rows must OVERWRITE
    its daily partition with an explicit zero row — dynamic partition
    overwrite only replaces partitions present in the output, so the
    groupBy's no-row-for-empty-day behavior used to leave the stale
    pre-erasure rollup published forever (defeating GDPR downstream)."""
    from etl_spark.cdc.maintenance import delete_where

    table, log, dst = setup
    first = refresh_rollups(table, dst)
    victim_day = first["days"][0]
    create_rollup_views(spark, dst)
    before = spark.table("rollup_daily").toPandas()
    before["day_"] = before["day_"].astype(str)
    assert int(before[before.day_ == victim_day].n_turns.iloc[0]) > 0

    nxt = str(dt.date.fromisoformat(victim_day) + dt.timedelta(days=1))
    delete_where(table, f"ts < timestamp'{nxt} 00:00:00'", request_id=1)
    table.refresh()
    res = refresh_rollups(table, dst)
    assert victim_day in res["days"]
    create_rollup_views(spark, dst)
    after = spark.table("rollup_daily").toPandas()
    after["day_"] = after["day_"].astype(str)
    row = after[after.day_ == victim_day]
    assert len(row) == 1
    assert (
        int(row.n_turns.iloc[0]) == 0
        and int(row.active_convs.iloc[0]) == 0
        and int(row.tool_calls.iloc[0]) == 0
        and int(row.total_chars.iloc[0]) == 0
    )


def test_compaction_does_not_force_recompute(spark, setup):
    """Compaction rewrites bases without changing logical state; change
    detection must track DELTA leaves only (monotone union), or every
    maintenance run re-aggregates all history and mislabels it
    'restated'."""
    table, log, dst = setup
    refresh_rollups(table, dst)
    need = table.buckets_needing_compaction() or list(range(table.num_buckets))
    table.compact(need)
    table.refresh()
    assert refresh_rollups(table, dst) == {
        "days": [], "weeks": [], "months": [], "restated": []
    }


def test_weekly_excludes_open_days(spark, tmp_path):
    """Weekly/monthly windows must aggregate CLOSED days only: a week
    containing a still-open day otherwise publishes a value that includes
    half-ingested rows and changes with every refresh."""
    eng = CdcEngine(spark, str(tmp_path / "tbl"), num_buckets=4)
    log = gen_changes(spark, 150_000, n_convs=60, n_epochs=1).drop("epoch")
    apply_batch(eng.table, log, epoch=0)
    table = eng.table
    # force-close ONLY day 1 (2025-01-01): deadline = day end + 12h
    newly = close_due_partitions(table, now=dt.datetime(2025, 1, 2, 13))
    closed_days = {m["day"] for m in newly}
    assert closed_days == {"2025-01-01"}

    dst = str(tmp_path / "rollups")
    res = refresh_rollups(table, dst)
    assert res["days"] == ["2025-01-01"]
    create_rollup_views(spark, dst)
    daily = spark.table("rollup_daily").toPandas()
    weekly = spark.table("rollup_weekly").toPandas()
    # the week of Jan 1 contains open days (Jan 2+) with real rows — the
    # weekly row must cover exactly the one closed day
    assert int(weekly.n_turns.sum()) == int(daily.n_turns.sum())
    assert int(weekly.total_chars.sum()) == int(daily.total_chars.sum())


def test_payload_less_delete_restates_closed_days(spark, tmp_path):
    """A NULL-ts (payload-less) delete lands in the hive default
    partition — no day leaf changes, so neither restatements() nor the
    rollup state used to notice, and the victim day's published rollup
    stayed stale FOREVER (GDPR-hostile; found by the rollup property
    soak). A new NULL-day delta leaf must now re-derive every closed
    day, exactly once."""
    import datetime as dt

    from etl_spark.cdc.engine import CHANGE_SCHEMA
    from etl_spark.cdc.partitions import restatements

    eng = CdcEngine(spark, str(tmp_path / "t"), num_buckets=4)
    t = eng.table
    dst = str(tmp_path / "rollups")
    rows = [
        ("I", "k", 0, "user", "hello", None,
         dt.datetime(2025, 1, 28, 12), dt.datetime(2025, 3, 1), 1),
        ("I", "m", 0, "user", "bye", None,
         dt.datetime(2025, 1, 29, 12), dt.datetime(2025, 3, 1), 2),
    ]
    apply_batch(t, spark.createDataFrame(rows, schema=CHANGE_SCHEMA), epoch=0)
    close_due_partitions(t, now=dt.datetime(2026, 1, 1))
    assert refresh_rollups(t, dst)["days"] == ["2025-01-28", "2025-01-29"]

    apply_batch(t, spark.createDataFrame(
        [("D", "k", 0, None, None, None, None, dt.datetime(2025, 3, 2), 3)],
        schema=CHANGE_SCHEMA), epoch=1)
    t.refresh()
    # the metadata sensor flags EVERY closed day for the NULL-day leaf
    assert {r["day"] for r in restatements(t)} == {"2025-01-28", "2025-01-29"}
    res = refresh_rollups(t, dst)
    assert res["restated"] == ["2025-01-28", "2025-01-29"]
    got = {str(r.day_): r.n_turns
           for r in spark.read.parquet(dst + "/daily").collect()}
    assert got == {"2025-01-28": 0, "2025-01-29": 1}  # victim day zeroed
    # exactly once: the consumed NULL-day leaf doesn't re-trigger
    assert refresh_rollups(t, dst)["days"] == []

def test_payload_less_delete_survives_compaction(spark, tmp_path):
    """ADVICE r4: null_new used to be computed from LIVE NULL-day delta
    leaves only, but compaction removes folded delta leaves from live
    metadata — a payload-less delete compacted between two refreshes was
    never detected and the victim day's rollup stayed stale forever.
    Detection now diffs against the monotone commit-time
    ``null_day_delta_log``, which compaction cannot erase."""
    import datetime as dt

    from etl_spark.cdc.engine import CHANGE_SCHEMA
    from etl_spark.cdc.partitions import restatements

    eng = CdcEngine(spark, str(tmp_path / "t"), num_buckets=2)
    t = eng.table
    dst = str(tmp_path / "rollups")
    rows = [
        ("I", "k", 0, "user", "hello", None,
         dt.datetime(2025, 1, 28, 12), dt.datetime(2025, 3, 1), 1),
        ("I", "m", 0, "user", "bye", None,
         dt.datetime(2025, 1, 29, 12), dt.datetime(2025, 3, 1), 2),
    ]
    apply_batch(t, spark.createDataFrame(rows, schema=CHANGE_SCHEMA), epoch=0)
    close_due_partitions(t, now=dt.datetime(2026, 1, 1))
    assert refresh_rollups(t, dst)["days"] == ["2025-01-28", "2025-01-29"]

    apply_batch(t, spark.createDataFrame(
        [("D", "k", 0, None, None, None, None, dt.datetime(2025, 3, 2), 3)],
        schema=CHANGE_SCHEMA), epoch=1)
    # fold the NULL-day delta leaf into a base BEFORE any refresh sees it
    t.refresh()
    t.compact(list(range(t.num_buckets)))
    t.refresh()
    live_null = [
        e["path"] for slot in t._meta["files"].values() for e in slot["deltas"]
        if "_day=__HIVE_DEFAULT_PARTITION__" in e["path"]
    ]
    assert live_null == [], "precondition: compaction folded the NULL-day leaf"
    # the metadata sensor still flags every closed day (monotone log)
    assert {r["day"] for r in restatements(t)} == {"2025-01-28", "2025-01-29"}
    res = refresh_rollups(t, dst)
    assert res["restated"] == ["2025-01-28", "2025-01-29"]
    got = {str(r.day_): r.n_turns
           for r in spark.read.parquet(dst + "/daily").collect()}
    assert got == {"2025-01-28": 0, "2025-01-29": 1}  # victim day zeroed
    # exactly once, and the log keeps the folded leaf without re-triggering
    assert refresh_rollups(t, dst)["days"] == []

    # a day closed AFTER the fold must carry the folded leaf in its close
    # baseline: a later insert into a new day, closed now, restates only
    # via its OWN leaves — the historical NULL leaf is not "new" to it
    apply_batch(t, spark.createDataFrame(
        [("I", "z", 0, "user", "late", None,
          dt.datetime(2025, 2, 10, 12), dt.datetime(2025, 3, 3), 4)],
        schema=CHANGE_SCHEMA), epoch=2)
    t.refresh()
    close_due_partitions(t, now=dt.datetime(2026, 1, 2))
    # the advisory report keeps flagging the folded leaf against days
    # closed BEFORE it existed (stateless metadata diff — consumers keep
    # their own seen-set, as refresh_rollups does), but the day closed
    # AFTER the fold carries the leaf in its baseline and is NOT flagged
    assert {r["day"] for r in restatements(t)} == {"2025-01-28", "2025-01-29"}
    assert refresh_rollups(t, dst)["days"] == ["2025-02-10"]
