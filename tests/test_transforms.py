"""Derived-transform layer: CDC replay → snapshot → enrich/aggregate,
verified against DuckDB computing the same transforms over the oracle
final state (end-to-end: the derived numbers are right only if the
upsert, dedup, tombstones, and schema evolution were all right)."""

import duckdb
import pytest

from etl_spark.cdc.engine import CdcEngine
from etl_spark.datagen import write_change_log
from etl_spark.transforms import conversation_summary, daily_activity, first_turns
from tests.conftest import assert_pdf_equal

N_EVENTS = 12_000


@pytest.fixture(scope="module")
def replayed(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("derive")
    log = str(root / "log")
    write_change_log(spark, log, N_EVENTS, n_convs=150, n_epochs=3)
    eng = CdcEngine(spark, str(root / "tbl"), num_buckets=8)
    eng.replay(log)
    return eng, log


def _oracle(log, sql):
    state = f"""
      WITH ranked AS (
        SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                  ORDER BY op_ts DESC, lsn DESC) AS rn
        FROM read_parquet('{log}/epoch=*/*.parquet')
      ), t AS (
        SELECT conv_id, turn_idx, role, text, tool, ts
        FROM ranked WHERE rn = 1 AND op <> 'D'
      )
    """
    return duckdb.sql(state + sql).df()


def test_conversation_summary(spark, replayed):
    eng, log = replayed
    got = conversation_summary(eng.table.snapshot_df()).toPandas()
    want = _oracle(log, """
      SELECT conv_id, count(*) AS n_turns, max(turn_idx) AS max_turn_idx,
             min(ts) AS first_ts, max(ts) AS last_ts,
             CAST(sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS BIGINT) AS n_user,
             CAST(sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) AS BIGINT) AS n_assistant,
             count(DISTINCT tool) AS n_distinct_tools,
             CAST(sum(length(text)) AS BIGINT) AS total_chars
      FROM t GROUP BY conv_id
    """)
    assert_pdf_equal(got, want, ["conv_id"])


def test_first_turns(spark, replayed):
    eng, log = replayed
    got = first_turns(eng.table.snapshot_df()).toPandas()
    want = _oracle(log, """
      SELECT conv_id, turn_idx, role, tool, ts FROM (
        SELECT *, row_number() OVER (PARTITION BY conv_id
                 ORDER BY (tool IS NULL), ts, turn_idx) AS rn2
        FROM t
      ) WHERE rn2 = 1
    """)
    assert_pdf_equal(got, want, ["conv_id"])


def test_daily_activity(spark, replayed):
    eng, log = replayed
    got = daily_activity(eng.table.snapshot_df()).toPandas()
    got["day_"] = got["day_"].astype(str)
    want = _oracle(log, """
      SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day_,
             count(DISTINCT conv_id) AS active_convs,
             count(*) AS n_turns,
             round(sum(CASE WHEN tool IS NOT NULL THEN 1 ELSE 0 END)
                   / CAST(count(*) AS DOUBLE), 4) AS tool_call_ratio
      FROM t WHERE ts IS NOT NULL GROUP BY 1
    """)
    assert_pdf_equal(got, want, ["day_"])


def test_incremental_summary_refresh(spark, tmp_path):
    """View refresh touches only dirty buckets, survives deletes, and is
    fenced (re-refresh with no new source snapshots is a no-op)."""
    from etl_spark.cdc.maintenance import delete_conversations
    from etl_spark.lake.table import LakeTable
    from etl_spark.transforms import refresh_conversation_summary

    log = str(tmp_path / "log")
    write_change_log(spark, log, 8_000, n_convs=100, n_epochs=4)
    eng = CdcEngine(spark, str(tmp_path / "tbl"), num_buckets=8)
    dst_path = str(tmp_path / "summary")

    eng.replay(log, stop_after=2)
    refresh_conversation_summary(eng.table, dst_path)
    dst = LakeTable(spark, dst_path)
    got1 = dst.snapshot_df().toPandas()
    want1 = conversation_summary(eng.table.snapshot_df()).toPandas()
    assert_pdf_equal(got1, want1, ["conv_id"])

    # more epochs + a GDPR delete, then an incremental refresh
    eng.replay(log)
    victims = [r.conv_id for r in eng.table.snapshot_df()
               .select("conv_id").distinct().limit(2).collect()]
    delete_conversations(eng.table, victims, request_id=1)
    refresh_conversation_summary(eng.table, dst_path)
    dst.refresh()
    got2 = dst.snapshot_df().toPandas()
    want2 = conversation_summary(eng.table.snapshot_df()).toPandas()
    assert_pdf_equal(got2, want2, ["conv_id"])
    assert not set(victims) & set(got2["conv_id"])  # deleted convs gone from view

    # fenced: nothing new in the source -> no-op
    v = dst.version
    assert refresh_conversation_summary(eng.table, dst_path) is None
    dst.refresh()
    assert dst.version == v


def test_refresh_survives_fully_deleted_bucket(spark, tmp_path):
    """Regression: if every conversation in a dirty bucket is deleted,
    the refresh must commit an EMPTY view bucket, not a dangling path
    that breaks all subsequent reads."""
    from etl_spark.cdc.maintenance import delete_conversations, expunge_tombstones
    from etl_spark.lake.table import LakeTable
    from etl_spark.transforms import refresh_conversation_summary

    log = str(tmp_path / "log")
    write_change_log(spark, log, 3_000, n_convs=30, n_epochs=1)
    eng = CdcEngine(spark, str(tmp_path / "tbl"), num_buckets=4)
    eng.replay(log)
    dst_path = str(tmp_path / "summary")
    refresh_conversation_summary(eng.table, dst_path)

    all_convs = [r.conv_id for r in eng.table.snapshot_df()
                 .select("conv_id").distinct().collect()]
    delete_conversations(eng.table, all_convs, request_id=1)
    refresh_conversation_summary(eng.table, dst_path)
    dst = LakeTable(spark, dst_path)
    assert dst.snapshot_df().count() == 0  # readable, empty — not bricked

    # same hazard in expunge: emptying buckets entirely must stay readable
    expunge_tombstones(eng.table, "2100-01-01 00:00:00")
    assert eng.table.snapshot_df().count() == 0
