"""Predicate DML: delete_where / update_where as fenced delta commits."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_spark.cdc.apply import apply_batch
from etl_spark.cdc.engine import CdcEngine
from etl_spark.cdc.maintenance import delete_where, update_where
from etl_spark.datagen import gen_changes

T = lambda s: dt.datetime.fromisoformat(s)


@pytest.fixture()
def loaded(spark, tmp_path):
    eng = CdcEngine(spark, str(tmp_path / "tbl"), num_buckets=4)
    changes = gen_changes(spark, 4_000, n_convs=40, n_epochs=1).drop("epoch")
    apply_batch(eng.table, changes, epoch=0)
    return eng


def test_delete_where(spark, loaded):
    eng = loaded
    before = eng.table.snapshot_df()
    pred = "role = 'tool'"
    n_match = before.where(pred).count()
    assert n_match > 0

    sid = delete_where(eng.table, pred, request_id=1)
    assert sid is not None
    after = eng.table.snapshot_df()
    assert after.where(pred).count() == 0
    assert after.count() == before.count() - n_match

    # fenced per request id
    assert delete_where(eng.table, pred, request_id=1) is None
    # a fresh request matching nothing commits a fencing-only delta
    assert delete_where(eng.table, "role = 'no_such_role'", request_id=2) is not None
    assert eng.table.snapshot_df().count() == after.count()


def test_update_where(spark, loaded):
    eng = loaded
    before = eng.table.snapshot_df()
    pred = "role = 'assistant' AND turn_idx = 1"
    n_match = before.where(pred).count()
    assert n_match > 0

    sid = update_where(
        eng.table,
        {"tool": "'redacted'", "text": "upper(text)"},
        pred,
        request_id=1,
    )
    assert sid is not None
    after = eng.table.snapshot_df()
    # row count unchanged; matched rows transformed; others untouched
    assert after.count() == before.count()
    got = after.where(pred)
    assert got.count() == n_match
    assert got.where(F.col("tool") != "redacted").count() == 0
    # SET may read the pre-image: text became upper(text)
    joined = (
        before.where(pred)
        .select("conv_id", "turn_idx", F.upper("text").alias("want"))
        .join(got.select("conv_id", "turn_idx", "text"), ["conv_id", "turn_idx"])
    )
    assert joined.where(F.col("text") != F.col("want")).count() == 0
    assert update_where(eng.table, {"tool": "'x'"}, pred, request_id=1) is None


def test_update_where_rejects_key_and_stats_columns(spark, loaded):
    with pytest.raises(ValueError):
        update_where(loaded.table, {"conv_id": "'x'"}, "true", request_id=9)
    with pytest.raises(ValueError):
        update_where(loaded.table, {"ts": "ts"}, "true", request_id=9)
    with pytest.raises(ValueError):
        update_where(loaded.table, {"nope": "'x'"}, "true", request_id=9)


def test_dml_loses_to_newer_stream_traffic(spark, loaded):
    """The stream owns the truth: a change with op_ts above the DML stamp
    re-creates a deleted key / overwrites an updated row."""
    eng = loaded
    victim = eng.table.snapshot_df().select("conv_id").first()["conv_id"]
    assert delete_where(eng.table, f"conv_id = '{victim}'", request_id=1) is not None
    assert eng.table.lookup(victim).count() == 0

    wm = eng.table.watermark_any()
    newer = spark.createDataFrame(
        [(victim, 0, "user", "back again", None, T("2025-06-01 00:00:00"),
          "I", T(wm) + dt.timedelta(seconds=1), 10_000_000)],
        "conv_id string, turn_idx int, role string, text string, tool string,"
        " ts timestamp, op string, op_ts timestamp, lsn long",
    )
    apply_batch(eng.table, newer, epoch=1)
    row = eng.table.lookup(victim).collect()
    assert len(row) == 1 and row[0]["text"] == "back again"


def test_dml_beats_everything_already_applied(spark, loaded):
    """An update wins over every pre-existing row even at equal op_ts
    (stamped one lsn above the max applied)."""
    eng = loaded
    pred = "turn_idx = 0"
    update_where(eng.table, {"text": "'wiped'"}, pred, request_id=1)
    after = eng.table.snapshot_df().where(pred)
    assert after.where(F.col("text") != "wiped").count() == 0


def test_dml_flows_through_change_feed(spark, loaded):
    """A DML commit is an ordinary delta commit: downstream incremental
    consumers see it as update_postimage/delete rows in the change feed
    (and replication therefore carries DML to replicas for free)."""
    eng = loaded
    v0 = eng.table.version
    pred = "role = 'assistant' AND turn_idx = 2"
    n_upd = eng.table.snapshot_df().where(pred).count()
    assert n_upd > 0
    update_where(eng.table, {"tool": "'patched'"}, pred, request_id=1)
    victim = eng.table.snapshot_df().select("conv_id").first()["conv_id"]
    n_del = eng.table.snapshot_df().where(F.col("conv_id") == victim).count()
    delete_where(eng.table, f"conv_id = '{victim}'", request_id=2)

    feed = eng.table.changes_between(v0).groupBy("_change_type").count()
    got = {r["_change_type"]: r["count"] for r in feed.collect()}
    # the updated rows of the deleted conversation show as deletes, not
    # updates (the feed diffs END states, not intermediate commits)
    overlap = eng.table.as_of(v0).snapshot_df().where(pred).where(
        F.col("conv_id") == victim
    ).count()
    assert got.get("update_postimage", 0) == n_upd - overlap
    assert got.get("delete", 0) == n_del
    assert "insert" not in got


def test_dml_races_with_replay_commits(spark, loaded):
    """A DML commit racing an epoch apply: both interleave their
    load-version → commit windows; the lost-race retry (lake/table.py)
    must land BOTH commits with neither clobbering the other."""
    eng = loaded
    before = eng.table.snapshot_df().count()
    pred = "role = 'tool'"
    n_del = eng.table.snapshot_df().where(pred).count()

    # interleave: resolve the DML targets against the CURRENT version,
    # then apply a new epoch (bumping the version), then commit the DML —
    # its in-memory metadata is now stale and must rebase-retry
    from etl_spark.cdc.maintenance import _dml_targets

    matched, buckets, wm, stamp_lsn = _dml_targets(eng.table, pred)
    n_matched = matched.count()
    assert n_matched == n_del

    newer = gen_changes(spark, 1_000, n_convs=10, n_epochs=1).drop("epoch")
    apply_batch(eng.table, newer, epoch=1)

    sid = delete_where(eng.table, pred, request_id=1)
    assert sid is not None
    after = eng.table.snapshot_df()
    # both effects present: epoch-1 rows applied AND the delete applied
    # (the delete resolved against the refreshed state inside delete_where)
    assert after.where(pred).count() == 0
    assert eng.table.committed_epoch("default") == 1
    assert eng.table.committed_epoch("dml") == 1
