"""Robustness: crash orphans, concurrent committers, randomized LWW
convergence (property-based)."""

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from etl_spark.cdc.apply import apply_batch
from etl_spark.cdc.engine import CHANGE_SCHEMA, CdcEngine
from etl_spark.lake.table import ConcurrentCommitError, LakeTable

T = lambda s: dt.datetime.fromisoformat(s)


def _batch(spark, rows):
    return spark.createDataFrame(rows, schema=CHANGE_SCHEMA)


def test_orphan_write_is_invisible_and_overwritten(spark, tmp_path):
    """A crash AFTER data files land but BEFORE the metadata commit must
    leave the table untouched; the replayed epoch rewrites the same
    directory and commits cleanly."""
    eng = CdcEngine(spark, str(tmp_path / "tbl"), num_buckets=4)
    apply_batch(eng.table, _batch(spark, [
        ("I", "c1", 0, "user", "v1", None, T("2025-01-01 00:00:00"),
         T("2025-01-01 00:00:01"), 1)]), epoch=0)
    v_before = eng.table.version

    # simulate the crash: write the next delta's files, never commit
    doomed = eng.table.snapshot_df().select(
        "*",
        F.to_timestamp(F.lit("2025-01-01 00:01:00")).alias("_op_ts"),
        F.lit(99).cast("long").alias("_lsn"),
        F.lit(False).alias("_tombstone"),
        eng.table.bucket_expr(F.col("conv_id")).alias("_bucket"),
    )
    eng.table.write_files(doomed, f"data/delta-{eng.table.current_snapshot_id + 1:08d}")

    fresh = CdcEngine(spark, str(tmp_path / "tbl"), num_buckets=4)
    assert fresh.table.version == v_before  # orphan invisible
    assert {r.text for r in fresh.table.snapshot_df().collect()} == {"v1"}

    # replay of the "crashed" epoch overwrites the orphan and commits
    apply_batch(fresh.table, _batch(spark, [
        ("U", "c1", 0, "user", "v2", None, T("2025-01-01 00:00:00"),
         T("2025-01-01 00:02:00"), 2)]), epoch=1)
    assert {r.text for r in fresh.table.snapshot_df().collect()} == {"v2"}


def test_concurrent_commit_detected(spark, tmp_path):
    path = str(tmp_path / "tbl")
    eng = CdcEngine(spark, path, num_buckets=4)
    stale = LakeTable(spark, path)  # second writer with the same view
    apply_batch(eng.table, _batch(spark, [
        ("I", "c1", 0, "user", "x", None, T("2025-01-01 00:00:00"),
         T("2025-01-01 00:00:01"), 1)]), epoch=0)
    with pytest.raises(ConcurrentCommitError):
        stale.commit_delta(0, "other", "", [], {})


@pytest.mark.parametrize("seed", [7, 21, 1234])
def test_random_logs_converge_to_argmax(spark, tmp_path, seed):
    """Property: for a random op sequence over a small key pool, split
    into random epochs, the final table equals the in-Python argmax over
    (op_ts, lsn) per key honoring tombstones — regardless of epoch
    boundaries or duplicate emissions."""
    rng = random.Random(seed)
    keys = [(f"c{i}", j) for i in range(6) for j in range(4)]
    rows, expected = [], {}
    events = []
    for lsn in range(1, 250):
        conv, turn = rng.choice(keys)
        op = rng.choice(["I", "U", "U", "D"])
        op_ts = T("2025-01-01 00:00:00") + dt.timedelta(seconds=rng.randrange(10_000))
        text = None if op == "D" else f"t{lsn}"
        events.append((op, conv, turn, op_ts, lsn, text))
        rows.append((op, conv, turn, None if op == "D" else "user", text, None,
                     None if op == "D" else T("2025-01-01 00:00:00"), op_ts, lsn))
        if rng.random() < 0.15:  # duplicate re-send, identical bits
            events.append((op, conv, turn, op_ts, lsn, text))
            rows.append(rows[-1])
    for op, conv, turn, op_ts, lsn, text in events:
        cur = expected.get((conv, turn))
        if cur is None or (op_ts, lsn) > (cur[0], cur[1]):
            expected[(conv, turn)] = (op_ts, lsn, op, text)
    want = {k: v[3] for k, v in expected.items() if v[2] != "D"}

    eng = CdcEngine(spark, str(tmp_path / "tbl"), num_buckets=4)
    i = 0
    epoch = 0
    while i < len(rows):
        n = rng.randrange(1, 80)
        apply_batch(eng.table, _batch(spark, rows[i:i + n]), epoch=epoch)
        i += n
        epoch += 1
    got = {(r.conv_id, r.turn_idx): r.text for r in eng.table.snapshot_df().collect()}
    assert got == want


def test_racing_writers_never_share_data_paths(spark, tmp_path):
    """Two writers that loaded the same table version write to DISTINCT
    attempt-unique directories, so the loser's mode=overwrite write can
    never clobber the winner's committed files; the metadata reservation
    alone arbitrates, and the winner's rows survive intact."""
    path = str(tmp_path / "tbl")
    eng = CdcEngine(spark, path, num_buckets=4)
    apply_batch(eng.table, _batch(spark, [
        ("I", "c1", 0, "user", "seed", None, T("2025-01-01 00:00:00"),
         T("2025-01-01 00:00:01"), 1)]), epoch=0)

    winner = LakeTable(spark, path)
    loser = LakeTable(spark, path)  # same loaded version as winner

    def staged(t, text, lsn):
        df = t.snapshot_df().limit(1).select(
            F.col("conv_id"), F.col("turn_idx"), F.col("role"),
            F.lit(text).alias("text"), F.col("tool"), F.col("ts"),
            F.to_timestamp(F.lit("2025-01-01 00:01:00")).alias("_op_ts"),
            F.lit(lsn).cast("long").alias("_lsn"),
            F.lit(False).alias("_tombstone"),
            t.bucket_expr(F.col("conv_id")).alias("_bucket"),
        )
        rel = t.new_data_rel("delta")
        t.write_files(df, rel)
        return rel

    rel_w = staged(winner, "winner", 10)
    rel_l = staged(loser, "loser", 5)
    assert rel_w != rel_l  # attempt-unique paths — the ADVICE race is gone

    buckets = [r["_b"] for r in winner.spark.createDataFrame(
        [("c1",)], ["conv_id"]).select(
        winner.bucket_expr(F.col("conv_id")).alias("_b")).collect()]
    winner.commit_delta(1, "default", rel_w, buckets)
    with pytest.raises(ConcurrentCommitError):
        loser.commit_delta(1, "default", rel_l, buckets)

    fresh = LakeTable(spark, path)
    texts = {r.text for r in fresh.snapshot_df().collect()}
    assert "winner" in texts and "loser" not in texts
