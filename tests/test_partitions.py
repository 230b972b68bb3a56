"""Partition close / force-close lifecycle (reference
event_partition.py:28-63) — metadata-only sensing, exactly-once marks,
restatement detection."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_spark.cdc.apply import apply_batch
from etl_spark.cdc.engine import CdcEngine
from etl_spark.cdc.partitions import (
    FORCE_CLOSE,
    WATERMARK_CLOSE,
    close_due_partitions,
    closed_partitions,
    list_days,
    restatements,
)
from etl_spark.datagen import gen_changes


@pytest.fixture()
def table(spark, tmp_path):
    eng = CdcEngine(spark, str(tmp_path / "tbl"), num_buckets=4)
    # op_ts advances ~1 s per event: 150k events push the watermark past
    # day-1 end + lateness margin after two of three epochs
    log = gen_changes(spark, 150_000, n_convs=60, n_epochs=3).cache()
    for ep in range(2):  # hold epoch 2 back for the restatement test
        apply_batch(eng.table, log.where(F.col("epoch") == ep).drop("epoch"), epoch=ep)
    t = eng.table
    t._held_log = log
    return t


def test_watermark_close_and_force_close(table):
    days = list_days(table)
    assert days and days[0] == "2025-01-01"
    wm = dt.datetime.fromisoformat(table.watermark_any())

    now = wm  # wall clock at watermark: nothing force-closes yet
    newly = close_due_partitions(table, now=now, allowed_lateness_hours=2.0,
                                 force_close_after_hours=12.0)
    closed = {m["day"]: m for m in newly}
    # every day whose end+2h is behind the watermark closed via watermark
    for d in days:
        day_end = dt.datetime.fromisoformat(d) + dt.timedelta(days=1)
        if wm >= day_end + dt.timedelta(hours=2):
            assert closed[d]["mode"] == WATERMARK_CLOSE
        else:
            assert d not in closed
    assert len(closed) >= 1

    # idempotent: nothing closes twice
    assert close_due_partitions(table, now=now) == []

    # much later wall clock: the straggler day force-closes
    later = max(dt.datetime.fromisoformat(d) for d in days) + dt.timedelta(days=2)
    newly2 = close_due_partitions(table, now=later)
    modes = {m["day"]: m["mode"] for m in newly2}
    assert set(closed) | set(modes) == set(days)
    assert all(m == FORCE_CLOSE for m in modes.values())
    # marks survive in table metadata (committed)
    table.refresh()
    assert set(closed_partitions(table)) == set(days)


def test_restatement_detection(table):
    wm = dt.datetime.fromisoformat(table.watermark_any())
    close_due_partitions(table, now=wm + dt.timedelta(days=2))
    assert restatements(table) == []
    # late epoch lands rows in already-closed days
    log = table._held_log
    apply_batch(table, log.where(F.col("epoch") == 2).drop("epoch"), epoch=2)
    table.refresh()
    rs = restatements(table)
    assert rs, "new delta leaves in closed days must surface as restatements"
    assert all(r["day"] in closed_partitions(table) for r in rs)
    log.unpersist()


def test_close_survives_concurrent_commit(spark, table, tmp_path):
    """close_due_partitions runs alongside streaming applies — losing the
    metadata-version race between its refresh() and commit is routine and
    must be retried (rebased onto fresh state), not raised. Injected
    deterministically: the first commit attempt is preceded by a
    competing commit through a second handle on the same table."""
    from etl_spark.lake.table import LakeTable

    other = LakeTable(spark, table.path)
    real_commit = type(table)._commit_meta
    fired = {"n": 0}

    def racy_commit(meta):
        if fired["n"] == 0:
            fired["n"] += 1
            # competing writer bumps the version inside the window
            apply_batch(
                other,
                table._held_log.where(F.col("epoch") == 2).drop("epoch"),
                epoch=2,
            )
        return real_commit(table, meta)

    table._commit_meta = racy_commit
    far = dt.datetime(2025, 3, 1)
    newly = close_due_partitions(table, now=far, source=None)
    table._commit_meta = real_commit

    assert fired["n"] == 1
    assert newly, "days should have closed despite the lost race"
    # the close marks really landed in the LATEST metadata (not a stale
    # overwrite of the competing apply's commit)
    other.refresh()
    assert set(closed_partitions(other)) >= {m["day"] for m in newly}
    assert other.committed_epoch("cdc") >= 2 or other._meta["committed_epochs"]


def test_close_yields_to_racing_closer(spark, table):
    """Exactly-once per day: when the competing commit is another CLOSER
    that closed the same day first, the retry drops the day instead of
    overwriting the first closer's mark."""
    from etl_spark.lake.table import LakeTable

    other = LakeTable(spark, table.path)
    far = dt.datetime(2025, 3, 1)
    real_commit = type(table)._commit_meta
    fired = {"n": 0}

    def racy_commit(meta):
        if fired["n"] == 0:
            fired["n"] += 1
            close_due_partitions(other, now=far, source=None)
        return real_commit(table, meta)

    table._commit_meta = racy_commit
    newly = close_due_partitions(table, now=far, source=None)
    table._commit_meta = real_commit

    assert fired["n"] == 1
    # every day was already closed by the racer — our retry found nothing
    # left to commit and returned the empty rebased set
    assert newly == []
    assert closed_partitions(table)
