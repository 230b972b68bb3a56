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
