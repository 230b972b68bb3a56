"""Change data feed (changes_between): row-level diff between versions,
silent under compaction/expunge, bucket-pruned, schema-evolution-safe."""

import datetime as dt

from pyspark.sql import functions as F

from etl_spark.cdc.apply import apply_batch
from etl_spark.cdc.engine import CHANGE_SCHEMA, CdcEngine

T = lambda s: dt.datetime.fromisoformat(s)


def _batch(spark, rows):
    return spark.createDataFrame(rows, schema=CHANGE_SCHEMA)


def _feed(t, v0, v1=None):
    return {
        (r.conv_id, r.turn_idx): (r._change_type, r.text)
        for r in t.changes_between(v0, v1).collect()
    }


def test_insert_update_delete_classification(spark, tmp_path):
    eng = CdcEngine(spark, str(tmp_path / "t"), num_buckets=4)
    t = eng.table
    apply_batch(t, _batch(spark, [
        ("I", "a", 0, "user", "keep", None, T("2025-01-01 00:00:00"), T("2025-01-01 00:00:01"), 1),
        ("I", "b", 0, "user", "will-update", None, T("2025-01-01 00:00:00"), T("2025-01-01 00:00:02"), 2),
        ("I", "c", 0, "user", "will-die", None, T("2025-01-01 00:00:00"), T("2025-01-01 00:00:03"), 3),
    ]), epoch=0)
    v0 = t.version
    apply_batch(t, _batch(spark, [
        ("U", "b", 0, "user", "updated", None, T("2025-01-01 00:00:00"), T("2025-01-01 01:00:00"), 4),
        ("D", "c", 0, None, None, None, T("2025-01-01 00:00:00"), T("2025-01-01 01:00:01"), 5),
        ("I", "d", 0, "user", "fresh", None, T("2025-01-01 00:00:00"), T("2025-01-01 01:00:02"), 6),
    ]), epoch=1)
    got = _feed(t, v0)
    assert got == {
        ("b", 0): ("update_postimage", "updated"),
        ("c", 0): ("delete", "will-die"),  # pre-image rides the delete
        ("d", 0): ("insert", "fresh"),
    }  # note: untouched key "a" is absent


def test_full_window_equals_snapshot_inserts(spark, tmp_path):
    """From the creation version, the feed is exactly the live snapshot
    as inserts (tombstoned keys never appear)."""
    eng = CdcEngine(spark, str(tmp_path / "t"), num_buckets=4)
    t = eng.table
    v0 = t.version
    apply_batch(t, _batch(spark, [
        ("I", "a", 0, "user", "x", None, T("2025-01-01 00:00:00"), T("2025-01-01 00:00:01"), 1),
        ("I", "b", 0, "user", "y", None, T("2025-01-01 00:00:00"), T("2025-01-01 00:00:02"), 2),
        ("D", "b", 0, None, None, None, T("2025-01-01 00:00:00"), T("2025-01-01 00:00:03"), 3),
    ]), epoch=0)
    got = _feed(t, v0)
    assert got == {("a", 0): ("insert", "x")}


def test_compaction_and_expunge_are_silent(spark, tmp_path):
    from etl_spark.cdc.maintenance import expunge_tombstones

    eng = CdcEngine(spark, str(tmp_path / "t"), num_buckets=2, compact_threshold=2)
    t = eng.table
    for i in range(4):
        apply_batch(t, _batch(spark, [
            ("U" if i else "I", "a", 0, "user", f"v{i}", None,
             T("2025-01-01 00:00:00"), T(f"2025-01-01 0{i}:00:00"), i + 1)]), epoch=i)
    apply_batch(t, _batch(spark, [
        ("D", "a", 1, None, None, None, T("2025-01-01 00:00:00"),
         T("2025-01-01 05:00:00"), 99)]), epoch=4)
    v0 = t.version
    t.compact()
    expunge_tombstones(t, before_op_ts="2025-01-01 06:00:00")
    assert _feed(t, v0) == {}  # physical rewrites, no logical change


def test_feed_prunes_to_dirty_buckets(spark, tmp_path):
    eng = CdcEngine(spark, str(tmp_path / "t"), num_buckets=8)
    t = eng.table
    rows = [("I", f"c{i}", 0, "user", "seed", None, T("2025-01-01 00:00:00"),
             T("2025-01-01 00:00:01"), i) for i in range(64)]
    apply_batch(t, _batch(spark, rows), epoch=0)
    v0 = t.version
    apply_batch(t, _batch(spark, [
        ("U", "c7", 0, "user", "bump", None, T("2025-01-01 00:00:00"),
         T("2025-01-01 01:00:00"), 1000)]), epoch=1)
    # the window's only delta touched one bucket — the feed must too
    dirty = set(t.snapshots()[-1]["dirty_buckets"])
    assert len(dirty) == 1
    assert _feed(t, v0) == {("c7", 0): ("update_postimage", "bump")}


def test_feed_resolves_rename_by_field_id(spark, tmp_path):
    eng = CdcEngine(spark, str(tmp_path / "t"), num_buckets=2)
    t = eng.table
    apply_batch(t, _batch(spark, [
        ("I", "a", 0, "user", "before-rename", None, T("2025-01-01 00:00:00"),
         T("2025-01-01 00:00:01"), 1)]), epoch=0)
    v0 = t.version
    t.rename_column("text", "content")
    nb = _batch(spark, [
        ("U", "a", 0, "user", "after-rename", None, T("2025-01-01 00:00:00"),
         T("2025-01-01 01:00:00"), 2)]).withColumnRenamed("text", "content")
    apply_batch(t, nb, epoch=1)
    rows = t.changes_between(v0).collect()
    assert [(r.conv_id, r._change_type, r.content) for r in rows] == [
        ("a", "update_postimage", "after-rename")
    ]


def test_empty_window(spark, tmp_path):
    eng = CdcEngine(spark, str(tmp_path / "t"), num_buckets=2)
    t = eng.table
    apply_batch(t, _batch(spark, [
        ("I", "a", 0, "user", "x", None, T("2025-01-01 00:00:00"),
         T("2025-01-01 00:00:01"), 1)]), epoch=0)
    v = t.version
    df = t.changes_between(v, v)
    assert df.count() == 0
    assert "_change_type" in df.columns


def test_empty_window_after_later_rename(spark, tmp_path):
    """The empty-feed shortcut must build its frame from the AS-OF schema:
    a rename committed after to_version used to crash the shortcut with
    UNRESOLVED_COLUMN (live frame, as-of names). The empty feed also
    reports the as-of window's column names, consistent with the
    non-empty path."""
    eng = CdcEngine(spark, str(tmp_path / "t"), num_buckets=2)
    t = eng.table
    apply_batch(t, _batch(spark, [
        ("I", "a", 0, "user", "x", None, T("2025-01-01 00:00:00"),
         T("2025-01-01 00:00:01"), 1)]), epoch=0)
    v1 = t.version
    # a logically-silent commit inside the window (no delta buckets)
    t.compact(buckets=list(range(t.num_buckets)))
    v2 = t.version
    t.rename_column("text", "content")  # after the window

    df = t.changes_between(v1, to_version=v2, with_ordering=True)
    assert df.count() == 0
    assert "text" in df.columns and "content" not in df.columns
    assert {"_change_type", "_op_ts", "_lsn"} <= set(df.columns)
