"""Replication: change-feed → exactly-once apply into a replica table."""

import datetime as dt

from etl_spark.cdc.apply import apply_batch
from etl_spark.cdc.engine import CHANGE_SCHEMA, CdcEngine
from etl_spark.cdc.replicate import create_replica, sync_replica

T = lambda s: dt.datetime.fromisoformat(s)


def _batch(spark, rows):
    return spark.createDataFrame(rows, schema=CHANGE_SCHEMA)


def _state(t):
    return {
        (r.conv_id, r.turn_idx): (r.role, r.text) for r in t.snapshot_df().collect()
    }


def _mk_src(spark, tmp_path):
    eng = CdcEngine(spark, str(tmp_path / "src"), num_buckets=4)
    apply_batch(eng.table, _batch(spark, [
        ("I", "a", 0, "user", "a0", None, T("2025-01-01 00:00:00"), T("2025-01-01 00:00:01"), 1),
        ("I", "b", 0, "user", "b0", None, T("2025-01-01 00:00:00"), T("2025-01-01 00:00:02"), 2),
        ("I", "c", 0, "user", "c0", None, T("2025-01-01 00:00:00"), T("2025-01-01 00:00:03"), 3),
    ]), epoch=0)
    return eng.table


def test_initial_and_incremental_sync(spark, tmp_path):
    src = _mk_src(spark, tmp_path)
    dst = create_replica(src, str(tmp_path / "dst"))

    s1 = sync_replica(src, dst)
    assert s1.mode == "full"  # first sync is always a full copy
    assert _state(dst) == _state(src)

    # source advances: update, delete, insert
    apply_batch(src, _batch(spark, [
        ("U", "a", 0, "user", "a1", None, T("2025-01-01 00:00:00"), T("2025-01-01 01:00:00"), 4),
        ("D", "b", 0, None, None, None, T("2025-01-01 00:00:00"), T("2025-01-01 01:00:01"), 5),
        ("I", "d", 0, "user", "d0", None, T("2025-01-01 00:00:00"), T("2025-01-01 01:00:02"), 6),
    ]), epoch=1)
    s2 = sync_replica(src, dst)
    assert s2.mode == "incremental"
    assert _state(dst) == _state(src)
    assert ("b", 0) not in _state(dst)  # delete propagated

    # idempotent: nothing new -> noop, state unchanged
    s3 = sync_replica(src, dst)
    assert s3.mode == "noop"
    assert _state(dst) == _state(src)


def test_resync_after_vacuum_falls_back_to_full(spark, tmp_path):
    src = _mk_src(spark, tmp_path)
    dst = create_replica(src, str(tmp_path / "dst"))
    sync_replica(src, dst)

    # advance the source far enough that the synced version is vacuumed
    for i in range(5):
        apply_batch(src, _batch(spark, [
            ("U", "a", 0, "user", f"a{i + 1}", None, T("2025-01-01 00:00:00"),
             T(f"2025-01-01 0{i + 2}:00:00"), 10 + i)]), epoch=1 + i)
    src.vacuum(keep_meta_versions=2, min_age_seconds=0)

    s = sync_replica(src, dst)
    assert s.mode == "full"
    assert _state(dst) == _state(src)
    # convergent, not destructive: re-running stays a noop
    assert sync_replica(src, dst).mode == "noop"


def test_sync_survives_source_schema_evolution(spark, tmp_path):
    import pyspark.sql.types as T_

    src = _mk_src(spark, tmp_path)
    dst = create_replica(src, str(tmp_path / "dst"))
    sync_replica(src, dst)

    src.evolve_schema(T_.StructType([T_.StructField("lang", T_.StringType())]))
    nb = _batch(spark, [
        ("U", "c", 0, "user", "c1", None, T("2025-01-01 00:00:00"),
         T("2025-01-01 03:00:00"), 20)]).withColumn("lang",
        __import__("pyspark.sql.functions", fromlist=["lit"]).lit("en"))
    apply_batch(src, nb, epoch=1)
    sync_replica(src, dst)
    assert "lang" in dst.schema().names()
    got = {r.conv_id: r.lang for r in dst.snapshot_df().collect()}
    assert got["c"] == "en" and got["a"] is None
