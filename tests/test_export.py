"""Ordered snapshot export (etl_spark/export.py)."""

import glob

import pandas as pd
from pyspark.sql import functions as F

from etl_spark.cdc.apply import apply_batch
from etl_spark.cdc.engine import CdcEngine
from etl_spark.datagen import gen_changes
from etl_spark.export import export_snapshot


def test_export_globally_ordered(spark, tmp_path):
    eng = CdcEngine(spark, str(tmp_path / "tbl"), num_buckets=4)
    changes = gen_changes(spark, 4_000, n_convs=40, n_epochs=1).drop("epoch")
    apply_batch(eng.table, changes, epoch=0)
    out = str(tmp_path / "out")
    res = export_snapshot(eng.table, out, fmt="parquet")
    assert res["rows"] == eng.table.snapshot_df().count()

    files = sorted(glob.glob(out + "/part-*.parquet"))
    df = pd.concat(
        [spark.read.parquet(f).toPandas() for f in files], ignore_index=True
    )
    want = df.sort_values(["conv_id", "turn_idx"], ignore_index=True)
    # name-order concatenation IS the stable (conv_id, turn_idx) order
    assert df[["conv_id", "turn_idx"]].equals(want[["conv_id", "turn_idx"]])
    # and content equals the logical snapshot
    snap = eng.table.snapshot_df().toPandas().sort_values(
        ["conv_id", "turn_idx"], ignore_index=True
    )
    pd.testing.assert_frame_equal(
        want[sorted(want.columns)], snap[sorted(snap.columns)]
    )


def test_export_time_pruned_csv(spark, tmp_path):
    eng = CdcEngine(spark, str(tmp_path / "tbl"), num_buckets=4)
    changes = gen_changes(spark, 2_000, n_convs=20, n_epochs=1).drop("epoch")
    apply_batch(eng.table, changes, epoch=0)
    lo, hi = eng.table.snapshot_df().agg(F.min("ts"), F.max("ts")).first()
    mid = lo + (hi - lo) / 2
    out = str(tmp_path / "csv")
    res = export_snapshot(eng.table, out, fmt="csv", ts_max=str(mid))
    want = eng.table.snapshot_df(ts_max=str(mid)).count()
    assert res["rows"] == want > 0


def test_export_bootstrap_roundtrip(spark, tmp_path):
    """Backup/restore: export the snapshot, bootstrap a fresh table from
    it — logical states equal, and the restored table accepts newer CDC."""
    from etl_spark.sources import bootstrap_snapshot

    eng = CdcEngine(spark, str(tmp_path / "src"), num_buckets=4)
    changes = gen_changes(spark, 3_000, n_convs=30, n_epochs=1).drop("epoch")
    apply_batch(eng.table, changes, epoch=0)

    out = str(tmp_path / "backup")
    export_snapshot(eng.table, out, fmt="parquet")
    wm = eng.table.watermark_any()
    max_lsn = changes.agg(F.max("lsn")).first()[0]

    restored = CdcEngine(spark, str(tmp_path / "restored"), num_buckets=4)
    bootstrap_snapshot(
        restored.table, spark.read.parquet(out),
        snapshot_lsn=int(max_lsn), snapshot_op_ts=str(wm),
    )
    a, b = eng.table.snapshot_df(), restored.table.snapshot_df()
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_export_empty_snapshot_json(spark, tmp_path):
    """Empty snapshot + fmt=json: the write succeeds and rows=0 comes from
    the write job's own Observation (a read-back of a json dir with no
    data files would raise on schema inference)."""
    eng = CdcEngine(spark, str(tmp_path / "tbl"), num_buckets=2)
    res = export_snapshot(eng.table, str(tmp_path / "out"), fmt="json")
    assert res["rows"] == 0
