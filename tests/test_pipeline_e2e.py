"""Full-pipeline composition: gated CDC replay → partition close →
incremental rollups → tolerance reconciliation → GDPR erasure →
restatement → rollup re-statement. The reference's whole DAG
(load → raw → main → derivates → tests), end to end on one table."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_spark.cdc.engine import CdcEngine
from etl_spark.cdc.maintenance import delete_conversations, expunge_tombstones
from etl_spark.cdc.partitions import close_due_partitions, restatements
from etl_spark.datagen import gen_changes
from etl_spark.operators.reconcile import tolerance_compare
from etl_spark.quality import default_transcript_gate
from etl_spark.rollups import create_rollup_views, refresh_rollups


@pytest.fixture(scope="module")
def pipe(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("pipe")
    eng = CdcEngine(spark, str(root / "tbl"), num_buckets=4)
    log = gen_changes(spark, 60_000, n_convs=80, n_epochs=3).cache()
    return eng, log, str(root / "rollups")


def test_full_pipeline(spark, pipe):
    eng, log, roll_dir = pipe
    gate = default_transcript_gate()

    # 1. gated replay of two epochs
    from etl_spark.cdc.apply import apply_batch

    for ep in range(2):
        st = apply_batch(
            eng.table, log.where(F.col("epoch") == ep).drop("epoch"),
            epoch=ep, gate=gate,
        )
        assert st.gate["ok"]

    # 2. close everything (forced — synthetic wall clock far in future)
    closed = close_due_partitions(eng.table, now=dt.datetime(2026, 1, 1))
    assert closed

    # 3. incremental rollups over closed days
    res = refresh_rollups(eng.table, roll_dir)
    assert res["days"]
    create_rollup_views(spark, roll_dir)

    # 4. reconciliation: rollup n_turns per day vs a direct aggregate —
    #    must be within 0% tolerance (same data, two paths)
    direct = (
        eng.table.snapshot_df()
        .groupBy(F.to_date("ts").cast("string").alias("day_"))
        .agg(F.count(F.lit(1)).cast("long").alias("direct_turns"))
    )
    rolled = spark.table("rollup_daily").select(
        F.col("day_").cast("string").alias("day_"),
        F.col("n_turns").cast("long").alias("rolled_turns"),
    )
    rec = tolerance_compare(
        rolled, direct, ["day_"], "rolled_turns", "direct_turns", 0.0
    )
    bad = rec.where(~F.col("within_tol")).collect()
    assert not bad, bad

    # 5. GDPR erasure of one conversation, then physical expunge+vacuum
    victim = eng.table.snapshot_df().select("conv_id").first().conv_id
    assert delete_conversations(eng.table, [victim], request_id=1) is not None
    assert eng.table.snapshot_df().where(F.col("conv_id") == victim).count() == 0
    expunge_tombstones(eng.table, "2100-01-01 00:00:00")
    eng.table.vacuum(min_age_seconds=0)
    assert eng.table.snapshot_df().where(F.col("conv_id") == victim).count() == 0

    # 6. late epoch lands in closed days → restatement → rollups re-state
    apply_batch(eng.table, log.where(F.col("epoch") == 2).drop("epoch"),
                epoch=2, gate=gate)
    eng.table.refresh()
    assert restatements(eng.table)
    res2 = refresh_rollups(eng.table, roll_dir)
    assert res2["days"]

    # 7. after re-statement the reconciliation still holds exactly
    create_rollup_views(spark, roll_dir)
    direct2 = (
        eng.table.snapshot_df()
        .groupBy(F.to_date("ts").cast("string").alias("day_"))
        .agg(F.count(F.lit(1)).cast("long").alias("direct_turns"))
    )
    rolled2 = spark.table("rollup_daily").select(
        F.col("day_").cast("string").alias("day_"),
        F.col("n_turns").cast("long").alias("rolled_turns"),
    )
    rec2 = tolerance_compare(
        rolled2, direct2, ["day_"], "rolled_turns", "direct_turns", 0.0
    )
    assert rec2.where(~F.col("within_tol")).count() == 0
    log.unpersist()
