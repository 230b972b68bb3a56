"""Time-dimension partition pruning on the LakeTable (SURVEY §2 S3:
``WHERE date_ = execution_date`` scan scoping — reference
mod_load_data_get_data.sql:18, insert_user_history.sql:57,130).

The contract: a windowed ``snapshot_df(ts_min, ts_max)`` equals the full
snapshot filtered to the window, while provably skipping file sets whose
footer stats fall outside it — including in the presence of deletes
(before-image event time) and GDPR tombstones (event time retained).
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from etl_spark.cdc.apply import apply_batch
from etl_spark.cdc.engine import CdcEngine
from etl_spark.cdc.maintenance import delete_conversations
from etl_spark.datagen import gen_changes
from tests.conftest import assert_pdf_equal

N_EVENTS = 8_000
N_EPOCHS = 4


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("prune") / "tbl")
    # high threshold: keep every epoch's delta alive so pruning has
    # distinct time ranges to skip
    eng = CdcEngine(spark, path, num_buckets=4, compact_threshold=100)
    log = gen_changes(spark, N_EVENTS, n_convs=80, n_epochs=N_EPOCHS).cache()
    for ep in range(N_EPOCHS):
        apply_batch(
            eng.table, log.where(F.col("epoch") == ep).drop("epoch"), epoch=ep
        )
    log.unpersist()
    return eng.table


WINDOW = ("2025-01-01 02:00:00", "2025-01-01 08:00:00")


def test_windowed_snapshot_equals_filtered_full(table):
    full = table.snapshot_df().toPandas()
    lo, hi = WINDOW
    got = table.snapshot_df(ts_min=lo, ts_max=hi).toPandas()
    want = full[
        (full.ts >= pd.Timestamp(lo)) & (full.ts <= pd.Timestamp(hi))
    ].reset_index(drop=True)
    assert len(want) > 0, "fixture window must be non-empty"
    assert len(want) < len(full), "fixture window must be a strict subset"
    assert_pdf_equal(got, want, ["conv_id", "turn_idx"])


def test_file_sets_actually_pruned(table):
    lo, hi = WINDOW
    all_sets, none_pruned = table.plan_file_sets()
    assert not none_pruned
    chosen, pruned = table.plan_file_sets(ts_min=lo, ts_max=hi)
    assert len(pruned) > 0, "no file set was pruned — stats missing?"
    assert len(chosen) + len(pruned) == len(all_sets)
    # every committed file set carries usable stats (no silent opt-outs)
    assert all(e.get("ts_stats") is not None for e in all_sets)
    assert all(e["ts_stats"]["nulls"] == 0 for e in all_sets)


def test_pruning_survives_gdpr_tombstones(table):
    """A GDPR tombstone keeps its event time, so (a) the windowed read
    still hides the erased conversation and (b) its file set stays
    prunable for disjoint windows."""
    lo, hi = WINDOW
    in_window = table.snapshot_df(ts_min=lo, ts_max=hi)
    victim = in_window.select("conv_id").first().conv_id
    delete_conversations(table, [victim], request_id=1)
    got = table.snapshot_df(ts_min=lo, ts_max=hi).toPandas()
    assert (got.conv_id == victim).sum() == 0
    # the tombstone delta has real event times → still zero-null stats
    chosen, _ = table.plan_file_sets()
    assert all(
        e["ts_stats"] is not None and e["ts_stats"]["nulls"] == 0 for e in chosen
    )


def test_pruning_after_compaction(table):
    before = table.snapshot_df().toPandas()
    table.compact(list(range(table.num_buckets)))
    after = table.snapshot_df().toPandas()
    assert_pdf_equal(before, after, ["conv_id", "turn_idx"])
    # compacted bases span the full range → a narrow window can no longer
    # prune (single file set per bucket), but stats are present and sane
    chosen, pruned = table.plan_file_sets(ts_min=WINDOW[0], ts_max=WINDOW[1])
    for e in chosen:
        assert e["ts_stats"]["rows"] > 0
        assert e["ts_stats"]["min"] <= e["ts_stats"]["max"]
    lo, hi = WINDOW
    got = table.snapshot_df(ts_min=lo, ts_max=hi).toPandas()
    full = table.snapshot_df().toPandas()
    want = full[
        (full.ts >= pd.Timestamp(lo)) & (full.ts <= pd.Timestamp(hi))
    ].reset_index(drop=True)
    assert_pdf_equal(got, want, ["conv_id", "turn_idx"])


def test_point_lookup_matches_snapshot(table):
    full = table.snapshot_df().toPandas()
    victim = full.conv_id.iloc[0]
    got = table.lookup(victim).toPandas()
    want = full[full.conv_id == victim].reset_index(drop=True)
    assert_pdf_equal(got, want, ["conv_id", "turn_idx"])
    # the lookup plan must push the key equality into the parquet scan
    plan = table.read_buckets([0], fold=False).where(
        __import__("pyspark.sql.functions", fromlist=["col"]).col("conv_id") == victim
    )._jdf.queryExecution().executedPlan().toString()
    assert "EqualTo(conv_id" in plan


@pytest.mark.parametrize("seed", [3, 17, 404])
def test_random_windows_equal_filtered_full(spark, tmp_path, seed):
    """Property: for random logs (with deletes and a GDPR erasure) and
    random time windows, snapshot_df(ts_min, ts_max) == full snapshot
    filtered to the window — file-set pruning must never change results."""
    import random

    from etl_spark.cdc.engine import CdcEngine
    from etl_spark.cdc.maintenance import delete_conversations
    from etl_spark.datagen import gen_changes

    rng = random.Random(seed)
    eng = CdcEngine(spark, str(tmp_path / f"t{seed}"), num_buckets=4)
    log = gen_changes(spark, 5_000, n_convs=40, n_epochs=3, seed=seed).cache()
    for ep in range(3):
        apply_batch(eng.table, log.where(F.col("epoch") == ep).drop("epoch"), epoch=ep)
    victim = eng.table.snapshot_df().select("conv_id").first().conv_id
    delete_conversations(eng.table, [victim], request_id=1)
    log.unpersist()

    full = eng.table.snapshot_df().toPandas()
    tmin, tmax = full.ts.min(), full.ts.max()
    span = (tmax - tmin).total_seconds()
    for _ in range(4):
        a = tmin + pd.Timedelta(seconds=rng.uniform(0, span))
        b = tmin + pd.Timedelta(seconds=rng.uniform(0, span))
        lo, hi = min(a, b), max(a, b)
        got = eng.table.snapshot_df(ts_min=lo, ts_max=hi).toPandas()
        want = full[(full.ts >= lo) & (full.ts <= hi)].reset_index(drop=True)
        if len(want) == 0:
            assert len(got) == 0
            continue
        assert_pdf_equal(got, want, ["conv_id", "turn_idx"])
