"""Production-style invariants on the final table state — the engine's
analog of the reference's between-stage SQL assertion suites
(/root/reference/etl/dags/user_history/include/tests/, SURVEY §5):
a test FAILS if the violating-rows query returns anything."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_spark.cdc.engine import CdcEngine
from etl_spark.datagen import write_change_log
from etl_spark.transforms import conversation_summary


@pytest.fixture(scope="module")
def state(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("inv")
    log = str(root / "log")
    write_change_log(spark, log, 15_000, n_convs=200, n_epochs=3)
    eng = CdcEngine(spark, str(root / "tbl"), num_buckets=8)
    eng.replay(log)
    return eng.table.snapshot_df().cache()


def test_pk_unique(state):
    """(conv_id, turn_idx) is a primary key (reference:
    tests/fact_tables/mandatory/registration.yaml — PK uniqueness)."""
    dupes = state.groupBy("conv_id", "turn_idx").count().where(F.col("count") > 1)
    assert dupes.count() == 0


def test_no_null_keys(state):
    """Key columns never NULL (reference: load_atomic.yaml non-null ids)."""
    bad = state.where(F.col("conv_id").isNull() | F.col("turn_idx").isNull())
    assert bad.count() == 0


def test_turn_gap_rate_bounded(state):
    """LAG-based turn-loss rate ≤ 60% of slots for the synthetic fixture
    (reference event-loss check: event_loss.yaml:14-19,52 — the engine
    must expose gaps, the fixture intentionally contains some)."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    g = state.withColumn("gap", F.col("turn_idx") - F.lag("turn_idx").over(w) - 1)
    agg = g.agg(
        F.sum(F.when(F.col("gap") > 0, F.col("gap")).otherwise(0)).alias("missing"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert agg["missing"] / (agg["missing"] + agg["n"]) < 0.6


def test_summary_invariants(state):
    """Derived-summary sanity (reference session invariants,
    fact_tables/optional/session.yaml: end ≥ start, lengths ≥ 0)."""
    s = conversation_summary(state)
    bad = s.where(
        (F.col("last_ts") < F.col("first_ts"))
        | (F.col("n_turns") <= 0)
        | (F.col("n_turns") > F.col("max_turn_idx") + 1)
        | (F.col("total_chars") < 0)
    )
    assert bad.count() == 0


def test_multi_source_epoch_fencing(spark, tmp_path):
    """Two sources keep independent committed-epoch chains: a replayed
    epoch of one source is fenced without affecting the other."""
    import datetime as dt

    from etl_spark.cdc.apply import apply_batch
    from etl_spark.cdc.engine import CHANGE_SCHEMA

    t = lambda s: dt.datetime.fromisoformat(s)
    eng = CdcEngine(spark, str(tmp_path / "tbl"), num_buckets=4)
    a = spark.createDataFrame([
        ("I", "src_a", 0, "user", "a", None, t("2025-01-01 00:00:00"),
         t("2025-01-01 00:00:01"), 1)], schema=CHANGE_SCHEMA)
    b = spark.createDataFrame([
        ("I", "src_b", 0, "user", "b", None, t("2025-01-01 00:00:00"),
         t("2025-01-01 00:00:02"), 2)], schema=CHANGE_SCHEMA)
    assert not apply_batch(eng.table, a, epoch=0, source="alpha").skipped
    assert not apply_batch(eng.table, b, epoch=0, source="beta").skipped
    assert apply_batch(eng.table, a, epoch=0, source="alpha").skipped
    assert eng.table.committed_epoch("alpha") == 0
    assert eng.table.committed_epoch("beta") == 0
    assert eng.table.snapshot_df().count() == 2
