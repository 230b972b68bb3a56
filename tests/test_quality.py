"""Runtime data-quality gates (reference test framework:
plugins/operators/test.py:45-64 — mandatory failure aborts, optional
warns; declarative specs like load_atomic.yaml / event_loss.yaml)."""

import pytest
from pyspark.sql import functions as F

from etl_spark.cdc.apply import apply_batch
from etl_spark.cdc.engine import CdcEngine
from etl_spark.datagen import gen_changes
from etl_spark.quality import (
    GateFailure,
    OPTIONAL,
    QualityGate,
    accepted_values,
    default_transcript_gate,
    fraction_check,
    metric_check,
    min_rows,
    null_fraction,
    value_range,
)


def test_standalone_evaluate_pass_and_fail(spark):
    df = spark.createDataFrame(
        [("a", 1, "user"), ("b", 2, "assistant"), ("c", None, "user")],
        ["id", "v", "role"],
    )
    gate = QualityGate([
        null_fraction("id", 0.0),
        null_fraction("v", 0.5),          # 1/3 nulls <= 0.5 → pass
        accepted_values("role", ["user", "assistant"]),
        min_rows(3),
        value_range("v", lo=0, hi=10),
        metric_check("max_v", F.max("v"), "<=", 2.0),
    ])
    report = gate.evaluate(df)
    assert report.ok and all(r.passed for r in report.results)

    strict = QualityGate([null_fraction("v", 0.0)])
    with pytest.raises(GateFailure) as ei:
        strict.enforce(df, context="stage-x")
    (fail,) = ei.value.report.mandatory_failures
    assert fail.name == "null_frac_v" and abs(fail.measured - 1 / 3) < 1e-9


def test_optional_failure_warns_but_passes(spark):
    df = spark.createDataFrame([("a",), (None,)], ["x"])
    gate = QualityGate([null_fraction("x", 0.0, level=OPTIONAL)])
    report = gate.enforce(df)  # must not raise
    assert report.ok and len(report.warnings) == 1


def test_gate_blocks_cdc_commit(spark, tmp_path):
    """Mandatory violation in an epoch → nothing committed, epoch
    unfenced, earlier epochs intact; removing the bad check lets the
    retry converge."""
    eng = CdcEngine(spark, str(tmp_path / "tbl"), num_buckets=4)
    log = gen_changes(spark, 4_000, n_convs=50, n_epochs=2).cache()
    ok_gate = default_transcript_gate()
    apply_batch(eng.table, log.where(F.col("epoch") == 0).drop("epoch"),
                epoch=0, gate=ok_gate)
    rows_after_e0 = eng.table.snapshot_df().count()
    sid_after_e0 = eng.table.current_snapshot_id

    # a gate the data cannot satisfy: no conversation may exceed 1 turn
    bad_gate = QualityGate(
        [fraction_check("turn_cap", F.col("turn_idx") > 0, 0.0)]
    )
    e1 = log.where(F.col("epoch") == 1).drop("epoch")
    with pytest.raises(GateFailure):
        apply_batch(eng.table, e1, epoch=1, gate=bad_gate)
    eng.table.refresh()
    assert eng.table.current_snapshot_id == sid_after_e0
    assert eng.table.committed_epoch("default") == 0
    assert eng.table.snapshot_df().count() == rows_after_e0

    # corrected retry (same epoch) commits
    stats = apply_batch(eng.table, e1, epoch=1, gate=ok_gate)
    assert stats.snapshot_id is not None
    assert stats.gate is not None and stats.gate["ok"]
    assert eng.table.committed_epoch("default") == 1
    log.unpersist()


def test_gate_row_filter_ignores_deletes(spark, tmp_path):
    """Delete events carry NULL payload; the apply's gate scope (op<>'D')
    must not count them as nullness violations."""
    eng = CdcEngine(spark, str(tmp_path / "tbl"), num_buckets=2)
    log = gen_changes(spark, 3_000, n_convs=30, n_epochs=1).drop("epoch")
    assert log.where((F.col("op") == "D") & F.col("role").isNull()).count() > 0
    gate = QualityGate([null_fraction("role", 0.0)])
    stats = apply_batch(eng.table, log, epoch=0, gate=gate)  # must not raise
    assert stats.gate["ok"]


def test_blocked_commit_orphan_is_vacuumable(spark, tmp_path):
    """The delta written before a gate block is an orphan: invisible to
    readers, reclaimed by vacuum, and the age guard protects it only
    until it ages out."""
    eng = CdcEngine(spark, str(tmp_path / "tbl"), num_buckets=2)
    log = gen_changes(spark, 2_000, n_convs=20, n_epochs=1).drop("epoch")
    bad = QualityGate([fraction_check("impossible", F.lit(True), 0.0)])
    with pytest.raises(GateFailure):
        apply_batch(eng.table, log, epoch=0, gate=bad)
    assert eng.table.snapshot_df().count() == 0
    stats = eng.table.vacuum(min_age_seconds=0)
    assert stats["removed_data_dirs"] > 0  # the orphan delta
    # table still consistent and writable after reclaim
    apply_batch(eng.table, log, epoch=0)
    assert eng.table.snapshot_df().count() > 0


def test_optional_violation_emits_alert_and_commits(spark, tmp_path):
    """Severity routing to the alert sink: an OPTIONAL violation writes a
    structured alert row to the engine's alerts table while the commit
    proceeds; a MANDATORY violation writes its alert AND blocks."""
    import json
    import os

    from etl_spark.quality import JsonlAlertSink, fraction_check

    eng = CdcEngine(spark, str(tmp_path / "tbl"), num_buckets=4)
    log = gen_changes(spark, 3_000, n_convs=30, n_epochs=2).cache()
    # every conversation has turns > 0, so this optional check violates
    gate = QualityGate(
        [fraction_check("turn_cap_opt", F.col("turn_idx") > 0, 0.0,
                        level=OPTIONAL)]
    )
    stats = eng.replay(str(_write_log(spark, log, tmp_path)), gate=gate)
    assert all(s.snapshot_id is not None for s in stats)  # commits proceeded
    sink = JsonlAlertSink(eng.alerts_path)
    alerts = sink.rows()
    assert len(alerts) == 2  # one per epoch
    a = alerts[0]
    assert a["severity"] == OPTIONAL and a["check"] == "turn_cap_opt"
    assert a["measured"] > 0 and a["threshold"] == 0.0 and a["op"] == "<="
    assert a["epoch"] == 0 and a["gate"] == "gate"

    # mandatory: alert row lands even though the commit is blocked
    eng2 = CdcEngine(spark, str(tmp_path / "tbl2"), num_buckets=4)
    bad = QualityGate([fraction_check("turn_cap", F.col("turn_idx") > 0, 0.0)])
    with pytest.raises(GateFailure):
        eng2.replay(str(_write_log(spark, log, tmp_path, name="log2")), gate=bad)
    rows = JsonlAlertSink(eng2.alerts_path).rows()
    assert len(rows) == 1 and rows[0]["severity"] == "mandatory"
    log.unpersist()


def test_shared_gate_not_mutated_across_engines(spark, tmp_path):
    """A gate shared across two engines/tables must not get the first
    engine's sink baked in: each engine's violations land in ITS OWN
    alerts file, and the gate object keeps sink=None throughout."""
    from etl_spark.quality import JsonlAlertSink, fraction_check

    log = gen_changes(spark, 2_000, n_convs=20, n_epochs=2).cache()
    gate = QualityGate(
        [fraction_check("turn_cap_opt", F.col("turn_idx") > 0, 0.0,
                        level=OPTIONAL)]
    )
    eng_a = CdcEngine(spark, str(tmp_path / "a"), num_buckets=2)
    eng_b = CdcEngine(spark, str(tmp_path / "b"), num_buckets=2)
    eng_a.replay(str(_write_log(spark, log, tmp_path)), gate=gate)
    eng_b.replay(str(_write_log(spark, log, tmp_path)), gate=gate)
    assert gate.sink is None
    assert len(JsonlAlertSink(eng_a.alerts_path).rows()) == 2
    assert len(JsonlAlertSink(eng_b.alerts_path).rows()) == 2
    log.unpersist()


def test_ingest_lag_slo_alerts_and_blocks(spark, tmp_path):
    """Freshness SLO wire (reference DeadlineSensor analogue): a stale
    stream breaches the lag deadline — optional level emits a
    severity-tagged alert row while every commit proceeds; mandatory
    level stops the replay AFTER the breaching commit, data durable."""
    from etl_spark.quality import JsonlAlertSink, LagSlo, SloViolation

    log = gen_changes(spark, 2_000, n_convs=20, n_epochs=2).cache()
    # fixture op_ts are historical (2025) -> ingest lag is months; any
    # sane deadline is breached
    eng = CdcEngine(spark, str(tmp_path / "tbl"), num_buckets=2)
    stats = eng.replay(
        str(_write_log(spark, log, tmp_path)),
        lag_slo=LagSlo(max_lag_s=8 * 3600, level=OPTIONAL),
    )
    assert all(s.snapshot_id is not None for s in stats)  # commits proceeded
    alerts = JsonlAlertSink(eng.alerts_path).rows()
    assert len(alerts) == 2  # one breach per epoch
    assert alerts[0]["severity"] == OPTIONAL
    assert alerts[0]["check"] == "ingest_lag_slo"
    assert alerts[0]["measured"] > alerts[0]["threshold"] == 8 * 3600

    # mandatory: replay stops at the FIRST breaching epoch, its commit kept
    eng2 = CdcEngine(spark, str(tmp_path / "tbl2"), num_buckets=2)
    with pytest.raises(SloViolation):
        eng2.replay(
            str(_write_log(spark, log, tmp_path)),
            lag_slo=LagSlo(max_lag_s=8 * 3600, level="mandatory"),
        )
    assert eng2.table.committed_epoch() == 0  # epoch 0 durable, epoch 1 never ran
    rows = JsonlAlertSink(eng2.alerts_path).rows()
    assert len(rows) == 1 and rows[0]["severity"] == "mandatory"
    # a generous deadline passes quietly
    eng3 = CdcEngine(spark, str(tmp_path / "tbl3"), num_buckets=2)
    eng3.replay(str(_write_log(spark, log, tmp_path)),
                lag_slo=LagSlo(max_lag_s=10**10))
    assert JsonlAlertSink(eng3.alerts_path).rows() == []
    log.unpersist()


def _write_log(spark, log, tmp_path, name="log"):
    import os

    d = tmp_path / name
    if not os.path.exists(str(d)):
        for ep in (0, 1):
            log.where(F.col("epoch") == ep).drop("epoch").write.parquet(
                str(d / f"epoch={ep:05d}")
            )
    return d
