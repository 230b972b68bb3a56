"""Physical-plan shape guards: the properties that make the headline
queries scale (broadcast small dims, parquet filter/column pushdown,
whole-stage codegen) must not silently regress."""

import re

import pytest
from pyspark.sql import functions as F

from etl_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_dimension_chain_broadcasts(spark):
    plan = _plan(QUERIES["j_broadcast_dims"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # dims must never shuffle the fact


def test_semi_and_anti_joins_broadcast(spark):
    for q in ("j6_anti_join", "j7_semi_join"):
        plan = _plan(QUERIES[q](spark, SF))
        assert "Broadcast" in plan, q


def test_parquet_pushdown_and_pruning(spark):
    df = (
        spark.read.parquet(f"{SF}/events.parquet")
        .where(F.col("event_type") == "purchase")
        .select("user_id", "value")
    )
    plan = _plan(df)
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert pushed and "EqualTo(event_type,purchase)" in pushed.group(1)
    schema = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    cols = {c.split(":")[0] for c in schema.group(1).split(",")}
    assert cols == {"user_id", "event_type", "value"}, cols  # pruned scan


def test_agg_runs_in_codegen(spark):
    df = QUERIES["a1_pricing_summary"](spark, SF)
    df.collect()  # AQE finalizes codegen stages only at execution
    plan = _plan(df)
    # executed-plan string marks whole-stage-codegen stages with "*(n)"
    assert re.search(r"\*\(\d+\)", plan), "no WholeStageCodegen stage found"
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python anywhere


def test_no_row_python_in_registry(spark):
    """Every registered query plan must stay JVM-side or Arrow-vectorized:
    row-at-a-time Python (BatchEvalPython) is forbidden by the north rule."""
    offenders = []
    for name, fn in QUERIES.items():
        try:
            plan = _plan(fn(spark, SF))
        except Exception:  # pragma: no cover - probed elsewhere
            continue
        if "BatchEvalPython" in plan:
            offenders.append(name)
    assert not offenders, offenders


def test_narrow_dedup_phase1_scan_stays_pruned(spark, tmp_path):
    """The narrow strategy's whole premise is that phase 1 reads ~5% of
    the batch bytes: the coalesce added for map-side-combine sizing must
    not defeat column pruning. Guard the plan: one scan carries exactly
    (key + order) columns, the full-width scan keeps the payload, and
    the Coalesce node is present."""
    import re

    from etl_spark.cdc.dedup import lww_dedup_narrow
    from etl_spark.datagen import gen_changes

    p = str(tmp_path / "chg")
    gen_changes(spark, 2_000, n_convs=20, n_epochs=1).drop("epoch").write.parquet(p)
    plan = _plan(lww_dedup_narrow(spark.read.parquet(p)))
    # Spark truncates long ReadSchema renderings, so parse per line and
    # take column names up to the truncation point
    schemas = []
    for line in plan.splitlines():
        m = re.search(r"ReadSchema: struct<(.*)$", line)
        if m:
            body = m.group(1).rstrip(">. ")
            schemas.append({c.split(":")[0] for c in body.split(",") if ":" in c})
    assert {"conv_id", "turn_idx", "op_ts", "lsn"} in schemas, schemas
    assert any("text" in s for s in schemas), schemas  # full-width scan intact
    assert "Coalesce" in plan
