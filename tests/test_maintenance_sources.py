"""GDPR delete / tombstone retention / external-source ingest."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from etl_spark.cdc.apply import apply_batch
from etl_spark.cdc.engine import CHANGE_SCHEMA, CdcEngine
from etl_spark.cdc.maintenance import delete_conversations, expunge_tombstones
from etl_spark.datagen import gen_changes
from etl_spark.sources import ingest_pandas, ingest_records, read_partitioned_csv

T = lambda s: dt.datetime.fromisoformat(s)


@pytest.fixture()
def loaded(spark, tmp_path):
    eng = CdcEngine(spark, str(tmp_path / "tbl"), num_buckets=4)
    changes = gen_changes(spark, 4_000, n_convs=40, n_epochs=1).drop("epoch")
    apply_batch(eng.table, changes, epoch=0)
    return eng


def test_gdpr_delete_and_expunge(spark, loaded):
    eng = loaded
    before = eng.table.snapshot_df()
    victims = [r.conv_id for r in before.select("conv_id").distinct().limit(3).collect()]
    n_victim_rows = before.where(F.col("conv_id").isin(victims)).count()
    assert n_victim_rows > 0

    sid = delete_conversations(eng.table, victims, request_id=1)
    assert sid is not None
    after = eng.table.snapshot_df()
    assert after.where(F.col("conv_id").isin(victims)).count() == 0
    assert after.count() == before.count() - n_victim_rows

    # idempotent per request id (replay of a crashed request is fenced)
    assert delete_conversations(eng.table, victims, request_id=1) is None

    # tombstones still physically present until retention expunge
    raw = eng.table.read_buckets(None, with_internal=True, fold=True)
    n_tomb = raw.where(F.coalesce("_tombstone", F.lit(False))).count()
    assert n_tomb >= n_victim_rows

    assert expunge_tombstones(eng.table, "2100-01-01 00:00:00") is not None
    raw2 = eng.table.read_buckets(None, with_internal=True, fold=True)
    assert raw2.where(F.coalesce("_tombstone", F.lit(False))).count() == 0
    # logical state unchanged by the physical expunge
    assert eng.table.snapshot_df().count() == after.count()


def test_ingest_records_and_pandas(spark, tmp_path):
    eng = CdcEngine(spark, str(tmp_path / "tbl"), num_buckets=4)
    recs = [
        {"conv_id": "api_1", "turn_idx": 0, "role": "user", "text": "from rest",
         "tool": None, "ts": T("2025-02-01 00:00:00"),
         "op_ts": T("2025-02-01 00:00:01"), "lsn": 1},
        {"conv_id": "api_1", "turn_idx": 1, "role": "assistant", "text": "reply",
         "tool": "tool_01", "ts": T("2025-02-01 00:00:05"),
         "op_ts": T("2025-02-01 00:00:06"), "lsn": 2},
    ]
    st = ingest_records(spark, eng.table, recs, epoch=0, source="rest")
    assert st.winners == 2
    # exactly-once: same (source, epoch) replays as a no-op
    assert ingest_records(spark, eng.table, recs, epoch=0, source="rest").skipped

    pdf = pd.DataFrame(
        {
            "conv_id": ["csv_1"], "turn_idx": [0], "role": ["user"],
            "text": ["from report"], "tool": [None],
            "ts": [T("2025-02-02 00:00:00")],
            "op_ts": [T("2025-02-02 00:00:01")], "lsn": [10],
        }
    )
    ingest_pandas(spark, eng.table, pdf, epoch=0, source="report")
    final = {(r.conv_id, r.turn_idx) for r in eng.table.snapshot_df().collect()}
    assert final == {("api_1", 0), ("api_1", 1), ("csv_1", 0)}


def test_read_partitioned_csv(spark, tmp_path):
    base = tmp_path / "reports"
    for d, b, rows in [
        ("2025-01-01", 1, [("a", "1", "2.5"), ("b", "null", "3.0")]),
        ("2025-01-02", 2, [("c", "3", "null")]),
    ]:
        p = base / f"dt={d}" / f"b={b}"
        p.mkdir(parents=True)
        with open(p / "part.csv", "w") as f:
            f.write("name,qty,price\n")
            for r in rows:
                f.write(",".join(r) + "\n")
    df = read_partitioned_csv(
        spark, str(base), str(base), casts={"qty": "bigint", "price": "double"}
    )
    assert set(df.columns) == {"name", "qty", "price", "dt", "b"}
    rows = {r.name: r for r in df.collect()}
    assert rows["b"].qty is None and rows["c"].price is None  # nullValue honored
    assert rows["a"].qty == 1 and rows["a"].price == 2.5
    assert str(rows["c"].dt) == "2025-01-02" and rows["c"].b == 2
    # partition pruning: dt filter must reach the scan as a partition filter
    plan = df.where(F.col("dt") == "2025-01-01")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_delete_absent_conversation_is_safe(spark, loaded):
    """Regression: deleting ids that don't exist (or hash to buckets with
    no matching rows) must not register dangling delta paths."""
    eng = loaded
    n = eng.table.snapshot_df().count()
    sid = delete_conversations(eng.table, ["never_existed_1", "never_existed_2"],
                               request_id=7)
    assert sid is not None  # request is fenced even though it erased nothing
    assert eng.table.snapshot_df().count() == n  # table still fully readable


def test_delete_works_on_stream_fed_table(spark, tmp_path):
    """Regression: GDPR tombstones must beat rows applied under ANY source
    (watermark_any), not just source='default'."""
    eng = CdcEngine(spark, str(tmp_path / "tbl"), num_buckets=4)
    changes = gen_changes(spark, 2_000, n_convs=20, n_epochs=1).drop("epoch")
    apply_batch(eng.table, changes, epoch=0, source="streamish")
    victim = eng.table.snapshot_df().select("conv_id").first().conv_id
    delete_conversations(eng.table, [victim], request_id=1)
    assert eng.table.snapshot_df().where(F.col("conv_id") == victim).count() == 0


def test_vacuum_reclaims_unreferenced_files(spark, loaded):
    eng = loaded
    before = eng.table.snapshot_df().toPandas()
    eng.table.compact(list(range(eng.table.num_buckets)))  # supersede deltas
    # age-guarded: freshly superseded dirs survive the default threshold
    assert eng.table.vacuum()["removed_data_dirs"] == 0
    stats = eng.table.vacuum(min_age_seconds=0)  # no live writer/reader here
    assert stats["removed_data_dirs"] > 0
    after = eng.table.snapshot_df().toPandas()
    from tests.conftest import assert_pdf_equal
    assert_pdf_equal(before, after, ["conv_id", "turn_idx"])


def test_bootstrap_snapshot_handoff(spark, tmp_path):
    """Snapshot bootstrap + overlapping stream replay converge to exactly
    the stream's argmax state: overlap deduped, post-snapshot wins."""
    from etl_spark.sources import bootstrap_snapshot

    # the "source system": a change log; its state at the snapshot point
    changes = gen_changes(spark, 4_000, n_convs=40, n_epochs=2)
    cut_ts = changes.selectExpr(
        "to_timestamp(percentile(unix_micros(op_ts), 0.6) / 1e6)"
    ).first()[0]
    pre = changes.where(F.col("op_ts") <= cut_ts)
    snap_lsn = pre.agg(F.max("lsn")).first()[0]
    # consistent snapshot = argmax state of everything at/below the cut
    from etl_spark.cdc.dedup import lww_dedup

    snap_state = (
        lww_dedup(pre.drop("epoch"), key=["conv_id", "turn_idx"])
        .where(F.col("op") != "D")
        .drop("op", "op_ts", "lsn")
    )

    boot = CdcEngine(spark, str(tmp_path / "boot"), num_buckets=4)
    st = bootstrap_snapshot(
        boot.table, snap_state, snapshot_lsn=int(snap_lsn),
        snapshot_op_ts=str(cut_ts),
    )
    assert not st.skipped
    # re-run is fenced
    assert bootstrap_snapshot(
        boot.table, snap_state, int(snap_lsn), str(cut_ts)
    ).skipped

    # hand off: replay the FULL stream (overlapping the snapshot) into
    # the bootstrapped table, as later epochs
    for ep in (0, 1):
        apply_batch(
            boot.table, changes.where(F.col("epoch") == ep).drop("epoch"),
            epoch=ep, source="stream",
        )
    # oracle: a plain full replay from empty
    plain = CdcEngine(spark, str(tmp_path / "plain"), num_buckets=4)
    for ep in (0, 1):
        apply_batch(
            plain.table, changes.where(F.col("epoch") == ep).drop("epoch"),
            epoch=ep,
        )
    a, b = boot.table.snapshot_df(), plain.table.snapshot_df()
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_delete_empty_id_list_fences_request(spark, loaded):
    """An erasure request whose id batch filtered down to nothing must
    no-op AND fence the request_id (zero-file delta commit) — otherwise
    the orchestrator retries the 'failed' request forever."""
    eng = loaded
    n = eng.table.snapshot_df().count()
    sid = delete_conversations(eng.table, [], request_id=9)
    assert sid is not None
    assert eng.table.snapshot_df().count() == n
    # fenced: the replay is a no-op
    assert delete_conversations(eng.table, [], request_id=9) is None
    # and a LATER real request still works on the same source sequence
    victim = eng.table.snapshot_df().select("conv_id").first().conv_id
    assert delete_conversations(eng.table, [victim], request_id=10) is not None
    assert eng.table.snapshot_df().where(F.col("conv_id") == victim).count() == 0


def test_ingest_empty_batch_fences_epoch(spark, tmp_path):
    """A source legitimately returning zero records (no currency updates
    this hour) must still commit — fencing the epoch so the drive loop
    advances — not crash schema inference on an empty frame."""
    eng = CdcEngine(spark, str(tmp_path / "tbl"), num_buckets=4)
    st = ingest_records(spark, eng.table, [], epoch=0, source="rest")
    assert not st.skipped and st.winners == 0
    assert ingest_records(spark, eng.table, [], epoch=0, source="rest").skipped
    # a later non-empty epoch on the same source proceeds normally
    recs = [{"conv_id": "api_1", "turn_idx": 0, "role": "user", "text": "t",
             "tool": "tool_01", "ts": T("2025-02-01 00:00:00"),
             "op_ts": T("2025-02-01 00:00:01"), "lsn": 1}]
    assert ingest_records(spark, eng.table, recs, epoch=1, source="rest").winners == 1
    # and the pandas path fences an empty frame the same way
    st = ingest_pandas(spark, eng.table, pd.DataFrame(), epoch=0, source="report")
    assert not st.skipped and st.winners == 0
    assert eng.table.snapshot_df().count() == 1


# -- partition-spec evolution (rebucket) -------------------------------------


def test_rebucket_preserves_state_and_ingest_continues(spark, tmp_path):
    """Rewrite 4 -> 8 buckets mid-stream: snapshot identical, point-lookup
    pruning works under the new spec, epoch fencing carries over, and the
    continued replay converges byte-equal with a never-rebucketed control.
    Shrinking (8 -> 2) on the control then also matches."""
    from tests.conftest import assert_pdf_equal

    log = gen_changes(spark, 8_000, n_convs=40, n_epochs=4).cache()

    a = CdcEngine(spark, str(tmp_path / "a"), num_buckets=4)  # rebucketed
    b = CdcEngine(spark, str(tmp_path / "b"), num_buckets=4)  # control
    for ep in range(2):
        for eng in (a, b):
            apply_batch(eng.table, log.where(F.col("epoch") == ep).drop("epoch"),
                        epoch=ep)

    before = a.table.snapshot_df().toPandas()
    sid = a.table.rebucket(8)
    assert sid is not None and a.table.num_buckets == 8
    assert a.table.rebucket(8) is None  # no-op at the same count
    after = a.table.snapshot_df().toPandas()
    assert_pdf_equal(before, after, ["conv_id", "turn_idx"])

    # fencing state survived: re-applying a committed epoch is a skip
    assert apply_batch(
        a.table, log.where(F.col("epoch") == 1).drop("epoch"), epoch=1
    ).skipped

    # ingest continues under the new spec; both tables converge
    for ep in range(2, 4):
        for eng in (a, b):
            apply_batch(eng.table, log.where(F.col("epoch") == ep).drop("epoch"),
                        epoch=ep)
    assert_pdf_equal(
        a.table.snapshot_df().toPandas(),
        b.table.snapshot_df().toPandas(),
        ["conv_id", "turn_idx"],
    )

    # point lookup prunes correctly under the evolved spec
    any_conv = a.table.snapshot_df().select("conv_id").first()["conv_id"]
    want = b.table.lookup(any_conv).toPandas()
    got = a.table.lookup(any_conv).toPandas()
    assert_pdf_equal(got, want, ["conv_id", "turn_idx"])

    # shrink the control 4 -> 2 and it still matches the rebucketed table
    b.table.rebucket(2)
    assert b.table.num_buckets == 2
    assert_pdf_equal(
        a.table.snapshot_df().toPandas(),
        b.table.snapshot_df().toPandas(),
        ["conv_id", "turn_idx"],
    )
    log.unpersist()


def test_rebucket_time_travel_reads_old_spec(spark, tmp_path):
    """as_of a pre-rebucket version reads the OLD layout (each metadata
    version carries its own partition spec)."""
    from tests.conftest import assert_pdf_equal

    eng = CdcEngine(spark, str(tmp_path / "tt"), num_buckets=4)
    log = gen_changes(spark, 3_000, n_convs=20, n_epochs=1).drop("epoch")
    apply_batch(eng.table, log, epoch=0)
    v_before = eng.table.version
    before = eng.table.snapshot_df().toPandas()

    eng.table.rebucket(8)
    old = eng.table.as_of(v_before)
    assert old.num_buckets == 4 and eng.table.num_buckets == 8
    assert_pdf_equal(old.snapshot_df().toPandas(), before,
                     ["conv_id", "turn_idx"])


def test_rebucket_races_fail_loudly_never_corrupt(spark, tmp_path):
    """A delta staged under the OLD spec must not rebase onto a
    rebucketed table (commit_delta raises CommitConflictError), and a
    rebucket whose fold basis was overtaken by a commit must itself
    conflict rather than erase the newer data."""
    from etl_spark.lake.table import CommitConflictError, LakeTable
    from tests.test_robustness import _stage_delta

    eng = CdcEngine(spark, str(tmp_path / "race"), num_buckets=4)
    log = gen_changes(spark, 2_000, n_convs=20, n_epochs=1).drop("epoch")
    apply_batch(eng.table, log, epoch=0)

    # stale applier stages a delta under num_buckets=4, then a rebucket
    # lands; the stale commit must fail loudly (epoch stays unfenced)
    stale = LakeTable(spark, eng.table.path)
    rel, bucket = _stage_delta(stale, "convX", "old-spec-write", 999)
    eng.table.rebucket(8)
    with pytest.raises(CommitConflictError, match="rebucket"):
        stale.commit_delta(1, "default", rel, [bucket])
    eng.table.refresh()
    assert eng.table.committed_epoch("default") == 0  # nothing fenced

    # rebucket computed against a stale basis conflicts instead of
    # erasing the concurrent commit
    racer = LakeTable(spark, eng.table.path)
    racer.refresh()
    apply_batch(eng.table, log.limit(10), epoch=1)  # basis moves
    with pytest.raises(CommitConflictError, match="recompute"):
        racer.rebucket(16)
    eng.table.refresh()
    assert eng.table.num_buckets == 8  # racer changed nothing
