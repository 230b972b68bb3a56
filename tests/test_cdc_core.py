"""End-to-end CDC correctness vs a DuckDB oracle (SURVEY §5 test plan).

The oracle replays the full change log as a single argmax over
(op_ts, lsn) per (conv_id, turn_idx), honoring I/U/D — the engine must
converge to the same state no matter how the log is split into epochs,
killed, resumed, or replayed (exactly-once + LWW semantics).
"""

import duckdb
import pytest

from etl_spark.cdc.dedup import lww_dedup, lww_dedup_window
from etl_spark.cdc.engine import CdcEngine
from etl_spark.datagen import gen_changes, write_change_log
from tests.conftest import assert_pdf_equal

N_EVENTS = 20_000
N_CONVS = 300
N_EPOCHS = 6
EVOLVE_FROM = 4


@pytest.fixture(scope="module")
def change_log(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cdc") / "changes")
    write_change_log(
        spark, path, N_EVENTS,
        n_convs=N_CONVS, n_epochs=N_EPOCHS, evolve_from_epoch=EVOLVE_FROM,
    )
    return path


def oracle_final_state(change_log_dir: str, with_lang: bool = True):
    cols = "conv_id, turn_idx, role, text, tool, ts" + (", lang" if with_lang else "")
    q = f"""
        WITH ranked AS (
          SELECT *, row_number() OVER (
                   PARTITION BY conv_id, turn_idx
                   ORDER BY op_ts DESC, lsn DESC) AS rn
          FROM read_parquet('{change_log_dir}/epoch=*/*.parquet', union_by_name=true)
        )
        SELECT {cols} FROM ranked WHERE rn = 1 AND op <> 'D'
    """
    return duckdb.sql(q).df()


def test_replay_matches_oracle(spark, change_log, tmp_path):
    eng = CdcEngine(spark, str(tmp_path / "tbl"), num_buckets=8)
    results = eng.replay(change_log)
    assert len(results) == N_EPOCHS and not any(r.skipped for r in results)
    got = eng.table.snapshot_df().toPandas()
    want = oracle_final_state(change_log)
    assert len(got) > 0
    assert_pdf_equal(got, want, ["conv_id", "turn_idx"])
    # schema evolved mid-replay: lang exists, was added at EVOLVE_FROM
    assert "lang" in eng.table.schema().names()
    evolving = [r for r in results if r.schema_changes]
    assert evolving and evolving[0].epoch == EVOLVE_FROM


def test_replay_is_idempotent(spark, change_log, tmp_path):
    eng = CdcEngine(spark, str(tmp_path / "tbl"), num_buckets=8)
    eng.replay(change_log)
    v1 = eng.table.version
    again = eng.replay(change_log)  # every epoch already committed → skipped
    assert again == []
    assert eng.table.version == v1


def test_kill_and_resume(spark, change_log, tmp_path):
    path = str(tmp_path / "tbl")
    eng1 = CdcEngine(spark, path, num_buckets=8)
    eng1.replay(change_log, stop_after=3)  # "kill" after 3 epochs
    assert eng1.table.committed_epoch() == 2
    # brand-new engine object resumes from table metadata alone
    eng2 = CdcEngine(spark, path, num_buckets=8)
    resumed = eng2.replay(change_log)
    assert [r.epoch for r in resumed] == list(range(3, N_EPOCHS))
    got = eng2.table.snapshot_df().toPandas()
    assert_pdf_equal(got, oracle_final_state(change_log), ["conv_id", "turn_idx"])


def test_deletes_tombstone_and_late_updates_lose(spark, tmp_path):
    """A delete with the max (op_ts, lsn) hides the key even if an older
    update replays afterwards (tombstone persistence across epochs)."""
    import datetime as dt

    from etl_spark.cdc.engine import CHANGE_SCHEMA

    t = lambda s: dt.datetime.fromisoformat(s)
    e0 = spark.createDataFrame([
        ("I", "c1", 0, "user", "hello", None,
         t("2025-01-01 00:00:00"), t("2025-01-01 00:00:01"), 1),
        ("D", "c1", 0, None, None, None,
         None, t("2025-01-01 00:00:05"), 5),
        ("D", "c9", 9, None, None, None,
         None, t("2025-01-01 00:00:06"), 6),  # delete of absent key
    ], schema=CHANGE_SCHEMA)
    # late epoch: an UPDATE older than the applied delete must NOT resurrect c1/0
    e1 = spark.createDataFrame([
        ("U", "c1", 0, "user", "late", None,
         t("2025-01-01 00:00:00"), t("2025-01-01 00:00:03"), 3),
        ("U", "c2", 1, "assistant", "update-before-insert", None,
         t("2025-01-01 00:00:00"), t("2025-01-01 00:00:07"), 7),
    ], schema=CHANGE_SCHEMA)
    eng = CdcEngine(spark, str(tmp_path / "tbl"), num_buckets=4)
    from etl_spark.cdc.apply import apply_batch
    apply_batch(eng.table, e0, epoch=0)
    apply_batch(eng.table, e1, epoch=1)
    final = {(r.conv_id, r.turn_idx): r.text for r in eng.table.snapshot_df().collect()}
    assert final == {("c2", 1): "update-before-insert"}


def test_widen_int_to_long_mid_stream(spark, tmp_path):
    """Schema evolution: a later batch sends turn_idx as LONG — the table
    widens int→long (field ID preserved), old files still read correctly
    (schema-on-read alignment), and narrower late batches keep fitting."""
    import datetime as dt

    from pyspark.sql import types as T

    from etl_spark.cdc.apply import apply_batch
    from etl_spark.cdc.engine import CHANGE_SCHEMA

    t = lambda s: dt.datetime.fromisoformat(s)
    eng = CdcEngine(spark, str(tmp_path / "tbl"), num_buckets=4)
    e0 = spark.createDataFrame(
        [("I", "c1", 0, "user", "hi", None, t("2025-01-01 00:00:00"),
          t("2025-01-01 00:00:01"), 1)],
        schema=CHANGE_SCHEMA,
    )
    apply_batch(eng.table, e0, epoch=0)
    fid_before = {f.name: f.id for f in eng.table.schema().fields}

    wide = T.StructType(
        [f if f.name != "turn_idx" else T.StructField("turn_idx", T.LongType(), False)
         for f in CHANGE_SCHEMA.fields]
    )
    e1 = spark.createDataFrame(
        [("I", "c2", 2**40, "assistant", "big turn index", None,
          t("2025-01-01 00:01:00"), t("2025-01-01 00:01:01"), 2)],
        schema=wide,
    )
    stats = apply_batch(eng.table, e1, epoch=1)
    assert any("widen turn_idx: int -> bigint" in c for c in stats.schema_changes)
    fid_after = {f.name: f.id for f in eng.table.schema().fields}
    assert fid_after["turn_idx"] == fid_before["turn_idx"]  # ID-stable widen

    final = {(r.conv_id, r.turn_idx) for r in eng.table.snapshot_df().collect()}
    assert final == {("c1", 0), ("c2", 2**40)}

    # a narrower (int) batch after the widen still applies cleanly
    e2 = spark.createDataFrame(
        [("I", "c3", 3, "user", "narrow again", None, t("2025-01-01 00:02:00"),
          t("2025-01-01 00:02:01"), 3)],
        schema=CHANGE_SCHEMA,
    )
    s2 = apply_batch(eng.table, e2, epoch=2)
    assert s2.schema_changes == []
    assert eng.table.snapshot_df().count() == 3


def test_dedup_strategies_agree(spark):
    """All four physical strategies (max-struct agg, salted window,
    pack+join, narrow join-back in both join modes) produce identical
    winners under heavy key skew — including the fixture's ~5% verbatim
    re-sends, which the join-back strategies must collapse."""
    from etl_spark.cdc.dedup import lww_dedup_join, lww_dedup_narrow

    changes = gen_changes(spark, 10_000, n_convs=50, n_epochs=2)  # heavy skew
    a = lww_dedup(changes).toPandas()
    b = lww_dedup_window(changes).toPandas()
    c = lww_dedup_join(changes).toPandas()
    d = lww_dedup_narrow(changes).toPandas()
    e = lww_dedup_narrow(changes, winners_join="shuffle_hash").toPandas()
    assert_pdf_equal(a, b, ["conv_id", "turn_idx"])
    assert_pdf_equal(a, c, ["conv_id", "turn_idx"])
    assert_pdf_equal(a, d, ["conv_id", "turn_idx"])
    assert_pdf_equal(a, e, ["conv_id", "turn_idx"])


def test_apply_narrow_strategy_byte_equal(spark, tmp_path):
    """Full replay under the narrow dedup strategy lands byte-identical
    final state vs the default max-struct strategy."""
    from etl_spark.datagen import write_change_log

    log = str(tmp_path / "log")
    write_change_log(spark, log, 8_000, n_convs=40, n_epochs=2,
                     evolve_from_epoch=1, files_per_epoch=4)
    a = CdcEngine(spark, str(tmp_path / "agg"), num_buckets=4)
    a.replay(log)
    b = CdcEngine(spark, str(tmp_path / "narrow"), num_buckets=4,
                  dedup_strategy="narrow")
    rs = b.replay(log)
    assert all(not r.skipped for r in rs)
    pa = a.table.snapshot_df().toPandas()
    pb = b.table.snapshot_df().toPandas()
    assert_pdf_equal(pa, pb, ["conv_id", "turn_idx"])
    # lineage counters ride the narrow phase-1 agg — same numbers
    assert [r.rows_in for r in rs] == [8_000 // 2, 8_000 // 2]


def test_apply_fused_strategy_byte_equal(spark, tmp_path):
    """Full replay under the fused one-exchange strategy (auto's default
    for small epochs) lands byte-identical final state vs the agg
    strategy, with identical lineage counters; a wide-write table falls
    back to agg instead of silently breaking its fan-out."""
    from etl_spark.cdc import apply as ap
    from etl_spark.datagen import write_change_log

    log = str(tmp_path / "log")
    write_change_log(spark, log, 8_000, n_convs=40, n_epochs=2,
                     evolve_from_epoch=1, files_per_epoch=4)
    a = CdcEngine(spark, str(tmp_path / "agg"), num_buckets=4,
                  dedup_strategy="agg")
    ra = a.replay(log)
    b = CdcEngine(spark, str(tmp_path / "fused"), num_buckets=4,
                  dedup_strategy="fused")
    rb = b.replay(log)
    assert all(not r.skipped for r in rb)
    assert_pdf_equal(
        a.table.snapshot_df().toPandas(),
        b.table.snapshot_df().toPandas(),
        ["conv_id", "turn_idx"],
    )
    assert [r.rows_in for r in rb] == [r.rows_in for r in ra]
    assert [r.winners for r in rb] == [r.winners for r in ra]
    assert [r.dirty_buckets for r in rb] == [r.dirty_buckets for r in ra]

    # write_width > 1 needs its own write fan-out: fused must downgrade
    wide = CdcEngine(spark, str(tmp_path / "wide"), num_buckets=4,
                     write_width=4, dedup_strategy="fused")
    rw = wide.replay(log)
    assert all(not r.skipped for r in rw)
    assert_pdf_equal(
        a.table.snapshot_df().toPandas(),
        wide.table.snapshot_df().toPandas(),
        ["conv_id", "turn_idx"],
    )


def test_fused_downgrades_when_bucket_key_outside_key_cols(spark, tmp_path):
    """fused's groupBy(_bucket, key) is a per-key dedup only when the
    bucket is a function of the key. A table bucketed on a NON-key column
    must take the agg path — otherwise duplicates of one key differing in
    the bucket column land in different groups and each emits a
    'winner', breaking the one-row-per-key MERGE contract."""
    import datetime as dt

    from etl_spark.cdc.apply import apply_batch
    from etl_spark.cdc.engine import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA
    from etl_spark.lake.table import LakeTable

    t = LakeTable.create(
        spark, str(tmp_path / "tbl_rolebucket"), TRANSCRIPT_SCHEMA,
        num_buckets=4, bucket_key="role",
    )
    T_ = lambda s: dt.datetime.fromisoformat(s)
    # same (conv_id, turn_idx), different role -> different buckets
    batch = spark.createDataFrame(
        [("I", "c1", 0, "user", "v1", None,
          T_("2025-01-01 00:00:00"), T_("2025-01-01 00:00:00"), 1),
         ("U", "c1", 0, "assistant", "v2", None,
          T_("2025-01-01 00:00:01"), T_("2025-01-01 00:00:01"), 2)],
        schema=CHANGE_SCHEMA,
    )
    st = apply_batch(t, batch, epoch=0, dedup_strategy="fused")
    assert st.winners == 1
    rows = t.snapshot_df().collect()
    assert len(rows) == 1
    assert rows[0]["text"] == "v2" and rows[0]["role"] == "assistant"


def test_fused_plan_single_exchange(spark):
    """The fused dedup's plan has exactly ONE exchange: the raw-row
    shuffle on _bucket serves the (bucket, key) aggregation directly —
    HashPartitioning(_bucket) satisfies the grouping's clustering, so no
    second exchange appears between repartition and aggregate."""
    from pyspark.sql import functions as F

    from etl_spark.cdc.dedup import lww_dedup

    changes = gen_changes(spark, 2_000, n_convs=20, n_epochs=1)
    b = changes.withColumn(
        "_bucket", F.pmod(F.xxhash64("conv_id"), F.lit(4)).cast("int")
    ).repartition(4, F.col("_bucket"))
    out = lww_dedup(b, key=["_bucket", "conv_id", "turn_idx"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_datagen_deterministic_across_parallelism(spark):
    a = gen_changes(spark, 5_000, n_convs=40).toPandas()
    b = gen_changes(spark, 5_000, n_convs=40).repartition(17).toPandas()
    assert_pdf_equal(a, b, ["lsn", "conv_id", "turn_idx", "op_ts"])


def test_lineage_recorded(spark, change_log, tmp_path):
    eng = CdcEngine(spark, str(tmp_path / "tbl"), num_buckets=8)
    eng.replay(change_log)
    rows = eng.lineage.rows()
    assert len(rows) == N_EPOCHS
    assert all(r["lsn_min"] is not None and r["lsn_max"] >= r["lsn_min"] for r in rows)
    assert all(r["snapshot_id"] is not None for r in rows)
    total = sum(r["rows_in"] for r in rows)
    assert total == N_EVENTS
    # watermark is monotone non-decreasing across epochs and persisted
    wms = [r["watermark"] for r in rows]
    assert all(w is not None for w in wms)
    assert wms == sorted(wms)
    assert eng.table.watermark() == wms[-1]
    # the generator emits ~5% late events; epochs after the first must
    # flag some (flagged in lineage, never dropped from the merge)
    assert sum(r["late_rows"] for r in rows[1:]) > 0
    assert all(r["max_lag_s"] is not None and r["max_lag_s"] >= 0 for r in rows)
    # ingest lag: the generator's op_ts are historical, so the table runs
    # far behind "now" — positive, and non-increasing epoch over epoch
    # (later epochs carry newer op_ts against a nearly constant wall clock)
    lags = [r["ingest_lag_s"] for r in rows]
    assert all(l is not None and l > 0 for l in lags)
    assert lags == sorted(lags, reverse=True)


def test_write_width_fans_buckets_across_files(spark, tmp_path):
    """write_width > 1 splits each (bucket, day) leaf across multiple
    part files (write parallelism decoupled from bucket count) with the
    table state identical to width 1."""
    import glob
    import os

    from etl_spark.cdc.apply import apply_batch

    changes = gen_changes(spark, 4_000, n_convs=40, n_epochs=1).drop("epoch")
    narrow = CdcEngine(spark, str(tmp_path / "w1"), num_buckets=2)
    wide = CdcEngine(spark, str(tmp_path / "w4"), num_buckets=2, write_width=4)
    apply_batch(narrow.table, changes, epoch=0)
    apply_batch(wide.table, changes, epoch=0)

    def max_files_per_leaf(path):
        leaves = glob.glob(os.path.join(path, "data", "*", "_bucket=*", "_day=*"))
        return max(
            len([f for f in os.listdir(d) if f.endswith(".parquet")])
            for d in leaves
        )

    assert max_files_per_leaf(str(tmp_path / "w1")) == 1
    assert max_files_per_leaf(str(tmp_path / "w4")) > 1
    a, b = narrow.table.snapshot_df(), wide.table.snapshot_df()
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_auto_strategy_dispatch(spark, tmp_path, monkeypatch):
    """`auto` resolves on the batch's optimizer size estimate: small
    file-backed batches take the fused plan, large ones narrow; an
    explicit strategy always passes through untouched."""
    from etl_spark.cdc import apply as ap

    p = str(tmp_path / "batch")
    spark.range(100).selectExpr("id as conv_id").write.parquet(p)
    batch = spark.read.parquet(p)
    assert ap.resolve_dedup_strategy(batch, "auto") == "fused"
    assert ap.resolve_dedup_strategy(batch, "narrow-sh") == "narrow-sh"
    assert ap.resolve_dedup_strategy(batch, "agg") == "agg"
    # same batch, crossover lowered beneath its size -> the scale plan
    monkeypatch.setattr(ap, "AUTO_NARROW_MIN_BYTES", 1)
    assert ap.resolve_dedup_strategy(batch, "auto") == "narrow"


def test_auto_dispatch_guards_unbroadcastable_winners(spark, tmp_path, monkeypatch):
    """auto must NOT force-broadcast an unbroadcastable winner set: when
    the estimated distinct-key count exceeds the broadcast cap it selects
    narrow-sh, and prior-epoch lineage evidence (winners/rows_in) scales
    the estimate back down for high-dup streams."""
    from etl_spark.cdc import apply as ap

    p = str(tmp_path / "batch")
    spark.range(1000).selectExpr("id as conv_id").write.parquet(p)
    batch = spark.read.parquet(p)
    monkeypatch.setattr(ap, "AUTO_NARROW_MIN_BYTES", 1)
    # bytes/row prior says ~rows keys; cap of 10 keys -> shuffle-hash
    assert ap.resolve_dedup_strategy(batch, "auto", max_bcast_keys=10) == "narrow-sh"
    # prior epoch observed 1 winner per 1000 rows -> estimate shrinks -> broadcast
    prior = {"winners": 1, "rows_in": 1000}
    assert (
        ap.resolve_dedup_strategy(batch, "auto", prior_stats=prior, max_bcast_keys=10)
        == "narrow"
    )
    # misconfiguration fails loudly instead of silently changing the plan
    import pytest as _pytest

    with _pytest.raises(ValueError, match="narow"):
        ap.resolve_dedup_strategy(batch, "narow")
    with _pytest.raises(ValueError, match="narrow-bcast"):
        ap.resolve_dedup_strategy(batch, "narrow-bcast")


def test_auto_narrow_sh_replay_byte_equal(spark, tmp_path, monkeypatch):
    """End-to-end: a high-key-count batch under `auto` dispatches to
    narrow-sh automatically and the final table state is byte-equal to
    the agg strategy's."""
    from etl_spark.cdc import apply as ap
    from etl_spark.datagen import write_change_log

    log = str(tmp_path / "log")
    write_change_log(spark, log, 6_000, n_convs=30, n_epochs=2, files_per_epoch=2)
    a = CdcEngine(spark, str(tmp_path / "agg"), num_buckets=4, dedup_strategy="agg")
    a.replay(log)
    # force every batch over both thresholds: auto must pick narrow-sh
    monkeypatch.setattr(ap, "AUTO_NARROW_MIN_BYTES", 1)
    monkeypatch.setattr(ap, "AUTO_BCAST_MAX_KEYS", 1)
    seen = []
    orig = ap.resolve_dedup_strategy

    def spy(changes, strategy=None, **kw):
        out = orig(changes, strategy, **kw)
        seen.append(out)
        return out

    monkeypatch.setattr(ap, "resolve_dedup_strategy", spy)
    b = CdcEngine(spark, str(tmp_path / "auto"), num_buckets=4)
    b.replay(log)
    assert seen and all(s == "narrow-sh" for s in seen)
    assert_pdf_equal(
        a.table.snapshot_df().toPandas(),
        b.table.snapshot_df().toPandas(),
        ["conv_id", "turn_idx"],
    )
    # the commit recorded the evidence the next epoch's dispatch reads
    st = b.table.last_delta_stats()
    assert st and st["rows_in"] > 0 and st["winners"] > 0


def test_compaction_conflict_never_fails_a_committed_apply(spark, tmp_path, monkeypatch):
    """Best-effort compaction losing its metadata race (twice) must not
    surface as an apply failure — the data commit already succeeded; the
    deferral is recorded and the next apply re-triggers compaction."""
    from etl_spark.cdc.apply import apply_batch
    from etl_spark.lake.table import CommitConflictError, LakeTable

    eng = CdcEngine(spark, str(tmp_path / "tbl"), num_buckets=2,
                    compact_threshold=1)
    changes = gen_changes(spark, 1_000, n_convs=10, n_epochs=1).drop("epoch")

    def boom(self, buckets=None):
        raise CommitConflictError("racing maintenance writer")

    monkeypatch.setattr(LakeTable, "compact", boom)
    stats = apply_batch(eng.table, changes, epoch=0)
    assert stats.snapshot_id is not None and not stats.skipped
    assert stats.compaction_deferred and stats.compacted_buckets == []
    monkeypatch.undo()
    # next apply retries the deferred maintenance and succeeds
    more = gen_changes(spark, 1_000, n_convs=10, n_epochs=1).drop("epoch")
    s2 = apply_batch(eng.table, more, epoch=1)
    assert not s2.compaction_deferred and s2.compacted_buckets


def test_narrow_exact_ties_one_row_per_key(spark):
    """(op_ts, lsn) ties with DIFFERING payloads (corrupt input under the
    WAL contract): the strict one-row-per-key collapse is the DEFAULT
    (round 5) — same single lexicographic-max winner as the agg strategy
    — and exact_ties=False is the documented opt-out keeping variants."""
    import pyspark.sql.types as T

    from etl_spark.cdc.dedup import lww_dedup_narrow

    schema = T.StructType([
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("op_ts", T.TimestampType()),
        T.StructField("lsn", T.LongType()),
    ])
    from datetime import datetime

    ts = datetime(2025, 1, 1)
    rows = [("c1", 0, "payload-a", ts, 7), ("c1", 0, "payload-b", ts, 7),
            ("c2", 1, "solo", ts, 8)]
    changes = spark.createDataFrame(rows, schema)
    optout = lww_dedup_narrow(changes, exact_ties=False).toPandas()
    assert len(optout) == 3  # tied variants both survive under the opt-out
    exact = lww_dedup_narrow(changes)  # strict contract is the default
    agg = lww_dedup(changes)
    assert_pdf_equal(exact.toPandas(), agg.toPandas(), ["conv_id", "turn_idx"])
    assert exact.count() == 2


def test_empty_batch_fences_epoch_without_crashing(spark, tmp_path):
    """A provably-empty batch (empty local relation, a limit(0) change
    feed, a full resync of a never-written source) must FENCE its epoch
    with an empty commit instead of crashing: Spark collapses such plans
    far enough that the lineage Observation node never executes, and
    Observation.get then fails (found by the replication soak's minimal
    scenario — a sync_replica on an empty source)."""
    import datetime as dt

    from etl_spark.cdc.apply import apply_batch
    from etl_spark.cdc.engine import CHANGE_SCHEMA

    t = CdcEngine(spark, str(tmp_path / "t"), num_buckets=4).table
    # RDD-backed empty (runtime-detected path)
    st = apply_batch(t, spark.createDataFrame([], schema=CHANGE_SCHEMA), epoch=0)
    assert (st.rows_in, st.winners, st.skipped) == (0, 0, False)
    assert st.snapshot_id is not None  # the epoch is fenced by a commit
    assert apply_batch(
        t, spark.createDataFrame([], schema=CHANGE_SCHEMA), epoch=0
    ).skipped
    # Catalyst-provable empty (static-guard path): limit(0)
    rows = [("I", "k", 0, "user", "v", None, dt.datetime(2025, 1, 1),
             dt.datetime(2025, 1, 1), 1)]
    df = spark.createDataFrame(rows, schema=CHANGE_SCHEMA)
    st2 = apply_batch(t, df.limit(0), epoch=1)
    assert (st2.rows_in, st2.winners) == (0, 0) and st2.snapshot_id is not None
    # a real batch afterwards applies normally on the next epoch
    st3 = apply_batch(t, df, epoch=2)
    assert st3.winners == 1
    assert [r.conv_id for r in t.snapshot_df().collect()] == ["k"]

def test_private_plan_probe_canary(spark, tmp_path):
    """Version canary for the PRIVATE ``_jdf.queryExecution()`` probes
    (round-5 verdict item 3). Both probes degrade SAFELY when the py4j
    surface moves under a Spark upgrade — auto dispatch falls back to
    narrow-sh, the empty-batch guard falls back to the runtime path — so
    nothing else in the suite would fail. This test exists to make the
    degradation LOUD: if it fails after a Spark bump, re-point
    apply.plan_size_bytes / apply._statically_empty at the renamed plan
    surface (see plan_size_bytes' docstring) instead of deleting it."""
    from pyspark.sql import functions as F

    from etl_spark.cdc.apply import (
        _statically_empty,
        plan_size_bytes,
        resolve_dedup_strategy,
    )
    from etl_spark.datagen import gen_changes

    p = str(tmp_path / "chg")
    gen_changes(spark, 2_000, n_convs=20, n_epochs=1).drop("epoch").write.parquet(p)
    changes = spark.read.parquet(p)

    est = plan_size_bytes(changes)
    assert est is not None and est > 0, (
        "plan-size probe returned the fallback on the running Spark "
        f"({spark.version}) — every auto dispatch is silently degraded "
        "to narrow-sh; re-point plan_size_bytes at the new plan surface"
    )
    # end-to-end: a small file-backed batch must dispatch to the measured
    # fast path, not the no-estimate fallback
    assert resolve_dedup_strategy(changes, "auto") == "fused"

    # the static guard targets plans Catalyst FOLDS to an empty
    # LocalRelation (limit(0) feeds, always-false filters); a plain empty
    # createDataFrame is a LogicalRDD on this Spark and is deliberately
    # left to the runtime fallback
    for folded in (changes.limit(0), changes.where(F.lit(False))):
        assert _statically_empty(folded) is True, (
            "empty-plan probe returned the fallback on the running Spark "
            f"({spark.version}) — provably-empty batches now pay a runtime "
            "isEmpty() job; re-point _statically_empty at the new plan surface"
        )
    assert _statically_empty(changes) is False
