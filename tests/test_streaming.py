"""Structured Streaming drive mode: file-source tail → foreachBatch MERGE.

Checks: (a) streaming replay converges to the batch oracle; (b) a restarted
stream with the same checkpoint only processes files that arrived since
(checkpointed offsets + epoch fencing = exactly-once across restarts).
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from etl_spark.cdc.engine import CdcEngine
from etl_spark.datagen import gen_changes
from tests.conftest import assert_pdf_equal

N_EVENTS = 8_000
N_EPOCHS = 4


@pytest.fixture(scope="module")
def stream_log(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stream") / "changes")
    changes = gen_changes(spark, N_EVENTS, n_convs=120, n_epochs=N_EPOCHS)
    for e in range(N_EPOCHS - 1):  # hold back the last epoch for the restart test
        (changes.where(F.col("epoch") == e).drop("epoch")
         .repartition(2).write.mode("overwrite").parquet(f"{path}/epoch={e:05d}"))
    return path


def _oracle(path):
    return duckdb.sql(f"""
        WITH ranked AS (
          SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                    ORDER BY op_ts DESC, lsn DESC) AS rn
          FROM read_parquet('{path}/epoch=*/*.parquet')
        )
        SELECT conv_id, turn_idx, role, text, tool, ts
        FROM ranked WHERE rn = 1 AND op <> 'D'
    """).df()


def test_stream_then_restart_exactly_once(spark, stream_log, tmp_path):
    table_path = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")

    eng = CdcEngine(spark, table_path, num_buckets=8)
    q = eng.stream(stream_log, ckpt, max_files_per_trigger=3)
    q.processAllAvailable()
    q.stop()

    got = eng.table.snapshot_df().toPandas()
    assert_pdf_equal(got, _oracle(stream_log), ["conv_id", "turn_idx"])
    n_batches_first = len(eng.lineage.rows())
    assert n_batches_first >= 2  # maxFilesPerTrigger=3 over 6 files → ≥2 batches

    # late arrival: the held-back epoch lands after the stream stopped
    changes = gen_changes(spark, N_EVENTS, n_convs=120, n_epochs=N_EPOCHS)
    (changes.where(F.col("epoch") == N_EPOCHS - 1).drop("epoch")
     .repartition(2).write.mode("overwrite")
     .parquet(f"{stream_log}/epoch={N_EPOCHS - 1:05d}"))

    # restart from the same checkpoint: only the new files are processed
    eng2 = CdcEngine(spark, table_path, num_buckets=8)
    q2 = eng2.stream(stream_log, ckpt, max_files_per_trigger=3)
    q2.processAllAvailable()
    q2.stop()

    got2 = eng2.table.snapshot_df().toPandas()
    assert_pdf_equal(got2, _oracle(stream_log), ["conv_id", "turn_idx"])
    new_rows = eng2.lineage.rows()[n_batches_first:]
    applied = [r for r in new_rows if not r["skipped"]]
    assert 1 <= len(applied) <= 2  # just the late epoch's 2 files


def test_windowed_activity_watermark(spark, stream_log, tmp_path):
    """Event-time tumbling windows with a watermark: totals across all
    finalized+running windows equal the raw change count (nothing lost),
    and op-type splits match a batch groupBy."""
    from etl_spark.cdc.engine import CHANGE_SCHEMA
    from etl_spark.streaming import windowed_activity

    agg = windowed_activity(spark, stream_log, CHANGE_SCHEMA, "1 hour", "2 hours")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory").queryName("win_act")
        .option("checkpointLocation", str(tmp_path / "ckpt_win"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT * FROM win_act").toPandas()
    batch = spark.read.parquet(f"{stream_log}/epoch=*")
    assert got["n_changes"].sum() == batch.count()
    by_op = {r["op"]: r["count"] for r in batch.groupBy("op").count().collect()}
    assert got["n_inserts"].sum() == by_op.get("I", 0)
    assert got["n_updates"].sum() == by_op.get("U", 0)
    assert got["n_deletes"].sum() == by_op.get("D", 0)
    assert (got["window_end"] - got["window_start"]).nunique() == 1


def test_progress_idle_timeout_evicts_state():
    """The idle-eviction branch (the 10^10-scale state bound): a timed-out
    group removes its state and emits nothing; a live group re-arms its
    timeout; an evicted conversation that resumes restarts from zero —
    all pinned against a fake GroupState, deterministically."""
    import pandas as pd

    from etl_spark.streaming import _progress_update

    class FakeState:
        def __init__(self, value=None, timed_out=False):
            self._v = value
            self.hasTimedOut = timed_out
            self.removed = False
            self.timeout_set = None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v

        def remove(self):
            self._v, self.removed = None, True

        def setTimeoutDuration(self, d):
            self.timeout_set = d

    from etl_spark.streaming import _duration_ms

    two_hours = _duration_ms("2 hours")
    assert two_hours == 7_200_000
    assert _duration_ms("30 minutes") == 1_800_000
    assert _duration_ms("500 ms") == 500
    assert _duration_ms(1234) == 1234
    import pytest

    with pytest.raises(ValueError):
        _duration_ms("fortnight")

    # timed-out group: state dropped, zero output rows
    st = FakeState(value=(7, 3, None), timed_out=True)
    out = list(_progress_update(("c1",), iter([]), st, two_hours))
    assert out == [] and st.removed and not st.exists

    # live group: counters accumulate and the timeout is re-armed
    pdf = pd.DataFrame({"turn_idx": [4, 9], "op_ts": pd.to_datetime(
        ["2026-01-01 00:00:00", "2026-01-01 00:01:00"])})
    st2 = FakeState(value=(7, 3, pd.Timestamp("2025-12-31 23:59:00")))
    (row,) = list(_progress_update(("c2",), iter([pdf]), st2, two_hours))
    assert int(row["n_changes"].iloc[0]) == 9
    assert int(row["max_turn_idx"].iloc[0]) == 9
    assert st2.timeout_set == two_hours

    # resume-after-eviction: counters restart (the documented trade-off)
    st3 = FakeState()
    (row2,) = list(_progress_update(("c1",), iter([pdf]), st3, two_hours))
    assert int(row2["n_changes"].iloc[0]) == 2

    # default (no timeout): never arms a duration
    st4 = FakeState()
    list(_progress_update(("c3",), iter([pdf]), st4, None))
    assert st4.timeout_set is None


def test_stateful_conversation_progress(spark, stream_log, tmp_path):
    """applyInPandasWithState: running per-conversation counters across
    micro-batches converge to the batch ground truth, and state carries
    across a stream restart from the same checkpoint."""
    from etl_spark.cdc.engine import CHANGE_SCHEMA
    from etl_spark.streaming import conversation_progress

    # default exact mode (NoTimeout): processAllAvailable() never returns
    # once ProcessingTimeTimeout state is armed (the engine keeps a
    # timeout-wakeup pending), so the eviction branch is pinned by the
    # deterministic unit test above instead of a live query
    prog = conversation_progress(spark, stream_log, CHANGE_SCHEMA,
                                 max_files_per_trigger=3)
    q = (
        prog.writeStream.outputMode("update")
        .format("memory").queryName("conv_prog")
        .option("checkpointLocation", str(tmp_path / "ckpt_state"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    # memory sink accumulates one row per (conv, trigger); keep the latest
    got = (
        spark.sql("SELECT * FROM conv_prog").toPandas()
        .sort_values("n_changes").groupby("conv_id").last()
    )
    batch = spark.read.parquet(f"{stream_log}/epoch=*")
    want = (
        batch.groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("turn_idx").alias("mx"))
        .toPandas().set_index("conv_id")
    )
    assert len(got) == len(want)
    merged = got.join(want)
    assert (merged["n_changes"] == merged["n"]).all()
    assert (merged["max_turn_idx"] == merged["mx"]).all()


def test_fresh_checkpoint_does_not_drop_data(spark, stream_log, tmp_path):
    """Regression: batch ids restart at 0 with a new checkpoint dir; the
    fencing namespace must restart with them (otherwise new data would be
    fenced as 'already applied' and silently lost)."""
    table_path = str(tmp_path / "tbl")
    eng = CdcEngine(spark, table_path, num_buckets=8)
    q = eng.stream(stream_log, str(tmp_path / "ckpt_a"))
    q.processAllAvailable(); q.stop()
    rows_first = eng.table.snapshot_df().count()
    assert rows_first > 0

    # brand-new checkpoint: everything re-reads under a fresh namespace;
    # LWW makes the re-apply a no-op at the data level
    eng2 = CdcEngine(spark, table_path, num_buckets=8)
    q2 = eng2.stream(stream_log, str(tmp_path / "ckpt_b"))
    q2.processAllAvailable(); q2.stop()
    assert eng2.table.snapshot_df().count() == rows_first
    applied = [r for r in eng2.lineage.rows() if not r["skipped"]]
    assert len(applied) > 1  # second pass actually processed (not fenced away)


def test_gated_stream_blocks_then_recovers(spark, tmp_path):
    """A mandatory gate violation inside foreachBatch fails the streaming
    query with nothing committed; restarting with a passing gate replays
    the same checkpointed batch and converges (exactly-once preserved
    across the failure)."""
    from pyspark.errors import StreamingQueryException

    from etl_spark.quality import QualityGate, default_transcript_gate, fraction_check

    log = str(tmp_path / "log")
    changes = gen_changes(spark, 3_000, n_convs=40, n_epochs=1)
    (changes.drop("epoch").repartition(2)
     .write.mode("overwrite").parquet(f"{log}/epoch=00000"))
    table_path, ckpt = str(tmp_path / "tbl"), str(tmp_path / "ckpt")

    eng = CdcEngine(spark, table_path, num_buckets=4)
    bad = QualityGate([fraction_check("impossible", F.lit(True), 0.0)])
    q = eng.stream(log, ckpt, gate=bad)
    with pytest.raises(StreamingQueryException):
        q.processAllAvailable()
    q.stop()
    eng.table.refresh()
    assert eng.table.snapshot_df().count() == 0  # nothing committed

    q2 = eng.stream(log, ckpt, gate=default_transcript_gate())
    q2.processAllAvailable()
    q2.stop()
    eng.table.refresh()
    got = eng.table.snapshot_df().toPandas()
    assert_pdf_equal(got, _oracle(log), ["conv_id", "turn_idx"])


def test_two_sources_merge_lww(spark, tmp_path):
    """Two independently-fenced sources feeding one table: epochs fence
    per source, and cross-source conflicts on the same key resolve by
    (op_ts, lsn) exactly like same-source ones."""
    from etl_spark.cdc.apply import apply_batch

    eng = CdcEngine(spark, str(tmp_path / "tbl"), num_buckets=4)
    a = gen_changes(spark, 2_000, n_convs=30, n_epochs=1, seed=1).drop("epoch")
    b = gen_changes(spark, 2_000, n_convs=30, n_epochs=1, seed=2).drop("epoch")
    apply_batch(eng.table, a, epoch=0, source="src_a")
    apply_batch(eng.table, b, epoch=0, source="src_b")
    # replays of either source fence independently
    assert apply_batch(eng.table, a, epoch=0, source="src_a").skipped
    assert apply_batch(eng.table, b, epoch=0, source="src_b").skipped
    assert eng.table.committed_epoch("src_a") == 0
    assert eng.table.committed_epoch("src_b") == 0

    pdf = a.unionByName(b).toPandas()
    con = duckdb.connect()
    con.register("both_view", pdf)
    want = con.execute("""
        WITH ranked AS (
          SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                    ORDER BY op_ts DESC, lsn DESC) AS rn
          FROM both_view
        )
        SELECT conv_id, turn_idx, role, text, tool, ts
        FROM ranked WHERE rn = 1 AND op <> 'D'
    """).df()
    got = eng.table.snapshot_df().toPandas()
    assert_pdf_equal(got, want, ["conv_id", "turn_idx"])


def test_streaming_sessions_match_batch_lag_split(spark, stream_log, tmp_path):
    """session_window sessionization must equal the batch LAG-based
    30-minute split (the W5 definition) on the same data: same number of
    sessions per conversation, same event totals."""
    from etl_spark.cdc.engine import CHANGE_SCHEMA
    from etl_spark.streaming import streaming_sessions
    from pyspark.sql import Window

    sess = streaming_sessions(spark, stream_log, CHANGE_SCHEMA, "30 minutes", "10 minutes")
    q = (
        sess.writeStream.outputMode("complete")
        .format("memory").queryName("live_sessions")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql(
        "SELECT conv_id, count(*) AS n_sessions, sum(n_changes) AS n_rows "
        "FROM live_sessions GROUP BY conv_id"
    ).toPandas().set_index("conv_id").sort_index()

    batch = spark.read.parquet(f"{stream_log}/epoch=*").where(F.col("op") != "D")
    w = Window.partitionBy("conv_id").orderBy("op_ts")
    want = (
        batch.withColumn("prev", F.lag("op_ts").over(w))
        .withColumn(
            "new_sess",
            (F.col("prev").isNull()
             | (F.col("op_ts").cast("long") - F.col("prev").cast("long") > 1800)
             ).cast("int"),
        )
        .groupBy("conv_id")
        .agg(F.sum("new_sess").alias("n_sessions"), F.count("*").alias("n_rows"))
        .toPandas().set_index("conv_id").sort_index()
    )
    assert got["n_sessions"].to_dict() == want["n_sessions"].to_dict()
    assert got["n_rows"].to_dict() == want["n_rows"].to_dict()
