"""Robustness: crash orphans, concurrent committers, randomized LWW
convergence (property-based)."""

import os
import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from etl_spark.cdc.apply import apply_batch
from etl_spark.cdc.engine import CHANGE_SCHEMA, CdcEngine
from etl_spark.lake.table import (
    CommitConflictError,
    ConcurrentCommitError,
    EpochFencedError,
    LakeTable,
)

T = lambda s: dt.datetime.fromisoformat(s)


def _batch(spark, rows):
    return spark.createDataFrame(rows, schema=CHANGE_SCHEMA)


def test_orphan_write_is_invisible_and_overwritten(spark, tmp_path):
    """A crash AFTER data files land but BEFORE the metadata commit must
    leave the table untouched; the replayed epoch rewrites the same
    directory and commits cleanly."""
    eng = CdcEngine(spark, str(tmp_path / "tbl"), num_buckets=4)
    apply_batch(eng.table, _batch(spark, [
        ("I", "c1", 0, "user", "v1", None, T("2025-01-01 00:00:00"),
         T("2025-01-01 00:00:01"), 1)]), epoch=0)
    v_before = eng.table.version

    # simulate the crash: write the next delta's files, never commit
    doomed = eng.table.snapshot_df().select(
        "*",
        F.to_timestamp(F.lit("2025-01-01 00:01:00")).alias("_op_ts"),
        F.lit(99).cast("long").alias("_lsn"),
        F.lit(False).alias("_tombstone"),
        eng.table.bucket_expr(F.col("conv_id")).alias("_bucket"),
    )
    eng.table.write_files(doomed, f"data/delta-{eng.table.current_snapshot_id + 1:08d}")

    fresh = CdcEngine(spark, str(tmp_path / "tbl"), num_buckets=4)
    assert fresh.table.version == v_before  # orphan invisible
    assert {r.text for r in fresh.table.snapshot_df().collect()} == {"v1"}

    # replay of the "crashed" epoch overwrites the orphan and commits
    apply_batch(fresh.table, _batch(spark, [
        ("U", "c1", 0, "user", "v2", None, T("2025-01-01 00:00:00"),
         T("2025-01-01 00:02:00"), 2)]), epoch=1)
    assert {r.text for r in fresh.table.snapshot_df().collect()} == {"v2"}


def _stage_delta(t, conv_id, text, lsn):
    """Write (not commit) a one-row delta for ``conv_id``; returns
    (rel_path, bucket)."""
    df = t.spark.createDataFrame(
        [(conv_id, 0, "user", text, None, T("2025-01-01 00:00:00"))],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    ).select(
        "*",
        F.to_timestamp(F.lit("2025-01-01 00:01:00")).alias("_op_ts"),
        F.lit(lsn).cast("long").alias("_lsn"),
        F.lit(False).alias("_tombstone"),
        t.bucket_expr(F.col("conv_id")).alias("_bucket"),
    )
    rel = t.new_data_rel("delta")
    t.write_files(df, rel)
    bucket = t.spark.createDataFrame([(conv_id,)], ["conv_id"]).select(
        t.bucket_expr(F.col("conv_id")).alias("_b")).first()["_b"]
    return rel, int(bucket)


def test_lost_delta_race_rebases_and_succeeds(spark, tmp_path):
    """Optimistic concurrency: a delta commit that loses the metadata
    race to a DIFFERENT (source, epoch) retries against fresh metadata and
    commits — both writers' rows end up in the table."""
    path = str(tmp_path / "tbl")
    eng = CdcEngine(spark, path, num_buckets=4)
    apply_batch(eng.table, _batch(spark, [
        ("I", "c1", 0, "user", "seed", None, T("2025-01-01 00:00:00"),
         T("2025-01-01 00:00:01"), 1)]), epoch=0)

    stale = LakeTable(spark, path)  # loaded BEFORE the racing commit
    rel_s, b_s = _stage_delta(stale, "c2", "stale-writer", 10)
    rel_w, b_w = _stage_delta(eng.table, "c3", "winner", 11)
    eng.table.commit_delta(1, "default", rel_w, [b_w])
    # stale's in-memory version is now behind; the commit must retry, not fail
    stale.commit_delta(0, "other-src", rel_s, [b_s])

    fresh = LakeTable(spark, path)
    texts = {r.text for r in fresh.snapshot_df().collect()}
    assert {"seed", "winner", "stale-writer"} <= texts
    assert fresh.committed_epoch("default") == 1
    assert fresh.committed_epoch("other-src") == 0


def test_same_epoch_race_is_fenced_exactly_once(spark, tmp_path):
    """Two appliers racing the SAME (source, epoch): the loser's commit
    raises EpochFencedError and apply_batch reports it as a fenced skip —
    the winner's rows survive, the loser's delta is an orphan."""
    path = str(tmp_path / "tbl")
    eng = CdcEngine(spark, path, num_buckets=4)
    apply_batch(eng.table, _batch(spark, [
        ("I", "c1", 0, "user", "seed", None, T("2025-01-01 00:00:00"),
         T("2025-01-01 00:00:01"), 1)]), epoch=0)

    loser_tbl = LakeTable(spark, path)  # stale view: epoch 1 not yet fenced
    apply_batch(eng.table, _batch(spark, [
        ("U", "c1", 0, "user", "winner", None, T("2025-01-01 00:00:00"),
         T("2025-01-01 00:02:00"), 2)]), epoch=1)
    stats = apply_batch(loser_tbl, _batch(spark, [
        ("U", "c1", 0, "user", "loser", None, T("2025-01-01 00:00:00"),
         T("2025-01-01 00:03:00"), 3)]), epoch=1)
    assert stats.skipped

    fresh = LakeTable(spark, path)
    assert {r.text for r in fresh.snapshot_df().collect()} == {"winner"}

    # raw commit path surfaces the typed error
    stale2 = LakeTable(spark, path)
    rel, b = _stage_delta(stale2, "c9", "dup", 50)
    eng.table.refresh()
    rel2, b2 = _stage_delta(eng.table, "c9", "dup-winner", 51)
    eng.table.commit_delta(2, "default", rel2, [b2])
    with pytest.raises(EpochFencedError):
        stale2.commit_delta(2, "default", rel, [b])


def test_rebase_conflict_on_overlapping_bucket(spark, tmp_path):
    """A compaction that lost the race to a concurrent delta on the SAME
    bucket must raise CommitConflictError (blind retry would erase the
    unseen delta); on DISJOINT buckets it retries and succeeds."""
    path = str(tmp_path / "tbl")
    eng = CdcEngine(spark, path, num_buckets=4)
    # find two keys hashing to different buckets
    keys = [f"k{i}" for i in range(16)]
    bmap = {
        r["conv_id"]: int(r["_b"])
        for r in spark.createDataFrame([(k,) for k in keys], ["conv_id"])
        .select("conv_id", eng.table.bucket_expr(F.col("conv_id")).alias("_b"))
        .collect()
    }
    k_a = keys[0]
    k_b = next(k for k in keys if bmap[k] != bmap[k_a])
    apply_batch(eng.table, _batch(spark, [
        ("I", k_a, 0, "user", "a0", None, T("2025-01-01 00:00:00"),
         T("2025-01-01 00:00:01"), 1),
        ("I", k_b, 0, "user", "b0", None, T("2025-01-01 00:00:00"),
         T("2025-01-01 00:00:01"), 2)]), epoch=0)

    # overlap: compactor folds bucket of k_a from a stale view while a
    # concurrent delta updates k_a
    compactor = LakeTable(spark, path)
    rel_w, b_w = _stage_delta(eng.table, k_a, "a1-concurrent", 10)
    eng.table.commit_delta(1, "default", rel_w, [b_w])
    with pytest.raises(CommitConflictError):
        compactor.compact(buckets=[bmap[k_a]])

    # recompute against fresh state succeeds and keeps the concurrent row
    compactor.refresh()
    compactor.compact(buckets=[bmap[k_a]])
    assert {r.text for r in LakeTable(spark, path).snapshot_df().collect()} \
        == {"a1-concurrent", "b0"}

    # disjoint: compactor folds k_b's bucket while a delta lands on k_a's
    compactor2 = LakeTable(spark, path)
    rel_w2, b_w2 = _stage_delta(eng.table, k_a, "a2-concurrent", 20)
    based = int(compactor2.current_snapshot_id)
    folded = compactor2.read_buckets([bmap[k_b]], with_internal=True, fold=True)
    rel_c = compactor2.new_data_rel("base")
    compactor2.write_files(folded, rel_c)
    eng.table.refresh()
    eng.table.commit_delta(2, "default", rel_w2, [b_w2])
    compactor2.commit_rebase(
        [bmap[k_b]], rel_c, kind="compaction", based_on=based)  # retries, no error
    assert {r.text for r in LakeTable(spark, path).snapshot_df().collect()} \
        == {"a2-concurrent", "b0"}


def test_schema_evolution_race_retries(spark, tmp_path):
    """evolve_schema that loses the metadata race recomputes the diff from
    fresh metadata and lands the widened schema."""
    import pyspark.sql.types as Ty

    path = str(tmp_path / "tbl")
    eng = CdcEngine(spark, path, num_buckets=4)
    apply_batch(eng.table, _batch(spark, [
        ("I", "c1", 0, "user", "seed", None, T("2025-01-01 00:00:00"),
         T("2025-01-01 00:00:01"), 1)]), epoch=0)

    evolver = LakeTable(spark, path)  # stale view
    incoming = Ty.StructType(
        list(evolver.schema().to_struct().fields)
        + [Ty.StructField("extra_note", Ty.StringType())]
    )
    rel_w, b_w = _stage_delta(eng.table, "c2", "racer", 5)
    eng.table.commit_delta(1, "default", rel_w, [b_w])
    changes = evolver.evolve_schema(incoming)  # loses the race, retries
    assert any("extra_note" in c for c in changes)
    assert "extra_note" in [f.name for f in LakeTable(spark, path).schema().to_struct().fields]


@pytest.mark.parametrize("seed", [7, 21, 1234])
def test_random_logs_converge_to_argmax(spark, tmp_path, seed):
    """Property: for a random op sequence over a small key pool, split
    into random epochs, the final table equals the in-Python argmax over
    (op_ts, lsn) per key honoring tombstones — regardless of epoch
    boundaries or duplicate emissions."""
    rng = random.Random(seed)
    keys = [(f"c{i}", j) for i in range(6) for j in range(4)]
    rows, expected = [], {}
    events = []
    for lsn in range(1, 250):
        conv, turn = rng.choice(keys)
        op = rng.choice(["I", "U", "U", "D"])
        op_ts = T("2025-01-01 00:00:00") + dt.timedelta(seconds=rng.randrange(10_000))
        text = None if op == "D" else f"t{lsn}"
        events.append((op, conv, turn, op_ts, lsn, text))
        rows.append((op, conv, turn, None if op == "D" else "user", text, None,
                     None if op == "D" else T("2025-01-01 00:00:00"), op_ts, lsn))
        if rng.random() < 0.15:  # duplicate re-send, identical bits
            events.append((op, conv, turn, op_ts, lsn, text))
            rows.append(rows[-1])
    for op, conv, turn, op_ts, lsn, text in events:
        cur = expected.get((conv, turn))
        if cur is None or (op_ts, lsn) > (cur[0], cur[1]):
            expected[(conv, turn)] = (op_ts, lsn, op, text)
    want = {k: v[3] for k, v in expected.items() if v[2] != "D"}

    eng = CdcEngine(spark, str(tmp_path / "tbl"), num_buckets=4)
    i = 0
    epoch = 0
    while i < len(rows):
        n = rng.randrange(1, 80)
        apply_batch(eng.table, _batch(spark, rows[i:i + n]), epoch=epoch)
        i += n
        epoch += 1
    got = {(r.conv_id, r.turn_idx): r.text for r in eng.table.snapshot_df().collect()}
    assert got == want


def test_racing_writers_never_share_data_paths(spark, tmp_path):
    """Two writers that loaded the same table version write to DISTINCT
    attempt-unique directories, so the loser's mode=overwrite write can
    never clobber the winner's committed files; the metadata reservation
    alone arbitrates, and the winner's rows survive intact."""
    path = str(tmp_path / "tbl")
    eng = CdcEngine(spark, path, num_buckets=4)
    apply_batch(eng.table, _batch(spark, [
        ("I", "c1", 0, "user", "seed", None, T("2025-01-01 00:00:00"),
         T("2025-01-01 00:00:01"), 1)]), epoch=0)

    winner = LakeTable(spark, path)
    loser = LakeTable(spark, path)  # same loaded version as winner

    def staged(t, text, lsn):
        df = t.snapshot_df().limit(1).select(
            F.col("conv_id"), F.col("turn_idx"), F.col("role"),
            F.lit(text).alias("text"), F.col("tool"), F.col("ts"),
            F.to_timestamp(F.lit("2025-01-01 00:01:00")).alias("_op_ts"),
            F.lit(lsn).cast("long").alias("_lsn"),
            F.lit(False).alias("_tombstone"),
            t.bucket_expr(F.col("conv_id")).alias("_bucket"),
        )
        rel = t.new_data_rel("delta")
        t.write_files(df, rel)
        return rel

    rel_w = staged(winner, "winner", 10)
    rel_l = staged(loser, "loser", 5)
    assert rel_w != rel_l  # attempt-unique paths — the ADVICE race is gone

    buckets = [r["_b"] for r in winner.spark.createDataFrame(
        [("c1",)], ["conv_id"]).select(
        winner.bucket_expr(F.col("conv_id")).alias("_b")).collect()]
    winner.commit_delta(1, "default", rel_w, buckets)
    with pytest.raises(ConcurrentCommitError):
        loser.commit_delta(1, "default", rel_l, buckets)

    fresh = LakeTable(spark, path)
    texts = {r.text for r in fresh.snapshot_df().collect()}
    assert "winner" in texts and "loser" not in texts


def test_racing_engine_creation_converges(spark, tmp_path):
    """Two engines starting concurrently on a fresh table path must BOTH
    converge on the one created table — the v0-reservation loser re-opens
    instead of crashing at startup (the exists() pre-check is advisory:
    both racers can see None before either publishes).

    Deterministic loser-path probe: a store whose read_hint() reports the
    table as absent exactly as long as the TOCTOU window is open, while
    v0 is already published by the winner."""
    import threading

    from etl_spark.cdc.engine import CdcEngine
    from etl_spark.lake.metastore import PosixMetadataStore
    from etl_spark.lake.table import META_DIR

    path = str(tmp_path / "tbl")
    # the winner creates the table for real
    CdcEngine(spark, path, num_buckets=2)

    class StaleHintStore(PosixMetadataStore):
        """Sees the table as absent until the creation attempt has gone
        through (v0 publish fails against the winner's reservation)."""

        def __init__(self, meta_dir):
            super().__init__(meta_dir)
            self.stale = True

        def read_hint(self):
            if self.stale:
                return None
            return super().read_hint()

        def publish_version(self, version, payload):
            try:
                super().publish_version(version, payload)
            finally:
                self.stale = False

    store = StaleHintStore(os.path.join(path, META_DIR))
    loser = CdcEngine(spark, path, num_buckets=2, store=store)
    assert loser.table.snapshot_df().count() == 0
    assert not store.stale  # the loser really did hit the reservation

    # and a best-effort wall-clock race: N threads on one fresh path all
    # construct successfully (timing-dependent which one wins v0)
    path2 = str(tmp_path / "tbl2")
    errs: list[Exception] = []

    def boot():
        try:
            CdcEngine(spark, path2, num_buckets=2)
        except Exception as e:  # pragma: no cover - failure detail
            errs.append(e)

    threads = [threading.Thread(target=boot) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errs == []


@pytest.mark.parametrize("seed", [3, 11])
def test_chaos_maintenance_interleaving_converges(spark, tmp_path, seed):
    """Soak: a replay with randomized maintenance interleaved between
    epochs — duplicate applies through a second handle (fenced),
    compaction, tombstone expunge at the safe horizon, partition close,
    vacuum — always converges to the same LWW state as an uninterrupted
    replay. Every maintenance op is logically invisible; only the fences
    and file layout change."""
    import os

    from etl_spark.cdc.maintenance import expunge_tombstones
    from etl_spark.cdc.partitions import close_due_partitions
    from etl_spark.datagen import gen_changes
    from etl_spark.lake.table import LakeTable

    rng = random.Random(seed)
    log = gen_changes(spark, 20_000, n_convs=40, n_epochs=8).cache()

    plain = CdcEngine(spark, str(tmp_path / "plain"), num_buckets=4)
    for ep in range(8):
        apply_batch(plain.table, log.where(F.col("epoch") == ep).drop("epoch"),
                    epoch=ep)

    eng = CdcEngine(spark, str(tmp_path / "chaos"), num_buckets=4)
    other = None
    for ep in range(8):
        batch = log.where(F.col("epoch") == ep).drop("epoch")
        apply_batch(eng.table, batch, epoch=ep)
        for _ in range(rng.randrange(0, 3)):
            act = rng.choice(["dup", "compact", "expunge", "close", "vacuum"])
            if act == "dup":
                # racing applier replays a random committed epoch — fenced
                other = other or LakeTable(spark, eng.table.path)
                other.refresh()
                re_ep = rng.randrange(0, ep + 1)
                st = apply_batch(
                    other,
                    log.where(F.col("epoch") == re_ep).drop("epoch"),
                    epoch=re_ep,
                )
                assert st.skipped
            elif act == "compact":
                bs = rng.sample(range(4), rng.randrange(1, 5))
                eng.table.compact(bs)
            elif act == "expunge":
                wm = eng.table.watermark_any()
                if wm:
                    # SAFE horizon = watermark − max lateness (the
                    # generator back-dates ~5% of events by 48 h; an
                    # expunged tombstone can no longer beat a late
                    # sub-horizon change, so the horizon must clear it)
                    horizon = dt.datetime.fromisoformat(wm) - dt.timedelta(
                        hours=49
                    )
                    expunge_tombstones(eng.table, str(horizon))
            elif act == "close":
                close_due_partitions(eng.table, now=dt.datetime(2026, 1, 1))
            else:
                eng.table.vacuum(keep_meta_versions=2, min_age_seconds=0)

    a = plain.table.snapshot_df().toPandas()
    b = eng.table.snapshot_df().toPandas()
    from tests.conftest import assert_pdf_equal

    assert_pdf_equal(a, b, ["conv_id", "turn_idx"])
    log.unpersist()


@pytest.mark.parametrize("seed", [5, 17])
def test_chaos_with_schema_evolution_converges(spark, tmp_path, seed):
    """Soak: schema evolution INTERLEAVED with randomized maintenance.

    Both tables replay the same 8-epoch log under the same fixed schema
    schedule — epoch 3 adds a column mid-stream, epoch 4 renames a
    payload column (later batches keep writing the OLD name, creating a
    fresh column beside the renamed one), epoch 5 widens the added
    column int→bigint, epoch 6 drops `role` (epoch 7's batches re-add
    the name under a fresh field ID, so pre-drop role values must stay
    dead) — but the chaos table additionally runs random maintenance
    (fenced duplicate applies, compaction, safe-horizon expunge,
    partition close, vacuum) between epochs. Byte-equal convergence
    proves the maintenance ops commute with every schema-evolution rule,
    not just with plain replay (the prior soak) or evolution alone (the
    schema property test)."""
    import os  # noqa: F401

    from etl_spark.cdc.maintenance import expunge_tombstones
    from etl_spark.datagen import gen_changes
    from etl_spark.lake.table import LakeTable

    rng = random.Random(seed)
    log = gen_changes(spark, 20_000, n_convs=40, n_epochs=8).cache()

    def epoch_batch(ep):
        b = log.where(F.col("epoch") == ep).drop("epoch")
        if ep >= 3:
            # mid-stream added column; epochs >=5 write it WIDE
            score = F.length("text").cast("bigint" if ep >= 5 else "int")
            b = b.withColumn("score", score)
        return b

    def schema_ops(t: LakeTable, ep: int):
        # identical schedule for both tables (keys untouched)
        if ep == 4:
            t.rename_column("tool", "tool_name")
        elif ep == 6:
            t.drop_column("role")

    def replay(name, chaos: bool):
        eng = CdcEngine(spark, str(tmp_path / name), num_buckets=4)
        other = None
        for ep in range(8):
            apply_batch(eng.table, epoch_batch(ep), epoch=ep)
            schema_ops(eng.table, ep)
            if not chaos:
                continue
            for _ in range(rng.randrange(0, 3)):
                act = rng.choice(["dup", "compact", "expunge", "vacuum"])
                if act == "dup":
                    other = other or LakeTable(spark, eng.table.path)
                    other.refresh()
                    re_ep = rng.randrange(0, ep + 1)
                    st = apply_batch(other, epoch_batch(re_ep), epoch=re_ep)
                    assert st.skipped
                elif act == "compact":
                    bs = rng.sample(range(4), rng.randrange(1, 5))
                    eng.table.compact(bs)
                elif act == "expunge":
                    wm = eng.table.watermark_any()
                    if wm:
                        horizon = dt.datetime.fromisoformat(wm) - dt.timedelta(
                            hours=49
                        )
                        expunge_tombstones(eng.table, str(horizon))
                else:
                    eng.table.vacuum(keep_meta_versions=2, min_age_seconds=0)
        return eng

    plain = replay("plain_se", chaos=False)
    eng = replay("chaos_se", chaos=True)

    cols = plain.table.schema().names()
    assert cols == eng.table.schema().names()
    # the schedule's fingerprints: renamed name live, old name re-added
    # beside it, role re-added post-drop, score widened
    assert "tool_name" in cols and "tool" in cols and "role" in cols
    assert next(
        f for f in plain.table.schema().fields if f.name == "score"
    ).type == "bigint"

    a = plain.table.snapshot_df().toPandas()
    b = eng.table.snapshot_df().toPandas()
    from tests.conftest import assert_pdf_equal

    assert_pdf_equal(a, b, ["conv_id", "turn_idx"])
    # pre-drop role bytes stay dead: a non-NULL role can only come from a
    # winner written AFTER the re-add (epoch 7) — pin it against a pandas
    # argmax over the raw log
    raw = log.toPandas()
    raw["_ord"] = list(zip(raw["op_ts"], raw["lsn"]))
    win = raw.loc[raw.groupby(["conv_id", "turn_idx"])["_ord"].idxmax()]
    e7_keys = {
        (r.conv_id, r.turn_idx)
        for r in win.itertuples()
        if r.epoch == 7 and r.op != "D"
    }
    got_role_keys = {
        (r.conv_id, r.turn_idx) for r in a[a["role"].notna()].itertuples()
    }
    assert got_role_keys <= e7_keys
    assert got_role_keys  # schedule guarantees some epoch-7 winners exist
    log.unpersist()
