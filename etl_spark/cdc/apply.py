"""MERGE-apply: one CDC micro-batch → LakeTable upsert, exactly-once.

Semantics (the engine's core op — reference S7/S8/S9: delete+insert day,
anti-join-guarded insert, MERGE upsert; /root/reference/etl/dags/
user_history/include/user_history/insert_user_history.sql:301-311,
load/modules/mod_data_insert.sql:2-7, appsflyer/update_user_map.sql:208-269):

  MERGE INTO transcripts t USING batch s
  ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
  WHEN MATCHED AND (s.op_ts, s.lsn) > (t._op_ts, t._lsn) AND s.op =  'D' THEN tombstone
  WHEN MATCHED AND (s.op_ts, s.lsn) > (t._op_ts, t._lsn) AND s.op <> 'D' THEN UPDATE *
  WHEN NOT MATCHED AND s.op <> 'D' THEN INSERT *
  WHEN NOT MATCHED AND s.op =  'D' THEN tombstone   -- delete-of-absent fence

Physical strategy: **merge-on-read delta append** (LakeTable format v2).
The batch is LWW-deduped to one winner per key (hash agg, skew-safe — see
``dedup.lww_dedup``) and those winners are written as per-bucket *delta*
files; the table is NOT read at apply time. The LWW resolve happens at
read (base ∪ deltas folded by the same max-struct argmax, target rows
comparing on their stored ``(_op_ts, _lsn)``), so a late/out-of-order
change — older than what's applied — loses and the table is unchanged:
replay in any epoch order converges to the same state (the oracle's
argmax). Deletes persist as tombstones so a late pre-delete update cannot
resurrect a deleted key; ``snapshot_df`` filters them out.

Scale notes:
  * apply cost is O(batch), never O(table): only winner rows are written,
    into only the buckets the batch touches;
  * read cost stays bounded by auto-compaction (fold deltas into a new
    base once a bucket exceeds the threshold) — amortized O(1) rewrites;
  * the LWW fold is a hash agg with map-side partial combine → hot-key
    safe without salting;
  * epoch fencing makes the whole thing idempotent: a replayed epoch is
    skipped before any read, and a crash between delta write and commit
    leaves only an unreferenced directory that the replay overwrites;
  * lineage offsets (rows_in, lsn range) ride the same aggregation as the
    dedup — the change log is scanned exactly once per batch.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

import os

from ..lake.schema import align
from ..lake.table import EpochFencedError, LakeTable
from .dedup import ORDER, lww_dedup, lww_dedup_narrow

# Physical dedup strategy for the MERGE path (see dedup.py for the
# trade-offs; env override is the A/B lever for scaling harnesses):
#   auto       — cost-based dispatch on the batch's optimizer size
#                estimate (for a file-backed batch: its input bytes).
#                DEFAULT. Small batches take ``agg``; large ones take
#                ``narrow``. narrow's per-batch FIXED cost (a second scan
#                job + the winner-broadcast driver round-trip) only pays
#                for itself once the wide shuffle it avoids is big:
#                measured on this box, agg wins 1M-event epochs (1.4 vs
#                1.8 s/epoch) and narrow wins 16M-event epochs (local[8]
#                12.9 vs 16.8 s, local[32] 9.7 vs 11.0 s). When the size
#                estimate is unavailable the scale-safe branch (narrow)
#                is taken.
#   narrow     — column-pruned winner agg + broadcast join-back: the
#                batch's wide rows never shuffle by key and never pass
#                through an aggregation buffer. Assumes per-batch winner
#                sets broadcastable (≤ ~10^7 keys ≈ 400 MB); larger →
#                agg or narrow-sh.
#   agg        — single max-struct hash aggregation (wide buffer, map-side
#                combine; wins when dup factor per input split is high or
#                the batch is small enough that job count dominates)
#   narrow-sh  — narrow with a shuffle_hash join-back (winner set too big
#                to broadcast; shuffles wide rows once, by key)
DEDUP_STRATEGY = os.environ.get("ETL_SPARK_DEDUP_STRATEGY", "auto")

# auto crossover: batches whose optimizer size estimate is below this take
# the agg plan. Measured on the bench fixture: agg wins 1M-event (~45 MB
# snappy parquet) and 4M-event (~180 MB; 2.3 vs 3.6 s) epochs, narrow wins
# 16M (~700 MB) and 320M — 256 MB sits between the data points.
AUTO_NARROW_MIN_BYTES = int(
    os.environ.get("ETL_SPARK_DEDUP_AUTO_MIN_MB", "256")
) * 1024 * 1024

# narrow (broadcast join-back) is only safe while the per-batch winner set
# fits the executors: keys × ~40 B/winner-row ⇒ 10^7 keys ≈ 400 MB is the
# documented ceiling (dedup.lww_dedup_narrow). Above the estimate, auto
# selects narrow-sh (shuffle-hash join-back: narrow build side streams the
# wide probe side — never OOMs, ~15% slower at the 40M-event point).
AUTO_BCAST_MAX_KEYS = int(
    os.environ.get("ETL_SPARK_DEDUP_BCAST_MAX_KEYS", str(10_000_000))
)
# bytes-per-change-row prior for turning the Catalyst byte estimate into a
# row count (bench fixture: 1M-event epochs ≈ 45 MB snappy parquet).
AUTO_ROW_BYTES_PRIOR = int(os.environ.get("ETL_SPARK_DEDUP_ROW_BYTES", "40"))

VALID_DEDUP_STRATEGIES = frozenset({"auto", "agg", "fused", "narrow", "narrow-sh"})


def resolve_dedup_strategy(
    changes: DataFrame,
    strategy: str | None = None,
    prior_stats: dict | None = None,
    min_bytes: int | None = None,
    max_bcast_keys: int | None = None,
    row_bytes: int | None = None,
) -> str:
    """Resolve ``auto`` to a physical strategy.

    Dispatch inputs:
      * the batch's Catalyst size estimate (exact input bytes for a
        file-backed batch) — small batches take ``fused`` (one exchange
        on the write's bucket key, one sort, agg and delta write share
        the partitioning; measured ~15% faster than ``agg`` at 1M-event
        epochs and byte-equal). ``apply_batch`` falls back to ``agg``
        when the table's write_width needs its own fan-out;
      * an estimate of the batch's distinct-key (winner) count, deciding
        ``narrow`` (broadcast join-back) vs ``narrow-sh`` (shuffle-hash):
        estimated rows = bytes ÷ ``row_bytes`` prior, scaled by the
        stream's observed keys-per-row ratio from the PREVIOUS committed
        epoch's lineage (``prior_stats`` = last delta-commit stats with
        ``winners``/``rows_in``). With no prior evidence the ratio is 1
        (every row its own key) — the conservative direction: a first
        giant epoch takes narrow-sh rather than risking an
        unbroadcastable winner set.

    Unknown strategy strings raise (a typo in ``ETL_SPARK_DEDUP_STRATEGY``
    must not silently change the physical plan). When no size estimate is
    available the scale-safe ``narrow-sh`` is taken.
    """
    strategy = strategy or DEDUP_STRATEGY
    if strategy not in VALID_DEDUP_STRATEGIES:
        raise ValueError(
            f"unknown dedup strategy {strategy!r} — expected one of "
            f"{sorted(VALID_DEDUP_STRATEGIES)}"
        )
    if strategy != "auto":
        return strategy
    est = plan_size_bytes(changes)
    if est is None:
        return "narrow-sh"
    if est < (AUTO_NARROW_MIN_BYTES if min_bytes is None else min_bytes):
        return "fused"
    est_rows = est / (AUTO_ROW_BYTES_PRIOR if row_bytes is None else row_bytes)
    ratio = 1.0
    if prior_stats:
        w, r = prior_stats.get("winners"), prior_stats.get("rows_in")
        if w and r:
            ratio = min(1.0, float(w) / float(r))
    est_keys = est_rows * ratio
    cap = AUTO_BCAST_MAX_KEYS if max_bcast_keys is None else max_bcast_keys
    return "narrow" if est_keys <= cap else "narrow-sh"


def plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's size estimate for ``df`` (exact input bytes for a
    file-backed batch), or None when unavailable.

    Reaches through PySpark's PRIVATE ``_jdf.queryExecution()`` surface —
    there is no public PySpark API for plan statistics. A Spark upgrade
    that moves this surface does not break correctness (every ``auto``
    dispatch silently degrades to the scale-safe ``narrow-sh``), but it
    DOES silently lose the measured small-epoch fast paths, so
    tests/test_cdc_core.py carries a version canary that fails loudly if
    this returns None on the running Spark — on upgrade, re-point the
    probe (queryExecution/optimizedPlan/stats/sizeInBytes renames) rather
    than deleting the canary."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return None


def _statically_empty(df: DataFrame) -> bool:
    """True iff the optimizer already PROVED ``df`` has zero rows (the
    plan folds to an empty LocalRelation — e.g. ``createDataFrame([],
    schema)``, a ``limit(0)`` change feed, or a scan of a table with no
    files). Driver-only plan inspection, no job; an undecidable or
    non-empty plan returns False and takes the normal path. A batch that
    merely HAPPENS to be empty (a filter matching nothing over real
    files) is not detected here and flows through the normal pipeline,
    which handles zero surviving rows fine — the guard exists for plans
    Spark collapses so far that their Observation node never executes."""
    try:
        plan = df._jdf.queryExecution().optimizedPlan()
        return (
            plan.getClass().getSimpleName() == "LocalRelation"
            and plan.data().isEmpty()
        )
    except Exception:  # pragma: no cover - py4j/plan API drift
        return False


@dataclass
class ApplyStats:
    epoch: int
    skipped: bool = False
    snapshot_id: int | None = None
    rows_in: int = 0
    winners: int = 0
    dirty_buckets: list[int] = field(default_factory=list)
    schema_changes: list[str] = field(default_factory=list)
    compacted_buckets: list[int] = field(default_factory=list)
    compaction_deferred: bool = False  # maintenance lost its race twice; next apply retries
    lsn_min: int | None = None
    lsn_max: int | None = None
    op_ts_max: str | None = None
    late_rows: int = 0
    max_lag_s: float | None = None
    ingest_lag_s: float | None = None
    watermark: str | None = None
    gate: dict | None = None
    wall_s: float = 0.0

    @property
    def events_per_s(self) -> float:
        return self.rows_in / self.wall_s if self.wall_s > 0 else 0.0


def apply_batch(
    table: LakeTable,
    changes: DataFrame,
    epoch: int,
    source: str = "default",
    evolve: bool = True,
    compact: bool = True,
    gate=None,
    dedup_strategy: str | None = None,
    alert_sink=None,
) -> ApplyStats:
    """Apply one micro-batch of changes. Idempotent per (source, epoch).

    ``gate`` (a ``quality.QualityGate``) rides the same Observation as the
    lineage metrics — zero extra passes. Its verdict lands between the
    data write and the metadata commit: a mandatory violation raises
    ``GateFailure`` with NOTHING committed (the orphan delta directory is
    reclaimed by vacuum; the epoch stays unfenced, so a corrected retry
    replays it). Optional violations are recorded in stats/lineage and do
    not block. Row-level checks are scoped to non-delete events.

    ``alert_sink`` is this apply's alert destination when the gate carries
    none of its own — passed per call, never written onto the (possibly
    shared) gate object.
    """
    t0 = time.time()
    table.refresh()
    if epoch <= table.committed_epoch(source):
        return ApplyStats(epoch=epoch, skipped=True, wall_s=time.time() - t0)

    stats = ApplyStats(epoch=epoch)
    if _statically_empty(changes):
        # A provably-empty batch (empty createDataFrame, a limit(0) feed,
        # a full resync of a never-written source) still needs its epoch
        # FENCED — exactly-once means the caller must be able to resume
        # past it — but the write pipeline below would attach Observations
        # to a plan Spark collapses to an empty LocalRelation, and
        # Observation.get then fails on the never-executed node. Commit a
        # fencing-only delta instead (same shape delete_where uses for
        # zero matched rows): no files, no schema change, no watermark
        # movement.
        stats.snapshot_id = table.commit_delta(
            epoch, source, "", [], stats={"kind": "empty_batch"}
        )
        stats.wall_s = time.time() - t0
        return stats
    prev_wm = table.watermark(source)  # events below this are LATE (flagged, kept)

    # 1. schema evolution: widen the table so this batch's payload fits
    payload_struct = changes.drop("op", *ORDER).schema
    if evolve:
        stats.schema_changes = table.evolve_schema(payload_struct)
    schema = table.schema()

    # 2. LWW-dedup the batch (hash agg, skew-safe), bucket the winners, and
    #    piggy-back lineage offsets on the same single scan of the log
    late = (
        F.when(F.col("op_ts") < F.to_timestamp(F.lit(prev_wm)), 1).otherwise(0)
        if prev_wm
        else F.lit(0)
    )
    # Lineage/commit stats ride the write job as Observations — the whole
    # apply is ONE Spark job (plus the broadcast build under the narrow
    # strategy), no persist, no separate collect pass. Minimizing
    # driver-side serial work per epoch is what keeps scaling efficiency
    # high (Amdahl): at 4× cores the only non-scaling parts left are the
    # broadcast round-trip (narrow), the output commit, and one metadata
    # fsync.
    obs = Observation(f"apply_{source}_{epoch}")
    gate_cols = gate.observe_cols(row_filter=F.col("op") != "D") if gate else []
    strategy = resolve_dedup_strategy(
        changes, dedup_strategy, prior_stats=table.last_delta_stats(source)
    )
    if strategy == "fused" and (
        table.write_width > 1 or table.bucket_key not in table.key_cols
    ):
        # fused's single exchange IS the write partitioning; a widened
        # write layout needs its own fan-out, so fall back to agg. And
        # fused's groupBy(_bucket, key) is only a per-key dedup when the
        # bucket is a function of the key — a bucket_key outside key_cols
        # would split one key's duplicates across buckets and emit
        # several "winners" per key, so that layout takes agg too.
        strategy = "agg"
    if strategy.startswith("narrow"):
        # batch-global counters observe on the phase-1 NARROW scan, so
        # the broadcast stays at (key, max-order) — the driver round-trip
        # is the narrow strategy's only serial cost, keep it minimal
        pre = Observation(f"apply_pre_{source}_{epoch}")
        winners = lww_dedup_narrow(
            changes, key=table.key_cols,
            winners_join="shuffle_hash" if strategy == "narrow-sh" else "broadcast",
            observe=(pre, [
                F.count(F.lit(1)).alias("rows_in"),
                F.min("lsn").alias("lsn_min"),
                F.max("lsn").alias("lsn_max"),
                F.min("op_ts").alias("op_ts_min"),
                F.sum(late).alias("late_rows"),
            ]),
        )
    else:
        pre = None
        extra_aggs = {
            "_cnt": F.count(F.lit(1)),
            "_lsn_min": F.min("lsn"),
            "_lsn_max": F.max("lsn"),
            "_op_ts_min": F.min("op_ts"),
            "_late_cnt": F.sum(late),
        }
        if strategy == "fused":
            # one-exchange epoch: shuffle RAW rows on _bucket once, then
            # group by (_bucket, key) — HashPartitioning(_bucket) already
            # satisfies that clustering (bucket is a function of the key),
            # so Catalyst plans partial+final agg back-to-back with no
            # second exchange and ONE sort, and the winners come out
            # partitioned exactly as the delta write needs them
            # (write_files skips its repartition via pre_partitioned).
            # vs agg: saves one full-row sort, one exchange of the winner
            # set, and a stage barrier; costs shuffling raw rows instead
            # of map-combined partial winners — a win while the dup factor
            # is modest, which is why auto picks it only for small epochs
            # (large ones go narrow/narrow-sh and never shuffle text).
            bucketed = changes.withColumn(
                "_bucket", table.bucket_expr(F.col(table.bucket_key))
            ).repartition(table.num_buckets, F.col("_bucket"))
            winners = lww_dedup(
                bucketed, key=["_bucket", *table.key_cols], extra_aggs=extra_aggs
            )
        else:
            winners = lww_dedup(changes, key=table.key_cols, extra_aggs=extra_aggs)
    if strategy != "fused":
        winners = winners.withColumn(
            "_bucket", table.bucket_expr(F.col(table.bucket_key))
        )
    final_aggs = [
        F.count(F.lit(1)).alias("n_keys"),
        F.max("op_ts").alias("op_ts_max"),
        F.collect_set("_bucket").alias("buckets"),
    ]
    if pre is None:
        final_aggs += [
            F.sum("_cnt").alias("rows_in"),
            F.min("_lsn_min").alias("lsn_min"),
            F.max("_lsn_max").alias("lsn_max"),
            F.min("_op_ts_min").alias("op_ts_min"),
            F.sum("_late_cnt").alias("late_rows"),
        ]
    winners = winners.observe(obs, *final_aggs, *gate_cols)

    as_stored = align(
        winners, schema, keep_extra=["op", "op_ts", "lsn", "_bucket"]
    ).select(
        *schema.names(),
        F.col("op_ts").alias("_op_ts"),
        F.col("lsn").alias("_lsn"),
        (F.col("op") == "D").alias("_tombstone"),
        F.col("_bucket"),
    )

    # 3. write winners as a DELTA file set (only dirty buckets; O(batch))
    rel = table.write_files(
        as_stored, table.new_data_rel("delta"),
        pre_partitioned=(strategy == "fused"),
    )

    try:
        m = dict(obs.get)
        if pre is not None:
            m.update(pre.get)
    except Exception:
        # Observation.get fails on a never-executed metrics node: Spark
        # collapses a zero-row plan (AQE empty-exchange propagation, or an
        # RDD-backed empty relation the static guard above can't prove)
        # and the CollectMetrics subtree never runs. Confirm the batch is
        # genuinely empty — one cheap job, paid only on this cold path —
        # then fence the epoch with an empty commit exactly like the
        # static guard; the written empty delta dir is orphaned and
        # vacuum-reclaimed. A non-empty batch re-raises: that is a real
        # observation failure, not an empty-plan artifact.
        if not changes.isEmpty():
            raise
        stats.snapshot_id = table.commit_delta(
            epoch, source, "", [], stats={"kind": "empty_batch"}
        )
        stats.wall_s = time.time() - t0
        return stats
    stats.winners = int(m["n_keys"])
    stats.rows_in = int(m["rows_in"] or 0)
    stats.dirty_buckets = sorted(int(b) for b in (m["buckets"] or []))
    stats.lsn_min = m["lsn_min"]
    stats.lsn_max = m["lsn_max"]
    stats.op_ts_max = str(m["op_ts_max"]) if m["op_ts_max"] is not None else None
    stats.late_rows = int(m["late_rows"] or 0)
    if m["op_ts_max"] is not None and m["op_ts_min"] is not None:
        # intra-batch event-time spread (how out-of-order the batch was)
        stats.max_lag_s = round((m["op_ts_max"] - m["op_ts_min"]).total_seconds(), 3)
        # ingest lag: wall clock at commit minus the newest applied change
        # (how far behind the stream head this table runs — THE freshness
        # metric an operator alerts on; session tz is pinned UTC so the
        # naive op_ts is UTC by construction)
        from datetime import timezone

        head = m["op_ts_max"].replace(tzinfo=timezone.utc).timestamp()
        stats.ingest_lag_s = round(time.time() - head, 3)
    if gate is not None:
        from ..quality import GateFailure

        report = gate.report_from_metrics(dict(obs.get))
        stats.gate = report.to_dict()
        # route violations to the alert sink BEFORE any raise: mandatory
        # failures alert and block, optional ones alert and proceed
        gate.emit_alerts(
            report, {"source": source, "epoch": epoch}, default_sink=alert_sink
        )
        if not report.ok:
            # block BEFORE the metadata commit: table state unchanged,
            # epoch unfenced, the written delta is an orphan for vacuum
            raise GateFailure(report, context=f"epoch {epoch} ({source})")
    try:
        stats.snapshot_id = table.commit_delta(
            epoch,
            source,
            rel if stats.dirty_buckets else "",
            stats.dirty_buckets,
            stats={
                "winners": stats.winners,
                "rows_in": stats.rows_in,
                "schema_changes": stats.schema_changes,
                "op_ts_max": stats.op_ts_max,
                "late_rows": stats.late_rows,
            },
        )
    except EpochFencedError:
        # A racing applier committed this exact (source, epoch) between our
        # fence pre-check and our commit. Exactly-once holds: our delta is
        # an unreferenced orphan (vacuum reclaims it) and the result is
        # identical to having been fenced up front.
        return ApplyStats(epoch=epoch, skipped=True, wall_s=time.time() - t0)
    stats.watermark = table.watermark(source)

    # 4. bounded read amplification: compact buckets that crossed the
    #    delta-count threshold (separate maintenance commit, crash-safe)
    if compact:
        # best-effort: a concurrent applier's delta on the same bucket can
        # conflict the maintenance commit AFTER our data commit already
        # succeeded — that must not surface as an apply failure (the next
        # apply re-triggers compaction anyway). One retry against fresh
        # state covers the common single-race case; if both attempts
        # conflict the deferral is RECORDED, never raised — the data
        # commit already happened, so the apply succeeded by definition.
        from ..lake.table import CommitConflictError

        for attempt in range(2):
            try:
                need = table.buckets_needing_compaction()
                if need:
                    table.compact(need)
                    stats.compacted_buckets = need
                break
            except CommitConflictError:
                table.refresh()
                if attempt == 1:
                    stats.compaction_deferred = True
    stats.wall_s = time.time() - t0
    return stats
