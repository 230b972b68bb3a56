"""CdcEngine — binlog/WAL tail → LakeTable upsert, batch or streaming.

Two drive modes over the same ``apply_batch`` core:

* **replay** — iterate the change log's epoch directories in order
  (``epoch=00000/``, ``epoch=00001/``, ...), one MERGE-apply per epoch.
  Each epoch directory is read with its *own* physical schema (parquet
  footer), so a mid-stream schema-evolution epoch (new column / widened
  type) is discovered naturally and the table widens before the merge.
  Resumable: epochs ≤ the table's committed epoch are skipped (fencing),
  so an arbitrary kill + rerun converges to the same final state.

* **stream** — Structured Streaming file source over the change-log root
  with ``foreachBatch``; Spark's checkpoint gives monotonic batch ids,
  and the same epoch fencing de-duplicates foreachBatch's at-least-once
  replay into exactly-once table commits (north rule: checkpointed commit
  epochs + snapshot fencing).

Reference analogue for the drive loop: Airflow ``@daily catchup=True
depends_on_past=True`` over idempotent day transforms
(/root/reference/etl/dags/user_history/DAG_user_history.py:47-51).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import SparkSession

from pyspark.sql import types as T

from ..lake.table import LakeTable
from .apply import ApplyStats, apply_batch
from .lineage import LineageLog

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

CHANGE_SCHEMA = T.StructType(
    [T.StructField("op", T.StringType(), False)]
    + TRANSCRIPT_SCHEMA.fields
    + [
        T.StructField("op_ts", T.TimestampType(), False),
        T.StructField("lsn", T.LongType(), False),
    ]
)


def fencing_namespace(checkpoint_dir: str, source: str) -> str:
    """Per-checkpoint fencing namespace: Structured Streaming batch ids
    are only monotone WITHIN one checkpoint lineage, so the fencing
    source is suffixed with an id stored in the checkpoint dir — a
    fresh/deleted checkpoint restarts batch ids at 0 under a NEW
    namespace (reprocessed, LWW-idempotent) instead of being fenced as
    replays and silently dropped. Written tmp+fsync+rename; an empty
    marker (crash mid-create) counts as absent."""
    import uuid as _uuid

    from ..lake.table import _atomic_write_text

    os.makedirs(checkpoint_dir, exist_ok=True)
    marker = os.path.join(checkpoint_dir, "_etl_spark_lineage_id")
    marker_id = ""
    if os.path.exists(marker):
        with open(marker) as f:
            marker_id = f.read().strip()
    if not marker_id:
        marker_id = _uuid.uuid4().hex[:12]
        _atomic_write_text(marker, marker_id)
    return f"{source}@{marker_id}"


class CdcEngine:
    def __init__(
        self,
        spark: SparkSession,
        table_path: str,
        num_buckets: int = 16,
        compact_threshold: int = 8,
        write_width: int = 1,
        dedup_strategy: str | None = None,
        store=None,
    ):
        """``store`` (lake.metastore.MetadataStore) overrides the commit-
        metadata backend — e.g. an HttpMetadataStore for object-store
        deployments where data rides the filesystem connector but commit
        atomicity needs conditional PUT. Default: POSIX ``_meta`` dir."""
        self.spark = spark
        self.table_path = table_path
        self.dedup_strategy = dedup_strategy
        if LakeTable.exists(table_path, store=store):
            self.table = LakeTable(spark, table_path, store=store)
        else:
            # if_not_exists: two engines racing onto a fresh path (the
            # racing-applier scenario apply_batch already fences) must
            # both converge on the one created table, not crash the
            # reservation loser at startup
            self.table = LakeTable.create(
                spark, table_path, TRANSCRIPT_SCHEMA, bucket_key="conv_id",
                num_buckets=num_buckets, compact_threshold=compact_threshold,
                write_width=write_width, store=store, if_not_exists=True,
            )
        self.lineage = LineageLog(os.path.join(table_path, "_lineage", "lineage.jsonl"))
        self.alerts_path = os.path.join(table_path, "_lineage", "alerts.jsonl")

    def default_alert_sink(self):
        """Default alert destination for gate/SLO violations: a
        lineage-style JSONL table next to this table's lineage log. Passed
        PER APPLY (never written onto the caller's gate object, which may
        be shared across engines — a shared gate must not route one
        table's alerts into another's alerts file)."""
        from ..quality import JsonlAlertSink

        return JsonlAlertSink(self.alerts_path)

    # -- batch replay ---------------------------------------------------------

    @staticmethod
    def list_epochs(change_log_dir: str) -> list[tuple[int, str]]:
        out = []
        for name in sorted(os.listdir(change_log_dir)):
            m = re.fullmatch(r"epoch=(\d+)", name)
            if m:
                out.append((int(m.group(1)), os.path.join(change_log_dir, name)))
        return sorted(out)

    def replay(
        self,
        change_log_dir: str,
        source: str = "default",
        stop_after: int | None = None,
        gate=None,
        lag_slo=None,
    ) -> list[ApplyStats]:
        """Apply every epoch directory in order; skip already-committed ones.

        ``stop_after`` applies at most that many *new* epochs (kill/resume
        test hook). Lineage offsets (rows_in, lsn range) come out of the
        apply's own dedup aggregation — the log is scanned once per epoch.
        ``gate`` (quality.QualityGate) guards every epoch commit; a
        mandatory violation stops the replay with the failing epoch
        unfenced (reference: mandatory test failure aborts the DAG run,
        plugins/operators/test.py:45-64). ``lag_slo`` (quality.LagSlo)
        checks each commit's ingest lag against a freshness deadline —
        optional breaches alert and proceed, a mandatory breach alerts and
        stops the replay AFTER the commit (the reference's DeadlineSensor).
        """
        from ..quality import SloViolation

        sink = self.default_alert_sink()
        results: list[ApplyStats] = []
        applied = 0
        for epoch, path in self.list_epochs(change_log_dir):
            if epoch <= self.table.committed_epoch(source):
                continue
            if stop_after is not None and applied >= stop_after:
                break
            changes = self.spark.read.parquet(path)
            stats = apply_batch(
                self.table, changes, epoch, source=source, gate=gate,
                dedup_strategy=self.dedup_strategy, alert_sink=sink,
            )
            self._record(source, stats)
            results.append(stats)
            applied += 1
            if lag_slo is not None:
                try:
                    lag_slo.check(stats, sink=sink, context={"source": source, "epoch": epoch})
                except SloViolation as e:
                    # the breaching epoch IS committed (data durable) — a
                    # mandatory stop must not discard the record of what
                    # was applied; callers (and the CLI) read .results
                    e.results = results
                    raise
        return results

    def _record(self, source: str, stats: ApplyStats) -> None:
        self.lineage.record(
            {
                "source": source,
                "epoch": stats.epoch,
                "snapshot_id": stats.snapshot_id,
                "skipped": stats.skipped,
                "rows_in": stats.rows_in,
                "lsn_min": stats.lsn_min,
                "lsn_max": stats.lsn_max,
                "op_ts_max": stats.op_ts_max,
                "late_rows": stats.late_rows,
                "max_lag_s": stats.max_lag_s,
                "ingest_lag_s": stats.ingest_lag_s,
                "watermark": stats.watermark,
                "winners": stats.winners,
                "dirty_buckets": stats.dirty_buckets,
                "compacted_buckets": stats.compacted_buckets,
                "schema_changes": stats.schema_changes,
                "gate": stats.gate,
                "wall_s": round(stats.wall_s, 3),
                "events_per_s": round(stats.events_per_s, 1),
            }
        )

    # -- structured streaming ---------------------------------------------------

    def stream(
        self,
        change_log_dir: str,
        checkpoint_dir: str,
        source: str = "stream",
        max_files_per_trigger: int | None = 8,
        schema: T.StructType | None = None,
        gate=None,
        wire_format: str = "parquet",
        lag_slo=None,
    ):
        """Tail the change log as a Structured Streaming file source.

        ``wire_format``: ``parquet`` tails pre-typed CHANGE_SCHEMA files;
        ``debezium`` tails newline-delimited JSON envelope files (the
        shape a Kafka-connect binlog relay lands) and parses them
        JVM-side via ``cdc.envelope.parse_debezium`` before the same
        apply path — corrupt envelopes are dropped after parse (route
        them through a gate by passing ``keep_corrupt`` upstream if they
        must block).

        The file source lists new files under the root (epoch dirs included
        via recursive lookup); ``foreachBatch`` applies each micro-batch
        through the same exactly-once MERGE path, with Spark's checkpoint
        providing the monotonic batch id used as the fencing epoch.

        Batch ids are only monotone WITHIN one checkpoint lineage, so the
        fencing source is namespaced by a marker id stored in the
        checkpoint dir: a fresh/deleted checkpoint restarts batch ids at 0
        — under the old source those batches would be fenced as replays
        and silently dropped; under a fresh namespace they reprocess, and
        the LWW fold makes the reprocessing idempotent at the data level.
        Call ``.processAllAvailable()`` / ``awaitTermination`` on the result.
        """
        source = fencing_namespace(checkpoint_dir, source)
        sink = self.default_alert_sink()

        if wire_format == "debezium":
            from .envelope import parse_debezium

            reader = (
                self.spark.readStream.schema(T.StructType(
                    [T.StructField("value", T.StringType())]
                ))
                .option("recursiveFileLookup", "true")
            )
            if max_files_per_trigger:
                reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
            payload = schema or TRANSCRIPT_SCHEMA
            stream_df = parse_debezium(reader.text(change_log_dir), payload)
        else:
            reader = (
                self.spark.readStream.schema(schema or CHANGE_SCHEMA)
                .option("recursiveFileLookup", "true")
            )
            if max_files_per_trigger:
                reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
            stream_df = reader.parquet(change_log_dir)

        def _apply(batch_df, batch_id: int):
            stats = apply_batch(
                self.table, batch_df, int(batch_id), source=source, gate=gate,
                dedup_strategy=self.dedup_strategy, alert_sink=sink,
            )
            self._record(source, stats)
            if lag_slo is not None:
                lag_slo.check(
                    stats, sink=sink, context={"source": source, "epoch": int(batch_id)}
                )

        return (
            stream_df.writeStream.foreachBatch(_apply)
            .option("checkpointLocation", checkpoint_dir)
            .start()
        )
