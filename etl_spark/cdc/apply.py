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

Implementation is a *bucket-wise copy-on-write LWW fold*, not a join tree:
the batch winners and the current rows of the **dirty buckets only** are
unioned and re-reduced by the same max(struct) LWW aggregation — target
rows carry their stored (_op_ts, _lsn), so a late/out-of-order change
(older than what's applied) loses and the table is unchanged: replay in
any epoch order converges to the same state (the oracle's argmax).
Deletes persist as tombstones so a late pre-delete update cannot
resurrect a deleted key; ``snapshot_df`` filters them out.

Scale notes:
  * only dirty buckets are read and rewritten — write amplification is
    bounded by (touched buckets / total buckets) of the table;
  * the LWW fold is a hash agg with map-side partial combine → hot-key
    safe (see ``dedup.lww_dedup``);
  * epoch fencing makes the whole thing idempotent: a replayed epoch is
    skipped before any read.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..lake.schema import align
from ..lake.table import LakeTable
from .dedup import KEY, ORDER, lww_dedup


@dataclass
class ApplyStats:
    epoch: int
    skipped: bool = False
    snapshot_id: int | None = None
    rows_in: int = 0
    winners: int = 0
    dirty_buckets: list[int] = field(default_factory=list)
    schema_changes: list[str] = field(default_factory=list)
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
) -> ApplyStats:
    """Apply one micro-batch of changes. Idempotent per (source, epoch)."""
    t0 = time.time()
    table.refresh()
    if epoch <= table.committed_epoch(source):
        return ApplyStats(epoch=epoch, skipped=True, wall_s=time.time() - t0)

    stats = ApplyStats(epoch=epoch)

    # 1. schema evolution: widen the table so this batch's payload fits
    payload_struct = changes.drop("op", *ORDER).schema
    if evolve:
        stats.schema_changes = table.evolve_schema(payload_struct)
    schema = table.schema()

    # 2. LWW-dedup the batch (hash agg, skew-safe) and bucket the winners
    winners = lww_dedup(changes).withColumn(
        "_bucket", table.bucket_expr(F.col(table.bucket_key))
    )
    winners = winners.persist()
    try:
        counts = winners.groupBy("_bucket").count().collect()  # ≤ num_buckets rows
        stats.winners = sum(r["count"] for r in counts)
        stats.dirty_buckets = sorted(int(r["_bucket"]) for r in counts)
        if not stats.dirty_buckets:
            # nothing to do, but still fence the epoch (exactly-once bookkeeping)
            sid = table.commit(epoch, source, f"data/snap-{table.current_snapshot_id + 1:08d}",
                               [], {"rows": 0})
            stats.snapshot_id = sid
            stats.wall_s = time.time() - t0
            return stats

        as_stored = align(winners, schema, keep_extra=["op", "op_ts", "lsn", "_bucket"]).select(
            *schema.names(),
            F.col("op_ts").alias("_op_ts"),
            F.col("lsn").alias("_lsn"),
            (F.col("op") == "D").alias("_tombstone"),
            F.col("_bucket"),
        )

        # 3. read ONLY dirty buckets of the current snapshot and LWW-fold
        current = table.read_buckets(stats.dirty_buckets, with_internal=True)
        merged = lww_dedup(
            current.unionByName(as_stored),
            key=KEY,
            order=["_op_ts", "_lsn"],
        )

        # 4. write new data for dirty buckets, then atomically commit
        next_sid = table.current_snapshot_id + 1
        rel = table.write_snapshot_data(merged, next_sid)
        stats.snapshot_id = table.commit(
            epoch,
            source,
            rel,
            stats.dirty_buckets,
            stats={"winners": stats.winners, "schema_changes": stats.schema_changes},
        )
    finally:
        winners.unpersist()
    stats.wall_s = time.time() - t0
    return stats
