"""Partial-update (patch-style) CDC: NULL payload column = "unchanged".

Real binlogs routinely ship partial row images — Debezium marks
unchanged TOAST/oversized columns rather than re-sending them, and many
app-level CDC feeds only carry the columns that changed. The engine's
merge-on-read format stores self-contained full rows (the LWW fold picks
ONE winner per key), so patch events must be materialized into full
images before the normal apply. ``materialize_partial`` does that as a
composable pre-step: its output is ordinary CHANGE_SCHEMA rows, and
everything downstream (exactly-once fencing, delta write, compaction,
change feed) is untouched.

Semantics (documented, row-LWW compatible):
  * within the batch, each key folds COLUMN-WISE: for every payload
    column, the latest non-NULL value among non-delete events — two
    patches touching different columns in one batch both land;
  * a delete inside the batch resets the fold: only patches NEWER than
    the key's last delete contribute (no resurrecting pre-delete bytes);
  * the folded patch then fills its remaining NULLs from the CURRENT
    committed row (tombstones excluded — a deleted key starts fresh);
  * the materialized row carries the key's newest ``(op_ts, lsn)``, so a
    LATE patch batch (older than the committed row) materializes against
    the newer row but loses the read-time LWW fold — committed state is
    unchanged, exactly as a late full image would behave;
  * limitation: NULL means "unchanged", so explicitly setting a column
    to NULL is not expressible in patch form (standard for this wire
    style — send a full image for that).

Scale shape: one hash aggregation over the batch (same skew-safe
max-struct shape as ``lww_dedup``) plus one bucket-pruned read of the
CURRENT state of only the touched buckets joined on the key — the same
read amplification a MERGE-based engine pays per batch, here opt-in and
paid only by partial-image sources.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..lake.table import LakeTable


def fold_partial_batch(
    changes: DataFrame, key: list[str], payload_cols: list[str]
) -> DataFrame:
    """Column-wise within-batch fold: one row per key holding, per
    payload column, the latest non-NULL value newer than the key's last
    delete; plus the key's overall newest (op, op_ts, lsn)."""
    ord_ = F.struct(F.col("op_ts"), F.col("lsn"))
    is_d = F.col("op") == "D"
    aggs = [
        F.max(F.struct(F.col("op_ts"), F.col("lsn"), F.col("op"))).alias("_top"),
        F.max(F.when(is_d, ord_)).alias("_last_d"),
    ]
    for c in payload_cols:
        aggs.append(
            F.max(
                F.when(
                    ~is_d & F.col(c).isNotNull(),
                    F.struct(ord_.alias("o"), F.col(c).alias("v")),
                )
            ).alias(f"_c_{c}")
        )
    g = changes.groupBy(*key).agg(*aggs)

    cols = [*key]
    for c in payload_cols:
        cell = F.col(f"_c_{c}")
        alive = cell.isNotNull() & (
            F.col("_last_d").isNull() | (cell["o"] > F.col("_last_d"))
        )
        cols.append(F.when(alive, cell["v"]).alias(c))
    cols += [
        F.col("_top")["op"].alias("op"),
        F.col("_top")["op_ts"].alias("op_ts"),
        F.col("_top")["lsn"].alias("lsn"),
        F.col("_last_d"),  # internal: gates the fill-from-committed-row
    ]
    return g.select(*cols)


def materialize_partial(table: LakeTable, changes: DataFrame) -> DataFrame:
    """Patch-style changes → full-image CHANGE_SCHEMA rows, ready for the
    standard ``apply_batch``. See module docstring for semantics."""
    key = table.key_cols
    payload_cols = [c for c in table.schema().names() if c not in key]
    folded = fold_partial_batch(changes, key, payload_cols)

    # current state of only the touched buckets (bounded driver collect:
    # at most num_buckets ids). Derived from the RAW batch, not `folded`:
    # the fold's groupBy preserves the key set, and collecting from folded
    # would execute the whole fold aggregation twice (once here, once in
    # the real write job) — this scan is a narrow one-column distinct.
    touched = [
        int(r["b"])
        for r in changes.select(
            table.bucket_expr(F.col(table.bucket_key)).alias("b")
        ).distinct().collect()
    ]
    cur = table.read_buckets(touched, with_internal=True, fold=True)
    cur = cur.where(~F.coalesce(F.col("_tombstone"), F.lit(False))).select(
        *key,
        *[F.col(c).alias(f"_cur_{c}") for c in payload_cols],
        F.struct(
            F.col("_op_ts").alias("op_ts"), F.col("_lsn").alias("lsn")
        ).alias("_cur_ord"),
    )

    out = folded.join(cur, key, "left")
    # a delete inside the batch NEWER than the committed row means the key
    # restarts: its old columns must not leak back through the fill (a
    # committed row newer than the delete is the late-delete case — fill
    # freely, the committed row wins the read fold anyway)
    fill_ok = F.col("_last_d").isNull() | (F.col("_cur_ord") > F.col("_last_d"))
    sel = [
        "op",
        *key,
        *[
            F.when(F.col("op") == "D", F.lit(None).cast(folded.schema[c].dataType))
            .otherwise(
                F.when(fill_ok, F.coalesce(F.col(c), F.col(f"_cur_{c}")))
                .otherwise(F.col(c))
            )
            .alias(c)
            for c in payload_cols
        ],
        "op_ts",
        "lsn",
    ]
    # CHANGE_SCHEMA column order: op, key+payload in table order, op_ts, lsn
    ordered = ["op", *table.schema().names(), "op_ts", "lsn"]
    return out.select(*sel).select(*ordered)
