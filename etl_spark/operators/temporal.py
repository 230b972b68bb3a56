"""Temporal joins Spark lacks as built-ins: AS-OF (point-in-time) join.

``asof_join`` matches every probe row to the LATEST build row with
``build_ts <= probe_ts`` for the same key — the canonical enrichment for
event streams against slowly-changing state (price as of trade time,
currency rate as of purchase, user segment as of event). The reference's
analogue is its "latest file per day" / last-known-rate reads
(DAG_external_source.py's D-2..D re-statements pick the latest report at
or before each day); the engine generalizes it to row-level time.

Spark has no ASOF JOIN operator, and the naive formulations both melt at
scale: an inequality join degenerates to a per-key nested loop, and a
"max(build_ts) <= probe_ts then re-join" pass shuffles everything twice.
This implementation is the UNION-WINDOW form: tag build and probe rows,
union them, and run ONE ordered window per key where every probe row
reads ``last(build_col, ignorenulls=True)`` over the frame up to itself.

  * one shuffle (the window's key partition) over build ∪ probe;
  * no join node at all — the sort within each key partition is the
    entire matching logic;
  * equal timestamps: build sorts BEFORE probe (tag ordering), so a
    build row AT the probe's timestamp is visible to it ("at or
    before"), and the build side must be pre-deduplicated to one row
    per (key, ts) by the caller for determinism (enforced here with an
    LWW-style argmax when ``dedup_order`` is given);
  * unmatched probes (no build row yet) keep NULL build columns — the
    LEFT ASOF semantics.

Skew: a hot key serializes its window partition — same exposure as any
per-key ordered operator; salt upstream if one key dominates (see
cdc/dedup.lww_dedup_window for the two-phase salted pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    key: list[str],
    probe_ts: str,
    build_ts: str,
    dedup_order: list[str] | None = None,
) -> DataFrame:
    """LEFT AS-OF join: probe columns + the latest build row at or before
    the probe's timestamp (NULLs when none exists yet).

    ``dedup_order``: optional build-side tie-break columns — when given,
    the build side is first collapsed to one row per (key, build_ts) by
    max(dedup_order) so equal-timestamp build rows resolve
    deterministically (both here and in any SQL oracle).
    """
    bcols = [c for c in build.columns if c not in key and c != build_ts]
    pcols = [c for c in probe.columns if c not in key and c != probe_ts]
    if not bcols:
        raise ValueError("build side needs at least one payload column")
    # three collision surfaces: build payload vs probe payload, the build
    # ts name landing among probe payloads, and a build payload named
    # like the probe ts (the output emits probe_ts AND every bcol)
    overlap = (
        set(bcols) & set(pcols)
        | {build_ts} & set(pcols)
        | {probe_ts} & set(bcols)
    )
    if overlap:
        raise ValueError(f"ambiguous output columns: {sorted(overlap)}")

    if dedup_order:
        w = F.max(
            F.struct(*[F.col(c) for c in dedup_order], *[F.col(c) for c in bcols if c not in dedup_order])
        ).alias("_w")
        build = build.groupBy(*key, build_ts).agg(w).select(
            *key, build_ts,
            *[F.col(f"_w.{c}").alias(c) for c in dedup_order],
            *[F.col(f"_w.{c}").alias(c) for c in bcols if c not in dedup_order],
        )

    # the WHOLE build row rides one struct: last(ignorenulls) over a
    # struct picks one build ROW atomically — per-column fills would mix
    # values from different build rows whenever a build column is NULL
    b = build.select(
        *key,
        F.col(build_ts).cast("timestamp").alias("_ts"),
        F.lit(0).alias("_tag"),
        F.struct(*[F.col(c) for c in bcols]).alias("_b"),
        *[F.lit(None).cast(probe.schema[c].dataType).alias(c) for c in pcols],
    )
    p = probe.select(
        *key,
        F.col(probe_ts).cast("timestamp").alias("_ts"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(
            "struct<" + ",".join(
                f"{c}:{build.schema[c].dataType.simpleString()}" for c in bcols
            ) + ">"
        ).alias("_b"),
        *[F.col(c) for c in pcols],
    )
    u = b.unionByName(p)
    # build rows sort before probe rows at equal _ts → "at or before"
    w = (
        Window.partitionBy(*key)
        .orderBy("_ts", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *key, "_ts", "_tag", *pcols,
        F.last("_b", ignorenulls=True).over(w).alias("_m"),
    )
    return filled.where(F.col("_tag") == 1).select(
        *key,
        F.col("_ts").alias(probe_ts),
        *pcols,
        *[F.col(f"_m.{c}").alias(c) for c in bcols],
    )
