"""Derivates layer: daily / weekly / monthly rollups over the
transcripts table, incrementally maintained.

Reference analogue: insert_user_history_derivates.sql —
``_user_history_daily`` rebuilt by delete+insert of the run day
(:9-23), weekly/monthly via ``DATE_TRUNC(date_, WEEK(MONDAY)/MONTH)``
(:26-45), plus ``CREATE OR REPLACE VIEW`` publication.

Engine shape, designed for the 100 TB case:
  * The refresh trigger is the partition-close lifecycle
    (cdc/partitions.py): a day is (re)computed only when it is CLOSED
    and its underlying file-leaf set changed since the last refresh —
    restatements re-state exactly the affected days (the reference's
    D-2/D-1/D re-run cascade, DAG_external_source.py:132-224).
  * Each day's recompute reads the source through the time-pruned
    ``snapshot_df(ts_min, ts_max)`` path — O(day), never O(table).
  * The sink is a day-partitioned parquet dataset written with DYNAMIC
    partition overwrite: only the recomputed day directories are
    replaced (delete+insert per partition, S7). A crash mid-refresh
    leaves replaceable partials; the state file is written last, so the
    next run redoes exactly the unfinished days (idempotent).
  * Weekly/monthly grains recompute per affected week/month from the
    source with the same pruned window — COUNT(DISTINCT conv_id) does
    not fold from daily rows, so rolling up the rollup would be wrong.

Event-time stability CONTRACT (what makes pruned day reads exact): a
key's ``stats_col`` must not move across day boundaries once written —
the time-pruned fold only sees the window's day partitions (plus the
always-scanned NULL-day partition), so an update relocating a row's
event time from day X to day Y would leave X's window folding the stale
pre-move image. The engine enforces this on the DML path
(``update_where`` refuses to SET the stats column) and it matches the
domain (a transcript turn's event time is when the turn happened); a
CDC source that genuinely restates event times must delete+re-insert,
which lands leaves in BOTH days and re-derives both. Deletes need no
event time at all: a payload-less (NULL-ts) delete lands in the
NULL-day partition, which every pruned read scans and whose new delta
leaves re-derive every closed day (see refresh_rollups).
"""

from __future__ import annotations

import datetime as dt
import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cdc.partitions import _day_of, closed_partitions
from .lake.table import LakeTable, _atomic_write_text

STATE_FILE = "_rollup_state.json"


def _measures() -> list:
    # every sum coalesces to 0: a window/day whose rows were all deleted
    # is a well-defined "zero activity" period, not a NULL-poisoned one
    return [
        F.count(F.lit(1)).alias("n_turns"),
        F.countDistinct("conv_id").alias("active_convs"),
        F.coalesce(
            F.sum(F.when(F.col("tool").isNotNull(), 1).otherwise(0)), F.lit(0)
        ).alias("tool_calls"),
        F.coalesce(F.sum(F.length("text")), F.lit(0)).alias("total_chars"),
    ]


def _delta_leaves_for_day(table: LakeTable, day: str) -> list[str]:
    """DELTA leaves only — new data arrives exclusively as deltas;
    compaction-rewritten bases are the same rows and must not look like
    change (mirrors cdc.partitions.restatements)."""
    out = []
    for slot in table._meta["files"].values():
        for e in slot["deltas"]:
            if _day_of(e["path"]) == day:
                out.append(e["path"])
    return out


def _null_day_delta_leaves(table: LakeTable) -> list[str]:
    """Delta leaves in the hive default partition — payload-less deletes
    (NULL event time), which can tombstone a row in ANY day.

    Union of LIVE leaves and the table's monotone ``null_day_delta_log``
    (recorded at commit time, lake/table.py): auto-compaction removes
    folded delta leaves from live metadata, so a NULL-day leaf compacted
    between two refresh_rollups runs would otherwise never be seen and
    every affected closed-day rollup would stay stale — the exact
    GDPR-staleness bug the NULL-day branch exists to prevent. The live
    scan stays as a belt-and-braces union for tables whose metadata
    predates the log field."""
    from .cdc.partitions import _is_null_day

    out = set(table._meta.get("null_day_delta_log", []))
    for slot in table._meta["files"].values():
        for e in slot["deltas"]:
            if _is_null_day(e["path"]):
                out.add(e["path"])
    return sorted(out)


def _week_start(day: dt.date) -> dt.date:
    return day - dt.timedelta(days=day.weekday())  # Monday (WEEK(MONDAY))


def _month_start(day: dt.date) -> dt.date:
    return day.replace(day=1)


def _load_state(dst_root: str) -> dict:
    p = os.path.join(dst_root, STATE_FILE)
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        txt = f.read().strip()
    return json.loads(txt) if txt else {}


def _write_grain(
    df: DataFrame, out_dir: str, part_col: str
) -> None:
    """Delete+insert per partition: dynamic overwrite replaces only the
    partitions present in ``df`` (reference derivates :9-23)."""
    (
        df.repartition(F.col(part_col))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(part_col)
        .parquet(out_dir)
    )


def _window_agg(src: LakeTable, lo: dt.date, hi_exclusive: dt.date,
                part_col: str, part_value: str,
                closed_days: set[str]) -> DataFrame:
    """Aggregate one [lo, hi) window of the source via the pruned read,
    restricted to CLOSED days — the module contract. Without the filter
    a week containing a still-open day would publish a value that
    includes half-ingested rows and changes with every refresh; the
    open day's close re-derives the period with its rows included."""
    end = dt.datetime.combine(hi_exclusive, dt.time()) - dt.timedelta(microseconds=1)
    state = src.snapshot_df(ts_min=dt.datetime.combine(lo, dt.time()), ts_max=end)
    in_window = sorted(
        d for d in closed_days
        if lo <= dt.date.fromisoformat(d) < hi_exclusive
    )
    state = state.where(
        F.to_date(F.col(src.stats_col)).cast("string").isin(in_window)
    )
    return state.agg(*_measures()).select(
        F.lit(part_value).alias(part_col), "*"
    )


def refresh_rollups(src: LakeTable, dst_root: str) -> dict:
    """Bring the daily/weekly/monthly rollups up to date with the
    source's closed partitions. Returns {"days": [...], "weeks": [...],
    "months": [...], "restated": [...]} actually recomputed (empty lists
    = nothing to do).

    Restatement wiring (the reference's D-2/D-1/D re-run cascade,
    DAG_external_source.py:132-224): a CLOSED day that later receives
    late data — ``cdc.partitions.restatements()`` detects it from
    metadata alone — shows up here as a changed leaf set vs the rollup
    state file, so exactly that day and its week/month re-derive on the
    next refresh; days whose leaves didn't change are never recomputed.
    ``restated`` lists the re-derived (previously rolled-up) days,
    distinguishing them from first-time closures.
    """
    src.refresh()
    os.makedirs(dst_root, exist_ok=True)
    state = _load_state(dst_root)
    closed = closed_partitions(src)

    # Change detection over DELTA leaves only, accumulated monotonically:
    # new data arrives exclusively as delta files, so a day re-derives
    # iff it carries a delta leaf never seen before. Base leaves are
    # excluded (cdc.partitions.restatements does the same): compaction
    # rewrites bases without changing logical state and must not force an
    # O(all-history) re-aggregation; it also REMOVES folded delta leaves
    # from live metadata, which is why the state keeps the union of every
    # leaf ever seen instead of comparing live sets.
    # Payload-less deletes (NULL event time) land in the hive default
    # partition — their tombstones can kill a row in ANY day, so a new
    # NULL-day delta leaf re-derives EVERY closed day (found by the
    # rollup property soak: a NULL-ts delete otherwise left the victim
    # day's published rollup stale forever — GDPR-hostile). The cost is
    # O(closed days) once per new NULL-day leaf set; deletes that carry
    # the victim's image (and ts) keep restating only their own day.
    _NULL_KEY = "__no_day__"
    null_now = sorted(_null_day_delta_leaves(src))
    null_seen = set(state.get(_NULL_KEY, []))
    null_new = any(l not in null_seen for l in null_now)

    need: list[str] = []
    leaves_now: dict[str, list[str]] = {}
    for day in sorted(closed):
        deltas = sorted(_delta_leaves_for_day(src, day))
        seen = set(state.get(day, []))
        leaves_now[day] = sorted(seen | set(deltas))
        if day not in state or any(l not in seen for l in deltas) or null_new:
            need.append(day)
    restated = [d for d in need if d in state]
    if not need:
        return {"days": [], "weeks": [], "months": [], "restated": []}

    spark = src.spark

    # -- daily: one pruned scan covering the needed span, exact day filter
    days_d = [dt.date.fromisoformat(d) for d in need]
    lo = dt.datetime.combine(min(days_d), dt.time())
    hi = dt.datetime.combine(max(days_d) + dt.timedelta(days=1), dt.time())
    hi -= dt.timedelta(microseconds=1)
    span = src.snapshot_df(ts_min=lo, ts_max=hi)
    daily = (
        span.withColumn("day_", F.to_date(F.col(src.stats_col)).cast("string"))
        .where(F.col("day_").isin(need))
        .groupBy("day_")
        .agg(*_measures())
    )
    # every needed day MUST emit a row: dynamic partition overwrite only
    # replaces partitions present in the output, so a recomputed day whose
    # snapshot went to zero rows (e.g. a GDPR erasure tombstoned all of
    # it) would otherwise keep publishing its stale pre-erasure rollup
    day_spine = spark.createDataFrame([(d,) for d in need], ["day_"])
    daily = day_spine.join(daily, "day_", "left").select(
        "day_",
        F.coalesce("n_turns", F.lit(0)).alias("n_turns"),
        F.coalesce("active_convs", F.lit(0)).alias("active_convs"),
        F.coalesce("tool_calls", F.lit(0)).alias("tool_calls"),
        F.coalesce("total_chars", F.lit(0)).alias("total_chars"),
    )
    _write_grain(daily, os.path.join(dst_root, "daily"), "day_")

    # -- weekly / monthly: recompute each affected period from source
    closed_set = set(closed)
    weeks = sorted({_week_start(d) for d in days_d})
    for w in weeks:
        wdf = _window_agg(src, w, w + dt.timedelta(days=7), "week_start",
                          str(w), closed_set)
        _write_grain(wdf, os.path.join(dst_root, "weekly"), "week_start")
    months = sorted({_month_start(d) for d in days_d})
    for m in months:
        nxt = (m.replace(day=28) + dt.timedelta(days=4)).replace(day=1)
        mdf = _window_agg(src, m, nxt, "month_", str(m)[:7], closed_set)
        _write_grain(mdf, os.path.join(dst_root, "monthly"), "month_")

    # state last: a crash above simply redoes these days next run
    state.update({d: leaves_now[d] for d in need})
    state[_NULL_KEY] = sorted(null_seen | set(null_now))
    _atomic_write_text(os.path.join(dst_root, STATE_FILE), json.dumps(state, indent=1))
    return {
        "days": need,
        "weeks": [str(w) for w in weeks],
        "months": [str(m)[:7] for m in months],
        "restated": restated,
    }


def create_rollup_views(spark, dst_root: str) -> list[str]:
    """Publish the rollup datasets as SQL views (reference
    insert_user_history_derivates.sql:26-45 CREATE OR REPLACE VIEW)."""
    out = []
    for grain in ("daily", "weekly", "monthly"):
        p = os.path.join(dst_root, grain)
        if os.path.isdir(p):
            name = f"rollup_{grain}"
            spark.read.parquet(p).createOrReplaceTempView(name)
            out.append(name)
    return out
