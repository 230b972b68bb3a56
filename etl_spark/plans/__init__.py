"""Config-driven accumulating-snapshot plans — the engine's semantic layer.

Re-expresses the reference's materialized-fields machinery: metric
configs become DataFrame column expressions instead of SQL-string
templates, and the daily user_history advance (new-users branch +
existing-users carry-forward + union) becomes a reusable plan function.

Reference:
  * field config shape — /root/reference/etl/lib/app_config/
    materialized_fields_config.py:22-34 (``MaterializedField{metric_name,
    select_expression, data_type, totals, user_history_formula}``)
  * SQL codegen it replaces — /root/reference/etl/dags/user_history/
    user_history/user_history_parser.py:18-55 (templates with
    ``{prev_value}/{new_value}`` slots), :118-191 (assembly)
  * the daily advance — /root/reference/etl/dags/user_history/include/
    user_history/insert_user_history.sql:151-221 (new users), :227-299
    (existing carry-forward), :301-311 (delete+insert day)

Scale shape: one hash aggregation of the day's events per key, one
full-outer join against yesterday's snapshot (both sides pre-aggregated
— the reference's manual agg-below-join, SURVEY §4), no windows, no
history rescans. State IS the snapshot table: batch N reads only batch
N-1's output, the pattern that keeps 10^10-event histories out of any
single job.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class MaterializedField:
    """One semantic-layer metric.

    ``select_expression`` — SQL aggregate over the day's events (runs in
    a per-user groupBy), e.g. ``sum(CASE WHEN event_name = 'purchase'
    THEN paid_usd ELSE 0 END)``.
    ``totals`` — also maintain ``<name>_total`` carried across days.
    ``formula`` — carry expression with ``{prev}``/``{new}`` slots
    (default running sum, like the reference's default template).
    """

    name: str
    select_expression: str
    data_type: str = "double"
    totals: bool = False
    formula: str = "{prev} + {new}"


def daily_user_metrics(
    events: DataFrame, fields: list[MaterializedField], user_col: str = "unique_id"
) -> DataFrame:
    """The day's per-user metric values: one hash agg, one row per user."""
    aggs = [
        F.expr(f.select_expression).cast(f.data_type).alias(f.name) for f in fields
    ]
    return events.groupBy(F.col(user_col).alias(user_col)).agg(*aggs)


def _zero(f: MaterializedField):
    return F.lit(0).cast(f.data_type)


def advance_snapshot(
    prev: DataFrame | None,
    day_events: DataFrame,
    fields: list[MaterializedField],
    day: str,
    user_col: str = "unique_id",
) -> DataFrame:
    """One day's snapshot advance: prev snapshot ⟗ today's metrics.

    Semantics (reference insert_user_history.sql):
      * users seen today for the first time enter with
        ``registration_date = day`` (new-users branch :151-221);
      * existing users are carried forward even when inactive today —
        **no user ever disappears** (:227-299; tests/user_history/
        count.yaml:1-8);
      * daily columns reset to today's value (0 when inactive); ``_total``
        columns fold via the field's formula (:267-287).
    """
    daily = daily_user_metrics(day_events, fields, user_col)

    if prev is None:
        out = daily.select(
            user_col,
            F.lit(day).cast("date").alias("registration_date"),
            F.lit(day).cast("date").alias("date_"),
            *[F.coalesce(F.col(f.name), _zero(f)).alias(f.name) for f in fields],
            # totals start as the raw first-day value (possibly NULL) — a
            # coalesce-to-0 here would floor non-additive folds like
            # greatest() at 0 and turn all-NULL metrics into 0
            *[F.col(f.name).alias(f"{f.name}_total") for f in fields if f.totals],
        )
        return out

    p = prev.alias("p")
    d = daily.alias("d")
    joined = p.join(d, F.col(f"p.{user_col}") == F.col(f"d.{user_col}"), "full_outer")

    cols = [
        F.coalesce(F.col(f"p.{user_col}"), F.col(f"d.{user_col}")).alias(user_col),
        F.coalesce(F.col("p.registration_date"), F.lit(day).cast("date")).alias(
            "registration_date"
        ),
        F.lit(day).cast("date").alias("date_"),
    ]
    for f in fields:
        new_val = F.coalesce(F.col(f"d.{f.name}"), _zero(f))
        cols.append(new_val.alias(f.name))
        if f.totals:
            # NULL-aware fold: first value seeds the total, inactive days
            # carry it unchanged, and only genuine (prev, new) pairs run
            # the formula — coalescing either side to 0 would floor
            # non-additive folds (greatest) and fabricate 0 from NULLs,
            # diverging from an active-days-only SQL aggregate
            formula = F.expr(
                f.formula.format(prev=f"p.{f.name}_total", new=f"d.{f.name}")
            )
            folded = (
                F.when(F.col(f"p.{f.name}_total").isNull(), F.col(f"d.{f.name}"))
                .when(F.col(f"d.{f.name}").isNull(), F.col(f"p.{f.name}_total"))
                .otherwise(formula)
            )
            cols.append(folded.cast(f.data_type).alias(f"{f.name}_total"))
    return joined.select(*cols)


# Totals formulas the backfill optimizer recognizes as associative +
# commutative + NULL-transparent: folding them day-by-day equals one
# aggregate over all active days (both skip NULL operands — the day loop
# via its seeding whens, SQL aggregates by definition).
_ASSOCIATIVE_FOLDS = {
    "{prev} + {new}": F.sum,
    "greatest({prev}, {new})": F.max,
    "least({prev}, {new})": F.min,
}


def _algebraic_snapshot(
    events: DataFrame,
    fields: list[MaterializedField],
    date_col: str,
    user_col: str,
) -> DataFrame:
    """Whole-history backfill as ONE two-level aggregation (no day loop).

    Equivalent to folding ``advance_snapshot`` over every day when all
    totals formulas are associative: daily per-(user, day) metrics, then
    a per-user fold where daily columns take the GLOBAL last day's value
    (0 when inactive that day) and totals aggregate across active days.
    Scale shape: two hash aggs + one broadcast of a single-row max-day —
    at 10^10 events this is 2 shuffles, vs O(days) joins for the loop.
    """
    daily = daily_user_metrics_by_day(events, fields, date_col, user_col)
    last = daily.agg(F.max(date_col).alias("_last_day"))
    aggs = [
        F.min(date_col).alias("registration_date"),
        F.max("_last_day").alias("date_"),
    ]
    for f in fields:
        on_last = F.when(F.col(date_col) == F.col("_last_day"), F.col(f.name))
        aggs.append(F.coalesce(F.max(on_last), _zero(f)).alias(f.name))
    for f in fields:
        if f.totals:
            fold = _ASSOCIATIVE_FOLDS[f.formula]
            aggs.append(fold(F.col(f.name)).cast(f.data_type).alias(f"{f.name}_total"))
    out = daily.crossJoin(F.broadcast(last)).groupBy(user_col).agg(*aggs)
    names = [user_col, "registration_date", "date_"]
    names += [f.name for f in fields] + [f"{f.name}_total" for f in fields if f.totals]
    return out.select(*names)


def daily_user_metrics_by_day(
    events: DataFrame, fields: list[MaterializedField], date_col: str, user_col: str
) -> DataFrame:
    """Per-(user, day) metric values — the map side of the backfill."""
    aggs = [
        F.expr(f.select_expression).cast(f.data_type).alias(f.name) for f in fields
    ]
    return events.groupBy(user_col, date_col).agg(*aggs)


def run_snapshot_pipeline(
    events: DataFrame,
    fields: list[MaterializedField],
    date_col: str = "date_",
    user_col: str = "unique_id",
    algebraic: bool | None = None,
) -> DataFrame:
    """Batch helper: fold every day of ``events`` in order through
    ``advance_snapshot`` (the Airflow ``@daily catchup`` loop,
    /root/reference/etl/dags/user_history/DAG_user_history.py:47-51,
    collapsed into one call for tests/backfills). Returns the final-day
    snapshot. In production each day's output would be MERGE-committed
    to a LakeTable and the loop driven by the scheduler.

    ``algebraic`` (default auto): when every totals formula is a
    recognized associative fold (running sum / greatest / least), the
    day loop is replaced by ``_algebraic_snapshot`` — identical result,
    two shuffles instead of O(days) joins. Pass ``False`` to force the
    iterative plan (the true daily-incremental path), ``True`` to demand
    the fast path (raises if a formula isn't associative). Non-reorderable
    formulas (e.g. ``{prev} * decay + {new}``) always take the loop."""
    foldable = all(f.formula in _ASSOCIATIVE_FOLDS for f in fields if f.totals)
    if algebraic is True and not foldable:
        raise ValueError("non-associative totals formula — algebraic path invalid")
    if foldable and algebraic is not False:
        return _algebraic_snapshot(events, fields, date_col, user_col)
    # NOTE(perf, measured): pre-partitioning events by user to elide the
    # per-day agg/join exchanges was tried and is ~20% SLOWER here — the
    # periodic localCheckpoint discards partitioning metadata, so the
    # joins reshuffle regardless and the upfront repartition is pure
    # cost. The per-day shuffles are small (post-agg, one row per active
    # user); plan-depth bounding wins over shuffle elision.
    events = events.persist()  # one scan feeds every day's filter
    try:
        days = [
            str(r[0])
            for r in events.select(date_col).distinct().orderBy(date_col).collect()
        ]
        snap: DataFrame | None = None
        for i, day in enumerate(days):
            snap = advance_snapshot(
                snap, events.where(F.col(date_col) == day), fields, day, user_col
            )
            # periodic materialization (reference temp tables / day commit):
            # bounds plan depth without holding a checkpoint per day —
            # per-day checkpoints would pin O(days) snapshot copies in
            # executor storage for the pipeline's lifetime
            if (i + 1) % 7 == 0 or i == len(days) - 1:
                snap = snap.localCheckpoint(eager=True)
        return snap
    finally:
        events.unpersist()
