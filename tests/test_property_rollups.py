"""Property-based (hypothesis) soak of the incremental rollup pipeline.

The directed tests in test_rollups pin one mechanism per test (initial
refresh, restatement, erasure-to-zero, compaction silence); here
hypothesis drives random INTERLEAVINGS of the whole lifecycle — apply
epochs with late cross-day arrivals, partial partition closes at random
cutoffs, refreshes at arbitrary points (including before anything is
closed), compactions between any two steps — and after a final
close-everything + refresh, all three published grains must equal a
DuckDB full recompute over the table's final snapshot restricted to
closed days:

  * daily: one row per CLOSED day — including explicit zero rows for
    closed days whose rows vanished (or never existed);
  * weekly/monthly: one row per period containing a closed day, the
    aggregate over the period's closed days (COUNT DISTINCT recomputed
    from source, never folded from daily rows).

The oracle recomputes from scratch, so agreement proves the INCREMENTAL
path — state-file change detection, restatement re-derives, dynamic
partition overwrite — composes to the same answer under any
interleaving. The day pool crosses a week AND a month boundary so the
period re-derives straddle both."""

from __future__ import annotations

import datetime as dt
import os

import duckdb
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, example, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from etl_spark.cdc.apply import apply_batch  # noqa: E402
from etl_spark.cdc.engine import CHANGE_SCHEMA, CdcEngine  # noqa: E402
from etl_spark.cdc.partitions import close_due_partitions, closed_partitions  # noqa: E402
from etl_spark.rollups import refresh_rollups  # noqa: E402

# crosses the 2025-02 month boundary AND two ISO week boundaries
_DAYS = [dt.date(2025, 1, 28) + dt.timedelta(days=i) for i in range(7)]
_KEYS = [("a", 0), ("a", 1), ("b", 0), ("c", 3)]
# Event-time STABILITY contract (rollups.py module doc): a key's ts never
# moves across days once written — pruned day reads fold only their own
# partitions. Day is therefore a FUNCTION OF THE KEY here (spread over
# both week and month boundaries); what the fuzz varies is the delete's
# ts: payload-less (NULL, → hive default partition, must re-derive every
# closed day) vs image-carrying (the key's own day).
_KEY_DAY = [0, 4, 2, 6]  # key idx -> day idx: Jan 28, Feb 1, Jan 30, Feb 3
_TEXTS = [None, "", "xy", "longer text payload"]
_TOOLS = [None, "tool_01"]
_FAR = dt.datetime(2026, 1, 1)

# (op, key idx, delete-carries-ts, text idx, tool idx)
_row = st.tuples(
    st.sampled_from(["I", "U", "D"]),
    st.integers(min_value=0, max_value=len(_KEYS) - 1),
    st.booleans(),
    st.integers(min_value=0, max_value=len(_TEXTS) - 1),
    st.integers(min_value=0, max_value=len(_TOOLS) - 1),
)

# epoch = (rows, close_cutoff_day_idx | None, refresh_after, compact_after)
_epoch = st.tuples(
    st.lists(_row, min_size=1, max_size=6),
    st.one_of(st.none(), st.integers(min_value=0, max_value=len(_DAYS) - 1)),
    st.booleans(),
    st.booleans(),
)

_scenario = st.lists(_epoch, min_size=1, max_size=3)

_MEASURES_SQL = """
  SELECT {part} AS {col},
         count(*) AS n_turns,
         count(DISTINCT conv_id) AS active_convs,
         CAST(coalesce(sum(CASE WHEN tool IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS tool_calls,
         CAST(coalesce(sum(length(text)), 0) AS BIGINT) AS total_chars
  FROM t WHERE CAST(CAST(ts AS DATE) AS VARCHAR) IN ({days})
  GROUP BY 1
"""


def _oracle(pdf, closed_days, part_expr, col):
    con = duckdb.connect()
    con.register("t", pdf)
    if not closed_days:
        return {}
    q = _MEASURES_SQL.format(
        part=part_expr, col=col,
        days=",".join(f"'{d}'" for d in sorted(closed_days)),
    )
    return {
        str(r[0]): tuple(int(x) for x in r[1:])
        for r in con.execute(q).fetchall()
    }


def _published(spark, dst, grain, col):
    p = os.path.join(dst, grain)
    if not os.path.isdir(p):
        return {}
    return {
        str(getattr(r, col)): (r.n_turns, r.active_convs, r.tool_calls,
                               r.total_chars)
        for r in spark.read.parquet(p).collect()
    }


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
# refresh before anything closes, then close+refresh — state must start
# empty and the late first publication must still be complete
@example([([("I", 0, True, 2, 1)], None, True, False),
          ([("U", 1, True, 3, 0)], 6, True, False)])
# restatement: close+refresh day 0, then late data into day 0 with a
# compaction straddling the re-derive
@example([([("I", 0, True, 2, 0)], 0, True, False),
          ([("U", 0, True, 3, 1)], None, True, True)])
# PAYLOAD-LESS delete (NULL ts → hive default partition) erases a
# published day back to zero — the stale-forever bug this soak found
@example([([("I", 2, True, 2, 0)], 2, True, False),
          ([("D", 2, False, 0, 0)], None, False, False)])
# image-carrying delete (victim's own ts) across a refresh boundary
@example([([("I", 1, True, 2, 0)], 4, True, False),
          ([("D", 1, True, 0, 0)], None, True, False)])
@given(_scenario)
def test_rollup_interleavings_match_full_recompute(
    spark, tmp_path_factory, scenario
):
    work = tmp_path_factory.mktemp("prop_rollup")
    eng = CdcEngine(spark, str(work / "tbl"), num_buckets=4)
    t = eng.table
    dst = str(work / "rollups")

    lsn = 0
    for epoch_no, (rows, close_idx, refresh_after, compact_after) in enumerate(
        scenario
    ):
        batch = []
        for op, ki, keep_ts, xi, ti in rows:
            lsn += 1
            conv, turn = _KEYS[ki]
            ts = dt.datetime.combine(_DAYS[_KEY_DAY[ki]], dt.time(12, 0, 0))
            if op == "D" and not keep_ts:
                ts = None  # payload-less delete → NULL-day partition
            text = None if op == "D" else _TEXTS[xi]
            tool = None if op == "D" else _TOOLS[ti]
            batch.append(
                (op, conv, turn, "user", text, tool, ts,
                 dt.datetime(2025, 3, 1) + dt.timedelta(seconds=lsn), lsn)
            )
        apply_batch(t, spark.createDataFrame(batch, schema=CHANGE_SCHEMA),
                    epoch=epoch_no)
        if close_idx is not None:
            # force-close every day up to the cutoff (D+1 00:00 + 12 h)
            now = dt.datetime.combine(
                _DAYS[close_idx] + dt.timedelta(days=1), dt.time(13)
            )
            close_due_partitions(t, now=now)
        if refresh_after:
            refresh_rollups(t, dst)
        if compact_after:
            t.compact()

    close_due_partitions(t, now=_FAR)
    refresh_rollups(t, dst)
    t.refresh()

    closed = set(closed_partitions(t))
    pdf = t.snapshot_df().toPandas()

    want_daily = _oracle(pdf, closed, "CAST(CAST(ts AS DATE) AS VARCHAR)", "day_")
    for d in closed:  # closed day with no live rows -> explicit zero row
        want_daily.setdefault(d, (0, 0, 0, 0))
    got_daily = _published(spark, dst, "daily", "day_")
    assert got_daily == want_daily, (got_daily, want_daily)

    closed_dates = {dt.date.fromisoformat(d) for d in closed}
    weeks = {str(d - dt.timedelta(days=d.weekday())) for d in closed_dates}
    want_weekly = _oracle(
        pdf, closed,
        "CAST(CAST(ts AS DATE) - CAST((dayofweek(CAST(ts AS DATE)) + 6) % 7 AS INT) AS VARCHAR)",
        "week_start",
    )
    for w in weeks:
        want_weekly.setdefault(w, (0, 0, 0, 0))
    got_weekly = _published(spark, dst, "weekly", "week_start")
    assert got_weekly == want_weekly, (got_weekly, want_weekly)

    months = {str(d.replace(day=1))[:7] for d in closed_dates}
    want_monthly = _oracle(pdf, closed, "strftime(CAST(ts AS DATE), '%Y-%m')",
                           "month_")
    for m in months:
        want_monthly.setdefault(m, (0, 0, 0, 0))
    got_monthly = _published(spark, dst, "monthly", "month_")
    assert got_monthly == want_monthly, (got_monthly, want_monthly)
