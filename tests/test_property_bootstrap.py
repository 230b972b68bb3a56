"""Property-based (hypothesis) check of the snapshot-bootstrap handoff.

``bootstrap_snapshot`` promises a seam-free cold start (sources.py): a
table bootstrapped from a consistent snapshot at binlog position P and
then fed the change stream from any resume point covering every event
after P must converge to the SAME state as a replay from empty — no
duplicates from the overlap, no gaps, no regressions.

The fuzz models a real binlog: ``(op_ts, lsn)`` are JOINTLY monotone at
the source (commit time never decreases with position — the contract
that makes a consistent snapshot meaningful), while DELIVERY is late —
events are assigned to epochs with a bounded random delay, so replayed
epochs interleave positions out of order. The snapshot is computed by an
independent pure-Python fold over positions <= P; P and the resume epoch
are drawn per example (resume always covers every event with lsn > P,
the operator contract, and may overlap arbitrarily far back)."""

from __future__ import annotations

import datetime as dt

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, example, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from pyspark.sql import types as T  # noqa: E402

from etl_spark.cdc.apply import apply_batch  # noqa: E402
from etl_spark.cdc.engine import CHANGE_SCHEMA, CdcEngine  # noqa: E402
from etl_spark.sources import bootstrap_snapshot  # noqa: E402

_KEYS = [("a", 0), ("a", 1), ("b", 0), ("c", 3)]
_TEXTS = [None, "", "abc", "τ😀"]
_BASE = dt.datetime(2025, 1, 1)
_FIXED_TS = dt.datetime(2025, 1, 1)
_N_EPOCHS = 3

# per event: (op, key idx, text idx, delivery delay in epochs)
_event = st.tuples(
    st.sampled_from(["I", "U", "D"]),
    st.integers(min_value=0, max_value=len(_KEYS) - 1),
    st.integers(min_value=0, max_value=len(_TEXTS) - 1),
    st.integers(min_value=0, max_value=2),
)

_scenario = st.tuples(
    st.lists(_event, min_size=2, max_size=10),
    st.integers(min_value=0, max_value=9),   # snapshot position index (mod n)
    st.integers(min_value=0, max_value=2),   # extra overlap: resume earlier
)

_SNAP_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("tool", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), True),
])


def _materialize(events):
    """events -> list of rows with jointly-monotone (op_ts, lsn) and a
    delivery epoch; returns (rows, epochs) where rows[i] =
    (op, conv, turn, role, text, tool, ts, op_ts, lsn, epoch)."""
    out = []
    for idx, (op, ki, xi, delay) in enumerate(events):
        conv, turn = _KEYS[ki]
        # op_ts ties across adjacent positions exercise the lsn tiebreak
        op_ts = _BASE + dt.timedelta(seconds=idx // 2)
        lsn = idx + 1
        src_epoch = min(idx * _N_EPOCHS // max(1, len(events)), _N_EPOCHS - 1)
        epoch = min(src_epoch + delay, _N_EPOCHS - 1)
        text = None if op == "D" else _TEXTS[xi]
        role = None if op == "D" else "user"
        out.append((op, conv, turn, role, text, None, _FIXED_TS, op_ts, lsn,
                    epoch))
    return out


def _fold(rows, max_lsn=None):
    winners = {}
    for op, conv, turn, role, text, tool, ts, op_ts, lsn, _ep in rows:
        if max_lsn is not None and lsn > max_lsn:
            continue
        key = (conv, turn)
        cur = winners.get(key)
        if cur is None or (op_ts, lsn) > (cur[0], cur[1]):
            winners[key] = (op_ts, lsn, op, role, text, tool, ts)
    return winners


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
# overlap replays the pre-snapshot delete of a key absent from the
# snapshot: must stay a delete-of-absent no-op, not a resurrection
@example(([("I", 0, 2, 0), ("D", 0, 0, 0), ("I", 1, 3, 2)], 1, 2))
# snapshot position ties the next event's op_ts (lsn breaks the tie)
@example(([("I", 2, 2, 0), ("U", 2, 3, 1)], 0, 0))
@given(_scenario)
def test_bootstrap_overlap_equals_replay_from_empty(
    spark, tmp_path_factory, scenario
):
    events, p_raw, extra_overlap = scenario
    rows = _materialize(events)
    P = (p_raw % len(rows)) + 1          # snapshot covers lsn <= P
    snap_op_ts = next(r[7] for r in rows if r[8] == P)

    # resume epoch: must cover every event with lsn > P; overlap further
    # back by extra_overlap epochs (the seam the LWW fold must absorb)
    later = [r[9] for r in rows if r[8] > P]
    j = min(later) if later else _N_EPOCHS
    j = max(0, j - extra_overlap)

    work = tmp_path_factory.mktemp("prop_boot")
    snap_rows = [
        (k[0], k[1], w[3], w[4], w[5], w[6])
        for k, w in _fold(rows, max_lsn=P).items() if w[2] != "D"
    ]
    boot = CdcEngine(spark, str(work / "boot"), num_buckets=4).table
    bootstrap_snapshot(
        boot, spark.createDataFrame(snap_rows, schema=_SNAP_SCHEMA),
        snapshot_lsn=P, snapshot_op_ts=str(snap_op_ts),
    )
    full = CdcEngine(spark, str(work / "full"), num_buckets=4).table
    for ep in range(_N_EPOCHS):
        batch = [r[:9] for r in rows if r[9] == ep]
        bdf = spark.createDataFrame(batch, schema=CHANGE_SCHEMA) if batch \
            else spark.createDataFrame([], schema=CHANGE_SCHEMA)
        apply_batch(full, bdf, epoch=ep)
        if ep >= j:
            apply_batch(boot, bdf, epoch=ep)  # stream source, own fence

    got = {
        (r.conv_id, r.turn_idx): (r.role, r.text, r.tool, r.ts)
        for r in boot.snapshot_df().collect()
    }
    want = {
        (r.conv_id, r.turn_idx): (r.role, r.text, r.tool, r.ts)
        for r in full.snapshot_df().collect()
    }
    assert got == want, f"bootstrapped {got} != from-empty {want}"
