"""Property-based (hypothesis) model check of the change data feed.

The directed tests in test_change_feed pin each classification rule one
at a time; here hypothesis drives random HISTORIES — multi-epoch streams
with late arrivals (op_ts out of arrival order), same-timestamp ties
broken by lsn, deletes, re-inserts after tombstones, interleaved
compaction — and ``changes_between`` is checked for EVERY committed
version pair (vi, vj) against an independent pure-Python model of the
contract (lake/table.py:611):

  * insert — key not live at vi, live at vj (covers re-insert after a
    tombstone), payload = vj's winner;
  * delete — live at vi, not live at vj, payload = the PRE-image (vi's
    winner);
  * update_postimage — live at both with a different LWW winner order
    ``(op_ts, lsn)``, payload = vj's winner. A late event that LOSES the
    LWW fold changes nothing and must emit nothing;
  * untouched keys are absent; compaction commits in the window are
    silent (physical rewrite, no logical change).

The model folds the raw event list with max-by-(op_ts, lsn) and never
touches Spark or the table format, so agreement is evidence, not
tautology. Checking all version PAIRS (not just adjacent ones) pins the
composition property a feed consumer relies on: replaying feed(vi→vj)
onto state(vi) yields state(vj) for any i < j.
"""

from __future__ import annotations

import datetime as dt

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, example, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from etl_spark.cdc.apply import apply_batch  # noqa: E402
from etl_spark.cdc.engine import CHANGE_SCHEMA, CdcEngine  # noqa: E402

_KEYS = [("a", 0), ("a", 1), ("b", 0), ("hot", 7)]
_TS = [dt.datetime(2025, 1, 1, 0, 0, s) for s in range(3)]
_TEXTS = [None, "", "x", "τ😀", "longer text payload"]
_FIXED_TS = dt.datetime(2025, 1, 1)

# (op, key index, op_ts index, text index)
_row = st.tuples(
    st.sampled_from(["I", "U", "D"]),
    st.integers(min_value=0, max_value=len(_KEYS) - 1),
    st.integers(min_value=0, max_value=len(_TS) - 1),
    st.integers(min_value=0, max_value=len(_TEXTS) - 1),
)

# epoch = (rows, compact_after)
_epoch = st.tuples(st.lists(_row, min_size=1, max_size=6), st.booleans())

_scenario = st.lists(_epoch, min_size=1, max_size=3)


def _fold(events):
    """Pure-Python LWW fold: key -> winner (op_ts, lsn, op, text)."""
    winners: dict = {}
    for key, op_ts, lsn, op, text in events:
        cur = winners.get(key)
        if cur is None or (op_ts, lsn) > (cur[0], cur[1]):
            winners[key] = (op_ts, lsn, op, text)
    return winners


def _model_feed(events_i, events_j):
    """Expected feed dict: key -> (_change_type, text)."""
    wi, wj = _fold(events_i), _fold(events_j)
    out = {}
    for key in set(wi) | set(wj):
        a, b = wi.get(key), wj.get(key)
        live_i = a is not None and a[2] != "D"
        live_j = b is not None and b[2] != "D"
        if not live_i and live_j:
            out[key] = ("insert", b[3])
        elif live_i and not live_j:
            out[key] = ("delete", a[3])
        elif live_i and live_j and (a[0], a[1]) != (b[0], b[1]):
            out[key] = ("update_postimage", b[3])
    return out


def _feed(t, v0, v1):
    return {
        (r.conv_id, r.turn_idx): (r._change_type, r.text)
        for r in t.changes_between(v0, v1).collect()
    }


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
# late loser must be silent: epoch 2's update has an older op_ts than the
# epoch-1 winner, loses the fold, and must emit NOTHING between v1 and v2
@example([([("I", 0, 2, 2)], False), ([("U", 0, 0, 3)], False)])
# delete then re-insert across epochs: v0→v2 must read as update (live at
# both ends, different winner), v1→v2 as insert
@example([
    ([("I", 1, 0, 2), ("D", 1, 1, 0)], True),
    ([("I", 1, 2, 4)], False),
])
# tombstoned at both ends (delete refreshed by a newer delete) → absent
@example([
    ([("I", 2, 0, 2), ("D", 2, 1, 0)], False),
    ([("D", 2, 2, 0)], False),
])
# same-op_ts tie broken by lsn: second write same second, bumps winner
@example([([("I", 3, 1, 1)], False), ([("U", 3, 1, 2)], True)])
@given(_scenario)
def test_feed_matches_model_for_every_version_pair(
    spark, tmp_path_factory, scenario
):
    path = str(tmp_path_factory.mktemp("prop_feed") / "tbl")
    eng = CdcEngine(spark, path, num_buckets=4)
    t = eng.table

    lsn = 0
    events = []            # model-side raw event list, arrival order
    versions = [(t.version, 0)]  # (table version, #events folded at it)
    for epoch_no, (rows, compact_after) in enumerate(scenario):
        batch = []
        for op, ki, ti, xi in rows:
            lsn += 1  # binlog LSN: monotone in arrival order; op_ts is not
            conv, turn = _KEYS[ki]
            text = None if op == "D" else _TEXTS[xi]
            role = None if op == "D" else "user"
            batch.append(
                (op, conv, turn, role, text, None, _FIXED_TS, _TS[ti], lsn)
            )
            events.append(((conv, turn), _TS[ti], lsn, op, text))
        apply_batch(t, spark.createDataFrame(batch, schema=CHANGE_SCHEMA),
                    epoch=epoch_no)
        versions.append((t.version, len(events)))
        if compact_after:
            t.compact()  # physical only — must stay silent in every window

    for i in range(len(versions)):
        for j in range(i + 1, len(versions)):
            (vi, ni), (vj, nj) = versions[i], versions[j]
            want = _model_feed(events[:ni], events[:nj])
            got = _feed(t, vi, vj)
            assert got == want, (
                f"feed({vi}->{vj}) mismatch: got {got}, want {want}"
            )
