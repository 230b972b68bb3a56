"""Property-based (hypothesis) model check of row-level DML × replay.

The directed tests in test_dml pin each mechanism; here hypothesis
interleaves ``delete_where`` / ``update_where`` with CDC epochs (late
arrivals included) and compares the final snapshot against a pure-Python
model of the documented stamping contract (cdc/maintenance.py:133-151):

  * a DML resolves its predicate against the LIVE folded snapshot at
    request time;
  * its delta rows are stamped (watermark_any, max-matched-lsn + 1) —
    beating every change applied so far for the matched keys, while
    genuinely newer stream traffic (op_ts above the watermark, or equal
    with a higher lsn) still wins;
  * delete_where tombstones matched keys; update_where rewrites payload
    columns from the pre-image (SET exprs), key/event-time columns
    untouched;
  * exactly-once per (source, request_id) — replayed requests are
    fenced no-ops (exercised by re-issuing every request at the end).

The model folds raw events and applies the same contract in plain
Python — no Spark, no table format — so agreement is evidence that DML
commits compose with LWW replay under any interleaving."""

from __future__ import annotations

import datetime as dt

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, example, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from etl_spark.cdc.apply import apply_batch  # noqa: E402
from etl_spark.cdc.engine import CHANGE_SCHEMA, CdcEngine  # noqa: E402
from etl_spark.cdc.maintenance import delete_where, update_where  # noqa: E402

_KEYS = [("a", 0), ("a", 1), ("b", 0), ("c", 3)]
_TS = [dt.datetime(2025, 1, 1, 0, 0, s) for s in range(3)]
_TEXTS = [None, "", "abc", "payload text"]
_ROLES = ["user", "assistant"]
_TOOLS = [None, "tool_01"]
_FIXED_TS = dt.datetime(2025, 1, 1)
_EPOCH0 = dt.datetime(1970, 1, 1)

# predicate: (SQL, python mirror over the live row dict)
_PREDS = [
    ("role = 'user'", lambda r: r["role"] == "user"),
    ("turn_idx = 0", lambda r: r["turn_idx"] == 0),
    ("text IS NULL", lambda r: r["text"] is None),
    ("tool IS NOT NULL", lambda r: r["tool"] is not None),
]

# update SET: (sql dict, python mirror row -> partial update)
_SETS = [
    ({"tool": "'fixed'"}, lambda r: {"tool": "fixed"}),
    ({"text": "upper(text)"},
     lambda r: {"text": None if r["text"] is None else r["text"].upper()}),
    ({"text": "'-'", "tool": "NULL"}, lambda r: {"text": "-", "tool": None}),
]

_row = st.tuples(
    st.sampled_from(["I", "U", "D"]),
    st.integers(min_value=0, max_value=len(_KEYS) - 1),
    st.integers(min_value=0, max_value=len(_TS) - 1),
    st.integers(min_value=0, max_value=len(_TEXTS) - 1),
    st.integers(min_value=0, max_value=len(_ROLES) - 1),
    st.integers(min_value=0, max_value=len(_TOOLS) - 1),
)

_step = st.one_of(
    st.tuples(st.just("epoch"), st.lists(_row, min_size=1, max_size=5)),
    st.tuples(st.just("delete"),
              st.integers(min_value=0, max_value=len(_PREDS) - 1)),
    st.tuples(st.just("update"),
              st.tuples(st.integers(min_value=0, max_value=len(_PREDS) - 1),
                        st.integers(min_value=0, max_value=len(_SETS) - 1))),
)

_scenario = st.lists(_step, min_size=1, max_size=5)


class _Model:
    def __init__(self):
        # key -> (op_ts, lsn, op, {"role","text","tool","ts"})
        self.winners: dict = {}
        self.wm = None  # max committed stream op_ts

    def fold(self, key, op_ts, lsn, op, payload):
        cur = self.winners.get(key)
        if cur is None or (op_ts, lsn) > (cur[0], cur[1]):
            self.winners[key] = (op_ts, lsn, op, payload)

    def live(self):
        return {
            k: dict(p, conv_id=k[0], turn_idx=k[1])
            for k, (_, _, op, p) in self.winners.items() if op != "D"
        }

    def dml(self, pred, effect):
        wm = self.wm or _EPOCH0
        matched = {k: r for k, r in self.live().items() if pred(r)}
        if not matched:
            return
        stamp = max(self.winners[k][1] for k in matched) + 1
        for k, r in matched.items():
            upd = effect(r)
            if upd is None:  # delete
                self.fold(k, wm, stamp, "D", None)
            else:
                self.fold(k, wm, stamp, "U", {**{c: r[c] for c in
                                                 ("role", "text", "tool", "ts")},
                                              **upd})


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
# delete_where, then a LATE stream event below the watermark: the DML
# tombstone (stamped at the watermark) must win — key stays dead
@example([("epoch", [("I", 0, 2, 2, 0, 0)]), ("delete", 0),
          ("epoch", [("U", 0, 0, 3, 0, 0)])])
# update_where, then a genuinely newer stream event beats the DML image
@example([("epoch", [("I", 1, 0, 2, 0, 1)]), ("update", (3, 0)),
          ("epoch", [("U", 1, 2, 3, 0, 1)])])
# update on a NULL-text row via upper(text); chained DMLs share a fold
@example([("epoch", [("I", 2, 0, 0, 0, 0)]), ("update", (2, 1)),
          ("delete", 2)])
@given(_scenario)
def test_dml_interleavings_match_model(spark, tmp_path_factory, scenario):
    path = str(tmp_path_factory.mktemp("prop_dml") / "tbl")
    eng = CdcEngine(spark, path, num_buckets=4)
    t = eng.table
    model = _Model()

    lsn = 0
    epoch_no = 0
    requests = []  # (kind, args, request_id) to re-issue for fencing
    req = 0
    for step in scenario:
        if step[0] == "epoch":
            batch = []
            for op, ki, ti, xi, ri, tool_i in step[1]:
                lsn += 1
                conv, turn = _KEYS[ki]
                payload = {
                    "role": None if op == "D" else _ROLES[ri],
                    "text": None if op == "D" else _TEXTS[xi],
                    "tool": None if op == "D" else _TOOLS[tool_i],
                    "ts": _FIXED_TS,
                }
                batch.append((op, conv, turn, payload["role"], payload["text"],
                              payload["tool"], _FIXED_TS, _TS[ti], lsn))
                model.fold((conv, turn), _TS[ti], lsn, op,
                           None if op == "D" else payload)
                model.wm = max(model.wm or _EPOCH0, _TS[ti])
            apply_batch(t, spark.createDataFrame(batch, schema=CHANGE_SCHEMA),
                        epoch=epoch_no)
            epoch_no += 1
        elif step[0] == "delete":
            req += 1
            sql, pred = _PREDS[step[1]]
            delete_where(t, sql, request_id=req)
            model.dml(pred, lambda r: None)
            requests.append(("delete", sql, req))
        else:
            req += 1
            (pi, si) = step[1]
            sql, pred = _PREDS[pi]
            set_sql, set_py = _SETS[si]
            update_where(t, set_sql, sql, request_id=req)
            model.dml(pred, set_py)
            requests.append(("update", (set_sql, sql), req))
        # model lsn counter must stay ahead of DML stamps so a future
        # stream event can never tie a stamp's (op_ts, lsn) exactly
        lsn = max([lsn] + [w[1] for w in model.winners.values()])

    # exactly-once: replaying every request must change nothing
    for kind, args, rid in requests:
        if kind == "delete":
            assert delete_where(t, args, request_id=rid) is None
        else:
            assert update_where(t, args[0], args[1], request_id=rid) is None

    got = {
        (r.conv_id, r.turn_idx): (r.role, r.text, r.tool, r.ts)
        for r in t.snapshot_df().collect()
    }
    want = {
        k: (r["role"], r["text"], r["tool"], r["ts"])
        for k, r in model.live().items()
    }
    assert got == want, f"snapshot {got} != model {want}"
