"""Property-based (hypothesis) model check of partial-image CDC.

test_partial_updates pins the documented cases one at a time; here
hypothesis drives random patch batches — arbitrary NULL patterns, deletes
interleaved between patches, late events older than the committed row,
keys with no committed row — against an independent pure-Python model of
the documented contract (etl_spark/cdc/partial.py module docstring):

  * column-wise within-batch fold: latest non-NULL per column among
    non-delete events NEWER than the key's last in-batch delete;
  * the materialized row carries the key's newest (op, op_ts, lsn);
  * NULL fill from the committed row unless the batch's delete is newer
    than that row (no resurrecting pre-delete bytes);
  * the materialized full image then fights the committed row in the
    ordinary row-LWW: a late patch batch loses, state unchanged.

The model is pandas/python only — no Spark, no table format — so
agreement is evidence, not tautology.
"""

from __future__ import annotations

import datetime as dt

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, example, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from etl_spark.cdc.apply import apply_batch  # noqa: E402
from etl_spark.cdc.engine import CHANGE_SCHEMA, CdcEngine  # noqa: E402
from etl_spark.cdc.partial import materialize_partial  # noqa: E402
from tests.conftest import assert_pdf_equal  # noqa: E402

_KEYS = [("a", 0), ("a", 1), ("b", 0)]
_TS = [dt.datetime(2025, 1, 1, 0, 0, s) for s in range(3)]
_PAYLOAD = ["role", "text", "tool", "ts"]

# a committed full row per key: present? + value indices
_committed = st.fixed_dictionaries(
    {
        ki: st.one_of(
            st.none(),
            st.tuples(
                st.integers(0, 2),              # op_ts index
                st.sampled_from(["user", "assistant"]),
                st.sampled_from(["hi", "τ😀", ""]),
                st.sampled_from(["bash", "web"]),
                st.integers(0, 2),              # ts index
            ),
        )
        for ki in range(len(_KEYS))
    }
)

# patch events: op, key, op_ts index, per-column optional values
_patch = st.tuples(
    st.sampled_from(["I", "U", "D"]),
    st.integers(0, len(_KEYS) - 1),
    st.integers(0, 2),
    st.one_of(st.none(), st.sampled_from(["tool", "system"])),   # role
    st.one_of(st.none(), st.sampled_from(["patched", "p2"])),    # text
    st.one_of(st.none(), st.sampled_from(["grep"])),             # tool
    st.one_of(st.none(), st.integers(0, 2)),                     # ts index
)

_scenario = st.tuples(_committed, st.lists(_patch, min_size=1, max_size=6))


def _model(committed, patches):
    """Expected final snapshot rows, computed from the documented contract."""
    cur: dict = {}  # key -> {"ord": (ts, lsn), "vals": {col: v}}
    lsn = 0
    for ki, spec in sorted(committed.items()):
        if spec is None:
            continue
        lsn += 1
        ts_i, role, text, tool, tsv = spec
        cur[_KEYS[ki]] = {
            "ord": (_TS[ts_i], lsn),
            "vals": {"role": role, "text": text, "tool": tool, "ts": _TS[tsv]},
        }
    base_lsn = 100  # patch lsns are globally unique, above the committed ones
    events: dict = {}
    for i, (op, ki, ti, role, text, tool, tsv) in enumerate(patches):
        key = _KEYS[ki]
        vals = {"role": role, "text": text, "tool": tool,
                "ts": None if tsv is None else _TS[tsv]}
        events.setdefault(key, []).append(
            ((_TS[ti], base_lsn + i), op, vals)
        )
    out = dict(cur)
    for key, evs in events.items():
        last_d = max((o for o, op, _ in evs if op == "D"), default=None)
        folded = {}
        for c in _PAYLOAD:
            live = [
                (o, v[c]) for o, op, v in evs
                if op != "D" and v[c] is not None
                and (last_d is None or o > last_d)
            ]
            folded[c] = max(live)[1] if live else None
        top_ord, top_op, _ = max(evs)
        prior = cur.get(key)
        fill_ok = last_d is None or (prior is not None and prior["ord"] > last_d)
        if top_op == "D":
            row_vals = None  # tombstone image
        else:
            row_vals = {
                c: (
                    folded[c]
                    if folded[c] is not None
                    else (prior["vals"][c] if prior is not None and fill_ok else None)
                )
                for c in _PAYLOAD
            }
        # ordinary row-LWW against the committed row
        if prior is None or top_ord > prior["ord"]:
            if row_vals is None:
                out.pop(key, None)
            else:
                out[key] = {"ord": top_ord, "vals": row_vals}
    import pandas as pd

    rows = [
        {"conv_id": k[0], "turn_idx": k[1], **v["vals"]}
        for k, v in out.items()
    ]
    return pd.DataFrame(rows, columns=["conv_id", "turn_idx", *_PAYLOAD])


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
# pinned: two patches touch different columns; both must land
@example(({0: (0, "user", "hi", "bash", 0)},
          [("U", 0, 1, None, "patched", None, None),
           ("U", 0, 2, "tool", None, None, None)]))
# pinned: delete resets the fold — the pre-delete patch's text must NOT
# survive, and the committed row must not leak through the fill
@example(({0: (0, "user", "hi", "bash", 0)},
          [("U", 0, 1, None, "patched", None, None),
           ("D", 0, 1, None, None, None, None),
           ("U", 0, 2, "tool", None, None, None)]))
# pinned: late patch batch (older than the committed row) loses row-LWW
@example(({0: (2, "user", "hi", "bash", 0)},
          [("U", 0, 0, None, "stale", None, None)]))
# pinned: patch against a key with NO committed row — unfilled NULLs stay
@example(({},
          [("I", 2, 1, None, "fresh", None, None)]))
@given(_scenario)
def test_partial_apply_matches_model(spark, tmp_path_factory, scenario):
    committed, patches = scenario
    path = str(tmp_path_factory.mktemp("prop_partial") / "tbl")
    eng = CdcEngine(spark, path, num_buckets=4)

    lsn = 0
    full_rows = []
    for ki, spec in sorted(committed.items()):
        if spec is None:
            continue
        lsn += 1
        ts_i, role, text, tool, tsv = spec
        conv, turn = _KEYS[ki]
        full_rows.append(
            ("I", conv, turn, role, text, tool, _TS[tsv], _TS[ts_i], lsn)
        )
    if full_rows:
        apply_batch(
            eng.table, spark.createDataFrame(full_rows, CHANGE_SCHEMA), epoch=0
        )

    patch_rows = []
    for i, (op, ki, ti, role, text, tool, tsv) in enumerate(patches):
        conv, turn = _KEYS[ki]
        patch_rows.append(
            (op, conv, turn, role, text, tool,
             None if tsv is None else _TS[tsv], _TS[ti], 100 + i)
        )
    patch_df = spark.createDataFrame(patch_rows, CHANGE_SCHEMA)
    apply_batch(eng.table, materialize_partial(eng.table, patch_df), epoch=1)

    got = eng.table.snapshot_df().toPandas()
    want = _model(committed, patches)
    assert len(got) == len(want)
    if len(want):
        assert_pdf_equal(got, want, ["conv_id", "turn_idx"])
