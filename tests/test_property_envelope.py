"""Property-based (hypothesis) roundtrip of the Debezium envelope adapter.

For any batch of valid change rows (millisecond-precision op_ts — the
envelope's ts_ms wire field), to_debezium → parse_debezium is the
identity, preserves op mapping and image side (before for D, after for
I/U), flags nothing corrupt, and the NULL-key corruption flag fires
exactly on rows whose image was lost. Few examples by design — each runs
real Spark jobs; the value is hypothesis's shrinking over structure."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from etl_spark.cdc.engine import TRANSCRIPT_SCHEMA  # noqa: E402
from etl_spark.cdc.envelope import parse_debezium, to_debezium  # noqa: E402

_TS = [dt.datetime(2025, 1, 1, 0, 0, s, ms * 1000) for s in range(2) for ms in (0, 250)]

_row = st.tuples(
    st.sampled_from(["I", "U", "D"]),
    st.sampled_from(["c1", "hét-🔥", "a/b\\c\"d"]),          # conv_id incl. JSON-hostile
    st.integers(min_value=0, max_value=3),
    st.sampled_from([None, "user", "assistant"]),
    st.sampled_from([None, "", "τext 😀\nline2\ttab", '{"j":1}', "a" * 40]),
    st.sampled_from([None, "bash"]),
    st.sampled_from([None] + _TS),
    st.sampled_from(_TS),
    st.integers(min_value=0, max_value=9),
)

_COLS = ["op", "conv_id", "turn_idx", "role", "text", "tool", "ts", "op_ts", "lsn"]


@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_row, min_size=1, max_size=12))
def test_envelope_roundtrip_identity(spark, rows):
    src = spark.createDataFrame(
        rows,
        "op string, conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp, op_ts timestamp, lsn long",
    )
    wire = to_debezium(src, payload_cols=[f.name for f in TRANSCRIPT_SCHEMA.fields])
    back = parse_debezium(wire, TRANSCRIPT_SCHEMA, keep_corrupt=True)
    got = back.toPandas()
    assert not got["_corrupt"].any()
    key = lambda r: (r[0], r[1], r[2], r[7], r[8])
    want = sorted(rows, key=key)
    got_rows = sorted(
        (
            (r.op, r.conv_id, r.turn_idx, r.role, r.text, r.tool,
             r.ts.to_pydatetime() if pd.notna(r.ts) else None,
             r.op_ts.to_pydatetime(), int(r.lsn))
            for r in got.itertuples()
        ),
        key=key,
    )
    assert got_rows == [tuple(r) for r in want]


@settings(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(st.tuples(_row, st.booleans()), min_size=1, max_size=10))
def test_lost_images_flagged_exactly(spark, tagged):
    """Nulling the row image of ANY subset of wire rows flags exactly
    that subset corrupt — never a clean row, never a miss."""
    import json

    rows = [r for r, _ in tagged]
    src = spark.createDataFrame(
        rows,
        "op string, conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp, op_ts timestamp, lsn long",
    )
    wire = to_debezium(
        src, payload_cols=[f.name for f in TRANSCRIPT_SCHEMA.fields]
    ).toPandas()
    lose = [kill for _, kill in tagged]
    # a local-relation source through a narrow projection preserves row
    # order at this size, so images can be nulled positionally
    out = []
    for line, kill in zip(wire["value"], lose):
        if kill:
            d = json.loads(line)
            d["payload"]["before"] = None
            d["payload"]["after"] = None
            line = json.dumps(d)
        out.append((line,))
    back = parse_debezium(
        spark.createDataFrame(out, ["value"]), TRANSCRIPT_SCHEMA, keep_corrupt=True
    ).toPandas()
    assert int(back["_corrupt"].sum()) == sum(lose)
