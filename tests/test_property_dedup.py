"""Property-based (hypothesis) equivalence of the LWW dedup strategies.

The deterministic fixtures in test_cdc_core exercise one generator shape;
here hypothesis drives adversarial batches the generator never emits —
single hot keys, all-tombstone batches, NULL payloads in every position,
unicode text, duplicate verbatim re-sends, exact (op_ts, lsn) ties with
differing payloads, and the empty batch.

Contracts pinned (see etl_spark/cdc/dedup.py module docstring):

  * under the WAL contract — (op_ts, lsn) unique per key — every physical
    strategy (max-struct agg, salted window, pack+join, narrow in both
    join-back modes) returns the SAME winner multiset, equal to a pandas
    argmax oracle;
  * on corrupt inputs with exact order ties, EVERY strategy (round-5
    default) resolves to the same single lexicographic-max winner per
    key; the documented opt-out (``exact_ties=False`` on narrow/join)
    keeps tied variants, re-resolved at read time by _lww_fold.

Examples are deliberately few (each example runs real Spark jobs); the
value is hypothesis's shrinking search over structure, not volume.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from etl_spark.cdc.dedup import (  # noqa: E402
    lww_dedup,
    lww_dedup_join,
    lww_dedup_narrow,
    lww_dedup_window,
)
from tests.conftest import assert_pdf_equal  # noqa: E402

_TS = [dt.datetime(2025, 1, 1, 0, 0, s) for s in range(3)]

_row = st.tuples(
    st.sampled_from(["I", "U", "D"]),                       # op
    st.sampled_from(["c1", "c2", "hét-🔥"]),                # conv_id (hot-ish)
    st.integers(min_value=0, max_value=2),                  # turn_idx
    st.sampled_from([None, "user", "assistant"]),           # role
    st.sampled_from([None, "", "x", "τext 😀", "a" * 50]),  # text
    st.sampled_from([None, "bash"]),                        # tool
    st.sampled_from([None] + _TS),                          # ts
    st.sampled_from(_TS),                                   # op_ts
    st.integers(min_value=0, max_value=5),                  # lsn
)

_OUT_COLS = ["conv_id", "turn_idx", "op_ts", "lsn", "op", "role", "text", "tool", "ts"]


def _df(spark, rows):
    from etl_spark.cdc.engine import CHANGE_SCHEMA

    return spark.createDataFrame(rows, schema=CHANGE_SCHEMA)


def _cell(v):
    if v is None or (isinstance(v, float) and v != v) or v is pd.NaT:
        return None
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    return v


def _tuples(pdf: pd.DataFrame):
    return sorted(
        tuple(_cell(v) for v in rec)
        for rec in pdf[_OUT_COLS].itertuples(index=False, name=None)
    )


def _pandas_lww_oracle(rows):
    """Winner per (conv_id, turn_idx) by max (op_ts, lsn) — rows must be
    unique on (key, op_ts, lsn) so the winner is well-defined."""
    best = {}
    for r in rows:
        k = (r[1], r[2])
        o = (r[7], r[8])
        if k not in best or o > best[k][0]:
            best[k] = (o, r)
    # reorder each winning change row to _OUT_COLS
    return sorted(
        (r[1], r[2], r[7], r[8], r[0], r[3], r[4], r[5], r[6])
        for (_, r) in best.values()
    )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(_row, max_size=40))
def test_all_strategies_agree_under_wal_contract(spark, rows):
    # enforce the WAL contract: (key, op_ts, lsn) unique — keep the LAST
    # occurrence (payloads stay arbitrary, verbatim re-sends collapse)
    uniq = {(r[1], r[2], r[7], r[8]): r for r in rows}
    rows = list(uniq.values())
    changes = _df(spark, rows)
    outs = [
        lww_dedup(changes).toPandas(),
        lww_dedup_window(changes).toPandas(),
        lww_dedup_join(changes).toPandas(),
        lww_dedup_narrow(changes).toPandas(),
        lww_dedup_narrow(changes, winners_join="shuffle_hash").toPandas(),
    ]
    for other in outs[1:]:
        assert_pdf_equal(outs[0], other, ["conv_id", "turn_idx"])
    assert _tuples(outs[0]) == _pandas_lww_oracle(rows)


_wide_ts = st.datetimes(
    min_value=dt.datetime(1905, 1, 1),  # negative unix micros in scope
    max_value=dt.datetime(2200, 1, 1),
)
_pack_pair = st.tuples(
    _wide_ts, st.integers(min_value=0, max_value=2**62),
    _wide_ts, st.integers(min_value=0, max_value=2**62),
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(pairs=st.lists(_pack_pair, min_size=1, max_size=64))
def test_pack_order_preserves_lexicographic_order(spark, pairs):
    """pack_order (the narrow strategy's fixed-width order key) must
    compare exactly like the (op_ts, lsn) tuple — including pre-1970
    timestamps (negative unix micros) and lsn up to 2^62."""
    import pyspark.sql.types as T

    from etl_spark.cdc.dedup import pack_order

    schema = T.StructType([
        T.StructField("a_ts", T.TimestampType()),
        T.StructField("a_lsn", T.LongType()),
        T.StructField("b_ts", T.TimestampType()),
        T.StructField("b_lsn", T.LongType()),
    ])
    df = spark.createDataFrame(pairs, schema=schema)
    import pyspark.sql.functions as F

    pa = pack_order(F.col("a_ts"), F.col("a_lsn"))
    pb = pack_order(F.col("b_ts"), F.col("b_lsn"))
    got = df.select(
        F.when(pa < pb, -1).when(pa > pb, 1).otherwise(0).alias("cmp")
    ).collect()
    for (a_ts, a_lsn, b_ts, b_lsn), row in zip(pairs, got):
        want = ((a_ts, a_lsn) > (b_ts, b_lsn)) - ((a_ts, a_lsn) < (b_ts, b_lsn))
        assert row.cmp == want, (a_ts, a_lsn, b_ts, b_lsn)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(_row, max_size=40))
def test_all_strategies_resolve_corrupt_ties_identically(spark, rows):
    # NO uniqueness filter: exact (key, op_ts, lsn) ties with differing
    # payloads are in scope — the corrupt-input case the WAL contract
    # excludes but the engine must still resolve deterministically.
    # Round-5 contract: the strict one-row-per-key lexicographic-max
    # winner is the DEFAULT of every physical strategy, so delta contents
    # and winners lineage never depend on the dispatcher's choice.
    changes = _df(spark, rows)
    outs = [
        lww_dedup(changes).toPandas(),
        lww_dedup_window(changes).toPandas(),
        lww_dedup_join(changes).toPandas(),
        lww_dedup_narrow(changes).toPandas(),
        lww_dedup_narrow(changes, winners_join="shuffle_hash").toPandas(),
    ]
    for other in outs[1:]:
        assert_pdf_equal(outs[0], other, ["conv_id", "turn_idx"])
    n_keys = len({(r[1], r[2]) for r in rows})
    for o in outs:
        assert len(o) == n_keys
    # the documented opt-out keeps every tied variant instead
    optout = lww_dedup_narrow(changes, exact_ties=False).toPandas()
    assert len(optout) >= n_keys
