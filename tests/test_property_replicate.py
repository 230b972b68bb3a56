"""Property-based (hypothesis) soak of table replication.

The directed tests in test_replicate pin initial/incremental sync,
vacuum-forced full resync, and schema evolution one at a time; here
hypothesis drives random INTERLEAVINGS — source epochs with late
arrivals and deletes, syncs at arbitrary points (including back-to-back
no-op syncs), compactions and tombstone expunges on EITHER side between
any two steps — and after a final sync the replica snapshot must be
byte-equal to the source snapshot.

Replication composes changes_between + apply_batch, so this soak is the
integration check that the feed's version-pair diffs (pinned
independently by test_property_feed) actually accumulate into a
converged replica under any cadence: every key's final (role, text,
tool, ts) image on the replica equals the source's, deleted keys are
absent, and a re-run of the final sync is a fenced no-op.

Lateness is bounded BY CONSTRUCTION so the expunge steps respect the
documented precondition (the horizon must clear the max lateness —
tests/test_robustness pins the violation failing): an epoch-e event's
op_ts is base + (e + ti) seconds with ti in [0, 2], so every future
event sits at or above base + e and ``before_op_ts = base + e`` can
never expunge a tombstone that still guards a late loser."""

from __future__ import annotations

import datetime as dt

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, example, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from etl_spark.cdc.apply import apply_batch  # noqa: E402
from etl_spark.cdc.engine import CHANGE_SCHEMA, CdcEngine  # noqa: E402
from etl_spark.cdc.maintenance import expunge_tombstones  # noqa: E402
from etl_spark.cdc.replicate import create_replica, sync_replica  # noqa: E402

_KEYS = [("a", 0), ("a", 1), ("b", 0), ("c", 3)]
_TEXTS = [None, "", "abc", "τ😀"]
_FIXED_TS = dt.datetime(2025, 1, 1)
_BASE = dt.datetime(2025, 1, 1, 0, 0, 0)

# (op, key index, intra-epoch op_ts offset 0..2, text index)
_row = st.tuples(
    st.sampled_from(["I", "U", "D"]),
    st.integers(min_value=0, max_value=len(_KEYS) - 1),
    st.integers(min_value=0, max_value=2),
    st.integers(min_value=0, max_value=len(_TEXTS) - 1),
)

_step = st.one_of(
    st.tuples(st.just("epoch"), st.lists(_row, min_size=1, max_size=5)),
    st.tuples(st.just("sync"), st.none()),
    st.tuples(st.just("compact_src"), st.none()),
    st.tuples(st.just("compact_dst"), st.none()),
    st.tuples(st.just("expunge_src"), st.none()),
    st.tuples(st.just("expunge_dst"), st.none()),
)

_scenario = st.lists(_step, min_size=1, max_size=6)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
# delete synced AFTER the source compacted + expunged its tombstone: the
# feed has no order key, the stamped delete must still kill the replica row
@example([
    ("epoch", [("I", 0, 0, 2)]),
    ("sync", None),
    ("epoch", [("D", 0, 0, 0)]),
    ("compact_src", None),
    ("expunge_src", None),
    ("sync", None),
])
# late loser arriving between syncs must not regress the replica
@example([
    ("epoch", [("I", 1, 2, 2)]),
    ("sync", None),
    ("epoch", [("U", 1, 0, 3)]),
    ("sync", None),
])
# delete + re-insert entirely between two syncs (feed reads as update)
@example([
    ("epoch", [("I", 2, 0, 2)]),
    ("sync", None),
    ("epoch", [("D", 2, 1, 0)]),
    ("epoch", [("I", 2, 2, 3)]),
    ("sync", None),
])
@given(_scenario)
def test_replication_converges_under_interleavings(
    spark, tmp_path_factory, scenario
):
    work = tmp_path_factory.mktemp("prop_repl")
    src = CdcEngine(spark, str(work / "src"), num_buckets=4).table
    dst = create_replica(src, str(work / "dst"))

    lsn = 0
    epoch_no = 0
    for kind, payload in scenario:
        if kind == "epoch":
            batch = []
            for op, ki, ti, xi in payload:
                lsn += 1
                conv, turn = _KEYS[ki]
                text = None if op == "D" else _TEXTS[xi]
                role = None if op == "D" else "user"
                op_ts = _BASE + dt.timedelta(seconds=epoch_no + ti)
                batch.append((op, conv, turn, role, text, None, _FIXED_TS,
                              op_ts, lsn))
            apply_batch(src, spark.createDataFrame(batch, schema=CHANGE_SCHEMA),
                        epoch=epoch_no)
            epoch_no += 1
        elif kind == "sync":
            sync_replica(src, dst)
        elif kind == "compact_src":
            src.compact()
        elif kind == "compact_dst":
            dst.compact()
        else:
            horizon = str(_BASE + dt.timedelta(seconds=epoch_no))
            expunge_tombstones(src if kind == "expunge_src" else dst,
                               before_op_ts=horizon)

    sync_replica(src, dst)
    again = sync_replica(src, dst)  # fenced no-op at the same version
    assert again.mode == "noop"

    want = {
        (r.conv_id, r.turn_idx): (r.role, r.text, r.tool, r.ts)
        for r in src.snapshot_df().collect()
    }
    got = {
        (r.conv_id, r.turn_idx): (r.role, r.text, r.tool, r.ts)
        for r in dst.snapshot_df().collect()
    }
    assert got == want, f"replica {got} != source {want}"
