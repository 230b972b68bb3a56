"""Property-based (hypothesis) model check of schema evolution × replay.

The directed tests in test_schema_v2 pin each field-ID rule one at a
time; here hypothesis drives random INTERLEAVINGS of the rules the way a
live stream delivers them — epochs that add / widen / omit columns,
renames between epochs, drop-then-rewrite-the-same-name, deletes landing
before late updates — and the final snapshot is compared against an
independent pure-Python model of the Iceberg semantics:

  * column identity is a field ID assigned at first sight of a name;
  * rename moves the NAME, the ID (and all written bytes) stay;
  * after a rename or drop, a later epoch writing the old name creates a
    FRESH ID — previously written bytes never resurrect under it;
  * widening (int→bigint, float→double) rebinds the ID's type, old
    values read back widened;
  * the per-key winner is the (op_ts, lsn) argmax over the whole log,
    and its row resolves every CURRENT field by ID against what that
    row's epoch actually wrote (missing ID → NULL);
  * a delete winner removes the key.

The model never touches Spark or the table format, so agreement is
evidence, not tautology. Examples are few (each replays a real table);
the value is hypothesis's shrinking over structure, not volume.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, example, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from pyspark.sql import types as T  # noqa: E402

from etl_spark.cdc.apply import apply_batch  # noqa: E402
from etl_spark.lake.table import LakeTable  # noqa: E402
from tests.conftest import assert_pdf_equal  # noqa: E402

_KEYS = [("a", 0), ("a", 1), ("b", 0), ("hot", 0)]
_TS = [dt.datetime(2025, 1, 1, 0, 0, s) for s in range(3)]

# extra-column pool; each NAME is pinned to one widening chain so any
# drop/re-add stays type-compatible (variant index 0 = narrow, 1 = wide)
_POOL = {
    "score": (T.IntegerType(), T.LongType()),
    "conf": (T.FloatType(), T.DoubleType()),
    "note": (T.StringType(), T.StringType()),
}

_row = st.tuples(
    st.sampled_from(["I", "U", "D"]),
    st.integers(min_value=0, max_value=len(_KEYS) - 1),   # key index
    st.integers(min_value=0, max_value=len(_TS) - 1),     # op_ts index
    st.integers(min_value=-3, max_value=3),               # score value
    st.integers(min_value=-4, max_value=4),               # conf value ×0.25
    st.sampled_from([None, "", "x", "τ😀"]),              # note value
)

_epoch = st.tuples(
    st.just("epoch"),
    st.lists(_row, min_size=1, max_size=5),
    # which pool columns this epoch writes, and at which chain variant
    st.fixed_dictionaries(
        {name: st.sampled_from([None, 0, 1]) for name in _POOL}
    ),
)

_meta_op = st.tuples(
    st.sampled_from(["rename", "drop"]),
    st.sampled_from(sorted(_POOL)),
    st.just(None),
)

_scenario = st.lists(st.one_of(_epoch, _meta_op), min_size=1, max_size=6)


class _Model:
    """Pure-Python mirror of the field-ID contract (no Spark, no parquet)."""

    def __init__(self, base: list[tuple[str, str]]):
        self.schema: list[list] = []  # [uid, name, type_ddl]
        self.next_uid = 1
        for name, ddl in base:
            self.schema.append([self.next_uid, name, ddl])
            self.next_uid += 1
        self.log: list[tuple] = []  # (op_ts, lsn, op, key, {uid: value})

    def _by_name(self, name):
        return next((f for f in self.schema if f[1] == name), None)

    def accept(self, name: str, ddl: str) -> int:
        f = self._by_name(name)
        if f is None:
            self.schema.append([self.next_uid, name, ddl])
            self.next_uid += 1
            return self.next_uid - 1
        wide = {("int", "bigint"), ("float", "double")}
        if (f[2], ddl) in wide:
            f[2] = ddl
        return f[0]

    def rename(self, old: str, new: str):
        f = self._by_name(old)
        assert f is not None
        f[1] = new

    def drop(self, name: str):
        f = self._by_name(name)
        assert f is not None
        self.schema.remove(f)

    def final_frame(self) -> pd.DataFrame:
        winners: dict[tuple, tuple] = {}
        for rec in self.log:
            k = rec[3]
            if k not in winners or rec[:2] > winners[k][:2]:
                winners[k] = rec
        rows = []
        for rec in winners.values():
            if rec[2] == "D":
                continue
            payload = rec[4]
            rows.append({name: payload.get(uid) for uid, name, _ in self.schema})
        return pd.DataFrame(rows, columns=[f[1] for f in self.schema])


_NO_EXTRAS = {"score": None, "conf": None, "note": None}


def _cols(**kw):
    return {**_NO_EXTRAS, **kw}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
# pinned interleavings — each a rule the random draws might miss in 8 tries:
# drop then rewrite the same name (old bytes must stay dead; key (a,0)'s
# winner predates the re-add so its score must read NULL, (b,0)'s postdates
# it and must read 3)
@example([
    ("epoch", [("I", 0, 0, 7, 0, None), ("I", 2, 0, 9, 0, None)], _cols(score=0)),
    ("drop", "score", None),
    ("epoch", [("U", 2, 1, 3, 0, None)], _cols(score=0)),
])
# rename, then an epoch rewrites the OLD name — a fresh column, while the
# renamed one keeps serving the old bytes by ID
@example([
    ("epoch", [("I", 0, 0, 5, 0, None)], _cols(score=0)),
    ("rename", "score", None),
    ("epoch", [("U", 0, 1, 8, 0, None)], _cols(score=0)),
])
# widen int→bigint and float→double with the winner written NARROW: the
# pre-widen values must read back widened, not NULLed
@example([
    ("epoch", [("I", 0, 1, 2, 3, "x")], _cols(score=0, conf=0, note=0)),
    ("epoch", [("I", 1, 0, 4, -2, "")], _cols(score=1, conf=1)),
])
# delete beats a LATE (older op_ts, higher lsn) update; re-insert revives
@example([
    ("epoch", [("I", 3, 0, 1, 0, "a"), ("D", 3, 2, 0, 0, None),
               ("U", 3, 1, 6, 0, "late")], _cols(score=0, note=0)),
    ("epoch", [("I", 1, 2, 2, 0, "new")], _cols(score=0, note=0)),
])
@given(_scenario)
def test_schema_evolution_replay_matches_model(spark, tmp_path_factory, scenario):
    base = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
        ]
    )
    path = str(tmp_path_factory.mktemp("prop_schema") / "tbl")
    table = LakeTable.create(
        spark, path, base, num_buckets=4, stats_col=None
    )
    model = _Model([("conv_id", "string"), ("turn_idx", "int")])
    lsn = 0
    epoch_no = 0
    for step_idx, (kind, a, b) in enumerate(scenario):
        if kind == "epoch":
            cols = {n: v for n, v in b.items() if v is not None}
            fields = [
                T.StructField("op", T.StringType(), False),
                T.StructField("conv_id", T.StringType(), False),
                T.StructField("turn_idx", T.IntegerType(), False),
            ]
            for name in sorted(cols):
                fields.append(T.StructField(name, _POOL[name][cols[name]], True))
            fields += [
                T.StructField("op_ts", T.TimestampType(), False),
                T.StructField("lsn", T.LongType(), False),
            ]
            # model-side evolution happens exactly when the engine sees
            # the batch schema (apply_batch evolves BEFORE writing)
            uid_of = {
                name: model.accept(name, _POOL[name][cols[name]].simpleString())
                for name in sorted(cols)
            }
            base_uid = {
                "conv_id": model._by_name("conv_id")[0],
                "turn_idx": model._by_name("turn_idx")[0],
            }
            tuples = []
            for op, ki, ti, sv, cv, tv in a:
                lsn += 1
                conv, turn = _KEYS[ki]
                vals = {"score": sv, "conf": cv * 0.25, "note": tv}
                extras = tuple(
                    None if op == "D" else vals[name] for name in sorted(cols)
                )
                tuples.append((op, conv, turn) + extras + (_TS[ti], lsn))
                payload = {base_uid["conv_id"]: conv, base_uid["turn_idx"]: turn}
                if op != "D":
                    for name in sorted(cols):
                        payload[uid_of[name]] = vals[name]
                model.log.append((_TS[ti], lsn, op, (conv, turn), payload))
            batch = spark.createDataFrame(tuples, schema=T.StructType(fields))
            apply_batch(table, batch, epoch=epoch_no)
            epoch_no += 1
        else:
            # meta op on a pool NAME; valid only while that name is live
            if model._by_name(a) is None:
                continue
            if kind == "rename":
                new = f"{a}_r{step_idx}"
                table.rename_column(a, new)
                model.rename(a, new)
            else:
                table.drop_column(a)
                model.drop(a)

    want = model.final_frame()
    got = table.snapshot_df().toPandas()
    assert sorted(got.columns) == sorted(want.columns)
    if len(want) == 0:
        assert len(got) == 0
        return
    # float32-written values are exact multiples of 0.25, so widening to
    # double is value-exact and the stringify compare is safe
    assert_pdf_equal(got, want, ["conv_id", "turn_idx"])
