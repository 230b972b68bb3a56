"""Field-ID schema resolution (rename / drop / readd) and time travel.

Iceberg-spec semantics the name-based reference diff cannot give
(/root/reference/dataproc-appsflyer/spark_job_data_locker.py:283-312 is
name-keyed): renames resolve old data files by field ID with no rewrite,
and a dropped-then-readded column name gets a fresh ID so old bytes never
resurrect. Time travel = Iceberg ``VERSION AS OF`` over retained metadata
versions.
"""

import datetime as dt

import pytest

from etl_spark.cdc.apply import apply_batch
from etl_spark.cdc.engine import CHANGE_SCHEMA, CdcEngine
from etl_spark.lake.table import LakeTable

T = lambda s: dt.datetime.fromisoformat(s)


def _batch(spark, rows):
    return spark.createDataFrame(rows, schema=CHANGE_SCHEMA)


def _mk(spark, tmp_path, name="tbl"):
    eng = CdcEngine(spark, str(tmp_path / name), num_buckets=4)
    apply_batch(eng.table, _batch(spark, [
        ("I", "c1", 0, "user", "hello", None, T("2025-01-01 00:00:00"),
         T("2025-01-01 00:00:01"), 1),
        ("I", "c1", 1, "assistant", "world", "search", T("2025-01-01 00:05:00"),
         T("2025-01-01 00:00:02"), 2),
    ]), epoch=0)
    return eng.table


def test_rename_resolves_old_files_by_field_id(spark, tmp_path):
    t = _mk(spark, tmp_path)
    change = t.rename_column("tool", "tool_name")
    assert "rename tool -> tool_name" in change
    got = {(r.conv_id, r.turn_idx): r.tool_name for r in t.snapshot_df().collect()}
    # data written under the OLD name reads under the new one — no rewrite
    assert got == {("c1", 0): None, ("c1", 1): "search"}
    assert "tool" not in t.snapshot_df().columns


def test_rename_key_and_stats_columns_follow(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.rename_column("conv_id", "conversation_id")
    t.rename_column("ts", "event_ts")
    assert t.bucket_key == "conversation_id"
    assert t.key_cols[0] == "conversation_id"
    assert t.stats_col == "event_ts"
    rows = t.snapshot_df().collect()
    assert {r.conversation_id for r in rows} == {"c1"}
    # point lookup still prunes to the renamed bucket key
    assert t.lookup("c1").count() == 2
    # time pruning still works against the renamed stats column
    assert t.snapshot_df(ts_min="2025-01-01 00:03:00").count() == 1


def test_drop_then_readd_does_not_resurrect(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.drop_column("tool")
    assert "tool" not in t.schema().names()
    # readd the same NAME -> fresh field ID; old bytes must stay dead
    import pyspark.sql.types as T_

    t.evolve_schema(T_.StructType([T_.StructField("tool", T_.StringType())]))
    got = {(r.conv_id, r.turn_idx): r.tool for r in t.snapshot_df().collect()}
    assert got == {("c1", 0): None, ("c1", 1): None}


def test_drop_protected_columns_refused(spark, tmp_path):
    t = _mk(spark, tmp_path)
    for col in ["conv_id", "turn_idx", "ts"]:
        with pytest.raises(ValueError):
            t.drop_column(col)
    with pytest.raises(ValueError):
        t.rename_column("role", "text")  # collision
    with pytest.raises(ValueError):
        t.rename_column("nope", "x")


def test_rename_survives_compaction_and_new_writes(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.rename_column("text", "content")
    # a post-rename write arrives under the NEW name (incoming resolution
    # is name-based, like the reference's diff) and upserts the same keys
    nb = _batch(spark, [
        ("U", "c1", 0, "user", "hello-v2", None, T("2025-01-01 00:00:00"),
         T("2025-01-01 00:10:00"), 3)]).withColumnRenamed("text", "content")
    apply_batch(t, nb, epoch=1)
    t.compact()
    got = {(r.conv_id, r.turn_idx): r.content for r in t.snapshot_df().collect()}
    assert got == {("c1", 0): "hello-v2", ("c1", 1): "world"}


def test_time_travel_reads_old_version(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v0 = t.version
    before = {(r.conv_id, r.turn_idx): r.text for r in t.snapshot_df().collect()}
    apply_batch(t, _batch(spark, [
        ("U", "c1", 0, "user", "rewritten", None, T("2025-01-01 00:00:00"),
         T("2025-01-01 00:10:00"), 3),
        ("D", "c1", 1, None, None, None, T("2025-01-01 00:05:00"),
         T("2025-01-01 00:10:01"), 4),
    ]), epoch=1)
    now = {(r.conv_id, r.turn_idx): r.text for r in t.snapshot_df().collect()}
    assert now == {("c1", 0): "rewritten"}

    old = t.as_of(v0)
    got = {(r.conv_id, r.turn_idx): r.text for r in old.snapshot_df().collect()}
    assert got == before  # pre-update, pre-delete state
    # pinned reader is read-only and stays pinned across refresh()
    old.refresh()
    assert old.version == v0
    with pytest.raises(RuntimeError):
        old.drop_column("tool")


def test_time_travel_sees_old_schema(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v0 = t.version
    t.rename_column("tool", "tool_name")
    assert "tool" in t.as_of(v0).snapshot_df().columns
    assert "tool_name" in t.snapshot_df().columns


def test_time_travel_expired_version_raises(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v0 = t.version
    for i in range(4):  # push v0 out of the retained window
        apply_batch(t, _batch(spark, [
            ("U", "c1", 0, "user", f"v{i}", None, T("2025-01-01 00:00:00"),
             T(f"2025-01-01 01:00:0{i}"), 10 + i)]), epoch=1 + i)
    t.vacuum(keep_meta_versions=2, min_age_seconds=0)
    with pytest.raises(FileNotFoundError, match="expired"):
        t.as_of(v0)


def test_struct_field_addition_evolves(spark, tmp_path):
    """Adding a field INSIDE an existing struct widens the column (the
    reference's embedded-context reality: SDK releases append ctx_*
    fields); rows written before the widening read back with NULL for
    the new inner field, NULL structs stay NULL, and inner leaves widen."""
    import datetime as dt

    from etl_spark.cdc.apply import apply_batch
    from etl_spark.cdc.engine import CdcEngine

    T_ = lambda s: dt.datetime.fromisoformat(s)
    eng = CdcEngine(spark, str(tmp_path / "t"), num_buckets=2)
    base = ("conv_id string, turn_idx int, role string, text string,"
            " tool string, ts timestamp, params struct<paid:int, level:int>,"
            " op string, op_ts timestamp, lsn long")
    b0 = spark.createDataFrame(
        [("c1", 0, "user", "a", None, T_("2025-01-01 00:00:00"),
          {"paid": 1, "level": 3}, "I", T_("2025-01-01 00:00:01"), 1),
         ("c2", 0, "user", "b", None, T_("2025-01-01 00:00:00"),
          None, "I", T_("2025-01-01 00:00:02"), 2)],
        base,
    )
    st = apply_batch(eng.table, b0, epoch=0)
    assert any(c.startswith("add params") for c in st.schema_changes)

    # epoch 1: params gains `vip` AND `paid` widens int -> bigint
    wide = base.replace("struct<paid:int, level:int>",
                        "struct<paid:bigint, level:int, vip:boolean>")
    b1 = spark.createDataFrame(
        [("c3", 0, "user", "c", None, T_("2025-01-02 00:00:00"),
          {"paid": 2**40, "level": 4, "vip": True},
          "I", T_("2025-01-02 00:00:01"), 3)],
        wide,
    )
    st1 = apply_batch(eng.table, b1, epoch=1)
    assert any(c.startswith("widen params") for c in st1.schema_changes)

    rows = {r["conv_id"]: r["params"]
            for r in eng.table.snapshot_df().collect()}
    assert rows["c1"]["paid"] == 1 and rows["c1"]["vip"] is None
    assert rows["c2"] is None            # NULL struct stays NULL
    assert rows["c3"]["paid"] == 2**40 and rows["c3"]["vip"] is True

    # incompatible inner change still refuses
    import pytest as _pytest

    bad = base.replace("struct<paid:int, level:int>",
                       "struct<paid:string, level:int>")
    b2 = spark.createDataFrame(
        [("c4", 0, "user", "d", None, T_("2025-01-03 00:00:00"),
          {"paid": "x", "level": 1}, "I", T_("2025-01-03 00:00:01"), 4)],
        bad,
    )
    with _pytest.raises(ValueError):
        apply_batch(eng.table, b2, epoch=2)


def test_struct_inner_void_field_skipped_then_heals(spark, tmp_path):
    """An all-NULL (void-inferred) inner struct field must not bake void
    into the table schema; when a later batch carries the real type the
    column widens normally (and an already-baked void leaf widens away)."""
    import datetime as dt

    from etl_spark.cdc.apply import apply_batch
    from etl_spark.cdc.engine import CdcEngine
    from etl_spark.lake.schema import widen_type

    T_ = lambda s: dt.datetime.fromisoformat(s)
    eng = CdcEngine(spark, str(tmp_path / "t"), num_buckets=2)
    base = ("conv_id string, turn_idx int, role string, text string,"
            " tool string, ts timestamp, params struct<paid:int>,"
            " op string, op_ts timestamp, lsn long")
    b0 = spark.createDataFrame(
        [("c1", 0, "user", "a", None, T_("2025-01-01 00:00:00"),
          {"paid": 1}, "I", T_("2025-01-01 00:00:01"), 1)], base)
    apply_batch(eng.table, b0, epoch=0)

    # epoch 1 carries params.vip as all-NULL → createDataFrame infers void;
    # the widen must SKIP it (no void in the table schema)
    voidy = base.replace("struct<paid:int>", "struct<paid:int, vip:void>")
    b1 = spark.createDataFrame(
        [("c2", 0, "user", "b", None, T_("2025-01-01 00:00:00"),
          {"paid": 2, "vip": None}, "I", T_("2025-01-01 00:00:02"), 2)], voidy)
    apply_batch(eng.table, b1, epoch=1)
    params_t = dict(zip(eng.table.schema().names(),
                        [f.type for f in eng.table.schema().fields]))
    assert "vip" not in str(params_t["params"])

    # epoch 2 carries the real type → widens cleanly (no (void,T) failure)
    typed = base.replace("struct<paid:int>", "struct<paid:int, vip:boolean>")
    b2 = spark.createDataFrame(
        [("c3", 0, "user", "c", None, T_("2025-01-01 00:00:00"),
          {"paid": 3, "vip": True}, "I", T_("2025-01-01 00:00:03"), 3)], typed)
    st = apply_batch(eng.table, b2, epoch=2)
    assert any("vip" in c for c in st.schema_changes), st.schema_changes
    got = {r.conv_id: r.params for r in eng.table.snapshot_df().collect()}
    assert got["c3"]["vip"] is True and got["c2"]["vip"] is None

    # direct widen_type: void heals in either direction
    import pyspark.sql.types as Ty
    assert widen_type(Ty.NullType(), Ty.StringType()) == Ty.StringType()
    assert widen_type(Ty.StringType(), Ty.NullType()) == Ty.StringType()
