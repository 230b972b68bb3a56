"""Debezium envelope adapter: parse semantics, corrupt routing, and
end-to-end envelope-wire → apply_batch → LWW state."""

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from etl_spark.cdc.apply import apply_batch
from etl_spark.cdc.engine import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA, CdcEngine
from etl_spark.cdc.envelope import parse_debezium, to_debezium

T = lambda s: dt.datetime.fromisoformat(s)

ENV = (
    '{"payload": {"before": %s, "after": %s, "op": "%s", "ts_ms": %d,'
    ' "source": {"lsn": %d}}}'
)
ROW = '{"conv_id": "c1", "turn_idx": %d, "role": "user", "text": "%s", "ts": "2025-01-01T00:00:00Z"}'


def _wire(spark, lines):
    return spark.createDataFrame([(l,) for l in lines], ["value"])


def test_parse_op_mapping_and_images(spark):
    lines = [
        ENV % ("null", ROW % (0, "created"), "c", 1000, 1),
        ENV % ("null", ROW % (0, "updated"), "u", 2000, 2),
        ENV % (ROW % (1, "doomed"), "null", "d", 3000, 3),
        ENV % ("null", ROW % (2, "snapshot"), "r", 4000, 4),
    ]
    got = {
        (r.op, r.turn_idx): (r.text, r.op_ts, r.lsn)
        for r in parse_debezium(_wire(spark, lines), TRANSCRIPT_SCHEMA).collect()
    }
    assert got[("I", 0)] == ("created", T("1970-01-01 00:00:01"), 1)
    assert got[("U", 0)] == ("updated", T("1970-01-01 00:00:02"), 2)
    # delete takes the BEFORE image (keeps event time for pruning stats)
    assert got[("D", 1)] == ("doomed", T("1970-01-01 00:00:03"), 3)
    assert got[("I", 2)][0] == "snapshot"  # snapshot-read 'r' -> I


def test_corrupt_rows_flagged_not_dropped(spark):
    lines = [
        ENV % ("null", ROW % (0, "ok"), "c", 1000, 1),
        "{not json at all",
        ENV % ("null", ROW % (1, "no-op-field"), "x", 2000, 2),
        '{"payload": {"op": "c", "ts_ms": null, "source": null}}',
    ]
    flagged = parse_debezium(_wire(spark, lines), TRANSCRIPT_SCHEMA, keep_corrupt=True)
    assert flagged.count() == 4
    assert flagged.where("_corrupt").count() == 3
    clean = parse_debezium(_wire(spark, lines), TRANSCRIPT_SCHEMA)
    assert [r.text for r in clean.collect()] == ["ok"]


def test_roundtrip_preserves_millis(spark):
    src = spark.createDataFrame(
        [("I", "c1", 0, "user", "t", None, T("2025-03-01 12:34:56.789000"),
          T("2025-03-01 12:34:56.789000"), 7)],
        schema=CHANGE_SCHEMA,
    )
    wire = to_debezium(src, [f.name for f in TRANSCRIPT_SCHEMA.fields])
    back = parse_debezium(wire, TRANSCRIPT_SCHEMA).first()
    assert back.op_ts == T("2025-03-01 12:34:56.789000")
    assert back.ts == T("2025-03-01 12:34:56.789000")


def test_envelope_wire_to_table_state(spark, tmp_path):
    """Full front door: envelope JSON lines → parse → apply → snapshot."""
    lines = [
        ENV % ("null", ROW % (0, "v1"), "c", 1000, 1),
        ENV % ("null", ROW % (0, "v2"), "u", 2000, 2),  # LWW winner for turn 0
        ENV % ("null", ROW % (1, "alive"), "c", 1000, 3),
        ENV % (ROW % (1, "alive"), "null", "d", 3000, 4),  # then deleted
        ENV % ("null", ROW % (0, "late-loser"), "u", 1500, 5),  # older op_ts
    ]
    changes = parse_debezium(_wire(spark, lines), TRANSCRIPT_SCHEMA)
    eng = CdcEngine(spark, str(tmp_path / "tbl"), num_buckets=2)
    apply_batch(eng.table, changes, epoch=0)
    got = {(r.conv_id, r.turn_idx): r.text for r in eng.table.snapshot_df().collect()}
    assert got == {("c1", 0): "v2"}


def test_streaming_debezium_tail(spark, tmp_path):
    """Binlog tail in wire format: newline-delimited envelope JSON files
    streamed through parse_debezium -> exactly-once apply; a restarted
    stream picks up only newly landed files."""
    from etl_spark.cdc.envelope import to_debezium
    from etl_spark.datagen import gen_changes

    log = str(tmp_path / "wire")
    changes = gen_changes(spark, 4_000, n_convs=60, n_epochs=2)
    cols = [f.name for f in TRANSCRIPT_SCHEMA.fields]
    for e in range(2):
        (to_debezium(changes.where(F.col("epoch") == e).drop("epoch"), cols)
         .repartition(2).write.mode("overwrite").text(f"{log}/epoch={e}"))

    eng = CdcEngine(spark, str(tmp_path / "tbl"), num_buckets=4)
    q = eng.stream(log, str(tmp_path / "ckpt"), wire_format="debezium")
    q.processAllAvailable()
    q.stop()

    # oracle: LWW argmax over the ORIGINAL typed change rows (envelope
    # serialization truncates op_ts to millis, which gen_changes already
    # quantizes — roundtrip is lossless here)
    from etl_spark.cdc.dedup import lww_dedup_window

    exp = (
        lww_dedup_window(changes.drop("epoch"), key=["conv_id", "turn_idx"],
                         order=["op_ts", "lsn"])
        .where(F.col("op") != "D")
    )
    got = {(r.conv_id, r.turn_idx): r.text for r in eng.table.snapshot_df().collect()}
    want_rows = {(r.conv_id, r.turn_idx): r.text for r in exp.collect()}
    assert got == want_rows


def test_missing_image_rows_flagged_corrupt(spark):
    """A structurally valid envelope whose row image is missing (u with
    after=null, or d with before=null — REPLICA IDENTITY NOTHING
    upstream) parses to NULL key columns; it must be flagged corrupt, not
    passed through to collapse into one bogus NULL-key LWW group."""
    lines = [
        ENV % ("null", ROW % (0, "ok"), "c", 1000, 1),
        ENV % ("null", "null", "u", 2000, 2),   # update, image lost
        ENV % ("null", "null", "d", 3000, 3),   # delete, no before-image
        # partial image: turn_idx present but conv_id null
        ENV % ("null",
               '{"conv_id": null, "turn_idx": 4, "role": "user",'
               ' "text": "halfkey", "ts": "2025-01-01T00:00:00Z"}',
               "u", 4000, 4),
    ]
    flagged = parse_debezium(_wire(spark, lines), TRANSCRIPT_SCHEMA, keep_corrupt=True)
    assert flagged.count() == 4
    assert flagged.where("_corrupt").count() == 3
    clean = parse_debezium(_wire(spark, lines), TRANSCRIPT_SCHEMA)
    assert [r.text for r in clean.collect()] == ["ok"]
    # key_cols names absent from the payload schema are ignored
    loose = parse_debezium(
        _wire(spark, lines), TRANSCRIPT_SCHEMA,
        keep_corrupt=True, key_cols=("not_a_column",),
    )
    assert loose.where("_corrupt").count() == 0
