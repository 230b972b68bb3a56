"""Partial-update (patch-style) CDC materialization semantics."""

import datetime as dt
import random

import pytest

from etl_spark.cdc.apply import apply_batch
from etl_spark.cdc.engine import CHANGE_SCHEMA, CdcEngine
from etl_spark.cdc.partial import materialize_partial

T = lambda s: dt.datetime.fromisoformat(s)


def _batch(spark, rows):
    return spark.createDataFrame(rows, schema=CHANGE_SCHEMA)


def _apply_patches(spark, table, rows, epoch):
    return apply_batch(table, materialize_partial(table, _batch(spark, rows)), epoch)


def _state(t):
    return {
        (r.conv_id, r.turn_idx): (r.role, r.text, r.tool)
        for r in t.snapshot_df().collect()
    }


def test_two_patches_merge_column_wise(spark, tmp_path):
    eng = CdcEngine(spark, str(tmp_path / "t"), num_buckets=2)
    t = eng.table
    apply_batch(t, _batch(spark, [
        ("I", "a", 0, "user", "orig-text", "orig-tool", T("2025-01-01 00:00:00"),
         T("2025-01-01 00:00:01"), 1)]), epoch=0)
    # one batch, two patches touching DIFFERENT columns of the same key
    _apply_patches(spark, t, [
        ("U", "a", 0, None, "patched-text", None, None, T("2025-01-01 01:00:00"), 2),
        ("U", "a", 0, None, None, "patched-tool", None, T("2025-01-01 01:00:01"), 3),
    ], epoch=1)
    assert _state(t) == {("a", 0): ("user", "patched-text", "patched-tool")}


def test_patch_fills_from_committed_row(spark, tmp_path):
    eng = CdcEngine(spark, str(tmp_path / "t"), num_buckets=2)
    t = eng.table
    apply_batch(t, _batch(spark, [
        ("I", "a", 0, "assistant", "v1", "search", T("2025-01-01 00:00:00"),
         T("2025-01-01 00:00:01"), 1)]), epoch=0)
    _apply_patches(spark, t, [
        ("U", "a", 0, None, "v2", None, None, T("2025-01-01 01:00:00"), 2),
    ], epoch=1)
    # unpatched columns (role, tool, ts) carried from the committed row
    got = t.snapshot_df().first()
    assert (got.role, got.text, got.tool) == ("assistant", "v2", "search")
    assert got.ts == T("2025-01-01 00:00:00")


def test_delete_in_batch_resets_fold(spark, tmp_path):
    eng = CdcEngine(spark, str(tmp_path / "t"), num_buckets=2)
    t = eng.table
    apply_batch(t, _batch(spark, [
        ("I", "a", 0, "user", "old-text", "old-tool", T("2025-01-01 00:00:00"),
         T("2025-01-01 00:00:01"), 1)]), epoch=0)
    # patch BEFORE the delete is dead; patch AFTER starts a fresh row
    _apply_patches(spark, t, [
        ("U", "a", 0, None, "pre-delete-patch", None, None, T("2025-01-01 01:00:00"), 2),
        ("D", "a", 0, None, None, None, None, T("2025-01-01 02:00:00"), 3),
        ("U", "a", 0, None, "post-delete-text", None, None, T("2025-01-01 03:00:00"), 4),
    ], epoch=1)
    # fresh row: only the post-delete patched column; old-tool must NOT
    # resurrect (delete reset), and the committed pre-delete row must not
    # leak through the fill either
    assert _state(t) == {("a", 0): (None, "post-delete-text", None)}


def test_batch_ending_in_delete_tombstones(spark, tmp_path):
    eng = CdcEngine(spark, str(tmp_path / "t"), num_buckets=2)
    t = eng.table
    apply_batch(t, _batch(spark, [
        ("I", "a", 0, "user", "x", None, T("2025-01-01 00:00:00"),
         T("2025-01-01 00:00:01"), 1)]), epoch=0)
    _apply_patches(spark, t, [
        ("U", "a", 0, None, "patched", None, None, T("2025-01-01 01:00:00"), 2),
        ("D", "a", 0, None, None, None, None, T("2025-01-01 02:00:00"), 3),
    ], epoch=1)
    assert _state(t) == {}


def test_late_patch_batch_loses_lww(spark, tmp_path):
    eng = CdcEngine(spark, str(tmp_path / "t"), num_buckets=2)
    t = eng.table
    apply_batch(t, _batch(spark, [
        ("U", "a", 0, "user", "newest", None, T("2025-01-01 00:00:00"),
         T("2025-01-01 05:00:00"), 10)]), epoch=0)
    _apply_patches(spark, t, [
        ("U", "a", 0, None, "stale-patch", None, None, T("2025-01-01 01:00:00"), 2),
    ], epoch=1)
    assert _state(t) == {("a", 0): ("user", "newest", None)}


def test_patch_on_absent_key_inserts_sparse_row(spark, tmp_path):
    eng = CdcEngine(spark, str(tmp_path / "t"), num_buckets=2)
    t = eng.table
    _apply_patches(spark, t, [
        ("U", "zzz", 3, None, "only-text", None, None, T("2025-01-01 01:00:00"), 1),
    ], epoch=0)
    assert _state(t) == {("zzz", 3): (None, "only-text", None)}


def test_equivalence_with_full_images(spark, tmp_path):
    """Synthesize patches by splitting full updates into per-column
    events; the materialized replay must equal the full-image replay."""
    full_rows = [
        ("I", "c1", 0, "user", "t0", "tool0", T("2025-01-01 00:00:00"),
         T("2025-01-01 00:00:01"), 1),
        ("U", "c1", 0, "user", "t1", "tool0", T("2025-01-01 00:00:00"),
         T("2025-01-01 01:00:00"), 2),
        ("U", "c1", 0, "user", "t1", "tool2", T("2025-01-01 00:00:00"),
         T("2025-01-01 02:00:00"), 3),
    ]
    a = CdcEngine(spark, str(tmp_path / "full"), num_buckets=2)
    apply_batch(a.table, _batch(spark, full_rows), epoch=0)

    b = CdcEngine(spark, str(tmp_path / "patch"), num_buckets=2)
    apply_batch(b.table, _batch(spark, full_rows[:1]), epoch=0)  # seed insert
    _apply_patches(spark, b.table, [
        ("U", "c1", 0, None, "t1", None, None, T("2025-01-01 01:00:00"), 2),
        ("U", "c1", 0, None, None, "tool2", None, T("2025-01-01 02:00:00"), 3),
    ], epoch=1)
    assert _state(a.table) == _state(b.table)


@pytest.mark.parametrize("seed", [11, 23, 37])
def test_ordered_batch_split_independence(spark, tmp_path, seed):
    """For an IN-ORDER patch stream, the engine's result is independent of
    how the stream is split into batches, and equals a sequential
    one-event-at-a-time model (full image replaces; patch merges
    non-NULLs; delete clears). Out-of-order batches intentionally
    diverge (row-LWW, not column-CRDT) and are covered elsewhere."""
    rng = random.Random(seed)
    keys = [("k", i) for i in range(4)]
    cols = ["role", "text", "tool"]
    events = []
    for lsn in range(1, 61):
        conv, turn = rng.choice(keys)
        ts = T(f"2025-01-01 00:00:00") + dt.timedelta(seconds=lsn)
        kind = rng.random()
        if kind < 0.12:
            events.append(("D", conv, turn, None, None, None, None, ts, lsn))
        elif kind < 0.45:  # full image
            events.append(("U", conv, turn, f"r{lsn}", f"t{lsn}", f"o{lsn}",
                           T("2025-01-01 00:00:00"), ts, lsn))
        else:  # patch: random non-empty column subset
            vals = {c: (f"{c}{lsn}" if rng.random() < 0.5 else None) for c in cols}
            if not any(vals.values()):
                vals["text"] = f"text{lsn}"
            events.append(("U", conv, turn, vals["role"], vals["text"], vals["tool"],
                           None, ts, lsn))

    # sequential reference model
    model = {}
    for op, conv, turn, role, text, tool, ts, op_ts, lsn in events:
        k = (conv, turn)
        if op == "D":
            model.pop(k, None)
        else:
            cur = model.get(k, (None, None, None))
            model[k] = (role or cur[0], text or cur[1], tool or cur[2])

    # engine: random in-order batch split, every batch via materialize_partial
    eng = CdcEngine(spark, str(tmp_path / "t"), num_buckets=2)
    i, epoch = 0, 0
    while i < len(events):
        n = rng.randint(1, 9)
        _apply_patches(spark, eng.table, events[i:i + n], epoch)
        i += n
        epoch += 1
    assert _state(eng.table) == model
