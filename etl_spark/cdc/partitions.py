"""Event-time partition lifecycle: close / force-close day partitions.

Reference analogue: the partition-close sensor
(/root/reference/etl/dags/user_history/event_partition.py:28-63) — a day
partition is declared COMPLETE when the stream's watermark has advanced
past the day's end plus an allowed-lateness margin (min collector_tstamp
of the last hour is already beyond the deadline), or FORCE-closed when
wall-clock passes ``force_close_after`` past the day's end with no such
evidence (PARTITION_FORCE_CLOSE_AFTER_MIDNIGHT_HOURS = 12).

Engine shape: the watermark is the table's committed high-water mark
(op_ts max per source, already maintained by the apply path), the set of
candidate days comes straight from the ``_day=`` leaves in table
metadata (no data scan at all — this is a metadata-only operator), and a
close is recorded as a metadata commit so downstream consumers (rollup
refreshes, exports) can trigger exactly once per closed day. Late rows
landing in an already-closed day don't reopen it — they are flagged by
the apply's lineage (T3) and the closed-marks record the restatement
the way the reference re-runs D-2/D-1 aggregates.
"""

from __future__ import annotations

import datetime as dt
import json
import time

from ..lake.table import LakeTable

WATERMARK_CLOSE = "watermark"
FORCE_CLOSE = "forced"


def _day_of(entry_path: str) -> str | None:
    for part in entry_path.split("/"):
        if part.startswith("_day=") and not part.endswith("__HIVE_DEFAULT_PARTITION__"):
            return part[len("_day="):]
    return None


def list_days(table: LakeTable) -> list[str]:
    """All event-time days present in the table — read from metadata leaf
    paths, zero data scanned."""
    days = set()
    for slot in table._meta["files"].values():
        for e in table._base_entries(slot) + slot["deltas"]:
            d = _day_of(e["path"])
            if d:
                days.add(d)
    return sorted(days)


def closed_partitions(table: LakeTable) -> dict[str, dict]:
    """day → {"closed_at": epoch_s, "mode": watermark|forced, "watermark": str|None}"""
    return dict(table._meta.get("closed_partitions", {}))


def close_due_partitions(
    table: LakeTable,
    now: dt.datetime | None = None,
    allowed_lateness_hours: float = 2.0,
    force_close_after_hours: float = 12.0,
    source: str | None = None,
) -> list[dict]:
    """Close every open day partition whose deadline has passed.

    A day D (UTC, [D 00:00, D+1 00:00)) closes when:
      * WATERMARK rule: the committed watermark ≥ D+1 00:00 +
        ``allowed_lateness_hours`` — the stream has provably moved past
        the day (reference: min collector_tstamp beyond deadline), or
      * FORCE rule: ``now`` ≥ D+1 00:00 + ``force_close_after_hours`` —
        give up waiting (reference: 12 h after midnight, no-data case).

    Returns the list of newly closed marks (also committed to table
    metadata, atomically, and therefore exactly-once per day).
    """
    table.refresh()
    # naive-UTC to stay comparable with fromisoformat() day boundaries
    now = now or dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    wm_s = table.watermark(source) if source else table.watermark_any()
    wm = dt.datetime.fromisoformat(wm_s) if wm_s else None
    already = closed_partitions(table)
    newly: list[dict] = []
    for day in list_days(table):
        if day in already:
            continue
        day_end = dt.datetime.fromisoformat(day) + dt.timedelta(days=1)
        mark = None
        if wm is not None and wm >= day_end + dt.timedelta(hours=allowed_lateness_hours):
            mark = {"mode": WATERMARK_CLOSE, "watermark": wm_s}
        elif now >= day_end + dt.timedelta(hours=force_close_after_hours):
            mark = {"mode": FORCE_CLOSE, "watermark": wm_s}
        if mark:
            mark.update(
                {
                    "day": day,
                    "closed_at": time.time(),
                    # leaves known at close time: the baseline that makes
                    # later restatements detectable from metadata alone
                    "leaves": sorted(_leaves_for_day(table, day)),
                }
            )
            newly.append(mark)
    if newly:
        # optimistic-retry like every other commit path: the close job
        # runs alongside streaming applies, so losing the metadata-version
        # race is routine, and the closed_partitions merge is trivially
        # rebasable onto fresh state. A racing CLOSER may have closed some
        # of our days first — exactly-once per day means their mark wins.
        from ..lake.table import CommitConflictError, ConcurrentCommitError

        for _attempt in range(table.MAX_COMMIT_RETRIES):
            meta = json.loads(json.dumps(table._meta))
            cp = meta.setdefault("closed_partitions", {})
            newly = [m for m in newly if m["day"] not in cp]
            if not newly:
                break
            for m in newly:
                cp[m["day"]] = {k: v for k, v in m.items() if k != "day"}
            try:
                table._commit_meta(meta)
                break
            except ConcurrentCommitError:
                table.refresh()
        else:
            raise CommitConflictError(
                f"close_due_partitions lost the metadata race "
                f"{table.MAX_COMMIT_RETRIES} times — giving up"
            )
    return newly


def _is_null_day(entry_path: str) -> bool:
    """A leaf in the hive default partition: rows whose event time is
    NULL — canonically, payload-less deletes (a Debezium-style tombstone
    carries no row image, so no ts). Such a leaf can tombstone a key in
    ANY day partition."""
    return "_day=__HIVE_DEFAULT_PARTITION__" in entry_path


def _null_day_delta_leaves_ever(table: LakeTable) -> set[str]:
    """Every NULL-day DELTA leaf ever committed: the monotone
    ``null_day_delta_log`` (written at commit time, survives compaction
    folding the leaf out of live metadata) union the live scan (tables
    whose metadata predates the log field)."""
    out = set(table._meta.get("null_day_delta_log", []))
    for slot in table._meta["files"].values():
        for e in slot["deltas"]:
            if _is_null_day(e["path"]):
                out.add(e["path"])
    return out


def _leaves_for_day(table: LakeTable, day: str) -> list[str]:
    out = []
    for slot in table._meta["files"].values():
        for e in table._base_entries(slot) + slot["deltas"]:
            if _day_of(e["path"]) == day or _is_null_day(e["path"]):
                # NULL-day leaves join every day's close baseline: they
                # can affect any day, so a PRE-existing one must not read
                # as new data after the close
                out.append(e["path"])
    # PRE-existing NULL-day leaves already folded away by compaction must
    # also not read as new data after the close — baseline from the
    # monotone log, not just live metadata
    out.extend(_null_day_delta_leaves_ever(table))
    return sorted(set(out))


def restatements(table: LakeTable) -> list[dict]:
    """Closed days that have since received new data — the reference's
    late-restatement situation (DAG_external_source.py:132-224 re-runs
    D-2/D-1/D aggregates). Detected from metadata only: any DELTA leaf
    for a closed day that was not yet present when the day closed.
    (Base leaves are excluded: compaction rewrites the same rows into a
    new base, which is not new data.) Downstream rollups use this to
    know which closed days to re-state.

    A new delta leaf in the NULL-day partition (``_is_null_day``)
    restates EVERY closed day: it holds payload-less deletes, and a
    tombstone with no event time can kill a row in any day partition —
    without this, a NULL-ts delete left the victim day's published
    rollup stale forever (found by the rollup property soak). Deletes
    that carry the victim's image (and therefore its ts) keep restating
    only their own day; emit those when wide re-derives matter.

    NULL-day detection walks the monotone commit-time log
    (``_null_day_delta_leaves_ever``), not just live metadata: a NULL-day
    leaf folded away by auto-compaction between two polls would otherwise
    vanish from this report while its tombstones silently restate closed
    days. Leaves present at close time sit in the close baseline and stay
    excluded either way."""
    closed = closed_partitions(table)
    out = []
    for slot in table._meta["files"].values():
        for e in slot["deltas"]:
            d = _day_of(e["path"])
            if d and d in closed and e["path"] not in set(closed[d].get("leaves", [])):
                out.append({"day": d, "leaf": e["path"], "closed": closed[d]})
    for path in sorted(_null_day_delta_leaves_ever(table)):
        for day, mark in closed.items():
            if path not in set(mark.get("leaves", [])):
                out.append({"day": day, "leaf": path, "closed": mark})
    return sorted(out, key=lambda r: (r["day"], r["leaf"]))
