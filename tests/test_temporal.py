"""AS-OF join edge semantics (operators/temporal.py)."""

import datetime as dt

import pytest

from etl_spark.operators.temporal import asof_join

T = lambda s: dt.datetime.fromisoformat(s)


@pytest.fixture()
def frames(spark):
    probe = spark.createDataFrame(
        [("k1", T("2025-01-01 10:00:00"), 1),
         ("k1", T("2025-01-01 12:00:00"), 2),
         ("k1", T("2025-01-01 09:00:00"), 3),   # before any build row
         ("k2", T("2025-01-01 10:00:00"), 4)],  # key with no build rows
        "k string, ts timestamp, eid int",
    )
    build = spark.createDataFrame(
        [("k1", T("2025-01-01 10:00:00"), 10, "a"),
         ("k1", T("2025-01-01 11:00:00"), 11, None)],  # NULL payload col
        "k string, bts timestamp, bid int, tag string",
    )
    return probe, build


def test_asof_semantics(spark, frames):
    probe, build = frames
    got = {
        r["eid"]: (r["bid"], r["tag"])
        for r in asof_join(probe, build, ["k"], "ts", "bts").collect()
    }
    assert got[1] == (10, "a")      # equal ts: at-or-before includes it
    assert got[2] == (11, None)     # latest row wins ATOMICALLY: its NULL
    #                                 tag must NOT backfill from row 10
    assert got[3] == (None, None)   # probe before any build row
    assert got[4] == (None, None)   # key never built


def test_asof_build_tie_break(spark):
    probe = spark.createDataFrame(
        [("k", T("2025-01-01 10:00:00"), 1)], "k string, ts timestamp, eid int"
    )
    build = spark.createDataFrame(
        [("k", T("2025-01-01 09:00:00"), 5, "lo"),
         ("k", T("2025-01-01 09:00:00"), 9, "hi")],
        "k string, bts timestamp, bid int, tag string",
    )
    got = asof_join(
        probe, build, ["k"], "ts", "bts", dedup_order=["bid"]
    ).collect()
    assert len(got) == 1 and got[0]["bid"] == 9 and got[0]["tag"] == "hi"


def test_asof_rejects_ambiguous_columns(spark, frames):
    probe, build = frames
    bad = build.withColumnRenamed("bid", "eid")
    with pytest.raises(ValueError):
        asof_join(probe, bad, ["k"], "ts", "bts")
    # a build PAYLOAD column named like the probe's ts column would emit
    # two identically-named output columns (probe_ts + the bcol)
    bad_ts = build.withColumnRenamed("bid", "ts")
    with pytest.raises(ValueError, match="ambiguous"):
        asof_join(probe, bad_ts, ["k"], "ts", "bts")


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_asof_matches_bruteforce(spark, seed):
    """Random small instances vs a per-row brute-force reference."""
    import random

    rng = random.Random(seed)
    keys = ["a", "b", "c"]
    probe_rows = [
        (rng.choice(keys), T("2025-01-01 00:00:00") + dt.timedelta(minutes=rng.randrange(0, 120)), i)
        for i in range(40)
    ]
    build_rows = [
        (rng.choice(keys), T("2025-01-01 00:00:00") + dt.timedelta(minutes=m), 100 + m, f"v{m}")
        for m in rng.sample(range(0, 120), 25)  # unique ts per key not guaranteed across keys — fine
    ]
    probe = spark.createDataFrame(probe_rows, "k string, ts timestamp, eid int")
    build = spark.createDataFrame(build_rows, "k string, bts timestamp, bid int, tag string")
    got = {
        r["eid"]: (r["bid"], r["tag"])
        for r in asof_join(probe, build, ["k"], "ts", "bts").collect()
    }
    for k, ts, eid in probe_rows:
        cands = [(bts, bid, tag) for bk, bts, bid, tag in build_rows
                 if bk == k and bts <= ts]
        want = (None, None) if not cands else max(cands)[1:]
        assert got[eid] == want, (eid, got[eid], want)
