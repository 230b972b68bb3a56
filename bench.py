#!/usr/bin/env python
"""Benchmark harness — driver contract.

Runs, on ``local[$SPARK_GRAFT_CPUS]`` against ``$SPARK_GRAFT_SF_DIR``
(default ``/root/testdata/sf0.1``):

  1. **cdc_replay** — the engine's headline: full replay of a
     deterministic, sf-scaled CDC change log (generated untimed into a
     temp dir) through the exactly-once MERGE path into a fresh
     LakeTable. This is the north-rule metric: change-events/sec of
     end-to-end upsert throughput, lineage recording included.
  2. every registered operator-coverage query from ``etl_spark.queries``,
     executed to completion with a ``noop`` sink (no driver collect).

Every timing is the better of two runs: the sandbox host shows episodic
CPU steal (BASELINE.md "host steal" notes — identical replays measured
2-4x apart minutes from each other), so a single-shot timing measures
the co-tenant as much as the engine. min-of-2 also means the suite's
second pass runs warm, consistent with the replay's untimed warm-up.

Prints exactly ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {"cdc_replay": sec, "<qname>": sec, ...}, "sf": ...,
   "cdc": {"events": N, "events_per_s": ..., "epochs": ...},
   "host_health": {"start": {...}, "end": {...}},   # memcpy GB/s + loadavg
   "spread": {"<qname>": [rep1_s, rep2_s, ...]}}    # every rep, not just min

Scaling-efficiency evidence (local[8] vs local[32]) lives in
``scripts/scaling.py`` (subprocess per parallelism level); results are
recorded in BASELINE.md — not rerun here to keep the per-round bench fast.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import tempfile
import time


def _sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.1


def _host_health() -> dict:
    """One host-regime reading: the declared 200 MB single-core memcpy
    probe (scripts/health_gate.py — >=5 GB/s is the healthy-window floor
    used by the scaling protocol since round 4) plus 1/5/15-min loadavg.
    Embedded in the bench JSON so a reader can tell an engine regression
    from a degraded-host window WITHOUT forensics against BASELINE.md:
    round 4's 17-entry sub-second noise cluster was only explainable
    after the fact because the artifact carried no health signal."""
    import importlib.util

    out: dict = {}
    try:
        hg_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "scripts", "health_gate.py")
        spec = importlib.util.spec_from_file_location("health_gate", hg_path)
        hg = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(hg)
        p = hg.probe()
        out["memcpy_gb_s"] = p["steady_state_gb_s"]
        out["memcpy_samples_gb_s"] = p["samples_gb_s"]
        out["healthy"] = p["steady_state_gb_s"] >= 5.0
    except Exception as exc:  # a broken probe must never fail the bench
        out["probe_error"] = f"{type(exc).__name__}: {exc}"
    try:
        out["loadavg"] = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        pass
    return out


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = _sf_from_dir(sf_dir)

    from etl_spark.session import get_spark

    spark = get_spark("etl_spark_bench")

    from etl_spark.cdc.engine import CdcEngine
    from etl_spark.datagen import write_change_log
    from etl_spark.queries import QUERIES

    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}  # every rep, not just the min
    health = {"start": _host_health()}
    work = tempfile.mkdtemp(prefix="etl_spark_bench_")
    try:
        # -- 1. CDC replay (untimed generation, timed apply) -------------
        # Epochs sized ~1M events: per-epoch fixed cost (job scheduling,
        # meta commit) amortizes like a real large-batch ingest; the 100 TB
        # operating point is huge micro-batches, not thousands of tiny ones.
        n_events = max(100_000, int(40_000_000 * sf))
        n_convs = max(200, int(n_events / 2_000))
        n_epochs = 4
        log_dir = os.path.join(work, "changes")
        write_change_log(
            spark, log_dir, n_events,
            n_convs=n_convs, n_epochs=n_epochs, evolve_from_epoch=n_epochs - 1,
        )

        # untimed JIT warm-up (full pass): a long-running ingest never pays
        # codegen/JIT per batch, so steady-state is the honest statistic
        warm = CdcEngine(spark, os.path.join(work, "warm"), num_buckets=32)
        warm.replay(log_dir)

        # min-of-3 for the HEADLINE metric: the sandbox host shows episodic
        # steal (documented in BASELINE.md) that can inflate any single run
        # 2-4x; the best of three timed replays measures the engine, not
        # the co-tenant (operator queries below stay min-of-2 — same
        # protection, 57x cheaper to buy)
        replay_s, results, eng = None, None, None
        spread["cdc_replay"] = []
        for rep in range(3):
            e = CdcEngine(spark, os.path.join(work, f"table{rep}"), num_buckets=32)
            t0 = time.time()
            r = e.replay(log_dir)
            dt = time.time() - t0
            spread["cdc_replay"].append(round(dt, 3))
            if replay_s is None or dt < replay_s:
                replay_s, results, eng = dt, r, e
        timings["cdc_replay"] = round(replay_s, 3)
        cdc_stats = {
            "events": n_events,
            "epochs": len(results),
            "events_per_s": round(n_events / replay_s, 1),
            "final_rows": int(eng.table.snapshot_df().count()),
            "timing": "min-of-3 (see BASELINE.md host-steal note)",
        }

        # -- 2. operator-coverage query suite (min-of-2 each) -------------
        for name in sorted(QUERIES):
            best = None
            spread[name] = []
            for _rep in range(2):
                t0 = time.time()
                QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                spread[name].append(round(dt, 3))
                best = dt if best is None or dt < best else best
            timings[name] = round(best, 3)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    health["end"] = _host_health()
    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "total_sec (cdc replay + operator query suite)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cdc": cdc_stats,
        # self-interpreting artifact (round-5 verdict item 1): the host
        # regime at start/end plus every entry's full rep list — a
        # reader separates engine regressions (min moved, healthy probe)
        # from host noise (wide spread / failing probe) from the
        # artifact alone
        "host_health": health,
        "spread": spread,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
