#!/usr/bin/env python
"""Single-core memory-bandwidth health gate for the scaling protocol.

The declared launch precondition for every scaling run since round-4 run 4
(BASELINE.md "Round-4 supplementary scaling run" onward): a single-core
``numpy.copyto`` over a 200 MB buffer must sustain >= 5 GB/s steady-state
before a measurement run may be launched. This sandbox VM shares DRAM with
co-tenants; degraded windows (measured as low as 0.12-0.72 GB/s during
round-4 run 1) suppress the 16-core level's throughput far more than the
4-core level's and mechanically bias the efficiency ratio downward.

Buffer size matters and is part of the declaration: a 512 MB buffer reads
~8 GB/s on this host in the same window a 200 MB buffer reads ~17 GB/s
(TLB/page-locality regime change), so gate readings are only comparable
under the declared 200 MB probe.

Usage: python scripts/health_gate.py [--floor 5.0] [--samples 8]
Prints one JSON line; exit 0 iff steady-state (median of samples after the
first) >= floor.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def probe(mb: int = 200, samples: int = 8) -> dict:
    """One health reading under the declared protocol. Importable so
    bench.py can embed the same probe in its JSON artifact (round-5
    verdict item 1: self-interpreting bench output)."""
    n = mb * 1024 * 1024
    src = np.ones(n, dtype=np.uint8)
    dst = np.empty(n, dtype=np.uint8)
    rates = []
    for _ in range(samples):
        t0 = time.perf_counter()
        np.copyto(dst, src)
        dt = time.perf_counter() - t0
        rates.append(round(n / dt / 1e9, 2))
    steady = sorted(rates[1:])[len(rates[1:]) // 2]  # median excluding sample 0
    return {
        "buffer_mb": mb,
        "samples_gb_s": rates,
        "steady_state_gb_s": steady,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--floor", type=float, default=5.0, help="GB/s floor")
    ap.add_argument("--samples", type=int, default=8)
    ap.add_argument("--mb", type=int, default=200, help="buffer size (declared: 200)")
    args = ap.parse_args()

    out = probe(mb=args.mb, samples=args.samples)
    ok = out["steady_state_gb_s"] >= args.floor
    out.update({"floor_gb_s": args.floor, "gate": "PASS" if ok else "FAIL"})
    print(json.dumps(out))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
