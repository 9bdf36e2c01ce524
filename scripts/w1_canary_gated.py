#!/usr/bin/env python
"""W1 (pages rollup) N-vs-4N sample with per-leg canary gating.

The cross-round record (27 attempts, BASELINE.md) shows the standard
scaling_bench artifact's short array-probe bursts systematically
invalidate exactly the samples whose WORKLOAD legs ran clean: the
steal regime flickers at ~minute granularity, so a 10 s probe beside a
15 s workload leg frequently samples a different regime than the leg
itself. This protocol replaces the burst probe with the steal canary
(scripts/steal_canary.py's kernel — the instrument every clean-window
artifact in BASELINE.md is already gated on) measured IMMEDIATELY
around each leg:

    canary -> rollup@8 (own JVM) -> canary -> rollup@32 (own JVM) -> canary

A sample is VALID iff all three canary ratios <= GATE (default 1.20).
The raw efficiency (t8/t32)/4 of a valid sample needs no hardware
normalization argument: both legs demonstrably ran in the same clean
window. Workload, input (102.4M-row pages parquet) and timing method
are byte-identical to scaling_bench's W1 lane, so samples are
comparable with the existing ledger.

Usage: python scripts/w1_canary_gated.py [> out.json]
Exit 0 = valid sample, 3 = window dirty (sample recorded, marked invalid).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

GATE = float(os.environ.get("W1_CANARY_GATE", "1.20"))


def _kernel(_):
    # same sustained-FP kernel as scripts/steal_canary.py
    x = np.random.default_rng(0).standard_normal(200_000)
    s = 0.0
    for _ in range(150):
        s += float(np.convolve(x[:65536], x[:1024], "valid").sum())
    return s


def canary() -> float:
    def wall(n: int) -> float:
        t0 = time.perf_counter()
        with mp.Pool(n) as p:
            p.map(_kernel, range(n))
        return time.perf_counter() - t0

    w8 = min(wall(8) for _ in range(2))
    w32 = min(wall(32) for _ in range(2))
    return w32 / w8


def main() -> None:
    import scaling_bench as sb

    if not os.path.exists(os.path.join(sb.PAGES_PATH, "_SUCCESS")):
        print("preparing pages parquet input...", file=sys.stderr, flush=True)
        sb.run_workload(32, "prepare")

    c0 = canary()
    r8 = sb.run_workload(8, "rollup")
    c1 = canary()
    r32 = sb.run_workload(32, "rollup")
    c2 = canary()

    t8, t32 = r8["rollup_sec"], r32["rollup_sec"]
    raw = (t8 / t32) / 4.0
    valid = all(c <= GATE for c in (c0, c1, c2))
    report = {
        "protocol": "w1_canary_gated (per-leg canary bracket, no burst probe)",
        "n_cpus": 8,
        "4n_cpus": 32,
        "canary_gate": GATE,
        "canaries": [round(c, 3) for c in (c0, c1, c2)],
        "rollup_sec@8": round(t8, 2),
        "rollup_sec@32": round(t32, 2),
        "rollup_rows": r8["rollup_rows"],
        "rollup_rows_per_sec@8": round(r8["rollup_rows_per_sec"], 1),
        "rollup_rows_per_sec@32": round(r32["rollup_rows_per_sec"], 1),
        "raw_efficiency": round(raw, 3),
        "speedup": round(t8 / t32, 2),
        "window_valid": valid,
    }
    print(json.dumps(report, indent=2))
    sys.exit(0 if valid else 3)


if __name__ == "__main__":
    main()
