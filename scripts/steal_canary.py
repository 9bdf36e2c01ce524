#!/usr/bin/env python
"""10-second steal-regime canary: times the same NumPy kernel on 8 and 32
processes. On clean hardware the 32-way wall is ~the 8-way wall (per-proc
work fixed); under the hypervisor steal regime documented in BASELINE.md
the 32-way wall blows up 3-20x. Exit 0 = window looks clean (normalized
ratio < 1.8), exit 1 = contaminated. Used to GATE expensive timed runs,
never as scaling evidence itself."""
import multiprocessing as mp
import sys
import time

import numpy as np


def work(_):
    # ~2s of sustained FP work per process: the steal regime only engages
    # under SUSTAINED all-core load (BASELINE.md), so a sub-second burst
    # would always read clean
    x = np.random.default_rng(0).standard_normal(200_000)
    s = 0.0
    for _ in range(150):
        s += float(np.convolve(x[:65536], x[:1024], "valid").sum())
    return s


def wall(n: int) -> float:
    t0 = time.perf_counter()
    with mp.Pool(n) as p:
        p.map(work, range(n))
    return time.perf_counter() - t0


if __name__ == "__main__":
    w8 = min(wall(8) for _ in range(2))
    w32 = min(wall(32) for _ in range(2))
    # 32 procs do 4x the total work of 8 procs at fixed per-proc work:
    # on clean hardware w32 ~= w8, so the clean ratio is ~1.0
    ratio = w32 / w8
    print(f"w8={w8:.2f}s w32={w32:.2f}s ratio={ratio:.2f}")
    sys.exit(0 if ratio < 1.8 else 1)
