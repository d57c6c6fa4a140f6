#!/usr/bin/env python
"""Probe: how does streaming memory bandwidth scale with process count on
this host? Fixed total traffic split over N worker processes, each touching
its own private array (allocated once in the pool initializer, excluded
from timing). Prints GB/s at each width and the 4x efficiencies."""
import multiprocessing as mp
import time

import numpy as np

ARR_MB = 256          # per-process private array
UNITS = 64            # fixed total work units across all widths
PASSES_PER_UNIT = 4   # each unit streams ARR_MB * PASSES bytes

_arr = None


def _init():
    global _arr
    _arr = np.random.default_rng(0).random(ARR_MB * 1024 * 1024 // 8)


def _unit(_):
    s = 0.0
    for _ in range(PASSES_PER_UNIT):
        s += float(np.add.reduce(_arr))
    return s


def run_membw(procs: int) -> float:
    with mp.Pool(procs, initializer=_init) as pool:
        pool.map(_unit, [0] * procs)  # warm (faults the pages in)
        t0 = time.perf_counter()
        pool.map(_unit, [0] * UNITS)
        return time.perf_counter() - t0


if __name__ == "__main__":
    total_gb = UNITS * PASSES_PER_UNIT * ARR_MB / 1024
    secs = {}
    for procs in (2, 4, 8, 16, 32, 8, 32):  # revisit 8/32 for drift
        dt = run_membw(procs)
        secs.setdefault(procs, []).append(dt)
        print(f"procs={procs:2d}  {dt:7.2f}s  {total_gb / dt:7.2f} GB/s",
              flush=True)
    best = {p: min(v) for p, v in secs.items()}
    for a, b in ((2, 8), (4, 16), (8, 32)):
        if a in best and b in best:
            print(f"eff {a}->{b}: {best[a] / (4 * best[b]):.3f}")
