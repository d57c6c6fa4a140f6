#!/usr/bin/env python
"""Probe: how does streaming memory bandwidth scale with process count on
this host? Thin wrapper over bench.py's run_membw (SINGLE implementation —
the probe and the recorded artifact control must measure the same thing).
Prints GB/s at each width and the 4x efficiencies."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import MEMBW_ARR_MB, MEMBW_PASSES, MEMBW_UNITS, run_membw  # noqa: E402

if __name__ == "__main__":
    total_gb = MEMBW_UNITS * MEMBW_PASSES * MEMBW_ARR_MB / 1024
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
