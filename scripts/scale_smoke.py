#!/usr/bin/env python
"""Non-vacuity smoke at a DIFFERENT scale than the oracle gate.

The correctness harness (driver + tests/test_entry_contract.py) value-checks
every contract query at sf0.01; thresholds and planted fixtures are designed
to be scale-relative, but a regression that only empties a result set at
another sf would slip past it (this bit tpch_q3 in round 2 and set_intersect
in round 3). This script runs EVERY queries() entry at the given sf dir and
fails if any returns zero rows or errors.

Usage: python scripts/scale_smoke.py [/root/testdata/sf0.1]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from logpipe_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    failures = []
    for name, fn in entry_mod.queries().items():
        t0 = time.perf_counter()
        try:
            n = fn(spark, sf_dir).count()
            status = f"{n} rows" if n else "EMPTY"
            if not n:
                failures.append((name, "0 rows"))
        except Exception as exc:  # noqa: BLE001
            status = f"ERROR {type(exc).__name__}"
            failures.append((name, repr(exc)[:200]))
        print(f"{name:28s} {status:12s} {time.perf_counter() - t0:6.2f}s",
              flush=True)
    spark.stop()
    if failures:
        print("\nFAILURES:")
        for name, why in failures:
            print(f"  {name}: {why}")
        return 1
    print(f"\nall {len(entry_mod.queries())} queries non-vacuous at {sf_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
