#!/usr/bin/env python
"""A/B the pipeline_fanout_write bench block (VERDICT r3 What's-wrong #3):
same invocation as bench.py's fanout section, toggling the per-file
lineage block via LOGPIPE_SKIP_FILE_LINEAGE=1 (temporary env hook).

(Historical note: the r4 A/B originally toggled an env var; run_pipeline
now takes an explicit per_file_lineage kwarg.)

Usage: python scripts/ab_fanout.py [reps]
"""
import os
import shutil
import sys
import time

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
os.environ.setdefault("SPARK_GRAFT_JAVA_OPTS", "-XX:+UseParallelGC")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402

from logpipe_spark.fixtures import default_route_rules, gen_tool_role_dim  # noqa: E402
from logpipe_spark.ledger import write_snapshots  # noqa: E402
from logpipe_spark.pipeline import run_pipeline  # noqa: E402
from logpipe_spark.session import get_spark  # noqa: E402

CACHE = "/tmp/logpipe_bench_cache"
SEED_TURNS = 2_400_000  # sf0.1 bench: 4 * 600_000


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    seed_path = os.path.join(CACHE, f"transcripts_{SEED_TURNS}")
    if not os.path.exists(seed_path):
        from logpipe_spark.fixtures import write_transcripts_dir

        write_transcripts_dir(seed_path, SEED_TURNS, n_files=32)
    wsrc = os.path.join(CACHE, f"write_src_{SEED_TURNS}")
    if not os.path.isdir(wsrc):
        write_snapshots(pd.read_parquet(seed_path), wsrc, n_snapshots=4)

    spark = get_spark(cores=32, app_name="ab_fanout", shuffle_partitions=32)
    dim = spark.createDataFrame(gen_tool_role_dim())
    wout = os.path.join(CACHE, "ab_write_out")

    results = {}
    for mode in ("with_lineage", "skip_lineage") * reps:
        shutil.rmtree(wout, ignore_errors=True)
        t0 = time.perf_counter()
        run_pipeline(spark, wsrc, wout, dim, default_route_rules(),
                     salt_partitions=32,
                     per_file_lineage=(mode == "with_lineage"))
        dt = time.perf_counter() - t0
        results.setdefault(mode, []).append(round(dt, 3))
        print(f"{mode}: {dt:.3f}s", flush=True)
    print("RESULTS", results, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
