#!/usr/bin/env python
"""Where does the 8->32 efficiency go? Time successive prefixes of the
flagship chain at both widths:
  scan      — decompress text + sum(length)          (IO/decompress bound)
  parse     — + fused regex extraction               (alloc/regex bound)
  full      — + broadcast enrich + route + 8-agg     (the benched flagship)
Each width runs in its own JVM (same posture as bench.py).
Usage: python scripts/stage_scaling.py <cores>
"""
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
os.environ.setdefault("SPARK_GRAFT_JAVA_OPTS", "-XX:+UseParallelGC")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from logpipe_spark.operators.parse import extract_builtin  # noqa: E402
from logpipe_spark.session import get_spark  # noqa: E402

SRC = os.environ.get("STAGE_SRC", "/tmp/logpipe_bench_cache/transcripts_big384_96000000")


def main():
    cores = int(sys.argv[1])
    spark = get_spark(cores=cores, app_name=f"stage_scaling_{cores}",
                      shuffle_partitions=cores)
    df = spark.read.parquet(SRC)

    def scan():
        df.agg(F.sum(F.length("text")), F.max("turn_idx")).collect()

    def parse():
        p = extract_builtin(df)
        p.agg(F.sum(F.length("text")), F.count("tool_called"),
              F.sum("error_code"), F.max("meta_offset"),
              F.sum("n_fields")).collect()

    def full():
        # the benched flagship itself (single source of truth in bench.py)
        import bench

        bench.run_flagship(spark, SRC)

    for name, fn in (("scan", scan), ("parse", parse), ("full", full)):
        fn()  # warm
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        print(f"cores={cores} {name}: {best:.3f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
