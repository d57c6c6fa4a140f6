#!/usr/bin/env python
"""A/B flagship aggregate variants at full bench scale (96M turns) to find
byte/CPU cuts that move the 8->32 scaling (VERDICT r3 #3b).

Usage: python scripts/flagship_variants.py <cores> [variants...]
"""
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
os.environ.setdefault("SPARK_GRAFT_JAVA_OPTS", "-XX:+UseParallelGC")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from logpipe_spark.fixtures import default_route_rules, gen_tool_role_dim  # noqa: E402
from logpipe_spark.pipeline import build_stage_chain  # noqa: E402
from logpipe_spark.session import get_spark  # noqa: E402

SRC = "/tmp/logpipe_bench_cache/transcripts_big384_96000000"


def agg_base(routed):
    # mirrors bench.run_flagship's aggregate — if that changes, update this
    # (the variants below perturb one term at a time, so they can't import it)
    return routed.groupBy("sink").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("text")).alias("chars"),
        F.count("tool_called").alias("n_calls"),
        F.sum("error_code").alias("err_sum"),
        F.max("meta_offset").alias("max_off"),
        F.sum("n_fields").alias("fields"),
        F.countDistinct("tool_family").alias("fams"),
        F.max("priority").alias("max_prio"),
    )


def agg_hashdistinct(routed):
    return routed.groupBy("sink").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("text")).alias("chars"),
        F.count("tool_called").alias("n_calls"),
        F.sum("error_code").alias("err_sum"),
        F.max("meta_offset").alias("max_off"),
        F.sum("n_fields").alias("fields"),
        F.countDistinct(F.xxhash64("tool_family")).alias("fams"),
        F.max("priority").alias("max_prio"),
    )


def agg_bitmapdistinct(routed):
    # exact distinct count without Expand: tool_family cardinality is tiny
    # and enumerable, so OR a one-hot bitmap and popcount it
    bitmap = F.expr(
        "bit_count(bit_or(shiftleft(1L, "
        "cast(pmod(xxhash64(tool_family), 61) as int))))"
    )
    return routed.groupBy("sink").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("text")).alias("chars"),
        F.count("tool_called").alias("n_calls"),
        F.sum("error_code").alias("err_sum"),
        F.max("meta_offset").alias("max_off"),
        F.sum("n_fields").alias("fields"),
        bitmap.alias("fams"),
        F.max("priority").alias("max_prio"),
    )


def agg_nodistinct(routed):
    return routed.groupBy("sink").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("text")).alias("chars"),
        F.count("tool_called").alias("n_calls"),
        F.sum("error_code").alias("err_sum"),
        F.max("meta_offset").alias("max_off"),
        F.sum("n_fields").alias("fields"),
        F.max("priority").alias("max_prio"),
    )


VARIANTS = {
    "base": agg_base,
    "hashdistinct": agg_hashdistinct,
    "bitmapdistinct": agg_bitmapdistinct,
    "nodistinct": agg_nodistinct,
}


def main():
    cores = int(sys.argv[1])
    names = sys.argv[2:] or list(VARIANTS)
    spark = get_spark(cores=cores, app_name=f"variants_{cores}",
                      shuffle_partitions=cores)
    df = spark.read.parquet(SRC)
    dim = spark.createDataFrame(gen_tool_role_dim())
    routed = build_stage_chain(df, dim, default_route_rules())
    # warm with base
    agg_base(routed).collect()
    for name in names:
        fn = VARIANTS[name]
        plan = fn(routed)._jdf.queryExecution().executedPlan().toString()
        expand = "Expand" in plan
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            out = fn(routed).collect()
            best = min(best, time.perf_counter() - t0)
        print(f"cores={cores} {name}: {best:.3f}s expand={expand} "
              f"rows={len(out)}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
