"""Data profiling: key-skew heavy hitters and per-column stats.

Why this belongs in a pipeline engine: every scale failure mode this repo
defends against elsewhere — skewed join keys (operators/route.py salting),
dominant groups (operators/corpus.py quota prefilter), hot shingles
(operators/dedup.py caps) — starts with a distribution question. These
operators answer it with ONE aggregation pass each, so the answer is cheap
enough to run before committing to a 100 TB plan.

The reference has no analogue (logpipe forwards bytes blind); this is part
of the Spark-first operational surface around it.

Scale shape: both operators are groupBy/agg only — map-side partial
aggregation, one shuffle keyed by the profiled column, and a driver-bound
result (top-k rows / one row per column). skew_profile's total row count
comes from summing the per-key counts (no second scan), joined on as a
broadcast scalar.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def skew_profile(df: DataFrame, key_col: str, top_k: int = 20) -> DataFrame:
    """Exact top-``top_k`` heaviest keys of ``key_col`` with count and
    parts-per-million share (integer arithmetic — exactly SQL-mirrorable).
    Deterministic tie-break: count desc, then key asc.

    Read the output before planning: a top key above ~50000 ppm (5%) of a
    join or groupBy input is where AQE skew splitting stops being enough
    and explicit salting (route.salted_repartition) or a quota prefilter
    (corpus.quota_sample) earns its keep."""
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    total = counts.agg(F.sum("n").alias("total"))
    top = counts.orderBy(F.col("n").desc(), F.col("key").asc()).limit(top_k)
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            F.col("key").cast("string").alias("key"),
            F.col("n").cast("long").alias("n"),
            # integer division end-to-end: no float rounding to mirror
            F.expr("(n * 1000000) div total").cast("long").alias("ppm"),
        )
        .orderBy(F.col("n").desc(), F.col("key").asc())
    )


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """One row per profiled column: row count, null count, exact distinct
    count, and min/max rendered as strings. All aggregates run in a single
    job (one Aggregate over the full set of expressions — Spark computes
    them in one pass); the unpivot to rows is a stack() projection of the
    1-row result, so the whole profile costs one scan.

    Exact countDistinct shuffles by value per column; for a quick look at
    100 TB swap in approx_count_distinct — kept exact here because the
    contract oracle checks values bit-for-bit."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("_rows")]
    for c in cols:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"_nulls_{c}"),
            F.countDistinct(F.col(c)).alias(f"_dist_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', _nulls_{c}, _dist_{c}, _min_{c}, _max_{c}" for c in cols
    )
    return one.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(column, n_null, n_distinct, min_s, max_s)",
        "_rows AS n_rows",
    ).select(
        "column",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_null").cast("long").alias("n_null"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_s",
        "max_s",
    )
