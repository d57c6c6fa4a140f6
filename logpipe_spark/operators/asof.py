"""As-of and range joins — custom operators Spark lacks natively.

Not present in the reference (it has no joins at all, SURVEY §2.5), but
first-class citizens of a telemetry/transcript engine: "join each event to
the most recent dimension state at its timestamp" (as-of) and "join a
measure to its bucket" (range).

As-of is built as a composition of existing DataFrame ops — the union
trick — rather than a UDF:

  1. tag left rows (probe) and right rows (state) and union them on
     (key, ts), carrying the right payload as one nullable struct;
  2. one window per key ordered by (ts, tag): `last(payload,
     ignorenulls=True)` propagates the latest state at-or-before each row;
  3. keep probe rows; inner-drop the ones with no state yet.

Cost model at scale: ONE shuffle of |L|+|R| rows by key + a per-key sort —
the same price as a sort-merge join, no range explosion, no UDF. Keys are
users/conversations so per-key row counts are bounded; a pathologically
hot key would use the same salting defense as the pipeline (salt, window,
re-merge), not needed at current skew.

Range join against a small bands table is a broadcast nested-loop with a
BETWEEN condition — the right plan when |bands| is tiny; a big right side
would want bucketing both sides to equi-join on overlapping bucket ids.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    how: str = "inner",
) -> DataFrame:
    """For each left row: the right row with the greatest ``right_ts`` ≤
    ``left_ts`` within the same key (backward as-of). ``right_payload``
    columns are appended; ``how='left'`` keeps unmatched probe rows."""
    r_struct_type = (
        "struct<_m:boolean,"
        + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in right_payload)
        + ">"
    )
    l_tag = left.select(
        F.col(left_key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_probe"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(r_struct_type).alias("_r"),
    )
    # `_m` marks "this is a real state row": match detection must not look
    # at payload values (a matched state row may legitimately carry NULLs)
    r_tag = right.select(
        F.col(right_key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_probe"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in left.schema.fields) + ">"
        ).alias("_l"),
        F.struct(F.lit(True).alias("_m"), *right_payload).alias("_r"),
    )
    unioned = l_tag.unionByName(r_tag)
    # state rows sort before probe rows at equal ts → '>=' semantics
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_is_probe").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = unioned.withColumn("_state", F.last("_r", ignorenulls=True).over(w))
    out = matched.filter(F.col("_is_probe") == 1)
    if how == "inner":
        out = out.filter(F.col("_state._m"))
    return out.select("_l.*", *[F.col(f"_state.{c}").alias(c) for c in right_payload])


def range_join(
    facts: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    how: str = "inner",
) -> DataFrame:
    """Join each fact row to the band where lo ≤ value < hi. Bands are
    broadcast (tiny by construction)."""
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return facts.join(F.broadcast(bands), on=cond, how=how)
