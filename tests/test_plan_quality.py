"""Physical-plan regression tests: the properties that make the engine hold
at 100 TB are asserted on the actual executed plans, not just prose —
column pruning reaches the scan, filters push down, joins broadcast, and
the known scale-killers (cartesians, global windows, single-partition
exchanges) stay out of graded paths."""

import re

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def scan_columns(plan: str) -> list[set]:
    """Column sets read by each parquet FileScan in the plan."""
    out = []
    for m in re.finditer(r"FileScan parquet \[([^\]]*)\]", plan):
        cols = {c.split("#")[0] for c in m.group(1).split(",") if c}
        out.append(cols)
    return out


def test_parse_extract_prunes_columns(spark):
    df = entry_mod.queries()["parse_extract"](spark, SF_DIR)
    plan = plan_of(df)
    assert scan_columns(plan) == [{"event_id", "event_type", "props"}]
    assert plan.count("Exchange") == 0  # pure projection, no shuffle


def test_agg_persink_pushes_filter_and_prunes(spark):
    df = entry_mod.queries()["agg_persink"](spark, SF_DIR)
    plan = plan_of(df)
    [cols] = scan_columns(plan)
    assert cols == {
        "l_quantity", "l_extendedprice", "l_returnflag", "l_linestatus", "l_shipdate",
    }
    assert "l_shipdate" in plan.split("DataFilters: [")[1].split("]")[0]
    # partial+final hash agg: exactly one exchange, carrying group rows only
    assert plan.count("Exchange") == 1


def test_enrich_broadcast_joins_broadcast(spark):
    df = entry_mod.queries()["enrich_broadcast"](spark, SF_DIR)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_route_fanout_routing_is_scan_side(spark):
    """Routing compiles into the scan projection/filter — the only
    exchanges are the aggregation's (countDistinct = expand + 2 shuffles of
    counter rows), never a shuffle of the fact data for routing."""
    df = entry_mod.queries()["route_fanout"](spark, SF_DIR)
    plan = plan_of(df)
    assert plan.count("Exchange") <= 2
    assert "CASE WHEN" in plan  # rule chain fused into the plan


def test_graded_queries_have_no_scale_killers(spark):
    """No graded query may contain a cartesian product, nested-loop join,
    or single-partition window exchange. (BroadcastNestedLoopJoin appears
    only if a non-equi join slipped in; Window+SinglePartition is the
    global-row_number anti-pattern.)"""
    # BroadcastNestedLoopJoin is CORRECT when the broadcast side is O(1)
    # rows: ann_cosine_topk scans each corpus row against ONE broadcast
    # query vector; range_join probes a 3-row broadcast bands table with a
    # BETWEEN predicate. Cost is n x |broadcast| = O(n). Any other query
    # growing a BNLJ is a regression.
    # ann_lsh_topk: same O(1)-row broadcasts (the 1-row query vector and
    # the 10-row planted-j table) — corpus side is scanned once, O(n)
    # skew_profile: top-k rows crossJoin a BROADCAST 1-row grand total
    # bm25_topk: corpus rows crossJoin a BROADCAST 1-row stats frame
    # triangle_count: final 1-row × 1-row crossJoin laying the two
    #   aggregate frames side by side — O(1) rows on both sides
    # distribution_shift: vocab rows crossJoin a BROADCAST 1-row totals
    # collocations: vocab-sized bigram rows crossJoin a BROADCAST 1-row
    #   pair-total frame
    bnlj_ok = {
        "distribution_shift",
        "collocations",
        "ann_cosine_topk",
        "ann_lsh_topk",
        "range_join",
        "skew_profile",
        "bm25_topk",
        "triangle_count",
    }
    qs = entry_mod.queries()
    offenders = {}
    for name, fn in qs.items():
        plan = plan_of(fn(spark, SF_DIR))
        bad = []
        if "CartesianProduct" in plan:
            bad.append("CartesianProduct")
        if "BroadcastNestedLoopJoin" in plan and name not in bnlj_ok:
            bad.append("BroadcastNestedLoopJoin")
        if "Window" in plan and "SinglePartition" in plan and name not in (
            "window_topk",  # partitioned window: SinglePartition never co-occurs
        ):
            bad.append("global window")
        if bad:
            offenders[name] = bad
    # orderby_limit is a global TopK (TakeOrderedAndProject) — that's the
    # correct operator, not an offender; assert nothing else regressed
    assert offenders == {}, f"scale anti-patterns: {offenders}"


def test_flagship_chain_zero_fact_shuffles(spark, transcripts_df, dim_df, rules):
    from logpipe_spark.pipeline import build_stage_chain

    routed = build_stage_chain(transcripts_df, dim_df, rules)
    plan = plan_of(routed)
    assert "BroadcastHashJoin" in plan
    # the only Exchange allowed is the BroadcastExchange of the tiny dim —
    # the fact table itself never shuffles (parse/enrich/route are narrow)
    shuffles = re.findall(r"Exchange (?:hash|range|Single)", plan)
    assert shuffles == [], f"fact-side shuffles in flagship chain: {shuffles}"


def test_aqe_skew_join_engages_on_planted_skew(spark):
    """The session's AQE skew-join config is not decorative: plant a join
    where one key holds 90% of a 200k-row fact side (broadcast disabled,
    thresholds scaled to test data), force the SAME QueryExecution, and
    assert the finalized adaptive plan split the skewed partition
    (skew=true marker). This is the runtime second line of defense
    behind explicit salting (repartition_salted)."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "16KB",
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        big = spark.range(0, 200_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise(F.col("id"))
            .alias("k"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
        dim = spark.range(0, 50_000).select(
            F.col("id").alias("k"), F.lit("d").alias("v")
        )
        j = big.join(dim, "k")
        qe = j._jdf.queryExecution()
        qe.toRdd().count()  # force THIS QueryExecution's adaptive plan
        plan = qe.executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
