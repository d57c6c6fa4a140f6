"""Routing parity: compiled CASE-WHEN chain == pure-Python first-match-wins
oracle (`oracle.route_row`), incl. exclude rules and fall-through drops."""

import pandas as pd
from pyspark.sql import functions as F

from logpipe_spark.operators.route import route
from logpipe_spark.oracle import route_row


def test_route_matches_oracle(spark, transcripts_df, transcripts_pdf, rules):
    got = (
        route(transcripts_df, rules)
        .select("conv_id", "turn_idx", "sink")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    exp_sinks = [
        route_row(rules, row) for row in transcripts_pdf.to_dict("records")
    ]
    exp = transcripts_pdf[["conv_id", "turn_idx"]].copy()
    exp["sink"] = exp_sinks
    exp = exp.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    got_s = got["sink"].where(pd.notna(got["sink"]), None).tolist()
    assert got_s == exp["sink"].tolist()


def test_exclude_rule_drops(spark, transcripts_df, rules):
    routed = route(transcripts_df, rules)
    denied_routed = routed.filter(
        F.col("text").contains("denied") & F.col("sink").isNotNull()
    ).count()
    assert denied_routed == 0


def test_first_match_wins_order(spark, transcripts_df, rules):
    # every ERROR row that isn't excluded must land in sink_errors, never default
    routed = route(transcripts_df, rules)
    misrouted = routed.filter(
        F.col("text").startswith("ERROR ")
        & ~F.col("text").contains("denied")
        & (F.col("sink") != "sink_errors")
    ).count()
    assert misrouted == 0


def test_all_sinks_nonempty(spark, transcripts_df, rules):
    counts = {
        r["sink"]: r["n"]
        for r in route(transcripts_df, rules)
        .groupBy("sink")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for s in ("sink_errors", "sink_assistant_tool", "sink_default"):
        assert counts.get(s, 0) > 0, counts
    assert counts.get(None, 0) > 0  # dropped rows exist
