"""Cross-table fuzzy join + deterministic best-match election
(operators/linkage.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logpipe_spark.operators.linkage import best_match, fuzzy_join


def _t(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BASE = "the quick brown fox jumps over the lazy sleeping dog tonight"


class TestFuzzyJoin:
    def test_matches_perturbed_rows_only(self, spark):
        left = _t(spark, [(1, BASE), (2, "completely different words here")])
        right = _t(spark, [
            (10, BASE + " again"),       # near-dup of 1
            (11, "unrelated content entirely about other topics"),
        ])
        got = fuzzy_join(left, right, threshold=0.8).collect()
        assert [(r["doc_id_l"], r["doc_id_r"]) for r in got] == [(1, 10)]
        r = got[0]
        # 11 tokens → 9 distinct shingles; +1 token appends 1 shingle
        assert r["n_common"] == 9
        assert r["jaccard"] == pytest.approx(9 / 10)

    def test_no_within_table_pairs(self, spark):
        dup = _t(spark, [(1, BASE), (2, BASE)])  # identical LEFT rows
        right = _t(spark, [(10, "nothing shared at all in this row")])
        assert fuzzy_join(dup, right).count() == 0

    def test_hot_shingle_cap_spans_both_sides(self, spark):
        # the shared boilerplate phrase exceeds the cap only when counted
        # across BOTH tables → it must not manufacture pairs
        boiler = "terms and conditions apply here"
        left = _t(spark, [(i, boiler) for i in range(3)])
        right = _t(spark, [(100 + i, boiler) for i in range(3)])
        assert fuzzy_join(left, right, max_shingle_freq=5).count() == 0
        # under the cap they do pair (sanity that the cap was the cause)
        assert fuzzy_join(left, right, max_shingle_freq=6).count() == 9

    def test_plan_has_no_cartesian(self, spark):
        left = _t(spark, [(1, BASE)])
        right = _t(spark, [(10, BASE)])
        plan = (
            fuzzy_join(left, right)._jdf.queryExecution()
            .executedPlan().toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestBestMatch:
    def test_max_then_smallest_tiebreak(self, spark):
        pairs = spark.createDataFrame(
            [(1, 10, 0.9), (1, 11, 0.95), (2, 20, 0.9), (2, 19, 0.9)],
            "doc_id_l long, doc_id_r long, jaccard double",
        )
        got = {
            r["doc_id_l"]: (r["doc_id_r"], r["jaccard"])
            for r in best_match(
                pairs, "doc_id_l", tiebreak_col="doc_id_r"
            ).collect()
        }
        assert got[1] == (11, 0.95)       # highest score wins
        assert got[2] == (19, 0.9)        # tie → smallest right key
        plan_df = best_match(pairs, "doc_id_l", tiebreak_col="doc_id_r")
        plan = plan_df._jdf.queryExecution().executedPlan().toString()
        assert "WindowExec" not in plan   # election is a hash agg
