"""Profiling operators: heavy-hitter detection and single-pass column
stats, with plan-shape guarantees (top-k never globally sorts; the column
profile is one aggregation pass)."""

from pyspark.sql import functions as F

from logpipe_spark.operators.profile import profile_columns, skew_profile


def test_skew_profile_planted_hot_key(spark):
    rows = [("hot",)] * 500 + [(f"k{i}",) for i in range(100)]
    df = spark.createDataFrame(rows, ["k"]).repartition(8)
    out = skew_profile(df, "k", top_k=5).collect()
    assert out[0]["key"] == "hot"
    assert out[0]["n"] == 500
    # 500/600 of the total, in exact integer ppm
    assert out[0]["ppm"] == (500 * 1_000_000) // 600
    # ties among the k_i singletons break by key ascending
    assert [r["key"] for r in out[1:]] == ["k0", "k1", "k10", "k11"]


def test_skew_profile_uses_topk_not_global_sort(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plan = (
        skew_profile(df, "user_id", top_k=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_profile_columns_values(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "a")],
        ["x", "s"],
    )
    got = {r["column"]: r for r in profile_columns(df, ["x", "s"]).collect()}
    assert got["x"]["n_rows"] == 4
    assert got["x"]["n_null"] == 1
    assert got["x"]["n_distinct"] == 2  # countDistinct ignores nulls
    assert (got["x"]["min_s"], got["x"]["max_s"]) == ("1", "2")
    assert got["s"]["n_null"] == 1
    assert got["s"]["n_distinct"] == 2
    assert (got["s"]["min_s"], got["s"]["max_s"]) == ("a", "b")


def test_profile_columns_single_scan(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plan = (
        profile_columns(df, ["event_id", "user_id", "event_type"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # one scan of the input, not one per column
    assert plan.count("FileScan parquet") == 1


class TestMadOutliers:
    def test_flags_spike_not_noise(self, spark):
        from logpipe_spark.operators.profile import mad_outliers

        rows = (
            [(i, "a", 100 + (i % 5)) for i in range(20)]   # tight group
            + [(99, "a", 10_000)]                          # spike
            + [(200 + i, "b", v) for i, v in enumerate(
                [1, 2, 3, 4, 5, 6, 7, 8, 9])]              # spread, no spike
        )
        df = spark.createDataFrame(rows, "id long, g string, v long")
        got = {r["id"]: r for r in
               mad_outliers(df, "v", "g", "id").collect()}
        assert 99 in got and got[99]["g"] == "a"
        assert all(r["g"] == "a" for r in got.values())
        # modified z-score formula spot check: med=102, mad=1
        import math
        assert got[99]["score"] == round(0.6745 * abs(10_000 - 102) / 1, 6)

    def test_zero_mad_group_emits_nothing(self, spark):
        from logpipe_spark.operators.profile import mad_outliers

        df = spark.createDataFrame(
            [(i, "c", 5) for i in range(10)] + [(99, "c", 1000)],
            "id long, g string, v long",
        )
        # median=5, MAD=0 → undefined score → group skipped entirely
        assert mad_outliers(df, "v", "g", "id").count() == 0
