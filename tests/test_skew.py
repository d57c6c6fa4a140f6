"""Hot-key salting bound (FIXTURES.md §6): the fixture forces one conv to
~15% of all turns; salted repartition must spread it, plain repartition by
conv_id must not."""

from pyspark.sql import functions as F

from logpipe_spark.operators.sinks import repartition_salted


def _max_partition_share(df) -> float:
    sizes = (
        df.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    total = sum(r["n"] for r in sizes)
    return max(r["n"] for r in sizes) / total


def test_fixture_has_hot_conv(transcripts_df):
    top = (
        transcripts_df.groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc())
        .first()
    )
    assert top["n"] / transcripts_df.count() > 0.10


def test_salting_bounds_max_partition(transcripts_df):
    n_parts = 16
    unsalted = transcripts_df.repartition(n_parts, F.col("conv_id"))
    salted = repartition_salted(transcripts_df, n_parts, salt_buckets=8)
    share_unsalted = _max_partition_share(unsalted)
    share_salted = _max_partition_share(salted)
    # hot conv (~15%) pins one partition without salt; salt spreads it
    assert share_salted < share_unsalted
    assert share_salted < 0.12, f"salted max share {share_salted:.3f}"


def test_salting_preserves_rows(transcripts_df, transcripts_pdf):
    salted = repartition_salted(transcripts_df, 16, salt_buckets=8)
    assert salted.count() == len(transcripts_pdf)
    # ordering invariant is re-established by sort, independent of layout
    first = salted.orderBy("conv_id", "turn_idx").select("conv_id", "turn_idx").first()
    assert first["conv_id"] == "conv00000000" and first["turn_idx"] == 0
