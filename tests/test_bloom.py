"""Bloom filter + Bloom-pruned semi-join (operators/bloom.py).

Value parity vs the exact semi-join is covered by the `bloom_semi_join`
contract oracle; these pin the FILTER's own guarantees — zero false
negatives, a bounded false-positive rate at the spec'd (m, k), OR-merge
equivalence, and that the prefilter actually discards non-members
before the join's exchange.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from logpipe_spark.operators.bloom import (
    MAX_BLOOM_BITS,
    bloom_might_contain,
    bloom_semi_join,
    bloom_words,
    build_bloom,
)

M_BITS = 1 << 13
K = 5


@pytest.fixture(scope="module")
def member_df(spark):
    return spark.createDataFrame(
        [Row(key=f"member-{i}") for i in range(500)]
    )


@pytest.fixture(scope="module")
def words(member_df):
    return bloom_words(build_bloom(member_df, "key", M_BITS, K), M_BITS)


def test_no_false_negatives(spark, member_df, words):
    misses = member_df.where(
        ~bloom_might_contain(words, F.col("key"), M_BITS, K)
    ).count()
    assert misses == 0


def test_false_positive_rate_bounded(spark, words):
    # 500 keys in 8192 bits with k=5 → theoretical FP ≈ (1-e^{-kn/m})^k
    # ≈ 0.15%. Allow a generous 2% ceiling over 5000 non-members.
    non = spark.createDataFrame([Row(key=f"other-{i}") for i in range(5000)])
    fp = non.where(bloom_might_contain(words, F.col("key"), M_BITS, K)).count()
    assert fp / 5000 < 0.02, fp


def test_or_merge_equals_union_build(spark):
    a = spark.createDataFrame([Row(key=f"a-{i}") for i in range(200)])
    b = spark.createDataFrame([Row(key=f"b-{i}") for i in range(200)])
    merged = (
        build_bloom(a, "key", M_BITS, K)
        .unionByName(build_bloom(b, "key", M_BITS, K))
        .groupBy("word")
        .agg(F.expr("bit_or(bits)").alias("bits"))
    )
    direct = build_bloom(a.unionByName(b), "key", M_BITS, K)
    assert bloom_words(merged, M_BITS) == bloom_words(direct, M_BITS)


def test_word_table_shape(member_df):
    rows = build_bloom(member_df, "key", M_BITS, K).collect()
    assert all(0 <= r["word"] < M_BITS // 32 for r in rows)
    # every mask fits in 32 bits (engine-portable: no sign games)
    assert all(0 < r["bits"] < (1 << 32) for r in rows)


def test_semi_join_exact_and_pruning(spark, member_df):
    big = spark.createDataFrame(
        [Row(key=f"member-{i % 750}", v=i) for i in range(3000)]
    )
    out = bloom_semi_join(big, member_df, "key", "key", M_BITS, K)
    expect = big.join(member_df, on="key", how="left_semi")
    assert sorted(r["v"] for r in out.collect()) == sorted(
        r["v"] for r in expect.collect()
    )
    # the approximate mode must be a superset of members and strictly
    # smaller than the input (keys 500..749 are non-members)
    pruned = bloom_semi_join(
        big, member_df, "key", "key", M_BITS, K, exact=False
    ).count()
    assert expect.count() <= pruned < 3000


def test_spec_validation(member_df):
    with pytest.raises(ValueError):
        build_bloom(member_df, "key", m_bits=100)  # not a multiple of 32
    with pytest.raises(ValueError):
        build_bloom(member_df, "key", m_bits=MAX_BLOOM_BITS * 2)
    with pytest.raises(ValueError):
        build_bloom(member_df, "key", k=0)


def test_bytemap_probe_matches_array_probe(spark):
    """The fast binary-blob probe path (what bloom_semi_join ships to
    executors) admits exactly the same keys as the portable dense-word
    probe — same filter, same k strides, element-for-element."""
    from pyspark.sql import functions as F

    from logpipe_spark.operators.bloom import (
        MAX_BYTEMAP_BITS,
        bloom_bytemap,
        bloom_might_contain,
        bloom_might_contain_bytes,
        bloom_words,
        build_bloom,
    )

    m, k = 1 << 12, 5
    members = spark.range(0, 300).select(
        F.col("id").cast("string").alias("key")
    )
    bl = build_bloom(members, "key", m, k)
    words = bloom_words(bl, m)
    blob = bloom_bytemap(bl, m)
    # blob bit b set  <=>  words bit b set
    assert all(
        blob[32 * w + b] == ((words[w] >> b) & 1)
        for w in range(m // 32) for b in range(32)
    )
    probe = spark.range(0, 2000).select(
        F.col("id").cast("string").alias("key")
    )
    hx = F.md5(F.concat(F.lit("bf:"), F.col("key")))
    h1 = F.conv(F.substring(hx, 1, 15), 16, 10).cast("long") % m
    h2 = (F.conv(F.substring(hx, 16, 15), 16, 10).cast("long") * 2 + 1) % m
    via_bytes = {
        r["key"]
        for r in probe.where(
            bloom_might_contain_bytes(blob, h1, h2, m, k)
        ).collect()
    }
    via_words = {
        r["key"]
        for r in probe.where(
            bloom_might_contain(words, F.col("key"), m, k)
        ).collect()
    }
    assert via_bytes == via_words
    assert {str(i) for i in range(300)} <= via_bytes  # no false negatives

    import pytest as _pytest

    with _pytest.raises(ValueError, match="capped"):
        bloom_bytemap(bl, MAX_BYTEMAP_BITS * 2)
