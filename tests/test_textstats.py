"""Text-analysis operator behavior on crafted inputs."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from logpipe_spark.operators.textstats import (
    bpe_ish_token_count,
    doc_quality,
    lang_id,
    quality_score,
    token_count,
)


@pytest.fixture(scope="module")
def samples(spark):
    rows = [
        (0, "the quick brown fox and the lazy dog of the north"),          # en
        (1, "el perro que corre por la calle y el gato"),                  # es
        (2, "der hund und die katze ist hier"),                           # de
        (3, "le chat et le chien est petit"),                             # fr
        (4, "这 是 一个 测试 的 句子 了"),                                    # zh
        (5, "xyzzy plugh"),                                               # und
        (6, "!!! ??? ;;; ###"),                                           # punct junk
        (7, "the " + "spark shuffle partition " * 10),                    # long quality en
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"])).cache()


def test_lang_id(samples):
    got = {
        r["doc_id"]: r["lang"]
        for r in samples.select("doc_id", lang_id(F.col("text")).alias("lang")).collect()
    }
    assert got[0] == "en"
    assert got[1] == "es"
    assert got[2] == "de"
    assert got[3] == "fr"
    assert got[4] == "zh"
    assert got[5] == "und"


def test_token_count(samples):
    got = {
        r["doc_id"]: r["n"]
        for r in samples.select("doc_id", token_count(F.col("text")).alias("n")).collect()
    }
    assert got[0] == 11
    assert got[5] == 2


def test_quality_score_ordering(samples):
    got = {
        r["doc_id"]: r["q"]
        for r in samples.select("doc_id", quality_score(F.col("text")).alias("q")).collect()
    }
    assert got[7] == 100          # long, clean, stopworded English
    assert got[6] < 50            # punct junk
    assert got[7] > got[5]


def test_bpe_ish_counts_exceed_words(samples):
    rows = samples.select(
        token_count(F.col("text")).alias("w"),
        bpe_ish_token_count(F.col("text")).alias("b"),
    ).collect()
    for r in rows:
        assert r["b"] >= r["w"]


def test_doc_quality_shape(samples):
    df = doc_quality(samples)
    assert set(df.columns) == {"doc_id", "quality", "lang_guess", "bpe_tokens", "fingerprint"}
    assert df.count() == 8
    # fingerprint deterministic
    a = sorted(r["fingerprint"] for r in df.collect())
    b = sorted(r["fingerprint"] for r in doc_quality(samples).collect())
    assert a == b


def test_repetition_stats_hand_values(spark):
    """Known 2-gram structure: 'a b a b a b' has grams [a b, b a, a b,
    b a, a b] → n=5, distinct=2, top=3. Short and empty docs → zeros."""
    from logpipe_spark.operators.textstats import repetition_stats

    rows = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "a b a b a b",
            "all words here are unique tokens",
            "one",      # < 2 tokens
            "  ",       # no tokens at all
        ],
    })
    out = {r["doc_id"]: r.asDict()
           for r in repetition_stats(spark.createDataFrame(rows)).collect()}
    assert out[0] == {"doc_id": 0, "n_grams": 5, "n_distinct": 2, "top_count": 3}
    assert out[1]["n_grams"] == 5 and out[1]["n_distinct"] == 5
    assert out[1]["top_count"] == 1
    assert out[2] == {"doc_id": 2, "n_grams": 0, "n_distinct": 0, "top_count": 0}
    assert out[3] == {"doc_id": 3, "n_grams": 0, "n_distinct": 0, "top_count": 0}


def test_repetition_stats_zero_shuffle(spark):
    """Per-row property → the plan must contain no Exchange at all."""
    from logpipe_spark.operators.textstats import repetition_stats

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    plan = repetition_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
