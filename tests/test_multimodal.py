"""Multimodal plumbing: binary payload columns through mapInPandas feature
extraction (decode kernels are deterministic stubs — the Spark-side schema,
batching, and partition-sizing contracts are what's under test)."""

import pytest
from pyspark.sql import functions as F

from logpipe_spark.operators.multimodal import (
    extract_features,
    gen_fake_media,
    media_repartition,
)


@pytest.fixture(scope="module")
def media(spark):
    return gen_fake_media(spark, n=60).cache()


def test_feature_extraction_schema_and_counts(media):
    feats = extract_features(media, feature_dim=16)
    rows = feats.collect()
    assert len(rows) == 60
    for r in rows:
        assert len(r["feature"]) == 16
        assert len(r["sha256"]) == 64
        assert r["n_bytes"] > 0
    kinds = {r["kind"] for r in rows}
    assert kinds == {"image", "audio", "video"}


def test_features_deterministic(media):
    a = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    b = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    assert a == b


def test_payload_dropped_after_extraction(media):
    feats = extract_features(media)
    assert "payload" not in feats.columns


def test_media_repartition_by_bytes(media):
    df = media_repartition(media, target_mb=1)
    assert df.rdd.getNumPartitions() >= 1
    assert df.count() == 60
