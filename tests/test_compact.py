"""Small-file compaction: row preservation, file-count math, no-op and
abort paths (operators/compact.py)."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from logpipe_spark.operators.compact import compact_parquet_dir, parquet_files


@pytest.fixture()
def small_files_dir(spark, tmp_path):
    d = str(tmp_path / "many")
    df = spark.range(0, 20_000).withColumn("payload", F.md5(F.col("id").cast("string")))
    df.repartition(40).write.parquet(d)
    return d


def test_compact_reduces_files_preserves_rows(spark, small_files_dir):
    before = spark.read.parquet(small_files_dir)
    rows_before = sorted(r["id"] for r in before.collect())
    n_before = len(parquet_files(small_files_dir))
    assert n_before == 40

    stats = compact_parquet_dir(spark, small_files_dir, target_bytes=1 << 20)
    assert stats["compacted"]
    assert stats["files_before"] == 40
    assert stats["files_after"] < 40
    assert stats["rows"] == 20_000

    after = spark.read.parquet(small_files_dir)
    assert sorted(r["id"] for r in after.collect()) == rows_before
    assert len(parquet_files(small_files_dir)) == stats["files_after"]
    # no temp/backup residue
    assert not os.path.exists(small_files_dir + ".compact_tmp")
    assert not os.path.exists(small_files_dir + ".pre_compact")


def test_compact_noop_when_already_large(spark, tmp_path):
    d = str(tmp_path / "one")
    spark.range(0, 100).coalesce(1).write.parquet(d)
    stats = compact_parquet_dir(spark, d, target_bytes=1 << 20)
    assert not stats["compacted"]
    assert stats["files_before"] == stats["files_after"] == 1


def test_compact_noop_when_target_needs_as_many_files(spark, tmp_path):
    """tiny target -> n_out >= existing file count -> leave untouched."""
    d = str(tmp_path / "tiny_target")
    spark.range(0, 10_000).repartition(4).write.parquet(d)
    stats = compact_parquet_dir(spark, d, target_bytes=1)
    assert not stats["compacted"]
    assert len(parquet_files(d)) == 4
