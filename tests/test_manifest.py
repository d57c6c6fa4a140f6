"""Sharded training-corpus publish + verify (operators/manifest.py)."""

from __future__ import annotations

import json
import os

import pytest

from logpipe_spark.operators.manifest import (
    MANIFEST_NAME,
    verify_training_shards,
    write_training_shards,
)


def _docs(spark, n=200, text=lambda i: f"document body {i}"):
    return spark.createDataFrame(
        [(i, text(i)) for i in range(n)], "doc_id long, text string"
    )


class TestTrainingShards:
    def test_publish_counts_and_reproducibility(self, spark, tmp_path):
        out = str(tmp_path / "corpus")
        m1 = write_training_shards(spark, _docs(spark), out, num_shards=4)
        assert m1["total_rows"] == 200
        assert sum(s["rows"] for s in m1["shards"].values()) == 200
        assert os.path.exists(os.path.join(out, MANIFEST_NAME))
        # same inputs, same seed → bit-identical manifest (fresh dir)
        m2 = write_training_shards(
            spark, _docs(spark), str(tmp_path / "corpus2"), num_shards=4
        )
        assert m1 == m2
        # verification passes on the published tree
        rep = verify_training_shards(spark, out)
        assert set(rep.values()) == {"ok"}

    def test_digest_tracks_content_and_seed(self, spark, tmp_path):
        a = write_training_shards(
            spark, _docs(spark), str(tmp_path / "a"), num_shards=4
        )
        b = write_training_shards(
            spark, _docs(spark, text=lambda i: f"document body {i}!"),
            str(tmp_path / "b"), num_shards=4,
        )
        assert a["corpus_digest"] != b["corpus_digest"]
        c = write_training_shards(
            spark, _docs(spark), str(tmp_path / "c"), num_shards=4,
            seed="epoch1",
        )
        # same content, different order → same order-independent digest
        assert c["corpus_digest"] == a["corpus_digest"]
        assert c["shards"] != a["shards"]  # but the sharding moved

    def test_tampering_detected_and_publish_atomic(self, spark, tmp_path):
        out = str(tmp_path / "corpus")
        write_training_shards(spark, _docs(spark), out, num_shards=2)
        # tamper: claim one shard has one fewer row
        mpath = os.path.join(out, MANIFEST_NAME)
        m = json.load(open(mpath))
        m["shards"]["0"]["rows"] -= 1
        json.dump(m, open(mpath, "w"))
        rep = verify_training_shards(spark, out)
        assert rep["0"] == "MISMATCH"
        # unpublished dir fails loudly
        with pytest.raises(FileNotFoundError, match="never published"):
            verify_training_shards(spark, str(tmp_path / "nope"))

    def test_republish_replaces_previous(self, spark, tmp_path):
        out = str(tmp_path / "corpus")
        write_training_shards(spark, _docs(spark, n=100), out, num_shards=2)
        m = write_training_shards(
            spark, _docs(spark, n=50), out, num_shards=2
        )
        assert m["total_rows"] == 50
        assert verify_training_shards(spark, out)["_corpus"] == "ok"
