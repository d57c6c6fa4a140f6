"""Pipeline spec (JSON config → run) and source builders."""

import json
import os

import pytest
from pyspark.sql import functions as F

from logpipe_spark.ledger import write_snapshots
from logpipe_spark.pipeline import read_sinks
from logpipe_spark.plans.spec import PipelineSpec
from logpipe_spark.sources.readers import exec_source, snapshot_source


def test_spec_json_roundtrip_and_run(spark, transcripts_pdf, rules, golden, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    write_snapshots(transcripts_pdf, src, n_snapshots=2)
    cfg = json.dumps(
        {"source_dir": src, "out_dir": out, "rules": rules, "salt_partitions": 4}
    )
    spec = PipelineSpec.from_json(cfg)
    res = spec.run(spark)
    assert res["processed"] == [0, 1]
    got = {
        r["sink"]: r["n"]
        for r in read_sinks(spark, out).groupBy("sink").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == dict(golden["sink_counts"])


def test_spec_validation_errors():
    with pytest.raises(ValueError, match="missing required key"):
        PipelineSpec.from_json(json.dumps({"source_dir": "x", "rules": []}))
    with pytest.raises(ValueError, match="missing keys"):
        PipelineSpec.from_json(
            json.dumps(
                {"source_dir": "x", "out_dir": "y", "rules": [{"rule_id": 1}]}
            )
        )


def test_snapshot_source_range_scan(spark, transcripts_pdf, tmp_path):
    src = str(tmp_path / "src")
    ids = write_snapshots(transcripts_pdf, src, n_snapshots=4)
    full = snapshot_source(spark, src).count()
    partial = snapshot_source(spark, src, snapshot_ids=ids[:2]).count()
    assert full == len(transcripts_pdf)
    assert 0 < partial < full


def test_exec_source(spark):
    df = exec_source(spark, ["printf", "l1\\nl2\\nl3\\n"], name="cmd1")
    rows = df.orderBy("line_no").collect()
    assert [r["text"] for r in rows] == ["l1", "l2", "l3"]
    assert rows[0]["filename"] == "cmd1"
    assert rows[2]["line_no"] == 3
