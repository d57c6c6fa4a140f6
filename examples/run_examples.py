#!/usr/bin/env python
"""Run every reference config case against this engine (see README.md here).

Network cases (kafka/es transport) build their plan and stop at the
transport seam — everything else executes end-to-end on fixture data.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from logpipe_spark.fixtures import gen_transcripts
from logpipe_spark.functions.text import filename_key_cut, pack_metadata
from logpipe_spark.ledger import write_snapshots
from logpipe_spark.operators.parse import extract_builtin
from logpipe_spark.operators.sinks import repartition_salted
from logpipe_spark.operators.writers import (
    console_sink,
    kafka_sink_writer,
    render_es_bulk,
    write_date_partitioned,
    write_partitioned_by_key,
)
from logpipe_spark.plans.spec import PipelineSpec
from logpipe_spark.pipeline import read_sinks
from logpipe_spark.session import get_spark
from logpipe_spark.sources.readers import kafka_source

ROOT = "/tmp/logpipe_examples"


def _fixture(spark):
    if not os.path.isdir(f"{ROOT}/src"):
        write_snapshots(gen_transcripts(10_000), f"{ROOT}/src", 2)
    return spark.read.parquet(f"{ROOT}/src")


def case0_file_to_file(spark):
    """conf/logpipe_case0_input_file_and_output_file.conf"""
    _fixture(spark)  # ensure the shared source snapshots exist
    spec = PipelineSpec.from_file(os.path.join(os.path.dirname(__file__), "case0_file_to_file.json"))
    shutil.rmtree(spec.out_dir, ignore_errors=True)
    res = spec.run(spark)
    n = read_sinks(spark, spec.out_dir).count()
    print(f"case0: processed snapshots {res['processed']}, {n} rows in sink 'all'")


def case1_collector(spark):
    """conf/logpipe_case1_* (file→tcp→file): shuffle-by-key replaces the
    collector tier; merge-by-key write replaces append-to-same-filename."""
    df = repartition_salted(_fixture(spark), 8, key="conv_id", salt_buckets=4)
    out = f"{ROOT}/case1_out"
    shutil.rmtree(out, ignore_errors=True)
    write_partitioned_by_key(df.limit(2000), out, key_col="role", mode="overwrite")
    print("case1: collector merge dirs:", sorted(os.listdir(out))[:4])


def case3_day_dirs(spark):
    """conf/logpipe_case3_input_file_and_output_hdfs.conf"""
    out = f"{ROOT}/case3_out"
    shutil.rmtree(out, ignore_errors=True)
    write_date_partitioned(_fixture(spark), out, mode="overwrite")
    print("case3: day dirs:", sorted(d for d in os.listdir(out) if d.startswith("day="))[:3])


def case4_es_bulk(spark):
    """conf/logpipe_case4_input_file_and_output_es.conf: the $N JSON
    template with translate_charset + bulk batching."""
    batches = render_es_bulk(
        _fixture(spark).limit(500),
        doc_template='{ "system_id":"$0" , "f1":"$1","f2":"$2" , "n3":"$3" }',
        key_col=F.col("conv_id"),
        translate="[]",
        min_fields=3,
        batch_rows=100,
        order_col="turn_idx",
    )
    rows = batches.collect()
    print(f"case4: {len(rows)} ES /_bulk batches, first payload bytes:",
          len(rows[0]['payload']) if rows else 0)


def case6_kafka_plan(spark):
    """conf/logpipe_case6_input_file_and_output_kafka.conf (plan only)."""
    writer = kafka_sink_writer(
        _fixture(spark).select(F.col("text").alias("value")),
        bootstrap_servers="broker:9092", topic="logpipe",
    )
    print("case6: kafka writer built:", type(writer).__name__)


def case7_key_cut(spark):
    """conf/logpipe_case7_input_file_and_output_ingeek.conf: filename key
    cut + per-line metadata tail."""
    df = _fixture(spark).limit(5)
    fake_name = F.concat(F.col("conv_id"), F.lit("_event_x.log"))
    out = df.select(
        filename_key_cut(fake_name, 2).alias("key"),
        F.concat(
            F.col("text"),
            pack_metadata(F.lit("sys"), F.lit("srv"), fake_name,
                          F.col("turn_idx").cast("long"), F.lit(0)),
        ).alias("line"),
    )
    console_sink(out, n=3)
    print("case7: ingeek key-cut + metadata tail rendered")


def case8_filter_stdout(spark):
    """conf/logpipe_case8_input_file_and_filter_and_output_stdout.conf"""
    console_sink(
        extract_builtin(_fixture(spark).limit(5)).select(
            "conv_id", "turn_idx", "tool_called", "error_code", "n_fields"
        ),
        n=5,
    )
    print("case8: filter → stdout done")


def case9_kafka_source_plan(spark):
    """conf/logpipe_case9_input_kafka_and_output_stdout.conf (plan only)."""
    try:
        kafka_source(spark, "broker:9092", "logs")
    except Exception as err:  # no kafka package/broker in sandbox
        print("case9: kafka source plan stops at transport seam:",
              type(err).__name__)


def case_native_conf_translation(spark):
    """Every shipped reference conf (conf/*.conf, fasterjson dialect)
    through plans.conf_compat, then case0's translation RUN end-to-end."""
    import glob

    from logpipe_spark.plans.conf_compat import translate_logpipe_conf

    confs = sorted(glob.glob("/root/reference/conf/*.conf"))
    if not confs:
        print("conf-translate: reference conf dir not present, skipped")
        return
    for path in confs:
        t = translate_logpipe_conf(open(path).read())
        parts = [p for p, v in [
            ("spec", t.spec), ("es", t.es_render), ("tcp", t.tcp_peers),
            ("hdfs", t.hdfs), ("kafka", t.kafka), ("ingeek", t.ingeek),
            ("live", t.live_sources), ("stdout", t.console),
        ] if v]
        print(f"  {os.path.basename(path)}: -> {'+'.join(parts)}"
              f" ({len(t.warnings)} warnings)")
    _fixture(spark)
    t0 = translate_logpipe_conf(
        open("/root/reference/conf/logpipe_case0_input_file_and_output_file.conf").read(),
        source_dir=f"{ROOT}/src", out_dir=f"{ROOT}/conf0_out",
    )
    shutil.rmtree(f"{ROOT}/conf0_out", ignore_errors=True)
    t0.spec.run(spark)
    n = read_sinks(spark, f"{ROOT}/conf0_out").count()
    print(f"conf-translate: {len(confs)} native confs mapped; case0 ran "
          f"end-to-end, {n} rows routed")


ALL = [case0_file_to_file, case1_collector, case3_day_dirs, case4_es_bulk,
       case6_kafka_plan, case7_key_cut, case8_filter_stdout,
       case9_kafka_source_plan, case_native_conf_translation]

if __name__ == "__main__":
    spark = get_spark(cores=8, shuffle_partitions=8, app_name="logpipe_examples")
    for case in ALL:
        case(spark)
    spark.stop()
    print("all example cases done")
