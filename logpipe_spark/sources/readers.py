"""Source builders — one per reference input plugin (SURVEY §2.1).

Each returns a DataFrame (batch) or streaming DataFrame; endpoints that
don't exist in this sandbox (Kafka brokers, TCP peers, live commands) are
real plan builders behind import/endpoint seams, exercised in tests only up
to plan construction.

| builder | reference plugin |
|---|---|
| snapshot_source / snapshot_stream | logpipe-input-file (inotify tail + offset ledger, `src-plugins/logpipe-input-file.c`) |
| kafka_source | logpipe-input-kafka (`src-plugins/logpipe-input-kafka.c:169-252`) |
| socket_source | logpipe-input-tcp (`src-plugins/logpipe-input-tcp.c:154-361`); the framing protocol ('@'+len+name+(len+block)*) is moot — rows are typed |
| exec_source | logpipe-input-exec popen reader (`src-plugins/logpipe-input-exec.c:94-200`) |
"""

from __future__ import annotations

import subprocess
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def snapshot_source(
    spark: SparkSession, src_dir: str, snapshot_ids: Iterable[int] | None = None
) -> DataFrame:
    """Batch scan over snapshot partitions; with `snapshot_ids`, an
    incremental range scan (the Iceberg `start-snapshot-id` analogue)."""
    import os

    if snapshot_ids is None:
        return spark.read.option("basePath", src_dir).parquet(src_dir)
    paths = [os.path.join(src_dir, f"snapshot={s}") for s in snapshot_ids]
    return spark.read.option("basePath", src_dir).parquet(*paths)


def snapshot_stream(spark: SparkSession, src_dir: str, schema: T.StructType,
                    max_files_per_trigger: int = 8) -> DataFrame:
    """File-source stream: new snapshot files are discovered per trigger
    (the inotify-create/modify analogue; offsets live in the checkpoint)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )


def kafka_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    streaming: bool = True,
) -> DataFrame:
    """Kafka scan/stream (built-in connector). No broker in this sandbox —
    constructing the reader validates options; .load() requires the
    spark-sql-kafka package + a live broker."""
    reader = (spark.readStream if streaming else spark.read).format("kafka")
    return (
        reader.option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )


def socket_source(spark: SparkSession, host: str, port: int) -> DataFrame:
    """Line-framed TCP stream (the collector-side input-tcp analogue —
    Spark's shuffle replaces the collector tier; this exists for parity)."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )


def exec_source(
    spark: SparkSession, argv: list[str], name: str = "exec", max_lines: int = 1_000_000
) -> DataFrame:
    """Run a command, ingest its stdout lines as (filename, line_no, text) —
    input-exec's popen loop done once, driver-side, then distributed.
    Suitable for bounded commands only (the reference tails forever; that
    mode belongs to the streaming file source)."""
    proc = subprocess.run(argv, capture_output=True, text=True, timeout=300)
    lines = proc.stdout.splitlines()[:max_lines]
    schema = T.StructType(
        [
            T.StructField("filename", T.StringType()),
            T.StructField("line_no", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    return spark.createDataFrame(
        [(name, i + 1, ln) for i, ln in enumerate(lines)], schema=schema
    )
