"""Structured Streaming flavor of the pipeline — the true analogue of
logpipe's inotify tail loop.

Reference mapping:

- inotify-tail of a growing directory (`logpipe-input-file.c:1473-1710`)
  → `spark.readStream` file source: new files under the source dir are
  discovered per micro-batch; `Trigger.AvailableNow` = "drain everything
  seen so far then stop" (the batch-resume duality of §3.2).
- offset commit after outputs accept (`logpipe-input-file.c:1901-1925`)
  → the streaming checkpoint: file-source offsets commit only after the
  `foreachBatch` body returns, so a crash replays the uncommitted batch
  (at-least-once per batch; sinks written per-batch-id are idempotent).
- monitor restart loop (`src/monitor.c:89-181`) → just restart the query
  with the same checkpointLocation.

The per-batch body reuses the exact batch stage chain (parse → enrich →
route) — one code path for both execution modes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from logpipe_spark.pipeline import build_stage_chain

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def run_stream(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    dim: DataFrame,
    rules: list[dict],
    available_now: bool = True,
    timeout_sec: int = 300,
    trigger_interval_us: int | None = None,
) -> dict:
    """Micro-batch the source dir through the pipeline into partitioned
    sinks + per-batch lineage, exactly once per batch id.

    ``trigger_interval_us``: continuous-tail poll period (the reference's
    min/max_usleep backoff, `logpipe-input-file.c` config via
    usleep_atou64) — used when ``available_now`` is False; parse config
    strings like "100ms" with functions.units.parse_duration_us.

    Returns {"batches": n} after the query drains (available_now) or
    times out."""
    checkpoint = os.path.join(out_dir, "_checkpoint")
    data_root = os.path.join(out_dir, "data")
    lineage_root = os.path.join(out_dir, "lineage")
    seen = {"batches": 0}

    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(src_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Observation

        # same single-action shape as batch mode: conservation counters
        # ride the sink write via observe() — no persist, no second pass
        routed = build_stage_chain(batch_df, dim, rules)
        obs = Observation(f"stream_lineage_b{batch_id}")
        routed = routed.observe(
            obs,
            F.count(F.lit(1)).alias("rows_in"),
            F.count("n_fields").alias("parsed"),
            F.count("sink").alias("routed"),
            F.coalesce(
                F.sum(F.col("sink").isNull().cast("long")), F.lit(0)
            ).alias("dropped"),
        )
        (
            routed.filter(F.col("sink").isNotNull())
            .write.mode("overwrite")  # overwrite per batch dir = idempotent replay
            .partitionBy("sink")
            .parquet(os.path.join(data_root, f"batch={batch_id}"))
        )
        m = obs.get
        ddl = (
            "batch_id long, partition_id int, rows_in long, parsed long, "
            "routed long, dropped long, sink string, file string"
        )
        lineage_rows = [
            (
                int(batch_id), -1,  # -1 = whole-batch counters
                m["rows_in"], m["parsed"], m["routed"], m["dropped"],
                None, None,
            )
        ]
        batch_data = os.path.join(data_root, f"batch={batch_id}")
        batch_lineage = os.path.join(lineage_root, f"batch={batch_id}")
        # unlike the batch pipeline (whose ledger pins out_dir to a POSIX
        # path), streaming writes through Hadoop FS — driver-side pyarrow
        # only applies to paths the driver can os.open (plain or file:
        # URIs, normalized); any other scheme keeps the distributed
        # metadata-only pass
        from logpipe_spark.operators.sinks import local_path

        local_data = local_path(batch_data)
        local_lineage = local_path(batch_lineage)
        if m["routed"] and local_data is not None:
            # per-file granularity from the just-written parquet footers,
            # read driver-side with pyarrow (sinks.file_lineage_rows) —
            # the file count is bounded by sinks × upstream partitions per
            # micro-batch, so a Spark job per batch would cost more than
            # the answer (same A/B as the batch pipeline, BENCH.md r4)
            from logpipe_spark.operators.sinks import file_lineage_rows

            lineage_rows += [
                (int(batch_id), pid, None, None, routed, None, sink, f)
                for pid, sink, f, routed in file_lineage_rows(local_data)
            ]
        if local_lineage is not None:
            # driver-side pyarrow write: a per-batch Spark job for ~10
            # rows of metadata would dominate micro-batch latency
            from logpipe_spark.operators.sinks import write_lineage_parquet

            write_lineage_parquet(lineage_rows, ddl, local_lineage)
        else:
            from logpipe_spark.operators.sinks import file_lineage

            spark = batch_df.sparkSession
            lineage = spark.createDataFrame(lineage_rows, ddl)
            if m["routed"]:
                per_file = file_lineage(spark, batch_data).select(
                    F.lit(int(batch_id)).alias("batch_id"),
                    "partition_id",
                    F.lit(None).cast("long").alias("rows_in"),
                    F.lit(None).cast("long").alias("parsed"),
                    F.col("routed").cast("long").alias("routed"),
                    F.lit(None).cast("long").alias("dropped"),
                    "sink",
                    "file",
                )
                lineage = lineage.unionByName(per_file)
            lineage.write.mode("overwrite").parquet(batch_lineage)
        seen["batches"] += 1

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_interval_us:
        ms = max(trigger_interval_us // 1000, 1)
        writer = writer.trigger(processingTime=f"{ms} milliseconds")
    query = writer.start()
    query.awaitTermination(timeout_sec)
    if query.isActive:
        query.stop()
    return seen


def read_stream_sinks(spark: SparkSession, out_dir: str) -> DataFrame:
    data_root = os.path.join(out_dir, "data")
    return spark.read.option("basePath", data_root).parquet(data_root)
