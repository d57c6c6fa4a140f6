"""Sink fan-out + skew handling + per-partition lineage metrics.

Reference semantics being re-expressed:

- output-file "merge by same filename" append (`logpipe-output-file.c:208-286`)
  → one single-pass write partitioned by the routing key: every task streams
  its rows into per-sink directories; no per-sink re-read, no shuffle.
  (The reference achieves the same single-read/multi-write fan-out in
  `WriteAllOutputPlugins`, `src/output.c:256-277`.)
- output-tcp round-robin + failover (`logpipe-output-tcp.c:120-200`)
  → Spark shuffle + task retry; made explicit for hot keys via salted
  repartition (``repartition_salted``).
- HDFS day-dir naming (`logpipe-output-hdfs.c:195-213`) → partition columns;
  date partitioning is a one-liner for callers that want it.
- offset/line bookkeeping (`logpipe-input-file.c:1901-1925`) → the lineage
  table (LINEAGE_DDL): whole-snapshot conservation counters collected by an
  observe() listener ON the write action itself (see pipeline.run_pipeline)
  — zero extra passes, partition_id = -1 sentinel.

Scale notes: ``fan_out_write`` is ONE job: scan → (optional salted
repartition) → dynamic-partitioned write. At 10^12 rows the thing to avoid
is K separate filtered writes (K scans) or an unsalted shuffle where one
conversation holds 20% of rows. AQE skew handling is on as backup, but the
salt bounds the worst task deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# batch pipeline lineage rows. Two granularities in one table:
#   partition_id = -1  → whole-snapshot conservation counters, collected by
#                        an observe() listener ON the write action (zero
#                        extra passes over the source);
#   partition_id >= 0  → one row per written file (sink + file + routed
#                        count, derived from the output parquet footers —
#                        see file_lineage). rows_in/parsed/dropped are NULL
#                        at this granularity; per-file routed sums equal the
#                        sentinel row's routed.
LINEAGE_DDL = (
    "run_id string, snapshot_id long, partition_id int, "
    "rows_in long, parsed long, routed long, dropped long, "
    "sink string, file string"
)


def repartition_salted(
    df: DataFrame,
    num_partitions: int,
    key: str = "conv_id",
    salt_buckets: int = 8,
    salt_on: str = "turn_idx",
) -> DataFrame:
    """Shuffle by (key, hash(salt_on) % salt_buckets) so a hot key spreads
    over ``salt_buckets`` partitions instead of one straggler task.

    Verification-time ordering is unaffected: the (conv_id, turn_idx)
    invariant is asserted with an ORDER BY, never by partition layout
    (SURVEY.md §7.3 hard part (b))."""
    salt = F.pmod(F.hash(F.col(salt_on)), F.lit(salt_buckets))
    return df.repartition(num_partitions, F.col(key), salt)


def fan_out_write(
    routed_df: DataFrame,
    out_dir: str,
    sink_col: str = "sink",
    mode: str = "overwrite",
    extra_partition_cols: list[str] | None = None,
    shuffle_partitions: int | None = None,
    salt_on: str | None = None,
    salt_buckets: int = 8,
) -> None:
    """Single-pass dynamic-partitioned fan-out: every routed row lands in
    ``out_dir/sink=<name>/``. Dropped (NULL-sink) rows are filtered here —
    after lineage counted them.

    ``shuffle_partitions``: pre-write shuffle keyed by **(sink, salt)**.
    The shuffle has only sinks × salt_buckets distinct keys, so the file
    count is bounded by ~sinks × salt_buckets regardless of task count
    (hash collisions can merge two key-groups into one task, which the
    writer re-splits per sink — the bound still holds), instead of
    tasks × sinks when the shuffle is keyed by a high-cardinality column.
    The salt spreads a hot sink over ``salt_buckets`` tasks instead of one
    straggler. Without it the write inherits upstream partitioning (fine
    when the input is already well-split and sinks are few).

    ``salt_on``: column to derive the salt from. Default None auto-picks:
    ``turn_idx`` when present (the transcript schema's cheap high-card
    column), else a hash over all columns — so the helper works on any
    DataFrame, not just transcripts (ADVICE r2)."""
    parts = [sink_col] + (extra_partition_cols or [])
    df = routed_df.filter(F.col(sink_col).isNotNull())
    if shuffle_partitions:
        if salt_on is None and "turn_idx" in df.columns:
            salt_on = "turn_idx"
        salt_src = (
            F.hash(F.col(salt_on)) if salt_on is not None
            else F.xxhash64(*[F.col(c) for c in df.columns])
        )
        salt = F.pmod(salt_src, F.lit(salt_buckets))
        df = df.repartition(shuffle_partitions, F.col(sink_col), salt)
    df.write.mode(mode).partitionBy(*parts).parquet(out_dir)


def file_lineage(spark, data_dir: str, sink_col: str = "sink") -> DataFrame:
    """Per-file routed-row counts over a just-written snapshot directory —
    the per-partition lineage granularity (SURVEY.md §2.5's
    ``groupBy(spark_partition_id())`` requirement, re-derived from the
    OUTPUT instead of a second pass over the source).

    Cost model: the grouping keys are ``_metadata.file_path`` (file-level
    constant) and the ``sink`` directory-partition column, so the scan's
    ReadSchema is EMPTY — Spark's vectorized parquet reader answers the
    count from row-group metadata without decoding a single data column.
    A footer-only pass: ~KBs per file, distributed, regardless of data size.

    Returns (partition_id, sink, file, routed) with partition_id a dense
    0-based index over files (deterministic: ordered by path). The window
    runs over a file-count-sized table (~sinks × salt_buckets rows after
    fan_out_write's keyed shuffle), not the data.
    """
    from pyspark.sql.window import Window

    df = spark.read.option("basePath", data_dir).parquet(data_dir)
    per_file = df.groupBy(
        F.col("_metadata.file_path").alias("file"), F.col(sink_col).alias("sink")
    ).agg(F.count(F.lit(1)).alias("routed"))
    w = Window.orderBy("file")
    return per_file.select(
        (F.row_number().over(w) - 1).cast("int").alias("partition_id"),
        "sink",
        "file",
        "routed",
    )


def sink_counts(routed_df: DataFrame, sink_col: str = "sink") -> DataFrame:
    """Per-sink aggregate counts (partial+final hash agg — Catalyst default),
    the §2.5 aggregate requirement: count + distinct convs + total text bytes."""
    return (
        routed_df.filter(F.col(sink_col).isNotNull())
        .groupBy(sink_col)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("conv_id").alias("n_convs"),
            F.sum(F.length("text")).alias("text_chars"),
        )
    )
