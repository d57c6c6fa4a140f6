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

import glob
import os
from urllib.parse import unquote

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
    max_records_per_file: int | None = None,
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
    DataFrame, not just transcripts (ADVICE r2).

    ``max_records_per_file``: upper-bound rows per output file (Spark's
    per-write knob, not a shuffle) — the write-time half of the
    small/large-file control; the read-time half is
    ``operators/compact.py`` for files that came out too SMALL. Set it
    from target_bytes / avg_row_bytes; 0/None = no cap."""
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
    writer = df.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.partitionBy(*parts).parquet(out_dir)


def file_lineage_rows(data_dir: str, sink_col: str = "sink") -> list[tuple]:
    """Per-file routed-row counts from parquet FOOTERS, read driver-side
    with pyarrow — zero Spark jobs.

    ``fan_out_write``'s (sink, salt)-keyed shuffle bounds the file count at
    ~sinks × salt_buckets regardless of data size, so after the write the
    per-file lineage is a handful of footer reads (~KBs each) — launching a
    Spark job for it costs more than the answer (measured: the distributed
    variant added ~13 s of cold-JVM WindowExec/metadata-scan codegen to the
    benched pipeline; this list comprehension adds milliseconds). For a
    layout whose file count is NOT bounded (no keyed shuffle, object store
    with thousands of files), use the distributed ``file_lineage`` below.

    Returns [(partition_id, sink, file, routed)] with partition_id a dense
    0-based index over files ordered by path (same contract as
    ``file_lineage``). The routed count per file is the footer's num_rows:
    every row in a ``sink=<name>/`` directory was routed to that sink.
    """
    import pyarrow.parquet as pq

    files = sorted(
        glob.glob(os.path.join(data_dir, "**", "*.parquet"), recursive=True)
    )
    rows = []
    for i, f in enumerate(files):
        sink = None
        for part in os.path.relpath(f, data_dir).split(os.sep):
            if part.startswith(sink_col + "="):
                # Spark %-escapes special chars in partition dir names
                sink = unquote(part.split("=", 1)[1])
        rows.append((i, sink, f, pq.ParquetFile(f).metadata.num_rows))
    return rows


def local_path(path: str) -> str | None:
    """The POSIX path behind ``path``, or None when it names a non-local
    filesystem. Driver-side footer/lineage shortcuts only apply to paths
    the driver can os.open: plain paths and ``file:`` URIs qualify;
    ``hdfs://``/``s3a://``/... do not (callers fall back to the
    distributed variants)."""
    if path.startswith("file://"):
        return path[len("file://"):] or "/"
    if path.startswith("file:"):
        return path[len("file:"):]
    if "://" in path:
        return None
    return path


_ARROW_TYPES = {"string": "string", "long": "int64", "int": "int32"}


def write_lineage_parquet(rows: list[tuple], ddl: str, path: str) -> None:
    """Write a tiny lineage table driver-side with pyarrow — overwrite
    semantics (the dir is replaced).

    A ~50-row metadata artifact does not need a Spark job: a
    ``coalesce(1)`` write of a parallelized local collection runs ONE
    python worker over all N input partitions sequentially (measured
    4.7 s for 50 rows at local[32]; this is ~5 ms). Crash-safety is
    unchanged: the snapshot ledger commits AFTER this write, so a partial
    file from a crash is overwritten wholesale on resume."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    fields = []
    for spec in ddl.split(","):
        name, typ = spec.strip().split()
        fields.append(pa.field(name, _ARROW_TYPES[typ]))
    schema = pa.schema(fields)
    cols = list(zip(*rows)) if rows else [[]] * len(fields)
    arrays = [
        pa.array(list(c), type=f.type) for c, f in zip(cols, schema)
    ]
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    pq.write_table(
        pa.table(arrays, schema=schema), os.path.join(path, "part-00000.parquet")
    )


def source_file_rows(paths: list[str]) -> list[tuple]:
    """Per-INPUT-file row counts from source parquet footers, driver-side.

    The per-input-split half of SURVEY.md §2.5's lineage requirement
    (the reference's per-file offset bookkeeping,
    `logpipe-input-file.c:1901-1925`): rows_in is a physical property of
    each source file, available from its footer without any data pass.
    parsed/routed/dropped at input-file granularity would require keying
    the whole parse→route chain by ``_metadata.file_path`` — a second data
    pass the reference doesn't do either; those are covered at snapshot
    granularity by the observe() counters, and the conservation law
    (sum rows_in = routed + dropped) ties the two granularities together.

    Returns [(partition_id, file, rows_in)] ordered by path."""
    import pyarrow.parquet as pq

    rows = []
    for i, p in enumerate(sorted(paths)):
        try:
            n = pq.ParquetFile(p).metadata.num_rows
        except Exception as exc:
            # name the offending path: an unreadable source entry must be
            # diagnosable from the message, not from a pyarrow traceback
            # with no filename (the write already happened; the caller's
            # snapshot stays uncommitted and the re-run hits this again)
            raise ValueError(
                f"source_file_rows: {p!r} is not a readable parquet file "
                f"({exc}) — the input-edge lineage requires every "
                "non-hidden file in the snapshot dir to be parquet"
            ) from exc
        rows.append((i, p, n))
    return rows


def file_lineage(spark, data_dir: str, sink_col: str = "sink") -> DataFrame:
    """Distributed variant of ``file_lineage_rows`` — per-file routed-row
    counts as a DataFrame, for layouts whose file count is unbounded
    (object-store listings where a driver-side footer loop would
    serialize on the driver instead of fanning out).

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
    # canonical file form: plain POSIX path for local files (matching the
    # driver-side file_lineage_rows/source_file_rows emissions), scheme'd
    # URI for genuinely remote files — _metadata.file_path is always a
    # file: URI locally, which would otherwise leak a second representation
    # into consumers joining lineage across modes/rounds
    per_file = df.groupBy(
        F.regexp_replace(
            F.col("_metadata.file_path"), r"^file:(//)?", ""
        ).alias("file"),
        F.col(sink_col).alias("sink"),
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
