"""The composed pipeline: source → parse → enrich → route → fan-out + lineage.

This is the Spark-native replacement for the reference's single dataflow
operator `WriteAllOutputPlugins` (`src/output.c:103-355`): where logpipe
drives Read → K×Process → M×Write per 100 KB block under epoll, here the
whole flow is ONE declarative DataFrame chain per snapshot — Catalyst fuses
parse+route into the scan projection, the enrich join is broadcast (no fact
shuffle), and the fan-out write is a single dynamic-partitioned pass.

Crash/restart semantics (`src/monitor.c:89-181` + offset commit
`logpipe-input-file.c:1901-1925`) become: process pending snapshots in
order; per snapshot overwrite-then-commit via ``SnapshotLedger`` —
exactly-once instead of the reference's at-least-once.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from logpipe_spark.ledger import SnapshotLedger
from logpipe_spark.operators.enrich import enrich
from logpipe_spark.operators.parse import extract_builtin, extract_pandas
from logpipe_spark.operators.route import route
from logpipe_spark.operators.sinks import (
    LINEAGE_DDL,
    fan_out_write,
    file_lineage_rows,
    source_file_rows,
    write_lineage_parquet,
)


def build_stage_chain(
    df: DataFrame,
    dim: DataFrame,
    rules: list[dict],
    parser: str = "builtin",
    dim_keys: list[str] | None = None,
) -> DataFrame:
    """parse → enrich → route on an already-loaded transcript DataFrame.
    Returns the routed DataFrame (sink column nullable; NULL = dropped)."""
    parse = extract_pandas if parser == "pandas" else extract_builtin
    parsed = parse(df)
    enriched = enrich(parsed, dim, keys=dim_keys or ["tool", "role"], how="left")
    return route(enriched, rules)


def run_pipeline(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    dim: DataFrame,
    rules: list[dict],
    run_id: str | None = None,
    parser: str = "builtin",
    salt_partitions: int | None = None,
    fail_after_write_snapshot: int | None = None,
    dim_keys: list[str] | None = None,
    include_files: list[str] | None = None,
    exclude_files: list[str] | None = None,
    min_input_partitions: int | None = 0,
    per_file_lineage: bool = True,
) -> dict:
    """Process every pending snapshot under ``src_dir`` exactly once.

    ``min_input_partitions``: under-split sources (a snapshot that is one
    parquet file with one row group is ONE scan task — the whole
    parse→route stage runs single-threaded no matter how many cores) are
    repartitioned up to this many partitions before parsing. Default 0 →
    the session's default parallelism. Pass None to disable. Well-split
    sources are never touched, so at scale this is a free plan check.

    ``include_files`` / ``exclude_files``: source-level basename glob
    filters (the reference's files../exclude_files.. walk) — pruned from
    the file LIST before the scan, so excluded files cost zero IO. A
    snapshot whose files are all filtered out commits with zero-row
    lineage (the reference likewise commits nothing and moves on).

    ``fail_after_write_snapshot``: test hook — raise after writing (before
    committing) that snapshot, simulating a worker crash at the worst moment.

    ``per_file_lineage``: include the per-OUTPUT-file rows (read from the
    written parquet footers). Snapshot totals and per-INPUT-file rows are
    always written. Explicit kwarg, not ambient env, so a bench A/B can't
    leak into production behavior.

    Path contract: ``src_dir``/``out_dir`` must be POSIX-visible — the
    snapshot ledger itself is os-level (see ledger.py; the documented
    object-store swap is an Iceberg catalog, which replaces the ledger AND
    the footer reads wholesale). The driver-side pyarrow footer reads
    share that contract; the distributed ``operators.sinks.file_lineage``
    exists for layouts where it doesn't hold.

    Returns {run_id, processed: [snapshot ids], lineage_rows: int}.
    """
    from logpipe_spark.sources.readers import select_input_files

    run_id = run_id or uuid.uuid4().hex[:12]
    ledger = SnapshotLedger(out_dir)
    data_root = os.path.join(out_dir, "data")
    lineage_root = os.path.join(out_dir, "lineage")
    processed = []

    for snap in ledger.pending(src_dir):
        snap_dir = os.path.join(src_dir, f"snapshot={snap}")
        src_paths = None
        if include_files or exclude_files:
            src_paths = paths = select_input_files(
                snap_dir, include_files, exclude_files
            )
            if not paths:
                write_lineage_parquet(
                    [(run_id, int(snap), -1, 0, 0, 0, 0, None, None)],
                    LINEAGE_DDL,
                    os.path.join(lineage_root, f"snapshot={snap}"),
                )
                ledger.commit(snap, run_id)
                processed.append(snap)
                continue
            df = spark.read.parquet(*paths)
        else:
            df = spark.read.parquet(snap_dir)
        if min_input_partitions is not None:
            target = min_input_partitions or spark.sparkContext.defaultParallelism
            # getNumPartitions reads the plan, not the data — no job runs
            if df.rdd.getNumPartitions() < target:
                df = df.repartition(target)
        routed = build_stage_chain(df, dim, rules, parser=parser, dim_keys=dim_keys)

        # ONE action per snapshot: conservation counters ride the write via
        # observe() (collected by a listener, zero extra reads) instead of a
        # separate aggregation action over a persisted copy — the
        # single-read/multi-write invariant of the reference's
        # output.c:256-277, now including the bookkeeping. The observe node
        # sits above the route stage and below fan_out_write's NULL-sink
        # filter, so dropped rows are counted, then discarded.
        obs = Observation(f"lineage_{run_id}_s{snap}")
        routed = routed.observe(
            obs,
            F.count(F.lit(1)).alias("rows_in"),
            F.count("n_fields").alias("parsed"),
            F.count("sink").alias("routed"),
            F.coalesce(
                F.sum(F.col("sink").isNull().cast("long")), F.lit(0)
            ).alias("dropped"),
        )
        # the write-side shuffle keys by (sink, salt) — one sink per task,
        # hot sinks spread over salt_buckets tasks, ~salt_partitions output
        # files instead of tasks×sinks (repartition_salted by conv_id
        # remains the right key when a downstream consumer, not the file
        # layout, needs co-located conversations)
        snap_data = os.path.join(data_root, f"snapshot={snap}")
        fan_out_write(routed, snap_data, shuffle_partitions=salt_partitions)

        m = obs.get
        # Three granularities in one tiny table, all collected WITHOUT a
        # second pass over the data:
        #   partition_id=-1, sink+file NULL  → whole-snapshot observe()
        #                                      counters (ride the write);
        #   partition_id>=0, sink NOT NULL   → one row per OUTPUT file
        #                                      (routed from its footer);
        #   partition_id>=0, sink NULL       → one row per INPUT file
        #                                      (rows_in from its footer).
        # Footers are read driver-side with pyarrow: fan_out_write's keyed
        # shuffle bounds output files at ~sinks×salt_buckets, so this is a
        # handful of KB-sized reads — the previous Spark-job variant
        # (file_lineage + Window) cost ~13 s of cold-JVM codegen per bench
        # run for the same rows (BENCH.md r4 A/B).
        lineage_rows = [
            (
                run_id, int(snap), -1,
                m["rows_in"], m["parsed"], m["routed"], m["dropped"],
                None, None,
            )
        ]
        if m["routed"] and per_file_lineage:
            for pid, sink, f, n_routed in file_lineage_rows(snap_data):
                lineage_rows.append(
                    (run_id, int(snap), pid, None, None, n_routed, None, sink, f)
                )
        if src_paths is None:
            # mirror Spark's data-file rule: every non-hidden FILE at any
            # depth counts (a parquet part without the .parquet suffix is
            # still read by the scan, and a partitioned subdirectory's
            # parts are too, so both must appear in the input-edge lineage
            # or conservation breaks); directories themselves are walked,
            # never handed to the footer reader — a flat listing here once
            # fed a subdirectory to pq.ParquetFile, crashing after the
            # data write and poisoning every resume
            src_paths = []
            for dirpath, dirnames, filenames in os.walk(snap_dir):
                dirnames[:] = sorted(
                    d for d in dirnames if not d.startswith((".", "_"))
                )
                src_paths += [
                    os.path.join(dirpath, n)
                    for n in filenames
                    if not n.startswith((".", "_"))
                ]
        for pid, f, rows_in in source_file_rows(src_paths):
            lineage_rows.append(
                (run_id, int(snap), pid, rows_in, None, None, None, None, f)
            )
        write_lineage_parquet(
            lineage_rows, LINEAGE_DDL,
            os.path.join(lineage_root, f"snapshot={snap}"),
        )

        if fail_after_write_snapshot == snap:
            raise RuntimeError(f"injected crash after write of snapshot {snap}")

        ledger.commit(snap, run_id)
        processed.append(snap)

    return {"run_id": run_id, "processed": processed}


def read_sinks(spark: SparkSession, out_dir: str) -> DataFrame:
    """All routed rows across committed snapshots, with sink + snapshot cols.

    Only committed snapshots are visible — an uncommitted (crashed) write is
    invisible to readers, mirroring Iceberg snapshot isolation."""
    ledger = SnapshotLedger(out_dir)
    committed = sorted(ledger.committed())
    if not committed:
        raise ValueError(f"no committed snapshots under {out_dir}")
    # a snapshot where every row was dropped writes no parquet files — skip it
    paths = [
        p
        for s in committed
        if os.path.isdir(p := os.path.join(out_dir, "data", f"snapshot={s}"))
        and any(n.startswith("sink=") for n in os.listdir(p))
    ]
    if not paths:
        raise ValueError(
            f"no routed rows in any committed snapshot under {out_dir} "
            "(every row dropped by the route rules?)"
        )
    return spark.read.option("basePath", os.path.join(out_dir, "data")).parquet(*paths)


def read_lineage(spark: SparkSession, out_dir: str) -> DataFrame:
    ledger = SnapshotLedger(out_dir)
    committed = sorted(ledger.committed())
    if not committed:
        raise ValueError(f"no committed snapshots under {out_dir}")
    paths = [os.path.join(out_dir, "lineage", f"snapshot={s}") for s in committed]
    # mergeSchema: the lineage DDL widened from 8 to 10 columns (sink, file)
    # in round 3 — an out_dir resumed across that change mixes schemas, and
    # without merging, the read's schema would depend on which file is
    # sampled first (ADVICE r3). The table is tiny; merging is free.
    return spark.read.option("mergeSchema", "true").option(
        "basePath", os.path.join(out_dir, "lineage")
    ).parquet(*paths)


def sink_table(spark: SparkSession, out_dir: str, sink: str) -> DataFrame:
    return read_sinks(spark, out_dir).filter(F.col("sink") == sink)
