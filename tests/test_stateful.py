"""applyInPandasWithState ledger: cumulative per-conversation state across
micro-batches equals a batch recomputation."""

import os

import pytest
from pyspark.sql import functions as F

from logpipe_spark.ledger import write_snapshots
from logpipe_spark.streaming.stateful import conversation_ledger_stream
from logpipe_spark.streaming.stream import TRANSCRIPT_SCHEMA


def test_conversation_ledger_matches_batch(spark, transcripts_pdf, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "ledger_out")
    write_snapshots(transcripts_pdf, src, n_snapshots=2)

    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # force ≥2 micro-batches
        .parquet(src)
    )
    def write_batch(batch_df, batch_id):
        batch_df.write.mode("overwrite").parquet(os.path.join(out, f"batch={batch_id}"))

    q = (
        conversation_ledger_stream(stream)
        .writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = spark.read.parquet(out)
    # take the final (max turns) row per conversation — cumulative state
    final = (
        got.groupBy("conv_id")
        .agg(
            F.max("turns").alias("turns"),
            F.max("chars").alias("chars"),
            F.max("violations").alias("violations"),
        )
    ).toPandas().set_index("conv_id").sort_index()

    exp = (
        transcripts_pdf.assign(chars=transcripts_pdf["text"].str.len())
        .groupby("conv_id")
        .agg(turns=("turn_idx", "size"), chars=("chars", "sum"))
        .sort_index()
    )
    assert (final["turns"] == exp["turns"]).all()
    assert (final["chars"] == exp["chars"]).all()
    # turn_idx is dense & conversations never straddle snapshots → no violations
    assert int(final["violations"].sum()) == 0


def test_assemble_conversations_stream_emits_on_idle_gap(spark, tmp_path):
    """A conversation's doc is emitted exactly once, after the event-time
    watermark passes its idle gap, and matches the batch assembler.
    Construction: three snapshots an hour apart; processing snapshot k+2
    advances the watermark past snapshot k's conversation gap (the
    watermark lags one batch), so with availableNow only conv 'a' (the
    earliest) flushes — 'b' and 'c' are still open when the stream ends."""
    import pandas as pd

    from logpipe_spark.operators.transcripts import assemble_documents
    from logpipe_spark.streaming.stateful import assemble_conversations_stream

    t0 = pd.Timestamp("2024-01-01 00:00:00")
    rows = []
    for k, conv in enumerate(["a", "b", "c"]):
        for j in range(3):
            rows.append(
                (conv, j, "user", f"{conv} turn {j}", "none",
                 t0 + pd.Timedelta(hours=k, seconds=j))
            )
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")  # TRANSCRIPT_SCHEMA int
    src = str(tmp_path / "src")
    # one snapshot per conversation → one micro-batch each
    write_snapshots(pdf, src, n_snapshots=3)

    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = str(tmp_path / "assembled")
    q = (
        assemble_conversations_stream(stream, gap="10 minutes",
                                      watermark_delay="1 minute")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = spark.read.parquet(out).collect()
    emitted = {r["conv_id"]: (r["doc"], r["n_turns"]) for r in got}
    # snapshots may not map 1:1 to conversations (round-robin split), so
    # derive the expectation from the batch assembler for whatever closed;
    # at minimum the earliest conversation must have flushed, and nothing
    # may be emitted twice
    assert len(got) == len(emitted)
    want = {
        r["conv_id"]: (r["doc"], r["n_turns"])
        for r in assemble_documents(
            spark.createDataFrame(pdf).withColumn(
                "turn_idx", F.col("turn_idx").cast("long"))
        ).collect()
    }
    assert "a" in emitted
    for conv, val in emitted.items():
        assert val == want[conv], conv


def test_assemble_stream_restart_exactly_once(spark, tmp_path):
    """Checkpoint resume: stop after the early snapshots, add a later one,
    restart with the SAME checkpoint — each closed conversation's document
    appears exactly once across both runs, with state carried over."""
    import pandas as pd

    from logpipe_spark.streaming.stateful import assemble_conversations_stream

    t0 = pd.Timestamp("2024-01-01 00:00:00")
    rows = []
    for k, conv in enumerate(["a", "b", "c"]):
        for j in range(3):
            rows.append(
                (conv, j, "user", f"{conv} turn {j}", "none",
                 t0 + pd.Timedelta(hours=k, seconds=j))
            )
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")

    src = str(tmp_path / "src")
    out = str(tmp_path / "assembled")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = (
            spark.readStream.schema(TRANSCRIPT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            assemble_conversations_stream(stream, gap="10 minutes",
                                          watermark_delay="1 minute")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    # run 1: conversations a and b only — nothing can close yet or at
    # most 'a' does, depending on snapshot order
    write_snapshots(pdf[pdf["conv_id"] != "c"], src, n_snapshots=2)
    run()
    first = spark.read.parquet(out).collect() if os.listdir(out) else []

    # run 2: conversation c arrives an hour later → advances the
    # watermark past a's and b's gaps on resume
    os.makedirs(os.path.join(src, "snapshot=2"), exist_ok=True)
    pdf[pdf["conv_id"] == "c"].to_parquet(
        os.path.join(src, "snapshot=2", "part-0.parquet"), index=False
    )
    run()

    got = spark.read.parquet(out).collect()
    counts = {}
    for r in got:
        counts[r["conv_id"]] = counts.get(r["conv_id"], 0) + 1
    # exactly-once across the restart: no conversation emitted twice
    assert all(v == 1 for v in counts.values()), counts
    # 'a' must have closed by the end (c's data out-waits its gap, and
    # the state carried over the restart held all of a's turns)
    assert counts.get("a") == 1
    a_doc = [r for r in got if r["conv_id"] == "a"][0]
    assert a_doc["doc"] == "a turn 0\na turn 1\na turn 2"
    assert a_doc["n_turns"] == 3
    assert len(first) <= len(got)
