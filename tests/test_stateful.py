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
