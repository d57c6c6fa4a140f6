#!/usr/bin/env python
"""End-to-end pre-training-corpus pipeline over the documents table —
the corpus-management operators chained the way a production data
pipeline runs them (C4/FineWeb/Dolma shape):

    quality gate → exact dedup → near-dup canonicalization →
    benchmark decontamination → PII scrub → line dedup →
    temperature mixing → quantile tranches → chunk → pack →
    deterministic shuffle order

Each stage is one of this repo's oracle-checked operators; this script
is the composition, printing the funnel (docs in → docs out per stage).
Run: cd /root/repo && python examples/pretrain_corpus.py [sf_dir]

Every stage keeps the scale shape documented on its operator: hash
groupBys, broadcast eval sets, id-only candidate shuffles — nothing
here collects a corpus-sized result to the driver.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from logpipe_spark.operators.corpus import (
    chunk_documents,
    corpus_filter,
    pii_redact,
    quantile_buckets,
    sequence_pack,
    shuffle_corpus,
    temperature_mix,
)
from logpipe_spark.operators.dedup import (
    dedup_lines,
    exact_dedup,
    neardup_keep_best,
    ngram_jaccard_pairs,
)
from logpipe_spark.operators.corpus import decontaminate
from logpipe_spark.session import get_spark


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark(cores=8, shuffle_partitions=8)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(8)
    funnel = [("input", docs.count())]

    # 1. C4-style quality gate (keep + first-failed-rule accounting)
    gated = corpus_filter(docs).filter(F.col("keep")).join(docs, "doc_id").select(
        docs["*"]
    )
    funnel.append(("quality_gate", gated.count()))

    # 2. exact dedup (lowest doc_id wins)
    exact = exact_dedup(gated)
    funnel.append(("exact_dedup", exact.count()))

    # 3. near-dup clusters -> keep the BEST doc per cluster (longest)
    pairs = ngram_jaccard_pairs(exact, n=3, threshold=0.8).select("doc_a", "doc_b")
    keep = neardup_keep_best(
        exact.select("doc_id", F.length("text").cast("long").alias("n_chars")),
        pairs,
    )
    deduped = exact.join(keep.filter("keep").select("doc_id"), "doc_id")
    funnel.append(("neardup_keep_best", deduped.count()))

    # 4. benchmark decontamination (stand-in eval set: doc_id % 97 == 0)
    ev = docs.filter(F.col("doc_id") % 97 == 0)
    flags = decontaminate(deduped, ev, n=8, min_overlap=3)
    clean = deduped.join(
        flags.filter(~F.col("contaminated")).select("doc_id"), "doc_id"
    )
    funnel.append(("decontaminate", clean.count()))

    # 5. PII scrub + cross-document line dedup (boilerplate removal)
    scrubbed = pii_redact(clean).drop("text").withColumnRenamed(
        "text_redacted", "text"
    )
    lined = dedup_lines(scrubbed, min_docs=5).filter(F.col("clean_text") != "")
    lined = lined.join(scrubbed.drop("text"), "doc_id").withColumnRenamed(
        "clean_text", "text"
    )
    funnel.append(("pii+line_dedup", lined.count()))

    # 6. temperature-alpha language rebalancing (alpha=0.5)
    mixed = lined.join(
        temperature_mix(lined, alpha=0.5, group_col="lang").select("doc_id"),
        "doc_id",
    )
    funnel.append(("temperature_mix", mixed.count()))

    # 7. quantile tranches by length (audit columns, no row change)
    tranches = quantile_buckets(mixed, score_col="n_chars", k=4)
    bucket_counts = {
        r["bucket"]: r["count"]
        for r in tranches.groupBy("bucket").count().collect()
    }

    # 8. chunk to 128-token windows, pack to 256-token bins
    chunks = chunk_documents(mixed, chunk_size=128)
    packed = sequence_pack(
        chunks.select(
            (F.col("doc_id") * 1000 + F.col("chunk_idx")).alias("doc_id"),
            F.col("chunk_text").alias("text"),
        ),
        budget=256,
    )
    funnel.append(("chunks", chunks.count()))
    funnel.append(("packed_bins", packed.select("pack_id").distinct().count()))

    # 9. deterministic global shuffle order for the training reader
    ordered = shuffle_corpus(mixed, num_shards=8, seed="epoch0")
    funnel.append(("shuffled", ordered.count()))

    print("\n=== pre-training corpus funnel ===")
    for stage, n in funnel:
        print(f"{stage:22s} {n}")
    print("length tranches:", dict(sorted(bucket_counts.items())))
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
