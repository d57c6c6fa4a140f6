#!/usr/bin/env python
"""End-to-end pre-training-corpus pipeline over the documents table —
the corpus-management operators chained the way a production data
pipeline runs them (C4/FineWeb/Dolma shape):

    URL blocklist → HTML extract → NFC clean → quality gate →
    classifier gate →
    exact dedup → near-dup canonicalization → benchmark
    decontamination → PII scrub → line dedup → temperature mixing →
    chunk → pack → deterministic shuffle order

The composition lives in the library
(`logpipe_spark/plans/corpus_funnel.py` — bench.py times the same
function); this script runs it on fixture data and prints the funnel.
Run: python examples/pretrain_corpus.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from logpipe_spark.plans.corpus_funnel import run_corpus_funnel
from logpipe_spark.session import get_spark


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark(cores=8, shuffle_partitions=8)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(8)
    # stage a crawl-shaped input: a planted URL column + the text wrapped
    # in markup, exactly what the three optional crawl gates consume
    crawl = docs.select(
        "doc_id", "lang", "source", "n_chars",
        F.concat(
            F.lit("https://"),
            F.when(F.col("doc_id") % 11 == 0, F.lit("ads.tracker.net"))
            .otherwise(F.concat(F.lit("site"), (F.col("doc_id") % 7).cast("string"), F.lit(".org"))),
            F.lit("/p/"), F.col("doc_id").cast("string"),
        ).alias("url"),
        F.concat(F.lit("<p>"), F.col("text"),
                 F.lit("</p><script>t()</script>")).alias("html"),
    )
    bl = spark.createDataFrame([("tracker.net",)], "domain string")
    ev = docs.filter(F.col("doc_id") % 97 == 0)
    funnel = run_corpus_funnel(
        spark, crawl, eval_docs=ev,
        html_col="html", url_blocklist=bl, classifier_threshold=-1.0,
    )
    print("\n=== pre-training corpus funnel ===")
    for stage, n in funnel.items():
        print(f"{stage:22s} {n}")
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
