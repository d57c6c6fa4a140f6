#!/usr/bin/env python
"""End-to-end pre-training-corpus pipeline over the documents table —
the corpus-management operators chained the way a production data
pipeline runs them (C4/FineWeb/Dolma shape):

    quality gate → exact dedup → near-dup canonicalization →
    benchmark decontamination → PII scrub → line dedup →
    temperature mixing → chunk → pack → deterministic shuffle order

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
    ev = docs.filter(F.col("doc_id") % 97 == 0)
    funnel = run_corpus_funnel(spark, docs, eval_docs=ev)
    print("\n=== pre-training corpus funnel ===")
    for stage, n in funnel.items():
        print(f"{stage:22s} {n}")
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
