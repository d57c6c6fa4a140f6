#!/usr/bin/env python
"""spark-submit entrypoint: run the pipeline from a spec JSON.

Cluster usage (the north rule's deployment shape):

    python scripts/make_pyfiles.py                       # builds dist/logpipe_spark.zip
    spark-submit --master <cluster> \
        --py-files dist/logpipe_spark.zip \
        scripts/submit_pipeline.py --spec pipeline.json

On a cluster the SparkSession comes from spark-submit's conf (master,
executors); locally it falls back to local[*].
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--spec", required=True, help="pipeline spec JSON file")
    ap.add_argument("--print-counts", action="store_true")
    args = ap.parse_args()

    # on spark-submit the zip is on sys.path already; running the script
    # directly from the repo needs the repo root
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from logpipe_spark.plans.spec import PipelineSpec
    from logpipe_spark.pipeline import read_sinks

    spark = (
        SparkSession.builder.appName("logpipe_spark_submit")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spec = PipelineSpec.from_file(args.spec)
    result = spec.run(spark)
    out = {"run_id": result["run_id"], "processed": result["processed"]}
    if args.print_counts:
        counts = {
            r["sink"]: r["n"]
            for r in read_sinks(spark, spec.out_dir)
            .groupBy("sink")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        out["sink_counts"] = counts
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
