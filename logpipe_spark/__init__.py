"""logpipe_spark — a PySpark-native parse → enrich → route → aggregate engine.

A from-scratch reimplementation of the *capabilities* of
calvinwilliams/logpipe (a C log collect→filter→forward pipeline,
``/root/reference``), re-expressed Spark-first over columnar tables of
conversation/agent transcripts ``(conv_id, turn_idx, role, text, tool, ts)``.

Architecture is NOT a port: logpipe's epoll/fork/plugin machinery maps to
Spark's scheduler + shuffle; its per-file byte-offset ledger maps to a
snapshot ledger (Iceberg-style) over Parquet; its filter/output plugins map
to declarative DataFrame stages:

    source → parse → enrich → route → fan-out sinks (+ lineage)

See SURVEY.md for the full operator-by-operator mapping with
reference ``file:line`` citations.
"""

__version__ = "0.1.0"

from logpipe_spark.session import get_spark  # noqa: F401
