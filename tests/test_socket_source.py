"""Live end-to-end exercise of socket_source against a loopback TCP server —
upgrades input-tcp (`src-plugins/logpipe-input-tcp.c:154-361`) from
construction-only to tested. The reference's framing protocol carries
(filename, block) over a raw socket; here the wire format is plain
line-framed text (Spark's socket source contract) and the collector tier it
fed is replaced by Spark's own shuffle, so the parity surface is: lines in
over TCP → parsed → routed → per-sink counts equal the Python oracle."""

from __future__ import annotations

import socket
import threading
import time

import pytest
from pyspark.sql import functions as F

from logpipe_spark.sources.readers import socket_source

LINES = [
    # role \t tool \t text
    ("assistant", "bash", "run the tests please"),
    ("assistant", "python", "import numpy as np"),
    ("user", "", "hello there"),
    ("assistant", "bash", "ERROR: command failed"),
    ("tool", "bash", "exit 0"),
    ("assistant", "", "here is the answer"),
    ("user", "", "thanks"),
    ("tool", "python", "Traceback (most recent call last)"),
] * 25  # 200 lines


def _route_oracle(lines):
    """Pure-Python mirror of the routing rules used below."""
    counts = {}
    for role, tool, text in lines:
        if "ERROR" in text or "Traceback" in text:
            sink = "sink_errors"
        elif role == "assistant" and tool:
            sink = "sink_tool"
        else:
            sink = "sink_default"
        counts[sink] = counts.get(sink, 0) + 1
    return counts


class _LineServer(threading.Thread):
    """One-shot loopback server: accepts a single client, writes every
    line, then holds the connection open until stopped (closing early can
    race the socket source's read loop)."""

    def __init__(self, lines):
        super().__init__(daemon=True)
        self.lines = lines
        self.srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.srv.bind(("127.0.0.1", 0))
        self.srv.listen(1)
        self.port = self.srv.getsockname()[1]
        self._stop = threading.Event()

    def run(self):
        conn, _ = self.srv.accept()
        with conn:
            payload = "".join(
                f"{role}\t{tool}\t{text}\n" for role, tool, text in self.lines
            )
            conn.sendall(payload.encode())
            self._stop.wait(timeout=120)

    def stop(self):
        self._stop.set()
        self.srv.close()


def test_socket_source_end_to_end(spark):
    server = _LineServer(LINES)
    server.start()

    raw = socket_source(spark, "127.0.0.1", server.port)
    parts = F.split(F.col("value"), "\t")
    parsed = raw.select(
        parts.getItem(0).alias("role"),
        parts.getItem(1).alias("tool"),
        parts.getItem(2).alias("text"),
    )
    routed = parsed.withColumn(
        "sink",
        F.when(
            F.col("text").contains("ERROR") | F.col("text").contains("Traceback"),
            F.lit("sink_errors"),
        )
        .when(
            (F.col("role") == "assistant") & (F.col("tool") != ""),
            F.lit("sink_tool"),
        )
        .otherwise(F.lit("sink_default")),
    )
    agg = routed.groupBy("sink").agg(F.count(F.lit(1)).alias("n"))

    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("socket_e2e")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        expected = _route_oracle(LINES)
        deadline = time.monotonic() + 120
        got = {}
        while time.monotonic() < deadline:
            got = {
                r["sink"]: r["n"]
                for r in spark.sql("SELECT * FROM socket_e2e").collect()
            }
            if got == expected:
                break
            time.sleep(0.5)
        assert got == expected, f"routed counts {got} != oracle {expected}"
    finally:
        q.stop()
        server.stop()
