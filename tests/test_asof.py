"""as-of / range join semantics on crafted rows (boundaries, unmatched)."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from logpipe_spark.operators.asof import asof_join, range_join


@pytest.fixture(scope="module")
def tables(spark):
    probes = spark.createDataFrame(
        pd.DataFrame(
            {
                "pid": [1, 2, 3, 4],
                "k": ["a", "a", "a", "b"],
                "pts": [
                    dt.datetime(2024, 1, 5),
                    dt.datetime(2024, 1, 10),   # exactly equal to a state ts
                    dt.datetime(2023, 12, 1),   # before any state
                    dt.datetime(2024, 6, 1),    # key with no state at all
                ],
            }
        )
    )
    states = spark.createDataFrame(
        pd.DataFrame(
            {
                "k2": ["a", "a"],
                "sts": [dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 10)],
                "payload": ["v_jan1", "v_jan10"],
            }
        )
    )
    return probes, states


def test_asof_backward_semantics(tables):
    probes, states = tables
    out = asof_join(
        probes, states, "k", "k2", "pts", "sts",
        right_payload=["payload", "sts"], how="inner",
    )
    got = {r["pid"]: r["payload"] for r in out.collect()}
    assert got == {1: "v_jan1", 2: "v_jan10"}  # pid2: ts == state ts → matches it


def test_asof_left_keeps_unmatched(tables):
    probes, states = tables
    out = asof_join(
        probes, states, "k", "k2", "pts", "sts",
        right_payload=["payload"], how="left",
    )
    got = {r["pid"]: r["payload"] for r in out.collect()}
    assert got == {1: "v_jan1", 2: "v_jan10", 3: None, 4: None}


def test_range_join_boundaries(spark):
    facts = spark.createDataFrame(
        pd.DataFrame({"v": [0.0, 49.999, 50.0, 149.999, 150.0, -1.0]})
    )
    bands = spark.createDataFrame(
        [(0.0, 50.0, "low"), (50.0, 150.0, "mid"), (150.0, 1e9, "high")],
        "lo double, hi double, label string",
    )
    got = {r["v"]: r["label"] for r in range_join(facts, bands, "v").collect()}
    assert got == {0.0: "low", 49.999: "low", 50.0: "mid",
                   149.999: "mid", 150.0: "high"}  # -1.0 dropped (inner)
    left = range_join(facts, bands, "v", how="left")
    assert left.filter(F.col("label").isNull()).count() == 1
