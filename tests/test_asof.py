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


def test_gapfill_interpolate_hand_values(spark):
    """Buckets 0,1,3,6 present (interval 60 s) -> 2 interpolated between
    1 and 3, and 4,5 interpolated between 3 and 6; endpoints exact."""
    from logpipe_spark.operators.asof import gapfill_interpolate

    rows = [
        ("a", dt.datetime(2024, 1, 1, 0, 0, 10), 1.00),
        ("a", dt.datetime(2024, 1, 1, 0, 0, 50), 2.00),   # bucket 0: 300c
        ("a", dt.datetime(2024, 1, 1, 0, 1, 30), 6.00),   # bucket 1: 600c
        ("a", dt.datetime(2024, 1, 1, 0, 3, 30), 12.00),  # bucket 3: 1200c
        ("a", dt.datetime(2024, 1, 1, 0, 6, 30), 3.00),   # bucket 6: 300c
        ("b", dt.datetime(2024, 1, 1, 0, 0, 5), 5.00),    # single bucket
    ]
    events = spark.createDataFrame(rows, ["event_type", "ts", "value"])
    got = {
        (r["event_type"], r["bucket_start"]): r
        for r in gapfill_interpolate(events, interval_s=60).collect()
    }
    base = int(dt.datetime(2024, 1, 1).timestamp())
    a = {k[1] - base: v for k, v in got.items() if k[0] == "a"}
    assert sorted(a) == [0, 60, 120, 180, 240, 300, 360]
    assert (a[0]["value_cents"], a[0]["filled"]) == (300.0, False)
    assert (a[60]["value_cents"], a[60]["filled"]) == (600.0, False)
    # bucket 2 midway between 600 (b1) and 1200 (b3)
    assert (a[120]["value_cents"], a[120]["filled"]) == (900.0, True)
    assert a[180]["value_cents"] == 1200.0
    # buckets 4,5 on the 1200 -> 300 line: 900, 600
    assert (a[240]["value_cents"], a[300]["value_cents"]) == (900.0, 600.0)
    assert a[360]["value_cents"] == 300.0
    bb = [v for k, v in got.items() if k[0] == "b"]
    assert len(bb) == 1 and bb[0]["value_cents"] == 500.0 and not bb[0]["filled"]


def test_funnel_steps_hand_values(spark):
    """Strict ordering, per-step window, first-touch MIN rule, and the
    never-started key all behave."""
    from logpipe_spark.operators.asof import funnel_steps

    t0 = dt.datetime(2026, 1, 1, 10, 0)
    m = lambda minutes: t0 + dt.timedelta(minutes=minutes)
    rows = [
        # u1 full conversion: view@0, click@10, purchase@20
        (1, "view", m(0)), (1, "click", m(10)), (1, "purchase", m(20)),
        # u2: click BEFORE view never counts; later click outside window
        (2, "click", m(-5)), (2, "view", m(0)), (2, "click", m(120)),
        # u3: converts, but purchase precedes click -> stops at 2
        (3, "purchase", m(1)), (3, "view", m(0)), (3, "click", m(30)),
        # u4 never views
        (4, "purchase", m(0)),
        # u5 first-touch: two clicks qualify; earliest sets the clock and
        # the purchase is within ITS window
        (5, "view", m(0)), (5, "click", m(5)), (5, "click", m(50)),
        (5, "purchase", m(60)),
    ]
    events = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    got = {r["user_id"]: r
           for r in funnel_steps(events, ["view", "click", "purchase"],
                                 window_s=3600).collect()}
    assert got[1]["steps_reached"] == 3
    assert got[1]["last_reached_ts"] == m(20)
    assert got[2]["steps_reached"] == 1       # both clicks disqualified
    assert got[3]["steps_reached"] == 2       # purchase before click
    assert got[4]["steps_reached"] == 0
    assert got[4]["first_step_ts"] is None
    assert got[5]["steps_reached"] == 3       # clock from click@5
    assert got[5]["last_reached_ts"] == m(60)


def test_cohort_retention_hand_values(spark):
    """Two cohorts; retention counts per offset; offset 0 equals cohort
    size; an inactive middle bucket simply has no row."""
    from logpipe_spark.operators.asof import cohort_retention

    d = lambda day, h=12: dt.datetime(1970, 1, 1 + day, h)  # epoch-day d
    rows = [
        # cohort week 0 (days 0-6): users 1, 2
        (1, d(0)), (1, d(1)),          # active wk0 only... then wk2
        (1, d(15)),                    # wk2
        (2, d(3)), (2, d(8)),          # wk0, wk1
        # cohort week 1 (days 7-13): user 3
        (3, d(9)), (3, d(16)),         # wk1, wk2
    ]
    events = spark.createDataFrame(rows, ["user_id", "ts"])
    got = {
        (r["cohort_start_day"], r["bucket_offset"]): r["n_users"]
        for r in cohort_retention(events).collect()
    }
    assert got == {
        (0, 0): 2,   # users 1,2
        (0, 1): 1,   # user 2
        (0, 2): 1,   # user 1
        (7, 0): 1,   # user 3
        (7, 1): 1,   # user 3 in wk2 = offset 1
    }


def test_scd2_intervals_hand_history(spark):
    """Runs of equal values collapse; every change opens an interval
    closed by the next change; the last interval is current; composes
    with asof_join as its dimension side."""
    from logpipe_spark.operators.asof import asof_join, scd2_intervals

    t = lambda m: dt.datetime(2026, 1, 1, 10, m)
    rows = [
        (1, "bronze", t(0), 100),
        (1, "bronze", t(5), 101),   # same value -> no new interval
        (1, "gold", t(10), 102),
        (1, "bronze", t(20), 103),  # back again -> third interval
        (2, "gold", t(1), 200),
    ]
    events = spark.createDataFrame(
        rows, ["user_id", "event_type", "ts", "event_id"]
    )
    got = sorted(
        (r["user_id"], r["attr"], r["valid_from"], r["valid_to"],
         r["is_current"])
        for r in scd2_intervals(events).collect()
    )
    assert got == [
        (1, "bronze", t(0), t(10), False),
        (1, "bronze", t(20), None, True),
        (1, "gold", t(10), t(20), False),
        (2, "gold", t(1), None, True),
    ]

    # composition: as-of probe at 10:15 sees user 1 as gold
    dim = scd2_intervals(events).select(
        F.col("user_id").alias("key"), F.col("valid_from").alias("ts"),
        F.col("attr"),
    )
    probe = spark.createDataFrame([(1, t(15))], ["key", "ts"])
    j = asof_join(probe, dim, "key", "key", "ts", "ts",
                  right_payload=["attr"]).collect()
    assert len(j) == 1 and j[0]["attr"] == "gold"
