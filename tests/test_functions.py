"""functions/text.py parity with the reference's string-function semantics."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from logpipe_spark.functions.text import (
    date_path,
    fields_strictly,
    filename_key_cut,
    grep_contains,
    pack_metadata,
    recode,
    template_nsub,
    tokenize,
    translate_charset,
    unpack_metadata,
)


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (0, "alpha beta  gamma", "app_server_01.log"),
        (1, "[x]|y[z]", "db_primary.log"),
        (2, "one", "noextension"),
        (3, "contains needle here", "a_b_c_d.log"),
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["id", "text", "fname"])
    ).cache()


def test_pack_unpack_roundtrip(spark, df):
    packed = pack_metadata(
        F.lit("sys1"), F.lit("srv2"), F.col("fname"), F.lit(123), F.lit(45)
    )
    u = unpack_metadata(F.col("p"))
    out = (
        df.select("id", packed.alias("p"))
        .select("id", "p", u.alias("u"))
        .select("id", "u.system", "u.server", "u.filename", "u.offset", "u.line", "u.rest")
        .collect()
    )
    for r in out:
        assert r["system"] == "sys1"
        assert r["server"] == "srv2"
        assert r["offset"] == 123
        assert r["line"] == 45
        assert r["rest"] == ""


def test_unpack_no_header_gives_nulls(spark, df):
    u = unpack_metadata(F.col("text"))
    row = df.filter(F.col("id") == 0).select(u.alias("u")).collect()[0]["u"]
    assert row["system"] is None and row["offset"] is None


def test_tokenize_collapses_runs(df):
    row = df.filter(F.col("id") == 0).select(
        tokenize(F.col("text")).alias("t")
    ).collect()[0]
    assert row["t"] == ["alpha", "beta", "gamma"]


def test_translate_charset(df):
    row = df.filter(F.col("id") == 1).select(
        translate_charset(F.col("text"), "[]|").alias("t")
    ).collect()[0]
    assert row["t"] == " x  y z "


def test_fields_strictly(df):
    assert fields_strictly(df, 3).count() == 2  # ids 0 and 3
    assert fields_strictly(df, 1).count() == 4


def test_grep(df):
    assert grep_contains(df, "needle").count() == 1


def test_template_nsub(df):
    t = template_nsub("k=$0 a=$1 c=$3 missing=$9!", F.col("fname"), tokenize(F.col("text")))
    row = df.filter(F.col("id") == 0).select(t.alias("r")).collect()[0]
    assert row["r"] == "k=app_server_01.log a=alpha c=gamma missing=!"


def test_filename_key_cut(df):
    got = {
        r["id"]: r["k"]
        for r in df.select("id", filename_key_cut(F.col("fname"), 2).alias("k")).collect()
    }
    assert got[0] == "app_server"
    assert got[1] == "db_primary.log".replace(".log", "")  # only 2 words exist
    assert got[3] == "a_b"


def test_date_path(spark):
    import datetime

    d = spark.createDataFrame(
        pd.DataFrame({"ts": [datetime.datetime(2026, 3, 5, 7, 8, 9)]})
    )
    assert d.select(date_path(F.col("ts")).alias("p")).collect()[0]["p"] == "20260305"


def test_recode_gbk_roundtrip(spark):
    """GB18030 → UTF-8 (the reference's iconv case, press_logpipe.c GBK payloads)."""
    s = "日志内容"
    gbk = s.encode("GB18030")
    d = spark.createDataFrame([(bytearray(gbk),)], "b: binary")
    out = d.select(
        F.decode(recode(F.col("b"), "GB18030", "UTF-8"), "UTF-8").alias("s")
    ).collect()[0]["s"]
    assert out == s
