"""Shared fixtures: one session-scoped SparkSession, deterministic
transcript fixtures (FIXTURES.md), and the golden oracle run."""

from __future__ import annotations

import pytest

from logpipe_spark.fixtures import (
    default_route_rules,
    gen_tool_role_dim,
    gen_transcripts,
)
from logpipe_spark.oracle import run_reference
from logpipe_spark.session import get_spark

N_TINY = 5_000


@pytest.fixture(scope="session")
def spark():
    s = get_spark(cores=8, app_name="logpipe_spark_tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def transcripts_pdf():
    return gen_transcripts(N_TINY)


@pytest.fixture(scope="session")
def dim_pdf():
    return gen_tool_role_dim()


@pytest.fixture(scope="session")
def rules():
    return default_route_rules()


@pytest.fixture(scope="session")
def golden(transcripts_pdf, dim_pdf, rules):
    """Pure-Python reference output (the C-reference oracle stand-in)."""
    return run_reference(transcripts_pdf, dim_pdf, rules)


@pytest.fixture(scope="session")
def transcripts_df(spark, transcripts_pdf):
    return spark.createDataFrame(transcripts_pdf).cache()


@pytest.fixture(scope="session")
def dim_df(spark, dim_pdf):
    return spark.createDataFrame(dim_pdf)
