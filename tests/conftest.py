"""Shared pytest fixtures: one SparkSession per test run."""

from __future__ import annotations

import os

import pytest

from nutch_spark.session import get_spark

# keep test-time parallelism modest; correctness tests run on tiny data
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("nutch_spark_tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
