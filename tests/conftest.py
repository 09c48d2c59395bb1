"""Shared fixtures: session-scoped local SparkSession + seeded data.

Mirrors the reference harness shape (local session, Arrow on, few shuffle
partitions, UI off — /root/reference/tests/conftest.py:19-41) without
copying it.
"""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="session")
def spark():
    from spark_bestfit_spark.session import get_spark

    s = get_spark(
        app_name="bestfit-tests",
        master="local[4]",
        shuffle_partitions=4,
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def normal_data():
    return np.random.default_rng(42).normal(50.0, 10.0, 10_000)


@pytest.fixture(scope="session")
def exponential_data():
    return np.random.default_rng(42).exponential(5.0, 10_000)


@pytest.fixture(scope="session")
def gamma_data():
    return np.random.default_rng(42).gamma(2.0, 2.0, 10_000)


@pytest.fixture(scope="session")
def uniform_data():
    return np.random.default_rng(42).uniform(0.0, 100.0, 10_000)


@pytest.fixture
def normal_df(spark, normal_data):
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame({"id": np.arange(len(normal_data)), "value": normal_data})
    )


SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def lineitem(spark):
    return spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
