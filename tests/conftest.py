import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from telemetry_streaming_datalake_spark.session import get_spark, load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark("tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def events(spark):
    return load_table(spark, SF_DIR, "events")


@pytest.fixture(scope="session")
def customer(spark):
    return load_table(spark, SF_DIR, "customer")


@pytest.fixture(scope="session")
def documents(spark):
    return load_table(spark, SF_DIR, "documents")


@pytest.fixture(scope="session")
def embeddings(spark):
    return load_table(spark, SF_DIR, "embeddings")


@pytest.fixture(scope="session")
def lineitem(spark):
    return load_table(spark, SF_DIR, "lineitem")


@pytest.fixture(scope="session")
def orders(spark):
    return load_table(spark, SF_DIR, "orders")
