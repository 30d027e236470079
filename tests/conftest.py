import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from traildb_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("traildb-spark-tests", master="local[4]")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def filter_basic(spark):
    """FIXTURES.md F2: CNF filter truth-table fixture
    (reference tests/c-tests/event_filter_simple.c:18-37)."""
    zero = "0" * 32
    rows = [
        (zero, 1, "foo", "bar", ""),
        (zero, 2, "foo", "sun", ""),
        (zero, 3, "foo", "run", ""),
        (zero, 4, "", "sun", "nam"),
    ]
    return spark.createDataFrame(rows, ["uuid", "time", "a", "b", "c"])
