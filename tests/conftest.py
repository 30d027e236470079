import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from traildb_spark.functions.core import ts_seconds  # noqa: E402
from traildb_spark.session import get_spark  # noqa: E402


def load_events(spark, sf_dir, *, as_timestamp=False):
    """Canonical (uuid, time|event_time, event_type) view of events.parquet,
    robust to the reader surfacing TIMESTAMP(NANOS) as either BIGINT nanos
    (Spark <= 4.0 + nanosAsLong) or TIMESTAMP_NTZ (Spark >= 4.1). All tests
    must load events through here — never hand-roll `ts div 1e9`."""
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    secs = ts_seconds(df)
    t = (
        F.timestamp_seconds(secs).alias("event_time")
        if as_timestamp
        else secs.alias("time")
    )
    return df.select(
        F.col("user_id").cast("string").alias("uuid"),
        t,
        F.col("event_type").cast("string").alias("event_type"),
    )


def pytest_addoption(parser):
    parser.addoption(
        "--shard", default=None, metavar="i/n",
        help="run only the i-th of n deterministic slices (1-based): "
             "the full suite splits by a stable hash of each test id, "
             "so `--shard 1/2` + `--shard 2/2` in two processes cover "
             "exactly the whole suite in roughly half the wall each",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running suites (Hypothesis codec round-trips) — "
        "excluded from the quick lane `-m 'not slow'`",
    )


def pytest_collection_modifyitems(config, items):
    shard = config.getoption("--shard")
    if not shard:
        return
    import zlib

    i, n = (int(x) for x in shard.split("/"))
    if not 1 <= i <= n:
        raise pytest.UsageError(f"--shard {shard}: need 1 <= i <= n")
    keep, drop = [], []
    for it in items:
        (keep if zlib.crc32(it.nodeid.encode()) % n == i - 1 else drop
         ).append(it)
    items[:] = keep
    config.hook.pytest_deselected(items=drop)


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
