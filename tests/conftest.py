from __future__ import annotations

import hashlib
import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from robosystems_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


def pytest_collection_modifyitems(config, items):
    """Process-level test sharding (no pytest-xdist in this image):
    ``SPARK_GRAFT_TEST_SHARD=i/n`` keeps only the tests whose stable
    nodeid hash lands in shard i — ``scripts/run_suite_sharded.sh``
    launches n such pytest processes in parallel, each with its own
    JVM/SparkSession, cutting the 40-minute full gate to roughly 1/n.
    Assignment is deterministic (md5 of nodeid), so the union over
    shards is exactly the full suite and reruns are stable."""
    shard = os.environ.get("SPARK_GRAFT_TEST_SHARD")
    if not shard:
        return
    idx, n = (int(x) for x in shard.split("/"))
    keep, drop = [], []
    for item in items:
        h = int(hashlib.md5(item.nodeid.encode()).hexdigest()[:8], 16)
        (keep if h % n == idx else drop).append(item)
    items[:] = keep
    config.hook.pytest_deselected(items=drop)


@pytest.fixture(scope="session")
def spark():
    shard = os.environ.get("SPARK_GRAFT_TEST_SHARD")
    extra = None
    if shard:
        # parallel shard processes must not share a warehouse dir
        # (saveAsTable in the bucketing tests would collide)
        extra = {
            "spark.sql.warehouse.dir": "/tmp/suite_shards/warehouse_"
            + shard.replace("/", "_")
        }
    s = get_spark(
        app_name="robosystems-tests",
        shuffle_partitions=8,
        extra_conf=extra,
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE
