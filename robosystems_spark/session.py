"""SparkSession factory.

Centralizes the engine's Spark configuration so every entry point
(tests, bench, driver) gets the same tuned session.  Mirrors the role
of the reference's connection/pool layer
(/root/reference/robosystems/graph_api/core/ladybug/pool.py:57-74) —
in Spark a single shared session replaces per-database connection
pools.

Scale notes (100 TB design intent):
- AQE is on: runtime coalescing of shuffle partitions, skew-join
  splitting, and dynamic join-strategy switching replace hand-tuned
  partition counts when data volumes vary by 1000x.
- ``spark.sql.shuffle.partitions`` here is a *local* default; on a
  real cluster AQE's coalescing makes the initial number a ceiling,
  so a production deploy would set it to ~2-3x total cores.
- Timestamps are pinned to UTC so parquet written by any engine
  (DuckDB oracle, pandas, Spark) compares bit-identically.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "robosystems-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) the engine's SparkSession."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
        # events.parquet carries TIMESTAMP(NANOS) which Spark's reader
        # otherwise rejects; read as long and convert in io.read_table.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Make ``robosystems_spark`` importable on executor Python workers.

    Functions passed to mapInPandas / applyInPandasWithState are
    pickled with by-reference globals, so workers must be able to
    import this package even when the driver's cwd is elsewhere.
    Shipping a zip via ``addPyFile`` works identically on local mode
    and a real cluster.
    """
    import os.path
    import shutil
    import tempfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    marker = "robosystems_spark_pyfiles"
    try:
        sc = spark.sparkContext
        if sc.environment.get(marker):
            return
        zip_base = os.path.join(tempfile.gettempdir(), f"{marker}_{os.getpid()}")
        zip_path = shutil.make_archive(zip_base, "zip", os.path.dirname(pkg_dir),
                                       os.path.basename(pkg_dir))
        sc.addPyFile(zip_path)
        sc.environment[marker] = "1"
    except Exception:  # pragma: no cover - never block session creation
        pass
