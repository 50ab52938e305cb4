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


def object_store_conf(
    object_store: dict[str, str | bool | int],
) -> dict[str, str]:
    """Translate a friendly object-store config into the
    ``spark.hadoop.fs.s3a.*`` keys the S3A connector reads — the
    Spark analog of the reference's per-connection S3 wiring
    (ref: robosystems/graph_api/core/duckdb/pool.py:260-305, which
    sets s3_access_key_id / s3_endpoint / path style on DuckDB's
    httpfs).

    Recognized keys (all optional — omit any and the S3A default
    credential/provider chain applies, the same fallback the
    reference uses outside prod):

    - ``access_key`` / ``secret_key`` / ``session_token`` — explicit
      credentials (dev); production should omit them and run on the
      instance/task role, exactly like the reference's prod branch.
    - ``endpoint`` — custom endpoint (LocalStack/MinIO/GCS-interop).
      Unlike DuckDB, S3A wants the scheme KEPT; http endpoints also
      flip ``connection.ssl.enabled`` off.
    - ``path_style`` bool — path-style access for non-AWS endpoints.
    - ``region`` — ``fs.s3a.endpoint.region``.
    - ``anonymous`` bool — public-bucket reads via the anonymous
      provider.

    Unrecognized keys pass through verbatim under
    ``spark.hadoop.fs.s3a.<key>`` so any S3A tunable stays reachable
    without a factory change."""
    s3a = "spark.hadoop.fs.s3a."
    out: dict[str, str] = {}
    store = dict(object_store)
    if store.pop("anonymous", False):
        out[s3a + "aws.credentials.provider"] = (
            "org.apache.hadoop.fs.s3a.AnonymousAWSCredentialsProvider"
        )
    simple = {
        "access_key": "access.key",
        "secret_key": "secret.key",
        "session_token": "session.token",
        "region": "endpoint.region",
    }
    for friendly, key in simple.items():
        val = store.pop(friendly, None)
        if val is not None:
            out[s3a + key] = str(val)
    endpoint = store.pop("endpoint", None)
    if endpoint is not None:
        out[s3a + "endpoint"] = str(endpoint)
        if str(endpoint).startswith("http://"):
            out[s3a + "connection.ssl.enabled"] = "false"
    path_style = store.pop("path_style", None)
    if path_style is not None:
        out[s3a + "path.style.access"] = str(bool(path_style)).lower()
    for key, val in store.items():  # expert pass-through
        out[s3a + key] = str(val).lower() if isinstance(val, bool) else str(val)
    return out


def get_spark(
    app_name: str = "robosystems-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    object_store: dict[str, str | bool | int] | None = None,
) -> SparkSession:
    """Create (or reuse) the engine's SparkSession.

    ``object_store`` wires S3/S3-compatible access via
    :func:`object_store_conf` (credentials, endpoint, path style);
    note hadoop confs bind at JVM startup — pass it to the FIRST
    ``get_spark`` call of the process, not after a session exists.
    """
    from robosystems_spark._hostmem import harden_host_memory

    harden_host_memory()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE's parallelism-first coalescing floors partitions at 1 MB
        # of COMPRESSED shuffle bytes — a poor CPU proxy for array-
        # payload stages (the triangle closure stage coalesced
        # 32 -> 6 tasks and tracked its one straggler).  An A/B that
        # lowered the floor to 256k fixed that stage but inflated the
        # MANY small-shuffle entries (q1/q3/q5, the multimodal family)
        # by 32x-ing their tiny task counts — net bench LOSS, so the
        # default floor stays and the one CPU-dense-byte-light
        # offender runs resident under its measured gate instead
        # (OPTIMIZATION_r12.md).  Deployments can still override:
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_AQE_MIN_PARTITION_SIZE", "1m"),
        )
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
    if object_store:
        for k, v in object_store_conf(object_store).items():
            builder = builder.config(k, v)
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
