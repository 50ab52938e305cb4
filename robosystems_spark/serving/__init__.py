"""Serving behaviors: chunked delivery, timeouts, admission control."""

from robosystems_spark.serving.chunking import iter_chunks, ndjson_chunks  # noqa: F401
from robosystems_spark.serving.admission import AdmissionController  # noqa: F401
from robosystems_spark.serving.timeouts import TimeoutCascade  # noqa: F401
