"""Scalar-function helpers: deterministic IDs, XBRL decimal scaling,
large-value externalization."""

from robosystems_spark.functions.ids import content_hash_id, deterministic_uuid  # noqa: F401
from robosystems_spark.functions.xbrl import apply_decimal_scaling  # noqa: F401
from robosystems_spark.functions.external import externalize_large_values  # noqa: F401
