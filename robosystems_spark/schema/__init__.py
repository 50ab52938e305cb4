"""Typed-schema subsystem: node tables, relationship tables, composition.

Re-expresses the reference's engine-independent schema system
(/root/reference/robosystems/schemas/) for Spark: declared property
types map to Spark ``DataType``s, node/relationship definitions emit
``StructType`` schemas and Spark SQL DDL, and custom JSON/YAML schemas
are validated with the same rules (valid types, reserved names,
primary key required, relationship endpoint existence incl. ``*``).
"""

from robosystems_spark.schema.ddl import apply_graph_ddl, parse_graph_ddl  # noqa: F401
from robosystems_spark.schema.models import Node, Property, Relationship, Schema  # noqa: F401
from robosystems_spark.schema.types import spark_type  # noqa: F401
