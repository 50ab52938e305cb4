"""Reference property types → Spark types.

The declared type surface accepted by the reference's schema parser
(/root/reference/robosystems/schemas/custom.py:53-78) mapped per
SURVEY §1.2.  Spark has no unsigned or 128-bit integers: unsigned
types widen to the next signed type, INT128 becomes DECIMAL(38,0).
"""

from __future__ import annotations

from pyspark.sql import types as T

_TYPE_MAP: dict[str, T.DataType] = {
    "STRING": T.StringType(),
    "INT8": T.ByteType(),
    "INT16": T.ShortType(),
    "INT32": T.IntegerType(),
    "INT64": T.LongType(),
    "INT128": T.DecimalType(38, 0),
    "UINT8": T.ShortType(),
    "UINT16": T.IntegerType(),
    "UINT32": T.LongType(),
    "UINT64": T.DecimalType(20, 0),
    "FLOAT": T.FloatType(),
    "DOUBLE": T.DoubleType(),
    "BOOLEAN": T.BooleanType(),
    "BLOB": T.BinaryType(),
    "DATE": T.DateType(),
    "TIMESTAMP": T.TimestampType(),
    "INTERVAL": T.DayTimeIntervalType(),
    "UUID": T.StringType(),
}

# Parameterized/nested types accepted with default element types when
# given bare (LIST -> array<string>, MAP -> map<string,string>).
_NESTED = {"LIST", "MAP", "STRUCT", "UNION", "NODE", "REL"}

VALID_TYPES = frozenset(_TYPE_MAP) | _NESTED


def is_valid_type(name: str) -> bool:
    return name.strip().upper().split("(")[0] in VALID_TYPES


def spark_type(name: str) -> T.DataType:
    """Resolve a declared type name to a Spark DataType.

    Bare nested types get permissive defaults; ``LIST(INT64)``-style
    parameterization resolves the element type recursively.
    """
    up = name.strip().upper()
    base, _, param = up.partition("(")
    param = param.rstrip(")")
    if base in _TYPE_MAP:
        return _TYPE_MAP[base]
    if base == "LIST":
        elem = spark_type(param) if param else T.StringType()
        return T.ArrayType(elem)
    if base == "MAP":
        if param:
            k, _, v = param.partition(",")
            return T.MapType(spark_type(k), spark_type(v))
        return T.MapType(T.StringType(), T.StringType())
    if base in ("STRUCT", "NODE", "REL", "UNION"):
        # NODE/REL only appear in query results (RETURN n); UNION is a
        # tagged struct of nullable variants.  Untyped here.
        return T.MapType(T.StringType(), T.StringType())
    raise ValueError(f"Unknown property type: {name!r}")
