"""Spark → Presto type-name rendering, shared by every surface that
prints types to a Presto client (REST protocol, SHOW COLUMNS / SHOW
CREATE TABLE / DESCRIBE OUTPUT)."""

from __future__ import annotations

from pyspark.sql import types as T


def presto_type_name(dt: T.DataType) -> str:
    """Spark type -> Presto type rendering (the names presto-cli
    prints)."""
    if isinstance(dt, T.ByteType):
        return "tinyint"
    if isinstance(dt, T.ShortType):
        return "smallint"
    if isinstance(dt, T.IntegerType):
        return "integer"
    if isinstance(dt, T.LongType):
        return "bigint"
    if isinstance(dt, T.FloatType):
        return "real"
    if isinstance(dt, T.DoubleType):
        return "double"
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    if isinstance(dt, T.StringType):
        return "varchar"
    if isinstance(dt, T.BinaryType):
        return "varbinary"
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.TimestampType):
        return "timestamp"
    if isinstance(dt, getattr(T, "TimeType", ())):
        return "time"
    if isinstance(dt, T.ArrayType):
        return f"array({presto_type_name(dt.elementType)})"
    if isinstance(dt, T.MapType):
        return f"map({presto_type_name(dt.keyType)}, {presto_type_name(dt.valueType)})"
    if isinstance(dt, T.StructType):
        # the engine's struct renderings of Presto's zone-carrying
        # types (functions/tztype.py, functions/timetype.py) print as
        # the Presto type, not as row(...)
        names = [f.name for f in dt.fields]
        if (
            names == ["instant", "tz"]
            and isinstance(dt.fields[0].dataType, T.TimestampType)
            and isinstance(dt.fields[1].dataType, T.StringType)
        ):
            return "timestamp with time zone"
        if (
            names == ["t", "offset_minutes"]
            and isinstance(dt.fields[0].dataType, getattr(T, "TimeType", ()))
        ):
            return "time with time zone"
        fields = ", ".join(
            f"{f.name} {presto_type_name(f.dataType)}" for f in dt.fields
        )
        return f"row({fields})"
    return dt.simpleString()
