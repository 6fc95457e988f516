"""Spark ⇄ Arrow schema conversion for the full supported type lattice.

Reference parity: the reference's schema tree covers primitive, group
(List/Map/Struct via repetition levels) and logical types incl. Decimal
(reference/src/metadata/schema_descriptor.rs:97-144,
reference/src/parquet_bridge.rs:486-508). Here the mapping is a small
recursive converter from pyspark ``DataType`` objects — evaluated
driver-side only; executors receive the resulting (picklable)
``pyarrow`` schema so no Spark types ever cross the serialization
boundary.
"""

from __future__ import annotations

import pyarrow as pa


def spark_type_to_pa(dt, ts_tz: str | None = None) -> pa.DataType:
    """pyspark DataType → pyarrow type, recursively.

    ``ts_tz=None`` gives the type blob encodes/decodes (timestamps as
    naive micros = UTC instants); passing the session timezone gives the
    type Spark's Arrow exchange expects on output. Casting between the
    two is storage-preserving (Arrow timestamps are always UTC epoch
    micros; naive→tz-aware cast assumes UTC).
    """
    from functools import partial

    from pyspark.sql import types as T

    rec = partial(spark_type_to_pa, ts_tz=ts_tz)
    if isinstance(dt, T.StringType):
        return pa.string()
    if isinstance(dt, T.BinaryType):
        return pa.binary()
    if isinstance(dt, T.TimestampNTZType):
        return pa.timestamp("us")
    if isinstance(dt, T.TimestampType):
        return pa.timestamp("us", tz=ts_tz) if ts_tz else pa.timestamp("us")
    if isinstance(dt, T.LongType):
        return pa.int64()
    if isinstance(dt, T.IntegerType):
        return pa.int32()
    if isinstance(dt, T.ShortType):
        return pa.int16()
    if isinstance(dt, T.ByteType):
        return pa.int8()
    if isinstance(dt, T.DoubleType):
        return pa.float64()
    if isinstance(dt, T.FloatType):
        return pa.float32()
    if isinstance(dt, T.BooleanType):
        return pa.bool_()
    if isinstance(dt, T.DateType):
        return pa.date32()
    if isinstance(dt, T.DecimalType):
        return pa.decimal128(dt.precision, dt.scale)
    if isinstance(dt, T.ArrayType):
        return pa.list_(rec(dt.elementType))
    if isinstance(dt, T.MapType):
        return pa.map_(rec(dt.keyType), rec(dt.valueType))
    if isinstance(dt, T.StructType):
        return pa.struct([pa.field(f.name, rec(f.dataType)) for f in dt.fields])
    raise TypeError(f"unsupported Spark type: {dt}")


def df_to_pa_schema(df) -> pa.Schema:
    return pa.schema([(f.name, spark_type_to_pa(f.dataType)) for f in df.schema.fields])
