"""Schema of the driver's raw ``events`` table (TESTDATA.md).

Declared explicitly so streaming reads need no inference pass.
"""

from pyspark.sql import types as T

RAW_EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

# When the driver's parquet stores ts as TIMESTAMP(NANOS), under
# spark.sql.legacy.parquet.nanosAsLong it reads as LongType. Streaming
# reads declare this schema and convert (tables._NANOS_TS_COLUMNS).
# The driver has also shipped testdata with ts as TIMESTAMP(MICROS)
# (surfaces as TIMESTAMP_NTZ) — never assume one physical type; use
# raw_events_schema_for() with the footer-probed type instead.
RAW_EVENTS_SCHEMA_NANOS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.LongType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def raw_events_schema_for(ts_type: T.DataType) -> T.StructType:
    """Raw events schema with ``ts`` declared as the physical type the
    parquet footer actually surfaces (LongType for nanos-as-long files,
    TimestampNTZType for TIMESTAMP(MICROS) isAdjustedToUTC=false files,
    TimestampType for adjusted ones)."""
    return T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("ts", ts_type, True),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    )
