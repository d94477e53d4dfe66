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

# The driver's parquet stores ts as TIMESTAMP(NANOS); under
# spark.sql.legacy.parquet.nanosAsLong it reads as LongType. Streaming
# reads declare this schema and convert (tables._NANOS_TS_COLUMNS).
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
