"""Consumer-side reader: load sink output back into the engine.

The reference's consumers read its S3 objects with whatever tool they
have; this closes the loop natively. Because the writer keeps the FULL
envelope in every object (shadow partition columns,
s3/destination.rs:220-230 keeps all 7 columns in CSV too), read-back is
layout-independent: any of the 5 key strategies round-trips through one
recursive read — no path parsing, no per-layout code.

Scale: Parquet output still gets scan-level pruning on the envelope
columns (row-group stats on collection/cluster_time); Hive-layout
directory pruning additionally applies when querying through a table
registered over the layout (partition columns live in the paths AND the
files — readers pick either).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from rigatoni_spark.config import S3SinkConfig, SerializationFormat
from rigatoni_spark.sinks.key_gen import file_extension

# The wire schema of the TEXT formats (JSON/CSV), owned by the writer
# (sinks/writers.py serializes exactly these 7 envelope columns; text
# formats carry every value as a string — the consumer's typed
# projection casts). Reading with it EXPLICIT instead of inferring
# saves the inference pass over the whole output (guide §6: one fewer
# full read per consumer scan) and keeps an all-deletes JSON output —
# where to_json drops the null full_document from every object, so
# inference would not even discover the column — reading with the full
# envelope instead of failing the downstream projection.
ENVELOPE_TEXT_SCHEMA = T.StructType(
    [
        T.StructField(c, T.StringType(), True)
        for c in (
            "operation",
            "database",
            "collection",
            "cluster_time",
            "document_key",
            "full_document",
            "resume_token",
        )
    ]
)


def read_sink_output(
    spark: SparkSession, cfg: S3SinkConfig, infer_schema: bool = False
) -> DataFrame:
    """Read every object the sink wrote under ``cfg.base_uri`` (any key
    layout) back as envelope rows.

    Text formats read with the EXPLICIT wire schema by default;
    ``infer_schema=True`` keeps the inference path (consumer-side
    coverage that the objects alone describe themselves — one test
    pins explicit == inferred)."""
    ext = file_extension(cfg.format, cfg.compression)
    base = cfg.base_uri.rstrip("/")
    reader = (
        spark.read.option("recursiveFileLookup", "true")
        .option("pathGlobFilter", f"*{ext}")
        # match the writer's full-precision text timestamp layout
        # (sinks/writers.py::_TEXT_TS_FMT) for schema-driven reads
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
    )
    if cfg.format is SerializationFormat.JSON:
        if not infer_schema:
            reader = reader.schema(ENVELOPE_TEXT_SCHEMA)
        return reader.json(base)
    if cfg.format is SerializationFormat.CSV:
        if not infer_schema:
            reader = reader.schema(ENVELOPE_TEXT_SCHEMA)
        return reader.option("header", "true").csv(base)
    if cfg.format is SerializationFormat.PARQUET:
        return reader.parquet(base)
    if cfg.format is SerializationFormat.AVRO:
        if ext.endswith(".gz"):
            # outer-gzipped .avro.gz objects are opaque to the jar tier
            # (spark-avro decompresses CONTAINER codecs, not whole-file
            # gzip) — route to the python codec deliberately rather
            # than let the jar fail and mask the reason
            return _read_avro_fallback(spark, base.replace("file:", ""), ext)
        try:
            return reader.format("avro").load(base)
        except Exception as e:  # noqa: BLE001
            # fallback ONLY on the jar-absent signature; any other
            # failure with the jar present (corrupt object, schema
            # mismatch — messages that also contain 'avro') must
            # surface, not be masked by the python tier
            from rigatoni_spark.sinks.avro_codec import is_jar_absent_error

            if not is_jar_absent_error(e):
                raise
            return _read_avro_fallback(spark, base.replace("file:", ""), ext)
    raise ValueError(f"unknown format {cfg.format}")


def _read_avro_fallback(spark: SparkSession, base: str, ext: str) -> DataFrame:
    """Jar-less Avro read-back via the pure-Python spec codec
    (sinks/avro_codec.py), mirroring the writer's fallback tier.

    Driver-side per-object decode — appropriate for the sink's
    one-object-per-collection consumption pattern; a 100 TB consumer
    uses the spark-avro jar (same DataFrame out, zero caller change).
    """
    import glob as _glob
    import gzip
    import os
    from datetime import datetime, timedelta, timezone

    from pyspark.sql import types as T

    from rigatoni_spark.sinks.avro_codec import read_avro_bytes

    _EPOCH = datetime(1970, 1, 1, tzinfo=timezone.utc)

    _SPARK_TYPES = {
        "string": T.StringType(),
        "long": T.LongType(),
        "double": T.DoubleType(),
        "boolean": T.BooleanType(),
        "bytes": T.BinaryType(),
    }

    files = sorted(
        _glob.glob(os.path.join(base, "**", f"*{ext}"), recursive=True)
    )
    rows: list[tuple] = []
    fields: list[tuple[str, object]] = []
    for f in files:
        data = open(f, "rb").read()
        if ext.endswith(".gz"):
            data = gzip.decompress(data)
        schema, recs = read_avro_bytes(data)
        file_fields = [(fd["name"], fd["type"][1]) for fd in schema["fields"]]
        if not fields:
            # the FIRST file pins the schema; later files must match it
            # exactly or rows would silently misalign (mixed writer
            # versions under one base_uri)
            fields = file_fields
        elif file_fields != fields:
            raise ValueError(
                f"Avro schema mismatch under {base}: {f} declares fields "
                f"{[n for n, _ in file_fields]} but the first file "
                f"declared {[n for n, _ in fields]}"
            )
        for rec in recs:
            row = []
            for name, ftype in fields:
                v = rec[name]
                if (
                    v is not None
                    and isinstance(ftype, dict)
                    and ftype.get("logicalType") == "timestamp-micros"
                ):
                    # integer micros arithmetic: float /1e6 drifts by
                    # 1us once the ulp passes 0.5us (~2.2e9 seconds)
                    v = _EPOCH + timedelta(microseconds=v)
                row.append(v)
            rows.append(tuple(row))
    if not fields:
        return spark.createDataFrame([], T.StructType([]))
    spark_schema = T.StructType(
        [
            T.StructField(
                name,
                T.TimestampType()
                if isinstance(ftype, dict)
                and ftype.get("logicalType") == "timestamp-micros"
                else _SPARK_TYPES[ftype if isinstance(ftype, str) else ftype["type"]],
                True,
            )
            for name, ftype in fields
        ]
    )
    from rigatoni_spark.tables import local_df

    return local_df(spark, rows, spark_schema)
