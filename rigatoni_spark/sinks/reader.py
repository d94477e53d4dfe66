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

from rigatoni_spark.config import S3SinkConfig, SerializationFormat
from rigatoni_spark.sinks.key_gen import file_extension


def read_sink_output(spark: SparkSession, cfg: S3SinkConfig) -> DataFrame:
    """Read every object the sink wrote under ``cfg.base_uri`` (any key
    layout) back as envelope rows."""
    ext = file_extension(cfg.format, cfg.compression)
    base = cfg.base_uri.rstrip("/")
    reader = spark.read.option("recursiveFileLookup", "true").option(
        "pathGlobFilter", f"*{ext}"
    )
    if cfg.format is SerializationFormat.JSON:
        return reader.json(base)
    if cfg.format is SerializationFormat.CSV:
        return reader.option("header", "true").csv(base)
    if cfg.format is SerializationFormat.PARQUET:
        return reader.parquet(base)
    if cfg.format is SerializationFormat.AVRO:
        return reader.format("avro").load(base)
    raise ValueError(f"unknown format {cfg.format}")
