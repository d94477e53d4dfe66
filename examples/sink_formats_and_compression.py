"""Serializers, compression, key strategies — the Spark twin of the
reference's s3_basic / s3_with_compression / s3_advanced examples
(rigatoni-examples/s3_basic.rs, s3_with_compression.rs,
s3_advanced.rs): the same batch written as JSONL+gzip (date-hour
layout), Parquet+zstd (Hive layout), and CSV (flat layout), then read
back with the consumer-side reader."""

from __future__ import annotations

import os

from _common import SF_DIR, example_session, workdir


def main(spark, sf_dir: str, root: str) -> dict:
    from pyspark.sql import functions as F

    from rigatoni_spark.config import (
        CompressionCodec,
        PartitionStrategy,
        S3SinkConfig,
        SerializationFormat,
    )
    from rigatoni_spark.sinks.reader import read_sink_output
    from rigatoni_spark.sinks.writers import write_batch
    from rigatoni_spark.sources.change_events import read_change_events

    ce = read_change_events(spark, sf_dir).filter(
        F.col("resume_token").cast("bigint") % 7 == 0
    )
    combos = [
        ("jsonl_gz", SerializationFormat.JSON, CompressionCodec.GZIP,
         PartitionStrategy.DATE_HOUR_PARTITIONED),
        ("parquet_zst", SerializationFormat.PARQUET, CompressionCodec.ZSTD,
         PartitionStrategy.HIVE_PARTITIONED),
        ("csv", SerializationFormat.CSV, CompressionCodec.NONE,
         PartitionStrategy.FLAT),
    ]
    counts = {}
    for name, fmt, codec, strategy in combos:
        cfg = S3SinkConfig(
            bucket=os.path.join(root, name),
            format=fmt, compression=codec, partition_strategy=strategy,
        )
        keys = write_batch(ce, cfg, batch_id=0)
        n = read_sink_output(spark, cfg).count()
        print(f"{name}: {len(keys)} objects, {n} rows read back")
        counts[name] = n
    return counts


if __name__ == "__main__":
    main(example_session("example_sink_formats"), SF_DIR, workdir("ex_sink_"))
