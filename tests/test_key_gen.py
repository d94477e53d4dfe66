"""Key generation against a fixed timestamp — the reference's own
golden-output style (s3_key_gen_test.rs:26-31)."""

from __future__ import annotations

from datetime import datetime, timezone

from rigatoni_spark.config import (
    CompressionCodec,
    PartitionStrategy,
    SerializationFormat,
)
from rigatoni_spark.sinks.key_gen import file_extension, generate_key

TS = datetime(2024, 3, 5, 7, 42, 11, tzinfo=timezone.utc)
MILLIS = str(int(TS.timestamp() * 1000))


def _key(strategy, fmt=SerializationFormat.JSON, codec=CompressionCodec.NONE, **kw):
    return generate_key(strategy, "users", TS, fmt, codec, **kw)


class TestLayouts:
    def test_hive(self):
        assert (
            _key(PartitionStrategy.HIVE_PARTITIONED)
            == f"collection=users/year=2024/month=03/day=05/hour=07/{MILLIS}.jsonl"
        )

    def test_date_hour(self):
        assert (
            _key(PartitionStrategy.DATE_HOUR_PARTITIONED)
            == f"users/2024/03/05/07/{MILLIS}.jsonl"
        )

    def test_date(self):
        assert _key(PartitionStrategy.DATE_PARTITIONED) == f"users/2024/03/05/{MILLIS}.jsonl"

    def test_collection(self):
        assert _key(PartitionStrategy.COLLECTION_BASED) == f"users/{MILLIS}.jsonl"

    def test_flat(self):
        assert _key(PartitionStrategy.FLAT) == f"users_{MILLIS}.jsonl"

    def test_prefix(self):
        assert _key(
            PartitionStrategy.FLAT, prefix="cdc/raw"
        ) == f"cdc/raw/users_{MILLIS}.jsonl"

    def test_deterministic_stem_override(self):
        k = _key(PartitionStrategy.FLAT, stem="000000000007")
        assert k == "users_000000000007.jsonl"


class TestExtensions:
    """s3/config.rs:104-132."""

    def test_all_formats(self):
        assert file_extension(SerializationFormat.JSON, CompressionCodec.NONE) == ".jsonl"
        assert file_extension(SerializationFormat.CSV, CompressionCodec.GZIP) == ".csv.gz"
        assert (
            file_extension(SerializationFormat.PARQUET, CompressionCodec.ZSTD)
            == ".parquet.zst"
        )
        assert file_extension(SerializationFormat.AVRO, CompressionCodec.NONE) == ".avro"

    def test_content_types(self):
        assert SerializationFormat.JSON.content_type == "application/x-ndjson"
        assert SerializationFormat.PARQUET.content_type == "application/vnd.apache.parquet"
