"""Kafka / Debezium change-stream source (production path).

The reference watches MongoDB directly (stream.rs:891-944); the
standard production CDC topology routes the same change events through
Kafka via Debezium. This module wires ``ChangeStreamConfig`` into a
``readStream.format("kafka")`` + Debezium-envelope parse producing the
same ChangeEvent schema as sources/change_events.py — so every
downstream operator is source-agnostic.

NOT testable in this container (no Kafka broker, no kafka-sql jar);
construction is import-gated and raises ``SourceNotAvailable`` with the
exact jar coordinates. The parsing logic (`parse_debezium_value`) is
pure column expressions and IS unit-testable on literal JSON.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from rigatoni_spark.config import ChangeStreamConfig


class SourceNotAvailable(RuntimeError):
    pass


# Debezium MongoDB connector op codes -> reference OperationType
_DEBEZIUM_OPS = {"c": "insert", "u": "update", "d": "delete", "r": "insert"}


def parse_debezium_value(value: Column) -> list[Column]:
    """Debezium MongoDB envelope (JSON string) -> ChangeEvent columns.

    Pure `get_json_object` projections — works on any DataFrame with a
    JSON ``value`` column (Kafka or otherwise).
    """
    op_raw = F.get_json_object(value, "$.op")
    op = F.coalesce(
        *[F.when(op_raw == k, F.lit(v)) for k, v in _DEBEZIUM_OPS.items()],
        op_raw,  # unknown ops preserved as-is (event.rs:456-465)
    )
    return [
        op.alias("operation"),
        F.get_json_object(value, "$.source.db").alias("database"),
        F.get_json_object(value, "$.source.collection").alias("collection"),
        F.timestamp_millis(
            F.get_json_object(value, "$.source.ts_ms").cast("bigint")
        ).alias("cluster_time"),
        F.get_json_object(value, "$.documentKey").alias("document_key"),
        F.get_json_object(value, "$.after").alias("full_document"),
        F.get_json_object(value, "$.updateDescription.updatedFields").alias(
            "updated_fields"
        ),
        F.from_json(
            F.get_json_object(value, "$.updateDescription.removedFields"),
            "array<string>",
        ).alias("removed_fields"),
        F.get_json_object(value, "$.source.ts_ms").alias("resume_token"),
    ]


def read_kafka_change_events(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    config: ChangeStreamConfig | None = None,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Streaming ChangeEvent source from Debezium topics.

    ``config.batch_size`` maps to ``maxOffsetsPerTrigger`` (the
    back-pressure knob, O4); resume = checkpointLocation as everywhere.
    """
    config = config or ChangeStreamConfig()
    try:
        reader = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topics)
            .option("startingOffsets", starting_offsets)
        )
        if config.batch_size:
            reader = reader.option("maxOffsetsPerTrigger", str(config.batch_size))
        raw = reader.load()
    except Exception as e:  # noqa: BLE001
        raise SourceNotAvailable(
            "kafka source requires org.apache.spark:spark-sql-kafka-0-10 "
            "on the classpath and a reachable broker"
        ) from e
    return raw.select(parse_debezium_value(F.col("value").cast("string")))


def read_debezium_file_stream(
    spark: SparkSession,
    lines_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Broker-less twin of :func:`read_kafka_change_events`: Debezium
    envelopes as JSONL files instead of Kafka records.

    The per-record shape is identical to what the Kafka reader sees
    (one JSON ``value`` string per message), and the parse is the SAME
    column expressions — so the full path envelope -> operators -> sink
    runs end-to-end through the real streaming engine in environments
    without a broker, and swapping this reader for ``format("kafka")``
    changes nothing downstream. Useful in production too: Debezium's
    S3/file sink archive replays through this reader for backfills.
    """
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option(
            "maxFilesPerTrigger", str(max_files_per_trigger)
        )
    raw = reader.text(lines_dir)
    return raw.select(parse_debezium_value(F.col("value")))
