"""Object-key generation: the reference's 5 partitioning strategies
(rigatoni-destinations/src/s3/key_gen.rs:53-114, generate_key
:148-224; default DateHourPartitioned per s3/config.rs:338).

Layouts (prefix omitted when empty; filename stem is epoch-millis in
the reference, key_gen.rs:156):

    HIVE_PARTITIONED      collection=c0/year=2024/month=01/day=05/hour=07/<stem>.ext
    DATE_HOUR_PARTITIONED c0/2024/01/05/07/<stem>.ext
    DATE_PARTITIONED      c0/2024/01/05/<stem>.ext
    COLLECTION_BASED      c0/<stem>.ext
    FLAT                  c0_<stem>.ext

Determinism upgrade over the reference (SURVEY.md §7.3): the stem is
derived from (batch_id, max event-time in the group) instead of
wall-clock ``Date.now()`` — so replayed batches rewrite the *same* keys
(idempotent at-least-once becomes effectively exactly-once), and tests
are reproducible. Wall-clock naming is available via an explicit stem.
"""

from __future__ import annotations

from datetime import datetime, timezone

from rigatoni_spark.config import (
    CompressionCodec,
    PartitionStrategy,
    SerializationFormat,
)


def file_extension(fmt: SerializationFormat, codec: CompressionCodec) -> str:
    """.jsonl/.csv/.parquet/.avro (+ .gz/.zst) — s3/config.rs:104-132."""
    return f".{fmt.extension}{codec.extension}"


def generate_key(
    strategy: PartitionStrategy,
    collection: str,
    event_time: datetime,
    fmt: SerializationFormat,
    codec: CompressionCodec,
    prefix: str = "",
    stem: str | None = None,
) -> str:
    """Build the object key for one (collection, batch) group."""
    if event_time.tzinfo is None:
        event_time = event_time.replace(tzinfo=timezone.utc)
    if stem is None:
        stem = str(int(event_time.timestamp() * 1000))
    ext = file_extension(fmt, codec)
    y, mo, d, h = (
        event_time.year,
        f"{event_time.month:02d}",
        f"{event_time.day:02d}",
        f"{event_time.hour:02d}",
    )
    if strategy is PartitionStrategy.HIVE_PARTITIONED:
        rel = (
            f"collection={collection}/year={y}/month={mo}/day={d}/hour={h}/"
            f"{stem}{ext}"
        )
    elif strategy is PartitionStrategy.DATE_HOUR_PARTITIONED:
        rel = f"{collection}/{y}/{mo}/{d}/{h}/{stem}{ext}"
    elif strategy is PartitionStrategy.DATE_PARTITIONED:
        rel = f"{collection}/{y}/{mo}/{d}/{stem}{ext}"
    elif strategy is PartitionStrategy.COLLECTION_BASED:
        rel = f"{collection}/{stem}{ext}"
    elif strategy is PartitionStrategy.FLAT:
        rel = f"{collection}_{stem}{ext}"
    else:  # pragma: no cover
        raise ValueError(f"unknown strategy {strategy}")
    return f"{prefix.rstrip('/')}/{rel}" if prefix else rel
