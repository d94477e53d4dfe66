"""Configuration dataclasses + validation.

Defaults and limits mirror the reference builders:
- PipelineConfig     (rigatoni-core/src/pipeline.rs:244-288, 554-634)
- ChangeStreamConfig (rigatoni-core/src/stream.rs:472-501)
- S3SinkConfig       (rigatoni-destinations/src/s3/config.rs:494-556)
- WatchLevel         (rigatoni-core/src/watch_level.rs:91-187)

Validation happens at construction (__post_init__), the Spark analogue
of the reference's builder-time checks — there is no plan IR to verify
later (SURVEY.md §3.1).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from enum import Enum


class WatchLevel(Enum):
    """Scope of the change stream (watch_level.rs:91-187).

    COLLECTION -> N independent streaming queries (one per collection,
    per-collection checkpoints); DATABASE/DEPLOYMENT -> one query,
    ``collection``/``database`` stay ordinary data columns.
    """

    COLLECTION = "collection"
    DATABASE = "database"  # reference default (pipeline.rs:558-559)
    DEPLOYMENT = "deployment"


def resume_token_key(level: WatchLevel, database: str, collection: str | None) -> str:
    """Checkpoint key scheme (watch_level.rs:339-353).

    Maps to a per-query ``checkpointLocation`` subdirectory.
    """
    if level is WatchLevel.COLLECTION:
        if not collection:
            raise ValueError("collection required for COLLECTION watch level")
        return f"{database}:{collection}"
    if level is WatchLevel.DATABASE:
        return f"{database}:*"
    return "*:*"


class SerializationFormat(Enum):
    """Sink formats (s3/config.rs:104-132)."""

    JSON = "jsonl"  # JSON-lines, Spark's native json layout
    CSV = "csv"
    PARQUET = "parquet"
    AVRO = "avro"

    @property
    def extension(self) -> str:
        return {"jsonl": "jsonl", "csv": "csv", "parquet": "parquet", "avro": "avro"}[
            self.value
        ]

    @property
    def content_type(self) -> str:
        # MIME types (s3/config.rs:165-192)
        return {
            "jsonl": "application/x-ndjson",
            "csv": "text/csv",
            "parquet": "application/vnd.apache.parquet",
            "avro": "application/avro",
        }[self.value]


class CompressionCodec(Enum):
    """Compression (s3/destination.rs:486-513). NONE/GZIP/ZSTD."""

    NONE = "none"
    GZIP = "gzip"
    ZSTD = "zstd"

    @property
    def extension(self) -> str:
        return {"none": "", "gzip": ".gz", "zstd": ".zst"}[self.value]


class PartitionStrategy(Enum):
    """S3 key-generation strategies (s3/key_gen.rs:53-114)."""

    HIVE_PARTITIONED = "hive"  # collection=…/year=…/month=…/day=…/hour=…
    DATE_HOUR_PARTITIONED = "date_hour"  # default (s3/config.rs:338)
    DATE_PARTITIONED = "date"
    COLLECTION_BASED = "collection"
    FLAT = "flat"


@dataclass
class ChangeStreamConfig:
    """Source options (stream.rs:472-501)."""

    # Mongo aggregation pipeline pushdown, e.g.
    # [{"$match": {"operationType": {"$in": ["insert", "update"]}}}]
    pipeline: list[dict] = field(default_factory=list)
    # UpdateLookup: populate full_document on updates (stream.rs:477-481)
    full_document_on_update: bool = False
    # pre-image mode: "off" | "whenAvailable" | "required"
    # (FullDocumentBeforeChangeType, stream.rs:479-501); a bool is
    # accepted for backward compat (True -> whenAvailable)
    full_document_before_change: str | bool = "off"
    batch_size: int | None = None
    # reconnection policy (stream.rs:560-576)
    max_reconnect_attempts: int = 5  # 0 = infinite
    initial_backoff_ms: int = 100
    max_backoff_ms: int = 30_000

    def __post_init__(self) -> None:
        if isinstance(self.full_document_before_change, bool):
            self.full_document_before_change = (
                "whenAvailable" if self.full_document_before_change else "off"
            )
        if self.full_document_before_change not in ("off", "whenAvailable", "required"):
            raise ValueError(
                "full_document_before_change must be off|whenAvailable|required"
            )
        if self.batch_size is not None and self.batch_size <= 0:
            raise ValueError("batch_size must be positive")
        if self.initial_backoff_ms <= 0 or self.max_backoff_ms < self.initial_backoff_ms:
            raise ValueError("invalid backoff configuration")


@dataclass
class PipelineConfig:
    """Pipeline orchestration config (pipeline.rs:554-634)."""

    database: str = "app"
    collections: list[str] = field(default_factory=list)
    watch_level: WatchLevel = WatchLevel.DATABASE
    batch_size: int = 100  # default 100, max 10_000 (pipeline.rs:562-571)
    batch_timeout_secs: float = 5.0  # default 5s (pipeline.rs:574-578)
    max_retries: int = 3
    retry_delay_ms: int = 100  # doubles per attempt (pipeline.rs:1864)
    max_retry_delay_ms: int = 30_000
    channel_buffer_size: int = 1000  # min 10 (pipeline.rs:601-611)
    dedup_by_key: bool = False
    # exactly-once replay of an archived feed: trigger(availableNow)
    # drains everything present (in batch_size-bounded micro-batches,
    # same deterministic sink keys) then terminates — the backfill mode
    # a real consumer runs before switching to the continuous trigger
    backfill: bool = False
    # Spark async progress tracking: move offset-log/commit-log writes
    # (walCommit + commitOffsets, ~150-260 ms of every trigger at the
    # production latency config) off the trigger critical path, flushed
    # in the background every async_progress_interval_ms instead.
    # TRADE: a crash can replay the batches since the last durable
    # flush (at-least-once). That is SAFE here by construction — sink
    # keys are deterministic per (batch_id, group-times) and writes are
    # whole-object overwrites, so a replayed batch is byte-identical —
    # but any foreachBatch side effect a user adds on top must share
    # that idempotence. Continuous (processingTime) mode only: Spark
    # rejects the option under Once/availableNow triggers, so backfill
    # + async is a config error.
    # SPARK VERSION PIN: enabling this for a foreachBatch sink rides
    # `_asyncProgressTrackingOverrideSinkSupportCheck`, an INTERNAL
    # Spark option (the public allowlist is Kafka/Memory only). It is
    # honored on Spark 3.4 (SPARK-39591) through 4.1 (the tested
    # range); Pipeline.start() asserts the running version is inside
    # that range so a silent rename/drop in a future Spark upgrade
    # fails loudly at start instead of silently re-serializing offset
    # commits onto the trigger path.
    async_progress_tracking: bool = False
    async_progress_interval_ms: int = 1_000
    stream: ChangeStreamConfig = field(default_factory=ChangeStreamConfig)

    MAX_BATCH_SIZE = 10_000

    def __post_init__(self) -> None:
        if not (0 < self.batch_size <= self.MAX_BATCH_SIZE):
            raise ValueError(
                f"batch_size must be in (0, {self.MAX_BATCH_SIZE}], got {self.batch_size}"
            )
        if self.batch_timeout_secs <= 0:
            raise ValueError("batch_timeout_secs must be positive")
        if self.max_retries < 0:
            raise ValueError("max_retries must be >= 0")
        if self.retry_delay_ms <= 0 or self.max_retry_delay_ms < self.retry_delay_ms:
            raise ValueError("invalid retry delay configuration")
        if self.channel_buffer_size < 10:
            raise ValueError("channel_buffer_size must be >= 10")
        if self.watch_level is WatchLevel.COLLECTION and not self.collections:
            raise ValueError("COLLECTION watch level requires collections")
        if self.async_progress_tracking and self.backfill:
            raise ValueError(
                "async_progress_tracking requires the continuous "
                "(processingTime) trigger; Spark rejects it under the "
                "availableNow trigger backfill mode uses"
            )
        if self.async_progress_interval_ms <= 0:
            raise ValueError("async_progress_interval_ms must be positive")


_BUCKET_RE = re.compile(r"^[a-z0-9][a-z0-9.-]{1,61}[a-z0-9]$")


@dataclass
class S3SinkConfig:
    """Destination config (s3/config.rs:494-556).

    ``bucket`` may be a plain name (-> s3a://bucket) or, for local
    testing, an absolute filesystem path used verbatim.
    """

    bucket: str
    prefix: str = ""
    region: str = "us-east-1"
    format: SerializationFormat = SerializationFormat.JSON
    compression: CompressionCodec = CompressionCodec.NONE
    partition_strategy: PartitionStrategy = PartitionStrategy.DATE_HOUR_PARTITIONED
    endpoint_url: str | None = None  # LocalStack / MinIO
    force_path_style: bool = False
    # one object per (collection, flush) like the reference (key_gen.rs:156)
    single_file_per_group: bool = True
    # Low-latency write path (round-13): serialize with to_json and let
    # each task write its groups' FINAL keyed objects directly — one
    # Spark action, no staging dir, no DataFrameWriter commit protocol,
    # no rename walk. Keys stay deterministic per (batch_id,
    # group-times) so replays overwrite idempotently; each object is
    # written tmp+os.replace (atomic). TRADE: a batch aborted after
    # some tasks wrote (multi-task batches; invalidate compensation)
    # briefly exposes objects the abort then deletes — the staged path
    # never exposes them. JSON + NONE/GZIP only (the other serializers'
    # bytes come from Spark codecs with no cheap task-side twin).
    direct_write: bool = False

    def __post_init__(self) -> None:
        if self.direct_write:
            if self.format is not SerializationFormat.JSON:
                raise ValueError(
                    "direct_write supports only the JSON serializer; "
                    f"got {self.format}"
                )
            if self.compression not in (
                CompressionCodec.NONE,
                CompressionCodec.GZIP,
            ):
                raise ValueError(
                    "direct_write supports only NONE/GZIP compression; "
                    f"got {self.compression}"
                )
        if not self.bucket:
            raise ValueError("bucket must not be empty")
        is_path = self.bucket.startswith("/") or self.bucket.startswith("file:")
        if not is_path:
            # bucket naming rules (s3/config.rs:494-520): 3-63 chars,
            # lowercase letters/digits/dots/hyphens, no leading/trailing
            # punctuation.
            if not _BUCKET_RE.match(self.bucket):
                raise ValueError(f"invalid bucket name: {self.bucket!r}")
        # prefix rules (s3/config.rs:522-556): no path traversal, no
        # leading slash.
        if self.prefix.startswith("/"):
            raise ValueError("prefix must not start with '/'")
        if ".." in self.prefix.split("/"):
            raise ValueError("prefix must not contain path traversal ('..')")

    @property
    def base_uri(self) -> str:
        if self.bucket.startswith("/"):
            base = self.bucket
        elif self.bucket.startswith("file:"):
            base = self.bucket
        else:
            base = f"s3a://{self.bucket}"
        return f"{base}/{self.prefix}" if self.prefix else base

    def spark_hadoop_conf(self) -> dict[str, str]:
        """Hadoop confs for custom endpoints (LocalStack/MinIO),
        mirroring endpoint_url/force_path_style (s3/config.rs)."""
        conf: dict[str, str] = {}
        if self.endpoint_url:
            conf["fs.s3a.endpoint"] = self.endpoint_url
        if self.force_path_style:
            conf["fs.s3a.path.style.access"] = "true"
        return conf
