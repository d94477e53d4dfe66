"""Config validation tests — mirrors the reference's builder tests
(pipeline.rs:2102-2270, s3/config tests s3_config_test.rs:82-148)."""

from __future__ import annotations

import pytest

from rigatoni_spark.config import (
    ChangeStreamConfig,
    PipelineConfig,
    S3SinkConfig,
    WatchLevel,
    resume_token_key,
)


class TestPipelineConfig:
    def test_defaults(self):
        c = PipelineConfig()
        assert c.batch_size == 100  # pipeline.rs:562
        assert c.batch_timeout_secs == 5.0  # pipeline.rs:574-578
        assert c.retry_delay_ms == 100
        assert c.max_retry_delay_ms == 30_000
        assert c.channel_buffer_size == 1000
        assert c.watch_level is WatchLevel.DATABASE  # pipeline.rs:558

    def test_batch_size_limits(self):
        PipelineConfig(batch_size=10_000)  # max, pipeline.rs:564-570
        with pytest.raises(ValueError):
            PipelineConfig(batch_size=10_001)
        with pytest.raises(ValueError):
            PipelineConfig(batch_size=0)

    def test_buffer_minimum(self):
        with pytest.raises(ValueError):
            PipelineConfig(channel_buffer_size=9)  # min 10, pipeline.rs:601-611

    def test_collection_level_requires_collections(self):
        with pytest.raises(ValueError):
            PipelineConfig(watch_level=WatchLevel.COLLECTION)
        PipelineConfig(watch_level=WatchLevel.COLLECTION, collections=["users"])

    def test_retry_delays(self):
        with pytest.raises(ValueError):
            PipelineConfig(retry_delay_ms=1000, max_retry_delay_ms=100)


class TestStreamConfig:
    def test_backoff_validation(self):
        with pytest.raises(ValueError):
            ChangeStreamConfig(initial_backoff_ms=100, max_backoff_ms=50)


class TestResumeTokenKey:
    """Key scheme per watch_level.rs:339-353."""

    def test_collection(self):
        assert resume_token_key(WatchLevel.COLLECTION, "mydb", "users") == "mydb:users"

    def test_database(self):
        assert resume_token_key(WatchLevel.DATABASE, "mydb", None) == "mydb:*"

    def test_deployment(self):
        assert resume_token_key(WatchLevel.DEPLOYMENT, "mydb", None) == "*:*"

    def test_collection_requires_name(self):
        with pytest.raises(ValueError):
            resume_token_key(WatchLevel.COLLECTION, "mydb", None)


class TestS3Config:
    """Bucket rules: 3-63 chars lowercase (s3/config.rs:494-520);
    prefix: no traversal, no leading slash (:522-556)."""

    def test_valid_bucket(self):
        S3SinkConfig(bucket="my-bucket.123")

    @pytest.mark.parametrize(
        "bad", ["", "ab", "UPPER", "-lead", "trail-", "a" * 64, "under_score"]
    )
    def test_invalid_bucket(self, bad):
        with pytest.raises(ValueError):
            S3SinkConfig(bucket=bad)

    def test_prefix_rules(self):
        with pytest.raises(ValueError):
            S3SinkConfig(bucket="ok-bucket", prefix="/lead")
        with pytest.raises(ValueError):
            S3SinkConfig(bucket="ok-bucket", prefix="a/../b")
        S3SinkConfig(bucket="ok-bucket", prefix="data/cdc")

    def test_filesystem_bucket_bypasses_name_rules(self):
        S3SinkConfig(bucket="/tmp/out")

    def test_endpoint_conf(self):
        c = S3SinkConfig(
            bucket="ok-bucket", endpoint_url="http://localhost:4566",
            force_path_style=True,
        )
        conf = c.spark_hadoop_conf()
        assert conf["fs.s3a.endpoint"] == "http://localhost:4566"
        assert conf["fs.s3a.path.style.access"] == "true"
