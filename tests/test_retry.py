"""Retry semantics — the reference's MockDestination-with-injectable-
failures pattern (pipeline_integration_test.rs:107-189) applied to the
with_retry wrapper (pipeline.rs:1790-1868)."""

from __future__ import annotations

import pytest

from rigatoni_spark.sinks.retry import RetryPolicy, is_retryable_error, with_retry


class FlakySink:
    """Fails the first ``fail_n`` calls, then succeeds."""

    def __init__(self, fail_n: int, error: Exception) -> None:
        self.fail_n = fail_n
        self.error = error
        self.calls = 0

    def __call__(self) -> str:
        self.calls += 1
        if self.calls <= self.fail_n:
            raise self.error
        return "ok"


def _no_sleep(_: float) -> None:
    pass


class TestWithRetry:
    def test_succeeds_after_transient_failures(self):
        sink = FlakySink(2, RuntimeError("connection timeout"))
        retries = []
        out = with_retry(
            sink,
            RetryPolicy(max_retries=3),
            on_retry=lambda n, e: retries.append(n),
            sleep=_no_sleep,
        )
        assert out == "ok"
        assert sink.calls == 3
        assert retries == [1, 2]

    def test_exhausts_retries(self):
        sink = FlakySink(10, RuntimeError("service unavailable"))
        with pytest.raises(RuntimeError):
            with_retry(sink, RetryPolicy(max_retries=3), sleep=_no_sleep)
        assert sink.calls == 4  # initial + 3 retries

    def test_fatal_error_no_retry(self):
        # AccessDenied is non-retryable (s3/destination.rs:607-646)
        sink = FlakySink(10, RuntimeError("AccessDenied: forbidden"))
        with pytest.raises(RuntimeError):
            with_retry(sink, RetryPolicy(max_retries=3), sleep=_no_sleep)
        assert sink.calls == 1

    def test_backoff_schedule_doubles_capped(self):
        # 100ms doubling capped at 30s (pipeline.rs:1864, :580-599)
        p = RetryPolicy(max_retries=12, retry_delay_ms=100, max_retry_delay_ms=30_000)
        d = p.delays_ms()
        assert d[:4] == [100, 200, 400, 800]
        assert d[-1] == 30_000

    def test_classification(self):
        assert is_retryable_error(RuntimeError("Read timed out"))
        assert is_retryable_error(RuntimeError("SlowDown: please reduce rate"))
        assert not is_retryable_error(RuntimeError("InvalidBucketName"))
        assert not is_retryable_error(RuntimeError("schema validation failed"))

    def test_self_classification_beats_text_sniffing(self):
        # an error that declares `retryable` wins over its message: an
        # invalidate on a collection named "user_connections" contains
        # the "connection" marker but must stay terminal
        from rigatoni_spark.streaming.pipeline import StreamInvalidatedError

        terminal = StreamInvalidatedError(
            "invalidate event on user_connections"
        )
        assert not is_retryable_error(terminal)

        class _Flaky(RuntimeError):
            retryable = True

        assert is_retryable_error(_Flaky("schema validation failed"))

        sink = FlakySink(10, StreamInvalidatedError("invalidate event on reset_tokens"))
        with pytest.raises(StreamInvalidatedError):
            with_retry(sink, RetryPolicy(max_retries=3), sleep=_no_sleep)
        assert sink.calls == 1  # no backoff re-staging of a dead stream
