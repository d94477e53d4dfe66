"""Write retry with exponential backoff (R1).

Mirrors the reference's schedule (pipeline.rs:1790-1868): delay starts
at ``retry_delay`` (default 100 ms), doubles per attempt
(pipeline.rs:1864), capped at ``max_retry_delay`` (default 30 s), for
``max_retries`` attempts; retryability is sniffed from the error
(pipeline.rs:1871-1900 / S3 classification s3/destination.rs:607-646).

In Spark, task-level retries (spark.task.maxFailures) and the S3A
committer already cover executor-side transients; this wrapper guards
the *driver-side* sink call inside ``foreachBatch`` — the exact place
the reference wraps ``write_batch + flush``.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import TypeVar

T = TypeVar("T")

# Error-text markers treated as retryable, mirroring is_retryable_error
# (pipeline.rs:1871-1875) + the S3 SDK classification
# (s3/destination.rs:607-646): SlowDown/ServiceUnavailable/InternalError
# retryable; AccessDenied/InvalidBucketName/validation not.
RETRYABLE_MARKERS = (
    "timeout",
    "timed out",
    "connection",
    "unavailable",
    "slowdown",
    "slow down",
    "throttl",
    "internal error",
    "temporar",
    "network",
    "reset",
)
FATAL_MARKERS = (
    "access denied",
    "accessdenied",
    "invalid bucket",
    "invalidbucketname",
    "no such bucket",
    "validation",
)


def is_retryable_error(err: BaseException) -> bool:
    # an error that knows its own class wins over text sniffing: e.g.
    # StreamInvalidatedError sets retryable=False so an invalidate on a
    # collection named "user_connections" is not mistaken for a
    # transient network failure and re-staged max_retries times
    flag = getattr(err, "retryable", None)
    if flag is not None:
        return bool(flag)
    text = str(err).lower()
    if any(m in text for m in FATAL_MARKERS):
        return False
    return any(m in text for m in RETRYABLE_MARKERS)


@dataclass
class RetryPolicy:
    max_retries: int = 3
    retry_delay_ms: int = 100
    max_retry_delay_ms: int = 30_000
    classify: Callable[[BaseException], bool] = field(
        default=is_retryable_error
    )

    def delays_ms(self) -> list[int]:
        out, d = [], self.retry_delay_ms
        for _ in range(self.max_retries):
            out.append(min(d, self.max_retry_delay_ms))
            d *= 2
        return out

    def __post_init__(self) -> None:
        if self.max_retries < 0:
            raise ValueError("max_retries must be >= 0")
        if self.retry_delay_ms <= 0 or self.max_retry_delay_ms < self.retry_delay_ms:
            raise ValueError("invalid retry delays")


def with_retry(
    fn: Callable[[], T],
    policy: RetryPolicy | None = None,
    on_retry: Callable[[int, BaseException], None] | None = None,
    sleep: Callable[[float], None] = time.sleep,
) -> T:
    """Call ``fn``; on retryable failure back off and retry.

    Raises the last error after ``max_retries`` exhausted, or
    immediately on a non-retryable error (matching the reference's
    categorization, pipeline.rs:1880-1900).
    """
    policy = policy or RetryPolicy()
    attempt = 0
    while True:
        try:
            return fn()
        except Exception as err:  # noqa: BLE001
            if attempt >= policy.max_retries or not policy.classify(err):
                raise
            if on_retry is not None:
                on_retry(attempt + 1, err)
            sleep(policy.delays_ms()[attempt] / 1000.0)
            attempt += 1
