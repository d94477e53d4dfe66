"""Deduplication by document key (G3).

The reference drops later duplicates of the same ``document_key`` within
a batch via a HashSet on the stringified key
(batch_processing.rs:320-354; +25% overhead, docs/performance.md:167-173).

Spark-first design: a window ``row_number`` per (collection,
document_key) ordered by the stream position — deterministic (unlike
``dropDuplicates``, whose survivor depends on partition scan order),
and it shuffles once on the dedup key. ``keep='first'`` reproduces the
reference's HashSet semantics; ``keep='last'`` is CDC log-compaction
(latest state wins).

Scale: the shuffle hash-partitions on (collection, document_key) —
high-cardinality keys, so no skew hot-spot; AQE splits stragglers.
For streaming, ``dedup_stream_within_watermark`` bounds state with a
watermark (dropDuplicatesWithinWatermark) instead of keeping all keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_by_key(
    df: DataFrame,
    key_cols: list[str] | None = None,
    order_col: str = "resume_token",
    keep: str = "first",
) -> DataFrame:
    """Keep one event per key, deterministically.

    ``order_col`` defaults to ``resume_token`` (monotone stream
    position). Cast to a sortable form: our tokens are stringified
    integers, so order by the numeric cast.
    """
    if key_cols is None:
        key_cols = ["collection", "document_key"]
    ordering = F.col(order_col).cast("bigint") if order_col == "resume_token" else F.col(order_col)
    if keep == "last":
        ordering = ordering.desc()
    elif keep != "first":
        raise ValueError("keep must be 'first' or 'last'")
    w = Window.partitionBy(*key_cols).orderBy(ordering)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def latest_by_key(df: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
    """CDC log-compaction: latest event per key (keep='last')."""
    return dedup_by_key(df, key_cols=key_cols, keep="last")


def dedup_stream_within_watermark(
    df: DataFrame,
    key_cols: list[str] | None = None,
    event_time_col: str = "cluster_time",
    delay: str = "10 minutes",
) -> DataFrame:
    """Streaming dedup with bounded state.

    The reference's HashSet dedup is per-batch only; at 100 TB/stream
    scale unbounded key state is the real problem —
    ``dropDuplicatesWithinWatermark`` expires state past the watermark.
    """
    if key_cols is None:
        key_cols = ["collection", "document_key"]
    return df.withWatermark(event_time_col, delay).dropDuplicatesWithinWatermark(
        key_cols
    )
