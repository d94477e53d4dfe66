"""Batching / windowing operators (B1, B2) + partition-key derivation (K9).

The reference's only "window" is a processing-time size-OR-time batch
(pipeline.rs:1171-1279): flush at ``batch_size`` events or
``batch_timeout`` seconds. In Spark that IS the micro-batch trigger
(``trigger(processingTime=...)`` + ``maxFilesPerTrigger``), wired in
streaming/pipeline.py, not a data transform.

What the reference *lacks* — event-time windows, watermarks, late-data
handling (SURVEY.md §2.4) — Spark provides natively; exposed here as
first-class operators because real CDC analytics needs them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_partition_cols(df: DataFrame, ts_col: str = "cluster_time") -> DataFrame:
    """Derive Hive partition columns year/month/day/hour from event time
    (K9 HivePartitioned layout, s3/key_gen.rs:56-64,170-183).

    Pure projections — fused into the scan; downstream
    ``partitionBy("collection","year","month","day","hour")`` gives
    dynamic partition pruning on read."""
    t = F.col(ts_col)
    return (
        df.withColumn("year", F.year(t))
        .withColumn("month", F.month(t))
        .withColumn("day", F.dayofmonth(t))
        .withColumn("hour", F.hour(t))
    )


def windowed_counts(
    df: DataFrame,
    duration: str = "1 hour",
    ts_col: str = "cluster_time",
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Event-time tumbling window aggregation (beyond-reference).

    Single shuffle on (window, keys); partial aggregation map-side. In
    streaming, pair with ``withWatermark`` for bounded state.
    """
    keys = extra_keys or ["collection"]
    return (
        df.groupBy(F.window(F.col(ts_col), duration).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            *keys,
            "n_events",
            "sum_value",
        )
    )


def size_batched(
    df: DataFrame, batch_size: int, order_col: str = "event_id"
) -> DataFrame:
    """B1/B2 size-batching as a *data* transform: assign each event a
    batch index within its collection (ceil(rank / batch_size)).

    Used to reproduce the reference's "split batch when size exceeded"
    bench (batch_processing.rs:215-252). Note: a global sequential batch
    index requires ordering within collection — the window shuffles once
    per collection key; no driver-side loop.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("collection").orderBy(F.col(order_col))
    return df.withColumn(
        "batch_index",
        F.ceil(F.row_number().over(w) / F.lit(batch_size)).cast("bigint"),
    )


def with_estimated_size(df: DataFrame) -> DataFrame:
    """B2: per-event serialized-size estimate in bytes.

    The reference uses a crude ``doc.len() * 50`` heuristic
    (event.rs:397-432); ours is exact-ish over the JSON-string payload
    model: a fixed envelope base + the octet length of every payload
    column. Pure projection, fused into the scan.
    """
    payload = [
        F.coalesce(F.octet_length(c), F.lit(0))
        for c in ("document_key", "full_document", "updated_fields")
    ]
    size = F.lit(100) + sum(payload[1:], payload[0]) + F.coalesce(
        F.octet_length("resume_token"), F.lit(0)
    )
    return df.withColumn("estimated_size_bytes", size.cast("bigint"))


def bytes_batched(
    df: DataFrame,
    target_bytes: int = 1 << 20,
    order_col: str = "event_id",
) -> DataFrame:
    """B2: byte-size batch index per collection — a prefix-sum bucketing
    of the estimated sizes (batch_processing.rs:215-252's "split when
    cumulative serialized size exceeds ~1MB").

    batch boundary = floor(prefix_sum_before / target): deterministic,
    one window shuffle on collection, and expressible identically in
    ANSI SQL (unlike the reference's stateful greedy reset, which is
    order-dependent in exactly the same way but not a pure projection
    of the prefix sum).
    """
    from pyspark.sql import Window

    sized = with_estimated_size(df)
    w = (
        Window.partitionBy("collection")
        .orderBy(F.col(order_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = F.coalesce(F.sum("estimated_size_bytes").over(w), F.lit(0))
    return sized.withColumn(
        "byte_batch", F.floor(prefix / F.lit(target_bytes)).cast("bigint")
    )
