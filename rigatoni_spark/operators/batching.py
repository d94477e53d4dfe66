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
