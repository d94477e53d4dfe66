"""Grouping operators (G1, G2, G4).

The reference's only aggregations: hash-group a drained buffer by
collection for per-collection S3 objects (s3/destination.rs:537-549)
and bulk-count a batch by operation for Prometheus counters
(pipeline.rs:1766-1772). Both are single-shuffle groupBy/count in Spark
with map-side partial aggregation — the 100 TB-safe formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_by_collection_counts(df: DataFrame) -> DataFrame:
    """G1 (observability form): events per (database, collection).

    The write-path equivalent is ``partitionBy("collection")`` in the
    sink (sinks/writers.py) — grouping happens in the shuffle, never on
    the driver.
    """
    return (
        df.groupBy("database", "collection")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("database", "collection")
    )


def count_by_operation(df: DataFrame) -> DataFrame:
    """G2: per-operation counts (pipeline.rs:1766-1772)."""
    return (
        df.groupBy("operation")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("operation")
    )


def pipeline_stats(df: DataFrame) -> DataFrame:
    """G4: one-row running-totals frame (PipelineStats,
    pipeline.rs:637-651). In streaming this comes from
    ``df.observe``/query progress; batch form for the oracle check."""
    return df.agg(
        F.count(F.lit(1)).alias("events_processed"),
        F.countDistinct("collection").alias("active_collections"),
        F.min("cluster_time").alias("first_event_time"),
        F.max("cluster_time").alias("last_event_time"),
    )
