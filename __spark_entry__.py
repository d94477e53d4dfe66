"""Driver contract for the spark-graft builder (PySpark target).

Thin facade over :mod:`rigatoni_spark.catalog`, where each implemented
operator from SURVEY.md §2 (plus the relational surface and the
LLM-pipeline operators) is registered as a named query with its DuckDB
oracle SQL.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's spine — change-event source -> $match
    pushdown filter -> dedup-by-key -> per-collection/hour rollup
    (SURVEY.md §7.1 slice 0)."""
    from pyspark.sql import functions as F

    from rigatoni_spark.operators import batching, dedup, filters
    from rigatoni_spark.sources.change_events import read_change_events

    ce = read_change_events(spark, "/root/testdata/sf0.001")
    filtered = filters.match_pipeline(
        ce,
        [{"$match": {"operationType": {"$in": ["insert", "update", "replace"]}}}],
    )
    deduped = dedup.latest_by_key(filtered)
    parts = batching.with_partition_cols(deduped)
    return (
        parts.groupBy("collection", "year", "month", "day", "hour")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("collection", "year", "month", "day", "hour")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from rigatoni_spark.catalog import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from rigatoni_spark.catalog import ORACLES

    return dict(ORACLES)
