"""SparkSession factory tuned for the engine.

Local-mode settings mirror what a cluster deployment would set per-job:
AQE on (runtime re-planning, skew-join splitting, partition coalescing),
shuffle partitions sized to cores (on a 1000-executor cluster this would
be ~2-3x total cores), UTC session timezone so results compare exactly
against UTC-naive oracle engines, and Arrow enabled so any Pandas-UDF
path is vectorized.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "rigatoni_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession with scale-aware defaults.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS or all cores. On a real
    cluster the master/deploy settings come from spark-submit; only the
    SQL-level configs below matter there.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # testdata parquet carries TIMESTAMP(NANOS) which Spark has no
        # native type for; read as long and convert in tables.load_table
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # long sessions running many distinct queries accumulate
        # broadcast/shuffle state that the ContextCleaner only releases
        # on driver GC (default periodic trigger: 30 min) — tighten it
        # so a query catalog sweep doesn't age the session into slow
        # broadcast rebuilds
        .config("spark.cleaner.periodicGC.interval", "1min")
        # the generated-class cache defaults to 100 entries; a ~90-query
        # catalog sweep spans several hundred codegen'd stages, so the
        # default thrashes and queries re-JIT on every revisit (observed
        # as random 5-30x stage slowdowns in long sessions)
        .config("spark.sql.codegen.cache.maxEntries", "2000")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
