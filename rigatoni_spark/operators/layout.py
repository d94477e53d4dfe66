"""Z-order data layout: multi-dimensional clustering for row-group
pruning.

A table sorted on ONE column prunes parquet row groups only for
filters on that column; filters on anything else scan everything. The
Z-order (Morton) curve interleaves the bits of several columns so rows
close in EVERY dimension land in the same row group — min/max footer
stats then stay tight on ALL interleaved columns and a 100 TB scan
with a filter on any of them skips most of the file. This is the same
layout trick Delta/Iceberg expose as OPTIMIZE ... ZORDER BY; here it
is a plain repartition-by-range + sort on the computed Morton key, so
it works on any parquet destination.

Beyond-reference Spark surface (the reference replicates, it never
lays out for scans); integer-only arithmetic — bit extraction via
exact power-of-two division — so the key is deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 16  # per-dimension resolution; 2 dims -> 32-bit Morton key


def morton_key() -> Column:
    """Interleave the low Z_BITS bits of the staged ``_za``/``_zb``
    columns: bit i of ``_za`` lands at position 2i, of ``_zb`` at
    2i+1."""
    key = F.lit(0).cast("bigint")
    for i in range(Z_BITS):
        bit_a = F.expr(f"(_za div {1 << i}) % 2")
        bit_b = F.expr(f"(_zb div {1 << i}) % 2")
        key = key + bit_a * F.lit(1 << (2 * i)) + bit_b * F.lit(
            1 << (2 * i + 1)
        )
    return key


def zorder_by(df: DataFrame, col_a: str, col_b: str, n_files: int = 32) -> DataFrame:
    """Return ``df`` re-clustered on the Morton key of two integer
    columns, ready to write: range-partitioned into ``n_files`` key
    ranges and sorted within each, so parquet row-group min/max stats
    stay tight on BOTH columns.

    The min/max needed for normalization ride a 1-row broadcast (the
    same bounded scalar-dim shape as q11/q22) — no driver collect, no
    second pass over the data beyond the stats aggregation.
    """
    bounds = df.agg(
        F.min(col_a).cast("bigint").alias("_min_a"),
        F.max(col_a).cast("bigint").alias("_max_a"),
        F.min(col_b).cast("bigint").alias("_min_b"),
        F.max(col_b).cast("bigint").alias("_max_b"),
    )
    with_key = (
        df.join(F.broadcast(bounds))
        .withColumn(
            "_za",
            F.expr(
                f"(({col_a} - _min_a) * {(1 << Z_BITS) - 1})"
                " div GREATEST(_max_a - _min_a, 1)"
            ),
        )
        .withColumn(
            "_zb",
            F.expr(
                f"(({col_b} - _min_b) * {(1 << Z_BITS) - 1})"
                " div GREATEST(_max_b - _min_b, 1)"
            ),
        )
        .withColumn("_zkey", morton_key())
        .drop("_min_a", "_max_a", "_min_b", "_max_b", "_za", "_zb")
    )
    return (
        with_key.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
    )


def write_zordered(
    df: DataFrame, path: str, col_a: str, col_b: str, n_files: int = 32
) -> None:
    zorder_by(df, col_a, col_b, n_files).write.mode("overwrite").parquet(path)
