"""Z-order layout (operators/layout.py): row-group stats stay tight on
BOTH interleaved columns, and the rewrite is a pure re-ordering."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq


def _rowgroup_span_fraction(path_glob: str, col: str) -> float:
    """Mean over row groups of (max-min)/global_span for ``col`` —
    1.0 means every row group covers the whole domain (no pruning
    possible), small means tight stats (most groups prunable)."""
    spans, lo, hi = [], None, None
    for f in glob.glob(path_glob):
        meta = pq.ParquetFile(f).metadata
        idx = {meta.row_group(0).column(i).path_in_schema: i
               for i in range(meta.num_columns)}[col]
        for g in range(meta.num_row_groups):
            st = meta.row_group(g).column(idx).statistics
            spans.append((st.min, st.max))
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
    total = max(hi - lo, 1)
    return sum((b - a) / total for a, b in spans) / len(spans)


class TestZorder:
    def test_tight_stats_on_both_columns(self, spark, tmp_path):
        from rigatoni_spark.operators.layout import write_zordered
        from rigatoni_spark.tables import load_table

        li = load_table(spark, "/root/testdata/sf0.01", "lineitem").select(
            "l_orderkey", "l_partkey", "l_quantity"
        )
        naive = str(tmp_path / "naive")
        zord = str(tmp_path / "zord")
        (
            li.repartitionByRange(32, "l_orderkey")
            .sortWithinPartitions("l_orderkey")
            .write.mode("overwrite").parquet(naive)
        )
        write_zordered(li, zord, "l_orderkey", "l_partkey", n_files=32)

        # the single-column sort leaves l_partkey unclustered: each row
        # group spans ~the whole partkey domain
        naive_b = _rowgroup_span_fraction(f"{naive}/*.parquet", "l_partkey")
        z_a = _rowgroup_span_fraction(f"{zord}/*.parquet", "l_orderkey")
        z_b = _rowgroup_span_fraction(f"{zord}/*.parquet", "l_partkey")
        assert naive_b > 0.8
        # z-order keeps BOTH dimensions clustered; 32 range files over
        # a 2x16-bit curve -> each file covers ~1/sqrt(32) of each axis
        assert z_a < 0.5 and z_b < 0.5, (z_a, z_b)

    def test_rewrite_preserves_rows(self, spark, tmp_path):
        from rigatoni_spark.operators.layout import zorder_by
        from rigatoni_spark.tables import load_table

        li = load_table(spark, "/root/testdata/sf0.001", "lineitem").select(
            "l_orderkey", "l_partkey", "l_quantity"
        )
        out = zorder_by(li, "l_orderkey", "l_partkey")
        assert out.columns == li.columns
        a = sorted(map(tuple, li.collect()))
        b = sorted(map(tuple, out.collect()))
        assert a == b
