"""Partition-count invariance: query results must not depend on the
physical layout Spark happens to pick.

This is the core 100 TB reproducibility claim — on a 1000-executor
cluster the same query runs with thousands of shuffle partitions and
input splits, and must produce byte-identical results to local[8] with
8. Anything partition-sensitive (float sum order, unstable top-k ties,
first/last without ordering) would silently diverge at scale; the
engine guards against that by design (decimal pre-cast sums in
``functions.exact_sum``, min_by/max_by keyed dedup, total-order
tie-breaks in every top-k). This test pins the guarantee.

Sweeps two physical dimensions at sf0.001:
  * ``spark.sql.shuffle.partitions`` — 1 / 7 / 32 (prime included so
    hash ranges never align between runs)
  * ``spark.sql.files.maxPartitionBytes`` — default vs 64 KiB (forces
    many input splits, i.e. a different scan parallelism)
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR

# Representative slice of the catalog: float-heavy aggregation,
# window/sessionization, keyed dedup, MinHash-banded join, top-k with
# ties, and a multi-join TPC-H shape. Cheap at sf0.001.
_QUERIES = [
    "rel_q1_pricing_summary",
    "g3_dedup_latest_by_key",
    "rel_sessionize",
    "dedup_minhash_lsh",
    "sim_cosine_topk",
    "rel_q5_region_revenue",
    # integer k-means: the partition-order-independence claim IS the
    # operator's design rationale — verify it directly
    "sim_kmeans_cells",
]


def _canon(df):
    """Deterministic, ordering-free canonical form of a result set."""
    cols = sorted(df.columns)
    rows = [tuple(str(row[c]) for c in cols) for row in df.collect()]
    return sorted(rows)


@pytest.fixture(scope="module")
def catalog():
    import __spark_entry__

    return __spark_entry__.queries()


@pytest.mark.parametrize("name", _QUERIES)
def test_shuffle_partition_invariance(spark, catalog, name):
    if name not in catalog:
        pytest.skip(f"{name} not in catalog")
    results = {}
    baseline = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for n in (1, 7, 32):
            spark.conf.set("spark.sql.shuffle.partitions", str(n))
            results[n] = _canon(catalog[name](spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", baseline)
    assert results[1] == results[7] == results[32], (
        f"{name} result depends on shuffle partition count"
    )


@pytest.mark.parametrize("name", _QUERIES)
def test_input_split_invariance(spark, catalog, name):
    if name not in catalog:
        pytest.skip(f"{name} not in catalog")
    baseline = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        wide = _canon(catalog[name](spark, SF_DIR))
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(64 * 1024))
        narrow = _canon(catalog[name](spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", baseline)
    assert wide == narrow, f"{name} result depends on input split size"
