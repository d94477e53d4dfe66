"""Timestamp-encoding compatibility and incremental-dedup convergence.

The testdata stores event timestamps as TIMESTAMP(NANOS); any real
deployment will also feed plain micros parquet (Spark reads it as
TIMESTAMP_NTZ). The engine's contract is that results are identical
for either physical encoding of the same instants — load_table
normalizes the nanos path, and operators must not assume a
timezone-carrying TimestampType (the empty-input sweep caught
sessionize doing exactly that).

Also pins the incremental-dedup convergence law: admitting a corpus in
successive batches through ``incremental_new_docs`` yields exactly the
canonical set of whole-corpus exact dedup — the property that makes
batch-at-a-time admission safe at 100 TB.
"""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# event-time-sensitive queries: day bucketing, gap sessionization,
# hour windows, hive partition columns
_TS_QUERIES = [
    "b1_daily_active_users",
    "rel_sessionize",
    "b1_windowed_counts",
    "k9_hive_partition_cols",
]


@pytest.fixture(scope="module")
def ntz_dir(tmp_path_factory):
    """The same data re-encoded as plain micros parquet (NTZ path)."""
    d = str(tmp_path_factory.mktemp("sf_ntz"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"COPY (SELECT * FROM '{SF_DIR}/{t}.parquet') "
            f"TO '{os.path.join(d, t + '.parquet')}' (FORMAT PARQUET)"
        )
    con.close()
    return d


def _canon(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(row[c]) for c in cols) for row in df.collect())


@pytest.mark.parametrize("name", _TS_QUERIES)
def test_nanos_and_micros_encodings_agree(spark, ntz_dir, name):
    import __spark_entry__

    q = __spark_entry__.queries()[name]
    assert _canon(q(spark, SF_DIR)) == _canon(q(spark, ntz_dir)), name


def test_incremental_dedup_converges_to_exact_dedup(spark):
    from rigatoni_spark.llm import mixing
    from rigatoni_spark.llm.dedup import exact_dedup
    from rigatoni_spark.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    batches = [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)]

    admitted = None  # rows admitted so far (the growing corpus)
    for b in batches:
        new = mixing.incremental_new_docs(
            b.limit(0) if admitted is None else admitted, b
        )
        keep = b.join(
            new.select(F.col("first_doc_id").alias("doc_id")), "doc_id"
        )
        admitted = keep if admitted is None else admitted.unionByName(keep)

    n_admitted = admitted.count()

    # whole-corpus canonical set uses a different tie-break (global min
    # doc_id vs earliest-batch-first), so compare content-hash SETS
    inc_hashes = sorted(
        r.h for r in admitted.select(F.md5("text").alias("h")).collect()
    )
    canon_ids = exact_dedup(docs).select("doc_id")
    full_hashes = sorted(
        r.h
        for r in docs.join(canon_ids, "doc_id")
        .select(F.md5("text").alias("h"))
        .collect()
    )
    assert inc_hashes == full_hashes
    # and admission never lets a duplicate content through
    assert n_admitted == len(set(inc_hashes))
