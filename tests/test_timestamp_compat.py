"""Timestamp-encoding compatibility and incremental-dedup convergence.

The driver's testdata has shipped event timestamps as TIMESTAMP(NANOS)
(rounds 1-2 pre-regen; Spark surfaces LongType under nanosAsLong) AND
as TIMESTAMP(MICROS) (current; surfaces TIMESTAMP_NTZ). The engine's
contract is that BATCH AND STREAMING results are identical for either
physical encoding of the same instants — ``tables.normalize_ts`` is
the single conversion point and ``read_change_events_stream`` probes
the footer to pick its schema. This module is the canary that fires if
the driver regenerates the testdata in either direction again.

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


@pytest.fixture(scope="module")
def nanos_dir(tmp_path_factory):
    """The same data re-encoded as TIMESTAMP(NANOS) parquet (the rounds
    1-2 physical layout; Spark surfaces LongType under nanosAsLong)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path_factory.mktemp("sf_nanos"))
    for t in TABLES:
        tab = pq.read_table(os.path.join(SF_DIR, f"{t}.parquet"))
        cols = [
            tab.column(n).cast(pa.timestamp("ns"))
            if pa.types.is_timestamp(tab.schema.field(n).type)
            else tab.column(n)
            for n in tab.schema.names
        ]
        pq.write_table(
            pa.table(dict(zip(tab.schema.names, cols))),
            os.path.join(d, f"{t}.parquet"),
            version="2.6",
        )
    return d


def _canon(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(row[c]) for c in cols) for row in df.collect())


@pytest.mark.parametrize("encoding", ["ntz", "nanos"])
@pytest.mark.parametrize("name", _TS_QUERIES)
def test_physical_encodings_agree(spark, ntz_dir, nanos_dir, name, encoding):
    import __spark_entry__

    other = ntz_dir if encoding == "ntz" else nanos_dir
    q = __spark_entry__.queries()[name]
    assert _canon(q(spark, SF_DIR)) == _canon(q(spark, other)), name


@pytest.mark.parametrize("encoding", ["ntz", "nanos"])
def test_streaming_source_handles_both_encodings(
    spark, ntz_dir, nanos_dir, encoding
):
    """read_change_events_stream footer-probes the ts physical type; the
    streamed windowed counts must equal the batch result whichever way
    the files were written (the round-2 regen bug: hardcoded nanos
    conversion put every micros event in January 1970)."""
    from rigatoni_spark.operators.batching import windowed_counts
    from rigatoni_spark.sources.change_events import (
        read_change_events,
        read_change_events_stream,
    )

    src = ntz_dir if encoding == "ntz" else nanos_dir
    sdf = read_change_events_stream(spark, src, path_glob="events.parquet")
    assert dict(sdf.dtypes)["cluster_time"] == "timestamp", encoding
    name = f"ts_canary_{encoding}"
    q = (
        windowed_counts(sdf, "1 hour")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not drain"
    got = _canon(spark.table(name))
    want = _canon(windowed_counts(read_change_events(spark, SF_DIR), "1 hour"))
    assert got == want
    # sanity: event-times are in the data's real year, not 1970
    assert all("1970" not in str(r) for r in got[:3])


def test_stream_probe_falls_back_on_empty_dir(spark, tmp_path):
    """Starting a stream on a not-yet-populated directory: the footer
    probe has nothing to read and must fall back to the micros/NTZ
    assumption (what pyarrow and the current testdata write), so files
    appended AFTER start are interpreted correctly."""
    import pyarrow.parquet as pq

    from rigatoni_spark.operators.batching import windowed_counts
    from rigatoni_spark.sources.change_events import (
        read_change_events,
        read_change_events_stream,
    )

    src = tmp_path / "late_src"
    src.mkdir()  # empty at stream-definition time
    sdf = read_change_events_stream(spark, str(src))
    assert dict(sdf.dtypes)["cluster_time"] == "timestamp"
    # data arrives only now
    pq.write_table(
        pq.read_table(os.path.join(SF_DIR, "events.parquet")),
        str(src / "a.parquet"),
    )
    q = (
        windowed_counts(sdf, "1 hour")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("late_probe_out")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = _canon(spark.table("late_probe_out"))
    want = _canon(windowed_counts(read_change_events(spark, SF_DIR), "1 hour"))
    assert got == want


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
