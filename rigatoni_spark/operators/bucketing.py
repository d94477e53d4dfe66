"""Bucketed-table co-location: the pre-shuffle that makes repeated
fact-to-fact joins shuffle-free.

The reference never joins, so this is pure beyond-reference Spark
surface — but it is THE tool for the 100 TB join problem: a table
bucketed (and optionally sorted) by its join key is physically
hash-partitioned on disk, so every later equi-join or aggregation on
that key reads co-located buckets and skips the Exchange entirely.
One shuffle at write time is amortized over every downstream join.

Rules that make it work (asserted in tests/test_bucketing.py):

- both sides bucketed by the join key with the SAME bucket count
  (mismatched counts re-shuffle the smaller side);
- bucket pruning: an equality filter on the bucket column reads 1/N of
  the files;
- `sortBy` inside buckets upgrades the join to a zero-sort merge join.

At 100 TB the bucket count is sized so one bucket of the larger table
fits an executor core's working set (e.g. 4096 buckets for a 10 TB
fact table ~ 2.5 GB/bucket); both fact tables use the same count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str | list[str],
    n_buckets: int,
    sort_col: str | list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a parquet table bucketed by ``bucket_col``
    (one column or a composite key list — a later equi-join skips its
    shuffle only when the join keys cover the FULL bucket spec, so
    composite join keys need composite bucketing).

    ``table`` may be qualified (``db.name``); create the database with
    an explicit LOCATION first to control where files land. ``path``
    makes it an EXTERNAL table at that location instead (the files then
    live with their owner's state — e.g. the admission gate keeps its
    bucketed probe index inside its own state tree); the table entry is
    dropped and the location cleared first so a re-write with a new
    bucket count or schema never collides with stale metadata.
    """
    cols = [bucket_col] if isinstance(bucket_col, str) else list(bucket_col)
    if path is not None:
        import shutil

        df.sparkSession.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(path.replace("file:", ""), ignore_errors=True)
    writer = (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(n_buckets, *cols)
    )
    if path is not None:
        writer = writer.option("path", path)
    if sort_col is not None:
        scols = [sort_col] if isinstance(sort_col, str) else list(sort_col)
        writer = writer.sortBy(*scols)
    writer.saveAsTable(table)


def write_band_index(
    documents: DataFrame,
    table: str,
    n_buckets: int = 4096,
    k: int | None = None,
    bands: int | None = None,
    shingle_n: int = 3,
) -> None:
    """Materialize the corpus MinHash band sketch as a table bucketed
    on the probe key (band, band_hash) — the persistent index
    ``minhash.incremental_near_duplicates(corpus_bands=...)`` contracts
    on: the admission probe join then shuffles ONLY the increment
    (tests/test_bucketing.py pins the one-fewer-Exchange plan).
    Build once per corpus; probe per crawl batch."""
    from rigatoni_spark.llm import minhash

    bands_df = minhash.lsh_bands(
        documents,
        k=k or minhash.DEFAULT_K,
        bands=bands or minhash.DEFAULT_BANDS,
        shingle_n=shingle_n,
    )
    write_bucketed(
        bands_df, table, ["band", "band_hash"], n_buckets,
        sort_col=["band", "band_hash"],
    )


def write_vector_index(
    embeddings: DataFrame, table: str, n_buckets: int = 4096
) -> None:
    """Materialize the cosine-LSH posting list (corpus_id, c_emb,
    bucket, c_nrm) bucketed on ``bucket`` — the persistent index
    ``vectors.incremental_embedding_neardup(corpus_buckets=...)``
    contracts on; the vectors ride the index rows so the probe needs
    no second fetch."""
    from pyspark.sql import functions as F

    from rigatoni_spark.llm import vectors

    idx = embeddings.select(
        F.col("vec_id").alias("corpus_id"),
        F.col("embedding").alias("c_emb"),
        vectors._bucket(F.col("embedding")).alias("bucket"),
        vectors._norm(F.col("embedding")).alias("c_nrm"),
    )
    write_bucketed(idx, table, "bucket", n_buckets, sort_col="bucket")


def cobucketed_join(
    spark: SparkSession, left: str, right: str, key_left: str, key_right: str
) -> DataFrame:
    """Equi-join two co-bucketed tables on their bucket keys.

    With matching bucket counts Catalyst plans this WITHOUT a shuffle
    on either side (no Exchange above the scans) — the property the
    plan test pins down.
    """
    lt = spark.table(left)
    rt = spark.table(right)
    return lt.join(rt, lt[key_left] == rt[key_right])


def write_pq_index(
    embeddings: DataFrame, table: str, n_buckets: int = 64
) -> None:
    """Materialize the IVF-PQ serving index: ``(vec_id, cell, codes,
    code_key, distortion)`` bucketed AND sorted on ``cell`` — the
    persistent twin of :func:`write_vector_index` for the
    compressed-domain path. A probe (``llm.pq.ivfpq_probe_index``)
    filters ``cell IN (probed)`` and reads only those buckets; the
    codes column (m bytes/vector) is the whole payload, so at 100 TB
    the index read is ~n_probe/n_cells of a corpus already shrunk 16x.
    Bucket count should divide evenly into cells (default 64 buckets
    for 16 cells: 4 cells/bucket at worst; at scale use
    n_buckets == n_cells so one probed cell == one bucket)."""
    from rigatoni_spark.llm import pq

    write_bucketed(
        pq.pq_index_frame(embeddings), table, "cell", n_buckets,
        sort_col="cell",
    )
