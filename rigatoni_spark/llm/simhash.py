"""SimHash document fingerprints + Hamming-distance near-dup search.

32-bit SimHash over distinct tokens: token hash = first 8 hex of MD5
(deterministic, cross-engine); bit j of the signature is the sign of
``sum over tokens of (2*bit_j(hash) - 1)`` (ties -> 1). Near-dups are
found by chunk-blocking (pigeonhole: two signatures within Hamming
distance d share at least one of d+1 chunks) + exact
``bit_count(xor)`` verify — no all-pairs comparison.

Scale: signature build is explode(tokens) x 32 bits -> two hash
aggregations keyed by (doc, bit)/(doc) — map-side partial agg collapses
the exchange to ~docs x 32 rows. The chunk join is an equi-join on
(chunk_idx, chunk_value) with corpus-proportional key cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rigatoni_spark.tables import spread

BITS = 32
N_CHUNKS = 4  # 8-bit chunks -> catches pairs with hamming <= 3 fully;
# with verify threshold d, recall is partial beyond d >= N_CHUNKS


def _token_hash():
    return F.conv(F.substring(F.md5(F.col("token")), 1, 8), 16, 10).cast("bigint")


def simhash_signatures(documents: DataFrame) -> DataFrame:
    """(doc_id, simhash): 32-bit signature as bigint."""
    toks = spread(documents).select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.col("text"), " "))).alias("token"),
    ).withColumn("h", _token_hash())
    bits = toks.select(
        "doc_id",
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(BITS - 1))).alias("j"),
    ).select(
        "doc_id",
        "j",
        # (bit_j(h) * 2 - 1): +1/-1 vote per token per bit
        F.expr("(((h >> j) & 1) * 2 - 1)").alias("contrib"),
    )
    per_bit = bits.groupBy("doc_id", "j").agg(F.sum("contrib").alias("s"))
    return (
        per_bit.groupBy("doc_id")
        .agg(
            F.sum(
                F.expr("CASE WHEN s >= 0 THEN shiftleft(CAST(1 AS BIGINT), j) ELSE 0 END")
            ).alias("simhash")
        )
        .orderBy("doc_id")
    )


SIGNATURES_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
  FROM documents
), hashed AS (
  SELECT doc_id, ('0x' || substr(md5(token), 1, 8))::BIGINT AS h FROM toks
), bits AS (
  SELECT doc_id, j.j, (((h >> j.j) & 1) * 2 - 1) AS contrib
  FROM hashed CROSS JOIN (SELECT unnest(generate_series(0, {BITS - 1})) AS j) j
), per_bit AS (
  SELECT doc_id, j, SUM(contrib) AS s FROM bits GROUP BY doc_id, j
)
SELECT doc_id,
  -- CAST: DuckDB types bare SUM(BIGINT) as HUGEINT, which the driver's
  -- value-hash normalizer renders differently from Spark's BIGINT
  CAST(SUM(CASE WHEN s >= 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT)
    AS simhash
FROM per_bit GROUP BY doc_id ORDER BY doc_id
"""


def near_duplicates(documents: DataFrame, max_hamming: int = 2) -> DataFrame:
    """Pairs with Hamming(simhash_a, simhash_b) <= max_hamming, found
    via 8-bit chunk blocking (never all-pairs)."""
    # materialize the signature sketch ONCE: both self-join sides read
    # it, and Spark does not reuse the explode-x32 aggregation plan
    # across join sides (verified: zero ReusedExchange). |docs| rows of
    # (id, bigint) — the standard materialize-your-sketches step.
    sigs = simhash_signatures(documents).localCheckpoint()
    chunk_bits = BITS // N_CHUNKS
    chunks = sigs.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(N_CHUNKS - 1))).alias("c"),
    ).withColumn(
        "chunk",
        F.expr(f"(simhash >> (c * {chunk_bits})) & {(1 << chunk_bits) - 1}"),
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    ham = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    )
    return (
        a.join(
            b,
            (F.col("a.c") == F.col("b.c"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            # hamming filter inside the join: evaluated before the
            # distinct shuffle, so non-dup candidates never exchange
            & (ham <= max_hamming),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


def near_duplicates_oracle(max_hamming: int = 2) -> str:
    chunk_bits = BITS // N_CHUNKS
    mask = (1 << chunk_bits) - 1
    return f"""
WITH sigs AS ({SIGNATURES_ORACLE.strip().rstrip()}),
chunks AS (
  SELECT doc_id, simhash, c.c,
         (simhash >> (c.c * {chunk_bits})) & {mask} AS chunk
  FROM sigs CROSS JOIN (SELECT unnest(generate_series(0, {N_CHUNKS - 1})) AS c) c
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM chunks a JOIN chunks b
  ON a.c = b.c AND a.chunk = b.chunk AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
ORDER BY doc_a, doc_b
"""
