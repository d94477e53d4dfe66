"""Document deduplication family: exact, near-dup via n-gram Jaccard,
MinHash+LSH, SimHash.

Scale design notes
------------------
- exact: hash-groupBy on md5(text) — one shuffle keyed by digest,
  perfectly uniform, no skew. The survivor is min(doc_id) (deterministic
  canonical representative), not "whichever partition came first".
- n-gram Jaccard: never all-pairs. Pairs are generated per blocking key
  (here: ``source``); at 100 TB the blocking key is an LSH band bucket
  (see minhash_lsh below), which bounds candidate pairs independent of
  corpus size.
- MinHash: k independent permutations simulated by k salted MD5s; the
  signature min is taken per (doc, salt) via one explode + groupBy —
  shuffle keyed by doc_id. Banding then buckets signatures; candidate
  pairs come from an equi-join on (band_id, band_hash) — a hash join on
  a uniform key, the canonical distributed LSH plan.
- SimHash: 64-bit bit-majority over token hashes, computed with
  bit-arithmetic column expressions (no UDF); near-dups = equal 16-bit
  chunk join (Hamming-distance blocking).

Everything is deterministic (MD5-based, no RNG) so results are
reproducible run-to-run and verifiable against the SQL oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_duplicates(documents: DataFrame) -> DataFrame:
    """Exact-dup groups by content hash; canonical = min(doc_id)."""
    return (
        documents.select("doc_id", F.md5(F.col("text")).alias("text_md5"))
        .groupBy("text_md5")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
        .filter(F.col("n_copies") > 1)
        .orderBy("canonical_doc_id")
    )


EXACT_DUP_ORACLE = """
SELECT md5(text) AS text_md5, COUNT(*) AS n_copies,
       MIN(doc_id) AS canonical_doc_id
FROM documents GROUP BY md5(text) HAVING COUNT(*) > 1
ORDER BY canonical_doc_id
"""


def exact_dedup(documents: DataFrame) -> DataFrame:
    """Keep one doc per content hash (min doc_id survives) — the
    hash-groupBy exact dedup pass itself."""
    canon = (
        documents.select("doc_id", F.md5(F.col("text")).alias("text_md5"))
        .groupBy("text_md5")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    return (
        documents.join(canon.select("doc_id"), "doc_id", "left_semi")
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )


EXACT_DEDUP_ORACLE = """
WITH canon AS (
  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
)
SELECT d.doc_id, d.lang, d.source, d.n_chars
FROM documents d JOIN canon USING (doc_id)
ORDER BY d.doc_id
"""


def ngram_jaccard_pairs(
    documents: DataFrame, threshold: float = 0.8, block_col: str = "source"
) -> DataFrame:
    """Near-duplicate pairs by word-set Jaccard within a blocking key.

    Jaccard over distinct unigram sets: |A∩B| / |A∪B| — set semantics,
    order-insensitive, so exact integer arithmetic + one deterministic
    division. The self-join is blocked on ``block_col`` (at scale: LSH
    band buckets) and de-duplicated with doc_a < doc_b.
    """
    toks = F.array_distinct(F.split(F.col("text"), " "))
    t = documents.select(
        "doc_id", F.col(block_col).alias("block"), toks.alias("toks")
    )
    a = t.alias("a")
    b = t.alias("b")
    inter = F.size(F.array_intersect(F.col("a.toks"), F.col("b.toks")))
    union = F.size(F.array_union(F.col("a.toks"), F.col("b.toks")))
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(inter / union, 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


def ngram_jaccard_oracle(threshold: float = 0.8, block_col: str = "source") -> str:
    return f"""
WITH t AS (
  SELECT doc_id, {block_col} AS block,
         list_distinct(string_split(text, ' ')) AS toks
  FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
  ROUND(len(list_intersect(a.toks, b.toks)) * 1.0 /
        (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))),
        4) AS jaccard
FROM t a JOIN t b ON a.block = b.block AND a.doc_id < b.doc_id
WHERE len(list_intersect(a.toks, b.toks)) * 1.0 /
      (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
      >= {threshold}
ORDER BY doc_a, doc_b
"""
