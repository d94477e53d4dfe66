"""Composite corpus-preparation pipeline: quality gate -> exact-dedup
canonicalization — the minimal end-to-end "raw crawl to training corpus"
flow, composed from the scoring and dedup primitives.

Scale: the quality gate is a pure projection+filter (fused into the
scan, no shuffle); the canonical pass is one groupBy on md5(text)
(uniform 128-bit key) + a broadcast-able semi-join back. Two shuffles
total regardless of corpus size; at 100 TB insert the MinHash pass
(llm/minhash.py) between gate and canonicalization for near-dups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rigatoni_spark.tables import spread

MIN_TOKENS = 30
MIN_TTR = 0.5  # type-token ratio floor (repetition filter)


def clean_corpus(
    documents: DataFrame,
    min_tokens: int = MIN_TOKENS,
    min_ttr: float = MIN_TTR,
) -> DataFrame:
    """Quality-pass + canonical (min doc_id per content hash) corpus."""
    toks = F.split(F.col("text"), " ")
    scored = spread(documents).select(
        "doc_id",
        "lang",
        "source",
        "text",
        F.size(toks).alias("n_tokens"),
        (F.size(F.array_distinct(toks)) / F.size(toks)).alias("_ttr"),
    )
    passed = scored.filter(
        (F.col("n_tokens") >= min_tokens) & (F.col("_ttr") >= min_ttr)
    )
    canon = passed.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    return (
        passed.join(canon.select("doc_id"), "doc_id", "left_semi")
        .select("doc_id", "lang", "source", "n_tokens")
        .orderBy("doc_id")
    )


def clean_corpus_oracle(
    min_tokens: int = MIN_TOKENS, min_ttr: float = MIN_TTR
) -> str:
    return f"""
WITH scored AS (
  SELECT doc_id, lang, source, text,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_distinct(string_split(text, ' '))) * 1.0
           / len(string_split(text, ' ')) AS ttr
  FROM documents
), passed AS (
  SELECT * FROM scored WHERE n_tokens >= {min_tokens} AND ttr >= {min_ttr}
), canon AS (
  SELECT MIN(doc_id) AS doc_id FROM passed GROUP BY md5(text)
)
SELECT p.doc_id, p.lang, p.source, p.n_tokens
FROM passed p JOIN canon USING (doc_id)
ORDER BY p.doc_id
"""
