"""Benchmark decontamination + repetition signals for training corpora.

Decontamination: flag training documents that share any word n-gram
with a held-out benchmark/eval set — the standard pre-training hygiene
step (the reference engine has no analogue; this is part of the
beyond-reference training-data surface, like llm/dedup.py).

Repetition: Gopher-style per-document repetition signals (duplicate
token fraction, top-bigram mass) used as cheap quality gates.

All pure ``pyspark.sql.functions`` column expressions plus one
hash-aggregated shuffle each — no Python in the hot path. Oracle SQL
twins are kept adjacent.

Scale notes (100 TB): the benchmark gram set is tiny relative to the
corpus (eval sets are a fixed, small artifact), so the contamination
join broadcasts it; the training side streams through the scan with
per-doc distinct grams exploded — shuffle-free on the training side.
Repetition stats shuffle (doc_id, gram) with map-side combine; keys are
unique per doc so there is no skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rigatoni_spark.tables import spread


def _word_ngrams(toks, n: int):
    """Sliding word n-grams of a token array; explicit empty array for
    short docs (Spark's sequence(1, 0) counts DOWN, unlike DuckDB's
    empty generate_series)."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - n + 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _doc_grams(documents: DataFrame, n: int) -> DataFrame:
    toks = F.split(F.col("text"), " ")
    return spread(documents).select(
        "doc_id",
        F.explode(F.array_distinct(_word_ngrams(toks, n))).alias("gram"),
    )


def contamination_hits(
    documents: DataFrame, n: int = 4, benchmark_mod: int = 97
) -> DataFrame:
    """Per-training-document count of distinct word n-grams that also
    occur in the benchmark split (docs with doc_id % benchmark_mod == 0
    stand in for the eval set — deterministic, engine-independent).

    Default n=4: production decontamination uses 8-13-grams over
    natural language, but the testdata's 32-token vocabulary makes a
    4-gram (~20 bits of entropy) the statistical analogue — 8-grams
    never collide on this corpus and the operator degenerates to an
    empty result at every SF.

    Plan: benchmark grams are distinct'd and BROADCAST (eval sets are a
    small fixed artifact even when the corpus is 100 TB); the training
    side is scan -> explode -> broadcast-hash-join -> one hash agg on
    doc_id. No shuffle carries the corpus n-grams.
    """
    grams = _doc_grams(documents, n)
    bench = (
        grams.filter(F.col("doc_id") % benchmark_mod == 0)
        .select("gram")
        .distinct()
    )
    train = grams.filter(F.col("doc_id") % benchmark_mod != 0)
    return (
        train.join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated_grams"))
        .orderBy("doc_id")
    )


def contamination_oracle(n: int = 4, benchmark_mod: int = 97) -> str:
    return f"""
WITH toks AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
grams AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    generate_series(1, greatest(len(w) - {n} + 1, 0)),
    i -> array_to_string(w[i:i+{n - 1}], ' ')))) AS gram
  FROM toks
),
bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % {benchmark_mod} = 0),
train AS (SELECT doc_id, gram FROM grams WHERE doc_id % {benchmark_mod} != 0)
SELECT doc_id, COUNT(*) AS n_contaminated_grams
FROM train JOIN bench USING (gram)
GROUP BY doc_id ORDER BY doc_id
"""


def decontaminated_corpus(
    documents: DataFrame, n: int = 4, benchmark_mod: int = 97
) -> DataFrame:
    """The actionable output: training documents with ZERO benchmark
    n-gram overlap (left-anti join against the hit set) — what a
    pipeline would actually feed to training. Benchmark docs themselves
    are excluded too."""
    hits = contamination_hits(documents, n, benchmark_mod).select("doc_id")
    return (
        documents.filter(F.col("doc_id") % benchmark_mod != 0)
        .join(hits, "doc_id", "left_anti")
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )


def decontaminated_oracle(n: int = 4, benchmark_mod: int = 97) -> str:
    return f"""
WITH toks AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
grams AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    generate_series(1, greatest(len(w) - {n} + 1, 0)),
    i -> array_to_string(w[i:i+{n - 1}], ' ')))) AS gram
  FROM toks
),
bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % {benchmark_mod} = 0),
hits AS (
  SELECT DISTINCT doc_id FROM grams
  WHERE doc_id % {benchmark_mod} != 0
    AND gram IN (SELECT gram FROM bench)
)
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE doc_id % {benchmark_mod} != 0
  AND doc_id NOT IN (SELECT doc_id FROM hits)
ORDER BY doc_id
"""


def repetition_stats(documents: DataFrame) -> DataFrame:
    """Gopher-style repetition signals per document:

    - ``dup_token_frac_x10k``: fraction of token occurrences that are
      repeats of an earlier token, scaled to basis-points-x100 integers
      (hash-stable across engines; rounded doubles are 1-ulp fragile).
    - ``top_bigram_frac_x10k``: mass of the single most frequent bigram
      over all bigram occurrences — high values mean degenerate
      boilerplate/repetition.

    Plan: one explode -> hash agg on (doc_id, bigram) with map-side
    combine -> second hash agg on doc_id; joined back to the per-doc
    token stats computed in the scan projection. Keys are per-document,
    so no skew at any corpus size.
    """
    toks = F.split(F.col("text"), " ")
    base = spread(documents).select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.explode(_word_ngrams(toks, 2)).alias("bigram"),
    )
    per_bigram = base.groupBy("doc_id", "n_tokens", "n_distinct", "bigram").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        per_bigram.groupBy("doc_id", "n_tokens", "n_distinct")
        .agg(F.max("c").alias("top_c"), F.sum("c").cast("bigint").alias("n_bigrams"))
        .select(
            "doc_id",
            "n_tokens",
            F.round((F.col("n_tokens") - F.col("n_distinct")) * 10000 / F.col("n_tokens"))
            .cast("bigint")
            .alias("dup_token_frac_x10k"),
            F.round(F.col("top_c") * 10000 / F.col("n_bigrams"))
            .cast("bigint")
            .alias("top_bigram_frac_x10k"),
        )
        .orderBy("doc_id")
    )


REPETITION_ORACLE = """
WITH toks AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
grams AS (
  SELECT doc_id, len(w) AS n_tokens, len(list_distinct(w)) AS n_distinct,
    unnest(list_transform(
      generate_series(1, greatest(len(w) - 1, 0)),
      i -> array_to_string(w[i:i+1], ' '))) AS bigram
  FROM toks
),
per_bigram AS (
  SELECT doc_id, n_tokens, n_distinct, bigram, COUNT(*) AS c
  FROM grams GROUP BY ALL
)
SELECT doc_id, n_tokens,
  CAST(ROUND((n_tokens - n_distinct) * 10000.0 / n_tokens) AS BIGINT)
    AS dup_token_frac_x10k,
  CAST(ROUND(MAX(c) * 10000.0 / SUM(c)) AS BIGINT) AS top_bigram_frac_x10k
FROM per_bigram
GROUP BY doc_id, n_tokens, n_distinct
ORDER BY doc_id
"""
