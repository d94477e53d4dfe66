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

from rigatoni_spark.tables import spread, tokenize_once


def _word_ngrams(toks, n: int):
    """Sliding word n-grams of a token array; explicit empty array for
    short docs (Spark's sequence(1, 0) counts DOWN, unlike DuckDB's
    empty generate_series). ``toks`` must be a MATERIALIZED column
    (round-13, guide §4/§2.3): passing the raw split() expression
    embeds it in the transform lambda and re-tokenizes the document
    once per window position — O(words²) per doc."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - n + 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _doc_grams(documents: DataFrame, n: int) -> DataFrame:
    return (
        tokenize_once(spread(documents), "doc_id")
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(_word_ngrams(F.col("__toks"), n))
            ).alias("gram"),
        )
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


def fuzzy_contamination_report(
    documents: DataFrame,
    threshold: float = 0.5,
    benchmark_mod: int = 97,
) -> DataFrame:
    """NEAR-duplicate decontamination: exact n-gram decon
    (:func:`contamination_hits`) misses paraphrased / reformatted
    benchmark twins, so production hygiene also runs a fuzzy pass —
    here the MinHash admission operator with the benchmark split as the
    "corpus" and the training split as the "increment". Per training
    doc: how many benchmark docs share an LSH bucket
    (``n_benchmark_candidates``), the best verified Jaccard
    (``best_jaccard_x10k``), and ``is_clean`` (1 = keep).

    Scale: the benchmark set is a small fixed artifact, so its band
    sketch is tiny and every per-batch cost bound of
    ``incremental_near_duplicates`` applies with the cheap side as the
    index — decontaminating 100 TB costs one probe join + verification
    of the (rare) candidates."""
    from rigatoni_spark.llm import minhash

    bench = documents.filter(F.col("doc_id") % benchmark_mod == 0)
    train = documents.filter(F.col("doc_id") % benchmark_mod != 0)
    rep = minhash.incremental_near_duplicates(
        bench, train, threshold=threshold
    )
    return rep.select(
        "doc_id",
        F.col("n_candidates").alias("n_benchmark_candidates"),
        "best_jaccard_x10k",
        F.col("is_new").alias("is_clean"),
    ).orderBy("doc_id")


def fuzzy_contamination_oracle(
    threshold: float = 0.5, benchmark_mod: int = 97,
    k: int | None = None, bands: int | None = None, shingle_n: int = 3,
) -> str:
    from rigatoni_spark.llm.minhash import (
        DEFAULT_BANDS,
        DEFAULT_K,
        _bands_sql,
        _shingle_list_sql,
    )

    k = k or DEFAULT_K
    bands = bands or DEFAULT_BANDS
    t = int(round(threshold * 10000))
    return f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id % {benchmark_mod} = 0
), inc AS (
  SELECT doc_id, text FROM documents WHERE doc_id % {benchmark_mod} <> 0
),
  cb AS ({_bands_sql('corpus', k, bands, shingle_n)}),
  ib AS ({_bands_sql('inc', k, bands, shingle_n)}),
  cands AS (
    SELECT DISTINCT i.doc_id, c.doc_id AS corpus_id
    FROM ib i JOIN cb c ON i.band = c.band AND i.band_hash = c.band_hash
  ),
  ish AS ({_shingle_list_sql('inc', shingle_n)}),
  csh AS ({_shingle_list_sql('corpus', shingle_n)}),
  v AS (
    SELECT cands.doc_id,
      len(list_intersect(si.shl, sc.shl)) AS i,
      len(si.shl) + len(sc.shl) - len(list_intersect(si.shl, sc.shl)) AS u
    FROM cands
    JOIN ish si ON si.doc_id = cands.doc_id
    JOIN csh sc ON sc.doc_id = cands.corpus_id
  ),
  agg AS (
    SELECT doc_id,
      CAST(COUNT(*) AS BIGINT) AS n_candidates,
      CAST(MAX(FLOOR(i * 10000.0 / u)) AS BIGINT) AS best_jaccard_x10k,
      MAX(CASE WHEN i * 10000 >= {t} * u THEN 1 ELSE 0 END) AS any_dup
    FROM v GROUP BY doc_id
  )
SELECT inc.doc_id,
  CAST(COALESCE(n_candidates, 0) AS BIGINT) AS n_benchmark_candidates,
  best_jaccard_x10k,
  CAST(CASE WHEN COALESCE(any_dup, 0) = 0 THEN 1 ELSE 0 END AS BIGINT)
    AS is_clean
FROM inc LEFT JOIN agg ON inc.doc_id = agg.doc_id
ORDER BY inc.doc_id
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
    toks = F.col("__toks")
    # three projections, deliberately (round-13, guide §4/§2.3): the
    # token array materializes below the gram lambda (else split()
    # re-runs per window position), and the per-doc stats materialize
    # below the Generate — an expression left in the SAME select as the
    # explode lands in the Project ABOVE Generate and is re-evaluated
    # once per exploded row (size(array_distinct(w)) per bigram row =
    # O(words²) per doc; plan-verified)
    base = (
        tokenize_once(spread(documents), "doc_id")
        .select(
            "doc_id",
            "__toks",
            F.size(toks).alias("n_tokens"),
            F.size(F.array_distinct(toks)).alias("n_distinct"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_distinct",
            F.explode(_word_ngrams(toks, 2)).alias("bigram"),
        )
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


def boilerplate_stats(
    documents: DataFrame, n: int = 3, min_docs: int = 5
) -> DataFrame:
    """Cross-document boilerplate signal: per document, how many of its
    distinct word ``n``-grams are "boilerplate" — grams occurring in at
    least ``min_docs`` DISTINCT documents corpus-wide (CCNet/RefinedWeb
    -style shared-paragraph detection, collapsed to n-grams because the
    synthetic corpus has no paragraph structure; the reference engine
    has no analogue — beyond-reference surface like contamination_hits).

    Returns ``doc_id, n_grams, n_boilerplate, boiler_frac_x10k``
    (integer basis points — hash-stable across engines) for every
    document with at least one gram, ordered by doc_id.

    Defaults: n=3/min_docs=5 are tuned to the testdata's 32-token
    vocabulary exactly like contamination_hits' n=4 note — production
    corpora would use longer grams and a document-frequency cut around
    0.1-1%% of docs.

    Plan (100 TB): scan -> explode distinct grams -> one hash agg by
    gram with countDistinct(doc_id) -> filter to the hot set -> join
    back -> one hash agg by doc_id. The hot-gram side is the *filtered
    aggregate* — smaller than the corpus by the document-frequency cut
    (at min_docs = 0.1%% of docs it is bounded by 1000x fewer rows than
    total gram occurrences); AQE's post-shuffle statistics convert the
    join to broadcast whenever it fits, and the fallback is a plain
    shuffled hash join on the gram key — no all-pairs shape anywhere.
    countDistinct(doc_id) is exact but two-phase (gram, doc_id) -> gram;
    both phases combine map-side.
    """
    grams = _doc_grams(documents, n)
    hot = (
        grams.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("gram")
    )
    return (
        grams.join(hot.withColumn("_hot", F.lit(1)), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("_hot").alias("n_boilerplate"),
        )
        .select(
            "doc_id",
            F.col("n_grams").cast("bigint").alias("n_grams"),
            F.col("n_boilerplate").cast("bigint").alias("n_boilerplate"),
            F.floor(F.col("n_boilerplate") * 10000 / F.col("n_grams"))
            .cast("bigint")
            .alias("boiler_frac_x10k"),
        )
        .orderBy("doc_id")
    )


def _boilerplate_prefix(n: int, min_docs: int) -> str:
    return f"""
WITH toks AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
grams AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    generate_series(1, greatest(len(w) - {n} + 1, 0)),
    i -> array_to_string(w[i:i+{n - 1}], ' ')))) AS gram
  FROM toks
),
hot AS (SELECT gram FROM (SELECT gram, COUNT(DISTINCT doc_id) AS nd
                          FROM grams GROUP BY gram) WHERE nd >= {min_docs}),
per AS (
  SELECT g.doc_id,
         COUNT(*) AS n_grams,
         COUNT(*) FILTER (g.gram IN (SELECT gram FROM hot)) AS n_boilerplate
  FROM grams g GROUP BY g.doc_id
)"""


def boilerplate_stats_oracle(n: int = 3, min_docs: int = 5) -> str:
    return (
        _boilerplate_prefix(n, min_docs)
        + """
SELECT doc_id,
       CAST(n_grams AS BIGINT) AS n_grams,
       CAST(n_boilerplate AS BIGINT) AS n_boilerplate,
       CAST(FLOOR(n_boilerplate * 10000.0 / n_grams) AS BIGINT)
         AS boiler_frac_x10k
FROM per ORDER BY doc_id
"""
    )


def boilerplate_clean(
    documents: DataFrame,
    n: int = 3,
    min_docs: int = 5,
    max_frac: float = 0.05,
) -> DataFrame:
    """The actionable gate: documents whose boilerplate-gram fraction is
    at most ``max_frac`` (docs too short to carry any n-gram trivially
    pass). The comparison is pure integer arithmetic —
    ``n_boilerplate * 10000 <= n_grams * round(max_frac*10000)`` — so
    the kept set is bit-identical across engines.

    Same plan as boilerplate_stats plus one broadcast-friendly semi
    join of the per-doc verdict back onto the corpus.
    """
    thr = round(max_frac * 10000)
    stats = boilerplate_stats(documents, n, min_docs).filter(
        F.col("n_boilerplate") * 10000 > F.col("n_grams") * thr
    )
    return (
        documents.join(stats.select("doc_id"), "doc_id", "left_anti")
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )


def boilerplate_clean_oracle(
    n: int = 3, min_docs: int = 5, max_frac: float = 0.05
) -> str:
    thr = round(max_frac * 10000)
    return (
        _boilerplate_prefix(n, min_docs)
        + f"""
SELECT d.doc_id, d.lang, d.source, d.n_chars
FROM documents d
WHERE d.doc_id NOT IN (
  SELECT doc_id FROM per WHERE n_boilerplate * 10000 > n_grams * {thr})
ORDER BY d.doc_id
"""
    )
