"""Data-mix construction and incremental-corpus operators.

Beyond-reference training-data surface (like llm/sampling.py): the
three operators every production pretraining pipeline runs between
"raw corpus" and "training shards":

- **Temperature mixing** — resample domains/languages toward a
  counts^alpha distribution (alpha < 1 upweights low-resource strata;
  the standard multilingual/domain-balance step). Deterministic
  hash-threshold sampling, so it is reproducible across engines, runs,
  and partitionings, and oracle-checkable.
- **Incremental dedup** — dedup a NEW batch of documents against the
  already-ingested corpus (the CDC-meets-dedup case: daily crawl drops
  arrive forever; re-deduping the whole corpus each time is a non-
  starter at 100 TB).
- **Per-stratum quantile gate** — keep documents above the per-language
  median length: the scalable two-pass shape (tiny exact-percentile
  aggregate, broadcast back, narrow filter) instead of a global
  per-stratum window sort.

All pure ``pyspark.sql.functions`` column expressions; oracle SQL twins
adjacent.

Scale notes (100 TB):
- temperature_mix aggregates to |strata| rows (tiny), broadcasts the
  per-stratum rate back, and filters in the scan stage — one hash agg
  plus a broadcast join; the corpus is never shuffled.
- incremental_new_docs shuffles both sides on content_hash (equi
  anti-join). On a cluster the corpus hash index would be a bucketed
  table on content_hash (operators/bucketing.py) so only the — much
  smaller — increment side shuffles per batch.
- quantile_length_gate's percentile aggregate shuffles (lang, n_chars)
  pairs with map-side combine into ~|langs| groups; the dominant-
  language skew lives in a single exact-percentile buffer, which is
  why production swaps ``percentile`` for ``percentile_approx`` above
  ~1e9 rows per stratum (same plan shape, bounded state).

Float determinism: every double in temperature_mix derives from exact
integers via IEEE-exact ops (sqrt, *, /) in a fixed expression order,
and the one order-sensitive reduction (sum of sqrt weights) is summed
as DECIMAL(28,10) — associative, partition-order independent — then
cast back. Rates are bit-identical in Spark and DuckDB, so the derived
hex thresholds match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_MIX_SCALE = 4294967296.0  # 16**8: first-8-hex-digit threshold space


def _digest(key_col: str, salt: str):
    return F.md5(F.concat(F.lit(f"{salt}:"), F.col(key_col).cast("string")))


def temperature_mix(
    documents: DataFrame,
    target_fraction: float = 0.5,
    strata_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "mix0",
) -> DataFrame:
    """Resample strata toward sqrt(counts) (temperature alpha=0.5) and
    report the resulting mix: per stratum, total rows, kept rows, and
    the applied keep-rate (scaled int).

    The target sample size is ``target_fraction * N``; stratum s gets a
    share proportional to sqrt(n_s), capped at keeping every row. The
    keep/drop decision per row is ``md5(salt:key) < hex(rate)`` — the
    same engine-independent scheme as llm/sampling.py.

    alpha is fixed at 0.5 (sqrt) rather than a parameter: sqrt is
    IEEE-exact, so the computed rate — and therefore the sampled set —
    is bit-identical across engines; a general ``pow(n, alpha)`` may
    differ in the last ulp between libm implementations.
    """
    counts = documents.groupBy(strata_col).agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.agg(
        F.sum("n").cast("double").alias("big_n"),
        # order-independent: each sqrt cast to decimal, summed exactly
        F.sum(F.sqrt(F.col("n").cast("double")).cast("decimal(28,10)"))
        .cast("double")
        .alias("s_w"),
    )
    rate = F.least(
        F.lit(1.0),
        F.lit(target_fraction)
        * F.col("big_n")
        * F.sqrt(F.col("n").cast("double"))
        / F.col("s_w")
        / F.col("n").cast("double"),
    )
    rates = counts.crossJoin(F.broadcast(totals)).select(
        strata_col, "n", rate.alias("rate")
    )
    thr = F.rpad(
        F.when(F.col("rate") >= 1.0, F.lit("g")).otherwise(
            F.lower(
                F.lpad(
                    F.hex(F.floor(F.col("rate") * F.lit(_MIX_SCALE))),
                    8,
                    "0",
                )
            )
        ),
        32,
        "0",
    )
    kept = (
        documents.join(F.broadcast(rates.withColumn("thr", thr)), strata_col)
        .filter(_digest(key_col, salt) < F.col("thr"))
        .groupBy(strata_col)
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        rates.join(F.broadcast(kept), strata_col, "left")
        .select(
            strata_col,
            F.col("n").cast("bigint").alias("n_total"),
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
            F.floor(F.col("rate") * 10000).cast("bigint").alias("rate_x10k"),
        )
        .orderBy(strata_col)
    )


def temperature_mix_oracle(
    target_fraction: float = 0.5,
    strata_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "mix0",
) -> str:
    return f"""
WITH c AS (SELECT {strata_col}, COUNT(*) AS n FROM documents GROUP BY {strata_col}),
t AS (SELECT CAST(SUM(n) AS DOUBLE) AS big_n,
             CAST(SUM(CAST(sqrt(CAST(n AS DOUBLE)) AS DECIMAL(28,10)))
                  AS DOUBLE) AS s_w
      FROM c),
r AS (SELECT {strata_col}, n,
             LEAST(1.0, {target_fraction!r} * big_n * sqrt(CAST(n AS DOUBLE))
                   / s_w / CAST(n AS DOUBLE)) AS rate
      FROM c, t),
thr AS (SELECT {strata_col}, n, rate,
        RPAD(CASE WHEN rate >= 1.0 THEN 'g'
             ELSE lower(lpad(to_hex(CAST(floor(rate * {_MIX_SCALE!r})
                                         AS BIGINT)), 8, '0')) END,
             32, '0') AS th
        FROM r),
kept AS (SELECT d.{strata_col}, COUNT(*) AS n_kept
         FROM documents d JOIN thr ON d.{strata_col} = thr.{strata_col}
         WHERE md5('{salt}:' || CAST({key_col} AS VARCHAR)) < th
         GROUP BY d.{strata_col})
SELECT thr.{strata_col},
       CAST(n AS BIGINT) AS n_total,
       CAST(COALESCE(n_kept, 0) AS BIGINT) AS n_kept,
       CAST(FLOOR(rate * 10000) AS BIGINT) AS rate_x10k
FROM thr LEFT JOIN kept ON thr.{strata_col} = kept.{strata_col}
ORDER BY thr.{strata_col}
"""


def incremental_new_docs(
    corpus: DataFrame, increment: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Documents in ``increment`` whose content is NOT already in
    ``corpus``, deduped within the increment (first doc_id per content
    hash wins). The incremental half of exact dedup: a new crawl batch
    is admitted by one equi anti-join against the corpus hash index
    instead of re-deduping everything ingested so far."""
    corpus_hashes = corpus.select(
        F.md5(F.col(text_col)).alias("content_hash")
    ).distinct()
    firsts = (
        increment.select(
            F.md5(F.col(text_col)).alias("content_hash"), "doc_id"
        )
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("first_doc_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_copies"),
        )
    )
    return firsts.join(corpus_hashes, "content_hash", "left_anti").orderBy(
        "first_doc_id"
    )


INCREMENTAL_ORACLE = """
WITH corpus AS (SELECT * FROM documents WHERE doc_id % 3 <> 0),
inc AS (SELECT * FROM documents WHERE doc_id % 3 = 0),
firsts AS (SELECT md5(text) AS content_hash,
                  MIN(doc_id) AS first_doc_id,
                  CAST(COUNT(*) AS BIGINT) AS n_copies
           FROM inc GROUP BY 1)
SELECT content_hash, first_doc_id, n_copies FROM firsts
WHERE content_hash NOT IN (SELECT md5(text) FROM corpus)
ORDER BY first_doc_id
"""


def quantile_length_gate(
    documents: DataFrame, q: float = 0.5, strata_col: str = "lang"
) -> DataFrame:
    """Per-stratum exact-quantile length gate: compute the per-language
    q-quantile of n_chars (tiny aggregate), broadcast it back, keep
    docs at or above it; report per-stratum totals, kept counts and the
    threshold. The two-pass agg+broadcast shape — NOT a per-stratum
    window sort — so the corpus is scanned twice but never globally
    sorted."""
    med = documents.groupBy(strata_col).agg(
        F.count(F.lit(1)).alias("n_total"),
        F.expr(f"percentile(n_chars, {q!r})").alias("med"),
    )
    kept = (
        documents.join(F.broadcast(med.select(strata_col, "med")), strata_col)
        .filter(F.col("n_chars") >= F.col("med"))
        .groupBy(strata_col)
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        med.join(F.broadcast(kept), strata_col, "left")
        .select(
            strata_col,
            F.col("n_total").cast("bigint").alias("n_total"),
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
            F.col("med").cast("double").alias("threshold_chars"),
        )
        .orderBy(strata_col)
    )


def quantile_gate_oracle(q: float = 0.5, strata_col: str = "lang") -> str:
    return f"""
WITH m AS (SELECT {strata_col}, COUNT(*) AS n_total,
                  quantile_cont(n_chars, {q!r}) AS med
           FROM documents GROUP BY {strata_col}),
k AS (SELECT d.{strata_col}, COUNT(*) AS n_kept
      FROM documents d JOIN m ON d.{strata_col} = m.{strata_col}
      WHERE d.n_chars >= m.med GROUP BY d.{strata_col})
SELECT m.{strata_col},
       CAST(n_total AS BIGINT) AS n_total,
       CAST(COALESCE(n_kept, 0) AS BIGINT) AS n_kept,
       CAST(med AS DOUBLE) AS threshold_chars
FROM m LEFT JOIN k ON m.{strata_col} = k.{strata_col}
ORDER BY m.{strata_col}
"""


def token_budget_mix(
    documents: DataFrame,
    budget_fraction: float = 0.3,
    strata_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "budget0",
) -> DataFrame:
    """Per-stratum TOKEN-budget sampling: each stratum keeps a
    deterministic hash-ordered prefix of its documents whose cumulative
    token count stays within ``floor(budget_fraction * stratum_tokens)``
    — how a training mix is actually assembled when mixture weights are
    specified in tokens, not documents (the doc-count knob
    temperature_mix turns cannot hit a token target when doc lengths
    vary by stratum).

    Keep rule: order docs by ``h = md5(salt:key)``; doc is kept iff the
    running token sum up to AND including it is <= the stratum budget.
    Returns per stratum ``n_docs, n_kept, tokens_total, tokens_kept``
    (exact bigint sums), ordered by stratum.

    Plan (100 TB) — the naive implementation is one window per stratum,
    which serializes a dominant stratum onto a single task. Instead the
    prefix sum is BUCKETED: ``bucket = substring(h, 1, 1)`` (16-way;
    because the bucket is a *prefix* of h, global h-order equals
    (bucket, h)-order), then

    1. one hash agg to per-(stratum, bucket) token sums — a
       |strata| x 16 row table;
    2. exclusive bucket offsets + the stratum budget via a window over
       that tiny table (driver-scale, broadcast back);
    3. the corpus-side running sum is windowed within (stratum, bucket)
       — 16 independent tasks per stratum instead of 1 — plus the
       bucket's offset.

    Widening the bucket key to 2+ hex chars (256/4096-way) re-shards a
    still-dominant stratum without changing any kept/dropped decision.
    All sums are integer/bigint: no float accumulation order effects.
    """
    h = _digest(key_col, salt)
    base = documents.select(
        F.col(strata_col).alias("stratum"),
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("tok"),
        h.alias("h"),
        F.substring(h, 1, 1).alias("bucket"),
    )
    per_bucket = base.groupBy("stratum", "bucket").agg(
        F.sum("tok").alias("bsum"), F.count(F.lit(1)).alias("bn")
    )
    w_off = (
        Window.partitionBy("stratum")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_tot = Window.partitionBy("stratum")
    offsets = per_bucket.select(
        "stratum",
        "bucket",
        F.coalesce(F.sum("bsum").over(w_off), F.lit(0)).alias("off"),
        F.floor(
            F.lit(budget_fraction)
            * F.sum("bsum").over(w_tot).cast("double")
        )
        .cast("bigint")
        .alias("budget"),
    )
    w_cum = (
        Window.partitionBy("stratum", "bucket")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    kept = (
        base.join(F.broadcast(offsets), ["stratum", "bucket"])
        .select(
            "stratum",
            "tok",
            ((F.sum("tok").over(w_cum) + F.col("off")) <= F.col("budget"))
            .alias("keep"),
        )
        .groupBy("stratum")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_kept"),
            F.sum("tok").alias("tokens_total"),
            F.sum(F.when(F.col("keep"), F.col("tok")).otherwise(0)).alias(
                "tokens_kept"
            ),
        )
    )
    return kept.select(
        F.col("stratum").alias(strata_col),
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("n_kept").cast("bigint").alias("n_kept"),
        F.col("tokens_total").cast("bigint").alias("tokens_total"),
        F.col("tokens_kept").cast("bigint").alias("tokens_kept"),
    ).orderBy(strata_col)


def token_budget_mix_oracle(
    budget_fraction: float = 0.3,
    strata_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "budget0",
) -> str:
    return f"""
WITH base AS (
  SELECT {strata_col} AS stratum,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS tok,
         md5('{salt}:' || CAST({key_col} AS VARCHAR)) AS h,
         substring(md5('{salt}:' || CAST({key_col} AS VARCHAR)), 1, 1)
           AS bucket
  FROM documents
),
per_bucket AS (
  SELECT stratum, bucket, SUM(tok) AS bsum FROM base GROUP BY ALL
),
offsets AS (
  SELECT stratum, bucket,
         COALESCE(SUM(bsum) OVER (PARTITION BY stratum ORDER BY bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off,
         CAST(FLOOR(CAST({budget_fraction!r} AS DOUBLE)
              * CAST(SUM(bsum) OVER (PARTITION BY stratum) AS DOUBLE))
              AS BIGINT) AS budget
  FROM per_bucket
),
flags AS (
  SELECT b.stratum, b.tok,
         (SUM(b.tok) OVER (PARTITION BY b.stratum, b.bucket ORDER BY b.h
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          + o.off) <= o.budget AS keep
  FROM base b JOIN offsets o
    ON b.stratum = o.stratum AND b.bucket = o.bucket
)
SELECT stratum AS {strata_col},
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(tok) AS BIGINT) AS tokens_total,
       CAST(SUM(CASE WHEN keep THEN tok ELSE 0 END) AS BIGINT)
         AS tokens_kept
FROM flags GROUP BY stratum ORDER BY stratum
"""
