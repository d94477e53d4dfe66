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

from rigatoni_spark.tables import spread, tokenize_once

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


def denylist_scrub(
    documents: DataFrame, terms: tuple[str, ...] = ("customer", "key")
) -> DataFrame:
    """Redact denylisted terms from every document and report per-doc
    redaction counts plus the scrubbed-content hash.

    The denylist stand-in for the PII/blocklist scrub every production
    corpus runs (emails, phones, blocked domains). Token-level rather
    than regex so the semantics are exact and engine-independent; for
    real PII the token predicate becomes a regex class, same plan. A
    pure projection fused into the scan — no shuffle, no UDF; at
    100 TB this is a zero-extra-cost pass piggybacked on any other
    full read. The scrubbed text itself is emitted as md5 (compact,
    still verifies the transformation byte-for-byte).
    """
    toks = F.split(F.col("text"), " ")
    deny = F.array([F.lit(t) for t in terms])
    scrubbed = F.array_join(
        F.transform(
            toks,
            lambda t: F.when(F.array_contains(deny, t), F.lit("[REDACTED]"))
            .otherwise(t),
        ),
        " ",
    )
    n_red = F.size(F.filter(toks, lambda t: F.array_contains(deny, t)))
    return (
        documents.select(
            "doc_id",
            n_red.cast("bigint").alias("n_redacted"),
            F.md5(scrubbed).alias("scrubbed_hash"),
        )
        .filter(F.col("n_redacted") > 0)
        .orderBy("doc_id")
    )


def denylist_scrub_oracle(terms: tuple[str, ...] = ("customer", "key")) -> str:
    tlist = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH s AS (
  SELECT doc_id,
    CAST(len(list_filter(string_split(text, ' '),
         t -> list_contains([{tlist}], t))) AS BIGINT) AS n_redacted,
    md5(array_to_string(list_transform(string_split(text, ' '),
         t -> CASE WHEN list_contains([{tlist}], t)
              THEN '[REDACTED]' ELSE t END), ' ')) AS scrubbed_hash
  FROM documents
)
SELECT doc_id, n_redacted, scrubbed_hash FROM s
WHERE n_redacted > 0 ORDER BY doc_id
"""


def corpus_pipeline_report(
    documents: DataFrame,
    min_tokens: int = MIN_TOKENS,
    min_ttr: float = MIN_TTR,
    n: int = 4,
    benchmark_mod: int = 97,
    val_fraction: float = 0.1,
    test_fraction: float = 0.1,
    salt: str = "split0",
) -> DataFrame:
    """End-to-end corpus preparation, composed and verified as ONE
    query: quality gate -> exact-dedup canonicalization -> benchmark
    decontamination -> deterministic train/val/test split -> per-
    (split, lang) composition report. The pipeline a user actually
    runs between raw crawl and training shards, demonstrating that the
    stage operators compose without materialization barriers.

    Plan shape at 100 TB: the gate and split are scan-stage
    projections; canonicalization is one md5-keyed hash agg + semi
    join; decontamination broadcasts the (small, fixed) benchmark gram
    set and anti-joins the hit ids; the final report is one map-side-
    combined agg over 3 x |langs| groups. The corpus is shuffled only
    by the dedup hash agg — every other stage rides the scan or a
    broadcast.
    """
    from rigatoni_spark.llm.contamination import contamination_hits
    from rigatoni_spark.llm.sampling import _digest, _threshold_hex

    toks = F.split(F.col("text"), " ")
    scored = spread(documents).select(
        "doc_id",
        "lang",
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
    cleaned = passed.join(canon.select("doc_id"), "doc_id", "left_semi")

    hits = contamination_hits(documents, n, benchmark_mod).select("doc_id")
    decon = cleaned.filter(
        F.col("doc_id") % benchmark_mod != 0
    ).join(hits, "doc_id", "left_anti")

    d = _digest("doc_id", salt)
    split = (
        F.when(d < _threshold_hex(val_fraction), "val")
        .when(d < _threshold_hex(val_fraction + test_fraction), "test")
        .otherwise("train")
    )
    return (
        decon.select(split.alias("split"), "lang", "n_tokens")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
        .orderBy("split", "lang")
    )


def corpus_pipeline_oracle(
    min_tokens: int = MIN_TOKENS,
    min_ttr: float = MIN_TTR,
    n: int = 4,
    benchmark_mod: int = 97,
    val_fraction: float = 0.1,
    test_fraction: float = 0.1,
    salt: str = "split0",
) -> str:
    from rigatoni_spark.llm.sampling import _threshold_hex

    t_val = _threshold_hex(val_fraction)
    t_test = _threshold_hex(val_fraction + test_fraction)
    return f"""
WITH scored AS (
  SELECT doc_id, lang, text,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_distinct(string_split(text, ' '))) * 1.0
           / len(string_split(text, ' ')) AS ttr
  FROM documents
), passed AS (
  SELECT * FROM scored WHERE n_tokens >= {min_tokens} AND ttr >= {min_ttr}
), canon AS (
  SELECT MIN(doc_id) AS doc_id FROM passed GROUP BY md5(text)
), cleaned AS (
  SELECT p.* FROM passed p JOIN canon USING (doc_id)
), toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), grams AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    generate_series(1, greatest(len(w) - {n} + 1, 0)),
    i -> array_to_string(w[i:i+{n - 1}], ' ')))) AS gram
  FROM toks
), bench AS (
  SELECT DISTINCT gram FROM grams WHERE doc_id % {benchmark_mod} = 0
), hits AS (
  SELECT DISTINCT g.doc_id FROM grams g JOIN bench USING (gram)
  WHERE g.doc_id % {benchmark_mod} != 0
), decon AS (
  SELECT c.* FROM cleaned c
  WHERE c.doc_id % {benchmark_mod} != 0
    AND c.doc_id NOT IN (SELECT doc_id FROM hits)
), labeled AS (
  SELECT CASE
      WHEN md5('{salt}:' || CAST(doc_id AS VARCHAR)) < '{t_val}' THEN 'val'
      WHEN md5('{salt}:' || CAST(doc_id AS VARCHAR)) < '{t_test}' THEN 'test'
      ELSE 'train' END AS split,
    lang, n_tokens
  FROM decon
)
SELECT split, lang, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM labeled GROUP BY split, lang ORDER BY split, lang
"""


# Span-level PII patterns, written in the common subset of Java regex
# (Spark) and RE2 (DuckDB): character classes, bounded repetition, \\d,
# \\b — no backreferences or lookaround, which RE2 rejects. Order
# matters for the scrub: emails first (their local part would otherwise
# be half-eaten by the phone pattern's digit runs), then IPv4 before
# the looser phone pattern.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d \-]{7,}\d", "<PHONE>"),
)


PARA_TOKENS = 12


def paragraph_dedup(
    documents: DataFrame, seg_tokens: int = PARA_TOKENS
) -> DataFrame:
    """Corpus-wide paragraph-level dedup, first occurrence wins — the
    RefinedWeb/Dolma pass that strips boilerplate paragraphs repeated
    across pages while keeping each document's unique remainder.

    The synthetic corpus has no newlines, so 'paragraph' here is a
    fixed ``seg_tokens``-token segmentation (real corpora split on
    newline boundaries; only the splitter differs). A segment's
    canonical owner is the globally smallest (doc_id, position) — a
    total order, so survivorship is deterministic. Output per document:
    segment counts and the md5 of the kept text (chr(1)-joined
    segments, order preserved).

    Scale shape: segment explode is scan-stage; ONE shuffle partitions
    by segment text for the first-occurrence row_number (boilerplate
    mega-groups stream through row_number — no per-group
    materialization), one more for the per-doc regroup. No joins."""
    from pyspark.sql import Window

    # token array materialized before the segment lambda (round-13,
    # guide §4/§2.3): split() inside the transform would re-tokenize
    # the doc once per segment — O(words x segments) per doc
    segs = F.expr(
        f"transform(sequence(0, CAST(ceil(size(__toks) "
        f"/ {seg_tokens}.0) AS INT) - 1), "
        f"i -> concat_ws(' ', slice(__toks, "
        f"i * {seg_tokens} + 1, {seg_tokens})))"
    )
    exploded = (
        tokenize_once(spread(documents), "doc_id")
        .select("doc_id", F.posexplode(segs).alias("pos", "seg"))
        .filter(F.col("seg") != "")
    )
    w = Window.partitionBy("seg").orderBy("doc_id", "pos")
    flagged = exploded.withColumn(
        "is_first", F.row_number().over(w) == 1
    )
    kept_segs = F.array_sort(
        F.collect_list(
            F.when(F.col("is_first"), F.struct("pos", "seg"))
        )
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum(F.col("is_first").cast("bigint")).alias("n_kept"),
            F.md5(
                F.concat_ws(
                    "\x01",
                    F.transform(kept_segs, lambda x: x["seg"]),
                )
            ).alias("clean_md5"),
        )
        .select(
            "doc_id",
            "n_segments",
            "n_kept",
            (F.col("n_segments") - F.col("n_kept")).alias("n_dropped"),
            "clean_md5",
        )
        .orderBy("doc_id")
    )


def paragraph_dedup_oracle(seg_tokens: int = PARA_TOKENS) -> str:
    return f"""
WITH segs AS (
  SELECT doc_id, g.i AS pos,
         array_to_string(
           words[g.i * {seg_tokens} + 1 : (g.i + 1) * {seg_tokens}],
           ' ') AS seg
  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
       LATERAL unnest(generate_series(
         0, CAST(CEIL(len(words) / {seg_tokens}.0) AS INT) - 1)) AS g(i)
),
flagged AS (
  SELECT doc_id, pos, seg,
         ROW_NUMBER() OVER (PARTITION BY seg ORDER BY doc_id, pos) = 1
           AS is_first
  FROM segs WHERE seg <> ''
)
SELECT doc_id,
       COUNT(*) AS n_segments,
       CAST(SUM(CASE WHEN is_first THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       CAST(COUNT(*) - SUM(CASE WHEN is_first THEN 1 ELSE 0 END)
            AS BIGINT) AS n_dropped,
       md5(COALESCE(string_agg(CASE WHEN is_first THEN seg END,
                               chr(1) ORDER BY pos), '')) AS clean_md5
FROM flagged GROUP BY doc_id ORDER BY doc_id
"""


def pii_scan(documents: DataFrame) -> DataFrame:
    """Span-level PII scan + scrub: per-document match counts for each
    pattern class and the md5 of the fully scrubbed text — the
    regex-class upgrade of :func:`denylist_scrub` (emails, IPv4
    addresses, phone-like digit runs), the redaction pass every
    public-crawl training pipeline runs before anything else.

    A pure scan-fused projection: ``regexp_count`` + chained
    ``regexp_replace`` column expressions, JVM-side, no UDF, no
    shuffle — at 100 TB this rides any existing full read for free.
    The patterns live in :data:`PII_PATTERNS`, constrained to the
    Java-regex/RE2 common subset so the DuckDB oracle evaluates the
    identical language. Every document reports (zero counts included:
    the absence of PII is the audit result a compliance pass records).

    Each class is counted against the text ALREADY SCRUBBED by the
    preceding patterns — exactly what the replace chain redacts as that
    class — so the counts and ``scrubbed_hash`` agree about which spans
    were PII (a long numeric email local-part is n_email, never
    double-reported as n_phone).
    """
    counts = []
    stage = F.col("text")
    for name, pat, repl in PII_PATTERNS:
        counts.append(
            F.regexp_count(stage, F.lit(pat)).cast("bigint").alias(f"n_{name}")
        )
        stage = F.regexp_replace(stage, pat, repl)
    return documents.select(
        "doc_id", *counts, F.md5(stage).alias("scrubbed_hash")
    ).orderBy("doc_id")


def pii_scan_oracle() -> str:
    count_cols = []
    scrub = "text"
    for name, pat, repl in PII_PATTERNS:
        count_cols.append(
            f"CAST(len(regexp_extract_all({scrub}, '{pat}')) AS BIGINT)"
            f" AS n_{name}"
        )
        scrub = f"regexp_replace({scrub}, '{pat}', '{repl}', 'g')"
    count_cols = ",\n  ".join(count_cols)
    return f"""
SELECT doc_id,
  {count_cols},
  md5({scrub}) AS scrubbed_hash
FROM documents ORDER BY doc_id
"""


def chunk_with_overlap(
    documents: DataFrame, window: int = 50, stride: int = 40
) -> DataFrame:
    """RAG/pretraining chunk prep: sliding ``window``-token chunks
    every ``stride`` tokens (overlap = window - stride), whitespace
    tokens like every chunk operator here. Window starts at 0, stride,
    2*stride, ...; the last window begins before ``n - window`` is
    passed, so every token is covered and short documents yield one
    chunk.

    Scale: per-row transform + posexplode — no shuffle at all until
    the caller aggregates; output rows ~ n_tokens/stride per doc.
    All index arithmetic is integral (ceil division via
    (x + s - 1) div s), so chunk boundaries hash-match the SQL
    oracle."""
    # token array materialized before the window lambda (round-13,
    # guide §4/§2.3): an in-lambda split() would re-tokenize the doc
    # once per window — O(words x windows) per doc
    toks = F.col("__toks")
    n = F.size(toks)
    n_wins = F.when(n <= window, F.lit(1).cast("bigint")).otherwise(
        F.expr(
            f"CAST((size(__toks) - {window} + {stride - 1})"
            f" div {stride} AS BIGINT) + 1"
        )
    )
    chunks = F.transform(
        F.sequence(F.lit(0).cast("bigint"), n_wins - 1),
        lambda i: F.struct(
            F.concat_ws(
                " ", F.slice(toks, (i * stride + 1).cast("int"), window)
            ).alias("chunk_text"),
            F.least(F.lit(window).cast("bigint"), n - i * stride).alias(
                "n_tokens"
            ),
        ),
    )
    return (
        tokenize_once(spread(documents), "doc_id")
        .select("doc_id", F.posexplode(chunks).alias("chunk_idx", "c"))
        .select(
            "doc_id",
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            F.col("c.chunk_text").alias("chunk_text"),
            F.col("c.n_tokens").alias("n_tokens"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


def chunk_overlap_oracle(window: int = 50, stride: int = 40) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
counted AS (SELECT doc_id, t, len(t) AS n FROM toks),
wins AS (
  SELECT doc_id, t, n,
         CASE WHEN n <= {window} THEN 1
              ELSE (n - {window} + {stride - 1}) // {stride} + 1
         END AS nw
  FROM counted),
idx AS (
  SELECT doc_id, t, n,
         UNNEST(generate_series(0, nw - 1)) AS chunk_idx
  FROM wins)
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       array_to_string(
         t[chunk_idx * {stride} + 1 : chunk_idx * {stride} + {window}],
         ' ') AS chunk_text,
       CAST(LEAST({window}, n - chunk_idx * {stride}) AS BIGINT)
         AS n_tokens
FROM idx ORDER BY doc_id, chunk_idx
"""
