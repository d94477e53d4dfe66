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

from rigatoni_spark.tables import spread, tokenize_once


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


def chunk_dedup_stats(documents: DataFrame, chunk_tokens: int = 10) -> DataFrame:
    """Sub-document (paragraph-level) dedup: CCNet/RefinedWeb-style
    repeated-passage removal, adapted to fixed ``chunk_tokens`` token
    windows (the testdata carries no newline/paragraph structure).

    Every document is cut into consecutive non-overlapping chunks; a
    chunk is a DUPLICATE if an identical chunk occurs earlier in the
    corpus (corpus order = (doc_id, chunk_idx); the earliest occurrence
    is canonical and kept). Output per document: chunk counts and the
    duplicate-chunk fraction as a scaled integer — the signal a cleaning
    pass thresholds on to drop boilerplate-heavy documents.

    Order-key trick: first occurrence = MIN(doc_id * 2^32 + chunk_idx)
    per chunk text — pure integer arithmetic, hash-stable across
    engines. The 2^32 multiplier is collision-free for any chunk count
    a single row could physically hold (4.3e9 chunks = a >8 GB text
    cell) and keeps the key inside BIGINT for doc_id < 2^31.

    Plan shape: explode to one row per chunk -> hash-agg MIN(order_key)
    keyed on md5(chunk) (narrow shuffle rows; partial agg crushes
    boilerplate chunks map-side) -> equi-join back on the hash -> per-doc
    hash-agg. Three shuffles, all carrying |tokens|/chunk_tokens rows.
    A corpus-dominant boilerplate chunk is a hot join key — AQE skew
    handling splits it; the MIN agg itself is skew-immune (map-side
    partial)."""
    # materialize the token array BEFORE the chunk lambda (round-13,
    # guide §4/§2.3): a split() referenced inside the transform would
    # re-tokenize the doc once per chunk — O(words x chunks) per doc
    toks = F.col("__toks")
    n_chunks = F.ceil(F.size(toks) / F.lit(chunk_tokens)).cast("int")
    chunk_texts = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(
            " ", F.slice(toks, i * chunk_tokens + 1, chunk_tokens)
        ),
    )
    chunks = tokenize_once(spread(documents), "doc_id").select(
        "doc_id", F.posexplode(chunk_texts).alias("chunk_idx", "chunk")
    ).select(
        "doc_id",
        "chunk_idx",
        F.md5(F.col("chunk")).alias("h"),
        (F.col("doc_id") * F.lit(1 << 32) + F.col("chunk_idx")).alias(
            "order_key"
        ),
    )
    firsts = chunks.groupBy("h").agg(F.min("order_key").alias("first_key"))
    marked = chunks.join(firsts, "h").select(
        "doc_id",
        (F.col("order_key") != F.col("first_key")).cast("int").alias("is_dup"),
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("is_dup").cast("bigint").alias("n_dup_chunks"),
        )
        .select(
            "doc_id",
            "n_chunks",
            "n_dup_chunks",
            F.floor(F.col("n_dup_chunks") * 10000 / F.col("n_chunks"))
            .cast("bigint")
            .alias("dup_chunk_frac_x10k"),
        )
        .orderBy("doc_id")
    )


def chunk_dedup_oracle(chunk_tokens: int = 10) -> str:
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
chunks AS (
  SELECT doc_id, i - 1 AS chunk_idx,
    md5(array_to_string(w[((i-1)*{chunk_tokens}+1):((i-1)*{chunk_tokens}+{chunk_tokens})], ' ')) AS h,
    doc_id * 4294967296 + (i - 1) AS order_key
  FROM toks, LATERAL unnest(generate_series(
    1, CAST(ceil(len(w) * 1.0 / {chunk_tokens}) AS BIGINT))) AS g(i)
),
firsts AS (SELECT h, MIN(order_key) AS first_key FROM chunks GROUP BY h),
marked AS (
  SELECT doc_id,
    CASE WHEN order_key != first_key THEN 1 ELSE 0 END AS is_dup
  FROM chunks JOIN firsts USING (h)
)
SELECT doc_id, COUNT(*) AS n_chunks,
  CAST(SUM(is_dup) AS BIGINT) AS n_dup_chunks,
  CAST(FLOOR(SUM(is_dup) * 10000.0 / COUNT(*)) AS BIGINT)
    AS dup_chunk_frac_x10k
FROM marked GROUP BY doc_id ORDER BY doc_id
"""


def chunk_dedup_clean(documents: DataFrame, chunk_tokens: int = 10) -> DataFrame:
    """The TRANSFORM half of ``chunk_dedup_stats``: rewrite every
    document keeping only chunks whose text has NOT occurred earlier in
    the corpus (corpus order = (doc_id, chunk_idx), identical
    first-occurrence rule), re-concatenated in original chunk order —
    Lee et al. 2022's repeated-passage REMOVAL, not just the per-doc
    fraction. A document whose every chunk is boilerplate survives with
    empty text (``n_kept_chunks = 0``) — dropping entirely is the
    caller's gate, not this operator's.

    Plan shape: the stats operator's explode -> MIN(order_key) hash agg
    -> join back, then ONE per-doc agg that reassembles the text:
    collect_list of (chunk_idx, chunk) structs, array_sort (chunk_idx
    totalizes the order — deterministic regardless of partitioning),
    transform+array_join. The reassembly agg carries each doc's kept
    text once — the same volume the write side would carry anyway."""
    # token array materialized before the lambda — same O(words x
    # chunks) re-split avoidance as chunk_dedup_stats (round-13)
    toks = F.col("__toks")
    n_chunks = F.ceil(F.size(toks) / F.lit(chunk_tokens)).cast("int")
    chunk_texts = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(
            " ", F.slice(toks, i * chunk_tokens + 1, chunk_tokens)
        ),
    )
    chunks = tokenize_once(spread(documents), "doc_id").select(
        "doc_id", F.posexplode(chunk_texts).alias("chunk_idx", "chunk")
    ).select(
        "doc_id",
        "chunk_idx",
        "chunk",
        F.md5(F.col("chunk")).alias("h"),
        (F.col("doc_id") * F.lit(1 << 32) + F.col("chunk_idx")).alias(
            "order_key"
        ),
    )
    firsts = chunks.groupBy("h").agg(F.min("order_key").alias("first_key"))
    kept = chunks.join(firsts, "h").filter(
        F.col("order_key") == F.col("first_key")
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("chunk_idx", "chunk"))
                ),
                lambda s: s["chunk"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).cast("bigint").alias("n_kept_chunks"),
    )
    return (
        documents.select("doc_id")
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_kept_chunks", F.lit(0)).cast("bigint").alias(
                "n_kept_chunks"
            ),
        )
        .orderBy("doc_id")
    )


def chunk_dedup_clean_oracle(chunk_tokens: int = 10) -> str:
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
chunks AS (
  SELECT doc_id, i - 1 AS chunk_idx,
    array_to_string(w[((i-1)*{chunk_tokens}+1):((i-1)*{chunk_tokens}+{chunk_tokens})], ' ') AS chunk,
    md5(array_to_string(w[((i-1)*{chunk_tokens}+1):((i-1)*{chunk_tokens}+{chunk_tokens})], ' ')) AS h,
    doc_id * 4294967296 + (i - 1) AS order_key
  FROM toks, LATERAL unnest(generate_series(
    1, CAST(ceil(len(w) * 1.0 / {chunk_tokens}) AS BIGINT))) AS g(i)
),
firsts AS (SELECT h, MIN(order_key) AS first_key FROM chunks GROUP BY h),
kept AS (
  SELECT doc_id, chunk_idx, chunk
  FROM chunks JOIN firsts USING (h) WHERE order_key = first_key
),
rebuilt AS (
  SELECT doc_id, string_agg(chunk, ' ' ORDER BY chunk_idx) AS clean_text,
         COUNT(*) AS n_kept_chunks
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(clean_text, '') AS clean_text,
       CAST(COALESCE(n_kept_chunks, 0) AS BIGINT) AS n_kept_chunks
FROM documents d LEFT JOIN rebuilt ON d.doc_id = rebuilt.doc_id
ORDER BY d.doc_id
"""


def containment_pairs(
    documents: DataFrame,
    threshold: float = 0.9,
    block_col: str = "source",
    max_block_rows: int = 10_000,
) -> DataFrame:
    """Subset-duplicate pairs by token-set CONTAINMENT:
    |A∩B| / min(|A|,|B|) >= threshold — catches a short document quoted
    or concatenated inside a longer one, which Jaccard structurally
    misses (containment of a small set in a big one has Jaccard
    ≈ |A|/|B|, far below any near-dup threshold).

    Output: (doc_contained, doc_container, containment_x10k), oriented
    by distinct-token-set size (ties: the lower doc_id is "contained" —
    equal-size containment == Jaccard == symmetric).

    Scale honesty: MinHash-LSH banding is NOT a valid candidate
    generator here — band collision probability tracks JACCARD, so the
    small-in-large pairs this operator exists for are exactly the ones
    LSH drops. Candidates therefore come from the metadata blocking key
    (``block_col``), O(rows²/2) within a block, and a block larger than
    ``max_block_rows`` raises instead of silently degrading: the 100 TB
    remedies are a finer block key (domain, shard, time bucket) or a
    containment-aware sketch (prefix-filtered / partitioned MinHash),
    not the Jaccard-band hatch ``ngram_jaccard_pairs`` uses."""
    sizes = documents.groupBy(block_col).agg(
        F.count(F.lit(1)).alias("_block_rows")
    )
    max_block = (
        sizes.agg(F.max("_block_rows").alias("m")).collect()[0]["m"] or 0
    )
    if max_block > max_block_rows:
        raise ValueError(
            f"containment_pairs: block key {block_col!r} has a block of "
            f"{max_block} rows (> {max_block_rows}); refine the blocking "
            "key — the Jaccard-LSH fallback is unsound for containment"
        )
    toks = F.array_distinct(F.split(F.col("text"), " "))
    t = spread(documents).select(
        "doc_id",
        F.col(block_col).alias("_b"),
        toks.alias("s"),
        F.size(toks).alias("n"),
    )
    a, b = t.alias("a"), t.alias("b")
    inter = F.size(
        F.array_intersect(F.col("a.s"), F.col("b.s"))
    ).cast("long")
    mn = F.least(F.col("a.n"), F.col("b.n")).cast("long")
    thr = int(round(threshold * 10000))
    a_contained = F.col("a.n") <= F.col("b.n")  # tie -> lower doc_id
    return (
        a.join(
            b,
            (F.col("a._b") == F.col("b._b"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.when(a_contained, F.col("a.doc_id"))
            .otherwise(F.col("b.doc_id"))
            .alias("doc_contained"),
            F.when(a_contained, F.col("b.doc_id"))
            .otherwise(F.col("a.doc_id"))
            .alias("doc_container"),
            inter.alias("i"),
            mn.alias("m"),
        )
        .filter(F.col("i") * 10000 >= F.lit(thr) * F.col("m"))
        .select(
            "doc_contained",
            "doc_container",
            F.floor(F.col("i") * 10000 / F.col("m")).alias(
                "containment_x10k"
            ),
        )
        .orderBy("doc_contained", "doc_container")
    )


def containment_oracle(
    threshold: float = 0.9, block_col: str = "source"
) -> str:
    thr = int(round(threshold * 10000))
    return f"""
WITH t AS (
  SELECT doc_id, {block_col} AS b,
         list_distinct(string_split(text, ' ')) AS s
  FROM documents
),
pairs AS (
  SELECT
    CASE WHEN len(a.s) <= len(b.s) THEN a.doc_id ELSE b.doc_id END
      AS doc_contained,
    CASE WHEN len(a.s) <= len(b.s) THEN b.doc_id ELSE a.doc_id END
      AS doc_container,
    len(list_intersect(a.s, b.s)) AS i,
    least(len(a.s), len(b.s)) AS m
  FROM t a JOIN t b ON a.b = b.b AND a.doc_id < b.doc_id
)
SELECT doc_contained, doc_container,
       CAST(FLOOR(i * 10000.0 / m) AS BIGINT) AS containment_x10k
FROM pairs WHERE i * 10000 >= {thr} * m
ORDER BY doc_contained, doc_container
"""


def top_duplicated_spans(
    documents: DataFrame, span_tokens: int = 8, k: int = 30
) -> DataFrame:
    """Cross-document repeated-passage mining: the SLIDING-window twin
    of ``chunk_dedup_stats`` (which uses fixed non-overlapping windows
    and reports per-doc fractions). Emits the top-``k`` exact
    ``span_tokens``-token passages occurring in >= 2 distinct documents
    — the "duplicated substrings" signal of train-data dedup (Lee et
    al. 2022): boilerplate headers, license blocks, templated intros.

    Ranking: document frequency DESC, total occurrences DESC, span ASC
    — the span itself totalizes the order, so the top-k cut is
    deterministic and hash-stable against the SQL oracle.

    Plan shape: explode every window position (|tokens| narrow rows) ->
    count-distinct agg keyed on the span (Spark's two-phase rewrite:
    partial (span, doc_id) dedup map-side, so a corpus-dominant
    boilerplate span never ships duplicate (span, doc) rows) ->
    TakeOrderedAndProject for the top-k (no global sort). Docs shorter
    than the window contribute their whole text as one span — same rule
    as the shingler."""
    # token array materialized before the window lambda (round-13):
    # an in-lambda split() would re-tokenize per window position
    toks = F.col("__toks")
    spans = F.transform(
        F.sequence(
            F.lit(1), F.greatest(F.size(toks) - (span_tokens - 1), F.lit(1))
        ),
        lambda i: F.concat_ws(" ", F.slice(toks, i, span_tokens)),
    )
    return (
        tokenize_once(spread(documents), "doc_id")
        .select("doc_id", F.explode(spans).alias("span"))
        .groupBy("span")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("doc_id").alias("first_doc_id"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy(
            F.col("n_docs").desc(), F.col("n_occurrences").desc(), "span"
        )
        .limit(k)
    )


def top_duplicated_spans_oracle(span_tokens: int = 8, k: int = 30) -> str:
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
spans AS (
  SELECT doc_id, array_to_string(w[i:i+{span_tokens - 1}], ' ') AS span
  FROM toks, LATERAL unnest(generate_series(
    1, greatest(len(w) - {span_tokens - 1}, 1))) AS g(i)
)
SELECT span, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occurrences,
       MIN(doc_id) AS first_doc_id
FROM spans GROUP BY span HAVING COUNT(DISTINCT doc_id) >= 2
ORDER BY n_docs DESC, n_occurrences DESC, span ASC LIMIT {k}
"""


def maximal_duplicated_spans(
    documents: DataFrame,
    span_tokens: int = 8,
    min_docs: int = 2,
    k: int = 30,
) -> DataFrame:
    """Maximal-span coalescing over :func:`top_duplicated_spans`'
    fixed windows: adjacent duplicated windows in a document chain
    into ONE maximal span, so a 100-token boilerplate block reports as
    a single 100-token span instead of ~93 overlapping 8-token
    windows — the span-level form of the suffix-array dedup result
    (Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better"). Output: the top-``k`` maximal span TEXTS occurring
    in >= ``min_docs`` documents, with token length, document
    frequency, occurrence count, and the earliest containing doc.

    Chaining is the gaps-and-islands order-key trick, pure integers:
    a window at position p whose span text is cross-document
    duplicated joins island ``p - row_number()`` within its doc —
    consecutive duplicated positions share an island, any gap starts a
    new one. Island -> (min pos, max pos + span - 1, capped at doc
    end), then the maximal text is one array slice off the doc's own
    tokens.

    Plan shape: the window explode and duplicated-span agg of
    ``top_duplicated_spans`` -> semi join back (narrow, hinted
    shuffle-hash) -> per-doc row_number (ONE shuffle on doc_id; state
    is a counter) -> island agg -> shuffle-hash join to the token
    arrays -> final span agg + TakeOrdered top-k. Every join is an
    equi-join on doc_id/span; nothing quadratic, nothing sorted
    globally."""
    s = span_tokens
    from pyspark.sql.window import Window

    d = spread(documents)
    # token array materialized before the window lambda (round-13):
    # an in-lambda split() would re-tokenize per window position
    toks = F.col("__toks")
    win_structs = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (s - 1), F.lit(1))),
        lambda i: F.struct(
            i.alias("pos"),
            F.concat_ws(" ", F.slice(toks, i, s)).alias("span"),
        ),
    )
    wins = (
        tokenize_once(d, "doc_id")
        .select("doc_id", F.explode(win_structs).alias("w"))
        .select(
            "doc_id",
            F.col("w.pos").alias("pos"),
            F.col("w.span").alias("span"),
        )
    )
    dups = (
        wins.groupBy("span")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("span")
    )
    hits = wins.join(dups.hint("shuffle_hash"), "span", "left_semi")
    isl = hits.withColumn(
        "island",
        F.col("pos")
        - F.row_number().over(Window.partitionBy("doc_id").orderBy("pos")),
    )
    runs = isl.groupBy("doc_id", "island").agg(
        F.min("pos").alias("start_pos"),
        (F.max("pos") + (s - 1)).alias("end_raw"),
    )
    doc_toks = d.select("doc_id", F.split(F.col("text"), " ").alias("w"))
    spans = runs.join(doc_toks.hint("shuffle_hash"), "doc_id").select(
        "doc_id",
        F.concat_ws(
            " ",
            F.expr(
                "slice(w, start_pos,"
                " least(end_raw, size(w)) - start_pos + 1)"
            ),
        ).alias("span"),
    )
    # NOTE: no second min_docs gate on the maximal TEXT — a doc whose
    # maximal run extends past what other docs share (asymmetric
    # overlap) still reports its run with n_docs = 1; every window
    # inside it was cross-document duplicated, which is the signal.
    return (
        spans.groupBy("span")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("doc_id").alias("first_doc_id"),
        )
        .select(
            "span",
            F.size(F.split(F.col("span"), " "))
            .cast("bigint")
            .alias("span_len_tokens"),
            "n_docs",
            "n_occurrences",
            "first_doc_id",
        )
        .orderBy(
            F.col("n_docs").desc(),
            F.col("span_len_tokens").desc(),
            F.col("n_occurrences").desc(),
            "span",
        )
        .limit(k)
    )


def maximal_duplicated_spans_oracle(
    span_tokens: int = 8, min_docs: int = 2, k: int = 30
) -> str:
    s = span_tokens
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
wins AS (
  SELECT doc_id, i AS pos, array_to_string(w[i:i+{s - 1}], ' ') AS span
  FROM toks, LATERAL unnest(generate_series(
    1, greatest(len(w) - {s - 1}, 1))) AS g(i)
),
dups AS (
  SELECT span FROM wins GROUP BY span
  HAVING COUNT(DISTINCT doc_id) >= {min_docs}
),
hits AS (
  SELECT doc_id, pos,
         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM wins WHERE span IN (SELECT span FROM dups)
),
runs AS (
  SELECT doc_id, MIN(pos) AS start_pos, MAX(pos) + {s - 1} AS end_raw
  FROM hits GROUP BY doc_id, island
),
spans AS (
  SELECT r.doc_id,
         array_to_string(
           t.w[r.start_pos:least(r.end_raw, len(t.w))], ' ') AS span
  FROM runs r JOIN toks t USING (doc_id)
)
SELECT span,
       CAST(len(string_split(span, ' ')) AS BIGINT) AS span_len_tokens,
       COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occurrences,
       MIN(doc_id) AS first_doc_id
FROM spans GROUP BY span
ORDER BY n_docs DESC, span_len_tokens DESC, n_occurrences DESC, span ASC
LIMIT {k}
"""


def ngram_jaccard_pairs(
    documents: DataFrame,
    threshold: float = 0.8,
    block_col: str = "source",
    max_block_rows: int = 10_000,
) -> DataFrame:
    """Near-duplicate pairs by word-set Jaccard within a blocking key.

    Jaccard over distinct unigram sets: |A∩B| / |A∪B| — set semantics,
    order-insensitive, so exact integer arithmetic + one deterministic
    division. The self-join is blocked on ``block_col`` and
    de-duplicated with doc_a < doc_b.

    Scale hatch: a blocked self-join is O(n²/2) *within* a block, so a
    dominant blocking key is the 100 TB failure mode. Blocks larger
    than ``max_block_rows`` are therefore routed through MinHash-LSH
    banding (llm/minhash.py) to generate bounded candidates, then
    verified with the same exact unigram Jaccard — candidate counts
    scale with true-duplicate density instead of block size². Within
    small blocks the result is exact; within oversized blocks recall
    follows the banding curve 1-(1-J^r)^b (≈0.98 at J=threshold=0.8
    with k=8, b=4), which is the standard large-corpus trade. The
    split is gated on a single-scalar probe (max block size) — safe to
    collect at any corpus scale — so the common no-oversized-block case
    never pays the LSH branch's plan cost.

    Fast path: when the global vocabulary fits in 63 bits (categorical/
    controlled token streams — probed with a 64-row LIMIT over the
    distinct vocabulary, one bounded job), each token set becomes one
    bigint bitmask and the per-pair cost drops from O(|A|+|B|) array
    intersection to three bit_count instructions. Results are
    bit-identical to the generic path. Natural-language corpora exceed
    the probe and take the generic path.
    """
    sizes = documents.groupBy(block_col).agg(
        F.count(F.lit(1)).alias("_block_rows")
    )
    # One-scalar probe (max block size — safe to collect at any corpus
    # scale, unlike per-block rows): when NO block is oversized, skip
    # the LSH branch entirely instead of paying ~6 empty-stage jobs to
    # discover an empty candidate set at execution time.
    max_block = sizes.agg(F.max("_block_rows").alias("m")).collect()[0]["m"] or 0
    if max_block > max_block_rows:
        sized = documents.join(F.broadcast(sizes), block_col)
        big = sized.filter(F.col("_block_rows") > max_block_rows).drop(
            "_block_rows"
        )
        documents = sized.filter(F.col("_block_rows") <= max_block_rows).drop(
            "_block_rows"
        )
        big_pairs = _jaccard_pairs_lsh_blocked(big, threshold, block_col)
    else:
        big_pairs = None

    toks = F.array_distinct(F.split(F.col("text"), " "))
    # Single bounded probe: a 64-row LIMIT over the distinct vocabulary
    # either returns the COMPLETE vocab (<= 63 tokens -> bitmask fast
    # path) or proves it's too wide (64 rows -> generic path). Replaces
    # the former approx_count_distinct + full-distinct double scan.
    vocab_rows = (
        documents.select(F.explode(toks).alias("t")).distinct().limit(64).collect()
    )
    vocab = sorted(r["t"] for r in vocab_rows)
    # non-empty guard: vocab [] means the small-block subset is
    # empty (everything routed to LSH) — bitmask can't type an
    # empty literal map; the generic path handles it trivially
    if vocab and len(vocab) <= 63:
        small_pairs = _jaccard_pairs_bitmask(
            documents, vocab, threshold, block_col
        )
        if big_pairs is not None:
            small_pairs = small_pairs.unionByName(big_pairs)
        return small_pairs.orderBy("doc_a", "doc_b")
    t = spread(documents).select(
        "doc_id",
        F.col(block_col).alias("block"),
        toks.alias("toks"),
        F.size(toks).alias("n"),
    )
    a = t.alias("a")
    b = t.alias("b")
    an, bn = F.col("a.n"), F.col("b.n")
    # size-filter pruning (exact): J(A,B) <= min(|A|,|B|)/max(|A|,|B|),
    # so pairs whose set sizes differ by more than the threshold ratio
    # can't qualify — pruned BEFORE the O(|A|+|B|) intersect
    size_ok = F.least(an, bn) >= F.ceil(F.greatest(an, bn) * F.lit(threshold))
    inter = F.size(F.array_intersect(F.col("a.toks"), F.col("b.toks")))
    generic = (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & size_ok,
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            inter.alias("i"),
            # |A∪B| = |A|+|B|-|A∩B| — no array_union materialization
            (an + bn - inter).alias("u"),
        )
        .filter(_jaccard_ge(threshold))
        .select("doc_a", "doc_b", _jaccard_x10k())
    )
    if big_pairs is not None:
        generic = generic.unionByName(big_pairs)
    return generic.orderBy("doc_a", "doc_b")


def _jaccard_pairs_lsh_blocked(
    documents: DataFrame, threshold: float, block_col: str
) -> DataFrame:
    """The oversized-block path: MinHash-banded candidates within the
    block, exact unigram-Jaccard verify. Candidate volume is bounded by
    bucket collisions (duplicate density), not block size² — the plan
    that survives a dominant blocking key at 100 TB. Unsorted; the
    caller unions and sorts."""
    from rigatoni_spark.llm.minhash import lsh_bands

    bands = (
        lsh_bands(documents, k=8, bands=4, shingle_n=1)
        .join(
            documents.select("doc_id", F.col(block_col).alias("_blk")),
            "doc_id",
        )
        # both self-join sides read the sketch; materialize it once
        .localCheckpoint()
    )
    a, b = bands.alias("a"), bands.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a._blk") == F.col("b._blk"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    toks = F.array_distinct(F.split(F.col("text"), " "))
    t = documents.select("doc_id", toks.alias("toks"), F.size(toks).alias("n"))
    j = cands.join(
        t.select(
            F.col("doc_id").alias("doc_a"),
            F.col("toks").alias("t_a"),
            F.col("n").alias("n_a"),
        ),
        "doc_a",
    ).join(
        t.select(
            F.col("doc_id").alias("doc_b"),
            F.col("toks").alias("t_b"),
            F.col("n").alias("n_b"),
        ),
        "doc_b",
    )
    inter = F.size(F.array_intersect(F.col("t_a"), F.col("t_b")))
    return (
        j.select(
            "doc_a",
            "doc_b",
            inter.alias("i"),
            (F.col("n_a") + F.col("n_b") - inter).alias("u"),
        )
        .filter(_jaccard_ge(threshold))
        .select("doc_a", "doc_b", _jaccard_x10k())
    )


# Scaled-integer Jaccard output + exact-rational threshold test: hashed
# output columns must not be rounded doubles (1-ulp fragile across
# engines), and i*10000 >= thr*u compares exact integers — no division.
# i/u come from F.size (IntegerType): widen to long BEFORE multiplying —
# a book-length doc with >214,748 distinct shingles would silently wrap
# the int product in non-ANSI Spark and corrupt the verdict.
# Built lazily: constructing a Column requires an active SparkContext.
def _jaccard_x10k():
    return F.floor(F.col("i").cast("long") * 10000 / F.col("u")).alias(
        "jaccard_x10k"
    )


def _jaccard_ge(threshold: float):
    thr = int(round(threshold * 10000))
    return F.col("i").cast("long") * 10000 >= F.lit(thr) * F.col("u").cast("long")


def _jaccard_pairs_bitmask(
    documents: DataFrame, vocab: list[str], threshold: float, block_col: str
) -> DataFrame:
    """Exact Jaccard via 63-bit token-set bitmasks (see
    ngram_jaccard_pairs). bit_count(a&b) / bit_count(a|b) — identical
    values to the array formulation, ~50x less per-pair work.

    Mask construction is O(|toks|): one map lookup (token -> its power
    of two) per distinct token, summed — distinct tokens make the sum a
    bitwise OR. (The previous formulation scanned the vocab per token
    and ran pow() per bit — O(|vocab|*|toks|) with heavy codegen.)
    """
    toks = F.array_distinct(F.split(F.col("text"), " "))
    bit_map = F.create_map(
        *[
            lit
            for i, v in enumerate(vocab)
            for lit in (F.lit(v), F.lit(1 << i).cast("bigint"))
        ]
    )
    mask = F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, tok: acc
        + F.coalesce(F.element_at(bit_map, tok), F.lit(0).cast("bigint")),
    )
    t = spread(documents).select(
        "doc_id",
        F.col(block_col).alias("block"),
        mask.alias("m"),
        F.size(toks).alias("n"),
    )
    a, b = t.alias("a"), t.alias("b")
    an, bn = F.col("a.n"), F.col("b.n")
    size_ok = F.least(an, bn) >= F.ceil(F.greatest(an, bn) * F.lit(threshold))
    inter = F.bit_count(F.col("a.m").bitwiseAND(F.col("b.m")))
    union = F.bit_count(F.col("a.m").bitwiseOR(F.col("b.m")))
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & size_ok,
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            inter.alias("i"),
            union.alias("u"),
        )
        .filter(_jaccard_ge(threshold))
        .select("doc_a", "doc_b", _jaccard_x10k())
    )


def ngram_jaccard_oracle(threshold: float = 0.8, block_col: str = "source") -> str:
    thr = int(round(threshold * 10000))
    return f"""
WITH t AS (
  SELECT doc_id, {block_col} AS block,
         list_distinct(string_split(text, ' ')) AS toks
  FROM documents
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
    len(list_intersect(a.toks, b.toks)) AS i,
    len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)) AS u
  FROM t a JOIN t b ON a.block = b.block AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
  CAST(FLOOR(i * 10000.0 / u) AS BIGINT) AS jaccard_x10k
FROM pairs WHERE i * 10000 >= {thr} * u
ORDER BY doc_a, doc_b
"""


def duplicate_clusters(
    documents: DataFrame,
    threshold: float = 0.8,
    block_col: str = "source",
    max_iterations: int = 20,
    checkpoint_dir: str | None = None,
    doubling: bool = False,
    stats: dict | None = None,
) -> DataFrame:
    """Connected components over the near-duplicate pair graph: every
    document labeled with the min doc_id of its duplicate cluster — the
    canonical keep-one-per-cluster operator (pairs alone under-merge:
    A~B, B~C must collapse to ONE cluster even when A~C misses the
    threshold).

    Distributed min-label propagation: each round joins the current
    label of every node to its neighbors and takes the min (two hash
    joins + one aggregation per round, all keyed on doc_id); converges
    in O(diameter) <= O(log n) rounds for near-dup graphs (tiny
    components), far under ``max_iterations``. The convergence probe
    rides the round's own materialization job as an ``Observation``
    metric (sum of improved-label flags) — one Spark job per round, no
    separate count. Labels are min doc_ids, so the fixpoint is unique
    and engine-independent (DuckDB oracle: WITH RECURSIVE reaching the
    same fixpoint).

    Scale: the iteration runs over EDGE NODES ONLY — docs in at least
    one near-dup pair, a set proportional to the duplicate mass, not
    the corpus (3.3K edge nodes of 5K docs at sf0.1) — and every round's
    result is lineage-truncated: without that, the logical plan doubles
    per round and Catalyst re-analysis turns round 5 from ~1s into ~60s
    (measured). ``checkpoint_dir=None`` truncates via ``localCheckpoint``
    (fastest; shuffle files live on executors, so an executor loss kills
    the job — fine single-node and for short jobs). On a multi-node
    cluster pass a reliable ``checkpoint_dir`` (HDFS/S3): the rounds
    then go through ``setCheckpointDir`` + ``checkpoint()`` and survive
    executor loss. Each round's shuffle carries |edges| rows keyed by
    doc_id. Near-dup components are dense (cliques of mutual
    near-dups), so their diameter — and the round count — is small;
    ``doubling=True`` adds a pointer-doubling hop per round
    (label <- label-of-label, one extra |edge-nodes| self-join) that
    halves remaining path lengths, turning O(diameter) rounds into
    O(log diameter) for pathological CHAIN-shaped components (A~B~C~…
    where consecutive pairs match but distant ones don't). Same unique
    fixpoint either way — the option trades one join per round for
    round count, worthwhile only when components are long and thin
    (tools/scale_probe.py chain measures the flip threshold; SCALE.md
    records it). Pass ``stats={}`` to receive ``stats["rounds"]``, the
    executed round count.
    """
    from rigatoni_spark.tables import truncator

    spark = documents.sparkSession
    _truncate = truncator(spark, checkpoint_dir)

    # truncate the PAIR pipeline first: the undirected union below reads
    # it once per direction, which would execute the expensive
    # shingle/LSH plan twice without this (measured 2x at sf0.1)
    pairs = _truncate(
        ngram_jaccard_pairs(documents, threshold, block_col).select(
            "doc_a", "doc_b"
        )
    )
    # undirected edge list, both directions (cheap relabel over the
    # materialized pairs)
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    # Size-gate the iteration parallelism: the edge set is proportional
    # to duplicate mass, usually ORDERS smaller than the corpus. Tiny
    # graphs should not pay wide-cluster scheduling (32+ tasks x ~6 jobs
    # per round of pure overhead); big graphs keep full parallelism.
    # pairs is already materialized, so count() is a metadata-cheap job.
    n_edges = 2 * pairs.count()
    parts = max(1, min(
        spark.sparkContext.defaultParallelism, n_edges // 50_000 + 1
    ))
    edges = _truncate(edges.repartition(parts, "dst"))
    # iterate only over nodes that appear in some pair; isolated docs
    # are re-attached with label = own id after convergence
    labels = _truncate(
        edges.select("src")
        .distinct()
        .select(F.col("src").alias("doc_id"), F.col("src").alias("label"))
        .repartition(parts, "doc_id")
    )
    from pyspark.sql import Observation

    rounds = 0
    for _ in range(max_iterations):
        rounds += 1
        # neighbor's current label, propagated to each node
        prop = (
            edges.join(
                labels.withColumnRenamed("doc_id", "dst").withColumnRenamed(
                    "label", "nbr_label"
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("doc_id"))
            .agg(F.min("nbr_label").alias("nbr_min"))
        )
        # eager truncation materializes the round AND cuts the
        # lineage, so the next round's plan is flat. The convergence
        # probe rides the SAME job as an Observation (sum of
        # did-this-node-improve flags) — one job per round, not two.
        obs = Observation()
        base = _truncate(
            labels.join(prop, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("label"),
                    F.coalesce(F.col("nbr_min"), F.col("label")),
                ).alias("label"),
                (F.coalesce(F.col("nbr_min"), F.col("label")) < F.col("label"))
                .cast("int")
                .alias("_chg"),
            )
            .observe(obs, F.sum("_chg").alias("changed"))
            .select("doc_id", "label")
        )
        if doubling:
            # pointer-doubling hop: label <- label's own label, read
            # from the round's MATERIALIZED result (both join sides
            # reuse it — no re-aggregation). Every label value is a
            # doc_id inside the edge set, so the inner join is total.
            # The _chg probe stays sound: it fires on any edge whose
            # endpoints still disagree, and the hop only shortcuts
            # paths the neighbor step already implies.
            parent = base.select(
                F.col("doc_id").alias("label"),
                F.col("label").alias("parent_label"),
            )
            labels = _truncate(
                base.join(parent, "label").select(
                    "doc_id", F.col("parent_label").alias("label")
                )
            )
        else:
            labels = base
        if not (obs.get["changed"] or 0):
            break
    if stats is not None:
        # observability out-param (round count drives the plain-vs-
        # doubling flip decision; tools/scale_probe.py measures it)
        stats["rounds"] = rounds
    return (
        documents.select("doc_id")
        .join(labels, "doc_id", "left")
        .select(
            "doc_id", F.coalesce(F.col("label"), F.col("doc_id")).alias("label")
        )
        .orderBy("doc_id")
    )


def cluster_dedup_keep_canonical(
    documents: DataFrame,
    threshold: float = 0.8,
    block_col: str = "source",
    **cluster_kwargs,
) -> DataFrame:
    """The dedup ACTION from :func:`duplicate_clusters`: keep exactly
    one document per near-duplicate cluster — the canonical (min
    doc_id, which IS the cluster label), plus every singleton. Pairs
    alone cannot do this (A~B, B~C must drop two docs even when A~C
    misses the threshold); the transitive closure decides survival.

    Plan shape: the label-propagation fixpoint (edge-nodes-only rounds,
    see duplicate_clusters) followed by one semi join of the corpus
    against the |clusters|-sized survivor set — the corpus is touched
    once more, nothing else shuffles."""
    labels = duplicate_clusters(
        documents, threshold=threshold, block_col=block_col, **cluster_kwargs
    )
    keep = labels.filter(F.col("doc_id") == F.col("label")).select("doc_id")
    return (
        # shuffled hash semi join: the survivor set degenerates to the
        # WHOLE corpus id set when nothing is duplicated, so neither a
        # forced broadcast nor a sort is the right default
        documents.join(keep.hint("shuffle_hash"), "doc_id", "left_semi")
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


def cluster_keep_canonical_oracle(
    threshold: float = 0.8, block_col: str = "source"
) -> str:
    base = duplicate_clusters_oracle(threshold, block_col).strip()
    body = base[: base.rindex("SELECT")]
    return f"""{body}
SELECT d.doc_id, d.lang, d.source
FROM documents d JOIN final f ON d.doc_id = f.doc_id
WHERE f.doc_id = f.label
ORDER BY d.doc_id
"""


def duplicate_clusters_oracle(
    threshold: float = 0.8, block_col: str = "source"
) -> str:
    """Same fixpoint via DuckDB recursive CTE (min-label propagation)."""
    pairs = ngram_jaccard_oracle(threshold, block_col).strip().rstrip()
    # strip the trailing ORDER BY from the pair query for use as a CTE
    pairs_body = pairs[: pairs.rindex("ORDER BY")]
    return f"""
WITH RECURSIVE pairs AS ({pairs_body}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
walk(doc_id, label) AS (
  SELECT doc_id, doc_id AS label FROM documents
  UNION
  SELECT e.src AS doc_id, w.label
  FROM walk w JOIN edges e ON e.dst = w.doc_id
  WHERE w.label < e.src
),
final AS (
  SELECT doc_id, MIN(label) AS label FROM walk GROUP BY doc_id
)
SELECT doc_id, label FROM final ORDER BY doc_id
"""
