"""N-gram language model with stupid backoff: train + perplexity-style
document scoring — the CCNet-shaped LM quality filter (Wenzek et al.
2020 train a KenLM and gate crawl documents by perplexity bands; Brants
et al. 2007 "Large Language Models in Machine Translation" define
stupid backoff as the count-ratio score that needs no discounting and
therefore distributes as pure aggregation).

The reference engine has no LM surface; this extends the
training-data-pipeline family (SURVEY.md "beyond-reference" section)
alongside rarity_scores (the unigram special case, textstats.py).

Everything is integer-exact (``div`` on scaled int64, never ``/``), the
repo's cross-engine-hashing rule: a float log-prob differs in the last
ulp between libm implementations, while count ratios scaled by 1e6
hash identically in Spark and DuckDB. With corpus counts up to ~1e12
(100 TB of text) the largest intermediate is count*1_000_000 < 1e18,
inside int64.

Distributed shape (100 TB story):
- gram construction is scan-fused: one ``transform(sequence(...))``
  over the token array builds (token, prev, prev2) structs per
  position — zero joins, zero windows, no shuffle before the count
  aggs (each map-side combined).
- the three count tables are Zipf-headed; ``prune_min`` drops the long
  tail so a trained model broadcasts (the production deployment: train
  once, broadcast-score everything). Self-scoring at test scale leaves
  pruning off so the DuckDB oracle is a literal transcription.
- scoring is three left joins keyed by gram; AQE broadcasts the count
  tables at test scale and handles head-token skew (skew-join split)
  at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rigatoni_spark.tables import concurrently, spread

# score scale: ratios land in [0, 1e6]; backoff multiplies by 0.4 once
# (bigram path) or twice (unigram path), expressed as *4 div 10 and
# *16 div 100 so both engines evaluate identical integer arithmetic
SCALE = 1_000_000


def _position_rows(documents: DataFrame) -> DataFrame:
    """(doc_id, t, t1, t2) per token position: t1/t2 are the previous
    one/two tokens, NULL at document starts (the natural backoff: the
    first token scores through the unigram path, the second through
    the bigram path). Scan-fused — no window, no self-join. Streaming
    inputs skip spread(): repartitioning a micro-batch is wasted
    shuffle (the stream source already sets batch parallelism)."""
    # materialize the token array BEFORE the lambda: a split() call
    # inside the transform body would re-tokenize the document once per
    # sequence element (O(n^2) characters per doc); referencing the
    # projected array keeps gram construction O(n)
    grams = F.expr(
        "transform(sequence(1, size(w)), i -> struct("
        "  w[i - 1] AS t,"
        "  if(i > 1, w[i - 2], null) AS t1,"
        "  if(i > 2, w[i - 3], null) AS t2))"
    )
    if not documents.isStreaming:
        documents = spread(documents)
    return (
        documents.select(
            "doc_id", F.split(F.col("text"), " ").alias("w")
        )
        .select("doc_id", F.explode(grams).alias("g"))
        .select("doc_id", "g.t", "g.t1", "g.t2")
    )


def _count_tables_from_rows(
    rows: DataFrame, prune_min: int = 1
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame, DataFrame]:
    """(tri, bi, uni, total, uni_roll) from pre-built position rows.
    ``total`` (1 row, n_total) is FOLDED INTO the unigram aggregation:
    one ``rollup("t")`` computes every unigram count AND the grand
    total (== count(rows)) in a single shuffle, so materializing a
    model pays THREE corpus-sized aggregations (tri, bi, rollup) —
    the context totals ride them as windows, see below.
    ``uni`` and ``total`` are filters over the shared ``uni_roll``
    (grouping flag 1 = the grand-total row); callers that cache the
    model persist ``uni_roll`` once and both read through it."""
    # Context totals as WINDOWS over the aggregated tables (round-13
    # optimization): cx3(a,b) == sum_t c3(a,b,t) — the same identity
    # lm_merge already relies on — so instead of a SECOND full
    # aggregation over the corpus-sized gram rows plus a join per
    # order, each context total is a sum window over the
    # vocabulary-bounded count table (model-sized input, no join).
    # Window group sizes are bounded by |vocab| (one row per
    # continuation token), so no unbounded-partition skew is possible.
    from pyspark.sql import Window

    tri = (
        rows.filter(F.col("t2").isNotNull())
        .groupBy("t2", "t1", "t")
        .agg(F.count(F.lit(1)).alias("c3"))
        .withColumn(
            "cx3", F.sum("c3").over(Window.partitionBy("t2", "t1"))
        )
    )
    bi = (
        rows.filter(F.col("t1").isNotNull())
        .groupBy("t1", "t")
        .agg(F.count(F.lit(1)).alias("c2"))
        .withColumn("cx2", F.sum("c2").over(Window.partitionBy("t1")))
    )
    uni_roll = rows.rollup("t").agg(
        F.count(F.lit(1)).alias("c1"), F.grouping("t").alias("_g")
    )
    uni, total = _uni_total_from_roll(uni_roll, prune_min)
    if prune_min > 1:
        tri = tri.filter(F.col("c3") >= prune_min)
        bi = bi.filter(F.col("c2") >= prune_min)
    return (tri, bi, uni, total, uni_roll)


def _uni_total_from_roll(
    uni_roll: DataFrame, prune_min: int = 1
) -> tuple[DataFrame, DataFrame]:
    """(uni, total) as filters over the shared unigram rollup — one
    derivation used by both the lazy count tables and the materialized
    model, so the two paths cannot drift.

    rollup on an EMPTY corpus yields zero rows (Expand + groupBy has
    no groups, grand-total included), but ``total`` must stay exactly
    one row: _score_with_model cross-joins broadcast(total), so a
    zero-row total would silently erase every per-doc score row, and
    lm_save would write an empty total artifact. The trailing global
    agg coalesces the ≤1-row filter output to one row (n_total=0 on
    an empty corpus ⇒ scores come back null, rows preserved)."""
    uni = uni_roll.filter(F.col("_g") == 0).drop("_g")
    total = (
        uni_roll.filter(F.col("_g") == 1)
        .groupBy()
        .agg(F.coalesce(F.max("c1"), F.lit(0)).alias("n_total"))
    )
    if prune_min > 1:
        # total stays PRE-prune (true corpus size); only uni thins
        uni = uni.filter(F.col("c1") >= prune_min)
    return uni, total


def lm_count_tables(
    documents: DataFrame, prune_min: int = 1
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train: the (trigram, bigram, unigram) count tables, each carrying
    its backoff-context total so scoring is a single join per order.

    ``prune_min`` keeps only grams seen at least that often — the knob
    that bounds model size at 100 TB (KenLM's pruning); context totals
    are computed BEFORE pruning so pruned-model scores remain true
    count ratios of the full corpus.
    """
    tri, bi, uni, _, _ = _count_tables_from_rows(
        _position_rows(documents), prune_min=prune_min
    )
    return tri, bi, uni


def lm_top_trigrams(documents: DataFrame, k: int = 30) -> DataFrame:
    """The trained model's head: top-k trigrams with their context
    totals and stupid-backoff score — what an LM artifact export would
    materialize first."""
    tri, _, _ = lm_count_tables(documents)
    return (
        tri.select(
            "t2",
            "t1",
            "t",
            "c3",
            "cx3",
            F.expr(f"c3 * {SCALE} div cx3").alias("score_x1m"),
        )
        .orderBy(F.col("c3").desc(), "t2", "t1", "t")
        .limit(k)
    )


def lm_surprisal(documents: DataFrame, prune_min: int = 1) -> DataFrame:
    """Score every document under the corpus LM: per-position stupid
    backoff (trigram ratio; else 0.4 * bigram ratio; else 0.16 *
    unigram frequency), averaged per document. High score = fluent
    under the corpus model; the CCNet gate drops the tails.

    Self-scoring (train and score on the same corpus, like
    rarity_scores) keeps the unigram path total-count-backed — no OOV
    floor needed. A train/test split scores through the same joins
    with an added +1 smoothing on the unigram miss.
    """
    if documents.isStreaming:
        # training REQUIRES materializing the count tables (persist +
        # count), which a streaming DataFrame cannot do — there is no
        # lazy-trained variant that would be correct per micro-batch
        # (each batch would re-aggregate only its own slice). The
        # streaming deployment is train-offline/score-online:
        raise TypeError(
            "lm_surprisal trains on its own input and cannot train on "
            "a stream; use lm_surprisal_stream(stream_docs, "
            "train_docs) with a batch training corpus (or lm_save + "
            "lm_surprisal_stream_artifact for a pre-trained model)"
        )
    rows = _position_rows(documents)
    # self-scoring: the SAME rows feed training (5 count aggs) and
    # scoring — persist once so tokenize+explode is paid once, not 6-7
    # times (round-10 advice; measured 8x on the sf0.1 catalog row).
    # Cache lifecycle matters as much as the cache (round-11: stacked
    # never-unpersisted gram caches across catalog passes measurably
    # slowed UNRELATED queries via memory pressure): the corpus-sized
    # gram cache lives only long enough to materialize the count
    # tables and the per-doc scores; what the caller's collect reads
    # is the doc-sized checkpointed scores, the only blocks left
    # behind — and those are GC-tied, not CacheManager-pinned.
    rows = rows.persist()
    tables, handles, model_rows = _trained_tables(rows, prune_min=prune_min)
    # one materialization through the gram cache, lineage SEVERED
    # (localCheckpoint, not persist+count — the _materialize_once
    # idiom): every later action over the doc-sized scores (the gate's
    # mean+banding join, the driver's collect, repeated bench passes)
    # reads flat LogicalRDD blocks instead of re-paying the
    # corpus-sized cached-plan lineage per action (measured 3.8 s vs
    # 0.3 s per banding-join action at sf0.1), and the blocks free by
    # GC when the returned plan drops instead of pinning a
    # CacheManager entry
    scores = _score_with_model(
        rows, *tables, model_rows=model_rows
    ).localCheckpoint()
    rows.unpersist()
    for t in handles:
        t.unpersist()
    return scores.orderBy("doc_id")


def _score_rows(
    rows: DataFrame, train_rows: DataFrame, prune_min: int = 1
) -> tuple[DataFrame, tuple[DataFrame, ...]]:
    """Score position rows (batch OR streaming) against a model trained
    on ``train_rows`` position rows (always batch): the train-offline /
    score-online split. Unordered per-doc output — callers order or
    window it. Returns (scored, handles); the handles are the
    PERSISTED model tables and the caller owns their lifecycle —
    unpersist them once scoring is done (round-11 lesson: a persist
    without an unpersist plan taxes unrelated queries for the session
    lifetime)."""
    tables, handles, model_rows = _trained_tables(
        train_rows, prune_min=prune_min
    )
    return _score_with_model(rows, *tables, model_rows=model_rows), handles


def _trained_tables(
    train_rows: DataFrame, prune_min: int = 1
) -> tuple[tuple[DataFrame, ...], tuple[DataFrame, ...]]:
    """Train and MATERIALIZE the count tables: the gram rows are cached
    only while the aggregations run (they share one tokenize+explode
    instead of re-deriving it each), then dropped; what persists is the
    much smaller model set, eagerly counted so every later use — each
    micro-batch of a stream-static scoring query especially — joins
    against cached tables instead of re-aggregating the corpus.

    Returns ``((tri, bi, uni, total), handles)``. The three HANDLES
    (tri, bi, and the shared unigram ROLLUP that uni and total both
    filter) are what is actually persisted — materializing them is
    three jobs, not four, because ``total`` rides the rollup instead of
    paying its own aggregation (round-11 ask #7). Callers that finish
    with the model must unpersist the handles (unpersisting uni/total
    themselves would be a no-op — they are filters over the rollup).

    persist+count, NOT localCheckpoint (measured round 13): the
    persisted blocks keep each micro-batch from re-aggregating the
    corpus. The join STRATEGY no longer rides the InMemoryRelation
    stats (round 13's fragility: a lineage-severed handle reports the
    default huge sizeInBytes and silently demoted the stream-static
    per-trigger joins to shuffles) — the materialization counts feed a
    size-probed explicit hint instead (round 14, the ``bpe_encode``
    hatch pattern): the third return element is the LARGEST table's
    row count, which ``_score_with_model`` turns into an explicit
    broadcast below the model-size bound and a shuffled-hash hint
    above it."""
    owned = not train_rows.is_cached and not train_rows.isStreaming
    if owned:
        train_rows = train_rows.persist()
    tri, bi, uni, total, roll = _count_tables_from_rows(
        train_rows, prune_min=prune_min
    )
    handles = (tri.persist(), bi.persist(), roll.persist())
    # three INDEPENDENT materialization jobs — overlap them (guide
    # §2.6): bi's and the rollup's tasks back-fill executors idled by
    # tri's reduce tail instead of waiting for the full job, and the
    # shared train_rows cache is still computed exactly once (the
    # BlockManager's per-partition locks serialize block computation,
    # not the jobs)
    counts = concurrently(*(t.count for t in handles))
    if owned:
        train_rows.unpersist()
    return (tri, bi, uni, total), handles, max(counts)


def _score_with_model(
    rows: DataFrame,
    tri: DataFrame,
    bi: DataFrame,
    uni: DataFrame,
    total: DataFrame,
    model_rows: int | None = None,
) -> DataFrame:
    """The scoring joins alone, model-source-agnostic: three left joins
    keyed by gram + the broadcast 1-row total — identical whether the
    tables came from inline training or a loaded artifact (lm_load),
    which is what pins artifact == inline in the catalog.

    ``model_rows`` (the largest table's materialized row count, from
    ``_trained_tables``) picks the join strategy EXPLICITLY — the
    ``bpe_encode`` size-probe hatch (round 14): a model-sized table
    broadcasts (the deliberate production topology: train once,
    broadcast-score every micro-batch), a pathological one (> 5M gram
    rows; web-scale whitespace vocabularies can push Heaps' growth
    past Spark's 8 GB / 512M-row broadcast cap) takes a shuffled-hash
    hint — same rows, no cliff. This removes the round-13 dependence
    on persisted-table size stats for the stream-static per-trigger
    joins, where AQE cannot re-plan a demotion. ``None`` (the artifact
    path) keeps the planner's choice: lm_load reads parquet, whose
    footer size stats are accurate."""
    if model_rows is None:
        _attach = lambda df: df  # noqa: E731 - parquet stats decide
    elif model_rows <= 5_000_000:
        _attach = F.broadcast
    else:
        _attach = lambda df: df.hint("shuffle_hash")  # noqa: E731
    scored = (
        rows.join(_attach(tri), ["t2", "t1", "t"], "left")
        .join(_attach(bi), ["t1", "t"], "left")
        .join(_attach(uni), ["t"], "left")
        .join(F.broadcast(total))
        .select(
            "doc_id",
            F.expr(
                # nullif guards the EMPTY-corpus artifact (n_total=0,
                # one row by construction): under ANSI mode a bare
                # `div 0` throws DIVIDE_BY_ZERO; nullif turns the
                # backoff term — and thus the doc's score — into NULL
                # while keeping the per-doc row
                f"CASE WHEN c3 IS NOT NULL THEN c3 * {SCALE} div cx3 "
                f"WHEN c2 IS NOT NULL THEN (4 * (c2 * {SCALE} div cx2)) div 10 "
                f"ELSE (16 * (coalesce(c1, 0) * {SCALE} div nullif(n_total, 0))) div 100 "
                "END"
            ).alias("s"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_scored"),
        F.expr("sum(s) div count(1)").alias("lm_score_x1m"),
    )


def lm_surprisal_stream(
    stream_docs: DataFrame,
    train_docs: DataFrame,
    tables_out: list | None = None,
) -> DataFrame:
    """LM scoring IN-STREAM: documents arrive on a stream and score
    against the count tables of a STATIC training corpus via
    stream-static left joins — the production crawl-ingest topology
    (train the LM once on the reference corpus, score every incoming
    document; CCNet's exact deployment). Complete-mode per-doc agg;
    drained over the bounded corpus with train==stream it equals
    lm_surprisal, so the same oracle hash-checks the streaming path.

    ``stream_docs`` may also be a BATCH DataFrame — the same joins
    score a held-out slice against a model trained on the rest
    (train/test perplexity evaluation); output is unordered either
    way.

    Training persists the model tables so each micro-batch joins
    against the cache instead of re-aggregating the corpus — and so
    the per-trigger joins keep the tables' ACCURATE InMemoryRelation
    size stats for auto-broadcast (round-13 measurement: severing
    their lineage demoted the stream-static joins to shuffles). Pass
    ``tables_out`` (a list) to receive the persisted handles: a caller
    draining a BOUNDED stream must unpersist them after the drain, or
    the model-sized caches outlive the query for the whole session
    (the round-11 cache-lifecycle lesson). Left unpassed — the
    unbounded production stream, where the model must stay cached for
    the query's lifetime — the handles are reachable only through the
    returned plan and the ContextCleaner reclaims them after the query
    is dropped."""
    if train_docs.isStreaming:
        raise TypeError(
            "lm_surprisal_stream trains on train_docs, which must be a "
            "batch DataFrame (train offline, score online); got a "
            "streaming DataFrame"
        )
    scored, handles = _score_rows(
        _position_rows(stream_docs), _position_rows(train_docs)
    )
    if tables_out is not None:
        tables_out.extend(handles)
    return scored


def lm_gate(documents: DataFrame) -> DataFrame:
    """CCNet-style perplexity banding: bucket every document against
    the corpus-mean LM score (integer mean, broadcast 1-row join) —
    'head' scores at/above the mean (fluent), 'tail' below half the
    mean (likely junk: boilerplate, non-language, mojibake), 'middle'
    between. A production pipeline keeps head+middle; the catalog row
    returns the full banding so the oracle checks every boundary."""
    # scores feed BOTH the corpus-mean agg and the banding join —
    # lm_surprisal returns them materialized with lineage severed
    # (doc-sized checkpoint blocks, gram rows dropped), so both
    # consumers re-plan a flat LogicalRDD
    scores = lm_surprisal(documents)
    mean = scores.agg(
        F.expr("sum(lm_score_x1m) div count(1)").alias("corpus_mean")
    )
    return (
        scores.join(F.broadcast(mean))
        .select(
            "doc_id",
            "lm_score_x1m",
            F.expr(
                "CASE WHEN lm_score_x1m >= corpus_mean THEN 'head' "
                "WHEN lm_score_x1m * 2 >= corpus_mean THEN 'middle' "
                "ELSE 'tail' END"
            ).alias("band"),
        )
        .orderBy("doc_id")
    )


# --- DuckDB oracle SQL -------------------------------------------------

_ROWS_CTE = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
rows_ AS (
  SELECT doc_id, g['t'] AS t, g['t1'] AS t1, g['t2'] AS t2
  FROM (
    SELECT doc_id, unnest(list_transform(generate_series(1, len(w)),
      i -> {'t': w[i],
            't1': CASE WHEN i > 1 THEN w[i-1] END,
            't2': CASE WHEN i > 2 THEN w[i-2] END})) AS g
    FROM toks
  )
)
"""

def _counts_ctes(prune_min: int = 1) -> str:
    """Count-table CTEs; ``prune_min`` > 1 drops rare grams with a
    HAVING on tri/bi/uni while the CONTEXT totals stay full-corpus —
    the exact semantics of the Spark path's prune_min."""
    having = (
        f" HAVING COUNT(*) >= {prune_min}" if prune_min > 1 else ""
    )
    return f"""
tri AS (
  SELECT t2, t1, t, COUNT(*) AS c3 FROM rows_
  WHERE t2 IS NOT NULL GROUP BY t2, t1, t{having}
),
tri_ctx AS (
  SELECT t2, t1, COUNT(*) AS cx3 FROM rows_
  WHERE t2 IS NOT NULL GROUP BY t2, t1
),
bi AS (
  SELECT t1, t, COUNT(*) AS c2 FROM rows_
  WHERE t1 IS NOT NULL GROUP BY t1, t{having}
),
bi_ctx AS (
  SELECT t1, COUNT(*) AS cx2 FROM rows_ WHERE t1 IS NOT NULL GROUP BY t1
),
uni AS (SELECT t, COUNT(*) AS c1 FROM rows_ GROUP BY t{having}),
total AS (SELECT COUNT(*) AS n_total FROM rows_)
"""


_COUNTS_CTES = _counts_ctes()

def _surprisal_ctes(prune_min: int = 1) -> str:
    return (
        _ROWS_CTE
        + ","
        + _counts_ctes(prune_min)
        + f""",
scored AS (
  SELECT r.doc_id,
    CASE WHEN tri.c3 IS NOT NULL THEN (tri.c3 * {SCALE}) // tc.cx3
         WHEN bi.c2 IS NOT NULL THEN (4 * ((bi.c2 * {SCALE}) // bc.cx2)) // 10
         ELSE (16 * ((COALESCE(uni.c1, 0) * {SCALE}) // total.n_total)) // 100
    END AS s
  FROM rows_ r
  LEFT JOIN tri ON r.t2 = tri.t2 AND r.t1 = tri.t1 AND r.t = tri.t
  LEFT JOIN tri_ctx tc ON r.t2 = tc.t2 AND r.t1 = tc.t1
  LEFT JOIN bi ON r.t1 = bi.t1 AND r.t = bi.t
  LEFT JOIN bi_ctx bc ON r.t1 = bc.t1
  LEFT JOIN uni ON r.t = uni.t
  CROSS JOIN total
),
doc_scores AS (
  SELECT doc_id, COUNT(*) AS n_scored,
         CAST(SUM(s) // COUNT(*) AS BIGINT) AS lm_score_x1m
  FROM scored GROUP BY doc_id
)
"""
)


def lm_top_trigrams_oracle(k: int = 30) -> str:
    return (
        _ROWS_CTE
        + ","
        + _COUNTS_CTES
        + f"""
SELECT tri.t2, tri.t1, tri.t, tri.c3, tc.cx3,
       CAST((tri.c3 * {SCALE}) // tc.cx3 AS BIGINT) AS score_x1m
FROM tri JOIN tri_ctx tc ON tri.t2 = tc.t2 AND tri.t1 = tc.t1
ORDER BY tri.c3 DESC, tri.t2, tri.t1, tri.t LIMIT {k}
"""
    )


def lm_surprisal_oracle(prune_min: int = 1) -> str:
    return (
        _surprisal_ctes(prune_min)
        + """
SELECT doc_id, n_scored, lm_score_x1m FROM doc_scores ORDER BY doc_id
"""
    )


LM_SURPRISAL_ORACLE = lm_surprisal_oracle()


LM_GATE_ORACLE = (
    _surprisal_ctes()
    + """,
corpus AS (
  SELECT CAST(SUM(lm_score_x1m) // COUNT(*) AS BIGINT) AS corpus_mean
  FROM doc_scores
)
SELECT doc_id, lm_score_x1m,
  CASE WHEN lm_score_x1m >= corpus_mean THEN 'head'
       WHEN lm_score_x1m * 2 >= corpus_mean THEN 'middle'
       ELSE 'tail' END AS band
FROM doc_scores CROSS JOIN corpus ORDER BY doc_id
"""
)


# --- model artifact: train once, broadcast-score everything ------------

_ARTIFACT_PARTS = ("tri", "bi", "uni", "total")

# the artifact wire format lm_save writes (count tables + 1-row total);
# lm_load reads with these EXPLICIT schemas — parquet matches columns
# by name, so part-file column order is free, but a type drift fails
# at scan instead of being silently re-inferred
_ARTIFACT_SCHEMAS = {
    "tri": "t2 string, t1 string, t string, c3 bigint, cx3 bigint",
    "bi": "t1 string, t string, c2 bigint, cx2 bigint",
    "uni": "t string, c1 bigint",
    "total": "n_total bigint",
}


def lm_save(
    documents: DataFrame, path: str, prune_min: int = 1
) -> dict[str, str]:
    """Train on ``documents`` and persist the model as a parquet
    artifact (tri/bi/uni count tables + the 1-row total) under
    ``path`` — the same artifact pattern as the quality classifier
    (textstats.train_qlf_weights -> parquet -> quality_logit). This is
    the production path the module docstring promises: train ONCE on
    the reference corpus (with ``prune_min`` bounding artifact size,
    KenLM posture), then every scoring job loads + broadcast-joins the
    tables without ever rescanning the training corpus.

    Returns the per-part paths. Writes are plain parquet dir writes
    (Spark's committer gives atomic-enough publication; for object
    stores front this with the sink's staged-rename protocol)."""
    import os

    from functools import partial

    train_rows = _position_rows(documents).persist()
    tri, bi, uni, total, _ = _count_tables_from_rows(
        train_rows, prune_min=prune_min
    )
    parts = dict(zip(_ARTIFACT_PARTS, (tri, bi, uni, total)))

    def _write(name: str, df: DataFrame) -> tuple[str, str]:
        p = os.path.join(path, name)
        df.write.mode("overwrite").parquet(p)
        return name, p

    # four INDEPENDENT artifact writes to distinct dirs — overlap them
    # (guide §2.6); the shared train_rows cache is computed once under
    # the BlockManager's per-partition locks
    out = dict(
        concurrently(*(partial(_write, n, d) for n, d in parts.items()))
    )
    train_rows.unpersist()
    return out


def lm_load(
    spark, path: str
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Load a saved LM artifact: (tri, bi, uni, total) DataFrames
    straight off parquet — scan-prunable, and small enough post-prune
    that AQE broadcasts them into the scoring joins.

    The artifact schema is FIXED by ``lm_save`` (the wire format this
    module owns), so each read passes it explicitly: no driver-side
    footer schema inference per part (guide §6 — same posture as
    ``tables.load_table``'s schema cache), and a drifted artifact fails
    loudly at scan instead of silently re-inferring a new shape."""
    import os

    return tuple(
        spark.read.schema(_ARTIFACT_SCHEMAS[name]).parquet(
            os.path.join(path, name)
        )
        for name in _ARTIFACT_PARTS
    )


def lm_surprisal_artifact(
    documents: DataFrame, spark, path: str, prune_min: int = 1
) -> DataFrame:
    """Round-trip harness: train + save the artifact, load it back,
    and score ``documents`` through the LOADED tables — by
    construction equal to inline ``lm_surprisal``, which is what the
    catalog row pins cross-engine (artifact == inline hash parity).

    The returned scores are MATERIALIZED with ``localCheckpoint()``
    (doc-sized blocks, lineage SEVERED — not a persist(), whose cached
    blocks keep the parquet lineage and would recompute through the
    deleted artifact dir on block loss) before returning, so the
    caller may delete ``path`` immediately — round-trip harnesses must
    not leave model-sized parquet artifacts accumulating in temp
    dirs."""
    lm_save(documents, path, prune_min=prune_min)
    tri, bi, uni, total = lm_load(spark, path)
    scores = _score_with_model(
        _position_rows(documents), tri, bi, uni, total
    ).localCheckpoint()
    return scores.orderBy("doc_id")


def lm_surprisal_stream_artifact(
    stream_docs: DataFrame, spark, path: str
) -> DataFrame:
    """The full production crawl-ingest topology: documents arrive on a
    STREAM and score against a PRE-TRAINED artifact loaded off parquet
    (``lm_save`` ran offline; no training work at ingest — the joins
    broadcast the loaded count tables into every micro-batch). Drained
    over the bounded corpus with the artifact trained on the same
    corpus, it equals ``lm_surprisal`` — the same oracle hash-checks
    this path end-to-end (stream + artifact at once)."""
    return _score_with_model(
        _position_rows(stream_docs), *lm_load(spark, path)
    )


def lm_merge_counts(
    a: tuple[DataFrame, DataFrame, DataFrame],
    b: tuple[DataFrame, DataFrame, DataFrame],
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Incremental training: merge two trained models by summing counts
    per gram — n-gram count tables are exactly mergeable (unlike a
    discounted/normalized LM, stupid backoff stores raw counts, so
    corpus-increment training is union + sum, never a full retrain).
    At 100 TB this is the nightly-crawl shape: train on the increment
    only, merge with the persisted model — one |model|-sized shuffle,
    the corpus is never rescanned.

    Context totals are NOT merged row-wise (a gram present in only one
    side would keep only that side's replicated context total even
    when the other side contributes other grams to the same context);
    they are recomputed from the merged gram counts via the identity
    cx3(a,b) == sum_t c3(a,b,t) — a window over the context keys, the
    same shuffle the merge already pays. (This identity only holds for
    UNPRUNED models; merge before pruning, like KenLM interpolation.)
    """
    from pyspark.sql import Window

    def _merge(
        x: DataFrame, y: DataFrame, keys: list[str], cnt: str, ctx: str | None
    ) -> DataFrame:
        merged = (
            x.drop(*([ctx] if ctx else []))
            .unionByName(y.drop(*([ctx] if ctx else [])))
            .groupBy(*keys)
            .agg(F.sum(cnt).alias(cnt))
        )
        if ctx is None:
            return merged
        return merged.withColumn(
            ctx, F.sum(cnt).over(Window.partitionBy(*keys[:-1]))
        )

    return (
        _merge(a[0], b[0], ["t2", "t1", "t"], "c3", "cx3"),
        _merge(a[1], b[1], ["t1", "t"], "c2", "cx2"),
        _merge(a[2], b[2], ["t"], "c1", None),
    )


def lm_top_trigrams_incremental(
    documents: DataFrame, split_mod: int = 2, k: int = 30
) -> DataFrame:
    """Catalog harness for the merge rule: train two models on disjoint
    corpus halves, merge, report the merged model head — equal by
    construction to training once on the whole corpus, which is what
    the oracle computes (a cross-engine proof that merge == retrain)."""
    parts = [
        documents.filter(F.col("doc_id") % split_mod == i)
        for i in range(split_mod)
    ]
    tables = lm_count_tables(parts[0])
    for p in parts[1:]:
        tables = lm_merge_counts(tables, lm_count_tables(p))
    tri = tables[0]
    return (
        tri.select(
            "t2",
            "t1",
            "t",
            "c3",
            "cx3",
            F.expr(f"c3 * {SCALE} div cx3").alias("score_x1m"),
        )
        .orderBy(F.col("c3").desc(), "t2", "t1", "t")
        .limit(k)
    )
