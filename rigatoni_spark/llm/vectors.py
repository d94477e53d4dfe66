"""Embedding similarity search over ``embeddings`` (vec_id,
embedding: array<float>, label).

Two paths:
- brute-force cosine top-k (the correctness baseline): broadcast the
  (small) query set against the corpus; exact.
- sign-random-projection LSH ANN (the scale path): hash every vector
  into a 2^NBITS bucket via deterministic MD5-derived hyperplanes;
  candidates = same-bucket; exact cosine re-rank within bucket. At
  100 TB the bucket join replaces the full cross product — probe cost
  is corpus/2^NBITS per query; multi-probe (flipping low-margin bits)
  is the standard recall knob, noted but not needed at bench scale.

Determinism: all arithmetic is elementwise double multiply +
left-to-right accumulation — the same IEEE sequence DuckDB's
indexed list_transform/list_sum evaluates, so values hash-match
bit-for-bit without rounding tricks. Hyperplane entries are ±1 from an
MD5 parity — no RNG.

Performance: the per-pair expression kernels are ``aggregate``/
``zip_with`` folds ON PURPOSE. Unrolling them into static 64-term
``element_at`` chains was measured 3-8x SLOWER at sf0.1 (round 4):
the giant trees exceed codegen method limits, fall back to
interpreted evaluation of a much larger node count, and bloat task
binaries to ~1.4 MB. The folds run one tight pass over the unsafe
array. The cheap structural win everywhere: norms are computed once
per ROW before every join (see the ``nrm`` columns), never per pair.
Where the fold itself becomes the bottleneck — k-means assignment
(O(k x dim) per row) and the dedup pair stages (O(dim) per candidate
pair at quadratic-in-cell pair counts) — the scale path is a
vectorized Arrow kernel instead (``_kmeans_argmin_struct`` /
``pair_kernel="blas"``): interpreted higher-order lambdas lose to
numpy by 6-20x there, measured in the docstrings below.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from rigatoni_spark.functions import dot_product, l2_norm
from rigatoni_spark.tables import spread, truncator

DIM = 64
NBITS = 8  # LSH hyperplanes -> 256 buckets


# the shared scalar-function layer provides the fold kernels; aliased
# locally because every expression below is written in terms of them
_dot = dot_product
_norm = l2_norm


# shared lineage-truncation switch (tables.truncator): None ->
# localCheckpoint, else reliable checkpoint() — same semantics in
# duplicate_clusters and the k-means family
_truncator = truncator


def cosine_topk(
    embeddings: DataFrame, n_queries: int = 8, k: int = 5
) -> DataFrame:
    """Exact top-k cosine neighbors for the first ``n_queries`` vectors.

    The query side is tiny -> broadcast; the corpus side streams through
    one task wave. No shuffle of the corpus.
    """
    # norms are computed ONCE per row before the join (norm(v) is
    # sqrt(dot(v,v)) either way — same IEEE value as the per-pair form,
    # ~3x less per-pair arithmetic)
    q = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        _norm(F.col("embedding")).alias("q_nrm"),
    )
    # corpus side does the per-row vector math — run it wide
    c = spread(embeddings).select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("c_emb"),
        _norm(F.col("embedding")).alias("c_nrm"),
    )
    sim = _dot(F.col("q_emb"), F.col("c_emb")) / (
        F.col("q_nrm") * F.col("c_nrm")
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id", "cand_id", F.round(sim, 4).alias("cosine"),
            sim.alias("_raw"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_raw").desc(), F.col("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
        .orderBy("query_id", "rank")
    )


def cosine_topk_oracle(n_queries: int = 8, k: int = 5) -> str:
    dot = (
        "list_sum(list_transform(generate_series(1, {d}), "
        "i -> (({a}[i])::DOUBLE * ({b}[i])::DOUBLE)))"
    )
    qq = dot.format(d=DIM, a="q.embedding", b="q.embedding")
    cc = dot.format(d=DIM, a="c.embedding", b="c.embedding")
    qc = dot.format(d=DIM, a="q.embedding", b="c.embedding")
    return f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         {qc} / (sqrt({qq}) * sqrt({cc})) AS raw
  FROM embeddings q JOIN embeddings c ON q.vec_id < {n_queries}
   AND q.vec_id <> c.vec_id
), ranked AS (
  SELECT query_id, cand_id, ROUND(raw, 4) AS cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY raw DESC, cand_id) AS rank
  FROM scored
)
SELECT query_id, cand_id, cosine, rank FROM ranked
WHERE rank <= {k} ORDER BY query_id, rank
"""


def _hyperplane_signs(b: int, dim: int = DIM) -> list[float]:
    """Hyperplane b entry i is +1 if the first hex digit of md5('b:i')
    is even else -1 — deterministic; the SQL oracle recomputes the same
    md5 parity and gets identical signs."""
    import hashlib

    return [
        1.0 if int(hashlib.md5(f"{b}:{i}".encode()).hexdigest()[0], 16) % 2 == 0
        else -1.0
        for i in range(dim)
    ]


def _bucket(emb: Column) -> Column:
    """Sign-random-projection bucket id in [0, 2^NBITS).

    The signs depend only on (b, i), so they are precomputed driver-side
    and embedded as literal arrays — the per-row work is NBITS pure
    multiply-add folds (no runtime md5; was 512 md5 calls per row).
    """
    bucket = F.lit(0).cast("bigint")
    for b in range(NBITS):
        signs = F.array(*[F.lit(s) for s in _hyperplane_signs(b)])
        proj = F.aggregate(
            F.zip_with(emb, signs, lambda x, s: x.cast("double") * s),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj >= 0, F.lit(1 << b)).otherwise(F.lit(0))
    return bucket


def ann_lsh_topk(
    embeddings: DataFrame, n_queries: int = 8, k: int = 5
) -> DataFrame:
    """Approximate top-k: same-bucket candidates, exact cosine re-rank."""
    with_bucket = spread(embeddings).withColumn(
        "bucket", _bucket(F.col("embedding"))
    ).withColumn(
        "nrm", _norm(F.col("embedding"))
    ).localCheckpoint()  # both join sides read it: hash+norm once, not per pair
    q = with_bucket.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("bucket").alias("q_bucket"),
        F.col("nrm").alias("q_nrm"),
    )
    c = with_bucket.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("c_emb"),
        F.col("bucket").alias("c_bucket"),
        F.col("nrm").alias("c_nrm"),
    )
    sim = _dot(F.col("q_emb"), F.col("c_emb")) / (
        F.col("q_nrm") * F.col("c_nrm")
    )
    scored = (
        F.broadcast(q)
        .join(
            c,
            (F.col("q_bucket") == F.col("c_bucket"))
            & (F.col("query_id") != F.col("cand_id")),
        )
        .select(
            "query_id", "cand_id", F.round(sim, 4).alias("cosine"),
            sim.alias("_raw"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_raw").desc(), F.col("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
        .orderBy("query_id", "rank")
    )


def _attach_chunk(
    df: DataFrame, key: str, max_rows: int | None
) -> tuple[DataFrame, DataFrame | None]:
    """Attach a blocking guardrail's ``chunk`` ordinal within ``key``
    groups (mega-bucket / degenerate-cell splitting); returns
    ``(df_with_chunk, oversized_counts)`` where ``oversized_counts``
    is None in the designed steady state (nothing oversized) or a
    small ``(key, max_chunk)`` DataFrame listing ONLY the groups that
    were actually split — the zero-chunk-bridge machinery broadcasts
    it to place bridge rows.

    Gated on a ONE-scalar probe (max group size — safe to collect at
    any corpus scale; same pattern as ``ngram_jaccard_pairs``): when no
    group exceeds ``max_rows`` — the designed steady state — every
    chunk ordinal is 0, so a literal replaces the row_number window and
    the common case pays neither the window's full-corpus exchange+sort
    nor its extra stages (measured +1.1s per multiprobe call at sf0.1,
    pure overhead when nothing is oversized). Only an actually-
    oversized group set engages the window, and that result is
    checkpointed so every downstream consumer reads it once. Output is
    identical either way — chunk ordinals are all zero when nothing is
    oversized — which is why the static oracle SQL (always the window
    form) stays hash-exact.

    The probe consumes ``df`` once; callers that read ``df`` several
    times afterwards should pass it already materialized."""
    if max_rows is None:
        return df.withColumn("chunk", F.lit(0)), None
    biggest = (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("m"))
        .collect()[0]["m"]
        or 0
    )
    if biggest <= max_rows:
        return df.withColumn("chunk", F.lit(0)), None
    wb = Window.partitionBy(key).orderBy("vec_id")
    chunked = df.withColumn(
        "chunk",
        ((F.row_number().over(wb) - F.lit(1)) / F.lit(max_rows)).cast("int"),
    ).localCheckpoint()  # eager: reads the caller's already-cached
    # input, so this one cheap job pins the window result for every
    # downstream consumer on the rare oversized path
    counts = (
        chunked.groupBy(key)
        .agg(F.max("chunk").alias("max_chunk"))
        .filter(F.col("max_chunk") > 0)
    )  # reads the checkpoint; small by construction (oversized groups
    # are the pathological few the guardrail exists for)
    return chunked, counts


def _materialize_once(df: DataFrame) -> DataFrame:
    """Shared hash+norm materialization for the near-dup family: lazy
    local checkpoint, so the guardrail's one-scalar probe — the first
    action — computes and stores the blocks in its own job and every
    downstream consumer (join sides / the blas groupBy) reads them.

    Deliberately NOT ``persist()``: a cached DataFrame pins a
    CacheManager entry until an explicit unpersist, and these functions
    return lazy results — a long-lived session calling them repeatedly
    (the 114-query bench loop does, five times per pass) would
    accumulate a full hashed-corpus copy per call. localCheckpoint
    blocks are GC-tied: they free when the returned plan is dropped.
    The trade is severed lineage — executor loss during the one action
    fails the query instead of recomputing; at cluster scale swap in a
    reliable ``checkpoint()`` (see the module note above) if that
    matters more than memory."""
    return df.localCheckpoint(eager=False)


def _with_bridge_rows(
    df: DataFrame,
    targets: list[tuple],
    out_group: str,
    counts: DataFrame | None,
) -> DataFrame:
    """Explode each row into its candidate (group, chunk) placements
    for the blas kernel, implementing the guardrail's zero-chunk
    bridge admission (see :func:`embedding_neardup_pairs`).

    ``targets`` is ``[(group expression, is_home), ...]`` — one entry
    ``[(own bucket, True)]`` for the plain LSH/cell paths, identity +
    NBITS flip probes for multi-probe. Every placement carries the
    row's chunk ordinal. When ``counts`` (the oversized-group list
    from :func:`_attach_chunk`) is given, each CHUNK-0 row is
    additionally replicated into chunks 1..max_chunk of every
    oversized target it probes, as BRIDGE rows (``is_bridge``) — the
    bounded inversion: every (group, k) kernel group holds its own
    <= max_rows home rows plus at most ``max_rows x len(targets)``
    bridge copies, never a whole funneled group (funneling the
    chunk>=1 rows into chunk 0 instead would rebuild the unbounded
    matrix the guardrail exists to prevent)."""
    classic = [
        F.struct(
            t.cast("bigint").alias("g"),
            F.col("chunk").alias("c"),
            F.lit(bool(is_home)).alias("h"),
        )
        for t, is_home in targets
    ]
    placed = (
        df.select("vec_id", "embedding", "nrm", F.explode(F.array(*classic)).alias("p"))
        .select(
            "vec_id",
            "embedding",
            "nrm",
            F.col("p.g").alias(out_group),
            F.col("p.c").alias("chunk"),
            F.col("p.h").alias("is_home"),
            F.lit(False).alias("is_bridge"),
        )
    )
    if counts is None:
        return placed
    key_col = [c for c in counts.columns if c != "max_chunk"][0]
    bridges = (
        df.filter(F.col("chunk") == 0)
        .select(
            "vec_id",
            "embedding",
            "nrm",
            F.explode(
                F.array(*[t.cast("bigint") for t, _ in targets])
            ).alias(out_group),
        )
        # broadcast: counts lists only the oversized groups, small by
        # construction — the join prunes bridge copies to the targets
        # that actually have nonzero chunks
        .join(
            F.broadcast(counts.withColumnRenamed(key_col, out_group)),
            out_group,
        )
        .select(
            "vec_id",
            "embedding",
            "nrm",
            out_group,
            F.explode(
                F.sequence(F.lit(1), F.col("max_chunk"))
            ).alias("chunk"),
            F.lit(False).alias("is_home"),
            F.lit(True).alias("is_bridge"),
        )
    )
    return placed.unionByName(bridges)


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    pair_kernel: str = "expr",
    max_bucket: int | None = 4096,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH-bucketed candidate
    generation (same-bucket only — no all-pairs) + exact cosine verify.

    The embedding analogue of MinHash dedup: at 100 TB the bucket join
    bounds candidates; raise NBITS / add multi-probe for recall.

    ``max_bucket`` is the mega-bucket guardrail (semantic dedup's
    ``max_cell`` twin, applied identically to BOTH kernels so their
    outputs stay row-identical): buckets above it split into
    contiguous vec_id chunks and a pair is admitted when the two rows
    share a chunk ordinal OR either row sits in chunk 0 (the
    ZERO-CHUNK BRIDGE) — so every row still pairs with the group's
    first ``max_bucket`` rows and only pairs between two different
    non-zero chunks are dropped (the documented recall loss). Volume
    stays linear: chunk-equal pairs cost ~max_bucket x group size and
    the bridge at most doubles that — never the unchunked quadratic.
    The production lever remains raising NBITS.

    ``pair_kernel`` follows :func:`semantic_neardup_pairs`: ``"expr"``
    (default) verifies each candidate pair with the oracle-exact
    Catalyst fold; ``"blas"`` groups by (bucket, chunk) through
    ``applyInPandas`` and verifies with a row-blocked matmul —
    row-identical output, per-pair cost amortized into BLAS."""
    if pair_kernel not in ("expr", "blas"):
        raise ValueError(
            f"pair_kernel must be 'expr' or 'blas', got {pair_kernel!r}"
        )
    with_bucket = spread(embeddings).withColumn(
        "bucket", _bucket(F.col("embedding"))
    ).withColumn(
        "nrm", _norm(F.col("embedding"))
    )
    with_bucket = _materialize_once(with_bucket)
    with_bucket, counts = _attach_chunk(with_bucket, "bucket", max_bucket)
    if pair_kernel == "blas":
        rows = with_bucket.select(
            "vec_id", "embedding", "nrm", "bucket", "chunk"
        )
        if counts is not None:
            # bridge rows let chunk-0 rows meet every chunk; the
            # kernel's emission rule keeps pairs exactly-once
            rows = _with_bridge_rows(
                rows, [(F.col("bucket"), True)], "bucket", counts
            )
            return _grouped_blas_pairs(
                rows,
                ["bucket", "chunk"],
                threshold,
                None,
                "embedding near-dup",
                home_col="is_home",
                bridge_col="is_bridge",
            )
        return _grouped_blas_pairs(
            rows, ["bucket", "chunk"], threshold, None, "embedding near-dup"
        )
    a = with_bucket.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        F.col("bucket"),
        F.col("chunk"),
        F.col("nrm").alias("nrm_a"),
    )
    b = with_bucket.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        F.col("bucket").alias("bucket_b"),
        F.col("chunk").alias("chunk_b"),
        F.col("nrm").alias("nrm_b"),
    )
    sim = _dot(F.col("emb_a"), F.col("emb_b")) / (
        F.col("nrm_a") * F.col("nrm_b")
    )
    base = (F.col("bucket") == F.col("bucket_b")) & (
        F.col("vec_a") < F.col("vec_b")
    )
    # zero-chunk bridge as a UNION of equi-joins, never an OR on the
    # join condition: an OR would demote chunk from the join key to a
    # residual predicate and an oversized bucket would pay O(|B|^2)
    # condition evaluations; each union arm keeps at least one side
    # bounded at max_bucket rows per key, so the work IS the admitted
    # volume. The disjuncts are disjoint (0-0 pairs only in the
    # chunk-equal arm), so no dedup pass is needed.
    cand = a.join(b, base & (F.col("chunk") == F.col("chunk_b")))
    if counts is not None:
        cand = cand.unionByName(
            a.filter(F.col("chunk") == 0).join(
                b.filter(F.col("chunk_b") > 0), base
            )
        ).unionByName(
            a.filter(F.col("chunk") > 0).join(
                b.filter(F.col("chunk_b") == 0), base
            )
        )
    return (
        cand.select("vec_a", "vec_b", F.round(sim, 4).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
        .orderBy("vec_a", "vec_b")
    )


def embedding_neardup_oracle(
    threshold: float = 0.95, max_bucket: int | None = 4096
) -> str:
    proj_terms = []
    for b in range(NBITS):
        proj_terms.append(
            f"CASE WHEN list_sum(list_transform(generate_series(0, {DIM - 1}), "
            f"i -> (embedding[i+1])::DOUBLE * "
            f"(CASE WHEN ('0x' || substr(md5('{b}:' || i::VARCHAR), 1, 1))::INT % 2 = 0 "
            f"THEN 1.0 ELSE -1.0 END))) >= 0 THEN {1 << b} ELSE 0 END"
        )
    bucket_expr = " + ".join(proj_terms)
    dot = (
        "list_sum(list_transform(generate_series(1, {d}), "
        "i -> (({a}[i])::DOUBLE * ({b}[i])::DOUBLE)))"
    )
    aa = dot.format(d=DIM, a="a.embedding", b="a.embedding")
    bb = dot.format(d=DIM, a="b.embedding", b="b.embedding")
    ab = dot.format(d=DIM, a="a.embedding", b="b.embedding")
    chunk = (
        f"(ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY vec_id) - 1) "
        f"// {max_bucket}"
        if max_bucket is not None
        else "0"
    )
    return f"""
WITH raw_bucketed AS (
  SELECT vec_id, embedding, ({bucket_expr}) AS bucket FROM embeddings
), bucketed AS (
  SELECT vec_id, embedding, bucket, {chunk} AS chunk FROM raw_bucketed
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND({ab} / (sqrt({aa}) * sqrt({bb})), 4) AS cosine
FROM bucketed a JOIN bucketed b
  ON a.bucket = b.bucket
 AND (a.chunk = b.chunk OR a.chunk = 0 OR b.chunk = 0)
 AND a.vec_id < b.vec_id
WHERE ROUND({ab} / (sqrt({aa}) * sqrt({bb})), 4) >= {threshold}
ORDER BY vec_a, vec_b
"""


def _bucket_sql(src_alias: str = "") -> str:
    """DuckDB expression recomputing _bucket()'s sign-random-projection
    id (identical md5-parity hyperplanes)."""
    col = f"{src_alias}embedding"
    terms = []
    for b in range(NBITS):
        terms.append(
            f"CASE WHEN list_sum(list_transform(generate_series(0, {DIM - 1}), "
            f"i -> ({col}[i+1])::DOUBLE * "
            f"(CASE WHEN ('0x' || substr(md5('{b}:' || i::VARCHAR), 1, 1))::INT % 2 = 0 "
            f"THEN 1.0 ELSE -1.0 END))) >= 0 THEN {1 << b} ELSE 0 END"
        )
    return " + ".join(terms)


def incremental_embedding_neardup(
    corpus: DataFrame,
    increment: DataFrame,
    threshold: float = 0.95,
    max_bucket: int | None = None,
    corpus_buckets: DataFrame | None = None,
    multiprobe: bool = False,
) -> DataFrame:
    """Embedding-cosine admission report for a new batch of vectors
    against the existing corpus — the vector twin of
    ``minhash.incremental_near_duplicates``: per increment vec_id, the
    number of corpus vectors sharing its LSH bucket (``n_candidates``),
    the best exact cosine among them (``best_cosine``, NULL when no
    candidate), and ``is_new`` (1 = nothing at/above ``threshold``).

    Admission cost is ∝ |increment|, never a corpus re-index: pass
    ``corpus_buckets`` — the precomputed corpus side
    (vec_id, embedding, bucket, nrm), at 100 TB a table stored
    BUCKETED on ``bucket`` (operators/bucketing.py) so the probe join
    shuffles only the batch — and each admission pays the batch's own
    bucketing + one equi-join probe + exact-cosine verification of the
    candidates (the vectors ride the index rows: an IVF-style posting
    list, no second fetch). ``max_bucket`` drops degenerate CORPUS
    buckets (the mega-bucket guardrail, identical policy to
    ``embedding_neardup_pairs``'s chunking but admission only needs
    drop-or-probe, not pair chunking).

    ``multiprobe=True`` is the recall knob of
    :func:`multiprobe_neardup_pairs` applied to admission: each batch
    vector ALSO probes the NBITS corpus buckets one hyperplane flip
    away (Hamming-1), as an explode into 1+NBITS equi-join probe keys —
    never a bit_count(xor) theta-join against the corpus. Every
    (vector, corpus-row) candidate is reachable through exactly one
    probe (the identity if buckets are equal, the single matching flip
    otherwise), so candidate counts stay exact without a dedup pass;
    volume is (1+NBITS) x the single-bucket volume.
    """
    if corpus_buckets is None:
        # the index feeds the bucket-size agg (when capped) AND the
        # probe join — materialize once, not once per consumer
        corpus_buckets = _materialize_once(
            spread(corpus).select(
                F.col("vec_id").alias("corpus_id"),
                F.col("embedding").alias("c_emb"),
                _bucket(F.col("embedding")).alias("bucket"),
                _norm(F.col("embedding")).alias("c_nrm"),
            )
        )
    cb = corpus_buckets
    if max_bucket is not None:
        sizes = cb.groupBy("bucket").agg(
            F.count(F.lit(1)).alias("_bucket_rows")
        )
        cb = cb.join(
            F.broadcast(sizes.filter(F.col("_bucket_rows") > max_bucket)),
            ["bucket"],
            "left_anti",
        )
    ib = spread(increment).select(
        "vec_id",
        F.col("embedding").alias("q_emb"),
        _bucket(F.col("embedding")).alias("bucket"),
        _norm(F.col("embedding")).alias("q_nrm"),
    )
    if multiprobe:
        probes = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << b)).cast("bigint")
                for b in range(NBITS)
            ],
        )
        ib = ib.select(
            "vec_id", "q_emb", "q_nrm", F.explode(probes).alias("bucket")
        )
    sim = F.round(
        _dot(F.col("q_emb"), F.col("c_emb"))
        / (F.col("q_nrm") * F.col("c_nrm")),
        4,
    )
    per_vec = (
        ib.join(cb, "bucket")
        .select(
            "vec_id",
            sim.alias("cos"),
            (sim >= F.lit(threshold)).cast("int").alias("dup"),
        )
        .groupBy("vec_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
            F.max("cos").alias("best_cosine"),
            F.max("dup").alias("any_dup"),
        )
    )
    return (
        increment.select("vec_id")
        # batch-sized on both sides (per_vec ⊆ increment): shuffled hash
        # join — never a sort, never a broadcast whose safety depends on
        # the batch size (same posture as the MinHash admission twin)
        .join(per_vec.hint("shuffle_hash"), "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce("n_candidates", F.lit(0)).cast("bigint").alias(
                "n_candidates"
            ),
            F.col("best_cosine"),
            (F.coalesce("any_dup", F.lit(0)) == 0).cast("bigint").alias(
                "is_new"
            ),
        )
        .orderBy("vec_id")
    )


def incremental_embedding_oracle(
    threshold: float = 0.95, max_bucket: int | None = None,
    multiprobe: bool = False,
) -> str:
    """Oracle for incremental_embedding_neardup over the embeddings
    table split by vec_id % 3 (corpus = remainder != 0, increment = 0 —
    the documents-side incremental queries use the same split).
    ``multiprobe`` widens the candidate condition to Hamming distance
    <= 1 between bucket ids (a theta-join is fine oracle-side)."""
    dot = (
        "list_sum(list_transform(generate_series(1, {d}), "
        "i -> (({a}[i])::DOUBLE * ({b}[i])::DOUBLE)))"
    )
    qq = dot.format(d=DIM, a="i.embedding", b="i.embedding")
    cc = dot.format(d=DIM, a="c.embedding", b="c.embedding")
    qc = dot.format(d=DIM, a="i.embedding", b="c.embedding")
    cap = (
        f", capped AS (SELECT * FROM cb WHERE bucket IN "
        f"(SELECT bucket FROM cb GROUP BY bucket "
        f"HAVING COUNT(*) <= {max_bucket}))"
        if max_bucket is not None
        else ", capped AS (SELECT * FROM cb)"
    )
    return f"""
WITH corpus AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 3 <> 0
), inc AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 3 = 0
), cb AS (
  SELECT vec_id, embedding, ({_bucket_sql()}) AS bucket FROM corpus
), ibx AS (
  SELECT vec_id, embedding, ({_bucket_sql()}) AS bucket FROM inc
){cap},
v AS (
  SELECT i.vec_id,
    ROUND({qc} / (sqrt({qq}) * sqrt({cc})), 4) AS cos
  FROM ibx i JOIN capped c
    ON {"bit_count(xor(i.bucket, c.bucket)) <= 1" if multiprobe
        else "i.bucket = c.bucket"}
),
agg AS (
  SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_candidates,
    MAX(cos) AS best_cosine,
    MAX(CASE WHEN cos >= {threshold} THEN 1 ELSE 0 END) AS any_dup
  FROM v GROUP BY vec_id
)
SELECT inc.vec_id,
  CAST(COALESCE(n_candidates, 0) AS BIGINT) AS n_candidates,
  best_cosine,
  CAST(CASE WHEN COALESCE(any_dup, 0) = 0 THEN 1 ELSE 0 END AS BIGINT)
    AS is_new
FROM inc LEFT JOIN agg ON inc.vec_id = agg.vec_id
ORDER BY inc.vec_id
"""


def vector_admission_rounds_oracle(
    threshold: float = 0.3, rounds: int = 3
) -> str:
    """Oracle for the VECTOR-mode streaming admission gate
    (streaming/admission.py, mode="vector") drained over ``rounds``
    deterministic batches (embeddings split by vec_id % rounds, fed in
    remainder order): the final corpus is the chained fixpoint

        c_0 = batch_0
        c_i = c_{i-1} ∪ {v ∈ batch_i with no same-bucket corpus vector
                          at cosine >= threshold}

    — the embedding twin of minhash.admission_rounds_oracle, with the
    operator's exact rounded-cosine compare."""
    dot = (
        "list_sum(list_transform(generate_series(1, {d}), "
        "x -> (({a}[x])::DOUBLE * ({b}[x])::DOUBLE)))"
    )
    qq = dot.format(d=DIM, a="i.embedding", b="i.embedding")
    cc = dot.format(d=DIM, a="c.embedding", b="c.embedding")
    qc = dot.format(d=DIM, a="i.embedding", b="c.embedding")
    parts = [
        f"b{i} AS (SELECT vec_id, embedding FROM embeddings "
        f"WHERE vec_id % {rounds} = {i})"
        for i in range(rounds)
    ]
    parts.append("c0 AS (SELECT vec_id, embedding FROM b0)")
    for i in range(1, rounds):
        s = str(i)
        parts += [
            f"""cb{s} AS (
    SELECT vec_id, embedding, ({_bucket_sql()}) AS bucket FROM c{i - 1}
  )""",
            f"""ib{s} AS (
    SELECT vec_id, embedding, ({_bucket_sql()}) AS bucket FROM b{i}
  )""",
            f"""dup{s} AS (
    SELECT DISTINCT i.vec_id
    FROM ib{s} i JOIN cb{s} c ON i.bucket = c.bucket
    WHERE ROUND({qc} / (sqrt({qq}) * sqrt({cc})), 4) >= {threshold}
  )""",
            f"""c{s} AS (
    SELECT vec_id, embedding FROM c{i - 1}
    UNION ALL
    SELECT vec_id, embedding FROM b{i}
    WHERE vec_id NOT IN (SELECT vec_id FROM dup{s})
  )""",
        ]
    return (
        "WITH "
        + ",\n  ".join(parts)
        + f"\nSELECT vec_id FROM c{rounds - 1} ORDER BY vec_id"
    )


def multiprobe_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    pair_kernel: str = "expr",
    max_bucket: int | None = 4096,
) -> DataFrame:
    """Multi-probe variant of :func:`embedding_neardup_pairs`: pairs
    whose buckets are EQUAL or exactly one hyperplane flip apart
    (Hamming-1) — the standard recall knob for sign-LSH; a near-dup
    pair straddling one low-margin hyperplane lands one bit away and
    the plain bucket join misses it.

    Scale shape: side A explodes into 1+NBITS probe keys so the
    candidate step stays an EQUI-join on the bucket id — never a
    bit_count(xor) theta-join against the corpus. Candidate volume is
    (1+NBITS) x the single-bucket volume; NBITS remains the lever. No
    dedup pass is needed: a same-bucket pair is reachable only through
    the identity probe and a Hamming-1 pair only through its single
    matching flip, so every pair arrives exactly once.

    ``max_bucket`` is the mega-bucket guardrail, the same knob as
    :func:`embedding_neardup_pairs` and computed the same way — on the
    NON-exploded row, from its position within its HOME bucket — so the
    probe fan-out cannot amplify a hot bucket quadratically: a pair is
    admitted when the rows share a chunk ordinal OR either row is in
    chunk 0 of its bucket (the zero-chunk bridge — chunk ordinals from
    DIFFERENT home buckets have no semantic relation, so without the
    bridge every chunk>=1 row of a hot bucket would lose ALL its
    Hamming-1 pairs with normal-sized neighbors). Any join key's
    candidate volume stays ~(1+NBITS) x max_bucket x bucket size —
    linear, never the unchunked quadratic. Buckets under max_bucket
    (the designed state; chunk ordinal 0 everywhere) are unaffected;
    pairs between two different non-zero chunks are the documented
    recall loss, and raising NBITS remains the production lever.

    ``pair_kernel="blas"`` verifies candidates with the shared
    row-blocked matmul: every row lands in its home (bucket, chunk)
    group plus NBITS probe groups, and chunk-0 rows are additionally
    replicated into the nonzero chunks of every OVERSIZED target they
    probe (bridge copies — bounding each kernel group at
    ~(2 + NBITS) x max_bucket rows); the exactly-once rule is the
    kernel's emission logic (see :func:`_grouped_blas_pairs`) — the
    blas mirror of the join's one-sided explode. Row-identical
    output."""
    if pair_kernel not in ("expr", "blas"):
        raise ValueError(
            f"pair_kernel must be 'expr' or 'blas', got {pair_kernel!r}"
        )
    with_bucket = spread(embeddings).withColumn(
        "bucket", _bucket(F.col("embedding"))
    ).withColumn(
        "nrm", _norm(F.col("embedding"))
    )
    # hash+norm materialize ONCE (see _materialize_once); the guardrail
    # probe and both join sides (or the probe-group explode) read it
    with_bucket = _materialize_once(with_bucket)
    with_bucket, counts = _attach_chunk(with_bucket, "bucket", max_bucket)
    probe_targets = [(F.col("bucket"), True)] + [
        (F.col("bucket").bitwiseXOR(F.lit(1 << b)), False)
        for b in range(NBITS)
    ]
    if pair_kernel == "blas":
        placed = _with_bridge_rows(
            with_bucket.select("vec_id", "embedding", "nrm", "bucket", "chunk"),
            probe_targets,
            "probe_bucket",
            counts,
        )
        return _grouped_blas_pairs(
            placed,
            ["probe_bucket", "chunk"],
            threshold,
            None,
            "multi-probe near-dup",
            home_col="is_home",
            bridge_col="is_bridge" if counts is not None else None,
        )
    probes = F.array(
        F.col("bucket"),
        *[
            F.col("bucket").bitwiseXOR(F.lit(1 << b)).cast("bigint")
            for b in range(NBITS)
        ],
    )
    a = with_bucket.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
        F.col("chunk").alias("chunk_a"),
        F.explode(probes).alias("probe_bucket"),
    )
    b = with_bucket.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        F.col("bucket").alias("bucket_b"),
        F.col("chunk").alias("chunk_b"),
        F.col("nrm").alias("nrm_b"),
    )
    sim = _dot(F.col("emb_a"), F.col("emb_b")) / (
        F.col("nrm_a") * F.col("nrm_b")
    )
    base = (F.col("probe_bucket") == F.col("bucket_b")) & (
        F.col("vec_a") < F.col("vec_b")
    )
    # zero-chunk bridge as a UNION of equi-joins (see
    # embedding_neardup_pairs): keeping chunk in the equi-key of the
    # chunk-equal arm and bounding one side of each bridge arm at
    # max_bucket rows per key is what keeps a hot bucket linear
    cand = a.join(b, base & (F.col("chunk_a") == F.col("chunk_b")))
    if counts is not None:
        cand = cand.unionByName(
            a.filter(F.col("chunk_a") == 0).join(
                b.filter(F.col("chunk_b") > 0), base
            )
        ).unionByName(
            a.filter(F.col("chunk_a") > 0).join(
                b.filter(F.col("chunk_b") == 0), base
            )
        )
    return (
        cand.select("vec_a", "vec_b", F.round(sim, 4).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
        .orderBy("vec_a", "vec_b")
    )


def multiprobe_neardup_oracle(
    threshold: float = 0.95, max_bucket: int | None = 4096
) -> str:
    proj_terms = []
    for b in range(NBITS):
        proj_terms.append(
            f"CASE WHEN list_sum(list_transform(generate_series(0, {DIM - 1}), "
            f"i -> (embedding[i+1])::DOUBLE * "
            f"(CASE WHEN ('0x' || substr(md5('{b}:' || i::VARCHAR), 1, 1))::INT % 2 = 0 "
            f"THEN 1.0 ELSE -1.0 END))) >= 0 THEN {1 << b} ELSE 0 END"
        )
    bucket_expr = " + ".join(proj_terms)
    dot = (
        "list_sum(list_transform(generate_series(1, {d}), "
        "i -> (({a}[i])::DOUBLE * ({b}[i])::DOUBLE)))"
    )
    aa = dot.format(d=DIM, a="a.embedding", b="a.embedding")
    bb = dot.format(d=DIM, a="b.embedding", b="b.embedding")
    ab = dot.format(d=DIM, a="a.embedding", b="b.embedding")
    chunk = (
        f"(ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY vec_id) - 1) "
        f"// {max_bucket}"
        if max_bucket is not None
        else "0"
    )
    probe_list = ", ".join(
        ["bucket"] + [f"xor(bucket, {1 << b})" for b in range(NBITS)]
    )
    return f"""
WITH raw_bucketed AS (
  SELECT vec_id, embedding, ({bucket_expr}) AS bucket FROM embeddings
), bucketed AS (
  SELECT vec_id, embedding, bucket, {chunk} AS chunk FROM raw_bucketed
), probed AS (
  SELECT vec_id, embedding, chunk, UNNEST([{probe_list}]) AS probe_bucket
  FROM bucketed
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND({ab} / (sqrt({aa}) * sqrt({bb})), 4) AS cosine
FROM probed a JOIN bucketed b
  ON a.probe_bucket = b.bucket
 AND (a.chunk = b.chunk OR a.chunk = 0 OR b.chunk = 0)
 AND a.vec_id < b.vec_id
WHERE ROUND({ab} / (sqrt({aa}) * sqrt({bb})), 4) >= {threshold}
ORDER BY vec_a, vec_b
"""


def ann_lsh_topk_oracle(n_queries: int = 8, k: int = 5) -> str:
    proj_terms = []
    for b in range(NBITS):
        term = (
            f"CASE WHEN list_sum(list_transform(generate_series(0, {DIM - 1}), "
            f"i -> (embedding[i+1])::DOUBLE * "
            f"(CASE WHEN ('0x' || substr(md5('{b}:' || i::VARCHAR), 1, 1))::INT % 2 = 0 "
            f"THEN 1.0 ELSE -1.0 END))) >= 0 THEN {1 << b} ELSE 0 END"
        )
        proj_terms.append(term)
    bucket_expr = " + ".join(proj_terms)
    dot = (
        "list_sum(list_transform(generate_series(1, {d}), "
        "i -> (({a}[i])::DOUBLE * ({b}[i])::DOUBLE)))"
    )
    qq = dot.format(d=DIM, a="q.embedding", b="q.embedding")
    cc = dot.format(d=DIM, a="c.embedding", b="c.embedding")
    qc = dot.format(d=DIM, a="q.embedding", b="c.embedding")
    return f"""
WITH bucketed AS (
  SELECT vec_id, embedding, ({bucket_expr}) AS bucket FROM embeddings
), scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         {qc} / (sqrt({qq}) * sqrt({cc})) AS raw
  FROM bucketed q JOIN bucketed c
    ON q.bucket = c.bucket AND q.vec_id < {n_queries}
   AND q.vec_id <> c.vec_id
), ranked AS (
  SELECT query_id, cand_id, ROUND(raw, 4) AS cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY raw DESC, cand_id) AS rank
  FROM scored
)
SELECT query_id, cand_id, cosine, rank FROM ranked
WHERE rank <= {k} ORDER BY query_id, rank
"""


# --- IVF (inverted-file) ANN: the coarse-quantizer scale path ---------------

N_CENTROIDS = 16
N_PROBE = 2


def _seed_centroids(
    embeddings: DataFrame, n_centroids: int
) -> list[tuple[int, list[float]]]:
    """Driver-held seed centroids: the first ``n_centroids`` vectors —
    a deterministic coarse quantizer (production IVF trains k-means on
    a sample; the routing plan is identical either way). A bounded
    probe, same class as the k-means trainer's per-round collect."""
    rows = embeddings.filter(F.col("vec_id") < n_centroids).select(
        "vec_id", "embedding"
    ).collect()
    return sorted(
        (int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in rows
    )


def _np_float_dist_fn(cents: list[tuple[int, list[float]]]):
    """(ids, f) float twin of :func:`_np_dist_matrix_fn` for the
    seeded-IVF path, where distances are raw-embedding doubles and
    the SQL oracle evaluates a LEFT-TO-RIGHT fold: ``f`` accumulates
    dimension-sequentially (vectorized across rows, ordered across
    dims), reproducing the fold's exact IEEE sequence so float
    distances — and the (dist, cent_id) orderings built on them —
    hash-match the oracle. A blocked matmul would be faster but its
    pairwise accumulation could flip near-tied cell routings."""
    import numpy as np

    ids = np.array([cid for cid, _ in cents], dtype=np.int64)
    C = np.array([c for _, c in cents], dtype=np.float64)  # (k, dim)

    def f(M):  # (n, dim) float64 -> (n, k) float64
        d = np.zeros((M.shape[0], C.shape[0]))
        for i in range(C.shape[1]):
            diff = M[:, i : i + 1] - C[None, :, i]
            d += diff * diff
        return d

    return ids, f


def _float_dists(emb: Column, cents: list[tuple[int, list[float]]]) -> Column:
    """Per-centroid float distance array (ascending cent_id order) as
    an Arrow kernel — see :func:`_np_float_dist_fn` for the ordering
    contract and :func:`_kmeans_dists` for why a kernel beats the
    interpreted expression fold."""
    if not cents:
        return F.array().cast("array<double>")
    import numpy as np
    import pandas as pd

    _, dist_fn = _np_float_dist_fn(cents)

    @F.pandas_udf("array<double>")
    def dists(s):
        if not len(s):
            return pd.Series([], dtype=object)
        d = dist_fn(np.stack(s.to_numpy()).astype(np.float64))
        return pd.Series(list(d))

    return dists(emb)


def _float_argmin_cell(
    emb: Column, cents: list[tuple[int, list[float]]]
) -> Column:
    """Nearest seed centroid id (ties -> lower cent_id, numpy argmin
    first-index over the ascending-id matrix — the (dist, cent_id)
    row_number rule)."""
    if not cents:
        return F.lit(None).cast("bigint")
    import numpy as np
    import pandas as pd

    ids, dist_fn = _np_float_dist_fn(cents)

    @F.pandas_udf("bigint")
    def argmin(s):
        if not len(s):
            return pd.Series([], dtype="int64")
        d = dist_fn(np.stack(s.to_numpy()).astype(np.float64))
        return pd.Series(ids[d.argmin(axis=1)])

    return argmin(emb)


def ivf_assign(
    embeddings: DataFrame, n_centroids: int = N_CENTROIDS
) -> DataFrame:
    """Route every vector to its nearest centroid cell (the inverted
    file) — a pure scan-stage projection against the driver-held seed
    centroids (no crossJoin, no corpus x k window; the same shape as
    the trained path)."""
    cents = _seed_centroids(embeddings, n_centroids)
    return spread(embeddings).select(
        "vec_id",
        "embedding",
        _float_argmin_cell(F.col("embedding"), cents).alias("cent_id"),
    )


def ivf_topk(
    embeddings: DataFrame,
    n_queries: int = 8,
    k: int = 5,
    n_centroids: int = N_CENTROIDS,
    n_probe: int = N_PROBE,
) -> DataFrame:
    """IVF ANN top-k: probe the ``n_probe`` nearest cells per query,
    exact cosine re-rank within the probed cells.

    At 100 TB the inverted file is the partitioning: cells are disjoint
    (each vector lives in exactly one), so probing is an equi-join on
    cent_id touching corpus*n_probe/n_centroids rows per query — no
    all-pairs, and candidate sets need no dedup across probed cells.
    Both sides route cells as projections against the driver-held seed
    centroids (the trained path's shape): no crossJoin, and the probe
    ranking window runs over n_queries x k rows, never the corpus.
    """
    cents = _seed_centroids(embeddings, n_centroids)
    assign = spread(embeddings).select(
        "vec_id",
        "embedding",
        _float_argmin_cell(F.col("embedding"), cents).alias("cent_id"),
    )
    ids = _cell_ids_expr(cents)
    wp = Window.partitionBy("vec_id").orderBy("dist", "cent_id")
    probe = (
        embeddings.filter(F.col("vec_id") < n_queries)
        .select(
            "vec_id",
            "embedding",
            _norm(F.col("embedding")).alias("nrm"),
            F.posexplode(_float_dists(F.col("embedding"), cents)).alias(
                "pos", "dist"
            ),
        )
        .select(
            "vec_id",
            "embedding",
            "nrm",
            "dist",
            F.element_at(ids, F.col("pos") + 1).alias("cent_id"),
        )
        .withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") <= n_probe)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("nrm").alias("q_nrm"),
            "cent_id",
        )
    )
    sim = _dot(F.col("q_emb"), F.col("c_emb")) / (
        F.col("q_nrm") * F.col("c_nrm")
    )
    scored = (
        F.broadcast(probe)
        .join(
            assign.select(
                F.col("vec_id").alias("cand_id"),
                F.col("embedding").alias("c_emb"),
                _norm(F.col("embedding")).alias("c_nrm"),
                "cent_id",
            ),
            "cent_id",
        )
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id", "cand_id", F.round(sim, 4).alias("cosine"),
            sim.alias("_raw"),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(F.col("_raw").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
        .orderBy("query_id", "rank")
    )


def kmeans_cells(
    embeddings: DataFrame,
    k: int = 8,
    iterations: int = 2,
    scale: int = 10000,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Deterministic integer Lloyd k-means: the coarse-quantizer TRAINER
    the IVF path assumes (production IVF trains k-means on a sample —
    ivf_assign's docstring; this is that trainer, runnable in-engine).

    All arithmetic is on scale-quantized BIGINT components: seed
    centroids are the first ``k`` vectors, each round assigns every
    vector to its nearest centroid by integer squared-L2 (ties -> lower
    cell id) and recomputes centroids as the element-wise integer mean
    (truncating division — identical semantics in Spark's ``div`` and
    DuckDB's ``//``). Integer math makes the fixpoint partition-order
    independent and bit-identical across engines — the reason this is
    hash-verifiable where float k-means is not; the float path would
    run the same plan.

    Scale: per round, ONE corpus scan — assignment is a pure
    projection (a vectorized Arrow argmin kernel against the
    driver-held centroid matrix; no crossJoin, no window, no corpus
    shuffle of any kind — see :func:`_kmeans_dists` for why numpy
    beats a Catalyst expression fold here) — followed by one
    posexplode aggregation whose exchange carries k x DIM rows after
    map-side partial aggregation. State between rounds is the k-row
    centroid set, COLLECTED to the driver (a bounded probe, k <=
    hundreds — the same class as the vocab LIMIT in llm/dedup.py) and
    shipped back inside the kernel closure; executor loss can never
    lose training state. ``checkpoint_dir`` selects reliable vs local
    checkpointing for the one materialized artifact that remains, the
    quantized-vector sketch (see :func:`_truncator`).
    """
    q, cents = _kmeans_train(embeddings, k, iterations, scale, checkpoint_dir)
    return (
        q.select("vec_id", _kmeans_argmin_struct(F.col("q"), cents).alias("s"))
        .select(
            "vec_id",
            F.col("s.cell").alias("cell"),
            F.col("s.dist").alias("dist"),
        )
        .orderBy("vec_id")
    )


def _quantize_expr(emb: Column, scale: int) -> Column:
    return F.transform(
        emb, lambda x: F.round(x.cast("double") * scale).cast("bigint")
    )


def _np_centroids(cents: list[tuple[int, list[int]]]):
    """(ids, matrix) numpy views of a driver-held centroid list —
    ascending cell id, int64 (exact: quantized values and their
    squared distances are far inside int64)."""
    import numpy as np

    ids = np.array([cid for cid, _ in cents], dtype=np.int64)
    mat = np.array([c for _, c in cents], dtype=np.int64)
    return ids, mat


def _np_dist_matrix_fn(cents: list[tuple[int, list[int]]]):
    """The exactness-critical squared-L2 kernel, defined ONCE: returns
    (ids, f) where f maps an Arrow batch's stacked (n, dim) int64
    matrix to the (n, k) integer distance matrix |m|² + |c|² - 2 m·c.
    Both :func:`_kmeans_dists` and :func:`_kmeans_argmin_struct` must
    route cells/probe distances through this same expression —
    ivf_trained_topk consumes both in one query and they may never
    disagree."""
    ids, C = _np_centroids(cents)
    c_sq = (C * C).sum(axis=1)

    def f(M):
        return (M * M).sum(axis=1)[:, None] + c_sq[None, :] - 2 * (M @ C.T)

    return ids, f


def _cell_ids_expr(cents: list[tuple[int, list[int]]]) -> Column:
    """Cell-id literal array in centroid-list order, rendered as one
    parsed SQL string (one py4j call); empty list stays well-typed."""
    if not cents:
        return F.array().cast("array<bigint>")
    return F.expr(
        "array(" + ",".join(f"{int(cid)}L" for cid, _ in cents) + ")"
    )


def _kmeans_dists(qcol: Column, cents: list[tuple[int, list[int]]]) -> Column:
    """Array of integer squared-L2 distances from ``qcol`` to every
    centroid, in centroid-list (ascending cell id) order, computed as
    a vectorized Arrow batch kernel (numpy int64 matmul — exact).

    WHY A PANDAS UDF (the one deliberate exception to the
    built-ins-first rule): the pure-expression alternative — transform
    over a centroid literal array with a zip_with/aggregate fold — is
    an INTERPRETED higher-order lambda, ~O(k x dim) boxed ops per row
    outside whole-stage codegen. Measured on a 32K x 64-dim corpus:
    74s at k=16 and 199s at k=64 for the expression path (cost grows
    linearly with k), vs milliseconds for the numpy kernel (6x faster
    already at k=16, flat in k). Dense linear algebra is exactly the
    workload Arrow batches exist for; the centroid matrix rides the
    closure (k x dim x 8 bytes, <=128 KB at k=256). An empty centroid
    list (empty training corpus) yields a well-typed empty array —
    zero rows after posexplode, null argmin."""
    if not cents:
        return F.array().cast("array<bigint>")
    import numpy as np
    import pandas as pd

    _, dist_matrix = _np_dist_matrix_fn(cents)

    @F.pandas_udf("array<bigint>")
    def dists(s):
        if not len(s):
            return pd.Series([], dtype=object)
        d = dist_matrix(np.stack(s.to_numpy()).astype(np.int64))
        return pd.Series(list(d))

    return dists(qcol)


def _kmeans_argmin_struct(
    qcol: Column, cents: list[tuple[int, list[int]]]
) -> Column:
    """struct<cell, dist> of the nearest centroid, via the same
    vectorized Arrow kernel as :func:`_kmeans_dists` (see its
    docstring for why numpy beats the expression fold here). Ties ->
    lower cell id: the centroid matrix is ascending by cell id and
    ``numpy.argmin`` returns the FIRST index of the minimum — the same
    rule as the former (dist, cell)-ordered row_number. With no
    centroids (empty training corpus) the struct is a typed null —
    the corpus the expression projects over is empty anyway."""
    if not cents:
        return F.lit(None).cast("struct<cell: bigint, dist: bigint>")
    import numpy as np
    import pandas as pd

    ids, dist_matrix = _np_dist_matrix_fn(cents)

    @F.pandas_udf("struct<cell: bigint, dist: bigint>")
    def argmin(s):
        if not len(s):
            return pd.DataFrame({"cell": [], "dist": []}, dtype="int64")
        d = dist_matrix(np.stack(s.to_numpy()).astype(np.int64))
        a = d.argmin(axis=1)
        return pd.DataFrame(
            {"cell": ids[a], "dist": d[np.arange(len(a)), a]}
        )

    return argmin(qcol)


def _kmeans_train(
    embeddings: DataFrame,
    k: int,
    iterations: int,
    scale: int,
    checkpoint_dir: str | None = None,
) -> tuple[DataFrame, list[tuple[int, list[int]]]]:
    """(quantized vectors, trained centroids as a driver-held
    ascending-cell-id list).

    The centroid recompute (``s div n`` truncating mean, pos-sorted
    collect) stays a Spark expression for exact oracle parity; only the
    k result rows are collected per round. Driver-held centroid state
    removes both the per-round sketch materialization and the
    executor-loss exposure the former localCheckpoint chain carried."""
    _truncate = _truncator(embeddings.sparkSession, checkpoint_dir)
    q = _truncate(
        spread(embeddings).select(
            "vec_id", _quantize_expr(F.col("embedding"), scale).alias("q")
        )
    )  # read every round + final assign: materialize once
    cents = sorted(
        (r["vec_id"], list(r["q"]))
        for r in q.filter(F.col("vec_id") < k).collect()
    )
    for _ in range(iterations):
        cell = _kmeans_argmin_struct(F.col("q"), cents)["cell"]
        sums = (
            q.select(cell.alias("cell"), F.posexplode("q").alias("pos", "v"))
            .groupBy("cell", "pos")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        )
        rows = (
            sums.withColumn("m", F.expr("s div n"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda x: x["m"],
                ).alias("c")
            )
            .collect()  # k bounded rows: the whole inter-round state
        )
        cents = sorted((r["cell"], list(r["c"])) for r in rows)
    return q, cents


def _kmeans_oracle_prefix(k: int, iterations: int, scale: int) -> tuple[str, str]:
    """(CTE prefix through the trained centroid table, its CTE name)."""

    def round_ctes(i: int) -> str:
        prev = f"c{i}"
        return f"""p{i} AS (
  SELECT q.vec_id, q.q, {prev}.cell, {_kmeans_oracle_l2(prev)} AS dist
  FROM q CROSS JOIN {prev}
), a{i} AS (
  SELECT vec_id, q, cell FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY dist, cell) AS rn
    FROM p{i}) WHERE rn = 1
), s{i} AS (
  SELECT cell, i.i AS pos, SUM(q[i.i]) AS s, COUNT(*) AS n
  FROM a{i} CROSS JOIN dims i GROUP BY cell, i.i
), c{i + 1} AS (
  SELECT cell, list(CAST(s // n AS BIGINT) ORDER BY pos) AS c
  FROM s{i} GROUP BY cell
)"""

    rounds = ",\n".join(round_ctes(i) for i in range(iterations))
    prefix = f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(round(CAST(x AS DOUBLE) * {scale}) AS BIGINT)) AS q
  FROM embeddings
), dims AS (SELECT unnest(generate_series(1, {DIM})) AS i),
c0 AS (SELECT vec_id AS cell, q AS c FROM q WHERE vec_id < {k}),
{rounds}"""
    return prefix, f"c{iterations}"


def _kmeans_oracle_l2(cent: str) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, {DIM}), "
        f"i -> (q.q[i] - {cent}.c[i]) * (q.q[i] - {cent}.c[i])))"
    )


def kmeans_cells_oracle(
    k: int = 8, iterations: int = 2, scale: int = 10000
) -> str:
    """Unrolled Lloyd rounds as chained CTEs — same integer arithmetic,
    same tie-breaks, so the fixpoint is bit-identical."""
    prefix, last = _kmeans_oracle_prefix(k, iterations, scale)
    return f"""{prefix},
final AS (
  SELECT q.vec_id, {last}.cell, {_kmeans_oracle_l2(last)} AS dist
  FROM q CROSS JOIN {last}
)
SELECT vec_id, cell, CAST(dist AS BIGINT) AS dist FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                               ORDER BY dist, cell) AS rn
  FROM final) WHERE rn = 1 ORDER BY vec_id
"""


def ivf_trained_topk(
    embeddings: DataFrame,
    n_queries: int = 8,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = N_PROBE,
    iterations: int = 2,
    scale: int = 10000,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """IVF ANN over TRAINED cells: the Lloyd-refined quantizer from
    :func:`kmeans_cells` replaces ivf_topk's first-N seed centroids;
    cell routing + n_probe selection use the deterministic integer
    distances, the final re-rank is the exact float cosine over probed
    cells — the full production IVF recipe (train -> route -> probe ->
    re-rank) composed from the same verified pieces. Plan shape is
    identical to ivf_topk: broadcast centroids, disjoint cells, no
    corpus shuffle beyond the training aggregations.
    """
    _, cents = _kmeans_train(
        embeddings, n_centroids, iterations, scale, checkpoint_dir
    )
    # both sides derive their cells as PROJECTIONS over the corpus scan
    # (quantization re-inlined per row — cheap arithmetic beats a
    # vec_id join/shuffle at any scale); no materialized ranking table
    # and no corpus-wide window remain
    qexpr = _quantize_expr(F.col("embedding"), scale)
    cell = _kmeans_argmin_struct(qexpr, cents)["cell"]
    cand = embeddings.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("c_emb"),
        _norm(F.col("embedding")).alias("c_nrm"),
        cell.alias("cell"),
    )
    # probe side: n_queries rows -> explode the per-centroid distance
    # array and rank (dist, cell) per query; the window runs over
    # n_queries x k rows, never the corpus
    ids = _cell_ids_expr(cents)
    wp = Window.partitionBy("vec_id").orderBy("dist", "cell")
    probe = (
        embeddings.filter(F.col("vec_id") < n_queries)
        .select(
            "vec_id",
            "embedding",
            _norm(F.col("embedding")).alias("nrm"),
            F.posexplode(_kmeans_dists(qexpr, cents)).alias("pos", "dist"),
        )
        .select(
            "vec_id",
            "embedding",
            "nrm",
            "dist",
            F.element_at(ids, F.col("pos") + 1).alias("cell"),
        )
        .withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") <= n_probe)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("nrm").alias("q_nrm"),
            "cell",
        )
    )
    sim = _dot(F.col("q_emb"), F.col("c_emb")) / (
        F.col("q_nrm") * F.col("c_nrm")
    )
    scored = (
        F.broadcast(probe)
        .join(cand, "cell")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id", "cand_id", F.round(sim, 4).alias("cosine"),
            sim.alias("_raw"),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("_raw").desc(), F.col("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
        .orderBy("query_id", "rank")
    )


def semantic_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.35,
    n_cells: int = 16,
    iterations: int = 2,
    scale: int = 10000,
    max_cell: int | None = 4096,
    checkpoint_dir: str | None = None,
    pair_kernel: str = "expr",
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs: k-means cell
    blocking + exact cosine within each cell (Abbas et al. 2023,
    arXiv:2303.09540 — public method). The trained integer cells from
    :func:`kmeans_cells` are the blocking key, so candidate volume is
    sum of per-cell squares, never corpus² — the property that makes
    semantic dedup tractable at 100 TB (the paper's clustering step,
    here the same verified trainer the IVF path uses).

    ``max_cell`` is the degenerate-cell guardrail (the twin of
    MinHash's ``max_bucket``): within-cell pair volume is quadratic in
    cell size, so one mega-cell — collapsed embeddings, a fixed k at a
    grown corpus — can dominate the whole join. Cells larger than
    ``max_cell`` are SPLIT into contiguous vec_id-ordered chunks of at
    most ``max_cell`` rows and a pair is admitted when the rows share
    a chunk ordinal OR either row is in chunk 0 (the zero-chunk
    bridge, same rule as :func:`embedding_neardup_pairs`): cost is
    re-bounded at ~2 x max_cell x rows per cell — linear — and only
    pairs between two different non-zero chunks of an oversized cell
    are the (documented) recall loss. SemDeDup's own recipe keeps
    cells small by scaling k with the corpus (~100K clusters in the
    paper) — prefer raising ``n_cells`` (the default 16 targets the
    bench corpora; scale it with rows); the guardrail is the backstop
    when k lags the data. Chunking is a window rank, deterministic and
    engine-identical.

    Per-vector norms are computed once in the materialized cells table
    (norm(v) = sqrt(dot(v,v)) is the same IEEE value per-row or
    per-pair), so the per-pair work is a single dot product.

    The cosine is rounded to 4 decimals BEFORE thresholding so the
    boundary decision is identical across engines (same rule as the
    ANN re-rank oracles).

    The default threshold targets the top similarity tail of the
    driver's SYNTHETIC embeddings (near-orthogonal random vectors, max
    pairwise cosine ~0.51); on real model embeddings the SemDeDup
    operating point is ~0.95+ — pass it explicitly.

    ``pair_kernel`` selects how within-cell cosines are computed:

    - ``"expr"`` (default): a Catalyst fold per candidate pair —
      bit-identical to the DuckDB oracle's left-to-right accumulation,
      so the result is hash-verifiable. Cost is O(dim) INTERPRETED ops
      per candidate pair (higher-order lambdas don't codegen).
    - ``"blas"``: per-(cell, chunk) Arrow groups through
      ``applyInPandas`` — each group's unit vectors form a matrix and
      a row-blocked ``U @ U.T`` emits only above-threshold pairs
      (SemDeDup's own per-cluster recipe; the guardrail's ``max_cell``
      doubles as the matrix bound, 512-row blocks cap peak memory at
      ~512 x max_cell x 8 bytes per task). Measured 5-20x faster on a
      32K-vector corpus. Accumulation order differs from the fold
      (pairwise/SIMD vs sequential), so agreement with the oracle is
      to ~1e-13 relative before the 4-decimal rounding — in practice
      identical output (asserted against the expr twin in
      tests/test_approx_paths.py), but the expr kernel remains the
      oracle-exact default.
    """
    if pair_kernel not in ("expr", "blas"):
        # validate BEFORE the multi-job training phase runs
        raise ValueError(
            f"pair_kernel must be 'expr' or 'blas', got {pair_kernel!r}"
        )
    _, cents = _kmeans_train(embeddings, n_cells, iterations, scale, checkpoint_dir)
    # cell is a projection over the corpus scan (quantization inlined);
    # no assignment join — embedding, norm, and cell come off one pass
    cell = _kmeans_argmin_struct(
        _quantize_expr(F.col("embedding"), scale), cents
    )["cell"]
    # spread() guards the narrow-scan case (metadata-only check): the
    # former always-on chunk window used to hash-partition the corpus
    # as a side effect; without it a single-file scan would leave the
    # argmin projection — and everything downstream — on one task
    assigned = spread(embeddings).select(
        "vec_id",
        "embedding",
        _norm(F.col("embedding")).alias("nrm"),
        cell.alias("cell"),
    )
    # materialize the assignment ONCE (see _materialize_once): the
    # guardrail's one-scalar probe is the first action and stores the
    # blocks in the same job; both self-join sides (or the blas
    # groupBy) then read them instead of re-running the argmin
    # projection
    assigned = _materialize_once(assigned)
    # degenerate-cell guardrail, gated on the max-cell-size probe (see
    # _attach_chunk): the common no-oversized-cell case pays a literal
    # 0 instead of the former always-on row_number window (a corpus
    # exchange+sort per call)
    assigned, counts = _attach_chunk(assigned, "cell", max_cell)
    # with n_cells below the session parallelism the (broadcast)
    # self-join's stream side could otherwise run on few cores and
    # idle the rest — spread it round-robin (result-independent; pairs
    # come from the join condition). At production cell counts
    # (SemDeDup ~100K) this branch never fires.
    par = embeddings.sparkSession.sparkContext.defaultParallelism
    if n_cells < par:
        assigned = assigned.repartition(par)
    if pair_kernel == "blas":
        return _semantic_pairs_blas(assigned, threshold, counts)
    cells = assigned
    a, b = cells.alias("a"), cells.alias("b")
    sim = _dot(F.col("a.embedding"), F.col("b.embedding")) / (
        F.col("a.nrm") * F.col("b.nrm")
    )
    base = (F.col("a.cell") == F.col("b.cell")) & (
        F.col("a.vec_id") < F.col("b.vec_id")
    )

    # zero-chunk bridge as a UNION of equi-joins (see
    # embedding_neardup_pairs): chunk stays in the equi-key of the
    # chunk-equal arm; each bridge arm has its chunk-0 side bounded at
    # max_cell rows per cell. The self-join sides share column names,
    # so each arm projects its output BEFORE the union.
    def _arm(ad: DataFrame, bd: DataFrame, chunk_equal: bool) -> DataFrame:
        cond = (
            base & (F.col("a.chunk") == F.col("b.chunk"))
            if chunk_equal
            else base
        )
        return ad.join(bd, cond).select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.cell").alias("cell"),
            F.round(sim, 4).alias("cosine"),
        )

    cand = _arm(a, b, True)
    if counts is not None:
        a0 = cells.filter(F.col("chunk") == 0).alias("a")
        aK = cells.filter(F.col("chunk") > 0).alias("a")
        b0 = cells.filter(F.col("chunk") == 0).alias("b")
        bK = cells.filter(F.col("chunk") > 0).alias("b")
        cand = cand.unionByName(_arm(a0, bK, False)).unionByName(
            _arm(aK, b0, False)
        )
    return (
        cand.filter(F.col("cosine") >= threshold)
        .orderBy("vec_a", "vec_b")
    )


def _grouped_blas_pairs(
    df: DataFrame,
    group_cols: list[str],
    threshold: float,
    group_out: str | None,
    what: str,
    home_col: str | None = None,
    bridge_col: str | None = None,
) -> DataFrame:
    """Shared blas pair stage: per-group Arrow matmul over (vec_id,
    embedding, nrm [, group cols]) rows. Each group's above-threshold
    pairs come from a row-blocked upper-triangular ``U @ U.T`` — the
    self-join disappears; the only exchange is the groupBy hash
    partitioning the expression kernel also pays. The 512-row block
    loop bounds per-task peak memory at ~512 x |group| x 8 bytes.
    ``group_out`` optionally carries the first group column into the
    output (the semantic kernel emits its cell id).

    ``home_col`` (boolean column) supports multi-probe groupings where
    each vector lands in several groups (its own bucket + probe
    buckets); ``bridge_col`` additionally marks the zero-chunk BRIDGE
    rows of the oversized-group guardrail (chunk-0 rows replicated
    into each chunk>=1 group of the oversized targets they probe, see
    :func:`_with_bridge_rows` — the bounded orientation: groups stay
    <= max_rows x (1 + #targets)). The exactly-once emission rule is
    ``emit iff home(vec_b) OR (home(vec_a) AND bridge(vec_b))``:

    - both rows home -> emit (the pair meets nowhere else);
    - cross-bucket same-chunk pairs meet in BOTH endpoints' groups as
      (home, classic probe) mirrors — ``home(vec_b)`` picks exactly
      the larger-id endpoint's group;
    - a chunk-0 x chunk>=1 pair meets exactly once, in the chunk>=1
      row's home group with the chunk-0 row as a bridge copy — either
      orientation of the rule fires depending on which endpoint has
      the larger id;
    - neither home -> skip (probe/bridge-only pairs belong to some
      other group, or to no admissible pair at all)."""
    import numpy as np
    import pandas as pd

    thr = float(threshold)
    out_cols = ["vec_a", "vec_b"] + ([group_out] if group_out else [])
    schema = (
        "vec_a bigint, vec_b bigint, "
        + (f"{group_out} bigint, " if group_out else "")
        + "cosine double"
    )

    def group_pairs(pdf: "pd.DataFrame") -> "pd.DataFrame":
        empty = pd.DataFrame(
            {
                **{c: pd.Series([], dtype="int64") for c in out_cols},
                "cosine": pd.Series([], dtype="float64"),
            }
        )
        n = len(pdf)
        if n < 2:
            return empty
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        U = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        nrm = pdf["nrm"].to_numpy()
        if not (nrm > 0).all():
            # parity with the expr kernel, which fails the job with
            # ANSI DIVIDE_BY_ZERO on a zero-norm embedding — numpy
            # would silently emit NaN cosines instead
            bad = pdf["vec_id"][~(nrm > 0)].tolist()[:5]
            raise ValueError(
                f"zero-norm embedding(s) in {what}: vec_id {bad} "
                "— cosine is undefined; filter degenerate vectors first"
            )
        # divide by the Spark-fold norms riding the rows, so the only
        # accumulation-order divergence from the expr kernel is the dot
        U = U / nrm[:, None]
        ids = pdf["vec_id"].to_numpy()
        home = pdf[home_col].to_numpy() if home_col else None
        bridge = pdf[bridge_col].to_numpy() if bridge_col else None
        gval = int(pdf[group_out].iloc[0]) if group_out else None
        out = []
        for s in range(0, n, 512):
            e = min(s + 512, n)
            raw = U[s:e] @ U.T  # (e-s, n) gram block
            # HALF_UP away from zero, matching F.round / DuckDB round
            # (np.round is half-to-even: an exactly-representable
            # half-point cosine like 1/32 = 0.03125 would round DOWN
            # and break row-parity with the expr twin).
            # PARITY CONTRACT CAVEAT: the blas dot is (a/|a|)@(b/|b|)
            # while the expr kernel folds dot(a,b)/(|a||b|); the
            # ~1e-13 accumulation/order delta is absorbed by this
            # 4-decimal rounding EXCEPT when a cosine lies within
            # float error of a half-point boundary (x.xxxx5) or of
            # `threshold` itself — on such adversarial corpora the two
            # kernels (and the DuckDB oracle) may diverge by that row.
            # Exact row-parity is asserted on the shipped test corpora,
            # where no cosine sits on a boundary; arbitrary-corpus
            # comparisons should use a one-ulp-of-1e-4 tolerance.
            g = np.sign(raw) * np.floor(np.abs(raw) * 1e4 + 0.5) / 1e4
            # Spark's `cosine >= threshold` treats NaN as greater than
            # any double, so the expr kernel EMITS pairs whose cosine
            # is NaN (possible with non-finite embedding values, which
            # pass the zero-norm guard: inf/inf = NaN without an ANSI
            # error); numpy comparisons drop NaN — keep them explicitly
            # or the kernels diverge on such inputs
            ia, ib = np.nonzero((g >= thr) | np.isnan(g))
            keep = (ia + s) < ib  # global upper triangle: vec_a < vec_b
            if home is not None:
                # exactly-once emission rule (docstring above); rows
                # are vec_id-sorted, so position ib is always vec_b
                ha, hb = home[ia + s], home[ib]
                if bridge is None:
                    # classic placements only: emit where vec_b is home
                    # (covers both-home too)
                    keep &= hb
                else:
                    # emit when vec_b is home (both-home pairs and the
                    # classic-mirror pick of the larger-id endpoint's
                    # group), or when vec_a is home and vec_b is a
                    # bridge copy (the single-meeting orientation the
                    # hb rule would miss); bridge x bridge pairs
                    # belong to their own chunk-0 home group
                    keep &= hb | (ha & bridge[ib])
            ia, ib = ia[keep], ib[keep]
            if len(ia):
                frame = {"vec_a": ids[ia + s], "vec_b": ids[ib]}
                if group_out:
                    frame[group_out] = gval
                frame["cosine"] = g[ia, ib]
                out.append(pd.DataFrame(frame))
        return pd.concat(out, ignore_index=True) if out else empty

    return (
        df.groupBy(*group_cols)
        .applyInPandas(group_pairs, schema)
        .orderBy("vec_a", "vec_b")
    )


def _semantic_pairs_blas(
    assigned: DataFrame, threshold: float, counts: DataFrame | None = None
) -> DataFrame:
    """Within-cell pair stage of :func:`semantic_neardup_pairs` as a
    per-(cell, chunk) Arrow matmul (see the caller's ``pair_kernel``
    docs). Groups are bounded at ``max_cell`` rows by the caller's
    chunking; when a cell is actually oversized (``counts`` row),
    each chunk-k group additionally receives the cell's chunk-0 rows
    as bridge copies (zero-chunk bridge, <= 2 x max_cell rows per
    group)."""
    if counts is not None:
        placed = _with_bridge_rows(
            assigned.select("vec_id", "embedding", "nrm", "cell", "chunk"),
            [(F.col("cell"), True)],
            "cell",
            counts,
        )
        return _grouped_blas_pairs(
            placed,
            ["cell", "chunk"],
            threshold,
            "cell",
            "semantic dedup",
            home_col="is_home",
            bridge_col="is_bridge",
        )
    return _grouped_blas_pairs(
        assigned, ["cell", "chunk"], threshold, "cell", "semantic dedup"
    )


def semantic_neardup_pairs_oracle(
    threshold: float = 0.35,
    n_cells: int = 16,
    iterations: int = 2,
    scale: int = 10000,
    max_cell: int | None = 4096,
) -> str:
    prefix, last = _kmeans_oracle_prefix(n_cells, iterations, scale)
    dot = (
        "list_sum(list_transform(generate_series(1, {d}), "
        "i -> (({a}[i])::DOUBLE * ({b}[i])::DOUBLE)))"
    )
    aa = dot.format(d=DIM, a="a.embedding", b="a.embedding")
    bb = dot.format(d=DIM, a="b.embedding", b="b.embedding")
    ab = dot.format(d=DIM, a="a.embedding", b="b.embedding")
    chunk = (
        f"(ROW_NUMBER() OVER (PARTITION BY tr.cell ORDER BY tr.vec_id) - 1) "
        f"// {max_cell}"
        if max_cell is not None
        else "0"
    )
    return f"""{prefix},
tp AS (
  SELECT q.vec_id, {last}.cell, {_kmeans_oracle_l2(last)} AS dist
  FROM q CROSS JOIN {last}
), cells AS (
  SELECT tr.vec_id, tr.cell, e.embedding, {chunk} AS chunk
  FROM (
    SELECT vec_id, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY dist, cell) AS rn
    FROM tp) tr
  JOIN embeddings e USING (vec_id)
  WHERE tr.rn = 1
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.cell AS cell,
       ROUND({ab} / (sqrt({aa}) * sqrt({bb})), 4) AS cosine
FROM cells a JOIN cells b
  ON a.cell = b.cell
 AND (a.chunk = b.chunk OR a.chunk = 0 OR b.chunk = 0)
 AND a.vec_id < b.vec_id
WHERE ROUND({ab} / (sqrt({aa}) * sqrt({bb})), 4) >= {threshold}
ORDER BY vec_a, vec_b
"""


def ivf_trained_topk_oracle(
    n_queries: int = 8,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = N_PROBE,
    iterations: int = 2,
    scale: int = 10000,
) -> str:
    prefix, last = _kmeans_oracle_prefix(n_centroids, iterations, scale)
    dot = (
        "list_sum(list_transform(generate_series(1, {d}), "
        "i -> (({a}[i])::DOUBLE * ({b}[i])::DOUBLE)))"
    )
    qq = dot.format(d=DIM, a="p.q_emb", b="p.q_emb")
    cc = dot.format(d=DIM, a="a.c_emb", b="a.c_emb")
    qc = dot.format(d=DIM, a="p.q_emb", b="a.c_emb")
    return f"""{prefix},
tp AS (
  SELECT q.vec_id, {last}.cell, {_kmeans_oracle_l2(last)} AS dist
  FROM q CROSS JOIN {last}
), tr AS (
  SELECT vec_id, cell,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY dist, cell) AS rn
  FROM tp
), cand AS (
  SELECT tr.vec_id AS cand_id, e.embedding AS c_emb, tr.cell
  FROM tr JOIN embeddings e USING (vec_id) WHERE tr.rn = 1
), probe AS (
  SELECT tr.vec_id AS query_id, e.embedding AS q_emb, tr.cell
  FROM tr JOIN embeddings e USING (vec_id)
  WHERE tr.vec_id < {n_queries} AND tr.rn <= {n_probe}
), scored AS (
  SELECT p.query_id, a.cand_id,
         {qc} / (sqrt({qq}) * sqrt({cc})) AS raw
  FROM probe p JOIN cand a USING (cell)
  WHERE a.cand_id <> p.query_id
), ranked AS (
  SELECT query_id, cand_id, ROUND(raw, 4) AS cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY raw DESC, cand_id) AS rank
  FROM scored
)
SELECT query_id, cand_id, cosine, rank FROM ranked
WHERE rank <= {k} ORDER BY query_id, rank
"""


def ivf_topk_oracle(
    n_queries: int = 8,
    k: int = 5,
    n_centroids: int = N_CENTROIDS,
    n_probe: int = N_PROBE,
) -> str:
    l2 = (
        f"list_sum(list_transform(generate_series(1, {DIM}), "
        "i -> ((e.embedding[i])::DOUBLE - (c.c_emb[i])::DOUBLE) * "
        "((e.embedding[i])::DOUBLE - (c.c_emb[i])::DOUBLE)))"
    )
    dot = (
        "list_sum(list_transform(generate_series(1, {d}), "
        "i -> (({a}[i])::DOUBLE * ({b}[i])::DOUBLE)))"
    )
    qq = dot.format(d=DIM, a="p.q_emb", b="p.q_emb")
    cc = dot.format(d=DIM, a="a.embedding", b="a.embedding")
    qc = dot.format(d=DIM, a="p.q_emb", b="a.embedding")
    return f"""
WITH cent AS (
  SELECT vec_id AS cent_id, embedding AS c_emb FROM embeddings
  WHERE vec_id < {n_centroids}
), pairs AS (
  SELECT e.vec_id, e.embedding, c.cent_id, {l2} AS dist
  FROM embeddings e CROSS JOIN cent c
), ranked_pairs AS (
  SELECT vec_id, embedding, cent_id,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY dist, cent_id) AS rn
  FROM pairs
), assign AS (
  SELECT vec_id, embedding, cent_id FROM ranked_pairs WHERE rn = 1
), probe AS (
  SELECT vec_id AS query_id, embedding AS q_emb, cent_id
  FROM ranked_pairs WHERE vec_id < {n_queries} AND rn <= {n_probe}
), scored AS (
  SELECT p.query_id, a.vec_id AS cand_id,
         {qc} / (sqrt({qq}) * sqrt({cc})) AS raw
  FROM probe p JOIN assign a USING (cent_id)
  WHERE a.vec_id <> p.query_id
), ranked AS (
  SELECT query_id, cand_id, ROUND(raw, 4) AS cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY raw DESC, cand_id) AS rank
  FROM scored
)
SELECT query_id, cand_id, cosine, rank FROM ranked
WHERE rank <= {k} ORDER BY query_id, rank
"""


def ann_multiprobe_topk(
    embeddings: DataFrame, n_queries: int = 8, k: int = 5
) -> DataFrame:
    """Multi-probe LSH ANN: each query probes its own bucket plus all
    NBITS Hamming-1 neighbor buckets (the standard recall knob — a
    low-margin hyperplane side flip moves a near neighbor exactly one
    bit away).

    Scale shape: the probe set is generated by EXPLODING 1+NBITS probe
    keys per query, keeping the candidate step an equi-join on the
    bucket id — never a bit_count(xor) theta-join against the corpus.
    Candidates can arrive via multiple probes, so the top-k window
    dedups with a distinct before ranking.
    """
    with_bucket = spread(embeddings).withColumn(
        "bucket", _bucket(F.col("embedding"))
    ).withColumn(
        "nrm", _norm(F.col("embedding"))
    ).localCheckpoint()  # both join sides read it: hash+norm once, not per pair
    probes = F.array(
        F.col("bucket"),
        *[
            F.col("bucket").bitwiseXOR(F.lit(1 << b)).cast("bigint")
            for b in range(NBITS)
        ],
    )
    q = (
        with_bucket.filter(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("nrm").alias("q_nrm"),
            F.explode(probes).alias("probe_bucket"),
        )
    )
    c = with_bucket.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("c_emb"),
        F.col("bucket").alias("c_bucket"),
        F.col("nrm").alias("c_nrm"),
    )
    sim = _dot(F.col("q_emb"), F.col("c_emb")) / (
        F.col("q_nrm") * F.col("c_nrm")
    )
    scored = (
        F.broadcast(q)
        .join(
            c,
            (F.col("probe_bucket") == F.col("c_bucket"))
            & (F.col("query_id") != F.col("cand_id")),
        )
        .select(
            "query_id", "cand_id", F.round(sim, 4).alias("cosine"),
            sim.alias("_raw"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_raw").desc(), F.col("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
        .orderBy("query_id", "rank")
    )


def ann_multiprobe_topk_oracle(n_queries: int = 8, k: int = 5) -> str:
    proj_terms = []
    for b in range(NBITS):
        proj_terms.append(
            f"CASE WHEN list_sum(list_transform(generate_series(0, {DIM - 1}), "
            f"i -> (embedding[i+1])::DOUBLE * "
            f"(CASE WHEN ('0x' || substr(md5('{b}:' || i::VARCHAR), 1, 1))::INT % 2 = 0 "
            f"THEN 1.0 ELSE -1.0 END))) >= 0 THEN {1 << b} ELSE 0 END"
        )
    bucket_expr = " + ".join(proj_terms)
    dot = (
        "list_sum(list_transform(generate_series(1, {d}), "
        "i -> (({a}[i])::DOUBLE * ({b}[i])::DOUBLE)))"
    )
    qq = dot.format(d=DIM, a="q.q_emb", b="q.q_emb")
    cc = dot.format(d=DIM, a="c.embedding", b="c.embedding")
    qc = dot.format(d=DIM, a="q.q_emb", b="c.embedding")
    probe_list = ", ".join(
        ["bucket"] + [f"xor(bucket, {1 << b})" for b in range(NBITS)]
    )
    return f"""
WITH bucketed AS (
  SELECT vec_id, embedding, ({bucket_expr}) AS bucket FROM embeddings
), q AS (
  SELECT vec_id AS query_id, embedding AS q_emb,
         unnest([{probe_list}]) AS probe_bucket
  FROM bucketed WHERE vec_id < {n_queries}
), scored AS (
  SELECT DISTINCT q.query_id, c.vec_id AS cand_id,
         ROUND({qc} / (sqrt({qq}) * sqrt({cc})), 4) AS cosine,
         {qc} / (sqrt({qq}) * sqrt({cc})) AS raw
  FROM q JOIN bucketed c
    ON q.probe_bucket = c.bucket AND q.query_id <> c.vec_id
), ranked AS (
  SELECT query_id, cand_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY raw DESC, cand_id) AS rank
  FROM scored
)
SELECT query_id, cand_id, cosine, rank FROM ranked
WHERE rank <= {k} ORDER BY query_id, rank
"""


def label_stats(embeddings: DataFrame) -> DataFrame:
    """Per-label corpus statistics: cardinality and norm distribution —
    the embedding-space audit every labeled corpus gets before training
    (catches collapsed/degenerate label clusters via norm spread).

    One shuffle over #labels groups; the norm fold is scan-stage
    compute. Norms are rounded once post-aggregation (min/max of exact
    values, THEN round — order matters for cross-engine equality)."""
    n = _norm(F.col("embedding"))
    return (
        embeddings.select("label", n.alias("nrm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.min("nrm"), 4).alias("min_norm"),
            F.round(F.max("nrm"), 4).alias("max_norm"),
        )
        .orderBy("label")
    )


def label_stats_oracle() -> str:
    dot = (
        f"list_sum(list_transform(generate_series(1, {DIM}), "
        "i -> ((embedding[i])::DOUBLE * (embedding[i])::DOUBLE)))"
    )
    return f"""
WITH t AS (SELECT label, sqrt({dot}) AS nrm FROM embeddings)
SELECT label, COUNT(*) AS n_vecs,
       ROUND(MIN(nrm), 4) AS min_norm,
       ROUND(MAX(nrm), 4) AS max_norm
FROM t GROUP BY label ORDER BY label
"""


def quantize_int8(embeddings: DataFrame) -> DataFrame:
    """Symmetric-range int8 quantization of the embedding column — the
    4x-compression step an embedding store applies before ANN serving.

    Per-DIMENSION min/max over the corpus define each dimension's
    scale; code = floor((x - mn) * 255 / (mx - mn)), clamped to [0,255]
    (mn == mx degenerates to code 0). Output per vector: the code
    vector's sum / min / max — integer invariants that pin down the
    whole quantization (any code drift moves the sum), engine-stable
    because every step is IEEE double arithmetic in a fixed order.

    Plan: one posexplode -> hash-agg per dimension (64 groups — tiny),
    broadcast the 64-row scale table back, quantize elementwise in the
    scan projection. The corpus is never shuffled; at 100 TB the
    explode-agg is the only pass that touches every element and it
    partial-aggregates map-side to 64 rows per task.
    """
    dims = (
        spread(embeddings)
        .select(F.posexplode("embedding").alias("d", "x"))
        .groupBy("d")
        .agg(
            F.min(F.col("x").cast("double")).alias("mn"),
            F.max(F.col("x").cast("double")).alias("mx"),
        )
        # collect_list gives no cross-partition order guarantee —
        # sort_array over (d, value) structs pins the dimension order
        .agg(
            F.sort_array(F.collect_list(F.struct("d", "mn"))).alias("amn"),
            F.sort_array(F.collect_list(F.struct("d", "mx"))).alias("amx"),
        )
        .select(
            F.expr("transform(amn, s -> s.mn)").alias("mns"),
            F.expr("transform(amx, s -> s.mx)").alias("mxs"),
        )
    )
    codes = F.expr(
        "transform(embedding, (x, i) -> "
        "CASE WHEN mxs[i] > mns[i] THEN "
        "LEAST(255, GREATEST(0, CAST(floor((CAST(x AS DOUBLE) - mns[i]) * 255.0D "
        "/ (mxs[i] - mns[i])) AS INT))) ELSE 0 END)"
    )
    return (
        spread(embeddings)
        .join(F.broadcast(dims))
        .select("vec_id", codes.alias("q"))
        .select(
            "vec_id",
            F.aggregate(
                "q", F.lit(0).cast("bigint"), lambda a, x: a + x
            ).alias("q_sum"),
            F.array_min("q").alias("q_min"),
            F.array_max("q").alias("q_max"),
        )
        .orderBy("vec_id")
    )


def quantize_int8_oracle() -> str:
    return """
WITH dim AS (
  SELECT d, MIN(x) AS mn, MAX(x) AS mx FROM (
    SELECT unnest(list_transform(embedding, y -> CAST(y AS DOUBLE))) AS x,
           unnest(generate_series(0, len(embedding) - 1)) AS d
    FROM embeddings
  ) GROUP BY d
),
scales AS (
  SELECT list(mn ORDER BY d) AS mns, list(mx ORDER BY d) AS mxs FROM dim
),
q AS (
  SELECT vec_id, list_transform(
    generate_series(1, len(embedding)),
    i -> CASE WHEN mxs[i] > mns[i] THEN
      LEAST(255, GREATEST(0, CAST(floor(
        (CAST(embedding[i] AS DOUBLE) - mns[i]) * 255.0 / (mxs[i] - mns[i])
      ) AS INT))) ELSE 0 END) AS codes
  FROM embeddings, scales
)
SELECT vec_id,
  CAST(list_sum(codes) AS BIGINT) AS q_sum,
  CAST(list_min(codes) AS INT) AS q_min,
  CAST(list_max(codes) AS INT) AS q_max
FROM q ORDER BY vec_id
"""


def _sign_words(emb: Column) -> tuple[Column, Column]:
    """Pack the 64 per-dimension sign bits (>= 0 -> 1) into two
    32-bit words held in BIGINTs. Two words keep every shift < 32 so
    the packed value never touches the BIGINT sign bit — Spark and
    DuckDB then agree on the integer without two's-complement
    reinterpretation games."""
    def word(offset: int) -> Column:
        weights = F.array(
            *[F.lit(1 << i).cast("bigint") for i in range(32)]
        )
        return F.aggregate(
            F.zip_with(
                F.slice(emb, offset + 1, 32),
                weights,
                lambda x, w: F.when(x >= 0, w).otherwise(
                    F.lit(0).cast("bigint")
                ),
            ),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )

    return word(0), word(32)


def binary_quantize_topk(
    embeddings: DataFrame,
    n_queries: int = 8,
    k: int = 5,
    rerank: int = 50,
) -> DataFrame:
    """Binary (sign) quantization ANN: 1 bit per dimension, Hamming
    prefilter, exact cosine re-rank.

    The 100 TB shape this family is used for: the packed code is 16
    bytes per vector (vs 256 for the float embedding), and the
    prefilter pass per pair is two XOR+popcount word ops instead of a
    64-term float fold — so the all-candidates sweep streams the
    CODES, not the embeddings. Only the ``rerank`` survivors per query
    (hamming asc, cand_id tiebreak) are joined back to the float
    corpus for the exact cosine, and only skinny (query_id, cand_id,
    hamming) rows ever cross the top-R shuffle. Same
    broadcast-queries/window-top-k skeleton as :func:`cosine_topk`.

    Determinism: sign(0) packs as 1 in both engines; Hamming ties cut
    by cand_id; final ties by cand_id — bit-exact vs the SQL oracle.
    """
    lo, hi = _sign_words(F.col("embedding"))
    codes = embeddings.select(
        "vec_id", lo.alias("lo"), hi.alias("hi")
    )
    qc = codes.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("lo").alias("q_lo"),
        F.col("hi").alias("q_hi"),
    )
    hamming = (
        F.bit_count(F.col("lo").bitwiseXOR(F.col("q_lo")))
        + F.bit_count(F.col("hi").bitwiseXOR(F.col("q_hi")))
    ).cast("bigint")
    pref_w = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col("cand_id").asc()
    )
    cands = (
        F.broadcast(qc)
        .join(codes, F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            hamming.alias("hamming"),
        )
        .withColumn("hr", F.row_number().over(pref_w))
        .filter(F.col("hr") <= rerank)
        .drop("hr")
    )
    q_emb = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        _norm(F.col("embedding")).alias("q_nrm"),
    )
    c_emb = spread(embeddings).select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("c_emb"),
        _norm(F.col("embedding")).alias("c_nrm"),
    )
    sim = _dot(F.col("q_emb"), F.col("c_emb")) / (
        F.col("q_nrm") * F.col("c_nrm")
    )
    rank_w = Window.partitionBy("query_id").orderBy(
        F.col("_raw").desc(), F.col("cand_id").asc()
    )
    return (
        F.broadcast(cands)
        .join(c_emb, "cand_id")
        .join(F.broadcast(q_emb), "query_id")
        .select(
            "query_id", "cand_id", "hamming",
            F.round(sim, 4).alias("cosine"), sim.alias("_raw"),
        )
        .withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "hamming", "cosine", "rank")
        .orderBy("query_id", "rank")
    )


def binary_topk_oracle(
    n_queries: int = 8, k: int = 5, rerank: int = 50
) -> str:
    word = (
        "CAST(list_sum(list_transform(generate_series(1, 32), i -> "
        "CASE WHEN embedding[{off} + i] >= 0 THEN (1::BIGINT << (i - 1)) "
        "ELSE 0::BIGINT END)) AS BIGINT)"
    )
    dot = (
        "list_sum(list_transform(generate_series(1, {d}), "
        "i -> (({a}[i])::DOUBLE * ({b}[i])::DOUBLE)))"
    )
    return f"""
WITH codes AS (
  SELECT vec_id, embedding,
         {word.format(off=0)} AS lo,
         {word.format(off=32)} AS hi
  FROM embeddings),
pref AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         CAST(bit_count(xor(q.lo, c.lo)) + bit_count(xor(q.hi, c.hi))
              AS BIGINT) AS hamming
  FROM codes q JOIN codes c
    ON q.vec_id < {n_queries} AND q.vec_id <> c.vec_id),
kept AS (
  SELECT query_id, cand_id, hamming,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY hamming, cand_id) AS hr
  FROM pref),
scored AS (
  SELECT k0.query_id, k0.cand_id, k0.hamming,
         {dot.format(d=DIM, a="q.embedding", b="c.embedding")} /
         (sqrt({dot.format(d=DIM, a="q.embedding", b="q.embedding")}) *
          sqrt({dot.format(d=DIM, a="c.embedding", b="c.embedding")})) AS raw
  FROM kept k0
  JOIN embeddings q ON q.vec_id = k0.query_id
  JOIN embeddings c ON c.vec_id = k0.cand_id
  WHERE k0.hr <= {rerank}),
ranked AS (
  SELECT query_id, cand_id, hamming, ROUND(raw, 4) AS cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY raw DESC, cand_id) AS rank
  FROM scored)
SELECT query_id, cand_id, hamming, cosine, rank FROM ranked
WHERE rank <= {k} ORDER BY query_id, rank
"""


def binary_recall(
    embeddings: DataFrame,
    n_queries: int = 8,
    k: int = 5,
    rerank: int = 50,
) -> DataFrame:
    """Recall@k audit of the binary sign-quantization path vs exact
    cosine search — same measurement discipline as sim_pq_recall:
    never ship a compressed-domain index without the overlap number.
    Both join sides are bounded by n_queries x k rows, broadcast
    outright. Integer output, oracle-checkable."""
    approx = binary_quantize_topk(embeddings, n_queries, k, rerank).select(
        "query_id", "cand_id"
    )
    exact = cosine_topk(embeddings, n_queries, k).select(
        "query_id", "cand_id"
    )
    hits = (
        exact.join(F.broadcast(approx), ["query_id", "cand_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    qlist = exact.select("query_id").distinct()
    return (
        qlist.join(F.broadcast(hits), "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            F.expr(f"coalesce(n_hits, 0) * 100 div {k}").alias(
                "recall_x100"
            ),
        )
        .orderBy("query_id")
    )


def binary_recall_oracle(
    n_queries: int = 8, k: int = 5, rerank: int = 50
) -> str:
    return f"""
WITH exact AS ({cosine_topk_oracle(n_queries, k)}),
approx AS ({binary_topk_oracle(n_queries, k, rerank)}),
hits AS (
  SELECT e.query_id, COUNT(*) AS n_hits
  FROM exact e JOIN approx a
    ON a.query_id = e.query_id AND a.cand_id = e.cand_id
  GROUP BY e.query_id)
SELECT q.query_id, COALESCE(n_hits, 0) AS n_hits,
       COALESCE(n_hits, 0) * 100 // {k} AS recall_x100
FROM (SELECT DISTINCT query_id FROM exact) q
LEFT JOIN hits USING (query_id) ORDER BY query_id
"""
