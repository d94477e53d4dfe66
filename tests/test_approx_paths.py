"""The documented 100 TB approx substitutions, tested against their
exact twins.

SCALE.md prescribes swapping exact operators for sketch-based ones
past certain scales: ``countDistinct`` -> ``approx_count_distinct``
(daily actives), ``percentile`` -> ``percentile_approx`` (quantile
gates). Those swaps only hold if the approximation is actually close
on realistic data — these tests pin the error bounds so the scale
advice ships with evidence, not just a docstring claim.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_approx_count_distinct_within_5pct(spark):
    from rigatoni_spark.sources.change_events import read_change_events

    ce = read_change_events(spark, SF_DIR)
    uid = F.get_json_object(F.col("document_key"), "$._id").cast("bigint")
    day = F.date_trunc("day", F.col("cluster_time")).cast("date")
    per_day = (
        ce.select(day.alias("day"), uid.alias("uid"))
        .groupBy("day")
        .agg(
            F.countDistinct("uid").alias("exact"),
            F.approx_count_distinct("uid", 0.02).alias("approx"),
        )
        .collect()
    )
    assert per_day
    for r in per_day:
        assert abs(r.approx - r.exact) <= max(0.05 * r.exact, 2.0), (
            r.day, r.exact, r.approx
        )


def test_percentile_approx_matches_exact_median_closely(spark):
    from rigatoni_spark.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    rows = (
        docs.groupBy("lang")
        .agg(
            F.expr("percentile(n_chars, 0.5)").alias("exact"),
            F.expr("percentile_approx(n_chars, 0.5, 10000)").alias("approx"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        # percentile_approx returns an actual data value while the
        # exact median interpolates between order statistics, so the
        # difference includes the inter-order-statistic gap, not just
        # sketch error — 5% covers both on per-language distributions
        assert abs(r.approx - r.exact) <= max(0.05 * r.exact, 1.0), (
            r.lang, r.exact, r.approx
        )


def test_quantile_gate_approx_swap_keeps_same_rows(spark):
    """The SCALE.md swap for quantile_length_gate: replacing the exact
    per-stratum threshold with percentile_approx must admit (nearly)
    the same document set. On this corpus the thresholds coincide, so
    the gate output is identical — the strongest form of the claim."""
    from rigatoni_spark.llm.mixing import quantile_length_gate
    from rigatoni_spark.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    exact = {
        (r.lang, r.n_kept)
        for r in quantile_length_gate(docs).collect()
    }

    med = docs.groupBy("lang").agg(
        F.expr("percentile_approx(n_chars, 0.5, 10000)").alias("med")
    )
    approx = {
        (r.lang, r.n_kept)
        for r in (
            docs.join(F.broadcast(med), "lang")
            .filter(F.col("n_chars") >= F.col("med"))
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_kept"))
            .collect()
        )
    }
    # allow the boundary rows to differ by the interpolation gap: the
    # approx threshold is an actual data value, the exact one is
    # interpolated — counts may differ by the ties at the boundary
    for lang, n_exact in exact:
        n_approx = dict(approx)[lang]
        assert abs(n_approx - n_exact) <= max(0.05 * n_exact, 3.0), (
            lang, n_exact, n_approx
        )


def test_semantic_blas_kernel_matches_expr_twin(spark):
    """pair_kernel='blas' (per-cell Arrow matmul — the scale path) must
    reproduce the oracle-exact expr kernel row for row: the only
    divergence is dot-product accumulation order (~1e-13 relative),
    which the 4-decimal rounding absorbs."""
    from rigatoni_spark.llm.vectors import semantic_neardup_pairs
    from rigatoni_spark.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    expr_rows = [tuple(r) for r in semantic_neardup_pairs(emb).collect()]
    blas_rows = [
        tuple(r)
        for r in semantic_neardup_pairs(emb, pair_kernel="blas").collect()
    ]
    assert expr_rows == blas_rows
    assert len(expr_rows) > 0  # non-degenerate gate


def test_semantic_blas_respects_max_cell_chunking(spark):
    """The mega-cell guardrail bounds the blas kernel's matrix size the
    same way it bounds the expr kernel's pair volume: with max_cell
    forcing splits, both kernels emit the identical reduced pair set
    (no cross-chunk pairs)."""
    from rigatoni_spark.llm.vectors import semantic_neardup_pairs
    from rigatoni_spark.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    expr_rows = [
        tuple(r)
        for r in semantic_neardup_pairs(emb, n_cells=2, max_cell=64).collect()
    ]
    blas_rows = [
        tuple(r)
        for r in semantic_neardup_pairs(
            emb, n_cells=2, max_cell=64, pair_kernel="blas"
        ).collect()
    ]
    assert expr_rows == blas_rows


def test_semantic_zero_norm_fails_loudly_in_both_kernels(spark):
    """A zero-norm embedding makes cosine undefined. The expr kernel
    fails the job with ANSI DIVIDE_BY_ZERO; the blas kernel must fail
    just as loudly (numpy would otherwise silently emit NaN cosines
    and the two kernels would diverge on degenerate corpora)."""
    import pytest

    from rigatoni_spark.llm.vectors import semantic_neardup_pairs

    rows = [(i, [float(i + 1)] * 64) for i in range(6)]
    rows.append((6, [0.0] * 64))  # zero-norm vector
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>"
    )
    kw = dict(n_cells=1, threshold=0.99)
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        semantic_neardup_pairs(emb, **kw).collect()
    with pytest.raises(Exception, match="zero-norm embedding"):
        semantic_neardup_pairs(emb, pair_kernel="blas", **kw).collect()


def test_embedding_neardup_blas_matches_expr_twin(spark):
    """pair_kernel='blas' on the LSH-bucketed embedding near-dup path
    must reproduce the expr kernel row for row (same contract as the
    semantic dedup twin)."""
    from rigatoni_spark.llm.vectors import embedding_neardup_pairs
    from rigatoni_spark.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    # the sf0.001 corpus has no pairs at the production default 0.95 —
    # drop the threshold so the twin check gates on real rows
    expr_rows = [
        tuple(r)
        for r in embedding_neardup_pairs(emb, threshold=0.3).collect()
    ]
    blas_rows = [
        tuple(r)
        for r in embedding_neardup_pairs(
            emb, threshold=0.3, pair_kernel="blas"
        ).collect()
    ]
    assert expr_rows == blas_rows
    assert len(expr_rows) > 0


def test_embedding_neardup_max_bucket_chunks_both_kernels(spark):
    """The mega-bucket guardrail applies to BOTH kernels identically:
    with max_bucket forcing splits, expr and blas emit the same
    guardrail-admitted pair set (a subset of the unchunked one)."""
    from rigatoni_spark.llm.vectors import embedding_neardup_pairs
    from rigatoni_spark.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    kw = dict(threshold=0.3, max_bucket=4)
    expr_rows = [tuple(r) for r in embedding_neardup_pairs(emb, **kw).collect()]
    blas_rows = [
        tuple(r)
        for r in embedding_neardup_pairs(
            emb, pair_kernel="blas", **kw
        ).collect()
    ]
    assert expr_rows == blas_rows
    # admitted pairs are a subset of the unchunked set; the zero-chunk
    # bridge may make them EQUAL on corpora where every above-threshold
    # pair touches chunk 0 — the strict drop is pinned on a synthetic
    # mega-bucket in test_zero_chunk_bridge_admission below
    full = {
        (r.vec_a, r.vec_b)
        for r in embedding_neardup_pairs(
            emb, threshold=0.3, max_bucket=None
        ).collect()
    }
    assert {(a, b) for a, b, _ in expr_rows} <= full


def test_zero_chunk_bridge_admission(spark):
    """Pin the guardrail's admission rule on a synthetic mega-bucket:
    12 identical vectors (one bucket, cosine 1.0 everywhere) with
    max_bucket=4 split into chunks {0,1,2}. Admitted pairs = same
    chunk OR either side in chunk 0; dropped pairs = exactly the
    chunk1 x chunk2 ones. Both kernels agree."""
    from rigatoni_spark.llm.vectors import embedding_neardup_pairs

    emb = spark.createDataFrame(
        [(i, [1.0] * 64) for i in range(12)],
        "vec_id bigint, embedding array<float>",
    )
    kw = dict(threshold=0.99, max_bucket=4)
    expr_rows = [tuple(r) for r in embedding_neardup_pairs(emb, **kw).collect()]
    blas_rows = [
        tuple(r)
        for r in embedding_neardup_pairs(emb, pair_kernel="blas", **kw).collect()
    ]
    assert expr_rows == blas_rows

    def chunk(v):  # vec_id-ordered contiguous chunks of 4
        return v // 4

    got = {(a, b) for a, b, _ in expr_rows}
    want = {
        (a, b)
        for a in range(12)
        for b in range(a + 1, 12)
        if chunk(a) == chunk(b) or chunk(a) == 0 or chunk(b) == 0
    }
    dropped = {
        (a, b) for a in range(4, 8) for b in range(8, 12)
    }  # chunk1 x chunk2
    assert got == want
    assert got.isdisjoint(dropped)
    # sanity on the arithmetic: 3*C(4,2) same-chunk + 4*8 bridge = 50
    assert len(got) == 50 == 66 - len(dropped)


def test_multiprobe_blas_parity_and_guardrail(spark):
    """The blas kernel's home-row exactly-once rule must reproduce the
    probe-join's rows EXACTLY (same pairs, same rounded cosines, no
    duplicates), and a tiny max_bucket must bound the pair set the
    same way on both kernels."""
    from rigatoni_spark.llm.vectors import multiprobe_neardup_pairs
    from rigatoni_spark.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    for kw in (dict(threshold=0.3), dict(threshold=0.3, max_bucket=4)):
        expr_rows = [
            tuple(r) for r in multiprobe_neardup_pairs(emb, **kw).collect()
        ]
        blas_rows = [
            tuple(r)
            for r in multiprobe_neardup_pairs(
                emb, pair_kernel="blas", **kw
            ).collect()
        ]
        assert expr_rows == blas_rows, kw
        # exactly-once: no pair may arrive via two probe groups
        pairs = [(a, b) for a, b, _ in expr_rows]
        assert len(pairs) == len(set(pairs))
    # guardrail-admitted pairs are a subset of the unchunked set (the
    # zero-chunk bridge may close the gap entirely on corpora where
    # every pair touches chunk 0)
    full = {
        (r.vec_a, r.vec_b)
        for r in multiprobe_neardup_pairs(
            emb, threshold=0.3, max_bucket=None
        ).collect()
    }
    chunked = {
        (r.vec_a, r.vec_b)
        for r in multiprobe_neardup_pairs(
            emb, threshold=0.3, max_bucket=4
        ).collect()
    }
    assert chunked <= full


def test_multiprobe_bridge_keeps_cross_bucket_neighbors(spark):
    """The round-5 recall fix: a chunk>=1 row of an oversized bucket
    must keep its Hamming-1 pairs with rows of normal-sized neighbor
    buckets (chunk ordinals from different home buckets have no
    semantic relation — requiring equality silently dropped ALL such
    pairs). Found by searching the real corpus for an oversized bucket
    with a populated Hamming-1 neighbor."""
    import pytest

    from pyspark.sql import functions as F

    from rigatoni_spark.llm.vectors import (
        NBITS,
        _bucket,
        multiprobe_neardup_pairs,
    )
    from rigatoni_spark.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    rows = (
        emb.select("vec_id", _bucket(F.col("embedding")).alias("bucket"))
        .orderBy("vec_id")
        .collect()
    )
    by_bucket: dict[int, list[int]] = {}
    for r in rows:
        by_bucket.setdefault(r.bucket, []).append(r.vec_id)
    probe_pair = None  # (chunk>=1 member of oversized bucket, neighbor member)
    for bkt, members in sorted(by_bucket.items()):
        if len(members) <= 4:
            continue  # not oversized at max_bucket=4
        for b in range(NBITS):
            neigh = by_bucket.get(bkt ^ (1 << b))
            if neigh:
                probe_pair = (members[4], neigh[0])  # members[4] = chunk 1
                break
        if probe_pair:
            break
    if probe_pair is None:
        pytest.skip("corpus has no oversized bucket with a Hamming-1 neighbor")
    u, v = probe_pair
    lo, hi = min(u, v), max(u, v)
    got = {
        (r.vec_a, r.vec_b)
        for r in multiprobe_neardup_pairs(
            emb, threshold=-1.0, max_bucket=4
        ).collect()
    }
    assert (lo, hi) in got


def test_bridge_placement_bounds_kernel_groups(spark):
    """The zero-chunk bridge must never funnel an oversized group into
    one kernel group (that would rebuild the unbounded matrix the
    guardrail exists to prevent): with the oversized-count table
    driving chunk-0 replication, every (group, chunk) holds at most
    max_rows home rows plus max_rows bridge copies."""
    from pyspark.sql import functions as F

    from rigatoni_spark.llm.vectors import (
        _attach_chunk,
        _materialize_once,
        _with_bridge_rows,
    )

    n, mb = 5000, 256
    df = (
        spark.range(n)
        .selectExpr(
            "id as vec_id",
            "transform(sequence(1, 8), i -> 1.0f) as embedding",
            "cast(1.0 as double) as nrm",
        )
        .withColumn("bucket", F.lit(7).cast("bigint"))
    )
    chunked, counts = _attach_chunk(_materialize_once(df), "bucket", mb)
    assert counts is not None
    placed = _with_bridge_rows(
        chunked.select("vec_id", "embedding", "nrm", "bucket", "chunk"),
        [(F.col("bucket"), True)],
        "bucket",
        counts,
    )
    per_group = placed.groupBy("bucket", "chunk").count().collect()
    assert max(r["count"] for r in per_group) <= 2 * mb
    # every nonzero chunk received exactly the mb chunk-0 bridge copies
    n_chunks = -(-n // mb)
    assert len(per_group) == n_chunks
    homes = placed.filter("is_home").count()
    bridges = placed.filter("is_bridge").count()
    assert homes == n
    assert bridges == mb * (n_chunks - 1)


def test_multiprobe_candidates_match_bruteforce(spark):
    """Independent enumeration of the multi-probe candidate contract on
    a random corpus: a pair is a candidate iff its buckets are within
    Hamming distance 1 AND the guardrail admits it (chunk-equal or
    either side in chunk 0). Both kernels must emit exactly that set,
    each pair exactly once (threshold=-1 disables the cosine filter)."""
    import numpy as np

    from pyspark.sql import functions as F

    from rigatoni_spark.llm.vectors import _bucket, multiprobe_neardup_pairs

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(60, 64)).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(60)],
        "vec_id bigint, embedding array<float>",
    )
    bucket_of = {
        r.vec_id: r.bucket
        for r in emb.select(
            "vec_id", _bucket(F.col("embedding")).alias("bucket")
        ).collect()
    }
    max_bucket = 3
    by_bucket: dict[int, list[int]] = {}
    for vid in sorted(bucket_of):
        by_bucket.setdefault(bucket_of[vid], []).append(vid)
    chunk_of = {
        vid: i // max_bucket
        for members in by_bucket.values()
        for i, vid in enumerate(members)
    }

    def admissible(u: int, v: int) -> bool:
        if bin(bucket_of[u] ^ bucket_of[v]).count("1") > 1:
            return False
        cu, cv = chunk_of[u], chunk_of[v]
        return cu == cv or cu == 0 or cv == 0

    want = {
        (u, v) for u in range(60) for v in range(u + 1, 60) if admissible(u, v)
    }
    for kernel in ("expr", "blas"):
        rows = multiprobe_neardup_pairs(
            emb, threshold=-1.0, max_bucket=max_bucket, pair_kernel=kernel
        ).collect()
        pairs = [(r.vec_a, r.vec_b) for r in rows]
        assert len(pairs) == len(set(pairs)), kernel  # exactly-once
        assert set(pairs) == want, kernel

    # same contract for the single-bucket path: identical buckets only
    def admissible_single(u: int, v: int) -> bool:
        if bucket_of[u] != bucket_of[v]:
            return False
        cu, cv = chunk_of[u], chunk_of[v]
        return cu == cv or cu == 0 or cv == 0

    from rigatoni_spark.llm.vectors import embedding_neardup_pairs

    want_single = {
        (u, v)
        for u in range(60)
        for v in range(u + 1, 60)
        if admissible_single(u, v)
    }
    for kernel in ("expr", "blas"):
        rows = embedding_neardup_pairs(
            emb, threshold=-1.0, max_bucket=max_bucket, pair_kernel=kernel
        ).collect()
        pairs = [(r.vec_a, r.vec_b) for r in rows]
        assert len(pairs) == len(set(pairs)), kernel
        assert set(pairs) == want_single, kernel
    assert want_single <= want  # identity probe is a subset


def test_multiprobe_neardup_superset_of_single_bucket(spark):
    """Hamming-1 multi-probe must find every pair the plain bucket
    join finds (identity probe) plus only pairs whose buckets differ
    in exactly one bit — the documented recall/cost trade."""
    from rigatoni_spark.llm.vectors import (
        embedding_neardup_pairs,
        multiprobe_neardup_pairs,
    )
    from rigatoni_spark.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    single = {
        (r.vec_a, r.vec_b)
        for r in embedding_neardup_pairs(
            emb, threshold=0.3, max_bucket=None
        ).collect()
    }
    multi = {
        (r.vec_a, r.vec_b)
        for r in multiprobe_neardup_pairs(emb, threshold=0.3).collect()
    }
    assert single <= multi
    assert len(multi) > len(single)  # the probe actually adds recall
