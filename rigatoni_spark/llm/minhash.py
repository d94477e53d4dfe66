"""MinHash + LSH near-duplicate detection.

Pipeline (the standard distributed formulation):

    shingle (word 3-grams) -> k salted-MD5 min-hashes (signature)
      -> band the signature (b bands x r rows) -> bucket-join on
      (band_idx, band_hash) -> candidate pairs -> exact-Jaccard verify

Determinism: "k independent hash functions" are ``md5(salt || ':' ||
shingle)`` for salt in 0..k-1 — no RNG, reproducible, and expressible
identically in ANSI SQL for the oracle. The min is taken on the hex
string (lexicographic min == numeric min of the 128-bit value).

Scale design:
- signatures: explode(shingles) x explode(salts) -> groupBy(doc, salt)
  min(hash). Shuffle keyed by (doc_id, salt) — uniform. Rows =
  docs x shingles x k; partial aggregation collapses map-side, so the
  exchange carries at most docs x k rows.
- banding: one groupBy(doc, band) over the k-row signature.
- candidates: equi-join on (band_idx, band_hash) — a hash join whose
  key cardinality grows with the corpus; no all-pairs anywhere. Bucket
  skew (a degenerate band shared by thousands of docs) is the known
  failure mode: AQE skew-join splitting handles moderate cases; a
  bucket-size cap (drop buckets > max_bucket) is the documented
  guardrail at 100 TB.
- verify: exact Jaccard only on candidates (bounded by LSH recall).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rigatoni_spark.tables import spread, tokenize_once

DEFAULT_K = 8  # hash functions
DEFAULT_BANDS = 4  # => r = k/bands rows per band


def _shingles(toks, n: int = 3):
    """Word n-gram shingles (distinct) over a MATERIALIZED token-array
    column. Callers project through ``tables.tokenize_once`` first
    (round-13, guide §4/§2.3): referencing the ``split()`` expression
    directly here would embed it in the transform lambda and re-tokenize
    the document once per window position — O(words²) per doc. A
    multi-referenced non-cheap alias survives CollapseProject, so the
    split runs once per row (the ``ngram_lm._grams`` pattern)."""
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )


def minhash_signatures(
    documents: DataFrame, k: int = DEFAULT_K, shingle_n: int = 3
) -> DataFrame:
    """(doc_id, h0..h{k-1}) — wide signature, ONE groupBy(doc_id) with k
    min-aggregations over the exploded shingles.

    Wide beats long (explode x k salts -> groupBy(doc, salt)): the
    exchange carries docs rows instead of docs x k, and banding becomes
    a pure projection instead of a second shuffle.
    """
    # compacted inputs scan as 1 partition; the shingle+md5 stage is the
    # CPU hot spot, so make sure it runs wide (no-op on wide inputs)
    sh = (
        tokenize_once(spread(documents), "doc_id")
        .select(
            "doc_id",
            F.explode(_shingles(F.col("__toks"), n=shingle_n)).alias(
                "shingle"
            ),
        )
    )
    return sh.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{s}:"), F.col("shingle")))).alias(f"h{s}")
            for s in range(k)
        ]
    )


def lsh_bands(
    documents: DataFrame, k: int = DEFAULT_K, bands: int = DEFAULT_BANDS,
    shingle_n: int = 3,
) -> DataFrame:
    """(doc_id, band, band_hash): bucket key per band — a projection +
    unpivot over the wide signature, no extra shuffle."""
    r = k // bands
    sigs = minhash_signatures(documents, k=k, shingle_n=shingle_n)
    band_hashes = F.array(
        *[
            F.md5(F.concat_ws("|", *[F.col(f"h{b * r + i}") for i in range(r)]))
            for b in range(bands)
        ]
    )
    return sigs.select(
        "doc_id", F.posexplode(band_hashes).alias("band", "band_hash")
    )


def candidate_pairs(
    documents: DataFrame, k: int = DEFAULT_K, bands: int = DEFAULT_BANDS,
    shingle_n: int = 3, max_bucket: int | None = None,
) -> DataFrame:
    """Distinct (doc_a < doc_b) pairs sharing >= 1 LSH bucket.

    ``max_bucket`` is the degenerate-bucket guardrail: a bucket of m
    docs emits m²/2 candidate pairs, so one pathological band value
    (boilerplate shingles, empty docs) can dominate the whole join at
    corpus scale. Buckets larger than ``max_bucket`` are dropped —
    standard LSH practice: members of a mega-bucket are near-duplicates
    of *many* things and surface through their other (b-1) bands, so
    recall loss is confined to docs whose every band degenerates.
    """
    # materialize the band sketch ONCE: the self-join (and the
    # mega-bucket probe when enabled) would otherwise re-run the
    # shingle+minhash plan per use — Spark does not reuse it across
    # join sides. |docs| x bands rows of (id, band, hash).
    b = lsh_bands(documents, k=k, bands=bands, shingle_n=shingle_n).localCheckpoint()
    if max_bucket is not None:
        sizes = b.groupBy("band", "band_hash").agg(
            F.count(F.lit(1)).alias("_bucket_rows")
        )
        b = (
            b.join(F.broadcast(sizes.filter(F.col("_bucket_rows") > max_bucket)),
                   ["band", "band_hash"], "left_anti")
        )
    a, c = b.alias("a"), b.alias("b")
    return (
        a.join(
            c,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def near_duplicates(
    documents: DataFrame,
    threshold: float = 0.7,
    k: int = DEFAULT_K,
    bands: int = DEFAULT_BANDS,
    shingle_n: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """LSH candidates verified by exact shingle-set Jaccard."""
    cands = candidate_pairs(
        documents, k=k, bands=bands, shingle_n=shingle_n,
        max_bucket=max_bucket,
    )
    t = (
        tokenize_once(spread(documents), "doc_id")
        .select("doc_id", _shingles(F.col("__toks"), n=shingle_n).alias("sh"))
    )
    j = (
        cands.join(t.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
        .join(t.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
    )
    from rigatoni_spark.llm.dedup import _jaccard_ge, _jaccard_x10k

    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - inter
    return (
        j.select("doc_a", "doc_b", inter.alias("i"), union.alias("u"))
        .filter(_jaccard_ge(threshold))
        .select("doc_a", "doc_b", _jaccard_x10k())
        .orderBy("doc_a", "doc_b")
    )


def cross_corpus_near_duplicates(
    corpus_a: DataFrame,
    corpus_b: DataFrame,
    threshold: float = 0.7,
    k: int = DEFAULT_K,
    bands: int = DEFAULT_BANDS,
    shingle_n: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """Dump-vs-dump overlap: near-duplicate pairs with ONE side in each
    corpus — the question a crawl team asks before ingesting a new dump
    ("how much of this is already in the last one?"). Distinct from the
    admission gate (per-doc report): this returns the PAIRS with their
    verified Jaccard, so overlap can be audited, joined to metadata,
    or used to build a cross-dump mapping.

    Doc ids must be globally distinct across the two frames (the
    banding machinery keys on doc_id; colliding ids would silently
    merge sketches). Implementation: tag sides, run the single-corpus
    LSH+verify over the union (the bucket join naturally mixes sides),
    then keep only cross-side pairs and orient output as
    (a_id from corpus_a, b_id from corpus_b). Within-corpus duplicate
    mass never reaches the output — but it DOES share the banding
    plan, so cost matches one near_duplicates run over |A|+|B|."""
    tagged = corpus_a.select(
        "doc_id", "text", F.lit(0).alias("_side")
    ).unionByName(corpus_b.select("doc_id", "text", F.lit(1).alias("_side")))
    pairs = near_duplicates(
        tagged.select("doc_id", "text"),
        threshold=threshold,
        k=k,
        bands=bands,
        shingle_n=shingle_n,
        max_bucket=max_bucket,
    )
    sides = tagged.select("doc_id", "_side")
    oriented = (
        pairs.join(
            sides.withColumnRenamed("doc_id", "doc_a").withColumnRenamed(
                "_side", "side_a"
            ),
            "doc_a",
        )
        .join(
            sides.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "_side", "side_b"
            ),
            "doc_b",
        )
        .filter(F.col("side_a") != F.col("side_b"))
    )
    a_id = F.when(F.col("side_a") == 0, F.col("doc_a")).otherwise(
        F.col("doc_b")
    )
    b_id = F.when(F.col("side_a") == 0, F.col("doc_b")).otherwise(
        F.col("doc_a")
    )
    return oriented.select(
        a_id.alias("a_id"), b_id.alias("b_id"), "jaccard_x10k"
    ).orderBy("a_id", "b_id")


def cross_corpus_oracle_even_odd(
    threshold: float = 0.7, k: int = DEFAULT_K, bands: int = DEFAULT_BANDS,
    shingle_n: int = 3,
) -> str:
    """Oracle for the catalog's even/odd split of ``documents``:
    single-corpus near-dup pairs restricted to cross-parity, oriented
    even -> odd (corpus_a = even doc_ids, corpus_b = odd)."""
    return f"""
WITH nd AS ({near_duplicates_oracle(threshold, k, bands, shingle_n).strip()})
SELECT CASE WHEN doc_a % 2 = 0 THEN doc_a ELSE doc_b END AS a_id,
       CASE WHEN doc_a % 2 = 0 THEN doc_b ELSE doc_a END AS b_id,
       jaccard_x10k
FROM nd WHERE doc_a % 2 != doc_b % 2
ORDER BY a_id, b_id
"""


def incremental_near_duplicates(
    corpus: DataFrame,
    increment: DataFrame,
    threshold: float = 0.7,
    k: int = DEFAULT_K,
    bands: int = DEFAULT_BANDS,
    shingle_n: int = 3,
    max_bucket: int | None = None,
    corpus_bands: DataFrame | None = None,
) -> DataFrame:
    """Near-dup admission report for a new crawl batch against the
    existing corpus: per increment doc, how many corpus docs share an
    LSH bucket (``n_candidates``), the best verified Jaccard among them
    (``best_jaccard_x10k``, NULL when no candidate), and ``is_new``
    (1 = no verified near-duplicate at ``threshold``, admit).

    The near-dup twin of ``mixing.incremental_new_docs``: admission
    cost is ∝ |increment| x bands, NEVER a re-dedup of everything
    ingested so far. At 100 TB pass ``corpus_bands`` — the precomputed
    corpus band sketch (|corpus| x bands narrow rows of
    (doc_id, band, band_hash), e.g. ``lsh_bands(corpus)`` written out
    bucketed by (band, band_hash), operators/bucketing.py) — and each
    new batch pays one equi-join probe into it. The Jaccard-verify
    stage touches corpus TEXT only for the candidate corpus_ids: the
    corpus is semi-join-pruned to the (batch-bounded, broadcast)
    candidate id set BEFORE shingling, so verify cost is
    ∝ |candidates|, never a corpus re-shingle per admission batch.

    ``max_bucket`` drops degenerate CORPUS buckets exactly like
    ``candidate_pairs`` — one boilerplate band value must not turn a
    batch admission into a quadratic blow-up (it also bounds the
    candidate id set, keeping the verify-stage broadcast safe).
    """
    if corpus_bands is None:
        # no precomputed index: the sketch feeds the bucket-size agg
        # (when max_bucket is set) AND the probe join — materialize it
        # once rather than re-running shingle+minhash per consumer
        # (same reasoning as candidate_pairs above)
        corpus_bands = lsh_bands(
            corpus, k=k, bands=bands, shingle_n=shingle_n
        ).localCheckpoint()
    cb = corpus_bands
    if max_bucket is not None:
        sizes = cb.groupBy("band", "band_hash").agg(
            F.count(F.lit(1)).alias("_bucket_rows")
        )
        cb = cb.join(
            F.broadcast(sizes.filter(F.col("_bucket_rows") > max_bucket)),
            ["band", "band_hash"],
            "left_anti",
        )
    ib = lsh_bands(increment, k=k, bands=bands, shingle_n=shingle_n)
    # batch-bounded: |increment| x bands probes, each hitting buckets of
    # width <= max_bucket. Materialize once — consumed by BOTH the
    # corpus-prune broadcast below and the per_doc verify join.
    cands = (
        ib.join(
            cb.withColumnRenamed("doc_id", "corpus_id"),
            ["band", "band_hash"],
        )
        .select("doc_id", "corpus_id")
        .distinct()
        .localCheckpoint()
    )
    shi = (
        tokenize_once(spread(increment), "doc_id")
        .select(
            "doc_id", _shingles(F.col("__toks"), n=shingle_n).alias("sh_i")
        )
    )
    # verify-stage prune: only candidate corpus docs get (re-)shingled.
    # The id set is candidates-sized (broadcastable by the max_bucket
    # contract); the semi join pushes past the scan so corpus text rows
    # touched here are bounded by |candidates|, not |corpus|.
    cand_ids = cands.select(F.col("corpus_id").alias("doc_id")).distinct()
    # FORCE the broadcast only when max_bucket bounds the candidate set
    # (<= |increment| x bands x max_bucket ids); unbounded, let AQE
    # choose from the real size — the same never-force-an-unbounded-
    # broadcast posture as the report join below
    if max_bucket is not None:
        cand_ids = F.broadcast(cand_ids)
    # prune on the RAW scan (spread()'s narrow-input repartition would
    # otherwise exchange the full corpus text before the semi filter);
    # only the candidate survivors reach the shingle expressions
    shc = (
        tokenize_once(
            corpus.join(cand_ids, "doc_id", "left_semi"),
            F.col("doc_id").alias("corpus_id"),
        )
        .select(
            "corpus_id", _shingles(F.col("__toks"), n=shingle_n).alias("sh_c")
        )
    )
    # F.size is IntegerType — widen before multiplying (book-length docs
    # can exceed 214,748 distinct shingles; int product would wrap)
    inter = F.size(F.array_intersect(F.col("sh_i"), F.col("sh_c"))).cast("long")
    union = (F.size("sh_i") + F.size("sh_c")).cast("long") - inter
    t_x10k = int(round(threshold * 10000))
    per_doc = (
        cands.join(shi, "doc_id")
        .join(shc, "corpus_id")
        .select(
            "doc_id",
            F.floor(inter * 10000 / union).alias("jx"),
            # exact-rational threshold test (dedup._jaccard_ge form):
            # integer compare, never a floored double near the boundary
            (inter * 10000 >= F.lit(t_x10k) * union)
            .cast("int")
            .alias("dup"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
            F.max("jx").cast("bigint").alias("best_jaccard_x10k"),
            F.max("dup").alias("any_dup"),
        )
    )
    return (
        increment.select("doc_id")
        # both sides are batch-sized (per_doc ⊆ increment): a shuffled
        # hash join on doc_id — never a sort, never a broadcast whose
        # safety depends on how big the crawl batch is
        .join(per_doc.hint("shuffle_hash"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_candidates", F.lit(0)).cast("bigint").alias(
                "n_candidates"
            ),
            F.col("best_jaccard_x10k"),
            (F.coalesce("any_dup", F.lit(0)) == 0).cast("bigint").alias(
                "is_new"
            ),
        )
        .orderBy("doc_id")
    )


# --- DuckDB oracles ----------------------------------------------------------

def _shingle_cte(shingle_n: int = 3) -> str:
    return f"""
  toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
  shing AS (
    SELECT doc_id, sh FROM (
      SELECT doc_id, unnest(list_distinct(list_transform(
        generate_series(1, greatest(len(w) - {shingle_n - 1}, 1)),
        i -> array_to_string(w[i:i+{shingle_n - 1}], ' ')))) AS sh
      FROM toks) t
  )"""


def signatures_oracle(k: int = DEFAULT_K, shingle_n: int = 3) -> str:
    return f"""
WITH {_shingle_cte(shingle_n)},
  salted AS (
    SELECT doc_id, s.salt, sh
    FROM shing CROSS JOIN (SELECT unnest(generate_series(0, {k - 1})) AS salt) s
  )
SELECT doc_id, salt, MIN(md5(salt::VARCHAR || ':' || sh)) AS minhash
FROM salted GROUP BY doc_id, salt ORDER BY doc_id, salt
"""


def bands_oracle(k: int = DEFAULT_K, bands: int = DEFAULT_BANDS, shingle_n: int = 3) -> str:
    r = k // bands
    return f"""
WITH sigs AS ({signatures_oracle(k, shingle_n).strip()})
SELECT doc_id, CAST(salt // {r} AS INT) AS band,
       md5(string_agg(minhash, '|' ORDER BY salt, minhash)) AS band_hash
FROM sigs GROUP BY doc_id, CAST(salt // {r} AS INT)
ORDER BY doc_id, band
"""


def near_duplicates_oracle(
    threshold: float = 0.7, k: int = DEFAULT_K, bands: int = DEFAULT_BANDS,
    shingle_n: int = 3,
) -> str:
    return f"""
WITH bandt AS ({bands_oracle(k, bands, shingle_n).strip()}),
  cands AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bandt a JOIN bandt b
      ON a.band = b.band AND a.band_hash = b.band_hash
     AND a.doc_id < b.doc_id
  ),
  {_shingle_cte(shingle_n).strip()},
  shs AS (
    SELECT doc_id, list_distinct(list(sh)) AS shl FROM shing GROUP BY doc_id
  ),
  verified AS (
    SELECT doc_a, doc_b,
      len(list_intersect(sa.shl, sb.shl)) AS i,
      len(sa.shl) + len(sb.shl) - len(list_intersect(sa.shl, sb.shl)) AS u
    FROM cands
    JOIN shs sa ON sa.doc_id = doc_a
    JOIN shs sb ON sb.doc_id = doc_b
  )
SELECT doc_a, doc_b,
  CAST(FLOOR(i * 10000.0 / u) AS BIGINT) AS jaccard_x10k
FROM verified WHERE i * 10000 >= {int(round(threshold * 10000))} * u
ORDER BY doc_a, doc_b
"""


def _bands_sql(src: str, k: int, bands: int, shingle_n: int) -> str:
    """Band sketch for an arbitrary source CTE/table (the table-name-
    parameterized form of bands_oracle — same expressions)."""
    r = k // bands
    return f"""
    SELECT doc_id, CAST(salt // {r} AS INT) AS band,
           md5(string_agg(minhash, '|' ORDER BY salt, minhash)) AS band_hash
    FROM (
      SELECT doc_id, s.salt, MIN(md5(s.salt::VARCHAR || ':' || sh)) AS minhash
      FROM (
        SELECT doc_id, unnest(list_distinct(list_transform(
          generate_series(1, greatest(len(w) - {shingle_n - 1}, 1)),
          i -> array_to_string(w[i:i+{shingle_n - 1}], ' ')))) AS sh
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM {src})
      ) sh CROSS JOIN (SELECT unnest(generate_series(0, {k - 1})) AS salt) s
      GROUP BY doc_id, s.salt
    ) GROUP BY doc_id, CAST(salt // {r} AS INT)"""


def _shingle_list_sql(src: str, shingle_n: int) -> str:
    return f"""
    SELECT doc_id, list_distinct(list(sh)) AS shl FROM (
      SELECT doc_id, unnest(list_distinct(list_transform(
        generate_series(1, greatest(len(w) - {shingle_n - 1}, 1)),
        i -> array_to_string(w[i:i+{shingle_n - 1}], ' ')))) AS sh
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM {src})
    ) GROUP BY doc_id"""


def admission_rounds_oracle(
    threshold: float = 0.7, k: int = DEFAULT_K, bands: int = DEFAULT_BANDS,
    shingle_n: int = 3, rounds: int = 3,
) -> str:
    """Oracle for the STREAMING admission gate
    (streaming/admission.py) drained over ``rounds`` deterministic
    batches (documents split by doc_id % rounds, fed in remainder
    order): the final corpus is the chained fixpoint

        c_0 = batch_0   (empty corpus: everything admitted)
        c_i = c_{i-1} ∪ {d ∈ batch_i with no verified near-dup in c_{i-1}}

    Each round instantiates the same band/shingle/verify SQL as
    ``incremental_near_oracle`` with the PREVIOUS round's corpus CTE —
    so the streaming path (micro-batches, checkpoint WAL, partitioned
    state trees) hash-verifies against pure sequential SQL."""
    t = int(round(threshold * 10000))
    parts = [
        f"b{i} AS (SELECT doc_id, text FROM documents "
        f"WHERE doc_id % {rounds} = {i})"
        for i in range(rounds)
    ]
    parts.append("c0 AS (SELECT doc_id, text FROM b0)")
    for i in range(1, rounds):
        prev, inc, s = f"c{i - 1}", f"b{i}", str(i)
        parts += [
            f"cb{s} AS ({_bands_sql(prev, k, bands, shingle_n)})",
            f"ib{s} AS ({_bands_sql(inc, k, bands, shingle_n)})",
            f"""cands{s} AS (
    SELECT DISTINCT i.doc_id, c.doc_id AS corpus_id
    FROM ib{s} i JOIN cb{s} c
      ON i.band = c.band AND i.band_hash = c.band_hash
  )""",
            f"ish{s} AS ({_shingle_list_sql(inc, shingle_n)})",
            f"csh{s} AS ({_shingle_list_sql(prev, shingle_n)})",
            f"""dup{s} AS (
    SELECT DISTINCT cands{s}.doc_id
    FROM cands{s}
    JOIN ish{s} si ON si.doc_id = cands{s}.doc_id
    JOIN csh{s} sc ON sc.doc_id = cands{s}.corpus_id
    WHERE len(list_intersect(si.shl, sc.shl)) * 10000
       >= {t} * (len(si.shl) + len(sc.shl)
                 - len(list_intersect(si.shl, sc.shl)))
  )""",
            f"""c{s} AS (
    SELECT doc_id, text FROM c{i - 1}
    UNION ALL
    SELECT doc_id, text FROM b{i}
    WHERE doc_id NOT IN (SELECT doc_id FROM dup{s})
  )""",
        ]
    return (
        "WITH "
        + ",\n  ".join(parts)
        + f"\nSELECT doc_id FROM c{rounds - 1} ORDER BY doc_id"
    )


def incremental_near_oracle(
    threshold: float = 0.7, k: int = DEFAULT_K, bands: int = DEFAULT_BANDS,
    shingle_n: int = 3,
) -> str:
    """Oracle for incremental_near_duplicates over the documents table
    split by doc_id % 3 (corpus = remainder != 0, increment = 0 — the
    same split dedup_incremental_new uses)."""
    t = int(round(threshold * 10000))
    return f"""
WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
  inc AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0),
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
  CAST(COALESCE(n_candidates, 0) AS BIGINT) AS n_candidates,
  best_jaccard_x10k,
  CAST(CASE WHEN COALESCE(any_dup, 0) = 0 THEN 1 ELSE 0 END AS BIGINT)
    AS is_new
FROM inc LEFT JOIN agg ON inc.doc_id = agg.doc_id
ORDER BY inc.doc_id
"""
