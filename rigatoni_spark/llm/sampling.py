"""Deterministic sampling for training-data pipelines.

Reproducible subsampling is a core corpus operation (data mixes,
ablations, held-out splits). Random `.sample()` is partition-order
dependent and unreproducible across engines/runs; these operators
derive the keep/drop decision from ``md5(salt || key)`` instead:

- same row -> same decision, on any engine, any partitioning, any run;
- the fraction is enforced in expectation by comparing the hex digest
  (uniform over 16^32) against a precomputed hex threshold — a pure
  string comparison, identical in Spark and DuckDB (both emit lowercase
  hex), so every operator here is oracle-checkable;
- changing ``salt`` draws an independent sample (the analogue of a new
  seed).

All pure column expressions — no UDFs, no RNG, no driver state. The
filter is a narrow map over the scan: at 100 TB a 1% sample reads the
full input once and shuffles nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _threshold_hex(fraction: float) -> str:
    """First-8-hex-digit threshold: P(md5 < t) == fraction to ~6e-10.

    fraction 1.0 maps to 'g' — lexicographically after every hex
    digest in both engines — so keep-all strata really keep ALL rows
    (16**8 would be a 9-digit prefix and break the string compare).
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    if fraction >= 1.0:
        return "g"
    return format(int(round(fraction * 16**8)), "08x") + "0" * 24


def _digest(key_col: str, salt: str):
    return F.md5(F.concat(F.lit(f"{salt}:"), F.col(key_col).cast("string")))


def sample_fraction(
    documents: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
    salt: str = "s0",
) -> DataFrame:
    """Keep ~``fraction`` of rows, decided per-row by keyed hash."""
    return documents.filter(_digest(key_col, salt) < _threshold_hex(fraction))


def sample_fraction_oracle(
    fraction: float, key_col: str = "doc_id", salt: str = "s0"
) -> str:
    return (
        f"md5('{salt}:' || CAST({key_col} AS VARCHAR)) "
        f"< '{_threshold_hex(fraction)}'"
    )


def stratified_sample(
    documents: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "s0",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum keep fractions (the data-mix operator: e.g. keep 100%
    of low-resource languages, 10% of the dominant one). One scan, one
    narrow filter; the per-stratum threshold is a CASE over the strata
    column."""
    thr = F.lit(_threshold_hex(default_fraction))
    for value, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col) == value, F.lit(_threshold_hex(frac))
        ).otherwise(thr)
    return documents.filter(_digest(key_col, salt) < thr)


def stratified_sample_oracle(
    fractions: dict[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "s0",
    default_fraction: float = 0.0,
) -> str:
    cases = " ".join(
        f"WHEN {strata_col} = '{v}' THEN '{_threshold_hex(f)}'"
        for v, f in sorted(fractions.items())
    )
    return (
        f"md5('{salt}:' || CAST({key_col} AS VARCHAR)) < "
        f"(CASE {cases} ELSE '{_threshold_hex(default_fraction)}' END)"
    )


def sample_n_per_stratum(
    documents: DataFrame,
    n: int,
    strata_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "s0",
) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum — the deterministic
    reservoir: rank rows by keyed hash within the stratum, keep the
    first n. One shuffle on the strata key; the hash order is uniform,
    so the pick is an unbiased sample, and stable run-to-run."""
    w = Window.partitionBy(strata_col).orderBy(
        _digest(key_col, salt), F.col(key_col)
    )
    return (
        documents.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


def sample_n_per_stratum_oracle_cte(
    n: int,
    strata_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "s0",
    table: str = "documents",
) -> str:
    return f"""
  SELECT * EXCLUDE (_rn) FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY {strata_col}
      ORDER BY md5('{salt}:' || CAST({key_col} AS VARCHAR)), {key_col}
    ) AS _rn FROM {table}
  ) WHERE _rn <= {n}"""


def pack_sequences(
    documents: DataFrame,
    seq_len: int = 512,
    shard_col: str = "source",
) -> DataFrame:
    """Sequence packing: lay documents head-to-tail per shard and chunk
    the stream every ``seq_len`` tokens — the concatenate-and-chunk
    layout used to build fixed-length LM training sequences. Each doc
    gets its pack id, its token offset inside the pack, and whether it
    straddles a pack boundary (the fraction of straddlers is the
    packing-efficiency metric).

    Deterministic: the layout is a running token total per shard
    ordered by doc_id — same assignment on any engine or partitioning.
    Scale: ONE window per shard (hash-partition by shard, sort within);
    shards bound both the sort and any skew, so a 100 TB corpus packs
    as parallel per-shard streams — use a finer shard key (e.g. a hash
    bucket column) if shards outgrow executor memory.
    """
    n_tokens = F.size(F.split(F.col("text"), " "))
    w = (
        Window.partitionBy(shard_col)
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(n_tokens).over(w)
    start = (cum - n_tokens).cast("bigint")
    pack_id = F.floor(start / seq_len).cast("bigint")
    return documents.select(
        F.col(shard_col).alias("shard"),
        "doc_id",
        n_tokens.cast("bigint").alias("n_tokens"),
        pack_id.alias("pack_id"),
        (start % seq_len).alias("pack_offset"),
        (F.floor((cum - 1) / seq_len) > pack_id).alias("straddles"),
    ).orderBy("shard", "doc_id")


def pack_sequences_oracle(seq_len: int = 512, shard_col: str = "source") -> str:
    return f"""
WITH t AS (
  SELECT {shard_col} AS shard, doc_id,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
    SUM(len(string_split(text, ' '))) OVER (
      PARTITION BY {shard_col} ORDER BY doc_id
      ROWS UNBOUNDED PRECEDING) AS cum
  FROM documents
)
SELECT shard, doc_id, n_tokens,
  CAST(FLOOR((cum - n_tokens) * 1.0 / {seq_len}) AS BIGINT) AS pack_id,
  CAST((cum - n_tokens) % {seq_len} AS BIGINT) AS pack_offset,
  FLOOR((cum - 1) * 1.0 / {seq_len})
    > FLOOR((cum - n_tokens) * 1.0 / {seq_len}) AS straddles
FROM t ORDER BY shard, doc_id
"""


def training_shuffle(
    documents: DataFrame, seed: str = "epoch0", shards: int = 16
) -> DataFrame:
    """Deterministic training-order shuffle: every document gets a
    reproducible shard and a pseudo-random position within it (keyed
    md5 over seed+doc_id) — the randomize-then-shard step that turns a
    curated corpus into an LM training stream. Training order is
    shard-major: (shard 0 by position, shard 1 by position, ...).
    Changing ``seed`` re-shuffles (new epoch); same seed reproduces the
    exact order on any engine or cluster layout.

    Scale: shard from the digest's tail nibbles; position =
    row_number over a window PARTITIONED BY shard — shards process in
    parallel and a global ORDER BY would be the anti-pattern (Spark
    funnels a partition-less window through ONE task). The digest is
    uniform so shards are balanced regardless of corpus skew; writers
    consume (shard, shuffle_pos)-sorted output for sequential per-shard
    reads.
    """
    digest = _digest("doc_id", seed)
    shard = (
        F.conv(F.substring(digest, 25, 8), 16, 10).cast("bigint") % shards
    ).cast("int")
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return (
        documents.select(
            "doc_id", digest.alias("h"), shard.alias("shard")
        )
        .select(
            "doc_id",
            "shard",
            (F.row_number().over(w) - 1).cast("bigint").alias("shuffle_pos"),
        )
        .orderBy("shard", "shuffle_pos")
    )


def training_shuffle_oracle(seed: str = "epoch0", shards: int = 16) -> str:
    return f"""
WITH d AS (
  SELECT doc_id, md5('{seed}:' || CAST(doc_id AS VARCHAR)) AS h,
    CAST(CAST(('0x' || substring(md5('{seed}:' || CAST(doc_id AS VARCHAR)),
      25, 8))::UBIGINT AS BIGINT) % {shards} AS INT) AS shard
  FROM documents
)
SELECT doc_id, shard,
  CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id) - 1
    AS BIGINT) AS shuffle_pos
FROM d ORDER BY shard, shuffle_pos
"""


def train_val_test_split(
    documents: DataFrame,
    val_fraction: float = 0.1,
    test_fraction: float = 0.1,
    salt: str = "split0",
) -> DataFrame:
    """Deterministic 3-way corpus split with per-(split, lang)
    composition counts — the hold-out carving step every training run
    starts with. Membership is a pure function of (salt, doc_id): the
    keyed digest lands in [0,1) and two thresholds cut train/val/test,
    so the split is reproducible across engines, partitionings, and
    reruns, and documents never migrate between splits when the corpus
    grows (a row-number split would reshuffle everything on every
    ingest).

    Scale: split assignment is a scan-stage projection (no shuffle);
    the composition count is one map-side-combined hash agg over
    (split, lang) — cardinality 3 x |langs|.
    """
    d = _digest("doc_id", salt)
    t_val = _threshold_hex(val_fraction)
    t_test = _threshold_hex(val_fraction + test_fraction)
    split = (
        F.when(d < t_val, "val")
        .when(d < t_test, "test")
        .otherwise("train")
    )
    return (
        documents.select(split.alias("split"), "lang")
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("split", "lang")
    )


def train_val_test_oracle(
    val_fraction: float = 0.1,
    test_fraction: float = 0.1,
    salt: str = "split0",
) -> str:
    t_val = _threshold_hex(val_fraction)
    t_test = _threshold_hex(val_fraction + test_fraction)
    return f"""
SELECT CASE
    WHEN md5('{salt}:' || CAST(doc_id AS VARCHAR)) < '{t_val}' THEN 'val'
    WHEN md5('{salt}:' || CAST(doc_id AS VARCHAR)) < '{t_test}' THEN 'test'
    ELSE 'train' END AS split,
  lang, COUNT(*) AS n_docs
FROM documents GROUP BY split, lang ORDER BY split, lang
"""
