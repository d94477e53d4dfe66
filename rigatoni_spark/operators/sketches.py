"""Mergeable cardinality sketches: a deterministic HyperLogLog whose
register table AND estimate are exact integer arithmetic, so the whole
sketch hash-matches a SQL oracle (unlike approx_count_distinct, whose
HLL++ internals are engine-private).

Why this exists at 100 TB: COUNT(DISTINCT key) shuffles every distinct
key; the HLL register table is 1024 rows regardless of input size, the
per-register MAX is computed map-side (partial aggregation), and two
sketches merge by elementwise MAX — the canonical distributed
cardinality shape (Flajolet et al., "HyperLogLog", AofA 2007).

Determinism contract:
- hash = first 15 hex chars of md5(utf8(key)) -> 60-bit integer
  (engine-identical; 15 chars keeps the value inside a signed 64-bit)
- bucket = h % 1024 (p=10); w = h div 1024 (50 payload bits)
- rho = 51 - bitlength(w), with rho = 51 when w = 0 — bitlength via
  base-2 string length, a pure integer/string op in both engines
- estimate = floor(ALPHA_X1E6 * m^2 * 2^51 / S) where
  S = sum over registers of 2^(51 - max_rho), absent registers
  contributing 2^51 — S <= 1024 * 2^51 fits a signed 64-bit, and each
  2^x term (x <= 51) is exact in the double power() both engines fold
  before the integral cast. No float survives into any output column.
- the small-range (linear counting) correction kicks in exactly as in
  the paper — V empty registers and raw < 2.5m -> m * ln(m/V) — but
  ln never executes in either engine: V has only m possible values,
  so ln(m/V) ships as a precomputed 1024-entry integer literal table
  (LN_M_OVER_V_X1E6) embedded in both the Spark plan and the oracle
  SQL. p=10's standard error is 1.04/sqrt(1024) ~ 3.3%, pinned by
  test against the exact count.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

P_BITS = 10
M_REGISTERS = 1 << P_BITS
# round(alpha_1024 * 1e6); alpha_m = 0.7213 / (1 + 1.079/m)
ALPHA_X1E6 = 720541
# ALPHA_X1E6 * m^2 * 2^51 — the estimate numerator, exact
_NUMERATOR = ALPHA_X1E6 * M_REGISTERS * M_REGISTERS * (1 << 51)
# linear-counting table: entry V (1-indexed) = round(ln(m/V) * 1e6).
# Both engines read these literals — the only ln() ever evaluated is
# this driver-side comprehension, so engine libm differences can't
# split the hash. V = m (empty input) -> ln(1) = 0 -> estimate 0.
LN_M_OVER_V_X1E6 = [
    round(math.log(M_REGISTERS / v) * 1_000_000)
    for v in range(1, M_REGISTERS + 1)
]
# paper threshold: use linear counting while raw E < 2.5 m
_SMALL_RANGE_X1E6 = 5 * M_REGISTERS * 1_000_000 // 2


def hll_registers(df: DataFrame, col: str) -> DataFrame:
    """The 1024-row register table (bucket, r = max rho). This is the
    mergeable object: union two tables and re-run max to combine."""
    h = F.conv(
        F.substring(F.md5(F.col(col).cast("string").cast("binary")), 1, 15),
        16,
        10,
    ).cast("bigint")
    prepared = df.select(h.alias("h")).select(
        (F.col("h") % M_REGISTERS).alias("bucket"),
        F.expr(f"h div {M_REGISTERS}").alias("w"),
    )
    rho = F.when(F.col("w") == 0, F.lit(51)).otherwise(
        F.lit(51) - F.length(F.conv(F.col("w").cast("string"), 10, 2))
    )
    return (
        prepared.select("bucket", rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("r"))
    )


def hll_distinct(df: DataFrame, col: str) -> DataFrame:
    """One-row cardinality estimate of ``col``: (m, n_registers_set,
    s_scaled, estimate_x1e6) — all BIGINT, all exact."""
    return hll_estimate_from_registers(hll_registers(df, col))


def hll_estimate_from_registers(regs: DataFrame) -> DataFrame:
    """Fold a (bucket, r) register table — batch-built, streamed, or
    merged from several sketches — into the one-row estimate. Split
    out so a STREAMING query can maintain just the single-aggregation
    register table online (chained aggregations are not streamable)
    and read the estimate off the drained/stored table on demand."""
    term = F.expr("CAST(power(2, 51 - r) AS BIGINT)")
    return regs.agg(
        F.lit(M_REGISTERS).alias("m"),
        F.count(F.lit(1)).alias("n_registers_set"),
        (
            F.coalesce(F.sum(term), F.lit(0))
            + (F.lit(M_REGISTERS) - F.count(F.lit(1))) * F.lit(1 << 51)
        ).alias("s_scaled"),
    ).select(
        "m",
        "n_registers_set",
        "s_scaled",
        F.expr(
            f"CAST(CAST({_NUMERATOR} AS DECIMAL(38,0)) div s_scaled"
            " AS BIGINT)"
        ).alias("_raw_x1e6"),
    ).select(
        "m",
        "n_registers_set",
        "s_scaled",
        F.when(
            (F.col("n_registers_set") < M_REGISTERS)
            & (F.col("_raw_x1e6") < _SMALL_RANGE_X1E6),
            F.lit(M_REGISTERS)
            * F.element_at(
                F.array(*[F.lit(x) for x in LN_M_OVER_V_X1E6]),
                (F.lit(M_REGISTERS) - F.col("n_registers_set")).cast("int"),
            ).cast("bigint"),
        )
        .otherwise(F.col("_raw_x1e6"))
        .alias("estimate_x1e6"),
    )


def hll_distinct_oracle(table: str, col: str) -> str:
    ln_list = "[" + ", ".join(str(x) for x in LN_M_OVER_V_X1E6) + "]"
    return f"""
WITH hashed AS (
  SELECT ('0x' || substring(md5(CAST({col} AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM {table}),
split AS (
  SELECT h % {M_REGISTERS} AS bucket, h // {M_REGISTERS} AS w FROM hashed),
regs AS (
  SELECT bucket,
         MAX(CASE WHEN w = 0 THEN 51
                  ELSE 51 - length(bin(w)) END) AS r
  FROM split GROUP BY bucket),
folded AS (
  SELECT COUNT(*) AS n_registers_set,
         CAST(COALESCE(SUM(CAST(power(2, 51 - r) AS BIGINT)), 0)
              + ({M_REGISTERS} - COUNT(*)) * {1 << 51}::BIGINT
              AS BIGINT) AS s_scaled
  FROM regs),
raw AS (
  SELECT n_registers_set, s_scaled,
         CAST({_NUMERATOR}::HUGEINT // s_scaled::HUGEINT AS BIGINT)
           AS raw_x1e6
  FROM folded)
SELECT CAST({M_REGISTERS} AS BIGINT) AS m,
       n_registers_set, s_scaled,
       CASE WHEN n_registers_set < {M_REGISTERS}
             AND raw_x1e6 < {_SMALL_RANGE_X1E6}
            THEN {M_REGISTERS}::BIGINT *
                 ({ln_list}[{M_REGISTERS} - n_registers_set])::BIGINT
            ELSE raw_x1e6 END AS estimate_x1e6
FROM raw
"""


def hll_distinct_by(df: DataFrame, col: str, group_col: str) -> DataFrame:
    """Grouped HLL: one cardinality estimate PER ``group_col`` value —
    the per-series twin of :func:`hll_distinct` (same register layout,
    estimator, and small-range linear counting, keyed by the group).
    The canonical 100 TB per-key-distinct shape: the register table is
    |groups| x 1024 rows regardless of input size, map-side partial MAX
    crushes the explode before the exchange, and no count_distinct
    expansion ever happens."""
    h = F.conv(
        F.substring(F.md5(F.col(col).cast("string").cast("binary")), 1, 15),
        16,
        10,
    ).cast("bigint")
    prepared = df.select(F.col(group_col).alias("grp"), h.alias("h")).select(
        "grp",
        (F.col("h") % M_REGISTERS).alias("bucket"),
        F.expr(f"h div {M_REGISTERS}").alias("w"),
    )
    rho = F.when(F.col("w") == 0, F.lit(51)).otherwise(
        F.lit(51) - F.length(F.conv(F.col("w").cast("string"), 10, 2))
    )
    regs = (
        prepared.select("grp", "bucket", rho.alias("rho"))
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("r"))
    )
    term = F.expr("CAST(power(2, 51 - r) AS BIGINT)")
    return (
        regs.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_registers_set"),
            (
                F.coalesce(F.sum(term), F.lit(0))
                + (F.lit(M_REGISTERS) - F.count(F.lit(1))) * F.lit(1 << 51)
            ).alias("s_scaled"),
        )
        .select(
            "grp",
            "n_registers_set",
            "s_scaled",
            F.expr(
                f"CAST(CAST({_NUMERATOR} AS DECIMAL(38,0)) div s_scaled"
                " AS BIGINT)"
            ).alias("_raw_x1e6"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_registers_set",
            "s_scaled",
            F.when(
                (F.col("n_registers_set") < M_REGISTERS)
                & (F.col("_raw_x1e6") < _SMALL_RANGE_X1E6),
                F.lit(M_REGISTERS)
                * F.element_at(
                    F.array(*[F.lit(x) for x in LN_M_OVER_V_X1E6]),
                    (F.lit(M_REGISTERS) - F.col("n_registers_set")).cast(
                        "int"
                    ),
                ).cast("bigint"),
            )
            .otherwise(F.col("_raw_x1e6"))
            .alias("estimate_x1e6"),
        )
        .orderBy(group_col)
    )


def hll_distinct_by_oracle(table: str, col: str, group_col: str) -> str:
    ln_list = "[" + ", ".join(str(x) for x in LN_M_OVER_V_X1E6) + "]"
    return f"""
WITH hashed AS (
  SELECT {group_col} AS grp,
         ('0x' || substring(md5(CAST({col} AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM {table}),
split AS (
  SELECT grp, h % {M_REGISTERS} AS bucket, h // {M_REGISTERS} AS w
  FROM hashed),
regs AS (
  SELECT grp, bucket,
         MAX(CASE WHEN w = 0 THEN 51
                  ELSE 51 - length(bin(w)) END) AS r
  FROM split GROUP BY grp, bucket),
folded AS (
  SELECT grp, COUNT(*) AS n_registers_set,
         CAST(COALESCE(SUM(CAST(power(2, 51 - r) AS BIGINT)), 0)
              + ({M_REGISTERS} - COUNT(*)) * {1 << 51}::BIGINT
              AS BIGINT) AS s_scaled
  FROM regs GROUP BY grp),
raw AS (
  SELECT grp, n_registers_set, s_scaled,
         CAST({_NUMERATOR}::HUGEINT // s_scaled::HUGEINT AS BIGINT)
           AS raw_x1e6
  FROM folded)
SELECT grp AS {group_col},
       n_registers_set, s_scaled,
       CASE WHEN n_registers_set < {M_REGISTERS}
             AND raw_x1e6 < {_SMALL_RANGE_X1E6}
            THEN {M_REGISTERS}::BIGINT *
                 ({ln_list}[{M_REGISTERS} - n_registers_set])::BIGINT
            ELSE raw_x1e6 END AS estimate_x1e6
FROM raw ORDER BY {group_col}
"""


CMS_DEPTH = 4
CMS_WIDTH = 512


def _cms_cell(col, row: int):
    """(row, col) cell for value ``col`` in hash row ``row``: the same
    md5('row:value') 60-bit derivation as the HLL hash, mod width."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{row}:"), col.cast("string")).cast("binary")),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    return h % CMS_WIDTH


def cms_sketch(df: DataFrame, col: str) -> DataFrame:
    """Count-Min sketch of ``col``: a (row, col) -> counter table of at
    most CMS_DEPTH x CMS_WIDTH rows, built by one map-side-combined
    aggregation per hash row (unioned before the shuffle — still a
    single exchange of <= 2048 live cells). Sketches merge by summing
    counters cell-wise; a point estimate is the MIN over the
    CMS_DEPTH cells a key hashes to, an overestimate by at most
    2N/CMS_WIDTH with probability 1 - 2^-CMS_DEPTH (Cormode &
    Muthukrishnan 2005). At 100 TB the sketch replaces a full
    per-key count shuffle with a constant-size table."""
    src = df.select(F.col(col).alias("v"))
    exploded = src.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).alias("row"),
                    _cms_cell(F.col("v"), r).alias("cell"),
                )
                for r in range(CMS_DEPTH)
            ])
        ).alias("rc")
    )
    return (
        exploded.select("rc.row", "rc.cell")
        .groupBy("row", "cell")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_point_estimates(
    df: DataFrame,
    col: str,
    probes: DataFrame | None = None,
    sketch: DataFrame | None = None,
) -> DataFrame:
    """CMS point estimate for every distinct value of ``col`` (or the
    1-column ``probes`` frame): min over the key's CMS_DEPTH cells.
    The sketch side is <= 2048 rows -> broadcast to the probe join.
    Pass ``sketch`` to probe a prebuilt/streamed/merged counter table
    instead of building one from ``df`` (mirrors
    hll_estimate_from_registers)."""
    if sketch is None:
        sketch = cms_sketch(df, col)
    keys = (probes or df.select(F.col(col))).select(
        F.col(col).alias("key")
    ).distinct()
    probe_cells = keys.select(
        "key",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).alias("row"),
                    _cms_cell(F.col("key"), r).alias("cell"),
                )
                for r in range(CMS_DEPTH)
            ])
        ).alias("rc"),
    ).select("key", "rc.row", "rc.cell")
    return (
        probe_cells.join(F.broadcast(sketch), ["row", "cell"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce("n", F.lit(0))).alias("est_count"))
        .orderBy("key")
    )


def cms_estimates_oracle(table: str, col: str) -> str:
    cell = (
        "('0x' || substring(md5(CAST(r AS VARCHAR) || ':' || "
        "CAST({v} AS VARCHAR)), 1, 15))::BIGINT % {w}"
    )
    return f"""
WITH src AS (SELECT {col} AS v FROM {table}),
cells AS (
  SELECT r, {cell.format(v='v', w=CMS_WIDTH)} AS cell
  FROM src, UNNEST(generate_series(0, {CMS_DEPTH - 1})) t(r)),
sketch AS (
  SELECT r, cell, COUNT(*) AS n FROM cells GROUP BY r, cell),
keys AS (SELECT DISTINCT {col} AS key FROM {table}),
probe AS (
  SELECT key, r, {cell.format(v='key', w=CMS_WIDTH)} AS cell
  FROM keys, UNNEST(generate_series(0, {CMS_DEPTH - 1})) t(r))
SELECT p.key, MIN(COALESCE(s.n, 0)) AS est_count
FROM probe p LEFT JOIN sketch s ON s.r = p.r AND s.cell = p.cell
GROUP BY p.key ORDER BY p.key
"""


BLOOM_BITS = 8192
BLOOM_HASHES = 4


def bloom_bits(df: DataFrame, col: str) -> DataFrame:
    """Bloom filter of ``col`` as a table of set bit positions (at most
    BLOOM_BITS rows, typically far fewer) — the runtime-filter shape:
    build on the join key of the SMALL side, broadcast the bit table,
    and discard probe rows whose key is definitely absent before the
    real join's shuffle. Filters merge by union/distinct. Positions
    come from BLOOM_HASHES md5-derived integer hashes (same derivation
    as the HLL/CMS cells), so build and probe agree across engines."""
    src = df.select(F.col(col).alias("v")).where(F.col("v").isNotNull())
    return (
        src.select(
            F.explode(
                F.array(*[
                    _bloom_pos(F.col("v"), r) for r in range(BLOOM_HASHES)
                ])
            ).alias("pos")
        )
        .distinct()
    )


def _bloom_pos(col, row: int):
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{row}:"), col.cast("string")).cast("binary")),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    return h % BLOOM_BITS


def bloom_semijoin_report(
    build: DataFrame,
    build_col: str,
    probe: DataFrame,
    probe_col: str,
    bits: DataFrame | None = None,
) -> DataFrame:
    """One-row audit of a Bloom runtime filter: probe keys against the
    filter built on ``build_col`` and count definite misses (safe to
    drop before the join), possible members, true members, and false
    positives. The no-false-negative contract (every true member tests
    possible) is what makes dropping definite misses sound. Pass
    ``bits`` to audit a prebuilt/streamed/merged filter (mirrors the
    other sketch splits)."""
    if bits is None:
        bits = bloom_bits(build, build_col)
    keys = probe.select(F.col(probe_col).alias("key")).where(
        F.col("key").isNotNull()
    ).distinct()
    probed = (
        keys.select(
            "key",
            F.explode(
                F.array(*[
                    _bloom_pos(F.col("key"), r) for r in range(BLOOM_HASHES)
                ])
            ).alias("pos"),
        )
        .join(
            F.broadcast(bits.withColumn("hit", F.lit(1))), ["pos"], "left"
        )
        .groupBy("key")
        .agg(
            (F.min(F.coalesce("hit", F.lit(0))) == 1).cast("int").alias(
                "possible"
            )
        )
    )
    actual = (
        build.select(F.col(build_col).alias("key"))
        .where(F.col("key").isNotNull())
        .distinct()
        .withColumn("present", F.lit(1))
    )
    return (
        probed.join(actual.hint("shuffle_hash"), ["key"], "left")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("possible").alias("n_possible"),
            F.sum(1 - F.col("possible")).alias("n_definite_miss"),
            F.sum(F.coalesce("present", F.lit(0))).alias("n_true_member"),
            F.sum(
                F.col("possible") * (1 - F.coalesce("present", F.lit(0)))
            ).alias("n_false_positive"),
            F.sum(
                (1 - F.col("possible")) * F.coalesce("present", F.lit(0))
            ).alias("n_false_negative"),
        )
    )


def bloom_report_oracle(
    build_table: str, build_col: str, probe_table: str, probe_col: str
) -> str:
    pos = (
        "('0x' || substring(md5(CAST(r AS VARCHAR) || ':' || "
        "CAST({v} AS VARCHAR)), 1, 15))::BIGINT % {m}"
    )
    return f"""
WITH bits AS (
  SELECT DISTINCT {pos.format(v=build_col, m=BLOOM_BITS)} AS pos
  FROM {build_table}, UNNEST(generate_series(0, {BLOOM_HASHES - 1})) t(r)
  WHERE {build_col} IS NOT NULL),
keys AS (
  SELECT DISTINCT {probe_col} AS key FROM {probe_table}
  WHERE {probe_col} IS NOT NULL),
probe_pos AS (
  SELECT k.key, {pos.format(v='k.key', m=BLOOM_BITS)} AS pos
  FROM keys k, UNNEST(generate_series(0, {BLOOM_HASHES - 1})) t(r)),
probed AS (
  SELECT pp.key,
         CAST(MIN(CASE WHEN b.pos IS NULL THEN 0 ELSE 1 END) = 1 AS INT)
           AS possible
  FROM probe_pos pp
  LEFT JOIN bits b ON b.pos = pp.pos
  GROUP BY pp.key),
actual AS (
  SELECT DISTINCT {build_col} AS key, 1 AS present FROM {build_table}
  WHERE {build_col} IS NOT NULL)
SELECT COUNT(*) AS n_keys,
       CAST(SUM(possible) AS BIGINT) AS n_possible,
       CAST(SUM(1 - possible) AS BIGINT) AS n_definite_miss,
       CAST(SUM(COALESCE(present, 0)) AS BIGINT) AS n_true_member,
       CAST(SUM(possible * (1 - COALESCE(present, 0))) AS BIGINT)
         AS n_false_positive,
       CAST(SUM((1 - possible) * COALESCE(present, 0)) AS BIGINT)
         AS n_false_negative
FROM probed p LEFT JOIN actual a USING (key)
"""


HDR_SIG_BITS = 5  # 5 significant bits -> <= 2^-4 ~ 6.25% relative error


def hdr_histogram(df: DataFrame, col: str) -> DataFrame:
    """HDR-style log histogram of a positive numeric column in
    milli-units: each value keeps its top HDR_SIG_BITS significant
    bits, so bucket width is always <= value / 16. The histogram is
    the mergeable object (bins add); its size is bounded by
    16 x bitlength(max value) regardless of input rows.

    Integer-deterministic: v = floor(value * 1000) clamped to >= 1
    (floor of the same IEEE double product in both engines), bitlength
    via base-2 string length, shifts via exact power-of-two division.
    Columns: shift, top5 (the kept bits), lower_milli/upper_milli
    bucket bounds, n."""
    v = F.greatest(
        F.lit(1).cast("bigint"),
        F.floor(F.col(col).cast("double") * 1000).cast("bigint"),
    )
    src = df.select(v.alias("v"))
    e = F.length(F.conv(F.col("v").cast("string"), 10, 2))
    shift = F.greatest(e - HDR_SIG_BITS, F.lit(0))
    pow_shift = F.expr("CAST(power(2, shift) AS BIGINT)")
    binned = src.select("v", shift.alias("shift")).select(
        "shift",
        F.expr(f"v div CAST(power(2, shift) AS BIGINT)").alias("top5"),
    )
    return (
        binned.groupBy("shift", "top5")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "shift",
            "top5",
            (F.col("top5") * pow_shift).alias("lower_milli"),
            ((F.col("top5") + 1) * pow_shift - 1).alias("upper_milli"),
            "n",
        )
    )


def hdr_quantiles(
    df: DataFrame, col: str, hist: DataFrame | None = None
) -> DataFrame:
    """One-row p50/p90/p99 estimates (bucket midpoints, milli-units)
    from the mergeable histogram: cumulative counts over the <= ~1000
    ordered bins, first bin whose cumulative count reaches ceil(q*N).
    The rank arithmetic is pure integers, so estimates hash-match the
    SQL oracle; accuracy (<= 2^-4 relative) is pinned separately
    against exact percentiles in pytest. Pass ``hist`` to fold a
    prebuilt/streamed/merged histogram instead (mirrors the HLL/CMS
    splits)."""
    if hist is None:
        hist = hdr_histogram(df, col)
    w = (
        Window.orderBy("lower_milli")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        "lower_milli",
        "upper_milli",
        F.sum("n").over(w).alias("cum"),
        F.sum("n").over(
            Window.orderBy("lower_milli").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("total"),
    )
    mid = (F.col("lower_milli") + F.col("upper_milli")) / 2

    def pick(q_pct: int):
        rank = F.expr(f"CAST(({q_pct} * total + 99) div 100 AS BIGINT)")
        return F.min(
            F.when(F.col("cum") >= rank, F.floor(mid).cast("bigint"))
        ).alias(f"p{q_pct}_milli")

    return cum.agg(
        F.max("total").alias("n_events"), pick(50), pick(90), pick(99)
    )


def hdr_quantiles_oracle(table: str, col: str) -> str:
    return f"""
WITH src AS (
  SELECT GREATEST(1, CAST(FLOOR(CAST({col} AS DOUBLE) * 1000) AS BIGINT))
           AS v
  FROM {table}),
binned AS (
  SELECT GREATEST(length(bin(v)) - {HDR_SIG_BITS}, 0) AS shift, v
  FROM src),
hist AS (
  SELECT shift, v // CAST(power(2, shift) AS BIGINT) AS top5,
         COUNT(*) AS n
  FROM binned GROUP BY 1, 2),
bounds AS (
  SELECT shift, top5,
         top5 * CAST(power(2, shift) AS BIGINT) AS lower_milli,
         (top5 + 1) * CAST(power(2, shift) AS BIGINT) - 1 AS upper_milli,
         n
  FROM hist),
cum AS (
  SELECT lower_milli, upper_milli,
         SUM(n) OVER (ORDER BY lower_milli
                      ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(n) OVER () AS total
  FROM bounds)
SELECT CAST(MAX(total) AS BIGINT) AS n_events,
       CAST(MIN(CASE WHEN cum >= (50 * total + 99) // 100
                THEN (lower_milli + upper_milli) // 2 END) AS BIGINT)
         AS p50_milli,
       CAST(MIN(CASE WHEN cum >= (90 * total + 99) // 100
                THEN (lower_milli + upper_milli) // 2 END) AS BIGINT)
         AS p90_milli,
       CAST(MIN(CASE WHEN cum >= (99 * total + 99) // 100
                THEN (lower_milli + upper_milli) // 2 END) AS BIGINT)
         AS p99_milli
FROM cum
"""


KMV_K = 256


def _kmv_hash(col) -> Column:
    return F.conv(
        F.substring(F.md5(col.cast("string").cast("binary")), 1, 15),
        16,
        10,
    ).cast("bigint")


def kmv_sketch(df: DataFrame, col: str) -> DataFrame:
    """KMV (k-minimum-values / theta) sketch: the KMV_K smallest
    DISTINCT 60-bit hashes of ``col``. The piece HLL lacks: two KMV
    sketches support SET ALGEBRA — union is the k smallest of the
    merged sketches, intersection estimates from minhash overlap —
    while staying k rows regardless of input. The k-smallest-distinct
    plan is a map-side partial top-k (TakeOrderedAndProject), not a
    global sort."""
    return (
        df.select(_kmv_hash(F.col(col)).alias("h"))
        .where(F.col("h").isNotNull())
        .distinct()
        .orderBy("h")
        .limit(KMV_K)
    )


def _kmv_estimate(sk: DataFrame) -> Column:
    """(k-1) * 2^60 / h_k when the sketch is full, else the exact row
    count (fewer distinct values than k) — integer division only."""
    return F.when(
        F.count(F.lit(1)) >= KMV_K,
        F.expr(f"CAST({(KMV_K - 1) * (1 << 60)} AS DECIMAL(38,0)) div MAX(h)"),
    ).otherwise(F.count(F.lit(1)))


def kmv_set_report(
    a: DataFrame, a_col: str, b: DataFrame, b_col: str
) -> DataFrame:
    """One-row set-algebra report from two KMV sketches: estimated
    distinct of each side, of the union, of the intersection, and
    Jaccard x1e4 — the theta-sketch workflow (Dasgupta et al.,
    "Theta sketch framework", 2016) in exact integer arithmetic.

    Intersection = (overlap among the union sketch's k minhashes / k)
    * union estimate; every operand is a BIGINT and every division is
    an integral div, so the report hash-matches the SQL oracle."""
    sk_a = kmv_sketch(a, a_col).withColumn("in_a", F.lit(1))
    sk_b = kmv_sketch(b, b_col).withColumn("in_b", F.lit(1))
    # full outer can't broadcast; without the hint Spark picks SMJ for
    # it even at 256 rows a side (the repo-wide zero-SMJ invariant)
    merged = (
        sk_a.join(sk_b.hint("shuffle_hash"), ["h"], "full")
        .select(
            "h",
            F.coalesce("in_a", F.lit(0)).alias("in_a"),
            F.coalesce("in_b", F.lit(0)).alias("in_b"),
        )
        .orderBy("h")
        .limit(KMV_K)
    )
    est_a = sk_a.agg(_kmv_estimate(sk_a).alias("e")).select(
        F.col("e").cast("bigint").alias("est_a")
    )
    est_b = sk_b.agg(_kmv_estimate(sk_b).alias("e")).select(
        F.col("e").cast("bigint").alias("est_b")
    )
    union_fold = merged.agg(
        F.count(F.lit(1)).alias("n_union_sketch"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_overlap"),
        _kmv_estimate(merged).cast("bigint").alias("est_union"),
    )
    return (
        union_fold.join(F.broadcast(est_a)).join(F.broadcast(est_b))
        .select(
            "est_a",
            "est_b",
            "est_union",
            F.expr(
                "CAST((n_overlap * est_union) div n_union_sketch AS BIGINT)"
            ).alias("est_intersection"),
            F.expr(
                "CAST((n_overlap * 10000) div n_union_sketch AS BIGINT)"
            ).alias("jaccard_x1e4"),
        )
    )


def kmv_report_oracle(
    a_table: str, a_col: str, a_where: str, b_table: str, b_col: str,
    b_where: str,
) -> str:
    h = (
        "('0x' || substring(md5(CAST({v} AS VARCHAR)), 1, 15))::BIGINT"
    )
    est = (
        "CASE WHEN COUNT(*) >= {k} THEN "
        "CAST({num}::HUGEINT // MAX(h)::HUGEINT AS BIGINT) "
        "ELSE COUNT(*) END"
    ).format(k=KMV_K, num=(KMV_K - 1) * (1 << 60))
    return f"""
WITH sk_a AS (
  SELECT DISTINCT {h.format(v=a_col)} AS h FROM {a_table}
  WHERE {a_where} ORDER BY h LIMIT {KMV_K}),
sk_b AS (
  SELECT DISTINCT {h.format(v=b_col)} AS h FROM {b_table}
  WHERE {b_where} ORDER BY h LIMIT {KMV_K}),
merged AS (
  SELECT COALESCE(a.h, b.h) AS h,
         CASE WHEN a.h IS NULL THEN 0 ELSE 1 END AS in_a,
         CASE WHEN b.h IS NULL THEN 0 ELSE 1 END AS in_b
  FROM sk_a a FULL JOIN sk_b b USING (h)
  ORDER BY 1 LIMIT {KMV_K}),
folds AS (
  SELECT COUNT(*) AS n_union_sketch,
         CAST(SUM(in_a * in_b) AS BIGINT) AS n_overlap,
         {est} AS est_union
  FROM merged),
ea AS (SELECT {est} AS est_a FROM sk_a),
eb AS (SELECT {est} AS est_b FROM sk_b)
SELECT est_a, est_b, est_union,
       CAST((n_overlap * est_union) // n_union_sketch AS BIGINT)
         AS est_intersection,
       CAST((n_overlap * 10000) // n_union_sketch AS BIGINT)
         AS jaccard_x1e4
FROM folds, ea, eb
"""


def hdr_histogram_by(df: DataFrame, key_col: str, col: str) -> DataFrame:
    """Per-key HDR histogram: the grouped form of :func:`hdr_histogram`
    — one map-side-combined aggregation keyed on (key, shift, top5),
    |keys| x ~1000 bins regardless of rows. Merge by bin addition
    within each key."""
    v = F.greatest(
        F.lit(1).cast("bigint"),
        F.floor(F.col(col).cast("double") * 1000).cast("bigint"),
    )
    src = df.select(F.col(key_col).alias("key"), v.alias("v"))
    e = F.length(F.conv(F.col("v").cast("string"), 10, 2))
    shift = F.greatest(e - HDR_SIG_BITS, F.lit(0))
    pow_shift = F.expr("CAST(power(2, shift) AS BIGINT)")
    binned = src.select("key", "v", shift.alias("shift")).select(
        "key",
        "shift",
        F.expr("v div CAST(power(2, shift) AS BIGINT)").alias("top5"),
    )
    return (
        binned.groupBy("key", "shift", "top5")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "key",
            "shift",
            "top5",
            (F.col("top5") * pow_shift).alias("lower_milli"),
            ((F.col("top5") + 1) * pow_shift - 1).alias("upper_milli"),
            "n",
        )
    )


def hdr_quantiles_by(df: DataFrame, key_col: str, col: str) -> DataFrame:
    """Per-key p50/p90/p99 from the grouped histogram: the cumulative
    window partitions by key, so every series' quantiles come out of
    ONE pass over the constant-size bin table — the grouped-percentile
    shape that replaces a per-key full sort at 100 TB."""
    hist = hdr_histogram_by(df, key_col, col)
    cum_w = (
        Window.partitionBy("key")
        .orderBy("lower_milli")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot_w = Window.partitionBy("key").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = hist.select(
        "key",
        "lower_milli",
        "upper_milli",
        F.sum("n").over(cum_w).alias("cum"),
        F.sum("n").over(tot_w).alias("total"),
    )
    mid = (F.col("lower_milli") + F.col("upper_milli")) / 2

    def pick(q_pct: int):
        rank = F.expr(f"CAST(({q_pct} * total + 99) div 100 AS BIGINT)")
        return F.min(
            F.when(F.col("cum") >= rank, F.floor(mid).cast("bigint"))
        ).alias(f"p{q_pct}_milli")

    return (
        cum.groupBy("key")
        .agg(F.max("total").alias("n_events"), pick(50), pick(90), pick(99))
        .orderBy("key")
    )


def hdr_quantiles_by_oracle(table: str, key_col: str, col: str) -> str:
    return f"""
WITH src AS (
  SELECT {key_col} AS key,
         GREATEST(1, CAST(FLOOR(CAST({col} AS DOUBLE) * 1000) AS BIGINT))
           AS v
  FROM {table}),
binned AS (
  SELECT key, GREATEST(length(bin(v)) - {HDR_SIG_BITS}, 0) AS shift, v
  FROM src),
hist AS (
  SELECT key, shift, v // CAST(power(2, shift) AS BIGINT) AS top5,
         COUNT(*) AS n
  FROM binned GROUP BY 1, 2, 3),
bounds AS (
  SELECT key, shift, top5,
         top5 * CAST(power(2, shift) AS BIGINT) AS lower_milli,
         (top5 + 1) * CAST(power(2, shift) AS BIGINT) - 1 AS upper_milli,
         n
  FROM hist),
cum AS (
  SELECT key, lower_milli, upper_milli,
         SUM(n) OVER (PARTITION BY key ORDER BY lower_milli
                      ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(n) OVER (PARTITION BY key) AS total
  FROM bounds)
SELECT key, CAST(MAX(total) AS BIGINT) AS n_events,
       CAST(MIN(CASE WHEN cum >= (50 * total + 99) // 100
                THEN (lower_milli + upper_milli) // 2 END) AS BIGINT)
         AS p50_milli,
       CAST(MIN(CASE WHEN cum >= (90 * total + 99) // 100
                THEN (lower_milli + upper_milli) // 2 END) AS BIGINT)
         AS p90_milli,
       CAST(MIN(CASE WHEN cum >= (99 * total + 99) // 100
                THEN (lower_milli + upper_milli) // 2 END) AS BIGINT)
         AS p99_milli
FROM cum GROUP BY key ORDER BY key
"""
