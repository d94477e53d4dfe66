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

from pyspark.sql import DataFrame
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
    regs = hll_registers(df, col)
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
    df: DataFrame, col: str, probes: DataFrame | None = None
) -> DataFrame:
    """CMS point estimate for every distinct value of ``col`` (or the
    1-column ``probes`` frame): min over the key's CMS_DEPTH cells.
    The sketch side is <= 2048 rows -> broadcast to the probe join."""
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
