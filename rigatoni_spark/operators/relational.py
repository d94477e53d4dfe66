"""Relational query surface (filter/project/join/agg/window/sort/limit).

The reference has no relational operators (SURVEY.md §2.8) — its users
get them implicitly from whatever reads the S3 output. This engine
exposes them directly on both the batch tables and the event stream via
the DataFrame API; the queries here are the representative set the
driver hash-checks (TPC-H-shaped: scan+agg, 3-way join + top-k, 6-way
star join).

Determinism pattern for oracle comparison: monetary aggregates cast to
DECIMAL(18,4) *before* summing — decimal sums are exact, so Spark and
any oracle engine agree bit-for-bit regardless of partitioning /
summation order; the final cast back to double is a single deterministic
IEEE rounding. Never round a big double sum and hope.

Scale notes per query are inline; the common ones: partial aggregation
is automatic for all hash aggregates; small dims (region, nation,
supplier, customer at these SFs) broadcast — verified via
.explain("formatted") showing BroadcastHashJoin without a shuffle on the
big fact side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dec(col, scale: int = 4):
    return F.col(col).cast(f"decimal(18,{scale})") if isinstance(col, str) else col.cast(
        f"decimal(18,{scale})"
    )


def q1_pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1-shaped scan + 8-agg groupBy.

    Single shuffle on (l_returnflag, l_linestatus) — 6 groups, so the
    map-side partial agg reduces ~everything before the exchange; the
    date filter pushes down to the parquet scan.
    """
    # Tight precisions keep the 3-factor charge product inside DECIMAL
    # precision 38 on BOTH engines: (12,2)*(3,2)*(3,2) -> scale-6 exact.
    # With (18,4) inputs the product overflows p=38 and the engines
    # diverge (Spark precision-loss rounding vs DuckDB double fallback).
    ext = F.col("l_extendedprice").cast("decimal(12,2)")
    one_minus_disc = (F.lit(1) - F.col("l_discount").cast("decimal(3,2)")).cast(
        "decimal(3,2)"
    )
    one_plus_tax = (F.lit(1) + F.col("l_tax").cast("decimal(3,2)")).cast(
        "decimal(3,2)"
    )
    disc_price = ext * one_minus_disc
    charge = disc_price * one_plus_tax
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.round(
                F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_qty"),
            F.round(
                F.sum(_dec("l_extendedprice")).cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_price"),
            F.round(
                F.sum(_dec("l_discount")).cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(3,2))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(3,2)) * CAST(1 + l_tax AS DECIMAL(3,2))) AS DOUBLE) AS sum_charge,
  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 4) AS avg_qty,
  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 4) AS avg_price,
  ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 4) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_top_orders(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """3-way join + agg + top-10 (TPC-H Q3-shaped).

    customer is broadcast (small dim); orders⋈lineitem shuffles on
    orderkey. Top-k is a global sort of an already-aggregated (small)
    frame — fine at any scale. Deterministic tie-break on o_orderkey.
    """
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        lineitem.join(
            orders, lineitem.l_orderkey == orders.o_orderkey, "inner"
        )
        .join(
            F.broadcast(customer.filter(F.col("c_mktsegment") == "BUILDING")),
            orders.o_custkey == F.col("c_custkey"),
            "inner",
        )
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


Q3_ORACLE = """
SELECT o_orderkey, o_orderdate, o_orderpriority,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


def q5_region_revenue(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
) -> DataFrame:
    """6-way star join (TPC-H Q5-shaped): revenue by nation where the
    customer and supplier share a nation.

    region/nation/supplier/customer broadcast; only orders⋈lineitem
    shuffles. The supplier join condition includes the nation equality —
    expressed as a join key so it stays a hash join, not a filter after
    a cross product.
    """
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    dims = (
        customer.join(
            nation, customer.c_nationkey == nation.n_nationkey, "inner"
        )
        .join(region.filter(F.col("r_name") == "ASIA"),
              nation.n_regionkey == F.col("r_regionkey"), "inner")
        .select("c_custkey", "c_nationkey", "n_name")
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dims), orders.o_custkey == dims.c_custkey)
        .join(
            F.broadcast(supplier),
            (lineitem.l_suppkey == supplier.s_suppkey)
            & (dims.c_nationkey == supplier.s_nationkey),
        )
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


Q5_ORACLE = """
SELECT n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def topk_users_per_event_type(events: DataFrame, k: int = 3) -> DataFrame:
    """Top-k per group via window row_number — the scalable top-k idiom
    (shuffle on group key only; no global sort of the fact table)."""
    totals = events.groupBy("event_type", "user_id").agg(
        F.sum(_dec("value", 2)).cast("double").alias("total_value"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("total_value").desc(), F.col("user_id")
    )
    return (
        totals.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("event_type", "user_id", "total_value", "n_events", "rank")
        .orderBy("event_type", "rank")
    )


TOPK_ORACLE = """
WITH totals AS (
  SELECT event_type, user_id,
    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
    COUNT(*) AS n_events
  FROM events GROUP BY event_type, user_id
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY event_type ORDER BY total_value DESC, user_id) AS rank
  FROM totals
)
SELECT event_type, user_id, total_value, n_events, rank
FROM ranked WHERE rank <= 3 ORDER BY event_type, rank
"""


def q4_late_shipment_priority(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q4-shaped EXISTS semi-join: orders in a quarter having at
    least one line shipped after the order date, counted by priority.

    left_semi keeps the orders row-stream narrow (no lineitem columns
    materialize); the join shuffles on orderkey — at 100 TB both sides
    bucket on orderkey and the shuffle disappears entirely.
    """
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp"))
    )
    has_late = o.join(
        lineitem,
        (o["o_orderkey"] == lineitem["l_orderkey"])
        & (lineitem["l_shipdate"] > o["o_orderdate"]),
        "left_semi",
    )
    return (
        has_late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
  AND o.o_orderdate <  TIMESTAMP '1995-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q10_returned_revenue(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    k: int = 20,
) -> DataFrame:
    """TPC-H Q10-shaped: top-k customers by revenue lost to returns.

    lineitem filters on returnflag at the scan; customer/nation
    broadcast; the orderkey join is the only real shuffle. Top-k via
    global sort of the (small) per-customer aggregate, tie-broken on
    custkey for determinism.
    """
    revenue = (
        F.col("l_extendedprice").cast("decimal(18,4)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(18,4)"))
    )
    returned = lineitem.filter(F.col("l_returnflag") == "R")
    joined = (
        returned.join(orders, returned["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
    )
    return (
        joined.groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(k)
    )


Q10_ORACLE = """
SELECT c_custkey, c_name, n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
           (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q15_top_supplier(lineitem: DataFrame, supplier: DataFrame) -> DataFrame:
    """TPC-H Q15-shaped: supplier(s) with the maximum revenue in a
    period (aggregate -> global max -> equality join back).

    The max is a scalar broadcast; no second scan of lineitem — the
    per-supplier aggregate is reused for both the max and the final
    join (Spark reuses the exchange)."""
    revenue = (
        F.col("l_extendedprice").cast("decimal(18,4)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(18,4)"))
    )
    per_supp = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(revenue).cast("double").alias("total_revenue"))
    )
    max_rev = per_supp.agg(F.max("total_revenue").alias("m"))
    return (
        per_supp.join(F.broadcast(max_rev), per_supp["total_revenue"] == max_rev["m"])
        .join(F.broadcast(supplier), per_supp["l_suppkey"] == supplier["s_suppkey"])
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q15_ORACLE = """
WITH per_supp AS (
  SELECT l_suppkey,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
             (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
      AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-07-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM per_supp JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM per_supp)
ORDER BY s_suppkey
"""


def q18_large_orders(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
    min_qty: float = 150.0,
) -> DataFrame:
    """TPC-H Q18-shaped: orders whose total quantity exceeds a
    threshold, with their customers.

    The HAVING filter runs on the small per-order aggregate BEFORE the
    joins, so only qualifying orderkeys (rare) join back — semi-join
    shape, broadcast-able qualifying set."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double").alias("total_qty"))
        .filter(F.col("total_qty") > min_qty)
    )
    return (
        F.broadcast(big)
        .join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"])
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate", "total_qty"
        )
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey"))
    )


def q18_oracle(min_qty: float = 150.0) -> str:
    return f"""
WITH big AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) > {min_qty}
)
SELECT c_custkey, c_name, o_orderkey, o_orderdate, total_qty
FROM big
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, o_orderkey
"""


def q14_promo_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q14-shaped: promo revenue share in a period.

    part broadcasts (small dim); one shuffle-free scan+join+global agg.
    Both sums are exact decimals; the percentage is one double division
    rounded once — deterministic cross-engine.
    """
    revenue = (
        F.col("l_extendedprice").cast("decimal(18,4)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(18,4)"))
    )
    period = lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    )
    joined = period.join(
        F.broadcast(part), period["l_partkey"] == part["p_partkey"]
    )
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", revenue).otherwise(
            F.lit(0).cast("decimal(18,4)")
        )
    )
    return joined.agg(
        F.round(
            F.lit(100.0) * promo.cast("double") / F.sum(revenue).cast("double"),
            4,
        ).alias("promo_revenue_pct"),
        promo.cast("double").alias("promo_revenue"),
        F.sum(revenue).cast("double").alias("total_revenue"),
    )


Q14_ORACLE = """
SELECT
  ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
      THEN CAST(l_extendedprice AS DECIMAL(18,4)) *
           (1 - CAST(l_discount AS DECIMAL(18,4)))
      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
    / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
               (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 4)
    AS promo_revenue_pct,
  CAST(SUM(CASE WHEN p_type = 'PROMO'
      THEN CAST(l_extendedprice AS DECIMAL(18,4)) *
           (1 - CAST(l_discount AS DECIMAL(18,4)))
      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS promo_revenue,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
           (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
    AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1996-02-01'
"""
