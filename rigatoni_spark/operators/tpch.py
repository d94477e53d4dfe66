"""TPC-H-shaped relational surface, part 2 (Q2/Q7/Q8/Q9/Q12/Q13/Q16/
Q17/Q19/Q20/Q21/Q22 shapes).

Complements operators/relational.py (Q1/3/4/5/6/10/14/15/18): together
the catalog covers all 22 TPC-H query shapes on the testdata's reduced
schema. The testdata has no ``partsupp`` table and lineitem lacks
commit/receipt dates, so:

- Q2/Q9/Q16/Q20 use the DISTINCT (l_partkey, l_suppkey) pairs from
  lineitem as the part-supplier relation, and Q9's supply cost is the
  deterministic stand-in ``0.1 * p_retailprice``;
- Q12/Q21 restate "late" as l_shipdate more than a threshold past
  o_orderdate (the q4 restatement; the spec compares receipt vs commit
  dates), and Q12 groups by l_returnflag in place of the absent
  l_shipmode.

Determinism follows the relational.py contract: monetary aggregates are
exact DECIMAL sums cast to double once; ratio outputs divide two exact
sums and round once; threshold comparisons are restated as exact
integer/decimal inequalities where possible (e.g. ``10*q > 3*tq``
instead of ``q > 0.3*tq``).

Plan hygiene: region/nation/part/supplier broadcast onto the fact side;
customer joins shuffle on the key (customer is NOT a broadcastable dim
at production scale); per-part / per-supplier aggregates shuffle on
high-cardinality keys with map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rigatoni_spark.operators.relational import _dec


def q7_volume_shipping(
    nation: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation_a: str = "NATION_12",
    nation_b: str = "NATION_10",
) -> DataFrame:
    """TPC-H Q7: bilateral trade volume between two nations by year.

    supplier+nation broadcast; customer resolves its nation via a
    broadcast of nation, then joins orders on the shuffled custkey.
    """
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    sn = supplier.join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cn = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == nation_a) & (F.col("cust_nation") == nation_b)
    ) | ((F.col("supp_nation") == nation_b) & (F.col("cust_nation") == nation_a))
    return (
        lineitem.filter(
            F.col("l_shipdate").between("1996-01-01", "1997-12-31")
        )
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sn), lineitem.l_suppkey == sn.s_suppkey)
        .join(cn, orders.o_custkey == cn.c_custkey)
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q7_oracle(nation_a: str = "NATION_12", nation_b: str = "NATION_10") -> str:
    return f"""
SELECT supp_nation, cust_nation, l_year,
  CAST(SUM(vol) AS DOUBLE) AS revenue
FROM (
  SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
    YEAR(l_shipdate) AS l_year,
    CAST(l_extendedprice AS DECIMAL(18,4))
      * (1 - CAST(l_discount AS DECIMAL(18,4))) AS vol
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    AND ((ns.n_name = '{nation_a}' AND nc.n_name = '{nation_b}')
      OR (ns.n_name = '{nation_b}' AND nc.n_name = '{nation_a}'))
)
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


def q8_market_share(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    target_nation: str = "NATION_3",
    target_region: str = "EUROPE",
    p_type: str = "ECONOMY",
) -> DataFrame:
    """TPC-H Q8: a nation's market share of one part type inside one
    region, by order year. Share = exact-decimal national volume /
    exact-decimal total volume, divided once in double and rounded once
    (x10000 scaled int output — the hash-robust ratio pattern).
    """
    volume = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    cust_region = (
        customer.join(
            F.broadcast(nation),
            customer.c_nationkey == nation.n_nationkey,
        )
        .join(
            F.broadcast(region.filter(F.col("r_name") == target_region)),
            nation.n_regionkey == region.r_regionkey,
        )
        .select("c_custkey")
    )
    supp_nation = supplier.join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    j = (
        lineitem.join(
            F.broadcast(part.filter(F.col("p_type") == p_type)),
            lineitem.l_partkey == part.p_partkey,
        )
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(cust_region, orders.o_custkey == cust_region.c_custkey)
        .join(F.broadcast(supp_nation), lineitem.l_suppkey == supp_nation.s_suppkey)
        .filter(F.col("o_orderdate").between("1996-01-01", "1997-12-31"))
    )
    return (
        j.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == target_nation, volume)).alias(
                "_nat"
            ),
            F.sum(volume).alias("_tot"),
        )
        .select(
            "o_year",
            F.round(
                F.coalesce(F.col("_nat"), F.lit(0)).cast("double")
                / F.col("_tot").cast("double")
                * 10000
            )
            .cast("bigint")
            .alias("mkt_share_x10k"),
        )
        .orderBy("o_year")
    )


def q8_oracle(
    target_nation: str = "NATION_3",
    target_region: str = "EUROPE",
    p_type: str = "ECONOMY",
) -> str:
    return f"""
WITH vols AS (
  SELECT YEAR(o_orderdate) AS o_year,
    CAST(l_extendedprice AS DECIMAL(18,4))
      * (1 - CAST(l_discount AS DECIMAL(18,4))) AS volume,
    ns.n_name AS supp_nation
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  JOIN region   ON nc.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  WHERE r_name = '{target_region}' AND p_type = '{p_type}'
    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
)
SELECT o_year,
  CAST(ROUND(CAST(COALESCE(
      SUM(CASE WHEN supp_nation = '{target_nation}' THEN volume END), 0)
    AS DOUBLE) / CAST(SUM(volume) AS DOUBLE) * 10000) AS BIGINT)
    AS mkt_share_x10k
FROM vols GROUP BY o_year ORDER BY o_year
"""


def q9_product_profit(
    nation: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    p_type: str = "STANDARD",
) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year.

    No partsupp table in the testdata -> supply cost is the
    deterministic stand-in 0.1 * p_retailprice (exact decimal: (12,2) *
    (2,1) -> scale-3). Profit = revenue - qty * cost, all decimal until
    the final cast.
    """
    cost = F.col("p_retailprice").cast("decimal(12,2)") * F.lit(0.1).cast(
        "decimal(2,1)"
    )
    profit = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")) - (
        F.col("l_quantity").cast("decimal(12,2)") * cost
    )
    sn = supplier.join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    return (
        lineitem.join(
            F.broadcast(part.filter(F.col("p_type") == p_type)),
            lineitem.l_partkey == part.p_partkey,
        )
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sn), lineitem.l_suppkey == sn.s_suppkey)
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


def q9_oracle(p_type: str = "STANDARD") -> str:
    return f"""
SELECT n_name AS nation, YEAR(o_orderdate) AS o_year,
  CAST(SUM(
    CAST(l_extendedprice AS DECIMAL(18,4))
      * (1 - CAST(l_discount AS DECIMAL(18,4)))
    - CAST(l_quantity AS DECIMAL(12,2))
      * (CAST(p_retailprice AS DECIMAL(12,2)) * CAST(0.1 AS DECIMAL(2,1)))
  ) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_type = '{p_type}'
GROUP BY n_name, YEAR(o_orderdate)
ORDER BY nation, o_year DESC
"""


def q13_order_distribution(
    customer: DataFrame, orders: DataFrame, excluded_priority: str = "1-URGENT"
) -> DataFrame:
    """TPC-H Q13: distribution of customers by order count (left outer
    join keeps zero-order customers; the original's comment-pattern
    exclusion becomes a priority exclusion on this schema).

    Two aggs: per-customer count (shuffle on custkey), then the tiny
    histogram.
    """
    per_cust = (
        customer.join(
            orders.filter(F.col("o_orderpriority") != excluded_priority),
            customer.c_custkey == orders.o_custkey,
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def q13_oracle(excluded_priority: str = "1-URGENT") -> str:
    return f"""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
    AND o_orderpriority <> '{excluded_priority}'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q17_small_quantity_revenue(
    lineitem: DataFrame, part: DataFrame, brand: str = "Brand#1"
) -> DataFrame:
    """TPC-H Q17: average yearly revenue lost if small-quantity orders
    of one brand were not taken. The per-part average is a separate
    aggregate joined back (shuffle on partkey both times — scalable;
    never a correlated subquery per row).

    Threshold restated exactly: 5 * l_quantity < sum_qty_per_part /
    n_lines -> 5 * qty * n < sum (all exact integers/decimals).
    """
    lines = lineitem.join(
        F.broadcast(part.filter(F.col("p_brand") == brand)),
        lineitem.l_partkey == part.p_partkey,
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    per_part = lines.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("_sq"),
        F.count(F.lit(1)).alias("_n"),
    )
    j = lines.join(per_part, "l_partkey").filter(
        F.col("l_quantity").cast("decimal(18,2)") * 5 * F.col("_n")
        < F.col("_sq")
    )
    return j.agg(
        (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
            "avg_yearly"
        )
    )


def q17_oracle(brand: str = "Brand#1") -> str:
    return f"""
WITH lines AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = '{brand}'
), per_part AS (
  SELECT l_partkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq,
         COUNT(*) AS n
  FROM lines GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0
  AS avg_yearly
FROM lines JOIN per_part USING (l_partkey)
WHERE CAST(l_quantity AS DECIMAL(18,2)) * 5 * n < sq
"""


def q19_discounted_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19: revenue from an OR of three (brand, size, quantity)
    windows (container/shipmode predicates dropped — absent columns).
    One broadcast hash join; the OR evaluates post-join, exactly like
    the spec's disjunctive filter."""
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    q = F.col("l_quantity")
    s = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#1") & s.between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & s.between(1, 25) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & s.between(1, 40) & q.between(20, 30))
    )
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


Q19_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
  * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 40
       AND l_quantity BETWEEN 20 AND 30)
"""


def q2_min_supplier_per_part(
    region: DataFrame,
    nation: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    lineitem: DataFrame,
    target_region: str = "EUROPE",
    p_size: int = 15,
) -> DataFrame:
    """TPC-H Q2 shape: per part, the best supplier in a region (no
    partsupp -> the supplier relation is DISTINCT (l_partkey,
    l_suppkey); 'best' = min (s_acctbal, s_suppkey), the deterministic
    analogue of min supply cost). min_by aggregation per part — no
    correlated subquery, one shuffle on partkey."""
    ps = lineitem.select("l_partkey", "l_suppkey").distinct()
    sups = (
        supplier.join(
            F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
        )
        .join(
            F.broadcast(region.filter(F.col("r_name") == target_region)),
            nation.n_regionkey == region.r_regionkey,
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    linked = (
        ps.join(F.broadcast(sups), ps.l_suppkey == sups.s_suppkey)
        .join(
            F.broadcast(part.filter(F.col("p_size") == p_size)),
            ps.l_partkey == part.p_partkey,
        )
    )
    best = linked.groupBy("p_partkey", "p_brand").agg(
        F.min_by(
            F.struct(
                F.col("s_acctbal").alias("s_acctbal"),
                F.col("s_name").alias("s_name"),
                F.col("n_name").alias("n_name"),
            ),
            F.struct(F.col("s_acctbal"), F.col("s_suppkey")),
        ).alias("w")
    )
    return best.select(
        F.col("w.s_acctbal").alias("s_acctbal"),
        F.col("w.s_name").alias("s_name"),
        F.col("w.n_name").alias("n_name"),
        "p_partkey",
        "p_brand",
    ).orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")


def q2_oracle(target_region: str = "EUROPE", p_size: int = 15) -> str:
    return f"""
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
sups AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = '{target_region}'
),
linked AS (
  SELECT p_partkey, p_brand, s_suppkey, s_name, s_acctbal, n_name
  FROM ps
  JOIN sups ON l_suppkey = s_suppkey
  JOIN part ON l_partkey = p_partkey
  WHERE p_size = {p_size}
),
best AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY p_partkey ORDER BY s_acctbal, s_suppkey) AS rn
  FROM linked
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand
FROM best WHERE rn = 1
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
"""


def q16_supplier_count(part: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q16 shape: distinct suppliers per (brand, type, size)
    bucket, excluding one brand and one type (comment-based supplier
    exclusion dropped — absent column). Supplier relation = DISTINCT
    lineitem pairs; count-distinct shuffles on the grouping key."""
    ps = lineitem.select("l_partkey", "l_suppkey").distinct()
    filtered = part.filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    return (
        ps.join(F.broadcast(filtered), ps.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


Q16_ORACLE = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM ps JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
  AND p_size IN (1,5,10,15,20,25,30,35)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q20_excess_share_suppliers(
    supplier: DataFrame,
    part: DataFrame,
    lineitem: DataFrame,
    p_type: str = "PROMO",
    year: int = 1996,
) -> DataFrame:
    """TPC-H Q20 shape: suppliers carrying an outsized share of a part
    type's volume in one year (no partsupp availqty -> 'share of the
    part's total shipped quantity'). Threshold restated exactly in
    decimals: 10*q > 3*total (q > 30%). Semi-join chain, shuffles on
    (partkey, suppkey) then partkey."""
    shipped = (
        lineitem.filter(F.year("l_shipdate") == year)
        .join(
            F.broadcast(
                part.filter(F.col("p_type") == p_type).select("p_partkey")
            ),
            lineitem.l_partkey == F.col("p_partkey"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"))
    )
    totals = shipped.groupBy("l_partkey").agg(F.sum("q").alias("tq"))
    heavy = (
        shipped.join(totals, "l_partkey")
        .filter(F.col("q") * 10 > F.col("tq") * 3)
        .select("l_suppkey")
        .distinct()
    )
    return (
        supplier.join(heavy, supplier.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_name", "s_suppkey")
        .orderBy("s_name")
    )


def q20_oracle(p_type: str = "PROMO", year: int = 1996) -> str:
    return f"""
WITH shipped AS (
  SELECT l_partkey, l_suppkey,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS q
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = '{p_type}' AND YEAR(l_shipdate) = {year}
  GROUP BY l_partkey, l_suppkey
), totals AS (
  SELECT l_partkey, SUM(q) AS tq FROM shipped GROUP BY l_partkey
), heavy AS (
  SELECT DISTINCT l_suppkey
  FROM shipped JOIN totals USING (l_partkey)
  WHERE q * 10 > tq * 3
)
SELECT s_name, s_suppkey
FROM supplier JOIN heavy ON s_suppkey = l_suppkey
ORDER BY s_name
"""


def q22_global_sales_opportunity(
    customer: DataFrame,
    orders: DataFrame,
    groups: int = 5,
    since: str = "2001-01-01",
) -> DataFrame:
    """TPC-H Q22: wealthy lapsed customers, grouped by country code
    (no phone column -> cntrycode := c_nationkey % groups; every
    customer in the testdata has SOME order, so 'no orders at all'
    becomes 'no orders since ``since``' — same anti-join shape,
    non-degenerate result). The above-average threshold is a broadcast
    of a 1-row aggregate; the no-orders test is a left-anti join (never
    NOT IN over a shuffle).
    """
    avg_bal = customer.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("_avg")
    )
    rich = customer.join(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("_avg")
    )
    no_orders = rich.join(
        orders.filter(F.col("o_orderdate") >= since),
        rich.c_custkey == orders.o_custkey,
        "left_anti",
    )
    return (
        no_orders.select(
            (F.col("c_nationkey") % groups).alias("cntrycode"), "c_acctbal"
        )
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


def q11_important_stock(
    nation: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    lineitem: DataFrame,
    n_name: str = "NATION_3",
    mult_x10: int = 15,
) -> DataFrame:
    """TPC-H Q11 shape: per-part stock value for one nation's suppliers,
    keeping parts whose value exceeds ``mult_x10/10`` times the nation's
    MEAN per-part value (the scalar-subquery-threshold shape; TPC-H's
    fixed-fraction threshold is restated against the mean so the
    selectivity is scale-free — a fixed fraction of the total degenerates
    to zero rows once the part count exceeds its reciprocal).

    partsupp stand-in (module docstring): DISTINCT (l_partkey,
    l_suppkey) pairs from lineitem with availqty := lineitem count per
    pair and supplycost := 0.1 * p_retailprice (Q9's stand-in). All
    value arithmetic stays exact decimal through both aggregations;
    each side is cast to double exactly once before the IEEE-identical
    threshold compare, so Spark and the DuckDB oracle agree bit-for-bit.

    Plan: nation-filtered supplier keys broadcast onto lineitem, one
    hash-agg per (part, supp) pair, part broadcast for retailprice, one
    hash-agg per part, and the nation total is a broadcast 1-row
    aggregate — no shuffle carries more than the pair cardinality.
    """
    sup_keys = supplier.join(
        F.broadcast(nation.filter(F.col("n_name") == n_name)),
        supplier.s_nationkey == nation.n_nationkey,
    ).select("s_suppkey")
    cost = F.col("p_retailprice").cast("decimal(12,2)") * F.lit(0.1).cast(
        "decimal(2,1)"
    )
    pair_value = (
        lineitem.join(
            F.broadcast(sup_keys), lineitem.l_suppkey == sup_keys.s_suppkey
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.count(F.lit(1)).alias("availqty"))
        .join(
            F.broadcast(part.select("p_partkey", "p_retailprice")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            (cost * F.col("availqty").cast("decimal(18,0)")).alias("v"),
        )
    )
    per_part = pair_value.groupBy("ps_partkey").agg(F.sum("v").alias("vdec"))
    total = per_part.agg(
        F.sum("vdec").cast("double").alias("_total"),
        F.count(F.lit(1)).alias("_nparts"),
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(
            F.col("vdec").cast("double") * 10 * F.col("_nparts")
            > F.col("_total") * mult_x10
        )
        .select("ps_partkey", F.col("vdec").cast("double").alias("value"))
        .orderBy(F.col("value").desc(), "ps_partkey")
    )


def q11_oracle(n_name: str = "NATION_3", mult_x10: int = 15) -> str:
    return f"""
WITH ps AS (
  SELECT l_partkey AS ps_partkey,
    (CAST(p_retailprice AS DECIMAL(12,2)) * CAST(0.1 AS DECIMAL(2,1)))
      * CAST(COUNT(*) AS DECIMAL(18,0)) AS v
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN part     ON l_partkey = p_partkey
  WHERE n_name = '{n_name}'
  GROUP BY l_partkey, l_suppkey, p_retailprice
),
g AS (SELECT ps_partkey, SUM(v) AS vdec FROM ps GROUP BY ps_partkey),
tot AS (SELECT CAST(SUM(vdec) AS DOUBLE) AS t, COUNT(*) AS n FROM g)
SELECT ps_partkey, CAST(vdec AS DOUBLE) AS value
FROM g, tot
WHERE CAST(vdec AS DOUBLE) * 10 * n > t * {mult_x10}
ORDER BY value DESC, ps_partkey
"""


def q22_oracle(groups: int = 5, since: str = "2001-01-01") -> str:
    return f"""
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
    AS a
  FROM customer WHERE c_acctbal > 0
)
SELECT c_nationkey % {groups} AS cntrycode, COUNT(*) AS numcust,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer, avg_bal
WHERE c_acctbal > a
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '{since}')
GROUP BY cntrycode
ORDER BY cntrycode
"""


def q12_shipmode_priority(
    orders: DataFrame,
    lineitem: DataFrame,
    late_days: int = 30,
    year: int = 1995,
) -> DataFrame:
    """TPC-H Q12 shape: urgent-vs-other line counts for LATE shipments,
    grouped by a low-cardinality lineitem attribute.

    The testdata has no l_shipmode/l_commitdate/l_receiptdate, so the
    group key is l_returnflag (3 values, same cardinality class as the
    spec's 7 ship modes) and "late" is restated as l_shipdate more than
    ``late_days`` past o_orderdate — the same restatement q4 uses.

    The orderkey equi-join shuffles both sides; at production scale
    orders and lineitem bucket on orderkey and the exchange disappears
    (same note as q4). The priority CASE folds into the join's
    map-side partial aggregation — the exchange after the join carries
    |group keys| rows per partition.
    """
    j = lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {int(late_days)} DAYS"
    )
    in_year = (
        F.col("l_shipdate") >= F.lit(f"{year}-01-01").cast("timestamp")
    ) & (F.col("l_shipdate") < F.lit(f"{year + 1}-01-01").cast("timestamp"))
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.filter(late & in_year)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0))
            .cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(urgent, 0).otherwise(1))
            .cast("bigint")
            .alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


def q12_oracle(late_days: int = 30, year: int = 1995) -> str:
    return f"""
SELECT l_returnflag,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL {late_days} DAY
  AND l_shipdate >= TIMESTAMP '{year}-01-01'
  AND l_shipdate <  TIMESTAMP '{year + 1}-01-01'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def q21_waiting_suppliers(
    supplier: DataFrame,
    nation: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    n_name: str | None = None,
    late_days: int = 30,
    limit: int = 100,
) -> DataFrame:
    """TPC-H Q21 shape: suppliers who alone held up a multi-supplier
    order. "Late" is the q4/q12 restatement (l_shipdate more than
    ``late_days`` past o_orderdate; the spec's receipt-past-commit
    columns don't exist here).

    The spec's correlated EXISTS ("another supplier on the order") /
    NOT EXISTS ("no OTHER supplier was late") pair collapses into ONE
    per-order aggregate — count of distinct suppliers, count of
    distinct LATE suppliers, and the late supplier's key when it is
    unique — so the plan is a single orderkey-shuffled aggregation
    instead of two self-joins of lineitem (the shape that would
    dominate cost at 100 TB). Supplier + the 1-nation filter broadcast
    onto the surviving (rare) orders. (numwait DESC, s_name) is a
    total order (s_name unique per supplier), so the LIMIT is
    deterministic and oracle-stable. The spec's single-nation filter is
    optional (``n_name=None`` keeps every nation): the testdata has
    only a handful of suppliers per nation, so the filtered default
    would gate on 1-2 rows.
    """
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {int(late_days)} DAYS"
    )
    per_order = (
        lineitem.join(
            orders.filter(F.col("o_orderstatus") == "F"),
            lineitem["l_orderkey"] == orders["o_orderkey"],
        )
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_sup"),
            F.countDistinct(F.when(late, F.col("l_suppkey"))).alias(
                "n_late_sup"
            ),
            F.max(F.when(late, F.col("l_suppkey"))).alias("late_suppkey"),
        )
        .filter((F.col("n_sup") >= 2) & (F.col("n_late_sup") == 1))
    )
    nat = nation if n_name is None else nation.filter(
        F.col("n_name") == n_name
    )
    sup = supplier.join(
        F.broadcast(nat),
        supplier["s_nationkey"] == nation["n_nationkey"],
    ).select("s_suppkey", "s_name")
    return (
        per_order.join(
            F.broadcast(sup),
            per_order["late_suppkey"] == sup["s_suppkey"],
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(limit)
    )


def q21_oracle(
    n_name: str | None = None, late_days: int = 30, limit: int = 100
) -> str:
    nation_pred = "" if n_name is None else f" AND n_name = '{n_name}'"
    return f"""
WITH per_order AS (
  SELECT l_orderkey,
    COUNT(DISTINCT l_suppkey) AS n_sup,
    COUNT(DISTINCT CASE WHEN l_shipdate > o_orderdate
                             + INTERVAL {late_days} DAY
                        THEN l_suppkey END) AS n_late_sup,
    MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL {late_days} DAY
             THEN l_suppkey END) AS late_suppkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY l_orderkey
)
SELECT s_name, COUNT(*) AS numwait
FROM per_order
JOIN supplier ON late_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE n_sup >= 2 AND n_late_sup = 1{nation_pred}
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT {limit}
"""
