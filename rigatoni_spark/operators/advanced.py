"""Advanced relational operators beyond the reference's surface:
sessionization, as-of join, rollup, pivot, set operations.

The reference has none of these (SURVEY.md §2.8); they're table stakes
for an analytics engine over CDC output, and each is expressed in the
scale-correct distributed formulation (no driver loops, no range
explosions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame, gap_minutes: int = 30, ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap to
    the previous event of the same key exceeds ``gap_minutes``.

    Classic lag+cumsum formulation: one shuffle on the session key,
    both window passes reuse the same partitioning (single Exchange in
    the plan). Streaming equivalent: ``session_window(ts, gap)``.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col)
    # cast through timestamp first: a TIMESTAMP_NTZ input (plain
    # parquet timestamps) cannot cast straight to long, while
    # NTZ->timestamp resolves in the session tz (UTC) — no-op for the
    # already-TIMESTAMP path
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    with_session = (
        events.withColumn(
            "new_session",
            F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0),
        )
        .withColumn("session_idx", F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ))
    )
    return (
        with_session.groupBy(key_col, "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
            ).alias("session_value"),
        )
        .orderBy(key_col, "session_idx")
    )


def stream_sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Sessionization through the engine's NATIVE session-window state:
    ``F.session_window`` instead of the lag+cumsum formulation above.

    Boundary semantics, pinned by TestStreamSessionize: a session
    window spans ``[first, last + gap]`` inclusive — an event landing
    EXACTLY ``gap`` after the previous one still merges; the split rule
    is ``diff > gap`` evaluated at full microsecond precision. The
    batch lag formulation above shares the ``>`` rule but compares
    SECOND-truncated epochs (``cast ts to long``), so the two can
    disagree on sub-second boundary collisions.
    :func:`stream_sessions_oracle` encodes the ``>`` rule at
    microsecond precision so the streaming path is hash-verified, not
    approximately checked.

    Works identically on batch and streaming input (session_window is
    an ordinary grouping expression). Under streaming the state store
    holds at most one open session struct per live key — state is
    O(|active users|), never O(events) — and merges/expires sessions
    as watermark or drain progresses. One shuffle on the grouping key.
    """
    return (
        events.groupBy(
            F.col(key_col),
            F.session_window(F.col(ts_col), f"{gap_minutes} minutes"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
            ).alias("session_value"),
        )
        .select(
            key_col, "session_start", "session_end", "n_events",
            "session_value",
        )
    )


def stream_sessions_oracle(gap_minutes: int = 30) -> str:
    gap_us = gap_minutes * 60 * 1_000_000
    return f"""
WITH flagged AS (
  SELECT user_id, ts, value,
    CASE WHEN lag(ts) OVER w IS NULL
           OR date_diff('microsecond', lag(ts) OVER w, ts) > {gap_us}
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
  SELECT *, CAST(SUM(new_session) OVER (
    PARTITION BY user_id ORDER BY ts
    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
  FROM flagged
)
SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
  COUNT(*) AS n_events,
  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS session_value
FROM numbered GROUP BY user_id, session_idx
ORDER BY user_id, session_start
"""


def sessionize_oracle(gap_minutes: int = 30) -> str:
    return f"""
WITH flagged AS (
  SELECT user_id, ts, value,
    CASE WHEN lag(ts) OVER w IS NULL
           OR date_diff('second', lag(ts) OVER w, ts) > {gap_minutes * 60}
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
  SELECT *, CAST(SUM(new_session) OVER (
    PARTITION BY user_id ORDER BY ts
    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
  FROM flagged
)
SELECT user_id, session_idx, COUNT(*) AS n_events,
  MIN(ts) AS session_start, MAX(ts) AS session_end,
  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS session_value
FROM numbered GROUP BY user_id, session_idx
ORDER BY user_id, session_idx
"""


def asof_join_orders(events: DataFrame, orders: DataFrame) -> DataFrame:
    """As-of join: each event picks the latest order of the same user
    with o_orderdate <= ts.

    Spark lacks a native ASOF join; the scalable formulation is
    union + forward-fill window (sort-merge within key partitions) —
    never a range cross-join. One shuffle on the key, linear scan per
    partition. (applyInPandas + pd.merge_asof is the alternative when
    per-key data fits in memory; this version has no such limit.)
    """
    # deduplicate the right side deterministically: one order per
    # (custkey, date) — latest orderkey wins
    w_dedup = Window.partitionBy("o_custkey", "o_orderdate").orderBy(
        F.col("o_orderkey").desc()
    )
    orders_1 = (
        orders.withColumn("_rn", F.row_number().over(w_dedup))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    left = events.select(
        F.col("user_id").alias("key"),
        F.col("ts").alias("t"),
        F.lit(1).alias("is_event"),
        "event_id",
        "event_type",
        F.lit(None).cast("bigint").alias("o_orderkey"),
        F.lit(None).cast("timestamp").alias("o_orderdate"),
        F.lit(None).cast("double").alias("o_totalprice"),
    )
    right = orders_1.select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("is_event"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.lit(None).cast("string").alias("event_type"),
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
    )
    # orders sort before events at equal t (is_event asc) => an order
    # dated exactly at ts IS visible to that event (ASOF >= semantics)
    w = Window.partitionBy("key").orderBy("t", "is_event").rowsBetween(
        Window.unboundedPreceding, 0
    )
    filled = (
        left.unionByName(right)
        .withColumn("last_orderkey", F.last("o_orderkey", ignorenulls=True).over(w))
        .withColumn("last_orderdate", F.last("o_orderdate", ignorenulls=True).over(w))
        .withColumn(
            "last_totalprice", F.last("o_totalprice", ignorenulls=True).over(w)
        )
    )
    return (
        filled.filter(F.col("is_event") == 1)
        .select(
            "event_id",
            F.col("key").alias("user_id"),
            F.col("t").alias("ts"),
            "event_type",
            F.col("last_orderkey").alias("o_orderkey"),
            F.col("last_orderdate").alias("o_orderdate"),
            F.round(F.col("last_totalprice").cast("decimal(18,2)"), 2)
            .cast("double")
            .alias("o_totalprice"),
        )
        .orderBy("event_id")
    )


ASOF_ORACLE = """
WITH orders_1 AS (
  SELECT * FROM (
    SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
                              ORDER BY o_orderkey DESC) AS rn
    FROM orders) t WHERE rn = 1
)
SELECT e.event_id, e.user_id, e.ts, e.event_type,
       o.o_orderkey, o.o_orderdate,
       CAST(ROUND(CAST(o.o_totalprice AS DECIMAL(18,2)), 2) AS DOUBLE)
         AS o_totalprice
FROM events e
ASOF LEFT JOIN orders_1 o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
ORDER BY e.event_id
"""


def rollup_pricing(lineitem: DataFrame) -> DataFrame:
    """ROLLUP aggregation (flag -> flag+status -> grand total)."""
    return (
        lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_qty"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


ROLLUP_ORACLE = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag, l_linestatus
"""


def pivot_op_by_collection(events_ce: DataFrame) -> DataFrame:
    """Pivot: operation counts per collection as columns (explicit
    value list -> no extra pass to discover pivot values)."""
    return (
        events_ce.groupBy("collection")
        .pivot("operation", ["insert", "update", "replace", "delete"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .orderBy("collection")
    )


PIVOT_ORACLE_BODY = """
SELECT collection,
  COUNT(CASE WHEN operation = 'insert'  THEN 1 END) AS insert,
  COUNT(CASE WHEN operation = 'update'  THEN 1 END) AS update,
  COUNT(CASE WHEN operation = 'replace' THEN 1 END) AS replace,
  COUNT(CASE WHEN operation = 'delete'  THEN 1 END) AS delete
FROM change_events GROUP BY collection ORDER BY collection
"""


def customers_without_events(customer: DataFrame, events: DataFrame) -> DataFrame:
    """Set difference: customers with no event activity
    (EXCEPT == left_anti on distinct — one shuffle each side; the anti
    join's build side is the small distinct-users set -> broadcast)."""
    return (
        customer.select(F.col("c_custkey"))
        .distinct()
        .join(
            F.broadcast(
                events.select(F.col("user_id").alias("c_custkey")).distinct()
            ),
            "c_custkey",
            "left_anti",
        )
        .orderBy("c_custkey")
    )


EXCEPT_ORACLE = """
SELECT DISTINCT c_custkey FROM customer
EXCEPT
SELECT DISTINCT user_id AS c_custkey FROM events
ORDER BY c_custkey
"""


def q6_forecast_revenue(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q6-shaped single-scan filter+agg: every predicate pushes
    to the parquet scan; no shuffle at all (global agg partial+final)."""
    return lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,4)")
            * F.col("l_discount").cast("decimal(18,4)")
        )
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


Q6_ORACLE = """
SELECT
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
           CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


def running_customer_totals(orders: DataFrame) -> DataFrame:
    """Window-function suite per customer: order rank, running spend,
    previous order's price (rank/cumulative-sum/lag in one window).

    One shuffle on o_custkey; the three functions share the same window
    frame so Spark evaluates them in a single Window physical node.
    Ordering is made total with (o_orderdate, o_orderkey) so the result
    is deterministic under any partitioning. Running sums are
    DECIMAL(18,4)-exact (see relational.py determinism pattern).
    """
    from pyspark.sql import Window as W

    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = (
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("double")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w).alias("order_rank"),
            run.alias("running_total"),
            F.lag(F.col("o_totalprice")).over(w).alias("prev_price"),
        )
        .orderBy("o_custkey", "order_rank")
    )


RUNNING_TOTALS_ORACLE = """
SELECT o_custkey, o_orderkey,
  ROW_NUMBER() OVER w AS order_rank,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER
       (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total,
  LAG(o_totalprice) OVER w AS prev_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, order_rank
"""


def cube_order_stats(orders: DataFrame) -> DataFrame:
    """CUBE over (status, priority): all four grouping combinations in
    one pass (Spark expands the cube before the single shuffle; map-side
    partial agg still applies per grouping set)."""
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_total"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "n_orders",
            "sum_total",
        )
        .orderBy("status", "priority")
    )


CUBE_ORACLE = """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY status, priority
"""


def enrich_with_customer(events_ce: DataFrame, customer: DataFrame) -> DataFrame:
    """CDC enrichment: join the change stream to a dimension table on
    the document key (the standard stream-static join; works identically
    under readStream — Spark re-broadcasts the dim per micro-batch).

    The dim side broadcasts (no shuffle of the event stream); the key
    comes out of the JSON document_key via get_json_object, evaluated
    in the scan stage.
    """
    key = F.get_json_object(F.col("document_key"), "$._id").cast("bigint")
    joined = events_ce.withColumn("c_custkey", key).join(
        F.broadcast(customer.select("c_custkey", "c_mktsegment")), "c_custkey"
    )
    return (
        joined.groupBy("c_mktsegment", "operation")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("c_custkey").alias("n_users"),
        )
        .orderBy("c_mktsegment", "operation")
    )


ENRICH_ORACLE_BODY = """
SELECT c.c_mktsegment, e.operation, COUNT(*) AS n_events,
       COUNT(DISTINCT c.c_custkey) AS n_users
FROM change_events e
JOIN customer c
  ON CAST(json_extract_string(e.document_key, '$._id') AS BIGINT) = c.c_custkey
GROUP BY c.c_mktsegment, e.operation
ORDER BY c.c_mktsegment, e.operation
"""


_PAYLOAD_COLS = ("document_key", "full_document", "updated_fields")


def payload_schema_profile(events_ce: DataFrame) -> DataFrame:
    """Schemaless-payload drift monitor: top-level key inventory across
    the JSON envelope columns — per (column, key): occurrence count and
    presence fraction among that column's non-null rows. The audit a
    CDC consumer runs to notice upstream schema drift (new fields,
    vanished fields) WITHOUT a registered schema — the flexibility the
    JSON-payload data model exists for (schema.py; the reference keeps
    payloads as raw BSON for the same reason, event.rs:272-311).

    Plan: per column, a scan-stage ``json_object_keys`` explode (keys
    only — values never leave the scan), unioned, then one hash agg on
    (column, key) + a broadcast join to the per-column non-null totals.
    At 100 TB this is |rows| x |keys| narrow rows into a map-side
    combined agg — the profile table is ~|distinct keys| rows."""
    parts = []
    for c in _PAYLOAD_COLS:
        parts.append(
            events_ce.filter(F.col(c).isNotNull()).select(
                F.lit(c).alias("payload_col"),
                F.explode(F.json_object_keys(F.col(c))).alias("key"),
            )
        )
    keyed = parts[0]
    for p in parts[1:]:
        keyed = keyed.unionByName(p)
    totals = None
    for c in _PAYLOAD_COLS:
        t = events_ce.filter(F.col(c).isNotNull()).agg(
            F.lit(c).alias("payload_col"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        totals = t if totals is None else totals.unionByName(t)
    return (
        keyed.groupBy("payload_col", "key")
        .agg(F.count(F.lit(1)).alias("n_present"))
        .join(F.broadcast(totals), "payload_col")
        .select(
            "payload_col",
            "key",
            "n_present",
            F.floor(F.col("n_present") * 10000 / F.col("n_rows"))
            .cast("bigint")
            .alias("presence_x10k"),
        )
        .orderBy("payload_col", "key")
    )


PAYLOAD_SCHEMA_ORACLE_BODY = """
, keyed AS (
  SELECT payload_col, unnest(json_keys(v)) AS key FROM (
    SELECT 'document_key' AS payload_col, document_key AS v
    FROM change_events WHERE document_key IS NOT NULL
    UNION ALL
    SELECT 'full_document', full_document
    FROM change_events WHERE full_document IS NOT NULL
    UNION ALL
    SELECT 'updated_fields', updated_fields
    FROM change_events WHERE updated_fields IS NOT NULL
  )
), totals AS (
  SELECT payload_col, COUNT(*) AS n_rows FROM (
    SELECT 'document_key' AS payload_col
    FROM change_events WHERE document_key IS NOT NULL
    UNION ALL
    SELECT 'full_document' FROM change_events
    WHERE full_document IS NOT NULL
    UNION ALL
    SELECT 'updated_fields' FROM change_events
    WHERE updated_fields IS NOT NULL
  ) GROUP BY payload_col
)
SELECT k.payload_col, k.key, COUNT(*) AS n_present,
       CAST(FLOOR(COUNT(*) * 10000.0 / MAX(t.n_rows)) AS BIGINT)
         AS presence_x10k
FROM keyed k JOIN totals t USING (payload_col)
GROUP BY k.payload_col, k.key
ORDER BY k.payload_col, k.key
"""


def value_histogram(events: DataFrame, width: float = 10.0) -> DataFrame:
    """Fixed-width histogram over a numeric measure — the distribution
    profile every corpus/metric audit starts with.

    One hash aggregate over ~range/width bins (map-side combine crushes
    the per-partition histograms before a tiny exchange); min/max per
    bin are picked values, not float sums, so the output is
    order-independent and hash-stable across engines.
    """
    bin_ = F.floor(F.col("value") / F.lit(width)).cast("bigint")
    return (
        events.groupBy(bin_.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .orderBy("bin")
    )


def value_histogram_oracle(width: float = 10.0) -> str:
    return f"""
SELECT CAST(FLOOR(value / {width}) AS BIGINT) AS bin, COUNT(*) AS n,
       MIN(value) AS min_value, MAX(value) AS max_value
FROM events GROUP BY 1 ORDER BY bin
"""


VALUE_TIERS: list[tuple[str, float, float]] = [
    ("low", 0.0, 50.0),
    ("mid", 50.0, 150.0),
    ("high", 150.0, 1000.0),
]


def range_join(
    fact: DataFrame, bands: DataFrame, value_col: str = "value"
) -> DataFrame:
    """General range (banding) join: attach the ``bands`` row whose
    ``lo <= value < hi`` interval contains each fact row's measure —
    the non-equi join Spark has no native operator for.

    The band table is tiny and broadcast, so the plan is a
    BroadcastNestedLoopJoin: each fact row scans ~|bands| broadcast
    rows — linear in the fact table, no shuffle, which is the only
    range-join shape that survives 100 TB (a shuffle range join would
    need an interval partitioner). Use this form when the bands are
    only known at runtime (a DataFrame); when they are compile-time
    literals, :func:`range_join_value_tiers` compiles them into a CASE
    projection instead — no join at all.
    """
    return fact.join(
        F.broadcast(bands),
        (F.col(value_col) >= F.col("lo")) & (F.col(value_col) < F.col("hi")),
    )


def range_join_value_tiers(events: DataFrame) -> DataFrame:
    """Band each event's measure into the static VALUE_TIERS and
    aggregate per tier.

    The tiers are non-overlapping COMPILE-TIME constants, so the
    banding join folds into a chained CASE projection evaluated in the
    scan stage — zero join, zero shuffle before the 3-group aggregate.
    This replaced the earlier broadcast-nested-loop form (round 4):
    the BNLJ re-evaluated both band bounds per (row x tier) and was
    the bench's only regression; the CASE does one short-circuit band
    lookup per row. Events outside every tier are dropped, matching
    the inner join. For bands that are only known at runtime, use
    :func:`range_join` (the BNLJ shape).
    """
    tier = F.lit(None).cast("string")
    # build the CASE bottom-up so tiers short-circuit in declared order
    for name, lo, hi in reversed(VALUE_TIERS):
        tier = F.when(
            (F.col("value") >= F.lit(lo)) & (F.col("value") < F.lit(hi)),
            F.lit(name),
        ).otherwise(tier)
    return (
        events.select(tier.alias("tier"), "value")
        .filter(F.col("tier").isNotNull())
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .orderBy("tier")
    )


RANGE_JOIN_ORACLE = """
WITH tiers(tier, lo, hi) AS (
  VALUES ('low', 0.0, 50.0), ('mid', 50.0, 150.0), ('high', 150.0, 1000.0)
)
SELECT tier, COUNT(*) AS n, MIN(value) AS min_value, MAX(value) AS max_value
FROM events e JOIN tiers t ON e.value >= t.lo AND e.value < t.hi
GROUP BY tier ORDER BY tier
"""


def skew_salted_enrich(events: DataFrame, customer: DataFrame) -> DataFrame:
    """The salted skew join surfaced as a query: events fact ⋈ customer
    dim on the hot user key, routed through operators/skew.salted_join
    so each hot key spreads over n salt partitions. Result is identical
    to the plain join (that is what the oracle checks); the salt only
    changes the physical partitioning. At this dim size Spark would
    broadcast anyway — the operator targets dims past the broadcast
    threshold under pathological key skew.
    """
    from rigatoni_spark.operators.skew import salted_join

    dim = customer.select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    j = salted_join(events.select("event_id", "user_id"), dim, ["user_id"], n_salts=8)
    return (
        j.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("c_mktsegment")
    )


SKEW_SALTED_ORACLE = """
SELECT c.c_mktsegment, COUNT(*) AS n_events,
       COUNT(DISTINCT e.user_id) AS n_users
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
"""


def funnel(
    events: DataFrame,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    window_hours: int = 24,
) -> DataFrame:
    """Windowed ordered-funnel analysis: how many users progressed
    through the stage sequence IN TIME ORDER, each stage within
    ``window_hours`` of the user's previous-stage event — the classic
    product-analytics conversion funnel (greedy first-match semantics:
    the user's FIRST stage-1 event anchors the stage-2 window, etc.,
    the rule analytics products document).

    Per user the stage machine folds once over the user's events
    sorted by (ts, event_id) (event_id breaks timestamp ties
    deterministically): ONE shuffle to group each user's events, then
    a JVM-side higher-order `aggregate` fold carrying (stage,
    anchor_ts) — no UDF, no join chain. At 100 TB this is the shape
    you want anyway: per-user state is one struct, the fold is linear
    in the user's events, and the alternative (a conditional-min join
    per stage) is len(stages) shuffles. Output: one row per stage with
    users reached and the integer conversion pct from the previous
    stage.
    """
    order = F.array_sort(
        F.collect_list(F.struct("ts", "event_id", "event_type"))
    )
    win = F.expr(f"INTERVAL {int(window_hours)} HOURS")
    zero = F.struct(
        F.lit(0).alias("stage"), F.lit(None).cast("timestamp").alias("ts")
    )

    if not stages:
        raise ValueError("funnel needs at least one stage")

    def step(acc, e):
        def adv(n):
            return F.struct(
                F.lit(n).alias("stage"), e["ts"].alias("ts")
            )

        in_win = e["ts"] <= acc["ts"] + win
        # one when-branch per stage (stage 0 has no window: nothing
        # anchors it) — the fold arity follows len(stages), so 2- and
        # 4-stage funnels run the same machine
        expr = None
        for i, name in enumerate(stages):
            cond = (acc["stage"] == i) & (e["event_type"] == name)
            if i > 0:
                cond = cond & in_win
            expr = (
                F.when(cond, adv(i + 1))
                if expr is None
                else expr.when(cond, adv(i + 1))
            )
        return expr.otherwise(acc)

    stage_fold = F.aggregate(order, zero, step, lambda acc: acc["stage"])
    per_user = events.groupBy("user_id").agg(stage_fold.alias("stage"))
    totals = per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        *(
            F.sum((F.col("stage") >= i + 1).cast("bigint")).alias(f"s{i + 1}")
            for i in range(len(stages))
        ),
    )
    rows = ", ".join(
        f"{i + 1}, '{name}', s{i + 1}, "
        + ("n_users" if i == 0 else f"s{i}")
        for i, name in enumerate(stages)
    )
    return totals.selectExpr(
        f"stack({len(stages)}, {rows}) AS (stage, event_type, n_reached, n_prev)"
    ).selectExpr(
        "stage",
        "event_type",
        "n_reached",
        "CASE WHEN n_prev = 0 THEN 0"
        " ELSE n_reached * 100 div n_prev END AS pct_of_prev",
    )


def funnel_oracle(
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    window_hours: int = 24,
) -> str:
    """Conditional-min join chain twin of the fold: stage N's earliest
    qualifying event is the (ts, event_id)-min strictly after the
    user's stage N-1 anchor and within its window — identical
    semantics to processing events in (ts, event_id) order with a
    greedy (stage, anchor_ts) machine. The chain is GENERATED for
    len(stages) CTEs, matching funnel()'s arity-generic fold."""
    if not stages:
        raise ValueError("funnel_oracle needs at least one stage")
    w = int(window_hours)
    ctes = [
        f"""s1 AS (
  SELECT user_id, ts, event_id FROM (
    SELECT user_id, ts, event_id,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS rn
    FROM events WHERE event_type = '{stages[0]}') WHERE rn = 1
)"""
    ]
    for i in range(1, len(stages)):
        prev = f"s{i}"
        ctes.append(
            f"""s{i + 1} AS (
  SELECT user_id, ts, event_id FROM (
    SELECT e.user_id, e.ts, e.event_id,
           ROW_NUMBER() OVER (PARTITION BY e.user_id
                              ORDER BY e.ts, e.event_id) AS rn
    FROM events e JOIN {prev} USING (user_id)
    WHERE e.event_type = '{stages[i]}'
      AND (e.ts > {prev}.ts OR (e.ts = {prev}.ts AND e.event_id > {prev}.event_id))
      AND e.ts <= {prev}.ts + INTERVAL {w} HOUR
  ) WHERE rn = 1
)"""
        )
    t_cols = ",\n         ".join(
        ["(SELECT COUNT(DISTINCT user_id) FROM events) AS n_users"]
        + [
            f"(SELECT COUNT(*) FROM s{i + 1}) AS c{i + 1}"
            for i in range(len(stages))
        ]
    )
    unions = "\n  UNION ALL\n  ".join(
        f"SELECT {i + 1} AS stage, '{name}' AS event_type,"
        f" c{i + 1} AS n_reached, "
        + ("n_users" if i == 0 else f"c{i}")
        + " AS n_prev FROM t"
        for i, name in enumerate(stages)
    )
    return f"""
WITH {', '.join(ctes)}, t AS (
  SELECT {t_cols}
)
SELECT stage, event_type, n_reached,
       CASE WHEN n_prev = 0 THEN 0
            ELSE n_reached * 100 // n_prev END AS pct_of_prev
FROM (
  {unions}
) ORDER BY stage
"""


def rolling_window_stats(events: DataFrame, hours: int = 1) -> DataFrame:
    """Per-event trailing event-time window: how many events and how
    much value the same user produced in the preceding ``hours`` —
    the rolling-feature primitive behind rate limiting, anomaly
    baselines, and per-user activity features. A RANGE frame on the
    event-time axis (not ROWS): bounds are data times, so the result
    is independent of row order and micro-batch boundaries.

    Plan: ONE shuffle on user_id + an in-partition sort; the frame
    slides linearly per partition (no self-join, no explode of the
    interval — the naive events x events time-range join this
    replaces is quadratic per hot user). Value sums accumulate as
    DECIMAL then round once, the engine-exactness rule every money
    aggregate here follows."""
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-(hours * 3_600_000_000), 0)
    )
    return events.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_events_trailing"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast(
                "double"
            ),
            2,
        ).alias("value_trailing"),
    ).orderBy("event_id")


def rolling_window_oracle(hours: int = 1) -> str:
    return f"""
SELECT event_id, user_id, ts,
  COUNT(*) OVER w AS n_events_trailing,
  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE), 2)
    AS value_trailing
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL {hours} HOUR PRECEDING
                       AND CURRENT ROW)
ORDER BY event_id
"""


def retention_cohorts(events: DataFrame) -> DataFrame:
    """Weekly cohort retention: users grouped by the week of their
    first event, counted active per subsequent week offset — the
    standard growth-analytics triangle.

    Shape: one groupBy(user) for cohort assignment, join back on
    user_id (at 100 TB: both sides are keyed by user_id, so
    pre-bucketing events on user_id makes this and the funnel
    shuffle-free), one groupBy(cohort, offset) with a distinct-count.
    Integer week arithmetic: datediff div 7 — exact cross-engine.
    """
    first = events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_date")
    )
    return (
        events.join(first, "user_id")
        .select(
            "user_id",
            F.col("first_date"),
            F.expr("datediff(to_date(ts), first_date) div 7").alias(
                "week_offset"
            ),
        )
        .groupBy("first_date", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .select(
            F.date_format("first_date", "yyyy-MM-dd").alias("cohort_date"),
            "week_offset",
            "n_active",
        )
        .orderBy("cohort_date", "week_offset")
    )


RETENTION_ORACLE = """
WITH first AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS first_date
  FROM events GROUP BY user_id
)
SELECT strftime(f.first_date, '%Y-%m-%d') AS cohort_date,
       datediff('day', f.first_date, CAST(e.ts AS DATE)) // 7
         AS week_offset,
       COUNT(DISTINCT e.user_id) AS n_active
FROM events e JOIN first f USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""


def time_bucket_gapfill(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Hourly time-bucket rollup with gap filling and last-observation
    -carried-forward — the hypertable `time_bucket_gapfill` + `locf`
    shape, per series (``key_col``), spanning each series' own observed
    bucket range.

    Scale design: ONE scan of the input produces the per-(key, bucket)
    aggregate (partial map-side combine, |keys × observed buckets|
    rows); the dense bucket spine is generated FROM that aggregate
    (groupBy key → min/max bucket → ``sequence`` explode) so nothing
    driver-side ever sees the data and no cross join exists. The
    aggregate is lazily localCheckpoint()ed because both the spine and
    the fill join consume it — without the checkpoint the full scan
    would execute twice. Spine ⟕ aggregate is an equi-join on
    (key, bucket) planned as a shuffled hash join (never SMJ); LOCF is
    one additional window pass that reuses the join's hash
    partitioning on the key.
    """
    return gapfill_from_rollup(
        hourly_rollup(
            events, key_col=key_col, ts_col=ts_col, value_col=value_col
        ),
        key_col=key_col,
    )


def hourly_rollup(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """The per-(key, hour-bucket) rollup both gapfill paths share:
    streamable as a single complete-mode aggregation (map-side combined
    — the state is |keys × observed buckets| rows, never the events)."""
    bucket = F.date_trunc("hour", F.col(ts_col))
    return events.groupBy(F.col(key_col), bucket.alias("bucket_start")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col(value_col).cast("decimal(18,4)")).alias("_sv"),
    )


def gapfill_from_rollup(agg: DataFrame, key_col: str = "event_type") -> DataFrame:
    """Spine + LOCF fold over a per-(key, hour-bucket) rollup
    (``n_events``, ``_sv`` decimal sum) — shared by the batch operator
    above and the STREAMING twin (the stream maintains the rollup as a
    complete-mode aggregation, the continuous-aggregate shape; the
    drained table folds through here, so both paths hash against the
    same oracle).

    The rollup feeds BOTH the spine derivation and the fill join, so it
    is lazily localCheckpoint()ed here: one lineage break (a) stops the
    upstream scan executing twice and (b) gives the self-join's two
    sides distinct attribute ids — without it Spark 4's resolver
    rejects the spine⟕rollup join as conflicting references when the
    input is a drained memory table."""
    agg = agg.localCheckpoint(eager=False)
    spine = (
        agg.groupBy(key_col)
        .agg(
            F.min("bucket_start").alias("_mn"),
            F.max("bucket_start").alias("_mx"),
        )
        .select(
            key_col,
            F.explode(
                F.expr("sequence(_mn, _mx, interval 1 hour)")
            ).alias("bucket_start"),
        )
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(
            agg.hint("shuffle_hash"), [key_col, "bucket_start"], "left"
        )
        .select(
            key_col,
            "bucket_start",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.round(F.col("_sv").cast("double"), 2).alias("sum_value"),
            F.round(
                F.last("_sv", ignorenulls=True).over(w).cast("double"), 2
            ).alias("value_locf"),
        )
        .orderBy(key_col, "bucket_start")
    )


GAPFILL_ORACLE = """
WITH agg AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket_start,
         COUNT(*) AS n_events,
         SUM(CAST(value AS DECIMAL(18,4))) AS sv
  FROM events GROUP BY 1, 2),
bounds AS (
  SELECT event_type, MIN(bucket_start) AS mn, MAX(bucket_start) AS mx
  FROM agg GROUP BY 1),
spine AS (
  SELECT event_type,
         UNNEST(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket_start
  FROM bounds)
SELECT s.event_type, s.bucket_start,
       COALESCE(a.n_events, 0) AS n_events,
       ROUND(CAST(a.sv AS DOUBLE), 2) AS sum_value,
       ROUND(CAST(LAST_VALUE(a.sv IGNORE NULLS) OVER (
         PARTITION BY s.event_type ORDER BY s.bucket_start
         ROWS UNBOUNDED PRECEDING) AS DOUBLE), 2) AS value_locf
FROM spine s
LEFT JOIN agg a
  ON a.event_type = s.event_type AND a.bucket_start = s.bucket_start
ORDER BY s.event_type, s.bucket_start
"""


def zscore_outliers(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    min_z_x100: int = 300,
) -> DataFrame:
    """Per-group z-score anomaly detection in exact integer
    arithmetic: values scale to milli-units (floor of the same IEEE
    double product both engines compute), per-group mean/variance fold
    as DECIMAL(38,0) sums (order-independent), and since
    z = (v - mean)/std = (v*n - sum)/sqrt(n*sumsq - sum^2), the score
    is ``|v*n - sum| * 100 div floor(sqrt(n*sumsq - sum^2))`` — the
    only float ops are the int->double conversion (round-to-nearest of
    the identical exact integer) and sqrt, which IEEE 754 requires
    correctly rounded, so both engines floor the same double. Emits rows
    with |z| >= min_z_x100/100 (population std), deterministic order.

    Scale: one partial-agg shuffle for the group moments (|keys|
    rows), then a broadcast join back over the scan — no window over
    the raw events, no per-group sort."""
    v = F.floor(F.col(value_col).cast("double") * 1000).cast("bigint")
    src = events.select(
        "event_id", F.col(key_col).alias("key"), v.alias("v")
    )
    dec = "decimal(38,0)"
    moments = src.groupBy("key").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(F.col("v").cast(dec)).alias("s"),
        F.sum((F.col("v") * F.col("v")).cast(dec)).alias("sq"),
    )
    # population variance * n^2 = n*sumsq - sum^2 (exact DECIMAL);
    # std in milli-units = floor(sqrt(varn2)) div n
    with_std = moments.select(
        "key",
        "n",
        "s",
        F.expr(
            "CAST(floor(sqrt(CAST(n * sq - s * s AS DOUBLE))) AS"
            " DECIMAL(38,0))"
        ).alias("std_n"),
    ).filter(F.col("std_n") > 0)
    scored = src.join(F.broadcast(with_std), "key").select(
        "key",
        "event_id",
        "v",
        F.expr(
            "CAST(abs(CAST(v AS DECIMAL(38,0)) * n - s) * 100"
            " div std_n AS BIGINT)"
        ).alias("z_x100"),
    )
    return (
        scored.filter(F.col("z_x100") >= min_z_x100)
        .select("key", "event_id", F.col("v").alias("value_milli"), "z_x100")
        .orderBy("key", F.col("z_x100").desc(), "event_id")
    )


def zscore_oracle(
    table: str = "events",
    key_col: str = "event_type",
    value_col: str = "value",
    min_z_x100: int = 300,
) -> str:
    return f"""
WITH src AS (
  SELECT event_id, {key_col} AS key,
         CAST(FLOOR(CAST({value_col} AS DOUBLE) * 1000) AS BIGINT) AS v
  FROM {table}),
moments AS (
  SELECT key, COUNT(*)::HUGEINT AS n,
         SUM(v::HUGEINT) AS s,
         SUM((v * v)::HUGEINT) AS sq
  FROM src GROUP BY key),
with_std AS (
  SELECT key, n, s,
         CAST(FLOOR(SQRT(CAST(n * sq - s * s AS DOUBLE))) AS HUGEINT)
           AS std_n
  FROM moments WHERE n * sq - s * s > 0)
SELECT key, event_id, v AS value_milli,
       CAST(abs(v::HUGEINT * n - s) * 100 // std_n AS BIGINT) AS z_x100
FROM src JOIN with_std USING (key)
WHERE abs(v::HUGEINT * n - s) * 100 // std_n >= {min_z_x100}
ORDER BY key, z_x100 DESC, event_id
"""


# --- time-series similarity: user activity profiles ---------------------
# The distributed time-series-similarity-search shape (EDBT 2019 /
# REPOSE ICDE 2021 reference points): each user's event history is
# summarized to a fixed-length integer profile vector (24 hourly bins),
# candidate pairs are BLOCKED on a cheap invariant (the peak-activity
# hour — similar profiles share it), and the exact integer dot product
# ranks pairs within blocks. At 100 TB the blocking key bounds the
# quadratic term to within-block pairs (24-way partition of users);
# heavier skew routes through the same sign-LSH bucketing the embedding
# family uses (llm/vectors.py) — a profile IS a 24-dim embedding.

_PROFILE_HOURS = 24


def _profile_exprs() -> list[str]:
    return [
        f"CAST(SUM(CASE WHEN EXTRACT(hour FROM ts) = {h} THEN 1 ELSE 0 END) AS BIGINT)"
        for h in range(_PROFILE_HOURS)
    ]


def _peak_hour_expr() -> str:
    """Smallest hour holding the max count — identical CASE chain in
    both engines, so ties break identically."""
    g = "GREATEST(" + ", ".join(f"h{h}" for h in range(_PROFILE_HOURS)) + ")"
    cases = " ".join(
        f"WHEN h{h} = {g} THEN {h}" for h in range(_PROFILE_HOURS)
    )
    return f"CASE {cases} END"


def _dot_expr(a: str, b: str) -> str:
    body = " + ".join(
        f"{a}.h{h} * {b}.h{h}" for h in range(_PROFILE_HOURS)
    )
    return f"CAST({body} AS BIGINT)"


def user_activity_profiles(events: DataFrame) -> DataFrame:
    """Per-user 24-bin hourly activity profile + peak hour: one
    conditional-sum aggregation (scan-fused, map-side combined, one
    shuffle on user_id)."""
    from pyspark.sql import functions as F

    profiled = events.groupBy("user_id").agg(
        *[
            F.expr(e).alias(f"h{h}")
            for h, e in enumerate(_profile_exprs())
        ]
    )
    return profiled.selectExpr(
        "*", _peak_hour_expr() + " AS peak_hour"
    ).orderBy("user_id")


def similar_user_pairs(
    events: DataFrame, k: int = 30, max_block: int | None = None
) -> DataFrame:
    """Top-k most-similar user pairs by exact integer profile dot
    product, blocked on shared peak hour. The block join is an
    equi-join (no cross product); within-block pairs are ordered
    (u1 < u2) so each pair appears once.

    ``max_block`` is the family guardrail (same posture as
    ``containment_pairs``): when any peak-hour block exceeds it, the
    within-block pair volume is quadratic in that block — raise with
    the documented escape hatch (``similar_user_pairs_lsh``, which
    sign-LSH buckets the same profiles) instead of degrading silently.
    The probe is one ≤24-row aggregate; the profiles DataFrame is
    persisted first so the probe and the pair join share ONE events
    scan (the cached copy stays for Spark's LRU to evict — results are
    unaffected, and the self-join reads it twice more)."""
    prof = user_activity_profiles(events)
    if max_block is not None:
        prof = prof.persist()
        worst = (
            prof.groupBy("peak_hour")
            .count()
            .agg(F.max("count").alias("m"))
            .first()["m"]
        )
        if worst and worst > max_block:
            prof.unpersist()
            raise ValueError(
                f"peak-hour block of {worst} users exceeds max_block="
                f"{max_block}: quadratic within-block pair volume — "
                "route profiles through similar_user_pairs_lsh "
                "(sign-LSH bucketing) or raise max_block"
            )
    a = prof.alias("a")
    b = prof.alias("b")
    return (
        a.join(
            b,
            on=[
                F.expr("a.peak_hour = b.peak_hour"),
                F.expr("a.user_id < b.user_id"),
            ],
        )
        .select(
            F.col("a.user_id").alias("u1"),
            F.col("b.user_id").alias("u2"),
            F.col("a.peak_hour").alias("peak_hour"),
            F.expr(_dot_expr("a", "b")).alias("dot"),
        )
        .orderBy(F.col("dot").desc(), "u1", "u2")
        .limit(k)
    )


def _profile_cols_sql() -> str:
    return ", ".join(
        f"{e} AS h{h}" for h, e in enumerate(_profile_exprs())
    )


def user_profiles_oracle() -> str:
    return f"""
WITH prof AS (
  SELECT user_id, {_profile_cols_sql()} FROM events GROUP BY user_id)
SELECT *, {_peak_hour_expr()} AS peak_hour FROM prof ORDER BY user_id
"""


def similar_users_oracle(k: int = 30) -> str:
    cols = _profile_cols_sql()
    return f"""
WITH prof AS (SELECT user_id, {cols} FROM events GROUP BY user_id),
peak AS (SELECT *, {_peak_hour_expr()} AS peak_hour FROM prof)
SELECT a.user_id AS u1, b.user_id AS u2, a.peak_hour AS peak_hour,
       {_dot_expr('a', 'b')} AS dot
FROM peak a JOIN peak b
  ON a.peak_hour = b.peak_hour AND a.user_id < b.user_id
ORDER BY dot DESC, u1, u2 LIMIT {k}
"""


def value_motifs(events: DataFrame, w: int = 4, k: int = 20) -> DataFrame:
    """Time-series motif mining: the most frequent length-``w``
    delta-sign shapes ('+'/'-'/'=') in each event type's value series.
    The discrete cousin of matrix-profile motif discovery — sign
    quantization makes the signature integer-exact cross-engine while
    preserving shape (rise/fall/flat runs).

    One shuffle + sort per event_type (every lag rides the SAME window
    spec, so Catalyst plans a single Exchange + Sort); the count agg is
    map-side combined. At 100 TB the per-key series sort is the bound —
    the same posture as sessionization, and the partition key
    (event_type) can be salted by day for very hot types since motifs
    never span the salt boundary beyond w rows."""
    sign = (
        "CASE WHEN d > 0 THEN '+' WHEN d < 0 THEN '-' "
        "WHEN d = 0 THEN '=' END"
    )
    win = Window.partitionBy("event_type").orderBy("ts", "event_id")
    with_sign = events.select(
        "event_type",
        "ts",
        "event_id",
        (F.col("value") - F.lag("value").over(win)).alias("d"),
    ).selectExpr("event_type", "ts", "event_id", sign + " AS s")
    motif = F.concat_ws(
        "", *[F.lag("s", w - 1 - j).over(win) for j in range(w)]
    )
    return (
        with_sign.select("event_type", motif.alias("motif"))
        .filter(F.length("motif") == w)  # incomplete head windows drop out
        .groupBy("event_type", "motif")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "event_type", "motif")
        .limit(k)
    )


def value_motifs_oracle(w: int = 4, k: int = 20) -> str:
    lags = ", ".join(
        f"lag(s, {w - 1 - j}) OVER w2 AS s{j}" for j in range(w)
    )
    concat = " || ".join(f"s{j}" for j in range(w))
    return f"""
WITH deltas AS (
  SELECT event_type, ts, event_id,
         value - lag(value) OVER w AS d
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
), signs AS (
  SELECT event_type, ts, event_id,
         CASE WHEN d > 0 THEN '+' WHEN d < 0 THEN '-'
              WHEN d = 0 THEN '=' END AS s
  FROM deltas
), lagged AS (
  SELECT event_type, {lags}
  FROM signs
  WINDOW w2 AS (PARTITION BY event_type ORDER BY ts, event_id)
), motifs AS (
  SELECT event_type, {concat} AS motif FROM lagged
  WHERE {" AND ".join(f"s{j} IS NOT NULL" for j in range(w))}
)
SELECT event_type, motif, COUNT(*) AS n
FROM motifs GROUP BY event_type, motif
ORDER BY n DESC, event_type, motif LIMIT {k}
"""


def value_motifs_salted(
    events: DataFrame, w: int = 4, k: int = 20
) -> DataFrame:
    """Day-salted twin of :func:`value_motifs` — breaks the per-key
    sort bound for hot event types by partitioning the series window
    on ``(event_type, day)`` instead of ``event_type`` alone, then
    repairing the seam so the result is identical to the unsalted
    operator (the catalog pins hash parity against the SAME unsalted
    oracle).

    Seam repair: a motif anchored in day ``d`` reaches back at most
    ``w`` rows, so the ``w`` most recent rows of the PRECEDING series
    are copied into each block as context rows (``ctx``). Context rows
    supply lag values/signs but never anchor a motif (filtered before
    the count agg). The preceding-series tail is assembled exactly
    without any global sort: each block's own last-``w`` rows (a
    per-block window — data-scale but salted) are forwarded to the
    next ``w`` EXISTING blocks of that type via the tiny block-
    sequence table (types × days rows, broadcast), and each target
    block keeps its ``w`` most recent arrivals. Reach ``w`` suffices
    for exactness: any ``w`` consecutive existing blocks hold ≥ ``w``
    rows (each holds ≥ 1), so the true global tail always lies within
    reach — thin blocks (< ``w`` rows) and empty days both repair
    correctly, which the unsalted-oracle parity pin checks on real
    data. Cost shape: the dominant sort is now per ``(event_type,
    day)`` — at 100 TB a hot type's year of data sorts as ~365
    independent partitions instead of one — plus candidate-set
    windows at blocks×w scale (negligible)."""
    from pyspark.sql import functions as F

    sign = (
        "CASE WHEN d > 0 THEN '+' WHEN d < 0 THEN '-' "
        "WHEN d = 0 THEN '=' END"
    )
    base = events.select(
        "event_type",
        "ts",
        "event_id",
        "value",
        F.date_trunc("day", F.col("ts")).alias("blk"),
    )
    # per-block tails: the only data-scale window, and it is salted
    wrev = Window.partitionBy("event_type", "blk").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    cand = (
        base.withColumn("_rev", F.row_number().over(wrev))
        .filter(F.col("_rev") <= w)
        .drop("_rev")
    )
    # block sequence numbers per type: tiny, broadcast both ways
    wseq = Window.partitionBy("event_type").orderBy("blk")
    seq = (
        base.select("event_type", "blk")
        .distinct()
        .withColumn("_seq", F.row_number().over(wseq))
    )
    # forward each tail row to the next w existing blocks, keep the w
    # most recent arrivals per target block — the exact global tail
    offsets = F.array(*[F.lit(o) for o in range(1, w + 1)])
    wctx = Window.partitionBy("event_type", "_tblk").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    tails = (
        cand.join(F.broadcast(seq), ["event_type", "blk"])
        .withColumn("_o", F.explode(offsets))
        .withColumn("_tseq", F.col("_seq") + F.col("_o"))
        .join(
            F.broadcast(
                seq.select(
                    "event_type",
                    F.col("blk").alias("_tblk"),
                    F.col("_seq").alias("_tseq"),
                )
            ),
            ["event_type", "_tseq"],
        )
        .withColumn("_r", F.row_number().over(wctx))
        .filter(F.col("_r") <= w)
        .select(
            "event_type",
            "ts",
            "event_id",
            "value",
            F.col("_tblk").alias("blk"),
        )
        .withColumn("ctx", F.lit(True))
    )
    rows = base.withColumn("ctx", F.lit(False)).unionByName(tails)

    win = Window.partitionBy("event_type", "blk").orderBy("ts", "event_id")
    with_sign = rows.select(
        "event_type",
        "blk",
        "ctx",
        "ts",
        "event_id",
        (F.col("value") - F.lag("value").over(win)).alias("d"),
    ).selectExpr("event_type", "blk", "ctx", "ts", "event_id", sign + " AS s")
    motif = F.concat_ws(
        "", *[F.lag("s", w - 1 - j).over(win) for j in range(w)]
    )
    return (
        with_sign.select("event_type", "ctx", motif.alias("motif"))
        .filter(~F.col("ctx"))  # context rows never anchor a motif
        .filter(F.length("motif") == w)
        .groupBy("event_type", "motif")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "event_type", "motif")
        .limit(k)
    )


# All 12 opposite-hour contrasts (h vs h+12), ordered so the first
# four reproduce the original fixed scheme (morning/evening etc.) —
# n_bits=4 keeps round-10 bucket assignments (and oracle hashes)
# byte-identical while letting hot datasets widen to up to 12 bits
# (4096 buckets).
_LSH_BIT_PAIRS = (
    (0, 12), (6, 18), (3, 15), (9, 21),
    (1, 13), (2, 14), (4, 16), (5, 17),
    (7, 19), (8, 20), (10, 22), (11, 23),
)


def _lsh_bucket_expr(n_bits: int) -> str:
    if not 1 <= n_bits <= len(_LSH_BIT_PAIRS):
        raise ValueError(
            f"n_bits must be in [1, {len(_LSH_BIT_PAIRS)}], got {n_bits}"
        )
    return " || ".join(
        f"(CASE WHEN h{a} > h{b} THEN '1' ELSE '0' END)"
        for a, b in _LSH_BIT_PAIRS[:n_bits]
    )


def similar_user_pairs_lsh(
    events: DataFrame,
    k: int = 30,
    n_bits: int = 4,
    max_block: int | None = None,
) -> DataFrame:
    """The guardrail's escape hatch, closed: sign-LSH bucketing over
    the profile vectors replaces peak-hour blocking when blocks run
    hot. Bucket bits are the signs of fixed opposite-hour contrasts
    (h0>h12, h6>h18, ... — morning/evening, etc.), the SimHash shape
    on the 24-dim integer profile: similar profiles agree on the
    contrasts and land in the same of ``2**n_bits`` buckets, so the
    quadratic term is bounded by the largest bucket, tunable via
    ``n_bits`` (1..12 opposite-hour contrasts; default 4 = the
    original 16-bucket scheme). Deterministic (no RNG), so the DuckDB
    oracle computes the identical blocking — recall tradeoffs are the
    operator's semantics, not noise.

    ``max_block`` guards the escape hatch itself (round-11 ask: a hot
    bucket makes the escape silently quadratic too): the probe is one
    ≤``2**n_bits``-row aggregate over the persisted profiles; on
    breach it raises with the actionable fix — add bits. The
    scale-probe row in SCALE.md shows each added bit roughly halves
    the worst bucket on the events profile distribution."""
    bits = _lsh_bucket_expr(n_bits)
    prof = user_activity_profiles(events).selectExpr(
        "*", f"({bits}) AS bucket"
    )
    if max_block is not None:
        prof = prof.persist()
        worst = (
            prof.groupBy("bucket")
            .count()
            .agg(F.max("count").alias("m"))
            .first()["m"]
        )
        if worst and worst > max_block:
            prof.unpersist()
            raise ValueError(
                f"sign-LSH bucket of {worst} users exceeds max_block="
                f"{max_block}: quadratic within-bucket pair volume — "
                f"raise n_bits (now {n_bits}, max "
                f"{len(_LSH_BIT_PAIRS)}) to shrink buckets, or raise "
                "max_block"
            )
    a = prof.alias("a")
    b = prof.alias("b")
    return (
        a.join(
            b,
            on=[
                F.expr("a.bucket = b.bucket"),
                F.expr("a.user_id < b.user_id"),
            ],
        )
        .select(
            F.col("a.user_id").alias("u1"),
            F.col("b.user_id").alias("u2"),
            F.col("a.bucket").alias("bucket"),
            F.expr(_dot_expr("a", "b")).alias("dot"),
        )
        .orderBy(F.col("dot").desc(), "u1", "u2")
        .limit(k)
    )


def similar_users_lsh_oracle(k: int = 30, n_bits: int = 4) -> str:
    cols = _profile_cols_sql()
    bits = _lsh_bucket_expr(n_bits)
    return f"""
WITH prof AS (SELECT user_id, {cols} FROM events GROUP BY user_id),
bucketed AS (SELECT *, ({bits}) AS bucket FROM prof)
SELECT a.user_id AS u1, b.user_id AS u2, a.bucket AS bucket,
       {_dot_expr('a', 'b')} AS dot
FROM bucketed a JOIN bucketed b
  ON a.bucket = b.bucket AND a.user_id < b.user_id
ORDER BY dot DESC, u1, u2 LIMIT {k}
"""
