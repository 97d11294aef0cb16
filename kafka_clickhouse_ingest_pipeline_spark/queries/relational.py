"""Tier-B relational surface + core tier-C relational operators (C1-C8).

Tier B is what the reference's own DDL/tests exercise against ClickHouse
(SURVEY.md §2: scan, count, equality filter, projection, order-by, null
semantics). Tier C1-C8 extends that to the full analytical surface the
engine must offer: multi-key aggregation, distinct, joins, rollup/cube,
windows, top-k, set ops, scalar functions. Everything here is pure
DataFrame API over Catalyst — no UDFs, no shuffles beyond the semantic
minimum (dimension joins broadcast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import hashing as HS
from ..plans import layout as ZL
from ..plans import materialize as MAT
from ..functions.rounding import round4, round4_sql
from ..functions.temporal import epoch_ms
from ..registry import query
from ..tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Tier B: the surface the reference's tests exercise
# --------------------------------------------------------------------------


@query(
    "scan_count",
    oracle="SELECT COUNT(*) AS n FROM lineitem",
    description="B1/B2: full scan + COUNT(*) "
    "(ClickHouseRepositoryIntegrationTest.kt:110).",
)
def scan_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n"))


@query(
    "filter_eq_project_sort",
    oracle="""
    SELECT event_id, user_id, value
    FROM events
    WHERE event_type = 'click'
    ORDER BY event_id
    """,
    description="B3/B4/B5: equality filter + projection + ORDER BY "
    "(ClickHouseRepositoryIntegrationTest.kt:168).",
)
def filter_eq_project_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .select("event_id", "user_id", "value")
        .orderBy("event_id")
    )


@query(
    "null_semantics",
    oracle="""
    SELECT
      COUNT(*) AS total,
      COUNT(value) AS value_not_null,
      CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS value_null,
      ROUND(AVG(value), 4) AS avg_value_ignoring_nulls
    FROM events
    """,
    description="B6: NULL fidelity — COUNT skips nulls, AVG ignores nulls "
    "(ClickHouseRepositoryIntegrationTest.kt:194-236).",
)
def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.agg(
        F.count(F.lit(1)).alias("total"),
        F.count("value").alias("value_not_null"),
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0)).alias("value_null"),
        F.round(F.avg("value"), 4).alias("avg_value_ignoring_nulls"),
    )


@query(
    "range_filter_pushdown",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_quantity >= 45 AND l_discount BETWEEN 0.05 AND 0.07
    ORDER BY l_orderkey, l_linenumber
    """,
    description="B3 range variant; predicates reach the parquet scan as "
    "PushedFilters (verified in test_plans.py).",
)
def range_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .filter((F.col("l_quantity") >= 45) & F.col("l_discount").between(0.05, 0.07))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    )


# --------------------------------------------------------------------------
# C1/C2: aggregation
# --------------------------------------------------------------------------


@query(
    "agg_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      ROUND(SUM(l_quantity), 4) AS sum_qty,
      ROUND(SUM(l_extendedprice), 4) AS sum_base_price,
      ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
      ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
      ROUND(AVG(l_quantity), 4) AS avg_qty,
      ROUND(AVG(l_extendedprice), 4) AS avg_price,
      ROUND(AVG(l_discount), 4) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    description="C1: TPC-H Q1-style pricing summary — multi-key hash "
    "aggregate with partial (map-side) combine, expression arithmetic.",
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(charge), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        # bounded final: returnflag × linestatus is an enum domain
        .transform(lambda d: ZL.bounded_sort(d, "l_returnflag", "l_linestatus"))
    )


@query(
    "agg_minmax_by_group",
    oracle="""
    SELECT
      o_orderpriority,
      COUNT(*) AS n_orders,
      ROUND(MIN(o_totalprice), 4) AS min_price,
      ROUND(MAX(o_totalprice), 4) AS max_price,
      ROUND(SUM(o_totalprice), 4) AS sum_price
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    description="C1: min/max/sum/count per group.",
)
def agg_minmax_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 4).alias("min_price"),
            F.round(F.max("o_totalprice"), 4).alias("max_price"),
            F.round(F.sum("o_totalprice"), 4).alias("sum_price"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "distinct_count",
    oracle="""
    SELECT
      o_orderstatus,
      COUNT(DISTINCT o_custkey) AS n_customers,
      COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    description="C2: exact distinct aggregation (expand + two-phase agg "
    "under the hood).",
)
def distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        # bounded final: o_orderstatus is an enum domain
        .transform(lambda d: ZL.bounded_sort(d, "o_orderstatus"))
    )


@query(
    "approx_distinct",
    oracle="""
    SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
           1 AS within_5pct
    FROM orders
    """,
    description="C2: approx_count_distinct (HyperLogLog++) — the 100 TB "
    "path where exact distinct would shuffle every key. The raw HLL "
    "estimate is engine-specific by design and can't hash-match, so the "
    "export is the exact count plus the ERROR-BOUND VERDICT: within_5pct "
    "must be 1 on both engines, which makes the driver's exact hash "
    "value-check the estimator's accuracy contract (rsd=0.02 → well "
    "inside 5%). The estimate itself is asserted (bound + mergeability) "
    "in tests/test_relational.py.",
)
def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = _t(spark, sf_dir, "orders").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx"),
        F.countDistinct("o_custkey").alias("exact_customers"),
    )
    bound = (
        F.abs(F.col("approx") - F.col("exact_customers"))
        <= 0.05 * F.col("exact_customers")
    )
    return agg.select("exact_customers", bound.cast("int").alias("within_5pct"))


# --------------------------------------------------------------------------
# C3: joins
# --------------------------------------------------------------------------


@query(
    "join_orders_customer_agg",
    oracle="""
    SELECT
      c.c_mktsegment,
      COUNT(*) AS n_orders,
      ROUND(SUM(o.o_totalprice), 4) AS revenue,
      ROUND(AVG(o.o_totalprice), 4) AS avg_order
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
    description="C3: fact-dimension inner equi-join; customer side is "
    "broadcast so the orders fact table never shuffles.",
)
def join_orders_customer_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.join(
            F.broadcast(cust), orders.o_custkey == cust.c_custkey, "inner"
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("revenue"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_order"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "join_multiway_star",
    oracle="""
    SELECT
      r.r_name AS region,
      n.n_name AS nation,
      COUNT(*) AS n_orders,
      ROUND(SUM(o.o_totalprice), 4) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    ORDER BY region, nation
    """,
    description="C3: star-schema snowflake join chain; every dimension "
    "broadcasts (one fact scan, zero fact shuffles before the agg).",
)
def join_multiway_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("revenue"),
        )
        # bounded final: region x nation is a fixed reference domain
        .transform(lambda d: ZL.bounded_sort(d, "region", "nation"))
    )


@query(
    "join_left_null_handling",
    oracle="""
    SELECT
      c.c_custkey,
      c.c_name,
      COUNT(o.o_orderkey) AS n_orders,
      ROUND(COALESCE(SUM(o.o_totalprice), 0), 4) AS revenue
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY c.c_custkey
    """,
    description="C3: left outer join — customers with zero orders survive "
    "with count 0 (null-preserving side).",
)
def join_left_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    # Aggregate below the join (r13, guide §2.2 — partial/early
    # aggregation): orders roll up to o_custkey grain BEFORE meeting the
    # customer table, so the join moves |custkeys-with-orders| narrow rows
    # instead of every order row and the post-join groupBy disappears.
    # Exact under the schema invariant that c_custkey is the customer PK
    # (TPC-H; one row per key — the old groupBy could only merge
    # duplicate customer rows, which the schema forbids); a customer with
    # no orders still surfaces via the left join + coalesce(0), and
    # COUNT(o_orderkey)'s non-null semantics carry over because the
    # rolled-up count counts the same non-null orderkeys per key.
    # Interleaved probe: 0.736/0.450 -> 0.403/0.338, collect()-equal.
    oa = orders.groupBy("o_custkey").agg(
        F.count("o_orderkey").alias("_n"),
        F.sum("o_totalprice").alias("_s"),
    )
    return (
        cust.join(oa, oa.o_custkey == cust.c_custkey, "left")
        .select(
            "c_custkey",
            "c_name",
            F.coalesce(F.col("_n"), F.lit(0)).alias("n_orders"),
            F.round(F.coalesce(F.col("_s"), F.lit(0)), 4).alias("revenue"),
        )
        .orderBy("c_custkey")
    )


@query(
    "semi_anti_join_parts",
    oracle="""
    SELECT
      (SELECT COUNT(*) FROM part p
        WHERE p.p_partkey IN (SELECT l_partkey FROM lineitem)) AS parts_ordered,
      (SELECT COUNT(*) FROM part p
        WHERE p.p_partkey NOT IN (SELECT l_partkey FROM lineitem)) AS parts_never_ordered
    """,
    description="C3: left-semi and left-anti joins (existence / absence).",
)
def semi_anti_join_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").select("l_partkey")
    ordered = part.join(li, part.p_partkey == li.l_partkey, "left_semi").count()
    never = part.join(li, part.p_partkey == li.l_partkey, "left_anti").count()
    return spark.createDataFrame(
        [(ordered, never)], "parts_ordered long, parts_never_ordered long"
    )


# --------------------------------------------------------------------------
# C4: rollup / cube / grouping sets
# --------------------------------------------------------------------------


@query(
    "rollup_sales",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      COUNT(*) AS n,
      ROUND(SUM(l_extendedprice), 4) AS revenue
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    description="C4: ROLLUP hierarchy totals (grand total + per-flag "
    "subtotals) in one pass.",
)
def rollup_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 4).alias("revenue"),
        )
        # bounded final: rollup of an enum domain (+ null subtotal rows)
        .transform(
            lambda d: ZL.bounded_sort(
                d,
                F.col("l_returnflag").asc_nulls_first(),
                F.col("l_linestatus").asc_nulls_first(),
            )
        )
    )


@query(
    "cube_sales",
    oracle="""
    SELECT
      o_orderstatus,
      o_orderpriority,
      COUNT(*) AS n,
      ROUND(SUM(o_totalprice), 4) AS revenue
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    description="C4: CUBE — all grouping-set combinations in one shuffle.",
)
def cube_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 4).alias("revenue"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


# --------------------------------------------------------------------------
# C5: window functions
# --------------------------------------------------------------------------


@query(
    "window_top_order_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 4) AS o_totalprice
    FROM (
      SELECT *,
        ROW_NUMBER() OVER (
          PARTITION BY o_custkey
          ORDER BY o_totalprice DESC, o_orderkey
        ) AS rn
      FROM orders
    )
    WHERE rn = 1
    ORDER BY o_custkey
    """,
    description="C5: ranking window (row_number) — top order per customer "
    "with a deterministic tie-break.",
)
def window_top_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    # Same one-exchange window shape as window_running_revenue (r13,
    # guide §2.1). The map-side WindowGroupLimit partial the hash shape got
    # is no real loss: with ~k orders per customer spread over P map
    # partitions it passes ~min(k, P) rows per key — barely below k — while
    # this drops an entire full-table exchange (interleaved probe:
    # 0.649/0.396 -> 0.389/0.330, collect()-equal row order).
    return (
        _t(spark, sf_dir, "orders")
        .repartitionByRange("o_custkey")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey", "o_orderkey", F.round("o_totalprice", 4).alias("o_totalprice")
        )
        .sortWithinPartitions("o_custkey")
    )


@query(
    "window_lag_lead_sessions",
    oracle="""
    SELECT
      user_id,
      event_id,
      CAST(epoch_us(ts) // 1000 AS BIGINT) AS ts_ms,
      CAST(epoch_us(LAG(ts) OVER w) // 1000 AS BIGINT) AS prev_ts_ms,
      LEAD(event_type) OVER w AS next_event_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, ts_ms, event_id
    """,
    description="C5: analytic lag/lead over per-user event streams.",
)
def window_lag_lead_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "user_id",
        "event_id",
        epoch_ms("ts").alias("ts_ms"),
        epoch_ms(F.lag("ts").over(w)).alias("prev_ts_ms"),
        F.lead("event_type").over(w).alias("next_event_type"),
    ).orderBy("user_id", "ts_ms", "event_id")


@query(
    "window_running_revenue",
    oracle="""
    SELECT
      o_custkey,
      o_orderkey,
      ROUND(SUM(o_totalprice) OVER (
        PARTITION BY o_custkey
        ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ), 4) AS running_revenue
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
    description="C5: explicit ROWS frame — per-customer running total.",
)
def window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # One exchange instead of two (r13, guide §2.1): range-partitioning on
    # the window's partition key up front satisfies the window's clustering
    # requirement (same-key rows co-locate), and the final total order then
    # needs only a partition-local sort — the window's hash exchange AND the
    # post-window range exchange collapse into this single range exchange.
    # Row-for-row identical output order (probe-verified collect equality).
    return (
        _t(spark, sf_dir, "orders")
        .repartitionByRange("o_custkey")
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w), 4).alias("running_revenue"),
        )
        .sortWithinPartitions("o_custkey", "o_orderkey")
    )


@query(
    "window_rank_dense",
    oracle="""
    SELECT
      p_brand,
      p_partkey,
      RANK() OVER w AS price_rank,
      DENSE_RANK() OVER w AS price_dense_rank,
      NTILE(4) OVER w AS price_quartile
    FROM part
    WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey)
    ORDER BY p_brand, price_rank, p_partkey
    """,
    description="C5: rank / dense_rank / ntile ranking family.",
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return (
        _t(spark, sf_dir, "part")
        .select(
            "p_brand",
            "p_partkey",
            F.rank().over(w).alias("price_rank"),
            F.dense_rank().over(w).alias("price_dense_rank"),
            F.ntile(4).over(w).alias("price_quartile"),
        )
        .orderBy("p_brand", "price_rank", "p_partkey")
    )


@query(
    "window_percent_cume",
    oracle="""
    SELECT
      c_nationkey,
      c_custkey,
      (FLOOR((PERCENT_RANK() OVER w) * 10000.0 + 0.5 + 0.000001) / 10000.0)
        AS bal_pct_rank,
      (FLOOR((CUME_DIST() OVER w) * 10000.0 + 0.5 + 0.000001) / 10000.0)
        AS bal_cume_dist
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    ORDER BY c_nationkey, c_custkey
    """,
    description="C5: percent_rank / cume_dist distribution functions — "
    "completes the ranking family (rank/dense_rank/ntile are in "
    "window_rank_dense). Ratios of small ints land on .xxxx5 ties, so "
    "both sides use the portable floor-rounding.",
)
def window_percent_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal"), F.col("c_custkey")
    )
    return (
        _t(spark, sf_dir, "customer")
        .select(
            "c_nationkey",
            "c_custkey",
            round4(F.percent_rank().over(w)).alias("bal_pct_rank"),
            round4(F.cume_dist().over(w)).alias("bal_cume_dist"),
        )
        .orderBy("c_nationkey", "c_custkey")
    )


# --------------------------------------------------------------------------
# C6: top-k
# --------------------------------------------------------------------------


@query(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 4) AS o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
    description="C6: ORDER BY + LIMIT → TakeOrderedAndProject (per-partition "
    "top-k then k-way merge; never a full sort at scale).",
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
        .select(
            "o_orderkey", "o_custkey", F.round("o_totalprice", 4).alias("o_totalprice")
        )
    )


# --------------------------------------------------------------------------
# C7: set operations
# --------------------------------------------------------------------------


@query(
    "set_union_intersect_except",
    oracle="""
    WITH big_spenders AS (
      SELECT o_custkey AS custkey FROM orders GROUP BY o_custkey
      HAVING SUM(o_totalprice) > 300000
    ),
    building AS (
      SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    )
    SELECT
      (SELECT COUNT(*) FROM (SELECT custkey FROM big_spenders UNION SELECT custkey FROM building)) AS n_union,
      (SELECT COUNT(*) FROM (SELECT custkey FROM big_spenders INTERSECT SELECT custkey FROM building)) AS n_intersect,
      (SELECT COUNT(*) FROM (SELECT custkey FROM big_spenders EXCEPT SELECT custkey FROM building)) AS n_except
    """,
    description="C7: UNION / INTERSECT / EXCEPT with set (distinct) "
    "semantics.",
)
def set_union_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        orders.groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("rev"))
        .filter(F.col("rev") > 300000)
        .select(F.col("o_custkey").alias("custkey"))
    )
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    n_union = big.union(building).distinct().count()
    n_intersect = big.intersect(building).count()
    n_except = big.exceptAll(building).distinct().count()
    return spark.createDataFrame(
        [(n_union, n_intersect, n_except)],
        "n_union long, n_intersect long, n_except long",
    )


# --------------------------------------------------------------------------
# C8: scalar function surface
# --------------------------------------------------------------------------


@query(
    "scalar_string_funcs",
    oracle="""
    SELECT
      p_partkey,
      LOWER(p_name) AS name_lower,
      UPPER(p_brand) AS brand_upper,
      LENGTH(p_name) AS name_len,
      SUBSTRING(p_name, 1, 5) AS name_prefix,
      regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
      CAST(LENGTH(p_name) - LENGTH(REPLACE(p_name, ' ', '')) + 1 AS INTEGER) AS n_words,
      REPLACE(p_type, ' ', '_') AS type_snake
    FROM part
    """,
    description="C8: string functions — lower/upper/length/substring/"
    "regexp_extract/replace/split.",
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "part")
        .select(
            "p_partkey",
            F.lower("p_name").alias("name_lower"),
            F.upper("p_brand").alias("brand_upper"),
            F.length("p_name").alias("name_len"),
            F.substring("p_name", 1, 5).alias("name_prefix"),
            F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
            F.size(F.split("p_name", " ")).alias("n_words"),
            F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        )
    )


@query(
    "scalar_date_funcs",
    oracle="""
    SELECT
      o_orderkey,
      CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS order_year,
      CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS order_month,
      CAST(EXTRACT(day FROM o_orderdate) AS INTEGER) AS order_day,
      strftime(o_orderdate, '%Y-%m') AS order_yyyymm,
      CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS INTEGER) AS days_since_95
    FROM orders
    """,
    description="C8: date functions — year/month/day extraction, yyyyMM "
    "bucketing (the MergeTree toYYYYMM partition key analog, "
    "init-db.sh:35), datediff.",
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            F.dayofmonth("o_orderdate").alias("order_day"),
            F.date_format("o_orderdate", "yyyy-MM").alias("order_yyyymm"),
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
            ).alias("days_since_95"),
        )
    )


@query(
    "scalar_math_funcs",
    oracle="""
    SELECT
      l_orderkey,
      l_linenumber,
      ROUND(SQRT(l_extendedprice), 4) AS price_sqrt,
      ROUND(LN(l_extendedprice + 1), 4) AS price_ln,
      ROUND(POW(l_discount, 2), 4) AS disc_sq,
      CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
      CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
      ABS(l_quantity - 25) AS qty_dev,
      CAST(l_partkey % 7 AS BIGINT) AS partkey_mod
    FROM lineitem
    """,
    description="C8: math functions — sqrt/ln/pow/floor/ceil/abs/mod.",
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # testdata lineitem is one parquet row group, so the 4.2M HALF_UP
    # rounds (BigDecimal each) otherwise run in the single scan task;
    # spread them ONLY when the scan is observably under-partitioned
    # (guide §2.5 is for genuinely unsplittable inputs — measured
    # 0.92-1.04 s serial vs 0.52-0.70 s spread, interleaved). A
    # splittable production scan is already parallel and the exchange
    # would shuffle the whole table before a map-only projection
    # (VERDICT r12 "What's wrong" #1).
    base = _t(spark, sf_dir, "lineitem")
    if base.rdd.getNumPartitions() * 4 <= spark.sparkContext.defaultParallelism:
        base = base.repartition(F.col("l_orderkey"))
    return (
        base
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
            F.round(F.log(F.col("l_extendedprice") + 1), 4).alias("price_ln"),
            F.round(F.pow("l_discount", F.lit(2)), 4).alias("disc_sq"),
            F.floor("l_quantity").alias("qty_floor"),
            F.ceil("l_quantity").alias("qty_ceil"),
            F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
            (F.col("l_partkey") % 7).alias("partkey_mod"),
        )
    )


@query(
    "case_when_conditional",
    oracle="""
    SELECT
      price_band,
      COUNT(*) AS n,
      ROUND(SUM(o_totalprice), 4) AS revenue
    FROM (
      SELECT
        CASE
          WHEN o_totalprice < 50000 THEN 'small'
          WHEN o_totalprice < 200000 THEN 'medium'
          ELSE 'large'
        END AS price_band,
        o_totalprice
      FROM orders
    )
    GROUP BY price_band
    ORDER BY price_band
    """,
    description="C8: CASE WHEN banding + aggregation.",
)
def case_when_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    band = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "medium")
        .otherwise("large")
    )
    return (
        _t(spark, sf_dir, "orders")
        .select(band.alias("price_band"), "o_totalprice")
        .groupBy("price_band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 4).alias("revenue"),
        )
        .orderBy("price_band")
    )


@query(
    "grouping_sets_sales",
    oracle="""
    SELECT
      o_orderstatus,
      o_orderpriority,
      COUNT(*) AS n,
      ROUND(SUM(o_totalprice), 4) AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    description="C4: explicit GROUPING SETS — per-status, per-priority and "
    "grand-total aggregates in one pass (SQL surface; rollup/cube cover "
    "the DataFrame API).",
)
def grouping_sets_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT
          o_orderstatus,
          o_orderpriority,
          COUNT(*) AS n,
          ROUND(SUM(o_totalprice), 4) AS revenue
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
        """
    )


@query(
    "pivot_user_event_matrix",
    oracle="""
    SELECT
      user_id,
      CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
      CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
      CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
      CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
      CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
    FROM events
    GROUP BY user_id
    """,
    description="C1/C4: pivot — per-user event-type count matrix. Explicit "
    "value list so the pivot is a single pass (no distinct-values "
    "pre-query); oracle is the equivalent conditional aggregation.",
)
def pivot_user_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    kinds = ["click", "error", "purchase", "signup", "view"]
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", kinds)
        .count()
    )
    # pivot leaves null for absent combinations; the oracle produces 0
    return out.select(
        "user_id", *[F.coalesce(F.col(k), F.lit(0)).alias(k) for k in kinds]
    )


@query(
    "unpivot_price_metrics",
    oracle="""
    SELECT o_orderkey, metric,
           (FLOOR(val * 10000.0 + 0.5 + 0.000001) / 10000.0) AS val
    FROM (
      SELECT o_orderkey, 'totalprice' AS metric, o_totalprice AS val FROM orders
      UNION ALL
      SELECT o_orderkey, 'price_k', o_totalprice / 1000.0 FROM orders
    )
    """,
    description="C7/C8: unpivot (wide -> long) via the native unpivot "
    "operator; oracle is the UNION ALL equivalent.",
)
def unpivot_price_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").alias("totalprice"),
        (F.col("o_totalprice") / 1000.0).alias("price_k"),
    )
    return o.unpivot(
        ids=["o_orderkey"],
        values=["totalprice", "price_k"],
        variableColumnName="metric",
        valueColumnName="val",
    ).select("o_orderkey", "metric", round4(F.col("val")).alias("val"))


@query(
    "array_functions_suite",
    oracle="""
    SELECT
      vec_id,
      len(embedding) AS dim,
      (FLOOR(CAST(embedding[1] AS DOUBLE) * 10000.0 + 0.5 + 0.000001) / 10000.0) AS first_el,
      (FLOOR(list_reduce(list_transform(embedding[1:8],
            x -> CAST(x AS DOUBLE)), (a, x) -> a + x) * 10000.0 + 0.5
            + 0.000001) / 10000.0) AS head_sum,
      CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_positive,
      (FLOOR(CAST(list_max(embedding) AS DOUBLE) * 10000.0 + 0.5 + 0.000001)
        / 10000.0) AS max_el
    FROM embeddings
    """,
    description="C8: array-function surface over the embedding column — "
    "size/element_at/slice+aggregate/filter/array_max, all JVM-side "
    "higher-order functions.",
)
def array_functions_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    v = F.col("embedding")
    vd = F.transform(v, lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.size(v).alias("dim"),
        round4(F.element_at(v, 1).cast("double")).alias("first_el"),
        round4(
            F.aggregate(
                F.transform(F.slice(v, 1, 8), lambda x: x.cast("double")),
                F.lit(0.0),
                lambda a, x: a + x,
            )
        ).alias("head_sum"),
        F.size(F.filter(v, lambda x: x > 0)).alias("n_positive"),
        round4(F.array_max(v).cast("double")).alias("max_el"),
    )


@query(
    "null_functions_suite",
    oracle="""
    SELECT
      event_id,
      COALESCE(value, -1.0) AS value_or_default,
      CASE WHEN value IS NULL THEN 'missing' ELSE 'present' END AS value_state,
      NULLIF(event_type, 'error') AS type_no_error,
      IFNULL(json_extract_string(props, '$.absent'), 'n/a') AS absent_or_na
    FROM events
    """,
    description="C8/B6: null-handling functions — coalesce/nullif/ifnull "
    "and CASE over nullable columns.",
)
def null_functions_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.coalesce(F.col("value"), F.lit(-1.0)).alias("value_or_default"),
        F.when(F.col("value").isNull(), "missing")
        .otherwise("present")
        .alias("value_state"),
        F.nullif(F.col("event_type"), F.lit("error")).alias("type_no_error"),
        F.ifnull(
            F.get_json_object("props", "$.absent"), F.lit("n/a")
        ).alias("absent_or_na"),
    )


@query(
    "window_range_frame_30d",
    oracle="""
    SELECT
      o_custkey,
      o_orderkey,
      day_no,
      ROUND(SUM(o_totalprice) OVER (
        PARTITION BY o_custkey ORDER BY day_no
        RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
      ), 4) AS revenue_30d
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS BIGINT)
               AS day_no
      FROM orders
    )
    """,
    description="C5: RANGE frame — trailing-30-day revenue per customer; "
    "value-based frame bounds (all orders within the window, not a fixed "
    "row count), the time-series rolling-aggregate shape.",
)
def window_range_frame_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").withColumn(
        "day_no",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        ).cast("long"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day_no")
        .rangeBetween(-30, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "day_no",
        F.round(F.sum("o_totalprice").over(w), 4).alias("revenue_30d"),
    )


@query(
    "group_concat_users",
    oracle="""
    SELECT event_type,
           array_to_string(list_sort(list(DISTINCT user_id)), ',') AS users_csv,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    WHERE user_id < 25
    GROUP BY event_type
    ORDER BY event_type
    """,
    description="C1/C8: grouped list aggregation (ClickHouse groupArray "
    "analog) — collect_set sorted then joined, deterministic by "
    "construction.",
)
def group_concat_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(F.col("user_id") < 25)
    return (
        ev.groupBy("event_type")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_set("user_id")),
                    lambda x: x.cast("string"),
                ),
            ).alias("users_csv"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("event_type")
    )


@query(
    "histogram_prices",
    oracle="""
    SELECT CAST(LEAST(FLOOR(o_totalprice / 50000.0) + 1, 11) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           ROUND(MIN(o_totalprice), 4) AS lo,
           ROUND(MAX(o_totalprice), 4) AS hi
    FROM orders
    GROUP BY 1
    ORDER BY bucket
    """,
    description="C1/C8: equi-width histogram (manual bucket arithmetic — "
    "DuckDB 1.0 lacks width_bucket) — the ClickHouse histogram() analog "
    "as a plain aggregation.",
)
def histogram_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.least(F.floor(F.col("o_totalprice") / 50000.0) + 1, F.lit(11))
            .cast("long")
            .alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 4).alias("lo"),
            F.round(F.max("o_totalprice"), 4).alias("hi"),
        )
        .orderBy("bucket")
    )


@query(
    "supplier_balance_by_region",
    oracle="""
    SELECT r.r_name AS region,
           COUNT(*) AS n_suppliers,
           (FLOOR(AVG(s.s_acctbal) * 10000.0 + 0.5 + 0.000001) / 10000.0)
             AS avg_balance,
           CAST(SUM(CASE WHEN s.s_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_negative
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY region
    """,
    description="C1/C3: supplier account balances rolled up to region "
    "(completes table coverage: every testdata table now has an "
    "oracle-checked query).",
)
def supplier_balance_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            round4(F.avg("s_acctbal")).alias("avg_balance"),
            F.sum(F.when(F.col("s_acctbal") < 0, 1).otherwise(0)).alias(
                "n_negative"
            ),
        )
        .orderBy("region")
    )


@query(
    "join_full_outer_nation_coverage",
    oracle="""
    WITH c AS (
      SELECT c_nationkey AS nationkey, COUNT(*) AS n_rich_cust,
             ROUND(SUM(c_acctbal), 4) AS cust_bal
      FROM customer WHERE c_acctbal > 7000 GROUP BY c_nationkey
    ), s AS (
      SELECT s_nationkey AS nationkey, COUNT(*) AS n_rich_supp,
             ROUND(SUM(s_acctbal), 4) AS supp_bal
      FROM supplier WHERE s_acctbal > 7000 GROUP BY s_nationkey
    )
    SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
           COALESCE(n_rich_cust, 0) AS n_rich_cust,
           COALESCE(n_rich_supp, 0) AS n_rich_supp,
           cust_bal, supp_bal
    FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
    ORDER BY nationkey
    """,
    description="C3: full outer join — per-nation high-balance customers vs "
    "suppliers; the differently-filtered sides guarantee unmatched keys in "
    "both directions, exercising null-fill on each. Completes the join-type "
    "family (inner/left/semi/anti/full).",
)
def join_full_outer_nation_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 7000)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n_rich_cust"),
            F.round(F.sum("c_acctbal"), 4).alias("cust_bal"),
        )
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") > 7000)
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n_rich_supp"),
            F.round(F.sum("s_acctbal"), 4).alias("supp_bal"),
        )
    )
    return (
        cust.join(supp, "nationkey", "full_outer")
        .select(
            "nationkey",
            F.coalesce("n_rich_cust", F.lit(0)).alias("n_rich_cust"),
            F.coalesce("n_rich_supp", F.lit(0)).alias("n_rich_supp"),
            "cust_bal",
            "supp_bal",
        )
        .orderBy("nationkey")
    )


@query(
    "window_first_last_nth",
    oracle="""
    SELECT
      o_custkey,
      o_orderkey,
      FIRST_VALUE(o_totalprice) OVER w AS first_price,
      LAST_VALUE(o_totalprice) OVER w AS last_price,
      NTH_VALUE(o_totalprice, 2) OVER w AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_custkey, o_orderkey
    """,
    description="C5: first_value / last_value / nth_value navigation "
    "functions over an explicit full frame (the default growing frame "
    "makes last_value useless — a classic window-frame trap; customers "
    "with a single order get NULL second_price on both engines). "
    "Completes C5: ranking, distribution, offset, navigation, aggregate "
    "windows with ROWS and RANGE frames.",
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.first("o_totalprice").over(w).alias("first_price"),
            F.last("o_totalprice").over(w).alias("last_price"),
            F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "window_rolling_median",
    oracle="""
    SELECT o_custkey, o_orderkey,
           (FLOOR(quantile_cont(o_totalprice, 0.5) OVER (
              PARTITION BY o_custkey
              ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
            ) * 10000.0 + 0.5 + 0.000001) / 10000.0) AS rolling_median_price
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
    description="C5: rolling median — exact interpolated percentile as a "
    "windowed aggregate over the customer's trailing 7 orders. Partition-"
    "local (shuffle on o_custkey only); the frame holds <=7 values so the "
    "per-row exact quantile is O(1), scale-independent.",
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-6, 0)
    )
    # Same one-exchange window shape as window_running_revenue (r13,
    # guide §2.1): range-partition on the partition key, window reuses the
    # clustering, final order is partition-local.
    return (
        _t(spark, sf_dir, "orders")
        .repartitionByRange("o_custkey")
        .select(
            "o_custkey",
            "o_orderkey",
            round4(F.expr("percentile(o_totalprice, 0.5)").over(w)).alias(
                "rolling_median_price"
            ),
        )
        .sortWithinPartitions("o_custkey", "o_orderkey")
    )


@query(
    "json_roundtrip_suite",
    oracle="""
    WITH j AS (
      SELECT o_orderkey,
             to_json(struct_pack(ok := o_orderkey, st := o_orderstatus,
                                 pr := o_orderpriority)) AS doc
      FROM orders
    )
    SELECT o_orderkey,
           CAST(json_extract_string(doc, '$.ok') AS BIGINT) AS ok_back,
           json_extract_string(doc, '$.st') AS st_back,
           json_extract_string(doc, '$.pr') AS pr_back,
           json_extract_string(doc, '$.absent') AS absent_field
    FROM j
    ORDER BY o_orderkey
    """,
    description="C8: JSON construction + extraction round-trip — "
    "to_json(struct(...)) then get_json_object/json_tuple back out, "
    "missing path -> null. Only extracted values are exported (raw JSON "
    "text would differ in number formatting across engines). Pure "
    "projection: codegen'd, no shuffle.",
)
def json_roundtrip_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    doc = F.to_json(
        F.struct(
            F.col("o_orderkey").alias("ok"),
            F.col("o_orderstatus").alias("st"),
            F.col("o_orderpriority").alias("pr"),
        )
    )
    return (
        o.select("o_orderkey", doc.alias("doc"))
        .select(
            "o_orderkey",
            F.get_json_object("doc", "$.ok").cast("long").alias("ok_back"),
            F.json_tuple(F.col("doc"), "st", "pr").alias("st_back", "pr_back"),
            F.get_json_object("doc", "$.absent").alias("absent_field"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "regexp_suite",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, '[0-9]+')) AS n_numbers,
           COALESCE(regexp_extract_all(text, '[0-9]+')[1], '') AS first_number,
           len(regexp_extract_all(text, '[aeiou]+')) AS n_vowel_runs,
           regexp_replace(text, '[0-9]+', '#', 'g') AS masked_prefix
    FROM (
      SELECT doc_id, substr(text, 1, 120) AS text FROM documents
    )
    ORDER BY doc_id
    """,
    description="C8: regexp family — extract-all (count + first match), "
    "vowel-run count, global replace, over a 120-char prefix. Patterns "
    "restricted to character classes, which Java regex and RE2 interpret "
    "identically.",
)
def regexp_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = F.substring("text", 1, 120)
    nums = F.regexp_extract_all(t, F.lit("[0-9]+"), 0)
    return (
        docs.select(
            "doc_id",
            F.size(nums).alias("n_numbers"),
            F.coalesce(F.try_element_at(nums, F.lit(1)), F.lit("")).alias(
                "first_number"
            ),
            F.size(F.regexp_extract_all(t, F.lit("[aeiou]+"), 0)).alias(
                "n_vowel_runs"
            ),
            F.regexp_replace(t, "[0-9]+", "#").alias("masked_prefix"),
        )
        .orderBy("doc_id")
    )


@query(
    "temporal_arith_suite",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_3m,
           strftime(o_orderdate - INTERVAL 7 DAY, '%Y-%m-%d') AS minus_7d,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           CAST(quarter(o_orderdate) AS INT) AS q,
           CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
           CAST(isodow(o_orderdate) AS INT) AS iso_dow
    FROM orders
    ORDER BY o_orderkey
    """,
    description="C8: temporal arithmetic — add_months (end-of-month "
    "clamped in both engines), date_sub, last_day, quarter, ISO week, "
    "ISO day-of-week (Spark weekday()+1 == DuckDB isodow). Dates exported "
    "as strings.",
)
def temporal_arith_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return (
        o.select(
            "o_orderkey",
            F.date_format(F.add_months(d, 3), "yyyy-MM-dd").alias("plus_3m"),
            F.date_format(F.date_sub(d, 7), "yyyy-MM-dd").alias("minus_7d"),
            F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
            F.quarter(d).alias("q"),
            F.weekofyear(d).alias("iso_week"),
            (F.weekday(d) + F.lit(1)).cast("int").alias("iso_dow"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "scalar_int_bit_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           (l_orderkey & 255) AS key_low_byte,
           (l_orderkey | 4096) AS key_or_bit,
           xor(l_orderkey, CAST(l_linenumber AS BIGINT)) AS key_xor_line,
           (CAST(l_linenumber AS BIGINT) << 4) AS line_shl4,
           (l_orderkey >> 8) AS key_shr8,
           (l_orderkey % 97) AS key_mod97,
           CAST(abs(l_orderkey - 3000) AS BIGINT) AS key_dist,
           CAST(sign(l_orderkey - 3000) AS INT) AS key_side
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber
    """,
    description="C8: integer & bitwise scalar ops — and/or/xor, shifts, "
    "mod, abs, sign (ClickHouse bitAnd/bitOr/bitXor/bitShift* analogs). "
    "Operands kept positive so %-sign semantics can't diverge.",
)
def scalar_int_bit_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    k = F.col("l_orderkey")
    ln = F.col("l_linenumber").cast("long")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            k.bitwiseAND(F.lit(255)).alias("key_low_byte"),
            k.bitwiseOR(F.lit(4096)).alias("key_or_bit"),
            k.bitwiseXOR(ln).alias("key_xor_line"),
            F.shiftleft(ln, 4).alias("line_shl4"),
            F.shiftright(k, 8).alias("key_shr8"),
            (k % 97).alias("key_mod97"),
            F.abs(k - 3000).cast("long").alias("key_dist"),
            F.signum(k - 3000).cast("int").alias("key_side"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "explode_with_position",
    oracle="""
    SELECT doc_id, s.w AS word, s.p AS pos
    FROM (
      SELECT doc_id,
             unnest(list_transform(
               list_slice(string_split(text, ' '), 1, 5),
               (x, i) -> struct_pack(w := x, p := i)
             )) AS s
      FROM documents
    )
    ORDER BY doc_id, pos
    """,
    description="C8: positional explode (LATERAL VIEW posexplode / "
    "ClickHouse ARRAY JOIN ... AS idx analog) — first five words of each "
    "doc with their 1-based positions. Generator runs inline per row: "
    "linear, no shuffle before the presentation sort.",
)
def explode_with_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = F.slice(F.split("text", " "), 1, 5)
    return (
        docs.select("doc_id", F.posexplode(words).alias("pos0", "word"))
        .select("doc_id", "word", (F.col("pos0") + 1).alias("pos"))
        .orderBy("doc_id", "pos")
    )


@query(
    "map_event_type_counts",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_types,
           COALESCE(MAX(CASE WHEN event_type = 'click' THEN cnt END), 0)
             AS clicks,
           COALESCE(MAX(CASE WHEN event_type = 'purchase' THEN cnt END), 0)
             AS purchases
    FROM (
      SELECT user_id, event_type, COUNT(*) AS cnt
      FROM events GROUP BY user_id, event_type
    )
    GROUP BY user_id
    ORDER BY user_id
    """,
    description="C8: MapType column construction + lookup (ClickHouse "
    "Map(String,UInt64) / sumMap analog): per-user map event_type->count "
    "built with map_from_entries(collect_list(struct)), read back with "
    "element_at. The map stays executor-side (bounded by |event types|); "
    "the oracle verifies the observable lookups via conditional "
    "aggregation.",
)
def map_event_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    m = F.map_from_entries(
        F.collect_list(F.struct("event_type", "cnt"))
    )
    return (
        counts.groupBy("user_id")
        .agg(m.alias("type_counts"))
        .select(
            "user_id",
            F.size("type_counts").alias("n_types"),
            F.coalesce(
                F.element_at("type_counts", F.lit("click")), F.lit(0)
            ).alias("clicks"),
            F.coalesce(
                F.element_at("type_counts", F.lit("purchase")), F.lit(0)
            ).alias("purchases"),
        )
        .orderBy("user_id")
    )


@query(
    "scalar_conditional_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           (FLOOR(greatest(l_extendedprice, l_quantity * 1000.0)
                  * 10000.0 + 0.5 + 0.000001) / 10000.0) AS hi,
           (FLOOR(least(l_discount, l_tax)
                  * 10000.0 + 0.5 + 0.000001) / 10000.0) AS lo,
           nullif(l_linenumber, 1) AS line_or_null,
           ifnull(nullif(l_returnflag, 'N'), 'neutral') AS flag_defaulted
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber
    """,
    description="C8: conditional scalars — greatest/least, nullif, "
    "ifnull (ClickHouse greatest/least/nullIf/ifNull analogs). Pure "
    "projection.",
)
def scalar_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            round4(
                F.greatest(F.col("l_extendedprice"), F.col("l_quantity") * 1000.0)
            ).alias("hi"),
            round4(F.least(F.col("l_discount"), F.col("l_tax"))).alias("lo"),
            F.nullif(F.col("l_linenumber"), F.lit(1)).alias("line_or_null"),
            F.ifnull(
                F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("neutral")
            ).alias("flag_defaulted"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "set_ops_all_variants",
    oracle="""
    WITH f AS (SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'),
         s AS (SELECT l_suppkey FROM lineitem WHERE l_linestatus = 'F'
               AND l_quantity > 40)
    SELECT
      (SELECT COUNT(*) FROM (SELECT * FROM f UNION ALL SELECT * FROM s))
        AS n_union_all,
      (SELECT COUNT(*) FROM (SELECT * FROM f INTERSECT ALL SELECT * FROM s))
        AS n_intersect_all,
      (SELECT COUNT(*) FROM (SELECT * FROM f EXCEPT ALL SELECT * FROM s))
        AS n_except_all
    """,
    description="C7: multiset (ALL) set operations — duplicate-preserving "
    "union/intersect/except over supplier keys from two lineitem slices. "
    "intersectAll/exceptAll plan as count-matching via hash aggregation "
    "on the key — shuffle scales with distinct keys, not rows.",
)
def set_ops_all_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    f = li.where(F.col("l_returnflag") == "R").select("l_suppkey")
    s = li.where(
        (F.col("l_linestatus") == "F") & (F.col("l_quantity") > 40)
    ).select("l_suppkey")
    n_union_all = f.unionAll(s).count()
    n_intersect_all = f.intersectAll(s).count()
    n_except_all = f.exceptAll(s).count()
    return spark.createDataFrame(
        [(n_union_all, n_intersect_all, n_except_all)],
        "n_union_all long, n_intersect_all long, n_except_all long",
    )


@query(
    "having_large_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, ROUND(SUM(l_quantity), 4) AS total_qty
      FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 150
    )
    SELECT o.o_orderkey, c.c_name, o.o_orderpriority,
           ROUND(o.o_totalprice, 4) AS o_totalprice,
           b.total_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
    description="C1/C3/C6: TPC-H Q18 shape — aggregate lineitem to order "
    "grain, HAVING gate on the aggregate, join the survivors back to "
    "orders and customer, top-100 by price. The HAVING filter runs on "
    "post-aggregation rows (orders grain, already reduced), so the "
    "join fan-in is the filtered key set, not the fact table.",
)
def having_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("raw_qty"))
        .where(F.col("raw_qty") > 150)
        .select(
            "l_orderkey", F.round("raw_qty", 4).alias("total_qty")
        )
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "o_orderkey",
            "c_name",
            "o_orderpriority",
            F.round("o_totalprice", 4).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@query(
    "rollup_grouping_id",
    oracle="""
    SELECT
      COALESCE(o_orderstatus, '<all>') AS status,
      COALESCE(o_orderpriority, '<all>') AS priority,
      CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
      COUNT(*) AS n,
      ROUND(SUM(o_totalprice), 4) AS revenue
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY gid, status, priority
    """,
    description="C4: ROLLUP with grouping_id — the bitmask that "
    "distinguishes subtotal NULLs from genuine NULL data (identical "
    "bit order in both engines), with subtotal labels folded in via "
    "coalesce.",
)
def rollup_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 4).alias("revenue"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
            "gid",
            "n",
            "revenue",
        )
        .orderBy("gid", "status", "priority")
    )


@query(
    "array_set_ops_suite",
    oracle="""
    WITH w AS (
      SELECT p_partkey,
             string_split(p_name, ' ') AS name_words,
             string_split(p_type, ' ') AS type_words
      FROM part
    )
    SELECT p_partkey,
           array_to_string(list_sort(list_distinct(
             name_words || type_words)), ',') AS union_words,
           COALESCE(array_to_string(list_sort(list_distinct(
             list_intersect(name_words, type_words))), ','), '')
             AS common_words,
           COALESCE(array_to_string(list_sort(list_filter(
             list_distinct(name_words),
             x -> NOT list_contains(type_words, x))), ','), '')
             AS name_only_words,
           list_contains(name_words, 'data') AS mentions_data,
           len(list_intersect(name_words, type_words)) > 0 AS has_overlap
    FROM w
    ORDER BY p_partkey
    """,
    description="C8: array set algebra — union/intersect/except/"
    "contains/overlaps over word arrays (ClickHouse arrayIntersect/"
    "arrayConcat/has analogs). Both engines' set ops are order-"
    "unspecified, so results are sorted and joined before export. Pure "
    "projection, codegen'd.",
)
def array_set_ops_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    nw = F.split("p_name", " ")
    tw = F.split("p_type", " ")
    return (
        p.select(
            "p_partkey",
            F.array_join(F.array_sort(F.array_union(nw, tw)), ",").alias(
                "union_words"
            ),
            F.array_join(
                F.array_sort(F.array_distinct(F.array_intersect(nw, tw))), ","
            ).alias("common_words"),
            F.array_join(
                F.array_sort(F.array_except(nw, tw)), ","
            ).alias("name_only_words"),
            F.array_contains(nw, "data").alias("mentions_data"),
            F.arrays_overlap(nw, tw).alias("has_overlap"),
        )
        .orderBy("p_partkey")
    )


@query(
    "try_arithmetic_suite",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           (FLOOR((l_extendedprice / nullif(l_quantity - 25.0, 0.0))
                  * 10000.0 + 0.5 + 0.000001) / 10000.0) AS safe_ratio,
           TRY_CAST(l_returnflag AS INT) AS flag_as_int,
           CAST(epoch_us(TRY_CAST('2024-01-15 10:00:00' AS TIMESTAMP)) // 1000
                AS BIGINT) AS ts_good_ms,
           TRY_CAST(l_linestatus AS TIMESTAMP) AS ts_bad,
           ([l_quantity])[5] AS oob_element
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber
    """,
    description="C8: error-safe (try_*) expression family — Spark 4 runs "
    "ANSI mode by default, so division by zero, bad casts, bad timestamp "
    "parses, and out-of-bounds array access all THROW unless routed "
    "through try_divide/try_cast/try_to_timestamp/try_element_at; this "
    "suite pins the null-on-error semantics (DuckDB's /0 and TRY_CAST "
    "are natively null-on-error, matching).",
)
def try_arithmetic_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            round4(
                F.try_divide(
                    F.col("l_extendedprice"), F.col("l_quantity") - 25.0
                )
            ).alias("safe_ratio"),
            F.try_to_number(F.col("l_returnflag"), F.lit("9")).cast("int").alias(
                "flag_as_int"
            ),
            epoch_ms(
                F.try_to_timestamp(F.lit("2024-01-15 10:00:00"))
            ).alias("ts_good_ms"),
            F.try_to_timestamp(F.col("l_linestatus")).alias("ts_bad"),
            F.try_element_at(F.array(F.col("l_quantity")), F.lit(5)).alias(
                "oob_element"
            ),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "limit_by_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, ROUND(o_totalprice, 4) AS o_totalprice
    FROM orders
    QUALIFY ROW_NUMBER() OVER (
      PARTITION BY o_orderpriority
      ORDER BY o_totalprice DESC, o_orderkey
    ) <= 3
    ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey
    """,
    description="C5/C6: ClickHouse `LIMIT 3 BY o_orderpriority` analog — "
    "top-3 rows per group via ranking window. Partition-local: shuffle "
    "on the group key only, per-group heap-sized state, no global sort "
    "of the fact table.",
)
def limit_by_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= 3)
        .select(
            "o_orderpriority",
            "o_orderkey",
            F.round("o_totalprice", 4).alias("o_totalprice"),
        )
        .orderBy(
            "o_orderpriority", F.col("o_totalprice").desc(), "o_orderkey"
        )
    )


@query(
    "agg_filtered_family",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice) FILTER (WHERE l_quantity > 40), 4)
             AS sum_price_bulk,
           ROUND(AVG(l_discount) FILTER (WHERE l_linestatus = 'F'), 4)
             AS avg_disc_finished,
           ROUND(MIN(l_extendedprice) FILTER (WHERE l_tax > 0.05), 4)
             AS min_price_taxed,
           ROUND(MAX(l_extendedprice) FILTER (
             WHERE l_shipdate >= TIMESTAMP '1997-01-01'), 4)
             AS max_price_recent,
           count_if(l_quantity > 40) AS n_bulk
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    description="C1: filtered aggregates — the ClickHouse -If combinator "
    "family (sumIf/avgIf/minIf/maxIf/countIf) as FILTER-style conditional "
    "aggregation. One pass, one shuffle; each aggregate carries its own "
    "predicate.",
)
def agg_filtered_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    bulk = F.col("l_quantity") > 40
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.sum(F.when(bulk, F.col("l_extendedprice"))), 4).alias(
                "sum_price_bulk"
            ),
            F.round(
                F.avg(
                    F.when(F.col("l_linestatus") == "F", F.col("l_discount"))
                ),
                4,
            ).alias("avg_disc_finished"),
            F.round(
                F.min(F.when(F.col("l_tax") > 0.05, F.col("l_extendedprice"))),
                4,
            ).alias("min_price_taxed"),
            F.round(
                F.max(
                    F.when(
                        F.col("l_shipdate")
                        >= F.lit("1997-01-01").cast("timestamp"),
                        F.col("l_extendedprice"),
                    )
                ),
                4,
            ).alias("max_price_recent"),
            F.count_if(bulk).alias("n_bulk"),
        )
        # bounded final: l_returnflag is an enum domain
        .transform(lambda d: ZL.bounded_sort(d, "l_returnflag"))
    )


@query(
    "window_ratio_to_report",
    oracle="""
    WITH nat AS (
      SELECT n.n_name AS nation,
             ROUND(SUM(c.c_acctbal), 4) AS nation_bal
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name
    )
    SELECT nation, nation_bal,
           (FLOOR((100.0 * nation_bal / SUM(nation_bal) OVER ())
                  * 10000.0 + 0.5 + 0.000001) / 10000.0) AS pct_of_total
    FROM nat
    ORDER BY nation
    """,
    description="C5: ratio-to-report — each nation's share of total "
    "customer balance via an unpartitioned window over ALREADY-AGGREGATED "
    "rows (|nations|, not |customers|), so the global window is "
    "bounded-size by construction; the fact table only feeds the "
    "partial+final hash aggregate.",
)
def window_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    nat = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.round(F.sum("c_acctbal"), 4).alias("nation_bal"))
    )
    w = Window.partitionBy()
    return (
        nat.select(
            "nation",
            "nation_bal",
            round4(
                100.0 * F.col("nation_bal") / F.sum("nation_bal").over(w)
            ).alias("pct_of_total"),
        )
        .orderBy("nation")
    )


@query(
    "approx_percentiles_bounded",
    oracle="""
    SELECT
      (FLOOR(quantile_cont(o_totalprice, 0.5) * 10000.0 + 0.5 + 0.000001)
       / 10000.0) AS p50_exact,
      (FLOOR(quantile_cont(o_totalprice, 0.9) * 10000.0 + 0.5 + 0.000001)
       / 10000.0) AS p90_exact,
      1 AS p50_within, 1 AS p90_within
    FROM orders
    """,
    description="C2: approx_percentile (KLL-ish quantile sketch) — the "
    "100 TB path where exact quantiles would global-sort. Like "
    "approx_distinct, the raw estimate is engine-specific, so the export "
    "is the exact interpolated quantiles plus RANK-BOUND VERDICTS: each "
    "approx value must land between the exact q±0.01 quantiles "
    "(accuracy=10000 => rank error 1e-4, two orders inside the bound), "
    "making the driver hash value-check the sketch's accuracy contract.",
)
def approx_percentiles_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    qs = [0.49, 0.5, 0.51, 0.89, 0.9, 0.91]
    agg = o.agg(
        F.percentile("o_totalprice", F.lit(qs)).alias("ex"),
        F.percentile_approx(
            "o_totalprice", F.lit([0.5, 0.9]), F.lit(10000)
        ).alias("ap"),
    )
    ex, ap = F.col("ex"), F.col("ap")
    return agg.select(
        round4(ex[1]).alias("p50_exact"),
        round4(ex[4]).alias("p90_exact"),
        ((ap[0] >= ex[0]) & (ap[0] <= ex[2])).cast("int").alias("p50_within"),
        ((ap[1] >= ex[3]) & (ap[1] <= ex[5])).cast("int").alias("p90_within"),
    )


@query(
    "histogram_order_prices",
    oracle="""
    WITH bins AS (
      SELECT CAST(LEAST(FLOOR(o_totalprice / 50000.0), 11) AS BIGINT) AS bin
      FROM orders
    )
    SELECT bin,
           CAST(bin * 50000.0 AS DOUBLE) AS lo,
           CAST(COUNT(*) AS BIGINT) AS n,
           (FLOOR((COUNT(*) * 1.0 / (SELECT COUNT(*) FROM orders))
                  * 10000.0 + 0.5 + 0.000001) / 10000.0) AS frac
    FROM bins
    GROUP BY bin
    ORDER BY bin
    """,
    description="C1/B analog of ClickHouse histogram(): equal-width "
    "binning of order prices (12 bins of 50k, top bin open-ended) with "
    "counts and corpus fractions. The bin id is a pure projection, so "
    "the whole histogram is one partial-aggregated groupBy over O(bins) "
    "distinct keys — shuffle bytes are KB at any corpus size; the total "
    "joins in as a broadcast scalar.",
)
def histogram_order_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    bin_col = F.least(
        F.floor(F.col("o_totalprice") / 50000.0), F.lit(11)
    ).cast("long")
    binned = o.select(bin_col.alias("bin"))
    total = o.select(F.count(F.lit(1)).alias("__total"))
    return (
        binned.groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(total))
        .select(
            "bin",
            (F.col("bin") * 50000.0).alias("lo"),
            "n",
            round4(F.col("n") * 1.0 / F.col("__total")).alias("frac"),
        )
        .orderBy("bin")
    )


@query(
    "url_functions_suite",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/' || lang || '/'
               || CAST(doc_id AS VARCHAR) || '?lang=' || lang || '&v=2#top'
               AS url
      FROM documents
    )
    SELECT doc_id,
           url,
           regexp_extract(url, '^([a-z]+)://', 1) AS protocol,
           regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?#]*)', 1) AS path,
           regexp_extract(url, '\\?([^#]*)', 1) AS query_string,
           regexp_extract(url, 'lang=([^&#]*)', 1) AS lang_param,
           regexp_extract(url, '^[a-z]+://[^/]+\\.([a-z]+)\\.[a-z]+', 1)
             AS subdomain_tail
    FROM u
    ORDER BY doc_id
    """,
    description="C8: URL function family (ClickHouse protocol/domain/path/"
    "queryString/extractURLParameter analogs) — Spark parse_url on a "
    "deterministically synthesized url column; the oracle recomputes each "
    "part with anchored regexps (identical character-class semantics in "
    "Java and RE2-ish DuckDB). Pure projection, codegen'd.",
)
def url_functions_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("lang"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&v=2#top"),
    )
    u = docs.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        "url",
        F.parse_url("url", F.lit("PROTOCOL")).alias("protocol"),
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query_string"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
        F.regexp_extract(
            "url", r"^[a-z]+://[^/]+\.([a-z]+)\.[a-z]+", 1
        ).alias("subdomain_tail"),
    ).orderBy("doc_id")


@query(
    "props_schema_drift_stats",
    oracle=r"""
    WITH kv AS (
      SELECT event_id, k,
             json_extract_string(props, '$.' || k) AS v
      FROM (
        SELECT event_id, props, unnest(json_keys(props)) AS k
        FROM events WHERE json_valid(props)
      )
    )
    SELECT k AS prop_key,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           (FLOOR((COUNT(*) * 1.0 / (SELECT COUNT(*) FROM events))
                  * 10000.0 + 0.5 + 0.000001) / 10000.0) AS coverage,
           CAST(COUNT(DISTINCT v) AS BIGINT) AS n_distinct_values,
           (FLOOR((SUM(CASE WHEN regexp_matches(v,
                    '^[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)([eE][+-]?[0-9]+)?$')
                    AND TRY_CAST(v AS DOUBLE) IS NOT NULL
                            THEN 1 ELSE 0 END) * 1.0 / COUNT(*))
                  * 10000.0 + 0.5 + 0.000001) / 10000.0) AS numeric_frac,
           (FLOOR(MIN(CASE WHEN regexp_matches(v,
                    '^[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)([eE][+-]?[0-9]+)?$')
                    THEN TRY_CAST(v AS DOUBLE) END)
                  * 10000.0 + 0.5 + 0.000001)
            / 10000.0) AS min_numeric,
           (FLOOR(MAX(CASE WHEN regexp_matches(v,
                    '^[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)([eE][+-]?[0-9]+)?$')
                    THEN TRY_CAST(v AS DOUBLE) END)
                  * 10000.0 + 0.5 + 0.000001)
            / 10000.0) AS max_numeric
    FROM kv
    GROUP BY k
    ORDER BY prop_key
    """,
    description="A10 at scale: dynamic-payload schema telemetry — per "
    "JSON key: event coverage, distinct values, numeric-parse rate, and "
    "numeric range. The reference parses payloads as Map<String,Any> "
    "(ClickHouseWriterService.kt:78-87) and warns against inferring sink "
    "columns from data; this is the query an operator runs to DECIDE the "
    "declared column list and catch producer schema drift. One map "
    "explode + key-grain aggregation; shuffle ∝ |key space|.",
)
def props_schema_drift_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    total = ev.agg(F.count(F.lit(1)).alias("__total"))
    kv = (
        ev.where(F.try_parse_json("props").isNotNull())
        .select(
            "event_id",
            F.explode(F.from_json("props", "map<string,string>")).alias(
                "prop_key", "v"
            ),
        )
    )
    # The two engines must agree on WHICH strings count as numeric, and
    # neither cast alone pins that set (Spark's string-to-double accepts
    # Java-isms like '1.5d' that DuckDB rejects; a to_number picture
    # rejects signs/scientific notation DuckDB accepts). So BOTH sides
    # gate on the same anchored decimal/scientific regex first, and only
    # regex-passing strings — where the engines agree exactly — are cast.
    _num_rx = r"^[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)([eE][+-]?[0-9]+)?$"
    num = F.when(F.col("v").rlike(_num_rx), F.col("v").try_cast("double"))
    return (
        kv.groupBy("prop_key")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("v").alias("n_distinct_values"),
            F.sum(F.when(num.isNotNull(), 1).otherwise(0)).alias("__n_num"),
            round4(F.min(num)).alias("min_numeric"),
            round4(F.max(num)).alias("max_numeric"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "prop_key",
            "n_events",
            round4(F.col("n_events") * 1.0 / F.col("__total")).alias("coverage"),
            "n_distinct_values",
            round4(F.col("__n_num") * 1.0 / F.col("n_events")).alias(
                "numeric_frac"
            ),
            "min_numeric",
            "max_numeric",
        )
        .orderBy("prop_key")
    )


# --- Portable HyperLogLog ---------------------------------------------------
#
# Spark's approx_count_distinct and DuckDB's approx sketches are different
# implementations, so `approx_distinct` can only bound-check. This is a
# hand-rolled HLL whose every step is integer-or-IEEE arithmetic both engines
# execute identically: register = md5-window-2 mod 256, rank = 53 -
# length(bin(md5-window-1 mod 2^52)) (+ small-range linear counting), so the
# *estimate itself* value-hashes across engines.

_HLL_M = 256
_HLL_ALPHA = 0.7213 / (1 + 1.079 / _HLL_M)  # Flajolet et al. alpha_256


def hll_estimate_expr() -> tuple[list, F.Column]:
    """(register-table aggs, estimate expr) over a frame of
    (group..., reg, mj) rows — shared by the batch query and the
    streaming distinct counter (registers merge by MAX, so the same
    estimate works on any union of register tables)."""
    aggs = [
        (
            F.sum(F.pow(F.lit(2.0), -F.col("mj")))
            + (F.lit(_HLL_M) - F.count(F.lit(1))) * 1.0
        ).alias("denom"),
        (F.lit(_HLL_M) - F.count(F.lit(1))).alias("zeros"),
    ]
    raw = F.lit(_HLL_ALPHA) * F.lit(_HLL_M * _HLL_M) / F.col("denom")
    est = F.when(
        (raw <= F.lit(2.5 * _HLL_M)) & (F.col("zeros") > 0),
        F.lit(_HLL_M) * F.log(F.lit(float(_HLL_M)) / F.col("zeros")),
    ).otherwise(raw)
    return aggs, est


def hll_registers(df: DataFrame, key, group_col: str) -> DataFrame:
    """Per-group HLL register table (group, reg, mj) — mergeable by MAX."""
    return (
        df.select(
            group_col,
            HS.hll_register(key).alias("reg"),
            HS.hll_rank(key).alias("rank"),
        )
        .groupBy(group_col, "reg")
        .agg(F.max("rank").alias("mj"))
    )


@query(
    "hll_distinct_portable",
    oracle=f"""
    WITH h AS (
      SELECT event_type,
             ({HS.hash60b_sql("CAST(user_id AS VARCHAR)")}) % {_HLL_M} AS reg,
             ({HS.hash60_sql("CAST(user_id AS VARCHAR)")}) % 4503599627370496
               AS h52
      FROM events
    ),
    regs AS (
      SELECT event_type, reg,
             MAX(CASE WHEN h52 > 0 THEN 53 - length(bin(h52)) ELSE 53 END)
               AS mj
      FROM h GROUP BY event_type, reg
    ),
    per_type AS (
      SELECT event_type,
             SUM(power(2.0, -mj)) + ({_HLL_M} - COUNT(*)) * 1.0 AS denom,
             {_HLL_M} - COUNT(*) AS zeros
      FROM regs GROUP BY event_type
    ),
    exact AS (
      SELECT event_type, COUNT(DISTINCT user_id) AS n_exact FROM events
      GROUP BY event_type
    ),
    est AS (
      SELECT event_type,
             CASE
               WHEN (CAST({_HLL_ALPHA!r} AS DOUBLE) * {_HLL_M * _HLL_M} / denom)
                      <= {2.5 * _HLL_M}
                    AND zeros > 0
               THEN {_HLL_M} * ln({_HLL_M}.0 / zeros)
               ELSE CAST({_HLL_ALPHA!r} AS DOUBLE) * {_HLL_M * _HLL_M} / denom
             END AS hll_raw
      FROM per_type
    )
    SELECT e.event_type,
           CAST(n_exact AS BIGINT) AS n_exact,
           {round4_sql("hll_raw")} AS hll_estimate,
           CAST(ABS(hll_raw - n_exact) / n_exact < 0.2 AS INT) AS within_20pct
    FROM est p JOIN exact e USING (event_type)
    ORDER BY e.event_type
    """,
    description="C2/sketches: portable HyperLogLog (m=256) distinct users "
    "per event type, value-hash-identical across engines (integer rank via "
    "bin-length, IEEE power/ln, linear-counting small-range correction). "
    "One shuffle to (event_type, register) — 256 rows per group leave the "
    "map side regardless of input size; registers merge across "
    "partitions/streams by elementwise MAX. The exact countDistinct rides "
    "along as the eval reference.",
)

def hll_distinct_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    regs = hll_registers(ev, F.col("user_id").cast("string"), "event_type")
    aggs, est = hll_estimate_expr()
    per_type = regs.groupBy("event_type").agg(*aggs)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_exact")
    )
    return (
        per_type.join(exact, "event_type")
        .select(
            "event_type",
            "n_exact",
            round4(est).alias("hll_estimate"),
            (F.abs(est - F.col("n_exact")) / F.col("n_exact") < 0.2)
            .cast("int")
            .alias("within_20pct"),
        )
        # bounded final: event_type is an enum domain
        .transform(lambda d: ZL.bounded_sort(d, "event_type"))
    )


@query(
    "zorder_locality_stats",
    oracle=f"""
    WITH keyed AS (
      SELECT user_id AS ua,
             ((epoch_us(ts) // 1000000) % 65536) AS ub
      FROM events
    ),
    bounds AS (
      SELECT MIN(ua) AS mina, MAX(ua) AS maxa,
             MIN(ub) AS minb, MAX(ub) AS maxb
      FROM keyed
    ),
    scaled AS (
      SELECT ((ua - mina) * 65535) // GREATEST(1, maxa - mina) AS a,
             ((ub - minb) * 65535) // GREATEST(1, maxb - minb) AS b
      FROM keyed, bounds
    ),
    z AS (
      SELECT a, b, {ZL.zorder_key_sql('a', 'b', 16)} AS zval FROM scaled
    )
    SELECT CAST(zval // 4194304 AS BIGINT) AS zbucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(a) AS BIGINT) AS min_a, CAST(MAX(a) AS BIGINT) AS max_a,
           CAST(MIN(b) AS BIGINT) AS min_b, CAST(MAX(b) AS BIGINT) AS max_b,
           CAST((MAX(a) - MIN(a) + 1) * (MAX(b) - MIN(b) + 1) AS BIGINT)
             AS bbox_area
    FROM z GROUP BY 1 ORDER BY zbucket
    """,
    description="B7/layout: Z-order (Morton) locality stats over events "
    "keyed by (user_id, time) — per z-bucket row count and bounding box. "
    "The bounded bbox_area per bucket is the property that makes parquet "
    "min/max stats prune 2-d predicates under a z-sorted layout (a "
    "lexicographic sort key only prunes its leading column). Pure integer "
    "bit interleaving; plans/layout.write_zordered applies it at write "
    "time via repartitionByRange on the z-key.",
)
def zorder_locality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    keyed = ev.select(
        F.col("user_id").alias("ua"),
        (F.floor(epoch_ms("ts") / F.lit(1000)).cast("long") % 65536).alias("ub"),
    )
    bounds = keyed.agg(
        F.min("ua").alias("mina"),
        F.max("ua").alias("maxa"),
        F.min("ub").alias("minb"),
        F.max("ub").alias("maxb"),
    )
    scaled = keyed.crossJoin(F.broadcast(bounds)).select(
        ZL.scale_to_bits("ua", "mina", "maxa", 16).alias("a"),
        ZL.scale_to_bits("ub", "minb", "maxb", 16).alias("b"),
    )
    z = scaled.withColumn("zval", ZL.zorder_key("a", "b", 16))
    return (
        z.groupBy(
            F.floor(F.col("zval") / F.lit(4194304)).cast("long").alias("zbucket")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("a").cast("long").alias("min_a"),
            F.max("a").cast("long").alias("max_a"),
            F.min("b").cast("long").alias("min_b"),
            F.max("b").cast("long").alias("max_b"),
            (
                (F.max("a") - F.min("a") + 1) * (F.max("b") - F.min("b") + 1)
            )
            .cast("long")
            .alias("bbox_area"),
        )
        # bounded final: zbucket < 2^10 by construction of the 16-bit
        # interleave and the 2^22 divisor — fixed-width at any scale
        .transform(lambda d: ZL.bounded_sort(d, "zbucket"))
    )


@query(
    "histogram_equidepth_prices",
    oracle=f"""
    WITH b AS (
      SELECT list_transform(
               quantile_cont(o_totalprice,
                 [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]),
               x -> {round4_sql("x")}) AS bs
      FROM orders
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           MIN(p) AS min_price,
           MAX(p) AS max_price,
           {round4_sql("AVG(p)")} AS avg_price
    FROM (
      SELECT len(list_filter(b.bs, x -> o.o_totalprice > x)) AS bucket,
             o.o_totalprice AS p
      FROM orders o, b
    )
    GROUP BY bucket
    ORDER BY bucket
    """,
    description="C1/histogram, equi-DEPTH twin of histogram_order_prices: "
    "8 quantile buckets over order totals. Cut points broadcast against "
    "the scan, bucket = count of bounds below the value (a 7-element HOF "
    "filter) — never a global NTILE sort of the fact table. The cut-point "
    "aggregate here is EXACT percentile (deterministic interpolation both "
    "engines share — the oracle requirement); exact percentile buffers "
    "the column in the final reducer, so the 100 TB swap is "
    "percentile_approx (mergeable GK sketch, identical downstream "
    "bucketing) — equivalence at this SF pinned in "
    "test_relational.test_equidepth_approx_bounds_match_exact. ClickHouse "
    "quantilesExact+countIf analog.",
)
def histogram_equidepth_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    fracs = [i / 8.0 for i in range(1, 8)]
    bounds = orders.agg(
        F.transform(
            F.percentile(F.col("o_totalprice"), F.array(*[F.lit(q) for q in fracs])),
            lambda x: round4(x),
        ).alias("bs")
    )
    p = F.col("o_totalprice")
    bucket = F.size(F.filter(F.col("bs"), lambda x: p > x))
    return (
        orders.crossJoin(F.broadcast(bounds))
        .select(bucket.cast("long").alias("bucket"), p.alias("p"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.min("p").alias("min_price"),
            F.max("p").alias("max_price"),
            round4(F.avg("p")).alias("avg_price"),
        )
        .orderBy("bucket")
    )


# --- B7 bucketed layout: the persisted-shuffle story ---------------------

_BUCKETED_READY: set[tuple[str, str]] = set()
_BUCKET_N = 8


def bucketed_orders_customer(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Ensure bucketed twins of orders/customer exist; return readers.

    Both tables are hash-bucketed into the same ``_BUCKET_N`` buckets on
    their join key (o_custkey / c_custkey), written once per (session,
    sf_dir) via ``ZL.write_bucketed``. Every subsequent join or
    aggregation on the custkey reads pre-placed data: the join below runs
    as a SortMergeJoin with NO Exchange on either side (pinned in
    test_plans.test_bucketed_join_reads_colocated_data). This is the
    pay-the-shuffle-once layout for recurring fact⨝fact joins at 100 TB.
    """
    # session UUID, not id(): id() values recycle after GC, which could
    # false-hit a stopped session's entry and skip a required write
    key = (MAT.session_key(spark), sf_dir)
    if key not in _BUCKETED_READY:
        ZL.write_bucketed(
            load_table(spark, sf_dir, "orders").select(
                "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
            ),
            "graft_bucketed_orders",
            _BUCKET_N,
            ("o_custkey",),
            sort_cols=("o_custkey",),
        )
        ZL.write_bucketed(
            load_table(spark, sf_dir, "customer").select(
                "c_custkey", "c_mktsegment", "c_acctbal"
            ),
            "graft_bucketed_customer",
            _BUCKET_N,
            ("c_custkey",),
            sort_cols=("c_custkey",),
        )
        _BUCKETED_READY.add(key)
    return (
        spark.table("graft_bucketed_orders"),
        spark.table("graft_bucketed_customer"),
    )


@query(
    "bucketed_colocated_join",
    oracle=f"""
    SELECT c.c_mktsegment AS c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {round4_sql("SUM(o.o_totalprice)")} AS revenue,
           {round4_sql("AVG(c.c_acctbal)")} AS avg_acctbal
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
    description="B7/bucketed layout: orders and customer hash-bucketed on "
    "custkey at write time (8 buckets each side, one file per bucket, "
    "in-bucket sortBy), then joined with a merge hint. The bucketed scan "
    "satisfies the join's hashpartitioning requirement, so the plan has "
    "ZERO exchanges before the join — the persisted-shuffle layout that "
    "turns a recurring 100 TB fact⨝fact shuffle into a one-time write "
    "(plan pinned in test_plans). The merge hint is deliberate: at scale "
    "neither side broadcasts, and SMJ-over-buckets is the plan this "
    "layout exists to produce. Oracle = the same join/agg on the raw "
    "parquet — bucketing must never change an answer, only the plan.",
)
def bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, c = bucketed_orders_customer(spark, sf_dir)
    return (
        o.hint("merge")
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            round4(F.sum("o_totalprice")).alias("revenue"),
            round4(F.avg("c_acctbal")).alias("avg_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "hilbert_locality_stats",
    oracle=f"""
    WITH keyed AS (
      SELECT user_id AS ua,
             ((epoch_us(ts) // 1000000) % 65536) AS ub
      FROM events
    ),
    bounds AS (
      SELECT MIN(ua) AS mina, MAX(ua) AS maxa,
             MIN(ub) AS minb, MAX(ub) AS maxb
      FROM keyed
    ),
    hsrc AS (
      SELECT ((ua - mina) * 65535) // GREATEST(1, maxa - mina) AS a,
             ((ub - minb) * 65535) // GREATEST(1, maxb - minb) AS b
      FROM keyed, bounds
    ),
    {ZL.hilbert_key_sql('a', 'b', 16)}
    SELECT CAST(hd // 4194304 AS BIGINT) AS hbucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(a) AS BIGINT) AS min_a, CAST(MAX(a) AS BIGINT) AS max_a,
           CAST(MIN(b) AS BIGINT) AS min_b, CAST(MAX(b) AS BIGINT) AS max_b,
           CAST((MAX(a) - MIN(a) + 1) * (MAX(b) - MIN(b) + 1) AS BIGINT)
             AS bbox_area
    FROM h0 GROUP BY 1 ORDER BY hbucket
    """,
    description="B7/layout: Hilbert-curve locality stats — the premium "
    "twin of zorder_locality_stats over the same (user_id, time) keying. "
    "The Hilbert walk has no Z-curve seams (consecutive keys are always "
    "grid-adjacent — bijectivity and adjacency pinned in test_plans), so "
    "per-bucket bounding boxes are tighter and range scans touch fewer "
    "files; Delta/Iceberg expose exactly this OPTIMIZE choice. Computed "
    "as a JVM fold over bit levels (struct state, no Python); the oracle "
    "replays the fold as one chained CTE per level and the key values "
    "are bit-identical across engines.",
)
def hilbert_locality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    keyed = ev.select(
        F.col("user_id").alias("ua"),
        (F.floor(epoch_ms("ts") / F.lit(1000)).cast("long") % 65536).alias(
            "ub"
        ),
    )
    bounds = keyed.agg(
        F.min("ua").alias("mina"),
        F.max("ua").alias("maxa"),
        F.min("ub").alias("minb"),
        F.max("ub").alias("maxb"),
    )
    scaled = keyed.crossJoin(F.broadcast(bounds)).select(
        ZL.scale_to_bits("ua", "mina", "maxa", 16).alias("a"),
        ZL.scale_to_bits("ub", "minb", "maxb", 16).alias("b"),
    )
    h = scaled.withColumn("hval", ZL.hilbert_key("a", "b", 16))
    return (
        h.groupBy(
            F.floor(F.col("hval") / F.lit(4194304)).cast("long").alias(
                "hbucket"
            )
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("a").cast("long").alias("min_a"),
            F.max("a").cast("long").alias("max_a"),
            F.min("b").cast("long").alias("min_b"),
            F.max("b").cast("long").alias("max_b"),
            ((F.max("a") - F.min("a") + 1) * (F.max("b") - F.min("b") + 1))
            .cast("long")
            .alias("bbox_area"),
        )
        .orderBy("hbucket")
    )


@query(
    "data_quality_report",
    oracle="""
    SELECT 'lineitem' AS tbl, 'range' AS rule, 'l_quantity' AS col,
           CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
    FROM lineitem
    UNION ALL
    SELECT 'lineitem', 'not_null', 'l_orderkey',
           CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'orders', 'unique', 'o_orderkey',
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'lineitem', 'foreign_key', 'l_orderkey->o_orderkey',
           CAST(COUNT(*) AS BIGINT)
    FROM lineitem l WHERE NOT EXISTS
      (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'customer', 'accepted_values', 'c_mktsegment',
           CAST(SUM(CASE WHEN c_mktsegment NOT IN
                ('AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD','MACHINERY')
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM customer
    ORDER BY tbl, rule, col
    """,
    description="Warehouse surface: declarative data-quality report — "
    "the dbt-test / ClickHouse-CONSTRAINT shapes as one plan: range and "
    "not-null checks (conditional aggregates in one scan per table), "
    "primary-key uniqueness (count minus distinct), referential "
    "integrity (left-anti count against the broadcast parent key), and "
    "accepted-values. Each rule is a scan-shaped aggregate — no rule "
    "costs more than one pass, violations come back as data (a row per "
    "rule), and at 100 TB the report is the thing you run after every "
    "load. All clean on the TPC-H-ish testdata, so every count is an "
    "asserted zero.",
)
def data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    def rule(tbl: str, rulename: str, col: str, agg):
        return agg.select(
            F.lit(tbl).alias("tbl"),
            F.lit(rulename).alias("rule"),
            F.lit(col).alias("col"),
            F.col("n").cast("long").alias("n_violations"),
        )

    range_chk = rule(
        "lineitem",
        "range",
        "l_quantity",
        li.agg(
            F.sum(
                ((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50))
                .cast("long")
            ).alias("n")
        ),
    )
    notnull_chk = rule(
        "lineitem",
        "not_null",
        "l_orderkey",
        li.agg(F.sum(F.col("l_orderkey").isNull().cast("long")).alias("n")),
    )
    unique_chk = rule(
        "orders",
        "unique",
        "o_orderkey",
        orders.agg(
            (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("n")
        ),
    )
    fk_chk = rule(
        "lineitem",
        "foreign_key",
        "l_orderkey->o_orderkey",
        li.join(
            orders.select("o_orderkey"),
            li.l_orderkey == F.col("o_orderkey"),
            "left_anti",
        ).agg(F.count(F.lit(1)).alias("n")),
    )
    accepted = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
    accepted_chk = rule(
        "customer",
        "accepted_values",
        "c_mktsegment",
        cust.agg(
            F.sum((~F.col("c_mktsegment").isin(*accepted)).cast("long")).alias(
                "n"
            )
        ),
    )
    return (
        range_chk.unionAll(notnull_chk)
        .unionAll(unique_chk)
        .unionAll(fk_chk)
        .unionAll(accepted_chk)
        .orderBy("tbl", "rule", "col")
    )


@query(
    "rolling_7d_uniques_hll",
    oracle=f"""
    WITH h AS (
      SELECT date_trunc('day', ts) AS day,
             ({HS.hash60b_sql("CAST(user_id AS VARCHAR)")}) % {_HLL_M} AS reg,
             ({HS.hash60_sql("CAST(user_id AS VARCHAR)")}) % 4503599627370496
               AS h52
      FROM events
    ),
    regs AS (
      SELECT day, reg,
             MAX(CASE WHEN h52 > 0 THEN 53 - length(bin(h52)) ELSE 53 END)
               AS mj
      FROM h GROUP BY day, reg
    ),
    spine AS (
      SELECT unnest(generate_series((SELECT MIN(day) FROM regs),
                                    (SELECT MAX(day) FROM regs),
                                    INTERVAL 1 DAY)) AS day
    ),
    merged AS (
      SELECT s.day, r.reg, MAX(r.mj) AS mj
      FROM spine s JOIN regs r
        ON r.day <= s.day AND r.day > s.day - INTERVAL 7 DAY
      GROUP BY s.day, r.reg
    ),
    est AS (
      SELECT day,
             SUM(power(2.0, -mj)) + ({_HLL_M} - COUNT(*)) * 1.0 AS denom,
             ({_HLL_M} - COUNT(*)) AS zeros
      FROM merged GROUP BY day
    ),
    scored AS (
      SELECT day,
             CASE WHEN (CAST({_HLL_ALPHA} AS DOUBLE)
                        * {_HLL_M * _HLL_M} / denom)
                       <= {2.5 * _HLL_M} AND zeros > 0
                  THEN {_HLL_M} * ln({float(_HLL_M)} / zeros)
                  ELSE CAST({_HLL_ALPHA} AS DOUBLE)
                       * {_HLL_M * _HLL_M} / denom
             END AS raw
      FROM est
    ),
    exact AS (
      SELECT s.day, COUNT(DISTINCT e.user_id) AS n_exact
      FROM spine s JOIN events e
        ON date_trunc('day', e.ts) <= s.day
       AND date_trunc('day', e.ts) > s.day - INTERVAL 7 DAY
      GROUP BY s.day
    )
    SELECT CAST(epoch_us(sc.day) // 1000 AS BIGINT) AS day_ms,
           CAST(x.n_exact AS BIGINT) AS n_exact,
           {round4_sql("sc.raw")} AS hll_estimate,
           CAST(ABS(sc.raw - x.n_exact) / x.n_exact < 0.2 AS INT)
             AS within_20pct
    FROM scored sc JOIN exact x USING (day)
    ORDER BY day_ms
    """,
    description="C2/C12 composition: ROLLING 7-day unique users — the "
    "classic ask that exact distinct cannot serve at scale (no merge "
    "across days) and the portable HLL serves for free: per-day "
    "register tables (one shuffle, <= 256 rows per day forever), then "
    "the 7-day merge is an elementwise MAX over a <= days x 256-row "
    "frame — CONSTANT cost regardless of corpus size, the whole point "
    "of mergeable sketches. Exact rolling distinct rides along as the "
    "eval reference (cheap at test SF, the thing you could NOT afford "
    "at 100 TB). Estimate value-hashes across engines like "
    "hll_distinct_portable.",
)
def rolling_7d_uniques_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", "ts")
    )
    regs = hll_registers(ev, F.col("user_id").cast("string"), "day")
    rng = regs.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = rng.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias(
            "sday"
        )
    )
    merged = (
        spine.join(
            regs,
            (F.col("day") <= F.col("sday"))
            & (F.col("day") > F.col("sday") - F.expr("interval 7 days")),
        )
        .groupBy("sday", "reg")
        .agg(F.max("mj").alias("mj"))
    )
    aggs, est = hll_estimate_expr()
    per_day = merged.groupBy("sday").agg(*aggs)
    exact = (
        spine.join(
            ev,
            (F.col("day") <= F.col("sday"))
            & (F.col("day") > F.col("sday") - F.expr("interval 7 days")),
        )
        .groupBy("sday")
        .agg(F.countDistinct("user_id").cast("long").alias("n_exact"))
    )
    return (
        per_day.join(exact, "sday")
        .select(
            epoch_ms(F.col("sday")).alias("day_ms"),
            "n_exact",
            round4(est).alias("hll_estimate"),
            (F.abs(est - F.col("n_exact")) / F.col("n_exact") < 0.2)
            .cast("int")
            .alias("within_20pct"),
        )
        .orderBy("day_ms")
    )


@query(
    "q4_order_priority_checking",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= DATE '1997-03-01'
      AND o.o_orderdate < DATE '1997-06-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate
          AND l.l_shipdate <= o.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    description="C3/TPC-H Q4 shape: order-priority checking — orders in "
    "a quarter having at least one lineitem shipped within 90 days of "
    "order date (the testdata lacks commit/receipt dates, so the "
    "late-shipment predicate stands in; the PATTERN is Q4's: an EXISTS "
    "correlated to the outer row compiled to a left-semi join with the "
    "date predicates pushed into both scans, then a tiny priority "
    "census). Semi-join means lineitem rows never multiply the order "
    "side — the at-least-one aggregation trap Q4 exists to teach.",
)
def q4_order_priority_checking(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-03-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-06-01").cast("date"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    shipped_soon = orders.join(
        li,
        (li.l_orderkey == orders.o_orderkey)
        & (li.l_shipdate > orders.o_orderdate)
        & (
            li.l_shipdate
            <= F.date_add(orders.o_orderdate.cast("date"), 90)
        ),
        "left_semi",
    )
    return (
        shipped_soon.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q7_binational_trade_volume",
    oracle="""
    SELECT ns.n_name AS supp_nation,
           nc.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
           (FLOOR(SUM(l.l_extendedprice * (1 - l.l_discount)) * 10000.0
                  + 0.5 + 0.000001) / 10000.0) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
    WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
        OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
      AND l.l_shipdate >= DATE '1996-01-01'
      AND l.l_shipdate <= DATE '1997-12-31'
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
    description="C3/TPC-H Q7 (volume shipping): revenue between a nation "
    "pair by ship year — the DOUBLE dimension path join topology "
    "(lineitem reaches nation through orders->customer on one side and "
    "through supplier on the other, with the nation table joined "
    "twice). Every dimension broadcasts; the disjunctive nation-pair "
    "predicate applies after both paths resolve; the fact table is "
    "scanned once with the shipdate range pushed down.",
)
def q7_binational_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") <= F.lit("1997-12-31").cast("date"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    nc = nation.select(
        F.col("n_nationkey").alias("nck"), F.col("n_name").alias("cust_nation")
    )
    ns = nation.select(
        F.col("n_nationkey").alias("nsk"), F.col("n_name").alias("supp_nation")
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nc), cust.c_nationkey == F.col("nck"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(ns), supp.s_nationkey == F.col("nsk"))
        .where(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return (
        joined.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            round4(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q10_returned_item_reporting",
    oracle="""
    SELECT c.c_custkey,
           n.n_name,
           (FLOOR(SUM(l.l_extendedprice * (1 - l.l_discount)) * 10000.0
                  + 0.5 + 0.000001) / 10000.0) AS revenue,
           (FLOOR(c.c_acctbal * 10000.0 + 0.5 + 0.000001) / 10000.0)
             AS c_acctbal
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= DATE '1996-10-01'
      AND o.o_orderdate < DATE '1997-01-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, n.n_name, c.c_acctbal
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    description="C3/TPC-H Q10 (returned item reporting): the 20 "
    "customers losing the most revenue to returns in a quarter — "
    "fact⨝orders⨝customer⨝nation with the return flag and date range "
    "pushed to the scans, customer-grain aggregate, TakeOrdered top-20 "
    "heap (never a global sort). The classic churn-investigation query "
    "a reference user would have pointed at ClickHouse.",
)
def q10_returned_item_reporting(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    )
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "n_name", "c_acctbal")
        .agg(
            round4(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
        .select(
            "c_custkey",
            "n_name",
            "revenue",
            round4(F.col("c_acctbal")).alias("c_acctbal"),
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             (FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 10000.0
                    + 0.5 + 0.000001) / 10000.0) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01'
        AND l_shipdate < DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
    description="C3/TPC-H Q15 (top supplier): quarterly revenue per "
    "supplier (one partial+final aggregate over the pushed-down "
    "shipdate range), then the max-equality join — the 1-row MAX "
    "broadcasts back against the revenue view instead of sorting it, "
    "so ties all surface and nothing global-sorts. Revenue is "
    "round4-snapped BEFORE the max comparison on both engines, so the "
    "equality can't be split by summation-order ulps.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("date"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        round4(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        ).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        supp.join(revenue, supp.s_suppkey == F.col("supplier_no"))
        .crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "q6_forecast_revenue_change",
    oracle="""
    SELECT (FLOOR(SUM(l_extendedprice * l_discount) * 10000.0
                  + 0.5 + 0.000001) / 10000.0) AS revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01'
      AND l_shipdate < DATE '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    description="C1/TPC-H Q6 (forecast revenue change): the canonical "
    "single-table filtered aggregate — every predicate (date range, "
    "discount band, quantity cap) reaches the parquet scan as a pushed "
    "filter, the sum is one partial+final pass with no shuffle beyond "
    "the final 1-row gather. The query every engine demo starts with, "
    "included verbatim so a reference user's Q6 runs unchanged.",
)
def q6_forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        round4(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias(
            "revenue"
        )
    )


@query(
    "q19_discounted_revenue_disjunctive",
    oracle="""
    SELECT (FLOOR(SUM(l.l_extendedprice * (1 - l.l_discount)) * 10000.0
                  + 0.5 + 0.000001) / 10000.0) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#2'  AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#17' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 35)
       OR (p.p_type = 'ECONOMY'   AND p.p_size BETWEEN 25 AND 50
           AND l.l_quantity BETWEEN 20 AND 50)
    """,
    description="C3/TPC-H Q19 shape (discounted revenue): the "
    "OR-of-conjunctions predicate spanning BOTH join sides — the case "
    "that defeats naive pushdown because no single conjunct can move "
    "below the join alone; Catalyst still pushes the per-side residuals "
    "it can derive and evaluates the disjunction post-join on the "
    "broadcast part dimension. One fact scan, one broadcast join, a "
    "1-row aggregate.",
)
def q19_discounted_revenue_disjunctive(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    qty, size = F.col("l_quantity"), F.col("p_size")
    cond = (
        (
            (F.col("p_brand") == "Brand#2")
            & size.between(1, 15)
            & qty.between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#17")
            & size.between(10, 30)
            & qty.between(10, 35)
        )
        | (
            (F.col("p_type") == "ECONOMY")
            & size.between(25, 50)
            & qty.between(20, 50)
        )
    )
    return j.where(cond).agg(
        round4(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        ).alias("revenue"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )


# --- TPC-H completion: the ten remaining canonical patterns -------------
# The testdata has no partsupp table and lineitem carries no
# commit/receipt dates, shipmodes, or comments, so Q2/Q9/Q11/Q12/Q13/
# Q16/Q20/Q21 run as faithful PATTERN adaptations over the columns that
# exist (each docstring states the substitution); Q8 and Q17 run with
# their original join/aggregation topology intact.


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH offers AS (
      SELECT l_partkey, l_suppkey,
             (FLOOR(MIN(l_extendedprice / l_quantity) * 10000.0
                    + 0.5 + 0.000001) / 10000.0) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    best AS (
      SELECT l_partkey, MIN(unit_cost) AS best_cost
      FROM offers GROUP BY l_partkey
    )
    SELECT (FLOOR(s.s_acctbal * 10000.0 + 0.5 + 0.000001) / 10000.0)
             AS s_acctbal,
           s.s_name, n.n_name, p.p_partkey, o.unit_cost
    FROM offers o
    JOIN best b     ON o.l_partkey = b.l_partkey
                   AND o.unit_cost = b.best_cost
    JOIN part p     ON p.p_partkey = o.l_partkey
    JOIN supplier s ON s.s_suppkey = o.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE p.p_type = 'SMALL' AND p.p_size BETWEEN 1 AND 15
      AND r.r_name = 'EUROPE'
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    description="C3/TPC-H Q2 shape (minimum cost supplier): for each "
    "part in a type/size slice, the European supplier(s) quoting the "
    "minimum unit cost — the correlated-MIN-over-the-same-view pattern. "
    "No partsupp table exists, so the quote is MIN(l_extendedprice / "
    "l_quantity) observed per (part, supplier) in lineitem; the min is "
    "round4-snapped BEFORE the equality (the Q15 trick) so summation "
    "ulps can't split ties. The per-part best-cost aggregate joins back "
    "on (partkey, cost) — ties all surface; dims broadcast; top-100 "
    "heap, no global sort.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # materialize the per-(part, supplier) quote table once: it feeds both
    # sides of the min-equality self-join, and without the lineage cut
    # Catalyst re-aggregates the full lineitem scan for each side
    offers = MAT.materialize(
        li.groupBy("l_partkey", "l_suppkey").agg(
            round4(
                F.min(F.col("l_extendedprice") / F.col("l_quantity"))
            ).alias("unit_cost")
        ),
        "q2_offers",
    )
    best = offers.groupBy("l_partkey").agg(
        F.min("unit_cost").alias("best_cost")
    )
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_type") == "SMALL") & F.col("p_size").between(1, 15)
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(
        F.col("r_name") == "EUROPE"
    )
    return (
        offers.join(best, "l_partkey")
        .where(F.col("unit_cost") == F.col("best_cost"))
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(
            round4(F.col("s_acctbal")).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "unit_cost",
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


@query(
    "q8_national_market_share",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           (FLOOR((SUM(CASE WHEN ns.n_name = 'NATION_3'
                            THEN l.l_extendedprice * (1 - l.l_discount)
                            ELSE 0 END)
                   / SUM(l.l_extendedprice * (1 - l.l_discount)))
                  * 10000.0 + 0.5 + 0.000001) / 10000.0) AS mkt_share
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = nc.n_regionkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
    WHERE p.p_type = 'ECONOMY'
      AND r.r_name = 'EUROPE'
      AND o.o_orderdate >= DATE '1996-01-01'
      AND o.o_orderdate <= DATE '1997-12-31'
    GROUP BY 1 ORDER BY 1
    """,
    description="C3/TPC-H Q8 (national market share): NATION_3's share "
    "of ECONOMY-part revenue sold into EUROPE by order year — the full "
    "eight-table topology intact: fact reaches region through "
    "orders->customer->nation and reaches the share dimension through "
    "supplier->nation (nation joined twice), with the conditional-sum/"
    "total-sum ratio per year. All dims broadcast; one fact scan with "
    "the date range pushed down.",
)
def q8_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_type") == "ECONOMY"
    )
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") <= F.lit("1997-12-31").cast("date"))
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(
        F.col("r_name") == "EUROPE"
    )
    nc = nation.select(
        F.col("n_nationkey").alias("nck"), F.col("n_regionkey").alias("nrk")
    )
    ns = nation.select(
        F.col("n_nationkey").alias("nsk"), F.col("n_name").alias("supp_nation")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nc), cust.c_nationkey == F.col("nck"))
        .join(F.broadcast(region), F.col("nrk") == region.r_regionkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(ns), supp.s_nationkey == F.col("nsk"))
    )
    return (
        joined.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            round4(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(
                        0.0
                    )
                )
                / F.sum(rev)
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q9_product_type_profit",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           (FLOOR(SUM(l.l_extendedprice * (1 - l.l_discount)
                      - p.p_retailprice * 0.6 * l.l_quantity)
                  * 10000.0 + 0.5 + 0.000001) / 10000.0) AS sum_profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY 1, 2
    ORDER BY nation, o_year DESC
    """,
    description="C3/TPC-H Q9 shape (product type profit): profit on "
    "widget parts by supplier nation and order year. No partsupp table "
    "means no ps_supplycost, so unit cost stands in as 60% of "
    "p_retailprice (deterministic, carried on the broadcast part dim — "
    "the identical expression both engines evaluate); the PATTERN is "
    "intact: part-name LIKE filter, fact joined to part + supplier + "
    "nation + orders, profit expression aggregated per (nation, year).",
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like("%widget%")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * 0.6 * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(round4(F.sum(profit)).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@query(
    "q11_important_part_value",
    oracle="""
    WITH supplied AS (
      SELECT l.l_partkey,
             (FLOOR(SUM(l.l_extendedprice * (1 - l.l_discount)) * 10000.0
                    + 0.5 + 0.000001) / 10000.0) AS part_value
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_3'
      GROUP BY l.l_partkey
    ),
    tot AS (SELECT SUM(part_value) AS t FROM supplied)
    SELECT sp.l_partkey AS p_partkey, sp.part_value
    FROM supplied sp CROSS JOIN tot
    WHERE sp.part_value >
          (FLOOR(tot.t * 0.001 * 10000.0 + 0.5 + 0.000001) / 10000.0)
    ORDER BY sp.part_value DESC, p_partkey
    """,
    description="C3/TPC-H Q11 shape (important stock): the parts whose "
    "supplied value from NATION_3 exceeds a fraction of that nation's "
    "total — the group-vs-global-scalar HAVING pattern. No partsupp "
    "table, so value is the nation's lineitem revenue per part instead "
    "of ps_supplycost*ps_availqty; the topology is Q11's: per-key "
    "aggregate, 1-row total broadcast back, threshold filter, value-"
    "ordered output. BOTH compare operands round4-snap — the per-part "
    "values AND the t*0.001 threshold (t is a sum of doubles whose "
    "engine-dependent add order can differ by ulps; snapping both sides "
    "makes the strict > bit-identical, the Q15 equality trick).",
)
def q11_important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").where(
        F.col("n_name") == "NATION_3"
    )
    supplied = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("l_partkey")
        .agg(
            round4(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("part_value")
        )
    )
    tot = supplied.agg(F.sum("part_value").alias("t"))
    return (
        supplied.crossJoin(F.broadcast(tot))
        .where(F.col("part_value") > round4(F.col("t") * F.lit(0.001)))
        .select(F.col("l_partkey").alias("p_partkey"), "part_value")
        .orderBy(F.col("part_value").desc(), "p_partkey")
    )


@query(
    "q12_priority_shipping_census",
    oracle="""
    SELECT CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                THEN 'LATE-60PLUS' ELSE 'WITHIN-60' END AS ship_bucket,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= DATE '1997-01-01'
      AND l.l_shipdate < DATE '1998-01-01'
    GROUP BY 1 ORDER BY 1
    """,
    description="C3/TPC-H Q12 shape (shipping modes and order priority): "
    "the two-way conditional census — lines shipped in 1997 bucketed by "
    "shipping lateness (>60 days after the order stands in for the "
    "missing shipmode/receiptdate columns), counting urgent-priority vs "
    "other-priority lines per bucket. The pattern is Q12's exactly: one "
    "fact⨝orders join with the date range pushed down, CASE-pivot "
    "aggregation into two counters per group.",
)
def q12_priority_shipping_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
    )
    orders = load_table(spark, sf_dir, "orders")
    late = F.col("l_shipdate") > F.date_add(
        F.col("o_orderdate").cast("date"), 60
    )
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.when(late, "LATE-60PLUS")
            .otherwise("WITHIN-60")
            .alias("ship_bucket")
        )
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0))
            .cast("long")
            .alias("high_line_count"),
            F.sum(F.when(~urgent, 1).otherwise(0))
            .cast("long")
            .alias("low_line_count"),
        )
        .orderBy("ship_bucket")
    )


@query(
    "q13_customer_order_distribution",
    oracle="""
    WITH c_orders AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                        AND o.o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c.c_custkey
    )
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(COUNT(*) AS BIGINT) AS custdist
    FROM c_orders GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    description="C3/TPC-H Q13 (customer order distribution): the "
    "histogram-of-a-histogram — customers LEFT-joined to a filtered "
    "orders set (priority '4-NOT SPECIFIED' excluded, standing in for "
    "the missing o_comment NOT LIKE predicate), per-customer order "
    "count INCLUDING the zero-order customers the left join preserves, "
    "then the distribution of those counts. Two aggregates, one "
    "outer-join; COUNT(o_orderkey) counts non-null matches only.",
)
def q13_customer_order_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    c_orders = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return (
        c_orders.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("long").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q16_supplier_part_census",
    oracle="""
    SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    description="C3/TPC-H Q16 shape (parts/supplier relationship): how "
    "many distinct suppliers can deliver each (brand, type, size) slice, "
    "excluding one brand, one type, and a NOT-IN supplier blacklist "
    "(negative acctbal stands in for the missing '%Customer%Complaints%' "
    "comment scan). The supplier-part relation comes from lineitem in "
    "place of the absent partsupp; the pattern is intact: anti-join for "
    "the NOT IN, broadcast part dim with the IN-list size filter pushed "
    "down, COUNT(DISTINCT) per slice, count-ordered output.",
)
def q16_supplier_part_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45)
    )
    blacklist = load_table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0
    )
    return (
        li.join(
            F.broadcast(blacklist),
            li.l_suppkey == blacklist.s_suppkey,
            "left_anti",
        )
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.count_distinct("l_suppkey").cast("long").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    WITH pf AS (
      SELECT p_partkey FROM part
      WHERE p_brand = 'Brand#3' AND p_type = 'MEDIUM'
    ),
    thr AS (
      SELECT l.l_partkey, 0.2 * AVG(l.l_quantity) AS qty_cap
      FROM lineitem l JOIN pf ON pf.p_partkey = l.l_partkey
      GROUP BY l.l_partkey
    )
    SELECT (FLOOR((SUM(l.l_extendedprice) / 7.0) * 10000.0
                  + 0.5 + 0.000001) / 10000.0) AS avg_yearly
    FROM lineitem l
    JOIN thr t ON t.l_partkey = l.l_partkey
    WHERE l.l_quantity < t.qty_cap
    """,
    description="C3/TPC-H Q17 (small-quantity-order revenue): revenue "
    "lost if tiny orders of Brand#3 MEDIUM parts stopped shipping — the "
    "correlated per-part scalar (0.2 x that part's average quantity) "
    "rewritten as an aggregate joined back on partkey, the standard "
    "decorrelation. Quantities are small integers so both engines' "
    "averages are exact doubles and the strict < threshold is portable; "
    "the part filter prunes lineitem BEFORE the per-part aggregate via "
    "the broadcast dim.",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pf = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "MEDIUM")
    )
    pruned = li.join(
        F.broadcast(pf.select("p_partkey")),
        li.l_partkey == F.col("p_partkey"),
        "left_semi",
    )
    thr = pruned.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.2).alias("qty_cap")
    )
    return (
        pruned.withColumnRenamed("l_partkey", "k")
        .join(thr, F.col("k") == thr.l_partkey)
        .where(F.col("l_quantity") < F.col("qty_cap"))
        .agg(round4(F.sum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


@query(
    "q18_large_volume_customers",
    oracle="""
    WITH qual AS (
      SELECT l_orderkey, SUM(l_quantity) AS total_qty
      FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 300
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
           (FLOOR(o.o_totalprice * 10000.0 + 0.5 + 0.000001) / 10000.0)
             AS o_totalprice,
           (FLOOR(q.total_qty * 10000.0 + 0.5 + 0.000001) / 10000.0)
             AS total_qty
    FROM orders o
    JOIN qual q ON q.l_orderkey = o.o_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o_totalprice DESC, o_orderdate, o.o_orderkey
    LIMIT 100
    """,
    description="C3/TPC-H Q18 (large volume customers): the top-100 "
    "orders whose total quantity exceeds 300, with their customers — "
    "the order-grain HAVING aggregate joined back to orders, so the "
    "expensive fact⨝fact rejoin of textbook Q18 collapses into one "
    "lineitem aggregate reused for both the filter and the output "
    "quantity. The aggregate side sits behind its own shuffle exchange "
    "(in-plan aggregate, AQE-recoverable per CLAUDE.md), quantities "
    "are integer-valued doubles so the > 300 cut and the sums are "
    "exact, and dates export as strings. Completes the q2-q22 TPC-H "
    "sweep.",
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    qual = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 300)
    )
    return (
        orders.join(qual, orders.o_orderkey == qual.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            round4(F.col("o_totalprice")).alias("o_totalprice"),
            round4(F.col("total_qty")).alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderdate", "o_orderkey")
        .limit(100)
    )


@query(
    "q20_promotion_supplier_candidates",
    oracle="""
    WITH shipped AS (
      SELECT l.l_partkey, l.l_suppkey, SUM(l.l_quantity) AS qty
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_name LIKE 'small%'
        AND l.l_shipdate >= DATE '1997-01-01'
        AND l.l_shipdate < DATE '1998-01-01'
      GROUP BY l.l_partkey, l.l_suppkey
    ),
    tot AS (
      SELECT l_partkey, SUM(qty) AS part_qty FROM shipped GROUP BY l_partkey
    ),
    dominant AS (
      SELECT DISTINCT s.l_suppkey
      FROM shipped s JOIN tot t ON t.l_partkey = s.l_partkey
      WHERE s.qty > 0.5 * t.part_qty
    )
    SELECT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'EUROPE'
      AND s.s_suppkey IN (SELECT l_suppkey FROM dominant)
    ORDER BY s_name
    """,
    description="C3/TPC-H Q20 shape (potential part promotion): "
    "European suppliers who dominated shipment of any 'small' part in "
    "1997 (more than half that part's shipped quantity — the >50%-of-"
    "aggregate threshold standing in for the missing ps_availqty "
    "comparison). The pattern is Q20's nested-semi-join chain: inner "
    "aggregate -> threshold -> DISTINCT supplier set -> IN semi-join to "
    "the supplier dim with a nation/region filter. Quantities are small "
    "integers, so the halved-total comparison is exact on both engines.",
)
def q20_promotion_supplier_candidates(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
    )
    pf = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like("small%")
    )
    shipped = (
        li.join(
            F.broadcast(pf.select("p_partkey")),
            li.l_partkey == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    tot = shipped.groupBy("l_partkey").agg(F.sum("qty").alias("part_qty"))
    dominant = (
        shipped.join(tot, "l_partkey")
        .where(F.col("qty") > 0.5 * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(
        F.col("r_name") == "EUROPE"
    )
    return (
        supp.join(
            F.broadcast(dominant),
            supp.s_suppkey == dominant.l_suppkey,
            "left_semi",
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


@query(
    "q21_sole_late_supplier",
    oracle="""
    WITH lines AS (
      SELECT l.l_orderkey, l.l_suppkey,
             CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                  THEN 1 ELSE 0 END AS late
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
    ),
    per_order AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN late = 1 THEN l_suppkey END)
               AS n_late_supp
      FROM lines GROUP BY l_orderkey
    ),
    culprits AS (
      SELECT DISTINCT li.l_orderkey, li.l_suppkey
      FROM lines li JOIN per_order po ON po.l_orderkey = li.l_orderkey
      WHERE li.late = 1 AND po.n_supp >= 2 AND po.n_late_supp = 1
    )
    SELECT s.s_name,
           CAST(COUNT(*) AS BIGINT) AS numwait
    FROM culprits c JOIN supplier s ON s.s_suppkey = c.l_suppkey
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
    description="C3/TPC-H Q21 shape (suppliers who kept orders waiting): "
    "per supplier, the finished multi-supplier orders where THEY were "
    "the only one shipping late (>90 days after the order date stands "
    "in for the missing receipt/commit dates). The original's "
    "EXISTS(other supplier)/NOT EXISTS(other late supplier) pair is "
    "decorrelated into one per-order census (distinct suppliers, "
    "distinct late suppliers) joined back — same semantics, one window-"
    "free aggregate instead of two correlated subqueries; top-100 heap.",
)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    )
    lines = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate")
            > F.date_add(F.col("o_orderdate").cast("date"), 90)
        ).alias("late"),
    )
    per_order = lines.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("late"), F.col("l_suppkey"))
        ).alias("n_late_supp"),
    )
    culprits = (
        lines.where("late")
        .join(per_order, "l_orderkey")
        .where((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier")
    return (
        culprits.join(supp, culprits.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


# --- Mergeable histogram quantile sketch --------------------------------
#
# Completes the sketch family (Bloom membership, HLL distinct, Count-Min
# frequency): approximate quantiles from a fixed-width bin-count state.
# Spark's approx_percentile and DuckDB's approx sketches are different
# implementations, so (as with HLL) this is a hand-rolled sketch whose
# every step is arithmetic both engines execute identically — the
# ESTIMATE itself value-hashes across engines. The state is 64 counts
# per group; it merges across partitions, days, or streaming
# micro-batches by elementwise SUM (pinned in test_sketches).

_QHS_BINS = 64


def hist_bin_counts(
    df: DataFrame, value_col: str, group_col: str, bins: int = _QHS_BINS
) -> tuple[DataFrame, DataFrame]:
    """(per-group stats, mergeable bin-count state) for the quantile
    sketch. Stats = (flag, mn, mx, n); state = (flag, bin, c). The bin
    index is pure IEEE double math (floor((x-mn)/width) clamped into
    [0, bins)), so any two engines bin a row identically; counts merge
    by SUM."""
    stats = df.groupBy(F.col(group_col).alias("flag")).agg(
        F.min(value_col).alias("mn"),
        F.max(value_col).alias("mx"),
        F.count(F.lit(1)).alias("n"),
    )
    width = (F.col("mx") - F.col("mn")) / float(bins)
    raw = F.floor((F.col(value_col) - F.col("mn")) / width).cast("long")
    bin_ = F.when(F.col("mx") == F.col("mn"), F.lit(0)).otherwise(
        F.least(F.lit(bins - 1), F.greatest(F.lit(0), raw))
    )
    counts = (
        df.select(F.col(group_col).alias("flag"), value_col)
        .join(F.broadcast(stats), "flag")
        .groupBy("flag", bin_.alias("bin"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return stats, counts


def hist_quantile_estimates(
    stats: DataFrame, counts: DataFrame, qs: DataFrame, bins: int = _QHS_BINS
) -> DataFrame:
    """Linear-interpolated quantile estimates (flag, q, est_value) from a
    bin-count state: walk the cumulative histogram to the first bin whose
    running count reaches q*n, then interpolate inside it. The state is
    64 rows per group, so every window here is bounded by the bin count,
    never the data."""
    wcum = Window.partitionBy("flag").orderBy("bin")
    cum = counts.select(
        "flag",
        "bin",
        "c",
        F.sum("c").over(wcum.rowsBetween(Window.unboundedPreceding, 0)).alias("cum_c"),
        F.coalesce(
            F.sum("c").over(wcum.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("cum_before"),
    )
    hits = (
        cum.join(F.broadcast(stats), "flag")
        .crossJoin(F.broadcast(qs))
        .where(F.col("cum_c") >= F.col("q") * F.col("n"))
    )
    first_hit = Window.partitionBy("flag", "q").orderBy("bin")
    width = (F.col("mx") - F.col("mn")) / float(bins)
    est = F.col("mn") + (
        F.col("bin")
        + (F.col("q") * F.col("n") - F.col("cum_before")) / F.col("c")
    ) * width
    return (
        hits.withColumn("rn", F.row_number().over(first_hit))
        .where(F.col("rn") == 1)
        .select("flag", "q", est.alias("est_v"), "n")
    )


@query(
    "quantile_hist_sketch_eval",
    oracle=f"""
    WITH stats AS (
      SELECT l_returnflag AS flag, MIN(l_extendedprice) AS mn,
             MAX(l_extendedprice) AS mx, COUNT(*) AS n
      FROM lineitem GROUP BY 1
    ),
    binned AS (
      SELECT l.l_returnflag AS flag,
             CASE WHEN s.mx = s.mn THEN 0
                  ELSE LEAST({_QHS_BINS - 1}, GREATEST(0,
                       CAST(FLOOR((l.l_extendedprice - s.mn)
                                  / ((s.mx - s.mn) / {_QHS_BINS}.0))
                            AS BIGINT)))
             END AS bin
      FROM lineitem l JOIN stats s ON s.flag = l.l_returnflag
    ),
    counts AS (SELECT flag, bin, COUNT(*) AS c FROM binned GROUP BY 1, 2),
    cum AS (
      SELECT flag, bin, c,
             SUM(c) OVER (PARTITION BY flag ORDER BY bin) AS cum_c,
             COALESCE(SUM(c) OVER (PARTITION BY flag ORDER BY bin
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
      FROM counts
    ),
    qs AS (SELECT UNNEST(CAST([0.5, 0.9, 0.99] AS DOUBLE[])) AS q),
    hits AS (
      SELECT c.flag, q.q, c.bin, c.c, c.cum_before, s.mn, s.mx, s.n,
             ROW_NUMBER() OVER (PARTITION BY c.flag, q.q ORDER BY c.bin)
               AS rn
      FROM cum c JOIN stats s ON s.flag = c.flag CROSS JOIN qs q
      WHERE c.cum_c >= q.q * s.n
    ),
    est AS (
      SELECT flag, q,
             mn + (bin + (q * n - cum_before) / c)
                * ((mx - mn) / {_QHS_BINS}.0) AS est_v,
             n
      FROM hits WHERE rn = 1
    ),
    ranked AS (
      SELECT l_returnflag AS flag, l_extendedprice AS v,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice) AS rn
      FROM lineitem
    ),
    exv AS (
      SELECT s.flag, q.q, r.v AS exact_v
      FROM stats s CROSS JOIN qs q
      JOIN ranked r ON r.flag = s.flag
                   AND r.rn = CAST(FLOOR(q.q * (s.n - 1)) AS BIGINT) + 1
    )
    SELECT e.flag AS l_returnflag, e.q AS q,
           {round4_sql("e.est_v")} AS est_value,
           {round4_sql("x.exact_v")} AS exact_value,
           {round4_sql("ABS(e.est_v - x.exact_v)")} AS abs_err,
           CAST(e.n AS BIGINT) AS n
    FROM est e JOIN exv x ON x.flag = e.flag AND x.q = e.q
    ORDER BY l_returnflag, q
    """,
    description="C2/sketches: mergeable histogram quantile sketch — "
    "P50/P90/P99 of l_extendedprice per return flag from a 64-bin "
    "equi-width count state (the ClickHouse quantile-state / mergeable-"
    "aggregate shape). The state is 64 counts per group at ANY data "
    "size and merges by elementwise SUM across partitions, days, or "
    "streaming micro-batches (merge law executed in test_sketches); "
    "every window in the estimate walks the 64-row state, never the "
    "data. The type-1 exact percentile (value at floor(q*(n-1))) rides "
    "along as the eval reference — at 100 TB only the sketch path runs; "
    "the exact rank is the eval's cost, not the operator's.",
)
def quantile_hist_sketch_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    stats, counts = hist_bin_counts(li, "l_extendedprice", "l_returnflag")
    qs = spark.createDataFrame([(0.5,), (0.9,), (0.99,)], "q double")
    est = hist_quantile_estimates(stats, counts, qs)
    ranked = li.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("v"),
    ).withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("flag").orderBy("v")),
    )
    idx = (
        F.floor(F.col("q") * (F.col("n") - 1)).cast("long") + 1
    ).alias("idx")
    exv = (
        stats.crossJoin(F.broadcast(qs))
        .select("flag", "q", idx)
        .join(
            ranked,
            (F.col("idx") == ranked.rn)
            & (stats.flag == ranked.flag),
        )
        .select(stats.flag.alias("xflag"), F.col("q").alias("xq"), F.col("v").alias("exact_v"))
    )
    return (
        est.join(
            exv,
            (est.flag == F.col("xflag")) & (est.q == F.col("xq")),
        )
        .select(
            est.flag.alias("l_returnflag"),
            est.q.alias("q"),
            round4(F.col("est_v")).alias("est_value"),
            round4(F.col("exact_v")).alias("exact_value"),
            round4(F.abs(F.col("est_v") - F.col("exact_v"))).alias("abs_err"),
            F.col("n").cast("long").alias("n"),
        )
        # bounded final: returnflag enum x the 3 fixed quantiles = 9 rows
        .transform(lambda d: ZL.bounded_sort(d, "l_returnflag", "q"))
    )
