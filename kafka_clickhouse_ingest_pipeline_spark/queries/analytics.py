"""Composite analytical queries: multi-join TPC-H-style shapes, exact
percentiles, correlated subqueries, fuzzy string matching.

These are the "would a ClickHouse user find their workload here" queries —
each composes several operators (join chains + filters + aggregation +
top-k) the way real dashboards do, and each is oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round4
from ..plans import layout as ZL
from ..registry import query
from ..tables import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT
      l.l_orderkey,
      ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
      strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
      o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 20
    """,
    description="TPC-H Q3 shape: selective dimension filter -> fact join "
    "chain -> grouped revenue -> top-k. Customer broadcasts; lineitem "
    "never shuffles before the aggregate.",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(20)
    )


@query(
    "q5_region_revenue",
    oracle="""
    SELECT
      n.n_name AS nation,
      ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    ORDER BY revenue DESC, nation
    """,
    description="TPC-H Q5 shape: five-table snowflake join filtered to one "
    "region; all four dimensions broadcast around the lineitem scan.",
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        # bounded final: nations of one region — a fixed reference domain
        .transform(lambda d: ZL.bounded_sort(d, F.col("revenue").desc(), "nation"))
    )


@query(
    "percentiles_by_group",
    oracle="""
    SELECT
      l_returnflag,
      (FLOOR(quantile_cont(l_extendedprice, 0.5) * 10000.0 + 0.5 + 0.000001)
        / 10000.0) AS p50,
      (FLOOR(quantile_cont(l_extendedprice, 0.9) * 10000.0 + 0.5 + 0.000001)
        / 10000.0) AS p90,
      (FLOOR(quantile_cont(l_extendedprice, 0.99) * 10000.0 + 0.5 + 0.000001)
        / 10000.0) AS p99
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    description="C1/C2: exact interpolated percentiles (PERCENTILE_CONT "
    "semantics) per group — p50/p90/p99 latency-style rollups.",
)
def percentiles_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            round4(F.percentile("l_extendedprice", F.lit(0.5))).alias("p50"),
            round4(F.percentile("l_extendedprice", F.lit(0.9))).alias("p90"),
            round4(F.percentile("l_extendedprice", F.lit(0.99))).alias("p99"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "correlated_subquery_above_avg",
    oracle="""
    SELECT o.o_orderkey, ROUND(o.o_totalprice, 4) AS o_totalprice
    FROM orders o
    WHERE o.o_totalprice > 2 * (
      SELECT AVG(o2.o_totalprice) FROM orders o2
      WHERE o2.o_custkey = o.o_custkey
    )
    ORDER BY o.o_orderkey
    """,
    description="C3/Catalyst: correlated scalar subquery (orders more than "
    "2x their customer's average) — decorrelated by Catalyst into an "
    "aggregate + join, no per-row re-execution.",
)
def correlated_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders_corr")
    return spark.sql(
        """
        SELECT o.o_orderkey, ROUND(o.o_totalprice, 4) AS o_totalprice
        FROM orders_corr o
        WHERE o.o_totalprice > 2 * (
          SELECT AVG(o2.o_totalprice) FROM orders_corr o2
          WHERE o2.o_custkey = o.o_custkey
        )
        ORDER BY o.o_orderkey
        """
    )


@query(
    "fuzzy_name_match",
    oracle="""
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           levenshtein(a.p_name, b.p_name) AS edit_distance
    FROM part a
    JOIN part b ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 5
    ORDER BY key_a, key_b
    """,
    description="C8/C9: fuzzy string matching — brand-blocked self-join "
    "with Levenshtein radius 5 (blocking keeps the pair space linear per "
    "block, the classic entity-resolution shape).",
)
def fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_name")
    a = part.select(
        F.col("p_partkey").alias("key_a"),
        F.col("p_brand").alias("brand_a"),
        F.col("p_name").alias("name_a"),
    )
    b = part.select(
        F.col("p_partkey").alias("key_b"),
        F.col("p_brand").alias("brand_b"),
        F.col("p_name").alias("name_b"),
    )
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return (
        a.join(
            b,
            (F.col("brand_a") == F.col("brand_b"))
            & (F.col("key_a") < F.col("key_b")),
        )
        .where(dist <= 5)
        .select("key_a", "key_b", dist.alias("edit_distance"))
        .orderBy("key_a", "key_b")
    )


@query(
    "salted_skew_aggregate",
    oracle="""
    SELECT term, COUNT(*) AS cnt
    FROM (
      SELECT unnest(string_split_regex(trim(text), '\\s+')) AS term
      FROM documents
    )
    WHERE length(term) > 0
    GROUP BY term
    """,
    description="Skew mitigation: salted two-stage aggregation over the "
    "(heavily skewed) token stream — oracle is the PLAIN aggregation, "
    "proving the salt+recombine path is exact.",
)
def salted_skew_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_sum_count

    docs = _t(spark, sf_dir, "documents")
    # posexplode keeps (doc_id, pos) as the stable per-row identity the
    # deterministic salt hashes — a hot term occurs at many distinct
    # (doc, pos) slots, so it still spreads across all salt cells.
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias(
            "pos", "term"
        ),
    ).where(F.length("term") > 0)
    return salted_sum_count(
        toks, ["term"], salt_on=["doc_id", "pos"]
    ).select("term", "cnt")


@query(
    "stats_aggregates_by_flag",
    oracle="""
    SELECT
      l_returnflag,
      (FLOOR(corr(l_quantity, l_extendedprice) * 10000.0 + 0.5 + 0.000001)
        / 10000.0) AS qty_price_corr,
      (FLOOR(stddev_samp(l_discount) * 10000.0 + 0.5 + 0.000001)
        / 10000.0) AS discount_stddev,
      (FLOOR(var_samp(l_discount) * 10000.0 + 0.5 + 0.000001)
        / 10000.0) AS discount_var,
      (FLOOR((stddev_samp(l_extendedprice) / AVG(l_extendedprice))
             * 10000.0 + 0.5 + 0.000001) / 10000.0) AS price_cv
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    description="C1: statistical aggregates — correlation, sample stddev/"
    "variance, coefficient of variation per group. All outputs are O(1)-"
    "scaled (corr, cv, small-valued discount moments) so the portable 4dp "
    "rounding absorbs partial-agg merge-order noise; raw variances of "
    "large-valued columns would sit above the epsilon and are deliberately "
    "exported as ratios instead.",
)
def stats_aggregates_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            round4(F.corr("l_quantity", "l_extendedprice")).alias(
                "qty_price_corr"
            ),
            round4(F.stddev_samp("l_discount")).alias("discount_stddev"),
            round4(F.var_samp("l_discount")).alias("discount_var"),
            round4(
                F.stddev_samp("l_extendedprice") / F.avg("l_extendedprice")
            ).alias("price_cv"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "regression_by_flag",
    oracle="""
    SELECT
      l_returnflag,
      (FLOOR(regr_slope(l_extendedprice, l_quantity) * 10000.0 + 0.5
             + 0.000001) / 10000.0) AS price_per_qty_slope,
      (FLOOR(regr_intercept(l_extendedprice, l_quantity) * 10000.0 + 0.5
             + 0.000001) / 10000.0) AS price_intercept,
      (FLOOR(regr_r2(l_extendedprice, l_quantity) * 10000.0 + 0.5
             + 0.000001) / 10000.0) AS price_r2
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    description="C1: linear-regression aggregates (slope/intercept/R2 of "
    "price on quantity per flag) — single-pass moment accumulation, "
    "partial+final like any hash aggregate.",
)
def regression_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return (
        li.groupBy("l_returnflag")
        .agg(
            round4(F.regr_slope(y, x)).alias("price_per_qty_slope"),
            round4(F.regr_intercept(y, x)).alias("price_intercept"),
            round4(F.regr_r2(y, x)).alias("price_r2"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_boolean_suite",
    oracle="""
    SELECT
      o_orderpriority,
      CAST(bool_and(o_totalprice > 1000) AS INTEGER) AS all_over_1k,
      CAST(bool_or(o_totalprice > 400000) AS INTEGER) AS any_over_400k,
      CAST(count_if(o_orderstatus = 'F') AS BIGINT) AS n_finished,
      CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT)
        AS n_open
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    description="C1: boolean aggregates — every/any/count_if predicates "
    "per group (data-quality assertion queries).",
)
def agg_boolean_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.every(F.col("o_totalprice") > 1000)
            .cast("int")
            .alias("all_over_1k"),
            F.some(F.col("o_totalprice") > 400000)
            .cast("int")
            .alias("any_over_400k"),
            F.count_if(F.col("o_orderstatus") == "F").alias("n_finished"),
            F.sum(
                F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)
            ).cast("long").alias("n_open"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "string_agg_nations",
    oracle="""
    SELECT r.r_name AS region,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations,
           COUNT(*) AS n_nations
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY region
    """,
    description="C1/C7: ordered string aggregation (ClickHouse "
    "groupArray->arrayStringConcat / SQL LISTAGG analog) — sort inside "
    "the collected array makes the result deterministic under any "
    "partial-agg merge order.",
)
def string_agg_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
                "nations"
            ),
            F.count(F.lit(1)).alias("n_nations"),
        )
        .orderBy("region")
    )


@query(
    "agg_bitwise_suite",
    oracle="""
    SELECT
      l_returnflag,
      bit_and(CAST(l_linenumber AS BIGINT)) AS line_bit_and,
      bit_or(CAST(l_linenumber AS BIGINT)) AS line_bit_or,
      bit_xor(CAST(l_quantity AS BIGINT)) AS qty_bit_xor
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    description="C1: bitwise aggregates (ClickHouse groupBitAnd/Or/Xor "
    "analogs) — commutative+associative, so partial+final hash "
    "aggregation is exact under any merge order.",
)
def agg_bitwise_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.bit_and(F.col("l_linenumber").cast("long")).alias("line_bit_and"),
            F.bit_or(F.col("l_linenumber").cast("long")).alias("line_bit_or"),
            F.bit_xor(F.col("l_quantity").cast("long")).alias("qty_bit_xor"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_entropy_user_behavior",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, COUNT(*) AS cnt
      FROM events
      GROUP BY user_id, event_type
    )
    SELECT user_id,
           CAST(SUM(cnt) AS BIGINT) AS n_events,
           COUNT(*) AS n_types,
           (FLOOR((log2(SUM(cnt)) - SUM(cnt * log2(cnt)) / SUM(cnt))
                  * 10000.0 + 0.5 + 0.000001) / 10000.0) AS type_entropy
    FROM c
    GROUP BY user_id
    ORDER BY user_id
    """,
    description="C1: Shannon entropy of each user's event-type "
    "distribution (ClickHouse entropy() analog). Identity "
    "H = log2(T) - sum(c*log2 c)/T turns it into two chained hash "
    "aggregations — no collect, no UDF; both engines evaluate the same "
    "closed form so 4dp rounding holds.",
)
def agg_entropy_user_behavior(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # One exchange fused out (r13, guide §2.1): the per-user rollup and the
    # final total order both key on user_id, so range-partitioning the
    # (user, type, cnt) rows once serves the second aggregate's clustering
    # AND the output order — Exchange 3 -> 2, collect()-equal (probed
    # 0.500/0.318 -> 0.386/0.253). The first exchange stays on
    # (user, type): it moves map-side partial counts, not raw events.
    return (
        counts.repartitionByRange("user_id")
        .groupBy("user_id")
        .agg(
            F.sum("cnt").alias("n_events"),
            F.count(F.lit(1)).alias("n_types"),
            round4(
                F.log2(F.sum("cnt"))
                - F.sum(F.col("cnt") * F.log2("cnt")) / F.sum("cnt")
            ).alias("type_entropy"),
        )
        .sortWithinPartitions("user_id")
    )


@query(
    "agg_moments_by_flag",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             AVG(l_discount) AS m1,
             AVG(l_discount * l_discount) AS p2,
             AVG(l_discount * l_discount * l_discount) AS p3,
             AVG(l_discount * l_discount * l_discount * l_discount) AS p4
      FROM lineitem
      GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           (FLOOR(((p3 - 3 * m1 * p2 + 2 * m1 * m1 * m1)
                   / POW(p2 - m1 * m1, 1.5))
                  * 10000.0 + 0.5 + 0.000001) / 10000.0) AS discount_skew,
           (FLOOR(((p4 - 4 * m1 * p3 + 6 * m1 * m1 * p2 - 3 * m1 * m1 * m1 * m1)
                   / POW(p2 - m1 * m1, 2.0) - 3.0)
                  * 10000.0 + 0.5 + 0.000001) / 10000.0) AS discount_kurt
    FROM m
    ORDER BY l_returnflag
    """,
    description="C1: higher-moment aggregates — population skewness and "
    "excess kurtosis of l_discount per flag (ClickHouse skewPop/kurtPop "
    "analogs). Spark side is the native single-pass skewness()/kurtosis(); "
    "oracle reconstructs the same population moments from raw power sums "
    "(safe here: l_discount is O(0.1) so the power-sum cancellation stays "
    "~12 digits above double noise, and 4dp rounding absorbs the rest).",
)
def agg_moments_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            round4(F.skewness("l_discount")).alias("discount_skew"),
            round4(F.kurtosis("l_discount")).alias("discount_kurt"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_weighted_median",
    oracle="""
    SELECT l_returnflag,
           (FLOOR(quantile_cont(l_extendedprice, 0.5)
                  * 10000.0 + 0.5 + 0.000001) / 10000.0) AS wmedian_price,
           CAST(COUNT(*) AS BIGINT) AS total_weight
    FROM (
      SELECT l_returnflag, l_extendedprice,
             unnest(generate_series(1, CAST(l_quantity AS BIGINT))) AS rep
      FROM lineitem
    )
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    description="C1: quantity-weighted median price per flag (ClickHouse "
    "quantileExactWeighted analog) via Spark's native "
    "percentile(x, 0.5, frequency) — single-pass, no row expansion. The "
    "oracle proves the frequency semantics by literally expanding each "
    "row quantity times (range cross join) and taking the plain "
    "interpolated median; both definitions are (N-1)*p over the expanded "
    "multiset, so they agree exactly.",
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            round4(
                F.expr(
                    "percentile(l_extendedprice, 0.5,"
                    " CAST(l_quantity AS BIGINT))"
                )
            ).alias("wmedian_price"),
            F.sum(F.col("l_quantity").cast("long")).alias("total_weight"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q22_dormant_rich_customers",
    oracle="""
    WITH cutoff AS (
      SELECT AVG(c_acctbal) AS avg_bal FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_mktsegment,
           COUNT(*) AS n_customers,
           ROUND(SUM(c.c_acctbal), 4) AS total_bal
    FROM customer c, cutoff
    WHERE c.c_acctbal > cutoff.avg_bal
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
      )
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
    description="C3: TPC-H Q22 shape — customers with above-average "
    "(positive) balance who never placed an order above 300k: scalar "
    "aggregate subquery as the threshold + NOT EXISTS as a left-anti "
    "join on the filtered order keys. The anti join probes a hash of "
    "distinct big-order custkeys; the scalar subquery is one tiny "
    "broadcast value.",
)
def q22_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    avg_bal = (
        c.where(F.col("c_acctbal") > 0.0)
        .agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    rich = c.crossJoin(F.broadcast(avg_bal)).where(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    dormant = rich.join(
        o.where(F.col("o_totalprice") > 300000).select("o_custkey"),
        rich.c_custkey == F.col("o_custkey"),
        "left_anti",
    )
    return (
        dormant.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 4).alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q14_promo_revenue_share",
    oracle="""
    SELECT
      (FLOOR((100.0 * SUM(CASE WHEN contains(p.p_name, 'data')
                               THEN l.l_extendedprice * (1 - l.l_discount)
                               ELSE 0.0 END)
              / SUM(l.l_extendedprice * (1 - l.l_discount)))
             * 10000.0 + 0.5 + 0.000001) / 10000.0) AS promo_share_pct,
      COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1996-04-01'
    """,
    description="C1/C3: TPC-H Q14 shape — revenue share of a part "
    "category ('data'-named parts standing in for PROMO) within a ship-"
    "date window: fact-side date filter pushed to the scan, part "
    "dimension broadcast, conditional-sum ratio in one aggregation.",
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.contains(F.col("p_name"), F.lit("data")), rev).otherwise(
        0.0
    )
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .join(F.broadcast(p.select("p_partkey", "p_name")),
              F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            round4(100.0 * F.sum(promo) / F.sum(rev)).alias(
                "promo_share_pct"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
