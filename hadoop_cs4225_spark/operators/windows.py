"""Window functions + multi-dimensional aggregation (SURVEY.md §2.2 M3).

Not present in the reference (no window concept exists in its MapReduce
jobs), but part of the engine's required relational surface. Window
evaluation shuffles once on the partition key and sorts within
partitions; at 100 TB the partition key (customer, user) distributes
the sort, and AQE handles hot partitions. Rollup/cube expand grouping
sets in a single shuffle (Expand operator), not one pass per set.

Determinism: every window ORDER BY ends in a unique key, so ranks and
running sums are total-ordered; rollup NULL group markers are coalesced
to the literal 'ALL' on both engines (a NULL group label would be
ambiguous against genuine NULLs under the driver's value-hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_cs4225_spark.functions.numeric import quant, quant_sql, ravg_sql, rsum
from hadoop_cs4225_spark.registry import register
from hadoop_cs4225_spark.sources.tables import load_table


@register(
    "top_orders_per_customer",
    oracle="""
SELECT c_custkey, o_orderkey, ROUND(o_totalprice, 2) AS totalprice, rn
FROM (
  SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) t
WHERE rn <= 3
ORDER BY c_custkey, rn
""",
)
def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via row_number — the distributed form of the
    reference's global top-k (O10) generalized to per-key."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 3)
        .select(
            "c_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            "rn",
        )
        .orderBy("c_custkey", "rn")
    )


@register(
    "customer_running_spend",
    oracle="""
SELECT o_custkey, o_orderkey,
       ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS UNBOUNDED PRECEDING), 2) AS running_spend
FROM orders
WHERE o_custkey <= 200
ORDER BY o_custkey, o_orderkey
""",
)
def customer_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative aggregate over an explicit ROWS frame.

    Prefix sums are evaluated in frame order by both engines — same
    addition order ⇒ bit-identical doubles ⇒ stable under round(2).
    """
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") <= 200)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "order_neighbors",
    oracle="""
SELECT o_custkey, o_orderkey,
       ROUND(LAG(o_totalprice)  OVER w, 2) AS prev_price,
       ROUND(LEAD(o_totalprice) OVER w, 2) AS next_price,
       RANK()       OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS status_rank,
       DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS status_dense
FROM orders
WHERE o_custkey <= 100
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, o_orderkey
""",
)
def order_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead + rank/dense_rank coverage (rank key intentionally ties)."""
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") <= 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wr = Window.partitionBy("o_custkey").orderBy("o_orderstatus")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
            F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
            F.rank().over(wr).alias("status_rank"),
            F.dense_rank().over(wr).alias("status_dense"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "region_nation_rollup",
    oracle=f"""
SELECT COALESCE(r_name, 'ALL') AS region,
       COALESCE(n_name, 'ALL') AS nation,
       COUNT(*) AS n_cust,
       {ravg_sql("c_acctbal")} AS avg_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY region, nation
""",
)
def region_nation_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy region→nation→grand total, one shuffle (Expand)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            quant(rsum("c_acctbal") / F.count(F.lit(1)), 6).alias("avg_bal"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "n_cust",
            "avg_bal",
        )
        .orderBy("region", "nation")
    )


@register(
    "status_priority_cube",
    oracle="""
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY status, priority
""",
)
def status_priority_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two low-cardinality dimensions."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            rsum("o_totalprice").alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total",
        )
        .orderBy("status", "priority")
    )


@register(
    "returnflag_qty_pivot",
    oracle="""
SELECT l_linestatus,
       ROUND(SUM(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 2) AS qty_a,
       ROUND(SUM(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 2) AS qty_n,
       ROUND(SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2) AS qty_r
FROM lineitem
GROUP BY l_linestatus
ORDER BY l_linestatus
""",
)
def returnflag_qty_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT with an explicit value list (no extra distinct-scan pass;
    ANSI form in the oracle is conditional aggregation)."""
    li = load_table(spark, sf_dir, "lineitem")
    pivoted = (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return (
        pivoted.select(
            "l_linestatus",
            F.col("A").alias("qty_a"),
            F.col("N").alias("qty_n"),
            F.col("R").alias("qty_r"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "nation_customer_lists",
    oracle="""
SELECT c_nationkey AS nk,
       array_to_string(list_sort(list(c_custkey)), ',')             AS custkeys,
       array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments
FROM customer
WHERE c_custkey <= 60
GROUP BY c_nationkey
ORDER BY nk
""",
)
def nation_customer_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list / collect_set made deterministic via sort_array.

    Raw collect_list order is partition-dependent (never expose it);
    sorting inside the row restores determinism. Emitted as CSV strings:
    integer/string formatting is engine-identical, whereas array-typed
    result columns depend on the comparator's list representation.
    """
    cust = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") <= 60)
    return (
        cust.groupBy(F.col("c_nationkey").alias("nk"))
        .agg(
            F.array_join(F.sort_array(F.collect_list("c_custkey")), ",").alias(
                "custkeys"
            ),
            F.array_join(F.sort_array(F.collect_set("c_mktsegment")), ",").alias(
                "segments"
            ),
        )
        .orderBy("nk")
    )


@register(
    "customer_30day_window_spend",
    oracle="""
SELECT o_custkey, o_orderkey,
       ROUND(SUM(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate
           RANGE BETWEEN INTERVAL '30 days' PRECEDING AND CURRENT ROW), 2)
         AS spend_30d
FROM orders
WHERE o_custkey <= 100
ORDER BY o_custkey, o_orderkey
""",
)
def customer_30day_window_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event time: trailing-30-day spend per customer.

    A range frame sums every order whose date falls in (current−30d,
    current] — peers with equal order dates share the same value, so the
    result is deterministic without a unique tiebreaker.
    """
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-30 * 86400, Window.currentRow)
    )
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") <= 100)
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w), 2).alias("spend_30d"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "order_quartiles",
    oracle="""
SELECT o_custkey, o_orderkey,
       NTILE(4) OVER (PARTITION BY o_custkey
                      ORDER BY o_totalprice, o_orderkey) AS price_quartile,
       ROUND(FIRST_VALUE(o_totalprice) OVER (PARTITION BY o_custkey
                      ORDER BY o_totalprice, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
         AS cheapest,
       ROUND(LAST_VALUE(o_totalprice) OVER (PARTITION BY o_custkey
                      ORDER BY o_totalprice, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
         AS priciest
FROM orders
WHERE o_custkey <= 100
ORDER BY o_custkey, o_orderkey
""",
)
def order_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile + first_value/last_value over a full-partition frame."""
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") <= 100)
    wo = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    wf = wo.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.ntile(4).over(wo).alias("price_quartile"),
            F.round(F.first("o_totalprice").over(wf), 2).alias("cheapest"),
            F.round(F.last("o_totalprice").over(wf), 2).alias("priciest"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "order_window_rank_suite",
    oracle=f"""
SELECT o_custkey, o_orderkey,
       {quant_sql("percent_rank() OVER w", 6)} AS pct_rank,
       {quant_sql("cume_dist() OVER w", 6)} AS cume,
       ROUND(nth_value(o_totalprice, 2) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
         AS second_price
FROM orders
WHERE o_custkey <= 100
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, o_orderkey
""",
)
def order_window_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rank-statistics window trio the other window queries don't
    cover: percent_rank (relative position in [0,1]), cume_dist
    (fraction of peers at-or-before), and nth_value over an explicit
    unbounded frame (the default RUNNING frame makes nth_value
    nondeterministic per row — the classic window-frame trap, stated
    explicitly in both engines).

    The (o_orderdate, o_orderkey) ordering is a TOTAL order inside each
    partition, so rank fractions are engine-independent exact rationals
    (quantized only as belt-and-braces). One shuffle keyed on customer;
    frames never exceed a customer's order count.
    """
    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") <= 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            quant(F.percent_rank().over(w), 6).alias("pct_rank"),
            quant(F.cume_dist().over(w), 6).alias("cume"),
            F.round(F.nth_value("o_totalprice", 2).over(wf), 2).alias(
                "second_price"
            ),
        )
        .orderBy("o_custkey", "o_orderkey")
    )
