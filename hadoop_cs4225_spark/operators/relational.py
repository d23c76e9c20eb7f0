"""Relational core over the star schema (SURVEY.md §2.2, milestone M2).

The reference's relational repertoire is scan/tokenize/filter/agg/top-k
(WordCount.java, TopkCommonWords.java); this module provides the full
relational algebra a user of a query engine expects — projections,
filters, every join type, aggregation, having, set ops, sort/limit —
expressed declaratively so Catalyst supplies pushdown, column pruning,
join selection, partial aggregation and AQE for free (SURVEY.md §4).

Scale posture per query family:
- Genuinely bounded dims (region: 5 rows, nation: 25 rows) carry an
  explicit broadcast hint. Scale-proportional relations (customer,
  supplier, part, per-key aggregates) carry NO hint: a forced hint
  bypasses autoBroadcastJoinThreshold and OOMs executors once the
  relation outgrows memory at large SF. AQE broadcasts them at runtime
  while they are small and degrades gracefully to shuffle joins at
  100 TB — the plan adapts to scale instead of asserting it.
- Fact-fact joins (orders⋈lineitem) shuffle on the join key; both sides
  are key-partitioned by Catalyst, and AQE handles skewed order keys.
- Top-k is TakeOrderedAndProject (per-partition heap + k-row merge).
- Floating aggregates are rounded identically in Spark and oracle SQL —
  cross-engine reassociation makes raw double sums ulp-unstable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_cs4225_spark.functions.numeric import (
    quant,
    quant_sql,
    ravg,
    ravg_sql,
    rstddev,
    rstddev_sql,
)
from hadoop_cs4225_spark.registry import register
from hadoop_cs4225_spark.sources.tables import load_table


def _d(col: Column) -> Column:
    """Render a timestamp as yyyy-MM-dd (oracle: strftime '%Y-%m-%d')."""
    return F.date_format(col, "yyyy-MM-dd")


# ---------------------------------------------------------------------------
# TPC-H-style aggregation / join / top-k queries
# ---------------------------------------------------------------------------

@register(
    "q1_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2)                                    AS sum_qty,
       ROUND(SUM(l_extendedprice), 2)                               AS sum_base_price,
       ROUND(SUM({quant_sql("l_extendedprice * (1 - l_discount)", 2)}), 2)
                                                                    AS sum_disc_price,
       ROUND(SUM({quant_sql("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 2)}), 2)
                                                                    AS sum_charge,
       {ravg_sql("l_quantity")}                                     AS avg_qty,
       {ravg_sql("l_extendedprice")}                                AS avg_price,
       {ravg_sql("l_discount")}                                     AS avg_disc,
       COUNT(*)                                                     AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-like pricing summary: scan-filter-agg, fully pushed down.

    .explain: single scan with PushedFilters on l_shipdate + partial/final
    HashAggregate — zero joins, one shuffle on the (flag,status) keys.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            # Addends quantized per-row to cents BEFORE summing: the
            # full-table charge sum (~4.5e9 at sf0.1) has 6-decimal
            # addends whose exact sum exceeds double's 2^53 quanta, so
            # no post-sum rounding can be cross-engine stable. Cent
            # addends keep the sum exactly representable at any SF.
            F.round(F.sum(quant(disc_price, 2)), 2).alias("sum_disc_price"),
            F.round(F.sum(quant(disc_price * (1 + F.col("l_tax")), 2)), 2).alias(
                "sum_charge"
            ),
            ravg("l_quantity").alias("avg_qty"),
            ravg("l_extendedprice").alias("avg_price"),
            ravg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q3_shipping_priority",
    oracle="""
SELECT l_orderkey,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-30 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-06-30 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-like: dim join + fact-fact join + agg + top-k.

    customer carries no broadcast hint — it grows with SF; AQE
    broadcasts it at runtime while small and shuffle-joins at 100 TB.
    orders⋈lineitem shuffles on the order key. Total order
    (revenue desc, l_orderkey asc) ⇒ deterministic limit.
    """
    cutoff = F.lit("1998-06-30 00:00:00").cast("timestamp_ntz")
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", _d(F.col("o_orderdate")).alias("orderdate"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
SELECT n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM customer JOIN orders   ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
              JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              JOIN nation   ON s_nationkey = n_nationkey
              JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-like: 6-table join chain, bounded dims broadcast.

    nation/region carry broadcast hints (25/5 rows, size-invariant);
    customer/supplier do not — AQE broadcasts them at runtime while
    they fit, and falls back to shuffle joins at SFs where a forced
    hint would OOM. orders⋈lineitem always shuffles on the order key.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


@register(
    "q6_revenue_forecast",
    oracle="""
SELECT ROUND(SUM(l_extendedprice * l_discount), 4) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 25
""",
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-like: pure filter+global agg — the pushdown showcase.

    All four predicates reach the parquet scan (PushedFilters); no
    shuffle at all (partial aggs merge to a single row).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 25)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-like: EXISTS → left-semi join with an extra predicate."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q18_large_volume_orders",
    oracle="""
SELECT c_name, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
       ROUND(o.o_totalprice, 2) AS totalprice,
       ROUND(SUM(l_quantity), 2) AS sum_qty
FROM customer
JOIN orders o ON c_custkey = o.o_custkey
JOIN lineitem ON o.o_orderkey = l_orderkey
GROUP BY c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
HAVING SUM(l_quantity) > 250
ORDER BY totalprice DESC, o_orderkey
LIMIT 100
""",
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-like: join + group-by + HAVING + top-k."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .where(F.col("sum_qty") > 250)
        .select(
            "c_name",
            "o_orderkey",
            _d(F.col("o_orderdate")).alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            "sum_qty",
        )
        .orderBy(F.desc("totalprice"), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Join-type coverage
# ---------------------------------------------------------------------------

@register(
    "customer_order_counts",
    oracle="""
SELECT c_custkey,
       COUNT(o_orderkey) AS order_cnt,
       ROUND(COALESCE(SUM(o_totalprice), 0), 2) AS spent
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
ORDER BY c_custkey
""",
)
def customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving customers with zero orders."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("order_cnt"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("spent"),
        )
        .orderBy("c_custkey")
    )


@register(
    "customers_without_orders",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 250000)
ORDER BY c_custkey
""",
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (the reference's stopword filter shape, O4).

    Anti-joins against 250k+ orders so the result is non-empty at every
    SF (at sf0.01 every customer has *some* order).
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 250000)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "big_spender_customers",
    oracle="""
SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS acctbal
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
ORDER BY c_custkey
""",
)
def big_spender_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join: customers with at least one 400k+ order."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name", F.round("c_acctbal", 2).alias("acctbal"))
        .orderBy("c_custkey")
    )


@register(
    "region_status_grid",
    oracle="""
SELECT r_name, o_orderstatus
FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
ORDER BY r_name, o_orderstatus
""",
)
def region_status_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS join of two tiny inputs (grid expansion)."""
    region = load_table(spark, sf_dir, "region")
    status = load_table(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return (
        region.select("r_name")
        .crossJoin(status)
        .orderBy("r_name", "o_orderstatus")
    )


@register(
    "supplier_nation_full_join",
    oracle="""
SELECT n_name,
       COALESCE(cnt, 0) AS supplier_cnt
FROM nation
FULL JOIN (SELECT s_nationkey, COUNT(*) AS cnt FROM supplier GROUP BY s_nationkey) s
  ON n_nationkey = s_nationkey
ORDER BY n_name
""",
)
def supplier_nation_full_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join: every nation with its supplier count (or 0)."""
    nation = load_table(spark, sf_dir, "nation")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        nation.join(supp, nation.n_nationkey == supp.s_nationkey, "full")
        .select("n_name", F.coalesce("cnt", F.lit(0)).alias("supplier_cnt"))
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# Set operations + aggregation coverage
# ---------------------------------------------------------------------------

@register(
    "nation_presence_setops",
    oracle="""
WITH cust_n AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
     supp_n AS (SELECT DISTINCT s_nationkey AS nk FROM supplier)
SELECT 'both' AS side, nk FROM (SELECT nk FROM cust_n INTERSECT SELECT nk FROM supp_n)
UNION ALL
SELECT 'cust_only' AS side, nk FROM (SELECT nk FROM cust_n EXCEPT SELECT nk FROM supp_n)
UNION ALL
SELECT 'supp_only' AS side, nk FROM (SELECT nk FROM supp_n EXCEPT SELECT nk FROM cust_n)
ORDER BY side, nk
""",
)
def nation_presence_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL in one labeled result."""
    cust_n = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_nationkey").cast("int").alias("nk"))
        .distinct()
    )
    supp_n = (
        load_table(spark, sf_dir, "supplier")
        .select(F.col("s_nationkey").cast("int").alias("nk"))
        .distinct()
    )
    both = cust_n.intersect(supp_n).withColumn("side", F.lit("both"))
    cust_only = cust_n.exceptAll(supp_n).withColumn("side", F.lit("cust_only"))
    supp_only = supp_n.exceptAll(cust_n).withColumn("side", F.lit("supp_only"))
    return (
        both.unionByName(cust_only)
        .unionByName(supp_only)
        .select("side", "nk")
        .orderBy("side", "nk")
    )


@register(
    "segment_account_stats",
    oracle=f"""
SELECT c_mktsegment,
       COUNT(*) AS n_cust,
       COUNT(DISTINCT c_nationkey) AS n_nations,
       {ravg_sql("c_acctbal")} AS avg_bal,
       ROUND(MIN(c_acctbal), 2) AS min_bal,
       ROUND(MAX(c_acctbal), 2) AS max_bal,
       {rstddev_sql("c_acctbal")} AS sd_bal
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def segment_account_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation coverage: count / countDistinct / avg / min / max / stddev."""
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.countDistinct("c_nationkey").alias("n_nations"),
            ravg("c_acctbal").alias("avg_bal"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
            rstddev("c_acctbal").alias("sd_bal"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "brand_revenue",
    oracle="""
SELECT p_brand,
       COUNT(DISTINCT p.p_partkey) AS n_parts,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       ROUND(SUM(l_quantity), 2) AS total_qty
FROM lineitem JOIN part p ON l_partkey = p.p_partkey
GROUP BY p_brand
ORDER BY p_brand
""",
)
def brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈dim with broadcast + multi-agg per brand."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.countDistinct("p_partkey").alias("n_parts"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
        .orderBy("p_brand")
    )


@register(
    "decimal_exact_revenue",
    oracle="""
SELECT l_returnflag,
       CAST(CAST(SUM(CAST(floor(l_extendedprice * 100.0 + 0.5) / 100.0
                     AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR)
         AS revenue_exact,
       CAST(CAST(SUM(CAST(floor(l_quantity * 100.0 + 0.5) / 100.0
                     AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR)
         AS qty_exact
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def decimal_exact_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DecimalType aggregation: money sums with EXACT cross-engine
    equality — fixed-point addition is associative, so no rounding
    discipline (functions/numeric.py) is needed for the SUM itself.

    The addends ARE quantized (quant, floor-based) before the decimal
    cast: a raw ``double -> DECIMAL(18,2)`` cast rounds HALF_UP in Spark
    (BigDecimal) but half-to-even in DuckDB, so stored values landing
    exactly on a ``.xx5`` boundary diverge by one cent pre-sum (surfaced
    at sf0.01; sf0.001 has no boundary values). After quant the double
    is within an ulp of a 2-decimal value, so both casts agree.

    The trade: decimal aggregation runs outside some codegen fast paths
    (~2-3x slower than double), which is why the float+quantizer scheme
    is the default and decimal the audit/finance path.

    The RESULT columns are emitted as strings on both sides: DuckDB's
    pandas conversion degrades DECIMAL(38,2) to float64 (1234.50 ->
    1234.5) while Spark keeps Decimal objects, so a decimal-typed
    output can never value-hash-match even when equal. Rendering the
    final (already-aggregated) decimals as text ("1234.50" both
    engines) keeps the DecimalType arithmetic inside the query while
    making the output representation engine-portable.
    """
    li = load_table(spark, sf_dir, "lineitem")
    d = lambda c: quant(F.col(c), 2).cast("decimal(18,2)")  # noqa: E731
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.sum(d("l_extendedprice"))
            .cast("decimal(38,2)")
            .cast("string")
            .alias("revenue_exact"),
            F.sum(d("l_quantity"))
            .cast("decimal(38,2)")
            .cast("string")
            .alias("qty_exact"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "skew_salted_agg",
    oracle="""
SELECT l_returnflag,
       COUNT(*) AS n_lines,
       ROUND(SUM(l_quantity), 2) AS total_qty
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salting recipe for skewed aggregation keys, made explicit.

    ``l_returnflag`` has 3 values — a worst-case skew key (3 reducers do
    all the work in a naive plan). Stage 1 salts the key with
    ``pmod(hash(row-id), 16)`` and partially aggregates on
    (key, salt) — 48 evenly-sized groups; stage 2 merges the partials
    per key. COUNT/SUM are decomposable, so the result is provably equal
    to the direct groupBy (which is what the oracle computes).

    At 100 TB this is the manual fallback when AQE skew-splitting can't
    help (single giant *group*, not a join); Spark's own partial
    aggregation does the same thing implicitly, which is why the salted
    plan adds only one extra (tiny) shuffle stage.
    """
    li = load_table(spark, sf_dir, "lineitem")
    salted = li.withColumn(
        "salt", F.pmod(F.hash("l_orderkey", "l_linenumber"), F.lit(16))
    )
    partial = salted.groupBy("l_returnflag", "salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum("l_quantity").alias("pq"),
    )
    return (
        partial.groupBy("l_returnflag")
        .agg(
            F.sum("pn").alias("n_lines"),
            F.round(F.sum("pq"), 2).alias("total_qty"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "events_hot_key_profile",
    oracle=f"""
WITH counts AS (
  SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id
), tot AS (
  SELECT SUM(n_events) AS total, COUNT(*) AS n_keys FROM counts
)
SELECT user_id,
       n_events,
       {quant_sql("CAST(n_events AS DOUBLE) / total", 6)} AS share,
       {quant_sql("(CAST(n_events AS DOUBLE) * n_keys) / total", 4)} AS x_avg
FROM counts, tot
ORDER BY n_events DESC, user_id
LIMIT 5
""",
)
def events_hot_key_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew DIAGNOSTIC: the 5 hottest shuffle keys with their share of
    all rows and their multiple of the mean per-key load.

    This is the measurement that decides between the mitigation tools —
    ``x_avg`` near 1 means the key is fine as a shuffle/join key; a key
    carrying 100x the mean load is what makes one task straggle while
    the rest idle, and points at ``skew_salted_agg``-style salting,
    AQE skew-join splitting, or broadcast. Plan: one map-side-combined
    count per key, then a broadcast 1-row totals frame (never a
    ``.collect()``) joined back, and a distributed top-5. At 100 TB the
    per-key count frame is the only sized intermediate — run it on a
    deterministic sample (``documents_hash_sample`` pattern) or switch
    to the sketch twin ``topk_users_approx`` when even that is too big.

    The counts frame feeds BOTH the totals branch and the top-5 branch;
    it is localCheckpointed so the events scan + count shuffle runs
    exactly once rather than relying on Catalyst ReuseExchange (which a
    future plan change could silently break — at scale a missed reuse
    doubles the dominant stage).
    """
    from hadoop_cs4225_spark.sources.tables import load_events

    counts = (
        load_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .localCheckpoint(eager=False)
    )
    tot = F.broadcast(
        counts.agg(
            F.sum("n_events").alias("total"),
            F.count(F.lit(1)).alias("n_keys"),
        )
    )
    return (
        counts.crossJoin(tot)
        .select(
            "user_id",
            "n_events",
            quant(F.col("n_events").cast("double") / F.col("total"), 6).alias(
                "share"
            ),
            quant(
                (F.col("n_events").cast("double") * F.col("n_keys"))
                / F.col("total"),
                4,
            ).alias("x_avg"),
        )
        .orderBy(F.desc("n_events"), "user_id")
        .limit(5)
    )


@register("approx_distinct_parts")  # no oracle: HLL sketches differ per engine
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++) — the 100 TB cardinality-estimate path.

    No DuckDB oracle: both engines implement HLL but with different
    hash/bias internals, so estimates differ by design. The adjacent
    exact count is in `brand_revenue`/`segment_account_stats`.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # rsd stays at the 0.05 default: tightening to 0.01 grows the HLL
    # register array ~16x and measured 10x slower (4.1s vs 0.4s at
    # sf0.1) for precision the estimate path doesn't need.
    return li.agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.approx_count_distinct("l_suppkey").alias("approx_supps"),
    )


@register(
    "nation_metrics_unpivot",
    oracle="""
WITH wide AS (
  SELECT n.n_name,
         CAST(COUNT(*) AS DOUBLE)                    AS n_customers,
         ROUND(SUM(c.c_acctbal), 2)                  AS total_balance,
         CAST(MAX(c.c_acctbal) AS DOUBLE)            AS max_balance
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name
)
SELECT n_name, metric, value
FROM wide UNPIVOT (value FOR metric IN (n_customers, total_balance, max_balance))
ORDER BY n_name, metric
""",
)
def nation_metrics_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape: per-nation metrics unpivoted to (name, metric,
    value) rows — ``DataFrame.unpivot`` (melt), the inverse of pivot.

    Unpivot is a per-row flatMap (each input row emits one row per value
    column) — no shuffle beyond the upstream aggregation; at 100 TB the
    reshape itself is free, which is why long-form is the standard
    interchange layout for metric stores.
    """
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    wide = (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_balance"),
            F.max("c_acctbal").cast("double").alias("max_balance"),
        )
    )
    return wide.unpivot(
        ["n_name"], ["n_customers", "total_balance", "max_balance"],
        "metric", "value",
    ).orderBy("n_name", "metric")


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salt: int = 16,
    salt_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Skew-safe fact⋈dim equi-join: replicate the dim ``n_salt``× and
    scatter the fact over (key, salt) — the manual recipe for when a
    low-cardinality join key would funnel the whole fact table through
    |keys| reducers AND the dim is too big to broadcast.

    ``salt_cols`` picks fact columns to derive the salt from; pass
    row-identifying columns (an id, a timestamp) so a hot key's rows
    spread across all ``n_salt`` buckets. When empty, the salt falls
    back to ``monotonically_increasing_id()`` — a per-ROW value, never
    the join key: salting by the key alone would give every row of a
    hot key the same constant salt, i.e. zero skew mitigation while
    still paying the n_salt× dim replication. (The id-based salt is
    nondeterministic across task retries, which is safe here: the dim
    side carries EVERY salt value 0..n_salt-1, so a fact row matches
    its dim rows whatever salt it lands on.) Result is value-identical
    to ``fact.join(dim, key)`` — replication only changes WHERE rows
    meet. Prefer, in order: broadcast (small dim), AQE skew-join split
    (uneven but high-cardinality keys), THIS (low-cardinality keys +
    medium dim). Cost: dim inflates n_salt×, shuffle keys inflate to
    |keys|·n_salt even buckets.
    """
    salt_src = (
        F.hash(*salt_cols) if salt_cols
        else F.hash(F.monotonically_increasing_id())
    )
    salted_fact = fact.withColumn("__salt", F.pmod(salt_src, F.lit(n_salt)))
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return salted_fact.join(salted_dim, [key, "__salt"]).drop("__salt")


@register(
    "customer_order_multiset_ops",
    oracle="""
WITH a AS (
  SELECT o_custkey FROM orders
  WHERE o_custkey <= 200 AND o_totalprice >= 100000
),
b AS (
  SELECT o_custkey FROM orders
  WHERE o_custkey <= 200 AND o_orderpriority IN ('1-URGENT', '2-HIGH')
),
ea AS (SELECT 'except_all' AS op, o_custkey
       FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b) t),
ia AS (SELECT 'intersect_all' AS op, o_custkey
       FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b) t)
SELECT op, o_custkey, COUNT(*) AS multiplicity
FROM (SELECT * FROM ea UNION ALL SELECT * FROM ia) u
GROUP BY op, o_custkey
ORDER BY op, o_custkey
""",
)
def customer_order_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTISET set operations — ``exceptAll`` / ``intersectAll`` keep
    duplicate multiplicity (bag semantics), unlike the distinct-set ops
    in ``nation_presence_setops``: a customer with 5 big orders and 2
    urgent ones survives EXCEPT ALL 3 times.

    Spark lowers both to an aggregate computing per-row counts on each
    side plus a generate (min/difference of multiplicities) — one
    shuffle keyed on the row value, no join; same algebra DuckDB runs.
    At 100 TB this beats the window-rank emulation a multiset-unaware
    engine would need.
    """
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") <= 200)
    a = orders.where(F.col("o_totalprice") >= 100000).select("o_custkey")
    b = orders.where(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).select("o_custkey")
    ea = a.exceptAll(b).select(F.lit("except_all").alias("op"), "o_custkey")
    ia = a.intersectAll(b).select(F.lit("intersect_all").alias("op"), "o_custkey")
    return (
        ea.unionByName(ia)
        .groupBy("op", "o_custkey")
        .agg(F.count(F.lit(1)).alias("multiplicity"))
        .orderBy("op", "o_custkey")
    )


@register(
    "order_trend_regression",
    oracle=f"""
WITH pts AS (
  SELECT c.c_mktsegment AS segment,
         CAST(datediff('day', DATE '1995-01-01',
                       CAST(o.o_orderdate AS DATE)) AS DOUBLE) AS x,
         o.o_totalprice / 1000.0 AS y
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
), s AS (
  SELECT segment,
         CAST(COUNT(*) AS DOUBLE) AS n,
         ROUND(SUM(x), 2)     AS sx,
         ROUND(SUM(y), 4)     AS sy,
         ROUND(SUM(x * y), 2) AS sxy,
         ROUND(SUM(x * x), 2) AS sxx,
         ROUND(SUM(y * y), 4) AS syy
  FROM pts GROUP BY segment
)
SELECT segment,
       CAST(n AS BIGINT) AS n_orders,
       {quant_sql("(n * sxy - sx * sy) / (n * sxx - sx * sx)", 6)} AS slope_kusd_per_day,
       {quant_sql("(sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n", 4)}
         AS intercept_kusd,
       {quant_sql("(n * sxy - sx * sy) / "
                  "sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))", 6)} AS pearson_r
FROM s
ORDER BY segment
""",
)
def order_trend_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment linear trend of order value over time: OLS slope,
    intercept and Pearson r of (order day, total price in k$).

    The regression aggregates computed the cross-engine-stable way —
    NOT via the builtin ``regr_slope``/``corr`` (each engine's
    streaming-update formula reassociates differently), but from the
    five classical moment sums, each rounded once (the ``rsum``
    policy), then combined with plain IEEE arithmetic that is
    bit-identical on identical inputs. Plan: one fact-side join
    (customer dim broadcasts), one partial-aggregated shuffle on
    segment — moments are map-side-combinable, so at 100 TB this costs
    exactly what any per-segment SUM costs. y is scaled to k$ so the
    sum-of-squares stays far under the 2^53/10^s rounding cliff at any
    realistic SF (documented in cross-engine-float terms in
    functions/numeric.py).
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    pts = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("double")
        .alias("x"),
        (F.col("o_totalprice") / 1000.0).alias("y"),
    )
    s = pts.groupBy("segment").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.round(F.sum("x"), 2).alias("sx"),
        F.round(F.sum("y"), 4).alias("sy"),
        F.round(F.sum(F.col("x") * F.col("y")), 2).alias("sxy"),
        F.round(F.sum(F.col("x") * F.col("x")), 2).alias("sxx"),
        F.round(F.sum(F.col("y") * F.col("y")), 4).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    den_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    slope = num / den_x
    return s.select(
        "segment",
        F.col("n").cast("bigint").alias("n_orders"),
        quant(slope, 6).alias("slope_kusd_per_day"),
        quant((F.col("sy") - slope * F.col("sx")) / F.col("n"), 4).alias(
            "intercept_kusd"
        ),
        quant(num / F.sqrt(den_x * den_y), 6).alias("pearson_r"),
    ).orderBy("segment")


@register(
    "star_constraint_audit",
    oracle="""
SELECT * FROM (
  SELECT 0 AS rule_idx, 'orders_pk_unique' AS rule,
         (SELECT COUNT(*) FROM
            (SELECT o_orderkey FROM orders GROUP BY o_orderkey
             HAVING COUNT(*) > 1) d) AS n_violations
  UNION ALL
  SELECT 1, 'customer_pk_unique',
         (SELECT COUNT(*) FROM
            (SELECT c_custkey FROM customer GROUP BY c_custkey
             HAVING COUNT(*) > 1) d)
  UNION ALL
  SELECT 2, 'orders_custkey_fk',
         (SELECT COUNT(*) FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM customer c
                            WHERE c.c_custkey = o.o_custkey))
  UNION ALL
  SELECT 3, 'lineitem_orderkey_fk',
         (SELECT COUNT(*) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM orders o
                            WHERE o.o_orderkey = l.l_orderkey))
  UNION ALL
  SELECT 4, 'lineitem_qty_positive',
         (SELECT COUNT(*) FROM lineitem WHERE l_quantity <= 0)
  UNION ALL
  SELECT 5, 'orders_date_not_null',
         (SELECT COUNT(*) FROM orders WHERE o_orderdate IS NULL)
)
ORDER BY rule_idx
""",
)
def star_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-contract audit over the star schema: primary-key
    uniqueness, foreign-key containment, domain and NOT-NULL rules —
    one row per rule with its violation count (all zeros on healthy
    data, and the FIRST thing an ingest pipeline runs before
    publishing a snapshot; Spark has no DB-enforced constraints, so
    the audit IS the constraint system).

    Plan shapes per rule family: PK uniqueness is a partial-agg
    groupBy + HAVING (never a distinct-then-count double scan); FK
    containment is a LEFT ANTI join (at 100 TB the dim side broadcasts
    or the join shuffles on the key — either way no row leaves the
    JVM); domain/null rules are map-side predicate counts. The six
    1-row results union into the report frame — each subquery is
    independently prunable, and a scheduler can run them as one job.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")

    def one(idx: int, rule: str, cnt_df: DataFrame) -> DataFrame:
        return cnt_df.select(
            F.lit(idx).alias("rule_idx"),
            F.lit(rule).alias("rule"),
            F.col("n").cast("long").alias("n_violations"),
        )

    dup_orders = (
        o.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") > 1)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    dup_cust = (
        c.groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") > 1)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    orphan_orders = (
        o.join(c, o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    orphan_lines = (
        li.join(o, li.l_orderkey == o.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    bad_qty = li.where(F.col("l_quantity") <= 0).agg(
        F.count(F.lit(1)).alias("n")
    )
    null_date = o.where(F.col("o_orderdate").isNull()).agg(
        F.count(F.lit(1)).alias("n")
    )
    report = (
        one(0, "orders_pk_unique", dup_orders)
        .unionByName(one(1, "customer_pk_unique", dup_cust))
        .unionByName(one(2, "orders_custkey_fk", orphan_orders))
        .unionByName(one(3, "lineitem_orderkey_fk", orphan_lines))
        .unionByName(one(4, "lineitem_qty_positive", bad_qty))
        .unionByName(one(5, "orders_date_not_null", null_date))
    )
    return report.orderBy("rule_idx")


@register(
    "partkey_join_size_estimate",
    oracle=f"""
WITH k AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM lineitem GROUP BY l_partkey
), tot AS (
  SELECT CAST(SUM(n_rows) AS BIGINT) AS n_input,
         CAST(SUM(n_rows * n_rows) AS BIGINT) AS join_rows
  FROM k
)
SELECT k.l_partkey, k.n_rows,
       CAST(k.n_rows * k.n_rows AS BIGINT) AS key_join_rows,
       {quant_sql(
           "k.n_rows * k.n_rows * 1.0 / tot.join_rows", 6)} AS pct_of_join,
       tot.n_input, tot.join_rows
FROM k CROSS JOIN tot
ORDER BY key_join_rows DESC, k.l_partkey
LIMIT 5
""",
)
def partkey_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join cardinality estimate: the EXACT output size of the
    lineitem⋈lineitem self-join on l_partkey (the co-purchase /
    market-basket join shape), computed from the key histogram WITHOUT
    running the join — |A⋈A| = Σ_k cnt(k)², one partial-agg groupBy
    plus a 1-row sum, versus materializing the join itself. Reports the
    total plus the 5 keys contributing the most output rows.

    This is the measurement a planner (or engineer) runs BEFORE the
    expensive join: ``events_hot_key_profile`` says which INPUT keys
    are hot; this says what the join would EMIT — the number that
    decides between running it as-is, salting the fat keys, or
    pre-aggregating. AQE makes this decision from runtime shuffle
    statistics mid-query; materializing it as a query makes the same
    diagnostic available BEFORE committing a 100 TB shuffle.

    Bound: cnt² sums are exact BIGINTs below Σcnt² ~ 2^63 (a single
    key would need ~3e9 rows — document-scale hot keys get salted long
    before that). Plan: one map-side-combined count per key, a
    broadcast 1-row totals frame, a distributed top-5.
    """
    li = load_table(spark, sf_dir, "lineitem")
    k = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    ).localCheckpoint(eager=False)  # feeds totals AND the top-5
    tot = F.broadcast(
        k.agg(
            F.sum("n_rows").cast("long").alias("n_input"),
            F.sum(F.col("n_rows") * F.col("n_rows"))
            .cast("long")
            .alias("join_rows"),
        )
    )
    return (
        k.crossJoin(tot)
        .select(
            "l_partkey",
            "n_rows",
            (F.col("n_rows") * F.col("n_rows")).cast("long").alias(
                "key_join_rows"
            ),
            quant(
                F.col("n_rows") * F.col("n_rows") * 1.0 / F.col("join_rows"),
                6,
            ).alias("pct_of_join"),
            "n_input",
            "join_rows",
        )
        .orderBy(F.desc("key_join_rows"), "l_partkey")
        .limit(5)
    )
