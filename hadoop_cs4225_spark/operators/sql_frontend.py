"""Queries expressed through the SQL front-end (``spark.sql``).

The engine's second public surface: temp views over the same loaders,
ANSI SQL in, DataFrame out — same Catalyst plans as the DataFrame API
(verified by the shared oracle harness). Covers constructs that are
SQL-first: GROUPING SETS, correlated NOT EXISTS, exact percentiles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hadoop_cs4225_spark.functions.numeric import quant_sql
from hadoop_cs4225_spark.registry import register
from hadoop_cs4225_spark.sources.tables import load_table


def _view(spark: SparkSession, sf_dir: str, name: str) -> None:
    # Per-sf_dir view names are unnecessary: each query registers the
    # views it needs immediately before running.
    load_table(spark, sf_dir, name).createOrReplaceTempView(name)


@register(
    "revenue_grouping_sets",
    oracle="""
SELECT COALESCE(l_returnflag, 'ALL') AS rflag,
       COALESCE(l_linestatus, 'ALL') AS lstatus,
       COUNT(*) AS n_lines,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
ORDER BY rflag, lstatus
""",
)
def revenue_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL front-end (one Expand pass)."""
    _view(spark, sf_dir, "lineitem")
    return spark.sql("""
        SELECT COALESCE(l_returnflag, 'ALL') AS rflag,
               COALESCE(l_linestatus, 'ALL') AS lstatus,
               COUNT(*) AS n_lines,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ORDER BY rflag, lstatus
    """)


@register(
    "parts_never_shipped",
    oracle="""
SELECT p_partkey, p_name
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 45
)
ORDER BY p_partkey
LIMIT 200
""",
)
def parts_never_shipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated NOT EXISTS (→ left-anti join in the physical plan)."""
    _view(spark, sf_dir, "part")
    _view(spark, sf_dir, "lineitem")
    return spark.sql("""
        SELECT p_partkey, p_name
        FROM part p
        WHERE NOT EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 45
        )
        ORDER BY p_partkey
        LIMIT 200
    """)


@register(
    "order_value_percentiles",
    oracle="""
SELECT o_orderstatus,
       (floor(quantile_cont(o_totalprice, 0.5) * 100.0 + 0.5) / 100.0) AS p50,
       (floor(quantile_cont(o_totalprice, 0.9) * 100.0 + 0.5) / 100.0) AS p90,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def order_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (SQL ``percentile`` ≙ DuckDB
    ``quantile_cont`` — both linear interpolation over the sorted set;
    identical stored doubles ⇒ identical results, quantized).

    At 100 TB exact percentiles require a full sort per group — the
    scale path swaps in ``approx_percentile`` (KLL/GK sketch), kept out
    of the oracle set for the same reason as approx_count_distinct.
    """
    _view(spark, sf_dir, "orders")
    # NB: Spark SQL parses bare decimal literals as DECIMAL (DuckDB as
    # DOUBLE) — `100d` keeps the whole expression in double like the
    # DataFrame-side quantizer.
    return spark.sql("""
        SELECT o_orderstatus,
               (floor(percentile(o_totalprice, 0.5) * 100d + 0.5d) / 100d) AS p50,
               (floor(percentile(o_totalprice, 0.9) * 100d + 0.5d) / 100d) AS p90,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """)


@register("order_value_percentiles_approx")  # sketch-based: no cross-engine oracle
def order_value_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``approx_percentile`` — the 100 TB percentile path (KLL/GK sketch,
    mergeable across partitions, no global sort). Engine-specific sketch
    internals ⇒ rows-only check; the exact twin is
    ``order_value_percentiles``."""
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.approx_percentile("o_totalprice", 0.5, 10000).alias("p50_approx"),
            F.approx_percentile("o_totalprice", 0.9, 10000).alias("p90_approx"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "lateral_top_customers",
    oracle="""
SELECT n.n_name, t.c_name, t.c_acctbal
FROM nation n, LATERAL (
  SELECT c_name, c_acctbal FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_name LIMIT 3
) t
ORDER BY n.n_name, t.c_acctbal DESC, t.c_name
""",
)
def lateral_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: top-3 customers by balance per
    nation, via the SQL front-end.

    Catalyst decorrelates `JOIN LATERAL ... ORDER BY ... LIMIT k` into
    the same window-rank plan the DataFrame twin
    (`top_orders_per_customer`) builds by hand — one shuffle keyed on
    the correlation key, no per-nation re-scan of customer. The nested
    re-execution a naive reading implies does NOT survive optimization;
    that is the point of expressing it declaratively.
    """
    _view(spark, sf_dir, "nation")
    _view(spark, sf_dir, "customer")
    return spark.sql("""
        SELECT n.n_name, t.c_name, t.c_acctbal
        FROM nation n
        JOIN LATERAL (
          SELECT c_name, c_acctbal FROM customer c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_name LIMIT 3
        ) t
        ORDER BY n.n_name, t.c_acctbal DESC, t.c_name
    """)


_RCTE_SQL = """
WITH RECURSIVE nxt AS (
  SELECT o_custkey, o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders WHERE o_custkey % 50 = 0
), chain (o_custkey, o_orderkey, rn, depth) AS (
  SELECT o_custkey, o_orderkey, rn, 1 FROM nxt WHERE rn = 1
  UNION ALL
  SELECT n.o_custkey, n.o_orderkey, n.rn, c.depth + 1
  FROM chain c JOIN nxt n
    ON n.o_custkey = c.o_custkey AND n.rn = c.rn + 1
  WHERE c.depth < 12
)
SELECT depth,
       COUNT(*) AS n_orders,
       COUNT(DISTINCT o_custkey) AS n_customers
FROM chain
GROUP BY depth
ORDER BY depth
"""


@register("recursive_order_chain", oracle=_RCTE_SQL)
def recursive_order_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (Spark 4.x): walk each customer's order history as
    a linked list — seed = first order, step = join to the next rank —
    and histogram the reached depths.

    Identical SQL runs on both engines (the oracle IS the query). Each
    recursion level is one join over the frontier, so cost scales with
    the LONGEST chain, not total rows — fine for bounded-depth recursion
    (hierarchies, graph frontiers); for per-key sequence numbering at
    100 TB the window-function formulation (`customer_running_spend`)
    is the single-shuffle path. Spark caps levels at
    spark.sql.cteRecursionLevelLimit (default 100) — raise it for
    deeper graphs. The `% 50` subset keeps the demo's frontier small
    and `depth < 12` bounds the level count (cost per level is a full
    join job); both appear in the oracle SQL, so parity is exact.
    """
    _view(spark, sf_dir, "orders")
    return spark.sql(_RCTE_SQL)


@register(
    "order_value_winsorized",
    oracle=f"""
WITH thr AS (
  SELECT {quant_sql("quantile_cont(o_totalprice, 0.01)", 6)} AS lo,
         {quant_sql("quantile_cont(o_totalprice, 0.99)", 6)} AS hi
  FROM orders
)
SELECT COUNT(*) AS n_orders,
       CAST(SUM(CASE WHEN o_totalprice < lo THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clipped_lo,
       CAST(SUM(CASE WHEN o_totalprice > hi THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clipped_hi,
       {quant_sql("ROUND(SUM(o_totalprice), 2) / COUNT(*)", 6)} AS mean_raw,
       {quant_sql("ROUND(SUM(LEAST(GREATEST(o_totalprice, lo), hi)), 2)"
                  " / COUNT(*)", 6)} AS mean_winsorized
FROM orders, thr
""",
)
def order_value_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (p01/p99-clipped) robust mean — the outlier-hardened
    stats pass feature pipelines run before normalizing money-scale
    columns (a single fat-finger order shifts a raw mean; the clipped
    mean is stable).

    Two passes over one pruned column: an exact-percentile aggregate
    (1 row, broadcast back via cross join — the same bounded-scalar
    shape as q11/q22) and the clipped re-aggregate. Thresholds are
    QUANTIZED before the comparisons so both engines clip the same
    rows; at 100 TB swap the exact percentile for approx_percentile and
    keep everything else.
    """
    from pyspark.sql import functions as F

    from hadoop_cs4225_spark.functions.numeric import quant

    orders = load_table(spark, sf_dir, "orders")
    thr = orders.agg(
        quant(F.expr("percentile(o_totalprice, 0.01d)"), 6).alias("lo"),
        quant(F.expr("percentile(o_totalprice, 0.99d)"), 6).alias("hi"),
    )
    clipped = F.least(F.greatest(F.col("o_totalprice"), F.col("lo")), F.col("hi"))
    return orders.crossJoin(F.broadcast(thr)).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum((F.col("o_totalprice") < F.col("lo")).cast("long")).alias(
            "n_clipped_lo"
        ),
        F.sum((F.col("o_totalprice") > F.col("hi")).cast("long")).alias(
            "n_clipped_hi"
        ),
        quant(F.round(F.sum("o_totalprice"), 2) / F.count(F.lit(1)), 6).alias(
            "mean_raw"
        ),
        quant(F.round(F.sum(clipped), 2) / F.count(F.lit(1)), 6).alias(
            "mean_winsorized"
        ),
    )


#: Bind values for the parameterized-SQL rollup — named here once so
#: the Spark call binds them as PARAMETERS while the oracle inlines
#: the same values as literals (the point of the test: both paths must
#: produce identical results).
_PARAM_STATUS = "F"
_PARAM_MIN_TOTAL = 50_000.0


@register(
    "orders_param_sql_rollup",
    oracle=f"""
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS revenue
FROM orders
WHERE o_orderstatus = '{_PARAM_STATUS}' AND o_totalprice >= {_PARAM_MIN_TOTAL}
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def orders_param_sql_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (`spark.sql(query, args={...})`): the
    injection-safe front-end for user-supplied filter values — named
    parameter markers (`:status`, `:min_total`) are bound as TYPED
    literals by the parser, never string-spliced, so a hostile value
    cannot alter the query shape. The oracle inlines the same values
    as literals; identical results prove binding ≡ inlining.

    Catalyst sees the bound literal before optimization, so pushdown
    and partition pruning work exactly as with hand-inlined SQL — a
    parameterized scan costs nothing extra at 100 TB.
    """
    _view(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS revenue
        FROM orders
        WHERE o_orderstatus = :status AND o_totalprice >= :min_total
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """,
        args={"status": _PARAM_STATUS, "min_total": _PARAM_MIN_TOTAL},
    )


#: EWMA weight for the scripting fold (matches events_daily_ewma's
#: recursive-smoothing discipline: per-step 6-dp quantization).
_SCRIPT_ALPHA = 0.3


@register(
    "orders_sql_script_ewma",
    oracle=f"""
WITH RECURSIVE monthly AS (
  SELECT time_bucket(INTERVAL '1 month', o_orderdate) AS m,
         SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) / 100.0 AS t
  FROM orders GROUP BY m
), last12 AS (
  SELECT m, t FROM monthly ORDER BY m DESC LIMIT 12
), seq AS (
  SELECT t, ROW_NUMBER() OVER (ORDER BY m) AS rn FROM last12
), rec AS (
  SELECT 1 AS rn, t AS s FROM seq WHERE rn = 1
  UNION ALL
  SELECT seq.rn,
         floor(({_SCRIPT_ALPHA} * seq.t + (1 - {_SCRIPT_ALPHA}) * rec.s)
               * 1000000 + 0.5) / 1000000
  FROM rec JOIN seq ON seq.rn = rec.rn + 1
)
SELECT CAST((SELECT COUNT(*) FROM seq) AS BIGINT) AS n_months,
       {quant_sql("(SELECT s FROM rec ORDER BY rn DESC LIMIT 1)", 4)}
         AS ewma_revenue
""",
)
def orders_sql_script_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting (Spark 4 `BEGIN ... END`): an imperative WHILE
    loop folding the monthly revenue series through an EWMA — the
    procedural surface (DECLARE / SET / IF / WHILE) that replaces
    driver-side Python glue for migration scripts and retry loops.
    The DuckDB oracle states the SAME recursion as a recursive CTE
    (the `events_daily_ewma` discipline), with the identical per-step
    1e-6 quantization making a float recursion oracle-checkable.

    Scale shape: ONE aggregate job builds the calendar-bounded monthly
    frame, which is MATERIALIZED (localCheckpoint) before the loop —
    a scripting loop over a plain temp view re-runs the view's whole
    aggregate on every scalar lookup (measured 20+ s for 80 months;
    materialized trailing-12: ~1 s). Iteration count is bounded by the
    12-month fold, never the row count. Each SET with a scalar
    subquery is still its own tiny job, which is the honest cost model
    of procedural SQL: use it to ORCHESTRATE aggregates, not to
    iterate data.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    monthly = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", "o_orderdate").alias("m"))
        # exact cents: t seeds the EWMA recursion (the Holt class)
        .agg(
            (
                F.sum(
                    F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
                )
                / 100.0
            ).alias("t")
        )
        .orderBy(F.desc("m"))
        .limit(12)
        # row_number over the 12-row LIMITed frame (bounded by
        # construction, the doc_zipf_fit discipline)
        .select("t", F.row_number().over(W.orderBy("m")).alias("rn"))
        .localCheckpoint()
    )
    monthly.createOrReplaceTempView("script_monthly")
    # The script executes EAGERLY inside spark.sql() (the WHILE loop
    # runs before it returns), so session state can be restored right
    # after: scripting-enabled and the temp view must not leak into
    # whatever query this shared session runs next.
    # no default arg: conf.get type-validates an explicit default, and
    # this conf always has a built-in one ("false") to fall back on
    prev = spark.conf.get("spark.sql.scripting.enabled")
    spark.conf.set("spark.sql.scripting.enabled", "true")
    try:
        return spark.sql(
            f"""
            BEGIN
              DECLARE n INT;
              DECLARE i INT DEFAULT 2;
              DECLARE s DOUBLE;
              DECLARE v DOUBLE;
              SET n = (SELECT COUNT(*) FROM script_monthly);
              SET s = (SELECT t FROM script_monthly WHERE rn = 1);
              WHILE i <= n DO
                SET v = (SELECT t FROM script_monthly WHERE rn = i);
                SET s = floor(({_SCRIPT_ALPHA} * v
                              + (1 - {_SCRIPT_ALPHA}) * s)
                              * 1000000 + 0.5) / 1000000;
                SET i = i + 1;
              END WHILE;
              SELECT CAST(n AS BIGINT) AS n_months,
                     {quant_sql("s", 4)} AS ewma_revenue;
            END
            """
        )
    finally:
        spark.conf.set("spark.sql.scripting.enabled", prev)
        spark.catalog.dropTempView("script_monthly")


#: Rank-limit top-n per priority (DuckDB expresses it as QUALIFY).
_QUALIFY_TOPN = 3


@register(
    "orders_window_group_limit_topn",
    oracle=f"""
SELECT o_orderpriority, o_orderkey, o_totalprice
FROM orders
QUALIFY ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                           ORDER BY o_totalprice DESC, o_orderkey)
        <= {_QUALIFY_TOPN}
ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey
""",
)
def orders_window_group_limit_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per priority through the rank-filter idiom, pinned
    to Spark's ``WindowGroupLimit`` physical rewrite: a filter on
    ROW_NUMBER() <= k over a partitioned window is recognized by
    Catalyst (InferWindowGroupLimit) and each map task pre-prunes to
    its local top-k BEFORE the shuffle — the window-function twin of
    TakeOrderedAndProject, and the difference between shuffling k rows
    per (task, priority) and shuffling the whole fact table at 100 TB
    (tests/test_plans.py asserts the node is present). OSS Spark 4.1
    has no QUALIFY clause, so the surface syntax is the subquery form;
    the DuckDB oracle states the IDENTICAL semantics as QUALIFY —
    documenting both spellings of the same relational operation.

    Determinism: the rank's (totalprice DESC, orderkey) order is total.

    SQL-frontend family; no reference analogue (SURVEY §2 frontends).
    """
    _view(spark, sf_dir, "orders")
    return spark.sql(
        f"""
        SELECT o_orderpriority, o_orderkey, o_totalprice
        FROM (
          SELECT o_orderpriority, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                    ORDER BY o_totalprice DESC, o_orderkey)
                   AS rk
          FROM orders
        ) WHERE rk <= {_QUALIFY_TOPN}
        ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey
        """
    )
