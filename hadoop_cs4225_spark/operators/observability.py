"""Pipeline observability via ``Dataset.observe`` / ``Observation``.

At 100 TB the cardinal sin of pipeline QC is paying a SECOND full scan
to compute row counts and control totals the main job already touched.
``df.observe(...)`` attaches named aggregate expressions to a plan node;
Spark accumulates them ON THE SAME PASS as the real action and hands
them to the driver when the action completes — metrics for free, the
Spark-native replacement for Hadoop's job counters (the reference reads
its counters from the MapReduce JobClient after each of its two jobs;
``/root/reference/src/main/java`` TopkCommonWords.java drives jobs via
``job.waitForCompletion`` which prints those counters).

The registered query runs a real pipeline action (a ``noop``-sink write
— the scan + metrics cost with no output bytes), then returns the
observed metrics as a 1-row DataFrame. The float discipline is the
cogroup module's: money is observed as integer CENTS so the
accumulated sum is order-independent and hash-matches the oracle
exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_cs4225_spark.functions.numeric import quant, quant_sql
from hadoop_cs4225_spark.registry import register
from hadoop_cs4225_spark.sources.tables import load_table

_METRIC_SCHEMA = (
    "n_orders long, n_open long, total_cents long, min_key long, max_key long"
)


@register(
    "orders_scan_observed",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_open,
       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS total_cents,
       CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
       CAST(MAX(o_orderkey) AS BIGINT) AS max_key
FROM orders
""",
)
def orders_scan_observed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Control totals for the orders scan, collected as ``observe``
    metrics during a no-output pipeline action — the QC pattern a real
    ingest job uses: row count, open-order count, money control total
    (integer cents), and key range, all accumulated on the one pass the
    job was already paying for.

    Plan: ONE scan; the observe node adds accumulator traffic only (a
    few longs per task). The ``noop`` sink measures exactly that scan —
    no shuffle, no output. The returned 1-row frame is driver-built
    from the observation payload, which is the point: the metrics
    never touch a second job. (`Observation` objects are single-use;
    one is created per call.)
    """
    from pyspark.sql import Observation

    obs = Observation("orders_qc")
    orders = load_table(spark, sf_dir, "orders")
    observed = orders.observe(
        obs,
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0))
        .cast("long")
        .alias("n_open"),
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"))
        .cast("long")
        .alias("total_cents"),
        F.min("o_orderkey").cast("long").alias("min_key"),
        F.max("o_orderkey").cast("long").alias("max_key"),
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    row = tuple(
        m[k] for k in ("n_orders", "n_open", "total_cents", "min_key", "max_key")
    )
    return spark.createDataFrame([row], schema=_METRIC_SCHEMA)


#: k-anonymity threshold and the account-balance band width (dollars)
#: used as the third quasi-identifier dimension.
_KANON_K = 5
_KANON_BAND = 1000


@register(
    "customer_k_anonymity_audit",
    oracle=f"""
WITH g AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(floor(c_acctbal / {_KANON_BAND}) AS BIGINT) AS bal_band,
         CAST(COUNT(*) AS BIGINT) AS sz
  FROM customer
  GROUP BY c_nationkey, c_mktsegment, bal_band
)
SELECT {_KANON_K} AS k,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(MIN(sz) AS BIGINT) AS min_group_size,
       CAST(SUM(CASE WHEN sz < {_KANON_K} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_groups_below_k,
       CAST(SUM(CASE WHEN sz < {_KANON_K} THEN sz ELSE 0 END) AS BIGINT)
         AS n_records_at_risk,
       {quant_sql(
           f"SUM(CASE WHEN sz < {_KANON_K} THEN sz ELSE 0 END) * 1.0"
           " / SUM(sz)", 6)} AS pct_at_risk
FROM g
""",
)
def customer_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier triple (nation,
    market segment, $1000 account-balance band): how many QI groups
    fall below k=5 members and what fraction of customers they expose —
    the governance gate a dataset passes before an external release
    (the aggregate sibling of ``pii_redaction_scrub``, which fixes
    row-level identifiers; this measures REIDENTIFICATION risk from the
    attributes that remain).

    Plan: one partial-agg groupBy over the bounded QI domain
    (nations x segments x balance bands — a dictionary cross product,
    not corpus rows), then a 1-row summary aggregate. At 100 TB this is
    a single scan; the QI histogram fits in one task regardless of
    customer count.
    """
    cust = load_table(spark, sf_dir, "customer")
    g = cust.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / _KANON_BAND).cast("long").alias("bal_band"),
    ).agg(F.count(F.lit(1)).cast("long").alias("sz"))
    below = F.when(F.col("sz") < _KANON_K, F.col("sz")).otherwise(F.lit(0))
    return g.agg(
        F.lit(_KANON_K).alias("k"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.min("sz").cast("long").alias("min_group_size"),
        F.sum((F.col("sz") < _KANON_K).cast("long"))
        .cast("long")
        .alias("n_groups_below_k"),
        F.sum(below).cast("long").alias("n_records_at_risk"),
        quant(F.sum(below) * 1.0 / F.sum("sz"), 6).alias("pct_at_risk"),
    )


#: l-diversity threshold (distinct sensitive values per QI group) and
#: the log-prob snap grid for the entropy variant.
_LDIV_L = 3
_LDIV_GRID = 1_000_000_000


@register(
    "customer_l_diversity_audit",
    oracle=f"""
WITH cell AS (
  SELECT c_nationkey,
         CAST(floor(c_acctbal / {_KANON_BAND}) AS BIGINT) AS bal_band,
         c_mktsegment, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM customer
  GROUP BY c_nationkey, bal_band, c_mktsegment
), cellp AS (
  SELECT c_nationkey, bal_band, cnt,
         CAST(cnt AS DOUBLE) / SUM(cnt) OVER
           (PARTITION BY c_nationkey, bal_band) AS p
  FROM cell
), grp AS (
  SELECT c_nationkey, bal_band,
         CAST(SUM(cnt) AS BIGINT) AS sz,
         CAST(COUNT(*) AS BIGINT) AS l_distinct,
         CAST(SUM(CAST(floor(-p * ln(p) * {_LDIV_GRID} + 0.5)
                       AS BIGINT)) AS BIGINT) AS ent_q
  FROM cellp
  GROUP BY c_nationkey, bal_band
)
SELECT {_LDIV_L} AS l,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(MIN(l_distinct) AS BIGINT) AS min_l,
       CAST(SUM(CASE WHEN l_distinct < {_LDIV_L} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_groups_below_l,
       CAST(SUM(CASE WHEN l_distinct < {_LDIV_L} THEN sz ELSE 0 END) AS BIGINT)
         AS n_records_at_risk,
       {quant_sql(
           f"SUM(CASE WHEN l_distinct < {_LDIV_L} THEN sz ELSE 0 END) * 1.0"
           " / SUM(sz)", 6)} AS pct_at_risk,
       {quant_sql(f"exp(MIN(ent_q) / {_LDIV_GRID}.0)", 6)} AS min_entropy_l
FROM grp
""",
)
def customer_l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit: within each quasi-identifier group (nation,
    $1000 balance band), how DIVERSE is the sensitive attribute
    (market segment)? k-anonymity (sibling query above) only counts
    group size — a group of 50 customers all in the same segment is
    k-anonymous yet leaks the segment with certainty. Reports distinct
    l per group (groups below l=3 and the records they expose) plus
    the stricter entropy l-diversity floor exp(min group entropy).

    Determinism: group entropy terms -(c/n)ln(c/n) are snapped to the
    1e-9 grid per sensitive value and summed as BIGINTs; the min/exp
    happen on exact integers until one final quantized exp.

    Plan: two nested hash aggregates over the bounded (nation x band x
    segment) dictionary — like the k-anonymity audit, corpus size only
    affects the first scan; the per-group entropy window runs inside
    each QI partition of the CELL table (dictionary-sized, partitioned).

    No reference analogue; extends the SURVEY §2 governance family.
    """
    cust = load_table(spark, sf_dir, "customer")
    cell = cust.groupBy(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / _KANON_BAND).cast("long").alias("bal_band"),
        "c_mktsegment",
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    from pyspark.sql import Window

    w = Window.partitionBy("c_nationkey", "bal_band")
    p = F.col("cnt").cast("double") / F.sum("cnt").over(w)
    ent_term = F.floor(-p * F.log(p) * _LDIV_GRID + 0.5).cast("long")
    grp = (
        cell.withColumn("ent_t", ent_term)
        .groupBy("c_nationkey", "bal_band")
        .agg(
            F.sum("cnt").cast("long").alias("sz"),
            F.count(F.lit(1)).cast("long").alias("l_distinct"),
            F.sum("ent_t").cast("long").alias("ent_q"),
        )
    )
    below = F.col("l_distinct") < _LDIV_L
    return grp.agg(
        F.lit(_LDIV_L).alias("l"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.min("l_distinct").cast("long").alias("min_l"),
        F.sum(below.cast("long")).cast("long").alias("n_groups_below_l"),
        F.sum(F.when(below, F.col("sz")).otherwise(0))
        .cast("long")
        .alias("n_records_at_risk"),
        quant(
            F.sum(F.when(below, F.col("sz")).otherwise(0)) * 1.0 / F.sum("sz"),
            6,
        ).alias("pct_at_risk"),
        quant(F.exp(F.min("ent_q") / float(_LDIV_GRID)), 6).alias(
            "min_entropy_l"
        ),
    )


# ---------------------------------------------------------------------------
# Round-10: t-closeness audit (completes the k-anon / l-div / t-close trio)
# ---------------------------------------------------------------------------

#: t threshold and TVD snap grid: a QI group violates t-closeness when
#: the total-variation distance between its sensitive-attribute
#: (market segment) distribution and the GLOBAL one exceeds t = 0.4.
#: Comparisons happen on grid integers (2 * t * grid), never floats.
_TCLOSE_GRID = 1_000_000
_TCLOSE_T_X2GRID = 800_000  # 2 * 0.4 * grid


@register(
    "customer_t_closeness_audit",
    oracle=f"""
WITH cell AS (
  SELECT c_nationkey,
         CAST(floor(c_acctbal / {_KANON_BAND}) AS BIGINT) AS bal_band,
         c_mktsegment, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM customer
  GROUP BY c_nationkey, bal_band, c_mktsegment
), grp AS (
  SELECT c_nationkey, bal_band, CAST(SUM(cnt) AS BIGINT) AS sz
  FROM cell GROUP BY c_nationkey, bal_band
), seg AS (
  SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS gcnt FROM customer
  GROUP BY c_mktsegment
), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM customer),
term AS (
  SELECT g.c_nationkey, g.bal_band, g.sz,
         CAST(floor(abs(CAST(COALESCE(c.cnt, 0) AS DOUBLE) / g.sz
                        - CAST(s.gcnt AS DOUBLE) / t.n)
                    * {_TCLOSE_GRID} + 0.5) AS BIGINT) AS tvd_g
  FROM grp g CROSS JOIN seg s CROSS JOIN tot t
  LEFT JOIN cell c ON c.c_nationkey = g.c_nationkey
                  AND c.bal_band = g.bal_band
                  AND c.c_mktsegment = s.c_mktsegment
), gtvd AS (
  SELECT c_nationkey, bal_band, sz,
         CAST(SUM(tvd_g) AS BIGINT) AS tvd_x2grid
  FROM term GROUP BY c_nationkey, bal_band, sz
)
SELECT {quant_sql("0.4", 1)} AS t,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       {quant_sql(f"MAX(tvd_x2grid) / 2.0 / {_TCLOSE_GRID}", 6)}
         AS max_tvd,
       CAST(SUM(CASE WHEN tvd_x2grid > {_TCLOSE_T_X2GRID} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_groups_above_t,
       CAST(SUM(CASE WHEN tvd_x2grid > {_TCLOSE_T_X2GRID} THEN sz ELSE 0 END)
            AS BIGINT) AS n_records_at_risk,
       {quant_sql(
           f"SUM(CASE WHEN tvd_x2grid > {_TCLOSE_T_X2GRID} THEN sz"
           " ELSE 0 END) * 1.0 / SUM(sz)", 6)} AS pct_at_risk
FROM gtvd
""",
)
def customer_t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit, the third rung of the release-governance
    ladder: within each quasi-identifier group (nation, $1000 balance
    band), how far does the SENSITIVE-attribute distribution (market
    segment) drift from the global one? k-anonymity bounds group size,
    l-diversity bounds distinctness — but a group can pass both while
    being 90% one segment against a uniform population, leaking strong
    posterior odds. t-closeness (Li/Li/Venkatasubramanian 2007) bounds
    exactly that: total-variation distance (= EMD under uniform ground
    distance) between group and global distributions must stay <= t.

    Determinism: every |p_group - p_global| term is ONE double
    expression of integer-count ratios snapped to the 1e-6 grid; group
    TVDs are BIGINT sums of those terms (x2 scale), and the threshold
    compares GRID INTEGERS — no float boundary can flip a verdict
    between engines.

    Scale: like its two siblings, everything after the first scan
    lives on the bounded (nation x band x segment) dictionary: the
    missing-cell completion is a cross join of the GROUP dictionary
    with the 5-row segment dictionary, never a corpus-row operation.

    No reference analogue; extends the SURVEY §2 governance family.
    """
    cust = load_table(spark, sf_dir, "customer")
    cell = cust.groupBy(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / _KANON_BAND).cast("long").alias(
            "bal_band"
        ),
        "c_mktsegment",
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    grp = cell.groupBy("c_nationkey", "bal_band").agg(
        F.sum("cnt").cast("long").alias("sz")
    )
    seg = F.broadcast(
        cust.groupBy("c_mktsegment").agg(
            F.count(F.lit(1)).cast("long").alias("gcnt")
        )
    )
    tot = F.broadcast(
        cust.agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    term = (
        grp.crossJoin(seg)
        .crossJoin(tot)
        .join(cell, ["c_nationkey", "bal_band", "c_mktsegment"], "left")
        .select(
            "c_nationkey",
            "bal_band",
            "sz",
            F.floor(
                F.abs(
                    F.coalesce(F.col("cnt"), F.lit(0)).cast("double")
                    / F.col("sz")
                    - F.col("gcnt").cast("double") / F.col("n")
                )
                * _TCLOSE_GRID
                + 0.5
            )
            .cast("long")
            .alias("tvd_g"),
        )
    )
    gtvd = term.groupBy("c_nationkey", "bal_band", "sz").agg(
        F.sum("tvd_g").cast("long").alias("tvd_x2grid")
    )
    above = F.col("tvd_x2grid") > _TCLOSE_T_X2GRID
    return gtvd.agg(
        quant(F.lit(0.4), 1).alias("t"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        quant(F.max("tvd_x2grid") / 2.0 / _TCLOSE_GRID, 6).alias("max_tvd"),
        F.sum(above.cast("long")).cast("long").alias("n_groups_above_t"),
        F.sum(F.when(above, F.col("sz")).otherwise(0))
        .cast("long")
        .alias("n_records_at_risk"),
        quant(
            F.sum(F.when(above, F.col("sz")).otherwise(0)) * 1.0
            / F.sum("sz"),
            6,
        ).alias("pct_at_risk"),
    )
