"""Pattern-mining / customer-analytics operators: RFM segmentation,
market-basket brand affinity, top event paths.

These are the classic "analytics on top of the warehouse" shapes a
reference user runs downstream of the relational core — each expressed
as one declarative plan (no iterative driver loops), with the same
cross-engine determinism discipline as the rest of the registry:
integer arithmetic until a final quantized division, thresholds
quantized BEFORE comparisons, and total orders on every window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_cs4225_spark.functions.numeric import quant, quant_sql
from hadoop_cs4225_spark.registry import register
from hadoop_cs4225_spark.sources.tables import load_events, load_table

#: Tercile split points for the RFM scores.
_RFM_Q1, _RFM_Q2 = 1.0 / 3.0, 2.0 / 3.0


@register(
    "customer_rfm_segments",
    oracle=f"""
WITH per_cust AS (
  SELECT o_custkey,
         MAX(o_orderdate) AS last_order,
         COUNT(*) AS freq,
         SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) / 100.0
           AS monetary
  FROM orders GROUP BY o_custkey
), bounds AS (
  SELECT MAX(last_order) AS now_d FROM per_cust
), rfm AS (
  SELECT o_custkey,
         CAST(datediff('day', CAST(last_order AS DATE), CAST(now_d AS DATE))
              AS BIGINT) AS recency,
         freq, monetary
  FROM per_cust CROSS JOIN bounds
), thr AS (
  SELECT {quant_sql(f"quantile_cont(recency, {_RFM_Q1})", 6)} AS r1,
         {quant_sql(f"quantile_cont(recency, {_RFM_Q2})", 6)} AS r2,
         {quant_sql(f"quantile_cont(freq, {_RFM_Q1})", 6)} AS f1,
         {quant_sql(f"quantile_cont(freq, {_RFM_Q2})", 6)} AS f2,
         {quant_sql(f"quantile_cont(monetary, {_RFM_Q1})", 6)} AS m1,
         {quant_sql(f"quantile_cont(monetary, {_RFM_Q2})", 6)} AS m2
  FROM rfm
), scored AS (
  SELECT CASE WHEN recency <= r1 THEN 3 WHEN recency <= r2 THEN 2 ELSE 1 END
           AS r_score,
         CASE WHEN freq >= f2 THEN 3 WHEN freq >= f1 THEN 2 ELSE 1 END
           AS f_score,
         CASE WHEN monetary >= m2 THEN 3 WHEN monetary >= m1 THEN 2 ELSE 1 END
           AS m_score,
         monetary
  FROM rfm CROSS JOIN thr
)
SELECT r_score, f_score, m_score,
       COUNT(*) AS n_customers,
       {quant_sql("ROUND(SUM(monetary), 2) / COUNT(*)", 4)} AS avg_monetary
FROM scored
GROUP BY r_score, f_score, m_score
ORDER BY r_score, f_score, m_score
""",
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — every customer scored 1-3 on Recency (days
    since last order, vs the corpus max date — deterministic, no wall
    clock), Frequency (order count) and Monetary (total spend) by
    exact tercile thresholds, rolled up to the 27-cell segment grid
    (3-3-3 = champions, 1-1-1 = lost, etc.).

    Plan: one per-customer reduce (max date / count / rounded sum),
    localCheckpointed because it feeds three consumers (the corpus-max
    bound, the tercile thresholds, and the scoring pass) — never three
    scans of orders. Bounds and thresholds are 1-row broadcast cross
    joins (the q11/q22 bounded-scalar shape); thresholds are QUANTIZED
    before the comparisons so both engines put boundary customers in
    the same bucket. At 100 TB swap `percentile` for approx_percentile
    and keep the shape.
    """
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("freq"),
            # exact cents: monetary feeds the tercile thresholds AND
            # the >= boundary comparisons (the Holt/ADVICE-r10 class)
            (
                F.sum(
                    F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
                )
                / 100.0
            ).alias("monetary"),
        )
        .localCheckpoint(eager=False)
    )
    bounds = F.broadcast(per_cust.agg(F.max("last_order").alias("now_d")))
    rfm = per_cust.crossJoin(bounds).select(
        F.datediff(F.col("now_d").cast("date"), F.col("last_order").cast("date"))
        .cast("long")
        .alias("recency"),
        "freq",
        "monetary",
    )
    # rfm is derived map-side from the checkpointed per_cust, so its two
    # consumers (thresholds + scoring) re-read the checkpoint, not orders.
    thr = F.broadcast(
        rfm.agg(
            quant(F.expr(f"percentile(recency, {_RFM_Q1}d)"), 6).alias("r1"),
            quant(F.expr(f"percentile(recency, {_RFM_Q2}d)"), 6).alias("r2"),
            quant(F.expr(f"percentile(freq, {_RFM_Q1}d)"), 6).alias("f1"),
            quant(F.expr(f"percentile(freq, {_RFM_Q2}d)"), 6).alias("f2"),
            quant(F.expr(f"percentile(monetary, {_RFM_Q1}d)"), 6).alias("m1"),
            quant(F.expr(f"percentile(monetary, {_RFM_Q2}d)"), 6).alias("m2"),
        )
    )
    scored = rfm.crossJoin(thr).select(
        F.when(F.col("recency") <= F.col("r1"), 3)
        .when(F.col("recency") <= F.col("r2"), 2)
        .otherwise(1)
        .alias("r_score"),
        F.when(F.col("freq") >= F.col("f2"), 3)
        .when(F.col("freq") >= F.col("f1"), 2)
        .otherwise(1)
        .alias("f_score"),
        F.when(F.col("monetary") >= F.col("m2"), 3)
        .when(F.col("monetary") >= F.col("m1"), 2)
        .otherwise(1)
        .alias("m_score"),
        "monetary",
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            quant(
                F.round(F.sum("monetary"), 2) / F.count(F.lit(1)), 4
            ).alias("avg_monetary"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


#: Number of brand pairs reported by the affinity query.
_AFFINITY_TOPK = 20


@register(
    "part_brand_affinity",
    oracle=f"""
WITH ob AS (
  SELECT DISTINCT l.l_orderkey, p.p_brand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
), n_orders AS (
  SELECT COUNT(DISTINCT l_orderkey) AS n FROM ob
), brand_n AS (
  SELECT p_brand, COUNT(*) AS n_b FROM ob GROUP BY p_brand
), pairs AS (
  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, COUNT(*) AS n_co
  FROM ob a JOIN ob b
    ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
  GROUP BY a.p_brand, b.p_brand
)
SELECT brand_a, brand_b, n_co,
       {quant_sql(
           "CAST(n_co AS DOUBLE) * n.n / (CAST(na.n_b AS DOUBLE) * nb.n_b)", 4
       )} AS lift
FROM pairs
JOIN brand_n na ON na.p_brand = brand_a
JOIN brand_n nb ON nb.p_brand = brand_b
CROSS JOIN n_orders n
ORDER BY n_co DESC, brand_a, brand_b
LIMIT {_AFFINITY_TOPK}
""",
)
def part_brand_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity: the 20 most co-ordered
    brand pairs with their lift (co-occurrence odds vs independence) —
    the association-rule primitive behind "bought together".

    Plan (r13): ONE groupBy(order) collect_set builds the per-order
    basket (map-side partial sets = map-side dedup), and pairs are the
    sorted in-array position pairs (i < j is brand_a < brand_b) — the
    old order-keyed self-join and its extra exchanges are gone.
    Per-order fanout is C(#brands, 2) of a ~7-item order, BOUNDED per
    key, never an all-pairs over brands or orders. Brand marginals are
    a 25-row broadcast; the order count a 1-row broadcast. Lift is
    integers until one final quantized division. At 100 TB the only big
    shuffles are the basket aggregate and the pair count — both
    map-side combined.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # r13 plan surgery — same rewrite as basket_name_rules: per-order
    # brand sets via ONE collect_set shuffle; sorted in-array position
    # pairs replace the order-keyed self-join (two exchanges removed);
    # fanout still C(#brands, 2) per order.
    baskets = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("p_brand")).alias("items"))
        # persist (freed by per-query clearCache); 3 consumers
        .persist()
    )
    n_orders = F.broadcast(baskets.agg(F.count(F.lit(1)).alias("n")))
    brand_n = F.broadcast(
        baskets.select(F.explode("items").alias("p_brand"))
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_b"))
    )
    pairs = (
        baskets.select(
            F.explode(
                F.flatten(
                    F.expr(
                        "transform(items, (x, i) -> transform("
                        "slice(items, i + 2, size(items)), "
                        "y -> struct(x AS brand_a, y AS brand_b)))"
                    )
                )
            ).alias("p")
        )
        .select("p.brand_a", "p.brand_b")
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("n_co"))
    )
    na = brand_n.select(
        F.col("p_brand").alias("brand_a"), F.col("n_b").alias("na")
    )
    nb = brand_n.select(
        F.col("p_brand").alias("brand_b"), F.col("n_b").alias("nb")
    )
    return (
        pairs.join(na, "brand_a")
        .join(nb, "brand_b")
        .crossJoin(n_orders)
        .select(
            "brand_a",
            "brand_b",
            "n_co",
            quant(
                F.col("n_co").cast("double")
                * F.col("n")
                / (F.col("na").cast("double") * F.col("nb")),
                4,
            ).alias("lift"),
        )
        .orderBy(F.desc("n_co"), "brand_a", "brand_b")
        .limit(_AFFINITY_TOPK)
    )


#: Number of 3-step paths reported.
_PATH_TOPK = 10


@register(
    "events_user_path_topk",
    oracle=f"""
WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type, 1) OVER w AS t2,
         LEAD(event_type, 2) OVER w AS t3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_type || '>' || t2 || '>' || t3 AS path,
       COUNT(*) AS n
FROM seq
WHERE t3 IS NOT NULL
GROUP BY path
ORDER BY n DESC, path
LIMIT {_PATH_TOPK}
""",
)
def events_user_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 10 three-step event-type paths across all user
    sessions — the sequence-mining upgrade of
    `event_transition_matrix`'s bigrams: which FUNNELS actually occur,
    not just which single hops.

    Plan: one window shuffle partitioned by user (each partition is one
    user's history — the natural bounded key), two LEADs over the
    (ts, event_id) TOTAL order, then a map-side-combined path count
    and a distributed top-k (TakeOrderedAndProject — never a global
    sort). Ties broken by path text so the cut is deterministic in
    both engines.
    """
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    )
    return (
        seq.where(F.col("t3").isNotNull())
        .select(
            F.concat_ws(">", "event_type", "t2", "t3").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(_PATH_TOPK)
    )


#: Benford expected first-digit shares log10(1 + 1/d), precomputed in
#: Python and injected as IDENTICAL literals into the Spark plan and
#: the DuckDB oracle — no engine evaluates a log for them, so parity
#: is exact by construction.
_BENFORD = {
    1: 0.3010299956639812,
    2: 0.17609125905568124,
    3: 0.12493873660829992,
    4: 0.09691001300805642,
    5: 0.07918124604762482,
    6: 0.06694678963061322,
    7: 0.05799194697768673,
    8: 0.05115252244738129,
    9: 0.04575749056067514,
}

_BENFORD_SQL_CASE = "CASE digit " + " ".join(
    f"WHEN {d} THEN {v!r}" for d, v in _BENFORD.items()
) + " END"


@register(
    "lineitem_benford_audit",
    oracle=f"""
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                          AS VARCHAR), 1, 1) AS INT) AS digit
  FROM lineitem WHERE l_extendedprice > 0
), counts AS (
  SELECT digit, COUNT(*) AS n FROM digits GROUP BY digit
), tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM counts)
SELECT digit,
       n,
       {quant_sql("CAST(n AS DOUBLE) / total", 6)} AS share,
       {quant_sql(_BENFORD_SQL_CASE, 6)} AS expected_share,
       {quant_sql(f"abs(CAST(n AS DOUBLE) / total - ({_BENFORD_SQL_CASE}))", 6)}
         AS abs_dev
FROM counts CROSS JOIN tot
ORDER BY digit
""",
)
def lineitem_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of line-item amounts — the
    data-quality / fraud screen: naturally-occurring multiplicative
    amounts follow P(d) = log10(1+1/d); a synthetic or truncated
    column shows up as large per-digit deviations. (The deviation
    ITSELF is the informative output here — TPC-H-style uniform prices
    are exactly the kind of synthetic data Benford flags.)

    Determinism: the first digit is taken from the DECIMAL STRING of
    integer cents (floor(x*100+0.5) — the `quant` grid), never from
    float formatting or log10 bucketing, both of which diverge between
    engines at powers of ten. Expected shares are Python-precomputed
    literals, identical in both plans. One map-side-combined 9-key
    aggregate + a 1-row broadcast total — nothing scales with rows but
    the scan.
    """
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_extendedprice") > 0)
    digits = li.select(
        F.substring(
            F.floor(F.col("l_extendedprice") * 100 + 0.5)
            .cast("bigint")
            .cast("string"),
            1,
            1,
        )
        .cast("int")
        .alias("digit")
    )
    counts = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    tot = F.broadcast(counts.agg(F.sum("n").cast("bigint").alias("total")))
    expected = F.coalesce(
        *[
            F.when(F.col("digit") == d, F.lit(v))
            for d, v in _BENFORD.items()
        ]
    )
    share = F.col("n").cast("double") / F.col("total")
    return (
        counts.crossJoin(tot)
        .select(
            "digit",
            "n",
            quant(share, 6).alias("share"),
            quant(expected, 6).alias("expected_share"),
            quant(F.abs(share - expected), 6).alias("abs_dev"),
        )
        .orderBy("digit")
    )


@register(
    "order_ship_delay_stats",
    oracle=f"""
WITH delays AS (
  SELECT o.o_orderpriority,
         CAST(datediff('day', CAST(o.o_orderdate AS DATE),
                       CAST(l.l_shipdate AS DATE)) AS BIGINT) AS delay_d
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
)
SELECT o_orderpriority,
       COUNT(*) AS n_items,
       {quant_sql("CAST(SUM(delay_d) AS DOUBLE) / COUNT(*)", 4)} AS avg_delay,
       {quant_sql("quantile_cont(delay_d, 0.95)", 4)} AS p95_delay,
       CAST(MAX(delay_d) AS BIGINT) AS max_delay
FROM delays
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def order_ship_delay_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency per priority class: mean, exact p95 and
    max days between order date and each line item's ship date — the
    SLA view that tells whether '1-URGENT' actually ships faster.

    Plan: one fact-fact equi-join on the order key (both sides huge at
    100 TB — this is the shuffle co-location case `bucketed_segment_
    revenue` pre-pays with bucketing) followed by ONE 5-key aggregate;
    delays are integer days so the mean is integers until one quantized
    division, and the grouped exact percentile (`percentile` ==
    `quantile_cont` on identical integer inputs) swaps for
    approx_percentile at scale without changing the shape.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    delays = o.join(li, o.o_orderkey == li.l_orderkey).select(
        "o_orderpriority",
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        )
        .cast("long")
        .alias("delay_d"),
    )
    return (
        delays.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            quant(
                F.sum("delay_d").cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_delay"),
            quant(F.expr("percentile(delay_d, 0.95d)"), 4).alias("p95_delay"),
            F.max("delay_d").cast("bigint").alias("max_delay"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Round-8 batch 5: association rules over order baskets
# ---------------------------------------------------------------------------

#: Minimum pair support (co-occurring orders) and rules returned.
_AR_MIN_SUP = 5
_AR_TOP_K = 20


@register(
    "basket_name_rules",
    oracle=f"""
WITH basket AS (
  SELECT DISTINCT l.l_orderkey AS ok, p.p_name AS item
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
), n_orders AS (
  SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n FROM basket
), item_sup AS (
  SELECT item, CAST(COUNT(*) AS BIGINT) AS sup FROM basket GROUP BY item
), pair_sup AS (
  SELECT a.item AS lhs, b.item AS rhs, CAST(COUNT(*) AS BIGINT) AS sup
  FROM basket a JOIN basket b ON a.ok = b.ok AND a.item < b.item
  GROUP BY lhs, rhs
  HAVING COUNT(*) >= {_AR_MIN_SUP}
)
SELECT p.lhs, p.rhs, p.sup AS pair_support,
       {quant_sql("CAST(p.sup AS DOUBLE) / la.sup", 6)} AS confidence,
       {quant_sql(
           "CAST(p.sup AS DOUBLE) * n.n / (CAST(la.sup AS DOUBLE) * lb.sup)",
           6)} AS lift
FROM pair_sup p
JOIN item_sup la ON la.item = p.lhs
JOIN item_sup lb ON lb.item = p.rhs
CROSS JOIN n_orders n
ORDER BY lift DESC, lhs, rhs
LIMIT {_AR_TOP_K}
""",
)
def basket_name_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules (the a-priori 2-itemset pass) over order
    baskets at part-NAME grain: support, confidence and lift for
    name pairs co-bought in >= 5 orders, top-20 by lift. The classic
    market-basket statistic `part_brand_affinity` approximates at
    brand grain; name grain is where lift actually discriminates
    (64-name dictionary — the itemset domain is bounded by the
    VOCABULARY, so the self-join per order fans out as
    lines-per-order^2, a small constant, never |orders|^2).

    Exactness: supports are exact BIGINT counts; confidence and lift
    are single quantized divisions of exact integers. Plan (r13): one
    broadcast part-dim join, ONE per-order collect_set aggregate (the
    basket), sorted in-array position pairs (bounded fanout, i < j is
    lhs < rhs), two dictionary-keyed marginal joins, one 1-row total,
    distributed top-k.

    No reference analogue; extends the SURVEY §2 mining family.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    # r13 plan surgery (guide §2.4): the per-order pair generation now
    # rides ONE groupBy(order) collect_set — the basket array is sorted
    # so in-array (i < j) position pairs ARE the lhs < rhs pairs — and
    # the old distinct + checkpoint + order-keyed self-join (two more
    # exchanges of every basket row) are gone. Per-order fanout is
    # unchanged (C(#items, 2), bounded by lines-per-order); marginals
    # and the order count fold off the same basket frame.
    baskets = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy(F.col("l_orderkey").alias("ok"))
        .agg(F.sort_array(F.collect_set("p_name")).alias("items"))
        # persist (freed by per-query clearCache), feeds pairs +
        # marginals + total
        .persist()
    )
    n_orders = F.broadcast(
        baskets.agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    item_sup = baskets.select(F.explode("items").alias("item")).groupBy(
        "item"
    ).agg(F.count(F.lit(1)).cast("long").alias("sup"))
    pair_sup = (
        baskets.select(
            F.explode(
                F.flatten(
                    F.expr(
                        "transform(items, (x, i) -> transform("
                        "slice(items, i + 2, size(items)), "
                        "y -> struct(x AS lhs, y AS rhs)))"
                    )
                )
            ).alias("p")
        )
        .select("p.lhs", "p.rhs")
        .groupBy("lhs", "rhs")
        .agg(F.count(F.lit(1)).cast("long").alias("sup"))
        .where(F.col("sup") >= _AR_MIN_SUP)
    )
    la = item_sup.select(F.col("item").alias("lhs"), F.col("sup").alias("sup_l"))
    lb = item_sup.select(F.col("item").alias("rhs"), F.col("sup").alias("sup_r"))
    return (
        pair_sup.join(F.broadcast(la), "lhs")
        .join(F.broadcast(lb), "rhs")
        .crossJoin(n_orders)
        .select(
            "lhs",
            "rhs",
            F.col("sup").alias("pair_support"),
            quant(F.col("sup").cast("double") / F.col("sup_l"), 6).alias(
                "confidence"
            ),
            quant(
                F.col("sup").cast("double")
                * F.col("n")
                / (F.col("sup_l").cast("double") * F.col("sup_r")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "lhs", "rhs")
        .limit(_AR_TOP_K)
    )


# ---------------------------------------------------------------------------
# Round-8 batch 5: customer segment migration between periods
# ---------------------------------------------------------------------------

#: Period boundary (shared with the CUPED/DiD experiments).
_MIG_SPLIT = "1998-01-01"


@register(
    "customer_rfm_migration",
    oracle=f"""
WITH spend AS (
  SELECT o_custkey,
         CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '{_MIG_SPLIT}'
                  THEN CAST(floor(o_totalprice) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS s1,
         CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '{_MIG_SPLIT}'
                  THEN CAST(floor(o_totalprice) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS s2
  FROM orders GROUP BY o_custkey
), thr AS (
  SELECT {quant_sql("quantile_cont(s1, 1.0/3.0) FILTER (WHERE s1 > 0)", 6)}
           AS t1,
         {quant_sql("quantile_cont(s1, 2.0/3.0) FILTER (WHERE s1 > 0)", 6)}
           AS t2
  FROM spend
), seg AS (
  SELECT CASE WHEN s1 = 0 THEN 'none' WHEN s1 >= t2 THEN 'high'
              WHEN s1 >= t1 THEN 'mid' ELSE 'low' END AS seg_from,
         CASE WHEN s2 = 0 THEN 'none' WHEN s2 >= t2 THEN 'high'
              WHEN s2 >= t1 THEN 'mid' ELSE 'low' END AS seg_to
  FROM spend CROSS JOIN thr
), mat AS (
  SELECT seg_from, seg_to, CAST(COUNT(*) AS BIGINT) AS n_customers
  FROM seg GROUP BY seg_from, seg_to
)
SELECT seg_from, seg_to, n_customers,
       {quant_sql(
           "CAST(n_customers AS DOUBLE) /"
           " SUM(n_customers) OVER (PARTITION BY seg_from)", 6)} AS row_pct
FROM mat
ORDER BY seg_from, seg_to
""",
)
def customer_rfm_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer value-segment MIGRATION matrix across the 1998-01-01
    cutover: each customer is banded low/mid/high/none by total spend
    in each period (band edges = the PRE-period spend terciles, held
    fixed so both periods are measured against one yardstick), and
    the matrix counts every (from, to) transition with row-normalized
    probabilities. The cohort-drift diagnostic behind churn dashboards
    — ``customer_rfm_segments`` is the static snapshot, this is its
    dynamics (`event_transition_matrix`'s discipline applied to a
    DERIVED state, not a logged one).

    Determinism: spends are exact floor-dollar BIGINTs; the tercile
    thresholds are quantized BEFORE banding (both engines compare the
    same numbers); the row normalization divides exact counts inside a
    16-cell partitioned window.

    Plan: one scan -> customer partial agg, a 1-row threshold
    aggregate broadcast back, a 16-row matrix — nothing after the
    first agg scales with the corpus.

    No reference analogue; extends the SURVEY §2 mining family.
    """
    orders = load_table(spark, sf_dir, "orders")
    pre = F.col("o_orderdate") < F.lit(_MIG_SPLIT).cast("timestamp")
    dollars = F.floor("o_totalprice").cast("long")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.when(pre, dollars).otherwise(0)).cast("long").alias("s1"),
        F.sum(F.when(~pre, dollars).otherwise(0)).cast("long").alias("s2"),
    )
    thr = F.broadcast(
        spend.where(F.col("s1") > 0).agg(
            quant(F.expr("percentile(s1, 1.0D/3.0D)"), 6).alias("t1"),
            quant(F.expr("percentile(s1, 2.0D/3.0D)"), 6).alias("t2"),
        )
    )

    def band(col: str):
        return (
            F.when(F.col(col) == 0, "none")
            .when(F.col(col) >= F.col("t2"), "high")
            .when(F.col(col) >= F.col("t1"), "mid")
            .otherwise("low")
        )

    mat = (
        spend.crossJoin(thr)
        .select(band("s1").alias("seg_from"), band("s2").alias("seg_to"))
        .groupBy("seg_from", "seg_to")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
    )
    w = Window.partitionBy("seg_from")
    return mat.select(
        "seg_from",
        "seg_to",
        "n_customers",
        quant(
            F.col("n_customers").cast("double") / F.sum("n_customers").over(w),
            6,
        ).alias("row_pct"),
    ).orderBy("seg_from", "seg_to")
