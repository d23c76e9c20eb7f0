"""Mergeable sketches — the 100 TB distinct-counting path.

``approx_count_distinct`` (relational.py) answers one query; Datasketches
HLL sketches go further: the SKETCH itself is a column you can store,
re-aggregate and union across partitions/days without touching raw data
— the idiom for incremental rollups (sketch per day-partition, union for
any date range in milliseconds).

No DuckDB oracle: estimates depend on each engine's sketch internals by
design (registered rows-only; the driver records a row-count/schema
check). The estimates ARE deterministic for a fixed input and asserted
against exact counts within HLL error bounds in tests/test_sketches.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_cs4225_spark.registry import register
from hadoop_cs4225_spark.sources.tables import load_table


@register("sketch_distinct_users_by_type")  # no oracle: engine-specific sketch
def sketch_distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct users via Datasketches HLL, plus the
    union-of-sketches total — demonstrating MERGEABILITY, which plain
    approx_count_distinct lacks.

    Plan shape: one partial-aggregated shuffle builds per-type sketches;
    the union re-aggregates those few sketch BLOBs (bytes, not rows).
    At 100 TB the per-type (or per-day) sketches are persisted and any
    rollup is sketch-union only.
    """
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", 12).alias("sketch")
    )
    typed = per_type.select(
        "event_type",
        F.hll_sketch_estimate("sketch").alias("approx_users"),
    )
    total = per_type.agg(F.hll_union_agg("sketch").alias("u")).select(
        F.lit("ALL").alias("event_type"),
        F.hll_sketch_estimate("u").alias("approx_users"),
    )
    return typed.unionByName(total).orderBy("event_type")


@register("topk_users_approx")  # no oracle: tie order inside the sketch merge
def topk_users_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters per event type via ``approx_top_k``.

    The streaming-friendly top-k: each partition tracks a bounded
    item->count map (maxItemsTracked=10000), maps merge associatively
    — one partial-agg shuffle, constant memory, no global sort. Below
    the tracking bound the counts are exact; only the tie order at the
    k-boundary is engine-specific (hence rows-only; exactness vs a full
    groupBy is pinned in tests/test_sketches.py).

    Output is FLAT — one row per (event_type, rank, user_id, n) via
    posexplode with a deterministic re-sort inside each type's top-k
    set ((n desc, user_id) total order). The earlier array<struct>
    shape broke the driver canonicalizer (pandas can't factorize list
    cells); flat scalar columns are the registry-wide contract,
    enforced by tests/test_output_shapes.py.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.expr("approx_top_k(user_id, 3, 10000)").alias("top"))
        .select(
            "event_type",
            F.posexplode(
                F.expr(
                    "array_sort(top, (a, b) -> CASE WHEN a.count > b.count THEN -1 "
                    "WHEN a.count < b.count THEN 1 "
                    "WHEN a.item < b.item THEN -1 "
                    "WHEN a.item > b.item THEN 1 ELSE 0 END)"
                )
            ).alias("pos", "x"),
        )
        .select(
            "event_type",
            (F.col("pos") + 1).alias("rank"),
            F.col("x.item").alias("user_id"),
            F.col("x.count").alias("n"),
        )
        .orderBy("event_type", "rank")
    )


@register("event_freq_cms")  # no oracle: sketch bytes are engine-specific
def event_freq_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min frequency sketch per event type (eps=1%, conf=95%).

    The CMS answers "how often does key X occur" with bounded memory
    and +eps*N one-sided error; adds are commutative sums so the
    merged sketch bytes are deterministic for a fixed seed regardless
    of partitioning. Store the blob per day/type, merge for any range
    — same mergeability story as the HLL rollup. Point estimates are
    asserted against exact counts in tests/test_sketches.py.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.expr("hex(count_min_sketch(user_id, 0.01d, 0.95d, 42))").alias(
                "cms_hex"
            ),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


#: Explicit count-min sketch geometry: d hash rows x w buckets. Unlike
#: `event_freq_cms` (Spark's opaque native sketch blob), this CMS is
#: built from the cross-engine md5 hash family, so the DuckDB oracle
#: reproduces every cell and estimate bit-exactly.
_CMS_D = 3
_CMS_W = 256


def _cms_audit_oracle() -> str:
    from hadoop_cs4225_spark.functions.hashing import hash60_seeded_sql
    from hadoop_cs4225_spark.functions.numeric import quant_sql

    def b(seed: int, expr: str) -> str:
        return f"({hash60_seeded_sql(expr, seed)} % {_CMS_W})"

    sketch_rows = "\nUNION ALL\n".join(
        f"SELECT {d} AS d, {b(d, 'CAST(user_id AS VARCHAR)')} AS bucket"
        " FROM events"
        for d in range(1, _CMS_D + 1)
    )
    user_rows = "\nUNION ALL\n".join(
        f"SELECT user_id, xc, {d} AS d,"
        f" {b(d, 'CAST(user_id AS VARCHAR)')} AS bucket FROM exact"
        for d in range(1, _CMS_D + 1)
    )
    return f"""
WITH cms AS (
  SELECT d, bucket, CAST(COUNT(*) AS BIGINT) AS c
  FROM ({sketch_rows}) s
  GROUP BY d, bucket
), exact AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS xc
  FROM events GROUP BY user_id
), ud AS (
{user_rows}
), est AS (
  SELECT u.user_id, ANY_VALUE(u.xc) AS xc,
         CAST(MIN(c.c) AS BIGINT) AS est
  FROM ud u JOIN cms c ON c.d = u.d AND c.bucket = u.bucket
  GROUP BY u.user_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN est = xc THEN 1 ELSE 0 END) AS BIGINT)
         AS n_exact,
       {quant_sql(
           "SUM(CASE WHEN est = xc THEN 1 ELSE 0 END) * 1.0 / COUNT(*)",
           6)} AS pct_exact,
       CAST(MAX(est - xc) AS BIGINT) AS max_overestimate,
       {quant_sql("SUM(est - xc) * 1.0 / COUNT(*)", 6)} AS avg_overestimate
FROM est
"""


@register("user_freq_cms_audit", oracle=_cms_audit_oracle())
def user_freq_cms_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch built from first principles (d=3 md5 hash rows
    x w=256 buckets) over per-user event counts, audited against the
    exact counts: how many users the sketch answers exactly, and the
    max/mean one-sided overestimate. The cross-engine twin of
    `event_freq_cms` (whose native Spark sketch blob no SQL oracle can
    reproduce): here every cell, estimate and error statistic is
    bit-identical in DuckDB, so the ALGORITHM itself is under the
    oracle gate — and the audit is what a deployment tracks to size
    (d, w) against its real key skew.

    CMS invariant pinned in tests: estimates NEVER undercount
    (est = min over d rows of the user's bucket counts, each of which
    includes all of the user's own events).

    Plan: the sketch build is a d-way row fanout folded by ONE
    partial-agg groupBy into d*w = 768 cells (map-side combine does
    the heavy lifting; the shuffle moves at most 768 rows per
    partition); estimates join the bounded user domain x d rows
    against the broadcast-size cell table; the report is a 1-row
    aggregate. At 100 TB: one scan, constant-size state — the sketch
    IS the bounded-memory answer to per-key counting.
    """
    from hadoop_cs4225_spark.functions.hashing import hash60_seeded

    ev = load_table(spark, sf_dir, "events")
    uid = F.col("user_id").cast("string")

    def bucket(d: int) -> F.Column:
        return (hash60_seeded(uid, d) % _CMS_W).alias("bucket")

    hashed = ev.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(d).alias("d"), bucket(d))
                    for d in range(1, _CMS_D + 1)
                ]
            )
        ).alias("h")
    ).select("h.d", "h.bucket")
    cms = F.broadcast(
        hashed.groupBy("d", "bucket").agg(
            F.count(F.lit(1)).cast("long").alias("c")
        )
    )
    exact = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("xc")
    )
    ud = exact.select(
        "user_id",
        "xc",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(d).alias("d"), bucket(d))
                    for d in range(1, _CMS_D + 1)
                ]
            )
        ).alias("h"),
    ).select("user_id", "xc", "h.d", "h.bucket")
    est = (
        ud.join(cms, ["d", "bucket"])
        .groupBy("user_id")
        .agg(F.first("xc").alias("xc"), F.min("c").cast("long").alias("est"))
    )
    from hadoop_cs4225_spark.functions.numeric import quant

    return est.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum((F.col("est") == F.col("xc")).cast("long"))
        .cast("long")
        .alias("n_exact"),
        quant(
            F.sum((F.col("est") == F.col("xc")).cast("long"))
            * 1.0
            / F.count(F.lit(1)),
            6,
        ).alias("pct_exact"),
        F.max(F.col("est") - F.col("xc")).cast("long").alias(
            "max_overestimate"
        ),
        quant(
            F.sum(F.col("est") - F.col("xc")) * 1.0 / F.count(F.lit(1)), 6
        ).alias("avg_overestimate"),
    )


#: Explicit HyperLogLog geometry: top _HLL_P hash bits pick the
#: register, the remaining 52 bits feed the leading-zero rank.
_HLL_P = 8
_HLL_M = 1 << _HLL_P
_HLL_SUFFIX_BITS = 60 - _HLL_P
_HLL_ALPHA = 0.7213 / (1 + 1.079 / _HLL_M)


def _hll_audit_oracle() -> str:
    from hadoop_cs4225_spark.functions.hashing import hash60_sql
    from hadoop_cs4225_spark.functions.numeric import quant_sql

    h = hash60_sql("CAST(user_id AS VARCHAR)")
    mask = (1 << _HLL_SUFFIX_BITS) - 1
    # CAST through VARCHAR: a bare 17-digit double literal would parse
    # via DECIMAL in DuckDB and drop the last ulp (numeric.py note)
    alpha = f"CAST('{_HLL_ALPHA!r}' AS DOUBLE)"
    return f"""
WITH regs AS (
  SELECT ({h} >> {_HLL_SUFFIX_BITS}) AS bucket,
         MAX(CASE WHEN ({h} & {mask}) = 0 THEN {_HLL_SUFFIX_BITS + 1}
              ELSE {_HLL_SUFFIX_BITS + 1} - length(bin({h} & {mask}))
             END) AS m_b
  FROM events
  GROUP BY bucket
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_used,
         SUM(POWER(2.0, -m_b)) + ({_HLL_M} - COUNT(*)) * 1.0 AS denom
  FROM regs
), est AS (
  SELECT n_used,
         CASE WHEN {alpha} * {_HLL_M} * {_HLL_M} / denom <= 2.5 * {_HLL_M}
                   AND n_used < {_HLL_M}
              THEN {_HLL_M} * LN({_HLL_M} * 1.0 / ({_HLL_M} - n_used))
              ELSE {alpha} * {_HLL_M} * {_HLL_M} / denom
         END AS raw
  FROM s
), x AS (
  SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact FROM events
)
SELECT x.n_exact, est.n_used AS n_buckets_used,
       {quant_sql("est.raw", 2)} AS hll_estimate,
       {quant_sql("(est.raw - x.n_exact) / x.n_exact", 4)} AS rel_err
FROM est CROSS JOIN x
"""


@register("user_distinct_hll_audit", oracle=_hll_audit_oracle())
def user_distinct_hll_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog built from first principles (p=8: 256 registers off
    the top hash bits, leading-zero ranks off the remaining 52, the
    Flajolet alpha_m bias correction and the linear-counting
    small-range branch), audited against the exact distinct-user
    count. The distinct-counting twin of ``user_freq_cms_audit`` and
    the cross-engine counterpart of ``sketch_distinct_users_by_type``
    (whose Datasketches blob no oracle can reproduce): every register,
    the harmonic-mean estimate and the relative error reproduce
    bit-exactly in DuckDB — the sketch ALGORITHM under the oracle gate.

    Integer-safe rank: leading zeros derive from the BINARY STRING
    length of the 52-bit suffix (never floor(log2(x)), whose float
    boundary behavior differs between engines at exact powers of two).
    POWER(2, -m_b) values are exact IEEE powers of two.

    Plan: one partial-agg groupBy into <=256 register cells (duplicate
    adds are max-idempotent, so map-side combine collapses everything
    locally), one exact countDistinct for the audit comparison, two
    1-row frames cross-joined. At 100 TB the sketch side stays 256
    cells whatever the cardinality — the audit's exact side is the
    expensive one, which is precisely the point of keeping the sketch.
    """
    from hadoop_cs4225_spark.functions.hashing import hash60
    from hadoop_cs4225_spark.functions.numeric import quant

    ev = load_table(spark, sf_dir, "events")
    h = hash60(F.col("user_id").cast("string"))
    mask = (1 << _HLL_SUFFIX_BITS) - 1
    suffix = h.bitwiseAND(F.lit(mask))
    rank = F.when(suffix == 0, F.lit(_HLL_SUFFIX_BITS + 1)).otherwise(
        F.lit(_HLL_SUFFIX_BITS + 1) - F.length(F.bin(suffix))
    )
    regs = (
        ev.select(
            F.shiftright(h, _HLL_SUFFIX_BITS).alias("bucket"),
            rank.alias("r"),
        )
        .groupBy("bucket")
        .agg(F.max("r").alias("m_b"))
    )
    s = regs.agg(
        F.count(F.lit(1)).cast("long").alias("n_used"),
        (
            F.sum(F.pow(F.lit(2.0), -F.col("m_b")))
            + (_HLL_M - F.count(F.lit(1))) * 1.0
        ).alias("denom"),
    )
    raw_hll = F.lit(_HLL_ALPHA) * _HLL_M * _HLL_M / F.col("denom")
    est = s.select(
        "n_used",
        F.when(
            (raw_hll <= 2.5 * _HLL_M) & (F.col("n_used") < _HLL_M),
            _HLL_M * F.log(_HLL_M * 1.0 / (_HLL_M - F.col("n_used"))),
        )
        .otherwise(raw_hll)
        .alias("raw"),
    )
    x = ev.agg(F.countDistinct("user_id").cast("long").alias("n_exact"))
    return est.crossJoin(F.broadcast(x)).select(
        "n_exact",
        F.col("n_used").alias("n_buckets_used"),
        quant(F.col("raw"), 2).alias("hll_estimate"),
        quant((F.col("raw") - F.col("n_exact")) / F.col("n_exact"), 4).alias(
            "rel_err"
        ),
    )
