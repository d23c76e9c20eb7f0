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
