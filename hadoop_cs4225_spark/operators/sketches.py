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


#: Explicit Bloom-filter geometry for the decontamination audit:
#: _BLOOM_K seeded md5 hashes into _BLOOM_M bit positions. Sized so
#: the probe-shingle load factor produces a measurable-but-small
#: false-positive rate at the driver's sf0.01 (k*n/m ~ 0.2).
_BLOOM_M = 65_536
_BLOOM_K = 4


def _bloom_bucket_sql(expr: str, seed: int) -> str:
    """One seeded bit position (SQL side) — the single definition of
    the k/m/seed-range convention both Bloom queries share."""
    from hadoop_cs4225_spark.functions.hashing import hash60_seeded_sql

    return f"({hash60_seeded_sql(expr, seed)} % {_BLOOM_M})"


def _bloom_fan_sql(table: str, with_s: bool) -> str:
    """UNION ALL fanout of a CTE's ``s`` column over the k seeds."""
    cols = "s, " if with_s else ""
    return "\nUNION ALL\n".join(
        f"SELECT {cols}{_bloom_bucket_sql('s', d)} AS bucket FROM {table}"
        for d in range(1, _BLOOM_K + 1)
    )


def _bloom_fan(df: DataFrame) -> DataFrame:
    """Spark twin of :func:`_bloom_fan_sql`: ``(s, bucket)`` rows, one
    per seed."""
    from hadoop_cs4225_spark.functions.hashing import hash60_seeded

    return df.select(
        "s",
        F.explode(
            F.array(
                *[
                    (hash60_seeded(F.col("s"), d) % _BLOOM_M).alias("bucket")
                    for d in range(1, _BLOOM_K + 1)
                ]
            )
        ).alias("bucket"),
    )


def _bloom_audit_oracle() -> str:
    from hadoop_cs4225_spark.functions.hashing import hash60_seeded_sql
    from hadoop_cs4225_spark.functions.numeric import quant_sql
    from hadoop_cs4225_spark.operators.dedup import _SHINGLES_SQL, _TOKS_SQL
    from hadoop_cs4225_spark.operators.pipeline_ops import _PROBE_MOD

    probe_fan = _bloom_fan_sql("probe", with_s=False)
    cand_fan = _bloom_fan_sql("cand", with_s=True)
    # saturation t = 1 - exp(-k*n/m); fpr_theory = t^k via explicit
    # multiplication (cross-engine pow is not trusted; exp is the same
    # single libm call both engines already share in the perplexity
    # oracle)
    t = f"(1.0 - exp(-{_BLOOM_K}.0 * i.n_inserted / {_BLOOM_M}))"
    return f"""
WITH sh AS (
  SELECT doc_id, unnest(list_distinct({_SHINGLES_SQL})) AS s
  FROM (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents) t0
  WHERE len(toks) >= 3
), probe AS (
  SELECT DISTINCT s FROM sh WHERE doc_id % {_PROBE_MOD} = 0
), cand AS (
  SELECT DISTINCT s FROM sh WHERE doc_id % {_PROBE_MOD} <> 0
), bits AS (
  SELECT DISTINCT bucket FROM ({probe_fan})
), hits AS (
  SELECT c.s, CAST(COUNT(bt.bucket) AS BIGINT) AS k_hit
  FROM ({cand_fan}) c
  LEFT JOIN bits bt ON bt.bucket = c.bucket
  GROUP BY c.s
), verdicts AS (
  SELECT h.s, h.k_hit = {_BLOOM_K} AS bloom_pos,
         p.s IS NOT NULL AS is_member
  FROM hits h LEFT JOIN probe p ON p.s = h.s
), ins AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_inserted FROM probe),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates,
         CAST(SUM(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT)
           AS n_members,
         CAST(SUM(CASE WHEN bloom_pos THEN 1 ELSE 0 END) AS BIGINT)
           AS n_bloom_pos,
         CAST(SUM(CASE WHEN bloom_pos AND NOT is_member THEN 1 ELSE 0 END)
              AS BIGINT) AS n_false_pos,
         CAST(SUM(CASE WHEN is_member AND NOT bloom_pos THEN 1 ELSE 0 END)
              AS BIGINT) AS n_false_neg
  FROM verdicts
)
SELECT i.n_inserted, a.n_candidates, a.n_members, a.n_bloom_pos,
       a.n_false_pos, a.n_false_neg,
       {quant_sql(
           "CAST(a.n_false_pos AS DOUBLE)"
           " / (a.n_candidates - a.n_members)", 6)} AS fpr_measured,
       {quant_sql(f"{t} * {t} * {t} * {t}", 6)} AS fpr_theory
FROM agg a CROSS JOIN ins i
"""


@register("eval_bloom_decon_audit", oracle=_bloom_audit_oracle())
def eval_bloom_decon_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter from first principles (k=4 seeded md5 hashes into
    m=65536 bit positions) standing in for the decontamination
    probe-set membership test, audited against the exact semi-join:
    candidate corpus shingles vs eval-probe shingles, with measured
    false-positive rate next to the (1 - e^(-kn/m))^k theory line.
    The third "algorithm under the oracle gate" sketch (after the CMS
    and HLL audits): every bit position, verdict and rate is
    bit-identical in DuckDB.

    Bloom invariant pinned by construction and in tests: ZERO false
    negatives (n_false_neg = 0 — a member's k buckets are all set by
    its own insertion).

    Why it matters at 100 TB: the exact decontamination join shuffles
    every corpus shingle against the probe set; the Bloom bitset is
    ~8 KB broadcast to every executor, turning decontamination into a
    map-side filter with a quantified (and here MEASURED) FP budget —
    the audit tells you what fraction of clean docs an over-loaded
    filter would wrongly drop.

    Plan: probe fanout folds to <= m DISTINCT bit rows (broadcast);
    candidates fan out k rows each, join the bit table on the bucket
    key, and fold back to per-shingle verdicts in one partial-agg
    shuffle; the report is a 1-row aggregate.
    """
    from hadoop_cs4225_spark.functions.numeric import quant
    from hadoop_cs4225_spark.operators.dedup import shingle_postings_frame
    from hadoop_cs4225_spark.operators.pipeline_ops import _PROBE_MOD

    # Distinct shingles from the written postings layout (VERDICT r11
    # task 4) — no query-time tokenization.
    sh = shingle_postings_frame(spark, sf_dir)
    probe = (
        sh.where(F.col("doc_id") % _PROBE_MOD == 0).select("s").distinct()
    ).localCheckpoint(eager=False)  # bits fanout + exact join + count
    cand = sh.where(F.col("doc_id") % _PROBE_MOD != 0).select("s").distinct()

    bits = F.broadcast(_bloom_fan(probe).select("bucket").distinct())
    hits = (
        _bloom_fan(cand)
        .join(bits.withColumn("hit", F.lit(1)), "bucket", "left")
        .groupBy("s")
        .agg(F.count("hit").cast("long").alias("k_hit"))
    )
    verdicts = hits.join(
        probe.withColumn("mem", F.lit(1)), "s", "left"
    ).select(
        (F.col("k_hit") == _BLOOM_K).alias("bloom_pos"),
        F.col("mem").isNotNull().alias("is_member"),
    )
    ins = F.broadcast(
        probe.agg(F.count(F.lit(1)).cast("long").alias("n_inserted"))
    )
    agg = verdicts.agg(
        F.count(F.lit(1)).cast("long").alias("n_candidates"),
        F.sum(F.col("is_member").cast("long")).cast("long").alias("n_members"),
        F.sum(F.col("bloom_pos").cast("long")).cast("long").alias("n_bloom_pos"),
        F.sum((F.col("bloom_pos") & ~F.col("is_member")).cast("long"))
        .cast("long")
        .alias("n_false_pos"),
        F.sum((F.col("is_member") & ~F.col("bloom_pos")).cast("long"))
        .cast("long")
        .alias("n_false_neg"),
    )
    t = 1.0 - F.exp(
        F.lit(-float(_BLOOM_K)) * F.col("n_inserted") / _BLOOM_M
    )
    return agg.crossJoin(ins).select(
        "n_inserted",
        "n_candidates",
        "n_members",
        "n_bloom_pos",
        "n_false_pos",
        "n_false_neg",
        quant(
            F.col("n_false_pos").cast("double")
            / (F.col("n_candidates") - F.col("n_members")),
            6,
        ).alias("fpr_measured"),
        quant(t * t * t * t, 6).alias("fpr_theory"),
    )


def _bloom_pruned_decon_oracle() -> str:
    from hadoop_cs4225_spark.functions.hashing import hash60_seeded_sql
    from hadoop_cs4225_spark.operators.dedup import _SHINGLES_SQL, _TOKS_SQL
    from hadoop_cs4225_spark.operators.pipeline_ops import _PROBE_MOD

    probe_fan = _bloom_fan_sql("probe", with_s=False)
    cs_fan = _bloom_fan_sql("cs", with_s=True)
    return f"""
WITH sh AS (
  SELECT doc_id, unnest(list_distinct({_SHINGLES_SQL})) AS s
  FROM (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents) t0
  WHERE len(toks) >= 3
),
probe AS (SELECT DISTINCT s FROM sh WHERE doc_id % {_PROBE_MOD} = 0),
corpus AS (SELECT doc_id, s FROM sh WHERE doc_id % {_PROBE_MOD} <> 0),
cs AS (SELECT DISTINCT s FROM corpus),
bits AS (SELECT DISTINCT bucket FROM ({probe_fan})),
khit AS (
  SELECT c.s, CAST(COUNT(bt.bucket) AS BIGINT) AS k_hit
  FROM ({cs_fan}) c LEFT JOIN bits bt ON bt.bucket = c.bucket
  GROUP BY c.s
),
blooms AS (SELECT s FROM khit WHERE k_hit = {_BLOOM_K}),
cand AS (SELECT c.doc_id, c.s FROM corpus c JOIN blooms b ON b.s = c.s),
exact AS (
  SELECT ca.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_bloom_cand,
         CAST(COUNT(p.s) AS BIGINT) AS n_overlap
  FROM cand ca LEFT JOIN probe p ON p.s = ca.s
  GROUP BY ca.doc_id
),
tot AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles
  FROM corpus GROUP BY doc_id
)
SELECT t.doc_id, t.n_shingles, e.n_bloom_cand, e.n_overlap
FROM tot t JOIN exact e ON e.doc_id = t.doc_id
ORDER BY e.n_overlap DESC, e.n_bloom_cand DESC, t.doc_id
LIMIT 100
"""


@register("bloom_pruned_decon_docs", oracle=_bloom_pruned_decon_oracle())
def bloom_pruned_decon_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-PRUNED per-doc decontamination (VERDICT r12 task 7): the
    exact verify join of ``decontamination_overlap`` runs only over the
    Bloom-POSITIVE postings. The probe ("eval") shingle set folds to a
    <= m = 65536-row bit table broadcast to every executor; each
    distinct corpus shingle is classified map-side (all k = 4 seeded
    buckets hit); only positive postings enter the shingle-keyed exact
    join.
    Because a Bloom filter has ZERO false negatives, every truly
    overlapping shingle survives the prune — so ``n_overlap`` here is
    byte-identical to the unpruned exact join's (pinned against
    ``decontamination_overlap`` in tests/test_round13_ops.py), while
    the verify join's input shrinks from ALL postings to the
    Bloom-positive sliver (``n_bloom_cand`` vs ``n_shingles`` in the
    output is the measured prune ratio, FP overhang included).

    This is the 100 TB shape of decontamination: the corpus side reads
    the WRITTEN shingle postings layout (no re-tokenization), the eval
    side is a fixed tiny suite whose bitset ships with the job, and the
    expensive exact join touches only candidate docs. The companion
    corpus-level audit (``eval_bloom_decon_audit``) prices the FP rate;
    this query is the decon pass that spends it.

    Determinism: integer bucket algebra over the cross-engine seeded
    md5 hash; counts only; ordered (n_overlap desc, n_bloom_cand desc,
    doc_id) — doc_id unique, so the LIMIT cut is total.

    No reference analogue; extends the SURVEY §2 decon family (r13).
    """
    from hadoop_cs4225_spark.operators.dedup import shingle_postings_frame
    from hadoop_cs4225_spark.operators.pipeline_ops import _PROBE_MOD

    sh = shingle_postings_frame(spark, sf_dir)
    probe = (
        sh.where(F.col("doc_id") % _PROBE_MOD == 0).select("s").distinct()
    ).localCheckpoint(eager=False)  # bits fanout + exact verify join
    corpus = sh.where(F.col("doc_id") % _PROBE_MOD != 0)
    cs = corpus.select("s").distinct()

    bits = F.broadcast(_bloom_fan(probe).select("bucket").distinct())
    blooms = (
        _bloom_fan(cs)
        .join(bits.withColumn("hit", F.lit(1)), "bucket", "left")
        .groupBy("s")
        .agg(F.count("hit").alias("k_hit"))
        .where(F.col("k_hit") == _BLOOM_K)
        .select("s")
    )
    cand = corpus.join(blooms, "s")
    exact = (
        cand.join(probe.withColumn("mem", F.lit(1)), "s", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bloom_cand"),
            F.count("mem").cast("long").alias("n_overlap"),
        )
    )
    tot = corpus.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_shingles")
    )
    return (
        tot.join(exact, "doc_id")
        .select("doc_id", "n_shingles", "n_bloom_cand", "n_overlap")
        .orderBy(F.desc("n_overlap"), F.desc("n_bloom_cand"), "doc_id")
        .limit(100)
    )


#: Daily-HLL rollup geometry (small p so register collisions — and
#: therefore visible estimation error — appear even at sf0.001).
_DHLL_P = 6
_DHLL_M = 1 << _DHLL_P
_DHLL_SUFFIX = 60 - _DHLL_P
_DHLL_ALPHA = 0.7213 / (1 + 1.079 / _DHLL_M)
_DHLL_WINDOW = 7  # trailing days in the rolling union


def _daily_hll_oracle() -> str:
    from hadoop_cs4225_spark.functions.hashing import hash60_sql
    from hadoop_cs4225_spark.functions.numeric import quant_sql

    h = hash60_sql("CAST(user_id AS VARCHAR)")
    mask = (1 << _DHLL_SUFFIX) - 1
    alpha = f"CAST('{_DHLL_ALPHA!r}' AS DOUBLE)"

    def est(n_used: str, denom: str) -> str:
        raw = f"{alpha} * {_DHLL_M} * {_DHLL_M} / ({denom})"
        lin = f"{_DHLL_M} * LN({_DHLL_M} * 1.0 / ({_DHLL_M} - {n_used}))"
        return (
            f"CASE WHEN {raw} <= 2.5 * {_DHLL_M} AND {n_used} < {_DHLL_M}"
            f" THEN {lin} ELSE {raw} END"
        )

    return f"""
WITH ev AS (
  SELECT CAST(ts AS DATE) AS day,
         ({h} >> {_DHLL_SUFFIX}) AS bucket,
         CASE WHEN ({h} & {mask}) = 0 THEN {_DHLL_SUFFIX + 1}
              ELSE {_DHLL_SUFFIX + 1} - length(bin({h} & {mask}))
         END AS rank_b
  FROM events
), regs AS (
  SELECT day, bucket, MAX(rank_b) AS m_b FROM ev GROUP BY day, bucket
), days AS (SELECT DISTINCT day FROM regs),
roll AS (
  SELECT d.day, r.bucket, MAX(r.m_b) AS m_b
  FROM days d JOIN regs r
    ON r.day BETWEEN d.day - {_DHLL_WINDOW - 1} AND d.day
  GROUP BY d.day, r.bucket
), sday AS (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS used,
         SUM(POWER(2.0, -m_b)) + ({_DHLL_M} - COUNT(*)) * 1.0 AS denom
  FROM regs GROUP BY day
), sroll AS (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS used,
         SUM(POWER(2.0, -m_b)) + ({_DHLL_M} - COUNT(*)) * 1.0 AS denom
  FROM roll GROUP BY day
), xday AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_day
  FROM events GROUP BY day
), xroll AS (
  SELECT d.day, CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS exact_7d
  FROM days d JOIN events e
    ON CAST(e.ts AS DATE) BETWEEN d.day - {_DHLL_WINDOW - 1} AND d.day
  GROUP BY d.day
)
SELECT s.day, x.exact_day,
       {quant_sql(est("s.used", "s.denom"), 2)} AS hll_day,
       xr.exact_7d,
       {quant_sql(est("sr.used", "sr.denom"), 2)} AS hll_7d
FROM sday s
JOIN sroll sr USING (day)
JOIN xday x USING (day)
JOIN xroll xr USING (day)
ORDER BY s.day
"""


@register("events_daily_hll_rollup", oracle=_daily_hll_oracle())
def events_daily_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE mergeable-sketch rollup, fully under the oracle gate:
    per-day HyperLogLog registers (p=6, from the cross-engine md5
    hash) estimate daily distinct users, and a trailing-7-day
    register-wise MAX — the HLL union — answers "distinct users this
    week" WITHOUT re-touching raw events, next to both exact counts.
    ``sketch_distinct_users_by_type`` shows the native Datasketches
    path (rows-only); this builds the identical mergeability story
    from first principles so DuckDB reproduces every register, union
    and estimate bit-exactly.

    Why it matters at 100 TB: distinct-rollups are the canonical
    non-additive aggregate — a day×N matrix of exact distincts needs N
    passes, while the register table is 64 BIGINTs per day and ANY
    date-range union is a register MAX. The exact-7d side carries a
    |days| x |events-in-window| self-join precisely to show what the
    sketch replaces; the audit reports both so the p=6 error is
    measured.

    Plan: one scan builds (day, bucket, rank) rows folded by
    partial-agg MAX into <= 64 registers/day; the rolling union is a
    range join of the DAYS table (calendar-bounded) against the
    register table, re-folded by MAX.
    """
    from hadoop_cs4225_spark.functions.hashing import hash60
    from hadoop_cs4225_spark.functions.numeric import quant
    from hadoop_cs4225_spark.sources.tables import load_events

    ev = load_events(spark, sf_dir).select(
        F.to_date("ts").alias("day"), F.col("user_id")
    )
    h = hash60(F.col("user_id").cast("string"))
    mask = (1 << _DHLL_SUFFIX) - 1
    rank_b = F.when(h.bitwiseAND(F.lit(mask)) == 0, F.lit(_DHLL_SUFFIX + 1)).otherwise(
        F.lit(_DHLL_SUFFIX + 1) - F.length(F.bin(h.bitwiseAND(F.lit(mask))))
    )
    hashed = ev.select(
        "day", F.shiftright(h, _DHLL_SUFFIX).alias("bucket"), rank_b.alias("rank_b")
    )
    regs = hashed.groupBy("day", "bucket").agg(
        F.max("rank_b").alias("m_b")
    ).localCheckpoint(eager=False)  # day estimates + rolling union
    days = regs.select("day").distinct()
    roll = (
        days.alias("d")
        .join(
            regs.alias("r"),
            F.col("r.day").between(
                F.date_sub(F.col("d.day"), _DHLL_WINDOW - 1), F.col("d.day")
            ),
        )
        .groupBy(F.col("d.day").alias("day"), F.col("r.bucket").alias("bucket"))
        .agg(F.max("m_b").alias("m_b"))
    )

    def summarize(frame: DataFrame, used: str, denom: str) -> DataFrame:
        return frame.groupBy("day").agg(
            F.count(F.lit(1)).cast("long").alias(used),
            (
                F.sum(F.pow(F.lit(2.0), -F.col("m_b")))
                + (F.lit(_DHLL_M) - F.count(F.lit(1))) * 1.0
            ).alias(denom),
        )

    def est(used: F.Column, denom: F.Column) -> F.Column:
        raw = F.lit(_DHLL_ALPHA) * _DHLL_M * _DHLL_M / denom
        lin = F.lit(float(_DHLL_M)) * F.log(
            F.lit(float(_DHLL_M)) / (F.lit(_DHLL_M) - used)
        )
        return F.when(
            (raw <= 2.5 * _DHLL_M) & (used < _DHLL_M), lin
        ).otherwise(raw)

    sday = summarize(regs, "used_d", "denom_d")
    sroll = summarize(roll, "used_r", "denom_r")
    xday = ev.groupBy("day").agg(
        F.countDistinct("user_id").cast("long").alias("exact_day")
    )
    xroll = (
        days.alias("d")
        .join(
            ev.alias("e"),
            F.col("e.day").between(
                F.date_sub(F.col("d.day"), _DHLL_WINDOW - 1), F.col("d.day")
            ),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.countDistinct("e.user_id").cast("long").alias("exact_7d"))
    )
    return (
        sday.join(sroll, "day")
        .join(xday, "day")
        .join(xroll, "day")
        .select(
            "day",
            "exact_day",
            quant(est(F.col("used_d"), F.col("denom_d")), 2).alias("hll_day"),
            "exact_7d",
            quant(est(F.col("used_r"), F.col("denom_r")), 2).alias("hll_7d"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Round-8 batch 3: KMV (k-minimum-values / theta) distinct sketch audit
# ---------------------------------------------------------------------------

#: Sketch size: the k smallest hash values summarize the set.
_KMV_K = 64
#: Hash domain size (hash60 is uniform on [0, 2^60)).
_KMV_DOMAIN = 1 << 60


def _kmv_oracle() -> str:
    from hadoop_cs4225_spark.functions.hashing import hash60_sql
    from hadoop_cs4225_spark.functions.numeric import quant_sql

    h = hash60_sql("CAST(user_id AS VARCHAR) || '|' || strftime(ts, '%Y-%m-%d')")
    est = (
        f"CASE WHEN n_kept < {_KMV_K} THEN n_kept * 1.0 "
        f"ELSE ({_KMV_K} - 1) * CAST({_KMV_DOMAIN} AS DOUBLE) / kth END"
    )
    return f"""
WITH ud AS (
  SELECT DISTINCT event_type, {h} AS h FROM events
), kept AS (
  SELECT event_type, h FROM (
    SELECT event_type, h,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
    FROM ud) z
  WHERE rn <= {_KMV_K}
), sk AS (
  SELECT event_type AS scope, CAST(COUNT(*) AS BIGINT) AS n_kept,
         MAX(h) AS kth
  FROM kept GROUP BY event_type
  UNION ALL
  SELECT '__union__', CAST(COUNT(*) AS BIGINT), MAX(h) FROM (
    SELECT DISTINCT h FROM kept ORDER BY h LIMIT {_KMV_K}) u
), ex AS (
  SELECT event_type AS scope, CAST(COUNT(*) AS BIGINT) AS n_exact
  FROM ud GROUP BY event_type
  UNION ALL
  SELECT '__union__', CAST(COUNT(DISTINCT h) AS BIGINT) FROM ud
), est AS (
  SELECT s.scope, e.n_exact, {quant_sql(est, 2)} AS kmv_est
  FROM sk s JOIN ex e USING (scope)
)
SELECT scope, n_exact, kmv_est,
       {quant_sql("abs(kmv_est - n_exact) / n_exact", 4)} AS rel_err
FROM est
ORDER BY scope
"""


@register("kmv_distinct_sketch_audit", oracle=_kmv_oracle())
def kmv_distinct_sketch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values, the theta-sketch core) distinct-count
    sketch from first principles, audited against exact counts: the k
    smallest md5-derived hashes of each event type's (user, day) keys
    estimate its distinct user-days as (k-1)*2^60/h_(k), and the UNION
    row is estimated purely by MERGING the per-type sketches (k
    smallest of the k-min sets) — never re-touching raw events. The
    third mergeable-sketch audit (CMS counts, HLL cardinality rolls,
    KMV adds SET ALGEBRA: theta sketches support union/intersection,
    which HLL registers cannot).

    Exactness: hashes are exact BIGINTs; the k-th order statistic is
    deterministic; the only doubles are the final estimator division
    and rel_err, both quantized. Small-set honesty: a scope with fewer
    than k distinct keys stores them all, so the sketch returns the
    EXACT count (rel_err 0) — pinned in tests.

    Plan: distinct-fold the (type, hash) stream (map-side combined),
    then a per-type ROW_NUMBER window — partitioned by type, the
    relational spelling of "keep a k-heap per group"; a real cluster
    aggregator would fold the heap in partial aggregation, but the
    sort stays inside each type's partition, never global. The merge
    step touches 5k rows.

    No reference analogue; completes the SURVEY §2 sketches family.
    """
    from pyspark.sql import Window

    from hadoop_cs4225_spark.functions.hashing import hash60
    from hadoop_cs4225_spark.functions.numeric import quant

    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "event_type",
        hash60(
            F.concat(
                F.col("user_id").cast("string"),
                F.lit("|"),
                F.date_format("ts", "yyyy-MM-dd"),
            )
        ).alias("h"),
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    kept = (
        ud.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _KMV_K)
        .drop("rn")
    )
    per = kept.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.max("h").alias("kth"),
    ).select(F.col("event_type").alias("scope"), "n_kept", "kth")
    uni = (
        kept.select("h")
        .distinct()
        .orderBy("h")
        .limit(_KMV_K)
        .agg(F.count(F.lit(1)).cast("long").alias("n_kept"), F.max("h").alias("kth"))
        .select(F.lit("__union__").alias("scope"), "n_kept", "kth")
    )
    sk = per.unionByName(uni)
    ex = ud.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact")
    ).select(F.col("event_type").alias("scope"), "n_exact").unionByName(
        ud.select("h")
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
        .select(F.lit("__union__").alias("scope"), "n_exact")
    )
    est_c = F.when(
        F.col("n_kept") < _KMV_K, F.col("n_kept") * 1.0
    ).otherwise(
        (_KMV_K - 1) * F.lit(float(_KMV_DOMAIN)) / F.col("kth")
    )
    est = sk.join(ex, "scope").select(
        "scope", "n_exact", quant(est_c, 2).alias("kmv_est")
    )
    return est.select(
        "scope",
        "n_exact",
        "kmv_est",
        quant(F.abs(F.col("kmv_est") - F.col("n_exact")) / F.col("n_exact"), 4).alias(
            "rel_err"
        ),
    ).orderBy("scope")


#: Count-Sketch geometry (same d x w as the CMS for a like-for-like
#: audit) and the seed namespace (distinct from the CMS rows so the
#: two sketches never share hash functions).
_CSK_D = 3
_CSK_W = 256
_CSK_SEED0 = 10


def _csk_audit_oracle() -> str:
    from hadoop_cs4225_spark.functions.hashing import hash60_seeded_sql
    from hadoop_cs4225_spark.functions.numeric import quant_sql

    def h(seed: int) -> str:
        return hash60_seeded_sql("CAST(user_id AS VARCHAR)", seed)

    rows = "\nUNION ALL\n".join(
        f"SELECT user_id, xc, {d} AS d,"
        f" ({h(_CSK_SEED0 + d)} % {_CSK_W}) AS bucket,"
        f" (1 - 2 * (({h(_CSK_SEED0 + d)} // {_CSK_W}) % 2)) AS sign"
        " FROM exact"
        for d in range(1, _CSK_D + 1)
    )
    return f"""
WITH exact AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS xc
  FROM events GROUP BY user_id
), ud AS (
{rows}
), cells AS (
  SELECT d, bucket, CAST(SUM(sign * xc) AS BIGINT) AS cell
  FROM ud GROUP BY d, bucket
), est3 AS (
  SELECT u.user_id, ANY_VALUE(u.xc) AS xc,
         CAST(SUM(u.sign * c.cell) AS BIGINT) AS s,
         CAST(MAX(u.sign * c.cell) AS BIGINT) AS mx,
         CAST(MIN(u.sign * c.cell) AS BIGINT) AS mn
  FROM ud u JOIN cells c ON c.d = u.d AND c.bucket = u.bucket
  GROUP BY u.user_id
), est AS (
  SELECT user_id, xc, s - mx - mn AS est FROM est3
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN est = xc THEN 1 ELSE 0 END) AS BIGINT)
         AS n_exact,
       {quant_sql(
           "SUM(CASE WHEN est = xc THEN 1 ELSE 0 END) * 1.0 / COUNT(*)",
           6)} AS pct_exact,
       CAST(MAX(abs(est - xc)) AS BIGINT) AS max_abs_err,
       {quant_sql("SUM(abs(est - xc)) * 1.0 / COUNT(*)", 6)} AS avg_abs_err,
       {quant_sql("SUM(est - xc) * 1.0 / COUNT(*)", 6)} AS avg_signed_err
FROM est
"""


@register("user_freq_countsketch_audit", oracle=_csk_audit_oracle())
def user_freq_countsketch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Sketch (d=3 signed hash rows x w=256 buckets, median-of-3
    estimate) over per-user event counts, audited against the exact
    counts. The UNBIASED counterpart of ``user_freq_cms_audit``: CMS
    collisions only ever ADD (one-sided overestimate), while
    Count-Sketch's random signs cancel collisions in expectation — the
    audit shows it (``avg_signed_err`` ~ 0 where the CMS's
    ``avg_overestimate`` is strictly positive) at the price of
    two-sided noise (``max_abs_err``). The pair is the textbook
    bias/variance trade a pipeline reads before picking its frequency
    sketch.

    Determinism: everything is exact BIGINT arithmetic — md5-derived
    buckets and signs, integer cells, and the median of three integers
    computed order-free as sum - max - min.

    Plan: sketch build is d map-side-combined aggregates over the
    per-user rollup (d*w = 768 cells at any scale); the audit joins
    users to cells on (d, bucket) — broadcastable, never quadratic. At
    100 TB the 768-cell table IS the sketch you ship; the exact side
    exists only to measure it.

    No reference analogue; extends the SURVEY §2 sketch family.
    """
    from hadoop_cs4225_spark.functions.hashing import hash60_seeded
    from hadoop_cs4225_spark.functions.numeric import quant

    ev = load_table(spark, sf_dir, "events")
    exact = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("xc"))
        .localCheckpoint(eager=False)  # feeds the d sketch rows + audit
    )
    uds = []
    for d in range(1, _CSK_D + 1):
        h = hash60_seeded(
            F.col("user_id").cast("string"), _CSK_SEED0 + d
        )
        uds.append(
            exact.select(
                "user_id",
                "xc",
                F.lit(d).alias("d"),
                (h % _CSK_W).alias("bucket"),
                # sign bit = (h // w) % 2, computed as a SHIFT so the
                # 60-bit hash never passes through a double (w = 2^8)
                (1 - 2 * F.shiftright(h, 8).bitwiseAND(F.lit(1))).alias(
                    "sign"
                ),
            )
        )
    ud = uds[0]
    for u in uds[1:]:
        ud = ud.unionByName(u)
    ud = ud.localCheckpoint(eager=False)  # feeds cells + estimates
    cells = ud.groupBy("d", "bucket").agg(
        F.sum(F.col("sign") * F.col("xc")).cast("long").alias("cell")
    )
    est3 = (
        ud.join(F.broadcast(cells), ["d", "bucket"])
        .groupBy("user_id")
        .agg(
            F.first("xc").alias("xc"),
            F.sum(F.col("sign") * F.col("cell")).cast("long").alias("s"),
            F.max(F.col("sign") * F.col("cell")).cast("long").alias("mx"),
            F.min(F.col("sign") * F.col("cell")).cast("long").alias("mn"),
        )
    )
    est = est3.select(
        "user_id", "xc", (F.col("s") - F.col("mx") - F.col("mn")).alias("est")
    )
    err = F.col("est") - F.col("xc")
    return est.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum((err == 0).cast("long")).cast("long").alias("n_exact"),
        quant(
            F.sum((err == 0).cast("long")) * 1.0 / F.count(F.lit(1)), 6
        ).alias("pct_exact"),
        F.max(F.abs(err)).cast("long").alias("max_abs_err"),
        quant(F.sum(F.abs(err)) * 1.0 / F.count(F.lit(1)), 6).alias(
            "avg_abs_err"
        ),
        quant(F.sum(err) * 1.0 / F.count(F.lit(1)), 6).alias(
            "avg_signed_err"
        ),
    )


# ---------------------------------------------------------------------------
# Round-11: KMV (theta) sketch INTERSECTION audit — sketch set algebra
# ---------------------------------------------------------------------------


def _kmv_inter_oracle() -> str:
    from hadoop_cs4225_spark.functions.hashing import hash60_sql
    from hadoop_cs4225_spark.functions.numeric import quant_sql

    h = hash60_sql(
        "CAST(user_id AS VARCHAR) || '|' || strftime(ts, '%Y-%m-%d')"
    )
    return f"""
WITH ud AS MATERIALIZED (
  SELECT DISTINCT event_type, {h} AS h FROM events
), kept AS MATERIALIZED (
  SELECT event_type, h FROM (
    SELECT event_type, h,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
    FROM ud) z
  WHERE rn <= {_KMV_K}
), theta AS MATERIALIZED (
  SELECT event_type,
         CASE WHEN COUNT(*) < {_KMV_K}
              THEN CAST({_KMV_DOMAIN} AS BIGINT) ELSE MAX(h) END AS th,
         CAST(COUNT(*) AS BIGINT) AS n_kept
  FROM kept GROUP BY event_type
), pair_theta AS MATERIALIZED (
  SELECT a.event_type AS t1, b.event_type AS t2,
         LEAST(a.th, b.th) AS th
  FROM theta a JOIN theta b ON a.event_type < b.event_type
), inter_s AS (
  SELECT p.t1, p.t2, CAST(COUNT(*) AS BIGINT) AS n_inter_sample
  FROM pair_theta p
  JOIN kept ka ON ka.event_type = p.t1 AND ka.h < p.th
  JOIN kept kb ON kb.event_type = p.t2 AND kb.h = ka.h
  GROUP BY p.t1, p.t2
), exact AS (
  SELECT a.event_type AS t1, b.event_type AS t2,
         CAST(COUNT(*) AS BIGINT) AS n_exact
  FROM ud a JOIN ud b
    ON a.h = b.h AND a.event_type < b.event_type
  GROUP BY t1, t2
)
SELECT p.t1 AS type_a, p.t2 AS type_b,
       COALESCE(e.n_exact, 0) AS n_exact_inter,
       {quant_sql(
           "COALESCE(i.n_inter_sample, 0)"
           f" * (CAST({_KMV_DOMAIN} AS DOUBLE) / p.th)", 2)}
         AS kmv_inter_est
FROM pair_theta p
LEFT JOIN inter_s i ON i.t1 = p.t1 AND i.t2 = p.t2
LEFT JOIN exact e ON e.t1 = p.t1 AND e.t2 = p.t2
ORDER BY type_a, type_b
"""


@register("kmv_intersection_audit", oracle=_kmv_inter_oracle())
def kmv_intersection_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch SET INTERSECTION from the same KMV sketches as
    ``kmv_distinct_sketch_audit``: for every event-type pair, theta =
    min of the two sketches' k-th minima, the intersection sample =
    kept hashes below theta present in BOTH sketches, and the estimate
    = sample_count * domain/theta — audited against the exact
    (user, day) intersection. Union is what HLL can also do; this is
    the operation ONLY theta-family sketches support, and the reason a
    pipeline keeps KMV sketches per segment: overlap matrices between
    audiences without re-touching raw events.

    Exactness: hashes, thetas and sample counts are exact BIGINTs
    (small-set honesty: a type with < k distinct keys has theta =
    domain, so its intersections are computed on the FULL key set and
    the estimate is exact); the only double is the final estimator
    division, quantized at 2 dp.

    Plan: the sketch build is the KMV audit's per-type partitioned
    top-k; pair enumeration is a |types|^2-bounded dictionary join;
    the exact side is one hash-keyed equi-join (the expensive
    ground-truth step a production pipeline would SKIP — it exists
    here because this is an audit).

    No reference analogue; completes the SURVEY §2 sketches family's
    set algebra.
    """
    from pyspark.sql import Window

    from hadoop_cs4225_spark.functions.hashing import hash60
    from hadoop_cs4225_spark.functions.numeric import quant

    ev = load_table(spark, sf_dir, "events")
    ud = (
        ev.select(
            "event_type",
            hash60(
                F.concat(
                    F.col("user_id").cast("string"),
                    F.lit("|"),
                    F.date_format("ts", "yyyy-MM-dd"),
                )
            ).alias("h"),
        )
        .distinct()
        .localCheckpoint(eager=False)  # sketch build + exact side
    )
    w = Window.partitionBy("event_type").orderBy("h")
    kept = (
        ud.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _KMV_K)
        .drop("rn")
        .localCheckpoint(eager=False)  # theta + both pair probes
    )
    theta = kept.groupBy("event_type").agg(
        F.when(F.count(F.lit(1)) < _KMV_K, F.lit(_KMV_DOMAIN).cast("long"))
        .otherwise(F.max("h"))
        .alias("th")
    )
    ta = theta.select(
        F.col("event_type").alias("t1"), F.col("th").alias("th1")
    )
    tb = theta.select(
        F.col("event_type").alias("t2"), F.col("th").alias("th2")
    )
    pair_theta = (
        ta.join(tb, F.col("t1") < F.col("t2"))
        .select("t1", "t2", F.least("th1", "th2").alias("th"))
    )
    ka = kept.select(F.col("event_type").alias("t1"), F.col("h").alias("ha"))
    kb = kept.select(F.col("event_type").alias("t2"), F.col("h").alias("hb"))
    inter_s = (
        pair_theta.join(ka, "t1")
        .where(F.col("ha") < F.col("th"))
        .join(kb, (kb["t2"] == pair_theta["t2"]) & (kb["hb"] == F.col("ha")))
        .groupBy("t1", pair_theta["t2"])
        .agg(F.count(F.lit(1)).cast("long").alias("n_inter_sample"))
    )
    ua = ud.select(F.col("event_type").alias("t1"), F.col("h").alias("h"))
    ub = ud.select(F.col("event_type").alias("t2"), F.col("h").alias("h2"))
    exact = (
        ua.join(
            ub, (F.col("h") == F.col("h2")) & (F.col("t1") < F.col("t2"))
        )
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
    )
    return (
        pair_theta.join(inter_s, ["t1", "t2"], "left")
        .join(exact, ["t1", "t2"], "left")
        .select(
            F.col("t1").alias("type_a"),
            F.col("t2").alias("type_b"),
            F.coalesce(F.col("n_exact"), F.lit(0).cast("long")).alias(
                "n_exact_inter"
            ),
            quant(
                F.coalesce(
                    F.col("n_inter_sample"), F.lit(0).cast("long")
                )
                * (F.lit(float(_KMV_DOMAIN)) / F.col("th")),
                2,
            ).alias("kmv_inter_est"),
        )
        .orderBy("type_a", "type_b")
    )
