"""Training-data pipeline operators beyond dedup/similarity: benchmark
decontamination, repetition-quality signals, dataset profiling, time-spine
gap-fill, and batch upsert/merge.

These are the remaining first-class ops a 100 TB pretraining-data build
runs between raw ingest and tokenization:

- **decontamination** — remove benchmark/eval text from the training
  corpus by n-gram overlap (the standard contamination check: shingle
  both sides, join on shingle, score overlap per training doc);
- **repetition signals** — Gopher-style quality heuristics (top-token
  fraction, type-token ratio, top-bigram fraction) that flag
  boilerplate/spam docs;
- **profiling** — per-column null/distinct/min/max report over a table
  (the data-quality gate before a run);
- **gap-fill** — calendar-spine left join so time-bucketed rollups emit
  zero rows for empty buckets (hypertable-rollup semantics);
- **upsert/merge** — latest-version-wins batch merge (the engine-level
  pattern under storage MERGE INTO).

Scale notes per query docstring. No reference analogue (the reference
is two MapReduce jobs — `WordCount.java`, `TopkCommonWords.java`);
these extend the driver-mandated LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_cs4225_spark.functions.hashing import hash60, hash60_sql
from hadoop_cs4225_spark.functions.numeric import quant, quant_sql, rsum
from hadoop_cs4225_spark.operators.dedup import (
    NEWCRAWL_MIN_SRC,
    SRC_NO_SQL,
    _SHINGLES_SQL,
    _TOKS_SQL,
    _shingles,
    _toks,
    shingle_postings_frame,
    shingle_postings_stats_frame,
    src_no_col,
)
from hadoop_cs4225_spark.operators.sampling import TRAIN_PCT
from hadoop_cs4225_spark.registry import register
from hadoop_cs4225_spark.sources.tables import load_events, load_table

#: Every 97th doc plays the "benchmark/eval set" role in the
#: decontamination check (deterministic, schema-free stand-in for the
#: external eval corpora a real pipeline loads as a side input).
_PROBE_MOD = 97


@register(
    "decontamination_overlap",
    oracle=f"""
WITH sh AS (
  SELECT doc_id, unnest(list_distinct({_SHINGLES_SQL})) AS s
  FROM (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents) t0
  WHERE len(toks) >= 3
),
probe AS (SELECT DISTINCT s FROM sh WHERE doc_id % {_PROBE_MOD} = 0),
corpus AS (SELECT doc_id, s FROM sh WHERE doc_id % {_PROBE_MOD} <> 0),
stats AS (
  SELECT c.doc_id,
         COUNT(*) AS n_shingles,
         COUNT(p.s) AS n_overlap
  FROM corpus c LEFT JOIN probe p ON c.s = p.s
  GROUP BY c.doc_id
)
SELECT doc_id, n_shingles, n_overlap,
       {quant_sql('CAST(n_overlap AS DOUBLE) / n_shingles', 4)} AS overlap_frac
FROM stats
WHERE n_overlap > 0
ORDER BY overlap_frac DESC, doc_id
LIMIT 100
""",
)
def decontamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: per-doc distinct-3-gram overlap with a
    probe ("eval") document set, top contaminated docs first.

    Plan at 100 TB: shingling is a flatMap; the overlap is ONE
    shuffle-join keyed on the shingle string between the corpus
    (doc_id, shingle) rows and the probe shingle set, followed by a
    partial-aggregated groupBy(doc_id). Real eval suites are tiny and
    fixed-size, so the probe side is broadcast-able in production — here
    it is derived from the same table (grows with SF), so the join is
    left un-hinted and AQE picks the strategy. Hot shingles (stopword
    runs) are AQE-skew-split; n-gram length 3 keeps selectivity high.
    """
    # Distinct shingles come from the written postings layout
    # (dedup.ensure_shingle_sets, VERDICT r11 task 4) — a map-side
    # explode over stored arrays, no query-time tokenization.
    sh = shingle_postings_frame(spark, sf_dir)
    probe = sh.where(F.col("doc_id") % _PROBE_MOD == 0).select("s").distinct()
    corpus = sh.where(F.col("doc_id") % _PROBE_MOD != 0)
    hits = (
        corpus.join(probe.withColumn("hit", F.lit(1)), "s", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("hit").alias("n_overlap"),
        )
    )
    return (
        hits.where(F.col("n_overlap") > 0)
        .select(
            "doc_id",
            "n_shingles",
            "n_overlap",
            quant(F.col("n_overlap").cast("double") / F.col("n_shingles"), 4).alias(
                "overlap_frac"
            ),
        )
        .orderBy(F.desc("overlap_frac"), "doc_id")
        .limit(100)
    )


#: New-crawl source threshold (src16..19 vs the src0..15 train corpus),
#: shared with the dedup layer's near-dup ingest gate (defined there so
#: its oracle can interpolate it); a >=25% shingle-overlap doc is
#: flagged contaminated (integer-exact threshold: 4*hits >= shingles).
_NEWCRAWL_MIN_SRC = NEWCRAWL_MIN_SRC


@register(
    "cross_corpus_decon_report",
    oracle=f"""
WITH sh AS (
  SELECT doc_id, unnest(list_distinct({_SHINGLES_SQL})) AS s
  FROM (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents) t0
  WHERE len(toks) >= 3
),
src AS (
  SELECT doc_id, source, {SRC_NO_SQL} AS src_no
  FROM documents
),
train AS (
  SELECT DISTINCT sh.s FROM sh
  JOIN src ON src.doc_id = sh.doc_id
  WHERE src.src_no < {_NEWCRAWL_MIN_SRC}
),
newdocs AS (
  SELECT sh.doc_id, src.source, sh.s FROM sh
  JOIN src ON src.doc_id = sh.doc_id
  WHERE src.src_no >= {_NEWCRAWL_MIN_SRC}
),
per_doc AS (
  SELECT n.doc_id, n.source,
         COUNT(*) AS n_sh, COUNT(t.s) AS n_hit
  FROM newdocs n LEFT JOIN train t ON t.s = n.s
  GROUP BY n.doc_id, n.source
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN n_hit > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_docs_overlap,
       CAST(SUM(CASE WHEN 4 * n_hit >= n_sh THEN 1 ELSE 0 END) AS BIGINT)
         AS n_docs_contaminated,
       CAST(SUM(n_sh) AS BIGINT) AS n_shingles,
       CAST(SUM(n_hit) AS BIGINT) AS n_hits,
       {quant_sql('CAST(SUM(n_hit) AS DOUBLE) / SUM(n_sh)', 4)}
         AS hit_frac
FROM per_doc
GROUP BY source
ORDER BY source
""",
)
def cross_corpus_decon_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-CORPUS incremental decontamination (VERDICT r12 task 7):
    the new-crawl sources (``src16..src19``) checked against the
    existing train corpus's (``src0..src15``) shingle vocabulary —
    per new source, how many incoming docs overlap the train corpus at
    all and how many cross the 25% contamination threshold
    (integer-exact: ``4*hits >= shingles``).

    This is ``decontamination_overlap`` turned incremental: there the
    probe set is a tiny fixed eval suite; here the REFERENCE side is
    the full already-ingested corpus and the probe side is the new
    batch. Both sides read the WRITTEN shingle postings layout
    (``dedup.ensure_shingle_postings``) — at 100 TB the train side is
    exactly the index the streaming twin
    (``streaming.run_incremental_shingle_postings``) maintains batch
    over batch, so admitting a new crawl shingles ONLY the batch and
    runs one shingle-keyed join against the maintained index; nothing
    over the existing corpus is recomputed.

    Plan: postings ⋈ documents(doc_id → source) is a doc-keyed join
    (narrow dimension columns only); the train vocabulary is a
    distinct over the train-side postings; the decon join is
    shingle-keyed with AQE handling skew (hot boilerplate shingles);
    the report is a per-source partial agg. No windows, no cartesian.

    Determinism: counts and an integer threshold; quantized ratio;
    ordered by source.

    No reference analogue; extends the SURVEY §2 decon family (r13).
    """
    sh = shingle_postings_frame(spark, sf_dir)
    src = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", src_no_col().alias("src_no")
    )
    tagged = sh.join(src, "doc_id")
    train = (
        tagged.where(F.col("src_no") < _NEWCRAWL_MIN_SRC)
        .select("s")
        .distinct()
    )
    newdocs = tagged.where(F.col("src_no") >= _NEWCRAWL_MIN_SRC)
    per_doc = (
        newdocs.join(train.withColumn("hit", F.lit(1)), "s", "left")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_sh"),
            F.count("hit").alias("n_hit"),
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum((F.col("n_hit") > 0).cast("long"))
            .cast("long")
            .alias("n_docs_overlap"),
            F.sum((4 * F.col("n_hit") >= F.col("n_sh")).cast("long"))
            .cast("long")
            .alias("n_docs_contaminated"),
            F.sum("n_sh").cast("long").alias("n_shingles"),
            F.sum("n_hit").cast("long").alias("n_hits"),
            quant(
                F.sum("n_hit").cast("double") / F.sum("n_sh"), 4
            ).alias("hit_frac"),
        )
        .orderBy("source")
    )


@register(
    "doc_repetition_signals",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(toks) AS t
  FROM (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents) t0
  WHERE len(toks) >= 2
),
uni AS (
  SELECT doc_id, SUM(c) AS n_tokens, COUNT(*) AS n_types, MAX(c) AS top_cnt
  FROM (SELECT doc_id, t, COUNT(*) AS c FROM toks GROUP BY doc_id, t) u
  GROUP BY doc_id
),
big AS (
  SELECT doc_id, SUM(c) AS n_bigrams, MAX(c) AS top_big_cnt
  FROM (
    SELECT doc_id, b, COUNT(*) AS c
    FROM (
      SELECT doc_id,
             unnest(list_transform(range(1, len(toks)),
                    i -> toks[i] || ' ' || toks[i+1])) AS b
      FROM (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents) t0
      WHERE len(toks) >= 2
    ) g
    GROUP BY doc_id, b
  ) gb
  GROUP BY doc_id
)
SELECT u.doc_id,
       CAST(u.n_tokens AS BIGINT) AS n_tokens,
       {quant_sql('CAST(u.n_types AS DOUBLE) / u.n_tokens', 4)} AS type_token_ratio,
       {quant_sql('CAST(u.top_cnt AS DOUBLE) / u.n_tokens', 4)} AS top_token_frac,
       {quant_sql('CAST(b.top_big_cnt AS DOUBLE) / b.n_bigrams', 4)} AS top_bigram_frac
FROM uni u JOIN big b ON u.doc_id = b.doc_id
ORDER BY u.doc_id
""",
)
def doc_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition/quality signals per document: type-token
    ratio, most-frequent-token fraction, most-frequent-bigram fraction.

    Filtering rule of thumb from the Gopher/MassiveText paper: drop docs
    whose top 2-gram exceeds ~20% of the text or whose TTR collapses.
    Plan: two partial-aggregated shuffles keyed on (doc_id, gram) then
    (doc_id) — both map-side combined, no row ever leaves its doc's
    partition twice. At 100 TB this is the same two-shuffle shape per
    signal family; signals join 1:1 on doc_id.
    """
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", _toks().alias("toks")).where(F.size("toks") >= 2)
    uni = (
        base.select("doc_id", F.explode("toks").alias("t"))
        .groupBy("doc_id", "t")
        .count()
        .groupBy("doc_id")
        .agg(
            F.sum("count").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_types"),
            F.max("count").alias("top_cnt"),
        )
    )
    bigrams = F.transform(
        F.sequence(F.lit(0), F.size("toks") - 2),
        lambda i: F.concat_ws(
            " ", F.element_at("toks", i + 1), F.element_at("toks", i + 2)
        ),
    )
    big = (
        base.select("doc_id", F.explode(bigrams).alias("b"))
        .groupBy("doc_id", "b")
        .count()
        .groupBy("doc_id")
        .agg(F.sum("count").alias("n_bigrams"), F.max("count").alias("top_big_cnt"))
    )
    return (
        uni.join(big, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            quant(F.col("n_types").cast("double") / F.col("n_tokens"), 4).alias(
                "type_token_ratio"
            ),
            quant(F.col("top_cnt").cast("double") / F.col("n_tokens"), 4).alias(
                "top_token_frac"
            ),
            quant(
                F.col("top_big_cnt").cast("double") / F.col("n_bigrams"), 4
            ).alias("top_bigram_frac"),
        )
        .orderBy("doc_id")
    )


#: (column, kind) pairs for the orders profile; kind picks the
#: cross-engine-stable string rendering of min/max.
_PROFILE_COLS = (
    ("o_orderkey", "int"),
    ("o_custkey", "int"),
    ("o_totalprice", "num"),
    ("o_orderstatus", "str"),
    ("o_orderpriority", "str"),
    ("o_orderdate", "date"),
)


def _render_agg(c: F.Column, kind: str) -> F.Column:
    if kind == "num":
        return F.format_string("%.2f", c)
    if kind == "date":
        return F.date_format(c, "yyyy-MM-dd")
    return c.cast("string")


def _render(col: str, kind: str) -> F.Column:
    return _render_agg(F.col(col), kind)


def _render_sql(expr: str, kind: str) -> str:
    if kind == "num":
        return f"printf('%.2f', {expr})"
    if kind == "date":
        return f"strftime({expr}, '%Y-%m-%d')"
    return f"CAST({expr} AS VARCHAR)"


def _profile_plan(orders: DataFrame, distinct_agg) -> DataFrame:
    """Shared one-scan profile shape: a single wide aggregate computes
    every column's stats, then `stack` pivots the 1-row result to long
    form (stack is a projection — no extra job, nothing driver-side)."""
    aggs = []
    for col, kind in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{col}__rows"),
            (F.count(F.lit(1)) - F.count(col)).alias(f"{col}__null"),
            distinct_agg(col).alias(f"{col}__distinct"),
            F.min(col).alias(f"{col}__min_raw"),
            F.max(col).alias(f"{col}__max_raw"),
        ]
    wide = orders.agg(*aggs)
    stack_args = []
    for col, kind in _PROFILE_COLS:
        stack_args += [
            F.lit(col),
            F.col(f"{col}__rows"),
            F.col(f"{col}__null"),
            F.col(f"{col}__distinct"),
            _render(f"{col}__min_raw", kind),
            _render(f"{col}__max_raw", kind),
        ]
    n = len(_PROFILE_COLS)
    return (
        wide.select(
            F.stack(
                F.lit(n),
                *stack_args,
            ).alias("column_name", "n_rows", "n_null", "n_distinct", "min_s", "max_s")
        )
        .orderBy("column_name")
    )


@register("orders_profile")  # no oracle: HLL estimates are engine-specific;
# accuracy is rsd-pinned against the exact twin in tests/test_pipeline_profile.py
def orders_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset profiling: one row per column with null count, distinct
    count (approximate), and min/max — the pre-training data-quality
    report, in ONE scan.

    This is the registered 100 TB default: ``approx_count_distinct``
    (HyperLogLog++, rsd 0.05) keeps the multi-column aggregate a plain
    one-pass partial agg. The exact variant (``orders_profile_exact``)
    needs Spark's `expand` — the scan is replicated once per DISTINCT
    column (6x rows into the shuffle here), which round-2 benchmarks
    showed dominating the suite (8.45 s, 2.3x the runner-up) — so exact
    is the bounded audit twin, not the default. n_distinct is an
    estimate; the rsd bound is pinned in tests against the exact twin.
    """
    orders = load_table(spark, sf_dir, "orders")
    return _profile_plan(
        orders, lambda c: F.approx_count_distinct(c, rsd=0.05)
    )


@register(
    "orders_profile_exact",
    oracle="\nUNION ALL\n".join(
        f"""
SELECT '{col}' AS column_name,
       COUNT(*) AS n_rows,
       COUNT(*) - COUNT({col}) AS n_null,
       COUNT(DISTINCT {col}) AS n_distinct,
       {_render_sql(f"MIN({col})", kind)} AS min_s,
       {_render_sql(f"MAX({col})", kind)} AS max_s
FROM orders"""
        for col, kind in _PROFILE_COLS
    )
    + "\nORDER BY column_name",
)
def orders_profile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-distinct audit twin of ``orders_profile``.

    Round-2 bench showed the naive shape — COUNT(DISTINCT) over six
    columns in ONE aggregate — is the wrong exact plan at scale: Spark
    rewrites it to an `expand` that replicates every scan row 6x into
    the shuffle (8.45 s, 2.3x the suite runner-up). This version unions
    six per-column branches instead; each branch scans ONLY its column
    (parquet column pruning), does a map-side-combined groupBy(col), and
    folds the grouped counts into the profile row:

        n_rows = SUM(cnt), n_null = SUM(cnt) WHERE col IS NULL,
        n_distinct = COUNT(col)  (non-null group keys),
        min/max over the group keys (pre-deduped, tiny).

    Six pruned single-column scans replace one full-width scan expanded
    6x — strictly less shuffle volume, and each branch is an independent
    stage a scheduler can overlap. ``orders_profile`` (HLL, one pass)
    stays the wide-table 100 TB default; this is the exact audit run.
    """
    orders = load_table(spark, sf_dir, "orders")
    parts = []
    for col, kind in _PROFILE_COLS:
        grouped = (
            orders.select(col)
            .groupBy(col)
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        parts.append(
            grouped.agg(
                F.lit(col).alias("column_name"),
                F.sum("cnt").alias("n_rows"),
                F.coalesce(
                    F.sum(F.when(F.col(col).isNull(), F.col("cnt"))), F.lit(0)
                ).alias("n_null"),
                F.count(col).alias("n_distinct"),
                _render_agg(F.min(col), kind).alias("min_s"),
                _render_agg(F.max(col), kind).alias("max_s"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("column_name")


@register(
    "events_gapfill_daily",
    oracle=f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         COUNT(*) AS n_events,
         ROUND(SUM(value), 2) AS total_value
  FROM events GROUP BY 1
),
spine AS (
  SELECT unnest(generate_series(
           (SELECT MIN(day) FROM daily),
           (SELECT MAX(day) FROM daily),
           INTERVAL 1 DAY))::DATE AS day
)
SELECT s.day,
       COALESCE(d.n_events, 0) AS n_events,
       COALESCE(d.total_value, 0.0) AS total_value
FROM spine s LEFT JOIN daily d ON s.day = d.day
ORDER BY s.day
""",
)
def events_gapfill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style daily rollup with calendar gap-fill: every day
    between min and max emits a row, zero-filled when no events landed.

    Plan: the rollup is one partial-aggregated shuffle keyed on day; the
    spine is `sequence(min_day, max_day)` exploded from the rollup's own
    1-row bounds aggregate — O(days) rows, broadcast side of the final
    left join. At 100 TB the rollup side stays the only big shuffle; a
    calendar spine never grows with data volume, only with time range.
    """
    ev = load_events(spark, sf_dir)
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        rsum("value").alias("total_value"),
    )
    bounds = daily.agg(F.min("day").alias("mn"), F.max("day").alias("mx"))
    spine = bounds.select(
        F.explode(F.sequence("mn", "mx", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    return (
        spine.join(daily, "day", "left")
        .select(
            "day",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("total_value", F.lit(0.0)).alias("total_value"),
        )
        .orderBy("day")
    )


@register(
    "orders_upsert_merge",
    oracle="""
WITH updates AS (
  SELECT o_orderkey, o_orderstatus,
         o_totalprice * 1.1 AS o_totalprice, 2 AS version
  FROM orders WHERE o_orderkey % 10 = 0
),
unioned AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice, 1 AS version FROM orders
  UNION ALL
  SELECT o_orderkey, o_orderstatus, o_totalprice, version FROM updates
),
latest AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY o_orderkey ORDER BY version DESC) AS rn
    FROM unioned
  ) WHERE rn = 1
)
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CASE WHEN version = 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_updated,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM latest
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def orders_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch upsert (MERGE/SCD latest-version-wins) as an engine
    pattern: union base + changes, keep ROW_NUMBER()=1 per key by
    descending version, then aggregate the merged state.

    This is what a storage-layer MERGE INTO lowers to without a
    transactional table format: one shuffle keyed on the merge key for
    the window dedup, then the usual agg. At 100 TB the win is
    pre-bucketing base and updates on o_orderkey so the window runs
    shuffle-free (see tests/test_bucketing.py for the bucketed-join
    twin of this layout).
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    base = orders.withColumn("version", F.lit(1))
    updates = (
        orders.where(F.col("o_orderkey") % 10 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") * 1.1)
        .withColumn("version", F.lit(2))
    )
    w = Window.partitionBy("o_orderkey").orderBy(F.desc("version"))
    latest = (
        base.unionByName(updates)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
    )
    return (
        latest.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.when(F.col("version") == 2, 1).otherwise(0)).alias("n_updated"),
            rsum("o_totalprice").alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "events_cohort_retention",
    oracle="""
WITH activity AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
cohorts AS (
  SELECT user_id, MIN(day) AS cohort_day FROM activity GROUP BY user_id
)
SELECT c.cohort_day,
       date_diff('day', c.cohort_day, a.day) AS day_offset,
       COUNT(DISTINCT a.user_id) AS n_active
FROM activity a JOIN cohorts c USING (user_id)
WHERE date_diff('day', c.cohort_day, a.day) <= 14
GROUP BY c.cohort_day, day_offset
ORDER BY c.cohort_day, day_offset
""",
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen day, active
    user counts per day-offset for two weeks.

    The standard product-analytics rollup. Plan: one distinct shuffle on
    (user, day), one partial-agg shuffle on user for cohort assignment,
    one shuffle-join back on user (both sides already partitioned by
    user after the first two — at scale co-partitioning makes the join
    local), final partial-agg on (cohort, offset). countDistinct here is
    exact; at 100 TB swap for approx_count_distinct per cell.
    """
    ev = load_events(spark, sf_dir)
    activity = ev.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    cohorts = activity.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        activity.join(cohorts, "user_id")
        .select(
            "cohort_day",
            F.datediff("day", "cohort_day").alias("day_offset"),
            "user_id",
        )
        .where(F.col("day_offset") <= 14)
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .orderBy("cohort_day", "day_offset")
    )


#: Document-frequency band for the sparse-similarity postings join:
#: df=1 shingles cannot co-occur (dropped from the join, kept in norms);
#: df>20 shingles are boilerplate whose postings-list square blows up the
#: join (the Bayardo all-pairs prune) and whose idf carries no signal.
_SIM_DF_MAX = 20


@register(
    "shingle_idf_similarity_topk",
    oracle=f"""
WITH sh AS (
  SELECT doc_id, unnest(list_distinct({_SHINGLES_SQL})) AS s
  FROM (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents) t0
  WHERE len(toks) >= 3
),
dfreq AS (SELECT s, COUNT(*) AS df FROM sh GROUP BY s),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
w AS (
  SELECT sh.doc_id, sh.s, dfreq.df,
         {quant_sql("ln((n_docs + 1.0) / (df + 1.0))", 6)} AS w
  FROM sh JOIN dfreq USING (s) CROSS JOIN n
  WHERE dfreq.df <= {_SIM_DF_MAX}
),
norms AS (
  SELECT doc_id, SQRT(ROUND(SUM(w * w), 6)) AS nrm FROM w GROUP BY doc_id
),
dots AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, ROUND(SUM(a.w * b.w), 6) AS dot
  FROM (SELECT * FROM w WHERE df >= 2) a
  JOIN (SELECT * FROM w WHERE df >= 2) b
    ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT d1, d2, {quant_sql("dot / (n1.nrm * n2.nrm)", 6)} AS cos_sim
FROM dots
JOIN norms n1 ON n1.doc_id = d1
JOIN norms n2 ON n2.doc_id = d2
WHERE {quant_sql("dot / (n1.nrm * n2.nrm)", 6)} >= 0.3
ORDER BY cos_sim DESC, d1, d2
LIMIT 50
""",
)
def shingle_idf_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse all-pairs document similarity: idf-weighted cosine over
    distinct-3-gram vectors, via a postings-list self-join on shingle.

    The sparse counterpart to the dense ANN family: no signatures, no
    buckets — candidates come from the inverted index itself, with the
    Bayardo-style df prune making the join sum(df^2)-bounded instead of
    n^2 (shingles with df=1 cannot produce a pair; df>{df_max} shingles
    are boilerplate with ~zero idf — both dropped from the join, norms
    keep the full df<= {df_max} space). Plan: tokenize flatMap, df
    partial-agg, postings equi-join keyed on shingle (AQE splits hot
    shingles), pair partial-agg, two 1:1 norm joins, distributed top-k.
    """
    docs = load_table(spark, sf_dir, "documents")
    # Postings WITH stored df from the written inverted index (VERDICT
    # r11 task 4) — the idf weight is a map-side expression, no df
    # aggregate or join at query time.
    shd = shingle_postings_stats_frame(spark, sf_dir)
    # The corpus size enters the idf as a broadcast 1-row aggregate
    # (bounded — the hint is safe), NOT a driver-side .count(): a scalar
    # count would run an extra job per invocation and serialize the DAG.
    n_docs = F.broadcast(docs.agg(F.count(F.lit(1)).alias("n_docs")))
    # The weighted-postings frame feeds THREE consumers (the norm
    # aggregate and both sides of the pair self-join). It used to be
    # localCheckpointed to amortize the tokenize→explode→df-join
    # chain; now each consumer re-runs a map-side scan+filter over the
    # written index — cheaper than the checkpoint write was.
    w = (
        shd.join(n_docs)
        .where(F.col("df") <= _SIM_DF_MAX)
        .select(
            "doc_id",
            "s",
            "df",
            quant(
                F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)), 6
            ).alias("w"),
        )
    )
    norms = w.groupBy("doc_id").agg(
        F.sqrt(F.round(F.sum(F.col("w") * F.col("w")), 6)).alias("nrm")
    )
    kept = w.where(F.col("df") >= 2)
    a = kept.select(F.col("doc_id").alias("d1"), "s", F.col("w").alias("w1"))
    b = kept.select(F.col("doc_id").alias("d2"), "s", F.col("w").alias("w2"))
    dots = (
        a.join(b, "s")
        .where(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.round(F.sum(F.col("w1") * F.col("w2")), 6).alias("dot"))
    )
    n1 = norms.select(F.col("doc_id").alias("d1"), F.col("nrm").alias("nrm1"))
    n2 = norms.select(F.col("doc_id").alias("d2"), F.col("nrm").alias("nrm2"))
    cos = quant(F.col("dot") / (F.col("nrm1") * F.col("nrm2")), 6)
    return (
        dots.join(n1, "d1")
        .join(n2, "d2")
        .where(cos >= 0.3)
        .select("d1", "d2", cos.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "d1", "d2")
        .limit(50)
    )


@register(
    "pii_redaction_scrub",
    oracle="""
WITH cards AS (
  SELECT c_mktsegment,
         'user ' || c_name || ' email c' || CAST(c_custkey AS VARCHAR)
           || '@example.com phone 555-'
           || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
           || ' segment ' || c_mktsegment AS card
  FROM customer
),
scrubbed AS (
  SELECT c_mktsegment, card,
         len(regexp_extract_all(card, '[a-z0-9]+@[a-z]+\\.com')) AS n_email,
         len(regexp_extract_all(card, '555-[0-9]{4}')) AS n_phone,
         regexp_replace(
           regexp_replace(card, '[a-z0-9]+@[a-z]+\\.com', '<EMAIL>', 'g'),
           '555-[0-9]{4}', '<PHONE>', 'g') AS redacted
  FROM cards
)
SELECT c_mktsegment,
       COUNT(*) AS n_cards,
       CAST(SUM(n_email) AS BIGINT) AS emails_found,
       CAST(SUM(n_phone) AS BIGINT) AS phones_found,
       CAST(SUM(CASE WHEN redacted LIKE '%@%'
                       OR redacted LIKE '%555-%' THEN 1 ELSE 0 END)
            AS BIGINT) AS leaks_after_scrub,
       MIN(redacted) AS sample_redacted
FROM scrubbed
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def pii_redaction_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction sweep: detect + scrub email/phone patterns, then
    audit that nothing leaked through — the privacy-filtering pass a
    training-data pipeline runs before anything ships.

    The synthetic corpus has no natural PII (word-salad text, digitless
    — a pattern scan over it would be the vacuous-green trap q11 fell
    into in round 2), so the query first CONSTRUCTS deterministic
    contact cards from `customer` (identical expression both engines),
    then runs the real scrubber: `regexp_count` per pattern and chained
    `regexp_replace` — all JVM-side codegen'd expressions, zero UDFs.
    The leak audit (`LIKE` over the redacted text) must be 0 — asserted
    by value, not just by shape. At 100 TB this is a pure map stage:
    no shuffle except the final per-segment rollup.
    """
    cust = load_table(spark, sf_dir, "customer")
    card = F.concat(
        F.lit("user "), F.col("c_name"),
        F.lit(" email c"), F.col("c_custkey").cast("string"),
        F.lit("@example.com phone 555-"),
        F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0"),
        F.lit(" segment "), F.col("c_mktsegment"),
    )
    email_pat = r"[a-z0-9]+@[a-z]+\.com"
    phone_pat = r"555-[0-9]{4}"
    scrubbed = cust.select(
        "c_mktsegment",
        card.alias("card"),
        F.regexp_count(card, F.lit(email_pat)).alias("n_email"),
        F.regexp_count(card, F.lit(phone_pat)).alias("n_phone"),
        F.regexp_replace(
            F.regexp_replace(card, email_pat, "<EMAIL>"),
            phone_pat,
            "<PHONE>",
        ).alias("redacted"),
    )
    leak = (
        F.col("redacted").like("%@%") | F.col("redacted").like("%555-%")
    ).cast("long")
    return (
        scrubbed.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cards"),
            F.sum("n_email").alias("emails_found"),
            F.sum("n_phone").alias("phones_found"),
            F.sum(leak).alias("leaks_after_scrub"),
            F.min("redacted").alias("sample_redacted"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "source_mixture_weights",
    oracle=f"""
WITH per_source AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars
  FROM documents GROUP BY source
),
shared AS (
  SELECT source, n_docs, total_chars,
         {quant_sql("CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER ()", 6)} AS share,
         POW(CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER (), 0.7) AS raw_w
  FROM per_source
)
SELECT source, n_docs, total_chars, share,
       {quant_sql("raw_w / SUM(raw_w) OVER ()", 6)} AS mix_weight
FROM shared
ORDER BY source
""",
)
def source_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture sampling weights: temperature-reweighted source
    proportions (share^0.7, renormalized) — the mixing step that decides
    how much of each domain a pretraining run samples (upweights tail
    domains relative to raw frequency, as in multilingual/multi-corpus
    training recipes).

    Plan: one partial-agg shuffle to per-source counts, then TWO global
    normalizations. Each normalizer is a broadcast 1-row aggregate
    joined back in — NOT an unpartitioned window, which would force the
    per-source relation through a single-partition exchange (and spam
    `WindowExec: No Partition Defined` even when provably tiny). The
    oracle says `OVER ()` purely for SQL brevity; on rows-per-source
    (dozens) the two formulations are value-identical.
    """
    docs = load_table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )
    tot_docs = per_source.agg(F.sum("n_docs").alias("all_docs"))
    share = F.col("n_docs").cast("double") / F.col("all_docs")
    shared = per_source.crossJoin(F.broadcast(tot_docs)).select(
        "source",
        "n_docs",
        "total_chars",
        quant(share, 6).alias("share"),
        F.pow(share, 0.7).alias("raw_w"),
    )
    tot_w = shared.agg(F.sum("raw_w").alias("all_w"))
    return (
        shared.crossJoin(F.broadcast(tot_w))
        .select(
            "source",
            "n_docs",
            "total_chars",
            "share",
            quant(F.col("raw_w") / F.col("all_w"), 6).alias("mix_weight"),
        )
        .orderBy("source")
    )


#: Sequence-packing geometry: chunk length and stride in TOKENS.
_CHUNK_LEN = 64
_CHUNK_STRIDE = 48


@register(
    "doc_chunk_windows",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_SQL} AS toks,
         len({_TOKS_SQL}) AS n_tokens
  FROM documents
),
chunks AS (
  SELECT doc_id, n_tokens, CAST(g.k AS INT) AS chunk_no,
         toks AS tk
  FROM toks, LATERAL (
    SELECT unnest(range(0,
      1 + CAST(ceil(greatest(0, n_tokens - {_CHUNK_LEN}) / {_CHUNK_STRIDE}.0)
          AS BIGINT))) AS k) g
)
SELECT doc_id, chunk_no,
       CAST(least({_CHUNK_LEN}, n_tokens - {_CHUNK_STRIDE} * chunk_no) AS INT)
         AS chunk_len,
       array_to_string(
         list_slice(tk, {_CHUNK_STRIDE} * chunk_no + 1,
                    {_CHUNK_STRIDE} * chunk_no + 3), ' ') AS head3
FROM chunks
ORDER BY doc_id, chunk_no
""",
)
def doc_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: split each document's token stream into
    fixed-length training windows ({_CHUNK_LEN} tokens) with stride
    {_CHUNK_STRIDE} (16-token overlap) — the chunking step between
    curation and tokenized-example writing in a pretraining pipeline.

    Pure expressions: `sequence`+`posexplode` replicate each doc row
    once per window and `slice` cuts the token array — no UDF, no
    shuffle except the output sort; window rows distribute evenly
    across executors regardless of document length skew (the token-
    level analogue of media_frame_chunks' byte framing).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", _toks().alias("tk"), F.size(_toks()).alias("n_tokens")
    )
    n_chunks = (
        F.ceil(
            F.greatest(F.lit(0), F.col("n_tokens") - _CHUNK_LEN)
            / float(_CHUNK_STRIDE)
        ).cast("long")
        + 1
    )
    chunks = toks.select(
        "doc_id",
        "n_tokens",
        "tk",
        F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_no", "k"),
    )
    return (
        chunks.select(
            "doc_id",
            F.col("chunk_no").cast("int").alias("chunk_no"),
            F.least(
                F.lit(_CHUNK_LEN),
                F.col("n_tokens") - _CHUNK_STRIDE * F.col("k"),
            )
            .cast("int")
            .alias("chunk_len"),
            F.array_join(
                F.slice(
                    F.col("tk"),
                    _CHUNK_STRIDE * F.col("k") + 1,
                    3,
                ),
                " ",
            ).alias("head3"),
        )
        .orderBy("doc_id", "chunk_no")
    )


@register(
    "orders_cdc_apply",
    oracle="""
WITH changelog AS (
  -- deterministic synthetic CDC feed: every 7th key updated (v2),
  -- every 13th deleted (v3) — deletes win over updates on overlap
  SELECT o_orderkey, o_orderstatus, o_totalprice * 1.2 AS o_totalprice,
         'U' AS op, 2 AS version
  FROM orders WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT o_orderkey, o_orderstatus, o_totalprice, 'D' AS op, 3 AS version
  FROM orders WHERE o_orderkey % 13 = 0
),
unioned AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice, 'I' AS op, 1 AS version
  FROM orders
  UNION ALL
  SELECT * FROM changelog
),
latest AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY o_orderkey ORDER BY version DESC) AS rn
    FROM unioned
  ) WHERE rn = 1
)
SELECT o_orderstatus,
       COUNT(*) AS n_live,
       CAST(SUM(CASE WHEN op = 'U' THEN 1 ELSE 0 END) AS BIGINT) AS n_updated,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM latest
WHERE op <> 'D'
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def orders_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a CDC changelog (insert/update/DELETE ops with versions)
    to a base snapshot — the missing half of ``orders_upsert_merge``:
    deletes are TOMBSTONES that must win the per-key version race and
    then drop out of the live state, exactly what MERGE INTO ... WHEN
    MATCHED AND op='D' THEN DELETE lowers to without a transactional
    table format.

    One shuffle keyed on the merge key resolves the whole race
    (ROW_NUMBER by version desc), the tombstone filter is a map-side
    predicate after it, and the live-state aggregate rides the same
    exchange. At 100 TB, bucket base and changelog on the key and the
    window runs shuffle-free; periodic compaction folds tombstones
    away (the snapshot-rewrite the incremental-dedup index documents).
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    base = orders.select(
        "*", F.lit("I").alias("op"), F.lit(1).alias("version")
    )
    updates = (
        orders.where(F.col("o_orderkey") % 7 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") * 1.2)
        .select("*", F.lit("U").alias("op"), F.lit(2).alias("version"))
    )
    deletes = orders.where(F.col("o_orderkey") % 13 == 0).select(
        "*", F.lit("D").alias("op"), F.lit(3).alias("version")
    )
    w = Window.partitionBy("o_orderkey").orderBy(F.desc("version"))
    latest = (
        base.unionByName(updates)
        .unionByName(deletes)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .where(F.col("op") != "D")
    )
    return (
        latest.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_live"),
            F.sum((F.col("op") == "U").cast("long")).cast("bigint").alias(
                "n_updated"
            ),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "eval_ngram_novelty",
    oracle=f"""
WITH sh AS (
  SELECT doc_id, unnest(list_distinct({_SHINGLES_SQL})) AS s
  FROM (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents) t0
  WHERE len(toks) >= 3
), lab AS (
  SELECT doc_id, s,
         ({hash60_sql("CAST(doc_id AS VARCHAR)")} % 100 < {TRAIN_PCT})
           AS is_train
  FROM sh
), train AS (
  SELECT DISTINCT s FROM lab WHERE is_train
), test AS (
  SELECT doc_id, s FROM lab WHERE NOT is_train
), st AS (
  SELECT t.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_shingles,
         CAST(COUNT(*) - COUNT(tr.s) AS BIGINT) AS n_novel
  FROM test t LEFT JOIN train tr ON t.s = tr.s
  GROUP BY t.doc_id
)
SELECT doc_id, n_shingles, n_novel,
       {quant_sql("CAST(n_novel AS DOUBLE) / n_shingles", 4)} AS novelty_frac
FROM st
ORDER BY novelty_frac, doc_id
LIMIT 100
""",
)
def eval_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memorization risk of the eval split: for every TEST document
    (the registered hash-based 90/10 split — same membership expression
    as ``documents_split_stats``), the fraction of its distinct
    3-grams NOT seen anywhere in the TRAIN split. Least-novel docs
    first: a test doc whose n-grams are nearly all in train measures
    the train set, not the model — the eval-integrity twin of
    ``decontamination_overlap`` (which looks corpus -> external probe;
    this looks train -> eval across the pipeline's OWN split).

    Plan: shingling is a flatMap; ONE shingle-keyed join between the
    test stream and the distinct train shingle set (hot stopword
    shingles AQE-skew-split), one partial-agg groupBy(doc_id), a
    distributed bottom-k. Split membership is a per-row hash
    expression — no split table to join."""
    # Postings from the written shingle-set layout (VERDICT r11 task
    # 4); both split sides scan the same column-pruned parquet, so the
    # checkpoint that amortized the regex shingling is gone with it.
    sh = shingle_postings_frame(spark, sf_dir).withColumn(
        "is_train",
        hash60(F.col("doc_id").cast("string")) % 100 < TRAIN_PCT,
    )
    train = sh.where(F.col("is_train")).select("s").distinct()
    test = sh.where(~F.col("is_train")).select("doc_id", "s")
    st = (
        test.join(train.withColumn("hit", F.lit(1)), "s", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            (F.count(F.lit(1)) - F.count("hit")).cast("long").alias("n_novel"),
        )
    )
    return (
        st.select(
            "doc_id",
            "n_shingles",
            "n_novel",
            quant(
                F.col("n_novel").cast("double") / F.col("n_shingles"), 4
            ).alias("novelty_frac"),
        )
        .orderBy("novelty_frac", "doc_id")
        .limit(100)
    )


#: Contrastive-pair manifest: negatives per anchor and the hash seed
#: family used to draw them. doc_ids are dense 0..N-1 in the synthetic
#: corpus (asserted in tests), so a seeded-hash modulo-N draw is a
#: uniform deterministic negative sampler with no cross join; a draw
#: landing inside the anchor's own near-dup cluster is kept but
#: FLAGGED (neg{j}_clean = false) — at real-corpus dup densities this
#: is rare, and flagging keeps the output schema and row count
#: deterministic instead of re-drawing unboundedly.
_CTR_NEGS = 2
_CTR_SEED_BASE = 40


def _contrastive_oracle() -> str:
    from hadoop_cs4225_spark.operators.dedup import _lsh_pairs_cte

    draws = []
    neg_cols = []
    neg_joins = []
    for j in range(1, _CTR_NEGS + 1):
        expr = "'" + str(_CTR_SEED_BASE + j) + ":' || CAST(a.anchor_id AS VARCHAR)"
        draws.append(f"({hash60_sql(expr)}) % nn.n AS neg{j}_id")
        neg_cols.append(
            f"d.neg{j}_id, COALESCE(l{j}.cluster_id <> d.cluster_id, TRUE)"
            f" AS neg{j}_clean"
        )
        neg_joins.append(f"LEFT JOIN labs l{j} ON l{j}.doc_id = d.neg{j}_id")
    return f"""
WITH RECURSIVE {_lsh_pairs_cte()},
edges AS (
  SELECT d1 AS a, d2 AS b FROM verified
  UNION ALL
  SELECT d2 AS a, d1 AS b FROM verified
),
nodes AS (SELECT DISTINCT a AS node FROM edges),
reach(node, lab) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.node
),
labs AS (SELECT node AS doc_id, MIN(lab) AS cluster_id FROM reach GROUP BY node),
keepers AS (
  SELECT cluster_id, doc_id AS keeper_id FROM (
    SELECT l.cluster_id, l.doc_id,
           ROW_NUMBER() OVER (
             PARTITION BY l.cluster_id ORDER BY d.n_chars DESC, l.doc_id
           ) AS rn
    FROM labs l JOIN documents d ON l.doc_id = d.doc_id) z
  WHERE rn = 1
),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
anchors AS (
  SELECT l.doc_id AS anchor_id, l.cluster_id, k.keeper_id AS positive_id
  FROM labs l JOIN keepers k USING (cluster_id)
  WHERE l.doc_id <> k.keeper_id
),
drawn AS (
  SELECT a.anchor_id, a.cluster_id, a.positive_id,
         {", ".join(draws)}
  FROM anchors a CROSS JOIN nn
)
SELECT d.anchor_id, d.positive_id,
       {", ".join(neg_cols)}
FROM drawn d
{chr(10).join(neg_joins)}
ORDER BY d.anchor_id
"""


@register("contrastive_pairs_manifest", oracle=_contrastive_oracle())
def contrastive_pairs_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive training-pair manifest from the near-dup clusters:
    every non-canonical cluster member anchors one POSITIVE (its
    cluster's canonical keeper — the same longest-chars/doc_id rule as
    ``dedup_canonical_keep``) and 2 deterministic hash-drawn NEGATIVES
    (seeded md5 modulo the dense doc_id space). The manifest a
    similarity-model fine-tune reads: (anchor, positive, negatives)
    with a cleanliness flag marking the rare draw that lands inside
    the anchor's own cluster (flagged, not re-drawn, so row count and
    schema stay deterministic).

    Composes the MEMOIZED cluster labels (``dedup._cluster_labels`` —
    zero extra LSH work when the dedup family already ran) and its
    oracle embeds the same shared LSH CTE chain, so the pair
    construction can never drift from the dedup family. Plan: labels
    join + one broadcast keeper join + per-negative left joins on
    doc_id — no cross joins; the negative draw is a map-side hash.
    """
    from hadoop_cs4225_spark.functions.hashing import hash60_seeded
    from hadoop_cs4225_spark.operators.dedup import _cluster_labels

    docs = load_table(spark, sf_dir, "documents")
    labels = _cluster_labels(spark, sf_dir).select(
        "doc_id", F.col("lab").alias("cluster_id")
    )
    keepers = (
        labels.join(docs.select("doc_id", "n_chars"), "doc_id")
        .groupBy("cluster_id")
        .agg(F.expr("max_by(doc_id, struct(n_chars, -doc_id))").alias("keeper_id"))
    )
    nn = F.broadcast(docs.agg(F.count(F.lit(1)).cast("long").alias("n")))
    anchors = (
        labels.join(F.broadcast(keepers), "cluster_id")
        .where(F.col("doc_id") != F.col("keeper_id"))
        .select(
            F.col("doc_id").alias("anchor_id"),
            "cluster_id",
            F.col("keeper_id").alias("positive_id"),
        )
    )
    drawn = anchors.crossJoin(nn).select(
        "anchor_id",
        "cluster_id",
        "positive_id",
        *[
            (
                hash60_seeded(
                    F.col("anchor_id").cast("string"), _CTR_SEED_BASE + j
                )
                % F.col("n")
            ).alias(f"neg{j}_id")
            for j in range(1, _CTR_NEGS + 1)
        ],
    )
    out = drawn
    for j in range(1, _CTR_NEGS + 1):
        lj = labels.select(
            F.col("doc_id").alias(f"neg{j}_id"),
            F.col("cluster_id").alias(f"neg{j}_cluster"),
        )
        out = out.join(lj, f"neg{j}_id", "left")
    return out.select(
        "anchor_id",
        "positive_id",
        *[
            c
            for j in range(1, _CTR_NEGS + 1)
            for c in (
                F.col(f"neg{j}_id"),
                F.coalesce(
                    F.col(f"neg{j}_cluster") != F.col("cluster_id"),
                    F.lit(True),
                ).alias(f"neg{j}_clean"),
            )
        ],
    ).orderBy("anchor_id")
