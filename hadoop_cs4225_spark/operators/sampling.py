"""Deterministic sampling & split assignment — training-data pipeline ops.

Random `df.sample()` is useless for a reproducible corpus: resampling
on retry/backfill yields a different subset, and train/test membership
must be stable across runs, engines, and cluster sizes. The idiom at
any scale is HASH-based assignment: `hash(key) % N < k` is a pure
per-row predicate — map-only, partition-pruning-friendly, identical on
1 or 1000 executors, and joinable (the same doc always lands in the
same split). Hash is the cross-engine md5-based ``hash60``
(functions/hashing.py), so the DuckDB oracle reproduces membership
bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadoop_cs4225_spark.functions.hashing import (
    hash60,
    hash60_seeded,
    hash60_seeded_sql,
    hash60_sql,
)
from hadoop_cs4225_spark.functions.numeric import quant, quant_sql
from hadoop_cs4225_spark.registry import register
from hadoop_cs4225_spark.sources.tables import load_table

#: Percent of documents kept by the 10% sample.
SAMPLE_PCT = 10
#: Train share of the 90/10 split.
TRAIN_PCT = 90


@register(
    "documents_hash_sample",
    oracle=f"""
SELECT doc_id, lang, n_chars
FROM documents
WHERE {hash60_sql("CAST(doc_id AS VARCHAR)")} % 100 < {SAMPLE_PCT}
ORDER BY doc_id
""",
)
def documents_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible ~10% document sample by content-stable hash.

    A pure filter — no shuffle, no state, no seed bookkeeping; the same
    doc_id is in (or out) forever, on any engine or cluster layout.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.where(
            hash60(F.col("doc_id").cast("string")) % 100 < SAMPLE_PCT
        )
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    )


@register(
    "documents_split_stats",
    oracle=f"""
SELECT CASE WHEN {hash60_sql("CAST(doc_id AS VARCHAR)")} % 100 < {TRAIN_PCT}
            THEN 'train' ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       {quant_sql("CAST(SUM(n_chars) AS DOUBLE) / COUNT(*)", 6)} AS avg_chars,
       COUNT(DISTINCT lang) AS n_langs
FROM documents
GROUP BY split
ORDER BY split
""",
)
def documents_split_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable 90/10 train/test split with per-split corpus stats.

    Split assignment is a deterministic per-row expression, so the
    aggregation is one partial-agg shuffle over 2 keys; downstream
    jobs re-derive membership from doc_id alone (no split table to
    join or keep consistent).
    """
    docs = load_table(spark, sf_dir, "documents")
    split = F.when(
        hash60(F.col("doc_id").cast("string")) % 100 < TRAIN_PCT, "train"
    ).otherwise("test")
    return (
        docs.select(split.alias("split"), "n_chars", "lang")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            quant(
                F.sum("n_chars").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_chars"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .orderBy("split")
    )


@register(
    "documents_stratified_sample",
    oracle=f"""
WITH rates(lang, pct) AS (VALUES ('en', 5), ('de', 20), ('fr', 20),
                                 ('es', 50), ('zh', 50))
SELECT d.lang, COUNT(*) AS n_sampled,
       CAST(SUM(d.n_chars) AS BIGINT) AS sampled_chars
FROM documents d JOIN rates r ON d.lang = r.lang
WHERE {hash60_sql("CAST(d.doc_id AS VARCHAR)")} % 100 < r.pct
GROUP BY d.lang
ORDER BY d.lang
""",
)
def documents_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language stratified sampling (downsample the head language,
    keep more of the tail) — the class-rebalancing step of corpus
    curation, still fully deterministic.

    The per-stratum rate table is a broadcast join (bounded: one row
    per language); the sample predicate stays a map-side filter, so the
    only shuffle is the final tiny per-language rollup.
    """
    docs = load_table(spark, sf_dir, "documents")
    # Inline VALUES relation: stays JVM-side (a createDataFrame of the
    # same 5 rows costs a Python-RDD conversion + ~1 s of py4j).
    rates = F.broadcast(
        spark.sql(
            "SELECT * FROM VALUES ('en', 5), ('de', 20), ('fr', 20), "
            "('es', 50), ('zh', 50) AS rates(lang, pct)"
        )
    )
    return (
        docs.join(rates, "lang")
        .where(hash60(F.col("doc_id").cast("string")) % 100 < F.col("pct"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_chars").alias("sampled_chars"),
        )
        .orderBy("lang")
    )


@register(
    "curated_split_manifest",
    oracle=f"""
WITH keepers AS (
  SELECT lang, text, MIN(doc_id) AS keeper_id,
         MIN(n_chars) AS n_chars
  FROM documents
  WHERE n_chars >= 200
  GROUP BY lang, text
)
SELECT CASE WHEN {hash60_sql("CAST(keeper_id AS VARCHAR)")} % 100 < {TRAIN_PCT}
            THEN 'train' ELSE 'test' END AS split,
       lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM keepers
GROUP BY split, lang
ORDER BY split, lang
""",
)
def curated_split_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation chain in ONE plan: length filter → exact dedup
    (keep lowest doc_id per distinct text) → deterministic 90/10 split →
    per split×lang manifest.

    One corpus scan, one dedup shuffle keyed on (lang, text), one tiny
    rollup — split membership is computed from the surviving keeper_id,
    so re-running after upstream changes moves a doc between splits
    ONLY if its canonical representative changed. This is the manifest
    a 100 TB pretraining run is launched from.
    """
    docs = load_table(spark, sf_dir, "documents")
    keepers = (
        docs.where(F.col("n_chars") >= 200)
        .groupBy("lang", "text")
        .agg(
            F.min("doc_id").alias("keeper_id"),
            F.min("n_chars").alias("n_chars"),
        )
    )
    split = F.when(
        hash60(F.col("keeper_id").cast("string")) % 100 < TRAIN_PCT, "train"
    ).otherwise("test")
    return (
        keepers.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("split", "lang")
    )


@register(
    "mixture_weighted_sample",
    oracle=f"""
WITH per_source AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
),
shared AS (
  SELECT source, n_docs,
         POW(CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER (), 0.7) AS raw_w
  FROM per_source
),
rates AS (
  SELECT source, n_docs,
         CAST(floor({quant_sql("raw_w / SUM(raw_w) OVER ()", 6)} * 100) AS BIGINT)
           AS rate_pct
  FROM shared
)
SELECT d.source,
       r.rate_pct,
       r.n_docs,
       COUNT(*) FILTER (
         WHERE {hash60_sql("CAST(d.doc_id AS VARCHAR)")} % 100 < r.rate_pct
       ) AS n_sampled
FROM documents d JOIN rates r ON d.source = r.source
GROUP BY d.source, r.rate_pct, r.n_docs
ORDER BY d.source
""",
)
def mixture_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY the domain-mixture weights: temperature-reweighted
    per-source sampling rates (share^0.7 renormalized, floored to whole
    percent) driving the deterministic hash-sample — the step that
    turns `source_mixture_weights` into an actual training subset.

    Composition story: weights come from a tiny per-source aggregate
    (broadcast 1-row normalizers, as in source_mixture_weights); the
    sample membership test is the same engine-portable
    ``hash60(doc_id) % 100 < rate`` predicate as documents_hash_sample
    — map-side, reproducible across engines, runs, and cluster sizes.
    One wide shuffle total (the final per-source count).
    """
    docs = load_table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = per_source.agg(F.sum("n_docs").alias("all_docs"))
    shared = per_source.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        F.pow(F.col("n_docs").cast("double") / F.col("all_docs"), 0.7).alias(
            "raw_w"
        ),
    )
    tot_w = shared.agg(F.sum("raw_w").alias("all_w"))
    rates = shared.crossJoin(F.broadcast(tot_w)).select(
        "source",
        "n_docs",
        F.floor(quant(F.col("raw_w") / F.col("all_w"), 6) * 100)
        .cast("bigint")
        .alias("rate_pct"),
    )
    keep = (
        hash60(F.col("doc_id").cast("string")) % 100 < F.col("rate_pct")
    ).cast("long")
    # No hand broadcast hint on the rates join: the relation is data-
    # derived (AQE broadcasts it at runtime from its observed size —
    # same policy as events_daily_anomaly).
    return (
        docs.join(rates, "source")
        .groupBy("source", "rate_pct", "n_docs")
        .agg(F.sum(keep).alias("n_sampled"))
        .orderBy("source")
    )


#: Epochs and shards for the deterministic training-shard plan.
N_EPOCHS = 3
N_SHARDS = 8


@register(
    "epoch_shard_plan",
    oracle=f"""
SELECT e.epoch,
       {hash60_sql("CAST(doc_id AS VARCHAR) || ':' || CAST(e.epoch AS VARCHAR)")}
         % {N_SHARDS} AS shard,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       MIN(doc_id) AS min_doc,
       MAX(doc_id) AS max_doc
FROM documents, LATERAL (SELECT unnest(range(0, {N_EPOCHS})) AS epoch) e
GROUP BY epoch, shard
ORDER BY epoch, shard
""",
)
def epoch_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch shard assignment — the data-loading plan
    a multi-epoch training run executes: every epoch re-shuffles the
    corpus into {N_SHARDS} shards via ``hash60(doc_id:epoch)``, so each
    epoch sees a DIFFERENT document→shard permutation (decorrelating
    batch composition across epochs) while any worker can recompute its
    own shard membership from the key alone — no central shuffle
    manifest, no coordination.

    Plan shape: a map-side ``explode`` replicates each manifest row
    {N_EPOCHS}x (rows multiply inside the task — this is NOT a join),
    the shard id is a map-side hash, and one partial-aggregated shuffle
    on (epoch, shard) produces the plan. At 100 TB the output is
    {N_EPOCHS}*{N_SHARDS} rows regardless of corpus size, and the same
    predicate ``hash60(doc_id:epoch) % {N_SHARDS} = my_shard`` is the
    worker-side filter that reads one shard with full pushdown.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    exploded = docs.select(
        "doc_id",
        "n_chars",
        F.explode(F.sequence(F.lit(0), F.lit(N_EPOCHS - 1))).alias("epoch"),
    ).withColumn("epoch", F.col("epoch").cast("bigint"))
    shard = hash60(
        F.concat_ws(
            ":", F.col("doc_id").cast("string"), F.col("epoch").cast("string")
        )
    ) % N_SHARDS
    return (
        exploded.withColumn("shard", shard)
        .groupBy("epoch", "shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("epoch", "shard")
    )


#: Per-source document cap (domain capping): keep at most this many
#: docs per source, chosen by deterministic hash rank. 18 so the cap
#: BINDS at every test SF (25 docs/source at sf0.001/0.01, 250 at
#: sf0.1) — a cap the data never reaches would leave the boundary
#: ranking and drop accounting unexercised by the driver.
DOC_CAP_K = 18
#: Seed decorrelating the cap's hash order from documents_hash_sample's
#: membership hash (an unseeded hash60(doc_id) would make the capped
#: set correlate with the 10% sample).
_CAP_SEED = 7
#: Range-bucket shift: hash60 values are < 2^60; ``h >> 50`` yields
#: 1024 ORDERED range buckets per source, so bucket-level cumulative
#: counts locate the K-th smallest hash without ranking the full
#: source.
_CAP_SHIFT = 50


@register(
    "per_source_doc_cap",
    oracle=f"""
WITH ranked AS (
  SELECT source, n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY {hash60_seeded_sql("CAST(doc_id AS VARCHAR)", _CAP_SEED)},
                    doc_id
         ) AS rk
  FROM documents
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN rk <= {DOC_CAP_K} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       CAST(SUM(CASE WHEN rk <= {DOC_CAP_K} THEN n_chars ELSE 0 END) AS BIGINT)
         AS kept_chars,
       CAST(CASE WHEN COUNT(*) > {DOC_CAP_K} THEN 1 ELSE 0 END AS INT)
         AS cap_binds
FROM ranked
GROUP BY source
ORDER BY source
""",
)
def per_source_doc_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain capping — keep at most ``DOC_CAP_K`` docs per source by
    deterministic hash rank (the standard move against a single crawl
    domain dominating the training mixture; reproducible because the
    rank order is ``hash60_seeded(doc_id)``, never ingestion order).

    The naive plan is ``row_number() OVER (PARTITION BY source ORDER BY
    hash)`` — one task per source buffering EVERY doc of that source,
    the exact straggler class the registry-wide partition-less-window
    test exists to keep out (a hot domain at 100 TB is billions of
    rows). Instead the K-th smallest hash is located with bucket
    arithmetic, the `curriculum_phase_bins` discipline:

    1. one map-side-combined aggregate over (source, h>>{_CAP_SHIFT})
       — 1024 ORDERED range buckets per source — carrying count and
       char-sum per bucket;
    2. a cumulative window over that ≤1024-rows-per-source frame
       (bounded by construction) classifies each bucket: entirely
       below the cap (kept whole — its aggregate is already in hand),
       entirely above (dropped, never re-read), or THE boundary bucket
       (at most one per source);
    3. only boundary-bucket rows — an expected 1/1024 of each source —
       are re-read (hash-pruned semi-join) and ranked by an in-bucket
       window, bounded by the bucket, not the source.

    The fact table is scanned twice (bucket histogram + boundary
    slice) and sorted never; no union of per-doc branches, no reliance
    on ReuseExchange. The oracle states the same kept-set via the
    plain ROW_NUMBER formulation — the two agree because bucket order
    refines hash order and ties are broken by doc_id.
    """
    docs = load_table(spark, sf_dir, "documents")
    h = hash60_seeded(F.col("doc_id").cast("string"), _CAP_SEED)
    base = docs.select(
        "source",
        "n_chars",
        "doc_id",
        h.alias("h"),
        F.shiftright(h, _CAP_SHIFT).alias("b"),
    )
    hist = (
        base.groupBy("source", "b")
        .agg(
            F.count(F.lit(1)).alias("nb"),
            F.sum("n_chars").alias("sc"),
        )
        .localCheckpoint(eager=False)  # 3 consumers; ≤1024 rows/source
    )
    w_cum = (
        Window.partitionBy("source")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    hist = hist.withColumn("before", F.coalesce(F.sum("nb").over(w_cum), F.lit(0)))
    k = F.lit(DOC_CAP_K)
    totals = hist.groupBy("source").agg(
        F.sum("nb").cast("bigint").alias("n_docs")
    )
    keep_whole = (
        hist.where(F.col("before") + F.col("nb") <= k)
        .groupBy("source")
        .agg(
            F.sum("nb").alias("kept"),
            F.sum("sc").alias("chars"),
        )
    )
    boundary = hist.where((F.col("before") < k) & (F.col("before") + F.col("nb") > k))
    w_in = Window.partitionBy("source", "b").orderBy("h", "doc_id")
    boundary_kept = (
        base.join(F.broadcast(boundary.select("source", "b", "before")), ["source", "b"])
        .withColumn("rk", F.row_number().over(w_in))
        .where(F.col("before") + F.col("rk") <= k)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("kept"),
            F.sum("n_chars").alias("chars"),
        )
    )
    kept = (
        keep_whole.unionByName(boundary_kept)
        .groupBy("source")
        .agg(
            F.sum("kept").cast("bigint").alias("n_kept"),
            F.sum("chars").cast("bigint").alias("kept_chars"),
        )
    )
    return (
        totals.join(kept, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
            F.coalesce("kept_chars", F.lit(0)).cast("bigint").alias("kept_chars"),
            (F.col("n_docs") > k).cast("int").alias("cap_binds"),
        )
        .orderBy("source")
    )


def capped_keep(base: DataFrame, k: int, seed: int = _CAP_SEED) -> DataFrame:
    """Rows of ``base`` surviving an EXACT per-source cap of ``k``,
    chosen by deterministic seeded-hash rank (``hash60_seeded(doc_id)``
    then ``doc_id``) — the kept-SET counterpart of
    ``per_source_doc_cap``'s summary, shared by composed pipelines.

    Same bounded-bucket discipline (see ``per_source_doc_cap``): a
    1024-range-bucket histogram per source classifies buckets as
    kept-whole / dropped / boundary, and only the single boundary
    bucket per source is ranked by an in-bucket window — no window ever
    buffers a whole source, so a hot domain at 100 TB cannot create a
    straggler task. ``base`` must carry ``source`` and ``doc_id``;
    equivalent to the plain ``ROW_NUMBER() OVER (PARTITION BY source
    ORDER BY hash, doc_id) <= k`` formulation because the bucket order
    refines the hash order."""
    h = hash60_seeded(F.col("doc_id").cast("string"), seed)
    tagged = base.withColumn("_h", h).withColumn(
        "_b", F.shiftright(F.col("_h"), _CAP_SHIFT)
    )
    hist = tagged.groupBy("source", "_b").agg(F.count(F.lit(1)).alias("nb"))
    w_cum = (
        Window.partitionBy("source")
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    hist = hist.withColumn(
        "before", F.coalesce(F.sum("nb").over(w_cum), F.lit(0))
    )
    whole = hist.where(F.col("before") + F.col("nb") <= k).select("source", "_b")
    boundary = hist.where(
        (F.col("before") < k) & (F.col("before") + F.col("nb") > k)
    ).select("source", "_b", "before")
    kept_whole = tagged.join(F.broadcast(whole), ["source", "_b"])
    w_in = Window.partitionBy("source", "_b").orderBy("_h", "doc_id")
    kept_boundary = (
        tagged.join(F.broadcast(boundary), ["source", "_b"])
        .withColumn("_rk", F.row_number().over(w_in))
        .where(F.col("before") + F.col("_rk") <= k)
        .drop("before", "_rk")
    )
    return kept_whole.unionByName(kept_boundary).drop("_h", "_b")


#: A-ES weighted sampling: kept docs per source, and the 2^20 grid the
#: hash is mapped onto before the log transform.
_AES_TOPK = 10
_AES_GRID = 1 << 20


_AES_U_SQL = (
    f"((({hash60_sql('CAST(doc_id AS VARCHAR)')} % {_AES_GRID})"
    f" + 0.5) / {_AES_GRID}.0)"
)


@register(
    "weighted_aes_sample",
    oracle=f"""
WITH keyed AS (
  SELECT source, doc_id, n_chars,
         {quant_sql(f"LN({_AES_U_SQL}) / n_chars", 12)} AS aes_key
  FROM documents
  WHERE n_chars > 0
)
SELECT source, doc_id, n_chars, rn AS rank FROM (
  SELECT source, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY aes_key DESC, doc_id) AS rn
  FROM keyed)
WHERE rn <= {_AES_TOPK}
ORDER BY source, rank
""",
)
def weighted_aes_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement via exponential sort keys
    (Efraimidis–Spirakis A-ES): per source, the {k} docs with the
    largest ``u^(1/w)`` — equivalently the largest ``ln(u)/w`` — where
    w = n_chars and u is a reproducible uniform from the same
    md5-derived hash60 as every other sampling op (hashing.py).

    Length-weighted without-replacement sampling is the standard
    mixture-construction primitive when doc token counts differ by
    orders of magnitude; unlike ``mixture_weighted_sample``'s
    Bernoulli thinning it draws an EXACT per-source count.

    Determinism: u = ((hash60 % 2^20) + 0.5) / 2^20 is an exact binary
    double, identical in both engines; ln(u)/w follows the
    ln-of-rational precedent (tfidf) and the key is quantized at 12dp
    BEFORE ranking with a doc_id tie-break, so a last-ulp libm
    disagreement cannot flip the order. Top-k per source is a
    partitioned window — one shuffle, no global sort.
    """
    docs = load_table(spark, sf_dir, "documents")
    u = ((hash60(F.col("doc_id").cast("string")) % _AES_GRID) + 0.5) / float(
        _AES_GRID
    )
    # zero-weight guard, applied identically in the oracle: ln(u)/0
    # is NULL in Spark but -inf in DuckDB's double division, so a
    # zero-length doc would rank differently per engine; a w=0 doc
    # has zero inclusion probability under A-ES anyway
    keyed = docs.filter(F.col("n_chars") > 0).select(
        "source",
        "doc_id",
        "n_chars",
        quant(F.log(u) / F.col("n_chars"), 12).alias("aes_key"),
    )
    w = Window.partitionBy("source").orderBy(F.col("aes_key").desc(), "doc_id")
    return (
        keyed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _AES_TOPK)
        .select("source", "doc_id", "n_chars", F.col("rn").alias("rank"))
        .orderBy("source", "rank")
    )


#: Poisson bootstrap: replica count, the Poisson(1) CDF thresholds on
#: the 2^20 hash grid (floor(CDF_k * 2^20), k = 0..5; weights cap at
#: 6), and the mean-quantization grid (1e-3 chars).
_BOOT_B = 32
_BOOT_THRESH = (385749, 771499, 964373, 1028665, 1044738, 1047952)
_BOOT_GRID = 1000


def _boot_w_sql(u: str) -> str:
    cases = " ".join(
        f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(_BOOT_THRESH)
    )
    return f"(CASE {cases} ELSE {len(_BOOT_THRESH)} END)"


@register(
    "source_mean_bootstrap_ci",
    oracle=f"""
WITH reps AS (
  SELECT unnest(range({_BOOT_B})) AS b
), weighted AS (
  SELECT d.source, r.b, d.n_chars,
         {_boot_w_sql(
             f"({hash60_seeded_sql('CAST(doc_id AS VARCHAR) || CHR(58) || CAST(r.b AS VARCHAR)', 77)}"
             f" % {1 << 20})")} AS w
  FROM documents d CROSS JOIN reps r
), rep_means AS (
  SELECT source, b,
         CAST(floor(CAST(SUM(w * n_chars) AS DOUBLE) / SUM(w)
                    * {_BOOT_GRID} + 0.5) AS BIGINT) AS m_s
  FROM weighted GROUP BY source, b HAVING SUM(w) > 0
), boot AS (
  SELECT source, COUNT(*) AS nb,
         CAST(SUM(m_s) AS BIGINT) AS s1, CAST(SUM(m_s * m_s) AS BIGINT) AS s2
  FROM rep_means GROUP BY source
), pt AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(floor(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*)
                    * {_BOOT_GRID} + 0.5) AS BIGINT) AS pm_s
  FROM documents GROUP BY source
)
SELECT p.source, p.n_docs,
       {quant_sql(f"p.pm_s * 1.0 / {_BOOT_GRID}", 3)} AS mean_chars,
       {quant_sql(
           "sqrt((b.s2 - b.s1 * 1.0 * b.s1 / b.nb) / (b.nb - 1))"
           f" / {_BOOT_GRID}", 4)} AS boot_se,
       {quant_sql(
           "(p.pm_s - 1.96 * sqrt((b.s2 - b.s1 * 1.0 * b.s1 / b.nb)"
           f" / (b.nb - 1))) / {_BOOT_GRID}", 3)} AS ci_lo,
       {quant_sql(
           "(p.pm_s + 1.96 * sqrt((b.s2 - b.s1 * 1.0 * b.s1 / b.nb)"
           f" / (b.nb - 1))) / {_BOOT_GRID}", 3)} AS ci_hi
FROM pt p JOIN boot b USING (source)
ORDER BY p.source
""",
)
def source_mean_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap 95% confidence interval for each source's
    mean document length — THE distributed bootstrap: resampling a
    corpus with replacement needs a global shuffle per replica, but
    per-row independent Poisson(1) weights approximate multinomial
    resampling arbitrarily well at corpus scale, so all 32 replicas
    run in ONE pass over the data as a (source, replica) aggregate.

    Determinism: weights come from the shared md5 hash grid through
    fixed integer CDF thresholds (no float RNG); each replica mean is
    floored onto a 1e-3 grid before the across-replica variance, so
    every engine-side sum is integer. SE = std across replica means.
    """
    docs = load_table(spark, sf_dir, "documents")
    reps = spark.range(_BOOT_B).select(F.col("id").cast("int").alias("b"))
    u = hash60_seeded(
        F.concat_ws(":", F.col("doc_id").cast("string"), F.col("b").cast("string")),
        77,
    ) % (1 << 20)
    w = F.lit(len(_BOOT_THRESH))
    for k in range(len(_BOOT_THRESH) - 1, -1, -1):
        w = F.when(u < _BOOT_THRESH[k], k).otherwise(w)
    weighted = docs.crossJoin(F.broadcast(reps)).select(
        "source", "b", "n_chars", w.alias("w")
    )
    rep_means = (
        weighted.groupBy("source", "b")
        .agg(
            F.sum("w").alias("sw"),
            F.sum(F.col("w") * F.col("n_chars")).alias("swx"),
        )
        .filter(F.col("sw") > 0)
        .select(
            "source",
            F.floor(
                F.col("swx").cast("double") / F.col("sw") * _BOOT_GRID + 0.5
            )
            .cast("long")
            .alias("m_s"),
        )
    )
    boot = rep_means.groupBy("source").agg(
        F.count(F.lit(1)).alias("nb"),
        F.sum("m_s").alias("s1"),
        F.sum(F.col("m_s") * F.col("m_s")).alias("s2"),
    )
    pt = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.floor(
            F.sum("n_chars").cast("double") / F.count(F.lit(1)) * _BOOT_GRID
            + 0.5
        )
        .cast("long")
        .alias("pm_s"),
    )
    se_raw = F.sqrt(
        (F.col("s2") - F.col("s1") * 1.0 * F.col("s1") / F.col("nb"))
        / (F.col("nb") - 1)
    )
    return (
        pt.join(boot, "source")
        .select(
            "source",
            "n_docs",
            quant(F.col("pm_s") * 1.0 / _BOOT_GRID, 3).alias("mean_chars"),
            quant(se_raw / _BOOT_GRID, 4).alias("boot_se"),
            quant((F.col("pm_s") - 1.96 * se_raw) / _BOOT_GRID, 3).alias("ci_lo"),
            quant((F.col("pm_s") + 1.96 * se_raw) / _BOOT_GRID, 3).alias("ci_hi"),
        )
        .orderBy("source")
    )


#: Water-fill: fraction of the total corpus supply handed out as the
#: global budget (numerator/denominator kept integer so the budget is
#: an exact BIGINT on both engines).
_WATERFILL_NUM, _WATERFILL_DEN = 1, 2


@register(
    "source_token_waterfill",
    oracle=f"""
WITH s AS (
  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS sup
  FROM documents GROUP BY source
), b AS (
  SELECT CAST(SUM(sup) AS BIGINT) AS t,
         CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(sup) AS BIGINT) * {_WATERFILL_NUM} // {_WATERFILL_DEN}
           AS budget
  FROM s
), o AS (
  SELECT source, sup,
         CAST(ROW_NUMBER() OVER (ORDER BY sup, source) AS BIGINT) AS i,
         CAST(COALESCE(SUM(sup) OVER (ORDER BY sup, source
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cprev,
         CAST(SUM(sup) OVER (ORDER BY sup, source
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS ccum
  FROM s
), f AS (
  SELECT o.*, b.budget, b.k,
         (cprev + sup * (b.k - i + 1) <= b.budget) AS saturated
  FROM o CROSS JOIN b
), m AS (
  SELECT COALESCE(MAX(CASE WHEN saturated THEN ccum END), 0) AS c_m,
         CAST(SUM(CASE WHEN saturated THEN 1 ELSE 0 END) AS BIGINT) AS m
  FROM f
)
SELECT f.source, f.sup AS supply_chars,
       {quant_sql(
           "CASE WHEN f.saturated THEN CAST(f.sup AS DOUBLE)"
           " ELSE (f.budget - m.c_m) * 1.0 / (f.k - m.m) END", 2)}
         AS alloc_chars,
       f.saturated
FROM f CROSS JOIN m
ORDER BY f.source
""",
)
def source_token_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Water-filling token-budget allocation across sources — the
    data-mixing primitive behind "give me a half-corpus training budget
    spread as evenly as possible across sources without exceeding any
    source's supply": small sources contribute everything they have
    (saturated), the rest split the remaining budget at one common
    water level. (``mixture_weighted_sample`` takes target weights as
    GIVEN; this op is where those targets come from.)

    Closed form, not iterative: order sources by supply ascending; a
    source saturates iff granting its full supply to it AND every
    larger source still fits the budget (``cprev + sup*(k-i+1) <=
    B`` — monotone in i, all-integer). With m saturated sources
    holding c_m chars, the level is (B - c_m)/(k - m), exact integer
    arithmetic until that one final division. m < k always: saturating
    everyone needs total <= B = total*{_WATERFILL_NUM}/{_WATERFILL_DEN}.

    Scale: one per-source aggregate (partial-agg over the corpus), then
    every window/join lives on the SOURCE-DOMAIN-bounded k-row frame —
    constant work after the scan at any corpus size. The budget is an
    exact BIGINT (integer-div of the supply total), never a float of
    the corpus size.
    """
    docs = load_table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.sum("n_chars").cast("long").alias("sup")
    )
    b = F.broadcast(
        s.agg(
            F.sum("sup").cast("long").alias("t"),
            F.count(F.lit(1)).cast("long").alias("k"),
            F.expr(
                f"CAST(sum(sup) AS BIGINT) * {_WATERFILL_NUM}"
                f" div {_WATERFILL_DEN}"
            ).alias("budget"),
        )
    )
    w_ord = Window.orderBy("sup", "source")
    o = s.select(
        "source",
        "sup",
        F.row_number().over(w_ord).cast("long").alias("i"),
        F.coalesce(
            F.sum("sup").over(w_ord.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        )
        .cast("long")
        .alias("cprev"),
        F.sum("sup")
        .over(w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("ccum"),
    )
    f = o.crossJoin(b).withColumn(
        "saturated",
        F.col("cprev") + F.col("sup") * (F.col("k") - F.col("i") + 1)
        <= F.col("budget"),
    )
    m = F.broadcast(
        f.agg(
            F.coalesce(
                F.max(F.when(F.col("saturated"), F.col("ccum"))), F.lit(0)
            ).alias("c_m"),
            F.sum(F.col("saturated").cast("int")).cast("long").alias("m"),
        )
    )
    return (
        f.crossJoin(m)
        .select(
            "source",
            F.col("sup").alias("supply_chars"),
            quant(
                F.when(F.col("saturated"), F.col("sup").cast("double")).otherwise(
                    (F.col("budget") - F.col("c_m"))
                    * 1.0
                    / (F.col("k") - F.col("m"))
                ),
                2,
            ).alias("alloc_chars"),
            "saturated",
        )
        .orderBy("source")
    )
