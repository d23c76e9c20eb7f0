"""Sequence packing: lay documents into fixed token-budget context
windows (bins) — the step between curation and tokenization in an LLM
pretraining pipeline.

Semantics: concat-and-chunk (the standard pretraining packing). Within
each ``source`` stream, documents are concatenated in deterministic
``doc_id`` order; the token stream is cut every ``PACK_BUDGET`` tokens.
A document belongs to the bin its first token lands in; a document whose
span crosses a cut is flagged (``n_straddle``) — those are the docs a
real tokenizer would split across contexts.

Scale: ONE window (cumulative sum partitioned by ``source``) + one
group-by — no self-joins, no iteration. At 100 TB a single ``source``
stream can exceed one task's range-partition; the production layout
sub-shards the window key to ``(source, hash(doc_id) % K)`` which keeps
bins deterministic per shard and the window state bounded. The whole
operator is JVM-side built-ins (no UDFs).

No reference analogue (reference = two MapReduce jobs); this extends the
driver-mandated LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_cs4225_spark.functions.numeric import quant, quant_sql
from hadoop_cs4225_spark.operators.dedup import _TOKS_SQL, _toks
from hadoop_cs4225_spark.registry import register
from hadoop_cs4225_spark.sources.tables import load_table

#: Tokens per packed context window. Small enough that sf0.01's ~500
#: docs spread over many bins (the interesting regime), large enough
#: that multi-doc bins and straddles both occur.
PACK_BUDGET = 2048


@register(
    "sequence_pack_bins",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, source, len({_TOKS_SQL}) AS n_tokens
  FROM documents
),
placed AS (
  SELECT doc_id, source, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS off
  FROM toks
)
SELECT source,
       CAST(off // {PACK_BUDGET} AS BIGINT) AS bin_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
       CAST(SUM(CASE WHEN (off + n_tokens - 1) // {PACK_BUDGET}
                       > off // {PACK_BUDGET} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_straddle,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM placed
GROUP BY source, bin_id
ORDER BY source, bin_id
""",
)
def sequence_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, bin) packing manifest: how many docs landed in each
    context window, its fill, and how many docs straddle a cut.

    Plan shape: scan -> project(token count) -> window cumsum keyed on
    ``source`` -> hash-agg on (source, bin_id). The window and the agg
    share the ``source`` partitioning, so Catalyst reuses one exchange.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(_toks()).alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = docs.select(
        "doc_id",
        "source",
        "n_tokens",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        .cast("bigint")
        .alias("off"),
    )
    bin_id = F.expr(f"off div {PACK_BUDGET}")
    end_bin = F.expr(f"(off + n_tokens - 1) div {PACK_BUDGET}")
    return (
        placed.select(
            "doc_id",
            "source",
            "n_tokens",
            bin_id.cast("bigint").alias("bin_id"),
            (end_bin > bin_id).cast("int").alias("straddle"),
        )
        .groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("bin_tokens"),
            F.sum("straddle").cast("bigint").alias("n_straddle"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("source", "bin_id")
    )


#: Number of curriculum phases (easy → hard tiers by quality score).
N_PHASES = 3


def ntile_expr(rank_col: str, n_col: str, k: int) -> str:
    """SQL expression computing ``NTILE(k)`` for a 1-based rank over n
    rows WITHOUT a window: with q = n div k and m = n mod k, the first m
    tiles hold q+1 rows, the rest q. (The tempting linear formula
    ``(r-1)*k div n + 1`` is NOT NTILE — it coincides only for k <= 3;
    for k=4, n=10 it deals sizes 3,2,3,2 where NTILE deals 3,3,2,2.
    Pinned against SQL NTILE for a grid of (n, k) in
    tests/test_packing.py.) The q = 0 case (n < k) never divides by
    zero: m = n makes the first branch cover every rank."""
    big = f"({n_col} div {k} + 1)"  # rows per tile in the first m tiles
    return (
        f"CASE WHEN {rank_col} <= {big} * ({n_col} % {k}) "
        f"THEN ({rank_col} - 1) div {big} + 1 "
        f"ELSE ({n_col} % {k}) "
        f"  + ({rank_col} - {big} * ({n_col} % {k}) - 1) "
        f"    div ({n_col} div {k}) + 1 END"
    )


def _quality_sql() -> str:
    """The shared quality-score SQL (same formula and quantization as
    ``text_analysis.doc_quality_scores`` — one definition of "quality"
    across the scoring and curriculum queries)."""
    from hadoop_cs4225_spark.functions.numeric import quant_sql
    from hadoop_cs4225_spark.operators.text_analysis import _SW_ARR

    return quant_sql(
        "0.4 * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks))"
        " + 0.3 * (1.0 - CAST(len(list_filter(toks, x -> x IN ("
        + _SW_ARR
        + "))) AS DOUBLE) / len(toks))"
        " + 0.3 * least(n_chars / 1000.0, 1.0)",
        6,
    )


@register(
    "curriculum_phase_bins",
    oracle=f"""
WITH scored AS (
  SELECT doc_id,
         len(toks) AS n_tokens,
         {_quality_sql()} AS quality
  FROM (SELECT doc_id, n_chars, {_TOKS_SQL} AS toks FROM documents) t
),
phased AS (
  SELECT doc_id, n_tokens, quality,
         NTILE({N_PHASES}) OVER (ORDER BY quality DESC, doc_id) AS phase
  FROM scored
),
placed AS (
  SELECT phase, doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
           PARTITION BY phase ORDER BY quality DESC, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS off
  FROM phased
)
SELECT phase,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS phase_tokens,
       CAST(MAX(off // {PACK_BUDGET}) + 1 AS BIGINT) AS n_bins,
       MIN(doc_id) AS first_doc
FROM placed
GROUP BY phase
ORDER BY phase
""",
)
def curriculum_phase_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-ordered packing: rank the corpus by quality score,
    split it into {N_PHASES} NTILE phases (easy -> hard curriculum
    tiers), and lay each phase out into PACK_BUDGET-token context
    windows — the composition of quality scoring and sequence packing
    a staged pretraining schedule runs.

    The quality score is the shared formula from
    ``text_analysis.doc_quality_scores`` (diversity + stopword +
    length-norm mix). The oracle states the split as
    ``NTILE(k) OVER (ORDER BY quality DESC, doc_id)``; the Spark body
    reproduces those semantics EXACTLY — via :func:`ntile_expr`'s exact
    deal (first ``n mod k`` tiles get ``n div k + 1`` rows, the rest
    ``n div k``; NOT the linear ``(r-1)·k div n + 1``, which diverges
    from NTILE for k > 3) over the same total order — without ever
    planning a partition-less
    window over the corpus — a global NTILE single-threads every row
    through one task, the scale-killer flagged in round 4:

    1. ``qk = round(quality·1e6)``: the 6-dp-quantized score as exact
       integer micro-units — a bijection, so (qk DESC, doc_id) is the
       oracle's total order.
    2. One hash-agg: docs per distinct qk. BOUNDED at 1e6+1 rows
       regardless of corpus size, so the cumulative-offset window over
       it (the only partition-less window left) is constant work — the
       same bounded-frame argument as ``embedding_gram_topeig``'s
       4096-group aggregate.
    3. ``row_number`` within each qk (distributed across ~1e6 value
       partitions) + broadcast bucket offset = exact global rank;
       phase assignment is then a map-side integer formula.
    4. No per-phase cumsum window at all: offsets grow monotonically
       along the order, so ``MAX(off div B)`` is the LAST doc's offset
       — ``(phase_tokens − max_by(n_tokens, grank)) div B`` — an
       ordinary aggregate, where the oracle walks the whole phase.
    """
    from hadoop_cs4225_spark.operators.text_analysis import (
        QUALITY_STOPWORDS,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = _toks()
    n_tokens = F.size(toks).cast("bigint")
    nt_d = F.size(toks).cast("double")
    n_sw = F.size(F.filter(toks, lambda x: x.isin(*QUALITY_STOPWORDS)))
    sw_ratio = n_sw.cast("double") / nt_d
    diversity = F.size(F.array_distinct(toks)).cast("double") / nt_d
    length_norm = F.least(F.col("n_chars") / 1000.0, F.lit(1.0))
    from hadoop_cs4225_spark.functions.numeric import quant

    # localCheckpoint: `scored` feeds TWO consumers (the per-qk count
    # aggregate and the rank join); without it the regex tokenization of
    # the full corpus runs once per branch (Spark does not CSE across
    # DataFrame branches). The materialized frame is one short row per
    # document — (doc_id, n_tokens, qk), no text — so at 100 TB this is
    # the ~GB-scale doc-level manifest, not the token stream.
    scored = (
        docs.select(
            "doc_id",
            n_tokens.alias("n_tokens"),
            quant(
                0.4 * diversity + 0.3 * (1.0 - sw_ratio) + 0.3 * length_norm, 6
            ).alias("quality"),
        )
        .withColumn("qk", F.round(F.col("quality") * 1e6).cast("bigint"))
        .select("doc_id", "n_tokens", "qk")
        .localCheckpoint()
    )
    bstats = scored.groupBy("qk").agg(F.count(F.lit(1)).alias("cnt"))
    w_desc = Window.orderBy(F.desc("qk"))
    boff = bstats.select(
        "qk",
        F.coalesce(
            F.sum("cnt").over(w_desc.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("boff"),
        F.sum("cnt")
        .over(
            w_desc.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("n_total"),
    )
    w_in_bucket = Window.partitionBy("qk").orderBy("doc_id")
    ranked = scored.join(F.broadcast(boff), "qk").select(
        "doc_id",
        "n_tokens",
        (F.col("boff") + F.row_number().over(w_in_bucket)).alias("grank"),
        "n_total",
    )
    phased = ranked.select(
        "doc_id",
        "n_tokens",
        "grank",
        F.expr(ntile_expr("grank", "n_total", N_PHASES)).alias("phase"),
    )
    return (
        phased.groupBy("phase")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("phase_tokens"),
            F.expr(
                f"(sum(n_tokens) - max_by(n_tokens, grank)) div {PACK_BUDGET} + 1"
            )
            .cast("bigint")
            .alias("n_bins"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("phase")
    )


# ---------------------------------------------------------------------------
# Round-11: packing-efficiency curve across context-length budgets
# ---------------------------------------------------------------------------

#: Candidate context lengths (tokens). The curve answers the planning
#: question BEFORE a training run commits to one: how many contexts,
#: how many document straddles (attention-mask pollution under
#: concat-and-chunk), and how much tail padding each budget costs.
_PACK_BUDGETS = (512, 2048, 8192)


@register(
    "packing_efficiency_curve",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, source, len({_TOKS_SQL}) AS n_tokens FROM documents
), placed AS (
  SELECT doc_id, source, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS off
  FROM toks
), fanned AS (
  SELECT p.*, b.budget FROM placed p,
       (SELECT unnest([{", ".join(str(b) for b in _PACK_BUDGETS)}])
          AS budget) b
), per_source AS (
  SELECT budget, source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS t_tokens,
         CAST(SUM(CASE WHEN (off + n_tokens - 1) // budget
                         > off // budget THEN 1 ELSE 0 END) AS BIGINT)
           AS n_straddle
  FROM fanned GROUP BY budget, source
)
SELECT CAST(budget AS BIGINT) AS budget,
       CAST(SUM((t_tokens + budget - 1) // budget) AS BIGINT) AS n_bins,
       CAST(SUM(n_docs) AS BIGINT) AS n_docs,
       CAST(SUM(n_straddle) AS BIGINT) AS n_straddle,
       {quant_sql("SUM(n_straddle) * 1.0 / SUM(n_docs)", 6)}
         AS straddle_rate,
       CAST(SUM((t_tokens + budget - 1) // budget * budget - t_tokens)
            AS BIGINT) AS tail_waste_tokens,
       {quant_sql(
           "SUM((t_tokens + budget - 1) // budget * budget - t_tokens)"
           " * 1.0 / SUM((t_tokens + budget - 1) // budget * budget)",
           6)} AS waste_frac
FROM per_source
GROUP BY budget
ORDER BY budget
""",
)
def packing_efficiency_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing efficiency at context budgets
    {_PACK_BUDGETS}: per budget, the total context count, document
    straddle count/rate (docs a tokenizer would split across contexts
    — attention-mask pollution), and tail padding (the last partial
    bin per source stream). ``sequence_pack_bins`` materializes the
    layout for ONE budget; this sweeps the budgets a training run
    chooses between — longer contexts straddle more documents but
    waste less tail, and the curve quantifies that trade-off from the
    real corpus instead of a rule of thumb.

    Determinism: offsets are exact BIGINT cumulative sums over the
    per-source doc order (same window as ``sequence_pack_bins``);
    bin arithmetic is integer floor-division on non-negative values
    (identical in both engines); two quantized rate divisions.

    Scale: ONE per-source cumulative window over the doc stream (the
    pack-bins plan, sub-shardable the same way), a x{len(_PACK_BUDGETS)}
    constant budget fan-out, two grouped folds. Nothing new touches
    corpus grain more than once.

    No reference analogue; extends SURVEY §2's LLM-pipeline family.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(_toks()).cast("long").alias("n_tokens")
    )
    w_off = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = docs.select(
        "source",
        "n_tokens",
        F.coalesce(F.sum("n_tokens").over(w_off), F.lit(0))
        .cast("long")
        .alias("off"),
    )
    budgets = spark.createDataFrame(
        [(b,) for b in _PACK_BUDGETS], "budget long"
    )
    straddle = (
        F.expr("(off + n_tokens - 1) div budget") > F.expr("off div budget")
    ).cast("int")
    per_source = (
        placed.crossJoin(F.broadcast(budgets))
        .groupBy("budget", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("t_tokens"),
            F.sum(straddle).cast("long").alias("n_straddle"),
        )
    )
    n_bins = F.expr("(t_tokens + budget - 1) div budget")
    waste = n_bins * F.col("budget") - F.col("t_tokens")
    return (
        per_source.groupBy("budget")
        .agg(
            F.sum(n_bins).cast("long").alias("n_bins"),
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("n_straddle").cast("long").alias("n_straddle"),
            quant(
                F.sum("n_straddle") * 1.0 / F.sum("n_docs"), 6
            ).alias("straddle_rate"),
            F.sum(waste).cast("long").alias("tail_waste_tokens"),
            quant(
                F.sum(waste) * 1.0 / F.sum(n_bins * F.col("budget")), 6
            ).alias("waste_frac"),
        )
        .orderBy("budget")
    )
