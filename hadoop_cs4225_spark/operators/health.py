"""Corpus health scorecard — the one-page audit tying the pipeline's
quality checks together.

Seven registered checks, one row each: a metric, its budget, and a
pass flag. The composition discipline is ``ann_audit``'s: the Spark
side calls the REGISTERED query functions and the oracle embeds the
REGISTERED oracle strings as subqueries — both sides reuse the single
definition of each check, so the scorecard can never drift from the
checks it summarizes (and this module must import after its
constituents in the registry's module list).

Scale: each constituent runs its own (already scale-audited) plan; the
scorecard adds seven 1-row aggregates and a union — constant overhead.
Thresholds are fixed data-contract literals; every pass flag compares
the same quantized metric in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_cs4225_spark.functions.numeric import quant, quant_sql
from hadoop_cs4225_spark.registry import ORACLES, QUERIES, register

#: check name -> budget. ALL checks are upper bounds: pass iff
#: metric <= budget, hard-coded identically in the DataFrame path and
#: the generated oracle. A future lower-bound check (e.g. minimum
#: diversity) must negate its metric (report -metric with budget
#: -threshold) or extend BOTH paths with a per-check direction first.
_CHECKS = {
    "exact_dup_rate": 0.20,       # share of docs that are verbatim dups
    "psi_drift_months": 0.0,      # months tripping the PSI alarm
    "ks_rejections": 3.0,         # sources rejecting the KS test
    "mwu_rejections": 3.0,        # sources rejecting the rank-sum test
    "max_outlier_share": 0.05,    # worst per-source MAD outlier share
    "calibration_ece": 0.10,      # expected calibration error
    "lang_source_cramers_v": 0.30,  # lang/source association strength
}


def _oracle() -> str:
    checks = f"""
SELECT 'exact_dup_rate' AS check,
       {quant_sql("(n_docs - n_distinct_texts) * 1.0 / n_docs", 6)} AS metric
FROM ({ORACLES["dedup_exact_summary"]})
UNION ALL
SELECT 'psi_drift_months' AS check,
       CAST(SUM(CASE WHEN drift THEN 1 ELSE 0 END) AS DOUBLE) AS metric
FROM ({ORACLES["orders_monthly_psi"]})
UNION ALL
SELECT 'ks_rejections' AS check,
       CAST(SUM(CASE WHEN rejects THEN 1 ELSE 0 END) AS DOUBLE) AS metric
FROM ({ORACLES["source_length_ks"]})
UNION ALL
SELECT 'mwu_rejections' AS check,
       CAST(SUM(CASE WHEN rejects THEN 1 ELSE 0 END) AS DOUBLE) AS metric
FROM ({ORACLES["source_length_mannwhitney"]})
UNION ALL
SELECT 'max_outlier_share' AS check, MAX(outlier_share) AS metric
FROM ({ORACLES["doc_mad_outliers"]})
UNION ALL
SELECT 'calibration_ece' AS check,
       {quant_sql("SUM(ece_term)", 6)} AS metric
FROM ({ORACLES["quality_score_calibration"]})
UNION ALL
SELECT 'lang_source_cramers_v' AS check, MAX(cramers_v) AS metric
FROM ({ORACLES["lang_source_chi2"]})
"""
    budgets = " ".join(
        f"WHEN \"check\" = '{name}' THEN {b}" for name, b in _CHECKS.items()
    )
    return f"""
WITH checks AS ({checks})
SELECT "check", metric,
       CAST((CASE {budgets} END) AS DOUBLE) AS budget,
       CAST(metric <= CAST((CASE {budgets} END) AS DOUBLE) AS BOOLEAN) AS ok
FROM checks
ORDER BY "check"
"""


@register("corpus_health_report", oracle=_oracle())
def corpus_health_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seven-check corpus health scorecard (dedup rate, PSI drift, KS
    and Mann-Whitney distribution rejections, MAD outlier share,
    calibration ECE, lang/source association) — each metric computed
    by the REGISTERED check query and compared to a fixed budget."""
    dedup = QUERIES["dedup_exact_summary"](spark, sf_dir)
    psi = QUERIES["orders_monthly_psi"](spark, sf_dir)
    ks = QUERIES["source_length_ks"](spark, sf_dir)
    mwu = QUERIES["source_length_mannwhitney"](spark, sf_dir)
    mad = QUERIES["doc_mad_outliers"](spark, sf_dir)
    cal = QUERIES["quality_score_calibration"](spark, sf_dir)
    chi = QUERIES["lang_source_chi2"](spark, sf_dir)

    rows = [
        dedup.select(
            F.lit("exact_dup_rate").alias("check"),
            quant(
                (F.col("n_docs") - F.col("n_distinct_texts"))
                * 1.0
                / F.col("n_docs"),
                6,
            ).alias("metric"),
        ),
        psi.agg(
            F.sum(F.when(F.col("drift"), 1).otherwise(0))
            .cast("double")
            .alias("metric")
        ).select(F.lit("psi_drift_months").alias("check"), "metric"),
        ks.agg(
            F.sum(F.when(F.col("rejects"), 1).otherwise(0))
            .cast("double")
            .alias("metric")
        ).select(F.lit("ks_rejections").alias("check"), "metric"),
        mwu.agg(
            F.sum(F.when(F.col("rejects"), 1).otherwise(0))
            .cast("double")
            .alias("metric")
        ).select(F.lit("mwu_rejections").alias("check"), "metric"),
        mad.agg(F.max("outlier_share").alias("metric")).select(
            F.lit("max_outlier_share").alias("check"), "metric"
        ),
        cal.agg(quant(F.sum("ece_term"), 6).alias("metric")).select(
            F.lit("calibration_ece").alias("check"), "metric"
        ),
        chi.agg(F.max("cramers_v").alias("metric")).select(
            F.lit("lang_source_cramers_v").alias("check"), "metric"
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    budget = None
    for name, b in _CHECKS.items():
        cond = F.col("check") == name
        budget = F.when(cond, b) if budget is None else budget.when(cond, b)
    return (
        out.withColumn("budget", budget)
        .withColumn("ok", F.col("metric") <= F.col("budget"))
        .orderBy("check")
    )
