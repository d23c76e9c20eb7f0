"""Central query registry backing ``__spark_entry__.py``.

Every operator module registers its public queries here with an optional
DuckDB oracle SQL string. The driver contract (``__spark_entry__.py``):

- ``queries()[name](spark, sf_dir) -> DataFrame``
- ``oracle_sql()[name]`` -> ANSI SQL DuckDB runs on the same parquet
  (views: region nation customer supplier part orders lineitem events
  documents embeddings), compared by row-count + schema +
  order-insensitive value-hash.

Rules enforced by convention here (SURVEY.md §5/§7):
- every computed column is aliased identically in Spark and SQL;
- every top-k/limit query defines a total order (deterministic ties);
- floating aggregates are rounded on both sides (ulp-reassociation
  differences between engines would break exact value-hashing).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

#: Modules whose import populates the registry.
_OPERATOR_MODULES = (
    "hadoop_cs4225_spark.operators.wordcount",
    "hadoop_cs4225_spark.operators.relational",
    "hadoop_cs4225_spark.operators.windows",
    "hadoop_cs4225_spark.operators.funcs",
    "hadoop_cs4225_spark.operators.text_analysis",
    "hadoop_cs4225_spark.operators.dedup",
    "hadoop_cs4225_spark.operators.similarity",
    "hadoop_cs4225_spark.operators.pq",
    "hadoop_cs4225_spark.operators.ann_audit",
    "hadoop_cs4225_spark.operators.events_windows",
    "hadoop_cs4225_spark.operators.partitioned",
    "hadoop_cs4225_spark.operators.multimodal_ops",
    "hadoop_cs4225_spark.operators.joins_advanced",
    "hadoop_cs4225_spark.operators.sql_frontend",
    "hadoop_cs4225_spark.operators.tpch_more",
    "hadoop_cs4225_spark.operators.sketches",
    "hadoop_cs4225_spark.operators.udtf_ops",
    "hadoop_cs4225_spark.operators.cogroup_ops",
    "hadoop_cs4225_spark.operators.mining",
    "hadoop_cs4225_spark.operators.algo_ops",
    "hadoop_cs4225_spark.operators.clustering",
    "hadoop_cs4225_spark.operators.formats",
    "hadoop_cs4225_spark.operators.sampling",
    "hadoop_cs4225_spark.operators.pipeline_ops",
    "hadoop_cs4225_spark.operators.packing",
    "hadoop_cs4225_spark.operators.graph",
    "hadoop_cs4225_spark.operators.linalg",
    "hadoop_cs4225_spark.operators.bucketed",
    "hadoop_cs4225_spark.operators.training_set",
    "hadoop_cs4225_spark.operators.pandas_agg",
    "hadoop_cs4225_spark.operators.observability",
    "hadoop_cs4225_spark.sources.pydatasource",
    # composes text_analysis/similarity/pq queries+oracles (must
    # import after them, like ann_audit)
    "hadoop_cs4225_spark.operators.retrieval",
    # must stay LAST: composes registered queries/oracles from the
    # modules above (the ann_audit composition discipline)
    "hadoop_cs4225_spark.operators.health",
)

_loaded = False

#: Size of the driver's correctness window — the first N queries in
#: ``queries()`` iteration order get driver CORRECTNESS rows. Shared by
#: bench.py (headline split) and tests/test_oracle_parity.py so the two
#: can never silently diverge from ``_PRIORITY``.
PRIORITY_WINDOW = 50


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add ``fn`` to the registry under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every operator module (idempotent)."""
    global _loaded
    if _loaded:
        return
    for mod in _OPERATOR_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            # Modules land milestone by milestone; only swallow the
            # "module itself not written yet" case.
            if mod.split(".")[-1] not in str(e):
                raise
    _loaded = True


#: Driver-correctness priority window. The driver records CORRECTNESS
#: rows for the FIRST 50 queries in ``queries()`` iteration order.
#: ROUND-7 ROTATION (this window): after round 6 the cross-round union
#: covered every query registered before the late-round-6 additions.
#: Exactly 46 registered queries had never earned a driver CORRECTNESS
#: row when this window was cut — the late-session-2 set (14: powerlaw
#: through label_norm_stats_arrow) plus the session-3
#: algorithmic-analytics family (32: skyline through fano factor). All
#: 46 lead this window (45 oracled + label_norm_stats_arrow, a
#: rows-only mapInArrow twin with a JVM-equivalence pytest pin). The
#: 47th slot is ``events_zorder_scan``: green in r06 but VACUOUS (its
#: old predicate matched 0 rows at sf0.01, so rows/hash proved
#: nothing); the predicate literals are now frozen to bounds populated
#: at every SF and the query re-enters the window to earn a
#: non-vacuous row. The last 3 slots re-anchor drift detection with
#: the verdict-named float/decimal-heavy greens plus the reference
#: golden. Everything rotated out stays verified by the local oracle
#: replica (tests/test_oracle_parity.py runs all 211 oracles every
#: pytest run) plus the sf0.01/sf0.1 scale pins.
#:
#: ROUND-8 ROTATION BACKLOG: queries registered during round 7 AFTER
#: this window froze have no driver row yet and lead the next rotation:
#: source_trimmed_stats_pandas, doc_subword_stats_iterpandas,
#: lang_id_agreement_kappa, orders_priority_price_kendall,
#: orders_scan_observed, lineitem_correlation_matrix,
#: doc_len_tok_spearman, events_multires_rollup, quality_score_auc,
#: hybrid_search_rrf, ann_ndcg_audit, mmr_diverse_topk,
#: source_length_w1_drift, source_token_waterfill,
#: embedding_rp_distortion, source_bigram_perplexity,
#: eval_ngram_novelty, customer_k_anonymity_audit, user_freq_cms_audit,
#: user_distinct_hll_audit, partkey_join_size_estimate,
#: events_changepoint_day, lineitem_decision_stump (all oracled and
#: replica-green at sf0.001/0.01/0.1 in-round; see tests).
_PRIORITY = (
    # --- late-session-2 round-6 additions, never driver-checked ---
    "source_length_powerlaw",      # CCDF power-law tail fit
    "source_vocab_heaps",          # Heaps' law vocab growth
    "events_minute_peak",          # peak-minute detection
    "events_user_path_topk",       # top event-type paths per user
    "bigram_pmi_topk",             # PMI collocations
    "source_dup_cross_matrix",     # cross-source duplicate matrix
    "lineitem_benford_audit",      # Benford first-digit audit
    "events_weekly_seasonality",   # day-of-week seasonality
    "doc_zipf_fit",                # Zipf rank-frequency fit
    "order_ship_delay_stats",      # ship-delay distribution
    "orders_param_sql_rollup",     # parameterized SQL rollup
    "orders_sql_script_ewma",      # SQL-scripting EWMA
    "bm25_search_topk",            # BM25 ranked retrieval
    "label_norm_stats_arrow",      # mapInArrow twin (rows-only; JVM-pinned)
    # --- session-3 algorithmic-analytics family, never checked ---
    "skyline_orders_pareto",       # Pareto skyline
    "events_max_concurrency",      # sweep-line max concurrency
    "events_daily_cusum",          # CUSUM drift detection
    "events_count_acf",            # autocorrelation function
    "doc_mad_outliers",            # histogram-median MAD outliers
    "kmeans_embedding_clusters",   # Lloyd k-means, integer grid
    "supplier_triangle_stats",     # triangle counting
    "supplier_communities_lpa",    # label propagation communities
    "term_keyness_llr",            # G-squared keyness
    "source_simpson_diversity",    # Simpson diversity index
    "lang_source_chi2",            # chi-squared independence
    "weighted_aes_sample",         # A-ES weighted sampling
    "events_interval_coverage",    # interval union coverage
    "ship_delay_survival",         # Kaplan-Meier-style survival
    "orders_monthly_psi",          # population stability index
    "source_vocab_jaccard",        # pairwise vocab Jaccard
    "orders_seasonal_decompose",   # seasonal decomposition
    "quality_score_calibration",   # calibration bins + ECE
    "doc_bigram_logprob",          # bigram LM log-prob
    "part_abc_classes",            # ABC Pareto classes
    "revenue_forecast_backtest",   # forecast backtest MAPE
    "source_length_ks",            # Kolmogorov-Smirnov two-sample
    "markov_next_event_accuracy",  # Markov next-event eval
    "event_entropy_rate",          # Markov entropy rate
    "events_type_crosscorr",       # lagged cross-correlation
    "source_length_qnorm",         # rank-based quantile norm
    "source_mean_bootstrap_ci",    # Poisson bootstrap CI
    "events_theilsen_trend",       # Theil-Sen robust slope
    "source_length_mannwhitney",   # Mann-Whitney U rank-sum
    "corpus_health_report",        # composed health scorecard
    "orders_revenue_runs_test",    # Wald-Wolfowitz runs test
    "events_fano_factor",          # Fano-factor burstiness
    # --- vacuous-row fix: predicate now populated at every SF ---
    "events_zorder_scan",          # Z-order two-dimension data skipping
    # --- round-7 addition: end-to-end pipeline composition ---
    "corpus_to_training_set",      # dedup->quality->decon->cap->pack
    # --- re-anchors: float/decimal-heavy green + reference golden ---
    "q1_pricing_summary",
    "word_count",
)


def _prioritized(d: dict) -> dict:
    """Priority names first (in _PRIORITY order), the rest in
    registration order — dict insertion order carries the contract."""
    out = {n: d[n] for n in _PRIORITY if n in d}
    out.update((n, v) for n, v in d.items() if n not in out)
    return out


def get_queries() -> dict[str, QueryFn]:
    load_all()
    return _prioritized(QUERIES)


def get_oracles() -> dict[str, str]:
    load_all()
    return _prioritized(ORACLES)
