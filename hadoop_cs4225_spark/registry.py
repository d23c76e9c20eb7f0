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
    "hadoop_cs4225_spark.sources.pydatasource",
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
#: ROUND-6 ROTATION: after the round-5 full rotation, exactly 15
#: registered queries had never earned a driver row (the 13 round-5
#: additions registered after that window froze, plus the two
#: documented pandas-UDF twins) and one query was red
#: (``topk_users_approx`` — driver canonicalizer choked on its old
#: array<struct> output; now flattened, see sketches.py). Those 16
#: lead this window. MID-ROUND WIDENING: 18 more queries were
#: registered later in round 6 after that set froze (the Python
#: data-source family, CDC apply, winnowing fingerprints, etc.);
#: since the driver's round-6 correctness run had not yet happened,
#: they take the next 18 slots so after round 6 EVERY registered
#: query has a driver CORRECTNESS row and the union is red-free. The
#: remaining 16 slots re-anchor drift detection, prioritized by
#: float/ulp sensitivity (the verdict-named six: dedup_clusters,
#: pagerank, shingle-idf, gram-topeig, q1, decimal_exact), the three
#: streaming batch twins (verdict task 6), the reference goldens, and
#: two round-1 shapes. Three in-window queries are rows-only by
#: design (approx_top_k tie order / numpy-reassociated pandas twins);
#: each carries a pytest accuracy or JVM-equivalence pin. Everything
#: rotated out stays verified by the local oracle replica
#: (tests/test_oracle_parity.py, all oracles every pytest run) plus
#: the sf0.01/sf0.1 scale pins.
#:
#: ROUND-7 ROTATION BACKLOG: queries registered AFTER this window froze
#: (late round 6) have never had a driver CORRECTNESS row and should
#: lead the next rotation — the late-session-2 set (source_length_powerlaw,
#: source_vocab_heaps, events_minute_peak, events_user_path_topk,
#: bigram_pmi_topk, source_dup_cross_matrix, lineitem_benford_audit,
#: events_weekly_seasonality, doc_zipf_fit, order_ship_delay_stats,
#: orders_param_sql_rollup, orders_sql_script_ewma, bm25_search_topk,
#: label_norm_stats_arrow) plus the session-3 algorithmic-analytics
#: family (skyline_orders_pareto, events_max_concurrency,
#: events_daily_cusum, events_count_acf, doc_mad_outliers,
#: kmeans_embedding_clusters, supplier_triangle_stats,
#: supplier_communities_lpa, term_keyness_llr, source_simpson_diversity,
#: lang_source_chi2, weighted_aes_sample, events_interval_coverage,
#: ship_delay_survival, orders_monthly_psi, source_vocab_jaccard,
#: orders_seasonal_decompose, quality_score_calibration,
#: doc_bigram_logprob, part_abc_classes, revenue_forecast_backtest,
#: source_length_ks, markov_next_event_accuracy, event_entropy_rate,
#: events_type_crosscorr, source_length_qnorm, source_mean_bootstrap_ci,
#: events_theilsen_trend, source_length_mannwhitney,
#: corpus_health_report, orders_revenue_runs_test, events_fano_factor).
#: All are locally
#: oracle-verified every pytest run; several scale-pinned.
_PRIORITY = (
    # --- the 15 never-driver-checked + the one red row ---
    "bucketed_segment_revenue",     # bucketed co-located join (bucketed.py)
    "bpe_pair_counts",              # BPE pair stats (pipeline_ops.py)
    "dedup_canonical_keep",         # canonical keep per cluster (dedup.py)
    "epoch_shard_plan",             # epoch shard assignment (pipeline_ops.py)
    "pq_code_histogram",            # product-quantization codes (pq.py)
    "pq_adc_query_topk",            # PQ asymmetric-distance top-k
    "ivf_pq_query_topk",            # IVF-PQ composed ANN
    "ivf_pq_index_probe",           # materialized DPP-pruned index probe
    "ann_recall_audit",             # cross-method recall@5 + regret audit
    "lsh_recall_audit",             # LSH pair recall vs bounded truth
    "events_hot_key_profile",       # skew profiling (partitioned.py)
    "events_zorder_scan",           # Z-order two-dimension data skipping
    "orders_schema_evolution_scan", # mergeSchema evolution (formats.py)
    "cosine_topk_pandas",           # pandas-UDF twin (rows-only; JVM-pinned)
    "label_centroid_stats",         # grouped-map twin (rows-only; numpy-pinned)
    "topk_users_approx",            # r5 red row, output flattened (rows-only)
    # --- late-round-6 additions, never driver-checked ---
    "ann_rerank_topk",              # coarse-filter + exact rerank ANN
    "dedup_cluster_size_histogram", # cluster-size distribution audit
    "doc_unigram_logprob",          # per-doc unigram LM logprob
    "doc_winnowing_fingerprints",   # winnowing fingerprint selection
    "duplicate_ngram_coverage",     # dup-ngram share per doc (join form)
    "event_transition_matrix",      # first-order type transitions
    "events_daily_ewma",            # recursive EWMA over daily counts
    "lang_confusion_matrix",        # lang-ID vs label confusion
    "order_trend_regression",       # per-segment OLS slope
    "order_window_rank_suite",      # rank/dense_rank/percent_rank suite
    "pyds_scan_rollup",             # custom Python data source scan
    "quality_filter_funnel",        # quality-gate survival funnel
    "shingle_containment_pairs",    # asymmetric containment pairs
    "source_kl_divergence",         # per-source KL vs corpus LM
    "user_event_map_algebra",       # map_zip/map_filter algebra
    "star_constraint_audit",        # star-schema data-contract audit
    "orders_cdc_apply",             # CDC changelog apply w/ tombstones
    "events_user_recency_churn",    # recency histogram + churn risk
    # --- re-anchors: verdict-named float-heavy greens ---
    "dedup_clusters",
    "pagerank_trade_network",
    "shingle_idf_similarity_topk",
    "embedding_gram_topeig",
    "q1_pricing_summary",
    "decimal_exact_revenue",
    # --- re-anchors: streaming batch twins (verdict task 6) ---
    "events_sliding_avg",
    "events_dedup_latest",
    "events_session_windows",
    # --- re-anchors: reference goldens ---
    "word_count",
    "topk_common_words_max",
    # --- this session's architecturally novel ops, never checked ---
    "per_source_doc_cap",      # bucketed exact per-source cap
    "user_activity_gini",      # two-level bounded rank-block Gini
    "order_fill_gap_cogroup",  # cogrouped-map pandas UDF
    "customer_rfm_segments",   # exact-tercile RFM grid
    "part_brand_affinity",     # basket lift, bounded pair fanout
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
