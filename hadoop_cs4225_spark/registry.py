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
#: ROUND-8 ROTATION (this window): round 7's window went 50/50 green
#: (49 hash-match + 1 declared no-oracle), bringing the cross-round
#: union to 223/246. The 23 queries registered during round 7 AFTER
#: that window froze (enumerated as the backlog in this docstring last
#: round) lead this window — all 23 oracled and replica-green at
#: sf0.001/0.01/0.1 on every pytest run. Two float/decimal-heavy
#: re-anchors follow for drift detection, then round-8's new
#: registrations fill the remaining slots so they earn driver rows in
#: the same round they land (no new backlog). Everything rotated out
#: stays verified by the local oracle replica
#: (tests/test_oracle_parity.py runs every oracle on every pytest run)
#: plus the sf0.01/sf0.1 scale pins.
_PRIORITY = (
    # --- round-7 backlog: registered after the r7 window froze ---
    "source_trimmed_stats_pandas",   # grouped-agg pandas UDF trimmed stats
    "doc_subword_stats_iterpandas",  # scalar-iter pandas UDF BPE-ish stats
    "lang_id_agreement_kappa",       # Cohen's kappa heuristic agreement
    "orders_priority_price_kendall", # Kendall tau-b concordance
    "orders_scan_observed",          # observe() metric accumulators
    "lineitem_correlation_matrix",   # Pearson correlation matrix
    "doc_len_tok_spearman",          # Spearman rank correlation
    "events_multires_rollup",        # multi-resolution time rollup
    "quality_score_auc",             # ROC AUC via rank-sum
    "hybrid_search_rrf",             # BM25+ANN reciprocal-rank fusion
    "ann_ndcg_audit",                # NDCG@k vs brute-force truth
    "mmr_diverse_topk",              # maximal-marginal-relevance rerank
    "source_length_w1_drift",        # Wasserstein-1 drift
    "source_token_waterfill",        # closed-form token water-filling
    "embedding_rp_distortion",       # JL random-projection distortion
    "source_bigram_perplexity",      # bigram LM perplexity per source
    "eval_ngram_novelty",            # eval-set n-gram novelty
    "customer_k_anonymity_audit",    # k-anonymity quasi-identifier audit
    "user_freq_cms_audit",           # count-min sketch + exact audit
    "user_distinct_hll_audit",       # HLL from first principles + audit
    "partkey_join_size_estimate",    # sum(cnt^2) join-size estimation
    "events_changepoint_day",        # max-split changepoint detection
    "lineitem_decision_stump",       # 1-level decision tree (gini)
    # --- re-anchors: float/decimal-heavy green + reference golden ---
    "q1_pricing_summary",
    "word_count",
    # --- round-8 additions (registered this round; driver rows now) ---
    "training_set_shards",           # materialized write-path read-back
    "source_length_welch_fdr",       # Welch t + Benjamini-Hochberg FDR
    "order_value_conformal_coverage",  # split-conformal interval audit
    "quality_brier_decomposition",   # Murphy Brier decomposition
    "bigram_kneser_ney_topk",        # interpolated KN smoothing
    "textrank_keywords_topk",        # weighted PageRank keywords
    "supplier_adamic_adar_topk",     # common-neighbor link prediction
    "doc_prefix_dup_groups",         # first-16-token prefix dedup
    "label_centroid_cosine",         # integer-grid centroid cosines
    "eval_bloom_decon_audit",        # Bloom filter + exact audit
    "order_value_histogram_quantiles",  # mergeable quantile sketch audit
    "lineitem_stump_cv",             # 3-fold stump cross-validation
    "jaccard_prefix_filter_pairs",   # PPJoin-style exact set-sim join
    "events_daily_hll_rollup",       # per-day HLL + 7-day register union
    "contrastive_pairs_manifest",    # anchor/positive/negative manifest
    "vocab_good_turing_chao1",       # unseen-mass + richness estimators
    "nb_lang_classifier_acc",        # Naive Bayes held-out accuracy
    "customer_l_diversity_audit",    # l-diversity + entropy-l floor
    "orders_cuped_adjustment",       # CUPED variance reduction
    "lineitem_ridge_normal_eq",      # closed-form ridge via Cramer
    "kmv_distinct_sketch_audit",     # KMV/theta sketch + merge audit
    "events_attribution_weights",    # first/last/linear attribution
    "split_leakage_audit",           # near-dup train/test contamination
    "kmeans_simplified_silhouette",  # centroid-based cluster quality
    "part_name_fuzzy_pairs",         # lossless q-gram fuzzy string join
)

#: ROUND-9 ROTATION BACKLOG: queries registered in round 8 AFTER the
#: 50-slot window above filled. All oracled and replica-green at
#: sf0.001/0.01/0.1 locally (tests/test_oracle_parity.py covers them on
#: every pytest run); rotate them into _PRIORITY next round:
#:   token_context_entropy        (branching entropy for segmentation)
#:   quality_isotonic_calibration (PAV via the minimax identity)
#:   events_sprt_arms             (Wald sequential test over days)
#:   orders_did_estimator         (difference-in-differences + SE)
#:   lineitem_quantile_reg_grid   (tau=0.9 pinball-loss grid search)
#:   supplier_hits_scores         (HITS hubs/authorities, 3 rounds)
#:   basket_name_rules            (association rules: support/conf/lift)
#:   customer_rfm_migration       (segment transition matrix, fixed bands)
#:   media_chunk_dedup_ratio      (256-byte chunk-hash storage dedup)
#:   doc_readability_scores       (Flesch-style, vowel-run syllables)
#:   embedding_pca_two            (2nd principal direction by deflation)
#:   orders_negbin_overdispersion (Poisson vs NB dispersion diagnostic)
#:   supplier_kcore_peeling       (k-core via 3 unrolled peel rounds)
#:   dedup_methods_overlap        (exact-vs-LSH pair recall audit)


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
