"""Physical-plan assertions: the scale posture is part of correctness.

Each flagship query must compile to the plan we would want on a
1000-executor cluster — pushdown at the scan, broadcast for dims,
distributed top-k — not merely any plan that returns the right rows.
"""

from __future__ import annotations

import pytest

from hadoop_cs4225_spark import registry
from hadoop_cs4225_spark.plans.explain import audit_plan, plan_string
from tests.conftest import SF_ORACLE

registry.load_all()


def _df(spark, name):
    return registry.QUERIES[name](spark, SF_ORACLE)


def test_q6_filters_pushed_to_scan(spark):
    plan = plan_string(_df(spark, "q6_revenue_forecast"))
    assert "PushedFilters: [" in plan
    # The shipdate range + quantity predicates must reach parquet.
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400]
    assert "l_quantity" in plan.split("PushedFilters")[1][:400]


def test_q3_autobroadcasts_customer_dim(spark):
    df = _df(spark, "q3_shipping_priority")
    plan = plan_string(df)
    # customer fits under autoBroadcastJoinThreshold at this SF, so the
    # planner must still pick a broadcast join WITHOUT a forced hint —
    # the logical plan carries none (a forced hint would OOM at 100×).
    assert "BroadcastHashJoin" in plan
    assert "ResolvedHint" not in plan_string(df, "extended")
    # Global top-k must be the distributed heap, not a full sort.
    assert "TakeOrderedAndProject" in plan


def test_q5_all_dims_broadcast(spark):
    df = _df(spark, "q5_local_supplier_volume")
    plan = plan_string(df)
    # 4 broadcast joins (customer, supplier, nation, region) — nation/
    # region by hint (bounded), customer/supplier by size estimation;
    # orders⋈lineitem may be SMJ/SHJ — but never a cartesian.
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan


#: Queries whose logical plans must carry NO forced broadcast hint:
#: every relation they join grows linearly with SF (customer, part,
#: supplier, per-key aggregates), so a hint would bypass
#: autoBroadcastJoinThreshold and OOM executors at large SF. The
#: physical plan may still broadcast — that's AQE/size-estimation
#: choosing at runtime, which is the posture we want.
#: (Queries joining nation/region or 1-row scalars — q5, q10, q15,
#: q20 — keep those bounded hints by design and are not listed.)
_NO_FORCED_HINT = [
    "q3_shipping_priority",
    "q18_large_volume_orders",
    "brand_revenue",
    "q14_promo_revenue_ratio",
    "q17_small_quantity_revenue",
    "q19_disjunctive_predicates",
    # tfidf_top_terms left this list in round 3: its only hint is now the
    # bounded 1-row corpus-count broadcast (replacing a driver-side
    # .count()), same pattern as q22/q11 which are also not listed; its
    # df-side join still carries no hint.
]


@pytest.mark.parametrize("name", _NO_FORCED_HINT)
def test_scale_growing_joins_carry_no_hint(spark, name):
    df = _df(spark, name)
    assert "ResolvedHint" not in plan_string(df, "extended")
    phys = plan_string(df)
    assert "CartesianProduct" not in phys
    assert "BroadcastNestedLoopJoin" not in phys


def test_topk_is_distributed_heap(spark):
    plan = plan_string(_df(spark, "topk_common_words_max"))
    assert "TakeOrderedAndProject" in plan
    # Stopword filter must be a broadcast anti-join.
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_wordcount_partial_aggregation(spark):
    plan = plan_string(_df(spark, "word_count"))
    # Partial (map-side) + final aggregation: two HashAggregate levels.
    assert plan.count("HashAggregate") >= 2
    # AQE's formatted plan hides codegen markers pre-execution; the
    # codegen-mode explain shows the compiled subtrees.
    assert "WholeStageCodegen" in plan_string(_df(spark, "word_count"), "codegen")


def test_scan_prunes_columns(spark):
    plan = plan_string(_df(spark, "word_count"))
    # documents has 5 columns; the scan must read only `text`.
    readschema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" in readschema
    for col in ("doc_id", "lang", "source", "n_chars"):
        assert col not in readschema


def test_lsh_join_is_equi_join_not_cartesian(spark):
    plan = plan_string(_df(spark, "minhash_lsh_dup_pairs"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


#: Queries that intentionally use a non-equi or cross join on a BOUNDED
#: slice (all-pairs baselines, grid expansion, 1-row broadcast query
#: vectors). Everything else must never plan a cartesian/nested-loop.
_BOUNDED_ALLPAIRS = {
    # --- round-10 additions (all 1-row / dictionary-bounded sides) ---
    "orders_kaplan_meier",  # broadcast 1-row cohort-total cross join
    "lineitem_theil_decomposition",  # broadcast 1-row grand-total cross join
    "token_chi2_feature_topk",  # broadcast 1-row corpus-count cross join
    "embedding_signq_hamming_topk",  # broadcast 1-row query-vector cross join
    "ann_lsh_knn_graph_stats",  # broadcast 1-row stats/mutual/isolated joins
    "supplier_ktruss_peeling",  # per-round 1-row edge-count cross joins
    "customer_t_closeness_audit",  # 5-row segment dict x group dict + 1-row N
    # --- round-12 (1-row side) ---
    "orders_seasonal_naive_mase",  # broadcast 1-row max-month cross join
    # --- round-13 (ID-bounded query side, the cosine_topk_brute class) ---
    "embedding_knn_label_noise",  # broadcast 40-row audit-query cross join
    # --- round-11 backlog (1-row / histogram-bounded sides) ---
    "orders_weibull_delay_fit",  # broadcast 1-row cohort-total cross join
    "lineitem_boosted_stumps",  # 1-row total/argmax joins on the 50-row hist
    "region_status_grid",
    "ngram_jaccard_topk",
    "embedding_near_dup_pairs",
    "cosine_topk_brute",
    "cosine_topk_pandas",
    "ann_lsh_buckets",
    "ann_lsh_query_topk",
    "ann_lsh_multiprobe_topk",
    "q22_idle_rich_customers",  # broadcast scalar-avg cross join (1 row)
    "supplier_triangle_stats",  # three 1-row scalar aggregates cross-joined
    "term_keyness_llr",  # broadcast 1-row corpus-total cross join
    "lang_source_chi2",  # broadcast 1-row dims cross join
    "orders_monthly_psi",  # bounded month x 10-bin grid + 1-row global
    "quality_score_calibration",  # broadcast 1-row total cross join
    "doc_bigram_logprob",  # broadcast 1-row vocabulary-size cross join
    "part_abc_classes",  # broadcast 1-row total-revenue cross join
    "source_length_ks",  # bounded sources x value-domain grid + 1-row total
    "event_entropy_rate",  # broadcast 1-row marginal-entropy cross join
    "events_type_crosscorr",  # broadcast 5-row lag-grid cross join
    "source_length_qnorm",  # bounded rank-interval range join vs value-domain histogram
    "source_mean_bootstrap_ci",  # broadcast 32-row replica-grid cross join
    "source_length_mannwhitney",  # broadcast 1-row total + tie-sum cross joins
    "corpus_health_report",  # embeds the registered check plans (ann_audit discipline)
    "orders_revenue_runs_test",  # broadcast 1-row median cross join
    "q11_important_part_values",  # broadcast scalar-threshold cross join (1 row)
    "tfidf_top_terms",  # broadcast 1-row corpus-count cross join
    "shingle_idf_similarity_topk",  # broadcast 1-row corpus-count cross join
    "pagerank_trade_network",  # broadcast 1-row |V| cross join
    "source_mixture_weights",  # broadcast 1-row normalizer cross joins
    "embedding_gram_topeig",  # broadcast 1-row norm/Rayleigh cross joins
    "order_value_winsorized",  # broadcast 1-row percentile-threshold cross join
    "mixture_weighted_sample",  # broadcast 1-row normalizer cross joins
    "pq_adc_query_topk",  # broadcast 1-row ADC distance-table cross join
    "lsh_recall_audit",  # id-bounded all-pairs ground truth + 1-row cross join
    "ann_recall_audit",  # embeds the brute/ANN top-k plans + 1-row cross joins
    "events_hot_key_profile",  # broadcast 1-row totals cross join
    "doc_unigram_logprob",  # broadcast 1-row corpus-total cross join
    "dedup_cluster_size_histogram",  # broadcast 1-row corpus-total cross joins
    "source_kl_divergence",  # broadcast 1-row corpus-total cross join
    "events_user_recency_churn",  # broadcast 1-row corpus-max cross join
    "customer_rfm_segments",  # broadcast 1-row bound + tercile-threshold cross joins
    "part_brand_affinity",  # broadcast 1-row order-count cross join
    "bigram_pmi_topk",  # broadcast 1-row corpus-total cross join
    "lineitem_benford_audit",  # broadcast 1-row total cross join
    "bm25_search_topk",  # broadcast 1-row corpus-stats cross join
    "lang_id_agreement_kappa",  # broadcast 1-row margin-product cross join
    # ≤100-cell grid self-join (b.i > a.i non-equi) + 1-row cross joins
    "orders_priority_price_kendall",
    "doc_len_tok_spearman",  # broadcast 1-row correlation cross joins
    "quality_score_auc",  # broadcast 1-row class-totals cross join
    "source_length_w1_drift",  # bounded sources x value-domain grid + 1-row total
    "hybrid_search_rrf",  # embeds the bm25/cosine 1-row corpus-stat cross joins
    "ann_ndcg_audit",  # embeds the brute/ANN top-k plans + 1-row IDCG cross join
    "mmr_diverse_topk",  # POOL^2=100-row candidate self-join + 1-row cross joins
    "source_token_waterfill",  # broadcast 1-row budget/level cross joins
    "source_bigram_perplexity",  # broadcast 1-row vocabulary-size cross join
    "user_distinct_hll_audit",  # broadcast 1-row exact-count cross join
    "partkey_join_size_estimate",  # broadcast 1-row totals cross join
    "events_changepoint_day",  # broadcast 1-row totals cross join
    "lineitem_decision_stump",  # broadcast 1-row totals cross join
    # --- round 8 ---
    "quality_brier_decomposition",  # broadcast 1-row corpus-moment cross join
    "bigram_kneser_ney_topk",  # broadcast 1-row continuation-total cross join
    "textrank_keywords_topk",  # broadcast 1-row |V| cross join per iteration
    "source_length_welch_fdr",  # 20-row p-value self-join + 1-row m/threshold
    "lineitem_stump_cv",  # 3-fold histogram non-equi join (fold-bounded)
    "eval_bloom_decon_audit",  # broadcast 1-row filter-cardinality cross join
    "events_daily_hll_rollup",  # calendar-bounded days x register range join
    "contrastive_pairs_manifest",  # broadcast 1-row doc-count cross join
    "nb_lang_classifier_acc",  # broadcast 1-row vocab-size cross join
    "split_leakage_audit",  # four 1-row count aggregates cross-joined
    "orders_cuped_adjustment",  # broadcast 1-row theta frame x 2 arm rows
    "quality_isotonic_calibration",  # 10-row bin-grid self-joins (<= B^3)
    "events_sprt_arms",  # calendar-bounded |days|^2 cumulative self-join
    "lineitem_quantile_reg_grid",  # broadcast constant 21-row grid fanout
    "supplier_hits_scores",  # broadcast 1-row round-max cross joins
    "basket_name_rules",  # broadcast 1-row order-count cross join
    "customer_rfm_migration",  # broadcast 1-row tercile-threshold frame
    "embedding_pca_two",  # broadcast 1-row norm/eig/trace cross joins
    "supplier_kcore_peeling",  # three 1-row round-count cross joins
    "dedup_methods_overlap",  # three 1-row pair-count cross joins
    # --- round 9 ---
    "token_burstiness",  # broadcast 1-row doc-count cross join
    "token_coverage_curve",  # 4-row k-grid x 1-row totals cross join
    "priority_returnflag_mutual_info",  # broadcast 1-row total cross joins
    "lineitem_logit_fisher_step",  # broadcast 1-row beta-vector cross join
    "customer_order_gap_geomfit",  # broadcast 1-row p-hat x 9-cell grid
    "events_markov_stationary",  # broadcast 1-row |states|/residual joins
    "lineitem_weighted_quantiles",  # 9-decile x domain-bounded histogram range join
    "orders_hurst_rs",  # 3-row window grid fanout + 1-row slope cross join
    "lineitem_simpson_slopes",  # broadcast 1-row sign-flip cross join
    "lineitem_two_way_interaction",  # broadcast 1-row grand-total cross join
    "lineitem_return_rate_eb_topk",  # broadcast 1-row global-rate cross join
    "orders_jsonl_malformed_audit",  # three 1-row count aggregates cross-joined
    "supplier_communities_lpa",  # broadcast 1-row change-count cross join
    # --- round-10 backlog ---
    "token_window_pmi_topk",  # broadcast 1-row pair/unigram-total cross joins
    "orders_periodogram_power",  # 5-row period grid + 1-row moment cross joins
    "supplier_personalized_pagerank",  # broadcast 1-row seed-count cross joins
    # --- round-11 batch 2 (1-row / constant-grid sides) ---
    "orders_spectral_entropy",  # 10-row period grid + 1-row moment/fold joins
    "ship_delay_nelson_aalen",  # broadcast 1-row cohort-total cross join
    "events_allan_variance",  # broadcast 4-row dyadic tau-grid fan-out
    "customer_spend_lorenz_gini",  # 1-row totals + 1-row Gini-fold cross joins
    "trade_bfs_hop_histogram",  # broadcast 1-row |V| + 1-row seed cross joins
    "bpe_merge_rounds",  # per-round broadcast 1-row top-pair/vocab joins
    "tokenizer_fertility_by_source",  # embeds the trainer's 1-row joins
    "kmv_intersection_audit",  # |types|^2 dictionary-bounded theta pairs
    "orders_mann_kendall_trend",  # calendar-bounded |days|^2 sign self-join
    "doc_fluency_outlier_gate",  # 1-row median/MAD threshold cross joins
    "packing_efficiency_curve",  # broadcast 3-row budget-grid fan-out
    "orders_logrank_test",  # broadcast 2-row group grid over bounded days
}


@pytest.fixture(scope="module")
def all_query_frames(spark):
    """Every registered query's DataFrame, built ONCE for all
    registry-wide plan audits — construction is not free (iterative
    dedup label propagation, eager localCheckpoints, .derived layout
    writes), so each audit re-building all ~144 frames would double the
    suite's bench-box load."""
    return {
        name: fn(spark, SF_ORACLE) for name, fn in registry.QUERIES.items()
    }


def test_no_unbounded_cartesian_anywhere(spark, all_query_frames):
    violations = []
    for name, df in all_query_frames.items():
        if name in _BOUNDED_ALLPAIRS:
            continue
        plan = plan_string(df)
        for op in ("CartesianProduct", "BroadcastNestedLoopJoin"):
            if op in plan:
                violations.append(f"{name}: {op}")
    assert not violations, violations


#: Queries whose partition-less Window runs over a frame BOUNDED by
#: construction (constant size regardless of corpus rows) — the only
#: acceptable use. Everything else must partition its windows: a
#: partition-less Window single-threads the whole input through one
#: task ("WindowExec: No Partition Defined" — the round-3 bench
#: warning, and a guaranteed straggler at 100 TB).
#:
#: ROUND 8: each entry now carries its documented bound as a ROW COUNT
#: CEILING, and test_bounded_global_window_inputs EXECUTES every
#: partition-less Window's input subplan and asserts the count — so
#: "bounded by construction" is enforced, not asserted in a comment
#: (a future edit that grows a frame to corpus grain fails the test:
#: at sf0.001 the corpus tables are already 500-6000 rows, above every
#: tight bound here). Empirical inputs are flat across sf0.001/sf0.01
#: (e.g. KS histogram 311->313, seasonal months 80->80, rrf arms
#: 10->10), confirming the scale-invariance claim.
_BOUNDED_GLOBAL_WINDOW = {
    # cumulative offsets over the per-quality-value count aggregate:
    # bounded by the 6-dp quantized score GRID (score domain, not
    # corpus rows; empirically saturates ~500)
    "curriculum_phase_bins": 1_000_001,
    # bucket-level cumulative over the (count >> 20) bucket-total frame:
    # ≤ max_per_user_count/2^20 rows (< 2^20 below a trillion events per
    # user) whatever the user count; the per-value window is partitioned
    "user_activity_gini": 1 << 20,
    # row_number over the ALREADY-LIMITed top-1000 token frame — the
    # distributed top-k runs first, the window sees ≤1000 rows
    "doc_zipf_fit": 1000,
    # cross-bucket max-day scan over the price-BUCKET table: row count
    # = price domain / 1024 (dictionary range, not corpus rows); the
    # per-price windows are partitioned by bucket
    "skyline_orders_pareto": 65_536,
    # power-iteration norm windows over the d-row vector frame (d=64
    # dimensions, constant at any corpus size — r14: replaced the
    # per-step 1-row broadcast crossJoins, which each cost a job)
    "embedding_gram_topeig": 64,
    "embedding_pca_two": 64,
    # row_number over the ALREADY-LIMITed k-row seed frame (k=4)
    "kmeans_embedding_clusters": 4,
    # same LIMIT-k seed window via the shared _kmeans_frames fixpoint
    "kmeans_simplified_silhouette": 4,
    # margin windows over the CELLS table — bounded by the lang x
    # source domain (dictionary cross product), not corpus rows
    "lang_source_chi2": 4096,
    # centered-MA window over the CALENDAR-bounded monthly frame
    "orders_seasonal_decompose": 256,
    # trailing-window backtest over the same calendar-bounded frame
    "revenue_forecast_backtest": 256,
    # descending cumulative over the (r >> 20) revenue-BUCKET table
    # (bounded below a trillion-dollar part, the Gini bound argument);
    # the per-part window is partitioned by bucket
    "part_abc_classes": 1 << 20,
    # corpus-CDF cumulative over the VALUE-DOMAIN-bounded length
    # histogram (doc_mad_outliers discipline; n_chars domain)
    "source_length_ks": 65_536,
    # same bounded corpus-histogram cumulatives (value-domain axis)
    "source_length_qnorm": 65_536,
    "source_length_mannwhitney": 65_536,
    # embeds the KS/MWU/seasonal constituents' bounded windows
    "corpus_health_report": 65_536,
    # sign-change lag over the CALENDAR-bounded monthly frame
    "orders_revenue_runs_test": 256,
    # at-risk / product-limit cumulatives over the HORIZON-bounded day
    # axis (censoring at 60 days caps the frame at 61 rows)
    "orders_kaplan_meier": 64,
    # Weibull-plot CDF cumulative over the [1, 365]-day fit domain
    "orders_weibull_delay_fit": 366,
    # split-search cumulatives over the bounded quantity histogram
    # (~50 distinct TPC-H quantities; two rounds share the bound)
    "lineitem_boosted_stumps": 64,
    # midrank cumulatives over the two VALUE-DOMAIN-bounded integer
    # histograms (n_chars / token-count domains), never corpus rows
    "doc_len_tok_spearman": 65_536,
    # midrank cumulative over the score histogram (bounded 1e6 grid)
    "quality_score_auc": 1_000_001,
    # same bounded corpus-histogram cumulatives as KS (shared CDF CTEs)
    "source_length_w1_drift": 65_536,
    # row_number over the two ALREADY-LIMITed 10-row retrieval arms
    "hybrid_search_rrf": 20,
    # row_number over the ALREADY-LIMITed 10-row brute ground truth
    "ann_ndcg_audit": 60,
    # rank windows over the ALREADY-LIMITed 10-row candidate pool
    "mmr_diverse_topk": 30,
    # cumulative supply over the SOURCE-DOMAIN-bounded k-row frame
    "source_token_waterfill": 64,
    # prefix sums + argmax over the CALENDAR-bounded daily frame
    "events_changepoint_day": 4096,
    # prefix sums + argmin over the VALUE-DOMAIN-bounded cents histogram
    "lineitem_decision_stump": 65_536,
    # rank + cumulative over the ALREADY-LIMITed top-10k vocab frame
    "token_coverage_curve": 10_000,
    # cumulative over the VALUE-DOMAIN-bounded unit-price cents histogram
    "lineitem_weighted_quantiles": 1_048_576,
    # decile cumulatives over the VALUE-DOMAIN-bounded dollar histogram
    # (extendedprice dictionary range), then totals over the 10-bin frame
    "lineitem_woe_iv": 1 << 17,
    # day-index row_number over the CALENDAR-bounded daily frame
    "orders_hurst_rs": 4096,
    # 7/28-day ROWS frames + lag over the CALENDAR-bounded daily frame
    "orders_daily_ma_crossover": 4096,
    # lag-1/lag-2 over the CALENDAR-bounded daily frame
    "orders_ar2_yule_walker": 4096,
    # day-index row_number over the CALENDAR-bounded daily frame
    "orders_spectral_entropy": 4096,
    # at-risk cumulatives over the HORIZON-bounded day axis (KM twin)
    "ship_delay_nelson_aalen": 64,
    # cumulative pop/spend over the SPEND-DOMAIN-bounded bucket axis
    # (range / $1024 — the skyline/part_abc bucket argument)
    "customer_spend_lorenz_gini": 1 << 20,
    # median/MAD cumulatives over the CENTINAT-bounded fluency histogram
    # (log-prob domain, the doc_mad_outliers argument)
    "doc_fluency_outlier_gate": 65_536,
}


def _partitionless_window_inputs(df) -> list:
    """JVM logical plans of the INPUT (child) of every Window node with
    an EMPTY partitionSpec in the optimized logical plan (plan-string
    parsing is ambiguous — the JVM tree is not)."""
    jplan = df._jdf.queryExecution().optimizedPlan()
    out = []
    stack = [jplan]
    while stack:
        node = stack.pop()
        if node.nodeName() == "Window" and node.partitionSpec().isEmpty():
            out.append(node.children().apply(0))
        for i in range(node.children().length()):
            stack.append(node.children().apply(i))
    return out


def test_no_unbounded_global_window_anywhere(spark, all_query_frames):
    """No registered query may sort the full input through a single
    task via a partition-less Window (rank/ntile/cumsum without
    PARTITION BY). Bounded-frame exceptions are allowlisted with the
    bound stated."""
    violations = []
    for name, df in all_query_frames.items():
        if name in _BOUNDED_GLOBAL_WINDOW:
            continue
        if _partitionless_window_inputs(df):
            violations.append(name)
    assert not violations, violations


def test_bounded_global_window_inputs(spark, all_query_frames):
    """ENFORCE the allowlist's boundedness claims: execute each
    allowlisted query's partition-less Window input subplan and assert
    its row count stays under the documented ceiling. A refactor that
    silently grows a "bounded" frame to corpus grain (the failure mode
    the allowlist comments could only describe, not detect) now fails
    here — at this SF the corpus tables already exceed every tight
    bound (documents=500, orders=1.5k, lineitem=6k)."""
    from pyspark.sql import DataFrame as _PyDF

    jvm = spark._jvm
    violations = []
    for name, bound in _BOUNDED_GLOBAL_WINDOW.items():
        df = all_query_frames.get(name)
        if df is None:
            violations.append(f"{name}: allowlisted but not registered")
            continue
        for child in _partitionless_window_inputs(df):
            jdf = jvm.org.apache.spark.sql.classic.Dataset.ofRows(
                spark._jsparkSession, child
            )
            n = _PyDF(jdf, spark).count()
            if n > bound:
                violations.append(f"{name}: window input {n} > bound {bound}")
    assert not violations, violations


def test_audit_helper_reports_violations(spark):
    df = _df(spark, "q6_revenue_forecast")
    assert audit_plan(df, require=("PushedFilters",)) == []
    assert audit_plan(df, require=("NoSuchOperator",)) == ["missing: NoSuchOperator"]


def test_partitioned_events_scan_prunes(spark):
    """The date filter must prune at the DIRECTORY level (PartitionFilters),
    not merely as a row-group/data filter — the central 100 TB claim for
    the events layout."""
    plan = plan_string(_df(spark, "events_partition_pruned_day"))
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters")[1][:200]
    assert "event_date" in pf and "2024-01-15" in pf


def test_clustered_scan_pushes_range_filter(spark):
    """The user-range predicate must reach the parquet scan as
    PushedFilters — with the user-sorted layout, that is what lets
    row-group min/max stats skip everything outside the range."""
    plan = plan_string(_df(spark, "events_clustered_user_scan"))
    assert "PushedFilters" in plan
    pf = plan.split("PushedFilters")[1][:250]
    assert "user_id" in pf and ("GreaterThanOrEqual" in pf or ">=" in pf)


def test_zorder_scan_pushes_both_dimensions(spark):
    """BOTH the user-range and the ts-range predicates must reach the
    parquet scan as PushedFilters — the Z-ordered layout's row groups
    are compact in (user, day) rectangles, so min/max stats prune on
    the conjunction. A to_date(ts) formulation would silently lose the
    ts pushdown (function-wrapped column), which is why the query
    states the day filter as a raw timestamp range."""
    import re

    plan = plan_string(_df(spark, "events_zorder_scan"))
    assert "PushedFilters" in plan
    pf = plan.split("PushedFilters")[1][:400]
    assert "user_id" in pf
    # word-boundary match on the ts column itself (a bare "ts" substring
    # would false-positive on any plan text containing those letters)
    assert re.search(r"(GreaterThanOrEqual|LessThan|IsNotNull)\(ts[,)]", pf), pf


def test_ivf_pq_index_probe_prunes_partitions_dynamically(spark):
    """The materialized IVF-PQ index is partitioned by centroid_id; the
    probe joins a 1-row query frame against it, and Catalyst must insert
    a dynamic-partition-pruning subquery so the scan reads only the
    query's inverted-list directory — the physical claim the index
    layout exists to make."""
    df = _df(spark, "ivf_pq_index_probe")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), "no DPP subquery in probe scan"


def test_runtime_bloom_filter_injects_on_selective_fact_join(spark):
    """At 100 TB, a selective dim/fact filter should cut the other join
    side's shuffle via Catalyst's runtime bloom-filter injection
    (InjectRuntimeFilter). Cluster-default thresholds (creation side
    >= 10MB scan) never trigger at test SF, so thresholds are lowered
    here to prove the plan shape the production config produces."""
    from pyspark.sql import functions as F

    from hadoop_cs4225_spark.sources.tables import load_table

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, SF_ORACLE, "lineitem")
        orders = load_table(spark, SF_ORACLE, "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partitions(spark):
    """Skewed fact keys must not serialize one reducer: AQE's runtime
    skew-join split (SortMergeJoin(skew=true)) is the no-code-change
    path at 100 TB (the explicit salting recipe in relational.py is the
    fallback for non-join aggs). Thresholds are lowered to make the
    tiny test shuffle register as skewed; cluster defaults (256MB
    advisory) produce the same split on real skew."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        big = spark.range(0, 201000).select(
            F.when(F.col("id") < 200000, 0)
            .otherwise(F.col("id") % 100)
            .alias("k"),
            F.col("id").alias("v"),
        )
        dim = spark.range(0, 100).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = big.join(dim, "k").groupBy().agg(F.count(F.lit(1)).alias("n"))
        assert j.collect()[0]["n"] == 201000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_nested_schema_pruning_narrows_read(spark):
    """The nested rollup must scan struct<etype> ONLY — not k/value/day."""
    plan = plan_string(_df(spark, "nested_struct_pruned_rollup"))
    rs = plan.split("ReadSchema")[1][:300]
    assert "etype" in rs, rs
    for dropped in ("value", "day", '"k"', "k:int"):
        assert dropped not in rs, (dropped, rs)


def test_observe_metrics_ride_along(spark):
    """observe() collects data-quality metrics during the SAME job that
    answers the query — no second scan. The CollectMetrics node must be
    in the plan and the observed values must match an independent agg."""
    from pyspark.sql import functions as F

    from hadoop_cs4225_spark.plans.explain import observed_metrics
    from hadoop_cs4225_spark.sources.tables import load_table

    orders = load_table(spark, SF_ORACLE, "orders")
    instrumented, obs = observed_metrics(
        orders,
        "health",
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_custkey").isNull().cast("long")).alias("null_cust"),
    )
    result = (
        instrumented.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert "CollectMetrics" in plan_string(instrumented)
    got = obs.get
    assert got["n_rows"] == sum(r["n"] for r in result)
    assert got["null_cust"] == 0


def test_salted_join_matches_direct_and_scatters_keys(spark):
    """The salted fact-dim join must (a) produce exactly the direct
    join's aggregate result and (b) plan a non-broadcast shuffle join
    on (key, salt) when broadcast is disabled — |keys|*n_salt buckets
    instead of |keys| hot reducers."""
    from pyspark.sql import functions as F

    from hadoop_cs4225_spark.operators.relational import salted_join
    from hadoop_cs4225_spark.sources.tables import load_table

    li = load_table(spark, SF_ORACLE, "lineitem")
    dim = li.groupBy("l_returnflag").agg(F.avg("l_quantity").alias("flag_avg"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        salted = salted_join(
            li,
            dim,
            "l_returnflag",
            n_salt=8,
            salt_cols=("l_orderkey", "l_linenumber"),
        )
        agg = (
            salted.groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum((F.col("l_quantity") > F.col("flag_avg")).cast("long")).alias(
                    "above_avg"
                ),
            )
        )
        got = {r["l_returnflag"]: (r["n"], r["above_avg"]) for r in agg.collect()}
        plan = plan_string(salted)
        assert "BroadcastHashJoin" not in plan
        assert "__salt" in plan  # join key carries the salt
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    direct = (
        li.join(dim, "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("l_quantity") > F.col("flag_avg")).cast("long")).alias(
                "above_avg"
            ),
        )
    )
    want = {r["l_returnflag"]: (r["n"], r["above_avg"]) for r in direct.collect()}
    assert got == want


def test_bucketed_join_eliminates_shuffle(spark):
    """Both sides of the orders⋈customer join are bucketBy+sortBy on
    custkey with the same bucket count, so the join must plan as a
    SortMergeJoin with ZERO Exchange operators (the shuffle was
    pre-paid at write time) — the central bucketed-layout claim. Also
    asserts the registered rollup matches the raw-table join (layout is
    semantically transparent)."""
    from pyspark.sql import functions as F

    from hadoop_cs4225_spark.operators import bucketed
    from hadoop_cs4225_spark.sources.tables import load_table

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed.bucketed_join_frame(spark, SF_ORACLE)
        plan = plan_string(j)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    got = {
        r["c_mktsegment"]: (r["n_orders"], r["n_customers"], r["total_revenue"])
        for r in bucketed.bucketed_segment_revenue(spark, SF_ORACLE).collect()
    }
    raw = (
        load_table(spark, SF_ORACLE, "orders")
        .join(
            load_table(spark, SF_ORACLE, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.round(F.sum("o_totalprice"), 2).alias("total_revenue"),
        )
    )
    want = {
        r["c_mktsegment"]: (r["n_orders"], r["n_customers"], r["total_revenue"])
        for r in raw.collect()
    }
    assert got == want


def test_salted_join_default_salt_actually_scatters(spark):
    """The default (no salt_cols) path must still spread a hot key's
    rows across buckets — the whole point of salting. Deriving the
    default salt from the join key itself would give every row of a
    key the SAME salt (one bucket per key, zero mitigation); the
    monotonically_increasing_id fallback must produce many distinct
    salts per key, and the join must still match the direct join."""
    from pyspark.sql import functions as F

    from hadoop_cs4225_spark.operators.relational import salted_join
    from hadoop_cs4225_spark.sources.tables import load_table

    li = load_table(spark, SF_ORACLE, "lineitem")
    dim = li.groupBy("l_returnflag").agg(F.avg("l_quantity").alias("flag_avg"))
    salted = salted_join(li, dim, "l_returnflag", n_salt=8)
    assert salted.count() == li.count()
    # Re-derive the salt distribution the same way salted_join does:
    # every l_returnflag value must occupy >1 salt bucket.
    salts_per_key = (
        li.withColumn(
            "__salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(8))
        )
        .groupBy("l_returnflag")
        .agg(F.countDistinct("__salt").alias("n_salts"))
        .collect()
    )
    assert all(r["n_salts"] > 1 for r in salts_per_key), salts_per_key


def test_dup_ngram_coverage_uses_join_not_window(spark):
    """The shared-shingle count must be a groupBy+join, never a
    count-over-window partitioned by shingle: AQE can split a skewed
    JOIN partition, but a hot boilerplate shingle in a window partition
    buffers every occurrence in one task with no mitigation."""
    assert not _partitionless_window_inputs(
        _df(spark, "duplicate_ngram_coverage")
    )
    jplan = _df(spark, "duplicate_ngram_coverage")._jdf.queryExecution().optimizedPlan()
    stack, n_windows = [jplan], 0
    while stack:
        node = stack.pop()
        n_windows += node.nodeName() == "Window"
        for i in range(node.children().length()):
            stack.append(node.children().apply(i))
    assert n_windows == 0, "shingle counting regressed to a window"


def _count_scans(df, token: str = "Relation") -> int:
    jplan = df._jdf.queryExecution().optimizedPlan()
    stack, n = [jplan], 0
    while stack:
        node = stack.pop()
        n += node.nodeName() in ("LogicalRelation", "Relation")
        for i in range(node.children().length()):
            stack.append(node.children().apply(i))
    return n


def test_normalizer_queries_scan_their_table_once(spark):
    """The round-6 single-subtree rewrites are plan contracts: per-group
    normalizers come from windows over tiny AGGREGATED frames, so the
    corpus/fact table appears exactly once in the optimized plan —
    a totals self-join would double it and lean on ReuseExchange."""
    for name in ("lang_confusion_matrix", "event_transition_matrix"):
        n = _count_scans(_df(spark, name))
        assert n == 1, f"{name}: expected 1 table scan in plan, got {n}"


def test_multires_rollup_single_scan_cascade(spark):
    """The minute->hour->day cascade must read the events parquet
    exactly ONCE: coarser resolutions aggregate the previous aggregate
    (calendar-bounded frames), never the raw events again."""
    plan = plan_string(_df(spark, "events_multires_rollup"))
    # each physical scan prints one Location line (the tree line and its
    # numbered detail block would double-count "Scan parquet")
    assert plan.count("Location: InMemoryFileIndex") == 1, plan


def test_window_group_limit_pushdown(spark):
    """The rank-filter idiom must lower to WindowGroupLimit so each map
    task pre-prunes to its local top-k before the shuffle — the whole
    point of orders_window_group_limit_topn."""
    from hadoop_cs4225_spark import registry

    registry.load_all()
    df = registry.QUERIES["orders_window_group_limit_topn"](
        spark, "/root/testdata/sf0.001"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan[:2000]


def test_minhash_lsh_reads_materialized_signature_index(spark):
    """VERDICT r10 task 6: the batch LSH family must read signatures
    from the written ``.derived`` index (built once per corpus
    snapshot), not re-hash every shingle per session — pinned by (a)
    the index table carrying exactly the inline signature frame, and
    (b) the verified-pairs candidate stage scanning the index path."""
    from hadoop_cs4225_spark.operators.dedup import (
        _shingle_sets,
        _sig_index_frame,
        _verified_pairs_body,
        ensure_minhash_sig_index,
        signature_frame,
    )
    from hadoop_cs4225_spark.sources.tables import load_table

    path = ensure_minhash_sig_index(spark, SF_ORACLE)
    assert "documents_minhash_sigs" in path
    idx = spark.read.parquet(path)
    docs = load_table(spark, SF_ORACLE, "documents")
    inline = signature_frame(docs)
    assert sorted(map(tuple, idx.collect())) == sorted(
        map(tuple, inline.collect())
    )
    # plan pin: the candidate stage's scan location is the derived index
    sigs = _sig_index_frame(spark, SF_ORACLE)
    body = _verified_pairs_body(_shingle_sets(docs), sigs)
    # _verified_pairs_body ends in an eager localCheckpoint which erases
    # lineage; pin the scan on the sigs frame it consumed instead
    plan = sigs._jdf.queryExecution().executedPlan().toString()
    assert "documents_minhash_sigs" in plan, plan[:2000]
    assert body.columns == ["d1", "d2", "jaccard"]


def test_set_similarity_family_reads_shingle_postings_layout(spark):
    """VERDICT r11 task 4: the set-similarity family must read shingle
    sets from the written ``.derived`` postings layout (built once per
    corpus snapshot), not re-tokenize documents.text per query —
    pinned by (a) the layout carrying exactly the inline
    ``_shingle_sets`` frame, and (b) each family query's scan set
    including the layout path and EXCLUDING documents.parquet (the
    idf/decontamination queries keep a documents scan only for their
    1-row corpus-count aggregate)."""
    from hadoop_cs4225_spark import registry
    from hadoop_cs4225_spark.operators.dedup import (
        _shingle_sets,
        ensure_shingle_sets,
        shingle_sets_frame,
    )
    from hadoop_cs4225_spark.sources.tables import load_table

    path = ensure_shingle_sets(spark, SF_ORACLE)
    assert "documents_shingle_sets" in path
    docs = load_table(spark, SF_ORACLE, "documents")
    inline = _shingle_sets(docs)
    got = {
        (r.doc_id, tuple(sorted(r.sh)))
        for r in shingle_sets_frame(spark, SF_ORACLE).collect()
    }
    want = {(r.doc_id, tuple(sorted(r.sh))) for r in inline.collect()}
    assert got == want
    # ... and the statistics-bearing inverted index on top of it
    # (df/len/rn stored per posting) must carry exactly the inline
    # df-count + per-doc rank derivation.
    from hadoop_cs4225_spark.operators.dedup import (
        ensure_shingle_postings,
        shingle_postings_stats_frame,
    )
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    assert "documents_shingle_postings" in ensure_shingle_postings(
        spark, SF_ORACLE
    )
    sh = inline.select(
        "doc_id", F.size("sh").cast("long").alias("len"),
        F.explode("sh").alias("s"),
    )
    dfreq = sh.groupBy("s").agg(F.count(F.lit(1)).cast("long").alias("df"))
    wr = Window.partitionBy("doc_id").orderBy("df", "s")
    inline_stats = sh.join(dfreq, "s").select(
        "doc_id", "s", "df", "len", F.row_number().over(wr).alias("rn")
    )
    assert sorted(
        map(tuple, shingle_postings_stats_frame(spark, SF_ORACLE).collect())
    ) == sorted(map(tuple, inline_stats.collect()))

    registry.load_all()
    # Every family query keeps full lineage now (the checkpoints that
    # amortized the df join went with the join): pin the layout scan in
    # the physical plan and the ABSENCE of a documents.parquet scan —
    # shingle_idf keeps one documents scan for its 1-row corpus count.
    for name in (
        "jaccard_prefix_filter_pairs",
        "shingle_containment_pairs",
        "shingle_idf_similarity_topk",
        "eval_ngram_novelty",
        "weighted_minhash_signatures",
        "decontamination_overlap",
    ):
        df = registry.QUERIES[name](spark, SF_ORACLE)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "documents_shingle_" in plan, (name, plan[:2000])
        if name != "shingle_idf_similarity_topk":
            assert "documents.parquet" not in plan, (name, plan[:2000])


def test_prefix_filter_reads_pretruncated_slice(spark):
    """VERDICT r12 task 4: jaccard_prefix_filter_pairs' candidate join
    must scan the WRITTEN pre-truncated prefix slice (~(1-t) of the
    postings), not filter the full stats layout per run — pinned by
    (a) the slice carrying exactly the inline rn/df predicate over the
    stats layout, and (b) the query's plan scanning the slice path."""
    from hadoop_cs4225_spark import registry
    from hadoop_cs4225_spark.operators.dedup import (
        _PPJ_DF_CAP,
        _PPJ_T_DEN,
        _PPJ_T_NUM,
        ensure_shingle_prefix,
        shingle_postings_stats_frame,
        shingle_prefix_frame,
    )
    from pyspark.sql import functions as F

    path = ensure_shingle_prefix(spark, SF_ORACLE)
    assert "documents_shingle_prefix" in path
    p_len = (
        F.col("len")
        - F.expr(f"({_PPJ_T_NUM} * len + {_PPJ_T_DEN} - 1) div {_PPJ_T_DEN}")
        + 1
    )
    inline = (
        shingle_postings_stats_frame(spark, SF_ORACLE)
        .where((F.col("rn") <= p_len) & (F.col("df") <= _PPJ_DF_CAP))
        .select("doc_id", F.col("s").alias("tok"), "len", "rn")
    )
    got = sorted(map(tuple, shingle_prefix_frame(spark, SF_ORACLE).collect()))
    want = sorted(map(tuple, inline.collect()))
    assert got == want
    registry.load_all()
    df = registry.QUERIES["jaccard_prefix_filter_pairs"](spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "documents_shingle_prefix" in plan, plan[:2000]
    assert "documents.parquet" not in plan, plan[:2000]


def test_simhash_band_join_reads_materialized_fp_index(spark):
    """r12 (the ensure_minhash_sig_index precedent): the SimHash band
    join must read 60-bit fingerprints from the written .derived index
    — pinned by (a) the index carrying exactly the inline
    simhash60_frame, and (b) the query's scan set including the index
    path and excluding documents.parquet."""
    from hadoop_cs4225_spark.operators.dedup import (
        ensure_simhash_fp_index,
        simhash60_frame,
        simhash_fp_frame,
    )
    from hadoop_cs4225_spark.sources.tables import load_table

    path = ensure_simhash_fp_index(spark, SF_ORACLE)
    assert "documents_simhash60" in path
    docs = load_table(spark, SF_ORACLE, "documents")
    assert sorted(map(tuple, simhash_fp_frame(spark, SF_ORACLE).collect())) == sorted(
        map(tuple, simhash60_frame(docs).collect())
    )
    df = registry.QUERIES["simhash_band_dup_pairs"](spark, SF_ORACLE)
    plan = plan_string(df)
    assert "documents_simhash60" in plan, plan[:2000]
    assert "documents.parquet" not in plan, plan[:2000]
