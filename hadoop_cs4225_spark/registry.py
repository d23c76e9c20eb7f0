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
#: ROUND-10 ROTATION (this window): round 9's window went 50/50 green,
#: bringing the cross-round union to 319/323 driver-checked with zero
#: red rows ever. This window closes the remaining gap and starts the
#: STALENESS rotation (VERDICT r9 task 4): (1) the 4-query round-9
#: backlog leads (the only registered queries without a driver row);
#: (2) round-10's new registrations follow so they earn driver rows
#: the same round they land; (3) the remaining slots hold the 36
#: queries whose driver rows are OLDEST (last checked r01-r03 —
#: includes the byte-exact golden ``topk_common_words_min`` and the
#: two documented rows-only entries ``approx_distinct_parts`` /
#: ``orders_profile``, whose weaker rows-only check refreshes too).
#: After this window lands, every registered query has a driver row
#: and the maximum row age drops from 9 rounds to 5. Everything
#: rotated out stays verified by the local oracle replica
#: (tests/test_oracle_parity.py runs every oracle on every pytest run)
#: plus the sf0.01/sf0.1 scale pins.
_PRIORITY = (
    # --- round-9 backlog: registered after the r9 window froze ---
    "token_window_pmi_topk",         # windowed NPMI collocations
    "orders_periodogram_power",      # Goertzel power, dominant period
    "supplier_personalized_pagerank",  # seed-teleport PPR + residual
    "embedding_maxsim_topk",         # late-interaction MaxSim retrieval
    # --- round-10 additions (registered this round; driver rows now) ---
    "orders_kaplan_meier",           # product-limit survival, censored
    "lineitem_theil_decomposition",  # within/between-nation inequality
    "lineitem_unpivot_profile",      # UNPIVOT melt + per-measure stats
    "token_chi2_feature_topk",       # chi-square characteristic tokens
    "doc_repetition_scores",         # Gopher intra-doc repetition gate
    "winnowing_dup_pairs",           # MOSS fingerprint pair join
    "embedding_signq_hamming_topk",  # 1-bit quantization + Hamming scan
    "ann_lsh_knn_graph_stats",       # bucket-local kNN-graph audit
    "supplier_ktruss_peeling",       # edge-support truss decomposition
    "customer_t_closeness_audit",    # sensitive-distribution drift gate
    # --- staleness rotation: driver rows last refreshed r01-r03 ---
    "topk_common_words_min",         # reference golden, variant 1
    "topk_words_per_lang",
    "q5_local_supplier_volume",
    "q6_revenue_forecast",
    "q4_order_priority",
    "q18_large_volume_orders",
    "customer_order_counts",
    "customers_without_orders",
    "big_spender_customers",
    "region_status_grid",
    "brand_revenue",
    "skew_salted_agg",
    "approx_distinct_parts",         # rows-only (HLL sketch, README.md)
    "customer_running_spend",
    "order_neighbors",
    "region_nation_rollup",
    "status_priority_cube",
    "returnflag_qty_pivot",
    "nation_customer_lists",
    "order_quartiles",
    "event_props_extract",
    "event_type_prop_stats",
    "string_edit_distance",
    "conditional_expr_coverage",
    "doc_token_stats",
    "doc_quality_scores",
    "lang_id_heuristic",
    "doc_fingerprints",
    "clean_corpus_stats",
    "token_positions",
    "ngram_jaccard_topk",
    "ann_lsh_multiprobe_topk",
    "cosine_topk_brute",
    "weighted_minhash_signatures",
    "events_range_join",
    "orders_profile",                # rows-only (pandas twin, README.md)
)

#: ROUND-11 ROTATION BACKLOG: queries registered after this round's
#: 50-slot window filled (the established pattern: oracled and
#: replica-green at sf0.001/0.01/0.1 on every pytest run, pending
#: driver rows only); rotate them into _PRIORITY next round:
#:   orders_weibull_delay_fit     (Weibull-plot OLS duration fit)
#:   events_burst_scan_statistic  (sliding 60-min scan vs Poisson)
#:   lineitem_boosted_stumps      (2-round LS-Boost histogram algebra)
#:   source_char_entropy          (char-level compressibility bound)
#: batch 2 (same discipline — oracled, replica-green, invariant-tested
#: in tests/test_round11_batch2.py):
#:   orders_ar2_yule_walker       (AR(2)/PACF from exact moments)
#:   orders_spectral_entropy      (spectral entropy + flatness)
#:   ship_delay_nelson_aalen      (cumulative hazard, shared KM table)
#:   events_allan_variance        (dyadic block-mean stability curve)
#:   orders_holt_linear_smoothing (level+trend recursion, CTE oracle)
#:   customer_spend_lorenz_gini   (Lorenz curve + grouped Gini)
#: batch 3 (tests/test_round11_batch3.py):
#:   trade_bfs_hop_histogram      (frontier BFS vs recursive-CTE oracle)
#:   simhash_band_dup_pairs       (banded 60-bit SimHash near-dup join)
#:   parquet_footer_stats_audit   (distributed footer-stats invariant)
#: batch 4 (tests/test_round11_batch4.py):
#:   bpe_merge_rounds             (iterative BPE trainer, 3 unrolled)
#:   kmv_intersection_audit       (theta-sketch set intersection)
#:   events_interarrival_fit      (exp/gamma point-process fit)
#:   orders_mann_kendall_trend    (tie-corrected monotonic-trend test)
#:   supplier_neighbor_jaccard_topk (neighbor-set structural similarity)
#:   tokenizer_fertility_by_source (apply the learned BPE merges)
#:   span_corruption_manifest     (T5-style deterministic masking plan)
#: batch 5 (tests/test_round11_batch5.py):
#:   doc_fluency_outlier_gate     (perplexity-filter gate, shared LM)
#:   packing_efficiency_curve     (context-length packing trade-off)
#:   trade_degree_powerlaw        (degree-tail Hill fit per node kind)
#:   ship_delay_km_by_segment     (stratified product-limit survival)
#:   orders_logrank_test          (two-group censored comparison)
#: With the r10 staleness rotation landed, next round's window should
#: continue refreshing the OLDEST remaining driver rows (r04-r05) in
#: the slots these ten leave free.

def warm_shared_frames(spark: SparkSession, sf_dir: str) -> int:
    """Materialize every session-memoized shared frame (the dedup
    ``_memo`` family) ahead of timing. bench.py calls this from its
    warmup so the first query of a memo-sharing family is not charged
    the whole family's pipeline build: round 8's driver bench charged
    12.7 s to the window's first query purely for running first, and
    the comparator then had to adjudicate a fake 12x flag (VERDICT r8
    task 4). Each frame is bounded (short rows, capped fan-out), so
    warming is a constant-cost preamble at any SF. Returns the number
    of frames materialized."""
    load_all()
    from hadoop_cs4225_spark.operators.algo_ops import (
        _daily_counts,
        _orders_daily_counts,
        _transition_counts,
    )
    from hadoop_cs4225_spark.operators.dedup import (
        _cluster_labels,
        _memo,
        _verified_pairs,
    )
    from hadoop_cs4225_spark.operators.graph import (
        _mutual_topk_edges,
        _trade_edges,
    )
    from hadoop_cs4225_spark.operators.similarity import (
        _assigned_frame,
        _bucketed_frame,
    )

    builders = (
        lambda: _memo(
            spark, sf_dir, "lsh_pairs", lambda: _verified_pairs(spark, sf_dir)
        ),
        lambda: _cluster_labels(spark, sf_dir),
        lambda: _bucketed_frame(spark, sf_dir),
        lambda: _assigned_frame(spark, sf_dir),
        lambda: _mutual_topk_edges(spark, sf_dir),
        lambda: _trade_edges(spark, sf_dir),
        lambda: _daily_counts(spark, sf_dir),
        lambda: _orders_daily_counts(spark, sf_dir),
        lambda: _transition_counts(spark, sf_dir),
    )
    for build in builders:
        # count() forces the lazy localCheckpoint to actually run; the
        # memo then hands the materialized frame to every consumer.
        build().count()
    return len(builders)


def warm_derived_layouts(spark: SparkSession, sf_dir: str) -> int:
    """Materialize every mtime-guarded DERIVED LAYOUT (partitioned /
    bucketed / z-ordered tables, the IVF-PQ index, the dirty JSONL
    feed) ahead of timing (VERDICT r9 task 6): these are write-once
    physical designs a cluster deployment builds as a pipeline step,
    so the bench should measure the PROBE cost of
    ``ivf_pq_index_probe`` / ``bucketed_segment_revenue`` /
    the partition-pruning family — not charge whichever query runs
    first with the one-off layout build. Idempotent (each ensure_* is
    freshness-guarded on the source parquet mtime). Returns the number
    of layouts ensured."""
    load_all()
    from hadoop_cs4225_spark.operators.bucketed import (
        _BUCKETED,
        ensure_bucketed,
    )
    from hadoop_cs4225_spark.operators.formats import (
        ensure_orders_jsonl_dirty,
    )
    from hadoop_cs4225_spark.operators.partitioned import (
        ensure_events_by_day,
        ensure_events_by_user,
        ensure_events_nested,
        ensure_events_zorder,
    )
    from hadoop_cs4225_spark.operators.pq import ensure_ivf_pq_index

    n = 0
    for ensure in (
        ensure_events_by_day,
        ensure_events_nested,
        ensure_events_zorder,
        ensure_events_by_user,
        ensure_ivf_pq_index,
        ensure_orders_jsonl_dirty,
    ):
        ensure(spark, sf_dir)
        n += 1
    for t, k in _BUCKETED:
        ensure_bucketed(spark, sf_dir, t, k)
        n += 1
    return n


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
