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
#: ROUND-11 ROTATION (this window, VERDICT r10 tasks 1+8): round 10's
#: window went 48/50 hash-green (+2 declared rows-only), making the
#: cross-round union 333/358 with zero red rows ever. This window
#: (1) leads with ALL 25 round-11 backlog queries — the only
#: registered queries without a driver row (registered after the r10
#: window froze; each oracle-replica-green on every pytest run and
#: SCALING.md-probed) — so never-checked returns to 0; and
#: (2) fills the remaining 25 slots from the 41 queries whose driver
#: rows are oldest (r04), capability anchors first (dedup/ANN/
#: streaming-shape/partition-pruning/recursive + the TPC-H refreshes
#: and the ``orders_profile_exact`` audit twin). The 16 r04 rows left
#: over (feature-extraction and small-relational shapes, listed below)
#: are the r12 rotation seed; max row age after r11 = 7 rounds for
#: exactly those 16. Goldens are fresh (word_count r8,
#: topk_common_words_max r9 via the entry smoke every round,
#: topk_common_words_min r10). NET-NEW REGISTRATION FREEZE: r11 adds
#: no new queries (VERDICT r10 task 2) so the window catches up.
_PRIORITY = (
    # --- round-11 backlog batch 1 ---
    "orders_weibull_delay_fit",      # Weibull-plot OLS duration fit
    "events_burst_scan_statistic",   # sliding 60-min scan vs Poisson
    "lineitem_boosted_stumps",       # 2-round LS-Boost histogram algebra
    "source_char_entropy",           # char-level compressibility bound
    # --- backlog batch 2 ---
    "orders_ar2_yule_walker",        # AR(2)/PACF from exact moments
    "orders_spectral_entropy",       # spectral entropy + flatness
    "ship_delay_nelson_aalen",       # cumulative hazard, shared KM table
    "events_allan_variance",         # dyadic block-mean stability curve
    "orders_holt_linear_smoothing",  # level+trend recursion, CTE oracle
    "customer_spend_lorenz_gini",    # Lorenz curve + grouped Gini
    # --- backlog batch 3 ---
    "trade_bfs_hop_histogram",       # frontier BFS vs recursive-CTE oracle
    "simhash_band_dup_pairs",        # banded 60-bit SimHash near-dup join
    "parquet_footer_stats_audit",    # distributed footer-stats invariant
    # --- backlog batch 4 ---
    "bpe_merge_rounds",              # iterative BPE trainer, 3 unrolled
    "kmv_intersection_audit",        # theta-sketch set intersection
    "events_interarrival_fit",       # exp/gamma point-process fit
    "orders_mann_kendall_trend",     # tie-corrected monotonic-trend test
    "supplier_neighbor_jaccard_topk",  # neighbor-set structural sim
    "tokenizer_fertility_by_source",   # apply the learned BPE merges
    "span_corruption_manifest",      # T5-style deterministic masking
    # --- backlog batch 5 ---
    "doc_fluency_outlier_gate",      # perplexity-filter gate, shared LM
    "packing_efficiency_curve",      # context-length packing trade-off
    "trade_degree_powerlaw",         # degree-tail Hill fit per node kind
    "ship_delay_km_by_segment",      # stratified product-limit survival
    "orders_logrank_test",           # two-group censored comparison
    # --- staleness rotation: 25 of the 41 r04 driver rows ---
    "minhash_lsh_dup_pairs",         # dedup flagship
    "embedding_near_dup_lsh",
    "dedup_exact_summary",
    "decontamination_overlap",
    "ann_lsh_query_topk",
    "ivf_ann_query_topk",
    "minhash_signatures",
    "simhash_fingerprints",
    "tfidf_top_terms",
    "doc_repetition_signals",
    "documents_stratified_sample",
    "sequence_pack_bins",
    "events_asof_join",
    "events_tumbling_counts",
    "events_partition_pruned_day",
    "events_funnel_conversion",
    "events_cohort_retention",
    "recursive_order_chain",
    "orders_upsert_merge",
    "orders_profile_exact",          # audit twin of orders_profile
    "q2_min_balance_supplier",
    "q3_shipping_priority",
    "q8_market_share",
    "q11_important_part_values",
    "q21_waiting_suppliers",
)

#: ROUND-12 ROTATION SEED: the 16 r04 driver rows that did not fit the
#: r11 window (all feature-extraction / small-relational shapes, each
#: still oracle-replica-checked every pytest run):
#:   customer_30day_window_spend, doc_sentences_udtf,
#:   embedding_array_features, event_props_map, lineitem_math_features,
#:   media_frame_chunks, media_metadata_stats, nation_presence_setops,
#:   order_date_features, order_value_percentiles,
#:   orders_csv_scan_rollup, part_string_features,
#:   revenue_grouping_sets, segment_account_stats,
#:   supplier_nation_full_join, top_orders_per_customer
#: After these, continue with the r05 cohort (49 rows).

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
        _brute_topk_frame,
        _bucketed_frame,
    )

    builders = (
        lambda: _memo(
            spark, sf_dir, "lsh_pairs", lambda: _verified_pairs(spark, sf_dir)
        ),
        lambda: _cluster_labels(spark, sf_dir),
        lambda: _bucketed_frame(spark, sf_dir),
        lambda: _assigned_frame(spark, sf_dir),
        lambda: _brute_topk_frame(spark, sf_dir),
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
    from hadoop_cs4225_spark.operators.dedup import (
        ensure_minhash_sig_index,
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
        ensure_minhash_sig_index,
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
