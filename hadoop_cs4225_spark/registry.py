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
    """Decorator: add ``fn`` to the registry under ``name``.

    Caller contract (ADVICE r13): a few queries ``persist()`` a
    per-invocation intra-query frame (basket pair generation, the
    byte-shingle set frame, the 5-gram explode) and cannot unpersist it
    before their terminal action runs. ``bench.py`` frees those blocks
    with ``spark.catalog.clearCache()`` after every timed query; any
    other long-lived session that invokes registered queries repeatedly
    should do the same (or accept evictable MEMORY_AND_DISK blocks
    accumulating for the session's lifetime). Session-memoized SHARED
    frames (``dedup._memo``) deliberately use ``localCheckpoint`` so
    they survive that ``clearCache``."""

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


#: PERMANENT window slots (VERDICT r11 task 5): the only queries tied
#: to the reference's own goldens (`/root/reference/input/answer{1,2}`
#: byte-exact replays + the WordCount contract) hold window seats every
#: round instead of rotating — the reference-faithful core must never
#: age out of driver verification. tests/test_oracle_parity.py asserts
#: membership; tests/test_golden_replay.py pins byte-exactness.
PERMANENT_PRIORITY = (
    "word_count",
    "topk_common_words_max",
    "topk_common_words_min",
)

#: Driver-correctness priority window. The driver records CORRECTNESS
#: rows for the FIRST 50 queries in ``queries()`` iteration order.
#: ROUND-13 ROTATION (VERDICT r12 task 1): round 12's window went
#: 50/50 green. This window = the 3 PERMANENT golden slots + the FOUR
#: r12 net-new registrations (never driver-checked; each oracled,
#: invariant-tested in tests/test_round12_ops.py, replica-verified
#: green at sf0.01 by the r12 judge) + the 18 r05-stale rows (the
#: oldest cohort: TPC-H q7 q9 q10 q12 q13 q14 q15 q16 q17 q19 q20 q22
#: plus six relational shapes) + 25 of the 45 r06 rows, capability
#: anchors first (dedup cluster family, shingle/winnowing
#: fingerprints, ANN/PQ audit+probe family, streaming-twin event
#: rollups, bucketed join, pagerank, CDC apply, schema evolution,
#: Python DataSource, map algebra). The 20 r06 rows left over
#: (incl. the three rows-only twins cosine_topk_pandas,
#: label_centroid_stats, topk_users_approx — each twin-checked every
#: pytest run) are the r14 rotation seed.
_PRIORITY = PERMANENT_PRIORITY + (
    # --- the 4 r12 net-new registrations (never driver-checked) ---
    "doc_keyword_tag_counts",
    "orders_seasonal_naive_mase",
    "embedding_residual_quant_audit",
    "dedup_survivorship_report",
    # --- the 18 r05-stale rows (oldest cohort) ---
    "q7_nation_volume_shipping",
    "q9_product_profit",
    "q10_returned_items",
    "q12_shipmode_priority",
    "q13_customer_order_histogram",
    "q14_promo_revenue_ratio",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q19_disjunctive_predicates",
    "q20_part_stock_suppliers",
    "q22_idle_rich_customers",
    "customer_order_multiset_ops",
    "event_props_variant",
    "nation_metrics_unpivot",
    "order_value_percentiles_approx",  # rows-only, twin-checked
    "order_value_winsorized",
    "parts_never_shipped",
    # --- 25 of the 45 r06 rows, capability anchors first ---
    "dedup_clusters",                # label-propagation dup clusters
    "dedup_canonical_keep",          # survivorship canonical pick
    "dedup_cluster_size_histogram",  # cluster-size profile
    "shingle_containment_pairs",     # asymmetric containment
    "shingle_idf_similarity_topk",   # idf-weighted set similarity
    "doc_winnowing_fingerprints",    # winnowing fingerprint index
    "duplicate_ngram_coverage",      # dup n-gram mass audit
    "ann_recall_audit",              # LSH recall vs brute truth
    "ann_rerank_topk",               # bucket+rerank ANN
    "lsh_recall_audit",              # recall ratio audit
    "ivf_pq_index_probe",            # written IVF-PQ index probe
    "ivf_pq_query_topk",             # IVF-PQ ADC query
    "pq_adc_query_topk",             # PQ asymmetric distance
    "pq_code_histogram",             # PQ code balance
    "embedding_gram_topeig",         # Gram top-eigenvector
    "events_session_windows",        # session windowing (stream twin)
    "events_sliding_avg",            # sliding windows (stream twin)
    "events_dedup_latest",           # keep-latest dedup (stream twin)
    "events_daily_ewma",             # EWMA smoothing
    "bucketed_segment_revenue",      # bucketed co-located join
    "pagerank_trade_network",        # iterative graph
    "orders_cdc_apply",              # CDC merge apply
    "orders_schema_evolution_scan",  # schema-evolution union
    "pyds_scan_rollup",              # Python DataSource scan
    "user_event_map_algebra",        # map-column algebra
)

def warm_shared_frames(spark: SparkSession, sf_dir: str) -> dict[str, float]:
    """Materialize every session-memoized shared frame (the dedup
    ``_memo`` family) ahead of timing. bench.py calls this from its
    warmup so the first query of a memo-sharing family is not charged
    the whole family's pipeline build: round 8's driver bench charged
    12.7 s to the window's first query purely for running first, and
    the comparator then had to adjudicate a fake 12x flag (VERDICT r8
    task 4). Each frame is bounded (short rows, capped fan-out), so
    warming is a constant-cost preamble at any SF.

    Returns per-frame build seconds keyed by frame name so bench.py can
    report what the untimed warmup actually costs (VERDICT r13 task 1:
    the warmup had become an invisible slice of real work).

    r14 (VERDICT r13 task 1): the five ANN method-RESULT memos
    (``similarity.method_topk_frame``) are deliberately NOT warmed any
    more — they are 5-row results of registered queries, and warming
    them moved entire method pipelines out of the timed region. The
    memo itself stays (two audit composers share it), but the FIRST
    timed audit composer now pays the family build, inside the timed
    region where it belongs."""
    import time as _time

    load_all()
    from hadoop_cs4225_spark.operators.algo_ops import (
        _daily_counts,
        _order_ship_durs,
        _orders_daily_counts,
        _transition_counts,
    )
    from hadoop_cs4225_spark.operators.dedup import (
        _cluster_labels,
        _memo,
        _verified_pairs,
    )
    from hadoop_cs4225_spark.operators.graph import (
        _hits_pairs,
        _mutual_topk_edges,
        _trade_deg,
        _trade_edges,
        _trade_edges_deg,
    )
    from hadoop_cs4225_spark.operators.clustering import (
        _kmeans_assign_frame,
        _kmeans_cent_frame,
    )
    from hadoop_cs4225_spark.operators.linalg import _gram_frame
    from hadoop_cs4225_spark.operators.similarity import (
        _assigned_frame,
        _brute_topk_frame,
        _bucketed_frame,
    )
    from hadoop_cs4225_spark.operators.text_analysis import (
        _bigram_doc_scores,
    )
    from hadoop_cs4225_spark.operators.training_set import _stage_flags

    builders = (
        # r13 optimization round: the shared fixpoints each consumed by
        # >= 2 registered queries (Gram matrix, k-means centroids +
        # assignment, per-doc bigram sums) — same discipline, same
        # bounded-rows argument.
        ("gram64", lambda: _gram_frame(spark, sf_dir)),
        ("kmeans_cent", lambda: _kmeans_cent_frame(spark, sf_dir)),
        ("kmeans_assign", lambda: _kmeans_assign_frame(spark, sf_dir)),
        ("blm_doc_scores", lambda: _bigram_doc_scores(spark, sf_dir)),
        (
            "lsh_pairs",
            lambda: _memo(
                spark,
                sf_dir,
                "lsh_pairs",
                lambda: _verified_pairs(spark, sf_dir),
            ),
        ),
        ("cluster_labels", lambda: _cluster_labels(spark, sf_dir)),
        ("sim_bucketed", lambda: _bucketed_frame(spark, sf_dir)),
        ("sim_assigned", lambda: _assigned_frame(spark, sf_dir)),
        ("sim_brute_topk", lambda: _brute_topk_frame(spark, sf_dir)),
        ("mutual_topk_edges", lambda: _mutual_topk_edges(spark, sf_dir)),
        ("trade_edges", lambda: _trade_edges(spark, sf_dir)),
        ("trade_deg", lambda: _trade_deg(spark, sf_dir)),
        ("trade_edges_deg", lambda: _trade_edges_deg(spark, sf_dir)),
        ("hits_pairs", lambda: _hits_pairs(spark, sf_dir)),
        ("daily_counts", lambda: _daily_counts(spark, sf_dir)),
        ("order_ship_durs", lambda: _order_ship_durs(spark, sf_dir)),
        ("orders_daily_counts", lambda: _orders_daily_counts(spark, sf_dir)),
        ("transition_counts", lambda: _transition_counts(spark, sf_dir)),
        ("stage_flags", lambda: _stage_flags(spark, sf_dir)),
    )
    timings: dict[str, float] = {}
    for name, build in builders:
        t0 = _time.perf_counter()
        # count() forces the lazy localCheckpoint to actually run; the
        # memo then hands the materialized frame to every consumer.
        build().count()
        timings[name] = round(_time.perf_counter() - t0, 3)
    return timings


def warm_derived_layouts(spark: SparkSession, sf_dir: str) -> dict[str, float]:
    """Materialize every mtime-guarded DERIVED LAYOUT (partitioned /
    bucketed / z-ordered tables, the IVF-PQ index, the dirty JSONL
    feed) ahead of timing (VERDICT r9 task 6): these are write-once
    physical designs a cluster deployment builds as a pipeline step,
    so the bench should measure the PROBE cost of
    ``ivf_pq_index_probe`` / ``bucketed_segment_revenue`` /
    the partition-pruning family — not charge whichever query runs
    first with the one-off layout build. Idempotent (each ensure_* is
    freshness-guarded on the source parquet mtime). Returns per-layout
    ensure seconds keyed by layout name, so bench.py can report what
    the untimed warmup costs (VERDICT r13 task 1; bench.py deletes the
    sf's ``.derived`` tree first so these are COLD build costs, not
    freshness checks)."""
    import time as _time

    load_all()
    from hadoop_cs4225_spark.operators.bucketed import (
        _BUCKETED,
        ensure_bucketed,
    )
    from hadoop_cs4225_spark.operators.dedup import (
        ensure_minhash_sig_index,
        ensure_shingle_postings,
        ensure_shingle_prefix,
        ensure_shingle_sets,
        ensure_simhash_fp_index,
        ensure_winnow_fp_index,
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
    from hadoop_cs4225_spark.operators.multimodal_ops import (
        ensure_byte_minhash_sigs,
        ensure_byte_shingle_sets,
    )
    from hadoop_cs4225_spark.operators.pq import ensure_ivf_pq_index
    from hadoop_cs4225_spark.operators.text_analysis import (
        ensure_ngram5_postings,
        ensure_token_counts,
        ensure_token_df,
    )

    timings: dict[str, float] = {}
    for ensure in (
        ensure_events_by_day,
        ensure_events_nested,
        ensure_events_zorder,
        ensure_events_by_user,
        ensure_ivf_pq_index,
        ensure_shingle_sets,  # before the postings/sig index, which read it
        ensure_shingle_postings,
        ensure_shingle_prefix,  # built FROM the postings stats layout
        ensure_minhash_sig_index,
        ensure_simhash_fp_index,
        ensure_winnow_fp_index,
        ensure_token_counts,  # before the df side table, which reads it
        ensure_token_df,
        ensure_ngram5_postings,
        ensure_byte_shingle_sets,  # before the byte sig index (built FROM it)
        ensure_byte_minhash_sigs,
        ensure_orders_jsonl_dirty,
    ):
        t0 = _time.perf_counter()
        ensure(spark, sf_dir)
        timings[ensure.__name__] = round(_time.perf_counter() - t0, 3)
    for t, k in _BUCKETED:
        t0 = _time.perf_counter()
        ensure_bucketed(spark, sf_dir, t, k)
        timings[f"bucketed_{t}"] = round(_time.perf_counter() - t0, 3)
    return timings


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
