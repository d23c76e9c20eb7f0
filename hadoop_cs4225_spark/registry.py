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
#: ROUND-12 ROTATION (VERDICT r11 tasks 3+5): round 11's window went
#: 50/50 green, returning never-checked to 0 (cross-round union
#: 358/358). This window = the 3 PERMANENT golden slots + the 16
#: remaining r04 driver rows (the oldest cohort) + 31 of the 49 r05
#: rows, capability anchors first (ANN buckets/IVF lists, embedding
#: stats/quant, sketches, streaming-shape event rollups, partition/
#: nested pruning, sampling/splits/mixing, the non-parquet format
#: round-trips, media byte features, SCD2, LATERAL). The 18 r05 rows
#: left over (all TPC-H/relational shapes: q7 q9 q10 q12 q13 q14 q15
#: q16 q17 q19 q20 q22, customer_order_multiset_ops,
#: event_props_variant, nation_metrics_unpivot,
#: order_value_percentiles_approx, order_value_winsorized,
#: parts_never_shipped — each oracle-replica-checked every pytest run)
#: are the r13 rotation seed, together with the FOUR r12 net-new
#: registrations (doc_keyword_tag_counts, orders_seasonal_naive_mase,
#: embedding_residual_quant_audit, dedup_survivorship_report — within
#: the <=15/round pace of VERDICT r11 task 3, each oracled,
#: invariant-tested in tests/test_round12_ops.py, and scale-probed).
_PRIORITY = PERMANENT_PRIORITY + (
    # --- the 16 remaining r04 rows (oldest cohort) ---
    "customer_30day_window_spend",
    "doc_sentences_udtf",
    "embedding_array_features",
    "event_props_map",
    "lineitem_math_features",
    "media_frame_chunks",
    "media_metadata_stats",
    "nation_presence_setops",
    "order_date_features",
    "order_value_percentiles",
    "orders_csv_scan_rollup",
    "part_string_features",
    "revenue_grouping_sets",
    "segment_account_stats",
    "supplier_nation_full_join",
    "top_orders_per_customer",
    # --- 31 of the 49 r05 rows, capability anchors first ---
    "ann_lsh_buckets",               # ANN bucket layout
    "embedding_near_dup_pairs",      # bounded exact near-dup pairs
    "ivf_inverted_lists",            # IVF coarse index
    "embedding_dim_stats",           # vector column stats
    "embedding_int8_quant",          # scalar quantization audit
    "event_freq_cms",                # native CMS (rows-only, twin-checked)
    "sketch_distinct_users_by_type",  # native HLL (rows-only, twin-checked)
    "events_daily_rollup",           # streaming-twin batch rollup
    "events_gapfill_daily",          # time-spine gap fill
    "events_rolling_active_users",   # rolling distinct window
    "events_daily_anomaly",          # z-score anomaly sweep
    "events_clustered_user_scan",    # row-group skipping (plan-asserted)
    "nested_struct_pruned_rollup",   # nested-schema pruning
    "documents_hash_sample",         # deterministic hash sampling
    "documents_split_stats",         # train/eval split audit
    "mixture_weighted_sample",       # data-mixing sampler
    "source_mixture_weights",        # mixing weight report
    "curated_split_manifest",        # curation manifest
    "curriculum_phase_bins",         # curriculum packing
    "binaryfile_docs_scan",          # binaryFile source
    "orders_jsonl_scan_rollup",      # JSONL source round-trip
    "orders_orc_scan_rollup",        # ORC source round-trip
    "orders_xml_scan_rollup",        # XML source round-trip
    "doc_unigram_entropy",           # quality signal
    "token_length_histogram",        # corpus length histogram
    "pii_redaction_scrub",           # PII scrub pass
    "doc_chunk_windows",             # chunking for retrieval
    "media_byte_features",           # mapInPandas byte features (rows-only)
    "media_byte_features_arrow",     # mapInArrow twin (rows-only)
    "user_state_scd2",               # SCD2 gaps-and-islands
    "lateral_top_customers",         # LATERAL correlated subquery
)

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
        lambda: _order_ship_durs(spark, sf_dir),
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
        ensure_shingle_postings,
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
    from hadoop_cs4225_spark.operators.pq import ensure_ivf_pq_index

    n = 0
    for ensure in (
        ensure_events_by_day,
        ensure_events_nested,
        ensure_events_zorder,
        ensure_events_by_user,
        ensure_ivf_pq_index,
        ensure_shingle_sets,  # before the postings/sig index, which read it
        ensure_shingle_postings,
        ensure_minhash_sig_index,
        ensure_simhash_fp_index,
        ensure_winnow_fp_index,
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
