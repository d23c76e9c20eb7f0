"""Local replica of the driver's correctness gate.

For every registered query that has an oracle, run the Spark DataFrame
and the DuckDB SQL on the same parquet and compare (row count + columns +
order-insensitive values). The driver does this at sf0.01; here sf0.001
keeps the suite fast — semantics are scale-invariant.
"""

from __future__ import annotations

import pytest

from hadoop_cs4225_spark import registry
from tests.conftest import SF_ORACLE, assert_frames_match

registry.load_all()
_NAMES = sorted(registry.ORACLES)


@pytest.mark.parametrize("name", _NAMES)
def test_query_matches_oracle(spark, duck, name):
    spark_df = registry.QUERIES[name](spark, SF_ORACLE)
    duck_rel = duck.sql(registry.ORACLES[name])
    assert_frames_match(spark_df, duck_rel, name=name)


def test_all_queries_return_rows_or_schema(spark):
    """Queries without an oracle still must run and have a stable schema."""
    for name, fn in registry.QUERIES.items():
        df = fn(spark, SF_ORACLE)
        assert df.columns, f"{name}: no columns"


# Scale-surfaced parity pins. sf0.001 misses bugs that only appear when
# values land on rounding boundaries or sums approach 2^53 (both found
# at sf0.1 in round 1); these queries re-verify at the larger SFs.
# Round 5 widened the list to the float-heavy queries where ulp
# reassociation or quantization cliffs are most likely (verdict task 3),
# plus the round-5 curriculum rewrite (exact-NTILE two-stage ranking).
_SCALE_PINNED = [
    "decimal_exact_revenue",
    "q1_pricing_summary",
    "pagerank_trade_network",
    "embedding_gram_topeig",
    "shingle_idf_similarity_topk",
    "order_value_winsorized",
    "sequence_pack_bins",
    "curriculum_phase_bins",
    # round-5 additions: PQ ADC ranking (32 fold sums + lookup ratios)
    # and the LSH recall ratio — both pure-float rankings where an ulp
    # or quantization cliff would first appear at larger SFs
    "pq_adc_query_topk",
    "lsh_recall_audit",
    "ivf_pq_query_topk",
    # round-6 session-3 additions: ln-sum ranking (keyness), ln-key
    # ranking (A-ES), and the iterative integer-grid argmin (k-means) —
    # the three new ops where a float boundary would first appear at SF
    "term_keyness_llr",
    "weighted_aes_sample",
    "kmeans_embedding_clusters",
]


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
@pytest.mark.parametrize("name", _SCALE_PINNED)
def test_scale_pinned_parity(spark, name, sf_dir):
    import duckdb

    from hadoop_cs4225_spark.sources.tables import TABLES

    con = duckdb.connect()
    try:
        for t in TABLES:
            con.sql(
                f"CREATE VIEW {t} AS SELECT * "
                f"FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        spark_df = registry.QUERIES[name](spark, sf_dir)
        assert_frames_match(spark_df, con.sql(registry.ORACLES[name]), name=f"{name}@{sf_dir}")
    finally:
        con.close()


def test_priority_window_integrity():
    """The driver records correctness rows for the first 50 queries in
    iteration order; every slot must exist, carry an oracle, and the
    window must cover each SURVEY §2.2 category's flagship family."""
    from hadoop_cs4225_spark.registry import (
        _PRIORITY,
        PRIORITY_WINDOW,
        get_oracles,
        get_queries,
    )

    names = list(get_queries())
    oracles = get_oracles()
    assert len(_PRIORITY) == PRIORITY_WINDOW == 50
    assert tuple(names[:50]) == _PRIORITY
    # rows-only-by-design exceptions: engine-specific estimates /
    # numpy-reassociated pandas twins with no cross-engine oracle; each
    # must carry a pytest accuracy or equivalence pin instead
    rows_only_ok = {
        "topk_users_approx",       # test_sketches.py exactness pin
        "cosine_topk_pandas",      # test_similarity_udf.py JVM equivalence
        "label_centroid_stats",    # test_similarity_udf.py numpy reference
    }
    missing_oracle = [
        n for n in names[:50] if n not in oracles and n not in rows_only_ok
    ]
    assert not missing_oracle, missing_oracle
    # ROUND-6 ROTATION: the window leads with every query that had no
    # driver CORRECTNESS row after rounds 1-5 (the 13 post-r5-rotation
    # additions + 2 pandas twins) plus the one red row from r5
    # (topk_users_approx, output reshaped). After this round the
    # cross-round union covers the whole registry with zero reds.
    import json
    import os

    seen: set[str] = set()
    for r in (1, 2, 3, 4, 5):
        path = os.path.join(os.path.dirname(__file__), "..", f"CORRECTNESS_r0{r}.json")
        if os.path.exists(path):
            with open(path) as f:
                d = json.load(f)
            seen.update(d.get("queries", d).keys())
    if seen:
        # the frozen rotation set: every query that was registered AND
        # unchecked when this window was cut (queries added later in
        # round 6 are next round's candidates, per the r5 precedent)
        rotated_in = {
            "bucketed_segment_revenue", "bpe_pair_counts",
            "dedup_canonical_keep", "epoch_shard_plan",
            "pq_code_histogram", "pq_adc_query_topk",
            "ivf_pq_query_topk", "ivf_pq_index_probe",
            "ann_recall_audit", "lsh_recall_audit",
            "events_hot_key_profile", "events_zorder_scan",
            "orders_schema_evolution_scan", "cosine_topk_pandas",
            "label_centroid_stats",
        }
        # MID-ROUND WIDENING: these were registered later in round 6,
        # after the set above froze — but before the driver's round-6
        # correctness run, so they can still earn first rows this round
        rotated_in |= {
            "ann_rerank_topk", "dedup_cluster_size_histogram",
            "doc_unigram_logprob", "doc_winnowing_fingerprints",
            "duplicate_ngram_coverage", "event_transition_matrix",
            "events_daily_ewma", "lang_confusion_matrix",
            "order_trend_regression", "order_window_rank_suite",
            "pyds_scan_rollup", "quality_filter_funnel",
            "shingle_containment_pairs", "source_kl_divergence",
            "user_event_map_algebra", "star_constraint_audit",
            "orders_cdc_apply", "events_user_recency_churn",
            # second widening: this session's novel ops, registered
            # before the driver's round-6 correctness run
            "per_source_doc_cap", "user_activity_gini",
            "order_fill_gap_cogroup", "customer_rfm_segments",
            "part_brand_affinity",
        }
        missing = [n for n in rotated_in if n not in names[:50]]
        assert not missing, f"never-driver-checked queries outside window: {missing}"
        assert not (rotated_in & seen), "rotation set drifted: already checked"
        assert "topk_users_approx" in names[:50]  # the r5 red row
    # re-anchor spot checks: verdict-named float-heavy greens + the
    # three streaming batch twins + the reference goldens must hold
    # their drift-detection slots
    for anchor in (
        "dedup_clusters",
        "pagerank_trade_network",
        "shingle_idf_similarity_topk",
        "embedding_gram_topeig",
        "q1_pricing_summary",
        "decimal_exact_revenue",
        "events_sliding_avg",
        "events_dedup_latest",
        "events_session_windows",
        "word_count",
        "topk_common_words_max",
    ):
        assert anchor in names[:50], anchor
