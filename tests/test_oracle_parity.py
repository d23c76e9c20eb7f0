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
    # binary-content features with no cross-engine oracle; each must
    # carry a pytest accuracy or equivalence pin instead
    rows_only_ok = {
        "sketch_distinct_users_by_type",  # test_sketches.py accuracy pins
        "topk_users_approx",
        "event_freq_cms",
        "media_byte_features",            # test_multimodal.py equivalence
        "media_byte_features_arrow",
        "order_value_percentiles_approx",  # pinned vs exact percentiles
    }
    missing_oracle = [
        n for n in names[:50] if n not in oracles and n not in rows_only_ok
    ]
    assert not missing_oracle, missing_oracle
    # ROUND-5 FULL ROTATION: the window must hold exactly the 50 queries
    # that never earned a driver CORRECTNESS row in rounds 1-4, so the
    # cross-round union covers the whole registry. Spot anchors, one per
    # rotated-in family:
    for anchor in (
        "nation_metrics_unpivot",       # unpivot
        "customer_order_multiset_ops",  # multiset EXCEPT/INTERSECT ALL
        "lateral_top_customers",        # LATERAL correlated top-k
        "order_value_winsorized",       # percentile winsorize
        "q9_product_profit",            # never-checked TPC-H sweep
        "q22_idle_rich_customers",
        "user_state_scd2",              # SCD2 history
        "events_daily_anomaly",         # z-score anomaly
        "events_gapfill_daily",         # calendar gap-fill
        "doc_unigram_entropy",          # text-analysis signals
        "curriculum_phase_bins",        # curriculum packing (fixed r5)
        "mixture_weighted_sample",      # mixture-weighted sampling
        "embedding_dim_stats",          # embedding audit
        "embedding_int8_quant",         # quantization audit
        "sketch_distinct_users_by_type",  # sketch family (rows-only)
        "media_byte_features",          # multimodal UDF (rows-only)
        "orders_jsonl_scan_rollup",     # non-parquet scans
        "binaryfile_docs_scan",
        "events_clustered_user_scan",   # clustered-layout data skipping
    ):
        assert anchor in names[:50], anchor
    # and nothing already driver-checked occupies a slot
    import json
    import os

    seen: set[str] = set()
    for r in (1, 2, 3, 4):
        path = os.path.join(os.path.dirname(__file__), "..", f"CORRECTNESS_r0{r}.json")
        if os.path.exists(path):
            with open(path) as f:
                d = json.load(f)
            seen.update(d.get("queries", d).keys())
    if seen:
        dup = [n for n in names[:50] if n in seen]
        assert not dup, f"window wastes slots on already-checked: {dup}"
