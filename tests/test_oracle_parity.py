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
# at sf0.1 in round 1); these few queries re-verify at the larger SFs.
_SCALE_PINNED = ["decimal_exact_revenue", "q1_pricing_summary"]


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
    # rows-only-by-design exceptions: engine-specific estimates with no
    # cross-engine oracle; each must carry a pytest accuracy pin instead
    rows_only_ok = {"orders_profile"}  # pinned in test_pipeline_profile.py
    missing_oracle = [
        n for n in names[:50] if n not in oracles and n not in rows_only_ok
    ]
    assert not missing_oracle, missing_oracle
    # one representative per category family (spot anchors)
    for anchor in (
        "supplier_nation_full_join",  # full outer join
        "nation_presence_setops",     # set operations
        "events_asof_join",           # as-of join
        "ann_lsh_query_topk",         # ANN-LSH
        "media_frame_chunks",         # multimodal
        "revenue_grouping_sets",      # grouping sets SQL
        "events_partition_pruned_day",  # partition pruning
        "minhash_signatures",         # minhash dedup family
        "q21_waiting_suppliers",      # q7-q22 sweep
        "decontamination_overlap",    # benchmark decontamination
        "orders_profile_exact",       # dataset profiling (oracle slot)
        "sequence_pack_bins",         # sequence packing (round 4)
        "pagerank_trade_network",     # iterative graph (round 4)
        "orders_upsert_merge",        # batch MERGE/SCD
        "shingle_idf_similarity_topk",  # sparse all-pairs similarity
        "events_cohort_retention",    # cohort matrix
        "recursive_order_chain",      # recursive CTE
    ):
        assert anchor in names[:50], anchor
