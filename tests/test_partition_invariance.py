"""Distributed-determinism pins: a query's RESULT may not depend on the
parallelism it ran with.

``spark.sql.shuffle.partitions`` changes partial-aggregation grouping,
sort-merge boundaries and limit evaluation order — any query whose
output changes under it has a nondeterminism bug (a top-k cut without a
total order, a float reduction quantized after reassociation, an
aggregation order leak). The oracle comparison can't catch this class:
both runs could match the oracle on one layout and drift on another.

Scope: the round-6 additions (every shape class: top-k rerank cut,
self-join aggregation, funnel counters, regression moments, histogram
union, confusion matrix, KL sums, custom source rollup). The older
families carry equivalent pins via goldens/scale re-checks.
"""

from __future__ import annotations

import pytest

from hadoop_cs4225_spark import registry
from tests.conftest import SF_ORACLE

registry.load_all()

_QUERIES = [
    "ann_rerank_topk",
    "shingle_containment_pairs",
    "duplicate_ngram_coverage",
    "doc_unigram_logprob",
    "quality_filter_funnel",
    "order_trend_regression",
    "dedup_cluster_size_histogram",
    "lang_confusion_matrix",
    "source_kl_divergence",
    "pyds_scan_rollup",
    "events_daily_ewma",
    "doc_winnowing_fingerprints",
    "order_window_rank_suite",
    "user_event_map_algebra",
    "event_transition_matrix",
    "star_constraint_audit",
    "orders_cdc_apply",
]


def _rows(spark, name):
    return [
        tuple(str(v) for v in r)
        for r in registry.QUERIES[name](spark, SF_ORACLE).collect()
    ]


@pytest.mark.parametrize("name", _QUERIES)
def test_result_invariant_under_shuffle_partitions(spark, name):
    base = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        a = _rows(spark, name)
        spark.conf.set("spark.sql.shuffle.partitions", "31")
        b = _rows(spark, name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base)
    assert a == b, f"{name}: result depends on shuffle partitioning"
