"""Regenerate PLANS.md: formatted physical plans for flagship queries.

Usage: python tools/dump_plans.py [sf_dir]

The dossier exists so plan shape is reviewable without running Spark:
pushdown (PushedFilters/ReadSchema), broadcast vs shuffle joins,
partial aggregation, distributed top-k (TakeOrderedAndProject),
partition pruning, and whole-stage codegen spans. Regenerate after any
plan-affecting change; tests/test_plans.py asserts the properties, this
file makes them visible.
"""

from __future__ import annotations

import sys

from hadoop_cs4225_spark import registry
from hadoop_cs4225_spark.session import get_spark

#: (query, what the reader should see in the plan)
FLAGSHIPS = (
    ("q6_revenue_forecast", "filters pushed to parquet scan; 1-row agg"),
    ("q3_shipping_priority", "dim joins + distributed top-k (TakeOrderedAndProject)"),
    ("word_count", "partial+final hash aggregation (the MapReduce combiner, free)"),
    ("topk_common_words_max", "broadcast stopword anti-join; countDistinct(src)=2"),
    ("minhash_lsh_dup_pairs", "banded bucket equi-join, no cartesian"),
    ("events_partition_pruned_day", "PartitionFilters prunes to one event_date dir"),
    ("nested_struct_pruned_rollup", "ReadSchema narrowed to meta.etype subfield"),
    ("shingle_idf_similarity_topk", "postings self-join with df-band prune"),
    ("events_gapfill_daily", "calendar spine broadcast-joined to rollup"),
    ("q21_waiting_suppliers", "fact-fact + semi/anti self-joins on one shuffle key"),
    ("sequence_pack_bins", "one window exchange shared with the bin aggregation"),
    ("pagerank_trade_network", "checkpointed edge list; per-iteration join+agg"),
    ("orders_profile_exact", "per-column pruned scans unioned — no expand"),
    ("events_clustered_user_scan", "range predicate pushed to user-sorted layout"),
    ("user_state_scd2", "three window passes over one user_id exchange"),
    ("embedding_gram_topeig", "constant-size Gram partial agg; tiny iteration joins"),
    ("order_value_winsorized", "broadcast scalar percentile thresholds; clipped re-agg"),
    ("mixture_weighted_sample", "AQE-broadcast rates join; map-side hash membership"),
    (
        "curriculum_phase_bins",
        "exact NTILE without a global window: bounded per-qk offset window, "
        "distributed in-bucket row_number, map-side tile formula",
    ),
    (
        "pq_adc_query_topk",
        "broadcast 1-row ADC distance table; map-side code lookups; "
        "TakeOrderedAndProject — zero shuffles",
    ),
    (
        "events_zorder_scan",
        "both user and ts predicates in PushedFilters over the "
        "Morton-sorted layout",
    ),
    (
        "ivf_pq_index_probe",
        "dynamic partition pruning: the probe scan carries a "
        "dynamicpruningexpression on centroid_id — one inverted-list "
        "directory read from the materialized code table",
    ),
    (
        "ann_rerank_topk",
        "two-stage retrieval: checkpointed centroid-assigned scan, "
        "int8-screen TakeOrderedAndProject(32), then a 32-row exact "
        "rerank — each stage shrinks before the next costs more",
    ),
    (
        "shingle_containment_pairs",
        "df-banded postings self-join (localCheckpointed once for its "
        "three consumers); fanout capped at df(df-1)/2 per shingle",
    ),
    (
        "duplicate_ngram_coverage",
        "shingle-keyed groupBy + equi-join (AQE-skew-splittable) — "
        "deliberately NOT a count-over-window, which would buffer a "
        "hot shingle in one task",
    ),
    (
        "events_daily_ewma",
        "daily rollup shuffle, then the recursion as a bounded "
        "per-type array fold — no partition-less window over events",
    ),
    (
        "per_source_doc_cap",
        "bucket histogram + cumulative over <=1024 rows/source, then "
        "ONLY the boundary bucket re-read (broadcast semi-join) and "
        "ranked — never a per-source window over the corpus",
    ),
    (
        "user_activity_gini",
        "two map-side-combined shuffles (events -> per-user -> "
        "histogram), then bounded two-level cumulative windows; "
        "nothing downstream scales with the user count",
    ),
    (
        "order_fill_gap_cogroup",
        "FlatMapCoGroupsInPandas on the DIV-512 key-range bucket: one "
        "co-partitioning exchange per side, ~512 orders per Arrow "
        "batch",
    ),
    (
        "embedding_near_dup_lsh",
        "bucket-keyed pair join with norms PRECOMPUTED on the "
        "checkpointed bucketed frame — one cross-dot fold per "
        "candidate, cosine projected once then filtered (r10 rewrite; "
        "exponent 1.15 -> 0.76)",
    ),
    (
        "token_window_pmi_topk",
        "position-KEYED window join: union of (doc_id, pos + k) "
        "equi-joins, fanout exactly 2 per token — no doc-grain "
        "self-join survives in the plan (r10 ADVICE fix)",
    ),
    (
        "embedding_signq_hamming_topk",
        "two BIGINT sign words per vector; XOR+popcount distance; "
        "TakeOrderedAndProject top-k — the 1-bit quantized scan",
    ),
    (
        "bpe_merge_rounds",
        "one corpus-grain word count, then VOCABULARY-grain rounds: "
        "per-round pair agg + TakeOrderedAndProject(1) top pair "
        "broadcast back into a symbol-array aggregate-fold merge "
        "projection (r11 ADVICE fix) — the iterative "
        "tokenizer-training loop with no driver collect",
    ),
    (
        "simhash_band_dup_pairs",
        "60-vote map-side-combined agg, x4 band fan-out, bucket-capped "
        "(band, val) equi-join, XOR+popcount verify — the bit-vector "
        "near-dup join; no cartesian anywhere",
    ),
    (
        "trade_bfs_hop_histogram",
        "6 unrolled frontier equi-joins + left-anti visited checks "
        "over the checkpointed edge list — BFS as keyed joins, "
        "per-round lineage truncation",
    ),
    (
        "jaccard_prefix_filter_pairs",
        "candidate join reads the WRITTEN pre-truncated prefix slice "
        "(documents_shingle_prefix) — no rn/df filter, no window, no "
        "discarded rows at query time (r13)",
    ),
    (
        "tfidf_top_terms",
        "tf and df sides both read the WRITTEN token-count layout "
        "(documents_token_counts + _token_df) — no query-time "
        "tokenize/explode in the plan (r13)",
    ),
    (
        "bloom_pruned_decon_docs",
        "probe bitset folds to a broadcast <=65536-row table; corpus "
        "shingles classified map-side; ONLY Bloom-positive postings "
        "enter the exact verify join (r13)",
    ),
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="plan-dump")
    qs = registry.get_queries()
    out = [
        "# PLANS — formatted physical plans of flagship queries",
        "",
        f"Generated by `tools/dump_plans.py` at `{sf_dir}`. AQE is enabled at",
        "runtime, so broadcast/skew decisions can improve further during",
        "execution; these are the static plans Catalyst commits to up front.",
        "",
    ]
    for name, why in FLAGSHIPS:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out += [f"## {name}", "", f"*What to look for: {why}*", "", "```", plan.rstrip(), "```", ""]
    with open("PLANS.md", "w") as f:
        f.write("\n".join(out))
    print(f"PLANS.md written ({len(FLAGSHIPS)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
