"""Round-8 operator invariants.

Cross-engine parity for every oracle-bearing round-8 query is already
covered by tests/test_oracle_parity.py (it parametrizes over the whole
registry); these tests pin the ALGORITHMIC invariants the oracles
cannot express — identities, guarantees, and non-vacuity of the new
ops' decision boundaries.
"""

from __future__ import annotations

import math

from hadoop_cs4225_spark import registry
from tests.conftest import SF_ORACLE

registry.load_all()


def _rows(spark, name, sf=SF_ORACLE):
    return registry.QUERIES[name](spark, sf).collect()


def test_brier_murphy_identity(spark):
    """The exact variable-forecast Murphy identity: brier =
    reliability - resolution + uncertainty + within_bin - 2*cov_py
    (all six reported values derive from the same exact integer sums;
    the grid snap bounds the gap at a few ulps of 1e-6)."""
    [r] = _rows(spark, "quality_brier_decomposition")
    gap = r.brier - (
        r.reliability
        - r.resolution
        + r.uncertainty
        + r.within_bin
        - 2.0 * r.cov_py
    )
    assert abs(gap) < 5e-6, r
    assert 0.0 <= r.brier <= 1.0
    assert r.resolution >= 0.0 and r.reliability >= 0.0 and r.within_bin >= 0.0


def test_bloom_no_false_negatives_and_theory_line(spark):
    """The Bloom invariant: a member's buckets are all set by its own
    insertion, so false negatives are impossible; and the measured FPR
    must sit within a loose factor of the loading-theory line."""
    [r] = _rows(spark, "eval_bloom_decon_audit")
    assert r.n_false_neg == 0, r
    assert r.n_bloom_pos == r.n_members + r.n_false_pos, r
    assert r.n_members > 0, "vacuous: probe set never overlaps candidates"
    # theory is an expectation; at small n allow a wide band but the
    # measured rate must not exceed many multiples of theory
    assert r.fpr_measured <= max(5 * r.fpr_theory, 0.01), r


def test_conformal_coverage_near_target(spark):
    """Split-conformal guarantee: held-out coverage concentrates near
    the 0.9 target (finite-sample: >= 0.9 in expectation; allow a wide
    one-sided band at small n)."""
    rows = _rows(spark, "order_value_conformal_coverage")
    assert rows, "no priority groups survived the three-way split"
    for r in rows:
        assert r.n_train > 0 and r.n_calib > 0 and r.n_test > 0
        assert 0.75 <= r.coverage <= 1.0, r


def test_welch_fdr_monotone_rejections(spark):
    """BH rejections must be downward-closed in p: if p_i is rejected,
    every p_j <= p_i is rejected too."""
    rows = _rows(spark, "source_length_welch_fdr")
    assert len(rows) >= 2
    rejected = [r.p_norm for r in rows if r.bh_reject]
    accepted = [r.p_norm for r in rows if not r.bh_reject]
    if rejected and accepted:
        assert max(rejected) <= min(accepted), rows


def test_adamic_adar_predicts_nonedges_only(spark):
    """Every predicted pair must be non-adjacent in the mutual-top-K
    graph and carry a positive score with at least one common
    neighbor."""
    from hadoop_cs4225_spark.operators.graph import _mutual_topk_edges

    rows = _rows(spark, "supplier_adamic_adar_topk")
    assert rows, "no candidate pairs — graph degenerate at this SF"
    edges = {
        (r.a, r.b) for r in _mutual_topk_edges(spark, SF_ORACLE).collect()
    }
    for r in rows:
        assert r.s1 < r.s2
        assert (r.s1, r.s2) not in edges, r
        assert r.n_common >= 1 and r.aa_score > 0.0
        # AA upper bound: n_common / ln(2)
        assert r.aa_score <= r.n_common / math.log(2.0) + 1e-9


def test_prefix_dup_groups_nonvacuous(spark):
    """The prefix-dup pass must actually find groups (the synthetic
    corpus contains exact duplicates, whose prefixes necessarily
    collide) and every group is a real multi-doc group."""
    rows = _rows(spark, "doc_prefix_dup_groups")
    assert rows, "vacuous: no prefix-duplicate groups at this SF"
    for r in rows:
        assert r.n_docs > 1
        assert r.min_doc_id < r.max_doc_id


def test_kneser_ney_probabilities_valid(spark):
    rows = _rows(spark, "bigram_kneser_ney_topk")
    assert len(rows) == 20
    for r in rows:
        assert 0.0 < r.p_kn <= 1.0 + 1e-9, r
    # descending with the documented tiebreak
    keys = [(-r.p_kn, r.w1, r.w2) for r in rows]
    assert keys == sorted(keys)


def test_textrank_mass_and_order(spark):
    rows = _rows(spark, "textrank_keywords_topk")
    assert len(rows) == 20
    assert all(r.rank_q > 0 for r in rows)
    keys = [(-r.rank_q, r.token) for r in rows]
    assert keys == sorted(keys)


def test_label_centroid_cosine_full_matrix(spark):
    rows = _rows(spark, "label_centroid_cosine")
    labels = {r.label_a for r in rows} | {r.label_b for r in rows}
    n = len(labels)
    assert len(rows) == n * (n - 1) // 2, (n, len(rows))
    for r in rows:
        assert -1.0 - 1e-9 <= r.cos_sim <= 1.0 + 1e-9


def test_histogram_quantiles_bracket_exact(spark):
    """The sketch estimate must land inside the rank-containing bucket
    — within one bucket width of the exact order statistic — and
    rel_err must reflect that bound."""
    from hadoop_cs4225_spark.operators.algo_ops import _QSK_WIDTH

    rows = _rows(spark, "order_value_histogram_quantiles")
    assert len(rows) == 15  # 5 priorities x 3 percentiles
    for r in rows:
        assert abs(r.est_dollars - r.exact_dollars) <= _QSK_WIDTH / 100.0, r
        assert r.rel_err >= 0.0


def test_stump_cv_beats_or_ties_itself(spark):
    """Held-out accuracy must be a valid rate and the trained split a
    real histogram value; CV accuracy should not collapse far below
    the majority baseline (the stump can at worst mimic a single
    leaf)."""
    rows = _rows(spark, "lineitem_stump_cv")
    assert len(rows) == 3
    for r in rows:
        assert 0.0 <= r.test_acc <= 1.0
        assert r.test_acc >= r.majority_acc - 0.05, r


def test_prefix_filter_join_exact_vs_brute(spark):
    """EXACTNESS of the prefix-filtered join: every reported pair's
    Jaccard >= 0.6, and a brute-force pass over a bounded doc_id slice
    finds exactly the same pairs within that slice (prefix filtering
    must not lose pairs whose prefixes share a rare shingle)."""
    from pyspark.sql import functions as F

    from hadoop_cs4225_spark.operators.dedup import _shingles, _toks
    from hadoop_cs4225_spark.sources.tables import load_table

    rows = _rows(spark, "jaccard_prefix_filter_pairs")
    assert rows, "vacuous: no pairs at this SF"
    for r in rows:
        assert r.jaccard >= 0.6 - 1e-9

    docs = (
        load_table(spark, SF_ORACLE, "documents")
        .where(F.col("doc_id") <= 120)
        .select("doc_id", _toks().alias("toks"))
        .where(F.size("toks") >= 3)
        .select("doc_id", F.array_distinct(_shingles()).alias("s"))
    )
    a = docs.select(F.col("doc_id").alias("d1"), F.col("s").alias("s1"))
    b = docs.select(F.col("doc_id").alias("d2"), F.col("s").alias("s2"))
    inter = F.size(F.array_intersect("s1", "s2"))
    union = F.size("s1") + F.size("s2") - inter
    brute = {
        (r.d1, r.d2)
        for r in a.join(b, F.col("d1") < F.col("d2"))
        .where(5 * inter >= 3 * union)
        .collect()
    }
    reported = {(r.d1, r.d2) for r in rows if r.d1 <= 120 and r.d2 <= 120}
    assert reported == brute, (reported ^ brute)


def test_daily_hll_rollup_invariants(spark):
    """Union monotonicity and sanity: the 7-day estimate must be >= the
    day estimate (register MAX can only grow), exact_7d >= exact_day,
    and estimates must stay within loose HLL error of exact (p=6 =>
    ~13% sigma; allow 4 sigma)."""
    rows = _rows(spark, "events_daily_hll_rollup")
    assert rows
    for r in rows:
        assert r.hll_7d >= r.hll_day - 1e-9, r
        assert r.exact_7d >= r.exact_day, r
        assert abs(r.hll_day - r.exact_day) / r.exact_day < 0.55, r
        assert abs(r.hll_7d - r.exact_7d) / r.exact_7d < 0.55, r


def test_contrastive_manifest_invariants(spark):
    """Anchors are non-keepers paired with their cluster keeper;
    negative ids live in the dense doc_id space; clean flags are
    honest (a clean negative is never in the anchor's cluster)."""
    from hadoop_cs4225_spark.operators.dedup import _cluster_labels
    from hadoop_cs4225_spark.sources.tables import load_table

    rows = _rows(spark, "contrastive_pairs_manifest")
    assert rows, "no near-dup clusters at this SF"
    n_docs = load_table(spark, SF_ORACLE, "documents").count()
    lab = {
        r.doc_id: r.lab for r in _cluster_labels(spark, SF_ORACLE).collect()
    }
    for r in rows:
        assert r.anchor_id != r.positive_id
        assert lab[r.anchor_id] == lab[r.positive_id]
        for j in (1, 2):
            nid = getattr(r, f"neg{j}_id")
            clean = getattr(r, f"neg{j}_clean")
            assert 0 <= nid < n_docs
            same = lab.get(nid) == lab[r.anchor_id]
            assert clean == (not same), r


def test_training_set_shards_match_report(spark):
    """The written shards must agree with the report query: per-source
    kept-doc and token totals identical, and window ids consistent
    with the straddle counts (shards are the artifact, the report the
    summary — the two must never diverge)."""
    from collections import defaultdict

    from hadoop_cs4225_spark.operators.training_set import TRAIN_PACK_BUDGET

    shards = _rows(spark, "training_set_shards")
    report = {r.source: r for r in _rows(spark, "corpus_to_training_set")}
    per_src = defaultdict(lambda: [0, 0, set(), 0])
    for s in shards:
        acc = per_src[s.source]
        acc[0] += 1
        acc[1] += s.n_toks
        acc[2].add(s.window_id)
        first = s.off // TRAIN_PACK_BUDGET
        last = (s.off + s.n_toks - 1) // TRAIN_PACK_BUDGET
        assert s.window_id == first and s.window_pos == s.off % TRAIN_PACK_BUDGET
        acc[3] += int(last > first)
    for src, (n_kept, n_tokens, bins, straddle) in per_src.items():
        r = report[src]
        assert (n_kept, n_tokens, len(bins), straddle) == (
            r.n_kept,
            r.n_tokens,
            r.n_bins,
            r.n_straddle,
        ), src
