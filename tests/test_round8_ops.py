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


# ---------------------------------------------------------------------------
# Batch-3 invariants
# ---------------------------------------------------------------------------


def test_good_turing_chao1_bounds(spark):
    """Chao1 can only ADD unseen types to the observed vocabulary, and
    the Good-Turing unseen mass is a probability; hapaxes exist in any
    natural-ish corpus (non-vacuity)."""
    rows = _rows(spark, "vocab_good_turing_chao1")
    assert rows
    for r in rows:
        assert r.chao1_richness >= r.vocab - 1e-9, r
        assert 0.0 <= r.gt_unseen_mass <= 1.0
        assert r.n1 <= r.vocab and r.n2 <= r.vocab
    assert any(r.n1 > 0 for r in rows), "vacuous: no hapax legomena"


def test_nb_classifier_structural_invariants(spark):
    """Every held-out doc earns exactly one prediction and counts are
    consistent. NOTE the synthetic corpus carries NO language signal
    in the text (all langs draw from one token distribution — verified
    against the raw parquet), so accuracy is honestly chance-level;
    the harness (train/predict/evaluate as dataframe algebra) is what
    this query pins, and the oracle pins its exactness."""
    from pyspark.sql import functions as F

    from hadoop_cs4225_spark.operators.text_analysis import _NB_TRAIN_PCT
    from hadoop_cs4225_spark.functions.hashing import hash60
    from hadoop_cs4225_spark.sources.tables import load_table

    rows = _rows(spark, "nb_lang_classifier_acc")
    n_test_expected = (
        load_table(spark, SF_ORACLE, "documents")
        .where(
            hash60(F.col("doc_id").cast("string")) % 100 >= _NB_TRAIN_PCT
        )
        .count()
    )
    assert sum(r.n_test for r in rows) == n_test_expected
    for r in rows:
        assert 0 <= r.n_correct <= r.n_test
        assert 0.0 <= r.acc <= 1.0


def test_l_diversity_entropy_floor(spark):
    """exp(H) of a distribution over c outcomes never exceeds c, so
    the entropy-l floor is bounded by the distinct-l floor."""
    [r] = _rows(spark, "customer_l_diversity_audit")
    assert r.min_l >= 1
    assert r.min_entropy_l <= r.min_l + 1e-6, r
    assert 0.0 <= r.pct_at_risk <= 1.0


def test_cuped_adjustment_preserves_grand_mean(spark):
    """CUPED re-centers around the pooled covariate mean, so the
    n-weighted sum of per-arm adjustments is zero (up to the 1e-6
    quantization of the reported means)."""
    rows = _rows(spark, "orders_cuped_adjustment")
    assert len(rows) == 2
    drift = sum(r.n_arm * (r.mean_y_adj - r.mean_y) for r in rows)
    assert abs(drift) <= 1.0, rows
    for r in rows:
        assert 0.0 <= r.var_reduction <= 1.0


def test_ridge_matches_numpy(spark):
    """The Cramer solve must agree with numpy's linalg on the same
    centered moments (the closed form is the spec, numpy the referee)."""
    import numpy as np

    from hadoop_cs4225_spark.operators.algo_ops import _RIDGE_LAMBDA
    from hadoop_cs4225_spark.sources.tables import load_table

    [r] = _rows(spark, "lineitem_ridge_normal_eq")
    li = load_table(spark, SF_ORACLE, "lineitem").select(
        "l_quantity", "l_discount", "l_tax", "l_extendedprice"
    ).collect()
    X = np.array(
        [
            [
                int(row.l_quantity),
                int(np.floor(row.l_discount * 100 + 0.5)),
                int(np.floor(row.l_tax * 100 + 0.5)),
            ]
            for row in li
        ],
        dtype=np.float64,
    )
    y = np.array([np.floor(row.l_extendedprice) for row in li])
    Xc = X - X.mean(axis=0)
    yc = y - y.mean()
    A = Xc.T @ Xc + _RIDGE_LAMBDA * np.eye(3)
    beta = np.linalg.solve(A, Xc.T @ yc)
    got = (r.beta_qty, r.beta_disc_pct, r.beta_tax_pct)
    assert np.allclose(got, beta, atol=1e-4), (got, beta)
    assert 0.0 <= r.r2 <= 1.0


def test_kmv_sketch_accuracy_and_union(spark):
    """KMV estimates stay within 4 sigma (~1/sqrt(k-2)) of exact; the
    union scope's exact count never exceeds the per-type sum; a scope
    with fewer than k keys reports EXACTLY (rel_err 0)."""
    from hadoop_cs4225_spark.operators.sketches import _KMV_K

    rows = _rows(spark, "kmv_distinct_sketch_audit")
    per = [r for r in rows if r.scope != "__union__"]
    [uni] = [r for r in rows if r.scope == "__union__"]
    assert uni.n_exact <= sum(r.n_exact for r in per)
    for r in rows:
        if r.n_exact < _KMV_K:
            assert r.rel_err == 0.0, r
        else:
            assert r.rel_err < 4.0 / (_KMV_K - 2) ** 0.5, r


def test_attribution_models_agree_on_total(spark):
    """Each model hands out exactly one conversion's worth of credit
    per converted purchase: first/last totals are equal integers, and
    the linear total matches within the per-touch grid slack."""
    rows = _rows(spark, "events_attribution_weights")
    assert rows
    ft = sum(r.first_touch_credits for r in rows)
    lt = sum(r.last_touch_credits for r in rows)
    lin = sum(r.linear_credits for r in rows)
    assert ft == lt > 0
    assert abs(lin - ft) < 0.001 * ft + 0.01, (lin, ft)


def test_split_leakage_counts_consistent(spark):
    [r] = _rows(spark, "split_leakage_audit")
    assert r.n_pairs > 0, "vacuous: no near-dup pairs at this SF"
    assert 0 <= r.n_cross_pairs <= r.n_pairs
    assert 0 <= r.n_contaminated <= min(r.n_cross_pairs, r.n_test_docs)
    assert 0.0 <= r.contaminated_frac <= 1.0


def test_silhouette_partitions_and_range(spark):
    from hadoop_cs4225_spark.sources.tables import load_table

    rows = _rows(spark, "kmeans_simplified_silhouette")
    n_vecs = load_table(spark, SF_ORACLE, "embeddings").count()
    assert sum(r.n_vecs for r in rows) == n_vecs
    for r in rows:
        assert -1.0 - 1e-9 <= r.avg_silhouette <= 1.0 + 1e-9


def test_fuzzy_pairs_match_brute_force(spark):
    """The q-gram filter must be LOSSLESS at this threshold: the
    reported pair set equals the full O(|dict|^2) Levenshtein scan
    over the name dictionary."""
    from pyspark.sql import functions as F

    from hadoop_cs4225_spark.operators.joins_advanced import (
        _FUZZY_K,
        _FUZZY_MIN_LEN,
    )
    from hadoop_cs4225_spark.sources.tables import load_table

    rows = _rows(spark, "part_name_fuzzy_pairs")
    assert rows, "vacuous: no fuzzy pairs at this SF"
    names = [
        r.p_name
        for r in load_table(spark, SF_ORACLE, "part")
        .select("p_name")
        .where(F.length("p_name") >= _FUZZY_MIN_LEN)
        .distinct()
        .collect()
    ]

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    brute = {
        (a, b)
        for i, a in enumerate(sorted(names))
        for b in sorted(names)[i + 1 :]
        if lev(a, b) <= _FUZZY_K
    }
    reported = {(r.name1, r.name2) for r in rows}
    assert reported == brute, reported ^ brute
