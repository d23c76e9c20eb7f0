"""Round-9 batch-1 operator invariants (corpus token diagnostics).

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


def test_burstiness_poisson_bound_and_order(spark):
    """df can never exceed either the token count or the Poisson
    expectation's support; burstiness is df/expected by construction;
    rows come sorted by count."""
    rows = _rows(spark, "token_burstiness")
    assert len(rows) == 20
    counts = [r.c for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert 1 <= r.df <= r.c
        assert r.tokens_per_doc >= 1.0 - 1e-9
        # expectation is below both n_docs and c (1-exp(-x) < min(1, x))
        assert 0.0 < r.poisson_expected_df <= r.c + 1e-6
        assert abs(r.burstiness - r.df / r.poisson_expected_df) < 1e-4
        # heavy tokens in natural-ish text should never be MORE spread
        # than Poisson by much (ratio materially above 1 would mean
        # anti-clumping, impossible for iid-or-burstier processes
        # beyond quantization noise)
        assert r.burstiness <= 1.05, r


def test_coverage_curve_monotone_and_bounded(spark):
    rows = _rows(spark, "token_coverage_curve")
    assert [r.k for r in rows] == [10, 100, 1000, 10000]
    cov = [r.coverage for r in rows]
    assert all(b >= a for a, b in zip(cov, cov[1:])), cov
    for r in rows:
        assert r.k_effective == min(r.k, r.vocab_size)
        assert 0.0 < r.coverage <= 1.0
        assert r.covered_tokens <= r.total_tokens
    # once k_effective saturates at the vocab size, coverage is total
    sat = [r for r in rows if r.k_effective == r.vocab_size]
    for r in sat:
        assert r.covered_tokens == r.total_tokens


def test_sttr_bounds_and_naive_ttr_bias(spark):
    """STTR is a per-25-token distinct share (bounded (0, 1]); the
    naive per-source TTR must fall BELOW the fixed-window STTR on any
    corpus whose sources hold many docs (vocabulary saturates while
    tokens keep accumulating — the length bias STTR exists to fix)."""
    rows = _rows(spark, "source_segmental_ttr")
    assert rows
    for r in rows:
        assert 0.0 < r.sttr <= 1.0
        assert 1.0 / 25 <= r.sttr  # >= 1 type per segment
        assert 0.0 < r.ttr_naive <= 1.0
        assert r.n_segments * 25 <= r.total_tokens
        assert r.vocab <= r.total_tokens
        assert r.ttr_naive < r.sttr, (r.source, r.ttr_naive, r.sttr)


def test_burstiness_function_words_near_one(spark):
    """Sanity on the metric's separating power: the most Poisson-like
    (least bursty) top token should sit close to 1 while the burstiest
    sits measurably below it."""
    rows = _rows(spark, "token_burstiness")
    bs = sorted(r.burstiness for r in rows)
    assert bs[-1] > bs[0]
    assert bs[-1] > 0.5


def test_graph_convergence_columns(spark):
    """VERDICT r8 task 5: the four fixed-round iterative graph queries
    must carry in-band convergence evidence."""
    pr = _rows(spark, "pagerank_trade_network")
    assert pr
    for r in pr:
        assert r.delta_q >= 0.0
        assert r.l1_residual == pr[0].l1_residual  # global constant
        assert r.delta_q <= r.l1_residual + 1e-9
    lpa = _rows(spark, "supplier_communities_lpa")
    n_nodes = sum(r.size for r in lpa)
    for r in lpa:
        assert 0 <= r.n_changed_last_round <= n_nodes
        assert r.n_changed_last_round == lpa[0].n_changed_last_round
    hits = _rows(spark, "supplier_hits_scores")
    by_kind = {}
    for r in hits:
        assert 0.0 <= r.delta_q <= r.max_delta + 1e-9
        by_kind.setdefault(r.kind, set()).add(r.max_delta)
    assert set(by_kind) == {"customer", "supplier"}
    for kind, deltas in by_kind.items():
        assert len(deltas) == 1  # per-kind constant
    kc = _rows(spark, "supplier_kcore_peeling")
    assert [r.rnd for r in kc] == [1, 2, 3]
    prev_nodes = None
    for r in kc:
        assert r.n_dropped_nodes >= 0
        if prev_nodes is not None:
            assert prev_nodes - r.n_nodes == r.n_dropped_nodes
        assert r.converged == (r.n_dropped_nodes == 0 and r.rnd > 1 and kc[r.rnd - 2].n_edges == r.n_edges) or r.rnd == 1
        prev_nodes = r.n_nodes
