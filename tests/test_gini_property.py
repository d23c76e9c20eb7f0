"""Property test for `user_activity_gini`'s rank-block algebra.

The registered query never ranks users; it computes
``2*sum_i rank_i*x_i = sum_v v*(2*m_v*s_v + m_v*(m_v+1))`` on the
count-value histogram. This pins that identity (and the final Gini
formula) against the textbook sorted-rank computation on arbitrary
positive integer count multisets — pure Python, no engines, so a
failure is an algebra bug, not a float artifact. The cross-engine
float behavior of the final division is covered by the oracle parity
test; the integer core must be EXACT.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st


def _gini_direct(counts: list[int]) -> tuple[int, float]:
    xs = sorted(counts)
    n = len(xs)
    s = sum(xs)
    rank2 = 2 * sum(i * x for i, x in enumerate(xs, start=1))
    return rank2, rank2 / (n * s) - (n + 1.0) / n


def _gini_histogram(counts: list[int]) -> tuple[int, float]:
    hist = Counter(counts)
    n = sum(hist.values())
    s = sum(v * m for v, m in hist.items())
    before = 0
    rank2 = 0
    for v in sorted(hist):
        m = hist[v]
        rank2 += v * (2 * m * before + m * (m + 1))
        before += m
    return rank2, rank2 / (n * s) - (n + 1.0) / n


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=10**6), min_size=1, max_size=300))
def test_rank_block_identity_exact(counts):
    r_direct, g_direct = _gini_direct(counts)
    r_hist, g_hist = _gini_histogram(counts)
    assert r_direct == r_hist  # integer identity, must be EXACT
    assert g_direct == g_hist  # same operands -> same IEEE result


@given(st.lists(st.integers(min_value=1, max_value=1000), min_size=2, max_size=200))
@settings(max_examples=200, deadline=None)
def test_gini_bounds_and_extremes(counts):
    _, g = _gini_histogram(counts)
    n = len(counts)
    assert -1e-12 <= g <= 1.0
    if len(set(counts)) == 1:  # perfectly uniform load
        assert abs(g) < 1e-12
    # one user owns ~everything -> approaches (n-1)/n
    dominated = [1] * (n - 1) + [10**9]
    _, gd = _gini_histogram(dominated)
    assert gd > (n - 1) / n - 0.01
