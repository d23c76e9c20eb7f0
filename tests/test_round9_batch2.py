"""Round-9 batch-2 operator invariants (classical stats / ML closed
forms). Cross-engine parity is covered by tests/test_oracle_parity.py;
these pin the algorithmic identities the oracles cannot express.
"""

from __future__ import annotations

import math

import pandas as pd

from hadoop_cs4225_spark import registry
from tests.conftest import SF_ORACLE

registry.load_all()


def _rows(spark, name, sf=SF_ORACLE):
    return registry.QUERIES[name](spark, sf).collect()


def test_mutual_info_bounds(spark):
    """0 <= MI <= min(Hx, Hy); NMI in [0, 1]; entropies at most
    ln(cardinality)."""
    [r] = _rows(spark, "priority_returnflag_mutual_info")
    assert r.n > 0 and r.n_cells >= 2
    assert 0.0 <= r.mi_nats <= min(r.h_priority, r.h_returnflag) + 1e-9
    assert 0.0 <= r.nmi <= 1.0 + 1e-9
    assert r.h_priority <= math.log(5) + 1e-9
    assert r.h_returnflag <= math.log(3) + 1e-9
    # NMI is the stated composition of the other three columns
    assert abs(r.nmi - r.mi_nats / math.sqrt(r.h_priority * r.h_returnflag)) < 1e-4


def test_anova_matches_pandas(spark):
    [r] = _rows(spark, "lineitem_anova_returnflag")
    li = pd.read_parquet(f"{SF_ORACLE}/lineitem.parquet")[
        ["l_returnflag", "l_quantity"]
    ]
    n, k = len(li), li["l_returnflag"].nunique()
    assert (r.n, r.k) == (n, k)
    grand = li["l_quantity"].mean()
    ssb = sum(
        len(g) * (g["l_quantity"].mean() - grand) ** 2
        for _, g in li.groupby("l_returnflag")
    )
    sst = ((li["l_quantity"] - grand) ** 2).sum()
    ssw = sst - ssb
    assert abs(r.ss_between - ssb) < max(1e-6 * ssb, 0.01)
    assert abs(r.ss_within - ssw) < max(1e-6 * ssw, 0.01)
    f_re = (ssb / (k - 1)) / (ssw / (n - k))
    assert abs(r.f_stat - f_re) < 1e-3 * max(1.0, f_re)
    assert 0.0 <= r.eta_sq <= 1.0
    assert abs(r.eta_sq - ssb / sst) < 1e-6


def test_logit_step_matches_numpy(spark):
    import numpy as np

    [r] = _rows(spark, "lineitem_logit_fisher_step")
    li = pd.read_parquet(f"{SF_ORACLE}/lineitem.parquet")
    X = np.column_stack(
        [
            np.ones(len(li)),
            li["l_quantity"].to_numpy(),
            np.floor(li["l_discount"].to_numpy() * 100 + 0.5),
        ]
    )
    y = (li["l_returnflag"] == "R").to_numpy().astype(float)
    beta = 4.0 * np.linalg.solve(X.T @ X, X.T @ (y - 0.5))
    got = np.array([r.beta_intercept, r.beta_quantity, r.beta_discount])
    assert np.allclose(got, beta, rtol=1e-6, atol=1e-8), (got, beta)
    m = X @ beta
    ll = np.mean(np.log1p(np.exp(-(2 * y - 1) * m)))
    assert abs(r.avg_logloss - ll) < 1e-6
    acc = np.mean((m > 0) == (y == 1))
    assert abs(r.train_accuracy - acc) < 1e-6
    # one step from 0 must not be WORSE than the trivial ln(2) loss
    assert r.avg_logloss <= math.log(2.0) + 1e-9


def test_geomfit_identities(spark):
    [r] = _rows(spark, "customer_order_gap_geomfit")
    assert r.n_gaps > 0
    assert abs(r.p_hat - 1.0 / (1.0 + r.mean_gap_days)) < 1e-6
    assert r.n_cells == 9
    assert r.chi2_stat >= 0.0


def test_mahalanobis_topk_shape_and_floor(spark):
    rows = _rows(spark, "embedding_mahalanobis_outliers")
    by_label = {}
    for r in rows:
        by_label.setdefault(r.label, []).append(r)
    for label, rs in by_label.items():
        assert len(rs) == 5
        d = [r.dist_sq for r in rs]
        assert d == sorted(d, reverse=True)
        # E[dist_sq] = dim for in-distribution points, so the TOP
        # outlier must sit at or above the 64-dim expectation
        assert d[0] >= 64.0 * 0.5
        for r in rs:
            assert r.dist_sq > 0.0
            assert r.n_label >= 2
