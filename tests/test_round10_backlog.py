"""Round-10-backlog operator invariants (registered after the round-9
window filled; driver rows come next round — see registry.py)."""

from __future__ import annotations

import math

from hadoop_cs4225_spark import registry
from tests.conftest import SF_ORACLE

registry.load_all()


def _rows(spark, name, sf=SF_ORACLE):
    return registry.QUERIES[name](spark, sf).collect()


def test_window_pmi_bounds_and_order(spark):
    rows = _rows(spark, "token_window_pmi_topk")
    assert len(rows) == 20
    scores = [r.npmi for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert -1.0 - 1e-6 <= r.npmi <= 1.0 + 1e-6  # NPMI range
        assert r.c >= 5  # min-count filter


def test_periodogram_dominant_and_nonneg(spark):
    rows = _rows(spark, "orders_periodogram_power")
    assert [r.period_days for r in rows] == [2, 3, 7, 14, 30]
    dom = [r for r in rows if r.is_dominant]
    assert len(dom) == 1
    mx = max(r.power for r in rows)
    assert dom[0].power == mx
    for r in rows:
        assert r.power >= 0.0


def test_periodogram_replica_numpy(spark):
    import numpy as np
    import pandas as pd

    rows = {r.period_days: r.power for r in _rows(spark, "orders_periodogram_power")}
    o = pd.read_parquet(f"{SF_ORACLE}/orders.parquet")
    x = (
        o.groupby(o.o_orderdate.dt.normalize())
        .size()
        .sort_index()
        .to_numpy()
        .astype(float)
    )
    t = np.arange(len(x))
    xc = x - x.mean()
    for p, got in rows.items():
        ang = 2 * np.pi * t / p
        power = ((xc * np.cos(ang)).sum() ** 2 + (xc * np.sin(ang)).sum() ** 2) / len(x)
        assert abs(got - power) < max(1e-3, 1e-4 * power), (p, got, power)


def test_ppr_mass_and_seed_locality(spark):
    rows = _rows(spark, "supplier_personalized_pagerank")
    assert len(rows) == 20
    for r in rows:
        assert r.ppr_q >= 0.0
        assert r.l1_residual == rows[0].l1_residual
    # walks start AND teleport at seeds: seeds (odd supplier nodes of
    # the seed nation) must dominate the top ranks
    assert any(r.is_seed for r in rows[:5])
    # PPR mass concentrates: top-20 holds a visible share of the unit
    assert sum(r.ppr_q for r in rows) > 0.01


def test_maxsim_dominates_single_vector_cos(spark):
    """MaxSim >= full-vector cosine for the same (query, doc): the
    best-subvector match per query part can only beat the forced
    global alignment. Verify on the top-10 via numpy."""
    import numpy as np
    import pandas as pd

    rows = _rows(spark, "embedding_maxsim_topk")
    assert len(rows) == 10
    scores = [r.maxsim_score for r in rows]
    assert scores == sorted(scores, reverse=True)
    emb = pd.read_parquet(f"{SF_ORACLE}/embeddings.parquet")
    vecs = {
        int(r.vec_id): np.floor(
            np.array(r.embedding, dtype=float) * 10_000 + 0.5
        )
        for r in emb.itertuples()
    }
    q = vecs[0]
    qs = q.reshape(4, 16)
    for r in rows:
        d = vecs[int(r.vec_id)].reshape(4, 16)
        ms = 0.0
        for a in qs:
            best = max(
                float(a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))
                for b in d
            )
            ms += best
        assert abs(r.maxsim_score - ms) < 1e-4, (r.vec_id, r.maxsim_score, ms)
        full = float(q @ vecs[int(r.vec_id)]) / (
            np.linalg.norm(q) * np.linalg.norm(vecs[int(r.vec_id)])
        )
        # sum-of-4 maxima vs 4 * (weighted avg of aligned parts)
        assert ms >= full - 1e-9
