"""Round-9 batch-3 operator invariants (embedding/ANN audits + graph
structure) and the Avro environment gate.
"""

from __future__ import annotations

import pytest

from hadoop_cs4225_spark import registry
from tests.conftest import SF_ORACLE

registry.load_all()


def _rows(spark, name, sf=SF_ORACLE):
    return registry.QUERIES[name](spark, sf).collect()


def test_triplet_margin_consistency(spark):
    rows = _rows(spark, "embedding_triplet_margin")
    assert len(rows) == 10  # one per label
    total = sum(r.n_vecs for r in rows)
    assert total >= 500
    for r in rows:
        assert r.min_margin <= r.mean_margin + 1e-9
        assert -2.0 <= r.min_margin <= 2.0  # cosine-difference range
        assert 0 <= r.n_violations <= r.n_vecs
        assert abs(r.violation_rate - r.n_violations / r.n_vecs) < 1e-4
        # violations are margins < 0.2, so a min above the threshold
        # forces zero violations and vice versa
        if r.min_margin >= 0.2:
            assert r.n_violations == 0
        if r.n_violations == 0:
            assert r.min_margin >= 0.2 - 1e-6


def test_index_balance_identities(spark):
    rows = _rows(spark, "ann_index_balance_audit")
    assert sorted(r.method for r in rows) == ["ivf", "lsh"]
    for r in rows:
        assert r.n_parts >= 2
        assert r.n_vecs >= r.n_parts  # no empty parts reported
        assert r.max_size >= r.n_vecs / r.n_parts - 1e-9
        assert abs(r.mean_size - r.n_vecs / r.n_parts) < 1e-4
        assert r.imbalance >= 1.0 - 1e-9
        assert abs(r.imbalance - r.max_size / r.mean_size) < 1e-3
        assert r.cv >= 0.0
    ivf = next(r for r in rows if r.method == "ivf")
    assert ivf.n_parts <= 16  # centroid count cap


def test_assortativity_range(spark):
    [r] = _rows(spark, "graph_degree_assortativity")
    assert r.n_edges > 0
    assert 1.0 <= r.mean_degree <= 5.0  # mutual-top-5 bound
    assert -1.0 - 1e-9 <= r.assortativity <= 1.0 + 1e-9


def test_local_clustering_vs_pandas(spark):
    import pandas as pd

    [r] = _rows(spark, "supplier_local_clustering")
    assert r.n_nodes_deg2 > 0
    assert 0.0 <= r.mean_local_cc <= 1.0
    assert r.n_open_nodes <= r.n_nodes_deg2
    # replica on the same memoized edge list
    from hadoop_cs4225_spark.operators.graph import _mutual_topk_edges

    edges = _mutual_topk_edges(spark, SF_ORACLE).toPandas()
    adj = {}
    for a, b in edges[["a", "b"]].itertuples(index=False):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    ccs = []
    n_open = 0
    for v, nb in adj.items():
        d = len(nb)
        if d < 2:
            continue
        nbl = sorted(nb)
        t = sum(
            1
            for i in range(d)
            for j in range(i + 1, d)
            if nbl[j] in adj.get(nbl[i], ())
        )
        ccs.append(2 * t / (d * (d - 1)))
        if t == 0:
            n_open += 1
    assert r.n_nodes_deg2 == len(ccs)
    assert r.n_open_nodes == n_open
    assert abs(r.mean_local_cc - sum(ccs) / len(ccs)) < 1e-6


def test_avro_connector_gate(spark):
    """VERDICT r8 task 6: Avro round-trip. The external spark-avro
    connector jar is absent from this container (pyspark ships only
    the avro core jars) and installs are out of scope — the same
    env-gate posture as the protobuf streaming test. This test
    documents the gate and PASSES as a round-trip wherever the
    connector exists."""
    try:
        spark.range(3).write.format("avro").mode("overwrite").save(
            "/tmp/_avro_gate"
        )
    except Exception as e:
        assert "avro" in str(e).lower()
        pytest.skip(
            "spark-avro connector jar not deployed in this container "
            "(external module since Spark 2.4; installs are out of "
            "scope). Round-trip runs wherever the connector exists."
        )
    back = spark.read.format("avro").load("/tmp/_avro_gate")
    assert back.count() == 3


def test_markov_stationary_mass_and_residual(spark):
    rows = _rows(spark, "events_markov_stationary")
    assert len(rows) == 5
    mass = sum(r.stationary_p for r in rows)
    emp = sum(r.empirical_p for r in rows)
    assert abs(mass - 1.0) < 1e-6  # no leaked probability mass
    assert abs(emp - 1.0) < 1e-6
    for r in rows:
        assert 0.0 < r.stationary_p < 1.0
        assert abs(r.gap - (r.stationary_p - r.empirical_p)) < 1e-6
        assert r.l1_residual == rows[0].l1_residual
    # uniform-ish event generator: three rounds should be essentially
    # converged on a 5-state well-mixed chain
    assert rows[0].l1_residual < 0.05


def test_countsketch_unbiased_vs_cms_onesided(spark):
    """The whole point of the pair: CMS errs one-sided, Count-Sketch is
    near-unbiased (signed errors cancel)."""
    [cs] = _rows(spark, "user_freq_countsketch_audit")
    [cms] = _rows(spark, "user_freq_cms_audit")
    assert cs.n_users == cms.n_users
    assert cms.avg_overestimate >= 0.0
    assert abs(cs.avg_signed_err) <= max(1.0, cs.avg_abs_err)
    assert cs.max_abs_err >= 0
    assert 0.0 <= cs.pct_exact <= 1.0


def test_window_group_limit_rows(spark):
    rows = _rows(spark, "orders_window_group_limit_topn")
    by_p = {}
    for r in rows:
        by_p.setdefault(r.o_orderpriority, []).append(r.o_totalprice)
    for p, vals in by_p.items():
        assert len(vals) <= 3
        assert vals == sorted(vals, reverse=True)
