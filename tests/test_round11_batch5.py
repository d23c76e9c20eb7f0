"""Round-11-batch-5 operator invariants: fluency outlier gate,
packing-efficiency curve, degree power-law, stratified KM. All four
are oracled (test_oracle_parity.py hash-checks them each run)."""

from __future__ import annotations

from hadoop_cs4225_spark import registry
from tests.conftest import SF_ORACLE

registry.load_all()


def _rows(spark, name, sf=SF_ORACLE):
    return registry.QUERIES[name](spark, sf).collect()


def test_fluency_gate_consistent_with_scores(spark):
    """The gate must agree with doc_bigram_logprob: flagged docs per
    source == docs whose centinat bin sits below median - 3*MAD."""
    import math

    gate = {r.source: r for r in _rows(spark, "doc_fluency_outlier_gate")}
    scores = _rows(spark, "doc_bigram_logprob")
    assert gate
    (any_row,) = [next(iter(gate.values()))]
    med, mad = any_row.median_centinats, any_row.mad_centinats
    assert all(
        (r.median_centinats, r.mad_centinats) == (med, mad)
        for r in gate.values()
    )  # corpus-level thresholds attached to every row
    # recompute bins from the registered scores (shared LM)
    import pandas as pd

    docs = pd.read_parquet(f"{SF_ORACLE}/documents.parquet")[
        ["doc_id", "source"]
    ]
    src = dict(zip(docs.doc_id, docs.source))
    per_source: dict = {}
    for r in scores:
        b = math.floor(r.avg_logp * 100)
        s = src[r.doc_id]
        n, low = per_source.get(s, (0, 0))
        per_source[s] = (n + 1, low + (1 if b < med - 3 * mad else 0))
    for s, (n, low) in per_source.items():
        assert gate[s].n_docs == n
        assert gate[s].n_low_fluency == low, s
        assert abs(gate[s].low_rate - low / n) < 1e-5
    assert mad >= 0 and med < 0  # log-probs are negative


def test_packing_curve_tradeoff(spark):
    rows = _rows(spark, "packing_efficiency_curve")
    assert [r.budget for r in rows] == [512, 2048, 8192]
    prev = None
    for r in rows:
        assert r.n_bins * r.budget >= r.n_docs  # capacity sanity
        assert 0 <= r.n_straddle <= r.n_docs
        assert 0.0 <= r.straddle_rate <= 1.0
        assert 0.0 <= r.waste_frac < 1.0
        assert r.tail_waste_tokens < r.n_bins * r.budget
        if prev is not None:
            # longer contexts waste MORE tail tokens in absolute terms
            # (bigger partial bins) but the doc count never changes
            assert r.n_docs == prev.n_docs
            assert r.n_bins <= prev.n_bins
        prev = r


def test_packing_curve_replica_python(spark):
    import pandas as pd

    rows = {r.budget: r for r in _rows(spark, "packing_efficiency_curve")}
    docs = pd.read_parquet(f"{SF_ORACLE}/documents.parquet").sort_values(
        ["source", "doc_id"]
    )
    for B, r in rows.items():
        n_bins = n_straddle = waste = n_docs = 0
        for _, g in docs.groupby("source"):
            off = 0
            for t in g.text:
                n = len([w for w in str(t).split() if w])
                n_docs += 1
                if n > 0 and (off + n - 1) // B > off // B:
                    n_straddle += 1
                off += n
            bins = (off + B - 1) // B
            n_bins += bins
            waste += bins * B - off
        assert (r.n_bins, r.n_docs, r.n_straddle, r.tail_waste_tokens) == (
            n_bins,
            n_docs,
            n_straddle,
            waste,
        ), B


def test_degree_powerlaw_sane(spark):
    rows = {r.kind: r for r in _rows(spark, "trade_degree_powerlaw")}
    assert set(rows) == {"customer", "supplier"}
    for r in rows.values():
        assert r.n_tail <= r.n_nodes
        assert r.max_degree >= 4
        assert 1.0 < r.alpha_hill < 30.0


def test_stratified_km_matches_pooled_shape(spark):
    strat = _rows(spark, "ship_delay_km_by_segment")
    pooled = {r.t_days: r for r in _rows(spark, "orders_kaplan_meier")}
    segs: dict = {}
    for r in strat:
        segs.setdefault(r.mktsegment, []).append(r)
    assert len(segs) >= 3
    total_at_0 = 0
    for seg, rows in segs.items():
        prev = 2.0
        for r in sorted(rows, key=lambda x: x.t_days):
            assert 0.0 <= r.survival <= prev + 1e-9  # monotone decay
            prev = r.survival
            assert r.n_events + r.n_censored <= r.n_risk
        total_at_0 += max(r.n_risk for r in rows)
    # strata partition the pooled cohort
    assert total_at_0 == max(p.n_risk for p in pooled.values())


def test_logrank_replica_python(spark):
    """Plain-python log-rank over the same censored cohorts."""
    import pandas as pd

    (r,) = _rows(spark, "orders_logrank_test")
    o = pd.read_parquet(f"{SF_ORACLE}/orders.parquet")
    c = pd.read_parquet(f"{SF_ORACLE}/customer.parquet")
    li = pd.read_parquet(f"{SF_ORACLE}/lineitem.parquet")
    first = li.groupby("l_orderkey").l_shipdate.min()
    m = o.merge(
        c[["c_custkey", "c_mktsegment"]],
        left_on="o_custkey",
        right_on="c_custkey",
    ).set_index("o_orderkey")
    m = m.join(first.rename("ship"), how="inner")
    dur = (
        (m.ship.dt.normalize() - m.o_orderdate.dt.normalize()).dt.days
    ).clip(lower=0)
    grp = (m.c_mktsegment == "AUTOMOBILE").astype(int)
    t = dur.clip(upper=60)
    ev = (dur <= 60).astype(int)
    o1 = e1 = v = 0.0
    n_times = 0
    times = sorted(t.unique())
    for tt in times:
        at1 = (grp == 1) & (t >= tt)
        at0 = (grp == 0) & (t >= tt)
        n1, n2 = int(at1.sum()), int(at0.sum())
        d1 = int(((t == tt) & ev.astype(bool) & (grp == 1)).sum())
        d2 = int(((t == tt) & ev.astype(bool) & (grp == 0)).sum())
        n, d = n1 + n2, d1 + d2
        if n <= 1 or d == 0:
            continue
        n_times += 1
        o1 += d1
        e1 += n1 * d / n
        v += d * (n1 / n) * (n2 / n) * (n - d) / (n - 1)
    assert r.n_times == n_times
    assert r.observed_events == o1
    assert abs(r.expected_events - e1) < 1e-3
    assert abs(r.variance - v) < 1e-3
    assert abs(r.chi2 - (o1 - e1) ** 2 / v) < 1e-3
