"""Pure-python replicas of the trickiest round-9 math — these pin the
ALGORITHMS against an independent implementation, complementing the
DuckDB oracles (which could share a misconception with the Spark code)
and the invariant tests (which only bound results).
"""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from hadoop_cs4225_spark import registry
from tests.conftest import SF_ORACLE

registry.load_all()


def _rows(spark, name, sf=SF_ORACLE):
    return registry.QUERIES[name](spark, sf).collect()


def test_quantile_grid_loss_exact_at_reported_intercept(spark):
    """The histogram rewrite's core claim: the reported pinball loss is
    the EXACT loss of the reported (slope, intercept) line — the
    approximation lives only in the intercept pick. Recompute the loss
    from raw rows for every grid point."""
    rows = _rows(spark, "lineitem_quantile_reg_grid")
    li = pd.read_parquet(f"{SF_ORACLE}/lineitem.parquet")
    yc = (li.l_extendedprice * 100 + 0.5).apply(math.floor).astype(int)
    qty = li.l_quantity.astype(int)
    n = len(li)
    for r in rows:
        a = round(r.intercept_dollars * 100)  # exact: multiple of $10
        res = yc - r.slope_dollars * 100 * qty
        loss10 = int(
            sum(9 * (v - a) if v >= a else (a - v) for v in res)
        )
        expect = loss10 / 10 / n / 100
        assert abs(r.avg_pinball_dollars - expect) < 1e-3, (
            r.slope_dollars,
            r.avg_pinball_dollars,
            expect,
        )
    # and the intercept is within one $10 bucket of the exact quantile
    best = [r for r in rows if r.is_best]
    assert len(best) == 1


def test_hurst_replica_numpy(spark):
    """Full R/S replica: block means, integer demeaned walks, ranges
    and stddevs recomputed from the raw daily series."""
    import numpy as np

    rows = {r.window_days: r for r in _rows(spark, "orders_hurst_rs")}
    o = pd.read_parquet(f"{SF_ORACLE}/orders.parquet")
    daily = (
        o.groupby(o.o_orderdate.dt.normalize()).size().sort_index().to_numpy()
    )
    for m, r in rows.items():
        k = len(daily) // m
        rs_vals = []
        for b in range(k):
            x = daily[b * m : (b + 1) * m].astype(float)
            dev = np.cumsum(x - x.mean())
            R = dev.max() - dev.min()
            S = x.std(ddof=0)
            if S > 0:
                rs_vals.append(R / S)
        assert r.n_blocks == len(rs_vals)
        assert abs(r.mean_rs - np.mean(rs_vals)) < 1e-4 * max(
            1.0, np.mean(rs_vals)
        )


def test_js_divergence_replica(spark):
    """Direct JS divergence (full outer over the union vocabulary) for
    three source pairs — verifies the inner-join + ln2-mass closed-form
    decomposition against the textbook definition."""
    rows = _rows(spark, "source_js_divergence_matrix")
    docs = pd.read_parquet(f"{SF_ORACLE}/documents.parquet")
    dists = {}
    for src, grp in docs.groupby("source"):
        c = Counter()
        for t in grp.text:
            c.update(w for w in t.split() if w)
        tot = sum(c.values())
        dists[src] = {w: n / tot for w, n in c.items()}
    for r in rows[:3]:
        p, q = dists[r.source_a], dists[r.source_b]
        js = 0.0
        for w in set(p) | set(q):
            pw, qw = p.get(w, 0.0), q.get(w, 0.0)
            mw = (pw + qw) / 2
            if pw:
                js += 0.5 * pw * math.log(pw / mw)
            if qw:
                js += 0.5 * qw * math.log(qw / mw)
        assert abs(r.js_divergence - js) < 1e-4, (r.source_a, r.source_b)


def test_rake_replica(spark):
    """Pure-python RAKE on the same stopword list: phrase scores and
    the top-20 membership must agree."""
    from hadoop_cs4225_spark.operators.text_analysis import (
        QUALITY_STOPWORDS,
        _RAKE_MAXLEN,
    )

    rows = _rows(spark, "doc_rake_keyphrases")
    docs = pd.read_parquet(f"{SF_ORACLE}/documents.parquet")
    stop = set(QUALITY_STOPWORDS)
    phrases = []
    for t in docs.text:
        cur = []
        for w in [w for w in t.split() if w]:
            if w in stop:
                if cur:
                    phrases.append(tuple(cur))
                cur = []
            else:
                cur.append(w)
        if cur:
            phrases.append(tuple(cur))
    phrases = [p for p in phrases if len(p) <= _RAKE_MAXLEN]
    freq: Counter = Counter()
    deg: Counter = Counter()
    for p in phrases:
        for w in p:
            freq[w] += 1
            deg[w] += len(p)
    def score(p):
        return sum(deg[w] / freq[w] for w in p)
    agg: dict = {}
    for p in phrases:
        key = " ".join(p)
        agg.setdefault(key, [0, score(p)])[0] += 1
    for r in rows:
        assert r.phrase in agg, r.phrase
        n_occ, sc = agg[r.phrase]
        assert r.n_occurrences == n_occ
        assert abs(r.rake_score - sc) < 1e-4, (r.phrase, r.rake_score, sc)
    # top-20 by (score, phrase) must match the replica's cut
    top = sorted(agg.items(), key=lambda kv: (-kv[1][1], kv[0]))[:20]
    assert {k for k, _ in top} == {r.phrase for r in rows}


def test_mutual_info_replica(spark):
    """Direct plug-in MI from the pandas contingency table."""
    [r] = _rows(spark, "priority_returnflag_mutual_info")
    o = pd.read_parquet(f"{SF_ORACLE}/orders.parquet")[
        ["o_orderkey", "o_orderpriority"]
    ]
    li = pd.read_parquet(f"{SF_ORACLE}/lineitem.parquet")[
        ["l_orderkey", "l_returnflag"]
    ]
    j = o.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    ct = pd.crosstab(j.o_orderpriority, j.l_returnflag)
    n = ct.to_numpy().sum()
    mi = 0.0
    for x in ct.index:
        for y in ct.columns:
            nxy = ct.loc[x, y]
            if nxy:
                mi += (nxy / n) * math.log(
                    nxy * n / (ct.loc[x].sum() * ct[y].sum())
                )
    assert abs(r.mi_nats - mi) < 1e-6
    hx = -sum(
        (ct.loc[x].sum() / n) * math.log(ct.loc[x].sum() / n)
        for x in ct.index
    )
    assert abs(r.h_priority - hx) < 1e-6
