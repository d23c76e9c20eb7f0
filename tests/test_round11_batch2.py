"""Round-11-batch-2 operator invariants (registered after the round-10
window filled; driver rows come with the round-11 rotation — see
registry.py). Each is also oracled, so test_oracle_parity.py
hash-checks all six on every pytest run; these tests pin the
algorithmic contracts against independent replicas."""

from __future__ import annotations

import math

from hadoop_cs4225_spark import registry
from tests.conftest import SF_ORACLE

registry.load_all()


def _rows(spark, name, sf=SF_ORACLE):
    return registry.QUERIES[name](spark, sf).collect()


def _daily_order_counts():
    import numpy as np
    import pandas as pd

    o = pd.read_parquet(f"{SF_ORACLE}/orders.parquet")
    days = o.o_orderdate.dt.normalize().value_counts().sort_index()
    return np.asarray(days.to_numpy(), dtype=np.float64)


def test_ar2_replica_numpy(spark):
    """Yule-Walker from biased autocovariances, recomputed with numpy
    from the raw parquet (different algorithm: vectorized float sums
    instead of exact integer moments)."""
    import numpy as np

    (r,) = _rows(spark, "orders_ar2_yule_walker")
    x = _daily_order_counts()
    n = len(x)
    m = x.mean()
    c = [((x[: n - k] - m) * (x[k:] - m)).sum() / n for k in (0, 1, 2)]
    r1, r2 = c[1] / c[0], c[2] / c[0]
    phi1 = r1 * (1 - r2) / (1 - r1 * r1)
    phi2 = (r2 - r1 * r1) / (1 - r1 * r1)
    assert r.n_days == n
    assert abs(r.r1 - r1) < 1e-4
    assert abs(r.r2 - r2) < 1e-4
    assert abs(r.phi1 - phi1) < 1e-4
    assert abs(r.phi2 - phi2) < 1e-4
    assert abs(r.innovation_ratio - (1 - phi1 * r1 - phi2 * r2)) < 1e-4
    # stationarity sanity on a mean-reverting count series
    assert 0.0 < r.innovation_ratio <= 1.0 + 1e-9


def test_spectral_entropy_bounds_and_replica(spark):
    import numpy as np

    from hadoop_cs4225_spark.operators.algo_ops import _SPEC_PERIODS

    (r,) = _rows(spark, "orders_spectral_entropy")
    assert r.n_periods == len(_SPEC_PERIODS)
    assert 1 <= r.n_active_periods <= r.n_periods
    assert r.dominant_period in _SPEC_PERIODS
    assert 0.0 <= r.spectral_entropy <= 1.0 + 1e-9
    assert 0.0 < r.flatness <= 1.0 + 1e-9
    # numpy replica: raw (un-gridded) Goertzel powers -> entropy
    x = _daily_order_counts()
    n = len(x)
    t = np.arange(n)
    m = x.mean()
    pw = []
    for p in _SPEC_PERIODS:
        ang = 2 * math.pi * (t % p) / p
        c = ((x - m) * np.cos(ang)).sum()
        s = ((x - m) * np.sin(ang)).sum()
        pw.append((c * c + s * s) / n)
    pw = np.asarray(pw)
    sh = pw / pw.sum()
    ent = -(sh[sh > 0] * np.log(sh[sh > 0])).sum() / math.log(len(pw))
    assert abs(r.spectral_entropy - ent) < 0.02
    assert _SPEC_PERIODS[int(np.argmax(pw))] == r.dominant_period


def test_nelson_aalen_vs_kaplan_meier(spark):
    """exp(-H(t)) >= S_KM(t) pointwise (1 - x <= exp(-x) per factor),
    shared life table means identical risk columns."""
    na = _rows(spark, "ship_delay_nelson_aalen")
    km = {r.t_days: r for r in _rows(spark, "orders_kaplan_meier")}
    assert set(r.t_days for r in na) == set(km)
    prev_h, prev_s = -1.0, 2.0
    for r in na:
        k = km[r.t_days]
        assert (r.n_risk, r.n_events, r.n_censored) == (
            k.n_risk,
            k.n_events,
            k.n_censored,
        )
        assert r.fh_survival >= k.survival - 1e-9
        assert r.cum_hazard >= prev_h - 1e-12  # hazard accumulates
        assert r.fh_survival <= prev_s + 1e-12  # survival decays
        assert 0.0 <= r.var_hazard <= r.cum_hazard + 1e-9
        prev_h, prev_s = r.cum_hazard, r.fh_survival


def test_allan_variance_replica_numpy(spark):
    import numpy as np
    import pandas as pd

    rows = _rows(spark, "events_allan_variance")
    assert rows
    ev = pd.read_parquet(f"{SF_ORACLE}/events.parquet")
    daily = (
        ev.groupby(["event_type", ev.ts.dt.normalize()])
        .size()
        .rename("x")
        .reset_index()
    )
    for r in rows:
        x = daily[daily.event_type == r.event_type].sort_values("ts").x.to_numpy()
        k = len(x) // r.tau
        means = x[: k * r.tau].reshape(k, r.tau).mean(axis=1)
        d = np.diff(means)
        assert r.n_blocks == k
        assert r.n_diffs == k - 1
        assert abs(r.allan_var - (d * d).mean() / 2.0) < 1e-6
    # dyadic exactness claim: tau=1 equals half the mean squared diff
    taus = sorted({r.tau for r in rows})
    assert taus == [1, 2, 4, 8]


def test_holt_replica_python(spark):
    """Same two-state recursion in pure python, including the per-step
    1e-6 quantization, from the raw parquet."""
    import pandas as pd

    rows = _rows(spark, "orders_holt_linear_smoothing")
    o = pd.read_parquet(f"{SF_ORACLE}/orders.parquet")
    monthly = (
        o.assign(m=o.o_orderdate.dt.strftime("%Y-%m"))
        .groupby("m")
        .o_totalprice.sum()
        .round(2)
        .sort_index()
    )
    assert [r.month for r in rows] == list(monthly.index)
    l, b = float(monthly.iloc[0]), 0.0
    for i, r in enumerate(rows):
        if i > 0:
            v = float(monthly.iloc[i])
            ln = math.floor((0.3 * v + 0.7 * (l + b)) * 1e6 + 0.5) / 1e6
            b = math.floor((0.2 * (ln - l) + 0.8 * b) * 1e6 + 0.5) / 1e6
            l = ln
        assert abs(r.level - l) < 1e-3, (r.month, r.level, l)
        assert abs(r.trend - b) < 1e-3
        assert abs(r.forecast_next - (l + b)) < 0.02


def test_lorenz_gini_invariants_and_replica(spark):
    import numpy as np
    import pandas as pd

    rows = _rows(spark, "customer_spend_lorenz_gini")
    assert rows
    # Lorenz curve: below the diagonal, both cumulatives end at 1
    prev_p = prev_s = 0.0
    ginis = set()
    for r in rows:
        assert r.cum_spend_share <= r.cum_pop_share + 1e-9
        assert r.cum_pop_share >= prev_p and r.cum_spend_share >= prev_s
        prev_p, prev_s = r.cum_pop_share, r.cum_spend_share
        ginis.add(r.gini)
    assert abs(prev_p - 1.0) < 1e-6 and abs(prev_s - 1.0) < 1e-6
    assert len(ginis) == 1  # attached constant, one fold
    g = ginis.pop()
    assert 0.0 <= g < 1.0
    # replica: same grouped trapezoid formula from raw parquet
    o = pd.read_parquet(f"{SF_ORACLE}/orders.parquet")
    cents = (
        np.floor(o.o_totalprice.to_numpy() * 100 + 0.5)
        .astype(np.int64)
    )
    spend = pd.Series(cents).groupby(o.o_custkey.to_numpy()).sum()
    bucket = spend // 102_400
    grp = spend.groupby(bucket)
    n_i = grp.size().sort_index()
    s_i = grp.sum().sort_index()
    cs = s_i.cumsum()
    f = n_i / n_i.sum()
    s_sh = (cs + cs - s_i) / s_i.sum()
    assert abs(g - (1.0 - float((f * s_sh).sum()))) < 1e-6
