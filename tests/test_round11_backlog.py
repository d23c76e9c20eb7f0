"""Round-11-backlog operator invariants (registered after the round-10
window filled; driver rows come next round — see registry.py). Each is
also oracled, so test_oracle_parity.py hash-checks all four on every
pytest run; these tests pin the algorithmic contracts."""

from __future__ import annotations

import math

from hadoop_cs4225_spark import registry
from tests.conftest import SF_ORACLE

registry.load_all()


def _rows(spark, name, sf=SF_ORACLE):
    return registry.QUERIES[name](spark, sf).collect()


def test_weibull_fit_sane(spark):
    (r,) = _rows(spark, "orders_weibull_delay_fit")
    assert r.n_points >= 10
    assert r.n_orders > r.n_points  # day-domain rollup compressed rows
    assert 0.0 < r.shape < 10.0
    assert 0.0 < r.scale_days < 365.0
    assert 0.0 <= r.r2 <= 1.0 + 1e-9


def test_weibull_replica_numpy(spark):
    """OLS on the same Weibull-plot points, recomputed from raw parquet."""
    import numpy as np
    import pandas as pd

    (r,) = _rows(spark, "orders_weibull_delay_fit")
    o = pd.read_parquet(f"{SF_ORACLE}/orders.parquet")
    li = pd.read_parquet(f"{SF_ORACLE}/lineitem.parquet")
    first = li.groupby("l_orderkey").l_shipdate.min()
    m = o.set_index("o_orderkey").join(first.rename("ship"))
    dur = (m.ship.dt.normalize() - m.o_orderdate.dt.normalize()).dt.days
    dur = dur[(dur >= 1) & (dur <= 365)]
    t, c = np.unique(dur.to_numpy(), return_counts=True)
    f = np.cumsum(c)
    n = f[-1]
    keep = f < n
    x = np.log(t[keep].astype(float))
    y = np.log(-np.log(1.0 - f[keep] / n))
    k = len(x)
    slope = (k * (x * y).sum() - x.sum() * y.sum()) / (
        k * (x * x).sum() - x.sum() ** 2
    )
    scale = math.exp(-((y.sum() - slope * x.sum()) / k) / slope)
    assert abs(r.shape - slope) < 1e-3, (r.shape, slope)
    assert abs(r.scale_days - scale) < max(0.05, 1e-3 * scale)


def test_burst_scan_dominates_minute_peak(spark):
    rows = {r.event_type: r for r in _rows(spark, "events_burst_scan_statistic")}
    peaks = {
        r.event_type: r.peak_minute_events
        for r in _rows(spark, "events_minute_peak")
    }
    assert set(rows) == set(peaks)
    for et, r in rows.items():
        # a 60-minute window at least contains the hottest minute
        assert r.peak_window_events >= peaks[et]
        assert r.peak_window_events <= r.n_events
        assert r.peak_ratio >= 1.0 - 1e-6  # peak >= mean window by def
        assert r.span_minutes > 0


def test_boosted_stumps_gain_decreases(spark):
    rows = _rows(spark, "lineitem_boosted_stumps")
    assert [r.round for r in rows] == [1, 2]
    r1, r2 = rows
    for r in rows:
        assert r.gain >= -1e-6  # splitting never hurts SSE
        assert 1 <= r.split_quantity <= 50
    # round 2 fits residuals — strictly less signal left than round 1
    assert r2.gain <= r1.gain + 1e-6
    # round-2 leaf values are ADJUSTMENTS around zero-mean residuals:
    # they must bracket zero (one leaf up, one down)
    assert (r2.left_value <= 1e-6) != (r2.right_value <= 1e-6) or (
        abs(r2.left_value) < 1.0 and abs(r2.right_value) < 1.0
    )


def test_boosted_stumps_round1_replica_numpy(spark):
    import numpy as np
    import pandas as pd

    r1 = _rows(spark, "lineitem_boosted_stumps")[0]
    li = pd.read_parquet(f"{SF_ORACLE}/lineitem.parquet")
    x = li.l_quantity.astype(int).to_numpy()
    y = np.floor(li.l_extendedprice.to_numpy() * 100 + 0.5).astype(np.int64)
    best, best_score = None, -np.inf
    for s in sorted(set(x))[:-1]:
        l, r = y[x <= s], y[x > s]
        # float BEFORE squaring: int64 silently wraps on (sum of cents)^2
        score = float(l.sum()) ** 2 / len(l) + float(r.sum()) ** 2 / len(r)
        if score > best_score:
            best, best_score = s, score
    lm = y[x <= best].mean() / 100
    assert r1.split_quantity == best
    assert abs(r1.left_value - lm) < 0.02


def test_char_entropy_bounds(spark):
    rows = _rows(spark, "source_char_entropy")
    assert rows
    for r in rows:
        # order-0 char entropy of text is within (0, log2(alphabet)];
        # printable-ASCII corpora stay well under 7 bits
        assert 0.0 < r.min_char_entropy_bits <= r.mean_char_entropy_bits
        assert r.mean_char_entropy_bits <= r.max_char_entropy_bits <= 8.0
        assert r.n_docs > 0
