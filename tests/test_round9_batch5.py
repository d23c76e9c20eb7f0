"""Round-9 batch-5 operator invariants (RAKE, LSH planner, weighted
quantiles, Hurst R/S)."""

from __future__ import annotations

import math

import pandas as pd

from hadoop_cs4225_spark import registry
from tests.conftest import SF_ORACLE

registry.load_all()


def _rows(spark, name, sf=SF_ORACLE):
    return registry.QUERIES[name](spark, sf).collect()


def test_rake_phrases_are_stopword_free(spark):
    from hadoop_cs4225_spark.operators.text_analysis import (
        QUALITY_STOPWORDS,
    )

    rows = _rows(spark, "doc_rake_keyphrases")
    assert len(rows) == 20
    scores = [r.rake_score for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        words = r.phrase.split(" ")
        assert 1 <= len(words) <= 6
        assert not set(words) & set(QUALITY_STOPWORDS)
        # every word scores deg/freq >= 1, so a phrase of k words
        # scores at least k
        assert r.rake_score >= len(words) - 1e-6
        assert r.n_occurrences >= 1


def test_band_planner_tradeoffs(spark):
    rows = {(r.bands, r.rows_per_band): r for r in _rows(spark, "lsh_band_planner")}
    assert set(rows) == {(4, 1), (2, 2), (1, 4)}
    # more rows per band -> stricter: fewer candidates, higher threshold
    assert rows[(4, 1)].n_candidates >= rows[(2, 2)].n_candidates
    assert rows[(2, 2)].n_candidates >= rows[(1, 4)].n_candidates
    assert rows[(4, 1)].threshold < rows[(2, 2)].threshold < rows[(1, 4)].threshold
    for (b, r), row in rows.items():
        # S-curve literals match the closed form
        assert abs(row.p_at_9 - (1 - (1 - 0.9**r) ** b)) < 1e-6
        assert 0.0 < row.p_at_5 <= 1.0
        assert row.p_at_5 <= row.p_at_7 <= row.p_at_9
        assert row.n_buckets >= 1


def test_weighted_quantiles_match_pandas(spark):
    rows = _rows(spark, "lineitem_weighted_quantiles")
    assert [r.decile for r in rows] == list(range(1, 10))
    prices = [r.unit_price for r in rows]
    assert prices == sorted(prices)
    li = pd.read_parquet(f"{SF_ORACLE}/lineitem.parquet")[
        ["l_extendedprice", "l_quantity"]
    ]
    cents = (li["l_extendedprice"] / li["l_quantity"] * 100 + 0.5).apply(
        math.floor
    )
    w = li["l_quantity"].astype(int)
    df = (
        pd.DataFrame({"cents": cents, "w": w})
        .groupby("cents")["w"]
        .sum()
        .sort_index()
    )
    cw = df.cumsum()
    tw = int(df.sum())
    for r in rows:
        k = (r.decile * tw + 9) // 10
        expect = cw[cw >= k].index[0]
        assert abs(r.unit_price - expect / 100.0) < 1e-9, (r.decile,)
        assert r.total_weight == tw


def test_hurst_identity_and_range(spark):
    rows = _rows(spark, "orders_hurst_rs")
    assert [r.window_days for r in rows] == [8, 16, 32]
    for r in rows:
        assert r.n_blocks >= 1
        assert r.mean_rs > 0.0
        assert r.hurst_exponent == rows[0].hurst_exponent
    # the slope column is exactly the stated two-point closed form
    h_re = (math.log(rows[2].mean_rs) - math.log(rows[0].mean_rs)) / (
        2 * math.log(2)
    )
    assert abs(rows[0].hurst_exponent - h_re) < 1e-4
    # R/S grows with window size; H in a sane band for a count series
    assert rows[0].mean_rs < rows[1].mean_rs < rows[2].mean_rs
    assert 0.0 < rows[0].hurst_exponent < 1.0
