"""Round-9 batch-6/7/8 operator invariants (economic, distributional,
EVT, reconciliation, calendar)."""

from __future__ import annotations

import math

import pandas as pd

from hadoop_cs4225_spark import registry
from tests.conftest import SF_ORACLE

registry.load_all()


def _rows(spark, name, sf=SF_ORACLE):
    return registry.QUERIES[name](spark, sf).collect()


def test_elasticity_matches_pandas(spark):
    import numpy as np

    [r] = _rows(spark, "lineitem_discount_elasticity")
    li = pd.read_parquet(f"{SF_ORACLE}/lineitem.parquet")
    li["disc_pct"] = (li.l_discount * 100 + 0.5).apply(math.floor)
    cells = (
        li[li.disc_pct > 0]
        .groupby("disc_pct")
        .agg(n=("l_quantity", "size"), sq=("l_quantity", "sum"))
        .reset_index()
    )
    x = np.log(1 - cells.disc_pct / 100.0)
    y = np.log(cells.sq / cells.n)
    slope = np.polyfit(x, y, 1)[0]
    assert r.n_levels == len(cells)
    assert abs(r.elasticity - slope) < 1e-4 * max(1.0, abs(slope))


def test_hhi_bounds(spark):
    rows = _rows(spark, "supplier_nation_herfindahl")
    assert rows
    for r in rows:
        assert 1.0 / r.n_suppliers - 1e-6 <= r.hhi <= 1.0 + 1e-6
        assert r.top_share <= 1.0 + 1e-9
        # HHI is at least the largest squared share
        assert r.hhi >= r.top_share**2 - 1e-4
        assert 1.0 <= r.effective_suppliers <= r.n_suppliers + 1e-4
        assert abs(r.effective_suppliers - 1.0 / r.hhi) < 1e-2


def test_js_divergence_bounds_and_symmetric_coverage(spark):
    rows = _rows(spark, "source_js_divergence_matrix")
    sources = set()
    for r in rows:
        assert r.source_a < r.source_b  # upper triangle only
        sources.update((r.source_a, r.source_b))
        assert -1e-9 <= r.js_divergence <= math.log(2) + 1e-6
    k = len(sources)
    assert len(rows) == k * (k - 1) // 2


def test_user_entropy_bounds(spark):
    rows = _rows(spark, "events_user_entropy_topk")
    # sf0.001 has only 15 distinct users — fewer than the top-k cap
    assert 1 <= len(rows) <= 20
    ent = [r.entropy for r in rows]
    assert ent == sorted(ent, reverse=True)
    for r in rows:
        assert 0.0 <= r.entropy <= math.log(r.n_types) + 1e-6
        assert r.n_types >= 2  # top entropies need >= 2 types


def test_simpson_slopes_shape(spark):
    rows = _rows(spark, "lineitem_simpson_slopes")
    scopes = sorted(r.scope for r in rows)
    assert scopes == ["A", "ALL", "N", "R"]
    flags = {r.sign_flip for r in rows}
    assert len(flags) == 1  # global constant
    total = next(r.n for r in rows if r.scope == "ALL")
    assert total == sum(r.n for r in rows if r.scope != "ALL")


def test_two_way_interaction_identity(spark):
    rows = _rows(spark, "lineitem_two_way_interaction")
    assert len(rows) == 6  # 3 flags x 2 statuses
    for r in rows:
        assert abs(r.interaction - (r.cell_mean - r.additive_pred)) < 1e-5
    # interactions weighted by cell n sum to ~0 within each row margin
    by_flag = {}
    for r in rows:
        by_flag.setdefault(r.flag, []).append(r)


def test_ltv_curve_monotone(spark):
    rows = _rows(spark, "customer_cohort_ltv_curve")
    assert rows
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r.cohort, []).append(r)
    for cohort, rs in by_cohort.items():
        ages = [r.age for r in rs]
        assert ages == sorted(ages)
        ltv = [r.ltv_per_customer for r in rs]
        assert all(b >= a - 1e-9 for a, b in zip(ltv, ltv[1:]))  # cumulative
        assert all(0 <= a < 12 for a in ages)
        sizes = {r.cohort_size for r in rs}
        assert len(sizes) == 1


def test_reconciliation_honest_on_synthetic(spark):
    [r] = _rows(spark, "orders_totalprice_reconciliation")
    assert r.n_orders > 0
    # the synthetic generator does NOT maintain the TPC-H invariant —
    # the audit must SAY so, not paper over it
    assert r.n_no_lines > 0
    assert r.n_within_1c < r.n_orders
    assert r.n_within_1c <= r.n_within_100c <= r.n_within_10000c
    assert r.avg_gap_dollars > 0.0


def test_malformed_jsonl_counts(spark):
    [r] = _rows(spark, "orders_jsonl_malformed_audit")
    assert r.n_corrupt > 0
    assert r.n_permissive_rows == r.n_dropmalformed_rows + r.n_corrupt
    assert 0.0 < r.corrupt_rate < 0.1


def test_hapax_profile_bounds(spark):
    rows = _rows(spark, "doc_hapax_by_source")
    for r in rows:
        assert 0 <= r.hapax <= r.vocab
        assert r.hapax + r.dis <= r.vocab
        assert 0.0 <= r.hapax_token_share <= r.hapax_vocab_share + 1e-9


def test_gumbel_identities(spark):
    [r] = _rows(spark, "orders_monthly_gumbel")
    assert r.n_months >= 12
    assert r.sd_daily_max > 0
    assert abs(r.gumbel_beta - r.sd_daily_max * 0.7796968012) < 1e-2
    # the 100-month return level must exceed the mean block max
    assert r.ret_level_100mo > r.mean_daily_max


def test_ma_crossover_alternates(spark):
    rows = _rows(spark, "orders_daily_ma_crossover")
    assert rows, "a multi-year daily series must cross at least once"
    kinds = [r.crossover for r in rows]
    assert set(kinds) <= {"golden", "death"}
    # crossings alternate by construction of the flip differencing
    for a, b in zip(kinds, kinds[1:]):
        assert a != b, kinds


def test_hourly_profile_shape(spark):
    rows = _rows(spark, "events_hourly_profile_by_type")
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    assert len(by_type) == 5
    for t, rs in by_type.items():
        assert abs(sum(r.share for r in rs) - 1.0) < 1e-3
        peak = {r.peak_hour for r in rs}
        assert len(peak) == 1
        mx = max(r.n for r in rs)
        assert next(r.n for r in rs if r.hour == rs[0].peak_hour) == mx


def test_date_dim_calendar_facts(spark):
    rows = _rows(spark, "date_dim_generate")
    assert len(rows) == 366  # 2024 is a leap year
    assert rows[0].day == "2024-01-01" and rows[0].dow_iso == 1  # a Monday
    assert rows[-1].day == "2024-12-31"
    month_ends = [r for r in rows if r.is_month_end]
    assert len(month_ends) == 12
    assert any(r.day == "2024-02-29" and r.is_month_end for r in rows)
    qs = {r.month: r.quarter for r in rows}
    assert qs[3] == 1 and qs[4] == 2 and qs[12] == 4


def test_eb_shrinkage_pulls_to_global(spark):
    rows = _rows(spark, "lineitem_return_rate_eb_topk")
    assert len(rows) == 10
    shrunk = [r.shrunk_rate for r in rows]
    assert shrunk == sorted(shrunk, reverse=True)
    for r in rows:
        lo, hi = sorted((r.raw_rate, r.global_rate))
        assert lo - 1e-9 <= r.shrunk_rate <= hi + 1e-9  # convex pull
        # more data -> less shrinkage
        w = r.n_lines / (r.n_lines + 200)
        expect = w * r.raw_rate + (1 - w) * r.global_rate
        assert abs(r.shrunk_rate - expect) < 1e-6
