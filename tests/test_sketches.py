"""HLL sketch estimates: no DuckDB oracle (engine-specific sketch
internals), so pin them against exact distinct counts within the
lgK=12 error bound, and assert the union equals the total."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_cs4225_spark import registry
from hadoop_cs4225_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE

registry.load_all()


def test_sketch_estimates_within_bounds(spark):
    got = {
        r.event_type: r.approx_users
        for r in registry.QUERIES["sketch_distinct_users_by_type"](
            spark, SF_SMOKE
        ).collect()
    }
    ev = load_table(spark, SF_SMOKE, "events")
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact["ALL"] = ev.select("user_id").distinct().count()
    assert set(got) == set(exact)
    for k, est in got.items():
        # lgK=12 relative standard error ~1.6%; allow 5% (3 sigma).
        assert abs(est - exact[k]) <= max(1, 0.05 * exact[k]), (k, est, exact[k])


def test_approx_topk_counts_are_exact_below_tracking_bound(spark):
    rows = registry.QUERIES["topk_users_approx"](spark, SF_SMOKE).collect()
    ev = load_table(spark, SF_SMOKE, "events")
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for et, items in by_type.items():
        exact = {
            (x.user_id): x.n
            for x in ev.where(F.col("event_type") == et)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        kth = sorted(exact.values(), reverse=True)[len(items) - 1]
        # ranks are 1..k and rows arrive rank-sorted with (n desc,
        # user_id asc) determinism inside the reported set
        assert [r.rank for r in items] == list(range(1, len(items) + 1))
        assert items == sorted(items, key=lambda r: (-r.n, r.user_id))
        for item in items:
            # every reported count is the true count, and every reported
            # item is a legitimate top-k member (>= the kth true count)
            assert exact[item.user_id] == item.n
            assert item.n >= kth


def test_count_min_sketch_deterministic_and_bounded(spark):
    df1 = registry.QUERIES["event_freq_cms"](spark, SF_SMOKE)
    # determinism across partitioning layouts (commutative adds)
    ev = load_table(spark, SF_SMOKE, "events").repartition(13)
    df2 = (
        ev.groupBy("event_type")
        .agg(
            F.expr("hex(count_min_sketch(user_id, 0.01d, 0.95d, 42))").alias(
                "cms_hex"
            ),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )
    assert [r.cms_hex for r in df1.collect()] == [r.cms_hex for r in df2.collect()]


def test_cms_audit_never_undercounts_and_matches_reference(spark):
    """The explicit CMS must (a) never undercount any user — the CMS
    one-sided-error invariant — and (b) match a pure-Python sketch
    built with the same hash family."""
    import hashlib
    from collections import Counter

    import pandas as pd

    from hadoop_cs4225_spark.operators.sketches import _CMS_D, _CMS_W
    from hadoop_cs4225_spark.registry import get_queries

    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    cms = Counter()
    for u in ev["user_id"]:
        for d in range(1, _CMS_D + 1):
            cms[(d, h60(f"{d}:{u}") % _CMS_W)] += 1
    exact = Counter(ev["user_id"])
    over = []
    for u, xc in exact.items():
        est = min(
            cms[(d, h60(f"{d}:{u}") % _CMS_W)] for d in range(1, _CMS_D + 1)
        )
        assert est >= xc, (u, est, xc)  # CMS never undercounts
        over.append(est - xc)
    got = get_queries()["user_freq_cms_audit"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert got["n_users"] == len(exact)
    assert got["n_exact"] == sum(1 for o in over if o == 0)
    assert got["max_overestimate"] == max(over)
    assert got["max_overestimate"] >= 0
    assert abs(got["avg_overestimate"] - sum(over) / len(over)) < 1e-6


def test_hll_audit_matches_python_reference(spark):
    """The explicit HLL must match a pure-Python implementation with
    the same hash family, and land within the theoretical error band
    (~1.04/sqrt(m) std; assert 5 sigma)."""
    import hashlib
    import math

    import pandas as pd

    from hadoop_cs4225_spark.operators.sketches import (
        _HLL_ALPHA,
        _HLL_M,
        _HLL_SUFFIX_BITS,
    )
    from hadoop_cs4225_spark.registry import get_queries

    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    regs = {}
    for u in ev["user_id"]:
        h = h60(str(u))
        b = h >> _HLL_SUFFIX_BITS
        suf = h & ((1 << _HLL_SUFFIX_BITS) - 1)
        r = (
            _HLL_SUFFIX_BITS + 1
            if suf == 0
            else _HLL_SUFFIX_BITS + 1 - suf.bit_length()
        )
        regs[b] = max(regs.get(b, 0), r)
    denom = sum(2.0**-m for m in regs.values()) + (_HLL_M - len(regs))
    raw = _HLL_ALPHA * _HLL_M * _HLL_M / denom
    zeros = _HLL_M - len(regs)
    if raw <= 2.5 * _HLL_M and zeros > 0:
        raw = _HLL_M * math.log(_HLL_M / zeros)
    exact = ev["user_id"].nunique()
    got = get_queries()["user_distinct_hll_audit"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert got["n_exact"] == exact
    assert got["n_buckets_used"] == len(regs)
    assert abs(got["hll_estimate"] - raw) < 0.01
    assert abs(got["rel_err"] - (raw - exact) / exact) < 1e-3
    # theoretical HLL relative error ~ 1.04/sqrt(m); allow 5 sigma
    assert abs(got["rel_err"]) < 5 * 1.04 / math.sqrt(_HLL_M)
