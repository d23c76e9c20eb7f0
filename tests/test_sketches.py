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
