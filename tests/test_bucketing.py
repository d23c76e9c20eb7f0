"""Bucketed-table co-located join: the 100 TB fact⋈fact layout.

``bucketBy(k, key)`` + ``sortBy(key)`` on both sides of a repeated join
key removes the shuffle (and sort) from every subsequent join — on a
cluster this is the difference between reshuffling 100 TB per query and
reading pre-partitioned buckets. The test asserts the physical plan has
NO Exchange on either join side.
"""

from __future__ import annotations

import pytest

from hadoop_cs4225_spark.plans.explain import plan_string
from hadoop_cs4225_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("warehouse")
    orders = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem")
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(base / "orders_b"))
        .mode("overwrite")
        .saveAsTable("orders_b")
    )
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(base / "lineitem_b"))
        .mode("overwrite")
        .saveAsTable("lineitem_b")
    )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    ot, lt = bucketed_tables
    # Force the sort-merge path: at test scale Catalyst would broadcast
    # (where bucketing is moot); at fact⋈fact scale broadcast is off the
    # table and bucketing is what removes the shuffle.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(ot).join(
            spark.table(lt),
            spark.table(ot).o_orderkey == spark.table(lt).l_orderkey,
        )
        plan = plan_string(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Exchange" not in plan, f"bucketed join should not shuffle:\n{plan[:1500]}"
    assert "SortMergeJoin" in plan
    # And the result is still correct vs the plain-parquet join.
    n_bucketed = joined.count()
    orders = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem")
    n_plain = orders.join(li, orders.o_orderkey == li.l_orderkey).count()
    assert n_bucketed == n_plain


def test_analyze_table_stats_feed_join_planning(spark, bucketed_tables):
    """Catalog statistics are the CBO's food: after ANALYZE TABLE the
    optimized plan must carry the measured rowCount, and size-based
    join planning must see the real byte size instead of defaults.
    At 100 TB this is the difference between a correct broadcast
    decision and an OOM — stats collection is part of the layout
    discipline, not an afterthought."""
    name, _ = bucketed_tables
    spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS")
    n = spark.table(name).count()
    # Catalog-level: the stats row must record the measured count.
    desc = spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()
    stat_line = next(r.data_type for r in desc if r.col_name == "Statistics")
    assert f"{n} rows" in stat_line, stat_line
    # Planner-level: with CBO on, the optimized plan carries rowCount.
    base = spark.conf.get("spark.sql.cbo.enabled", "false")
    try:
        spark.conf.set("spark.sql.cbo.enabled", "true")
        stats = spark.table(name)._jdf.queryExecution().optimizedPlan().stats()
        assert not stats.rowCount().isEmpty(), "CBO plan lost the rowCount"
        assert int(str(stats.rowCount().get())) == n
        assert int(str(stats.sizeInBytes())) > 0
    finally:
        spark.conf.set("spark.sql.cbo.enabled", base)
