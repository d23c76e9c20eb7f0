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
