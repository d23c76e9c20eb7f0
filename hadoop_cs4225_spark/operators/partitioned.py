"""Partitioned-layout demo: the 100 TB `events` story, substantiated.

At scale, `events` lives date-partitioned (`.../event_date=YYYY-MM-DD/`)
so every time-ranged scan prunes to the queried days at the *directory*
level — the scan never opens files outside the range. This module
derives that layout once per scale factor (under ``.derived/``, relative
to the repo root) and registers a query whose physical plan must show
``PartitionFilters`` doing the pruning (asserted in tests/test_plans.py).

The oracle reads the *raw* events table — proving the partitioned
layout is a pure re-organization, not a semantic change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_cs4225_spark.registry import register
from hadoop_cs4225_spark.sources.sinks import derived_is_fresh, write_partitioned
from hadoop_cs4225_spark.sources.tables import load_events

#: Repo-local root for derived layouts (gitignored; rebuilt on demand).
_DERIVED_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".derived")


def events_by_day_path(sf_dir: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(_DERIVED_ROOT, tag, "events_by_day")


def ensure_events_by_day(spark: SparkSession, sf_dir: str) -> str:
    """Write the date-partitioned copy of ``events`` if absent.

    Idempotent: a FRESH ``_SUCCESS`` marker (newer than the source
    parquet) means the layout is complete
    (Spark writes it last); a partial dir from an interrupted run is
    overwritten.
    """
    path = events_by_day_path(sf_dir)
    if not derived_is_fresh(
        os.path.join(path, "_SUCCESS"), os.path.join(sf_dir, "events.parquet")
    ):
        ev = load_events(spark, sf_dir).withColumn("event_date", F.to_date("ts"))
        write_partitioned(ev, path, ("event_date",), mode="overwrite")
    return path


@register(
    "events_partition_pruned_day",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS total_value
FROM events
WHERE CAST(ts AS DATE) = DATE '2024-01-15'
GROUP BY event_type
ORDER BY event_type
""",
)
def events_partition_pruned_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-day aggregate over the date-partitioned layout.

    The filter is on the PARTITION column, so the scan's
    ``PartitionFilters`` prunes to a single ``event_date=`` directory —
    at 100 TB that is the difference between reading ~1/30th of a month
    and a full-table scan. The oracle computes the same answer from the
    unpartitioned table (layout is transparent to semantics).
    """
    path = ensure_events_by_day(spark, sf_dir)
    ev = spark.read.parquet(path)
    return (
        ev.where(F.col("event_date") == F.lit("2024-01-15").cast("date"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("event_type")
    )


def events_nested_path(sf_dir: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(_DERIVED_ROOT, tag, "events_nested")


def ensure_events_nested(spark: SparkSession, sf_dir: str) -> str:
    """Write a nested-struct copy of ``events``: everything except the
    key folded into ``meta struct<etype,k,value,day>`` — the shape
    event logs arrive in when ingested from JSON at scale."""
    path = events_nested_path(sf_dir)
    if not derived_is_fresh(
        os.path.join(path, "_SUCCESS"), os.path.join(sf_dir, "events.parquet")
    ):
        ev = load_events(spark, sf_dir)
        nested = ev.select(
            "event_id",
            F.struct(
                F.col("event_type").alias("etype"),
                F.get_json_object("props", "$.k").cast("int").alias("k"),
                F.col("value").alias("value"),
                F.to_date("ts").alias("day"),
            ).alias("meta"),
        )
        nested.write.mode("overwrite").parquet(path)
    return path


@register(
    "nested_struct_pruned_rollup",
    oracle="""
SELECT event_type AS etype,
       COUNT(*) AS n_events
FROM events
GROUP BY event_type
ORDER BY etype
""",
)
def nested_struct_pruned_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup touching ONE subfield of a nested struct column.

    Catalyst's nested-schema pruning must narrow the parquet ReadSchema
    to ``meta.etype`` alone (asserted in tests/test_plans.py) — at
    100 TB with wide event envelopes, reading one subfield instead of
    the whole struct is a column-store win identical to top-level
    column pruning. The oracle reads the flat table: layout-transparent
    semantics, like the date-partitioned twin above.
    """
    path = ensure_events_nested(spark, sf_dir)
    ev = spark.read.parquet(path)
    return (
        ev.groupBy(F.col("meta.etype").alias("etype"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("etype")
    )


def events_by_user_path(sf_dir: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(_DERIVED_ROOT, tag, "events_by_user")


def ensure_events_by_user(spark: SparkSession, sf_dir: str) -> str:
    """Write a user-CLUSTERED copy of ``events``: range-partitioned and
    sorted by ``user_id``, so every parquet row group covers a narrow
    user range and its min/max footer statistics become effective."""
    path = events_by_user_path(sf_dir)
    if not derived_is_fresh(
        os.path.join(path, "_SUCCESS"), os.path.join(sf_dir, "events.parquet")
    ):
        ev = load_events(spark, sf_dir)
        (
            ev.repartitionByRange(8, "user_id")
            .sortWithinPartitions("user_id", "ts")
            .write.mode("overwrite")
            .parquet(path)
        )
    return path


@register(
    "events_clustered_user_scan",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       ROUND(SUM(value), 2) AS total_value
FROM events
WHERE user_id BETWEEN 100 AND 120
GROUP BY event_type
ORDER BY event_type
""",
)
def events_clustered_user_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Narrow user-range aggregate over the user-clustered layout —
    the row-group data-SKIPPING story (complement of the directory-level
    pruning in ``events_partition_pruned_day``).

    The range predicate reaches the scan as ``PushedFilters``
    (plan-asserted); because the layout is sorted by ``user_id``, the
    parquet reader's row-group min/max statistics eliminate every group
    outside [100, 120] without decoding it. At 100 TB, clustering on
    the dominant filter key is the difference between touching a few
    row groups and decompressing the whole table — the same reason
    warehouses Z-order/cluster their fact tables. The oracle reads the
    unclustered original: layout is transparent to semantics.
    """
    path = ensure_events_by_user(spark, sf_dir)
    ev = spark.read.parquet(path)
    return (
        ev.where(F.col("user_id").between(100, 120))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("event_type")
    )
