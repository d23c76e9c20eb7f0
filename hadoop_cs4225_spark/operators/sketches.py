"""Mergeable sketches — the 100 TB distinct-counting path.

``approx_count_distinct`` (relational.py) answers one query; Datasketches
HLL sketches go further: the SKETCH itself is a column you can store,
re-aggregate and union across partitions/days without touching raw data
— the idiom for incremental rollups (sketch per day-partition, union for
any date range in milliseconds).

No DuckDB oracle: estimates depend on each engine's sketch internals by
design (registered rows-only; the driver records a row-count/schema
check). The estimates ARE deterministic for a fixed input and asserted
against exact counts within HLL error bounds in tests/test_sketches.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_cs4225_spark.registry import register
from hadoop_cs4225_spark.sources.tables import load_table


@register("sketch_distinct_users_by_type")  # no oracle: engine-specific sketch
def sketch_distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct users via Datasketches HLL, plus the
    union-of-sketches total — demonstrating MERGEABILITY, which plain
    approx_count_distinct lacks.

    Plan shape: one partial-aggregated shuffle builds per-type sketches;
    the union re-aggregates those few sketch BLOBs (bytes, not rows).
    At 100 TB the per-type (or per-day) sketches are persisted and any
    rollup is sketch-union only.
    """
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", 12).alias("sketch")
    )
    typed = per_type.select(
        "event_type",
        F.hll_sketch_estimate("sketch").alias("approx_users"),
    )
    total = per_type.agg(F.hll_union_agg("sketch").alias("u")).select(
        F.lit("ALL").alias("event_type"),
        F.hll_sketch_estimate("u").alias("approx_users"),
    )
    return typed.unionByName(total).orderBy("event_type")
