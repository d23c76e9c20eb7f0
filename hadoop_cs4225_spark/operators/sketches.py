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


@register("topk_users_approx")  # no oracle: tie order inside the sketch merge
def topk_users_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters per event type via ``approx_top_k``.

    The streaming-friendly top-k: each partition tracks a bounded
    item->count map (maxItemsTracked=10000), maps merge associatively
    — one partial-agg shuffle, constant memory, no global sort. Below
    the tracking bound the counts are exact; only the tie order at the
    k-boundary is engine-specific (hence rows-only; exactness vs a full
    groupBy is pinned in tests/test_sketches.py).

    Output is FLAT — one row per (event_type, rank, user_id, n) via
    posexplode with a deterministic re-sort inside each type's top-k
    set ((n desc, user_id) total order). The earlier array<struct>
    shape broke the driver canonicalizer (pandas can't factorize list
    cells); flat scalar columns are the registry-wide contract,
    enforced by tests/test_output_shapes.py.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.expr("approx_top_k(user_id, 3, 10000)").alias("top"))
        .select(
            "event_type",
            F.posexplode(
                F.expr(
                    "array_sort(top, (a, b) -> CASE WHEN a.count > b.count THEN -1 "
                    "WHEN a.count < b.count THEN 1 "
                    "WHEN a.item < b.item THEN -1 "
                    "WHEN a.item > b.item THEN 1 ELSE 0 END)"
                )
            ).alias("pos", "x"),
        )
        .select(
            "event_type",
            (F.col("pos") + 1).alias("rank"),
            F.col("x.item").alias("user_id"),
            F.col("x.count").alias("n"),
        )
        .orderBy("event_type", "rank")
    )


@register("event_freq_cms")  # no oracle: sketch bytes are engine-specific
def event_freq_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min frequency sketch per event type (eps=1%, conf=95%).

    The CMS answers "how often does key X occur" with bounded memory
    and +eps*N one-sided error; adds are commutative sums so the
    merged sketch bytes are deterministic for a fixed seed regardless
    of partitioning. Store the blob per day/type, merge for any range
    — same mergeability story as the HLL rollup. Point estimates are
    asserted against exact counts in tests/test_sketches.py.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.expr("hex(count_min_sketch(user_id, 0.01d, 0.95d, 42))").alias(
                "cms_hex"
            ),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )
