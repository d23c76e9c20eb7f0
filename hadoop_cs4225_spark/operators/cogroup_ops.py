"""Cogrouped-map pandas UDFs — ``groupBy().cogroup().applyInPandas``.

The one Arrow-batched UDF entry point the rest of the UDF surface
(`udtf_ops.py`, `multimodal_ops.py`, `similarity.py` twins) doesn't
exercise: two DataFrames cogrouped on a key, each group pair handed to
pandas TOGETHER. The genuine use case is per-key logic that needs both
sides at once and isn't a join (custom reconciliation, per-key model
fits, asof-with-business-rules). Reference parity: the closest
MapReduce analogue is a reduce-side join with a secondary sort
(TopkCommonWords.java:100-140 tags values by source file and walks
both lists in one reducer) — cogroup is Spark's typed version of that
reducer contract.

Cross-engine float discipline: per-item amounts are quantized to
integer CENTS on the JVM side before the UDF (``floor(x*100+0.5)`` —
the `quant` grid), so the pandas sums are integer and
order-insensitive; the DuckDB oracle states the same integer
arithmetic. No float ever crosses the Arrow boundary.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_cs4225_spark.functions.numeric import quant, quant_sql
from hadoop_cs4225_spark.registry import register
from hadoop_cs4225_spark.sources.tables import load_table

#: Output schema of the per-order reconciliation cogroup.
_GAP_SCHEMA = (
    "o_orderkey bigint, o_orderpriority string, gap_cents bigint, n_items int"
)


def _order_gap(orders: pd.DataFrame, items: pd.DataFrame) -> pd.DataFrame:
    """Per cogroup (one order key): header total minus item-sum, cents.

    Runs with BOTH sides of one key in hand — the header row and every
    line item — which is what makes this a cogroup, not a join: an
    order with zero line items still yields a row (its whole total is
    the gap), and the item-side sum happens inside the UDF.
    """
    if orders.empty:  # items for a key with no header row: contribute nothing
        return pd.DataFrame(
            {
                "o_orderkey": pd.Series([], dtype="int64"),
                "o_orderpriority": pd.Series([], dtype="object"),
                "gap_cents": pd.Series([], dtype="int64"),
                "n_items": pd.Series([], dtype="int32"),
            }
        )
    total_cents = int(orders["total_cents"].iloc[0])
    item_cents = int(items["item_cents"].sum()) if not items.empty else 0
    return pd.DataFrame(
        {
            "o_orderkey": [int(orders["o_orderkey"].iloc[0])],
            "o_orderpriority": [orders["o_orderpriority"].iloc[0]],
            "gap_cents": [total_cents - item_cents],
            "n_items": [0 if items.empty else int(len(items))],
        }
    )


@register(
    "order_fill_gap_cogroup",
    oracle=f"""
WITH item_sums AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                             * 100 + 0.5) AS BIGINT)) AS BIGINT) AS item_cents,
         COUNT(*) AS n_items
  FROM lineitem GROUP BY l_orderkey
), gaps AS (
  SELECT o.o_orderpriority,
         CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)
           - COALESCE(i.item_cents, 0) AS gap_cents
  FROM orders o LEFT JOIN item_sums i ON o.o_orderkey = i.l_orderkey
)
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       {quant_sql("CAST(SUM(gap_cents) AS DOUBLE) / COUNT(*) / 100.0", 4)}
         AS avg_gap,
       CAST(MAX(abs(gap_cents)) AS BIGINT) AS max_abs_gap_cents
FROM gaps
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def order_fill_gap_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-vs-detail reconciliation via a cogrouped-map pandas UDF:
    for every order, the gap between ``o_totalprice`` and the sum of
    its line items' net-of-discount-plus-tax amounts, rolled up per
    priority class — the data-contract audit that catches partial loads
    and currency drift between a fact header and its detail table.

    Plan: both sides are pre-projected and pre-quantized to integer
    cents JVM-side (3 columns each cross the Arrow boundary, no text,
    no floats), cogrouped on the order key — ONE co-partitioning
    shuffle of each input, the same cost as the equivalent join — and
    the per-key UDF emits one short row per order; a small JVM-side
    aggregate finishes. At 100 TB the Arrow batches stream group-by-
    group with nothing corpus-sized in any single task (the widest key
    is one order's ~7 items). The sum-per-key itself COULD be a plain
    join+groupBy (the oracle states exactly that); the cogroup form is
    the registered surface for the applyInPandas-cogroup API and for
    per-key logic that a join can't express (e.g. emitting headerless
    keys differently from itemless headers, as ``_order_gap`` does).
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100 + 0.5)
        .cast("bigint")
        .alias("total_cents"),
    )
    items = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.floor(
            F.col("l_extendedprice")
            * (1 - F.col("l_discount"))
            * (1 + F.col("l_tax"))
            * 100
            + 0.5
        )
        .cast("bigint")
        .alias("item_cents"),
    )
    gaps = (
        orders.groupBy("o_orderkey")
        .cogroup(items.groupBy("l_orderkey"))
        .applyInPandas(_order_gap, schema=_GAP_SCHEMA)
    )
    return (
        gaps.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            quant(
                F.sum("gap_cents").cast("double") / F.count(F.lit(1)) / 100.0,
                4,
            ).alias("avg_gap"),
            F.max(F.abs(F.col("gap_cents"))).cast("bigint").alias(
                "max_abs_gap_cents"
            ),
        )
        .orderBy("o_orderpriority")
    )
