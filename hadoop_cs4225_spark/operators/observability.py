"""Pipeline observability via ``Dataset.observe`` / ``Observation``.

At 100 TB the cardinal sin of pipeline QC is paying a SECOND full scan
to compute row counts and control totals the main job already touched.
``df.observe(...)`` attaches named aggregate expressions to a plan node;
Spark accumulates them ON THE SAME PASS as the real action and hands
them to the driver when the action completes — metrics for free, the
Spark-native replacement for Hadoop's job counters (the reference reads
its counters from the MapReduce JobClient after each of its two jobs;
``/root/reference/src/main/java`` TopkCommonWords.java drives jobs via
``job.waitForCompletion`` which prints those counters).

The registered query runs a real pipeline action (a ``noop``-sink write
— the scan + metrics cost with no output bytes), then returns the
observed metrics as a 1-row DataFrame. The float discipline is the
cogroup module's: money is observed as integer CENTS so the
accumulated sum is order-independent and hash-matches the oracle
exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_cs4225_spark.registry import register
from hadoop_cs4225_spark.sources.tables import load_table

_METRIC_SCHEMA = (
    "n_orders long, n_open long, total_cents long, min_key long, max_key long"
)


@register(
    "orders_scan_observed",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_open,
       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS total_cents,
       CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
       CAST(MAX(o_orderkey) AS BIGINT) AS max_key
FROM orders
""",
)
def orders_scan_observed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Control totals for the orders scan, collected as ``observe``
    metrics during a no-output pipeline action — the QC pattern a real
    ingest job uses: row count, open-order count, money control total
    (integer cents), and key range, all accumulated on the one pass the
    job was already paying for.

    Plan: ONE scan; the observe node adds accumulator traffic only (a
    few longs per task). The ``noop`` sink measures exactly that scan —
    no shuffle, no output. The returned 1-row frame is driver-built
    from the observation payload, which is the point: the metrics
    never touch a second job. (`Observation` objects are single-use;
    one is created per call.)
    """
    from pyspark.sql import Observation

    obs = Observation("orders_qc")
    orders = load_table(spark, sf_dir, "orders")
    observed = orders.observe(
        obs,
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0))
        .cast("long")
        .alias("n_open"),
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"))
        .cast("long")
        .alias("total_cents"),
        F.min("o_orderkey").cast("long").alias("min_key"),
        F.max("o_orderkey").cast("long").alias("max_key"),
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    row = tuple(
        m[k] for k in ("n_orders", "n_open", "total_cents", "min_key", "max_key")
    )
    return spark.createDataFrame([row], schema=_METRIC_SCHEMA)
