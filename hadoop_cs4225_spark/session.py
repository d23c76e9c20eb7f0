"""SparkSession factory with the engine's scale-oriented defaults.

The reference (don-tay/hadoop-cs4225) hand-codes its physical tricks
(in-mapper combining, DistributedCache broadcast, single-reducer gather —
see SURVEY.md §4). Here the equivalent knobs are session configuration:
AQE (runtime re-planning + skew-join splitting), partial aggregation and
broadcast joins are automatic, and shuffle parallelism is sized from the
available cores.

On a real cluster the same settings apply; only ``master`` and memory
sizing change. Tests and the driver run ``local[$SPARK_GRAFT_CPUS]``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Configs that are safe (and required) to set on an existing session.
#: The correctness driver may hand us a session it built itself, so every
#: loader/query defensively applies these at runtime too.
RUNTIME_CONFS: dict[str, str] = {
    # events.parquet stores TIMESTAMP(NANOS) which Spark's parquet reader
    # rejects by default; read as long and convert (sources/tables.py).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Deterministic timestamp arithmetic/formatting, matching DuckDB's
    # naive-timestamp semantics in the oracle.
    "spark.sql.session.timeZone": "UTC",
    # Runtime re-optimization: partition coalescing + skew-join splitting.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to a session we did not build."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Some confs may be static on exotic builds; queries that
            # depend on them fail loudly later, which is the right signal.
            pass
    return spark


def get_spark(
    app_name: str = "spark-graft",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default 32, per the
    driver environment). Shuffle partitions default to the core count —
    right-sized for local mode; a 1000-executor cluster would raise this
    to ~2-3x total cores (AQE coalescing trims the excess either way).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    nshuffle = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(cpus))
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(nshuffle))
        # 64 MB broadcast ceiling: all dims (region/nation/customer/
        # supplier/part at any tested SF, stopword lists, query vectors)
        # broadcast instead of shuffling the fact table.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.maxResultSize", "2g")
        # local mode: driver == executors. The JVM default (1g) is
        # marginal for a full pytest session's accumulated broadcasts +
        # localCheckpointed memo frames — the sf0.1 scale pins then OOM
        # nondeterministically near the end of the suite. Builder-time
        # only (ignored by getOrCreate on an existing JVM, harmless).
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # getOrCreate may have returned a pre-existing session whose builder
    # confs were ignored; re-apply the runtime-settable ones.
    return apply_runtime_confs(spark)
