"""Parquet loaders for the testdata star schema + extension tables.

Replaces the reference's only source — line-oriented text via Hadoop
``TextInputFormat`` (``WordCount.java:60``, ``TopkCommonWords.java:172-173``)
— with schema-carrying Parquet scans. Text sources for the golden replay
live in ``operators/wordcount.py`` (``spark.read.text``).

Scale notes: Parquet scans get column pruning + predicate pushdown from
Catalyst for free; at 100 TB the same loaders apply to a partitioned
table layout (e.g. ``events`` partitioned by date) where partition
pruning kicks in on ``ts`` filters.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_cs4225_spark.session import apply_runtime_confs

#: All driver-generated tables (TESTDATA.md).
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


#: Memoized logical plans: (applicationId, sf_dir, table) -> DataFrame.
#: A DataFrame is an immutable plan, so reuse is always semantically
#: safe; it skips the repeated file-listing + footer-schema job that
#: otherwise costs ~0.1-0.2 s per spark.read.parquet call (half the
#: fixed per-query overhead in the bench suite). Keyed by applicationId
#: so a new SparkSession never sees another session's plans. The
#: testdata is immutable; call ``clear_table_cache`` if a path's
#: contents are ever rewritten mid-session.
_DF_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def clear_table_cache() -> None:
    _DF_CACHE.clear()


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``events`` with ``ts`` as a proper timestamp.

    The file stores ``ts`` as parquet TIMESTAMP(NANOS,false), which
    Spark's reader rejects ([PARQUET_TYPE_ILLEGAL]). With
    ``spark.sql.legacy.parquet.nanosAsLong`` the column arrives as
    nanos-since-epoch (long); convert to microsecond timestamps —
    the same truncation DuckDB applies, so oracle comparisons agree.
    """
    key = (spark.sparkContext.applicationId, os.path.normpath(sf_dir), "events")
    cached = _DF_CACHE.get(key)
    if cached is not None:
        return cached
    apply_runtime_confs(spark)
    df = spark.read.parquet(_path(sf_dir, "events"))
    if dict(df.dtypes).get("ts") == "bigint":
        # Integer division, NOT `/1000` + cast: the double round-trip has
        # ulp 256ns above 2^53, which lands ~1.5% of rows 1µs low.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    _DF_CACHE[key] = df
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    key = (spark.sparkContext.applicationId, os.path.normpath(sf_dir), name)
    cached = _DF_CACHE.get(key)
    if cached is not None:
        return cached
    apply_runtime_confs(spark)
    df = spark.read.parquet(_path(sf_dir, name))
    _DF_CACHE[key] = df
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}
