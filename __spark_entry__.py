"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``hadoop_cs4225_spark/operators/*`` and register
themselves in ``hadoop_cs4225_spark.registry``; this module is a thin
adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hadoop_cs4225_spark import registry
from hadoop_cs4225_spark.session import apply_runtime_confs

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    topk_common_words_max is the minimum end-to-end slice (SURVEY.md §7):
    scan → tokenize → broadcast anti-join → two-source tag → partial+final
    agg → intersection → max → total-order top-k.
    """
    apply_runtime_confs(spark)
    qs = registry.get_queries()
    return qs["topk_common_words_max"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.get_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted ⇒ rows-only check)."""
    return registry.get_oracles()
