"""Central query registry backing ``__spark_entry__.py``.

Every operator module registers its public queries here with an optional
DuckDB oracle SQL string. The driver contract (``__spark_entry__.py``):

- ``queries()[name](spark, sf_dir) -> DataFrame``
- ``oracle_sql()[name]`` -> ANSI SQL DuckDB runs on the same parquet
  (views: region nation customer supplier part orders lineitem events
  documents embeddings), compared by row-count + schema +
  order-insensitive value-hash.

Rules enforced by convention here (SURVEY.md §5/§7):
- every computed column is aliased identically in Spark and SQL;
- every top-k/limit query defines a total order (deterministic ties);
- floating aggregates are rounded on both sides (ulp-reassociation
  differences between engines would break exact value-hashing).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

#: Modules whose import populates the registry.
_OPERATOR_MODULES = (
    "hadoop_cs4225_spark.operators.wordcount",
    "hadoop_cs4225_spark.operators.relational",
    "hadoop_cs4225_spark.operators.windows",
    "hadoop_cs4225_spark.operators.funcs",
    "hadoop_cs4225_spark.operators.text_analysis",
    "hadoop_cs4225_spark.operators.dedup",
    "hadoop_cs4225_spark.operators.similarity",
    "hadoop_cs4225_spark.operators.events_windows",
    "hadoop_cs4225_spark.operators.multimodal_ops",
    "hadoop_cs4225_spark.operators.joins_advanced",
    "hadoop_cs4225_spark.operators.sql_frontend",
    "hadoop_cs4225_spark.operators.tpch_more",
)

_loaded = False


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add ``fn`` to the registry under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every operator module (idempotent)."""
    global _loaded
    if _loaded:
        return
    for mod in _OPERATOR_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            # Modules land milestone by milestone; only swallow the
            # "module itself not written yet" case.
            if mod.split(".")[-1] not in str(e):
                raise
    _loaded = True


def get_queries() -> dict[str, QueryFn]:
    load_all()
    return dict(QUERIES)


def get_oracles() -> dict[str, str]:
    load_all()
    return dict(ORACLES)
