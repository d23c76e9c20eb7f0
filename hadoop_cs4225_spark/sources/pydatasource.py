"""Custom Python Data Source (the Spark 4 ``pyspark.sql.datasource``
extension point) — the API a user implements to expose a bespoke system
(feature store, internal service, proprietary format) as a first-class
``spark.read.format(...)`` source with partition-parallel reads.

The source here is a deterministic synthetic generator so the scan is
DuckDB-oracle-checkable end to end: row ``i`` carries
``value = hash60("v:" || i) % 10000`` (the same md5-derived hash the
operator suite uses, see ``functions/hashing.py``) and lands in
partition ``i % n_partitions``. Each partition materializes its rows as
ONE pyarrow RecordBatch — the Arrow fast path of the API (yielding
per-row tuples is the slow path) — so the read parallelizes across
partitions exactly like any file source and arrives zero-copy.

Scale posture: a Python data source runs in Python workers — it is the
INTEGRATION surface, not the bulk-scan path (parquet stays the bulk
path). What must scale is the partition planning: ``partitions()``
returns lightweight descriptors, rows are generated lazily inside each
task, and nothing is materialized on the driver.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from hadoop_cs4225_spark.functions.numeric import quant, quant_sql
from hadoop_cs4225_spark.registry import register

#: Defaults for the registered demo query (small on purpose — the rows
#: are generated in Python workers; the API surface is the point).
N_ROWS = 10_000
N_PARTS = 8
VALUE_MOD = 10_000

_SCHEMA = "row_id bigint, part int, value bigint"


def _hash60_py(s: str) -> int:
    """Pure-Python twin of ``functions.hashing.hash60`` (15 md5 hex
    digits = 60 bits; bit-identical to the Spark and DuckDB variants)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


class _RangePartition(InputPartition):
    def __init__(self, pid: int, n_rows: int, n_parts: int) -> None:
        self.pid = pid
        self.n_rows = n_rows
        self.n_parts = n_parts


class SyntheticScoresReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n_rows = int(options.get("rows", N_ROWS))
        self.n_parts = int(options.get("partitions", N_PARTS))
        self.part_eq: int | None = None

    def pushFilters(self, filters):
        """Source-side partition pruning (the custom-source analogue of
        parquet PushedFilters): an ``part = k`` equality is consumed
        here and shrinks ``partitions()`` to the one matching split;
        everything else is yielded back for Spark to re-apply. Pinned
        by tests/test_sinks.py (1 planned partition under the filter)."""
        from pyspark.sql.datasource import EqualTo

        for f in filters:
            if (
                isinstance(f, EqualTo)
                and tuple(f.attribute) == ("part",)
                and isinstance(f.value, int)
            ):
                self.part_eq = f.value
            else:
                yield f

    def partitions(self):  # lightweight descriptors only
        pids = (
            [self.part_eq]
            if self.part_eq is not None and 0 <= self.part_eq < self.n_parts
            else range(self.n_parts)
        )
        return [
            _RangePartition(p, self.n_rows, self.n_parts) for p in pids
        ]

    def read(self, partition: _RangePartition):
        import pyarrow as pa

        ids = list(range(partition.pid, partition.n_rows, partition.n_parts))
        batch = pa.record_batch(
            [
                pa.array(ids, type=pa.int64()),
                pa.array([partition.pid] * len(ids), type=pa.int32()),
                pa.array(
                    [_hash60_py(f"v:{i}") % VALUE_MOD for i in ids],
                    type=pa.int64(),
                ),
            ],
            names=["row_id", "part", "value"],
        )
        yield batch  # Arrow fast path: one batch per partition


class SyntheticScoresDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_scores"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return SyntheticScoresReader(self.options)

    def simpleStreamReader(self, schema) -> "SyntheticScoresStreamReader":
        return SyntheticScoresStreamReader(self.options)


def register_synthetic_source(spark: SparkSession) -> None:
    """Idempotent per-session registration of the custom format.

    Python-source filter pushdown ships behind a flag in Spark 4
    (``spark.sql.python.filterPushdown.enabled``, runtime-settable);
    without it a reader implementing ``pushFilters`` is rejected
    outright, so the flag is set wherever the source is registered."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticScoresDataSource)


@register(
    "pyds_scan_rollup",
    oracle=f"""
WITH src AS (
  SELECT i AS row_id,
         CAST(i % {N_PARTS} AS INT) AS part,
         (('0x' || substr(md5('v:' || CAST(i AS VARCHAR)), 1, 15))::BIGINT)
           % {VALUE_MOD} AS value
  FROM (SELECT unnest(range(0, {N_ROWS})) AS i)
)
SELECT part,
       COUNT(*) AS n_rows,
       CAST(SUM(value) AS BIGINT) AS sum_value,
       MIN(value) AS min_value,
       MAX(value) AS max_value,
       {quant_sql(f"CAST(SUM(value) AS DOUBLE) / COUNT(*) / {VALUE_MOD}", 6)}
         AS mean_frac
FROM src
GROUP BY part
ORDER BY part
""",
)
def pyds_scan_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan the custom Python data source and roll up per partition —
    proving the full extension-point contract: registration, options,
    partition planning, Arrow-batch reads, and a downstream JVM-side
    aggregation over the result (the scan's output is ordinary columnar
    data to Catalyst; predicates/aggregates behave like any source).

    The oracle regenerates the same rows in DuckDB from the shared
    md5-derived hash60 — the scan itself is value-checked, not just its
    shape. ``sf_dir`` is unused: the source generates its input.
    """
    register_synthetic_source(spark)
    df = (
        spark.read.format("synthetic_scores")
        .option("rows", N_ROWS)
        .option("partitions", N_PARTS)
        .load()
    )
    return (
        df.groupBy("part")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("value").cast("bigint").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            quant(
                F.sum("value").cast("double") / F.count(F.lit(1)) / VALUE_MOD, 6
            ).alias("mean_frac"),
        )
        .orderBy("part")
    )


class SyntheticScoresStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the custom source: offsets are ``{"row": i}``
    cursors over the same deterministic row space the batch reader
    scans, so stream and batch are replay-equivalent by construction
    (pytest-pinned). ``readBetweenOffsets`` re-derives a batch purely
    from its offset pair — exactly-once on failure recovery without
    buffering anything, because generation is deterministic.

    ``SimpleDataSourceStreamReader`` reads on the driver (no partition
    planning) — right for control-plane-sized feeds; a bulk stream
    implements ``DataSourceStreamReader`` with partitioned batches
    instead (same offset algebra).
    """

    def __init__(self, options: dict) -> None:
        self.n_rows = int(options.get("rows", N_ROWS))
        self.n_parts = int(options.get("partitions", N_PARTS))
        self.batch = int(options.get("batch", 1000))

    def initialOffset(self) -> dict:
        return {"row": 0}

    def _rows(self, lo: int, hi: int):
        # A LIST ITERATOR, not a generator: the wrapper's prefetch cache
        # calls next() on it, copy.copy()s it to replay, and pickles it
        # to ship the batch to workers — list iterators support all
        # three, generators none.
        return iter(
            [
                (i, i % self.n_parts, _hash60_py(f"v:{i}") % VALUE_MOD)
                for i in range(lo, hi)
            ]
        )

    def read(self, start: dict):
        lo = int(start["row"])
        hi = min(lo + self.batch, self.n_rows)
        return self._rows(lo, hi), {"row": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(int(start["row"]), int(end["row"]))
