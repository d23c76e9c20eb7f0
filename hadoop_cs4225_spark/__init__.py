"""spark-graft: a PySpark-native analytics engine.

Re-implements the capability surface of the reference project
``don-tay/hadoop-cs4225`` (a Hadoop MapReduce course suite: word count +
top-k common words; see SURVEY.md) as idiomatic Spark DataFrame queries,
and extends it with the LLM-data-pipeline operators (dedup, similarity
search, multimodal columns, text analysis) plus streaming over the
``events`` table.

Design rules (SURVEY.md §4):
- DataFrame API only; no RDDs, no custom Catalyst rules.
- All hot-path expressions are JVM-side built-ins (whole-stage codegen).
- Every query is deterministic (total ordering on ties, fixed hash seeds)
  so it can be validated against a DuckDB SQL oracle.
- Designed for 100 TB: broadcast small dims, partial aggregation,
  AQE skew handling, filter/column pushdown to Parquet.
"""

__version__ = "0.1.0"
