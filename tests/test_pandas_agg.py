"""JVM-equivalence pins for the grouped-agg / scalar-iterator pandas
UDF queries (operators/pandas_agg.py).

The oracle replica proves cross-engine value parity; these pin the
twin discipline's other leg — the pandas results must equal the
built-in JVM formulation the docstrings point hot paths at.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_cs4225_spark.operators.pandas_agg import (
    PIECE_LEN,
    _WORD_RE,
    doc_subword_stats_iterpandas,
    source_trimmed_stats_pandas,
)
from tests.conftest import SF_SMOKE


def test_grouped_agg_median_matches_jvm_percentile(spark):
    got = {
        r["source"]: (r["n_docs"], r["median_chars"])
        for r in source_trimmed_stats_pandas(spark, SF_SMOKE).collect()
    }
    want = {
        r["source"]: (r["n_docs"], r["median_chars"])
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.expr("percentile(n_chars, 0.5)").alias("median_chars"),
        )
        .collect()
    }
    assert got == want


def test_iter_pandas_matches_jvm_fold(spark):
    """The iterator UDF's word/piece counts must equal the pure-JVM
    regexp + aggregate fold the docstring names as the hot path."""
    got = {
        r["source"]: (r["total_words"], r["total_pieces"], r["max_doc_pieces"])
        for r in doc_subword_stats_iterpandas(spark, SF_SMOKE).collect()
    }
    per_doc = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select(
            "source",
            F.expr(f"regexp_extract_all(lower(text), '{_WORD_RE}', 0)").alias(
                "ws"
            ),
        )
        .select(
            "source",
            F.size("ws").cast("long").alias("n_words"),
            F.expr(
                f"aggregate(ws, 0L, (acc, w) -> "
                f"acc + (length(w) + {PIECE_LEN} - 1) div {PIECE_LEN})"
            ).alias("n_pieces"),
        )
    )
    want = {
        r["source"]: (r["total_words"], r["total_pieces"], r["max_doc_pieces"])
        for r in per_doc.groupBy("source")
        .agg(
            F.sum("n_words").cast("long").alias("total_words"),
            F.sum("n_pieces").cast("long").alias("total_pieces"),
            F.max("n_pieces").cast("long").alias("max_doc_pieces"),
        )
        .collect()
    }
    assert got == want
