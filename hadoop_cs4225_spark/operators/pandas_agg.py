"""Grouped-agg and scalar-iterator pandas UDFs — the last two Arrow
entry points of the UDF matrix.

The rest of the surface covers scalar pandas UDFs (`similarity.py`
``cosine_topk_pandas``), grouped-map (`label_centroid_stats`),
cogrouped-map (`cogroup_ops.py`), mapInPandas / mapInArrow
(`multimodal_ops.py`), applyInArrow (`label_norm_stats_arrow`),
applyInPandasWithState (`streaming/streams.py`) and UDTFs
(`udtf_ops.py`). This module adds:

- ``pandas_udf`` **GROUPED_AGG** (series -> scalar, used inside
  ``groupBy().agg``): order statistics a built-in JVM aggregate cannot
  express in one pass without a sort — exact trimmed mean and exact
  interpolated median per group.
- ``pandas_udf`` **scalar ITERATOR** (``Iterator[pd.Series] ->
  Iterator[pd.DataFrame]`` with a struct return type): the form whose
  point is amortizing expensive per-task initialization (compile a
  tokenizer / load a model ONCE per batch iterator, stream Arrow
  batches through it) — the shape any real model-scoring UDF takes.

The built-in-function rule still applies (SURVEY.md §2.2: UDFs are the
slow path): the JVM equivalents are stated in each docstring and the
oracles prove value parity. Reference parity: the reference has no UDF
surface at all (254 LoC of fixed-function MapReduce,
TopkCommonWords.java) — this is driver-mandated extension surface.

Cross-engine float discipline: both queries aggregate INTEGER inputs
(`n_chars`, regex token counts); every float is produced by a single
final division of exact integers, so no reassociation can diverge.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_cs4225_spark.registry import register
from hadoop_cs4225_spark.sources.tables import load_table

#: Trim fraction denominator: drop ``n // TRIM_DENOM`` values from EACH
#: end before the mean (10% trim). Shared by the UDF and the oracle.
TRIM_DENOM = 10

#: Fake-subword piece length: each regex word token contributes
#: ``ceil(len(word) / PIECE_LEN)`` pieces — a deterministic stand-in
#: for a BPE merge table with a max-piece length, exactly restatable in
#: SQL (the real tokenizer would load its merges file in the iterator
#: init, which is precisely what this form exists to amortize).
PIECE_LEN = 4

#: Word-token pattern. Python ``re`` and DuckDB's RE2 agree on this
#: class + quantifier subset (leftmost non-overlapping matches).
_WORD_RE = "[a-z0-9]+"


@register(
    "source_trimmed_stats_pandas",
    oracle=f"""
WITH r AS (
  SELECT source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars) AS rn,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM documents
)
SELECT source,
       CAST(MAX(n) AS BIGINT) AS n_docs,
       (MAX(CASE WHEN rn = (n + 1) // 2 THEN n_chars END)
        + MAX(CASE WHEN rn = n // 2 + 1 THEN n_chars END)) / 2.0
         AS median_chars,
       CAST(SUM(CASE WHEN rn > n // {TRIM_DENOM}
                      AND rn <= n - n // {TRIM_DENOM}
                     THEN n_chars END) AS DOUBLE)
         / SUM(CASE WHEN rn > n // {TRIM_DENOM}
                     AND rn <= n - n // {TRIM_DENOM}
                    THEN 1 ELSE 0 END)
         AS trimmed_mean_chars
FROM r GROUP BY source ORDER BY source
""",
)
def source_trimmed_stats_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact median and 10%-trimmed mean of document length
    via GROUPED_AGG pandas UDFs — robust location statistics that need
    the group's order statistics, which built-in JVM aggregates only
    reach through ``percentile`` (median) and not at all for the
    trimmed mean without a window + filter + re-aggregate round trip.

    Plan: one shuffle on ``source`` (the same shuffle the JVM agg would
    pay), then each group crosses the Arrow boundary ONCE as an int64
    column and three tiny scalars come back. All arithmetic is integer
    until one final division, so the values hash-match the oracle's
    window-rank formulation exactly.

    Scale posture: a GROUPED_AGG pandas UDF materializes the WHOLE
    group per call — fine for bounded group counts (here: the source
    domain), wrong for unbounded hot keys. The registered scale path
    for medians over skewed keys is the histogram-median discipline
    (``doc_mad_outliers``: value-domain-bounded counts, no per-key
    buffering); this query is the API-coverage twin and says so.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def n_docs(s: pd.Series) -> int:
        return len(s)

    @pandas_udf("double")
    def median_chars(s: pd.Series) -> float:
        # pandas interpolated median == (lo + hi) / 2 of the two middle
        # order statistics — exact on integer inputs, matches the
        # oracle's rank formulation including the odd-n (lo == hi) case.
        return float(s.median())

    @pandas_udf("double")
    def trimmed_mean_chars(s: pd.Series) -> float:
        v = s.sort_values().reset_index(drop=True)
        k = len(v) // TRIM_DENOM
        w = v.iloc[k : len(v) - k]
        # integer sum is exact in float64 (< 2^53), single division
        return float(w.sum()) / len(w)

    docs = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    return (
        docs.groupBy("source")
        .agg(
            n_docs("n_chars").alias("n_docs"),
            median_chars("n_chars").alias("median_chars"),
            trimmed_mean_chars("n_chars").alias("trimmed_mean_chars"),
        )
        .orderBy("source")
    )


@register(
    "doc_subword_stats_iterpandas",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, source,
         regexp_extract_all(lower(text), '{_WORD_RE}') AS ws
  FROM documents
),
per_doc AS (
  SELECT doc_id, source,
         CAST(len(ws) AS BIGINT) AS n_words,
         CAST(COALESCE(list_sum(list_transform(
             ws, w -> (length(w) + {PIECE_LEN} - 1) // {PIECE_LEN}
         )), 0) AS BIGINT) AS n_pieces
  FROM toks
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_words) AS BIGINT) AS total_words,
       CAST(SUM(n_pieces) AS BIGINT) AS total_pieces,
       CAST(MAX(n_pieces) AS BIGINT) AS max_doc_pieces
FROM per_doc GROUP BY source ORDER BY source
""",
)
def doc_subword_stats_iterpandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source subword-token budget via a scalar ITERATOR pandas UDF:
    each document's regex word-token count and its fake-subword piece
    count (``ceil(len(word)/4)`` per token — a stand-in for a max-piece
    BPE), rolled up per source. The per-doc number a packing planner
    needs before it can size context windows.

    The iterator form is the one that matters operationally: the regex
    (in real life: the tokenizer's merges table or an ONNX session) is
    compiled ONCE per task's batch iterator, then every Arrow batch
    streams through it — versus once per batch for the plain scalar
    form. The UDF returns a STRUCT column (two counts per doc in one
    Arrow round trip), exercised end-to-end through the rollup.

    Scale posture: map-only over documents — the UDF sees one batch at
    a time regardless of corpus size, so memory is bounded by the Arrow
    batch size, not the data; the rollup is a plain partial-agg
    shuffle on ``source``. The JVM equivalent (``aggregate`` over
    ``split``) is what `text_analysis.py` uses on hot paths; the
    oracle states it in DuckDB list algebra.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<n_words: long, n_pieces: long>")
    def subword_stats(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        pat = re.compile(_WORD_RE)  # once per task, not per batch

        def pieces(ws: list[str]) -> int:
            return sum((len(w) + PIECE_LEN - 1) // PIECE_LEN for w in ws)

        for s in batches:
            toks = s.fillna("").str.lower().str.findall(pat)
            yield pd.DataFrame(
                {
                    "n_words": toks.map(len).astype("int64"),
                    "n_pieces": toks.map(pieces).astype("int64"),
                }
            )

    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    per_doc = docs.select(
        "source", subword_stats("text").alias("st")
    ).select("source", "st.n_words", "st.n_pieces")
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_words").cast("long").alias("total_words"),
            F.sum("n_pieces").cast("long").alias("total_pieces"),
            F.max("n_pieces").cast("long").alias("max_doc_pieces"),
        )
        .orderBy("source")
    )
