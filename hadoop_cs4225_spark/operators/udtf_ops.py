"""Python UDTF surface (Spark 4 table functions).

A UDTF turns one input row into N output rows with its own schema — the
lateral-join generalization of a UDF. The built-in-function rule still
applies (JVM expressions beat Python on the hot path; the equivalent
pure-expression pipeline is ``doc_token_stats``), so like the Pandas-UDF
surface this exists to prove the API end-to-end: class-based UDTF,
``eval`` yielding rows, lateral join from SQL, deterministic output.

Sentence splitting is defined exactly as: split on ``.``, trim
``[ \\t\\n\\r\\f]`` edges, drop empties — reproduced in the DuckDB
oracle, so this UDTF query IS oracle-checked (value-hash equality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_cs4225_spark.registry import register
from hadoop_cs4225_spark.sources.tables import load_table

#: Exact trim class shared with the oracle (see wordcount.TOKEN_DELIM_RE
#: — Java \\s would also strip vertical tab, which RE2/DuckDB's would
#: not; the explicit class sidesteps the mismatch).
_TRIM = " \t\n\r\f"


class SplitSentences:
    """UDTF: (doc_id, text) -> one row per non-empty sentence."""

    def eval(self, doc_id: int, text: str):  # noqa: A002 - UDTF contract
        if text is None:
            return
        n = 0
        for raw in text.split("."):
            s = raw.strip(_TRIM)
            if s:
                n += 1
                yield doc_id, n, s, len(s)


@register(
    "doc_sentences_udtf",
    oracle="""
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY part_no) AS INT)
         AS sentence_no,
       sentence,
       CAST(length(sentence) AS INT) AS n_chars
FROM (
  SELECT doc_id, g.part_no,
         trim(g.part, ' ' || chr(9) || chr(10) || chr(13) || chr(12)) AS sentence
  FROM (SELECT doc_id, text FROM documents WHERE doc_id <= 100) d,
       LATERAL (
         SELECT unnest(string_split(text, '.')) AS part,
                generate_subscripts(string_split(text, '.'), 1) AS part_no
       ) g
) t
WHERE sentence <> ''
ORDER BY doc_id, sentence_no
""",
)
def doc_sentences_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence rows via a lateral-joined Python UDTF (bounded slice —
    Python row generation is the documented slow path; the 100 TB
    equivalent uses explode(split(...)), shown in the oracle)."""
    from pyspark.sql.functions import udtf

    split_sentences = udtf(
        SplitSentences,
        returnType="doc_id bigint, sentence_no int, sentence string, n_chars int",
    )
    spark.udtf.register("split_sentences", split_sentences)
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") <= 100)
    docs.createOrReplaceTempView("udtf_docs_slice")
    return spark.sql(
        """
        SELECT s.doc_id, s.sentence_no, s.sentence, s.n_chars
        FROM udtf_docs_slice d,
             LATERAL split_sentences(d.doc_id, d.text) s
        ORDER BY s.doc_id, s.sentence_no
        """
    )
