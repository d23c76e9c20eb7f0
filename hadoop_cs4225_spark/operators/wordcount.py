"""The reference's two jobs, rebuilt Spark-first (SURVEY.md §2 O1-O13).

Reference parity (citations into /root/reference):
- ``WordCount.java:21-63`` — tokenize lines, sum per word, emit sorted
  by word (shuffle sort contract, O11).
- ``TopkCommonWords.java:29-154`` — tokenize two corpora, drop stopwords
  (DistributedCache set, O4), per-corpus counts, keep words present in
  BOTH corpora (O9), score = max of the two counts (``:112``; the min
  variant reproduces input/answer1.txt — gotcha G3), top 20 by
  (count desc, word desc) (``:123-153``, gotchas G4/G6).

Semantics preserved (gotchas G1-G6, verified byte-exact against
``input/answer{1,2}.txt``):
- whitespace-run tokenization, no empty tokens, case/punctuation kept;
- stopword match is exact + case-sensitive;
- tie order within equal counts is lexicographically DESCENDING;
- k parameterized, default 20.

Spark-first physical story: the reference's in-mapper combining and
combiner are Spark's automatic partial aggregation; the DistributedCache
stopword set is a broadcast anti-join; the rekey-to-one-reducer global
gather (``TopkCommonWords.java:91-92``) is replaced by distributed
``orderBy().limit(k)`` (physical ``TakeOrderedAndProject``: per-partition
top-k then a k-row merge on the driver — no single-node bottleneck at
100 TB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_cs4225_spark.registry import register
from hadoop_cs4225_spark.sources.tables import load_table

#: Stopword list for the documents-table variants (the golden replay uses
#: the reference's 671-word file instead). Exact, case-sensitive match,
#: mirroring input/stopwords.txt semantics (gotcha G5).
DEFAULT_STOPWORDS: tuple[str, ...] = ("a", "the", "and", "of", "to", "in", "is", "it")

#: Languages that play the role of the two corpora on ``documents``.
CORPUS_LANGS: tuple[str, str] = ("en", "fr")

#: StringTokenizer's EXACT default delimiter set as a regex class.
#: Not ``\s+``: Java's ``\s`` includes vertical tab (\x0b), which
#: StringTokenizer does NOT treat as a delimiter — and RE2 (DuckDB)
#: disagrees with Java about ``\s`` membership. The explicit class is
#: identical in both engines (found by tests/test_tokenizer_property.py).
TOKEN_DELIM_RE = r"[ \t\n\r\f]+"


def tokenize(df: DataFrame, text_col: str = "text", word_col: str = "word",
             keep: tuple[str, ...] = ()) -> DataFrame:
    """Whitespace tokenization with StringTokenizer semantics (G1).

    ``split`` emits an empty leading token for lines starting with
    whitespace; filter them like StringTokenizer never emitting
    empties. Stays in whole-stage codegen (explode of a split — no UDF).
    """
    cols = [F.col(c) for c in keep]
    cols.append(F.explode(F.split(F.col(text_col), TOKEN_DELIM_RE)).alias(word_col))
    return df.select(*cols).where(F.col(word_col) != "")


def _score(mode: str, col: str) -> Column:
    if mode == "max":
        return F.max(col)
    if mode == "min":
        return F.min(col)
    raise ValueError(f"mode must be 'max' or 'min', got {mode!r}")


def literal_words_df(spark: SparkSession, words: tuple[str, ...]) -> DataFrame:
    """Tiny in-plan word list: ``explode(array(...))`` instead of
    ``createDataFrame`` — avoids the Python-RDD scan (an extra Python
    job + UnknownPartitioning node) that showed up in the plan audit."""
    return spark.range(1).select(
        F.explode(F.array(*[F.lit(w) for w in words])).alias("word")
    )


def topk_common_words_tagged(
    tagged: DataFrame,
    stopwords: DataFrame,
    mode: str = "max",
    k: int = 20,
) -> DataFrame:
    """Core tail over a ``(src int, text string)`` tagged corpus.

    Columns out: ``word string, score long`` ordered (score desc, word
    desc) — the verified golden tie order (G4). ``word`` is unique after
    the groupBy, so the ordering is total ⇒ deterministic ``limit``.
    """
    tokens = tokenize(tagged, keep=("src",))
    # DistributedCache stopword set -> broadcast anti-join (O4). The
    # stopword side is tiny; broadcast keeps the token stream shuffle-free
    # until the aggregation.
    filtered = tokens.join(F.broadcast(stopwords), "word", "left_anti")
    per_corpus = filtered.groupBy("src", "word").agg(F.count("*").alias("c"))
    merged = per_corpus.groupBy("word").agg(
        F.countDistinct("src").alias("nsrc"),
        _score(mode, "c").alias("score"),
    )
    return (
        merged.where(F.col("nsrc") == 2)
        .select("word", "score")
        .orderBy(F.desc("score"), F.desc("word"))
        .limit(k)
    )


def topk_common_words_frame(
    corpus1: DataFrame,
    corpus2: DataFrame,
    stopwords: DataFrame,
    mode: str = "max",
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Two-corpus form (golden replay path: two separate text files)."""
    tagged = corpus1.select(F.lit(1).alias("src"), F.col(text_col).alias("text")) \
        .unionByName(corpus2.select(F.lit(2).alias("src"), F.col(text_col).alias("text")))
    return topk_common_words_tagged(tagged, stopwords, mode=mode, k=k)


# ---------------------------------------------------------------------------
# Golden-replay variants (text files from /root/reference/input)
# ---------------------------------------------------------------------------

def word_count_text(spark: SparkSession, paths: list[str]) -> DataFrame:
    """WordCount.java on raw text files: ``word, cnt`` ordered by word."""
    lines = spark.read.text(paths).withColumnRenamed("value", "text")
    return (
        tokenize(lines)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("word")
    )


def topk_common_words_text(
    spark: SparkSession,
    path1: str,
    path2: str,
    stopwords_path: str,
    mode: str = "max",
    k: int = 20,
) -> DataFrame:
    """TopkCommonWords.java on raw text files (golden replay)."""
    c1 = spark.read.text(path1).withColumnRenamed("value", "text")
    c2 = spark.read.text(path2).withColumnRenamed("value", "text")
    sw = spark.read.text(stopwords_path).withColumnRenamed("value", "word")
    return topk_common_words_frame(c1, c2, sw, mode=mode, k=k)


# ---------------------------------------------------------------------------
# Oracle-checked variants over the `documents` table
# ---------------------------------------------------------------------------

_TOK_SQL = (
    "SELECT {extra} unnest(string_split_regex(text, '[ \\t\\n\\r\\f]+')) AS word "
    "FROM documents{where}"
)


def _sw_list() -> str:
    return ", ".join(f"'{w}'" for w in DEFAULT_STOPWORDS)


@register(
    "word_count",
    oracle=(
        "SELECT word, COUNT(*) AS cnt FROM ("
        + _TOK_SQL.format(extra="", where="")
        + ") t WHERE word <> '' GROUP BY word ORDER BY word"
    ),
)
def word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1-O2-O6-O11: tokenize documents.text, count per word, sort by word."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        tokenize(docs.select("text"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("word")
    )


def _topk_docs(spark: SparkSession, sf_dir: str, mode: str, k: int = 20) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    l1, l2 = CORPUS_LANGS
    sw = literal_words_df(spark, DEFAULT_STOPWORDS)
    # Single scan with an in-row source tag (the two-corpus union form
    # would scan documents.parquet twice).
    tagged = docs.where(F.col("lang").isin(l1, l2)).select(
        F.when(F.col("lang") == l1, 1).otherwise(2).alias("src"), "text"
    )
    return topk_common_words_tagged(tagged, sw, mode=mode, k=k)


def _topk_oracle(agg: str) -> str:
    l1, l2 = CORPUS_LANGS
    return f"""
WITH tok AS (
  SELECT CASE WHEN lang = '{l1}' THEN 1 ELSE 2 END AS src,
         unnest(string_split_regex(text, '[ \\t\\n\\r\\f]+')) AS word
  FROM documents WHERE lang IN ('{l1}', '{l2}')
), filtered AS (
  SELECT * FROM tok WHERE word <> '' AND word NOT IN ({_sw_list()})
), per_corpus AS (
  SELECT src, word, COUNT(*) AS c FROM filtered GROUP BY src, word
), merged AS (
  SELECT word, COUNT(DISTINCT src) AS nsrc, {agg}(c) AS score
  FROM per_corpus GROUP BY word
)
SELECT word, score FROM merged WHERE nsrc = 2
ORDER BY score DESC, word DESC LIMIT 20
"""


@register("topk_common_words_max", oracle=_topk_oracle("MAX"))
def topk_common_words_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-faithful variant (TopkCommonWords.java:112 uses Math.max)."""
    return _topk_docs(spark, sf_dir, "max")


@register("topk_common_words_min", oracle=_topk_oracle("MIN"))
def topk_common_words_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """answer1.txt-faithful variant (original CS4225 spec used min — G3)."""
    return _topk_docs(spark, sf_dir, "min")


@register(
    "topk_words_per_lang",
    oracle=f"""
WITH tok AS (
  SELECT lang, unnest(string_split_regex(text, '[ \\t\\n\\r\\f]+')) AS word FROM documents
), counts AS (
  SELECT lang, word, COUNT(*) AS cnt
  FROM tok WHERE word <> '' AND word NOT IN ({{sw}})
  GROUP BY lang, word
)
SELECT lang, word, cnt, rn FROM (
  SELECT lang, word, cnt,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY cnt DESC, word DESC) AS rn
  FROM counts
) t
WHERE rn <= 5
ORDER BY lang, rn
""".format(sw=", ".join(f"'{w}'" for w in DEFAULT_STOPWORDS)),
)
def topk_words_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k: the reference's global top-k (O10) generalized to
    per-language via a ranking window — the distributed replacement for
    its rekey-to-one-reducer gather, one shuffle on (lang, word) + one
    on lang."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    tokens = tokenize(docs.select("lang", "text"), keep=("lang",))
    sw = literal_words_df(spark, DEFAULT_STOPWORDS)
    counts = (
        tokens.join(F.broadcast(sw), "word", "left_anti")
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("cnt"), F.desc("word"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("lang", "word", "cnt", "rn")
        .orderBy("lang", "rn")
    )


def format_tsv(df: DataFrame, cols: tuple[str, str]) -> str:
    """Render rows as Hadoop TextOutputFormat would: ``key TAB value``.

    TopkCommonWords emits ``count TAB word`` (key=count — Java ``:149``);
    WordCount emits ``word TAB count``. Used for byte-exact golden tests.
    """
    rows = df.select(*cols).collect()
    return "\n".join(f"{r[0]}\t{r[1]}" for r in rows)
