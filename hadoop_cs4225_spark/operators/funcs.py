"""Scalar function coverage: string / date-time / math / JSON
(SURVEY.md §2.2 M3).

The reference's only scalar work is tokenization and string re-parsing of
its stringly-typed IR (``TopkCommonWords.java:91,108-110``); a complete
engine needs the standard scalar library. Everything here is a built-in
``pyspark.sql.functions`` call — JVM-side, codegen'd, no UDFs — with a
DuckDB-equivalent oracle expression.

Cross-engine notes baked into the queries:
- day-of-week numbering differs (Spark dayofweek: Sun=1; DuckDB: Sun=0);
  use Spark ``weekday`` (Mon=0) == DuckDB ``isodow - 1``.
- ``date_trunc`` returns timestamp in Spark, date in DuckDB → format to
  string on both sides.
- transcendentals (ln) are not IEEE-correctly-rounded; round outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_cs4225_spark.functions.numeric import quant, quant_sql
from hadoop_cs4225_spark.registry import register
from hadoop_cs4225_spark.sources.tables import load_table


@register(
    "part_string_features",
    oracle="""
SELECT p_partkey,
       upper(p_name)                                   AS name_upper,
       length(p_name)                                  AS name_len,
       substr(p_name, 1, 8)                            AS name_prefix,
       CAST(regexp_extract(p_brand, '#(\\d+)', 1) AS INT) AS brand_num,
       string_split(p_type, ' ')[1]                    AS type_head,
       concat(p_brand, '/', p_type)                    AS brand_type,
       replace(p_name, ' ', '_')                       AS name_snake,
       CASE WHEN p_type LIKE 'PROMO%' THEN 1 ELSE 0 END AS is_promo
FROM part
ORDER BY p_partkey
""",
)
def part_string_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/length/substring/regexp_extract/split/concat/replace/like."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.select(
            "p_partkey",
            F.upper("p_name").alias("name_upper"),
            F.length("p_name").alias("name_len"),
            F.substring("p_name", 1, 8).alias("name_prefix"),
            F.regexp_extract("p_brand", r"#(\d+)", 1).cast("int").alias("brand_num"),
            F.split("p_type", " ").getItem(0).alias("type_head"),
            F.concat(F.col("p_brand"), F.lit("/"), F.col("p_type")).alias("brand_type"),
            F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
            F.when(F.col("p_type").like("PROMO%"), 1).otherwise(0).alias("is_promo"),
        )
        .orderBy("p_partkey")
    )


@register(
    "order_date_features",
    oracle="""
SELECT o_orderkey,
       year(o_orderdate)                                    AS od_year,
       month(o_orderdate)                                   AS od_month,
       day(o_orderdate)                                     AS od_day,
       isodow(o_orderdate) - 1                              AS od_weekday,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_95,
       strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d')  AS due_date,
       CAST(epoch(o_orderdate) AS BIGINT)                   AS epoch_s
FROM orders
WHERE o_orderkey <= 1000
ORDER BY o_orderkey
""",
)
def order_date_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/day/weekday/date_trunc/datediff/date_add/unix_timestamp."""
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 1000)
    return (
        orders.select(
            "o_orderkey",
            F.year("o_orderdate").alias("od_year"),
            F.month("o_orderdate").alias("od_month"),
            F.dayofmonth("o_orderdate").alias("od_day"),
            F.weekday("o_orderdate").alias("od_weekday"),
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
                "month_start"
            ),
            F.datediff(
                F.col("o_orderdate"),
                F.lit("1995-01-01 00:00:00").cast("timestamp_ntz"),
            ).alias("days_since_95"),
            F.date_format(F.date_add("o_orderdate", 30), "yyyy-MM-dd").alias(
                "due_date"
            ),
            # o_orderdate is TIMESTAMP_NTZ; interpret in UTC (session tz)
            # to match DuckDB's epoch() on naive timestamps.
            F.unix_timestamp(
                F.col("o_orderdate").cast("timestamp")
            ).alias("epoch_s"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "lineitem_math_features",
    oracle=f"""
SELECT l_orderkey, l_linenumber,
       abs(l_discount - 0.05)                    AS disc_dev,
       {quant_sql("l_extendedprice / l_quantity", 2)} AS unit_price,
       CAST(floor(l_quantity / 10) AS BIGINT)    AS qty_decile,
       CAST(ceil(l_extendedprice / 10000) AS BIGINT) AS price_bucket,
       {quant_sql("sqrt(l_extendedprice)", 6)}   AS price_sqrt,
       {quant_sql("ln(l_extendedprice + 1)", 6)} AS price_ln,
       pow(l_quantity, 2)                        AS qty_sq,
       CAST(sign(l_discount - 0.05) AS INT)      AS disc_sign,
       l_quantity % 7                            AS qty_mod7,
       greatest(l_discount, l_tax)               AS max_rate,
       least(l_discount, l_tax)                  AS min_rate
FROM lineitem
WHERE l_orderkey <= 500
ORDER BY l_orderkey, l_linenumber
""",
)
def lineitem_math_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """abs/round/floor/ceil/sqrt/ln/pow/sign/mod/greatest/least.

    Division, abs, pow-of-2, mod on identical stored doubles are
    bit-deterministic; sqrt is IEEE-correctly-rounded; only ln needs
    rounding (libm variance).
    """
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 500)
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
            quant(F.col("l_extendedprice") / F.col("l_quantity"), 2).alias(
                "unit_price"
            ),
            F.floor(F.col("l_quantity") / 10).alias("qty_decile"),
            F.ceil(F.col("l_extendedprice") / 10000).alias("price_bucket"),
            quant(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
            quant(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
            F.pow("l_quantity", 2).alias("qty_sq"),
            F.signum(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
            (F.col("l_quantity") % 7).alias("qty_mod7"),
            F.greatest("l_discount", "l_tax").alias("max_rate"),
            F.least("l_discount", "l_tax").alias("min_rate"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "event_props_extract",
    oracle=f"""
SELECT event_id, event_type,
       CAST(json_extract_string(props, 'k') AS INT) AS prop_k,
       {quant_sql("value", 4)} AS val
FROM events
WHERE event_id <= 2000
ORDER BY event_id
""",
)
def event_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the ``events.props`` string column.

    ``from_json`` with an explicit schema (typed struct access) — the
    scale-safe path: one parse, columnar output, no per-row Python.
    """
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") <= 2000)
    parsed = ev.withColumn("_p", F.from_json("props", "k INT"))
    return (
        parsed.select(
            "event_id",
            "event_type",
            F.col("_p.k").alias("prop_k"),
            quant("value", 4).alias("val"),
        )
        .orderBy("event_id")
    )


@register(
    "event_type_prop_stats",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       ROUND(SUM(value), 2) AS total_value,
       MIN(CAST(json_extract_string(props, 'k') AS INT)) AS min_k,
       MAX(CAST(json_extract_string(props, 'k') AS INT)) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def event_type_prop_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over JSON-extracted values (get_json_object path)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy("event_type")
    )


@register(
    "string_edit_distance",
    oracle="""
SELECT n_name,
       levenshtein(n_name, 'GERMANY')            AS dist_germany,
       lcase(n_name)                             AS name_lower,
       lpad(n_name, 15, '.')                     AS name_padded,
       trim(concat('  ', n_name, '  '))          AS name_trimmed,
       reverse(n_name)                           AS name_rev,
       left(n_name, 3)                           AS name_left3,
       contains(n_name, 'AN')                    AS has_an,
       starts_with(n_name, 'A')                  AS starts_a,
       ends_with(n_name, 'A')                    AS ends_a
FROM nation
ORDER BY n_name
""",
)
def string_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """levenshtein + pad/trim/reverse/left/contains/startswith/endswith."""
    nation = load_table(spark, sf_dir, "nation")
    return (
        nation.select(
            "n_name",
            F.levenshtein("n_name", F.lit("GERMANY")).alias("dist_germany"),
            F.lower("n_name").alias("name_lower"),
            F.lpad("n_name", 15, ".").alias("name_padded"),
            F.trim(F.concat(F.lit("  "), F.col("n_name"), F.lit("  "))).alias(
                "name_trimmed"
            ),
            F.reverse("n_name").alias("name_rev"),
            F.substring("n_name", 1, 3).alias("name_left3"),
            F.contains("n_name", F.lit("AN")).alias("has_an"),
            F.startswith("n_name", F.lit("A")).alias("starts_a"),
            F.endswith("n_name", F.lit("A")).alias("ends_a"),
        )
        .orderBy("n_name")
    )


@register(
    "conditional_expr_coverage",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice >= 300000 THEN 'high'
            WHEN o_totalprice >= 100000 THEN 'mid'
            ELSE 'low' END                          AS price_band,
       COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_display,
       CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS is_final,
       IFNULL(NULL, o_orderpriority)                AS priority,
       regexp_matches(o_orderpriority, '^[12]-')    AS is_urgent_re,
       (o_orderstatus IS NOT DISTINCT FROM 'F')     AS null_safe_f
FROM orders
WHERE o_orderkey <= 1000
ORDER BY o_orderkey
""",
)
def conditional_expr_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/WHEN, NULLIF, COALESCE, IFNULL — null-handling surface."""
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 1000)
    return (
        orders.select(
            "o_orderkey",
            F.when(F.col("o_totalprice") >= 300000, "high")
            .when(F.col("o_totalprice") >= 100000, "mid")
            .otherwise("low")
            .alias("price_band"),
            F.coalesce(
                F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")
            ).alias("status_display"),
            F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("is_final"),
            F.ifnull(F.lit(None).cast("string"), F.col("o_orderpriority")).alias(
                "priority"
            ),
            F.col("o_orderpriority").rlike(r"^[12]-").alias("is_urgent_re"),
            F.col("o_orderstatus").eqNullSafe(F.lit("F")).alias("null_safe_f"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "event_props_variant",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, 'k') AS BIGINT)) AS BIGINT)
         AS sum_k,
       COUNT(DISTINCT CAST(json_extract_string(props, 'k') AS BIGINT) % 10)
         AS k_mod_card
FROM events
WHERE CAST(json_extract_string(props, 'k') AS BIGINT) IS NOT NULL
GROUP BY event_type
ORDER BY event_type
""",
)
def event_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured analytics through the VARIANT type (Spark 4):
    ``parse_json`` once into an open-schema value, typed
    ``variant_get`` paths downstream.

    VARIANT is the 100 TB answer when props schemas DRIFT: unlike
    ``from_json`` (fixed struct, silent nulls on drift), the variant
    keeps every field; unlike raw JSON strings, it is a binary encoding
    with per-path typed access (no re-parse per expression). The oracle
    reads the same paths with DuckDB's JSON functions.
    """
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.parse_json("props").alias("v")
    ).select(
        "event_type",
        F.expr("variant_get(v, '$.k', 'bigint')").alias("k"),
    )
    return (
        v.where(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.countDistinct(F.col("k") % 10).alias("k_mod_card"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Round-9: generated calendar dimension
# ---------------------------------------------------------------------------

#: Generated calendar year (a leap year, so the edge cases exist) and
#: the Monday anchoring the engine-neutral ISO-weekday arithmetic.
_DIM_START = "2024-01-01"
_DIM_END = "2024-12-31"


@register(
    "date_dim_generate",
    oracle=f"""
SELECT strftime(d, '%Y-%m-%d') AS day,
       CAST((datediff('day', DATE '{_DIM_START}', d) % 7) + 1 AS BIGINT)
         AS dow_iso,
       CAST(datediff('day', DATE '{_DIM_START}', d) // 7 + 1 AS BIGINT)
         AS week_no,
       CAST(EXTRACT(month FROM d) AS BIGINT) AS month,
       CAST((EXTRACT(month FROM d) + 2) // 3 AS BIGINT) AS quarter,
       (d = last_day(d)) AS is_month_end
FROM (SELECT CAST(unnest(range(DATE '{_DIM_START}',
                               DATE '{_DIM_END}' + INTERVAL 1 DAY,
                               INTERVAL 1 DAY)) AS DATE) AS d) g
ORDER BY day
""",
)
def date_dim_generate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generated calendar-dimension table for 2024 (a leap year):
    day, ISO-style weekday, week number, month, quarter, month-end
    flag. The classic warehouse date dimension, produced by the
    SEQUENCE-generator source pattern (no input table at all) that
    backfills, gap-fills (``events_gapfill_daily``) and as-of layouts
    join against. Weekday and week arithmetic are day-index modular
    math from the Monday anchor rather than engine dayofweek()
    functions, whose week-start conventions differ between engines —
    the date-function parity trap this operator exists to document.

    Determinism: everything is integer date arithmetic on a generated
    range; no floats anywhere.

    Scale: generators parallelize by slicing the range — the 100 TB
    relevance is as the broadcastable dimension side of calendar
    joins.

    No reference analogue; extends the SURVEY §2 sources family.
    """
    days = spark.sql(
        f"""
        SELECT explode(sequence(DATE '{_DIM_START}', DATE '{_DIM_END}',
                                INTERVAL 1 DAY)) AS d
        """
    )
    idx = F.datediff(F.col("d"), F.lit(_DIM_START).cast("date"))
    return days.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        ((idx % 7) + 1).cast("long").alias("dow_iso"),
        F.expr(
            f"CAST(datediff(d, DATE '{_DIM_START}') DIV 7 + 1 AS BIGINT)"
        ).alias("week_no"),
        F.month("d").cast("long").alias("month"),
        F.expr("CAST((month(d) + 2) DIV 3 AS BIGINT)").alias("quarter"),
        (F.col("d") == F.last_day("d")).alias("is_month_end"),
    ).orderBy("day")
