"""As-of and range joins — operators Spark lacks as primitives (M7).

SURVEY.md §2.2 "Joins": implemented as compositions of built-in
DataFrame ops (option (a) of the custom-operator policy — no Pandas UDF
needed):

- **as-of join** via the union + ``last(ignorenulls)`` window pattern:
  one shuffle on the partition key, no join explosion. This is the
  100 TB-correct plan — the naive join+filter form materializes every
  (left, candidate) pair before ranking.
- **range/interval join** via an equi-join on the key plus range
  predicates; Catalyst plans key-partitioned SMJ with the range as a
  post-join filter, AQE splitting hot users.

Also array/map scalar coverage over ``embeddings``/``events.props``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_cs4225_spark.functions.numeric import (
    quant,
    quant_sql,
    ravg,
    ravg_sql,
    rstddev,
    rstddev_sql,
)
from hadoop_cs4225_spark.registry import register
from hadoop_cs4225_spark.sources.tables import load_table

_TS_FMT = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_SQL = "%Y-%m-%d %H:%M:%S"


@register(
    "events_asof_join",
    oracle=f"""
WITH tagged AS (
  SELECT event_id, user_id, ts, event_type,
         LAST_VALUE(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS asof_view_ts
  FROM events WHERE user_id <= 100
)
SELECT event_id, user_id,
       strftime(ts, '{_TS_FMT_SQL}') AS purchase_ts,
       strftime(asof_view_ts, '{_TS_FMT_SQL}') AS last_view_ts,
       CAST(floor(epoch(ts)) - floor(epoch(asof_view_ts)) AS BIGINT)
         AS secs_since_view
FROM tagged
WHERE event_type = 'purchase'
ORDER BY event_id
""",
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (backward) join: each purchase ↔ latest view at-or-before it.

    Union-free formulation: a single window pass carries the last
    non-null view timestamp forward per user; purchases read it in
    place. One shuffle on user_id, state = one timestamp per partition
    row — contrast with join-then-rank, which is quadratic in events
    per user.
    """
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") <= 100)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    view_ts = F.when(F.col("event_type") == "view", F.col("ts"))
    tagged = ev.withColumn("asof_view_ts", F.last(view_ts, ignorenulls=True).over(w))
    return (
        tagged.where(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", _TS_FMT).alias("purchase_ts"),
            F.date_format("asof_view_ts", _TS_FMT).alias("last_view_ts"),
            (
                F.unix_timestamp(F.col("ts").cast("timestamp"))
                - F.unix_timestamp(F.col("asof_view_ts").cast("timestamp"))
            ).alias("secs_since_view"),
        )
        .orderBy("event_id")
    )


@register(
    "events_range_join",
    oracle=f"""
SELECT c.event_id AS click_id, e.event_id AS error_id, c.user_id,
       CAST(floor(epoch(e.ts)) - floor(epoch(c.ts)) AS BIGINT) AS secs_between
FROM events c
JOIN events e
  ON c.user_id = e.user_id
 AND e.ts > c.ts
 AND e.ts <= c.ts + INTERVAL '5 minutes'
WHERE c.event_type = 'click' AND e.event_type = 'error' AND c.user_id <= 50
ORDER BY click_id, error_id
""",
)
def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: errors within 5 minutes after a click.

    Equi-key (user_id) + time-range predicate: the shuffle is keyed on
    user only; the range is a post-join filter. For key-free interval
    joins at scale, bucket ts into interval-sized bins and equi-join on
    the bin (same rewrite as the LSH bucket joins).
    """
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") <= 50)
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("c_ts"),
    )
    errors = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"),
    )
    return (
        clicks.join(
            errors,
            (F.col("user_id") == F.col("e_user"))
            & (F.col("e_ts") > F.col("c_ts"))
            & (F.col("e_ts") <= F.col("c_ts") + F.expr("INTERVAL 5 MINUTES")),
        )
        .select(
            "click_id",
            "error_id",
            "user_id",
            (
                F.unix_timestamp(F.col("e_ts").cast("timestamp"))
                - F.unix_timestamp(F.col("c_ts").cast("timestamp"))
            ).alias("secs_between"),
        )
        .orderBy("click_id", "error_id")
    )


@register(
    "embedding_array_features",
    oracle=f"""
SELECT vec_id,
       CAST(len(embedding) AS INT) AS dim,
       {quant_sql("embedding[1]::DOUBLE", 6)} AS h1,
       {quant_sql("embedding[2]::DOUBLE", 6)} AS h2,
       {quant_sql("embedding[3]::DOUBLE", 6)} AS h3,
       {quant_sql("list_reduce(list_prepend(0.0, list_transform(embedding,"
                  " x -> abs(x::DOUBLE))), (a, b) -> a + b)", 6)} AS l1_norm,
       {quant_sql("list_sort(list_transform(embedding, x -> x::DOUBLE), 'DESC')[1]", 6)}
         AS max_dim
FROM embeddings
WHERE vec_id <= 200
ORDER BY vec_id
""",
)
def embedding_array_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function coverage: element_at/transform/aggregate/sort_array.

    Float outputs are scalar double columns (raw doubles hash safely;
    array-of-double result columns would hinge on the comparator's list
    handling — arrays stay internal).
    """
    emb = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") <= 200)
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    return (
        emb.select(
            "vec_id",
            F.size("embedding").alias("dim"),
            *[
                quant(F.element_at("embedding", i).cast("double"), 6).alias(f"h{i}")
                for i in (1, 2, 3)
            ],
            quant(
                F.aggregate(as_double, F.lit(0.0), lambda a, x: a + F.abs(x)), 6
            ).alias("l1_norm"),
            quant(
                F.element_at(F.sort_array(as_double, asc=False), 1), 6
            ).alias("max_dim"),
        )
        .orderBy("vec_id")
    )


@register(
    "event_props_map",
    oracle="""
SELECT event_id,
       array_to_string(list_sort(json_keys(props)), ',') AS keys_csv,
       CAST(len(json_keys(props)) AS INT) AS n_keys,
       CAST(json_extract_string(props, 'k') AS INT) AS k_val
FROM events
WHERE event_id <= 1000
ORDER BY event_id
""",
)
def event_props_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type coverage: ``from_json`` → MapType → map_keys/element_at."""
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") <= 1000)
    m = F.from_json("props", "map<string,int>")
    return (
        ev.select(
            "event_id",
            F.array_join(F.sort_array(F.map_keys(m)), ",").alias("keys_csv"),
            F.size(F.map_keys(m)).alias("n_keys"),
            F.element_at(m, "k").alias("k_val"),
        )
        .orderBy("event_id")
    )


@register(
    "embedding_dim_stats",
    oracle=f"""
WITH ex AS (
  SELECT g.i AS dim, embedding[g.i]::DOUBLE AS x
  FROM embeddings,
       LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i) g
)
SELECT CAST(dim AS INT) AS dim,
       COUNT(*) AS n_vecs,
       {ravg_sql("x", 6, 4)} AS mean,
       {rstddev_sql("x", 4, 4)} AS stddev,
       {quant_sql("MIN(x)", 6)} AS min_x,
       {quant_sql("MAX(x)", 6)} AS max_x
FROM ex
GROUP BY dim
ORDER BY dim
""",
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension feature statistics over the embedding column —
    the normalization/whitening pass a feature store computes before
    serving vectors (and the sanity check before ANN indexing: a
    dimension with collapsed variance is a red flag).

    ``posexplode`` fans each vector into (dim, value) rows — d rows per
    vector, map-side only — then ONE hash aggregation keyed on dim
    (64 groups) computes all moments. At 100 TB this is the textbook
    partial-agg shape: every executor reduces its shard to 64 partial
    rows before the (tiny) shuffle. Moments derive from rounded sums
    (functions/numeric.py) so both engines quantize identically.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        F.posexplode(F.transform("embedding", lambda x: x.cast("double"))).alias(
            "pos", "x"
        )
    ).select((F.col("pos") + 1).cast("int").alias("dim"), "x")
    return (
        ex.groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            ravg("x", 6, 4).alias("mean"),
            rstddev("x", 4, 4).alias("stddev"),
            quant(F.min("x"), 6).alias("min_x"),
            quant(F.max("x"), 6).alias("max_x"),
        )
        .orderBy("dim")
    )


@register(
    "user_event_map_algebra",
    oracle="""
WITH per_type AS (
  SELECT user_id, event_type,
         COUNT(*) AS n,
         ROUND(SUM(value), 2) AS s
  FROM events WHERE user_id <= 200
  GROUP BY user_id, event_type
)
SELECT user_id,
       CAST(COUNT(*) AS INT) AS n_types,
       COALESCE(string_agg(CASE WHEN n >= 2
                    THEN event_type || ':' || CAST(n AS VARCHAR) END,
                ',' ORDER BY event_type), '') AS active_csv,
       string_agg(event_type || ':' ||
                  CAST(CAST(floor((s / n) * 10000.0 + 0.5) AS BIGINT) AS VARCHAR),
                  ',' ORDER BY event_type) AS avg_x1e4_csv
FROM per_type
GROUP BY user_id
ORDER BY user_id
""",
)
def user_event_map_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions end to end: build per-user maps
    (event_type -> count, event_type -> value sum) with
    ``map_from_entries``, keep the active types with ``map_filter``
    (count >= 2), and derive per-type averages with ``map_zip_with`` —
    the MapType algebra a feature-store materialization uses for
    per-entity keyed features.

    Output is FLAT (the driver contract): maps serialize as
    ':'-joined entries sorted by key, and the averages are scaled to
    x1e4 BIGINTs before rendering — double->string formatting differs
    between engines, integer rendering doesn't. The oracle states the
    same result relationally (string_agg over the per-type rows),
    which is also the proof the map algebra equals the relational
    algebra it encapsulates. One (user,type) reduce then one user
    reduce; per-user map size = |event types| (bounded).
    """
    from hadoop_cs4225_spark.sources.tables import load_events

    per_type = (
        load_events(spark, sf_dir)
        .where(F.col("user_id") <= 200)
        .groupBy("user_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("s"),
        )
    )
    maps = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "n")))
        ).alias("m_cnt"),
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "s")))
        ).alias("m_sum"),
    )
    active = F.map_filter("m_cnt", lambda k, v: v >= 2)
    avg_map = F.map_zip_with(
        "m_cnt",
        "m_sum",
        lambda k, n, s: F.floor((s / n) * 10000.0 + 0.5).cast("long"),
    )
    render = lambda m: F.array_join(  # noqa: E731
        F.transform(
            F.sort_array(F.map_entries(m)),
            lambda e: F.concat_ws(":", e.key, e.value.cast("string")),
        ),
        ",",
    )
    return (
        maps.select(
            "user_id",
            F.size("m_cnt").alias("n_types"),
            render(active).alias("active_csv"),
            render(avg_map).alias("avg_x1e4_csv"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Round-8 batch 3: q-gram-filtered fuzzy string join (edit distance)
# ---------------------------------------------------------------------------

#: Edit-distance threshold for the fuzzy name join.
_FUZZY_K = 2
#: Minimum name length for the bigram filter to be LOSSLESS (see the
#: pigeonhole bound in the docstring).
_FUZZY_MIN_LEN = 7


@register(
    "part_name_fuzzy_pairs",
    oracle=f"""
WITH names AS (
  SELECT p_name, CAST(COUNT(*) AS BIGINT) AS n_parts
  FROM part
  WHERE length(p_name) >= {_FUZZY_MIN_LEN}
  GROUP BY p_name
), grams AS (
  SELECT p_name, unnest(list_distinct(list_transform(
           range(1, length(p_name)), i -> substr(p_name, i, 2)))) AS g
  FROM names
), cand AS (
  SELECT DISTINCT a.p_name AS name1, b.p_name AS name2
  FROM grams a JOIN grams b
    ON a.g = b.g AND a.p_name < b.p_name
   AND abs(length(a.p_name) - length(b.p_name)) <= {_FUZZY_K}
)
SELECT c.name1, c.name2,
       CAST(levenshtein(c.name1, c.name2) AS BIGINT) AS dist,
       n1.n_parts AS n_parts_1, n2.n_parts AS n_parts_2
FROM cand c
JOIN names n1 ON n1.p_name = c.name1
JOIN names n2 ON n2.p_name = c.name2
WHERE levenshtein(c.name1, c.name2) <= {_FUZZY_K}
ORDER BY dist, name1, name2
""",
)
def part_name_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT fuzzy string self-join: all part-name pairs within edit
    distance 2, found WITHOUT an all-pairs comparison — the entity-
    resolution primitive (catalog/vendor name reconciliation) that
    complements the set-similarity joins in dedup.py with CHARACTER-
    level similarity.

    The filter chain is lossless, not heuristic: (1) dedupe rows to
    the NAME DICTIONARY first (the join is vocabulary-grain — row
    count never enters the pair space); (2) bigram blocking — k edits
    leave >= len-k characters in <= k+1 preserved segments, so the
    longest common segment has >= (len_min-k)/(k+1) chars, which for
    len >= {_FUZZY_MIN_LEN} and k = {_FUZZY_K} guarantees a shared
    BIGRAM (the length guard is encoded in both engines); (3) length
    filter |len1-len2| <= k; (4) exact Levenshtein verify (both
    engines implement classic Wagner-Fischer, integer result). At
    catalog scale the next tightening is positional q-grams + the
    multiset count filter; the plan shape (dictionary → gram explode →
    equi-join → verify) is already the scalable one.

    No reference analogue; extends the SURVEY §2 joins family.
    """
    part = load_table(spark, sf_dir, "part")
    names = (
        part.where(F.length("p_name") >= _FUZZY_MIN_LEN)
        .groupBy("p_name")
        .agg(F.count(F.lit(1)).cast("long").alias("n_parts"))
    )
    # substring with a COLUMN start position needs the expr form
    grams = names.select(
        "p_name",
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, length(p_name) - 1),"
                    " i -> substring(p_name, i, 2))"
                )
            )
        ).alias("g"),
    )
    a = grams.select(F.col("p_name").alias("name1"), "g")
    b = grams.select(F.col("p_name").alias("name2"), "g")
    cand = (
        a.join(b, "g")
        .where(
            (F.col("name1") < F.col("name2"))
            & (
                F.abs(F.length("name1") - F.length("name2")) <= _FUZZY_K
            )
        )
        .select("name1", "name2")
        .distinct()
    )
    ver = cand.where(
        F.levenshtein("name1", "name2") <= _FUZZY_K
    ).select(
        "name1",
        "name2",
        F.levenshtein("name1", "name2").cast("long").alias("dist"),
    )
    return (
        ver.join(
            names.select(F.col("p_name").alias("name1"), F.col("n_parts").alias("n_parts_1")),
            "name1",
        )
        .join(
            names.select(F.col("p_name").alias("name2"), F.col("n_parts").alias("n_parts_2")),
            "name2",
        )
        .select("name1", "name2", "dist", "n_parts_1", "n_parts_2")
        .orderBy("dist", "name1", "name2")
    )
