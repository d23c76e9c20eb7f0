"""Event-time windowing over ``events`` — batch-equivalent form (M5).

Streaming semantics (SURVEY.md §7): every windowed operator is
implemented twice with identical event-time semantics —

1. here, as a *batch* DataFrame query using the same ``window()`` /
   ``session_window()`` expressions, which DuckDB can oracle-check;
2. in ``hadoop_cs4225_spark/streaming/streams.py`` as a Structured
   Streaming query (``readStream`` + watermark), smoke-tested against
   the batch result (a stream cannot be oracle'd by DuckDB).

Window alignment notes: Spark's ``window(ts, size, slide)`` starts are
epoch-aligned multiples of the slide — identical to DuckDB
``time_bucket``. Session windows are [min(ts), max(ts)+gap) per merged
group, reproduced in SQL with the lag/cumsum sessionization idiom.
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
from hadoop_cs4225_spark.sources.tables import load_events, load_table

_TS_FMT = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_SQL = "%Y-%m-%d %H:%M:%S"


@register(
    "events_tumbling_counts",
    oracle=f"""
SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '{_TS_FMT_SQL}') AS w_start,
       event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def events_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window counts per event type.

    The batch twin of the streaming tumbling aggregation; one shuffle on
    (window, type). At 100 TB ``events`` is date-partitioned so the scan
    prunes to the queried range before windowing.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", _TS_FMT).alias("w_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("w_start", "event_type")
    )


@register(
    "events_sliding_avg",
    oracle=f"""
WITH assigned AS (
  SELECT time_bucket(INTERVAL '1 hour', ts) AS w_start, value FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '1 hour', ts) - INTERVAL '1 hour' AS w_start, value
  FROM events
)
SELECT strftime(w_start, '{_TS_FMT_SQL}') AS w_start,
       COUNT(*) AS n_events,
       (floor((ROUND(SUM(value), 2) / COUNT(*)) * 1000000.0 + 0.5) / 1000000.0)
         AS avg_value
FROM assigned
GROUP BY w_start
ORDER BY w_start
""",
)
def events_sliding_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hour windows sliding by 1 hour (each event lands in 2 windows).

    The oracle models Spark's window replication as a 2-branch UNION ALL
    on the two epoch-aligned starts covering each event.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            quant(F.round(F.sum("value"), 2) / F.count(F.lit(1)), 6).alias(
                "avg_value"
            ),
        )
        .select(
            F.date_format("w.start", _TS_FMT).alias("w_start"),
            "n_events",
            "avg_value",
        )
        .orderBy("w_start")
    )


@register(
    "events_session_windows",
    oracle=f"""
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL '30 minutes'
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events WHERE user_id <= 50
), numbered AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT user_id,
       strftime(MIN(ts), '{_TS_FMT_SQL}') AS session_start,
       strftime(MAX(ts) + INTERVAL '30 minutes', '{_TS_FMT_SQL}') AS session_end,
       COUNT(*) AS n_events
FROM numbered
GROUP BY user_id, session_id
ORDER BY user_id, session_start
""",
)
def events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute gap) per user via ``session_window``.

    Spark merges events whose gaps are < 30 min; window end is
    ``last_event + gap``. The oracle reproduces the merge with the
    lag/cumsum sessionization idiom — same semantics, pure SQL.
    """
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") <= 50)
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", _TS_FMT).alias("session_start"),
            F.date_format("w.end", _TS_FMT).alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


@register(
    "events_dedup_latest",
    oracle=f"""
SELECT user_id, event_type,
       strftime(ts, '{_TS_FMT_SQL}') AS latest_ts,
       event_id
FROM (
  SELECT user_id, event_type, ts, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE user_id <= 100
) t
WHERE rn = 1
ORDER BY user_id, event_type
""",
)
def events_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest dedup per (user, event_type) — the batch twin of
    streaming ``dropDuplicates`` with watermark (streams.py)."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") <= 100)
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.date_format("ts", _TS_FMT).alias("latest_ts"),
            "event_id",
        )
        .orderBy("user_id", "event_type")
    )


@register(
    "events_funnel_conversion",
    oracle="""
WITH firsts AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END)     AS first_view,
         MIN(CASE WHEN event_type = 'click' THEN ts END)    AS first_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
  FROM events
  GROUP BY user_id
)
SELECT COUNT(*) AS n_users,
       CAST(SUM(CASE WHEN first_view IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS viewed,
       CAST(SUM(CASE WHEN first_view IS NOT NULL AND first_click > first_view
                THEN 1 ELSE 0 END) AS BIGINT) AS clicked_after_view,
       CAST(SUM(CASE WHEN first_view IS NOT NULL AND first_click > first_view
                AND first_purchase > first_click THEN 1 ELSE 0 END)
         AS BIGINT) AS purchased_after_click
FROM firsts
""",
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analytics: view → click → purchase ordered-step conversion.

    Per-user first-touch timestamps via conditional MIN (one shuffle on
    user_id), then ordered-step predicates — the standard funnel rewrite
    that avoids per-step self-joins (at 100 TB, k-step funnels as
    k-way joins explode; conditional aggregation stays one pass).
    """
    ev = load_table(spark, sf_dir, "events")
    first_of = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))  # noqa: E731
    firsts = ev.groupBy("user_id").agg(
        first_of("view").alias("first_view"),
        first_of("click").alias("first_click"),
        first_of("purchase").alias("first_purchase"),
    )
    viewed = F.col("first_view").isNotNull()
    clicked = viewed & (F.col("first_click") > F.col("first_view"))
    purchased = clicked & (F.col("first_purchase") > F.col("first_click"))
    as_int = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    return firsts.agg(
        F.count(F.lit(1)).alias("n_users"),
        as_int(viewed).alias("viewed"),
        as_int(clicked).alias("clicked_after_view"),
        as_int(purchased).alias("purchased_after_click"),
    )


@register(
    "events_rolling_active_users",
    oracle="""
WITH daily AS (
  SELECT DISTINCT time_bucket(INTERVAL '1 day', ts) AS day, user_id FROM events
), days AS (SELECT DISTINCT day FROM daily)
SELECT strftime(d.day, '%Y-%m-%d') AS day,
       COUNT(DISTINCT u.user_id) AS active_7d
FROM days d
JOIN daily u ON u.day > d.day - INTERVAL '7 days' AND u.day <= d.day
GROUP BY d.day
ORDER BY day
""",
)
def events_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct active users per day.

    Distinct-count over a sliding window can't use a window-function
    frame (COUNT(DISTINCT) OVER RANGE is unsupported in both engines);
    the scalable rewrite is dedup-to-(day,user) then a small range join
    on the day spine — the fact table is touched once.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    ).distinct()
    # Range-join rewrite: each (day, user) row contributes to the 7
    # window-days [day, day+6], so explode it into those days and
    # equi-join — a plain shuffle instead of a nested-loop range join
    # (guarded by tests/test_plans.py::test_no_unbounded_cartesian_anywhere).
    contrib = daily.select(
        F.explode(
            F.sequence(
                F.col("day"),
                F.col("day") + F.expr("INTERVAL 6 DAYS"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("d"),
        "user_id",
    )
    days = daily.select("day").distinct().withColumnRenamed("day", "d")
    return (
        contrib.join(F.broadcast(days), "d", "left_semi")
        .groupBy("d")
        .agg(F.countDistinct("user_id").alias("active_7d"))
        .select(F.date_format("d", "yyyy-MM-dd").alias("day"), "active_7d")
        .orderBy("day")
    )


@register(
    "events_daily_rollup",
    oracle=f"""
SELECT strftime(time_bucket(INTERVAL '1 day', ts), '%Y-%m-%d') AS day,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 2)
         AS purchase_value
FROM events
GROUP BY day
ORDER BY day
""",
)
def events_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily rollup with conditional aggregation (hypertable-rollup shape).

    At scale this materializes as an incremental aggregate maintained by
    the streaming twin; in batch it's a single windowed groupBy.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(
                F.sum(
                    F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(
                        0.0
                    )
                ),
                2,
            ).alias("purchase_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd").alias("day"),
            "n_events",
            "n_users",
            "purchase_value",
        )
        .orderBy("day")
    )


@register(
    "user_state_scd2",
    oracle=f"""
WITH seq AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN event_type = LAG(event_type) OVER w
              THEN 0 ELSE 1 END AS chg
  FROM events WHERE user_id <= 30
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
runs AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS run_id
  FROM seq
),
grouped AS (
  SELECT user_id, CAST(run_id AS BIGINT) AS run_id,
         MIN(event_type) AS state,
         MIN(ts) AS vf, COUNT(*) AS n_events
  FROM runs GROUP BY user_id, run_id
)
SELECT user_id, run_id, state,
       strftime(vf, '{_TS_FMT_SQL}') AS valid_from,
       COALESCE(strftime(LEAD(vf) OVER (PARTITION BY user_id ORDER BY run_id),
                         '{_TS_FMT_SQL}'), 'current') AS valid_to,
       n_events,
       CASE WHEN LEAD(vf) OVER (PARTITION BY user_id ORDER BY run_id)
            IS NULL THEN 1 ELSE 0 END AS is_current
FROM grouped
ORDER BY user_id, run_id
""",
)
def user_state_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension history of each user's
    event_type "state": contiguous runs become [valid_from, valid_to)
    rows, the last run per user flagged current — the gaps-and-islands
    shape (change detection via lag, run ids via conditional cumsum)
    that builds SCD2 tables from event streams.

    Three window passes share ONE partitioning (user_id) and ordering,
    so Catalyst plans a single sort+exchange feeding lag -> running sum
    -> (after the run-level agg) lead. At 100 TB the shuffle is keyed
    on user_id — the natural key of the output — and per-run state is
    one row, so the post-agg lead runs on collapsed data. LAG-based
    change detection beats a self-join on (user, seq-1) by an entire
    shuffle. (`user_id <= 30` bounds the demo output only.)
    """
    ev = load_events(spark, sf_dir).where(F.col("user_id") <= 30)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            F.col("event_type") == F.lag("event_type").over(w), F.lit(0)
        )
        .otherwise(F.lit(1))
        .alias("chg"),
    )
    runs = seq.select(
        "user_id",
        "ts",
        "event_type",
        F.sum("chg")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("run_id"),
    )
    grouped = runs.groupBy("user_id", F.col("run_id").cast("bigint").alias("run_id")).agg(
        F.min("event_type").alias("state"),
        F.min("ts").alias("vf"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wr = Window.partitionBy("user_id").orderBy("run_id")
    nxt = F.lead("vf").over(wr)
    return (
        grouped.select(
            "user_id",
            "run_id",
            "state",
            F.date_format("vf", _TS_FMT).alias("valid_from"),
            F.coalesce(F.date_format(nxt, _TS_FMT), F.lit("current")).alias(
                "valid_to"
            ),
            "n_events",
            nxt.isNull().cast("int").alias("is_current"),
        )
        .orderBy("user_id", "run_id")
    )


@register(
    "events_daily_anomaly",
    oracle=f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt
  FROM events GROUP BY event_type, day
),
stats AS (
  SELECT event_type,
         {ravg_sql("cnt")} AS mu,
         {rstddev_sql("cnt")} AS sigma
  FROM daily GROUP BY event_type
)
SELECT d.event_type,
       strftime(d.day, '%Y-%m-%d') AS day,
       d.cnt,
       {quant_sql("(d.cnt - s.mu) / s.sigma", 4)} AS z
FROM daily d JOIN stats s ON d.event_type = s.event_type
WHERE s.sigma > 0
  AND ABS((d.cnt - s.mu) / s.sigma) >= 2.0
ORDER BY d.event_type, day
""",
)
def events_daily_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection: days whose per-type event count sits
    ≥2 standard deviations from that type's daily mean — the monitoring
    sweep a pipeline runs over ingest volumes before trusting a batch.

    Two shuffles total: the daily rollup (map-side combined) and the
    per-type moment aggregate (rows = |types|, joined back — AQE
    broadcasts it without a hand hint, which would be wrong to hard-code
    on a data-derived relation). Mean/stddev come from the shared
    rounded-sum helpers so both engines quantize identically; z is
    computed from those quantized moments with plain IEEE arithmetic.
    """
    ev = load_events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    stats = daily.groupBy("event_type").agg(
        ravg("cnt").alias("mu"),
        rstddev("cnt").alias("sigma"),
    )
    z = quant((F.col("cnt") - F.col("mu")) / F.col("sigma"), 4)
    return (
        daily.join(stats, "event_type")
        .where((F.col("sigma") > 0) & (F.abs((F.col("cnt") - F.col("mu")) / F.col("sigma")) >= 2.0))
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "cnt",
            z.alias("z"),
        )
        .orderBy("event_type", "day")
    )


#: EWMA smoothing factor (identical decimal literal in both engines —
#: 0.3/0.7 parse to the same IEEE doubles everywhere).
EWMA_ALPHA = 0.3


@register(
    "events_daily_ewma",
    oracle=f"""
WITH RECURSIVE daily AS (
  SELECT event_type,
         strftime(time_bucket(INTERVAL '1 day', ts), '%Y-%m-%d') AS day,
         SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0 AS v
  FROM events GROUP BY event_type, day
), idx AS (
  SELECT event_type, day, v,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn
  FROM daily
), rec AS (
  SELECT event_type, rn, day, v, v AS e FROM idx WHERE rn = 1
  UNION ALL
  SELECT i.event_type, i.rn, i.day, i.v,
         floor(({EWMA_ALPHA} * i.v + {1 - EWMA_ALPHA} * r.e) * 1000000.0 + 0.5)
           / 1000000.0
  FROM idx i JOIN rec r ON i.event_type = r.event_type AND i.rn = r.rn + 1
)
SELECT event_type, day, v AS daily_value,
       {quant_sql("e", 4)} AS ewma
FROM rec
ORDER BY event_type, day
""",
)
def events_daily_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of daily event value per
    type (s_0 = v_0; s_t = alpha*v_t + (1-alpha)*s_{t-1}) — the
    smoothing every ingest-volume monitor runs before alerting, and the
    canonical RECURSIVE relation a distributed engine can't express as
    a plain window.

    Spark strategy: reduce to the bounded per-type daily series first
    (one map-side-combined shuffle; per-key state is the DAY COUNT, not
    the event count), then fold the sorted series through one
    ``aggregate`` lambda that appends each smoothed value — an O(days)
    per-row array program, never a partition-less window over events.
    The DuckDB oracle states the same recursion as a recursive CTE;
    each step quantizes to 6 dp IN BOTH ENGINES, so the recursion
    walks identical doubles and cannot accumulate cross-engine drift
    (per-step quantization is what makes a float recursion
    oracle-checkable at all — the ``cross-engine-float`` discipline).
    At 100 TB the fold input is |types| rows of |days| entries; the
    heavy lifting stays in the daily rollup shuffle.
    """
    ev = load_events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.date_format(F.window("ts", "1 day").start, "yyyy-MM-dd").alias("day")
    ).agg(
        # exact-cents discipline (the Holt/ADVICE-r10 class): v seeds
        # the recursion, so the daily sum must be summation-order-free
        (F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")) / 100.0)
        .alias("v")
    )
    series = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "v"))).alias("s")
    )
    a, b = EWMA_ALPHA, 1 - EWMA_ALPHA
    fold = F.expr(
        "aggregate(s, CAST(array() AS array<struct<day:string,v:double,e:double>>), "
        "(acc, x) -> array_append(acc, named_struct('day', x.day, 'v', x.v, 'e', "
        "CASE WHEN size(acc) = 0 THEN x.v "
        f"ELSE floor(({a}D * x.v + {b}D * element_at(acc, -1).e) * 1000000.0D + 0.5D) "
        "/ 1000000.0D END)))"
    )
    return (
        series.select("event_type", F.explode(fold).alias("r"))
        .select(
            "event_type",
            F.col("r.day").alias("day"),
            F.col("r.v").alias("daily_value"),
            quant(F.col("r.e"), 4).alias("ewma"),
        )
        .orderBy("event_type", "day")
    )


@register(
    "events_daily_ohlc",
    oracle="""
WITH e AS (
  SELECT event_type,
         strftime(time_bucket(INTERVAL '1 day', ts), '%Y-%m-%d') AS day,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc, ts, event_id
  FROM events
), r AS (
  SELECT event_type, day, vc,
         ROW_NUMBER() OVER (PARTITION BY event_type, day
                            ORDER BY ts, event_id) AS rn_a,
         ROW_NUMBER() OVER (PARTITION BY event_type, day
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM e
)
SELECT event_type, day,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MAX(CASE WHEN rn_a = 1 THEN vc END) AS open_cents,
       MAX(vc) AS high_cents,
       MIN(vc) AS low_cents,
       MAX(CASE WHEN rn_d = 1 THEN vc END) AS close_cents
FROM r
GROUP BY event_type, day
ORDER BY event_type, day
""",
)
def events_daily_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC (open/high/low/close) bars per event type — the
    classic financial candlestick rollup, and the general "first/last
    value per key by event time" shape every CDC/telemetry summary
    needs.

    Spark strategy: ONE map-side-combined ``groupBy`` using
    ``min_by``/``max_by`` with a ``struct(ts, event_id)`` ordering key
    (struct comparison is lexicographic, so the event_id tiebreak rides
    in the same aggregate) — no window pass, no second shuffle; at
    100 TB this is a single partial-aggregated exchange keyed on
    (type, day), state = 4 scalars per group. The oracle states the
    same first/last semantics with row-number windows. Values on the
    exact-cents integer grid in both engines.
    """
    ev = load_events(spark, sf_dir)
    vc = F.floor(F.col("value") * 100 + 0.5).cast("long")
    ordk = F.struct("ts", "event_id")
    return (
        ev.select(
            "event_type",
            F.date_format(F.window("ts", "1 day").start, "yyyy-MM-dd").alias(
                "day"
            ),
            vc.alias("vc"),
            "ts",
            "event_id",
        )
        .groupBy("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min_by("vc", ordk).alias("open_cents"),
            F.max("vc").alias("high_cents"),
            F.min("vc").alias("low_cents"),
            F.max_by("vc", ordk).alias("close_cents"),
        )
        .orderBy("event_type", "day")
    )


@register(
    "event_transition_matrix",
    oracle=f"""
WITH seq AS (
  SELECT user_id, event_type AS cur,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS nxt
  FROM events
), pairs AS (
  SELECT cur, nxt, COUNT(*) AS n FROM seq WHERE nxt IS NOT NULL
  GROUP BY cur, nxt
), tot AS (SELECT cur, SUM(n) AS row_n FROM pairs GROUP BY cur)
SELECT p.cur, p.nxt, CAST(p.n AS BIGINT) AS n,
       {quant_sql("CAST(p.n AS DOUBLE) / t.row_n", 6)} AS prob
FROM pairs p JOIN tot t ON p.cur = t.cur
ORDER BY p.cur, p.nxt
""",
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of event types: for every
    user's time-ordered event sequence, count cur->next pairs and
    normalize per source state — the behavioral-model input (and drift
    monitor: a transition probability shifting between releases flags a
    product change or instrumentation bug before any volume metric
    moves).

    The (ts, event_id) ordering is a total order, so the lead() pairing
    is deterministic. Plan: ONE user-keyed window exchange builds the
    sequence pairs, then a |types|^2-group partial-agg shuffle; the
    per-state normalizer is a window over that tiny aggregated frame —
    the corpus-scale subtree executes exactly once (a row-total join
    would plan the pairs aggregation twice and lean on ReuseExchange).
    Per-user window frames hold one lookahead row — no per-user
    materialization.
    """
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).where(F.col("nxt").isNotNull())
    pairs = seq.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n"))
    row_n = F.sum("n").over(Window.partitionBy("cur"))
    return (
        pairs.select(
            "cur",
            "nxt",
            F.col("n").cast("bigint").alias("n"),
            quant(F.col("n").cast("double") / row_n, 6).alias("prob"),
        )
        .orderBy("cur", "nxt")
    )


@register(
    "events_user_recency_churn",
    oracle="""
WITH bounds AS (SELECT MAX(ts) AS now_ts FROM events),
per_user AS (
  SELECT user_id,
         COUNT(*) AS n_events,
         MAX(ts) AS last_ts
  FROM events GROUP BY user_id
)
SELECT CAST(datediff('day', CAST(last_ts AS DATE), CAST(now_ts AS DATE))
            AS BIGINT) AS days_inactive,
       COUNT(*) AS n_users,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN datediff('day', CAST(last_ts AS DATE),
                                   CAST(now_ts AS DATE)) > 30
                THEN 1 ELSE 0 END) AS BIGINT) AS n_churn_risk
FROM per_user CROSS JOIN bounds
GROUP BY days_inactive
ORDER BY days_inactive
""",
)
def events_user_recency_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency histogram: users bucketed by days since their last event
    (relative to the corpus's max timestamp — deterministic, no wall
    clock), with the >30-day churn-risk count per bucket — the
    re-engagement targeting input every activity pipeline maintains.

    Plan: one map-side-combined per-user reduce (count + max ts), a
    broadcast 1-row corpus-max join, then a day-keyed reduce over
    |users| rows. Nothing scans events twice: the 1-row bound is an
    aggregate of the per-user maxima, not a separate pass.
    """
    ev = load_events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("ts").alias("last_ts"),
    ).localCheckpoint(eager=False)
    bounds = F.broadcast(per_user.agg(F.max("last_ts").alias("now_ts")))
    days = F.datediff(
        F.col("now_ts").cast("date"), F.col("last_ts").cast("date")
    ).cast("long")
    return (
        per_user.crossJoin(bounds)
        .select(days.alias("days_inactive"), "n_events")
        .groupBy("days_inactive")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.sum((F.col("days_inactive") > 30).cast("long"))
            .cast("bigint")
            .alias("n_churn_risk"),
        )
        .orderBy("days_inactive")
    )


#: Coarse-bucket shift for the Gini rank computation: per-user counts
#: are bucketed by ``v >> 20``, so the in-bucket cumulative window sees
#: at most 2^20 distinct count values and the bucket-level cumulative
#: sees ``max_count >> 20`` rows (< 2^20 for any per-user count below
#: a trillion) — both bounded by construction, never by the number of
#: users.
_GINI_SHIFT = 20


@register(
    "user_activity_gini",
    oracle=f"""
WITH counts AS (
  SELECT user_id, COUNT(*) AS v FROM events GROUP BY user_id
), hist AS (
  SELECT v, COUNT(*) AS m FROM counts GROUP BY v
), cum AS (
  SELECT v, m,
         COALESCE(SUM(m) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s
  FROM hist
)
SELECT CAST(SUM(m) AS BIGINT) AS n_users,
       CAST(SUM(v * m) AS BIGINT) AS n_events,
       {quant_sql(
           "CAST(SUM(CAST(v AS HUGEINT) * (2 * CAST(m AS HUGEINT)"
           " * CAST(s AS HUGEINT) + CAST(m AS HUGEINT)"
           " * (CAST(m AS HUGEINT) + 1))) AS DOUBLE)"
           " / (CAST(SUM(m) AS DOUBLE) * CAST(SUM(v * m) AS DOUBLE))"
           " - (CAST(SUM(m) AS DOUBLE) + 1.0) / CAST(SUM(m) AS DOUBLE)",
           6,
       )} AS gini
FROM cum
""",
)
def user_activity_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user event counts — the one-number skew
    diagnostic (0 = uniform load, →1 = one user owns the traffic) that
    complements ``events_hot_key_profile``'s per-key top-5: the profile
    names the hot keys, the Gini says whether the TAIL is skewed too,
    which decides between targeted salting and a global re-key.

    Gini needs every user's global rank by count — the textbook form is
    a partition-less ``row_number`` over all users, a guaranteed
    single-task straggler. Counts are INTEGERS, so ranks collapse onto
    the count-value histogram: users sharing count v occupy a
    contiguous rank block starting after ``s_v`` (users with smaller
    counts), and the rank-weighted sum is

        2*sum_i rank_i*x_i  =  sum_v v * (2*m_v*s_v + m_v*(m_v+1))

    — exact, and integer until the final division. The cumulative
    ``s_v`` itself is two-level (the `curriculum_phase_bins`
    discipline): an in-bucket window partitioned by ``v >> {_GINI_SHIFT}``
    plus a bucket-level cumulative over the ≤2^{20}-row bucket-total
    frame, so no window ever scales with the user count. One
    map-side-combined shuffle over events, one over |users| rows;
    everything after is histogram-sized.
    """
    ev = load_events(spark, sf_dir)
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("v"))
    hist = (
        counts.groupBy("v")
        .agg(F.count(F.lit(1)).alias("m"))
        .withColumn("c", F.shiftright(F.col("v"), _GINI_SHIFT))
        .localCheckpoint(eager=False)  # 2 consumers; |distinct counts| rows
    )
    w_in = (
        Window.partitionBy("c")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bucket_tot = hist.groupBy("c").agg(F.sum("m").alias("mc"))
    w_b = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, -1)
    bucket_cum = bucket_tot.withColumn(
        "sb", F.coalesce(F.sum("mc").over(w_b), F.lit(0))
    )
    ranked = (
        hist.withColumn("sin", F.coalesce(F.sum("m").over(w_in), F.lit(0)))
        .join(F.broadcast(bucket_cum.select("c", "sb")), "c")
        .withColumn("s", F.col("sb") + F.col("sin"))
    )
    m, v, s = F.col("m"), F.col("v"), F.col("s")
    n = F.sum(m).cast("double")
    total = F.sum(v * m).cast("double")
    # rank2 <= 2*n_users*n_events overflows int64 at the scale this op
    # claims (1e9 users x 1e12 events ~ 2e21 > 2^63): accumulate in
    # 128-bit — Spark decimal(38,0), DuckDB HUGEINT in the oracle —
    # both exact integers, so converting the same value to double last
    # keeps parity bit-identical at any scale.
    md = m.cast("decimal(38,0)")
    rank2 = F.sum(
        v.cast("decimal(38,0)")
        * (2 * md * s.cast("decimal(38,0)") + md * (md + 1))
    ).cast("double")
    return ranked.agg(
        F.sum(m).cast("bigint").alias("n_users"),
        F.sum(v * m).cast("bigint").alias("n_events"),
        quant(rank2 / (n * total) - (n + 1.0) / n, 6).alias("gini"),
    )


@register(
    "events_minute_peak",
    oracle=f"""
WITH per_min AS (
  SELECT event_type,
         time_bucket(INTERVAL '1 minute', ts) AS minute,
         COUNT(*) AS n
  FROM events GROUP BY event_type, minute
)
SELECT event_type,
       COUNT(*) AS n_minutes,
       CAST(MAX(n) AS BIGINT) AS peak_minute_events,
       {quant_sql("CAST(SUM(n) AS DOUBLE) / COUNT(*)", 4)}
         AS avg_minute_events,
       {quant_sql(
           "CAST(MAX(n) AS DOUBLE) * COUNT(*) / CAST(SUM(n) AS DOUBLE)", 4
       )} AS peak_to_avg
FROM per_min
GROUP BY event_type
ORDER BY event_type
""",
)
def events_minute_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness per event type: the hottest minute's event count
    against the average observed minute — the capacity-planning number
    (provision for peak_to_avg x the mean rate) and the flag that
    separates steady telemetry from spiky user-driven types.

    Plan: two stacked map-side-combined aggregates — (type, minute)
    then (type) — with max/avg computed on the minute-count frame, so
    the peak never needs a window or a sort. At 100 TB the first
    shuffle's key space is |types| x |minutes in retention|, bounded by
    the calendar, not the event count; the second is |types| rows.
    ``peak_to_avg`` is stated as max*n/sum (integers until one final
    division) so both engines divide bit-identical operands.
    """
    ev = load_events(spark, sf_dir)
    per_min = (
        ev.groupBy("event_type", F.date_trunc("minute", "ts").alias("minute"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        per_min.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_minutes"),
            F.max("n").cast("bigint").alias("peak_minute_events"),
            quant(
                F.sum("n").cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_minute_events"),
            quant(
                F.max("n").cast("double")
                * F.count(F.lit(1))
                / F.sum("n").cast("double"),
                4,
            ).alias("peak_to_avg"),
        )
        .orderBy("event_type")
    )


@register(
    "events_weekly_seasonality",
    oracle=f"""
WITH per_dow AS (
  SELECT event_type, isodow(ts) AS dow, COUNT(*) AS n
  FROM events GROUP BY event_type, dow
)
SELECT event_type, dow, n,
       {quant_sql(
           "CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY event_type)", 6
       )} AS share
FROM per_dow
ORDER BY event_type, dow
""",
)
def events_weekly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week profile per event type (ISO dow, Monday=1): the
    weekly-cycle complement of `events_minute_peak`'s burst view —
    weekday-flat telemetry vs weekend-heavy user types, the shape that
    decides batch-window placement and staffing-curve capacity.

    Plan: one map-side-combined (type, dow) aggregate — the key space
    is |types| x 7 regardless of event count — then a share window
    PARTITIONED by type over at most 7 rows. Spark's ``weekday()+1``
    equals DuckDB's ``isodow`` (both Monday=1); Spark's ``dayofweek``
    (Sunday=1) is deliberately avoided.
    """
    ev = load_events(spark, sf_dir)
    per_dow = ev.groupBy(
        "event_type", (F.weekday("ts") + 1).alias("dow")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type")
    return (
        per_dow.select(
            "event_type",
            "dow",
            "n",
            quant(F.col("n").cast("double") / F.sum("n").over(w), 6).alias(
                "share"
            ),
        )
        .orderBy("event_type", "dow")
    )


@register(
    "events_multires_rollup",
    oracle="""
WITH minute AS (
  SELECT event_type, date_trunc('minute', ts) AS m,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, m
),
hour AS (
  SELECT event_type, date_trunc('hour', m) AS h,
         CAST(SUM(n) AS BIGINT) AS n,
         CAST(MAX(n) AS BIGINT) AS peak_minute,
         CAST(COUNT(*) AS BIGINT) AS active_minutes
  FROM minute GROUP BY event_type, h
)
SELECT event_type,
       strftime(date_trunc('day', h), '%Y-%m-%d') AS day,
       CAST(SUM(n) AS BIGINT) AS n_events,
       CAST(COUNT(*) AS BIGINT) AS n_active_hours,
       CAST(SUM(active_minutes) AS BIGINT) AS n_active_minutes,
       CAST(MAX(n) AS BIGINT) AS peak_hour_events,
       CAST(MAX(peak_minute) AS BIGINT) AS peak_minute_events
FROM hour
GROUP BY event_type, day
ORDER BY event_type, day
""",
)
def events_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cascaded minute → hour → day rollup from ONE raw-event pass —
    the hypertable / continuous-aggregate pattern: the expensive
    shuffle of raw events happens exactly once at the FINEST grain, and
    every coarser resolution aggregates the previous aggregate
    (sum-of-sums, max-of-maxes), whose row count is calendar×type
    bounded, not event bounded. Per (type, day): totals, active
    hour/minute counts, and the peak hour and peak minute — the burst
    profile an on-call dashboard reads.

    At 100 TB this is the difference between one shuffle of 1e12
    events and three: resolutions 2..k are free (the minute frame is
    ≤ types × 525 600 rows/year whatever the event count). The
    streaming twin maintains the same cascade incrementally
    (``run_incremental_daily_rollup``); this is the batch/backfill
    path. All metrics are exact integer counts.
    """
    ev = load_events(spark, sf_dir)
    minute = ev.groupBy(
        "event_type", F.date_trunc("minute", "ts").alias("m")
    ).agg(F.count(F.lit(1)).alias("n"))
    hour = minute.groupBy(
        "event_type", F.date_trunc("hour", "m").alias("h")
    ).agg(
        F.sum("n").alias("n"),
        F.max("n").alias("peak_minute"),
        F.count(F.lit(1)).alias("active_minutes"),
    )
    return (
        hour.groupBy(
            "event_type", F.date_format("h", "yyyy-MM-dd").alias("day")
        )
        .agg(
            F.sum("n").cast("long").alias("n_events"),
            F.count(F.lit(1)).cast("long").alias("n_active_hours"),
            F.sum("active_minutes").cast("long").alias("n_active_minutes"),
            F.max("n").cast("long").alias("peak_hour_events"),
            F.max("peak_minute").cast("long").alias("peak_minute_events"),
        )
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# Round-8 batch 3: multi-touch conversion attribution
# ---------------------------------------------------------------------------

#: Lookback window (days) for touches preceding a conversion, and the
#: grid for exact linear-credit fractions (1/n snapped per touch).
_ATTR_DAYS = 7
_ATTR_GRID = 1_000_000_000


@register(
    "events_attribution_weights",
    oracle=f"""
WITH conv AS (
  SELECT event_id AS conv_id, user_id, ts AS conv_ts
  FROM events WHERE event_type = 'purchase'
), touch AS (
  SELECT c.conv_id, e.event_type, e.ts, e.event_id,
         COUNT(*) OVER (PARTITION BY c.conv_id) AS n_touch,
         ROW_NUMBER() OVER (PARTITION BY c.conv_id
                            ORDER BY e.ts, e.event_id) AS rn_first,
         ROW_NUMBER() OVER (PARTITION BY c.conv_id
                            ORDER BY e.ts DESC, e.event_id DESC) AS rn_last
  FROM conv c JOIN events e
    ON e.user_id = c.user_id
   AND e.event_type IN ('view', 'click', 'signup')
   AND e.ts < c.conv_ts
   AND e.ts >= c.conv_ts - INTERVAL '{_ATTR_DAYS} days'
)
SELECT event_type,
       CAST(SUM(CASE WHEN rn_first = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS first_touch_credits,
       CAST(SUM(CASE WHEN rn_last = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS last_touch_credits,
       {quant_sql(
           f"SUM(CAST(floor({_ATTR_GRID}.0 / n_touch + 0.5) AS BIGINT))"
           f" / {_ATTR_GRID}.0", 6)} AS linear_credits
FROM touch
GROUP BY event_type
ORDER BY event_type
""",
)
def events_attribution_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch conversion attribution: every purchase credits the
    view/click/signup touches of the same user in the prior 7 days
    under three standard models — first-touch (earliest touch gets the
    conversion), last-touch (latest), and linear (1/n to each of the n
    touches). The marketing-analytics twin of the funnel query above:
    the funnel counts who converts, attribution decides WHICH upstream
    channel gets paid for it.

    Exactness: first/last are row_number picks with the (ts, event_id)
    composite tiebreak; linear fractions 1/n are snapped to the 1e-9
    grid per touch and summed as BIGINTs, divided once at the end — no
    float reassociation. Conversions with zero prior touches earn no
    credit row (orphans are the funnel query's business).

    Plan: the conversion-touch pairing is a (user_id equi, ts range)
    join — the events_asof_join shape — whose fanout is bounded by
    per-user activity in a 7-day window, never |events|^2; the
    per-conversion windows partition by conv_id. One final partial agg
    over 3 keys.

    No reference analogue; extends the SURVEY §2 events family.
    """
    ev = load_table(spark, sf_dir, "events")
    conv = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("conv_ts"),
    )
    touches = ev.where(
        F.col("event_type").isin("view", "click", "signup")
    ).select("user_id", "event_type", "ts", "event_id")
    pair = conv.join(
        touches,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("ts") < F.col("conv_ts"))
        & (
            F.col("ts")
            >= F.col("conv_ts") - F.expr(f"INTERVAL {_ATTR_DAYS} DAYS")
        ),
    )
    wn = Window.partitionBy("conv_id")
    wf = wn.orderBy("ts", "event_id")
    wl = wn.orderBy(F.col("ts").desc(), F.col("event_id").desc())
    touch = pair.select(
        "conv_id",
        "event_type",
        F.count(F.lit(1)).over(wn).alias("n_touch"),
        F.row_number().over(wf).alias("rn_first"),
        F.row_number().over(wl).alias("rn_last"),
    )
    return (
        touch.groupBy("event_type")
        .agg(
            F.sum((F.col("rn_first") == 1).cast("long"))
            .cast("long")
            .alias("first_touch_credits"),
            F.sum((F.col("rn_last") == 1).cast("long"))
            .cast("long")
            .alias("last_touch_credits"),
            quant(
                F.sum(
                    F.floor(F.lit(float(_ATTR_GRID)) / F.col("n_touch") + 0.5).cast(
                        "long"
                    )
                )
                / float(_ATTR_GRID),
                6,
            ).alias("linear_credits"),
        )
        .orderBy("event_type")
    )
