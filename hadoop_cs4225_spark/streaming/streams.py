"""Structured Streaming twins of the batch event-time queries (M5).

Each builder takes a *streaming* DataFrame of events (same schema as the
batch table) and applies identical event-time logic to its batch twin in
``operators/events_windows.py``. DuckDB cannot oracle a stream, so
correctness comes from the twin: replaying the events parquet through
the stream with ``trigger(availableNow=True)`` must reproduce the batch
result (tests/test_streaming.py).

Watermarks bound state: aggregation state for windows older than
(max event time − delay) is dropped, and late rows beyond the watermark
are discarded — that is the knob that keeps state finite on an unbounded
100 TB/day stream. ``foreachBatch`` is the sink adapter for parquet/
upsert targets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_cs4225_spark.functions.numeric import quant
from hadoop_cs4225_spark.session import apply_runtime_confs
from hadoop_cs4225_spark.sources.tables import load_events


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``readStream`` over the events parquet (file-source replay).

    The file source needs an explicit schema; reuse the batch loader's
    (including the ns→µs timestamp conversion — the raw file stores
    TIMESTAMP(NANOS) which arrives as a long under nanosAsLong).
    """
    apply_runtime_confs(spark)
    batch = load_events(spark, sf_dir)
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # The file stream source requires a directory; glob-filter down to
    # the events file inside the sf_dir.
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_type = dict(stream.dtypes).get("ts")
    if ts_type == "bigint":
        # Integer division (see sources/tables.py): `/1000` promotes the
        # ~1.7e18 long to double whose ulp (256ns) shifts ~1.5% of rows.
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # Watermarks require TIMESTAMP (LTZ) [EVENT_TIME_IS_NOT_ON_
        # TIMESTAMP_TYPE]. Session tz is pinned to UTC (session.py), so
        # the NTZ->LTZ cast is value-identical and the batch twins (which
        # keep NTZ) render the same wall-clock strings.
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    # Align column order/types with the batch twin.
    return stream.select(*[F.col(f.name) for f in batch.schema.fields])


def tumbling_counts_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of ``events_tumbling_counts``."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("w_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_avg_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of ``events_sliding_avg``."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            quant(F.round(F.sum("value"), 2) / F.count(F.lit(1)), 6).alias(
                "avg_value"
            ),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("w_start"),
            "n_events",
            "avg_value",
        )
    )


def session_windows_stream(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Streaming twin of ``events_session_windows`` (stateful merge)."""
    return (
        events.where(F.col("user_id") <= 50)
        .withWatermark("ts", "1 hour")
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Streaming exactly-once dedup on event_id within the watermark.

    Uses ``dropDuplicatesWithinWatermark``: state is one entry per
    event_id seen within the watermark delay and is EVICTED as the
    watermark passes. Plain ``dropDuplicates(["event_id"])`` would keep
    key state forever even under a watermark (eviction only applies
    when the event-time column is part of the dedup key) — the classic
    unbounded-state leak on an infinite stream; refuse it at scale.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def enrich_join_stream(spark: SparkSession, events: DataFrame) -> DataFrame:
    """Stream-STATIC join: enrich the event stream with a small static
    dimension (event_type -> category/weight).

    The static side is planned once and broadcast to every micro-batch
    — no state store at all (contrast with ``interval_join_stream``):
    the canonical shape for dimension enrichment at any scale. The dim
    here is an inline VALUES relation; in production it is a Parquet/
    Delta dim table re-read per batch.
    """
    dim = F.broadcast(
        spark.sql(
            "SELECT * FROM VALUES "
            "('click', 'engagement', 1.0D), ('view', 'engagement', 0.5D), "
            "('purchase', 'revenue', 10.0D), ('signup', 'growth', 5.0D), "
            "('error', 'health', 0.0D) AS dim(event_type, category, weight)"
        )
    )
    return (
        events.join(dim, "event_type")
        .withWatermark("ts", "1 hour")
        .groupBy("category")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value") * F.col("weight")), 2).alias(
                "weighted_value"
            ),
        )
    )


def interval_join_stream(events: DataFrame) -> DataFrame:
    """Stream-stream INTERVAL JOIN: errors within 5 minutes after a
    click, per user — the streaming twin of ``events_range_join``
    (joins_advanced.py), same filters and output columns.

    Both sides carry a watermark and the join condition bounds event
    time in BOTH directions, so the state store can expire rows: a
    click is held at most watermark + 5 minutes, an error at most the
    watermark. An unbounded condition would grow state forever — Spark
    rejects it in append mode, and so should any 100 TB design review.
    The shuffle is keyed on user_id on both sides (co-partitioned
    stateful join), exactly like the batch plan.
    """
    clicks = (
        events.where((F.col("event_type") == "click") & (F.col("user_id") <= 50))
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    errors = (
        events.where((F.col("event_type") == "error") & (F.col("user_id") <= 50))
        .select(
            F.col("event_id").alias("error_id"),
            F.col("user_id").alias("e_user"),
            F.col("ts").alias("e_ts"),
        )
        .withWatermark("e_ts", "1 hour")
    )
    return clicks.join(
        errors,
        (F.col("user_id") == F.col("e_user"))
        & (F.col("e_ts") > F.col("c_ts"))
        & (F.col("e_ts") <= F.col("c_ts") + F.expr("INTERVAL 5 MINUTES")),
    ).select(
        "click_id",
        "error_id",
        "user_id",
        (
            F.unix_timestamp(F.col("e_ts").cast("timestamp"))
            - F.unix_timestamp(F.col("c_ts").cast("timestamp"))
        ).alias("secs_between"),
    )


def user_activity_stateful(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``.

    Per-user running activity state (event count + value sum) kept in
    the state store across micro-batches, emitting the updated totals
    for every user seen in a batch. The pattern behind custom
    sessionization/feature accumulation when ``session_window`` /
    built-in aggs can't express the state transition. Arrow-batched:
    state values are plain tuples, rows never cross Py4J row-by-row.

    Not oracle-able (stateful streaming has no SQL twin) — equivalence
    with the batch groupBy is asserted in tests/test_streaming.py.
    """
    import pandas as pd  # local import keeps the module importable sans Arrow

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("total_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [StructField("n", LongType()), StructField("v", DoubleType())]
    )

    def update(key, pdf_iter, state: GroupState):
        n, v = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            v += float(pdf["value"].sum())
        state.update((n, v))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [v]}
        )

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def sessionize_batch(
    ts_sorted: list[int], open_session: tuple[int, int, int] | None, gap_us: int
) -> list[list[int]]:
    """Pure session-merge transition used by :func:`user_sessions_tws`.

    Takes a sorted list of event times (µs), the carried-over open
    session ``(start, last_event, n)`` or None, and returns the merged
    ``[start, last_event, n]`` triples. Same ``[start, last+gap)`` rule
    as ``session_window``: an event exactly at ``last+gap`` starts a new
    session. Unit-testable without a state store (the streaming runtime
    for transformWithState needs protobuf, absent in some containers).
    """
    sessions: list[list[int]] = [list(open_session)] if open_session else []
    for t in ts_sorted:
        if sessions and t - sessions[-1][1] < gap_us:
            sessions[-1][1] = max(sessions[-1][1], t)
            sessions[-1][2] += 1
        else:
            sessions.append([t, t, 1])
    return sessions


def user_sessions_tws(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Sessionization via ``transformWithStateInPandas`` — the Spark 4.x
    arbitrary-state API (StatefulProcessor) succeeding
    ``applyInPandasWithState``.

    Semantics mirror the batch ``events_session_windows`` query: per
    user, events merge into one session while consecutive gaps are
    < ``gap_minutes``; the session window is
    ``[first_event, last_event + gap)``. State = the still-open trailing
    session (start, last-event, count) as a ValueState row, merged with
    the next micro-batch's events; every batch re-emits its affected
    sessions in update mode (the memory-sink harness replays bounded
    input as ONE batch, so the final emission equals the batch result —
    asserted in tests/test_streaming.py).

    Requires the RocksDB state-store provider (transformWithState's
    backing store); the test sets
    ``spark.sql.streaming.stateStore.providerClass``.

    Not oracle-able (no SQL twin of a stateful stream); scale posture:
    one shuffle keyed on user_id, Arrow-batched state transitions,
    state bounded at one open session per user.
    """
    import pandas as pd  # local import keeps the module importable sans Arrow
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    gap_us = gap_minutes * 60 * 1_000_000
    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("session_start", StringType()),
            StructField("session_end", StringType()),
            StructField("n_events", LongType()),
        ]
    )

    def _fmt(us: int) -> str:
        return pd.Timestamp(us, unit="us").strftime("%Y-%m-%d %H:%M:%S")

    class SessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._open = handle.getValueState(
                "open_session", "start BIGINT, last BIGINT, n BIGINT"
            )

        def handleInputRows(self, key, rows, timer_values):
            ts: list[int] = []
            for pdf in rows:
                ts.extend(
                    pdf["ts"].astype("datetime64[us]").astype("int64").tolist()
                )
            ts.sort()
            prev = tuple(self._open.get()) if self._open.exists() else None
            sessions = sessionize_batch(ts, prev, gap_us)
            if not sessions:
                return
            self._open.update(tuple(sessions[-1]))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(sessions),
                    "session_start": [_fmt(s[0]) for s in sessions],
                    "session_end": [_fmt(s[1] + gap_us) for s in sessions],
                    "n_events": [s[2] for s in sessions],
                }
            )

        def close(self) -> None:
            pass

    return (
        events.where(F.col("user_id") <= 50)
        .select("user_id", "ts")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=SessionProcessor(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )
    )


def run_to_memory(
    df: DataFrame, name: str, output_mode: str = "complete"
) -> None:
    """Replay a bounded stream to a memory sink (test/smoke harness)."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    _await_bounded(q, name)


def _await_bounded(q, name: str, timeout_s: int = 120) -> None:
    """Wait for an availableNow replay; a timeout means the sink is only
    partially populated — fail loudly rather than let an equivalence
    test compare against incomplete results."""
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"stream {name!r} still active after {timeout_s}s; sink incomplete"
        )


def run_foreach_batch_parquet(
    df: DataFrame, path: str, checkpoint: str, output_mode: str = "update"
) -> None:
    """Production sink adapter: ``foreachBatch`` appending each
    micro-batch to parquet.

    ``foreachBatch`` hands every micro-batch to ordinary batch-writer
    code — the idiom for sinks Structured Streaming lacks natively
    (upserts, JDBC, dual writes). The checkpoint dir carries offsets, so
    a restarted query resumes exactly-once per batch id.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(path)

    q = (
        df.writeStream.foreachBatch(write_batch)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    _await_bounded(q, f"foreachBatch->{path}")


def _snapshot_versions(root: str, below: int | None = None) -> list[int]:
    """Committed snapshot versions (``v<N>`` dirs) under ``root``,
    optionally only those strictly below a batch id — the sink-side
    source of truth for versioned foreachBatch MERGE sinks (never track
    the previous version in process memory: restart replay and
    crash-written snapshots both break that, see
    ``run_incremental_daily_rollup``)."""
    import os

    if not os.path.isdir(root):
        return []
    out = []
    for d in os.listdir(root):
        if d.startswith("v") and d[1:].isdigit():
            v = int(d[1:])
            if below is None or v < below:
                out.append(v)
    return out


def _guard_incarnation(root: str, batch_id: int) -> None:
    """Refuse to merge when the sink holds a snapshot NEWER than the
    executing batch id: that means a fresh checkpoint was pointed at a
    retained sink (batch ids restarted), and merging would overwrite
    early versions while the final read returns the previous
    incarnation's stale max — silent wrong results either way. (A
    crash-replay of the latest batch legitimately sees v{batch_id}
    itself, never anything newer, so this never fires on real replay.)
    """
    newer = [v for v in _snapshot_versions(root) if v > batch_id]
    if newer:
        raise RuntimeError(
            f"versioned sink {root} already holds v{max(newer)}, newer than "
            f"executing batch {batch_id}: fresh checkpoint over a retained "
            "sink. Clear the sink directory or reuse its original checkpoint."
        )


def _prune_snapshots(root: str, batch_id: int) -> None:
    """Delete snapshots <= batch_id - 2 after v{batch_id} commits.

    Only the latest not-yet-checkpoint-committed batch can ever replay,
    and its merge reads max(v < batch_id) = v{batch_id-1} — so keeping
    the current and previous snapshot is sufficient for crash safety,
    and disk stays O(2 snapshots) instead of O(batches)."""
    import os
    import shutil

    for v in _snapshot_versions(root):
        if v <= batch_id - 2:
            shutil.rmtree(os.path.join(root, f"v{v}"), ignore_errors=True)


def run_incremental_corpus_dedup(
    spark: SparkSession, docs_chunks: str, index_root: str, checkpoint: str
) -> DataFrame:
    """Incremental corpus-level near-dup dedup: each micro-batch of new
    documents is MinHash-signed and admitted to a persistent signature
    INDEX only if its signature is unseen — the streaming ingest shape
    of a training-corpus pipeline (the batch dedup queries re-scan the
    whole corpus; an ingest feed cannot).

    Per batch: (1) signatures via the shared
    :func:`operators.dedup.signature_frame` (one md5 per distinct
    shingle, map-side-combined); (2) within-batch collapse keeps the
    min doc_id per signature; (3) a full-outer merge with the previous
    index snapshot on the signature key (existing signatures absorb the
    batch's arrivals, unseen ones append); (4) the merged index commits
    as snapshot ``v{batch_id}`` (commit-then-swap, previous version
    discovered from the sink — restart-safe and crash-idempotent
    exactly like ``run_incremental_daily_rollup``).

    Scale honesty: signature COMPUTATION scales with the batch, but the
    snapshot model rewrites the full index per batch — O(index) per
    batch, fine while the index rewrites in seconds. At 100 TB the swap
    is mechanical: store the index bucketed on the signature key and
    replace the snapshot write with a MERGE into the bucketed table
    (Delta/Iceberg MERGE, or a per-bucket upsert) so a batch touches
    only the buckets its signatures hash to; the merge ALGEBRA below
    (full-outer on the key, coalesce keeper, sum absorbed counts) is
    exactly what that MERGE states.

    Returns the final index: one row per distinct signature
    ``(mh0..mh3, doc_id, n_dups_absorbed)`` where doc_id is the first
    document that introduced the signature and n_dups_absorbed counts
    later arrivals it suppressed (within-batch and cross-batch).
    """
    import os

    from hadoop_cs4225_spark.operators.dedup import signature_frame

    _SIG = ["mh0", "mh1", "mh2", "mh3"]
    schema = spark.read.parquet(docs_chunks).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_chunks)
    )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        _guard_incarnation(index_root, batch_id)
        batch_counts = signature_frame(batch_df).groupBy(*_SIG).agg(
            F.count(F.lit(1)).alias("n_arrivals"),
            F.min("doc_id").alias("first_doc"),
        )
        prior = _snapshot_versions(index_root, below=batch_id)
        if prior:
            prev = batch_df.sparkSession.read.parquet(
                os.path.join(index_root, f"v{max(prior)}")
            )
            # Full outer on the signature key: an EXISTING signature
            # absorbs all the batch's arrivals for it; an unseen one
            # appends, its first arrival not counted as a duplicate.
            merged = prev.join(batch_counts, _SIG, "full").select(
                *_SIG,
                F.coalesce("doc_id", "first_doc").alias("doc_id"),
                (
                    F.coalesce("n_dups_absorbed", F.lit(0))
                    + F.coalesce("n_arrivals", F.lit(0))
                    - F.when(F.col("doc_id").isNull(), 1).otherwise(0)
                ).alias("n_dups_absorbed"),
            )
        else:
            merged = batch_counts.select(
                *_SIG,
                F.col("first_doc").alias("doc_id"),
                (F.col("n_arrivals") - 1).alias("n_dups_absorbed"),
            )
        merged.write.mode("overwrite").parquet(
            os.path.join(index_root, f"v{batch_id}")
        )
        _prune_snapshots(index_root, batch_id)

    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    _await_bounded(q, "incremental_corpus_dedup")
    versions = _snapshot_versions(index_root)
    if not versions:
        return spark.createDataFrame(
            [],
            "mh0 long, mh1 long, mh2 long, mh3 long, "
            "doc_id long, n_dups_absorbed long",
        )
    return spark.read.parquet(os.path.join(index_root, f"v{max(versions)}"))


def run_incremental_simhash_dedup(
    spark: SparkSession, docs_chunks: str, index_root: str, checkpoint: str
) -> DataFrame:
    """Incremental SimHash FINGERPRINT-index maintenance — the SimHash
    twin of :func:`run_incremental_corpus_dedup` (VERDICT r11 task 7,
    now that ``simhash_band_dup_pairs`` is the batch surface): each
    micro-batch of new documents is fingerprinted with the shared
    :func:`operators.dedup.simhash60_frame` (per-bit majority vote over
    token hash60s — identical definition to the batch band join) and
    admitted to a persistent index keyed on the 60-bit fingerprint.

    Per batch: (1) fingerprints scale with the BATCH (one explode + 60
    partial vote sums, map-side-combined); (2) within-batch collapse
    keeps the min doc_id per fingerprint; (3) full-outer merge with the
    previous snapshot on ``f`` — existing fingerprints absorb arrivals,
    unseen ones append; (4) commit-then-swap as ``v{batch_id}``
    (restart-safe, crash-idempotent; see the MinHash twin's docstring
    for the bucketed-MERGE shape the snapshot swap becomes at 100 TB).

    The batch band join consumes exactly this (doc_id, f) schema: at
    scale the maintained index IS the band join's input, so ingest
    keeps the near-dup surface current without re-fingerprinting the
    corpus. Returns the final index ``(f, doc_id, n_dups_absorbed)``.
    """
    import os

    from hadoop_cs4225_spark.operators.dedup import simhash60_frame

    schema = spark.read.parquet(docs_chunks).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_chunks)
    )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        _guard_incarnation(index_root, batch_id)
        batch_counts = simhash60_frame(batch_df).groupBy("f").agg(
            F.count(F.lit(1)).alias("n_arrivals"),
            F.min("doc_id").alias("first_doc"),
        )
        prior = _snapshot_versions(index_root, below=batch_id)
        if prior:
            prev = batch_df.sparkSession.read.parquet(
                os.path.join(index_root, f"v{max(prior)}")
            )
            merged = prev.join(batch_counts, ["f"], "full").select(
                "f",
                F.coalesce("doc_id", "first_doc").alias("doc_id"),
                (
                    F.coalesce("n_dups_absorbed", F.lit(0))
                    + F.coalesce("n_arrivals", F.lit(0))
                    - F.when(F.col("doc_id").isNull(), 1).otherwise(0)
                ).alias("n_dups_absorbed"),
            )
        else:
            merged = batch_counts.select(
                "f",
                F.col("first_doc").alias("doc_id"),
                (F.col("n_arrivals") - 1).alias("n_dups_absorbed"),
            )
        merged.write.mode("overwrite").parquet(
            os.path.join(index_root, f"v{batch_id}")
        )
        _prune_snapshots(index_root, batch_id)

    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    _await_bounded(q, "incremental_simhash_dedup")
    versions = _snapshot_versions(index_root)
    if not versions:
        return spark.createDataFrame(
            [], "f long, doc_id long, n_dups_absorbed long"
        )
    return spark.read.parquet(os.path.join(index_root, f"v{max(versions)}"))


def run_incremental_shingle_postings(
    spark: SparkSession, docs_chunks: str, index_root: str, checkpoint: str
) -> DataFrame:
    """Incremental maintenance of the SHINGLE-POSTINGS inverted index —
    the streaming twin of :func:`operators.dedup.ensure_shingle_postings`
    (VERDICT r12 task 5: it was the one written layout without one).
    Each micro-batch of NEW documents is shingled with the shared
    :func:`operators.dedup._shingle_sets` (identical definition to the
    batch build) and merged into a persistent two-part snapshot:

    - ``postings/``: one row per (doc, distinct shingle) carrying
      ``doc_id, s, len`` — grows by exactly the batch's rows (append
      algebra: documents are immutable, so prior postings never change);
    - ``df/``: the shingle → document-frequency side table — the df
      RECOUNT touches only the batch's shingles (full-outer merge of
      the previous df with the batch's per-shingle doc counts; untouched
      shingles pass through unchanged).

    Commit-then-swap as ``v{batch_id}`` (previous version discovered
    from the sink — restart-safe, crash-idempotent: a replayed batch
    re-merges against v{batch_id-1}, reproducing the same v{batch_id}).
    Snapshot rewrite is O(index) like the MinHash/SimHash twins; at
    100 TB both parts become bucketed MERGEs (postings bucketed by s,
    df by s) so a batch touches only its buckets — the merge algebra
    below is exactly what that MERGE states.

    The PPJoin rank ``rn`` stored by the batch layout is a DERIVED
    column (row_number over (df, s) per doc): any df change re-ranks
    entire documents, so it is recomputed at read time by consumers
    that need it rather than maintained — the returned frame carries
    ``(doc_id, s, df, len)``, from which one partitioned window
    reproduces the batch layout exactly (pinned in tests).
    """
    import os

    from hadoop_cs4225_spark.operators.dedup import _shingle_sets

    schema = spark.read.parquet(docs_chunks).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_chunks)
    )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        _guard_incarnation(index_root, batch_id)
        sess = batch_df.sparkSession
        batch_posts = _shingle_sets(batch_df).select(
            "doc_id",
            F.size("sh").cast("long").alias("len"),
            F.explode("sh").alias("s"),
        ).select("doc_id", "s", "len")
        # per-shingle df delta: postings are (doc, s)-unique, so a row
        # count per s is the number of batch docs containing s
        batch_dfc = batch_posts.groupBy("s").agg(
            F.count(F.lit(1)).cast("long").alias("d_df")
        )
        prior = _snapshot_versions(index_root, below=batch_id)
        if prior:
            vdir = os.path.join(index_root, f"v{max(prior)}")
            posts_prev = sess.read.parquet(os.path.join(vdir, "postings"))
            df_prev = sess.read.parquet(os.path.join(vdir, "df"))
            posts_new = posts_prev.unionByName(batch_posts)
            df_new = df_prev.join(batch_dfc, ["s"], "full").select(
                "s",
                (
                    F.coalesce("df", F.lit(0)) + F.coalesce("d_df", F.lit(0))
                ).cast("long").alias("df"),
            )
        else:
            posts_new = batch_posts
            df_new = batch_dfc.select("s", F.col("d_df").alias("df"))
        out = os.path.join(index_root, f"v{batch_id}")
        posts_new.write.mode("overwrite").parquet(
            os.path.join(out, "postings")
        )
        df_new.write.mode("overwrite").parquet(os.path.join(out, "df"))
        _prune_snapshots(index_root, batch_id)

    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    _await_bounded(q, "incremental_shingle_postings")
    versions = _snapshot_versions(index_root)
    if not versions:
        return spark.createDataFrame(
            [], "doc_id long, s string, df long, len long"
        )
    vdir = os.path.join(index_root, f"v{max(versions)}")
    posts = spark.read.parquet(os.path.join(vdir, "postings"))
    dfs = spark.read.parquet(os.path.join(vdir, "df"))
    return posts.join(dfs, "s").select("doc_id", "s", "df", "len")


def run_incremental_token_counts(
    spark: SparkSession, docs_chunks: str, index_root: str, checkpoint: str
) -> DataFrame:
    """Incremental maintenance of the TOKEN-COUNT index — the streaming
    twin of :func:`operators.text_analysis.ensure_token_counts` /
    ``ensure_token_df`` (r13 closed the shingle-postings twin gap the
    r12 verdict flagged; this closes the same gap for the r13 token
    layout, the one written index added since). Each micro-batch of NEW
    documents is tokenized with the shared
    :func:`operators.text_analysis._toks` (identical definition to the
    batch build) and merged into a persistent two-part snapshot:

    - ``tf/``: one row per (doc, distinct word) carrying ``doc_id,
      source, word, tf`` — a document's rows are complete within its
      batch (each source row is one immutable document), so the merge
      is a pure append and prior rows never change;
    - ``vocab/``: the ``word -> (df, cf)`` side table — the recount
      touches ONLY the batch's words (full-outer merge of the previous
      vocab with the batch's per-word doc/token counts; untouched words
      pass through unchanged).

    Commit-then-swap as ``v{batch_id}`` (previous version discovered
    from the sink — restart-safe, crash-idempotent: a replayed batch
    re-merges against v{batch_id-1}, reproducing the same
    v{batch_id}). Snapshot rewrite is O(index) like the other twins; at
    100 TB both parts become bucketed MERGEs (tf bucketed by word or
    doc_id per the dominant consumer, vocab by word) so a batch touches
    only its buckets — the merge algebra below is exactly what that
    MERGE states. Returns the joined ``(doc_id, source, word, tf, df,
    cf)`` frame; the batch layouts are its two projections (pinned in
    tests/test_streaming.py).
    """
    import os

    from hadoop_cs4225_spark.operators.text_analysis import _toks

    schema = spark.read.parquet(docs_chunks).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_chunks)
    )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        _guard_incarnation(index_root, batch_id)
        sess = batch_df.sparkSession
        batch_tf = (
            batch_df.select(
                "doc_id", "source", F.explode(_toks()).alias("word")
            )
            .groupBy("doc_id", "source", "word")
            .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        )
        # per-word vocab delta: tf rows are (doc, word)-unique, so the
        # row count per word is the batch's df contribution
        batch_vocab = batch_tf.groupBy("word").agg(
            F.count(F.lit(1)).cast("long").alias("d_df"),
            F.sum("tf").cast("long").alias("d_cf"),
        )
        prior = _snapshot_versions(index_root, below=batch_id)
        if prior:
            vdir = os.path.join(index_root, f"v{max(prior)}")
            tf_prev = sess.read.parquet(os.path.join(vdir, "tf"))
            vocab_prev = sess.read.parquet(os.path.join(vdir, "vocab"))
            tf_new = tf_prev.unionByName(batch_tf)
            vocab_new = vocab_prev.join(batch_vocab, ["word"], "full").select(
                "word",
                (
                    F.coalesce("df", F.lit(0)) + F.coalesce("d_df", F.lit(0))
                ).cast("long").alias("df"),
                (
                    F.coalesce("cf", F.lit(0)) + F.coalesce("d_cf", F.lit(0))
                ).cast("long").alias("cf"),
            )
        else:
            tf_new = batch_tf
            vocab_new = batch_vocab.select(
                "word",
                F.col("d_df").alias("df"),
                F.col("d_cf").alias("cf"),
            )
        out = os.path.join(index_root, f"v{batch_id}")
        tf_new.write.mode("overwrite").parquet(os.path.join(out, "tf"))
        vocab_new.write.mode("overwrite").parquet(os.path.join(out, "vocab"))
        _prune_snapshots(index_root, batch_id)

    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    _await_bounded(q, "incremental_token_counts")
    versions = _snapshot_versions(index_root)
    if not versions:
        return spark.createDataFrame(
            [], "doc_id long, source string, word string, tf long, "
            "df long, cf long"
        )
    vdir = os.path.join(index_root, f"v{max(versions)}")
    tf = spark.read.parquet(os.path.join(vdir, "tf"))
    vocab = spark.read.parquet(os.path.join(vdir, "vocab"))
    return tf.join(vocab, "word").select(
        "doc_id", "source", "word", "tf", "df", "cf"
    )


def run_incremental_winnow_fps(
    spark: SparkSession, docs_chunks: str, index_root: str, checkpoint: str
) -> DataFrame:
    """Incremental maintenance of the WINNOWING fingerprint postings —
    the streaming twin of :func:`operators.dedup.ensure_winnow_fp_index`,
    completing the dedup-index twin family (MinHash, SimHash, shingle
    postings, winnow: every written dedup layout now has one). The
    winnowing map is DOCUMENT-LOCAL (window minima over the doc's own
    shingle hashes), so the merge algebra is the simplest of the twins:
    each micro-batch's ``(doc_id, n_sel, fp)`` rows — computed with the
    shared :func:`operators.dedup._winnow_fp_rows`, identical
    definition to the batch build — are appended; no cross-document
    recount exists to maintain. Commit-then-swap as ``v{batch_id}``
    (restart-safe, crash-idempotent); at 100 TB the snapshot rewrite
    becomes a bucketed-by-``fp`` MERGE so the pair join keeps reading a
    co-partitioned table.
    """
    import os

    from hadoop_cs4225_spark.operators.dedup import _winnow_fp_rows

    schema = spark.read.parquet(docs_chunks).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_chunks)
    )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        _guard_incarnation(index_root, batch_id)
        sess = batch_df.sparkSession
        batch_fps = _winnow_fp_rows(batch_df)
        prior = _snapshot_versions(index_root, below=batch_id)
        if prior:
            vdir = os.path.join(index_root, f"v{max(prior)}")
            fps_prev = sess.read.parquet(os.path.join(vdir, "fps"))
            fps_new = fps_prev.unionByName(batch_fps)
        else:
            fps_new = batch_fps
        out = os.path.join(index_root, f"v{batch_id}")
        fps_new.write.mode("overwrite").parquet(os.path.join(out, "fps"))
        _prune_snapshots(index_root, batch_id)

    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    _await_bounded(q, "incremental_winnow_fps")
    versions = _snapshot_versions(index_root)
    if not versions:
        return spark.createDataFrame([], "doc_id long, n_sel long, fp long")
    vdir = os.path.join(index_root, f"v{max(versions)}")
    return spark.read.parquet(os.path.join(vdir, "fps"))


def run_incremental_ivf_assign(
    spark: SparkSession, emb_chunks: str, index_root: str, checkpoint: str
) -> DataFrame:
    """Incremental IVF index maintenance — the ANN twin of the dedup
    index maintainers (r13: MinHash, SimHash and the shingle postings
    had streaming twins; the IVF layout did not). Each micro-batch of
    NEW embedding vectors is assigned to its nearest coarse centroid
    with the shared :func:`operators.similarity._ivf_assign_col`
    (identical argmax definition to the batch index and the DuckDB
    oracles — frozen centroids, the production regime where the coarse
    quantizer is trained once and reused across ingest), then merged
    into a persistent two-part snapshot:

    - ``postings/``: one row per vector — ``centroid_id, vec_id,
      label`` — grows by exactly the batch's rows (append algebra:
      vectors are immutable, so prior assignments never change);
    - ``lists/``: the per-centroid inverted-list size table; the
      recount touches only the batch's centroids (full-outer merge of
      the previous sizes with the batch's per-centroid counts).

    Commit-then-swap as ``v{batch_id}`` (restart-safe,
    crash-idempotent: a replayed batch re-merges against
    v{batch_id-1}, reproducing the same v{batch_id}). At 100 TB the
    postings part is ``partitionBy(centroid_id)`` appends — a batch
    writes only its touched list directories, queries keep
    DPP-pruning to probed lists (``pq.ensure_ivf_pq_index``'s layout)
    — and the sizes part drives the list-balance audit
    (``ann_index_balance_audit``) without a full index scan.

    Returns the final index ``(centroid_id, vec_id, label, n_list)``.
    """
    import os

    from hadoop_cs4225_spark.operators.similarity import _ivf_assign_col

    schema = spark.read.parquet(emb_chunks).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(emb_chunks)
    )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        _guard_incarnation(index_root, batch_id)
        sess = batch_df.sparkSession
        batch_posts = batch_df.select(
            _ivf_assign_col("embedding").alias("centroid_id"),
            "vec_id",
            "label",
        )
        batch_sizes = batch_posts.groupBy("centroid_id").agg(
            F.count(F.lit(1)).cast("long").alias("d_n")
        )
        prior = _snapshot_versions(index_root, below=batch_id)
        if prior:
            vdir = os.path.join(index_root, f"v{max(prior)}")
            posts_prev = sess.read.parquet(os.path.join(vdir, "postings"))
            sizes_prev = sess.read.parquet(os.path.join(vdir, "lists"))
            posts_new = posts_prev.unionByName(batch_posts)
            sizes_new = sizes_prev.join(
                batch_sizes, ["centroid_id"], "full"
            ).select(
                "centroid_id",
                (
                    F.coalesce("n_list", F.lit(0))
                    + F.coalesce("d_n", F.lit(0))
                ).cast("long").alias("n_list"),
            )
        else:
            posts_new = batch_posts
            sizes_new = batch_sizes.select(
                "centroid_id", F.col("d_n").alias("n_list")
            )
        out = os.path.join(index_root, f"v{batch_id}")
        posts_new.write.mode("overwrite").parquet(
            os.path.join(out, "postings")
        )
        sizes_new.write.mode("overwrite").parquet(os.path.join(out, "lists"))
        _prune_snapshots(index_root, batch_id)

    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    _await_bounded(q, "incremental_ivf_assign")
    versions = _snapshot_versions(index_root)
    if not versions:
        return spark.createDataFrame(
            [], "centroid_id int, vec_id long, label int, n_list long"
        )
    vdir = os.path.join(index_root, f"v{max(versions)}")
    posts = spark.read.parquet(os.path.join(vdir, "postings"))
    sizes = spark.read.parquet(os.path.join(vdir, "lists"))
    return posts.join(sizes, "centroid_id").select(
        "centroid_id", "vec_id", "label", "n_list"
    )


def run_incremental_pq_codes(
    spark: SparkSession, emb_chunks: str, index_root: str, checkpoint: str
) -> DataFrame:
    """Incremental maintenance of the PHYSICAL IVF-PQ index — the
    streaming twin of :func:`operators.pq.ensure_ivf_pq_index`,
    completing the ANN written-layout twins (``run_incremental_
    ivf_assign`` maintains the logical postings + list sizes; this
    maintains the materialized table probes actually scan). Each
    micro-batch of NEW vectors gets its coarse assignment
    (``similarity._ivf_assign_col``) and its ``N_SUB`` PQ codes
    (``pq._code_col``) — the SAME frozen-codebook expressions as the
    batch build and the DuckDB oracles — and is appended; rows are
    vector-local (immutable vectors, frozen quantizers), so no
    cross-row state exists to recount. Each snapshot is written
    ``partitionBy(centroid_id)`` exactly like the batch layout, so a
    probe against the maintained index keeps its dynamic-partition-
    pruned one-directory scan. Commit-then-swap as ``v{batch_id}``
    (restart-safe, crash-idempotent); at 100 TB the rewrite becomes
    per-touched-centroid directory appends — the partition layout
    below is precisely what makes that incremental path possible.
    """
    import os

    from hadoop_cs4225_spark.operators.pq import N_SUB, _code_col
    from hadoop_cs4225_spark.operators.similarity import _ivf_assign_col

    schema = spark.read.parquet(emb_chunks).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(emb_chunks)
    )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        _guard_incarnation(index_root, batch_id)
        sess = batch_df.sparkSession
        batch_rows = batch_df.select(
            "vec_id",
            "label",
            "embedding",
            _ivf_assign_col("embedding").alias("centroid_id"),
            *[_code_col("embedding", m).alias(f"c{m}") for m in range(N_SUB)],
        )
        prior = _snapshot_versions(index_root, below=batch_id)
        if prior:
            vdir = os.path.join(index_root, f"v{max(prior)}")
            rows_new = sess.read.parquet(
                os.path.join(vdir, "codes")
            ).unionByName(batch_rows)
        else:
            rows_new = batch_rows
        out = os.path.join(index_root, f"v{batch_id}")
        (
            rows_new.repartition("centroid_id")
            .write.mode("overwrite")
            .partitionBy("centroid_id")
            .parquet(os.path.join(out, "codes"))
        )
        _prune_snapshots(index_root, batch_id)

    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    _await_bounded(q, "incremental_pq_codes")
    versions = _snapshot_versions(index_root)
    if not versions:
        return spark.createDataFrame(
            [],
            "vec_id long, label int, embedding array<double>, "
            "centroid_id int, "
            + ", ".join(f"c{m} int" for m in range(N_SUB)),
        )
    vdir = os.path.join(index_root, f"v{max(versions)}")
    return spark.read.parquet(os.path.join(vdir, "codes"))


def run_incremental_byte_shingles(
    spark: SparkSession, docs_chunks: str, index_root: str, checkpoint: str
) -> DataFrame:
    """Incremental maintenance of the BYTE-SHINGLE layouts — the
    streaming twin of :func:`operators.multimodal_ops.
    ensure_byte_shingle_sets` / ``ensure_byte_minhash_sigs`` (r14,
    VERDICT r13 task 2: every written layout the optimizer leans on
    must have an incremental maintainer). Both parts are
    DOCUMENT-LOCAL (the set is the doc's own distinct windows; the
    signature is a fold over that set), so the merge algebra is pure
    append: each micro-batch of NEW documents is windowed with the
    shared :func:`_byte_shingle_sets` and signed with the shared
    :func:`_byte_sigs_from_sets` — identical definitions to the batch
    build — and appended to ``sets/`` and ``sigs/``. Commit-then-swap
    as ``v{batch_id}`` (restart-safe, crash-idempotent); at 100 TB the
    snapshot rewrite becomes per-batch file appends (immutable docs,
    no cross-document state). Returns the latest ``sets`` part;
    ``sigs`` sits next to it and is pinned equal to
    ``_byte_sigs_from_sets(sets)`` in tests."""
    import os

    from hadoop_cs4225_spark.operators.multimodal_ops import (
        _byte_shingle_sets,
        _byte_sigs_from_sets,
    )

    schema = spark.read.parquet(docs_chunks).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_chunks)
    )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        _guard_incarnation(index_root, batch_id)
        sess = batch_df.sparkSession
        batch_sets = _byte_shingle_sets(batch_df)
        batch_sigs = _byte_sigs_from_sets(batch_sets)
        prior = _snapshot_versions(index_root, below=batch_id)
        if prior:
            vdir = os.path.join(index_root, f"v{max(prior)}")
            sets_new = sess.read.parquet(
                os.path.join(vdir, "sets")
            ).unionByName(batch_sets)
            sigs_new = sess.read.parquet(
                os.path.join(vdir, "sigs")
            ).unionByName(batch_sigs)
        else:
            sets_new, sigs_new = batch_sets, batch_sigs
        out = os.path.join(index_root, f"v{batch_id}")
        sets_new.write.mode("overwrite").parquet(os.path.join(out, "sets"))
        sigs_new.write.mode("overwrite").parquet(os.path.join(out, "sigs"))
        _prune_snapshots(index_root, batch_id)

    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    _await_bounded(q, "incremental_byte_shingles")
    versions = _snapshot_versions(index_root)
    if not versions:
        return spark.createDataFrame([], "doc_id long, sh array<string>")
    vdir = os.path.join(index_root, f"v{max(versions)}")
    return spark.read.parquet(os.path.join(vdir, "sets"))


def run_incremental_ngram5_postings(
    spark: SparkSession, docs_chunks: str, index_root: str, checkpoint: str
) -> DataFrame:
    """Incremental maintenance of the 5-GRAM POSTINGS index — the
    streaming twin of :func:`operators.text_analysis.
    ensure_ngram5_postings` (r14, VERDICT r13 task 5). Same two-part
    merge algebra as :func:`run_incremental_shingle_postings` (the
    3-gram twin): ``posts/`` rows ``(doc_id, source, sh)`` are
    document-local and append-only; the ``df/`` side table recounts
    only the batch's shingles (full-outer merge; untouched shingles
    pass through). The shared :func:`operators.text_analysis.
    _ngram5_rows` keeps batch and twin on one definition.
    Commit-then-swap as ``v{batch_id}``; returns the joined
    ``(doc_id, source, sh, df)`` frame matching the batch layout."""
    import os

    from hadoop_cs4225_spark.operators.text_analysis import _ngram5_rows

    schema = spark.read.parquet(docs_chunks).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_chunks)
    )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        _guard_incarnation(index_root, batch_id)
        sess = batch_df.sparkSession
        batch_posts = _ngram5_rows(batch_df)
        batch_dfc = batch_posts.groupBy("sh").agg(
            F.count(F.lit(1)).cast("long").alias("d_df")
        )
        prior = _snapshot_versions(index_root, below=batch_id)
        if prior:
            vdir = os.path.join(index_root, f"v{max(prior)}")
            posts_new = sess.read.parquet(
                os.path.join(vdir, "posts")
            ).unionByName(batch_posts)
            df_new = (
                sess.read.parquet(os.path.join(vdir, "df"))
                .join(batch_dfc, ["sh"], "full")
                .select(
                    "sh",
                    (
                        F.coalesce("df", F.lit(0))
                        + F.coalesce("d_df", F.lit(0))
                    ).cast("long").alias("df"),
                )
            )
        else:
            posts_new = batch_posts
            df_new = batch_dfc.select("sh", F.col("d_df").alias("df"))
        out = os.path.join(index_root, f"v{batch_id}")
        posts_new.write.mode("overwrite").parquet(os.path.join(out, "posts"))
        df_new.write.mode("overwrite").parquet(os.path.join(out, "df"))
        _prune_snapshots(index_root, batch_id)

    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    _await_bounded(q, "incremental_ngram5_postings")
    versions = _snapshot_versions(index_root)
    if not versions:
        return spark.createDataFrame(
            [], "doc_id long, source string, sh string, df long"
        )
    vdir = os.path.join(index_root, f"v{max(versions)}")
    posts = spark.read.parquet(os.path.join(vdir, "posts"))
    dfs = spark.read.parquet(os.path.join(vdir, "df"))
    return posts.join(dfs, "sh").select("doc_id", "source", "sh", "df")


def run_incremental_daily_rollup(
    spark: SparkSession, chunks_path: str, out_root: str, checkpoint: str
) -> DataFrame:
    """Incrementally-maintained daily rollup: each micro-batch MERGEs
    its partial (day, event_type) aggregate into the running rollup via
    ``foreachBatch`` — the streaming version of ``events_daily_rollup``.

    Each batch writes a NEW versioned snapshot ``v{batch_id}`` (read
    previous version → union batch partial → re-aggregate → write) —
    commit-then-swap, the isolation discipline table formats (Delta/
    Iceberg) formalize; overwriting a path a running plan still reads
    is how you corrupt a rollup on task retry. Decomposable aggregates
    (COUNT/SUM) make merge = re-aggregation of partials, the same
    algebra as Spark's own partial+final agg. State lives in the SINK
    (the rollup itself), not the stream — so stream-side state is zero
    and no watermark is needed for correctness, only for bounding
    re-merge width under late data at scale.

    Returns the final rollup DataFrame (latest version).
    """
    import os

    schema = spark.read.parquet(chunks_path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(chunks_path)
    )
    if dict(stream.dtypes).get("ts") == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))

    def _versions_on_disk(below: int | None = None) -> list[int]:
        return _snapshot_versions(out_root, below)

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        _guard_incarnation(out_root, batch_id)
        part = batch_df.groupBy(
            F.to_date("ts").alias("day"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        # The previous snapshot is the LATEST version strictly below
        # this batch_id, discovered from the sink itself — never from
        # in-process state. Two failure modes this kills: (a) restart
        # from a checkpoint replays the uncommitted batch N in a fresh
        # process; an in-memory "last version" would start at -1 and
        # the replay would overwrite vN with only its own partial,
        # silently dropping every earlier batch's contribution; (b) if
        # a crashed run already wrote vN before the checkpoint commit,
        # reading max(all versions) would merge vN into itself —
        # double-count. max(v < batch_id) is correct in both: the sink
        # is versioned, so replay overwrites vN idempotently from
        # v(N-1)'s committed state.
        prior = _versions_on_disk(below=batch_id)
        if prior:
            prev = batch_df.sparkSession.read.parquet(
                os.path.join(out_root, f"v{max(prior)}")
            )
            part = prev.unionByName(part)
        merged = part.groupBy("day", "event_type").agg(
            F.sum("n_events").alias("n_events"),
            F.sum("total_value").alias("total_value"),
        )
        merged.write.mode("overwrite").parquet(
            os.path.join(out_root, f"v{batch_id}")
        )
        _prune_snapshots(out_root, batch_id)

    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    _await_bounded(q, "incremental_daily_rollup")
    # No new files this run (e.g. a rerun against a drained source) —
    # fall back to the latest committed snapshot; empty rollup if none.
    versions = _versions_on_disk()
    if not versions:
        return spark.createDataFrame(
            [], "day date, event_type string, n_events bigint, total_value double"
        )
    return spark.read.parquet(os.path.join(out_root, f"v{max(versions)}"))


def cusum_fold(s_scaled: int, devs: list[int]) -> int:
    """Pure one-sided-CUSUM transition: fold ``S = max(0, S + dev)``
    over ordered scaled deviations, starting from carried state.
    Chunk-composable by construction (fold(fold(s, a), b) ==
    fold(s, a+b)) — the property that makes the streaming operator's
    per-micro-batch application equal the batch closed form
    (operators/algo_ops.events_daily_cusum); unit-tested without a
    state store, the ``sessionize_batch`` discipline.
    """
    for d in devs:
        s_scaled = max(0, s_scaled + d)
    return s_scaled


def event_type_cusum_stateful(daily: DataFrame) -> DataFrame:
    """Streaming CUSUM monitor via ``applyInPandasWithState``: carries
    each event type's alarm statistic across micro-batches of (day,
    cnt, k_scaled) rows, emitting the updated S after every batch.
    The streaming twin of the batch ``events_daily_cusum`` — same
    integer-scaled transition, same closed-form result when the full
    day sequence has been replayed in order.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    out_schema = StructType(
        [
            StructField("event_type", StringType()),
            StructField("s_scaled", LongType()),
            StructField("n_days", LongType()),
        ]
    )
    state_schema = StructType(
        [StructField("s", LongType()), StructField("n", LongType())]
    )

    def update(key, pdf_iter, state: GroupState):
        s, n = state.get if state.exists else (0, 0)
        chunks = [pdf for pdf in pdf_iter]
        if chunks:
            pdf = pd.concat(chunks).sort_values("day")
            devs = (
                pdf["cnt"].astype("int64") * 1_000_000
                - pdf["k_scaled"].astype("int64")
            ).tolist()
            s = cusum_fold(int(s), devs)
            n += len(pdf)
        state.update((int(s), int(n)))
        yield pd.DataFrame(
            {"event_type": [key[0]], "s_scaled": [int(s)], "n_days": [int(n)]}
        )

    return (
        daily.select("event_type", "day", "cnt", "k_scaled")
        .groupBy("event_type")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def _countsketch_partial(df: DataFrame) -> DataFrame:
    """Per-batch Count-Sketch cell increments from raw events.

    The sketch is LINEAR in its input (every cell is a signed sum of
    per-key increments), so the per-event partial — each event adds
    sign(user, d) at bucket(user, d) — merges into the running cells by
    plain addition, and the result equals the batch sketch built from
    the final per-user counts (``user_freq_countsketch_audit``'s
    construction). Same d/w/seed geometry as the batch operator, shared
    via the sketches-module constants."""
    from hadoop_cs4225_spark.functions.hashing import hash60_seeded
    from hadoop_cs4225_spark.operators.sketches import (
        _CSK_D,
        _CSK_SEED0,
        _CSK_W,
    )

    parts = []
    for d in range(1, _CSK_D + 1):
        h = hash60_seeded(F.col("user_id").cast("string"), _CSK_SEED0 + d)
        parts.append(
            df.select(
                F.lit(d).alias("d"),
                (h % _CSK_W).alias("bucket"),
                (1 - 2 * F.shiftright(h, 8).bitwiseAND(F.lit(1))).alias(
                    "sign"
                ),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy("d", "bucket").agg(
        F.sum("sign").cast("long").alias("cell")
    )


def run_incremental_countsketch(
    spark: SparkSession, chunks_path: str, out_root: str, checkpoint: str
) -> DataFrame:
    """Incrementally-maintained Count-Sketch: each micro-batch's signed
    cell increments MERGE additively into the running d x w cell table
    via ``foreachBatch`` — the streaming face of
    ``user_freq_countsketch_audit`` and the point of sketches at
    100 TB: state is 768 BIGINT cells however large the stream, the
    merge is addition (commutative + associative, so replay order
    never matters), and the maintained sketch answers frequency
    queries at any moment without reprocessing history.

    Same versioned commit-then-swap sink discipline as
    ``run_incremental_daily_rollup`` (see its docstring for the
    restart/replay reasoning — max(v < batch_id) makes replays
    idempotent).

    Returns the final cell table (d, bucket, cell).
    """
    import os

    schema = spark.read.parquet(chunks_path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(chunks_path)
    )
    if dict(stream.dtypes).get("ts") == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        _guard_incarnation(out_root, batch_id)
        part = _countsketch_partial(batch_df)
        prior = _snapshot_versions(out_root, below=batch_id)
        if prior:
            prev = batch_df.sparkSession.read.parquet(
                os.path.join(out_root, f"v{max(prior)}")
            )
            part = prev.unionByName(part)
        merged = part.groupBy("d", "bucket").agg(
            F.sum("cell").cast("long").alias("cell")
        )
        merged.write.mode("overwrite").parquet(
            os.path.join(out_root, f"v{batch_id}")
        )
        _prune_snapshots(out_root, batch_id)

    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    _await_bounded(q, "incremental_countsketch")
    versions = _snapshot_versions(out_root)
    if not versions:
        return spark.createDataFrame([], "d int, bucket bigint, cell bigint")
    return spark.read.parquet(os.path.join(out_root, f"v{max(versions)}"))
