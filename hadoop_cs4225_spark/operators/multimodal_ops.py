"""Registered queries over the multimodal (binary) pipeline (M6).

``media_metadata_stats`` stays in pure built-in expressions (oracle-able
— DuckDB computes the same byte lengths with ``encode``); the
Pandas-UDF feature path (``media_byte_features``) has no SQL equivalent
and registers as a rows-only query; its numeric correctness is pinned by
tests/test_multimodal.py against a Python reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_cs4225_spark.functions.multimodal import (
    extract_media_features,
    media_from_documents,
)
from hadoop_cs4225_spark.functions.numeric import quant, quant_sql
from hadoop_cs4225_spark.registry import register
from hadoop_cs4225_spark.sources.tables import load_table


@register(
    "media_metadata_stats",
    oracle="""
SELECT media_type,
       COUNT(*) AS n_items,
       CAST(SUM(content_len) AS BIGINT) AS total_bytes,
       MAX(CAST(ceil(content_len / 256.0) AS INT)) AS max_frames
FROM (
  SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
              WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
         CAST(octet_length(encode(text)) AS BIGINT) AS content_len
  FROM documents
) m
GROUP BY media_type
ORDER BY media_type
""",
)
def media_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata aggregation over binary payloads (no decode)."""
    docs = load_table(spark, sf_dir, "documents")
    media = media_from_documents(docs)
    return (
        media.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("content_len").alias("total_bytes"),
            F.max(F.ceil(F.col("content_len") / 256.0).cast("int")).alias(
                "max_frames"
            ),
        )
        .orderBy("media_type")
    )


@register(
    "media_frame_chunks",
    oracle="""
-- Byte-based frame oracle: DuckDB 1.0 cannot slice BLOBs, but
-- hex(encode(text)) renders the payload's BYTES as a hex string where
-- character slicing IS byte slicing (2 chars per byte) — so the
-- 8-byte frame head is the 16-hex-char slice at offset 512*f. This
-- holds for arbitrary (non-ASCII) payloads, unlike the former
-- substr(decode(..)) character-sliced oracle.
SELECT doc_id, CAST(g.f AS INT) AS frame_no,
       CAST(least(256, content_len - 256 * g.f) AS INT) AS frame_len,
       substr(hex(encode(text)), 1 + 512 * g.f, 16) AS frame_head_hex
FROM (
  SELECT doc_id, text,
         CAST(octet_length(encode(text)) AS BIGINT) AS content_len
  FROM documents WHERE doc_id <= 20
) m, LATERAL (SELECT unnest(range(0, CAST(ceil(content_len / 256.0) AS BIGINT))) AS f) g
ORDER BY doc_id, frame_no
""",
)
def media_frame_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary payloads: split each blob into 256-byte
    frames (1 row per frame) with per-frame offsets/lengths and the
    frame's leading 8 bytes (hex-rendered, byte-exact cross-engine).

    Pure expressions — ``sequence``+``posexplode`` replicate the row, and
    binary ``substring`` slices the payload; a real video pipeline swaps
    the slice for a Pandas-UDF decoder but keeps this exact exploded
    shape (frame rows partition evenly across executors).
    """
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") <= 20)
    media = media_from_documents(docs)
    frames = media.select(
        "doc_id",
        "content",
        "content_len",
        F.posexplode(
            F.sequence(
                F.lit(0),
                (F.ceil(F.col("content_len") / 256.0) - 1).cast("long"),
            )
        ).alias("frame_no", "f"),
    )
    return (
        frames.select(
            "doc_id",
            F.col("frame_no").cast("int").alias("frame_no"),
            F.least(
                F.lit(256).cast("long"), F.col("content_len") - 256 * F.col("f")
            )
            .cast("int")
            .alias("frame_len"),
            F.hex(F.expr("substring(content, 1 + 256 * f, 8)")).alias(
                "frame_head_hex"
            ),
        )
        .orderBy("doc_id", "frame_no")
    )


@register("media_byte_features")  # Pandas-UDF path: no SQL oracle (rows-only)
def media_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched byte-histogram features via ``mapInPandas``.

    The decode step is the documented stub; the Spark plumbing (schema,
    batch iteration, 1:1 row mapping, array output column) is real.
    """
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") <= 100)
    media = media_from_documents(docs)
    feats = extract_media_features(media)
    return feats.select(
        "doc_id",
        "media_type",
        "content_len",
        "n_frames",
        F.element_at("byte_hist", 8).alias("hist_bin7"),
    ).orderBy("doc_id")


@register("media_byte_features_arrow")  # mapInArrow path: no SQL oracle
def media_byte_features_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`mapInArrow` byte-histogram features — numerically identical to
    `media_byte_features` (pinned in tests/test_multimodal.py) without
    the Arrow->pandas bytes-copy per row."""
    from hadoop_cs4225_spark.functions.multimodal import (
        extract_media_features_arrow,
    )

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") <= 100)
    media = media_from_documents(docs)
    feats = extract_media_features_arrow(media)
    return feats.select(
        "doc_id",
        "media_type",
        "content_len",
        "n_frames",
        F.element_at("byte_hist", 8).alias("hist_bin7"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Round-8 batch 5: content-chunk dedup ratio over binary payloads
# ---------------------------------------------------------------------------

#: Fixed chunk width (bytes of the synthetic UTF-8 payload = chars).
_CHUNK_BYTES = 256


@register(
    "media_chunk_dedup_ratio",
    oracle=f"""
WITH chunks AS (
  SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
              WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
         md5(substr(text, g.i * {_CHUNK_BYTES} + 1, {_CHUNK_BYTES})) AS h
  FROM documents,
       LATERAL (SELECT unnest(range(0,
         CAST(ceil(length(text) / {_CHUNK_BYTES}.0) AS BIGINT))) AS i) g
)
SELECT media_type,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(COUNT(DISTINCT h) AS BIGINT) AS n_unique,
       {quant_sql("1.0 - CAST(COUNT(DISTINCT h) AS DOUBLE) / COUNT(*)", 6)}
         AS dedup_ratio
FROM chunks
GROUP BY media_type
ORDER BY media_type
""",
)
def media_chunk_dedup_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size content-chunk deduplication ratio per media type —
    the STORAGE question behind every multimodal lake ("how much of
    these 100 TB of blobs is literally the same bytes?"): payloads are
    split into 256-byte chunks, chunks are content-hashed, and the
    ratio 1 - unique/total is the fraction a chunk-level store (CDC
    backup, CAS blob store) would not have to keep. Complements the
    DOCUMENT-level exact dedup (``dedup_exact_summary``): chunk grain
    finds sharing across documents that are not wholly identical.

    The synthetic payload is the UTF-8 text (the multimodal module's
    standing contract), so byte offsets equal char offsets and the
    oracle chunks the same text with the same md5. Plan: one map-side
    chunk explode (corpus-linear) into a distinct-count aggregate per
    media type — no joins; a real CDC variant would swap the fixed
    stride for a rolling-hash cut inside the same plan shape.

    No reference analogue; extends the SURVEY §2 multimodal family.
    """
    docs = load_table(spark, sf_dir, "documents")
    n_chunks = F.ceil(F.length("text") / float(_CHUNK_BYTES)).cast("long")
    chunks = docs.select(
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("i"),
        "text",
    ).select(
        "media_type",
        F.md5(
            F.encode(
                F.expr(
                    f"substring(text, i * {_CHUNK_BYTES} + 1, {_CHUNK_BYTES})"
                ),
                "UTF-8",
            )
        ).alias("h"),
    )
    return (
        chunks.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.countDistinct("h").cast("long").alias("n_unique"),
        )
        .select(
            "media_type",
            "n_chunks",
            "n_unique",
            quant(
                1.0 - F.col("n_unique").cast("double") / F.col("n_chunks"), 6
            ).alias("dedup_ratio"),
        )
        .orderBy("media_type")
    )
