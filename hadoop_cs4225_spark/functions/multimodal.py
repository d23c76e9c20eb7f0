"""Multimodal (binary) column plumbing (driver-mandated extension, M6).

Images/audio/video are opaque ``binary`` columns with typed metadata.
The container has no image/audio libraries, so the *decode* step is
stubbed (clearly marked), while everything Spark-side is real and
tested: schema, Arrow-batched Pandas UDF signatures, ``mapInPandas``
batch shapes, and partitioning.

Pipeline shape at 100 TB: binaries live in Parquet (or object-store
pointers for >2 GB payloads) partitioned by media_type/date; decode +
feature-extraction runs as ``mapInPandas`` over Arrow batches — one
Python worker per core, zero per-row Py4J crossings; downstream
features are plain columns for the relational/similarity operators.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Schema of the synthesized media table (binary payload + metadata).
MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("content", BinaryType()),
        StructField("content_len", LongType()),
    ]
)

#: Output schema of the byte-histogram feature extractor.
FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("content_len", LongType()),
        StructField("byte_hist", ArrayType(IntegerType())),
        StructField("n_frames", IntegerType()),
    ]
)

#: Fake frame size for the frame-sampling stub (bytes per "frame").
FRAME_BYTES = 256


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize a deterministic media table from ``documents``.

    Stands in for a real image/audio source: payload = UTF-8 bytes of
    the text, media_type derived from doc_id. The point is the column
    TYPES (binary + metadata), not the payload content.
    """
    media_type = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    content = F.encode("text", "UTF-8")
    return docs.select(
        "doc_id",
        media_type.alias("media_type"),
        content.alias("content"),
        F.length(content).cast("long").alias("content_len"),
    )


def decode_media(payload: bytes, media_type: str) -> bytes:
    """STUB — real decode (PIL/librosa/av) is unavailable in this
    container. Gate: succeed deterministically for the fake payloads,
    raise for anything that looks like real media."""
    if payload[:4] in (b"\x89PNG", b"\xff\xd8\xff\xe0", b"RIFF"):
        raise NotImplementedError(
            "real image/audio decode requires PIL/librosa (not installed); "
            "plug the decoder in here"
        )
    return payload  # deterministic fake: identity "decode"


def extract_media_features(media: DataFrame, n_bins: int = 16) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas``: each Arrow batch arrives as a pandas DataFrame;
    output rows = input rows (1:1 feature extraction). byte_hist is a
    16-bin histogram of payload bytes; n_frames simulates frame
    sampling (ceil(len / FRAME_BYTES)).
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                decode_media(p, t)
                for p, t in zip(pdf["content"], pdf["media_type"])
            ]
            hists = []
            for p in payloads:
                hist = [0] * n_bins
                for b in p:
                    hist[b * n_bins // 256] += 1
                hists.append(hist)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "content_len": pdf["content_len"],
                    "byte_hist": hists,
                    "n_frames": [
                        -(-len(p) // FRAME_BYTES) for p in payloads
                    ],
                }
            )

    return media.mapInPandas(_extract, schema=FEATURES_SCHEMA)


def extract_media_features_arrow(media: DataFrame, n_bins: int = 16) -> DataFrame:
    """``mapInArrow`` twin of :func:`extract_media_features` — the last
    of Spark's Arrow execution modes (pandas_udf / applyInPandas /
    mapInPandas / applyInPandasWithState / UDTF are covered elsewhere).

    Operating on raw ``pyarrow.RecordBatch`` skips the Arrow->pandas
    conversion entirely — for binary payloads that conversion is a
    per-row Python ``bytes`` copy, so the Arrow path is the one to use
    when the per-batch kernel is already numpy/pyarrow-vectorized (here:
    ``np.bincount`` over a zero-copy ``frombuffer`` view).
    """
    import numpy as np
    import pyarrow as pa

    out_schema = pa.schema(
        [
            pa.field("doc_id", pa.int64()),
            pa.field("media_type", pa.string()),
            pa.field("content_len", pa.int64()),
            pa.field("byte_hist", pa.list_(pa.int32())),
            pa.field("n_frames", pa.int32()),
        ]
    )

    def _extract(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            d = batch.to_pydict()
            payloads = [
                decode_media(p, t) for p, t in zip(d["content"], d["media_type"])
            ]
            hists = [
                np.bincount(
                    (np.frombuffer(p, dtype=np.uint8).astype(np.int64) * n_bins)
                    // 256,
                    minlength=n_bins,
                )
                .astype(np.int32)
                .tolist()
                for p in payloads
            ]
            yield pa.RecordBatch.from_pydict(
                {
                    "doc_id": d["doc_id"],
                    "media_type": d["media_type"],
                    "content_len": d["content_len"],
                    "byte_hist": hists,
                    "n_frames": [-(-len(p) // FRAME_BYTES) for p in payloads],
                },
                schema=out_schema,
            )

    return media.mapInArrow(_extract, schema=FEATURES_SCHEMA)
