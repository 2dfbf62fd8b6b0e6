"""Multimodal column plumbing: images/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

The decode/feature kernels are STUBS (the image/audio libraries are not
in this container — see _decode_image_bytes), but the Spark-side
contract is real and tested: schemas, batch iteration, partition-size
control, and the UDF signatures match what a production pipeline needs.
At 100 TB the binary column dominates I/O; the operators below only
touch (id, media, meta) columns so parquet column pruning keeps
unrelated scans cheap, and mapInPandas streams Arrow batches without
materializing a partition in memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),        # image | audio | video
        StructField("media", BinaryType()),       # opaque encoded bytes
        StructField("mime", StringType()),
        StructField("meta", StringType()),        # JSON metadata
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def _decode_image_bytes(data: bytes) -> tuple[int, int, list[float]]:
    """STUB decode kernel. A real deployment plugs PIL/libvips here.

    Deterministic fake: 'dimensions' derived from the byte length and a
    16-dim byte-histogram feature, so the plumbing is testable without
    image libraries.
    """
    if data is None:
        raise ValueError("empty media payload")
    n = len(data)
    width, height = (n % 640) + 1, (n % 480) + 1
    hist = [0.0] * 16
    for b in data[:4096]:
        hist[b >> 4] += 1.0
    total = sum(hist) or 1.0
    return width, height, [h / total for h in hist]


def extract_image_features(media: DataFrame, batch_hint: int = 0) -> DataFrame:
    """media(media_id, media, ...) -> (media_id, width, height, feature).

    mapInPandas streams Arrow record batches; each batch decodes
    independently (CPU-bound — at scale, repartition so one task's
    batches fit executor memory alongside the decode workspace).
    """
    cols = media.select("media_id", "media")
    if batch_hint:
        cols = cols.repartition(batch_hint)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "feature": []}
            for mid, blob in zip(pdf["media_id"], pdf["media"]):
                w, h, feat = _decode_image_bytes(bytes(blob))
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["feature"].append(feat)
            yield pd.DataFrame(out)

    return cols.mapInPandas(decode, IMAGE_FEATURES_SCHEMA)


FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_no", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(media: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """Video 'frame sampling' stub: emits one pseudo-frame per
    ``every_n_bytes`` chunk of the payload. Real impl: pyav/ffmpeg keyframe
    extraction with the same (media_id, frame_no, frame) contract."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_no": [], "frame": []}
            for mid, blob in zip(pdf["media_id"], pdf["media"]):
                data = bytes(blob)
                for i in range(0, max(len(data), 1), every_n_bytes):
                    out["media_id"].append(mid)
                    out["frame_no"].append(i // every_n_bytes)
                    out["frame"].append(data[i : i + every_n_bytes])
            yield pd.DataFrame(out)

    return media.select("media_id", "media").mapInPandas(sample, FRAME_SAMPLE_SCHEMA)


def media_table_from_docs(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build a synthetic media table from document text bytes (test
    fixture — exercises the binary plumbing without real media files)."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col(text_col), "UTF-8").cast("binary").alias("media"),
        F.lit("application/octet-stream").alias("mime"),
        F.to_json(F.struct(F.length(F.col(text_col)).alias("orig_len"))).alias("meta"),
    )
