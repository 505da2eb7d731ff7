"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The FlowFile shape (SURVEY.md §1.1): ``content BINARY`` + ``attributes
MAP<STRING,STRING>``.  Spark-side plumbing — schema, partitioning, Arrow
batch shape, UDF signatures — is real and tested; the actual media
decoding is STUBBED (image/audio libraries are not in this container):
``decode_image_features`` / ``sample_video_frames`` produce deterministic
fake features derived from the bytes, behind a clearly-marked seam where
PIL/ffmpeg calls would go.

Scale notes: binary payloads ride in parquet/``binaryFile`` columns;
decode runs in ``mapInPandas`` (Arrow-batched, per-partition iterator) so
the 100 TB path is executor-parallel with bounded batch memory
(``spark.sql.execution.arrow.maxRecordsPerBatch``).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "attach_binary_content",
    "identify_mime_type",
    "decode_image_features",
    "sample_video_frames",
]

#: magic-byte prefixes → mime type (IdentifyMimeType analog, §2.3)
_MAGIC = [
    ("89504E47", "image/png"),
    ("FFD8FF", "image/jpeg"),
    ("47494638", "image/gif"),
    ("52494646", "audio/wav-or-avi"),  # RIFF container
    ("494433", "audio/mpeg"),
    ("255044462D", "application/pdf"),
    ("1F8B", "application/gzip"),
]


def attach_binary_content(
    df: DataFrame, source_col: str, attrs: dict[str, str] | None = None
) -> DataFrame:
    """Wrap a column as FlowFile-shaped (content binary, attributes map).

    ``attrs`` are static attribute literals; per-row attributes can be
    merged later with ``map_concat``.
    """
    attr_items: list = []
    for k, v in (attrs or {}).items():
        attr_items.extend([F.lit(k), F.lit(v)])
    return df.withColumns(
        {
            "content": F.col(source_col).cast("binary"),
            "attributes": F.create_map(*attr_items)
            if attr_items
            else F.create_map().cast("map<string,string>"),
        }
    )


def identify_mime_type(
    df: DataFrame, content_col: str = "content", out_col: str = "mime_type"
) -> DataFrame:
    """IdentifyMimeType: sniff magic bytes — pure column expressions
    (hex prefix + CASE), no UDF."""
    prefix = F.hex(F.substring(F.col(content_col), 1, 8))
    expr = F.lit("application/octet-stream")
    for magic, mime in reversed(_MAGIC):
        expr = F.when(prefix.startswith(magic), F.lit(mime)).otherwise(expr)
    return df.withColumn(out_col, expr)


#: output schema of the (stubbed) image feature extractor
IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def _fake_decode(payload: bytes, dim: int) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for image decode + embed.

    REAL IMPLEMENTATION SEAM: replace with PIL.Image.open(BytesIO(payload))
    + a vision encoder.  The fake derives (width, height, features) from
    the sha256 of the bytes so tests are reproducible.
    """
    digest = hashlib.sha256(payload).digest()
    width = 64 + digest[0]
    height = 64 + digest[1]
    features = [((digest[i % 32] / 255.0) * 2 - 1) for i in range(dim)]
    return width, height, features


def decode_image_features(
    df: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "content",
    mime_col: str = "mime_type",
    dim: int = 16,
) -> DataFrame:
    """Decode image bytes → (width, height, feature vector), Arrow-batched.

    ``mapInPandas``: the UDF receives an iterator of pandas batches and
    yields transformed batches — per-partition streaming, bounded memory,
    the NiFi-2.x-Python-processor execution shape (SURVEY.md §2.10).
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r[content_col]) if r[content_col] is not None else b""
                w, h, feats = _fake_decode(payload, dim)
                rows.append(
                    {
                        "doc_id": r[id_col],
                        "mime_type": r.get(mime_col, "application/octet-stream"),
                        "width": w,
                        "height": h,
                        "features": feats,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields])

    cols = [id_col, content_col] + ([mime_col] if mime_col in df.columns else [])
    return df.select(*cols).mapInPandas(decode, IMAGE_FEATURES_SCHEMA)


#: output schema of the (stubbed) video frame sampler — one row per frame
VIDEO_FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("frame_ts_ms", LongType()),
        StructField("frame_bytes", StringType()),  # stub: hex digest, not pixels
    ]
)


def sample_video_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "content",
    every_ms: int = 1000,
    max_frames: int = 4,
) -> DataFrame:
    """Sample frames from video bytes — one output row per sampled frame
    (a one-to-many mapInPandas, the UDTF shape of SURVEY.md §2.10).

    REAL IMPLEMENTATION SEAM: ffmpeg/pyav per batch.  The stub emits
    ``max_frames`` rows per input with deterministic pseudo-frames.
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r[content_col]) if r[content_col] is not None else b""
                digest = hashlib.sha256(payload).hexdigest()
                for i in range(max_frames):
                    rows.append(
                        {
                            "doc_id": r[id_col],
                            "frame_index": i,
                            "frame_ts_ms": i * every_ms,
                            "frame_bytes": f"{digest}:{i}",
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in VIDEO_FRAMES_SCHEMA.fields])

    return df.select(id_col, content_col).mapInPandas(sample, VIDEO_FRAMES_SCHEMA)
