"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side machinery is real and tested — schema, partition-friendly
batch shapes, Arrow-batched `mapInPandas` UDF signatures — while the
actual media decode is STUBBED (no image/audio libraries in this image):
`decode_image_meta` parses a deterministic fake header; a real system
swaps `_decode_one` for PIL/ffmpeg without touching the Spark plumbing.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

_MAGIC = b"FAKEIMG1"


def pack_fake_image(width: int, height: int, channels: int = 3) -> bytes:
    """Deterministic fake media payload: header + zeroed pixel block."""
    return _MAGIC + struct.pack("<III", width, height, channels) + b"\x00" * min(
        width * height * channels, 64
    )


def _decode_one(payload: bytes) -> tuple[int, int, int]:
    """STUB decode: parses the fake header. A real build replaces this
    with PIL.Image.open(io.BytesIO(payload)).size etc."""
    if payload is None or not payload.startswith(_MAGIC):
        raise NotImplementedError(
            "real media decoding is stubbed in this environment; "
            "payload must carry the FAKEIMG1 test header"
        )
    w, h, c = struct.unpack("<III", payload[8:20])
    return w, h, c


def decode_image_meta(df: DataFrame) -> DataFrame:
    """mapInPandas over Arrow batches: payload → (width, height, channels).

    The batch shape is the scale contract: one pandas DataFrame per Arrow
    batch, binary column as bytes objects, output schema fixed. Decode
    failures yield NULL dims (errorStrategy-ignore at row level)."""

    def op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dims = []
            for payload in pdf["payload"]:
                try:
                    dims.append(_decode_one(payload))
                except (NotImplementedError, struct.error):
                    dims.append((None, None, None))
            out = pd.DataFrame(dims, columns=["width", "height", "channels"])
            out.insert(0, "media_id", pdf["media_id"].to_numpy())
            yield out

    return df.mapInPandas(
        op, schema="media_id string, width int, height int, channels int"
    )


def resize_plan(df: DataFrame, target: int = 224) -> DataFrame:
    """Pure-SQL half of a resize pipeline: compute per-row output shapes
    (aspect-preserving) so the binary-touching UDF only transforms, never
    decides. Demonstrates keeping decisions JVM-side."""
    meta = decode_image_meta(df)
    scale = F.least(F.lit(target) / F.col("width"), F.lit(target) / F.col("height"))
    return meta.select(
        "media_id",
        "width",
        "height",
        F.round(F.col("width") * scale).cast("int").alias("out_width"),
        F.round(F.col("height") * scale).cast("int").alias("out_height"),
    )


def frame_sample_plan(df: DataFrame, every_n: int = 30, max_frames: int = 8) -> DataFrame:
    """Frame-sampling plumbing for video: compute the frame index list per
    row from metadata (n_frames in meta map) — the decode UDF would then
    extract exactly those indices. JVM-side sequence arithmetic only."""
    n_frames = F.coalesce(F.element_at("meta", "n_frames").cast("int"), F.lit(0))
    idx = F.slice(
        F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n)),
        1,
        max_frames,
    )
    return df.select("media_id", n_frames.alias("n_frames"), idx.alias("frame_indices"))
