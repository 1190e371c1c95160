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


def audio_chunk_plan(
    df: DataFrame, chunk_seconds: float = 30.0, overlap_seconds: float = 1.0
) -> DataFrame:
    """Chunking plumbing for audio: per row, compute (start, end) sample
    windows from metadata (sample_rate, n_samples in the meta map) — the
    decode/feature UDF then slices exactly those windows. All JVM-side
    sequence arithmetic; exploded to one row per chunk so downstream
    feature extraction parallelizes across chunks, not files (a 10-hour
    recording becomes ~1200 independent tasks instead of one straggler).
    Output: (media_id, chunk_idx, start_sample, end_sample)."""
    sr = F.coalesce(F.element_at("meta", "sample_rate").cast("long"), F.lit(16000))
    n = F.coalesce(F.element_at("meta", "n_samples").cast("long"), F.lit(0))
    step = (sr * F.lit(chunk_seconds) - sr * F.lit(overlap_seconds)).cast("long")
    starts = F.sequence(F.lit(0).cast("long"), F.greatest(n - 1, F.lit(0).cast("long")), F.greatest(step, F.lit(1).cast("long")))
    chunks = F.filter(starts, lambda s: (s < n) | (s == 0))
    return (
        df.where(F.col("kind") == "audio")
        .select(
            "media_id",
            n.alias("n_samples"),
            sr.alias("sample_rate"),
            F.posexplode(chunks).alias("chunk_idx", "start_sample"),
        )
        .select(
            "media_id",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            "start_sample",
            F.least(
                F.col("start_sample") + (F.col("sample_rate") * F.lit(chunk_seconds)).cast("long"),
                F.col("n_samples"),
            ).alias("end_sample"),
        )
    )


def extract_audio_features(df: DataFrame) -> DataFrame:
    """mapInPandas plumbing for per-chunk audio features. The DSP itself
    is STUBBED (no audio libs in this image): emits deterministic
    byte-level statistics of the payload slice standing in for real
    features (a real build swaps the body for librosa/torchaudio without
    touching the Spark plumbing). Output schema and Arrow batch shape are
    the real contract: (media_id, chunk_idx, rms, zero_crossings)."""

    def op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for payload, idx in zip(pdf["payload"], pdf["chunk_idx"]):
                if payload is None:
                    rows.append((None, None))
                    continue
                # deterministic stand-in: mean byte value + byte sign flips
                b = payload[:4096]
                rms = float(sum(b)) / max(len(b), 1)
                zc = sum(1 for i in range(1, len(b)) if (b[i - 1] < 128) != (b[i] < 128))
                rows.append((round(rms, 6), zc))
            out = pd.DataFrame(rows, columns=["rms", "zero_crossings"])
            out.insert(0, "chunk_idx", pdf["chunk_idx"].to_numpy())
            out.insert(0, "media_id", pdf["media_id"].to_numpy())
            yield out

    return df.mapInPandas(
        op, schema="media_id string, chunk_idx int, rms double, zero_crossings long"
    )
