"""Multimodal (image/audio/video) column plumbing.

Opaque media ride as ``binary`` columns with typed metadata; decode /
feature-extraction / resize / frame-sampling run as Arrow-batched
``mapInPandas`` transforms. The decode kernels themselves are STUBS here
(no PIL/ffmpeg in this container — deterministic fakes derived from the
content hash, clearly marked), but the Spark-side contract is real and
tested: schemas, batch shapes, partitioning, and the UDF signatures are
exactly what a real decoder drops into.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "media_id bigint, kind string, content binary, meta string"

IMAGE_FEATURES_SCHEMA = (
    "media_id bigint, width int, height int, n_channels int, "
    "mean_luma double, phash string"
)

FRAME_SAMPLE_SCHEMA = "media_id bigint, frame_no int, frame_sha string"

AUDIO_FEATURES_SCHEMA = (
    "media_id bigint, duration_ms bigint, sample_rate int, rms_level double"
)


def make_media_table(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Derive a deterministic media table from documents: the text bytes
    stand in for encoded image data (binary column semantics are real)."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.to_json(F.struct(F.length(text_col).alias("n_bytes"))).alias("meta"),
    )


def _fake_decode(content: bytes) -> tuple[int, int, int, float, str]:
    """STUB decode: deterministic pseudo-image properties from sha256.
    A real implementation calls PIL.Image.open(BytesIO(content)) here —
    raise if someone expects real pixels."""
    h = hashlib.sha256(content).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    mean_luma = round(h[2] / 255.0, 4)
    phash = h[:8].hex()
    return width, height, 3, mean_luma, phash


def extract_image_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary content. Batch shape:
    one pandas frame in, one out; vectorized apply over the bytes column
    (a real decoder would loop the batch through the C library the same
    way — the per-batch loop is NOT per-row Python at the Spark level)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["content"].map(_fake_decode)
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": feats.map(lambda t: t[0]),
                    "height": feats.map(lambda t: t[1]),
                    "n_channels": feats.map(lambda t: t[2]),
                    "mean_luma": feats.map(lambda t: t[3]),
                    "phash": feats.map(lambda t: t[4]),
                }
            )
            yield out

    return media.where(F.col("kind") == "image").mapInPandas(
        fn, schema=IMAGE_FEATURES_SCHEMA
    )


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Audio analog of :func:`extract_image_features` — same Arrow-batched
    contract; the decode kernel is a deterministic sha256-derived STUB
    (a real one calls soundfile/librosa over the bytes): duration from
    hex bytes 7-8, sample rate from a fixed palette keyed by byte 9,
    RMS level from byte 10."""
    rates = (8000, 16000, 22050, 44100, 48000)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                h = hashlib.sha256(bytes(content)).digest()
                duration_ms = 500 + (h[6] * 256 + h[7]) % 60000
                sample_rate = rates[h[8] % len(rates)]
                rms = round(h[9] / 255.0, 4)
                rows.append((int(mid), duration_ms, sample_rate, rms))
            yield pd.DataFrame(
                rows, columns=["media_id", "duration_ms", "sample_rate", "rms_level"]
            )

    return media.mapInPandas(fn, schema=AUDIO_FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 3, max_frames: int = 4) -> DataFrame:
    """Frame sampling contract for video: 1 row in -> N frame rows out
    (mapInPandas as a UDTF). Frames are stubbed as sha slices of content."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                h = hashlib.sha256(bytes(content)).hexdigest()
                for i in range(max_frames):
                    rows.append((int(mid), i * every_n, h[i * 8 : i * 8 + 8]))
            yield pd.DataFrame(rows, columns=["media_id", "frame_no", "frame_sha"])

    return media.mapInPandas(fn, schema=FRAME_SAMPLE_SCHEMA)
