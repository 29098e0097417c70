"""Multimodal (image/audio/video) column plumbing.

Opaque media ride as ``binary`` columns with typed metadata; decode /
feature-extraction / resize / frame-sampling run as Arrow-batched
``mapInPandas`` transforms. Decode kernels are IMPORT-GATED: when
PIL / soundfile are installed (they are not in this container) the real
decoders run and a payload that fails to decode raises loudly; without
them the documented deterministic sha256 stubs run instead. The
Spark-side contract (schemas, batch shapes, partitioning, UDF
signatures) is identical on both paths, so real decoders drop in with
zero plan changes. Video frame EXTRACTION stays a stub either way
(ffmpeg has no import-gated pure-Python stand-in); the 1->N fan-out
contract is real. Pass ``decoder="stub"`` for environment-independent
results (the DuckDB-oracle entries do), ``decoder="real"`` to require
the library, or the default ``"auto"`` to use it when present.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # real image decoding (Pillow) — absent in this container
    from PIL import Image as _PIL_Image
except ImportError:  # pragma: no cover - environment-dependent
    _PIL_Image = None
try:  # real audio decoding (libsndfile) — absent in this container
    import soundfile as _soundfile
except ImportError:  # pragma: no cover - environment-dependent
    _soundfile = None


def _pick_kernel(decoder: str, real, stub, lib, name: str):
    """Resolve the decode kernel once per CALL (so per-batch dispatch is a
    plain function pointer): 'real' demands the library, 'stub' forces the
    deterministic fake, 'auto' uses the library when importable."""
    if decoder == "real":
        if lib is None:
            raise ImportError(
                f"{name} is not installed; decoder='real' requires it "
                "(use decoder='stub' for the deterministic fake)"
            )
        return real
    if decoder == "stub":
        return stub
    if decoder != "auto":
        raise ValueError(f"decoder must be auto|real|stub, got {decoder!r}")
    return real if lib is not None else stub

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
    """STUB decode: deterministic pseudo-image properties from sha256 —
    the documented fallback when Pillow is absent (or decoder='stub')."""
    h = hashlib.sha256(content).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    mean_luma = round(h[2] / 255.0, 4)
    phash = h[:8].hex()
    return width, height, 3, mean_luma, phash


def _real_decode_image(content: bytes) -> tuple[int, int, int, float, str]:
    """Pillow decode: true dimensions/channels, mean luma over the
    grayscale image, and an 8x8 average-hash perceptual hash. Undecodable
    bytes RAISE (PIL.UnidentifiedImageError) — real pixels were expected,
    so fake features would be silent corruption."""
    from io import BytesIO

    from PIL import ImageStat

    img = _PIL_Image.open(BytesIO(bytes(content)))
    width, height = img.size
    n_channels = len(img.getbands())
    gray = img.convert("L")
    mean_luma = round(ImageStat.Stat(gray).mean[0] / 255.0, 4)
    px = list(gray.resize((8, 8)).getdata())
    avg = sum(px) / 64.0
    bits = "".join("1" if p > avg else "0" for p in px)
    phash = f"{int(bits, 2):016x}"
    return width, height, n_channels, mean_luma, phash


def extract_image_features(media: DataFrame, decoder: str = "auto") -> DataFrame:
    """Arrow-batched feature extraction over binary content. Batch shape:
    one pandas frame in, one out; vectorized apply over the bytes column
    (a real decoder would loop the batch through the C library the same
    way — the per-batch loop is NOT per-row Python at the Spark level)."""
    kernel = _pick_kernel(
        decoder, _real_decode_image, _fake_decode, _PIL_Image, "Pillow"
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["content"].map(kernel)
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


def _fake_decode_audio(content: bytes) -> tuple[int, int, float]:
    """STUB audio decode (fallback without libsndfile): duration from hex
    bytes 7-8, sample rate from a fixed palette keyed by byte 9, RMS
    level from byte 10."""
    rates = (8000, 16000, 22050, 44100, 48000)
    h = hashlib.sha256(bytes(content)).digest()
    duration_ms = 500 + (h[6] * 256 + h[7]) % 60000
    sample_rate = rates[h[8] % len(rates)]
    rms = round(h[9] / 255.0, 4)
    return duration_ms, sample_rate, rms


def _real_decode_audio(content: bytes) -> tuple[int, int, float]:
    """soundfile decode: true duration / sample rate / RMS over the
    decoded samples. Undecodable bytes RAISE."""
    from io import BytesIO

    data, rate = _soundfile.read(BytesIO(bytes(content)))
    duration_ms = int(round(len(data) / rate * 1000))
    rms = round(float((data.astype("float64") ** 2).mean() ** 0.5), 4)
    return duration_ms, rate, rms


def extract_audio_features(media: DataFrame, decoder: str = "auto") -> DataFrame:
    """Audio analog of :func:`extract_image_features` — same Arrow-batched
    contract and the same import-gated kernel selection (soundfile when
    installed, sha256 stub otherwise)."""
    kernel = _pick_kernel(
        decoder, _real_decode_audio, _fake_decode_audio, _soundfile, "soundfile"
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                duration_ms, sample_rate, rms = kernel(content)
                rows.append((int(mid), int(duration_ms), int(sample_rate), rms))
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
