"""Multimodal decode kernels: import-gated real decoders (PIL/soundfile)
with the deterministic sha256 stubs as documented fallback. The stub path
is oracle-gated (testdata_queries pins decoder='stub'); the real-decoder
goldens here run whenever the libraries are installed and skip otherwise
(they are absent in this container)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from r2s2_spark.operators import multimodal as mm


def _media(spark, rows):
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA)


def test_stub_image_features_deterministic(spark):
    content = b"not really a png"
    media = _media(spark, [(1, "image", content, "{}")])
    r = mm.extract_image_features(media, decoder="stub").collect()[0]
    h = hashlib.sha256(content).digest()
    assert (r.width, r.height, r.n_channels) == (64 + h[0] % 192, 64 + h[1] % 192, 3)
    assert r.phash == h[:8].hex()


def test_decoder_selection_contract(spark):
    media = _media(spark, [(1, "image", b"x", "{}")])
    with pytest.raises(ValueError, match="auto\\|real\\|stub"):
        mm.extract_image_features(media, decoder="bogus")
    if mm._PIL_Image is None:
        # without Pillow: 'real' is a NAMED import error, never a silent
        # fake; 'auto' falls back to the stub
        with pytest.raises(ImportError, match="Pillow"):
            mm.extract_image_features(media, decoder="real")
        auto = mm.extract_image_features(media, decoder="auto").collect()
        stub = mm.extract_image_features(media, decoder="stub").collect()
        assert auto == stub
    if mm._soundfile is None:
        with pytest.raises(ImportError, match="soundfile"):
            mm.extract_audio_features(media, decoder="real")


@pytest.mark.skipif(mm._PIL_Image is None, reason="Pillow not installed")
def test_real_image_decode_golden(spark):
    """Runs only where Pillow exists: a synthesized 20x10 half-black /
    half-white RGB PNG decodes to its true dimensions and mean luma."""
    from io import BytesIO

    img = mm._PIL_Image.new("RGB", (20, 10))
    for x in range(20):
        for y in range(10):
            img.putpixel((x, y), (255, 255, 255) if x < 10 else (0, 0, 0))
    buf = BytesIO()
    img.save(buf, format="PNG")
    media = _media(spark, [(7, "image", buf.getvalue(), "{}")])
    r = mm.extract_image_features(media, decoder="real").collect()[0]
    assert (r.width, r.height, r.n_channels) == (20, 10, 3)
    assert abs(r.mean_luma - 0.5) < 0.01
    assert len(r.phash) == 16
    # undecodable bytes RAISE on the real path (no silent fake features)
    bad = _media(spark, [(8, "image", b"junk", "{}")])
    with pytest.raises(Exception):
        mm.extract_image_features(bad, decoder="real").collect()


@pytest.mark.skipif(mm._soundfile is None, reason="soundfile not installed")
def test_real_audio_decode_golden(spark):
    """Runs only where soundfile exists: a stdlib-written 0.5 s 16 kHz
    mono PCM16 WAV decodes to its true duration/rate and a plausible
    RMS."""
    import math
    import struct
    import wave
    from io import BytesIO

    rate, secs, freq = 16000, 0.5, 440.0
    buf = BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        n = int(rate * secs)
        frames = b"".join(
            struct.pack(
                "<h", int(0.5 * 32767 * math.sin(2 * math.pi * freq * i / rate))
            )
            for i in range(n)
        )
        w.writeframes(frames)
    media = _media(spark, [(9, "audio", buf.getvalue(), "{}")])
    r = mm.extract_audio_features(media, decoder="real").collect()[0]
    assert r.duration_ms == 500 and r.sample_rate == rate
    # RMS of a 0.5-amplitude sine is 0.5/sqrt(2) ~ 0.3536
    assert abs(r.rms_level - 0.3536) < 0.01


def test_frame_sample_fanout(spark):
    media = _media(spark, [(1, "video", b"clip-bytes", "{}")])
    rows = mm.sample_frames(media, every_n=3, max_frames=4).collect()
    h = hashlib.sha256(b"clip-bytes").hexdigest()
    assert [(r.frame_no, r.frame_sha) for r in sorted(rows, key=lambda r: r.frame_no)] == [
        (i * 3, h[i * 8 : i * 8 + 8]) for i in range(4)
    ]


def test_media_table_schema(spark):
    docs = spark.createDataFrame(
        [(1, "hello world")], "doc_id bigint, text string"
    )
    media = mm.make_media_table(docs)
    assert [f.name for f in media.schema.fields] == [
        "media_id", "kind", "content", "meta"
    ]
    assert media.schema["content"].dataType.simpleString() == "binary"
    r = media.collect()[0]
    assert bytes(r.content) == b"hello world" and r.kind == "image"
