"""Multimodal column plumbing tests (decode stubbed, pipeline real)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from sifts_spark.operators.multimodal import (
    FakeImageDecoder,
    MEDIA_SCHEMA,
    RealImageDecoder,
    extract_image_features,
    sample_video_frames,
)


def _media_df(spark, n=20, kind="image"):
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * 10
        meta = {"duration_s": str(float(i % 5 + 1))} if kind == "video" else {}
        rows.append((f"m{i}", kind, f"{kind}/fake", bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_image_features_batch_shape(spark):
    media = _media_df(spark, 20)
    feats = extract_image_features(media)
    rows = feats.collect()
    assert len(rows) == 20
    by_id = {r["media_id"]: r for r in rows}
    # deterministic fake: same payload -> same features, valid ranges
    assert by_id["m0"]["n_bytes"] == 320
    assert 16 <= by_id["m0"]["width"] <= 255
    assert 16 <= by_id["m0"]["height"] <= 255
    assert 0.0 <= by_id["m0"]["mean_luma"] <= 1.0
    # sha256 matches driver-side recomputation
    payload = hashlib.sha256(b"media-0").digest() * 10
    assert by_id["m0"]["sha256"] == hashlib.sha256(payload).hexdigest()


def test_image_features_null_payload(spark):
    media = spark.createDataFrame(
        [("x", "image", None, None, None)], MEDIA_SCHEMA
    )
    rows = extract_image_features(media).collect()
    assert rows[0]["n_bytes"] is None
    assert rows[0]["sha256"] is None


def test_image_features_partitioned(spark):
    """The mapInPandas path must behave identically across partitionings."""
    media = _media_df(spark, 50)
    one = {r["media_id"]: r["sha256"] for r in extract_image_features(media.coalesce(1)).collect()}
    many = {r["media_id"]: r["sha256"] for r in extract_image_features(media.repartition(8)).collect()}
    assert one == many




def test_video_frame_sampling(spark):
    media = _media_df(spark, 10, kind="video")
    frames = sample_video_frames(media, every_n_seconds=1.0)
    counts = {
        r["media_id"]: r["n"]
        for r in frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # duration i%5+1 seconds -> that many sampled frames
    for i in range(10):
        assert counts[f"m{i}"] == i % 5 + 1
    row = frames.filter((F.col("media_id") == "m3") & (F.col("frame_ts") == 1.0)).first()
    assert isinstance(row["frame_payload"], (bytes, bytearray))


def test_audio_features_deterministic(spark):
    from sifts_spark.operators.multimodal import (
        FakeAudioDecoder,
        extract_audio_features,
    )

    media = _media_df(spark, 15, kind="audio")
    rows = extract_audio_features(media).collect()
    assert len(rows) == 15
    by_id = {r["media_id"]: r for r in rows}
    payload = hashlib.sha256(b"media-3").digest() * 10
    dur, sr, rms = FakeAudioDecoder()(payload)
    got = by_id["m3"]
    assert (got["duration_s"], got["sample_rate"], got["rms_level"]) == (dur, sr, rms)
    assert 0.5 <= got["duration_s"] <= 300.0
    assert got["sample_rate"] in (8000, 16000, 22050, 44100, 48000)


def test_real_image_decoder_e2e_with_pillow(spark):
    """End-to-end Pillow decode through the SAME mapInPandas path the
    fake exercises — runs only where Pillow is installed (it is an
    optional dependency; this container may not have it)."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    from sifts_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        RealImageDecoder,
        extract_image_features,
    )

    def png(w, h, color):
        buf = io.BytesIO()
        PIL_Image.new("RGB", (w, h), color).save(buf, format="PNG")
        return buf.getvalue()

    rows = [
        ("white", "image", "image/png", png(8, 4, (255, 255, 255)), None),
        ("black", "image", "image/png", png(3, 5, (0, 0, 0)), None),
        ("nopayload", "image", "image/png", None, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {
        r["media_id"]: r
        for r in extract_image_features(media, decoder=RealImageDecoder()).collect()
    }
    assert (got["white"]["width"], got["white"]["height"]) == (8, 4)
    assert got["white"]["mean_luma"] == 1.0
    assert (got["black"]["width"], got["black"]["height"]) == (3, 5)
    assert got["black"]["mean_luma"] == 0.0
    assert got["nopayload"]["width"] is None


def test_real_image_decoder_fails_fast_without_pillow():
    """Without Pillow the decoder must fail at CONSTRUCTION (driver-
    side) with install guidance — not per-task on executors."""
    try:
        import PIL.Image  # noqa: F401
        pytest.skip("Pillow installed here; the guidance path is for when it is not")
    except ImportError:
        pass
    from sifts_spark.operators.multimodal import RealImageDecoder

    with pytest.raises(ImportError, match="Pillow"):
        RealImageDecoder()
