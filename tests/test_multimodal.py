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


def _png_bytes(arr, filter_type: int = 0) -> bytes:
    """Stdlib PNG encoder (tests only): H×W gray or H×W×3 RGB uint8 →
    PNG bytes, every scanline carrying ``filter_type`` (0 none, 1 sub,
    2 up, 3 average, 4 paeth) so the fallback decoder's filter
    reconstruction is testable without any codec library."""
    import struct
    import zlib

    import numpy as np

    if arr.ndim == 2:
        ctype, data = 0, arr[:, :, None]
    else:
        ctype, data = 2, arr
    h, w, nch = data.shape
    data = data.astype(np.int32)
    lines = []
    prev = np.zeros((w, nch), dtype=np.int32)
    for y in range(h):
        row = data[y]
        left = np.vstack([np.zeros((1, nch), dtype=np.int32), row[:-1]])
        upleft = np.vstack([np.zeros((1, nch), dtype=np.int32), prev[:-1]])
        if filter_type == 0:
            enc = row
        elif filter_type == 1:
            enc = row - left
        elif filter_type == 2:
            enc = row - prev
        elif filter_type == 3:
            enc = row - (left + prev) // 2
        else:  # paeth
            p = left + prev - upleft
            pa, pb, pc = abs(p - left), abs(p - prev), abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            enc = row - pred
        lines.append(bytes([filter_type]) + (enc & 0xFF).astype("uint8").tobytes())
        prev = row
    raw = b"".join(lines)

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_real_image_decoder_e2e(spark):
    """End-to-end REAL decode through the SAME mapInPandas path the
    fake exercises — Pillow where installed, the stdlib PNG backend
    otherwise (runs everywhere; no skip)."""
    import numpy as np

    from sifts_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        RealImageDecoder,
        extract_image_features,
    )

    def flat_png(w, h, value):
        return _png_bytes(np.full((h, w, 3), value, dtype=np.uint8))

    rows = [
        ("white", "image", "image/png", flat_png(8, 4, 255), None),
        ("black", "image", "image/png", flat_png(3, 5, 0), None),
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


def test_stdlib_backend_guides_to_pillow_on_non_png():
    """Without Pillow, construction succeeds (stdlib PNG backend) and a
    non-PNG payload fails with install guidance; with Pillow the
    backend is pillow and decodes whatever the local install handles."""
    from sifts_spark.operators.multimodal import RealImageDecoder

    dec = RealImageDecoder()
    try:
        import PIL.Image  # noqa: F401

        assert dec.backend == "pillow"
    except ImportError:
        assert dec.backend == "png"
        with pytest.raises(ValueError, match="Pillow"):
            dec(b"\xff\xd8\xff\xe0 definitely a jpeg, not a png")


def _wav_bytes(freq_hz, seconds, sr=16000, amp=0.5, width=2, channels=1):
    """In-memory PCM WAV of a sine tone (stdlib only)."""
    import io
    import math
    import struct
    import wave

    n = int(sr * seconds)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(width)
        w.setframerate(sr)
        frames = bytearray()
        for i in range(n):
            v = amp * math.sin(2 * math.pi * freq_hz * i / sr)
            if width == 2:
                s = struct.pack("<h", int(v * 32767))
            else:
                s = struct.pack("B", int(v * 127) + 128)
            frames.extend(s * channels)
        w.writeframes(bytes(frames))
    return buf.getvalue()


def test_real_audio_decoder_e2e_wav(spark):
    """RealAudioDecoder decodes genuine PCM WAV through the SAME
    mapInPandas path as the fake: exact duration/sample-rate, RMS of a
    sine at amplitude a is a/sqrt(2). The stdlib-wave backend makes
    this REAL decode runnable with zero optional deps; where soundfile
    is installed the decoder prefers it transparently."""
    from sifts_spark.operators.multimodal import (
        RealAudioDecoder,
        extract_audio_features,
    )

    rows = [
        ("tone-a", "audio", "audio/wav", _wav_bytes(440.0, 1.0, sr=16000), None),
        ("tone-b", "audio", "audio/wav", _wav_bytes(220.0, 2.0, sr=8000, amp=0.25), None),
        ("stereo", "audio", "audio/wav", _wav_bytes(330.0, 0.5, sr=22050, channels=2), None),
        ("eightbit", "audio", "audio/wav", _wav_bytes(550.0, 1.5, sr=11025, width=1), None),
        ("nullrow", "audio", "audio/wav", None, None),
    ]
    from sifts_spark.operators.multimodal import MEDIA_SCHEMA

    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {
        r["media_id"]: r
        for r in extract_audio_features(media, decoder=RealAudioDecoder()).collect()
    }
    assert got["tone-a"]["sample_rate"] == 16000
    assert got["tone-a"]["duration_s"] == pytest.approx(1.0)
    assert got["tone-a"]["rms_level"] == pytest.approx(0.5 / 2**0.5, abs=0.01)
    assert got["tone-b"]["sample_rate"] == 8000
    assert got["tone-b"]["duration_s"] == pytest.approx(2.0)
    assert got["tone-b"]["rms_level"] == pytest.approx(0.25 / 2**0.5, abs=0.01)
    assert got["stereo"]["duration_s"] == pytest.approx(0.5)
    assert got["eightbit"]["sample_rate"] == 11025
    assert got["eightbit"]["rms_level"] == pytest.approx(0.5 / 2**0.5, abs=0.02)
    assert got["nullrow"]["duration_s"] is None  # null payload -> null features


def test_real_audio_decoder_soundfile_backend(spark):
    """Where soundfile IS installed, the decoder prefers it and agrees
    with the wave backend on PCM WAV (skips cleanly when absent)."""
    pytest.importorskip("soundfile")
    from sifts_spark.operators.multimodal import RealAudioDecoder

    dec = RealAudioDecoder()
    assert dec.backend == "soundfile"
    dur, sr, rms = dec(_wav_bytes(440.0, 1.0))
    assert (dur, sr) == (1.0, 16000)
    assert rms == pytest.approx(0.5 / 2**0.5, abs=0.01)


# ------------------------------------------- perceptual hashing (pHash)


class TestImagePHash:
    def _media(self, spark, rows):
        return spark.createDataFrame(rows, "media_id string, payload binary")

    def test_fake_hasher_pairs_exact_copies(self, spark):
        from sifts_spark.operators.multimodal import image_phash_pairs

        blob = b"\x89PNGfake-bytes" * 20
        media = self._media(
            spark,
            [("a", blob), ("b", blob), ("c", b"other-payload" * 30), ("d", None)],
        )
        pairs = image_phash_pairs(media, max_hamming=0).collect()
        assert {(r["id_a"], r["id_b"]) for r in pairs} == {("a", "b")}
        assert pairs[0]["hamming"] == 0

    def test_phash_deterministic_and_null_payload(self, spark):
        from sifts_spark.operators.multimodal import image_phash

        media = self._media(spark, [("x", b"abc" * 50), ("y", None)])
        a = sorted(map(tuple, image_phash(media).collect()))
        b = sorted(map(tuple, image_phash(media).collect()))
        assert a == b
        rows = {r["id"]: r for r in image_phash(media).collect()}
        assert rows["y"]["phash_hi"] is None and rows["y"]["phash_lo"] is None
        assert rows["x"]["phash_hi"] is not None

    def test_real_phasher_similar_images_close(self, spark):
        """Runs Pillow-FREE: the stdlib PNG encoder below feeds the
        hasher's stdlib decode backend (or Pillow's, where installed) —
        the audio posture (soundfile → wave) applied to images."""
        import numpy as np

        from sifts_spark.operators.multimodal import (
            RealImagePHasher,
            image_phash_pairs,
        )

        rng = np.random.default_rng(7)
        base = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        tweaked = base.copy()
        tweaked[:4, :4] = 0  # small local edit
        noise = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        media = self._media(
            spark,
            [("orig", _png_bytes(base)), ("tweak", _png_bytes(tweaked)),
             ("noise", _png_bytes(noise))],
        )
        pairs = image_phash_pairs(
            media, hasher=RealImagePHasher(), max_hamming=10
        ).collect()
        found = {(r["id_a"], r["id_b"]) for r in pairs}
        assert ("orig", "tweak") in found        # small edit -> near-dup
        assert ("noise", "orig") not in found and ("noise", "tweak") not in found

    def test_real_phasher_survives_reencode_resize(self, spark):
        """Resize invariance runs Pillow-FREE (stdlib PNG + numpy
        bilinear); the lossy-JPEG leg needs a JPEG codec, so it runs
        only where Pillow is installed (conditional, not a skip)."""
        import numpy as np

        from sifts_spark.operators.multimodal import (
            RealImagePHasher,
            _bilinear_resize,
        )

        rng = np.random.default_rng(3)
        arr = rng.integers(0, 255, (80, 80, 3), dtype=np.uint8)
        big = np.stack(
            [_bilinear_resize(arr[:, :, c].astype("float64"), 120, 120)
             for c in range(3)],
            axis=2,
        ).round().clip(0, 255).astype(np.uint8)

        h = RealImagePHasher()
        a = h(_png_bytes(arr))
        c = h(_png_bytes(big))

        def ham(x, y):
            return bin(x ^ y).count("1")

        assert ham(a, c) <= 10    # resize: structure preserved
        try:
            import io

            from PIL import Image
        except ImportError:
            return
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=90)
        assert ham(a, h(buf.getvalue())) <= 10  # lossy re-encode

    def test_phash_dc_bit_unused(self, spark):
        """ADVICE r6: every hash bit must be informative — the DC
        coefficient (brightness) is excluded, so bit 63 is always 0 and
        two images differing ONLY by a brightness offset collide."""
        import numpy as np

        from sifts_spark.operators.multimodal import RealImagePHasher

        rng = np.random.default_rng(11)
        a = rng.integers(60, 120, (40, 40), dtype=np.uint8)
        b = (a + 80).astype(np.uint8)  # uniform brightness shift
        h = RealImagePHasher()
        ha, hb = h(_png_bytes(a)), h(_png_bytes(b))
        assert ha >> 63 == 0 and hb >> 63 == 0
        assert ha == hb  # AC structure identical -> same hash

    def test_stdlib_png_decode_all_filters(self):
        """The fallback decoder reconstructs every PNG scanline filter
        (0 none, 1 sub, 2 up, 3 average, 4 paeth) — each encoding of
        the same image decodes to identical pixels."""
        import numpy as np

        from sifts_spark.operators.multimodal import _png_to_array

        rng = np.random.default_rng(5)
        img = rng.integers(0, 255, (13, 9, 3), dtype=np.uint8)
        ref = _png_to_array(_png_bytes(img, filter_type=0))
        assert ref.shape == (13, 9, 3) and (ref == img).all()
        for flt in (1, 2, 3, 4):
            got = _png_to_array(_png_bytes(img, filter_type=flt))
            assert (got == ref).all(), f"filter {flt}"
        gray = rng.integers(0, 255, (7, 5), dtype=np.uint8)
        assert (_png_to_array(_png_bytes(gray))[:, :, 0] == gray).all()
