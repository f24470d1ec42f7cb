"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Training-data pipelines carry media as ``BINARY`` columns beside typed
metadata; decode/feature-extraction runs as Arrow-batched pandas
iterators (``mapInPandas``) so the heavy per-item Python work streams
through executors batch-by-batch without materializing a partition.

Codecs are OPTIONAL dependencies: ``RealImageDecoder`` decodes with
Pillow when it is installed (import-guarded with a fail-fast message
when not); ``RealAudioDecoder`` decodes with soundfile when installed
and falls back to the stdlib ``wave`` module (real PCM-WAV decode with
zero extra dependencies); video frame extraction (ffmpeg) remains
stubbed. ``FakeImageDecoder`` / ``FakeAudioDecoder`` are deterministic
stand-ins so the Spark-side plumbing — schema, batch iteration,
partition sizing, UDF signatures — is real and fully tested in any
environment, and doubles as the oracle twin for the correctness gate
(a real codec's output is not SQL-replayable).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Media row schema: the binary payload plus typed sidecar metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha256", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_luma", T.DoubleType(), True),
    ]
)

Decoder = Callable[[bytes], tuple[int, int, float]]


class RealImageDecoder:
    """Pillow-backed decoder: bytes → (width, height, mean_luma∈[0,1]).

    Optional dependency: constructing fails fast DRIVER-SIDE with
    install guidance when Pillow is absent, instead of erroring one
    task at a time on executors. The module is imported inside
    ``__call__`` (not stored on ``self``) so the decoder pickles
    cleanly to executors, which re-import Pillow locally — the standard
    shipping shape for a Python-dependency-bearing UDF."""

    def __init__(self) -> None:
        try:
            import PIL.Image  # noqa: F401  (driver-side fail-fast probe)
        except ImportError as e:
            raise ImportError(
                "RealImageDecoder requires Pillow (`pip install Pillow` "
                "on driver AND executors); without image codecs use "
                "FakeImageDecoder (deterministic plumbing twin) or "
                "inject your own decoder callable"
            ) from e

    def __call__(self, payload: bytes) -> tuple[int, int, float]:
        import io

        from PIL import Image

        with Image.open(io.BytesIO(payload)) as img:
            width, height = img.size
            # 8-bit grayscale histogram → mean luma, normalized to [0,1]
            hist = img.convert("L").histogram()
        total = sum(hist)
        mean_luma = (
            sum(i * c for i, c in enumerate(hist)) / (total * 255.0)
            if total
            else 0.0
        )
        return width, height, round(mean_luma, 6)


class FakeImageDecoder:
    """Deterministic stand-in: dimensions and luma derived from the
    payload's sha256 — stable across runs/engines, exercising the full
    batch path with realistic value shapes."""

    def __call__(self, payload: bytes) -> tuple[int, int, float]:
        h = hashlib.sha256(payload).digest()
        width = 16 + h[0] % 240
        height = 16 + h[1] % 240
        mean_luma = round(h[2] / 255.0, 6)
        return width, height, mean_luma


def extract_image_features(
    media: DataFrame,
    decoder: Decoder | None = None,
    batch_hint_mb: int = 64,
) -> DataFrame:
    """media rows → per-image features via Arrow-batched mapInPandas.

    Scale shape: narrow map over the media table — no shuffle; Spark
    sizes input splits by ``spark.sql.files.maxPartitionBytes`` so each
    task holds ~one Arrow batch of payloads in memory (binary columns
    dominate; keep maxPartitionBytes well under per-task memory when
    payloads are large). Column pruning keeps non-selected media columns
    out of the Arrow transfer.
    """
    dec = decoder or FakeImageDecoder()

    def process(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    rows.append((media_id, None, None, None, None, None))
                    continue
                data = bytes(payload)
                w, h, luma = dec(data)
                rows.append(
                    (
                        media_id,
                        len(data),
                        hashlib.sha256(data).hexdigest(),
                        w,
                        h,
                        luma,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "n_bytes",
                    "sha256",
                    "width",
                    "height",
                    "mean_luma",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        process, IMAGE_FEATURES_SCHEMA
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha256", T.StringType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("rms_level", T.DoubleType(), True),
    ]
)


class RealAudioDecoder:
    """Real audio decoding: bytes → (duration_s, sample_rate,
    rms_level∈[0,1]).

    Backend selection, probed DRIVER-side at construction (fail fast
    with install guidance, not one executor task at a time — same
    posture as :class:`RealImageDecoder`):

    * ``soundfile`` when importable — wav/flac/ogg and whatever the
      local libsndfile handles;
    * otherwise the stdlib ``wave`` module — PCM WAV only, zero extra
      dependencies (so this decoder is REAL even in minimal containers).

    Modules are imported inside ``__call__`` (only the backend NAME is
    stored on ``self``) so the decoder pickles cleanly to executors,
    which re-import locally — the standard shipping shape for a
    dependency-bearing UDF. RMS is computed on normalized [-1, 1]
    samples; multi-channel audio is averaged across channels first."""

    def __init__(self) -> None:
        try:
            import soundfile  # noqa: F401  (driver-side probe)

            self.backend = "soundfile"
        except ImportError:
            import wave  # noqa: F401  — stdlib, always present

            self.backend = "wave"

    def __call__(self, payload: bytes) -> tuple[float, int, float]:
        import io

        if self.backend == "soundfile":
            import numpy as np
            import soundfile as sf

            data, sr = sf.read(io.BytesIO(payload), dtype="float64",
                               always_2d=True)
            mono = data.mean(axis=1)
            dur = len(mono) / sr if sr else 0.0
            rms = float(np.sqrt((mono * mono).mean())) if len(mono) else 0.0
            return round(dur, 6), int(sr), round(min(rms, 1.0), 6)

        import wave

        import numpy as np

        with wave.open(io.BytesIO(payload), "rb") as w:
            sr = w.getframerate()
            n_frames = w.getnframes()
            width = w.getsampwidth()
            n_ch = w.getnchannels()
            raw = w.readframes(n_frames)
        if width == 2:
            x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
        elif width == 1:  # 8-bit WAV is unsigned
            x = (np.frombuffer(raw, dtype="u1").astype(np.float64) - 128.0) / 128.0
        elif width == 4:
            x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
        else:
            raise ValueError(
                f"unsupported PCM sample width {width} bytes (wave "
                "backend); install soundfile for non-PCM formats"
            )
        if n_ch > 1:
            x = x[: (len(x) // n_ch) * n_ch].reshape(-1, n_ch).mean(axis=1)
        dur = n_frames / sr if sr else 0.0
        rms = float(np.sqrt((x * x).mean())) if len(x) else 0.0
        return round(dur, 6), int(sr), round(min(rms, 1.0), 6)


class FakeAudioDecoder:
    """Deterministic stand-in for an audio codec: duration/sample-rate/
    RMS derived from the payload's sha256 — stable across runs/engines
    (useful for plumbing tests with non-audio payloads). Production
    uses :class:`RealAudioDecoder`; the Spark-side plumbing is
    identical."""

    def __call__(self, payload: bytes) -> tuple[float, int, float]:
        h = hashlib.sha256(payload).digest()
        duration_s = round(0.5 + (h[0] * 256 + h[1]) / 65535.0 * 299.5, 6)
        sample_rate = (8000, 16000, 22050, 44100, 48000)[h[2] % 5]
        rms_level = round(h[3] / 255.0, 6)
        return duration_s, sample_rate, rms_level


def extract_audio_features(
    media: DataFrame,
    decoder=None,
) -> DataFrame:
    """audio rows → (media_id, n_bytes, sha256, duration_s, sample_rate,
    rms_level) via Arrow-batched mapInPandas — same narrow, shuffle-free
    shape as :func:`extract_image_features`; column pruning keeps the
    payload the only wide column in the Arrow transfer."""
    dec = decoder or FakeAudioDecoder()

    def process(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    rows.append((media_id, None, None, None, None, None))
                    continue
                data = bytes(payload)
                dur, sr, rms = dec(data)
                rows.append(
                    (
                        media_id,
                        len(data),
                        hashlib.sha256(data).hexdigest(),
                        dur,
                        sr,
                        rms,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "n_bytes",
                    "sha256",
                    "duration_s",
                    "sample_rate",
                    "rms_level",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        process, AUDIO_FEATURES_SCHEMA
    )


def sample_video_frames(
    media: DataFrame,
    every_n_seconds: float = 1.0,
    frame_decoder: Callable[[bytes, float], bytes] | None = None,
) -> DataFrame:
    """video rows → (media_id, frame_ts, frame_payload) — one row per
    sampled frame, exploded map-side.

    The frame extraction is the stubbed step (ffmpeg absent); the fake
    emits one deterministic pseudo-frame per sampled timestamp so the
    explode/partitioning shape is real: output rows ∝ duration, so a
    repartition after this op rebalances long-video skew.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.StringType(), False),
            T.StructField("frame_ts", T.DoubleType(), False),
            T.StructField("frame_payload", T.BinaryType(), True),
        ]
    )

    def fake_frame(payload: bytes, ts: float) -> bytes:
        return hashlib.sha256(payload + str(ts).encode()).digest()

    dec = frame_decoder or fake_frame

    def process(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for media_id, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                if payload is None:
                    continue
                duration = float((meta or {}).get("duration_s", 0.0))
                n = max(int(duration / every_n_seconds), 1)
                for i in range(n):
                    ts = round(i * every_n_seconds, 6)
                    rows.append((media_id, ts, dec(bytes(payload), ts)))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_ts", "frame_payload"]
            )

    return media.select("media_id", "payload", "meta").mapInPandas(
        process, out_schema
    )


# ----------------------------------------- perceptual image hashing (pHash)


class RealImagePHasher:
    """Pillow-backed perceptual hash: bytes → 64-bit DCT pHash (the
    classic recipe, Zauner 2010 / pHash.org): grayscale → 32×32
    resize → 2-D orthonormal DCT-II (one 32×32 matrix sandwich in
    numpy, no scipy) → top-left 8×8 low-frequency block → bit i = 1
    iff coefficient > median of the 63 AC coefficients (DC excluded —
    it encodes brightness, not structure). Robust to re-encoding,
    resizing, and small edits; hamming distance ≈ perceptual distance.

    Same optional-dependency posture as :class:`RealImageDecoder`:
    fail fast driver-side, import Pillow per call on executors."""

    def __init__(self) -> None:
        try:
            import PIL.Image  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "RealImagePHasher requires Pillow; without image codecs "
                "use FakeImagePHasher (deterministic plumbing twin) or "
                "inject your own hasher callable"
            ) from e

    def __call__(self, payload: bytes) -> int:
        import io

        import numpy as np
        from PIL import Image

        with Image.open(io.BytesIO(payload)) as img:
            a = np.asarray(
                img.convert("L").resize((32, 32), Image.BILINEAR),
                dtype=np.float64,
            )
        n = 32
        k = np.arange(n)
        d = np.sqrt(2.0 / n) * np.cos(
            np.pi * (2.0 * k[None, :] + 1.0) * k[:, None] / (2.0 * n)
        )
        d[0, :] = np.sqrt(1.0 / n)
        f = d @ a @ d.T
        block = f[:8, :8].flatten()
        med = np.median(block[1:])  # exclude DC
        bits = (block > med).astype(np.uint64)
        h = np.uint64(0)
        for b in bits:
            h = (h << np.uint64(1)) | b
        return int(h)


class FakeImagePHasher:
    """Deterministic stand-in: 64 bits from the payload's sha256 —
    identical payloads collide (hamming 0), unrelated payloads land at
    ~32 hamming, exercising the full pairing path codec-free."""

    def __call__(self, payload: bytes) -> int:
        return int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("phash_hi", T.IntegerType(), True),
        T.StructField("phash_lo", T.IntegerType(), True),
    ]
)


def image_phash(
    media: DataFrame,
    hasher=None,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """media rows → ``(id, phash_hi, phash_lo)`` 64-bit perceptual
    hashes as two signed int32 halves (the JVM-bit-op-friendly layout
    :func:`~sifts_spark.operators.dedup.hamming_pairs` shares with
    SimHash). NULL payloads hash NULL. Narrow map, no shuffle."""
    hsh = hasher or FakeImagePHasher()

    def process(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    rows.append((media_id, None, None))
                    continue
                h = hsh(bytes(payload)) & 0xFFFFFFFFFFFFFFFF
                hi = (h >> 32) & 0xFFFFFFFF
                lo = h & 0xFFFFFFFF
                # two's-complement into signed int32
                rows.append((
                    media_id,
                    hi - (1 << 32) if hi >= (1 << 31) else hi,
                    lo - (1 << 32) if lo >= (1 << 31) else lo,
                ))
            yield pd.DataFrame(rows, columns=["id", "phash_hi", "phash_lo"])

    return media.select(
        F.col(id_col).alias(id_col), F.col(payload_col).alias(payload_col)
    ).mapInPandas(process, PHASH_SCHEMA)


def image_phash_pairs(
    media: DataFrame,
    hasher=None,
    id_col: str = "media_id",
    payload_col: str = "payload",
    max_hamming: int = 8,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """Near-duplicate IMAGE pairs by pHash hamming ≤ ``max_hamming`` →
    ``(id_a, id_b, hamming)`` — the multimodal twin of text SimHash
    dedup, sharing its pairing engine (16-bit-chunk pigeonhole
    buckets, exact bit_count(xor), skew cap). Feed the output to
    :func:`~sifts_spark.operators.dedup.duplicate_clusters` for
    keep-one-per-group image dedup."""
    from sifts_spark.caching import track
    from sifts_spark.operators.dedup import hamming_pairs

    fps = track(
        image_phash(media, hasher, id_col, payload_col).filter(
            F.col("phash_hi").isNotNull()
        )
    )
    return hamming_pairs(
        fps, id_col="id", hi_col="phash_hi", lo_col="phash_lo",
        max_hamming=max_hamming, max_bucket_size=max_bucket_size,
        op_name="image_phash_pairs",
    )
