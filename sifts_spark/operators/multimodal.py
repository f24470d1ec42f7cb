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


def _png_to_array(payload: bytes) -> "np.ndarray":  # noqa: F821
    """Minimal stdlib PNG decode (zlib + struct) → H×W×C uint8.

    The Pillow-free fallback backend (the image twin of
    :class:`RealAudioDecoder`'s stdlib-``wave`` posture): supports the
    simple-PNG subset — bit depth 8, color types 0/2/4/6 (gray, RGB,
    gray+alpha, RGBA), non-interlaced, all five scanline filters.
    Filters 1/3/4 carry a left-neighbor data dependence, so they
    reconstruct in a per-byte Python loop (row-bounded) — fine for the
    fallback; install Pillow for the fast path and other codecs."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError(
            "stdlib image fallback decodes PNG only; install Pillow "
            "for JPEG/WebP/... codecs"
        )
    pos, w, h, depth, ctype, interlace = 8, None, None, None, None, None
    idat: list[bytes] = []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, _c, _f, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
    if w is None or depth != 8 or interlace != 0 or ctype not in (0, 2, 4, 6):
        raise ValueError(
            f"unsupported PNG (depth={depth} color_type={ctype} "
            f"interlace={interlace}) for the stdlib fallback; install "
            "Pillow"
        )
    nch = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
    raw = zlib.decompress(b"".join(idat))
    stride = w * nch
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(h):
        flt = raw[pos]
        pos += 1
        line = np.frombuffer(raw, np.uint8, count=stride, offset=pos).copy()
        pos += stride
        if flt == 0:
            pass
        elif flt == 2:  # Up — uint8 wraparound IS the spec's mod-256 add
            line += prev
        elif flt in (1, 3, 4):
            cur = line.astype(np.int32)
            pr = prev.astype(np.int32)
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = rec[x - nch] if x >= nch else 0
                b = pr[x]
                c = pr[x - nch] if x >= nch else 0
                if flt == 1:  # Sub
                    pred = a
                elif flt == 3:  # Average
                    pred = (a + b) // 2
                else:  # Paeth
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else c
                    )
                rec[x] = (cur[x] + pred) & 0xFF
            line = rec.astype(np.uint8)
        else:
            raise ValueError(f"bad PNG scanline filter {flt}")
        out[y] = line
        prev = out[y]
    return out.reshape(h, w, nch)


def _to_gray(arr: "np.ndarray") -> "np.ndarray":  # noqa: F821
    """H×W×C uint8 → H×W float64 luma in [0, 255] (ITU-R 601-2, the
    same weights Pillow's convert('L') uses; alpha ignored)."""
    a = arr.astype("float64")
    if arr.shape[2] < 3:
        return a[:, :, 0]
    return a[:, :, 0] * 0.299 + a[:, :, 1] * 0.587 + a[:, :, 2] * 0.114


def _bilinear_resize(
    a: "np.ndarray", out_w: int, out_h: int  # noqa: F821
) -> "np.ndarray":
    """H×W float → out_h×out_w float, center-aligned bilinear sampling
    (numpy-vectorized; the stdlib backend's stand-in for Image.resize)."""
    import numpy as np

    h, w = a.shape
    x = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    y = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    wx = x - np.floor(x)
    wy = y - np.floor(y)
    x0 = np.clip(np.floor(x).astype(int), 0, w - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    y0 = np.clip(np.floor(y).astype(int), 0, h - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    top = a[y0][:, x0] * (1 - wx) + a[y0][:, x1] * wx
    bot = a[y1][:, x0] * (1 - wx) + a[y1][:, x1] * wx
    return top * (1 - wy)[:, None] + bot * wy[:, None]


class RealImageDecoder:
    """Real image decoding: bytes → (width, height, mean_luma∈[0,1]).

    Backend selection, probed DRIVER-side at construction (same posture
    as :class:`RealAudioDecoder`):

    * Pillow when importable — every codec the local install handles;
    * otherwise the stdlib PNG decoder (:func:`_png_to_array`) — 8-bit
      non-interlaced PNG with zero extra dependencies, so the decoder
      is REAL even in minimal containers; non-PNG payloads raise with
      install guidance.

    Modules are imported inside ``__call__`` (only the backend NAME is
    stored on ``self``) so the decoder pickles cleanly to executors,
    which re-import locally."""

    def __init__(self) -> None:
        try:
            import PIL.Image  # noqa: F401  (driver-side probe)

            self.backend = "pillow"
        except ImportError:
            self.backend = "png"

    def __call__(self, payload: bytes) -> tuple[int, int, float]:
        import io

        if self.backend == "pillow":
            from PIL import Image

            with Image.open(io.BytesIO(payload)) as img:
                width, height = img.size
                # 8-bit grayscale histogram → mean luma in [0,1]
                hist = img.convert("L").histogram()
            total = sum(hist)
            mean_luma = (
                sum(i * c for i, c in enumerate(hist)) / (total * 255.0)
                if total
                else 0.0
            )
            return width, height, round(mean_luma, 6)

        arr = _png_to_array(payload)
        gray = _to_gray(arr)
        return (
            arr.shape[1],
            arr.shape[0],
            round(float(gray.mean()) / 255.0, 6) if gray.size else 0.0,
        )


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


def _phash_from_gray32(a: "np.ndarray") -> int:  # noqa: F821
    """32×32 grayscale float → DCT pHash: 2-D orthonormal DCT-II (one
    32×32 matrix sandwich in numpy, no scipy) → top-left 8×8
    low-frequency block → 63 bits, one per AC coefficient, set iff the
    coefficient exceeds the AC median. The DC coefficient (pure
    brightness, no structure) contributes NEITHER to the median NOR a
    bit — a DC bit compares brightness to an AC median and is
    essentially always 1, wasting one unit of the hamming budget (the
    classic pHash recipe likewise hashes AC only). Bit 63 of the
    returned int is always 0."""
    import numpy as np

    n = 32
    k = np.arange(n)
    d = np.sqrt(2.0 / n) * np.cos(
        np.pi * (2.0 * k[None, :] + 1.0) * k[:, None] / (2.0 * n)
    )
    d[0, :] = np.sqrt(1.0 / n)
    f = d @ a @ d.T
    ac = f[:8, :8].flatten()[1:]  # 63 AC coefficients, DC dropped
    med = np.median(ac)
    bits = (ac > med).astype(np.uint64)
    h = np.uint64(0)
    for b in bits:
        h = (h << np.uint64(1)) | b
    return int(h)


class RealImagePHasher:
    """Real perceptual hash: bytes → 63-bit DCT pHash (the classic
    recipe, Zauner 2010 / pHash.org): grayscale → 32×32 resize → DCT →
    AC-median bits (:func:`_phash_from_gray32`). Robust to re-encoding,
    resizing, and small edits; hamming distance ≈ perceptual distance.

    Same backend posture as :class:`RealImageDecoder`: Pillow when
    importable (all codecs), else the stdlib PNG decoder + numpy
    bilinear resize — real hashing with zero optional deps."""

    def __init__(self) -> None:
        try:
            import PIL.Image  # noqa: F401

            self.backend = "pillow"
        except ImportError:
            self.backend = "png"

    def __call__(self, payload: bytes) -> int:
        import io

        import numpy as np

        if self.backend == "pillow":
            from PIL import Image

            with Image.open(io.BytesIO(payload)) as img:
                a = np.asarray(
                    img.convert("L").resize((32, 32), Image.BILINEAR),
                    dtype=np.float64,
                )
        else:
            a = _bilinear_resize(_to_gray(_png_to_array(payload)), 32, 32)
        return _phash_from_gray32(a)


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
