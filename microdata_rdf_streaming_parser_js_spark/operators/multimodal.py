"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, decode/feature steps as Arrow-batched
``mapInPandas`` stages.

The decode kernels themselves are STUBBED (the image/audio libraries
are not in this container): :func:`decode_image` raises unless
``fake=True``, in which case a deterministic fake decoder produces
shape/feature values derived from the bytes — the Spark-side plumbing
(schemas, batch iteration, partitioning) is real and tested, and a real
decoder drops in by replacing one function.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:
    import pandas as pd
    from pyspark.sql import DataFrame

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("url", T.StringType(), True),
        T.StructField("kind", T.StringType(), True),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("phash", T.StringType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def media_rows(n: int = 100) -> list[tuple]:
    """Deterministic fake media rows (bytes = seeded digest stream);
    pure Python so the driver oracles can re-derive the same rows."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * (1 + i % 7)
        kind = ("image", "audio", "video")[i % 3]
        rows.append(
            (i, f"http://media.example.org/{kind}/{i}", kind, payload,
             {"image": "image/jpeg", "audio": "audio/ogg", "video": "video/mp4"}[kind],
             len(payload))
        )
    return rows


def synthesize_media(spark, n: int = 100) -> "DataFrame":
    """Deterministic fake media table over :func:`media_rows`."""
    # tiny synthetic table: a handful of partitions, not
    # default.parallelism-many one-row Python-worker spin-ups
    return spark.createDataFrame(media_rows(n), schema=MEDIA_SCHEMA).repartition(4)


def _fake_decode(content: bytes) -> tuple[int, int, int, str, list[float]]:
    """Deterministic stand-in for a real image decode: derives a fake
    (w, h, c), a perceptual-hash-like hex string, and an 8-dim feature
    vector from the bytes. Replace with PIL/libvips in production."""
    digest = hashlib.sha256(content or b"").digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    phash = digest[:8].hex()
    features = [round(b / 255.0, 6) for b in digest[8:16]]
    return width, height, 3, phash, features


def decode_image_features(
    media: "DataFrame", fake: bool = True, batch_size_hint: int = 256
) -> "DataFrame":
    """image rows -> (media_id, width, height, channels, phash,
    features) via mapInPandas. With ``fake=False`` this raises
    NotImplementedError in the kernel (no decoder libs here)."""
    import pandas as pd

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "width", "height", "channels", "phash", "features")}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if not fake:
                    raise NotImplementedError(
                        "real image decoding requires PIL/libvips; "
                        "run with fake=True in this environment"
                    )
                w, h, c, ph, feats = _fake_decode(bytes(content) if content is not None else b"")
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(c)
                out["phash"].append(ph)
                out["features"].append(feats)
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "content")
        .mapInPandas(fn, schema=IMAGE_FEATURES_SCHEMA)
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)


def _fake_resize(content: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for a real resize kernel: output bytes =
    repeated sha256 of (content, w, h) cut to a size proportional to
    the target area. Replace with PIL/libvips in production."""
    seed = hashlib.sha256(
        (content or b"") + f"|{width}x{height}".encode()
    ).digest()
    target = max(32, (width * height) // 256)
    return (seed * (target // len(seed) + 1))[:target]


def resize_images(
    media: "DataFrame", width: int = 64, height: int = 64, fake: bool = True
) -> "DataFrame":
    """image rows -> resized binary column via mapInPandas (Arrow
    batches of opaque bytes in AND out — the shape that matters for a
    100 TB media pipeline: bytes never hit the driver, batches stream).
    With ``fake=False`` the kernel raises (no image libs here)."""
    import pandas as pd

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "width", "height", "content", "n_bytes")}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if not fake:
                    raise NotImplementedError(
                        "real image resize requires PIL/libvips; "
                        "run with fake=True in this environment"
                    )
                resized = _fake_resize(
                    bytes(content) if content is not None else b"", width, height
                )
                out["media_id"].append(mid)
                out["width"].append(width)
                out["height"].append(height)
                out["content"].append(resized)
                out["n_bytes"].append(len(resized))
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "content")
        .mapInPandas(fn, schema=RESIZED_SCHEMA)
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("fingerprint", T.StringType(), True),
    ]
)


def _fake_audio_features(content: bytes, bytes_per_ms: int = 16) -> tuple[int, int, str]:
    """Deterministic stand-in for a real audio decode: (sample_rate,
    duration_ms, fingerprint hex). Shared by the kernel and the driver
    oracle's golden VALUES. Replace with ffmpeg/librosa in production."""
    digest = hashlib.sha256(content or b"").digest()
    return (
        8000 + (digest[0] % 5) * 8000,
        len(content or b"") // bytes_per_ms,
        digest[:12].hex(),
    )


def decode_audio_features(
    media: "DataFrame", bytes_per_ms: int = 16, fake: bool = True
) -> "DataFrame":
    """audio rows -> (sample_rate, duration estimate, chromaprint-like
    fingerprint) via mapInPandas; kernel stubbed like the image path."""
    import pandas as pd

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "sample_rate", "duration_ms", "fingerprint")}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if not fake:
                    raise NotImplementedError(
                        "real audio decoding requires ffmpeg/librosa; "
                        "run with fake=True in this environment"
                    )
                raw = bytes(content) if content is not None else b""
                rate, dur, fp = _fake_audio_features(raw, bytes_per_ms)
                out["media_id"].append(mid)
                out["sample_rate"].append(rate)
                out["duration_ms"].append(dur)
                out["fingerprint"].append(fp)
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("kind") == "audio")
        .select("media_id", "content")
        .mapInPandas(fn, schema=AUDIO_FEATURES_SCHEMA)
    )


def frame_sample_plan(
    media: "DataFrame",
    every_n_seconds: int = 5,
    bytes_per_second: int = 100_000,
) -> "DataFrame":
    """Video frame-sampling *plan*: one row per planned frame (the
    decode itself is the stubbed kernel). Demonstrates the explode
    pattern for 1->N media expansion without a UDF.
    ``bytes_per_second`` calibrates the duration estimate to the
    corpus's bitrate (the synthetic media uses tiny payloads)."""
    est_duration = (F.col("n_bytes") / F.lit(bytes_per_second)).cast("int") + 1
    return (
        media.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ts",
            F.explode(
                F.sequence(
                    F.lit(0), est_duration * F.lit(1), F.lit(every_n_seconds)
                )
            ),
        )
        .select("media_id", "url", "frame_ts")
    )
