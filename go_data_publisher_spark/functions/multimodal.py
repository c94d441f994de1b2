"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The image/audio decode libraries are not available in this container, so the
decode kernels are STUBS (deterministic fakes clearly marked below); the
Spark-side plumbing — schema, partitioning, mapInPandas batch shape, Arrow
transfer — is real and tested.  On a cluster with Pillow/librosa installed,
replace `_decode_image_stub` / `_decode_audio_stub` with the real kernels;
nothing else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),  # opaque encoded bytes
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

IMAGE_FEATURES_DDL = (
    "media_id long, width int, height int, n_bytes long, mean_luma double, feature array<float>"
)

AUDIO_FEATURES_DDL = "media_id long, n_samples long, duration_s double, rms double"


def _decode_image_stub(payload: bytes) -> tuple[int, int, np.ndarray]:
    """STUB: deterministic fake image decode (no imaging libs in container).

    Real implementation: PIL.Image.open(io.BytesIO(payload)) → resize →
    np.asarray.  The fake derives (w, h, pixels) from the payload bytes so
    tests are deterministic and the downstream feature math is exercised.
    """
    if payload is None or len(payload) == 0:
        raise ValueError("empty payload")
    h64 = int.from_bytes(payload[:8].ljust(8, b"\0"), "little")
    w, h = 16 + h64 % 48, 16 + (h64 >> 8) % 48
    rng = np.random.default_rng(h64 % (2**32))
    return w, h, rng.integers(0, 256, size=(h, w), dtype=np.uint8)


def _decode_audio_stub(payload: bytes) -> np.ndarray:
    """STUB: deterministic fake PCM decode (real: soundfile/librosa.load)."""
    if payload is None or len(payload) == 0:
        raise ValueError("empty payload")
    h64 = int.from_bytes(payload[:8].ljust(8, b"\0"), "little")
    rng = np.random.default_rng(h64 % (2**32))
    n = 1000 + h64 % 4000
    return rng.standard_normal(n).astype(np.float32)


def extract_image_features(df: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """Decode + feature-extract images via mapInPandas (Arrow batches).

    The per-batch loop is over *media blobs*, which is unavoidable for an
    opaque codec boundary (each blob is one decode call into a C library) —
    the Python-side work per row is one function call, all math is numpy.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    w, h, px = _decode_image_stub(payload)
                except ValueError:
                    continue
                hist = np.histogram(px, bins=8, range=(0, 256))[0].astype(np.float32)
                rows.append(
                    (int(mid), int(w), int(h), int(len(payload)), float(px.mean()),
                     (hist / max(1.0, hist.sum())).tolist())
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "n_bytes", "mean_luma", "feature"]
            )

    return df.select("media_id", "payload").mapInPandas(op, schema=IMAGE_FEATURES_DDL)


def extract_audio_features(df: DataFrame, sample_rate: int = 16000) -> DataFrame:
    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    pcm = _decode_audio_stub(payload)
                except ValueError:
                    continue
                rows.append(
                    (int(mid), len(pcm), len(pcm) / sample_rate, float(np.sqrt((pcm**2).mean())))
                )
            yield pd.DataFrame(rows, columns=["media_id", "n_samples", "duration_s", "rms"])

    return df.select("media_id", "payload").mapInPandas(op, schema=AUDIO_FEATURES_DDL)


def sample_video_frames(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling plumbing: video blob → one row per sampled frame index.

    The decode is stubbed (frame count derived from payload size); the
    explode/partitioning shape — one input row fanning out to many frame
    rows, repartitioned downstream — is the real pipeline shape.
    """
    n_frames = (F.length("payload") / 100 + 1).cast("int")
    return (
        df.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))).alias("frame_idx"),
        )
    )


def make_media_fixture(spark, n: int = 64, seed: int = 3) -> DataFrame:
    """Deterministic opaque-binary media table for tests."""
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(3)).cast("int") + 1,
    )
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        kinds.alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.sha2(F.concat(F.lit(str(seed)), F.col("id").cast("string")), 256)
        .cast("binary")
        .alias("payload"),
        F.create_map(F.lit("src"), F.lit("synthetic")).alias("meta"),
    )
