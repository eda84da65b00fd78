"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched ``mapInPandas`` stages.

The container has no image/audio libraries, so the decode kernels are
STUBBED (deterministic fakes keyed on content hash, or
NotImplementedError when ``strict=True``) — but everything Spark-side is
real and tested: schema, partitioning, UDF signatures, batch shapes.
Swapping a real decoder in changes only the ``_fake_*`` bodies.

Scale notes: payloads stay in the binary column end-to-end (Arrow
transfers them zero-copy to the Python worker); feature extraction is a
projection (no shuffle); ``maxRecordsPerBatch`` bounds worker memory for
large blobs.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "width int, height int, duration_ms int, sample_rate int"
)

FEATURE_DIM = 16


def gen_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table: payload bytes derived from
    xxhash64 (a stand-in for real encoded frames/samples)."""
    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    i = F.col("id")
    kind = F.element_at(kinds, (F.pmod(F.xxhash64(i, F.lit(seed)), F.lit(3)) + 1).cast("int"))
    payload = F.encode(
        F.concat_ws(
            ":",
            kind,
            i.cast("string"),
            F.md5(F.concat(i.cast("string"), F.lit(seed))).cast("string"),
        ),
        "UTF-8",
    )
    return spark.range(n).select(
        i.alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.when(kind == "image", (F.pmod(F.xxhash64(i, F.lit("w")), F.lit(1920)) + 1).cast("int")).alias("width"),
        F.when(kind == "image", (F.pmod(F.xxhash64(i, F.lit("h")), F.lit(1080)) + 1).cast("int")).alias("height"),
        F.when(kind != "image", (F.pmod(F.xxhash64(i, F.lit("d")), F.lit(600000)) + 1).cast("int")).alias("duration_ms"),
        F.when(kind == "audio", F.lit(16000).cast("int")).alias("sample_rate"),
    )


def _fake_decode_features(payload: bytes, kind: str) -> list[float]:
    """STUB for a real decoder (PIL/librosa/ffmpeg not in container):
    deterministic FEATURE_DIM-vector from the content digest. A real
    implementation decodes the media and runs a feature extractor."""
    h = hashlib.md5(payload).digest()
    rng = np.frombuffer((h * ((FEATURE_DIM * 4) // len(h) + 1))[: FEATURE_DIM * 4], dtype="<u4")
    return (rng.astype("float64") / 2**32).tolist()


def extract_features(
    media: DataFrame, strict: bool = False, batch_note_col: str | None = None
) -> DataFrame:
    """media → (media_id, kind, feature array<double>, n_bytes int).

    ``strict=True`` raises NotImplementedError where a real decoder is
    required — the clearly-marked integration point."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "real media decoding requires image/audio libraries "
                    "not present in this container; wire a decoder into "
                    "_fake_decode_features"
                )
            feats = [
                _fake_decode_features(bytes(p), k)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                }
            )

    return media.mapInPandas(
        run, schema="media_id long, kind string, feature array<double>, n_bytes int"
    )


def resize_images(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize plan: computes target dims JVM-side (aspect-preserving),
    payload re-encode is the stubbed step (passthrough here)."""
    scale = F.when(
        F.greatest("width", "height") > max_side,
        F.lit(max_side) / F.greatest("width", "height").cast("double"),
    ).otherwise(F.lit(1.0))
    return media.filter(F.col("kind") == "image").select(
        "media_id",
        "payload",
        F.round(F.col("width") * scale).cast("int").alias("target_width"),
        F.round(F.col("height") * scale).cast("int").alias("target_height"),
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video: one output row per sampled
    timestamp (explode of a JVM-side sequence); frame decode stubbed."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
