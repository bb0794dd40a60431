"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Training-data-pipeline extension. Image/audio/video payloads are opaque
`binary` columns with struct metadata; decode / feature-extract / resize /
frame-sample run as Arrow-batched `mapInPandas` stages so each executor
processes whole record batches. The decode libraries are NOT in this
container, so the codec step is STUBBED (clearly marked): `decode_image`
raises NotImplementedError unless `fake=True`, in which case a
deterministic hash-derived feature vector stands in — the Spark-side
plumbing (schema, partitioning, UDF signature, batch shape) is real and
tested either way.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, "
    "meta struct<width:int, height:int, n_frames:int>"
)
FEATURE_DIM = 8

FEATURES_SCHEMA = (
    "doc_id long, media_type string, n_bytes int, payload_md5 string, "
    f"feature array<float>"
)


def attach_fake_media(documents: DataFrame) -> DataFrame:
    """Derive an opaque binary payload column from text (test stand-in for
    a real image/audio column in an Iceberg table)."""
    return documents.select(
        "doc_id",
        F.lit("image").alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            (F.length("text") % 64 + 1).cast("int").alias("width"),
            (F.length("text") % 48 + 1).cast("int").alias("height"),
            (F.length("text") % 5 + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def decode_image(payload: bytes):  # pragma: no cover - stub
    """STUB: real decode needs PIL/ffmpeg (not in this container)."""
    raise NotImplementedError(
        "image/audio decode libraries are not available in this environment; "
        "use fake=True for the deterministic stand-in feature path"
    )


def _fake_feature(payload: bytes) -> np.ndarray:
    """Deterministic FEATURE_DIM-dim stand-in 'embedding' from md5 bytes."""
    dig = hashlib.md5(payload).digest()
    return (np.frombuffer(dig[:FEATURE_DIM], dtype=np.uint8)
            .astype(np.float32) / 255.0)


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Real pipeline: decode → resize → model forward per Arrow batch.
    Here: md5-derived deterministic features (fake=True) or
    NotImplementedError (fake=False) — the distributed plumbing is
    identical either way.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, md5s, sizes = [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload)
                if not fake:
                    decode_image(b)  # raises: codecs unavailable here
                feats.append(_fake_feature(b).tolist())
                md5s.append(hashlib.md5(b).hexdigest())
                sizes.append(len(b))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pd.Series(sizes, dtype="int32"),
                    "payload_md5": md5s,
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every: int = 2) -> DataFrame:
    """Frame sampling plumbing: one output row per kept frame index —
    columnar explode of the frame index range (the decode of each frame
    would live in the downstream mapInPandas)."""
    return media.select(
        "doc_id", "media_type",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every))
        ).alias("frame_index"),
    )


RESIZE_SCHEMA = (
    "doc_id long, media_type string, src_width int, src_height int, "
    "out_width int, out_height int, n_bytes int, thumb binary"
)


def resize_media(media: DataFrame, max_dim: int = 32,
                 fake: bool = True) -> DataFrame:
    """Aspect-preserving resize stage: longest side clamped to max_dim.

    Target-dimension math is pure columnar (integer floor division —
    survives whole-stage codegen and is mirrored exactly by the DuckDB
    oracle); only the pixel resample itself runs in mapInPandas, and that
    codec step is STUBBED like decode_image: fake=True emits a
    deterministic md5-derived thumbnail of exactly out_width*out_height
    bytes (so downstream batch shapes and sizes are real), fake=False
    raises via decode_image."""
    g = F.greatest(F.col("meta.width"), F.col("meta.height"))

    def target(side):
        return F.when(g <= max_dim, F.col(f"meta.{side}")).otherwise(
            F.greatest(F.lit(1),
                       F.floor(F.col(f"meta.{side}") * max_dim / g))
        ).cast("int")

    t = media.select(
        "doc_id", "media_type", "payload",
        F.col("meta.width").alias("src_width"),
        F.col("meta.height").alias("src_height"),
        target("width").alias("out_width"),
        target("height").alias("out_height"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = []
            for payload, ow, oh in zip(pdf["payload"], pdf["out_width"],
                                       pdf["out_height"]):
                b = bytes(payload)
                if not fake:
                    decode_image(b)  # raises: codecs unavailable here
                n = int(ow) * int(oh)
                dig = hashlib.md5(b).digest()
                thumbs.append((dig * ((n + 15) // 16))[:n])
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "src_width": pdf["src_width"],
                "src_height": pdf["src_height"],
                "out_width": pdf["out_width"],
                "out_height": pdf["out_height"],
                "n_bytes": (pdf["out_width"] * pdf["out_height"])
                .astype("int32"),
                "thumb": thumbs,
            })

    return t.mapInPandas(run, RESIZE_SCHEMA)
