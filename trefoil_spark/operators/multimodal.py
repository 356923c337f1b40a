"""Multimodal column plumbing (training-data pipeline op).

Image/audio/video ride as opaque ``binary`` columns + typed metadata
structs; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas UDFs over mapInPandas. The decode step itself is
STUBBED (image/audio libs absent in this container — clearly marked):
``decoder='fake'`` produces a deterministic pseudo-decode so the
Spark-side plumbing (schema, partitioning, UDF signature, batch shape)
is real and tested end-to-end; ``decoder='real'`` raises
NotImplementedError where PIL/ffmpeg would be called.

Schema convention:
    media: binary                      -- opaque payload
    media_meta: struct<kind:string, width:int, height:int,
                       n_frames:int, sample_rate:int>
    features: array<float>             -- extractor output
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "kind string, width int, height int, n_frames int, sample_rate int"
)

FEATURE_DIM = 16


def attach_fake_media(df: DataFrame, payload_col: str = "text") -> DataFrame:
    """Deterministic pseudo-media: payload bytes + synthetic metadata
    derived from the payload (sandbox stand-in for WARC image records)."""
    return (
        df.withColumn("media", F.encode(F.col(payload_col), "UTF-8"))
        .withColumn(
            "media_meta",
            F.struct(
                F.lit("image").alias("kind"),
                (F.length(payload_col) % 640 + 16).alias("width"),
                (F.length(payload_col) % 480 + 16).alias("height"),
                F.lit(1).alias("n_frames"),
                F.lit(0).alias("sample_rate"),
            ),
        )
    )


def _fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in for image decode: payload md5 seeds a tiny
    uint8 'pixel' array of the declared shape (capped for tests)."""
    h = hashlib.md5(payload).digest()
    seed = int.from_bytes(h[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(min(height, 32), min(width, 32)), dtype=np.uint8)


def extract_features(
    df: DataFrame, decoder: str = "fake", method: str = "hist"
) -> DataFrame:
    """media binary → features via mapInPandas.

    The batch shape/partitioning is production-real; only the pixel
    decode is substituted. ``decoder='real'`` marks where PIL/ffmpeg
    plug in.

    ``method``:
      - ``'hist'``  — histogram of the (fake-)decoded pixels,
        ``array<float>`` (the shape a real extractor produces);
      - ``'digest'`` — the i-th md5 byte of the payload / 255.0,
        ``array<double>``. Same per-row decode-style cost shape, but
        engine-portable: an ANSI-SQL oracle can recompute it exactly
        (md5 hex substrings), which the driver's value-hash gate needs.
    """
    if decoder not in ("fake", "real"):
        raise ValueError("decoder must be 'fake' or 'real'")
    if method not in ("hist", "digest"):
        raise ValueError("method must be 'hist' or 'digest'")

    def gen(batches):
        for pdf in batches:
            feats = []
            for payload, meta in zip(pdf["media"], pdf["media_meta"]):
                if decoder == "real":
                    raise NotImplementedError(
                        "real image decode requires PIL/ffmpeg (absent in "
                        "this container); use decoder='fake'"
                    )
                raw = bytes(payload)
                if method == "digest":
                    dig = hashlib.md5(raw).digest()[:FEATURE_DIM]
                    feats.append([b / 255.0 for b in dig])
                    continue
                img = _fake_decode(raw, meta["width"], meta["height"])
                # histogram-ish feature vector (vectorized numpy)
                hist, _ = np.histogram(img, bins=FEATURE_DIM, range=(0, 256))
                feats.append((hist / max(img.size, 1)).astype(np.float32).tolist())
            out = pdf[["doc_id"]].copy()
            out["features"] = feats
            yield out

    ftype = "array<double>" if method == "digest" else "array<float>"
    return df.mapInPandas(gen, schema=f"doc_id bigint, features {ftype}")


def frame_sample(df: DataFrame, every_n: int = 2, decoder: str = "fake") -> DataFrame:
    """Video-style frame sampling plumbing: one row per sampled frame.

    With the fake decoder each 'frame' is a deterministic slice of the
    pseudo-decode; the row-explosion shape (doc_id, frame_idx, frame
    binary) is the real contract a video pipeline needs."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["media"], pdf["media_meta"]
            ):
                if decoder == "real":
                    raise NotImplementedError("real video decode not available here")
                n = max(int(meta["n_frames"]), 1)
                img = _fake_decode(bytes(payload), meta["width"], meta["height"])
                for f in range(0, n, every_n):
                    rows.append((int(doc_id), f, img.tobytes()))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame"])

    return df.mapInPandas(gen, schema="doc_id bigint, frame_idx int, frame binary")
