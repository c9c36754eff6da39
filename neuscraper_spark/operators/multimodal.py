"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are `binary` columns with a metadata struct; decode
and feature-extraction run as Arrow-batched stages over mapInPandas.
The actual codec work is STUBBED (no image/audio libraries in this
container — see `_decode_image_stub`): the deterministic fake parses a
tiny self-describing header so schema, partitioning, UDF signatures and
batch shapes are real and tested; swapping in PIL/ffmpeg is a one-
function change behind `DECODERS`.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_DDL = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int,height:int,n_frames:int,sample_rate:int>"
)

_MAGIC = b"FAKE"


def encode_fake_media(media_id: int, kind: str, rng_seed: int = 0) -> bytes:
    """Deterministic self-describing payload: FAKE | w | h | frames | sr
    | body. Stands in for a real JPEG/WAV/MP4 container."""
    import random

    rng = random.Random((rng_seed << 32) ^ media_id)
    w, h = rng.choice([(64, 64), (128, 96), (320, 240)])
    frames = 1 if kind == "image" else rng.randint(8, 32)
    sr = 16000 if kind == "audio" else 0
    body = bytes(rng.getrandbits(8) for _ in range(64))
    return _MAGIC + struct.pack("<4i", w, h, frames, sr) + body


def _decode_image_stub(payload: bytes) -> np.ndarray:
    """STUB decoder. A real deployment replaces this with
    PIL.Image.open(io.BytesIO(payload)) — unavailable in this container.
    The fake materializes a deterministic pixel array of the declared
    shape so downstream shape/statistics plumbing is exercised."""
    if not payload.startswith(_MAGIC):
        raise NotImplementedError(
            "real codec decode not available in this environment; "
            "payload is not a FAKE container"
        )
    w, h, _, _ = struct.unpack("<4i", payload[4:20])
    body = np.frombuffer(payload[20:], dtype=np.uint8)
    reps = int(np.ceil(w * h / body.size))
    return np.tile(body, reps)[: w * h].reshape(h, w)


def _decode_audio_stub(payload: bytes) -> np.ndarray:
    """STUB audio decoder (real deployment: soundfile/ffmpeg). The fake
    materializes a deterministic int16 'waveform' of sample_rate/10
    samples so feature plumbing (mean/std/min/max) is exercised."""
    if not payload.startswith(_MAGIC):
        raise NotImplementedError(
            "real audio decode not available in this environment"
        )
    _, _, _, sr = struct.unpack("<4i", payload[4:20])
    body = np.frombuffer(payload[20:], dtype=np.uint8).astype(np.int16)
    n = max(sr // 10, 1)
    reps = int(np.ceil(n / body.size))
    return (np.tile(body, reps)[:n] - 128) * 256


DECODERS = {"image": _decode_image_stub, "audio": _decode_audio_stub}


def media_table(spark, n: int = 200, partitions: int = 8) -> DataFrame:
    """Synthetic media table (deterministic), kind alternating."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = kinds[i % 3]
                payload = encode_fake_media(i, kind)
                w, h, frames, sr = struct.unpack("<4i", payload[4:20])
                rows.append(
                    {
                        "media_id": i,
                        "kind": kind,
                        "payload": payload,
                        "meta": {"width": w, "height": h, "n_frames": frames,
                                 "sample_rate": sr},
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1, partitions).mapInPandas(gen, schema=MEDIA_DDL)


def decode_features(media: DataFrame) -> DataFrame:
    """Image decode + feature extraction stage: one Arrow batch in, one
    feature row per image out (mean/std/histogram-lite). Non-image rows
    pass through with null features."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            # zip over columns, not iterrows: iterrows materializes a
            # pandas Series per row (measured ~10x slower on wide rows)
            for media_id, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                feats = None
                if kind in DECODERS:
                    px = DECODERS[kind](bytes(payload))
                    feats = [
                        float(np.round(px.mean(), 4)),
                        float(np.round(px.std(), 4)),
                        float(px.min()),
                        float(px.max()),
                    ]
                out.append({"media_id": media_id, "kind": kind, "features": feats})
            yield pd.DataFrame(out, columns=["media_id", "kind", "features"])

    return media.mapInPandas(run, schema="media_id long, kind string, features array<double>")


def frame_sample(media: DataFrame, every_n: int = 4) -> DataFrame:
    """Video frame-sampling plumbing: expands each video row to its
    sampled frame indices natively (the decode of each frame would slot
    into decode_features). No Python for the expansion itself."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))
            ).alias("frame_idx"),
        )
    )


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stage: STUB — declares the output schema/metadata update;
    raises on actual pixel work (no imaging library here)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "resize requires a real imaging library (PIL/opencv), "
            "not available in this container"
        )
        yield  # pragma: no cover

    return media.mapInPandas(run, schema=MEDIA_DDL)
