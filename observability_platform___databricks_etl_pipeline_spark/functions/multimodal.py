"""Multimodal (image/audio/video) column plumbing over binary payloads.

Design for a 100 TB training-data lake: media live as opaque ``binary``
columns next to typed metadata structs; decode / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages so each task streams record batches and
never materializes a partition of raw media in Python at once.

The actual codecs (PIL/ffmpeg/soundfile) are NOT in this container, so the
decode kernels are stubs: ``decode_image_meta`` parses only magic bytes +
container headers it can do with stdlib ``struct`` (PNG/JPEG dims — real), and
``extract_features`` produces a deterministic fake embedding (sha256-seeded)
clearly marked as a stand-in. The Spark-side plumbing — schema, batch
iteration, partition sizing — is real and tested.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def _sniff_format(b: bytes) -> str:
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if b[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return "wav"
    if b[4:8] == b"ftyp":
        return "mp4"
    return "unknown"


def _png_dims(b: bytes) -> tuple[int | None, int | None]:
    if len(b) >= 24 and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        return int(w), int(h)
    return None, None


def decode_image_meta(df: DataFrame, id_col: str = "media_id", bin_col: str = "payload") -> DataFrame:
    """mapInPandas stage: binary payload → typed metadata struct columns.

    Header parsing (magic bytes, PNG IHDR) is real; full pixel decode would
    require PIL and raises NotImplementedError via ``decode_pixels``.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf[bin_col]
            fmts, widths, heights = [], [], []
            for b in payload:
                b = bytes(b) if b is not None else b""
                fmt = _sniff_format(b)
                w = h = None
                if fmt == "png":
                    w, h = _png_dims(b)
                fmts.append(fmt)
                widths.append(w)
                heights.append(h)
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype(str),
                    "format": fmts,
                    "width": pd.array(widths, dtype="Int32"),
                    "height": pd.array(heights, dtype="Int32"),
                    "n_bytes": payload.map(lambda x: len(x) if x is not None else 0).astype(
                        "int32"
                    ),
                }
            )

    return df.mapInPandas(gen, schema=MEDIA_META_SCHEMA)


def decode_pixels(payload: bytes) -> "np.ndarray":
    """Full media decode — requires imaging libs absent from this container."""
    raise NotImplementedError(
        "pixel/audio decode requires PIL/ffmpeg/soundfile, not present in this "
        "environment; plug a real decoder in here on a cluster image that has them"
    )


def extract_features(
    df: DataFrame, id_col: str = "media_id", bin_col: str = "payload", dim: int = 16
) -> DataFrame:
    """mapInPandas stage: payload → deterministic FAKE embedding (stub).

    The embedding is sha256-seeded so tests are reproducible; swap the body
    for a real model batch-inference call (e.g. ONNX) on a GPU cluster. The
    batch shape (Iterator[pd.DataFrame] → Iterator[pd.DataFrame]) is exactly
    what a real encoder stage uses.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            embs = []
            for b in pdf[bin_col]:
                digest = hashlib.sha256(bytes(b) if b is not None else b"").digest()
                raw = np.frombuffer((digest * ((dim * 4) // len(digest) + 1))[: dim * 4], dtype=np.uint32)
                vec = (raw.astype(np.float64) / np.iinfo(np.uint32).max * 2 - 1).astype(np.float32)
                embs.append(vec.tolist())
            yield pd.DataFrame({"media_id": pdf[id_col].astype(str), "embedding": embs})

    return df.mapInPandas(gen, schema=FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame, id_col: str = "media_id", bin_col: str = "payload", every_n: int = 10
) -> DataFrame:
    """Frame-sampling plumbing for video: emits (media_id, frame_idx, frame)
    rows. Real frame extraction needs ffmpeg → stub emits deterministic byte
    slices standing in for frames so downstream plumbing is testable."""
    schema = StructType(
        [
            StructField("media_id", StringType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame", StringType()),  # stand-in: hex digest of the slice
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, b in zip(pdf[id_col], pdf[bin_col]):
                b = bytes(b) if b is not None else b""
                n_frames = max(1, len(b) // 64)
                for i in range(0, n_frames, every_n):
                    chunk = b[i * 64 : (i + 1) * 64]
                    ids.append(str(mid))
                    idxs.append(i)
                    frames.append(hashlib.sha256(chunk).hexdigest()[:16])
            yield pd.DataFrame({"media_id": ids, "frame_idx": pd.array(idxs, dtype="int32"), "frame": frames})

    return df.mapInPandas(gen, schema=schema)
