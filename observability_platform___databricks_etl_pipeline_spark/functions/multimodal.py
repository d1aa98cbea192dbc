"""Multimodal (image/audio/video) column plumbing over binary payloads.

Design for a 100 TB training-data lake: media live as opaque ``binary``
columns next to typed metadata structs; decode / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages so each task streams record batches and
never materializes a partition of raw media in Python at once.

The actual codecs (PIL/ffmpeg/soundfile) are NOT in this container. HEADER
metadata is fully real — stdlib ``struct`` parses of PNG IHDR and JPEG SOF
dimensions, WAV ``fmt ``/``data`` chunks (sample rate, channels, bit depth,
duration) and MP4 ``moov/mvhd`` (timescale → duration) — so only PIXEL/PCM
decode remains a stub: ``extract_features`` produces a deterministic fake
embedding (sha256-seeded) clearly marked as a stand-in. The Spark-side
plumbing — schema, batch iteration, partition sizing — is real and tested.
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
    LongType,
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
        # int64: a >2 GiB payload (the very largesize-mp4 shape the parser
        # supports) would wrap negative in int32
        StructField("n_bytes", LongType()),
        # audio/video header metadata (null for still images)
        StructField("sample_rate", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("bits_per_sample", IntegerType()),
        StructField("duration_ms", LongType()),
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


# SOF markers carrying frame dimensions (excluding DHT C4 / JPG C8 / DAC CC)
_JPEG_SOF = {m for m in range(0xC0, 0xD0)} - {0xC4, 0xC8, 0xCC}


def _jpeg_dims(b: bytes) -> tuple[int | None, int | None]:
    """Walk JPEG marker segments to the first SOFn: (height, width) live at
    bytes 1-4 of its payload (after the precision byte)."""
    i = 2  # skip SOI
    n = len(b)
    while i + 4 <= n:
        if b[i] != 0xFF:
            return None, None
        # the spec permits any number of 0xFF FILL bytes before a marker:
        # advance past them so the marker byte is never itself read as 0xFF
        # (which would fall through to the length read and derail the walk)
        while i + 1 < n and b[i + 1] == 0xFF:
            i += 1
        if i + 4 > n:
            return None, None
        marker = b[i + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            i += 2  # standalone markers have no length field
            continue
        if i + 4 > n:
            return None, None
        seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
        if marker in _JPEG_SOF:
            if i + 9 <= n:
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return int(w), int(h)
            return None, None
        if marker == 0xDA:  # SOS — entropy data follows; dims were earlier
            return None, None
        i += 2 + seg_len
    return None, None


def _wav_meta(b: bytes) -> tuple[int | None, int | None, int | None, int | None]:
    """(sample_rate, channels, bits_per_sample, duration_ms) from the RIFF
    ``fmt `` chunk + ``data`` chunk size — stdlib struct only, no codec."""
    rate = ch = bits = byte_rate = data_size = None
    i = 12  # past RIFF<size>WAVE
    n = len(b)
    while i + 8 <= n:
        cid = b[i : i + 4]
        csize = struct.unpack("<I", b[i + 4 : i + 8])[0]
        if cid == b"fmt " and csize >= 12 and i + 20 <= n:
            _fmt, ch, rate, byte_rate = struct.unpack("<HHII", b[i + 8 : i + 20])
            # wBitsPerSample exists only in the >=16-byte fmt layout; a
            # legacy 14-byte WAVE_FORMAT chunk must not read into the next
            # chunk's header
            if csize >= 16 and i + 24 <= n:
                bits = struct.unpack("<H", b[i + 22 : i + 24])[0]
        elif cid == b"data":
            data_size = csize
        i += 8 + csize + (csize & 1)  # chunks are word-aligned
    dur = None
    if data_size is not None and byte_rate:
        dur = int(data_size * 1000 // byte_rate)
    return (
        int(rate) if rate else None,
        int(ch) if ch else None,
        int(bits) if bits else None,
        dur,
    )


def _mp4_duration_ms(b: bytes) -> int | None:
    """moov/mvhd timescale + duration → milliseconds. Only walks box
    headers (size/type), never media data. Handles the 64-bit ``largesize``
    encoding (size==1, standard for >4 GB mdat — exactly the large-media
    shape this path targets) and size==0 ("box extends to end of file");
    any malformed box degrades to None, never an exception (one corrupt
    file must not fail a whole mapInPandas task)."""

    def boxes(lo: int, hi: int):
        i = lo
        while i + 8 <= hi:
            size = struct.unpack(">I", b[i : i + 4])[0]
            typ = b[i + 4 : i + 8]
            payload = i + 8
            if size == 1:  # 64-bit largesize follows the type
                if i + 16 > hi:
                    return
                size = struct.unpack(">Q", b[i + 8 : i + 16])[0]
                payload = i + 16
                if size < 16:
                    return
            elif size == 0:  # box extends to end of enclosing scope
                size = hi - i
            elif size < 8:
                return
            yield typ, payload, min(i + size, hi)
            i += size

    try:
        for typ, lo, hi in boxes(0, len(b)):
            if typ != b"moov":
                continue
            for t2, l2, h2 in boxes(lo, hi):
                if t2 != b"mvhd":
                    continue
                version = b[l2] if h2 - l2 >= 1 else None
                if version == 1:
                    if h2 - l2 < 32:
                        return None  # truncated v1 body — never misparse as v0
                    timescale = struct.unpack(">I", b[l2 + 20 : l2 + 24])[0]
                    duration = struct.unpack(">Q", b[l2 + 24 : l2 + 32])[0]
                elif version == 0:
                    if h2 - l2 < 20:
                        return None
                    timescale = struct.unpack(">I", b[l2 + 12 : l2 + 16])[0]
                    duration = struct.unpack(">I", b[l2 + 16 : l2 + 20])[0]
                else:
                    return None
                if timescale:
                    return int(duration * 1000 // timescale)
    except (struct.error, IndexError):
        return None
    return None


def decode_image_meta(df: DataFrame, id_col: str = "media_id", bin_col: str = "payload") -> DataFrame:
    """mapInPandas stage: binary payload → typed metadata struct columns.

    Header parsing is REAL for every supported container — PNG IHDR + JPEG
    SOF dimensions, WAV fmt/data (rate, channels, bit depth, duration), MP4
    mvhd (duration) — all stdlib ``struct``; only full pixel/PCM decode
    requires codecs and raises NotImplementedError via ``decode_pixels``.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf[bin_col]
            fmts, widths, heights = [], [], []
            rates, chans, bits_l, durs = [], [], [], []
            for b in payload:
                b = bytes(b) if b is not None else b""
                fmt = _sniff_format(b)
                w = h = rate = ch = bits = dur = None
                if fmt == "png":
                    w, h = _png_dims(b)
                elif fmt == "jpeg":
                    w, h = _jpeg_dims(b)
                elif fmt == "wav":
                    rate, ch, bits, dur = _wav_meta(b)
                elif fmt == "mp4":
                    dur = _mp4_duration_ms(b)
                fmts.append(fmt)
                widths.append(w)
                heights.append(h)
                rates.append(rate)
                chans.append(ch)
                bits_l.append(bits)
                durs.append(dur)
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype(str),
                    "format": fmts,
                    "width": pd.array(widths, dtype="Int32"),
                    "height": pd.array(heights, dtype="Int32"),
                    "n_bytes": payload.map(lambda x: len(x) if x is not None else 0).astype(
                        "int64"
                    ),
                    "sample_rate": pd.array(rates, dtype="Int32"),
                    "channels": pd.array(chans, dtype="Int32"),
                    "bits_per_sample": pd.array(bits_l, dtype="Int32"),
                    "duration_ms": pd.array(durs, dtype="Int64"),
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
