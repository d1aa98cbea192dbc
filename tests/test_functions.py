import pandas as pd

from observability_platform___databricks_etl_pipeline_spark.functions.classify import classify_op_series
from observability_platform___databricks_etl_pipeline_spark.functions.langinfer import infer_lang_series
from observability_platform___databricks_etl_pipeline_spark.functions.sanitize import sanitize_series
from observability_platform___databricks_etl_pipeline_spark.functions.text import rolling_hash_series


def test_sanitize_redacts_and_is_idempotent():
    s = pd.Series(
        [
            "mail me at alice@example.com thanks",
            "token=Bearer abcDEF123456 card 4111 1111 1111 1111",
            "server at 192.168.0.1 ok",
            "api_key: supersecret123",
            None,
            "nothing to redact",
        ]
    )
    once = sanitize_series(s)
    assert "alice@example.com" not in once[0] and "[REDACTED_EMAIL]" in once[0]
    assert "[REDACTED_TOKEN]" in once[1] and "[REDACTED_CC]" in once[1]
    assert "[REDACTED_IP]" in once[2]
    assert "[REDACTED_SECRET]" in once[3]
    assert once[4] is None or pd.isna(once[4])
    assert once[5] == "nothing to redact"
    twice = sanitize_series(once)
    assert (once.fillna("∅") == twice.fillna("∅")).all()


def test_infer_lang_extension_and_content():
    path = pd.Series(["a/b.py", "x.rs", "noext", "script", "m.md"])
    content = pd.Series(["", "", "#!/bin/bash\necho", "def foo(): pass", ""])
    out = infer_lang_series(path, content)
    assert list(out) == ["python", "rust", "shell", "python", "markdown"]


def test_classify_op_aliases_and_fallback():
    op = pd.Series(["INSERT", "u", "rm", None, None, "bogus"])
    content = pd.Series(["x", "x", None, None, "has content", "x"])
    out = classify_op_series(op, content)
    assert list(out) == ["insert", "update", "delete", "delete", "update", "update"]


def test_rolling_hash_deterministic():
    s = pd.Series(["hello world", "hello world", "hello worlds", None])
    h = rolling_hash_series(s)
    assert h[0] == h[1]
    assert h[0] != h[2]
    assert h[3] == 0


def test_text_columns_on_spark(spark):
    from observability_platform___databricks_etl_pipeline_spark.functions.text import (
        bpeish_token_count,
        fingerprint_md5,
        lang_id,
        quality_score,
        ws_token_count,
    )

    df = spark.createDataFrame(
        [("the cat and the dog is on a mat",), ("der hund und die katze ist gut",), ("",)],
        ["text"],
    )
    rows = df.select(
        ws_token_count("text").alias("ws"),
        bpeish_token_count("text").alias("bpe"),
        quality_score("text").alias("q"),
        fingerprint_md5("text").alias("fp"),
        lang_id("text").alias("lang"),
    ).collect()
    assert rows[0]["ws"] == 9
    assert rows[0]["lang"] == "en"
    assert rows[1]["lang"] == "de"
    assert rows[2]["ws"] == 0
    assert 0.0 <= rows[0]["q"] <= 1.0
    assert len(rows[0]["fp"]) == 32


def test_multimodal_stubs(spark):
    import struct as _s

    from observability_platform___databricks_etl_pipeline_spark.functions.multimodal import (
        decode_image_meta,
        extract_features,
        sample_frames,
    )

    png = b"\x89PNG\r\n\x1a\n" + _s.pack(">I", 13) + b"IHDR" + _s.pack(">II", 640, 480) + b"\0" * 5
    jpg = b"\xff\xd8\xff\xe0" + b"\0" * 32
    df = spark.createDataFrame([("m1", bytearray(png)), ("m2", bytearray(jpg))], ["media_id", "payload"])
    meta = {r["media_id"]: r for r in decode_image_meta(df).collect()}
    assert meta["m1"]["format"] == "png" and meta["m1"]["width"] == 640 and meta["m1"]["height"] == 480
    assert meta["m2"]["format"] == "jpeg"
    feats = extract_features(df, dim=8).collect()
    assert all(len(r["embedding"]) == 8 for r in feats)
    # determinism: same payload → same fake embedding
    feats2 = extract_features(df, dim=8).collect()
    assert sorted(map(str, feats)) == sorted(map(str, feats2))
    frames = sample_frames(df, every_n=1).collect()
    assert len(frames) >= 2


def test_multimodal_header_metadata_real(spark):
    """WAV/MP4/JPEG header metadata is parsed for real with stdlib struct
    (r3 verdict #7) — only pixel/PCM decode remains stubbed."""
    import struct as _s

    from observability_platform___databricks_etl_pipeline_spark.functions.multimodal import (
        decode_image_meta,
    )

    # 16-bit stereo 8kHz WAV with 1600 bytes of data → 50 ms
    fmt = _s.pack("<HHIIHH", 1, 2, 8000, 8000 * 2 * 2, 4, 16)
    wav = (
        b"RIFF" + _s.pack("<I", 36 + 1600) + b"WAVE"
        + b"fmt " + _s.pack("<I", 16) + fmt
        + b"data" + _s.pack("<I", 1600) + b"\0" * 1600
    )
    # minimal MP4: ftyp + moov>mvhd v0 (timescale 1000, duration 2500 → 2500 ms)
    ftyp = _s.pack(">I", 16) + b"ftypisom" + b"\0" * 4
    mvhd_body = b"\0\0\0\0" + _s.pack(">II", 0, 0) + _s.pack(">II", 1000, 2500) + b"\0" * 80
    mvhd = _s.pack(">I", 8 + len(mvhd_body)) + b"mvhd" + mvhd_body
    moov = _s.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    mp4 = ftyp + moov
    # JPEG with SOF0: 320x240
    jpg = (
        b"\xff\xd8"
        + b"\xff\xe0" + _s.pack(">H", 16) + b"JFIF\0" + b"\0" * 9          # APP0
        + b"\xff\xc0" + _s.pack(">H", 11) + b"\x08" + _s.pack(">HH", 240, 320) + b"\x03" + b"\0" * 2
        + b"\xff\xd9"
    )
    df = spark.createDataFrame(
        [("a1", bytearray(wav)), ("v1", bytearray(mp4)), ("i1", bytearray(jpg))],
        ["media_id", "payload"],
    )
    meta = {r["media_id"]: r for r in decode_image_meta(df).collect()}
    a = meta["a1"]
    assert a["format"] == "wav" and a["sample_rate"] == 8000 and a["channels"] == 2
    assert a["bits_per_sample"] == 16 and a["duration_ms"] == 50
    v = meta["v1"]
    assert v["format"] == "mp4" and v["duration_ms"] == 2500
    i = meta["i1"]
    assert i["format"] == "jpeg" and i["width"] == 320 and i["height"] == 240
    assert i["sample_rate"] is None and i["duration_ms"] is None


def test_multimodal_header_edge_cases(spark):
    """Malformed/legacy containers degrade to None fields, never task
    failures: 14-byte legacy WAV fmt (no bits field), MP4 with a 64-bit
    largesize mdat before moov, truncated v1 mvhd, junk bytes."""
    import struct as _s

    from observability_platform___databricks_etl_pipeline_spark.functions.multimodal import (
        decode_image_meta,
    )

    # legacy WAVE_FORMAT: 14-byte fmt chunk, data follows immediately
    fmt14 = _s.pack("<HHIIH", 1, 1, 11025, 11025, 1)
    wav14 = (
        b"RIFF" + _s.pack("<I", 26 + 100) + b"WAVE"
        + b"fmt " + _s.pack("<I", 14) + fmt14
        + b"data" + _s.pack("<I", 100) + b"\0" * 100
    )
    # mp4: largesize mdat (size==1 + 64-bit size) before a valid moov/mvhd v1
    mdat = _s.pack(">I", 1) + b"mdat" + _s.pack(">Q", 24) + b"\0" * 8
    mvhd1 = b"\x01\0\0\0" + _s.pack(">QQ", 0, 0) + _s.pack(">I", 90000) + _s.pack(">Q", 180000) + b"\0" * 76
    mvhd = _s.pack(">I", 8 + len(mvhd1)) + b"mvhd" + mvhd1
    moov = _s.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    ftyp = _s.pack(">I", 16) + b"ftypisom" + b"\0" * 4
    mp4_large = ftyp + mdat + moov
    # truncated v1 mvhd (28-byte body): must yield None, not crash/misparse
    tr_body = b"\x01\0\0\0" + b"\0" * 24
    tr_mvhd = _s.pack(">I", 8 + len(tr_body)) + b"mvhd" + tr_body
    tr_moov = _s.pack(">I", 8 + len(tr_mvhd)) + b"moov" + tr_mvhd
    mp4_trunc = ftyp + tr_moov

    df = spark.createDataFrame(
        [("w", bytearray(wav14)), ("v", bytearray(mp4_large)),
         ("t", bytearray(mp4_trunc)), ("j", bytearray(b"\x00\x01junk"))],
        ["media_id", "payload"],
    )
    meta = {r["media_id"]: r for r in decode_image_meta(df).collect()}
    w = meta["w"]
    assert w["format"] == "wav" and w["sample_rate"] == 11025
    assert w["bits_per_sample"] is None  # legacy fmt: no bits field, no junk read
    assert w["duration_ms"] == 100 * 1000 // 11025
    assert meta["v"]["duration_ms"] == 2000  # 180000 / 90000 ts = 2s, past largesize mdat
    assert meta["t"]["duration_ms"] is None
    assert meta["j"]["format"] == "unknown"
