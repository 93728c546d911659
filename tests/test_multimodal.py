"""Multimodal media ops: the resize kernel must be an exact
nearest-neighbor resample of the payload buffer, not a placeholder."""

from __future__ import annotations

import numpy as np

from ct_clickhouse_spark.catalog import load_table
from ct_clickhouse_spark.operators import multimodal
from tests.conftest import SF_DIR

TARGET_W, TARGET_H = 48, 32


def _expected_resize(payload: bytes, w: int, h: int) -> bytes:
    buf = np.frombuffer(payload, dtype=np.uint8)[: w * h]
    if buf.size < w * h:
        buf = np.pad(buf, (0, w * h - buf.size))
    img = buf.reshape(h, w)
    yi = np.arange(TARGET_H) * h // TARGET_H
    xi = np.arange(TARGET_W) * w // TARGET_W
    return img[yi][:, xi].tobytes()


def test_resize_media_exact_nearest_neighbor(spark):
    media = {
        r.media_id: (bytes(r.payload), r.width, r.height)
        for r in multimodal.build_media(spark, SF_DIR)
        .filter("kind = 'image'")
        .collect()
    }
    assert media, "fixture should contain image-kind media"
    out = multimodal.resize_media(spark, SF_DIR, TARGET_W, TARGET_H).collect()
    assert len(out) == len(media)  # 1 image in -> 1 image out
    for r in out:
        payload, w, h = media[r.media_id]
        assert (r.width, r.height) == (TARGET_W, TARGET_H)
        assert len(bytes(r.payload)) == TARGET_W * TARGET_H
        assert bytes(r.payload) == _expected_resize(payload, w, h)


def test_resize_media_runs_distributed(spark):
    """The resize runs as mapInPandas over the scan — no collect, no
    single-task bottleneck beyond the fixture's one input split."""
    plan = (
        multimodal.resize_media(spark, SF_DIR, TARGET_W, TARGET_H)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" in plan


def test_png_encode_produces_valid_closed_form_png():
    """png_encode must emit a REAL PNG: magic, CRC-valid chunks, a zlib
    stream that decompresses to exactly h*(w+1) scanline bytes, and the
    closed-form total length the SQL oracle relies on."""
    import struct
    import zlib

    for w, h, data in [(64, 64, b"hello world"), (96, 64, b""), (288, 192, b"x" * 9999)]:
        png = multimodal.png_encode(data, w, h)
        assert len(png) == h * (w + 1) + 68
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        # walk chunks, verifying each CRC
        pos, chunks = 8, []
        while pos < len(png):
            (length,) = struct.unpack(">I", png[pos : pos + 4])
            typ = png[pos + 4 : pos + 8]
            payload = png[pos + 8 : pos + 8 + length]
            (crc,) = struct.unpack(">I", png[pos + 8 + length : pos + 12 + length])
            assert crc == zlib.crc32(typ + payload) & 0xFFFFFFFF, typ
            chunks.append((typ, payload))
            pos += 12 + length
        assert [t for t, _ in chunks] == [b"IHDR", b"IDAT", b"IEND"]
        got_w, got_h, depth, color = struct.unpack(">IIBB", chunks[0][1][:10])
        assert (got_w, got_h, depth, color) == (w, h, 8, 0)
        raw = zlib.decompress(chunks[1][1])
        assert len(raw) == h * (w + 1)
        assert all(raw[r * (w + 1)] == 0 for r in range(h))  # filter bytes
        assert multimodal.png_parse_ihdr(png) == (w, h, 8)


def test_decode_features_parses_real_png_dimensions(spark):
    """The driver-visible decode path must emit the true IHDR dimensions
    for every png payload (matching the metadata it was built from) and
    nulls for formats without a wired decoder."""
    meta = {
        r.media_id: (r.format, r.width, r.height)
        for r in multimodal.build_media(spark, SF_DIR).collect()
    }
    rows = multimodal.decode_features(spark, SF_DIR).collect()
    n_png = 0
    for r in rows:
        fmt, w, h = meta[r.media_id]
        if fmt == "png":
            n_png += 1
            assert (r.img_width, r.img_height, r.img_bit_depth) == (w, h, 8), r
            assert r.n_bytes == h * (w + 1) + 68
        else:
            assert r.img_width is None and r.img_height is None
    assert n_png > 0, "fixture contains no png media — vacuous"


def test_png_parse_rejects_non_png():
    assert multimodal.png_parse_ihdr(b"plain text payload") is None
    assert multimodal.png_parse_ihdr(b"\x89PNG\r\n\x1a\n" + b"short") is None


def test_wav_encode_is_valid_for_stdlib_wave_module():
    """The encoded WAV must be a real file a third-party reader accepts —
    validated with the stdlib ``wave`` codec, not our own parser."""
    import io
    import wave

    data = b"hello wav world"
    payload = multimodal.wav_encode(data, 16000)
    assert len(payload) == 44 + 2 * len(data)  # the closed form
    with wave.open(io.BytesIO(payload)) as wf:
        assert wf.getnchannels() == 1
        assert wf.getsampwidth() == 2
        assert wf.getframerate() == 16000
        assert wf.getnframes() == len(data)
        frames = wf.readframes(len(data))
    # sample values: each byte centered to int16 ((b-128)<<8)
    import numpy as np

    got = np.frombuffer(frames, dtype="<i2")
    want = (np.frombuffer(data, dtype=np.uint8).astype(np.int16) - 128) << 8
    assert (got == want).all()
    # empty payload is still a valid zero-frame WAV
    with wave.open(io.BytesIO(multimodal.wav_encode(b"", 8000))) as wf:
        assert wf.getnframes() == 0


def test_decode_features_parses_real_wav_headers(spark):
    """Audio rows must emit the true sample rate (derived from media_id),
    mono 16-bit, and a sample count matching the closed-form length;
    non-audio rows stay null in the audio columns."""
    rows = multimodal.decode_features(spark, SF_DIR).collect()
    n_wav = 0
    for r in rows:
        if r.kind == "audio":
            n_wav += 1
            want_rate = multimodal._WAV_SAMPLE_RATES[r.media_id % 4]
            assert r.audio_sample_rate == want_rate, r
            assert r.audio_channels == 1
            assert r.audio_n_samples == (r.n_bytes - 44) // 2
        else:
            assert r.audio_sample_rate is None and r.audio_n_samples is None
    assert n_wav > 0, "fixture contains no audio media — vacuous"


def test_wav_parse_rejects_non_wav():
    assert multimodal.wav_parse_header(b"plain text payload" * 4) is None
    assert multimodal.wav_parse_header(b"RIFF1234WAVEfmt " + b"x" * 40) is None


def test_wav_parse_clamps_truncated_data_chunk():
    """Intact headers + truncated sample data must not report samples
    that don't exist."""
    full = multimodal.wav_encode(b"0123456789", 8000)
    truncated = full[: 44 + 6]  # 3 of 10 samples survive
    parsed = multimodal.wav_parse_header(truncated)
    assert parsed is not None and parsed[3] == 3
