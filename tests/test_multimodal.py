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
    """The driver-visible decode path must emit the true header
    dimensions for every image payload (png IHDR and jpeg SOF both match
    the metadata the payload was built from) and nulls for non-images."""
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
        elif fmt == "jpeg":
            assert (r.img_width, r.img_height, r.img_bit_depth) == (w, h, 8), r
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


def test_jpeg_roundtrip_and_marker_walk():
    from ct_clickhouse_spark.operators.multimodal import (
        JPEG_OVERHEAD,
        jpeg_encode,
        jpeg_parse_sof,
    )

    j = jpeg_encode(b"entropy stand-in", 320, 240)
    assert len(j) == 16 + JPEG_OVERHEAD
    assert jpeg_parse_sof(j) == (320, 240, 8, 3)
    # the walk is generic: an extra COM segment before SOF is skipped
    import struct

    with_com = j[:2] + b"\xff\xfe" + struct.pack(">H", 7) + b"hello" + j[2:]
    assert jpeg_parse_sof(with_com) == (320, 240, 8, 3)
    assert jpeg_parse_sof(b"not a jpeg") is None
    assert jpeg_parse_sof(j[:6]) is None  # truncated before SOF


def test_mp4_roundtrip_and_box_walk():
    import struct

    from ct_clickhouse_spark.operators.multimodal import (
        MP4_OVERHEAD,
        MP4_TIMESCALE,
        mp4_encode,
        mp4_parse_mvhd,
    )

    m = mp4_encode(b"sample data", 7)
    assert len(m) == 11 + MP4_OVERHEAD
    assert mp4_parse_mvhd(m) == (MP4_TIMESCALE, 7 * MP4_TIMESCALE, 0)
    # a free box before moov is skipped by the sibling walk
    free = struct.pack(">I", 12) + b"free" + b"pad!"
    shifted = m[:20] + free + m[20:]
    assert mp4_parse_mvhd(shifted) == (MP4_TIMESCALE, 7 * MP4_TIMESCALE, 0)
    # version-1 mvhd (64-bit times) parses too
    mvhd1 = (
        struct.pack(">I", 120) + b"mvhd" + struct.pack(">BBH", 1, 0, 0)
        + struct.pack(">QQIQ", 0, 0, 90000, 123456789)
        + bytes(80)
    )
    moov = struct.pack(">I", 8 + len(mvhd1)) + b"moov" + mvhd1
    assert mp4_parse_mvhd(moov) == (90000, 123456789, 1)
    assert mp4_parse_mvhd(b"junkjunkjunk") is None


def test_decode_features_real_dims_all_formats(spark):
    """Every format emits REAL decoded header features: jpeg rows get
    SOF dimensions matching the metadata columns, mp4 rows the mvhd
    duration media_id % 30 + 1."""
    from ct_clickhouse_spark.operators.multimodal import (
        MP4_TIMESCALE,
        build_media,
        decode_features,
    )

    feats = {r.media_id: r for r in decode_features(spark, SF_DIR).collect()}
    meta = {r.media_id: r for r in build_media(spark, SF_DIR).collect()}
    n_jpeg = n_mp4 = 0
    for mid, m in meta.items():
        f = feats[mid]
        if m.format == "jpeg":
            n_jpeg += 1
            assert (f.img_width, f.img_height, f.img_bit_depth) == (
                m.width,
                m.height,
                8,
            )
        elif m.format == "mp4":
            n_mp4 += 1
            assert f.video_timescale == MP4_TIMESCALE
            assert f.video_duration_s == float(mid % 30 + 1)
        if m.format in ("jpeg", "mp4"):
            assert f.header_hex  # byte stats still present
    assert n_jpeg > 0 and n_mp4 > 0
