"""Multimodal media ops: the resize kernel must be an exact
nearest-neighbor resample of the payload buffer, not a placeholder."""

from __future__ import annotations

import numpy as np

from ct_clickhouse_spark.catalog import load_table
from ct_clickhouse_spark.operators import multimodal
from tests.conftest import SF_DIR

TARGET_W, TARGET_H = 48, 32


def _expected_resize(fmt: str, payload: bytes, w: int, h: int) -> bytes:
    """Reference resample: codec-decode the pixels (png losslessly, jpeg
    through the real lossy round trip), then nearest-neighbor gather —
    the same contract resize_media now implements."""
    from ct_clickhouse_spark.functions.jpeg import jpeg_decode_gray

    img = (
        multimodal.png_decode_pixels(payload)
        if fmt == "png"
        else jpeg_decode_gray(payload)
    )
    assert img is not None, f"{fmt} payload failed to decode"
    h, w = img.shape
    yi = np.arange(TARGET_H) * h // TARGET_H
    xi = np.arange(TARGET_W) * w // TARGET_W
    return img[yi][:, xi].tobytes()


def test_resize_media_exact_nearest_neighbor(spark):
    media = {
        r.media_id: (r.format, bytes(r.payload), r.width, r.height)
        for r in multimodal.build_media(spark, SF_DIR)
        .filter("kind = 'image'")
        .collect()
    }
    assert media, "fixture should contain image-kind media"
    out = multimodal.resize_media(spark, SF_DIR, TARGET_W, TARGET_H).collect()
    assert len(out) == len(media)  # 1 image in -> 1 image out
    for r in out:
        fmt, payload, w, h = media[r.media_id]
        assert (r.width, r.height) == (TARGET_W, TARGET_H)
        assert len(bytes(r.payload)) == TARGET_W * TARGET_H
        assert bytes(r.payload) == _expected_resize(fmt, payload, w, h)


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


def test_jpeg_real_codec_roundtrip_and_marker_walk():
    import numpy as np

    from ct_clickhouse_spark.functions.jpeg import (
        jpeg_decode_gray,
        jpeg_encode_gray,
    )
    from ct_clickhouse_spark.operators.multimodal import jpeg_parse_sof

    rng = np.random.default_rng(7)

    # flat blocks survive quantization exactly: bit-exact round trip
    flat = np.full((24, 40), 130, dtype=np.uint8)
    assert (jpeg_decode_gray(jpeg_encode_gray(flat)) == flat).all()

    # arbitrary content round-trips within normal quantization error
    img = rng.integers(0, 256, (57, 83), dtype=np.uint8)  # odd dims too
    j = jpeg_encode_gray(img, quality=75)
    dec = jpeg_decode_gray(j)
    assert dec.shape == (57, 83)
    assert float(np.abs(dec.astype(int) - img.astype(int)).mean()) < 16.0

    # the scan data is REAL entropy coding: content-dependent length,
    # and the stream is self-describing (DQT/DHT read back from it)
    assert len(jpeg_encode_gray(flat)) != len(jpeg_encode_gray(img[:24, :40]))

    assert jpeg_parse_sof(j) == (83, 57, 8, 1)
    # the walk is generic: an extra COM segment before SOF is skipped
    import struct

    with_com = j[:2] + b"\xff\xfe" + struct.pack(">H", 7) + b"hello" + j[2:]
    assert jpeg_parse_sof(with_com) == (83, 57, 8, 1)
    assert jpeg_parse_sof(b"not a jpeg") is None
    assert jpeg_parse_sof(j[:6]) is None  # truncated before SOF
    assert jpeg_decode_gray(b"not a jpeg") is None


def test_jpeg_restart_interval_roundtrip():
    """DRI/RST0-7 streams (r7 verdict #6): an encode with a restart
    interval must decode IDENTICALLY to the plain encode of the same
    image — restart markers change only the entropy-stream framing, not
    the quantized coefficients — including DC-predictor resets at every
    chunk, >8 intervals (RSTn wraps mod 8), and a non-dividing interval
    tail. A truncated restart stream must return None, not mis-decode."""
    import numpy as np

    from ct_clickhouse_spark.functions.jpeg import (
        jpeg_decode_gray,
        jpeg_encode_gray,
    )

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (57, 83), dtype=np.uint8)
    # 57x83 -> 8x11 = 88 blocks; interval 3 gives 29 chunks + tail
    # (exercises marker-id wraparound D0..D7 several times over)
    plain = jpeg_decode_gray(jpeg_encode_gray(img, quality=75))
    for interval in (1, 3, 88, 200):
        j = jpeg_encode_gray(img, quality=75, restart_interval=interval)
        assert b"\xff\xdd" in j  # DRI present whenever an interval is set
        if interval < 88:  # no RST follows the LAST MCU group
            assert b"\xff\xd0" in j
        dec = jpeg_decode_gray(j)
        assert dec is not None, f"restart interval {interval} failed"
        assert (dec == plain).all(), f"interval {interval} diverged"

    # a gradient makes DC prediction matter: resets must be honored
    grad = np.tile(np.arange(0, 256, 4, dtype=np.uint8), (16, 1))
    gplain = jpeg_decode_gray(jpeg_encode_gray(grad))
    gr = jpeg_decode_gray(jpeg_encode_gray(grad, restart_interval=2))
    assert gr is not None and (gr == gplain).all()

    # truncation: drop the last restart chunk -> None, never garbage
    j = jpeg_encode_gray(img, quality=75, restart_interval=3)
    last_rst = max(j.rfind(bytes((0xFF, 0xD0 + n))) for n in range(8))
    assert jpeg_decode_gray(j[: last_rst + 2] + b"\xff\xd9") is None


def test_png_decode_pixels_full_unfiltering():
    """png_decode_pixels handles all five scanline filters, not just the
    filter-0 rows png_encode writes: build a PNG by hand with each
    filter type and check the decode against a reference unfilter."""
    import struct
    import zlib

    import numpy as np

    from ct_clickhouse_spark.operators.multimodal import (
        _PNG_MAGIC,
        png_decode_pixels,
        png_encode,
    )

    # round-trip of our own encoder first
    img = np.arange(48, dtype=np.uint8).reshape(6, 8) * 5
    assert (png_decode_pixels(png_encode(img.tobytes(), 8, 6)) == img).all()

    # hand-built stream: rows filtered as None/Sub/Up/Average/Paeth
    truth = np.array(
        [[10, 20, 30, 40], [12, 24, 36, 48], [13, 26, 39, 52],
         [20, 30, 40, 50], [25, 35, 45, 55]],
        dtype=np.uint8,
    )
    h, w = truth.shape
    raw = bytearray()
    prev = np.zeros(w, dtype=int)
    for y, f in enumerate([0, 1, 2, 3, 4]):
        row = truth[y].astype(int)
        if f == 0:
            enc = row
        elif f == 1:
            enc = [(row[x] - (row[x - 1] if x else 0)) % 256 for x in range(w)]
        elif f == 2:
            enc = (row - prev) % 256
        elif f == 3:
            enc = [
                (row[x] - (((row[x - 1] if x else 0) + prev[x]) >> 1)) % 256
                for x in range(w)
            ]
        else:  # paeth
            enc = []
            for x in range(w):
                a = row[x - 1] if x else 0
                b, c = int(prev[x]), int(prev[x - 1]) if x else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                enc.append((row[x] - pred) % 256)
        raw.append(f)
        raw.extend(int(v) for v in enc)
        prev = row

    def chunk(typ, payload):
        return (
            struct.pack(">I", len(payload)) + typ + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    png = (
        _PNG_MAGIC + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    assert (png_decode_pixels(png) == truth).all()
    assert png_decode_pixels(b"nope") is None


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


def _noisy(rng, img, n_px):
    out = img.copy()
    ys = rng.integers(0, img.shape[0], n_px)
    xs = rng.integers(0, img.shape[1], n_px)
    out[ys, xs] = rng.integers(0, 256, n_px)
    return out


def test_phash_cross_format_and_noise_robustness():
    """The same pixels as PNG and as (lossy) JPEG hash within a few
    bits, and a lightly-noised copy stays inside the near-dup ball while
    a distinct random image is far outside it."""
    import numpy as np

    from ct_clickhouse_spark.functions.jpeg import (
        jpeg_decode_gray,
        jpeg_encode_gray,
    )
    from ct_clickhouse_spark.operators.multimodal import (
        dhash64,
        phash64,
        png_decode_pixels,
        png_encode,
    )

    rng = np.random.default_rng(11)
    # smooth-ish structured image (random low-freq content upsampled)
    base = rng.integers(0, 256, (8, 8)).astype(np.uint8)
    img = base[np.arange(96) // 12][:, np.arange(128) // 16]

    png_px = png_decode_pixels(png_encode(img.tobytes(), 128, 96))
    jpg_px = jpeg_decode_gray(jpeg_encode_gray(img, quality=85))
    assert (png_px == img).all()  # png is lossless

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(phash64(png_px), phash64(jpg_px)) <= 4  # re-encode robust
    assert ham(phash64(img), phash64(_noisy(rng, img, 60))) <= 6
    other = rng.integers(0, 256, (8, 8)).astype(np.uint8)
    other = other[np.arange(96) // 12][:, np.arange(128) // 16]
    assert ham(phash64(img), phash64(other)) > 10
    assert ham(dhash64(img), dhash64(_noisy(rng, img, 60))) <= 8


def test_image_near_dup_pairs_planted_recall_and_precision(spark):
    """Band-join near-dup detection over planted duplicates: every
    planted (original, copy) pair is found (banding recall is exactly 1
    for hamming <= 6 by pigeonhole), no pair among the distinct images,
    and the groups keep one representative per component."""
    import numpy as np

    from ct_clickhouse_spark.operators.multimodal import (
        image_near_dup_groups,
        image_near_dup_pairs,
        phash64,
    )

    rng = np.random.default_rng(23)
    rows = []
    planted = []
    mid = 0
    for i in range(12):
        base = rng.integers(0, 256, (8, 8)).astype(np.uint8)
        img = base[np.arange(64) // 8][:, np.arange(64) // 8]
        rows.append((mid, "png", phash64(img), 0))
        if i < 4:  # plant a near-copy of the first four
            rows.append((mid + 100, "png", phash64(_noisy(rng, img, 30)), 0))
            planted.append((mid, mid + 100))
        mid += 1
    sigs = spark.createDataFrame(
        rows, "media_id long, format string, phash long, dhash long"
    )
    got = {
        (r.media_a, r.media_b)
        for r in image_near_dup_pairs(sigs).collect()
    }
    for pair in planted:
        assert pair in got, f"planted near-dup {pair} missed"
    # precision: nothing between distinct random images
    distinct_ids = {r[0] for r in rows if r[0] < 100}
    assert not {
        p for p in got if p[0] in distinct_ids and p[1] in distinct_ids
    }

    labels = {
        r.id: r.label for r in image_near_dup_groups(sigs).collect()
    }
    for a, b in planted:
        assert labels[a] == labels[b] == a  # canonical = component min
    keepers = [i for i, lab in labels.items() if i == lab]
    assert len(keepers) == 12  # 8 singletons + 4 two-image components


def test_image_signatures_cover_both_formats(spark):
    """Every png AND jpeg image in the media table yields a signature —
    the jpeg side proves the real entropy decode runs at table scale."""
    from pyspark.sql import functions as F

    from ct_clickhouse_spark.operators.multimodal import (
        build_media,
        image_signatures,
    )

    sigs = image_signatures(spark, SF_DIR)
    by_fmt = {r["format"]: r["n"] for r in sigs.groupBy("format").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    media = build_media(spark, SF_DIR).filter(F.col("kind") == "image")
    want = {r["format"]: r["n"] for r in media.groupBy("format").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert by_fmt == want and set(by_fmt) == {"png", "jpeg"}


def test_audio_fingerprint_robust_to_noise_and_gain():
    """The spectral-sign fingerprint must survive additive noise and
    gain scaling (the Haitsma-Kalker robustness properties) while
    distinct clips land far apart."""
    import numpy as np

    from ct_clickhouse_spark.operators.multimodal import audio_fingerprint64

    rng = np.random.default_rng(5)
    t = np.arange(4000)
    clip = (
        3000 * np.sin(2 * np.pi * t / 50)
        + 2000 * np.sin(2 * np.pi * t / 13)
        + 500 * rng.normal(size=t.size)
    ).astype(np.int16)

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    base = audio_fingerprint64(clip)
    # noise at ~2% of signal amplitude sits inside the default Hamming-6
    # ball; heavier corruption costs bits roughly linearly (the
    # ball radius trades recall against noise amplitude)
    noisy = (clip + 80 * rng.normal(size=clip.size)).astype(np.int16)
    assert ham(base, audio_fingerprint64(noisy)) <= 6
    scaled = (clip * 0.7).astype(np.int16)  # gain change: signs invariant
    assert ham(base, audio_fingerprint64(scaled)) <= 6
    other = (
        3000 * np.sin(2 * np.pi * t / 37)
        + 2000 * np.sin(2 * np.pi * t / 7)
        + 500 * rng.normal(size=t.size)
    ).astype(np.int16)
    assert ham(base, audio_fingerprint64(other)) > 10


def test_audio_near_dup_planted_recall(spark):
    """Band-join recall over planted noisy audio copies; precision over
    distinct clips; groups keep one representative per component."""
    import numpy as np

    from ct_clickhouse_spark.operators.multimodal import (
        audio_fingerprint64,
        audio_near_dup_groups,
        audio_near_dup_pairs,
    )

    rng = np.random.default_rng(9)
    t = np.arange(3000)
    rows, planted = [], []
    for i in range(10):
        clip = (
            3000 * np.sin(2 * np.pi * t / (11 + 6 * i))
            + 1500 * np.sin(2 * np.pi * t / (5 + i))
            + 400 * rng.normal(size=t.size)
        ).astype(np.int16)
        rows.append((i, audio_fingerprint64(clip)))
        if i < 3:
            noisy = (clip + 80 * rng.normal(size=t.size)).astype(np.int16)
            rows.append((i + 100, audio_fingerprint64(noisy)))
            planted.append((i, i + 100))
    sigs = spark.createDataFrame(rows, "media_id long, afp long")
    got = {(r.media_a, r.media_b) for r in audio_near_dup_pairs(sigs).collect()}
    for pair in planted:
        assert pair in got, f"planted audio near-dup {pair} missed"
    base_ids = {r[0] for r in rows if r[0] < 100}
    assert not {p for p in got if p[0] in base_ids and p[1] in base_ids}
    labels = {r.id: r.label for r in audio_near_dup_groups(sigs).collect()}
    for a, b in planted:
        assert labels[a] == labels[b] == a


def test_audio_signatures_cover_every_audio_row(spark):
    """Every audio row in the media table yields a fingerprint — the
    real PCM decode runs at table scale."""
    from pyspark.sql import functions as F

    from ct_clickhouse_spark.operators.multimodal import (
        audio_signatures,
        build_media,
        wav_decode_samples,
        wav_encode,
    )

    # decode inverts encode exactly: samples are (byte-128)<<8
    payload = wav_encode(b"decode me", 8000)
    got = wav_decode_samples(payload)
    want = [(b - 128) << 8 for b in b"decode me"]
    assert got.tolist() == want

    n_sigs = audio_signatures(spark, SF_DIR).count()
    n_audio = (
        build_media(spark, SF_DIR).filter(F.col("kind") == "audio").count()
    )
    assert n_sigs == n_audio > 0


def test_jpeg_fill_bytes_and_dri_mismatch():
    """T.81 B.1.1.2 allows any number of 0xFF fill bytes before a marker
    (including RSTn): a conforming stream using them must decode
    identically (r8 advice). And a DRI value that disagrees with the
    actual restart spacing must return None — never a silently wrong
    image (restart chunks are validated to be consumed to within their
    byte-align padding)."""
    import numpy as np

    from ct_clickhouse_spark.functions.jpeg import (
        jpeg_decode_gray,
        jpeg_encode_gray,
    )

    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (40, 56), dtype=np.uint8)
    plain = jpeg_decode_gray(jpeg_encode_gray(img, quality=75))

    j = jpeg_encode_gray(img, quality=75, restart_interval=3)
    sos = j.find(b"\xff\xda")
    assert sos > 0
    head, scan = j[:sos], j[sos:]
    # insert fill bytes before every marker in the scan: raw 0xFF in
    # entropy data is always stuffed (0xFF00), so 0xFF followed by
    # 0xD0-0xD9 here is a real marker
    filled = bytearray()
    i = 0
    while i < len(scan):
        if (
            scan[i] == 0xFF
            and i + 1 < len(scan)
            and 0xD0 <= scan[i + 1] <= 0xD9
            and i > 1  # not the SOS marker itself
        ):
            filled += b"\xff\xff\xff"  # two fill bytes + the marker's 0xFF
            filled.append(scan[i + 1])
            i += 2
            continue
        filled.append(scan[i])
        i += 1
    dec = jpeg_decode_gray(head + bytes(filled))
    assert dec is not None, "fill bytes before markers must decode"
    assert (dec == plain).all()

    # DRI/RST-spacing mismatch: patch the DRI segment (FF DD 00 04 HH LL)
    # to claim a different interval than the stream's actual RST spacing
    dri = j.find(b"\xff\xdd")
    assert dri > 0 and j[dri + 2 : dri + 4] == b"\x00\x04"
    for wrong in (2, 4):
        patched = j[: dri + 4] + bytes((0, wrong)) + j[dri + 6 :]
        assert jpeg_decode_gray(patched) is None, (
            f"DRI={wrong} vs actual spacing 3 must reject, not mis-decode"
        )
