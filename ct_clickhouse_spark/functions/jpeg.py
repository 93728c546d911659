"""Real baseline JPEG codec — grayscale, pure numpy/stdlib (ITU T.81).

Round-5 verdict item #6 asked for honest JPEG entropy data: the media
table's jpeg payloads previously carried a structurally valid marker
stream whose post-SOS bytes were a stated stand-in. This module is a
complete baseline sequential codec for single-component (grayscale)
images:

encode (``jpeg_encode_gray``): 8x8 block split (edge-replicated pad) ->
level shift -> 2-D DCT-II (orthonormal, one numpy matmul pair per image)
-> quantization (Annex K luminance table, quality-scaled) -> zigzag ->
DC differences + AC run-length -> canonical Huffman coding with the
T.81 Annex K standard tables -> 0xFF byte stuffing -> full marker
stream (SOI, APP0/JFIF, DQT, SOF0, DHT x2, SOS, EOI). The stream is
self-describing: quantization and Huffman tables are embedded, so any
conforming JPEG decoder can read it.

decode (``jpeg_decode_gray``): a real marker parser that reads DQT /
DHT / SOF0 / SOS from the stream (it does NOT assume this encoder's
tables), un-stuffs the entropy bytes, Huffman-decodes DC categories and
AC (run, size) symbols, de-zigzags, dequantizes, applies the inverse
DCT, level-shifts back and crops the block padding.

Lossiness is the real thing too: round-tripping is exact only for
images the quantizer preserves (e.g. flat blocks); natural content
round-trips within the usual quantization error (pinned by tests as a
mean-absolute-error bound, plus exactness on flat images).

No parity citation: the reference stores no media (this is the
engine-completeness tier, SURVEY §2.10); the format itself follows
ITU-T T.81 (public spec), tables from its Annex K.
"""

from __future__ import annotations

import struct

import numpy as np

# ITU T.81 Annex K.1 — luminance quantization table (zigzag order NOT
# applied here; this is row-major natural order).
QTABLE_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

# T.81 Annex K.3.1 — DC luminance: BITS (codes per length 1..16), values
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))

# T.81 Annex K.3.2 — AC luminance
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# zigzag index order (natural row-major index at each zigzag position)
_ZZ = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

# orthonormal DCT-II basis: T @ block @ T.T
_N = 8
_T = np.array(
    [
        [
            (np.sqrt(1 / _N) if u == 0 else np.sqrt(2 / _N))
            * np.cos((2 * x + 1) * u * np.pi / (2 * _N))
            for x in range(_N)
        ]
        for u in range(_N)
    ]
)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 C.2 canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_ENC = _canonical_codes(DC_BITS, DC_VALS)
_AC_ENC = _canonical_codes(AC_BITS, AC_VALS)


def _quant_table(quality: int) -> np.ndarray:
    """IJG quality scaling of the Annex K table (public libjpeg recipe)."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (QTABLE_LUMA * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # T.81 byte stuffing inside entropy data
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        """Pad the current partial byte with 1-bits (T.81 restart-marker
        and end-of-scan byte alignment)."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)

    def raw_marker(self, marker: int) -> None:
        """Append an UNSTUFFED 0xFF<marker> pair — callers must align()
        first so the marker lands on a byte boundary."""
        assert self.nbits == 0, "marker emitted mid-byte"
        self.buf += bytes((0xFF, marker))

    def flush(self) -> bytes:
        self.align()
        return bytes(self.buf)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _amplitude(v: int, size: int) -> int:
    # negative amplitudes are stored one's-complemented (T.81 F.1.2.1)
    return v if v >= 0 else v + (1 << size) - 1


def _dht_segment(tc_th: int, bits: list[int], vals: list[int]) -> bytes:
    payload = bytes([tc_th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload


def jpeg_encode_gray(
    img: np.ndarray, quality: int = 75, restart_interval: int = 0
) -> bytes:
    """Encode a (h, w) uint8 array as a real baseline grayscale JPEG.

    ``restart_interval`` > 0 emits a DRI segment and an RST0-7 marker
    every that-many MCUs with the DC predictor reset (T.81 E.2.4) — the
    stream shape hardware/parallel encoders produce, and what makes the
    decoder's restart handling round-trip testable."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 2:
        raise ValueError("jpeg_encode_gray wants a 2-D grayscale array")
    h, w = img.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if h > 65535 or w > 65535:
        raise ValueError("JPEG dimensions are 16-bit (max 65535)")
    q = _quant_table(quality)
    ph, pw = -h % 8, -w % 8
    padded = np.pad(img, ((0, ph), (0, pw)), mode="edge").astype(np.float64)
    H, W = padded.shape
    # all blocks at once: (nb, 8, 8) -> DCT via two matmuls -> quantize
    blocks = (
        padded.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )
    coef = _T @ (blocks - 128.0) @ _T.T
    qcoef = np.round(coef / q).astype(np.int32)
    zz = qcoef.reshape(-1, 64)[:, _ZZ]

    bw = _BitWriter()
    prev_dc = 0
    for bi, row in enumerate(zz):
        if restart_interval and bi and bi % restart_interval == 0:
            bw.align()
            bw.raw_marker(0xD0 + ((bi // restart_interval - 1) % 8))
            prev_dc = 0
        dc = int(row[0])
        diff = dc - prev_dc
        prev_dc = dc
        size = _category(diff) if diff else 0
        code, length = _DC_ENC[size]
        bw.write(code, length)
        if size:
            bw.write(_amplitude(diff, size), size)
        run = 0
        nz = np.nonzero(row[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(row[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = _AC_ENC[0xF0]  # ZRL: 16 zeros
                bw.write(code, length)
                run -= 16
            size = _category(v)
            code, length = _AC_ENC[(run << 4) | size]
            bw.write(code, length)
            bw.write(_amplitude(v, size), size)
            run = 0
        if last < 63:
            code, length = _AC_ENC[0x00]  # EOB
            bw.write(code, length)
    scan = bw.flush()

    app0 = (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HHBB", 1, 1, 0, 0)
    )
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(
        int(v) for v in q.reshape(-1)[_ZZ]
    )
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) + bytes((1, 0x11, 0))
    dht = _dht_segment(0x00, DC_BITS, DC_VALS) + _dht_segment(0x10, AC_BITS, AC_VALS)
    dri = (
        b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
        if restart_interval
        else b""
    )
    sos = b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes((1, 0x00, 0, 63, 0))
    return (
        b"\xff\xd8" + app0 + dqt + sof0 + dht + dri + sos + scan + b"\xff\xd9"
    )


def _build_decoder(bits: list[int], vals: list[int]):
    """Flat 2^16 peek tables (classic fast-Huffman decode): for a 16-bit
    lookahead window w, sym_tab[w] is the decoded symbol and len_tab[w]
    its code length (0 => invalid code). Build cost is 162 vectorized
    range fills; decode cost is ONE array lookup per symbol instead of a
    Python call per BIT (the per-bit reader was the sf1 bottleneck)."""
    sym_tab = np.zeros(1 << 16, dtype=np.int16)
    len_tab = np.zeros(1 << 16, dtype=np.uint8)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = (code + 1) << (16 - length)
            sym_tab[lo:hi] = vals[k]
            len_tab[lo:hi] = length
            code += 1
            k += 1
        code <<= 1
    return sym_tab, len_tab


def _peek16_all(data: bytes) -> np.ndarray:
    """peek16[i] = the 16 bits starting at bit position i, for every bit
    position of ``data`` — fully vectorized (8 shifted views of a
    32-bit sliding window). Enables the table-driven decode loop to be
    plain integer indexing with no per-bit Python work."""
    x = np.frombuffer(data + b"\xff" * 4, dtype=np.uint8).astype(np.uint32)
    v32 = (x[:-3] << 24) | (x[1:-2] << 16) | (x[2:-1] << 8) | x[3:]
    n = len(data) * 8
    out = np.empty(n, dtype=np.uint32)
    for r in range(8):
        lane = (v32 >> (16 - r)) & 0xFFFF
        out[r::8] = lane[: len(out[r::8])]
    return out


def _extend(v: int, size: int) -> int:
    # inverse of _amplitude (T.81 F.2.2.1 EXTEND)
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def jpeg_decode_gray(payload: bytes) -> np.ndarray | None:
    """Decode a baseline single-component JPEG produced by ANY conforming
    encoder: tables are read from the stream, and DRI/RST0-7 restart
    intervals (the one baseline feature the r7 review found missing) are
    handled — each restart chunk re-aligns to a byte boundary and resets
    the DC predictor; 0xFF fill bytes before markers (T.81 B.1.1.2) are
    skipped, and each restart chunk's bit consumption is checked against
    the chunk boundary so a DRI/RST-spacing mismatch rejects instead of
    mis-decoding. Returns (h, w) uint8, or None if the stream isn't
    a decodable baseline grayscale JPEG (progressive, multi-component,
    or 12-bit streams return None rather than mis-decoding)."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return None
    try:
        return _decode_gray_checked(payload)
    except (ValueError, IndexError, struct.error):
        # malformed tables/segments (truncated DHT, short DQT, corrupt
        # lengths) — a decoder returns None for garbage, it doesn't throw
        return None


def _decode_entropy_chunk(
    destuffed: bytes,
    dc_tab: tuple[np.ndarray, np.ndarray],
    ac_tab: tuple[np.ndarray, np.ndarray],
    out: np.ndarray,
    b0: int,
    nblocks: int,
) -> int:
    """Huffman-decode ``nblocks`` blocks from one byte-aligned entropy
    chunk (the whole scan, or one restart interval) into
    ``out[b0:b0+nblocks]``. The DC predictor starts at 0 — per T.81
    E.2.4 it resets at every restart marker. Returns the number of bits
    consumed (so the caller can verify the chunk was consumed to within
    its byte-align padding — a DRI value that disagrees with the actual
    RST spacing must yield None, not a silently wrong image), or -1 on
    any malformed code / truncation."""
    peek = _peek16_all(destuffed)
    dc_sym, dc_len = dc_tab
    ac_sym, ac_len = ac_tab
    n_bits = len(peek)
    prev_dc = 0
    i = 0
    try:
        for b in range(b0, b0 + nblocks):
            row = out[b]
            wd = peek[i]
            ln = dc_len[wd]
            if ln == 0:
                raise ValueError("invalid DC code")
            size = int(dc_sym[wd])
            i += ln
            if size:
                diff = _extend(int(peek[i]) >> (16 - size), size)
                i += size
            else:
                diff = 0
            prev_dc += diff
            row[0] = prev_dc
            k = 1
            while k < 64:
                wd = peek[i]
                ln = ac_len[wd]
                if ln == 0:
                    raise ValueError("invalid AC code")
                sym = int(ac_sym[wd])
                i += ln
                if sym == 0x00:  # EOB
                    break
                if sym == 0xF0:  # ZRL
                    k += 16
                    continue
                run, size = sym >> 4, sym & 0x0F
                k += run
                if k > 63 or size == 0:
                    raise ValueError("corrupt AC run")
                row[k] = _extend(int(peek[i]) >> (16 - size), size)
                i += size
                k += 1
            if i > n_bits:
                raise ValueError("scan data truncated")
    except (ValueError, IndexError):
        return -1
    return i


def _decode_gray_checked(payload: bytes) -> np.ndarray | None:
    qtables: dict[int, np.ndarray] = {}
    htables: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    dims = None
    comp = None  # (component id, qtable id)
    i = 2
    scan_start = None
    dc_id = ac_id = 0
    restart_interval = 0  # DRI: MCUs between RSTn markers (0 = none)
    while i + 4 <= len(payload):
        if payload[i] != 0xFF:
            return None
        marker = payload[i + 1]
        if marker == 0xFF:
            i += 1
            continue
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
            i += 2
            continue
        (seg_len,) = struct.unpack(">H", payload[i + 2 : i + 4])
        seg = payload[i + 4 : i + 2 + seg_len]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                n = 64 * (2 if pq else 1)
                raw = seg[j + 1 : j + 1 + n]
                vals = (
                    np.frombuffer(raw, dtype=">u2").astype(np.int32)
                    if pq
                    else np.frombuffer(raw, dtype=np.uint8).astype(np.int32)
                )
                nat = np.empty(64, dtype=np.int32)
                nat[_ZZ] = vals
                qtables[tq] = nat.reshape(8, 8)
                j += 1 + n
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc_th = seg[j]
                bits = list(seg[j + 1 : j + 17])
                nv = sum(bits)
                vals = list(seg[j + 17 : j + 17 + nv])
                htables[tc_th] = _build_decoder(bits, vals)
                j += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            precision, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            if precision != 8 or ncomp != 1:
                return None  # this decoder is single-component 8-bit
            dims = (h, w)
            comp = (seg[6], seg[8])
        elif marker == 0xDD:  # DRI: define restart interval
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif 0xC1 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            return None  # progressive/extended: not baseline
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            if ns != 1:
                return None
            td_ta = seg[2]
            dc_id, ac_id = td_ta >> 4, td_ta & 0x0F
            scan_start = i + 2 + seg_len
            break
        i += 2 + seg_len
    if dims is None or scan_start is None or comp is None:
        return None
    q = qtables.get(comp[1])
    dc_tab = htables.get(0x00 | dc_id)
    ac_tab = htables.get(0x10 | ac_id)
    if q is None or dc_tab is None or ac_tab is None:
        return None

    h, w = dims
    bh, bw_ = (h + 7) // 8, (w + 7) // 8

    # entropy data: stuffed 0xFF00 pairs collapse to 0xFF; RST0-7
    # markers (emitted every ``restart_interval`` MCUs after a DRI
    # segment) split the scan into byte-aligned chunks, each of which
    # restarts entropy decoding with the DC predictor reset (T.81
    # E.2.4); any OTHER marker (normally EOI) ends the scan. Markers —
    # including RSTn — may be preceded by any number of 0xFF FILL bytes
    # (T.81 B.1.1.2): a chunk ends at the first 0xFF of the fill+marker
    # run, and the marker byte is the first non-0xFF after it.
    arr = np.frombuffer(payload, dtype=np.uint8)[scan_start:]
    ff = np.nonzero(arr == 0xFF)[0]
    nxt = np.where(ff + 1 < len(arr), arr[np.minimum(ff + 1, len(arr) - 1)], 0xD9)
    keep = nxt != 0x00  # drop stuffed 0xFF00 pairs: those are data
    chunks: list[np.ndarray] = []
    start = 0
    for pos, m in zip(ff[keep], nxt[keep]):
        pos, m = int(pos), int(m)
        if pos < start:
            continue  # the 0xFF of an already-consumed RST marker pair
        if m == 0xFF:
            continue  # fill byte: a later (pos, m) entry carries the marker
        first_ff = pos  # walk back over the fill run to the chunk end
        while first_ff > start and arr[first_ff - 1] == 0xFF:
            first_ff -= 1
        chunks.append(arr[start:first_ff])
        if 0xD0 <= m <= 0xD7:  # RSTn: skip the marker, keep going
            start = pos + 2
            continue
        start = -1  # real trailing marker: scan is over
        break
    if start >= 0:  # no terminating marker: scan runs to the buffer end
        chunks.append(arr[start:])

    nb = bh * bw_
    out = np.zeros((nb, 64), dtype=np.int32)
    per_chunk = restart_interval if restart_interval else nb
    done = 0
    for seg in chunks:
        if done >= nb:
            break
        drop = np.zeros(len(seg), dtype=bool)
        if len(seg) > 1:
            drop[1:] = (seg[:-1] == 0xFF) & (seg[1:] == 0x00)
        destuffed = seg[~drop].tobytes()
        n_here = min(per_chunk, nb - done)
        used = _decode_entropy_chunk(destuffed, dc_tab, ac_tab, out, done, n_here)
        if used < 0:
            return None
        # the chunk must be consumed to within its byte-align padding
        # (< 8 one-bits, T.81 F.1.2.3): leftover whole bytes mean the
        # DRI value disagrees with the actual restart spacing — reject
        # rather than return a silently wrong image
        if len(destuffed) * 8 - used >= 8:
            return None
        done += n_here
    if done < nb:
        return None  # scan data truncated (or missing restart chunks)
    nat = np.zeros((bh * bw_, 64), dtype=np.int32)
    nat[:, _ZZ] = out
    blocks = nat.reshape(-1, 8, 8) * q
    pix = _T.T @ blocks.astype(np.float64) @ _T + 128.0
    img = (
        pix.reshape(bh, bw_, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(bh * 8, bw_ * 8)
    )
    return np.clip(np.round(img), 0, 255).astype(np.uint8)[:h, :w]
