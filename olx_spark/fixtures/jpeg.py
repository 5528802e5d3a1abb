"""Pure-numpy BASELINE SEQUENTIAL JPEG codec (ITU-T T.81 / JFIF).

The sandbox ships no Pillow/libjpeg, so the engine's ``jpeg`` format
branch (BASELINE.json input_hint: a real-world lossy format under the
PSNR>=40dB payload invariant) is implemented from the public spec:

- encoder: RGB -> BT.601 YCbCr (JFIF full-range), 4:4:4 (no chroma
  subsampling), 8x8 orthonormal block DCT, quantization with the
  Annex K example tables scaled by a libjpeg-style quality factor and
  CAPPED so every step <= ``step_cap`` (see the PSNR bound below),
  zigzag, DC-difference categories + AC run/size symbols entropy-coded
  with the Annex K typical Huffman tables, byte-stuffed ECS, standard
  SOI/APP0/DQT/SOF0/DHT/SOS/EOI marker layout. Output is plain
  baseline JPEG any standard decoder reads.
- decoder: marker parser (APPn/COM skipped, DQT/DHT possibly packing
  several tables per segment, DRI + RSTn restart handling), baseline
  SOF0 only (progressive SOF2 rejected loudly), per-component
  sampling factors in {1, 2} (2x2/2x1/1x1 MCUs; chroma upsampled by
  sample replication), canonical Huffman decode over the unstuffed
  scan, dequant + inverse zigzag + IDCT + YCbCr->RGB.

PSNR floor: with the orthonormal DCT, a quant step q adds at most
U(-q/2, q/2) error per coefficient => MSE <= q^2/12 per channel in the
YCbCr domain. The worst inverse-color-matrix row (B = Y + 1.772 Cb)
amplifies variance by 1 + 1.772^2 = 4.14. With every step capped at 3:
MSE_rgb <= 4.14 * 9/12 + 0.25 (final rounding) ~ 3.4 => PSNR >=
10*log10(255^2 / 3.4) ~ 42.8 dB — above the input_hint's 40 dB floor
by construction, not by luck. Callers wanting real-world compression
ratios pass a larger ``step_cap`` (or None) and a lower ``quality``
and lose the floor.

Scope honesty: baseline sequential, 8-bit, 1 or 3 components. No
progressive, arithmetic coding, 12-bit, or CMYK — those reject with a
clear error instead of wrong pixels.
"""

from __future__ import annotations

import functools
import re
import struct

import numpy as np

# ----------------------------------------------------------- constants
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K example quantization tables (luminance, chrominance)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64).reshape(8, 8)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64).reshape(8, 8)

# Annex K typical Huffman tables: (bits[1..16] counts, symbol values)
HT_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HT_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HT_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
HT_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

_DCT8 = None


def _dct8() -> np.ndarray:
    global _DCT8
    if _DCT8 is None:
        n = 8
        k = np.arange(n)[:, None]
        i = np.arange(n)[None, :]
        m = np.cos(np.pi * k * (2 * i + 1) / (2 * n)) * np.sqrt(2.0 / n)
        m[0, :] = np.sqrt(1.0 / n)
        _DCT8 = m
    return _DCT8


def _scaled_tables(quality: int, step_cap: int | None) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg-style quality scaling of the Annex K tables, optionally
    capped so every step <= step_cap (the PSNR-floor knob)."""
    if not 1 <= quality <= 100:
        raise ValueError("quality in [1, 100]")
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for t in (QT_LUMA, QT_CHROMA):
        q = np.floor((t * s + 50) / 100)
        q = np.clip(q, 1, 255)
        if step_cap is not None:
            q = np.minimum(q, step_cap)
        out.append(q.astype(np.float64))
    return out[0], out[1]


# ------------------------------------------------------------ bit I/O
def _huff_encode_table(counts: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) from the (BITS, HUFFVAL) spec form."""
    table: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


@functools.lru_cache(maxsize=32)
def _huff_lut(counts: tuple[int, ...], values: tuple[int, ...]) -> list:
    """16-bit-prefix decode LUT from the (BITS, HUFFVAL) spec form:
    ``lut[next16bits] = (symbol << 5) | code_length``, 0 for prefixes
    matching no code. Built once per distinct table (cached — real
    corpora reuse the Annex K tables across every image)."""
    arr = np.zeros(1 << 16, dtype=np.uint16)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            start = code << (16 - length)
            arr[start : start + (1 << (16 - length))] = (values[k] << 5) | length
            code += 1
            k += 1
        code <<= 1
    return arr.tolist()  # list indexing beats numpy scalar indexing


# ------------------------------------------------------------- encoder
def jpeg_encode(
    arr: np.ndarray,
    quality: int = 92,
    step_cap: int | None = 3,
    subsample: bool = False,
    restart_interval: int = 0,
    grayscale: bool = False,
) -> bytes:
    """Baseline JFIF bytes for an (h, w, 3) uint8 RGB array. Defaults
    keep every quant step <= 3, guaranteeing the module's >=40 dB
    round-trip floor (see module docstring).

    ``subsample`` emits 4:2:0 (Y at 2x2, box-averaged chroma — the
    common real-world layout; the PSNR floor does NOT hold, chroma
    detail is genuinely lost). ``restart_interval`` emits DRI + RSTn
    markers every N MCUs. ``grayscale`` emits a 1-component scan.
    These options exist so every decoder path has an in-repo
    round-trip test, not just the 4:4:4 default."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError(f"expected (h, w, 3) uint8, got {arr.shape} {arr.dtype}")
    h, w, _ = arr.shape
    if h == 0 or w == 0 or h > 0xFFFF or w > 0xFFFF:
        raise ValueError("jpeg: unsupported dimensions")
    qt_l, qt_c = _scaled_tables(quality, step_cap)
    d = _dct8()

    # color transform (JFIF full-range BT.601), level shift on Y
    rgb = arr.astype(np.float64)
    y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2] - 128.0
    cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2]
    cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2]

    def box_down2(chan: np.ndarray) -> np.ndarray:
        hh, ww = chan.shape
        p = np.pad(chan, ((0, hh % 2), (0, ww % 2)), mode="edge")
        return p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2).mean(axis=(1, 3))

    # comp spec: (id, plane, (h_samp, v_samp), quant table id)
    if grayscale:
        comps = [(1, y, (1, 1), 0)]
    elif subsample:
        comps = [(1, y, (2, 2), 0), (2, box_down2(cb), (1, 1), 1),
                 (3, box_down2(cr), (1, 1), 1)]
    else:
        comps = [(1, y, (1, 1), 0), (2, cb, (1, 1), 1), (3, cr, (1, 1), 1)]
    hmax = max(c[2][0] for c in comps)
    vmax = max(c[2][1] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    def blocks_of(chan: np.ndarray, hs: int, vs: int, qt: np.ndarray) -> np.ndarray:
        """(block_row, block_col, 64) zigzagged quantized coefficients,
        padded out to the MCU-aligned block grid."""
        tgt_h, tgt_w = mcus_y * vs * 8, mcus_x * hs * 8
        padded = np.pad(
            chan,
            ((0, tgt_h - chan.shape[0]), (0, tgt_w - chan.shape[1])),
            mode="edge",
        )
        b = padded.reshape(tgt_h // 8, 8, tgt_w // 8, 8).transpose(0, 2, 1, 3)
        coef = np.einsum("ij,abjk,lk->abil", d, b, d, optimize=True)
        q = np.round(coef / qt).astype(np.int32)
        return q.reshape(q.shape[0], q.shape[1], 64)[:, :, ZIGZAG]

    qts = {0: qt_l, 1: qt_c}
    planes = [blocks_of(c[1], c[2][0], c[2][1], qts[c[3]]) for c in comps]

    enc_dc = [_huff_encode_table(*HT_DC_LUMA), _huff_encode_table(*HT_DC_CHROMA)]
    enc_ac = [_huff_encode_table(*HT_AC_LUMA), _huff_encode_table(*HT_AC_CHROMA)]

    # ---- entropy encode, hot loop inlined: bit packing lives in
    # plain locals (acc/nbits/bytearray), AC zero runs are skipped via
    # numpy flatnonzero instead of a 63-step Python walk, and byte
    # stuffing is one bytes.replace per restart segment AFTER packing
    # (equivalent to stuffing during packing — markers are appended
    # after, so they are never stuffed). Output bytes are identical to
    # the old _BitWriter path.
    segment_parts: list[bytearray] = [bytearray()]
    out_bits = segment_parts[0]
    acc = nbits = 0
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                if nbits:  # align with 1-padding per spec
                    pad = 8 - nbits
                    acc = (acc << pad) | ((1 << pad) - 1)
                    out_bits.append(acc & 0xFF)
                    acc = nbits = 0
                segment_parts.append(bytearray())
                out_bits = segment_parts[-1]
                pred = [0] * len(comps)
            for ci, (_, _, (hs, vs), _) in enumerate(comps):
                tbl = 0 if ci == 0 else 1
                dc_tbl = enc_dc[tbl]
                ac_tbl = enc_ac[tbl]
                zrl_code, zrl_len = ac_tbl[0xF0]
                eob_code, eob_len = ac_tbl[0x00]
                for vy in range(vs):
                    for vx in range(hs):
                        zz = planes[ci][my * vs + vy, mx * hs + vx]
                        dc = int(zz[0])
                        diff = dc - pred[ci]
                        pred[ci] = dc
                        cat = 0 if diff == 0 else abs(diff).bit_length()
                        code, length = dc_tbl[cat]
                        acc = (acc << length) | code
                        nbits += length
                        if cat:
                            mag = diff if diff >= 0 else diff + (1 << cat) - 1
                            acc = (acc << cat) | (mag & ((1 << cat) - 1))
                            nbits += cat
                        prev_k = 0
                        for k in np.flatnonzero(zz[1:]):
                            k = int(k) + 1
                            run = k - prev_k - 1
                            prev_k = k
                            while run > 15:
                                acc = (acc << zrl_len) | zrl_code
                                nbits += zrl_len
                                run -= 16
                            v = int(zz[k])
                            cat = abs(v).bit_length()
                            code, length = ac_tbl[(run << 4) | cat]
                            acc = (acc << length) | code
                            mag = v if v >= 0 else v + (1 << cat) - 1
                            acc = (acc << cat) | (mag & ((1 << cat) - 1))
                            nbits += length + cat
                        if prev_k < 63:
                            acc = (acc << eob_len) | eob_code
                            nbits += eob_len
                        while nbits >= 8:
                            nbits -= 8
                            out_bits.append((acc >> nbits) & 0xFF)
                        acc &= (1 << nbits) - 1
            mcu_count += 1
    if nbits:
        pad = 8 - nbits
        acc = (acc << pad) | ((1 << pad) - 1)
        out_bits.append(acc & 0xFF)
    scan_parts = [bytes(p).replace(b"\xff", b"\xff\x00") for p in segment_parts]
    scan = scan_parts[0]
    for i, part in enumerate(scan_parts[1:]):
        scan += bytes([0xFF, 0xD0 + (i % 8)]) + part

    # ---- markers
    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def dqt(tid: int, qt: np.ndarray) -> bytes:
        return seg(0xFFDB, bytes([tid]) + bytes(
            int(qt.flatten()[ZIGZAG][i]) for i in range(64)
        ))

    def dht(cls: int, tid: int, spec: tuple[list[int], list[int]]) -> bytes:
        counts, values = spec
        return seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(counts) + bytes(values))

    out = bytearray()
    out += struct.pack(">H", 0xFFD8)  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += dqt(0, qt_l)
    if not grayscale:
        out += dqt(1, qt_c)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for cid, _, (hs, vs), tq in comps:
        sof += bytes([cid, (hs << 4) | vs, tq])
    out += seg(0xFFC0, sof)
    out += dht(0, 0, HT_DC_LUMA) + dht(1, 0, HT_AC_LUMA)
    if not grayscale:
        out += dht(0, 1, HT_DC_CHROMA) + dht(1, 1, HT_AC_CHROMA)
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for i, (cid, _, _, _) in enumerate(comps):
        sos += bytes([cid, 0x00 if i == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xFFDA, sos)
    out += scan
    out += struct.pack(">H", 0xFFD9)  # EOI
    return bytes(out)


# ------------------------------------------------------------- decoder
def jpeg_decode(data: bytes) -> np.ndarray:
    """Decode baseline sequential JFIF/JPEG bytes to (h, w, 3) uint8
    RGB. Supports 1- or 3-component images, sampling factors 1 or 2,
    restart intervals. Rejects progressive/arithmetic/12-bit input."""
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    scan_comps = None
    scan_start = None

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at {pos}")
        # T.81 B.1.1.2: a marker may be preceded by any number of 0xFF
        # fill bytes — consume them so padded real-world files decode
        # instead of degrading to decode_ok=0 on a bogus length parse
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= len(data):
            raise ValueError("jpeg: truncated at marker")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        (ln,) = struct.unpack(">H", data[pos:pos + 2])
        payload = data[pos + 2:pos + ln]
        if marker == 0xDB:  # DQT (may pack several tables)
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                if pq != 0:
                    raise ValueError("jpeg: 16-bit quant tables unsupported")
                vals = np.frombuffer(payload[p + 1:p + 65], dtype=np.uint8)
                qtables[tq] = vals[UNZIGZAG].reshape(8, 8).astype(np.float64)
                p += 65
        elif marker == 0xC4:  # DHT (may pack several tables)
            p = 0
            while p < len(payload):
                cls, tid = payload[p] >> 4, payload[p] & 0x0F
                counts = list(payload[p + 1:p + 17])
                n = sum(counts)
                values = list(payload[p + 17:p + 17 + n])
                (huff_dc if cls == 0 else huff_ac)[tid] = _huff_lut(
                    tuple(counts), tuple(values)
                )
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec = payload[0]
            if prec != 8:
                raise ValueError("jpeg: only 8-bit precision supported")
            fh, fw = struct.unpack(">HH", payload[1:5])
            nc = payload[5]
            comps = []
            for i in range(nc):
                cid, hv, tq = payload[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("jpeg: only baseline sequential (SOF0/1) supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:  # SOS
            ns = payload[0]
            scan_comps = []
            for i in range(ns):
                cs, td_ta = payload[1 + 2 * i], payload[2 + 2 * i]
                scan_comps.append({"id": cs, "td": td_ta >> 4, "ta": td_ta & 0x0F})
            scan_start = pos + ln
            break
        # APPn / COM / others: skip
        pos += ln

    if frame is None or scan_comps is None:
        raise ValueError("jpeg: missing SOF/SOS")
    for c in frame["comps"]:
        if c["h"] not in (1, 2) or c["v"] not in (1, 2):
            raise ValueError("jpeg: sampling factors beyond 2 unsupported")

    # ---- split scan into restart segments, unstuffing 0xFF00.
    # Vectorized: the scan ends at the first 0xFF followed by neither
    # 0x00 (stuffing) nor D0-D7 (RSTn); a trailing bare 0xFF also ends
    # it (the old bytewise loop treated it as an implicit EOI). Within
    # the scan, split on RST markers (safe BEFORE unstuffing: a
    # stuffed 0xFF is always followed by 0x00, never D0-D7), then drop
    # the stuffing bytes with one replace() per segment.
    scan_bytes = data[scan_start:]
    m = re.search(rb"\xff(?:[^\x00\xd0-\xd7]|$)", scan_bytes, re.DOTALL)
    if m:
        scan_bytes = scan_bytes[: m.start()]
    segments = [
        seg.replace(b"\xff\x00", b"\xff")
        for seg in re.split(rb"\xff[\xd0-\xd7]", scan_bytes)
    ]

    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    fh, fw = frame["h"], frame["w"]
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-fw // mcu_w)
    mcus_y = -(-fh // mcu_h)
    d = _dct8()

    by_id = {c["id"]: (i, c) for i, c in enumerate(frame["comps"])}
    order = [by_id[s["id"]] + (s,) for s in scan_comps]  # (idx, comp, scan)

    # ---- entropy decode, hot loop fully inlined: the bit reader
    # lives in plain locals (acc/nbits/pos) and each Huffman symbol +
    # its magnitude bits cost one LUT index plus integer arithmetic —
    # no per-symbol function calls (the pure-Python analog of
    # libjpeg's HUFF_DECODE macro). Blocks accumulate as flat zigzag
    # rows per component; dequant/unzigzag/placement vectorize below.
    coef_rows: list[list[list[float]]] = [[] for _ in frame["comps"]]
    pred = {s["id"]: 0 for s in scan_comps}
    seg_idx = 0
    seg = segments[0]
    seg_size = len(seg)
    pos = acc = nbits = 0
    mcu_count = 0

    for _my in range(mcus_y):
        for _mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                seg_idx += 1
                if seg_idx >= len(segments):
                    raise ValueError("jpeg: missing restart segment")
                seg = segments[seg_idx]
                seg_size = len(seg)
                pos = acc = nbits = 0
                pred = {s["id"]: 0 for s in scan_comps}
            for idx, comp, s in order:
                dc_lut = huff_dc[s["td"]]
                ac_lut = huff_ac[s["ta"]]
                rows = coef_rows[idx]
                cid = s["id"]
                for _ in range(comp["v"] * comp["h"]):
                    zz = [0.0] * 64
                    # --- DC: symbol = category, then magnitude bits
                    while nbits < 16 and pos < seg_size:
                        acc = ((acc << 8) | seg[pos]) & 0xFFFFFFFF
                        pos += 1
                        nbits += 8
                    i16 = (acc >> (nbits - 16)) & 0xFFFF if nbits >= 16 else (acc << (16 - nbits)) & 0xFFFF
                    entry = dc_lut[i16]
                    length = entry & 31
                    if length == 0:
                        raise ValueError("jpeg: invalid Huffman code")
                    if length > nbits:
                        raise ValueError("jpeg: truncated entropy-coded segment")
                    nbits -= length
                    n = entry >> 5
                    if n:
                        while nbits < n and pos < seg_size:
                            acc = ((acc << 8) | seg[pos]) & 0xFFFFFFFF
                            pos += 1
                            nbits += 8
                        if n > nbits:
                            raise ValueError("jpeg: truncated entropy-coded segment")
                        nbits -= n
                        bits = (acc >> nbits) & ((1 << n) - 1)
                        pred[cid] += bits if bits >= (1 << (n - 1)) else bits - (1 << n) + 1
                    zz[0] = pred[cid]
                    # --- AC: (run, size) symbols + magnitude bits
                    k = 1
                    while k < 64:
                        while nbits < 16 and pos < seg_size:
                            acc = ((acc << 8) | seg[pos]) & 0xFFFFFFFF
                            pos += 1
                            nbits += 8
                        i16 = (acc >> (nbits - 16)) & 0xFFFF if nbits >= 16 else (acc << (16 - nbits)) & 0xFFFF
                        entry = ac_lut[i16]
                        length = entry & 31
                        if length == 0:
                            raise ValueError("jpeg: invalid Huffman code")
                        if length > nbits:
                            raise ValueError("jpeg: truncated entropy-coded segment")
                        nbits -= length
                        rs = entry >> 5
                        n = rs & 0x0F
                        if n == 0:
                            if rs == 0xF0:
                                k += 16  # ZRL
                                continue
                            break  # EOB
                        k += rs >> 4
                        if k > 63:
                            raise ValueError("jpeg: AC index out of range")
                        while nbits < n and pos < seg_size:
                            acc = ((acc << 8) | seg[pos]) & 0xFFFFFFFF
                            pos += 1
                            nbits += 8
                        if n > nbits:
                            raise ValueError("jpeg: truncated entropy-coded segment")
                        nbits -= n
                        bits = (acc >> nbits) & ((1 << n) - 1)
                        zz[k] = bits if bits >= (1 << (n - 1)) else bits - (1 << n) + 1
                        k += 1
                    rows.append(zz)
            mcu_count += 1

    # ---- vectorized dequant + unzigzag + block placement
    planes = []
    for i, c in enumerate(frame["comps"]):
        bw_ = mcus_x * c["h"]
        bh_ = mcus_y * c["v"]
        plane = np.zeros((bh_, bw_, 8, 8), dtype=np.float64)
        rows = coef_rows[i]
        if rows:
            zzarr = np.asarray(rows, dtype=np.float64)  # (nblk, 64) zigzag
            blocks = zzarr[:, UNZIGZAG].reshape(-1, 8, 8) * qtables[c["tq"]]
            # append order was (my, mx, vy, vx) -> grid coords
            v, hh = c["v"], c["h"]
            nidx = np.arange(len(rows))
            mcu, j = nidx // (v * hh), nidx % (v * hh)
            plane[mcu // mcus_x * v + j // hh, mcu % mcus_x * hh + j % hh] = blocks
        planes.append(plane)

    # IDCT all blocks per component, assemble channel planes, upsample
    chans = []
    for i, c in enumerate(frame["comps"]):
        coefs = planes[i]
        px = np.einsum("ji,abjk,kl->abil", d, coefs, d, optimize=True)
        bh_, bw_ = coefs.shape[:2]
        chan = px.transpose(0, 2, 1, 3).reshape(bh_ * 8, bw_ * 8)
        # upsample to full frame grid by sample replication
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            chan = np.repeat(np.repeat(chan, ry, axis=0), rx, axis=1)
        chans.append(chan[:fh, :fw])

    if len(chans) == 1:
        ych = chans[0] + 128.0
        out = np.stack([ych, ych, ych], axis=-1)
    elif len(chans) == 3:
        y, cb, cr = chans
        y = y + 128.0
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        out = np.stack([r, g, b], axis=-1)
    else:
        raise ValueError(f"jpeg: {len(chans)}-component images unsupported")
    return np.clip(np.round(out), 0, 255).astype(np.uint8)
