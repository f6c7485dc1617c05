"""Minimal baseline JPEG codec, pure numpy/stdlib (ITU-T T.81 subset).

The sandbox has no image codec library (no PIL/cv2/turbojpeg), but the
north rule's PSNR>=40dB lossy-dup criterion needs an actual lossy
format to be exercised on non-identical bytes (VERDICT r2 item 6).
Everything here follows the public spec (ITU-T T.81, 1992) and the
JFIF 1.02 conventions:

- Encoder: baseline sequential DCT, 8-bit, 4:4:4 (no chroma
  subsampling) or single-component grayscale; standard Annex K
  quantization tables scaled by the usual IJG quality formula;
  standard Annex K Huffman tables; JFIF APP0 header. Deterministic:
  identical pixels + quality -> identical bytes.
- Decoder: baseline sequential DCT (SOF0) with 1 or 3 components at
  sampling factors (1,1); Huffman tables are read from the file's DHT
  segments (not assumed); restart intervals/markers are NOT supported
  (our encoder never emits them) and raise ``NotImplementedError``,
  as do progressive (SOF2) and subsampled streams.

The per-block entropy coding loops are Python — this codec exists for
correctness fixtures and the actor-pool decode plumbing, not bulk
throughput; the distributed pipeline treats decode cost as an opaque
per-row kernel either way (stages/multimodal.py).
"""

from __future__ import annotations

import struct

import numpy as np

# --- constant tables (ITU-T T.81 Annex K) ------------------------------

#: zigzag scan order: position in scan -> natural (row-major) index
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

#: K.1 luminance quantization table (natural order)
QT_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)

#: K.2 chrominance quantization table (natural order)
QT_CHROM = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# K.3 standard Huffman tables: (bits[1..16], huffval)
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
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
AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

_DCT8 = None


def _dct8() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix D: forward F = D @ f @ D.T,
    inverse f = D.T @ F @ D (T.81 A.3.3 up to the orthonormal
    factoring)."""
    global _DCT8
    if _DCT8 is None:
        k = np.arange(8)[:, None]
        i = np.arange(8)[None, :]
        m = 0.5 * np.cos((2 * i + 1) * k * np.pi / 16.0)
        m[0] *= 1.0 / np.sqrt(2.0)
        _DCT8 = m
    return _DCT8


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """The IJG quality->table scaling (libjpeg jcparam.c, public)."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int64)


def _build_codes(bits, vals) -> dict:
    """Canonical Huffman codes (T.81 C.2): value -> (length, code)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, length: int, code: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.buf.append(0x00)
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write(pad, (1 << pad) - 1)  # pad with 1s
        return bytes(self.buf)


def _magnitude(v: int) -> tuple[int, int]:
    """(size, raw bits) for a DC diff / AC coefficient (T.81 F.1.2.1):
    negative values are encoded as v + 2^size - 1."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    raw = v if v > 0 else v + (1 << size) - 1
    return size, raw


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r = px[..., 0].astype(np.float64)
    g = px[..., 1].astype(np.float64)
    b = px[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(
        np.round(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(h, w) float plane (multiple-of-8 dims) -> (n, 8, 8) blocks in
    left-right, top-down order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def _planes_from_blocks(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    return (
        blocks.reshape(h // 8, w // 8, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(h, w)
    )


def jpeg_encode(pixels: np.ndarray, quality: int = 90) -> bytes:
    """uint8 (h, w, 3) RGB or (h, w) grayscale -> baseline JFIF bytes."""
    px = np.asarray(pixels, dtype=np.uint8)
    gray = px.ndim == 2
    if not gray and (px.ndim != 3 or px.shape[2] != 3):
        raise ValueError(f"unsupported pixel shape {px.shape}")
    h, w = px.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")

    qt_l = _quality_scale(QT_LUM, quality)
    qt_c = _quality_scale(QT_CHROM, quality)

    # pad to multiples of 8 by edge replication
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    pad = ((0, ph - h), (0, pw - w)) + (((0, 0),) if not gray else ())
    px = np.pad(px, pad, mode="edge")

    if gray:
        planes = [px.astype(np.float64)]
        qts = [qt_l]
    else:
        ycc = _rgb_to_ycbcr(px)
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
        qts = [qt_l, qt_c, qt_c]

    d = _dct8()
    comp_coefs = []
    for plane, qt in zip(planes, qts):
        blocks = _blocks_of(plane - 128.0)
        f = np.einsum("ij,bjk,lk->bil", d, blocks, d)
        q = np.round(f.reshape(-1, 64) / qt.astype(np.float64)).astype(np.int64)
        comp_coefs.append(q[:, ZIGZAG])  # store in zigzag order

    dc_l = _build_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_l = _build_codes(AC_LUM_BITS, AC_LUM_VALS)
    dc_c = _build_codes(DC_CHROM_BITS, DC_CHROM_VALS)
    ac_c = _build_codes(AC_CHROM_BITS, AC_CHROM_VALS)
    tables = [(dc_l, ac_l)] + [(dc_c, ac_c)] * (len(planes) - 1)

    bw = _BitWriter()
    preds = [0] * len(planes)
    n_blocks = comp_coefs[0].shape[0]
    for bi in range(n_blocks):
        for ci in range(len(planes)):  # interleaved MCU = 1 block/comp at 4:4:4
            zz = comp_coefs[ci][bi]
            dct_t, act_t = tables[ci]
            diff = int(zz[0]) - preds[ci]
            preds[ci] = int(zz[0])
            size, raw = _magnitude(diff)
            length, code = dct_t[size]
            bw.write(length, code)
            if size:
                bw.write(size, raw)
            run = 0
            last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
            for k in range(1, 64):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    length, code = act_t[0xF0]  # ZRL
                    bw.write(length, code)
                    run -= 16
                size, raw = _magnitude(v)
                length, code = act_t[(run << 4) | size]
                bw.write(length, code)
                bw.write(size, raw)
                run = 0
                if k == last_nz:
                    break
            if last_nz < 63:
                length, code = act_t[0x00]  # EOB
                bw.write(length, code)
    scan = bw.flush()

    # --- marker segments ------------------------------------------------
    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(
        0xFFE0, b"JFIF\x00" + struct.pack(">BBBHHBB", 1, 2, 0, 1, 1, 0, 0)
    )
    zz_l = qt_l[ZIGZAG].astype(np.uint8).tobytes()
    out += seg(0xFFDB, b"\x00" + zz_l)
    if not gray:
        zz_c = qt_c[ZIGZAG].astype(np.uint8).tobytes()
        out += seg(0xFFDB, b"\x01" + zz_c)
    ncomp = 1 if gray else 3
    # SOF0 carries the TRUE dims; decoders round block counts up to the
    # MCU grid themselves (T.81 A.2.1) and crop after IDCT
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        # component id, sampling factors (1,1), quant table id
        sof += struct.pack(">BBB", ci + 1, 0x11, 0 if ci == 0 else 1)
    out += seg(0xFFC0, sof)

    def dht(tc: int, th: int, bits, vals) -> bytes:
        return seg(
            0xFFC4,
            struct.pack(">B", (tc << 4) | th)
            + bytes(bits)
            + bytes(vals),
        )

    out += dht(0, 0, DC_LUM_BITS, DC_LUM_VALS)
    out += dht(1, 0, AC_LUM_BITS, AC_LUM_VALS)
    if not gray:
        out += dht(0, 1, DC_CHROM_BITS, DC_CHROM_VALS)
        out += dht(1, 1, AC_CHROM_BITS, AC_CHROM_VALS)
    sos = struct.pack(">B", ncomp)
    for ci in range(ncomp):
        sos += struct.pack(">BB", ci + 1, 0x00 if ci == 0 else 0x11)
    sos += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0
    out += seg(0xFFDA, sos)
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes):
        # de-stuff: 0xFF 0x00 -> 0xFF; any other 0xFF-marker ends the scan
        arr = np.frombuffer(data, dtype=np.uint8)
        keep = np.ones(len(arr), dtype=bool)
        ff = np.nonzero(arr == 0xFF)[0]
        end = len(arr)
        for i in ff:
            if i + 1 < len(arr) and arr[i + 1] == 0x00:
                keep[i + 1] = False
            else:
                end = i
                break
        keep[end:] = False
        self.bits = np.unpackbits(arr[keep])
        self.pos = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.bits):
            raise ValueError("JPEG scan truncated")
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _decode_huffman(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("invalid Huffman code in JPEG scan")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def jpeg_decode(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> uint8 (h, w, 3) RGB or (h, w) grayscale."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}  # (tc, th) -> {(len, code): val}
    comps = []  # (id, h, v, tq)
    h = w = None
    scan_start = None
    scomp = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = struct.unpack(">H", data[pos : pos + 2])[0]
        if marker == 0xFFD9:  # EOI
            break
        (length,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        payload = data[pos + 4 : pos + 2 + length]
        if marker == 0xFFDB:  # DQT (may hold several tables)
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                zz = np.frombuffer(
                    payload[p + 1 : p + 65], dtype=np.uint8
                ).astype(np.int64)
                nat = np.empty(64, dtype=np.int64)
                nat[ZIGZAG] = zz
                qtabs[tq] = nat
                p += 65
        elif marker == 0xFFC4:  # DHT (may hold several tables)
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1 : p + 17])
                n = sum(bits)
                vals = list(payload[p + 17 : p + 17 + n])
                fwd = _build_codes(bits, vals)
                htabs[(tc, th)] = {
                    (length_, code): val for val, (length_, code) in fwd.items()
                }
                p += 17 + n
        elif marker == 0xFFC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", payload[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit baseline JPEG")
            for ci in range(nc):
                cid, hv, tq = struct.unpack(
                    ">BBB", payload[6 + 3 * ci : 9 + 3 * ci]
                )
                if hv != 0x11:
                    raise NotImplementedError(
                        "only 4:4:4 / grayscale sampling (got "
                        f"factors {hv:#x})"
                    )
                comps.append((cid, 1, 1, tq))
        elif marker in (0xFFC1, 0xFFC2, 0xFFC3):
            raise NotImplementedError("only baseline sequential (SOF0)")
        elif marker == 0xFFDD:
            raise NotImplementedError("restart intervals not supported")
        elif marker == 0xFFDA:  # SOS
            nc = payload[0]
            scomp = []
            for ci in range(nc):
                cid, tt = payload[1 + 2 * ci], payload[2 + 2 * ci]
                scomp.append((cid, tt >> 4, tt & 0xF))
            scan_start = pos + 2 + length
            break
        pos += 2 + length
    if scan_start is None or h is None:
        raise ValueError("JPEG missing SOS/SOF0")

    br = _BitReader(data[scan_start:])
    ncomp = len(comps)
    bw_, bh_ = -(-w // 8), -(-h // 8)
    n_blocks = bw_ * bh_
    coefs = [np.zeros((n_blocks, 64), dtype=np.int64) for _ in range(ncomp)]
    preds = [0] * ncomp
    comp_t = {cid: (td, ta) for cid, td, ta in scomp}
    for bi in range(n_blocks):
        for ci, (cid, _, _, _tq) in enumerate(comps):
            td, ta = comp_t[cid]
            dct_t = htabs[(0, td)]
            act_t = htabs[(1, ta)]
            size = _decode_huffman(br, dct_t)
            diff = _extend(br.read_bits(size), size) if size else 0
            preds[ci] += diff
            zz = coefs[ci][bi]
            zz[0] = preds[ci]
            k = 1
            while k < 64:
                rs = _decode_huffman(br, act_t)
                if rs == 0x00:  # EOB
                    break
                if rs == 0xF0:  # ZRL
                    k += 16
                    continue
                run, size = rs >> 4, rs & 0xF
                k += run
                if k > 63:
                    raise ValueError("AC coefficient index overflow")
                zz[k] = _extend(br.read_bits(size), size)
                k += 1

    d = _dct8()
    planes = []
    for ci, (_cid, _h, _v, tq) in enumerate(comps):
        nat = np.zeros((n_blocks, 64), dtype=np.float64)
        nat[:, ZIGZAG] = coefs[ci]
        nat *= qtabs[tq].astype(np.float64)
        blocks = np.einsum(
            "ji,bjk,kl->bil", d, nat.reshape(-1, 8, 8), d
        ) + 128.0
        planes.append(_planes_from_blocks(blocks, bh_ * 8, bw_ * 8)[:h, :w])
    if ncomp == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    return _ycbcr_to_rgb(planes[0], planes[1], planes[2])
