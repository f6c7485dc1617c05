"""Image codec + perceptual kernels, pure numpy/stdlib (no PIL/cv2 in
this environment).

- PNG encode/decode: minimal but spec-conformant subset (8-bit RGB /
  grayscale, non-interlaced, all five filter types on decode, filter 0 on
  encode). Deterministic bytes for identical pixels (fixed zlib level).
- JPEG: REAL baseline codec (pure numpy, ITU-T T.81 subset —
  image/jpeg.py; VERDICT r2 item 6), so the PSNR>=40dB lossy-dup rule
  runs on actual lossy bytes. Progressive/subsampled streams raise
  NotImplementedError. The "q<N>" quantization pseudo-codec remains for
  the legacy fixtures.
- phash: 64-bit DCT perceptual hash (resize 32x32 grayscale -> DCT-II ->
  top-left 8x8 minus DC -> median threshold), the standard pHash recipe.
- psnr: peak signal-to-noise ratio over decoded uint8 pixels; the
  north-rule dup criterion for lossy pairs is PSNR >= 40 dB
  (BASELINE.json input_hint).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(pixels: np.ndarray) -> bytes:
    """uint8 array (h, w, 3) RGB or (h, w) grayscale -> PNG bytes.

    Filter type 0 per scanline; zlib level 6 — fully deterministic."""
    pixels = np.ascontiguousarray(pixels, dtype=np.uint8)
    if pixels.ndim == 2:
        h, w = pixels.shape
        color_type = 0
        row_bytes = pixels.reshape(h, w)
    elif pixels.ndim == 3 and pixels.shape[2] == 3:
        h, w, _ = pixels.shape
        color_type = 2
        row_bytes = pixels.reshape(h, w * 3)
    else:
        raise ValueError(f"unsupported pixel shape {pixels.shape}")
    raw = np.concatenate(
        [
            np.zeros((h, 1), dtype=np.uint8),  # filter byte 0 per row
            row_bytes,
        ],
        axis=1,
    ).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filters (types 0-4)."""
    rows = raw.reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = rows[y, 0]
        line = rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if ftype == 0:
            res = line
        elif ftype == 2:  # Up
            res = (line + prev) & 0xFF
        else:
            res = np.zeros(stride, np.int32)
            for x in range(stride):
                a = res[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if ftype == 1:  # Sub
                    pred = a
                elif ftype == 3:  # Average
                    pred = (a + b) // 2
                elif ftype == 4:  # Paeth
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                else:
                    raise ValueError(f"bad PNG filter type {ftype}")
                res[x] = (line[x] + pred) & 0xFF
        out[y] = res.astype(np.uint8)
    return out


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 (h, w, 3) RGB or (h, w) grayscale array."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    idat = b""
    w = h = bit_depth = color_type = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if bit_depth != 8 or interlace != 0 or color_type not in (0, 2):
                raise NotImplementedError(
                    f"PNG subset: 8-bit RGB/gray non-interlaced only "
                    f"(got depth={bit_depth} color={color_type} interlace={interlace})"
                )
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    channels = 3 if color_type == 2 else 1
    stride = w * channels
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    out = _unfilter(raw, h, stride, channels)
    if channels == 3:
        return out.reshape(h, w, 3)
    return out.reshape(h, w)


# --- deterministic lossy pseudo-codec ("q<bits>") ---------------------
# Stands in for JPEG in fixtures: drops the low `q` bits of each sample
# (round-to-nearest) then PNG-encodes. q=1..2 keeps PSNR >= 40 dB.

def quantize_encode(pixels: np.ndarray, q: int) -> bytes:
    step = 1 << q
    px = np.asarray(pixels, dtype=np.int32)
    quant = np.clip(((px + step // 2) // step) * step, 0, 255).astype(np.uint8)
    return png_encode(quant)


def decode(data: bytes, fmt: str) -> np.ndarray:
    """Dispatch by the corpus `fmt` column. 'png', 'jpeg' and 'q<N>'
    are all real pure-numpy codecs (jpeg: baseline sequential only,
    image/jpeg.py)."""
    if fmt == "png" or fmt.startswith("q"):
        return png_decode(data)
    if fmt in ("jpeg", "jpg"):
        from .jpeg import jpeg_decode

        return jpeg_decode(data)
    raise ValueError(f"unknown image format {fmt!r}")


# --- perceptual hash / PSNR ------------------------------------------

def to_gray(pixels: np.ndarray) -> np.ndarray:
    if pixels.ndim == 2:
        return pixels.astype(np.float64)
    return (
        0.299 * pixels[..., 0] + 0.587 * pixels[..., 1] + 0.114 * pixels[..., 2]
    ).astype(np.float64)


def _resize_mean(gray: np.ndarray, size: int = 32, width: int = None) -> np.ndarray:
    """Area-style resize via index binning (deterministic, codec-free).
    ``width`` (default ``size``) allows the rectangular grids dHash
    needs (9 wide x 8 tall)."""
    h, w = gray.shape
    wout = size if width is None else width
    if h == size and w == wout:
        return gray
    ys = (np.arange(size + 1) * h // size).astype(int)
    xs = (np.arange(wout + 1) * w // wout).astype(int)
    out = np.empty((size, wout), dtype=np.float64)
    csum = np.zeros((h + 1, w + 1), dtype=np.float64)
    csum[1:, 1:] = gray.cumsum(0).cumsum(1)
    for i in range(size):
        y0, y1 = ys[i], max(ys[i + 1], ys[i] + 1)
        for j in range(wout):
            x0, x1 = xs[j], max(xs[j + 1], xs[j] + 1)
            area = (y1 - y0) * (x1 - x0)
            out[i, j] = (
                csum[y1, x1] - csum[y0, x1] - csum[y1, x0] + csum[y0, x0]
            ) / area
    return out


_DCT32 = None


def _dct_matrix(n: int = 32) -> np.ndarray:
    global _DCT32
    if _DCT32 is None:
        k = np.arange(n)[:, None]
        i = np.arange(n)[None, :]
        m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
        m[0] /= np.sqrt(2.0)
        _DCT32 = m
    return _DCT32


def _pack_bits64(bits: np.ndarray) -> int:
    """64 bools (MSB first) -> signed int64 for Arrow."""
    h = 0
    for b in bits.reshape(-1):
        h = (h << 1) | int(b)
    if h >= 1 << 63:
        h -= 1 << 64
    return h


def phash64(pixels: np.ndarray) -> int:
    """64-bit DCT perceptual hash; deterministic, pure numpy."""
    g = _resize_mean(to_gray(pixels), 32)
    m = _dct_matrix(32)
    dct = m @ g @ m.T
    block = dct[:8, :8].flatten()
    vals = np.delete(block, 0)  # drop DC
    med = np.median(vals)
    bits = block > med
    bits[0] = False
    return _pack_bits64(bits)


def dhash64(pixels: np.ndarray) -> int:
    """64-bit difference hash: 9x8 area-resized grayscale, bit set
    where the left pixel is brighter than its right neighbour (the
    classic row-gradient dHash). Robust to global brightness/contrast
    shifts; cheaper than the DCT phash (no transform)."""
    g = _resize_mean(to_gray(pixels), 8, width=9)
    return _pack_bits64(g[:, :-1] > g[:, 1:])


def ahash64(pixels: np.ndarray) -> int:
    """64-bit average hash: 8x8 area-resized grayscale, bit set where
    the cell is brighter than the global 8x8 mean."""
    g = _resize_mean(to_gray(pixels), 8)
    return _pack_bits64(g > g.mean())


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized popcount of XOR over int64 arrays — single-pass SWAR
    (same kernel as stages/lsh._popcount_u64; duplicated only because
    image/ sits below stages/ in the layering)."""
    x = (np.asarray(a, dtype=np.int64) ^ np.asarray(b, dtype=np.int64)).astype(
        np.uint64
    )
    with np.errstate(over="ignore"):
        x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
        x = (x & np.uint64(0x3333333333333333)) + (
            (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
        )
        x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        x = (x * np.uint64(0x0101010101010101)) >> np.uint64(56)
    return x.astype(np.int64)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """PSNR in dB between two uint8 images; inf for identical."""
    if a.shape != b.shape:
        return 0.0
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def image_quality_one(pixels: np.ndarray) -> dict:
    """Per-image quality signals (the image analog of text.py's
    quality_signals, all pure numpy over decoded pixels):

    - sharpness: variance of the 4-neighbor Laplacian of the grayscale
      (the classic blur detector — low variance = blurry/flat).
    - entropy: Shannon entropy (bits) of the 256-bin grayscale
      histogram (low = flat/synthetic fills).
    - saturated_frac: fraction of gray pixels pinned at 0 or 255
      (blown highlights / crushed blacks).
    - gray_mean / gray_std: exposure and global contrast.
    """
    g = to_gray(pixels)
    if g.size == 0:
        return {
            "sharpness": 0.0, "entropy": 0.0, "saturated_frac": 0.0,
            "gray_mean": 0.0, "gray_std": 0.0,
        }
    if g.shape[0] >= 3 and g.shape[1] >= 3:
        lap = (
            4.0 * g[1:-1, 1:-1]
            - g[:-2, 1:-1] - g[2:, 1:-1] - g[1:-1, :-2] - g[1:-1, 2:]
        )
        sharpness = float(lap.var())
    else:
        sharpness = 0.0
    q = np.clip(np.rint(g), 0, 255).astype(np.int64)
    hist = np.bincount(q.ravel(), minlength=256)
    p = hist[hist > 0] / q.size
    entropy = float(-(p * np.log2(p)).sum())
    saturated = float(((q == 0) | (q == 255)).mean())
    return {
        "sharpness": sharpness,
        "entropy": entropy,
        "saturated_frac": saturated,
        "gray_mean": float(g.mean()),
        "gray_std": float(g.std()),
    }
