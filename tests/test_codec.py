"""Pure-numpy PNG codec / phash / PSNR tests."""

import numpy as np
import pytest

from analiticcl_ray.image.codec import (
    decode,
    hamming64,
    phash64,
    png_decode,
    png_encode,
    psnr,
    quantize_encode,
)


def test_png_roundtrip_rgb():
    rng = np.random.default_rng(1)
    px = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
    assert np.array_equal(png_decode(png_encode(px)), px)


def test_png_roundtrip_gray():
    rng = np.random.default_rng(2)
    px = rng.integers(0, 256, (9, 5), dtype=np.uint8)
    assert np.array_equal(png_decode(png_encode(px)), px)


def test_png_deterministic():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    assert png_encode(px) == png_encode(px.copy())


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        png_decode(b"garbage bytes here")


def _smooth_rgb(h=48, w=64):
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 60 * np.sin(xx / 9.0) + 50 * np.cos(yy / 7.0)).clip(0, 255)
    return np.stack(
        [base, np.roll(base, 3, 0), np.roll(base, 5, 1)], axis=-1
    ).astype(np.uint8)


def test_jpeg_roundtrip_lossy_high_psnr():
    """VERDICT r2 item 6: a REAL lossy codec — recompressed bytes
    differ, decoded pixels land in the PSNR>=40dB dup regime at high
    quality and below it at low quality."""
    from analiticcl_ray.image.jpeg import jpeg_decode, jpeg_encode

    px = _smooth_rgb()
    enc = jpeg_encode(px, quality=90)
    dec = jpeg_decode(enc)
    assert dec.shape == px.shape
    assert not np.array_equal(dec, px)          # genuinely lossy
    assert np.isfinite(psnr(px, dec))
    assert psnr(px, dec) >= 40.0                # near-dup regime
    low = jpeg_decode(jpeg_encode(px, quality=10))
    assert psnr(px, low) < 40.0                 # heavy loss drops out


def test_jpeg_gray_and_odd_dims():
    from analiticcl_ray.image.jpeg import jpeg_decode, jpeg_encode

    g = _smooth_rgb()[..., 0][:45, :53]         # non-multiple-of-8 dims
    dec = jpeg_decode(jpeg_encode(g, quality=90))
    assert dec.shape == g.shape
    assert psnr(g, dec) >= 40.0


def test_jpeg_deterministic_and_dispatch():
    from analiticcl_ray.image.jpeg import jpeg_encode

    px = _smooth_rgb(16, 24)
    assert jpeg_encode(px, 85) == jpeg_encode(px.copy(), 85)
    # codec.decode dispatches 'jpeg' to the real decoder now
    out = decode(jpeg_encode(px, 95), "jpeg")
    assert out.shape == px.shape


def test_jpeg_rejects_unsupported():
    from analiticcl_ray.image.jpeg import jpeg_decode

    with pytest.raises(ValueError):
        jpeg_decode(b"garbage")
    with pytest.raises(ValueError):
        jpeg_decode(b"\xff\xd8\xff")  # SOI then truncation


def test_image_pair_dup_on_lossy_pair():
    """The north-rule PSNR>=40dB criterion exercised on NON-identical
    bytes: PNG original vs its JPEG recompression verifies as a dup
    with finite PSNR; a heavily-compressed copy does not."""
    from analiticcl_ray.config import DedupConfig
    from analiticcl_ray.functions.verify_kernel import image_pair_dup
    from analiticcl_ray.image.jpeg import jpeg_encode

    px = _smooth_rgb()
    png_bytes = png_encode(px)
    jpg_bytes = jpeg_encode(px, quality=90)
    assert png_bytes != jpg_bytes
    cfg = DedupConfig()
    is_dup, val = image_pair_dup(png_bytes, "png", jpg_bytes, "jpeg", cfg)
    assert is_dup and np.isfinite(val) and val >= 40.0
    bad_bytes = jpeg_encode(px, quality=10)
    is_dup2, val2 = image_pair_dup(png_bytes, "png", bad_bytes, "jpeg", cfg)
    assert not is_dup2 and np.isfinite(val2) and val2 < 40.0


def test_quantize_psnr_above_40():
    rng = np.random.default_rng(4)
    px = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    q = png_decode(quantize_encode(px, 2))
    assert psnr(px, q) >= 40.0


def test_strong_noise_below_40():
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    noisy = np.clip(px.astype(np.int32) + rng.integers(-35, 36, px.shape), 0, 255).astype(np.uint8)
    assert psnr(px, noisy) < 40.0


def test_psnr_identical_inf():
    px = np.zeros((4, 4, 3), np.uint8)
    assert psnr(px, px) == float("inf")


def test_phash_stable_under_small_noise():
    # textured image (block texture has strong low/mid DCT frequencies;
    # a pure gradient would have near-zero AC coefficients and unstable
    # median thresholding — inherent to DCT pHash, not a bug)
    rng = np.random.default_rng(6)
    small = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    px = np.repeat(np.repeat(small, 4, 0), 4, 1)
    noisy = np.clip(px.astype(np.int32) + rng.integers(-1, 2, px.shape), 0, 255).astype(np.uint8)
    d = hamming64(np.array([phash64(px)]), np.array([phash64(noisy)]))[0]
    assert d <= 6


def test_hamming64():
    assert hamming64(np.array([0]), np.array([0]))[0] == 0
    assert hamming64(np.array([-1]), np.array([0]))[0] == 64
    assert hamming64(np.array([0b1011]), np.array([0b0001]))[0] == 2
