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


def test_jpeg_stub():
    with pytest.raises(NotImplementedError):
        decode(b"\xff\xd8\xff", "jpeg")


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
