"""Multimodal actor-pool stages (stages/multimodal.py): real PNG
resize/feature paths, deterministic fake video container, honest codec
stubs."""

import numpy as np
import pytest


def _mk_image(seed: int, h: int = 24, w: int = 32) -> bytes:
    from analiticcl_ray.image.codec import png_encode

    rng = np.random.default_rng(seed)
    return png_encode(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))


def test_resize_images_roundtrip(ray_session):
    import ray.data as rd

    from analiticcl_ray.image.codec import png_decode
    from analiticcl_ray.stages.multimodal import resize_images

    rows = [
        {"image_id": f"img{i}", "bytes": _mk_image(i), "w": 32, "h": 24,
         "fmt": "png"}
        for i in range(6)
    ]
    out = resize_images(rd.from_items(rows), size=16).take_all()
    assert len(out) == 6
    for r in out:
        px = png_decode(r["bytes"])
        assert px.shape == (16, 16, 3)
        assert r["w"] == 16 and r["h"] == 16 and r["fmt"] == "png"


def test_image_features_deterministic(ray_session):
    import ray.data as rd

    from analiticcl_ray.stages.multimodal import image_features

    rows = [
        {"image_id": f"img{i}", "bytes": _mk_image(i), "w": 32, "h": 24,
         "fmt": "png"}
        for i in range(4)
    ]
    a = sorted(
        (r["image_id"], r["phash"], round(r["mean"], 9))
        for r in image_features(rd.from_items(rows)).take_all()
    )
    b = sorted(
        (r["image_id"], r["phash"], round(r["mean"], 9))
        for r in image_features(rd.from_items(rows)).take_all()
    )
    assert a == b
    assert len({p for _, p, _ in a}) == 4  # distinct images -> distinct hashes


def test_frame_sampler_rawv_and_stub(ray_session):
    import ray.data as rd

    from analiticcl_ray.image.codec import png_decode
    from analiticcl_ray.stages.multimodal import (
        rawv_decode, rawv_encode, sample_frames,
    )

    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, (5, 8, 10, 3), dtype=np.uint8)
    blob = rawv_encode(frames)
    assert np.array_equal(rawv_decode(blob), frames)

    vids = rd.from_items(
        [{"video_id": "v0", "bytes": blob, "fmt": "rawv1"}]
    )
    out = sorted(sample_frames(vids, stride=2).take_all(), key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in out] == [0, 2, 4]
    assert np.array_equal(png_decode(out[1]["bytes"]), frames[2])

    # real codecs: honest, clearly-marked stub
    bad = rd.from_items([{"video_id": "v1", "bytes": b"x", "fmt": "mp4"}])
    with pytest.raises(Exception) as ei:
        sample_frames(bad).take_all()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_dhash_ahash_kernels():
    from analiticcl_ray.image.codec import ahash64, dhash64, hamming64

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    # deterministic
    assert dhash64(px) == dhash64(px.copy())
    assert ahash64(px) == ahash64(px.copy())
    # int64 range (Arrow-safe)
    for h in (dhash64(px), ahash64(px)):
        assert -(1 << 63) <= h < (1 << 63)
    # dhash is gradient-based: a NON-CLIPPING global brightness shift
    # preserves it exactly (clipping would flatten saturated regions
    # and legitimately flip those gradients)
    dark = rng.integers(0, 200, (48, 64, 3), dtype=np.uint8)
    brighter = (dark.astype(np.int32) + 40).astype(np.uint8)
    assert dhash64(brighter) == dhash64(dark)
    # an unrelated image lands far away in hamming space
    other = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    assert hamming64(
        np.array([dhash64(px)]), np.array([dhash64(other)])
    )[0] > 10


def test_image_hashes_and_dup_pairs_bruteforce(ray_session):
    """image_hash_dup_pairs == brute-force all-pairs hamming over the
    directly-computed hashes (banding is pigeonhole-complete for
    max_hamming < bands; the attach-side verify removes chain links)."""
    import ray.data as rd

    from analiticcl_ray.image.codec import decode, dhash64, hamming64
    from analiticcl_ray.sources.corpus import generate_corpus
    from analiticcl_ray.stages.multimodal import image_hash_dup_pairs, image_hashes

    tab = generate_corpus(300, 42)
    # driver-side truth: decode + dhash every image
    ids = tab["image_id"].to_pylist()
    hs = np.array(
        [
            dhash64(decode(b.as_py(), f.as_py()))
            for b, f in zip(tab["bytes"], tab["fmt"])
        ],
        dtype=np.int64,
    )
    iu, ju = np.triu_indices(len(ids), 1)
    ham = hamming64(hs[iu], hs[ju])
    keep = ham <= 3
    expected = {
        tuple(sorted((ids[a], ids[b]))): int(h)
        for a, b, h in zip(iu[keep], ju[keep], ham[keep])
    }
    assert expected, "corpus must contain dhash near-dups for this test"

    ds = rd.from_arrow(tab)
    # pipeline hashes agree with the driver-side kernels
    got_h = {
        r["image_id"]: r["dhash"] for r in image_hashes(ds).take_all()
    }
    assert got_h == dict(zip(ids, (int(h) for h in hs)))

    got = {
        tuple(sorted((r["src_id"], r["dst_id"]))): r["hamming"]
        for r in image_hash_dup_pairs(ds, "dhash", max_hamming=3).take_all()
    }
    assert got == expected


def test_image_quality_kernel_and_stage(ray_session):
    """image_quality_one flags planted defects; the Ray stage matches
    the driver-side kernel exactly and the filter keeps the clean set."""
    import ray.data as rd

    from analiticcl_ray.image.codec import image_quality_one, png_encode

    from analiticcl_ray.stages.multimodal import (
        image_quality_filter,
        image_quality_signals,
    )

    rng = np.random.default_rng(5)
    textured = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    flat = np.full((32, 32, 3), 255, np.uint8)  # saturated + zero entropy
    blurry = np.full((32, 32, 3), 128, np.uint8)  # flat mid-gray
    q_tex = image_quality_one(textured)
    q_flat = image_quality_one(flat)
    assert q_tex["sharpness"] > q_flat["sharpness"] == 0.0
    assert q_tex["entropy"] > 5.0 and q_flat["entropy"] == 0.0
    assert q_flat["saturated_frac"] == 1.0
    assert image_quality_one(np.zeros((0, 0), np.uint8))["entropy"] == 0.0

    rows = [
        {"image_id": "tex", "bytes": png_encode(textured), "fmt": "png"},
        {"image_id": "flat", "bytes": png_encode(flat), "fmt": "png"},
        {"image_id": "blur", "bytes": png_encode(blurry), "fmt": "png"},
    ]
    ds = rd.from_items(rows)
    got = {r["image_id"]: r for r in image_quality_signals(ds).take_all()}
    exp = {"tex": q_tex, "flat": q_flat, "blur": image_quality_one(blurry)}
    for iid, e in exp.items():
        for k, v in e.items():
            assert got[iid][k] == v
    kept = {r["image_id"] for r in image_quality_filter(ds).take_all()}
    assert kept == {"tex"}
