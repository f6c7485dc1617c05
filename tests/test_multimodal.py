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
