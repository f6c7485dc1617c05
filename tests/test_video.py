"""Video tier: frame-hash extraction and video-level dup pairs vs a
brute-force all-pairs frame-hamming oracle.

The video tier composes existing kernels (rawv1 decode, dHash, the
shared banded_hash_dup_pairs skeleton) — what's new under test is the
frame explode, the frame→video pair aggregation, and the
min_frame_matches semantics."""

import numpy as np

from analiticcl_ray.image.codec import dhash64, hamming64
from analiticcl_ray.sources.video_corpus import generate_video_corpus
from analiticcl_ray.stages.multimodal import rawv_decode


def _brute_video_pairs(tab, max_hamming=3, min_frame_matches=2):
    """Driver-side truth: decode every video, dhash every frame,
    all-pairs cross-video frame hamming, count matches per video pair."""
    vids = tab["video_id"].to_pylist()
    frames = [rawv_decode(b.as_py()) for b in tab["bytes"]]
    owner, hashes = [], []
    for v, fs in zip(vids, frames):
        for f in fs:
            owner.append(v)
            hashes.append(dhash64(f))
    owner = np.array(owner, dtype=object)
    hashes = np.array(hashes, dtype=np.int64)
    iu, ju = np.triu_indices(len(hashes), 1)
    ham = hamming64(hashes[iu], hashes[ju])
    keep = (ham <= max_hamming) & (owner[iu] != owner[ju])
    counts: dict[tuple, int] = {}
    for a, b in zip(owner[iu[keep]], owner[ju[keep]]):
        key = (a, b) if a < b else (b, a)
        counts[key] = counts.get(key, 0) + 1
    return {k: v for k, v in counts.items() if v >= min_frame_matches}


def test_video_corpus_deterministic():
    a = generate_video_corpus(60, seed=7)
    b = generate_video_corpus(60, seed=7)
    assert a.equals(b)
    assert a.column_names == [
        "video_id", "bytes", "n_frames", "h", "w", "fmt",
    ]
    assert len(a) == 60
    # frames within a video are hash-distinct (temporal structure)
    fs = rawv_decode(a["bytes"][0].as_py())
    hs = {dhash64(f) for f in fs}
    assert len(hs) > 1
    # planted dup structure exists at the video level
    assert _brute_video_pairs(a), "corpus must contain video near-dups"


def test_video_frame_hashes_and_dup_pairs_bruteforce(ray_session):
    """video_dup_pairs == brute-force all-pairs frame hamming counted
    per video pair (banding is pigeonhole-complete for max_hamming <
    bands; the attach-side verify removes over-cap chain links; the
    aggregation drops intra-video matches and sub-threshold counts)."""
    import ray.data as rd

    from analiticcl_ray.stages.multimodal import (
        video_dup_pairs,
        video_frame_hashes,
    )

    tab = generate_video_corpus(80, seed=42)
    expected = _brute_video_pairs(tab, max_hamming=3, min_frame_matches=2)
    assert expected

    ds = rd.from_arrow(tab)
    # pipeline frame hashes agree with the driver-side kernels
    got_fh = {
        (r["video_id"], r["frame_idx"]): r["dhash"]
        for r in video_frame_hashes(ds).take_all()
    }
    truth_fh = {}
    for v, b in zip(tab["video_id"].to_pylist(), tab["bytes"]):
        for i, f in enumerate(rawv_decode(b.as_py())):
            truth_fh[(v, i)] = dhash64(f)
    assert got_fh == truth_fh

    got = {
        (r["src_id"], r["dst_id"]): r["n_frame_matches"]
        for r in video_dup_pairs(
            ds, max_hamming=3, min_frame_matches=2
        ).take_all()
    }
    assert got == expected

    # min_frame_matches=1 is a superset including single-frame evidence
    got1 = {
        (r["src_id"], r["dst_id"]): r["n_frame_matches"]
        for r in video_dup_pairs(
            ds, max_hamming=3, min_frame_matches=1
        ).take_all()
    }
    all_pairs = _brute_video_pairs(tab, max_hamming=3, min_frame_matches=1)
    assert got1 == all_pairs
    assert set(got).issubset(set(got1))


def test_banded_skeleton_cap_semantics(ray_session):
    """Pin the documented over-cap behavior of banded_hash_dup_pairs:
    with a tiny cap the result is a SUBSET of brute force (no false
    positives — the exact verify removes chain links), and the stats
    dict reports any dropped degenerate buckets; with a generous cap
    the full brute-force set comes back."""
    import ray.data as rd
    import pyarrow as pa
    import numpy as np

    from analiticcl_ray.image.codec import hamming64
    from analiticcl_ray.stages.multimodal import banded_hash_dup_pairs

    # 40 ids sharing one hash value (a degenerate hot band bucket) plus
    # scattered unique hashes
    rng = np.random.default_rng(11)
    hot = [0x0123456789ABCDEF] * 40
    cold = [int(v) for v in rng.integers(-(2**62), 2**62, 40)]
    hashes = hot + cold
    ids = [f"h{i:04d}" for i in range(len(hashes))]
    tab = pa.table(
        {"hid": pa.array(ids, pa.string()), "h": pa.array(hashes, pa.int64())}
    )
    hs = np.array(hashes, dtype=np.int64)
    iu, ju = np.triu_indices(len(ids), 1)
    ham = hamming64(hs[iu], hs[ju])
    keep = ham <= 3
    brute = {
        tuple(sorted((ids[a], ids[b]))) for a, b in zip(iu[keep], ju[keep])
    }
    assert len(brute) == 40 * 39 // 2  # the hot clique

    def run(cap):
        stats = {}
        got = {
            tuple(sorted((r["src_id"], r["dst_id"])))
            for r in banded_hash_dup_pairs(
                rd.from_arrow(tab).materialize(), "hid", "h",
                max_hamming=3, cap=cap, stats=stats,
            ).take_all()
        }
        return got, stats

    full, st_full = run(cap=256)
    assert full == brute
    small, st_small = run(cap=8)
    assert small <= brute  # never a false positive
    # chain links keep the clique connected even under the cap
    assert small, "salted chunks must still emit verified in-chunk pairs"


def test_incremental_video_dup_pairs_bruteforce(ray_session):
    """incremental_video_dup_pairs == brute force restricted to video
    pairs touching the new shard (new x new src<dst, new x ref
    src=new, never ref x ref), with the same min_frame_matches floor."""
    import ray.data as rd

    from analiticcl_ray.stages.multimodal import (
        incremental_video_dup_pairs,
        video_frame_hashes,
    )

    tab = generate_video_corpus(120, seed=42)
    vids = tab["video_id"].to_pylist()
    ref_idx = list(range(0, len(vids), 2))
    new_idx = list(range(1, len(vids), 2))
    ref_ids = {vids[i] for i in ref_idx}

    all_pairs = _brute_video_pairs(tab, max_hamming=3, min_frame_matches=2)
    expected = {}
    for (a, b), cnt in all_pairs.items():
        a_ref, b_ref = a in ref_ids, b in ref_ids
        if a_ref and b_ref:
            continue  # ref x ref never emitted
        if not a_ref and not b_ref:
            key = (a, b)  # already sorted
        else:  # src is the new side
            key = (b, a) if a_ref else (a, b)
        expected[key] = cnt
    assert expected and any(k[1] in ref_ids for k in expected)
    assert any(k[1] not in ref_ids for k in expected)

    ref_fh = video_frame_hashes(
        rd.from_arrow(tab.take(ref_idx))
    ).materialize()
    got = {
        (r["src_id"], r["dst_id"]): r["n_frame_matches"]
        for r in incremental_video_dup_pairs(
            rd.from_arrow(tab.take(new_idx)), ref_fh,
            max_hamming=3, min_frame_matches=2,
        ).take_all()
    }
    assert got == expected


def test_incremental_video_reingest_supersedes(ray_session):
    """A re-ingested video (present in the new shard AND the persisted
    frame table, possibly with a DIFFERENT frame set — e.g. truncated)
    is superseded wholesale: no self-pairs, no reversed-orientation
    duplicates from stale leftover frames, counts computed against the
    new frame set only."""
    import pyarrow as pa
    import ray.data as rd

    from analiticcl_ray.stages.multimodal import (
        incremental_video_dup_pairs,
        video_frame_hashes,
    )

    tab = generate_video_corpus(60, seed=11)
    vids = tab["video_id"].to_pylist()
    # pick a planted dup pair so cross evidence exists
    pairs = _brute_video_pairs(tab, max_hamming=3, min_frame_matches=2)
    assert pairs
    va, vb = next(iter(sorted(pairs)))
    ia, ib = vids.index(va), vids.index(vb)
    # ref table: ALL videos' frames (va included — it is being re-ingested)
    ref_fh_tab = video_frame_hashes(rd.from_arrow(tab)).materialize()
    # new shard: va and vb re-ingested; va additionally TRUNCATED to its
    # first 2 frames so its persisted frame set is strictly larger
    from analiticcl_ray.stages.multimodal import rawv_decode, rawv_encode

    frames_a = rawv_decode(tab["bytes"][ia].as_py())[:2]
    new_tab = pa.table(
        {
            "video_id": pa.array([va, vb], pa.string()),
            "bytes": pa.array(
                [rawv_encode(frames_a), tab["bytes"][ib].as_py()],
                pa.binary(),
            ),
            "fmt": pa.array(["rawv1", "rawv1"], pa.string()),
        }
    )
    got = {
        (r["src_id"], r["dst_id"]): r["n_frame_matches"]
        for r in incremental_video_dup_pairs(
            rd.from_arrow(new_tab), ref_fh_tab,
            max_hamming=3, min_frame_matches=1,
        ).take_all()
    }
    # no self-pairs, ONE orientation per unordered pair
    assert all(s != d for s, d in got)
    unordered = [tuple(sorted(p)) for p in got]
    assert len(unordered) == len(set(unordered)), got
    # the re-ingested pair is found via the NEW shard (both new -> sorted)
    key = (va, vb) if va < vb else (vb, va)
    assert key in got


def test_mjpg_lossy_roundtrip():
    """The lossy video path (round 4): an mjpg1 round trip decodes to
    the same geometry with FINITE per-frame PSNR (genuinely degraded
    bytes), and per-frame dHash stays within the dup threshold — the
    video analog of the image tier's JPEG+PSNR and the audio tier's
    mu-law+SNR."""
    import numpy as np

    from analiticcl_ray.image.codec import dhash64, hamming64
    from analiticcl_ray.sources.video_corpus import _base_video
    from analiticcl_ray.stages.multimodal import (
        mjpg_decode,
        mjpg_encode,
        video_decode,
    )

    rng = np.random.default_rng(17)
    frames = _base_video(rng)
    # quality 95: measured across 30 corpus seeds the per-frame dHash
    # stays <= 2 bits while PSNR stays finite (35-45 dB) — q90 lands
    # ham<=3 on most seeds but an occasional frame flips 4
    data = mjpg_encode(frames, quality=95)
    out = mjpg_decode(data)
    assert out.shape == frames.shape
    assert not np.array_equal(out, frames)  # truly lossy
    for f, g in zip(frames, out):
        mse = float(np.mean((f.astype(np.float64) - g.astype(np.float64)) ** 2))
        psnr = 10.0 * np.log10(255.0**2 / max(mse, 1e-12))
        assert 20.0 < psnr < 60.0  # finite: real loss, recognizable
        ham = int(
            hamming64(np.array([dhash64(f)]), np.array([dhash64(g)]))[0]
        )
        assert ham <= 3
    # dispatch parity + honest stub for inter-frame codecs
    assert np.array_equal(video_decode(data, "mjpg1"), out)
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        video_decode(b"\x00" * 16, "mp4")


def test_mjpg_cross_container_video_dup(ray_session):
    """video_dup_pairs detects a video and its mjpg1 lossy re-encode as
    a duplicate pair across container formats — decode dispatch and the
    frame-hash join are fmt-agnostic end-to-end."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from analiticcl_ray.sources.video_corpus import _base_video
    from analiticcl_ray.stages.multimodal import (
        mjpg_encode,
        rawv_encode,
        video_dup_pairs,
    )

    rng = np.random.default_rng(23)
    base = _base_video(rng)
    rows = {
        "video_id": ["vid00", "vid01"],
        "bytes": [rawv_encode(base), mjpg_encode(base, quality=95)],
        "fmt": ["rawv1", "mjpg1"],
    }
    for i in range(2, 10):  # unrelated negatives
        v = _base_video(rng)
        rows["video_id"].append(f"vid{i:02d}")
        rows["bytes"].append(rawv_encode(v))
        rows["fmt"].append("rawv1")
    tab = pa.table(
        {
            "video_id": pa.array(rows["video_id"], pa.string()),
            "bytes": pa.array(rows["bytes"], pa.binary()),
            "fmt": pa.array(rows["fmt"], pa.string()),
        }
    )
    got = {
        (r["src_id"], r["dst_id"]): r["n_frame_matches"]
        for r in video_dup_pairs(
            rd.from_arrow(tab), max_hamming=3, min_frame_matches=2
        ).take_all()
    }
    assert ("vid00", "vid01") in got
    assert got[("vid00", "vid01")] >= len(base) - 1
