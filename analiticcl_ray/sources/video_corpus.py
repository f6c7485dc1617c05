"""Deterministic synthetic video corpus (video tier of FIXTURES.md §1).

Same opaque-binary-with-typed-metadata shape as the image/audio tiers
(input_hint analog):
    (video_id:string, bytes:binary, n_frames:int32, h:int32, w:int32,
     fmt:string)

Videos are real ``rawv1`` containers (stages/multimodal.py): 6-10
frames of the image corpus' procedural RGB tiles animated by per-frame
translation (np.roll) plus a moving brightness ramp, so consecutive
frames are related but hash-distinct — per-frame dHashes carry real
temporal structure.

Planted duplicate structure (seeded, reproducible, mirrors the image
corpus' mutation taxonomy):
- ~20% of rows are near-duplicates of a base video: identical bytes, a
  non-clipping brightness shift (dHash-invariant by construction), ±1
  LSB per-frame noise (small per-frame hamming), strong per-frame
  noise (negative control), and truncation (first frames only — the
  partial-overlap case min_frame_matches exists for).

Ground truth is NOT emitted from generator bookkeeping: tests recompute
it with the brute-force all-pairs frame-hamming oracle, so truth ==
"what the verify kernel says" (tests/test_video.py)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from .corpus import _base_pixels

FRAME_H = 32
FRAME_W = 32


def _base_video(rng: np.random.Generator) -> np.ndarray:
    """(n, h, w, 3) uint8: one procedural tile animated by translation
    and a moving brightness ramp."""
    n = int(rng.integers(6, 11))
    base = _base_pixels(rng, FRAME_W, FRAME_H).astype(np.int32)
    dx, dy = int(rng.integers(1, 4)), int(rng.integers(0, 3))
    ramp_dir = 1 if rng.random() < 0.5 else -1
    xx = np.arange(FRAME_W)[None, :, None]
    frames = np.empty((n, FRAME_H, FRAME_W, 3), dtype=np.uint8)
    for t in range(n):
        f = np.roll(np.roll(base, t * dx, axis=1), t * dy, axis=0)
        f = f + ramp_dir * ((xx + 7 * t) % 29)  # moving brightness ramp
        frames[t] = np.clip(f, 0, 255).astype(np.uint8)
    return frames


def _mutate_video(
    rng: np.random.Generator, frames: np.ndarray, kind: str
) -> np.ndarray:
    if kind == "exact":
        return frames
    if kind == "bright":  # non-clipping shift — dHash-invariant
        headroom = int(min(40, 255 - frames.max()))
        return (frames.astype(np.int32) + headroom).astype(np.uint8)
    if kind == "lsb":  # ±1 LSB noise per frame, small per-frame hamming
        return np.clip(
            frames.astype(np.int32) + rng.integers(-1, 2, frames.shape),
            0, 255,
        ).astype(np.uint8)
    if kind == "strong":  # negative control
        return np.clip(
            frames.astype(np.int32) + rng.integers(-35, 36, frames.shape),
            0, 255,
        ).astype(np.uint8)
    if kind == "trunc":  # partial overlap: first ceil(n/2) frames only
        return frames[: max(2, (len(frames) + 1) // 2)]
    raise ValueError(kind)


VIDEO_KINDS = ["exact", "bright", "lsb", "strong", "trunc"]


def generate_video_corpus(n_rows: int, seed: int = 42) -> pa.Table:
    """~64% unique base videos, ~20% mutated near-dups (incl. chains)."""
    from ..stages.multimodal import rawv_encode

    rng = np.random.default_rng(seed)
    ids: list[str] = []
    blobs: list[bytes] = []
    nfs: list[int] = []

    def emit(frames: np.ndarray) -> None:
        ids.append(f"vid{len(ids):08d}")
        blobs.append(rawv_encode(frames))
        nfs.append(len(frames))

    i = 0
    while i < n_rows:
        frames = _base_video(rng)
        emit(frames)
        i += 1
        if rng.random() < 0.20 and i < n_rows:
            n_var = int(rng.integers(1, 4))
            prev = frames
            for _ in range(min(n_var, n_rows - i)):
                kind = VIDEO_KINDS[int(rng.integers(len(VIDEO_KINDS)))]
                src = prev if rng.random() < 0.3 else frames
                m = _mutate_video(rng, src, kind)
                emit(m)
                prev = m
                i += 1

    n = len(ids)
    return pa.table(
        {
            "video_id": pa.array(ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "n_frames": pa.array(np.asarray(nfs, np.int32), pa.int32()),
            "h": pa.array(np.full(n, FRAME_H, np.int32), pa.int32()),
            "w": pa.array(np.full(n, FRAME_W, np.int32), pa.int32()),
            "fmt": pa.array(["rawv1"] * n, pa.string()),
        }
    )


def video_corpus_path(
    n_rows: int, seed: int = 42, root: str = "/tmp/analiticcl_ray",
    n_files: int = 32,
) -> str:
    """Materialize (once) and return the parquet DIRECTORY
    (sources/corpus.py:write_corpus_dir)."""
    from .corpus import write_corpus_dir

    return write_corpus_dir(
        os.path.join(root, f"video_n{n_rows}_s{seed}"),
        lambda: generate_video_corpus(n_rows, seed),
        n_rows, n_files, rows_per_file_hint=64, min_row_group=128,
    )
