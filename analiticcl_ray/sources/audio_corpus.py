"""Deterministic synthetic audio corpus (audio tier of FIXTURES.md §1).

Same opaque-binary-with-typed-metadata shape as the image corpus
(input_hint analog):
    (audio_id:string, bytes:binary, sr:int32, n_samples:int32, fmt:string)

Clips are procedural mono PCM in the real ``rawa1`` container
(audio/codec.py): 2-4 sinusoid partials with randomized frequencies and
amplitudes under an attack-decay amplitude envelope (so the fingerprint's
time slices carry real temporal structure) plus a small noise floor.

Planted duplicate structure (all seeded, reproducible, mirrors the image
corpus' mutation taxonomy):
- ~20% of rows are near-duplicates of a base clip: identical bytes,
  gain change (fingerprint-invariant by construction — log-energy
  differences cancel a constant gain), small additive noise (often
  within the fingerprint dup threshold, but decaying-envelope clips
  leave late time slices noise-dominated, so a fraction lands above
  it — the brute-force oracle counts whatever the kernel says, and
  the detected-dup demonstration rests on the exact/gain classes),
  strong noise (hamming >> 3, negative
  control), with occasional A~B~C chains.
- ~1% "room tone" skew block: near-silent noise-only clips whose
  fingerprints collapse to a handful of values -> hot LSH band bucket,
  exercising the cap/salting path exactly like the boilerplate-caption
  block does on the text side.

Ground truth is NOT emitted from generator bookkeeping: tests recompute
it with the brute-force all-pairs fingerprint-hamming oracle, so truth ==
"what the verify kernel says" (tests/test_audio.py).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from ..audio.codec import rawa_encode

SR = 8000


def _base_clip(rng: np.random.Generator) -> np.ndarray:
    """Procedural clip: partials + attack-decay envelope + noise floor."""
    n = int(rng.integers(SR // 2, SR + 1))  # 0.5 - 1.0 s
    t = np.arange(n) / SR
    x = np.zeros(n)
    for _ in range(int(rng.integers(2, 5))):
        f = float(rng.uniform(150.0, 3200.0))
        a = float(rng.uniform(0.1, 0.35))
        x += a * np.sin(2 * np.pi * f * t + float(rng.uniform(0, 2 * np.pi)))
    attack = float(rng.uniform(0.02, 0.2))
    decay = float(rng.uniform(1.0, 6.0))
    env = np.minimum(t / attack, 1.0) * np.exp(-decay * t)
    x = x * env + 0.003 * rng.standard_normal(n)
    return np.clip(x, -1.0, 1.0)


def _mutate_clip(
    rng: np.random.Generator, x: np.ndarray, kind: str
) -> np.ndarray:
    if kind == "exact":
        return x
    if kind == "gain":  # volume change — fingerprint-invariant
        return np.clip(x * float(rng.uniform(0.55, 0.9)), -1.0, 1.0)
    if kind == "noise":  # small additive noise (fp hamming varies —
        # decaying tails push some clips past the dup threshold; the
        # brute-force oracles count whatever the kernel says)
        return np.clip(x + 0.004 * rng.standard_normal(len(x)), -1.0, 1.0)
    if kind == "strong":  # negative control, fp hamming >> threshold
        return np.clip(x + 0.25 * rng.standard_normal(len(x)), -1.0, 1.0)
    raise ValueError(kind)


AUDIO_KINDS = ["exact", "gain", "noise", "strong"]


def generate_audio_corpus(n_rows: int, seed: int = 42) -> pa.Table:
    """~64% unique base clips, ~20% mutated near-dups (incl. chains),
    ~1% room-tone skew rows."""
    rng = np.random.default_rng(seed)
    ids: list[str] = []
    blobs: list[bytes] = []
    ns: list[int] = []

    def emit(x: np.ndarray) -> None:
        ids.append(f"aud{len(ids):08d}")
        blobs.append(rawa_encode(x, SR))
        ns.append(len(x))

    n_skew = max(2, n_rows // 100)
    i = 0
    while i < n_rows - n_skew:
        x = _base_clip(rng)
        emit(x)
        i += 1
        if rng.random() < 0.20 and i < n_rows - n_skew:
            n_var = int(rng.integers(1, 4))
            prev = x
            for _ in range(min(n_var, n_rows - n_skew - i)):
                kind = AUDIO_KINDS[int(rng.integers(len(AUDIO_KINDS)))]
                src = prev if rng.random() < 0.3 else x
                m = _mutate_clip(rng, src, kind)
                emit(m)
                prev = m
                i += 1
    while i < n_rows:  # room tone: near-silent, degenerate fingerprints
        emit(0.002 * rng.standard_normal(SR // 2))
        i += 1

    n = len(ids)
    return pa.table(
        {
            "audio_id": pa.array(ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "sr": pa.array(np.full(n, SR, np.int32), pa.int32()),
            "n_samples": pa.array(np.asarray(ns, np.int32), pa.int32()),
            "fmt": pa.array(["rawa1"] * n, pa.string()),
        }
    )


def audio_corpus_path(
    n_rows: int, seed: int = 42, root: str = "/tmp/analiticcl_ray",
    n_files: int = 32,
) -> str:
    """Materialize (once) and return the parquet DIRECTORY
    (sources/corpus.py:write_corpus_dir)."""
    from .corpus import write_corpus_dir

    return write_corpus_dir(
        os.path.join(root, f"audio_n{n_rows}_s{seed}"),
        lambda: generate_audio_corpus(n_rows, seed),
        n_rows, n_files, rows_per_file_hint=256, min_row_group=512,
    )
