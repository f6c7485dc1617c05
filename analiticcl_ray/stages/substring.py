"""Long-shared-span candidate stage (winnowing fingerprints).

Role (north rule): catch caption pairs that share a long contiguous span
but differ enough elsewhere that shingle-MinHash banding misses them —
the distributed counterpart of the reference's LCS component
(src/distance.rs:181-205) and its boundary/ngram substring machinery
(src/search.rs:190-313).

Design: instead of per-bucket suffix arrays (which need co-located,
materialized caption groups), we use *winnowing* (Schleimer, Wilkerson,
Aiken, SIGMOD 2003 — the MOSS fingerprinting algorithm): rolling hashes
of ``kgram``-length windows over the normalized caption, keeping the
minimum hash in every window of ``window`` consecutive k-grams. Two
strings sharing a span of at least ``kgram + window - 1`` characters are
GUARANTEED to share at least one fingerprint — so this is a
deterministic (not probabilistic) candidate generator for long spans,
and it composes into the same (key, image_id) -> groupby -> pairs
shuffle as the LSH band stage (one partitioning idiom reused, SURVEY.md
§4.2).

Output feeds the same union -> pair-dedup -> verify path; false
positives cost one verify-kernel call, false negatives are bounded by
the guarantee above.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..config import DedupConfig
from ..functions.alphabet import Normalizer, simple_alphabet
from .signatures import splitmix64

_U64 = np.uint64


def winnow_fingerprints(
    norm: np.ndarray, kgram: int = 16, window: int = 8, seed: int = 0x5EED
) -> np.ndarray:
    """Winnowed k-gram fingerprints of one normalized string (uint64)."""
    n = len(norm)
    if n < kgram:
        return np.empty(0, dtype=np.uint64)
    codes = norm.astype(np.uint64)
    # k-gram keys: positional polynomial hash via sliding window + mix
    win = np.lib.stride_tricks.sliding_window_view(codes, kgram)
    with np.errstate(over="ignore"):
        weights = splitmix64(np.arange(kgram, dtype=np.uint64) + _U64(seed))
        kh = splitmix64((win * weights).sum(axis=1, dtype=np.uint64))
    if len(kh) <= window:
        return np.unique(kh.min(keepdims=True))
    mins = np.lib.stride_tricks.sliding_window_view(kh, window).min(axis=1)
    return np.unique(mins)


class SubstringFingerprints:
    """Actor-pool map_batches stage -> long table (band, image_id),
    directly unionable with the LSH band rows."""

    def __init__(
        self,
        cfg: DedupConfig | None = None,
        alphabet=None,
        kgram: int | None = None,
        window: int | None = None,
    ):
        self.cfg = cfg or DedupConfig()
        self.norm = Normalizer(alphabet or simple_alphabet())
        self.kgram = kgram if kgram is not None else self.cfg.winnow_kgram
        self.window = window if window is not None else self.cfg.winnow_window
        # duplicate-heavy corpora repeat captions; per-actor memo skips
        # the whole normalize+hash+winnow chain on repeats (src/cache.rs
        # analog)
        self._memo: dict[str, np.ndarray] = {}

    def _fps(self, c: str) -> np.ndarray:
        f = self._memo.get(c)
        if f is None:
            if len(self._memo) > 500_000:
                self._memo.clear()
            f = winnow_fingerprints(
                self.norm.normalize(c), self.kgram, self.window, self.cfg.seed
            )
            self._memo[c] = f
        return f

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        caps = batch["caption"].to_pylist()
        out_band: list[np.ndarray] = []
        out_id: list[str] = []
        for i, c in enumerate(caps):
            fps = self._fps(c)
            if len(fps):
                out_band.append(fps)
                out_id.extend([ids[i]] * len(fps))
        bands = (
            np.concatenate(out_band) if out_band else np.empty(0, dtype=np.uint64)
        )
        return pa.table(
            {
                "band": pa.array(bands.view(np.int64), pa.int64()),
                "image_id": pa.array(out_id, pa.string()),
            }
        )
