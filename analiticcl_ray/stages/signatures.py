"""Signature stages: per-row sketches computed in ``map_batches``.

Replaces analiticcl's resident AnaIndex build (src/lib.rs:192-297) with
shuffle-friendly per-row signatures (SURVEY.md §1.2/§2.4 T1/T3): the
"index" is realized later as a groupby on band keys, never as a resident
hash map.

- caption shingles: char n-grams of the alphabet-normalized caption,
  keyed by the *anagram value* of the window (product of primes per
  class, src/anahash.rs:16-47 applied per n-gram; fits uint64 for n=3).
- MinHash over shingle keys: ``num_perm`` independent splitmix64-mixed
  hash functions, per-row minima; emitted directly as ``bands``
  (num_perm/bands values hashed per band -> one uint64 band key each),
  so the signature never needs to be stored or shuffled in full.
- SimHash over phash bit-planes: the 64-bit DCT phash split into
  ``phash_bands`` equal bit slices; two images within Hamming distance
  (phash_bands - 1) share at least one slice verbatim (pigeonhole).
- content_key: splitmix64 over (caption bytes, image bytes) for exact
  duplicate detection (vocab upsert analog, src/lib.rs:899-967).

All stages are zero-copy Arrow in / Arrow out; the only Python-level
loop is over rows *within* a batch for the variable-length shingle
scatter, with numpy doing the per-row vector math.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import DedupConfig
from ..functions.alphabet import Normalizer, shingle_keys_from_norm, simple_alphabet

_U64 = np.uint64


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constant mix);
    wraparound uint64 arithmetic is intended."""
    z = x + _U64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
    return z ^ (z >> _U64(31))


def hash_u64(data: bytes, seed: int = 0) -> int:
    """Deterministic 64-bit content hash (FNV-1a into splitmix64)."""
    h = np.uint64(0xCBF29CE484222325 ^ seed)
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    with np.errstate(over="ignore"):
        for chunk in np.array_split(arr, max(1, len(arr) // 65536)) if len(arr) else []:
            # fold chunks via numpy dot-style mixing: mix each byte with its
            # position, xor-reduce, then re-mix with the running hash
            pos = np.arange(len(chunk), dtype=np.uint64)
            mixed = splitmix64(chunk * _U64(0x100000001B3) + pos)
            h = splitmix64(h ^ np.bitwise_xor.reduce(mixed))
    return int(h)


class CaptionSignatures:
    """Actor-pool stage: caption -> MinHash LSH band keys + content key.

    State built once per actor (__init__): the compiled alphabet and the
    per-permutation seed vector — the pattern the reference uses for its
    model state (SearchParameters / alphabet loaded once, then shared,
    src/bin/analiticcl.rs:997-1112)."""

    def __init__(self, cfg: DedupConfig | None = None, alphabet=None):
        self.cfg = cfg or DedupConfig()
        self.norm = Normalizer(alphabet or simple_alphabet())
        # per-permutation seeds, fixed by cfg.seed => deterministic under retries
        self.perm_seeds = splitmix64(
            np.arange(self.cfg.num_perm, dtype=np.uint64)
            + _U64(self.cfg.seed * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF)
        )
        # caption -> shingle-key array memo: duplicate-heavy corpora
        # repeat captions, skipping normalize + windowed prime products
        self._shingle_memo: dict[str, np.ndarray] = {}

    def _minhash_bands(self, shingle_sets: list[np.ndarray]) -> np.ndarray:
        """list of per-row shingle-key arrays -> (n_rows, bands) uint64."""
        cfg = self.cfg
        n = len(shingle_sets)
        lens = np.array([len(s) for s in shingle_sets], dtype=np.int64)
        out_sigs = np.full((n, cfg.num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
        nonempty = np.where(lens > 0)[0]
        if len(nonempty):
            concat = np.concatenate([shingle_sets[i] for i in nonempty])
            starts = np.zeros(len(nonempty), dtype=np.int64)
            starts[1:] = np.cumsum(lens[nonempty])[:-1]
            with np.errstate(over="ignore"):
                for p in range(cfg.num_perm):
                    hp = splitmix64(concat ^ self.perm_seeds[p])
                    out_sigs[nonempty, p] = np.minimum.reduceat(hp, starts)
        # hash each band's row-slice into one uint64 key (band idx salted in)
        r = cfg.band_rows
        bands = np.empty((n, cfg.bands), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for b in range(cfg.bands):
                acc = np.full(n, _U64(b * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF))
                for rr in range(r):
                    acc = splitmix64(acc ^ out_sigs[:, b * r + rr])
                bands[:, b] = acc
        return bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        captions = batch["caption"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        shingles = []
        norm_lens = np.empty(len(captions), dtype=np.int32)
        for i, c in enumerate(captions):
            hit = self._shingle_memo.get(c)
            if hit is None:
                nm = self.norm.normalize(c)
                ks = shingle_keys_from_norm(
                    nm, self.norm.unk_hash_index, self.norm.unk_norm, cfg.shingle_n
                )
                if len(self._shingle_memo) > 500_000:
                    self._shingle_memo.clear()
                hit = (len(nm), ks)
                self._shingle_memo[c] = hit
            norm_lens[i] = hit[0]
            shingles.append(hit[1])
        bands = self._minhash_bands(shingles)
        bytes_keys = np.array([hash_u64(b, seed=1) for b in blobs], dtype=np.uint64)
        # second independent 64-bit hash: bytes-equality decisions use
        # the 128-bit (bytes_key, bytes_key2) pair — 64-bit birthday
        # collisions are expected at 1e12 rows, 128-bit are not
        # (ADVICE r1)
        bytes_keys2 = np.array([hash_u64(b, seed=2) for b in blobs], dtype=np.uint64)
        caption_keys = np.array(
            [hash_u64(c.encode("utf-8")) for c in captions], dtype=np.uint64
        )
        content = caption_keys ^ bytes_keys
        # int64 bit-views: Arrow-native (Ray's conversion path rejects
        # uint64 values above int64 max); bit pattern preserved
        return (
            batch.append_column("norm_len", pa.array(norm_lens, pa.int32()))
            .append_column("content_key", pa.array(content.view(np.int64), pa.int64()))
            .append_column("bytes_key", pa.array(bytes_keys.view(np.int64), pa.int64()))
            .append_column("bytes_key2", pa.array(bytes_keys2.view(np.int64), pa.int64()))
            .append_column(
                "bands",
                pa.FixedSizeListArray.from_arrays(
                    pa.array(bands.reshape(-1).view(np.int64), pa.int64()), cfg.bands
                ),
            )
        )


def phash_band_table(batch: pa.Table, phash_bands: int = 4) -> pa.Table:
    """phash int64 -> fixed_size_list<uint64> of bit-slice band keys
    (slice value salted with its band index so different slices never
    collide into the same groupby bucket)."""
    ph = batch["phash"].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
    n = len(ph)
    width = 64 // phash_bands
    mask = _U64((1 << width) - 1)
    out = np.empty((n, phash_bands), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for b in range(phash_bands):
            slice_bits = (ph >> _U64(b * width)) & mask
            out[:, b] = splitmix64(
                slice_bits ^ _U64((0xA076_1D64_78BD_642F * (b + 1)) & 0xFFFFFFFFFFFFFFFF)
            )
    return batch.append_column(
        "phash_bands",
        pa.FixedSizeListArray.from_arrays(
            pa.array(out.reshape(-1).view(np.int64), pa.int64()), phash_bands
        ),
    )
