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


def _column_segments(col) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Zero-copy (data_u8, starts, ends) view of a binary/string column.

    No ``to_pylist``: the variable-length values already sit back-to-back
    in the Arrow data buffer; the offsets buffer delimits the rows."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    t = arr.type
    off_dtype = (
        np.int64
        if (pa.types.is_large_binary(t) or pa.types.is_large_string(t))
        else np.int32
    )
    bufs = arr.buffers()
    off = np.frombuffer(bufs[1], dtype=off_dtype)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.zeros(0, dtype=np.uint8)
    )
    return data, off[:-1], off[1:]


def hash_segments_pair(
    data: np.ndarray, starts: np.ndarray, ends: np.ndarray, seed: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized per-segment content hashing: one pass over the bytes of
    EVERY row in the batch at numpy speed, returning TWO digests per row.

    - ``h1`` equals ``hash_u64(row_bytes, seed)`` exactly for rows under
      131072 bytes (the single-chunk regime; larger rows take a scalar
      fallback with identical chunked semantics).
    - ``h2`` is an INDEPENDENT second digest from the same mixed stream
      (wraparound-sum reduction instead of xor, distinct init constant),
      so the (h1, h2) pair carries ~128 bits: a pair collision requires
      the same byte stream to collide under both reductions, unlike two
      seeded reruns of the xor digest, which collide together whenever
      the xor of the mixed stream collides (ADVICE r1 follow-up)."""
    n = len(starts)
    lens = ends - starts
    h1 = np.full(n, _U64(0xCBF29CE484222325) ^ _U64(seed), dtype=np.uint64)
    h2 = np.full(
        n, splitmix64(np.array([_U64(0xCBF29CE484222325) ^ _U64(seed)]))[0],
        dtype=np.uint64,
    )
    small = lens < 131072
    sel = np.flatnonzero(small & (lens > 0))
    if len(sel):
        seg_lens = lens[sel]
        cum = np.cumsum(seg_lens)
        total = int(cum[-1])
        # per-row byte positions 0..len-1, concatenated
        pos = np.arange(total, dtype=np.int64) - np.repeat(cum - seg_lens, seg_lens)
        idx = np.repeat(starts[sel], seg_lens) + pos
        with np.errstate(over="ignore"):
            mixed = splitmix64(
                data[idx].astype(np.uint64) * _U64(0x100000001B3)
                + pos.astype(np.uint64)
            )
            bounds = np.zeros(len(sel), dtype=np.int64)
            bounds[1:] = cum[:-1]
            x = np.bitwise_xor.reduceat(mixed, bounds)
            s = np.add.reduceat(mixed, bounds)
            h1[sel] = splitmix64(h1[sel] ^ x)
            h2[sel] = splitmix64(h2[sel] ^ s)
    for i in np.flatnonzero(~small):
        row = data[starts[i] : ends[i]].tobytes()
        h1[i] = hash_u64(row, seed=seed)
        # chunk the sum digest the same way for determinism at any size
        hh = h2[i]
        arr = np.frombuffer(row, dtype=np.uint8).astype(np.uint64)
        with np.errstate(over="ignore"):
            for chunk_i, chunk in enumerate(
                np.array_split(arr, max(1, len(arr) // 65536))
            ):
                p = np.arange(len(chunk), dtype=np.uint64)
                mixed = splitmix64(chunk * _U64(0x100000001B3) + p)
                hh = splitmix64(hh ^ np.add.reduce(mixed))
        h2[i] = hh
    return h1, h2


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
        # one vectorized pass over the blob bytes yields BOTH halves of
        # the 128-bit (bytes_key, bytes_key2) pair — 64-bit birthday
        # collisions are expected at 1e12 rows, 128-bit are not
        # (ADVICE r1); no to_pylist, the Arrow data buffer is hashed
        # in place via the offsets
        bytes_keys, bytes_keys2 = hash_segments_pair(
            *_column_segments(batch["bytes"]), seed=1
        )
        caption_keys, _ = hash_segments_pair(
            *_column_segments(batch["caption"]), seed=0
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


def hash_band_table(
    batch: pa.Table, col: str, bands: int = 4, out_col: str = None
) -> pa.Table:
    """64-bit hash int64 column -> fixed_size_list<uint64> of bit-slice
    band keys (slice value salted with its band index so different
    slices never collide into the same groupby bucket). Pigeonhole:
    two hashes within hamming distance ``bands - 1`` share at least
    one band key, so banding is COMPLETE for ``max_hamming < bands``."""
    ph = batch[col].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
    n = len(ph)
    width = 64 // bands
    mask = _U64((1 << width) - 1)
    out = np.empty((n, bands), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for b in range(bands):
            slice_bits = (ph >> _U64(b * width)) & mask
            out[:, b] = splitmix64(
                slice_bits ^ _U64((0xA076_1D64_78BD_642F * (b + 1)) & 0xFFFFFFFFFFFFFFFF)
            )
    return batch.append_column(
        out_col or f"{col}_bands",
        pa.FixedSizeListArray.from_arrays(
            pa.array(out.reshape(-1).view(np.int64), pa.int64()), bands
        ),
    )


def phash_band_table(batch: pa.Table, phash_bands: int = 4) -> pa.Table:
    """phash-specific wrapper kept for the dedup pipeline's call sites."""
    return hash_band_table(batch, "phash", phash_bands, out_col="phash_bands")
