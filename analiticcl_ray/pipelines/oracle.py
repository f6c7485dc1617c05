"""Brute-force ground-truth oracle (driver-side, test scale only).

Computes ALL duplicate pairs over a corpus table by (pruned) O(n^2)
application of the exact same verify kernel the pipeline uses
(functions/verify_kernel.py). The pruning is *lossless*:

- bag-of-characters L1 lower bound: one DL edit changes the character
  multiset by at most 2 (substitution), 1 (indel) or 0 (transposition),
  so ceil(L1/2) <= DL — pairs with L1/2 > max_edit_distance can never
  pass the DL cutoff (the same reasoning behind analiticcl's anagram
  neighborhood bound, src/lib.rs:1143-1308).
- length-difference bound: |len_a - len_b| <= DL (src/distance.rs:115-130).

Used by tests to assert pipeline dup-pair recall >= 0.99 (BASELINE.json)
and to validate connected-components cluster assignments.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

from ..config import DedupConfig
from ..functions.alphabet import Normalizer, simple_alphabet
from ..functions.kernels import resolve_max_distance
from ..functions.verify_kernel import caption_pair_score, image_pair_dup


def oracle_pairs(table: pa.Table, cfg: DedupConfig | None = None) -> set[tuple[str, str]]:
    """All verified duplicate pairs (canonical id order) by brute force."""
    cfg = cfg or DedupConfig()
    norm = Normalizer(simple_alphabet())
    ids = table["image_id"].to_pylist()
    captions = table["caption"].to_pylist()
    blobs = table["bytes"].to_pylist()
    fmts = table["fmt"].to_pylist()
    n = len(ids)

    norms = [norm.normalize(c) for c in captions]
    lens = np.array([len(x) for x in norms], dtype=np.int64)
    # bag vectors over alphabet classes (+UNK slots)
    width = norm.size + 2
    bags = np.zeros((n, width), dtype=np.int32)
    for i, nm in enumerate(norms):
        if len(nm):
            np.add.at(bags[i], np.minimum(nm, width - 1), 1)

    # max possible edit distance for a pair = resolved vs the longer side
    max_ed_by_len = np.array(
        [resolve_max_distance(int(l), cfg.max_edit_distance) if l > 0 else 0 for l in lens],
        dtype=np.int64,
    )

    pixel_cache: dict = {}
    caption_memo: dict[tuple[str, str], Optional[float]] = {}
    pairs: set[tuple[str, str]] = set()
    chunk = 512
    for s in range(0, n, chunk):
        e = min(n, s + chunk)
        # L1 bag distance block (e-s, n)
        l1 = np.abs(bags[s:e, None, :] - bags[None, :, :]).sum(axis=2)
        for bi in range(s, e):
            longer = np.maximum(lens[bi], lens)
            # resolved cutoff per pair (vs the longer side)
            cut = np.where(lens >= lens[bi], max_ed_by_len, max_ed_by_len[bi])
            cand = np.where(
                ((l1[bi - s] + 1) // 2 <= cut)
                & (np.abs(lens - lens[bi]) <= cut)
                & (np.arange(n) > bi)
                & (longer > 0)
            )[0]
            for j in cand:
                j = int(j)
                ckey = (
                    (captions[bi], captions[j])
                    if captions[bi] <= captions[j]
                    else (captions[j], captions[bi])
                )
                if ckey in caption_memo:
                    cs = caption_memo[ckey]
                else:
                    cs = caption_pair_score(
                        norms[bi], norms[j], captions[bi], captions[j], cfg
                    )
                    caption_memo[ckey] = cs
                if cs is None or cs < cfg.caption_score_threshold:
                    continue
                is_dup, _ = image_pair_dup(
                    blobs[bi], fmts[bi], blobs[j], fmts[j], cfg,
                    pixel_cache, ids[bi], ids[j],
                )
                if is_dup:
                    a, b = sorted((ids[bi], ids[j]))
                    pairs.add((a, b))
    return pairs


def oracle_clusters(
    table: pa.Table, pairs: set[tuple[str, str]] | None = None,
    cfg: DedupConfig | None = None,
) -> dict[str, str]:
    """image_id -> cluster representative (min id in component), via
    union-find over the oracle pair set."""
    if pairs is None:
        pairs = oracle_pairs(table, cfg)
    parent: dict[str, str] = {i: i for i in table["image_id"].to_pylist()}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = sorted((ra, rb))
            parent[hi] = lo
    return {i: find(i) for i in parent}
