"""Exact scalar kernels matching analiticcl's distance / scoring semantics.

These are the semantic anchor of the whole engine: every pairwise verify
stage and the query-mode variant matcher call into this module. Each
function is a faithful reimplementation (not a copy) of the reference
behavior, cited by file:line into /root/reference:

- ``levenshtein``                     -> src/distance.rs:7-82
- ``damerau_levenshtein``             -> src/distance.rs:101-179
- ``longest_common_substring_length`` -> src/distance.rs:181-205
- ``common_prefix_length``            -> src/distance.rs:208-218
- ``common_suffix_length``            -> src/distance.rs:221-231
- ``distance_score``                  -> src/lib.rs:1430-1452 (weighted
  linear combination normalized by input length; exact match == 1.0)
- ``blended_score``                   -> src/types.rs:335-341
- ``rank_key`` / ``rank_results``     -> src/types.rs:343-365 (dist desc,
  freq tie-break)
- ``resolve_max_distance``            -> src/lib.rs:982-1012 with consts
  MAX_ANAGRAM_DISTANCE = MAX_EDIT_DISTANCE = 12 (src/lib.rs:42-46)
- ``truncate_results``                -> src/lib.rs:1535-1589 (tie-aware
  max_matches truncation) and src/lib.rs:1597-1622 (cutoff threshold)

All distance kernels operate on *normalized* sequences (lists/arrays of
alphabet indices, see alphabet.py), never raw strings — mirroring the
reference's ``NormString`` (src/types.rs:18).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np

# Absolute safeguard caps, src/lib.rs:42-46.
MAX_ANAGRAM_DISTANCE = 12
MAX_EDIT_DISTANCE = 12


@dataclass(frozen=True)
class Weights:
    """Score-component weights; defaults mirror src/types.rs:57-67."""

    ld: float = 0.5
    lcs: float = 0.125
    prefix: float = 0.125
    suffix: float = 0.125
    case: float = 0.125

    @property
    def sum(self) -> float:
        return self.ld + self.lcs + self.prefix + self.suffix + self.case


def levenshtein(a: Sequence[int], b: Sequence[int], max_distance: int) -> Optional[int]:
    """Plain Levenshtein with early-None above ``max_distance``.

    Mirrors src/distance.rs:7-82 (single-row DP).
    """
    if len(a) == len(b) and list(a) == list(b):
        return 0
    la, lb = len(a), len(b)
    if la == 0:
        return lb if lb <= max_distance else None
    if lb == 0:
        return la if la <= max_distance else None
    if abs(la - lb) > max_distance:
        return None

    cache = list(range(1, la + 1))
    result = 0
    for ib, eb in enumerate(b):
        result = ib
        dist_a = ib
        for ia, ea in enumerate(a):
            dist_b = dist_a if ea == eb else dist_a + 1
            dist_a = cache[ia]
            if dist_a > result:
                result = result + 1 if dist_b > result else dist_b
            elif dist_b > dist_a:
                result = dist_a + 1
            else:
                result = dist_b
            cache[ia] = result
    return result if result <= max_distance else None


def damerau_levenshtein(
    s: Sequence[int], t: Sequence[int], max_distance: int
) -> Optional[int]:
    """Full Damerau-Levenshtein (true transpositions, not OSA).

    Mirrors src/distance.rs:101-179: the (len+2)x(len+2) matrix with the
    last-seen-character map; returns None above ``max_distance``
    (length-difference prefilter included, src/distance.rs:108-130).
    """
    ls, lt = len(s), len(t)
    if ls == 0:
        return lt if lt <= max_distance else None
    if lt == 0:
        return ls if ls <= max_distance else None
    if abs(ls - lt) > max_distance:
        return None

    big = ls + lt
    mat = [[0] * (lt + 2) for _ in range(ls + 2)]
    mat[0][0] = big
    for i in range(ls + 1):
        mat[i + 1][0] = big
        mat[i + 1][1] = i
    for j in range(lt + 1):
        mat[0][j + 1] = big
        mat[1][j + 1] = j

    char_map: dict[int, int] = {}
    for i1, sc in enumerate(s):
        db = 0
        i = i1 + 1
        row_i1, row_i = mat[i], mat[i + 1]
        row_min = big
        for j1, tc in enumerate(t):
            j = j1 + 1
            last = char_map.get(tc, 0)
            cost = 0 if sc == tc else 1
            v = min(
                row_i[j] + 1,                                  # deletion
                row_i1[j + 1] + 1,                             # insertion
                row_i1[j] + cost,                              # substitution
                mat[last][db] + (i - last - 1) + 1 + (j - db - 1),  # transposition
            )
            row_i[j + 1] = v
            if v < row_min:
                row_min = v
            if cost == 0:
                db = j
        char_map[sc] = i
        # early abandon: row minima are non-decreasing in this DP (verified
        # against the exhaustive version by the parity fuzz tests), so once
        # a whole row exceeds max_distance the final cell must too. Same
        # role as the reference's early-None cutoff (src/distance.rs:174-178).
        if row_min > max_distance:
            return None

    result = mat[ls + 1][lt + 1]
    return result if result <= max_distance else None


def damerau_levenshtein_np(
    s: np.ndarray, t: np.ndarray, max_distance: int
) -> Optional[int]:
    """Row-vectorized Damerau-Levenshtein, bit-identical to
    ``damerau_levenshtein`` (verified by the parity test suite), ~10-30x
    faster on caption-length inputs.

    Vectorization notes: insertion/substitution/transposition candidates
    are computed with numpy per row; the sequential deletion dependency
    row[j] <= row[j-1]+1 is resolved with the standard prefix-min trick
    ``minimum.accumulate(cand - j) + j``. The transposition term gathers
    ``mat[last][db]`` from earlier rows, where ``last`` = last row index
    with s[last-1] == t[j-1] and ``db`` = last column so far with
    t[db-1] == s[i-1] — both precomputable per row."""
    ls, lt = len(s), len(t)
    if ls == 0:
        return lt if lt <= max_distance else None
    if lt == 0:
        return ls if ls <= max_distance else None
    if abs(ls - lt) > max_distance:
        return None

    s = np.asarray(s, dtype=np.int64)
    t = np.asarray(t, dtype=np.int64)
    big = ls + lt
    # mat rows 0..ls+1, cols 0..lt+1 (same layout as the scalar version)
    mat = np.full((ls + 2, lt + 2), 0, dtype=np.int64)
    mat[0, :] = big
    mat[:, 0] = big
    mat[1:, 1] = np.arange(ls + 1)
    mat[1, 1:] = np.arange(lt + 1)

    j_idx = np.arange(1, lt + 1)
    # last_for_col[j-1]: last row i' < i with s[i'-1] == t[j-1], updated
    # incrementally after each row (no per-row rescan of t)
    last_for_col = np.zeros(lt, dtype=np.int64)

    for i in range(1, ls + 1):
        sc = int(s[i - 1])
        eq = t == sc  # (lt,)
        # db[j]: last j' in 1..j-1 with t[j'-1]==sc, else 0
        occ = np.where(eq, j_idx, 0)
        db = np.zeros(lt, dtype=np.int64)
        if occ.any():
            db[1:] = np.maximum.accumulate(occ)[:-1]
        last = last_for_col
        cost = (~eq).astype(np.int64)
        ins = mat[i, 2 : lt + 2] + 1            # mat[i][j+1] + 1
        sub = mat[i, 1 : lt + 1] + cost          # mat[i][j] + cost
        trans = mat[last, db] + (i - last - 1) + 1 + (j_idx - db - 1)
        cand = np.minimum(np.minimum(ins, sub), trans)
        # deletion: row[j+1] = min(cand[j], row[j] + 1) -> prefix-min trick
        # row starts at mat[i+1][1] = i-1+... actually mat[i+1][1] = i
        base = np.minimum.accumulate(cand - j_idx)
        first = mat[i + 1, 1]  # = i
        row = np.minimum(base, first) + j_idx
        mat[i + 1, 2 : lt + 2] = row
        last_for_col[eq] = i

    result = int(mat[ls + 1, lt + 1])
    return result if result <= max_distance else None


def longest_common_substring_length(s1: Sequence[int], s2: Sequence[int]) -> int:
    """Longest common *substring* (contiguous), src/distance.rs:181-205.

    Vectorized via numpy diagonal run-length scan (same O(n*m) result,
    ~20x faster than the nested Python loop for caption-length inputs).
    """
    n, m = len(s1), len(s2)
    if n == 0 or m == 0:
        return 0
    a = np.asarray(s1, dtype=np.int64)
    b = np.asarray(s2, dtype=np.int64)
    eq = a[:, None] == b[None, :]
    # DP over rows: run[j] = run_prev[j-1]+1 where eq
    best = 0
    prev = np.zeros(m + 1, dtype=np.int64)
    cur = np.zeros(m + 1, dtype=np.int64)
    for i in range(n):
        cur[1:] = np.where(eq[i], prev[:-1] + 1, 0)
        row_max = cur.max()
        if row_max > best:
            best = int(row_max)
        prev, cur = cur, prev
    return best


def common_prefix_length(s1: Sequence[int], s2: Sequence[int]) -> int:
    """src/distance.rs:208-218."""
    n = min(len(s1), len(s2))
    for i in range(n):
        if s1[i] != s2[i]:
            return i
    return n


def common_suffix_length(s1: Sequence[int], s2: Sequence[int]) -> int:
    """src/distance.rs:221-231."""
    n = min(len(s1), len(s2))
    for i in range(n):
        if s1[len(s1) - i - 1] != s2[len(s2) - i - 1]:
            return i
    return n


def common_prefix_length_np(s1: np.ndarray, s2: np.ndarray) -> int:
    """Vectorized ``common_prefix_length`` (bit-identical; parity
    fuzz-tested)."""
    m = min(len(s1), len(s2))
    if m == 0:
        return 0
    ne = s1[:m] != s2[:m]
    i = int(np.argmax(ne))
    return m if not ne[i] else i


def common_suffix_length_np(s1: np.ndarray, s2: np.ndarray) -> int:
    """Vectorized ``common_suffix_length`` (bit-identical)."""
    m = min(len(s1), len(s2))
    if m == 0:
        return 0
    ne = s1[len(s1) - m:][::-1] != s2[len(s2) - m:][::-1]
    i = int(np.argmax(ne))
    return m if not ne[i] else i


def same_case(a_text: str, b_text: str) -> bool:
    """First-char lowercase equality flag, src/lib.rs:1367-1377."""
    if not a_text or not b_text:
        return True
    return a_text[0].islower() == b_text[0].islower()


def resolve_max_distance(
    norm_len: int,
    threshold: float | int | tuple[float, int],
    absolute_cap: int = MAX_EDIT_DISTANCE,
) -> int:
    """Threshold resolution, src/lib.rs:982-1012 / src/types.rs:76-108.

    - int x           -> Absolute(x): min(x, floor(len/2))
    - float r in 0..1 -> Ratio(r):    min(floor(len*r), absolute_cap)
    - (r, limit)      -> RatioWithLimit: min(floor(len*r), limit)
    """
    if isinstance(threshold, tuple):
        ratio, limit = threshold
        return min(int(math.floor(norm_len * ratio)), int(limit))
    if isinstance(threshold, float):
        return min(int(math.floor(norm_len * threshold)), absolute_cap)
    return min(int(threshold), int(math.floor(norm_len / 2.0)))


def distance_score(
    ld: int,
    lcs: int,
    prefixlen: int,
    suffixlen: int,
    samecase: bool,
    input_length: int,
    weights: Weights = Weights(),
) -> float:
    """The weighted similarity score, src/lib.rs:1430-1452.

    All components are normalized by the *input* length (the query side),
    so the score is asymmetric, and an exact match scores exactly 1.0.
    """
    if input_length <= 0:
        raise ValueError("input_length must be > 0 (src/lib.rs:1419 assert)")
    ds = 0.0 if ld > input_length else 1.0 - ld / input_length
    score = (
        weights.ld * ds
        + weights.lcs * (lcs / input_length)
        + weights.prefix * (prefixlen / input_length)
        + weights.suffix * (suffixlen / input_length)
        + (weights.case if samecase else 0.0)
    ) / weights.sum
    return score


def pair_distance_score(
    a_norm: Sequence[int],
    b_norm: Sequence[int],
    a_text: str,
    b_text: str,
    max_edit_distance: int,
    weights: Weights = Weights(),
) -> Optional[float]:
    """Full per-pair score: DL + components + formula (gather_instances,
    src/lib.rs:1311-1402 + score formula src/lib.rs:1430-1452), scored
    relative to the ``a`` (input/query) side. None above the DL cutoff."""
    if len(a_norm) == 0:
        return None
    ld = damerau_levenshtein(a_norm, b_norm, max_edit_distance)
    if ld is None:
        return None
    return distance_score(
        ld=ld,
        lcs=longest_common_substring_length(a_norm, b_norm) if weights.lcs > 0 else 0,
        prefixlen=common_prefix_length(a_norm, b_norm) if weights.prefix > 0 else 0,
        suffixlen=common_suffix_length(a_norm, b_norm) if weights.suffix > 0 else 0,
        samecase=same_case(a_text, b_text) if weights.case > 0 else True,
        input_length=len(a_norm),
        weights=weights,
    )


# Measured scalar-vs-numpy DL crossover (see bench note in the repo BASELINE.md):
# below ~50 codepoints the scalar DP wins; above, the row-vectorized kernel.
_DL_NP_MIN_LEN = 50


def pair_distance_score_np(
    a_norm: np.ndarray,
    b_norm: np.ndarray,
    a_text: str,
    b_text: str,
    max_edit_distance: int,
    weights: Weights = Weights(),
) -> Optional[float]:
    """``pair_distance_score`` on numpy NormStrings with the
    row-vectorized DL (``damerau_levenshtein_np``, bit-identical to the
    scalar DP — the hot-path form used by the caption verify actors).
    10-30x faster on caption-length inputs."""
    if len(a_norm) == 0:
        return None
    a = np.asarray(a_norm, dtype=np.int64)
    b = np.asarray(b_norm, dtype=np.int64)
    # Length dispatch: per-row numpy overhead beats the scalar DP only from
    # ~50 codepoints up (measured crossover); short captions take the scalar
    # path, long ones the vectorized one. Both are bit-identical (parity fuzz).
    if min(len(a), len(b)) < _DL_NP_MIN_LEN:
        ld = damerau_levenshtein(a.tolist(), b.tolist(), max_edit_distance)
    else:
        ld = damerau_levenshtein_np(a, b, max_edit_distance)
    if ld is None:
        return None
    return distance_score(
        ld=ld,
        lcs=longest_common_substring_length(a, b) if weights.lcs > 0 else 0,
        prefixlen=common_prefix_length_np(a, b) if weights.prefix > 0 else 0,
        suffixlen=common_suffix_length_np(a, b) if weights.suffix > 0 else 0,
        samecase=same_case(a_text, b_text) if weights.case > 0 else True,
        input_length=len(a),
        weights=weights,
    )


def blended_score(dist_score: float, freq_score: float, freq_weight: float) -> float:
    """src/types.rs:335-341."""
    if freq_weight == 0.0:
        return dist_score
    return (dist_score + freq_weight * freq_score) / (1.0 + freq_weight)


def rank_results(
    results: list[dict], freq_weight: float = 0.0
) -> list[dict]:
    """Stable sort by rank_cmp semantics (src/types.rs:343-365):
    with freq_weight: blended score desc; else dist desc, freq tie-break.
    ``results`` items need keys dist_score, freq_score."""
    if freq_weight > 0.0:
        return sorted(
            results,
            key=lambda r: -blended_score(r["dist_score"], r["freq_score"], freq_weight),
        )
    return sorted(results, key=lambda r: (-r["dist_score"], -r["freq_score"]))


def truncate_results(
    results: list[dict], max_matches: int, freq_weight: float = 0.0
) -> list[dict]:
    """Tie-aware max_matches truncation, src/lib.rs:1535-1589.

    If the item just past the cut scores equal to the last kept item, the
    cut would split a tie arbitrarily: crop *early* (before the tied run
    begins) or, failing that, *late* (after the run ends)."""
    if max_matches <= 0 or len(results) <= max_matches:
        return results
    last_score = blended_score(
        results[max_matches - 1]["dist_score"],
        results[max_matches - 1]["freq_score"],
        freq_weight,
    )
    cropped_score = blended_score(
        results[max_matches]["dist_score"],
        results[max_matches]["freq_score"],
        freq_weight,
    )
    if cropped_score < last_score:
        return results[:max_matches]
    # NB: the reference compares dist_score (not the blended score) against
    # cropped_score here (src/lib.rs:1560-1567) — identical when
    # freq_weight == 0; replicated as-is for parity.
    early_cutoff = 0
    late_cutoff = 0
    for i, r in enumerate(results):
        if r["dist_score"] == cropped_score and early_cutoff == 0:
            early_cutoff = i
        if r["dist_score"] < cropped_score:
            late_cutoff = i
            break
    if early_cutoff > 0:
        return results[: early_cutoff + 1]
    if late_cutoff > 0:
        return results[: late_cutoff + 1]
    return results


def apply_cutoff(
    results: list[dict], cutoff_threshold: float, freq_weight: float = 0.0
) -> list[dict]:
    """Relative cutoff vs best score, src/lib.rs:1597-1622.

    Active only when cutoff_threshold >= 1.0; drops everything from the
    first item scoring <= best/cutoff_threshold."""
    if cutoff_threshold < 1.0 or not results:
        return results
    best = blended_score(
        results[0]["dist_score"], results[0]["freq_score"], freq_weight
    )
    for i in range(1, len(results)):
        s = blended_score(
            results[i]["dist_score"], results[i]["freq_score"], freq_weight
        )
        if s <= best / cutoff_threshold:
            return results[:i]
    return results
