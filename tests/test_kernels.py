"""Kernel parity tests — golden values from the reference test suite
(/root/reference/tests/main.rs, README.md) per FIXTURES.md §5."""

import numpy as np
import pytest

from analiticcl_ray.functions.alphabet import Normalizer, simple_alphabet
from analiticcl_ray.functions.kernels import (
    Weights,
    apply_cutoff,
    blended_score,
    common_prefix_length,
    common_suffix_length,
    damerau_levenshtein,
    damerau_levenshtein_np,
    distance_score,
    levenshtein,
    longest_common_substring_length,
    pair_distance_score,
    rank_results,
    resolve_max_distance,
    truncate_results,
)

NORM = Normalizer(simple_alphabet())


def n(s):
    return NORM.normalize(s).tolist()


# tests/main.rs:612-619, 677-685, 697-708
@pytest.mark.parametrize(
    "a,b,expect",
    [("ab", "ba", 2), ("abc", "abc", 0), ("", "abc", 3)],
)
def test_levenshtein(a, b, expect):
    assert levenshtein(n(a), n(b), 99) == expect


@pytest.mark.parametrize(
    "a,b,expect",
    [
        ("ab", "ba", 1),                    # transposition, tests/main.rs:677-685
        ("hipotesis", "hypothesis", 2),     # tests/main.rs:697-708
        ("huys", "huis", 1),
        ("abc", "abc", 0),
    ],
)
def test_damerau_levenshtein(a, b, expect):
    assert damerau_levenshtein(n(a), n(b), 99) == expect


def test_dl_max_distance_none():
    # early-None above cutoff, src/distance.rs:174-178
    assert damerau_levenshtein(n("abcdef"), n("uvwxyz"), 3) is None
    assert damerau_levenshtein(n("ab"), n("abcdefgh"), 3) is None  # len prefilter


# tests/main.rs:710-741
def test_lcs():
    assert longest_common_substring_length(n("test"), n("testable")) == 4
    assert longest_common_substring_length(n("abcdefhij"), n("def")) == 3


# tests/main.rs:743-807
def test_prefix_suffix():
    assert common_prefix_length(n("test"), n("testable")) == 4
    assert common_prefix_length(n("fasttest"), n("test")) == 0
    assert common_suffix_length(n("fasttest"), n("test")) == 4
    assert common_suffix_length(n("test"), n("testable")) == 0


def test_score_seperate_separate():
    # README.md:121-124: query "seperate" -> "separate" scores 0.734375
    assert pair_distance_score(
        n("seperate"), n("separate"), "seperate", "separate", 3
    ) == pytest.approx(0.734375)


def test_exact_match_scores_one():
    assert pair_distance_score(n("word"), n("word"), "word", "word", 2) == 1.0


def test_case_component():
    # first-char case flip loses only the case weight (src/lib.rs:1367-1377)
    s = pair_distance_score(n("word"), n("Word"), "word", "Word", 2)
    assert s == pytest.approx(1.0 - 0.125)


def test_resolve_max_distance():
    # Absolute capped at len/2 (src/lib.rs:1000-1011)
    assert resolve_max_distance(4, 3) == 2
    assert resolve_max_distance(20, 3) == 3
    # Ratio capped at 12 (src/lib.rs:42-46)
    assert resolve_max_distance(100, 0.2) == 12
    assert resolve_max_distance(20, 0.2) == 4
    # RatioWithLimit
    assert resolve_max_distance(100, (0.2, 7)) == 7


def test_dl_np_parity_fuzz():
    rng = np.random.default_rng(3)
    for _ in range(1500):
        la, lb = rng.integers(0, 14, 2)
        a = rng.integers(0, 5, la).tolist()
        b = rng.integers(0, 5, lb).tolist()
        md = int(rng.integers(0, 16))
        assert damerau_levenshtein(a, b, md) == damerau_levenshtein_np(a, b, md)


def _results(scores):
    return [
        {"vocab_id": i, "dist_score": s, "freq_score": f}
        for i, (s, f) in enumerate(scores)
    ]


def test_rank_dist_desc_freq_tiebreak():
    # src/types.rs:343-365
    r = rank_results(_results([(0.5, 1.0), (0.9, 0.2), (0.9, 0.8)]))
    assert [x["vocab_id"] for x in r] == [2, 1, 0]


def test_truncate_tie_aware_early():
    # ties spanning the cut are cropped early (src/lib.rs:1553-1580)
    r = _results([(0.9, 0), (0.8, 0), (0.8, 0), (0.8, 0)])
    out = truncate_results(r, 2)
    assert len(out) == 2  # early cutoff at first tied item index 1 -> +1
    r2 = _results([(0.8, 0), (0.8, 0), (0.8, 0), (0.7, 0)])
    # tie starting at index 0: the reference's `early_cutoff == 0` guard
    # treats index 0 as "unset", so early_cutoff lands on 1 and the list
    # truncates to 2 (src/lib.rs:1560-1580) — replicated quirk.
    out2 = truncate_results(r2, 2)
    assert len(out2) == 2
    r3 = _results([(0.9, 0), (0.8, 0), (0.7, 0), (0.7, 0), (0.6, 0)])
    # cropped item (idx 3, 0.7) ties with idx 2 only: early_cutoff=2 ->
    # truncate(3)
    assert len(truncate_results(r3, 3)) == 3


def test_truncate_simple():
    r = _results([(0.9, 0), (0.8, 0), (0.7, 0)])
    assert len(truncate_results(r, 2)) == 2


def test_cutoff_threshold():
    # src/lib.rs:1597-1622: drop items scoring <= best/cutoff
    r = _results([(0.9, 0), (0.5, 0), (0.4, 0)])
    out = apply_cutoff(r, 2.0)
    assert [x["vocab_id"] for x in out] == [0, 1]
    assert apply_cutoff(r, 0.0) == r  # disabled below 1.0


def test_blended_score():
    assert blended_score(0.8, 0.5, 0.0) == 0.8
    assert blended_score(0.8, 0.5, 1.0) == pytest.approx(0.65)


def test_distance_score_ld_overflow():
    # ld > input_length clamps distance component to 0 (src/lib.rs:1433-1436)
    s = distance_score(5, 0, 0, 0, True, 3, Weights())
    assert s == pytest.approx((0.125) / 1.0)


def test_pair_distance_score_np_parity_fuzz():
    """pair_distance_score_np (the verify-actor hot path) is
    bit-identical to the scalar pair_distance_score across random
    normstring pairs, incl. prefix/suffix/lcs components."""
    import numpy as np

    from analiticcl_ray.functions.kernels import (
        Weights,
        common_prefix_length,
        common_prefix_length_np,
        common_suffix_length,
        common_suffix_length_np,
        pair_distance_score,
        pair_distance_score_np,
    )

    rng = np.random.default_rng(5)
    for _ in range(300):
        la, lb = int(rng.integers(0, 30)), int(rng.integers(1, 30))
        a = rng.integers(0, 6, la).astype(np.uint16)
        b = rng.integers(0, 6, lb).astype(np.uint16)
        assert common_prefix_length_np(a, b) == common_prefix_length(
            a.tolist(), b.tolist()
        )
        assert common_suffix_length_np(a, b) == common_suffix_length(
            a.tolist(), b.tolist()
        )
        for maxd in (1, 2, 5):
            s_np = pair_distance_score_np(a, b, "x", "y", maxd, Weights())
            s_py = (
                pair_distance_score(a.tolist(), b.tolist(), "x", "y", maxd, Weights())
                if la
                else None
            )
            assert s_np == s_py, (a, b, maxd)
