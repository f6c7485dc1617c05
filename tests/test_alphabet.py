"""Alphabet / anagram-value tests (tests/main.rs:12-68, 29-153)."""

import numpy as np

from analiticcl_ray.functions.alphabet import (
    PRIMES,
    Normalizer,
    parse_alphabet_tsv,
    shingle_keys_from_norm,
    simple_alphabet,
)


def test_primes_table():
    assert PRIMES[0] == 2 and PRIMES[1] == 3 and PRIMES[25] == 101


def test_anahash_anagram_equality():
    # tests/main.rs:37-55: anagram invariance; ab == ba == 2*3; abc == 2*3*5
    nm = Normalizer(simple_alphabet())
    assert nm.anahash("ab") == nm.anahash("ba") == 6
    assert nm.anahash("abc") == 30
    assert nm.anahash("") == 1  # empty == 1, src/anahash.rs:252-260


def test_anahash_case_insensitive():
    nm = Normalizer(simple_alphabet())
    assert nm.anahash("ABC") == nm.anahash("abc")


def test_normalize_unk():
    nm = Normalizer(simple_alphabet())
    out = nm.normalize("a!b")
    assert out.tolist() == [0, nm.unk_norm, 1]


def test_multichar_class_greedy():
    # multi-char member: "ae" folds with "æ"-style class
    alpha = [["a"], ["e"], ["ae", "x"]]
    nm = Normalizer(alpha)
    # "ae" matches class 0 first at 'a' (class order wins, src/anahash.rs:58-69)
    assert nm.normalize("ae").tolist() == [0, 1]
    # but "x" maps to class 2, and "ae" never wins over earlier classes
    assert nm.normalize("x").tolist() == [2]


def test_parse_alphabet_tsv_escapes():
    alpha = parse_alphabet_tsv("a\tA\n\\s\nb")
    assert alpha == [["a", "A"], [" "], ["b"]]


def test_shingle_keys_anagram_invariant_within_window():
    nm = Normalizer(simple_alphabet())
    k1 = nm.shingle_keys("abc", 3)
    k2 = nm.shingle_keys("cba", 3)
    assert k1.tolist() == k2.tolist() == [30]


def test_shingle_keys_sliding():
    nm = Normalizer(simple_alphabet())
    keys = nm.shingle_keys("abcd", 3)
    assert keys.tolist() == [2 * 3 * 5, 3 * 5 * 7]


def test_shingle_short_string():
    nm = Normalizer(simple_alphabet())
    assert nm.shingle_keys("ab", 3).tolist() == [6]
    assert len(nm.shingle_keys("", 3)) == 0
