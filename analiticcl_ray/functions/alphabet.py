"""Alphabet handling: normalization and anagram values.

Reimplements (with citations into /root/reference):

- alphabet TSV parsing with ``\\s``/``\\t``/``\\n`` escapes
  -> src/lib.rs:369-407
- ``normalize_to_alphabet`` (greedy longest-defined-first matching in
  *file order*, UNK fallback = alphabet_size + 1) -> src/anahash.rs:50-80
- ``anahash`` (order-independent bag-of-characters value: product of the
  i-th prime per alphabet index, insert = multiply) -> src/anahash.rs:16-47,
  139-152; PRIMES table src/types.rs:20-30
- char-n-gram *shingle* anagram keys: same prime-product construction
  applied per n-gram window. For n = 3 over an alphabet of <= 168 classes
  the product of three primes is < 997**3 < 2**63, so shingle keys fit in
  uint64 and the whole computation vectorizes in numpy — this is the
  scale-friendly form of the anagram value used as the dedup shingle key
  (SURVEY.md §1.2).

The normalization fast path assumes every alphabet class member is a
single character (true for the reference test alphabet, src/test.rs:3-31,
and for simple.alphabet.tsv-style case folding): a 0x110000-entry numpy
lookup table maps codepoints -> class index in one ``np.take``. Classes
with multi-char members (e.g. ``ae`` <-> ``æ``) fall back to the greedy
per-string scan, memoized per unique string.
"""

from __future__ import annotations

import numpy as np

# First 168 primes, mirroring src/types.rs:20-30 (enough for any practical
# alphabet; index i -> prime for alphabet class i).
def _primes(n: int) -> list[int]:
    out: list[int] = []
    c = 2
    while len(out) < n:
        if all(c % p for p in out if p * p <= c):
            out.append(c)
        c += 1
    return out


PRIMES: np.ndarray = np.array(_primes(170), dtype=np.uint64)

Alphabet = list[list[str]]  # ordered equivalence classes, src/types.rs:37


def parse_alphabet_tsv(text: str) -> Alphabet:
    """Parse alphabet file content: one class per line, tab-separated
    members, with escape handling per src/lib.rs:380-391."""
    alphabet: Alphabet = []
    for line in text.splitlines():
        if not line.strip("\n"):
            continue
        members = []
        for field in line.split("\t"):
            field = (
                field.replace("\\s", " ").replace("\\t", "\t").replace("\\n", "\n")
            )
            if field:
                members.append(field)
        if members:
            alphabet.append(members)
    return alphabet


def read_alphabet(path: str) -> Alphabet:
    with open(path, "r", encoding="utf-8") as f:
        return parse_alphabet_tsv(f.read())


def simple_alphabet(extra_classes: tuple[tuple[str, ...], ...] = ((".", ","),)) -> Alphabet:
    """The 27-class test alphabet: a-z case-folded + `.`<->`,`
    (src/test.rs:3-31)."""
    alphabet: Alphabet = [[c, c.upper()] for c in "abcdefghijklmnopqrstuvwxyz"]
    for cls in extra_classes:
        alphabet.append(list(cls))
    return alphabet


class Normalizer:
    """Compiled alphabet: string -> NormString / anagram values.

    UNK maps to ``len(alphabet) + 1`` exactly as src/anahash.rs:74-77
    (note the reference skips index ``len(alphabet)`` for NormStrings but
    uses it for anahash UNK, src/anahash.rs:40-44 — we replicate both)."""

    def __init__(self, alphabet: Alphabet):
        self.alphabet = alphabet
        self.size = len(alphabet)
        self.unk_norm = self.size + 1  # src/anahash.rs:76
        self.unk_hash_index = self.size  # src/anahash.rs:41
        self._multi: list[tuple[str, int]] = []  # (member, class) for len>1 members
        # codepoint lookup table for single-char members; first definition
        # wins (greedy matching is in file order, src/anahash.rs:58-69:
        # earlier classes shadow later ones for the same member).
        self._lut = np.full(0x110000, self.unk_norm, dtype=np.uint16)
        claimed: set[str] = set()
        for idx, members in enumerate(alphabet):
            for m in members:
                if m in claimed:
                    continue
                claimed.add(m)
                if len(m) == 1:
                    self._lut[ord(m)] = idx
                else:
                    self._multi.append((m, idx))
        self._has_multi = bool(self._multi)
        self._memo: dict[str, np.ndarray] = {}

    # --- NormString -------------------------------------------------
    def normalize(self, s: str) -> np.ndarray:
        """str -> uint16 array of alphabet indices (src/anahash.rs:50-80)."""
        if not self._has_multi:
            cps = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
            return self._lut[cps]
        out = self._memo.get(s)
        if out is not None:
            return out
        out = self._normalize_greedy(s)
        if len(self._memo) < 1_000_000:
            self._memo[s] = out
        return out

    def _normalize_greedy(self, s: str) -> np.ndarray:
        result = []
        i = 0
        n = len(s)
        while i < n:
            matched = False
            # multi-char members must be checked in class order together
            # with single-char ones; the reference iterates classes in
            # order and members within class (src/anahash.rs:58-69). We
            # check: does any multi-char member start here AND belong to
            # an earlier class than the single-char match?
            single_cls = int(self._lut[ord(s[i])])
            best_cls = single_cls if single_cls != self.unk_norm else None
            best_len = 1
            for member, cls in self._multi:
                if s.startswith(member, i) and (best_cls is None or cls < best_cls):
                    best_cls = cls
                    best_len = len(member)
                    matched = True
            if best_cls is None:
                result.append(self.unk_norm)
                i += 1
            else:
                result.append(best_cls)
                i += best_len if matched else 1
        return np.array(result, dtype=np.uint16)

    def normalize_batch(self, strings) -> list[np.ndarray]:
        return [self.normalize(s) for s in strings]

    # --- anagram values ---------------------------------------------
    def anahash(self, s: str) -> int:
        """Full-string anagram value as an arbitrary-precision int
        (src/anahash.rs:16-47): product over chars of PRIMES[class];
        UNK contributes PRIMES[alphabet_size]; empty string -> 1."""
        norm = self.normalize(s)
        value = 1
        primes = PRIMES
        for c in norm:
            idx = self.unk_hash_index if c == self.unk_norm else int(c)
            value *= int(primes[idx])
        return value

    def shingle_keys(self, s: str, n: int = 3) -> np.ndarray:
        """Anagram-valued char n-gram shingle keys as uint64.

        key(w) = prod(PRIMES[class(c)] for c in w) — order-independent
        within the window (the n-gram analog of src/anahash.rs:16-47).
        Vectorized: prime lookup + sliding-window product."""
        norm = self.normalize(s)
        return shingle_keys_from_norm(norm, self.unk_hash_index, self.unk_norm, n)


# --- anagram-value algebra (src/anahash.rs:139-260) -------------------
# AnaValues are arbitrary-precision Python ints: insert = multiply,
# delete = divide when divisible, containment = divisibility, empty = 1.

def anahash_empty() -> int:
    return 1


def anahash_character(seqnr: int) -> int:
    """The prime assigned to alphabet class ``seqnr`` (src/anahash.rs:141-143)."""
    return int(PRIMES[seqnr])


def anahash_insert(value: int, char_value: int) -> int:
    """src/anahash.rs:146-152."""
    return value * char_value


def anahash_delete(value: int, char_value: int) -> int | None:
    """src/anahash.rs:156-162: None when the character isn't contained."""
    if char_value != 0 and value % char_value == 0:
        return value // char_value
    return None


def anahash_contains(value: int, other: int) -> bool:
    """Sub-bag test via divisibility (src/anahash.rs:165-171)."""
    if other == 0:
        return False
    return value % other == 0


def anahash_char_count(value: int, alphabet_size: int) -> int:
    """Total character count = total prime multiplicity
    (src/anahash.rs:228-249 iterates; equivalent factor-count here)."""
    count = 0
    v = value
    for i in range(alphabet_size + 1):
        p = int(PRIMES[i])
        while v % p == 0:
            v //= p
            count += 1
        if v == 1:
            break
    return count


def anahash_upper_bound(value: int, alphabet_size: int) -> tuple[int, int]:
    """(highest alphabet index present, char count) —
    src/anahash.rs alphabet_upper_bound."""
    count = 0
    highest = 0
    v = value
    for i in range(alphabet_size + 1):
        p = int(PRIMES[i])
        while v % p == 0:
            v //= p
            count += 1
            highest = i
        if v == 1:
            break
    return highest, count


def shingle_keys_from_norm(
    norm: np.ndarray, unk_hash_index: int, unk_norm: int, n: int = 3
) -> np.ndarray:
    if len(norm) < n:
        if len(norm) == 0:
            return np.empty(0, dtype=np.uint64)
        # short strings: single key over the whole string
        idx = np.where(norm == unk_norm, unk_hash_index, norm).astype(np.int64)
        return np.array([np.prod(PRIMES[idx])], dtype=np.uint64)
    idx = np.where(norm == unk_norm, unk_hash_index, norm).astype(np.int64)
    p = PRIMES[idx]
    w = np.lib.stride_tricks.sliding_window_view(p, n)
    return np.prod(w, axis=1, dtype=np.uint64)
