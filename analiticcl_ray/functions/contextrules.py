"""Context rules (S5/T11): pattern-based rescoring + entity tagging for
search mode.

Semantic port of the reference's context-rule machinery:

- pattern expression parsing — ``?`` (any), ``^`` (no lexicon), ``@name``
  (from a named lexicon), ``!expr`` / ``!(a|b)`` (negation), ``a|b``
  (disjunction), plain word (exact vocab match)
  (PatternMatch::parse, /root/reference/src/search.rs:411-462);
- rule-file parsing — TSV of pattern, score, tags(;), tagoffsets(;)
  with the reference's validation rules
  (read_contextrules, /root/reference/src/lib.rs:570-764);
- sequence matching — a rule matches a window of the output sequence iff
  every pattern element matches and no element is already covered by an
  earlier rule (first-match-wins per position), then writes per-position
  (score, tag, seqnr) results
  (ContextRule::matches, /root/reference/src/search.rs:470-523);
- sequence scoring — mean over positions of (first matched score or 1.0)
  (test_context_rules, /root/reference/src/lib.rs:2501-2576).

The rule set is tiny, immutable state: it rides into the search actor
pool via the broadcast model object (``ray.put`` once), never per batch.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

# sequence element: (vocab_id | None for OOV, lexindex bitmask)
SeqItem = tuple[Optional[int], int]


# ---------------------------------------------------------------------
# pattern expressions
# ---------------------------------------------------------------------

@dataclass(frozen=True)
class PatternMatch:
    """One element of a context-rule pattern (src/search.rs:338-352)."""

    kind: str  # "any" | "nolexicon" | "vocab" | "fromlexicon" | "not" | "or"
    vocab_id: int = -1
    lexicon: int = -1
    inner: tuple = ()

    def matches(self, sequence: Sequence[SeqItem], index: int) -> bool:
        """src/search.rs:372-409."""
        if self.kind == "any":
            return True
        if index >= len(sequence):
            return False
        vocab_id, lexindex = sequence[index]
        if self.kind == "nolexicon":
            return vocab_id is None or lexindex == 0
        if self.kind == "vocab":
            return vocab_id == self.vocab_id
        if self.kind == "fromlexicon":
            return (lexindex & (1 << self.lexicon)) != 0
        if self.kind == "not":
            return not self.inner[0].matches(sequence, index)
        if self.kind == "or":
            return any(pm.matches(sequence, index) for pm in self.inner)
        raise ValueError(self.kind)

    @classmethod
    def parse(
        cls, s: str, lexicon_names: Sequence[str], encoder: dict[str, int]
    ) -> "PatternMatch":
        """src/search.rs:411-462; raises ValueError on unknown word /
        lexicon (the reference's io::Error)."""
        s = s.strip()
        if s == "?":
            return cls("any")
        if s == "^":
            return cls("nolexicon")
        if s.startswith("!(") and s.endswith(")"):
            return cls("not", inner=(cls.parse(s[2:-1], lexicon_names, encoder),))
        if "|" in s:
            return cls(
                "or",
                inner=tuple(
                    cls.parse(item, lexicon_names, encoder) for item in s.split("|")
                ),
            )
        if s.startswith("!"):
            return cls("not", inner=(cls.parse(s[1:], lexicon_names, encoder),))
        if s.startswith("@"):
            source = s[1:]
            for i, name in enumerate(lexicon_names):
                if name == source or name.endswith("/" + source):
                    return cls("fromlexicon", lexicon=i)
            raise ValueError(
                f"context rule references lexicon '{source}' but this source was not loaded"
            )
        if s in encoder:
            return cls("vocab", vocab_id=encoder[s])
        raise ValueError(
            f"context rule references word '{s}' but it does not occur in any lexicon"
        )


@dataclass(frozen=True)
class PatternMatchResult:
    """src/search.rs:365-369."""

    score: float
    tag: Optional[int]
    seqnr: int


@dataclass
class ContextRule:
    """src/search.rs:353-363."""

    pattern: list[PatternMatch]
    score: float  # > 1.0 bonus, < 1.0 penalty
    tag: list[int] = field(default_factory=list)  # indices into the tag table
    tagoffset: list[tuple[int, int]] = field(default_factory=list)  # (begin, length)

    def __len__(self) -> int:
        return len(self.pattern)

    def matches(
        self,
        sequence: Sequence[SeqItem],
        begin: int,
        sequence_result: list[list[PatternMatchResult]],
    ) -> bool:
        """src/search.rs:470-523: first-match-wins per position; on
        success writes per-position results covering the window."""
        assert len(sequence) == len(sequence_result)
        if begin + len(self.pattern) > len(sequence):
            return False
        for cursor, pm in enumerate(self.pattern):
            if sequence_result[begin + cursor] or not pm.matches(sequence, begin + cursor):
                return False
        for cursor in range(len(self.pattern)):
            if not self.tag:
                sequence_result[begin + cursor] = [
                    PatternMatchResult(self.score, None, cursor)
                ]
            else:
                sequence_result[begin + cursor] = [
                    PatternMatchResult(self.score, t, cursor - tb)
                    for t, (tb, tl) in zip(self.tag, self.tagoffset)
                    if tb <= cursor < tb + tl
                ]
        return True


# ---------------------------------------------------------------------
# rule set
# ---------------------------------------------------------------------

@dataclass
class ContextRuleSet:
    """Parsed rules + the tag name table (VariantModel.context_rules /
    .tags analog)."""

    rules: list[ContextRule] = field(default_factory=list)
    tags: list[str] = field(default_factory=list)

    def _tag_index(self, tag: str) -> int:
        if tag in self.tags:
            return self.tags.index(tag)
        self.tags.append(tag)
        return len(self.tags) - 1

    def add_contextrule(
        self,
        pattern: str,
        score: float,
        tag: Sequence[str] = (),
        tagoffset: Sequence[str] = (),
        lexicon_names: Sequence[str] = (),
        encoder: Optional[dict[str, int]] = None,
    ) -> None:
        """src/lib.rs:656-764 — ';'-separated pattern expressions; tag
        offsets "begin:length" with the reference's defaulting."""
        encoder = encoder or {}
        pms = [
            PatternMatch.parse(expr, lexicon_names, encoder)
            for expr in pattern.split(";")
        ]
        tag_ids = []
        for t in tag:
            if not t:
                raise ValueError("tag is empty")
            tag_ids.append(self._tag_index(t))
        offsets: list[tuple[int, int]] = []
        for s in tagoffset:
            fields_ = s.split(":")
            tb = int(fields_[0]) if fields_ and fields_[0] != "" else 0
            if len(fields_) > 1 and fields_[1] != "":
                tl = int(fields_[1])
            else:
                tl = len(pms) - tb
            offsets.append((tb, tl))
        while len(offsets) < len(tag_ids):
            offsets.append((0, len(pms)))
        if pms:
            self.rules.append(ContextRule(pms, score, tag_ids, offsets))

    def read_lines(
        self,
        lines: Sequence[str],
        lexicon_names: Sequence[str] = (),
        encoder: Optional[dict[str, int]] = None,
    ) -> None:
        """TSV parsing per src/lib.rs:570-654: pattern \\t score
        [\\t tags(;) [\\t tagoffsets(;)]]; '#' comments skipped."""
        for linenr, line in enumerate(lines, 1):
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            fields_ = line.split("\t")
            if len(fields_) < 2:
                raise ValueError(
                    f"expected at least two columns in context rules, line {linenr}"
                )
            pattern = fields_[0]
            if not pattern:
                continue
            try:
                score = float(fields_[1])
            except ValueError:
                raise ValueError(
                    f"context rule score should be a float, got {fields_[1]} (line {linenr})"
                )
            tag = [
                w.strip()
                for w in (fields_[2].split(";") if len(fields_) > 2 else [])
                if w.strip()
            ]
            tagoffset = [
                w.strip()
                for w in (fields_[3].split(";") if len(fields_) > 3 else [])
                if w.strip()
            ]
            if len(tag) == 1 and len(tagoffset) == 0:
                tagoffset = ["0:"]
            elif len(tag) != len(tagoffset):
                raise ValueError(
                    f"expected the same number of tag offsets as tags (line {linenr})"
                )
            self.add_contextrule(
                pattern, score, tag, tagoffset, lexicon_names, encoder
            )

    def test_context_rules(
        self, sequence: Sequence[SeqItem]
    ) -> tuple[float, list[list[PatternMatchResult]]]:
        """(context_score, per-position results);
        src/lib.rs:2501-2576: score = mean over positions of the first
        matched score (1.0 where uncovered); 1.0 when nothing matched."""
        results: list[list[PatternMatchResult]] = [[] for _ in sequence]
        found = False
        for begin in range(len(sequence)):
            for rule in self.rules:
                if rule.matches(sequence, begin, results):
                    found = True
        if not found:
            return 1.0, results
        total = sum(x[0].score if x else 1.0 for x in results)
        return total / len(sequence), results
