"""Confusable edit-script patterns (operator S4/T10).

Reimplements, from observed behavior (not copied code):
- sesdiff-style shortest edit scripts between two strings: an LCS-based
  diff merged into runs of Identity / Deletion / Insertion instructions
  (deletion emitted before insertion within a changed block) — the form
  ``Confusable::found_in`` consumes (src/confusables.rs:47-128).
- the confusable pattern syntax ``-[y]+[i]``, ``=[ab]``, options
  ``+[a|b]``, and ``^``/``$`` anchors (src/confusables.rs:14-44).
- ``compute_confusable_weight``: multiply the weights of every
  confusable whose pattern occurs in the edit script between input and
  candidate (src/lib.rs:1733-1756); 1.0 when none match.

Golden behavior: tests/main.rs:913-1020 — ``-[y]+[i]`` weight 1.1 must
match huys->huis but not huys->huls, flipping an otherwise tied ranking.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Literal

Op = Literal["=", "-", "+"]


def shortest_edit_script(a: str, b: str) -> list[tuple[Op, str]]:
    """LCS diff of a -> b as merged instruction runs.

    Returns [(op, run)] with op in {"=", "-", "+"}; within one changed
    block the deletion run precedes the insertion run."""
    la, lb = len(a), len(b)
    # LCS DP
    dp = [[0] * (lb + 1) for _ in range(la + 1)]
    for i in range(la - 1, -1, -1):
        dpi, dpi1 = dp[i], dp[i + 1]
        ai = a[i]
        for j in range(lb - 1, -1, -1):
            if ai == b[j]:
                dpi[j] = dpi1[j + 1] + 1
            else:
                dpi[j] = dpi1[j] if dpi1[j] >= dpi[j + 1] else dpi[j + 1]
    out: list[tuple[Op, str]] = []
    i = j = 0
    pend_del: list[str] = []
    pend_ins: list[str] = []

    def flush():
        if pend_del:
            out.append(("-", "".join(pend_del)))
            pend_del.clear()
        if pend_ins:
            out.append(("+", "".join(pend_ins)))
            pend_ins.clear()

    while i < la and j < lb:
        if a[i] == b[j]:
            flush()
            if out and out[-1][0] == "=":
                out[-1] = ("=", out[-1][1] + a[i])
            else:
                out.append(("=", a[i]))
            i += 1
            j += 1
        elif dp[i + 1][j] >= dp[i][j + 1]:
            pend_del.append(a[i])
            i += 1
        else:
            pend_ins.append(b[j])
            j += 1
    pend_del.extend(a[i:])
    pend_ins.extend(b[j:])
    flush()
    return out


_PAT_TOKEN = re.compile(r"([=+-])\[([^\]]*)\]")


@dataclass
class Confusable:
    """One weighted edit pattern."""

    instructions: list[tuple[Op, list[str]]]  # op, option list (len 1 = plain)
    weight: float
    strictbegin: bool
    strictend: bool

    @classmethod
    def parse(cls, pattern: str, weight: float) -> "Confusable":
        strictbegin = pattern.startswith("^")
        strictend = pattern.endswith("$")
        core = pattern[1 if strictbegin else 0 : len(pattern) - (1 if strictend else 0)]
        instructions = []
        pos = 0
        for m in _PAT_TOKEN.finditer(core):
            if m.start() != pos:
                raise ValueError(f"bad confusable pattern {pattern!r}")
            op = m.group(1)
            instructions.append((op, m.group(2).split("|")))
            pos = m.end()
        if pos != len(core) or not instructions:
            raise ValueError(f"bad confusable pattern {pattern!r}")
        return cls(instructions, weight, strictbegin, strictend)

    def found_in(self, refscript: list[tuple[Op, str]]) -> bool:
        """Faithful port of Confusable::found_in (src/confusables.rs:47-128):
        sequential match over the reference script; deletion/insertion
        match by run suffix; identity runs match by suffix at the pattern
        start, prefix at the end, equality in the middle."""
        l = len(self.instructions)
        matches = 0
        for i, (rop, rrun) in enumerate(refscript):
            pop, options = self.instructions[matches]
            found = False
            if pop == rop:
                for s in options:
                    if pop in ("-", "+"):
                        if rrun.endswith(s):
                            found = True
                            break
                    else:  # identity
                        if matches == 0 and matches == l - 1:
                            ok = s == rrun
                        elif matches == 0:
                            ok = rrun.endswith(s)
                        elif matches == l - 1:
                            ok = rrun.startswith(s)
                        else:
                            ok = s == rrun
                        if ok:
                            found = True
                            break
            if not found:
                matches = 0
                if self.strictbegin:
                    return False
                continue
            matches += 1
            if matches == l:
                if self.strictend:
                    return i == len(refscript) - 1
                return True
        return False


def compute_confusable_weight(
    input_text: str, candidate_text: str, confusables: list[Confusable]
) -> float:
    """src/lib.rs:1733-1756."""
    if not confusables:
        return 1.0
    script = shortest_edit_script(input_text, candidate_text)
    weight = 1.0
    for c in confusables:
        if c.found_in(script):
            weight *= c.weight
    return weight


def read_confusables_tsv(text: str) -> list[Confusable]:
    """Pattern TAB weight per line (src/lib.rs:414-441)."""
    out = []
    for line in text.splitlines():
        if not line.strip() or line.startswith("#"):
            continue
        fields = line.split("\t")
        out.append(Confusable.parse(fields[0], float(fields[1])))
    return out
