"""Context-rule goldens replicating the reference's test0902-0905
(/root/reference/tests/main.rs:1574-1728): bonus steering, penalty
steering, per-word tagging, multi-tag — plus pattern parsing and the
TSV reader."""

import pytest

from analiticcl_ray.config import SearchConfig
from analiticcl_ray.functions.contextrules import (
    ContextRuleSet,
    PatternMatch,
)
from analiticcl_ray.pipelines.search import find_all_matches, match_output
from analiticcl_ray.pipelines.variants import Lexicon, VariantFinder

CFG = SearchConfig(
    max_anagram_distance=2, max_edit_distance=2, max_matches=10,
    score_threshold=0.0, cutoff_threshold=0.0,
)

WORDS = ["i", "think", "sink", "you", "are", "right"]


def _model():
    lex = Lexicon.from_rows(WORDS)
    vf = VariantFinder(lex, CFG)
    return lex, vf


def _rules(lex, *specs):
    rs = ContextRuleSet()
    for pattern, score, tags in specs:
        rs.add_contextrule(pattern, score, tags, [], [], lex._encoder)
    return rs


def test0902_context_rule_bonus():
    # "I; think" bonus 1.1 steers tink -> think (not sink) and tags the
    # two-word entity (tests/main.rs:1574-1620)
    lex, vf = _model()
    rules = _rules(lex, ("i; think", 1.1, ["testtag"]))
    ms = find_all_matches(
        "I tink you are rihgt", vf, CFG, max_ngram=1, context_rules=rules
    )
    assert [match_output(m, vf) for m in ms] == ["i", "think", "you", "are", "right"]
    assert ms[0].tag == [0] and ms[0].seqnr == [0]
    assert ms[1].tag == [0] and ms[1].seqnr == [1]
    assert ms[2].tag == [] and ms[3].tag == [] and ms[4].tag == []


def test0903_context_rule_penalty():
    # "i; think" penalty 0.9 steers tink -> sink (tests/main.rs:1622-1650)
    lex, vf = _model()
    rules = _rules(lex, ("i; think", 0.9, []))
    ms = find_all_matches(
        "I tink you are rihgt", vf, CFG, max_ngram=1, context_rules=rules
    )
    assert [match_output(m, vf) for m in ms] == ["i", "sink", "you", "are", "right"]


def test0904_context_rule_single_word_tags():
    # three neutral (1.0) single-word rules tag think/are/right only
    # (tests/main.rs:1652-1695)
    lex, vf = _model()
    rules = _rules(
        lex, ("think", 1.0, ["testtag"]), ("are", 1.0, ["testtag"]),
        ("right", 1.0, ["testtag"]),
    )
    ms = find_all_matches(
        "I tink you are rihgt", vf, CFG, max_ngram=1, context_rules=rules
    )
    assert [match_output(m, vf) for m in ms] == ["i", "think", "you", "are", "right"]
    assert ms[0].tag == []
    assert ms[1].tag == [0] and ms[1].seqnr == [0]
    assert ms[2].tag == []
    assert ms[3].tag == [0] and ms[3].seqnr == [0]
    assert ms[4].tag == [0] and ms[4].seqnr == [0]


def test0905_context_rule_multitag():
    # two tags on one rule: both positions carry both tags with their
    # own seqnr (tests/main.rs:1697-1728)
    lex, vf = _model()
    rules = _rules(lex, ("i; think", 1.1, ["testtag", "testtag2"]))
    ms = find_all_matches(
        "I tink you are rihgt", vf, CFG, max_ngram=1, context_rules=rules
    )
    assert [match_output(m, vf) for m in ms] == ["i", "think", "you", "are", "right"]
    assert ms[0].tag == [0, 1] and ms[0].seqnr == [0, 0]
    assert ms[1].tag == [0, 1] and ms[1].seqnr == [1, 1]


# ---------------------------------------------------------------------
# pattern parsing (src/search.rs:411-462)
# ---------------------------------------------------------------------

def test_pattern_parse_forms():
    enc = {"think": 1}
    names = ["lexicons/words.tsv"]
    assert PatternMatch.parse("?", names, enc).kind == "any"
    assert PatternMatch.parse("^", names, enc).kind == "nolexicon"
    pm = PatternMatch.parse("think", names, enc)
    assert pm.kind == "vocab" and pm.vocab_id == 1
    pm = PatternMatch.parse("@words.tsv", names, enc)
    assert pm.kind == "fromlexicon" and pm.lexicon == 0
    pm = PatternMatch.parse("!think", names, enc)
    assert pm.kind == "not" and pm.inner[0].kind == "vocab"
    pm = PatternMatch.parse("!(think|?)", names, enc)
    assert pm.kind == "not" and pm.inner[0].kind == "or"
    with pytest.raises(ValueError):
        PatternMatch.parse("unknownword", names, enc)
    with pytest.raises(ValueError):
        PatternMatch.parse("@nosuchlexicon", names, enc)


def test_pattern_match_semantics():
    enc = {"a": 1, "b": 2}
    seq = [(1, 1), (2, 2), (None, 0)]
    assert PatternMatch.parse("?", [], enc).matches(seq, 2)
    assert PatternMatch.parse("^", [], enc).matches(seq, 2)  # OOV
    assert not PatternMatch.parse("^", [], enc).matches(seq, 0)
    assert PatternMatch.parse("a", [], enc).matches(seq, 0)
    assert not PatternMatch.parse("a", [], enc).matches(seq, 1)
    assert PatternMatch.parse("a|b", [], enc).matches(seq, 1)
    assert PatternMatch.parse("!a", [], enc).matches(seq, 1)
    # lexicon bit test: lexindex bit 1 set on position 1
    pm = PatternMatch.parse("@lex2", ["lex1", "lex2"], enc)
    assert pm.matches(seq, 1)
    assert not pm.matches(seq, 0)


def test_read_lines_tsv():
    enc = {"i": 0, "think": 1}
    rs = ContextRuleSet()
    rs.read_lines(
        [
            "# comment",
            "",
            "i; think\t1.1\tperson",
            "think\t0.9",
        ],
        [],
        enc,
    )
    assert len(rs.rules) == 2
    assert rs.tags == ["person"]
    assert rs.rules[0].score == pytest.approx(1.1)
    assert rs.rules[0].tagoffset == [(0, 2)]
    with pytest.raises(ValueError):
        rs.read_lines(["badline"], [], enc)
    with pytest.raises(ValueError):
        rs.read_lines(["i\tnotafloat"], [], enc)
    with pytest.raises(ValueError):
        # 2 tags, 1 offset
        rs.read_lines(["i; think\t1.1\ta;b\t0:"], [], enc)


def test_first_match_wins_no_overlap():
    # a position covered by an earlier rule cannot be re-matched
    # (src/search.rs:489-494)
    enc = {"a": 1, "b": 2}
    rs = ContextRuleSet()
    rs.add_contextrule("a; b", 1.5, ["x"], [], [], enc)
    rs.add_contextrule("b", 0.5, ["y"], [], [], enc)
    seq = [(1, 1), (2, 1)]
    score, results = rs.test_context_rules(seq)
    # both positions covered by the first rule at 1.5 -> mean = 1.5
    assert score == pytest.approx(1.5)
    assert [r[0].tag for r in results] == [0, 0]


def test_sequence_score_mean():
    # score = mean over positions of first-match score or 1.0
    # (src/lib.rs:2556-2572)
    enc = {"a": 1, "b": 2}
    rs = ContextRuleSet()
    rs.add_contextrule("a", 1.2, [], [], [], enc)
    seq = [(1, 1), (2, 1), (None, 0)]
    score, _ = rs.test_context_rules(seq)
    assert score == pytest.approx((1.2 + 1.0 + 1.0) / 3)
