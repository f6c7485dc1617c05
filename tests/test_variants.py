"""Query-mode parity goldens (tests/main.rs:809-1020, 1483-1510) —
find_variants semantics against the reference's own test expectations."""

import pytest

from analiticcl_ray.config import SearchConfig
from analiticcl_ray.functions.confusables import (
    Confusable,
    compute_confusable_weight,
    shortest_edit_script,
)
from analiticcl_ray.pipelines.variants import INDEXED, TRANSPARENT, Lexicon, VariantFinder

# get_test_searchparams, src/test.rs:50-68
TEST_CFG = SearchConfig(
    max_anagram_distance=2,
    max_edit_distance=2,
    max_matches=10,
    score_threshold=0.0,
    cutoff_threshold=0.0,
)


def _finder(words, cfg=TEST_CFG, **kw):
    lex = Lexicon.from_rows(list(words))
    return VariantFinder(lex, cfg, **kw)


def test0402_anagram_bucket():
    # tests/main.rs:836-855: anagram instances of "rites"
    vf = _finder(["rites", "tiers", "tires", "tries", "tyres", "rides", "brides", "dire"])
    import numpy as np

    nm = vf.norm.normalize("rites")
    qbag = np.zeros(vf.bags.shape[1], dtype=np.int32)
    np.add.at(qbag, np.minimum(nm, qbag.shape[0] - 1), 1)
    bucket = [vf.lex.texts[i] for i in range(len(vf.lex.texts))
              if (vf.bags[i] == qbag).all()]
    assert bucket == ["rites", "tiers", "tires", "tries"]


def test0403_find_variants_runs():
    vf = _finder(["rites", "tiers", "tires", "tries", "tyres", "rides", "brides", "dire"])
    vf.find_variants("rite")  # must not raise


def test0404_tied_scores_deterministic_order():
    # tests/main.rs:871-911: huys -> huis, huls tied but deterministic
    vf = _finder(["huis", "huls"])
    results = vf.find_variants("huys")
    assert len(results) == 2
    assert vf.lex.texts[results[0]["vocab_id"]] == "huis"
    assert vf.lex.texts[results[1]["vocab_id"]] == "huls"
    assert results[0]["dist_score"] == results[1]["dist_score"]
    assert results[0]["freq_score"] == results[1]["freq_score"]


def test0501_confusable_found_in():
    # tests/main.rs:913-934
    c = Confusable.parse("-[y]+[i]", 1.1)
    assert c.found_in(shortest_edit_script("huys", "huis"))
    assert not c.found_in(shortest_edit_script("huys", "huls"))


def test0502_confusable_flips_ranking():
    vf = _finder(["huis", "huls"], confusables=[Confusable.parse("-[y]+[i]", 1.1)])
    results = vf.find_variants("huys")
    assert vf.lex.texts[results[0]["vocab_id"]] == "huis"
    assert vf.lex.texts[results[1]["vocab_id"]] == "huls"
    assert results[0]["dist_score"] > results[1]["dist_score"]


def test0503_confusable_case_input():
    vf = _finder(["huis", "huls"], confusables=[Confusable.parse("-[y]+[i]", 1.1)])
    results = vf.find_variants("Huys")
    assert vf.lex.texts[results[0]["vocab_id"]] == "huis"
    assert results[0]["dist_score"] > results[1]["dist_score"]


def test0504_confusable_nomatch_keeps_tie():
    vf = _finder(["huis", "huls"], confusables=[Confusable.parse("-[y]+[p]", 1.1)])
    results = vf.find_variants("Huys")
    assert len(results) == 2
    assert results[0]["dist_score"] == results[1]["dist_score"]


def test0801_expand_variants_transparent():
    # tests/main.rs:1483-1510: reachable only via the transparent variant
    lex = Lexicon()
    ref_id = lex.add("afgescheid")
    var_id = lex.add("afghescheydt", None, INDEXED | TRANSPARENT)
    lex.add_variant(var_id, ref_id, 1.0)
    vf = VariantFinder(lex, TEST_CFG)
    results = vf.find_variants("afgheschaydt")
    assert len(results) == 1
    assert vf.lex.texts[results[0]["vocab_id"]] == "afgescheid"
    assert results[0]["via"] == var_id


def test_multi_lexicon_provenance():
    # lexindex bitmask semantics (src/vocab.rs:77-89; tests/main.rs:1512-1572)
    lex = Lexicon()
    for w in ["salamander", "frog", "toad"]:
        lex.add(w, None, INDEXED, lexindex=0)
    for w in ["lizard", "snake"]:
        lex.add(w, None, INDEXED, lexindex=1)
    vf = VariantFinder(lex, TEST_CFG)
    r = vf.find_variants("Salamander")
    assert vf.lex.texts[r[0]["vocab_id"]] == "salamander"
    assert vf.lex.lexindex[r[0]["vocab_id"]] & (1 << 0)
    r = vf.find_variants("lizzard")
    assert vf.lex.texts[r[0]["vocab_id"]] == "lizard"
    assert vf.lex.lexindex[r[0]["vocab_id"]] & (1 << 1)


def test_freq_tiebreak_ranking():
    lex = Lexicon()
    lex.add("word", freq=5)
    lex.add("word".replace("d", "t"), freq=50)  # "wort"
    vf = VariantFinder(lex, TEST_CFG)
    r = vf.find_variants("worp")
    # both DL=1 from "worp"; equal dist scores? word vs worp: sub d/p;
    # wort vs worp: sub t/p -> tied dist, freq breaks the tie
    assert vf.lex.texts[r[0]["vocab_id"]] == "wort"


def test_score_threshold_prunes():
    vf = _finder(["abcdefgh"], SearchConfig(
        max_anagram_distance=8, max_edit_distance=8, max_matches=10,
        score_threshold=0.9, cutoff_threshold=0.0))
    assert vf.find_variants("abcdxxxx") == []


def test_exact_match_first_and_scores_one():
    vf = _finder(["separate", "separates"])
    r = vf.find_variants("separate")
    assert vf.lex.texts[r[0]["vocab_id"]] == "separate"
    assert r[0]["dist_score"] == 1.0


def test_stop_at_exact_match():
    cfg = SearchConfig(
        max_anagram_distance=2, max_edit_distance=2, max_matches=10,
        score_threshold=0.0, cutoff_threshold=0.0, stop_at_exact_match=True)
    vf = _finder(["huis", "huls", "sihu"], cfg)  # sihu = anagram of huis
    r = vf.find_variants("huis")
    texts = {vf.lex.texts[x["vocab_id"]] for x in r}
    # only the exact anagram bucket is searched ("huls" is within anagram
    # distance 2 but outside the exact bucket; "sihu" is in the bucket but
    # pruned by the DL<=2 gather — exactly the reference's behavior)
    assert texts == {"huis"}
    vf2 = _finder(["huis", "huls", "sihu"], TEST_CFG)  # exhaustive
    texts2 = {vf2.lex.texts[x["vocab_id"]] for x in vf2.find_variants("huis")}
    assert "huls" in texts2


def test_read_variants_tsv_weighted():
    lex = Lexicon()
    lex.read_variants_tsv("separate\tseperate\t1.0\tseperete\t1.0", transparent=True)
    assert lex.texts[0] == "separate"
    assert lex.vocab_types[1] & TRANSPARENT
    assert lex.variants[1] == [(0, 1.0)]
    assert lex.variants[2] == [(0, 1.0)]


def test_read_variants_tsv_with_freq():
    lex = Lexicon()
    lex.read_variants_tsv("separate\t10\tseperate\t1.0\t3", transparent=False)
    assert lex.freqs[0] == 10
    assert lex.freqs[1] == 3
    assert lex.variants[1] == [(0, 1.0)]


def test_confusable_anchors():
    c = Confusable.parse("^-[y]+[i]", 1.1)
    # script huys->huis starts with identity "hu" -> strict begin fails
    assert not c.found_in(shortest_edit_script("huys", "huis"))
    assert c.found_in(shortest_edit_script("ya", "ia"))
    c2 = Confusable.parse("-[y]+[i]$", 1.1)
    assert not c2.found_in(shortest_edit_script("huys", "huis"))  # ends =[s]
    assert c2.found_in(shortest_edit_script("huy", "hui"))


def test_compute_confusable_weight_multiplies():
    cs = [Confusable.parse("-[y]+[i]", 1.1), Confusable.parse("=[s]", 2.0)]
    w = compute_confusable_weight("huys", "huis", cs)
    assert w == pytest.approx(1.1 * 2.0)
    assert compute_confusable_weight("abc", "abc", []) == 1.0
