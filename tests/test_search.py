"""Search-mode parity tests (tests/main.rs:1119-1481 style goldens) and
anahash algebra goldens (tests/main.rs:29-153)."""

import pytest

from analiticcl_ray.config import SearchConfig
from analiticcl_ray.functions.alphabet import (
    Normalizer,
    anahash_character,
    anahash_contains,
    anahash_delete,
    anahash_empty,
    anahash_insert,
    anahash_upper_bound,
    simple_alphabet,
)
from analiticcl_ray.pipelines.search import (
    BigramLM,
    classify_boundaries,
    find_all_matches,
    find_boundaries,
    find_match_ngrams,
    match_output,
)
from analiticcl_ray.pipelines.variants import Lexicon, VariantFinder

CFG = SearchConfig(
    max_anagram_distance=2, max_edit_distance=2, max_matches=10,
    score_threshold=0.0, cutoff_threshold=0.0,
)


def test_anahash_algebra():
    # tests/main.rs:29-153: insert = multiply, delete = divide-if-divisible,
    # contains = divisibility, empty = 1
    a = anahash_character(0)  # 'a' -> 2
    b = anahash_character(1)  # 'b' -> 3
    v = anahash_insert(anahash_empty(), a)
    v = anahash_insert(v, b)
    assert v == 6
    assert anahash_contains(v, a)
    assert anahash_delete(v, a) == 3
    assert anahash_delete(3, a) is None
    assert anahash_upper_bound(6, 27) == (1, 2)
    # multiplicity: "aab" = 2*2*3
    vv = anahash_insert(v, a)
    assert vv == 12
    assert anahash_delete(anahash_delete(vv, a), a) == 3


def test_find_boundaries():
    bs = find_boundaries("to be or")
    assert [(b.text, b.begin, b.end) for b in bs] == [
        (" ", 2, 3), (" ", 5, 6), ("", 8, 8),
    ]
    bs2 = find_boundaries("hello")
    assert [(b.text, b.begin, b.end) for b in bs2] == [("", 5, 5)]


def test_classify_boundaries():
    bs = find_boundaries("a-b, c")
    st = classify_boundaries(bs)
    # "-" weak, ", " multichar hard, final dummy hard
    assert st == ["weak", "hard", "hard"]


def test_find_match_ngrams_orders():
    text = "a b c"
    bs = find_boundaries(text)
    uni = find_match_ngrams(text, bs, 1, 0, None)
    assert [m.text for m in uni] == ["a", "b", "c"]
    bi = find_match_ngrams(text, bs, 2, 0, None)
    assert [m.text for m in bi] == ["a b", "b c"]


def test_find_all_matches_multi_lexicon_golden():
    # tests/main.rs:1512-1572 semantics at max_ngram=1
    lex = Lexicon.from_rows("salamander frog toad".split())
    for w in "lizard snake".split():
        lex.add(w, None, lexindex=1)
    vf = VariantFinder(lex, CFG)
    ms = find_all_matches("Salamander lizard frog snake toad", vf, CFG, max_ngram=1)
    assert [m.text for m in ms] == ["Salamander", "lizard", "frog", "snake", "toad"]
    assert [match_output(m, vf) for m in ms] == [
        "salamander", "lizard", "frog", "snake", "toad",
    ]
    # provenance bits (in_lexicon, src/vocab.rs:77-89)
    assert vf.lex.lexindex[ms[0].variants[0]["vocab_id"]] & 1
    assert vf.lex.lexindex[ms[1].variants[0]["vocab_id"]] & 2


def test_find_all_matches_correction_golden():
    # "I tink you are rihgt" -> "i think you are right"
    # (tests/main.rs:1119+ flavor; deletion + transposition variants)
    lex = Lexicon.from_rows(["i", "think", "you", "are", "right", "tank", "rift"])
    vf = VariantFinder(lex, CFG)
    ms = find_all_matches("I tink you are rihgt", vf, CFG, max_ngram=1)
    assert [match_output(m, vf) for m in ms] == ["i", "think", "you", "are", "right"]


def test_find_all_matches_with_lm_consolidation():
    lex = Lexicon.from_rows(["i", "think", "you", "are", "right", "tank", "rift"])
    vf = VariantFinder(lex, CFG)
    lm = BigramLM()
    lm.train_tokens([["i", "think", "you", "are", "right"]] * 3)
    ms = find_all_matches("I tink you are rihgt", vf, CFG, max_ngram=2, lm=lm)
    assert [match_output(m, vf) for m in ms] == ["i", "think", "you", "are", "right"]


def test_oov_words_copied():
    lex = Lexicon.from_rows(["known"])
    vf = VariantFinder(lex, CFG)
    ms = find_all_matches("known zzzzqqqq", vf, CFG, max_ngram=1)
    outs = [match_output(m, vf) for m in ms]
    assert outs[0] == "known"
    assert outs[1] == "zzzzqqqq"  # OOV copied from input


def test_byte_offsets_non_ascii():
    """M7: with unicode_offsets=False spans are UTF-8 byte offsets —
    the reference's default output unit (src/lib.rs:1949-1955,
    src/search.rs:527-546). 'café' is 5 bytes / 4 codepoints."""
    lex = Lexicon.from_rows(["café", "bar"])
    vf = VariantFinder(lex, CFG)
    text = "café bar"
    cp = find_all_matches(text, vf, CFG, max_ngram=1)
    assert [(m.begin, m.end) for m in cp] == [(0, 4), (5, 8)]
    by = find_all_matches(text, vf, CFG, max_ngram=1, unicode_offsets=False)
    assert [(m.begin, m.end) for m in by] == [(0, 5), (6, 9)]
    # byte slices of the encoded text reproduce the surface forms
    enc = text.encode("utf-8")
    assert [enc[m.begin:m.end].decode("utf-8") for m in by] == ["café", "bar"]


def test_empty_input():
    lex = Lexicon.from_rows(["a"])
    vf = VariantFinder(lex, CFG)
    assert find_all_matches("", vf, CFG) == []


def test_lm_from_tsv_counts(tmp_path):
    """VERDICT r2 item 9: LM lexicon loader (reference --lm,
    src/bin/analiticcl.rs:1070-1091): n-gram lines add their frequency;
    the unseen-parts pass (src/lib.rs:279-286) gives count-1 unigrams
    to multi-token-entry parts not otherwise known."""
    p = tmp_path / "lm.tsv"
    p.write_text("x y\t5\nx y\t2\nz\t3\nq r\n# comment\n\n")
    lm = BigramLM.from_tsv(str(p))
    assert lm.counts[("x", "y")] == 7          # merged across lines
    assert lm.counts[("z",)] == 3              # explicit unigram kept
    assert lm.counts[("q", "r")] == 1          # missing freq -> 1
    assert lm.counts[("x",)] == 1              # unseen part
    assert lm.counts[("q",)] == 1
    # known tokens are NOT given synthetic unigrams
    lm2 = BigramLM.from_tsv(str(p), known_tokens=["x"])
    assert ("x",) not in lm2.counts
    assert lm2.counts[("y",)] == 1


def test_lm_from_file_flips_consolidation(tmp_path):
    """Loading an LM file changes the most_likely_sequence winner: the
    frequent-lexicon pick 'ball' loses to 'bell' once the LM carries
    'the bell' transitions (reference --lm end-to-end semantics)."""
    lex = Lexicon.from_rows(
        [("i", 10), ("saw", 10), ("the", 10), ("ball", 100), ("bell", 2)]
    )
    vf = VariantFinder(lex, CFG)
    no_lm = find_all_matches("I saw the bcll", vf, CFG, max_ngram=1)
    assert [match_output(m, vf) for m in no_lm] == ["i", "saw", "the", "ball"]
    p = tmp_path / "lm.tsv"
    p.write_text("the bell\t50\nthe ball\t1\nsaw the\t10\ni saw\t10\n")
    lm = BigramLM.from_tsv(str(p), known_tokens=lex.texts)
    with_lm = find_all_matches("I saw the bcll", vf, CFG, max_ngram=2, lm=lm)
    assert [match_output(m, vf) for m in with_lm] == ["i", "saw", "the", "bell"]


def test_structured_match_output(ray_session):
    """Reference search output parity (VERDICT r2 missing item 4,
    src/bin/analiticcl.rs:21-187): TSV line and JSON object per match
    with selected-variant-first ordering, rank score, and lexindex
    lexicon names."""
    import json

    import ray.data as rd

    from analiticcl_ray.pipelines.search import (
        VariantFinder,
        find_all_matches,
        find_all_matches_formatted_ds,
        match_to_dict,
        match_to_tsv,
    )

    lex = Lexicon.from_rows([("think", 8), ("tank", 2), ("i", 5)])
    lex.lexicon_names = ["main.tsv"]
    vf = VariantFinder(lex, CFG)
    ms = find_all_matches("tink", vf, CFG, max_ngram=1)
    assert len(ms) == 1 and ms[0].variants
    tsv = match_to_tsv(ms[0], vf, output_lexmatch=True)
    cols = tsv.split("\t")
    assert cols[0] == "tink" and cols[1] == "0:4"
    assert cols[2] == "think"              # selected variant first
    assert float(cols[3]) > 0.0
    # reference byte layout (output_result_as_tsv,
    # src/bin/analiticcl.rs:60): every variant ends with a trailing
    # tab, so an EMPTY field sits between the score and the quoted
    # lexmatch list
    assert cols[4] == ""
    assert cols[5] == '"main.tsv"'
    # Rust Display float formatting: integral scores print bare
    # ("1", not "1.0"), fractional print shortest round-trip decimal
    from analiticcl_ray.pipelines.search import _fmt_score

    assert _fmt_score(1.0) == "1"
    assert _fmt_score(0.9531) == "0.9531"
    assert _fmt_score(1e-07) == "0.0000001"
    # without lexmatch the line still ends with the trailing tab
    assert match_to_tsv(ms[0], vf).endswith("\t")
    d = match_to_dict(ms[0], vf, output_lexmatch=True)
    assert d["input"] == "tink" and d["begin"] == 0 and d["end"] == 4
    assert d["variants"][0]["text"] == "think"
    assert d["variants"][0]["lexicons"] == ["main.tsv"]
    assert {"score", "dist_score", "freq_score"} <= set(d["variants"][0])

    # dataset form: one JSON object per match row
    lines = rd.from_items([{"line_id": 0, "text": "i tink"}])
    rows = find_all_matches_formatted_ds(lines, lex, CFG, fmt="json").take_all()
    parsed = [json.loads(r["match"]) for r in rows]
    assert [p["input"] for p in parsed] == ["i", "tink"]
    assert parsed[1]["variants"][0]["text"] == "think"


def test_lm_score_tokens():
    lm = BigramLM()
    lm.train_tokens([["a", "b"], ["a", "b"], ["a", "c"]])
    lp_ab, pp_ab = lm.score_tokens(["<bos>", "a", "b", "<eos>"])
    lp_ac, pp_ac = lm.score_tokens(["<bos>", "a", "c", "<eos>"])
    assert pp_ab < pp_ac  # "a b" is twice as frequent
    # OOV token falls back to the smoothing constant
    lp_oov, _ = lm.score_tokens(["<bos>", None, "<eos>"])
    assert lp_oov == pytest.approx(2 * -13.815510557964274)
