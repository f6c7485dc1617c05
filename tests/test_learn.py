"""Learn-mode tests (src/lib.rs:1062-1139 semantics): iterative variant
acquisition with transparent links and early stop."""

import pytest


def test_learn_variants_basic(ray_session):
    import ray.data as rd

    from analiticcl_ray.config import SearchConfig
    from analiticcl_ray.pipelines.learn import learn_variants_ds
    from analiticcl_ray.pipelines.variants import TRANSPARENT, Lexicon

    lex = Lexicon.from_rows([("separate", 10), ("think", 5)])
    inputs = rd.from_items(
        [
            {"input": "seperate"},
            {"input": "seperate"},
            {"input": "tink"},
            {"input": "zzzz"},  # matches nothing
        ]
    )
    cfg = SearchConfig(score_threshold=0.5, cutoff_threshold=0.0)
    lex2, reverse, stats = learn_variants_ds(inputs, lex, cfg, iterations=3)

    rows = {(r["reference"], r["variant"]) for r in reverse.take_all()}
    assert ("separate", "seperate") in rows
    assert ("think", "tink") in rows
    assert all(v != "zzzz" for _, v in rows)
    # learned entries are transparent (replaced by their reference in
    # later lookups, src/lib.rs:1677-1727)
    i = lex2._encoder["seperate"]
    assert lex2.vocab_types[i] & TRANSPARENT
    # occurrence count carried (two "seperate" occurrences)
    assert lex2.freqs[i] == 2
    # early stop: iteration 2 learns nothing new
    assert stats[-1]["learned"] == 0


def test_learn_enables_transitive_match(ray_session):
    """After learning 'seperate', a query one edit away from it (but two
    from 'separate') reaches the reference through the learned variant."""
    import ray.data as rd

    from analiticcl_ray.config import SearchConfig
    from analiticcl_ray.pipelines.learn import learn_variants_ds
    from analiticcl_ray.pipelines.variants import Lexicon, VariantFinder

    cfg = SearchConfig(
        max_anagram_distance=2, max_edit_distance=2,
        score_threshold=0.5, cutoff_threshold=0.0,
    )
    lex = Lexicon.from_rows([("afgescheid", 3)])
    inputs = rd.from_items([{"input": "afghescheydt"}])
    # "afghescheydt" is >2 edits from "afgescheid" -> nothing learned in
    # strict mode with tight thresholds; loosen for learning only
    loose = SearchConfig(
        max_anagram_distance=4, max_edit_distance=4,
        score_threshold=0.3, cutoff_threshold=0.0,
    )
    lex2, _, _ = learn_variants_ds(inputs, lex, loose, iterations=1)
    vf = VariantFinder(lex2, cfg)
    results = vf.find_variants("afgheschaydt")  # 1 edit from the learned form
    assert results, "transparent expansion must reach the reference"
    assert vf.lex.texts[results[0]["vocab_id"]] == "afgescheid"
