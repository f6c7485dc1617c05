"""Deletion-neighborhood join (pipelines/dlpairs.py): completeness of
the SymSpell construction vs brute-force full-DL, and bit-identical
parity of variants_dl with its DuckDB oracle."""

import numpy as np
import pandas as pd
import pytest


def _brute_dl_pairs(tokens, max_dist):
    from analiticcl_ray.functions.kernels import damerau_levenshtein

    def o(s):
        return [ord(c) for c in s]

    out = {}
    toks = sorted(set(tokens))
    for i in range(len(toks)):
        for j in range(i + 1, len(toks)):
            d = damerau_levenshtein(o(toks[i]), o(toks[j]), max_dist)
            if d is not None and d > 0:
                out[(toks[i], toks[j])] = d
    return out


def test_deletion_variants_closed_form():
    from analiticcl_ray.pipelines.dlpairs import deletion_variants

    vs = deletion_variants("abc", 2)
    assert vs == {"abc", "ab", "ac", "bc", "a", "b", "c"}
    # depth capped at len(token)
    assert deletion_variants("ab", 5) == {"ab", "a", "b", ""}


def test_deletion_join_covers_transpositions():
    """The cases where true DL differs from OSA must share a variant."""
    from analiticcl_ray.pipelines.dlpairs import deletion_variants

    for a, b, k in [("ab", "ba", 1), ("ca", "abc", 2), ("hipotesis", "hypothesis", 2)]:
        assert deletion_variants(a, k) & deletion_variants(b, k), (a, b)


def test_dl_pairs_matches_bruteforce(ray_session):
    import ray.data as rd

    from analiticcl_ray.pipelines.dlpairs import dl_pairs

    rng = np.random.default_rng(7)
    base = ["spark", "table", "batch", "value", "stream", "filter", "window"]
    words = set(base)
    for w in base:
        for _ in range(3):
            # random single edits (sub / del / transposition)
            i = int(rng.integers(0, len(w)))
            op = int(rng.integers(0, 3))
            if op == 0:
                words.add(w[:i] + chr(97 + int(rng.integers(0, 26))) + w[i + 1 :])
            elif op == 1 and len(w) > 2:
                words.add(w[:i] + w[i + 1 :])
            elif i + 1 < len(w):
                words.add(w[:i] + w[i + 1] + w[i] + w[i + 2 :])
    docs = rd.from_items(
        [{"doc_id": i, "text": " ".join(sorted(words))} for i in range(2)]
    )
    got = {
        (r["a"], r["b"]): r["dl"] for r in dl_pairs(docs, max_dist=2).take_all()
    }
    want = _brute_dl_pairs(words, 2)
    assert got == want
    assert len(want) >= 10


def test_variants_dl_oracle_parity(ray_session):
    duckdb = pytest.importorskip("duckdb")
    import ray.data as rd

    import __ray_entry__ as entry
    from analiticcl_ray.pipelines.dlpairs import variants_dl

    rng = np.random.default_rng(11)
    vocab = ["spark", "table", "batch", "value", "stream", "filter", "window",
             "query", "group", "join", "sort", "hash", "scan", "merge"]
    texts = [
        " ".join(rng.choice(vocab, size=12, replace=True)) for _ in range(40)
    ]
    pdf = pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts,
         "lang": ["en"] * len(texts), "n_chars": [len(t) for t in texts]}
    )
    out = (
        variants_dl(rd.from_pandas(pdf))
        .to_pandas()
        .sort_values(["input", "candidate"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    oracle = (
        con.execute(entry.oracle_sql()["variants_dl"])
        .df()
        .sort_values(["input", "candidate"])
        .reset_index(drop=True)
    )
    assert len(out) == len(oracle) and len(out) > 0
    pd.testing.assert_frame_equal(out, oracle.astype(out.dtypes.to_dict()))


def test_variants_scored_oracle_parity(ray_session):
    """Blended weights (DL + prefix + suffix + case, VERDICT r2 item 7)
    hash-exact vs the DuckDB oracle, on a vocab with case variation so
    the case term actually discriminates."""
    duckdb = pytest.importorskip("duckdb")
    import ray.data as rd

    import __ray_entry__ as entry
    from analiticcl_ray.pipelines.dlpairs import variants_scored

    rng = np.random.default_rng(13)
    vocab = ["Spark", "spark", "table", "Table", "batch", "value", "stream",
             "filter", "window", "query", "group", "joins", "sorts", "hash"]
    texts = [
        " ".join(rng.choice(vocab, size=12, replace=True)) for _ in range(40)
    ]
    pdf = pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts,
         "lang": ["en"] * len(texts), "n_chars": [len(t) for t in texts]}
    )
    out = (
        variants_scored(rd.from_pandas(pdf))
        .to_pandas()
        .sort_values(["input", "candidate"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    oracle = (
        con.execute(entry.oracle_sql()["variants_scored"])
        .df()
        .sort_values(["input", "candidate"])
        .reset_index(drop=True)
    )
    assert len(out) == len(oracle) and len(out) > 0
    # scores compare EXACT: term order/association mirror distance_score
    pd.testing.assert_frame_equal(
        out, oracle.astype(out.dtypes.to_dict()), check_exact=True
    )
    # the blended score differs from the ld-only slice (components live)
    from analiticcl_ray.functions.kernels import (
        Weights,
        common_prefix_length_np,
        common_suffix_length_np,
        damerau_levenshtein,
        distance_score,
        same_case,
    )

    w = Weights(ld=0.5, lcs=0.0, prefix=0.125, suffix=0.125, case=0.125)
    for r in out.head(10).itertuples():
        oq = np.array([ord(c) for c in r.input], dtype=np.int64)
        ov = np.array([ord(c) for c in r.candidate], dtype=np.int64)
        d = damerau_levenshtein(oq, ov, 2)
        want = distance_score(
            ld=d,
            lcs=0,
            prefixlen=common_prefix_length_np(oq, ov),
            suffixlen=common_suffix_length_np(oq, ov),
            samecase=same_case(r.input, r.candidate),
            input_length=len(r.input),
            weights=w,
        )
        assert r.score == want
