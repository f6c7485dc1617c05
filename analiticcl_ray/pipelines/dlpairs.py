"""Exact Damerau-Levenshtein pair finding via a distributed
deletion-neighborhood join (the SymSpell construction).

This is the EXACT-path realization of the reference's anagram
deletion-neighborhood candidate search (`find_nearest_anahashes`,
src/lib.rs:1143-1308 + RecurseDeletionIterator src/iterators.rs:95-236):
where the reference BFS-walks deletion hashes against a resident index,
we explode every token into its <=k-deletion variants and let ONE
groupby shuffle co-locate tokens sharing a variant — the shuffle *is*
the deletion index. Candidates are then confirmed with the exact
full-DL kernel (functions/kernels.py, src/distance.rs:101-179).

Completeness: if DL(a, b) <= k then a and b share a common string
reachable by <= k deletions from each (every DL edit op — insert,
delete, substitute, transpose — is covered by deleting at most one
character from each side), so the variant join is a *complete*
candidate generator for DL <= k; no probabilistic recall argument
needed. Verified against a brute-force all-pairs oracle in
tests/test_dlpairs.py and against DuckDB's ``damerau_levenshtein``
(true DL, same semantics as src/distance.rs:101-179 — checked on the
reference goldens DL("ab","ba")=1, DL("hipotesis","hypothesis")=2,
DL("ca","abc")=2) by the driver's CORRECTNESS gate.

Scale shape: both sides of the join are (variant_hash: uint64,
token) rows — ~1 + L + L(L-1)/2 variants per token at k=2, emitted by a
stateless ``map_batches`` over the (already-aggregated, vocab-sized)
token table; the single co-occurrence shuffle and the pair dedup reuse
stages/lsh.py. Nothing is ever materialized on the driver.
"""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..config import SearchConfig
from ..functions.kernels import (
    Weights,
    common_prefix_length_np,
    common_suffix_length_np,
    damerau_levenshtein,
    distance_score,
    resolve_max_distance,
    same_case,
)

_LD_ONLY = Weights(ld=1.0, lcs=0.0, prefix=0.0, suffix=0.0, case=0.0)

#: the SQL-expressible blended-weight slice (VERDICT r2 item 7): the
#: reference defaults (src/types.rs:57-67) minus the LCS term — DuckDB
#: has damerau_levenshtein and string prefix/suffix/case expressions
#: but no longest-common-substring; LCS weighting stays pytest-only.
_SQL_BLEND = Weights(ld=0.5, lcs=0.0, prefix=0.125, suffix=0.125, case=0.125)


def deletion_variants(token: str, max_deletes: int) -> set[str]:
    """All strings reachable from ``token`` by deleting up to
    ``max_deletes`` characters (token itself included) — the SymSpell
    neighborhood; the closed form of the reference's recursive deletion
    iterator (src/iterators.rs:150-186) for string (not bag) keys."""
    out = {token}
    n = len(token)
    for d in range(1, min(max_deletes, n) + 1):
        for idx in combinations(range(n), d):
            out.add("".join(token[i] for i in range(n) if i not in idx))
    return out


def _ord_array(s: str) -> np.ndarray:
    return np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)


def deletion_variant_rows(
    tokens: "ray.data.Dataset", max_deletes: int, token_col: str = "token"
) -> "ray.data.Dataset":
    """(token, ...) -> long (variant_key: int64, token) rows.

    variant_key is a deterministic C-vectorized 64-bit hash of the
    variant string (pandas fixed-key hash — process-stable, unlike
    Python's salted ``hash()``); collisions only add false candidates,
    which the exact DL verify removes."""

    def _explode(batch: pa.Table) -> pa.Table:
        toks: list[str] = []
        variants: list[str] = []
        for t in batch[token_col].to_pylist():
            vs = deletion_variants(t, max_deletes)
            toks.extend([t] * len(vs))
            variants.extend(vs)
        h = pd.util.hash_pandas_object(
            pd.Series(variants, dtype="object"), index=False
        ).to_numpy()
        return pa.table(
            {
                "variant_key": pa.array(h.view(np.int64), pa.int64()),
                token_col: pa.array(toks, pa.string()),
            }
        )

    return tokens.map_batches(_explode, batch_format="pyarrow")


class _DLVerifier:
    """Actor: exact full-DL distance on candidate token pairs; keeps
    (a, b, dl) with dl <= max_dist. Codepoint arrays are memoized per
    actor (the reference's per-model cache analog, src/cache.rs:1-28)."""

    def __init__(self, max_dist: int):
        self.max_dist = max_dist
        self._ords: dict[str, np.ndarray] = {}

    def _o(self, s: str) -> np.ndarray:
        a = self._ords.get(s)
        if a is None:
            if len(self._ords) > 500_000:
                self._ords.clear()
            a = _ord_array(s)
            self._ords[s] = a
        return a

    def __call__(self, batch: pa.Table) -> pa.Table:
        srcs = batch["src_id"].to_pylist()
        dsts = batch["dst_id"].to_pylist()
        keep_a: list[str] = []
        keep_b: list[str] = []
        dls: list[int] = []
        for a, b in zip(srcs, dsts):
            d = damerau_levenshtein(self._o(a), self._o(b), self.max_dist)
            if d is not None and d > 0:
                keep_a.append(a)
                keep_b.append(b)
                dls.append(d)
        return pa.table(
            {
                "a": pa.array(keep_a, pa.string()),
                "b": pa.array(keep_b, pa.string()),
                "dl": pa.array(dls, pa.int64()),
            }
        )


def dl_pairs(
    docs: "ray.data.Dataset", max_dist: int = 2, bucket_cap: int = 1_000_000
) -> "ray.data.Dataset":
    """ALL distinct-token pairs of the corpus within true-DL
    ``max_dist``, with the exact distance: token vocabulary (reuse of
    text.token_counts' combiner+groupby) -> deletion-variant explode ->
    one co-occurrence shuffle -> canonical pair dedup -> exact DL
    verify in an actor pool.

    ``bucket_cap`` is effectively unbounded by default because the
    contract is exactness (a variant shared by m tokens legitimately
    yields O(m^2) candidates); it exists as an explicit safety valve —
    drops are counted by the lsh stage, never silent."""
    from ..stages.lsh import cooccurrence_pairs, dedup_pairs
    from .text import token_counts

    vocab = token_counts(docs).select_columns(["token"])
    rows = deletion_variant_rows(vocab, max_dist)
    cand = dedup_pairs(
        cooccurrence_pairs(rows, "variant_key", "token", cap=bucket_cap)
    )
    return cand.map_batches(
        _DLVerifier,
        fn_constructor_args=(max_dist,),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )


def variants_dl(
    docs: "ray.data.Dataset",
    cfg: SearchConfig | None = None,
    n_queries: int = 30,
    vocab_top: int = 200,
    max_deletes: int = 2,
    weights: Weights = _LD_ONLY,
) -> "ray.data.Dataset":
    """Query-mode variant matching with ld-only weights and a COMPLETE
    (deletion-join) candidate generator — the SQL-expressible slice of
    ``find_variants`` (score formula src/lib.rs:1430-1452 restricted to
    the DL component; threshold resolution src/lib.rs:982-1012), so the
    whole query path gets a DuckDB hash-match oracle.

    Deterministic workload mirroring __ray_entry__.find_variants: the
    lexicon is the corpus' top-``vocab_top`` tokens by (freq desc, token
    asc); queries are the first ``n_queries`` of those with length >= 3,
    each transposed at positions 1..2 (the reference's canonical typo
    class, tests/main.rs:677-685). Emits (input, candidate, score,
    freq) for score >= cfg.score_threshold, candidate != input.

    Shape at scale: the query table and the lexicon explode into
    deletion-variant rows and meet in ONE shuffle (same machinery as
    ``dl_pairs``); scoring is per-pair in an actor pool."""
    from ..stages.lsh import cooccurrence_pairs, dedup_pairs
    from .text import top_terms

    cfg = cfg or SearchConfig(max_edit_distance=2, score_threshold=0.5)

    # top-k lexicon via the per-block top-k combiner (text.top_terms:
    # each count bucket holds a token's FULL count, so the global top-k
    # is a subset of per-block top-ks + one constant-sized final merge)
    # — replaces the former global sort+limit over the whole vocabulary
    # (round 4; same (freq desc, token asc) order, identical row set).
    # Materialized because three consumers pull it (queries, the tagged
    # lexicon union, the freq broadcast).
    top = (
        top_terms(docs, k=vocab_top)
        .map_batches(
            lambda t: pa.table({"token": t["token"], "freq": t["cnt"]}),
            batch_format="pyarrow",
        )
        .materialize()
    )

    def _queries(batch: pa.Table) -> pa.Table:
        qs = [
            t[0] + t[2] + t[1] + t[3:]
            for t in batch["token"].to_pylist()
            if len(t) >= 3
        ]
        return pa.table({"token": pa.array(qs, pa.string())})

    queries = (
        top.limit(n_queries)
        .map_batches(_queries, batch_format="pyarrow")
    )

    # tag sides, explode to deletion variants, meet in one shuffle.
    # Query rows are prefixed "q\x1f", lexicon rows "v\x1f" so the
    # cooccurrence machinery (which pairs plain ids) keeps side identity.
    def _tag(prefix: str):
        def _f(batch: pa.Table) -> pa.Table:
            toks = batch["token"].to_pylist()
            out = pa.table({"token": pa.array([prefix + t for t in toks])})
            return out

        return _f

    tagged = queries.map_batches(_tag("q\x1f"), batch_format="pyarrow").union(
        top.select_columns(["token"]).map_batches(_tag("v\x1f"), batch_format="pyarrow")
    )

    def _strip_explode(batch: pa.Table) -> pa.Table:
        toks: list[str] = []
        variants: list[str] = []
        for tagged_t in batch["token"].to_pylist():
            t = tagged_t[2:]
            vs = deletion_variants(t, max_deletes)
            toks.extend([tagged_t] * len(vs))
            variants.extend(vs)
        h = pd.util.hash_pandas_object(
            pd.Series(variants, dtype="object"), index=False
        ).to_numpy()
        return pa.table(
            {
                "variant_key": pa.array(h.view(np.int64), pa.int64()),
                "token": pa.array(toks, pa.string()),
            }
        )

    rows = tagged.map_batches(_strip_explode, batch_format="pyarrow")
    cand = dedup_pairs(
        cooccurrence_pairs(rows, "variant_key", "token", cap=1_000_000)
    )

    # keep only (query, vocab) pairs; both orders appear canonicalized,
    # so check both sides
    thr = cfg.score_threshold
    med = cfg.max_edit_distance

    class _Scorer:
        def __init__(self):
            self._ords: dict[str, np.ndarray] = {}

        def _o(self, s: str) -> np.ndarray:
            a = self._ords.get(s)
            if a is None:
                a = _ord_array(s)
                self._ords[s] = a
            return a

        def __call__(self, batch: pa.Table) -> pa.Table:
            inputs: list[str] = []
            cands: list[str] = []
            scores: list[float] = []
            for x, y in zip(batch["src_id"].to_pylist(), batch["dst_id"].to_pylist()):
                sx, tx = x[0], x[2:]
                sy, ty = y[0], y[2:]
                if sx == sy:
                    continue
                q, v = (tx, ty) if sx == "q" else (ty, tx)
                if q == v:
                    continue
                maxd = resolve_max_distance(len(q), med)
                oq, ov = self._o(q), self._o(v)
                d = damerau_levenshtein(oq, ov, maxd)
                if d is None:
                    continue
                s = distance_score(
                    ld=d,
                    lcs=0,
                    prefixlen=(
                        common_prefix_length_np(oq, ov)
                        if weights.prefix > 0
                        else 0
                    ),
                    suffixlen=(
                        common_suffix_length_np(oq, ov)
                        if weights.suffix > 0
                        else 0
                    ),
                    samecase=same_case(q, v) if weights.case > 0 else True,
                    input_length=len(q),
                    weights=weights,
                )
                if s >= thr:
                    inputs.append(q)
                    cands.append(v)
                    scores.append(s)
            return pa.table(
                {
                    "input": pa.array(inputs, pa.string()),
                    "candidate": pa.array(cands, pa.string()),
                    "score": pa.array(scores, pa.float64()),
                }
            )

    scored = cand.map_batches(
        _Scorer, batch_format="pyarrow", concurrency=(1, 4),
    )

    # attach candidate freq: one-sided lookup against the (bounded,
    # vocab_top-row) lexicon as a zero-copy Arrow broadcast — the
    # pattern of stages/verify.broadcast_lookup, candidate side only
    # (the input side is a typo'd form, not a lexicon member)
    from ..stages.verify import broadcast_lookup

    freq_ref = broadcast_lookup(top, ["freq"], id_col="token")

    class _AttachFreq:
        def __init__(self):
            import ray

            self.table = ray.get(freq_ref)
            self.ids = self.table["token"].combine_chunks()

        def __call__(self, batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            idx = pc.index_in(batch["candidate"], value_set=self.ids)
            return batch.append_column("freq", self.table["freq"].take(idx))

    return scored.map_batches(
        _AttachFreq, batch_format="pyarrow", concurrency=(1, 4)
    )


def variants_scored(
    docs: "ray.data.Dataset",
    cfg: SearchConfig | None = None,
    n_queries: int = 30,
    vocab_top: int = 200,
    max_deletes: int = 2,
) -> "ray.data.Dataset":
    """``variants_dl`` with the blended reference weights (VERDICT r2
    item 7): DL + common-prefix + common-suffix + first-char case flag
    (src/lib.rs:1430-1452 with src/types.rs:57-67 defaults, LCS term
    excluded — see ``_SQL_BLEND``). Every component is expressible in
    DuckDB SQL (damerau_levenshtein, per-position substr comparison for
    prefix/suffix, upper() inequality for the lowercase test), so the
    full K5/K6 weighting gets a hash-match oracle; LCS weighting stays
    covered by the kernel goldens in tests/test_kernels.py."""
    return variants_dl(
        docs,
        cfg=cfg,
        n_queries=n_queries,
        vocab_top=vocab_top,
        max_deletes=max_deletes,
        weights=_SQL_BLEND,
    )
