"""Training-data text operations over the ``documents`` table.

The large-scale-pipeline operator set the graft requires beyond the
reference's own API (task brief): exact dedup, n-gram-Jaccard near-dup,
MinHash-LSH near-dup, SimHash fingerprints, language-ID, quality
scoring, token counting, document fingerprinting, anagram grouping
(the analiticcl-flavored op: group words by bag-of-characters key,
src/anahash.rs:16-47 applied to whole words).

Every function takes/returns ``ray.data.Dataset``; the SQL-expressible
ones have a DuckDB oracle in __ray_entry__.py computing the same result
(column names and value derivations chosen to be bit-identical: derived
floats appear only as single divisions of exact integers).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..config import DedupConfig
from ..functions.alphabet import Normalizer, simple_alphabet, shingle_keys_from_norm
from ..stages.signatures import splitmix64

_WS = re.compile(r"\s+")
_U64 = np.uint64


# ---------------------------------------------------------------------
# exact dedup (hash-partition + per-group aggregate)
# ---------------------------------------------------------------------

def exact_dedup(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """One row per distinct text: representative = min doc_id, plus the
    duplicate count. Pre-aggregates per batch (combiner) before the
    groupby so the shuffle carries one row per distinct text per block."""

    def _partial(batch: pa.Table) -> pa.Table:
        df = batch.select(["doc_id", "text"]).to_pandas()
        g = df.groupby("text", sort=False)["doc_id"].agg(["min", "count"]).reset_index()
        return pa.table(
            {
                "text": pa.array(g["text"], pa.string()),
                "rep_id": pa.array(g["min"], pa.int64()),
                "n_dups": pa.array(g["count"], pa.int64()),
            }
        )

    def _merge(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "text": [group["text"].iloc[0]],
                "rep_id": [int(group["rep_id"].min())],
                "n_dups": [int(group["n_dups"].sum())],
            }
        )

    return (
        docs.map_batches(_partial, batch_format="pyarrow")
        .groupby("text")
        .map_groups(_merge, batch_format="pandas")
    )


# ---------------------------------------------------------------------
# token / quality stats (stateless vectorized map)
# ---------------------------------------------------------------------

def doc_stats(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-document token/quality stats. Token = maximal non-whitespace
    run of trimmed text (same as DuckDB regexp_split_to_array(trim(x),
    '\\s+'))."""

    def _stats(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        n_tokens = np.empty(len(texts), dtype=np.int64)
        n_chars = np.empty(len(texts), dtype=np.int64)
        n_distinct = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            toks = _WS.split(t.strip()) if t.strip() else []
            n_tokens[i] = len(toks)
            n_distinct[i] = len(set(toks))
            n_chars[i] = len(t)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "n_distinct_tokens": pa.array(n_distinct, pa.int64()),
                "n_chars_computed": pa.array(n_chars, pa.int64()),
                # single int/int divisions -> bit-identical to SQL
                "avg_token_len": pa.array(
                    np.where(n_tokens > 0, n_chars / np.maximum(n_tokens, 1), 0.0),
                    pa.float64(),
                ),
                "distinct_ratio": pa.array(
                    np.where(n_tokens > 0, n_distinct / np.maximum(n_tokens, 1), 0.0),
                    pa.float64(),
                ),
            }
        )

    return docs.map_batches(_stats, batch_format="pyarrow")


def quality_filter(docs: "ray.data.Dataset", min_tokens: int = 20,
                   min_distinct_ratio: float = 0.3) -> "ray.data.Dataset":
    """Quality gate: docs passing token-count and repetition thresholds
    (the classic pretraining-corpus filter)."""
    stats = doc_stats(docs)
    return stats.filter(
        expr=f"n_tokens >= {min_tokens} and distinct_ratio >= {min_distinct_ratio}"
    ).select_columns(["doc_id", "n_tokens", "distinct_ratio"])


def token_counts(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Corpus-wide word frequency: flat-map words, per-batch partial
    counts (combiner), then a small groupby-sum."""

    def _partial(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for t in batch["text"].to_pylist():
            for w in _WS.split(t.strip()) if t.strip() else []:
                counts[w] = counts.get(w, 0) + 1
        return pa.table(
            {
                "token": pa.array(list(counts.keys()), pa.string()),
                "cnt": pa.array(list(counts.values()), pa.int64()),
            }
        )

    def _merge(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"token": [group["token"].iloc[0]], "cnt": [int(group["cnt"].sum())]}
        )

    return (
        docs.map_batches(_partial, batch_format="pyarrow")
        .groupby("token")
        .map_groups(_merge, batch_format="pandas")
    )


# ---------------------------------------------------------------------
# anagram grouping (the analiticcl-flavored operator)
# ---------------------------------------------------------------------

def anagram_groups(docs: "ray.data.Dataset", min_words: int = 1) -> "ray.data.Dataset":
    """Group corpus words by bag-of-characters (anagram) key — the
    distributed analog of the reference's AnaIndex build
    (src/lib.rs:192-297): key(word) = sorted characters (equivalent
    grouping to the prime-product anagram value, src/anahash.rs:16-47).
    Emits keys instantiated by >1 distinct word with the words listed —
    the anagram buckets of tests/main.rs:836-855 at corpus scale."""

    def _partial(batch: pa.Table) -> pa.Table:
        pairs: set[tuple[str, str]] = set()
        for t in batch["text"].to_pylist():
            for w in _WS.split(t.strip()) if t.strip() else []:
                pairs.add(("".join(sorted(w)), w))
        return pa.table(
            {
                "anakey": pa.array([p[0] for p in pairs], pa.string()),
                "word": pa.array([p[1] for p in pairs], pa.string()),
            }
        )

    def _merge(group: pd.DataFrame) -> pd.DataFrame:
        words = sorted(set(group["word"]))
        if len(words) < min_words:
            return pd.DataFrame({"anakey": pd.Series([], dtype=object),
                                 "n_words": pd.Series([], dtype="int64"),
                                 "words": pd.Series([], dtype=object)})
        return pd.DataFrame(
            {
                "anakey": [group["anakey"].iloc[0]],
                "n_words": [len(words)],
                "words": [",".join(words)],
            }
        )

    return (
        docs.map_batches(_partial, batch_format="pyarrow")
        .groupby("anakey")
        .map_groups(_merge, batch_format="pandas")
    )


# ---------------------------------------------------------------------
# n-gram Jaccard near-dup (exact) — the oracle-checkable near-dup op
# ---------------------------------------------------------------------

def ngram_jaccard_pairs(
    docs: "ray.data.Dataset", n: int = 3, threshold: float = 0.8
) -> "ray.data.Dataset":
    """EXACT character-n-gram Jaccard similarity for all pairs above
    ``threshold``. Dense path: the distinct-gram vocabulary is collected
    once (a vectorized groupby; small whenever the corpus vocabulary is
    bounded — the synthetic tables here), each block turns into a binary
    doc×gram membership matrix, intersections are one integer matmul of
    the block against the broadcast full matrix, and |A∪B| =
    |A|+|B|-|A∩B| with a single int/int division (bit-identical to the
    DuckDB oracle). For open-vocabulary corpora use the sparse path:
    (gram, doc) explode -> hot-gram prefilter -> per-gram pair emission
    -> pair-count aggregate (the machinery in stages/lsh.py)."""
    import ray

    def _gram_rows(batch: pa.Table) -> pa.Table:
        out_g: list[str] = []
        for t in batch["text"].to_pylist():
            if len(t) >= n:
                out_g.extend({t[i : i + n] for i in range(len(t) - n + 1)})
        return pa.table({"gram": pa.array(sorted(set(out_g)), pa.string())})

    vocab = sorted(
        r["gram"]
        for r in docs.map_batches(_gram_rows, batch_format="pyarrow")
        .groupby("gram")
        .count()
        .take_all()
    )
    gram_idx = {g: i for i, g in enumerate(vocab)}

    # full membership matrix, broadcast once (docs × grams, packed bool)
    ids_all: list[int] = []
    rows: list[np.ndarray] = []
    for b in docs.select_columns(["doc_id", "text"]).iter_batches(
        batch_size=8192, batch_format="pyarrow"
    ):
        for d, t in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            v = np.zeros(len(vocab), dtype=np.int32)
            if len(t) >= n:
                for i in range(len(t) - n + 1):
                    v[gram_idx[t[i : i + n]]] = 1
            ids_all.append(d)
            rows.append(v)
    full_ids = np.array(ids_all, dtype=np.int64)
    order = np.argsort(full_ids)
    full_ids = full_ids[order]
    full_mat = np.stack([rows[i] for i in order]) if rows else np.zeros((0, 1), np.int32)
    full_sizes = full_mat.sum(axis=1)
    ref = ray.put((full_ids, full_mat, full_sizes))

    def _block(batch: pa.Table) -> pa.Table:
        bids, bmat, bsizes = ray.get(ref)
        a_ids = np.array(batch["doc_id"].to_pylist(), dtype=np.int64)
        amat = np.zeros((len(a_ids), bmat.shape[1]), dtype=np.int32)
        for i, t in enumerate(batch["text"].to_pylist()):
            if len(t) >= n:
                for j in range(len(t) - n + 1):
                    amat[i, gram_idx[t[j : j + n]]] = 1
        inter = amat @ bmat.T  # (na, nb) int
        asizes = amat.sum(axis=1)
        out_a, out_b, out_j = [], [], []
        for i in range(len(a_ids)):
            union = asizes[i] + bsizes - inter[i]
            with np.errstate(invalid="ignore", divide="ignore"):
                jac = np.where(union > 0, inter[i] / union, 0.0)
            hits = np.where((jac >= threshold) & (a_ids[i] < bids))[0]
            for h in hits:
                out_a.append(int(a_ids[i]))
                out_b.append(int(bids[h]))
                out_j.append(float(jac[h]))
        return pa.table(
            {
                "a": pa.array(out_a, pa.int64()),
                "b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(out_j, pa.float64()),
            }
        )

    return docs.map_batches(_block, batch_format="pyarrow")


# ---------------------------------------------------------------------
# MinHash-LSH near-dup over documents (the scale path)
# ---------------------------------------------------------------------

class DocMinHash:
    """Actor: text -> LSH band keys over raw char-n-gram shingles
    (hashing the n-gram bytes; the caption pipeline uses anagram-valued
    shingles — here we match the exact-Jaccard op's gram definition so
    recall is measurable against ngram_jaccard_pairs)."""

    def __init__(self, cfg: DedupConfig | None = None, n: int = 3):
        self.cfg = cfg or DedupConfig()
        self.n = n
        self.perm_seeds = splitmix64(
            np.arange(self.cfg.num_perm, dtype=np.uint64)
            + _U64((self.cfg.seed * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        texts = batch["text"].to_pylist()
        shingle_sets = []
        for t in texts:
            gs = (
                {t[i : i + self.n] for i in range(len(t) - self.n + 1)}
                if len(t) >= self.n
                else {t}
            )
            arr = np.fromiter(
                (
                    int.from_bytes(
                        hashlib.blake2b(g.encode(), digest_size=8).digest(), "little"
                    )
                    for g in gs
                ),
                dtype=np.uint64,
                count=len(gs),
            )
            shingle_sets.append(arr)
        n_rows = len(texts)
        sigs = np.full((n_rows, cfg.num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
        lens = np.array([len(s) for s in shingle_sets])
        nz = np.where(lens > 0)[0]
        if len(nz):
            concat = np.concatenate([shingle_sets[i] for i in nz])
            starts = np.zeros(len(nz), dtype=np.int64)
            starts[1:] = np.cumsum(lens[nz])[:-1]
            with np.errstate(over="ignore"):
                for p in range(cfg.num_perm):
                    hp = splitmix64(concat ^ self.perm_seeds[p])
                    sigs[nz, p] = np.minimum.reduceat(hp, starts)
        r = cfg.band_rows
        bands = np.empty((n_rows, cfg.bands), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for b_i in range(cfg.bands):
                acc = np.full(n_rows, _U64((b_i * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF))
                for rr in range(r):
                    acc = splitmix64(acc ^ sigs[:, b_i * r + rr])
                bands[:, b_i] = acc
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "bands": pa.FixedSizeListArray.from_arrays(
                    pa.array(bands.reshape(-1).view(np.int64), pa.int64()), cfg.bands
                ),
            }
        )


def minhash_dedup_pairs(
    docs: "ray.data.Dataset", cfg: DedupConfig | None = None, n: int = 3,
    jaccard_threshold: float = 0.8,
) -> "ray.data.Dataset":
    """MinHash-LSH candidates verified by EXACT n-gram Jaccard:
    signatures -> band explode -> hot-band prefilter + co-occurrence
    pairs (stages/lsh.py machinery) -> exact verify via a broadcast
    gram-set lookup (documents are slim; at 1e12 scale the verify would
    cogroup instead — stages/verify.py has both paths).

    At r = num_perm/bands = 4 rows per band, P[candidate | J=0.8] =
    1-(1-0.8^4)^32 ≈ 1 - 5e-8 — recall vs ngram_jaccard_pairs is
    asserted ≥ 0.99 in tests."""
    import ray

    from ..stages.lsh import candidate_pairs, dedup_pairs

    cfg = cfg or DedupConfig()

    sig = docs.select_columns(["doc_id", "text"]).map_batches(
        DocMinHash, fn_constructor_args=(cfg, n), batch_format="pyarrow",
        concurrency=(1, 4),
    )

    def _explode(batch: pa.Table) -> pa.Table:
        arr = batch["bands"].combine_chunks()
        width = arr.type.list_size
        idx = np.repeat(np.arange(len(batch), dtype=np.int64), width)
        return pa.table(
            {
                "band": arr.flatten(),
                "doc_id": batch["doc_id"].take(pa.array(idx)).combine_chunks(),
            }
        )

    cand = dedup_pairs(
        candidate_pairs(
            sig.map_batches(_explode, batch_format="pyarrow"),
            cfg.bucket_cap,
            id_col="doc_id",
            id_dtype="int",
        ),
        id_dtype="int",
    ).map_batches(
        # rename via arrow (blocks may arrive as pandas from map_groups)
        lambda t: t.rename_columns(["a", "b", "capped"]),
        batch_format="pyarrow",
    )

    # exact-verify survivors with a broadcast gram-set table
    gram_sets: dict[int, frozenset] = {}
    for b in docs.select_columns(["doc_id", "text"]).iter_batches(
        batch_size=8192, batch_format="pyarrow"
    ):
        for d, t in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            gram_sets[d] = frozenset(
                t[i : i + n] for i in range(len(t) - n + 1)
            ) if len(t) >= n else frozenset()
    ref = ray.put(gram_sets)

    def _verify(batch: pa.Table) -> pa.Table:
        gs = ray.get(ref)
        a = batch["a"].to_pylist()
        b = batch["b"].to_pylist()
        jac = np.empty(len(a), dtype=np.float64)
        for i, (x, y) in enumerate(zip(a, b)):
            sa, sb = gs[x], gs[y]
            u = len(sa | sb)
            jac[i] = (len(sa & sb) / u) if u else 0.0
        t = batch.append_column("jaccard", pa.array(jac, pa.float64()))
        return t.filter(
            pc.greater_equal(t["jaccard"], pa.scalar(jaccard_threshold))
        ).select(["a", "b", "jaccard"])

    return cand.map_batches(_verify, batch_format="pyarrow")


# ---------------------------------------------------------------------
# SimHash + fingerprinting + language ID (rows-only oracles)
# ---------------------------------------------------------------------

def simhash_fingerprints(docs: "ray.data.Dataset", n: int = 3) -> "ray.data.Dataset":
    """64-bit SimHash over char-n-gram features (Charikar 2002):
    sign-sum of per-feature hash bits. Deterministic; near-dup texts
    yield small Hamming distances."""

    def _sim(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        out = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            grams = [t[j : j + n] for j in range(len(t) - n + 1)] or [t]
            acc = np.zeros(64, dtype=np.int64)
            for g in grams:
                h = int.from_bytes(
                    hashlib.blake2b(g.encode(), digest_size=8).digest(), "little"
                )
                bits = (h >> np.arange(64, dtype=np.uint64)) & 1
                acc += np.where(bits.astype(bool), 1, -1)
            v = 0
            for bit in range(64):
                if acc[bit] > 0:
                    v |= 1 << bit
            out[i] = v - (1 << 64) if v >= (1 << 63) else v
        return pa.table({"doc_id": batch["doc_id"], "simhash": pa.array(out, pa.int64())})

    return docs.map_batches(_sim, batch_format="pyarrow")


def doc_fingerprints(docs: "ray.data.Dataset", kgram: int = 16, window: int = 8) -> "ray.data.Dataset":
    """Winnowed rolling-hash fingerprints per document (MOSS-style;
    stages/substring.py machinery applied to documents)."""
    from ..stages.substring import winnow_fingerprints

    nm = Normalizer(simple_alphabet())

    def _fp(batch: pa.Table) -> pa.Table:
        ids, fps = [], []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            f = winnow_fingerprints(nm.normalize(t), kgram, window)
            ids.append(d)
            fps.append(f)
        offsets = np.zeros(len(fps) + 1, dtype=np.int32)
        offsets[1:] = np.cumsum([len(f) for f in fps])
        flat = np.concatenate(fps) if fps else np.empty(0, dtype=np.uint64)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "fingerprints": pa.ListArray.from_arrays(
                    pa.array(offsets), pa.array(flat, pa.uint64())
                ),
                "n_fingerprints": pa.array([len(f) for f in fps], pa.int64()),
            }
        )

    return docs.map_batches(_fp, batch_format="pyarrow")


class LangId:
    """Actor: character/script + stopword n-gram heuristic language ID.

    State (per-actor, built once): profile tables. Rows-only oracle (the
    driver's weaker check) — accuracy is asserted in pytest against the
    table's own ``lang`` column instead."""

    PROFILES = {
        "en": {"the", "and", "of", "to", "a", "in", "is", "value", "table", "row"},
        "fr": {"le", "la", "les", "de", "et", "un", "une", "est", "pour"},
        "es": {"el", "la", "los", "de", "y", "un", "una", "es", "para"},
        "de": {"der", "die", "das", "und", "ein", "eine", "ist", "für", "von"},
    }

    def __init__(self):
        self.profiles = {k: frozenset(v) for k, v in self.PROFILES.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        preds = []
        for t in texts:
            # script check first: CJK codepoints dominate -> zh
            cjk = sum(1 for c in t[:200] if 0x4E00 <= ord(c) <= 0x9FFF)
            if cjk > len(t[:200]) * 0.2:
                preds.append("zh")
                continue
            toks = set(_WS.split(t.strip().lower())) if t.strip() else set()
            scores = {
                lang: len(toks & prof) for lang, prof in self.profiles.items()
            }
            best = max(sorted(scores), key=lambda k: scores[k])
            preds.append(best if scores[best] > 0 else "unknown")
        return pa.table(
            {"doc_id": batch["doc_id"], "pred_lang": pa.array(preds, pa.string())}
        )


def lang_id(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    return docs.select_columns(["doc_id", "text"]).map_batches(
        LangId, batch_format="pyarrow", concurrency=(1, 4)
    )


def lang_distribution(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """groupby on the real lang column (plain wide aggregate)."""
    return docs.groupby("lang").count()
