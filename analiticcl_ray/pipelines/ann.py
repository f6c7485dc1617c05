"""Similarity search over the ``embeddings`` table.

- ``cosine_topk``: brute-force cosine top-k — the exactness baseline.
  Query matrix broadcast once via ``ray.put``; each batch does one numpy
  matmul against it and emits only its local top-k per query (partial
  top-k combiner), so the final groupby touches k rows per (query,
  block), never the full score matrix.
- ``cosine_dup_pairs``: all pairs with cosine >= threshold
  (embedding-near-dup detection). Block-outer-product over broadcast
  normalized matrix — O(n^2) work distributed over blocks, no shuffle of
  the embedding column itself.
- ``lsh_bucketed_topk``: the scale path — random-hyperplane (SimHash)
  bucketing so each query only scores against its bucket ∪ probe
  buckets; recall measured against ``cosine_topk`` in tests.

Determinism note: results expose (query, neighbor, rank) ordered by
(cosine desc, vec_id asc); the cosine value itself is returned rounded
to 6 decimals (summation order across engines differs in the last ulp;
ranks and ids are the stable contract, and the DuckDB oracle compares
on those).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _emb_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
    emb = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
    return ids, emb


def cosine_topk(
    embeddings: "ray.data.Dataset",
    query_ids: list[int],
    k: int = 5,
) -> "ray.data.Dataset":
    """Exact top-k cosine neighbors for the given query vec_ids
    (self-matches excluded). Output: (query_id, neighbor_id, rank)."""
    # gather the (small) query matrix once
    qs: dict[int, np.ndarray] = {}
    qset = set(query_ids)
    for b in embeddings.iter_batches(batch_size=8192, batch_format="pyarrow"):
        ids, emb = _emb_matrix(b)
        for i, vid in enumerate(ids):
            if vid in qset:
                qs[int(vid)] = emb[i]
    q_ids = np.array(sorted(qs), dtype=np.int64)
    q_mat = _normalize_rows(np.stack([qs[i] for i in q_ids]))
    ref = ray.put((q_ids, q_mat))

    def _local_topk(batch: pa.Table) -> pa.Table:
        q_ids_, q_mat_ = ray.get(ref)
        ids, emb = _emb_matrix(batch)
        emb = _normalize_rows(emb)
        scores = q_mat_ @ emb.T  # (nq, nb)
        out = {"query_id": [], "neighbor_id": [], "cos": []}
        kk = min(k + 1, scores.shape[1])  # +1 in case self is in this block
        for qi in range(len(q_ids_)):
            row = scores[qi]
            idx = np.argpartition(-row, kk - 1)[:kk]
            # deterministic order: cos desc, vec_id asc
            idx = idx[np.lexsort((ids[idx], -row[idx]))]
            for j in idx:
                if ids[j] == q_ids_[qi]:
                    continue
                out["query_id"].append(int(q_ids_[qi]))
                out["neighbor_id"].append(int(ids[j]))
                out["cos"].append(float(row[j]))
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], pa.int64()),
                "neighbor_id": pa.array(out["neighbor_id"], pa.int64()),
                "cos": pa.array(out["cos"], pa.float64()),
            }
        )

    partials = embeddings.map_batches(_local_topk, batch_format="pyarrow")

    def _final(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["cos", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        return pd.DataFrame(
            {
                "query_id": g["query_id"].astype("int64"),
                "neighbor_id": g["neighbor_id"].astype("int64"),
                "rank": pd.Series(range(len(g)), dtype="int64"),
            }
        )

    return partials.groupby("query_id").map_groups(_final, batch_format="pandas")


def cosine_dup_pairs(
    embeddings: "ray.data.Dataset", threshold: float = 0.95
) -> "ray.data.Dataset":
    """All (a, b) with cosine >= threshold, a < b. The full normalized
    matrix is broadcast once (fits for side-matrix sizes; at 1e12 rows
    use lsh_bucketed variants); each block computes its block-vs-all
    slab."""
    mats = []
    idss = []
    for b in embeddings.iter_batches(batch_size=8192, batch_format="pyarrow"):
        ids, emb = _emb_matrix(b)
        idss.append(ids)
        mats.append(emb)
    all_ids = np.concatenate(idss)
    all_mat = _normalize_rows(np.concatenate(mats))
    order = np.argsort(all_ids)
    all_ids, all_mat = all_ids[order], all_mat[order]
    ref = ray.put((all_ids, all_mat))

    def _block(batch: pa.Table) -> pa.Table:
        aids, amat = _emb_matrix(batch)
        amat = _normalize_rows(amat)
        bids, bmat = ray.get(ref)
        scores = amat @ bmat.T
        out_a, out_b = [], []
        for i in range(len(aids)):
            hits = np.where(scores[i] >= threshold)[0]
            for j in hits:
                if aids[i] < bids[j]:
                    out_a.append(int(aids[i]))
                    out_b.append(int(bids[j]))
        return pa.table(
            {"a": pa.array(out_a, pa.int64()), "b": pa.array(out_b, pa.int64())}
        )

    return embeddings.map_batches(_block, batch_format="pyarrow")


def lsh_bucketed_topk(
    embeddings: "ray.data.Dataset",
    query_ids: list[int],
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 0x5EED,
) -> "ray.data.Dataset":
    """Approximate top-k: random-hyperplane LSH. Each vector lands in
    ``n_tables`` buckets (one per hash table); candidates = bucket
    co-occupants; exact cosine re-rank on candidates only. The bucket
    groupby carries only (bucket, vec_id) — embeddings never shuffle."""
    rng = np.random.default_rng(seed)
    dim = len(embeddings.take(1)[0]["embedding"])
    planes = rng.standard_normal((n_tables, n_planes, dim))
    planes_ref = ray.put(planes)
    qset = set(int(q) for q in query_ids)

    def _buckets(batch: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        ids, emb = _emb_matrix(batch)
        out_bucket, out_id = [], []
        for t in range(pl.shape[0]):
            bits = (emb @ pl[t].T) > 0  # (n, planes)
            codes = bits @ (1 << np.arange(pl.shape[1]))
            for i in range(len(ids)):
                out_bucket.append(int(t) << 32 | int(codes[i]))
                out_id.append(int(ids[i]))
        return pa.table(
            {
                "bucket": pa.array(out_bucket, pa.int64()),
                "vec_id": pa.array(out_id, pa.int64()),
            }
        )

    buckets = embeddings.map_batches(_buckets, batch_format="pyarrow")

    def _cands(group: pd.DataFrame) -> pd.DataFrame:
        ids = group["vec_id"].unique()
        qs = [i for i in ids if int(i) in qset]
        if not qs:
            return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                                 "cand_id": pd.Series([], dtype="int64")})
        rows_q, rows_c = [], []
        for q in qs:
            for c in ids:
                if c != q:
                    rows_q.append(int(q))
                    rows_c.append(int(c))
        return pd.DataFrame({"query_id": pd.Series(rows_q, dtype="int64"),
                             "cand_id": pd.Series(rows_c, dtype="int64")})

    cands = (
        buckets.groupby("bucket")
        .map_groups(_cands, batch_format="pandas")
        .groupby(["query_id", "cand_id"])
        .map_groups(lambda g: g.head(1), batch_format="pandas")
    )

    # exact re-rank: broadcast the embedding lookup (ids are few)
    emb_lookup: dict[int, np.ndarray] = {}
    for b in embeddings.iter_batches(batch_size=8192, batch_format="pyarrow"):
        ids, emb = _emb_matrix(b)
        emb = _normalize_rows(emb)
        for i, vid in enumerate(ids):
            emb_lookup[int(vid)] = emb[i]
    lut_ref = ray.put(emb_lookup)

    def _rerank(group: pd.DataFrame) -> pd.DataFrame:
        lut = ray.get(lut_ref)
        q = int(group["query_id"].iloc[0])
        qv = lut[q]
        cand_ids = group["cand_id"].astype("int64").tolist()
        cos = np.array([float(qv @ lut[c]) for c in cand_ids])
        order = np.lexsort((cand_ids, -cos))[:k]
        return pd.DataFrame(
            {
                "query_id": pd.Series([q] * len(order), dtype="int64"),
                "neighbor_id": pd.Series([cand_ids[i] for i in order], dtype="int64"),
                "rank": pd.Series(range(len(order)), dtype="int64"),
            }
        )

    return cands.groupby("query_id").map_groups(_rerank, batch_format="pandas")
