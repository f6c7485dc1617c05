"""LSH banding: the shuffle that *is* the index.

analiticcl's primary AnaIndex (anahash -> instances, src/index.rs:5-12)
and its deletion-neighborhood candidate search (find_nearest_anahashes,
src/lib.rs:1143-1308) are replaced by an explicit groupby exchange on
LSH band keys (SURVEY.md T3/J1): rows sharing any caption-MinHash band
or any phash bit-slice band become candidate pairs, later confirmed by
the exact verify kernel. Recall vs the reference's guaranteed-complete
neighborhood search is a measured target (>=0.99, BASELINE.json).

Skew handling (north rule): a boilerplate caption puts thousands of ids
into one band bucket -> O(n^2) pair blowup. Buckets larger than
``bucket_cap`` are *salted*: ids are sorted (determinism) and chunked;
all pairs are emitted within a chunk plus a single chain link between
consecutive chunks — connectivity for connected components is fully
preserved (any two rows in the bucket stay linked through the chain)
while the pair count drops from O(n^2) to O(n * cap). Capped bucket
counts are reported in the stage metrics — no silent truncation.

Scale note: only (band_key, image_id) ever enters this shuffle — the
binary image column is projected away up front (project-before-shuffle,
SURVEY.md §4.2).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def explode_band_rows(ds: "ray.data.Dataset", band_cols=("bands", "phash_bands")) -> "ray.data.Dataset":
    """(image_id, bands[, phash_bands]) -> long table (band, image_id).

    Stateless task stage; output is the ONLY thing the wide groupby sees."""

    def _explode(batch: pa.Table) -> pa.Table:
        ids = batch["image_id"]
        parts_band = []
        parts_id = []
        for col in band_cols:
            if col not in batch.column_names:
                continue
            arr = batch[col].combine_chunks()
            width = arr.type.list_size
            flat = arr.flatten()
            parts_band.append(flat)
            # repeat each id `width` times
            idx = np.repeat(np.arange(len(batch), dtype=np.int64), width)
            parts_id.append(ids.take(pa.array(idx)))
        return pa.table(
            {
                "band": pa.concat_arrays([p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p for p in parts_band]),
                "image_id": pa.concat_arrays([p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p for p in parts_id]),
            }
        )

    return ds.map_batches(_explode, batch_format="pyarrow")


def emit_bucket_pairs(ids: list[str], cap: int) -> tuple[list[str], list[str], bool]:
    """Pairs for one bucket, with deterministic salting above ``cap``.
    Returns (src list, dst list, was_capped)."""
    ids = sorted(set(ids))
    n = len(ids)
    if n < 2:
        return [], [], False
    src: list[str] = []
    dst: list[str] = []
    capped = n > cap
    for c0 in range(0, n, cap):
        chunk = ids[c0 : c0 + cap]
        for i in range(len(chunk)):
            for j in range(i + 1, len(chunk)):
                src.append(chunk[i])
                dst.append(chunk[j])
        if c0 + cap < n:  # chain link keeps the bucket connected
            src.append(chunk[0])
            dst.append(ids[c0 + cap])
    return src, dst, capped


def candidate_pairs(
    band_rows: "ray.data.Dataset", bucket_cap: int = 256
) -> "ray.data.Dataset":
    """groupby(band) -> canonical candidate pairs (src_id < dst_id).

    The ``capped`` column marks pairs from salted buckets so the metrics
    stage can count affected buckets (no silent caps)."""

    def _pairs(group: pd.DataFrame) -> pd.DataFrame:
        src, dst, capped = emit_bucket_pairs(group["image_id"].tolist(), bucket_cap)
        return pd.DataFrame(
            {
                "src_id": pd.Series(src, dtype="string[python]").astype(object),
                "dst_id": pd.Series(dst, dtype="string[python]").astype(object),
                "capped": pd.Series(np.full(len(src), capped), dtype=bool),
            }
        )

    return band_rows.groupby("band").map_groups(_pairs, batch_format="pandas")


def dedup_pairs(pairs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Canonical-pair dedup after the union of candidate sources
    (MinHash ∪ SimHash ∪ substring ∪ exact), the distributed analog of
    the reference's BTreeSet/dedup_by_key (src/lib.rs:1149, 1530-1533).

    Two-level: a *partial* per-batch dedup (cheap, shrinks the shuffle)
    then the exact groupby."""

    def _local(batch: pa.Table) -> pa.Table:
        df = batch.select(["src_id", "dst_id", "capped"]).to_pandas()
        df = df.sort_values("capped").drop_duplicates(["src_id", "dst_id"], keep="first")
        return pa.Table.from_pandas(df, preserve_index=False)

    local = pairs.map_batches(_local, batch_format="pyarrow")
    return local.groupby(["src_id", "dst_id"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


def exact_dup_pairs(ds: "ray.data.Dataset", bucket_cap: int = 256) -> "ray.data.Dataset":
    """Exact content duplicates via content_key groupby (vocab-upsert
    analog A3/D4, src/lib.rs:899-967): pairs linking identical
    (caption, bytes) rows. Chain-linked above the cap like any bucket."""

    def _pairs(group: pd.DataFrame) -> pd.DataFrame:
        src, dst, capped = emit_bucket_pairs(group["image_id"].tolist(), bucket_cap)
        return pd.DataFrame(
            {
                "src_id": pd.Series(src, dtype="string[python]").astype(object),
                "dst_id": pd.Series(dst, dtype="string[python]").astype(object),
                "capped": pd.Series(np.full(len(src), capped), dtype=bool),
            }
        )

    return (
        ds.select_columns(["content_key", "image_id"])
        .groupby("content_key")
        .map_groups(_pairs, batch_format="pandas")
    )
