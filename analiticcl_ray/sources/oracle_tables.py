"""Locally-computed (no-Ray) multimodal oracle tables.

The multimodal tiers' decode step can never be expressed in SQL, but
everything DOWNSTREAM of the per-row hash/feature columns — band
slicing, bucket self-joins, hamming via bit_count(xor), frame→video
aggregation, the incremental new/ref restriction — can (VERDICT r3
item 1). This module is the handoff point: it recomputes every
deterministic per-row column with the SAME pure-numpy kernels the Ray
actor pools use, but in a single local process reading the corpus
parquet directly, and persists the result as one parquet file under
``/tmp/analiticcl_ray/oracle/``. The driver's DuckDB oracles then
``read_parquet()`` these tables and rebuild the pair combinatorics in
SQL, so a hash-green result certifies BOTH that the distributed decode
equals the single-process decode (two different execution paths over
the same kernels) AND that the banded/incremental pair logic equals
the brute-force SQL definition.

Everything here is seeded/deterministic; tables are cached by
(n_rows, seed, kernel-source fingerprint) with an atomic tmp+rename
write — the fingerprint (``_src_tag``) auto-invalidates the cache when
any contributing kernel or generator module changes, so a later round's
kernel edit can never pit a stale handoff table against a fresh Ray
side. No Ray imports — oracle_sql()
must be able to build these without touching the cluster.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pds
import pyarrow.parquet as pq

ORACLE_ROOT = "/tmp/analiticcl_ray/oracle"


def _src_tag(*modules) -> str:
    """8-hex fingerprint of the given modules' SOURCE FILES, baked into
    every cache filename: a kernel edit in a later sitting/round then
    misses the cache automatically instead of serving handoff tables
    computed by the OLD kernel against a Ray side running the NEW one
    (which would fail the driver's hash gate for a non-bug reason).
    The corpus generators get the same treatment — they feed both
    sides' inputs."""
    import hashlib
    import inspect

    h = hashlib.md5()
    for m in modules:
        with open(inspect.getsourcefile(m), "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:8]


def _write_atomic(table: pa.Table, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)


def image_oracle_path(n_rows: int, seed: int = 42) -> str:
    """(image_id, phash, dhash, ahash, mean, std, sharpness, entropy,
    saturated_frac, gray_mean, gray_std) — one row per corpus image,
    decoded locally with image/codec.py's kernels (the exact functions
    ImageHashes / ImageFeatures / ImageQuality run per batch)."""
    from . import corpus as _corpus_mod
    from ..image import codec as _icodec, jpeg as _ijpeg

    tag = _src_tag(_icodec, _ijpeg, _corpus_mod)
    path = os.path.join(
        ORACLE_ROOT, f"image_n{n_rows}_s{seed}_{tag}.parquet"
    )
    if os.path.exists(path):
        return path
    from .corpus import corpus_path
    from ..image.codec import (
        ahash64,
        decode,
        dhash64,
        image_quality_one,
        phash64,
        to_gray,
    )

    tab = pds.dataset(corpus_path(n_rows, seed)).to_table(
        columns=["image_id", "bytes", "fmt"]
    )
    n = len(tab)
    ph = np.empty(n, np.int64)
    dh = np.empty(n, np.int64)
    ah = np.empty(n, np.int64)
    mean = np.empty(n, np.float64)
    std = np.empty(n, np.float64)
    qcols = {
        k: np.empty(n, np.float64)
        for k in ("sharpness", "entropy", "saturated_frac", "gray_mean", "gray_std")
    }
    for i, (data, fmt) in enumerate(
        zip(tab["bytes"].to_pylist(), tab["fmt"].to_pylist())
    ):
        px = decode(data, fmt)
        g = to_gray(px)
        ph[i] = phash64(px)
        dh[i] = dhash64(px)
        ah[i] = ahash64(px)
        mean[i] = float(g.mean())
        std[i] = float(g.std())
        q = image_quality_one(px)
        for k, arr in qcols.items():
            arr[i] = q[k]
    _write_atomic(
        pa.table(
            {
                "image_id": tab["image_id"],
                "phash": pa.array(ph, pa.int64()),
                "dhash": pa.array(dh, pa.int64()),
                "ahash": pa.array(ah, pa.int64()),
                "mean": pa.array(mean, pa.float64()),
                "std": pa.array(std, pa.float64()),
            }
            | {k: pa.array(v, pa.float64()) for k, v in qcols.items()}
        ),
        path,
    )
    return path


def audio_oracle_path(n_rows: int, seed: int = 42) -> str:
    """(audio_id, duration_s, rms, zcr, centroid_hz, fp64,
    clipping_frac, silence_frac, crest_db, dc_offset) — one row per
    clip, decoded locally with audio/codec.py's kernels (exactly what
    AudioFeatures / AudioQuality run per batch)."""
    from . import audio_corpus as _acorpus_mod
    from ..audio import codec as _acodec

    tag = _src_tag(_acodec, _acorpus_mod)
    path = os.path.join(
        ORACLE_ROOT, f"audio_n{n_rows}_s{seed}_{tag}.parquet"
    )
    if os.path.exists(path):
        return path
    from .audio_corpus import audio_corpus_path
    from ..audio.codec import audio_features_one, audio_quality_one, decode

    tab = pds.dataset(audio_corpus_path(n_rows, seed)).to_table(
        columns=["audio_id", "bytes", "fmt"]
    )
    n = len(tab)
    fcols = {
        k: np.empty(n, np.float64)
        for k in ("duration_s", "rms", "zcr", "centroid_hz")
    }
    fp = np.empty(n, np.int64)
    qcols = {
        k: np.empty(n, np.float64)
        for k in ("clipping_frac", "silence_frac", "crest_db", "dc_offset")
    }
    for i, (data, fmt) in enumerate(
        zip(tab["bytes"].to_pylist(), tab["fmt"].to_pylist())
    ):
        x, sr = decode(data, fmt)
        f = audio_features_one(x, sr)
        for k, arr in fcols.items():
            arr[i] = f[k]
        fp[i] = f["fp64"]
        q = audio_quality_one(x, sr)
        for k, arr in qcols.items():
            arr[i] = q[k]
    _write_atomic(
        pa.table(
            {"audio_id": tab["audio_id"]}
            | {k: pa.array(v, pa.float64()) for k, v in fcols.items()}
            | {"fp64": pa.array(fp, pa.int64())}
            | {k: pa.array(v, pa.float64()) for k, v in qcols.items()}
        ),
        path,
    )
    return path


def video_oracle_path(n_videos: int, seed: int = 42) -> str:
    """(video_id, frame_idx, dhash) — one row per frame, decoded
    locally with video_decode (rawv1 / lossy mjpg1) + dhash64
    (exactly what VideoFrameHashes runs per batch)."""
    from . import video_corpus as _vcorpus_mod
    from ..image import codec as _icodec, jpeg as _ijpeg
    from ..stages import multimodal as _mm_mod

    tag = _src_tag(_icodec, _ijpeg, _mm_mod, _vcorpus_mod)
    path = os.path.join(
        ORACLE_ROOT, f"video_n{n_videos}_s{seed}_{tag}.parquet"
    )
    if os.path.exists(path):
        return path
    from .video_corpus import video_corpus_path
    from ..image.codec import dhash64
    from ..stages.multimodal import video_decode

    tab = pds.dataset(video_corpus_path(n_videos, seed)).to_table(
        columns=["video_id", "bytes", "fmt"]
    )
    vids: list = []
    idxs: list = []
    hashes: list = []
    for vid, data, fmt in zip(
        tab["video_id"].to_pylist(),
        tab["bytes"].to_pylist(),
        tab["fmt"].to_pylist(),
    ):
        frames = video_decode(data, fmt)
        for fi in range(len(frames)):
            vids.append(vid)
            idxs.append(fi)
            hashes.append(dhash64(frames[fi]))
    _write_atomic(
        pa.table(
            {
                "video_id": pa.array(vids, pa.string()),
                "frame_idx": pa.array(idxs, pa.int64()),
                "dhash": pa.array(hashes, pa.int64()),
            }
        ),
        path,
    )
    return path
