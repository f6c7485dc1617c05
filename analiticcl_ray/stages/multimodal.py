"""Multimodal actor-pool stages over opaque binary columns.

The corpus treats images (and, by extension, audio/video) as opaque
``binary`` columns with typed metadata (w/h/fmt) — the input_hint
schema. Each stage here is a callable CLASS for
``map_batches(Cls, concurrency=N)``: decode state (DCT matrix, pixel
cache) lives in ``__init__`` once per actor; ``__call__`` transforms
one Arrow batch. Bytes stay out of every shuffle — these are straight
per-row map stages placed BEFORE any wide operation.

Real vs stubbed (task brief: make the plumbing real, stub missing
codecs honestly):
- PNG decode, area resize, gray features, phash: REAL (pure numpy,
  image/codec.py).
- JPEG decode: REAL baseline codec (pure numpy ITU-T T.81 subset,
  image/jpeg.py); progressive/subsampled streams raise
  NotImplementedError.
- video frame handling: no inter-frame codec library exists in this
  container, so mp4/webm raise a clearly-marked NotImplementedError;
  the deterministic ``rawv1`` raw container AND the genuinely lossy
  ``mjpg1`` (per-frame baseline JPEG via image/jpeg.py, round 4)
  exercise the full Ray-side plumbing — schema, actor signature,
  per-frame explode — on real and really-degraded bytes.

Batch-size guidance: binary payloads are wide — pair these stages with
small ``batch_size`` (64-256) so batch × concurrency fits the worker
heap (SURVEY.md §4.2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..image.codec import (
    ahash64,
    decode,
    dhash64,
    phash64,
    png_encode,
    to_gray,
    _resize_mean,
)


class ImageResizer:
    """Actor: decode -> area resize to ``size``x``size`` -> re-encode
    PNG. Emits (image_id, bytes, w, h, fmt) at the new geometry —
    the standard normalization step before model inference."""

    def __init__(self, size: int = 64):
        self.size = size

    def __call__(self, batch: pa.Table) -> pa.Table:
        size = self.size
        out_bytes = []
        for data, fmt in zip(
            batch["bytes"].to_pylist(), batch["fmt"].to_pylist()
        ):
            px = decode(data, fmt)
            if px.ndim == 2:
                small = _resize_mean(px.astype(np.float64), size)
                resized = np.clip(np.rint(small), 0, 255).astype(np.uint8)
            else:
                chans = [
                    _resize_mean(px[..., c].astype(np.float64), size)
                    for c in range(px.shape[2])
                ]
                resized = np.clip(
                    np.rint(np.stack(chans, axis=-1)), 0, 255
                ).astype(np.uint8)
            out_bytes.append(png_encode(resized))
        n = len(out_bytes)
        return pa.table(
            {
                "image_id": batch["image_id"],
                "bytes": pa.array(out_bytes, pa.binary()),
                "w": pa.array(np.full(n, size, dtype=np.int32), pa.int32()),
                "h": pa.array(np.full(n, size, dtype=np.int32), pa.int32()),
                "fmt": pa.array(["png"] * n, pa.string()),
            }
        )


class ImageFeatures:
    """Actor: decode -> grayscale stats + 64-bit DCT phash. Emits
    (image_id, phash, mean, std) — the feature-extraction stage the
    dedup pipeline's SimHash bands and any downstream model consume."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        phashes = np.empty(len(batch), dtype=np.int64)
        means = np.empty(len(batch), dtype=np.float64)
        stds = np.empty(len(batch), dtype=np.float64)
        for i, (data, fmt) in enumerate(
            zip(batch["bytes"].to_pylist(), batch["fmt"].to_pylist())
        ):
            px = decode(data, fmt)
            g = to_gray(px)
            phashes[i] = phash64(px)
            means[i] = float(g.mean())
            stds[i] = float(g.std())
        return pa.table(
            {
                "image_id": batch["image_id"],
                "phash": pa.array(phashes, pa.int64()),
                "mean": pa.array(means, pa.float64()),
                "std": pa.array(stds, pa.float64()),
            }
        )


class ImageHashes:
    """Actor: decode once -> all three 64-bit perceptual hashes
    (DCT phash, gradient dhash, average ahash). One decode amortizes
    across the three hash kernels — the multi-signature stage an
    image-dedup tier runs before banding."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        ph = np.empty(n, dtype=np.int64)
        dh = np.empty(n, dtype=np.int64)
        ah = np.empty(n, dtype=np.int64)
        for i, (data, fmt) in enumerate(
            zip(batch["bytes"].to_pylist(), batch["fmt"].to_pylist())
        ):
            px = decode(data, fmt)
            ph[i] = phash64(px)
            dh[i] = dhash64(px)
            ah[i] = ahash64(px)
        return pa.table(
            {
                "image_id": batch["image_id"],
                "phash": pa.array(ph, pa.int64()),
                "dhash": pa.array(dh, pa.int64()),
                "ahash": pa.array(ah, pa.int64()),
            }
        )


class ImageQuality:
    """Actor: decode -> per-image quality signals (sharpness, entropy,
    saturation, exposure — image/codec.py:image_quality_one), the
    image analog of text.py's quality_signals. Emits (image_id,
    sharpness, entropy, saturated_frac, gray_mean, gray_std)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..image.codec import image_quality_one

        n = len(batch)
        cols = {
            k: np.empty(n, dtype=np.float64)
            for k in (
                "sharpness", "entropy", "saturated_frac",
                "gray_mean", "gray_std",
            )
        }
        for i, (data, fmt) in enumerate(
            zip(batch["bytes"].to_pylist(), batch["fmt"].to_pylist())
        ):
            q = image_quality_one(decode(data, fmt))
            for k, arr in cols.items():
                arr[i] = q[k]
        return pa.table(
            {"image_id": batch["image_id"]}
            | {k: pa.array(v, pa.float64()) for k, v in cols.items()}
        )


def image_quality_signals(
    corpus: "ray.data.Dataset", concurrency=(1, 8), batch_size: int = 128
) -> "ray.data.Dataset":
    return corpus.select_columns(["image_id", "bytes", "fmt"]).map_batches(
        ImageQuality, batch_format="pyarrow",
        concurrency=concurrency, batch_size=batch_size,
    )


def image_quality_filter(
    corpus: "ray.data.Dataset",
    min_sharpness: float = 1.0,
    min_entropy: float = 1.0,
    max_saturated: float = 0.5,
    concurrency=(1, 8),
    batch_size: int = 128,
) -> "ray.data.Dataset":
    """Keep-list of image ids passing the quality gates — the decision
    stage a training-data pipeline runs before spending tokens on a
    caption model. Thresholds follow the text quality_filter shape:
    conservative defaults, every gate a parameter."""
    sig = image_quality_signals(corpus, concurrency, batch_size)

    def _keep(t: pa.Table) -> pa.Table:
        m = (
            (t["sharpness"].to_numpy(zero_copy_only=False) >= min_sharpness)
            & (t["entropy"].to_numpy(zero_copy_only=False) >= min_entropy)
            & (
                t["saturated_frac"].to_numpy(zero_copy_only=False)
                <= max_saturated
            )
        )
        return pa.table({"image_id": t["image_id"].filter(pa.array(m))})

    return sig.map_batches(_keep, batch_format="pyarrow")


# --- video: real containers + honest codec stubs ----------------------
#
# rawv1 is the deterministic raw container; mjpg1 (round 4) is a REAL
# lossy path — Motion-JPEG-style: every frame an independent baseline
# JPEG from the in-repo pure-numpy codec (image/jpeg.py, public ITU-T
# T.81 subset), ~32 dB PSNR at quality 90 on the synthetic frames, so
# the video tier's per-frame dHash robustness is exercised on
# actually-degraded bytes the way the image tier's PSNR rule is.
# Inter-frame codecs (mp4/webm) remain honest NotImplementedError
# stubs — no pure-numpy motion-compensated decoder is feasible here.

RAWV_MAGIC = b"RAWV1\x00"
MJPG_MAGIC = b"MJPG1\x00"


def mjpg_encode(frames: np.ndarray, quality: int = 90) -> bytes:
    """(n, h, w, c) uint8 frames -> mjpg1 container: magic + n +
    per-frame (length, baseline-JPEG bytes). Genuinely lossy."""
    from ..image.jpeg import jpeg_encode

    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    parts = [MJPG_MAGIC + np.array([len(frames)], np.uint32).tobytes()]
    for f in frames:
        b = jpeg_encode(f, quality)
        parts.append(np.array([len(b)], np.uint32).tobytes())
        parts.append(b)
    return b"".join(parts)


def mjpg_decode(data: bytes) -> np.ndarray:
    """mjpg1 bytes -> (n, h, w, c) uint8 (frames must share one
    geometry, as in any video stream)."""
    from ..image.jpeg import jpeg_decode

    if not data.startswith(MJPG_MAGIC):
        raise ValueError("not a mjpg1 container")
    off = len(MJPG_MAGIC)
    if off + 4 > len(data):
        raise ValueError("truncated mjpg1 container")
    (n,) = np.frombuffer(data[off : off + 4], np.uint32)
    off += 4
    frames = []
    for _ in range(int(n)):
        # bounds-check the header-declared counts against the actual
        # payload (ADVICE r4): a truncated container must fail cleanly
        # here, like mulaw_decode, not as a confusing downstream
        # jpeg_decode/np.frombuffer error
        if off + 4 > len(data):
            raise ValueError("truncated mjpg1 container")
        (ln,) = np.frombuffer(data[off : off + 4], np.uint32)
        off += 4
        if off + int(ln) > len(data):
            raise ValueError("truncated mjpg1 container")
        px = jpeg_decode(data[off : off + int(ln)])
        if px.ndim == 2:  # grayscale stream: normalize to (h, w, 1)
            px = px[..., None]
        frames.append(px)
        off += int(ln)
    if not frames:
        raise ValueError("empty mjpg1 container")
    return np.stack(frames)


def video_decode(data: bytes, fmt: str) -> np.ndarray:
    """Dispatch on fmt -> (n, h, w, c) uint8 frames. rawv1 and the
    lossy mjpg1 are real; inter-frame codecs are honest stubs."""
    if fmt == "rawv1":
        return rawv_decode(data)
    if fmt == "mjpg1":
        return mjpg_decode(data)
    raise NotImplementedError(
        f"video codec {fmt!r} requires a decoder library not present in "
        "this container; plug one in here (pyav / decord) — every "
        "downstream stage takes (n, h, w, c) frames and is codec-agnostic."
    )


def rawv_encode(frames: np.ndarray) -> bytes:
    """Deterministic fake video container: magic + (n, h, w, c) header
    + raw uint8 frames. Lets tests exercise the frame-sampling stage
    without a codec library."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w, c = frames.shape
    header = RAWV_MAGIC + np.array([n, h, w, c], dtype=np.uint32).tobytes()
    return header + frames.tobytes()


def rawv_decode(data: bytes) -> np.ndarray:
    if not data.startswith(RAWV_MAGIC):
        raise ValueError("not a rawv1 container")
    n, h, w, c = np.frombuffer(data[len(RAWV_MAGIC) : len(RAWV_MAGIC) + 16], np.uint32)
    return np.frombuffer(
        data[len(RAWV_MAGIC) + 16 :], np.uint8
    ).reshape(int(n), int(h), int(w), int(c))


class FrameSampler:
    """Actor: sample every ``stride``-th frame from a video binary
    column and emit one PNG row per kept frame (video_id, frame_idx,
    bytes, w, h, fmt) — the flat_map-shaped stage that turns a video
    table into an image table for the dedup pipeline.

    ``rawv1`` and the lossy ``mjpg1`` decode for real (video_decode);
    inter-frame codecs (mp4/webm/...) raise NotImplementedError at the
    decode call — the Ray-side plumbing is identical either way."""

    def __init__(self, stride: int = 2):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids: list[str] = []
        idxs: list[int] = []
        blobs: list[bytes] = []
        ws: list[int] = []
        hs: list[int] = []
        for vid, data, fmt in zip(
            batch["video_id"].to_pylist(),
            batch["bytes"].to_pylist(),
            batch["fmt"].to_pylist(),
        ):
            frames = video_decode(data, fmt)
            for fi in range(0, len(frames), self.stride):
                vids.append(vid)
                idxs.append(fi)
                blobs.append(png_encode(frames[fi]))
                hs.append(frames.shape[1])
                ws.append(frames.shape[2])
        return pa.table(
            {
                "video_id": pa.array(vids, pa.string()),
                "frame_idx": pa.array(idxs, pa.int64()),
                "bytes": pa.array(blobs, pa.binary()),
                "w": pa.array(ws, pa.int32()),
                "h": pa.array(hs, pa.int32()),
                "fmt": pa.array(["png"] * len(vids), pa.string()),
            }
        )


def resize_images(
    corpus: "ray.data.Dataset", size: int = 64, concurrency=(1, 8),
    batch_size: int = 128,
) -> "ray.data.Dataset":
    return corpus.select_columns(["image_id", "bytes", "fmt"]).map_batches(
        ImageResizer, fn_constructor_args=(size,), batch_format="pyarrow",
        concurrency=concurrency, batch_size=batch_size,
    )


def image_features(
    corpus: "ray.data.Dataset", concurrency=(1, 8), batch_size: int = 128
) -> "ray.data.Dataset":
    return corpus.select_columns(["image_id", "bytes", "fmt"]).map_batches(
        ImageFeatures, batch_format="pyarrow",
        concurrency=concurrency, batch_size=batch_size,
    )


def image_hashes(
    corpus: "ray.data.Dataset", concurrency=(1, 8), batch_size: int = 128
) -> "ray.data.Dataset":
    """(image_id, phash, dhash, ahash) per image — decode once per row
    in an actor pool, bytes never leave the map stage."""
    return corpus.select_columns(["image_id", "bytes", "fmt"]).map_batches(
        ImageHashes, batch_format="pyarrow",
        concurrency=concurrency, batch_size=batch_size,
    )


def banded_hash_dup_pairs(
    hashes: "ray.data.Dataset",
    id_col: str,
    hash_col: str,
    max_hamming: int = 3,
    bands: int = 4,
    cap: int = 256,
    stats: dict = None,
) -> "ray.data.Dataset":
    """Near-dup pairs by banded 64-bit hash hamming over a slim
    (id, hash) table — shared skeleton of the image and audio tiers
    (same pigeonhole argument as simhash_dup_pairs): slice the hash
    into ``bands`` 16-bit band keys (COMPLETE for
    ``max_hamming < bands``), then ONE cogrouped shuffle of (band, id,
    hash) rows whose in-bucket emission computes the EXACT 64-bit
    hamming (the full hashes ride the band rows) and filters at
    ``max_hamming`` — including the salted-chunk chain links, so the
    pair set is identical to the former emit → slim-attach → re-verify
    chain while skipping that chain's extra materialize + lookup
    stages entirely (round 4; lsh.cooccurrence_hamming_pairs). A pair
    duplicated across bands carries the same hamming (one hash per
    id), so the trailing dedup_pairs keeps any copy. Output: distinct
    (src_id, dst_id, hamming), src < dst. Shuffle volume is bands x
    rows of (u64, id, i64); nothing else moves."""
    from .lsh import (
        cooccurrence_hamming_pairs,
        dedup_pairs,
        explode_band_rows,
    )
    from .signatures import hash_band_table

    banded = hashes.map_batches(
        lambda t: hash_band_table(t, hash_col, bands),
        batch_format="pyarrow",
    )
    rows = explode_band_rows(
        banded, band_cols=(f"{hash_col}_bands",), id_col=id_col,
        carry_cols=(hash_col,),
    )
    cand = cooccurrence_hamming_pairs(
        rows, "band", id_col, hash_col, max_hamming, cap, stats=stats
    )
    return dedup_pairs(cand).select_columns(["src_id", "dst_id", "hamming"])


def incremental_banded_dup_pairs(
    new_hashes: "ray.data.Dataset",
    ref_hashes: "ray.data.Dataset",
    id_col: str,
    hash_col: str,
    max_hamming: int = 3,
    bands: int = 4,
    cap: int = 256,
    stats: dict = None,
    local_probe_limit: int = 2_000_000,
) -> "ray.data.Dataset":
    """Asymmetric (probe-vs-index) banded near-dup join — the daily-
    ingest shape: match a NEW shard's hashes against itself and against
    an existing REFERENCE hash table without ever re-pairing the
    reference against itself. Both sides band-explode with an int8
    ``side`` flag and meet in ONE hash-bucket cogroup; per surviving
    band key (>=2 rows AND >=1 new row — ref-only keys are skipped
    vectorized, which is the asymmetry win: at steady state ref >> new
    and almost every bucket is ref-only) the emission is the new x new
    triangle plus the new x ref cross, with the EXACT 64-bit hamming
    computed and filtered in-bucket (the full hashes ride the band
    rows, so no downstream attach or re-verify exists). Output:
    distinct (src_id, dst_id, hamming) where src is always NEW and dst
    is new (src < dst) or ref — never ref x ref.

    Cap semantics: a band-key group larger than ``cap`` keeps all new
    rows and the id-ordered prefix of ref rows up to ``cap`` total
    (new x new evidence is never sacrificed for ref fill); dropped ref
    rows are reported through the globally-unique sentinel mechanism
    (stages/lsh.py) into ``stats['dropped_rows']`` — no silent caps.
    Ref rows carry only (id, hash): the reference corpus bytes are
    never read, so an incremental run costs decode(new) + one band
    shuffle over new+ref slim rows.

    Re-ingest overlap: an id present in BOTH tables (a retried or
    overlapping shard) is SUPERSEDED — its stale ref copy is
    anti-joined out before banding, so it never self-pairs, never emits
    reversed-orientation duplicates from stale band buckets, and every
    pair involving it is generated and verified against its NEW (probe)
    hash. Lossless in the pigeonhole-complete regime (max_hamming <
    bands): any pair that verifies under the resolved hashes shares a
    band via the new-side rows.

    Stage shape (round 4 — fused so the incremental op beats full
    recompute at bench scale, not just asymptotically): ONE driver pull
    over the (caller-materialized) probe shard yields both the new-id
    broadcast AND the probe band-key broadcast (band keys recomputed
    locally on the pulled hashes — a vectorized pass over the shard, so
    the banded probe rows never need their own materialize), and the
    whole ref side — supersession anti-join, banding, explode,
    probe-key collision filter — is ONE fused map_batches with exactly
    one consumer (the band shuffle; the verify union that used to
    consume the ref side a second time is gone — ADVICE r3's
    double-consumption finding is resolved by eliminating the second
    consumer, not by materializing).

    Memory contract: the (id, hash) driver pull is O(|shard|) in ALL
    regimes — that slim pull is the op's premise (same class as the
    unavoidable new-id broadcast). ``local_probe_limit`` bounds only
    the ×``bands`` LOCAL explode of those rows; past it the explode
    runs distributed, fed from the already-pulled shard so the probe
    upstream (decode pool) still executes exactly once."""
    import pandas as pd
    import pyarrow.compute as pc

    from .lsh import (
        DROPPED_SENTINEL,
        bucket_by_keys,
        dedup_pairs,
        emit_bucket_pairs_attr,
        strip_sentinels,
        tally_sentinels,
    )
    from .signatures import hash_band_table
    from ..image.codec import hamming64

    # slim both sides up front: the band shuffle needs only (id, hash)
    # — callers may hand over wider persisted tables (e.g. the full
    # image_hashes output with all three hash columns)
    new_hashes = new_hashes.select_columns([id_col, hash_col])
    ref_hashes = ref_hashes.select_columns([id_col, hash_col])

    # ONE streaming driver pull over the probe shard — the only time
    # the new side's upstream (typically the decode actor pool)
    # executes. It yields, in the same pass: the new-id broadcast (ref
    # supersession + the self-pair guard), the probe band-key broadcast
    # (the ref-side pre-shuffle semi-join), and the banded probe rows
    # themselves, exploded LOCALLY (a vectorized numpy pass over the
    # shard) and re-entered as pre-sliced object-store blocks via
    # ray.data.from_arrow — so the probe side costs NO materialize
    # barrier and NO second execution. All of this is bounded by the
    # ingest shard (bands x |new| slim rows; same class as dedup.py's
    # needed_ids) — the op's documented premise. A shard too large to
    # hold driver-side would swap this pull for the distributed Bloom
    # semi-join of text.incremental_dedup and the round-3 distributed
    # explode+materialize shape.
    id_parts: list = []
    hash_parts: list = []
    for b in new_hashes.iter_batches(batch_size=65536, batch_format="pyarrow"):
        id_parts.append(b[id_col].combine_chunks())
        hash_parts.append(b[hash_col].combine_chunks())

    def _cat(parts, typ):
        return (
            pa.concat_arrays(
                [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
                 for a in parts]
            )
            if parts
            else pa.array([], typ)
        )

    new_id_arr = _cat(id_parts, pa.string())
    local = pa.table({id_col: new_id_arr, hash_col: _cat(hash_parts, pa.int64())})
    new_id_ref = ray.put(new_id_arr)

    def _anti(batch: pa.Table) -> pa.Table:
        # supersession: an id present in BOTH tables keeps only its NEW
        # (probe) hash — the stale ref copy is anti-joined out BEFORE
        # banding. In the pigeonhole-complete regime (max_hamming <
        # bands) this is lossless: every pair that verifies under the
        # resolved hashes shares a band via the new-side rows, and the
        # stale rows could only produce duplicate-orientation candidates
        # or verify-rejected ones while eating per-band cap budget.
        seen = ray.get(new_id_ref)
        if len(seen) == 0:
            return batch
        return batch.filter(
            pc.invert(pc.is_in(batch[id_col], value_set=seen))
        )

    def _band_explode(t: pa.Table, side: int) -> pa.Table:
        banded = hash_band_table(t, hash_col, bands)[
            f"{hash_col}_bands"
        ].combine_chunks()
        width = banded.type.list_size
        idx = pa.array(np.repeat(np.arange(len(t), dtype=np.int64), width))
        n_rows = len(t) * width
        return pa.table(
            {
                "band": banded.flatten(),
                id_col: t[id_col].take(idx),
                hash_col: t[hash_col].take(idx),
                "side": pa.array(
                    np.full(n_rows, side, np.int8), pa.int8()
                ),
            }
        )

    # ``local_probe_limit`` is the ENFORCED boundary of the local-explode
    # premise (not just documented): the (id, hash) pull above is ~the
    # same size as the unavoidable new-id broadcast, but the band
    # explode multiplies it by ``bands`` — beyond the limit the explode
    # runs distributed instead (the round-3 shape: Ray map + one
    # materialize, probe keys pulled from the banded rows). Output is
    # identical either way (pytest-locked); only the barrier count
    # differs.
    # gate on the EXPLODED row count (len × bands) — the quantity the
    # docstring's memory contract bounds, and the same semantics as the
    # text-side op (code-review r5: the pre-explode gate under-enforced
    # by a factor of `bands`)
    use_local = len(local) * bands <= local_probe_limit
    if use_local:
        new_rows_local = (
            _band_explode(local, 1)
            if len(local)
            else pa.table(
                {
                    "band": pa.array([], pa.int64()),
                    id_col: pa.array([], pa.string()),
                    hash_col: pa.array([], pa.int64()),
                    "side": pa.array([], pa.int8()),
                }
            )
        )
        probe_keys = (
            pc.unique(new_rows_local["band"].combine_chunks())
            if len(new_rows_local)
            else pa.array([], pa.int64())
        )
    else:
        # over-limit fallback: the explode (the ×bands blowup) runs
        # distributed, but it is fed from the ALREADY-PULLED (id, hash)
        # shard re-entered as object-store blocks — NOT from
        # ``new_hashes`` — so the probe upstream (typically the decode
        # actor pool) still executes exactly once (ADVICE r4: mapping
        # new_hashes here re-ran it a second time). Note the driver
        # pull itself remains O(|shard|) regardless of
        # ``local_probe_limit`` — the limit bounds only the ×bands
        # local explode, which is what multiplies driver memory.
        n_sl = max(1, min(256, len(local) // 65536 + 1))
        sl_step = -(-len(local) // n_sl)
        base = ray.data.from_arrow(
            [
                local.slice(i * sl_step, sl_step)
                for i in range(n_sl)
                if i * sl_step < len(local)
            ]
        )
        new_rows_dist = base.map_batches(
            lambda t: _band_explode(t, 1), batch_format="pyarrow"
        ).materialize()  # two consumers: probe-key pull + band union
        key_parts: list = []
        for b in new_rows_dist.select_columns(["band"]).iter_batches(
            batch_size=65536, batch_format="pyarrow"
        ):
            key_parts.append(b["band"].combine_chunks())
        probe_keys = pc.unique(_cat(key_parts, pa.int64()))
    probe_keys_ref = ray.put(probe_keys)

    def _ref_fused(batch: pa.Table) -> pa.Table:
        # one task stage for the whole ref side: supersede -> band ->
        # explode -> probe-key collision filter. The collision filter
        # is the asymmetry win: a ref band row whose key no new row
        # shares can never produce a pair (pairs need >=1 new row per
        # band key), so the cogroup input is O(key collisions), not
        # O(ref) — at steady state ref >> new and almost every ref row
        # dies here, before the shuffle.
        keys = ray.get(probe_keys_ref)
        if len(keys) == 0:
            # empty probe shard: skip the ×bands explode entirely
            # (code-review r5 — a no-op ingest should cost O(1))
            return _band_explode(batch.slice(0, 0), 0)
        rows = _band_explode(_anti(batch), 0)
        return rows.filter(pc.is_in(rows["band"], value_set=keys))

    # probe side: the locally-exploded band rows re-enter Ray as
    # pre-sliced blocks (no barrier, no re-execution of the decode
    # upstream); slice count targets the shuffle's map parallelism.
    # Over-limit shards use the already-materialized distributed rows.
    if use_local:
        n_slices = max(1, min(64, len(new_rows_local) // 16384 + 1))
        step = -(-len(new_rows_local) // n_slices) if len(new_rows_local) else 1
        new_rows = ray.data.from_arrow(
            [
                new_rows_local.slice(i * step, step)
                for i in range(n_slices)
                if i * step < max(1, len(new_rows_local))
            ]
        )
    else:
        new_rows = new_rows_dist
    ref_rows = ref_hashes.map_batches(_ref_fused, batch_format="pyarrow")
    rows = new_rows.union(ref_rows)

    def _emit(group: pd.DataFrame) -> pa.Table:
        # vectorized key prefilter: only bands with >=2 rows and >=1 new
        agg = group.groupby("band", sort=False)["side"].agg(["size", "max"])
        live = agg.index[(agg["size"] >= 2) & (agg["max"] == 1)]
        srcs: list[np.ndarray] = []
        dsts: list[np.ndarray] = []
        hams: list[np.ndarray] = []
        caps: list[np.ndarray] = []
        dropped: list[int] = []  # per-capped-band dropped ref rows
        cg = int(group["bucket"].iloc[0]) if len(group) else 0
        sub = group[group["band"].isin(live)]
        for _, g in sub.groupby("band", sort=False):
            g = g.sort_values(id_col, kind="stable")
            was_capped = len(g) > cap
            if was_capped:
                keep_new = g[g["side"] == 1]
                if len(keep_new) > cap:
                    # degenerate all-new band (e.g. a boilerplate slice
                    # saturating one band key in the shard itself): the
                    # unbounded triangle would be O(n^2) in ONE group
                    # task — take the symmetric op's salted-chunk path
                    # (cap^2 pairs per chunk + chain links, subset of
                    # brute force like banded_hash_dup_pairs under a
                    # tiny cap); every ref row is dropped and counted
                    s, d, a_s, a_d, _ = emit_bucket_pairs_attr(
                        keep_new[id_col].to_numpy(dtype=object),
                        keep_new[hash_col].to_numpy(dtype=np.int64),
                        cap,
                        maxham=max_hamming,
                        return_attrs=True,
                    )
                    # chain links bypass the in-chunk prefilter — apply
                    # the same exact filter the verify stage used to;
                    # an id duplicated within the shard must never
                    # self-pair here either (code-review r5)
                    chham = hamming64(a_s, a_d).astype(np.int64)
                    lok = (chham <= max_hamming) & (s != d)
                    srcs.append(s[lok])
                    dsts.append(d[lok])
                    hams.append(chham[lok])
                    caps.append(np.full(int(lok.sum()), True))
                    if len(g) > len(keep_new):  # ref rows displaced
                        dropped.append(len(g) - len(keep_new))
                    continue
                # keep all new, fill with the id-ordered ref prefix
                keep_ref = g[g["side"] == 0].head(max(0, cap - len(keep_new)))
                n_drop = len(g) - len(keep_new) - len(keep_ref)
                if n_drop:  # all-new over-cap groups drop nothing
                    dropped.append(n_drop)
                g = pd.concat([keep_new, keep_ref]).sort_values(
                    id_col, kind="stable"
                )
            ids = g[id_col].to_numpy(dtype=object)
            hs = g[hash_col].to_numpy(dtype=np.int64)
            new = g["side"].to_numpy() == 1
            ni, ri = np.flatnonzero(new), np.flatnonzero(~new)
            pair_i: list[np.ndarray] = []
            pair_j: list[np.ndarray] = []
            # new x new triangle (ids sorted -> src < dst)
            if len(ni) >= 2:
                a, b = np.triu_indices(len(ni), 1)
                pair_i.append(ni[a])
                pair_j.append(ni[b])
            # new x ref cross (src = new, dst = ref)
            if len(ni) and len(ri):
                pair_i.append(np.repeat(ni, len(ri)))
                pair_j.append(np.tile(ri, len(ni)))
            if pair_i:
                i = np.concatenate(pair_i)
                j = np.concatenate(pair_j)
                ham = hamming64(hs[i], hs[j]).astype(np.int64)
                ok = ham <= max_hamming
                # a re-ingested id sits on BOTH sides of the cross —
                # never emit the hamming-0 self-edge
                ok &= ids[i] != ids[j]
                srcs.append(ids[i[ok]])
                dsts.append(ids[j[ok]])
                hams.append(ham[ok])
                caps.append(np.full(int(ok.sum()), was_capped))
        for seq, nrows in enumerate(dropped):
            # globally-unique sentinel per capped band (lsh.py scheme);
            # worker-side dict mutation would never reach the driver
            srcs.append(np.array([f"{DROPPED_SENTINEL}:inc:{cg}:{seq}"], object))
            dsts.append(np.array([f"1:{nrows}"], object))
            hams.append(np.array([-1], np.int64))
            caps.append(np.array([True]))
        # typed Arrow out (never an object-dtype pandas frame): empty
        # groups otherwise emit blocks Ray's size estimator can't
        # sample ("cannot call `vectorize` on size 0 inputs") and whose
        # from_pandas schema would degrade string columns to null type
        if not srcs:
            return pa.table(
                {
                    "src_id": pa.array([], pa.string()),
                    "dst_id": pa.array([], pa.string()),
                    "hamming": pa.array([], pa.int64()),
                    "capped": pa.array([], pa.bool_()),
                }
            )
        return pa.table(
            {
                "src_id": pa.array(np.concatenate(srcs), pa.string()),
                "dst_id": pa.array(np.concatenate(dsts), pa.string()),
                "hamming": pa.array(np.concatenate(hams), pa.int64()),
                "capped": pa.array(
                    np.concatenate(caps).astype(bool), pa.bool_()
                ),
            }
        )

    raw = (
        rows.map_batches(
            lambda t: bucket_by_keys(t, ["band"], 1024),
            batch_format="pyarrow",
        )
        .groupby("bucket")
        .map_groups(_emit, batch_format="pandas")
    )
    # hamming rode out of the bucket (exact — the full hashes were in
    # the group), chain links were filtered there, and a cross-band
    # duplicate pair carries the same hamming, so dedup_pairs' carried
    # columns finish the job: no slim attach, no re-verify, no verify
    # union over the ref side (round 4 — this removed the last two
    # barriers that made the incremental op slower than full recompute
    # at bench scale).
    cand = dedup_pairs(raw)
    if stats is not None:
        cand = cand.materialize()
        tally_sentinels(cand, stats, "str")
    return strip_sentinels(cand, "str").select_columns(
        ["src_id", "dst_id", "hamming"]
    )


def incremental_image_dup_pairs(
    new_corpus: "ray.data.Dataset",
    ref_hashes: "ray.data.Dataset",
    hash_col: str = "dhash",
    max_hamming: int = 3,
    bands: int = 4,
    cap: int = 256,
    stats: dict = None,
) -> "ray.data.Dataset":
    """Daily-ingest image dedup: decode + hash only the NEW shard
    (actor pool, bytes never shuffle) and match it against itself plus
    an existing reference hash table (e.g. the persisted
    ``image_hashes`` output of prior runs) via
    incremental_banded_dup_pairs — the reference images are never
    re-decoded and never paired against each other."""
    # no materialize: the generic op executes this decode pipeline
    # exactly once (its streaming driver pull re-enters the banded rows
    # as local blocks)
    new_h = image_hashes(new_corpus).select_columns(["image_id", hash_col])
    return incremental_banded_dup_pairs(
        new_h,
        ref_hashes.select_columns(["image_id", hash_col]),
        "image_id",
        hash_col,
        max_hamming,
        bands,
        cap,
        stats,
    )


def image_hash_dup_pairs(
    corpus: "ray.data.Dataset",
    hash_col: str = "dhash",
    max_hamming: int = 3,
    bands: int = 4,
    cap: int = 256,
    stats: dict = None,
) -> "ray.data.Dataset":
    """Near-dup image pairs by banded perceptual-hash hamming: decode +
    hash in an actor pool (bytes never shuffle), then the shared
    banded_hash_dup_pairs skeleton. No materialize: the hash table has
    a single consumer now (hamming rides out of the band bucket), so
    decode streams straight into the band shuffle."""
    return banded_hash_dup_pairs(
        image_hashes(corpus), "image_id", hash_col, max_hamming, bands,
        cap, stats,
    )


def sample_frames(
    videos: "ray.data.Dataset", stride: int = 2, concurrency=(1, 4),
    batch_size: int = 16,
) -> "ray.data.Dataset":
    return videos.select_columns(["video_id", "bytes", "fmt"]).map_batches(
        FrameSampler, fn_constructor_args=(stride,), batch_format="pyarrow",
        concurrency=concurrency, batch_size=batch_size,
    )


class VideoFrameHashes:
    """Actor: decode the video container once and emit one
    (video_id, frame_idx, dhash) row per frame — dHash computed
    straight on the raw frame array, no PNG re-encode round-trip
    (FrameSampler exists for pipelines that need frame BYTES; this is
    the slim path video-level dedup wants). ``rawv1`` and the lossy
    ``mjpg1`` are real (video_decode); inter-frame codecs raise
    NotImplementedError like FrameSampler."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids: list[str] = []
        idxs: list[int] = []
        hashes: list[int] = []
        for vid, data, fmt in zip(
            batch["video_id"].to_pylist(),
            batch["bytes"].to_pylist(),
            batch["fmt"].to_pylist(),
        ):
            frames = video_decode(data, fmt)
            for fi in range(len(frames)):
                vids.append(vid)
                idxs.append(fi)
                hashes.append(dhash64(frames[fi]))
        return pa.table(
            {
                "video_id": pa.array(vids, pa.string()),
                "frame_idx": pa.array(idxs, pa.int64()),
                "dhash": pa.array(hashes, pa.int64()),
            }
        )


def video_frame_hashes(
    videos: "ray.data.Dataset", concurrency=(1, 8), batch_size: int = 32
) -> "ray.data.Dataset":
    """(video_id, frame_idx, dhash) per frame — decode once per video
    in an actor pool, bytes never leave the map stage."""
    return videos.select_columns(["video_id", "bytes", "fmt"]).map_batches(
        VideoFrameHashes, batch_format="pyarrow",
        concurrency=concurrency, batch_size=batch_size,
    )


def video_dup_pairs(
    videos: "ray.data.Dataset",
    max_hamming: int = 3,
    min_frame_matches: int = 2,
    bands: int = 4,
    cap: int = 256,
    stats: dict = None,
) -> "ray.data.Dataset":
    """Video-level near-dup pairs by frame-hash evidence: per-frame
    dHash in an actor pool (bytes never shuffle), the shared
    banded_hash_dup_pairs skeleton over frame ids, then a combiner →
    bucket-cogroup count of matching frame pairs per video pair.
    ``min_frame_matches`` guards against single coincidental frame
    collisions (the count is over DISTINCT matching frame pairs; a
    frame may participate in several). Output: (src_id, dst_id,
    n_frame_matches), src < dst, n_frame_matches >= min_frame_matches.

    Cap semantics: when a band bucket exceeds ``cap`` (degenerate
    frames — e.g. near-uniform frames across many videos), the LSH
    stage emits only salted-chunk pairs plus chain links, so
    n_frame_matches is a LOWER BOUND in that regime and a pair whose
    only evidence is capped frames can fall below the floor — the same
    recall tradeoff the image/audio tiers accept, amplified here by
    the counting. Pass ``stats`` to observe dropped/capped buckets
    (stages/lsh.py sentinel reporting); raise ``cap`` (or prefilter
    low-entropy frames) when drops are nonzero.
    Scale shape: the wide steps see only (band, frame_id, hash) rows
    and then pre-aggregated (video pair, cnt) partials — frames per
    video is a small constant, so this is the image-tier cost times
    mean frame count."""
    frame_hashes = video_frame_hashes(videos).map_batches(
        _frame_id_table, batch_format="pyarrow"
    )  # ~40 B/frame; single consumer (band shuffle) — no materialize
    frame_pairs = banded_hash_dup_pairs(
        frame_hashes, "frame_id", "dhash", max_hamming, bands, cap, stats
    )
    return _video_pair_counts(frame_pairs, min_frame_matches)


def _frame_id_table(t: pa.Table) -> pa.Table:
    """(video_id, frame_idx, dhash) -> (frame_id, dhash). Zero-padded
    frame index keeps frame_id ordering aligned with
    (video_id, frame_idx) ordering, so src<dst at the frame level
    implies src_vid <= dst_vid at the video level.

    Id-charset contract (ADVICE r3): the alignment relies on the '#'
    separator (0x23) sorting BELOW every character of every video id —
    an id containing ' ' or '!' would let a frame-level src<dst cross a
    video-level src>dst, breaking the documented orientation of
    incremental_video_dup_pairs (canonical_swap=False). Validated here
    (vectorized min-codepoint check) rather than documented-only, so a
    violating corpus fails loudly at the first map instead of emitting
    silently mis-oriented pairs; the symmetric path keeps its defensive
    swap regardless."""
    vid = t["video_id"].to_pandas().to_numpy(dtype=object)
    if len(vid):
        import pyarrow.compute as pc

        bad = pc.match_substring_regex(
            pa.array(vid, pa.string()), r"[\x00-\x23]"
        )
        if pc.any(bad).as_py():
            raise ValueError(
                "video_id contains characters <= '#' (0x23); the "
                "frame_id ordering contract requires every id char "
                "above '#' — rename or escape video ids"
            )
    idx = t["frame_idx"].to_numpy(zero_copy_only=False)
    fids = np.array(
        [f"{v}#{i:06d}" for v, i in zip(vid, idx)], dtype=object
    )
    return pa.table(
        {"frame_id": pa.array(fids, pa.string()), "dhash": t["dhash"]}
    )


def _video_pair_counts(
    frame_pairs: "ray.data.Dataset",
    min_frame_matches: int,
    canonical_swap: bool = True,
) -> "ray.data.Dataset":
    """Frame pairs -> (src_id, dst_id, n_frame_matches) video pairs:
    per-batch combiner counts, one bucket-cogroup merge, floor filter.
    ``canonical_swap=False`` preserves the frame pairs' side
    orientation (the incremental path keeps src = the NEW shard's
    video; swapping would lose which side is the probe)."""
    import pandas as pd

    from .lsh import bucket_by_keys

    def _vid_partial(t: pa.Table) -> pa.Table:
        # frame pair -> video pair (drop intra-video), count per batch
        src = np.array(
            [s.rsplit("#", 1)[0] for s in t["src_id"].to_pylist()],
            dtype=object,
        )
        dst = np.array(
            [s.rsplit("#", 1)[0] for s in t["dst_id"].to_pylist()],
            dtype=object,
        )
        keep = src != dst
        src, dst = src[keep], dst[keep]
        if canonical_swap:
            swap = src > dst  # defensive: holds already via frame_id order
            src[swap], dst[swap] = dst[swap], src[swap]
        vc = pd.DataFrame({"src_id": src, "dst_id": dst}).value_counts(
            sort=False
        )
        idx = vc.index
        return pa.table(
            {
                "src_id": pa.array(
                    idx.get_level_values(0).to_numpy(dtype=object),
                    pa.string(),
                ),
                "dst_id": pa.array(
                    idx.get_level_values(1).to_numpy(dtype=object),
                    pa.string(),
                ),
                "n_frame_matches": pa.array(
                    vc.to_numpy(dtype=np.int64), pa.int64()
                ),
            }
        )

    def _vid_merge(group: pd.DataFrame) -> pd.DataFrame:
        out = (
            group.groupby(["src_id", "dst_id"], sort=False)
            .agg(n_frame_matches=("n_frame_matches", "sum"))
            .reset_index()
        )
        return out[out["n_frame_matches"] >= min_frame_matches]

    return (
        frame_pairs.map_batches(_vid_partial, batch_format="pyarrow")
        .map_batches(
            lambda t: bucket_by_keys(t, ["src_id", "dst_id"], 256),
            batch_format="pyarrow",
        )
        .groupby("bucket")
        .map_groups(_vid_merge, batch_format="pandas")
        .select_columns(["src_id", "dst_id", "n_frame_matches"])
    )


def incremental_video_dup_pairs(
    new_videos: "ray.data.Dataset",
    ref_frame_hashes: "ray.data.Dataset",
    max_hamming: int = 3,
    min_frame_matches: int = 2,
    bands: int = 4,
    cap: int = 256,
    stats: dict = None,
) -> "ray.data.Dataset":
    """Daily-ingest video dedup — the video wiring of
    incremental_banded_dup_pairs: decode + frame-hash ONLY the new
    shard, probe its frame ids against a persisted frame-hash table
    (the ``video_frame_hashes`` output of prior runs, schema
    (video_id, frame_idx, dhash)), then the shared frame→video pair
    aggregation with orientation preserved: src is always a NEW
    shard's video, dst is new (src < dst) or ref — never ref x ref.
    A re-ingested video SUPERSEDES its persisted frame set wholesale:
    every ref frame row belonging to a video id present in the new
    shard is anti-joined out before the frame join (a truncated or
    re-encoded re-ingest changes the frame SET, and stale leftover
    frames would otherwise emit the reversed orientation of a new x new
    video pair with split counts). The new-video-id broadcast is
    bounded by the ingest shard."""
    # materialize stays here (unlike the image/audio wrappers): new_fh
    # has TWO consumers — the new-video-id pull below and the generic
    # op's own probe pull — and the upstream is the decode actor pool
    new_fh = video_frame_hashes(new_videos).map_batches(
        _frame_id_table, batch_format="pyarrow"
    ).materialize()
    new_vids: list = []
    for b in new_fh.select_columns(["frame_id"]).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        import pyarrow.compute as pc

        new_vids.extend(
            s.rsplit("#", 1)[0] for s in b["frame_id"].to_pylist()
        )
    new_vid_ref = ray.put(pa.array(sorted(set(new_vids)), pa.string()))

    def _supersede(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        seen = ray.get(new_vid_ref)
        if len(seen) == 0:
            return batch
        return batch.filter(
            pc.invert(pc.is_in(batch["video_id"], value_set=seen))
        )

    # no materialize: the generic op consumes its ref side exactly once
    # now (band path only — the verify union is gone), so the per-frame
    # f-string map runs once either way
    ref_fh = ref_frame_hashes.map_batches(
        _supersede, batch_format="pyarrow"
    ).map_batches(_frame_id_table, batch_format="pyarrow")
    frame_pairs = incremental_banded_dup_pairs(
        new_fh, ref_fh, "frame_id", "dhash", max_hamming, bands, cap, stats
    )
    return _video_pair_counts(
        frame_pairs, min_frame_matches, canonical_swap=False
    )


# --- audio tier --------------------------------------------------------


class AudioFeatures:
    """Actor: decode (audio/codec.py, rawa1 real / compressed codecs
    honest stubs) -> per-clip DSP features + 64-bit spectro-temporal
    fingerprint. Emits (audio_id, duration_s, rms, zcr, centroid_hz,
    fp64) — the audio analog of ImageHashes: decode once per row in an
    actor pool, bytes never leave the map stage."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..audio.codec import audio_features_one, decode as adecode

        n = len(batch)
        dur = np.empty(n, dtype=np.float64)
        rms = np.empty(n, dtype=np.float64)
        zcr = np.empty(n, dtype=np.float64)
        cen = np.empty(n, dtype=np.float64)
        fp = np.empty(n, dtype=np.int64)
        for i, (data, fmt) in enumerate(
            zip(batch["bytes"].to_pylist(), batch["fmt"].to_pylist())
        ):
            x, sr = adecode(data, fmt)
            f = audio_features_one(x, sr)
            dur[i] = f["duration_s"]
            rms[i] = f["rms"]
            zcr[i] = f["zcr"]
            cen[i] = f["centroid_hz"]
            fp[i] = f["fp64"]
        return pa.table(
            {
                "audio_id": batch["audio_id"],
                "duration_s": pa.array(dur, pa.float64()),
                "rms": pa.array(rms, pa.float64()),
                "zcr": pa.array(zcr, pa.float64()),
                "centroid_hz": pa.array(cen, pa.float64()),
                "fp64": pa.array(fp, pa.int64()),
            }
        )


def audio_features(
    corpus: "ray.data.Dataset", concurrency=(1, 8), batch_size: int = 256
) -> "ray.data.Dataset":
    """(audio_id, duration_s, rms, zcr, centroid_hz, fp64) per clip."""
    return corpus.select_columns(["audio_id", "bytes", "fmt"]).map_batches(
        AudioFeatures, batch_format="pyarrow",
        concurrency=concurrency, batch_size=batch_size,
    )


class AudioQuality:
    """Actor: decode -> per-clip quality signals (clipping, silence,
    crest factor, DC offset — audio/codec.py:audio_quality_one), the
    audio analog of text.py's quality_signals. Emits (audio_id,
    clipping_frac, silence_frac, crest_db, dc_offset)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..audio.codec import audio_quality_one, decode as adecode

        n = len(batch)
        cols = {
            k: np.empty(n, dtype=np.float64)
            for k in ("clipping_frac", "silence_frac", "crest_db", "dc_offset")
        }
        for i, (data, fmt) in enumerate(
            zip(batch["bytes"].to_pylist(), batch["fmt"].to_pylist())
        ):
            x, sr = adecode(data, fmt)
            q = audio_quality_one(x, sr)
            for k, arr in cols.items():
                arr[i] = q[k]
        return pa.table(
            {"audio_id": batch["audio_id"]}
            | {k: pa.array(v, pa.float64()) for k, v in cols.items()}
        )


def audio_quality_signals(
    clips: "ray.data.Dataset", concurrency=(1, 8), batch_size: int = 256
) -> "ray.data.Dataset":
    return clips.select_columns(["audio_id", "bytes", "fmt"]).map_batches(
        AudioQuality, batch_format="pyarrow",
        concurrency=concurrency, batch_size=batch_size,
    )


def audio_quality_filter(
    clips: "ray.data.Dataset",
    max_clipping: float = 0.01,
    max_silence: float = 0.9,
    concurrency=(1, 8),
    batch_size: int = 256,
) -> "ray.data.Dataset":
    """Keep-list of audio ids passing the quality gates (hard-clipped
    or mostly-silent clips dropped)."""
    sig = audio_quality_signals(clips, concurrency, batch_size)

    def _keep(t: pa.Table) -> pa.Table:
        m = (
            t["clipping_frac"].to_numpy(zero_copy_only=False) <= max_clipping
        ) & (t["silence_frac"].to_numpy(zero_copy_only=False) <= max_silence)
        return pa.table({"audio_id": t["audio_id"].filter(pa.array(m))})

    return sig.map_batches(_keep, batch_format="pyarrow")


def audio_fp_dup_pairs(
    corpus: "ray.data.Dataset",
    max_hamming: int = 3,
    bands: int = 4,
    cap: int = 256,
    stats: dict = None,
) -> "ray.data.Dataset":
    """Near-dup audio pairs by banded fingerprint hamming: decode +
    fingerprint in an actor pool (bytes never shuffle), then the shared
    banded_hash_dup_pairs skeleton — identical shuffle shape to the
    image tier, so the 100-TB argument carries over unchanged."""
    fps = audio_features(corpus).select_columns(["audio_id", "fp64"])
    # no materialize: single consumer (the band shuffle) — decode
    # streams straight through
    return banded_hash_dup_pairs(
        fps, "audio_id", "fp64", max_hamming, bands, cap, stats
    )


def incremental_audio_dup_pairs(
    new_corpus: "ray.data.Dataset",
    ref_fps: "ray.data.Dataset",
    max_hamming: int = 3,
    bands: int = 4,
    cap: int = 256,
    stats: dict = None,
) -> "ray.data.Dataset":
    """Daily-ingest audio dedup — the audio wiring of
    incremental_banded_dup_pairs (the image tier's
    incremental_image_dup_pairs, one modality over): decode +
    fingerprint ONLY the new shard in the actor pool, then the
    asymmetric probe-vs-index banded join against a persisted
    fingerprint table (e.g. a prior run's ``audio_features`` output) —
    reference clips are never re-decoded and never paired against each
    other."""
    # no materialize: the generic op executes this decode pipeline
    # exactly once (streaming driver pull)
    new_fps = audio_features(new_corpus).select_columns(["audio_id", "fp64"])
    return incremental_banded_dup_pairs(
        new_fps,
        ref_fps.select_columns(["audio_id", "fp64"]),
        "audio_id",
        "fp64",
        max_hamming,
        bands,
        cap,
        stats,
    )
