"""End-to-end near-duplicate detection + clustering pipeline.

The flagship pipeline (SURVEY.md §3.4), shaped for minimum shuffle count
and minimum serial fraction:

    read corpus parquet (multi-file -> parallel read)
      ├─ map_batches(CaptionSignatures)      actor pool, zero-copy Arrow:
      │      anagram 4-gram shingles -> MinHash band keys + content_key
      │      (caption ^ bytes hash) + bytes_key (bytes hash)
      ├─ map_batches(phash_band_table)       4×16-bit phash slices
      ├─ explode -> (band, image_id)         project-before-shuffle
      │      ∪ winnowing substring fingerprints
      │      ∪ content keys (exact dup rides the same shuffle)
      ├─ ONE cogroup shuffle -> salted pair emission (the index);
      │      phash rows go through a second, tighter-thresholded pass
      ├─ pair dedup (deterministic hash buckets, in-group drop_duplicates)
      ├─ attach caption+bytes_key -> CaptionVerifier
      │      (lossless bag/len prefilter, then the exact DL kernel)
      ├─ filter(caption_dup)
      ├─ bytes_equal short-circuit; bytes attached only for pairs that
      │      need decoded-pixel PSNR (semi-join on surviving ids)
      ├─ ImageVerifier (PSNR >= 40 dB) -> verified pairs table
      └─ connected components -> clusters table

Every stage streams; the corpus itself is never materialized. The only
materialized intermediates are the slim signature table and
edge-list-sized pair/label sets. Degenerate (stop-word-like) buckets and
salted buckets are counted in the metrics — no silent caps.
"""

from __future__ import annotations

import time
from typing import Optional

import pyarrow as pa

import ray.data

from ..config import DedupConfig
from ..stages.cc import cc_label_propagation, cc_union_find
from ..stages.lsh import dedup_pairs, explode_band_rows
from ..stages.signatures import CaptionSignatures, phash_band_table
from ..stages.substring import SubstringFingerprints
from ..stages.verify import (
    CaptionVerifier,
    ImageVerifier,
    attach_pair_sides,
    split_exact_and_prune,
)


def dedup_pipeline(
    corpus: "ray.data.Dataset",
    cfg: Optional[DedupConfig] = None,
    *,
    signature_concurrency=(1, 8),
    signature_batch_size: int = 1024,
    verify_concurrency=(1, 8),
    verify_batch_size: int = 1024,
    image_batch_size: int = 256,
    cc_method: str = "auto",
    cc_edge_threshold: int = 2_000_000,
    attach_method: str = "auto",
    with_substring_stage: bool = True,
):
    """Run the full dedup pipeline.

    Returns (pairs_ds, clusters_ds, metrics): verified duplicate pairs
    with score components, cluster assignments for all rows appearing in
    a pair, and a stage-metrics dict.
    """
    cfg = cfg or DedupConfig()
    metrics: dict = {"config": cfg.__dict__ | {"weights": cfg.weights.__dict__}}
    t0 = time.perf_counter()

    # --- signatures (binary column projected away before any shuffle) ---
    slim = corpus.select_columns(["image_id", "caption", "phash", "bytes"])
    # batch_size 1024 (not 4096): the signature kernels chunk internally
    # at 256 docs, so smaller batches cost no vectorization — but they
    # quadruple the task count, which is what keeps the whole actor pool
    # busy on small/tail partitions (measured 2.3 s vs 5.7 s at 20k rows,
    # 16 actors; at 1M rows the task count is ample either way)
    # Actor pools keep Ray Data's restart defaults (max_restarts=-1 +
    # max_task_retries=-1): disabling them to silence the ray#53727
    # "constructor arguments in the object store" informational line
    # (VERDICT r4 item 6) measured a ~13% headline dispatch regression —
    # max_task_retries=0 slows task dispatch across every pool. The
    # line is emitted once per driver process from C++ for Ray Data's
    # OWN context/transformer args (not ours — cfg serializes to ~500 B)
    # and is filtered at the bench harness instead (bench.py).
    sigs = slim.map_batches(
        CaptionSignatures,
        fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        batch_size=signature_batch_size,
        concurrency=signature_concurrency,
    )
    sig_cols = ["image_id", "caption", "content_key", "bytes_key", "bytes_key2", "bands"]
    if cfg.use_phash_bands:
        sigs = sigs.map_batches(
            lambda b: phash_band_table(b, cfg.phash_bands), batch_format="pyarrow"
        )
        sig_cols += ["phash_bands", "phash"]
    sigs = sigs.select_columns(sig_cols).materialize()
    metrics["t_signatures_s"] = round(time.perf_counter() - t0, 3)
    phash_rows = (
        # the full 64-bit phash rides the band rows so pair emission can
        # hamming-prefilter inside the cogroup (no extra shuffle)
        explode_band_rows(sigs, band_cols=("phash_bands",), carry_cols=("phash",))
        if cfg.use_phash_bands
        else None
    )
    # ^ materialized: consumed by 3 downstream passes (hot-key count, pair
    #   emission, exact-dup) — without this the signature computation would
    #   lazily re-execute per consumer. Slim columns only (ids + sketches);
    #   the object store spills if needed.

    band_rows = explode_band_rows(sigs, band_cols=("bands",))
    if with_substring_stage:
        substr_rows = corpus.select_columns(["image_id", "caption"]).map_batches(
            SubstringFingerprints,
            fn_constructor_args=(cfg,),
            batch_format="pyarrow",
            batch_size=signature_batch_size,
            concurrency=signature_concurrency,
        )
        band_rows = band_rows.union(substr_rows)
    # band_rows has a single consumer (the one-shuffle candidate stage),
    # so no materialize barrier is needed

    # exact content-key co-occurrence rides the SAME shuffle as the LSH
    # bands: content keys are just one more key source (one sort fewer)
    def _content_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"band": batch["content_key"], "image_id": batch["image_id"]}
        )

    band_rows = band_rows.union(
        sigs.map_batches(_content_rows, batch_format="pyarrow")
    )

    # --- candidate generation (the wide step) ---------------------------
    # co-group count scales with band-row volume (~bands+phash+winnow
    # keys per corpus row): each co-group is one in-memory pandas frame
    from ..stages.lsh import adaptive_cogroups

    n_corpus = sigs.count()  # free: sigs is materialized
    keys_per_row = cfg.bands + (cfg.phash_bands if cfg.use_phash_bands else 0) + 8
    n_cg = adaptive_cogroups(n_corpus * keys_per_row)
    bucket_stats: dict = {}
    # caption bands/winnow/content keys and the phash bit-slices have
    # different degeneracy policies but ride ONE cogroup exchange
    # (cooccurrence_pairs_multi): the per-cogroup emission splits by
    # source and applies each source's cap/threshold/prefilter — pair
    # sets and sentinels are identical to the former two-pass union,
    # at one all-to-all shuffle instead of two
    from ..stages.lsh import cooccurrence_pairs_multi

    sources = [
        {
            "rows": band_rows,
            "key_col": "band",
            "cap": cfg.bucket_cap,
            "sentinel_salt": 0,
        }
    ]
    if phash_rows is not None:
        sources.append(
            {
                # image-side candidates: tight phash degeneracy
                # threshold (see DedupConfig) + exact 64-bit hamming
                # prefilter at emission: DCT-sign slice collisions
                # across natural images were ~90% of all candidates; a
                # PSNR>=40dB dup is <=4 bits apart. Distinct salt:
                # caption-band and phash sentinels from the same
                # cogroup/seq must not collapse in dedup_pairs.
                "rows": phash_rows,
                "key_col": "band",
                "cap": cfg.phash_bucket_cap,
                "drop_threshold": cfg.phash_drop_threshold,
                "sentinel_salt": 1,
                "attr_col": "phash",
                "attr_maxham": cfg.phash_max_hamming,
            }
        )
    cands = cooccurrence_pairs_multi(
        sources, "image_id", keep_sentinels=True, n_cogroups=n_cg
    )
    t_ps = time.perf_counter()
    pairs = dedup_pairs(cands, n_cogroups=max(1024, n_cg // 8)).materialize()
    # this single materialize executes band explode + substring pool +
    # both co-occurrence shuffles + the dedup shuffle
    metrics["t_pair_shuffle_s"] = round(time.perf_counter() - t_ps, 3)
    # sentinel tally + strip over the (edge-list-sized) materialized
    # pairs; sentinel rows are globally unique (one per dropped bucket,
    # cogroup id encoded in src_id) so the post-dedup tally is exact
    from ..stages.lsh import strip_sentinels, tally_sentinels

    tally_sentinels(pairs, bucket_stats)
    metrics.update(bucket_stats)  # dropped degenerate buckets: no silent caps
    pairs = strip_sentinels(pairs).materialize()
    metrics["candidate_pairs"] = pairs.count()
    metrics["capped_pairs"] = pairs.filter(expr="capped == True").count()
    # an aggressively-prefiltered pair list can come out of the dedup
    # shuffle in a handful of blocks, starving the verify actor pool
    # (one task per block); widen — free no-op once the edge list is
    # big enough to fill the pool naturally
    from ..stages.lsh import pool_width, widen_blocks

    verify_width = pool_width(verify_concurrency)
    pairs = widen_blocks(pairs, 2 * verify_width)
    metrics["t_candidates_s"] = round(time.perf_counter() - t0, 3)

    # --- caption verification ------------------------------------------
    t1 = time.perf_counter()
    # captions + bytes_key attach from the (already materialized) slim
    # signature table — no second corpus scan
    prefilter_ham = cfg.use_phash_bands and cfg.phash_max_hamming is not None
    cap_attach_cols = ["caption", "bytes_key", "bytes_key2"] + (
        # the 8-byte phash rides the caption attach so non-byte-equal
        # survivors can be hamming-pruned before the bytes attach
        ["phash"] if prefilter_ham else []
    )
    with_captions = attach_pair_sides(
        pairs, sigs, cap_attach_cols, method=attach_method,
        concurrency=verify_concurrency,
    )
    # batch_size also sets the TASK size (blocks are bundled up to it),
    # so a fixed 4096 over a well-prefiltered pair list yields fewer
    # tasks than the pool has actors (measured: 8 tasks / 28 actors);
    # shrink toward ~3 tasks per actor, floor 256 to keep the
    # vectorized kernel efficient. At scale n_pairs is huge and the
    # configured cap applies unchanged.
    n_pairs = metrics["candidate_pairs"]
    eff_verify_batch = min(
        verify_batch_size, max(256, -(-n_pairs // (3 * verify_width)))
    )
    cap_verified = with_captions.map_batches(
        CaptionVerifier,
        fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        batch_size=eff_verify_batch,
        concurrency=verify_concurrency,
    )
    survivors = cap_verified.filter(
        expr="caption_dup == True"
    ).materialize()
    survivors = widen_blocks(survivors, 2 * verify_width)
    metrics["caption_survivors"] = survivors.count()
    metrics["t_caption_verify_s"] = round(time.perf_counter() - t1, 3)

    # --- image verification (bytes fetched only where needed) ----------
    # 128-bit bytes-equality short-circuit + phash-hamming prune: one
    # shared implementation with the checkpointed runner
    # (stages/verify.split_exact_and_prune). At 20k rows the prune
    # removes ~22.5k of ~22.6k pixel verifications (caption-dup pairs
    # with distinct images).
    t2 = time.perf_counter()
    exact_dups, needs_pixels = split_exact_and_prune(survivors, cfg)
    # driver-side state bound (VERDICT r2 item 10): needed_ids holds the
    # ids referenced by pairs that survived caption verify AND the
    # bytes-equality/phash prunes — O(surviving near-dup pairs), not
    # O(corpus); at the measured dup rates that is ~3% of rows at 20k
    # and shrinks relative to corpus as scale grows. If a pathological
    # corpus ever made it corpus-sized, drop id_filter and let the
    # cogroup attach path semi-join on the distributed pair set instead.
    needed_ids: set[str] = set()
    for b in needs_pixels.select_columns(["src_id", "dst_id"]).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        needed_ids.update(b["src_id"].to_pylist())
        needed_ids.update(b["dst_id"].to_pylist())
    with_bytes = attach_pair_sides(
        needs_pixels,
        corpus,
        ["bytes", "fmt"],
        method=attach_method,
        id_filter=needed_ids,
        concurrency=verify_concurrency,
    )
    # same pool-filling logic; survivors bound the pixel-verify rows
    eff_image_batch = min(
        image_batch_size,
        max(64, -(-metrics["caption_survivors"] // (3 * verify_width))),
    )
    img_verified = with_bytes.map_batches(
        ImageVerifier,
        fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        batch_size=eff_image_batch,
        concurrency=verify_concurrency,
    )
    dup_pairs_ds = (
        img_verified.filter(expr="image_dup == True")
        .select_columns(
            ["src_id", "dst_id", "caption_score", "psnr_db", "capped"]
        )
        .union(exact_dups)
        .materialize()
    )
    metrics["verified_pairs"] = dup_pairs_ds.count()
    metrics["t_image_verify_s"] = round(time.perf_counter() - t2, 3)

    # --- clustering -----------------------------------------------------
    t3 = time.perf_counter()
    if cc_method == "auto":
        cc_method = (
            "union_find" if metrics["verified_pairs"] <= cc_edge_threshold else "label_prop"
        )
    if cc_method == "union_find":
        clusters = cc_union_find(dup_pairs_ds)
    else:
        clusters = cc_label_propagation(dup_pairs_ds)
    clusters = clusters.materialize()
    metrics["clustered_rows"] = clusters.count()
    metrics["cc_method"] = cc_method
    metrics["t_cc_s"] = round(time.perf_counter() - t3, 3)
    metrics["t_total_s"] = round(time.perf_counter() - t0, 3)
    return dup_pairs_ds, clusters, metrics
