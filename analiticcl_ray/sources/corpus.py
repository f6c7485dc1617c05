"""Deterministic synthetic image+caption corpus (FIXTURES.md §1).

Schema matches BASELINE.json ``input_hint`` exactly:
    (image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
     caption:string, phash:int64)

Planted duplicate structure (all seeded, reproducible):
- ~20% of rows are near-duplicates of a base row, with caption mutations
  drawn from the reference's own variant test cases (substitution
  "huys"->"huis" tests/main.rs:871-911; deletion/insertion "tink"->"think"
  tests/main.rs:1119-1361; transposition "rihgt"->"right"
  src/distance.rs:101-179; case-only change src/lib.rs:1367-1377; long
  shared 30+-char prefix with small tail edits — exercises the
  suffix-array substring stage) and image mutations (identical bytes,
  deterministic quantization re-encode with PSNR>=40dB, ±1 LSB noise with
  PSNR>=40dB, strong noise with PSNR<40dB as a negative control).
- chains A~B~C where A is 2 mutations away from C (connected components).
- a skew block: ~1% of rows share one boilerplate caption ("stock photo
  of a sunset") with unrelated images -> hot LSH bucket, not duplicates.

Ground truth is NOT emitted from generator bookkeeping: tests recompute
it with the brute-force oracle (pipelines/oracle.py) using the exact same
verify kernel, so truth == "what the verify kernel says over all O(n^2)
pairs" and recall is measured against that.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..image.codec import phash64, png_decode, png_encode, quantize_encode

BOILERPLATE = "stock photo of a sunset"


def _make_vocab(n_words: int = 4000, seed: int = 1234) -> list[str]:
    """Deterministic synthetic vocabulary: syllable-composed pseudo-words
    plus the reference test words (huis, think, right, separate, ...), so
    captions are diverse (good bag-distance separation, realistic LSH
    bucket sizes) while still containing the reference's variant cases."""
    onsets = "b c d f g h j k l m n p r s t v w z bl br ch cl dr fl gr kl pl pr sch sl sp st tr".split()
    nuclei = "a e i o u aa ee oo ie ei ou ui".split()
    codas = ["", "l", "n", "r", "s", "t", "k", "m", "p", "st", "nd", "cht", "ng"]
    rng = np.random.default_rng(seed)
    words = set(
        "huis huls think tink right separate tiers tires tries rites sure".split()
    )
    while len(words) < n_words:
        n_syll = int(rng.integers(1, 4))
        w = "".join(
            onsets[int(rng.integers(len(onsets)))]
            + nuclei[int(rng.integers(len(nuclei)))]
            + codas[int(rng.integers(len(codas)))]
            for _ in range(n_syll)
        )
        if 3 <= len(w) <= 14:
            words.add(w)
    return sorted(words)


_VOCAB = _make_vocab()


def _caption(rng: np.random.Generator) -> str:
    n_words = int(rng.integers(5, 13))
    return " ".join(_VOCAB[int(i)] for i in rng.integers(0, len(_VOCAB), n_words))


def _mutate_caption(rng: np.random.Generator, s: str, kind: str) -> str:
    """One planted edit mirroring the reference variant test cases."""
    chars = list(s)
    # only touch alphabetic positions, keep spaces intact
    idxs = [i for i, c in enumerate(chars) if c.isalpha()]
    if kind == "sub":  # huys -> huis
        i = int(rng.choice(idxs))
        repl = chr(ord("a") + int(rng.integers(26)))
        while repl == chars[i].lower():
            repl = chr(ord("a") + int(rng.integers(26)))
        chars[i] = repl
    elif kind == "del":  # think -> tink
        i = int(rng.choice(idxs))
        del chars[i]
    elif kind == "ins":  # sur -> sure
        i = int(rng.choice(idxs))
        chars.insert(i, chr(ord("a") + int(rng.integers(26))))
    elif kind == "transpose":  # right -> rihgt (DL=1)
        cands = [i for i in idxs if i + 1 < len(chars) and chars[i + 1].isalpha()
                 and chars[i] != chars[i + 1]]
        if cands:
            i = int(rng.choice(cands))
            chars[i], chars[i + 1] = chars[i + 1], chars[i]
    elif kind == "case":  # first-char case flip only
        chars[0] = chars[0].upper() if chars[0].islower() else chars[0].lower()
    elif kind == "tail":  # long shared prefix, small dispersed tail edits
        # two substitutions in the last third -> caught by substring stage
        tail_idxs = [i for i in idxs if i > 2 * len(chars) // 3]
        for i in rng.choice(tail_idxs, size=min(2, len(tail_idxs)), replace=False):
            chars[int(i)] = chr(ord("a") + int(rng.integers(26)))
    return "".join(chars)


def _base_pixels(rng: np.random.Generator, w: int = 32, h: int = 32) -> np.ndarray:
    """Procedural RGB tile: random low-frequency block texture + gradient
    of random direction + noise — diverse low-frequency structure so the
    perceptual-hash distribution resembles real photos (identical
    gradients for every image would make phash bit-slices degenerate)."""
    block = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    img = np.repeat(np.repeat(block, h // 4, 0), w // 4, 1).astype(np.int32)
    yy, xx = np.mgrid[0:h, 0:w]
    gx, gy = rng.integers(-4, 5, size=2)
    img += ((gx * xx + gy * yy)[:, :, None] % 97)
    img += rng.integers(-12, 13, size=img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def _mutate_pixels(
    rng: np.random.Generator, px: np.ndarray, kind: str
) -> tuple[bytes, str]:
    if kind == "exact":
        return png_encode(px), "png"
    if kind == "lsb":  # ±1 LSB noise, PSNR ~48 dB
        noisy = np.clip(
            px.astype(np.int32) + rng.integers(-1, 2, size=px.shape), 0, 255
        ).astype(np.uint8)
        return png_encode(noisy), "png"
    if kind == "quant":  # deterministic lossy re-encode, PSNR >= 40 dB
        return quantize_encode(px, 2), "q2"
    if kind == "strong":  # PSNR < 40 dB -> negative control
        noisy = np.clip(
            px.astype(np.int32) + rng.integers(-35, 36, size=px.shape), 0, 255
        ).astype(np.uint8)
        return png_encode(noisy), "png"
    raise ValueError(kind)


CAPTION_KINDS = ["sub", "del", "ins", "transpose", "case", "tail"]
IMAGE_KINDS = ["exact", "lsb", "quant", "strong"]


def generate_corpus(n_rows: int, seed: int = 42) -> pa.Table:
    """Build the corpus table. ~64% unique base rows, ~20% mutated
    near-dups (incl. A~B~C chains), ~1% boilerplate-caption skew rows."""
    rng = np.random.default_rng(seed)
    image_ids: list[str] = []
    blobs: list[bytes] = []
    ws: list[int] = []
    hs: list[int] = []
    fmts: list[str] = []
    captions: list[str] = []
    phashes: list[int] = []

    def emit(blob: bytes, fmt: str, caption: str, px: np.ndarray) -> None:
        i = len(image_ids)
        image_ids.append(f"img{i:08d}")
        blobs.append(blob)
        hs.append(px.shape[0])
        ws.append(px.shape[1])
        fmts.append(fmt)
        captions.append(caption)
        phashes.append(phash64(px))

    n_skew = max(2, n_rows // 100)
    i = 0
    while i < n_rows - n_skew:
        px = _base_pixels(rng)
        cap = _caption(rng)
        emit(png_encode(px), "png", cap, px)
        i += 1
        roll = rng.random()
        if roll < 0.20 and i < n_rows - n_skew:
            # a duplicate group: 1-3 variants, sometimes chained
            n_var = int(rng.integers(1, 4))
            prev_cap = cap
            for v in range(min(n_var, n_rows - n_skew - i)):
                ck = CAPTION_KINDS[int(rng.integers(len(CAPTION_KINDS)))]
                ik = IMAGE_KINDS[int(rng.integers(len(IMAGE_KINDS)))]
                chained = rng.random() < 0.3
                src_cap = prev_cap if chained else cap
                mcap = _mutate_caption(rng, src_cap, ck)
                blob, fmt = _mutate_pixels(rng, px, ik)
                mpx = png_decode(blob)
                emit(blob, fmt, mcap, mpx)
                prev_cap = mcap
                i += 1
    while i < n_rows:
        px = _base_pixels(rng)
        emit(png_encode(px), "png", BOILERPLATE, px)
        i += 1

    return pa.table(
        {
            "image_id": pa.array(image_ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
            "fmt": pa.array(fmts, pa.string()),
            "caption": pa.array(captions, pa.string()),
            "phash": pa.array(phashes, pa.int64()),
        }
    )


def write_corpus_dir(
    d: str, make_table, n_rows: int, n_files: int,
    rows_per_file_hint: int, min_row_group: int,
) -> str:
    """Materialize-once parquet DIRECTORY writer shared by the image /
    audio / video corpus generators: many part files so the read
    parallelizes across cores (a single-file read is one serial task in
    Ray Data). ``make_table`` is called only on a cache miss. The
    ``_SUCCESS`` marker is written after the parts, so a crashed writer
    re-generates instead of serving a partial directory."""
    if n_rows < 1:
        raise ValueError(f"corpus n_rows must be >= 1, got {n_rows}")
    marker = os.path.join(d, "_SUCCESS")
    if not os.path.exists(marker):
        os.makedirs(d, exist_ok=True)
        table = make_table()
        n_files = max(1, min(n_files, n_rows // rows_per_file_hint or 1))
        step = (n_rows + n_files - 1) // n_files
        for i in range(n_files):
            part = table.slice(i * step, step)
            if len(part) == 0:
                break
            pq.write_table(
                part,
                os.path.join(d, f"part-{i:04d}.parquet"),
                row_group_size=max(min_row_group, step // 4),
            )
        with open(marker, "w") as f:
            f.write("ok")
    return d


def corpus_path(
    n_rows: int, seed: int = 42, root: str = "/tmp/analiticcl_ray",
    n_files: int = 32,
) -> str:
    """Materialize (once) and return the parquet DIRECTORY for a corpus
    size."""
    return write_corpus_dir(
        os.path.join(root, f"corpus_n{n_rows}_s{seed}"),
        lambda: generate_corpus(n_rows, seed),
        n_rows, n_files, rows_per_file_hint=256, min_row_group=512,
    )
