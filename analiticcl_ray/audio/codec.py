"""Audio codec + DSP kernels (pure numpy), mirror of image/codec.py.

Audio clips ride the corpus as an opaque ``binary`` column with typed
metadata (sr, n_samples, fmt) — the same input_hint shape the image
tier uses. Real vs stubbed (task brief: plumbing real, missing codec
libs stubbed honestly):

- ``rawa1``: a deterministic PCM container (magic + sample_rate +
  int16 mono samples) — encode/decode REAL, so every downstream DSP
  kernel runs on actual waveforms.
- ``mulw1``: a REAL lossy path (round 4 — the audio analog of the
  image tier's baseline-JPEG codec): 8-bit mu-law companding per the
  public G.711 mu=255 curve (sgn(x)·ln(1+mu|x|)/ln(1+mu), quantized
  to 256 levels). A round trip is genuinely lossy (~30-40 dB SNR at
  tone level), so the fingerprint's robustness is exercised on
  actually-degraded bytes the way PSNR is for JPEG images.
- mp3 / flac / ogg / wav-with-compression: no codec library in this
  container; ``decode`` raises a clearly-marked NotImplementedError.
  The Ray-side plumbing (schema, actor signature, batch sizing) is
  identical either way.
- Spectrogram, band energies, spectral features, the 64-bit
  spectro-temporal fingerprint, and linear resampling are REAL
  vectorized numpy — no external DSP dependency.

The 64-bit fingerprint is the audio analog of the image dHash
(image/codec.py:dhash64): an 8x8 grid of log-band-energy differences
over (time slice, frequency band). Differences of LOG energies make it
gain-invariant (a volume change shifts every cell by the same constant
and cancels in the difference), and coarse 8x8 pooling makes it robust
to small additive noise — the same contrast-sign trick Haitsma &
Kalker's "A Highly Robust Audio Fingerprinting System" (ISMIR 2002,
public) uses per frame, pooled here to one word per clip so the LSH
band machinery (stages/signatures.py:hash_band_table) applies
unchanged.
"""

from __future__ import annotations

import numpy as np

RAWA_MAGIC = b"RAWA1\x00"

# fingerprint geometry: 8 time slices x (9 bands -> 8 adjacent diffs)
FP_TIME_SLICES = 8
FP_BANDS = 9
# analysis band edges (Hz) are log-spaced inside this range
FP_FMIN = 100.0
FP_FMAX_FRAC = 0.45  # of the sample rate (just under Nyquist)


def rawa_encode(samples: np.ndarray, sample_rate: int) -> bytes:
    """Mono int16 PCM -> rawa1 container bytes. Accepts float in
    [-1, 1] (scaled) or int16."""
    x = np.asarray(samples)
    if x.dtype.kind == "f":
        x = np.clip(np.rint(x * 32767.0), -32768, 32767).astype(np.int16)
    else:
        x = x.astype(np.int16)
    header = RAWA_MAGIC + np.array(
        [sample_rate, len(x)], dtype=np.uint32
    ).tobytes()
    return header + x.tobytes()


def rawa_decode(data: bytes) -> tuple[np.ndarray, int]:
    """rawa1 bytes -> (float64 mono in [-1, 1], sample_rate)."""
    if not data.startswith(RAWA_MAGIC):
        raise ValueError("not a rawa1 container")
    off = len(RAWA_MAGIC)
    sr, n = np.frombuffer(data[off : off + 8], np.uint32)
    if len(data) < off + 8 + 2 * int(n):
        raise ValueError(
            f"truncated rawa1 container: header promises {int(n)} samples, "
            f"payload holds {(len(data) - off - 8) // 2}"
        )
    x = np.frombuffer(data[off + 8 : off + 8 + 2 * int(n)], np.int16)
    return x.astype(np.float64) / 32768.0, int(sr)


MULAW_MAGIC = b"MULW1\x00"
MU = 255.0


def mulaw_encode(samples: np.ndarray, sample_rate: int) -> bytes:
    """Mono float [-1, 1] (or int16) -> mulw1 container bytes: 8-bit
    mu-law codes (public G.711 mu=255 companding curve). Genuinely
    lossy — 16 -> 8 bits through a nonlinear quantizer."""
    x = np.asarray(samples, dtype=np.float64)
    if np.asarray(samples).dtype.kind != "f":
        x = x / 32768.0
    x = np.clip(x, -1.0, 1.0)
    y = np.sign(x) * np.log1p(MU * np.abs(x)) / np.log1p(MU)  # [-1, 1]
    codes = np.clip(np.rint((y + 1.0) * 127.5), 0, 255).astype(np.uint8)
    header = MULAW_MAGIC + np.array(
        [sample_rate, len(codes)], dtype=np.uint32
    ).tobytes()
    return header + codes.tobytes()


def mulaw_decode(data: bytes) -> tuple[np.ndarray, int]:
    """mulw1 bytes -> (float64 mono in [-1, 1], sample_rate) — the
    mu-law expander; the round trip through mulaw_encode carries real
    quantization loss (finite SNR)."""
    if not data.startswith(MULAW_MAGIC):
        raise ValueError("not a mulw1 container")
    off = len(MULAW_MAGIC)
    sr, n = np.frombuffer(data[off : off + 8], np.uint32)
    if len(data) < off + 8 + int(n):
        raise ValueError(
            f"truncated mulw1 container: header promises {int(n)} codes, "
            f"payload holds {len(data) - off - 8}"
        )
    codes = np.frombuffer(data[off + 8 : off + 8 + int(n)], np.uint8)
    y = codes.astype(np.float64) / 127.5 - 1.0
    x = np.sign(y) * (np.power(1.0 + MU, np.abs(y)) - 1.0) / MU
    return x, int(sr)


def snr_db(ref: np.ndarray, test: np.ndarray) -> float:
    """Signal-to-noise ratio in dB of ``test`` against ``ref`` — the
    waveform analog of the image tier's PSNR gate. inf for identical
    signals; a mu-law round trip lands ~30-40 dB at tone level."""
    ref = np.asarray(ref, dtype=np.float64)
    err = ref - np.asarray(test, dtype=np.float64)
    p_sig = float(np.sum(ref * ref))
    p_err = float(np.sum(err * err))
    if p_err == 0.0:
        return float("inf")
    return 10.0 * np.log10(p_sig / p_err) if p_sig > 0 else 0.0


def decode(data: bytes, fmt: str) -> tuple[np.ndarray, int]:
    """Dispatch on fmt. rawa1 and the lossy mulw1 are real; compressed
    codecs are honest stubs (no soundfile/ffmpeg in this container)."""
    if fmt == "rawa1":
        return rawa_decode(data)
    if fmt == "mulw1":
        return mulaw_decode(data)
    raise NotImplementedError(
        f"audio codec {fmt!r} requires a decoder library not present in "
        "this container; plug one in here (soundfile / ffmpeg bindings) — "
        "every downstream kernel takes (float mono, sample_rate) and is "
        "codec-agnostic."
    )


def resample_linear(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Linear-interpolation resample (the area-mean analog for 1-D).
    Adequate for feature extraction; a production path would swap in a
    windowed-sinc kernel behind the same signature."""
    if sr_in == sr_out or len(x) == 0:
        return np.asarray(x, dtype=np.float64)
    n_out = max(1, int(round(len(x) * sr_out / sr_in)))
    src_pos = np.arange(n_out, dtype=np.float64) * (len(x) - 1) / max(1, n_out - 1)
    return np.interp(src_pos, np.arange(len(x), dtype=np.float64), x)


def frame_spectrogram(
    x: np.ndarray, frame: int = 512, hop: int = 256
) -> np.ndarray:
    """Hann-windowed magnitude spectrogram, (n_frames, frame//2+1).
    Fully vectorized: stride-tricked frame matrix -> one batched rfft."""
    x = np.asarray(x, dtype=np.float64)
    if len(x) < frame:
        x = np.pad(x, (0, frame - len(x)))
    n_frames = 1 + (len(x) - frame) // hop
    idx = np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None]
    win = np.hanning(frame)
    return np.abs(np.fft.rfft(x[idx] * win, axis=1))


def band_edges(sr: int, n_bands: int, n_bins: int, frame: int) -> np.ndarray:
    """Log-spaced band edge bin indices, length n_bands+1, strictly
    increasing and bounded by n_bins-1.

    ADVICE r3 fix: the old version added arange() to EVERY edge after
    clipping, which (a) skewed band boundaries even when the log-spaced
    edges were already strictly increasing and (b) could push the top
    edges past n_bins-1 at low sample rates / small frames, collapsing
    top bands to log(1e-12). Now duplicates are bumped minimally
    (cummax(e - i) + i leaves already-strict sequences untouched) and
    the result is pulled back under the strictly-increasing cap line
    n_bins-1-(n-1-i) — the elementwise min of two strictly increasing
    sequences stays strictly increasing, so every band keeps >= 1 bin
    in-bounds."""
    n = n_bands + 1
    if n_bins <= n:
        raise ValueError(
            f"spectrogram has {n_bins} bins; need > {n} for {n_bands} "
            "bands with one bin each — raise the frame size"
        )
    fmax = FP_FMAX_FRAC * sr
    freqs = np.geomspace(FP_FMIN, fmax, n)
    edges = np.clip((freqs * frame / sr).astype(np.int64), 1, n_bins - 1)
    i = np.arange(n)
    edges = np.maximum.accumulate(edges - i) + i
    return np.minimum(edges, (n_bins - 1) - (n - 1 - i))


def band_energies(spec: np.ndarray, sr: int, n_bands: int, frame: int) -> np.ndarray:
    """(n_frames, n_bins) magnitudes -> (n_frames, n_bands) log band
    energies."""
    edges = band_edges(sr, n_bands, spec.shape[1], frame)
    # cumulative sum over bins -> band sums are two gathers and a subtract
    cs = np.cumsum(spec * spec, axis=1)
    lo = np.minimum(edges[:-1], spec.shape[1] - 1)
    hi = np.minimum(edges[1:], spec.shape[1] - 1)
    e = cs[:, hi] - cs[:, lo]
    return np.log(e + 1e-12)


def audio_fp64(
    x: np.ndarray, sr: int, frame: int = 512, hop: int = 256,
    spec: np.ndarray = None,
) -> int:
    """64-bit spectro-temporal fingerprint: pool log band energies to an
    8x9 (time, band) grid, take the 8 adjacent band differences per
    time slice, bit = diff > 0. Gain-invariant, noise-robust; feeds
    hash_band_table unchanged. Pass a precomputed ``spec`` (same
    frame/hop) to skip the FFT — audio_features_one shares one
    spectrogram between the centroid and the fingerprint."""
    if sr <= 0:
        return 0  # degenerate header: no band geometry is definable
    if spec is None:
        spec = frame_spectrogram(x, frame, hop)
    le = band_energies(spec, sr, FP_BANDS, frame)
    n_frames = le.shape[0]
    # pool frames into FP_TIME_SLICES equal time slices (mean log energy)
    slice_ids = np.minimum(
        (np.arange(n_frames) * FP_TIME_SLICES) // max(1, n_frames),
        FP_TIME_SLICES - 1,
    )
    pooled = np.zeros((FP_TIME_SLICES, FP_BANDS))
    np.add.at(pooled, slice_ids, le)
    counts = np.bincount(slice_ids, minlength=FP_TIME_SLICES)[:, None]
    pooled /= np.maximum(counts, 1)
    bits = (np.diff(pooled, axis=1) > 0).reshape(-1)  # 8 x 8 = 64 bits
    word = np.packbits(bits).view(">u8")[0]
    return int(word.astype(np.uint64).view(np.int64))  # int64 view


def audio_features_one(x: np.ndarray, sr: int) -> dict:
    """Per-clip scalar features (all real numpy): duration, RMS,
    zero-crossing rate, spectral centroid (Hz), plus the fp64."""
    n = len(x)
    dur = n / sr if sr else 0.0
    rms = float(np.sqrt(np.mean(x * x))) if n else 0.0
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if n > 1 else 0.0
    spec = frame_spectrogram(x)
    power = spec * spec
    tot = power.sum()
    if sr and tot > 0:
        freqs = np.fft.rfftfreq(512, d=1.0 / sr)
        centroid = float((power.sum(axis=0) * freqs).sum() / tot)
    else:
        centroid = 0.0
    return {
        "duration_s": dur,
        "rms": rms,
        "zcr": zcr,
        "centroid_hz": centroid,
        "fp64": audio_fp64(x, sr, spec=spec),
    }


def audio_quality_one(x: np.ndarray, sr: int, frame: int = 256) -> dict:
    """Per-clip quality signals (the audio analog of text.py's
    quality_signals, all vectorized numpy over the decoded waveform):

    - clipping_frac: fraction of samples at int16 full scale (hard
      clipping / limiter damage).
    - silence_frac: fraction of ``frame``-sample windows with RMS below
      a -46 dBFS floor (dead air).
    - crest_db: peak-to-RMS ratio in dB (near 0 = square-wave-like or
      heavily compressed; very high = impulsive noise).
    - dc_offset: mean sample value (recording-chain fault indicator).
    """
    n = len(x)
    if n == 0:
        return {
            "clipping_frac": 0.0, "silence_frac": 1.0,
            "crest_db": 0.0, "dc_offset": 0.0,
        }
    ax = np.abs(x)
    clipping = float((ax >= 32766.5 / 32768.0).mean())
    n_frames = n // frame
    if n_frames:
        fr = x[: n_frames * frame].reshape(n_frames, frame)
        frame_rms = np.sqrt((fr * fr).mean(axis=1))
        silence = float((frame_rms < 0.005).mean())
    else:
        silence = float(np.sqrt((x * x).mean()) < 0.005)
    rms = float(np.sqrt((x * x).mean()))
    peak = float(ax.max())
    crest = 20.0 * np.log10((peak + 1e-12) / (rms + 1e-12))
    return {
        "clipping_frac": clipping,
        "silence_frac": silence,
        "crest_db": float(crest),
        "dc_offset": float(x.mean()),
    }
