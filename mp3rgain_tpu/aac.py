"""AAC/M4A analysis path: host AAC-LC front-end + shared device DSP.

The M4A path reuses the same equal-loudness filter and histogram kernels
as MP3 (BASELINE: "the mp4meta AAC path reuses the same filter+histogram
kernels"); only the decode back-end differs (AAC IMDCT/windowing instead
of the MP3 hybrid filterbank + polyphase).
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp

from .decode import aac_frontend as af
from .decode import aac_synthesis
from .ops import histogram as hi
from .ops import iir
from .replaygain import PINK_REF, PeakAmplitudeResult, ReplayGainResult

SAMPLE_SCALE_16BIT = 32768.0

# AAC analysis clips decoded samples at ±1.0, matching the reference's
# decoder (symphonia clips; the reference's AAC peaks and loudness are
# computed from clipped PCM). This is the opposite of our MP3 contract
# (true unclipped peak, mp3gain parity) because mp3gain never handled
# AAC — the reference IS the AAC peer — and because AAC encoder priming
# can decode to wild magnitudes with no container metadata to trim by
# (ffmpeg-aac fixture: ±13,218 full-scale in samples 1024..4095, bit-
# identical in libavcodec's own decode).
AAC_CLIP = 1.0


class AacError(RuntimeError):
    pass


@lru_cache(maxsize=None)
def _batch_fn(n_channels: int, sample_rate: int, dtype):
    """Batched AAC pipeline: vmapped decode + shared DSP tail.

    Module-level cache + ladder-quantized shapes (prepare_batch_arrays_aac)
    for the same reasons as the MP3 path: compiled executables must
    survive caller churn, and per-track lengths must not each compile."""

    def core(spec, sexp, window_seq, window_shape, valid_samples):
        # Block-scaled f16 transfer format: true spectrum is
        # spec * 2^sexp (sexp all-zero when the host shipped f32).
        spec = spec.astype(dtype) * jnp.exp2(sexp.astype(dtype))[..., None]

        def one(args):
            return aac_synthesis._decode_jit(
                *args, n_channels=n_channels, dtype=dtype
            )

        pcm = jax.vmap(one)((spec, window_seq, window_shape))  # (B, C, N)
        pcm = jnp.clip(pcm, -AAC_CLIP, AAC_CLIP)
        bsz, c, n = pcm.shape
        mask = (jnp.arange(n)[None, None, :] < valid_samples[:, None, None])
        peak = jnp.max(jnp.abs(pcm) * mask, axis=(1, 2))  # (B,)
        x = pcm.reshape(bsz * c, n).astype(dtype) * dtype(SAMPLE_SCALE_16BIT)
        filtered = iir.equal_loudness(x, sample_rate).reshape(bsz, c, n)
        hist = hi._histogram_jit(
            filtered, valid_samples, hi.window_size(sample_rate)
        )
        loud_idx = hi.loudness_index_device(hist)
        return hist, loud_idx, peak

    return jax.jit(core)


def prepare_batch_arrays_aac(unpacked: list, n_channels: int):
    """Pad AAC tracks to ladder-quantized (B, F) shapes for _batch_fn.

    Zero-spectrum padding frames decode to zero PCM; everything past a
    track's valid_samples is masked out of peak and histogram. When
    every track was unpacked with f16=True the batch ships block-scaled
    float16 + per-frame exponents (half the h2d payload); otherwise
    float32 with zero exponents (f16 entries upconvert exactly)."""
    from .parallel.runner import _B_LADDER, _quantize_up

    bsz = len(unpacked)
    f_max = max((u.n // n_channels) * n_channels for u in unpacked)
    f_max = _quantize_up(max(f_max, n_channels), n_channels, base=128,
                         ratio=1.3)
    bpad = next((b for b in _B_LADDER if b >= bsz), bsz)
    all_f16 = all(u.spec16 is not None for u in unpacked)
    # Pooled buffers: beyond skipping first-touch page faults, the
    # runtime caches transfer-path setup (pinning) PER HOST BUFFER —
    # a reused buffer moves h2d at ~1,200 MB/s where a fresh one moves
    # at 20-120 MB/s (measured). analyze_batch gives these back once
    # the transfer has committed.
    from .utils import bufpool

    spec = bufpool.take_zeroed((bpad, f_max, 1024),
                               np.float16 if all_f16 else np.float32)
    sexp = bufpool.take_zeroed((bpad, f_max), np.int8)
    wseq = bufpool.take_zeroed((bpad, f_max), np.int32)
    wshape = bufpool.take_zeroed((bpad, f_max), np.int32)
    valid = np.zeros(bpad, np.int32)
    for i, u in enumerate(unpacked):
        n = (u.n // n_channels) * n_channels
        if all_f16:
            spec[i, :n] = u.spec16[:n]
            sexp[i, :n] = u.sexp[:n]
        elif u.spec16 is not None:
            spec[i, :n] = u.spec16[:n].astype(np.float32)
            spec[i, :n] *= np.exp2(u.sexp[:n].astype(np.float32))[:, None]
        else:
            spec[i, :n] = u.spec[:n]
        wseq[i, :n] = u.info[:n, af.WINDOW_SEQ]
        wshape[i, :n] = u.info[:n, af.WINDOW_SHAPE]
        valid[i] = (n // n_channels) * 1024
    return spec, sexp, wseq, wshape, valid


def analyze_batch(unpacked: list, sample_rate: int, n_channels: int,
                  dtype=jnp.float32):
    """Analyze same-format AAC tracks in one device dispatch.

    Returns (hist (B, 12000) device, louds (B,) np, peaks (B,) np)."""
    import os as _os
    import time as _time

    from .utils import bufpool

    scan_time = bool(_os.environ.get("MP3RGAIN_SCAN_TIME"))
    t0 = _time.monotonic()
    bsz = len(unpacked)
    args = prepare_batch_arrays_aac(unpacked, n_channels)
    t1 = _time.monotonic()
    fn = _batch_fn(n_channels, sample_rate, dtype)
    dev_args = jax.device_put(args)
    # Pooled host buffers go back once the transfer has committed.
    jax.block_until_ready(dev_args)
    bufpool.give(*args[:4])
    t2 = _time.monotonic()
    hist, loud_idx, peak = fn(*dev_args)
    stats = np.asarray(
        jnp.concatenate(
            [loud_idx[:bsz].astype(jnp.float32), peak[:bsz].astype(jnp.float32)]
        )
    )
    if scan_time:
        import sys as _sys

        print(
            f"aac analyze_batch: n={bsz} prepare={t1 - t0:.2f}s "
            f"h2d={t2 - t1:.2f}s compute+stats={_time.monotonic() - t2:.2f}s",
            file=_sys.stderr, flush=True,
        )
    louds = np.array([hi.index_to_loudness(i) for i in stats[:bsz]])
    return hist[:bsz], louds, stats[bsz:]


def _analyze_on_device(path, dtype, track_index=None):
    u = af.unpack_file(path, track_index=track_index, f16=True)
    if u.n == 0:
        raise AacError("No decodable AAC frames found")
    nch = u.n_channels or 1
    sr = u.sample_rate
    hist, louds, peaks = analyze_batch([u], sr, nch, dtype=dtype)
    n = (u.n // nch) * nch
    audio_seconds = (n // nch) * 1024 / sr if sr else 0.0
    return hist[0], float(louds[0]), float(peaks[0]), sr, audio_seconds


def analyze_track_internal(path, dtype=jnp.float32, track_index=None):
    from .analysis import TrackAnalysisInternal

    hist, loudness_db, peak, sr, audio_seconds = _analyze_on_device(
        path, dtype, track_index
    )
    result = ReplayGainResult(
        loudness_db=loudness_db,
        gain_db=PINK_REF - loudness_db,
        peak=peak,
        sample_rate=sr,
        file_type="aac",
    )
    return TrackAnalysisInternal(result, hist, audio_seconds=audio_seconds)


def find_peak_amplitude(path, dtype=jnp.float32) -> PeakAmplitudeResult:
    _, _, peak, sr, _ = _analyze_on_device(path, dtype)
    return PeakAmplitudeResult(
        peak=peak, peak_pcm=peak * SAMPLE_SCALE_16BIT, sample_rate=sr
    )


def decode_file(path, dtype=jnp.float32):
    return aac_synthesis.decode_file(path, dtype)
