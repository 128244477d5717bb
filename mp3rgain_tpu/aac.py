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


class AacError(RuntimeError):
    pass


@lru_cache(maxsize=None)
def _analysis_fn(n_channels: int, sample_rate: int, dtype):
    @partial(jax.jit)
    def run(spec, window_seq, window_shape, valid_samples):
        pcm = aac_synthesis._decode_jit(
            spec, window_seq, window_shape, n_channels=n_channels, dtype=dtype
        )  # (C, N)
        n = pcm.shape[1]
        mask = (jnp.arange(n) < valid_samples)[None, :]
        peak = jnp.max(jnp.abs(pcm) * mask)
        x = pcm.astype(dtype) * dtype(SAMPLE_SCALE_16BIT)
        filtered = iir.equal_loudness(x, sample_rate)
        hist = hi._histogram_jit(
            filtered[None], valid_samples[None], hi.window_size(sample_rate)
        )
        loud_idx = hi.loudness_index_device(hist)
        return hist[0], loud_idx[0], peak

    return run


def _analyze_on_device(path, dtype, track_index=None):
    u = af.unpack_file(path, track_index=track_index)
    if u.n == 0:
        raise AacError("No decodable AAC frames found")
    nch = u.n_channels or 1
    sr = u.sample_rate
    n = (u.n // nch) * nch
    valid = np.int32((n // nch) * 1024)
    fn = _analysis_fn(nch, sr, dtype)
    hist, loud_idx, peak = fn(
        jnp.asarray(u.spec[:n]),
        jnp.asarray(u.info[:n, af.WINDOW_SEQ]),
        jnp.asarray(u.info[:n, af.WINDOW_SHAPE]),
        jnp.asarray(valid),
    )
    stats = np.asarray(
        jnp.stack([loud_idx.astype(jnp.float32), peak.astype(jnp.float32)])
    )
    audio_seconds = float(valid) / sr if sr else 0.0
    return hist, hi.index_to_loudness(stats[0]), float(stats[1]), sr, audio_seconds


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
