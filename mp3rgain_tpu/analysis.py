"""ReplayGain analysis drivers: the host↔device glue.

Single-track and album analysis mirroring the reference drivers
(/root/reference/src/replaygain.rs:796-941, 1031-1074): native entropy
decode → device decode back-end → equal-loudness filter → RMS windows →
loudness histogram → host percentile readout; gain = PINK_REF − loudness.

Batched multi-track / multi-device analysis lives in
mp3rgain_tpu.parallel.runner; these drivers are the simple sequential
path used by the CLI for small file sets.
"""

from __future__ import annotations

import os

import numpy as np

import jax.numpy as jnp

from . import mp4meta
from .decode import frontend, synthesis
from .ops import histogram as hi
from .ops import iir
from .replaygain import (
    AlbumGainResult,
    PINK_REF,
    PeakAmplitudeResult,
    ReplayGainResult,
)

# Filters operate in the 16-bit integer sample range, not normalized floats
# (reference src/replaygain.rs:943-949).
SAMPLE_SCALE_16BIT = 32768.0


class AnalysisError(RuntimeError):
    pass


class TrackAnalysisInternal:
    def __init__(self, result: ReplayGainResult, hist: np.ndarray):
        self.result = result
        self.histogram = hist


def _detect_file_type(path) -> str:
    return "aac" if mp4meta.is_mp4_file(path) else "mp3"


def _decode_for_analysis(path, dtype):
    file_type = _detect_file_type(path)
    if file_type == "aac":
        from . import aac

        pcm, sr = aac.decode_file(path, dtype=dtype)
    else:
        pcm, sr = synthesis.decode_file(path, dtype=dtype)
    if sr == 0 or pcm.shape[1] == 0:
        raise AnalysisError(f"No decodable audio in {path}")
    return pcm, sr, file_type


def analyze_track_internal(
    path: os.PathLike | str,
    track_index: int | None = None,
    dtype=jnp.float32,
) -> TrackAnalysisInternal:
    if track_index not in (None, 0):
        raise AnalysisError(
            f"Track index {track_index} out of range (file has 1 audio track(s))"
        )
    pcm, sr, file_type = _decode_for_analysis(path, dtype)

    # Peak in normalized units over the analysis channels (ch0/ch1 only,
    # reference src/replaygain.rs:961-1023).
    ch = pcm[:2]
    peak = float(np.abs(np.asarray(ch)).max())

    x = jnp.asarray(np.asarray(ch), dtype) * SAMPLE_SCALE_16BIT
    filtered = iir.equal_loudness(x, sr)
    hist = hi.loudness_histogram(
        filtered[None], np.array([filtered.shape[-1]]), sr
    )[0]
    hist = np.asarray(hist)

    loudness_db = hi.loudness_from_histogram(hist)
    gain_db = PINK_REF - loudness_db
    result = ReplayGainResult(
        loudness_db=loudness_db,
        gain_db=gain_db,
        peak=peak,
        sample_rate=sr,
        file_type=file_type,
    )
    return TrackAnalysisInternal(result, hist)


def analyze_album(files, track_index: int | None = None, dtype=jnp.float32) -> AlbumGainResult:
    """Sequential album analysis: union histogram (duration-weighted), peak
    max — mirrors reference analyze_album_with_index
    (src/replaygain.rs:1044-1074). The data-parallel mesh version is in
    mp3rgain_tpu.parallel.runner."""
    tracks = []
    album_peak = 0.0
    album_hist = np.zeros(hi.HISTOGRAM_SIZE, dtype=np.uint64)
    for f in files:
        internal = analyze_track_internal(f, track_index, dtype=dtype)
        album_peak = max(album_peak, internal.result.peak)
        album_hist += internal.histogram.astype(np.uint64)
        tracks.append(internal.result)
    album_loudness = hi.loudness_from_histogram(album_hist)
    return AlbumGainResult(
        tracks=tracks,
        album_loudness_db=album_loudness,
        album_gain_db=PINK_REF - album_loudness,
        album_peak=album_peak,
    )


def find_peak_amplitude(path: os.PathLike | str, dtype=jnp.float32) -> PeakAmplitudeResult:
    """True decoded peak over all channels (reference src/replaygain.rs:1140-1249).

    Unlike the reference's decoder (which clips at ±1.0), the TPU decode
    path reports the true unclipped peak — matching original mp3gain."""
    pcm, sr, _ = _decode_for_analysis(path, dtype)
    peak = float(np.abs(np.asarray(pcm)).max())
    return PeakAmplitudeResult(peak=peak, peak_pcm=peak * SAMPLE_SCALE_16BIT, sample_rate=sr)
