"""Fused Pallas hybrid tail vs the XLA formulation (the exact oracle).

The fused kernel (decode/hybrid_kernel.py) computes the same math as
decode/synthesis.py with different rounding (single-pass exp2/log2
power, HIGHEST-precision resident GEMMs), so results agree to float
noise, not bit-exactly: loudness within a histogram bin or two, peaks
to ~1e-4 relative.
"""

import numpy as np
import pytest

pytest.importorskip("jax")

import jax.numpy as jnp  # noqa: E402

from mp3rgain_tpu.decode import entropy_kernel as ek  # noqa: E402
from mp3rgain_tpu.decode import frontend as fe  # noqa: E402
from mp3rgain_tpu.ops import histogram as hi  # noqa: E402
from mp3rgain_tpu.parallel import runner as pr  # noqa: E402
from mp3rgain_tpu.testing import fixtures  # noqa: E402


def _mp3(sr, mode, bitrate, ch, seed, seconds=0.5):
    rng = np.random.default_rng(seed)
    n = int(sr * seconds)
    t = np.arange(n) / sr
    wave = 0.4 * np.sin(2 * np.pi * (330 + 60 * seed) * t)
    wave += 0.12 * rng.standard_normal(n)
    pcm = np.clip(wave * 32767, -32768, 32767).astype(np.int16)
    if ch == 2:
        pcm = np.stack([pcm, np.roll(pcm, 7)], axis=1)
    return fixtures.encode_mp3(pcm, sr, bitrate=bitrate, mode=mode)


def _run_both(datas, sr, nch):
    ups = [fe.unpack_data_light(d) for d in datas]
    prep, (counts, scf, srow, sdata, hrow, hdata, info, valid), g_max = (
        pr.prepare_batch_arrays_light(ups, nch, 1)
    )
    spec_b, mout = ek.decode_blocks(
        jnp.asarray(prep.scalars), jnp.asarray(prep.buf),
        jnp.asarray(prep.meta), nb=prep.nb, interpret=True,
    )
    out = []
    for fused in (False, True):
        hist, loud_idx, peak = pr._light_tail(
            spec_b, mout, jnp.asarray(prep.inv), jnp.asarray(counts),
            jnp.asarray(scf), jnp.asarray(srow), jnp.asarray(sdata),
            jnp.asarray(hrow), jnp.asarray(hdata),
            jnp.asarray(info), jnp.asarray(valid),
            nb=prep.nb, g_max=g_max, n_channels=nch, sample_rate=sr,
            dtype=jnp.float32, fused=fused, interpret=True,
        )
        out.append((np.asarray(hist), np.asarray(loud_idx),
                    np.asarray(peak)))
    (h0, l0, p0), (h1, l1, p1) = out
    bsz = len(datas)
    # Loudness: the 95th-percentile bin moves by at most a couple of
    # 0.01 dB bins under float-noise-level PCM differences.
    assert np.all(np.abs(l0[:bsz] - l1[:bsz]) <= 2), (l0[:bsz], l1[:bsz])
    np.testing.assert_allclose(p1[:bsz], p0[:bsz], rtol=2e-4, atol=1e-6)
    # Histograms: identical window counts, near-identical mass placement.
    assert np.array_equal(h0[:bsz].sum(axis=1), h1[:bsz].sum(axis=1))


def test_fused_hybrid_stereo_joint():
    datas = [
        _mp3(44100, fixtures.MODE_JOINT, 128, 2, 1),
        _mp3(44100, fixtures.MODE_JOINT, 192, 2, 2),
    ]
    _run_both(datas, 44100, 2)


def test_fused_hybrid_mono_mpeg2():
    _run_both([_mp3(22050, fixtures.MODE_MONO, 48, 1, 3)], 22050, 1)


def test_fused_hybrid_short_blocks():
    """Castanet-style transients force short/mixed blocks."""
    sr = 44100
    rng = np.random.default_rng(9)
    n = int(sr * 0.5)
    wave = 0.02 * rng.standard_normal(n)
    for pos in range(800, n - 900, 2500):
        wave[pos : pos + 300] += 0.8 * np.sin(
            2 * np.pi * 3000 * np.arange(300) / sr
        ) * np.exp(-np.arange(300) / 60.0)
    pcm = np.clip(wave * 32767, -32768, 32767).astype(np.int16)
    pcm = np.stack([pcm, np.roll(pcm, 3)], axis=1)
    data = fixtures.encode_mp3(pcm, sr, bitrate=128, mode=fixtures.MODE_STEREO)
    _run_both([data], sr, 2)


def test_natural_cores_decomposition_all_rates():
    """The 2-core + mixed-head decomposition must reproduce the full
    mixed-class core for EVERY sample-rate row: the split point P is
    rate-dependent (36 for MPEG-1 rows, wider for LSF rows — the bug
    that motivated this test shipped a hardcoded 36)."""
    from mp3rgain_tpu.decode import hybrid_kernel as hk
    from mp3rgain_tpu.decode.synthesis import _fused_hybrid_cores

    _, _, core_m, _ = _fused_hybrid_cores()
    for sr_row in range(9):
        cores2, head, p, _ = hk.natural_cores(sr_row)
        perm = hk._perms(sr_row)[2]
        q = np.zeros((576, 576))
        q[perm, np.arange(576)] = 1.0
        mixed_nat = q @ core_m

        rng = np.random.default_rng(sr_row)
        x = rng.standard_normal(576)
        want = x @ mixed_nat
        got = x[p:] @ cores2[1][p:] + x[:p] @ head
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
