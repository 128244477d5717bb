"""Device-side AAC spectral prep (decode/aac_prep.py) vs the host oracle.

The Q path ships quantized coefficients + band metadata and replays
requantize/PNS/stereo on device; the host full-decode (f32) path is the
oracle. PNS noise is decoder-specific by design, so noise bands compare
by ENERGY (which both sides normalize exactly); everything else must
match to float rounding. TNS/short-window frames must route through the
host-decode fallback sideband and reproduce the host spectra at f16
block-scaling precision.
"""

import numpy as np
import pytest

from mp3rgain_tpu import aac
from mp3rgain_tpu.decode import aac_frontend as af
from mp3rgain_tpu.decode import aac_prep
from mp3rgain_tpu.decode.aac_format_tables import (
    SWB_1024_MAP,
    SWB_LONG_TABLES,
)
from mp3rgain_tpu.testing import craft_aac


def _prep(data):
    """Run the Q transfer + device prep; return (spec (n,1024) np, uq)."""
    uq = af.unpack_adts_q(data)
    nch = uq.n_channels or 1
    args = aac.prepare_batch_arrays_aac_q([uq], nch)
    spec = aac_prep.prep_spectra(
        *args[:7], sample_rate=uq.sample_rate, n_channels=nch
    )
    n = (uq.n // nch) * nch
    return np.asarray(spec)[0, :n], uq


QUADS = [(1, 0, -1, 0), (0, 1, 0, 0), (-1, -1, 1, 0), (1, 1, 1, 1)]

SCE_CASES = {
    "plain": dict(band_quads=QUADS),
    "pulse-on-nonzero": dict(band_quads=QUADS, pulses=[(0, 3)]),
    "pulse-on-zero": dict(band_quads=QUADS, pulses=[(1, 5)]),
    "multi-pulse": dict(
        band_quads=QUADS, pulses=[(0, 2), (3, 7), (2, 1), (5, 4)],
        pulse_start_sfb=1,
    ),
}


@pytest.mark.parametrize("name", sorted(SCE_CASES))
def test_q_prep_matches_host_sce(name):
    data = craft_aac.craft_sce_stream(8, global_gain=140, **SCE_CASES[name])
    spec_q, uq = _prep(data)
    ref = af.unpack_adts(data)
    assert uq.n == ref.n
    assert not len(uq.fbrows), "pulses must not trigger fallback"
    scale = np.abs(ref.spec).max() + 1e-12
    assert np.abs(spec_q - ref.spec).max() < 2e-5 * scale


CPE_ENERGY = {b: (1, -1, 1, 0) for b in range(0, 12)}
CPE_RIGHT = {b: (0, 1, -1, 1) for b in range(0, 8)}

CPE_CASES = {
    "ms-only": dict(
        n_bands=20, left_energy=CPE_ENERGY, right_energy=CPE_RIGHT,
        ms_used={1, 3, 5, 7, 9},
    ),
    "is-plus-minus": dict(
        n_bands=20, left_energy=CPE_ENERGY,
        is_bands={12: (15, 4), 13: (14, -2), 14: (15, 0)},
    ),
    "is-under-ms": dict(
        n_bands=20, left_energy=CPE_ENERGY,
        is_bands={12: (15, 4), 13: (14, 3)},
        ms_used={12, 13, 2, 4},
    ),
    "ms-on-zero-right": dict(
        n_bands=20, left_energy=CPE_ENERGY, ms_used=set(range(16)),
    ),
}


@pytest.mark.parametrize("name", sorted(CPE_CASES))
def test_q_prep_matches_host_cpe(name):
    data = craft_aac.craft_cpe_stream(8, global_gain=140, **CPE_CASES[name])
    spec_q, uq = _prep(data)
    ref = af.unpack_adts(data)
    assert uq.n == ref.n
    assert not len(uq.fbrows)
    scale = np.abs(ref.spec).max() + 1e-12
    assert np.abs(spec_q - ref.spec).max() < 2e-5 * scale


def test_q_tns_routes_to_fallback():
    data = craft_aac.craft_sce_stream(
        6, n_bands=40, global_gain=140,
        energy={b: (1, -1, 1, 0) for b in range(0, 30)},
        tns=dict(length=40, order=3, coefs=[5, 2, 7]),
    )
    spec_q, uq = _prep(data)
    ref = af.unpack_adts(data)
    assert len(uq.fbrows) == uq.n, "every TNS frame must fall back"
    assert np.all(uq.info[:, 7] & af.FLAG_FALLBACK)
    # Fallback rows are block-scaled f16 of the full host decode.
    scale = np.abs(ref.spec).max() + 1e-12
    assert np.abs(spec_q - ref.spec).max() < 2e-3 * scale


def test_q_encoded_fixture_pns_energy_and_loudness(fixtures_dir):
    from mp3rgain_tpu.testing import fixtures as fx

    sr = 44100
    rng = np.random.default_rng(3)
    t = np.arange(sr * 4) / sr
    wave = 0.3 * np.sin(2 * np.pi * 523.0 * t)
    wave += 0.05 * rng.standard_normal(len(t))
    pcm = np.stack([wave, np.roll(wave, 13)], axis=1).astype(np.float32)
    m4a = fx.encode_m4a(pcm, sr, bitrate=96000)  # low rate: PNS-heavy
    adts = af.mp4_to_adts(m4a)

    spec_q, uq = _prep(adts)
    ref = af.unpack_adts(adts)
    n = uq.n
    swb = SWB_LONG_TABLES[SWB_1024_MAP[af.ADTS_SR_INDEX[uq.sample_rate]]]

    # Band classification per lane pair: exclude from the exact compare
    # every band touched by noise through PNS/MS/IS coupling.
    nch = uq.n_channels
    fb_lanes = set(int(r) for r in uq.fbrows)
    checked_noise = 0
    for lane in range(n):
        if lane in fb_lanes:
            # Host-decoded fallback rows: block-scaled f16 precision.
            d = np.abs(spec_q[lane] - ref.spec[lane]).max()
            s = np.abs(ref.spec[lane]).max() + 1e-9
            assert d < 2e-3 * s, lane
            continue
        bt = uq.btype[lane]
        frame = lane - (lane % nch)
        noisy_left = uq.btype[frame] == 2
        ms = uq.msf[lane] == 1
        own_noise = bt == 2
        coupled = own_noise | (ms & noisy_left)
        if lane % nch == 1:
            coupled |= ((bt == 3) | (bt == 4)) & noisy_left
        for k in range(len(swb) - 1):
            a, b = swb[k], swb[k + 1]
            if k < 64 and coupled[k]:
                if k < 64 and own_noise[k]:
                    eq = float((spec_q[lane, a:b] ** 2).sum())
                    eh = float((ref.spec[lane, a:b] ** 2).sum())
                    assert eq == pytest.approx(eh, rel=2e-2, abs=1e-20)
                    checked_noise += 1
            else:
                d = np.abs(spec_q[lane, a:b] - ref.spec[lane, a:b]).max()
                s = np.abs(ref.spec[lane, a:b]).max() + 1e-9
                assert d < 3e-5 * s + 1e-9, (lane, k)
    assert checked_noise > 0, "fixture grew no PNS bands; raise duration"

    # Full path: loudness/peak must agree with the host-requant path
    # (PNS realizations differ; energy parity keeps loudness aligned).
    uf = af.unpack_adts(adts, f16=True)
    h_q, l_q, p_q = aac.analyze_batch_q([uq], uq.sample_rate, nch)
    h_f, l_f, p_f = aac.analyze_batch([uf], uf.sample_rate, nch)
    assert abs(float(l_q[0]) - float(l_f[0])) <= 0.02
    assert float(p_q[0]) == pytest.approx(float(p_f[0]), rel=1e-3)


def test_q_escape_sideband_reconstructs_large_coefficients():
    """|q| > 127 ships sparsely (int8 spectrum + escape scatter-add);
    a loud high-bitrate encode produces hundreds of them naturally and
    the device prep must still match the host f32 oracle exactly."""
    from mp3rgain_tpu.testing import fixtures as fx

    sr = 44100
    t = np.arange(sr * 3) / sr
    wave = 0.95 * np.sin(2 * np.pi * 220.0 * t)
    wave *= np.sign(np.sin(2 * np.pi * 0.5 * t))
    pcm = np.stack([wave, wave], axis=1).astype(np.float32)
    adts = af.mp4_to_adts(fx.encode_m4a(pcm, sr, bitrate=256000))

    spec_q, uq = _prep(adts)
    assert len(uq.esc_idx) > 100, "fixture stopped producing escapes"
    assert int(np.abs(uq.esc_val).max()) > 127
    ref = af.unpack_adts(adts)
    fb_lanes = set(int(r) for r in uq.fbrows)
    checked = 0
    for lane in range(uq.n):
        tol = 2e-3 if lane in fb_lanes else 3e-5  # f16 fallback vs f32
        d = np.abs(spec_q[lane] - ref.spec[lane]).max()
        s = np.abs(ref.spec[lane]).max() + 1e-9
        assert d < tol * s, lane
        if lane not in fb_lanes and (uq.esc_idx >> 10 == lane).any():
            checked += 1
    assert checked > 0, "no device-routed lane carried an escape"


def test_q_analyze_batch_mixed_fallback():
    """A batch mixing clean frames and TNS-fallback frames must analyze
    to the same loudness as the host-requant path."""
    clean = craft_aac.craft_sce_stream(20, global_gain=140,
                                       band_quads=QUADS)
    tns = craft_aac.craft_sce_stream(
        20, n_bands=40, global_gain=140,
        energy={b: (1, -1, 1, 0) for b in range(0, 30)},
        tns=dict(length=40, order=3, coefs=[5, 2, 7]),
    )
    for data in (clean, tns):
        uq = af.unpack_adts_q(data)
        uf = af.unpack_adts(data, f16=True)
        _, l_q, p_q = aac.analyze_batch_q([uq], uq.sample_rate, 1)
        _, l_f, p_f = aac.analyze_batch([uf], uf.sample_rate, 1)
        assert abs(float(l_q[0]) - float(l_f[0])) <= 0.02
        assert float(p_q[0]) == pytest.approx(float(p_f[0]), rel=2e-3)
