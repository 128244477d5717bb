"""AAC/M4A path tests: differential vs the libavcodec oracle + integration.

The framework's AAC-LC decode (native entropy front-end + device
IMDCT/window back-end) must be bit-exact vs the oracle outside PNS bands
(perceptual noise substitution is decoder-specific by design), and the
ReplayGain result must stay within the ±0.05 dB acceptance tolerance.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from mp3rgain_tpu import analysis, mp4meta, replaygain  # noqa: E402
from mp3rgain_tpu.decode import aac_frontend as af, aac_synthesis  # noqa: E402
from mp3rgain_tpu.ops import histogram as hi, iir  # noqa: E402
from mp3rgain_tpu.testing import avcodec, fixtures  # noqa: E402


def _test_pcm(seconds=2.0, sr=44100, channels=2, seed=5, noise=0.03):
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    am = 0.5 + 0.5 * np.sin(2 * np.pi * 1.3 * t)
    wave = (
        0.3 * am * np.sin(2 * np.pi * 440 * t)
        + 0.1 * np.sin(2 * np.pi * 1870 * t)
        + noise * rng.standard_normal(len(t))
    ).astype(np.float32)
    if channels == 1:
        return wave[:, None]
    return np.stack([wave, np.roll(wave, 7)], axis=1)


def _gain_of(pcm, sr):
    x = jnp.asarray(pcm[:2], jnp.float32) * 32768.0
    filt = iir.equal_loudness(x, sr)
    h = hi.loudness_histogram(filt[None], np.array([filt.shape[-1]]), sr)[0]
    return replaygain.PINK_REF - hi.loudness_from_histogram(np.asarray(h))


@pytest.mark.parametrize("channels,bitrate", [(1, 96000), (2, 128000), (2, 256000)])
def test_adts_decode_matches_oracle_outside_pns(channels, bitrate):
    # Tonal signal (no noise floor) so the encoder leaves most frames
    # PNS-free; those must match the oracle bit-near-exactly.
    pcm = _test_pcm(channels=channels, noise=0.0)
    adts = avcodec.encode_adts(pcm, 44100, bitrate=bitrate)
    u = af.unpack_adts(adts)
    assert (u.info[:, af.VALID] == 1).all()
    mine = np.asarray(aac_synthesis.decode_unpacked(u)[0])
    ref = avcodec.decode_adts(adts)[0].T
    assert mine.shape == ref.shape

    # Per-frame: frames without PNS must match to float noise; PNS frames
    # differ by decoder-specific noise (energies still match, checked via
    # the gain assertion below).
    err = np.abs(mine - ref).max(axis=0).reshape(-1, 1024).max(axis=1)
    flags = u.info[:, 7].reshape(-1, u.n_channels).max(axis=1)
    pns_or_next = np.zeros(len(err), dtype=bool)
    pns_or_next |= (flags & 2) > 0
    pns_or_next[1:] |= pns_or_next[:-1].copy()  # overlap-add tail
    clean = ~pns_or_next
    if clean.sum():  # at low stereo bitrates every frame may carry PNS
        assert err[clean].max() < 1e-4, err[clean].max()

    # ReplayGain accuracy incl. PNS frames.
    assert abs(_gain_of(mine, 44100) - _gain_of(ref, 44100)) <= 0.05


def test_m4a_end_to_end(tmp_path):
    pcm = _test_pcm()
    p = tmp_path / "track.m4a"
    p.write_bytes(fixtures.encode_m4a(pcm, 44100))

    assert mp4meta.is_mp4_file(p)
    res = replaygain.analyze_track(p)
    assert res.file_type == "aac"
    assert res.sample_rate == 44100

    # Oracle gain from the same encoded bits. AAC analysis clips decoded
    # samples at ±1.0 (reference/symphonia parity): ffmpeg-aac encoder
    # priming decodes to ±13,218 full scale in the first frames (same in
    # libavcodec's own output), so unclipped peaks would be garbage.
    adts = af.mp4_to_adts(p.read_bytes())
    ref = np.clip(avcodec.decode_adts(adts)[0].T, -1.0, 1.0)
    assert abs(res.gain_db - _gain_of(ref, 44100)) <= 0.05
    assert res.peak == pytest.approx(np.abs(ref).max(), rel=0.1)
    assert res.peak <= 1.0


def test_m4a_tags_and_reanalysis(tmp_path):
    p = tmp_path / "track.m4a"
    p.write_bytes(fixtures.encode_m4a(_test_pcm(), 44100))
    res = replaygain.analyze_track(p)
    tags = mp4meta.ReplayGainTags()
    tags.set_track(res.gain_db, res.peak)
    tags.set_album(res.gain_db - 0.5, res.peak)
    mp4meta.write_replaygain_tags(p, tags)
    got = mp4meta.read_replaygain_tags(p)
    assert got.track_gain == f"{res.gain_db:+.2f} dB"
    # Chunk offsets must have been patched: the file still decodes
    # identically after the moov grew.
    res2 = replaygain.analyze_track(p)
    assert res2.gain_db == res.gain_db
    assert res2.peak == res.peak


def test_album_mixed_mp3_m4a(tmp_path, fixtures_dir):
    import shutil

    m4a = tmp_path / "a.m4a"
    m4a.write_bytes(fixtures.encode_m4a(_test_pcm(), 44100))
    mp3 = tmp_path / "b.mp3"
    shutil.copy(fixtures_dir / "test_joint_stereo.mp3", mp3)
    album = analysis.analyze_album([m4a, mp3])
    assert len(album.tracks) == 2
    assert album.tracks[0].file_type == "aac"
    assert album.tracks[1].file_type == "mp3"
    assert album.album_peak == max(t.peak for t in album.tracks)


def test_cli_track_gain_m4a(tmp_path, capsys):
    from mp3rgain_tpu import cli

    p = tmp_path / "track.m4a"
    p.write_bytes(fixtures.encode_m4a(_test_pcm(), 44100))
    rc = cli.main(["-r", "-o", "json", str(p)])
    assert rc == 0
    import json

    out = json.loads(capsys.readouterr().out)
    rec = out["files"][0]
    assert rec["status"] in ("success", "skipped")
    # AAC apply path writes tags only (reference src/main.rs:2108-2119).
    got = mp4meta.read_replaygain_tags(p)
    if rec["status"] == "success":
        assert got.track_gain is not None


def test_mp4_demux_sample_tables(tmp_path):
    data = fixtures.encode_m4a(_test_pcm(seconds=0.5), 44100)
    adts = af.mp4_to_adts(data)
    u = af.unpack_adts(adts)
    assert u.n > 10
    assert u.sample_rate == 44100
    assert u.n_channels == 2


def test_adts_transient_short_windows_match_oracle():
    """Click train forces the encoder into EIGHT_SHORT windows with real
    grouping (plus LONG_START/STOP transitions) — pins the grouped
    short-window decode path against libavcodec."""
    sr = 44100
    t = np.arange(int(2.0 * sr)) / sr
    click = np.zeros(len(t))
    click[::4410] = 0.9
    click += 0.05 * np.sin(2 * np.pi * 880 * t)
    pcm = np.stack([click, click], axis=1)
    adts = avcodec.encode_adts(pcm, sr, bitrate=192000)
    u = af.unpack_adts(adts)
    seqs = u.info[:, af.WINDOW_SEQ]
    assert (seqs == 2).sum() >= 10, "encoder produced too few short frames"

    mine = np.asarray(aac_synthesis.decode_unpacked(u)[0])
    ref = avcodec.decode_adts(adts)[0].T
    err = np.abs(mine - ref).max(axis=0).reshape(-1, 1024).max(axis=1)
    flags = u.info[:, 7].reshape(-1, u.n_channels).max(axis=1)
    pns_or_next = (flags & 2) > 0
    pns_or_next[1:] |= pns_or_next[:-1].copy()
    clean = ~pns_or_next
    assert clean.sum() > 0
    assert err[clean].max() < 1e-4, err[clean].max()


def test_aac_batch_matches_sequential(tmp_path):
    """Batched AAC analysis (ladder-padded, vmapped) must match the
    per-file path exactly, mixed lengths included."""
    import numpy as np

    from mp3rgain_tpu import aac, scan
    from mp3rgain_tpu.decode import aac_frontend as af

    paths = []
    for i, secs in enumerate((0.6, 1.1, 1.9)):
        p = tmp_path / f"b{i}.m4a"
        p.write_bytes(fixtures.encode_m4a(_test_pcm(seconds=secs, seed=i), 44100))
        paths.append(p)

    seq = [aac.analyze_track_internal(p) for p in paths]
    # f16=True matches the production batch/scan transfer format — the
    # equality contract below requires byte-identical device inputs.
    ups = [af.unpack_file(p, f16=True) for p in paths]
    hists, louds, peaks = aac.analyze_batch(ups, 44100, 2)
    for j, s in enumerate(seq):
        assert float(louds[j]) == s.result.loudness_db
        assert float(peaks[j]) == s.result.peak
        np.testing.assert_array_equal(
            np.asarray(hists[j]), np.asarray(s.histogram)
        )

    # The scan path batches too, with a corrupt file isolated.
    bad = tmp_path / "bad.m4a"
    bad.write_bytes(b"\x00ftypM4A " + b"\x00" * 64)
    res = scan.scan_files(paths + [bad])
    for p, s in zip(paths, seq):
        got = res.results[str(p)]
        assert got.gain_db == s.result.gain_db
        assert got.peak == s.result.peak
    assert isinstance(res.results[str(bad)], Exception)
    assert res.audio_seconds > 3.0
