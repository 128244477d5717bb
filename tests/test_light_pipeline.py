"""End-to-end raw-bits pipeline vs the host-decoded pipeline (exact).

The light path (host light walk → Pallas entropy kernel → analysis tail,
one dispatch) must produce bit-identical loudness histograms and peaks to
the heavy path (host full unpack → compact manifest → analysis tail) on
every fixture class — they share the tail, so any difference is an
entropy-decode defect.
"""

import numpy as np
import pytest

pytest.importorskip("jax")

from mp3rgain_tpu.decode import frontend as fe  # noqa: E402
from mp3rgain_tpu.parallel import runner as pr  # noqa: E402
from mp3rgain_tpu.testing import fixtures  # noqa: E402


def _tracks(specs):
    out = []
    for sr, mode, bitrate, ch, seed in specs:
        rng = np.random.default_rng(seed)
        n = int(sr * 0.4)
        t = np.arange(n) / sr
        wave = 0.4 * np.sin(2 * np.pi * (300 + 70 * seed) * t)
        wave += 0.1 * rng.standard_normal(n)
        pcm = np.clip(wave * 32767, -32768, 32767).astype(np.int16)
        if ch == 2:
            pcm = np.stack([pcm, np.roll(pcm, 5)], axis=1)
        out.append(fixtures.encode_mp3(pcm, sr, bitrate=bitrate, mode=mode))
    return out


def _compare_batch(datas, sr, nch):
    runner = pr.MeshRunner()
    heavy = [fe.unpack_data(d) for d in datas]
    light = [fe.unpack_data_light(d) for d in datas]
    h_hist, h_loud, h_peak = runner.analyze_unpacked(heavy, sr, nch)
    l_hist, l_loud, l_peak = runner.analyze_unpacked_light(light, sr, nch)
    np.testing.assert_array_equal(np.asarray(h_hist), np.asarray(l_hist))
    np.testing.assert_array_equal(h_loud, l_loud)
    np.testing.assert_array_equal(np.asarray(h_peak), np.asarray(l_peak))


def test_light_pipeline_matches_stereo():
    datas = _tracks([
        (44100, fixtures.MODE_JOINT, 128, 2, 1),
        (44100, fixtures.MODE_JOINT, 128, 2, 2),
        (44100, fixtures.MODE_JOINT, 192, 2, 3),
    ])
    _compare_batch(datas, 44100, 2)


def test_light_pipeline_matches_mono_mpeg2():
    datas = _tracks([(22050, fixtures.MODE_MONO, 48, 1, 4)])
    _compare_batch(datas, 22050, 1)


def test_analyze_library_device_entropy(tmp_path):
    datas = _tracks([
        (44100, fixtures.MODE_STEREO, 160, 2, 5),
        (44100, fixtures.MODE_JOINT, 128, 2, 6),
    ])
    paths = []
    for i, d in enumerate(datas):
        p = tmp_path / f"t{i}.mp3"
        p.write_bytes(d)
        paths.append(p)
    # A corrupt file must stay isolated in both paths.
    bad = tmp_path / "bad.mp3"
    bad.write_bytes(b"\x00" * 4096)
    paths.append(bad)

    host = pr.analyze_library(paths, album=True, device_entropy=False)
    dev = pr.analyze_library(paths, album=True, device_entropy=True)
    assert [t.ok for t in host.tracks] == [t.ok for t in dev.tracks]
    for th, td in zip(host.tracks, dev.tracks):
        if not th.ok:
            continue
        assert th.result.loudness_db == td.result.loudness_db
        assert th.result.peak == td.result.peak
        np.testing.assert_array_equal(
            np.asarray(th.histogram), np.asarray(td.histogram)
        )
    np.testing.assert_array_equal(host.album_histogram, dev.album_histogram)
    assert host.album_peak == dev.album_peak


def test_single_track_device_entropy(tmp_path, monkeypatch):
    data = _tracks([(44100, fixtures.MODE_JOINT, 128, 2, 7)])[0]
    p = tmp_path / "one.mp3"
    p.write_bytes(data)

    from mp3rgain_tpu import analysis

    monkeypatch.setenv("MP3RGAIN_DEVICE_ENTROPY", "0")
    host = analysis.analyze_track_internal(p)
    monkeypatch.setenv("MP3RGAIN_DEVICE_ENTROPY", "1")
    dev = analysis.analyze_track_internal(p)
    assert host.result.loudness_db == dev.result.loudness_db
    assert host.result.peak == dev.result.peak
    np.testing.assert_array_equal(
        np.asarray(host.histogram), np.asarray(dev.histogram)
    )


def test_packed_info_roundtrip():
    """fe.pack_info_light ↔ runner._expand_info_light preserve every
    device-read field at their extreme values (layout documented at
    decode/frontend.py)."""
    rng = np.random.default_rng(0)
    n = 257
    info = np.zeros((n, fe.INFO_N), dtype=np.int32)
    info[:, fe.GLOBAL_GAIN] = rng.integers(0, 256, n)
    info[:, fe.BLOCK_TYPE] = rng.integers(0, 4, n)
    info[:, fe.MIXED] = rng.integers(0, 2, n)
    info[:, fe.SCALEFAC_SCALE] = rng.integers(0, 2, n)
    info[:, fe.PREFLAG] = rng.integers(0, 2, n)
    info[:, fe.INTENSITY_SCALE] = rng.integers(0, 2, n)
    info[:, fe.CHANNEL_MODE] = rng.integers(0, 4, n)
    info[:, fe.VERSION] = rng.choice([1, 2, 3], n)
    info[:, fe.SBG0] = rng.integers(0, 8, n)
    info[:, fe.SBG1] = rng.integers(0, 8, n)
    info[:, fe.SBG2] = rng.integers(0, 8, n)
    info[:, fe.MODE_EXT] = rng.integers(0, 4, n)
    info[:, fe.SR_ROW] = rng.integers(0, 9, n)

    packed = fe.pack_info_light(info)
    assert packed.shape == (n, fe.IP_N) and packed.dtype == np.uint16
    out = np.asarray(pr._expand_info_light(packed))

    for field in (fe.GLOBAL_GAIN, fe.BLOCK_TYPE, fe.MIXED,
                  fe.SCALEFAC_SCALE, fe.PREFLAG, fe.INTENSITY_SCALE,
                  fe.SBG0, fe.SBG1, fe.SBG2, fe.MODE_EXT, fe.SR_ROW):
        np.testing.assert_array_equal(out[:, field], info[:, field], field)
    # Derived flags, not raw values: joint and lsf.
    np.testing.assert_array_equal(
        out[:, fe.CHANNEL_MODE] == 1, info[:, fe.CHANNEL_MODE] == 1
    )
    np.testing.assert_array_equal(
        out[:, fe.VERSION] != 1, info[:, fe.VERSION] != 1
    )


def test_packed_scf_roundtrip():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    n = 33
    scf = np.zeros((n, fe.SCF_SLOTS), np.int32)
    scf[:, :24] = rng.integers(0, 16, (n, 24))
    # A minority of rows carry short-window slots (block_type 2) and a
    # few carry 5-bit values (the LSF intensity case).
    for r in (3, 7, 20):
        scf[r, 24:] = rng.integers(0, 16, fe.SCF_SLOTS - 24)
    scf[5, 2] = 31  # 5-bit long slot
    scf[7, 30] = 17  # 5-bit short slot
    scf[9, 11] = 16  # exactly 16: zero nibble + high bit
    main, srows, sdata, hrows, hmask = fe.pack_scf_rows(scf)
    assert main.shape == (n, fe.SCF_MAIN_BYTES)
    assert sdata.shape[1] == fe.SCF_SIDE_BYTES
    assert hmask.shape[1] == fe.SCF_HI_BYTES
    assert set(hrows) == {5, 7, 9}
    full = np.asarray(pr._expand_scf_flat(
        jnp.asarray(main), jnp.asarray(srows), jnp.asarray(sdata),
        jnp.asarray(hrows), jnp.asarray(hmask),
    ))
    np.testing.assert_array_equal(full[:n], scf)
    np.testing.assert_array_equal(full[n], 0)  # dummy padding row
    with pytest.raises(ValueError):
        fe.pack_scf_rows(np.full((1, fe.SCF_SLOTS), 32))
