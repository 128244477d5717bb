"""Mesh runner tests: data-parallel batch analysis + psum album reduction
on the 8-device virtual CPU mesh (conftest forces CPU platform)."""

import shutil

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from mp3rgain_tpu import analysis  # noqa: E402
from mp3rgain_tpu.ops import histogram as hi  # noqa: E402
from mp3rgain_tpu.parallel import MeshRunner, analyze_library  # noqa: E402
from mp3rgain_tpu.replaygain import PINK_REF  # noqa: E402


@pytest.fixture(scope="module")
def album_dir(tmp_path_factory):
    from mp3rgain_tpu.testing import fixtures

    src = fixtures.generate_standard_fixtures(tmp_path_factory.mktemp("src"))
    out = tmp_path_factory.mktemp("album")
    paths = []
    for i in range(12):
        name = "test_joint_stereo.mp3" if i % 2 else "test_vbr.mp3"
        dst = out / f"track{i:02d}.mp3"
        shutil.copy(src / name, dst)
        paths.append(dst)
    return paths


def test_mesh_has_8_devices():
    if jax.default_backend() != "cpu":
        pytest.skip("virtual 8-device mesh only exists on the CPU backend")
    assert len(jax.devices()) == 8


def test_device_loudness_matches_host():
    rng = np.random.default_rng(3)
    for total_target in (1, 19, 20, 21, 40, 1000):
        hist = np.zeros(12000, dtype=np.int32)
        bins = rng.integers(1000, 9000, size=total_target)
        for b in bins:
            hist[b] += 1
        host = hi.loudness_from_histogram(hist.astype(np.uint64))
        dev = float(hi.loudness_from_histogram_device(jnp.asarray(hist)[None])[0])
        assert host == pytest.approx(dev), total_target


def test_batch_matches_sequential(album_dir):
    res = analyze_library(album_dir, album=True)
    assert all(t.ok for t in res.tracks)
    seq = analysis.analyze_album(album_dir)
    for t, s in zip(res.tracks, seq.tracks):
        assert t.result.gain_db == pytest.approx(s.gain_db, abs=1e-9)
        assert t.result.peak == pytest.approx(s.peak, abs=1e-6)
    album_loud = hi.loudness_from_histogram(res.album_histogram.astype(np.uint64))
    assert PINK_REF - album_loud == pytest.approx(seq.album_gain_db, abs=1e-9)
    assert res.album_peak == pytest.approx(seq.album_peak, abs=1e-6)


def test_fault_isolation(album_dir, tmp_path):
    bad = tmp_path / "corrupt.mp3"
    bad.write_bytes(b"not an mp3 at all" * 10)
    paths = list(album_dir[:3]) + [bad]
    res = analyze_library(paths)
    assert [t.ok for t in res.tracks] == [True, True, True, False]
    assert res.tracks[3].error


def test_waves_and_overlap_match_single_pass(album_dir, tmp_path):
    """Tiny waves + tiny batches (forcing carry-over partial buckets,
    multi-bucket interleave, and the one-batch-behind overlap) must
    produce identical results to the plain run, and batch_cb must see
    every ok track exactly once."""
    # Two formats interleaved + one corrupt file mid-stream.
    from mp3rgain_tpu.testing import fixtures

    src = fixtures.generate_standard_fixtures(tmp_path / "src")
    extra = tmp_path / "mono.mp3"
    shutil.copy(src / "test_mono.mp3", extra)
    bad = tmp_path / "corrupt.mp3"
    bad.write_bytes(b"\xff\x00" * 300)
    paths = list(album_dir[:5]) + [bad, extra] + list(album_dir[5:9])

    base = analyze_library(paths, album=True)

    seen = []
    runner = MeshRunner(max_batch=2)
    waved = analyze_library(
        paths, runner=runner, album=True, wave_size=3,
        batch_cb=lambda done: seen.extend(t.path for t in done),
    )
    assert [t.ok for t in base.tracks] == [t.ok for t in waved.tracks]
    for b, w in zip(base.tracks, waved.tracks):
        if not b.ok:
            continue
        assert b.result.gain_db == w.result.gain_db
        assert b.result.peak == w.result.peak
        assert np.array_equal(np.asarray(b.histogram), np.asarray(w.histogram))
    assert sorted(seen) == sorted(str(t.path) for t in base.tracks if t.ok)
    assert np.array_equal(base.album_histogram, waved.album_histogram)
    assert base.album_peak == waved.album_peak


def test_sharded_light_path_matches_single(album_dir):
    """The raw-bits pipeline sharded over the dp mesh (Pallas entropy
    kernel inside shard_map, one grid per device) must match the
    single-device dispatch exactly."""
    if jax.default_backend() != "cpu":
        pytest.skip("needs the virtual 8-device CPU mesh")
    from mp3rgain_tpu.decode import frontend as fe

    ups = [fe.unpack_file_light(p) for p in album_dir[:8]]
    runner = MeshRunner()
    assert runner.n_devices == 8
    h1, l1, p1 = runner.collect(runner.dispatch_light(ups, 44100, 2))
    hs, ls, ps = runner.collect(runner.dispatch_light_sharded(ups, 44100, 2))
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(hs))
    np.testing.assert_array_equal(l1, ls)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(ps))

    # Fewer tracks than devices falls back to the single-device path.
    h2, l2, p2 = runner.collect(
        runner.dispatch_light_sharded(ups[:3], 44100, 2)
    )
    np.testing.assert_array_equal(l2, l1[:3])


def test_explicit_psum_album_reduce(album_dir):
    runner = MeshRunner()
    res = analyze_library(album_dir[:8], runner=runner, album=True)
    hists = np.stack([np.asarray(t.histogram) for t in res.tracks])
    peaks = np.array([t.result.peak for t in res.tracks], dtype=np.float32)
    total_h, total_p = runner.album_reduce_device(hists, peaks)
    assert np.array_equal(np.asarray(total_h), hists.sum(axis=0).astype(np.uint32))
    assert total_p == pytest.approx(peaks.max())


def test_graft_entry_points():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    fn, args = m.entry()
    hist, loud, peak = jax.jit(fn)(*args)
    assert hist.shape == (4, 12000)
    assert loud.shape == (4,)
    m.dryrun_multichip(8)
    m.dryrun_multichip(4)


def test_sharded_aac_path_matches_single():
    """The AAC device-prep pipeline sharded over the dp mesh
    (aac.analyze_batch_q_sharded) must match the single-device batch."""
    if jax.default_backend() != "cpu" or len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device CPU mesh")

    from mp3rgain_tpu import aac
    from mp3rgain_tpu.decode import aac_frontend as af
    from mp3rgain_tpu.testing import craft_aac

    adts = craft_aac.craft_sce_stream(
        6, global_gain=150,
        band_quads=[(1, 0, -1, 0), (0, 1, 0, 0), (-1, -1, 1, 0),
                    (1, 1, 1, 1)],
    )
    uq = af.unpack_adts_q(adts)
    ups = [uq] * 8
    sr, nch = uq.sample_rate, (uq.n_channels or 1)
    h1, l1, p1 = aac.analyze_batch_q(ups, sr, nch)
    hs, ls, ps = aac.analyze_batch_q_sharded(ups, sr, nch)
    assert np.array_equal(np.asarray(h1), np.asarray(hs))
    np.testing.assert_allclose(l1, ls)
    np.testing.assert_allclose(p1, ps, rtol=1e-6)
