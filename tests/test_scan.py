"""Batch scan + manifest resume tests (config 5: library-scale scans)."""

import json
import shutil

import numpy as np
import pytest

pytest.importorskip("jax")

from mp3rgain_tpu import cli, scan  # noqa: E402
from mp3rgain_tpu.ops import histogram as hi  # noqa: E402


@pytest.fixture()
def library(fixtures_dir, tmp_path):
    paths = []
    for i in range(20):
        name = ["test_vbr.mp3", "test_joint_stereo.mp3", "test_mono.mp3"][i % 3]
        dst = tmp_path / f"track{i:02d}.mp3"
        shutil.copy(fixtures_dir / name, dst)
        paths.append(dst)
    return paths


def test_scan_matches_sequential(library):
    from mp3rgain_tpu import analysis

    res = scan.scan_files(library[:6])
    for p in library[:6]:
        got = res.results[str(p)]
        seq = analysis.analyze_track_internal(p).result
        assert got.gain_db == pytest.approx(seq.gain_db, abs=1e-9)
    assert res.audio_seconds > 5.0
    assert res.realtime_factor > 0


def test_manifest_resume(library, tmp_path):
    manifest = tmp_path / "scan.json"
    r1 = scan.scan_files(library, manifest_path=manifest)
    assert r1.resumed == 0
    assert manifest.exists()
    r2 = scan.scan_files(library, manifest_path=manifest)
    assert r2.resumed == len(library)
    for p in library:
        assert r2.results[str(p)].gain_db == r1.results[str(p)].gain_db
        assert np.array_equal(r2.histograms[str(p)], r1.histograms[str(p)])
    # Touching a file invalidates its manifest entry.
    library[0].touch()
    import os, time
    os.utime(library[0], (time.time() + 5, time.time() + 5))
    r3 = scan.scan_files(library, manifest_path=manifest)
    assert r3.resumed == len(library) - 1


def test_album_union_matches_sequential(library):
    from mp3rgain_tpu import analysis

    subset = library[:6]
    res = scan.scan_files(subset)
    loud, gain, peak = scan.album_union(res, subset)
    seq = analysis.analyze_album(subset)
    assert gain == pytest.approx(seq.album_gain_db, abs=1e-9)
    assert peak == pytest.approx(seq.album_peak, abs=1e-6)


def test_cli_batch_track_gain(library, capsys):
    rc = cli.main(["-q", "--batch", "-r", "-n", "-o", "json", *map(str, library)])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert len(out["files"]) == len(library)
    assert all(r["status"] == "dry_run" for r in out["files"])


def test_cli_batch_album_gain(library, capsys):
    rc = cli.main(["-a", "-n", "-o", "json", *map(str, library)])  # auto batch (20 >= 16)
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert "album" in out and out["album"]["gain_steps"] is not None


def test_cli_fault_isolation_in_batch(library, tmp_path, capsys):
    bad = tmp_path / "bad.mp3"
    bad.write_bytes(b"corrupt" * 64)
    rc = cli.main(["-q", "--batch", "-r", "-n", "-o", "json", str(bad), *map(str, library[:3])])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    statuses = {r["file"].split("/")[-1]: r["status"] for r in out["files"]}
    assert statuses["bad.mp3"] == "error"
    assert all(v == "dry_run" for k, v in statuses.items() if k != "bad.mp3")
