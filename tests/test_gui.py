"""GUI app-state tests (headless; reference mp3rgui/src/app.rs logic)."""

import shutil

import pytest

from mp3rgain_tpu import replaygain
from mp3rgain_tpu.gui import AppState
from mp3rgain_tpu.replaygain import REPLAYGAIN_REFERENCE_DB


@pytest.fixture()
def state(fixtures_dir, tmp_path):
    s = AppState()
    for name in ("test_mono.mp3", "test_joint_stereo.mp3"):
        shutil.copy(fixtures_dir / name, tmp_path / name)
    s.add_folder(tmp_path)
    return s


def test_add_files_dedup_and_filters(tmp_path, fixtures_dir):
    s = AppState()
    mp3 = tmp_path / "a.mp3"
    shutil.copy(fixtures_dir / "test_mono.mp3", mp3)
    (tmp_path / "._a.mp3").write_bytes(b"junk")  # resource fork: skipped
    (tmp_path / "notes.txt").write_text("x")  # non-audio: skipped
    assert s.add_files([mp3, mp3, tmp_path / "._a.mp3", tmp_path / "notes.txt"]) == 1
    assert len(s.files) == 1


def test_analyze_and_target_volume_math(state):
    state.analyze_tracks()
    for f in state.files:
        assert f.status == "analyzed"
        assert f.track_gain_db is not None
        # volume = 89 - gain (app.rs display semantics)
        assert f.volume_db == pytest.approx(REPLAYGAIN_REFERENCE_DB - f.track_gain_db)
    # Raising the target by 6 dB raises the computed gain by 6 dB.
    f = state.files[0]
    g1 = state._entry_gain(f)
    state.target_db = REPLAYGAIN_REFERENCE_DB + 6.0
    assert state._entry_gain(f) == pytest.approx(g1 + 6.0)


def test_clip_prediction(state):
    state.analyze_tracks()
    f = state.files[0]
    # Force a target that guarantees predicted clipping: need
    # peak * 10^(gain/20) > 1.
    state.target_db = 100.0
    state._update_clipping(f)
    gain = state._entry_gain(f)
    expected = f.peak * 10.0 ** (gain / 20.0) > 1.0
    assert f.clipping == expected


def test_apply_and_undo_roundtrip(state):
    state.analyze_tracks()
    originals = {f.path: f.path.read_bytes() for f in state.files}
    applied = state.apply_gain(use_album=False)
    assert applied == len(state.files)
    changed = [f for f in state.files if f.path.read_bytes() != originals[f.path]]
    assert changed  # at least the non-zero-gain files were modified
    undone = state.undo_all()
    assert undone == len(changed)
    for f in state.files:
        assert f.path.read_bytes() == originals[f.path]


def test_album_analysis(state):
    state.analyze_album()
    gains = {f.album_gain_db for f in state.files}
    assert len(gains) == 1  # single shared album gain
    assert state.files[0].album_gain_db is not None


def test_rows_render(state):
    state.analyze_tracks()
    rows = list(state.rows())
    assert len(rows) == 2
    assert all(r["track_gain"] != "-" for r in rows)
