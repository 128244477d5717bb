"""L0 bitstream core tests.

Ports the reference's in-module unit tests (src/lib.rs:1340-1444) and the
file-level integration tests (tests/integration_tests.rs) to the new API.
"""

import shutil

import pytest

import mp3rgain_tpu as mg
from mp3rgain_tpu import native


def _copy(fixtures_dir, name, tmp_path):
    src = fixtures_dir / name
    dst = tmp_path / name
    shutil.copy(src, dst)
    return dst


# ---------------------------------------------------------------------------
# Unit tier (reference src/lib.rs:1340-1444)
# ---------------------------------------------------------------------------


def test_db_to_steps():
    assert mg.db_to_steps(0.0) == 0
    assert mg.db_to_steps(1.5) == 1
    assert mg.db_to_steps(3.0) == 2
    assert mg.db_to_steps(-1.5) == -1
    assert mg.db_to_steps(2.25) == 2  # round half away from zero


def test_steps_to_db():
    assert mg.steps_to_db(0) == 0.0
    assert mg.steps_to_db(1) == 1.5
    assert mg.steps_to_db(-2) == -3.0


def test_parse_valid_header():
    # 0xFFFB9000 -> MPEG1 Layer III, 128 kbps, 44100 Hz. The analyzer requires
    # a full valid frame; craft one frame of the right size followed by
    # nothing (last-frame validation accepts end at audio_end).
    frame_size = 1152 * 128 * 125 // 44100  # 417
    data = bytearray(frame_size)
    data[0:4] = bytes([0xFF, 0xFB, 0x90, 0x00])
    a = mg.analyze_data(bytes(data))
    assert a.mpeg_version == "MPEG1"
    assert a.channel_mode == "Stereo"
    assert a.frame_count == 1


def test_parse_invalid_header():
    with pytest.raises(mg.Mp3Error):
        mg.analyze_data(bytes(4))
    with pytest.raises(mg.Mp3Error):
        mg.analyze_data(bytes([0xFF, 0xFF, 0x90, 0x00] + [0] * 512))


def test_bit_operations():
    # Mirrors reference test_bit_operations (lib.rs:1377-1400).
    data = bytes([0xAB, 0xCD, 0xEF, 0x12, 0x34])
    assert native.read_bits8(data, 1, 0) == 0xCD
    assert native.read_bits8(data, 1, 4) == 0xDE

    buf = bytearray(data)
    native.write_bits8(buf, 1, 0, 0x42)
    assert buf[1] == 0x42

    buf = bytearray(data)
    native.write_bits8(buf, 1, 4, 0x99)
    assert buf[1] == 0xC9
    assert buf[2] == 0x9F


def test_skip_id3v2_and_audio_end():
    # No trailing tags: audio end == len.
    data = bytes([0xFF, 0xFB, 0x90, 0x00])
    assert native.find_audio_end(data) == 4
    # Trailing ID3v1: audio end drops by 128.
    data2 = data + b"TAG" + bytes(125)
    assert native.find_audio_end(data2) == 4


def test_xing_frame_skipped():
    # Hand-built MPEG1-stereo frame with "Xing" at offset 4 + 32
    # (reference lib.rs:1412-1443) followed by one real frame.
    frame_size = 1152 * 128 * 125 // 44100
    xing = bytearray(frame_size)
    xing[0:4] = bytes([0xFF, 0xFB, 0x90, 0x00])
    xing[36:40] = b"Xing"
    real = bytearray(frame_size)
    real[0:4] = bytes([0xFF, 0xFB, 0x90, 0x00])
    a = mg.analyze_data(bytes(xing + real))
    assert a.frame_count == 1  # Xing frame not counted

    xing[36:40] = b"Info"
    a = mg.analyze_data(bytes(xing + real))
    assert a.frame_count == 1

    xing[36:40] = bytes(4)
    a = mg.analyze_data(bytes(xing + real))
    assert a.frame_count == 2


# ---------------------------------------------------------------------------
# Integration tier with real encoded fixtures
# (reference tests/integration_tests.rs)
# ---------------------------------------------------------------------------

ALL_FIXTURES = [
    "test_stereo.mp3",
    "test_mono.mp3",
    "test_joint_stereo.mp3",
    "test_vbr.mp3",
]


@pytest.mark.parametrize("name", ALL_FIXTURES)
def test_analyze_fixture(fixtures_dir, name):
    a = mg.analyze(fixtures_dir / name)
    assert a.frame_count > 10
    assert 0 <= a.min_gain <= a.max_gain <= 255
    assert a.headroom_steps == 255 - a.max_gain  # integration_tests.rs:417-428


@pytest.mark.parametrize("name", ALL_FIXTURES)
def test_apply_gain_monotonic(fixtures_dir, name, tmp_path):
    path = _copy(fixtures_dir, name, tmp_path)
    before = mg.analyze(path)
    frames = mg.apply_gain(path, 2)
    assert frames == before.frame_count
    after = mg.analyze(path)
    # Gain increases with saturation tolerance (integration_tests.rs).
    assert after.max_gain == min(255, before.max_gain + 2)
    assert after.min_gain == min(255, before.min_gain + 2)


def test_saturation_at_255_and_0(fixtures_dir, tmp_path):
    path = _copy(fixtures_dir, "test_mono.mp3", tmp_path)
    mg.apply_gain(path, 300)
    a = mg.analyze(path)
    assert a.max_gain == 255 and a.min_gain == 255
    mg.apply_gain(path, -300)
    a = mg.analyze(path)
    assert a.max_gain == 0 and a.min_gain == 0


def test_apply_undo_roundtrip(fixtures_dir, tmp_path):
    path = _copy(fixtures_dir, "test_joint_stereo.mp3", tmp_path)
    original = path.read_bytes()
    mg.apply_gain_with_undo(path, 3)
    assert path.read_bytes() != original
    tag = mg.read_ape_tag_from_file(path)
    assert tag is not None and tag.get_undo_gain() == 3
    frames = mg.undo_gain(path)
    assert frames > 0
    # Full byte identity after undo (tag added then fully removed).
    assert path.read_bytes() == original


def test_cumulative_undo(fixtures_dir, tmp_path):
    path = _copy(fixtures_dir, "test_joint_stereo.mp3", tmp_path)
    original = path.read_bytes()
    mg.apply_gain_with_undo(path, 2)
    mg.apply_gain_with_undo(path, 3)
    tag = mg.read_ape_tag_from_file(path)
    assert tag.get_undo_gain() == 5
    mg.undo_gain(path)
    assert path.read_bytes() == original


def test_channel_gain_stereo_only(fixtures_dir, tmp_path):
    path = _copy(fixtures_dir, "test_joint_stereo.mp3", tmp_path)
    before = mg.analyze(path)
    frames = mg.apply_gain_channel(path, mg.Channel.LEFT, 2)
    assert frames == before.frame_count

    mono = _copy(fixtures_dir, "test_mono.mp3", tmp_path)
    with pytest.raises(mg.Mp3Error):
        mg.apply_gain_channel(mono, mg.Channel.LEFT, 2)


def test_channel_undo(fixtures_dir, tmp_path):
    path = _copy(fixtures_dir, "test_stereo.mp3", tmp_path)
    original = path.read_bytes()
    mg.apply_gain_channel_with_undo(path, mg.Channel.RIGHT, -2)
    tag = mg.read_ape_tag_from_file(path)
    assert tag.get(mg.TAG_MP3GAIN_UNDO) == "+000,-002,N"
    # undo_gain uses the left field (0 here): nothing to undo.
    assert mg.undo_gain(path) == 0
    # Apply -2 to left as well, then undo restores both.
    mg.apply_gain_channel_with_undo(path, mg.Channel.LEFT, -2)
    mg.undo_gain(path)
    a = mg.analyze(path)
    orig = mg.analyze_data(original)
    assert a.max_gain == orig.max_gain


def test_zero_gain_identity(fixtures_dir, tmp_path):
    # Zero gain leaves the file byte-identical (integration_tests.rs:431-448).
    path = _copy(fixtures_dir, "test_vbr.mp3", tmp_path)
    original = path.read_bytes()
    assert mg.apply_gain(path, 0) == 0
    assert path.read_bytes() == original


def test_wrap_mode(fixtures_dir, tmp_path):
    path = _copy(fixtures_dir, "test_mono.mp3", tmp_path)
    before = mg.analyze(path)
    # Push max over 255: wrap mode wraps modulo 256.
    steps = 250
    mg.apply_gain_wrap(path, steps)
    after = mg.analyze(path)
    assert after.max_gain == (before.max_gain + steps) % 256 or after.min_gain == (
        before.min_gain + steps
    ) % 256
    # Wrapping back restores exactly.
    mg.apply_gain_wrap(path, -steps)
    a2 = mg.analyze(path)
    assert (a2.min_gain, a2.max_gain) == (before.min_gain, before.max_gain)


def test_frame_index_export(fixtures_dir):
    data = (fixtures_dir / "test_stereo.mp3").read_bytes()
    idx = native.frame_index(data)
    assert idx.shape[1] == 3
    assert (idx[:, 1] > 0).all()
    # Frames are contiguous after the first (CBR).
    assert ((idx[1:, 0] - idx[:-1, 0]) == idx[:-1, 1]).all()
