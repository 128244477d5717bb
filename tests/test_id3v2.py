"""ID3v2 TXXX backend tests (-s i — implemented where the reference
falls back to APEv2, src/main.rs:256-258)."""

import shutil
import struct

import pytest

from mp3rgain_tpu import id3v2
from mp3rgain_tpu.ape import ApeTag, TAG_MP3GAIN_MINMAX, TAG_MP3GAIN_UNDO
from mp3rgain_tpu.bitstream import Mp3Error, analyze, apply_gain_with_undo, undo_gain


def _syncsafe(n):
    return bytes(((n >> s) & 0x7F) for s in (21, 14, 7, 0))


def _txxx_v23(desc: bytes, value: bytes) -> bytes:
    payload = b"\x00" + desc + b"\x00" + value
    return b"TXXX" + struct.pack(">I", len(payload)) + b"\x00\x00" + payload


def _tit2_v23(text: bytes) -> bytes:
    payload = b"\x00" + text
    return b"TIT2" + struct.pack(">I", len(payload)) + b"\x00\x00" + payload


def _make_tag_v23(frames: bytes, padding: int = 0) -> bytes:
    return b"ID3" + bytes((3, 0, 0)) + _syncsafe(len(frames) + padding) + frames + bytes(padding)


AUDIO = b"\xff\xfb\x90\x00" + bytes(412)  # not a real frame; bytes only


def test_read_roundtrip_plain_file(tmp_path):
    p = tmp_path / "a.mp3"
    p.write_bytes(AUDIO)
    assert id3v2.read_id3_tag_from_file(p) is None

    tag = ApeTag()
    tag.set_undo_gain(2, 2, False)
    tag.set_minmax(89, 189)
    id3v2.write_id3_tag(p, tag)

    back = id3v2.read_id3_tag_from_file(p)
    assert back.get(TAG_MP3GAIN_UNDO) == "+002,+002,N"
    assert back.get(TAG_MP3GAIN_MINMAX) == "89,189"
    # Audio bytes untouched after the tag.
    assert p.read_bytes().endswith(AUDIO)


def test_write_preserves_foreign_frames_and_reuses_padding(tmp_path):
    p = tmp_path / "a.mp3"
    frames = _tit2_v23(b"My Song") + _txxx_v23(b"MusicBrainz Id", b"abc-123")
    p.write_bytes(_make_tag_v23(frames, padding=256) + AUDIO)
    size_before = p.stat().st_size

    tag = ApeTag()
    tag.set_undo_gain(-3, -3, False)
    id3v2.write_id3_tag(p, tag)

    # Fits in padding: file size unchanged, foreign frames intact.
    assert p.stat().st_size == size_before
    data = p.read_bytes()
    assert b"My Song" in data and b"MusicBrainz Id" in data
    back = id3v2.read_id3_tag_from_file(p)
    assert back.get(TAG_MP3GAIN_UNDO) == "-003,-003,N"


def test_write_grows_tag_when_no_padding(tmp_path):
    p = tmp_path / "a.mp3"
    frames = _tit2_v23(b"KeepMe")
    p.write_bytes(_make_tag_v23(frames, padding=0) + AUDIO)

    tag = ApeTag()
    tag.set_undo_gain(1, 1, False)
    tag.set_minmax(10, 200)
    id3v2.write_id3_tag(p, tag)

    data = p.read_bytes()
    assert data.endswith(AUDIO)
    assert b"KeepMe" in data
    back = id3v2.read_id3_tag_from_file(p)
    assert back.get(TAG_MP3GAIN_UNDO) == "+001,+001,N"
    assert back.get(TAG_MP3GAIN_MINMAX) == "10,200"


def test_replaces_existing_owned_frames(tmp_path):
    p = tmp_path / "a.mp3"
    frames = _txxx_v23(b"MP3GAIN_UNDO", b"+005,+005,N")
    p.write_bytes(_make_tag_v23(frames, padding=128) + AUDIO)

    tag = ApeTag()
    tag.set_undo_gain(7, 7, False)
    id3v2.write_id3_tag(p, tag)
    back = id3v2.read_id3_tag_from_file(p)
    assert back.get(TAG_MP3GAIN_UNDO) == "+007,+007,N"
    assert p.read_bytes().count(b"MP3GAIN_UNDO") == 1


def test_delete_items_keeps_foreign_tag(tmp_path):
    p = tmp_path / "a.mp3"
    frames = (_tit2_v23(b"KeepMe")
              + _txxx_v23(b"MP3GAIN_UNDO", b"+005,+005,N")
              + _txxx_v23(b"REPLAYGAIN_TRACK_GAIN", b"-1.20 dB"))
    p.write_bytes(_make_tag_v23(frames) + AUDIO)

    id3v2.delete_id3_tag_items(p)
    data = p.read_bytes()
    assert b"KeepMe" in data
    assert b"MP3GAIN_UNDO" not in data and b"REPLAYGAIN_TRACK_GAIN" not in data
    assert id3v2.read_id3_tag_from_file(p) is None


def test_delete_drops_tag_when_empty(tmp_path):
    p = tmp_path / "a.mp3"
    frames = _txxx_v23(b"MP3GAIN_UNDO", b"+005,+005,N")
    p.write_bytes(_make_tag_v23(frames) + AUDIO)
    id3v2.delete_id3_tag_items(p)
    assert p.read_bytes() == AUDIO


def test_utf16_foreign_value_reads(tmp_path):
    p = tmp_path / "a.mp3"
    desc = "REPLAYGAIN_TRACK_GAIN".encode("utf-16-le")
    val = "-6.50 dB".encode("utf-16-le")
    payload = b"\x01\xff\xfe" + desc + b"\x00\x00\xff\xfe" + val
    frame = b"TXXX" + struct.pack(">I", len(payload)) + b"\x00\x00" + payload
    p.write_bytes(_make_tag_v23(frame) + AUDIO)
    back = id3v2.read_id3_tag_from_file(p)
    assert back.get("REPLAYGAIN_TRACK_GAIN") == "-6.50 dB"


def test_v22_and_unsync_refused(tmp_path):
    p = tmp_path / "a.mp3"
    p.write_bytes(b"ID3" + bytes((2, 0, 0)) + _syncsafe(0) + AUDIO)
    with pytest.raises(id3v2.Id3Error):
        id3v2.check_writable(p)
    assert id3v2.read_id3_tag_from_file(p) is None

    p.write_bytes(b"ID3" + bytes((3, 0, 0x80)) + _syncsafe(0) + AUDIO)
    with pytest.raises(id3v2.Id3Error):
        id3v2.check_writable(p)


def test_apply_undo_roundtrip_id3_backend(fixtures_dir, tmp_path):
    """Full surgery roundtrip with undo bookkeeping in ID3v2: apply,
    verify the TXXX frames, undo, verify byte-identity."""
    p = tmp_path / "t.mp3"
    shutil.copy(fixtures_dir / "test_joint_stereo.mp3", p)
    original = p.read_bytes()

    before = analyze(p)
    frames = apply_gain_with_undo(p, 2, backend="id3")
    assert frames > 0
    tag = id3v2.read_id3_tag_from_file(p)
    assert tag.get(TAG_MP3GAIN_UNDO) == "+002,+002,N"
    assert tag.get(TAG_MP3GAIN_MINMAX) is not None
    # The gain actually moved.
    assert analyze(p).avg_gain == pytest.approx(before.avg_gain + 2, abs=0.01)

    frames = undo_gain(p, backend="id3")
    assert frames > 0
    assert p.read_bytes() == original  # tag dropped + gain restored


def test_cli_s_i_apply_and_undo(fixtures_dir, tmp_path, capsys):
    """CLI flow: -g 2 -s i writes ID3v2 undo info; -u -s i restores."""
    from mp3rgain_tpu import cli

    p = tmp_path / "t.mp3"
    shutil.copy(fixtures_dir / "test_joint_stereo.mp3", p)
    original = p.read_bytes()

    rc = cli.main(["-g", "2", "-s", "i", str(p)])
    assert rc == 0
    assert id3v2.read_id3_tag_from_file(p) is not None
    from mp3rgain_tpu.ape import read_ape_tag_from_file

    assert read_ape_tag_from_file(p) is None  # APE untouched under -s i

    rc = cli.main(["-u", "-s", "i", str(p)])
    assert rc == 0
    assert p.read_bytes() == original
