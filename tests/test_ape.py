"""APEv2 tag engine tests (reference src/lib.rs:838-1163 semantics)."""

import mp3rgain_tpu as mg
from mp3rgain_tpu import native
from mp3rgain_tpu.ape import (
    ApeTag,
    parse_undo_values,
    read_ape_tag,
    serialize_ape_tag,
    remove_ape_tag,
    write_ape_tag_to_data,
)


def test_tag_set_get_case_insensitive():
    tag = ApeTag()
    tag.set("mp3gain_undo", "+002,+002,N")
    assert tag.get("MP3GAIN_UNDO") == "+002,+002,N"
    tag.set("MP3GAIN_UNDO", "+004,+004,N")
    assert tag.get("mp3gain_undo") == "+004,+004,N"
    assert len(tag.items) == 1
    tag.remove("Mp3Gain_Undo")
    assert tag.is_empty()


def test_undo_gain_format():
    tag = ApeTag()
    tag.set_undo_gain(2, 2, False)
    assert tag.get(mg.TAG_MP3GAIN_UNDO) == "+002,+002,N"
    tag.set_undo_gain(-12, 3, True)
    assert tag.get(mg.TAG_MP3GAIN_UNDO) == "-012,+003,W"
    assert tag.get_undo_gain() == -12


def test_parse_undo_values():
    assert parse_undo_values(None) == (0, 0)
    assert parse_undo_values("+002,+003,N") == (2, 3)
    assert parse_undo_values("+002") == (2, 2)
    assert parse_undo_values("junk") == (0, 0)


def test_serialize_parse_roundtrip():
    tag = ApeTag()
    tag.set_undo_gain(2, 2, False)
    tag.set_minmax(100, 200)
    tag.set("REPLAYGAIN_TRACK_GAIN", "-3.21 dB")
    blob = serialize_ape_tag(tag)
    # Header + footer present with correct sizes.
    assert blob[:8] == b"APETAGEX" and blob[-32:-24] == b"APETAGEX"
    parsed = read_ape_tag(b"\x00" * 64 + blob)
    assert parsed is not None
    assert parsed.get("MP3GAIN_UNDO") == "+002,+002,N"
    assert parsed.get("MP3GAIN_MINMAX") == "100,200"
    assert parsed.get("replaygain_track_gain") == "-3.21 dB"


def test_empty_tag_serializes_to_nothing():
    assert serialize_ape_tag(ApeTag()) == b""


def test_write_remove_with_id3v1():
    audio = bytes(range(256)) * 4
    id3v1 = b"TAG" + bytes(125)
    data = audio + id3v1

    tag = ApeTag()
    tag.set_undo_gain(1, 1, False)
    out = write_ape_tag_to_data(data, tag)
    # APE tag must sit between audio and ID3v1.
    assert out[-128:] == id3v1
    assert out[: len(audio)] == audio
    assert read_ape_tag(out).get_undo_gain() == 1

    # Footer discovery with trailing ID3v1 (lib.rs:955-963).
    assert native.ape_find_footer(out) == len(out) - 128 - 32

    stripped = remove_ape_tag(out)
    assert stripped == data


def test_write_remove_without_id3v1():
    audio = b"\xff\xfb\x90\x00" + bytes(500)
    tag = ApeTag()
    tag.set("KEY", "value")
    out = write_ape_tag_to_data(audio, tag)
    assert out[: len(audio)] == audio
    assert remove_ape_tag(out) == audio


def test_audio_end_excludes_ape_and_id3v1():
    audio = bytes(512)
    tag = ApeTag()
    tag.set("K", "v")
    blob = serialize_ape_tag(tag)
    data = audio + blob + b"TAG" + bytes(125)
    assert native.find_audio_end(data) == len(audio)


def test_replace_existing_tag():
    audio = bytes(512)
    t1 = ApeTag()
    t1.set("A", "1")
    data = write_ape_tag_to_data(audio, t1)
    t2 = ApeTag()
    t2.set("B", "2")
    out = write_ape_tag_to_data(data, t2)
    parsed = read_ape_tag(out)
    assert parsed.get("A") is None
    assert parsed.get("B") == "2"
