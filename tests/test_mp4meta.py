"""MP4 metadata engine tests (reference src/mp4meta.rs:891-944 + rewriter)."""

import struct

import pytest

from mp3rgain_tpu import mp4meta


def box(box_type: bytes, content: bytes) -> bytes:
    return struct.pack(">I", 8 + len(content)) + box_type + content


def full_box(box_type: bytes, content: bytes) -> bytes:
    return box(box_type, b"\x00\x00\x00\x00" + content)


def build_minimal_m4a(moov_first: bool = True, with_udta: bool = False) -> bytes:
    """Minimal ISO-BMFF file: ftyp + moov(trak(mdia(minf(stbl(stco))))) + mdat."""
    ftyp = box(b"ftyp", b"M4A " + b"\x00\x00\x00\x00" + b"M4A mp42isom")

    # stco with 2 chunk offsets; values fixed up after layout below.
    stco_entries = [0, 0]
    stco = full_box(b"stco", struct.pack(">I", len(stco_entries)) + b"".join(
        struct.pack(">I", o) for o in stco_entries
    ))
    stbl = box(b"stbl", stco)
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", minf)
    trak = box(b"trak", mdia)
    moov_children = trak
    if with_udta:
        moov_children += box(b"udta", b"")
    moov = box(b"moov", moov_children)
    mdat_payload = bytes(range(64))
    mdat = box(b"mdat", mdat_payload)

    if moov_first:
        data = ftyp + moov + mdat
        mdat_pos = len(ftyp) + len(moov)
    else:
        data = ftyp + mdat + moov
        mdat_pos = len(ftyp)

    # Point chunk offsets into mdat payload.
    off0 = mdat_pos + 8
    off1 = mdat_pos + 8 + 32
    data = bytearray(data)
    stco_pos = data.find(b"stco") - 4
    entry_pos = stco_pos + 16
    struct.pack_into(">I", data, entry_pos, off0)
    struct.pack_into(">I", data, entry_pos + 4, off1)
    return bytes(data)


def chunk_offsets(data: bytes) -> list[int]:
    pos = data.find(b"stco") - 4
    count = struct.unpack_from(">I", data, pos + 12)[0]
    return [struct.unpack_from(">I", data, pos + 16 + 4 * i)[0] for i in range(count)]


def test_is_mp4_detection(tmp_path):
    p = tmp_path / "a.m4a"
    p.write_bytes(build_minimal_m4a())
    assert mp4meta.is_mp4_file(p)
    q = tmp_path / "b.mp3"
    q.write_bytes(b"\xff\xfb\x90\x00" + bytes(100))
    assert not mp4meta.is_mp4_file(q)


def test_tag_value_formats():
    tags = mp4meta.ReplayGainTags()
    tags.set_track(3.5, 0.98765)
    tags.set_album(2.0, 0.99999)
    assert tags.track_gain == "+3.50 dB"
    assert tags.track_peak == "0.987650"
    assert tags.album_gain == "+2.00 dB"
    assert tags.album_peak == "0.999990"


@pytest.mark.parametrize("with_udta", [False, True])
def test_write_read_roundtrip(tmp_path, with_udta):
    p = tmp_path / "t.m4a"
    p.write_bytes(build_minimal_m4a(with_udta=with_udta))

    tags = mp4meta.ReplayGainTags()
    tags.set_track(-1.23, 0.5)
    mp4meta.write_replaygain_tags(p, tags)

    got = mp4meta.read_replaygain_tags(p)
    assert got.track_gain == "-1.23 dB"
    assert got.track_peak == "0.500000"
    assert got.album_gain is None


def test_update_existing_tags(tmp_path):
    p = tmp_path / "t.m4a"
    p.write_bytes(build_minimal_m4a())
    t1 = mp4meta.ReplayGainTags()
    t1.set_track(1.0, 0.9)
    mp4meta.write_replaygain_tags(p, t1)
    t2 = mp4meta.ReplayGainTags()
    t2.set_track(2.0, 0.8)
    t2.set_album(3.0, 0.7)
    mp4meta.write_replaygain_tags(p, t2)
    got = mp4meta.read_replaygain_tags(p)
    assert got.track_gain == "+2.00 dB"
    assert got.album_gain == "+3.00 dB"


def test_delete_tags(tmp_path):
    p = tmp_path / "t.m4a"
    p.write_bytes(build_minimal_m4a())
    t = mp4meta.ReplayGainTags()
    t.set_track(1.0, 0.9)
    mp4meta.write_replaygain_tags(p, t)
    mp4meta.delete_replaygain_tags(p)
    got = mp4meta.read_replaygain_tags(p)
    assert got.is_empty()


def test_chunk_offsets_patched_when_moov_first(tmp_path):
    data = build_minimal_m4a(moov_first=True)
    before = chunk_offsets(data)
    tags = mp4meta.ReplayGainTags()
    tags.set_track(1.0, 0.9)
    new = mp4meta.write_replaygain_tags_to_data(data, tags)
    growth = len(new) - len(data)
    assert growth > 0
    after = chunk_offsets(new)
    assert after == [o + growth for o in before]
    # mdat payload itself must be unchanged at the new offsets.
    assert new[after[0] : after[0] + 8] == data[before[0] : before[0] + 8]


def test_chunk_offsets_untouched_when_mdat_first(tmp_path):
    data = build_minimal_m4a(moov_first=False)
    before = chunk_offsets(data)
    tags = mp4meta.ReplayGainTags()
    tags.set_track(1.0, 0.9)
    new = mp4meta.write_replaygain_tags_to_data(data, tags)
    assert chunk_offsets(new) == before


def test_no_moov_errors():
    with pytest.raises(mp4meta.Mp4Error):
        mp4meta.write_replaygain_tags_to_data(
            box(b"ftyp", b"M4A \x00\x00\x00\x00"), mp4meta.ReplayGainTags()
        )
