"""Robustness fuzzing of the native host parsers.

The C++ byte-level engines (frame scan, APE, MP4 boxes, MP3/AAC entropy
front-ends) are the malformed-input attack surface (SURVEY.md §5). These
tests feed byte-mutated and truncated real files plus pure garbage
through every parser entry point: no crashes, no hangs, and outputs stay
within structural bounds.
"""

import numpy as np
import pytest

import mp3rgain_tpu as mg
from mp3rgain_tpu import mp4meta, native
from mp3rgain_tpu.decode import aac_frontend, frontend


def _check_light(mutated: bytes, full=None):
    """Structural bounds of the raw-bits front-end on hostile input.

    The light walk must agree with the full unpack on record count and
    per-gch identity (they share the frame walk), and the decode
    metadata the Pallas kernel trusts must stay within the bounds the
    kernel's loops assume."""
    from mp3rgain_tpu.decode import frontend as fe

    lt = frontend.unpack_data_light(mutated)
    if full is None:
        full = frontend.unpack_data(mutated)
    assert lt.n == full.n
    if lt.n:
        assert (lt.meta[:, fe.LM_P0] >= 0).all()
        assert (lt.meta[:, fe.LM_P0] <= 7).all()
        assert (lt.meta[:, fe.LM_P23] >= 0).all()
        assert (lt.meta[:, fe.LM_BVP] >= 0).all()
        assert (lt.meta[:, fe.LM_BVP] <= 288).all()
        # Window bits fit the md row the packer ships.
        bits = lt.meta[:, fe.LM_P0].astype(np.int64) + lt.meta[:, fe.LM_P23]
        assert (bits <= 8 * fe.MD_STRIDE).all()
    return lt


def _mutations(data: bytes, rng, n: int):
    for _ in range(n):
        buf = bytearray(data)
        kind = rng.integers(0, 3)
        if kind == 0:  # random byte flips
            for _ in range(int(rng.integers(1, 50))):
                buf[int(rng.integers(0, len(buf)))] = int(rng.integers(0, 256))
        elif kind == 1:  # truncation
            buf = buf[: int(rng.integers(1, len(buf)))]
        else:  # random splice
            a, b = sorted(rng.integers(0, len(buf), size=2))
            buf[a:b] = bytes(rng.integers(0, 256, size=int(rng.integers(0, 64))).tolist())
        yield bytes(buf)


def test_fuzz_mp3_paths(fixtures_dir):
    rng = np.random.default_rng(42)
    data = (fixtures_dir / "test_joint_stereo.mp3").read_bytes()
    for mutated in _mutations(data, rng, 60):
        try:
            mg.analyze_data(mutated)
        except mg.Mp3Error:
            pass
        buf = bytearray(mutated)
        native.apply_gain(buf, 3)
        native.apply_gain_channel(buf, 1, -2)
        native.read_gains(mutated)
        native.frame_index(mutated)
        native.find_audio_end(mutated)
        u = frontend.unpack_data(mutated)
        assert u.n >= 0
        if u.n:
            assert (np.abs(u.spectrum) <= 8206 + 8191).all()
        _check_light(mutated, u)


def test_fuzz_ape_paths(fixtures_dir):
    rng = np.random.default_rng(43)
    tag = mg.ApeTag()
    tag.set_undo_gain(2, 2, False)
    tag.set("REPLAYGAIN_TRACK_GAIN", "-3.00 dB")
    from mp3rgain_tpu.ape import remove_ape_tag, serialize_ape_tag, write_ape_tag_to_data

    base = bytes(512) + serialize_ape_tag(tag) + b"TAG" + bytes(125)
    for mutated in _mutations(base, rng, 60):
        native.ape_find_footer(mutated)
        native.ape_parse(mutated)
        native.ape_remove_region(mutated)
        remove_ape_tag(mutated)
        write_ape_tag_to_data(mutated, tag)


def test_fuzz_mp4_paths(tmp_path):
    from mp3rgain_tpu.testing import fixtures

    rng = np.random.default_rng(44)
    t = np.arange(4410) / 44100
    m4a = fixtures.encode_m4a(
        np.stack([np.sin(880 * t, dtype=np.float32)] * 2, 1), 44100
    )
    tags = mp4meta.ReplayGainTags()
    tags.set_track(1.0, 0.9)
    for mutated in _mutations(m4a, rng, 60):
        p = tmp_path / "fuzz.m4a"
        p.write_bytes(mutated)
        mp4meta.is_mp4_file(p)
        try:
            mp4meta.read_replaygain_tags(p)
            mp4meta.write_replaygain_tags_to_data(mutated, tags)
        except mp4meta.Mp4Error:
            pass
        try:
            adts = aac_frontend.mp4_to_adts(mutated)
            aac_frontend.unpack_adts(adts)
        except (aac_frontend.Mp4DemuxError, Exception):
            pass


def test_fuzz_pure_garbage():
    rng = np.random.default_rng(45)
    for size in (0, 1, 7, 32, 127, 1024, 65536):
        blob = bytes(rng.integers(0, 256, size=size).tolist())
        with pytest.raises(mg.Mp3Error):
            mg.analyze_data(blob) if size < 100000 else None
        native.read_gains(blob)
        native.ape_parse(blob)
        frontend.unpack_data(blob)
        _check_light(blob)
        aac_frontend.unpack_adts(blob)


def test_fuzz_crafted_stream_paths():
    """Mutations of hand-crafted streams reach parser states that
    lame/ffmpeg seeds never enter (intensity scalefactors, mixed-block
    side info, count1 table B, CPE intensity sections, pulse/TNS data)."""
    from mp3rgain_tpu.testing import craft, craft_aac

    rng = np.random.default_rng(11)
    mp3_seeds = [
        craft.craft_intensity_stream(4, mode_extension=3, ch1_bands=[0, 1]),
        craft.craft_lsf_intensity_stream(8, intensity_scale=1),
        craft.craft_mixed_block_stream(4, subblock_gain=(7, 3, 1)),
        craft.craft_count1b_stream(4),
        craft.craft_scalefactor_stream(
            4, scf=[3] * 21, scfsi=0b1010, preflag=1, scalefac_scale=1
        ),
    ]
    for seed in mp3_seeds:
        for mutated in _mutations(seed, rng, 25):
            try:
                mg.analyze_data(mutated)
            except mg.Mp3Error:
                pass
            native.frame_index(mutated)
            u = frontend.unpack_data(mutated)
            assert u.n >= 0
            _check_light(mutated, u)


def test_fuzz_device_entropy_path():
    """Mutated crafted streams through the FULL raw-bits pipeline (pack +
    interpret-mode Pallas decode): the kernel must terminate and match
    the host decoder's spectra on whatever survives the light walk."""
    from mp3rgain_tpu.decode import entropy_kernel as ek
    from mp3rgain_tpu.testing import craft

    rng = np.random.default_rng(12)
    seed = craft.craft_mixed_block_stream(4, subblock_gain=(7, 3, 1))
    for mutated in _mutations(seed, rng, 6):
        full = frontend.unpack_data(mutated)
        lt = _check_light(mutated, full)
        if lt.n == 0:
            continue
        spec, big_end, c1end, ok = ek.decode_spectra(
            lt.md, lt.meta, interpret=True
        )
        valid = full.info[:, 18] == 1  # fe.VALID
        assert np.array_equal(
            np.asarray(spec)[valid], full.spectrum[valid]
        )


def test_fuzz_crafted_aac_paths():
    from mp3rgain_tpu.testing import craft_aac

    rng = np.random.default_rng(13)
    aac_seeds = [
        craft_aac.craft_sce_stream(
            4, n_bands=45, energy={40: (1, -1, 1, 0)}, pulses=[(0, 4)],
            tns=dict(length=45, order=3, coefs=[5, 2, 7]),
        ),
        craft_aac.craft_cpe_stream(
            4, n_bands=10, left_energy={b: (1, 0, -1, 0) for b in range(10)},
            is_bands={7: (15, 2), 8: (14, -1), 9: (15, 4)}, ms_used={0, 7},
        ),
    ]
    for seed in aac_seeds:
        for mutated in _mutations(seed, rng, 25):
            u = aac_frontend.unpack_adts(mutated)
            assert u.n >= 0
