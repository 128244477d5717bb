"""Independent oracles for lossless gain surgery (VERDICT round-1 #4).

No mp3gain binary exists in this environment (zero egress, no Rust
toolchain), so the byte-exactness claim is pinned by two *independent*
oracles instead:

1. **Behavioral (libmpg123)**: global_gain enters ISO 11172-3 requantize
   as an exact 2^(gain/4) scale factor, so a real-world third-party
   decoder must decode our gain-modified file to EXACTLY the original
   PCM x 2^(steps/4) (modulo float rounding). If our bit surgery wrote
   anything a decoder interprets differently, this fails.
2. **Structural (pure-Python re-derivation)**: a from-the-spec
   reimplementation of the frame walk + gain bit locations (written
   against the documented layout, not the C++ code): the byte diff
   between original and modified file must be confined to the bytes
   spanned by global_gain fields, and each field must read back as
   old+steps (saturating).

Together these are the offline equivalent of the reference's SHA-256
diff against mp3gain 1.6.2 (reference scripts/compatibility-test.sh).
"""

import shutil

import numpy as np
import pytest

from mp3rgain_tpu.bitstream import analyze, apply_gain, apply_gain_channel, Channel
from mp3rgain_tpu.testing import mpg123

FIXTURES = [
    "test_stereo.mp3",
    "test_mono.mp3",
    "test_joint_stereo.mp3",
    "test_vbr.mp3",
    "test_mpeg2_22050.mp3",
    "test_mpeg25_11025.mp3",
]


def _copy(fixtures_dir, name, tmp_path):
    dst = tmp_path / name
    shutil.copy(fixtures_dir / name, dst)
    return dst


# ---------------------------------------------------------------------------
# Oracle 1: third-party decoder scale check
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name", FIXTURES)
@pytest.mark.parametrize("steps", [2, -3])
def test_decoder_scale_oracle(fixtures_dir, tmp_path, name, steps):
    src = _copy(fixtures_dir, name, tmp_path)
    info = analyze(src)
    assert info.max_gain + max(steps, 0) <= 255  # no saturation in play
    assert info.min_gain + min(steps, 0) >= 0

    pcm0, sr0 = mpg123.decode_file(src)
    n = apply_gain(src, steps)
    assert n == info.frame_count
    pcm1, sr1 = mpg123.decode_file(src)

    assert sr0 == sr1
    assert pcm0.shape == pcm1.shape
    scale = 2.0 ** (steps / 4.0)
    ref = pcm0.astype(np.float64) * scale
    err = np.max(np.abs(pcm1.astype(np.float64) - ref))
    # mpg123 float path: only rounding differs; 1e-5 in absolute sample
    # units is far below one 16-bit LSB (3e-5).
    assert err < 1e-5, f"decoder disagrees with 2^(steps/4) scaling: {err}"


# ---------------------------------------------------------------------------
# Oracle 2: from-spec frame walk + bit-confinement
# ---------------------------------------------------------------------------

# Independent tables (ISO 11172-3 / 13818-3), NOT imported from the
# implementation under test.
_BITRATES_V1_L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
_BITRATES_V2_L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]
_SR = {3: [44100, 48000, 32000], 2: [22050, 24000, 16000], 0: [11025, 12000, 8000]}


def _spec_walk(data: bytes):
    """Yield (frame_offset, [absolute gain bit offsets]) per audio frame,
    derived purely from the published side-info layout."""
    pos = 0
    # ID3v2 skip (syncsafe size)
    if data[:3] == b"ID3" and len(data) >= 10:
        pos = 10 + ((data[6] & 0x7F) << 21 | (data[7] & 0x7F) << 14
                    | (data[8] & 0x7F) << 7 | (data[9] & 0x7F))
    end = len(data)
    if end >= 128 and data[end - 128 : end - 125] == b"TAG":
        end -= 128

    while pos + 4 <= end:
        b0, b1, b2, b3 = data[pos : pos + 4]
        ver_bits = (b1 >> 3) & 3
        layer = (b1 >> 1) & 3
        br_idx = b2 >> 4
        sr_idx = (b2 >> 2) & 3
        if (b0 != 0xFF or (b1 & 0xE0) != 0xE0 or ver_bits == 1 or layer != 1
                or br_idx in (0, 15) or sr_idx == 3):
            pos += 1
            continue
        mpeg1 = ver_bits == 3
        bitrate = (_BITRATES_V1_L3 if mpeg1 else _BITRATES_V2_L3)[br_idx] * 1000
        sr = _SR[ver_bits][sr_idx]
        pad = (b2 >> 1) & 1
        frame_size = (144 if mpeg1 else 72) * bitrate // sr + pad
        if frame_size < 24 or pos + frame_size > end:
            pos += 1
            continue
        mono = (b3 >> 6) == 3
        crc = not (b1 & 1)

        side_off = 4 + (2 if crc else 0)
        # Xing/Info VBR frame: tag sits right after the side info.
        side_len = (17 if mono else 32) if mpeg1 else (9 if mono else 17)
        tag = data[pos + side_off + side_len : pos + side_off + side_len + 4]
        if tag in (b"Xing", b"Info"):
            pos += frame_size
            continue

        if mpeg1:
            header_bits = 18 if mono else 20  # 9 mdb + 5/3 priv + 4/8 scfsi
            gch_bits, n_gch = 59, (2 if mono else 4)
        else:
            header_bits = 9 if mono else 10  # 8 mdb + 1/2 priv
            gch_bits, n_gch = 63, (1 if mono else 2)
        base = (pos + side_off) * 8 + header_bits
        gains = [base + k * gch_bits + 21 for k in range(n_gch)]
        yield pos, gains
        pos += frame_size


def _read_bits8(data: bytes, bit_off: int) -> int:
    byte, sh = divmod(bit_off, 8)
    v = (data[byte] << 8) | (data[byte + 1] if byte + 1 < len(data) else 0)
    return (v >> (8 - sh)) & 0xFF


@pytest.mark.parametrize("name", FIXTURES)
def test_bit_confinement(fixtures_dir, tmp_path, name):
    src = _copy(fixtures_dir, name, tmp_path)
    orig = src.read_bytes()
    steps = 2
    apply_gain(src, steps)
    mod = src.read_bytes()
    assert len(orig) == len(mod)

    frames = list(_spec_walk(orig))
    assert frames, "spec walker found no frames"

    allowed = set()
    for _, gains in frames:
        for g in gains:
            allowed.add(g // 8)
            allowed.add((g + 7) // 8)
            # independently check value: old + steps, saturating
            old = _read_bits8(orig, g)
            new = _read_bits8(mod, g)
            assert new == min(max(old + steps, 0), 255)

    diff = {i for i in range(len(orig)) if orig[i] != mod[i]}
    assert diff, "apply changed nothing"
    stray = diff - allowed
    assert not stray, f"bytes changed outside gain fields: {sorted(stray)[:10]}"


def test_bit_confinement_channel(fixtures_dir, tmp_path):
    """Channel-specific gain touches only that channel's fields
    (gch order gr0ch0, gr0ch1, gr1ch0, gr1ch1 — reference lib.rs:718)."""
    src = _copy(fixtures_dir, "test_stereo.mp3", tmp_path)
    orig = src.read_bytes()
    apply_gain_channel(src, Channel.LEFT, 2)
    mod = src.read_bytes()

    allowed = set()
    checked = 0
    for _, gains in _spec_walk(orig):
        for k, g in enumerate(gains):
            old = _read_bits8(orig, g)
            new = _read_bits8(mod, g)
            if k % 2 == 0:  # left channel fields
                assert new == min(old + 2, 255)
                allowed.add(g // 8)
                allowed.add((g + 7) // 8)
                checked += 1
            else:  # right channel untouched
                assert new == old
    assert checked > 0
    stray = {i for i in range(len(orig)) if orig[i] != mod[i]} - allowed
    assert not stray
