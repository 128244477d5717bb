"""Differential decoder tests: TPU decode pipeline vs the libmpg123 oracle.

Mirrors the reference's differential-testing strategy (tier 4,
scripts/compatibility-test.sh) applied to the decode path: every fixture
class (MPEG1/2/2.5, mono/stereo/joint/VBR) must match the golden decoder
to float32-oracle precision.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from mp3rgain_tpu.decode import frontend, synthesis  # noqa: E402
from mp3rgain_tpu.testing import mpg123  # noqa: E402

FIXTURES = [
    "test_stereo.mp3",
    "test_mono.mp3",
    "test_joint_stereo.mp3",
    "test_vbr.mp3",
    "test_mpeg2_22050.mp3",
    "test_mpeg25_11025.mp3",
    "test_48000.mp3",
]


@pytest.mark.parametrize("name", FIXTURES)
def test_decode_matches_mpg123(fixtures_dir, name):
    path = fixtures_dir / name
    mine, sr = synthesis.decode_file(path, dtype=jnp.float32)
    ref, sr_ref = mpg123.decode_file(path)
    ref = ref.T
    assert sr == sr_ref
    assert mine.shape == ref.shape  # frame-for-frame alignment
    n = min(mine.shape[1], ref.shape[1])
    err = np.abs(mine[:, :n] - ref[:, :n])
    rms_ref = np.sqrt((ref[:, :n] ** 2).mean())
    # Oracle emits float32; our float32 path adds similar noise.
    assert err.max() < max(3e-5, 3e-5 * rms_ref), (err.max(), rms_ref)


def test_frontend_gains_match_l0_scan(fixtures_dir):
    from mp3rgain_tpu import native

    data = (fixtures_dir / "test_joint_stereo.mp3").read_bytes()
    u = frontend.unpack_data(data)
    gains = native.read_gains(data)
    assert np.array_equal(u.info[:, frontend.GLOBAL_GAIN].astype(np.uint8), gains)
    assert (u.info[:, frontend.VALID] == 1).all()


def test_frontend_vbr_has_blocktypes(fixtures_dir):
    u = frontend.unpack_file(fixtures_dir / "test_vbr.mp3")
    # A sine onset encoded by lame produces start/short/stop blocks.
    bts = set(u.info[:, frontend.BLOCK_TYPE].tolist())
    assert 0 in bts
