"""Test configuration.

DSP / mesh tests run on a virtual 8-device CPU platform so that multi-chip
sharding (psum album reduction) is testable without TPU hardware. The axon
sitecustomize imports jax at interpreter start, so the platform must be
overridden via jax.config (env vars are too late here). Set
MP3RGAIN_TPU_TESTS=1 to run on the real TPU instead (single chip).
"""

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

_ON_TPU = os.environ.get("MP3RGAIN_TPU_TESTS") == "1"

if not _ON_TPU:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except ImportError:
        pass


@pytest.fixture(scope="session")
def fixtures_dir(tmp_path_factory):
    """Directory with generated MP3 fixtures (lame-encoded)."""
    from mp3rgain_tpu.testing import fixtures

    out = tmp_path_factory.mktemp("mp3fixtures")
    return fixtures.generate_standard_fixtures(out)
