"""Multi-host (DCN) data parallelism tests (SURVEY.md §2.6, round-4
VERDICT missing #2).

The framework's one cross-host collective is the album union (histogram
psum + peak pmax over the global dp mesh). These tests spawn a real
2-process ``jax.distributed`` group on CPU (gloo TCP collectives, 2
virtual devices per process) and assert the DCN reduction is bit-equal
to a single-process analysis — the same oracle pattern as
``__graft_entry__.dryrun_multichip`` uses for the single-host mesh.

The spawned children force their own CPU platform; this test runs the
parent side only and therefore works under the ambient conftest CPU
mesh as well as on a TPU session.
"""

import pytest


def test_dryrun_multihost_2proc():
    import __graft_entry__ as g

    # Raises on any child assertion failure / timeout / nonzero exit.
    g.dryrun_multihost(n_processes=2, devices_per_process=2)


def test_process_slice_single_process():
    """Outside a distributed group, process_slice is the identity and
    is_multihost is False (the scan path must not change behavior)."""
    from mp3rgain_tpu.parallel import multihost

    assert not multihost.is_multihost()
    items = ["a", "b", "c"]
    assert multihost.process_slice(items) == items
