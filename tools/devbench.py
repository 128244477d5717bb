"""Honest device micro-benchmark harness for pipeline variants.

The runtime layers under this environment memoize identical
(executable, inputs) executions and dispatch asynchronously, so naive
timing lies. This harness chains a data dependency through every
iteration (each run consumes the previous run's output) and reports the
median of N runs, interleaving variants to cancel drift.

Usage: python tools/devbench.py [seconds] [batch]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def chained_median(fn, dev_args, n=10):
    """Median seconds/iter for fn(*dev_args[:-1], valid_variant)."""
    import jax
    import jax.numpy as jnp

    out = fn(*dev_args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    valid0 = dev_args[-1]
    times = []
    prev = out[-1] if isinstance(out, tuple) else out
    for i in range(n):
        t0 = time.monotonic()
        bump = (prev.ravel()[:1] * 0).astype(jnp.int32) + (i + 1)
        out = fn(*dev_args[:-1], valid0 - bump)
        prev = out[-1] if isinstance(out, tuple) else out
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
        times.append(time.monotonic() - t0)
    return sorted(times)[len(times) // 2]


def main():
    from functools import partial

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import _make_track_mp3
    from mp3rgain_tpu.decode import frontend as fe
    from mp3rgain_tpu.parallel import runner as R

    seconds = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    data = _make_track_mp3(seconds)
    u = fe.unpack_data(data)
    args = R.prepare_batch_arrays([u] * batch, 2, 1)
    dev_args = jax.device_put(args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), dev_args)
    audio_sec = (u.n // 2) * 576 / u.sample_rate * batch

    fn = jax.jit(partial(R._analysis_core, n_channels=2,
                         sample_rate=u.sample_rate, dtype=jnp.float32))
    # Interleave 3 measurement rounds to average drift.
    meds = [chained_median(fn, dev_args, n=6) for _ in range(3)]
    med = sorted(meds)[1]
    print(f"full pipeline: {med * 1000:.1f} ms/iter -> {audio_sec / med:.0f}x real-time")


if __name__ == "__main__":
    main()
