"""Micro-ablation of the entropy-loop step to find the 354 us/step cost."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os
STEPS = int(os.environ.get("STEPS", 288))
W = int(os.environ.get("WORDS", 64))


def timeit(name, kernel, n_in=2, iters=8):
    import random

    raw = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    @jax.jit
    def fn(salt, buf, p0):
        # Unique salt folded into the input so no (executable, inputs)
        # pair ever repeats; output feeds the next salt (serialization).
        return raw(buf, (p0 + salt) % jnp.int32(64))

    rng = np.random.default_rng(0)
    buf = jnp.asarray(rng.integers(0, 2**31, size=(W, 8, 128), dtype=np.int32))
    p0 = jnp.asarray(rng.integers(0, 64, size=(8, 128)).astype(np.int32))
    salt0 = random.randrange(1, 1 << 20)
    out = fn(jnp.int32(salt0), buf, p0)
    float(jnp.sum(out))

    t0 = time.monotonic()
    chain = out
    for i in range(iters):
        salt = (chain[0, 0] * 0) + jnp.int32(salt0 + i + 1)
        chain = fn(salt, buf, p0)
    float(jnp.sum(chain))
    wall = (time.monotonic() - t0) / iters
    print(f"{name:36s}: {wall*1e3:8.2f} ms  ({wall*1e6/STEPS:7.2f} us/step)")
    return wall


def k_empty(buf_ref, p_ref, out_ref):
    def step(k, p):
        return p + 1
    out_ref[:] = lax.fori_loop(0, STEPS, step, p_ref[:])


def k_constshift(buf_ref, p_ref, out_ref):
    def step(k, p):
        u = p.astype(jnp.uint32)
        v = lax.shift_right_logical(u, jnp.uint32(5))
        return (v & 31).astype(jnp.int32) + p
    out_ref[:] = lax.fori_loop(0, STEPS, step, p_ref[:])


def k_varshift(buf_ref, p_ref, out_ref):
    def step(k, p):
        o = jnp.bitwise_and(p, 31).astype(jnp.uint32)
        u = p.astype(jnp.uint32)
        v = lax.shift_right_logical(u, o) | (u << o)
        return (v & 31).astype(jnp.int32) + p
    out_ref[:] = lax.fori_loop(0, STEPS, step, p_ref[:])


def k_fetch(buf_ref, p_ref, out_ref):
    def step(k, p):
        w_idx = lax.shift_right_logical(p, jnp.int32(5))
        def fetch(i, accs):
            a0, a1 = accs
            m = w_idx == i
            a0 = a0 + jnp.where(m, buf_ref[i], 0)
            a1 = a1 + jnp.where(m, buf_ref[i + 1], 0)
            return (a0, a1)
        zeros = jnp.zeros((8, 128), jnp.int32)
        w0, w1 = lax.fori_loop(0, W - 1, fetch, (zeros, zeros))
        return p + (w0 & 1) + (w1 & 1)
    out_ref[:] = lax.fori_loop(0, STEPS, step, p_ref[:])


def k_onehot(buf_ref, p_ref, out_ref):
    iota512c = lax.broadcasted_iota(jnp.int32, (512, 128), 0)
    def step(k, p):
        win9 = p & 511
        ohs = [(win9[s : s + 1, :] == iota512c).astype(jnp.bfloat16)
               for s in range(8)]
        ohT = jnp.concatenate(ohs, axis=1)
        s = jnp.sum(ohT.astype(jnp.float32))
        return p + s.astype(jnp.int32)
    out_ref[:] = lax.fori_loop(0, STEPS, step, p_ref[:])


def k_onehot_nocat(buf_ref, p_ref, out_ref):
    iota512c = lax.broadcasted_iota(jnp.int32, (512, 128), 0)
    def step(k, p):
        win9 = p & 511
        s = jnp.float32(0)
        for si in range(8):
            oh = (win9[si : si + 1, :] == iota512c).astype(jnp.float32)
            s = s + jnp.sum(oh)
        return p + s.astype(jnp.int32)
    out_ref[:] = lax.fori_loop(0, STEPS, step, p_ref[:])


def k_rowslice(buf_ref, p_ref, out_ref):
    def step(k, p):
        rows = [p[s : s + 1, :] for s in range(8)]
        flat = jnp.concatenate(rows, axis=1)  # (1, 1024)
        back = jnp.concatenate(
            [flat[:, s * 128 : (s + 1) * 128] for s in range(8)], axis=0)
        return p + back
    out_ref[:] = lax.fori_loop(0, STEPS, step, p_ref[:])


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          file=sys.stderr)
    timeit("empty loop", k_empty)
    timeit("const shifts", k_constshift)
    timeit("variable shifts", k_varshift)
    timeit("word fetch (63-iter select)", k_fetch)
    timeit("onehot8 + concat", k_onehot)
    timeit("onehot8 no concat", k_onehot_nocat)
    timeit("row slice + concat roundtrip", k_rowslice)


if __name__ == "__main__":
    main()
