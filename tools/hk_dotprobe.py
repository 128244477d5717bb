"""Microbenchmark: pure class-core-style GEMM pallas kernel at varying
TILE, to separate per-grid-step overhead from MXU dot inefficiency.

Each variant does the same total work as the fused hybrid kernel's dot
stage (2 channels x 3 cores x 3 bf16 passes over R rows of (576) @
(576,1152)), minus everything else.
"""
import sys, os, time, random

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 2304 * 128
NCORE = int(os.environ.get("NCORE", "3"))
NPASS = int(os.environ.get("NPASS", "3"))


def make(tile):
    n_tiles = R // tile

    def kernel(x0_ref, x1_ref, chi_ref, clo_ref, z0_ref, z1_ref):
        for x_ref, z_ref in ((x0_ref, z0_ref), (x1_ref, z1_ref)):
            xh = x_ref[0].astype(jnp.bfloat16)
            xl = (x_ref[0] - xh.astype(jnp.float32)).astype(jnp.bfloat16)
            acc = None
            for c in range(NCORE):
                z = jnp.dot(xh, chi_ref[c], preferred_element_type=jnp.float32)
                if NPASS >= 2:
                    z += jnp.dot(xh, clo_ref[c], preferred_element_type=jnp.float32)
                if NPASS >= 3:
                    z += jnp.dot(xl, chi_ref[c], preferred_element_type=jnp.float32)
                acc = z if acc is None else acc + z
            z_ref[0] = acc

    data = pl.BlockSpec((1, tile, 576), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    const = pl.BlockSpec((NCORE, 576, 1152), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.BlockSpec((1, tile, 1152), lambda i: (0, i, 0),
                       memory_space=pltpu.VMEM)
    vl = int(os.environ.get("VLIM", "0"))
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[data, data, const, const],
        out_specs=(out, out),
        out_shape=(jax.ShapeDtypeStruct((1, R, 1152), jnp.float32),) * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vl) if vl else None,
    )


def bench(tile):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 1, R, 576)).astype(np.float32)
    chi = rng.standard_normal((NCORE, 576, 1152)).astype(np.float32)
    import ml_dtypes
    chi_b = chi.astype(ml_dtypes.bfloat16)
    clo_b = (chi - chi_b.astype(np.float32)).astype(ml_dtypes.bfloat16)
    x_d = jax.device_put(x)
    chi_d, clo_d = jax.device_put((chi_b, clo_b))
    call = make(tile)

    @jax.jit
    def fn(bump, x, chi, clo):
        x = x + bump
        z0, z1 = call(x[0], x[1], chi, clo)
        return (jnp.sum(z0, axis=(0, 1)) + jnp.sum(z1, axis=(0, 1)))[:8]

    # Bump values must be UNIQUE per iteration: the axon runtime
    # memoizes (executable, inputs) executions, and a cycling bump makes
    # repeat iterations free (measured 3x-too-fast readings).
    salt = random.randrange(1 << 18)
    out = fn(jnp.float32(salt) * 1e-9, x_d, chi_d, clo_d)
    float(out[0])
    t0 = time.monotonic()
    K = 6
    for i in range(K):
        out = fn((out[0] * 0) + jnp.float32(salt + 1 + i) * 1e-9,
                 x_d, chi_d, clo_d)
    float(out[0])
    dt = (time.monotonic() - t0) / K
    fl = 2 * 2 * NCORE * NPASS * R * 576 * 1152
    print(f"TILE={tile} NCORE={NCORE} NPASS={NPASS}: {dt*1e3:.1f} ms "
          f"({fl/dt/1e12:.1f} TFLOP/s)", flush=True)


for tile in (int(t) for t in os.environ.get("TILES", "128,256").split(",")):
    bench(tile)
