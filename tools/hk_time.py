"""Microbenchmark of the hybrid stage: Pallas requant+stereo kernel +
XLA 2-core GEMMs (decode/hybrid_kernel), in isolation from the rest of
the pipeline. Chained-dependency timing (see NOTES.md).

STAGE=kernel times just the Pallas requant+stereo pass; STAGE=gemm just
the XLA hybrid GEMMs on precomputed spectra; default times both fused
under one jit (the shipped composition).
"""
import sys, os
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp, time, random
from mp3rgain_tpu.decode import hybrid_kernel as hk

R = 2304 * hk.TILE
STAGE = os.environ.get("STAGE", "full")
rng = np.random.default_rng(0)
spec = rng.integers(-100, 100, (2, R, 576)).astype(np.int16)
scf = rng.integers(0, 10, (2, R, 64)).astype(np.int8)
gm = np.zeros((2, R, hk.GM_N), np.int32)
gm[..., hk.GM_GG] = 160
spec_d, scf_d, gm_d = jax.device_put((spec, scf, gm))
xr_d = jax.device_put(rng.standard_normal((2, R, 576)).astype(np.float32))


@jax.jit
def fn(bump, spec, scf, gm, xr):
    gm = gm.at[..., hk.GM_GG].add(bump % 3)
    if STAGE == "gemm":
        z = hk.hybrid_xla(xr + (bump % 2), gm, sr_row=4)
    else:
        x = hk.fused_requant_stereo(spec, scf, gm, n_channels=2, sr_row=4)
        if STAGE == "kernel":
            z = x
        else:
            z = hk.hybrid_xla(x, gm, sr_row=4)
    return jnp.sum(z, axis=(0, 1))[:8]


salt = random.randrange(1 << 20)
out = fn(jnp.int32(salt), spec_d, scf_d, gm_d, xr_d); float(out[0])
t0 = time.monotonic()
K = 6
for i in range(K):
    out = fn(jnp.int32(salt + 1 + i) + (out[0] * 0).astype(jnp.int32),
             spec_d, scf_d, gm_d, xr_d)
float(out[0])
print(f"[{STAGE}] {(time.monotonic()-t0)/K*1000:.1f} ms/iter", flush=True)
