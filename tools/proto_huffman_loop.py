"""Performance prototype for the device-side entropy-decode inner loop.

Mocks the per-symbol lockstep decode step at realistic op mix, in the
transposed formulation (Mosaic cannot relayout (8,128)->(1024,1), so the
one-hot is built as OH_T[c, lane] via broadcast compares and the LUT
matmul runs as LUT_T (72,512) @ OH_T (512,1024)):
  - per-lane dual word fetch from the (W, 8, 128) stream buffer via
    select-sum (the TPU substitute for per-lane gather),
  - 64-bit window assembly + 9-bit code window extract (per-lane shifts),
  - transposed one-hot x LUT matmul on the MXU + per-lane table masking
    + (4,72) field-reduction matmul,
  - static stride-4 output row writes, data-dependent bit-position update.

Run: python tools/proto_huffman_loop.py [--steps 288] [--w 64]
Reports ms per invocation and the real-time-equivalent factor assuming
153 granule-channels per audio-second (44.1 kHz stereo MPEG1).
"""

import argparse
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_TABLES = 18
LUT_COLS = 4 * N_TABLES  # [x, y, len, flags] per table group


def make_kernel(steps: int, W: int, no_fetch=False, no_mm=False, no_oh=False, no_store=False):
    def kernel(buf_ref, p0_ref, tid_ref, lutT_ref, gT_ref, out_ref, p_out_ref):
        iota512c = lax.broadcasted_iota(jnp.int32, (512, 128), 0)
        iota72r = lax.broadcasted_iota(jnp.int32, (LUT_COLS, 1024), 0) // 4

        # tid per lane, tiled out to (LUT_COLS, 1024) mask rows once.
        tid_rows = [tid_ref[s : s + 1, :] for s in range(8)]
        tid_flat = jnp.concatenate(tid_rows, axis=1)  # (1, 1024)
        tmask = (iota72r == tid_flat).astype(jnp.float32)

        def step(k, carry):
            p, acc, pending = carry
            w_idx = lax.shift_right_logical(p, jnp.int32(5))
            o = jnp.bitwise_and(p, 31)

            def fetch(i, accs):
                a0, a1 = accs
                m = w_idx == i
                a0 = a0 + jnp.where(m, buf_ref[i], 0)
                a1 = a1 + jnp.where(m, buf_ref[i + 1], 0)
                return (a0, a1)

            zeros = jnp.zeros((8, 128), jnp.int32)
            if no_fetch:
                w0 = p * 1664525 + 1013904223
                w1 = p * 22695477 + 1
            else:
                w0, w1 = lax.fori_loop(0, W - 1, fetch, (zeros, zeros))

            u0 = w0.astype(jnp.uint32)
            u1 = w1.astype(jnp.uint32)
            ou = o.astype(jnp.uint32)
            hi = jnp.where(
                o == 0,
                u0,
                (u0 << ou) | lax.shift_right_logical(u1, (32 - o).astype(jnp.uint32)),
            )
            lo = jnp.where(o == 0, u1, u1 << ou)
            win9 = lax.shift_right_logical(hi, jnp.uint32(23)).astype(jnp.int32)

            # Transposed one-hot per sublane, concatenated along lanes.
            if no_oh:
                ohT = jnp.zeros((512, 1024), jnp.bfloat16) + win9[0, 0].astype(jnp.bfloat16)
            else:
                ohs = [
                    (win9[s : s + 1, :] == iota512c).astype(jnp.bfloat16)
                    for s in range(8)
                ]
                ohT = jnp.concatenate(ohs, axis=1)  # (512, 1024)
            if no_mm:
                res4 = ohT[:4, :].astype(jnp.float32)
            else:
                res = jnp.dot(
                    lutT_ref[:], ohT, preferred_element_type=jnp.float32
                )  # (72, 1024)
                res4 = jnp.dot(
                    gT_ref[:], res * tmask, preferred_element_type=jnp.float32
                )  # (4, 1024)

            # Mock escape/sign extraction off the fetched 64-bit window.
            dlen_flat = res4[2:3, :].astype(jnp.int32) & 15  # (1, 1024)
            dlen = jnp.concatenate(
                [dlen_flat[:, s * 128 : (s + 1) * 128] for s in range(8)], axis=0
            ) + 1  # (8, 128)
            lin = lax.shift_right_logical(hi, (32 - (dlen & 7)).astype(jnp.uint32))
            sign = lax.shift_right_logical(lo, jnp.uint32(31))
            extra = (lin + sign).astype(jnp.int32) & 1

            # Output buffering: place the two value rows into an 8-row
            # pending register; flush at 8-aligned offsets every 4th step.
            row_iota = lax.broadcasted_iota(jnp.int32, (8, 1024), 0)
            vx = res4[0:1, :].astype(jnp.int32)
            vy = res4[1:2, :].astype(jnp.int32)
            r = (2 * k) % 8
            pending = jnp.where(row_iota == r, vx, pending)
            pending = jnp.where(row_iota == r + 1, vy, pending)

            if not no_store:
                @pl.when(k % 4 == 3)
                def _():
                    out_ref[pl.ds(8 * (k // 4), 8), :] = pending

            p = p + dlen + extra
            acc = acc + win9
            return (p, acc, pending)

        p, acc, _ = lax.fori_loop(
            0, steps, step,
            (p0_ref[:], jnp.zeros((8, 128), jnp.int32),
             jnp.zeros((8, 1024), jnp.int32)),
        )
        p_out_ref[:] = p + acc

    return kernel


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=288)
    ap.add_argument("--w", type=int, default=64)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--no-fetch", action="store_true")
    ap.add_argument("--no-mm", action="store_true")
    ap.add_argument("--no-oh", action="store_true")
    ap.add_argument("--no-store", action="store_true")
    args = ap.parse_args()

    steps, W = args.steps, args.w
    rng = np.random.default_rng(0)
    buf = rng.integers(0, 2**31, size=(W, 8, 128), dtype=np.int32)
    p0 = rng.integers(0, 64, size=(8, 128)).astype(np.int32)
    tid = rng.integers(0, N_TABLES, size=(8, 128)).astype(np.int32)
    lutT = rng.standard_normal((LUT_COLS, 512)).astype(jnp.bfloat16)
    gT = (np.arange(4)[:, None] == np.arange(LUT_COLS)[None, :] % 4).astype(
        np.float32
    )

    kernel = make_kernel(steps, W, args.no_fetch, args.no_mm, args.no_oh, args.no_store)
    fn = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((2 * steps + 8, 1024), jnp.int32),
            jax.ShapeDtypeStruct((8, 128), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
    )
    fn = jax.jit(fn)

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          file=sys.stderr)

    bufs = jax.device_put(jnp.asarray(buf))
    p0s = jax.device_put(jnp.asarray(p0))
    tids = jax.device_put(jnp.asarray(tid))
    luts = jax.device_put(jnp.asarray(lutT))
    gs = jax.device_put(jnp.asarray(gT))

    t0 = time.monotonic()
    out, pout = fn(bufs, p0s, tids, luts, gs)
    float(jnp.sum(pout))
    print(f"compile+first run: {time.monotonic() - t0:.1f}s", file=sys.stderr)

    # Chained timing (data dependency through p0 so runs serialize and
    # cannot be memoized).
    t0 = time.monotonic()
    p_chain = p0s
    for i in range(args.iters):
        out, pout = fn(bufs, p_chain % jnp.int32(64), tids, luts, gs)
        p_chain = pout
    val = float(jnp.sum(p_chain))  # true sync via value readback
    wall = (time.monotonic() - t0) / args.iters

    gch = 1024
    audio_sec = gch / 153.0  # 44.1k stereo MPEG1: ~153 gch per audio-second
    print(f"steps={steps} W={W}: {wall*1000:.2f} ms per {gch} gch "
          f"(chk {val:.0f})")
    print(f"real-time equivalent: {audio_sec / wall:.0f}x")


if __name__ == "__main__":
    main()
