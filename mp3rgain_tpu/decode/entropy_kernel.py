"""Device-side MP3 entropy decode: a Pallas lockstep Huffman kernel.

Replaces the host Huffman stage (the round-1 end-to-end ceiling at
~1,000x real-time/core) with an on-chip decoder, so the host->device
payload is raw main-data bytes instead of decoded spectra.

Architecture (per SURVEY.md §7 hard-part #1, redesigned TPU-first):
  - lanes = granule-channels, all per-lane state in (1, L) int32 rows
    (TPU has no per-lane gather; (8,128)<->(1024,1) relayouts are
    unsupported in Mosaic, so everything stays in the row domain);
  - per-lane word fetch from the (W8, 8, L) stream buffer by select-sum;
  - per step, each lane decodes ONE spectral item (an (x, y) pair in the
    big-values region or a 4-value quad in count1):
      window(9b) -> one-hot (512, L) bf16 -> LUT matmul on the MXU
      (exact: each one-hot column selects a single packed-byte LUT row),
      long codes resolve the same step through a second window over the
      192 continuation groups (LUT_B); the two 19-bit codes of table 13
      resolve by one extra bit; escape linbits and sign bits are pure
      VPU shift arithmetic;
  - outputs go to a stride-4 step-indexed buffer via an 8-row pending
    register flushed at aligned offsets; one XLA take_along_axis gather
    compacts it into the (N, 576) spectrum (big pairs at 2n, count1
    quads at 2*big_end + 4j), exactly matching the host decoder
    (_native/mp3dec.cpp decode_spectrum, incl. the count1 overshoot
    rewind and the zero-spectrum-on-overrun rule);
  - granule-channels are SORTED by estimated step count into blocks, and
    each block's step/word loop bounds arrive via scalar prefetch — a
    short-granule block exits after its own max, not the batch max, and
    one compiled kernel serves all content within a (rows, w8) capacity
    class.

Oracle: mg_mp3_unpack (full host decode) — tests/test_entropy_kernel.py
asserts exact integer spectrum equality on all fixture classes.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import frontend as fe
from .entropy_tables import L3_PAIR1, N_GROUPS_A, build_luts

LANES = 1024  # granule-channels per grid block
META_ROWS = 16
MAX_STEPS = 288  # >= bvp + (576-2*bvp)/4 for all legal streams
# Capacity classes: one compile per (steps_cap, w8_cap); per-block actual
# bounds are dynamic scalars.
STEP_CAPS = (48, 96, 160, 224, 288)
W8_CAPS = (3, 5, 7, 9, 12, 17)


def _cap(value, caps):
    for c in caps:
        if value <= c:
            return c
    return caps[-1]


def _kernel(lanes: int, n_l2: int):
    L = lanes
    na_rows = 2 * N_GROUPS_A
    nb_rows = 2 * n_l2

    def kernel(sref, buf_ref, meta_ref, lutA_ref, lutB_ref, gA_ref, gB_ref,
               vals_ref, mout_ref):
        i32 = jnp.int32
        u32 = jnp.uint32
        iota512 = lax.broadcasted_iota(i32, (512, L), 0)
        iotaA = lax.broadcasted_iota(i32, (na_rows, L), 0) // 2
        iotaB = lax.broadcasted_iota(i32, (nb_rows, L), 0) // 2
        row8 = lax.broadcasted_iota(i32, (8, L), 0)

        pid = pl.program_id(0)
        nsteps = sref[pid, 0]
        nw8 = sref[pid, 1]

        m = meta_ref[0]
        p0 = m[fe.LM_P0 : fe.LM_P0 + 1, :]
        p23 = m[fe.LM_P23 : fe.LM_P23 + 1, :]
        bvp = m[fe.LM_BVP : fe.LM_BVP + 1, :]
        r0p = m[fe.LM_R0P : fe.LM_R0P + 1, :]
        r1p = m[fe.LM_R1P : fe.LM_R1P + 1, :]
        g0 = m[fe.LM_G0 : fe.LM_G0 + 1, :]
        g1 = m[fe.LM_G1 : fe.LM_G1 + 1, :]
        g2 = m[fe.LM_G2 : fe.LM_G2 + 1, :]
        l0 = m[fe.LM_L0 : fe.LM_L0 + 1, :]
        l1 = m[fe.LM_L1 : fe.LM_L1 + 1, :]
        l2 = m[fe.LM_L2 : fe.LM_L2 + 1, :]
        gcnt = m[fe.LM_GCNT : fe.LM_GCNT + 1, :]
        pend = p0 + p23

        zero = jnp.zeros((1, L), i32)
        zero_u = jnp.zeros((1, L), u32)

        def sel3(j, a, b, c):
            return jnp.where(j == 0, a, jnp.where(j == 1, b, c))

        def step(k, carry):
            p, n, q, alive, bad_ever, pending = carry
            big = n < bvp
            ok = (p < pend) & (alive == 1)
            can_big = big & ok
            can_cnt = (~big) & ok & (2 * n + 4 * q + 4 <= 576)
            act = can_big | can_cnt

            wi = p >> 5

            def fetch(wg, accs):
                a0, a1, a2 = accs
                blk = buf_ref[0, wg]  # (8, L)
                base = wg * 8
                for j in range(8):
                    row = blk[j : j + 1, :]
                    a0 = a0 + jnp.where(wi == base + j, row, 0)
                    a1 = a1 + jnp.where(wi == base + j - 1, row, 0)
                    a2 = a2 + jnp.where(wi == base + j - 2, row, 0)
                return (a0, a1, a2)

            w0, w1, w2 = lax.fori_loop(0, nw8, fetch, (zero, zero, zero))
            u0 = w0.astype(u32)
            u1 = w1.astype(u32)
            u2 = w2.astype(u32)
            base_bit = wi << 5

            def extract(qbit, nbits):
                """Top `nbits` (static) bits at absolute bit pos qbit."""
                rel = qbit - base_bit  # 0..~80
                j = rel >> 5
                r = (rel & 31).astype(u32)
                wa = sel3(j, u0, u1, u2)
                wb = sel3(j, u1, u2, zero_u)
                cat = jnp.where(
                    r == 0, wa, (wa << r) | (wb >> (u32(32) - r))
                )
                return (cat >> u32(32 - nbits)).astype(i32)

            win1 = extract(p, 9)
            gbig = jnp.where(n < r0p, g0, jnp.where(n < r1p, g1, g2))
            linb = jnp.where(n < r0p, l0, jnp.where(n < r1p, l1, l2))
            gid1 = jnp.where(big, gbig, gcnt)

            # bf16 one-hot matmuls are exact here: each one-hot column
            # copies one packed-byte LUT row (values <= 255), and the
            # group-select reduction sums <= 1 nonzero value per field.
            oh1 = (win1 == iota512).astype(jnp.bfloat16)
            resA = lax.dot_general(
                lutA_ref[:], oh1, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (na_rows, L)
            mA = (iotaA == gid1).astype(jnp.bfloat16)
            fA = lax.dot_general(
                gA_ref[:], (resA * mA).astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            ).astype(i32)  # (2, L): [ab, adv+16*flag]
            ab1 = fA[0:1, :]
            adv1 = fA[1:2, :] & 15
            flag1 = fA[1:2, :] >> 4
            cont = (flag1 == 1) & can_big
            bad = (flag1 == 3) & act

            win2x = extract(p + adv1, 10)
            win2 = win2x >> 1
            oh2 = (win2 == iota512).astype(jnp.bfloat16)
            resB = lax.dot_general(
                lutB_ref[:], oh2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (nb_rows, L)
            mB = (iotaB == ab1).astype(jnp.bfloat16)
            fB = lax.dot_general(
                gB_ref[:], (resB * mB).astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            ).astype(i32)  # (2, L): [ab, adv+1]
            ab2 = fB[0:1, :]
            adv2 = fB[1:2, :] - 1
            l3 = cont & (adv2 == 10)
            b2_ = jnp.where(l3 & ((win2x & 1) == 1), L3_PAIR1[1], ab2 >> 4)
            bad = bad | (cont & (adv2 < 0))

            x = jnp.where(cont, ab2 & 15, ab1 & 15)
            y = jnp.where(cont, b2_, ab1 >> 4)
            clen = jnp.where(cont, 9 + adv2, adv1)

            # --- big-values: escape linbits + sign bits -------------------
            qq = p + clen
            e1 = extract(qq, 14)
            ex = (x == 15) & (linb > 0)
            linx = e1 >> (14 - linb)
            xv = x + jnp.where(ex, linx, 0)
            lx = jnp.where(ex, linb, 0)
            sx = (xv != 0) & can_big
            xbit = (e1 >> (13 - lx)) & 1
            xv = jnp.where(sx & (xbit == 1), -xv, xv)
            q2 = qq + lx + sx.astype(i32)
            e2 = extract(q2, 14)
            ey = (y == 15) & (linb > 0)
            liny = e2 >> (14 - linb)
            yv = y + jnp.where(ey, liny, 0)
            ly = jnp.where(ey, linb, 0)
            sy = (yv != 0) & can_big
            ybit = (e2 >> (13 - ly)) & 1
            yv = jnp.where(sy & (ybit == 1), -yv, yv)
            p_big = q2 + ly + sy.astype(i32)

            # --- count1 quad: 4 values in {-1, 0, 1} ----------------------
            v = ab1 & 15
            v3 = (v >> 3) & 1
            v2_ = (v >> 2) & 1
            v1_ = (v >> 1) & 1
            v0_ = v & 1
            o1 = v3
            o2 = v3 + v2_
            o3 = o2 + v1_
            nz = o3 + v0_
            sb = e1 >> 10  # 4 sign bits at qq (same extract as big x-part)
            c0 = jnp.where(v3 == 1, 1 - 2 * ((sb >> 3) & 1), 0)
            c1 = jnp.where(v2_ == 1, 1 - 2 * ((sb >> (3 - o1)) & 1), 0)
            c2 = jnp.where(v1_ == 1, 1 - 2 * ((sb >> (3 - o2)) & 1), 0)
            c3 = jnp.where(v0_ == 1, 1 - 2 * ((sb >> (3 - o3)) & 1), 0)
            p_cnt = qq + nz
            over = can_cnt & (p_cnt > pend)

            emit_big = can_big & (~bad)
            emit_cnt = can_cnt & (~over) & (~bad)
            s0v = jnp.where(emit_big, xv, jnp.where(emit_cnt, c0, 0))
            s1v = jnp.where(emit_big, yv, jnp.where(emit_cnt, c1, 0))
            s2v = jnp.where(emit_cnt, c2, 0)
            s3v = jnp.where(emit_cnt, c3, 0)

            r = (4 * k) % 8
            pending = jnp.where(row8 == r, s0v, pending)
            pending = jnp.where(row8 == r + 1, s1v, pending)
            pending = jnp.where(row8 == r + 2, s2v, pending)
            pending = jnp.where(row8 == r + 3, s3v, pending)

            @pl.when(k % 2 == 1)
            def _():
                vals_ref[0, pl.ds(8 * (k // 2), 8), :] = pending

            p = jnp.where(emit_big, p_big, jnp.where(emit_cnt, p_cnt, p))
            n = n + emit_big.astype(i32)
            q = q + emit_cnt.astype(i32)
            alive = jnp.where(bad | over, 0, alive)
            bad_ever = jnp.where(bad, 1, bad_ever)
            return (p, n, q, alive, bad_ever, pending)

        init = (
            p0,
            zero,
            zero,
            jnp.ones((1, L), i32),
            jnp.zeros((1, L), i32),
            jnp.zeros((8, L), i32),
        )
        p, n, q, alive, bad_ever, _ = lax.fori_loop(0, nsteps, step, init)

        badi = bad_ever
        mout = jnp.concatenate(
            [
                jnp.where(badi == 1, 0, 2 * n),          # big_end
                jnp.where(badi == 1, 0, 2 * n + 4 * q),  # count1_end
                badi,
                p,
                n,
                q,
                alive,
                zero,
            ],
            axis=0,
        )
        mout_ref[0] = mout

    return kernel


@lru_cache(maxsize=None)
def _luts_packed():
    """Pack LUT fields into bytes: 2 rows per group.

    LUT_A row pair: [a + 16*b (or the L2 group id for long prefixes),
                     adv + 16*flag]
    LUT_B row pair: [a + 16*b, adv + 1]  (0 => invalid)
    All values <= 255 so bf16 carries them exactly.
    """
    lut_a, lut_b, _, _, n_l2 = build_luts()
    na = lut_a.reshape(512, N_GROUPS_A, 4).astype(np.int32)
    a, b, adv, flag = na[..., 0], na[..., 1], na[..., 2], na[..., 3]
    # Short codes / count1: ab = a + 16*b. Long prefixes: the group id was
    # stored split (a = gid & 127, b = gid >> 7); repack as the raw id.
    gid = a + 128 * b
    ab = np.where(flag == 1, gid, a + 16 * b)
    packed_a = np.stack([ab, adv + 16 * flag], axis=-1)  # (512, GA, 2)
    lutA_T = np.ascontiguousarray(
        packed_a.reshape(512, -1).T
    ).astype(np.float32)

    nb = lut_b.reshape(512, n_l2, 3).astype(np.int32)
    a2, b2, adv2 = nb[..., 0], nb[..., 1], nb[..., 2]
    packed_b = np.stack([a2 + 16 * b2, adv2 + 1], axis=-1)
    lutB_T = np.ascontiguousarray(
        packed_b.reshape(512, -1).T
    ).astype(np.float32)

    gA = np.zeros((2, lutA_T.shape[0]), np.float32)
    gB = np.zeros((2, lutB_T.shape[0]), np.float32)
    for f in range(2):
        gA[f, f::2] = 1
        gB[f, f::2] = 1
    return (
        jnp.asarray(lutA_T, jnp.bfloat16),
        jnp.asarray(lutB_T, jnp.bfloat16),
        jnp.asarray(gA, jnp.bfloat16),
        jnp.asarray(gB, jnp.bfloat16),
        n_l2,
    )


@lru_cache(maxsize=None)
def _decode_call(steps_cap: int, w8_cap: int, nb: int, interpret: bool):
    lutA_T, lutB_T, gA, gB, n_l2 = _luts_packed()
    rows = 4 * steps_cap
    kern = _kernel(LANES, n_l2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, w8_cap, 8, LANES), lambda i, s: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, META_ROWS, LANES), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lutA_T.shape[0], 512), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lutB_T.shape[0], 512), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(gA.shape, lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(gB.shape, lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, rows, LANES), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, LANES), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    call = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((nb, rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((nb, 8, LANES), jnp.int32),
        ),
        interpret=interpret,
    )

    @jax.jit
    def run(scalars, buf, meta):
        return call(scalars, buf, meta, lutA_T, lutB_T, gA, gB)

    return run


def _estimate_steps(meta: np.ndarray) -> np.ndarray:
    """Per-gch upper bound on lockstep steps (exact for big, bound for
    count1: quads only run after all big pairs complete)."""
    bvp = meta[:, fe.LM_BVP].astype(np.int64)
    p23 = meta[:, fe.LM_P23].astype(np.int64)
    quads = np.clip(np.minimum((576 - 2 * bvp) // 4, p23), 0, None)
    return np.minimum(bvp + quads, MAX_STEPS).astype(np.int32)


def decode_spectra(md: np.ndarray, meta: np.ndarray, *,
                   interpret: bool = False):
    """Decode per-gch Huffman windows into (N, 576) int32 spectra.

    md: (N, >=bytes) uint8 main-data windows (from unpack_data_light);
    meta: (N, LIGHT_META_N) int32.
    Returns (spectrum (N, 576) int32, big_end (N,), count1_end (N,),
    ok (N,) bool) as jax arrays on the default device.
    """
    n = md.shape[0]
    nb = max(1, -(-n // LANES))
    npad = nb * LANES

    est = np.zeros(npad, np.int32)
    est[:n] = _estimate_steps(meta)
    bits = np.zeros(npad, np.int64)
    bits[:n] = meta[:, fe.LM_P0].astype(np.int64) + meta[:, fe.LM_P23]
    # Sort lanes by estimated steps so each block's dynamic bound is tight.
    order = np.argsort(est, kind="stable")
    inv = np.empty_like(order)
    inv[order] = np.arange(npad)

    est_s = est[order].reshape(nb, LANES)
    bits_s = bits[order].reshape(nb, LANES)
    steps_b = est_s.max(axis=1)
    steps_b = np.maximum((steps_b + 1) // 2 * 2, 2)  # even, >= 2
    # words needed: window bits + 64 slack for mid-symbol overreach
    w8_b = np.maximum((bits_s.max(axis=1) + 64 + 255) // 256, 1)

    steps_cap = _cap(int(steps_b.max()), STEP_CAPS)
    w8_cap = _cap(int(w8_b.max()), W8_CAPS)
    w = 8 * w8_cap

    src_rows = order  # (npad,)
    take = min(md.shape[1], w * 4)
    mdp = np.zeros((npad, w * 4), np.uint8)
    valid_rows = src_rows < n
    mdp[valid_rows, :take] = md[src_rows[valid_rows], :take]
    words = (
        (mdp[:, 0::4].astype(np.uint32) << 24)
        | (mdp[:, 1::4].astype(np.uint32) << 16)
        | (mdp[:, 2::4].astype(np.uint32) << 8)
        | mdp[:, 3::4].astype(np.uint32)
    )
    buf = (
        words.view(np.int32)
        .reshape(nb, LANES, w8_cap, 8)
        .transpose(0, 2, 3, 1)
    )
    buf = np.ascontiguousarray(buf)

    metap = np.zeros((npad, META_ROWS), np.int32)
    metap[valid_rows, : meta.shape[1]] = meta[src_rows[valid_rows]]
    metab = np.ascontiguousarray(
        metap.reshape(nb, LANES, META_ROWS).transpose(0, 2, 1)
    )
    scalars = np.stack(
        [steps_b.astype(np.int32), w8_b.astype(np.int32)], axis=1
    )

    run = _decode_call(steps_cap, w8_cap, nb, interpret)
    vals, mout = run(jnp.asarray(scalars), jnp.asarray(buf),
                     jnp.asarray(metab))

    # (nb, rows, LANES) -> sorted (npad, rows) -> unsort to input order.
    rows = vals.shape[1]
    inv_j = jnp.asarray(inv)
    vals_n = vals.transpose(0, 2, 1).reshape(npad, rows)[inv_j][:n]
    mout_n = mout.transpose(0, 2, 1).reshape(npad, 8)[inv_j][:n]
    big_end = mout_n[:, 0]
    c1end = mout_n[:, 1]
    ok = mout_n[:, 2] == 0

    i = jnp.arange(576, dtype=jnp.int32)[None, :]
    bp2 = big_end[:, None]
    src = jnp.where(i < bp2, 4 * (i >> 1) + (i & 1), i + bp2)
    src = jnp.minimum(src, rows - 1)
    spec = jnp.take_along_axis(vals_n, src, axis=1)
    spec = jnp.where(i < c1end[:, None], spec, 0)
    return spec, big_end, c1end, ok
