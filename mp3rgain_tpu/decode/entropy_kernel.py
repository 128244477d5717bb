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
      window(8b) -> one-hot (256, L) int8 -> LUT matmul on the MXU
      (exact: each one-hot column selects a single packed-byte LUT row),
      long codes resolve the same step through an 8+5+6-bit window
      cascade over content-deduped continuation groups (LUT_B/LUT_C);
      count1 quads use their own 6-bit window over a 2-group LUT;
      escape linbits and sign bits are pure VPU shift arithmetic;
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

import os
from dataclasses import dataclass
from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import frontend as fe
from .entropy_tables import F2_L3, GROUP_COUNT1_A, N_GROUPS_A, build_luts


def _declare_pack(lib):
    import ctypes

    u64p = ctypes.POINTER(ctypes.c_uint64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u16p = ctypes.POINTER(ctypes.c_uint16)
    lib.mg_entropy_pack4.restype = None
    lib.mg_entropy_pack4.argtypes = [
        u64p, u64p, ctypes.c_int64, ctypes.c_int64, i32p, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, i32p, i32p, ctypes.c_int64,
        ctypes.c_int64, i32p, u16p,
    ]


from ..native import _lib as _native_lib  # noqa: E402

_declare_pack(_native_lib)

# Granule-channels per grid block. Wider blocks amortize the per-step
# fixed cost over more lanes at ~2% looser step bounds on sorted
# content: measured on v5e, 2048 lanes run the same real batch ~17%
# faster than 1024 (total lockstep steps halve, per-step cost grows
# 1.85x; int16 spectrum output keeps the block inside the ~16 MB scoped
# VMEM limit). Env-overridable for A/B (tools/devbench_entropy.py).
LANES = int(os.environ.get("MP3RGAIN_ENTROPY_LANES", "2048"))
# Blocks decoded per grid program. The hope for ILV=2 was that the
# scheduler would overlap one block's MXU lookups with the other's VPU
# bit arithmetic (the per-step chain is serial within a block), but the
# measured A/B on v5e is a wash: 8.08 ms (ILV=2) vs 7.94 ms (ILV=1) on
# the nb=16 devbench — Mosaic emits the two chains back to back without
# cross-chain overlap, and the doubled working set needed an int8
# count1 scratch just to fit the ~16 MB VMEM budget. Default 1; the
# machinery stays for re-testing on other generations
# (MP3RGAIN_ENTROPY_ILV=2).
#
# Both LANES and ILV are read ONCE at import and baked into
# prepare_batch padding and the lru_cached compiled kernels; mutating
# them (or the env) later in-process has no effect on already-cached
# shapes. Set the env before importing this module. When nb is not a
# multiple of ILV, _decode_call silently runs with ilv=1 (legacy odd-nb
# manifests).
ILV = int(os.environ.get("MP3RGAIN_ENTROPY_ILV", "1"))
# Measurement-only ablation switch (tools/devbench_entropy.py): disables
# parts of the decode step to attribute per-step cost. Produces WRONG
# results — never set outside benchmarking. Values: "", "nofetch",
# "nolut", "nocont", "noesc".
ABLATE = os.environ.get("MP3RGAIN_EK_ABLATE", "")
# Per-lane decode metadata travels bit-packed as 5 uint16 rows (the
# earlier 16 full rows were 25 MB of a 64x60s batch's manifest; packed
# they are 7.9 MB). Layout (mirrored by _native/mp3dec.cpp
# mg_entropy_pack3 — keep in sync):
#   w0: p23[0:12]  | p0[12:15] | count1_table_bit[15]  (gcnt = bit + 16)
#   w1: bvp[0:9]   | g0[9:13]
#   w2: r0p[0:9]   | g1[9:13]
#   w3: r1p[0:9]   | g2[9:13]
#   w4: l0[0:4] | l1[4:8] | l2[8:12]
META_ROWS = 5
MAX_STEPS = 288  # >= bvp + (576-2*bvp)/4 for all legal streams
# Scratch capacity in word-groups (one group = 8 int32 words = 256
# bits/lane): 17 * 256 = 4352 bits covers the maximum legal window
# (part2_3_length <= 4095 bits + byte-alignment slack; MD_STRIDE is 528
# bytes = 4224 bits). The HBM stream buffer is RAGGED at SUBGROUP
# granularity — each block's LANES sorted lanes split into SUBG_N
# contiguous 128-lane subgroups, each with its own word-group offset
# (scalar prefetch) and capacity from its own heaviest lane. The kernel
# re-assembles a block's (W8_MAX, 8, LANES) scratch from SUBG_N
# independent DMAs, so the transfer payload tracks the true bitstream
# size of each 128-lane span instead of the block's heaviest lane
# (measured: -17% stream-buffer bytes on 64-track class batches, worst
# batches -30%+ at low sample rates where window sizes vary most).
W8_MAX = 17
SUBG = 128
SUBG_N = LANES // SUBG


def _cap(value, caps):
    for c in caps:
        if value <= c:
            return c
    return caps[-1]


# Ragged stream-buffer sizes are quantized (1/16-of-magnitude units, so
# padding costs <= ~6% of the buffer) to bound the entropy-stage
# executable population; the entropy stage is dispatched separately from
# the (much larger) analysis tail, and a fresh g_pad key recompiles only
# the small Pallas program (~3 s measured on the v5e remote compiler, so
# up to 16 keys/octave is affordable — the earlier 1.25-geometric ladder
# padded the 64x60s bench batch by 22 MB).
def _quantize_g(groups: int) -> int:
    # 1/32nd granularity (~3% worst-case pad): g_pad is ~80% of the h2d
    # payload, and the scan planner pins one g_pad per length class
    # anyway (force_shapes), so finer steps don't multiply the compiled
    # executables where volume lives. The entropy program this keys is
    # the small fast-compiling one (two-dispatch split, round-3 notes).
    v = max(int(groups), 32)
    unit = max(32, 1 << max((v - 1).bit_length() - 5, 5))
    return -(-v // unit) * unit


def _kernel(lanes: int, n_l2: int, n_l3: int, ilv: int):
    L = lanes
    na_rows = 2 * N_GROUPS_A
    nb_rows = 2 * n_l2
    nc_rows = 2 * n_l3

    def kernel(sref, buf_ref, meta_ref, lutA_ref, lutB_ref, lutC_ref,
               lutCT_ref, gA_ref, gB_ref, gC_ref, gCT_ref, out_ref,
               mout_ref, c_ref, sbuf_ref, dma_sem):
        i32 = jnp.int32
        u32 = jnp.uint32
        iota256 = lax.broadcasted_iota(i32, (256, L), 0)
        iota32 = lax.broadcasted_iota(i32, (32, L), 0)
        iota64 = lax.broadcasted_iota(i32, (64, L), 0)
        iotaA = lax.broadcasted_iota(i32, (na_rows, L), 0) // 2
        iotaB = lax.broadcasted_iota(i32, (nb_rows, L), 0) // 2
        iotaC = lax.broadcasted_iota(i32, (nc_rows, L), 0) // 2
        iotaCT = lax.broadcasted_iota(i32, (4, L), 0) // 2
        row8 = lax.broadcasted_iota(i32, (8, L), 0)

        pid = pl.program_id(0)

        # Ragged stream fetch: each 128-lane SUBGROUP's word-groups
        # start at their own offset in the packed (g_pad, 8, SUBG) HBM
        # buffer (scalar prefetch columns 3..3+SUBG_N), and land in the
        # subgroup's own lane columns of the block scratch — each lane's
        # window still begins at scratch group 0 of its column, so the
        # decode body is unchanged. Every copy is the static W8_MAX
        # groups — reads past a subgroup's own groups land in the next
        # subgroup's data (or the zero tail pad) and are never
        # dereferenced (every fetch loop is bounded by the block's
        # dynamic nw8 and each lane's own word extent). All SUBG_N
        # copies start before any wait so the DMAs overlap.
        for _h in range(ilv):
            _cps = []
            for _s in range(SUBG_N):
                _off = sref[ilv * pid + _h, 3 + _s]
                _cp = pltpu.make_async_copy(
                    buf_ref.at[pl.ds(_off, W8_MAX)],
                    sbuf_ref.at[_h, :, :, pl.ds(_s * SUBG, SUBG)],
                    dma_sem,
                )
                _cp.start()
                _cps.append(_cp)
            for _cp in _cps:
                _cp.wait()

        class Half:
            """Per-block constants for one of the interleaved blocks.

            Meta arrives bit-packed (5 uint16 rows, layout at META_ROWS
            above) and is unpacked once per block — pure VPU shifts."""

            def __init__(self, h):
                self.h = h
                self.nbig = sref[ilv * pid + h, 0]
                self.ncnt = sref[ilv * pid + h, 1]
                self.nw8 = sref[ilv * pid + h, 2]
                m = meta_ref[h]
                w0 = m[0:1, :]
                w1 = m[1:2, :]
                w2 = m[2:3, :]
                w3 = m[3:4, :]
                w4 = m[4:5, :]
                p23 = w0 & 0xFFF
                self.p0 = (w0 >> 12) & 7
                self.gcnt = ((w0 >> 15) & 1) + 16
                self.bvp = w1 & 511
                self.g0 = (w1 >> 9) & 15
                self.r0p = w2 & 511
                self.g1 = (w2 >> 9) & 15
                self.r1p = w3 & 511
                self.g2 = (w3 >> 9) & 15
                self.l0 = w4 & 15
                self.l1 = (w4 >> 4) & 15
                self.l2 = (w4 >> 8) & 15
                self.pend = self.p0 + p23

        halves = [Half(h) for h in range(ilv)]
        nbig = halves[0].nbig
        ncnt = halves[0].ncnt
        for hh in halves[1:]:
            nbig = jnp.maximum(nbig, hh.nbig)
            ncnt = jnp.maximum(ncnt, hh.ncnt)

        zero = jnp.zeros((1, L), i32)
        zero_u = jnp.zeros((1, L), u32)

        # Both phases write step-uniform rows, so the output block is the
        # COMPACTED (576, L) spectrum and no XLA gather is needed (an
        # elementwise take_along_axis over the old stride-4 buffer cost
        # ~20x the kernel itself on TPU). int16 output: spectral values
        # are bounded by 15 + 8191 linbits = 8206, and halving the block
        # fits the 2048-lane variant inside the ~16 MB scoped-VMEM limit
        # (and halves the HBM write + downstream gather traffic).
        out_ref[...] = jnp.zeros((ilv, 576, L), jnp.int16)
        # count1 values are -1/0/1: int8 scratch keeps the interleaved
        # kernel inside the ~16 MB VMEM budget.
        c_ref[...] = jnp.zeros((ilv, 576, L), jnp.int8)

        def sel3(j, a, b, c):
            return jnp.where(j == 0, a, jnp.where(j == 1, b, c))

        def make_extract(hh, p, active):
            """Bit extractor for windows within ~80 bits after `p`.

            The select-sum word gather only scans the word-groups that
            *active* lanes can touch: lanes are sorted by workload so
            their bit positions cluster, and on uniform content the
            dynamic [lo, hi) bounds cover 1-2 of the up-to-17 groups.
            Inactive lanes (dead, or past their phase) read garbage — all
            their downstream uses are masked by the same predicate.
            """
            wi = p >> 5
            wi_act = jnp.where(active, wi, jnp.int32(0x7FFFFFFF))
            lo = jnp.min(wi_act) >> 3
            wi_hi = jnp.max(jnp.where(active, wi, -1))
            hi = jnp.minimum(((wi_hi + 2) >> 3) + 1, hh.nw8)

            def fetch(wg, accs):
                a0, a1, a2 = accs
                blk = sbuf_ref[hh.h, wg]  # (8, L)
                base = wg * 8
                for j in range(8):
                    row = blk[j : j + 1, :]
                    a0 = a0 + jnp.where(wi == base + j, row, 0)
                    a1 = a1 + jnp.where(wi == base + j - 1, row, 0)
                    a2 = a2 + jnp.where(wi == base + j - 2, row, 0)
                return (a0, a1, a2)

            if ABLATE == "nofetch":
                w0, w1, w2 = zero, zero, zero
            else:
                w0, w1, w2 = lax.fori_loop(lo, hi, fetch, (zero, zero, zero))
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

            return extract

        def lut_fields(win, gid, lut_ref, g_ref, iota_win, iota_rows):
            """One-hot x offset-LUT int8 matmuls (2x the bf16 MXU rate,
            exact by construction: each one-hot column copies one LUT row
            whose byte values are stored offset by -128, and the
            group-select dot adds exactly one such value plus zeros)."""
            oh = (win == iota_win).astype(jnp.int8)
            res = lax.dot_general(
                lut_ref[:], oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # (rows, L), values in [-128, 127]
            msk = (iota_rows == gid).astype(jnp.int8)
            f = lax.dot_general(
                g_ref[:], (res * msk).astype(jnp.int8),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32,
            )  # (2, L)
            return f[0:1, :] + 128, f[1:2, :] + 128

        def lookup_a(extract, p, gid):
            """8-bit window -> LUT_A fields [ab, adv, flag]."""
            win1 = extract(p, 8)
            if ABLATE == "nolut":
                return (win1 & 63) + 1, (win1 & 7) + 2, win1 & 0
            ab, af = lut_fields(win1, gid, lutA_ref, gA_ref, iota256, iotaA)
            return ab, af & 15, af >> 4

        # --- phase 1: big values; pair k lands at rows (2k, 2k+1) --------
        def big_step_one(hh, k, carry):
            p, n, alive, bad_ever, pending = carry
            can_big = (k < hh.bvp) & (p < hh.pend) & (alive == 1)

            extract = make_extract(hh, p, can_big)
            gbig = jnp.where(n < hh.r0p, hh.g0,
                             jnp.where(n < hh.r1p, hh.g1, hh.g2))
            linb = jnp.where(n < hh.r0p, hh.l0,
                             jnp.where(n < hh.r1p, hh.l1, hh.l2))
            ab1, adv1, flag1 = lookup_a(extract, p, gbig)
            cont = (flag1 == 1) & can_big
            bad = (flag1 == 3) & can_big

            # Continuation levels: a 5-bit then a 6-bit window (8 + 5 + 6
            # covers the longest code, 19 bits) over content-deduped
            # groups — far less MXU contraction than one 9-bit
            # continuation window. The continuation lookups are the bulk
            # of the per-step MXU issues but on real content only ~half
            # of lockstep steps have ANY lane on a long code (measured:
            # tools/meas_cont.py, 47% at 192 kbps), so the whole level is
            # skipped when no lane continues.
            def cont_levels(_):
                win2 = extract(p + 8, 5)
                ab2, f2 = lut_fields(win2, ab1, lutB_ref, gB_ref, iota32,
                                     iotaB)
                win3 = extract(p + 13, 6)
                ab3, rem3 = lut_fields(win3, ab2, lutC_ref, gC_ref, iota64,
                                       iotaC)
                return ab2, f2, ab3, rem3

            def no_cont(_):
                # No lane continues: f2/rem3 never read through `cont`.
                z = jnp.zeros((1, L), i32)
                return z, z, z, z

            if ABLATE == "nocont":
                ab2, f2, ab3, rem3 = no_cont(None)
                cont = cont & False
            else:
                ab2, f2, ab3, rem3 = lax.cond(
                    jnp.any(cont), cont_levels, no_cont, None
                )
            cont3 = cont & (f2 == F2_L3)
            bad = bad | (cont & (f2 == 0))
            bad = bad | (cont3 & (rem3 == 0))

            abf = jnp.where(cont3, ab3, jnp.where(cont, ab2, ab1))
            x = abf & 15
            y = abf >> 4
            clen = jnp.where(
                cont3, 13 + rem3, jnp.where(cont, 8 + f2, adv1)
            )

            # escape linbits + sign bits
            qq = p + clen
            if ABLATE == "noesc":
                emit = can_big & (~bad)
                s0v = jnp.where(emit, x, 0)
                s1v = jnp.where(emit, y, 0)
                r_ab = (2 * k) % 8
                pending = jnp.where(row8 == r_ab, s0v, pending)
                pending = jnp.where(row8 == r_ab + 1, s1v, pending)

                @pl.when(k % 4 == 3)
                def _():
                    out_ref[hh.h, pl.ds(8 * (k // 4), 8), :] = (
                        pending.astype(jnp.int16)
                    )

                p = jnp.where(emit, qq + 2, p)
                n = n + emit.astype(i32)
                alive = jnp.where(bad, 0, alive)
                bad_ever = jnp.where(bad, 1, bad_ever)
                return (p, n, alive, bad_ever, pending)
            # One 28-bit window covers the worst case exactly:
            # linbits_x(13) + sign_x(1) + linbits_y(13) + sign_y(1).
            e = extract(qq, 28)
            ex = (x == 15) & (linb > 0)
            linx = e >> (28 - linb)  # top bits: no mask needed
            xv = x + jnp.where(ex, linx, 0)
            lx = jnp.where(ex, linb, 0)
            sx = (xv != 0) & can_big
            xbit = (e >> (27 - lx)) & 1
            xv = jnp.where(sx & (xbit == 1), -xv, xv)
            o = lx + sx.astype(i32)
            ey = (y == 15) & (linb > 0)
            liny = (e >> (28 - o - linb)) & ((1 << linb) - 1)
            yv = y + jnp.where(ey, liny, 0)
            ly = jnp.where(ey, linb, 0)
            sy = (yv != 0) & can_big
            ybit = (e >> (27 - o - ly)) & 1
            yv = jnp.where(sy & (ybit == 1), -yv, yv)
            p_big = qq + o + ly + sy.astype(i32)

            emit = can_big & (~bad)
            s0v = jnp.where(emit, xv, 0)
            s1v = jnp.where(emit, yv, 0)

            r = (2 * k) % 8
            pending = jnp.where(row8 == r, s0v, pending)
            pending = jnp.where(row8 == r + 1, s1v, pending)

            @pl.when(k % 4 == 3)
            def _():
                out_ref[hh.h, pl.ds(8 * (k // 4), 8), :] = pending.astype(
                    jnp.int16
                )

            p = jnp.where(emit, p_big, p)
            n = n + emit.astype(i32)
            alive = jnp.where(bad, 0, alive)
            bad_ever = jnp.where(bad, 1, bad_ever)
            return (p, n, alive, bad_ever, pending)

        def big_step(k, carries):
            # Interleave: the halves are independent, so the scheduler can
            # overlap one half's MXU lookups with the other's VPU phase.
            return tuple(
                big_step_one(hh, k, c) for hh, c in zip(halves, carries)
            )

        init1 = tuple(
            (
                hh.p0,
                zero,
                jnp.ones((1, L), i32),
                jnp.zeros((1, L), i32),
                jnp.zeros((8, L), i32),
            )
            for hh in halves
        )
        states1 = lax.fori_loop(0, nbig, big_step, init1)
        big_n = [st[1] for st in states1]

        # --- phase 2: count1 quads; quad j at scratch rows 4j..4j+3 ------
        def cnt_step_one(hh, n, j, carry):
            p, q, alive, bad_ever, pending = carry
            can_cnt = (
                (p < hh.pend) & (alive == 1) & (2 * n + 4 * q + 4 <= 576)
            )

            extract = make_extract(hh, p, can_cnt)
            # count1 codes are at most 6 bits: a dedicated 6-bit window
            # over the 2-group LUT_CT (a (4, 64) contraction) replaces the
            # big-values primary lookup here.
            win_ct = extract(p, 6)
            ab1, af = lut_fields(win_ct, hh.gcnt - GROUP_COUNT1_A,
                                 lutCT_ref, gCT_ref, iota64, iotaCT)
            adv1 = af & 15
            flag1 = af >> 4
            bad = (flag1 == 3) & can_cnt

            qq = p + adv1
            e1 = extract(qq, 14)
            v = ab1 & 15
            v3 = (v >> 3) & 1
            v2_ = (v >> 2) & 1
            v1_ = (v >> 1) & 1
            v0_ = v & 1
            o1 = v3
            o2 = v3 + v2_
            o3 = o2 + v1_
            nz = o3 + v0_
            sb = e1 >> 10  # 4 sign bits at qq
            c0 = jnp.where(v3 == 1, 1 - 2 * ((sb >> 3) & 1), 0)
            c1 = jnp.where(v2_ == 1, 1 - 2 * ((sb >> (3 - o1)) & 1), 0)
            c2 = jnp.where(v1_ == 1, 1 - 2 * ((sb >> (3 - o2)) & 1), 0)
            c3 = jnp.where(v0_ == 1, 1 - 2 * ((sb >> (3 - o3)) & 1), 0)
            p_cnt = qq + nz
            over = can_cnt & (p_cnt > hh.pend)

            emit = can_cnt & (~over) & (~bad)
            s0v = jnp.where(emit, c0, 0)
            s1v = jnp.where(emit, c1, 0)
            s2v = jnp.where(emit, c2, 0)
            s3v = jnp.where(emit, c3, 0)

            r = (4 * j) % 8
            pending = jnp.where(row8 == r, s0v, pending)
            pending = jnp.where(row8 == r + 1, s1v, pending)
            pending = jnp.where(row8 == r + 2, s2v, pending)
            pending = jnp.where(row8 == r + 3, s3v, pending)

            @pl.when(j % 2 == 1)
            def _():
                c_ref[hh.h, pl.ds(8 * (j // 2), 8), :] = pending.astype(
                    jnp.int8
                )

            p = jnp.where(emit, p_cnt, p)
            q = q + emit.astype(i32)
            alive = jnp.where(bad | over, 0, alive)
            bad_ever = jnp.where(bad, 1, bad_ever)
            return (p, q, alive, bad_ever, pending)

        def cnt_step(j, carries):
            return tuple(
                cnt_step_one(hh, n, j, c)
                for hh, n, c in zip(halves, big_n, carries)
            )

        init2 = tuple(
            (st[0], zero, st[2], st[3], jnp.zeros((8, L), i32))
            for st in states1
        )
        states2 = lax.fori_loop(0, ncnt, cnt_step, init2)

        for hh, n, st in zip(halves, big_n, states2):
            p, q, alive, bad_ever, _ = st
            # --- place count1: per-lane barrel shift by 2*big_values -----
            # Quad j belongs at spectrum rows 2*bvp + 4j + m; the scratch
            # has it at 4j + m, so roll down by s = 2*bvp (circular is
            # safe: the wrapped region sources only rows >= 4*quads,
            # which are zero).
            s = 2 * hh.bvp  # (1, L), 0..576
            cv = c_ref[hh.h]  # int8; rolled narrow, widened once at the add
            for b in range(10):
                amt = 1 << b
                hit = ((s >> b) & 1) == 1
                cv = jnp.where(hit, jnp.roll(cv, amt, axis=0), cv)
            out_ref[hh.h] = out_ref[hh.h] + cv.astype(jnp.int16)

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
            mout_ref[hh.h] = mout

    return kernel


@lru_cache(maxsize=None)
def _luts_packed():
    """Pack LUT fields into bytes: 2 rows per group.

    LUT_A row pair (256-wide):  [ab (or the L2 group id for long
                                 prefixes), adv + 16*flag]
    LUT_B row pair (32-wide):   [ab, f2] (f2: 0 invalid, 1..5 rem, 6 L3)
    LUT_C row pair (64-wide):   [ab, rem3] (0 invalid)
    LUT_CT row pair (64-wide):  [v, adv + 16*flag] (count1 A/B)
    All values <= 255 so the int8 offset trick below is exact.
    """
    lut_a, lut_b, lut_c, lut_ct, n_l2, n_l3 = build_luts()
    lutA_T = np.ascontiguousarray(lut_a.T).astype(np.float32)
    lutB_T = np.ascontiguousarray(lut_b.T).astype(np.float32)
    lutC_T = np.ascontiguousarray(lut_c.T).astype(np.float32)
    lutCT_T = np.ascontiguousarray(lut_ct.T).astype(np.float32)

    gA = np.zeros((2, lutA_T.shape[0]), np.float32)
    gB = np.zeros((2, lutB_T.shape[0]), np.float32)
    gC = np.zeros((2, lutC_T.shape[0]), np.float32)
    gCT = np.zeros((2, lutCT_T.shape[0]), np.float32)
    for f in range(2):
        gA[f, f::2] = 1
        gB[f, f::2] = 1
        gC[f, f::2] = 1
        gCT[f, f::2] = 1
    # int8 MXU path (2x the bf16 rate on v5e, exact by construction):
    # field values are 0..255, stored offset by -128 to fit int8; the
    # group-select dot adds exactly one (value - 128) plus zeros, so
    # adding 128 back recovers the field. Kept as numpy (lru-cached;
    # jnp conversions inside an enclosing trace would leak tracers).
    return (
        (lutA_T - 128).astype(np.int8),
        (lutB_T - 128).astype(np.int8),
        (lutC_T - 128).astype(np.int8),
        (lutCT_T - 128).astype(np.int8),
        gA.astype(np.int8),
        gB.astype(np.int8),
        gC.astype(np.int8),
        gCT.astype(np.int8),
        n_l2,
        n_l3,
    )


@lru_cache(maxsize=None)
def _decode_call(nb: int, interpret: bool):
    """Jitted entropy stage over sorted blocks: (scalars, ragged buf,
    uint16 meta) -> (spec_b (nb, 576, LANES) int32, mout (nb, 8, LANES)).

    Compile key: nb only (plus the ragged buffer length via the input
    shape). The buffer stays in HBM; each grid step re-assembles its
    block's scratch from SUBG_N DMAs at per-subgroup dynamic offsets."""
    (lutA_T, lutB_T, lutC_T, lutCT_T, gA, gB, gC, gCT,
     n_l2, n_l3) = _luts_packed()
    # Interleave ILV blocks per program when the grid divides evenly
    # (prepare_batch rounds nb up); fall back to 1 for odd legacy sizes.
    ilv = ILV if nb % ILV == 0 else 1
    kern = _kernel(LANES, n_l2, n_l3, ilv)

    def full(shape):
        return pl.BlockSpec(shape, lambda i, s: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb // ilv,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # ragged stream buffer
            pl.BlockSpec((ilv, META_ROWS, LANES), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            full(lutA_T.shape),
            full(lutB_T.shape),
            full(lutC_T.shape),
            full(lutCT_T.shape),
            full(gA.shape),
            full(gB.shape),
            full(gC.shape),
            full(gCT.shape),
        ],
        out_specs=(
            pl.BlockSpec((ilv, 576, LANES), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ilv, 8, LANES), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((ilv, 576, LANES), jnp.int8),
            pltpu.VMEM((ilv, W8_MAX, 8, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    # Wider-lane experiments (MP3RGAIN_ENTROPY_LANES=4096) exceed the
    # 16 MB scoped-VMEM default; MP3RGAIN_ENTROPY_VMEM raises the limit
    # (bytes). Leave unset for the shipped 2048-lane configuration.
    vmem_limit = int(os.environ.get("MP3RGAIN_ENTROPY_VMEM", "0"))
    call = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((nb, 576, LANES), jnp.int16),
            jax.ShapeDtypeStruct((nb, 8, LANES), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit) if vmem_limit else None,
        interpret=interpret,
    )

    @jax.jit
    def run(scalars, buf, meta):
        # meta ships as uint16 (halves the h2d payload); widen once here.
        return call(scalars, buf, meta.astype(jnp.int32),
                    lutA_T, lutB_T, lutC_T, lutCT_T, gA, gB, gC, gCT)

    return run


def decode_blocks(scalars, buf, meta, *, nb: int, interpret: bool = False):
    """Stage 1: run the Pallas kernel over sorted blocks (no unsort).

    Dispatchable as its own executable so a fresh ragged-buffer length
    recompiles only this small program, not the analysis tail."""
    return _decode_call(nb, interpret)(scalars, buf, meta)


def unsort_blocks(spec_b, mout, inv, *, nb: int):
    """Stage 2 head: mask bad lanes, unsort to input row order."""
    npad = nb * LANES
    # Bad lanes report c1end 0 and must read as all-zero spectra
    # (values emitted before the stream went bad stay in the buffer).
    ce_b = mout[:, 1:2, :]
    i = jnp.arange(576, dtype=jnp.int32)[None, :, None]  # (1, 576, 1)
    spec_b = jnp.where(i < ce_b, spec_b, 0)

    # -> sorted (npad, .) -> unsort to input order (axis-0 row gathers,
    # the TPU-fast gather form).
    spec = spec_b.transpose(0, 2, 1).reshape(npad, 576)[inv]
    mout_n = mout.transpose(0, 2, 1).reshape(npad, 8)[inv]
    big_end = mout_n[:, 0]
    c1end = mout_n[:, 1]
    ok = mout_n[:, 2] == 0
    return spec, big_end, c1end, ok


def _estimate_steps(meta: np.ndarray) -> np.ndarray:
    """Per-gch upper bound on lockstep steps (exact for big, bound for
    count1: quads only run after all big pairs complete)."""
    bvp = meta[:, fe.LM_BVP].astype(np.int64)
    p23 = meta[:, fe.LM_P23].astype(np.int64)
    quads = np.clip(np.minimum((576 - 2 * bvp) // 4, p23), 0, None)
    return np.minimum(bvp + quads, MAX_STEPS).astype(np.int32)


@dataclass
class PreparedEntropy:
    """Host-prepped kernel inputs for one batch of granule-channels.

    The numpy arrays are the exact device transfer payload; the ints are
    the static compile keys (grid size + ragged buffer length via
    buf.shape). buf and meta come from the shared buffer pool — hand
    them back (utils.bufpool.give) once the device transfer completes.
    """

    scalars: np.ndarray  # (nb, 3 + SUBG_N) int32 [nbig, ncnt, nw8, off…]
    buf: np.ndarray  # (g_pad, 8, SUBG) int32 subgroup-ragged words
    meta: np.ndarray  # (nb, META_ROWS, LANES) uint16
    inv: np.ndarray  # (npad,) unsort permutation back to input order
    w8_cap: int  # scratch capacity (constant W8_MAX; kept for callers)
    nb: int
    n: int  # real (unpadded) row count

    @property
    def npad(self) -> int:
        return self.nb * LANES

    @property
    def g_pad(self) -> int:
        return self.buf.shape[0]


# nb quantization keeps the compiled-executable population small across
# varying batch sizes; padding blocks carry zero meta so their dynamic
# step bound is the minimum and they cost ~nothing on device.
NB_CAPS = (1, 2, 4, 8, 12, 16, 24, 32, 48, 64, 96, 128, 192, 256, 384,
           512, 768, 1024)


def prepare_batch(md, meta, quantize_nb: bool = False,
                  force_nb: int | None = None,
                  force_g_pad: int | None = None) -> PreparedEntropy:
    """Pack per-gch Huffman windows into sorted, blocked kernel inputs.

    md: (N, >=bytes) uint8 main-data windows (from unpack_data_light),
    or a list of such arrays (one per track — never concatenated; the
    native packer walks per-row pointers); meta: matching (N,
    LIGHT_META_N) int32 array or list. force_nb / force_g_pad pin the
    static shapes (>= the data's requirements) so independently prepared
    shards can share one compiled executable (multi-device dispatch).
    """
    import ctypes

    from ..native import _lib
    from ..utils import bufpool

    md_list = list(md) if isinstance(md, (list, tuple)) else [md]
    meta_list = list(meta) if isinstance(meta, (list, tuple)) else [meta]
    md_list = [np.ascontiguousarray(m) for m in md_list]
    meta_list = [np.ascontiguousarray(m, dtype=np.int32) for m in meta_list]
    counts = [m.shape[0] for m in md_list]
    n = int(sum(counts))
    md_stride = md_list[0].shape[1] if md_list else fe.MD_STRIDE

    nb = max(1, -(-n // LANES))
    if quantize_nb:
        nb = _cap(nb, NB_CAPS) if nb <= NB_CAPS[-1] else nb
    if force_nb is not None:
        assert force_nb >= nb, (force_nb, nb)
        nb = force_nb
    # Pad to the kernel's block-interleave factor; padding blocks carry
    # zero meta so their per-pair loop bound is the real block's.
    nb = -(-nb // ILV) * ILV
    npad = nb * LANES

    est = np.zeros(npad, np.int32)
    bvp = np.zeros(npad, np.int32)
    quads = np.zeros(npad, np.int32)
    bits = np.zeros(npad, np.int64)
    off = 0
    for m, c in zip(meta_list, counts):
        b = m[:, fe.LM_BVP].astype(np.int64)
        p23 = m[:, fe.LM_P23].astype(np.int64)
        qd = np.clip(np.minimum((576 - 2 * b) // 4, p23), 0, None)
        bvp[off : off + c] = b
        quads[off : off + c] = qd
        est[off : off + c] = np.minimum(b + qd, MAX_STEPS)
        bits[off : off + c] = m[:, fe.LM_P0].astype(np.int64) + p23
        off += c
    # Sort lanes by estimated steps so each block's dynamic bound is
    # tight; tie-break by window bits so each block's ragged capacity is
    # tight too (measured: -14% stream-buffer bytes at identical step
    # bounds on the 64x60s bench batch). Native stable counting sort:
    # np.lexsort on the same keys measured ~95 ms per 786k-lane batch
    # (~30% of host prep); the key range is tiny (est <= 288, bits <=
    # 4103), so O(n) counting beats comparison sorting by ~20x.
    order = np.empty(npad, dtype=np.int32)
    inv = np.empty(npad, dtype=np.int32)
    i32p_ = ctypes.POINTER(ctypes.c_int32)
    _lib.mg_sort_est_bits(
        est.ctypes.data_as(i32p_),
        bits.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(npad),
        order.ctypes.data_as(i32p_), inv.ctypes.data_as(i32p_),
    )

    bvp_s = bvp[order].reshape(nb, LANES)
    quads_s = quads[order].reshape(nb, LANES)
    bits_s = bits[order].reshape(nb, LANES)
    # Phase bounds: big pairs (multiple of 4 for the 8-row flush cadence),
    # count1 quads (multiple of 2).
    nbig_b = (bvp_s.max(axis=1) + 3) // 4 * 4
    ncnt_b = (quads_s.max(axis=1) + 1) // 2 * 2
    # words needed: window bits + 64 slack for mid-symbol overreach;
    # capacity is PER 128-LANE SUBGROUP (lanes are sorted, so each
    # subgroup's max tracks its mean much tighter than the block's) —
    # all-padding subgroups carry zero groups. The per-block nw8 the
    # kernel's fetch clamp reads is the max over the block's subgroups.
    bits_sg = bits_s.reshape(nb, SUBG_N, SUBG)
    real_sg = (order < n).reshape(nb, SUBG_N, SUBG).any(axis=2)
    w8_sg = np.where(
        real_sg, np.maximum((bits_sg.max(axis=2) + 64 + 255) // 256, 1), 0
    ).astype(np.int64)
    sg_off = np.concatenate(
        [[0], np.cumsum(w8_sg.ravel())[:-1]]
    ).astype(np.int32).reshape(nb, SUBG_N)
    w8_b = w8_sg.max(axis=1)
    g_real = int(w8_sg.sum())
    g_pad = _quantize_g(g_real + W8_MAX)
    if force_g_pad is not None:
        assert force_g_pad >= g_pad, (force_g_pad, g_pad)
        g_pad = force_g_pad

    # Per-row base pointers: the native packer gathers + big-endian word
    # packs + lane-transposes in one pass (numpy took ~20 s per 64x60s
    # batch on a 1-core host).
    md_rows = np.empty(max(n, 1), dtype=np.uint64)
    meta_rows = np.empty(max(n, 1), dtype=np.uint64)
    off = 0
    for m, mm, c in zip(md_list, meta_list, counts):
        if c == 0:
            continue
        md_rows[off : off + c] = (
            m.ctypes.data + np.arange(c, dtype=np.uint64) * m.strides[0]
        )
        meta_rows[off : off + c] = (
            mm.ctypes.data + np.arange(c, dtype=np.uint64) * mm.strides[0]
        )
        off += c

    # Pooled output buffers: recycled across batches so a long scan never
    # pays first-touch page faults (the dominant cost at 100+ MB/batch on
    # this VM class). The packer fully overwrites every in-use region;
    # the unwritten tail pad is never read by the kernel.
    buf = bufpool.take((g_pad, 8, SUBG), np.int32)
    metab = bufpool.take((nb, META_ROWS, LANES), np.uint16)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u16p = ctypes.POINTER(ctypes.c_uint16)
    sg_w8_flat = np.ascontiguousarray(w8_sg.ravel().astype(np.int32))
    sg_off_flat = np.ascontiguousarray(sg_off.ravel())
    _lib.mg_entropy_pack4(
        md_rows.ctypes.data_as(u64p), meta_rows.ctypes.data_as(u64p),
        ctypes.c_int64(n), ctypes.c_int64(fe.LIGHT_META_N),
        order.ctypes.data_as(i32p), ctypes.c_int64(npad),
        ctypes.c_int64(LANES), ctypes.c_int64(SUBG),
        sg_off_flat.ctypes.data_as(i32p), sg_w8_flat.ctypes.data_as(i32p),
        ctypes.c_int64(md_stride), ctypes.c_int64(META_ROWS),
        buf.ctypes.data_as(i32p), metab.ctypes.data_as(u16p),
    )

    scalars = np.concatenate(
        [np.stack([nbig_b.astype(np.int32), ncnt_b.astype(np.int32),
                   w8_b.astype(np.int32)], axis=1),
         sg_off], axis=1
    )
    return PreparedEntropy(
        scalars=scalars, buf=buf, meta=metab, inv=inv,
        w8_cap=W8_MAX, nb=nb, n=n,
    )


def decode_device(scalars, buf, meta, inv, *, nb: int,
                  w8_cap: int = W8_MAX, interpret: bool = False):
    """Traceable device-side decode over prepared inputs.

    Returns (spectrum (npad, 576) int32, big_end (npad,), count1_end
    (npad,), ok (npad,) bool) in *input* order (the caller slices [:n]).
    Safe to call inside an enclosing jit — the pallas call inlines.
    (w8_cap is accepted for caller compatibility; the scratch capacity
    is the constant W8_MAX now that the stream buffer is ragged.)
    """
    del w8_cap
    spec_b, mout = decode_blocks(scalars, buf, meta, nb=nb,
                                 interpret=interpret)
    return unsort_blocks(spec_b, mout, inv, nb=nb)


def decode_spectra(md: np.ndarray, meta: np.ndarray, *,
                   interpret: bool = False):
    """Decode per-gch Huffman windows into (N, 576) int32 spectra.

    Convenience wrapper over prepare_batch + decode_device for
    single-shot use (tests, small files). Returns (spectrum (N, 576)
    int32, big_end (N,), count1_end (N,), ok (N,) bool) as jax arrays.
    """
    p = prepare_batch(md, meta)
    spec, big_end, c1end, ok = decode_device(
        jnp.asarray(p.scalars), jnp.asarray(p.buf), jnp.asarray(p.meta),
        jnp.asarray(p.inv), w8_cap=p.w8_cap,
        nb=p.nb, interpret=interpret,
    )
    # Public contract stays int32 (the kernel emits int16 internally).
    return (spec[: p.n].astype(jnp.int32), big_end[: p.n], c1end[: p.n],
            ok[: p.n])
