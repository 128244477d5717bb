"""Pallas fused requantize→stereo kernel + natural-order class cores
for the XLA hybrid GEMMs.

The XLA formulation of the requantize→stereo span materializes every
intermediate — per-class scf/sbg sample tables, requantized spectra,
stereo outputs — at (B·G, 576) f32 each trip to HBM; measured ~78 ms of
the 64×60 s bench batch against ~3 ms of HBM roofline
(tools/devbench_stages.py). This kernel does the whole span in ONE
block-resident pass: int16 spectrum in, stereo'd f32 spectrum out.

The class-core GEMMs deliberately stay OUTSIDE the kernel, in XLA:
Mosaic-lowered dots sustain only ~37 TFLOP/s on these (576→1152)
shapes regardless of tile size, dot count, or precision mode
(tools/hk_dotprobe.py), while XLA's one-big-GEMM lowering of the same
contraction runs several× faster. A fully fused
requantize→stereo→GEMM kernel was built and measured at 268–386 ms —
worse than the 177 ms XLA span it replaced; splitting elementwise
(Pallas) from GEMM (XLA) beats both.

TPU-first structure:
  - rows are granule-times, CHANNEL-MAJOR planes: stereo reads both
    channels' tiles as separate block inputs (no strided sublane
    access);
  - the short/mixed sample reorder is folded away: all per-sample
    tables are re-indexed to NATURAL spectral order and the permutation
    is folded into the class-core matrices (xr_layout @ C ==
    xr_natural @ (Q C)), so the XLA side needs no reorder gather;
  - scalefactor/subblock-gain expansion is per-class one-hot dots on
    the tile (negligible MXU work; what matters is that the expanded
    tables never leave VMEM);
  - the XLA hybrid uses a 2-core masked decomposition
    (natural_cores): the mixed core's rows 36..575 equal the short
    core's EXACTLY, so per-row class selection becomes input masking —
      z = (x·[cls==0]) @ C_long · win
        + (x·(cls==1 | (cls==2 & sample>=36))) @ C_short
        + (x[:, :36]·[cls==2]) @ C_mixed_head
    — 2 full GEMMs + one 36-row slab instead of 3 full GEMMs and a
    select (a third fewer FLOPs, no (R, 1152) select intermediates).

Numerics: the requantize power uses exp2/log2 (the form XLA lowers pow
to). The unfused XLA path (decode/synthesis.py) remains the CPU/mesh
implementation and the equality oracle (tests/test_hybrid_kernel.py).

Replaces the DSP stage the reference delegates to symphonia
(/root/reference/src/replaygain.rs:804-904).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tables import KIND_MIXED, build_tables, row_tables

# Granule-times per grid step. The kernel is elementwise + tiny one-hot
# dots, so the block budget is just in/out tiles + expanded tables —
# far inside Mosaic's 16 MB scoped-VMEM default (raising that limit is
# harmful: it flips the compiler into a measurably slower schedule).
TILE = 256

# gmeta field indices (int32, one row per granule-channel).
GM_GG = 0  # global_gain
GM_SFS = 1  # scalefac_scale
GM_PRE = 2  # preflag
GM_SBG0 = 3
GM_SBG1 = 4
GM_SBG2 = 5
GM_BT = 6  # block_type
GM_CLS = 7  # layout class 0 long / 1 short / 2 mixed
GM_MS = 8
GM_IS = 9
GM_LSF = 10
GM_ISC = 11  # intensity_scale (parsed from ch1, stored per row)
GM_RZO = 12  # partner channel's rzero bound
GM_N = 16

_SQRT2_INV = float(1.0 / np.sqrt(2.0))


@lru_cache(maxsize=None)
def _perms(sr_row: int):
    t = build_tables()
    rt = row_tables(sr_row)
    return [
        np.arange(576),
        rt.perm_short.copy(),
        t.reorder[sr_row, KIND_MIXED].astype(np.int32),
    ]


@lru_cache(maxsize=None)
def _consts(sr_row: int):
    """Per-class requant/stereo tables re-indexed to natural order."""
    rt = row_tables(sr_row)
    perms = _perms(sr_row)

    slot_nat = np.zeros((3, 64, 576), np.float32)
    win_nat = np.zeros((3, 3, 576), np.float32)
    pretab_nat = np.zeros((3, 576), np.float32)
    bs_nat = np.zeros((3, 576), np.float32)
    short_nat = np.zeros((3, 576), np.float32)
    for c in range(3):
        perm = perms[c]
        # Layout table value at layout sample j belongs to natural
        # sample perm[j] (dst[j] = src[perm[j]]).
        slot_nat[c][:, perm] = rt.slot_onehot[c]
        win_nat[c][:, perm] = rt.win_onehot[c]
        pretab_nat[c][perm] = rt.pretab[c]
        bs_nat[c][perm] = rt.band_start[c].astype(np.float32)
        short_nat[c][perm] = rt.is_short[c].astype(np.float32)

    # Numpy on purpose: conversion happens at the pallas bind, so a call
    # inside an enclosing jit cannot cache device arrays across traces.
    return slot_nat, win_nat, pretab_nat, bs_nat, short_nat


@lru_cache(maxsize=None)
def natural_cores(sr_row: int):
    """Fused hybrid class cores in NATURAL spectral-input order, in the
    2-core + mixed-head decomposition used by the XLA GEMM side.

    Returns (cores2 (2, 576, 1152) f32 [long, short], head (P, 1152)
    f32, P, wins (4, 1152) f32). The mixed core is not materialized: in
    natural order its rows P..575 equal the short core's exactly (the
    short tail of a mixed block aliases/windows identically), so mixed
    rows decompose as z = (x·tail) @ C_short + x[:, :P] @ head. The
    split point P is DETECTED per sample-rate row: the mixed long
    region is 36 samples for MPEG-1 rows but wider for LSF rows, and
    the natural-order tail identity only starts past the widest
    scalefactor band that the two reorder permutations treat
    differently."""
    from .synthesis import _fused_hybrid_cores

    core_l, core_s, core_m, wins = _fused_hybrid_cores()
    cores_layout = [core_l, core_s, core_m]
    perms = _perms(sr_row)

    cores_nat = np.zeros((3, 576, 1152), np.float64)
    for c in range(3):
        perm = perms[c]
        # xr_layout = xr_natural[perm] = xr_natural @ Q with
        # Q[perm[j], j] = 1, so the natural-order core is Q @ core.
        q = np.zeros((576, 576))
        q[perm, np.arange(576)] = 1.0
        cores_nat[c] = q @ cores_layout[c]

    row_diff = np.abs(cores_nat[2] - cores_nat[1]).max(axis=1)
    nz = np.nonzero(row_diff > 1e-9)[0]
    p = int(nz.max()) + 1 if nz.size else 0
    assert p <= 288, (sr_row, p)  # long region never reaches half a granule
    cores2 = np.ascontiguousarray(cores_nat[:2]).astype(np.float32)
    head = np.ascontiguousarray(cores_nat[2][:p]).astype(np.float32)
    return cores2, head, p, wins.astype(np.float32)


def _kernel_body(n_channels: int):
    f32 = jnp.float32

    def sel_cls(cls, rows):
        """Select a per-class (X, 576) row set by the (T, 1) class id."""
        out = jnp.where(cls == 0, rows[0], rows[1])
        return jnp.where(cls == 2, rows[2], out)

    def requant(spec, scf, gm, slot_ref, winoh_ref, pre_ref, short_ref):
        s = spec.astype(f32)  # (T, 576)
        mag = jnp.abs(s)
        cls = gm[:, GM_CLS : GM_CLS + 1].astype(f32)

        scf_f = scf.astype(f32)  # (T, 64)
        scf_s = sel_cls(cls, [
            jnp.dot(scf_f, slot_ref[c], precision=lax.Precision.HIGHEST,
                    preferred_element_type=f32)
            for c in range(3)
        ])
        sbg = gm[:, GM_SBG0 : GM_SBG0 + 3].astype(f32)  # (T, 3)
        sbg_s = sel_cls(cls, [
            jnp.dot(sbg, winoh_ref[c], precision=lax.Precision.HIGHEST,
                    preferred_element_type=f32)
            for c in range(3)
        ])
        pre = sel_cls(cls, [pre_ref[c : c + 1, :] for c in range(3)])
        short = sel_cls(cls, [short_ref[c : c + 1, :] for c in range(3)])

        gg = gm[:, GM_GG : GM_GG + 1].astype(f32)
        sfs = gm[:, GM_SFS : GM_SFS + 1].astype(f32)
        preflag = gm[:, GM_PRE : GM_PRE + 1].astype(f32)
        scf_mult = 0.5 * (1.0 + sfs)
        exponent = (
            0.25 * (gg - 210.0)
            - scf_mult * (scf_s + preflag * pre)
            - 2.0 * short * sbg_s
        )
        # mag ** (4/3) via exp2/log2 (the same form XLA lowers pow to);
        # mag == 0 -> log2 = -inf -> exp2 = 0, matching pow(0) = 0.
        xm = jnp.exp2(jnp.log2(mag) * f32(4.0 / 3.0))
        return jnp.sign(s) * xm * jnp.exp2(exponent), scf_s, cls

    def stereo(x0, x1, scf_s1, cls0, gm0, gm1, bs_ref):
        ms = gm0[:, GM_MS : GM_MS + 1].astype(f32) == 1.0
        left = jnp.where(ms, (x0 + x1) * f32(_SQRT2_INV), x0)
        right = jnp.where(ms, (x0 - x1) * f32(_SQRT2_INV), x1)

        isf = gm0[:, GM_IS : GM_IS + 1].astype(f32) == 1.0
        band_start = sel_cls(cls0, [bs_ref[c : c + 1, :] for c in range(3)])
        rzero = gm0[:, GM_RZO : GM_RZO + 1].astype(f32)
        in_band = isf & (band_start >= rzero)

        is_pos = scf_s1  # ch1 scalefactors in natural sample layout

        angle = is_pos * f32(np.pi / 12.0)
        tan = jnp.tan(jnp.minimum(angle, f32(1.55)))
        kl1 = jnp.where(is_pos == 6.0, 1.0, tan / (1.0 + tan))
        kr1 = jnp.where(is_pos == 6.0, 0.0, 1.0 / (1.0 + tan))

        # io is 2^-1/2 or 2^-1/4, so io**n = exp2(n * log2(io)) with an
        # EXACT log2 — no variable-base pow in the kernel.
        log2_io = jnp.where(
            gm1[:, GM_ISC : GM_ISC + 1].astype(f32) == 1.0,
            f32(-0.5), f32(-0.25),
        )
        half_up = jnp.floor((is_pos + 1.0) * 0.5)
        k_odd = jnp.exp2(half_up * log2_io)
        is_odd = jnp.floor(is_pos * 0.5) * 2.0 != is_pos
        kl2 = jnp.where(is_odd, k_odd, 1.0)
        kr2 = jnp.where(
            is_odd, 1.0,
            jnp.where(is_pos == 0.0, 1.0,
                      jnp.exp2(jnp.floor(is_pos * 0.5) * log2_io)),
        )

        lsf = gm0[:, GM_LSF : GM_LSF + 1].astype(f32) == 1.0
        kl = jnp.where(lsf, kl2, kl1)
        kr = jnp.where(lsf, kr2, kr1)
        illegal = (~lsf) & (is_pos == 7.0)

        apply_i = in_band & ~illegal
        left = jnp.where(apply_i, kl * x0, left)
        right = jnp.where(apply_i, kr * x0, right)
        return left, right

    if n_channels == 2:

        def kernel(s0_ref, s1_ref, scf0_ref, scf1_ref, gm0_ref, gm1_ref,
                   slot_ref, winoh_ref, pre_ref, bs_ref, short_ref,
                   x0_ref, x1_ref):
            gm0 = gm0_ref[0]
            gm1 = gm1_ref[0]
            x0, _, cls0 = requant(s0_ref[0], scf0_ref[0], gm0, slot_ref,
                                  winoh_ref, pre_ref, short_ref)
            x1, scf_s1, cls1 = requant(s1_ref[0], scf1_ref[0], gm1,
                                       slot_ref, winoh_ref, pre_ref,
                                       short_ref)
            left, right = stereo(x0, x1, scf_s1, cls0, gm0, gm1, bs_ref)
            x0_ref[0] = left
            x1_ref[0] = right

        return kernel

    def kernel(s0_ref, scf0_ref, gm0_ref, slot_ref, winoh_ref, pre_ref,
               bs_ref, short_ref, x0_ref):
        gm0 = gm0_ref[0]
        x0, _, _ = requant(s0_ref[0], scf0_ref[0], gm0, slot_ref,
                           winoh_ref, pre_ref, short_ref)
        x0_ref[0] = x0

    return kernel


@lru_cache(maxsize=None)
def _fused_call(n_channels: int, n_tiles: int, interpret: bool):
    kern = _kernel_body(n_channels)

    def ch_block(shape_tail, c):
        # Channel planes arrive pre-sliced to (1, R, ...): the leading
        # block index is always 0; `c` only orders the argument list.
        del c
        return pl.BlockSpec((1, TILE) + shape_tail,
                            lambda i: (0, i) + (0,) * len(shape_tail),
                            memory_space=pltpu.VMEM)

    def const_block(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    data_specs = []
    for c in range(n_channels):
        data_specs += [ch_block((576,), c)]
    for c in range(n_channels):
        data_specs += [ch_block((64,), c)]
    for c in range(n_channels):
        data_specs += [ch_block((GM_N,), c)]
    # interleave per the kernel signature: s0,s1,scf0,scf1,gm0,gm1
    if n_channels == 2:
        order = [0, 1, 2, 3, 4, 5]
        data_specs = [data_specs[i] for i in order]

    const_specs = [
        const_block((3, 64, 576)),
        const_block((3, 3, 576)),
        const_block((3, 576)),
        const_block((3, 576)),
        const_block((3, 576)),
    ]
    out_specs = tuple(
        pl.BlockSpec((1, TILE, 576), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM)
        for _ in range(n_channels)
    )

    def make(rows):
        return pl.pallas_call(
            kern,
            grid=(n_tiles,),
            in_specs=data_specs + const_specs,
            out_specs=out_specs if n_channels == 2 else out_specs[0],
            out_shape=tuple(
                jax.ShapeDtypeStruct((1, rows, 576), jnp.float32)
                for _ in range(n_channels)
            ) if n_channels == 2 else jax.ShapeDtypeStruct(
                (1, rows, 576), jnp.float32),
            interpret=interpret,
        )

    return make(n_tiles * TILE)


def fused_requant_stereo(spec_cm, scf_cm, gmeta_cm, *, n_channels: int,
                         sr_row: int, interpret: bool = False):
    """(C, R, 576) int16 spectra + (C, R, 64) scf + (C, R, GM_N) gmeta
    → (C, R, 576) requantized, stereo-processed spectra in NATURAL
    spectral order (feed natural_cores GEMMs — no reorder needed).

    R must be a multiple of TILE (callers pad; zero rows produce zero
    output). Rows are granule-times, channel-major."""
    c, r, _ = spec_cm.shape
    assert c == n_channels and r % TILE == 0, (spec_cm.shape, n_channels)
    consts = _consts(sr_row)
    call = _fused_call(n_channels, r // TILE, interpret)
    if n_channels == 2:
        args = (
            spec_cm[0:1], spec_cm[1:2],
            scf_cm[0:1], scf_cm[1:2],
            gmeta_cm[0:1], gmeta_cm[1:2],
        )
        x0, x1 = call(*args, *consts)
        planes = [x0, x1]
    else:
        x0 = call(spec_cm[0:1], scf_cm[0:1], gmeta_cm[0:1], *consts)
        planes = [x0]
    return jnp.concatenate(planes, axis=0)  # (C, R, 576)


def hybrid_xla(xr_cm, gmeta_cm, *, sr_row: int, dtype=jnp.float32):
    """Natural-order spectra → windowed hybrid outputs via the 2-core
    masked decomposition, as plain XLA GEMMs (see module docstring:
    XLA's large-GEMM lowering beats Mosaic dots ~4× on these shapes).

    xr_cm (C, R, 576) f32, gmeta_cm (C, R, GM_N) int32 →
    (C, R, 1152) head|tail hybrid outputs. Runs at HIGH matmul
    precision (bf16x3) like the rest of the decode back-end."""
    cores2, head, p, wins = natural_cores(sr_row)
    cls = gmeta_cm[..., GM_CLS : GM_CLS + 1]
    lane = lax.broadcasted_iota(jnp.int32, xr_cm.shape, xr_cm.ndim - 1)
    xa = jnp.where(cls == 0, xr_cm, 0.0)
    xb = jnp.where((cls == 1) | ((cls == 2) & (lane >= p)), xr_cm, 0.0)
    xc = jnp.where(cls == 2, xr_cm[..., :p], 0.0)
    with jax.default_matmul_precision("high"):
        za = jnp.dot(xa, jnp.asarray(cores2[0], dtype),
                     preferred_element_type=dtype)
        zb = jnp.dot(xb, jnp.asarray(cores2[1], dtype),
                     preferred_element_type=dtype)
        zc = jnp.dot(xc, jnp.asarray(head, dtype),
                     preferred_element_type=dtype)
    bt = gmeta_cm[..., GM_BT : GM_BT + 1]
    wins = jnp.asarray(wins, dtype)
    win = jnp.where(
        bt == 1, wins[1], jnp.where(bt == 3, wins[3], wins[0])
    )
    return za * win + zb + zc
