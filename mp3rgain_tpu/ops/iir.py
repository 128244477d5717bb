"""Equal-loudness IIR filter as a blocked linear recurrence on device.

The reference filters one sample at a time in float64
(/root/reference/src/replaygain.rs:586-616). On TPU the recurrence is
restructured exactly (no approximation) into MXU-friendly pieces:

  1. 11-tap FIR (Yule numerator) + the 1e-10 denormal constant,
  2. five pure-AR(2) sections (the factored Yule denominator),
  3. 3-tap FIR (Butterworth numerator) + 1e-10,
  4. one pure-AR(2) section (Butterworth denominator).

Each AR(2) section runs blockwise: the zero-state response inside a block
of L samples is a lower-triangular Toeplitz matmul (MXU), the 2-value
block carry composes with jax.lax.associative_scan, and the homogeneous
correction re-injects block-initial state — mathematically exact, fully
parallel over time and batch.

An exact per-sample lax.scan implementation (direct-form I, the
reference's formulation) is provided as a validation oracle.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp

from .coeffs import DENORMAL_PREVENTION, filter_plan

DEFAULT_BLOCK = 128


@lru_cache(maxsize=None)
def _ar2_kernels(a1: float, a2: float, block: int):
    """(T_h lower-triangular (L,L), g1 (L,), g2 (L,), M (2,2)) in float64."""
    L = block
    h = np.zeros(L + 2)
    h[0] = 1.0
    for t in range(1, L + 2):
        h[t] = -a1 * h[t - 1] - (a2 * h[t - 2] if t >= 2 else 0.0)
    g1 = np.zeros(L)
    g2 = np.zeros(L)
    p1, p2 = 1.0, 0.0  # y_{-1}, y_{-2} = 1, 0
    q1, q2 = 0.0, 1.0
    for t in range(L):
        g1[t] = -a1 * p1 - a2 * p2
        g2[t] = -a1 * q1 - a2 * q2
        p1, p2 = g1[t], p1
        q1, q2 = g2[t], q1
    th = np.zeros((L, L))
    for t in range(L):
        th[t, : t + 1] = h[t::-1][: t + 1]
    m = np.array([[g1[L - 1], g2[L - 1]], [g1[L - 2], g2[L - 2]]])
    return th, g1, g2, m


@lru_cache(maxsize=None)
def _prefix_kernels(a1: float, a2: float, block: int, n_blocks: int, l2: int):
    """Constants for the two-level affine-prefix solve of
    s_n = M s_{n-1} + v_n over n_blocks first-level carries.

    Returns (T2 (l2*2, l2*2) local prefix operator, T3 (nb2*2, nb2*2)
    strict-lower cross-superblock operator, P (l2, 2, 2) powers M^(t+1)),
    where nb2 = ceil(n_blocks / l2)."""
    _, _, _, m = _ar2_kernels(a1, a2, block)
    nb2 = -(-n_blocks // l2)

    powers = [np.eye(2)]
    for _ in range(max(l2, nb2) + 1):
        powers.append(m @ powers[-1])

    t2 = np.zeros((l2, l2, 2, 2))
    for t in range(l2):
        for s in range(t + 1):
            t2[t, s] = powers[t - s]
    ml2 = powers[l2]
    ml2_pow = [np.eye(2)]
    for _ in range(nb2):
        ml2_pow.append(ml2 @ ml2_pow[-1])
    t3 = np.zeros((nb2, nb2, 2, 2))
    for t in range(nb2):
        for s in range(t):
            t3[t, s] = ml2_pow[t - 1 - s]
    p = np.stack(powers[1 : l2 + 1])
    # einsum-free layout: out[(t,i)] = sum_{(s,j)} T[(t,i),(s,j)] v[(s,j)]
    t2m = t2.transpose(0, 2, 1, 3).reshape(l2 * 2, l2 * 2)
    t3m = t3.transpose(0, 2, 1, 3).reshape(nb2 * 2, nb2 * 2)
    return t2m, t3m, p


def _affine_prefix(v, a1: float, a2: float, block: int, l2: int = 128):
    """s_n = M s_{n-1} + v_n (s_{-1} = 0) for v (B, N, 2), fully parallel:
    two levels of lower-triangular Toeplitz matmuls instead of an
    associative scan (whose tree lowering serializes into ~2*log2(N)
    tiny kernels on TPU)."""
    b, n, _ = v.shape
    nb2 = -(-n // l2)
    t2m, t3m, p = _prefix_kernels(a1, a2, block, n, l2)
    dtype = v.dtype
    t2m = jnp.asarray(t2m, dtype)
    t3m = jnp.asarray(t3m, dtype)
    p = jnp.asarray(p, dtype)

    vp = jnp.pad(v, ((0, 0), (0, nb2 * l2 - n), (0, 0)))
    vb = vp.reshape(b, nb2, l2 * 2)
    local = jnp.einsum(
        "ts,bns->bnt", t2m, vb, preferred_element_type=dtype
    ).reshape(b, nb2, l2, 2)
    carries = local[:, :, -1, :]  # (B, nb2, 2)
    s_prev = jnp.einsum(
        "ts,bs->bt", t3m, carries.reshape(b, nb2 * 2),
        preferred_element_type=dtype,
    ).reshape(b, nb2, 2)
    cross = jnp.einsum("bmj,tij->bmti", s_prev, p, preferred_element_type=dtype)
    s = (local + cross).reshape(b, nb2 * l2, 2)
    return s[:, :n]


@lru_cache(maxsize=None)
def _biquad_kernels(b0: float, b1: float, b2: float, a1: float, a2: float,
                    block: int):
    """Composite blocked-biquad operator Tc (L, L+2) = T_h @ Band.

    Band maps the extended input block [x[-2], x[-1], x[0..L-1]] to the
    FIR output f[t] = b0 x[t] + b1 x[t-1] + b2 x[t-2]; T_h is the AR(2)
    zero-state Toeplitz. Folding the FIR here avoids per-sample lane-shift
    slices, which dominate TPU time by ~40x."""
    L = block
    th, g1, g2, m = _ar2_kernels(a1, a2, block)
    band = np.zeros((L, L + 2))
    for t in range(L):
        band[t, t + 2] = b0
        band[t, t + 1] = b1
        band[t, t] = b2
    return th @ band, g1, g2, m


def _biquad_apply(x, section, block: int):
    """Apply a full biquad (FIR + AR2) along the last axis of (B, T),
    blockwise and exactly: one (L, L+2) matmul per block plus the
    two-level affine carry prefix. No per-sample shifts anywhere."""
    b0, b1, b2, a1, a2 = (float(c) for c in section)
    b, t = x.shape
    L = block
    nblk = -(-t // L)
    xp = jnp.pad(x, ((0, 0), (0, nblk * L - t)))
    xb = xp.reshape(b, nblk, L)

    tc, g1, g2, m = _biquad_kernels(b0, b1, b2, a1, a2, L)
    dtype = x.dtype
    tc = jnp.asarray(tc, dtype)
    g1 = jnp.asarray(g1, dtype)
    g2 = jnp.asarray(g2, dtype)

    # Extended input block: previous block's last 2 samples + this block.
    prev2 = jnp.pad(xb[:, :-1, L - 2 :], ((0, 0), (1, 0), (0, 0)))
    xin = jnp.concatenate([prev2, xb], axis=-1)  # (B, NB, L+2)

    y_zs = jnp.einsum("ts,bns->bnt", tc, xin, preferred_element_type=dtype)

    v = jnp.stack([y_zs[:, :, L - 1], y_zs[:, :, L - 2]], axis=-1)
    s = _affine_prefix(v, a1, a2, L)
    s_prev = jnp.concatenate([jnp.zeros_like(s[:, :1]), s[:, :-1]], axis=1)

    y = y_zs + s_prev[..., 0:1] * g1 + s_prev[..., 1:2] * g2
    return y.reshape(b, nblk * L)[:, :t]


def _ar2_apply(f, a1: float, a2: float, block: int):
    """Apply y_t = f_t - a1 y_{t-1} - a2 y_{t-2} along the last axis of
    (B, T) exactly, blockwise."""
    b, t = f.shape
    L = block
    nblk = -(-t // L)
    pad = nblk * L - t
    fp = jnp.pad(f, ((0, 0), (0, pad)))
    fb = fp.reshape(b, nblk, L)

    th, g1, g2, m = _ar2_kernels(a1, a2, L)
    dtype = f.dtype
    th = jnp.asarray(th, dtype)
    g1 = jnp.asarray(g1, dtype)
    g2 = jnp.asarray(g2, dtype)
    m = jnp.asarray(m, dtype)

    # Zero-state response per block: lower-triangular Toeplitz matmul.
    y_zs = jnp.einsum("ts,bns->bnt", th, fb, preferred_element_type=dtype)

    # Block carry: s_n = M s_{n-1} + v_n, solved with a fully parallel
    # two-level Toeplitz prefix (no scan).
    v = jnp.stack([y_zs[:, :, L - 1], y_zs[:, :, L - 2]], axis=-1)  # (B,N,2)
    s = _affine_prefix(v, a1, a2, L)
    # State entering block n is s_{n-1}; block 0 starts from rest.
    s_prev = jnp.concatenate([jnp.zeros_like(s[:, :1]), s[:, :-1]], axis=1)

    y = y_zs + s_prev[..., 0:1] * g1 + s_prev[..., 1:2] * g2
    return y.reshape(b, nblk * L)[:, :t]


def _fir(x, taps):
    """Causal FIR along the last axis of (B, T): shifted-slice adds (which
    XLA fuses into one elementwise pass; a rank-1-feature conv gets a
    degenerate T(1,128) layout on TPU)."""
    n = len(taps)
    xp = jnp.pad(x, ((0, 0), (n - 1, 0)))
    t = x.shape[1]
    out = taps[0] * x
    for i in range(1, n):
        out = out + taps[i] * jax.lax.slice_in_dim(xp, n - 1 - i, n - 1 - i + t, axis=1)
    return out


@partial(jax.jit, static_argnames=("sample_rate", "block"))
def _equal_loudness_jit(x, sample_rate: int, block: int):
    plan = filter_plan(sample_rate)
    dtype = x.dtype
    y = x
    # The blocked recurrences cancel heavily; TPU's default bf16 matmul
    # precision costs ~0.05 dB of loudness accuracy. HIGH (bf16x3,
    # ~f32-quality) keeps loudness bins bit-equal to the CPU path on all
    # test content; worst-case drift is one 0.01 dB histogram bin, 5x
    # inside the +-0.05 dB budget, and is ~25% faster than HIGHEST.
    with jax.default_matmul_precision("high"):
        y = _equal_loudness_body(y, plan, dtype, block)
    return y


def _equal_loudness_body(y, plan, dtype, block):
    for i, section in enumerate(plan.sos):
        if i == len(plan.sos) - 1:
            # Denormal-prevention constant of the reference (injected at
            # the yule output, src/replaygain.rs:595): preserves the
            # silence-drop histogram behavior.
            y = y + dtype.type(DENORMAL_PREVENTION)
        y = _biquad_apply(y, tuple(section), block)
    return y + dtype.type(DENORMAL_PREVENTION)


def equal_loudness(x, sample_rate: int, block: int = DEFAULT_BLOCK):
    """Equal-loudness filter along the last axis of (B, T).

    Input must already be scaled to the 16-bit sample range (×32768) as the
    ReplayGain algorithm expects (reference src/replaygain.rs:943-949).
    """
    return _equal_loudness_jit(x, sample_rate, block)


# ---------------------------------------------------------------------------
# Exact per-sample oracle (direct-form I, float64) for validation.
# ---------------------------------------------------------------------------


def equal_loudness_scan(x, sample_rate: int):
    """Reference-exact direct-form-I implementation via lax.scan (float64)."""
    from .coeffs import YULE_A

    plan = filter_plan(sample_rate)
    yb = jnp.asarray(plan.yule_b, jnp.float64)
    ya = jnp.asarray(np.array(YULE_A[sample_rate]), jnp.float64)
    bb = jnp.asarray(plan.butter_b, jnp.float64)
    ba1, ba2 = plan.butter_section

    def step(state, xt):
        # x history (11,), yule-out history (10,), butter-in (2,), butter-out (2,)
        xh, yh, bxh, byh = state
        xh = jnp.concatenate([xt[None], xh[:-1]])
        yt = DENORMAL_PREVENTION + jnp.dot(yb, xh) - jnp.dot(ya[1:], yh)
        zt = (
            DENORMAL_PREVENTION
            + bb[0] * yt
            + bb[1] * bxh[0]
            + bb[2] * bxh[1]
            - ba1 * byh[0]
            - ba2 * byh[1]
        )
        yh = jnp.concatenate([yt[None], yh[:-1]])
        return (xh, yh, jnp.stack([yt, bxh[0]]), jnp.stack([zt, byh[0]])), zt

    def run(sig):
        init = (
            jnp.zeros(11, jnp.float64),
            jnp.zeros(10, jnp.float64),
            jnp.zeros(2, jnp.float64),
            jnp.zeros(2, jnp.float64),
        )
        _, out = jax.lax.scan(step, init, sig)
        return out

    return jax.vmap(run)(x.astype(jnp.float64))
