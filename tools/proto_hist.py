"""Probe: what dominates the windows/histogram stage on the real chip.

Variants over a synthetic filtered tensor (B, C, T):
  winsum  : squares + masked 50 ms window sums + bin indices (no scatter)
  scatter : winsum + the (B, 12000) scatter-add histogram (shipped path)
  sortsel : winsum + per-track k-th-largest readout via jnp.sort (no
            histogram at all -- candidate replacement for track loudness)
  onehot  : winsum + histogram via one-hot int8 matmul instead of scatter

Chained-dependency timing (see NOTES.md on the axon memoizer).
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from mp3rgain_tpu.ops import histogram as hi  # noqa: E402


def main():
    B, C, sec, sr = 64, 2, 60, 44100
    T = sec * sr
    win = hi.window_size(sr)
    rng = np.random.default_rng(3)
    x = (rng.standard_normal((B, C, T)).astype(np.float32) * 3000.0)
    xd = jax.device_put(x)
    valid = jax.device_put(np.full((B,), T, np.int32))
    xd.block_until_ready()
    audio_sec = B * sec

    def winsum_core(f, valid_len):
        b, c, t = f.shape
        n_win = -(-t // win)
        pad = n_win * win - t
        f = jnp.pad(f, ((0, 0), (0, 0), (0, pad)))
        sq = (f * f).reshape(b, c, n_win, win)
        idx = jnp.arange(n_win * win).reshape(n_win, win)
        mask = (idx[None] < valid_len[:, None, None]).astype(f.dtype)
        ch_sum = sq.sum(axis=1)
        sums = (ch_sum * mask).sum(axis=-1)
        totsamp = mask.sum(axis=-1)
        ms = sums / jnp.maximum(totsamp, 1.0) * 0.5
        val = 100.0 * 10.0 * jnp.log10(ms + 1e-37)
        bin_idx = val.astype(jnp.int32) + 2000
        ok = (totsamp > 0) & (bin_idx >= 0) & (bin_idx < 12000)
        return bin_idx, ok

    def winsum(bump, f, valid_len):
        f = f + bump.astype(f.dtype)
        bin_idx, ok = winsum_core(f, valid_len)
        return jnp.sum(bin_idx * ok)

    def scatter(bump, f, valid_len):
        f = f + bump.astype(f.dtype)
        bin_idx, ok = winsum_core(f, valid_len)
        b = bin_idx.shape[0]
        bc = jnp.clip(bin_idx, 0, 11999)
        hist = jnp.zeros((b, 12000), jnp.int32)
        hist = hist.at[jnp.arange(b)[:, None], bc].add(ok.astype(jnp.int32))
        return jnp.sum(hist * jnp.arange(12000, dtype=jnp.int32)[None, :])

    def sortsel(bump, f, valid_len):
        f = f + bump.astype(f.dtype)
        bin_idx, ok = winsum_core(f, valid_len)
        v = jnp.where(ok, bin_idx, -1)
        sv = jnp.sort(v, axis=1)[:, ::-1]  # descending; -1 sinks
        total = ok.sum(axis=1)
        k = total // 20 + 1
        sel = jnp.take_along_axis(sv, (k - 1)[:, None], axis=1)[:, 0]
        return jnp.sum(jnp.where(total > 0, sel, -1))

    def onehot(bump, f, valid_len):
        f = f + bump.astype(f.dtype)
        bin_idx, ok = winsum_core(f, valid_len)
        bc = jnp.where(ok, bin_idx, 12000)
        # Chunk over the window axis: a single (B, n_win, 12000) bool
        # comparison intermediate is ~0.9 GB at B=64/60 s and can OOM
        # the device (and skew the probe).
        bins = jnp.arange(12000, dtype=jnp.int32)
        chunk = 512
        n = bc.shape[1]
        hist = jnp.zeros((bc.shape[0], 12000), jnp.int32)
        for s in range(0, n, chunk):
            part = bc[:, s : s + chunk]
            hist = hist + (
                (part[:, :, None] == bins[None, None, :])
                .astype(jnp.int8).sum(axis=1, dtype=jnp.int32)
            )
        return jnp.sum(hist * bins[None, :])

    for name, fn in [("winsum", winsum), ("scatter", scatter),
                     ("sortsel", sortsel), ("onehot", onehot)]:
        jf = jax.jit(fn)
        out = jf(jnp.int32(1), xd, valid)
        prev = int(out)
        walls = []
        for i in range(4):
            t0 = time.monotonic()
            out = jf(jnp.int32(2 + i + prev * 0), xd, valid)
            prev = int(out)
            walls.append(time.monotonic() - t0)
        wall = min(walls)
        print(f"{name:8s}: {wall*1e3:8.2f} ms  {audio_sec/wall:8.0f}x")


if __name__ == "__main__":
    main()
