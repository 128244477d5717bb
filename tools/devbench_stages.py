"""Stage-level timing of the raw-bits analysis pipeline on the real chip.

Times jitted PREFIXES of _analysis_core_light on the same prepared
64x60s batch bench.py uses, with chained-dependency measurement (the
runtime memoizes (executable, inputs) and block_until_ready can return
early — see NOTES.md):

  entropy   : Pallas Huffman decode only
  gather    : + unsort + rowmap gather into (B, G, 576)
  synthesis : + decode back-end to PCM
  iir       : + equal-loudness filter
  full      : + windows/histogram/percentile (the shipped pipeline)

Each prefix is its own compile (~30-60 s each on this runtime).

Usage: python tools/devbench_stages.py [--tracks 64] [--seconds 60]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tracks", type=int, default=64)
    ap.add_argument("--seconds", type=int, default=60)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mp3rgain_tpu.decode import entropy_kernel as ek
    from mp3rgain_tpu.decode import frontend as fe
    from mp3rgain_tpu.parallel import runner as rn
    from mp3rgain_tpu.ops import iir as iir_ops
    from mp3rgain_tpu.ops import histogram as hi
    from mp3rgain_tpu.testing import fixtures

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          file=sys.stderr)

    sr = 44100
    rng = np.random.default_rng(7)
    t = np.arange(sr * args.seconds) / sr
    wave = 0.35 * np.sin(2 * np.pi * 440.0 * t)
    wave += 0.15 * np.sin(2 * np.pi * 1870.0 * t)
    wave += 0.08 * rng.standard_normal(len(t))
    pcm = np.clip(wave * 32767, -32768, 32767).astype(np.int16)
    stereo = np.stack([pcm, np.roll(pcm, 11)], axis=1)
    data = fixtures.encode_mp3(stereo, sr, bitrate=192,
                               mode=fixtures.MODE_JOINT)
    u = fe.unpack_data_light(data)
    nch = u.n_channels
    audio_sec = (u.n // nch) * 576 / u.sample_rate * args.tracks

    prep, rest, g_max = rn.prepare_batch_arrays_light(
        [u] * args.tracks, nch, 1
    )
    argsd = jax.device_put(
        (prep.scalars, prep.buf, prep.meta, prep.inv) + rest
    )
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), argsd)

    w8_cap, nb = prep.w8_cap, prep.nb

    def entropy(bump, scalars, buf, metab, inv, counts, scf, srow,
                sdata, hrow, hdata, info, valid):
        metab = metab.at[0, 4, 0].set(
            metab[0, 4, 0] ^ ((bump & 1) << 15).astype(metab.dtype)
        )
        spec, be, ce, _ = ek.decode_device(scalars, buf, metab, inv,
                                           w8_cap=w8_cap, nb=nb)
        s = jnp.sum(spec, dtype=jnp.int32)
        return None, None, jnp.stack([s, s, s])[None, :]

    def prefix_core(stop):
        def fn(bump, scalars, buf, metab, inv, counts, scf, srow,
               sdata, hrow, hdata, info, valid):
            metab = metab.at[0, 4, 0].set(
            metab[0, 4, 0] ^ ((bump & 1) << 15).astype(metab.dtype)
        )
            spec, big_end, c1end, _ = ek.decode_device(
                scalars, buf, metab, inv, w8_cap=w8_cap, nb=nb)
            zrow = jnp.zeros((1, 576), spec.dtype)
            spec = jnp.concatenate([spec, zrow], axis=0)
            zs = jnp.zeros((1,), big_end.dtype)
            big_end = jnp.concatenate([big_end, zs])
            c1end = jnp.concatenate([c1end, zs])
            rowmap = rn._rowmap_from_counts(
                counts, g_max, nb * ek.LANES)
            scf = rn._expand_scf_flat(scf, srow, sdata, hrow, hdata)[rowmap]
            info = jnp.concatenate(
                [info.astype(jnp.int32),
                 jnp.zeros((1, fe.IP_N), jnp.int32)]
            )[rowmap]
            spectrum = spec[rowmap]
            info = rn._expand_info_light(info)
            info = info.at[..., fe.BIG_END].set(big_end[rowmap])
            info = info.at[..., fe.COUNT1_END].set(c1end[rowmap])
            if stop == "gather":
                s = jnp.sum(spectrum, dtype=jnp.int32)
                return None, None, jnp.stack([s, s, s])[None, :]
            fields = rn._derive_fields(spectrum, scf, info,
                                       n_channels=nch)
            from mp3rgain_tpu.decode.format_tables import SR_ROW
            from mp3rgain_tpu.decode import synthesis

            if stop == "requant":
                def one_rq(a):
                    b = synthesis.GranuleBatch(*a, n_channels=nch)
                    rt = synthesis.row_tables(SR_ROW[sr])
                    masks = synthesis._class_masks(b.kind)
                    with jax.default_matmul_precision("high"):
                        xr = synthesis._requantize(b, rt, masks, jnp.float32)
                        xr = synthesis._stereo(b, xr, rt, masks, jnp.float32)
                    return xr

                xr = jax.vmap(one_rq)(fields)
                s = jnp.sum(xr)
                return None, None, jnp.stack([s, s, s])[None, :]

            def one(a):
                return synthesis._decode_jit(
                    *a, n_channels=nch, sr_row=SR_ROW[sr],
                    dtype=jnp.float32)

            pcm = jax.vmap(one)(fields)
            if stop == "synthesis":
                s = jnp.sum(pcm)
                return None, None, jnp.stack([s, s, s])[None, :]
            bsz, c, n = pcm.shape
            x = pcm.reshape(bsz * c, n) * np.float32(32768.0)
            filt = iir_ops.equal_loudness(x, sr)
            s = jnp.sum(filt)
            return None, None, jnp.stack([s, s, s])[None, :]
        return fn

    from functools import partial

    full = partial(rn._analysis_core_light, nb=nb, g_max=g_max,
                   n_channels=nch, sample_rate=sr, dtype=jnp.float32)

    def full_fn(bump, scalars, buf, metab, inv, counts, scf, srow,
                sdata, hrow, hdata, info, valid):
        # info is packed (fe.pack_info_light): xor global-gain low bits.
        info = info.at[..., 0].set(info[..., 0] ^ (bump % 3).astype(info.dtype))
        return full(scalars, buf, metab, inv, counts, scf, srow, sdata,
                    hrow, hdata, info, valid)

    def fused_fn(bump, scalars, buf, metab, inv, counts, scf, srow,
                 sdata, hrow, hdata, info, valid):
        info = info.at[..., 0].set(info[..., 0] ^ (bump % 3).astype(info.dtype))
        spec_b, mout = ek.decode_blocks(scalars, buf, metab, nb=nb)
        return rn._light_tail(
            spec_b, mout, inv, counts, scf, srow, sdata, hrow, hdata,
            info, valid,
            nb=nb, g_max=g_max, n_channels=nch, sample_rate=sr,
            dtype=jnp.float32, fused=True,
        )

    stages = [
        ("entropy", entropy),
        ("gather", prefix_core("gather")),
        ("requant", prefix_core("requant")),
        ("synthesis", prefix_core("synthesis")),
        ("iir", prefix_core("iir")),
        ("full", full_fn),
        ("fullfused", fused_fn),
    ]
    import random

    prev = 0.0
    for name, fn in stages:
        jf = jax.jit(fn)
        salt = random.randrange(1, 1 << 20)

        def read(o):
            return float(jnp.ravel(o[2])[0])

        out = jf(jnp.int32(salt), *argsd)
        read(out)

        walls = []
        for i in range(args.iters):
            t0 = time.monotonic()
            out = jf(jnp.int32(salt + 1 + i) +
                     (jnp.asarray(read(out)) * 0).astype(jnp.int32), *argsd)
            read(out)
            walls.append(time.monotonic() - t0)
        wall = min(walls)
        print(f"{name:10s}: {wall*1e3:8.1f} ms  (+{(wall-prev)*1e3:7.1f} ms)"
              f"  {audio_sec/wall:7.0f}x")
        prev = wall


if __name__ == "__main__":
    main()
