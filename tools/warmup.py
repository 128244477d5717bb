"""AOT-precompile the analysis pipelines for a library's shape ladder.

Cold scans are compile-bound: each (batch, granule, entropy-grid) shape
key costs one XLA/Mosaic compile (30 s – minutes on remote-compile
runtimes). This tool walks the same ladders the scan uses and compiles
every executable a library of the given profile will hit, so the first
real scan runs at steady-state speed.

The compiled executables land in jax's persistent compilation cache
(utils/jaxcache.py) when the runtime produces stable cache keys (standard
libtpu does; the tunneled axon dev runtime does not — measured round 2,
NOTES.md — there this tool only warms the calling process). Run it as a
warm-start step in long-lived workers, or rely on in-process reuse.

Usage:
  python tools/warmup.py                      # common 44.1 kHz stereo ladder
  python tools/warmup.py --sr 44100 48000 --nch 2 --max-minutes 8
  python tools/warmup.py --like /music        # infer formats from a library
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ladder_values(max_value, unit, base=512, ratio=1.3):
    from mp3rgain_tpu.parallel.runner import _quantize_up

    out = []
    v = base
    while v <= max_value:
        q = _quantize_up(v, unit, base=base, ratio=ratio)
        if q not in out:
            out.append(q)
        v = int(v * ratio)
    q = _quantize_up(max_value, unit, base=base, ratio=ratio)
    if q not in out:
        out.append(q)
    return out


def warm_mp3(sr: int, nch: int, max_minutes: float, batch: int) -> int:
    """Compile the light-path executables for (sr, nch) up to a duration."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from mp3rgain_tpu.decode import entropy_kernel as ek
    from mp3rgain_tpu.parallel import runner as rn

    interpret = jax.default_backend() != "tpu"
    # gch/sec = frames/sec * granules/frame * nch = sr*nch/576 for both
    # MPEG1 (1152-sample frames, 2 granules) and MPEG2 (576, 1).
    gch_per_sec = sr * nch / 576.0
    g_max_cap = int(max_minutes * 60 * gch_per_sec)
    unit = 2 * nch
    n = 0
    for g_max in _ladder_values(g_max_cap, unit):
        # Entropy-stage key: nb (grid blocks) + ragged buffer length.
        rows = batch * g_max
        nb = max(1, -(-rows // ek.LANES))
        nb = ek._cap(nb, ek.NB_CAPS) if nb <= ek.NB_CAPS[-1] else nb
        nb = -(-nb // ek.ILV) * ek.ILV
        # Typical stream density spans ~2-7 word-groups per lane
        # subgroup; compile the g_pad ladder points that band implies
        # (g_pad counts (8, SUBG) subgroup-groups).
        g_pads = sorted({
            ek._quantize_g(nb * ek.SUBG_N * w + ek.W8_MAX)
            for w in (2, 3, 5, 7)
        })
        for g_pad in g_pads:
            t0 = time.monotonic()
            scalars = np.zeros((nb, 3 + ek.SUBG_N), np.int32)
            buf = np.zeros((g_pad, 8, ek.SUBG), np.int32)
            meta = np.zeros((nb, ek.META_ROWS, ek.LANES), np.uint16)
            spec_b, mout = ek.decode_blocks(
                jnp.asarray(scalars), jnp.asarray(buf), jnp.asarray(meta),
                nb=nb, interpret=interpret,
            )
            jax.block_until_ready((spec_b, mout))
            n += 1
            print(f"  entropy nb={nb} g_pad={g_pad}: "
                  f"{time.monotonic() - t0:.1f}s", flush=True)

        # Tail key: (nch, sr, nb, B, g_max).
        t0 = time.monotonic()
        scalars = np.zeros((nb, 3 + ek.SUBG_N), np.int32)
        buf = np.zeros(
            (ek._quantize_g(nb * ek.SUBG_N * 3 + ek.W8_MAX), 8, ek.SUBG),
            np.int32,
        )
        meta = np.zeros((nb, ek.META_ROWS, ek.LANES), np.uint16)
        spec_b, mout = ek.decode_blocks(
            jnp.asarray(scalars), jnp.asarray(buf), jnp.asarray(meta),
            nb=nb, interpret=interpret,
        )
        inv = np.arange(nb * ek.LANES, dtype=np.int32)
        counts = np.zeros(batch, np.int32)
        from mp3rgain_tpu.decode import frontend as fe

        # Match the transfer forms prepare_batch_arrays_light ships:
        # flat back-to-back 12-byte scf nibbles + sidebands, flat packed
        # 2×uint16 info, counts-derived rowmap (g_max static).
        npad = nb * ek.LANES
        scf = np.zeros((npad, fe.SCF_MAIN_BYTES), np.uint8)
        srow = np.full(256, npad, np.int32)
        sdata = np.zeros((256, fe.SCF_SIDE_BYTES), np.uint8)
        hrow = np.full(64, npad, np.int32)
        hdata = np.zeros((64, fe.SCF_HI_BYTES), np.uint8)
        info = np.zeros((npad, fe.IP_N), np.uint16)
        valid = np.zeros(batch, np.int32)
        tail = rn._light_tail_pipeline(
            nch, sr, nb, g_max, jnp.float32, rn.use_fused_hybrid(),
            interpret
        )
        out = tail(spec_b, mout, jnp.asarray(inv), jnp.asarray(counts),
                   jnp.asarray(scf), jnp.asarray(srow), jnp.asarray(sdata),
                   jnp.asarray(hrow), jnp.asarray(hdata),
                   jnp.asarray(info), jnp.asarray(valid))
        jax.block_until_ready(out)
        n += 1
        print(f"  tail B={batch} g_max={g_max} nb={nb}: "
              f"{time.monotonic() - t0:.1f}s", flush=True)
    return n


def infer_formats(root):
    """(sr, nch, max_minutes) set from a library's light walks (fast)."""
    from mp3rgain_tpu.decode import frontend as fe

    fmts = {}
    for dirpath, _, names in os.walk(root):
        for name in names:
            if not name.lower().endswith(".mp3"):
                continue
            try:
                u = fe.unpack_file_light(os.path.join(dirpath, name))
            except Exception:
                continue
            if u.n == 0:
                continue
            key = (u.sample_rate, u.n_channels)
            minutes = (u.n // u.n_channels) * 576 / u.sample_rate / 60
            fmts[key] = max(fmts.get(key, 0.0), minutes)
    return [(sr, nch, m) for (sr, nch), m in sorted(fmts.items())]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sr", type=int, nargs="*", default=[44100])
    ap.add_argument("--nch", type=int, nargs="*", default=[2])
    ap.add_argument("--max-minutes", type=float, default=8.0)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--like", help="infer formats from a library directory")
    args = ap.parse_args()

    if args.like:
        plan = infer_formats(args.like)
    else:
        plan = [(sr, nch, args.max_minutes)
                for sr in args.sr for nch in args.nch]

    t0 = time.monotonic()
    total = 0
    for sr, nch, minutes in plan:
        print(f"warming sr={sr} nch={nch} up to {minutes:.1f} min tracks",
              flush=True)
        total += warm_mp3(sr, nch, minutes, args.batch)
    print(f"compiled {total} executables in {time.monotonic() - t0:.0f}s",
          flush=True)


if __name__ == "__main__":
    main()
