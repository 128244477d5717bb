"""Measure, on real encoded content, how often a lockstep entropy-kernel
step has (a) any lane on a continuation (>L1-bit) code and (b) any lane
doing an escape-linbits read.

Decides whether conditionally skipping the LUT_B/LUT_C matmuls (the bulk
of per-step MXU issues) would pay: a step where *no* lane of the 1024
continues could skip them, but with 1024 lanes in lockstep one long code
anywhere disables the skip for everyone.

Usage: python tools/meas_cont.py [seconds] [bitrate]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from mp3rgain_tpu.decode import entropy_kernel as ek
from mp3rgain_tpu.decode import entropy_tables as et
from mp3rgain_tpu.decode import frontend as fe


def build_codebooks():
    tables, select, qa_code, qa_len = et._parse_tables()
    books = {0: {}}
    for tid in et.TABLE_IDS:
        books[et.GROUP_OF_TABLE[tid]] = {
            (c, l): (x, y) for x, y, c, l in tables[tid]
        }
    return books


def walk_gch(md_row, meta_row, books):
    """Python big-values walk; returns per-step (codelen, esc) lists."""
    p0 = int(meta_row[fe.LM_P0])
    pend = p0 + int(meta_row[fe.LM_P23])
    bvp = int(meta_row[fe.LM_BVP])
    r0p, r1p = int(meta_row[fe.LM_R0P]), int(meta_row[fe.LM_R1P])
    groups = [int(meta_row[fe.LM_G0 + i]) for i in range(3)]
    linbits = [int(meta_row[fe.LM_L0 + i]) for i in range(3)]
    bits = np.unpackbits(md_row)

    def rd(p, n):
        v = 0
        for i in range(n):
            v = (v << 1) | int(bits[p + i])
        return v, p + n

    out = []
    p = p0
    for n in range(bvp):
        if p >= pend:
            break
        r = 0 if n < r0p else (1 if n < r1p else 2)
        g, lb = groups[r], linbits[r]
        book = books[g]
        if not book:  # table 0: nothing consumed
            out.append((0, False))
            continue
        c, l = 0, 0
        while (c, l) not in book:
            b, _ = rd(p + l, 1)
            c = (c << 1) | b
            l += 1
            if l > 19:
                return out
        x, y = book[(c, l)]
        q = p + l
        esc = False
        for v in (x, y):
            if v == 15 and lb > 0:
                ev, q = rd(q, lb)
                v += ev
                esc = True
            if v != 0:
                q += 1  # sign
        out.append((l, esc))
        p = q
    return out


def main():
    seconds = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    bitrate = int(sys.argv[2]) if len(sys.argv) > 2 else 192
    from mp3rgain_tpu.testing import fixtures

    sr = 44100
    rng = np.random.default_rng(7)
    t = np.arange(sr * seconds) / sr
    wave = 0.35 * np.sin(2 * np.pi * 440.0 * t)
    wave += 0.15 * np.sin(2 * np.pi * 1870.0 * t)
    wave += 0.08 * rng.standard_normal(len(t))
    pcm = np.clip(wave * 32767, -32768, 32767).astype(np.int16)
    stereo = np.stack([pcm, np.roll(pcm, 11)], axis=1)
    data = fixtures.encode_mp3(stereo, sr, bitrate=bitrate,
                               mode=fixtures.MODE_JOINT)

    u = fe.unpack_data_light(data)
    md, meta = u.md, u.meta
    n = md.shape[0]
    books = build_codebooks()

    # Per-gch big-values step profile.
    prof = [walk_gch(md[i], meta[i], books) for i in range(n)]

    # Reproduce prepare_batch's sorted lane->block layout.
    p = ek.prepare_batch([md], [meta])
    order = np.argsort(p.inv, kind="stable")  # inverse of inv = sort order
    sort_of = np.empty(p.npad, np.int32)
    sort_of[p.inv] = np.arange(p.npad)

    nb = p.nb
    tot_steps = 0
    cont_steps = 0
    esc_steps = 0
    dead = 0
    # Original row i sits at sorted slot sort_of[i].
    by_block = [[] for _ in range(nb)]
    for i in range(n):
        by_block[sort_of[i] // ek.LANES].append(i)
    for b in range(nb):
        rows = by_block[b]
        if not rows:
            continue
        nbig = int(p.scalars[b, 0])
        for k in range(nbig):
            lens = [prof[i][k] for i in rows if k < len(prof[i])]
            if not lens:
                dead += 1
                continue
            tot_steps += 1
            if any(l > et.L1_BITS for l, _ in lens):
                cont_steps += 1
            if any(e for _, e in lens):
                esc_steps += 1
    print(
        f"{seconds}s @ {bitrate}kbps: n_gch={n} nb={nb}\n"
        f"big-value block-steps: {tot_steps} "
        f"(+{dead} fully-dead tail steps)\n"
        f"  any-lane continuation: {cont_steps} "
        f"({100.0 * cont_steps / max(tot_steps, 1):.1f}%)\n"
        f"  any-lane escape:       {esc_steps} "
        f"({100.0 * esc_steps / max(tot_steps, 1):.1f}%)"
    )


if __name__ == "__main__":
    main()
