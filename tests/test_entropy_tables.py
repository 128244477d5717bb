"""Exhaustive proof of the multi-level Huffman LUTs.

Every codeword of every ISO big-values table must decode to its exact
(x, y, length) through the 8+5+6-bit LUT cascade, for both all-zero and
all-one don't-care padding (so trailing-window bits can't leak in).
The count1 quad tables get the same treatment through LUT_CT.
"""

from mp3rgain_tpu.decode import entropy_tables as et

L1 = et.L1_BITS            # 8
L12 = et.L1_BITS + et.L2_BITS   # 13
LMAX = L12 + et.L3_BITS    # 19 — the longest code (table 13)


def _fields(lut, gid, w):
    return int(lut[w, 2 * gid]), int(lut[w, 2 * gid + 1])


def test_multilevel_luts_cover_all_codewords():
    tables, _, _, _ = et._parse_tables()
    lut_a, lut_b, lut_c, _, n_l2, n_l3 = et.build_luts()

    checked = 0
    for tid in et.TABLE_IDS:
        g = et.GROUP_OF_TABLE[tid]
        for x, y, c, l in tables[tid]:
            pads = {0, (1 << (LMAX - l)) - 1 if l < LMAX else 0}
            for pad in pads:
                bits = (c << (LMAX - l)) | pad
                w1 = bits >> (LMAX - L1)
                ab1, af = _fields(lut_a, g, w1)
                adv, flag = af & 15, af >> 4
                if l <= L1:
                    assert (flag, adv, ab1) == (et.FLAG_OK, l, x + 16 * y), (
                        tid, x, y, l
                    )
                    checked += 1
                    continue
                assert flag == et.FLAG_CONT and adv == L1, (tid, x, y, l)
                assert 0 <= ab1 < n_l2
                w2 = (bits >> (LMAX - L12)) & ((1 << et.L2_BITS) - 1)
                ab2, f2 = _fields(lut_b, ab1, w2)
                if l <= L12:
                    assert f2 == l - L1 and ab2 == x + 16 * y, (tid, x, y, l)
                    checked += 1
                    continue
                assert f2 == et.F2_L3, (tid, x, y, l)
                assert 0 <= ab2 < n_l3
                w3 = bits & ((1 << et.L3_BITS) - 1)
                ab3, rem3 = _fields(lut_c, ab2, w3)
                assert rem3 == l - L12 and ab3 == x + 16 * y, (tid, x, y, l)
                checked += 1
    # Every code of every table, both pads where they differ (~2.7k).
    assert checked > 2000


def test_count1_lut_covers_all_quads():
    _, _, qa_code, qa_len = et._parse_tables()
    _, _, _, lut_ct, _, _ = et.build_luts()

    # Table A: all 16 quad codes, both paddings.
    for v in range(16):
        l = qa_len[v]
        pads = {0, (1 << (et.CT_BITS - l)) - 1 if l < et.CT_BITS else 0}
        for pad in pads:
            w = (qa_code[v] << (et.CT_BITS - l)) | pad
            val, af = _fields(lut_ct, 0, w)
            assert (af >> 4, af & 15, val) == (et.FLAG_OK, l, v), (v, l)
    # Table B: v = 15 - first 4 bits, fixed 4-bit length.
    for w in range(1 << et.CT_BITS):
        val, af = _fields(lut_ct, 1, w)
        assert (af >> 4, af & 15) == (et.FLAG_OK, 4)
        assert val == 15 - (w >> (et.CT_BITS - 4))


def test_invalid_windows_flag_invalid():
    """Windows reachable by no codeword must read invalid at each level."""
    tables, _, _, _ = et._parse_tables()
    lut_a, lut_b, lut_c, _, n_l2, n_l3 = et.build_luts()
    # Build the set of (gid2, w2) covered by real codewords; the rest must
    # be f2 == 0 (invalid).
    covered = set()
    for tid in et.TABLE_IDS:
        for x, y, c, l in tables[tid]:
            if l <= L1:
                continue
            w1 = (c >> (l - L1)) & ((1 << L1) - 1)
            gid2 = int(lut_a[w1, 2 * et.GROUP_OF_TABLE[tid]])
            if l <= L12:
                rem = l - L1
                tail = c & ((1 << rem) - 1)
                lo = tail << (et.L2_BITS - rem)
                for w2 in range(lo, lo + (1 << (et.L2_BITS - rem))):
                    covered.add((gid2, w2))
            else:
                covered.add((gid2, (c >> (l - L12)) & ((1 << et.L2_BITS) - 1)))
    for gid2 in range(n_l2):
        for w2 in range(1 << et.L2_BITS):
            if (gid2, w2) not in covered:
                assert lut_b[w2, 2 * gid2 + 1] == 0, (gid2, w2)
