"""Exhaustive proof of the multi-level Huffman LUTs.

Every codeword of every ISO big-values table must decode to its exact
(x, y, length) through the 9+5+5-bit LUT cascade, for both all-zero and
all-one don't-care padding (so trailing-window bits can't leak in).
"""

from mp3rgain_tpu.decode import entropy_tables as et


def test_multilevel_luts_cover_all_codewords():
    tables, _, _, _ = et._parse_tables()
    lut_a, _, _, _, _ = et.build_luts()
    lut_b5, lut_c5, n_l2, n_l3 = et.build_luts_ml()
    na = lut_a.reshape(512, et.N_GROUPS_A, 4).astype(int)

    checked = 0
    for tid in et.TABLE_IDS:
        g = et.GROUP_OF_TABLE[tid]
        for x, y, c, l in tables[tid]:
            pads = {0, (1 << (19 - l)) - 1 if l < 19 else 0}
            for pad in pads:
                bits = (c << (19 - l)) | pad
                w1 = bits >> 10  # top 9 bits
                a, b, adv, flag = na[w1, g]
                if l <= 9:
                    assert (flag, adv, a, b) == (et.FLAG_OK, l, x, y), (
                        tid, x, y, l
                    )
                    checked += 1
                    continue
                assert flag == et.FLAG_CONT and adv == 9, (tid, x, y, l)
                gid2 = a + 128 * b
                assert 0 <= gid2 < n_l2
                w2 = (bits >> 5) & 31
                ab2, f2 = lut_b5[w2, 2 * gid2 : 2 * gid2 + 2]
                if l <= 14:
                    assert f2 == l - 9 and ab2 == x + 16 * y, (tid, x, y, l)
                    checked += 1
                    continue
                assert f2 == et.F2_L3, (tid, x, y, l)
                assert 0 <= ab2 < n_l3
                w3 = bits & 31
                ab3, rem3 = lut_c5[w3, 2 * ab2 : 2 * ab2 + 2]
                assert rem3 == l - 14 and ab3 == x + 16 * y, (tid, x, y, l)
                checked += 1
    # Every code of every table, both pads where they differ (~2.7k).
    assert checked > 2000


def test_invalid_windows_flag_invalid():
    """Windows reachable by no codeword must read invalid at each level."""
    tables, _, _, _ = et._parse_tables()
    lut_b5, lut_c5, n_l2, n_l3 = et.build_luts_ml()
    # Build the set of (gid2, w2) covered by real codewords; the rest must
    # be f2 == 0 (invalid).
    lut_a, _, _, _, _ = et.build_luts()
    na = lut_a.reshape(512, et.N_GROUPS_A, 4).astype(int)
    covered = set()
    for tid in et.TABLE_IDS:
        for x, y, c, l in tables[tid]:
            if l <= 9:
                continue
            w1 = (c >> (l - 9)) & 511
            a, b, _, _ = na[w1, et.GROUP_OF_TABLE[tid]]
            gid2 = a + 128 * b
            if l <= 14:
                rem = l - 9
                tail = c & ((1 << rem) - 1)
                for w2 in range(tail << (5 - rem), (tail + 1) << (5 - rem)):
                    covered.add((gid2, w2))
            else:
                covered.add((gid2, (c >> (l - 14)) & 31))
    for gid2 in range(n_l2):
        for w2 in range(32):
            if (gid2, w2) not in covered:
                assert lut_b5[w2, 2 * gid2 + 1] == 0, (gid2, w2)
