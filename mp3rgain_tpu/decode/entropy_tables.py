"""Device entropy-decode LUTs: MP3 Huffman tables packed for the MXU.

The Pallas entropy kernel (entropy_kernel.py) decodes one (x, y) pair per
lockstep step via one-hot(9-bit window) x LUT matmuls. Codes longer than
9 bits resolve through a second window over per-prefix continuation
groups (L2); the two 19-bit codes of table 13 share their first 18 bits
and resolve by one extra bit in the kernel (L3 fixup).

LUT layout (int8, MXU-friendly):
  LUT_A (512, N_GROUPS_A*4): primary groups x fields [a, b, adv, flag]
    groups: 0 = table 0 (zero spectrum, consumes nothing),
            1..15 = code tables 1,2,3,5,6,7,8,9,10,11,12,13,15,16,24,
            16 = count1 table A (quads), 17 = count1 table B.
    fields: short code: a=x, b=y, adv=len, flag=0
            long prefix: a=l2gid&127, b=l2gid>>7, adv=9, flag=1
            count1:      a=quad nonzero value v (0..15), adv=len, flag=0
            invalid:     flag=3 (decoder overrun, matches mp3dec.cpp
                         HuffLut::decode returning false)
  LUT_B (512, N_GROUPS_B*3): continuation groups x fields [a, b, adv]
    fields: a=x, b=y, adv=remaining length (10 => L3 fixup);
            invalid window: adv=-1 (overrun)

Tables parsed from _native/huffman_tables.h (ISO 11172-3 Table B.7
constants, the same source the host decoder compiles in) so host and
device decode from identical data.
"""

from __future__ import annotations

import os
import re
from functools import lru_cache

import numpy as np

L1_BITS = 9
N_FIELDS_A = 4
N_FIELDS_B = 3

# kHuffTableIds order in huffman_tables.h.
TABLE_IDS = [1, 2, 3, 5, 6, 7, 8, 9, 10, 11, 12, 13, 15, 16, 24]
GROUP_ZERO = 0
GROUP_OF_TABLE = {tid: i + 1 for i, tid in enumerate(TABLE_IDS)}
GROUP_COUNT1_A = 16
GROUP_COUNT1_B = 17
N_GROUPS_A = 18

# The two 19-bit codes of table 13 share their first 18 bits (all zero);
# the final bit selects between these (x, y) pairs.
L3_PAIR0 = (15, 14)
L3_PAIR1 = (15, 12)

FLAG_OK = 0
FLAG_CONT = 1
FLAG_INVALID = 3


def _header_path() -> str:
    return os.path.join(
        os.path.dirname(os.path.abspath(__file__)), os.pardir, "_native",
        "huffman_tables.h",
    )


@lru_cache(maxsize=None)
def _parse_tables():
    src = open(_header_path()).read()
    tables = {}
    for m in re.finditer(r"kHuffTable(\d+)\[(\d+)\] = \{(.*?)\};", src, re.S):
        tid = int(m.group(1))
        ents = [
            (int(x), int(y), int(c, 16), int(l))
            for x, y, c, l in re.findall(
                r"\{(\d+),\s*(\d+),\s*0x([0-9a-fA-F]+)u,\s*(\d+)\}", m.group(3)
            )
        ]
        tables[tid] = ents
    m = re.search(r"kHuffSelect\[32\] = \{(.*?)\};", src, re.S)
    select = [
        (int(a), int(b))
        for a, b in re.findall(r"\{(-?\d+),\s*(-?\d+)\}", m.group(1))
    ]
    quad_a_code = [
        int(v)
        for v in re.search(r"kQuadACode\[16\] = \{(.*?)\};", src, re.S)
        .group(1).split(",")
    ]
    quad_a_len = [
        int(v)
        for v in re.search(r"kQuadALen\[16\] = \{(.*?)\};", src, re.S)
        .group(1).split(",")
    ]
    return tables, select, quad_a_code, quad_a_len


@lru_cache(maxsize=None)
def build_luts():
    """Returns (lut_a (512, 72) int8, lut_b (512, 3*n_l2) int8,
    select_group (32,) int8, select_linbits (32,) int8, n_l2)."""
    tables, select, qa_code, qa_len = _parse_tables()

    # Enumerate L2 groups: (table, 9-bit prefix) of codes longer than 9.
    l2_groups = []  # list of (tid, prefix)
    l2_index = {}
    for tid in TABLE_IDS:
        for x, y, c, l in tables[tid]:
            if l > L1_BITS:
                pre = c >> (l - L1_BITS)
                key = (tid, pre)
                if key not in l2_index:
                    l2_index[key] = len(l2_groups)
                    l2_groups.append(key)
    n_l2 = len(l2_groups)

    lut_a = np.zeros((512, N_GROUPS_A * N_FIELDS_A), np.int8)
    lut_b = np.zeros((512, n_l2 * N_FIELDS_B), np.int8)

    # Group 0 (table 0): zeros, adv 0, always valid — defaults are fine.

    # Big-value code tables.
    for tid in TABLE_IDS:
        g = GROUP_OF_TABLE[tid]
        cols = slice(g * N_FIELDS_A, (g + 1) * N_FIELDS_A)
        block = np.zeros((512, N_FIELDS_A), np.int64)
        block[:, 3] = FLAG_INVALID
        for x, y, c, l in tables[tid]:
            if l <= L1_BITS:
                base = c << (L1_BITS - l)
                block[base : base + (1 << (L1_BITS - l))] = (x, y, l, FLAG_OK)
        # Long prefixes override after short codes (prefix-free: disjoint).
        for x, y, c, l in tables[tid]:
            if l > L1_BITS:
                pre = c >> (l - L1_BITS)
                gid2 = l2_index[(tid, pre)]
                block[pre] = (gid2 & 127, gid2 >> 7, L1_BITS, FLAG_CONT)
        lut_a[:, cols] = block.astype(np.int8)

    # count1 table A: quad codes, value v stored in field a.
    ca = np.zeros((512, N_FIELDS_A), np.int64)
    ca[:, 3] = FLAG_INVALID
    for v in range(16):
        l = qa_len[v]
        base9 = qa_code[v] << (L1_BITS - l)
        ca[base9 : base9 + (1 << (L1_BITS - l))] = (v, 0, l, FLAG_OK)
    lut_a[:, GROUP_COUNT1_A * 4 : GROUP_COUNT1_A * 4 + 4] = ca.astype(np.int8)

    # count1 table B: v = 15 - first 4 bits, always 4 bits.
    cb = np.zeros((512, N_FIELDS_A), np.int64)
    for w in range(512):
        cb[w] = (15 - (w >> 5), 0, 4, FLAG_OK)
    lut_a[:, GROUP_COUNT1_B * 4 : GROUP_COUNT1_B * 4 + 4] = cb.astype(np.int8)

    # L2 continuation groups over the NEXT 9 bits.
    for (tid, pre), gid2 in l2_index.items():
        cols = slice(gid2 * N_FIELDS_B, (gid2 + 1) * N_FIELDS_B)
        block = np.zeros((512, N_FIELDS_B), np.int64)
        block[:, 2] = -1  # invalid
        for x, y, c, l in tables[tid]:
            if l > L1_BITS and (c >> (l - L1_BITS)) == pre:
                rem = l - L1_BITS
                tail = c & ((1 << rem) - 1)
                if rem <= L1_BITS:
                    base = tail << (L1_BITS - rem)
                    block[base : base + (1 << (L1_BITS - rem))] = (x, y, rem)
                else:
                    # rem == 10: the table-13 pair; first 9 tail bits are
                    # shared — mark for the L3 one-bit fixup.
                    assert rem == 10 and (x, y) in (L3_PAIR0, L3_PAIR1)
                    base = (tail >> 1) << (L1_BITS - 9)
                    block[base] = (L3_PAIR0[0], L3_PAIR0[1], 10)
        lut_b[:, cols] = block.astype(np.int8)

    sel_group = np.array(
        [GROUP_OF_TABLE.get(t, GROUP_ZERO) for t, _ in select], np.int8
    )
    sel_linbits = np.array([lb for _, lb in select], np.int8)
    return lut_a, lut_b, sel_group, sel_linbits, n_l2


# ---------------------------------------------------------------------------
# Multi-level continuation tables: 5-bit L2/L3 windows.
#
# The single-level LUT_B contracts a 512-wide one-hot per step —
# (384, 512) x (512, lanes) dominated the kernel's MXU time. Continuation
# codes have at most 10 bits past the 9-bit prefix, so two 5-bit levels
# cover everything (9 + 5 + 5 = 19 = the longest code, table 13), with
# 16x less contraction work and no special-cased 19-bit pair.
# ---------------------------------------------------------------------------

L2_BITS = 5
L3_BITS = 5

# lut_b5 f-field encoding: 0 invalid, 1..5 remaining length, 6 -> L3.
F2_L3 = 6


@lru_cache(maxsize=None)
def build_luts_ml():
    """Returns (lut_b5 (32, n_l2*2) int16 [ab, f2], lut_c5 (32, n_l3*2)
    int16 [ab, rem3], n_l2, n_l3). ab = x + 16*y. Group ids match
    build_luts' L2 enumeration (lut_a's FLAG_CONT entries)."""
    tables, _, _, _ = _parse_tables()

    l2_groups = []
    l2_index = {}
    l3_groups = []
    l3_index = {}
    for tid in TABLE_IDS:
        for x, y, c, l in tables[tid]:
            if l > L1_BITS:
                key = (tid, c >> (l - L1_BITS))
                if key not in l2_index:
                    l2_index[key] = len(l2_groups)
                    l2_groups.append(key)
            if l > L1_BITS + L2_BITS:
                key = (tid, c >> (l - L1_BITS - L2_BITS))
                if key not in l3_index:
                    l3_index[key] = len(l3_groups)
                    l3_groups.append(key)
    n_l2 = len(l2_groups)
    n_l3 = max(len(l3_groups), 1)

    lut_b5 = np.zeros((1 << L2_BITS, n_l2 * 2), np.int16)  # f2=0 invalid
    lut_c5 = np.zeros((1 << L3_BITS, n_l3 * 2), np.int16)  # rem3=0 invalid

    for tid in TABLE_IDS:
        for x, y, c, l in tables[tid]:
            if l <= L1_BITS:
                continue
            gid2 = l2_index[(tid, c >> (l - L1_BITS))]
            if l <= L1_BITS + L2_BITS:
                rem = l - L1_BITS
                tail = c & ((1 << rem) - 1)
                base = tail << (L2_BITS - rem)
                lut_b5[base : base + (1 << (L2_BITS - rem)),
                       2 * gid2 : 2 * gid2 + 2] = (x + 16 * y, rem)
            else:
                # Route this L2 window to the L3 group.
                pre14 = c >> (l - L1_BITS - L2_BITS)
                gid3 = l3_index[(tid, pre14)]
                lut_b5[pre14 & ((1 << L2_BITS) - 1),
                       2 * gid2 : 2 * gid2 + 2] = (gid3, F2_L3)
                rem3 = l - L1_BITS - L2_BITS
                tail = c & ((1 << rem3) - 1)
                base = tail << (L3_BITS - rem3)
                lut_c5[base : base + (1 << (L3_BITS - rem3)),
                       2 * gid3 : 2 * gid3 + 2] = (x + 16 * y, rem3)
    return lut_b5, lut_c5, n_l2, n_l3
