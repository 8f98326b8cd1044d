"""Side-info census of an MPEG-1 Layer III stream — the round-6 spike
evidence for keeping MP3 PCM decode an honest 'header_only' seam.

Walks every frame, parses the side info (ISO 11172-3 2.4.1.7), and
histograms the Huffman table_select values, block types, count1 tables and
scalefac_compress — i.e. exactly what a from-scratch PCM decoder would
need exact data tables for. On the reference fixture
(tests/data/audio/sample_10s.mp3): 384 frames using 28 distinct B.7
Huffman tables, all four block types, and the bit reservoir — with no
decoder anywhere in the sandbox to validate a reconstruction against
(see functions/media_decode.py::parse_mp3_meta).

Usage: python tools/mp3_sideinfo_census.py <file.mp3>
"""
from __future__ import annotations

import collections
import sys

BITRATE = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
SAMPLE_RATE = [44100, 48000, 32000]


class _Bits:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.buf[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v


def census(data: bytes) -> dict:
    i = 0
    if data[:3] == b"ID3":
        i = 10 + (
            ((data[6] & 0x7F) << 21) | ((data[7] & 0x7F) << 14)
            | ((data[8] & 0x7F) << 7) | (data[9] & 0x7F)
        )
    tables: collections.Counter = collections.Counter()
    btypes: collections.Counter = collections.Counter()
    c1t: collections.Counter = collections.Counter()
    scfc: collections.Counter = collections.Counter()
    n_frames = 0
    max_mdb = 0
    while i + 4 <= len(data):
        h = data[i:i + 4]
        if h[0] != 0xFF or (h[1] & 0xE0) != 0xE0 or (h[1] >> 3) & 3 != 3 \
                or (h[1] >> 1) & 3 != 1:
            i += 1
            continue
        bidx, sridx = (h[2] >> 4) & 15, (h[2] >> 2) & 3
        if bidx in (0, 15) or sridx == 3:
            i += 1
            continue
        flen = 144 * BITRATE[bidx] * 1000 // SAMPLE_RATE[sridx] \
            + ((h[2] >> 1) & 1)
        nch = 1 if (h[3] >> 6) & 3 == 3 else 2
        off = i + 4 + (2 if (h[1] & 1) == 0 else 0)
        si = _Bits(data[off:off + (17 if nch == 1 else 32)])
        n_frames += 1
        max_mdb = max(max_mdb, si.u(9))
        si.u(5 if nch == 1 else 3)
        for _ in range(nch):
            si.u(4)  # scfsi
        for _gr in range(2):
            for _ch in range(nch):
                si.u(12)  # part2_3_length
                bv = si.u(9)
                si.u(8)  # global_gain
                scfc[si.u(4)] += 1
                if si.u(1):  # window switching
                    bt, mixed = si.u(2), si.u(1)
                    ts = [si.u(5) for _ in range(2)]
                    for _ in range(3):
                        si.u(3)  # subblock_gain
                    btypes[f"short(bt={bt},mixed={mixed})"] += 1
                else:
                    ts = [si.u(5) for _ in range(3)]
                    si.u(4)
                    si.u(3)
                    btypes["long"] += 1
                if bv:
                    tables.update(ts)
                si.u(2)  # preflag, scalefac_scale
                c1t[si.u(1)] += 1
        i += flen
    return {
        "frames": n_frames,
        "max_main_data_begin": max_mdb,
        "block_types": dict(btypes),
        "huffman_tables": dict(sorted(tables.items())),
        "n_distinct_tables": len(tables),
        "count1_tables": dict(c1t),
        "scalefac_compress": dict(sorted(scfc.items())),
    }


if __name__ == "__main__":
    with open(sys.argv[1], "rb") as f:
        result = census(f.read())
    for k, v in result.items():
        print(f"{k}: {v}")
