"""Reader for the reference's .bt2/.bt2l index format (ref: bt2_io.cpp:39
readIntoMemory, :933 szsToDisk; reference.cpp BitPairReference ctor).

Interop path: a user points us at an existing bowtie2 index; we recover the
complete reference sequences (including N runs) from:
  .3.bt2  — RefRecords: (off=N-gap, len, first) per unambiguous stretch
  .4.bt2  — the stretches' bases, 2-bit packed little-endian within bytes
  .1.bt2  — header (lengths/params), per-reference lengths (plen) and the
            reference names (stored after the eftab)
and rebuild our TPU-native index from them. Reusing the stored BWT/SA-sample
directly (decode sides + LF-walk SA fill) is the planned optimization for
mammalian-scale indexes; reconstruction is exact either way.

Layout of .1 (32-bit; .bt2l uses 8-byte offsets):
  u32 endian(=1) | OffU len | i32 lineRate, linesPerSide, offRate,
  ftabChars, flags | OffU nPat | OffU plen[nPat] | OffU nFrag |
  OffU rstarts[3*nFrag] | u8 ebwt[numSides*sideSz] | OffU zOff |
  OffU fchr[5] | OffU ftab[(1<<2k)+1] | OffU eftab[2k] | names \\0-separated
"""
from __future__ import annotations

import struct
from pathlib import Path

import numpy as np

from ..utils import dna
from .build import build_index
from .fm import FmIndex


def _off_dtype(large: bool):
    return (np.uint64, 8) if large else (np.uint32, 4)


def read_bt2_metadata(base: str):
    """Parse the .1 header: returns (params dict, plen, refnames)."""
    large = Path(base + ".1.bt2l").exists() and \
        not Path(base + ".1.bt2").exists()
    ext = ".bt2l" if large else ".bt2"
    dt, osz = _off_dtype(large)
    data = Path(base + ".1" + ext).read_bytes()
    pos = 0

    def u32():
        nonlocal pos
        v = struct.unpack_from("<i", data, pos)[0]
        pos += 4
        return v

    def offu(n=1):
        nonlocal pos
        v = np.frombuffer(data, dt, n, pos)
        pos += osz * n
        return v if n > 1 else int(v[0])

    one = struct.unpack_from("<I", data, 0)[0]
    pos = 4
    if one != 1:
        raise ValueError("big-endian .bt2 indexes are not supported")
    length = offu()
    line_rate = u32()
    u32()  # linesPerSide
    off_rate = u32()
    ftab_chars = u32()
    u32()  # flags
    n_pat = offu()
    plen = np.array(offu(n_pat), dtype=np.int64).reshape(-1)
    n_frag = offu()
    rstarts = np.array(offu(3 * n_frag), dtype=np.int64).reshape(-1, 3)
    # skip ebwt / zOff / fchr / ftab / eftab (ref: bt2_idx.h:133-166)
    bwt_len = length + 1
    bwt_sz = length // 4 + 1
    side_sz = 1 << line_rate
    side_bwt_sz = side_sz - osz * 4
    num_sides = (bwt_sz + side_bwt_sz - 1) // side_bwt_sz
    ebwt_tot = num_sides * side_sz
    pos += ebwt_tot
    pos += osz          # zOff
    pos += osz * 5      # fchr
    pos += osz * ((1 << (ftab_chars * 2)) + 1)  # ftab
    pos += osz * (ftab_chars * 2)               # eftab
    names = data[pos:].split(b"\x00")
    # stored names keep the full FASTA header line; SAM uses the first token
    refnames = [n.decode().strip().split()[0] for n in names
                if n.strip()][:n_pat]
    return dict(length=int(length), line_rate=line_rate, off_rate=off_rate,
                ftab_chars=ftab_chars, n_pat=int(n_pat), large=large,
                ext=ext, rstarts=rstarts), plen, refnames


def read_bt2_reference(base: str):
    """Recover (names, per-ref code arrays incl. Ns) from .1/.3/.4."""
    meta, plen, names = read_bt2_metadata(base)
    dt, osz = _off_dtype(meta["large"])
    ext = meta["ext"]
    d3 = Path(base + ".3" + ext).read_bytes()
    one = struct.unpack_from("<I", d3, 0)[0]
    if one != 1:
        raise ValueError("big-endian .3 not supported")
    n_recs = struct.unpack_from("<I", d3, 4)[0] if osz == 4 else \
        struct.unpack_from("<Q", d3, 4)[0]
    recs = []
    pos = 4 + osz
    for _ in range(n_recs):
        off = int(np.frombuffer(d3, dt, 1, pos)[0]); pos += osz
        ln = int(np.frombuffer(d3, dt, 1, pos)[0]); pos += osz
        first = d3[pos] != 0; pos += 1
        recs.append((off, ln, first))

    packed = np.frombuffer(Path(base + ".4" + ext).read_bytes(), np.uint8)
    # 2-bit little-endian within byte (ref: reference.cpp getStretchNaive)
    codes = np.empty(len(packed) * 4, np.uint8)
    for j in range(4):
        codes[j::4] = (packed >> (2 * j)) & 3

    seqs = []
    cur = None
    joined_off = 0
    ref_i = -1
    for off, ln, first in recs:
        if first:
            if cur is not None:
                seqs.append(cur)
            ref_i += 1
            cur = np.full(int(plen[ref_i]), 4, np.uint8)
            ref_pos = 0
        ref_pos += off  # N gap
        cur[ref_pos : ref_pos + ln] = codes[joined_off : joined_off + ln]
        ref_pos += ln
        joined_off += ln
    if cur is not None:
        seqs.append(cur)
    return names, seqs


def load_bt2_index(base: str) -> FmIndex:
    """Load a reference-format index by reconstructing the genome and
    rebuilding our native structures."""
    names, seqs = read_bt2_reference(base)
    fasta = []
    for n, s in zip(names, seqs):
        fasta.append(f">{n}\n{dna.decode(s)}")
    return build_index("\n".join(fasta) + "\n")


def detect_index(base: str):
    """Return ('native'|'bt2', loader) for an index basename."""
    if Path(base + ".fm.npz").exists():
        return "native", FmIndex.load
    if Path(base + ".1.bt2").exists() or Path(base + ".1.bt2l").exists():
        return "bt2", load_bt2_index
    raise FileNotFoundError(f"no index found at {base}(.fm.npz/.1.bt2)")
