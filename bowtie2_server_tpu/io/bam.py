"""BAM read input (ref: pat.h:1074 BAMPatternSource with BGZF inflation).

Parses BGZF blocks with stdlib zlib and decodes BAM alignment records into
read batches. Records flagged secondary/supplementary (0x900) are skipped;
reverse-strand records are reverse-complemented back to original read
orientation, as the reference does when re-aligning from BAM.
"""
from __future__ import annotations

import struct
import zlib

from ..utils import dna
from .fastq import make_batch

_SEQ4 = "=ACMGRSVTWYHKDBN"
_C4 = {c: i for i, c in enumerate(_SEQ4)}


def _bgzf_blocks(f):
    while True:
        head = f.read(12)
        if len(head) < 12:
            return
        magic, _mtime, _xfl, _os, xlen = struct.unpack("<IIBBH", head)
        extra = f.read(xlen)
        bsize = None
        i = 0
        while i + 4 <= len(extra):
            si1, si2, slen = extra[i], extra[i + 1], \
                struct.unpack("<H", extra[i + 2 : i + 4])[0]
            if si1 == 66 and si2 == 67:
                bsize = struct.unpack("<H", extra[i + 4 : i + 6])[0]
            i += 4 + slen
        if bsize is None:
            raise ValueError("not a BGZF stream (no BC subfield)")
        cdata = f.read(bsize - xlen - 19)
        f.read(8)  # crc + isize
        data = zlib.decompress(cdata, -15)
        if not data:
            return  # EOF block
        yield data


def iter_bam_paired(path, batch_size: int = 4096):
    """Paired BAM input (--align-paired-reads; ref: pat.h:1074
    BAMPatternSource with gAlignPairedBAM): mate-1 records (flag 0x40)
    pair with the NEXT mate-2 record (0x80) of the same QNAME — the
    name-adjacent layout of name-sorted / as-produced BAM. Unpaired
    records (no 0x1) are skipped. Yields (batch1, batch2)."""
    from .fastq import make_batch as _mk
    n1, s1, q1, n2, s2, q2 = [], [], [], [], [], []
    pend: dict[str, tuple] = {}
    for name, seq, qual, flag in _iter_bam_records(path):
        if not flag & 0x1:
            continue
        mate1 = bool(flag & 0x40)
        other = pend.pop(name, None)
        if other is None:
            pend[name] = (seq, qual, mate1)
            continue
        oseq, oq, omate1 = other
        if mate1 == omate1:     # same mate twice: keep the newest pending
            pend[name] = (seq, qual, mate1)
            continue
        m1s, m1q, m2s, m2q = ((seq, qual, oseq, oq) if mate1
                              else (oseq, oq, seq, qual))
        n1.append(name)
        s1.append(m1s)
        q1.append(m1q)
        n2.append(name)
        s2.append(m2s)
        q2.append(m2q)
        if len(n1) >= batch_size:
            yield _mk(n1, s1, q1), _mk(n2, s2, q2)
            n1, s1, q1, n2, s2, q2 = [], [], [], [], [], []
    if n1:
        yield _mk(n1, s1, q1), _mk(n2, s2, q2)


def _iter_bam_records(path):
    """Yield (name, seq, qual, flag) of primary records in a BAM file."""
    buf = b""
    with open(path, "rb") as f:
        blocks = _bgzf_blocks(f)

        def need(n):
            nonlocal buf
            while len(buf) < n:
                try:
                    buf += next(blocks)
                except StopIteration:
                    return False
            return True

        if not need(4) or buf[:4] != b"BAM\x01":
            raise ValueError("not a BAM file")
        buf = buf[4:]
        need(4)
        l_text = struct.unpack("<i", buf[:4])[0]
        need(4 + l_text + 4)
        buf = buf[4 + l_text:]
        n_ref = struct.unpack("<i", buf[:4])[0]
        buf = buf[4:]
        for _ in range(n_ref):
            need(4)
            l_name = struct.unpack("<i", buf[:4])[0]
            need(4 + l_name + 4)
            buf = buf[4 + l_name + 4:]
        while True:
            if not need(4):
                break
            bs = struct.unpack("<i", buf[:4])[0]
            if not need(4 + bs):
                break
            rec = buf[4 : 4 + bs]
            buf = buf[4 + bs:]
            (_refid, _pos, l_rn, _mapq, _bin, n_cigar, flag, l_seq,
             _nrefid, _npos, _tlen) = struct.unpack("<iiBBHHHiiii", rec[:32])
            if flag & 0x900:
                continue  # secondary / supplementary
            off = 32
            name = rec[off : off + l_rn - 1].decode()
            off += l_rn + 4 * n_cigar
            nb = (l_seq + 1) // 2
            seq4 = rec[off : off + nb]
            off += nb
            qual = rec[off : off + l_seq]
            chars = []
            for i in range(l_seq):
                b4 = (seq4[i // 2] >> (4 if i % 2 == 0 else 0)) & 0xF
                chars.append(_SEQ4[b4])
            seq = "".join(chars).encode()
            q = bytes(min(x, 93) + 33 for x in qual) if qual and \
                qual[0] != 0xFF else b"I" * l_seq
            if flag & 0x10:  # stored revcomp: restore original orientation
                seq = dna.decode(dna.revcomp(dna.encode(seq))).encode()
                q = q[::-1]
            yield name, seq, q, flag


def iter_bam(path, batch_size: int = 4096, keep_paired_flags: bool = False):
    """Yield ReadBatch objects of the reads stored in a BAM file
    (unpaired view: every primary record becomes a read)."""
    names, seqs, quals = [], [], []
    for name, seq, q, _flag in _iter_bam_records(path):
        names.append(name)
        seqs.append(seq)
        quals.append(q)
        if len(names) >= batch_size:
            yield make_batch(names, seqs, quals)
            names, seqs, quals = [], [], []
    if names:
        yield make_batch(names, seqs, quals)
