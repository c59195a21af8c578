"""Read input parsing (ref: pat.h:1030 FastqPatternSource and friends).

The reference light-parses batches on a reader thread, then finalizes
per-worker. Here the host parses into flat numpy batches ready for device
upload: code matrix [B, Lmax], quality matrix, lengths, names.
"""
from __future__ import annotations

import gzip
import io
from dataclasses import dataclass
from pathlib import Path

import numpy as np

from ..utils import dna


@dataclass
class ReadBatch:
    names: list[str]
    seqs: np.ndarray    # [B, Lmax] uint8 codes, pad=5
    quals: np.ndarray   # [B, Lmax] int32 phred, pad=0
    lens: np.ndarray    # [B] int32
    raw_seq: list[bytes]   # original ASCII sequences (for SAM SEQ column)
    raw_qual: list[bytes]  # original ASCII qualities

    def __len__(self):
        return len(self.names)


def _open_maybe_compressed(path):
    p = str(path)
    f = open(p, "rb")
    magic = f.read(2)
    f.seek(0)
    if magic == b"\x1f\x8b":
        return gzip.open(f)
    return f


def iter_fastq(path_or_handle, batch_size: int = 4096, max_len: int = 100_000,
               trim5: int = 0, trim3: int = 0, skip: int = 0,
               upto: int | None = None):
    """Yield ReadBatch objects from a FASTQ file (optionally gzipped).
    trim5/trim3: -5/-3 base trimming; skip/upto: -s/-u read windowing
    (ref: bt2_search.cpp gTrim5/gTrim3, skipReads/qUpto)."""
    if hasattr(path_or_handle, "read"):
        f = path_or_handle
        close = False
    else:
        f = _open_maybe_compressed(path_or_handle)
        close = True
    try:
        names, seqs, quals = [], [], []
        n_seen = 0
        while True:
            h = f.readline()
            if not h:
                break
            if isinstance(h, str):
                h = h.encode()
            h = h.strip()
            if not h:
                continue
            seq = f.readline().strip()
            plus = f.readline()
            qual = f.readline().strip()
            if isinstance(seq, str):
                seq, qual = seq.encode(), qual.encode()
            n_seen += 1
            if n_seen <= skip:
                continue
            if upto is not None and n_seen > skip + upto:
                break
            if trim5 or trim3:
                end = len(seq) - trim3
                seq = seq[trim5:end]
                qual = qual[trim5:end] if qual else qual
            name = h[1:].split()[0].decode() if h.startswith(b"@") else h.decode()
            names.append(name)
            seqs.append(seq[:max_len])
            quals.append(qual[:max_len])
            if len(names) >= batch_size:
                yield make_batch(names, seqs, quals)
                names, seqs, quals = [], [], []
        if names:
            yield make_batch(names, seqs, quals)
    finally:
        if close:
            f.close()


def make_batch(names, seqs, quals) -> ReadBatch:
    B = len(names)
    lmax = max((len(s) for s in seqs), default=1)
    lmax = max(lmax, 1)
    mat = np.full((B, lmax), 5, dtype=np.uint8)
    qmat = np.zeros((B, lmax), dtype=np.int32)
    lens = np.zeros(B, dtype=np.int32)
    for i, (s, q) in enumerate(zip(seqs, quals)):
        codes = dna.encode(s)
        mat[i, : len(codes)] = codes
        if len(q) == len(s):
            qmat[i, : len(codes)] = dna.phred33(q)
        else:  # missing/malformed quals -> high quality
            qmat[i, : len(codes)] = 40
        lens[i] = len(codes)
    return ReadBatch(names=names, seqs=mat, quals=qmat, lens=lens,
                     raw_seq=list(seqs), raw_qual=list(quals))


def iter_tab6(lines_iter, batch_size: int = 4096):
    """Parse tab6/tab5 lines: name\tseq\tqual[\tname2\tseq2\tqual2]
    (ref: pat.h:843 TabbedPatternSource). Yields (batch1, batch2|None)."""
    n1, s1, q1 = [], [], []
    n2, s2, q2 = [], [], []
    paired = False
    for line in lines_iter:
        if isinstance(line, str):
            line = line.encode()
        line = line.rstrip(b"\r\n")
        if not line:
            continue
        parts = line.split(b"\t")
        n1.append(parts[0].decode())
        s1.append(parts[1])
        q1.append(parts[2] if len(parts) > 2 else b"")
        if len(parts) >= 6:
            paired = True
            n2.append(parts[3].decode())
            s2.append(parts[4])
            q2.append(parts[5])
        if len(n1) >= batch_size:
            yield (make_batch(n1, s1, q1),
                   make_batch(n2, s2, q2) if paired else None)
            n1, s1, q1, n2, s2, q2 = [], [], [], [], [], []
            paired = False
    if n1:
        yield (make_batch(n1, s1, q1),
               make_batch(n2, s2, q2) if paired else None)
