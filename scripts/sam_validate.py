"""SAM re-validation (the analog of the reference's AlignmentCheck.pm,
SURVEY §4.2): independently recompute each aligned record's score, NM, and
MD from the genome and the CIGAR, and compare against the emitted tags.

Usage: python scripts/sam_validate.py <ref.fa> <aln.sam> [--local]
Exits non-zero and prints the first offenders if any record disagrees.
"""
from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

from bowtie2_server_tpu.index.build import parse_fasta
from bowtie2_server_tpu.utils import dna
from bowtie2_server_tpu.utils.scoring import Scoring

CIG_RE = re.compile(r"(\d+)([MIDNSHP=X])")


def validate_record(fields, refs, sc: Scoring):
    flag = int(fields[1])
    if flag & 0x4 or flag & 0x100:
        return None
    rname, pos, cigar = fields[2], int(fields[3]) - 1, fields[5]
    seq = dna.encode(fields[9])
    quals = dna.phred33(fields[10]) if fields[10] != "*" else \
        np.full(len(seq), 40)
    tags = {t.split(":")[0]: t.split(":", 2)[2] for t in fields[11:]}
    ref = refs[rname]
    mmtab = sc.mm_penalties()

    score = 0
    nm = xm = 0
    md = []
    run = 0
    ri, qi = pos, 0
    for n_s, op in CIG_RE.findall(cigar):
        n = int(n_s)
        if op in ("M", "=", "X"):
            for k in range(n):
                rc, qc = int(ref[ri + k]), int(seq[qi + k])
                if rc > 3 or qc > 3:
                    score -= sc.np_pen
                    nm += 1; xm += 1
                    md.append(str(run)); run = 0
                    md.append("ACGTN"[min(rc, 4)])
                elif rc == qc:
                    score += sc.match_bonus
                    run += 1
                else:
                    score -= int(mmtab[min(int(quals[qi + k]), 255)])
                    nm += 1; xm += 1
                    md.append(str(run)); run = 0
                    md.append("ACGTN"[rc])
            ri += n; qi += n
        elif op == "I":
            score -= sc.ref_gap_open + (n - 1) * sc.ref_gap_extend
            nm += n; qi += n
        elif op == "D":
            score -= sc.read_gap_open + (n - 1) * sc.read_gap_extend
            nm += n
            md.append(str(run)); run = 0
            md.append("^" + "".join("ACGTN"[min(int(ref[ri + k]), 4)]
                                    for k in range(n)))
            ri += n
        elif op == "S":
            qi += n
        elif op == "N":
            ri += n
    md.append(str(run))
    errors = []
    if "AS" in tags and int(tags["AS"]) != score:
        errors.append(f"AS {tags['AS']} != recomputed {score}")
    if "NM" in tags and int(tags["NM"]) != nm:
        errors.append(f"NM {tags['NM']} != recomputed {nm}")
    if "XM" in tags and int(tags["XM"]) != xm:
        errors.append(f"XM {tags['XM']} != recomputed {xm}")
    if "MD" in tags and tags["MD"] != "".join(md):
        errors.append(f"MD {tags['MD']} != recomputed {''.join(md)}")
    return errors or None


def validate_file(ref_fa, sam_path, local=False, max_errors=10):
    names, seqs = parse_fasta(ref_fa)
    # SAM RNAME is whitespace-truncated; parse_fasta keeps full headers
    refs = {n.split()[0]: s for n, s in zip(names, seqs)}
    sc = Scoring.default_local() if local else Scoring.default_e2e()
    n = bad = 0
    msgs = []
    for line in open(sam_path):
        if line.startswith("@"):
            continue
        fields = line.rstrip("\n").split("\t")
        errs = validate_record(fields, refs, sc)
        n += 1
        if errs:
            bad += 1
            if len(msgs) < max_errors:
                msgs.append(f"{fields[0]}: {'; '.join(errs)}")
    return n, bad, msgs


if __name__ == "__main__":
    local = "--local" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n, bad, msgs = validate_file(args[0], args[1], local)
    print(f"{n} records checked, {bad} invalid")
    for m in msgs:
        print(" ", m)
    sys.exit(1 if bad else 0)
