"""SAM output (ref: sam.cpp:54-120 header, :121-681 printAlignedOptFlags).

Field order of optional tags matches the reference's emission order for
unpaired records: AS, (XS), XN, XM, XO, XG, NM, (YF), MD, YT.
"""
from __future__ import annotations

from ..align.pipeline import AlnRec

FLAG_UNMAPPED = 4
FLAG_REVERSE = 16


def sam_header(ref_names, ref_lens, program_args: str = "",
               version: str = "2.5.4-tpu") -> str:
    lines = ["@HD\tVN:1.0\tSO:unsorted"]
    for name, ln in zip(ref_names, ref_lens):
        lines.append(f"@SQ\tSN:{name}\tLN:{int(ln)}")
    lines.append(
        f"@PG\tID:bowtie2\tPN:bowtie2\tVN:{version}\tCL:\"{program_args}\"")
    return "\n".join(lines) + "\n"


def sam_record(rec: AlnRec, ref_names) -> str:
    seq = rec.seq.decode() if isinstance(rec.seq, bytes) else rec.seq
    qual = rec.qual.decode() if isinstance(rec.qual, bytes) else rec.qual
    if not qual:
        qual = "*"
    if not rec.aligned:
        tags = []
        if rec.filtered:
            tags.append("YF:Z:NS")
        tags.append(f"YT:Z:{rec.yt}")
        return "\t".join([
            rec.name, str(FLAG_UNMAPPED), "*", "0", "0", "*", "*", "0", "0",
            seq, qual] + tags)
    flag = 0 if rec.fw else FLAG_REVERSE
    tags = [f"AS:i:{rec.score}"]
    if rec.secbest is not None:
        tags.append(f"XS:i:{rec.secbest}")
    tags += [f"XN:i:{rec.xn}", f"XM:i:{rec.xm}", f"XO:i:{rec.xo}",
             f"XG:i:{rec.xg}", f"NM:i:{rec.nm}", f"MD:Z:{rec.md}",
             f"YT:Z:{rec.yt}"]
    return "\t".join([
        rec.name, str(flag), ref_names[rec.ref_id], str(rec.pos + 1),
        str(rec.mapq), rec.cigar, "*", "0", "0", seq, qual] + tags)
