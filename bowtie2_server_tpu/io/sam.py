"""SAM output (ref: sam.cpp:54-120 header, :121-681 printAlignedOptFlags).

Field order of optional tags matches the reference's emission order for
unpaired records: AS, (XS), XN, XM, XO, XG, NM, (YF), MD, YT.
"""
from __future__ import annotations

from ..align.pipeline import AlnRec

FLAG_PAIRED = 0x1
FLAG_PROPER = 0x2
FLAG_UNMAPPED = 0x4
FLAG_MATE_UNMAPPED = 0x8
FLAG_REVERSE = 0x10
FLAG_MATE_REVERSE = 0x20
FLAG_MATE1 = 0x40
FLAG_MATE2 = 0x80
FLAG_SECONDARY = 0x100


def sam_header(ref_names, ref_lens, program_args: str = "",
               version: str = "2.5.4-tpu", rg_id: str | None = None,
               rg_fields: list[str] | None = None) -> str:
    lines = ["@HD\tVN:1.0\tSO:unsorted"]
    for name, ln in zip(ref_names, ref_lens):
        lines.append(f"@SQ\tSN:{name}\tLN:{int(ln)}")
    if rg_id:
        rg = f"@RG\tID:{rg_id}"
        for f in rg_fields or []:
            rg += "\t" + f
        lines.append(rg)
    lines.append(
        f"@PG\tID:bowtie2\tPN:bowtie2\tVN:{version}\tCL:\"{program_args}\"")
    return "\n".join(lines) + "\n"


def _flags(rec: AlnRec) -> int:
    f = 0
    if rec.paired:
        f |= FLAG_PAIRED | (FLAG_MATE1 if rec.mate1 else FLAG_MATE2)
        if rec.proper:
            f |= FLAG_PROPER
        if not rec.mate_aligned:
            f |= FLAG_MATE_UNMAPPED
        elif not rec.mate_fw:
            f |= FLAG_MATE_REVERSE
    if not rec.aligned:
        f |= FLAG_UNMAPPED
    else:
        if not rec.fw:
            f |= FLAG_REVERSE
        if rec.secondary:
            f |= FLAG_SECONDARY
    return f


def sam_record(rec: AlnRec, ref_names, rg_id: str | None = None) -> str:
    seq = rec.seq.decode() if isinstance(rec.seq, bytes) else rec.seq
    qual = rec.qual.decode() if isinstance(rec.qual, bytes) else rec.qual
    if not qual:
        qual = "*"
    flag = _flags(rec)
    if not rec.aligned:
        # unaligned with an aligned mate: inherit the mate's RNAME/POS
        # (ref: sam.cpp printEmptyOptFlags placement rules)
        if rec.paired and rec.mate_aligned and rec.mate_ref_id >= 0:
            rname = ref_names[rec.mate_ref_id]
            pos = str(rec.mate_pos + 1)
            rnext, pnext = "=", str(rec.mate_pos + 1)
        else:
            rname, pos, rnext, pnext = "*", "0", "*", "0"
        tags = []
        if rec.filtered:
            tags.append("YF:Z:NS")
        tags.append(f"YT:Z:{rec.yt}")
        if rg_id:
            tags.append(f"RG:Z:{rg_id}")
        return "\t".join([
            rec.name, str(flag), rname, pos, "0", "*", rnext, pnext, "0",
            seq, qual] + tags)
    if rec.paired and rec.mate_aligned and rec.mate_ref_id >= 0:
        rnext = "=" if rec.mate_ref_id == rec.ref_id else \
            ref_names[rec.mate_ref_id]
        pnext = str(rec.mate_pos + 1)
        tlen = str(rec.tlen)
    elif rec.paired:
        rnext, pnext, tlen = "=", str(rec.pos + 1), "0"
    else:
        rnext, pnext, tlen = "*", "0", "0"
    tags = [f"AS:i:{rec.score}"]
    if rec.secbest is not None:
        tags.append(f"XS:i:{rec.secbest}")
    tags += [f"XN:i:{rec.xn}", f"XM:i:{rec.xm}", f"XO:i:{rec.xo}",
             f"XG:i:{rec.xg}", f"NM:i:{rec.nm}", f"MD:Z:{rec.md}"]
    if rec.paired and rec.ys is not None:
        tags.append(f"YS:i:{rec.ys}")
    tags.append(f"YT:Z:{rec.yt}")
    if rg_id:
        tags.append(f"RG:Z:{rg_id}")
    return "\t".join([
        rec.name, str(flag), ref_names[rec.ref_id], str(rec.pos + 1),
        str(rec.mapq), rec.cigar, rnext, pnext, tlen, seq, qual] + tags)
