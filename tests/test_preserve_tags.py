"""--preserve-tags: BAM input optional fields pass through to SAM output
(ref: bt2_search.cpp:736, pat.cpp:1508, sam.cpp:881)."""
import struct
import zlib


def _bgzf_block(d):
    c = zlib.compressobj(6, zlib.DEFLATED, -15)
    cd = c.compress(d) + c.flush()
    out = struct.pack("<BBBBIBBH", 0x1f, 0x8b, 8, 4, 0, 0, 0xff, 6)
    out += struct.pack("<BBHH", 66, 67, 2, len(cd) + 25)
    out += cd + struct.pack("<II", zlib.crc32(d) & 0xffffffff, len(d))
    return out


_SEQ4 = "=ACMGRSVTWYHKDBN"


def _rec(name, seq, tags=b""):
    s4 = bytes((_SEQ4.index(seq[i]) << 4) |
               (_SEQ4.index(seq[i + 1]) if i + 1 < len(seq) else 0)
               for i in range(0, len(seq), 2))
    r = struct.pack("<iiBBHHHiiii", -1, -1, len(name) + 1, 0, 0, 0, 4,
                    len(seq), -1, -1, 0)
    r += name.encode() + b"\0" + s4 + bytes([40] * len(seq)) + tags
    return struct.pack("<i", len(r)) + r


def _mk_bam(path, recs):
    hdr = b"BAM\x01" + struct.pack("<ii", 0, 0)
    path.write_bytes(_bgzf_block(hdr + b"".join(recs)) + _bgzf_block(b""))


def test_tag_block_decodes_to_sam_text(tmp_path):
    from bowtie2_server_tpu.io.bam import _tags_to_sam

    tags = (b"RG" + b"Z" + b"grp1\x00"
            + b"NM" + b"i" + struct.pack("<i", 3)
            + b"XSC" + struct.pack("<B", 7)
            + b"XA" + b"B" + b"i" + struct.pack("<i", 2)
            + struct.pack("<ii", -1, 5)
            + b"ZF" + b"f" + struct.pack("<f", 1.5)
            + b"ZA" + b"A" + b"Q")
    assert _tags_to_sam(tags) == \
        "RG:Z:grp1\tNM:i:3\tXS:i:7\tXA:B:i,-1,5\tZF:f:1.5\tZA:A:Q"


def test_preserve_tags_roundtrip(tmp_path):
    from bowtie2_server_tpu.io.bam import iter_bam
    from bowtie2_server_tpu.io.sam import sam_record

    t1 = b"RG" + b"Z" + b"lane1\x00" + b"BC" + b"Z" + b"ACGT\x00"
    bam = tmp_path / "t.bam"
    _mk_bam(bam, [_rec("r1", "ACGTACGTACGT", t1),
                  _rec("r2", "GGGGCCCCAAAA")])
    b = next(iter_bam(bam, preserve_tags=True))
    assert b.bam_tags == ["RG:Z:lane1\tBC:Z:ACGT", ""]

    # a record built from the batch carries the tags into the SAM line
    from bowtie2_server_tpu.align.pipeline import AlnRec
    rec = AlnRec(name="r1", aligned=False)
    rec.seq = rec.orig_seq = b.raw_seq[0]
    rec.qual = rec.orig_qual = b.raw_qual[0]
    rec.preserved = b.bam_tags[0]
    line = sam_record(rec, ["chr1"])
    assert line.endswith("\tRG:Z:lane1\tBC:Z:ACGT")


def test_preserve_tags_requires_bam(tmp_path):
    import pytest

    from bowtie2_server_tpu.__main__ import main
    fq = tmp_path / "r.fq"
    fq.write_text("@a\nACGT\n+\nIIII\n")
    with pytest.raises(SystemExit, match="BAM"):
        main(["align", "-x", "X", "-U", str(fq), "--preserve-tags"])
