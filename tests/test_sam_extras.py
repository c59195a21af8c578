"""SAM emitter extras: --xeq, --passthrough, --sam-append-comment,
--show-rand-seed (ref: bt2_search.cpp ARG_XEQ/ARG_READ_PASSTHRU/
ARG_SAM_APPEND_COMMENT/ARG_SHOW_RAND_SEED; sam.h:258-470)."""
import numpy as np

from bowtie2_server_tpu.align.pipeline import AlnRec
from bowtie2_server_tpu.io.sam import (cigar_xeq, comment_field,
                                       escape_newlines, passthrough_line,
                                       sam_record)


def test_cigar_xeq_basic():
    # 116=1X77= observed from the reference server with --xeq
    assert cigar_xeq("194M", "116A77") == "116=1X77="
    assert cigar_xeq("313M", "152G6C153") == "152=1X6=1X153="
    assert cigar_xeq("100M", "100") == "100="
    # gaps: MD deletions align with D ops; insertions invisible to MD
    assert cigar_xeq("10M2D5M", "10^AC5") == "10=2D5="
    assert cigar_xeq("4M3I6M", "2T7") == "2=1X1=3I6="
    # adjacent mismatches (MD uses 0 separators)
    assert cigar_xeq("5M", "1A0C2") == "1=2X2="
    # soft clips pass through
    assert cigar_xeq("3S7M2S", "5G1") == "3S5=1X1=2S"
    assert cigar_xeq("*", "") == "*"


def test_escape_newlines():
    assert escape_newlines(b"@r1\nACGT\n+\nIIII") == "@r1%0AACGT%0A+%0AIIII"
    assert escape_newlines(b"a%b\r") == "a%25b%0D"


def test_passthrough_line_from_orig_and_fallback():
    rec = AlnRec(name="r", aligned=True, orig_rec=b"@r x\nAC\n+\nII")
    assert passthrough_line(rec) == "@r x%0AAC%0A+%0AII"
    rec2 = AlnRec(name="r", aligned=False, orig_seq=b"AC", orig_qual=b"II")
    assert passthrough_line(rec2) == "@r%0AAC%0A+%0AII"


def test_comment_field_illumina_detection():
    rec = AlnRec(name="r", aligned=True, comment=b"1:N:0:ATCACG")
    assert comment_field(rec) == "\tBC:Z:1:N:0:ATCACG"
    rec2 = AlnRec(name="r", aligned=True, comment=b"some free text")
    assert comment_field(rec2) == "\tsome free text"
    # odd control number -> not illumina
    rec3 = AlnRec(name="r", aligned=True, comment=b"1:N:1:ATCACG")
    assert comment_field(rec3) == "\t1:N:1:ATCACG"


def test_sam_record_extras_roundtrip():
    rec = AlnRec(name="r", aligned=True, fw=True, ref_id=0, pos=9,
                 score=-6, mapq=23, cigar="4M", md="2G1", nm=1, xm=1,
                 seq=b"ACGT", qual=b"IIII", orig_seq=b"ACGT",
                 orig_qual=b"IIII", comment=b"c1")
    line = sam_record(rec, ["chr"], xeq=True, append_comment=True,
                      show_rand_seed=True)
    fields = line.split("\t")
    assert fields[5] == "2=1X1="
    assert any(f.startswith("ZS:i:") for f in fields)
    assert fields[-1] == "c1"
    # ZS is the genRandSeed value of the read
    from bowtie2_server_tpu.utils import dna
    from bowtie2_server_tpu.utils.rng import gen_rand_seed
    want = gen_rand_seed(np.minimum(dna.encode(b"ACGT"), 4),
                         np.frombuffer(b"IIII", np.uint8), b"r")
    assert f"ZS:i:{want}" in line
