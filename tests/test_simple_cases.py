"""Table-driven hand-crafted alignment cases (the analog of the reference's
scripts/test/simple_tests.pl tier, SURVEY §4.1): each case builds a tiny
index inline, aligns the given reads, and asserts exact positions, CIGARs,
flags, and tags.
"""
import numpy as np
import pytest

from bowtie2_server_tpu.align.paired import PairedAligner
from bowtie2_server_tpu.align.pipeline import SearchPolicy, UnpairedAligner
from bowtie2_server_tpu.index.build import build_index
from bowtie2_server_tpu.utils import dna
from bowtie2_server_tpu.utils.presets import preset_params
from bowtie2_server_tpu.utils.scoring import Scoring

REF60 = "AGCTTAGCTAGCTACGGAGCTTATTCGATCGGACTGCAAGTACCTGCATTACGGTCAGAT"
# embed the 60-mer in unique 240bp context
np.random.seed(99)
PAD1 = dna.decode(np.random.randint(0, 4, 90).astype(np.uint8))
PAD2 = dna.decode(np.random.randint(0, 4, 90).astype(np.uint8))
REF = PAD1 + REF60 + PAD2

CASES = [
    # (name, read builder, expected dict)
    ("exact_fw", lambda: REF[100:140],
     dict(aligned=True, fw=True, pos=100, cigar="40M", score=0, nm=0)),
    ("exact_rc", lambda: dna.decode(dna.revcomp(dna.encode(REF[100:140]))),
     dict(aligned=True, fw=False, pos=100, cigar="40M", score=0)),
    ("one_mismatch", lambda: REF[100:120] + ("A" if REF[120] != "A" else "C")
     + REF[121:140],
     dict(aligned=True, pos=100, cigar="40M", nm=1, xm=1)),
    # indels placed at read pos 25 so the round-0 seed at offset 0 is clean
    # (a centered indel kills every default seed — the reference fails such
    # reads too, see the seed-gating analysis in align/pipeline.py)
    ("one_del", lambda: REF[100:125] + REF[126:141],
     dict(aligned=True, pos=100, cigar="25M1D15M", nm=1, xo=1, xg=1,
          score=-8)),
    ("one_ins", lambda: REF[100:125] + ("A" if REF[125] != "A" else "C")
     + REF[125:139],
     dict(aligned=True, pos=100, cigar="25M1I14M", nm=1, xo=1, xg=1,
          score=-8)),
    ("n_in_read", lambda: REF[100:115] + "N" + REF[116:140],
     dict(aligned=True, pos=100, cigar="40M", score=-1, xm=1)),
    ("too_many_ns", lambda: ("N" * 30).join(["", ""]) + REF[100:110],
     dict(aligned=False)),
    ("no_match", lambda: "A" * 40,
     dict(aligned=False)),
    ("read_at_start", lambda: REF[0:40],
     dict(aligned=True, pos=0, cigar="40M")),
    ("read_at_end", lambda: REF[-40:],
     dict(aligned=True, pos=len(REF) - 40, cigar="40M")),
]


@pytest.fixture(scope="module")
def idx():
    return build_index(f">tiny\n{REF}\n")


@pytest.fixture(scope="module")
def aligner(idx):
    return UnpairedAligner(idx, engine="xla")


@pytest.mark.parametrize(
    "case", [c for c in CASES if c is not None], ids=lambda c: c[0])
def test_simple_unpaired(aligner, case):
    from bowtie2_server_tpu.io.fastq import make_batch
    name, mk, exp = case
    seq = mk()
    b = make_batch([name], [seq.encode()], [b"I" * len(seq)])
    rec = aligner.align_batch(b)[0]
    assert rec.aligned == exp["aligned"], f"{name}: aligned={rec.aligned}"
    for k, v in exp.items():
        if k == "aligned":
            continue
        assert getattr(rec, k) == v, f"{name}: {k}={getattr(rec, k)} != {v}"


def test_simple_local_softclip(idx):
    from bowtie2_server_tpu.io.fastq import make_batch
    sc, polkw = preset_params(None, True)
    al = UnpairedAligner(idx, scoring=sc, policy=SearchPolicy(**polkw),
                         engine="xla")
    junk = "ACGT" * 3
    seq = junk + REF[100:140]  # 12 junk + 40 real
    b = make_batch(["clip"], [seq.encode()], [b"I" * len(seq)])
    rec = al.align_batch(b)[0]
    assert rec.aligned and rec.pos == 100
    assert rec.cigar in ("12S40M",), rec.cigar
    assert rec.score == 80  # 40 matches x2


def test_simple_multi_ref():
    from bowtie2_server_tpu.io.fastq import make_batch
    r1 = dna.decode(np.random.RandomState(1).randint(0, 4, 150).astype(np.uint8))
    r2 = dna.decode(np.random.RandomState(2).randint(0, 4, 150).astype(np.uint8))
    idx = build_index(f">c1\n{r1}\n>c2\n{r2}\n")
    al = UnpairedAligner(idx, engine="xla")
    b = make_batch(["a", "b"],
                   [r1[40:90].encode(), r2[100:140].encode()],
                   [b"I" * 50, b"I" * 40])
    recs = al.align_batch(b)
    assert recs[0].ref_id == 0 and recs[0].pos == 40
    assert recs[1].ref_id == 1 and recs[1].pos == 100
    # a read must not align across the reference boundary
    straddle = (r1[-20:] + r2[:20]).encode()
    b2 = make_batch(["s"], [straddle], [b"I" * 40])
    assert not al.align_batch(b2)[0].aligned


def test_simple_paired_concordant(idx):
    from bowtie2_server_tpu.io.fastq import make_batch
    m1 = REF[60:100]
    m2 = dna.decode(dna.revcomp(dna.encode(REF[160:200])))
    pal = PairedAligner(idx, engine="xla")
    b1 = make_batch(["p"], [m1.encode()], [b"I" * 40])
    b2 = make_batch(["p"], [m2.encode()], [b"I" * 40])
    r1, r2 = pal.align_batch(b1, b2)[0]
    assert r1.aligned and r2.aligned
    assert r1.proper and r2.proper and r1.yt == "CP"
    assert r1.pos == 60 and r2.pos == 160
    assert r1.tlen == 140 and r2.tlen == -140
    assert r1.ys == r2.score and r2.ys == r1.score


def test_simple_paired_mate_rescue(idx):
    """Mate 2 made unfindable by seeds (mismatch every 12 bp) but within
    rescue range -> concordant via rescue DP."""
    from bowtie2_server_tpu.io.fastq import make_batch
    m1 = REF[60:100]
    m2raw = list(REF[160:200])
    for p in range(3, 40, 12):
        m2raw[p] = "ACGT"[("ACGT".index(m2raw[p]) + 1) % 4]
    m2 = dna.decode(dna.revcomp(dna.encode("".join(m2raw))))
    pal = PairedAligner(idx, engine="xla")
    b1 = make_batch(["p"], [m1.encode()], [b"I" * 40])
    b2 = make_batch(["p"], [m2.encode()], [b"I" * 40])
    r1, r2 = pal.align_batch(b1, b2)[0]
    assert r1.aligned and r2.aligned and r1.proper, (r1, r2)
    assert r2.pos == 160 and r2.xm == 4


def test_simple_paired_discordant_orientation(idx):
    """Both mates unique but same orientation -> discordant (YT:Z:DP)."""
    from bowtie2_server_tpu.io.fastq import make_batch
    m1 = REF[60:100]
    m2 = REF[160:200]  # same strand as m1 -> FF, not FR
    pal = PairedAligner(idx, engine="xla")
    b1 = make_batch(["p"], [m1.encode()], [b"I" * 40])
    b2 = make_batch(["p"], [m2.encode()], [b"I" * 40])
    r1, r2 = pal.align_batch(b1, b2)[0]
    assert r1.aligned and r2.aligned
    assert not r1.proper and r1.yt == "DP" and r2.yt == "DP"


def test_qseq_input(tmp_path, lambda_fasta):
    """--qseq parsing: 11 tab fields, '_'-joined name + /mate, '.'->N,
    filter flag (ref: read_qseq.cpp:52-240)."""
    from bowtie2_server_tpu.io.fastq import iter_qseq
    q = tmp_path / "r.qseq"
    q.write_text(
        "M1\t42\t3\t7\t100\t200\tACGT\t1\tAC.T\tIIII\t1\n"
        "M1\t42\t3\t7\t100\t201\tACGT\t1\tGGGG\tIIII\t0\n")
    batches = list(iter_qseq(str(q)))
    assert len(batches) == 1
    b = batches[0]
    assert b.names == ["M1_42_3_7_100_200_ACGT/1", "M1_42_3_7_100_201_ACGT/1"]
    assert bytes(b.raw_seq[0]) == b"AC.T".replace(b".", b"N")
    assert b.qc_fail.tolist() == [False, True]
    # encoded N at the '.' position
    assert b.seqs[0, 2] > 3


def test_fasta_continuous_windows(tmp_path):
    """-F k:<len>,i:<ivl> cuts the FASTA into windows named
    <seq>_<offset> (ref: pat.h:956 FastaContinuousPatternSource)."""
    from bowtie2_server_tpu.io.fastq import iter_fasta_continuous
    fa = tmp_path / "g.fa"
    fa.write_text(">s1\nACGTACGTAC\n>s2\nTTTTTT\n")
    batches = list(iter_fasta_continuous(str(fa), length=6, freq=2))
    names = [n for b in batches for n in b.names]
    seqs = [s for b in batches for s in b.raw_seq]
    assert names == ["s1_0", "s1_2", "s1_4", "s2_0"]
    assert seqs[0] == b"ACGTAC" and seqs[1] == b"GTACGT"
    assert seqs[3] == b"TTTTTT"


def test_qc_filter_marks_yf_qc(tmp_path):
    """--qc-filter: qseq filter-flag-0 reads are excluded from alignment
    and emitted unaligned with YF:Z:QC (ref: bt2_search.cpp qcFilter,
    AlnFlags qcfilt)."""
    import numpy as np
    from bowtie2_server_tpu.align.pipeline import UnpairedAligner
    from bowtie2_server_tpu.index.build import build_index
    from bowtie2_server_tpu.io.fastq import make_batch
    from bowtie2_server_tpu.io.sam import sam_record

    rng = np.random.default_rng(9)
    bases = np.frombuffer(b"ACGT", np.uint8)
    g = rng.integers(0, 4, 5000).astype(np.uint8)
    fa = tmp_path / "g.fa"
    s = bases[g].tobytes().decode()
    fa.write_text(">g\n" + "\n".join(s[i:i+70]
                                     for i in range(0, len(s), 70)) + "\n")
    idx = build_index(str(fa))
    rd = bases[g[100:170]].tobytes()
    batch = make_batch(["a", "b"], [rd, rd], [b"I" * 70, b"I" * 70])
    batch.qc_fail = np.array([False, True])
    al = UnpairedAligner(idx)
    al.qc_filter = True
    recs = al.align_batch(batch)
    assert recs[0].aligned and recs[0].pos == 100
    assert not recs[1].aligned and recs[1].filtered
    assert "YF:Z:QC" in sam_record(recs[1], idx.ref_names)
