"""Paired-end parity vs reference output (first 300 pairs of the bundled
example), plus unit tests of the pair classification port."""
from pathlib import Path

import numpy as np
import pytest

from bowtie2_server_tpu.align.paired import (CONCORDANT, DISCORDANT,
                                             PairedPolicy)

DATA = Path(__file__).parent / "data"
FIELDS = ["flag", "pos", "mapq", "cigar", "rnext", "pnext", "tlen",
          "AS", "NM", "MD", "YS", "YT"]


def test_classify_fr_normal():
    pe = PairedPolicy()
    # mate1 fw at 100, mate2 rc at 300, frag 400 <= 500
    assert pe.classify(100, 100, True, 300, 100, False) == CONCORDANT
    # same orientation -> discordant
    assert pe.classify(100, 100, True, 300, 100, True) == DISCORDANT
    # too far
    assert pe.classify(100, 100, True, 700, 100, False) == DISCORDANT
    # wrong relative order (rc mate left, no overlap)
    assert pe.classify(300, 100, True, 100, 100, False) == DISCORDANT
    # containment allowed by default, but the dovetail check still runs
    # after it (pe.cpp:128-134): end-flush containment is concordant,
    # while the left mate's end overhang PAST the contained mate is
    # dovetailing -> discordant (verified against the reference binary on
    # the pe_containment simple-tier case)
    assert pe.classify(100, 200, True, 250, 50, False) == CONCORDANT
    assert pe.classify(100, 200, True, 150, 50, False) == DISCORDANT
    # a start-side inversion within containment is dovetail too
    assert pe.classify(100, 200, False, 101, 50, True) == DISCORDANT
    # dovetail NOT allowed by default
    assert pe.classify(100, 100, True, 90, 100, False) == DISCORDANT


def _parse(path, server=False):
    recs = {}
    for line in Path(path).read_text().splitlines():
        if line.startswith("@"):
            continue
        f = line.split("\t")
        name = f[0].split("/")[0] if server else f[0]
        flag = int(f[1])
        mate = 1 if flag & 0x40 else 2
        tags = {t.split(":")[0]: t.split(":", 2)[2] for t in f[11:]}
        recs[(name, mate)] = dict(
            flag=flag, pos=int(f[3]), mapq=int(f[4]), cigar=f[5],
            rnext=f[6], pnext=int(f[7]), tlen=int(f[8]),
            AS=tags.get("AS"), NM=tags.get("NM"), MD=tags.get("MD"),
            YS=tags.get("YS"), YT=tags.get("YT"))
    return recs


def test_paired_parity_lambda():
    from bowtie2_server_tpu.align.paired import PairedAligner
    from bowtie2_server_tpu.index.build import build_index
    from bowtie2_server_tpu.io.fastq import iter_fastq
    from bowtie2_server_tpu.io.sam import sam_record
    idx = build_index("/root/reference/example/reference/lambda_virus.fa")
    pal = PairedAligner(idx, engine="xla")
    b1 = next(iter_fastq(DATA / "reads1_300.fq", batch_size=300))
    b2 = next(iter_fastq(DATA / "reads2_300.fq", batch_size=300))
    pairs = pal.align_batch(b1, b2)
    mine = {}
    for r1, r2 in pairs:
        for r in (r1, r2):
            f = sam_record(r, idx.ref_names).split("\t")
            tags = {t.split(":")[0]: t.split(":", 2)[2] for t in f[11:]}
            mine[(f[0], 1 if int(f[1]) & 0x40 else 2)] = dict(
                flag=int(f[1]), pos=int(f[3]), mapq=int(f[4]), cigar=f[5],
                rnext=f[6], pnext=int(f[7]), tlen=int(f[8]),
                AS=tags.get("AS"), NM=tags.get("NM"), MD=tags.get("MD"),
                YS=tags.get("YS"), YT=tags.get("YT"))
    golden = _parse(DATA / "golden_paired_600.sam", server=True)
    assert set(golden) == set(mine)
    full = sum(all(golden[k][f] == mine[k][f] for f in FIELDS)
               for k in golden)
    assert full >= 0.98 * len(golden), f"only {full}/{len(golden)}"


def test_paired_local_parity_lambda():
    from bowtie2_server_tpu.align.paired import PairedAligner
    from bowtie2_server_tpu.align.pipeline import SearchPolicy
    from bowtie2_server_tpu.index.build import build_index
    from bowtie2_server_tpu.io.fastq import iter_fastq
    from bowtie2_server_tpu.io.sam import sam_record
    from bowtie2_server_tpu.utils.presets import preset_params
    idx = build_index("/root/reference/example/reference/lambda_virus.fa")
    sc, polkw = preset_params(None, True)
    pal = PairedAligner(idx, scoring=sc, policy=SearchPolicy(**polkw),
                        engine="xla")
    b1 = next(iter_fastq(DATA / "reads1_300.fq", batch_size=300))
    b2 = next(iter_fastq(DATA / "reads2_300.fq", batch_size=300))
    pairs = pal.align_batch(b1, b2)
    mine = {}
    for r1, r2 in pairs:
        for r in (r1, r2):
            f = sam_record(r, idx.ref_names).split("\t")
            tags = {t.split(":")[0]: t.split(":", 2)[2] for t in f[11:]}
            mine[(f[0], 1 if int(f[1]) & 0x40 else 2)] = dict(
                flag=int(f[1]), pos=int(f[3]), mapq=int(f[4]), cigar=f[5],
                rnext=f[6], pnext=int(f[7]), tlen=int(f[8]),
                AS=tags.get("AS"), NM=tags.get("NM"), MD=tags.get("MD"),
                YS=tags.get("YS"), YT=tags.get("YT"))
    golden = _parse(DATA / "golden_paired_local_600.sam", server=True)
    assert set(golden) == set(mine)
    full = sum(all(golden[k][f] == mine[k][f] for f in FIELDS)
               for k in golden)
    # paired local currently ~97% on the full set; assert a safe floor
    assert full >= 0.94 * len(golden), f"only {full}/{len(golden)}"


def test_refinish_keeps_seq_orientation():
    """A record finished twice (paired combo retry path) must not
    double-reverse-complement SEQ/QUAL (regression: _finish used to mutate
    rec.seq in place)."""
    from bowtie2_server_tpu.align.pipeline import UnpairedAligner
    from bowtie2_server_tpu.index.build import build_index
    from bowtie2_server_tpu.io.fastq import make_batch
    from bowtie2_server_tpu.utils import dna

    rng = np.random.default_rng(7)
    g = rng.integers(0, 4, 2000).astype(np.uint8)
    idx = build_index(">r\n" + dna.decode(g) + "\n")
    # a reverse-strand read
    rd = dna.revcomp(g[500:600])
    seq = dna.decode(rd).encode()
    batch = make_batch(["q"], [seq], [b"I" * 100])
    al = UnpairedAligner(idx, engine="xla")
    st = al.collect(batch)
    scored = al.scored_candidates(st, 0)
    assert scored
    bsc, ci = scored[0]
    ok = al.finish_candidate(st, 0, ci, bsc, None)
    assert ok and not st.recs[0].fw
    seq_once, qual_once = st.recs[0].seq, st.recs[0].qual
    # finishing again (as _decide does after a rejected combo) must
    # reproduce the same aligned-strand SEQ, not RC it back
    ok = al.finish_candidate(st, 0, ci, bsc, None)
    assert ok
    assert st.recs[0].seq == seq_once
    assert st.recs[0].qual == qual_once
    assert st.recs[0].seq == dna.decode(dna.revcomp(dna.encode(seq))).encode()


def test_classify_batch_matches_scalar():
    import numpy as np
    from bowtie2_server_tpu.align.paired import CONCORDANT, PairedPolicy
    rng = np.random.default_rng(7)
    for pol in ("FR", "RF", "FF", "RR"):
        for dove, olap, cont in ((False, True, True), (True, True, True),
                                 (False, False, True), (False, True, False)):
            pe = PairedPolicy(pol=pol, minfrag=10, maxfrag=300,
                              dovetail_ok=dove, olap_ok=olap,
                              contain_ok=cont)
            n = 400
            o1 = rng.integers(0, 500, n)
            o2 = o1 + rng.integers(-350, 350, n)
            l1 = rng.integers(30, 150, n)
            l2 = rng.integers(30, 150, n)
            f1 = rng.random(n) < 0.5
            f2 = rng.random(n) < 0.5
            vec = pe.classify_batch(o1, l1, f1, o2, l2, f2)
            for t in range(n):
                want = pe.classify(int(o1[t]), int(l1[t]), bool(f1[t]),
                                   int(o2[t]), int(l2[t]),
                                   bool(f2[t])) == CONCORDANT
                assert bool(vec[t]) == want, (pol, dove, olap, cont, t)
