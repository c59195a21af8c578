"""Long-read DP: a 5 kb gapped read aligns with bounded memory and the
exact expected CIGAR.

The reference switches to checkpointed "gather" fills for reads >=
--cp-min 2000 (aligner_swsse_ee_u8.cpp:295, sse_util.h:349 Checkpointer)
to bound backtrace memory to O(len * 2^-k). Our design bounds it
structurally: the device scores a fixed-width band (O(len * K)) and the
host traceback re-fills only that band — no full-matrix storage at any
read length.
"""
import numpy as np

from bowtie2_server_tpu.align.pipeline import UnpairedAligner
from bowtie2_server_tpu.index.build import build_index
from bowtie2_server_tpu.io.fastq import make_batch


def test_5kb_gapped_read_exact_cigar(tmp_path):
    rng = np.random.default_rng(17)
    bases = np.frombuffer(b"ACGT", np.uint8)
    g = rng.integers(0, 4, 60_000).astype(np.uint8)
    fa = tmp_path / "g.fa"
    s = bases[g].tobytes().decode()
    fa.write_text(">g\n" + "\n".join(s[i:i+70]
                                     for i in range(0, len(s), 70)) + "\n")
    idx = build_index(str(fa))

    start = 10_000
    p1 = g[start : start + 1500].copy()
    p2 = g[start + 1502 : start + 3502].copy()     # 2 bp deletion
    ins = rng.integers(0, 4, 3).astype(np.uint8)   # 3 bp insertion
    p3 = g[start + 3502 : start + 4997].copy()
    read = np.concatenate([p1, p2, ins, p3])
    assert len(read) == 4998
    # sprinkle 15 mismatches away from gap boundaries
    mm_pos = np.arange(100, 1400, 100)
    n_mm = 0
    for p in mm_pos:
        old = read[p]
        read[p] = (old + 1) % 4
        n_mm += 1

    al = UnpairedAligner(idx)
    batch = make_batch(["long1"], [bases[read].tobytes()],
                       [b"I" * len(read)])
    rec = al.align_batch(batch)[0]
    assert rec.aligned and rec.fw
    assert rec.pos == start
    assert rec.cigar == "1500M2D2000M3I1495M"
    # NM counts mismatches + gap bases (ref: sam.cpp NM definition);
    # the random insertion may coincide with the reference, but edits are
    # still edits in the reported alignment
    assert rec.nm == n_mm + 2 + 3
    assert rec.xo == 2 and rec.xg == 5
    # score: 15 mm at -6 (high qual), gaps -5-3*2 and -5-3*3
    assert rec.score == -(n_mm * 6) - 11 - 14


def test_dpad_widens_band_for_large_gaps(tmp_path):
    """--dpad > default widens the banded kernel so a gap exceeding the
    default band's reach aligns end-to-end (ref: --dpad maxhalf,
    dp_framer.cpp:95 rectangle reach). With the default policy the same
    read cannot bridge the 50 bp deletion (matching the reference's own
    default-width behavior)."""
    from dataclasses import replace

    from bowtie2_server_tpu.align.pipeline import (SearchPolicy,
                                                   band_for)
    from bowtie2_server_tpu.utils.scoring import Scoring
    from bowtie2_server_tpu.utils.simple_func import SimpleFunc

    assert band_for(15) == 64 and band_for(40) == 256

    rng = np.random.default_rng(23)
    bases = np.frombuffer(b"ACGT", np.uint8)
    g = rng.integers(0, 4, 30_000).astype(np.uint8)
    fa = tmp_path / "g.fa"
    s = bases[g].tobytes().decode()
    fa.write_text(">g\n" + s + "\n")
    idx = build_index(str(fa))
    # 400bp read with a 50bp deletion in the middle
    start = 5_000
    read = np.concatenate([g[start : start + 200],
                           g[start + 250 : start + 450]])
    b = make_batch(["lr"], [bases[read].tobytes()], [b"I" * len(read)])
    # permissive min score so the gap penalty is affordable
    sc = replace(Scoring.default_e2e(),
                 score_min=SimpleFunc.parse("L,-1,-1.5"))
    wide = UnpairedAligner(idx, scoring=sc,
                           policy=SearchPolicy(maxhalf=40))
    assert wide.band == 256
    rec = wide.align_batch(b)[0]
    assert rec.aligned and rec.cigar == "200M50D200M", rec.cigar
    assert rec.pos == start
