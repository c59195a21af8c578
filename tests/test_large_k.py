"""Large -k on the fused device path, unbounded -a enumeration, and
big-mode capacity degradation (round-5 escape hatches; ref: -k/-a
semantics aln_sink.h:264-288)."""
import numpy as np
import pytest

from bowtie2_server_tpu.align.pipeline import (ALL_HITS, SearchPolicy,
                                               UnpairedAligner)
from bowtie2_server_tpu.index.build import build_index
from bowtie2_server_tpu.io.fastq import make_batch
from bowtie2_server_tpu.utils import dna


@pytest.fixture(scope="module")
def rep_index():
    """A 60-mer planted 40 times in random background."""
    rng = np.random.default_rng(11)
    unit = dna.decode(rng.integers(0, 4, 60).astype(np.uint8))
    parts = []
    for _ in range(40):
        parts.append(dna.decode(rng.integers(0, 4, 50).astype(np.uint8)))
        parts.append(unit)
    return build_index(">rep\n" + "".join(parts) + "\n"), unit


def _positions(recs):
    return sorted((r.pos, r.fw) for r in recs if r.aligned)


def test_k100_fused_matches_host(rep_index):
    idx, unit = rep_index
    pol = SearchPolicy(khits=100, mhits=0, msample=False)
    batch = make_batch(["r"], [unit.encode()], [b"I" * 60])

    al_f = UnpairedAligner(idx, policy=pol, engine="xla")
    assert al_f.candgen is not None
    out_f = al_f.align_batch(batch)

    al_h = UnpairedAligner(idx, policy=pol, engine="xla")
    al_h.candgen = None            # force the host path
    out_h = al_h.align_batch(batch)

    # all 40 copies found on both paths, identical position sets
    assert len(_positions(out_f)) == 40
    assert _positions(out_f) == _positions(out_h)
    # primary + 39 secondary on both
    assert sum(1 for r in out_f if r.aligned and not r.secondary) == 1
    assert sum(1 for r in out_h if r.aligned and not r.secondary) == 1


def test_all_hits_unbounded(rep_index):
    """-a enumerates EVERY copy even past the old per-range cap (the
    chunked resolve; ref: the reference's unbounded -a, aln_sink.h:288)."""
    idx, unit = rep_index
    pol = SearchPolicy(khits=ALL_HITS, mhits=0, msample=False)
    al = UnpairedAligner(idx, policy=pol, engine="xla")
    out = al.align_batch(make_batch(["r"], [unit.encode()], [b"I" * 60]))
    assert len(_positions(out)) == 40


def test_big_mode_degrades_instead_of_raising():
    """A uniformly repetitive big-mode batch overflows the 16x fused
    capacities; the aligner must split the batch and finish, not raise
    (round-3/4 task: RuntimeError at 16x -> graceful degradation)."""
    rng = np.random.default_rng(5)
    unit = dna.decode(rng.integers(0, 4, 25).astype(np.uint8))
    genome = unit * 48                     # 25-mer x48: every seed ~48 hits
    idx = build_index(">u\n" + genome + "\n")
    al = UnpairedAligner(idx, force_big=True)
    # every read identical and maximally repetitive: per-read candidate
    # demand stays constant as the batch splits, so capacity/read grows
    # once B reaches the static floors and the retry succeeds
    B = 512
    read = (unit * 4).encode()             # 100 bp, ~16 seeds, all maximal
    batch = make_batch([f"q{i}" for i in range(B)],
                       [read] * B, [b"I" * 100] * B)
    recs = al.align_batch(batch)
    from bowtie2_server_tpu.align.pipeline import ConcatRecs
    assert isinstance(recs, ConcatRecs), \
        "expected the capacity-degradation split path to trigger"
    assert len(recs) == B
    assert recs.n_aligned() == B
