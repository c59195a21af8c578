"""-N 1 on the fused device pipeline: per-seed substitution branches via
the general shape (ref: aligner_seed.cpp:668 searchSeedBi with one
mismatch). Oracle: the host -N 1 path (forced via the timing hook) on the
same batch."""
import numpy as np
import pytest

from bowtie2_server_tpu.align.pipeline import SearchPolicy, UnpairedAligner
from bowtie2_server_tpu.index.build import build_index
from bowtie2_server_tpu.io.fastq import make_batch
from bowtie2_server_tpu.utils import dna


@pytest.fixture(scope="module")
def idx():
    rng = np.random.default_rng(21)
    ref = dna.decode(rng.integers(0, 4, 4000).astype(np.uint8))
    return build_index(f">r\n{ref}\n"), ref


def _reads(ref, rng, n=48, L=60):
    """Reads whose ONLY seed-findable hit needs an in-seed mismatch:
    mutate one base inside every seed window."""
    reads = []
    for _ in range(n):
        st = int(rng.integers(0, len(ref) - L))
        rd = bytearray(ref[st : st + L].encode())
        # one substitution at a position covered by the round-0 seeds
        p = int(rng.integers(2, 20))
        old = rd[p]
        rd[p] = ord("ACGT"[(("ACGT".index(chr(old))) + 1) % 4])
        reads.append((bytes(rd), st))
    return reads


def _key(r):
    return (r.aligned, r.fw, r.ref_id, r.pos, r.cigar, r.score, r.nm, r.md)


def test_n1_fused_matches_host(idx):
    index, ref = idx
    rng = np.random.default_rng(33)
    reads = _reads(ref, rng)
    b = make_batch([f"q{i}" for i in range(len(reads))],
                   [r for r, _ in reads], [b"I" * 60] * len(reads))
    pol = SearchPolicy(n_seed_mms=1)
    al_fused = UnpairedAligner(index, policy=pol)
    h = al_fused.collect_async(b)
    assert h[0] == "fused", "-N 1 should run the fused path now"
    recs_fused = al_fused.align_batch(b)

    al_host = UnpairedAligner(index, policy=pol)
    al_host.timing = {}   # forces the host collect path
    recs_host = al_host.align_batch(b)
    diffs = [(i, _key(recs_fused[i]), _key(recs_host[i]))
             for i in range(len(reads))
             if _key(recs_fused[i]) != _key(recs_host[i])]
    assert not diffs, diffs[:4]
    # and the reads actually need -N 1: all aligned with 1 mismatch
    n_al = sum(r.aligned for r in recs_fused)
    assert n_al >= len(reads) - 2
