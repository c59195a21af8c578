"""Big-index (.bt2l-scale) device path: uint32 rows, sampled-SA walk-left
resolution, biased diagonals (ref: the reference's -l build line —
btypes.h TIndexOffU, Makefile:239-246, bt2_idx.h:544 with
BOWTIE_64BIT_INDEX; walkLeft/getOffset bt2_idx.h:1607/1612).

The big path's correctness oracle is the small path over the SAME index
(force_big=True): identical inputs must produce identical SAM fields.
A true >2^31 bp genome run is exercised by scripts/bench_big_index.py on
real hardware (see docs/BIGINDEX.md); these tests keep the big code path
covered on every CI run.
"""
import numpy as np
import pytest

from bowtie2_server_tpu.align.pipeline import SearchPolicy, UnpairedAligner
from bowtie2_server_tpu.index.build import build_index
from bowtie2_server_tpu.io.fastq import iter_fastq, make_batch
from bowtie2_server_tpu.ops import fm as dfm


@pytest.fixture(scope="module")
def lambda_idx():
    return build_index("/root/reference/example/reference/lambda_virus.fa")


def test_resolve_rows_matches_full_sa(lambda_idx):
    """Device walk-left over the sampled SA reproduces the full SA."""
    import jax.numpy as jnp
    d = lambda_idx.fw
    fm_small = dfm.to_device(d, big=False)
    fm_big = dfm.to_device(d, big=True)
    assert fm_big.off_rate == dfm.OFF_RATE_BIG
    rng = np.random.default_rng(7)
    rows = rng.integers(0, d.n, 4096).astype(np.uint32)
    got = np.asarray(dfm.resolve_rows_body(
        fm_big, jnp.asarray(rows), jnp.ones(len(rows), bool),
        fm_big.off_rate))
    want = np.asarray(fm_small.sa)[rows]
    assert (got == want).all()


def test_big_path_equals_small_path_lambda(lambda_idx):
    al_small = UnpairedAligner(lambda_idx)
    al_big = UnpairedAligner(lambda_idx, force_big=True)
    assert al_big.big and not al_small.big
    ndiff = 0
    for batch in iter_fastq("/root/reference/example/reads/longreads.fq",
                            batch_size=512, upto=512):
        rs = al_small.align_batch(batch)
        rb = al_big.align_batch(batch)
        for i in range(len(batch)):
            a, b = rs[i], rb[i]
            ka = (a.aligned, a.fw, a.ref_id, a.pos, a.cigar, a.score,
                  a.mapq, a.md, a.nm)
            kb = (b.aligned, b.fw, b.ref_id, b.pos, b.cigar, b.score,
                  b.mapq, b.md, b.nm)
            ndiff += ka != kb
    assert ndiff == 0


def test_big_path_multi_ref_boundaries():
    """Run-boundary (rect) candidates and multi-reference coordinates
    survive the biased-diagonal arithmetic."""
    rng = np.random.default_rng(11)
    bases = "ACGT"
    refs = []
    for r in range(3):
        refs.append("".join(bases[c] for c in rng.integers(0, 4, 400)))
    fa = "".join(f">r{i}\n{s}\n" for i, s in enumerate(refs))
    idx = build_index(fa)
    al = UnpairedAligner(idx, force_big=True)
    # reads: interior of each ref + one at a reference start/end
    reads = [refs[0][100:140], refs[1][10:50], refs[2][360:400],
             refs[1][0:40]]
    b = make_batch([f"q{i}" for i in range(len(reads))],
                   [s.encode() for s in reads],
                   [b"I" * 40] * len(reads))
    recs = al.align_batch(b)
    exp = [(0, 100), (1, 10), (2, 360), (1, 0)]
    for i, (rid, pos) in enumerate(exp):
        r = recs[i]
        assert r.aligned and (r.ref_id, r.pos) == (rid, pos), \
            (i, r.ref_id, r.pos)
        assert r.cigar == "40M" and r.nm == 0


@pytest.mark.slow
def test_big_index_past_int32():
    """A joined text just past 2^31 bp aligns correctly on the big path —
    the int32 row/offset overflow regime (slow tier: ~10 min build)."""
    n = (1 << 31) + (1 << 20)
    rng = np.random.default_rng(3)
    g = rng.integers(0, 4, n).astype(np.uint8)
    from bowtie2_server_tpu.index.build import _build_direction, \
        suffix_array
    from bowtie2_server_tpu.index.fm import FmIndex
    # build only what the fused big path needs (fw + mirror)
    sa = suffix_array(g)
    fw = _build_direction(g, sa)
    del sa
    rev = g[::-1].copy()
    sar = suffix_array(rev)
    mirror = _build_direction(rev, sar)
    del sar, rev
    idx = FmIndex(
        fw=fw, mirror=mirror, joined=g,
        run_joined_start=np.array([0], np.int64),
        run_ref_id=np.array([0], np.int32),
        run_ref_off=np.array([0], np.int64),
        ref_full=g, ref_full_start=np.array([0], np.int64),
        ref_lens=np.array([n], np.int64), ref_names=["big"])
    al = UnpairedAligner(idx)
    assert al.big
    # reads planted across the whole range, incl. beyond 2^31
    starts = np.concatenate([
        rng.integers(0, n - 150, 64),
        rng.integers((1 << 31) - 1000, n - 150, 64)]).astype(np.int64)
    reads = [g[s : s + 100] for s in starts]
    bases = np.frombuffer(b"ACGT", np.uint8)
    b = make_batch([f"p{i}" for i in range(len(starts))],
                   [bases[r].tobytes() for r in reads],
                   [b"I" * 100] * len(starts))
    recs = al.align_batch(b)
    n_exact = 0
    for i, s in enumerate(starts):
        r = recs[i]
        assert r.aligned, i
        if r.score == 0:
            n_exact += 1
            assert r.pos == s, (i, r.pos, s)
    assert n_exact >= len(starts) - 2   # random dup tolerance
