"""-M sampling, -a unbounded enumeration, and preset DPS consumption
(ref: aln_sink.h:214 ReportingParams, aln_sink.cpp:271 EXIT_SHORT_CIRCUIT_M,
presets.cpp:26 DPS=)."""
import numpy as np
import pytest

from bowtie2_server_tpu.align.pipeline import (ALL_HITS, SearchPolicy,
                                               UnpairedAligner)
from bowtie2_server_tpu.index.build import build_index
from bowtie2_server_tpu.io.fastq import make_batch
from bowtie2_server_tpu.utils import dna

# repetitive synthetic genome: many copies of one 40-mer with unique spacers
np.random.seed(4242)
UNIT = dna.decode(np.random.randint(0, 4, 40).astype(np.uint8))
N_COPIES = 520   # above the old hard cap of 500 -a records


@pytest.fixture(scope="module")
def rep_idx():
    parts = []
    for _ in range(N_COPIES):
        parts.append(UNIT)
        parts.append(dna.decode(np.random.randint(0, 4, 25).astype(np.uint8)))
    return build_index(f">rep\n{''.join(parts)}\n")


def _align_one(idx, pol):
    al = UnpairedAligner(idx, policy=pol)
    b = make_batch(["r0"], [UNIT.encode()], [b"I" * len(UNIT)])
    return al.align_batch(b)


def test_m_sampling_flags_repetitive(rep_idx):
    pol = SearchPolicy(mhits=5, msample=True, khits=1)
    recs = _align_one(rep_idx, pol)
    assert len(recs) == 1
    r = recs[0]
    assert r.aligned and r.ym          # maxed under -M
    assert r.mapq <= 1                 # many equal-best copies
    # the reported copy must be one of the planted ones
    assert r.cigar == "40M" and r.nm == 0


def test_m_suppresses_extra_records(rep_idx):
    # khits > 1 with -M exceeded -> exactly 1 record (aln_sink.cpp:273)
    pol = SearchPolicy(mhits=5, msample=True, khits=3)
    recs = _align_one(rep_idx, pol)
    assert len(recs) == 1 and recs[0].ym


def test_m_sampling_deterministic(rep_idx):
    pol = SearchPolicy(mhits=5, msample=True, khits=1)
    p1 = _align_one(rep_idx, pol)[0].pos
    p2 = _align_one(rep_idx, pol)[0].pos
    assert p1 == p2    # per-read LCG, not global state


def test_all_hits_enumerates_beyond_500(rep_idx):
    pol = SearchPolicy(khits=ALL_HITS, mhits=0, msample=False)
    recs = _align_one(rep_idx, pol)
    aligned = [r for r in recs if r.aligned]
    assert len(aligned) == N_COPIES
    # exactly one primary; the rest secondary with MAPQ 255
    prim = [r for r in aligned if not r.secondary]
    assert len(prim) == 1
    assert all(r.mapq == 255 for r in aligned if r.secondary)
    assert len({r.pos for r in aligned}) == N_COPIES


def test_preset_dps_consumed():
    from bowtie2_server_tpu.utils.presets import (apply_policy_string,
                                                  preset_params)
    sc, pol = preset_params("very-fast", False)
    assert pol["dp_streak"] == 5
    assert SearchPolicy(**pol).dp_streak == 5
    _, pol2 = apply_policy_string("DPS=7", sc, dict(pol))
    assert pol2["dp_streak"] == 7
