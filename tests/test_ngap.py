"""N-leeway rectangle framing: reads spanning short reference N gaps
(ref: dp_framer.cpp:108-114 frameSeedExtensionRect N leeway; golden
values below verified against the reference server+client binaries on
this exact fixture, 2026-08-21: pos 171 (1-based), 60M, AS:i:-3, XN:i:3,
XM:i:3, NM:i:3, MD:Z:30N0N0N27, MAPQ 42)."""
import numpy as np
import pytest

from bowtie2_server_tpu.align.pipeline import UnpairedAligner
from bowtie2_server_tpu.index.build import build_index
from bowtie2_server_tpu.io.fastq import make_batch
from bowtie2_server_tpu.utils import dna


@pytest.fixture(scope="module")
def ngap_parts():
    rng = np.random.default_rng(3)
    a = dna.decode(rng.integers(0, 4, 200).astype(np.uint8))
    b = dna.decode(rng.integers(0, 4, 200).astype(np.uint8))
    return a, b


def test_read_spans_short_n_gap(ngap_parts):
    a, b = ngap_parts
    idx = build_index(f">r1\n{a}NNN{b}\n")
    read = a[-30:] + "NNN" + b[:27]
    al = UnpairedAligner(idx)
    r = al.align_batch(make_batch(["span"], [read.encode()],
                                  [b"I" * 60]))[0]
    assert r.aligned
    assert r.pos == 170          # 0-based (reference SAM POS 171)
    assert r.cigar == "60M"
    assert r.score == -3
    assert r.xn == 3 and r.xm == 3 and r.nm == 3
    assert r.md == "30N0N0N27"
    assert r.mapq == 42


def test_gap_beyond_nceil_rejected(ngap_parts):
    """A gap wider than nceil (0.15*60 = 9) cannot be spanned."""
    a, b = ngap_parts
    gap = "N" * 14
    idx = build_index(f">r1\n{a}{gap}{b}\n")
    read = a[-30:] + gap + b[:16]
    al = UnpairedAligner(idx)
    r = al.align_batch(make_batch(["span"], [read.encode()],
                                  [b"I" * len(read)]))[0]
    # the read itself carries 14 Ns > nceil -> N-filtered entirely
    assert not r.aligned


def test_read_near_gap_stays_within_run(ngap_parts):
    """A read close to (but not over) the gap still aligns exactly."""
    a, b = ngap_parts
    idx = build_index(f">r1\n{a}NNN{b}\n")
    read = a[-60:]
    al = UnpairedAligner(idx)
    r = al.align_batch(make_batch(["edge"], [read.encode()],
                                  [b"I" * 60]))[0]
    assert r.aligned and r.pos == 140 and r.cigar == "60M" and r.nm == 0
