"""Randomized differential tier (ref: scripts/sim/ Sim.pm + AlignmentCheck):
simulate reads from a random genome, align, and independently re-validate
every emitted record's AS/NM/XM/MD against the genome; also check that
high-quality simulated reads recover their true positions."""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))


@pytest.mark.parametrize("local", [False, True], ids=["e2e", "local"])
def test_random_genome_roundtrip(tmp_path, local, rng):
    from scripts.sam_validate import validate_record
    from bowtie2_server_tpu.align.pipeline import SearchPolicy, UnpairedAligner
    from bowtie2_server_tpu.index.build import build_index
    from bowtie2_server_tpu.io.fastq import make_batch
    from bowtie2_server_tpu.io.sam import sam_record
    from bowtie2_server_tpu.utils import dna
    from bowtie2_server_tpu.utils.presets import preset_params
    from bowtie2_server_tpu.utils.scoring import Scoring

    g = rng.integers(0, 4, 60_000).astype(np.uint8)
    fasta = ">rg\n" + dna.decode(g) + "\n"
    idx = build_index(fasta)
    sc, polkw = preset_params(None, local)
    al = UnpairedAligner(idx, scoring=sc, policy=SearchPolicy(**polkw),
                         engine="xla")
    B, L = 300, 90
    names, seqs, quals, truth = [], [], [], []
    for i in range(B):
        s = int(rng.integers(0, len(g) - L))
        rd = g[s : s + L].copy()
        nmut = int(rng.integers(0, 3))
        for _ in range(nmut):
            rd[rng.integers(0, L)] = rng.integers(0, 4)
        if rng.random() < 0.5:
            rd = dna.revcomp(rd)
        names.append(f"s{i}")
        seqs.append(dna.decode(rd).encode())
        quals.append(b"I" * L)
        truth.append(s)
    recs = al.align_batch(make_batch(names, seqs, quals))
    refs = {"rg": g}
    n_badpos = n_invalid = 0
    for rec, s in zip(recs, truth):
        assert rec.aligned, rec.name
        # local mode may soft-clip mutated read ends, legitimately shifting
        # POS; compare the unclipped start instead
        import re
        m = re.match(r"(\d+)S", rec.cigar)
        lead = int(m.group(1)) if m else 0
        if rec.pos - lead != s:
            n_badpos += 1
        fields = sam_record(rec, idx.ref_names).split("\t")
        errs = validate_record(fields, refs, sc)
        if errs:
            n_invalid += 1
    assert n_invalid == 0
    # nearly all reads must land exactly on their simulated position
    assert n_badpos <= 0.02 * B, f"{n_badpos}/{B} off-position"
