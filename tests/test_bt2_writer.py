""".bt2 index WRITER interop (ref: bt2_io.cpp:801 writeFromMemory,
bt2_idx.h:2829 buildToDisk): our six-file output must be byte-identical
to `bowtie2-build` with default parameters, and the round-trip through
our own .bt2 reader must reproduce the native index's behavior."""
from pathlib import Path

import numpy as np
import pytest

from bowtie2_server_tpu.index.bt2_writer import write_bt2_from_fasta

REF_BUILD = Path(".refbuild/bowtie2-build-s")

LAMBDA = "/root/reference/example/reference/lambda_virus.fa"


@pytest.fixture(scope="module")
def multi_fa(tmp_path_factory):
    rng = np.random.default_rng(5)
    bases = "ACGT"

    def rand(n):
        return "".join(bases[c] for c in rng.integers(0, 4, n))

    fa = (">seq one with spaces\n" + "N" * 7 + rand(300) + "NN"
          + rand(150) + "NNNN\n"
          ">seq2\n" + rand(400) + "\n"
          ">seq3 trailing\nNNN" + rand(80) + "N" + rand(60) + "\n")
    p = tmp_path_factory.mktemp("bt2w") / "multi.fa"
    p.write_text(fa)
    return p


@pytest.mark.skipif(not REF_BUILD.exists(),
                    reason="reference build binary not present")
@pytest.mark.parametrize("fa_fixture", ["lambda", "multi"])
def test_byte_identical_to_reference_build(fa_fixture, multi_fa, tmp_path):
    import subprocess
    fa = LAMBDA if fa_fixture == "lambda" else str(multi_fa)
    subprocess.run([str(REF_BUILD), "-q", fa, str(tmp_path / "ref")],
                   check=True, capture_output=True)
    write_bt2_from_fasta(fa, str(tmp_path / "ours"))
    for f in ("1", "2", "3", "4", "rev.1", "rev.2"):
        a = (tmp_path / f"ours.{f}.bt2").read_bytes()
        b = (tmp_path / f"ref.{f}.bt2").read_bytes()
        assert a == b, f".{f}.bt2 differs"


def test_roundtrip_through_our_reader(multi_fa, tmp_path):
    """write_bt2 -> load_bt2_index must align identically to the native
    build of the same FASTA."""
    from bowtie2_server_tpu.align.pipeline import UnpairedAligner
    from bowtie2_server_tpu.index.bt2_reader import load_bt2_index
    from bowtie2_server_tpu.index.build import build_index, parse_fasta
    from bowtie2_server_tpu.io.fastq import make_batch

    write_bt2_from_fasta(str(multi_fa), str(tmp_path / "rt"))
    idx_rt = load_bt2_index(str(tmp_path / "rt"))
    idx_nat = build_index(str(multi_fa))
    names, seqs = parse_fasta(str(multi_fa))
    rng = np.random.default_rng(9)
    reads, starts = [], []
    bases = np.frombuffer(b"ACGT", np.uint8)
    for _ in range(64):
        rid = int(rng.integers(0, len(seqs)))
        s = seqs[rid]
        ok = np.nonzero(s[: max(len(s) - 40, 1)] < 4)[0]
        st = int(ok[rng.integers(0, len(ok))])
        rd = s[st : st + 40]
        if (rd > 3).any() or len(rd) < 40:
            continue
        reads.append(bases[rd].tobytes())
        starts.append((rid, st))
    b = make_batch([f"r{i}" for i in range(len(reads))], reads,
                   [b"I" * 40 for _ in reads])
    out = []
    for idx in (idx_rt, idx_nat):
        al = UnpairedAligner(idx)
        recs = al.align_batch(b)
        out.append([(r.aligned, r.ref_id, r.pos, r.cigar, r.score,
                     r.mapq) for r in recs])
    assert out[0] == out[1]
