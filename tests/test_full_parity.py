"""Full-dataset parity enforcement (slow tier).

The quick e2e tests assert >=98% on 300-600-read subsets; these enforce the
full-dataset rates on the bundled example (6k longreads unpaired, 10k pairs
e2e and local) against goldens produced by the reference server+client pair
(ref: scripts/test harness role, SURVEY §4). Thresholds are set just below
the measured rates so regressions surface while known residual diff classes
(gappy-tail CIGAR representation ties, reference streak-limit give-ups —
docs/ROADMAP.md) don't flake.
"""
import gzip
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

DATA = Path(__file__).parent / "data"
READS = Path("/root/reference/example/reads")
FA = "/root/reference/example/reference/lambda_virus.fa"

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def lambda_idx(tmp_path_factory):
    from bowtie2_server_tpu.index.build import build_index
    base = tmp_path_factory.mktemp("idx") / "lambda"
    build_index(FA).save(base)
    return base


def _ungz(name, tmp_path):
    out = tmp_path / name[:-3]
    with gzip.open(DATA / name, "rb") as f:
        out.write_bytes(f.read())
    return out


def _run_align(idx, out, *args):
    cmd = [sys.executable, "-m", "bowtie2_server_tpu", "align", "--cpu",
           "-x", str(idx), "-S", str(out), *args]
    subprocess.run(cmd, check=True, capture_output=True, timeout=1200,
                   cwd=Path(__file__).parent.parent)


def _rate(golden, mine, paired=False):
    sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))
    if paired:
        import samdiff_paired as sd
    else:
        import samdiff as sd
    full, n = sd.main(str(golden), str(mine))
    return full / n


def test_full_longreads_unpaired_e2e(tmp_path, lambda_idx):
    golden = _ungz("golden_longreads_full.sam.gz", tmp_path)
    out = tmp_path / "ours.sam"
    _run_align(lambda_idx, out, "-U", str(READS / "longreads.fq"))
    # 99.68% measured after the larger-col argmax tie fix (round 3)
    assert _rate(golden, out) >= 0.9955


def test_full_paired_e2e(tmp_path, lambda_idx):
    golden = _ungz("golden_paired_e2e_full.sam.gz", tmp_path)
    out = tmp_path / "ours.sam"
    _run_align(lambda_idx, out, "-1", str(READS / "reads_1.fq"),
               "-2", str(READS / "reads_2.fq"))
    # 99.89% measured after the seed_skip 1mm-anchor fix (round 3)
    assert _rate(golden, out, paired=True) >= 0.9975


def test_full_paired_local(tmp_path, lambda_idx):
    golden = _ungz("golden_paired_local_full.sam.gz", tmp_path)
    out = tmp_path / "ours.sam"
    _run_align(lambda_idx, out, "--local", "-1", str(READS / "reads_1.fq"),
               "-2", str(READS / "reads_2.fq"))
    # 99.66% measured after the round-5 unclipped-TLEN-sign and
    # zero-cell gap-continuation traceback fixes (was 97.0%)
    assert _rate(golden, out, paired=True) >= 0.993
