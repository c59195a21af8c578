"""Sharded-vs-single equivalence of the REAL pipeline (ref: SURVEY §2.3 —
read-level data parallelism; the driver's dryrun_multichip runs the same)."""
import numpy as np
import pytest

import jax


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_pipeline_equals_single():
    from bowtie2_server_tpu.parallel.mesh import dryrun_full_pipeline
    dryrun_full_pipeline(8)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_lambda_sam_equals_single():
    """8-device mesh SAM == 1-device SAM on real lambda reads."""
    from bowtie2_server_tpu.align.pipeline import UnpairedAligner
    from bowtie2_server_tpu.index.build import build_index
    from bowtie2_server_tpu.io.fastq import iter_fastq
    from bowtie2_server_tpu.io.sam import sam_record
    from bowtie2_server_tpu.parallel.mesh import make_mesh

    idx = build_index("/root/reference/example/reference/lambda_virus.fa")
    batch = next(iter_fastq("/root/reference/example/reads/longreads.fq",
                            batch_size=256))
    al1 = UnpairedAligner(idx)
    al8 = UnpairedAligner(idx, mesh=make_mesh(8))
    recs1 = al1.align_batch(batch)
    recs8 = al8.align_batch(batch)
    lines1 = [sam_record(r, idx.ref_names) for r in recs1]
    lines8 = [sam_record(r, idx.ref_names) for r in recs8]
    assert lines1 == lines8
