"""Native SAM emitter (native/samfmt.cpp) vs the per-record python
formatter: byte-for-byte equality on a mixed batch (aligned fw/rc,
mismatches, unaligned, filtered, rc with Ns)."""
import numpy as np
import pytest

from bowtie2_server_tpu.align.pipeline import UnpairedAligner
from bowtie2_server_tpu.index.build import build_index
from bowtie2_server_tpu.io.fastq import make_batch
from bowtie2_server_tpu.io.sam import sam_record, sam_format_batch_native
from bowtie2_server_tpu.utils.dna import revcomp_ascii


@pytest.fixture(scope="module")
def idx(rng):
    g = rng.integers(0, 4, 20000).astype(np.uint8)
    seq = bytes(b"ACGT"[c] for c in g)
    return build_index(f">chr_t\n{seq.decode()}\n"), seq


def _reads(seq, rng, n=64, L=80):
    names, seqs, quals = [], [], []
    for i in range(n):
        st = int(rng.integers(0, len(seq) - L))
        rd = bytearray(seq[st:st + L])
        for _ in range(int(rng.integers(0, 3))):
            rd[int(rng.integers(0, L))] = ord("ACGT"[int(rng.integers(4))])
        if i % 3 == 1:
            rd = bytearray(revcomp_ascii(bytes(rd)))
        if i % 13 == 5:
            rd = bytearray(rng.integers(65, 90, L).astype("u1").tobytes())
        if i % 17 == 7:
            for k in range(0, L, 3):
                rd[k] = ord("N")   # N-filtered
        names.append(f"q{i}")
        seqs.append(bytes(rd))
        quals.append(bytes(33 + rng.integers(0, 40, L).astype("u1")))
    return make_batch(names, seqs, quals)


def test_native_sam_matches_python(idx, rng):
    index, seq = idx
    al = UnpairedAligner(index)
    batch = _reads(seq, rng)
    recs = al.align_batch(batch)
    blob = sam_format_batch_native(recs, index.ref_names, rg_id=None)
    if blob is None:
        pytest.skip("native lib unavailable")
    native_lines = blob.decode().rstrip("\n").split("\n")
    py_lines = [sam_record(recs[i], index.ref_names)
                for i in range(len(recs))]
    assert native_lines == py_lines

    # with --no-unal and an RG id
    blob2 = sam_format_batch_native(recs, index.ref_names, rg_id="grp7",
                                    no_unal=True)
    native2 = blob2.decode().rstrip("\n").split("\n") if blob2 else []
    py2 = [sam_record(recs[i], index.ref_names, "grp7")
           for i in range(len(recs)) if recs[i].aligned]
    assert native2 == py2
