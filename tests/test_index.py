"""Index construction tests: suffix array, BWT/occ/ftab, coordinate maps."""
import numpy as np
import pytest

from bowtie2_server_tpu.index.build import build_index, parse_fasta, suffix_array
from bowtie2_server_tpu.index.fm import search_exact, occ_at
from bowtie2_server_tpu.utils import dna


def naive_suffix_array(text):
    n = len(text)
    suffixes = sorted(range(n), key=lambda i: tuple(text[i:]))
    return np.array(suffixes)


def test_suffix_array_small(rng):
    for n in [1, 2, 5, 17, 100, 257]:
        t = rng.integers(0, 4, n).astype(np.uint8)
        sa = suffix_array(t)
        expected = naive_suffix_array(t)
        np.testing.assert_array_equal(sa, expected)


def test_suffix_array_repetitive():
    t = dna.encode("ACGT" * 64 + "AAAA" * 32)
    np.testing.assert_array_equal(suffix_array(t), naive_suffix_array(t))


def test_parse_fasta_multi():
    fasta = ">chr1 desc\nACGT\nACNT\n>chr2\nGGGG\n"
    names, seqs = parse_fasta(fasta)
    # full headers are kept (--fullref stores them; SAM/@SQ display
    # truncates at whitespace downstream, ref: bt2_inspect name handling)
    assert names == ["chr1 desc", "chr2"]
    assert [n.split()[0] for n in names] == ["chr1", "chr2"]
    assert dna.decode(seqs[0]) == "ACGTACNT"
    assert dna.decode(seqs[1]) == "GGGG"


@pytest.fixture(scope="module")
def small_index(rng):
    seq = dna.decode(np.random.default_rng(7).integers(0, 4, 2000).astype(np.uint8))
    return build_index(f">r1\n{seq}\n"), dna.encode(seq)


def test_fm_exact_search_finds_all_occurrences(small_index, rng):
    idx, text = small_index
    n = len(text)
    for L in [5, 12, 22, 50]:
        for _ in range(20):
            s = int(rng.integers(0, n - L))
            pat = text[s:s + L]
            top, bot = search_exact(idx.fw, pat)
            offs = sorted(int(idx.fw.sa[r]) for r in range(top, bot))
            # naive occurrence scan
            expected = [i for i in range(n - L + 1)
                        if np.array_equal(text[i:i + L], pat)]
            assert offs == expected


def test_fm_mirror_search(small_index, rng):
    idx, text = small_index
    n = len(text)
    rev = text[::-1]
    for _ in range(10):
        s = int(rng.integers(0, n - 20))
        pat = rev[s:s + 20]
        top, bot = search_exact(idx.mirror, pat)
        assert bot > top
        offs = [int(idx.mirror.sa[r]) for r in range(top, bot)]
        assert s in offs


def test_occ_checkpoints_consistent(small_index):
    idx, _ = small_index
    d = idx.fw
    for row in [0, 1, 64, 127, 128, 129, 1000, d.n]:
        for c in range(4):
            expected = int(np.count_nonzero(d.bwt[:row] == c))
            assert occ_at(d, c, row) == expected


def test_no_match_returns_empty(small_index):
    idx, _ = small_index
    # pattern with N can never match
    pat = np.array([0, 1, 4, 2], dtype=np.uint8)
    assert search_exact(idx.fw, pat) == (0, 0)


def test_joined_to_ref_with_ns():
    fasta = ">a\nACGTNNNNACGTACGT\n>b\nTTTT\n"
    idx = build_index(fasta)
    # joined = ACGT + ACGTACGT + TTTT; runs: (a,0,len4),(a,8,len8),(b,0,len4)
    assert idx.n == 16
    rid, roff, valid = idx.joined_to_ref(np.array([0, 3, 4, 11, 12, 15]))
    np.testing.assert_array_equal(rid, [0, 0, 0, 0, 1, 1])
    np.testing.assert_array_equal(roff, [0, 3, 8, 15, 0, 3])
    # alignment of length 2 starting at joined 3 straddles a run boundary
    _, _, v = idx.joined_to_ref(np.array([3]), aln_len=2)
    assert not v[0]
    _, _, v = idx.joined_to_ref(np.array([3]), aln_len=1)
    assert v[0]


def test_ref_stretch_pads_n():
    idx = build_index(">a\nACGTACGT\n")
    s = idx.get_ref_stretch(0, -2, 6)
    np.testing.assert_array_equal(s, [4, 4, 0, 1, 2, 3])
    s = idx.get_ref_stretch(0, 6, 4)
    np.testing.assert_array_equal(s, [2, 3, 4, 4])


def test_save_load_roundtrip(small_index, tmp_path):
    idx, text = small_index
    idx.save(tmp_path / "test")
    from bowtie2_server_tpu.index.fm import FmIndex
    idx2 = FmIndex.load(tmp_path / "test")
    np.testing.assert_array_equal(idx2.fw.bwt, idx.fw.bwt)
    np.testing.assert_array_equal(idx2.fw.sa, idx.fw.sa)
    np.testing.assert_array_equal(idx2.joined, idx.joined)
    assert idx2.ref_names == idx.ref_names
    pat = text[100:130]
    assert search_exact(idx2.fw, pat) == search_exact(idx.fw, pat)


def test_bt2_format_reader():
    """Reading the reference's own .bt2 index reproduces the genome exactly
    (requires the reference-built lambda index in tmp/)."""
    from pathlib import Path
    if not Path("tmp/lambda.1.bt2").exists():
        pytest.skip("reference lambda .bt2 index not present")
    from bowtie2_server_tpu.index.bt2_reader import (detect_index,
                                                     read_bt2_reference)
    names, seqs = read_bt2_reference("tmp/lambda")
    fnames, fseqs = parse_fasta(
        "/root/reference/example/reference/lambda_virus.fa")
    assert names == fnames
    assert all(np.array_equal(a, b) for a, b in zip(seqs, fseqs))
    kind, loader = detect_index("tmp/lambda")
    assert kind == "bt2"
    idx = loader("tmp/lambda")
    assert idx.n == sum(len(s) for s in fseqs)


def test_native_sais_matches_doubling(rng):
    """Native SA-IS vs the numpy prefix-doubling construction."""
    from bowtie2_server_tpu.native import sais
    if sais(np.zeros(4, np.uint8)) is None:
        pytest.skip("native toolchain unavailable")
    for n in [3, 50, 1000, 5000]:
        t = rng.integers(0, 4, n).astype(np.uint8)
        got = sais(t)
        np.testing.assert_array_equal(got, naive_suffix_array(t))
    t = dna.encode("ACGT" * 300 + "A" * 100 + "ACGT" * 300)
    np.testing.assert_array_equal(sais(t), naive_suffix_array(t))


def test_compressed_and_bam_inputs(tmp_path):
    """gzip/zstd/bz2 auto-detect + BAM read extraction."""
    import bz2 as _bz2
    import gzip as _gzip
    import struct, zlib

    import zstandard

    from bowtie2_server_tpu.io.bam import iter_bam
    from bowtie2_server_tpu.io.fastq import iter_fastq
    data = b"@q1\nACGTACGT\n+\nIIIIIIII\n@q2\nTTTTAAAA\n+\nFFFFFFFF\n"
    for name, comp in (("a.gz", _gzip.compress),
                       ("a.bz2", _bz2.compress),
                       ("a.zst", zstandard.ZstdCompressor().compress)):
        f = tmp_path / name
        f.write_bytes(comp(data))
        b = next(iter_fastq(f, batch_size=10))
        assert b.names == ["q1", "q2"]

    def bgzf_block(d):
        c = zlib.compressobj(6, zlib.DEFLATED, -15)
        cd = c.compress(d) + c.flush()
        out = struct.pack("<BBBBIBBH", 0x1f, 0x8b, 8, 4, 0, 0, 0xff, 6)
        out += struct.pack("<BBHH", 66, 67, 2, len(cd) + 25)
        out += cd + struct.pack("<II", zlib.crc32(d) & 0xffffffff, len(d))
        return out

    SEQ4 = "=ACMGRSVTWYHKDBN"
    def rec(name, seq):
        s4 = bytes((SEQ4.index(seq[i]) << 4) |
                   (SEQ4.index(seq[i + 1]) if i + 1 < len(seq) else 0)
                   for i in range(0, len(seq), 2))
        r = struct.pack("<iiBBHHHiiii", -1, -1, len(name) + 1, 0, 0, 0, 4,
                        len(seq), -1, -1, 0)
        r += name.encode() + b"\0" + s4 + bytes([40] * len(seq))
        return struct.pack("<i", len(r)) + r

    hdr = b"BAM\x01" + struct.pack("<ii", 0, 0)
    bam = tmp_path / "t.bam"
    bam.write_bytes(bgzf_block(hdr + rec("x1", "ACGT") + rec("x2", "GGCC"))
                    + bgzf_block(b""))
    b = next(iter_bam(bam))
    assert b.names == ["x1", "x2"]
    assert b.raw_seq == [b"ACGT", b"GGCC"]


def test_graft_entry_and_multichip_dryrun():
    """The driver's entry points: jittable single-chip step + 8-device
    sharded step on the virtual CPU mesh."""
    import sys
    sys.path.insert(0, "/root/repo")
    import jax

    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    # fused pipeline single packed output: 5 rows (pack5 compact layout)
    # or 7 rows (full layout for long reads)
    assert out.ndim == 2 and out.shape[0] in (5, 7)
    g.dryrun_multichip(8)


def test_sais64_and_bwt_walk_roundtrip(rng):
    """64-bit SA-IS matches 32-bit; full-SA reconstruction from a BWT via
    the native LF-walk matches the directly-built SA, both terminator
    conventions (ref: bt2_io.cpp stored ebwt reuse, bt2_idx.h:1607)."""
    from bowtie2_server_tpu.index.build import _build_direction
    from bowtie2_server_tpu.native import sa_from_bwt, sais
    if sais(np.zeros(4, np.uint8)) is None:
        pytest.skip("native toolchain unavailable")
    t = rng.integers(0, 4, 20000).astype(np.uint8)
    sa32 = sais(t)
    sa64 = sais(t, force64=True)
    np.testing.assert_array_equal(sa32, sa64)
    d = _build_direction(t, sa32)
    walked = sa_from_bwt(d.bwt, d.primary)
    np.testing.assert_array_equal(walked.astype(np.uint64),
                                  d.sa.astype(np.uint64))
    # $-large convention: sort suffixes of t + [5, 0] (5 > all codes plays
    # the terminator role; trailing 0 is the SA-IS sentinel), drop the [0]
    # suffix row
    n = len(t)
    aug = np.concatenate([t, np.array([5, 0], np.uint8)])
    sa_l = sais(aug)[1:]  # row 0 is the [0] suffix
    bwt_l = np.where(sa_l > 0, t[(sa_l - 1) % n], 4).astype(np.uint8)
    bwt_l[sa_l == n] = t[n - 1]  # the empty suffix's L char
    primary_l = int(np.nonzero(sa_l == 0)[0][0])
    walked_l = sa_from_bwt(bwt_l, primary_l, dollar_large=True)
    np.testing.assert_array_equal(walked_l, np.minimum(sa_l, n))


def test_bt2_fast_load_matches_native():
    """Fast .bt2 load (stored-BWT decode + LF-walk, no re-sort) produces an
    index whose hit sets equal the natively-built one (requires the
    reference-built lambda index in tmp/)."""
    from pathlib import Path
    if not Path("tmp/lambda.1.bt2").exists():
        pytest.skip("reference lambda .bt2 index not present")
    from bowtie2_server_tpu.index.bt2_reader import (direction_from_bwt,
                                                     load_bt2_index,
                                                     read_bt2_ebwt)
    idx_bt2 = load_bt2_index("tmp/lambda")
    idx_nat = build_index("/root/reference/example/reference/lambda_virus.fa")
    # the fast path marks the $-large convention by its unshifted C array
    assert int(idx_bt2.fw.cnt[0]) == 0, "fast path fell back to rebuild"
    assert idx_bt2.mirror is not None
    rng = np.random.default_rng(5)
    n = idx_nat.n
    for _ in range(60):
        L = int(rng.integers(8, 40))
        s = int(rng.integers(0, n - L))
        pat = idx_nat.joined[s : s + L]
        t1, b1 = search_exact(idx_bt2.fw, pat)
        t2, b2 = search_exact(idx_nat.fw, pat)
        assert b1 - t1 == b2 - t2
        sa1 = sorted(int(idx_bt2.fw.sa[r]) for r in range(t1, b1))
        sa2 = sorted(int(idx_nat.fw.sa[r]) for r in range(t2, b2))
        assert sa1 == sa2
        rp = pat[::-1].copy()
        m1 = search_exact(idx_bt2.mirror, rp)
        m2 = search_exact(idx_nat.mirror, rp)
        assert m1[1] - m1[0] == m2[1] - m2[0]


def test_bam_paired_input(tmp_path):
    """--align-paired-reads: paired BAM records pair up by QNAME + mate
    flags (ref: pat.h:1074 BAMPatternSource, gAlignPairedBAM)."""
    import struct, zlib

    from bowtie2_server_tpu.io.bam import iter_bam_paired

    def bgzf_block(d):
        c = zlib.compressobj(6, zlib.DEFLATED, -15)
        cd = c.compress(d) + c.flush()
        out = struct.pack("<BBBBIBBH", 0x1f, 0x8b, 8, 4, 0, 0, 0xff, 6)
        out += struct.pack("<BBHH", 66, 67, 2, len(cd) + 25)
        out += cd + struct.pack("<II", zlib.crc32(d) & 0xffffffff, len(d))
        return out

    SEQ4 = "=ACMGRSVTWYHKDBN"

    def rec(name, seq, flag):
        s4 = bytes((SEQ4.index(seq[i]) << 4) |
                   (SEQ4.index(seq[i + 1]) if i + 1 < len(seq) else 0)
                   for i in range(0, len(seq), 2))
        r = struct.pack("<iiBBHHHiiii", -1, -1, len(name) + 1, 0, 0, 0,
                        flag, len(seq), -1, -1, 0)
        r += name.encode() + b"\0" + s4 + bytes([40] * len(seq))
        return struct.pack("<i", len(r)) + r

    hdr = b"BAM\x01" + struct.pack("<ii", 0, 0)
    # p1 in order, p2 with mate2 first, u1 unpaired (skipped)
    body = (rec("p1", "ACGT", 0x1 | 0x40) + rec("p1", "TTGG", 0x1 | 0x80)
            + rec("u1", "CCCC", 0)
            + rec("p2", "GGAA", 0x1 | 0x80) + rec("p2", "AACC", 0x1 | 0x40))
    bam = tmp_path / "p.bam"
    bam.write_bytes(bgzf_block(hdr + body) + bgzf_block(b""))
    pairs = list(iter_bam_paired(bam))
    assert len(pairs) == 1
    b1, b2 = pairs[0]
    assert b1.names == ["p1", "p2"] and b2.names == ["p1", "p2"]
    assert b1.raw_seq == [b"ACGT", b"AACC"]
    assert b2.raw_seq == [b"TTGG", b"GGAA"]
