"""Option-surface tests for the round-4 flag sweep (ref:
bt2_search.cpp:545-749 long_options): --trim-to, --sam-no-head/--sam-no-sq,
--omit-sec-seq, --sam-opt-config, --refidx/--fullref, --gbar,
--no-exact-upfront/--no-1mm-upfront, --sample, --multiseed, paired tab6
input, --bwa-sw-like scoring, and rejected-flag errors."""
import numpy as np
import pytest

from bowtie2_server_tpu.__main__ import main

REF = ("ACGTACGTTAGCTAGCTAGCTAGGATCCGATCGATTACGCGCTAGCTAGAACTTAAGGCTA"
       "GGATATCCGGAATTCCGGTTAACCGGTTAACCGTACCGGAAGGTTCCAAGGTTCCAACGT")


def run_cli(tmp_path, extra, reads=None, ref=REF, paired=None,
            fmt="fastq"):
    out = tmp_path / "out.sam"
    argv = ["align", "--cpu", "--ref-string", ref, "-S", str(out)]
    if reads is not None:
        fq = tmp_path / ("reads." + fmt)
        with open(fq, "w") as f:
            for i, r in enumerate(reads):
                if fmt == "fastq":
                    f.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")
                else:
                    f.write(r + "\n")
        argv += ["-U", str(fq)]
    argv += extra
    main(argv)
    return out.read_text().splitlines()


def sam_body(lines):
    return [l for l in lines if not l.startswith("@")]


def test_trim_to_3prime(tmp_path):
    # 30bp read whose last 10 bases are garbage: --trim-to 20 drops them
    good = REF[4:24]
    lines = run_cli(tmp_path, ["--trim-to", "20"], reads=[good + "T" * 10])
    rec = sam_body(lines)[0].split("\t")
    assert rec[5] == "20M" and rec[3] == "5"


def test_trim_to_5prime(tmp_path):
    good = REF[4:24]
    lines = run_cli(tmp_path, ["--trim-to", "5:20"],
                    reads=["T" * 10 + good])
    rec = sam_body(lines)[0].split("\t")
    assert rec[5] == "20M" and rec[3] == "5"


def test_trim_to_excludes_trim35(tmp_path):
    with pytest.raises(SystemExit):
        run_cli(tmp_path, ["--trim-to", "20", "-3", "3"], reads=["ACGT"])


def test_sam_no_head_and_no_sq(tmp_path):
    lines = run_cli(tmp_path, ["--sam-no-sq"], reads=[REF[4:24]])
    assert not any(l.startswith("@SQ") for l in lines)
    assert any(l.startswith("@HD") for l in lines)
    lines = run_cli(tmp_path, ["--sam-nohead"], reads=[REF[4:24]])
    assert not any(l.startswith("@") for l in lines)
    assert len(sam_body(lines)) == 1


def test_sam_opt_config_toggles(tmp_path):
    lines = run_cli(tmp_path, ["--sam-opt-config=-md,-nm"],
                    reads=[REF[4:24]])
    rec = sam_body(lines)[0]
    assert "MD:Z:" not in rec and "NM:i:" not in rec and "AS:i:" in rec


def test_refidx_numeric_rname(tmp_path):
    lines = run_cli(tmp_path, ["--refidx"], reads=[REF[4:24]])
    rec = sam_body(lines)[0].split("\t")
    assert rec[2] == "0"
    assert any(l.startswith("@SQ\tSN:0\t") for l in lines)


def test_fullref_vs_default(tmp_path):
    # multi-token FASTA header: default truncates, --fullref keeps it
    fa = tmp_path / "ref.fa"
    fa.write_text(f">chr1 extra description\n{REF}\n")
    fq = tmp_path / "r.fq"
    fq.write_text(f"@r0\n{REF[4:24]}\n+\n{'I' * 20}\n")
    out1 = tmp_path / "o1.sam"
    main(["align", "--cpu", "--ref-string", REF, "-U", str(fq),
          "-S", str(out1)])  # smoke: ref-string path unaffected
    from bowtie2_server_tpu.index.build import build_index
    idx = build_index(str(fa))
    assert idx.ref_names == ["chr1 extra description"]
    base = tmp_path / "idx"
    idx.save(base)
    out2 = tmp_path / "o2.sam"
    main(["align", "--cpu", "-x", str(base), "-U", str(fq), "-S",
          str(out2)])
    lines = out2.read_text().splitlines()
    assert any(l.startswith("@SQ\tSN:chr1\tLN:") for l in lines)
    assert sam_body(lines)[0].split("\t")[2] == "chr1"
    out3 = tmp_path / "o3.sam"
    main(["align", "--cpu", "-x", str(base), "-U", str(fq), "-S",
          str(out3), "--fullref"])
    lines = out3.read_text().splitlines()
    assert any("SN:chr1 extra description" in l for l in lines)


def test_no_exact_upfront_seed_skip_gate():
    # seed_skip (exact-only) reads accept only up-front-stage hits; with
    # no_exact_upfront their perfect hits are dropped on device
    # (ref: doExactUpFront, bt2_search.cpp:3454)
    import numpy as np
    from bowtie2_server_tpu.align.pipeline import (SearchPolicy,
                                                   UnpairedAligner)
    from bowtie2_server_tpu.index.build import build_index
    from bowtie2_server_tpu.io.fastq import make_batch
    rng = np.random.default_rng(7)
    g = "".join("ACGT"[c] for c in rng.integers(0, 4, 4000))
    idx = build_index(f">g\n{g}\n")
    reads = [g[100:160].encode(), g[900:960].encode()]  # 60bp: fast shape
    batch = make_batch(["a", "b"], reads, [b"I" * 60] * 2)
    ss = np.ones(2, bool)
    st = UnpairedAligner(idx).collect(batch, seed_skip=ss)
    assert (st.res.best_ci >= 0).all()
    st2 = UnpairedAligner(
        idx, policy=SearchPolicy(no_exact_upfront=True)).collect(
            batch, seed_skip=ss)
    assert (st2.res.best_ci < 0).all()


def test_no_1mm_upfront_single_seed_read(tmp_path):
    # 24bp read = ONE instantiated seed; a mismatch inside it leaves only
    # the up-front 1mm stage (ref: do1mmUpFront, bt2_search.cpp:3634)
    r = list(REF[10:34])
    r[10] = "A" if r[10] != "A" else "C"
    r = "".join(r)
    lines = run_cli(tmp_path, [], reads=[r])
    assert not int(sam_body(lines)[0].split("\t")[1]) & 4
    lines = run_cli(tmp_path, ["--no-1mm-upfront"], reads=[r])
    assert int(sam_body(lines)[0].split("\t")[1]) & 4


def test_sample_fraction_deterministic(tmp_path):
    reads = [REF[i % 40 : i % 40 + 24] for i in range(60)]
    l1 = run_cli(tmp_path, ["--sample", "0.5"], reads=reads)
    l2 = run_cli(tmp_path, ["--sample", "0.5"], reads=reads)
    assert sam_body(l1) == sam_body(l2)
    kept = len(sam_body(l1))
    assert 10 < kept < 50          # ~half, not all, not none
    assert len(sam_body(run_cli(tmp_path, [], reads=reads))) == 60


def test_multiseed_sets_seed_params(tmp_path):
    # --multiseed 0,10,C,6 -> seeds of length 10 every 6 bases: a 20bp
    # read (too short for L=22 seeds) aligns through the fast seed table
    lines = run_cli(tmp_path, ["--multiseed", "0,10,C,6"],
                    reads=[REF[4:24]])
    assert not int(sam_body(lines)[0].split("\t")[1]) & 4


def test_paired_tab6_file(tmp_path):
    t6 = tmp_path / "pairs.tab6"
    m1 = REF[4:34]
    from bowtie2_server_tpu.utils import dna
    m2 = dna.revcomp_ascii(REF[60:90].encode()).decode()
    t6.write_text(f"p0\t{m1}\t{'I'*30}\tp0\t{m2}\t{'I'*30}\n")
    out = tmp_path / "o.sam"
    main(["align", "--cpu", "--ref-string", REF, "--tab6", str(t6),
          "-S", str(out)])
    body = sam_body(out.read_text().splitlines())
    assert len(body) == 2
    f1 = int(body[0].split("\t")[1])
    assert f1 & 1 and f1 & 2       # paired, proper pair


def test_rejected_flags_error(tmp_path):
    for flag in ("--sra-acc", "--desc-kb", "--bowtie2p5", "--Q1"):
        with pytest.raises(SystemExit):
            main(["align", "--cpu", "--ref-string", REF, "-c", "ACGT",
                  flag, "x"])


def test_noop_flags_accepted(tmp_path):
    lines = run_cli(tmp_path, ["--ungapped", "--no-sse8", "--cp-min",
                               "2000", "--tri", "--cache",
                               "--1mm-minlen", "20", "-O", "0"],
                    reads=[REF[4:28]])
    assert len(sam_body(lines)) == 1


def test_bwa_sw_like_scoring():
    from bowtie2_server_tpu.utils.scoring import Scoring
    sc = Scoring(match_bonus=1, local=True, bwa_sw_like=True)
    # min score = max(1*30, 1*5.5*ln(len)) (ref: bt2_search.cpp:3288)
    assert sc.score_min_for(100) == 30
    assert sc.score_min_for(1000) == int(5.5 * np.log(1000))


def test_gbar_flag_accepted_and_wired(tmp_path):
    # --gbar reaches Scoring.gapbar (the DP gap-barrier rows); CLI accepts
    lines = run_cli(tmp_path, ["--gbar", "2"], reads=[REF[4:28]])
    assert len(sam_body(lines)) == 1
    from dataclasses import replace
    from bowtie2_server_tpu.utils.scoring import Scoring
    assert replace(Scoring(), gapbar=2).gapbar == 2
