"""Hand-crafted alignment case table — the analog of the reference's
scripts/test/simple_tests.pl tier (ref: simple_tests.pl:67-220 case shapes:
per-case ref + reads + args with exact offsets/CIGARs/flags/tags/MAPQ,
across input formats and both alignment modes).

Each case is a dict:
  name   unique id
  ref    [(contig_name, sequence), ...]
  fmt    'fastq' | 'fasta' | 'raw' | 'tab5' | 'cline' | 'qseq'
         | 'pair_fastq' | 'pair_tab6' | 'pair_interleaved'
  reads  [(name, seq, qual-or-None)]            (unpaired formats)
  m1/m2  [(name, seq, qual-or-None)]            (paired formats)
  args   CLI flags, IDENTICAL for our CLI and the reference binary
  skip   set of record fields to exclude from comparison (with a reason
         in a trailing comment), default empty

Goldens are produced by scripts/gen_simple_goldens.py running the ACTUAL
reference binaries (bowtie2-build-s / bowtie2-align-s built from
/root/reference) over the very same inputs; tests/test_simple_tier.py then
drives OUR full CLI over the same inputs and compares records field by
field. No expected value in this tier is hand-derived.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

_BASES = "ACGT"


def _rand(seed: int, n: int) -> str:
    r = np.random.RandomState(seed).randint(0, 4, n)
    return "".join(_BASES[b] for b in r)


def rc(s: str) -> str:
    comp = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}
    return "".join(comp[c] for c in reversed(s))


def mut(s: str, p: int) -> str:
    """Deterministic substitution at position p."""
    c = _BASES[(_BASES.index(s[p]) + 1) % 4]
    return s[:p] + c + s[p + 1:]


def ins(s: str, p: int, what: str = None) -> str:
    """Insert bases at position p (default: a base differing from both
    neighbors, so the insertion placement is unambiguous)."""
    if what is None:
        for c in _BASES:
            if c != s[p - 1] and c != s[p]:
                what = c
                break
    return s[:p] + what + s[p:]


def dele(s: str, p: int, n: int = 1) -> str:
    return s[:p] + s[p + n:]


# ---------------------------------------------------------------- references
REF1 = _rand(7, 300)                      # unique 300 bp
CHR1 = _rand(11, 250)
CHR2 = _rand(12, 250)
SEG = _rand(21, 40)                       # duplicated segment
_SP = [_rand(31 + i, 30) for i in range(9)]
REFDUP2 = _SP[0] + SEG + _SP[1] + SEG + _SP[2]
REFDUP8 = "".join(_SP[i] + SEG for i in range(8)) + _SP[8]
# homopolymer run for indel left-alignment: unique context + A*8 + unique
REFHP = _rand(41, 80) + "AAAAAAAA" + _rand(42, 80)
REFN = _rand(51, 80) + "N" * 15 + _rand(52, 80)
REFLEADN = "N" * 30 + _rand(53, 120)
REFSHORT = _rand(54, 60)

_R1 = [("ref1", REF1)]
_RD2 = [("dup2", REFDUP2)]
_RD8 = [("dup8", REFDUP8)]

E40 = REF1[60:100]                        # canonical exact 40-mer @60
E40B = REF1[120:160]
E40C = REF1[180:220]


def _c(name, fmt, args, reads=None, m1=None, m2=None, ref=None, skip=(),
       cargs=(), tie=False, valid_pos=None, abort=False):
    return dict(name=name, fmt=fmt, args=list(args), cargs=list(cargs),
                reads=reads, m1=m1, m2=m2, tie=tie, valid_pos=valid_pos,
                ref=ref if ref is not None else _R1, skip=set(skip),
                abort=abort)


def _u(name, seq, args=(), qual=None, fmt="fastq", ref=None, skip=(),
       rname="r0", cargs=(), tie=False, valid_pos=None, abort=False):
    return _c(name, fmt, args, reads=[(rname, seq, qual)], ref=ref,
              skip=skip, cargs=cargs, tie=tie, valid_pos=valid_pos,
              abort=abort)


CASES = []

# ------------------------------------------------- input-format basics (12)
for fmt in ("fastq", "fasta", "raw", "tab5", "cline", "qseq"):
    CASES.append(_u(f"{fmt}_exact", E40, fmt=fmt))
for fmt in ("fastq", "fasta", "raw", "cline"):
    CASES.append(_c(f"{fmt}_multiread", fmt, [],
                    reads=[("r0", E40, None), ("r1", E40B, None),
                           ("r2", E40C, None)]))
CASES.append(_c("pair_interleaved_exact", "pair_interleaved", [],
                m1=[("p0", REF1[50:90], None)],
                m2=[("p0", rc(REF1[150:190]), None)]))
CASES.append(_c("pair_tab6_exact", "pair_tab6", [],
                m1=[("p0", REF1[50:90], None)],
                m2=[("p0", rc(REF1[150:190]), None)]))

# ------------------------------------------------------------- strands (4)
CASES += [
    _u("rc_exact", rc(E40)),
    _u("nofw_rc_aligns", rc(E40), ["--nofw"]),
    _u("nofw_fw_unaligned", E40, ["--nofw"]),
    _u("norc_rc_unaligned", rc(E40), ["--norc"]),
]

# ---------------------------------------------------------- mismatches (8)
CASES += [
    _u("mm_center", mut(E40, 20)),
    _u("mm_at_first_base", mut(E40, 0)),
    _u("mm_at_last_base", mut(E40, 39)),
    _u("mm_two", mut(mut(E40, 10), 30)),
    # low base quality at the mismatch halves the MM penalty (MMP Q scaling)
    _u("mm_lowqual", mut(E40, 20), qual="I" * 20 + "#" + "I" * 19),
    _u("mm_lowqual_ignore_quals", mut(E40, 20),
       ["--ignore-quals"], qual="I" * 20 + "#" + "I" * 19),
    _u("mm_mp_flat3", mut(E40, 20), ["--mp", "3,3"]),
    _u("mm_mp_6_2", mut(E40, 20), ["--mp", "6,2"],
       qual="I" * 20 + "#" + "I" * 19),
]

# -------------------------------------------------------------- indels (10)
R60 = REF1[40:100]
CASES += [
    _u("del1", dele(R60, 25)),
    _u("del2", dele(R60, 25, 2)),
    _u("del3", dele(R60, 25, 3)),
    _u("ins1", ins(R60, 25)),
    _u("ins2", ins(R60, 25, "AA") if R60[24] != "A" and R60[25] != "A"
       else ins(R60, 25, "CC")),
    _u("del_at_seed_boundary", dele(R60, 22)),
    _u("ins_at_seed_boundary", ins(R60, 22)),
    _u("rdg_heavy", dele(R60, 25), ["--rdg", "10,5"]),
    _u("rfg_heavy", ins(R60, 25), ["--rfg", "10,5"]),
    _u("gbar_wide", dele(R60, 25), ["--gbar", "10"]),
]

# left-alignment of indels inside a homopolymer run (ref:
# simple_tests.pl "Left-align insertion/deletion")
_HPREAD = REFHP[60:120]            # spans the A-run at 80..88
CASES += [
    _u("leftalign_del_in_run", dele(_HPREAD, 24), ref=[("hp", REFHP)]),
    _u("leftalign_ins_in_run", ins(_HPREAD, 24, "A"), ref=[("hp", REFHP)]),
]

# ------------------------------------------------------------ N handling (6)
CASES += [
    _u("n_read_one", E40[:20] + "N" + E40[21:]),
    _u("n_read_many_fail", E40[:8] + "N" * 24 + E40[32:]),
    _u("n_ceil_raised", E40[:18] + "NNNN" + E40[22:],
       ["--n-ceil", "L,0,0.2"]),
    _u("np_penalty3", E40[:20] + "N" + E40[21:], ["--np", "3"]),
    _u("n_in_ref_span", REFN[70:110], ref=[("refn", REFN)]),
    _u("ref_leading_ns", REFLEADN[40:80], ref=[("leadn", REFLEADN)]),
]
CASES.append(_c("ref_first_seq_all_ns", "fastq", [],
                reads=[("r0", CHR2[100:140], None)],
                ref=[("alln", "N" * 80), ("chr2", CHR2)]))

# ------------------------------------------------------------- trimming (5)
CASES += [
    _u("trim5_10", "T" * 10 + E40, cargs=["-5", "10"]),
    _u("trim3_10", E40 + "T" * 10, cargs=["-3", "10"]),
    _u("trim5and3", "T" * 6 + E40 + "T" * 6, cargs=["-5", "6", "-3", "6"]),
    _u("trim_to_3prime", E40 + "T" * 10, cargs=["--trim-to", "40"]),
    _u("trim_to_5prime", "T" * 10 + E40, cargs=["--trim-to", "5:40"]),
]

# ---------------------------------------------------------------- local (8)
JUNK = "ACGT" * 4
CASES += [
    _u("local_exact", E40, ["--local"]),
    _u("local_clip_left", JUNK + E40, ["--local"]),
    _u("local_clip_right", E40 + JUNK, ["--local"]),
    _u("local_clip_both", JUNK + E40 + JUNK, ["--local"]),
    _u("local_ma3", JUNK + E40, ["--local", "--ma", "3"]),
    _u("local_rc_clip", rc(JUNK + E40), ["--local"]),
    _u("local_score_min_strict", JUNK + E40,
       ["--local", "--score-min", "G,40,8"]),
    _u("local_mm", JUNK + mut(E40, 20), ["--local"]),
]

# ------------------------------------------------------------ score-min (3)
CASES += [
    _u("score_min_strict_kills_mm", mut(E40, 20),
       ["--score-min", "L,0,-0.05"]),
    _u("score_min_lenient", mut(mut(E40, 10), 30),
       ["--score-min", "L,0,-1.0"]),
    _u("score_min_const", mut(E40, 20), ["--score-min", "C,-12,0"]),
]

# ------------------------------------------- multiplicity / reporting (10)
CASES += [
    _u("dup2_k1", SEG, ref=_RD2, tie=True,
       valid_pos=(31, 101)),
    _u("dup2_k2", SEG, ["-k", "2"], ref=_RD2, tie=True,
       valid_pos=(31, 101)),
    _u("dup2_a", SEG, ["-a"], ref=_RD2, tie=True,
       valid_pos=(31, 101)),
    _u("dup8_a", SEG, ["-a"], ref=_RD8, tie=True,
       valid_pos=tuple(31 + 70 * i for i in range(8))),
    _u("dup8_k5", SEG, ["-k", "5"], ref=_RD8, tie=True,
       valid_pos=tuple(31 + 70 * i for i in range(8))),
    _u("dup8_k1", SEG, ref=_RD8, tie=True,
       valid_pos=tuple(31 + 70 * i for i in range(8))),
    _u("dup2_M1", SEG, ["-M", "1"], ref=_RD2, tie=True,
       valid_pos=(31, 101)),
    _u("unique_mapq", E40),
    _u("unaligned_record", "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT"),
    _u("no_unal", "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT", ["--no-unal"]),
]

# --------------------------------------------------------------- paired (22)
M1 = REF1[50:90]
M2 = rc(REF1[150:190])


def _p(name, m1s, m2s, args=(), ref=None, skip=()):
    return _c(name, "pair_fastq", args, ref=ref,
              m1=[("p0", m1s, None)], m2=[("p0", m2s, None)], skip=skip)


CASES += [
    _p("pe_fr_concordant", M1, M2),
    _p("pe_fr_swapped_mates", rc(REF1[150:190]) if False else M2, M1),
    _p("pe_rf", rc(M1), rc(M2), ["--rf"]),
    _p("pe_ff", M1, REF1[150:190], ["--ff"]),
    _p("pe_same_offset", REF1[60:100], rc(REF1[60:100])),
    _p("pe_minins_violated", M1, M2, ["-I", "200"]),
    _p("pe_maxins_violated", M1, M2, ["-X", "100"]),
    _p("pe_maxins_exact_fit", M1, M2, ["-X", "140"]),
    _p("pe_discordant_orient", M1, REF1[150:190]),
    _p("pe_discordant_no_discordant", M1, REF1[150:190],
       ["--no-discordant"]),
    _p("pe_no_mixed_one_junk", M1, "ACGT" * 10, ["--no-mixed"]),
    _p("pe_mate2_unalignable", M1, "ACGT" * 10),
    _p("pe_mate1_unalignable", "ACGT" * 10, M2),
    _p("pe_both_unalignable", "ACGT" * 10, "TGCA" * 10),
    _p("pe_overlap_default", REF1[60:100], rc(REF1[80:120])),
    _p("pe_overlap_forbidden", REF1[60:100], rc(REF1[80:120]),
       ["--no-overlap"]),
    _p("pe_containment", REF1[60:120], rc(REF1[80:110])),
    _p("pe_no_contain", REF1[60:120], rc(REF1[80:110]), ["--no-contain"]),
    _p("pe_dovetail_default", REF1[80:120], rc(REF1[60:100])),
    _p("pe_dovetail_allowed", REF1[80:120], rc(REF1[60:100]),
       ["--dovetail"]),
    _p("pe_diff_chrom", CHR1[50:90], rc(CHR2[100:140]),
       ref=[("chr1", CHR1), ("chr2", CHR2)]),
    _p("pe_mm_ys_tag", mut(M1, 20), M2),
]

# ------------------------------------------------------------- presets (6)
_PR = mut(E40, 20)
CASES += [
    _u("preset_very_fast", _PR, ["--very-fast"]),
    _u("preset_fast", _PR, ["--fast"]),
    _u("preset_sensitive", _PR, ["--sensitive"]),
    _u("preset_very_sensitive", _PR, ["--very-sensitive"]),
    _u("preset_very_fast_local", JUNK + E40, ["--very-fast-local"]),
    _u("preset_very_sensitive_local", JUNK + E40,
       ["--very-sensitive-local"]),
]

# ---------------------------------------------------------- seed params (5)
CASES += [
    _u("seedlen28", mut(E40, 20), ["-L", "28"]),
    _u("ival_dense", mut(E40, 20), ["-i", "S,1,0.50"]),
    _u("n1_seed_mm", mut(REF1[60:90], 11), ["-N", "1", "-L", "20"]),
    _u("fail_streak_D5", mut(E40, 20), ["-D", "5"]),
    _u("rounds_R3", mut(E40, 20), ["-R", "3"]),
]

# ------------------------------------------------------------ MD shapes (4)
CASES += [
    _u("md_mm_at_start", mut(E40, 0)),
    _u("md_mm_at_end", mut(E40, 39)),
    _u("md_deletion", dele(R60, 25, 2)),
    _u("md_two_mm", mut(mut(E40, 5), 34)),
]

# -------------------------------------------------------- qual encodings (3)
_Q40 = "".join(chr(33 + (i % 40)) for i in range(40))
CASES += [
    _u("phred33_varqual", mut(E40, 20), qual=_Q40),
    _u("phred64_varqual", mut(E40, 20), cargs=["--phred64"],
       qual="".join(chr(64 + (i % 40)) for i in range(40))),
    # (--int-quals dropped: the reference CLIENT build aborts re-encoding
    # int quals for the wire — not a behavior we can golden against)
    _u("a_on_unique", E40, ["-a"]),
    _u("k3_only_2_hits", SEG, ["-k", "3"], ref=_RD2, tie=True,
       valid_pos=(31, 101)),
]

# ------------------------------------------------------------ skip/upto (3)
_SU = [("r0", E40, None), ("r1", E40B, None), ("r2", E40C, None)]
CASES += [
    _c("skip_s1", "fastq", [], cargs=["-s", "1"], reads=_SU),
    _c("upto_u2", "fastq", [], cargs=["-u", "2"], reads=_SU),
    _c("skip_and_upto", "fastq", [], cargs=["-s", "1", "-u", "1"], reads=_SU),
]

# ---------------------------------------------------------------- misc (6)
CASES += [
    _u("read_at_ref_start", REF1[0:40]),
    _u("read_at_ref_end", REF1[-40:]),
    _u("whole_tiny_ref", REFSHORT, ref=[("tiny", REFSHORT)]),
    _u("read_len25", REF1[100:125]),
    _u("read_len200_mm", mut(REF1[30:230], 100)),
    _u("second_chrom", CHR2[60:100],
       ref=[("chr1", CHR1), ("chr2", CHR2)]),
]

# ================= round-5 tier growth (ref: simple_tests.pl coverage) =====

def _p(name, m1s, m2s, args=(), ref=None, skip=(), fmt="pair_fastq",
       tie=False, cargs=()):
    return _c(name, fmt, args, m1=[("p0", m1s, None)],
              m2=[("p0", m2s, None)], ref=ref, skip=skip, tie=tie,
              cargs=cargs)


_M1 = REF1[50:90]                  # fw mate at 50
_M2 = rc(REF1[150:190])            # rc mate at 150 (FR, frag 140)

# ------------------------------------------ paired orientations/policies (14)
CASES += [
    _p("pe_fr_exact", _M1, _M2),
    _p("pe_rf_r5", rc(REF1[50:90]), REF1[150:190], ["--rf"]),
    _p("pe_ff_r5", REF1[50:90], REF1[150:190], ["--ff"]),
    _p("pe_fr_wrong_order_discordant", _M2, _M1),
    _p("pe_maxins_violated_r5", _M1, rc(REF1[250:290]), ["-X", "150"]),
    _p("pe_maxins_ok_wide", _M1, rc(REF1[250:290]), ["-X", "300"]),
    _p("pe_minins_violated_r5", _M1, rc(REF1[100:140]), ["-I", "120"]),
    _p("pe_overlap_pair", REF1[50:90], rc(REF1[70:110])),
    _p("pe_no_overlap_flag", REF1[50:90], rc(REF1[70:110]),
       ["--no-overlap"]),
    _p("pe_containment_r5", REF1[50:110], rc(REF1[60:100])),
    _p("pe_no_contain_flag", REF1[50:110], rc(REF1[60:100]),
       ["--no-contain"]),
    _p("pe_dovetail_default_rejected", REF1[60:100], rc(REF1[50:90])),
    _p("pe_dovetail_allowed_r5", REF1[60:100], rc(REF1[50:90]),
       ["--dovetail"]),
    _p("pe_same_start", REF1[50:90], rc(REF1[50:90])),
]

# ------------------------------------------------- paired fallbacks (8)
_M2MM = mut(mut(mut(_M2, 5), 19), 33)    # mate2 with 3 spread substitutions
CASES += [
    _p("pe_mate_rescue_3mm", _M1, _M2MM),
    _p("pe_mixed_mate2_garbage", _M1, "ACGT" * 10),
    _p("pe_no_mixed", _M1, "ACGT" * 10, ["--no-mixed"]),
    _p("pe_discordant_far", REF1[0:40], rc(CHR2[60:100]),
       ref=[("ref1", REF1), ("chr2", CHR2)]),
    _p("pe_no_discordant_far", REF1[0:40], rc(CHR2[60:100]),
       ["--no-discordant"], ref=[("ref1", REF1), ("chr2", CHR2)]),
    _p("pe_local_exact", _M1, _M2, ["--local"]),
    _p("pe_local_clip_mate", _M1, "CCGGTT" + _M2[6:], ["--local"]),
    _p("pe_both_mm", mut(_M1, 10), mut(_M2, 12)),
]

# ----------------------------------------- paired via other formats (4)
CASES += [
    _p("pe_tab6_mm", mut(_M1, 8), _M2, fmt="pair_tab6"),
    _p("pe_interleaved_mm", _M1, mut(_M2, 9), fmt="pair_interleaved"),
    _p("pe_tab6_rc_case", _M2, _M1, fmt="pair_tab6"),
    _p("pe_interleaved_local", _M1, _M2, ["--local"],
       fmt="pair_interleaved"),
]

# ------------------------------------------------- format breadth (17)
CASES += [
    _c("fasta_rc", "fasta", [], reads=[("r0", rc(E40), None)]),
    _c("fasta_mm", "fasta", [], reads=[("r0", mut(E40, 20), None)]),
    _c("fasta_two_refs", "fasta", [],
       reads=[("r0", CHR1[10:50], None), ("r1", CHR2[60:100], None)],
       ref=[("chr1", CHR1), ("chr2", CHR2)]),
    _c("raw_rc", "raw", [], reads=[("r0", rc(E40), None)]),
    _c("raw_mm", "raw", [], reads=[("r0", mut(E40, 7), None)]),
    _c("tab5_multiread", "tab5", [],
       reads=[("r0", E40, None), ("r1", E40B, None), ("r2", E40C, None)]),
    _c("tab5_mm", "tab5", [], reads=[("r0", mut(E40, 15), None)]),
    _c("tab5_rc", "tab5", [], reads=[("r0", rc(E40), None)]),
    _c("qseq_multiread", "qseq", [],
       reads=[("r0", E40, None), ("r1", E40B, None)]),
    _c("qseq_rc", "qseq", [], reads=[("r0", rc(E40), None)]),
    _c("qseq_lowqual_mm", "qseq", [],
       reads=[("r0", mut(E40, 20), "I" * 20 + "#" + "I" * 19)]),
    _c("cline_rc", "cline", [], reads=[("r0", rc(E40), None)]),
    _c("cline_mm", "cline", [], reads=[("r0", mut(E40, 33), None)]),
    _c("bam_exact", "bam", [], reads=[("r0", E40, None)]),
    _c("bam_mm", "bam", [], reads=[("r0", mut(E40, 12), None)]),
    _c("bam_rc", "bam", [], reads=[("r0", rc(E40), None)]),
    _c("bam_multiread", "bam", [],
       reads=[("r0", E40, None), ("r1", E40B, None), ("r2", E40C, None)]),
]

# ------------------------------------------------------- local mode (8)
CASES += [
    _u("local_exact_r5", E40, ["--local"]),
    _u("local_clip_start", "CCGGTTAA" + REF1[120:160], ["--local"]),
    _u("local_clip_end", REF1[120:160] + "TTGGCCAA", ["--local"]),
    _u("local_clip_both_r5", "CCGG" + REF1[120:160] + "TTAA", ["--local"]),
    _u("local_mm_inside", mut(REF1[120:170], 25), ["--local"]),
    _u("local_preset_vsl", "CCGG" + REF1[120:160],
       ["--very-sensitive-local"]),
    _u("local_scoremin", "CCGGTTAA" + REF1[120:160],
       ["--local", "--score-min", "G,30,6"]),
    _u("local_ma_1", "CCGG" + REF1[120:160], ["--local", "--ma", "1"]),
]

# ---------------------------------------------------------- scoring (8)
CASES += [
    _u("score_mp_4", mut(E40, 20), ["--mp", "4"]),
    _u("score_np_2", E40[:20] + "N" + E40[21:], ["--np", "2"]),
    _u("score_rdg_tight", dele(R60, 25, 2), ["--rdg", "3,1"]),
    _u("score_rfg_tight", ins(R60, 30), ["--rfg", "3,1"]),
    _u("score_min_strict", mut(mut(E40, 10), 30),
       ["--score-min", "L,0,-0.2"]),
    _u("score_min_loose_200", mut(REF1[30:230], 100),
       ["--score-min", "L,0,-0.9"]),
    _u("gbar_8", ins(R60, 30), ["--gbar", "8"]),
    _u("ignore_quals_mm", mut(E40, 20), ["--ignore-quals"],
       qual="I" * 20 + "#" + "I" * 19),
]

# --------------------------------------------------------- reporting (6)
CASES += [
    _u("k2_dup8", SEG, ["-k", "2"], ref=_RD8, tie=True,
       valid_pos=tuple(30 * (i + 1) + 40 * i + 1 for i in range(8))),
    _u("a_dup2", SEG, ["-a"], ref=_RD2, tie=True, valid_pos=(31, 101)),
    _u("k1_dup2_tie", SEG, [], ref=_RD2, tie=True, valid_pos=(31, 101)),
    _u("mapq_unique_long", REF1[40:140]),
    _u("mapq_mm1", mut(E40, 20)),
    _u("M_2_dup8", SEG, ["-M", "2"], ref=_RD8, tie=True,
       valid_pos=tuple(30 * (i + 1) + 40 * i + 1 for i in range(8))),
]

# ------------------------------------------------------ trimming (6)
CASES += [
    _u("trim5_4", "ACGT" + E40, cargs=["-5", "4"]),
    _u("trim3_4", E40 + "ACGT", cargs=["-3", "4"]),
    _u("trim5_and_3", "AC" + E40 + "GT", cargs=["-5", "2", "-3", "2"]),
    _u("trim_to_30", E40, cargs=["--trim-to", "30"]),
    _u("trim_to_3end", E40, cargs=["--trim-to", "3:30"]),
    _u("trim_to_5end", E40, cargs=["--trim-to", "5:30"]),
]

# ------------------------------------------------------ N handling (5)
CASES += [
    _u("read_one_n", E40[:20] + "N" + E40[21:]),
    _u("read_many_n_filtered", E40[:10] + "N" * 12 + E40[22:]),
    _u("ref_n_gap_span", REFN[65:110], ref=[("refn", REFN)]),
    _u("ref_lead_n", REFLEADN[30:70], ref=[("leadn", REFLEADN)]),
    _u("n_ceil_zero", E40[:20] + "N" + E40[21:], ["--n-ceil", "L,0,0"]),
]

# ------------------------------------------------------ should-abort (5)
CASES += [
    # (a --trim-to/--trim3 abort case is deliberately absent: the fork's
    # exclusivity check is dead code — saw_trim3/saw_trim_to are reset
    # but never set, bt2_search.cpp:1030-1032/1639-1641/1669 — so the
    # reference binaries accept the combo; our CLI keeps upstream's
    # intended error)
    _u("abort_sc_unmapped_tlen_e2e", E40,
       ["--soft-clipped-unmapped-tlen"], abort=True),
    _u("abort_preserve_tags_fastq", E40, ["--preserve-tags"], abort=True),
    _u("abort_unknown_flag", E40, ["--nonsense-preset-flag"], abort=True),
    _u("abort_bad_scoremin_func", E40, ["--score-min", "Z,1,2"],
       abort=True),
]

# sanity: unique names
_names = [c["name"] for c in CASES]
assert len(_names) == len(set(_names)), "duplicate case names"


# ------------------------------------------------------------ input writing

def _write_unaligned_bam(path: Path, rows):
    """Minimal unaligned BAM (BGZF) from (name, seq, qual) rows — the
    tier's BAM-input fixture builder."""
    import struct
    import zlib

    def bgzf(d):
        c = zlib.compressobj(6, zlib.DEFLATED, -15)
        cd = c.compress(d) + c.flush()
        out = struct.pack("<BBBBIBBH", 0x1F, 0x8B, 8, 4, 0, 0, 0xFF, 6)
        out += struct.pack("<BBHH", 66, 67, 2, len(cd) + 25)
        out += cd + struct.pack("<II", zlib.crc32(d) & 0xFFFFFFFF, len(d))
        return out

    seq4 = "=ACMGRSVTWYHKDBN"
    body = b"BAM\x01" + struct.pack("<ii", 0, 0)
    for name, s, qual in rows:
        s4 = bytes((seq4.index(s[i]) << 4)
                   | (seq4.index(s[i + 1]) if i + 1 < len(s) else 0)
                   for i in range(0, len(s), 2))
        r = struct.pack("<iiBBHHHiiii", -1, -1, len(name) + 1, 0, 0, 0, 4,
                        len(s), -1, -1, 0)
        r += name.encode() + b"\0" + s4
        r += bytes(min(ord(c) - 33, 93) for c in qual)
        body += struct.pack("<i", len(r)) + r
    path.write_bytes(bgzf(body) + bgzf(b""))


def write_inputs(case: dict, d: Path):
    """Materialize ref FASTA + read inputs for a case under directory d.
    Returns (ref_fa_path, input_args) — input_args is the CLI fragment
    shared verbatim by our CLI and the reference binary."""
    d.mkdir(parents=True, exist_ok=True)
    fa = d / "ref.fa"
    with open(fa, "w") as f:
        for nm, seq in case["ref"]:
            f.write(f">{nm}\n")
            for i in range(0, len(seq), 70):
                f.write(seq[i:i + 70] + "\n")
    fmt = case["fmt"]
    q = lambda r: r[2] if r[2] is not None else "I" * len(r[1])
    if fmt == "fastq":
        p = d / "reads.fq"
        p.write_text("".join(f"@{n}\n{s}\n+\n{q((n, s, qq))}\n"
                             for n, s, qq in case["reads"]))
        return fa, ["-U", str(p)]
    if fmt == "fasta":
        p = d / "reads.fa"
        p.write_text("".join(f">{n}\n{s}\n" for n, s, _ in case["reads"]))
        return fa, ["-f", "-U", str(p)]
    if fmt == "raw":
        p = d / "reads.raw"
        p.write_text("".join(s + "\n" for _, s, _ in case["reads"]))
        return fa, ["-r", "-U", str(p)]
    if fmt == "tab5":
        p = d / "reads.tab"
        p.write_text("".join(f"{n}\t{s}\t{q(r)}\n"
                             for r in case["reads"]
                             for n, s in [(r[0], r[1])]))
        return fa, ["--12", str(p)]
    if fmt == "cline":
        seqs = ",".join(s for _, s, _ in case["reads"])
        return fa, ["-c", seqs]
    if fmt == "qseq":
        p = d / "reads.qseq"
        lines = []
        for i, (n, s, qq) in enumerate(case["reads"]):
            qs = qq if qq is not None else "I" * len(s)
            lines.append(f"M\t1\t2\t3\t4\t{i}\t0\t1\t{s}\t{qs}\t1\n")
        p.write_text("".join(lines))
        return fa, ["--qseq", "-U", str(p)]
    if fmt == "bam":
        p = d / "reads.bam"
        _write_unaligned_bam(p, [(n, s, q((n, s, qq)))
                                 for n, s, qq in case["reads"]])
        return fa, ["-b", "-U", str(p)]
    if fmt == "pair_fastq":
        p1, p2 = d / "m1.fq", d / "m2.fq"
        p1.write_text("".join(f"@{n}\n{s}\n+\n{q((n, s, qq))}\n"
                              for n, s, qq in case["m1"]))
        p2.write_text("".join(f"@{n}\n{s}\n+\n{q((n, s, qq))}\n"
                              for n, s, qq in case["m2"]))
        return fa, ["-1", str(p1), "-2", str(p2)]
    if fmt == "pair_tab6":
        p = d / "pairs.tab"
        rows = []
        for r1, r2 in zip(case["m1"], case["m2"]):
            rows.append(f"{r1[0]}\t{r1[1]}\t{q(r1)}\t"
                        f"{r2[1]}\t{q(r2)}\n")
        p.write_text("".join(rows))
        return fa, ["--12", str(p)]
    if fmt == "pair_interleaved":
        p = d / "inter.fq"
        rows = []
        for r1, r2 in zip(case["m1"], case["m2"]):
            rows.append(f"@{r1[0]}\n{r1[1]}\n+\n{q(r1)}\n")
            rows.append(f"@{r2[0]}\n{r2[1]}\n+\n{q(r2)}\n")
        p.write_text("".join(rows))
        return fa, ["--interleaved", str(p)]
    raise ValueError(fmt)


# fields compared per record (SAM core + the stable tag set)
CORE_FIELDS = ("flag", "rname", "pos", "mapq", "cigar", "rnext", "pnext",
               "tlen")
TAG_FIELDS = ("AS", "XS", "NM", "MD", "XM", "XO", "XG", "XN", "YS", "YT",
              "YM", "YF")


def parse_sam_body(text: str):
    """[(qname, {field: value})] for every non-header record."""
    out = []
    for line in text.splitlines():
        if not line or line.startswith("@"):
            continue
        f = line.split("\t")
        rec = dict(flag=int(f[1]), rname=f[2], pos=int(f[3]),
                   mapq=int(f[4]), cigar=f[5], rnext=f[6],
                   pnext=int(f[7]), tlen=int(f[8]))
        for t in f[11:]:
            k, _, v = t.split(":", 2)
            if k in TAG_FIELDS:
                rec[k] = v
        out.append((f[0], rec))
    return out


def record_sort_key(item):
    q, r = item
    return (q, r["flag"] & 0xC0, r["flag"] & 0x900, r["pos"], r["cigar"])
