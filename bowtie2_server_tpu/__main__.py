"""CLI entry points (ref: the bowtie2/bowtie2-build/bowtie2-inspect wrappers
and bt2_search.cpp option surface — a subset grows here each round).

Usage:
  python -m bowtie2_server_tpu build <ref.fa> <index_base>
  python -m bowtie2_server_tpu align -x <index_base> -U <reads.fq> [-S out.sam]
         [--local] [--cpu] [--batch N]
  python -m bowtie2_server_tpu inspect <index_base> [-n | -s]
  python -m bowtie2_server_tpu server -x <index_base> [--port 8080]
"""
from __future__ import annotations

import argparse
import sys
import time


def _force_cpu():
    import jax
    jax.config.update("jax_platforms", "cpu")


def _enable_compile_cache():
    """Persistent XLA compilation cache — the fused-side gathers compile
    slowly on the axon backend (~minutes); caching makes reruns fast."""
    import jax
    from pathlib import Path
    d = Path("tmp/jax_cache")
    try:
        d.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(d))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def cmd_build(args):
    t0 = time.time()
    if args.bt2:
        # interchange format, byte-identical to bowtie2-build defaults
        # (ref: bt2_io.cpp:801 writeFromMemory; tests/test_bt2_writer.py)
        from .index.bt2_writer import write_bt2_from_fasta
        write_bt2_from_fasta(args.ref, args.base, off_rate=args.offrate,
                             ftab_chars=args.ftabchars)
        print(f"built .bt2 index {args.base} in {time.time()-t0:.1f}s",
              file=sys.stderr)
        return
    from .index.build import build_index
    idx = build_index(args.ref)
    idx.save(args.base)
    print(f"built index {args.base} ({idx.n} bp, {idx.n_refs} refs) "
          f"in {time.time()-t0:.1f}s", file=sys.stderr)


def _tab6_is_paired(path) -> bool:
    """Peek whether a tab5/tab6 file carries mate-2 columns (tab5 = 5
    fields with a shared name, tab6 = 6 fields; ref: pat.h:843)."""
    try:
        from .io.fastq import _open_maybe_compressed
        with _open_maybe_compressed(path) as f:
            for line in f:
                if isinstance(line, str):
                    line = line.encode()
                line = line.rstrip(b"\r\n")
                if line:
                    return len(line.split(b"\t")) >= 5
    except OSError:
        pass
    return False


def cmd_align(args):
    if args.srv_port is not None or args.srv_host is not None:
        # drop-in client mode: the reference client binary takes
        # --server-host/--server-port on its align command line
        # (ref: bt2_search.cpp:677-679, env vars :526-536)
        import os as _os
        args.host = args.srv_host or _os.environ.get(
            "BT2CLT_SERVER_HOST", "localhost")
        args.port = args.srv_port or int(_os.environ.get(
            "BT2CLT_SERVER_PORT", "8080"))
        args.index = str(args.index).rsplit("/", 1)[-1]
        return cmd_client(args)
    if args.preserve_tags and not args.bam:
        # ref: bt2_search.cpp:1675-1677
        sys.exit("Error: --preserve-tags can only be used when aligning "
                 "BAM reads.")
    if args.cpu:
        _force_cpu()
    _enable_compile_cache()
    from dataclasses import replace

    from .align.pipeline import SearchPolicy, UnpairedAligner
    from .index.bt2_reader import detect_index
    from .io.fastq import iter_fastq
    from .io.metrics import AlnSummary, PerfMetrics
    from .io.sam import sam_header, sam_record
    from .utils.presets import preset_params
    from .utils.simple_func import SimpleFunc

    # --end-to-end/--local exclusivity; *-local preset aliases imply --local
    # (ref: ARG_PRESET_*_LOCAL cases fall through localAlign = true)
    if getattr(args, "preset_local", None):
        args.preset = args.preset_local
        args.local = True
    if args.bwa_sw_like:
        args.local = True
    if args.sc_unmapped_tlen and not args.local:
        # ref: bt2_search.cpp:1664-1667
        sys.exit("ERROR: --soft-clipped-unmapped-tlen can only be set "
                 "for local alignments.")
    if args.trim_to is not None and (args.trim5 or args.trim3):
        # ref: bt2_search.cpp:1226 "--trim-to and --trim3/--trim5"
        sys.exit("Error: --trim-to and --trim3/--trim5 are mutually "
                 "exclusive")

    if args.ref_string:
        # --ref-string: build a throwaway index from the given sequence
        # (ref: bowtie2-server wrapper:430-443)
        from .index.build import build_index
        idx = build_index(f">ref_string\n{args.ref_string}\n")
    else:
        _, loader = detect_index(args.index)
        idx = loader(args.index)
    sc, polkw = preset_params(args.preset, args.local)
    # scoring flags share the preset/policy-string engine (ref:
    # aligner_seed_policy.cpp:356-660 — CLI flags append policy tokens)
    from .utils.presets import apply_policy_string
    toks = []
    if args.bwa_sw_like:
        # ref: bt2_search.cpp:1099-1110 ARG_BWA_SW_LIKE
        toks.append("MA=1;MMP=C3;RDG=5,2;RFG=5,2")
    if getattr(args, "noisy_hpoly", False) and args.rdg is None \
            and args.rfg is None:
        # --454/--ion-torrent: homopolymer-tolerant gap penalties
        # (ref: noisyHpolymer -> *_BADHPOLY defaults, scoring.h:73-82)
        toks.append("RDG=3,1;RFG=3,1")
    if args.multiseed:
        ms = args.multiseed.split(",")
        if not 1 <= len(ms) <= 5:
            sys.exit("Error: expected 5 or fewer comma-separated "
                     f"arguments to --multiseed, got {len(ms)}")
        toks.append(f"SEED={ms[0]}")
        if len(ms) > 1:
            toks.append(f"SEEDLEN={ms[1]}")
        if len(ms) > 2:
            toks.append("IVAL=" + ",".join(ms[2:5]))
    if args.ma is not None:
        toks.append(f"MA={args.ma}")
    if args.mp is not None:
        toks.append(f"MMP=Q,{args.mp.replace(',', ',')}"
                    if "," in args.mp else f"MMP=C{args.mp}")
    if args.np_pen is not None:
        toks.append(f"NP={args.np_pen}")
    if args.rdg is not None:
        toks.append(f"RDG={args.rdg}")
    if args.rfg is not None:
        toks.append(f"RFG={args.rfg}")
    if args.n_ceil is not None:
        toks.append(f"NCEIL={args.n_ceil}")
    if args.policy:
        toks.append(args.policy)
    if toks:
        sc, polkw = apply_policy_string(";".join(toks), sc, polkw)
    if args.ignore_quals:
        sc = sc.with_ignore_quals()
    if args.score_min:
        sc = replace(sc, score_min=SimpleFunc.parse(args.score_min))
    if args.gbar is not None:
        sc = replace(sc, gapbar=args.gbar)
    if args.bwa_sw_like:
        sc = replace(sc, bwa_sw_like=True)
    if args.fail_streak is not None:
        polkw["dp_streak"] = args.fail_streak
    if args.seed_boost is not None:
        polkw["boost_thresh"] = args.seed_boost
    if args.exact_upfront is not None:
        polkw["no_exact_upfront"] = not args.exact_upfront
    if args.mm1_upfront is not None:
        polkw["no_1mm_upfront"] = not args.mm1_upfront
    if args.seedlen:
        polkw["seed_len"] = args.seedlen
    if args.ival:
        polkw["interval"] = SimpleFunc.parse(args.ival)
    if args.rounds:
        polkw["n_seed_rounds"] = args.rounds
    if args.dpad is not None:
        polkw["maxhalf"] = args.dpad
    # -a: unbounded reporting (ref: ReportingParams::allHits) — routes to
    # the host path with a boosted per-range resolution cap
    from .align.pipeline import ALL_HITS
    khits = ALL_HITS if args.all_hits else args.khits
    # -M: sample 1 of the best among > M alignments; -k/-a disable it
    # (ref: bt2_search.cpp:1246-1311 -M/-k/-a interplay)
    if args.mhits is not None:
        polkw["mhits"], polkw["msample"] = args.mhits, True
        khits = 1
    elif args.khits > 1 or args.all_hits:
        polkw["mhits"], polkw["msample"] = 0, False
    if args.seed_mms:
        polkw["n_seed_mms"] = args.seed_mms
    if args.non_deterministic:
        polkw["non_deterministic"] = True
    pol = SearchPolicy(khits=khits, seed=args.seed, **polkw)
    # input quality encoding (ref: qual.h:105 charToPhred33)
    from .io.fastq import make_qual_conv
    qual_conv = make_qual_conv(phred64=args.phred64, solexa=args.solexa,
                               int_quals=args.int_quals)

    # --sample: keep a read iff LCG(ROTL(per-read content seed, 2))'s
    # first float < frac (exact port of bt2_search.cpp:3219-3222; pairs
    # sample on mate 1's seed like the reference's read_a().seed)
    sample_on = args.sample is not None and args.sample < 1.0

    def _sample_keep(b):
        import numpy as np
        from .utils.rng import RandomSource, gen_rand_seeds_batch
        seeds = gen_rand_seeds_batch(
            b.seqs, b.lens, np.clip(b.quals + 33, 33, 255),
            [nm.encode() if isinstance(nm, str) else nm for nm in b.names],
            args.seed)
        keep = []
        for i, s in enumerate(seeds):
            s = int(s)
            r = RandomSource(((s << 2) | (s >> 30)) & 0xFFFFFFFF)
            if r.next_float() < args.sample:
                keep.append(i)
        return keep

    def _sample_pair(b1, b2):
        from .io.fastq import subset_batch
        keep = _sample_keep(b1)
        return subset_batch(b1, keep), subset_batch(b2, keep)

    # --refidx: numeric RNAMEs; --fullref: keep whitespace in names
    # (default truncates at first whitespace, ref: ARG_REFIDX/ARG_FULLREF)
    if args.refidx:
        disp_names = [str(i) for i in range(len(idx.ref_names))]
    elif args.fullref:
        disp_names = list(idx.ref_names)
    else:
        disp_names = [n.split()[0] if n.split() else n
                      for n in idx.ref_names]
    hdr_text = sam_header(disp_names, idx.ref_lens, " ".join(sys.argv),
                          rg_id=args.rg_id, rg_fields=args.rg,
                          no_head=args.sam_no_head, no_sq=args.sam_no_sq)
    bam_w = None
    if args.output_bam:
        # native BAM output (the wrapper delegates this to `samtools
        # view -b`, bowtie2-server:495-505; we encode in-process)
        from .io.bam import BamWriter
        raw = open(args.S, "wb") if args.S else sys.stdout.buffer
        bam_w = BamWriter(raw, hdr_text, disp_names, idx.ref_lens)
        out = raw
    else:
        out = open(args.S, "w") if args.S else sys.stdout
        out.write(hdr_text)

    def _open_out(path, comp):
        # --un/--al [-gz|-bz2] output routing (ref: the wrapper's
        # compressed demux, bowtie2-server:489-626)
        if comp == "gz":
            import gzip
            return gzip.open(path, "wt")
        if comp == "bz2":
            import bz2
            return bz2.open(path, "wt")
        return open(path, "w")

    def _pick(plain, gz, bz2_):
        if gz:
            return gz, "gz"
        if bz2_:
            return bz2_, "bz2"
        return plain, ""

    un_path, un_comp = _pick(args.un, args.un_gz, args.un_bz2)
    al_path, al_comp = _pick(args.al, args.al_gz, args.al_bz2)
    un_f = _open_out(un_path, un_comp) if un_path else None
    al_f = _open_out(al_path, al_comp) if al_path else None
    summ = AlnSummary()
    met_fh = open(args.met_file, "w") if args.met_file else sys.stderr
    # --met-stderr/--met-file emit the reference's 129-column PerfMetrics
    # TSV at the --met cadence (ref: bt2_search.cpp:1923); --met-read
    # emits one tuple per batch
    ticker = PerfMetrics(interval=args.met, out=met_fh,
                         per_read=args.met_per_read) \
        if (args.met_stderr or args.met_file or args.met_per_read) else None

    def _wire_met(up_al):
        """Attach the live TSV sources to the aligner (DP-shape columns,
        host-traceback counters, device memory analogs)."""
        if not ticker:
            return
        up_al.want_met = True
        ticker.live_bt = up_al.bt_ctr
        try:
            import jax as _jax
            devs = [up_al.dev] + ([up_al.dev_mirror]
                                  if up_al.dev_mirror is not None else [])
            ticker.mem_index = int(sum(
                getattr(x, "nbytes", 0)
                for d in devs for x in _jax.tree_util.tree_leaves(d)))
        except Exception:
            ticker.mem_index = 0
        sa = getattr(up_al.idx.fw, "sa", None)
        ticker.mem_resolve = int(sa.nbytes) if sa is not None else 0
    t0 = time.time()
    n = n_aligned = 0
    trim_to = None
    if args.trim_to is not None:
        v = args.trim_to
        side = 3
        if ":" in v:
            s_, v = v.split(":", 1)
            if s_ not in ("3", "5"):
                sys.exit("Error: --trim-to end must be 3 or 5")
            side = int(s_)
        n_tt = int(v)
        if n_tt < 0:
            sys.exit("Error: --trim-to length must be at least 0")
        trim_to = (side, n_tt)
    fq_kw = dict(batch_size=args.batch, trim5=args.trim5, trim3=args.trim3,
                 skip=args.skip, upto=args.upto, trim_to=trim_to)
    # extra retention only the FASTQ reader supports
    fastq_kw = dict(fq_kw, keep_comment=args.sam_append_comment,
                    keep_orig=args.passthrough,
                    qname_trunc=not args.sam_no_qname_trunc,
                    qual_conv=qual_conv)

    from .io.sam import parse_sam_opt_config
    opt_flags = (parse_sam_opt_config(args.sam_opt_config)
                 if args.sam_opt_config else None)
    sam_kw = dict(xeq=args.xeq, append_comment=args.sam_append_comment,
                  show_rand_seed=args.show_rand_seed,
                  omit_sec_seq=args.omit_sec_seq, opt_flags=opt_flags)

    def write_rec(rec):
        line = sam_record(rec, disp_names, args.rg_id, **sam_kw)
        if bam_w is not None:
            bam_w.write_sam_line(line)
            return
        out.write(line + "\n")
        if args.passthrough:
            # original read record follows each SAM record (ref:
            # aln_sink.cpp:2142-2146; the wrapper demuxes on these)
            from .io.sam import passthrough_line
            out.write(passthrough_line(rec) + "\n")

    def write_fq(f, rec):
        # --un/--al demux writes reads in ORIGINAL orientation (the
        # reference echoes the input read, not the aligned-strand SEQ)
        seq = rec.orig_seq or rec.seq
        qual = rec.orig_qual or rec.qual
        f.write(f"@{rec.name}\n{seq.decode()}\n+\n"
                f"{qual.decode() or 'I'*len(seq)}\n")

    if args.bam and args.align_paired_reads:
        # --align-paired-reads: paired records in a BAM align as pairs
        # (ref: pat.h:1074 BAMPatternSource, gAlignPairedBAM)
        from .align.paired import PairedAligner, PairedPolicy
        from .io.bam import iter_bam_paired
        pe = PairedPolicy(pol=args.orient, minfrag=args.minins,
                          maxfrag=args.maxins)
        pal = PairedAligner(idx, scoring=sc, policy=pol, pe=pe,
                            no_mixed=args.no_mixed,
                            no_discordant=args.no_discordant,
                            sc_unmapped_tlen=args.sc_unmapped_tlen)
        _wire_met(pal.up)
        pal.up.mapq_v = args.mapq_v
        if args.dp_log_opp:
            pal.dp_log_opp = open(args.dp_log_opp, "w")
        for b1, b2 in iter_bam_paired(args.U, batch_size=args.batch):
            pairs = pal.align_batch(b1, b2)
            for r1, r2 in pairs:
                write_rec(r1)
                write_rec(r2)
                summ.add_pair(r1, r2)
            n += 2 * len(pairs)
            n_aligned += sum(r1.aligned + r2.aligned for r1, r2 in pairs)
    elif args.m1 and args.m2:
        from .align.paired import PairedAligner, PairedPolicy
        pe = PairedPolicy(pol=args.orient, minfrag=args.minins,
                          maxfrag=args.maxins,
                          dovetail_ok=args.dovetail,
                          contain_ok=not args.no_contain,
                          olap_ok=not args.no_overlap)
        pal = PairedAligner(idx, scoring=sc, policy=pol, pe=pe,
                            no_mixed=args.no_mixed,
                            no_discordant=args.no_discordant,
                            sc_unmapped_tlen=args.sc_unmapped_tlen)
        _wire_met(pal.up)
        pal.up.nofw, pal.up.norc = args.nofw, args.norc
        pal.up.mapq_v = args.mapq_v
        if args.dp_log_opp:
            pal.dp_log_opp = open(args.dp_log_opp, "w")
        from .io.fastq import prefetch
        it1 = prefetch(iter_fastq(args.m1, **fastq_kw))
        it2 = prefetch(iter_fastq(args.m2, **fastq_kw))
        unc_path, unc_comp = _pick(args.un_conc, args.un_conc_gz,
                                   args.un_conc_bz2)
        alc_path, alc_comp = _pick(args.al_conc, args.al_conc_gz,
                                   args.al_conc_bz2)
        unc_f = [_open_out(unc_path.replace("%", str(m)), unc_comp)
                 for m in (1, 2)] if unc_path else None
        alc_f = [_open_out(alc_path.replace("%", str(m)), alc_comp)
                 for m in (1, 2)] if alc_path else None
        for b1, b2 in zip(it1, it2):
            if sample_on:
                b1, b2 = _sample_pair(b1, b2)
            pairs = pal.align_batch(b1, b2)
            for r1, r2 in pairs:
                if not (args.no_unal and not r1.aligned and not r2.aligned):
                    write_rec(r1)
                    write_rec(r2)
                summ.add_pair(r1, r2)
                # --un-conc/--al-conc: route pairs by concordance
                # (ref: bowtie2-server wrapper:489-626 output demux)
                if unc_f and not r1.proper:
                    write_fq(unc_f[0], r1)
                    write_fq(unc_f[1], r2)
                if alc_f and r1.proper:
                    write_fq(alc_f[0], r1)
                    write_fq(alc_f[1], r2)
            n += 2 * len(pairs)
            na = sum(r1.aligned + r2.aligned for r1, r2 in pairs)
            n_aligned += na
            if ticker:
                nb = sum(len(s) for s in (b1.raw_seq + b2.raw_seq))
                ticker.add_batch(2 * len(pairs), nb, 2 * len(pairs), nb,
                                 True,
                                 con_uni=sum(1 for p1, _ in pairs
                                             if p1.proper),
                                 dis=sum(1 for p1, _ in pairs
                                         if p1.yt == "DP"),
                                 **getattr(pal, "last_metrics", {}))
        for fl in (unc_f or []) + (alc_f or []):
            fl.close()
    elif args.tab_reads and _tab6_is_paired(
            args.tab_reads if isinstance(args.tab_reads, str) else args.U):
        # paired tab6 rows align as pairs (ref: pat.h:843
        # TabbedPatternSource with secondary mate fields)
        from .align.paired import PairedAligner, PairedPolicy
        from .io.fastq import iter_tab_file
        tabsrc = (args.tab_reads if isinstance(args.tab_reads, str)
                  else args.U)
        pe = PairedPolicy(pol=args.orient, minfrag=args.minins,
                          maxfrag=args.maxins)
        pal = PairedAligner(idx, scoring=sc, policy=pol, pe=pe,
                            no_mixed=args.no_mixed,
                            no_discordant=args.no_discordant,
                            sc_unmapped_tlen=args.sc_unmapped_tlen)
        _wire_met(pal.up)
        pal.up.mapq_v = args.mapq_v
        if args.dp_log_opp:
            pal.dp_log_opp = open(args.dp_log_opp, "w")
        for b1, b2 in iter_tab_file(tabsrc, batch_size=args.batch,
                                    qual_conv=qual_conv):
            if sample_on:
                b1, b2 = _sample_pair(b1, b2)
            pairs = pal.align_batch(b1, b2)
            for r1, r2 in pairs:
                write_rec(r1)
                write_rec(r2)
                summ.add_pair(r1, r2)
            n += 2 * len(pairs)
            n_aligned += sum(r1.aligned + r2.aligned for r1, r2 in pairs)
    elif args.interleaved:
        from .align.paired import PairedAligner, PairedPolicy
        from .io.fastq import iter_interleaved
        pe = PairedPolicy(pol=args.orient, minfrag=args.minins,
                          maxfrag=args.maxins)
        pal = PairedAligner(idx, scoring=sc, policy=pol, pe=pe,
                            no_mixed=args.no_mixed,
                            no_discordant=args.no_discordant,
                            sc_unmapped_tlen=args.sc_unmapped_tlen)
        _wire_met(pal.up)
        pal.up.mapq_v = args.mapq_v
        if args.dp_log_opp:
            pal.dp_log_opp = open(args.dp_log_opp, "w")
        for b1, b2 in iter_interleaved(args.interleaved,
                                       batch_size=args.batch,
                                       qual_conv=qual_conv):
            if sample_on:
                b1, b2 = _sample_pair(b1, b2)
            pairs = pal.align_batch(b1, b2)
            for r1, r2 in pairs:
                write_rec(r1)
                write_rec(r2)
                summ.add_pair(r1, r2)
            n += 2 * len(pairs)
            n_aligned += sum(r1.aligned + r2.aligned for r1, r2 in pairs)
    else:
        from .io.fastq import (iter_cmdline_reads, iter_fasta_reads,
                               iter_raw_reads, iter_tab_file)
        if args.bam:
            from .io.bam import iter_bam
            reads_iter = iter_bam(args.U, batch_size=args.batch,
                                  preserve_tags=args.preserve_tags)
        elif args.cmdline_reads:
            reads_iter = iter_cmdline_reads(args.cmdline_reads,
                                            batch_size=args.batch,
                                            trim5=args.trim5,
                                            trim3=args.trim3,
                                            trim_to=trim_to)
        elif args.fasta_reads:
            reads_iter = iter_fasta_reads(args.U, **fq_kw)
        elif args.qseq_reads:
            from .io.fastq import iter_qseq
            reads_iter = iter_qseq(args.U, batch_size=args.batch,
                                   trim5=args.trim5, trim3=args.trim3,
                                   skip=args.skip, upto=args.upto,
                                   trim_to=trim_to)
        elif args.fasta_cont:
            from .io.fastq import iter_fasta_continuous
            kv = dict(p.split(":", 1) for p in args.fasta_cont.split(","))
            reads_iter = iter_fasta_continuous(
                args.U, length=int(kv["k"]), freq=int(kv.get("i", 1)),
                batch_size=args.batch)
        elif args.raw_reads:
            reads_iter = iter_raw_reads(args.U, batch_size=args.batch,
                                        trim5=args.trim5, trim3=args.trim3,
                                        trim_to=trim_to)
        elif args.tab_reads:
            tabsrc = (args.tab_reads if isinstance(args.tab_reads, str)
                      else args.U)
            reads_iter = (b for b, _ in iter_tab_file(
                tabsrc, batch_size=args.batch, qual_conv=qual_conv))
        else:
            reads_iter = iter_fastq(args.U, **fastq_kw)
        al = UnpairedAligner(idx, scoring=sc, policy=pol,
                             nofw=args.nofw, norc=args.norc)
        _wire_met(al)
        al.qc_filter = args.qc_filter
        al.mapq_v = args.mapq_v
        if args.dp_log:
            al.dp_log = open(args.dp_log, "w")
        if args.timing:
            al.timing = {}
        from collections import deque
        from .io.fastq import prefetch

        if sample_on:
            from .io.fastq import subset_batch
            base_iter = reads_iter
            reads_iter = (subset_batch(b, _sample_keep(b))
                          for b in base_iter)

        def batch_results():
            # double-buffered: dispatch device work for the next batch
            # before finishing the current one (ref: async readahead +
            # worker overlap, pat.h:1558)
            inflight = deque()
            for batch in prefetch(reads_iter):
                inflight.append(al.align_async(batch))
                if len(inflight) >= 3:
                    yield al.align_wait(inflight.popleft())
            while inflight:
                yield al.align_wait(inflight.popleft())

        use_native = not (args.passthrough or args.xeq
                          or args.sam_append_comment or args.show_rand_seed
                          or args.omit_sec_seq or opt_flags
                          or un_f or al_f or bam_w is not None
                          or args.preserve_tags)
        out_b = getattr(out, "buffer", None)
        for recs in batch_results():
            blob = None
            if use_native and getattr(recs, "soa", None) is not None:
                from .io.sam import sam_format_batch_native
                blob = sam_format_batch_native(
                    recs, disp_names, args.rg_id, no_unal=args.no_unal)
            if blob is not None:
                if out_b is not None:
                    out.flush()
                    out_b.write(blob)
                else:
                    out.write(blob.decode())
                na = summ.add_unpaired_soa(recs)
                n += len(recs)
                n_aligned += na
                if ticker:
                    nb = sum(len(s) for s in recs.batch.raw_seq)
                    ticker.add_batch(len(recs), nb, len(recs), nb, False,
                                     al_uni=na, **recs.metrics)
                continue
            for r in recs:
                if not (args.no_unal and not r.aligned):
                    write_rec(r)
                if not r.secondary:
                    summ.add_unpaired(r)
                    if un_f and not r.aligned:
                        write_fq(un_f, r)
                    if al_f and r.aligned:
                        write_fq(al_f, r)
            prim = [r for r in recs if not r.secondary]
            n += len(prim)
            na = sum(r.aligned for r in prim)
            n_aligned += na
            if ticker:
                nb = sum(len(r.orig_seq) for r in prim)
                ticker.add_batch(len(prim), nb, len(prim), nb, False,
                                 al_uni=na, **getattr(recs, "metrics", {}))
    dt = time.time() - t0
    if args.timing:
        # ref: timer.h Timer blocks gated by -t/--time
        tdict = getattr(locals().get("al", None), "timing", None) or {}
        for k, v in tdict.items():
            print(f"Time {k}: {v:.2f}s", file=sys.stderr)
        print(f"Overall time: {dt:.2f}s", file=sys.stderr)
    if not args.quiet:
        summ.print_summary(sys.stderr)
    print(f"# {n} reads in {dt:.1f}s = {n/max(dt,1e-9):.0f} reads/s",
          file=sys.stderr)
    for f in (un_f, al_f):
        if f:
            f.close()
    if bam_w is not None:
        bam_w.close()
    if args.S:
        out.close()


def cmd_inspect(args):
    """ref: bt2_inspect.cpp:255-330 — names, summary, or FASTA reconstruction.
    We keep the full reference (with Ns) in the index, so reconstruction is a
    direct dump rather than an LF-walk."""
    from .index.bt2_reader import detect_index
    from .utils import dna
    _, loader = detect_index(args.base)
    idx = loader(args.base)
    if args.names:
        for n in idx.ref_names:
            print(n)
        return
    if args.summary:
        print(f"Sequence-count\t{idx.n_refs}")
        for i, n in enumerate(idx.ref_names):
            print(f"Sequence-{i}\t{n}\t{int(idx.ref_lens[i])}")
        return
    for i, name in enumerate(idx.ref_names):
        s = int(idx.ref_full_start[i])
        seq = dna.decode(idx.ref_full[s : s + int(idx.ref_lens[i])])
        print(f">{name}")
        for j in range(0, len(seq), 60):
            print(seq[j : j + 60])


def cmd_server(args):
    if args.cpu:
        _force_cpu()
    _enable_compile_cache()
    from .server.bt2srv import run_server
    run_server(args.index, port=args.port, host=args.host, local=args.local,
               preset=args.preset, batch_size=args.batch,
               n_workers=args.n_workers,
               remote_workers=args.remote_workers or None)


def cmd_client(args):
    from .io.fastq import iter_fastq
    from .server.client import Bt2Client
    passthrough = getattr(args, "passthrough", False)
    cl = Bt2Client(args.host, args.port, args.index,
                   passthrough=passthrough)
    keep = passthrough
    # the client substitutes %04X slot names on the wire and restores the
    # original names on receipt (ref: pat.h:2464-2550); callers pass raw
    # names
    if args.m1 and args.m2:
        def rows():
            for b1, b2 in zip(
                    iter_fastq(args.m1, batch_size=1024, keep_orig=keep),
                    iter_fastq(args.m2, batch_size=1024, keep_orig=keep)):
                for i in range(len(b1)):
                    r = (b1.names[i], b1.raw_seq[i], b1.raw_qual[i],
                         b2.names[i], b2.raw_seq[i], b2.raw_qual[i])
                    if keep and b1.origs is not None:
                        r = r + ((b1.origs[i], b2.origs[i]),)
                    yield r
    else:
        def rows():
            for b in iter_fastq(args.U, batch_size=1024, keep_orig=keep):
                for i in range(len(b)):
                    r = (b.names[i], b.raw_seq[i], b.raw_qual[i])
                    if keep and b.origs is not None:
                        r = r + (b.origs[i],)
                    yield r
    cl.send_reads(rows())
    out = open(args.S, "w") if args.S else sys.stdout
    n = 0
    for line in cl.finish():
        out.write(line + "\n")
        n += 1
    print(f"received {n} SAM records", file=sys.stderr)
    if args.S:
        out.close()


def cmd_dp(args):
    """Standalone DP problem solver (ref: bt2_dp.cpp, fed by --dp-log) —
    reads tab-separated problems `read_seq<TAB>ref_seq` from a file or
    stdin, scores them with the batched kernels, prints
    score/end-cell/CIGAR per line. For kernel benchmarking and fuzzing."""
    if args.cpu:
        _force_cpu()
    import numpy as np

    from .align.edits import cigar_md_stats, traceback
    from .ops.sw import SwConfig, sw_align_batch
    from .utils import dna

    cfg = SwConfig(ma=2, local=True) if args.local else SwConfig()
    src = open(args.input) if args.input != "-" else sys.stdin
    rows = []
    for line in src:
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        rd_s, ref_s = line.split("\t")[:2]
        rows.append((dna.encode(rd_s), dna.encode(ref_s)))
    if not rows:
        return
    lq = max(len(r) for r, _ in rows)
    lc = max(len(f) for _, f in rows)
    B = len(rows)
    rd = np.full((B, lq), 5, np.uint8)
    ref = np.full((B, lc), 4, np.uint8)
    lens = np.zeros(B, np.int32)
    reflens = np.zeros(B, np.int32)
    for i, (r, f) in enumerate(rows):
        rd[i, :len(r)] = r
        ref[i, :len(f)] = f
        lens[i] = len(r)
        reflens[i] = len(f)
    mm = np.full((B, lq), 6, np.int32)
    best, bi, bj = sw_align_batch(rd, lens, mm, ref, reflens, cfg)
    for i in range(B):
        r, f = rows[i]
        try:
            edits, start, rs = traceback(r, mm[i, :len(r)], f, cfg,
                                         int(bi[i]), int(bj[i]))
            st = cigar_md_stats(len(r), edits, rs, int(bi[i]) + 1)
            cig, md = st["cigar"], st["md"]
        except Exception:
            cig = md = "?"
        print(f"{int(best[i])}\t{int(bi[i])}\t{int(bj[i])}\t{start}\t"
              f"{cig}\t{md}")


def make_parser():
    p = argparse.ArgumentParser(prog="bowtie2_server_tpu")
    p.add_argument("--version", action="version",
                   version="bowtie2_server_tpu 0.1.0 (capabilities of "
                   "bowtie2-server 2.5.4)")
    sub = p.add_subparsers(dest="cmd", required=True)

    pb = sub.add_parser("build")
    pb.add_argument("ref")
    pb.add_argument("base")
    pb.add_argument("-o", "--offrate", type=int, default=4,
                    help="SA sampling exponent for --bt2 output "
                    "(ref: bowtie2-build -o)")
    pb.add_argument("-t", "--ftabchars", type=int, default=10,
                    help="ftab k-mer length for --bt2 output "
                    "(ref: bowtie2-build -t)")
    pb.add_argument("--bt2", action="store_true",
                    help="emit the reference .bt2 six-file format "
                    "(byte-identical to bowtie2-build defaults) instead "
                    "of the native .fm.npz")
    pb.set_defaults(fn=cmd_build)

    pa = sub.add_parser("align")
    pa.add_argument("-x", "--index", dest="index", default=None)
    pa.add_argument("--ref-string", dest="ref_string", default=None)
    pa.add_argument("-U", "--unpaired", dest="U", default=None)
    pa.add_argument("-1", dest="m1", default=None)
    pa.add_argument("-2", dest="m2", default=None)
    pa.add_argument("-S", "--output", dest="S", default=None)
    # --local / --end-to-end share one dest: LAST WINS, as in the
    # reference (localAlign just flips, bt2_search.cpp:1415/1419 — no
    # mutual-exclusion error)
    pa.add_argument("--local", dest="local", action="store_const",
                    const=True, default=False)
    pa.add_argument("--end-to-end", dest="local", action="store_const",
                    const=False,
                    help="end-to-end alignment mode (the default; last of "
                    "--local/--end-to-end wins; ref: ARG_END_TO_END)")
    pa.add_argument("--preset", default=None,
                    help="very-fast|fast|sensitive|very-sensitive[-local]")
    pa.add_argument("--very-fast", dest="preset", action="store_const",
                    const="very-fast")
    pa.add_argument("--fast", dest="preset", action="store_const",
                    const="fast")
    pa.add_argument("--sensitive", dest="preset", action="store_const",
                    const="sensitive")
    pa.add_argument("--very-sensitive", dest="preset", action="store_const",
                    const="very-sensitive")
    pa.add_argument("--very-fast-local", dest="preset_local",
                    action="store_const", const="very-fast")
    pa.add_argument("--fast-local", dest="preset_local",
                    action="store_const", const="fast")
    pa.add_argument("--sensitive-local", dest="preset_local",
                    action="store_const", const="sensitive")
    pa.add_argument("--very-sensitive-local", dest="preset_local",
                    action="store_const", const="very-sensitive")
    pa.add_argument("--cpu", action="store_true")
    pa.add_argument("--batch", "--reads-per-batch", type=int, default=2048)
    pa.add_argument("-k", "--khits", dest="khits", type=int, default=1)
    pa.add_argument("-a", "--all", dest="all_hits", action="store_true")
    pa.add_argument("-N", "--seedmms", dest="seed_mms", type=int, default=0,
                    choices=(0, 1),
                    help="mismatches allowed inside a seed "
                    "(ref: searchSeedBi, aligner_seed.cpp:668)")
    pa.add_argument("-M", dest="mhits", type=int, default=None,
                    help="sample 1 best alignment when > M exist "
                    "(ref: bt2_search.cpp:1246)")
    pa.add_argument("--nofw", action="store_true")
    pa.add_argument("--norc", action="store_true")
    pa.add_argument("--ignore-quals", dest="ignore_quals",
                    action="store_true")
    pa.add_argument("--score-min", "--min-score", dest="score_min", default=None)
    pa.add_argument("--ma", type=int, default=None,
                    help="match bonus (ref: MA policy token)")
    pa.add_argument("--mp", default=None,
                    help="MX[,MN] max/min mismatch penalty (ref: MMP)")
    pa.add_argument("--np", dest="np_pen", type=int, default=None,
                    help="penalty for N in read or reference (ref: NP)")
    pa.add_argument("--rdg", default=None,
                    help="read gap open,extend penalties (ref: RDG)")
    pa.add_argument("--rfg", default=None,
                    help="ref gap open,extend penalties (ref: RFG)")
    pa.add_argument("--n-ceil", dest="n_ceil", default=None,
                    help="max Ns function, e.g. L,0,0.15 (ref: NCEIL)")
    pa.add_argument("--policy", default=None,
                    help="raw ';'-separated policy string "
                    "(ref: aligner_seed_policy.cpp)")
    pa.add_argument("-L", "--seedlen", dest="seedlen", type=int, default=None)
    pa.add_argument("-i", "--seedival", dest="ival", default=None)
    pa.add_argument("-R", "--seed-rounds", dest="rounds", type=int, default=None)
    pa.add_argument("--dpad", type=int, default=None,
                    help="DP padding: max gap excursion per side (default "
                    "15; widens the banded kernel per policy — the "
                    "long-read sensitivity knob; ref: bt2_search.cpp "
                    "maxhalf/--dpad)")
    pa.add_argument("-5", "--trim5", dest="trim5", type=int, default=0)
    pa.add_argument("-3", "--trim3", dest="trim3", type=int, default=0)
    pa.add_argument("--trim-to", dest="trim_to", default=None,
                    help="[3:|5:]N — trim reads longer than N to N bases "
                    "from the given end (default 3'); mutually exclusive "
                    "with -3/-5 (ref: bt2_search.cpp:1219 ARG_TRIM_TO)")
    pa.add_argument("-s", "--skip", dest="skip", type=int, default=0)
    pa.add_argument("-u", "--upto", "--qupto", dest="upto", type=int,
                    default=None)
    pa.add_argument("--sample", type=float, default=None,
                    help="align only this random fraction of reads, "
                    "chosen by the per-read content seed "
                    "(ref: sampleFrac, bt2_search.cpp:3219)")
    pa.add_argument("--gbar", type=int, default=None,
                    help="disallow gaps within this many bases of the "
                    "read ends (default 4; ref: scoring.h gapbar)")
    pa.add_argument("-D", "--fail-streak", dest="fail_streak", type=int,
                    default=None,
                    help="consecutive failed extend attempts before "
                    "giving up on a read (ref: maxDpStreak/-D, "
                    "bt2_search.cpp:1740)")
    pa.add_argument("--dp-fail-streak", dest="fail_streak", type=int,
                    help="alias of -D for the DP streak "
                    "(ref: ARG_DP_FAIL_STREAK_THRESH)")
    pa.add_argument("--seed-boost", dest="seed_boost", type=int,
                    default=None,
                    help="reseed when avg hits per nonzero seed >= this "
                    "(default 300; ref: seedBoostThresh)")
    pa.add_argument("--exact-upfront", dest="exact_upfront",
                    action="store_true", default=None,
                    help="do the up-front exact sweep (default on)")
    pa.add_argument("--no-exact-upfront", dest="exact_upfront",
                    action="store_false",
                    help="skip the up-front exact full-read sweep "
                    "(ref: doExactUpFront, bt2_search.cpp:3454)")
    pa.add_argument("--1mm-upfront", dest="mm1_upfront",
                    action="store_true", default=None,
                    help="do the up-front 1-mismatch search (default on)")
    pa.add_argument("--no-1mm-upfront", dest="mm1_upfront",
                    action="store_false",
                    help="skip the up-front 1-mismatch end-to-end search "
                    "(ref: do1mmUpFront, bt2_search.cpp:3634)")
    pa.add_argument("--1mm-minlen", type=int, default=60,
                    help="accepted for compatibility (parsed but unused "
                    "by the reference too: do1mmMinLen is set at "
                    "bt2_search.cpp:1438 and never consulted)")
    pa.add_argument("--refidx", action="store_true",
                    help="print reference index (0-based ordinal) instead "
                    "of the reference name in SAM (ref: ARG_REFIDX)")
    pa.add_argument("--fullref", action="store_true",
                    help="print the whole reference name including "
                    "whitespace (default: truncate at first whitespace; "
                    "ref: ARG_FULLREF)")
    pa.add_argument("--sam-no-head", "--sam-nohead", "--sam-noHD",
                    "--sam-no-hd", "--no-head", "--no-hd", "--no-HD",
                    dest="sam_no_head", action="store_true",
                    help="suppress all SAM header lines "
                    "(ref: ARG_SAM_NOHEAD)")
    pa.add_argument("--sam-no-sq", "--sam-nosq", "--sam-noSQ", "--no-sq",
                    "--no-SQ", dest="sam_no_sq", action="store_true",
                    help="suppress @SQ header lines (ref: ARG_SAM_NOSQ)")
    pa.add_argument("--omit-sec-seq", "--sam-omit-sec-seq",
                    dest="omit_sec_seq", action="store_true",
                    help="print * for SEQ/QUAL of secondary alignments "
                    "(ref: ARG_SAM_OMIT_SEC_SEQ)")
    pa.add_argument("--sam-opt-config", dest="sam_opt_config", default=None,
                    help="comma-separated optional-tag toggles, 'tag' "
                    "enables and '-tag' disables, e.g. '-md,-xs' "
                    "(ref: sam.h:162 toggleOptFlagByName)")
    pa.add_argument("-I", "--minins", dest="minins", type=int, default=0)
    pa.add_argument("-X", "--maxins", dest="maxins", type=int, default=500)
    pa.add_argument("--fr", dest="orient", action="store_const",
                    const="FR", default="FR")
    pa.add_argument("--rf", dest="orient", action="store_const", const="RF")
    pa.add_argument("--ff", dest="orient", action="store_const", const="FF")
    pa.add_argument("--no-mixed", dest="no_mixed", action="store_true")
    pa.add_argument("--no-discordant", dest="no_discordant",
                    action="store_true")
    pa.add_argument("--dovetail", action="store_true")
    pa.add_argument("--no-contain", dest="no_contain", action="store_true")
    pa.add_argument("--no-overlap", dest="no_overlap", action="store_true")
    pa.add_argument("--un", default=None)
    pa.add_argument("--al", default=None)
    pa.add_argument("--un-gz", dest="un_gz", default=None,
                    help="like --un, gzip-compressed (ref: wrapper demux)")
    pa.add_argument("--un-bz2", dest="un_bz2", default=None)
    pa.add_argument("--al-gz", dest="al_gz", default=None)
    pa.add_argument("--al-bz2", dest="al_bz2", default=None)
    pa.add_argument("--un-conc-gz", dest="un_conc_gz", default=None)
    pa.add_argument("--un-conc-bz2", dest="un_conc_bz2", default=None)
    pa.add_argument("--al-conc-gz", dest="al_conc_gz", default=None)
    pa.add_argument("--al-conc-bz2", dest="al_conc_bz2", default=None)
    pa.add_argument("--un-conc", dest="un_conc", default=None,
                    help="write non-concordant pairs to files (use %% for "
                    "the mate number)")
    pa.add_argument("--al-conc", dest="al_conc", default=None,
                    help="write concordant pairs to files")
    pa.add_argument("--no-unal", dest="no_unal", action="store_true")
    pa.add_argument("--rg-id", "--sam-rg-id", dest="rg_id", default=None)
    pa.add_argument("--rg", "--sam-rg", "--sam-RG", "--RG", action="append",
                    default=[])
    pa.add_argument("--met-stderr", "--metrics-stderr", dest="met_stderr",
                    action="store_true")
    pa.add_argument("--met-file", "--metrics-file", dest="met_file",
                    default=None)
    pa.add_argument("--met", "--metrics", type=float, default=1.0)
    pa.add_argument("--met-read", "--metrics-per-read", dest="met_per_read",
                    action="store_true")
    pa.add_argument("--quiet", action="store_true")
    pa.add_argument("-t", "--time", dest="timing", action="store_true",
                    help="print stage wall-clock times")
    pa.add_argument("--dp-log", "--log-dp", dest="dp_log", default=None,
                    help="log DP problems (replayable with the dp "
                    "subcommand)")
    pa.add_argument("-p", "--threads", type=int, default=1,
                    help="accepted for compatibility (batching replaces "
                    "thread-level parallelism)")
    pa.add_argument("--mapq-v", dest="mapq_v", type=int, default=2,
                    choices=(1, 2, 3),
                    help="MAPQ calculation version (ref: unique.h:509 "
                    "new_mapq; default 2)")
    pa.add_argument("--non-deterministic", "--nondeterministic",
                    dest="non_deterministic",
                    action="store_true",
                    help="seed per-read RNG from wall clock instead of "
                    "read content (ref: bt2_search.cpp:3215)")
    pa.add_argument("--phred33", "--phred33-quals", action="store_true",
                    help="input qualities are Phred+33 (default)")
    pa.add_argument("--phred64", "--phred64-quals", "--solexa1.3-quals",
                    dest="phred64", action="store_true",
                    help="input qualities are Phred+64 "
                    "(ref: qual.h:125)")
    pa.add_argument("--solexa-quals", dest="solexa", action="store_true",
                    help="input qualities are Solexa log-odds +64 "
                    "(ref: qual.h:113, qual.cpp:57 solToPhred)")
    pa.add_argument("--int-quals", "--integer-quals", dest="int_quals",
                    action="store_true",
                    help="input qualities are space-separated integers "
                    "(ref: qual.h:156 intToPhred33)")
    pa.add_argument("--seed", type=int, default=0,
                    help="global seed mixed into per-read tie-break RNG "
                    "(ref: genRandSeed, pat.cpp:51)")
    pa.add_argument("--reorder", action="store_true",
                    help="accepted for compatibility (output is always "
                    "in input order)")
    pa.add_argument("--passthrough", action="store_true",
                    help="emit the %%-escaped original read record after "
                    "each SAM record (ref: ARG_READ_PASSTHRU)")
    pa.add_argument("--xeq", action="store_true",
                    help="use =/X instead of M in CIGAR (ref: ARG_XEQ)")
    pa.add_argument("--sam-append-comment", dest="sam_append_comment",
                    action="store_true",
                    help="append FASTQ comment to the SAM record "
                    "(ref: ARG_SAM_APPEND_COMMENT)")
    pa.add_argument("--sam-no-qname-trunc", dest="sam_no_qname_trunc",
                    action="store_true",
                    help="keep whole read names incl. whitespace "
                    "(ref: samTruncQname)")
    pa.add_argument("--show-rand-seed", dest="show_rand_seed",
                    action="store_true",
                    help="emit ZS:i per-read random seed "
                    "(ref: ARG_SHOW_RAND_SEED)")
    pa.add_argument("-f", dest="fasta_reads", action="store_true",
                    help="reads are FASTA")
    pa.add_argument("--qseq", dest="qseq_reads", action="store_true",
                    help="reads are Illumina qseq (ref: read_qseq.cpp)")
    pa.add_argument("-F", dest="fasta_cont", default=None,
                    help="k:<len>,i:<ivl> FASTA-continuous windows "
                    "(ref: pat.h:956)")
    pa.add_argument("--qc-filter", dest="qc_filter", action="store_true",
                    help="drop reads whose qseq filter flag is 0")
    pa.add_argument("-r", dest="raw_reads", action="store_true",
                    help="reads are raw one-per-line")
    pa.add_argument("-c", dest="cmdline_reads", default=None,
                    help="comma-separated reads on the command line")
    pa.add_argument("--tab5", "--tab6", "--12", dest="tab_reads",
                    nargs="?", const=True, default=None,
                    help="reads are tab5/tab6; with a value, that file is "
                    "the input (ref: ARG_TAB5/ARG_TAB6/ARG_ONETWO)")
    pa.add_argument("-q", dest="fastq_reads", action="store_true",
                    help="reads are FASTQ (the default)")
    pa.add_argument("--interleaved", default=None,
                    help="interleaved paired FASTQ file")
    pa.add_argument("-b", "--bam", action="store_true",
                    help="reads are in BAM format")
    pa.add_argument("--output-bam", dest="output_bam",
                    action="store_true",
                    help="write BAM instead of SAM (the wrapper's --bam, "
                    "encoded natively instead of via samtools)")
    pa.add_argument("--align-paired-reads", dest="align_paired_reads",
                    action="store_true",
                    help="align paired BAM records as pairs "
                    "(ref: pat.h:1074)")
    pa.add_argument("--454", "--ion-torrent", dest="noisy_hpoly",
                    action="store_true",
                    help="homopolymer-tolerant gap penalties RDG=3,1 "
                    "RFG=3,1 (ref: noisyHpolymer, scoring.h:73-82)")
    pa.add_argument("--multiseed", default=None,
                    help="mms,len,ival[,extra] — set -N, -L and -i in one "
                    "flag (ref: ARG_MULTISEED_IVAL -> SEED/IVAL policy "
                    "tokens)")
    pa.add_argument("--bwa-sw-like", dest="bwa_sw_like",
                    action="store_true",
                    help="BWA-SW-like scoring: local with MA=1, MMP=C3, "
                    "RDG=5,2, RFG=5,2, MIN=C,1 (ref: bwaSwLike, "
                    "bt2_search.cpp:1421-1432)")
    pa.add_argument("--no-dovetail", dest="dovetail",
                    action="store_false",
                    help="dovetailing pairs are not concordant (default)")
    pa.add_argument("--contain", dest="no_contain", action="store_false",
                    help="a mate containing the other is concordant "
                    "(default)")
    pa.add_argument("--overlap", dest="no_overlap", action="store_false",
                    help="overlapping mates are concordant (default)")
    pa.add_argument("--preserve-tags", dest="preserve_tags",
                    action="store_true",
                    help="BAM input: pass the original records' optional "
                    "tags through to the output (ref: bt2_search.cpp:736, "
                    "sam.cpp:881 printPreservedOptFlags)")
    pa.add_argument("--soft-clipped-unmapped-tlen", dest="sc_unmapped_tlen",
                    action="store_true",
                    help="local mode: exclude soft-clipped bases from TLEN "
                    "(ref: bt2_search.cpp:731 ARG_SC_UNMAPPED_TLEN)")
    pa.add_argument("--log-dp-opp", dest="dp_log_opp", default=None,
                    help="log opposite-mate (rescue) DP problems to FILE "
                    "(ref: bt2_search.cpp:730 ARG_LOG_DP_OPP)")
    pa.add_argument("--server-host", dest="srv_host", default=None,
                    help="client drop-in: align via a running server "
                    "(ref: opts.h:166; env BT2CLT_SERVER_HOST)")
    pa.add_argument("--server-port", dest="srv_port", type=int, default=None,
                    help="client drop-in: align via a running server "
                    "(ref: opts.h:167; env BT2CLT_SERVER_PORT)")
    pa.add_argument("--wrapper", default=None,
                    help="accepted for compatibility; the Perl wrapper "
                    "passes --wrapper basic-0 (ref: bt2_search.cpp:749)")
    pa.add_argument("--mapq-print-inputs", "--mapq-extra-inputs",
                    action="store_true",
                    help="accepted for compatibility; no-op: the "
                    "reference's YI:Z writer is commented out "
                    "(unique.h:383-390), so the flag changes nothing "
                    "observable there either")
    pa.add_argument("--version", action="version",
                    version="bowtie2_server_tpu 0.1.0 (capabilities of "
                    "bowtie2-server 2.5.4)")
    pa.add_argument("--usage", action="help",
                    help="print usage (ref: --usage)")

    class _ArgDesc(argparse.Action):
        def __call__(self, parser, ns, values, option_string=None):
            # name\t0|1 per option (ref: bt2_search.cpp:750 printArgDesc)
            for act in parser._actions:
                takes = 0 if act.nargs in (0, None) and isinstance(
                    act, (argparse._StoreTrueAction, argparse._StoreFalseAction,
                          argparse._HelpAction, argparse._VersionAction,
                          _ArgDesc)) else 1
                for opt in act.option_strings:
                    print(f"{opt.lstrip('-')}\t{takes}")
            parser.exit(0)

    pa.add_argument("--arg-desc", nargs=0, action=_ArgDesc,
                    help="print option names and arg arity, then exit "
                    "(ref: bt2_search.cpp:750)")

    # ---- accepted no-ops (structural in this design; see README compat
    # table). Each names the reference knob it would map to. ----
    for flag, why in (
            ("--ungapped", "ungapped extension is certified on device for "
             "every candidate already"),
            ("--no-ungapped", "DP scores ungapped alignments identically"),
            ("--sse8", "Pallas int32 lanes replace SSE u8"),
            ("--no-sse8", "Pallas int32 lanes replace SSE i16"),
            ("--cache", "batch dedup replaces the seed cache"),
            ("--no-cache", "batch dedup replaces the seed cache"),
            ("--mm", "the index is HBM-resident, shared across batches"),
            ("--shmem", "the index is HBM-resident"),
            ("--filepar", "input is batch-pipelined"),
            ("--tri", "the banded kernel needs no checkpoint triangles"),
            ("--read-times", "per-batch timing rides -t"),
            ("--scan-narrowed", "SA resolution is exhaustive, not lazy"),
            ("--sanity", "differential tests replace in-process checks"),
            ("--verbose", "diagnostics go to stderr already"),
            ("--startverbose", "diagnostics go to stderr already"),
            ("--mapq-extra", "MAPQ inputs ride --mapq-print-inputs"),
            ("--no-extend", "seed hits are always DP-extended in batch"),
    ):
        pa.add_argument(flag, action="store_true",
                        help=f"accepted for compatibility; no-op: {why}")
    for flag, why in (
            ("--cachelim", "batch dedup replaces the seed cache"),
            ("--cachesz", "batch dedup replaces the seed cache"),
            ("--local-seed-cache-sz", "batch dedup replaces the cache"),
            ("--seed-cache-sz", "batch dedup replaces the cache"),
            ("--cp-min", "the banded kernel stores O(L*K), no checkpoints"),
            ("--cp-ival", "the banded kernel stores O(L*K)"),
            ("--ee-fail-streak", "exact sweep is one fused batch op"),
            ("--ug-fail-streak", "ungapped certification is free on "
             "device"),
            ("--dp-fails", "DP runs batched, -D caps the retry loop"),
            ("--ug-fails", "ungapped certification is free on device"),
            ("--extends", "extension is one batched DP"),
            ("--tighten", "ReportingState tightening is structural"),
            ("-O", "parsed but unused by the reference too "
             "(multiseedOff, bt2_search.cpp:224)"),
            ("--seed-off", "parsed but unused by the reference too"),
            ("--thread-ceiling", "batching replaces thread elasticity"),
            ("--thread-piddir", "batching replaces thread elasticity"),
    ):
        pa.add_argument(flag, default=None,
                        help=f"accepted for compatibility; no-op: {why}")

    # ---- explicitly rejected (no silent accepts): each errors with the
    # reason. See README compat table. ----
    class _Reject(argparse.Action):
        def __call__(self, parser, ns, values, option_string=None):
            parser.error(f"{option_string} is not supported: {self.help}")

    for flag, why in (
            ("--bowtie2p5", "the deprecated 2.5 descent engine "
             "(aligner_seed2.cpp) is out of scope; use the default "
             "multiseed engine"),
            ("--desc-kb", "2.5 descent engine knob (see --bowtie2p5)"),
            ("--desc-landing", "2.5 descent engine knob"),
            ("--desc-exp", "2.5 descent engine knob"),
            ("--desc-prioritize", "2.5 descent engine knob"),
            ("--desc-fmops", "2.5 descent engine knob"),
            ("--test-25", "2.5 descent engine knob"),
            ("--sra-acc", "SRA input needs the NCBI SRA toolkit, which "
             "is optional in the reference too (USE_SRA)"),
            ("--hadoopout", "legacy Hadoop streaming output"),
            ("--partition", "legacy partitioned output"),
            ("--snpphred", "legacy SNP-aware colorspace option"),
            ("--snpfrac", "legacy SNP-aware colorspace option"),
            ("--orig", "legacy sanity-check option"),
            ("--pause", "debugger aid"),
            ("--mmsweep", "mmap page-sweep; index is HBM-resident"),
            ("--seed-summ", "per-seed summary debug dump"),
            ("--seed-summary", "per-seed summary debug dump"),
            ("--overhang", "reference-overhanging alignments are "
             "filtered, as in the reference default"),
            ("-Q", "bowtie1-era FASTA+quals input; provide FASTQ "
             "instead"),
            ("--quals", "bowtie1-era FASTA+quals input; provide FASTQ"),
            ("--Q1", "bowtie1-era FASTA+quals input; provide FASTQ"),
            ("--Q2", "bowtie1-era FASTA+quals input; provide FASTQ"),
    ):
        pa.add_argument(flag, nargs="?", action=_Reject, help=why,
                        metavar="")
    pa.set_defaults(fn=cmd_align)

    pi = sub.add_parser("inspect")
    pi.add_argument("base")
    pi.add_argument("-n", dest="names", action="store_true")
    pi.add_argument("-s", dest="summary", action="store_true")
    pi.set_defaults(fn=cmd_inspect)

    ps = sub.add_parser("server")
    ps.add_argument("-x", dest="index", required=True)
    ps.add_argument("--port", type=int, default=8080)
    ps.add_argument("--host", default="0.0.0.0")
    ps.add_argument("--local", action="store_true")
    ps.add_argument("--preset", default=None)
    ps.add_argument("--cpu", action="store_true")
    ps.add_argument("--batch", type=int, default=4096)
    ps.add_argument("--workers", dest="n_workers", type=int, default=1,
                    help="device groups serving packs (round-robin "
                    "dispatch across connections; ref: the shared worker "
                    "pool, pat.cpp:2016-2086)")
    ps.add_argument("--remote-worker", dest="remote_workers",
                    action="append", default=[], metavar="HOST:PORT",
                    help="add a backend BT2SRV server (one per remote "
                    "host over DCN) to the worker pool; packs relay over "
                    "the wire protocol and merge in submission order "
                    "(multi-host scale-out, SURVEY §2.3 row 3)")
    ps.set_defaults(fn=cmd_server)

    pc = sub.add_parser("client")
    import os as _os
    pc.add_argument("--host", "--server-host",
                    default=_os.environ.get("BT2CLT_SERVER_HOST",
                                            "localhost"))
    pc.add_argument("--port", "--server-port", type=int,
                    default=int(_os.environ.get("BT2CLT_SERVER_PORT",
                                                "8080")))
    pc.add_argument("-x", dest="index", default="index")
    pc.add_argument("-U", dest="U", default=None)
    pc.add_argument("-1", dest="m1", default=None)
    pc.add_argument("-2", dest="m2", default=None)
    pc.add_argument("-S", dest="S", default=None)
    pc.add_argument("--passthrough", action="store_true",
                    help="re-emit the original input record after each SAM "
                         "record (restored client-side from the slot map; "
                         "ref: pat.cpp:2286-2336)")
    pc.set_defaults(fn=cmd_client)

    pd = sub.add_parser("dp")
    pd.add_argument("input", nargs="?", default="-")
    pd.add_argument("--local", action="store_true")
    pd.add_argument("--cpu", action="store_true")
    pd.set_defaults(fn=cmd_dp)

    return p


def main(argv=None):
    args = make_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
