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


def cmd_build(args):
    from .index.build import build_index
    t0 = time.time()
    idx = build_index(args.ref)
    idx.save(args.base)
    print(f"built index {args.base} ({idx.n} bp, {idx.n_refs} refs) "
          f"in {time.time()-t0:.1f}s", file=sys.stderr)


def cmd_align(args):
    if args.cpu:
        _force_cpu()
    from .align.pipeline import SearchPolicy, UnpairedAligner
    from .index.fm import FmIndex
    from .io.fastq import iter_fastq
    from .io.sam import sam_header, sam_record
    from .utils.scoring import Scoring

    from .index.bt2_reader import detect_index
    from .utils.presets import preset_params
    _, loader = detect_index(args.index)
    idx = loader(args.index)
    sc, polkw = preset_params(args.preset, args.local)
    out = open(args.S, "w") if args.S else sys.stdout
    out.write(sam_header(idx.ref_names, idx.ref_lens,
                         " ".join(sys.argv)))
    t0 = time.time()
    n = n_aligned = 0
    if args.m1 and args.m2:
        from .align.paired import PairedAligner
        pal = PairedAligner(idx, scoring=sc, policy=SearchPolicy(**polkw))
        it1 = iter_fastq(args.m1, batch_size=args.batch)
        it2 = iter_fastq(args.m2, batch_size=args.batch)
        for b1, b2 in zip(it1, it2):
            pairs = pal.align_batch(b1, b2)
            for r1, r2 in pairs:
                out.write(sam_record(r1, idx.ref_names) + "\n")
                out.write(sam_record(r2, idx.ref_names) + "\n")
            n += 2 * len(pairs)
            n_aligned += sum(r1.aligned + r2.aligned for r1, r2 in pairs)
    else:
        al = UnpairedAligner(idx, scoring=sc, policy=SearchPolicy(**polkw))
        for batch in iter_fastq(args.U, batch_size=args.batch):
            recs = al.align_batch(batch)
            for r in recs:
                out.write(sam_record(r, idx.ref_names) + "\n")
            n += len(recs)
            n_aligned += sum(r.aligned for r in recs)
    dt = time.time() - t0
    print(f"{n} reads; {n_aligned} aligned ({100.0*n_aligned/max(n,1):.2f}%); "
          f"{n/max(dt,1e-9):.0f} reads/s", file=sys.stderr)
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
    from .server.bt2srv import run_server
    run_server(args.index, port=args.port, host=args.host, local=args.local,
               preset=args.preset, batch_size=args.batch)


def cmd_client(args):
    from .io.fastq import iter_fastq
    from .server.client import Bt2Client
    cl = Bt2Client(args.host, args.port, args.index)
    if args.m1 and args.m2:
        def rows():
            for b1, b2 in zip(iter_fastq(args.m1, batch_size=1024),
                              iter_fastq(args.m2, batch_size=1024)):
                for i in range(len(b1)):
                    yield (b1.names[i] + "/1", b1.raw_seq[i], b1.raw_qual[i],
                           b2.names[i] + "/2", b2.raw_seq[i], b2.raw_qual[i])
    else:
        def rows():
            for b in iter_fastq(args.U, batch_size=1024):
                for i in range(len(b)):
                    yield (b.names[i], b.raw_seq[i], b.raw_qual[i])
    cl.send_reads(rows())
    out = open(args.S, "w") if args.S else sys.stdout
    n = 0
    for line in cl.finish():
        out.write(line + "\n")
        n += 1
    print(f"received {n} SAM records", file=sys.stderr)
    if args.S:
        out.close()


def main(argv=None):
    p = argparse.ArgumentParser(prog="bowtie2_server_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    pb = sub.add_parser("build")
    pb.add_argument("ref")
    pb.add_argument("base")
    pb.set_defaults(fn=cmd_build)

    pa = sub.add_parser("align")
    pa.add_argument("-x", dest="index", required=True)
    pa.add_argument("-U", dest="U", default=None)
    pa.add_argument("-1", dest="m1", default=None)
    pa.add_argument("-2", dest="m2", default=None)
    pa.add_argument("-S", dest="S", default=None)
    pa.add_argument("--local", action="store_true")
    pa.add_argument("--preset", default=None,
                    help="very-fast|fast|sensitive|very-sensitive[-local]")
    pa.add_argument("--cpu", action="store_true")
    pa.add_argument("--batch", type=int, default=2048)
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
    ps.set_defaults(fn=cmd_server)

    pc = sub.add_parser("client")
    pc.add_argument("--host", default="localhost")
    pc.add_argument("--port", type=int, default=8080)
    pc.add_argument("-x", dest="index", default="index")
    pc.add_argument("-U", dest="U", default=None)
    pc.add_argument("-1", dest="m1", default=None)
    pc.add_argument("-2", dest="m2", default=None)
    pc.add_argument("-S", dest="S", default=None)
    pc.set_defaults(fn=cmd_client)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
