"""Quality-encoding conversions (--phred64/--solexa-quals/--int-quals;
ref: qual.h:105 charToPhred33, :156 intToPhred33, qual.cpp:57 solToPhred)
and the BT2CLT_SERVER_{HOST,PORT} env vars (ref: bt2_search.cpp:526-536)."""
import numpy as np

from bowtie2_server_tpu.io.fastq import make_qual_conv, make_batch


# the reference's solToPhred table, first 30 entries (qual.cpp:57-60)
_REF_SOL = [0, 1, 1, 1, 1, 1, 1, 2, 2, 3,
            3, 4, 4, 5, 5, 6, 7, 8, 9, 10,
            10, 11, 12, 13, 14, 15, 16, 17, 18, 19]


def test_sol_to_phred_matches_reference_table():
    from bowtie2_server_tpu.io.fastq import _SOL_TO_PHRED
    assert list(_SOL_TO_PHRED[:30]) == _REF_SOL


def test_phred64():
    conv = make_qual_conv(phred64=True)
    assert conv(bytes([64, 74, 104])) == bytes([33, 43, 73])


def test_solexa():
    conv = make_qual_conv(solexa=True)
    # sol -10 -> phred 0, sol 0 -> 3, sol 10 -> 10
    assert conv(bytes([54, 64, 74])) == bytes([33, 36, 43])


def test_int_quals():
    conv = make_qual_conv(int_quals=True)
    assert conv(b"0 10 40") == b"!+I"


def test_converted_batch_quals():
    conv = make_qual_conv(phred64=True)
    q = conv(bytes([64 + 30] * 4))
    b = make_batch(["r"], [b"ACGT"], [q])
    assert list(b.quals[0]) == [30, 30, 30, 30]


def test_client_env_vars(monkeypatch):
    monkeypatch.setenv("BT2CLT_SERVER_HOST", "envhost")
    monkeypatch.setenv("BT2CLT_SERVER_PORT", "9999")
    import importlib
    import bowtie2_server_tpu.__main__ as m
    importlib.reload(m)
    p = None
    # parse the client subcommand without running it
    import argparse
    ns = argparse.Namespace()
    parser_args = ["client"]
    args, _ = _parse(m, parser_args)
    assert args.host == "envhost" and args.port == 9999


def _parse(m, argv):
    import argparse
    # reuse main()'s parser by intercepting parse via fn
    # (main() requires fn; grab args by monkey-patching set_defaults)
    captured = {}
    orig = argparse.ArgumentParser.parse_args

    def fake(self, a=None):
        ns = orig(self, argv)
        captured["ns"] = ns
        raise SystemExit(0)

    argparse.ArgumentParser.parse_args = fake
    try:
        m.main(argv)
    except SystemExit:
        pass
    finally:
        argparse.ArgumentParser.parse_args = orig
    return captured["ns"], None


def test_perf_metrics_counters_nonzero():
    """The --met TSV's SeedSearch/NRange/NElt/DPEx columns are fed from
    the fused pipeline's device counters and increase monotonically
    (ref: bt2_search.cpp:1923-2070)."""
    import io as _io

    from bowtie2_server_tpu.align.pipeline import UnpairedAligner
    from bowtie2_server_tpu.index.build import build_index
    from bowtie2_server_tpu.io.fastq import iter_fastq
    from bowtie2_server_tpu.io.metrics import PERF_COLUMNS, PerfMetrics

    idx = build_index("/root/reference/example/reference/lambda_virus.fa")
    al = UnpairedAligner(idx)
    al.want_met = True
    out = _io.StringIO()
    pm = PerfMetrics(interval=0.0, out=out, per_read=True)
    pm.live_bt = al.bt_ctr
    exp_lt10 = 0
    for batch in iter_fastq("/root/reference/example/reads/longreads.fq",
                            batch_size=512, upto=1024):
        recs = al.align_batch(batch)
        assert recs.metrics["seed_searches"] > 0
        assert recs.metrics["n_range"] > 0
        assert recs.metrics["n_elt"] > 0
        assert recs.metrics["dp_ex"] > 0
        assert recs.metrics["dp_col"] > 0
        assert recs.metrics["dp_cell"] == recs.metrics["dp_col"] * al.band
        assert (recs.metrics["dp_succ"] + recs.metrics["dp_fail"]
                <= recs.metrics["dp_ex"] + 8)  # counter-vs-array slack
        exp_lt10 += recs.metrics["dp_lt10"]
        # materialize every record so the host traceback counters tick
        for r in recs:
            _ = r.cigar
        pm.add_batch(len(recs), 1, len(recs), 1, False, **recs.metrics)
    lines = out.getvalue().strip().splitlines()
    assert lines[0].split("\t") == PERF_COLUMNS
    col = {c: i for i, c in enumerate(PERF_COLUMNS)}
    rows = [l.split("\t") for l in lines[1:]]
    assert len(rows) == 2
    for name in ("SeedSearch", "NRange", "NElt", "DP16ExDps", "DP16ExCol",
                 "DP16ExCell", "UngappedSucc", "ExactAttempts"):
        v = [int(r[col[name]]) for r in rows]
        assert v[0] > 0 and v[1] > v[0], (name, v)
    # gap-class columns follow tallyGappedDp semantics (problems whose
    # BUDGET allows < 10 gaps — 0 for these long reads under the default
    # e2e budget, matching the reference's sws10 on the same input)
    assert int(rows[-1][col["DPExLt10Gaps"]]) == exp_lt10
    # long gapped reads force real host tracebacks: live bt counters tick
    assert al.bt_ctr["bt"] > 0
    assert al.bt_ctr["btsucc"] + al.bt_ctr["btfail"] <= al.bt_ctr["bt"]
    assert al.bt_ctr["btcell"] >= al.bt_ctr["bt"]
    # the last emitted row carries the counters as of its emission
    assert int(rows[-1][col["DP16ExBt"]]) > 0
    assert int(rows[-1][col["EbwtMemPeak"]]) > 0
