"""Table-driven hand-crafted tier: drive OUR full CLI over every case in
simple_tier_cases.py and compare records field-by-field against goldens
produced by the reference binaries (scripts/gen_simple_goldens.py) — the
analog of the reference's scripts/test/simple_tests.pl tier (ref:
simple_tests.pl:67-220).

Fields compared per record: FLAG, RNAME, POS, MAPQ, CIGAR, RNEXT, PNEXT,
TLEN + tags AS/XS/NM/MD/XM/XO/XG/XN/YS/YT/YM/YF. A case may list fields in
skip (with a reason where defined) — used only for documented
reference-vs-ours tie-breaking differences.
"""
import json
from pathlib import Path

import pytest

from simple_tier_cases import (CASES, CORE_FIELDS, TAG_FIELDS,
                               parse_sam_body, record_sort_key,
                               write_inputs)

GOLDEN_PATH = Path(__file__).parent / "data/simple_tier_golden.json"
GOLDEN = (json.loads(GOLDEN_PATH.read_text()) if GOLDEN_PATH.exists()
          else {})

# Documented deviations (field -> reason), applied on top of per-case skip.
# Keep this list SHORT — every entry is a known gap.
GLOBAL_SKIP: dict = {}


def _run_ours(case, d: Path) -> str:
    from bowtie2_server_tpu.__main__ import main
    ref_fa, in_args = write_inputs(case, d)
    # build our native index once per unique ref dir
    idx_base = d / "ours_idx"
    if not (d / "ours_idx.fm.npz").exists():
        from bowtie2_server_tpu.index.build import build_index
        build_index(str(ref_fa)).save(idx_base)
    out = d / "ours.sam"
    argv = (["align", "--cpu", "-x", str(idx_base), "-S", str(out)]
            + [str(a) for a in case["args"]]
            + [str(a) for a in case.get("cargs", ())] + in_args)
    main(argv)
    return out.read_text()


def _fields(rec, skip):
    out = {}
    for f in CORE_FIELDS + TAG_FIELDS:
        if f in skip:
            continue
        out[f] = rec.get(f)
    return out


@pytest.mark.parametrize("case", CASES, ids=lambda c: c["name"])
def test_simple_tier(case, tmp_path):
    name = case["name"]
    if name not in GOLDEN:
        pytest.skip(f"no golden for {name} (run scripts/gen_simple_goldens"
                    ".py with the reference built)")
    gold = GOLDEN[name]
    all_args = ([str(a) for a in case["args"]]
                + [str(a) for a in case.get("cargs", ())])
    assert gold["args"] == all_args, \
        f"{name}: golden was generated with different args — regenerate"
    if gold.get("abort"):
        # should_abort semantics (simple_tests.pl): the reference pair
        # failed on these args; our CLI must error too (SystemExit with
        # nonzero code, or any raised error — both exit nonzero from the
        # real CLI)
        with pytest.raises(BaseException) as ei:
            _run_ours(case, tmp_path)
        if isinstance(ei.value, SystemExit):
            assert ei.value.code not in (0, None), \
                f"{name}: ours exited 0 where the reference aborts"
        return
    ours_sam = _run_ours(case, tmp_path)

    # the reference CLIENT emits slot names with a /1 (/2) mate suffix
    # even for unpaired reads (pat.h:2464 name map); strip on both sides
    def norm(recs):
        return [(q[:-2] if q.endswith(("/1", "/2")) else q, r)
                for q, r in recs]

    ours = norm(parse_sam_body(ours_sam))
    want = norm([(q, r) for q, r in gold["records"]])
    skip = set(case["skip"]) | set(GLOBAL_SKIP)

    if case.get("tie"):
        # equal-score multi-hit cases: which copy is primary depends on
        # the per-read RNG seed, which the reference pair derives from the
        # CLIENT's slot names (pat.h:2464) — unknowable to a standalone
        # CLI. Assert everything except the primary choice: the position
        # set, per-position fields, and the flag/MAPQ multisets.
        key = lambda it: (it[0], it[1]["flag"] & 0xC0, it[1]["pos"],
                          it[1]["cigar"])
        skip = skip | {"flag", "mapq"}
        ours_sorted = sorted(ours, key=key)
        want_sorted = sorted(want, key=key)
        assert sorted(r["flag"] for _, r in ours) == \
            sorted(r["flag"] for _, r in want), f"{name}: flag multiset"
        assert sorted(r["mapq"] for _, r in ours) == \
            sorted(r["mapq"] for _, r in want), f"{name}: mapq multiset"
        vp = case.get("valid_pos")
        if vp:
            # k < copies: WHICH copies get reported is RNG-dependent —
            # assert membership in the known copy set instead of equality
            skip = skip | {"pos"}
            for _, r in ours_sorted:
                assert r["pos"] in vp, f"{name}: pos {r['pos']} not in {vp}"
            assert len(set(r["pos"] for _, r in ours_sorted)) == \
                len(ours_sorted), f"{name}: duplicate positions reported"
    else:
        ours_sorted = sorted(ours, key=record_sort_key)
        want_sorted = sorted(want, key=record_sort_key)
    assert len(ours_sorted) == len(want_sorted), (
        f"{name}: {len(ours_sorted)} records vs reference "
        f"{len(want_sorted)}\nours={ours_sorted}\nref={want_sorted}")
    for (oq, orec), (wq, wrec) in zip(ours_sorted, want_sorted):
        assert oq == wq, f"{name}: qname {oq} != {wq}"
        of, wf = _fields(orec, skip), _fields(wrec, skip)
        diffs = {k: (of[k], wf[k]) for k in wf if of.get(k) != wf[k]}
        assert not diffs, (f"{name} ({oq}): ours vs reference diffs "
                           f"{diffs}")


def test_tier_size():
    """The tier must stay at 100+ distinct cases (VERDICT r3 item 4)."""
    assert len(CASES) >= 100, len(CASES)


def test_golden_coverage():
    """Nearly every case must have a golden — a missing golden means the
    generator failed on it (reference rejected args or crashed)."""
    if not GOLDEN:
        pytest.skip("golden fixture not generated yet")
    missing = [c["name"] for c in CASES if c["name"] not in GOLDEN]
    assert len(missing) <= 3, f"missing goldens: {missing}"
