"""Generate the simple-tier golden fixture by running the ACTUAL reference
binaries over tests/simple_tier_cases.py.

The reference fork aligns through a server+client pair (the plain
bowtie2-align-l target is the -DBT2WEBCLIENT client; the aligner proper is
bowtie2-align-server-s — ref: Makefile:241,423). Per case:

  1. bowtie2-build-s ref.fa idx            (index cached by ref content)
  2. bowtie2-align-server-s -x idx <args> --server-port P   (background)
  3. bowtie2-align-s -x idx <args> <inputs> -S out.sam --server-port P
  4. parse out.sam -> JSON golden records

Both processes get the SAME per-case arg list (they parse the same option
table; the server consumes policy flags, the client consumes input/trim
flags). Output: tests/data/simple_tier_golden.json.

Usage: python scripts/gen_simple_goldens.py [case-name-substring ...]
"""
import hashlib
import json
import os
import signal
import socket
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

from simple_tier_cases import CASES, parse_sam_body, write_inputs

ROOT = Path(__file__).resolve().parent.parent
BUILD = ROOT / ".refbuild/bowtie2-build-s"
SERVER = ROOT / ".refbuild/bowtie2-align-server-s"
# the -DBT2WEBCLIENT build lives in its own tree (.refbuild-client, see
# .claude/skills/verify/SKILL.md); fall back to the in-tree name if a
# combined build provided it
_C1 = ROOT / ".refbuild-client/bowtie2-align-s"
CLIENT = _C1 if _C1.exists() else ROOT / ".refbuild/bowtie2-align-s"
WORK = ROOT / "tmp/simple_tier"
OUT = ROOT / "tests/data/simple_tier_golden.json"

_PORT0 = 18431


def _free_port(start):
    p = start
    while True:
        with socket.socket() as s:
            try:
                s.bind(("127.0.0.1", p))
                return p
            except OSError:
                p += 1


def build_index(ref_fa: Path, cache: dict) -> Path:
    key = hashlib.sha1(ref_fa.read_bytes()).hexdigest()[:16]
    if key in cache:
        return cache[key]
    base = WORK / f"idx_{key}"
    if not (base.parent / (base.name + ".1.bt2")).exists():
        r = subprocess.run([str(BUILD), "-q", str(ref_fa), str(base)],
                           capture_output=True, timeout=120)
        assert r.returncode == 0, r.stderr.decode()[-800:]
    cache[key] = base
    return base


def run_abort_case(case, idx_base: Path, in_args, port: int) -> bool:
    """should_abort case: True iff the reference pair FAILS (server dies
    at startup or the client exits nonzero) — the simple_tests.pl
    should_abort semantics."""
    d = WORK / case["name"]
    out = d / "out.sam"
    args = [str(a) for a in case["args"]]
    cargs = [str(a) for a in case.get("cargs", ())]
    srv = subprocess.Popen(
        [str(SERVER), "-x", str(idx_base), "--server-port", str(port)]
        + args,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        start_new_session=True)
    try:
        for _ in range(100):
            if srv.poll() is not None:
                return srv.returncode != 0
            try:
                socket.create_connection(("127.0.0.1", port), 0.2).close()
                break
            except OSError:
                time.sleep(0.05)
        else:
            return True   # never listened: treat as abort
        r = subprocess.run(
            [str(CLIENT), "-x", str(idx_base), "--server-host", "127.0.0.1",
             "--server-port", str(port)] + args + cargs + in_args
            + ["-S", str(out)],
            capture_output=True, timeout=120)
        return r.returncode != 0
    finally:
        try:
            os.killpg(srv.pid, signal.SIGTERM)
        except ProcessLookupError:
            pass
        srv.wait(timeout=10)


def run_case(case, idx_base: Path, in_args, port: int):
    d = WORK / case["name"]
    out = d / "out.sam"
    args = [str(a) for a in case["args"]]
    # input-side flags (trimming, -s/-u, qual encodings) are applied at
    # the pattern source — the CLIENT in the reference pair; passing them
    # to the server too would apply them twice to the wire-sent reads
    cargs = [str(a) for a in case.get("cargs", ())]
    srv = subprocess.Popen(
        [str(SERVER), "-x", str(idx_base), "--server-port", str(port)]
        + args,
        stdout=subprocess.DEVNULL, stderr=subprocess.PIPE,
        start_new_session=True)
    try:
        # wait for the listener
        for _ in range(200):
            if srv.poll() is not None:
                raise RuntimeError(
                    f"server died: {srv.stderr.read().decode()[-800:]}")
            try:
                socket.create_connection(("127.0.0.1", port), 0.2).close()
                break
            except OSError:
                time.sleep(0.05)
        else:
            raise RuntimeError("server never listened")
        r = subprocess.run(
            [str(CLIENT), "-x", str(idx_base), "--server-host", "127.0.0.1",
             "--server-port", str(port)] + args + cargs + in_args
            + ["-S", str(out)],
            capture_output=True, timeout=120)
        if r.returncode != 0:
            raise RuntimeError(f"client rc={r.returncode}: "
                               f"{r.stderr.decode()[-800:]}")
        return out.read_text()
    finally:
        try:
            os.killpg(srv.pid, signal.SIGTERM)
        except ProcessLookupError:
            pass
        srv.wait(timeout=10)


def main():
    sel = sys.argv[1:]
    assert SERVER.exists() and CLIENT.exists() and BUILD.exists(), \
        "build the reference first: make -C .refbuild " \
        "bowtie2-align-server-s bowtie2-align-s bowtie2-build-s"
    WORK.mkdir(parents=True, exist_ok=True)
    golden = {}
    if OUT.exists():
        golden = json.loads(OUT.read_text())
    cache = {}
    port = _free_port(_PORT0)
    n_ok = n_fail = 0
    for case in CASES:
        if sel and not any(s in case["name"] for s in sel):
            continue
        d = WORK / case["name"]
        ref_fa, in_args = write_inputs(case, d)
        idx_base = build_index(ref_fa, cache)
        if case.get("abort"):
            aborted = run_abort_case(case, idx_base, in_args, port)
            port = _free_port(port + 1)
            if not aborted:
                print(f"FAIL {case['name']}: reference did NOT abort",
                      file=sys.stderr)
                n_fail += 1
                continue
            golden[case["name"]] = dict(
                args=[str(a) for a in case["args"]
                      + case.get("cargs", [])],
                abort=True)
            n_ok += 1
            print(f"ok {case['name']}: aborts")
            continue
        try:
            sam = run_case(case, idx_base, in_args, port)
        except Exception as e:
            print(f"FAIL {case['name']}: {e}", file=sys.stderr)
            n_fail += 1
            port = _free_port(port + 1)
            continue
        recs = parse_sam_body(sam)
        golden[case["name"]] = dict(
            args=[str(a) for a in case["args"] + case.get("cargs", [])],
            records=[[q, r] for q, r in recs])
        n_ok += 1
        print(f"ok {case['name']}: {len(recs)} records")
    OUT.write_text(json.dumps(golden, indent=1, sort_keys=True))
    print(f"{n_ok} ok, {n_fail} failed -> {OUT}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
