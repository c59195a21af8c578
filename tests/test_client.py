"""Client machinery tests: concurrent send/receive (no mid-upload
deadlock), slot-name restoration, passthrough round-trip, error
propagation (ref: pat.h:2397-2550 PatternSourceWebClient)."""
import os
import socket
import threading
from pathlib import Path

import numpy as np
import pytest


@pytest.fixture(scope="module")
def server():
    import asyncio

    from bowtie2_server_tpu.index.build import build_index
    from bowtie2_server_tpu.server.bt2srv import Bt2Server

    idx = build_index("/root/reference/example/reference/lambda_virus.fa")
    base = Path("tmp/test_clt_idx")
    base.parent.mkdir(exist_ok=True)
    idx.save(base)
    srv = Bt2Server(str(base), index_name="lambda", batch_size=512,
                    engine="xla")
    loop = asyncio.new_event_loop()
    started = threading.Event()
    hold = {}

    async def run():
        s = await asyncio.start_server(srv.handle, "127.0.0.1", 0,
                                       limit=1 << 20)
        hold["port"] = s.sockets[0].getsockname()[1]
        hold["ev"] = asyncio.Event()
        started.set()
        async with s:
            await hold["ev"].wait()

    t = threading.Thread(target=lambda: loop.run_until_complete(run()),
                         daemon=True)
    t.start()
    assert started.wait(10)
    yield hold["port"], idx
    loop.call_soon_threadsafe(hold["ev"].set)
    t.join(10)
    loop.close()
    srv.close()


def _mk_rows(idx, n, rl=60, seed=5, prefix="s"):
    from bowtie2_server_tpu.utils import dna
    rng = np.random.default_rng(seed)
    starts = rng.integers(0, idx.n - rl, n)
    return [(f"{prefix}{i}", dna.decode(idx.joined[s : s + rl]), "I" * rl)
            for i, s in enumerate(starts)]


def test_name_restoration_and_wire_slots(server):
    """Wire carries %04X slot names; the caller sees original names
    restored (ref: pat.h:2464 LockedOrigBufMap)."""
    port, idx = server
    from bowtie2_server_tpu.server.client import Bt2Client

    rows = _mk_rows(idx, 50, prefix="readname_quite_long_")
    cl = Bt2Client("127.0.0.1", port, "lambda")
    cl.send_reads(rows)
    names = [l.split("\t", 1)[0] for l in cl.finish()]
    assert sorted(names) == sorted(r[0] for r in rows)
    assert not cl._slots           # every slot freed by END READ markers


def test_mate_suffix_stripped(server):
    port, idx = server
    from bowtie2_server_tpu.server.client import Bt2Client

    rows = [(n + "/1", s, q) for n, s, q in _mk_rows(idx, 5, prefix="m")]
    cl = Bt2Client("127.0.0.1", port, "lambda")
    cl.send_reads(rows)
    names = {l.split("\t", 1)[0] for l in cl.finish()}
    assert names == {f"m{i}" for i in range(5)}


def test_passthrough_roundtrip(server):
    """--passthrough re-emits the original record byte-identically
    (%-escaped) after each SAM record (ref: pat.cpp:2286-2336)."""
    port, idx = server
    from bowtie2_server_tpu.server.client import Bt2Client

    rows = _mk_rows(idx, 8, prefix="pt")
    origs = [f"@{n} extra comment\n{s}\n+\n{q}".encode()
             for n, s, q in rows]
    cl = Bt2Client("127.0.0.1", port, "lambda", passthrough=True)
    cl.send_reads([r + (o,) for r, o in zip(rows, origs)])
    lines = list(cl.finish())
    # alternating SAM record / passthrough record
    assert len(lines) == 16
    got_pt = {}
    for sam, pt in zip(lines[0::2], lines[1::2]):
        got_pt[sam.split("\t", 1)[0]] = pt
    for (n, s, q), o in zip(rows, origs):
        want = o.replace(b"%", b"%25").replace(b"\n", b"%0A").decode()
        assert got_pt[n] == want


def test_error_propagation():
    """A dead server mid-stream surfaces as the reference's 'Did not
    process all the input file' failure (ref: pat.cpp:2540-2543)."""
    from bowtie2_server_tpu.server.client import Bt2Client

    # a fake server that accepts the handshake then drops the connection
    srv = socket.create_server(("127.0.0.1", 0))
    port = srv.getsockname()[1]

    def fake():
        conn, _ = srv.accept()
        conn.recv(4096)
        conn.sendall(b"HTTP/1.1 200 OK\r\nX-BT2SRV-Terminator: 1\r\n\r\n")
        conn.close()

    t = threading.Thread(target=fake, daemon=True)
    t.start()
    cl = Bt2Client("127.0.0.1", port, "lambda")
    try:
        cl.send_reads([("r1", "ACGTACGTACGTACGTACGTACGT", "I" * 24)])
    except ConnectionError:
        pass   # acceptable: send may already see the closed socket
    with pytest.raises(RuntimeError, match="Did not process all the input"):
        for _ in cl.finish():
            pass
    srv.close()


@pytest.mark.slow
def test_large_stream_no_deadlock(server):
    """Stream >=1M reads through client<->server in one connection. The
    server flushes SAM mid-upload; the old single-threaded client
    deadlocked once responses filled its unread socket buffer. Bounded
    wall time enforced by a watchdog."""
    port, idx = server
    from bowtie2_server_tpu.server.client import Bt2Client
    from bowtie2_server_tpu.utils import dna

    n = int(os.environ.get("CLT_STREAM_READS", "1000000"))
    rl = 40
    rng = np.random.default_rng(17)
    starts = rng.integers(0, idx.n - rl, 4096)
    seqs = [dna.decode(idx.joined[s : s + rl]) for s in starts]

    def rows():
        for i in range(n):
            yield (f"x{i}", seqs[i % len(seqs)], "I" * rl)

    done = threading.Event()
    counts = {}

    def drive():
        cl = Bt2Client("127.0.0.1", port, "lambda")
        cl.send_reads(rows())
        cnt = sum(1 for _ in cl.finish())
        counts["n"] = cnt
        done.set()

    t = threading.Thread(target=drive, daemon=True)
    t.start()
    assert done.wait(3000), "client/server wedged"
    assert counts["n"] >= n   # one record per read minimum
