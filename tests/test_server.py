"""BT2SRV protocol server/client tests (in-process, ephemeral port)."""
import socket
import subprocess
import threading
import time
from pathlib import Path

import numpy as np
import pytest


@pytest.fixture(scope="module")
def server():
    import asyncio

    from bowtie2_server_tpu.index.build import build_index
    from bowtie2_server_tpu.server.bt2srv import Bt2Server

    idx = build_index("/root/reference/example/reference/lambda_virus.fa")
    base = Path("tmp/test_srv_idx")
    base.parent.mkdir(exist_ok=True)
    idx.save(base)
    srv = Bt2Server(str(base), index_name="lambda", batch_size=64,
                    engine="xla")

    loop = asyncio.new_event_loop()
    started = threading.Event()
    port_holder = {}

    stop_holder = {}

    async def run():
        s = await asyncio.start_server(srv.handle, "127.0.0.1", 0,
                                       limit=1 << 20)
        port_holder["port"] = s.sockets[0].getsockname()[1]
        stop_holder["ev"] = asyncio.Event()
        started.set()
        async with s:
            # clean shutdown: wait on an event instead of serve_forever so
            # run_until_complete's future completes normally
            await stop_holder["ev"].wait()

    t = threading.Thread(target=lambda: loop.run_until_complete(run()),
                         daemon=True)
    t.start()
    assert started.wait(10)
    yield port_holder["port"], idx
    loop.call_soon_threadsafe(stop_holder["ev"].set)
    t.join(10)
    loop.close()
    srv.close()   # stop dispatcher worker threads (suite hygiene)


def test_banner_and_config(server):
    port, _ = server
    with socket.create_connection(("127.0.0.1", port)) as s:
        s.sendall(b"GET / HTTP/1.1\r\nHost: x\r\n\r\n")
        data = s.recv(4096)
    assert b"200 OK" in data and b"bowtie2 SaaS" in data
    with socket.create_connection(("127.0.0.1", port)) as s:
        s.sendall(b"GET /config HTTP/1.1\r\nHost: x\r\n\r\n")
        time.sleep(0.3)
        data = s.recv(4096)
    assert b"BT2SRV-Version:" in data and b"Index-Name: lambda" in data
    assert b"Seed-Len: 22" in data


def test_bad_requests(server):
    port, _ = server
    with socket.create_connection(("127.0.0.1", port)) as s:
        s.sendall(b"GET /nonsense HTTP/1.1\r\nHost: x\r\n\r\n")
        data = s.recv(4096)
    assert b"400" in data
    with socket.create_connection(("127.0.0.1", port)) as s:
        s.sendall(b"FROB / HTTP/1.1\r\nHost: x\r\n\r\n")
        data = s.recv(4096)
    assert b"405" in data


def test_align_roundtrip_unpaired(server):
    port, idx = server
    from bowtie2_server_tpu.server.client import Bt2Client
    from bowtie2_server_tpu.utils import dna
    rng = np.random.default_rng(11)
    rows = []
    expected_pos = {}
    for i in range(100):
        s = int(rng.integers(0, idx.n - 80))
        seq = dna.decode(idx.joined[s : s + 80])
        rows.append((f"q{i}", seq, "I" * 80))
        expected_pos[f"q{i}"] = s + 1
    cl = Bt2Client("127.0.0.1", port, "lambda")
    assert cl.config["X-BT2SRV-Index-Name"] == "lambda"
    cl.send_reads(rows)
    got = {}
    for line in cl.finish():
        f = line.split("\t")
        got[f[0]] = (int(f[1]), int(f[3]))
    assert len(got) == 100
    for name, pos1 in expected_pos.items():
        assert got[name] == (0, pos1), name


def test_align_roundtrip_paired(server):
    port, idx = server
    from bowtie2_server_tpu.server.client import Bt2Client
    from bowtie2_server_tpu.utils import dna
    rng = np.random.default_rng(12)
    rows = []
    for i in range(20):
        s = int(rng.integers(0, idx.n - 400))
        m1 = dna.decode(idx.joined[s : s + 90])
        m2 = dna.decode(dna.revcomp(idx.joined[s + 210 : s + 300]))
        rows.append((f"p{i}/1", m1, "I" * 90, f"p{i}/2", m2, "I" * 90))
    cl = Bt2Client("127.0.0.1", port, "lambda")
    cl.send_reads(rows)
    recs = [line.split("\t") for line in cl.finish()]
    assert len(recs) == 40
    # all concordant
    for f in recs:
        assert int(f[1]) & 0x2, f
        assert any(t == "YT:Z:CP" for t in f[11:])


REF_CLIENT = Path("/root/repo/.refbuild-client/bowtie2-align-s")


@pytest.mark.skipif(not REF_CLIENT.exists(),
                    reason="reference client binary not built")
def test_reference_client_wire_compat(server):
    """The reference fork's client binary (-DBT2WEBCLIENT) must be able to
    talk to our server unchanged."""
    port, idx = server
    reads = Path("tmp/wire_reads.fq")
    from bowtie2_server_tpu.utils import dna
    rng = np.random.default_rng(13)
    with open(reads, "w") as f:
        for i in range(25):
            s = int(rng.integers(0, idx.n - 70))
            f.write(f"@w{i}\n{dna.decode(idx.joined[s:s+70])}\n+\n{'I'*70}\n")
    out = Path("tmp/wire_out.sam")
    r = subprocess.run(
        [str(REF_CLIENT), "-x", "tmp/lambda", "--server-host", "localhost",
         "--server-port", str(port), "-U", str(reads), "-S", str(out)],
        capture_output=True, timeout=300)
    assert r.returncode == 0, r.stderr[-500:]
    lines = [l for l in out.read_text().splitlines() if not l.startswith("@")]
    assert len(lines) == 25
    aligned = sum(1 for l in lines if int(l.split("\t")[1]) & 4 == 0)
    assert aligned == 25


@pytest.mark.skipif(not REF_CLIENT.exists(),
                    reason="reference client binary not built")
def test_reference_client_paired_wire_compat(server):
    port, idx = server
    from bowtie2_server_tpu.utils import dna
    rng = np.random.default_rng(14)
    f1, f2 = Path("tmp/wire_p1.fq"), Path("tmp/wire_p2.fq")
    with open(f1, "w") as a, open(f2, "w") as b:
        for i in range(10):
            s = int(rng.integers(0, idx.n - 400))
            m1 = dna.decode(idx.joined[s : s + 80])
            m2 = dna.decode(dna.revcomp(idx.joined[s + 220 : s + 300]))
            a.write(f"@wp{i}\n{m1}\n+\n{'I'*80}\n")
            b.write(f"@wp{i}\n{m2}\n+\n{'I'*80}\n")
    out = Path("tmp/wire_paired_out.sam")
    r = subprocess.run(
        [str(REF_CLIENT), "-x", "tmp/lambda", "--server-host", "localhost",
         "--server-port", str(port), "-1", str(f1), "-2", str(f2),
         "-S", str(out)],
        capture_output=True, timeout=300)
    assert r.returncode == 0, r.stderr[-500:]
    lines = [l for l in out.read_text().splitlines() if not l.startswith("@")]
    assert len(lines) == 20
    for l in lines:
        f = l.split("\t")
        assert int(f[1]) & 0x2, l  # all concordant


def test_concurrent_clients_interleaved(server):
    """N concurrent connections are all served to completion while sharing
    the single alignment executor (ref: the shared worker-pool model,
    pat.cpp:2016-2086; per-connection parse, global alignment pool)."""
    port, idx = server
    from bowtie2_server_tpu.server.client import Bt2Client
    from bowtie2_server_tpu.utils import dna
    rng = np.random.default_rng(21)
    n_clients, n_reads = 4, 150  # > batch_size=64 -> multiple packs each
    payloads = []
    for c in range(n_clients):
        rows, want = [], {}
        for i in range(n_reads):
            s = int(rng.integers(0, idx.n - 70))
            rows.append((f"c{c}r{i}", dna.decode(idx.joined[s : s + 70]),
                         "I" * 70))
            want[f"c{c}r{i}"] = s + 1
        payloads.append((rows, want))
    results = [None] * n_clients
    errors = []

    def run_client(c):
        try:
            cl = Bt2Client("127.0.0.1", port, "lambda")
            cl.send_reads(payloads[c][0])
            got = {}
            for line in cl.finish():
                f = line.split("\t")
                got[f[0]] = int(f[3])
            results[c] = got
        except Exception as e:  # surface in the main thread
            errors.append((c, e))

    threads = [threading.Thread(target=run_client, args=(c,))
               for c in range(n_clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(120)
    assert not errors, errors
    for c in range(n_clients):
        assert results[c] is not None, f"client {c} hung"
        assert len(results[c]) == n_reads
        for name, pos1 in payloads[c][1].items():
            assert results[c][name] == pos1, name


def test_multiworker_server_concurrent(tmp_path):
    """--workers 2: two device-group workers (4 CPU devices each) serve
    concurrent connections with round-robin fairness; every connection's
    stream stays in ITS submission order and positions are correct
    (ref: SURVEY §2.3 row 3 scale-out; server/dispatch.py)."""
    import asyncio

    from bowtie2_server_tpu.index.build import build_index
    from bowtie2_server_tpu.server.bt2srv import Bt2Server
    from bowtie2_server_tpu.server.client import Bt2Client
    from bowtie2_server_tpu.utils import dna

    idx = build_index("/root/reference/example/reference/lambda_virus.fa")
    base = tmp_path / "mw_idx"
    idx.save(base)
    srv = Bt2Server(str(base), index_name="lambda", batch_size=32,
                    engine="xla", n_workers=2)
    assert srv._dispatch.n_workers == 2

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
    try:
        rng = np.random.default_rng(31)
        n_clients, n_reads = 3, 100   # > batch 32 -> several packs each
        payloads = []
        for c in range(n_clients):
            rows, want = [], {}
            for i in range(n_reads):
                s = int(rng.integers(0, idx.n - 70))
                rows.append((f"w{c}r{i}",
                             dna.decode(idx.joined[s : s + 70]), "I" * 70))
                want[f"w{c}r{i}"] = s + 1
            payloads.append((rows, want))
        results = [None] * n_clients
        errors = []

        def run_client(c):
            try:
                cl = Bt2Client("127.0.0.1", hold["port"], "lambda")
                cl.send_reads(payloads[c][0])
                order, got = [], {}
                for line in cl.finish():
                    f = line.split("\t")
                    order.append(f[0])
                    got[f[0]] = int(f[3])
                results[c] = (order, got)
            except Exception as e:
                errors.append((c, e))

        threads = [threading.Thread(target=run_client, args=(c,))
                   for c in range(n_clients)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(180)
        assert not errors, errors
        for c in range(n_clients):
            assert results[c] is not None, f"client {c} hung"
            order, got = results[c]
            # stream order == submission order (deterministic merge)
            assert order == [r[0] for r in payloads[c][0]]
            for name, pos1 in payloads[c][1].items():
                assert got[name] == pos1, name
    finally:
        loop.call_soon_threadsafe(hold["ev"].set)
        t.join(10)
        loop.close()
        srv.close()   # stop dispatcher worker threads (suite hygiene)
