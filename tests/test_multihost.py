"""Multi-host serving dispatch dryrun: a front-end server whose worker
pool is TWO BACKEND SERVER PROCESSES (the per-host shard model of SURVEY
§2.3 row 3; ref: the shared worker pool over per-connection queues,
pat.cpp:2016-2086, mapped to DCN relay with a deterministic merge).

Evidence for the BASELINE config-5 shape (N>=2 hosts): two separate OS
processes each own an aligner; the front-end relays packs round-robin
over the BT2SRV wire protocol and merges results in submission order.
"""
import json
import socket
import subprocess
import sys
import threading
import time
from pathlib import Path

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


@pytest.fixture(scope="module")
def backends(tmp_path_factory):
    """Two backend server PROCESSES on their own ports + a shared index."""
    from bowtie2_server_tpu.index.build import build_index

    tmp = tmp_path_factory.mktemp("mh")
    idx = build_index("/root/reference/example/reference/lambda_virus.fa")
    base = tmp / "mh_idx"
    idx.save(base)
    ports = [_free_port(), _free_port()]
    procs = []
    for p in ports:
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "bowtie2_server_tpu", "server",
             "-x", str(base), "--port", str(p), "--host", "127.0.0.1",
             "--cpu", "--batch", "64"],
            stdout=subprocess.DEVNULL, stderr=subprocess.PIPE,
            cwd="/root/repo"))
    # wait for both to accept connections
    for p in ports:
        deadline = time.time() + 120
        while time.time() < deadline:
            try:
                socket.create_connection(("127.0.0.1", p), 1).close()
                break
            except OSError:
                time.sleep(0.5)
        else:
            for pr in procs:
                pr.kill()
            pytest.fail(f"backend on port {p} never came up")
    yield ports, base, idx
    for pr in procs:
        pr.kill()
        pr.wait(10)


def test_two_process_dispatch(backends, tmp_path):
    ports, base, idx = backends
    import asyncio

    from bowtie2_server_tpu.server.bt2srv import Bt2Server
    from bowtie2_server_tpu.server.client import Bt2Client
    from bowtie2_server_tpu.utils import dna

    # front-end with ONLY remote workers? Keep one local group too — the
    # mixed pool is the general shape; force small packs so all workers
    # see traffic
    srv = Bt2Server(str(base), index_name="lambda", batch_size=16,
                    engine="xla",
                    remote_workers=[f"127.0.0.1:{p}" for p in ports])
    assert srv._dispatch.n_workers == 3   # 1 local group + 2 remote hosts

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
        rng = np.random.default_rng(23)
        rows, want = [], {}
        for i in range(200):   # > 12 packs of 16: every worker gets some
            s0 = int(rng.integers(0, idx.n - 70))
            rows.append((f"mh{i}", dna.decode(idx.joined[s0 : s0 + 70]),
                         "I" * 70))
            want[f"mh{i}"] = s0 + 1
        cl = Bt2Client("127.0.0.1", hold["port"], "lambda")
        cl.send_reads(rows)
        order, got = [], {}
        for line in cl.finish():
            f = line.split("\t")
            order.append(f[0])
            got[f[0]] = int(f[3])
        # submission order preserved across the 3-worker merge
        assert order == [r[0] for r in rows]
        for name, pos1 in want.items():
            assert got[name] == pos1, name
        # evidence record for the round (MULTICHIP-style)
        Path("tmp").mkdir(exist_ok=True)
        Path("tmp/MULTIHOST_dryrun.json").write_text(json.dumps({
            "ok": True, "n_processes": 3, "n_remote_hosts": 2,
            "reads": len(rows), "order_preserved": True,
            "positions_correct": True}))
    finally:
        loop.call_soon_threadsafe(hold["ev"].set)
        t.join(10)
        loop.close()
        srv.close()
