"""Cuckoo seed-table build: batched-eviction placement, pack_keys
doubling, and the on-disk cache (ref: the ftab k-mer jump table role,
bt2_idx.h:1476 — redesigned as a two-choice hash for gather economy)."""
import numpy as np
import pytest

from bowtie2_server_tpu.index import kmer as kmod


def _naive_pack(c, sl):
    n = len(c)
    n_hi = min(sl, 16)
    pad = np.zeros(n + sl, np.uint64)
    pad[:n] = c
    hi = np.zeros(n, np.uint64)
    for t in range(n_hi):
        hi = (hi << np.uint64(2)) | pad[t : t + n]
    lo = np.zeros(n, np.uint64)
    for t in range(n_hi, sl):
        lo = (lo << np.uint64(2)) | pad[t : t + n]
    return hi.astype(np.uint32), lo.astype(np.uint32)


@pytest.mark.parametrize("sl", [10, 16, 20, 22, 28])
def test_pack_keys_matches_naive(sl):
    rng = np.random.default_rng(sl)
    c = rng.integers(0, 4, 4001).astype(np.uint8)
    hi, lo, n_hi, n_lo = kmod.pack_keys(c, sl)
    rhi, rlo = _naive_pack(c, sl)
    assert (hi == rhi).all()
    assert (lo == rlo).all()


def test_cuckoo_build_places_every_key():
    rng = np.random.default_rng(0)
    joined = rng.integers(0, 4, 300_000).astype(np.uint8)
    sl = 22
    tab = kmod.build_cuckoo_table(joined, sl)
    assert tab is not None and tab.salt == 1  # eviction: first salt works
    n_k = len(joined) - sl + 1
    hi, lo, _, _ = kmod.pack_keys(joined, sl)
    hi, lo = hi[:n_k], lo[:n_k]
    h1, h2 = kmod._buckets(hi, lo, tab.salt, tab.tbits, np)
    found = np.zeros(n_k, bool)
    st = np.zeros(n_k, np.uint32)
    cn = np.zeros(n_k, np.uint32)
    for h in (h1, h2):
        r = tab.table[h]
        for s in (0, 4):
            m = (r[:, s] == hi) & (r[:, s + 1] == lo) & (r[:, s + 3] > 0)
            found |= m
            st = np.where(m, r[:, s + 2], st)
            cn = np.where(m, r[:, s + 3], cn)
    assert found.all()
    # spot-check ranges: the (start, cnt) slice of pos holds exactly this
    # key's positions, including the queried one
    for i in range(0, n_k, 4999):
        rp = tab.pos[int(st[i]) : int(st[i]) + int(cn[i])]
        assert (hi[rp] == hi[i]).all() and (lo[rp] == lo[i]).all()
        assert i in rp.astype(np.int64).tolist()


def test_cuckoo_cache_roundtrip_and_staleness(tmp_path):
    rng = np.random.default_rng(1)
    joined = rng.integers(0, 4, 50_000).astype(np.uint8)
    tab = kmod.build_cuckoo_table(joined, 22)
    base = str(tmp_path / "idx")
    kmod.save_cuckoo_table(tab, base, joined=joined)
    back = kmod.load_cuckoo_table(base, 22, joined=joined)
    assert back is not None
    assert (back.table == tab.table).all() and (back.pos == tab.pos).all()
    assert (back.tbits, back.salt, back.n_hi, back.n_lo) == \
        (tab.tbits, tab.salt, tab.n_hi, tab.n_lo)
    # wrong seed length: miss
    assert kmod.load_cuckoo_table(base, 20, joined=joined) is None
    # rebuilt index at the same path: staleness signature rejects
    other = rng.integers(0, 4, 50_000).astype(np.uint8)
    assert kmod.load_cuckoo_table(base, 22, joined=other) is None
    assert kmod.load_cuckoo_table(base, 22, joined=joined[:-1]) is None
