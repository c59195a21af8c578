"""Device (JAX) FM ops vs the host-side scalar oracle."""
import numpy as np
import pytest

from bowtie2_server_tpu.index.build import build_index
from bowtie2_server_tpu.index.fm import search_exact
from bowtie2_server_tpu.ops import fm as dfm
from bowtie2_server_tpu.utils import dna


@pytest.fixture(scope="module")
def idx():
    seq = dna.decode(np.random.default_rng(3).integers(0, 4, 4096).astype(np.uint8))
    return build_index(f">ref\n{seq}\n")


@pytest.fixture(scope="module")
def dev(idx):
    return dfm.to_device(idx.fw)


def _pad_patterns(pats):
    L = max(len(p) for p in pats)
    out = np.zeros((len(pats), L), dtype=np.uint8)
    lens = np.zeros(len(pats), dtype=np.int32)
    for i, p in enumerate(pats):
        out[i, : len(p)] = p
        lens[i] = len(p)
    return out, lens


@pytest.mark.parametrize("use_ftab", [False, True])
def test_backward_search_matches_oracle(idx, dev, use_ftab, rng):
    text = idx.joined
    pats = []
    for L in [8, 10, 15, 22, 40]:
        for _ in range(8):
            s = int(rng.integers(0, len(text) - L))
            pats.append(text[s : s + L].copy())
    # some random (likely absent) patterns and one with N
    pats.append(rng.integers(0, 4, 22).astype(np.uint8))
    pats.append(np.array([0, 1, 2, 4, 3, 0, 1, 2, 3, 0, 1, 2], dtype=np.uint8))
    pmat, lens = _pad_patterns(pats)
    top, bot = dfm.backward_search(dev, pmat, lens, use_ftab=use_ftab)
    top, bot = np.asarray(top), np.asarray(bot)
    for i, p in enumerate(pats):
        et, eb = search_exact(idx.fw, p)
        assert (top[i], bot[i]) == (et, eb), f"pattern {i} len {len(p)}"


def test_sa_resolve(idx, dev, rng):
    text = idx.joined
    s = int(rng.integers(0, len(text) - 20))
    pat = text[s : s + 20]
    pmat, lens = _pad_patterns([pat])
    top, bot = dfm.backward_search(dev, pmat, lens)
    count = bot - top
    offs = np.asarray(dfm.sa_resolve(dev, top, count, max_elts=8))[0]
    got = sorted(int(o) for o in offs if o >= 0)
    expected = [i for i in range(len(text) - 19)
                if np.array_equal(text[i : i + 20], pat)]
    assert got == expected


def test_occ_batch_matches_oracle(idx, dev, rng):
    import jax.numpy as jnp
    from bowtie2_server_tpu.index.fm import occ_at
    rows = rng.integers(0, idx.fw.n, 64).astype(np.int32)
    cs = rng.integers(0, 4, 64).astype(np.int32)
    got = np.asarray(dfm.occ_batch(dev, jnp.asarray(cs), jnp.asarray(rows)))
    for i in range(64):
        assert got[i] == occ_at(idx.fw, int(cs[i]), int(rows[i]))
