"""Banded SW engines vs the banded numpy fill and the rectangle oracle."""
import numpy as np
import pytest

from bowtie2_server_tpu.ops.sw import SwConfig, sw_score_numpy
from bowtie2_server_tpu.ops.sw_banded import (
    DEFAULT_BAND, banded_best_numpy, banded_traceback, sw_banded_batch)

E2E = SwConfig()
LOCAL = SwConfig(ma=2, local=True)
K = DEFAULT_BAND
C = K // 2


def make_problem(rng, lq, cfg, n_mm=2, indel=False):
    """Plant a read at band center: band = ref[diag-C : diag-C+lq+K]."""
    band = rng.integers(0, 4, lq + K).astype(np.uint8)
    rd = band[C : C + lq].copy()
    for _ in range(n_mm):
        p = int(rng.integers(0, lq))
        rd[p] = rng.integers(0, 4)
    if indel and lq > 14:
        p = int(rng.integers(6, lq - 6))
        if rng.random() < 0.5:  # deletion of one ref base
            rd = np.concatenate([rd[:p], rd[p + 1 :],
                                 band[C + lq : C + lq + 1]])
        else:
            rd = np.concatenate([rd[:p],
                                 rng.integers(0, 4, 1).astype(np.uint8),
                                 rd[p:]])[:lq]
    mm = np.full(lq, 6, np.int32)
    return rd, mm, band


@pytest.mark.parametrize("engine", ["xla", "pallas"])
@pytest.mark.parametrize("cfg", [E2E, LOCAL], ids=["e2e", "local"])
def test_banded_engines_match_numpy(engine, cfg, rng):
    B, lq = 40, 30
    rds, mms, bands = [], [], []
    for b in range(B):
        rd, mm, band = make_problem(rng, lq, cfg, n_mm=b % 4, indel=b % 3 == 0)
        rds.append(rd); mms.append(mm); bands.append(band)
    rd = np.stack(rds); mm = np.stack(mms); band = np.stack(bands)
    lens = np.full(B, lq, np.int32)
    best, bi, bk = sw_banded_batch(rd, lens, mm, band, cfg, engine=engine)
    for b in range(B):
        eb, ei, ek = banded_best_numpy(rd[b], mm[b], band[b], cfg)
        assert (best[b], bi[b], bk[b]) == (eb, ei, ek), f"problem {b}"


def test_banded_matches_rectangle_oracle(rng):
    """For short reads the band is exact: compare vs the full-rectangle
    scalar oracle using the band array as the window."""
    cfg = E2E
    for trial in range(25):
        lq = int(rng.integers(12, 40))
        rd, mm, band = make_problem(rng, lq, cfg, n_mm=trial % 5,
                                    indel=trial % 2 == 0)
        b1, _, _ = banded_best_numpy(rd, mm, band, cfg)
        b2, _, _ = sw_score_numpy(rd, mm, band, cfg)
        assert b1 == b2, f"trial {trial}: banded {b1} != rect {b2}"


def test_banded_traceback_roundtrip(rng):
    """Traceback edits re-score to the DP best."""
    cfg = E2E
    for trial in range(30):
        lq = int(rng.integers(15, 50))
        rd, mm, band = make_problem(rng, lq, cfg, n_mm=trial % 4,
                                    indel=True)
        best, bi, bk = banded_best_numpy(rd, mm, band, cfg)
        edits, start, read_start = banded_traceback(rd, mm, band, cfg, bi, bk)
        assert read_start == 0
        # re-score the edit script
        score = 0
        n_mm = sum(1 for e in edits if e[0] == "M")
        dels = [e for e in edits if e[0] == "D"]
        inss = [e for e in edits if e[0] == "I"]
        # mismatches: each costs the per-position penalty
        for e in edits:
            if e[0] == "M":
                score -= int(mm[e[1]]) if e[3] <= 3 and e[2] <= 3 else cfg.npen
        # gaps: group consecutive
        def gap_cost(items, open_, ext):
            if not items:
                return 0
            groups = 1
            total = len(items)
            prev = None
            for e in sorted(items, key=lambda t: t[1]):
                if prev is not None and e[1] != prev:
                    groups += 1
                prev = e[1]
            return groups * open_ + (total - groups) * ext + 0
        score -= gap_cost(dels, cfg.rdg_open, cfg.rdg_ext)
        score -= gap_cost(inss, cfg.rfg_open, cfg.rfg_ext)
        # NOTE: insertions at consecutive read positions share a group only
        # if adjacent; approximate grouping may differ — assert score match
        # only when simple
        if not inss and len({e[1] for e in dels}) == len(dels):
            assert score == best, f"trial {trial}: {score} != {best} {edits}"


def test_banded_local_softclip(rng):
    """Local mode clips low-quality ends."""
    cfg = LOCAL
    lq = 30
    band = np.random.default_rng(5).integers(0, 4, lq + K).astype(np.uint8)
    rd = band[C : C + lq].copy()
    rd[:3] = (band[C : C + 3] + 1) % 4   # mismatches at the start
    rd[-2:] = (band[C + lq - 2 : C + lq] + 1) % 4
    mm = np.full(lq, 6, np.int32)
    best, bi, bk = banded_best_numpy(rd, mm, band, cfg)
    assert best == 2 * 25  # middle 25 matches
    edits, start, read_start = banded_traceback(rd, mm, band, cfg, bi, bk)
    assert read_start == 3 and bi == lq - 3 + 2 - 2  # ends at read pos 27
    assert not edits
