"""Device-resident candidate generation + DP + selection — the hot path.

The round-1 pipeline ran each stage as a separate device call and did
candidate bookkeeping (dedup sets, window assembly, per-read selection) in
Python, costing ~10 blocking host<->device round-trips and ~125 us/read of
interpreter time. This module fuses the whole per-batch search into ONE
jitted program (ref: the reference's whole hot loop,
bt2_search.cpp:3050-4197 multiseedSearchWorker + aligner_sw_driver.cpp:756
SwDriver::extendSeeds):

  1. reverse-complement + recorded backward pass, both strands
     (ref: aligner_seed.cpp:854 exactSweep)
  2. 1-mismatch branch search, fw halves on the fw index, reversed right
     halves on the mirror index (ref: aligner_seed.cpp:973 oneMmSearch)
  3. seed rounds with device-side round-2 gating on hit-repetitiveness
     (ref: bt2_search.cpp:3824-4089, seedBoostThresh)
  4. SA resolution of every surviving range — one gather into the full SA
     (ref: group_walk.h, redesigned)
  5. candidate dedup on (lane, diagonal) via a 2-key lexicographic sort
     (ref: SwDriver seenDiags, aligner_sw_driver.h:300)
  6. banded affine-gap DP over every interior candidate (ops/sw_banded.py)
  7. per-read best + second-best-distinct-end selection via segment maxes
     (ref: AlnSinkWrap best/secbest bookkeeping, aln_sink.h)

Everything is fixed-shape: branch/element/candidate sets are compacted to
static capacities with overflow counters; the host falls back to the
general (slower, unbounded) path when a counter trips.  The seed *schedule*
(offsets per round, SimpleFunc interval math) is precomputed vectorized on
the host and shipped as small arrays so device and host semantics can never
diverge.

Outputs are packed into three dense arrays (per-candidate, per-read,
counters) so a batch costs a constant number of D2H transfers regardless
of content.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import fm as dfm
from ..ops.sw import LANES, NEG_INF, SwConfig
from ..ops.sw_banded import _banded_tile_xla, _pallas_banded


def _pow2(n: int, lo: int = 1) -> int:
    return max(lo, 1 << max(0, int(n - 1).bit_length()))


class CandGenCfg(NamedTuple):
    """Static (hashable) shape/config parameters of one compiled pipeline."""
    B: int            # reads per batch (padded)
    L: int            # padded read length
    S: int            # max seeds per strand per round
    R: int            # seed rounds (statically unrolled)
    E: int            # max SA elements resolved per range
    seed_len: int
    K: int            # DP band width
    k1: int           # 1mm surviving-branch capacity per chunk
    chunk_w: int      # 1mm branch positions per chunk
    n_chunks: int
    C_pre: int        # resolved-element capacity (pre-dedup)
    C_max: int        # unique-candidate capacity
    sw: SwConfig
    engine: str       # 'xla' | 'pallas'
    boost_thresh: int = 300  # ref: bt2_search.cpp:4086 seedBoostThresh


class DeviceIndex(NamedTuple):
    """Device-resident index arrays shared by all batches (a pytree)."""
    fw: dfm.DeviceFm
    mirror: dfm.DeviceFm
    joined: jax.Array       # [n] uint8 packed unambiguous text
    run_starts: jax.Array   # [R] int32 unambiguous-run joined starts
    run_ends: jax.Array     # [R] int32 run joined ends


def make_device_index(idx, device=None) -> DeviceIndex:
    put = lambda x: jax.device_put(x, device)
    run_starts = idx.run_joined_start.astype(np.int32)
    run_ends = np.append(idx.run_joined_start[1:], idx.n).astype(np.int32)
    return DeviceIndex(
        fw=dfm.to_device(idx.fw, device),
        mirror=dfm.to_device(idx.mirror, device),
        joined=put(idx.joined),
        run_starts=put(run_starts),
        run_ends=put(run_ends),
    )


# ------------------------------------------------------------ device utils -

def _rc_rows(seqs, lens):
    """[B, L] reverse-complement each row within its length (pad 5)."""
    B, L = seqs.shape
    j = jnp.arange(L, dtype=jnp.int32)[None, :]
    src = lens[:, None] - 1 - j
    ok = src >= 0
    g = jnp.take_along_axis(seqs, jnp.clip(src, 0, L - 1).astype(jnp.int32),
                            axis=1)
    comp = jnp.where(g <= 3, 3 - g, g)
    return jnp.where(ok, comp, 5).astype(seqs.dtype)


def _rev_rows(a, lens, fill):
    """[B, L] plain per-row reversal within length."""
    B, L = a.shape
    j = jnp.arange(L, dtype=jnp.int32)[None, :]
    src = lens[:, None] - 1 - j
    ok = src >= 0
    g = jnp.take_along_axis(a, jnp.clip(src, 0, L - 1).astype(jnp.int32),
                            axis=1)
    return jnp.where(ok, g, fill).astype(a.dtype)


def _seg_max(data, ids, B):
    # empty segments fill with the dtype's max-identity (INT32_MIN)
    return jax.ops.segment_max(data, ids, num_segments=B)


# ------------------------------------------------------------- fused kernel -

@functools.partial(jax.jit, static_argnames=("cfg",))
def fused_pipeline(didx: DeviceIndex, cfg: CandGenCfg,
                   fw_seqs, mm_fw, lens, act_fw, act_rc, minsc,
                   seed_start, seed_valid, seed_r0_active):
    """One whole search batch on device.

    fw_seqs: [B, L] uint8 codes; mm_fw: [B, L] uint8 per-position mismatch
    penalties (quality-derived, original orientation); lens: [B] int32;
    act_fw/act_rc: [B] bool strand-active masks (filters + --nofw/--norc);
    minsc: [B] int32 score minimums; seed_start: [B, R, S] int32 seed
    depths (aligned-strand read coords); seed_valid: [B, R, S] bool;
    seed_r0_active: [B] bool (active and not seed-skipped).

    Returns (cand_pack [10, C_max] i32, read_pack [6, B] i32,
             counters [6] i32).
    """
    B, L, E = cfg.B, cfg.L, cfg.E
    # joined TEXT length (the BWT has one more row than the text)
    n_text = didx.joined.shape[0]
    lens = lens.astype(jnp.int32)

    rc_seqs = _rc_rows(fw_seqs, lens)
    mm_rc = _rev_rows(mm_fw, lens, 0)
    both = jnp.concatenate([fw_seqs, rc_seqs])          # [2B, L] lane order
    mm_both = jnp.concatenate([mm_fw, mm_rc])
    lens2 = jnp.concatenate([lens, lens])
    act2 = jnp.concatenate([act_fw, act_rc])
    half2 = lens2 // 2

    # ---- stage 1+2: recorded backward pass (fw index) + exact ranges ----
    tops, bots = dfm.backward_search_record_body(didx.fw, both, lens2)
    lane_i = jnp.arange(2 * B)
    et = tops[lane_i, jnp.clip(lens2, 0, L)]
    eb = bots[lane_i, jnp.clip(lens2, 0, L)]
    exact_ok = act2 & (et < eb)
    exact_cnt = jnp.where(exact_ok, eb - et, 0).astype(jnp.uint32)
    exact_mult = jnp.minimum(exact_cnt[:B] + exact_cnt[B:],
                             jnp.uint32(1 << 30)).astype(jnp.int32)

    # ---- stage 3: 1mm branches (ref: oneMmSearch case split at middle) ----
    def one_mm(fm, pat, hi, tops_, bots_):
        """Chunked substitution-branch search; returns per-chunk compacted
        (lane, top, bot, full_ok) lists + max survivor count."""
        outs, max_cnt = [], jnp.int32(0)
        for c in range(cfg.n_chunks):
            cb, cm, pos, top, bot, count = dfm.one_mm_phase0_body(
                fm, pat, lens2, hi, tops_, bots_,
                c * cfg.chunk_w, cfg.chunk_w, cfg.k1)
            st = dfm.one_mm_phase1_body(fm, pat, cb, pos, top, bot,
                                        L // 2 + 2)
            posf, topf, botf = st[0], st[1], st[2]
            ok = (cb >= 0) & (posf < 0) & (topf < botf)
            outs.append((cb, topf, botf, ok))
            max_cnt = jnp.maximum(max_cnt, count)
        return outs, max_cnt

    pat_i8 = both.astype(jnp.int8)
    hits_fw, cnt_fw = one_mm(didx.fw, pat_i8,
                             jnp.where(act2, half2, 0), tops, bots)

    rev2 = _rev_rows(both, lens2, 5)
    tops_m, bots_m = dfm.backward_search_record_body(didx.mirror, rev2, lens2)
    hits_mr, cnt_mr = one_mm(didx.mirror, rev2.astype(jnp.int8),
                             jnp.where(act2, lens2 - half2, 0),
                             tops_m, bots_m)

    # ---- stage 4: seed rounds ----
    # patterns gathered per (read, strand, seed); round-2 gating on device.
    S = cfg.S
    sl = jnp.minimum(cfg.seed_len, lens)                # [B]
    seed_ranges = []   # (lane [B*2S], depth, top, bot, valid)
    round_active = seed_r0_active
    seeds_failed_r0 = jnp.zeros(B, bool)
    js = jnp.arange(cfg.seed_len, dtype=jnp.int32)

    for r in range(cfg.R):
        sv = seed_valid[:, r, :] & round_active[:, None]      # [B, S]
        start_fw = seed_start[:, r, :]                        # [B, S]
        start_rc = lens[:, None] - start_fw - sl[:, None]
        pats, valids, depths, lanes = [], [], [], []
        for is_fw, seqs_, starts, act_s in ((True, fw_seqs, start_fw, act_fw),
                                            (False, rc_seqs, start_rc, act_rc)):
            idxg = starts[:, :, None] + js[None, None, :]     # [B, S, k]
            idxc = jnp.clip(idxg, 0, L - 1)
            pat = seqs_[jnp.arange(B)[:, None, None], idxc]
            in_seed = js[None, None, :] < sl[:, None, None]
            has_n = jnp.any((pat > 3) & in_seed, axis=2)
            v = sv & act_s[:, None] & ~has_n & (starts >= 0)
            pat = jnp.where(in_seed, pat, 5)
            pats.append(pat)
            valids.append(v)
            depths.append(starts)
            lanes.append(jnp.broadcast_to(
                (jnp.arange(B, dtype=jnp.int32)
                 + (0 if is_fw else B))[:, None], (B, S)))
        pat_all = jnp.concatenate(pats).reshape(2 * B * S, cfg.seed_len)
        val_all = jnp.concatenate(valids).reshape(-1)
        dep_all = jnp.concatenate(depths).reshape(-1)
        lane_all = jnp.concatenate(lanes).reshape(-1)
        slen_all = jnp.repeat(sl, S, total_repeat_length=B * S)
        slen_all = jnp.concatenate([slen_all, slen_all])
        stop, sbot = dfm.backward_search_body(
            didx.fw, pat_all, jnp.where(val_all, slen_all, 0), use_ftab=True)
        hit = val_all & (stop < sbot)
        seed_ranges.append((lane_all, dep_all, stop, sbot, hit))

        # round stats per read (ref: averageHitsPerSeed, bt2_search.cpp:4086)
        read_of = lane_all % B
        inst = jax.ops.segment_sum(val_all.astype(jnp.int32), read_of,
                                   num_segments=B)
        nonz = jax.ops.segment_sum(hit.astype(jnp.int32), read_of,
                                   num_segments=B)
        tot = jax.ops.segment_sum(
            jnp.where(hit, sbot - stop, 0).astype(jnp.int32), read_of,
            num_segments=B)
        if r == 0:
            seeds_failed_r0 = seed_r0_active & ((inst == 0) | (nonz == 0))
        round_active = round_active & (inst > 0) & (nonz > 0) & \
            (tot >= cfg.boost_thresh * nonz)

    # ---- stage 5: assemble ranges -> elements -> resolve ----
    r_lane = [lane_i, ]
    r_depth = [jnp.zeros(2 * B, jnp.int32)]
    r_top = [et]
    r_cnt = [jnp.minimum(jnp.where(exact_ok, eb - et, 0), E)]
    r_mirror = [jnp.zeros(2 * B, bool)]
    for src, is_m in ((hits_fw, False), (hits_mr, True)):
        for cb, topf, botf, ok in src:
            r_lane.append(jnp.clip(cb, 0, 2 * B - 1))
            r_depth.append(jnp.zeros(cfg.k1, jnp.int32))
            r_top.append(topf)
            r_cnt.append(jnp.minimum(jnp.where(ok, botf - topf, 0), E))
            r_mirror.append(jnp.full(cfg.k1, is_m, bool))
    for lane_all, dep_all, stop, sbot, hit in seed_ranges:
        r_lane.append(lane_all)
        r_depth.append(dep_all)
        r_top.append(stop)
        r_cnt.append(jnp.minimum(jnp.where(hit, sbot - stop, 0), E))
        r_mirror.append(jnp.zeros(lane_all.shape[0], bool))
    r_lane = jnp.concatenate(r_lane).astype(jnp.int32)
    r_depth = jnp.concatenate(r_depth).astype(jnp.int32)
    r_top = jnp.concatenate(r_top).astype(jnp.int32)
    r_cnt = jnp.concatenate(r_cnt).astype(jnp.int32)
    r_mirror = jnp.concatenate(r_mirror)
    NR = r_lane.shape[0]

    ev = (jnp.arange(E, dtype=jnp.int32)[None, :] < r_cnt[:, None]).reshape(-1)
    n_elts = jnp.sum(ev.astype(jnp.int32))
    sel = jnp.nonzero(ev, size=cfg.C_pre, fill_value=NR * E)[0]
    pad = sel >= NR * E
    ridx = jnp.clip(sel // E, 0, NR - 1)
    row = r_top[ridx] + (sel % E).astype(jnp.int32)
    lane = r_lane[ridx]
    read = lane % B
    rl = lens[read]
    row_c = jnp.clip(row, 0, didx.fw.sa.shape[0] - 1)
    off = jnp.where(r_mirror[ridx],
                    didx.mirror.sa[jnp.minimum(
                        row_c, didx.mirror.sa.shape[0] - 1)].astype(jnp.int32),
                    didx.fw.sa[row_c].astype(jnp.int32))
    diag = jnp.where(r_mirror[ridx], n_text - off - rl,
                     off - r_depth[ridx])
    e_ok = ~pad & (diag > -rl)

    # ---- stage 6: dedup on (lane, diag) via 2-key sort ----
    key_lane = jnp.where(e_ok, lane, jnp.int32(1 << 30))
    key_diag = diag
    s_lane, s_diag = jax.lax.sort((key_lane, key_diag), num_keys=2)
    prev_lane = jnp.concatenate([jnp.array([-1], jnp.int32), s_lane[:-1]])
    prev_diag = jnp.concatenate([jnp.array([0], jnp.int32), s_diag[:-1]])
    uniq = (s_lane < (1 << 30)) & ((s_lane != prev_lane)
                                   | (s_diag != prev_diag))
    n_cand = jnp.sum(uniq.astype(jnp.int32))
    csel = jnp.nonzero(uniq, size=cfg.C_max, fill_value=cfg.C_pre)[0]
    cpad = csel >= cfg.C_pre
    cselc = jnp.clip(csel, 0, cfg.C_pre - 1)
    c_lane = jnp.where(cpad, 0, s_lane[cselc])
    c_diag = jnp.where(cpad, 0, s_diag[cselc])
    c_valid = ~cpad

    # ---- stage 7: banded DP over interior candidates ----
    K = cfg.K
    c_read = c_lane % B
    c_fw = c_lane < B
    c_rl = lens[c_read]
    ws = c_diag - K // 2
    run_i = jnp.clip(
        jnp.searchsorted(didx.run_starts, jnp.maximum(c_diag, 0),
                         side="right") - 1,
        0, didx.run_starts.shape[0] - 1)
    lo = didx.run_starts[run_i]
    hi_run = didx.run_ends[run_i]
    interior = c_valid & (ws >= lo) & (ws + c_rl + K <= hi_run)

    Cx = cfg.C_max
    wi = ws[:, None] + jnp.arange(L + K, dtype=jnp.int32)[None, :]
    band = didx.joined[jnp.clip(wi, 0, n_text - 1)]     # [C, L+K]
    rd_c = both[jnp.clip(c_lane, 0, 2 * B - 1)]          # [C, L]
    mm_c = mm_both[jnp.clip(c_lane, 0, 2 * B - 1)]
    lens_c = jnp.maximum(c_rl, 1)

    rd_t = rd_c.T.astype(jnp.int32)
    mm_t = mm_c.T.astype(jnp.int32)
    band_t = band.T.astype(jnp.int32)
    if cfg.engine == "pallas":
        call = _pallas_banded(cfg.sw, K, L, Cx // LANES, False)
        best, bi, bk = call(rd_t, mm_t, lens_c[None, :].astype(jnp.int32),
                            band_t)
        best, bi, bk = best[0], bi[0], bk[0]
    else:
        best, bi, bk = _banded_tile_xla(cfg.sw, K, rd_t, mm_t,
                                        lens_c.astype(jnp.int32), band_t)
    c_end = ws + bi + bk
    c_score = jnp.where(interior, best, jnp.int32(NEG_INF))

    # ---- stage 8: per-read selection (best + secbest-distinct-end) ----
    sel_ok = interior & (c_score >= minsc[c_read])
    NEG = jnp.int32(NEG_INF)
    sc = jnp.where(sel_ok, c_score, NEG)
    best_sc = _seg_max(sc, c_read, B)
    is_bs = sel_ok & (c_score == best_sc[c_read])
    ndiag = jnp.where(is_bs, -c_diag, jnp.int32(-(1 << 30)))
    best_nd = _seg_max(ndiag, c_read, B)
    is_bd = is_bs & (-c_diag == best_nd[c_read])
    fwi = jnp.where(is_bd, c_fw.astype(jnp.int32), -1)
    best_fwi = _seg_max(fwi, c_read, B)
    is_bf = is_bd & (c_fw.astype(jnp.int32) == best_fwi[c_read])
    cand_i = jnp.arange(Cx, dtype=jnp.int32)
    best_ci = jnp.maximum(_seg_max(jnp.where(is_bf, cand_i, -1), c_read, B), -1)

    bcl = jnp.clip(best_ci, 0, Cx - 1)
    best_end_r = c_end[bcl]
    best_fw_r = c_fw[bcl]
    sec_ok = sel_ok & ((c_end != best_end_r[c_read])
                       | (c_fw != best_fw_r[c_read]))
    sec_sc = _seg_max(jnp.where(sec_ok, c_score, NEG), c_read, B)
    has_rect = jnp.maximum(
        _seg_max((c_valid & ~interior).astype(jnp.int32), c_read, B), 0)

    cand_pack = jnp.stack([
        c_read.astype(jnp.int32), c_fw.astype(jnp.int32), c_diag,
        c_score, c_end, bi, bk, interior.astype(jnp.int32),
        c_valid.astype(jnp.int32), ws])
    read_pack = jnp.stack([
        best_ci, best_sc, sec_sc, exact_mult,
        seeds_failed_r0.astype(jnp.int32), has_rect])
    counters = jnp.stack([
        n_cand, n_elts, cnt_fw, cnt_mr,
        jnp.int32(cfg.C_max), jnp.int32(cfg.C_pre)])
    return cand_pack, read_pack, counters


# --------------------------------------------------------------- host side -

def per_len(fn, lens):
    """Vectorize a scalar function of read length over a batch (few unique
    lengths per batch in practice)."""
    uniq, inv = np.unique(lens, return_inverse=True)
    vals = np.array([fn(int(l)) if l > 0 else fn(1) for l in uniq])
    return vals[inv]


def seed_schedule(pol, lens, boost):
    """Vectorized port of UnpairedAligner.seed_offsets (ref:
    bt2_search.cpp:3848-3870, aligner_seed.cpp:523-529): per-read seed
    depths and validity for every round, as [B, R, S] arrays.

    Returns (start, valid, S) with S the padded max seed count."""
    B = len(lens)
    R = pol.n_seed_rounds
    Ls = pol.seed_len
    lens = np.asarray(lens, np.int64)
    interval = np.maximum(1, per_len(pol.interval.f_int, lens)).astype(np.int64)
    boost = np.asarray(boost, bool)
    interval = np.where(boost,
                        np.maximum(1, (interval * 1.2 + 0.5).astype(np.int64)),
                        interval)
    nrounds = np.where(boost, -(-R // 2), R)

    nseeds_max = 1
    rows = []
    for r in range(R):
        ok = (interval > r) & (r < nrounds)
        off = (interval * r) // nrounds
        ok &= ~((off > 0) & (Ls + off > lens))
        nseeds = np.where(ok, 1 + np.where(lens - off > Ls,
                                           (lens - off - Ls) // interval, 0), 0)
        rows.append((off, nseeds))
        nseeds_max = max(nseeds_max, int(nseeds.max(initial=1)))
    S = _pow2(nseeds_max, lo=4)
    start = np.zeros((B, R, S), np.int32)
    valid = np.zeros((B, R, S), bool)
    s_i = np.arange(S)[None, :]
    for r, (off, nseeds) in enumerate(rows):
        start[:, r, :] = (off[:, None] + s_i * interval[:, None]).astype(np.int32)
        valid[:, r, :] = s_i < nseeds[:, None]
    return start, valid, S


class BatchResult:
    """Decoded outputs of one fused_pipeline run (host numpy)."""
    __slots__ = ("B0", "c_read", "c_fw", "c_diag", "c_score", "c_end",
                 "c_bi", "c_bk", "c_interior", "c_ws", "best_ci", "best_sc",
                 "sec_sc", "exact_mult", "seeds_failed_r0", "has_rect",
                 "overflow")

    def __init__(self, B0, cand_pack, read_pack, counters, cfg):
        self.B0 = B0
        n_cand, n_elts, cnt_fw, cnt_mr = (int(counters[0]), int(counters[1]),
                                          int(counters[2]), int(counters[3]))
        self.overflow = (n_cand > cfg.C_max or n_elts > cfg.C_pre
                         or cnt_fw > cfg.k1 or cnt_mr > cfg.k1)
        valid = cand_pack[8].astype(bool)
        keep = valid & (cand_pack[0] < B0)
        self.c_read = cand_pack[0][keep]
        self.c_fw = cand_pack[1][keep].astype(bool)
        self.c_diag = cand_pack[2][keep]
        self.c_score = cand_pack[3][keep]
        self.c_end = cand_pack[4][keep]
        self.c_bi = cand_pack[5][keep]
        self.c_bk = cand_pack[6][keep]
        self.c_interior = cand_pack[7][keep].astype(bool)
        self.c_ws = cand_pack[9][keep]
        # remap best_ci (an index into the packed arrays) to compacted space
        remap = np.cumsum(keep) - 1
        bc = read_pack[0][:B0]
        self.best_ci = np.where(bc >= 0, remap[np.clip(bc, 0, len(keep) - 1)],
                                -1).astype(np.int32)
        self.best_sc = read_pack[1][:B0]
        self.sec_sc = read_pack[2][:B0]
        self.exact_mult = read_pack[3][:B0]
        self.seeds_failed_r0 = read_pack[4][:B0].astype(bool)
        self.has_rect = read_pack[5][:B0] > 0


class CandGen:
    """Host driver of the fused device pipeline: padding/bucketing, seed
    schedules, dispatch (async) and fetch (single packed transfer)."""

    def __init__(self, dev_fw, dev_mirror, idx, pol, sw_cfg, engine: str,
                 K: int, device=None, mesh=None):
        self.mesh = mesh
        put = lambda x: jax.device_put(x, device)
        self.didx = DeviceIndex(
            fw=dev_fw, mirror=dev_mirror,
            joined=put(idx.joined),
            run_starts=put(idx.run_joined_start.astype(np.int32)),
            run_ends=put(np.append(idx.run_joined_start[1:],
                                   idx.n).astype(np.int32)))
        self.pol = pol
        self.sw_cfg = sw_cfg
        self.engine = engine
        self.K = K

    def dispatch(self, seqs, quals, lens, act_fw, act_rc, minsc, mmtab,
                 boost=None, seed_skip=None):
        """seqs/quals: [B0, L0] uint8/int; lens [B0]. Returns an opaque
        handle (device arrays still in flight) for fetch()."""
        B0, L0 = seqs.shape
        ndev = self.mesh.devices.size if self.mesh is not None else 1
        B_local = _pow2(-(-B0 // ndev), lo=max(256 // ndev, 64))
        Bp = B_local * ndev
        Lp = _pow2(max(L0, 32), lo=32)
        pol = self.pol

        if boost is None:
            boost = np.zeros(B0, bool)
        if seed_skip is None:
            seed_skip = np.zeros(B0, bool)
        start, valid, S = seed_schedule(pol, lens, boost)

        def padB(a, fill=0):
            if a.shape[0] == Bp:
                return a
            out = np.full((Bp,) + a.shape[1:], fill, a.dtype)
            out[:B0] = a
            return out

        seqs_p = np.full((Bp, Lp), 5, np.uint8)
        seqs_p[:B0, :L0] = seqs
        mm_p = np.zeros((Bp, Lp), np.uint8)
        mm_p[:B0, :L0] = mmtab[np.clip(quals, 0, 255)].astype(np.uint8)
        lens_p = padB(np.asarray(lens, np.int32))
        act_fw_p = padB(np.asarray(act_fw, bool))
        act_rc_p = padB(np.asarray(act_rc, bool))
        minsc_p = padB(np.asarray(minsc, np.int32))
        start_p = padB(start)
        valid_p = padB(valid)
        r0_p = padB((act_fw | act_rc) & ~np.asarray(seed_skip, bool))

        GRID = 4 << 20
        Bl = B_local
        cw = min(_pow2(max(Lp // 2, 8), lo=8), max(8, GRID // (2 * Bl * 4)))
        n_chunks = -(-(Lp // 2) // cw)
        cfg = CandGenCfg(
            B=Bl, L=Lp, S=S, R=pol.n_seed_rounds, E=pol.max_sa_elts,
            seed_len=pol.seed_len, K=self.K,
            k1=_pow2(4 * Bl, lo=4096), chunk_w=cw, n_chunks=n_chunks,
            C_pre=_pow2(16 * Bl, lo=8192), C_max=_pow2(4 * Bl, lo=4096),
            sw=self.sw_cfg, engine=self.engine)
        args = (jnp.asarray(seqs_p), jnp.asarray(mm_p),
                jnp.asarray(lens_p), jnp.asarray(act_fw_p),
                jnp.asarray(act_rc_p), jnp.asarray(minsc_p),
                jnp.asarray(start_p), jnp.asarray(valid_p), jnp.asarray(r0_p))
        if self.mesh is not None:
            out = _sharded_pipeline(cfg, self.mesh)(self.didx, *args)
        else:
            out = fused_pipeline(self.didx, cfg, *args)
        return (B0, out, cfg)

    def fetch(self, handle) -> BatchResult:
        B0, (cand_pack, read_pack, counters), cfg = handle
        return BatchResult(B0, np.asarray(cand_pack), np.asarray(read_pack),
                           np.asarray(counters), cfg)


# ------------------------------------------------------------- multi-chip -

@functools.lru_cache(maxsize=16)
def _sharded_pipeline(cfg: CandGenCfg, mesh):
    """shard_map the fused pipeline over the mesh's 'dp' axis: reads are
    sharded, the index replicated (ref: SURVEY §2.3 — the reference's
    read-level data parallelism over worker threads maps to SPMD read
    shards; bt2_search.cpp:4913-4925). Candidate/read indices are remapped
    to global space on device so the host decode is shard-agnostic."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    def local_fn(didx, fw_seqs, mm_fw, lens, act_fw, act_rc, minsc,
                 seed_start, seed_valid, seed_r0):
        cp, rp, ct = fused_pipeline(didx, cfg, fw_seqs, mm_fw, lens,
                                    act_fw, act_rc, minsc, seed_start,
                                    seed_valid, seed_r0)
        s = jax.lax.axis_index("dp").astype(jnp.int32)
        cvalid = cp[8] > 0
        cp = cp.at[0].set(jnp.where(cvalid, cp[0] + s * cfg.B, cp[0]))
        bc = rp[0]
        rp = rp.at[0].set(jnp.where(bc >= 0, bc + s * cfg.C_max, bc))
        return cp, rp, ct

    return jax.jit(shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(),) + (P("dp"),) * 9,
        out_specs=(P(None, "dp"), P(None, "dp"), P("dp")),
        check_rep=False))
