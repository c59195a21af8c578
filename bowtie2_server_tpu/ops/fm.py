"""Batched FM-index ops on device (ref: aligner_seed.cpp:668 searchSeedBi,
:854 exactSweep; bt2_idx.h:1758 countBt2Side, :2087 mapLFEx).

The reference walks one read at a time through LF-mapping with software
prefetch and popcount intrinsics. On TPU the same math becomes batched
gathers + vectorized in-block counts:

    occ(c, row) = occ_ckpt[row // B, c] + count(bwt[row//B*B : row] == c)
    LF: top' = cnt[c] + occ(c, top);  bot' = cnt[c] + occ(c, bot)

applied to [batch]-shaped row vectors under `lax.fori_loop`, one iteration
per pattern character (fixed trip count, masked for finished/invalid lanes —
XLA-friendly control flow instead of data-dependent loops).

SA resolution is a single gather into the full on-device suffix array,
replacing the group-walk subsystem (ref: group_walk.h).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..index.fm import FTAB_CHARS, OCC_BLOCK, FmDirection


class DeviceFm(NamedTuple):
    """Device-resident arrays of one FM direction (a JAX pytree)."""
    bwt: jax.Array       # [n_pad] uint8 (padded to block multiple + 1 block)
    occ: jax.Array       # [n_blocks+1, 4] uint32
    cnt: jax.Array       # [4] int32 C-array
    sa: jax.Array        # [n] uint32 (full suffix array)
    ftab_top: jax.Array  # [4^k] uint32
    ftab_bot: jax.Array  # [4^k] uint32
    n: jax.Array         # [] int32 text length


def to_device(d: FmDirection, device=None) -> DeviceFm:
    n = d.n
    n_blocks = (n + OCC_BLOCK - 1) // OCC_BLOCK
    pad = (n_blocks + 1) * OCC_BLOCK - n
    bwt_pad = np.concatenate([d.bwt, np.full(pad, 255, dtype=np.uint8)])
    put = lambda x: jax.device_put(x, device)
    return DeviceFm(
        bwt=put(bwt_pad),
        occ=put(d.occ),
        cnt=put(d.cnt[:4].astype(np.int32)),
        sa=put(d.sa.astype(np.uint32)),
        ftab_top=put(d.ftab_top),
        ftab_bot=put(d.ftab_bot),
        n=put(np.int32(n)),
    )


def occ_batch(fm: DeviceFm, c: jax.Array, rows: jax.Array) -> jax.Array:
    """Batched occ(c, row): #occurrences of c in bwt[0:row].

    c:    [B] int32 in 0..3
    rows: [B] int32
    -> [B] int32
    """
    blk = rows // OCC_BLOCK
    rem = rows % OCC_BLOCK
    base = fm.occ[blk, c].astype(jnp.int32)                       # [B]
    offs = blk[:, None] * OCC_BLOCK + jnp.arange(OCC_BLOCK)[None, :]
    block = fm.bwt[offs]                                          # [B, BLK] u8
    lane = jnp.arange(OCC_BLOCK, dtype=jnp.int32)[None, :]
    hit = (block == c[:, None].astype(jnp.uint8)) & (lane < rem[:, None])
    return base + jnp.sum(hit, axis=1, dtype=jnp.int32)


def lf_step(fm: DeviceFm, c: jax.Array, top: jax.Array, bot: jax.Array):
    """One batched backward-search step. Lanes with c > 3 (N) or an already
    empty range collapse to the empty range (0, 0)."""
    cc = jnp.minimum(c, 3).astype(jnp.int32)
    new_top = fm.cnt[cc] + occ_batch(fm, cc, top)
    new_bot = fm.cnt[cc] + occ_batch(fm, cc, bot)
    bad = (c > 3) | (top >= bot)
    new_top = jnp.where(bad, 0, new_top)
    new_bot = jnp.where(bad, 0, new_bot)
    return new_top, new_bot


def backward_search(fm: DeviceFm, patterns: jax.Array, lengths: jax.Array,
                    use_ftab: bool = True):
    """Batched exact backward search (right-to-left over each pattern).

    patterns: [B, L] uint8 codes (0..3, >3 = N), left-aligned
    lengths:  [B] int32 actual lengths (<= L)
    -> (top, bot): [B] int32; empty hit = (0, 0).

    With `use_ftab`, the search jumps over the rightmost FTAB_CHARS characters
    via the k-mer table (ref: bt2_idx.h ftabLoHi), then LF-steps the rest.
    """
    B, L = patterns.shape
    k = FTAB_CHARS

    pat = jnp.asarray(patterns).astype(jnp.int32)
    lengths = jnp.asarray(lengths).astype(jnp.int32)
    idx_last = lengths - 1  # position of last char

    def gather_char(step):
        # step counts from the right: step=0 -> last char
        pos = idx_last - step
        safe = jnp.clip(pos, 0, L - 1)
        c = pat[jnp.arange(B), safe]
        return jnp.where(pos >= 0, c, -1)  # -1 marks "past start" (done)

    if use_ftab:
        # Pack rightmost k chars big-endian in text order: chars at
        # positions len-k .. len-1.
        key = jnp.zeros(B, dtype=jnp.int32)
        valid = lengths >= k
        for i in range(k):
            c = gather_char(k - 1 - i)  # text order: leftmost of the k first
            key = key * 4 + jnp.maximum(c, 0)
            valid = valid & (c >= 0) & (c <= 3)
        key = jnp.clip(key, 0, 4 ** k - 1)
        top0 = jnp.where(valid, fm.ftab_top[key].astype(jnp.int32), 0)
        bot0 = jnp.where(valid, fm.ftab_bot[key].astype(jnp.int32), fm.n)
        # Lanes that can't use ftab (short/N in last k chars) start from the
        # whole range and will LF through all chars.
        start_step = jnp.where(valid, k, 0)
    else:
        top0 = jnp.zeros(B, dtype=jnp.int32)
        bot0 = jnp.broadcast_to(fm.n.astype(jnp.int32), (B,))
        start_step = jnp.zeros(B, dtype=jnp.int32)

    def body(step, carry):
        top, bot = carry
        c = gather_char(step)
        active = (step >= start_step) & (c >= 0)
        cc = jnp.where(c < 0, 4, c).astype(jnp.int32)  # c=4 -> empty in lf_step
        nt, nb = lf_step(fm, cc, top, bot)
        top = jnp.where(active, nt, top)
        bot = jnp.where(active, nb, bot)
        return top, bot

    top, bot = jax.lax.fori_loop(0, L, body, (top0, bot0))
    # normalize empties
    empty = top >= bot
    return jnp.where(empty, 0, top), jnp.where(empty, 0, bot)


def sa_resolve(fm: DeviceFm, top: jax.Array, count: jax.Array, max_elts: int):
    """Gather up to max_elts SA entries per range: offsets[b, i] = SA[top[b]+i]
    for i < count[b]; invalid slots = -1. Replaces lazy group-walk resolution
    (ref: group_walk.h GWState::advance) with one gather."""
    B = top.shape[0]
    i = jnp.arange(max_elts, dtype=jnp.int32)[None, :]
    rows = top[:, None] + i
    valid = i < count[:, None]
    offs = fm.sa[jnp.clip(rows, 0, fm.sa.shape[0] - 1)].astype(jnp.int32)
    return jnp.where(valid, offs, -1)


def backward_search_record(fm: DeviceFm, patterns, lengths):
    """Like backward_search, but records the range after every step.

    Returns (tops, bots): [B, L+1] int32 where entry s holds the range after
    matching the length-s suffix of the pattern (s=0 -> the full row range).
    Used by the 1-mismatch search to seed substitution branches
    (ref: aligner_seed.cpp:973 oneMmSearch matches one half exactly first).
    """
    patterns = jnp.asarray(patterns)
    lengths = jnp.asarray(lengths).astype(jnp.int32)
    B, L = patterns.shape
    pat = patterns.astype(jnp.int32)
    idx_last = lengths - 1

    def body(step, carry):
        top, bot, tops, bots = carry
        pos = idx_last - step
        safe = jnp.clip(pos, 0, L - 1)
        c = pat[jnp.arange(B), safe]
        cc = jnp.where(pos < 0, 4, c)
        nt, nb = lf_step(fm, cc, top, bot)
        active = pos >= 0
        top = jnp.where(active, nt, top)
        bot = jnp.where(active, nb, bot)
        tops = tops.at[:, step + 1].set(top)
        bots = bots.at[:, step + 1].set(bot)
        return top, bot, tops, bots

    top0 = jnp.zeros(B, jnp.int32)
    bot0 = jnp.broadcast_to(fm.n.astype(jnp.int32), (B,))
    tops = jnp.zeros((B, L + 1), jnp.int32).at[:, 0].set(top0)
    bots = jnp.zeros((B, L + 1), jnp.int32).at[:, 0].set(bot0)
    _, _, tops, bots = jax.lax.fori_loop(0, L, body, (top0, bot0, tops, bots))
    return tops, bots


@jax.jit
def _lf_step_flat(fm: DeviceFm, c, top, bot):
    return lf_step(fm, c, top, bot)


def one_mm_branch_hits(fm: DeviceFm, patterns, lengths, branch_lo, branch_hi,
                       chunk: int = 1 << 19):
    """Find occurrences of each pattern with EXACTLY one substitution at a
    position p in [branch_lo[b], branch_hi[b]) (ref: aligner_seed.cpp:973
    oneMmSearch — one half matched exactly, then a substitution branch).

    The suffix [p+1:] is matched exactly (one recorded backward pass), then
    each branch applies one substitution character and continues backward
    through [0:p). Dead branches are host-compacted every step — they die
    fast against a random genome, which is what makes this tractable.

    Returns numpy arrays (read_idx, mm_pos, top, bot) of surviving full
    matches.
    """
    patterns = np.asarray(patterns)
    lengths = np.asarray(lengths, np.int64)
    B, L = patterns.shape
    tops, bots = map(np.asarray, backward_search_record(fm, patterns, lengths))

    # substitution branches (b, p, x): x != pat[b, p]
    bs, ps, xs = [], [], []
    for b in range(B):
        lo, hi = int(branch_lo[b]), int(branch_hi[b])
        l = int(lengths[b])
        for p in range(max(lo, 0), min(hi, l)):
            s = l - 1 - p  # suffix length matched before position p
            if tops[b, s] >= bots[b, s]:
                continue
            for x in range(4):
                if x != patterns[b, p]:
                    bs.append(b); ps.append(p); xs.append(x)
    empty = (np.zeros(0, np.int64), np.zeros(0, np.int64),
             np.zeros(0, np.int64), np.zeros(0, np.int64))
    if not bs:
        return empty
    bs = np.asarray(bs); ps = np.asarray(ps); xs = np.asarray(xs)

    hits = [[], [], [], []]

    def emit(cb, cm, top, bot):
        hits[0].append(cb.copy()); hits[1].append(cm.copy())
        hits[2].append(top.copy()); hits[3].append(bot.copy())

    for c0 in range(0, len(bs), chunk):
        cb, cp, cx = bs[c0:c0+chunk], ps[c0:c0+chunk], xs[c0:c0+chunk]
        s = lengths[cb] - 1 - cp
        top = tops[cb, s].astype(np.int32)
        bot = bots[cb, s].astype(np.int32)
        top, bot = map(np.asarray, _lf_step_flat(
            fm, jnp.asarray(cx, jnp.int32), jnp.asarray(top), jnp.asarray(bot)))
        cm = cp.copy()          # the (fixed) mismatch position per branch
        pos = cp - 1            # next position to match exactly
        alive = top < bot
        cb, cm, pos, top, bot = (a[alive] for a in (cb, cm, pos, top, bot))
        while len(cb):
            fin = pos < 0
            if fin.any():
                emit(cb[fin], cm[fin], top[fin], bot[fin])
                keep = ~fin
                cb, cm, pos, top, bot = (a[keep] for a in (cb, cm, pos, top, bot))
                if not len(cb):
                    break
            c = patterns[cb, pos].astype(np.int32)
            top, bot = map(np.asarray, _lf_step_flat(
                fm, jnp.asarray(c), jnp.asarray(top), jnp.asarray(bot)))
            alive = top < bot
            pos = pos - 1
            cb, cm, pos, top, bot = (a[alive] for a in (cb, cm, pos, top, bot))
    if not hits[0]:
        return empty
    return tuple(np.concatenate(h) for h in hits)
