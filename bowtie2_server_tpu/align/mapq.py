"""Mapping quality V2 (default `--mapq-v 2`) (ref: unique.h:171-416
BowtieMapq2::mapq).

The decision table maps (bestOver, bestdiff) — the best score above the
minimum valid score, and the gap to the second-best alignment — onto MAPQ
values, with separate tables for end-to-end (monotone) and local modes.
Thresholds are computed as diff * (double)(float)K to match the reference's
float32 constants promoted to double.
"""
from __future__ import annotations

import numpy as np


def _f32(x: float) -> float:
    return float(np.float32(x))


def mapq_v2(best: int, secbest: int | None, sc_min: int, sc_per: int,
            monotone: bool) -> int:
    """MAPQ for an aligned read. secbest=None when no second-best alignment
    was found. sc_min = minimum valid score, sc_per = perfect score."""
    diff = max(1, sc_per - sc_min)
    best_over = best - sc_min

    def ge(frac):  # bestOver >= diff * frac (float32 constant semantics)
        return best_over >= diff * _f32(frac)

    if monotone:  # end-to-end
        if secbest is None:
            if ge(0.8): return 42
            if ge(0.7): return 40
            if ge(0.6): return 24
            if ge(0.5): return 23
            if ge(0.4): return 8
            if ge(0.3): return 3
            return 0
        bestdiff = abs(abs(best) - abs(secbest))
        full = best_over == diff
        if bestdiff >= diff * _f32(0.9):
            return 39 if full else 33
        if bestdiff >= diff * _f32(0.8):
            return 38 if full else 27
        if bestdiff >= diff * _f32(0.7):
            return 37 if full else 26
        if bestdiff >= diff * _f32(0.6):
            return 36 if full else 22
        if bestdiff >= diff * _f32(0.5):
            if full: return 35
            if ge(0.84): return 25
            if ge(0.68): return 16
            return 5
        if bestdiff >= diff * _f32(0.4):
            if full: return 34
            if ge(0.84): return 21
            if ge(0.68): return 14
            return 4
        if bestdiff >= diff * _f32(0.3):
            if full: return 32
            if ge(0.88): return 18
            if ge(0.67): return 15
            return 3
        if bestdiff >= diff * _f32(0.2):
            if full: return 31
            if ge(0.88): return 17
            if ge(0.67): return 11
            return 0
        if bestdiff >= diff * _f32(0.1):
            if full: return 30
            if ge(0.88): return 12
            if ge(0.67): return 7
            return 0
        if bestdiff > 0:
            return 6 if ge(0.67) else 2
        return 1 if ge(0.67) else 0
    else:  # local
        if secbest is None:
            if ge(0.8): return 44
            if ge(0.7): return 42
            if ge(0.6): return 41
            if ge(0.5): return 36
            if ge(0.4): return 28
            if ge(0.3): return 24
            return 22
        bestdiff = abs(abs(best) - abs(secbest))
        full = best_over == diff
        if bestdiff >= diff * _f32(0.9): return 40
        if bestdiff >= diff * _f32(0.8): return 39
        if bestdiff >= diff * _f32(0.7): return 38
        if bestdiff >= diff * _f32(0.6): return 37
        if bestdiff >= diff * _f32(0.5):
            if full: return 35
            return 25 if ge(0.50) else 20
        if bestdiff >= diff * _f32(0.4):
            if full: return 34
            return 21 if ge(0.50) else 19
        if bestdiff >= diff * _f32(0.3):
            if full: return 33
            return 18 if ge(0.5) else 16
        if bestdiff >= diff * _f32(0.2):
            if full: return 32
            return 17 if ge(0.5) else 12
        if bestdiff >= diff * _f32(0.1):
            if full: return 31
            return 14 if ge(0.5) else 9
        if bestdiff > 0:
            return 11 if ge(0.5) else 2
        return 1 if ge(0.5) else 0
