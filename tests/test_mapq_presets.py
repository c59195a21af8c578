"""Direct unit tests of the MAPQ v2 table and preset/policy parsing."""
from bowtie2_server_tpu.align.mapq import mapq_v2
from bowtie2_server_tpu.utils.presets import apply_policy_string, preset_params
from bowtie2_server_tpu.utils.scoring import Scoring
from bowtie2_server_tpu.utils.simple_func import SimpleFunc


def test_mapq_e2e_table_spots():
    # end-to-end, 100bp read: scMin = -60, scPer = 0, diff = 60
    # unique perfect -> 42 (observed throughout the golden outputs)
    assert mapq_v2(0, None, -60, 0, True) == 42
    assert mapq_v2(-3, None, -60, 0, True) == 42      # bestOver 57 >= 48
    assert mapq_v2(-13, None, -60, 0, True) == 40     # 47 >= 42 (0.7)
    assert mapq_v2(-25, None, -60, 0, True) == 23     # 35 in [30, 36)
    # with second-best: perfect + far second -> 39
    assert mapq_v2(0, -59, -60, 0, True) == 39
    # equal best/secbest -> 0 or 1
    assert mapq_v2(0, 0, -60, 0, True) in (0, 1)


def test_mapq_local_table_spots():
    # local 100bp: scPer = 200, scMin = 20 + 8*ln(100) = 56, diff = 144
    assert mapq_v2(200, None, 56, 200, False) == 44
    assert mapq_v2(200, 60, 56, 200, False) == 40     # bestdiff 140 >= 129.6


def test_presets():
    sc, pol = preset_params("very-sensitive", False)
    assert pol["seed_len"] == 20 and pol["n_seed_rounds"] == 3
    assert sc.match_bonus == 0
    sc, pol = preset_params(None, True)
    assert pol["seed_len"] == 20
    assert sc.local and sc.match_bonus == 2


def test_policy_string():
    sc, pol = preset_params(None, False)
    sc2, pol2 = apply_policy_string(
        "SEEDLEN=18;IVAL=L,2,0;MIN=L,-1,-1;MMP=Q,10,3;RDG=6,4", sc, dict(pol))
    assert pol2["seed_len"] == 18
    assert pol2["interval"].f_int(100) == 2
    assert sc2.score_min.f_int(100) == -101
    assert sc2.mm_pen_max == 10 and sc2.mm_pen_min == 3
    assert sc2.read_gap_open == 10 and sc2.read_gap_extend == 4


def test_simple_func_truncation_semantics():
    # the C-cast truncation that seed intervals depend on
    f = SimpleFunc.parse("S,1,1.15")
    assert f.f_int(55) == 9     # trunc(9.53), NOT 10
    assert f.f_int(100) == 12   # trunc(12.5)
    g = SimpleFunc.parse("L,-0.6,-0.6")
    assert g.f_int(100) == -60  # trunc toward zero, NOT -61


def test_mapq_batch_matches_scalar():
    """mapq_v2_batch reproduces the scalar decision table exactly over a
    dense (best, secbest) grid in both modes (ref: unique.h:171-416)."""
    import numpy as np
    from bowtie2_server_tpu.align.mapq import mapq_v2_batch

    sc_min, sc_per = -60, 0          # e2e-style range
    bests, secs, hass = [], [], []
    for best in range(sc_min, sc_per + 1, 3):
        bests.append(best); secs.append(0); hass.append(False)
        for sec in range(sc_min, best + 1, 7):
            bests.append(best); secs.append(sec); hass.append(True)
    for monotone in (True, False):
        want = [mapq_v2(b, (s if h else None), sc_min, sc_per, monotone)
                for b, s, h in zip(bests, secs, hass)]
        got = mapq_v2_batch(np.array(bests), np.array(secs),
                            np.array(hass), sc_min, sc_per, monotone)
        assert got.tolist() == want
    # local-style positive range
    sc_min2, sc_per2 = 20, 200
    bests = list(range(sc_min2, sc_per2 + 1, 9))
    secs = [max(sc_min2, b - 37) for b in bests]
    for monotone in (True, False):
        want = [mapq_v2(b, s, sc_min2, sc_per2, monotone)
                for b, s in zip(bests, secs)]
        got = mapq_v2_batch(np.array(bests), np.array(secs),
                            np.ones(len(bests), bool), sc_min2, sc_per2,
                            monotone)
        assert got.tolist() == want


def test_mapq_v3_table_spots():
    from bowtie2_server_tpu.align.mapq import mapq_v3
    # e2e 100bp: scMin=-60, scPer=0 (ref: unique.h:96 BowtieMapq3)
    assert mapq_v3(0, None, -60, 0, True) == 44      # unp_nosec_perf
    assert mapq_v3(-6, None, -60, 0, True) == 42     # bin 1 -> unp_nosec[1]
    assert mapq_v3(-33, None, -60, 0, True) == 20    # bin 6 -> unp_nosec[6]
    # perfect + secbest: unp_sec_perf[best_bin=0] = 2 (verbatim quirk:
    # unique.h:146 indexes the perf table by best_bin, which is 0 for a
    # perfect e2e score)
    assert mapq_v3(0, -60, -60, 0, True) == 2
    assert mapq_v3(-6, -12, -60, 0, True) == 14      # unp_sec[1][1]


def test_mapq_v1_table_spots():
    from bowtie2_server_tpu.align.mapq import mapq_v1
    assert mapq_v1(0, None, -60, 0, True) == 37      # top third
    assert mapq_v1(-25, None, -60, 0, True) == 25    # top half
    assert mapq_v1(-35, None, -60, 0, True) == 10
    assert mapq_v1(0, -60, -60, 0, True) == 6        # bestdiff 60 >= 49.98
    assert mapq_v1(0, 0, -60, 0, True) == 1


def test_mapq_batch_dispatch():
    import numpy as np
    from bowtie2_server_tpu.align.mapq import mapq_batch
    best = np.array([0, -6]); sec = np.array([0, -12])
    has = np.array([False, True])
    lo = np.array([-60, -60]); hi = np.array([0, 0])
    assert list(mapq_batch(3, best, sec, has, lo, hi, True)) == [44, 14]
    # second lane: bestdiff 6 < 60*0.1666 -> bottom bin = 1
    assert list(mapq_batch(1, best, sec, has, lo, hi, True)) == [37, 1]
