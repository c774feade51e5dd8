"""Bit-exact partial concealment (bfi==2) for the fixed decoder.

Integer-exact port of the fixed-point-only PC chain that the ETSI decoder
runs when the channel decoder flags a frame as partially corrupt
(uncorrectable errors confined to PC codewords): processPCmain_fx
(pc_main_fx.c:17-56), processPCclassify_fx + peakDetector_fx
(pc_classify_fx.c:19-299), processPCapply_fx incl.
getScaleFactor16_withNegativeScaling (pc_apply_fx.c:20-238) and
processPCupdate_fx (pc_update_fx.c:17-90).  Called from
fixed_decoder.FixedDecoder.decode_plc between the arithmetic decode and
the residual/noise-fill stages, exactly where dec_lc3.c:186-193 places it.

Scalar BASOP arithmetic over one frame; state lives in PcState
(setup_dec_lc3.c:64-71,118: q_old_res_fx, prev_gg, prev_BW_cutoff_idx_nf,
prev_fac_ns_fx, pc_nbLostFramesInRow, pc_seed=24607 — the seed itself is
kept on the PLC state so damping_scrambling can address it by name).
"""
from __future__ import annotations

import numpy as np

from .. import tables as T
from .fixed_dec import (I64, MAX32, MIN32, L_shl, inv_log2, mpy_32_16,
                        norm_l, norm_s, round_fx, sat16, sat32, shl16,
                        mac_r, msu_r)
from .fixed_ltpf import _mult_r, _scale_sig, _shl16
from .plc_fixed import div_s, lmac0, sqrt16

_BLOCK = 3       # peakDetector BLOCK_SIZE
_THR1 = 8
_FAC = 9830      # 0.3 in Q15


class PcState:
    """Per-channel PC state (DecSetup fields, setup_dec_lc3.c)."""

    def __init__(self, yLen: int):
        self.q_old_res = np.zeros(yLen, I64)   # Word16 values
        self.q_old_res_exp = 0
        self.prev_gg = 0
        self.prev_gg_e = 0
        self.prev_bw_idx_nf = 0
        self.prev_fac_ns = 0
        self.nb_lost = 0                       # pc_nbLostFramesInRow


def _mult(a, b):
    """mult: Q15 multiply without rounding."""
    return int(sat16((int(a) * int(b)) >> 15))


def _abs_s(v):
    v = int(v)
    return 32767 if v == -32768 else abs(v)


def _gsf16(x):
    """getScaleFactor16 (basop_util.c): headroom in [0..15], 0 if all 0."""
    x = np.asarray(x, I64)
    x_max = int(x.max(initial=0))
    x_min = int(x.min(initial=0))
    i_max = int(norm_s(x_max)) if x_max > 0 else 0x10
    i_min = int(norm_s(x_min)) if x_min < 0 else 0x10
    return min(i_max, i_min) & 0xF


def _gsf32(v):
    """getScaleFactor32 for a single Word32."""
    v = int(v)
    if v == 0:
        return 0x20 & 0x1F
    return int(norm_l(v)) & 0x1F


def _gsf16_neg(x):
    """getScaleFactor16_withNegativeScaling (pc_apply_fx.c:217-238):
    norm of max magnitude, 15 if all zero (can exceed the plain
    getScaleFactor16's 0-on-zero convention)."""
    x = np.asarray(x, I64)
    x_max = int(np.maximum(x, 0).max(initial=0))
    x_min = int(np.minimum(x, 0).min(initial=0))
    tmp = max(x_max, int(sat16(-x_min)))
    if tmp == 0:
        return 15
    return int(norm_s(tmp))


def _inv16(mantissa, exponent):
    """Inv16 (basop_util.c:236-274): (1/m, exp); table interpolation."""
    assert mantissa != 0
    m = _abs_s(max(int(mantissa), MIN32 >> 16, -32767))
    pre = int(norm_s(m))
    e = int(exponent) - pre
    m = int(shl16(m, pre))
    index = int(mac_r(-32768 - (32 << 16), m, 1 << 6))
    frac = int(shl16(m & 0x1FF, 1))
    m = int(msu_r(int(T.t("fx_InvTable")[index]),
                  int(T.t("fx_InvDiffTable")[index]), frac))
    if mantissa < 0:
        m = int(sat16(-m))
    return m, 1 - e


def _global_gain16(gg_idx, gg_off):
    """Shared gg mantissa/exp derivation (pc_apply_fx.c:105-108 =
    apply_global_gain_fx.c:24-27)."""
    tmp32 = int(sat32(((gg_idx + gg_off) * 0x797D) << 7))
    gg_e = (tmp32 >> 25) + 1
    gg = int(round_fx(inv_log2(tmp32 | -33554432)))
    return gg, gg_e


def _l_shr_sat(v, s):
    return int(L_shl(int(v), -int(s)))


def _extract_h(v):
    return int(np.asarray(v, I64)) >> 16


# ------------------------------------------------------------ classifier

def peak_detector(in_sig, yLen):
    """peakDetector_fx (pc_classify_fx.c:150-299): crossover bin of the
    dominant low-frequency peak of the previous frame's spectrum."""
    sig = np.asarray(in_sig[:yLen], I64)
    xover = 0
    s = _gsf16(sig)

    mean_block_nrg = 0
    for v in sig:
        t = int(shl16(int(v), s - 4))
        mean_block_nrg = lmac0(mean_block_nrg, t, t)
    s2 = int(norm_s(yLen))
    c = int(shl16(yLen, s2))
    # div_l(L, den): (L >> 1) / den in Word16
    mean16 = min((int(mean_block_nrg) >> 1) // c, 32767)
    mean_block_nrg = int(L_shl(mean16 * _BLOCK * _THR1, 4 + s2))

    a = [_abs_s(v) for v in sig]
    maxPeak = 0
    c_end = yLen - 2 * _BLOCK

    def block_cent(i):
        acc = 0
        for j in range(_BLOCK):
            t = int(shl16(int(sig[i + j]), s - 2))
            acc = lmac0(acc, t, t)
        return int(acc) >> 1     # L_shr exp = 2s - 5

    # i == 0 edge block (2 bins)
    if a[0] >= a[1]:
        acc = 0
        for j in range(2):
            t = int(shl16(int(sig[j]), s - 2))
            acc = lmac0(acc, t, t)
        cent = int(acc) >> 1
        if cent > mean_block_nrg:
            cur = max(a[0], a[1])
            nxt = max(a[_BLOCK - 1], a[_BLOCK], a[_BLOCK + 1])
            if cur > nxt:
                maxPeak = cent
                xover = 1

    def hyst(i, cent, maxPeak, xover):
        if cent >= maxPeak:
            return cent, i + _BLOCK - 1
        tmp32 = int(sat32((_FAC * _extract_h(maxPeak)) << 1))
        t16 = (int(maxPeak) >> 1) & 0x7FFF
        tmp32 = int(sat32(tmp32 + _mult(_FAC, t16)))
        if cent > tmp32:
            return maxPeak, i + _BLOCK - 1
        return maxPeak, xover

    for i in range(_BLOCK):
        if a[i + 1] >= a[i] and a[i + 1] >= a[i + 2]:
            cent = block_cent(i)
            if cent > mean_block_nrg:
                cur = max(a[i], a[i + 1], a[i + 2])
                prev = 0
                for j in range(i - _BLOCK, i):
                    if j > 0:
                        prev = max(prev, a[j])
                nxt = max(a[i + _BLOCK], a[i + _BLOCK + 1],
                          a[i + _BLOCK + 2])
                if cur >= prev and cur > nxt:
                    maxPeak, xover = hyst(i, cent, maxPeak, xover)

    for i in range(_BLOCK, c_end + 1):
        if a[i + 1] >= a[i] and a[i + 1] >= a[i + 2]:
            cent = block_cent(i)
            if cent > mean_block_nrg:
                cur = max(a[i], a[i + 1], a[i + 2])
                prev = max(a[i - _BLOCK], a[i - _BLOCK + 1],
                           a[i - _BLOCK + 2])
                nxt = max(a[i + _BLOCK], a[i + _BLOCK + 1],
                          a[i + _BLOCK + 2])
                if cur >= prev and cur > nxt:
                    maxPeak, xover = hyst(i, cent, maxPeak, xover)
    return xover


def pc_classify(pitch_present, frame_dms, q_old_d, q_old_res, yLen,
                spec_inv_idx, stab_fac):
    """processPCclassify_fx (pc_classify_fx.c:25-147): returns new bfi
    (2 to keep partial concealment, 1 to fall back to full-frame loss)."""
    if spec_inv_idx * 10 >= frame_dms << 2:
        return 2                       # corruption above 2 kHz: keep PC
    if stab_fac < 16384:
        return 1
    if pitch_present == 1:
        max_pitch_bin = 4 if frame_dms == 50 else 8
        xover = peak_detector(q_old_d, yLen)
        if spec_inv_idx < xover or spec_inv_idx < max_pitch_bin:
            return 1
        return 2
    s = _gsf16(q_old_res[:yLen])
    part = 0
    for i in range(spec_inv_idx):
        t = int(shl16(int(q_old_res[i]), s - 4))
        part = lmac0(part, t, t)
    full = part
    for i in range(spec_inv_idx, yLen):
        t = int(shl16(int(q_old_res[i]), s - 4))
        full = lmac0(full, t, t)
    sf = _gsf32(full)
    full16 = _extract_h(L_shl(full, sf))
    part16 = _extract_h(L_shl(part, sf))
    if part16 < _mult(full16, _FAC):
        return 1
    return 2


# ------------------------------------------------------------ apply

def pc_apply(st: PcState, yLen, q_res, q_old_d, spec_inv_idx, gg_idx,
             gg_off):
    """processPCapply_fx (pc_apply_fx.c:20-215): synthesize bins
    >= spec_inv_idx from the previous frame's residual with an energy /
    gain-ratio rescale.  Mutates q_res[spec_inv_idx:] in place and
    st.q_old_res_exp; returns (q_d Word32 [yLen], q_fx_exp, fac, fac_e)."""
    st.nb_lost += 1
    global_gain, global_gain_e = _global_gain16(gg_idx, gg_off)

    # mean_nrg_low/high over the previous frame's shaped spectrum
    s = _gsf16(q_old_d[:yLen])
    mean_nrg_low = 0
    for i in range(spec_inv_idx):
        t = int(shl16(int(q_old_d[i]), s - 4))
        mean_nrg_low = lmac0(mean_nrg_low, t, t)
    mean_nrg_high = 0
    for i in range(spec_inv_idx, yLen):
        t = int(shl16(int(q_old_d[i]), s - 4))
        mean_nrg_high = lmac0(mean_nrg_high, t, t)
    if spec_inv_idx < yLen - spec_inv_idx:
        c = div_s(spec_inv_idx, yLen - spec_inv_idx)
        mean_nrg_high = int(mpy_32_16(mean_nrg_high, c))
    else:
        c = div_s(yLen - spec_inv_idx, spec_inv_idx)
        mean_nrg_low = int(mpy_32_16(mean_nrg_low, c))

    # residual energies below the error position, prev vs current
    s = _gsf16(st.q_old_res[:spec_inv_idx])
    ener_prev = 0
    for i in range(spec_inv_idx):
        t = int(shl16(int(st.q_old_res[i]), s - 4))
        ener_prev = lmac0(ener_prev, t, t)
    s2 = _gsf16(q_res[:spec_inv_idx])
    ener_curr = 0
    for i in range(spec_inv_idx):
        t = int(shl16(int(q_res[i]), s2 - 4))
        ener_curr = lmac0(ener_curr, t, t)

    s = int(shl16(s - st.q_old_res_exp, 1))
    s2 = int(shl16(s2, 1))
    s3 = max(s, s2)
    ener_prev = _l_shr_sat(ener_prev, s3 - s2)
    ener_curr = _l_shr_sat(ener_curr, s3 - s)

    fac, fac_e = 1, 0
    if ener_prev > 0:
        sa = _gsf32(ener_prev)
        sb = _gsf32(ener_curr)
        sc = min(sa, sb)
        tmp16 = _extract_h(L_shl(ener_curr, sc))
        tmp16_2 = _extract_h(L_shl(ener_prev, sc))
        fac_e = 0
        tmp16_2, fac_e = _inv16(tmp16_2, fac_e)
        fac = _mult(tmp16, tmp16_2)
        if fac < 32767:
            fac, fac_e = sqrt16(fac, fac_e)

    fac_local, fac_local_e = fac, fac_e

    # gain-ratio fallback (the C's inverted condition, pc_apply_fx.c:180)
    prev_gg2 = _mult(st.prev_gg, st.prev_gg)
    prev_gg2_e = int(shl16(st.prev_gg_e, 1))
    ener_prev_gg2 = int(mpy_32_16(ener_prev, prev_gg2))
    gg2 = _mult(global_gain, global_gain)
    gg2_e = int(shl16(global_gain_e, 1))
    ener_curr_gg2 = int(mpy_32_16(ener_curr, gg2))
    s3 = max(prev_gg2_e, gg2_e)
    ener_prev_gg2 = _l_shr_sat(ener_prev_gg2, s3 - prev_gg2_e)
    ener_curr_gg2 = _l_shr_sat(ener_curr_gg2, s3 - gg2_e)
    if mean_nrg_low <= mean_nrg_high or ener_prev_gg2 <= ener_curr_gg2:
        se = global_gain_e
        inv_gain, se = _inv16(global_gain, se)
        fac_local = _mult(st.prev_gg, inv_gain)
        fac_local_e = se + st.prev_gg_e

    # substitute the corrupt region from the previous residual
    st.q_old_res_exp += fac_local_e
    thr = int(shl16(20480, -15 - st.q_old_res_exp))
    for i in range(spec_inv_idx, yLen):
        v = _extract_h(sat32((int(st.q_old_res[i]) * fac_local) << 1))
        if _abs_s(v) < thr:
            v = 0
        q_res[i] = v

    # scaling to 15Q16 (two exponent domains joined at spec_inv_idx)
    s = _gsf16_neg(q_res[:spec_inv_idx])
    s2 = _gsf16_neg(q_res[spec_inv_idx:yLen])
    s3 = s + st.q_old_res_exp
    if s3 > s2:
        tmp = s3 - s2
        s -= tmp
        s3 -= tmp
    q_fx_exp = 15 - s
    q_d = np.zeros(yLen, I64)
    for i in range(spec_inv_idx):
        q_d[i] = int(L_shl(int(sat32(int(q_res[i]) << 16)), s))
    for i in range(spec_inv_idx, yLen):
        q_d[i] = int(L_shl(int(sat32(int(q_res[i]) << 16)), s3))
    return q_d, q_fx_exp, fac, fac_e


# ------------------------------------------------------------ update

def pc_update(st: PcState, bfi, yLen, q_res, spec_inv_idx, gg_idx, gg_off,
              rframe, bw_idx_nf, fac_ns_idx, fac, fac_e):
    """processPCupdate_fx (pc_update_fx.c:17-90): refresh q_old_res /
    prev_gg / noise-fill memory.  Returns the (possibly overridden)
    BW_cutoff_idx_nf for the noise-filling stage."""
    st.prev_gg, st.prev_gg_e = _global_gain16(gg_idx, gg_off)

    s = _gsf16(q_res[:spec_inv_idx])
    if bfi == 0:
        st.q_old_res_exp = -s
        st.q_old_res[:yLen] = _scale_sig(np.asarray(q_res[:yLen], I64), s)
    else:
        s2 = _gsf16(q_res[spec_inv_idx:yLen])
        s3 = s + st.q_old_res_exp
        if s3 > s2:
            s -= s3 - s2
        s2 = s + st.q_old_res_exp
        st.q_old_res_exp = -s
        st.q_old_res[:spec_inv_idx] = _scale_sig(
            np.asarray(q_res[:spec_inv_idx], I64), s)
        st.q_old_res[spec_inv_idx:yLen] = _scale_sig(
            np.asarray(q_res[spec_inv_idx:yLen], I64), s2)

    if rframe == 0:
        st.prev_bw_idx_nf = bw_idx_nf
        st.prev_fac_ns = (8 - fac_ns_idx) << 11
    elif bfi == 2 and bw_idx_nf != st.prev_bw_idx_nf and spec_inv_idx < yLen:
        bw_idx_nf = st.prev_bw_idx_nf
        v = int(_shl16(_mult(st.prev_fac_ns, fac), fac_e))
        st.prev_fac_ns = min(max(v, 2048), 16384)
    return bw_idx_nf
