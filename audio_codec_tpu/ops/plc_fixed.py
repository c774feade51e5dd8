"""Integer-exact advanced PLC (fixed-point BASOP semantics).

The testvec MD5 gate decodes with a frame-erasure pattern (testvec/
plc_fer.dat), so bad frames run the advanced concealment of the fixed
decoder: classifier (plc_classify_fx.c), noise substitution + damping/
scrambling (plc_noise_substitution_fx.c, plc_damping_scrambling_fx.c),
TD-PLC (plc_tdc_main_fx.c) and Phase ECU (plc_phecu_*.c), plus the
per-frame PCM/spectrum history maintenance (plc_update_fx.c,
plc_update_aft_imdct_fx.c).  This module reproduces that arithmetic
exactly; each piece is verified per frame against the instrumented
oracle (tests/test_fixed_plc.py).
"""
from __future__ import annotations

import numpy as np

from .. import tables as T
from .fixed_dec import (I64, sat16, sat32, norm_s, norm_l, L_shl, mpy_32_16,
                        mpy_32_32, round_fx, mult_r, mac_r, L_mult, inv_log2_16)
from .fixed_ltpf import (_scale_sig, _headroom16_0, _mult_r, _add16, _shl16,
                         _lmac, _lmult, _round16, _msu_r)

MIN32, MAX32 = -(1 << 31), (1 << 31) - 1
MAX_LGW = 9
GRP_SHAPE_INIT = 0
LTOT_INIT_FLAG = -32768
LTOT_MIN_MAN = 1
UNINIT_OOLD = -32768

# defines.h:118-280: per-fs frame/pitch/prototype sizes
MAX_LEN = [80, 160, 240, 320, 480]
MAX_PITCH = [143, 285, 428, 570, 855]      # ceil(228 * fs / 12800)
LPROT = [128, 256, 384, 512, 768]          # 16 ms prototype


def max_len_pcm_plc(fs_idx):
    return MAX_PITCH[fs_idx] + MAX_LEN[fs_idx]


# ------------------------------------------------------------ basop extras

def lmac0(L, a, b):
    return int(sat32(L + int(sat32(a * b))))


def lmsu0(L, a, b):
    return int(sat32(L - int(sat32(a * b))))


def div_s(v1, v2):
    """div_s (basop32.c:1850-1905): Q15 fractional divide, v1 <= v2."""
    assert 0 <= v1 <= v2 and v2 > 0
    if v1 == v2:
        return 32767
    return (v1 << 15) // v2


def sqrt16(mantissa, exponent):
    """Sqrt16 (basop_util.c:188-210); returns (mantissa, exponent)."""
    pre = int(norm_s(mantissa))
    e = exponent - pre
    m = _shl16(mantissa, pre)
    idx = int(mac_r(-32768 - (32 << 16), m, 1 << 6))
    frac = m & 0x1FF
    if m != 0:
        m = int(mac_r(int(T.t("fx_SqrtTable")[idx]),
                      int(T.t("fx_SqrtDiffTable")[idx]), frac))
    if e & 1:
        m = _mult_r(m, 0x5A82)
    return m, int(mult_r(e, 1 << 14))


def L_deposit_h(v):
    return int(sat32(v << 16))


def isqrt32(x, x_e):
    """Isqrt (basop_util.c:788-834): 1/sqrt of Word32 mantissa."""
    if x <= 0:
        return MAX32, 0
    s = x_e & 1
    tab = T.t("fx_isqrt_table")
    idx = (x >> 23) & 0x7F
    fract = ((x & 0x7FFFFF) << 8) >> 16
    diff = int(sat32(int(tab[idx + 1]) - int(tab[idx])))
    y = int(sat32(int(tab[idx]) + int(mpy_32_16(diff, fract))))
    if s:
        y = int(mpy_32_16(y, 0x5A82))
        y = int(L_shl(y, s))
    e_out = int(mac_r(32768, x_e, -16384))
    return y, e_out


def divide3216(x, y):
    """BASOP_Util_Divide3216_Scale (basop_util.c:444-482):
    returns (quotient Word16, scale)."""
    if x == 0:
        return 0, 0
    sign = ((x >> 16) ^ y) < 0
    x = abs(max(x, MIN32 + 1))
    y = abs(max(y, -32767))
    sx = int(norm_l(x)) - 1
    x = int(L_shl(x, sx))
    sy = int(norm_s(y))
    y = _shl16(y, sy)
    s = sy - sx
    z = div_s(int(round_fx(x)), y)
    if sign:
        z = -z
    return z, s


# ------------------------------------------------------------ stability

def stab_fac_inner(scf_q, old_scf_q, prev_bfi):
    """processPLCcomputeStabFac (plc_update_aft_imdct_fx.c:190-240)."""
    if prev_bfi == 1:
        return 26214
    t = 0
    for i in range(16):
        d = int(sat16(int(scf_q[i]) - int(old_scf_q[i])))
        t = _lmac(t, d, d)
    t = int(L_shl(t, 3))
    if t > 0x7D000000:
        return 0
    if t < 0x19003E82:
        return 0x7FFF
    t = int(sat32(int(sat32(0x50000000 - int(mpy_32_16(t, 0x51EC)))) << 1))
    return int(round_fx(t))


def stab_fac_main(st, scf_q, bfi):
    """processPLCcomputeStabFac_main (plc_update_aft_imdct_fx.c:174-188)."""
    if bfi == 1:
        if st.prev_bfi != 1:
            st.stab_fac = stab_fac_inner(st.old_scf_q, st.old_old_scf_q,
                                         st.prev_prev_bfi)
    elif bfi == 2:
        st.stab_fac = stab_fac_inner(scf_q, st.old_scf_q, st.prev_bfi)


# ------------------------------------------------------------ classifier

_PITCH_MIN_2 = [40, 80, 120, 160, 240]
_REQ_HEADROOM = [0, 0, 1, 2, 2, 3, 3, 3, 3]


def _norm_corr_blocks(tot_len, n_blocks, inshift, curr, pred):
    """plc_norm_corr_blocks_fx (plc_xcorr_fx.c:33-180)."""
    L_ce = [[0] * n_blocks for _ in range(3)]
    for b in range(n_blocks):
        c = int(curr[b]) >> inshift
        p = int(pred[b]) >> inshift
        t0 = lmsu0(0, c, p)
        t1 = lmsu0(0, p, p)
        t2 = lmsu0(0, c, c)
        for m in range(b + n_blocks, tot_len, n_blocks):
            c = int(curr[m]) >> inshift
            p = int(pred[m]) >> inshift
            t0 = lmsu0(t0, c, p)
            t1 = lmsu0(t1, p, p)
            t2 = lmsu0(t2, c, c)
        L_ce[0][b], L_ce[1][b], L_ce[2][b] = t0, t1, t2
    am = _REQ_HEADROOM[n_blocks]
    t0 = sum(v >> am for v in L_ce[0])
    t1 = sum(v >> am for v in L_ce[1])
    t2 = sum(v >> am for v in L_ce[2])
    t0, t1, t2 = int(sat32(t0)), int(sat32(t1)), int(sat32(t2))
    smin = min(int(norm_l(t0)), int(norm_l(t1)), int(norm_l(t2)))
    if smin - am >= 0:
        t0 = int(sat32(sum(L_ce[0])))
        t1 = int(sat32(sum(L_ce[1])))
        t2 = int(sat32(sum(L_ce[2])))
    t1 = min(t1, -1)
    t2 = min(t2, -1)
    t0 = -max(t0, MIN32 + 1)
    s0, s1, s2 = int(norm_l(t0)), int(norm_l(t1)), int(norm_l(t2))
    p = int(mpy_32_32(t1 << s1, t2 << s2))
    sh = int(norm_l(p))
    p <<= sh
    prod_exp = 62 - (s1 + s2 + sh)
    L_inv, prod_exp = isqrt32(p, prod_exp)
    t0 = int(sat32(t0 << s0))
    p = int(mpy_32_32(t0, L_inv))
    prod_exp = (31 - s0) + prod_exp
    nc = 32767 if t0 >= 0 else -32768
    if p == 0 or int(norm_l(p)) >= prod_exp:
        nc = int(round_fx(L_shl(p, prod_exp)))
    return nc


def plc_xcorr(x_old_tot, fs_idx, pitch_int):
    """plc_xcorr_lc_fx (plc_xcorr_fx.c:183-250)."""
    if pitch_int <= 0:
        return 0
    mlen = len(x_old_tot)
    pcm_max = mlen - pitch_int
    max_corr = min(int(T.t("fx_rectLengthTab")[fs_idx]), pcm_max)
    clen = max(min(max_corr, pitch_int), _PITCH_MIN_2[fs_idx])
    r1 = mlen - clen
    r2 = r1 - pitch_int
    inshift = 2
    n_blocks = (clen + 31) >> 5
    if n_blocks > 8:
        inshift = 3
        n_blocks = (clen + 127) >> 7
    nc = _norm_corr_blocks(clen, n_blocks, inshift,
                           x_old_tot[r1:], x_old_tot[r2:])
    return max(0, nc)


def spectral_centroid(old_scf_q, band_offsets, bands_number, frame_length,
                      fs_idx):
    """spectral_centroid_fx_lc (plc_classify_fx.c:96-210)."""
    _FS = ["8000", "16000", "24000", "32000", "48000"]
    warp_m = T.t(f"fx_lpc_warp_dee_emphasis_16_{_FS[fs_idx]}")
    warp_e = T.t(f"fx_lpc_warp_dee_emphasis_16_e_{_FS[fs_idx]}")
    mod = []
    mod_e = []
    for i in range(16):
        m, e = inv_log2_16(np.asarray([old_scf_q[i]], I64))
        m, e = int(m[0]), int(e[0])
        m = (m * int(warp_m[i])) >> 15            # mult: no rounding
        mod.append(int(sat16(m)))
        mod_e.append(e + int(warp_e[i]))
    bol = [0] * 65
    bo = [int(v) for v in band_offsets]
    if bands_number == 64:
        bol = bo[: 65]
    elif bands_number < 32:
        s = 32 - bands_number
        for i in range(bands_number - 1, s - 1, -1):
            bol[(i + s) * 2 + 2] = bo[i + 1]
            bol[(i + s) * 2 + 1] = bo[i + 1]
        for i in range(s - 1, -1, -1):
            bol[i * 4 + 4] = bo[i + 1]
            bol[i * 4 + 3] = bo[i + 1]
            bol[i * 4 + 2] = bo[i + 1]
            bol[i * 4 + 1] = bo[i + 1]
    elif bands_number < 64:
        s = 64 - bands_number
        for i in range(bands_number - 1, s - 1, -1):
            bol[i + s + 1] = bo[i + 1]
        for i in range(s - 1, -1, -1):
            bol[i * 2 + 2] = bo[i + 1]
            bol[i * 2 + 1] = bo[i + 1]
    den, num = 1, 0
    inv = div_s(1, frame_length)
    for i in range(16):
        freq = 0
        start = bol[i * 4] + 1
        stop = bol[i * 4 + 4]
        for j in range(start, stop + 1):
            freq = int(sat16(freq + j))
        t = _lmult(inv, freq)
        s = int(norm_l(t))
        th = int(L_shl(t, s)) >> 16               # extract_h
        t = _lmult(mod[i], th)
        num = int(sat32(num + int(L_shl(t, -15 + mod_e[i] + 15 - s))))
        den = int(sat32(den + int(L_shl(_lmult(mod[i], stop - start + 1),
                                        mod_e[i]))))
    s = 16 - int(norm_l(den))
    sc = div_s(_extract_l(num >> s), _extract_l(den >> s))
    fac = [5461, 10922, 16384, 21845, 32767][fs_idx]
    return int(round_fx(_lmult(sc, fac)))


def _extract_l(v):
    v &= 0xFFFF
    return v - 0x10000 if v >= 0x8000 else v


def classify(st, plc_meth, bfi, ltpf_mem_pitch_int, frame_length, frame_dms,
             fs_idx, band_offsets, bands_number):
    """processPLCclassify_fx (plc_classify_fx.c:25-95).  Updates
    st.conceal_method / st.nb_lost / st.norm_corr."""
    st.norm_corr = 0
    if bfi != 1:
        return
    st.nb_lost += 1
    if st.nb_lost != 1:
        return
    st.conceal_method = plc_meth
    if plc_meth != 1:
        return
    if ltpf_mem_pitch_int > 0:
        st.conceal_method = 3
        st.norm_corr = plc_xcorr(st.x_old_tot, fs_idx, ltpf_mem_pitch_int)
        sc = spectral_centroid(st.old_scf_q, band_offsets, bands_number,
                               frame_length, fs_idx)
        cls = _lmult(st.norm_corr, 7640)
        cls = _lmac(cls, sc, -32768)
        cls = int(sat32(cls + -335020208))
        if cls <= 0:
            st.conceal_method = 2 if frame_dms == 100 else 4
    else:
        st.conceal_method = 4


# ------------------------------------------------------------ updates

def update_spec(st, q_d, q_fx_exp, yLen):
    """processPLCupdateSpec_fx (plc_update_fx.c:47-66)."""
    q_d = np.asarray(q_d, I64)
    nz = q_d != 0
    s = 0 if not nz.any() else int(
        np.where(nz, norm_l(np.where(nz, q_d, 1)), 32).min()) & 0x1F
    st.q_old_exp = q_fx_exp - s
    v = sat32(np.where(np.abs(q_d) >> np.maximum(31 - s, 0) > 0,
                       np.where(q_d >= 0, MAX32, MIN32), q_d << s))
    st.q_old_d = sat16((sat32(v + 0x8000)) >> 16)


def spec2shape(st, prev_bfi, bfi, yLen):
    """processPLCspec2shape_fx (plc_update_fx.c:68-170)."""
    if bfi == 1:
        return
    fs_idx = (yLen * 331) >> 15
    n_grp = int(T.t("fx_xavg_N_grp_fx")[fs_idx])
    hr = int(T.t("fx_spec_shape_headroom")[fs_idx])
    grp_bins = T.t("fx_mdct_grp_bins_fx")
    local_prev = 0 if prev_bfi == 2 else prev_bfi
    if st.oold_grp_shape[0] < 0:
        local_prev = 1
    st.oold_grp_shape = list(st.old_grp_shape)
    p = 0
    L_tot = 0
    for _ in range(4):
        t = int(st.q_old_d[p]) >> hr
        L_tot = lmsu0(L_tot, t, t)
        p += 1
    grp = [0] * MAX_LGW
    for i in range(n_grp - 1):
        acc = 0
        for _ in range(int(grp_bins[i + 1]) - int(grp_bins[i])):
            t = int(st.q_old_d[p]) >> hr
            acc = lmsu0(acc, t, t)
            p += 1
        grp[i] = int(sat32(-acc))
        L_tot = int(sat32(L_tot + acc))
    acc = 0
    for _ in range(int(grp_bins[n_grp]) - int(grp_bins[n_grp - 1]) - 4):
        t = int(st.q_old_d[p]) >> hr
        acc = lmsu0(acc, t, t)
        p += 1
    grp[n_grp - 1] = int(sat32(-acc))
    L_tot = int(sat32(L_tot + acc))
    L_tot = max(-MAX32, L_tot)
    L_tot = -L_tot
    out = [GRP_SHAPE_INIT] * MAX_LGW
    if L_tot > 0:
        for i in range(n_grp):
            man, expo = plc_phecu_ratio(grp[i], L_tot)
            sh = expo - 1
            out[i] = man >> sh if sh >= 0 else _shl16(man, -sh)
    st.old_grp_shape = out
    if local_prev == 1:
        st.oold_grp_shape = list(out)


def plc_phecu_ratio(numer, denom):
    """plc_phEcu_ratio_fx (plc_phecu_tools_fx.c:117-145)."""
    ed = int(norm_l(denom))
    md = _extract_l((int(L_shl(denom, ed)) >> 16))
    en = int(norm_l(numer))
    mn = _extract_l((int(L_shl(numer, en)) >> 16)) >> 1
    q = div_s(mn, md)
    return q, en - ed


def update_after_imdct(st, x_fx, q_fx_exp, conceal_method, xLen, fs_idx,
                       bfi, scf_q):
    """processPLCUpdateAfterIMDCT_fx (plc_update_aft_imdct_fx.c:21-170)."""
    mlen = st.max_len_pcm
    used = mlen
    if bfi == 1 and conceal_method == 2:
        used -= LPROT[fs_idx] - min(400, xLen)
    old_len = used - xLen
    st.x_old_tot[mlen - used: mlen - xLen] = \
        st.x_old_tot[mlen - used + xLen: mlen]
    st.x_old_tot[mlen - xLen:] = x_fx[:xLen]
    front = LPROT[fs_idx] - xLen
    past = old_len - front
    m_old_past = _headroom16_0(st.x_old_tot[mlen - used: mlen - used + past])
    m_old_front = _headroom16_0(
        st.x_old_tot[mlen - used + past: mlen - used + past + front])
    scale_fac_old = min(m_old_front, m_old_past)
    front_len = 0
    if bfi == 1 and st.prev_bfi == 0 and conceal_method == 2:
        front_len = int(T.t("fx_hamm_len2Tab")[fs_idx])
        front_len = front_len + (front_len >> 2)
        past_len = xLen - front_len
        scale_fac_new = _headroom16_0(x_fx[:past_len])
        m_new = _headroom16_0(x_fx[past_len: past_len + front_len])
        scale_fac_new = min(scale_fac_new, m_new)
    else:
        m_new = _headroom16_0(x_fx[:xLen])
        scale_fac_new = m_new
    q_theo_old = max(st.q_fx_old_exp - scale_fac_old, 0)
    q_theo_new = max(q_fx_exp - scale_fac_new, 0)
    q_new = max(q_theo_old, q_theo_new)
    shift_old = st.q_fx_old_exp - q_new
    shift_new = q_fx_exp - q_new
    if shift_old != 0:
        st.x_old_tot[mlen - used: mlen - xLen] = _scale_sig(
            st.x_old_tot[mlen - used: mlen - xLen], shift_old)
        if bfi == 1 and conceal_method == 3:
            st.harmonic_q -= shift_old
            st.tdc_gain_c = int(L_shl(st.tdc_gain_c, shift_old))
        m_old_front = min(16, m_old_front - shift_old)
    if shift_new:
        st.x_old_tot[mlen - xLen:] = _scale_sig(
            st.x_old_tot[mlen - xLen:], shift_new)
        m_new = min(16, m_new - shift_new)
    st.q_fx_old_exp = q_fx_exp - shift_new
    st.margin_xfp = min(m_new, m_old_front)
    if front_len != 0:
        st.margin_xfp = m_new
    if st.margin_xfp == 16:
        st.margin_xfp = 1
    if bfi != 1:
        st.nb_lost = 0
        st.ns_cum_alpha = 32767
        st.old_old_scf_q = list(st.old_scf_q)
        st.old_scf_q = [int(v) for v in scf_q]
        st.short_flag_prev = 0
    st.prev_prev_bfi = st.prev_bfi
    st.prev_bfi = bfi
    # PhECU xfp exponent rides the pcm history exponent
    st.xfp_exp = st.q_fx_old_exp


# -------------------------------------------- NS + damping / scrambling

def noise_substitution(st, yLen):
    """processPLCNoiseSubstitution_fx: prev spectrum -> Word32, HP."""
    spec = np.asarray(st.q_old_d[:yLen], I64) << 16
    spec[0] = int(mpy_32_16(spec[0], 6553))
    spec[1] = int(mpy_32_16(spec[1], 16384))
    return spec


PLC_FADEOUT_IN_MS = 60
PLC34_ATTEN_FAC_100 = 0x4000


def damping_scrambling(st, spec, L_spec, nb_lost, stab_fac, damp_scramb,
                       pitch_present, frame_dms, seed_attr, spec_inv_idx):
    """processPLCDampingScrambling_fx (plc_damping_scrambling_fx.c:53-310).
    Mutates spec in place; returns updated seed."""
    if nb_lost == 1:
        st.cum_fading_slow = 32767
        st.cum_fading_fast = 32767
        st.cum_fflc = 32767
    t = (6554 * stab_fac) >> 15
    slow = int(sat16(26214 + t))
    fast = int(sat16(9830 + t))
    x_lost = nb_lost
    if frame_dms == 25:
        nb_lost = (nb_lost + 3) >> 2
    elif frame_dms == 50:
        nb_lost = (nb_lost + 1) >> 1
    reps = {25: 2, 50: 1, 100: 0}[frame_dms]
    for _ in range(reps):
        if slow < 32767:
            m, e = sqrt16(slow, 0)
            slow = _shl16(m, e)
        if fast < 32767:
            m, e = sqrt16(fast, 0)
            fast = _shl16(m, e)
    st.cum_fading_slow = _mult_r(st.cum_fading_slow, slow)
    st.cum_fading_fast = _mult_r(st.cum_fading_fast, fast)
    if not damp_scramb:
        return
    fflc = 32767
    slow_l = st.cum_fading_slow
    fast_l = st.cum_fading_fast
    if spec_inv_idx == 0:
        if nb_lost > PLC_FADEOUT_IN_MS // 10:
            st.cum_fflc = 0
            fflc = 0
        elif nb_lost > 2:
            fflc = PLC34_ATTEN_FAC_100
            for _ in range(reps):
                if fflc < 32767:
                    m, e = sqrt16(fflc, 0)
                    fflc = _shl16(m, e)
        if fflc < 32767:
            st.cum_fflc = _mult_r(st.cum_fflc, fflc)
            slow_l = _mult_r(st.cum_fading_slow, st.cum_fflc)
            fast_l = _mult_r(st.cum_fading_fast, st.cum_fflc)
    if frame_dms == 25:
        plc_start, plc_end = 200 // 25, 600 // 25
    elif frame_dms == 50:
        plc_start, plc_end = 20 // 5, 60 // 5
    else:
        plc_start, plc_end = 2, 6
    if pitch_present == 0:
        plc_start = 1
    dur = plc_end - plc_start
    if x_lost <= plc_start:
        lin = 32767
    elif x_lost >= plc_end:
        lin = 0
    else:
        lin = div_s(plc_end - x_lost, dur)
    rand_thr = (-32768 * lin) >> 15            # mult (no rounding)
    seed = getattr(st, seed_attr)
    for i in range(spec_inv_idx, L_spec):
        seed = _extract_l(lmac0(16831, seed, 12821))
        if seed < 0:
            if pitch_present == 0 or seed < rand_thr:
                spec[i] = int(sat32(-int(spec[i])))
    setattr(st, seed_attr, seed)
    t = (18022 * lin) >> 15
    ad_fac = int(sat16((t >> 1) + 1228))
    seg = np.asarray(spec[spec_inv_idx:L_spec], I64)
    nz = seg != 0
    s = 0 if not nz.any() else int(
        np.where(nz, norm_l(np.where(nz, seg, 1)), 32).min()) & 0x1F
    fe = 0
    for i in range(spec_inv_idx, L_spec):
        t16 = int(L_shl(int(spec[i]), s - 4)) >> 16
        fe = lmac0(fe, t16, t16)
    mean16, s2 = divide3216(fe, L_spec - spec_inv_idx)
    thr = (ad_fac * mean16) >> 15
    thr = int(sat16(thr)) if abs(thr) < 32768 else int(sat16(thr))
    s3 = (29 - ((s - 16) << 1)) + s2
    if thr < 32767:
        thr, s3 = sqrt16(thr, s3)
    s3 -= 15
    mean_nrg = int(L_shl(thr, s3))
    fac = (int(sat16(slow_l - fast_l)) * thr) >> 15
    fac = int(L_shl(int(sat16(fac)), s3))
    for i in range(spec_inv_idx, L_spec):
        v = int(spec[i])
        if abs(v) < mean_nrg:
            spec[i] = int(mpy_32_16(v, slow_l))
        elif v > 0:
            spec[i] = int(sat32(int(mpy_32_16(v, fast_l)) + fac))
        elif v == 0:
            spec[i] = int(mpy_32_16(v, fast_l))
        else:
            spec[i] = int(sat32(int(mpy_32_16(v, fast_l)) - fac))


class PlcState:
    """Advanced-PLC per-stream state (AplcSetup + DecSetup PLC fields)."""

    def __init__(self, fs_idx):
        self.fs_idx = fs_idx
        self.max_len_pcm = max_len_pcm_plc(fs_idx)
        self.x_old_tot = np.zeros(self.max_len_pcm, I64)
        self.q_old_d = np.zeros(400, I64)
        self.q_old_exp = 0
        self.q_fx_old_exp = 0
        self.old_scf_q = [0] * 16
        self.old_old_scf_q = [0] * 16
        self.stab_fac = 32767  # setup_dec: plcAd->stab_fac init? see test
        self.prev_bfi = 0
        self.prev_prev_bfi = 0
        self.nb_lost = 0
        self.conceal_method = 0
        self.norm_corr = 0
        self.ns_cum_alpha = 32767
        self.ns_seed = 24607
        self.pc_seed = 24607
        # zero-initialized channel memory (calloc in lc3_dec init); the
        # C only sets these at the first loss of a burst
        self.cum_fading_slow = 0
        self.cum_fading_fast = 0
        self.cum_fflc = 0
        self.damping = 32767
        # TDC
        self.tdc_seed = 24607
        self.tdc_fract = 0
        self.tdc_gain_c = 0
        self.tdc_A = [0] * 17
        self.harmonic_buf = np.zeros(MAX_PITCH[fs_idx], I64)
        self.harmonic_q = 0
        self.synth_hist = np.zeros(16, I64)
        # PhECU
        self.margin_xfp = 0
        self.xfp_exp = 0
        self.short_flag_prev = 0
        self.old_grp_shape = [GRP_SHAPE_INIT] * MAX_LGW
        self.oold_grp_shape = [GRP_SHAPE_INIT] * MAX_LGW
