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
        # PhECU state (setup_dec_lc3.c:136-184)
        self.time_offs = 0
        self.X_sav = [0] * LPROT[fs_idx]
        self.X_savQ = 0
        self.plocs = []
        self.f0est = []
        self.Xavg = [0] * MAX_LGW
        self.mag_chg_1st = [32767] * MAX_LGW
        self.beta_mute = 16384
        self.L_oold_wE = LTOT_MIN_MAN
        self.L_old_wE = LTOT_MIN_MAN
        self.oold_wE_exp = UNINIT_OOLD
        self.old_wE_exp = LTOT_INIT_FLAG
        self.oold_Ltot_exp = UNINIT_OOLD
        self.old_Ltot_exp = LTOT_INIT_FLAG
        self.f0hz_ltp_bin = 0
        self.max_plocs = LPROT[fs_idx] // 4 + 1
        N = MAX_LEN[fs_idx]
        self.t_adv = (N + LPROT[fs_idx] + (N >> 2)) >> 1   # PHECU_XFP_LA=0


# ================================================================ TD-PLC
#
# Concealment method 3 (plc_tdc_main_fx.c + LPC analysis chain + TDAC).

TDC_L_FIR_HP = 11
PLC3_HPBLENDTHROTTLE = 30
PLC34_ATTEN = {25: 0x6BA3, 50: 0x5A83, 100: 0x4000}


def _lmac_sat(L, a, b):
    return _lmac(L, a, b)


def lmac0_sat(L, a, b):
    return lmac0(L, a, b)


def divide1616(x, y):
    """BASOP_Util_Divide1616_Scale (basop_util.c:484-534)."""
    sign = 0
    if x < 0:
        x = -x
        sign ^= 1
    if y < 0:
        y = -y
        sign ^= 1
    if x == 0:
        return 0, 0
    sx = int(norm_s(x))
    x = _shl16(x, sx) >> 1
    s = 1 - sx
    sy = int(norm_s(y))
    y = _shl16(y, sy)
    s += sy
    z = div_s(x, y)
    return (-z if sign else z), s


def per_band_energy(d_fx, d_fx_exp, band_offsets, fs_idx, n_bands,
                    frame_dms=100):
    """processPerBandEnergy_fx, linear mode (per_band_energy_fx.c:17-230).
    d_fx: Word32 spectrum list; returns (d2[n_bands], d2_exp)."""
    max_bw = 400 >> {25: 2, 50: 1, 100: 0}[frame_dms]
    one_max = int(T.t("fx_bands_offset_with_one_max_lin")[fs_idx])
    two_max = int(T.t("fx_bands_offset_with_two_max_lin")[fs_idx])
    nrg_scale = T.t("fx_bands_nrg_scale")
    inv_int = T.t("fx_InvIntTable")
    bo = [int(v) for v in band_offsets]
    d2 = [0] * n_bands
    d2e = [0] * n_bands
    band = 0
    while band < one_max:
        v = int(d_fx[band])
        s2 = 15
        if v != 0:
            s2 = min(s2, int(norm_l(v)))
        t16 = int(sat32(v << s2)) >> 16
        d2[band] = int(sat32(t16 * t16))
        d2e[band] = 1 - (s2 << 1)
        band += 1
    i = one_max
    while band < two_max:
        if i + 1 >= max_bw:
            if i >= max_bw:
                d2[band] = 0
                d2e[band] = 1 - 30
            else:
                v = int(d_fx[band])
                s2 = 15
                if v != 0:
                    s2 = min(s2, int(norm_l(v)))
                t16 = int(sat32(v << s2)) >> 16
                d2[band] = int(sat32(t16 * t16))
                d2e[band] = 1 - (s2 << 1)
        else:
            va, vb = int(d_fx[i]), int(d_fx[i + 1])
            s2 = 15
            if va != 0:
                s2 = min(s2, int(norm_l(va)))
            if vb != 0:
                s2 = min(s2, int(norm_l(vb)))
            ta = int(sat32(va << s2)) >> 16
            nrg = min(int(sat32(ta * ta)), 0x3FFFFFFF)
            tb = int(sat32(vb << s2)) >> 16
            d2[band] = lmac0(nrg, tb, tb) >> 1
            d2e[band] = 1 - (s2 << 1)
        i += 2
        band += 1
    while band < n_bands:
        k = i
        s1 = 15
        stop = min(bo[band + 1], max_bw)
        while k < stop:
            v = int(d_fx[k])
            if v != 0:
                s1 = min(s1, int(norm_l(v)))
            k += 1
        nb = min(max(0, bo[band + 1] - bo[band]), 31)
        s2 = s1 - int(nrg_scale[nb])
        nrg = 0
        while i < stop:
            t16 = int(L_shl(int(d_fx[i]), s2)) >> 16
            nrg = lmac0(nrg, t16, t16)
            i += 1
        i = bo[band + 1]
        nrg = int(mpy_32_16(nrg, int(inv_int[nb])))
        s = int(norm_l(nrg))
        d2[band] = int(sat32(nrg << s))
        d2e[band] = 1 - ((s2 << 1) + s)
        band += 1
    smax = max([-31] + d2e[:n_bands])
    for band in range(n_bands):
        d2[band] = d2[band] >> min(smax - d2e[band], 31)
    return d2, (d_fx_exp << 1) + smax


def pre_emphasis(d2, d2_exp, fs_idx, n_bands):
    """processPreEmphasis_fx (plc_tdc_pre_emphasis_fx.c:17-92)."""
    _FS = ["8000", "16000", "24000", "32000", "48000"]
    pe = T.t(f"fx_lpc_lin_pre_emphasis_80_{_FS[fs_idx]}")
    pee = T.t(f"fx_lpc_lin_pre_emphasis_80_e_{_FS[fs_idx]}")
    de = [0] * n_bands
    smax = -31
    for band in range(n_bands):
        nrg = int(mpy_32_16(int(d2[band]), int(pe[band])))
        s = 31 if nrg == 0 else int(norm_l(nrg))
        d2[band] = int(sat32(nrg << s))
        de[band] = int(pee[band]) - s
        smax = max(smax, de[band])
    for band in range(n_bands):
        d2[band] = d2[band] >> min(smax - de[band], 31)
    return d2, d2_exp + smax


def _rfftN(x, n, scale):
    """BASOP_rfftN (fft.c:3832-3893) for n in {40, 80}; x: list of ints."""
    from . import fixed_imdct as fi
    tw = T.t(f"fx_RealFFT{n}_twid")
    n2, n4, n8 = n >> 1, n >> 2, n >> 3
    pairs = [(x[2 * j], x[2 * j + 1]) for j in range(n2)]
    pairs, sc = fi.cfft(pairs, n2)
    for j in range(n2):
        x[2 * j], x[2 * j + 1] = int(pairs[j][0]), int(pairs[j][1])
    scale += sc
    xb0, xb1 = x[0] >> 1, x[1] >> 1
    x[0] = int(sat32(xb0 + xb1))
    x[1] = int(sat32(xb0 - xb1))

    def twiddle1(i, w1, w2):
        xb0, xb1 = x[2 * i] >> 2, x[2 * i + 1] >> 2
        xt0, xt1 = x[n - 2 * i] >> 2, x[n - 2 * i + 1] >> 2
        t1 = int(sat32(xb0 - xt0))
        t2 = int(sat32(xb1 + xt1))
        t3 = int(sat32(int(mpy_32_32(t1, w1)) - int(mpy_32_32(t2, w2))))
        t4 = int(sat32(int(mpy_32_32(t1, w2)) + int(mpy_32_32(t2, w1))))
        t1 = int(sat32(xb0 + xt0))
        t2 = int(sat32(xb1 - xt1))
        return t1, t2, t3, t4

    for i in range(1, n8):
        t1, t2, t3, t4 = twiddle1(i, int(tw[2 * i + 1]), int(tw[2 * i]))
        x[2 * i] = int(sat32(t1 - t3))
        x[2 * i + 1] = int(sat32(t2 - t4))
        x[n - 2 * i] = int(sat32(t1 + t3))
        x[n - 2 * i + 1] = int(sat32(-int(sat32(t2 + t4))))
    for i in range(n8, n4):
        t1, t2, t3, t4 = twiddle1(i, int(tw[2 * n4 - 2 * i]),
                                  int(tw[2 * n4 - 2 * i + 1]))
        x[2 * i] = int(sat32(t1 - t3))
        x[2 * i + 1] = int(sat32(t2 - t4))
        x[n - 2 * i] = int(sat32(t1 + t3))
        x[n - 2 * i + 1] = int(sat32(-int(sat32(t2 + t4))))
    i = n4
    x[n - 2 * i] = x[2 * i] >> 1
    x[n - 2 * i + 1] = int(sat32(-(x[2 * i + 1] >> 1)))
    return x, scale + 1


def inverse_odft(d2, d2_exp, n_bands, lpc_order):
    """processInverseODFT_fx (plc_tdc_inverse_odft_fx.c:17-133)."""
    from . import fixed_imdct as fi
    n2 = n_bands >> 1
    if n_bands in (20, 60):
        x = [0] * (2 * n_bands)
        for i in range(n2):
            x[2 * i] = int(d2[2 * i])
            x[2 * i + 1] = 0
            x[n_bands + 2 * i] = int(d2[n_bands - 1 - 2 * i])
            x[n_bands + 2 * i + 1] = 0
        pairs = [(x[2 * j], x[2 * j + 1]) for j in range(n_bands)]
        pairs, sc = fi.cfft(pairs, n_bands)
        for j in range(n_bands):
            x[2 * j], x[2 * j + 1] = int(pairs[j][0]), int(pairs[j][1])
        d2_exp += sc
    else:
        x = [0] * n_bands
        for i in range(n2):
            x[i] = int(d2[2 * i])
            x[n2 + i] = int(d2[n_bands - 1 - 2 * i])
        x, d2_exp = _rfftN(x, n_bands, d2_exp)
    tw_re = T.t(f"fx_inv_odft_twiddle_{min(n_bands, 80)}_re")
    tw_im = T.t(f"fx_inv_odft_twiddle_{min(n_bands, 80)}_im")
    r = [0] * (lpc_order + 1)
    s = int(norm_l(x[0])) if x[0] != 0 else 31
    r[0] = int(sat32(x[0] << s))
    r[0] = int(mpy_32_32(r[0], 0x4001A36E))
    if int(norm_l(r[0])) > 0 and r[0] != 0:
        r[0] = int(sat32(r[0] << 1))
    else:
        s -= 1
    for i in range(1, lpc_order + 1):
        r[i] = int(sat32(int(mpy_32_32(int(L_shl(x[2 * i], s)),
                                       int(tw_re[i - 1])))
                         + int(mpy_32_32(int(L_shl(x[2 * i + 1], s)),
                                         int(tw_im[i - 1])))))
    r_exp = d2_exp - s
    if r[0] == 0:
        r = [MAX32] + [0] * lpc_order
        r_exp = 0
    return r, r_exp


def lagwin(r, fs_idx, m):
    """processLagwin_fx."""
    _FS = ["8k", "16k", "24k", "32k", "48k"]
    w = T.t(f"fx_lag_win_{_FS[fs_idx]}")
    for i in range(m):
        r[i + 1] = int(mpy_32_32(r[i + 1], int(w[i])))
    return r


def levinson(ac, N):
    """processLevinson_fx (levinson_fx.c:14-120) -> lpc Word32[N+1]."""
    lpc = [0] * (N + 1)
    err = int(ac[0])
    shift = 0
    lpc[0] = 0x8000000
    if ac[0] != 0:
        inv = div_s(16383, _extract_h(ac[0]))
        rc32 = int(L_shl(int(mpy_32_32(
            abs(int(ac[1])),
            int(mpy_32_16(int(sat32(MAX32 - int(mpy_32_16(int(ac[0]), inv)))),
                          inv)))), 2))
    else:
        rc32 = 0
    if int(ac[1]) > 0:
        rc32 = int(sat32(-rc32))
    lpc[1] = rc32 >> 4
    for n in range(2, N + 1):
        err = int(mpy_32_32(err, int(sat32(MAX32 - int(mpy_32_32(rc32, rc32))))))
        s = int(norm_l(err)) if err != 0 else 31
        err = int(sat32(err << s))
        shift += s
        ssum = int(mpy_32_32(int(ac[1]), lpc[n - 1]))
        for m_ in range(2, n):
            ssum = int(sat32(ssum + int(mpy_32_32(int(ac[m_]), lpc[n - m_]))))
        ssum = int(sat32(int(sat32(ssum << 4)) + int(ac[n])))
        if err != 0:
            inv = div_s(16383, _extract_h(err))
            rc32 = int(L_shl(int(mpy_32_32(
                abs(ssum),
                int(mpy_32_16(int(sat32(MAX32 - int(mpy_32_16(err, inv)))),
                              inv)))), 2))
        else:
            rc32 = 0
        if ssum > 0:
            rc32 = int(sat32(-rc32))
        rc32 = int(L_shl(rc32, shift))
        tmp = [0] * (N + 1)
        for m_ in range(1, n):
            tmp[m_] = int(sat32(lpc[m_] + int(mpy_32_32(rc32, lpc[n - m_]))))
        lpc[1:n] = tmp[1:n]
        lpc[n] = rc32 >> 4
    return lpc


def _extract_h(v):
    return _extract_l(int(v) >> 16)


def lpc_scaling(lpc32, m):
    """processPLCLpcScaling_fx: Word32 -> Word16 with common scale."""
    arr = np.asarray(lpc32[:m], I64)
    nz = arr != 0
    s = 0 if not nz.any() else int(
        np.where(nz, norm_l(np.where(nz, arr, 1)), 32).min()) & 0x1F
    out = []
    for v in lpc32[:m]:
        out.append(int(round_fx(L_shl(int(v), s))))
    return out


def tdc_lpc_analysis(st, cfg):
    """First-loss LPC analysis (plc_apply_fx.c case 3, nbLost==1)."""
    yLen = cfg.yLen
    n_bands = min(cfg.frame_length, 80)
    _FS = ["8000", "16000", "24000", "32000", "48000"]
    bo = T.t(f"bands_offset_{_FS[cfg.fs_idx]}_lpc_lin")
    spec32 = [int(v) << 16 for v in st.q_old_d[:yLen]]
    d2, d2e = per_band_energy(spec32, st.q_old_exp, bo, cfg.fs_idx, n_bands,
                              cfg.frame_dms)
    d2, d2e = pre_emphasis(d2, d2e, cfg.fs_idx, n_bands)
    r, re_ = inverse_odft(d2, d2e, n_bands, 16)
    r = lagwin(r, cfg.fs_idx, 16)
    lpc32 = levinson(r, 16)
    st.tdc_A = lpc_scaling(lpc32, 17)


def _tdc_dot16(x, xoff, y, lg):
    s = _lmult(int(x[xoff]), int(y[0]))
    for i in range(1, lg - 1):
        s = _lmac(s, int(x[xoff + i]), int(y[i]))
    return _round16(_lmac(s, int(x[xoff + lg - 1]), int(y[lg - 1])))


def _tdc_ldot(x, xoff, y, lg):
    s = lmac0(1, int(x[xoff]), int(y[0]))
    for i in range(1, lg):
        s = lmac0(s, int(x[xoff + i]), int(y[i]))
    return s


def _tdc_calc_gainp(x, xo, y, yo, lg):
    """TDC_calcGainp (plc_tdc_main_fx.c:712-800)."""
    t1 = t2 = 0
    for i in range(0, lg, 2):
        t1 = lmac0(t1, int(x[xo + i]), int(y[yo + i]))
        t2 = lmac0(t2, int(x[xo + i + 1]), int(y[yo + i + 1]))
    tcorr = int(sat32((t1 >> 1) + (t2 >> 1)))
    qc = int(norm_l(tcorr)) if tcorr != 0 else 31
    tcorr = int(L_shl(tcorr, qc))
    qc = 2 - qc
    t1 = t2 = 0
    for i in range(0, lg, 2):
        t1 = lmac0(t1, int(y[yo + i]), int(y[yo + i]))
        t2 = lmac0(t2, int(y[yo + i + 1]), int(y[yo + i + 1]))
    tener = int(sat32((t1 >> 1) + (t2 >> 1)))
    qe = int(norm_l(tener)) if tener != 0 else 31
    tener = int(L_shl(tener, qe))
    qe = 2 - qe
    tener = max(tener, 1)
    negative = tcorr <= 0
    tcorr = abs(max(tcorr, MIN32 + 1))
    m_corr = _extract_h(tcorr)
    m_ener = _extract_h(tener)
    if m_corr > m_ener:
        m_corr >>= 1
        qc += 1
    if m_ener == 0:
        m_corr = 0x7FFF
    else:
        m_corr = div_s(m_corr, m_ener)
    qc -= qe
    gain = int(L_shl(m_corr, qc + 1))
    return int(sat32(-gain)) if negative else gain


def _tdc_calc_gainc(exc, eoff, q_exc, pitch, lg, frame_dms, gainp):
    """TDC_calcGainc (plc_tdc_main_fx.c:646-710) -> 15Q16."""
    L = 0
    for i in range(lg):
        t16 = int(sat16(int(exc[eoff + i - lg])
                        - _mult_r(gainp, int(exc[eoff + i - lg - pitch]))))
        L = lmac0(L, t16, t16)
    if frame_dms < 100:
        Lm = 0
        for i in range(lg):
            Lm = lmac0(Lm, int(exc[eoff + i - lg]), int(exc[eoff + i - lg]))
        L = min(L, Lm)
    te = int(norm_l(L)) if L != 0 else 31
    L = int(L_shl(L, te))
    te = (31 - (q_exc << 1)) - te
    t16, t2e = divide3216(L, lg)
    te = (t2e + te) - 15
    if t16 != 0:
        t16, te = sqrt16(t16, te)
        te = min(te, 15)
        return int(L_shl(t16, te + 1))
    return 0


def _tdc_preemph(x, off, fac, lg):
    """TDC_preemph (plc_tdc_main_fx.c:955-1000): in-place on x[off:off+lg],
    reads x[off-1].  Returns Q."""
    fac_sh = fac >> 3
    max_val = 0
    for i in range(lg - 1, -1, -1):
        v = int(sat32(_lmult(int(x[off + i]), 4096)
                      - _lmult(int(x[off + i - 1]), fac_sh)))
        max_val = max(abs(v), max_val)
    q_out = 12
    if _extract_h(max_val) != 0:
        q_out = min(max(int(norm_s(_extract_h(max_val))) - 3, 0), 12)
    for i in range(lg - 1, -1, -1):
        v = int(sat32(_lmult(int(x[off + i]), 4096)
                      - _lmult(int(x[off + i - 1]), fac_sh)))
        x[off + i] = _round16(int(L_shl(v, q_out)))
    return q_out - 2


def _tdc_residu(a, x, xoff, y, yoff, lg, m):
    """TDC_LPC_residu_fx."""
    a_exp = int(norm_s(a[0])) + 2
    for i in range(lg):
        s = _lmult(int(x[xoff + i]), a[0])
        for k in range(1, m + 1):
            s = _lmac(s, int(x[xoff + i - k]), a[k])
        y[yoff + i] = _round16(int(L_shl(s, a_exp)))


def _tdc_synthesis(sh, a, x, xoff, y, yoff, lg, m):
    """TDC_LPC_synthesis_fx: y has m history before yoff."""
    q = int(norm_s(a[0])) + 1
    a0 = a[0] >> sh if sh >= 0 else _shl16(a[0], -sh)
    for i in range(lg):
        s = _lmult(a0, int(x[xoff + i]))
        for k in range(1, m + 1):
            s = int(sat32(s - _lmult(int(y[yoff + i - k]), a[k])))
        y[yoff + i] = _round16(int(L_shl(s, q)))


def tdc_conceal_core(st, cfg, pitch_int, nb_lost_in_row, overlap):
    """processTimeDomainConcealment_Apply_fx (plc_tdc_main_fx.c:66-520).
    Returns (synth Word16[frame+overlap], Q_syn)."""
    frame_length = cfg.frame_length
    frame_dms = cfg.frame_dms
    fs_idx = cfg.fs_idx
    lpc_order = 16
    preemph = int(T.t("fx_plc_preemph_fac")[fs_idx])
    A = st.tdc_A
    L = frame_length
    length = L + overlap
    nb_loc = nb_lost_in_row
    next_inc = before_next = 1
    if frame_dms == 25:
        nb_loc = (nb_lost_in_row + 3) >> 2
        next_inc = int((nb_lost_in_row & 3) == 1)
        before_next = int((nb_lost_in_row & 3) == 0)
    elif frame_dms == 50:
        nb_loc = (nb_lost_in_row + 1) >> 1
        next_inc = int((nb_lost_in_row & 1) == 1)
        before_next = int((nb_lost_in_row & 1) == 0)
    if nb_loc > PLC_FADEOUT_IN_MS // 10:
        st.tdc_gain_c = 0
        st.damping = 0
        return np.zeros(length, I64), 0

    L2 = L >> 1
    Tc = pitch_int + (1 if st.tdc_fract > 0 else 0)
    len_pi_lf_2 = Tc + L2
    mlen = st.max_len_pcm
    q_exc = 0
    exc_hist = np.zeros(len_pi_lf_2, I64)    # exc_fx[-len_pi_lf_2 .. -1]
    x_pre = None
    if nb_lost_in_row == 1:
        cnt = len_pi_lf_2 + lpc_order + 1
        x_pre = [int(v) for v in st.x_old_tot[mlen - cnt:]]
        q_exc = _tdc_preemph(x_pre, 1, preemph, cnt - 1)
        st.tdc_synth_mem = [int(v) for v in x_pre[len_pi_lf_2 + 1:
                                                  len_pi_lf_2 + 1 + lpc_order]]
        _tdc_residu(A, x_pre, lpc_order + 1, exc_hist, 0, len_pi_lf_2,
                    lpc_order)
        st.tdc_exc_hist = exc_hist
    else:
        exc_hist = st.tdc_exc_hist

    if nb_lost_in_row == 1:
        if pitch_int == Tc:
            gain_p = _round16(int(L_shl(
                _tdc_calc_gainp(x_pre, lpc_order + Tc + 1, x_pre,
                                lpc_order + 1, L2), 15)))
        else:
            t32 = _tdc_calc_gainp(x_pre, lpc_order + Tc + 1, x_pre,
                                  lpc_order + 2, L2)
            t32_2 = _tdc_calc_gainp(x_pre, lpc_order + Tc + 1, x_pre,
                                    lpc_order + 1, L2)
            if t32 > t32_2:
                Tc = pitch_int
                gain_p = _round16(int(L_shl(t32, 15)))
                st.tdc_fract = 0
            else:
                gain_p = _round16(int(L_shl(t32_2, 15)))
        if gain_p < 0:
            gain_p = 0
        if pitch_int == Tc:
            gain_c32 = _tdc_calc_gainc(exc_hist, len_pi_lf_2, q_exc, Tc, L2,
                                       frame_dms, gain_p)
        else:
            ta = _tdc_calc_gainc(exc_hist, len_pi_lf_2, q_exc, pitch_int, L2,
                                 frame_dms, gain_p)
            gain_c32 = _tdc_calc_gainc(exc_hist, len_pi_lf_2, q_exc, Tc, L2,
                                       frame_dms, gain_p)
            gain_c32 = min(gain_c32, ta)
    else:
        gain_c32 = st.tdc_gain_c
        gain_p = st.damping

    alpha_prev = 0x7FFF
    if nb_lost_in_row > 1:
        alpha_prev = st.damping
    alpha = st.damping
    if next_inc:
        if nb_loc == 1:
            if gain_p > 31470:
                alpha = 0x7D71
            elif gain_p < 28037:
                alpha = 0x7666
            else:
                m, e = sqrt16(gain_p, 0)
                alpha = _shl16(m, e)
        else:
            c1, c2 = (0x50A4, 0x2CCD) if nb_loc == 2 else (0x5375, 0x29FC)
            alpha = _mult_r(st.stab_fac, c2)
            alpha = _add16(alpha, c1)
            alpha = (gain_p * alpha) >> 15
            if nb_loc == 2:
                if alpha < 0x75A2:
                    alpha = 0x75A2
            elif nb_loc > 5:
                gain_p = alpha
    if nb_loc > 3:
        alpha = (alpha * PLC34_ATTEN[frame_dms]) >> 15
    if nb_loc > 5:
        gain_p = alpha
    st.damping = alpha

    # harmonic part
    s_min_ = min(length, Tc)
    if nb_lost_in_row == 1:
        st.harmonic_q = q_exc
        if st.stab_fac >= 32767:
            st.harmonic_buf = exc_hist[len_pi_lf_2 - Tc:
                                       len_pi_lf_2].copy()
        else:
            ext = np.concatenate([exc_hist,
                                  exc_hist[len_pi_lf_2 - Tc:
                                           len_pi_lf_2 - Tc + 5]])
            harm = T.t("fx_TDC_high_32_harm" if fs_idx > 1
                       else "fx_TDC_high_16_harm")
            hb = np.zeros(Tc, I64)
            base = len_pi_lf_2 - Tc
            for i in range(Tc):
                hb[i] = _tdc_dot16(ext, base + i - 5, harm, TDC_L_FIR_HP)
            st.harmonic_buf = hb
    else:
        q_exc = st.harmonic_q

    # random part
    seed = st.tdc_seed
    exc2 = [0] * (length + TDC_L_FIR_HP - 1)
    for i in range(length + TDC_L_FIR_HP - 1):
        seed = _extract_l(lmac0(16831, seed, 12821))
        exc2[i] = seed
    st.tdc_seed = seed
    hp = T.t("fx_TDC_high_32" if fs_idx > 1 else "fx_TDC_high_16")
    if nb_lost_in_row == 1:
        out2 = [0] * len(exc2)
        for i in range(length):
            out2[i] = _round16(int(sat32(_tdc_ldot(exc2, i, hp,
                                                   TDC_L_FIR_HP) - 1)))
        exc2[:length] = out2[:length]
    else:
        throttle = div_s(nb_loc, nb_loc + PLC3_HPBLENDTHROTTLE)
        blend = ((0x7FFF - alpha) * throttle) >> 15
        c1 = int(sat16(0x7FFF - blend))
        out2 = list(exc2)
        for i in range(length):
            t32 = int(mpy_32_16(_tdc_ldot(exc2, i, hp, TDC_L_FIR_HP), c1))
            out2[i] = _round16(lmac0(t32, blend, int(exc2[i + 5])))
        exc2 = out2

    # normalize energy (TDC_normalize_energy_fx)
    tmp = 0
    for i in range(frame_length):
        t16 = _mult_r(int(exc2[i]), 2048)
        tmp = _lmac(tmp, t16, t16)
    e = int(norm_l(tmp)) if tmp != 0 else 31
    tmp = int(sat32(tmp << e))
    e1 = (30 - e) + 8
    t16, e2 = divide3216(tmp, frame_length)
    e = 0
    if t16 != 0:
        e = (e1 + e2) - 15
    c = 0x0148
    if e > 0:
        c >>= min(e, 15)
    else:
        t16 >>= min(-e, 15)
        e = 0
    e2 = 1 if (e & 1) else 2
    t16 = int(sat16((t16 >> e2) + (c >> e2)))
    e += e2
    t16, e = sqrt16(t16, e)
    gain_inov, e1 = divide1616(0x7FFF, t16)
    gain_inov_exp = e1 - e

    t32 = int(mpy_32_16(int(sat32(
        590558016 - int(mpy_32_16(int(sat32(gain_p << 16)) >> 2, 24576)))),
        gain_inov))
    s = int(norm_l(t32)) if t32 != 0 else 31
    t32 = int(sat32(t32 << s))
    t32 = min(t32, 0x7FFEFFFF)
    gain_inov_exp = (gain_inov_exp - s) + 2
    gain_inov = _round16(t32)

    gain_h = alpha_prev
    ilen, ilen_exp = divide1616(1, frame_length)
    step = _round16(int(L_shl(_lmult(int(sat16(gain_h - alpha)), ilen),
                              ilen_exp)))
    s = int(norm_l(gain_c32)) if gain_c32 != 0 else 31
    t32 = int(sat32(gain_c32 << s))
    gain_c16 = _extract_h(t32)
    gain_c16_exp = 15 - s
    gainc_tmp = _lmult(gain_c16, div_s(alpha, alpha_prev))
    t32 = int(sat32(t32 - gainc_tmp))
    step_n = _round16(int(L_shl(int(mpy_32_16(t32, ilen)), ilen_exp)))

    # total excitation
    harm_ptr = ((nb_lost_in_row - 1) * frame_length) % Tc
    s1 = q_exc + gain_inov_exp + gain_c16_exp
    g = _mult_r(gain_c16, gain_inov)
    exc_cur = np.zeros(length, I64)
    hb = st.harmonic_buf
    for i in range(length):
        if harm_ptr >= Tc:
            harm_ptr = 0
        v = int(hb[harm_ptr])
        harm_ptr += 1
        t32 = _lmult(v, gain_h)
        t32_2 = int(L_shl(_lmult(int(exc2[i]), g), s1))
        exc_cur[i] = _round16(int(sat32(t32 + t32_2)))
        gain_h = max(gain_h - step, 0)
        gain_c16 = max(gain_c16 - step_n, 0)
        g = _mult_r(gain_c16, gain_inov)

    st.tdc_gain_c = int(L_shl(gainc_tmp, gain_c16_exp - 15))

    # synthesis
    q_syn = max(q_exc - 2, -3)
    exp_scale = q_syn - (q_exc - 1)
    if nb_lost_in_row != 1:
        mem = st.synth_hist
    else:
        mem = st.tdc_synth_mem
    synth_tmp = [0] * (lpc_order + length)
    # Copy_Scale_sig (basop_util.c:597-630): ROUNDED shift for exp<0
    mem_scaled = _scale_sig(np.asarray(mem, I64), exp_scale)
    for i in range(lpc_order):
        synth_tmp[i] = int(mem_scaled[i])
    _tdc_synthesis(q_exc - q_syn, A, exc_cur, 0, synth_tmp, lpc_order,
                   length, lpc_order)
    sh = [0] * lpc_order
    for i in range(lpc_order):
        v = int(synth_tmp[lpc_order + frame_length - lpc_order + i])
        sh[i] = v >> exp_scale if exp_scale >= 0 else _shl16(v, -exp_scale)
    st.synth_hist = sh

    # deemphasis
    mem_de = _shl16(int(st.x_old_tot[mlen - 1]), q_syn)
    synth = np.zeros(length, I64)
    prev = mem_de
    for i in range(length):
        v = _round16(_lmac(int(sat32(int(synth_tmp[lpc_order + i]) << 16)),
                           prev, preemph))
        synth[i] = v
        prev = v

    # fade to zero
    if before_next and nb_loc == PLC_FADEOUT_IN_MS // 10:
        gain_h = 0x7FFF
        step = _round16(int(L_shl(_lmult(gain_h, ilen), ilen_exp)))
        for i in range(frame_length):
            synth[i] = (int(synth[i]) * gain_h) >> 15
            gain_h = int(sat16(gain_h - step))
        synth[frame_length:] = 0
    return synth, q_syn


def tdac(synth, synth_exp, win, la_zeroes, frame_len):
    """processTdac_fx (plc_tdac_fx.c:36-203) -> (ola_mem, ola_mem_exp)."""
    L = frame_len
    LD2 = L >> 1
    NZ = LD2 - la_zeroes
    inv_norm = int(sat16(-(L << 6)))
    inv_norm_e = 2
    if int(norm_s(inv_norm)) > 0:
        inv_norm = int(sat16(inv_norm << 1))
        inv_norm_e = 1
    if L <= 120:
        inv_norm_e += 2
    if L <= 20:
        inv_norm_e += 2
    synth_len = 2 * L - la_zeroes
    from .fixed_ltpf import _headroom16
    arr = np.asarray(synth[:synth_len], I64)
    s = _headroom16(arr)
    sy = sat16(np.clip(arr << s, MIN32, MAX32))
    synth_exp = synth_exp - s
    w = [int(v) for v in win]
    ola = np.zeros(L - la_zeroes, I64)
    i1, i2 = L + LD2 - 1, L + LD2
    w3, w4 = LD2 - 1, LD2
    s1, s2 = L + LD2 - 1 - la_zeroes, L + LD2 - la_zeroes
    o1, o2 = LD2 - la_zeroes, LD2 - la_zeroes - 1
    smax = 15
    for _ in range(NZ):
        sz = _lmac(_lmult(int(sy[s1]), w[i1]), int(sy[s2]), w[i2])
        ola[o1] = _round16(int(mpy_32_16(sz, w[w3])))
        ola[o2] = _round16(int(mpy_32_16(sz, w[w4])))
        if ola[o1] != 0:
            smax = min(smax, int(norm_s(int(ola[o1]))))
        if ola[o2] != 0:
            smax = min(smax, int(norm_s(int(ola[o2]))))
        i1 -= 1
        i2 += 1
        w3 -= 1
        w4 += 1
        s1 -= 1
        s2 += 1
        o1 += 1
        o2 -= 1
    for _ in range(NZ, LD2):
        sz = _lmult(int(sy[s1]), w[i1])
        ola[o1] = _round16(int(mpy_32_16(sz, w[w3])))
        if ola[o1] != 0:
            smax = min(smax, int(norm_s(int(ola[o1]))))
        i1 -= 1
        i2 += 1
        w3 -= 1
        s1 -= 1
        s2 += 1
        o1 += 1
    smax = min(smax, 15)
    for i in range(LD2 + NZ):
        ola[i] = _round16(_lmult(_shl16(int(ola[i]), smax), inv_norm))
    return ola, (synth_exp + inv_norm_e) - smax


def tdc_conceal(plc, imdct_st, w, cfg, ltpf):
    """Conceal method 3 top level (plc_apply_fx.c case 3)."""
    if plc.nb_lost == 1:
        plc.tdc_fract = ltpf.pitch_fr
        tdc_lpc_analysis(plc, cfg)
    overlap = cfg.frame_length - cfg.la_zeroes
    synth, q_syn = tdc_conceal_core(plc, cfg, ltpf.pitch_int, plc.nb_lost,
                                    overlap)
    q_syn = q_syn + (15 - plc.q_fx_old_exp)
    q_fx_exp = 15 - q_syn
    ola, ola_exp = tdac(synth, q_fx_exp, w, cfg.la_zeroes, cfg.frame_length)
    imdct_st.mem = ola
    imdct_st.mem_e = ola_exp
    return synth[:cfg.frame_length].copy(), q_fx_exp


def phase_ecu(plc, imdct_st, w, cfg, ltpf):
    """Conceal method 2 (Phase ECU), delegated to ops/plc_phecu_fixed."""
    from . import plc_phecu_fixed as ph
    return ph.phase_ecu(plc, imdct_st, w, cfg, ltpf)
