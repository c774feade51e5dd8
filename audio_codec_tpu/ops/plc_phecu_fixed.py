"""Integer-exact Phase ECU concealment (plc_phecu_*.c, BASOP semantics).

Conceal method 2 of the fixed-point decoder: on the first lost frame the
16 ms prototype (tail of the PCM history) is windowed (Hamming-rect),
transformed (BASOP_rfftN), peak-picked and saved; every lost frame the
spectrum is phase-evolved at the peaks, scrambled in the valleys, faded
toward per-group averages (trans_burst_ana), inverse-transformed and
re-windowed into the TDA domain (rec_wtda -> Processing_ITDA_WIN_OLA).

Everything is Word16/Word32 saturating arithmetic matching the C exactly;
verified per frame against the instrumented oracle
(tests/test_fixed_plc.py).
"""
from __future__ import annotations

import numpy as np

from .. import tables as T
from .fixed_dec import (I64, sat16, sat32, norm_s, norm_l, L_shl, mpy_32_16,
                        mpy_32_32, round_fx, mult_r, mac_r)
from .fixed_ltpf import (_mult_r, _add16, _shl16, _lmac, _lmult, _round16,
                         _msu_r, _scale_sig, _headroom16_0)
from . import fixed_imdct as fi
from .plc_fixed import (MAX_LGW, LPROT, lmac0, lmsu0, div_s, sqrt16,
                        plc_phecu_ratio, _extract_l, _extract_h,
                        LTOT_INIT_FLAG, LTOT_MIN_MAN, UNINIT_OOLD)

MIN32, MAX32 = -(1 << 31), (1 << 31) - 1
LGW = [4, 5, 6, 7, 8]                    # LGW8K..LGW48K (defines.h:351-355)
LGW8K, LGW16K, LGW32K, LGW48K = 4, 5, 7, 8
BURST_ATT_THRESH = 1                     # PLC2_FADEOUT_IN_MS=30 macro calc
ATT_PER_FRAME = 10
BETA_MUTE_THR = 4
BETA_MUTE_FAC_INI = 16384
OFF_FRAMES_LIMIT = 30
DELTA_CORR = 5
DELTA_CORR_F0_INT = 2
CMPLMNT_PLOC_SENS = 2294
ROOT2 = 23170
TWOTHIRDS = 21845
C_JACOB = 18725
LPROT48K_RED = 640
COPY_LEN = [16, 32, 48, 64, 96]
OLA_LEN = [14, 28, 42, 56, 84]
FHG_SHIFT = 2
# macro-built tables (constants.c:465-479, 972-977; defines.h:345-349,429-433)
GWLPR = [1, 12, 20, 36, 68, 132, 196, 260, 324, 388]      # QUOT_LPR_LTR = 4
GW_LEN_INV_SHIFT = [0, 0, 1, 2, 3, 3, 3, 3, 3]
ONE_OVER_FRAME_Q15 = [409, 204, 136, 102, 68]             # 32768 // frame
INV_LPROT_Q22 = [32767, 16384, 10923, 8192, 5461]
_POW_ATT = ["", "fx_POW_ATT_TABLE1", "fx_POW_ATT_TABLE0",
            "fx_POW_ATT_TABLE_p3x8_6", "fx_POW_ATT_TABLE_p4x8_6",
            "fx_POW_ATT_TABLE_p3x4_6", "fx_POW_ATT_TABLE_p4x4_6",
            "fx_POW_ATT_TABLE_p3x2_6", "fx_POW_ATT_TABLE_p4x2_6",
            "fx_POW_ATT_TABLE_p3x1_6", "fx_POW_ATT_TABLE_p4x1_6"]
_WHR = ["fx_PhECU_whr16ms_NB_Q15", "fx_PhECU_whr16ms_WB_Q15",
        "fx_PhECU_whr16ms_sWB_Q15", "fx_PhECU_whr16ms_SWB_Q15",
        "fx_PhECU_whr16ms_FB_Q15"]
_W16MS = ["fx_PhECU_preTdaFx16ms_NB_Q14", "fx_PhECU_preTdaFx16ms_WB_Q14",
          "fx_PhECU_preTdaFx16ms_sWB_Q14", "fx_PhECU_preTdaFx16ms_SWB_Q14",
          "fx_PhECU_preTdaFx16ms_FB_Q14"]
_W2MS = ["fx_PhECU_preTdaFx16ms_128_pre_Q14", "fx_PhECU_preTdaFx16ms_256_pre_Q14",
         "fx_PhECU_preTdaFx16ms_384_pre_Q14", "fx_PhECU_preTdaFx16ms_512_pre_Q14",
         "fx_PhECU_preTdaFx16ms_768_pre_Q14"]
_W_NEW = ["fx_w_new_fs_8_LA_0", "fx_w_new_fs_16_LA_0", "fx_w_new_fs_24_LA_0",
          "fx_w_new_fs_32_LA_0", "fx_w_new_fs_48_LA_0"]
_W_OLD = ["fx_w_old_fs_8_LA_0", "fx_w_old_fs_16_LA_0", "fx_w_old_fs_24_LA_0",
          "fx_w_old_fs_32_LA_0", "fx_w_old_fs_48_LA_0"]


def _shr_pos(v, n):
    return int(v) >> n


def sqrt2nd(x):
    """sqrt2ndOrder (plc_phecu_fec_hq_fx.c:1966-1985)."""
    z = int(mac_r(1890205600, x, -6506))
    return int(mac_r(682030261, z, x))


def winencalc(x, headroom_shift, win, rect_len, half_len, exp_in):
    """winEnCalc (plc_phecu_tools_fx.c:147-244): windowed energy of the
    16 ms prototype; returns (L_tot, exp_out)."""
    L_tot = MAX32
    p = 0
    for i in range(half_len):
        t = (int(x[p]) * int(win[i])) >> 15
        t >>= headroom_shift
        L_tot = lmsu0(L_tot, t, t)
        p += 1
    for i in range(rect_len + 1):
        t = int(x[p]) >> headroom_shift
        L_tot = lmsu0(L_tot, t, t)
        p += 1
    for i in range(half_len - 1):
        t = (int(x[p]) * int(win[half_len - 1 - i])) >> 15
        t >>= headroom_shift
        L_tot = lmsu0(L_tot, t, t)
        p += 1
    exp = ((exp_in + headroom_shift) << 1) + 1
    if L_tot >= 0:
        L_tot = int(sat32(L_tot + (MIN32 + 1)))
        if L_tot == 0:
            exp = -61                   # LTOT_MIN_EXP
        L_tot = min(L_tot, -1)
    else:
        L_tot = (L_tot + 1) >> 1
        L_tot = int(sat32(L_tot + (MIN32 >> 1)))
        exp += 1
    L_tot = max(-MAX32, L_tot)
    L_tot = -L_tot
    t = int(norm_l(L_tot)) if L_tot != 0 else 31
    L_tot = int(L_shl(L_tot, t))
    return L_tot, exp - t


def update_xfp_w_e_hist(st, prev_bfi, bfi, xfp, xfp_exp, margin_xfp, fs_idx):
    """processPLCUpdateXFP_w_E_hist_fx (plc_update_aft_imdct_fx.c:243-360)."""
    if bfi == 1:
        return
    if prev_bfi == 1:
        st.old_wE_exp = LTOT_INIT_FLAG
    if st.old_wE_exp == LTOT_INIT_FLAG:
        st.L_oold_wE = LTOT_MIN_MAN
        st.oold_wE_exp = UNINIT_OOLD
    else:
        st.L_oold_wE = st.L_old_wE
        st.oold_wE_exp = st.old_wE_exp
    if st.old_Ltot_exp == LTOT_INIT_FLAG:
        st.L_oold_wE = LTOT_MIN_MAN
        st.oold_Ltot_exp = UNINIT_OOLD
    else:
        st.L_oold_wE = st.L_old_wE
        st.oold_Ltot_exp = st.old_Ltot_exp
    e_hr = int(T.t("fx_e_tot_headroom")[fs_idx])
    dn_scale = e_hr
    used_exp = xfp_exp
    if margin_xfp > 0:
        dn_scale = max(0, e_hr - margin_xfp)
        exp_shift = e_hr - dn_scale
        used_exp = xfp_exp - exp_shift
    rect = int(T.t("fx_rectLengthTab")[fs_idx])
    hamm2 = int(T.t("fx_hamm_len2Tab")[fs_idx])
    win = T.t(_WHR[fs_idx])
    L_tot, exp_out = winencalc(xfp, dn_scale, win, rect, hamm2, xfp_exp)
    st.L_old_wE = L_tot
    st.old_wE_exp = used_exp
    st.old_Ltot_exp = exp_out
    if st.oold_wE_exp <= UNINIT_OOLD or st.oold_Ltot_exp <= UNINIT_OOLD:
        st.L_oold_wE = L_tot
        st.oold_wE_exp = used_exp
        st.oold_Ltot_exp = exp_out


def set_f0hz(fs_idx, pitch_int, pitch_fr):
    """plc_phEcuSetF0Hz_fx (plc_phecu_setf0hz_fx.c:22-55): Q7 bin freq."""
    if pitch_int == 0:
        return 0
    lag_q2 = int(sat16(pitch_fr + _shl16(pitch_int, 2)))
    man, expo = plc_phecu_ratio(int(sat32(LPROT[fs_idx] << 16)),
                                int(sat32(lag_q2 << 16)))
    L_tmp = int(L_shl(man, 11 - expo))
    return int(round_fx(L_tmp))


def trans_burst_ana(st, fs_idx, output_frame, time_offs, Q_spec):
    """trans_burst_ana_fx (plc_phecu_fec_hq_fx.c:190-676).
    Returns (mag_chg[MAX_LGW], alpha, beta)."""
    one_over = ONE_OVER_FRAME_Q15[fs_idx]
    Lgw = min(fs_idx + LGW8K, LGW48K)
    burst_len = ((time_offs * one_over + 0x4000) >> 15) + 1
    burst_att_thresh = BURST_ATT_THRESH + 1
    att_per_frame = ATT_PER_FRAME - 1
    att_always = 0
    att_deg = 0
    if burst_len > burst_att_thresh:
        att_always = 1
        att_deg = min(burst_len - burst_att_thresh, OFF_FRAMES_LIMIT)
    alpha = [32767] * MAX_LGW
    beta = [0] * MAX_LGW
    mag_chg = [0] * MAX_LGW
    if burst_len <= 1:
        st.beta_mute = BETA_MUTE_FAC_INI >> 1
    if burst_len <= 1:
        fs_scale = int(T.t("fx_xfp_wE_MDCT2FFTQ11")[fs_idx])
        L_oold = int(mpy_32_16(st.L_oold_wE, fs_scale))
        L_old = int(mpy_32_16(st.L_old_wE, fs_scale))
        oold_exp = st.oold_Ltot_exp + 4
        old_exp = st.old_Ltot_exp + 4
        m = int(norm_l(L_oold)) if L_oold != 0 else 31
        L_oold = int(sat32(L_oold << m))
        oold_exp -= m
        m = int(norm_l(L_old)) if L_old != 0 else 31
        L_old = int(sat32(L_old << m))
        old_exp -= m
        ed = max(-31, min(31, old_exp - oold_exp))
        if ed > 0:
            L_oold >>= ed
        if ed < 0:
            L_old >>= -ed
        oold_exp = max(oold_exp, old_exp)
        old_exp = oold_exp
        L_oold = max(L_oold, 2)
        L_old = max(L_old, 2)
        gw_inv = GW_LEN_INV_SHIFT
        thr_rise = T.t("fx_PhEcu_frac_thr_rise_lin_Q15")
        thr_decay = T.t("fx_PhEcu_frac_thr_decay_lin_Q15")
        xs_scale = int(T.t("fx_PhEcu_Xsav_Flt2FxScaleQ15")[fs_idx])
        xs_shift = int(T.t("fx_PhEcu_Xsav_Flt2FxDnShift")[fs_idx])
        for k in range(Lgw):
            gl = int(mpy_32_16(L_oold, st.oold_grp_shape[k]))
            gr = int(mpy_32_16(L_old, st.old_grp_shape[k]))
            xavg_exp = old_exp - 1
            L_acc = int(sat32((gl >> 1) + (gr >> 1)))
            L_acc >>= int(gw_inv[k])
            L_acc = max(L_acc, 1)
            tmp = int(norm_l(L_acc))
            xavg_exp -= tmp
            L_acc = int(sat32(L_acc << tmp))
            expo_in = xavg_exp
            man_in = int(round_fx(L_acc))
            man = sqrt2nd(man_in)
            if expo_in & 1:
                man = _mult_r(man, ROOT2)
            expo = _shr_r(expo_in, 1)    # shr_r per the C
            L_acc = int(sat32(man << 16))
            xavg_exp = expo
            L_acc = int(mpy_32_16(L_acc, xs_scale))
            xavg_mod_exp = (xavg_exp - xs_shift) + Q_spec
            ed = 15 - xavg_mod_exp
            ed = max(-32, min(31, ed))
            if ed > 0:
                L_acc >>= ed
            elif ed < 0:
                L_acc = int(L_shl(L_acc, -ed))
            st.Xavg[k] = int(round_fx(L_acc))
            # transient detection
            tr_rise = 0
            L_t = int(mpy_32_16(gr, int(thr_rise[k])))
            if gl - L_t <= 0:
                tr_rise = 1
            if gl == 0:
                tr_rise = min(gr, 1)
            tr_decay = 0
            L_t = int(mpy_32_16(gl, int(thr_decay[k])))
            if L_t - gr >= 0:
                tr_decay = 1
            if gr == 0:
                tr_decay = 0
            tr_dec = max(tr_rise, tr_decay)
            if tr_dec + att_always != 0:
                att_val = 32767
                if gr > 0:
                    if gr < gl:
                        t16, expo = plc_phecu_ratio(gr, gl)
                        expo -= 1
                        i = int(norm_s(t16))
                        man = _shl16(t16, i)
                        expo += i
                        man = sqrt2nd(man)
                        if expo & 1:
                            man = _mult_r(man, ROOT2)
                        expo = expo >> 1
                        att_val = man >> expo if expo >= 0 else _shl16(man, -expo)
                st.mag_chg_1st[k] = att_val
                mag_chg[k] = att_val
            else:
                st.mag_chg_1st[k] = 32767
                mag_chg[k] = 32767
    else:
        att_tab = T.t(_POW_ATT[att_per_frame])
        for k in range(Lgw):
            att_val = int(att_tab[min(OFF_FRAMES_LIMIT, att_deg)])
            mag_chg[k] = _mult_r(st.mag_chg_1st[k], att_val)
            if burst_len > BETA_MUTE_THR:
                st.beta_mute >>= 1
            alpha[k] = mag_chg[k]
            if alpha[k] < 32766:
                L_acc = int(sat32((MAX32 >> 1) + 1 - alpha[k] * alpha[k]))
                tmp = int(norm_l(L_acc)) if L_acc != 0 else 31
                man_in = int(round_fx(int(sat32(L_acc << tmp))))
                expo_in = 1 - tmp
                man = sqrt2nd(man_in)
                if expo_in & 1:
                    man = _mult_r(man, ROOT2)
                expo2 = _shr_r(expo_in, 1)
                L_man = int(sat32(man << 16))
                L_man = int(L_shl(L_man, expo2))
                man = int(round_fx(L_man))
                beta[k] = _mult_r(st.beta_mute, man)
                if k >= LGW32K - 1:
                    beta[k] = _mult_r(beta[k], 3277)
                elif k >= LGW16K - 1:
                    beta[k] = _mult_r(beta[k], 16384)
                if st.mag_chg_1st[k] < 32767:
                    fade = 32767
                    # ratio2_3_4_5tab (plc_phecu_fec_hq_fx.c:590-597),
                    # C float->Word16 casts truncate
                    ratio_tab = [[16384, 32767, 32767, 32767],
                                 [10911, 21823, 32767, 32767],
                                 [8192, 16384, 24576, 32767],
                                 [6553, 13107, 19660, 26214]]
                    if burst_len <= burst_att_thresh:
                        fade = ratio_tab[burst_att_thresh - 2][burst_len - 2]
                    beta[k] = _mult_r(beta[k], fade)
    if output_frame == 480:
        for k in range(Lgw, MAX_LGW):
            st.Xavg[k] = st.Xavg[k - 1]
            st.mag_chg_1st[k] = st.mag_chg_1st[k - 1]
            mag_chg[k] = mag_chg[k - 1]
            alpha[k] = alpha[k - 1]
            beta[k] = beta[k - 1]
    return mag_chg, alpha, beta


def _shr_r(v, n):
    """shr_r: shift right with rounding (basop)."""
    if n == 0:
        return int(v)
    return (int(v) + (1 << (n - 1))) >> n


def rfftN(x, n, scale):
    """BASOP_rfftN (fft.c:3832-3893)."""
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

    def twid1(i, w1, w2):
        xb0, xb1 = x[2 * i] >> 2, x[2 * i + 1] >> 2
        xt0, xt1 = x[n - 2 * i] >> 2, x[n - 2 * i + 1] >> 2
        t1 = int(sat32(xb0 - xt0))
        t2 = int(sat32(xb1 + xt1))
        t3 = int(sat32(int(mpy_32_32(t1, w1)) - int(mpy_32_32(t2, w2))))
        t4 = int(sat32(int(mpy_32_32(t1, w2)) + int(mpy_32_32(t2, w1))))
        return int(sat32(xb0 + xt0)), int(sat32(xb1 - xt1)), t3, t4

    for i in range(1, n8):
        t1, t2, t3, t4 = twid1(i, int(tw[2 * i + 1]), int(tw[2 * i]))
        x[2 * i] = int(sat32(t1 - t3))
        x[2 * i + 1] = int(sat32(t2 - t4))
        x[n - 2 * i] = int(sat32(t1 + t3))
        x[n - 2 * i + 1] = int(sat32(-int(sat32(t2 + t4))))
    for i in range(n8, n4):
        t1, t2, t3, t4 = twid1(i, int(tw[2 * n4 - 2 * i]),
                               int(tw[2 * n4 - 2 * i + 1]))
        x[2 * i] = int(sat32(t1 - t3))
        x[2 * i + 1] = int(sat32(t2 - t4))
        x[n - 2 * i] = int(sat32(t1 + t3))
        x[n - 2 * i + 1] = int(sat32(-int(sat32(t2 + t4))))
    i = n4
    x[n - 2 * i] = x[2 * i] >> 1
    x[n - 2 * i + 1] = int(sat32(-(x[2 * i + 1] >> 1)))
    return x, scale + 1


def irfftN(x, n, scale):
    """BASOP_irfftN (fft.c:3893-3960)."""
    tw = T.t(f"fx_RealFFT{n}_twid")
    n2, n4, n8 = n >> 1, n >> 2, n >> 3
    xb0, xb1 = x[0] >> 2, x[1] >> 2
    x[0] = int(sat32(xb0 + xb1))
    x[1] = int(sat32(xb1 - xb0))

    def twid2(i, w1, w2):
        xb0, xb1 = x[2 * i] >> 2, x[2 * i + 1] >> 2
        xt0, xt1 = x[n - 2 * i] >> 2, x[n - 2 * i + 1] >> 2
        t1 = int(sat32(xb0 - xt0))
        t2 = int(sat32(xb1 + xt1))
        t3 = int(sat32(int(mpy_32_32(t1, w1)) + int(mpy_32_32(t2, w2))))
        t4 = int(sat32(int(mpy_32_32(t2, w1)) - int(mpy_32_32(t1, w2))))
        return int(sat32(xb0 + xt0)), int(sat32(xb1 - xt1)), t3, t4

    for i in range(1, n8):
        t1, t2, t3, t4 = twid2(i, int(tw[2 * i + 1]), int(tw[2 * i]))
        x[2 * i] = int(sat32(t1 - t3))
        x[2 * i + 1] = int(sat32(t4 - t2))
        x[n - 2 * i] = int(sat32(t1 + t3))
        x[n - 2 * i + 1] = int(sat32(t2 + t4))
    for i in range(n8, n4):
        t1, t2, t3, t4 = twid2(i, int(tw[2 * n4 - 2 * i]),
                               int(tw[2 * n4 - 2 * i + 1]))
        x[2 * i] = int(sat32(t1 - t3))
        x[2 * i + 1] = int(sat32(t4 - t2))
        x[n - 2 * i] = int(sat32(t1 + t3))
        x[n - 2 * i + 1] = int(sat32(t2 + t4))
    i = n4
    x[n - 2 * i] = x[2 * i] >> 1
    x[n - 2 * i + 1] = x[2 * i + 1] >> 1
    pairs = [(x[2 * j], x[2 * j + 1]) for j in range(n2)]
    pairs, sc = fi.cfft(pairs, n2)
    scale += sc
    for j in range(n2):
        x[2 * j] = int(pairs[j][0])
        x[2 * j + 1] = int(sat32(-int(pairs[j][1])))
    return x, scale + 2


# ------------------------------------------------------------ spec_ana

def peak_locator(inp, inp_len, sens, inp_high, inp_low):
    """plc_phEcu_peak_locator_fx (plc_phecu_peak_locator_fx.c:19-383)."""
    inp = [int(v) for v in inp[:inp_len]]
    ilm1 = inp_len - 1
    sc_idx = [0] * (inp_len + 2)
    cand_pairs = [0] * (inp_len + 3)     # index -1 stored at [0]
    cp = 1                               # cand_pairs base offset
    pairs_start = 1
    p = pairs_start
    prev_delta = inp[1] - inp[0]
    for n in range(1, ilm1):
        curr_delta = inp[n + 1] - inp[n]
        if (prev_delta < 0) != (curr_delta < 0):   # s_xor sign change
            sc_idx[p] = n
            p += 1
        prev_delta = curr_delta
    k = p - pairs_start
    for j in range(k):
        cand_pairs[cp + j + pairs_start] = inp[sc_idx[j + pairs_start]]
    if k >= 2 and cand_pairs[cp + pairs_start] == cand_pairs[cp + pairs_start + 1]:
        pairs_start += 1
        k -= 1
    pairs_end = pairs_start + k - 1
    if k >= 2 and cand_pairs[cp + pairs_end - 1] == cand_pairs[cp + pairs_end]:
        k -= 1
    pairs_end = pairs_start + k - 1
    add_dc = add_fin = 0
    if k == 1:
        if inp[0] != cand_pairs[cp + pairs_start]:
            add_dc = 1
        if cand_pairs[cp + pairs_end] != inp[ilm1]:
            add_fin = 1
    if k >= 2:
        delta_predc = cand_pairs[cp + pairs_start + 1] - cand_pairs[cp + pairs_start]
        delta_fin = cand_pairs[cp + pairs_end] - cand_pairs[cp + pairs_end - 1]
        add_dc = 1
        if inp[0] == cand_pairs[cp + pairs_start]:
            add_dc = 0
        if inp[0] < cand_pairs[cp + pairs_start] and delta_predc > 0:
            add_dc = -1
        if inp[0] > cand_pairs[cp + pairs_start] and delta_predc < 0:
            add_dc = -1
        add_fin = 1
        if cand_pairs[cp + pairs_end] == inp[ilm1]:
            add_fin = 0
        if delta_fin > 0 and cand_pairs[cp + pairs_end] < inp[ilm1]:
            add_fin = -1
        if delta_fin < 0 and cand_pairs[cp + pairs_end] > inp[ilm1]:
            add_fin = -1
    if add_dc > 0:
        pairs_start -= 1
        cand_pairs[cp + pairs_start] = inp[0]
        sc_idx[pairs_start] = 0
        k += 1
    elif add_dc < 0:
        cand_pairs[cp + pairs_start] = inp[0]
        sc_idx[pairs_start] = 0
    if add_fin > 0:
        pairs_end += 1
        cand_pairs[cp + pairs_end] = inp[ilm1]
        sc_idx[pairs_end] = ilm1
        k += 1
    elif add_fin < 0:
        cand_pairs[cp + pairs_end] = inp[ilm1]
        sc_idx[pairs_end] = ilm1
    low_val = int(inp_low)
    val_range = int(inp_high) - low_val
    if val_range < 1 or inp_high < sens:
        k = 0
    if k == 0 and val_range >= sens:
        k = 1
    plocs = []
    if k > 2:
        cand_phase_start = pairs_start
        if cand_pairs[cp + pairs_start] < cand_pairs[cp + pairs_start + 1]:
            cand_phase_start = pairs_start + 1
        tmp = k
        if cand_phase_start != pairs_start:
            tmp -= 1
        num_pairs = tmp >> 1
        n_tail = tmp - (num_pairs << 1)
        fsc = []
        cand_high = low_val
        cand_idx = -1
        cand_pairs[cp - 1] = low_val
        prev_low = low_val
        prev_low_plus_sens = int(sat16(prev_low + sens))
        for idx_high in range(cand_phase_start,
                              cand_phase_start + 2 * num_pairs, 2):
            idx_low = idx_high + 1
            t = max(cand_high, prev_low_plus_sens)
            if cand_pairs[cp + idx_high] > t:
                cand_idx = idx_high
            cand_high = cand_pairs[cp + cand_idx]
            prev_low = min(cand_pairs[cp + idx_low], prev_low)
            t = int(sat16(cand_high - sens))
            if t > cand_pairs[cp + idx_low]:
                fsc.append(cand_idx)
                prev_low = cand_pairs[cp + idx_low]
                cand_idx = -1
                cand_high = low_val
            prev_low_plus_sens = int(sat16(prev_low + sens))
        if n_tail == 0 and cand_idx >= 0:
            fsc.append(cand_idx)
        if n_tail > 0:
            t = max(cand_high, prev_low_plus_sens)
            if cand_pairs[cp + pairs_end] - t > 0:
                fsc.append(pairs_end)
            elif cand_idx >= 0:
                fsc.append(cand_idx)
        plocs = [sc_idx[j] for j in fsc]
    else:
        if k != 0 and int(sat16(inp_high - sens)) > low_val:
            # find LAST index of the max (plc_phEcu_find_ind_fx keeps
            # overwriting, no break)
            t = -1
            for pos in range(inp_len):
                if inp[pos] == inp_high:
                    t = pos
            if t >= 0:
                plocs = [t]
    return plocs


def imax(y, special):
    """imax_fx (plc_phecu_fec_hq_fx.c:681-790): parabolic max, Q15."""
    y1, y2, y3 = int(y[0]), int(y[1]), int(y[2])
    y3_y1 = y3 - y1
    denom = 2 * y2 - y1 - y3
    sign = (y3_y1 < 0) != (denom < 0)
    numer = abs(y3_y1)
    denom_a = abs(denom)
    if numer == 0 or denom_a == 0:
        return 0
    if denom_a > (numer >> 1):
        man, expo = plc_phecu_ratio(numer, denom_a)
        posi = man >> (expo) if expo >= 0 else _shl16(man, -expo)
        posi = max(-32768, min(32767, posi))
    else:
        posi = 0x7FFF
    if sign:
        posi = -posi if posi != -32768 else 32767
    if special != 0:
        edge = 0x7FFF if special > 0 else 0
        if posi > 0:
            posi = int(sat16(0x7FFF - posi))
            if y3 - y1 <= 0:
                posi = edge
        else:
            posi = int(sat16(0x7FFF + posi))
            if y3 - y1 >= 0:
                posi = edge
    return posi


def imax2_jacobsen(y_re, y_im):
    """imax2_jacobsen_mag_fx (plc_phecu_fec_hq_fx.c:2304-2420)."""
    y_m1_re, y_0_re, y_p1_re = int(y_re[0]), int(y_re[1]), int(y_re[2])
    y_p1_im, y_0_im, y_m1_im = int(y_im[0]), int(y_im[1]), int(y_im[2])
    if int(norm_s(y_0_re)) == 0 or int(norm_s(y_0_im)) == 0:
        y_0_re >>= 2
        y_0_im >>= 2
        y_m1_re >>= 2
        y_m1_im >>= 2
        y_p1_re >>= 2
        y_p1_im >>= 2
    N_re = int(sat16(y_m1_re - y_p1_re))
    N_im = int(sat16(y_m1_im - y_p1_im))
    D_re = int(sat16(int(sat16(_shl16(y_0_re, 1) - y_m1_re)) - y_p1_re))
    D_im = int(sat16(int(sat16(_shl16(y_0_im, 1) - y_m1_im)) - y_p1_im))
    L_numer = lmac0(int(sat32(N_re * D_re)), N_im, D_im)
    L_denom = lmac0(int(sat32(D_re * D_re)), D_im, D_im)
    sign = (L_numer < 0) != (L_denom < 0)
    L_numer = abs(max(L_numer, MIN32 + 1))
    L_denom = abs(max(L_denom, MIN32 + 1))
    if L_numer != 0 and L_denom != 0:
        man, expo = plc_phecu_ratio(L_numer, L_denom)
        man = _mult_r(man, C_JACOB)
        sh = expo - 2
        posi = man >> sh if sh >= 0 else _shl16(man, -sh)
        posi = max(-32768, min(32767, posi))
        if sign:
            posi = -posi if posi != -32768 else 32767
    else:
        posi = 0
    return posi


def sqrt_magn_approx(re, im):
    """sqrtMagnApprox_fx (plc_phecu_fec_hq_fx.c:2140-2200)."""
    re_a, im_a = abs(int(re)), abs(int(im))
    if re_a == 32768:
        re_a = 32767
    if im_a == 32768:
        im_a = 32767
    mn, mx = min(re_a, im_a), max(re_a, im_a)
    sgn = ((int(sat16((mx * 13573) >> 15)) - mn) & 0xFFFF) >> 15
    co = [[16220, 3228], [13763, 9191]][sgn]
    return _round16(_lmac(_lmult(mx, co[0]), mn, co[1]))


def fft_spec2_sqrt_approx(x, N):
    """fft_spec2_sqrt_approx_fx (plc_phecu_fec_hq_fx.c:2240-2300)."""
    out = [0] * (N // 2 + 1)
    out[0] = int(sat16((abs(int(x[0])) * 16220) >> 15))
    l = N // 2 - 1
    l = min(l, (LPROT48K_RED // 2 - 1) + DELTA_CORR_F0_INT)
    for i in range(l):
        out[1 + i] = sqrt_magn_approx(x[1 + i], x[N - 1 - i])
    out[N // 2] = int(sat16((abs(int(x[1 + l])) * 16220) >> 15))
    return out


def windowing_L(x, win, rect_len, half_len):
    """windowing_L (plc_phecu_fec_hq_fx.c:1993-2050): Word16 -> Word32."""
    out = []
    p = 0
    for i in range(half_len):
        out.append(_lmult(int(x[p]), int(win[i])))
        p += 1
    tmp_rl = rect_len + 1 if rect_len != 0 else 0
    for i in range(tmp_rl):
        out.append(int(sat32(int(x[p]) << 16)))
        p += 1
    tmp_rl = half_len - 1 if rect_len != 0 else half_len
    for i in range(tmp_rl):
        out.append(_lmult(int(x[p]), int(win[half_len - 1 - i])))
        p += 1
    return out


def intlv_to_flipped(L_x, Lprot):
    """intlvW32_2_flippedW16 (plc_phecu_fec_hq_fx.c:2424-2500)."""
    num_pairs = Lprot // 2 - 1
    x = [0] * Lprot
    if num_pairs in (383, 191):
        npl = min(num_pairs, 383 - 63)
        for m in range(npl):
            x[1 + m] = _extract_h(int(L_shl(int(mpy_32_16(
                int(L_x[2 + 2 * m]), TWOTHIRDS)), FHG_SHIFT + 2)))
            x[Lprot - 1 - m] = _extract_h(int(L_shl(int(mpy_32_16(
                int(L_x[3 + 2 * m]), TWOTHIRDS)), FHG_SHIFT + 2)))
        x[0] = _extract_h(int(L_shl(int(mpy_32_16(int(L_x[0]), TWOTHIRDS)),
                                    FHG_SHIFT + 2)))
        x[Lprot // 2] = _extract_h(int(L_shl(int(mpy_32_16(
            int(L_x[1]), TWOTHIRDS)), FHG_SHIFT + 2)))
    else:
        for m in range(num_pairs):
            x[1 + m] = _extract_h(int(L_shl(int(L_x[2 + 2 * m]), FHG_SHIFT)))
            x[Lprot - 1 - m] = _extract_h(int(L_shl(int(L_x[3 + 2 * m]),
                                                    FHG_SHIFT)))
        x[0] = _extract_h(int(L_shl(int(L_x[0]), FHG_SHIFT)))
        x[Lprot // 2] = _extract_h(int(L_shl(int(L_x[1]), FHG_SHIFT)))
    return x


def flipped_to_intlv(x, Lprot):
    """flippedW16_2_intlvW32 (plc_phecu_fec_hq_fx.c:2502-2560)."""
    num_pairs = Lprot // 2 - 1
    L_x = [0] * Lprot
    npl = min(320, num_pairs)
    for i in range(npl):
        L_x[2 + 2 * i] = int(sat32(int(x[1 + i]) << 16)) >> FHG_SHIFT
        L_x[3 + 2 * i] = int(sat32(int(x[Lprot - 1 - i]) << 16)) >> FHG_SHIFT
    L_x[0] = int(sat32(int(x[0]) << 16)) >> FHG_SHIFT
    L_x[1] = int(sat32(int(x[Lprot // 2]) << 16)) >> FHG_SHIFT
    return L_x


def lf_peak_analysis(plocs, f0est, mag, f0binQ7, f0gainQ15, n_subm, max_plocs):
    """plc_phEcu_LF_peak_analysis_fx (plc_phecu_lf_peak_analysis_fx.c)."""
    n_plocs = len(plocs)
    if not (n_plocs > 0 and f0gainQ15 > 8192 and f0binQ7 < 352):
        return plocs, f0est
    intersect = 0
    peak_val = 0
    for i in range(min(n_plocs, 3)):
        t = plocs[i]
        if t <= 2:
            intersect = i + 1
        peak_val = max(int(mag[t]), peak_val)
    prel_locs, prel_f0 = [], []
    if intersect != 0:
        peak_val = _mult_r(peak_val, 12288)
        for i in range(1, n_subm + 1):
            L_f = i * f0binQ7
            f_abs = (L_f + 64) >> 7
            if L_f <= 819 and int(mag[f_abs]) > peak_val:
                prel_f0.append(int(sat32(L_f << 9)))
                prel_locs.append(f_abs)
    if prel_locs and len(prel_locs) + n_plocs <= max_plocs:
        prel_low, prel_high = prel_locs[0], prel_locs[-1]
        start = -1
        for i in range(n_plocs - 1, -1, -1):
            if plocs[i] >= prel_low:
                start = i
        start = max(start - 1, -1)
        if prel_high < plocs[0]:
            fin = 0
        else:
            fin = n_plocs
            for i in range(n_plocs):
                if plocs[i] <= prel_high:
                    fin = i
            fin += 1
        new_plocs = list(plocs[: start + 1]) + prel_locs + list(plocs[fin:])
        new_f0 = list(f0est[: start + 1]) + prel_f0 + list(f0est[fin:])
        return new_plocs, new_f0
    return plocs, f0est


def f0_refine_first(plocs, f0est, f0binQ7, f0gainQ15, n_subm):
    """plc_phEcu_F0_refine_first_fx (plc_phecu_f0_refine_first_fx.c)."""
    if f0gainQ15 <= 8192:
        return f0est
    n_ana = min(len(plocs), 4)
    i = n_ana - 1
    while i >= 0 and plocs[i] > 25:      # 1600/62.5
        i -= 1
    n_ana = i + 1
    ploc = -1
    L_tmp = 0
    if n_ana > 0:
        for i in range(n_ana):
            sens = 1 << 6
            if f0gainQ15 < 24576:
                sens >>= 1
            f0q7 = int(f0est[i]) >> 9
            for subm in range(1, n_subm + 1):
                diff = abs(int(sat32(f0q7 - subm * f0binQ7)))
                if diff < sens:
                    L_tmp = int(sat32((subm * f0binQ7) << 9))
                    ploc = i
                    break
                sens = int(mpy_32_16(sens, 28672))
            if ploc >= 0:
                break
    if ploc >= 0:
        f0est = list(f0est)
        f0est[ploc] = L_tmp
    return f0est


def xsav_read(st, fs_idx):
    """X_sav is aliased onto q_old_d + the head of x_old_tot
    (setup_dec_lc3.c:44-84: PhECU_X_sav_fx = q_old_d_fx, which overflows
    into the serialized x_old_tot buffer).  Compose the live view."""
    Lprot = LPROT[fs_idx]
    qlen = min({0: 80, 1: 160, 2: 240, 3: 320, 4: 400}[fs_idx], Lprot)
    out = [int(v) for v in st.q_old_d[:qlen]]
    out += [int(v) for v in st.x_old_tot[: Lprot - qlen]]
    return out, qlen


def xsav_write(st, vals, fs_idx):
    Lprot = LPROT[fs_idx]
    qlen = min({0: 80, 1: 160, 2: 240, 3: 320, 4: 400}[fs_idx], Lprot)
    for i in range(qlen):
        st.q_old_d[i] = int(vals[i])
    for i in range(Lprot - qlen):
        st.x_old_tot[i] = int(vals[qlen + i])


def spec_ana(st, xfp, fs_idx, output_frame, f0binQ7, norm_corr):
    """spec_ana_fx (plc_phecu_fec_hq_fx.c:795-1080).  Mutates st: plocs,
    f0est, X_sav (aliased, see xsav_write)."""
    Lprot = LPROT[fs_idx]
    hamm2 = 3 * ((output_frame * 3277) >> 15)
    fft_scale = int(T.t("fx_PhEcuFftScale")[fs_idx])
    Lprot2 = Lprot >> 1
    Lprot2p1 = Lprot2 + 1
    rect = Lprot - 2 * hamm2
    win = T.t(_WHR[fs_idx])
    L_xfp = windowing_L(xfp, win, rect, hamm2)
    L_xfp, fft_scale = rfftN(L_xfp, Lprot, fft_scale)
    x = intlv_to_flipped(L_xfp, Lprot)
    if output_frame >= 400:
        stop_start = 320 + 1
        stop_len = 128 - 1
        for i in range(stop_len):
            x[stop_start + i] = 0
    peak_range = min(Lprot2p1, LPROT48K_RED // 2 + 1)
    st.X_sav = list(x)
    xsav_write(st, x, fs_idx)
    mag = fft_spec2_sqrt_approx(x, Lprot)
    mag = mag[:Lprot2p1]
    xmax = max(mag[:peak_range])
    xmin = min(mag[:peak_range])
    sens = _mult_r(int(sat16(xmax - xmin)), CMPLMNT_PLOC_SENS)
    plocs = peak_locator(mag, peak_range, sens, xmax, xmin)
    f0est = []
    n = len(plocs)
    pi = 0
    if n > 0 and plocs[0] == 0:
        fr = imax(mag[0:3], -1)
        f0est.append(int(sat32((plocs[0] << 16) + 2 * fr)))
        pi += 1
        n -= 1
    if n > 0 and plocs[pi] == 1:
        fr = imax(mag[0:3], 0)
        f0est.append(int(sat32((1 << 16) + 2 * fr)))
        pi += 1
        n -= 1
    end_plocs = Lprot2p1 - DELTA_CORR_F0_INT
    if n > 0:
        n_jacob = n
        if end_plocs <= plocs[-1]:
            n_jacob -= 1
        for k in range(n_jacob):
            cur = plocs[pi]
            fr = imax2_jacobsen(st.X_sav[cur - 1: cur + 2],
                                st.X_sav[Lprot - 1 - cur: Lprot + 2 - cur])
            f0est.append(int(sat32((cur << 16) + 2 * fr)))
            pi += 1
        n -= n_jacob
    if n > 0:
        if plocs[pi] == Lprot2p1 - DELTA_CORR_F0_INT:
            fr = imax(mag[Lprot2 - 2: Lprot2 + 1], 0)
            f0est.append(int(sat32((plocs[pi] << 16) + 2 * fr)))
            pi += 1
            n -= 1
        if n > 0:
            fr = imax(mag[Lprot2 - 2: Lprot2 + 1], 1)
            f0est.append(int(sat32((plocs[pi] << 16) + 2 * fr)))
            pi += 1
            n -= 1
    p_in_plocs = 0
    for v in plocs:
        if v < 7:
            p_in_plocs += min(1, v)
    if f0binQ7 > 0 and p_in_plocs > 0:
        n_in = len(plocs)
        plocs, f0est = lf_peak_analysis(plocs, f0est, mag, f0binQ7,
                                        norm_corr, 2, st.max_plocs)
        if n_in == len(plocs):
            f0est = f0_refine_first(plocs, f0est, f0binQ7, norm_corr, 3)
    if 0 < norm_corr < 16384 and len(plocs) > 14 and p_in_plocs > 0:
        plocs = []
        f0est = []
    st.plocs = plocs
    st.f0est = f0est


# ------------------------------------------------------------ subst_spec

def _sincos_lowres(seed):
    """rand_phase_fx (plc_phecu_fec_hq_fx.c:151-177)."""
    tab = T.t("fx_sincos_lowres_tab_sinQ15_fx")
    seed2 = _extract_l(lmac0(13849, seed, 31821))
    sh = (seed2 & 0xFFFF) >> 11
    return seed2, int(tab[sh]), int(tab[sh + 8])


def get_sin_cos_q10(phase):
    """get_sin_cosQ10opt (plc_phecu_fec_hq_fx.c:2565-2621)."""
    tab = T.t("fx_sin_quarterQ15_fx")
    sign_val = (phase & 0x3FF) >> 9
    idx = phase & 0x1FF
    if idx < 256:
        s = int(tab[idx])
    else:
        s = int(tab[512 - idx])
    if sign_val:
        s = -s
    idx2 = (phase + 256) & 0x3FF
    sign_val = idx2 >> 9
    idx2 &= 0x1FF
    if idx2 < 256:
        c = int(tab[idx2])
    else:
        c = int(tab[512 - idx2])
    if sign_val:
        c = -c
    return s, c


def _rotate(re, im, cosF, sinF):
    """rotate_W16_fx."""
    return (_msu_r(_lmult(re, cosF), im, sinF),
            _round16(_lmac(_lmult(re, sinF), im, cosF)))


def _valley_adj(re, im, uni, cosF):
    """valley_magnitude_adj_fx."""
    scale = _round16(_lmac(_lmult(uni, 16384), cosF, 16384))
    scale = _round16(_lmac(16384 << 16, scale, 4096))
    re = _mult_r(scale, _shl16(re, 1))
    im = _mult_r(scale, _shl16(im, 1))
    return re, im


def subst_spec(st, X, mag_chg, alpha, beta, is_trans, output_frame, seed,
               t_adv, time_offs, fs_idx):
    """subst_spec_fx (plc_phecu_fec_hq_fx.c:1085-1460).  Mutates X in
    place; returns seed."""
    gwlpr = GWLPR
    Lprot = LPROT[fs_idx]
    Lprot_inv = INV_LPROT_Q22[fs_idx]
    one_over = ONE_OVER_FRAME_Q15[fs_idx]
    tmp2 = ((time_offs * one_over + 0x4000) >> 15) + 1
    corr_phase = []
    num_plocs = len(st.plocs)
    if is_trans[0] or is_trans[1]:
        num_plocs = 0
        st.plocs = []
        st.f0est = []
    else:
        tmp = int(sat16(t_adv + time_offs)) if t_adv + time_offs < 32768 \
            else 32767
        tmp_L = t_adv + time_offs
        tmp_L = tmp_L if tmp_L < 32768 else 32767  # add_sat Word16
        tmp_L = tmp_L * Lprot_inv
        nl = int(norm_l(tmp_L)) if tmp_L != 0 else 31
        up_adj = max(0, 4 - nl)
        tmp_L2 = int(L_shl(tmp_L, 4 - up_adj))
        tmp = int(round_fx(tmp_L2))
        for m in range(num_plocs):
            v = int(sat32(int(st.f0est[m]) << up_adj))
            # Mpy_32_16_ss (enh40.c:126-155): hi = sat32((v*tmp*2)>>16),
            # lsb = low 16 bits of (v*tmp*2)
            full = v * tmp * 2
            L_acc = int(sat32(full >> 16))
            lsb = full & 0xFFFF
            L_acc = int(sat32((int(sat32(L_acc << 5))) + (lsb >> 11)))
            corr_phase.append(L_acc)
    one_peak_mask = -1
    if 0 < num_plocs < 3:
        one_peak_mask = 0
    noise_mag_scale = (num_plocs == 0) or (time_offs != 0)
    if num_plocs == 0:
        X[0] = 0
        X[Lprot >> 1] = 0
    if tmp2 > BURST_ATT_THRESH + 1:
        X[0] = int(sat16((alpha[0] * X[0]) >> 15))
        X[Lprot >> 1] = int(sat16(
            (alpha[min(fs_idx + LGW8K, LGW48K)] * X[Lprot >> 1]) >> 15))
    lprot2m1 = min((Lprot >> 1) - 1, 320)
    i = 1
    k = 0
    im_ind = Lprot - 1
    pk = st.plocs + [0]
    last_peak = num_plocs - 1
    ploc_prev = pk[0]
    ploc = pk[0]

    def valley_bin(i, im_ind, k, seed):
        sd, sin_F, cos_F = _sincos_lowres(seed)
        tmp, im = _rotate(int(X[i]), int(X[im_ind]), cos_F, sin_F)
        sd2, sin_f2, cos_f2 = _sincos_lowres(sd)
        if noise_mag_scale:
            tmp, im = _valley_adj(tmp, im, sd2, cos_F)
        if beta[k] != 0:
            t2 = _mult_r(beta[k], st.Xavg[k])
            t2 &= one_peak_mask
            tmp &= one_peak_mask
            im &= one_peak_mask
            X[i] = _round16(_lmac(_lmult(alpha[k], tmp), t2, cos_f2))
            X[im_ind] = _round16(_lmac(_lmult(alpha[k], im), t2, sin_f2))
        else:
            tmp &= one_peak_mask
            im &= one_peak_mask
            X[i] = _mult_r(mag_chg[k], tmp)
            X[im_ind] = _mult_r(mag_chg[k], im)
        return sd2

    for m in range(num_plocs):
        ploc_m1 = ploc
        ploc = pk[m]
        ploc1 = pk[m + 1]
        delta_dn = (ploc - ploc_m1 - 1) >> 1
        if m == 0:
            delta_dn = DELTA_CORR
        delta_dn = min(delta_dn, DELTA_CORR)
        delta_up = (ploc1 - ploc - 1) >> 1
        if m >= last_peak:
            delta_up = DELTA_CORR
        delta_up = min(delta_up, DELTA_CORR)
        seg = ploc - delta_dn - i
        for _ in range(max(0, seg)):
            seed = valley_bin(i, im_ind, k, seed)
            i += 1
            im_ind -= 1
            if i >= int(gwlpr[k + 1]):
                k += 1
        e = min(lprot2m1, ploc + delta_up)
        seg = e - (i - 1)
        L_Xph = corr_phase[m]
        xph = ((L_Xph + (1 << 5)) >> 6) & 0x3FF
        p_sin, p_cos = get_sin_cos_q10(xph)
        for _ in range(max(0, seg)):
            seed = _extract_l(lmac0(13849, seed, 31821))
            tmp, im = _rotate(int(X[i]), int(X[im_ind]), p_cos, p_sin)
            sd, sin_F, cos_F = _sincos_lowres(seed)
            seed = sd
            if beta[k] != 0:
                t2 = _mult_r(beta[k], st.Xavg[k])
                X[i] = _round16(_lmac(_lmult(mag_chg[k], tmp), t2, cos_F))
                X[im_ind] = _round16(_lmac(_lmult(mag_chg[k], im), t2, sin_F))
            else:
                X[i] = _mult_r(mag_chg[k], tmp)
                X[im_ind] = _mult_r(mag_chg[k], im)
            i += 1
            im_ind -= 1
            if i > int(gwlpr[k + 1]):
                k += 1
    seg = lprot2m1 - (i - 1)
    for _ in range(max(0, seg)):
        sd, sin_F, cos_F = _sincos_lowres(seed)
        tmp, im = _rotate(int(X[i]), int(X[im_ind]), cos_F, sin_F)
        sd2, sin_f2, cos_f2 = _sincos_lowres(sd)
        seed = sd2
        if noise_mag_scale:
            tmp, im = _valley_adj(tmp, im, sd2, cos_F)
        tmp &= one_peak_mask
        im &= one_peak_mask
        if beta[k] != 0:
            t2 = _mult_r(beta[k], st.Xavg[k])
            t2 &= one_peak_mask
            X[i] = _round16(_lmac(_lmult(alpha[k], tmp), t2, cos_f2))
            X[im_ind] = _round16(_lmac(_lmult(alpha[k], im), t2, sin_f2))
        else:
            X[i] = _mult_r(mag_chg[k], tmp)
            X[im_ind] = _mult_r(mag_chg[k], im)
        i += 1
        im_ind -= 1
        if i > int(gwlpr[k + 1]):
            k += 1
    return seed


# ------------------------------------------------------- reconstruction

def scale_sig_sat(x, exp0):
    """Scale_sig_sat (plc_phecu_tools_fx.c:27-52): shl_sat up, rounded
    shift down."""
    if exp0 == 0:
        return [int(v) for v in x]
    if exp0 > 0:
        return [int(sat16(int(v) << exp0)) for v in x]
    tmp = -(1 << (15 + max(exp0, -15)))
    out = []
    for v in x:
        out.append(_msu_r(0, int(v), tmp))
    return out


def windowing_ola(x, win, length):
    """windowing_ola."""
    return [_mult_r(int(x[i]), int(win[i])) for i in range(length)]


def my_wtda(rec_buf, fs_idx, L):
    """my_wtda_fx (plc_phecu_fec_hq_fx.c:1407-1480): window 20 ms and TDA
    -> Word32 L_ecu_rec[L]."""
    w2 = T.t(_W2MS[fs_idx])
    w16 = T.t(_W16MS[fs_idx])
    n2 = 2 * L // 10
    n16 = 2 * L - n2 - (3 * 2 * L) // 16
    w_audio = [0] * (2 * L)
    for i in range(n2):
        w_audio[i] = _lmult(int(rec_buf[i]), int(w2[i]))
    for i in range(n16):
        w_audio[n2 + i] = _lmult(int(rec_buf[n2 + i]), int(w16[i]))
    L2 = L >> 1
    out = [0] * L
    p3 = L + L2 - 1
    p4 = L + L2
    for i in range(L >> 3):
        out[i] = int(sat32(-int(sat32(w_audio[p3 - i] + w_audio[p4 + i]))))
    for i in range(L >> 3, L2):
        out[i] = int(sat32(-w_audio[p3 - i]))
    p1 = 0
    p2 = L - 1
    for i in range(L2):
        out[L2 + i] = int(sat32(w_audio[p1 + i] - w_audio[p2 - i]))
    return out


def rec_frame(st, X, fs_idx, output_frame, Q, prevsynth, q_ps_minus1):
    """rec_frame_fx + rec_wtda_fx (plc_phecu_fec_hq_fx.c:1530-1712):
    returns L_ecu_rec (Word32 tda, exponent 18 handled by caller)."""
    Lprot = LPROT[fs_idx]
    L_x = flipped_to_intlv(X, Lprot)
    fft_scale = -1
    L_x, fft_scale = irfftN(L_x, Lprot, fft_scale)
    x = [(int(L_shl(int(v), fft_scale)) >> 16) for v in L_x]
    x = [v - 0x10000 if v >= 0x8000 else v for v in
         [vv & 0xFFFF for vv in x]]
    x = scale_sig_sat(x, -Q)
    # rec_wtda
    Lprot2 = Lprot >> 1
    l = output_frame - Lprot2
    rec_buf = [0] * (2 * output_frame)
    for i in range(Lprot):
        rec_buf[l + i] = x[i]
    copy_len = COPY_LEN[fs_idx]
    ola_len = OLA_LEN[fs_idx]
    work_len = copy_len + ola_len
    head = [int(v) for v in prevsynth[Lprot - work_len: Lprot - work_len + copy_len]]
    head = scale_sig_sat(head, -3 - q_ps_minus1)
    for i in range(copy_len):
        rec_buf[i] = head[i]
    ola_old = windowing_ola(prevsynth[Lprot - ola_len:],
                            T.t(_W_OLD[fs_idx]), ola_len)
    ola_old = scale_sig_sat(ola_old, -3 - q_ps_minus1)
    wnew = windowing_ola(rec_buf[copy_len: copy_len + ola_len],
                         T.t(_W_NEW[fs_idx]), ola_len)
    for i in range(ola_len):
        rec_buf[copy_len + i] = int(sat16(wnew[i] + ola_old[i]))
    return my_wtda(rec_buf, fs_idx, output_frame)


def itda_win_ola(L_x_tda, y_e, w, imdct_st, wLen, N):
    """Processing_ITDA_WIN_OLA (imdct_fx.c:185-300): PhECU's synthesis
    window + OLA; mutates imdct_st; returns (x Word16[N], y_e')."""
    z = 2 * N - wLen
    m = N >> 1
    o = m - z
    memLen = wLen - N
    factor_itda = [25905, 18318, 22435, 25905, 31727]
    y = np.asarray(L_x_tda, I64)
    nz = y != 0
    y_s = 0 if not nz.any() else int(
        np.where(nz, norm_l(np.where(nz, y, 1)), 32).min()) & 0x1F
    y_s -= 1
    y_e = (y_e + 1) - y_s
    mem = imdct_st.mem
    nzm = mem != 0
    mem_s = int(np.where(nzm, norm_s(np.where(nzm, mem, 1)), 16).min()) \
        if len(mem) else 16
    if mem_s < 16:
        mem_s -= 1
        imdct_st.mem_e -= mem_s
    else:
        imdct_st.mem_e = 0
    s = imdct_st.mem_e - y_e
    if s > 0:
        y_s -= s
        y_e += s
    else:
        mem_s += s
        imdct_st.mem_e -= s
    fs_idx = (N * 331) >> 15
    w_factor = factor_itda[fs_idx]
    w = np.asarray(w, I64)
    x = np.empty(wLen, I64)
    from .fixed_dec import L_shl as _Lshl
    i = np.arange(o)
    tw = sat16((w[4 * m - 1 - i - z] * w_factor + 0x4000) >> 15)
    x[:o] = round_fx(sat32(
        L_shl(mem[:o] << 16, mem_s)
        - mpy_32_16(_Lshl(y[m + i + z], y_s), tw)))
    i = np.arange(m)
    tw = sat16((w[3 * m - 1 - i] * w_factor + 0x4000) >> 15)
    x[o:o + m] = round_fx(sat32(
        L_shl(mem[o:o + m] << 16, mem_s)
        + mpy_32_16(_Lshl(y[2 * m - 1 - i], y_s), tw)))
    tw = sat16((w[m - 1 - i] * w_factor + 0x4000) >> 15)
    x[3 * m - z: 4 * m - z] = round_fx(sat32(-mpy_32_16(
        _Lshl(y[i], y_s), tw)))
    tw = sat16((w[m + i] * w_factor + 0x4000) >> 15)
    x[3 * m - z - 1 - i] = round_fx(sat32(-mpy_32_16(
        _Lshl(y[i], y_s), tw)))
    imdct_st.mem = x[N: N + memLen].copy()
    imdct_st.mem_e = y_e
    return x[:N].copy(), y_e


def hq_phase_ecu(st, prevsynth, prev_bfi, fs_idx, output_frame,
                 f0binQ7, norm_corr, q_fx_old_exp, margin_prevsynth):
    """hq_phase_ecu_fx (plc_phecu_fec_hq_fx.c:1714-1963): returns
    (L_ecu_rec, Q_spec used)."""
    lprot = LPROT[fs_idx]
    if prev_bfi == 0:
        st.time_offs = 0
        ps_up = margin_prevsynth - 1
        st.X_savQ = 15 - (q_fx_old_exp - ps_up)
        q_ps_minus1 = 15 - (q_fx_old_exp + 1)
        xfp = scale_sig_sat([int(v) for v in prevsynth], ps_up)
        mag_chg, alpha, beta = trans_burst_ana(st, fs_idx, output_frame,
                                               st.time_offs, st.X_savQ)
        spec_ana(st, xfp, fs_idx, output_frame, f0binQ7, norm_corr)
    else:
        q_ps_minus1 = 15 - (q_fx_old_exp + 1)
        st.time_offs = min(st.time_offs + output_frame, 32767)
        mag_chg, alpha, beta = trans_burst_ana(st, fs_idx, output_frame,
                                               st.time_offs, 0)
    X, _ = xsav_read(st, fs_idx)
    seed = st.time_offs
    is_trans = [st.short_flag_prev, st.short_flag_prev]
    subst_spec(st, X, mag_chg, alpha, beta, is_trans, output_frame, seed,
               st.t_adv, st.time_offs, fs_idx)
    return rec_frame(st, X, fs_idx, output_frame, st.X_savQ,
                     prevsynth, q_ps_minus1)


def phase_ecu(plc, imdct_st, w, cfg, ltpf):
    """Conceal method 2 top level (plc_apply_fx.c case 2)."""
    fs_idx = cfg.fs_idx
    lprot = LPROT[fs_idx]
    mlen = plc.max_len_pcm
    prev_bfi = 0 if plc.prev_bfi == 2 else plc.prev_bfi
    if prev_bfi == 0:
        plc.f0hz_ltp_bin = set_f0hz(fs_idx, ltpf.pitch_int, ltpf.pitch_fr)
        rect = int(T.t("fx_rectLengthTab")[fs_idx])
        nfr = LPROT[fs_idx]
        left = plc.x_old_tot[mlen - (nfr + rect): mlen - rect] if False \
            else plc.x_old_tot[mlen - (nfr + rect):]
        # left window: 16+16 ms separated by 10 ms (plc_apply_fx.c:119-131)
        update_xfp_w_e_hist(plc, 0, 0,
                            plc.x_old_tot[mlen - (nfr + rect):],
                            plc.q_fx_old_exp, 0, fs_idx)
        update_xfp_w_e_hist(plc, 0, 0, plc.x_old_tot[mlen - lprot:],
                            plc.xfp_exp, plc.margin_xfp, fs_idx)
    prevsynth = plc.x_old_tot[mlen - lprot:]
    L_ecu = hq_phase_ecu(plc, prevsynth, prev_bfi, fs_idx,
                         cfg.frame_length, plc.f0hz_ltp_bin,
                         plc.norm_corr, plc.q_fx_old_exp, plc.margin_xfp)
    y_e = 18
    x, y_e = itda_win_ola(L_ecu, y_e, w, imdct_st, len(w), cfg.frame_length)
    return x, y_e
