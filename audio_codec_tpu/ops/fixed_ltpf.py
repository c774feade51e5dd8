"""Integer-exact LTPF decoder post-filter (ltpf_decoder_fx.c:16-316).

Last stage of the bit-exact decode path before output rounding: a
pitch-lag IIR comb filter over Word16 time samples with per-frame
exponent alignment, crossfade on parameter change, and a 3-buffer
history (x input tail, y output history, exponent).  The synthesis
recursion reads its own recent output (lag < frame length), so the tap
loop is inherently serial; it runs here in exact BASOP Word16/Word32
arithmetic (saturating L_mac/L_msu chains, mult_r/msu_r rounding).

Verified bit-exact per frame against the instrumented fixed-point
oracle (tests/test_fixed_dec.py::test_ltpf / test_full_decode).
"""
from __future__ import annotations

import numpy as np

from .. import tables as T
from .fixed_dec import I64, sat16, sat32, norm_s

MIN32, MAX32 = -(1 << 31), (1 << 31) - 1


def _lmult(a, b):
    v = (a * b) << 1
    return MAX32 if v > MAX32 else (MIN32 if v < MIN32 else v)


def _lmac(L, a, b):
    v = L + _lmult(a, b)
    return MAX32 if v > MAX32 else (MIN32 if v < MIN32 else v)


def _lmsu(L, a, b):
    v = L - _lmult(a, b)
    return MAX32 if v > MAX32 else (MIN32 if v < MIN32 else v)


def _round16(L):
    v = L + 0x8000
    v = MAX32 if v > MAX32 else (MIN32 if v < MIN32 else v)
    v >>= 16
    return 32767 if v > 32767 else (-32768 if v < -32768 else v)


def _msu_r(L, a, b):
    return _round16(_lmsu(L, a, b))


def _mult_r(a, b):
    v = (a * b + 0x4000) >> 15
    return 32767 if v > 32767 else (-32768 if v < -32768 else v)


def _add16(a, b):
    v = a + b
    return 32767 if v > 32767 else (-32768 if v < -32768 else v)


def _shl16(x, s):
    if s >= 0:
        v = x << min(s, 31)
        return 32767 if v > 32767 else (-32768 if v < -32768 else v)
    return x >> min(-s, 31)


def _scale_sig(x, s):
    """Scale_sig (basop_util.c:571-595): saturating shl for s>0, ROUNDED
    shift right for s<0 (msu_r against -2^(15+s))."""
    if s == 0 or len(x) == 0:
        return x
    if s > 0:
        lo = x << s
        return np.clip(lo, -32768, 32767).astype(I64)
    s = max(s, -15)
    # msu_r(0, x, -(2^(15+s))): rounded x >> -s
    tmp = -(1 << (15 + s))
    prod = sat32(-((x * tmp) << 1))
    v = sat32(prod + 0x8000) >> 16
    return sat16(v)


def _headroom16_0(x):
    """getScaleFactor16_0: min headroom, 16 if all zero."""
    if len(x) == 0 or not np.any(x):
        return 16
    nz = x != 0
    return int(np.where(nz, norm_s(np.where(nz, x, 1)), 16).min())


def _headroom16(x):
    """getScaleFactor16: same but 0 if all zero (basop_util.c:286-316)."""
    if not np.any(x):
        return 0
    return _headroom16_0(x) & 0xF


_FADE_STEP = {20: 1638, 40: 819, 60: 546, 80: 409, 120: 273}


def mem_lens(fs):
    """ltpf_mem_x_len / ltpf_mem_y_len (setup_dec_lc3.c:105-107)."""
    f = max(16000, fs)
    x_len = ((f * 16778) >> 15 >> 11) - 2
    y_len = ((((fs * 18678) >> 15) - 1) >> 5) + 1 + ((f * 16778) >> 15 >> 12)
    return x_len, y_len


def scale_fac_idx_for(total_bits, fs_idx, frame_dms=100):
    """ltpf_scale_fac_idx derivation (setup_dec_lc3.c:280-332)."""
    tmp = 80 * fs_idx
    tb = total_bits
    if frame_dms == 25:
        tb = (19661 * total_bits) >> 13
    elif frame_dms == 50:
        tb = total_bits * 2 - 160
    for idx, thr in enumerate((320, 400, 480, 560)):
        if tb < thr + tmp:
            return idx
    return -1


class LtpfState:
    def __init__(self, fs):
        self.x_len, self.y_len = mem_lens(fs)
        self.old_x = np.zeros(self.x_len, I64)
        self.old_y = np.zeros(self.y_len, I64)
        self.old_e = 0
        self.pitch_int = 0
        self.pitch_fr = 0
        self.gain = 0
        self.mem_active = 0
        self.old_scale_fac_idx = -1


def _synth_filter(ybuf, ybase, xarr, xbase, length, pitch_int, pitch_fr,
                  gain, scale_fac_idx, fs_idx, fade):
    """ltpf_synth_filter (ltpf_decoder_fx.c:244-316).  ybuf holds output
    history before ybase; xarr holds input history before xbase."""
    inter = T.t("fx_inter_filter")[fs_idx][pitch_fr >> 0]
    ilen = int(T.t("fx_inter_filter_len")[fs_idx])
    shift = int(T.t("fx_inter_filter_shift")[fs_idx])
    tilt = T.t("fx_tilt_filter")[fs_idx][scale_fac_idx]
    tlen = int(T.t("fx_tilt_filter_len")[fs_idx])
    ic = [int(inter[l]) for l in range(ilen)]
    tc = [int(tilt[l]) for l in range(tlen + 1)]
    alpha, step = 0, 0
    if fade:
        alpha = 0x7FFF if fade < 0 else 0
        step = _FADE_STEP[length]
        if fade < 0:
            step = -step
    x0 = ybase - pitch_int + shift
    yb = ybuf
    xa = xarr
    for j in range(length):
        s = _lmult(int(yb[x0 + j]), ic[0])
        for l in range(1, ilen):
            s = _lmac(s, int(yb[x0 + j - l]), ic[l])
        for l in range(tlen):
            s = _lmsu(s, int(xa[xbase + j - l]), tc[l])
        i = _msu_r(s, int(xa[xbase + j - tlen]), tc[tlen])
        k = _mult_r(gain, i)
        if fade:
            k = _mult_r(k, alpha)
        yb[ybase + j] = _add16(int(xa[xbase + j]), k)
        if fade:
            alpha = _add16(alpha, step)


def ltpf_decode(st: LtpfState, x_in, x_e, fs_idx, L_frame, ltpf, ltpf_active,
                pitch_index, scale_fac_idx, bfi=0, conceal_method=0,
                damping=32767):
    """process_ltpf_decoder_fx (ltpf_decoder_fx.c:22-240): returns
    (y_out Word16 [L_frame], x_e')."""
    pitch_int = pitch_fr = gain = 0
    if bfi == 1 and conceal_method == 0:
        ltpf = ltpf_active = 0
    if bfi != 1:
        if ltpf:
            if pitch_index < 380:
                pitch_int = (pitch_index + 64) >> 2
                pitch_fr = pitch_index - (pitch_int << 2) + 128
            elif pitch_index < 440:
                pitch_int = (pitch_index - 126) >> 1
                pitch_fr = (pitch_index << 1) - (pitch_int << 2) - 252
            else:
                pitch_int = pitch_index - 283
                pitch_fr = 0
            pitch = (pitch_int << 2) + pitch_fr
            ps = int(T.t("fx_pitch_scale")[fs_idx])
            pitch = _mult_r(_shl16(pitch, 2), ps)
            pitch_int = pitch >> 2
            pitch_fr = pitch - (pitch_int << 2)
        if scale_fac_idx < 0:
            ltpf_active = 0
        gain = (int(T.t("fx_gain_scale_fac")[scale_fac_idx])
                if ltpf_active else 0)
    elif conceal_method > 0:
        if scale_fac_idx < 0 and st.mem_active and st.old_scale_fac_idx >= 0:
            scale_fac_idx = st.old_scale_fac_idx
        ltpf_active = st.mem_active
        if conceal_method == 2:
            ltpf_active = 0
        pitch_int, pitch_fr = st.pitch_int, st.pitch_fr
        gain = _mult_r(st.gain, damping)

    L = L_frame
    x_in = np.asarray(x_in, I64)
    if ltpf_active == 0 and st.mem_active == 0:
        y_out = x_in.copy()
        s = st.old_e - x_e
        if s > 0:
            st.old_y[: st.y_len - L] = st.old_y[L:]
            if s > 15:
                st.old_y[st.y_len - L:] = 0
                st.old_x[:] = 0
            else:
                st.old_y[st.y_len - L:] = x_in >> s
                st.old_x[:] = x_in[L - st.x_len:] >> s
        else:
            if s < -15:
                st.old_y[: st.y_len - L] = 0
            else:
                st.old_y[: st.y_len - L] = sat16(
                    st.old_y[L:] >> -s) if s < 0 else np.clip(
                    st.old_y[L:] << s, -32768, 32767)
            st.old_y[st.y_len - L:] = x_in
            st.old_x[:] = x_in[L - st.x_len:]
            st.old_e = x_e
        st.pitch_int, st.pitch_fr = pitch_int, pitch_fr
        st.gain = 0
        st.mem_active = 0
        st.old_scale_fac_idx = scale_fac_idx
        return y_out, x_e

    N4 = int(T.t("fx_ltpf_overlap_len")[fs_idx])
    N34 = L - N4
    tlen = int(T.t("fx_tilt_filter_len")[fs_idx])

    xbuf = np.concatenate([st.old_x, x_in])
    ybuf = np.concatenate([st.old_y, np.zeros(L, I64)])
    xbase, ybase = st.x_len, st.y_len

    s0 = min(_headroom16_0(st.old_x), _headroom16_0(st.old_y)) - 1
    st.old_e -= s0
    s1 = _headroom16(xbuf[xbase:]) - 1
    x_e -= s1
    s = st.old_e - x_e
    if s > 0:
        xbuf[xbase:] = _scale_sig(xbuf[xbase:], s1 - s)
        xbuf[:xbase] = _scale_sig(xbuf[:xbase], s0)
        ybuf[:ybase] = _scale_sig(ybuf[:ybase], s0)
        x_e = st.old_e
    else:
        xbuf[xbase:] = _scale_sig(xbuf[xbase:], s1)
        xbuf[:xbase] = _scale_sig(xbuf[:xbase], s0 + s)
        ybuf[:ybase] = _scale_sig(ybuf[:ybase], s0 + s)
        st.old_e = x_e

    if ltpf_active == 0:
        _synth_filter(ybuf, ybase, xbuf, xbase, N4, st.pitch_int,
                      st.pitch_fr, st.gain, st.old_scale_fac_idx, fs_idx, -1)
    elif st.mem_active == 0:
        _synth_filter(ybuf, ybase, xbuf, xbase, N4, pitch_int, pitch_fr,
                      gain, scale_fac_idx, fs_idx, 1)
    elif pitch_int == st.pitch_int and pitch_fr == st.pitch_fr:
        _synth_filter(ybuf, ybase, xbuf, xbase, N4, pitch_int, pitch_fr,
                      gain, scale_fac_idx, fs_idx, 0)
    else:
        _synth_filter(ybuf, ybase, xbuf, xbase, N4, st.pitch_int,
                      st.pitch_fr, st.gain, st.old_scale_fac_idx, fs_idx, -1)
        z = ybuf[ybase - tlen: ybase + N4].copy()
        _synth_filter(ybuf, ybase, z, tlen, N4, pitch_int, pitch_fr,
                      gain, scale_fac_idx, fs_idx, 1)
    if ltpf_active > 0:
        _synth_filter(ybuf, ybase + N4, xbuf, xbase + N4, N34, pitch_int,
                      pitch_fr, gain, scale_fac_idx, fs_idx, 0)
    else:
        ybuf[ybase + N4:] = xbuf[xbase + N4:]

    y_out = ybuf[ybase:].copy()
    st.old_x = xbuf[L:].copy()
    st.old_y = ybuf[L:].copy()
    st.pitch_int, st.pitch_fr = pitch_int, pitch_fr
    st.gain = gain
    st.mem_active = ltpf_active
    st.old_scale_fac_idx = scale_fac_idx
    return y_out, x_e
