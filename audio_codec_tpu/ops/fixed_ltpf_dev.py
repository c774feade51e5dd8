"""Batched device port of the integer-exact LTPF decoder post-filter.

Host oracle: ops/fixed_ltpf.py (ltpf_decoder_fx.c:16-316). Lanes carry
independent streams; per-frame Python branches (parameter decode, the four
synthesis-phase patterns, history rescaling) become masks, and the serial
tap recursion runs as a lax.scan over samples with the output history as
carry — writes are per-step dynamic column updates (aliased by XLA), reads
are per-lane take_along_axis gathers at the pitch lag.

Requires jax_enable_x64 (see ops/fixed_dev.py)."""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .. import tables as T
from . import fixed_dec as fd
from .fixed_ltpf import _FADE_STEP, mem_lens, scale_fac_idx_for  # noqa: F401

I64 = np.int64


def _lmult(a, b):
    return fd.sat32((jnp.asarray(a, I64) * jnp.asarray(b, I64)) << 1)


def _lmac(L, a, b):
    return fd.sat32(L + _lmult(a, b))


def _lmsu(L, a, b):
    return fd.sat32(L - _lmult(a, b))


def _round16(L):
    return fd.sat16(fd.sat32(L + 0x8000) >> 16)


def _msu_r(L, a, b):
    return _round16(_lmsu(L, a, b))


def _mult_r(a, b):
    return fd.sat16((jnp.asarray(a, I64) * jnp.asarray(b, I64) + 0x4000)
                    >> 15)


def _add16(a, b):
    return fd.sat16(jnp.asarray(a, I64) + jnp.asarray(b, I64))


def _shl16(x, s):
    x = jnp.asarray(x, I64)
    s = jnp.asarray(s, I64)
    left = fd.sat16(x << jnp.clip(s, 0, 31))
    right = x >> jnp.clip(-s, 0, 31)
    return jnp.where(s >= 0, left, right)


def _scale_sig(x, s):
    """Scale_sig batched: x [B, L], s [B] (0 = identity; >0 saturating
    shl; <0 rounded shr via msu_r against -2^(15+s))."""
    x = jnp.asarray(x, I64)
    s = jnp.asarray(s, I64)[:, None]
    up = jnp.clip(x << jnp.clip(s, 0, 31), -32768, 32767)
    sneg = jnp.maximum(s, -15)
    tmp = -(jnp.full_like(x, 1) << (15 + sneg))
    prod = fd.sat32(-((x * tmp) << 1))
    down = fd.sat16(fd.sat32(prod + 0x8000) >> 16)
    return jnp.where(s == 0, x, jnp.where(s > 0, up, down)).astype(I64)


def _headroom16_0(x):
    nz = x != 0
    n = jnp.where(nz, fd.norm_s(jnp.where(nz, x, 1)), 16)
    mn = jnp.min(n, axis=1) if x.shape[1] else jnp.full(x.shape[:1], 16, I64)
    return jnp.where(nz.any(axis=1), mn, 16)


def _headroom16(x):
    h = _headroom16_0(x) & 0xF
    return jnp.where((x != 0).any(axis=1), h, 0)


class LtpfDevState:
    """Pytree of per-lane LTPF history."""

    def __init__(self, fs, B):
        x_len, y_len = mem_lens(fs)
        self.x_len, self.y_len = x_len, y_len
        self.tree = dict(
            old_x=jnp.zeros((B, x_len), I64),
            old_y=jnp.zeros((B, y_len), I64),
            old_e=jnp.zeros((B,), I64),
            pitch_int=jnp.zeros((B,), I64),
            pitch_fr=jnp.zeros((B,), I64),
            gain=jnp.zeros((B,), I64),
            mem_active=jnp.zeros((B,), I64),
            old_sfi=jnp.full((B,), -1, I64),
        )


def _filter_coefs(fs_idx, pitch_fr, sfi):
    """(inter row [B, ilen], tilt row [B, tlen+1], ilen, tlen, shift)."""
    inter = jnp.asarray(np.asarray(T.t("fx_inter_filter")[fs_idx], I64))
    ilen = int(T.t("fx_inter_filter_len")[fs_idx])
    shift = int(T.t("fx_inter_filter_shift")[fs_idx])
    tilt = jnp.asarray(np.asarray(T.t("fx_tilt_filter")[fs_idx], I64))
    tlen = int(T.t("fx_tilt_filter_len")[fs_idx])
    ic = jnp.take(inter[:, :ilen], jnp.clip(pitch_fr, 0,
                                            inter.shape[0] - 1), axis=0)
    tc = jnp.take(tilt[:, :tlen + 1], jnp.clip(sfi, 0,
                                               tilt.shape[0] - 1), axis=0)
    return ic, tc, ilen, tlen, shift


def _synth_filter(ybuf, ybase, xwin, length, pitch_int, gain, ic, tc,
                  ilen, tlen, shift, fade_mode, step_len, active):
    """ltpf_synth_filter batched. ybuf [B, W] carry; xwin [B, length,
    tlen+1] input taps (xwin[:, j, l] = x[xbase + j - l]); fade_mode [B]
    in {-1, 0, +1} (alpha ramp down / none / up); active [B] masks lanes.
    Returns updated ybuf."""
    B, W = ybuf.shape
    x0 = ybase - pitch_int + shift       # [B] per-lane tap base
    step = jnp.where(fade_mode < 0, -_FADE_STEP[step_len],
                     jnp.where(fade_mode > 0, _FADE_STEP[step_len], 0))
    alpha0 = jnp.where(fade_mode < 0, 0x7FFF, 0)
    l_off = jnp.arange(ilen, dtype=I64)[None, :]

    def body(carry, inp):
        ybuf, alpha = carry
        j, xw = inp                       # xw [B, tlen+1]
        yidx = jnp.clip(x0[:, None] + j - l_off, 0, W - 1)
        ytap = jnp.take_along_axis(ybuf, yidx, axis=1)   # [B, ilen]
        s = _lmult(ytap[:, 0], ic[:, 0])
        for l in range(1, ilen):
            s = _lmac(s, ytap[:, l], ic[:, l])
        for l in range(tlen):
            s = _lmsu(s, xw[:, l], tc[:, l])
        i16 = _msu_r(s, xw[:, tlen], tc[:, tlen])
        k16 = _mult_r(gain, i16)
        k16 = jnp.where(fade_mode != 0, _mult_r(k16, alpha), k16)
        val = _add16(xw[:, 0], k16)
        col = ybase + j
        prev = jax.lax.dynamic_slice(ybuf, (0, col), (B, 1))[:, 0]
        outv = jnp.where(active, val, prev)
        ybuf = jax.lax.dynamic_update_slice(ybuf, outv[:, None], (0, col))
        alpha = jnp.where(active & (fade_mode != 0),
                          _add16(alpha, step), alpha)
        return (ybuf, alpha), None

    (ybuf, _), _ = jax.lax.scan(
        body, (ybuf, alpha0),
        (jnp.arange(length, dtype=I64), jnp.swapaxes(xwin, 0, 1)))
    return ybuf


def _windows(xarr, base, length, tlen):
    """xwin[:, j, l] = xarr[:, base + j - l] for l in 0..tlen."""
    cols = []
    for l in range(tlen + 1):
        cols.append(jax.lax.dynamic_slice_in_dim(
            xarr, base - l, length, axis=1))
    return jnp.stack(cols, axis=2)


def ltpf_decode(st: dict, x_len, y_len, x_in, x_e, fs_idx, L, ltpf,
                ltpf_active, pitch_index, scale_fac_idx, bfi=None,
                conceal_method=None, damping=None):
    """process_ltpf_decoder_fx batched over [B] lanes.

    st: LtpfDevState.tree dict; x_in [B, L]; x_e [B]; ltpf/ltpf_active/
    pitch_index [B]; scale_fac_idx static int (clean-decode path).
    Returns (y_out [B, L], x_e', new_state_dict)."""
    B = x_in.shape[0]
    z = lambda: jnp.zeros((B,), I64)
    ltpf = jnp.asarray(ltpf, I64)
    ltpf_active = jnp.asarray(ltpf_active, I64)
    pitch_index = jnp.asarray(pitch_index, I64)
    x_e = jnp.asarray(x_e, I64)
    sfi = jnp.full((B,), scale_fac_idx, I64)
    if bfi is None:
        bfi = z()
    # --- parameter decode (clean frames; concealment lanes keep memory)
    p1 = (pitch_index + 64) >> 2
    f1 = pitch_index - (p1 << 2) + 128
    p2 = (pitch_index - 126) >> 1
    f2 = (pitch_index << 1) - (p2 << 2) - 252
    p3 = pitch_index - 283
    pitch_int = jnp.where(pitch_index < 380, p1,
                          jnp.where(pitch_index < 440, p2, p3))
    pitch_fr = jnp.where(pitch_index < 380, f1,
                         jnp.where(pitch_index < 440, f2, 0))
    ps = int(T.t("fx_pitch_scale")[fs_idx])
    pitch = _mult_r(_shl16((pitch_int << 2) + pitch_fr, 2), ps)
    pitch_int = jnp.where(ltpf != 0, pitch >> 2, 0)
    pitch_fr = jnp.where(ltpf != 0, pitch - ((pitch >> 2) << 2), 0)
    if scale_fac_idx < 0:
        ltpf_active = z()
    gain = jnp.where(ltpf_active != 0,
                     int(T.t("fx_gain_scale_fac")[scale_fac_idx]
                         if scale_fac_idx >= 0 else 0), 0)

    x_in = jnp.asarray(x_in, I64)
    passthrough = (ltpf_active == 0) & (st["mem_active"] == 0)

    # ---------- passthrough history update (vectorized branch A)
    sA = st["old_e"] - x_e
    oy = st["old_y"]
    shifted_tail = jnp.concatenate([oy[:, L:], jnp.zeros((B, L), I64)],
                                   axis=1)
    # s > 0: old_y keeps scale, new frame shifted down by s
    xin_dn = jnp.where((sA > 15)[:, None], 0,
                       x_in >> jnp.clip(sA, 0, 63)[:, None])
    oyA_pos = jnp.concatenate([oy[:, L:], xin_dn], axis=1)
    oxA_pos = xin_dn[:, L - x_len:]
    # s <= 0: history rescaled to the new exponent
    oy_shift = jnp.where((sA < -15)[:, None], 0,
                         jnp.where((sA < 0)[:, None],
                                   fd.sat16(oy[:, L:] >> jnp.clip(
                                       -sA, 0, 63)[:, None]),
                                   jnp.clip(oy[:, L:] << jnp.clip(
                                       sA, 0, 63)[:, None],
                                       -32768, 32767)))
    oyA_neg = jnp.concatenate([oy_shift, x_in], axis=1)
    oxA_neg = x_in[:, L - x_len:]
    posA = (sA > 0)[:, None]
    oyA = jnp.where(posA, oyA_pos, oyA_neg)
    oxA = jnp.where(posA, oxA_pos, oxA_neg)
    oeA = jnp.where(sA > 0, st["old_e"], x_e)
    del shifted_tail

    # ---------- filter path (branch B)
    N4 = int(T.t("fx_ltpf_overlap_len")[fs_idx])
    N34 = L - N4
    xbuf = jnp.concatenate([st["old_x"], x_in], axis=1)
    ybuf = jnp.concatenate([st["old_y"], jnp.zeros((B, L), I64)], axis=1)
    xbase, ybase = x_len, y_len

    s0 = jnp.minimum(_headroom16_0(st["old_x"]),
                     _headroom16_0(st["old_y"])) - 1
    old_e = st["old_e"] - s0
    s1 = _headroom16(xbuf[:, xbase:]) - 1
    x_eB = x_e - s1
    sB = old_e - x_eB
    posB = sB > 0
    x_scale = jnp.where(posB, s1 - sB, s1)
    h_scale = jnp.where(posB, s0, s0 + sB)
    x_eB = jnp.where(posB, old_e, x_eB)
    xbuf = jnp.concatenate([_scale_sig(xbuf[:, :xbase], h_scale),
                            _scale_sig(xbuf[:, xbase:], x_scale)], axis=1)
    ybuf = jnp.concatenate([_scale_sig(ybuf[:, :ybase], h_scale),
                            ybuf[:, ybase:]], axis=1)

    # four first-phase patterns
    same = (pitch_int == st["pitch_int"]) & (pitch_fr == st["pitch_fr"])
    pat1 = (ltpf_active == 0) & ~passthrough
    pat2 = (ltpf_active != 0) & (st["mem_active"] == 0)
    pat3 = (ltpf_active != 0) & (st["mem_active"] != 0) & same
    pat4 = (ltpf_active != 0) & (st["mem_active"] != 0) & ~same

    use_old = pat1 | pat4
    old_sfi_eff = jnp.where(st["old_sfi"] >= 0, st["old_sfi"], 0)
    pfr_A = jnp.where(use_old, st["pitch_fr"], pitch_fr)
    pint_A = jnp.where(use_old, st["pitch_int"], pitch_int)
    gain_A = jnp.where(use_old, st["gain"], gain)
    sfi_A = jnp.where(use_old, old_sfi_eff, sfi)
    fade_A = jnp.where(pat1 | pat4, -1, jnp.where(pat2, 1, 0))
    icA, tcA, ilen, tlen, shift = _filter_coefs(fs_idx, pfr_A, sfi_A)
    xwin = _windows(xbuf, xbase, N4, tlen)
    actA = ~passthrough
    ybuf = _synth_filter(ybuf, ybase, xwin, N4, pint_A, gain_A, icA, tcA,
                         ilen, tlen, shift, fade_A, N4, actA)
    # crossfade second pass: input = pass-A output region
    icB, tcB, _, _, _ = _filter_coefs(fs_idx, pitch_fr, sfi)
    zwin = _windows(ybuf, ybase, N4, tlen)
    ybuf = _synth_filter(ybuf, ybase, zwin, N4, pitch_int, gain, icB, tcB,
                         ilen, tlen, shift, jnp.full((B,), 1, I64), N4,
                         pat4)
    # phase 2 over N34
    xwin2 = _windows(xbuf, xbase + N4, N34, tlen)
    act2 = (ltpf_active > 0) & ~passthrough
    ybuf = _synth_filter(ybuf, ybase + N4, xwin2, N34, pitch_int, gain,
                         icB, tcB, ilen, tlen, shift, z(), N4, act2)
    # inactive lanes copy the input into the second region
    tail = jnp.where(act2[:, None], ybuf[:, ybase + N4:],
                     xbuf[:, xbase + N4:])
    ybuf = jnp.concatenate([ybuf[:, :ybase + N4], tail], axis=1)

    y_outB = ybuf[:, ybase:]
    oxB = xbuf[:, L:]
    oyB = ybuf[:, L:]

    # ---------- merge branches
    pt = passthrough[:, None]
    y_out = jnp.where(pt, x_in, y_outB)
    new = dict(
        old_x=jnp.where(pt, oxA, oxB),
        old_y=jnp.where(pt, oyA, oyB),
        old_e=jnp.where(passthrough, oeA, x_eB),
        pitch_int=pitch_int,
        pitch_fr=pitch_fr,
        gain=jnp.where(passthrough, z(), gain),
        mem_active=jnp.where(passthrough, z(), ltpf_active),
        old_sfi=sfi,
    )
    x_e_out = jnp.where(passthrough, x_e, x_eB)
    return y_out, x_e_out, new
