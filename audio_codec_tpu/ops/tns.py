"""Temporal Noise Shaping (TNS): analysis, quantization, lattice filters.

Reference: processTnsCoder_fl (tns_coder.c:157-362) and processTnsDecoder_fl
(tns_decoder.c:13-51). The per-stream-dynamic subdivision boundaries (they
depend on the detected bandwidth) are handled with masked reductions instead
of ragged loops; Levinson-Durbin and the RC step-down recursion are unrolled
at the fixed max order 8; the spectral lattice filters run as a lax.scan over
frequency bins with [B, 8] lattice state (matching the reference's state
carry-over between the two filters, tns_coder.c:330-356).
"""
from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from .. import tables as T
from ..config import Config

F32 = jnp.float32
MAXLAG = 8


def _tns_geometry(cfg: Config):
    """Static pieces of the filter geometry (tns_coder.c:199-263)."""
    N = cfg.frame_length
    fs = cfg.fs
    if N > 4 * cfg.frame_dms:
        N = 4 * cfg.frame_dms
        fs = 40000
    numfilters_max = 2 if (cfg.fs >= 32000 and cfg.frame_dms >= 50) else 1
    startfreq0 = math.floor(600 * N * 2 / fs) + 1
    max_order = 8 if cfg.frame_dms == 100 else 4
    n_sub = 3 if cfg.frame_dms == 100 else 2
    nbits = cfg.total_bits
    limited = (cfg.frame_dms >= 50 and nbits >= 48 * cfg.frame_dms // 10) or cfg.frame_dms == 25
    max_pg = 1.5 if limited else 2.0
    order_bits = T.t("order1_tns") if limited else T.t("order2_tns")
    return N, startfreq0, numfilters_max, max_order, n_sub, max_pg, order_bits


def _levinson(r, order: int):
    """Batched Levinson-Durbin (tns_coder.c levinsonDurbin): r [B, order+1] →
    (lpc [B, order+1] with lpc[0]=1, rc [B, order], err [B])."""
    g = r[:, 1] / r[:, 0]
    a = [g]  # out_lev coefficients, a[0] newest
    v = (1.0 - g * g) * r[:, 0]
    rc = [-g]
    for t in range(1, order):
        s = sum(a[i] * r[:, i + 1] for i in range(t))
        g = (r[:, t + 1] - s) / v
        a = [g] + [a[j - 1] - g * a[t - j] for j in range(1, t + 1)]
        v = v * (1 - g * g)
        rc.append(-g)
    # reorder into polynomial [1, -a_reversed...] (tns_coder.c:88-100)
    lpc = jnp.stack([jnp.ones_like(v)] + [-a[order - 1 - i] for i in range(order - 1)]
                    + [rc[order - 1]], axis=-1)
    return lpc, jnp.stack(rc, axis=-1), v


def _poly2rc(a, order: int):
    """Batched poly2rc via levdown (tns_coder.c:104-187): a [B, order+1]
    (a[0]==1) → rc [B, order]."""
    out = [None] * order
    cur = a
    n = order
    out[order - 1] = cur[:, order]
    for k in range(order - 2, -1, -1):
        # levdown: drop leading 1, peel last coefficient
        knxt = cur[:, n]
        denom = 1.0 - jnp.abs(knxt) ** 2
        nxt = [(cur[:, i + 1] - knxt * cur[:, n - 1 - i]) / denom for i in range(n - 1)]
        cur = jnp.stack([jnp.ones_like(knxt)] + nxt, axis=-1)
        n -= 1
        out[k] = cur[:, n]
    return jnp.stack(out, axis=-1)


def tns_encode(cfg: Config, x, bw_idx):
    """TNS analysis + filtering.

    x: [B, N] shaped spectrum; bw_idx: [B] i32 bandwidth index.
    Returns (x_filt [B, N], order [B, 2] i32, rc_idx [B, 2, 8] i32,
             numfilters [B] i32, bits [B] i32).
    """
    B, Nfull = x.shape
    Nred, startfreq0, nf_max, max_order, n_sub, max_pg, order_bits_tab = _tns_geometry(cfg)
    cutoff_name = {100: "BW_cutoff_bin_all", 50: "BW_cutoff_bin_all_5ms",
                   25: "BW_cutoff_bin_all_2_5ms"}[cfg.frame_dms]
    cutoffs = jnp.asarray(T.t(cutoff_name), jnp.int32)
    bw_fcbin = cutoffs[bw_idx]                                    # [B]

    two_filters = (bw_idx >= 3) & (nf_max == 2)
    numfilters = jnp.where(two_filters, 2, 1).astype(jnp.int32)
    # per-filter start/stop (1-based bins, inclusive stop; tns_coder.c:244-263)
    start0 = jnp.full((B,), startfreq0, jnp.int32)
    stop0 = jnp.where(two_filters, bw_fcbin // 2, bw_fcbin)
    start1 = bw_fcbin // 2 + 1
    stop1 = bw_fcbin
    starts = jnp.stack([start0, start1], axis=1)                  # [B, 2]
    stops = jnp.stack([stop0, stop1], axis=1)

    lagw = jnp.asarray(T.t("lagw_tns")[: max_order + 1], F32)
    quants_thr = T.t("quants_thr_tns")
    quants_pts = jnp.asarray(T.t("quants_pts_tns"), F32)
    huff_bits = jnp.asarray(T.t("huff_bits_tns"), jnp.int32)      # [8, 17]
    order_bits_tab = jnp.asarray(order_bits_tab, jnp.int32)

    bins = jnp.arange(Nfull)[None, :]

    def analyze_filter(f):
        st, sp = starts[:, f], stops[:, f]
        subdiv_len = (sp.astype(F32) + 1.0 - st.astype(F32)) / n_sub
        r = jnp.zeros((B, max_order + 1), F32)
        dead = jnp.zeros((B,), jnp.bool_)
        for sub in range(1, n_sub + 1):
            s_lo = jnp.floor(subdiv_len * (sub - 1)).astype(jnp.int32) + st - 1
            s_hi = jnp.floor(subdiv_len * sub).astype(jnp.int32) + st - 1
            m = (bins >= s_lo[:, None]) & (bins < s_hi[:, None])
            xm = jnp.where(m, x, 0.0)
            e = jnp.sum(xm * xm, axis=-1)
            dead = dead | (e == 0)
            acfs = []
            for lag in range(max_order + 1):
                # sum over i of seg[i]*seg[i+lag] within the subdivision
                prod = jnp.where(m[:, : Nfull - lag] & m[:, lag:],
                                 x[:, : Nfull - lag] * x[:, lag:], 0.0)
                acfs.append(jnp.sum(prod, axis=-1))
            acf = jnp.stack(acfs, axis=-1)                         # [B, 9]
            r = r + acf / jnp.maximum(e, 1e-30)[:, None]
        r = jnp.where(dead[:, None],
                      jnp.concatenate([jnp.ones((B, 1), F32),
                                       jnp.zeros((B, max_order), F32)], -1), r)
        r = r * lagw[None, :]
        lpc, rc_unq, err = _levinson(r, max_order)
        pred_gain = r[:, 0] / err
        tns_on = pred_gain > 1.5

        # LPC weighting when gain below max_pg (tns_coder.c:306-317)
        alpha = (max_pg - pred_gain) * (0.85 - 1.0) / (max_pg - 1.5) + 1.0
        weight = pred_gain < max_pg
        powers = jnp.power(jnp.where(weight, alpha, 1.0)[:, None],
                           jnp.arange(max_order + 1, dtype=F32)[None, :])
        lpc_w = lpc * powers
        rc_w = _poly2rc(lpc_w, max_order)
        rc_used = jnp.where(weight[:, None], rc_w, rc_unq)

        # PARCOR quantization (findRC_idx): the i with thr[i] < v <= thr[i+1]
        thr = jnp.asarray(quants_thr, F32)  # [18], increasing, thr[0] = -1
        v = rc_used[:, :, None]
        rc_idx = jnp.clip(jnp.sum((v > thr[None, None, :-1]).astype(jnp.int32), -1) - 1,
                          0, 16)                                    # [B, max_order]
        if max_order < MAXLAG:  # pad to 8 lanes with the zero-point index (8)
            pad = jnp.full((B, MAXLAG - max_order), 8, jnp.int32)
            rc_idx = jnp.concatenate([rc_idx, pad], axis=-1)
        rc_q = quants_pts[rc_idx]                                  # [B, 8]
        nz = rc_q != 0
        has_any = nz.any(-1)
        order = jnp.where(has_any,
                          MAXLAG - jnp.argmax(jnp.flip(nz, -1).astype(jnp.int32), -1),
                          1).astype(jnp.int32)  # last nonzero position + 1

        # bits: 1 (on/off) + ceil((order_bits + sum huff)/2048) when on
        ob = order_bits_tab[jnp.clip(order - 1, 0, 7)]
        hb = jnp.where(jnp.arange(MAXLAG)[None, :] < order[:, None],
                       huff_bits[jnp.arange(MAXLAG)[None, :], rc_idx], 0).sum(-1)
        coef_bits = jnp.ceil((ob + hb).astype(F32) / 2048.0).astype(jnp.int32)
        bits_f = 1 + jnp.where(tns_on, coef_bits, 0)

        active = tns_on
        return active, order, rc_idx, rc_q, bits_f

    act0, ord0, idx0, rcq0, bits0 = analyze_filter(0)
    if nf_max == 2:
        act1, ord1, idx1, rcq1, bits1 = analyze_filter(1)
    else:
        act1 = jnp.zeros((B,), jnp.bool_)
        ord1 = jnp.zeros((B,), jnp.int32)
        idx1 = jnp.zeros((B, MAXLAG), jnp.int32)
        rcq1 = jnp.zeros((B, MAXLAG), F32)
        bits1 = jnp.zeros((B,), jnp.int32)
    f1_exists = two_filters
    act1 = act1 & f1_exists
    bits = bits0 + jnp.where(f1_exists, bits1, 0)

    # filtering: forward lattice over bins, state carried across both filters
    rc0 = jnp.where(act0[:, None], rcq0, 0.0)
    rc1 = jnp.where(act1[:, None], rcq1, 0.0)
    in_f0 = act0[:, None] & (bins >= start0[:, None] - 1) & (bins <= stop0[:, None] - 1)
    in_f1 = act1[:, None] & (bins >= start1[:, None] - 1) & (bins <= stop1[:, None] - 1)
    ordsel = jnp.where(in_f1, ord1[:, None], ord0[:, None])        # [B, N]
    active_bin = in_f0 | in_f1

    def lattice_step(st_c, inputs):
        xb, use_f1, act, order = inputs                            # [B] each
        rc = jnp.where(use_f1[:, None], rc1, rc0)                  # [B, 8]
        s = xb
        tmp_save = s
        new_st = st_c
        for j in range(MAXLAG - 1):
            live = j < (order - 1)
            tmp_fl = rc[:, j] * s + st_c[:, j]
            s_new = s + rc[:, j] * st_c[:, j]
            new_st = new_st.at[:, j].set(jnp.where(act & live, tmp_save, new_st[:, j]))
            tmp_save = jnp.where(live, tmp_fl, tmp_save)
            s = jnp.where(live, s_new, s)
        last = jnp.clip(order - 1, 0, MAXLAG - 1)
        st_last = jnp.take_along_axis(st_c, last[:, None], 1)[:, 0]
        rc_last = jnp.take_along_axis(rc, last[:, None], 1)[:, 0]
        s = s + rc_last * st_last
        new_st = jnp.where(act[:, None] & (jnp.arange(MAXLAG)[None, :] == last[:, None]),
                           tmp_save[:, None], new_st)
        y = jnp.where(act, s, xb)
        return jnp.where(act[:, None], new_st, st_c), y

    st0 = jnp.zeros((B, MAXLAG), F32)
    _, ys = jax.lax.scan(lattice_step, st0,
                         (x.T, in_f1.T, active_bin.T, ordsel.T))
    x_out = ys.T

    order_out = jnp.stack([jnp.where(act0, ord0, 0), jnp.where(act1, ord1, 0)], 1)
    rc_idx_out = jnp.stack([jnp.where(act0[:, None], idx0, 0),
                            jnp.where(act1[:, None], idx1, 0)], 1)
    return x_out, order_out, rc_idx_out, numfilters, bits


def tns_decode(cfg: Config, x, rc_idx, order, numfilters, bw_idx):
    """Inverse lattice filter (processTnsDecoder_fl, tns_decoder.c:13-51).

    x: [B, N]; rc_idx: [B, 2, 8]; order: [B, 2]; bw_idx [B].
    Uses the bitrate-reduced geometry (N_red_tns / fs_red_tns).
    """
    B, Nfull = x.shape
    cutoff_name = {100: "BW_cutoff_bin_all", 50: "BW_cutoff_bin_all_5ms",
                   25: "BW_cutoff_bin_all_2_5ms"}[cfg.frame_dms]
    cutoffs = jnp.asarray(T.t(cutoff_name), jnp.int32)
    bw_fcbin = cutoffs[bw_idx]
    startfreq0 = math.floor(600 * cfg.N_red_tns * 2 / cfg.fs_red_tns) + 1
    two = numfilters == 2
    start0 = jnp.full((B,), startfreq0, jnp.int32)
    stop0 = jnp.where(two, bw_fcbin // 2, bw_fcbin)
    start1 = bw_fcbin // 2 + 1
    stop1 = bw_fcbin
    quants_pts = jnp.asarray(T.t("quants_pts_tns"), F32)
    rc = quants_pts[rc_idx]                                        # [B, 2, 8]
    act = order > 0                                                # [B, 2]

    bins = jnp.arange(Nfull)[None, :]
    in_f0 = act[:, 0:1] & (bins >= start0[:, None] - 1) & (bins <= stop0[:, None] - 1)
    in_f1 = act[:, 1:2] & two[:, None] & (bins >= start1[:, None] - 1) & (bins <= stop1[:, None] - 1)
    active_bin = in_f0 | in_f1
    ordsel = jnp.where(in_f1, order[:, 1:2], order[:, 0:1])

    def step(st_c, inputs):
        xb, use_f1, actb, ordb = inputs
        rcf = jnp.where(use_f1[:, None], rc[:, 1], rc[:, 0])       # [B, 8]
        last = jnp.clip(ordb - 1, 0, MAXLAG - 1)
        rc_last = jnp.take_along_axis(rcf, last[:, None], 1)[:, 0]
        st_last = jnp.take_along_axis(st_c, last[:, None], 1)[:, 0]
        s = xb - rc_last * st_last
        new_st = st_c
        for el in range(MAXLAG - 2, -1, -1):
            live = el <= (ordb - 2)
            s_new = s - rcf[:, el] * st_c[:, el]
            upd = rcf[:, el] * s_new + st_c[:, el]
            new_st = new_st.at[:, el + 1].set(
                jnp.where(actb & live, upd, new_st[:, el + 1]))
            s = jnp.where(live, s_new, s)
        new_st = new_st.at[:, 0].set(jnp.where(actb, s, new_st[:, 0]))
        y = jnp.where(actb, s, xb)
        return jnp.where(actb[:, None], new_st, st_c), y

    st0 = jnp.zeros((B, MAXLAG), F32)
    _, ys = jax.lax.scan(step, st0, (x.T, in_f1.T, active_bin.T, ordsel.T))
    return ys.T
