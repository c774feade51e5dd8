"""Phase ECU: FFT phase-evolution concealment (advanced PLC method 2).

Float JAX re-formulation of the fixed-point reference
(plc_phecu_fec_hq_fx.c:1718 hq_phase_ecu_fx, dispatched from
plc_apply_fx.c:119; helpers plc_phecu_peak_locator_fx.c,
plc_phecu_setf0hz_fx.c). 10 ms frames only, selected by the classifier for
pitched content with high spectral centroid (plc_classify_fx.c:55-70).

Algorithm per the reference:
  * prototype = last 16 ms of synthesized PCM, hamming-rect windowed
    (3 ms rise + 10 ms rect + 3 ms fall), rFFT'd once at the first loss
    (spec_ana_fx:796);
  * spectral peaks located with hysteresis sensitivity 0.07*(max-min)
    (peak_locator; CMPLMNT_PLOC_SENS_FX) and refined to fractional bins
    with the Jacobsen estimator, c = 1.1429 (imax2_jacobsen_mag_fx:2247);
  * per-band transient/burst analysis over the gwlpr_fx frequency groups
    (62.5 Hz bins; trans_burst_ana_fx:190) yields magnitude modifiers
    mag_chg/alpha, fade-to-average gains beta*Xavg and the burst
    attenuation ramp (POW_ATT table p3x1_6: -6 dB/frame past the
    threshold, PLC2_FADEOUT_IN_MS = 30);
  * substitution (subst_spec_fx:1065): bins within DELTA_CORR = 5 of a
    peak evolve by 2*pi*f0est*(t_adv + time_offs)/Lprot; valley bins get
    random 32-level phases (rand_phase_fx LCG seed = time_offs) and, in
    burst frames, +-25 % magnitude scrambling (valley_magnitude_adj_fx);
  * reconstruction: iFFT, inverse-window, splice onto the last 3.75 ms of
    good PCM (2 ms copy + 1.75 ms crossfade, rec_wtda_fx:1529), then the
    standard MDCT fold/unfold produces the OLA memory for the next frame
    (Processing_ITDA_WIN_OLA analog via ops.plc_adv.tdac).

Deliberate float-design deviations (documented, not bit-matched): the
BASOP exponent bookkeeping is gone; LF peak refinement against the LTPF
pitch (plc_phEcu_LF_peak_analysis_fx) is folded into the peak filter that
drops to noise-only concealment when correlation is weak and the spectrum
is peak-dense (spec_ana_fx:1020-1045); crossfade ramps are
power-complementary sin^2 instead of the w_old/w_new ROM tables.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from . import plc_adv

F32 = jnp.float32
I32 = jnp.int32

# frequency-group start bins, 62.5 Hz spacing (gwlpr_fx, constants.c:469)
GWLPR = [1, 12, 20, 36, 68, 132, 196, 260, 324, 388]
MAX_LGW = 9
DELTA_CORR = 5
# PLC2_FADEOUT_IN_MS = 30 resolves to (plc_phecu_fec_hq_fx.c:54-69):
BURST_ATT_THRESH = 2    # used threshold: BURST_ATT_THRESH(1) + 1
BETA_MUTE_THR = 4
OFF_FRAMES_LIMIT = 30
BETA_MUTE_INI = 0.25    # BETA_MUTE_FAC_INI >> 1
C_JACOB = 1.1429
PLOC_SENS = 2294.0 / 32768.0   # (1 - 0.93)


def lprot(cfg: Config) -> int:
    """16 ms prototype length (LprotSzPtr = 512*fs/32000, defines.h:273)."""
    return 512 * cfg.fs // 32000


def nbins(cfg: Config) -> int:
    return lprot(cfg) // 2 + 1


def _hamm2(cfg: Config) -> int:
    return 3 * cfg.fs // 1000  # 3 ms (hamm_len2Tab)


def whr_window(cfg: Config) -> np.ndarray:
    """Hamming-rect analysis window: 3 ms rise, 10 ms flat, 3 ms fall."""
    lp, h2 = lprot(cfg), _hamm2(cfg)
    ham = 0.54 - 0.46 * np.cos(2.0 * np.pi * np.arange(2 * h2) / (2 * h2 - 1))
    return np.concatenate([ham[:h2], np.ones(lp - 2 * h2), ham[h2:]]
                          ).astype(np.float32)


def t_adv(cfg: Config) -> int:
    """Phase-evolution time advance (setup_dec_lc3.c:175-177, LA = 0)."""
    return (cfg.frame_length + lprot(cfg) + cfg.frame_length // 4) // 2


def _search_bins(cfg: Config) -> int:
    """Peak search range: spectrum above 20 kHz is zeroed at 48 kHz
    (spec_ana_fx:895-903, MAX_LPROT_RED)."""
    return min(nbins(cfg), 321)


def _band_of_bin(cfg: Config) -> np.ndarray:
    """Static bin -> frequency-group map over the search range."""
    ns = nbins(cfg)
    k = np.zeros(ns, np.int64)
    for b in range(MAX_LGW):
        k[np.arange(ns) >= GWLPR[b]] = b
    return k


def n_lgw(cfg: Config) -> int:
    return min(cfg.fs_idx + 4, 8)  # LGW8K..LGW48K


def _lcg_tables(n: int):
    """Affine jump tables for seed' = (13849 + 31821*seed) mod 2^16
    (rand_phase_fx): seed_i = A[i]*seed0 + B[i]."""
    A = np.empty(n, np.int64)
    Bc = np.empty(n, np.int64)
    a, b = 1, 0
    for i in range(n):
        a = (a * 31821) % 65536
        b = (b * 31821 + 13849) % 65536
        A[i], Bc[i] = a, b
    return A, Bc


def _rand_phases(seed0, n: int):
    """[B, n] random phases: 32-level table lookup of the LCG's 5 MSBs
    (rand_phase_fx: 11.25-degree resolution). int32-safe mod-2^16 multiply
    (A split into hi/lo bytes keeps every product under 2^24)."""
    A, Bc = _lcg_tables(n)
    a_lo = jnp.asarray(A % 256, I32)[None, :]
    a_hi = jnp.asarray(A // 256, I32)[None, :]
    b = jnp.asarray(Bc, I32)[None, :]
    s0 = (seed0[:, None] % 65536).astype(I32)
    s = ((s0 * a_lo) % 65536 + ((s0 * a_hi) % 256) * 256 + b) % 65536
    return (2.0 * jnp.pi / 32.0) * ((s >> 11).astype(F32)), s


def spec_ana(cfg: Config, xfp, norm_corr):
    """First-loss spectral analysis (spec_ana_fx:796): windowed rFFT,
    hysteresis peak location, Jacobsen fractional refinement.

    xfp: [B, Lprot] last 16 ms of good PCM. Returns (X [B, nbins] c64,
    f0est [B, nbins] with -1 at non-peak bins, num_plocs [B])."""
    lp = lprot(cfg)
    ns = _search_bins(cfg)
    win = jnp.asarray(whr_window(cfg))
    X = jnp.fft.rfft(xfp * win[None, :], n=lp)
    if nbins(cfg) > ns:  # zero above 20 kHz at 48 kHz
        X = X.at[:, ns:].set(0.0)
    mag = jnp.abs(X[:, :ns])
    sens = (jnp.max(mag, 1) - jnp.min(mag, 1)) * PLOC_SENS

    # hysteresis extrema scan (plc_phEcu_peak_locator_fx model)
    B = mag.shape[0]

    def body(carry, col):
        m, idx = col
        ref, cand, cand_idx, mode = carry
        rising = (mode == 0) & (m > ref + sens)
        new_peak = (mode == 1) & (m < cand - sens)
        better = (mode == 1) & (m >= cand)
        out_idx = jnp.where(new_peak, cand_idx, -1)
        cand = jnp.where(rising | better, m, cand)
        cand_idx = jnp.where(rising | better, idx, cand_idx)
        ref = jnp.where(new_peak, m,
                        jnp.where(mode == 0, jnp.minimum(ref, m), ref))
        mode = jnp.where(rising, 1, jnp.where(new_peak, 0, mode))
        return (ref, cand, cand_idx, mode), out_idx

    init = (mag[:, 0], jnp.zeros((B,), F32), jnp.zeros((B,), I32),
            jnp.zeros((B,), I32))
    cols = (mag.T, jnp.arange(ns, dtype=I32)[:, None].repeat(B, 1))
    (ref, cand, cand_idx, mode), out = jax.lax.scan(body, init, cols)
    mask = jnp.zeros((B, ns), bool)
    rows = jnp.broadcast_to(jnp.arange(B)[None, :], out.shape)
    mask = mask.at[rows, jnp.where(out >= 0, out, 0)].max(out >= 0)
    mask = mask.at[jnp.arange(B), cand_idx].max(mode == 1)  # trailing cand

    # fractional refinement: Jacobsen on complex bins; parabola at edges
    Xp = jnp.pad(X[:, :ns], ((0, 0), (1, 1)))
    num = Xp[:, :-2] - Xp[:, 2:]               # X[k-1] - X[k+1]
    den = 2.0 * Xp[:, 1:-1] - Xp[:, :-2] - Xp[:, 2:]
    frac = C_JACOB * jnp.real(num * jnp.conj(den)) / \
        jnp.maximum(jnp.abs(den) ** 2, 1e-12)
    magp = jnp.pad(mag, ((0, 0), (1, 1)), constant_values=0.0)
    pden = magp[:, :-2] - 2.0 * magp[:, 1:-1] + magp[:, 2:]
    pfrac = 0.5 * (magp[:, :-2] - magp[:, 2:]) / \
        jnp.where(jnp.abs(pden) > 1e-12, pden, 1.0)
    edge = (jnp.arange(ns) < 2) | (jnp.arange(ns) >= ns - 2)
    frac = jnp.clip(jnp.where(edge[None, :], pfrac, frac), -1.0, 1.0)
    f0est = jnp.where(mask, jnp.arange(ns)[None, :] + frac, -1.0)
    num_plocs = jnp.sum(mask, 1).astype(I32)

    # peak-dense + weak-correlation content: noise-only concealment
    # (spec_ana_fx:1020-1045, peak_limits = 14)
    lf_peak = jnp.any(mask[:, 1:7], 1)
    drop = (norm_corr > 0.0) & (norm_corr < 0.5) & (num_plocs > 14) & lf_peak
    num_plocs = jnp.where(drop, 0, num_plocs)
    f0est = jnp.where(drop[:, None], -1.0, f0est)
    return X, f0est, num_plocs


def band_energies(cfg: Config, x_old_tot):
    """Per-group energies of the two 16 ms windows preceding the loss
    ('oold' ends one frame earlier than 'old'; plc_apply_fx.c:100-117 →
    trans_burst_ana_fx gr_pow_left/right)."""
    lp, fl = lprot(cfg), cfg.frame_length
    win = jnp.asarray(whr_window(cfg))
    ns = _search_bins(cfg)
    kmap = _band_of_bin(cfg)[:ns]
    one_hot = jnp.asarray(
        (kmap[:, None] == np.arange(MAX_LGW)[None, :]).astype(np.float32))

    def grp(seg):
        p = jnp.abs(jnp.fft.rfft(seg * win[None, :], n=lp)[:, :ns]) ** 2
        return p @ one_hot

    e_oold = grp(x_old_tot[:, -(lp + fl):-fl])
    e_old = grp(x_old_tot[:, -lp:])
    lgw = n_lgw(cfg)
    if lgw < MAX_LGW:  # extend like the 48 kHz band copy (fec_hq:655-668)
        e_oold = e_oold.at[:, lgw:].set(e_oold[:, lgw - 1: lgw])
        e_old = e_old.at[:, lgw:].set(e_old[:, lgw - 1: lgw])
    return e_oold, e_old


def _band_len(cfg: Config) -> np.ndarray:
    ns = _search_bins(cfg)
    edges = np.clip(np.asarray(GWLPR), 0, ns)
    ln = np.maximum(edges[1:] - edges[:-1], 1)[:MAX_LGW]
    return ln.astype(np.float32)


def trans_burst_ana(cfg: Config, e_oold, e_old, burst_len, mag_chg_1st,
                    beta_mute):
    """Per-band transient and burst attenuation analysis
    (trans_burst_ana_fx:190-680). burst_len = nbLostCmpt (1 = first loss).

    Returns (mag_chg, alpha, beta, Xavg, beta_mute, is_trans)."""
    first = (burst_len <= 1)[:, None]
    beta_mute = jnp.where(burst_len <= 1, BETA_MUTE_INI,
                          jnp.where(burst_len > BETA_MUTE_THR,
                                    beta_mute * 0.5, beta_mute))
    el = jnp.maximum(e_oold, 1e-9)
    er = jnp.maximum(e_old, 1e-9)
    # +-10 dB rise/decay transient thresholds (PhEcu_frac_thr_*_lin = 0.1)
    tr = (el <= 0.1 * er) | (0.1 * el >= er)
    att1 = jnp.where(tr & (er < el), jnp.sqrt(er / el), 1.0)
    mag_chg_1st = jnp.where(first, att1, mag_chg_1st)
    xavg_new = jnp.sqrt(0.5 * (el + er) / jnp.asarray(_band_len(cfg))[None])
    # Xavg is a magnitude in the spectrum's scale: window energy already in
    xavg = xavg_new  # recomputed from the same history while bursting

    # burst ramp: POW_ATT table index 9 (p3x1_6) = 2^-n per extra frame
    attdeg = jnp.clip(burst_len - BURST_ATT_THRESH, 0, OFF_FRAMES_LIMIT)
    att = jnp.exp2(-attdeg.astype(F32))[:, None]
    mag_chg = jnp.where(first, att1, mag_chg_1st * att)
    alpha = jnp.where(first, 1.0, mag_chg)
    beta = jnp.where(first, 0.0,
                     beta_mute[:, None] * jnp.sqrt(
                         jnp.maximum(0.0, 1.0 - alpha ** 2)))
    k = np.arange(MAX_LGW)
    lp_shape = np.where(k >= 6, 0.1, np.where(k >= 4, 0.5, 1.0))
    beta = beta * jnp.asarray(lp_shape, F32)[None]
    # Xavg fade-in on the 2nd loss when offset attenuation already started
    fadein = jnp.where((burst_len == 2)[:, None] & (mag_chg_1st < 1.0),
                       0.5, 1.0)
    beta = beta * fadein
    # full-frame transient flags are pinned inactive in LC3plus
    # (PhECU_short_flag_prev = 0, plc_update_aft_imdct_fx.c:154); the
    # per-band tr only drives mag_chg
    is_trans = jnp.zeros(tr.shape[:1], bool)
    return mag_chg, alpha, beta, xavg, beta_mute, is_trans


def subst_spec(cfg: Config, X, f0est, num_plocs, time_offs, mag_chg, alpha,
               beta, xavg, is_trans):
    """Spectrum evolution + substitution (subst_spec_fx:1065)."""
    ns = _search_bins(cfg)
    nsf = nbins(cfg)
    nyq = nsf - 1
    burst_len = time_offs // cfg.frame_length + 1
    npl = jnp.where(is_trans, 0, num_plocs)
    mask = (f0est >= 0.0) & (npl > 0)[:, None]

    adv = (t_adv(cfg) + time_offs).astype(F32)[:, None]
    ang = 2.0 * jnp.pi * jnp.where(mask, f0est, 0.0) * adv / lprot(cfg)

    # spread each peak's evolution phase over +-DELTA_CORR bins,
    # nearest peak wins (segment walk of subst_spec_fx:1240-1320)
    assigned = mask
    peak_ang = jnp.where(mask, ang, 0.0)
    for d in range(1, DELTA_CORR + 1):
        for s in (-1, 1):
            sh_m = jnp.roll(mask, s * d, axis=1)
            sh_a = jnp.roll(ang, s * d, axis=1)
            if s > 0:
                sh_m = sh_m.at[:, :d].set(False)
            else:
                sh_m = sh_m.at[:, -d:].set(False)
            take = sh_m & ~assigned
            peak_ang = jnp.where(take, sh_a, peak_ang)
            assigned = assigned | take

    seeds0 = time_offs.astype(I32)  # seed = *time_offs (fec_hq:1919)
    ph1, s1 = _rand_phases(seeds0, ns)
    ph2, _ = _rand_phases(seeds0 + 1, ns)

    bins = jnp.arange(ns)[None, :]
    interior = (bins >= 1) & (bins < min(ns, nyq))
    use_peak = assigned & interior
    theta = jnp.where(use_peak, peak_ang, ph1)
    Xs = X[:, :ns]
    rot = Xs * jnp.exp(1j * theta.astype(F32))

    # valley magnitude scrambling in burst / no-peak frames
    noise_adj = ((npl == 0) | (time_offs != 0))[:, None] & ~use_peak
    vfac = 1.0 + 0.25 * (0.5 * (ph2 / jnp.pi - 1.0) + 0.5 * jnp.cos(ph1))
    rot = jnp.where(noise_adj, rot * vfac, rot)

    kmap = jnp.asarray(_band_of_bin(cfg)[:ns])
    mc = mag_chg[:, kmap]
    bt = beta[:, kmap]
    xa = xavg[:, kmap]
    # few isolated peaks: keep only the peak neighbourhoods
    one_peak_zero = ((npl > 0) & (npl < 3))[:, None] & ~use_peak
    rot = jnp.where(one_peak_zero, 0.0, rot)
    fade = bt * xa * jnp.exp(1j * ph2.astype(F32))
    fade = jnp.where(one_peak_zero, 0.0, fade)
    out = mc * rot + fade
    out = jnp.where(interior, out, Xs)

    # DC / Nyquist handling
    dc = jnp.where(npl == 0, 0.0, X[:, 0])
    dc = jnp.where(burst_len > BURST_ATT_THRESH + 1, dc * alpha[:, 0], dc)
    full = jnp.concatenate(
        [dc[:, None], out[:, 1:], X[:, ns:]], axis=1) if nsf > ns else \
        jnp.concatenate([dc[:, None], out[:, 1:]], axis=1)
    ny = jnp.where(npl == 0, 0.0, full[:, nyq])
    ny = jnp.where(burst_len > BURST_ATT_THRESH + 1,
                   ny * alpha[:, n_lgw(cfg) - 1], ny)
    full = full.at[:, nyq].set(jnp.real(ny))
    return full


def rec_frame(cfg: Config, Xev, x_old_tot):
    """iFFT + inverse window + 3.75 ms splice (rec_wtda_fx:1529).

    Returns synth [B, 2*frame - la_zeroes] starting at the lost frame's
    -la_zeroes (== 3.75 ms at 10 ms), ready for ops.plc_adv.tdac."""
    lp, fl, la = lprot(cfg), cfg.frame_length, cfg.la_zeroes
    x16 = jnp.fft.irfft(Xev, n=lp)
    win = jnp.asarray(whr_window(cfg))
    x16 = x16 / jnp.maximum(win, 0.05)[None, :]
    B = x16.shape[0]
    l = fl - lp // 2                      # iFFT covers [2 ms, 18 ms)
    rec = jnp.zeros((B, 2 * fl), F32)
    rec = rec.at[:, l:l + lp].set(x16)
    copy_len = fl // 5                    # 2 ms     (COPY_LEN)
    ola_len = 7 * fl // 40                # 1.75 ms  (OLA_LEN)
    work = copy_len + ola_len             # == la_zeroes at 10 ms
    tail = x_old_tot[:, -work:]
    rec = rec.at[:, :copy_len].set(tail[:, :copy_len])
    n = (jnp.arange(ola_len, dtype=F32) + 0.5) / ola_len
    w_new = jnp.sin(0.5 * jnp.pi * n) ** 2
    rec = rec.at[:, copy_len:work].set(
        (1.0 - w_new)[None] * tail[:, copy_len:]
        + w_new[None] * rec[:, copy_len:work])
    return rec  # [B, 2*fl]; frame starts at index `work` (== la at 10 ms)


def apply(cfg: Config, st_f0est, st_X_sav, st_num_plocs, st_mag_chg_1st,
          st_xavg, st_beta_mute, st_is_trans, x_old_tot, nb_cur, first,
          active, norm_corr):
    """One Phase-ECU frame for the `active` lanes (hq_phase_ecu_fx:1718).

    first: [B] bool, first loss of a burst; active: lanes concealed by
    method 2 this frame. Returns dict with pcm [B, frame], ola memory
    [B, frame - la_zeroes], and updated state arrays."""
    fl, la = cfg.frame_length, cfg.la_zeroes

    def analyse(_):
        X, f0est, npl = spec_ana(cfg, x_old_tot[:, -lprot(cfg):], norm_corr)
        e_oold, e_old = band_energies(cfg, x_old_tot)
        return X, f0est, npl, e_oold, e_old

    def keep(_):
        z = jnp.zeros_like(st_mag_chg_1st)
        return st_X_sav, st_f0est, st_num_plocs, z, z

    any_first = jnp.any(first & active)
    Xn, f0n, npln, e_oold, e_old = jax.lax.cond(any_first, analyse, keep,
                                                operand=None)
    sel = (first & active)[:, None]
    X_sav = jnp.where(sel, Xn, st_X_sav)
    f0est = jnp.where(sel, f0n, st_f0est)
    num_plocs = jnp.where(first & active, npln, st_num_plocs)

    mag_chg, al, be, xavg, beta_mute, tr_new = trans_burst_ana(
        cfg, e_oold, e_old, nb_cur, st_mag_chg_1st, st_beta_mute)
    is_trans = jnp.where(first & active, tr_new.astype(I32), st_is_trans)
    xavg = jnp.where(sel, xavg, st_xavg)
    mag_chg_1st = jnp.where(sel, mag_chg, st_mag_chg_1st)
    beta_mute = jnp.where(active, beta_mute, st_beta_mute)

    def conceal(_):
        time_offs = jnp.maximum(nb_cur - 1, 0) * fl
        mc, alpha, beta, _, _, _ = trans_burst_ana(
            cfg, e_oold, e_old, nb_cur, mag_chg_1st, st_beta_mute)
        Xev = subst_spec(cfg, X_sav, f0est, num_plocs, time_offs, mc,
                         alpha, beta, xavg, is_trans != 0)
        synth = rec_frame(cfg, Xev, x_old_tot)
        pcm = synth[:, la: la + fl]
        ola = plc_adv.tdac(cfg, synth[:, la:])
        return pcm, ola

    def silent(_):
        return (jnp.zeros((x_old_tot.shape[0], fl), F32),
                jnp.zeros((x_old_tot.shape[0], fl - la), F32))

    pcm, ola = jax.lax.cond(jnp.any(active), conceal, silent, operand=None)
    return dict(pcm=pcm, ola=ola, phecu_X_sav=X_sav, phecu_f0est=f0est,
                phecu_num_plocs=num_plocs, phecu_mag_chg_1st=mag_chg_1st,
                phecu_Xavg=xavg, phecu_beta_mute=beta_mute,
                phecu_is_trans=is_trans)
