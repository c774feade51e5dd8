"""Advanced packet-loss concealment (fixed-point-only reference chain).

Float translation of the ETSI advanced PLC: method classifier
(processPLCclassify_fx, plc_classify_fx.c:18-80), time-domain concealment
(processTimeDomainConcealment_Apply_fx, plc_tdc_main_fx.c:78-510 + LPC
analysis from plc_apply_fx.c:173-227), TDAC blending
(processTdac_fx, plc_tdac_fx.c:33-190), advanced noise substitution
(plc_noise_substitution_fx.c:15-33) and per-bin damping + sign scrambling
(processPLCDampingScrambling_fx, plc_damping_scrambling_fx.c:54-316).

Everything is [B]-batched; per-lane method selection stays data-parallel via
masked selects (the three concealment paths all run; `lax.select` picks).
Phase ECU (method 2) is not implemented yet: 10 ms frames classified for it
fall back to noise substitution (roadmap: plc_phecu_*).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .. import tables as T
from ..config import Config

I32 = jnp.int32
F32 = jnp.float32

PLC_FADEOUT_IN_MS = 60
PLC4_TRANSIT_START_IN_MS = 20
PLC4_TRANSIT_END_IN_MS = PLC_FADEOUT_IN_MS
_ATTEN = {100: 0.5, 50: 0.70709228515625, 25: 0.84085083}  # PLC34_ATTEN_FAC
_HPBLEND_THROTTLE = 30  # PLC3_HPBLENDTHROTTLE
_L_FIR_HP = 11


def max_pitch(cfg: Config) -> int:
    """MAX_PITCH_FS (defines.h:39)."""
    return math.ceil(228 * cfg.fs / 12800)


def pcm_hist_len(cfg: Config) -> int:
    """x_old_tot length: classifier needs MAX_PITCH + frame
    (DYN_MAX_LEN_PCM_PLC, defines.h:44-47)."""
    return max_pitch(cfg) + cfg.frame_length


def update_pcm_hist(x_old_tot, pcm):
    """Shift in one frame of synthesized PCM (processPLCupdate)."""
    fl = pcm.shape[1]
    return jnp.concatenate([x_old_tot[:, fl:], pcm], axis=1)


# ---------------------------------------------------------------------------
# classifier (plc_classify_fx.c + plc_xcorr_fx.c)
# ---------------------------------------------------------------------------

def _xcorr(cfg: Config, x_old_tot, pitch_int):
    """plc_xcorr_lc_fx: normalized correlation at the LTPF pitch lag over
    the most recent up-to-10 ms of PCM history; 0 when no pitch."""
    B, L = x_old_tot.shape
    rect = int(np.asarray(T.t("plc_rect_len"))[cfg.fs_idx])
    pitch_min2 = 2 * 20 * (cfg.fs_idx + 1)
    corr_len = jnp.clip(jnp.minimum(rect, L - pitch_int), pitch_min2, rect)
    # gather tail segment and its pitch-lagged predecessor per lane
    k = jnp.arange(rect)[None, :]
    start = L - corr_len[:, None]
    idx1 = jnp.clip(start + k, 0, L - 1)
    idx2 = jnp.clip(start + k - pitch_int[:, None], 0, L - 1)
    valid = (k < corr_len[:, None]).astype(F32)
    cur = jnp.take_along_axis(x_old_tot, idx1, 1) * valid
    pred = jnp.take_along_axis(x_old_tot, idx2, 1) * valid
    num = jnp.sum(cur * pred, 1)
    den = jnp.sqrt(jnp.sum(cur ** 2, 1) * jnp.sum(pred ** 2, 1)) + 1e-12
    nc = jnp.clip(num / den, 0.0, 1.0)
    return jnp.where(pitch_int > 0, nc, 0.0)


def _spectral_centroid(cfg: Config, old_scf):
    """spectral_centroid_fx_lc (plc_classify_fx.c:86-205): de-emphasized
    linear-domain scf centroid, normalized to [0, fs_norm]."""
    B = old_scf.shape[0]
    fs_idx = min(cfg.fs_idx, 4)
    dee = jnp.asarray(T.t("plc_warp_dee_emphasis")[fs_idx], F32)   # [16]
    s = jnp.exp2(old_scf) * dee[None, :]
    # expand the band offsets to 64 pseudo-bands (4 per scf band)
    off = np.asarray(_band_offsets_64(cfg), np.float64)
    start = off[np.arange(16) * 4] + 1
    stop = off[np.arange(16) * 4 + 4]
    freq_sum = (stop * (stop + 1) / 2 - (start - 1) * start / 2)
    width = stop - start + 1
    inv = 1.0 / cfg.frame_length
    num = jnp.sum(s * jnp.asarray(freq_sum * inv, F32)[None, :], 1)
    den = jnp.sum(s * jnp.asarray(width, F32)[None, :], 1) + 2 ** -31
    fac = [1.0 / 6, 2.0 / 6, 3.0 / 6, 4.0 / 6, 1.0][fs_idx]
    return num / den * fac


def _band_offsets_64(cfg: Config) -> np.ndarray:
    """Stretch the coding band offsets to 64 bands (plc_classify_fx.c
    115-148); identity when bands_number == 64."""
    bo = np.asarray(
        T.bands_offset(cfg.fs_idx, cfg.frame_dms, cfg.hrmode), np.int64)
    n = cfg.bands_number
    out = np.zeros(65, np.int64)
    if n == 64:
        out[:] = bo[:65]
    elif n < 32:
        s = 32 - n
        for i in range(n - 1, s - 1, -1):
            out[(i + s) * 2 + 2] = bo[i + 1]
            out[(i + s) * 2 + 1] = bo[i + 1]
        for i in range(s - 1, -1, -1):
            out[i * 4 + 4] = bo[i + 1]
            out[i * 4 + 3] = bo[i + 1]
            out[i * 4 + 2] = bo[i + 1]
            out[i * 4 + 1] = bo[i + 1]
    else:
        s = 64 - n
        for i in range(n - 1, s - 1, -1):
            out[i + s + 1] = bo[i + 1]
        for i in range(s - 1, -1, -1):
            out[i * 2 + 2] = bo[i + 1]
            out[i * 2 + 1] = bo[i + 1]
    return out


def classify(cfg: Config, x_old_tot, old_scf, pitch_int):
    """First-loss method select (plc_classify_fx.c:36-80): 3 = TD-PLC when
    pitched and low-centroid, 2 = Phase ECU (10 ms), else 4 = noise
    substitution. Returns (method [B] i32, norm_corr [B])."""
    nc = _xcorr(cfg, x_old_tot, pitch_int)
    sc = _spectral_centroid(cfg, old_scf)
    # class = L_mult(nc,7640) + L_mac(sc,-32768) - 335020208, Q31:
    # 2*nc*7640/2^16... in float: 0.2332*nc - sc - 0.156
    cls = 7640.0 / 32768.0 * nc - sc - 335020208.0 / 2 ** 31
    meth_pitched = jnp.where(cls <= 0,
                             jnp.where(cfg.frame_dms == 100, 2, 4), 3)
    meth = jnp.where(pitch_int > 0, meth_pitched, 4).astype(I32)
    return meth, nc


# ---------------------------------------------------------------------------
# TDC LPC analysis (plc_apply_fx.c:173-227)
# ---------------------------------------------------------------------------

def _plc_n_bands(cfg: Config) -> int:
    n = min(cfg.frame_length, 80)
    if cfg.frame_dms == 25 and cfg.fs_idx == 4:
        n = 60
    if cfg.frame_dms == 50 and cfg.fs_idx == 2:
        n = 40
    return n


def _plc_band_offsets(cfg: Config) -> np.ndarray:
    lin_map = {100: ["8000", "16000", "24000", "32000", "48000"],
               50: ["8000", "8000", "24000", "16000", "24000"],
               25: ["8000", "8000", "8000", "8000", "16000"]}
    tag = lin_map[cfg.frame_dms][min(cfg.fs_idx, 4)]
    return np.asarray(T.t(f"bands_offset_{tag}_lpc_lin"), np.int64)


def tdc_lpc(cfg: Config, q_old_d):
    """LPC from the last good shaped spectrum: linear per-band energy →
    pre-emphasis → inverse ODFT autocorrelation → lag window → Levinson.
    Returns a [B, order+1] with a[:,0] = 1."""
    B, N = q_old_d.shape
    order = 8 if cfg.fs_idx == 0 else 16
    n_bands = _plc_n_bands(cfg)
    off = _plc_band_offsets(cfg)[: n_bands + 1]
    # per-band mean energy over linear bands (processPerBandEnergy_fx lin)
    width = (off[1:] - off[:-1]).astype(np.float64)
    seg = np.zeros((n_bands, N), np.float32)
    for b in range(n_bands):
        seg[b, off[b]: off[b + 1]] = 1.0 / width[b]
    d2 = q_old_d ** 2 @ jnp.asarray(seg.T)                      # [B, n_bands]
    pre = jnp.asarray(
        T.t(f"plc_lin_pre_emph_{cfg.frame_dms}_{min(cfg.fs_idx, 4)}"), F32)
    d2 = d2 * pre[None, :]
    # inverse ODFT: r[i] = sum_b d2[b] cos(pi (b+.5) i / n_bands)
    i_ = np.arange(order + 1)[:, None]
    b_ = np.arange(n_bands)[None, :] + 0.5
    cosm = np.cos(np.pi * i_ * b_ / n_bands)                    # [ord+1, nb]
    r = d2 @ jnp.asarray(cosm.T, F32)                           # [B, ord+1]
    r0 = jnp.maximum(r[:, 0:1] * 1.0001, 1e-30)
    lw = jnp.asarray(T.t("plc_lag_win")[min(cfg.fs_idx, 4)][:order], F32)
    r = jnp.concatenate([r0, r[:, 1:] * lw[None, :]], 1)
    # Levinson-Durbin (unrolled; processLevinson_fx)
    a = jnp.zeros((B, order + 1), F32).at[:, 0].set(1.0)
    err = r[:, 0]
    for m in range(1, order + 1):
        acc = r[:, m]
        for j in range(1, m):
            acc = acc + a[:, j] * r[:, m - j]
        k = -acc / jnp.maximum(err, 1e-30)
        k = jnp.clip(k, -0.999999, 0.999999)
        new_a = a
        for j in range(1, (m + 1) // 2 + 1):
            aj = a[:, j] + k * a[:, m - j]
            amj = a[:, m - j] + k * a[:, j]
            new_a = new_a.at[:, j].set(aj)
            if j != m - j:
                new_a = new_a.at[:, m - j].set(amj)
        a = new_a.at[:, m].set(k)
        err = err * (1.0 - k * k)
    if order < 16:   # fixed-width state slot (order 8 at 8 kHz)
        a = jnp.pad(a, ((0, 0), (0, 16 - order)))
    return a


# ---------------------------------------------------------------------------
# TDC apply (plc_tdc_main_fx.c:78-510)
# ---------------------------------------------------------------------------

def _lcg16(seed, n: int):
    """seed' = low16(16831 + seed*12821) signed, per step; returns
    ([B, n] int16-valued floats, final seed)."""
    def body(s, _):
        s = (16831 + s * 12821) & 0xFFFF
        v = jnp.where(s >= 32768, s - 65536, s)
        return v, v
    seed_u = jnp.where(seed < 0, seed + 65536, seed)
    fin, ys = jax.lax.scan(body, seed_u, None, length=n)
    fin = jnp.where(fin >= 32768, fin - 65536, fin)
    return ys.T.astype(F32), fin.astype(I32)


def _fir(x, h, out_len: int):
    """y[i] = sum_k x[:, i+k] h[k] for i in [0, out_len)."""
    cols = [x[:, k: k + out_len] * h[k] for k in range(len(h))]
    return sum(cols)


def tdc_apply(cfg: Config, pitch_int, fract, a, x_old_tot, nb_lost,
              stab_fac, seed, gain_c_in, alpha_in, harmonic_buf,
              synth_hist, harmonic_len, active):
    """One frame of time-domain concealment. All inputs [B, ...]; `active`
    masks the lanes being concealed by method 3 this frame.

    Returns dict(synth [B, frame+overlap], and updated seed, gain_c, alpha,
    fract, harmonic_buf, harmonic_len, synth_hist)."""
    B = pitch_int.shape[0]
    order = a.shape[1] - 1
    fl = cfg.frame_length
    overlap = fl - cfg.la_zeroes
    length = fl + overlap
    fs_idx = min(cfg.fs_idx, 4)
    pre_fac = float(np.asarray(T.t("plc_preemph_fac"))[fs_idx])
    L = x_old_tot.shape[1]
    MP = max_pitch(cfg)

    # frame-duration-adjusted loss counter (10 ms units)
    if cfg.frame_dms == 25:
        nb_loc = (nb_lost + 3) >> 2
        next_inc = (nb_lost & 3) == 1
        before_next = (nb_lost & 3) == 0
    elif cfg.frame_dms == 50:
        nb_loc = (nb_lost + 1) >> 1
        next_inc = (nb_lost & 1) == 1
        before_next = (nb_lost & 1) == 0
    else:
        nb_loc = nb_lost
        next_inc = jnp.ones((B,), bool)
        before_next = jnp.ones((B,), bool)
    first = nb_lost == 1
    silent = nb_loc > PLC_FADEOUT_IN_MS // 10

    Tc = pitch_int + (fract > 0).astype(I32)
    Tc = jnp.clip(Tc, 1, MP)

    # ---- first-loss analysis: pre-emphasized history + LPC residual ----
    # x_pre = last (Tc + fl/2 + order + 1) samples; exc = A(z) * x_pre
    fl2 = fl // 2
    span = MP + fl2 + order + 1          # static upper bound
    tail = x_old_tot[:, L - span:]
    pe = tail - pre_fac * jnp.concatenate(
        [jnp.zeros((B, 1), F32), tail[:, :-1]], 1)
    conv_len = span - order - 1          # = MP + fl2 potential exc samples
    # residual: exc[t] = sum_j a[j] * pe_sig[t - j], for the last conv_len
    # positions over the pre-emphasized tail
    pe_sig = pe[:, 1:]                   # drop the warm-up sample
    cols = [pe_sig[:, order - j: order - j + conv_len] for j in range(order + 1)]
    exc = sum(a[:, j][:, None] * cols[j] for j in range(order + 1))  # [B, conv_len]
    # lane's valid exc occupies the last (Tc + fl2) entries of exc
    synth_mem_first = pe_sig[:, -order:]

    # ---- gains (first loss) ----
    def seg(buf, start_from_end, ln: int):
        """buf[:, -start_from_end : -start_from_end + ln] via gather."""
        k = jnp.arange(ln)[None, :]
        idx = buf.shape[1] - start_from_end[:, None] + k
        return jnp.take_along_axis(buf, jnp.clip(idx, 0, buf.shape[1] - 1), 1)

    x_cur = seg(pe_sig, jnp.full((B,), fl2, I32), fl2)
    x_tc = seg(pe_sig, Tc + fl2, fl2)
    x_tc1 = seg(pe_sig, Tc + fl2 - 1, fl2)   # lag Tc-1 (fract case)
    def gainp(xx, yy):
        return jnp.sum(xx * yy, 1) / jnp.maximum(jnp.sum(yy * yy, 1), 1e-9)
    same = pitch_int == Tc
    g_same = gainp(x_cur, x_tc)
    g_a = gainp(x_cur, x_tc1)    # compare Tc vs pitch_int per the reference
    g_b = g_same
    pick_pi = (~same) & (g_a > g_b)
    Tc = jnp.where(pick_pi, pitch_int, Tc)
    fract_out = jnp.where(pick_pi, 0, fract)
    gain_p0 = jnp.clip(jnp.where(same, g_same, jnp.where(pick_pi, g_a, g_b)),
                       0.0, 1.0)

    def gainc(lag):
        e_cur = seg(exc, jnp.full((B,), fl2, I32), fl2)
        e_lag = seg(exc, lag + fl2, fl2)
        d = e_cur - gain_p0[:, None] * e_lag
        g = jnp.sum(d * d, 1)
        if cfg.frame_dms < 100:
            g = jnp.minimum(g, jnp.sum(e_cur * e_cur, 1))
        return jnp.sqrt(g / fl2)
    # pitch_int == Tc (after the refinement above): single lag; else the
    # reference takes the min over both candidate lags
    same2 = pitch_int == Tc
    gc0 = jnp.where(same2, gainc(Tc),
                    jnp.minimum(gainc(Tc), gainc(pitch_int)))
    gain_c = jnp.where(first, gc0, gain_c_in)
    gain_p = jnp.where(first, gain_p0, alpha_in)

    # ---- damping factor (plc_tdc_main_fx.c:243-320) ----
    alpha_prev = jnp.where(first, 1.0, alpha_in)
    a1 = jnp.where(gain_p > 0.98 ** 2, 0.98,
                   jnp.where(gain_p < 0.925 ** 2, 0.925, jnp.sqrt(gain_p)))
    c1 = jnp.where(nb_loc == 2, 0.630, 0.652)
    c2 = jnp.where(nb_loc == 2, 0.350, 0.328)
    a2 = (stab_fac * c2 + c1) * gain_p
    a2 = jnp.where((nb_loc == 2) & (a2 < 0.919), 0.919, a2)
    alpha = jnp.where(next_inc, jnp.where(nb_loc == 1, a1, a2), alpha_in)
    alpha = jnp.where(nb_loc > 3, alpha * _ATTEN[cfg.frame_dms], alpha)
    gain_p = jnp.where(nb_loc > 5, alpha, gain_p)

    # ---- harmonic part: repeat the last pitch cycle ----
    # exc tail cycle: exc[-Tc:] (with wrap-extension for the smoothing FIR)
    kmp = jnp.arange(MP)[None, :]
    cyc_idx = exc.shape[1] - Tc[:, None] + kmp % jnp.maximum(Tc[:, None], 1)
    cycle = jnp.take_along_axis(exc, jnp.clip(cyc_idx, 0, exc.shape[1] - 1), 1)
    harm_name = "TDC_high_16_harm" if cfg.fs_idx <= 1 else "TDC_high_32_harm"
    hh = np.asarray(T.t(harm_name), np.float64)
    half = (_L_FIR_HP - 1) // 2
    # filtered cycle: y[i] = sum hh[k] * exc[-Tc + i + k - half]; positions
    # past the cycle end wrap to the cycle start (the reference copies
    # exc[-Tc..] to exc[0..4]); positions before it read real history
    filt = jnp.zeros((B, MP), F32)
    for k in range(_L_FIR_HP):
        off = kmp + (k - half)
        off = jnp.where(off >= Tc[:, None], off - Tc[:, None], off)
        idx = exc.shape[1] - Tc[:, None] + off
        filt = filt + float(hh[k]) * jnp.take_along_axis(
            exc, jnp.clip(idx, 0, exc.shape[1] - 1), 1)
    new_cycle = jnp.where((stab_fac >= 1.0)[:, None], cycle, filt)
    upd_h = (active & first)[:, None]
    harmonic_buf = jnp.where(upd_h, new_cycle, harmonic_buf)
    harmonic_len = jnp.where(active & first, Tc, harmonic_len)

    # ---- random part ----
    rnd, seed_out = _lcg16(seed, length + _L_FIR_HP - 1)
    hp_name = "TDC_high_16" if cfg.fs_idx <= 1 else "TDC_high_32"
    hp = np.asarray(T.t(hp_name), np.float64)
    hp_f = _fir(rnd, [float(v) for v in hp], length)
    throttle = nb_loc.astype(F32) / (nb_loc + _HPBLEND_THROTTLE)
    blend = (1.0 - alpha) * throttle
    mix = (1.0 - blend)[:, None] * hp_f + blend[:, None] * rnd[:, half: half + length]
    exc2 = jnp.where(first[:, None], hp_f, mix)

    gain_inov = (1.1 - 0.75 * gain_p) / jnp.sqrt(
        2.0 * jnp.mean((exc2[:, :fl] / 16.0) ** 2, 1) + 0.01)

    # ---- total excitation with per-sample gain ramps ----
    gain_h0 = alpha_prev
    step = (gain_h0 - alpha) / fl
    gc_end = gain_c * alpha / jnp.maximum(alpha_prev, 1e-9)
    step_n = (gain_c - gc_end) / fl
    tpos = jnp.arange(length)[None, :].astype(F32)
    gain_h_t = jnp.maximum(gain_h0[:, None] - step[:, None] * tpos, 0.0)
    gain_c_t = jnp.maximum(gain_c[:, None] - step_n[:, None] * tpos, 0.0)
    hoff = ((nb_lost - 1) * fl) % jnp.maximum(harmonic_len, 1)
    hidx = (hoff[:, None] + jnp.arange(length)[None, :]) \
        % jnp.maximum(harmonic_len[:, None], 1)
    harm = jnp.take_along_axis(harmonic_buf,
                               jnp.clip(hidx, 0, MP - 1), 1)
    exc_tot = harm * gain_h_t + exc2 * (gain_c_t * gain_inov[:, None] / 16.0)
    gain_c_out = jnp.where(active, gc_end, gain_c_in)

    # ---- LPC synthesis + de-emphasis (sequential IIRs) ----
    mem0 = jnp.where(first[:, None], synth_mem_first, synth_hist)

    def syn_body(mem, x_t):
        y = x_t - jnp.sum(mem * a[:, 1:][:, ::-1], 1)
        mem = jnp.concatenate([mem[:, 1:], y[:, None]], 1)
        return mem, y
    _, ys = jax.lax.scan(syn_body, mem0, jnp.moveaxis(exc_tot[:, :, None], 1, 0)[:, :, 0])
    synth_pe = ys.T                                            # [B, length]
    synth_hist_out = jnp.where(active[:, None],
                               synth_pe[:, fl - order: fl], synth_hist)

    de_mem = x_old_tot[:, -1]

    def de_body(m, x_t):
        y = x_t + pre_fac * m
        return y, y
    _, yd = jax.lax.scan(de_body, de_mem, jnp.moveaxis(synth_pe[:, :, None], 1, 0)[:, :, 0])
    synth = yd.T

    # fade-out ramp on the final concealed frame before silence
    last = before_next & (nb_loc == PLC_FADEOUT_IN_MS // 10)
    ramp = jnp.maximum(1.0 - jnp.arange(length)[None, :] / fl, 0.0)
    synth = jnp.where(last[:, None], synth * ramp, synth)
    synth = jnp.where(silent[:, None], 0.0, synth)
    alpha = jnp.where(silent, 0.0, alpha)
    gain_c_out = jnp.where(silent & active, 0.0, gain_c_out)

    return dict(synth=synth, seed=jnp.where(active, seed_out, seed),
                gain_c=gain_c_out,
                alpha=jnp.where(active, alpha, alpha_in),
                fract=jnp.where(active & first, fract_out, fract),
                harmonic_buf=harmonic_buf, harmonic_len=harmonic_len,
                synth_hist=synth_hist_out)


def tdac(cfg: Config, synth):
    """processTdac_fx (plc_tdac_fx.c:33-190): overlap-add memory for the
    frame after a TDC-concealed one. The fixed-point version hand-folds the
    synthesized extension through the analysis+synthesis windows; that is
    exactly mdct followed by imdct of the would-be next frame, so here we
    run the real transforms on the extension (DCT-IV round trip is
    identity in our orthonormal convention).

    synth: [B, frame + (frame - la_zeroes)]. Returns ola_mem
    [B, frame - la_zeroes]."""
    from . import transforms
    B = synth.shape[0]
    fl = cfg.frame_length
    la = cfg.la_zeroes
    mem_t = synth[:, la:fl]                       # prev-frame input tail
    x_next = jnp.concatenate(
        [synth[:, fl: 2 * fl - la], jnp.zeros((B, la), F32)], 1)
    y, _ = transforms.mdct(cfg, x_next, mem_t)
    _, ola_mem = transforms.imdct(cfg, y, jnp.zeros((B, fl - la), F32))
    return ola_mem


# ---------------------------------------------------------------------------
# noise substitution + damping/scrambling
# ---------------------------------------------------------------------------

def noise_substitution(spec_prev):
    """processPLCNoiseSubstitution_fx: repeat with a DC-blocking taper."""
    out = spec_prev
    out = out.at[:, 0].multiply(0.2)
    out = out.at[:, 1].multiply(0.5)
    return out


def damping_scrambling(cfg: Config, spec, nb_lost, stab_fac, scramble,
                       cum_fflc, cum_slow, cum_fast, pitch_present, seed,
                       spec_inv_idx, active):
    """processPLCDampingScrambling_fx: cumulative slow/fast fades, sign
    scrambling above spec_inv_idx and adaptive per-bin damping. `scramble`
    masks lanes that actually modify the spectrum (method 4 / bfi==2);
    `active` masks lanes updating the cumulative factors (any bfi != 0)."""
    B, N = spec.shape
    x_lost = nb_lost
    if cfg.frame_dms == 25:
        nb10 = (nb_lost + 3) >> 2
        root = 0.25
    elif cfg.frame_dms == 50:
        nb10 = (nb_lost + 1) >> 1
        root = 0.5
    else:
        nb10 = nb_lost
        root = 1.0
    first = x_lost == 1
    cum_fflc = jnp.where(active & first, 1.0, cum_fflc)
    cum_slow = jnp.where(active & first, 1.0, cum_slow)
    cum_fast = jnp.where(active & first, 1.0, cum_fast)
    slow = (0.8 + 0.2 * stab_fac) ** root
    fast = (0.3 + 0.2 * stab_fac) ** root
    cum_slow = jnp.where(active, cum_slow * slow, cum_slow)
    cum_fast = jnp.where(active, cum_fast * fast, cum_fast)

    # rapid fading for full-frame-loss concealment (spec_inv_idx == 0 lanes)
    ffl = spec_inv_idx == 0
    fflc_att = jnp.where(nb10 > PLC_FADEOUT_IN_MS // 10, 0.0,
                         jnp.where(nb10 > 2, _ATTEN[100] ** root, 1.0))
    cum_fflc = jnp.where(active & scramble & ffl & (fflc_att < 1.0),
                         cum_fflc * fflc_att, cum_fflc)
    slow_loc = jnp.where(ffl, cum_slow * cum_fflc, cum_slow)
    fast_loc = jnp.where(ffl, cum_fast * cum_fflc, cum_fast)

    # fade-out window position
    per_frame = cfg.frame_dms / 100.0
    start_f = max(int(PLC4_TRANSIT_START_IN_MS / (10 * per_frame)), 1)
    end_f = int(PLC4_TRANSIT_END_IN_MS / (10 * per_frame))
    start = jnp.where(pitch_present == 0, 1, start_f)
    lin = jnp.clip((end_f - x_lost).astype(F32) / jnp.maximum(end_f - start, 1),
                   0.0, 1.0)
    lin = jnp.where(x_lost <= start, 1.0, lin)

    # sign scrambling with the shared 16-bit LCG
    rnd, seed_out = _lcg16(seed, N)       # values in [-32768, 32768)
    thr = -32768.0 * lin
    kidx = jnp.arange(N)[None, :]
    in_rng = kidx >= spec_inv_idx[:, None]
    neg = (rnd < 0) & ((pitch_present == 0)[:, None]
                       | (rnd < thr[:, None]))
    do = scramble[:, None] & in_rng
    spec = jnp.where(do & neg, -spec, spec)
    # the reference only advances the seed over the scrambled span
    steps = jnp.where(scramble, N - spec_inv_idx, 0)
    mults, adds = _lcg_pows(N)
    su = jnp.where(seed < 0, seed + 65536, seed).astype(jnp.uint32)
    su = (su * mults[steps] + adds[steps]) & jnp.uint32(0xFFFF)
    seed_out = jnp.where(su >= 32768, su.astype(I32) - 65536,
                         su.astype(I32))

    # adaptive damping: bins below the mean-energy threshold fade slow,
    # outliers fade fast with a level offset
    ad_fac = (10.0 - 1.2) * lin + 1.2
    msk = in_rng.astype(F32)
    nbin = jnp.maximum(jnp.sum(msk, 1), 1.0)
    mean_e = jnp.sum(msk * spec ** 2, 1) / nbin
    thr_e = jnp.sqrt(ad_fac * mean_e)
    fac = (slow_loc - fast_loc) * thr_e
    below = jnp.abs(spec) < thr_e[:, None]
    damped = jnp.where(below, spec * slow_loc[:, None],
                       spec * fast_loc[:, None]
                       + jnp.sign(spec) * fac[:, None])
    spec = jnp.where(do, damped, spec)
    return spec, cum_fflc, cum_slow, cum_fast, seed_out


_LCG_POW_CACHE: dict[int, tuple] = {}


def _lcg_pows(n: int):
    """Powers of the (12821, 16831) LCG for a closed-form k-step advance."""
    if n not in _LCG_POW_CACHE:
        mults = np.zeros(n + 1, np.uint32)
        adds = np.zeros(n + 1, np.uint32)
        m, c = 1, 0
        for k in range(n + 1):
            mults[k] = m
            adds[k] = c
            m = (m * 12821) & 0xFFFF
            c = (c * 12821 + 16831) & 0xFFFF
        _LCG_POW_CACHE[n] = (mults, adds)
    m_, a_ = _LCG_POW_CACHE[n]
    return jnp.asarray(m_), jnp.asarray(a_)
