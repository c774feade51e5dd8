"""LTPF decoder postfilter (process_ltpf_decoder_fl, ltpf_decoder.c:13-316).

The pitch-lagged IIR comb filter with parameter crossfade runs as one
lax.scan over samples with the full y-history buffer as carry. The
reference's five control cases (off/off, on→off fade-out, off→on fade-in,
on→on same pitch, on→on pitch change with a two-stage crossfade through a
scratch buffer) are folded into per-stream masked selects so one scan serves
the whole batch.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .. import tables as T
from ..config import Config
from ..models.state import ltpf_dec_lens

F32 = jnp.float32
I32 = jnp.int32


def _filters(cfg: Config):
    fs = cfg.fs
    key = {8000: "16", 16000: "16", 24000: "24", 32000: "32",
           44100: "48", 48000: "48", 96000: "48"}[fs]
    inter = T.t(f"conf_inter_filter_{key}")   # [4, inter_len_r]
    tilt = T.t(f"conf_tilt_filter_{key}")     # [4, tilt_len_r]
    return inter, tilt


def decode_pitch(cfg: Config, param):
    """Pitch index → (pitch_int [B], pitch_fr [B]) at output rate
    (ltpf_decoder.c:44-66)."""
    fs = cfg.fs
    p2 = param[:, 2]
    lo = p2 < (T.RES4_PITCH_12K8 - T.MIN_PITCH_12K8) * 4
    mid = p2 < (T.RES4_PITCH_12K8 - T.MIN_PITCH_12K8) * 4 \
        + (T.RES2_PITCH_12K8 - T.RES4_PITCH_12K8) * 2
    pi_lo = T.MIN_PITCH_12K8 + p2 // 4
    pf_lo = p2 - (pi_lo - T.MIN_PITCH_12K8) * 4
    p2m = p2 - (T.RES4_PITCH_12K8 - T.MIN_PITCH_12K8) * 4
    pi_mid = T.RES4_PITCH_12K8 + p2m // 2
    pf_mid = (p2m - (pi_mid - T.RES4_PITCH_12K8) * 2) * 2
    pi_hi = p2 + (T.RES2_PITCH_12K8 - (T.RES4_PITCH_12K8 - T.MIN_PITCH_12K8) * 4
                  - (T.RES2_PITCH_12K8 - T.RES4_PITCH_12K8) * 2)
    pi = jnp.where(lo, pi_lo, jnp.where(mid, pi_mid, pi_hi))
    pf = jnp.where(lo, pf_lo, jnp.where(mid, pf_mid, 0))
    pitch = (pi.astype(F32) + pf.astype(F32) / 4.0) * fs / 12800.0
    # C round() is half-away-from-zero; jnp.round is half-even (pitch>0 here)
    pitch = jnp.floor(pitch * 4.0 + 0.5) / 4.0
    pitch_int = jnp.floor(pitch).astype(I32)
    pitch_fr = ((pitch - pitch_int) * 4.0).astype(I32)
    on = param[:, 0] == 1
    return jnp.where(on, pitch_int, 0), jnp.where(on, pitch_fr, 0)


def ltpf_decode(cfg: Config, x, bfi, param, mem_param, mem_x, mem_y,
                mem_pitch_int, mem_pitch_fr, mem_gain, mem_beta_idx,
                conceal_method=0):
    """Returns (y [B, N], new mems..., new param mem).

    x: [B, N] synthesized PCM; param: [B, 3] parsed LTPF params.
    """
    B, N = x.shape
    old_x_len, old_y_len, tilt_len, inter_len_r = ltpf_dec_lens(cfg)
    tilt_len_r = tilt_len + 1
    inter_len = max(cfg.fs, 16000) // 8000
    N4 = int(cfg.fs * 0.0025)
    conf_alpha = F32(0.85)

    bad = bfi == 1  # concealMethod 0: zero params (ltpf_decoder.c:33-40)
    param = jnp.where(bad[:, None], jnp.zeros_like(param), param)
    pitch_int, pitch_fr = decode_pitch(cfg, param)
    pitch_int = jnp.where(bad, 0, pitch_int)
    pitch_fr = jnp.where(bad, 0, pitch_fr)
    if cfg.ltpf_conf_beta_idx < 0:
        param = param.at[:, 1].set(0)
    # strong-typed f32: a weak-typed gain in the carried state changes the
    # jit signature between the init state and the stepped state, forcing a
    # full recompile on the second call of any state-feedback loop
    gain = jnp.where(bad, 0.0,
                     jnp.where(param[:, 1] == 1, cfg.ltpf_conf_beta, 0.0)
                     ).astype(F32)

    new_mem = dict(param=param, pitch_int=pitch_int, pitch_fr=pitch_fr, gain=gain,
                   beta_idx=jnp.full((B,), cfg.ltpf_conf_beta_idx, I32))

    if cfg.ltpf_conf_beta <= 0:
        return (x, mem_x, mem_y, new_mem)

    inter_t, tilt_t = _filters(cfg)
    inter_t = jnp.asarray(inter_t, F32)  # [4, inter_len_r]
    tilt_t = jnp.asarray(tilt_t, F32)    # [4, tilt_len_r]

    old_on = mem_param[:, 1] == 1
    new_on = param[:, 1] == 1
    same_pitch = (mem_pitch_int == pitch_int) & (mem_pitch_fr == pitch_fr)
    case_b = old_on & ~new_on
    case_c = ~old_on & new_on
    case_d = old_on & new_on & same_pitch
    case_e = old_on & new_on & ~same_pitch

    # filter coefficient vectors per stream
    a1 = mem_gain[:, None] * inter_t[jnp.clip(mem_pitch_fr, 0, 3)]      # [B, ilr]
    b1 = conf_alpha * mem_gain[:, None] * tilt_t[jnp.clip(mem_beta_idx, 0, 3)]
    a2 = gain[:, None] * inter_t[jnp.clip(pitch_fr, 0, 3)]
    b2 = conf_alpha * gain[:, None] * tilt_t[jnp.full((B,), max(cfg.ltpf_conf_beta_idx, 0))]
    p1 = mem_pitch_int
    p2 = pitch_int

    Lx = old_x_len
    Ly = old_y_len
    xbuf = jnp.concatenate([mem_x, x], axis=-1)          # [B, Lx + N]
    ybuf0 = jnp.concatenate([mem_y, jnp.zeros((B, N), F32)], axis=-1)
    zbuf0 = ybuf0                                        # stage-1 output buffer

    toff = jnp.arange(tilt_len_r)                        # sum1 taps j=0..tilt_len
    ioff = jnp.arange(inter_len_r)                       # sum2 taps

    def step(carry, n):
        ybuf, zbuf = carry
        xt = xbuf[:, jnp.clip(Lx + n - toff, 0, Lx + N - 1)]   # [B, tlr]
        s1_old = jnp.sum(b1 * xt, axis=-1)
        # y-taps at lag p: indices Ly + n - p + inter_len - 1 - j
        base1 = Ly + n - p1 + inter_len - 1
        zt = jnp.take_along_axis(zbuf, jnp.clip(base1[:, None] - ioff[None, :],
                                                0, Ly + N - 1), 1)
        s2_old = jnp.sum(a1 * zt, axis=-1)

        in_fade = n < N4
        c_out = (N4 - n).astype(F32) / N4
        z_n = x[:, n] - c_out * s1_old + c_out * s2_old

        # stage-2 / new-param path
        src_z = case_e & in_fade
        zx = zbuf[:, jnp.clip((Ly + n) - toff, 0, Ly + N - 1)]
        # the j=0 tap is this step's stage-1 output, not yet in zbuf
        zx = zx.at[:, 0].set(z_n)
        s1_src = jnp.where(src_z[:, None], zx, xt)
        s1_new = jnp.sum(b2 * s1_src, axis=-1)
        base2 = Ly + n - p2 + inter_len - 1
        yt = jnp.take_along_axis(ybuf, jnp.clip(base2[:, None] - ioff[None, :],
                                                0, Ly + N - 1), 1)
        s2_new = jnp.sum(a2 * yt, axis=-1)
        c_in = jnp.where(in_fade & (case_c | case_e), n.astype(F32) / N4, 1.0)
        x_eff = jnp.where(src_z, z_n, x[:, n])
        cand_new = x_eff - c_in * s1_new + c_in * s2_new

        y_n = x[:, n]
        y_n = jnp.where(case_b & in_fade, z_n, y_n)
        y_n = jnp.where((case_c | case_e) & in_fade, cand_new, y_n)
        y_n = jnp.where(case_d, cand_new, y_n)
        y_n = jnp.where(new_on & ~in_fade, cand_new, y_n)

        ybuf = ybuf.at[:, Ly + n].set(y_n)
        zbuf = zbuf.at[:, Ly + n].set(jnp.where(case_e, z_n, y_n))
        return (ybuf, zbuf), y_n

    (ybuf, _), ys = jax.lax.scan(step, (ybuf0, zbuf0), jnp.arange(N))
    y = ys.T

    new_mem_x = xbuf[:, N: N + old_x_len]
    new_mem_y = ybuf[:, N: N + old_y_len]
    return (y, new_mem_x, new_mem_y, new_mem)
