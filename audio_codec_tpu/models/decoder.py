"""Batched LC3plus decoder: one frame step over [B] streams.

Mirrors Dec_LC3_Channel_fl (dec_lc3_fl.c:13-130) as a pure function over the
DecState pytree: entropy parse → arithmetic decode → SNS decode → residual →
noise filling → global gain → TNS synthesis → SNS shaping → PLC → IMDCT/OLA
→ LTPF postfilter → PCM rounding. Bad frames (bfi, from transport or BER
detection) are concealed per stream with lax-style masked selects.
"""
from __future__ import annotations

import jax.numpy as jnp

from .. import tables as T
from ..config import Config
from ..ops import ari, bits, ltpf_dec, plc, quant, sns, tns, transforms
from .state import DecState

I32 = jnp.int32
F32 = jnp.float32


def decode_frame(cfg: Config, st: DecState, frame_bytes: jnp.ndarray,
                 bfi_ext: jnp.ndarray | None = None):
    """frame_bytes: [B, nbytes] uint8/int32. bfi_ext: [B] i32 (1 = lost frame).
    Returns (st, pcm [B, frame_length] float in 16-bit range, aux)."""
    buf = frame_bytes.astype(I32)
    B = buf.shape[0]
    N = cfg.yLen
    bfi = jnp.zeros((B,), I32) if bfi_ext is None else bfi_ext.astype(I32)

    side = bits.parse_side_info(cfg, buf)
    dec = ari.decode(cfg, buf, side)
    bfi = jnp.maximum(bfi, jnp.maximum(side["bfi"], dec["bfi"]))
    good = bfi != 1

    x = dec["x"].astype(F32)
    scf_q = sns.quantize_scf_dec(side["scf_idx"])
    x = jnp.where((dec["residual_present"] == 1)[:, None] & good[:, None],
                  quant.residual_decode(cfg, x, dec["res_bits"], dec["n_res"]), x)

    cutoff_name = {100: "BW_cutoff_bin_all", 50: "BW_cutoff_bin_all_5ms",
                   25: "BW_cutoff_bin_all_2_5ms"}[cfg.frame_dms]
    bw_bin = jnp.asarray(T.t(cutoff_name), I32)[side["bw_idx"]]
    nf = quant.noise_filling(cfg, x, dec["nf_seed"], side["fac_ns_idx"], bw_bin)
    x = jnp.where((dec["zero_frame"] == 0)[:, None] & good[:, None], nf, x)

    x = jnp.where(good[:, None], quant.apply_global_gain(cfg, x, side["gg_idx"]), x)
    x = jnp.where(good[:, None],
                  tns.tns_decode(cfg, x, dec["tns_idx"], dec["tns_order"],
                                 side["num_tns"], side["bw_idx"]), x)
    gains = sns.interpolate_scf(cfg, scf_q, encoder_side=False)
    x = jnp.where(good[:, None], sns.mdct_shaping(cfg, x, gains), x)

    # PLC (method 0, every frame; conceal iff bfi)
    x, q_d_prev, nb_lost, cum_alpha, seed = plc.plc_main(
        cfg, x, st.plc_q_d_prev, bfi, st.plc_nbLostCmpt, st.plc_cum_alpha,
        st.plc_seed)

    # bins above yLen are always zero at the IMDCT input (dec_lc3_fl.c keeps
    # sqQdec_fl sized MAX_LEN but only writes yLen entries)
    if cfg.frame_length > N:
        x_full = jnp.pad(x, ((0, 0), (0, cfg.frame_length - N)))
    else:
        x_full = x
    pcm, imdct_mem = transforms.imdct(cfg, x_full, st.imdct_mem)

    nb_lost, cum_alpha, prev_bfi, prevprev_bfi = plc.plc_update(
        bfi, nb_lost, cum_alpha, st.plc_prevBfi, st.plc_prevprevBfi)

    y, mem_x, mem_y, lm = ltpf_dec.ltpf_decode(
        cfg, pcm, bfi, side["ltpf_param"], st.ltpf_param_mem, st.ltpf_mem_x,
        st.ltpf_mem_y, st.ltpf_mem_pitch_int, st.ltpf_mem_pitch_fr,
        st.ltpf_mem_gain, st.ltpf_mem_beta_idx)

    st = st.replace(
        imdct_mem=imdct_mem, ltpf_mem_x=mem_x, ltpf_mem_y=mem_y,
        ltpf_mem_pitch_int=lm["pitch_int"], ltpf_mem_pitch_fr=lm["pitch_fr"],
        ltpf_mem_gain=lm["gain"], ltpf_mem_beta_idx=lm["beta_idx"],
        ltpf_param_mem=lm["param"], plc_q_d_prev=q_d_prev,
        plc_nbLostCmpt=nb_lost, plc_prevBfi=prev_bfi,
        plc_prevprevBfi=prevprev_bfi, plc_cum_alpha=cum_alpha, plc_seed=seed,
        plc_scf_q=jnp.where((bfi != 1)[:, None], scf_q, st.plc_scf_q))

    aux = dict(bfi=bfi, bw_idx=side["bw_idx"], gg_idx=side["gg_idx"],
               spec=x)
    return st, y, aux


def round_pcm(y, bps: int = 16):
    """Float synthesis → integer PCM with saturation (dec_lc3_fl.c:116-128)."""
    def round_c(x):  # C round(): half away from zero
        return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)
    if bps == 16:
        return jnp.clip(round_c(y), -32768, 32767).astype(jnp.int16)
    scale = 2.0 ** (bps - 16)
    return round_c(y * scale).astype(jnp.int32)
