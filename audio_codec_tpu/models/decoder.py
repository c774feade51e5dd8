"""Batched LC3plus decoder: one frame step over [B] streams.

Mirrors Dec_LC3_Channel (dec_lc3.c:60-322, float dec_lc3_fl.c:13-130) as a
pure function over the DecState pytree: entropy parse → arithmetic decode →
SNS decode → partial concealment → residual → noise filling → global gain →
TNS synthesis → SNS shaping → PLC → IMDCT/OLA → LTPF postfilter → PCM
rounding. Bad frames (bfi=1 from transport or BER detection) are concealed
per stream; partially corrupt frames (bfi=2, from the channel coder's PC
codewords or G.192 redundancy frames) synthesize only the suspect spectral
region from the previous frame (ops/pc.py).
"""
from __future__ import annotations

import jax.numpy as jnp

from .. import tables as T
from ..config import Config
from ..ops import ari, bits, ltpf_dec, pc, plc, quant, sns, tns, transforms
from .state import DecState

I32 = jnp.int32
F32 = jnp.float32


def decode_frame(cfg: Config, st: DecState, frame_bytes: jnp.ndarray,
                 bfi_ext: jnp.ndarray | None = None,
                 be_bp_left: jnp.ndarray | None = None,
                 be_bp_right: jnp.ndarray | None = None):
    """frame_bytes: [B, nbytes] uint8/int32. bfi_ext: [B] i32 — 0 good,
    1 lost, 2 partially corrupt (with be_bp_left/right bit positions from
    the channel decoder), 3 redundancy frame (G.192, dec_lc3.c:105-112).
    Returns (st, pcm [B, frame_length] float in 16-bit range, aux)."""
    buf = frame_bytes.astype(I32)
    B = buf.shape[0]
    N = cfg.yLen
    bfi = jnp.zeros((B,), I32) if bfi_ext is None else bfi_ext.astype(I32)
    rframe = (bfi == 3).astype(I32)
    bfi = jnp.where(bfi == 3, 2, bfi)

    side = bits.parse_side_info(cfg, buf)
    dec = ari.decode(cfg, buf, side, bfi_in=bfi, be_bp_left=be_bp_left,
                     be_bp_right=be_bp_right)
    # side-parse failures and transport loss dominate; the ari decoder's
    # bfi already folds in the input bfi==2 / PC classification
    bfi = jnp.where(side["bfi"] == 1, 1,
                    jnp.where(bfi == 1, 1, dec["bfi"]))
    spec_inv_idx = jnp.where(bfi == 2, dec["spec_inv_idx"],
                             jnp.full((B,), N, I32))

    cutoff_name = {100: "BW_cutoff_bin_all", 50: "BW_cutoff_bin_all_5ms",
                   25: "BW_cutoff_bin_all_2_5ms"}[cfg.frame_dms]
    bw_bin_tab = jnp.asarray(T.t(cutoff_name), I32)
    bw_bin = bw_bin_tab[side["bw_idx"]]

    # G.192 redundancy frame: whole decoded spectrum is suspect
    # (ENABLE_RFRAME, dec_lc3.c:144-152)
    rf = (rframe == 1) & (dec["zero_frame"] == 0) & (bfi != 1)
    bfi = jnp.where(rf, 2, bfi)
    spec_inv_idx = jnp.where(rf, jnp.maximum(side["lastnz"], bw_bin),
                             spec_inv_idx)

    good = bfi != 1
    x = dec["x"].astype(F32)
    scf_q = sns.quantize_scf_dec(side["scf_idx"])

    # ---- partial concealment (pc_main_fx.c:17-56) ----
    stab_fac = pc.compute_stab_fac(scf_q, st.plc_scf_q, st.plc_old_scf_q,
                                   bfi, st.plc_prevBfi, st.plc_prevprevBfi)
    bfi = jnp.where(good, pc.pc_classify(cfg, bfi, spec_inv_idx, stab_fac,
                                         side["ltpf_param"][:, 0],
                                         st.plc_q_d_prev, st.pc_q_old_res),
                    bfi)
    good = bfi != 1
    x, pc_fac, pc_nb_lost = pc.pc_apply(
        cfg, bfi, x, st.pc_q_old_res, st.plc_q_d_prev, spec_inv_idx,
        side["gg_idx"], st.pc_prev_gg, st.pc_nb_lost)
    bw_idx_nf = side["bw_idx"]
    q_old_res, pc_prev_gg, bw_idx_nf, pc_prev_bw, pc_prev_fac_ns = \
        pc.pc_update(cfg, bfi, rframe, x, spec_inv_idx, side["gg_idx"],
                     pc_fac, bw_idx_nf, st.pc_q_old_res, st.pc_prev_gg,
                     st.pc_prev_bw_idx, st.pc_prev_fac_ns,
                     side["fac_ns_idx"])
    pc_nb_lost = jnp.where(bfi == 0, 0, pc_nb_lost)

    x = jnp.where((dec["residual_present"] == 1)[:, None] & good[:, None],
                  quant.residual_decode(cfg, x, dec["res_bits"],
                                        dec["n_res"]), x)

    bw_bin_nf = bw_bin_tab[bw_idx_nf]
    nf = quant.noise_filling(cfg, x, dec["nf_seed"], side["fac_ns_idx"],
                             bw_bin_nf, spec_inv_idx, st.pc_prev_fac_ns)
    x = jnp.where((dec["zero_frame"] == 0)[:, None] & good[:, None], nf, x)

    x = jnp.where(good[:, None], quant.apply_global_gain(cfg, x, side["gg_idx"]), x)
    x = jnp.where(good[:, None],
                  tns.tns_decode(cfg, x, dec["tns_idx"], dec["tns_order"],
                                 side["num_tns"], side["bw_idx"]), x)
    gains = sns.interpolate_scf(cfg, scf_q, encoder_side=False)
    x = jnp.where(good[:, None], sns.mdct_shaping(cfg, x, gains), x)

    # PLC (method 0, every frame; conceal iff bfi == 1)
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
        plc_old_scf_q=st.plc_scf_q,
        plc_scf_q=jnp.where((bfi != 1)[:, None], scf_q, st.plc_scf_q),
        pc_q_old_res=q_old_res, pc_prev_gg=pc_prev_gg,
        pc_prev_bw_idx=pc_prev_bw, pc_prev_fac_ns=pc_prev_fac_ns,
        pc_nb_lost=pc_nb_lost)

    aux = dict(bfi=bfi, bw_idx=side["bw_idx"], gg_idx=side["gg_idx"],
               spec=x, spec_inv_idx=spec_inv_idx)
    return st, y, aux


def round_pcm(y, bps: int = 16):
    """Float synthesis → integer PCM with saturation (dec_lc3_fl.c:116-128)."""
    def round_c(x):  # C round(): half away from zero
        return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)
    if bps == 16:
        return jnp.clip(round_c(y), -32768, 32767).astype(jnp.int16)
    scale = 2.0 ** (bps - 16)
    return round_c(y * scale).astype(jnp.int32)
