"""Batched LC3plus encoder: one frame step over [B] streams.

Mirrors the channel pipeline Enc_LC3_Channel_fl (enc_lc3_fl.c:13-160) as a
pure function over the EncState pytree. Everything is jit/vmap/shard_map
compatible; the frame loop belongs to the caller (lax.scan over time or a
host streaming loop).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import Config
from ..ops import analysis, ari, bits, quant, sns, tns, transforms
from .state import EncState

I32 = jnp.int32
F32 = jnp.float32

# named scopes mirror the WMOPS section names the fixed-point reference
# brackets each stage with (BASOP_sub_start, enc_lc3.c:81-249); they surface
# per-stage time shares in profiler traces (tools/profile.py)
_scope = jax.named_scope


def encode_frame(cfg: Config, st: EncState, pcm: jnp.ndarray):
    """pcm: [B, frame_length] float (16-bit range). Returns (st, bytes [B, nbytes] u8, aux)."""
    B = pcm.shape[0]
    x = pcm.astype(F32)

    with _scope("Mdct"):
        d, mdct_mem = transforms.mdct(cfg, x, st.mdct_mem)
    with _scope("Resamp12k8"):
        y12k8, mi, m50, mo = analysis.resample_12k8(
            cfg, x, st.r12k8_mem_in, st.r12k8_mem_50, st.r12k8_mem_out)
    with _scope("Olpa"):
        T0, nc, mem_pitch, ms12, ms6 = analysis.olpa(
            cfg, y12k8, st.olpa_mem_s12k8, st.olpa_mem_s6k4, st.olpa_mem_pitch)
    with _scope("LtpfCoder"):
        (ltpf_param, ltpf_bits, ltpf_mem_in, nc_out, mem_mem_nc, mem_on,
         pitch_out) = analysis.ltpf_encode(
            cfg, y12k8, T0, nc, st.ltpf_mem_in, st.ltpf_mem_normcorr,
            st.ltpf_mem_mem_normcorr, st.ltpf_mem_ltpf_on, st.ltpf_mem_pitch)
    with _scope("AttackDetector"):
        att, att_pos, att_acc, att_fmem = analysis.attack_detector(
            cfg, x, st.attdec_position, st.attdec_acc_energy,
            st.attdec_filter_mem)
    with _scope("PerBandEnergy"):
        ener = analysis.per_band_energy(cfg, d)
    with _scope("DetectCutoffWarped"):
        bw_idx = analysis.detect_cutoff_warped(cfg, ener)

    with _scope("SnsComputeScf"):
        scf = sns.compute_scf(cfg, ener, att)
    with _scope("SnsQuantizeScf"):
        scf_idx, scf_q = sns.quantize_scf_enc(cfg, scf)
    with _scope("SnsInterpolateScf"):
        gains = sns.interpolate_scf(cfg, scf_q, encoder_side=True)
    with _scope("MdctShaping"):
        d = sns.mdct_shaping(cfg, d, gains)

    if cfg.bandwidth:
        # bandwidth controller (enc_lc3_fl.c:94-97): forced cutoff after
        # shaping, and the signaled bandwidth index is clamped to match
        with _scope("CutoffBandwidth"):
            d = analysis.cutoff_bandwidth(cfg, d)
            bw_idx = jnp.minimum(bw_idx, cfg.bw_ctrl_index)

    with _scope("TnsCoder"):
        d, tns_order, tns_idx, num_tns, tns_bits = tns.tns_encode(cfg, d, bw_idx)

    target = cfg.targetBitsInit - (tns_bits + ltpf_bits)
    dy = d[:, : cfg.yLen]
    with _scope("EstimateGlobalGain"):
        gain, gg_idx, gg_min, tbo, otb = quant.estimate_global_gain(
            cfg, dy, target, st.targetBitsOff, st.mem_targetBits,
            st.mem_specBits)

    with _scope("QuantizeSpec"):
        xq = quant.quantize_spectrum(cfg, dy, gain)
        est = quant.bit_estimate(cfg, xq, target, mode=-1)
    mem_spec_bits = est["nbits"]

    with _scope("AdjustGlobalGain"):
        gg_idx2, gain2, gain_change = quant.adjust_global_gain(
            cfg, gg_idx, gg_min, gain, target, est["nbits"])
    with _scope("QuantizeSpec2"):
        xq2 = quant.quantize_spectrum(cfg, dy, gain2)
        est2 = quant.bit_estimate(cfg, xq2, target, mode=cfg.modeFlag)
    changed = gain_change == 1
    xq = jnp.where(changed[:, None], xq2, xq)
    gain_f = jnp.where(changed, gain2, gain)
    nbits2 = jnp.where(changed, est2["nbits2"], est["nbits2"])
    lastnz_wire = jnp.where(changed, est2["lastnz2"], est["lastnz2"])
    lastnz_raw = jnp.where(changed, est2["lastnz"], est["lastnz"])
    lsb_mode = jnp.where(changed, est2["lsbMode"], est["lsbMode"])
    xq = quant.truncate_spectrum(xq, lastnz_raw, lastnz_wire)

    cutoff_name = {100: "BW_cutoff_bin_all", 50: "BW_cutoff_bin_all_5ms",
                   25: "BW_cutoff_bin_all_2_5ms"}[cfg.frame_dms]
    from .. import tables as T
    bw_bin = jnp.asarray(T.t(cutoff_name), I32)[bw_idx]
    with _scope("NoiseFactor"):
        fac_ns_idx = quant.noise_factor(cfg, dy, xq, gain_f, bw_bin)

    with _scope("ResidualCoding"):
        res_bits, n_res = quant.residual_encode(
            cfg, dy, xq, gain_f, target, nbits2)
    n_res = jnp.where(lsb_mode == 0, n_res, 0)

    buf = jnp.zeros((B, cfg.targetBytes), I32)
    with _scope("EncoderEntropy"):
        buf, bp_side, mask_side = bits.pack_side_info(
            cfg, buf, bw_idx, lastnz_wire, lsb_mode, gg_idx2,
            num_tns, tns_order, ltpf_param, scf_idx, fac_ns_idx)
    with _scope("AriEncoder"):
        out = ari.encode(cfg, buf, bp_side, mask_side, xq, tns_order,
                         tns_idx, num_tns, lastnz_wire, lsb_mode, res_bits,
                         n_res)

    st = st.replace(
        mdct_mem=mdct_mem, r12k8_mem_in=mi, r12k8_mem_50=m50, r12k8_mem_out=mo,
        olpa_mem_s12k8=ms12, olpa_mem_s6k4=ms6, olpa_mem_pitch=mem_pitch,
        ltpf_mem_in=ltpf_mem_in, ltpf_mem_normcorr=nc_out,
        ltpf_mem_mem_normcorr=mem_mem_nc, ltpf_mem_ltpf_on=mem_on,
        ltpf_mem_pitch=pitch_out, attdec_filter_mem=att_fmem,
        attdec_acc_energy=att_acc, attdec_detected=att, attdec_position=att_pos,
        targetBitsOff=tbo, mem_targetBits=otb, mem_specBits=mem_spec_bits)
    aux = dict(bw_idx=bw_idx, gain=gain_f, xq=xq, lastnz=lastnz_wire,
               lsb_mode=lsb_mode, fac_ns_idx=fac_ns_idx, tns_order=tns_order,
               ltpf_param=ltpf_param)
    return st, out.astype(jnp.uint8), aux
