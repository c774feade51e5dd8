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

import jax
import jax.numpy as jnp

from .. import tables as T
from ..config import Config
from ..ops import ari, bits, ltpf_dec, pc, plc, plc_adv, plc_phecu, quant
from ..ops import sns, transforms
from ..ops import tns
from .state import DecState

I32 = jnp.int32
F32 = jnp.float32


def decode_entropy(cfg: Config, frame_bytes: jnp.ndarray,
                   bfi_ext: jnp.ndarray | None = None,
                   be_bp_left: jnp.ndarray | None = None,
                   be_bp_right: jnp.ndarray | None = None):
    """Stateless entropy phase: side parse + arithmetic decode over [B]
    frames. Has no dependence on DecState, so callers holding several
    frames per stream may flatten [T, B] -> [T*B] and run it once —
    the range decoder's sequential symbol loop then amortizes over T*B
    lanes instead of being re-entered T times (see decode_block)."""
    buf = frame_bytes.astype(I32)
    B = buf.shape[0]
    bfi = jnp.zeros((B,), I32) if bfi_ext is None else bfi_ext.astype(I32)
    bfi_in = jnp.where(bfi == 3, 2, bfi)
    with jax.named_scope("DecoderEntropy"):
        side = bits.parse_side_info(cfg, buf)
    with jax.named_scope("AriDecoder"):
        dec = ari.decode(cfg, buf, side, bfi_in=bfi_in,
                         be_bp_left=be_bp_left, be_bp_right=be_bp_right)
    return side, dec


def decode_frame(cfg: Config, st: DecState, frame_bytes: jnp.ndarray,
                 bfi_ext: jnp.ndarray | None = None,
                 be_bp_left: jnp.ndarray | None = None,
                 be_bp_right: jnp.ndarray | None = None):
    """frame_bytes: [B, nbytes] uint8/int32. bfi_ext: [B] i32 — 0 good,
    1 lost, 2 partially corrupt (with be_bp_left/right bit positions from
    the channel decoder), 3 redundancy frame (G.192, dec_lc3.c:105-112).
    Returns (st, pcm [B, frame_length] float in 16-bit range, aux)."""
    side, dec = decode_entropy(cfg, frame_bytes, bfi_ext,
                               be_bp_left, be_bp_right)
    return decode_synthesis(cfg, st, side, dec, bfi_ext)


def decode_synthesis(cfg: Config, st: DecState, side, dec,
                     bfi_ext: jnp.ndarray | None = None):
    """Stateful phase of the decode step, consuming decode_entropy's
    (side, dec). Everything from partial concealment through LTPF."""
    B = dec["x"].shape[0]
    N = cfg.yLen
    bfi = jnp.zeros((B,), I32) if bfi_ext is None else bfi_ext.astype(I32)
    rframe = (bfi == 3).astype(I32)
    bfi = jnp.where(bfi == 3, 2, bfi)

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

    with jax.named_scope("ApplyGlobalGain"):
        x = jnp.where(good[:, None],
                      quant.apply_global_gain(cfg, x, side["gg_idx"]), x)
    with jax.named_scope("TnsDecoder"):
        x = jnp.where(good[:, None],
                      tns.tns_decode(cfg, x, dec["tns_idx"], dec["tns_order"],
                                     side["num_tns"], side["bw_idx"]), x)
    with jax.named_scope("MdctShapingDec"):
        gains = sns.interpolate_scf(cfg, scf_q, encoder_side=False)
        x = jnp.where(good[:, None], sns.mdct_shaping(cfg, x, gains), x)

    adv = {}
    if cfg.plc_mode == 0:
        # PLC (method 0, every frame; conceal iff bfi == 1)
        x, q_d_prev, nb_lost, cum_alpha, seed = plc.plc_main(
            cfg, x, st.plc_q_d_prev, bfi, st.plc_nbLostCmpt,
            st.plc_cum_alpha, st.plc_seed)
    else:
        x, q_d_prev, nb_lost, cum_alpha, seed, adv = _plc_advanced(
            cfg, st, x, bfi, side, spec_inv_idx, stab_fac)

    # bins above yLen are always zero at the IMDCT input (dec_lc3_fl.c keeps
    # sqQdec_fl sized MAX_LEN but only writes yLen entries)
    if cfg.frame_length > N:
        x_full = jnp.pad(x, ((0, 0), (0, cfg.frame_length - N)))
    else:
        x_full = x
    with jax.named_scope("Imdct"):
        pcm, imdct_mem = transforms.imdct(cfg, x_full, st.imdct_mem)
    if cfg.plc_mode and "tdc_pcm" in adv:
        tdc_lane = adv["tdc_lane"][:, None]
        pcm = jnp.where(tdc_lane, adv["tdc_pcm"], pcm)
        imdct_mem = jnp.where(tdc_lane, adv["tdc_ola"], imdct_mem)

    nb_lost, cum_alpha, prev_bfi, prevprev_bfi = plc.plc_update(
        bfi, nb_lost, cum_alpha, st.plc_prevBfi, st.plc_prevprevBfi)

    with jax.named_scope("LtpfDecoder"):
        y, mem_x, mem_y, lm = ltpf_dec.ltpf_decode(
            cfg, pcm, bfi, side["ltpf_param"], st.ltpf_param_mem,
            st.ltpf_mem_x, st.ltpf_mem_y, st.ltpf_mem_pitch_int,
            st.ltpf_mem_pitch_fr, st.ltpf_mem_gain, st.ltpf_mem_beta_idx)

    if cfg.plc_mode:
        st = st.replace(
            plc_x_old_tot=plc_adv.update_pcm_hist(st.plc_x_old_tot, pcm),
            **{k: v for k, v in adv.items() if not k.startswith("tdc_")})

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


def decode_block(cfg: Config, st: DecState, frames: jnp.ndarray,
                 bfi_ext: jnp.ndarray | None = None):
    """Decode T frames of B streams: frames [T, B, nbytes] -> pcm
    [T, B, frame_length].

    The entropy phase (side parse + range decode) is frame-independent,
    so it runs ONCE over the flattened T*B batch — the range decoder's
    sequential, latency-bound symbol loop executes its ~O(bits) trips a
    single time with T-fold wider lanes instead of T times. Only the
    synthesis phase (PC/PLC state, IMDCT OLA, LTPF memories) scans over
    T. On a latency-bound accelerator this is the difference between
    ~O(T * bits) and ~O(bits + T * matmul) sequential steps per block.
    """
    T_, B, nb = frames.shape
    flat_bfi = None if bfi_ext is None else bfi_ext.reshape(T_ * B)
    side, dec = decode_entropy(cfg, frames.reshape(T_ * B, nb), flat_bfi)
    side_t = jax.tree.map(lambda a: a.reshape(T_, B, *a.shape[1:]), side)
    dec_t = jax.tree.map(lambda a: a.reshape(T_, B, *a.shape[1:]), dec)
    bfi_t = (jnp.zeros((T_, B), I32) if bfi_ext is None
             else bfi_ext.astype(I32))

    def body(st, inp):
        side_f, dec_f, bfi_f = inp
        st, pcm, _ = decode_synthesis(cfg, st, side_f, dec_f, bfi_f)
        return st, pcm

    return jax.lax.scan(body, st, (side_t, dec_t, bfi_t))


def _plc_advanced(cfg: Config, st: DecState, x, bfi, side, spec_inv_idx,
                  stab_fac):
    """Advanced PLC dispatch (processPLCclassify/apply, plc_apply_fx.c):
    per-lane method select on the first loss of a burst, TD-PLC for pitched
    stable signals, damped/scrambled noise substitution otherwise, plus the
    bfi==2 damping/scrambling of partially concealed spectra.

    Returns (x, q_d_prev, nb_lost, cum_alpha, seed, adv) where adv carries
    DecState field updates and the TDC time-domain override."""
    B, N = x.shape
    lost = bfi == 1
    nb_cur = jnp.where(lost, st.plc_nbLostCmpt + 1, st.plc_nbLostCmpt)
    first = lost & (nb_cur == 1)
    pitch_int = st.ltpf_mem_pitch_int

    meth_new, nc = plc_adv.classify(cfg, st.plc_x_old_tot, st.plc_scf_q,
                                    pitch_int)
    phecu_on = cfg.frame_dms == 100  # classifier emits 2 at 10 ms only
    if not phecu_on:
        meth_new = jnp.where(meth_new == 2, 4, meth_new)
    meth = jnp.where(first, meth_new, st.plc_meth)
    tdc_lane = lost & (meth == 3)
    ph_lane = lost & (meth == 2)
    ns_lane = lost & (meth != 3) & (meth != 2)

    # ---- TD-PLC (method 3) ----
    a = jnp.where(first[:, None], plc_adv.tdc_lpc(cfg, st.plc_q_d_prev),
                  st.plc_tdc_a)
    fract = jnp.where(first, st.ltpf_mem_pitch_fr, st.plc_tdc_fract)
    tdc = plc_adv.tdc_apply(
        cfg, pitch_int, fract, a, st.plc_x_old_tot, nb_cur, stab_fac,
        st.plc_tdc_seed, st.plc_tdc_gain_c, st.plc_tdc_alpha,
        st.plc_harmonic, st.plc_synth_hist, st.plc_harmonic_len, tdc_lane)
    tdc_pcm = tdc["synth"][:, : cfg.frame_length]
    tdc_ola = plc_adv.tdac(cfg, tdc["synth"])

    # ---- Phase ECU (method 2): FFT phase evolution (plc_phecu.py) ----
    ph = None
    if phecu_on:
        ph = plc_phecu.apply(
            cfg, st.phecu_f0est, st.phecu_X_sav, st.phecu_num_plocs,
            st.phecu_mag_chg_1st, st.phecu_Xavg, st.phecu_beta_mute,
            st.phecu_is_trans, st.plc_x_old_tot, nb_cur,
            first & (meth == 2), ph_lane, nc)

    # ---- noise substitution (method 4) on the last good shaped spectrum
    ns_spec = plc_adv.noise_substitution(st.plc_q_d_prev)
    x = jnp.where(ns_lane[:, None], ns_spec, x)

    # ---- damping + scrambling: bfi==1 NS lanes, then bfi==2 PC lanes
    zero_inv = jnp.zeros((B,), I32)
    x, cum_fflc, cum_slow, cum_fast, ns_seed = plc_adv.damping_scrambling(
        cfg, x, nb_cur, stab_fac, scramble=ns_lane, cum_fflc=st.plc_cum_fflc,
        cum_slow=st.plc_cum_slow, cum_fast=st.plc_cum_fast,
        pitch_present=(pitch_int > 0).astype(I32), seed=st.plc_ns_seed,
        spec_inv_idx=zero_inv, active=lost)
    is_pc = bfi == 2
    x, cum_fflc, cum_slow, cum_fast, pc_seed = plc_adv.damping_scrambling(
        cfg, x, st.pc_nb_lost, stab_fac, scramble=is_pc, cum_fflc=cum_fflc,
        cum_slow=cum_slow, cum_fast=cum_fast,
        pitch_present=side["ltpf_param"][:, 0], seed=st.pc_seed,
        spec_inv_idx=spec_inv_idx, active=is_pc)

    # history: keep the last good spectrum through a burst; bfi==2 frames
    # store their scrambled spectrum (processPLCupdateSpec after
    # DampingScrambling, plc_damping_scrambling_fx.c:44-48)
    q_d_prev = jnp.where(lost[:, None], st.plc_q_d_prev, x)

    adv = dict(plc_meth=meth, plc_tdc_a=a, plc_tdc_seed=tdc["seed"],
               plc_tdc_gain_c=tdc["gain_c"], plc_tdc_alpha=tdc["alpha"],
               plc_tdc_fract=tdc["fract"], plc_harmonic=tdc["harmonic_buf"],
               plc_harmonic_len=tdc["harmonic_len"],
               plc_synth_hist=tdc["synth_hist"], plc_cum_fflc=cum_fflc,
               plc_cum_slow=cum_slow, plc_cum_fast=cum_fast,
               plc_ns_seed=ns_seed, pc_seed=pc_seed,
               tdc_pcm=tdc_pcm, tdc_ola=tdc_ola, tdc_lane=tdc_lane)
    if ph is not None:
        # time-domain override lanes: TDC or Phase ECU
        adv["tdc_pcm"] = jnp.where(tdc_lane[:, None], tdc_pcm, ph["pcm"])
        adv["tdc_ola"] = jnp.where(tdc_lane[:, None], tdc_ola, ph["ola"])
        adv["tdc_lane"] = tdc_lane | ph_lane
        adv.update({k: v for k, v in ph.items() if k.startswith("phecu_")})
    return (x, q_d_prev, nb_cur, st.plc_cum_alpha, st.plc_seed, adv)


def round_pcm(y, bps: int = 16):
    """Float synthesis → integer PCM with saturation (dec_lc3_fl.c:116-128)."""
    def round_c(x):  # C round(): half away from zero
        return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)
    if bps == 16:
        return jnp.clip(round_c(y), -32768, 32767).astype(jnp.int16)
    scale = 2.0 ** (bps - 16)
    return round_c(y * scale).astype(jnp.int32)
