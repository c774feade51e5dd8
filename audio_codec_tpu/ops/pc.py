"""Partial concealment: conceal only the corrupted spectral region.

When the channel decoder flags a frame bfi==2 (uncorrectable errors
confined to PC codewords, or a G.192 redundancy frame), the arithmetic
decoder reports the first suspect bin `spec_inv_idx`; everything above it
is synthesized from the previous frame's residual spectrum with an energy
rescaling factor. Float translation of the fixed-point-only reference
chain: processPCmain_fx (pc_main_fx.c:17-56), processPCclassify_fx /
peakDetector_fx (pc_classify_fx.c:19-299), processPCapply_fx
(pc_apply_fx.c:20-215), processPCupdate_fx (pc_update_fx.c:17-90), and
the stability factor (plc_update_aft_imdct_fx.c:169-230).
All arrays are [B, ...] batched over streams; control flow is masked.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config import Config

I32 = jnp.int32
F32 = jnp.float32

_BLOCK = 3   # peakDetector BLOCK_SIZE
_THR1 = 8


def compute_stab_fac(scf_q, old_scf, old_old_scf, bfi, prev_bfi,
                     prev_prev_bfi):
    """Scale-factor stability in [0,1] (processPLCcomputeStabFac_main).

    bfi==1 frames use the two previous good frames; bfi==2 uses the
    current vs previous. Returns [B] float32 (1 = stable)."""
    def stab(a, b, pbfi):
        d = jnp.sum((a - b) ** 2, axis=-1)
        s = jnp.clip(1.25 - d / 25.0, 0.0, 1.0)
        return jnp.where(pbfi == 1, 0.8, s)

    s1 = stab(old_scf, old_old_scf, prev_prev_bfi)  # bfi==1 & prev_bfi!=1
    s2 = stab(scf_q, old_scf, prev_bfi)             # bfi==2
    out = jnp.ones(scf_q.shape[0], F32)
    out = jnp.where((bfi == 1) & (prev_bfi != 1), s1, out)
    out = jnp.where(bfi == 2, s2, out)
    return out


def _peak_detector(sig):
    """peakDetector_fx (pc_classify_fx.c:150-299): crossover bin below
    which a dominant spectral peak sits. sig: [B, N] -> xover [B] i32."""
    B, N = sig.shape
    a = jnp.abs(sig)
    mean_nrg = _BLOCK * _THR1 * jnp.mean(sig ** 2, axis=1)     # [B]
    sq = sig ** 2
    # centered 3-block energies for every start i: sum(sq[i:i+3])
    blk = sq[:, :-2] + sq[:, 1:-1] + sq[:, 2:]                 # [B, N-2]

    xover = jnp.zeros((B,), I32)
    max_peak = jnp.zeros((B,), F32)

    # i == 0 edge block (first two bins, halved weight in the reference's
    # exponent bookkeeping -> block energy of 2 bins)
    edge_cent = sq[:, 0] + sq[:, 1]
    cond0 = (a[:, 0] >= a[:, 1]) & (edge_cent > mean_nrg)
    cur0 = jnp.maximum(a[:, 0], a[:, 1])
    nxt0 = jnp.max(a[:, _BLOCK - 1:_BLOCK + 2], axis=1)
    hit0 = cond0 & (cur0 > nxt0)
    max_peak = jnp.where(hit0, edge_cent, max_peak)
    xover = jnp.where(hit0, 1, xover)

    # main sweep: local max at i+1 with block energy above threshold
    # (the C runs i = 0..BLOCK-1 with a truncated prev window, then
    # i = BLOCK..yLen-2*BLOCK)
    idx = jnp.arange(0, N - 2 * _BLOCK + 1)                    # i in C loop
    # local-max condition |x[i+1]| >= |x[i]| and >= |x[i+2]|
    def win_max(lo_off, hi_off):
        # max of |sig| over [i+lo_off, i+hi_off] for each i (3-wide)
        cols = [jnp.abs(sig[:, idx + o]) for o in range(lo_off, hi_off + 1)]
        return jnp.maximum(jnp.maximum(cols[0], cols[1]), cols[2])

    locmax = (a[:, idx + 1] >= a[:, idx]) & (a[:, idx + 1] >= a[:, idx + 2])
    cent = blk[:, idx]
    cur = win_max(0, 2)
    prv = win_max(-_BLOCK, -_BLOCK + 2)
    # for i < BLOCK the reference only maxes over j > 0
    small = idx[None, :] < _BLOCK
    prv_small = jnp.zeros_like(prv)
    for j in range(-_BLOCK, 0):
        valid = (idx + j > 0)[None, :]
        prv_small = jnp.where(valid,
                              jnp.maximum(prv_small, jnp.abs(sig[:, jnp.clip(idx + j, 0, N - 1)])),
                              prv_small)
    prv = jnp.where(small, prv_small, prv)
    nxt = win_max(_BLOCK, _BLOCK + 2)
    cand = locmax & (cent > mean_nrg[:, None]) & (cur >= prv) & (cur > nxt)

    # sequential hysteresis: maxPeak carries; a candidate updates xover if
    # cent >= maxPeak (and updates maxPeak) or cent > 0.3 * maxPeak
    def body(carry, k):
        xover, max_peak = carry
        c = cand[:, k]
        ce = cent[:, k]
        take_full = c & (ce >= max_peak)
        take_hyst = c & ~take_full & (ce > 0.3 * max_peak)
        max_peak = jnp.where(take_full, ce, max_peak)
        xo = idx[k] + _BLOCK - 1
        xover = jnp.where(take_full | take_hyst, xo, xover)
        return (xover, max_peak), None

    import jax
    (xover, max_peak), _ = jax.lax.scan(body, (xover, max_peak),
                                        jnp.arange(idx.shape[0]))
    return xover


def pc_classify(cfg: Config, bfi, spec_inv_idx, stab_fac, pitch_present,
                q_old_d, q_old_res):
    """processPCclassify_fx: downgrade bfi 2 -> 1 (full loss) when the
    corrupt region is too low-frequency to conceal partially."""
    N = cfg.yLen
    low_region = spec_inv_idx * 10 < 4 * cfg.frame_dms
    unstable = stab_fac < 0.5

    max_pitch_bin = 4 if cfg.frame_dms == 50 else 8
    xover = _peak_detector(q_old_d)
    pitch_bad = (spec_inv_idx < xover) | (spec_inv_idx < max_pitch_bin)

    kidx = jnp.arange(N)[None, :]
    low_mask = kidx < spec_inv_idx[:, None]
    part = jnp.sum(jnp.where(low_mask, q_old_res ** 2, 0.0), axis=1)
    full = jnp.sum(q_old_res ** 2, axis=1)
    nrg_bad = part < 0.3 * full

    bad = jnp.where(unstable, True,
                    jnp.where(pitch_present == 1, pitch_bad, nrg_bad))
    return jnp.where((bfi == 2) & low_region & bad, 1, bfi)


def _global_gain(cfg: Config, gg_idx):
    """10^((gg_idx + gg_off)/28) (processApplyGlobalGain)."""
    return jnp.power(10.0, (gg_idx + cfg.quantizedGainOff).astype(F32) / 28.0)


def pc_apply(cfg: Config, bfi, x, q_old_res, q_old_d, spec_inv_idx, gg_idx,
             prev_gg, nb_lost):
    """processPCapply_fx: synthesize bins >= spec_inv_idx from the previous
    residual spectrum with an energy-matched factor.

    x: [B, N] current raw residual spectrum (integer-valued floats).
    Returns (x', fac, nb_lost')."""
    B, N = x.shape
    act = bfi == 2
    nb_lost = nb_lost + act.astype(I32)
    gg = _global_gain(cfg, gg_idx)

    kidx = jnp.arange(N)[None, :]
    low_mask = (kidx < spec_inv_idx[:, None]).astype(F32)
    n_low = jnp.maximum(spec_inv_idx.astype(F32), 1.0)
    n_high = jnp.maximum((N - spec_inv_idx).astype(F32), 1.0)
    mean_low = jnp.sum(low_mask * q_old_d ** 2, axis=1)
    mean_high = jnp.sum((1 - low_mask) * q_old_d ** 2, axis=1)
    # equalize counts by scaling the larger-count sum down (pc_apply_fx
    # multiplies by the count ratio < 1)
    mean_high = jnp.where(spec_inv_idx < N - spec_inv_idx,
                          mean_high * n_low / n_high, mean_high)
    mean_low = jnp.where(spec_inv_idx < N - spec_inv_idx, mean_low,
                         mean_low * n_high / n_low)

    ener_prev = jnp.sum(low_mask * q_old_res ** 2, axis=1)
    ener_curr = jnp.sum(low_mask * x ** 2, axis=1)
    fac = jnp.where(ener_prev > 0,
                    jnp.sqrt(jnp.minimum(ener_curr / jnp.maximum(ener_prev, 1e-30), 1.0)),
                    1.0)
    fac_local = jnp.where(
        (mean_low <= mean_high)
        | (ener_prev * prev_gg ** 2 <= ener_curr * gg ** 2),
        prev_gg / jnp.maximum(gg, 1e-30), fac)

    synth = q_old_res * fac_local[:, None]
    synth = jnp.where(jnp.abs(synth) < 0.625, 0.0, synth)
    x_out = jnp.where(act[:, None] & (kidx >= spec_inv_idx[:, None]),
                      synth, x)
    return x_out, jnp.where(act, fac, 1.0), nb_lost


def pc_update(cfg: Config, bfi, rframe, x, spec_inv_idx, gg_idx, fac,
              bw_idx_nf, st_q_old_res, st_prev_gg, st_prev_bw,
              st_prev_fac_ns, fac_ns_idx):
    """processPCupdate_fx: refresh the PC history after a non-lost frame.

    Returns (q_old_res', prev_gg', bw_idx_nf', prev_bw', prev_fac_ns')."""
    act = bfi != 1
    gg = _global_gain(cfg, gg_idx)
    prev_gg = jnp.where(act, gg, st_prev_gg)
    q_old_res = jnp.where(act[:, None], x, st_q_old_res)

    plain = act & (rframe == 0)
    prev_bw = jnp.where(plain, bw_idx_nf, st_prev_bw)
    prev_fac_ns = jnp.where(plain, (8.0 - fac_ns_idx.astype(F32)) / 16.0,
                            st_prev_fac_ns)
    # redundancy frames with a bandwidth mismatch keep the previous NF
    # bandwidth and damp the NF level by the PC factor
    redo = act & (rframe != 0) & (bfi == 2) & (bw_idx_nf != st_prev_bw) \
        & (spec_inv_idx < cfg.yLen)
    bw_out = jnp.where(redo, st_prev_bw, bw_idx_nf)
    damped = jnp.clip(st_prev_fac_ns * fac, 0.0625, 0.5)
    prev_fac_ns = jnp.where(redo, damped, prev_fac_ns)
    return q_old_res, prev_gg, bw_out, prev_bw, prev_fac_ns
