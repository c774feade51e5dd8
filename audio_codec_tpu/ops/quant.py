"""Spectral quantization: global gain loop, quantizer + context bit estimate,
noise factor, residual coding, and the decoder-side inverses.

Reference (SURVEY.md §2.1/2.2):
- processEstimateGlobalGain_fl (estimate_global_gain.c:30-137): the 8-step
  bisection is kept verbatim; the reference's backward iszero-tracking inner
  loop becomes a vectorized suffix test (max-index trick) per iteration.
- processQuantizeSpec_fl (quantize_spec.c:26-197): the per-2-tuple context
  recursion runs as a lax.scan over tuples with [B] carry; the level loop is
  replaced by closed-form level counts + a fixed unrolled table walk.
- processAdjustGlobalGain_fl (adjust_global_gain.c:13-50)
- processNoiseFactor_fl (noise_factor.c:13-108)
- processResidualCoding_fl / processResidualDecoding_fl
- processApplyGlobalGain_fl, processNoiseFilling_fl (noise_filling.c:13-80)
  with the LCG advanced in closed form per zero-line rank.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .. import tables as T
from ..config import Config

F32 = jnp.float32
I32 = jnp.int32


def round_c(x):
    """C round(): half away from zero (jnp.round is half-even)."""
    return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)
NBITS_CTX_MAX_LEV = 13


# ---------------------------------------------------------------------------
# global gain estimate
# ---------------------------------------------------------------------------

def estimate_global_gain(cfg: Config, x, nbitsSQ, targetBitsOff, old_targetBits,
                         old_specBits):
    """Returns (gain [B], gg_ind [B], gg_min [B], new_targetBitsOff,
    new_old_targetBits) — processEstimateGlobalGain_fl."""
    B, lg = x.shape
    u = F32(28.0 / 20.0)

    valid = old_targetBits >= 0
    tmp = jnp.clip(targetBitsOff + old_targetBits.astype(F32) - old_specBits.astype(F32),
                   -40.0, 40.0)
    targetBitsOff = jnp.where(valid, 0.8 * targetBitsOff + 0.2 * tmp,
                              jnp.zeros_like(targetBitsOff))
    new_old_targetBits = jnp.full((B,), nbitsSQ, I32)
    nbits_adj = nbitsSQ + round_c(targetBitsOff).astype(I32)

    x_max = jnp.max(jnp.abs(x), axis=-1)

    reg_val = jnp.zeros((B,), F32)
    if cfg.hrmode and cfg.regBits > 0:
        i = jnp.arange(lg, dtype=F32)[None, :]
        M0 = 1e-5 + jnp.sum(jnp.abs(x), axis=-1)
        M1 = 1e-5 + jnp.sum(i * jnp.abs(x), axis=-1)
        thresh = 2 * cfg.frame_ms
        rB_offset = 8.0 * (1.0 - jnp.minimum(M1 / M0, thresh) / thresh)
        reg_val = x_max * jnp.exp2(-cfg.regBits - rB_offset)

    if cfg.hrmode:
        g_min = x_max / (32768.0 * 256.0 - 2.0)
    else:
        g_min = x_max / (32768.0 - 0.375)
    ind_min = jnp.ceil(28.0 * jnp.log10(jnp.maximum(g_min, 1e-38))).astype(I32)

    # en[j]: the C computes x[4j]^2+..+x[4j+3]^2 by sequential f32 adds and
    # the log expression in double rounded once to float
    # (estimate_global_gain.c:84-91); match the f32 add order exactly — any
    # reassociation shifts en/ener by ~1e-4 and flips near-tie bisection
    # comparisons (a single flipped frame costs the sqam encode leg a full
    # RMS bit, CONFORMANCE_r04 sqam_thetest24_48000).
    xx = (x * x).reshape(B, lg // 4, 4)
    e4 = ((xx[..., 0] + xx[..., 1]) + xx[..., 2]) + xx[..., 3]
    larg = (e4 + reg_val[:, None]) + F32(2.0 ** -31)
    en = F32(28.0 / 20.0) * (F32(7.0) + F32(10.0) * jnp.log10(larg))

    target = F32(1.9599999999999997) * nbits_adj.astype(F32)  # (28/20)*1.4 dbl
    offset = jnp.full((B,), 255 + cfg.quantizedGainOff, I32)
    fac = 256
    # backward sequential f32 accumulation of ener with the C's iszero gap
    # filling (estimate_global_gain.c:102-125); offset and fac stay integral
    # (offset is LC3_INT, fac halves 128..1), so i32 state is exact
    en_rev = jnp.flip(en, axis=-1).T  # [M, B] scan xs, j = M-1 .. 0
    c_low = F32(9.8)     # f32 compare equivalent to tmp < 7*(28/20) in dbl
    c_gap = F32(3.78)    # (2.7)*(28/20) in dbl, rounded to f32
    c_hi = F32(70.0)     # tmp > 50*(28/20) dbl  <=>  tmp >= 70.0f
    for _ in range(8):
        fac //= 2
        offset = offset - fac
        offs_f = offset.astype(F32)

        def body(carry, en_j):
            ener, iszero = carry
            tmp = en_j - offs_f
            low = tmp < c_low
            gap_add = jnp.where(low & ~iszero, c_gap, F32(0.0))
            hi_add = jnp.where(tmp >= c_hi, (F32(2.0) * tmp - c_hi), tmp)
            ener = jnp.where(low, ener + gap_add, ener + hi_add)
            iszero = iszero & low
            return (ener, iszero), None

        (ener, iszero), _ = jax.lax.scan(
            body, (jnp.zeros((B,), F32), jnp.ones((B,), bool)), en_rev)
        offset = offset + jnp.where((ener > target) & ~iszero, fac, 0)

    offset = offset.astype(F32)

    below = offset < ind_min.astype(F32)
    zero_in = x_max == 0
    new_old_targetBits = jnp.where(below | zero_in, -1, new_old_targetBits)
    ind = jnp.where(zero_in, 0,
                    jnp.maximum(ind_min.astype(F32), offset) - cfg.quantizedGainOff)
    ind_min = jnp.where(zero_in, cfg.quantizedGainOff, ind_min)
    gain = jnp.power(F32(10.0), (ind + cfg.quantizedGainOff) / 28.0)
    return gain, ind.astype(I32), ind_min, targetBitsOff, new_old_targetBits


# ---------------------------------------------------------------------------
# spectral quantizer + context-model bit estimate
# ---------------------------------------------------------------------------

def quantize_spectrum(cfg: Config, x, gain):
    """Quantize x by gain with 0.375 dead-zone offset → xq [B, N] i32."""
    offset = 0.5 if cfg.hrmode else 0.375
    q = x / gain[:, None]
    return jnp.trunc(q + offset * jnp.sign(q)).astype(I32)


def bit_estimate(cfg: Config, xq, target, mode):
    """Context bit estimator (quantize_spec.c:78-168) as a scan over 2-tuples.

    xq: [B, N] i32; target: scalar int (targetBitsQuant); mode: -1 or 0/1.
    Returns dict with nbits, nbits2, lastnz, lastnz2, lsbMode — all [B].
    The per-tuple context data (t, maxlev, sym) is recomputed on the fly by
    the arithmetic encoder, so it is not materialized here.
    """
    B, N = xq.shape
    lookup = jnp.asarray(T.t("ari_spec_lookup_fl"), I32)
    bits_tab = jnp.asarray(T.t("ari_spec_bits_fl"), I32)      # [64, 17]
    rate_flag = cfg.rateFlag
    max_lev_iter = 21 if cfg.hrmode else 14

    a_all = jnp.abs(xq[:, 0::2])
    b_all = jnp.abs(xq[:, 1::2])
    nz = (a_all != 0) | (b_all != 0)
    # lastnz: last tuple (index k, step2) with nonzero, min 1 tuple
    tup_idx = jnp.arange(N // 2, dtype=I32)
    last_tup = jnp.where(nz[:, 1:].any(-1),
                         1 + (N // 2 - 2) - jnp.argmax(jnp.flip(nz[:, 1:], -1), -1),
                         0)
    lastnz = (2 * last_tup + 1).astype(I32)   # C's lastnz = i+1 (odd index)

    mode_arr = jnp.full((B,), mode, I32)

    def body(carry, k):
        c, nbits, nbits2, lastnz2, nbits_lsb = carry
        a = a_all[:, k]
        b = b_all[:, k]
        t = c + rate_flag + jnp.where(k > N // 4, 256, 0)
        m = jnp.maximum(a, b)
        nlev = jnp.where(m >= 4, jnp.maximum((31 - jax.lax.clz(jnp.maximum(m, 1))) - 1, 0), 0)
        maxlev = jnp.where(m == 0, -1,
                           jnp.maximum((31 - jax.lax.clz(jnp.maximum(jnp.maximum(m, 3), 1))) - 1, 0))
        in_range = k < (lastnz + 1) // 2  # active tuples: k*2 < lastnz

        nb = jnp.zeros((B,), I32)
        nb = nb + jnp.where(mode_arr <= 0,
                            (jnp.minimum(a, 1) + jnp.minimum(b, 1)) * 2048, 0)
        lsb = jnp.zeros((B,), I32)
        aa, bb = a, b
        for lev in range(max_lev_iter):
            live = lev < nlev
            lev1 = min(lev, 3)
            pki = lookup[jnp.clip(t + lev1 * 1024, 0, 4095)]
            esc = bits_tab[pki, 16]
            nb = nb + jnp.where(live, esc, 0)
            if lev == 0:
                lsb = lsb + jnp.where(live & (mode_arr > 0), 2, 0)
                nb = nb + jnp.where(live & (mode_arr <= 0), 2 * 2048, 0)
            else:
                nb = nb + jnp.where(live, 2 * 2048, 0)
            aa = jnp.where(live, aa >> 1, aa)
            bb = jnp.where(live, bb >> 1, bb)
        lev1f = jnp.minimum(nlev, 3)
        pki = lookup[jnp.clip(t + lev1f * 1024, 0, 4095)]
        sym = aa + 4 * bb
        nb = nb + bits_tab[pki, jnp.clip(sym, 0, 16)]

        # lsbMode extras (quantize_spec.c:129-147)
        a1 = jnp.where(nlev > 0, a >> 1, a)
        b1 = jnp.where(nlev > 0, b >> 1, b)
        lsb = lsb + jnp.where((nlev > 0) & (a1 == 0) & (a != 0), 1, 0)
        lsb = lsb + jnp.where((nlev > 0) & (b1 == 0) & (b != 0), 1, 0)
        nb = nb + jnp.where(mode_arr > 0,
                            (jnp.minimum(a1, 1) + jnp.minimum(b1, 1)) * 2048, 0)

        nbits_new = nbits + jnp.where(in_range, nb, 0)
        nbits_lsb_new = nbits_lsb + jnp.where(in_range, lsb, 0)
        hit = in_range & (mode_arr >= 0) & ((a != 0) | (b != 0)) & \
            (nbits_new <= target * 2048)
        lastnz2_new = jnp.where(hit, 2 * k + 2, lastnz2)
        nbits2_new = jnp.where(hit, nbits_new, nbits2)

        # context update (quantize_spec.c:158-166); lev1 is capped at 3
        levm1 = jnp.minimum(nlev, 3).astype(I32) - 1
        t_next = jnp.where(levm1 <= 0, 1 + (aa + bb) * (levm1 + 2), 13 + levm1)
        c_new = (c & 15) * 16 + t_next
        c_new = jnp.where(in_range, c_new, c)
        return (c_new, nbits_new, nbits2_new, lastnz2_new, nbits_lsb_new), None

    init = (jnp.zeros((B,), I32), jnp.zeros((B,), I32), jnp.zeros((B,), I32),
            jnp.full((B,), 2, I32), jnp.zeros((B,), I32))
    (c, nbits, nbits2, lastnz2, nbits_lsb), _ = jax.lax.scan(
        body, init, jnp.arange(N // 2, dtype=I32))

    nbits_f = (nbits + 2047) // 2048
    if mode >= 0:
        nbits2_f = (nbits2 + 2047) // 2048
    else:
        nbits2_f = nbits_f
        lastnz2 = lastnz + 1
    if mode > 0:
        nbits_f = nbits_f + nbits_lsb
        nbits2_f = nbits2_f + nbits_lsb
    lsb_mode = jnp.where((mode > 0) & (nbits_f > target), 1, 0)
    return dict(nbits=nbits_f, nbits2=nbits2_f, lastnz=lastnz,
                lastnz2=lastnz2.astype(I32), lsbMode=lsb_mode.astype(I32))


def truncate_spectrum(xq, lastnz, lastnz2):
    """Zero xq[lastnz2 .. lastnz] inclusive (quantize_spec.c:170-173)."""
    n = xq.shape[1]
    idx = jnp.arange(n, dtype=I32)[None, :]
    kill = (idx >= lastnz2[:, None]) & (idx <= lastnz[:, None])
    return jnp.where(kill, 0, xq)


def adjust_global_gain(cfg: Config, gg_idx, gg_min, gain, target, nbits):
    """processAdjustGlobalGain_fl → (gg_idx, gain, gainChange) [B]."""
    fs_idx = cfg.fs_idx
    p1 = float(T.t("gg_p1")[fs_idx])
    p2 = float(T.t("gg_p2")[fs_idx])
    p3 = float(T.t("gg_p3")[fs_idx])
    c = float(T.t("gg_c")[fs_idx])
    d = float(T.t("gg_d")[fs_idx])
    nb = nbits.astype(F32)
    delta = jnp.where(nb < p1, (nb + 48.0) / 16.0,
                      jnp.where(nb < p2, (nb + d) * c,
                                jnp.where(nb < p3, nb / 48.0, p3 / 48.0)))
    delta = round_c(delta)
    delta2 = delta + 2

    over = nbits > target
    under = nbits < target - delta2
    change_sat = (gg_idx == 255) & over
    do_adj = ((gg_idx < 255) & over) | ((gg_idx > 0) & under)

    dec1 = under
    inc1 = (gg_idx == 254) | (nbits.astype(F32) < target + delta)
    new_idx = jnp.where(dec1, gg_idx - 1, jnp.where(inc1, gg_idx + 1, gg_idx + 2))
    new_idx = jnp.maximum(new_idx, gg_min - cfg.quantizedGainOff)
    gg_out = jnp.where(do_adj, new_idx, gg_idx)
    gain_out = jnp.where(do_adj,
                         jnp.power(F32(10.0), (gg_out + cfg.quantizedGainOff).astype(F32) / 28.0),
                         gain)
    return gg_out.astype(I32), gain_out, (do_adj | change_sat).astype(I32)


# ---------------------------------------------------------------------------
# noise factor (encoder)
# ---------------------------------------------------------------------------

def noise_factor(cfg: Config, x, xq, gain, bw_bin):
    """processNoiseFactor_fl → fac_ns_idx [B] i32. bw_bin: [B] cutoff bin."""
    B, N = x.shape
    if cfg.frame_dms == 100:
        width, start_off = 3, 24   # (nTransWidth-2)/2 = 3
    else:
        width, start_off = 1, {50: 12, 25: 6}[cfg.frame_dms]
    k = jnp.arange(N, dtype=I32)[None, :]
    nz = xq != 0
    # allZeros over window [k-width, min(bw-1, k+width)]
    any_nz = jnp.zeros((B, N), jnp.bool_)
    for off in range(-width, width + 1):
        sh = jnp.roll(nz, -off, axis=1)
        valid = (k + off >= 0) & (k + off <= bw_bin[:, None] - 1)
        any_nz = any_nz | (sh & valid)
    in_range = (k >= start_off) & (k < bw_bin[:, None])
    zline = in_range & ~any_nz                                    # [B, N]
    kcnt = jnp.sum(zline, axis=-1)
    vals = jnp.abs(x / gain[:, None])
    mean_all = jnp.sum(jnp.where(zline, vals, 0.0), axis=-1) / jnp.maximum(kcnt, 1)
    fac = jnp.where(kcnt > 0, mean_all, 0.0)

    if cfg.frame_dms == 100 and cfg.targetBytes <= 20:
        lines = jnp.where(zline, k + 1, 0)
        m = jnp.sum(lines, axis=-1) // jnp.maximum(kcnt, 1)
        lo = zline & ((k + 1) <= m[:, None])
        hi = zline & ((k + 1) > m[:, None])
        nlo = jnp.maximum(jnp.sum(lo, -1), 1)
        nhi = jnp.maximum(jnp.sum(hi, -1), 1)
        nsf1 = jnp.sum(jnp.where(lo, vals, 0.0), -1) / nlo
        nsf2 = jnp.sum(jnp.where(hi, vals, 0.0), -1) / nhi
        fac = jnp.where(kcnt > 0, jnp.minimum(nsf1, nsf2), fac)

    idx = round_c(8.0 - 16.0 * fac)
    return jnp.clip(idx, 0, 7).astype(I32)


# ---------------------------------------------------------------------------
# residual coding
# ---------------------------------------------------------------------------

def residual_max_bits(cfg: Config) -> int:
    """Size of the residual bit buffer (one bit/coef, or 20 rounds in HR)."""
    iters = 20 if cfg.hrmode else 1  # EXT_RES_ITER_MAX
    return min(cfg.yLen * iters, T.MAX_RESBITS)


def residual_encode(cfg: Config, x, xq, gain, target, nbits2):
    """processResidualCoding_fl.

    Non-HR: one sign-refinement bit per nonzero coefficient. HR: up to 20
    rounds with halving offsets, the spectrum nudged between rounds
    (residual_coding.c:40-75). Returns (res_bits [B, max_res] i32, n_res [B]).
    Bit n = round-major, nonzero-coefficient order within a round.
    """
    B, N = x.shape
    m = target - nbits2 + 4 + (10 if cfg.hrmode else 0)
    nz = xq != 0
    rank = jnp.cumsum(nz, axis=-1) - 1                       # rank of each nz coef
    n_nz = jnp.sum(nz, axis=-1)
    xqg = xq.astype(F32) * gain[:, None]
    max_res = residual_max_bits(cfg)
    iters = 20 if cfg.hrmode else 1
    offset = F32(0.25)
    res = jnp.zeros((B, max_res), I32)
    rows = jnp.arange(B, dtype=I32)[:, None]
    for r in range(iters):
        bit = (x >= xqg).astype(I32)
        x = jnp.where(nz, jnp.where(bit == 1, x - gain[:, None] * offset,
                                    x + gain[:, None] * offset), x)
        pos = r * n_nz[:, None] + rank
        scat = jnp.where(nz, jnp.clip(pos, 0, max_res - 1), max_res - 1)
        res = res.at[rows, scat].max(jnp.where(nz & (pos < max_res), bit, 0),
                                     mode="drop")
        offset = offset * 0.5
    n_res = jnp.minimum(n_nz * iters, jnp.maximum(m, 0))
    return res, n_res.astype(I32)


def residual_decode(cfg: Config, x, res_bits, n_res):
    """processResidualDecoding_fl: non-HR ±3/16, ±5/16 nudges; HR iterative
    ±offset rounds with halving (residual_decoding.c:27-75)."""
    B, N = x.shape
    nz = x != 0.0
    rank = jnp.cumsum(nz, axis=-1) - 1
    n_nz = jnp.sum(nz, axis=-1)
    if cfg.hrmode:
        offset = F32(0.25)
        out = x
        for r in range(20):
            pos = r * n_nz[:, None] + rank
            active = nz & (pos < n_res[:, None])
            bit = jnp.take_along_axis(
                res_bits, jnp.clip(pos, 0, res_bits.shape[1] - 1), 1)
            out = jnp.where(active, jnp.where(bit == 0, out - offset,
                                              out + offset), out)
            offset = offset * 0.5
        return out
    active = nz & (rank < n_res[:, None])
    bit = jnp.take_along_axis(res_bits, jnp.clip(rank, 0, res_bits.shape[1] - 1), 1)
    off1, off2 = F32(0.1875), F32(0.3125)
    pos = x > 0
    delta = jnp.where(bit == 0,
                      jnp.where(pos, -off1, -off2),
                      jnp.where(pos, off2, off1))
    return jnp.where(active, x + delta, x)


# ---------------------------------------------------------------------------
# decoder-side spectrum ops
# ---------------------------------------------------------------------------

def apply_global_gain(cfg: Config, x, gg_idx):
    gg = jnp.power(F32(10.0), (gg_idx + cfg.quantizedGainOff).astype(F32) / 28.0)
    return x * gg[:, None]


def _lcg_tables(n: int):
    """Closed-form affine advance of the noise-filling LCG
    seed' = (13849 + (seed + 32768) * 31821) & 65535 - 32768  (noise_filling.c:58-60).
    In unsigned u16 arithmetic: s_u' = (s_u * 31821 + 13849 + 32768*31821) mod 2^16.
    Returns (mult [n], add [n]) with seed_k = seed0 * mult[k] + add[k] (mod 2^16),
    all int64 host-side.
    """
    a = 31821
    # in u = seed + 32768 representation the masked update collapses to
    # u' = (u * a + 13849) mod 2^16 (the ±32768 offsets cancel, a odd)
    c = 13849
    mult = np.zeros(n, np.int64)
    add = np.zeros(n, np.int64)
    m, ad = 1, 0
    for k in range(n):
        mult[k], add[k] = m, ad
        m = (m * a) % 65536
        ad = (ad * a + c) % 65536
    return mult, add


def noise_filling(cfg: Config, x, nf_seed, fac_ns_idx, bw_bin,
                  spec_inv_idx=None, fac_ns_pc=None):
    """processNoiseFilling_fl with the LCG advanced in closed form.

    x: [B, N] decoded spectrum; nf_seed: [B] i32 (signed 16-bit);
    bw_bin: [B] stopband cutoff. With partial concealment, bins at or above
    spec_inv_idx fill at the previous frame's level fac_ns_pc instead
    (noise_filling_fx.c:94-126). Returns filled spectrum.
    """
    B, N = x.shape
    width = 3 if cfg.frame_dms == 100 else 1
    start_off = {100: 24, 50: 12, 25: 6}[cfg.frame_dms]
    fac = (8.0 - fac_ns_idx.astype(F32)) / 16.0

    k = jnp.arange(N, dtype=I32)[None, :]
    nzm = x != 0.0
    any_nz = jnp.zeros((B, N), jnp.bool_)
    for off in range(-width, width + 1):
        sh = jnp.roll(nzm, -off, axis=1)
        valid = (k + off >= 0) & (k + off <= bw_bin[:, None] - 1)
        any_nz = any_nz | (sh & valid)
    zline = (k >= start_off) & (k < bw_bin[:, None]) & ~any_nz
    rank = jnp.cumsum(zline, axis=-1) - 1                     # LCG step index

    mult, add = _lcg_tables(N + 1)
    mult = jnp.asarray(mult, jnp.uint32)
    add = jnp.asarray(add, jnp.uint32)
    seed_u = (nf_seed + 32768).astype(jnp.uint32)             # unsigned rep
    r = jnp.clip(rank, 0, N - 1)
    # seed AFTER (rank+1) advances decides the sign; uint32 wraparound is
    # harmless because only the low 16 bits are kept
    su = (seed_u[:, None] * mult[r + 1] + add[r + 1]) & jnp.uint32(65535)
    sign_neg = su < 32768  # signed seed = su - 32768 < 0
    level = fac[:, None]
    if spec_inv_idx is not None:
        level = jnp.where(k < spec_inv_idx[:, None], level,
                          fac_ns_pc[:, None])
    fill = jnp.where(sign_neg, -level, level)
    return jnp.where(zline, fill, x)
