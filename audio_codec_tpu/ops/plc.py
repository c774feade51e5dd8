"""Packet loss concealment — standard noise substitution (method 0).

Reference: processPlcMain_fl (plc_main.c:13-53) dispatching to
processNoiseSubstitution0_fl (plc_noise_substitution0.c:14-46) — spectrum
repeat with per-bin sign scrambling and cumulative damping — plus the
update hooks processPlcUpdate_fl / processPlcUpdateSpec_fl (plc_update.c).

The per-bin LCG runs in closed form (affine map modulo 2^16). The
reference's symmetric-mod via round() maps one boundary case differently
(a negative pre-mod value landing exactly on +32768 yields 0 there); that
state is reachable with probability ~2^-16 per bin and PLC output is gated
by the MLD conformance metric rather than MD5 (SURVEY.md §4), so the affine
form is used for all bins.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import Config

F32 = jnp.float32
I32 = jnp.int32


def _lcg_tables(n: int):
    """seed' = 16831 + seed * 12821 folded into [-32768, 32767].
    In u16 arithmetic on u = seed + 32768: u' = (u * 12821 + C0) mod 2^16."""
    a = 12821
    c0 = (16831 - 32768 * a + 32768) % 65536
    mult = np.zeros(n, np.int64)
    add = np.zeros(n, np.int64)
    m, ad = 1, 0
    for k in range(n):
        mult[k], add[k] = m, ad
        m = (m * a) % 65536
        ad = (ad * a + c0) % 65536
    return mult, add


def noise_substitution(cfg: Config, q_d_prev, nb_lost, cum_alpha, seed):
    """One concealed frame: returns (spec [B, yLen], new_cum_alpha, new_seed).

    nb_lost: [B] loss counter ALREADY incremented for this frame.
    """
    B = q_d_prev.shape[0]
    N = cfg.yLen
    alpha = jnp.where(nb_lost < 4, 1.0,
                      jnp.where(nb_lost < 8, 0.9, 0.85)).astype(F32)
    cum = cum_alpha * alpha

    mult, add = _lcg_tables(N + 1)
    mult = jnp.asarray(mult, jnp.uint32)
    add = jnp.asarray(add, jnp.uint32)
    u0 = (seed + 32768).astype(jnp.uint32)
    # seed AFTER k+1 advances decides bin k's sign (plc_noise_substitution0.c:33-44)
    uk = (u0[:, None] * mult[None, 1:] + add[None, 1:]) & jnp.uint32(65535)
    neg = uk < 32768  # signed seed < 0
    spec = jnp.where(neg, -q_d_prev * cum[:, None], q_d_prev * cum[:, None])
    new_seed = (uk[:, -1].astype(I32) - 32768)
    return spec, cum, new_seed


def plc_main(cfg: Config, spec, q_d_prev, bfi, nb_lost, cum_alpha, seed):
    """processPlcMain_fl for method 0: conceal iff bfi, update prev spectrum.

    Returns (spec_out, q_d_prev_new, nb_lost_new, cum_alpha_new, seed_new).
    """
    lost = bfi == 1
    nb_lost_new = jnp.where(lost, nb_lost + 1, nb_lost)
    conc, cum2, seed2 = noise_substitution(cfg, q_d_prev, nb_lost_new,
                                           cum_alpha, seed)
    spec_out = jnp.where(lost[:, None], conc, spec)
    q_d_prev_new = jnp.where(lost[:, None], q_d_prev, spec)
    cum_new = jnp.where(lost, cum2, cum_alpha)
    seed_new = jnp.where(lost, seed2, seed)
    return spec_out, q_d_prev_new, nb_lost_new, cum_new, seed_new


def plc_update(bfi, nb_lost, cum_alpha, prev_bfi, prevprev_bfi):
    """processPlcUpdate_fl (plc_update.c:13-30)."""
    good = bfi != 1
    nb_lost = jnp.where(good, 0, nb_lost)
    cum_alpha = jnp.where(good, 1.0, cum_alpha)
    return nb_lost, cum_alpha, bfi, prev_bfi
