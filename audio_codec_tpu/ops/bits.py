"""Backward bit-level side-info packing/parsing, batched over streams.

The LC3plus frame packs side information backward from the frame end
(processEncoderEntropy_fl, enc_entropy.c:13-115; processDecoderEntropy_fl,
dec_entropy.c:121-270) while the arithmetic coder writes forward; the two
meet in the middle. Here the byte buffer is an int32 [B, nbytes] array and
each bit write/read is a one-hot scatter/gather over the batch; fields with
per-stream widths (LTPF 1/11, SNS 24/25) use masked fixed-trip loops.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config import Config

I32 = jnp.int32


def write_bit_backward(buf, bp, mask, bit, active=None):
    """One backward bit write (write_bit_backward_fl). All args [B]."""
    B = buf.shape[0]
    rows = jnp.arange(B, dtype=I32)
    cur = buf[rows, bp]
    new = jnp.where(bit == 0, cur & (255 - mask), cur | mask)
    if active is not None:
        new = jnp.where(active, new, cur)
        bp_n = jnp.where(active & (mask == 128), bp - 1, bp)
        mask_n = jnp.where(active, jnp.where(mask == 128, 1, mask * 2), mask)
    else:
        bp_n = jnp.where(mask == 128, bp - 1, bp)
        mask_n = jnp.where(mask == 128, 1, mask * 2)
    buf = buf.at[rows, jnp.clip(bp, 0, buf.shape[1] - 1)].set(new)
    return buf, bp_n, mask_n


def write_uint_backward(buf, bp, mask, val, nbits, max_bits: int):
    """LSB-first backward uint write; nbits may be per-stream ([B] or int)."""
    nbits = jnp.asarray(nbits)
    for k in range(max_bits):
        act = k < nbits
        buf, bp, mask = write_bit_backward(buf, bp, mask, (val >> k) & 1, act)
    return buf, bp, mask


def read_bit(buf, bp, mask):
    B = buf.shape[0]
    rows = jnp.arange(B, dtype=I32)
    bit = jnp.where(buf[rows, jnp.clip(bp, 0, buf.shape[1] - 1)] & mask, 1, 0)
    bp_n = jnp.where(mask == 128, bp - 1, bp)
    mask_n = jnp.where(mask == 128, 1, mask * 2)
    return bit.astype(I32), bp_n, mask_n


def read_uint(buf, bp, mask, nbits, max_bits: int):
    nbits = jnp.asarray(nbits)
    val = jnp.zeros(buf.shape[0], I32)
    for k in range(max_bits):
        act = k < nbits
        bit, bp_n, mask_n = read_bit(buf, bp, mask)
        val = jnp.where(act, val + (bit << k), val)
        bp = jnp.where(act, bp_n, bp)
        mask = jnp.where(act, mask_n, mask)
    return val, bp, mask


def pack_side_info(cfg: Config, buf, bw_idx, lastnz, lsb_mode, gg_idx,
                   num_tns_filters, tns_order, ltpf_param, scf_idx, fac_ns_idx):
    """processEncoderEntropy_fl → (buf, bp_side, mask_side).

    buf: [B, nbytes] int32 zeroed; all other args [B] / [B, k] int32.
    """
    B = buf.shape[0]
    nbytes = cfg.targetBytes
    bp = jnp.full((B,), nbytes - 1, I32)
    mask = jnp.ones((B,), I32)

    if cfg.BW_cutoff_bits > 0:
        buf, bp, mask = write_uint_backward(buf, bp, mask, bw_idx,
                                            cfg.BW_cutoff_bits, cfg.BW_cutoff_bits)
    buf, bp, mask = write_uint_backward(buf, bp, mask, lastnz // 2 - 1,
                                        cfg.lastnz_bits, cfg.lastnz_bits)
    buf, bp, mask = write_bit_backward(buf, bp, mask, lsb_mode)
    buf, bp, mask = write_uint_backward(buf, bp, mask, gg_idx, 8, 8)
    # TNS activation flags (1 per filter)
    for f in range(2):
        act = f < num_tns_filters
        buf, bp, mask = write_bit_backward(
            buf, bp, mask, jnp.minimum(tns_order[:, f], 1), act)
    buf, bp, mask = write_bit_backward(buf, bp, mask, ltpf_param[:, 0])
    buf, bp, mask = write_uint_backward(buf, bp, mask, scf_idx[:, 0], 5, 5)
    buf, bp, mask = write_uint_backward(buf, bp, mask, scf_idx[:, 1], 5, 5)

    # SNS-VQ 2nd stage side info (enc_entropy.c:60-92)
    submode = scf_idx[:, 2]
    submode_msb = submode // 2
    submode_lsb = submode & 1
    gain_msb_bits = jnp.asarray([1, 1, 2, 2], I32)[submode]
    gain_lsb_bits = jnp.asarray([0, 1, 0, 1], I32)[submode]
    buf, bp, mask = write_bit_backward(buf, bp, mask, submode_msb)
    gain_msb = scf_idx[:, 3] >> gain_lsb_bits
    gain_lsb = scf_idx[:, 3] & 1
    buf, bp, mask = write_uint_backward(buf, bp, mask, gain_msb, gain_msb_bits, 2)
    buf, bp, mask = write_bit_backward(buf, bp, mask, scf_idx[:, 4])
    # MPVQ payload: 25 bits (msb==0) or 24 bits (msb==1)
    tmp0 = jnp.where(submode_lsb == 0, scf_idx[:, 6] + 2, gain_lsb) * 2390004 \
        + scf_idx[:, 5]
    tmp1 = jnp.where(submode_lsb != 0,
                     2 * scf_idx[:, 5] + gain_lsb + 15158272, scf_idx[:, 5])
    payload = jnp.where(submode_msb == 0, tmp0, tmp1)
    nbits_payload = jnp.where(submode_msb == 0, 25, 24)
    buf, bp, mask = write_uint_backward(buf, bp, mask, payload, nbits_payload, 25)

    # LTPF data
    ltpf_on = ltpf_param[:, 0] == 1
    buf, bp, mask = write_uint_backward(buf, bp, mask, ltpf_param[:, 1],
                                        jnp.where(ltpf_on, 1, 0), 1)
    buf, bp, mask = write_uint_backward(buf, bp, mask, ltpf_param[:, 2],
                                        jnp.where(ltpf_on, 9, 0), 9)
    buf, bp, mask = write_uint_backward(buf, bp, mask, fac_ns_idx, 3, 3)
    return buf, bp, mask


def parse_side_info(cfg: Config, buf):
    """processDecoderEntropy_fl → dict of parsed fields + (bp_side, mask_side).

    buf: [B, nbytes] int32. Mirrors the reference's bfi triggers
    (dec_entropy.c:152-270) into a per-stream bfi flag.
    """
    B = buf.shape[0]
    nbytes = cfg.targetBytes
    bp = jnp.full((B,), nbytes - 1, I32)
    mask = jnp.ones((B,), I32)
    bfi = jnp.zeros((B,), I32)

    if cfg.BW_cutoff_bits > 0:
        bw_idx, bp, mask = read_uint(buf, bp, mask, cfg.BW_cutoff_bits,
                                     cfg.BW_cutoff_bits)
        bfi = jnp.where(cfg.fs_idx < bw_idx, 1, bfi)
    else:
        bw_idx = jnp.full((B,), cfg.fs_idx, I32)

    num_tns = jnp.where((bw_idx < 3) | (cfg.frame_dms == 25), 1, 2)
    lastnz, bp, mask = read_uint(buf, bp, mask, cfg.lastnz_bits, cfg.lastnz_bits)
    lastnz = (lastnz + 1) * 2
    bfi = jnp.where(lastnz > cfg.yLen, 1, bfi)
    lsb_mode, bp, mask = read_bit(buf, bp, mask)
    gg_idx, bp, mask = read_uint(buf, bp, mask, 8, 8)
    tns_on = []
    for f in range(2):
        bit, bp_n, mask_n = read_bit(buf, bp, mask)
        act = f < num_tns
        tns_on.append(jnp.where(act, bit, 0))
        bp = jnp.where(act, bp_n, bp)
        mask = jnp.where(act, mask_n, mask)
    tns_on = jnp.stack(tns_on, axis=1)
    ltpf0, bp, mask = read_bit(buf, bp, mask)
    s0, bp, mask = read_uint(buf, bp, mask, 5, 5)
    s1, bp, mask = read_uint(buf, bp, mask, 5, 5)

    submode_msb, bp, mask = read_bit(buf, bp, mask)
    gain_msb_bits = jnp.asarray([1, 2], I32)[submode_msb]
    s3, bp, mask = read_uint(buf, bp, mask, gain_msb_bits, 2)
    s4, bp, mask = read_bit(buf, bp, mask)
    nbits_payload = jnp.where(submode_msb == 0, 25, 24)
    tmp, bp, mask = read_uint(buf, bp, mask, nbits_payload, 25)
    # submode 0/1 branch
    ind = tmp // 2390004
    bfi = jnp.where((submode_msb == 0) & (tmp >= 33460056), 1, bfi)
    lsb0 = ind < 2
    s3_m0 = jnp.where(lsb0, s3 * 2 + ind, s3)
    s5_m0 = tmp - ind * 2390004
    s6_m0 = jnp.where(lsb0, -2, ind - 2)
    # submode 2/3 branch
    bfi = jnp.where((submode_msb == 1) & (tmp >= 16708096), 1, bfi)
    lsb1 = tmp >= 15158272
    s3_m1 = jnp.where(lsb1, s3 * 2 + ((tmp - 15158272) & 1), s3)
    s5_m1 = jnp.where(lsb1, (tmp - 15158272) // 2, tmp)
    s6_m1 = jnp.where(lsb1, -2, -1)
    is0 = submode_msb == 0
    s3 = jnp.where(is0, s3_m0, s3_m1)
    s5 = jnp.where(is0, s5_m0, s5_m1)
    s6 = jnp.where(is0, s6_m0, s6_m1)
    submode_lsb = jnp.where(is0, lsb0, lsb1).astype(I32)
    s2 = submode_msb * 2 + submode_lsb
    scf_idx = jnp.stack([s0, s1, s2, s3, s4, s5, s6], axis=1)

    ltpf_on = ltpf0 == 1
    l1, bp, mask = read_uint(buf, bp, mask, jnp.where(ltpf_on, 1, 0), 1)
    l2, bp, mask = read_uint(buf, bp, mask, jnp.where(ltpf_on, 9, 0), 9)
    ltpf_param = jnp.stack([ltpf0, l1, l2], axis=1)
    fac_ns, bp, mask = read_uint(buf, bp, mask, 3, 3)
    return dict(bfi=bfi, bw_idx=bw_idx, lastnz=lastnz, lsb_mode=lsb_mode,
                gg_idx=gg_idx, tns_on=tns_on, num_tns=num_tns,
                scf_idx=scf_idx, ltpf_param=ltpf_param, fac_ns_idx=fac_ns,
                bp_side=bp, mask_side=mask)
