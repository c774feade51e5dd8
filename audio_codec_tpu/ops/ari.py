"""Batched 24-bit range coder (arithmetic codec) for the spectrum/TNS data.

Reference: processAriEncoder_fl / processAriDecoder_fl (ari_codec.c).
Every stream owns one lane of the [B]-vectorized coder state; the symbol
sequence runs as a lax.scan over 2-tuples with masked fixed-trip inner loops
(escape levels, carry runs), so there is no data-dependent control flow and
the whole frame batch encodes in one fused XLA computation. The pending
carry run (ac_shift_fl's carry_count loop, ari_codec.c:593-609) becomes a
masked range-fill over the byte buffer.

The lax.scan formulation compiles to a single fused sequential loop over
symbols with all streams advancing in lockstep across lanes — the same
lane-per-stream shape a hand-written Pallas kernel would use, without
leaving XLA.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import tables as T
from ..config import Config
from . import bits as B_

I32 = jnp.int32
F32 = jnp.float32
MASK24 = (1 << 24) - 1


class EncSt(NamedTuple):
    buf: jnp.ndarray        # [B, nbytes] int32 byte values
    bp: jnp.ndarray         # [B] forward byte pointer
    low: jnp.ndarray        # [B]
    range: jnp.ndarray      # [B]
    cache: jnp.ndarray      # [B] (-1 initially)
    carry: jnp.ndarray      # [B]
    carry_count: jnp.ndarray  # [B]
    bp_side: jnp.ndarray    # [B]
    mask_side: jnp.ndarray  # [B]
    # carry-run interval markers: a pending run of 0xFF (carry==0) or 0x00
    # (carry==1) bytes is recorded as +1/-1 boundary marks and materialized
    # once at the end of encode() — runs never overlap direct byte writes,
    # so the deferred fill is exact (replaces ac_shift_fl's write loop,
    # ari_codec.c:593-609).
    mark_ff: jnp.ndarray    # [B, nbytes] int32
    mark_00: jnp.ndarray    # [B, nbytes] int32


def enc_init(buf, bp_side, mask_side) -> EncSt:
    B, nbytes = buf.shape
    z = lambda v: jnp.full((B,), v, I32)
    zm = jnp.zeros((B, nbytes), I32)
    return EncSt(buf, z(0), z(0), z(MASK24), z(-1), z(0), z(0), bp_side,
                 mask_side, zm, zm)


def _mark_run(st: EncSt, bp, count, runval, active):
    """Record a run of `count` bytes of `runval` at [bp, bp+count)."""
    Bn, nbytes = st.buf.shape
    rows = jnp.arange(Bn, dtype=I32)
    do = active & (count > 0)
    is_ff = runval == 255
    start = jnp.where(do, jnp.clip(bp, 0, nbytes - 1), nbytes)  # drop when off
    end = jnp.where(do, bp + count, nbytes)                     # may drop (OOB)
    mark_ff = st.mark_ff.at[rows, start].add(jnp.where(do & is_ff, 1, 0), mode="drop")
    mark_ff = mark_ff.at[rows, end].add(jnp.where(do & is_ff, -1, 0), mode="drop")
    mark_00 = st.mark_00.at[rows, start].add(jnp.where(do & ~is_ff, 1, 0), mode="drop")
    mark_00 = mark_00.at[rows, end].add(jnp.where(do & ~is_ff, -1, 0), mode="drop")
    return st._replace(mark_ff=mark_ff, mark_00=mark_00)


def _materialize_runs(st: EncSt) -> jnp.ndarray:
    """Apply deferred carry runs onto the byte buffer."""
    in_ff = jnp.cumsum(st.mark_ff, axis=1) > 0
    in_00 = jnp.cumsum(st.mark_00, axis=1) > 0
    return jnp.where(in_ff, 255, jnp.where(in_00, 0, st.buf))


def _ac_shift(st: EncSt, active) -> EncSt:
    """ac_shift_fl (ari_codec.c:585-611), vectorized; `active` masks lanes."""
    Bn, nbytes = st.buf.shape
    rows = jnp.arange(Bn, dtype=I32)
    emit = active & ((st.low < 0xFF0000) | (st.carry == 1))
    do_cache = emit & (st.cache >= 0)
    val = (st.cache + st.carry) & 255
    cur = st.buf[rows, jnp.clip(st.bp, 0, nbytes - 1)]
    buf = st.buf.at[rows, jnp.clip(st.bp, 0, nbytes - 1)].set(
        jnp.where(do_cache, val, cur))
    bp = st.bp + do_cache.astype(I32)
    # pending 0xFF/0x00 run -> deferred interval marks
    runval = (st.carry + 255) & 255
    st = _mark_run(st, bp, st.carry_count, runval, emit)
    bp = bp + jnp.where(emit, st.carry_count, 0)
    cache = jnp.where(emit, st.low >> 16, st.cache)
    carry = jnp.where(emit, 0, st.carry)
    cc = jnp.where(emit, 0, jnp.where(active, st.carry_count + 1, st.carry_count))
    low = jnp.where(active, (st.low << 8) & MASK24, st.low)
    return st._replace(buf=buf, bp=bp, low=low, cache=cache, carry=carry,
                       carry_count=cc)


def ac_encode(st: EncSt, sym_freq, cum_freq, active) -> EncSt:
    """ac_encode_fl (ari_codec.c:565-583). sym_freq/cum_freq/active: [B]."""
    r = st.range >> 10
    low = st.low + jnp.where(active, r * cum_freq, 0)
    carry = jnp.where(active & (low >> 24 == 1), 1, st.carry)
    low = low & MASK24
    rng = jnp.where(active, r * sym_freq, st.range)
    st = st._replace(low=low, range=rng, carry=carry)
    for _ in range(2):  # range >= 2^6 after mul → at most two renormalizations
        need = active & (st.range < (1 << 16))
        st = st._replace(range=jnp.where(need, st.range << 8, st.range))
        st = _ac_shift(st, need)
    return st


def ac_finalize(st: EncSt) -> EncSt:
    """ac_finalize_fl (ari_codec.c:641-697), vectorized."""
    Bn, nbytes = st.buf.shape
    rows = jnp.arange(Bn, dtype=I32)
    # bits = 24 - floor(log2(range)); range in [2^16, 2^24)
    msb = 31 - jax.lax.clz(jnp.maximum(st.range, 1))
    bits = 24 - msb
    mask = MASK24 >> bits
    val = st.low + mask
    over1 = val >> 24
    val = val & MASK24
    high = st.low + st.range
    over2 = high >> 24
    high = high & MASK24
    val = val & (MASK24 - mask)

    same = over1 == over2
    tight = same & (val + mask >= high)
    bits = jnp.where(tight, bits + 1, bits)
    mask2 = jnp.where(tight, mask >> 1, mask)
    val = jnp.where(tight, ((st.low + mask2) & MASK24) & (MASK24 - mask2), val)
    carry = jnp.where(same & (val < st.low), 1, st.carry)
    st = st._replace(low=val, carry=carry)

    b = bits
    # if bits > 8: shift ceil(bits/8) times else once
    n_shift = jnp.where(bits > 8, (bits + 7) // 8, 1)
    for i in range(3):
        st = _ac_shift(st, i < n_shift)
    b = jnp.where(bits > 8, bits - 8 * n_shift, bits)
    b = jnp.where(b < 0, b + 8, b)

    # final cache/carry_count flush (ari_codec.c:676-695)
    has_cc = st.carry_count > 0
    cur = st.buf[rows, jnp.clip(st.bp, 0, nbytes - 1)]
    buf = st.buf.at[rows, jnp.clip(st.bp, 0, nbytes - 1)].set(
        jnp.where(has_cc, st.cache & 255, cur))
    bp = st.bp + has_cc.astype(I32)
    st = st._replace(buf=buf)
    st = _mark_run(st, bp, jnp.maximum(st.carry_count - 1, 0),
                   jnp.full((Bn,), 255, I32), has_cc)
    bp = bp + jnp.where(has_cc, jnp.maximum(st.carry_count - 1, 0), 0)
    st = st._replace(bp=bp)

    # write_uint_forward of remaining b bits, MSB first, at st.bp
    wval = jnp.where(has_cc, jnp.where(b >= 8, 255 << (jnp.maximum(b, 8) - 8), 0),
                     st.cache)
    cur = st.buf[rows, jnp.clip(st.bp, 0, nbytes - 1)]
    m = jnp.full((Bn,), 128, I32)
    out = cur
    for k in range(8):
        act = k < b
        bit = wval & m
        out = jnp.where(act, jnp.where(bit == 0, out & (255 - m), out | m), out)
        m = m >> 1
    buf = st.buf.at[rows, jnp.clip(st.bp, 0, nbytes - 1)].set(out)
    return st._replace(buf=buf)


def _nbits_ari_enc(st: EncSt):
    """Bit count consumed so far by the range coder (ari_codec.c:812-824)."""
    msb = 31 - jax.lax.clz(jnp.maximum(st.range, 1))
    nb = (st.bp + 1) * 8 + 25 - msb
    nb = nb + jnp.where(st.cache >= 0, 8, 0)
    nb = nb + st.carry_count * 8
    return nb


def _tuple_context(cfg: Config, xq, lastnz_wire):
    """Recompute per-tuple (t, nlev, sym) arrays (quantize_spec.c:86-168).

    xq must already be truncated. Returns dict of [B, N/2] arrays.
    """
    Bn, N = xq.shape
    rate_flag = cfg.rateFlag
    a_all = jnp.abs(xq[:, 0::2])
    b_all = jnp.abs(xq[:, 1::2])
    max_lev_iter = 21 if cfg.hrmode else 14

    def body(c, k):
        a = a_all[:, k]
        b = b_all[:, k]
        t = c + rate_flag + jnp.where(k > N // 4, 256, 0)
        m = jnp.maximum(a, b)
        nlev = jnp.where(m >= 4,
                         jnp.maximum((31 - jax.lax.clz(jnp.maximum(m, 1))) - 1, 0), 0)
        aa = a >> nlev
        bb = b >> nlev
        sym = aa + 4 * bb
        in_range = (2 * k) < lastnz_wire
        levm1 = jnp.minimum(nlev, 3) - 1
        t_next = jnp.where(levm1 <= 0, 1 + (aa + bb) * (levm1 + 2), 13 + levm1)
        c_new = jnp.where(in_range, (c & 15) * 16 + t_next, c)
        return c_new, (t, nlev, sym)

    _, (t, nlev, sym) = jax.lax.scan(body, jnp.zeros((Bn,), I32), jnp.arange(N // 2, dtype=I32))
    return dict(t=t.T, nlev=nlev.T, sym=sym.T)


def encode(cfg: Config, buf, bp_side, mask_side, xq, tns_order, tns_idx,
           num_tns_filters, lastnz_wire, lsb_mode, res_bits, n_res):
    """Arithmetic encoder body + residual fill + finalize
    (processAriEncoder_fl, ari_codec.c:726-866).

    buf: [B, nbytes] with side info already packed; xq truncated spectrum.
    Returns finished byte buffer [B, nbytes].
    """
    Bn, N = xq.shape
    st = enc_init(buf, bp_side, mask_side)
    max_lev_iter = 21 if cfg.hrmode else 14

    # --- TNS data ---
    tns_freq_cf = jnp.asarray(T.t("tns_freq_cf"), I32)    # [2, 9]
    tns_cf = jnp.asarray(T.t("tns_cf"), I32)              # [8, 18]
    lpcw = 1 if cfg.enable_lpc_weighting else 0
    for f in range(2):
        order = tns_order[:, f]
        act_f = (f < num_tns_filters) & (order > 0)
        sf = tns_freq_cf[lpcw, jnp.clip(order, 1, 8)] - tns_freq_cf[lpcw, jnp.clip(order, 1, 8) - 1]
        cf = tns_freq_cf[lpcw, jnp.clip(order, 1, 8) - 1]
        st = ac_encode(st, sf, cf, act_f)
        for j in range(8):
            act_j = act_f & (j < order)
            idx = tns_idx[:, f, j]
            sf = tns_cf[j, jnp.clip(idx + 1, 0, 17)] - tns_cf[j, jnp.clip(idx, 0, 17)]
            cf = tns_cf[j, jnp.clip(idx, 0, 17)]
            st = ac_encode(st, sf, cf, act_j)

    # --- spectral 2-tuples ---
    ctx = _tuple_context(cfg, xq, lastnz_wire)
    lookup = jnp.asarray(T.t("ari_spec_lookup_fl"), I32)
    cumf = jnp.asarray(T.t("ari_spec_cumfreq_fl"), I32)   # [64, 18]
    a_all = jnp.abs(xq[:, 0::2])
    b_all = jnp.abs(xq[:, 1::2])
    neg_a = (xq[:, 0::2] < 0).astype(I32)
    neg_b = (xq[:, 1::2] < 0).astype(I32)

    # lsb-mode bookkeeping: collect LSB bits in order into a [B, N] array
    lsb_store = jnp.zeros((Bn, N), I32)
    lsb_count = jnp.zeros((Bn,), I32)

    def tup_body(carry, k):
        st, lsb_store, lsb_count = carry
        in_range = (2 * k) < lastnz_wire
        a = a_all[:, k]
        b = b_all[:, k]
        t = ctx["t"][:, k]
        nlev = ctx["nlev"][:, k]
        sym = ctx["sym"][:, k]
        lsb1 = jnp.zeros((Bn,), I32)
        lsb2 = jnp.zeros((Bn,), I32)
        for lev in range(max_lev_iter):
            act = in_range & (lev < nlev)
            lev1 = min(lev, 3)
            pki = lookup[jnp.clip(t + lev1 * 1024, 0, 4095)]
            sf = cumf[pki, 17] - cumf[pki, 16]
            cf = cumf[pki, 16]
            st = ac_encode(st, sf, cf, act)
            bit1 = (a >> lev) & 1
            bit2 = (b >> lev) & 1
            if lev == 0:
                save = (lsb_mode == 1)
                lsb1 = jnp.where(act, bit1, lsb1)
                lsb2 = jnp.where(act, bit2, lsb2)
                wr = act & ~save
            else:
                wr = act
            nbuf, nbp, nmask = B_.write_bit_backward(
                st.buf, st.bp_side, st.mask_side, bit1, wr)
            st = st._replace(buf=nbuf, bp_side=nbp, mask_side=nmask)
            nbuf, nbp, nmask = B_.write_bit_backward(
                st.buf, st.bp_side, st.mask_side, bit2, wr)
            st = st._replace(buf=nbuf, bp_side=nbp, mask_side=nmask)
        pki = lookup[jnp.clip(t + jnp.minimum(nlev, 3) * 1024, 0, 4095)]
        sf = cumf[pki, jnp.clip(sym, 0, 16) + 1] - cumf[pki, jnp.clip(sym, 0, 16)]
        cf = cumf[pki, jnp.clip(sym, 0, 16)]
        st = ac_encode(st, sf, cf, in_range)

        # lsbMode==1 LSB collection (ari_codec.c:786-812)
        collect = in_range & (lsb_mode == 1) & (nlev > 0)
        a1 = a >> 1
        b1 = b >> 1
        rows = jnp.arange(Bn, dtype=I32)

        def push(store, count, val, do):
            store = store.at[rows, jnp.clip(count, 0, N - 1)].set(
                jnp.where(do, val, store[rows, jnp.clip(count, 0, N - 1)]))
            return store, count + do.astype(I32)

        lsb_store, lsb_count = push(lsb_store, lsb_count, lsb1, collect)
        lsb_store, lsb_count = push(lsb_store, lsb_count, neg_a[:, k],
                                    collect & (a1 == 0) & (a != 0))
        lsb_store, lsb_count = push(lsb_store, lsb_count, lsb2, collect)
        lsb_store, lsb_count = push(lsb_store, lsb_count, neg_b[:, k],
                                    collect & (b1 == 0) & (b != 0))

        # sign bits (a/b shifted when lsbMode collected)
        a_eff = jnp.where((lsb_mode == 1) & (nlev > 0), a1, a)
        b_eff = jnp.where((lsb_mode == 1) & (nlev > 0), b1, b)
        nbuf, nbp, nmask = B_.write_bit_backward(
            st.buf, st.bp_side, st.mask_side, neg_a[:, k], in_range & (a_eff != 0))
        st = st._replace(buf=nbuf, bp_side=nbp, mask_side=nmask)
        nbuf, nbp, nmask = B_.write_bit_backward(
            st.buf, st.bp_side, st.mask_side, neg_b[:, k], in_range & (b_eff != 0))
        st = st._replace(buf=nbuf, bp_side=nbp, mask_side=nmask)
        return (st, lsb_store, lsb_count), None

    (st, lsb_store, lsb_count), _ = jax.lax.scan(
        tup_body, (st, lsb_store, lsb_count), jnp.arange(N // 2, dtype=I32))

    # --- residual / LSB bits (ari_codec.c:826-860) ---
    total_bits = cfg.targetBitsAri
    log2_mask = 31 - jax.lax.clz(jnp.maximum(st.mask_side, 1))
    nbits_side = total_bits - (8 * (st.bp_side + 1) + 8 - log2_mask)
    nbits_ari = _nbits_ari_enc(st)
    nbits_res = jnp.maximum(total_bits - (nbits_side + nbits_ari), 0)
    n_fill = jnp.where(lsb_mode == 0, jnp.minimum(nbits_res, n_res),
                       jnp.minimum(nbits_res, lsb_count))
    width = max(int(res_bits.shape[1]), int(lsb_store.shape[1]))
    res_p = jnp.pad(res_bits, ((0, 0), (0, width - res_bits.shape[1])))
    lsb_p = jnp.pad(lsb_store, ((0, 0), (0, width - lsb_store.shape[1])))
    fill_bits = jnp.where((lsb_mode == 0)[:, None], res_p, lsb_p)
    max_fill = min(width, total_bits)

    def fill_body(st, k):
        act = k < n_fill
        bit = fill_bits[:, k]
        nbuf, nbp, nmask = B_.write_bit_backward(
            st.buf, st.bp_side, st.mask_side, bit, act)
        return st._replace(buf=nbuf, bp_side=nbp, mask_side=nmask), None

    st, _ = jax.lax.scan(fill_body, st, jnp.arange(max_fill, dtype=I32))
    st = ac_finalize(st)
    return _materialize_runs(st)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

class DecSt(NamedTuple):
    buf: jnp.ndarray
    bp: jnp.ndarray
    low: jnp.ndarray
    range: jnp.ndarray
    ber: jnp.ndarray
    bp_side: jnp.ndarray
    mask_side: jnp.ndarray
    # partial-concealment pointer state (Pc_State_fx, ari_codec.c:18-33);
    # all-zero placeholders when the frame carries no PC block (n_pc == 0)
    b_left: jnp.ndarray     # [B] convergence point (init numbytes + 1)
    b_right: jnp.ndarray    # [B] (init -1)
    c_bp: jnp.ndarray       # [B] bool: fwd pointer jumped into the PC block
    c_bp_side: jnp.ndarray  # [B] bool: side pointer jumped into the PC block
    inv_bin: jnp.ndarray    # [B] first suspect spectral bin (init L_spec + 1)
    be_l: jnp.ndarray       # [B] corrupt byte range in the PC block
    be_r: jnp.ndarray       # [B]
    bfi2: jnp.ndarray       # [B] bool: frame flagged bfi == 2 by the FEC


def _pc_check(st: DecSt, cur_bin, active, *, pc_bytes: int, from_left: bool,
              enc: bool):
    """check_pc_bytes (ari_codec.c:1824-1921), vectorized over lanes.

    Returns (st, stop): `stop` lanes must suppress the pending byte/bit read
    — for the encoder simulation it marks pointer convergence (b_left
    found); for the decoder it marks entry into the corrupted byte range of
    the relocated PC block (-> ber_detect with inv_bin)."""
    assert pc_bytes > 0
    act = active if from_left else (active & (st.mask_side == 1))
    bp_local = st.bp if from_left else st.bp - 1
    bp_side_local = st.bp_side + ((st.mask_side == 1).astype(I32)
                                  if from_left else 0)
    offset = -1 + (0 if enc else pc_bytes)
    conv = act & (st.b_right < 0) & \
        (bp_side_local + offset - bp_local == pc_bytes)
    st = st._replace(b_left=jnp.where(conv, bp_local + 1, st.b_left),
                     b_right=jnp.where(conv, bp_side_local - 1, st.b_right))
    if enc:
        return st, conv
    have = act & (st.b_right >= 0)
    if from_left:
        jump = have & (st.bp == st.b_left)
        st = st._replace(bp=jnp.where(jump, 0, st.bp),
                         c_bp=st.c_bp | jump)
    else:
        jump = have & (bp_side_local == st.b_right)
        st = st._replace(bp_side=jnp.where(jump, pc_bytes - 1, st.bp_side),
                         c_bp_side=st.c_bp_side | jump)
    in2 = act & st.bfi2
    trig = in2 & ((st.c_bp & (st.bp >= st.be_l))
                  | (st.c_bp_side & (st.bp_side <= st.be_r)))
    soft = in2 & ~trig & (st.c_bp | (st.c_bp_side
                                     & (st.bp_side <= pc_bytes - 1)))
    inv = jnp.where(trig, cur_bin,
                    jnp.where(soft, jnp.minimum(st.inv_bin, cur_bin),
                              st.inv_bin))
    return st._replace(inv_bin=inv), trig


def dec_init(buf, bp_side, mask_side, pc: dict | None = None,
             be_l=None, be_r=None, bfi2=None):
    """ac_dec_init (3 forward bytes). With a PC block the forward pointer
    starts past the relocated block (bp = pc.bytes, ari_codec.c:490-495);
    the encoder simulation (pc['enc']) reads the logical stream from 0.
    Returns (st, stop) — stop lanes aborted during init."""
    Bn, nbytes = buf.shape
    rows = jnp.arange(Bn, dtype=I32)
    z = lambda v: jnp.full((Bn,), v, I32)
    fb = jnp.zeros((Bn,), bool)
    if pc is None:
        low = jnp.zeros((Bn,), I32)
        for i in range(3):
            low = (low << 8) + buf[rows, i]
        return DecSt(buf, z(3), low, z(MASK24), z(0), bp_side, mask_side,
                     z(0), z(-1), fb, fb, z(0), z(-1), z(-1), fb), fb
    pcb = pc["pc_bytes"]
    start = 0 if pc["enc"] else pcb
    st = DecSt(buf, z(start), z(0), z(MASK24), z(0), bp_side, mask_side,
               z(pc["numbytes"] + 1), z(-1), fb, fb, z(pc["L_spec"] + 1),
               z(-1) if be_l is None else be_l >> 3,
               z(-1) if be_r is None else be_r >> 3,
               fb if bfi2 is None else bfi2)
    stop = fb
    low = jnp.zeros((Bn,), I32)
    for i in range(3):
        st, trig = _pc_check(st, jnp.zeros((Bn,), I32), ~stop,
                             pc_bytes=pcb, from_left=True, enc=pc["enc"])
        stop = stop | trig
        ok = ~stop
        byte = st.buf[rows, jnp.clip(st.bp, 0, nbytes - 1)]
        low = jnp.where(ok, (low << 8) + byte, low)
        st = st._replace(bp=st.bp + ok.astype(I32))
    return st._replace(low=low), stop


def ac_decode(st: DecSt, cum_freq_rows, num_sym: int, active, cur_bin=None,
              pc: dict | None = None):
    """ac_decode_fl (ari_codec.c:115-146) + PC hook in the renormalization
    byte reads (ac_dec_update_fx, ari_codec.c:1782-1802). cum_freq_rows:
    [B, num_sym+1] per-stream cumulative frequency table (cf[num_sym] =
    1024). Returns (st, val, stop)."""
    Bn, nbytes = st.buf.shape
    rows = jnp.arange(Bn, dtype=I32)
    tmp = st.range >> 10
    ber = jnp.where(active & (st.low >= (tmp << 10)), 1, st.ber)
    below = tmp[:, None] * cum_freq_rows[:, :num_sym] <= st.low[:, None]
    val = jnp.sum(below.astype(I32), axis=1) - 1
    val = jnp.clip(val, 0, num_sym - 1)
    cf = jnp.take_along_axis(cum_freq_rows, val[:, None], 1)[:, 0]
    sf = jnp.take_along_axis(cum_freq_rows, val[:, None] + 1, 1)[:, 0] - cf
    low = jnp.where(active, st.low - tmp * cf, st.low)
    rng = jnp.where(active, tmp * sf, st.range)
    st = st._replace(ber=ber)
    stop = jnp.zeros((Bn,), bool)
    bp = st.bp
    for _ in range(2):
        need = active & (rng < (1 << 16)) & ~stop
        if pc is not None:
            st = st._replace(bp=bp)
            st, trig = _pc_check(st, cur_bin, need, pc_bytes=pc["pc_bytes"],
                                 from_left=True, enc=pc["enc"])
            bp = st.bp
            stop = stop | trig
            need = need & ~trig
        byte = st.buf[rows, jnp.clip(bp, 0, nbytes - 1)]
        low = jnp.where(need, ((low << 8) & MASK24) + byte, low)
        bp = bp + need.astype(I32)
        rng = jnp.where(need, rng << 8, rng)
    return st._replace(low=low, range=rng, bp=bp), val, stop


def decode(cfg: Config, buf, side, bfi_in=None, be_bp_left=None,
           be_bp_right=None, pc_enc_sim: bool = False):
    """processAriDecoder: spectrum + TNS coefficients + residual bits.

    side: dict from bits.parse_side_info. Returns dict with x [B, N] i32,
    tns_idx [B,2,8], tns_order, nf_seed, zero_frame, residual bits, bfi
    (0/1/2), spec_inv_idx, b_left.

    When the frame carries a partial-concealment block (cfg.n_pc > 0) the
    transmitted core payload is reordered (processReorderBitstream_fx); the
    forward pointer then starts past the block and both pointers jump into
    it at the convergence point (check_pc_bytes, ari_codec.c:1824-1921).
    bfi_in==2 lanes track entry into the corrupted byte range
    [be_bp_left, be_bp_right] and abort with spec_inv_idx for the PC stage.
    pc_enc_sim runs the encoder-side simulation (mode==1, enc_lc3.c:245-259)
    on the *logical* stream, only to discover b_left for the reorder.
    """
    Bn, nbytes = buf.shape
    N = cfg.yLen
    lastnz = side["lastnz"]
    lsb_mode = side["lsb_mode"]
    n_pc = cfg.n_pc
    use_pc = n_pc > 0 or pc_enc_sim
    if use_pc:
        pc = dict(pc_bytes=(n_pc + 1) >> 1, numbytes=cfg.targetBytes,
                  L_spec=N, enc=pc_enc_sim)
        pcb = pc["pc_bytes"]
        bfi2 = None if bfi_in is None else (bfi_in == 2)
        st, init_stop = dec_init(buf, side["bp_side"], side["mask_side"],
                                 pc, be_bp_left, be_bp_right, bfi2)
    else:
        pc = None
        st, init_stop = dec_init(buf, side["bp_side"], side["mask_side"])
    bfi = init_stop.astype(I32)
    res_dead = jnp.zeros((Bn,), bool)
    zero_bin = jnp.zeros((Bn,), I32)
    max_lev_iter = 22 if cfg.hrmode else 14

    def side_read(st, bfi, act, cur_bin, res_phase=False, res_dead=None):
        """Backward bit read with the PC hook (check_pc_bytes from_left=0
        before each fresh side byte). Spectral-phase aborts -> ber_detect
        (bfi=1, reclassified below); residual-phase -> ber_detect_res."""
        if pc is not None:
            st, trig = _pc_check(st, cur_bin, act, pc_bytes=pcb,
                                 from_left=False, enc=pc["enc"])
            if res_phase:
                res_dead = res_dead | trig
            else:
                bfi = jnp.where(trig, 1, bfi)
            act = act & ~trig
        bit, nbp, nmask = B_.read_bit(st.buf, st.bp_side, st.mask_side)
        st = st._replace(bp_side=jnp.where(act, nbp, st.bp_side),
                         mask_side=jnp.where(act, nmask, st.mask_side))
        if res_phase:
            return st, bit, act, res_dead
        return st, bit, act, bfi

    # --- TNS ---
    tns_max = 8 if cfg.frame_dms == 100 else 4
    order_cf = jnp.asarray(T.t("ari_tns_order_cf"), I32)   # [2, 9]
    coef_cf = jnp.asarray(T.t("ari_tns_freq_cf"), I32)     # [8, 18]
    lpcw = 1 if cfg.enable_lpc_weighting else 0
    tns_order = jnp.zeros((Bn, 2), I32)
    tns_idx = jnp.zeros((Bn, 2, 8), I32)
    for f in range(2):
        act_f = (f < side["num_tns"]) & (side["tns_on"][:, f] > 0) & (bfi == 0)
        st, val, stp = ac_decode(st, jnp.broadcast_to(order_cf[lpcw][None, :],
                                                      (Bn, 9)),
                                 8, act_f, zero_bin, pc)
        bfi = jnp.where(stp, 1, bfi)
        order = val + 1
        bfi = jnp.where(act_f & (order > tns_max), 1, bfi)
        tns_order = tns_order.at[:, f].set(jnp.where(act_f, order, 0))
        for k in range(8):
            act_k = act_f & (k < order) & (bfi == 0)
            bfi = bfi | jnp.where(act_k & (st.bp_side < st.bp), 1, 0)
            st, v, stp = ac_decode(st, jnp.broadcast_to(coef_cf[k][None, :],
                                                        (Bn, 18)),
                                   17, act_k, zero_bin, pc)
            bfi = jnp.where(stp, 1, bfi)
            tns_idx = tns_idx.at[:, f, k].set(jnp.where(act_k, v, 0))
    bfi = bfi | st.ber

    # --- spectrum ---
    lookup = jnp.asarray(T.t("ari_spec_lookup_fl"), I32)
    cumf = jnp.asarray(T.t("ari_spec_cumfreq_fl"), I32)    # [64, 18]
    rate_flag = cfg.rateFlag if cfg.fs_idx != 5 else 0

    def tup_body(carry, k):
        st, c, bfi = carry
        in_range = ((2 * k) < lastnz) & (bfi == 0)
        a_bin = 2 * k
        b_bin = 2 * k + 1
        t = c + rate_flag + jnp.where(k > N // 4, 256, 0)
        ak = jnp.zeros((Bn,), I32)
        bk = jnp.zeros((Bn,), I32)
        lev_fin = jnp.zeros((Bn,), I32)
        sym_fin = jnp.zeros((Bn,), I32)
        done = jnp.zeros((Bn,), jnp.bool_)
        for lev in range(max_lev_iter):
            act = in_range & ~done & (bfi == 0)
            lev1 = min(lev, 3)
            pki = lookup[jnp.clip(t + lev1 * 1024, 0, 4095)]
            st, sym, stp = ac_decode(st, cumf[pki], 17, act, a_bin, pc)
            bfi = jnp.where(stp, 1, bfi)
            act = act & (bfi == 0)
            is_esc = sym >= 16
            # escape: read two LSB bits unless (lsbMode==1 and lev==0)
            rd = act & is_esc & ((lsb_mode == 0) | (lev > 0))
            st, bit1, rd1, bfi = side_read(st, bfi, rd, a_bin)
            ak = jnp.where(rd1, ak + (bit1 << lev), ak)
            st, bit2, rd2, bfi = side_read(st, bfi, rd1, a_bin)
            bk = jnp.where(rd2, bk + (bit2 << lev), bk)
            hit = act & ~is_esc
            lev_fin = jnp.where(hit, lev, lev_fin)
            sym_fin = jnp.where(hit, sym, sym_fin)
            done = done | hit
            lev_fin = jnp.where(act & is_esc, lev + 1, lev_fin)  # exit level
        # BER: exhausted all 14 levels with escape (non-HR, ari_codec.c:330)
        if not cfg.hrmode:
            bfi = jnp.where(in_range & ~done & (lev_fin - 1 == 13), 1, bfi)
            lev_eff = jnp.minimum(lev_fin, 13)
        else:
            lev_eff = lev_fin
        lev_out = jnp.where(in_range, lev_eff, 0)
        a_fin = sym_fin & 3
        b_fin = sym_fin >> 2
        ak = ak + jnp.where(in_range, a_fin << lev_eff, 0)
        bk = bk + jnp.where(in_range, b_fin << lev_eff, 0)
        # signs
        rd = in_range & (ak > 0) & (bfi == 0)
        st, bit, rd, bfi = side_read(st, bfi, rd, a_bin)
        ak = jnp.where(rd & (bit == 1), -ak, ak)
        rd = in_range & (bk > 0) & (bfi == 0)
        st, bit, rd, bfi = side_read(st, bfi, rd, b_bin)
        bk = jnp.where(rd & (bit == 1), -bk, bk)
        ak_out = jnp.where(in_range, ak, 0)
        bk_out = jnp.where(in_range, bk, 0)
        # context update
        lev1 = jnp.minimum(lev_eff, 3)
        t_next = jnp.where(lev1 <= 1, 1 + (a_fin + b_fin) * (lev1 + 1), 12 + lev1)
        c = jnp.where(in_range, (c & 15) * 16 + t_next, c)
        # pointer-crossing consistency (with PC, valid only while both
        # pointers are on the same side of the block, ari_codec.c:750)
        crossed = (st.bp - st.bp_side) > 3
        if pc is not None:
            crossed = crossed & (st.c_bp == st.c_bp_side)
        bfi = jnp.where(in_range & crossed, 1, bfi)
        bfi = bfi | st.ber
        # explicit i32: under jax_enable_x64 (the device fixed-decode
        # process) weak-typed promotions would flip carry dtypes mid-scan
        return (st, c.astype(I32), bfi.astype(I32)), \
            (ak_out.astype(I32), bk_out.astype(I32), lev_out.astype(I32))

    # the spectrum/level buffers are emitted as stacked scan OUTPUTS, not
    # carried state: carrying [B, N] through the scan makes XLA
    # materialize (copy) the full buffer every symbol step — ~N/2 copies
    # of B*N i32 dominate HBM traffic and serialize the decoder. As ys
    # they are written once.
    (st, _, bfi), (aks, bks, levs) = jax.lax.scan(
        tup_body, (st, jnp.zeros((Bn,), I32), bfi), jnp.arange(N // 2, dtype=I32))
    x = jnp.zeros((Bn, N), I32)
    x = x.at[:, 0: 2 * (N // 2): 2].set(aks.T)
    x = x.at[:, 1: 2 * (N // 2): 2].set(bks.T)
    save_lev = levs.T

    # --- residual bits ---
    total_bits = cfg.targetBytes * 8
    log2_mask = 31 - jax.lax.clz(jnp.maximum(st.mask_side, 1))
    msb_r = 31 - jax.lax.clz(jnp.maximum(st.range, 1))
    if pc is not None and not pc_enc_sim:
        # PC-adjusted consumed-bit accounting (ari_codec.c:965-981; the
        # encoder simulation reads the logical stream from byte 0 and is
        # exempt, the C's `IF (mode != 1)` guard)
        consumed = jnp.where(st.c_bp, st.bp + st.b_left - pcb, st.bp - pcb)
        nbits_ari = (consumed + 1 - 3) * 8 + 25 - msb_r
        nbits_side = total_bits - 16 + log2_mask - 8 * jnp.where(
            st.c_bp_side, st.b_left - pcb + st.bp_side, st.bp_side)
    else:
        nbits_side = total_bits - (8 * (st.bp_side + 1) + 8 - log2_mask)
        nbits_ari = (st.bp + 1 - 3) * 8 + 25 - msb_r
    nbits_residual = total_bits - (nbits_side + nbits_ari)
    bfi = jnp.where((bfi == 0) & (nbits_residual < 0), 1, bfi)
    nbits_residual = jnp.maximum(nbits_residual, 0)

    # lsb_mode == 0: residual bits, one per nonzero coefficient (x20 in HR)
    from .quant import residual_max_bits
    nz_count = jnp.sum((x != 0).astype(I32), axis=1)
    if cfg.hrmode:
        nz_count = nz_count * 20  # EXT_RES_ITER_MAX (ari_codec.c:441-444)
    n_res0 = jnp.minimum(nbits_residual, nz_count)
    max_res = min(residual_max_bits(cfg), total_bits)
    def res_body(carry, k):
        st, res_dead = carry
        act = (lsb_mode == 0) & (k < n_res0) & (bfi == 0) & ~res_dead
        st, bit, act, res_dead = side_read(st, res_dead, act, st.inv_bin,
                                           res_phase=True, res_dead=res_dead)
        return (st, res_dead), jnp.where(act, bit, 0)

    (st, res_dead), res_ys = jax.lax.scan(
        res_body, (st, res_dead), jnp.arange(max_res, dtype=I32))
    res_bits = res_ys.T  # [Bn, max_res]; ys not carry — see tup_body note

    # lsb_mode == 1: apply LSB refinement inline (ari_codec.c:476-556).
    # Each step only reads/writes its own bin pair (2k, 2k+1), so the
    # refined pairs are emitted as ys against the read-only pre-LSB x
    # (carrying x would copy [B, N] per step — see tup_body note).
    def lsb_body(carry, inp):
        st, budget, res_dead = carry
        k, xa, xb = inp
        has = (lsb_mode == 1) & (save_lev[:, k] > 0) & ((2 * k) < lastnz) \
            & (bfi == 0)
        outs = []
        for xv in (xa, xb):
            act = has & (budget > 0) & ~res_dead
            st, bit, act, res_dead = side_read(
                st, res_dead, act, st.inv_bin, res_phase=True,
                res_dead=res_dead)
            budget = budget - act.astype(I32)
            # bit==1 and xv!=0 -> move away from zero
            upd = jnp.where(xv > 0, xv + 1, jnp.where(xv < 0, xv - 1, xv))
            xv2 = jnp.where(act & (bit == 1) & (xv != 0), upd, xv)
            # xv==0 -> need second bit for sign
            act2 = act & (bit == 1) & (xv == 0) & (budget > 0) & ~res_dead
            st, bit2, act2, res_dead = side_read(
                st, res_dead, act2, st.inv_bin, res_phase=True,
                res_dead=res_dead)
            budget = budget - act2.astype(I32)
            outs.append(jnp.where(act2, jnp.where(bit2 == 0, 1, -1), xv2))
        return (st, budget, res_dead), (outs[0], outs[1])

    xa_in = x[:, 0: 2 * (N // 2): 2].T
    xb_in = x[:, 1: 2 * (N // 2): 2].T
    (st, _, res_dead), (xa_out, xb_out) = jax.lax.scan(
        lsb_body, (st, nbits_residual, res_dead),
        (jnp.arange(N // 2, dtype=I32), xa_in, xb_in))
    x = x.at[:, 0: 2 * (N // 2): 2].set(xa_out.T)
    x = x.at[:, 1: 2 * (N // 2): 2].set(xb_out.T)

    # --- final classification + outputs ---
    n_res = jnp.where(lsb_mode == 0, n_res0, 0)
    if pc is not None and not pc_enc_sim:
        # ber_detect: a PC-block abort (or any BER) with a valid inv_bin
        # becomes a partial loss (bfi=2 + spec_inv_idx, ari_codec.c:1164-1187)
        to2 = (bfi == 1) & (st.inv_bin > 0) & (st.inv_bin <= N)
        spec_inv_idx = jnp.where(to2, st.inv_bin, N)
        bfi = jnp.where(to2, 2, bfi)
        # input bfi==2 lanes that decoded past the corrupt range cleanly
        # keep bfi=0 (the spec_inv_idx==L_spec -> bfi=0 rule)
    else:
        spec_inv_idx = jnp.full((Bn,), N, I32)

    # noise-filling seed over bins below spec_inv_idx (ari_codec.c:1104-1111)
    kidx = jnp.arange(N, dtype=I32)[None, :]
    seed_mask = kidx < spec_inv_idx[:, None]
    nf_seed = jnp.sum(jnp.where(seed_mask, jnp.abs(x) * kidx, 0), axis=1) \
        & 65535
    nf_seed = jnp.where(nf_seed >= 32768, nf_seed - 65536, nf_seed)
    zero_frame = ((lastnz == 2) & (x[:, 0] == 0) & (x[:, 1] == 0)
                  & (side["gg_idx"] == 0) & (side["fac_ns_idx"] == 7)).astype(I32)
    bfi = jnp.where((bfi == 0) & (st.ber > 0), 1, bfi)
    if pc is not None and not pc_enc_sim:
        dead2 = (bfi == 2) | res_dead
        zero_frame = jnp.where(dead2, 0, zero_frame)
        n_res = jnp.where(dead2, 0, n_res)

    # encoder-simulation output: the convergence point for the bitstream
    # reorder, with the never-converged fallback (ari_codec.c:1135-1143)
    if pc_enc_sim:
        b_left = jnp.where(st.b_left > cfg.targetBytes,
                           st.bp_side - pcb, st.b_left)
    else:
        b_left = st.b_left
    return dict(x=x, tns_order=tns_order, tns_idx=tns_idx, nf_seed=nf_seed,
                zero_frame=zero_frame, res_bits=res_bits,
                n_res=n_res,
                residual_present=(lsb_mode == 0).astype(I32), bfi=bfi,
                spec_inv_idx=spec_inv_idx, b_left=b_left)
