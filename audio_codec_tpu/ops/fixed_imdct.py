"""Integer-exact LC3plus IMDCT (BASOP semantics), batched over frames.

The testvec MD5 gate hashes fixed-point decoder output, and the synthesis
transform is the last big integer stage: ProcessingIMDCT (imdct_fx.c:15-180)
= headroom pre-scale -> dct_IV (dct4_fx.c:16-140) over BASOP_cfft
(fft.c:3668) -> per-frame exponent bookkeeping -> TDA unfold + window +
overlap-add in Word16.

The C evaluates one frame at a time with hand-unrolled scalar radix
kernels (fft.c:153-3364).  Here every FFT "node" is a NumPy int64 vector
over the *frame batch* instead, so one pass transforms a whole stream's
spectra; only the stateful OLA windowing runs frame-serially.  All
arithmetic is saturating 32-bit with the exact rounding of the BASOP
primitives (see ops/fixed_dec.py), verified bit-exact per frame against
the instrumented oracle (tests/test_fixed_dec.py).

cfft sizes covered: 40/80/120/160/240 (plus bare 10/15/20/30 radix
kernels) - every 10 ms operating point of the testvec gate; 2.5/5 ms and
HR sizes are the documented frontier.
"""
from __future__ import annotations

import numpy as np

from .. import tables as T
from .fixed_dec import I64, sat32, L_shl, mpy_32_16, mpy_32_32, norm_l, round_fx

# ------------------------------------------------------------ primitives


def _w16(v32: int) -> int:
    """WORD322WORD16 (basop_util.h:40-44)."""
    if v32 >= 1 << 31:
        v32 -= 1 << 32
    r = (v32 >> 15) + 1
    if r > 0xFFFF and v32 > 0:
        return 32767
    r = (r >> 1) & 0xFFFF
    return r - 0x10000 if r >= 0x8000 else r


def _s32(v: int) -> int:
    return v - (1 << 32) if v >= 1 << 31 else v


# operator forms: generic over numpy arrays and jax tracers (the batched
# device port reuses this file's whole radix/dct_IV core — see
# ops/fixed_dev.py; sat32/L_shl dispatch per backend in fixed_dec)

def ladd(a, b):
    return sat32(a + b)


def lsub(a, b):
    return sat32(a - b)


def lneg(a):
    return sat32(-a)


def shr(a, n):
    return a >> n


def lshl1(a):
    return L_shl(a, 1)


m16 = mpy_32_16
m32 = mpy_32_32

# FFT constants (fft.c:53-90)
C31 = _w16(0x91261468)
C51, C52, C53, C54, C55 = (_w16(v) for v in
                           (0x79BC3854, 0x9D839DB0, 0xD18053CE,
                            0x478DDE64, 0xB0000001))
C81, C82 = _w16(0x5A82799A), _w16(0xA57D8666)
C51_32, C52_32, C53_32, C54_32, C55_32 = (
    _s32(v) for v in (0x79BC3854, 0x9D839DB0, 0xD18053CE,
                      0x478DDE64, 0xB0000001))
C81_32, C82_32 = _s32(0x5A82799A), _s32(0xA57D8666)
TWIDDLE = _w16(0x5A82799A)

SC5, SC8, SC10, SC15, SC20 = 4, 4, 5, 5, 5
SC30_1, SC30_2, SCN2 = 5, 1, 3
SCALE = {10: 5, 15: 5, 20: 5, 30: 6, 40: 7, 60: 7, 80: 8, 120: 8, 160: 8,
         240: 9}


# ------------------------------------------------------------ radix cores

def _core5(x0, x1, x2, x3, x4, mul, c51, c52, c53, c54, c55):
    """Shared 5-point butterfly (fft5 / the FFT5 stages of fft10/15/20/30;
    e.g. fft.c:215-231).  Returns (y0, r1, r3, r4, r2)."""
    r1, r4 = ladd(x1, x4), lsub(x1, x4)
    r3, r2 = ladd(x2, x3), lsub(x2, x3)
    t = mul(lsub(r1, r3), c54)
    r1 = ladd(r1, r3)
    y0 = ladd(x0, r1)
    r1 = ladd(y0, lshl1(mul(r1, c55)))
    r3, r1 = lsub(r1, t), ladd(r1, t)
    t = mul(ladd(r4, r2), c51)
    r4 = ladd(t, lshl1(mul(r4, c52)))
    r2 = ladd(t, mul(r2, c53))
    return y0, r1, r3, r4, r2


def _comb5(rr, ss):
    """FFT5 real/imag combination (fft.c:261-277): returns output pairs
    (p0, p1, p2, p3, p4) of (re, im)."""
    y0, r1, r3, r4, r2 = rr
    z0, s1, s3, s4, s2 = ss
    return [(y0, z0),
            (ladd(r1, s2), lsub(s1, r2)),
            (lsub(r3, s4), ladd(s3, r4)),
            (ladd(r3, s4), lsub(s3, r4)),
            (lsub(r1, s2), ladd(s1, r2))]


def _fft5_pairs(p, mul, consts):
    """One FFT5 on 5 (re, im) node pairs, canonical argument order."""
    rr = _core5(*(x[0] for x in p), mul, *consts)
    ss = _core5(*(x[1] for x in p), mul, *consts)
    return _comb5(rr, ss)


_C16 = (C51, C52, C53, C54, C55)
_C32 = (C51_32, C52_32, C53_32, C54_32, C55_32)


def fft5(p):
    """fft5 (fft.c:204-281): 32-bit twiddle constants."""
    p = [(shr(r, SC5), shr(i, SC5)) for r, i in p]
    return _fft5_pairs(p, m32, _C32)


def fft8(p, shift=SC8):
    """fft8 (fft.c:312-433)."""
    x = []
    for r, i in p:
        x += [shr(r, shift), shr(i, shift)]
    return _bfly8(x, m16, C81, C82, pre_shift=0)


def _bfly8(x, mul, c81, c82, pre_shift):
    """Radix-8 butterfly shared by fft8 (fft.c:341-428) and the second
    stage of fft40/fftN2 (fft.c:3272-3355, 3492-3600); pre_shift>0 applies
    the SCALEFACTORN2-1 shifts of the combined-FFT variant."""
    (x00, x01, x02, x03, x04, x05, x06, x07,
     x08, x09, x10, x11, x12, x13, x14, x15) = x
    ps = (lambda v: shr(v, pre_shift)) if pre_shift else (lambda v: v)
    t00, t02 = ps(ladd(x00, x08)), ps(lsub(x00, x08))
    t01, t03 = ps(ladd(x01, x09)), ps(lsub(x01, x09))
    t04, t06 = ps(ladd(x02, x10)), lsub(x02, x10)
    t05, t07 = ps(ladd(x03, x11)), lsub(x03, x11)
    t08, t10 = ps(ladd(x04, x12)), ps(lsub(x04, x12))
    t09, t11 = ps(ladd(x05, x13)), ps(lsub(x05, x13))
    t12, t14 = ps(ladd(x06, x14)), lsub(x06, x14)
    t13, t15 = ps(ladd(x07, x15)), lsub(x07, x15)
    if not pre_shift:
        # fft8 proper: no extra shifts on the diagonal terms either
        pass
    s00, s04 = ladd(t00, t08), lsub(t00, t08)
    s01, s05 = ladd(t01, t09), lsub(t01, t09)
    s08, s10 = lsub(t02, t11), ladd(t02, t11)
    s09, s11 = ladd(t03, t10), lsub(t03, t10)
    s02, s07 = ladd(t04, t12), lsub(t04, t12)
    s03, s06 = ladd(t05, t13), lsub(t13, t05)
    ta = ps(ladd(t06, t14))
    tb = ps(lsub(t06, t14))
    tc = ps(ladd(t07, t15))
    td = ps(lsub(t07, t15))
    s12 = mul(ladd(tc, tb), c81)
    s14 = mul(lsub(tc, tb), c81)
    s13 = mul(lsub(td, ta), c81)
    s15 = mul(ladd(ta, td), c82)
    return [(ladd(s00, s02), ladd(s01, s03)),
            (ladd(s10, s12), ladd(s11, s13)),
            (lsub(s04, s06), lsub(s05, s07)),
            (ladd(s08, s14), ladd(s09, s15)),
            (lsub(s00, s02), lsub(s01, s03)),
            (lsub(s10, s12), lsub(s11, s13)),
            (ladd(s04, s06), ladd(s05, s07)),
            (lsub(s08, s14), lsub(s09, s15))]


def fft10(p):
    """fft10 (fft.c:433-595): 2 FFT5 stages + 5 radix-2 stages."""
    l = [(shr(r, SC10), shr(i, SC10)) for r, i in p]
    # core A over inputs 0,2,4,6,8; canonical arg order per fft.c:448-451
    a = _fft5_pairs([l[0], l[6], l[2], l[8], l[4]], m16, _C16)
    b = _fft5_pairs([l[5], l[1], l[7], l[3], l[9]], m16, _C16)
    out = [None] * 10
    # 5 fft2 stages (fft.c:550-595); yA pairs at even slots, yB odd
    for k, (oa, ob) in enumerate([(0, 5), (2, 7), (4, 9), (6, 1), (8, 3)]):
        (ar, ai), (br, bi) = a[k], b[k]
        out[oa] = (ladd(ar, br), ladd(ai, bi))
        out[ob] = (lsub(ar, br), lsub(ai, bi))
    return out


_FFT15_SLOTS = [(0, 10, 5), (6, 1, 11), (12, 7, 2), (3, 13, 8), (9, 4, 14)]


def _fft15_core(l):
    """3 FFT5 + 5 FFT3 stages shared by fft15 and fft30
    (fft.c:656-913, 1817-2320). `l` is the 15 loaded (re, im) pairs in C
    load order; output slot k of stage t per _FFT15_SLOTS."""
    blocks = [_fft5_pairs(l[5 * j: 5 * j + 5], m16, _C16) for j in range(3)]
    out = [None] * 15
    for k, (i0, isub, iadd) in enumerate(_FFT15_SLOTS):
        (ar, ai) = blocks[0][k]
        (br, bi) = blocks[1][k]
        (cr, ci) = blocks[2][k]
        r1 = ladd(br, cr)
        r2 = m16(lsub(br, cr), C31)
        o0r = ladd(ar, r1)
        r1 = lsub(ar, shr(r1, 1))
        s1 = ladd(bi, ci)
        s2 = m16(lsub(bi, ci), C31)
        o0i = ladd(ai, s1)
        s1 = lsub(ai, shr(s1, 1))
        out[i0] = (o0r, o0i)
        out[isub] = (lsub(r1, s2), ladd(s1, r2))
        out[iadd] = (ladd(r1, s2), lsub(s1, r2))
    return out


_LOAD15 = [0, 3, 6, 9, 12, 5, 8, 11, 14, 2, 10, 13, 1, 4, 7]


def fft15(p):
    l = [(shr(p[j][0], SC15), shr(p[j][1], SC15)) for j in _LOAD15]
    return _fft15_core(l)


_LOAD30_A = [0, 18, 6, 24, 12, 20, 8, 26, 14, 2, 10, 28, 16, 4, 22]
_LOAD30_B = [15, 3, 21, 9, 27, 5, 23, 11, 29, 17, 25, 13, 1, 19, 7]
_PAIR30 = [0, 8, 1, 9, 2, 10, 3, 11, 4, 12, 5, 13, 6, 14, 7]


def fft30(p):
    """fft30 (fft.c:1791-2583): 2 FFT15 blocks + 15 FFT2 stages."""
    za = _fft15_core([(shr(p[j][0], SC30_1), shr(p[j][1], SC30_1))
                      for j in _LOAD30_A])
    zb = _fft15_core([(shr(p[j][0], SC30_1), shr(p[j][1], SC30_1))
                      for j in _LOAD30_B])
    out = [None] * 30
    for t in range(15):
        k = _PAIR30[t]
        r1, r3 = shr(za[k][0], SC30_2), shr(za[k][1], SC30_2)
        r2, r4 = shr(zb[k][0], SC30_2), shr(zb[k][1], SC30_2)
        add_ = (ladd(r1, r2), ladd(r3, r4))
        sub_ = (lsub(r1, r2), lsub(r3, r4))
        if t % 2 == 0:          # odd-numbered stage in the C: rel gets add
            out[t], out[15 + t] = add_, sub_
        else:
            out[15 + t], out[t] = add_, sub_
    return out


_LOAD20 = [[0, 16, 12, 8, 4], [5, 1, 17, 13, 9],
           [10, 6, 2, 18, 14], [15, 11, 7, 3, 19]]


def fft20(p):
    """fft20 (fft.c:1395-1786): 4 FFT5 stages + 5 FFT4 stages."""
    blocks = [_fft5_pairs([(shr(p[j][0], SC20), shr(p[j][1], SC20))
                           for j in idx], m16, _C16)
              for idx in _LOAD20]
    out = [None] * 20
    for g in range(5):
        (ar, ai), (br, bi), (cr, ci), (dr, di) = (blocks[b][g]
                                                  for b in range(4))
        t0, t2 = ladd(ar, cr), lsub(ar, cr)
        t1, t3 = ladd(ai, ci), lsub(ai, ci)
        t4, t7 = ladd(br, dr), lsub(br, dr)
        t5, t6 = ladd(di, bi), lsub(di, bi)
        s = [(ladd(t0, t4), ladd(t1, t5)), (lsub(t2, t6), lsub(t3, t7)),
             (lsub(t0, t4), lsub(t1, t5)), (ladd(t2, t6), ladd(t3, t7))]
        for j in range(4):
            out[(4 * g + 5 * j) % 20] = s[j]
    return out


def _concat(vs):
    """Concatenate batch vectors (np or jnp) along the lane axis.  Host
    inputs may be plain Python ints (the scalar PLC paths feed single
    nodes) — anything that is not a jax array stays on the numpy path."""
    v0 = vs[0]
    if isinstance(v0, (np.ndarray, np.generic, int, float)):
        return np.concatenate([np.atleast_1d(np.asarray(v, I64))
                               for v in vs])
    import jax.numpy as jnp
    return jnp.concatenate([jnp.atleast_1d(v) for v in vs])


def _rep(vals, seg):
    """Per-segment constant vector: vals[i] repeated seg times (host np;
    broadcast against batch vectors of length len(vals)*seg)."""
    return np.repeat(np.asarray(vals, I64), seg)


def _chunked_fft2(p, dim1, dim2, stage1, twiddle, bfly):
    """Shared two-stage FFT driver (fftN2 and fft40, fft.c:3364-3660):
    all `dim2` first-stage transforms and all `dim1` second-stage
    butterfly columns run as ONE trace each, with the chunk/column index
    folded into the lane axis — identical elementwise arithmetic to the
    per-column loops, but ~dim1x fewer ops to compile (the fully unrolled
    cfft-240 graph was otherwise too large for XLA)."""
    v = p[0][0]
    B = v.shape[0] if getattr(v, "ndim", 0) else 1
    # first stage: chunk i gets inputs p[i + dim2*j]
    big_in = [( _concat([p[i + dim2 * j][0] for i in range(dim2)]),
                _concat([p[i + dim2 * j][1] for i in range(dim2)]))
              for j in range(dim1)]
    big_out = stage1(big_in)                      # dim1 pairs of [dim2*B]
    # re-lay: column vector v_k = concat over i of chunk k-th segment? no:
    # chunks[k][i] = big_out[i] segment k; v over columns i for fixed k
    cols = []
    for k in range(dim2):
        re = _concat([big_out[i][0][k * B:(k + 1) * B]
                      for i in range(dim1)])
        im = _concat([big_out[i][1][k * B:(k + 1) * B]
                      for i in range(dim1)])
        cols.append((re, im))
    x = twiddle(cols, B)
    res = bfly(x)                                 # dim2 pairs of [dim1*B]
    out = [None] * (dim1 * dim2)
    for k in range(dim2):
        for i in range(dim1):
            out[i + dim1 * k] = (res[k][0][i * B:(i + 1) * B],
                                 res[k][1][i * B:(i + 1) * B])
    return out


def fft40(p):
    """fft40 (fft.c:3208-3352): 8 x fft5 then twiddled radix-8 columns
    with the 32-bit RotVector_40_32."""
    W = np.asarray(T.t("fx_RotVector_40_32")).astype(I64)

    def stage1(pairs):
        return fft5(pairs)

    def twiddle(cols, B):
        x = []
        i0_mask = _rep([1] + [0] * 4, B).astype(bool)
        for k in range(8):
            a, b = cols[k]
            if k == 0:
                x += [shr(a, 1), shr(b, 1)]
            else:
                c = _rep([0] + [int(W[2 * (i - 1) + (k - 1) * 8])
                                for i in range(1, 5)], B)
                d = _rep([0] + [int(W[2 * (i - 1) + (k - 1) * 8 + 1])
                                for i in range(1, 5)], B)
                # cplxMpy4_8_2 (fft.c:132-139): conjugate multiply
                tr = shr(ladd(m32(a, c), m32(b, d)), 1)
                ti = shr(lsub(m32(b, c), m32(a, d)), 1)
                xp = _B_where(i0_mask, shr(a, 1), tr)
                yp = _B_where(i0_mask, shr(b, 1), ti)
                x += [xp, yp]
        return x

    def bfly(x):
        return _bfly8(x, m32, C81_32, C82_32, pre_shift=SCN2 - 1)

    return _chunked_fft2(p, 5, 8, stage1, twiddle, bfly)


def _B_where(mask, a, b):
    if isinstance(a, (np.ndarray, np.generic)) and \
            isinstance(b, (np.ndarray, np.generic)):
        return np.where(mask, a, b)
    import jax.numpy as jnp
    return jnp.where(mask, a, b)


_STAGE1 = {5: fft5, 8: fft8, 10: fft10, 15: fft15, 20: fft20, 30: fft30}


def fftN2_8(p, Wname, dim1, sc, Woff):
    """fftN2, dim2 == 8 (fft.c:3364-3434, 3493-3602): dim1-point first
    stage then Word16-twiddled radix-8 columns (chunk-batched)."""
    W = np.asarray(T.t("fx_" + Wname)).astype(I64)

    def twiddle(cols, B):
        x = []
        i0_mask = _rep([1] + [0] * (dim1 - 1), B).astype(bool)
        for k in range(8):
            a, b = cols[k]
            if k == 0:
                x += [shr(a, 1), shr(b, 1)]
            else:
                c = _rep([0] + [int(W[sc * i + sc * k * dim1 - Woff])
                                for i in range(1, dim1)], B)
                d = _rep([0] + [int(W[sc * i + sc * k * dim1 + 1 - Woff])
                                for i in range(1, dim1)], B)
                # cplxMpy4_8_0 (fft.c:113-119)
                tr = shr(lsub(m16(a, c), m16(b, d)), 1)
                ti = shr(ladd(m16(a, d), m16(b, c)), 1)
                x += [_B_where(i0_mask, shr(a, 1), tr),
                      _B_where(i0_mask, shr(b, 1), ti)]
        return x

    def bfly(x):
        return _bfly8(x, m16, C81, C82, pre_shift=SCN2 - 1)

    return _chunked_fft2(p, dim1, 8, _STAGE1[dim1], twiddle, bfly)


def fftN2_4(p, Wname, dim1, sc, Woff):
    """fftN2, dim2 == 4 (fft.c:3395-3460): dim1-point first stage then
    Word16-twiddled radix-4 columns.  The twiddle index uses the FIXED
    stride j = 8 (`j = add(8, 0)`) unlike the dim2==8 branch's sc, and
    cplxMpy4_4_0/_1 shift by SCALEFACTOR60 - SCALEFACTOR15 = 2
    (fft.c:101-109).  Used by cfft-60 (the 2.5/5 ms DCT-IV sizes)."""
    W = np.asarray(T.t("fx_" + Wname)).astype(I64)

    def twiddle(cols, B):
        x = []
        i0_mask = _rep([1] + [0] * (dim1 - 1), B).astype(bool)
        for k in range(4):
            a, b = cols[k]
            if k == 0:
                x += [shr(a, 2), shr(b, 2)]
            else:
                c = _rep([0] + [int(W[sc * i + 8 * k * dim1 - Woff])
                                for i in range(1, dim1)], B)
                d = _rep([0] + [int(W[sc * i + 8 * k * dim1 + 1 - Woff])
                                for i in range(1, dim1)], B)
                # cplxMpy4_4_0 (fft.c:101-105)
                tr = shr(lsub(m16(a, c), m16(b, d)), 2)
                ti = shr(ladd(m16(a, d), m16(b, c)), 2)
                x += [_B_where(i0_mask, shr(a, 2), tr),
                      _B_where(i0_mask, shr(b, 2), ti)]
        return x

    def bfly(x):
        a = _bfly4(*x)
        return [(a[0], a[1]), (a[2], a[3]), (a[4], a[5]), (a[6], a[7])]

    return _chunked_fft2(p, dim1, 4, _STAGE1[dim1], twiddle, bfly)


def cfft(p, length):
    """BASOP_cfft (fft.c:3668-3800) for the IMDCT sizes; returns
    (pairs, scale_add)."""
    if length == 10:
        return fft10(p), SCALE[10]
    if length == 15:
        return fft15(p), SCALE[15]
    if length == 20:
        return fft20(p), SCALE[20]
    if length == 30:
        return fft30(p), SCALE[30]
    if length == 40:
        return fft40(p), SCALE[40]
    if length == 60:
        return fftN2_4(p, "RotVector_480", 15, 4, 60), SCALE[60]
    if length == 80:
        return fftN2_8(p, "RotVector_320", 10, 4, 40), SCALE[80]
    if length == 120:
        return fftN2_8(p, "RotVector_480", 15, 4, 60), SCALE[120]
    if length == 160:
        return fftN2_8(p, "RotVector_320", 20, 2, 40), SCALE[160]
    if length == 240:
        return fftN2_8(p, "RotVector_480", 30, 2, 60), SCALE[240]
    raise NotImplementedError(f"cfft length {length}")


# ------------------------------------------------------------ DCT-IV

_SIN_TABLES = {20: ("fx_SineTable320", 32), 40: ("fx_SineTable320", 16),
               60: ("fx_SineTable480", 16), 80: ("fx_SineTable320", 8),
               120: ("fx_SineTable480", 8), 160: ("fx_SineTable320", 4),
               240: ("fx_SineTable480", 4), 320: ("fx_SineTable320", 2),
               480: ("fx_SineTable480", 2)}


def _cplx_2(a, b, c, d):
    """cplxMpy32_32_16_2 (basop_mpy.h:45-50)."""
    return (lsub(shr(m16(a, c), 1), shr(m16(b, d), 1)),
            ladd(shr(m16(a, d), 1), shr(m16(b, c), 1)))


def dct_IV(pd, L):
    """dct_IV (dct4_fx.c:16-140) on a list of L batch vectors; returns
    (pd, scale_add)."""
    tw = T.t(f"fx_SineWindow{L}")
    sin_name, sin_step = _SIN_TABLES[L]
    sin = T.t(sin_name)
    M = L >> 1
    M2 = M - 1

    p0, p1 = 0, L - 2
    for i in range(0, M2, 2):
        a1, a2 = _cplx_2(pd[p1 + 1], pd[p0],
                         int(tw[i][0]), int(tw[i][1]))
        a3, a4 = _cplx_2(pd[p1], pd[p0 + 1],
                         int(tw[i + 1][0]), int(tw[i + 1][1]))
        pd[p0], pd[p0 + 1] = a2, a1
        pd[p1], pd[p1 + 1] = a4, lneg(a3)
        p0 += 2
        p1 -= 2

    pairs = [(pd[2 * j], pd[2 * j + 1]) for j in range(M)]
    pairs, sc_add = cfft(pairs, M)
    for j in range(M):
        pd[2 * j], pd[2 * j + 1] = pairs[j]

    p0, p1 = 0, L - 2
    idx = sin_step
    M2 = ((M + 1) >> 1) - 1
    a3, a4 = _cplx_2(pd[p1], pd[p1 + 1], int(sin[idx][0]), int(sin[idx][1]))
    pd[p1 + 1] = lneg(shr(pd[p0 + 1], 1))
    pd[p0] = shr(pd[p0], 1)
    for i in range(1, M2):
        pd[p0 + 1], pd[p1] = a3, a4
        p0 += 2
        p1 -= 2
        a1, a2 = _cplx_2(pd[p0 + 1], pd[p0],
                         int(sin[idx][0]), int(sin[idx][1]))
        idx += sin_step
        a3, a4 = _cplx_2(pd[p1], pd[p1 + 1],
                         int(sin[idx][0]), int(sin[idx][1]))
        pd[p1 + 1] = lneg(a1)
        pd[p0] = a2
    pd[p0 + 1], pd[p1] = a3, a4
    p0 += 2
    p1 -= 2
    a3, a4 = _cplx_2(pd[p0 + 1], pd[p0], int(sin[idx][0]), int(sin[idx][1]))
    a1 = shr(m16(pd[p1], TWIDDLE), 1)
    a2 = shr(m16(pd[p1 + 1], TWIDDLE), 1)
    pd[p1] = ladd(a1, a2)
    pd[p0 + 1] = lsub(a1, a2)
    pd[p1 + 1] = lneg(a3)
    pd[p0] = a4
    return pd, sc_add + 2


# ------------------------------------------------------------ IMDCT

_WIN = {80: "fx_LowDelayShapes_n960_N80", 160: "fx_LowDelayShapes_n960_N160",
        240: "fx_LowDelayShapes_n960_N240", 320: "fx_LowDelayShapes_n960_N320",
        480: "fx_LowDelayShapes_n960_N480"}
MAX_BW = 400


def _headroom32(y):
    """getScaleFactor32_0 per column of [L, B] (basop_util.c:402-434):
    headroom, 32 if all zero."""
    nz = y != 0
    n = np.where(nz, norm_l(np.where(nz, y, 1)), 32)
    return n.min(axis=0)


def batch_dct4(y, y_e, N, frame_dms=100):
    """ProcessingIMDCT front half, vectorized over frames: zero BW cap,
    headroom pre-scale, dct_IV, post-scale (imdct_fx.c:60-115).

    y: [n_frames, N] int spectrum; y_e: [n_frames] exponents.
    Returns (ytda [n_frames, N], y_e', y_s') with the per-frame y_s
    headroom after the transform (needed by the OLA stage)."""
    y = np.asarray(y, I64).T.copy()          # [N, B]
    y_e = np.asarray(y_e, I64).copy()
    max_bw = MAX_BW >> {25: 2, 50: 1, 100: 0}[frame_dms]
    if N > max_bw:
        y[max_bw:] = 0
    y_s = _headroom32(y)
    zero = y_s >= 32
    ys_eff = np.where(zero, 0, y_s)
    pd = [L_shl(y[j], ys_eff) for j in range(N)]
    y_e = y_e - ys_eff
    pd, sc_add = dct_IV(pd, N)
    y_e = y_e + sc_add
    out = np.stack(pd)                        # [N, B]
    y_s2 = _headroom32(out).astype(I64) - 1
    y_e = y_e - (y_s2 + 3)
    if N <= 20:
        y_e += 2
    elif N <= 120:
        y_e += 1
    y_e = np.where(zero, 0, y_e)
    return out.T, y_e, y_s2, zero


class ImdctState:
    """Per-stream OLA memory (stDec_ola_mem_fx + exponent)."""

    def __init__(self, N, wLen):
        self.mem = np.zeros(wLen - N, I64)
        self.mem_e = 0


def imdct_ola(ytda, y_e, y_s, zero, w, N, wLen, st: ImdctState):
    """ProcessingIMDCT back half for ONE frame (imdct_fx.c:115-175):
    exponent alignment, TDA unfold + window + overlap-add, Word16 out."""
    z = 2 * N - wLen
    m = N >> 1
    o = m - z
    memLen = wLen - N
    y = np.asarray(ytda, I64)
    y_e, y_s = int(y_e), int(y_s)
    if zero:
        y_e = 0
    mem = st.mem
    nz = mem != 0
    mem_s = int(np.where(nz, norm_l(np.where(nz, mem, 1)) - 16, 16).min())
    if mem_s < 16:
        mem_s -= 1
        st.mem_e -= mem_s
    else:
        st.mem_e = y_e
    s = st.mem_e - y_e
    if s > 0:
        y_s -= s
        y_e += s
    else:
        mem_s += s
        st.mem_e -= s
    mem_s = max(mem_s, -31)
    y_s = max(y_s, -31)

    w = np.asarray(w, I64)
    x = np.empty(wLen, I64)
    i = np.arange(o)
    x[:o] = round_fx(lsub(L_shl(mem[:o] << 16, mem_s),
                          m16(L_shl(y[m + i + z], y_s), w[4 * m - 1 - i - z])))
    i = np.arange(m)
    x[o:o + m] = round_fx(ladd(L_shl(mem[o:o + m] << 16, mem_s),
                               m16(L_shl(y[2 * m - 1 - i], y_s),
                                   w[3 * m - 1 - i])))
    x[3 * m - z: 4 * m - z] = round_fx(lneg(m16(L_shl(y[i], y_s),
                                                w[m - 1 - i])))
    x[3 * m - z - 1 - i] = round_fx(lneg(m16(L_shl(y[i], y_s), w[m + i])))
    st.mem = x[N: N + memLen].copy()
    st.mem_e = y_e
    return x[:N], y_e


def window_table(N):
    return T.t(_WIN[N])


SC16, SC32 = 5, 6
C161, C162 = C81, C82
C163, C164 = _w16(0x7641AF3D), _w16(0x89BE50C3)
C165, C166 = _w16(0x30FBC54D), _w16(0xCF043AB3)


def _bfly4(x0, x1, x2, x3, x4, x5, x6, x7):
    """Radix-4 butterfly used throughout fft16/fft32 (fft.c:1105-1180):
    inputs are (re0,im0, re1,im1, re2,im2, re3,im3)."""
    t0, t2 = ladd(x0, x4), lsub(x0, x4)
    t1, t3 = ladd(x1, x5), lsub(x1, x5)
    t4, t7 = ladd(x2, x6), lsub(x2, x6)
    t5, t6 = ladd(x7, x3), lsub(x7, x3)
    return (ladd(t0, t4), ladd(t1, t5), lsub(t2, t6), lsub(t3, t7),
            lsub(t0, t4), lsub(t1, t5), ladd(t2, t6), ladd(t3, t7))


def fft16(p):
    """fft16 (fft.c:1085-1395)."""
    l = [(shr(r, SC16), shr(i, SC16)) for r, i in p]
    y = [None] * 32

    def blk(i0, i1, i2, i3):
        a = _bfly4(l[i0][0], l[i0][1], l[i1][0], l[i1][1],
                   l[i2][0], l[i2][1], l[i3][0], l[i3][1])
        return list(a)

    y[0:8] = blk(0, 4, 8, 12)
    y[8:16] = blk(1, 5, 9, 13)
    b = blk(2, 6, 10, 14)
    # third block: y20/y21 carry the -j rotation (fft.c:1169-1171)
    y[16:24] = [b[0], b[1], b[2], b[3], None, None, b[6], b[7]]
    t1t5 = lsub(ladd(l[2][1], l[10][1]), ladd(l[6][1], l[14][1]))
    t4t0 = lsub(ladd(l[6][0], l[14][0]), ladd(l[2][0], l[10][0]))
    y[20], y[21] = t1t5, t4t0
    y[24:32] = blk(3, 7, 11, 15)

    def rot2(a, b_, c):
        x0, x1 = m16(a, c), m16(b_, c)
        return lsub(x0, x1), ladd(x0, x1)

    y[22], y[23] = rot2(y[22], y[23], C162)
    y[28], y[29] = rot2(y[28], y[29], C162)
    x0, x1 = m16(y[12], C161), m16(y[13], C161)
    y[12], y[13] = ladd(x0, x1), lsub(x1, x0)
    x0, x1 = m16(y[18], C161), m16(y[19], C161)
    y[18], y[19] = ladd(x0, x1), lsub(x1, x0)

    def rot4(a, b_, c1, c2):
        x0, x1 = m16(a, c1), m16(b_, c2)
        x2, x3 = m16(a, c2), m16(b_, c1)
        return lsub(x0, x1), ladd(x2, x3)

    y[10], y[11] = rot4(y[10], y[11], C163, C166)
    y[14], y[15] = rot4(y[14], y[15], C165, C164)
    y[26], y[27] = rot4(y[26], y[27], C165, C164)
    y[30], y[31] = rot4(y[30], y[31], C164, C165)

    out = [None] * 16
    # final radix-4: pairs (a,b) and (c,d) -> _bfly4 arg order (a,c,b,d)
    for g, (a, b_, c, d) in enumerate([(0, 16, 8, 24), (2, 18, 10, 26),
                                       (4, 20, 12, 28), (6, 22, 14, 30)]):
        r = _bfly4(y[a], y[a + 1], y[c], y[c + 1],
                   y[b_], y[b_ + 1], y[d], y[d + 1])
        out[g] = (r[0], r[1])
        out[g + 4] = (r[2], r[3])
        out[g + 8] = (r[4], r[5])
        out[g + 12] = (r[6], r[7])
    return out


def fft32(p):
    """fft32 (fft.c:2600-3208): 4 x radix-8 + twiddles + 8 x radix-4."""
    l = [(shr(r, SC32 - 1), shr(i, SC32 - 1)) for r, i in p]
    y = [None] * 128
    for j in range(4):
        x = []
        for k in range(8):
            r, i = l[j + 4 * k]
            x += [r, i]
        res = _bfly8(x, m32, C81_32, C82_32, pre_shift=0)
        for k in range(8):
            y[32 * j + 4 * k], y[32 * j + 4 * k + 1] = res[k]
    # flatten pair layout: y index = 2*(16j + k-slot)
    z = [None] * 64
    for j in range(4):
        for k in range(8):
            z[16 * j + 2 * k] = y[32 * j + 4 * k]
            z[16 * j + 2 * k + 1] = y[32 * j + 4 * k + 1]
    y = z
    W = T.t("fx_RotVector_32_32")
    no_tw = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
             16, 17, 32, 33, 48, 49, 40, 41]
    for idx in no_tw:
        y[idx] = shr(y[idx], 1)
    tw_pairs = [18, 20, 22, 24, 26, 28, 30, 34, 36, 38, 42, 44, 46,
                50, 52, 54, 56, 58, 60, 62]
    for n, base in enumerate(tw_pairs):
        a, b = y[base], y[base + 1]
        c, d = int(W[2 * n]), int(W[2 * n + 1])
        as_, bs = shr(a, 1), shr(b, 1)
        y[base] = lsub(m32(as_, c), m32(bs, d))
        y[base + 1] = ladd(m32(as_, d), m32(bs, c))
    out = [None] * 32
    for g in range(8):
        a, b_, c, d = 2 * g, 2 * g + 32, 2 * g + 16, 2 * g + 48
        if g == 4:
            # 5th stage folds the -j twiddle of y40/y41 (fft.c:3028-3035)
            t0 = ladd(y[8], y[41])
            t2 = lsub(y[8], y[41])
            t1 = lsub(y[9], y[40])
            t3 = ladd(y[9], y[40])
        else:
            t0, t2 = ladd(y[a], y[b_]), lsub(y[a], y[b_])
            t1, t3 = ladd(y[a + 1], y[b_ + 1]), lsub(y[a + 1], y[b_ + 1])
        t4, t7 = ladd(y[c], y[d]), lsub(y[c], y[d])
        t5, t6 = ladd(y[d + 1], y[c + 1]), lsub(y[d + 1], y[c + 1])
        out[g] = (ladd(t0, t4), ladd(t1, t5))
        out[g + 8] = (lsub(t2, t6), lsub(t3, t7))
        out[g + 16] = (lsub(t0, t4), lsub(t1, t5))
        out[g + 24] = (ladd(t2, t6), ladd(t3, t7))
    return out


def _fft12_pairs(y):
    """fft12 (fft.c:917-1085) on 12 (re, im) pairs; returns 12 pairs."""
    src = []
    for r, i in y:
        src += [r, i]
    dst = [None] * 24

    def radix3(base, off):
        r1 = ladd(shr(src[off + 8], 2), shr(src[off + 16], 2))
        r2 = m16(lsub(shr(src[off + 8], 2), shr(src[off + 16], 2)), C31)
        pD = shr(src[off], 2)
        d0 = shr(ladd(pD, r1), 1)
        r1 = lsub(pD, shr(r1, 1))
        s1 = ladd(shr(src[off + 9], 2), shr(src[off + 17], 2))
        s2 = m16(lsub(shr(src[off + 9], 2), shr(src[off + 17], 2)), C31)
        pD = shr(src[off + 1], 2)
        d1 = shr(ladd(pD, s1), 1)
        s1 = lsub(pD, shr(s1, 1))
        return d0, d1, shr(r1, 1), shr(r2, 1), shr(s1, 1), shr(s2, 1)

    def cplx(a_re, a_im, vre, vim):
        # cplxMpy_32_16 (basop_mpy.c:38-43)
        return (lsub(m16(a_re, vre), m16(a_im, vim)),
                ladd(m16(a_re, vim), m16(a_im, vre)))

    d0, d1, r1, r2, s1, s2 = radix3(0, 0)
    dst[0], dst[1] = d0, d1
    dst[2] = lsub(r1, s2)
    dst[3] = ladd(s1, r2)
    dst[4] = ladd(r1, s2)
    dst[5] = lsub(s1, r2)
    vre, vim = 0x6EDA, 0x4000
    for i in range(2):
        off = 2 * (i + 1)
        base = 6 * (i + 1)
        d0, d1, r1, r2, s1, s2 = radix3(0, off)
        dst[base], dst[base + 1] = d0, d1
        re_ = lsub(r1, s2)
        im_ = ladd(s1, r2)
        cr, ci = cplx(im_, re_, vre, vim)
        dst[base + 3], dst[base + 2] = cr, ci
        re_ = ladd(r1, s2)
        im_ = lsub(s1, r2)
        vre2 = 0x4000 if i == 0 else -0x4000
        vim2 = 0x6EDA if i == 0 else vim
        cr, ci = cplx(im_, re_, vre2, vim2)
        dst[base + 5], dst[base + 4] = cr, ci
        vre, vim = vre2, vim2
    off, base = 6, 18
    d0, d1, r1, r2, s1, s2 = radix3(0, off)
    dst[base], dst[base + 1] = d0, d1
    dst[base + 2] = ladd(s1, r2)
    dst[base + 3] = lsub(s2, r1)
    dst[base + 4] = lneg(ladd(r1, s2))
    dst[base + 5] = lsub(r2, s1)

    out = [None] * 24
    for i in range(3):
        so = 2 * i
        r1 = ladd(shr(dst[so], 2), shr(dst[so + 12], 2))
        r2 = ladd(shr(dst[so + 6], 2), shr(dst[so + 18], 2))
        s1 = ladd(shr(dst[so + 1], 2), shr(dst[so + 13], 2))
        s2 = ladd(shr(dst[so + 7], 2), shr(dst[so + 19], 2))
        out[so] = ladd(r1, r2)
        out[so + 1] = ladd(s1, s2)
        re_ = lsub(r1, shr(dst[so + 12], 1))
        im_ = lsub(s1, shr(dst[so + 13], 1))
        out[so + 12] = lsub(r1, r2)
        out[so + 13] = lsub(s1, s2)
        r2 = lsub(r2, shr(dst[so + 18], 1))
        s2 = lsub(s2, shr(dst[so + 19], 1))
        out[so + 6] = ladd(re_, s2)
        out[so + 18] = lsub(re_, s2)
        out[so + 7] = lsub(im_, r2)
        out[so + 19] = ladd(im_, r2)
    return [(out[2 * j], out[2 * j + 1]) for j in range(12)]


def fftN2_12(p, Wname, dim1, sc, Woff):
    """fftN2, dim2 == 12 (fft.c:3604-3660)."""
    W = T.t("fx_" + Wname)
    chunks = [_STAGE1[dim1]([p[i + 12 * j] for j in range(dim1)])
              for i in range(12)]
    out = [None] * (12 * dim1)
    for i in range(dim1):
        y = []
        for k in range(12):
            a, b = chunks[k][i]
            if k == 0 or i == 0:
                y.append((a, b))
            else:
                c = int(W[sc * i + sc * k * dim1 - Woff])
                d = int(W[sc * i + sc * k * dim1 + 1 - Woff])
                # cplxMpy4_12_0 (fft.c:131-139)
                y.append((lsub(m16(a, c), m16(b, d)),
                          ladd(m16(a, d), m16(b, c))))
        res = _fft12_pairs(y)
        for k in range(12):
            out[i + dim1 * k] = res[k]
    return out


_STAGE1.update({16: fft16, 32: fft32})
SCALE.update({64: 7, 128: 8, 192: 10, 256: 9, 384: 11})


def _cfft_ext(p, length):
    if length == 16:
        return fft16(p), 5
    if length == 32:
        return fft32(p), 6
    if length == 64:
        return fftN2_8(p, "RotVector_32_8", 8, 8, 64), SCALE[64]
    if length == 128:
        return fftN2_8(p, "RotVector_32_8", 16, 4, 64), SCALE[128]
    if length == 192:
        return fftN2_12(p, "RotVector_32_12", 16, 4, 64), SCALE[192]
    if length == 256:
        return fftN2_8(p, "RotVector_32_8", 32, 2, 64), SCALE[256]
    if length == 384:
        return fftN2_12(p, "RotVector_32_12", 32, 2, 64), SCALE[384]
    return None


_cfft_base = cfft


def cfft(p, length):
    ext = _cfft_ext(p, length)
    if ext is not None:
        return ext
    return _cfft_base(p, length)
