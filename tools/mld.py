#!/usr/bin/env python3
"""Maximum Loudness Difference (MLD) metric — NumPy port of the reference
conformance tool (conformance/tools/mld_src/src/peaq.c, the ITU-R BS.1387
basic-model loudness front end; invoked by lc3_conformance.py:572 with
pass threshold MLD <= 4 for plc/pc/non-correctable-EP families).

Pipeline (peaq.c:120-420): 40-band complex Hann filterbank at 48 kHz with
16x subsampling -> outer/middle-ear weighting -> frequency-domain
spreading -> rectification -> time-domain smearing 1 (cos^2 FIR, 6x
subsampling) -> internal noise -> forward masking IIR -> specific
loudness; MLD = max over 20-frame segments of the per-frame summed
absolute loudness difference.

The recursive 3-resonator FDC filter (subsamp_fdc, peaq.c:225-260)
telescopes to a plain complex FIR h(t) = sum_i w_i b_i^(t+1), t < L —
implemented here as FFT convolution; everything else follows the C
chunk-free (the chunking only affects buffer management, not values).

Usage: python tools/mld.py ref.wav test.wav   (inputs must be 48 kHz)
"""
from __future__ import annotations

import sys

import numpy as np

PEAQ_FS = 48000
NUM_BANDS = 40
SUBSAMP_FB = 16
SUBSAMP_EP = 6
SMEARING_TAPS = 24
SMEARING_C = 6.0 * SUBSAMP_FB
SPREADING_C = float(SUBSAMP_FB)
CHUNK_PCM = 20 * SUBSAMP_EP * SUBSAMP_FB

# (freq, length, delay) per band (peaq.c:79-96)
FILTER_BANDS = [
    (50.00, 1456, 1), (116.19, 1438, 10), (183.57, 1406, 26),
    (252.82, 1362, 48), (324.64, 1308, 75), (399.79, 1244, 107),
    (479.01, 1176, 141), (563.11, 1104, 177), (652.97, 1030, 214),
    (749.48, 956, 251), (853.65, 884, 287), (966.52, 814, 322),
    (1089.25, 748, 355), (1223.10, 686, 386), (1369.43, 626, 416),
    (1529.73, 570, 444), (1705.64, 520, 469), (1898.95, 472, 493),
    (2111.64, 430, 514), (2345.88, 390, 534), (2604.05, 354, 552),
    (2888.79, 320, 569), (3203.01, 290, 584), (3549.90, 262, 598),
    (3933.02, 238, 610), (4356.27, 214, 622), (4823.97, 194, 632),
    (5340.88, 176, 641), (5912.30, 158, 650), (6544.03, 144, 657),
    (7242.54, 130, 664), (8014.95, 118, 670), (8869.13, 106, 676),
    (9813.82, 96, 681), (10858.63, 86, 686), (12014.24, 78, 690),
    (13292.44, 70, 694), (14706.26, 64, 697), (16270.13, 58, 700),
    (18000.02, 52, 703)]


def _band_fir(freq: float, length: int) -> np.ndarray:
    """Equivalent FIR of the 3-resonator FDC filter (peaq.c:133-140)."""
    gamma = np.pi * freq / PEAQ_FS
    t = np.arange(length)
    h = np.zeros(length, complex)
    for i in range(3):
        omega = 2.0 * (gamma + (i - 1) * np.pi / length)
        sigma = 4.0 / ((-2 if i == 1 else 4) * length)
        w = -sigma * np.exp(-1j * gamma * length)
        b = np.exp(1j * omega)
        h += w * b ** (t + 1)
    return h


def loudness_patterns(pcm: np.ndarray, level_db: float = 92.0) -> np.ndarray:
    """pcm: float in [-1, 1) at 48 kHz. Returns [frames, 40] specific
    loudness (peaq_update + peaq_finish semantics)."""
    from scipy.signal import fftconvolve, lfilter

    x = np.asarray(pcm, np.float64) * (10.0 ** (level_db / 20.0))
    # pad like peaq_finish: complete the last chunk with zeros
    n = len(x)
    pad = (-n) % CHUNK_PCM
    x = np.concatenate([x, np.zeros(pad or CHUNK_PCM)])
    n_fb = len(x) // SUBSAMP_FB

    re = np.empty((NUM_BANDS, n_fb))
    im = np.empty((NUM_BANDS, n_fb))
    for k, (freq, length, delay) in enumerate(FILTER_BANDS):
        xd = np.concatenate([np.zeros(delay), x])[: len(x)]
        y = fftconvolve(xd, _band_fir(freq, length))[: len(x)]
        # output m taps conv index 16m-1 (sample emitted before consuming
        # x[16m], subsamp_fdc peaq.c:243-249)
        idx = np.arange(n_fb) * SUBSAMP_FB - 1
        sub = np.where(idx >= 0, y[np.maximum(idx, 0)], 0.0)
        fk = freq / 1000.0
        omw = (-0.6 * 3.64 * fk ** -0.8 + 6.5 * np.exp(-0.6 * (fk - 3.3) ** 2)
               - 1e-3 * fk ** 3.6)
        wgt = 10.0 ** (omw / 20.0)
        re[k] = sub.real * wgt
        im[k] = sub.imag * wgt

    # frequency-domain spreading (peaq.c:288-337)
    freqs = np.array([b[0] for b in FILTER_BANDS])
    z0 = 7.0 * np.arcsinh(50.0 / 650.0)
    z39 = 7.0 * np.arcsinh(18000.02 / 650.0)
    dist = 0.1 ** ((z39 - z0) / 780.0)
    a = np.exp(-SPREADING_C / 4800.0)
    b = 1.0 - a
    lvl = 10.0 * np.log10(np.maximum(re ** 2 + im ** 2, 1e-300))
    s = np.maximum(4.0, 24.0 + 230.0 / freqs[:, None] - 0.2 * lvl)  # [40, T]
    u = dist ** s
    cu = lfilter([a], [1.0, -b], u, axis=1)  # cu_t = a*u_t + b*cu_{t-1}
    cl = dist ** 31.0
    ks = np.arange(NUM_BANDS)
    out_re = np.empty_like(re)
    out_im = np.empty_like(im)
    for t in range(re.shape[1]):
        cut = cu[:, t]
        # upper spreading: band k contributes x_k * cu_k^(j-k) to band j>k
        expo = ks[None, :] - ks[:, None]          # [k, j] = j - k
        M = np.where(expo > 0, cut[:, None] ** np.maximum(expo, 0), 0.0)
        up_re = re[:, t] + (M * re[:, t][:, None]).sum(0)
        up_im = im[:, t] + (M * im[:, t][:, None]).sum(0)
        # downward accumulation with constant cl (peaq.c:327-336)
        d1 = 0.0
        d2 = 0.0
        for k in range(NUM_BANDS - 1, -1, -1):
            d1 = d1 * cl + up_re[k]
            d2 = d2 * cl + up_im[k]
            out_re[k, t] = d1
            out_im[k, t] = d2
    e = out_re ** 2 + out_im ** 2  # rectification

    # time-domain smearing 1: cos^2 FIR, 6x subsampling (peaq.c:190-215,364)
    coef = np.cos(np.pi * (np.arange(SMEARING_TAPS) - (SMEARING_TAPS // 2 - 1))
                  / SMEARING_TAPS) ** 2
    n_ep = e.shape[1] // SUBSAMP_EP
    sm = np.empty((NUM_BANDS, n_ep))
    for k in range(NUM_BANDS):
        y = fftconvolve(e[k], coef)[: e.shape[1]]
        sm[k] = y[np.arange(n_ep) * SUBSAMP_EP + SUBSAMP_EP - 1]
    sm *= 2.0 * 0.9761 / SMEARING_TAPS

    fk = freqs / 1000.0
    sm += (10.0 ** (0.4 * 0.364 * fk ** -0.8))[:, None]     # internal noise
    fm = np.exp(-SMEARING_C / ((0.008 + 100.0 / freqs * (0.05 - 0.008))
                               * PEAQ_FS))                   # forward mask
    for k in range(NUM_BANDS):
        sm[k] = lfilter([1.0 - fm[k]], [1.0, -fm[k]], sm[k])

    le = 10.0 ** (0.364 * fk ** -0.8)
    ls = 10.0 ** (0.1 * (-2.0 - 2.05 * np.arctan(freqs / 4000.0)
                         - 0.75 * np.arctan((freqs / 1600.0) ** 2)))
    c = 1.26539 * 24.0 / NUM_BANDS * ((le / 1e4) / ls) ** 0.23
    loud = c[:, None] * np.maximum(
        (1.0 - ls[:, None] + ls[:, None] * sm / le[:, None]) ** 0.23 - 1.0, 0.0)

    # frame bookkeeping (append_loudness): skip the very first value;
    # valid frames = ceil(n/SUBSAMP_TOT) - 1
    frames = -(-n // (SUBSAMP_FB * SUBSAMP_EP)) - 1
    return loud[:, 1:1 + max(frames, 0)].T


def mld(ref: np.ndarray, test: np.ndarray, level_db: float = 92.0,
        segment: int = 20) -> float:
    """Maximum loudness difference (calc_mld, peaq.c:440-470).
    ref/test: float [-1,1) at 48 kHz, pre-aligned."""
    l1 = loudness_patterns(ref, level_db)
    l2 = loudness_patterns(test, level_db)
    n = min(len(l1), len(l2))
    if n == 0:
        return 0.0
    diff = np.abs(l1[:n] - l2[:n]).sum(1)
    segs = [diff[s: s + segment].max() for s in range(0, n, segment)]
    return float(max(segs))


def resample_48k(x: np.ndarray, fs: int) -> np.ndarray:
    """Rational polyphase resample to 48 kHz (lc3_conformance resamples
    with sox before the metric, :575)."""
    if fs == PEAQ_FS:
        return x
    from scipy.signal import resample_poly
    from math import gcd
    g = gcd(PEAQ_FS, fs)
    return resample_poly(x, PEAQ_FS // g, fs // g)


def main() -> int:
    from audio_codec_tpu.utils import wavio
    ref, fs1 = wavio.read_wav(sys.argv[1])
    tst, fs2 = wavio.read_wav(sys.argv[2])
    r = resample_48k(ref[:, 0] / 32768.0, fs1)
    t = resample_48k(tst[:, 0] / 32768.0, fs2)
    v = mld(r, t)
    print(f"maximum loudness difference: {v:.4f}")
    return 0


if __name__ == "__main__":
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    sys.exit(main())
