"""Phase ECU (advanced PLC method 2, ops/plc_phecu.py).

The reference algorithm is plc_phecu_fec_hq_fx.c (hq_phase_ecu_fx:1718):
FFT phase-evolution concealment for tonal, high-centroid content at 10 ms.
These tests check (a) pure tones continue phase-coherently through a burst
(the algorithm's defining property), (b) the classifier routes tonal
content to method 2 end-to-end (the 2->4 remap is gone) and concealment
quality beats phase-scrambled substitution, (c) the -6 dB/frame burst ramp
(POW_ATT p3x1_6) fades long bursts to silence."""
from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # full-codec CPU compile

import jax.numpy as jnp
import numpy as np

from audio_codec_tpu.config import Config
from audio_codec_tpu.engine import StreamDecoder, StreamEncoder
from audio_codec_tpu.ops import plc_phecu as P

FS = 16000
FL = 160
CFG = Config(fs_in=16000, bitrate=32000, plc_mode=1)


def _unit_state(B):
    ns, nb = P._search_bins(CFG), P.nbins(CFG)
    return dict(f0=jnp.full((B, ns), -1.0),
                X=jnp.zeros((B, nb), jnp.complex64),
                npl=jnp.zeros((B,), jnp.int32), m1=jnp.ones((B, 9)),
                xa=jnp.zeros((B, 9)), bm=jnp.full((B,), 0.5),
                tr=jnp.zeros((B,), jnp.int32))


def test_tone_continuation_phase_coherent():
    """A sinusoid must continue with the right phase: >25 dB SNR vs the
    true continuation on the first loss, >20 dB on the second."""
    hist = 445  # pcm_hist_len(CFG)
    t = (np.arange(hist) - hist) / FS
    freqs, amps = [997.0, 1870.0], [8000.0, 6000.0]
    x_old = np.stack([a * np.sin(2 * np.pi * f * t)
                      for f, a in zip(freqs, amps)]).astype(np.float32)
    st = _unit_state(2)
    ones = jnp.ones((2,), bool)
    out = P.apply(CFG, st["f0"], st["X"], st["npl"], st["m1"], st["xa"],
                  st["bm"], st["tr"], jnp.asarray(x_old),
                  jnp.ones((2,), jnp.int32), ones, ones,
                  jnp.full((2,), 0.9))
    pcm = np.asarray(out["pcm"])
    for b, (f, a) in enumerate(zip(freqs, amps)):
        ref = a * np.sin(2 * np.pi * f * np.arange(FL) / FS)
        snr = 10 * np.log10(np.sum(ref ** 2)
                            / (np.sum((pcm[b] - ref) ** 2) + 1e-9))
        assert snr > 25.0, (b, f, snr)

    out2 = P.apply(CFG, out["phecu_f0est"], out["phecu_X_sav"],
                   out["phecu_num_plocs"], out["phecu_mag_chg_1st"],
                   out["phecu_Xavg"], out["phecu_beta_mute"],
                   out["phecu_is_trans"],
                   jnp.asarray(np.concatenate([x_old[:, FL:], pcm], 1)),
                   jnp.full((2,), 2, jnp.int32), jnp.zeros((2,), bool),
                   ones, jnp.full((2,), 0.9))
    pcm2 = np.asarray(out2["pcm"])
    for b, (f, a) in enumerate(zip(freqs, amps)):
        ref = a * np.sin(2 * np.pi * f * (np.arange(FL) + FL) / FS)
        snr = 10 * np.log10(np.sum(ref ** 2)
                            / (np.sum((pcm2[b] - ref) ** 2) + 1e-9))
        assert snr > 20.0, (b, f, snr)


def _tonal(n_frames):
    t = np.arange(n_frames * FL) / FS
    return (5000 * np.sin(2 * np.pi * 1870 * t)
            + 4000 * np.sin(2 * np.pi * 2970 * t)
            + 2000 * np.sin(2 * np.pi * 451 * t)).astype(np.float32)


def _run(cfg, frames, lost):
    dec = StreamDecoder(cfg, 1)
    y, meths = [], []
    for i, fr in enumerate(frames):
        y.append(dec.decode(b"" if i in lost else fr, bfi=(i in lost))[0])
        if i in lost:
            meths.append(int(np.asarray(dec.state.plc_meth)[0]))
    return np.concatenate(y).astype(np.float64), meths


def _seg_snr(x, y, seg, d=40):
    n = len(x) - d
    e = (x[:n] - y[d:d + n])[seg]
    return 10 * np.log10(np.sum(x[seg][:len(e)] ** 2) / (np.sum(e ** 2) + 1e-9))


def test_phecu_selected_and_beats_scrambling():
    x = _tonal(30)
    enc = StreamEncoder(Config(fs_in=16000, bitrate=32000), 1)
    frames = [enc.encode(x[f * FL:(f + 1) * FL][None])[0] for f in range(30)]
    lost = {10, 11, 20}
    y1, meths = _run(CFG, frames, lost)
    assert meths == [2, 2, 2], meths  # classifier routes to Phase ECU
    y0, _ = _run(Config(fs_in=16000, bitrate=32000), frames, lost)  # NS-0
    seg = slice(10 * FL, 12 * FL)
    s1, s0 = _seg_snr(x, y1, seg), _seg_snr(x, y0, seg)
    assert s1 > 10.0, s1          # phase-coherent concealment
    assert s1 > s0 + 5.0, (s0, s1)  # clearly beats phase-scrambled NS-0


def test_phecu_long_burst_fades_out():
    """POW_ATT p3x1_6 ramp: -6 dB per frame past the threshold -> silence
    well before 20 lost frames (trans_burst_ana_fx burst path)."""
    x = _tonal(30)
    enc = StreamEncoder(Config(fs_in=16000, bitrate=32000), 1)
    frames = [enc.encode(x[f * FL:(f + 1) * FL][None])[0] for f in range(30)]
    y, meths = _run(CFG, frames, set(range(10, 30)))
    assert meths[0] == 2
    early = np.sqrt(np.mean(y[10 * FL:12 * FL] ** 2))
    late = np.sqrt(np.mean(y[25 * FL:30 * FL] ** 2))
    assert early > 500.0, early
    assert late < early * 0.02, (early, late)
