"""Advanced PLC (classifier + TD-PLC + damped/scrambled NS), plc_mode=1.

The advanced chain exists only in the fixed-point reference
(plc_classify_fx.c, plc_tdc_main_fx.c, plc_damping_scrambling_fx.c); the
float build ships NS-0 only. These tests check (a) the TDC path engages on
pitched stable content and beats NS-0 by a wide SNR margin through losses,
(b) concealment energy stays continuous and fades out over long bursts,
(c) concealment quality is in the same class as the fixed-point oracle's
advanced PLC on real audio with the same loss pattern.
"""

import pytest

pytestmark = pytest.mark.slow  # full-codec CPU compile / oracle runs

import subprocess

import numpy as np
import pytest

from audio_codec_tpu.config import Config
from audio_codec_tpu.engine import StreamDecoder, StreamEncoder
from tests import oracle

FL = 160


def _pitched(n_frames: int, f0=210.0, fs=16000):
    rng = np.random.default_rng(7)
    t = np.arange(n_frames * FL) / fs
    return (8000 * np.sin(2 * np.pi * f0 * t)
            * (1 + 0.2 * np.sin(2 * np.pi * 2 * t))
            + rng.standard_normal(len(t)) * 50).astype(np.float32)


def _run(cfg: Config, frames, lost):
    dec = StreamDecoder(cfg, 1)
    y = np.concatenate(
        [dec.decode(b"" if i in lost else frames[i], bfi=(i in lost))[0]
         for i in range(len(frames))]).astype(np.float64)
    assert np.isfinite(y).all()
    return y


def _snr(x, y, d=40):
    n = min(len(x), len(y) - d)
    return 10 * np.log10(np.sum(x[:n] ** 2)
                         / (np.sum((x[:n] - y[d:d + n]) ** 2) + 1e-9))


def test_tdc_beats_ns0_on_pitched_losses():
    cfg0 = Config(fs_in=16000, bitrate=32000)
    cfg1 = Config(fs_in=16000, bitrate=32000, plc_mode=1)
    x = _pitched(30)
    enc = StreamEncoder(cfg0, 1)
    frames = [enc.encode(x[f * FL:(f + 1) * FL][None])[0] for f in range(30)]
    lost = {10, 11, 20}
    y0 = _run(cfg0, frames, lost)
    y1 = _run(cfg1, frames, lost)
    s0, s1 = _snr(x, y0), _snr(x, y1)
    # phase-continuous TD-PLC must clearly beat phase-scrambled repetition
    assert s1 > s0 + 5.0, (s0, s1)
    assert s1 > 12.0, s1


def test_adv_plc_long_burst_fades_out():
    """PLC_FADEOUT_IN_MS = 60: after 6 consecutive 10 ms losses the
    concealment must be silent (plc_tdc_main_fx.c:127-139)."""
    cfg = Config(fs_in=16000, bitrate=32000, plc_mode=1)
    x = _pitched(30)
    enc = StreamEncoder(Config(fs_in=16000, bitrate=32000), 1)
    frames = [enc.encode(x[f * FL:(f + 1) * FL][None])[0] for f in range(30)]
    lost = set(range(10, 30))  # 20-frame burst
    y = _run(cfg, frames, lost)
    early = np.sqrt(np.mean(y[10 * FL:12 * FL] ** 2))
    late = np.sqrt(np.mean(y[20 * FL:30 * FL] ** 2))
    assert early > 500.0, early       # concealment carries energy at first
    assert late < early * 0.02, (early, late)  # and fades to silence


@pytest.mark.parametrize("fs,bitrate", [(8000, 32000), (32000, 64000),
                                        (48000, 96000)])
def test_adv_plc_rates_smoke(fs, bitrate):
    """Classifier + TDC + NS paths compile and conceal sanely across
    sampling rates (different linear band / lag-window tables)."""
    cfg0 = Config(fs_in=fs, bitrate=bitrate)
    cfg1 = Config(fs_in=fs, bitrate=bitrate, plc_mode=1)
    fl = cfg0.frame_length
    rng = np.random.default_rng(fs)
    t = np.arange(16 * fl) / fs
    x = (6000 * np.sin(2 * np.pi * 180 * t)
         + rng.standard_normal(len(t)) * 60).astype(np.float32)
    enc = StreamEncoder(cfg0, 1)
    frames = [enc.encode(x[f * fl:(f + 1) * fl][None])[0] for f in range(16)]
    dec = StreamDecoder(cfg1, 1)
    lost = {8, 9}
    y = np.concatenate(
        [dec.decode(b"" if i in lost else frames[i], bfi=(i in lost))[0]
         for i in range(16)]).astype(np.float64)
    assert np.isfinite(y).all()
    rms_conc = np.sqrt(np.mean(y[8 * fl:10 * fl] ** 2))
    rms_sig = np.sqrt(np.mean(y[6 * fl:8 * fl] ** 2))
    assert 0.15 * rms_sig < rms_conc < 3.0 * rms_sig, (rms_sig, rms_conc)


def test_adv_plc_vs_fixed_oracle_class(tmp_path):
    """Same loss pattern on real audio: our advanced PLC must land in the
    same quality class as the fixed-point oracle's advanced PLC (SNR vs the
    oracle's loss-free decode within a few dB)."""
    oracle.ensure_oracle()
    _, bs = oracle.enc_dumps("thetest16", 32000)
    raw = bs.read_bytes()
    payloads, off = [], 20
    while off + 2 <= len(raw) and len(payloads) < 150:
        ln = int.from_bytes(raw[off: off + 2], "little")
        payloads.append(raw[off + 2: off + 2 + ln])
        off += 2 + ln
    n = len(payloads)
    lost = np.zeros(n, bool)
    lost[30::17] = True

    d = tmp_path
    pat = d / "fer.dat"
    np.where(lost, 1, 0).astype("<i2").tofile(pat)
    trunc = d / "in.bin"
    with open(trunc, "wb") as f:
        f.write(raw[:20])
        for p in payloads:
            f.write(len(p).to_bytes(2, "little"))
            f.write(p)
    # fixed-point oracle decode: clean and with losses (advanced PLC)
    ref_clean = d / "clean.wav"
    ref_plc = d / "plc.wav"
    subprocess.run([str(oracle.ORACLE_FX), "-q", "-D", str(trunc),
                    str(ref_clean), "16"], check=True, capture_output=True)
    subprocess.run([str(oracle.ORACLE_FX), "-q", "-epf", str(pat), "-D",
                    str(trunc), str(ref_plc), "16"],
                   check=True, capture_output=True)
    clean = np.ravel(oracle.read_wav_mono(ref_clean)[0]).astype(np.float64)
    plc_ref = np.ravel(oracle.read_wav_mono(ref_plc)[0]).astype(np.float64)

    cfg = Config(fs_in=16000, bitrate=32000, plc_mode=1)
    dec = StreamDecoder(cfg, 1)
    y = np.concatenate(
        [dec.decode(b"" if lost[i] else payloads[i], bfi=bool(lost[i]))[0]
         for i in range(n)]).astype(np.float64)
    m = min(len(clean), len(y) - 40) - 10
    snr_ref = 10 * np.log10(np.sum(clean[:m] ** 2)
                            / (np.sum((clean[:m] - plc_ref[:m]) ** 2) + 1e-9))
    snr_ours = 10 * np.log10(np.sum(clean[:m] ** 2)
                             / (np.sum((clean[:m] - y[40:40 + m]) ** 2) + 1e-9))
    # same quality class: within 3 dB of the fixed-point advanced PLC
    assert snr_ours > snr_ref - 3.0, (snr_ours, snr_ref)
