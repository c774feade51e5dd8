"""High-resolution mode (48/96 kHz HR): interop + decoder parity."""

import pytest

pytestmark = pytest.mark.slow  # full-codec CPU compile / oracle runs

import subprocess

import numpy as np
import jax.numpy as jnp
import pytest

from audio_codec_tpu.config import Config
from audio_codec_tpu.engine import _dec_step, _enc_step
from audio_codec_tpu.models import decoder as dec_m
from audio_codec_tpu.models import state as S
from audio_codec_tpu.utils import bitstream_io as bio
from audio_codec_tpu.utils import wavio
from tests import oracle

NF = 50


def _material(fs: int, n: int) -> np.ndarray:
    """Synthetic multitone + noise test signal (generate_test_vectors.py style)."""
    rng = np.random.default_rng(7)
    t = np.arange(n) / fs
    x = sum(3000 * np.sin(2 * np.pi * f0 * t + p)
            for f0, p in [(440, 0), (1320, 1), (3700, 2), (9500, 0.5)])
    x = x + rng.standard_normal(n) * 120.0
    return np.clip(x, -30000, 30000).astype(np.float32)


@pytest.mark.parametrize("fs,bitrate", [(48000, 160000), (96000, 200000)])
def test_hrmode_roundtrip(tmp_path, fs, bitrate):
    oracle.ensure_oracle()
    cfg = Config(fs_in=fs, bitrate=bitrate, hrmode=True)
    assert cfg.hrmode
    fl = cfg.frame_length
    pcm = _material(fs, NF * fl)
    x = pcm.reshape(NF, fl)

    enc = _enc_step(cfg)
    st = S.enc_state_init(cfg, 1)
    frames = []
    for f in range(NF):
        st, out, _ = enc(st, jnp.asarray(x[f][None]))
        frames.append(np.asarray(out)[0].tobytes())

    path = tmp_path / "ours.bin"
    bio.write_all(path, bio.StreamHeader(samplerate=fs, bitrate=bitrate,
                                         channels=1, frame_ms=10.0, epmode=0,
                                         signal_len=NF * fl, hrmode=1), frames)
    out_wav = tmp_path / "etsi.wav"
    r = subprocess.run([str(oracle.ORACLE_FL), "-q", "-hrmode", "-D", str(path),
                        str(out_wav), "0"], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    ref, _ = oracle.read_wav_mono(out_wav)

    # reference chain on the same material for quality parity
    src_wav = tmp_path / "src.wav"
    wavio.write_wav(src_wav, pcm.astype(np.int16), fs)
    rbin, rwav = tmp_path / "ref.bin", tmp_path / "ref.wav"
    subprocess.run([str(oracle.ORACLE_FL), "-q", "-hrmode", "-E", str(src_wav),
                    str(rbin), str(bitrate)], check=True, capture_output=True)
    subprocess.run([str(oracle.ORACLE_FL), "-q", "-hrmode", "-D", str(rbin),
                    str(rwav), "0"], check=True, capture_output=True)
    refref, _ = oracle.read_wav_mono(rwav)

    def snr(dec):
        src = pcm.astype(np.float64)
        n = min(len(dec), len(src))
        err = np.sqrt(np.mean((dec[:n, 0].astype(np.float64) - src[:n]) ** 2))
        return 20 * np.log10(np.sqrt(np.mean(src[:n] ** 2)) / max(err, 1e-9))

    assert snr(ref) >= snr(refref) - 0.5, (snr(ref), snr(refref))

    dst = S.dec_state_init(cfg, 1)
    dstep = _dec_step(cfg)
    nobfi = jnp.zeros((1,), jnp.int32)
    outs = []
    for fr in frames:
        dst, y, _ = dstep(dst, jnp.asarray(np.frombuffer(fr, np.uint8)[None]), nobfi)
        outs.append(np.asarray(dec_m.round_pcm(y))[0])
    ours = np.concatenate(outs)
    delay = int(2.5 * cfg.fs / 1000)
    n = min(len(ours) - delay, len(ref))
    diff = ours[delay: delay + n].astype(np.float64) - ref[:n, 0].astype(np.float64)
    rms = np.sqrt(np.mean(diff ** 2))
    assert rms < 1.0, rms
