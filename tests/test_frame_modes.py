"""5 ms and 2.5 ms frame-duration modes: interop + decoder parity."""

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
from tests import oracle

NF = 100


@pytest.mark.parametrize("frame_dms,bitrate", [(50, 32000), (25, 64000)])
def test_frame_mode_roundtrip(tmp_path, frame_dms, bitrate):
    oracle.ensure_oracle()
    cfg = Config(fs_in=16000, bitrate=bitrate, frame_dms=frame_dms)
    pcm, fs = oracle.read_wav_mono(oracle.TESTVEC / "thetest16.wav")
    fl = cfg.frame_length
    x = pcm[: NF * fl, 0].reshape(NF, fl).astype(np.float32)

    enc = _enc_step(cfg)
    st = S.enc_state_init(cfg, 1)
    frames = []
    for f in range(NF):
        st, out, _ = enc(st, jnp.asarray(x[f][None]))
        frames.append(np.asarray(out)[0].tobytes())

    path = tmp_path / "ours.bin"
    bio.write_all(path, bio.StreamHeader(samplerate=16000, bitrate=bitrate,
                                         channels=1, frame_ms=frame_dms / 10,
                                         epmode=0, signal_len=NF * fl), frames)
    out_wav = tmp_path / "etsi.wav"
    r = subprocess.run([str(oracle.ORACLE_FL), "-q", "-D", str(path),
                        str(out_wav), "0"], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    ref, _ = oracle.read_wav_mono(out_wav)
    src = x.ravel().astype(np.float64)
    n = min(len(ref), len(src))
    err = np.sqrt(np.mean((ref[:n, 0].astype(np.float64) - src[:n]) ** 2))
    sig = np.sqrt(np.mean(src[:n] ** 2))
    snr = 20 * np.log10(sig / max(err, 1e-9))
    assert snr > 15.0, snr

    # our decoder vs ETSI decoder on our bitstream
    dst = S.dec_state_init(cfg, 1)
    dstep = _dec_step(cfg)
    nobfi = jnp.zeros((1,), jnp.int32)
    outs = []
    for fr in frames:
        dst, y, _ = dstep(dst, jnp.asarray(np.frombuffer(fr, np.uint8)[None]), nobfi)
        outs.append(np.asarray(dec_m.round_pcm(y))[0])
    ours = np.concatenate(outs)
    delay = cfg.frame_length - 2 * cfg.la_zeroes  # lc3_enc_get_delay
    n = min(len(ours) - delay, len(ref))
    diff = ours[delay: delay + n].astype(np.float64) - ref[:n, 0].astype(np.float64)
    rms = np.sqrt(np.mean(diff ** 2))
    assert rms < 1.0, rms
