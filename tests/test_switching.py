"""Per-frame bitrate switching without state reset (codec_exe.c:287-330
streaming contract) and stereo channel handling."""

import pytest

pytestmark = pytest.mark.slow  # full-codec CPU compile / oracle runs

import subprocess

import numpy as np
import jax.numpy as jnp
import pytest

from audio_codec_tpu.config import Config
from audio_codec_tpu.engine import StreamDecoder, _enc_step
from audio_codec_tpu.models import state as S
from audio_codec_tpu.utils import bitstream_io as bio
from tests import oracle

NF = 120


def test_bitrate_switching(tmp_path):
    """Encode with alternating bitrates; ETSI decoder and ours must both cope."""
    oracle.ensure_oracle()
    fs = 16000
    rates = [32000, 48000]
    cfgs = {r: Config(fs_in=fs, bitrate=r) for r in rates}
    pcm, _ = oracle.read_wav_mono(oracle.TESTVEC / "thetest16.wav")
    fl = cfgs[rates[0]].frame_length
    x = pcm[: NF * fl, 0].reshape(NF, fl).astype(np.float32)

    # one shared state pytree across bitrate switches (contract: no reset)
    st = S.enc_state_init(cfgs[rates[0]], 1)
    frames = []
    for f in range(NF):
        r = rates[(f // 20) % 2]
        st, out, _ = _enc_step(cfgs[r])(st, jnp.asarray(x[f][None]))
        frames.append(np.asarray(out)[0].tobytes())

    path = tmp_path / "sw.bin"
    bio.write_all(path, bio.StreamHeader(samplerate=fs, bitrate=rates[0],
                                         channels=1, frame_ms=10.0, epmode=0,
                                         signal_len=NF * fl), frames)
    out_wav = tmp_path / "sw.wav"
    r = subprocess.run([str(oracle.ORACLE_FL), "-q", "-D", str(path),
                        str(out_wav), "0"], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    ref, _ = oracle.read_wav_mono(out_wav)
    src = x.ravel().astype(np.float64)
    n = min(len(ref), len(src))
    err = np.sqrt(np.mean((ref[:n, 0].astype(np.float64) - src[:n]) ** 2))
    snr = 20 * np.log10(np.sqrt(np.mean(src[:n] ** 2)) / max(err, 1e-9))
    assert snr > 15.0, snr

    # our decoder with per-frame size switching
    dec = StreamDecoder(cfgs[rates[0]], 1)
    outs = [dec.decode(fr)[0] for fr in frames]
    ours = np.concatenate(outs)
    cfg = cfgs[rates[0]]
    delay = cfg.frame_length - 2 * cfg.la_zeroes
    n = min(len(ours) - delay, len(ref))
    diff = ours[delay: delay + n].astype(np.float64) - ref[:n, 0].astype(np.float64)
    rms = np.sqrt(np.mean(diff ** 2))
    assert rms < 1.0, rms
