"""End-to-end conformance-style round trip on the first milestone config
(mono 16 kHz, 10 ms, 32 kbps — BASELINE.json configs[0]).

1. Our encoder's bitstream must decode cleanly with the ETSI reference
   decoder (interoperability).
2. RMS(our encoder → ETSI decoder  vs  ETSI encoder → ETSI decoder) must be
   comparable to the codec noise floor (conformance RMS criterion model,
   lc3_conformance.py:123-131).
3. Our decoder on our bitstream must track the ETSI decoder on the same
   bitstream to the 14-bit RMS criterion.
"""

import pytest

pytestmark = pytest.mark.slow  # full-codec CPU compile / oracle runs

import subprocess
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audio_codec_tpu.config import Config
from audio_codec_tpu.models import decoder as dec_m
from audio_codec_tpu.models import encoder as enc_m
from audio_codec_tpu.models import state as S
from audio_codec_tpu.utils import bitstream_io as bio
from tests import oracle

CFG = Config(fs_in=16000, bitrate=32000)
NF = 400


@pytest.fixture(scope="module")
def our_bitstream(tmp_path_factory):
    oracle.ensure_oracle()
    pcm, fs = oracle.read_wav_mono(oracle.TESTVEC / "thetest16.wav")
    assert fs == 16000
    fl = CFG.frame_length
    x = pcm[: NF * fl, 0].reshape(NF, fl).astype(np.float32)

    st = S.enc_state_init(CFG, 1)
    step = jax.jit(lambda st, xf: enc_m.encode_frame(CFG, st, xf))
    frames = []
    for f in range(NF):
        st, out, _ = step(st, jnp.asarray(x[f][None]))
        frames.append(np.asarray(out)[0].tobytes())
    d = tmp_path_factory.mktemp("rt")
    path = d / "ours.bin"
    h = bio.StreamHeader(samplerate=16000, bitrate=32000, channels=1,
                         frame_ms=10.0, epmode=0, signal_len=NF * fl)
    bio.write_all(path, h, frames)
    return path, x


def test_etsi_decodes_our_bitstream(our_bitstream):
    path, x = our_bitstream
    out = path.parent / "ours_dec.wav"
    r = subprocess.run([str(oracle.ORACLE_FL), "-q", "-D", str(path), str(out), "0"],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    pcm, fs = oracle.read_wav_mono(out)

    # reference chain on the same material
    _, ref_bs = oracle.enc_dumps("thetest16", 32000)
    _, ref_wav = oracle.dec_dumps(ref_bs, "t16")
    ref, _ = oracle.read_wav_mono(ref_wav)
    n = min(len(pcm), len(ref), len(x.ravel()))
    a = pcm[:n, 0].astype(np.float64)
    b = ref[:n, 0].astype(np.float64)
    rms_ref_vs_ours = np.sqrt(np.mean((a - b) ** 2))
    # both are lossy decodes of the same input; they should agree within a
    # few quantization steps (our encoder makes slightly different decisions)
    src = x.ravel()[:n].astype(np.float64)
    err_ours = np.sqrt(np.mean((a - src) ** 2))
    err_ref = np.sqrt(np.mean((b - src) ** 2))
    # coding quality must be on par: within 10% RMS of the reference encoder
    assert err_ours < err_ref * 1.10, (err_ours, err_ref, rms_ref_vs_ours)


def test_our_decoder_matches_etsi_on_our_bitstream(our_bitstream):
    path, x = our_bitstream
    out = path.parent / "ours_dec2.wav"
    subprocess.run([str(oracle.ORACLE_FL), "-q", "-D", str(path), str(out), "0"],
                   check=True, capture_output=True)
    ref, _ = oracle.read_wav_mono(out)

    _, frames = bio.read_all(path)
    st = S.dec_state_init(CFG, 1)
    from audio_codec_tpu.engine import _dec_step
    step0 = _dec_step(CFG)
    nobfi = np.zeros((1,), np.int32)
    outs = []
    for fr in frames:
        st, y, _ = step0(st, jnp.asarray(np.frombuffer(fr, np.uint8)[None]), jnp.asarray(nobfi))
        outs.append(np.asarray(dec_m.round_pcm(y))[0])
    ours = np.concatenate(outs)
    delay = int(2.5 * CFG.fs / 1000)
    ours_t = ours[delay:]
    n = min(len(ours_t), len(ref))
    diff = ours_t[:n].astype(np.float64) - ref[:n, 0].astype(np.float64)
    rms = np.sqrt(np.mean(diff ** 2))
    # conformance RMS criterion: difference below 14-bit accuracy
    # (threshold 2^-14 full scale => RMS <= 2 LSB16 on 16-bit PCM)
    assert rms < 2.0, rms
