"""Packet-loss concealment: our decoder vs ETSI decoder under frame erasures."""

import pytest

pytestmark = pytest.mark.slow  # full-codec CPU compile / oracle runs

import subprocess

import numpy as np
import jax.numpy as jnp
import pytest

from audio_codec_tpu.config import Config
from audio_codec_tpu.engine import _dec_step
from audio_codec_tpu.models import decoder as dec_m
from audio_codec_tpu.models import state as S
from tests import oracle

CFG = Config(fs_in=16000, bitrate=32000)
NF = 200
LOSS_PERIOD = 10  # lose every 10th frame


@pytest.fixture(scope="module")
def rig(tmp_path_factory):
    oracle.ensure_oracle()
    _, bs = oracle.enc_dumps("thetest16", 32000)
    raw = bs.read_bytes()
    payloads = []
    off = 20
    while off + 2 <= len(raw) and len(payloads) < NF:
        ln = int.from_bytes(raw[off: off + 2], "little")
        payloads.append(raw[off + 2: off + 2 + ln])
        off += 2 + ln
    lost = np.zeros(NF, bool)
    lost[LOSS_PERIOD - 1::LOSS_PERIOD] = True

    # oracle decode with the same loss pattern (binary error pattern file)
    d = tmp_path_factory.mktemp("plc")
    pat = d / "fer.dat"
    np.where(lost, 1, 0).astype("<i2").tofile(pat)
    trunc = d / "in.bin"
    with open(trunc, "wb") as f:
        f.write(raw[:20])
        for p in payloads:
            f.write(len(p).to_bytes(2, "little"))
            f.write(p)
    out_wav = d / "plc.wav"
    r = subprocess.run([str(oracle.ORACLE_FL), "-q", "-epf", str(pat), "-D",
                        str(trunc), str(out_wav), "0"],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    ref, _ = oracle.read_wav_mono(out_wav)
    return payloads, lost, ref[:, 0]


def test_plc_decode(rig):
    payloads, lost, ref = rig
    st = S.dec_state_init(CFG, 1)
    step = _dec_step(CFG)
    outs = []
    for i, fr in enumerate(payloads):
        bfi = jnp.asarray([1 if lost[i] else 0], jnp.int32)
        st, y, _ = step(st, jnp.asarray(np.frombuffer(fr, np.uint8)[None]), bfi)
        outs.append(np.asarray(dec_m.round_pcm(y))[0])
    ours = np.concatenate(outs)
    delay = int(2.5 * CFG.fs / 1000)
    n = min(len(ours) - delay, len(ref))
    diff = ours[delay: delay + n].astype(np.float64) - ref[:n].astype(np.float64)
    rms = np.sqrt(np.mean(diff ** 2))
    sig = np.sqrt(np.mean(ref[:n].astype(np.float64) ** 2))
    # PLC output is metric-gated, not bit-exact (SURVEY §4); require the
    # concealment to track the reference closely in RMS terms
    snr = 20 * np.log10(sig / max(rms, 1e-9))
    assert snr > 40.0, (rms, snr)
