"""Application-layer redundancy (tools/redundancy_sim.py, port of
tools/lc3plus_redundancy_simulator.pl): lost primary packets are replaced
by a delayed lower-rate copy flagged as G.192 redundancy frames (bfi=3),
which the decoder treats as fully-suspect partial-concealment input
(dec_lc3.c:105-112)."""
from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # full-codec CPU compile

import numpy as np

from audio_codec_tpu.config import Config
from audio_codec_tpu.engine import StreamDecoder, StreamEncoder
from tools.redundancy_sim import simulate

FS, FL, N = 16000, 160, 40


def _tone():
    t = np.arange(N * FL) / FS
    return (6000 * np.sin(2 * np.pi * 440 * t)
            + 2000 * np.sin(2 * np.pi * 1210 * t)).astype(np.float32)


def _encode(bitrate, x):
    enc = StreamEncoder(Config(fs_in=FS, bitrate=bitrate), 1)
    return [enc.encode(x[f * FL:(f + 1) * FL][None])[0] for f in range(N)]


def _decode(stream):
    dec = StreamDecoder(Config(fs_in=FS, bitrate=64000), 1)
    return np.concatenate(
        [dec.decode(d, bfi=b)[0] for d, b in stream]).astype(np.float64)


def test_redundancy_recovers_lost_frames():
    x = _tone()
    main = [(f, 0) for f in _encode(64000, x)]
    help_bs = [(f, 0) for f in _encode(32000, x)]
    rng = np.random.default_rng(3)
    epf = (rng.random(N) < 0.25)
    epf[:4] = False

    merged, stat = simulate(main, help_bs, epf, offset=1)
    assert stat["help"] > 0 and stat["main"] > 0
    y_red = _decode(merged)
    y_loss = _decode([(b"", 1) if epf[i] else main[i] for i in range(N)])
    assert np.isfinite(y_red).all()

    d = 40
    n = len(x) - d

    def snr(y):
        e = x[:n] - y[d:d + n]
        return 10 * np.log10(np.sum(x[:n] ** 2) / (np.sum(e ** 2) + 1e-9))

    s_red, s_loss = snr(y_red), snr(y_loss)
    # redundancy payloads must clearly beat pure concealment
    assert s_red > s_loss + 3.0, (s_loss, s_red)
