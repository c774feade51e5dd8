"""Decoder robustness fuzz (fast tier).

The reference ships sanitizer/AFL build modes for exactly this failure
class (floating_point/makefile:50-75, fixed_point/makefile:2-8): garbage
bitstreams must route through BER detection -> concealment and never
crash or emit non-finite samples.  Here >=1k adversarial frames (random
bytes, truncated, all-FF, all-00, bit-flipped valid frames) run through
StreamDecoder with and without the channel coder.
"""
import numpy as np
import pytest

from audio_codec_tpu.config import Config
from audio_codec_tpu.engine import StreamDecoder, StreamEncoder


def _check(dec, payload, n):
    pcm = dec.decode(payload)
    assert np.isfinite(np.asarray(pcm, np.float64)).all(), "non-finite PCM"
    assert np.abs(np.asarray(pcm)).max() <= 32768.0


def test_fuzz_decoder_garbage():
    cfg = Config(fs_in=16000, bitrate=32000)
    rng = np.random.default_rng(7)
    dec = StreamDecoder(cfg, n_streams=1)
    nb = cfg.targetBytes
    for i in range(400):
        frame = rng.integers(0, 256, nb, dtype=np.uint8).tobytes()
        _check(dec, frame, 1)
    # pathological constants
    for frame in (b"\xff" * nb, b"\x00" * nb, b"\x80" + b"\x00" * (nb - 1)):
        for _ in range(5):
            _check(dec, frame, 1)


def test_fuzz_decoder_bitflips():
    """Valid stream with random single-bit corruptions per frame."""
    cfg = Config(fs_in=16000, bitrate=32000)
    rng = np.random.default_rng(11)
    enc = StreamEncoder(cfg, n_streams=1)
    dec = StreamDecoder(cfg, n_streams=1)
    t = np.arange(cfg.frame_length)
    for i in range(300):
        pcm = (4000 * np.sin(0.05 * (i + 1) * t)).astype(np.float32)[None]
        frame = bytearray(enc.encode(pcm)[0])
        for _ in range(rng.integers(1, 6)):
            pos = rng.integers(0, len(frame))
            frame[pos] ^= 1 << rng.integers(0, 8)
        _check(dec, bytes(frame), 1)


def test_fuzz_decoder_ep_garbage():
    """Random slots through the channel decoder (mode detect + RS)."""
    cfg = Config(fs_in=16000, bitrate=32000, epmode=4)
    rng = np.random.default_rng(13)
    dec = StreamDecoder(cfg, n_streams=1)
    slot = cfg.slotBytes
    for i in range(300):
        frame = rng.integers(0, 256, slot, dtype=np.uint8).tobytes()
        _check(dec, frame, 1)


def test_fuzz_fixed_decoder_erasures():
    """Bit-exact fixed decoder under random erasure bursts must stay in
    range (the integer path asserts saturation internally)."""
    from audio_codec_tpu.fixed_decoder import FixedDecoder
    cfg = Config(fs_in=8000, bitrate=32000)
    rng = np.random.default_rng(17)
    n = 50
    frames = rng.integers(0, 256, (n, cfg.targetBytes), dtype=np.uint8)
    bfi = (rng.random(n) < 0.4).astype(np.int16)
    bfi[:2] = [0, 1]
    dec = FixedDecoder(cfg)
    pcm = dec.decode_plc(frames, bfi)
    # round_fx saturates to [-32768, 32767] (basop round_fx), so the
    # legal abs max is 32768 on a fully negative-saturated sample
    assert pcm.dtype == np.int16
    assert np.abs(pcm.astype(np.int64)).max() <= 32768
