"""Streaming codec engine: jitted frame steps over a stream batch.

The API mirrors the reference's contract (lc3.h:193-340): create a
state-carrying encoder/decoder, feed one frame per call, switch bitrate
between frames without state reset (update_enc_bitrate semantics — the
Config is static per jit cache entry, channel state carries across).

For pod-scale operation see parallel/ (shard_map over a stream-sharded mesh);
this module is the single-host convenience layer the CLI uses.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .config import Config
from .models import decoder as dec_m
from .models import encoder as enc_m
from .models import state as S


@functools.cache
def _enc_step(cfg: Config):
    @jax.jit
    def step(st, pcm):
        return enc_m.encode_frame(cfg, st, pcm)
    return step


@functools.cache
def _dec_step(cfg: Config):
    @jax.jit
    def step(st, payload, bfi):
        return dec_m.decode_frame(cfg, st, payload, bfi)
    return step


class StreamEncoder:
    """Persistent-state encoder over n_streams independent streams."""

    def __init__(self, cfg: Config, n_streams: int = 1):
        self.cfg = cfg
        self.n = n_streams
        self.state = S.enc_state_init(cfg, n_streams)

    def set_bitrate(self, bitrate: int) -> None:
        if bitrate != self.cfg.bitrate:
            self.cfg = self.cfg.with_bitrate(bitrate)

    def encode(self, pcm: np.ndarray) -> list[bytes]:
        """pcm: [n_streams, frame_length] int16-range. Returns payload bytes."""
        st, out, _ = _enc_step(self.cfg)(self.state, jnp.asarray(pcm, jnp.float32))
        self.state = st
        out = np.asarray(out)
        return [out[i].tobytes() for i in range(self.n)]


class StreamDecoder:
    """Persistent-state decoder over n_streams independent streams."""

    def __init__(self, cfg: Config, n_streams: int = 1):
        self.cfg = cfg
        self.n = n_streams
        self.state = S.dec_state_init(cfg, n_streams)
        self._last_size = cfg.targetBytes

    def decode(self, payload: bytes, bfi: bool = False) -> np.ndarray:
        """payload: concatenated per-channel frame bytes (may be empty on loss).
        Returns [n_streams, frame_length] int16 PCM."""
        nb = self.cfg.targetBytes
        if not bfi and len(payload) and len(payload) != nb * self.n:
            # frame-size switch without state reset (update_dec_bitrate,
            # setup_dec_lc3.c:203): derive the bitrate giving this byte count
            per = len(payload) // self.n
            self.cfg = self.cfg.with_bitrate(per * 8 * 10000 // self.cfg.frame_dms
                                             * self.n)
            nb = self.cfg.targetBytes
            assert nb == per, (nb, per)
        if bfi or not len(payload):
            buf = np.zeros((self.n, nb), np.uint8)
            bflag = np.ones((self.n,), np.int32)
        else:
            buf = np.frombuffer(payload, np.uint8).reshape(self.n, nb)
            bflag = np.zeros((self.n,), np.int32)
        st, y, _ = _dec_step(self.cfg)(self.state, jnp.asarray(buf),
                                       jnp.asarray(bflag))
        self.state = st
        return np.asarray(dec_m.round_pcm(y))
