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
        self.epmr = 0  # error-protection mode request (lc3.h epmr setter)

    def set_bitrate(self, bitrate: int) -> None:
        if bitrate != self.cfg.bitrate:
            self.cfg = self.cfg.with_bitrate(bitrate)

    def set_ep_mode(self, epmode: int) -> None:
        """lc3_enc_set_ep_mode: re-derives the payload split, keeps state."""
        if epmode != self.cfg.epmode:
            from dataclasses import replace
            self.cfg = replace(self.cfg, epmode=epmode)

    def encode(self, pcm: np.ndarray) -> list[bytes]:
        """pcm: [n_streams, frame_length] int16-range. Returns frame bytes
        (channel-coded to cfg.slotBytes when epmode > 0, Enc_LC3 hook
        enc_lc3.c:283-308)."""
        cfg = self.cfg
        st, out, _ = _enc_step(cfg)(self.state, jnp.asarray(pcm, jnp.float32))
        self.state = st
        out = np.asarray(out)
        if cfg.epmode > 0:
            if cfg.n_pc > 0:
                raise NotImplementedError(
                    "partial-concealment bitstream reorder (n_pc > 0: EP3/4 "
                    "at slot >= 80 bytes) not wired into the engine yet")
            from .ops import fec
            epmr = jnp.full((self.n,), self.epmr, jnp.int32)
            out = np.asarray(fec.fec_encode(
                jnp.asarray(out.astype(np.int32)), epmr,
                slot_bytes=cfg.slotBytes, mode=cfg.epmode,
                ccc_flag=cfg.ccc)).astype(np.uint8)
        return [out[i].tobytes() for i in range(self.n)]


class StreamDecoder:
    """Persistent-state decoder over n_streams independent streams."""

    def __init__(self, cfg: Config, n_streams: int = 1):
        self.cfg = cfg
        self.n = n_streams
        self.state = S.dec_state_init(cfg, n_streams)
        self._last_size = cfg.targetBytes
        self.epmr = 0      # decoder-estimated EP mode request (0..11)
        self.error_report = 0

    def decode(self, payload: bytes, bfi: bool = False) -> np.ndarray:
        """payload: concatenated per-channel frame bytes (may be empty on loss).
        Returns [n_streams, frame_length] int16 PCM."""
        if self.cfg.epmode > 0 and not bfi and len(payload):
            payload, bfi = self._fec_unwrap(payload)
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

    def _fec_unwrap(self, payload: bytes) -> tuple[bytes, bool]:
        """Channel-coder decode of one slot per stream (Dec_LC3 framing,
        dec_lc3.c:340-400). Returns (core payload, bfi)."""
        from dataclasses import replace

        from .ops import fec
        slot = len(payload) // self.n
        buf = np.frombuffer(payload, np.uint8).reshape(self.n, slot)
        out = fec.fec_decode(jnp.asarray(buf.astype(np.int32)),
                             slot_bytes=slot, ccc_flag=self.cfg.ccc)
        self.epmr = int(np.asarray(out["epmr"]).min())
        self.error_report = np.asarray(out["error_report"])
        bfi = np.asarray(out["bfi"])
        mode = int(np.asarray(out["mode"])[0])
        db = int(np.asarray(out["data_bytes"])[0])
        if (bfi == 1).any() or db == 0 or mode < 1:
            return b"", True
        if (bfi == 2).any():
            # partial concealment not wired yet -> conceal the whole frame
            return b"", True
        if mode != self.cfg.epmode or db != self.cfg.targetBytes:
            self.cfg = replace(
                self.cfg, epmode=mode,
                bitrate=slot * self.n * 8 * 10000 // self.cfg.frame_dms)
        data = np.asarray(out["data"])[:, :db].astype(np.uint8)
        return data.tobytes(), False
