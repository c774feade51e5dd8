"""Streaming codec engine: jitted frame steps over a stream batch.

The API mirrors the reference's contract (lc3.h:193-340): create a
state-carrying encoder/decoder, feed one frame per call, switch bitrate
between frames without state reset (update_enc_bitrate semantics — the
Config is static per jit cache entry, channel state carries across).

Multichannel layout: lanes are grouped in consecutive blocks of
cfg.channels; lane g*ch + c is channel c of multichannel stream g. Byte
budgets split across channels with remainder to the lowest channels
(setup_enc_lc3.c:192-196), and with epmode > 0 the channel coder runs
either per channel or — for total frames <= 160 bytes — once over the
concatenated channel payloads (combined channel coding, Enc_LC3,
enc_lc3.c:283-316; Dec_LC3, dec_lc3.c:324-447).

For pod-scale operation see parallel/ (shard_map over a stream-sharded
mesh); this module is the single-host convenience layer the CLI uses.
"""
from __future__ import annotations

import functools
from dataclasses import replace

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
    def step(st, payload, bfi, be_l=None, be_r=None):
        return dec_m.decode_frame(cfg, st, payload, bfi, be_l, be_r)
    return step


@functools.cache
def _b_left_step(cfg: Config):
    """Encoder-side PC simulation: re-decode the frame to find the pointer
    convergence byte b_left for the bitstream reorder (enc_lc3.c:245-259)."""
    from .ops import ari, bits

    @jax.jit
    def step(buf):
        side = bits.parse_side_info(cfg, buf)
        out = ari.decode(cfg, buf, side, pc_enc_sim=True)
        return out["b_left"]
    return step


def _reorder_payload(data: np.ndarray, b_left: int, n_pc: int) -> np.ndarray:
    """processReorderBitstream_fx: move the convergence block of
    (n_pc+1)//2 bytes at b_left to the front of the payload."""
    blk = (n_pc + 1) >> 1
    return np.concatenate([data[b_left:b_left + blk], data[:b_left],
                           data[b_left + blk:]])


def _lane_groups(cfgs: tuple[Config, ...], n: int) -> list[tuple[Config, list[int]]]:
    """Group lane indices by identical per-channel Config (lane % channels
    selects the channel; remainder bytes make at most two distinct groups)."""
    ch = len(cfgs)
    groups: dict[Config, list[int]] = {}
    for lane in range(n):
        groups.setdefault(cfgs[lane % ch], []).append(lane)
    return list(groups.items())


def _tree_gather(tree, idx):
    return jax.tree_util.tree_map(lambda a: a[idx], tree)


def _tree_scatter(tree, idx, sub):
    return jax.tree_util.tree_map(lambda a, b: a.at[idx].set(b), tree, sub)


class StreamEncoder:
    """Persistent-state encoder over n_streams independent lanes."""

    def __init__(self, cfg: Config, n_streams: int = 1):
        if n_streams % cfg.channels:
            raise ValueError("n_streams must be a multiple of cfg.channels")
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
            self.cfg = replace(self.cfg, epmode=epmode)

    def set_bandwidth(self, bandwidth: int) -> None:
        """lc3_enc_set_bandwidth (lc3.c:187-207): per-frame switchable."""
        if bandwidth != self.cfg.bandwidth:
            self.cfg = replace(self.cfg, bandwidth=bandwidth)

    def _encode_core(self, pcm: jnp.ndarray) -> list[np.ndarray]:
        """Core (pre-FEC) encode of every lane; per-lane byte arrays."""
        cfgs = self.cfg.channel_configs()
        if len(set(cfgs)) == 1:
            st, out, _ = _enc_step(cfgs[0])(self.state, pcm)
            self.state = st
            out = np.asarray(out)
            return [out[i] for i in range(self.n)]
        outs: list[np.ndarray] = [None] * self.n  # type: ignore[list-item]
        for ccfg, lanes in _lane_groups(cfgs, self.n):
            idx = jnp.asarray(lanes)
            sub, out, _ = _enc_step(ccfg)(_tree_gather(self.state, idx),
                                          pcm[idx])
            self.state = _tree_scatter(self.state, idx, sub)
            out = np.asarray(out)
            for k, lane in enumerate(lanes):
                outs[lane] = out[k]
        return outs

    def encode(self, pcm: np.ndarray) -> list[bytes]:
        """pcm: [n_streams, frame_length] at cfg.bps scale (16/24/32-bit
        integer range; scaled to the codec's 16-bit working range like
        lc3_enc24/enc32, enc_lc3_fl.c:30-42). Returns frame bytes: one entry
        per lane, channel-coded to cfg.slotBytes when epmode > 0 per channel,
        or one entry per multichannel group when combined channel coding is
        active (Enc_LC3 hook, enc_lc3.c:283-316)."""
        pcm = jnp.asarray(pcm, jnp.float32)
        if self.cfg.bps != 16:
            pcm = pcm * (2.0 ** (16 - self.cfg.bps))
        return self._package(self._encode_core(pcm))

    def encode_plc_trigger(self) -> list[bytes]:
        """-ept frames: the side-info lastnz field is set to the all-ones
        trigger value (lastnzTrigger table, fixed_point/enc_entropy.c:31,65)
        so the decoder's side parse detects an invalid lastnz and conceals.
        The trigger payload passes through the channel coder like any frame."""
        cfgs = self.cfg.channel_configs()
        outs = []
        for lane in range(self.n):
            c = cfgs[lane % self.cfg.channels]
            buf = np.zeros(c.targetBytes, np.uint8)
            pos = c.BW_cutoff_bits    # backward LSB-first from the last byte
            for k in range(c.lastnz_bits):
                p = pos + k
                buf[c.targetBytes - 1 - p // 8] |= 1 << (p % 8)
            outs.append(buf)
        return self._package(outs, reorder=False)

    def _package(self, outs: list[np.ndarray], reorder: bool = True) -> list[bytes]:
        cfg = self.cfg
        if cfg.epmode == 0:
            return [o.tobytes() for o in outs]
        from .ops import fec
        ch = cfg.channels
        if cfg.ccc:
            # combined channel coding: concatenate per-channel payloads and
            # run the FEC once over the full slot (enc_lc3.c:303-313)
            G = self.n // ch
            data = np.stack([
                np.concatenate(outs[g * ch:(g + 1) * ch]) for g in range(G)
            ]).astype(np.int32)
            epmr = jnp.full((G,), self.epmr, jnp.int32)
            coded = np.asarray(fec.fec_encode(
                jnp.asarray(data), epmr, slot_bytes=cfg.slotBytes,
                mode=cfg.epmode, ccc_flag=1)).astype(np.uint8)
            return [coded[g].tobytes() for g in range(G)]
        # per-channel FEC slots
        cfgs = cfg.channel_configs()
        coded: list[bytes] = [b""] * self.n
        for ccfg, lanes in _lane_groups(cfgs, self.n):
            stack = np.stack([outs[i] for i in lanes]).astype(np.int32)
            if ccfg.n_pc > 0 and reorder:
                # EP3/EP4 at slot >= 80: relocate the most error-sensitive
                # block so the PC codewords protect it (reorder before FEC,
                # enc_lc3.c:245-259)
                b_left = np.asarray(_b_left_step(ccfg)(jnp.asarray(stack)))
                for k in range(stack.shape[0]):
                    assert b_left[k] >= 0, b_left
                    stack[k] = _reorder_payload(stack[k], int(b_left[k]),
                                                ccfg.n_pc)
            epmr = jnp.full((len(lanes),), self.epmr, jnp.int32)
            enc = np.asarray(fec.fec_encode(
                jnp.asarray(stack), epmr, slot_bytes=ccfg.slotBytes,
                mode=ccfg.epmode, ccc_flag=0)).astype(np.uint8)
            for k, lane in enumerate(lanes):
                coded[lane] = enc[k].tobytes()
        return coded


class StreamDecoder:
    """Persistent-state decoder over n_streams independent lanes."""

    def __init__(self, cfg: Config, n_streams: int = 1):
        if n_streams % cfg.channels:
            raise ValueError("n_streams must be a multiple of cfg.channels")
        self.cfg = cfg
        self.n = n_streams
        self.state = S.dec_state_init(cfg, n_streams)
        self.epmr = 0      # decoder-estimated EP mode request (0..11)
        self.error_report = np.zeros((n_streams,), np.int32)
        self.last_bfi = np.zeros((n_streams,), np.int32)  # post-decode bfi

    def _decode_core(self, bufs: list[np.ndarray | None],
                     bfis: np.ndarray, be_l: np.ndarray | None = None,
                     be_r: np.ndarray | None = None) -> np.ndarray:
        """Core decode of every lane. bufs[i] is lane i's payload bytes
        (sizes may differ across channels); bfis [n] int32 in {0,1,2,3};
        be_l/be_r: per-lane corrupt bit range for bfi==2 lanes."""
        cfgs = self.cfg.channel_configs()
        nbs = [cfgs[i % self.cfg.channels].targetBytes for i in range(self.n)]
        full = np.zeros((self.n, max(nbs)), np.uint8)
        for i, b in enumerate(bufs):
            if b is not None and bfis[i] != 1:
                full[i, :len(b)] = b
        if be_l is None:
            be_l = np.full((self.n,), -1, np.int32)
            be_r = np.full((self.n,), -1, np.int32)
        if len(set(cfgs)) == 1:
            st, y, aux = _dec_step(cfgs[0])(self.state, jnp.asarray(full),
                                            jnp.asarray(bfis),
                                            jnp.asarray(be_l),
                                            jnp.asarray(be_r))
            self.state = st
            self.last_bfi = np.asarray(aux["bfi"])
            return np.asarray(dec_m.round_pcm(y, self.cfg.bps))
        pcm = np.zeros((self.n, self.cfg.frame_length), np.int32)
        self.last_bfi = np.zeros((self.n,), np.int32)
        for ccfg, lanes in _lane_groups(cfgs, self.n):
            idx = jnp.asarray(lanes)
            sub, y, aux = _dec_step(ccfg)(
                _tree_gather(self.state, idx),
                jnp.asarray(full[np.asarray(lanes)][:, :ccfg.targetBytes]),
                jnp.asarray(bfis)[idx], jnp.asarray(be_l)[idx],
                jnp.asarray(be_r)[idx])
            self.state = _tree_scatter(self.state, idx, sub)
            self.last_bfi[np.asarray(lanes)] = np.asarray(aux["bfi"])
            pcm[np.asarray(lanes)] = np.asarray(dec_m.round_pcm(y, self.cfg.bps))
        return pcm

    def decode(self, payload: bytes, bfi: bool | int = False) -> np.ndarray:
        """payload: concatenated per-channel frame bytes (may be empty on
        loss). bfi: 0/False good, 1/True lost, 3 redundancy frame (G.192,
        treated as a fully-suspect frame -> partial concealment).
        Returns [n_streams, frame_length] int16 PCM."""
        ch = self.cfg.channels
        bfi = int(bfi)
        if bfi == 1 or not len(payload):
            return self._decode_core([None] * self.n,
                                     np.ones((self.n,), np.int32))
        if self.cfg.epmode > 0:
            bufs, bfis, be_l, be_r = self._fec_unwrap(payload)
            if bfi == 3:
                bfis = np.where(bfis == 0, 3, bfis)
            return self._decode_core(bufs, bfis, be_l, be_r)
        # plain path: split across groups/channels with remainder to the
        # lowest channels (Dec_LC3, dec_lc3.c:449-456)
        G = self.n // ch
        gbytes = len(payload) // G
        per = gbytes // ch + (0 < gbytes % ch)
        if per != self.cfg.targetBytes:
            # frame-size switch without state reset (update_dec_bitrate,
            # setup_dec_lc3.c:203): derive the bitrate giving this count
            self._resize(gbytes)
        bufs: list[np.ndarray | None] = [None] * self.n
        raw = np.frombuffer(payload, np.uint8)
        for g in range(G):
            off = g * gbytes
            for c in range(ch):
                nb = gbytes // ch + (c < gbytes % ch)
                bufs[g * ch + c] = raw[off:off + nb]
                off += nb
        return self._decode_core(bufs, np.full((self.n,), bfi, np.int32))

    def _resize(self, group_bytes: int) -> None:
        """Re-derive the Config for a new per-group byte count.

        Accepts any in-range byte count like the reference's
        update_dec_bitrate (setup_dec_lc3.c:203+): the bitrate is the
        smallest one whose floor-derived payload equals group_bytes."""
        ch = self.cfg.channels
        per = group_bytes // ch + (0 < group_bytes % ch)
        if not 20 <= per <= 625:  # MIN/MAX_NBYTES per channel (defines.h)
            raise ValueError(
                f"invalid frame size {group_bytes} bytes for {ch} channel(s)"
                " (LC3_NUMBYTES_ERROR)")
        new_rate = -(-group_bytes * 8 * self.cfg.fs_in
                     // self.cfg.frame_length)
        cfg = self.cfg.with_bitrate(new_rate)
        total = cfg.bitrate * cfg.frame_length // (8 * cfg.fs_in)
        if total != group_bytes:  # floor/ceil mismatch cannot happen, but be safe
            raise ValueError(
                f"cannot derive a bitrate for {group_bytes}-byte frames")
        self.cfg = cfg

    def _fec_unwrap(self, payload: bytes):
        """Channel-coder decode (Dec_LC3 framing, dec_lc3.c:324-447).
        Returns (per-lane core payloads, bfi flags, be_bp_left, be_bp_right)
        — the byte-error bit range feeding partial concealment."""
        from .ops import fec
        ch = self.cfg.channels
        G = self.n // ch
        gbytes = len(payload) // G
        raw = np.frombuffer(payload, np.uint8).reshape(G, gbytes)
        ccc = ch > 1 and gbytes <= 160   # derived per frame (dec_lc3.c:343)
        bufs: list[np.ndarray | None] = [None] * self.n
        bfis = np.zeros((self.n,), np.int32)
        be_l = np.full((self.n,), -1, np.int32)
        be_r = np.full((self.n,), -1, np.int32)
        if ccc:
            out = fec.fec_decode(jnp.asarray(raw.astype(np.int32)),
                                 slot_bytes=gbytes, ccc_flag=1)
            self.epmr = int(np.asarray(out["epmr"]).min())
            self.error_report = np.asarray(out["error_report"])
            obfi = np.asarray(out["bfi"])
            dbs = np.asarray(out["data_bytes"])
            modes = np.asarray(out["mode"])
            data = np.asarray(out["data"]).astype(np.uint8)
            for g in range(G):
                if obfi[g] == 1 or dbs[g] == 0 or modes[g] < 1:
                    bfis[g * ch:(g + 1) * ch] = 1
                    continue
                db = int(dbs[g])
                if obfi[g] == 2:
                    # ccc never carries PC codewords (fec_get_n_pccw,
                    # al_fec.c:379-390) so bfi==2 cannot occur; conceal
                    bfis[g * ch:(g + 1) * ch] = 1
                    continue
                if int(modes[g]) != self.cfg.epmode or \
                        db != sum(c.targetBytes
                                  for c in self.cfg.channel_configs()):
                    self.cfg = replace(
                        self.cfg, epmode=int(modes[g]),
                        bitrate=gbytes * 8 * 10000 // self.cfg.frame_dms)
                off = 0
                for c in range(ch):
                    nb = db // ch + (c < db % ch)
                    bufs[g * ch + c] = data[g, off:off + nb]
                    off += nb
            return bufs, bfis, be_l, be_r
        # per-channel FEC slots: channel c of each group gets
        # gbytes//ch (+1 for the first gbytes%ch channels)
        lane_slots = [gbytes // ch + (c < gbytes % ch) for c in range(ch)]
        offs = np.concatenate([[0], np.cumsum(lane_slots)]).astype(int)
        epmr_min = 12
        for c in range(ch):
            slot = lane_slots[c]
            frames = raw[:, offs[c]:offs[c + 1]].astype(np.int32)
            out = fec.fec_decode(jnp.asarray(frames), slot_bytes=slot,
                                 ccc_flag=0)
            epmr_min = min(epmr_min, int(np.asarray(out["epmr"]).min()))
            self.error_report = np.asarray(out["error_report"])
            obfi = np.asarray(out["bfi"])
            dbs = np.asarray(out["data_bytes"])
            modes = np.asarray(out["mode"])
            bels = np.asarray(out["be_bp_left"])
            bers = np.asarray(out["be_bp_right"])
            data = np.asarray(out["data"]).astype(np.uint8)
            for g in range(G):
                lane = g * ch + c
                if obfi[g] == 1 or dbs[g] == 0 or modes[g] < 1:
                    bfis[lane] = 1
                    continue
                # n_pc > 0 payloads stay in transmitted (reordered) order;
                # the PC-aware arithmetic decoder undoes the block swap
                # in-stream (check_pc_bytes, ari_codec.c:1824-1921)
                db = int(dbs[g])
                bufs[lane] = data[g, :db]
                if obfi[g] == 2:
                    bfis[lane] = 2
                    be_l[lane] = bels[g]
                    be_r[lane] = bers[g]
                mode = int(modes[g])
                if mode != self.cfg.epmode or db != \
                        self.cfg.channel_configs()[c].targetBytes:
                    self.cfg = replace(
                        self.cfg, epmode=mode,
                        bitrate=gbytes * 8 * 10000 // self.cfg.frame_dms)
        self.epmr = epmr_min
        return bufs, bfis, be_l, be_r
