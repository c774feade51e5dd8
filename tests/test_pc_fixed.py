"""Bit-exact partial concealment (bfi==2) vs the ETSI fixed decoder.

EP streams whose uncorrectable errors are confined to PC codewords are
classified bfi==2 by the channel decoder; the core decoder then decodes
up to the corrupt span and synthesizes the rest from the previous
frame's residual (pc_main_fx.c / pc_apply_fx.c / pc_classify_fx.c /
pc_update_fx.c, dec_lc3.c:186-193).  The whole chain — our RS channel
decoder + PC-aware range decoder + integer PC + fixed backend — must
reproduce the reference decoder's WAV sample-for-sample.
"""
from __future__ import annotations

import numpy as np
import pytest

from audio_codec_tpu.config import Config
from audio_codec_tpu.fixed_decoder import FixedDecoder
from audio_codec_tpu.ops import fec
from audio_codec_tpu.utils import bitstream_io as bio

from . import oracle

pytestmark = pytest.mark.slow  # full-codec CPU compile / oracle runs


def _corrupt_pc_codewords(raw: np.ndarray, slot: int, frames_idx,
                          rng: np.random.Generator,
                          n_cw: int = 1) -> np.ndarray:
    """Destroy the last `n_cw` (PC) codewords of the chosen slots beyond
    RS correction capacity (al_fec.c:840-870 classifies these bfi==2)."""
    sp = fec._slot_plan(slot)
    ncw = sp["ncw"]
    out = raw.copy()
    nib = np.stack([out & 15, out >> 4], -1).reshape(len(out), -1)
    cws = nib[:, sp["il_dst"]]
    for f in frames_idx:
        for cw in range(ncw - n_cw, ncw):
            o, L = sp["offs"][cw], sp["lens"][cw]
            cws[f, o:o + L] ^= rng.integers(1, 16, size=L)
    nib2 = cws[:, np.argsort(sp["il_dst"])]
    return (nib2[:, 0::2] | (nib2[:, 1::2] << 4)).astype(np.int32)


@pytest.mark.parametrize("epmode,burst", [(4, False), (3, True)],
                         ids=["ep4_isolated", "ep3_burst"])
def test_pc_bit_exact_vs_oracle(tmp_path, epmode, burst):
    import jax.numpy as jnp

    bs = oracle.fx_encode("thetest16", 64000, ep_mode=epmode)
    h, slots = bio.read_all(bs)
    raw = np.stack([np.frombuffer(s, np.uint8) for s in slots]) \
        .astype(np.int32)
    slot = raw.shape[1]
    assert fec.fec_get_n_pccw(slot, epmode, 0) > 0
    rng = np.random.default_rng(0x9C)
    # isolated partial losses + (burst case) consecutive ones driving the
    # pc_nbLostFramesInRow damping ladder and a post-erasure partial loss
    idx = [5, 20, 33, 47, 60] if not burst else [5, 12, 13, 14, 30, 31, 44]
    idx = [i for i in idx if i < len(raw)]
    cor = _corrupt_pc_codewords(raw, slot, idx, rng,
                                n_cw=2 if burst else 1)

    cor_bs = tmp_path / "pc_corrupt.bin"
    bio.write_all(cor_bs, h, [bytes(r.astype(np.uint8)) for r in cor])

    # reference chain on the corrupted stream
    _, ref_wav = oracle.fx_dec_dumps(cor_bs, f"pc{epmode}{int(burst)}")
    ref_pcm = oracle.read_wav_mono(ref_wav)[0].reshape(-1)

    # our chain: RS channel decode -> bit-exact core with PC
    cd = fec.fec_decode(jnp.asarray(cor), slot_bytes=slot, ccc_flag=0)
    bfi = np.asarray(cd["bfi"], np.int64)
    assert (bfi[idx] == 2).all(), "corruption did not trigger bfi==2"
    assert (bfi[[i for i in range(len(raw)) if i not in idx]] == 0).all()

    data = np.asarray(cd["data"], np.int64).astype(np.uint8)
    data_bytes = np.asarray(cd["data_bytes"], np.int64)
    fps = 10000 // int(h.frame_ms * 10)
    nb = int(data_bytes[bfi == 0].max())
    cfg = Config(fs_in=h.samplerate, bitrate=nb * 8 * fps,
                 frame_dms=int(h.frame_ms * 10))
    # count real pc_apply invocations — a run where every bfi==2 frame is
    # downgraded to full loss by the classifier would be a vacuous pass
    from audio_codec_tpu.ops import pc_fixed as pcx
    applies = []
    orig_apply = pcx.pc_apply
    monkey = lambda *a, **k: (applies.append(1), orig_apply(*a, **k))[1]
    pcx.pc_apply = monkey
    try:
        dec = FixedDecoder(cfg)
        pcm = _run_decode(dec, data, nb, bfi, data_bytes, cd)
    finally:
        pcx.pc_apply = orig_apply
    assert applies, "no frame reached pc_apply (classifier downgraded all)"

    delay = cfg.frame_length - 2 * cfg.la_zeroes
    out = pcm[delay: delay + len(ref_pcm)]
    np.testing.assert_array_equal(out, ref_pcm[:len(out)])


def _run_decode(dec, data, nb, bfi, data_bytes, cd):
    pcm = dec.decode_plc(
        data[:, :nb], bfi, nbytes=data_bytes,
        n_pc=np.asarray(cd["n_pc"]), n_pccw=np.asarray(cd["n_pccw"]),
        be_bp_left=np.asarray(cd["be_bp_left"]),
        be_bp_right=np.asarray(cd["be_bp_right"])).reshape(-1)
    return pcm
