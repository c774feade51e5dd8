"""Golden tests: full decoder vs oracle on the oracle's own bitstream."""

import pytest

pytestmark = pytest.mark.slow  # full-codec CPU compile / oracle runs

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audio_codec_tpu.config import Config
from audio_codec_tpu.models import decoder, state as S
from tests import oracle

CFG = Config(fs_in=16000, bitrate=32000)
NF = 150


@pytest.fixture(scope="module")
def rig():
    enc_d, bs = oracle.enc_dumps("thetest16", 32000)
    dec_d, wav = oracle.dec_dumps(bs, "t16")
    raw = bs.read_bytes()
    frames = []
    off = 20
    nb = CFG.targetBytes
    while off + 2 <= len(raw) and len(frames) < NF:
        ln = int.from_bytes(raw[off:off + 2], "little")
        assert ln == nb
        frames.append(np.frombuffer(raw[off + 2: off + 2 + ln], np.uint8))
        off += 2 + ln
    return dec_d, np.stack(frames), wav


@jax.jit
def _stages(buf):
    """Stateless decoder stages for golden comparison, batched over frames."""
    from audio_codec_tpu.ops import ari, bits, quant, sns, tns
    from audio_codec_tpu import tables as T
    side = bits.parse_side_info(CFG, buf)
    dec = ari.decode(CFG, buf, side)
    out = {"bfi": jnp.maximum(side["bfi"], dec["bfi"])}
    x = dec["x"].astype(jnp.float32)
    out["ari"] = x
    x = jnp.where((dec["residual_present"] == 1)[:, None],
                  quant.residual_decode(CFG, x, dec["res_bits"], dec["n_res"]), x)
    out["res"] = x
    bw_bin = jnp.asarray(T.t("BW_cutoff_bin_all"), jnp.int32)[side["bw_idx"]]
    nf = quant.noise_filling(CFG, x, dec["nf_seed"], side["fac_ns_idx"], bw_bin)
    x = jnp.where((dec["zero_frame"] == 0)[:, None], nf, x)
    out["nf"] = x
    x = quant.apply_global_gain(CFG, x, side["gg_idx"])
    out["gg"] = x
    x = tns.tns_decode(CFG, x, dec["tns_idx"], dec["tns_order"],
                       side["num_tns"], side["bw_idx"])
    out["tns"] = x
    scf_q = sns.quantize_scf_dec(side["scf_idx"])
    gains = sns.interpolate_scf(CFG, scf_q, encoder_side=False)
    out["shaped"] = sns.mdct_shaping(CFG, x, gains)
    return out


def test_decoder_stages(rig):
    dec_d, payloads, wav = rig
    N = CFG.yLen
    gold = {k: oracle.frames(dec_d, f"dec_spec_{k}", N)[:NF]
            for k in ("ari", "res", "nf", "gg", "tns", "shaped")}
    out = jax.tree_util.tree_map(np.asarray,
                                 _stages(jnp.asarray(payloads.astype(np.int32))))
    assert out["bfi"].sum() == 0
    assert np.array_equal(out["ari"], gold["ari"])
    assert np.abs(out["res"] - gold["res"]).max() < 1e-5
    assert np.abs(out["nf"] - gold["nf"]).max() < 1e-5
    sc = np.maximum(np.abs(gold["gg"]).max(axis=1, keepdims=True), 1.0)
    assert (np.abs(out["gg"] - gold["gg"]) / sc).max() < 1e-4
    assert (np.abs(out["tns"] - gold["tns"]) / sc).max() < 1e-3
    assert (np.abs(out["shaped"] - gold["shaped"]) / sc).max() < 1e-3


def test_decoder_full_stream(rig):
    """Stateful full decode: per-frame output and final PCM vs oracle WAV."""
    dec_d, payloads, wav = rig
    FL = CFG.frame_length
    g_out = oracle.frames(dec_d, "dec_ltpf_out", FL)[:NF]
    st = S.dec_state_init(CFG, 1)
    from audio_codec_tpu.engine import _dec_step
    step0 = _dec_step(CFG)
    nobfi = jnp.zeros((1,), jnp.int32)
    outs = []
    worst = 0.0
    for f in range(NF):
        st, y, _ = step0(st, jnp.asarray(payloads[f][None]), nobfi)
        y0 = np.asarray(y)[0]
        sc = max(1.0, np.abs(g_out[f]).max())
        worst = max(worst, np.abs(y0 - g_out[f]).max() / sc)
        outs.append(np.round(np.clip(y0, -32768, 32767)).astype(np.int16))
    assert worst < 2e-3, worst

    ours = np.concatenate(outs)
    pcm_gold, fs = oracle.read_wav_mono(wav)
    assert fs == 16000
    # the oracle CLI trims the 2.5 ms algorithmic delay from its output
    delay = int(2.5 * CFG.fs / 1000)
    n = min(len(ours) - delay, len(pcm_gold))
    diff = ours[delay: delay + n].astype(np.float64) - pcm_gold[:n, 0].astype(np.float64)
    err = np.sqrt(np.mean(diff ** 2))
    assert err < 0.1, err  # sample-exact up to PCM rounding


def test_decode_block_equivalence():
    """decode_block (T*B-batched entropy + scanned synthesis) must match
    T sequential decode_frame calls, including states and concealed
    lanes. Tolerance is float32-ulp scale (~5e-3 on the +-32768 PCM
    range): the two programs compile with different XLA fusions, so
    bit-equality of float reassociation is not guaranteed — the integer
    entropy outputs ARE bit-exact by construction (decode_entropy is
    the shared code path)."""
    from audio_codec_tpu.models import encoder
    B, T = 2, 4
    est = S.enc_state_init(CFG, B)
    frames = []
    for t in range(T):
        pcm = (3000 * np.sin(0.03 * (t + 1) *
                             np.arange(CFG.frame_length))[None] *
               np.ones((B, 1))).astype(np.float32)
        est, out, _ = encoder.encode_frame(CFG, est, jnp.asarray(pcm))
        frames.append(np.asarray(out))
    frames = jnp.asarray(np.stack(frames)).astype(jnp.int32)
    bfi = jnp.zeros((T, B), jnp.int32).at[2, 1].set(1)

    st = S.dec_state_init(CFG, B)
    outs = []
    for t in range(T):
        st, pcm, _ = decoder.decode_frame(CFG, st, frames[t], bfi[t])
        outs.append(np.asarray(pcm))
    st2 = S.dec_state_init(CFG, B)
    st2, blk = decoder.decode_block(CFG, st2, frames, bfi)
    np.testing.assert_allclose(np.stack(outs), np.asarray(blk), atol=0.01)
    for a, b in zip(jax.tree.leaves(st), jax.tree.leaves(st2)):
        a, b = np.asarray(a), np.asarray(b)
        if a.size and np.issubdtype(a.dtype, np.floating):
            np.testing.assert_allclose(a, b, atol=0.01)
        elif a.size:
            np.testing.assert_array_equal(a, b)
