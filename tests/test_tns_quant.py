"""Golden tests: TNS + global gain + spectral quantizer vs oracle (16k/32kbps)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audio_codec_tpu.config import Config
from audio_codec_tpu.ops import quant, tns
from tests import oracle

CFG = Config(fs_in=16000, bitrate=32000)
NF = 300


@pytest.fixture(scope="module")
def dumps():
    d, _ = oracle.enc_dumps("thetest16", 32000)
    return d


def test_tns_encode(dumps):
    N = CFG.frame_length
    shaped = oracle.frames(dumps, "enc_shaped", N)[:NF]
    bw = oracle.frames(dumps, "enc_bwidx", 1)[:NF, 0]
    g_out = oracle.frames(dumps, "enc_tns_out", N)[:NF]
    g_order = oracle.frames(dumps, "enc_tns_order", 2)[:NF]
    g_idx = oracle.frames(dumps, "enc_tns_idx", 16)[:NF]
    g_nf = oracle.frames(dumps, "enc_tns_nf", 1)[:NF, 0]
    g_bits = oracle.frames(dumps, "enc_tns_bits", 1)[:NF, 0]

    x_out, order, rc_idx, numf, bits = jax.jit(
        lambda x, b: tns.tns_encode(CFG, x, b))(jnp.asarray(shaped), jnp.asarray(bw))
    x_out = np.asarray(x_out)
    order = np.asarray(order)
    rc_idx = np.asarray(rc_idx).reshape(NF, 16)
    bad = 0
    for f in range(NF):
        # only rc_idx entries below the filter order are meaningful
        lanes = np.arange(8)
        m = np.concatenate([lanes < order[f, 0], lanes < order[f, 1]])
        if not (np.array_equal(order[f], g_order[f])
                and int(numf[f]) == g_nf[f] and int(bits[f]) == g_bits[f]
                and np.array_equal(rc_idx[f][m], g_idx[f][m])):
            bad += 1
            continue
        scale = max(np.abs(g_out[f]).max(), 1e-9)
        if np.abs(x_out[f] - g_out[f]).max() > 1e-4 * scale:
            bad += 1
    assert bad <= NF // 50, bad


def test_global_gain_and_quantize(dumps):
    """Run gain estimate → quantize → bit estimate → adjust → requantize chain
    with oracle inputs (shaped+TNS spectrum, tns/ltpf bits)."""
    N = CFG.frame_length
    x = oracle.frames(dumps, "enc_tns_out", N)[:NF]
    tns_bits = oracle.frames(dumps, "enc_tns_bits", 1)[:NF, 0]
    ltpf_bits = oracle.frames(dumps, "enc_ltpf_bits", 1)[:NF, 0]
    g_gain = oracle.frames(dumps, "enc_gain", 1)[:NF, 0]
    g_gg = oracle.frames(dumps, "enc_gg", 1)[:NF, 0]
    g_ggmin = oracle.frames(dumps, "enc_ggmin", 1)[:NF, 0]
    g_tbo = oracle.frames(dumps, "enc_targetBitsOff", 1)[:NF, 0]
    g_tbq = oracle.frames(dumps, "enc_targetBitsQuant", 1)[:NF, 0]
    g_nbits = oracle.frames(dumps, "enc_nbits", 1)[:NF, 0]
    g_nbits2 = oracle.frames(dumps, "enc_nbits2", 1)[:NF, 0]
    g_qd = oracle.frames(dumps, "enc_qd", CFG.yLen)[:NF]
    g_lastnz = oracle.frames(dumps, "enc_lastnz", 1)[:NF, 0]
    g_lsb = oracle.frames(dumps, "enc_lsbMode", 1)[:NF, 0]
    g_gg2 = oracle.frames(dumps, "enc_gg2", 1)[:NF, 0]
    g_gain2 = oracle.frames(dumps, "enc_gain2", 1)[:NF, 0]
    g_gchange = oracle.frames(dumps, "enc_gainChange", 1)[:NF, 0]

    tbo = jnp.zeros((1,), jnp.float32)
    otb = jnp.zeros((1,), jnp.int32)
    osb = jnp.zeros((1,), jnp.int32)
    bad = dict(gain=0, nbits=0, adj=0, qd=0)
    first_mismatch = None
    for f in range(NF):
        tbq = int(CFG.targetBitsInit - (tns_bits[f] + ltpf_bits[f]))
        assert tbq == g_tbq[f], (f, tbq, g_tbq[f])
        xf = jnp.asarray(x[f][None, : CFG.yLen])
        gain, gg, ggmin, tbo, otb = quant.estimate_global_gain(
            CFG, xf, tbq, tbo, otb, osb)
        ok_gain = (int(gg[0]) == g_gg[f] and int(ggmin[0]) == g_ggmin[f]
                   and abs(float(tbo[0]) - g_tbo[f]) < 1e-3)
        if not ok_gain:
            bad["gain"] += 1
            if first_mismatch is None:
                first_mismatch = ("gain", f, int(gg[0]), g_gg[f], int(ggmin[0]), g_ggmin[f])
            # resync state with oracle values so later frames stay comparable
            gain = jnp.asarray([g_gain[f]], jnp.float32)
            gg = jnp.asarray([g_gg[f]], jnp.int32)
            ggmin = jnp.asarray([g_ggmin[f]], jnp.int32)

        xq = quant.quantize_spectrum(CFG, xf, gain)
        est = quant.bit_estimate(CFG, xq, tbq, mode=-1)
        osb = est["nbits"]
        ok_nb = (int(est["nbits"][0]) == g_nbits[f]
                 and int(est["nbits2"][0]) == g_nbits2[f]
                 and int(est["lsbMode"][0]) == g_lsb[f])
        if not ok_nb:
            bad["nbits"] += 1
            if first_mismatch is None:
                first_mismatch = ("nbits", f, int(est["nbits"][0]), g_nbits[f],
                                  int(est["nbits2"][0]), g_nbits2[f])
            osb = jnp.asarray([g_nbits[f]], jnp.int32)
            continue

        gg2, gain2, gchange = quant.adjust_global_gain(
            CFG, gg, ggmin, gain, tbq, est["nbits"])
        if not (int(gg2[0]) == g_gg2[f] and int(gchange[0]) == g_gchange[f]):
            bad["adj"] += 1
            if first_mismatch is None:
                first_mismatch = ("adj", f, int(gg2[0]), g_gg2[f])
            continue
        if int(gchange[0]):
            xq = quant.quantize_spectrum(CFG, xf, gain2)
            est = quant.bit_estimate(CFG, xq, tbq, mode=0)
        xq_t = quant.truncate_spectrum(xq, est["lastnz"], est["lastnz2"])
        if int(est["lastnz2"][0]) != g_lastnz[f] or \
           not np.array_equal(np.asarray(xq_t[0]), g_qd[f]):
            bad["qd"] += 1
            if first_mismatch is None:
                d = np.abs(np.asarray(xq_t[0]) - g_qd[f])
                first_mismatch = ("qd", f, int(est["lastnz2"][0]), g_lastnz[f],
                                  int(d.argmax()), int(d.max()))
    total_bad = sum(bad.values())
    assert total_bad <= NF // 30, (bad, first_mismatch)
