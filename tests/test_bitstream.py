"""Golden tests: side-info packing + arithmetic codec vs oracle, bit-exact.

Feeds the oracle's own intermediate values into the bitstream layer so any
byte diff is a bitstream bug, not an upstream decision diff.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audio_codec_tpu.config import Config
from audio_codec_tpu.ops import ari, bits
from tests import oracle

CFG = Config(fs_in=16000, bitrate=32000)
NF = 200


@pytest.fixture(scope="module")
def dumps():
    d, _ = oracle.enc_dumps("thetest16", 32000)
    return d


def _oracle_inputs(d, nf):
    nb = CFG.targetBytes
    g = dict(
        qd=oracle.frames(d, "enc_qd", CFG.yLen)[:nf],
        lastnz=oracle.frames(d, "enc_lastnz", 1)[:nf, 0],
        lsb=oracle.frames(d, "enc_lsbMode", 1)[:nf, 0],
        gg=oracle.frames(d, "enc_gg2", 1)[:nf, 0],
        bw=oracle.frames(d, "enc_bwidx", 1)[:nf, 0],
        tns_order=oracle.frames(d, "enc_tns_order", 2)[:nf],
        tns_idx=oracle.frames(d, "enc_tns_idx", 16)[:nf].reshape(nf, 2, 8),
        tns_nf=oracle.frames(d, "enc_tns_nf", 1)[:nf, 0],
        ltpf=oracle.frames(d, "enc_ltpf_param", 3)[:nf],
        scfidx=oracle.frames(d, "enc_scfidx", 7)[:nf],
        facns=oracle.frames(d, "enc_facns", 1)[:nf, 0],
        nres=oracle.frames(d, "enc_numResBits", 1)[:nf, 0],
        resbytes=oracle.frames(d, "enc_resBits", 80)[:nf],
        side_bytes=oracle.frames(d, "enc_side_bytes", nb)[:nf],
        bp_side=oracle.frames(d, "enc_bp_side", 1)[:nf, 0],
        mask_side=oracle.frames(d, "enc_mask_side", 1)[:nf, 0],
        bytes=oracle.frames(d, "enc_bytes", nb)[:nf],
    )
    return g


def test_pack_side_info(dumps):
    g = _oracle_inputs(dumps, NF)
    buf = jnp.zeros((NF, CFG.targetBytes), jnp.int32)
    buf, bp, mask = bits.pack_side_info(
        CFG, buf, jnp.asarray(g["bw"]), jnp.asarray(g["lastnz"]),
        jnp.asarray(g["lsb"]), jnp.asarray(g["gg"]), jnp.asarray(g["tns_nf"]),
        jnp.asarray(g["tns_order"]), jnp.asarray(g["ltpf"]),
        jnp.asarray(g["scfidx"]), jnp.asarray(g["facns"]))
    assert np.array_equal(np.asarray(bp), g["bp_side"]), "bp_side mismatch"
    assert np.array_equal(np.asarray(mask), g["mask_side"]), "mask_side mismatch"
    assert np.array_equal(np.asarray(buf), g["side_bytes"]), \
        np.argwhere(np.asarray(buf) != g["side_bytes"])[:5]


def test_ari_encode_bit_exact(dumps):
    g = _oracle_inputs(dumps, NF)
    # unpack oracle residual bytes to bit array [NF, 640]
    res_bits = ((g["resbytes"][:, :, None] >> np.arange(8)[None, None, :]) & 1)
    res_bits = res_bits.reshape(NF, 640)[:, : CFG.yLen].astype(np.int32)

    buf = jnp.asarray(g["side_bytes"], jnp.int32)
    out = ari.encode(
        CFG, buf, jnp.asarray(g["bp_side"]), jnp.asarray(g["mask_side"]),
        jnp.asarray(g["qd"]), jnp.asarray(g["tns_order"]),
        jnp.asarray(g["tns_idx"]), jnp.asarray(g["tns_nf"]),
        jnp.asarray(g["lastnz"]), jnp.asarray(g["lsb"]),
        jnp.asarray(res_bits), jnp.asarray(g["nres"]))
    out = np.asarray(out)
    nbad = int((out != g["bytes"]).any(axis=1).sum())
    if nbad:
        f = int(np.argwhere((out != g["bytes"]).any(axis=1))[0][0])
        db = np.argwhere(out[f] != g["bytes"][f]).ravel()
        raise AssertionError((nbad, f, db[:10], out[f][db[:5]], g["bytes"][f][db[:5]]))


def test_ari_decode_roundtrip(dumps):
    g = _oracle_inputs(dumps, NF)
    buf = jnp.asarray(g["bytes"], jnp.int32)
    side = bits.parse_side_info(CFG, buf)
    assert int(np.asarray(side["bfi"]).sum()) == 0
    assert np.array_equal(np.asarray(side["gg_idx"]), g["gg"])
    assert np.array_equal(np.asarray(side["lastnz"]), g["lastnz"])
    assert np.array_equal(np.asarray(side["scf_idx"]), g["scfidx"])
    assert np.array_equal(np.asarray(side["ltpf_param"]), g["ltpf"])
    assert np.array_equal(np.asarray(side["fac_ns_idx"]), g["facns"])
    dec = ari.decode(CFG, buf, side)
    assert int(np.asarray(dec["bfi"]).sum()) == 0, np.asarray(dec["bfi"]).sum()
    assert np.array_equal(np.asarray(dec["tns_order"]), g["tns_order"])
    x = np.asarray(dec["x"])
    nbad = int((x != g["qd"]).any(axis=1).sum())
    if nbad:
        f = int(np.argwhere((x != g["qd"]).any(axis=1))[0][0])
        db = np.argwhere(x[f] != g["qd"][f]).ravel()
        raise AssertionError((nbad, f, db[:10], x[f][db[:5]], g["qd"][f][db[:5]]))
