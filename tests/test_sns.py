"""Golden tests: SNS chain vs instrumented ETSI oracle."""
import numpy as np
import jax.numpy as jnp
import pytest

from audio_codec_tpu.config import Config
from audio_codec_tpu.ops import sns
from tests import oracle

CFG = Config(fs_in=16000, bitrate=32000)
NF = 200


@pytest.fixture(scope="module")
def dumps():
    d, _ = oracle.enc_dumps("thetest16", 32000)
    return d


def test_compute_scf(dumps):
    ener = oracle.frames(dumps, "enc_ener", CFG.bands_number)[:NF]
    gold = oracle.frames(dumps, "enc_scf", 16)[:NF]
    att = jnp.zeros(NF, jnp.int32)
    scf = np.asarray(sns.compute_scf(CFG, jnp.asarray(ener), att))
    err = np.abs(scf - gold).max()
    assert err < 2e-4, err


def test_quantize_scf_enc(dumps):
    # feed the ORACLE's scf so this stage is tested in isolation
    scf = oracle.frames(dumps, "enc_scf", 16)[:NF]
    gold_idx = oracle.frames(dumps, "enc_scfidx", 7)[:NF]
    gold_q = oracle.frames(dumps, "enc_scfq", 16)[:NF]
    idx, q = sns.quantize_scf_enc(CFG, jnp.asarray(scf))
    idx, q = np.asarray(idx), np.asarray(q)
    n_mismatch = int((idx != gold_idx).any(axis=1).sum())
    assert n_mismatch <= NF // 50, n_mismatch
    ok = (idx == gold_idx).all(axis=1)
    err = np.abs(q[ok] - gold_q[ok]).max()
    assert err < 1e-5, err


def test_quantize_scf_dec_roundtrip(dumps):
    gold_idx = oracle.frames(dumps, "enc_scfidx", 7)[:NF]
    gold_q = oracle.frames(dumps, "enc_scfq", 16)[:NF]
    q = np.asarray(sns.quantize_scf_dec(jnp.asarray(gold_idx)))
    err = np.abs(q - gold_q).max()
    assert err < 1e-5, err


def test_interpolate_and_shaping(dumps):
    scf_q = oracle.frames(dumps, "enc_scfq", 16)[:NF]
    gold_int = oracle.frames(dumps, "enc_intscf", CFG.bands_number)[:NF]
    g = np.asarray(sns.interpolate_scf(CFG, jnp.asarray(scf_q), encoder_side=True))
    rel = np.abs(g - gold_int) / np.maximum(np.abs(gold_int), 1e-9)
    assert rel.max() < 1e-5, rel.max()

    mdct = oracle.frames(dumps, "enc_mdct", CFG.frame_length)[:NF]
    shaped_gold = oracle.frames(dumps, "enc_shaped", CFG.frame_length)[:NF]
    shaped = np.asarray(sns.mdct_shaping(CFG, jnp.asarray(mdct), jnp.asarray(gold_int)))
    scale = np.abs(shaped_gold).max()
    assert np.abs(shaped - shaped_gold).max() < 1e-6 * scale
