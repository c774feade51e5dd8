"""Channel coder (FEC) tests: round-trip, oracle bit-exactness, correction.

Oracle anchor: the fixed-point ETSI encoder applies fec_encoder
(al_fec.c:481) with -epmode N; its output frames must decode through our
fec_decode and re-encode bit-exactly through our fec_encode. Error
correction / bfi semantics follow rs16_detect_and_correct (al_fec.c:1014).
"""
import struct
import subprocess

import numpy as np
import jax.numpy as jnp
import pytest

from audio_codec_tpu.ops import fec
from audio_codec_tpu.utils import bitstream_io as bio
from . import oracle


def _load_frames(path):
    with open(path, "rb") as f:
        bio.read_header(f)
        frames = []
        while True:
            rec = f.read(2)
            if len(rec) < 2:
                break
            n, = struct.unpack("<H", rec)
            frames.append(np.frombuffer(f.read(n), np.uint8))
    return np.stack(frames).astype(np.int32)


def _oracle_ep_bitstream(tmp_path, epmode, bitrate=32000):
    oracle.ensure_oracle()
    out = tmp_path / f"ep{epmode}_{bitrate}.bin"
    subprocess.run(
        [str(oracle.ORACLE_FX), "-E", "-q", "-epmode", str(epmode),
         str(oracle.TESTVEC / "thetest16.wav"), str(out), str(bitrate)],
        check=True, capture_output=True)
    return _load_frames(out)


@pytest.mark.parametrize("slot", [40, 80, 150, 300])
@pytest.mark.parametrize("mode", [1, 2, 3, 4])
def test_fec_roundtrip(slot, mode):
    rng = np.random.default_rng(slot * 7 + mode)
    D = fec.fec_get_data_size(mode, 0, slot)
    data = rng.integers(0, 256, size=(8, D)).astype(np.int32)
    epmr = rng.integers(0, 4, size=(8,)).astype(np.int32)
    enc = fec.fec_encode(jnp.asarray(data), jnp.asarray(epmr),
                         slot_bytes=slot, mode=mode)
    out = fec.fec_decode(enc, slot_bytes=slot)
    np.testing.assert_array_equal(np.asarray(out["mode"]), mode)
    np.testing.assert_array_equal(np.asarray(out["bfi"]), 0)
    np.testing.assert_array_equal(np.asarray(out["data"])[:, :D], data)
    np.testing.assert_array_equal(np.asarray(out["epmr"]), epmr)
    np.testing.assert_array_equal(np.asarray(out["error_report"]),
                                  fec.ALL_OK)
    np.testing.assert_array_equal(np.asarray(out["data_bytes"]), D)


@pytest.mark.parametrize("epmode,bitrate,slot",
                         [(1, 32000, 40), (2, 32000, 40), (3, 32000, 40),
                          (4, 32000, 40), (4, 64000, 80)])
def test_fec_oracle_bit_exact(tmp_path, epmode, bitrate, slot):
    """Decode ETSI-encoded EP frames, then re-encode bit-exactly."""
    F = _oracle_ep_bitstream(tmp_path, epmode, bitrate)[:64]
    assert F.shape[1] == slot
    out = fec.fec_decode(jnp.asarray(F), slot_bytes=slot)
    np.testing.assert_array_equal(np.asarray(out["mode"]), epmode)
    np.testing.assert_array_equal(np.asarray(out["bfi"]), 0)
    D = fec.fec_get_data_size(epmode, 0, slot)
    data = np.asarray(out["data"])[:, :D]
    re = fec.fec_encode(jnp.asarray(data), jnp.asarray(out["epmr"]),
                        slot_bytes=slot, mode=epmode)
    np.testing.assert_array_equal(np.asarray(re), F)


@pytest.mark.parametrize("mode,slot", [(2, 40), (3, 80), (4, 80), (4, 150)])
def test_fec_corrects_symbol_errors(mode, slot):
    """Up to t = (hd-1)/2 nibble errors per codeword are corrected and
    counted in the error report (al_fec.c:1310-1345)."""
    rng = np.random.default_rng(5)
    t = (fec._HD_MODE1[mode] - 1) // 2
    D = fec.fec_get_data_size(mode, 0, slot)
    data = rng.integers(0, 256, size=(4, D)).astype(np.int32)
    epmr = np.zeros(4, np.int32)
    enc = np.asarray(fec.fec_encode(jnp.asarray(data), jnp.asarray(epmr),
                                    slot_bytes=slot, mode=mode))
    ncw = fec.n_codewords(slot)
    n_pccw = fec.fec_get_n_pccw(slot, mode, 0)
    # corrupt t nibbles per codeword via the interleave map, but stay under
    # the slot-40 total-bit-error cap (low_br_max_bit_errors, al_fec.c:760)
    sp = fec._slot_plan(slot)
    nib = np.stack([enc & 15, enc >> 4], -1).reshape(4, -1)
    cws = nib[:, sp["il_dst"]]
    budget = fec._LOW_BR_MAX_BIT_ERRORS[mode] if slot == 40 else 10 ** 9
    spent = 0
    for i in range(ncw - n_pccw):
        for j in range(t):
            if spent + 1 > budget:
                break
            pos = sp["offs"][i] + 2 + j  # inside the codeword
            cws[:, pos] ^= 1 << rng.integers(0, 4)  # single-bit error
            spent += 1
    # re-interleave
    nib2 = cws[:, np.argsort(sp["il_dst"])]
    corrupted = nib2[:, 0::2] | (nib2[:, 1::2] << 4)
    out = fec.fec_decode(jnp.asarray(corrupted.astype(np.int32)),
                         slot_bytes=slot)
    np.testing.assert_array_equal(np.asarray(out["mode"]), mode)
    np.testing.assert_array_equal(np.asarray(out["bfi"]), 0)
    np.testing.assert_array_equal(np.asarray(out["data"])[:, :D], data)
    assert ((np.asarray(out["error_report"]) & fec.BEC_MASK) > 0).all()


def test_fec_heavy_corruption_bfi():
    """More errors than any mode can correct -> bfi = 1, BEC error report."""
    rng = np.random.default_rng(9)
    slot, mode = 80, 2
    D = fec.fec_get_data_size(mode, 0, slot)
    data = rng.integers(0, 256, size=(4, D)).astype(np.int32)
    enc = np.asarray(fec.fec_encode(jnp.asarray(data),
                                    jnp.asarray(np.zeros(4, np.int32)),
                                    slot_bytes=slot, mode=mode))
    noise = rng.integers(0, 256, size=enc.shape).astype(np.int32)
    out = fec.fec_decode(jnp.asarray(enc ^ noise), slot_bytes=slot)
    np.testing.assert_array_equal(np.asarray(out["bfi"]), 1)
    np.testing.assert_array_equal(np.asarray(out["data_bytes"]), 0)


def test_fec_pc_codeword_failure_bfi2():
    """Uncorrectable errors confined to PC codewords -> bfi = 2 with byte
    error positions for partial concealment (al_fec.c:840-870)."""
    rng = np.random.default_rng(11)
    slot, mode = 80, 4
    D = fec.fec_get_data_size(mode, 0, slot)
    n_pccw = fec.fec_get_n_pccw(slot, mode, 0)
    assert n_pccw > 0
    data = rng.integers(0, 256, size=(4, D)).astype(np.int32)
    enc = np.asarray(fec.fec_encode(jnp.asarray(data),
                                    jnp.asarray(np.zeros(4, np.int32)),
                                    slot_bytes=slot, mode=mode))
    sp = fec._slot_plan(slot)
    ncw = sp["ncw"]
    nib = np.stack([enc & 15, enc >> 4], -1).reshape(4, -1)
    cws = nib[:, sp["il_dst"]]
    # destroy the last codeword (a PC codeword) beyond correction
    o = sp["offs"][ncw - 1]
    L = sp["lens"][ncw - 1]
    cws[:, o:o + L] ^= rng.integers(1, 16, size=(4, L))
    nib2 = cws[:, np.argsort(sp["il_dst"])]
    corrupted = (nib2[:, 0::2] | (nib2[:, 1::2] << 4)).astype(np.int32)
    out = fec.fec_decode(jnp.asarray(corrupted), slot_bytes=slot)
    bfi = np.asarray(out["bfi"])
    assert (bfi == 2).all()
    assert (np.asarray(out["be_bp_left"]) >= 0).all()
    assert (np.asarray(out["be_bp_right"]) >
            np.asarray(out["be_bp_left"])).all()
    # non-PC payload region still intact (PC codewords hold the top dw
    # nibbles = the leading payload bytes, fec_data_preproc reversal)
    n_pc = fec.fec_get_n_pc(mode, n_pccw, slot)
    pc_bytes = (n_pc + 1) // 2
    np.testing.assert_array_equal(
        np.asarray(out["data"])[:, pc_bytes:D], data[:, pc_bytes:])


def test_fec_epmr_signaling_survives_errors():
    """EPMR is carried in codeword 0 and recovered (with reduced trust
    encoded as +4/+8 offsets) even from undecodable frames
    (fec_estimate_epmr_from_cw0, al_fec.c:908)."""
    rng = np.random.default_rng(13)
    slot, mode = 80, 4
    D = fec.fec_get_data_size(mode, 0, slot)
    data = rng.integers(0, 256, size=(4, D)).astype(np.int32)
    epmr = np.array([0, 1, 2, 3], np.int32)
    enc = np.asarray(fec.fec_encode(jnp.asarray(data), jnp.asarray(epmr),
                                    slot_bytes=slot, mode=mode))
    noise = rng.integers(0, 256, size=enc.shape).astype(np.int32)
    out = fec.fec_decode(jnp.asarray(enc ^ noise), slot_bytes=slot)
    assert (np.asarray(out["bfi"]) == 1).all()
    assert ((np.asarray(out["epmr"]) >= 0)
            & (np.asarray(out["epmr"]) <= 11)).all()


def test_fec_data_sizes_match_reference_formulas():
    """fec_get_data_size / n_pccw / n_pc cross-checks (al_fec.c:200-357)."""
    assert fec.n_codewords(40) == 6
    assert fec.n_codewords(80) == 11
    assert fec.n_codewords(300) == 40
    # EP2..EP4 remove (mode-1) bytes/cw + CRC1 (+CRC2 when PC active)
    assert fec.fec_get_data_size(0, 0, 100) == 100
    assert fec.fec_get_data_size(1, 0, 40) == 36
    for slot in (40, 80, 160, 300):
        ncw = fec.n_codewords(slot)
        assert sum(fec.codeword_length(slot, i)
                   for i in range(ncw)) == 2 * slot
    assert fec.fec_get_n_pccw(40, 4, 0) == 0  # below PC threshold
    assert fec.fec_get_n_pccw(80, 4, 1) == 0  # combined channel coding
    assert fec.fec_get_n_pccw(80, 4, 0) > 0


def test_engine_epmode_roundtrip():
    """StreamEncoder/StreamDecoder with epmode: channel-coded frames decode
    through the engine, frame loss falls back to PLC (Enc_LC3/Dec_LC3
    framing, enc_lc3.c:283-308, dec_lc3.c:340-400)."""
    from audio_codec_tpu.config import Config
    from audio_codec_tpu.engine import StreamDecoder, StreamEncoder

    cfg = Config(fs_in=16000, bitrate=32000, epmode=2)
    # EP2 @ 40-byte slot: 6 codewords x 1 parity nibble-pair + 2 CRC bytes
    assert cfg.slotBytes == 40 and cfg.targetBytes == 32
    rng = np.random.default_rng(3)
    t = np.arange(10 * cfg.frame_length) / 16000.0
    x = (6000 * np.sin(2 * np.pi * 440 * t)
         + rng.standard_normal(len(t)) * 80).astype(np.float32)
    enc = StreamEncoder(cfg, 1)
    enc.epmr = 1
    dec = StreamDecoder(cfg, 1)
    outs = []
    for f in range(10):
        fr = enc.encode(x[f * cfg.frame_length:(f + 1) * cfg.frame_length][None])
        assert len(fr[0]) == cfg.slotBytes
        lost = f == 6
        outs.append(dec.decode(b"" if lost else fr[0], bfi=lost))
    assert dec.epmr == 1  # EPMR signaled through the channel coder
    y = np.concatenate([o[0] for o in outs]).astype(np.float64)
    d = 40  # 2.5 ms delay
    n = len(y) - d
    snr = 10 * np.log10(np.sum(x[:n] ** 2)
                        / (np.sum((x[:n] - y[d:d + n]) ** 2) + 1e-9))
    assert snr > 10.0, snr
