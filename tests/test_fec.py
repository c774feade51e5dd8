"""Channel coder (FEC) tests: round-trip, oracle bit-exactness, correction.

Oracle anchor: the fixed-point ETSI encoder applies fec_encoder
(al_fec.c:481) with -epmode N; its output frames must decode through our
fec_decode and re-encode bit-exactly through our fec_encode. Error
correction / bfi semantics follow rs16_detect_and_correct (al_fec.c:1014).
"""

import pytest

pytestmark = pytest.mark.slow  # full-codec CPU compile / oracle runs

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


def _stereo_wav(tmp_path):
    """Duplicate thetest16.wav into a 2-channel file for ccc tests."""
    import wave
    src = oracle.TESTVEC / "thetest16.wav"
    with wave.open(str(src), "rb") as w:
        fs = w.getframerate()
        pcm = np.frombuffer(w.readframes(w.getnframes()), np.int16)
    dst = tmp_path / "stereo16.wav"
    inter = np.stack([pcm, pcm], -1).reshape(-1)
    with wave.open(str(dst), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(fs)
        w.writeframes(inter.tobytes())
    return dst, fs


def test_fec_ccc_oracle_bit_exact(tmp_path):
    """Combined channel coding (stereo, total slot <= 160 bytes): one FEC
    slot spans both channel payloads (Enc_LC3, enc_lc3.c:303-313). ETSI
    stereo EP2 frames decode with ccc_flag=1 and re-encode bit-exactly."""
    oracle.ensure_oracle()
    wav, _fs = _stereo_wav(tmp_path)
    out = tmp_path / "ccc.bin"
    subprocess.run(
        [str(oracle.ORACLE_FX), "-E", "-q", "-epmode", "2",
         str(wav), str(out), "64000"],
        check=True, capture_output=True)
    F = _load_frames(out)[:32]
    slot = F.shape[1]
    assert slot == 80  # 64 kbps * 10 ms / 8 = 80 bytes total, <= 160 -> ccc
    res = fec.fec_decode(jnp.asarray(F), slot_bytes=slot, ccc_flag=1)
    np.testing.assert_array_equal(np.asarray(res["mode"]), 2)
    np.testing.assert_array_equal(np.asarray(res["bfi"]), 0)
    D = fec.fec_get_data_size(2, 1, slot)
    np.testing.assert_array_equal(np.asarray(res["data_bytes"]), D)
    data = np.asarray(res["data"])[:, :D]
    re = fec.fec_encode(jnp.asarray(data), jnp.asarray(res["epmr"]),
                        slot_bytes=slot, mode=2, ccc_flag=1)
    np.testing.assert_array_equal(np.asarray(re), F)


def test_engine_ccc_roundtrip():
    """Stereo EP2 @ 64 kbps emits ONE combined 80-byte slot per frame (not
    2 x 80) whose payload splits across channels (setup_enc_lc3.c:174-196),
    and the engine decodes it back."""
    from audio_codec_tpu.config import Config
    from audio_codec_tpu.engine import StreamDecoder, StreamEncoder

    cfg = Config(fs_in=16000, bitrate=64000, channels=2, epmode=2)
    assert cfg.ccc == 1 and cfg.slotBytes == 80
    D = fec.fec_get_data_size(2, 1, 80)
    cfgs = cfg.channel_configs()
    assert sum(c.targetBytes for c in cfgs) == D
    rng = np.random.default_rng(21)
    t = np.arange(10 * cfg.frame_length) / 16000.0
    x = (6000 * np.sin(2 * np.pi * 330 * t)
         + rng.standard_normal(len(t)) * 60).astype(np.float32)
    pcm = np.stack([x, 0.7 * x])  # [2 lanes = 2 channels, T]
    enc = StreamEncoder(cfg, 2)
    enc.epmr = 2
    dec = StreamDecoder(cfg, 2)
    outs = []
    for f in range(10):
        blk = pcm[:, f * cfg.frame_length:(f + 1) * cfg.frame_length]
        frames = enc.encode(blk)
        assert len(frames) == 1 and len(frames[0]) == 80  # one joint slot
        outs.append(dec.decode(frames[0]))
    assert dec.epmr == 2
    y = np.concatenate(outs, axis=1).astype(np.float64)
    d = 40
    n = y.shape[1] - d
    for c, scale in ((0, 1.0), (1, 0.7)):
        ref = scale * x[:n]
        snr = 10 * np.log10(np.sum(ref ** 2)
                            / (np.sum((ref - y[c, d:d + n]) ** 2) + 1e-9))
        assert snr > 10.0, (c, snr)


def test_config_ep_validation():
    """Slot-byte bounds + epmode range are rejected at setup
    (LC3_BITRATE_ERROR, setup_enc_lc3.c:164-172)."""
    from audio_codec_tpu.config import Config
    with pytest.raises(ValueError, match="slot"):
        Config(fs_in=16000, bitrate=16000, epmode=2)   # 20-byte slot < 40
    with pytest.raises(ValueError, match="epmode"):
        Config(fs_in=16000, bitrate=32000, epmode=5)
    with pytest.raises(ValueError, match="slot"):
        Config(fs_in=48000, bitrate=640000, epmode=1)  # 800-byte slot > 300
    # boundary values are accepted
    assert Config(fs_in=16000, bitrate=32000, epmode=4).slotBytes == 40


def _nibbles(enc, sp):
    nib = np.stack([enc & 15, enc >> 4], -1).reshape(enc.shape[0], -1)
    return nib[:, sp["il_dst"]]


def _pack(cws, sp):
    nib2 = cws[:, np.argsort(sp["il_dst"])]
    return (nib2[:, 0::2] | (nib2[:, 1::2] << 4)).astype(np.int32)


def test_fec_pc_span_narrow_vs_full():
    """be_bp_left/right derive from the real per-codeword trust flags even
    when bfi=2 came from the CRC2 check alone (al_fec.c:840-870): the risk
    check (al_fec.c:1441-1444) clears trust without setting bfi, so a
    CRC2-only failure can still carry a narrowed error span."""
    rng = np.random.default_rng(31)
    slot, mode = 80, 3
    D = fec.fec_get_data_size(mode, 0, slot)
    n_pccw = fec.fec_get_n_pccw(slot, mode, 0)
    n_pc = fec.fec_get_n_pc(mode, n_pccw, slot)
    pc_nib = [fec.fec_get_n_pc(mode, k, slot) for k in range(n_pccw + 1)]
    sp = fec._slot_plan(slot)
    ncw = sp["ncw"]
    data = rng.integers(0, 256, size=(4, D)).astype(np.int32)
    epmr = np.zeros(4, np.int32)
    enc = np.asarray(fec.fec_encode(jnp.asarray(data), jnp.asarray(epmr),
                                    slot_bytes=slot, mode=mode))
    # Splice in a VALID codeword encoding different data for PC codeword
    # ncw-1 (trust index 0, covering payload bytes 0..pc_nib[1]/2-1): RS
    # sees zero errors, but the CRC2 hash over the PC payload region fails
    # -> bfi=2 via the CRC2-only path with all trust flags clean.
    data2 = data.copy()
    data2[:, 1] ^= 0x5A
    enc2 = np.asarray(fec.fec_encode(jnp.asarray(data2), jnp.asarray(epmr),
                                     slot_bytes=slot, mode=mode))
    cws = _nibbles(enc, sp)
    cws2 = _nibbles(enc2, sp)
    o, L = sp["offs"][ncw - 1], sp["lens"][ncw - 1]
    spliced = cws.copy()
    spliced[:, o:o + L] = cws2[:, o:o + L]
    out = fec.fec_decode(jnp.asarray(_pack(spliced, sp)), slot_bytes=slot)
    assert (np.asarray(out["bfi"]) == 2).all()
    # all trust flags clean -> full PC span (first_bad == n_pccw case)
    np.testing.assert_array_equal(np.asarray(out["be_bp_left"]), 0)
    np.testing.assert_array_equal(np.asarray(out["be_bp_right"]),
                                  4 * n_pc - 1)
    # Additionally flip ONE nibble in PC codeword ncw-3 (trust index 2):
    # RS corrects it (deg 1 <= t) but the risk exponent -9 > -16 clears
    # its trust flag -> the span narrows to that codeword's PC range.
    o3 = sp["offs"][ncw - 3]
    spliced[:, o3 + 3] ^= 0x5
    out = fec.fec_decode(jnp.asarray(_pack(spliced, sp)), slot_bytes=slot)
    assert (np.asarray(out["bfi"]) == 2).all()
    np.testing.assert_array_equal(np.asarray(out["be_bp_left"]),
                                  4 * pc_nib[2])
    np.testing.assert_array_equal(np.asarray(out["be_bp_right"]),
                                  4 * pc_nib[3] - 1)


def test_engine_ep4_pc_reorder_roundtrip(tmp_path):
    """EP4 at an 80-byte slot carries PC codewords (n_pc > 0): the encoder
    reorders the core payload (processReorderBitstream_fx) and the decoder
    undoes the block swap inside the PC-aware arithmetic decode
    (check_pc_bytes pointer jumps). Engine roundtrip + ETSI interop."""
    import subprocess
    from audio_codec_tpu.config import Config
    from audio_codec_tpu.engine import StreamDecoder, StreamEncoder
    from audio_codec_tpu.utils import bitstream_io as bio

    cfg = Config(fs_in=16000, bitrate=64000, epmode=4)
    assert cfg.slotBytes == 80 and cfg.n_pc > 0 and cfg.n_pccw > 0
    rng = np.random.default_rng(41)
    t = np.arange(12 * cfg.frame_length) / 16000.0
    x = (7000 * np.sin(2 * np.pi * 520 * t) * (1 + 0.3 * np.sin(2 * np.pi * 3 * t))
         + rng.standard_normal(len(t)) * 120).astype(np.float32)
    enc = StreamEncoder(cfg, 1)
    enc.epmr = 3
    dec = StreamDecoder(cfg, 1)
    frames, outs = [], []
    for f in range(12):
        fr = enc.encode(x[f * cfg.frame_length:(f + 1) * cfg.frame_length][None])
        assert len(fr[0]) == 80
        frames.append(fr[0])
        outs.append(dec.decode(fr[0]))
    assert dec.epmr == 3
    y = np.concatenate([o[0] for o in outs]).astype(np.float64)
    d = 40
    n = len(y) - d
    snr = 10 * np.log10(np.sum(x[:n] ** 2)
                        / (np.sum((x[:n] - y[d:d + n]) ** 2) + 1e-9))
    assert snr > 10.0, snr

    # interop: the ETSI fixed-point decoder must accept our EP4 frames
    oracle.ensure_oracle()
    path = tmp_path / "ep4.bin"
    bio.write_all(path, bio.StreamHeader(samplerate=16000, bitrate=64000,
                                         channels=1, frame_ms=10.0, epmode=1,
                                         signal_len=12 * cfg.frame_length),
                  frames)
    out_wav = tmp_path / "ep4_etsi.wav"
    dbg = tmp_path / "dbg"
    r = subprocess.run([str(oracle.ORACLE_FX), "-q", "-D",
                        "-ep_dbg", str(dbg), str(path), str(out_wav), "16"],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    bfi_dump = np.fromfile(f"{dbg}.bfi", dtype="<i2")
    assert (bfi_dump == 0).all(), bfi_dump
    ref, _ = oracle.read_wav_mono(out_wav)
    ref = np.ravel(ref)[:n].astype(np.float64)
    m = min(len(ref), n)
    corr = np.corrcoef(ref[:m], y[d:d + m])[0, 1]
    assert corr > 0.99, corr


def test_engine_ep4_partial_concealment():
    """Destroying one PC codeword of an EP4 frame yields bfi=2: the decoder
    synthesizes only the suspect spectral region from the previous frame
    (processPCmain_fx) instead of dropping the whole frame."""
    from audio_codec_tpu.config import Config
    from audio_codec_tpu.engine import StreamDecoder, StreamEncoder

    cfg = Config(fs_in=16000, bitrate=64000, epmode=4)
    rng = np.random.default_rng(43)
    t = np.arange(12 * cfg.frame_length) / 16000.0
    x = (6000 * np.sin(2 * np.pi * 330 * t)
         + rng.standard_normal(len(t)) * 100).astype(np.float32)
    enc = StreamEncoder(cfg, 1)
    dec = StreamDecoder(cfg, 1)
    sp = fec._slot_plan(80)
    outs = []
    for f in range(12):
        fr = enc.encode(x[f * cfg.frame_length:(f + 1) * cfg.frame_length][None])[0]
        if f == 7:
            # destroy the last (PC) codeword beyond correction
            F = np.frombuffer(fr, np.uint8).astype(np.int32)[None]
            cws = _nibbles(F, sp)
            o, L = sp["offs"][sp["ncw"] - 1], sp["lens"][sp["ncw"] - 1]
            cws[:, o:o + L] ^= rng.integers(1, 16, size=(1, L))
            fr = _pack(cws, sp).astype(np.uint8).tobytes()
        outs.append(dec.decode(fr))
    y = np.concatenate([o[0] for o in outs]).astype(np.float64)
    d = 40
    n = len(y) - d
    snr = 10 * np.log10(np.sum(x[:n] ** 2)
                        / (np.sum((x[:n] - y[d:d + n]) ** 2) + 1e-9))
    # partial concealment keeps the stream usable through the corrupt frame
    assert snr > 8.0, snr


def test_engine_ep4_decodes_oracle_stream(tmp_path):
    """ETSI-encoded EP4 frames (with the reference's bitstream reorder)
    decode through our engine sample-close to the ETSI decoder."""
    import subprocess
    from audio_codec_tpu.config import Config
    from audio_codec_tpu.engine import StreamDecoder

    oracle.ensure_oracle()
    out = tmp_path / "ref_ep4.bin"
    subprocess.run(
        [str(oracle.ORACLE_FX), "-E", "-q", "-epmode", "4",
         str(oracle.TESTVEC / "thetest16.wav"), str(out), "64000"],
        check=True, capture_output=True)
    F = _load_frames(out)[:30]
    assert F.shape[1] == 80
    wav_ref = tmp_path / "ref_ep4.wav"
    subprocess.run([str(oracle.ORACLE_FX), "-q", "-D", str(out),
                    str(wav_ref), "16"], check=True, capture_output=True)
    ref, _ = oracle.read_wav_mono(wav_ref)
    ref = np.ravel(ref)

    cfg = Config(fs_in=16000, bitrate=64000, epmode=4)
    dec = StreamDecoder(cfg, 1)
    outs = [dec.decode(F[i].astype(np.uint8).tobytes()) for i in range(30)]
    y = np.concatenate([o[0] for o in outs]).astype(np.float64)
    d = 40  # ETSI decoder output is delay-compensated; ours is raw
    n = min(len(ref), len(y) - d) - 10
    corr = np.corrcoef(ref[:n], y[d:d + n])[0, 1]
    assert corr > 0.9999, corr
