"""ccConvert analog: pack/unpack channel coding, byte-exact vs the oracle.

The oracle is the ETSI ccConvert tool (fixed_point/ccConvert.c): pack adds
Reed-Solomon protection (incl. the PC bitstream reorder for EP3/EP4 slots
>= 80 bytes) to an unprotected stream, unpack removes it. Our converter
must produce byte-identical streams in both directions.
"""
from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # full-codec CPU compile / oracle runs

import subprocess

import numpy as np
import pytest

from audio_codec_tpu import ccconvert
from audio_codec_tpu.ops import fec
from audio_codec_tpu.utils import bitstream_io as bio

from . import oracle

CCCONVERT = oracle.ORACLE_FX.parent / "ccConvert"

# (fs, gross slot bytes, epmode): EP3@80 exercises the PC reorder
# (n_pccw=5, n_pc=50); EP2@40 the no-reorder path; EP4@120 a third shape.
POINTS = [
    (16000, 80, 3),
    (16000, 40, 2),
    (16000, 120, 4),
]


def _make_ep0(tmp_path, fs: int, data_bytes: int, n_frames: int = 20):
    """ETSI-encoded unprotected stream whose frames carry data_bytes each."""
    bitrate = data_bytes * 8 * fs // (fs // 100)
    wav = oracle.TESTVEC / f"thetest{fs // 1000}.wav"
    out = tmp_path / f"ep0_{fs}_{data_bytes}.bin"
    subprocess.run([str(oracle.ORACLE_FX), "-q", "-E", str(wav), str(out),
                    str(bitrate)], check=True, capture_output=True)
    h, frames = bio.read_all(out)
    assert all(len(f) == data_bytes for f in frames[:n_frames])
    bio.write_all(out, h, frames[:n_frames])
    return out


@pytest.fixture(scope="module", autouse=True)
def _need_ccconvert():
    oracle.ensure_oracle()
    if not CCCONVERT.exists():
        subprocess.run(["bash", str(oracle.REPO / "tools/build_oracle.sh")],
                       check=True, capture_output=True)


@pytest.mark.parametrize("fs,gross,epmode", POINTS)
def test_pack_matches_oracle(tmp_path, fs, gross, epmode):
    data_bytes = fec.fec_get_data_size(epmode, 0, gross)
    ep0 = _make_ep0(tmp_path, fs, data_bytes)
    ours = tmp_path / "ours.bin"
    ref = tmp_path / "ref.bin"
    ccconvert.main(["-pack", str(gross), str(epmode), str(ep0), str(ours)])
    subprocess.run([str(CCCONVERT), "-pack", str(gross), str(epmode),
                    str(ep0), str(ref)], check=True, capture_output=True)
    # whole-file comparison: the 18-byte header (incl. the verbatim epmode
    # word, ccConvert.c:353-362) and every frame must be byte-identical
    assert ours.read_bytes() == ref.read_bytes()


@pytest.mark.parametrize("fs,gross,epmode", POINTS)
def test_unpack_matches_oracle_and_roundtrips(tmp_path, fs, gross, epmode):
    data_bytes = fec.fec_get_data_size(epmode, 0, gross)
    ep0 = _make_ep0(tmp_path, fs, data_bytes)
    packed = tmp_path / "packed.bin"
    subprocess.run([str(CCCONVERT), "-pack", str(gross), str(epmode),
                    str(ep0), str(packed)], check=True, capture_output=True)

    # our unpack of the oracle-packed stream restores the original frames
    ours = tmp_path / "unpacked.bin"
    ccconvert.main(["-unpack", str(packed), str(ours)])
    _, f_orig = bio.read_all(ep0)
    _, f_ours = bio.read_all(ours)
    assert len(f_ours) == len(f_orig)
    for i, (a, b) in enumerate(zip(f_ours, f_orig)):
        assert a == b, f"frame {i} differs"

    # and our own pack -> oracle unpack round-trips too
    ours_packed = tmp_path / "ours_packed.bin"
    ref_unpacked = tmp_path / "ref_unpacked.bin"
    ccconvert.main(["-pack", str(gross), str(epmode), str(ep0),
                    str(ours_packed)])
    subprocess.run([str(CCCONVERT), "-unpack", str(ours_packed),
                    str(ref_unpacked)], check=True, capture_output=True)
    _, f_ref = bio.read_all(ref_unpacked)
    for i, (a, b) in enumerate(zip(f_ref, f_orig)):
        assert a == b, f"frame {i} differs after oracle unpack"


def test_pack_unpack_stereo_ccc(tmp_path):
    """channels > 1 with total slot <= 160 bytes must use combined channel
    coding (dec_lc3.c:343); pack -> unpack round-trips and our EP decoder
    (whose Config derives ccc=1) can decode the packed stream."""
    from audio_codec_tpu.config import Config
    from audio_codec_tpu.engine import StreamDecoder, StreamEncoder

    fs, gross, epmode = 16000, 40, 2           # 2*40 = 80 <= 160 -> ccc
    total_slot = 2 * gross
    data_total = fec.fec_get_data_size(epmode, 1, total_slot)
    bitrate = total_slot * 8 * fs // (fs // 100)

    # build a stereo EP0 stream with our encoder at the matching data rate
    ep0_rate = data_total * 8 * fs // (fs // 100)
    cfg0 = Config(fs_in=fs, bitrate=ep0_rate, channels=2)
    assert sum(c.targetBytes for c in cfg0.channel_configs()) == data_total
    enc = StreamEncoder(cfg0, n_streams=2)
    rng = np.random.default_rng(7)
    n_frames = 8
    frames = []
    for _ in range(n_frames):
        pcm = rng.integers(-2000, 2000, (2, cfg0.frame_length)).astype(np.int16)
        frames.append(b"".join(enc.encode(pcm)))
    h = bio.StreamHeader(samplerate=fs, bitrate=ep0_rate, channels=2,
                         frame_ms=10.0, epmode=0, signal_len=0)

    packed = ccconvert.pack_frames(h, frames, gross, epmode)
    assert all(len(p) == total_slot for p in packed)

    unpacked, n_bad = ccconvert.unpack_frames(
        bio.StreamHeader(samplerate=fs, bitrate=bitrate, channels=2,
                         frame_ms=10.0, epmode=epmode, signal_len=0), packed)
    assert n_bad == 0
    assert unpacked == frames

    # a real EP decoder must accept the packed stream (ccc engages)
    cfg_ep = Config(fs_in=fs, bitrate=bitrate, channels=2, epmode=epmode)
    assert cfg_ep.ccc == 1
    dec = StreamDecoder(cfg_ep, n_streams=2)
    pcm = dec.decode(packed[0], bfi=False)
    assert pcm.shape == (2, cfg_ep.frame_length)
    assert dec.error_report is not None


def test_unpack_corrupted_frame_keeps_good_channels(tmp_path):
    """A channel that fails FEC decode contributes nothing while decoded
    channels are kept (reference binary path writes whatever fec_decoder
    produced, ccConvert.c:195-240)."""
    fs, gross, epmode = 16000, 40, 2
    data_bytes = fec.fec_get_data_size(epmode, 0, gross)
    ep0 = _make_ep0(tmp_path, fs, data_bytes, n_frames=4)
    h, frames = bio.read_all(ep0)
    # stereo-ify: duplicate each frame across two channels; 2*40=80 <= 160
    # would select ccc, so force the per-channel path with a larger slot
    gross2 = 100
    db2 = fec.fec_get_data_size(epmode, 0, gross2)
    ep0b = _make_ep0(tmp_path, fs, db2, n_frames=4)
    h2, f2 = bio.read_all(ep0b)
    stereo = [a + a for a in f2]
    sh = bio.StreamHeader(samplerate=fs, bitrate=h2.bitrate * 2, channels=2,
                          frame_ms=10.0, epmode=0, signal_len=h2.signal_len)
    packed = ccconvert.pack_frames(sh, stereo, gross2, epmode)
    # annihilate channel 0 of frame 1 (beyond any RS correction; random
    # bytes, not zeros — the all-zero slot is a valid codeword)
    bad = bytearray(packed[1])
    bad[:gross2] = np.random.default_rng(3).integers(
        0, 256, gross2, dtype=np.uint8).tobytes()
    packed[1] = bytes(bad)
    ph = bio.StreamHeader(samplerate=fs, bitrate=h2.bitrate * 2, channels=2,
                          frame_ms=10.0, epmode=epmode,
                          signal_len=h2.signal_len)
    out, n_bad = ccconvert.unpack_frames(ph, packed)
    assert n_bad == 1
    assert out[0] == stereo[0]
    assert out[1] == f2[1]          # channel 1 survives alone
    assert out[2:] == stereo[2:]
