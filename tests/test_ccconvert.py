"""ccConvert analog: pack/unpack channel coding, byte-exact vs the oracle.

The oracle is the ETSI ccConvert tool (fixed_point/ccConvert.c): pack adds
Reed-Solomon protection (incl. the PC bitstream reorder for EP3/EP4 slots
>= 80 bytes) to an unprotected stream, unpack removes it. Our converter
must produce byte-identical streams in both directions.
"""
from __future__ import annotations

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
    _, f_ours = bio.read_all(ours)
    _, f_ref = bio.read_all(ref)
    assert len(f_ours) == len(f_ref)
    for i, (a, b) in enumerate(zip(f_ours, f_ref)):
        assert a == b, f"frame {i} differs"


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
