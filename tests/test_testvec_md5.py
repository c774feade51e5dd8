"""The testvec MD5 gate (testvec/testvecCheck.pl, BASELINE.md north star).

Reproduces the decode half of the ETSI testvector check: for every
operating point (6 rates x EP0/EP4, testvec/Readme.txt:25-36) the fixed
oracle encodes the testvec WAV, our bit-exact decoder decodes it with the
plc_fer.dat erasure pattern, and the MD5 of the decoded WAV must match
testvec/md5_dec.txt (hashes stored minus their first hex digit, per
testvecCheck.pl:214).  The bitstream half (md5_bin.txt) is asserted
against the oracle encoder's output, pinning the rig to the reference.
"""
import hashlib
import struct

import numpy as np
import pytest

from tests import oracle
from audio_codec_tpu.config import Config
from audio_codec_tpu.fixed_decoder import FixedDecoder
from audio_codec_tpu.utils import bitstream_io as bio

pytestmark = pytest.mark.slow

TESTVEC = oracle.REPO / ".oracle/testvec"
EPF = TESTVEC / "plc_fer.dat"

POINTS = [("thetest8", 8000, 32000), ("thetest16", 16000, 32000),
          ("thetest24", 24000, 48000), ("thetest32", 32000, 48000),
          ("thetest44", 44100, 64000), ("thetest48", 48000, 64000)]


def golden(fname, path):
    for line in (TESTVEC / path).read_text().splitlines():
        if line.startswith(fname + ":"):
            return line.split(":")[1].strip()
    raise KeyError(fname)


def wav_bytes(samples: np.ndarray, fs: int) -> bytes:
    """Canonical 44-byte PCM16 mono WAV (tinywaveout_c.h layout)."""
    data = samples.astype("<i2").tobytes()
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, fs, fs * 2, 2, 16)
           + b"data" + struct.pack("<I", len(data)))
    return hdr + data


def decode_point(wav, fs, br, ep):
    cfg = Config(fs_in=fs, bitrate=br, epmode=ep)
    bs = oracle.fx_encode(wav, br, ep_mode=ep)
    # bitstream half of the gate: the oracle encoder must reproduce
    # md5_bin.txt (fixed-point encode is platform bit-exact)
    bin_md5 = hashlib.md5(bs.read_bytes()).hexdigest()[1:]
    assert bin_md5 == golden(f"{wav}_{br}_EP{ep}.lc3plus", "md5_bin.txt"), \
        "oracle encode diverges from reference md5_bin"
    h, frames = bio.read_all(bs)
    n = len(frames)
    bfi = np.resize(np.fromfile(EPF, np.int16), n)
    raw = np.stack([np.frombuffer(x, np.uint8) for x in frames])
    if ep:
        from audio_codec_tpu.ops import fec
        import jax.numpy as jnp
        good = np.nonzero(bfi == 0)[0]
        out = fec.fec_decode(jnp.asarray(raw[good].astype(np.int32)),
                             slot_bytes=raw.shape[1], ccc_flag=0)
        obfi = np.asarray(out["bfi"])
        data = np.asarray(out["data"]).astype(np.uint8)
        dbs = np.asarray(out["data_bytes"])
        assert not obfi.any(), "unexpected FEC failure on clean slots"
        nb = int(dbs[0])
        assert (dbs == nb).all() and nb == cfg.targetBytes
        payload = np.zeros((n, nb), np.uint8)
        payload[good] = data[:, :nb]
    else:
        payload = raw
    dec = FixedDecoder(cfg)
    pcm = dec.decode_plc(payload, bfi).reshape(-1)
    delay = cfg.frame_length - 2 * cfg.la_zeroes
    sig = pcm[delay: delay + h.signal_len]
    if len(sig) < h.signal_len:
        sig = np.pad(sig, (0, h.signal_len - len(sig)))
    return hashlib.md5(wav_bytes(sig, fs)).hexdigest()[1:]


@pytest.mark.parametrize("ep", [0, 4])
@pytest.mark.parametrize("wav,fs,br", POINTS, ids=[p[0] for p in POINTS])
def test_testvec_md5_decode(wav, fs, br, ep):
    got = decode_point(wav, fs, br, ep)
    want = golden(f"{wav}_{br}_EP{ep}.wav", "md5_dec.txt")
    assert got == want, f"MD5 mismatch for {wav} EP{ep}"
