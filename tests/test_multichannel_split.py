"""Uneven multichannel byte-split decode (setup_dec_lc3.c:203 semantics).

The reference accepts any 20..625-byte-per-channel frame and splits a
group's bytes as floor(n/ch) with the remainder going to the first
channels (setup_enc_lc3.c:192-196).  The float CLI asserts on odd totals
(lc3.c:232), so the odd-split case runs through the fixed-point chain:
the ETSI fixed encoder produces a 51-byte stereo group (26+25 split) and
our bit-exact FixedDecoder must reproduce the ETSI fixed decoder's WAV
sample-for-sample, channel by channel.
"""
import subprocess

import numpy as np
import pytest

from tests import oracle
from audio_codec_tpu.config import Config
from audio_codec_tpu.fixed_decoder import FixedDecoder
from audio_codec_tpu.utils import bitstream_io as bio, wavio

pytestmark = pytest.mark.slow


def test_uneven_stereo_split_decode(tmp_path):
    pcm, _ = wavio.read_wav(oracle.TESTVEC / "thetest16.wav")
    x = pcm[:120 * 160, 0]
    data = np.stack([x, np.roll(x, 7)], 1)      # decorrelated channels
    src = tmp_path / "st.wav"
    wavio.write_wav(src, data, 16000)
    bs = tmp_path / "st.bin"
    ref_wav = tmp_path / "ref.wav"
    bitrate = 51 * 8 * 100                       # 51 bytes -> 26 + 25
    subprocess.run([str(oracle.ORACLE_FX), "-q", "-E", str(src), str(bs),
                    str(bitrate)], check=True, capture_output=True)
    subprocess.run([str(oracle.ORACLE_FX), "-q", "-D", str(bs),
                    str(ref_wav)], check=True, capture_output=True)
    h, frames = bio.read_all(bs)
    assert len(frames[0]) == 51
    cfgs = [Config(fs_in=16000, bitrate=bitrate, channels=2, ch_idx=c)
            for c in range(2)]
    assert [c.targetBytes for c in cfgs] == [26, 25]
    raw = np.stack([np.frombuffer(f, np.uint8) for f in frames])
    outs = []
    off = 0
    for c, cfg in enumerate(cfgs):
        nb = cfg.targetBytes
        outs.append(FixedDecoder(cfg).decode(raw[:, off: off + nb]))
        off += nb
    ours = np.stack([o.reshape(-1) for o in outs], axis=1)
    ref, _ = wavio.read_wav(ref_wav)
    delay = cfgs[0].frame_length - 2 * cfgs[0].la_zeroes
    out = ours[delay: delay + len(ref)]
    np.testing.assert_array_equal(out, ref[: len(out)])
