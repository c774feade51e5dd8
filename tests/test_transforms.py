import numpy as np
import jax.numpy as jnp

from audio_codec_tpu.config import Config
from audio_codec_tpu.ops import transforms
from tests import oracle


def test_mdct_matches_oracle_16k():
    cfg = Config(fs_in=16000, bitrate=32000)
    dumps, _ = oracle.enc_dumps("thetest16", 32000)
    x = oracle.frames(dumps, "enc_in", cfg.frame_length)
    gold = oracle.frames(dumps, "enc_mdct", cfg.frame_length)
    n = 50
    mem = jnp.zeros((1, cfg.frame_length - cfg.la_zeroes), jnp.float32)
    for f in range(n):
        d, mem = transforms.mdct(cfg, jnp.asarray(x[f][None]), mem)
        scale = np.abs(gold[f]).max() + 1e-9
        err = np.abs(np.asarray(d[0]) - gold[f]).max() / scale
        assert err < 2e-6, (f, err)
