"""Multi-host scale-out: the same stream set encoded on a 2-process
jax.distributed CPU 'pod' is bit-identical to the single-process result
(BASELINE.md north star: 1 chip / 1 host / N hosts is a pure-throughput
variable)."""
from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # spawns 2 JAX processes (own compiles)

import socket
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
FRAMES = 2


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_pod_bit_identical(tmp_path):
    port = _free_port()
    env_base = dict(__import__("os").environ)
    env_base.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests/multihost_worker.py"),
             str(pid), "2", str(port), str(tmp_path), str(FRAMES)],
            env=env_base, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=REPO)
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"WORKER-OK {pid}" in out

    # single-process reference over the identical stream set
    import jax
    import jax.numpy as jnp
    from audio_codec_tpu.config import Config
    from audio_codec_tpu.models import encoder as enc_m
    from audio_codec_tpu.models import state as S

    cfg = Config(fs_in=16000, bitrate=32000)
    B = 8
    st = S.enc_state_init(cfg, B)
    step = jax.jit(lambda s, p: enc_m.encode_frame(cfg, s, p)[:2])
    rng = np.random.default_rng(0)
    for f in range(FRAMES):
        pcm = (rng.standard_normal((B, cfg.frame_length)) * 3000.0
               ).astype(np.float32)
        st, ref = step(st, jnp.asarray(pcm))
        ref = np.asarray(ref)
        rows = sorted(tmp_path.glob(f"p*_f{f}_r*.npy"),
                      key=lambda q: int(q.stem.split("_r")[1]))
        got = np.concatenate([np.load(q) for q in rows])
        assert got.shape == ref.shape, (got.shape, ref.shape)
        np.testing.assert_array_equal(got, ref)
