#!/usr/bin/env python3
"""Benchmark the batched device bit-exact fixed decoder.

Measures real-time 48 kHz decode streams/chip for the DeviceFixedDecoder
(the int64 BASOP chain under jit — ops/fixed_dev.py). Runs in its own
process because it needs jax_enable_x64; bench.py invokes it as a
subprocess and merges the JSON line.

Prints one JSON line:
  {"metric": "fixed_decode_streams_per_chip", "value": ..., ...}
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402

if os.environ.get("LC3TPU_FIXED_BENCH_CPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", str(REPO / ".cache/jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402


def main() -> None:
    from audio_codec_tpu.config import Config
    from audio_codec_tpu.fixed_decoder_dev import DeviceFixedDecoder

    cfg = Config(fs_in=48000, bitrate=64000)
    B = int(os.environ.get("BENCH_FIXED_STREAMS", "256"))
    T = int(os.environ.get("BENCH_FIXED_FRAMES", "8"))
    n_iter = int(os.environ.get("BENCH_FIXED_ITERS", "4"))

    # real bitstream material: encode noise frames with the jitted float
    # encoder once (i32 path works under x64 after the dtype sweep)
    from audio_codec_tpu.models import encoder, state as S
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    pcm = jnp.asarray((rng.standard_normal((T, B, cfg.frame_length))
                       * 3000.0).astype(np.float32))
    st = S.enc_state_init(cfg, B)

    @jax.jit
    def eblock(st, p):
        def body(st, x):
            st, out, _ = encoder.encode_frame(cfg, st, x)
            return st, out
        return jax.lax.scan(body, st, p)

    _, out = eblock(st, pcm)
    frames = np.asarray(out).astype(np.uint8)

    dev = DeviceFixedDecoder(cfg, B=B)
    t0 = time.perf_counter()
    dev.decode_block(frames)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n_iter):
        pcm_out = dev.decode_block(frames)
    dt = (time.perf_counter() - t0) / n_iter
    streams = T * B / dt / 100.0
    device_kind = getattr(jax.devices()[0], "device_kind",
                          jax.devices()[0].platform)
    print(json.dumps({
        "metric": "fixed_decode_streams_per_chip",
        "value": round(streams, 1),
        "unit": "streams",
        "batch": [T, B],
        "block_ms": round(dt * 1e3, 3),
        "compile_s": round(compile_s, 1),
        "device_kind": device_kind,
    }))


if __name__ == "__main__":
    main()
