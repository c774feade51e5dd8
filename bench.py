#!/usr/bin/env python3
"""Benchmark: real-time 48 kHz / 10 ms LC3plus encode streams per chip.

Runs the flagship encoder (48 kHz, 10 ms, 64 kbps) over a stream batch on the
available accelerator, measures frames/s, and reports how many concurrent
real-time streams (100 frames/s each) one chip sustains.

Baseline: the reference RTL design targets 8 concurrent 48 kHz channels in
real time on its accelerator (docs/architecture/system_overview.md:139, see
BASELINE.md), so vs_baseline = streams / 8.

Prints exactly one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    from audio_codec_tpu.config import Config
    from audio_codec_tpu.models import encoder, state as S

    cfg = Config(fs_in=48000, bitrate=64000)
    dev = jax.devices()[0]
    # dispatch-amortized defaults (docs/PERF.md: small batches measure
    # dispatch latency, not codec throughput)
    B = int(__import__("os").environ.get("BENCH_STREAMS", "2048"))
    T = int(__import__("os").environ.get("BENCH_FRAMES", "32"))

    @jax.jit
    def block(st, pcm_block):
        def body(st, pcm):
            st, out, _ = encoder.encode_frame(cfg, st, pcm)
            return st, out
        return jax.lax.scan(body, st, pcm_block)

    rng = np.random.default_rng(0)
    pcm = jnp.asarray(
        (rng.standard_normal((T, B, cfg.frame_length)) * 3000.0).astype(np.float32))
    st = S.enc_state_init(cfg, B)
    st = jax.device_put(st, dev)
    pcm = jax.device_put(pcm, dev)

    # warmup / compile
    st2, out = block(st, pcm)
    jax.block_until_ready(out)

    n_iter = 4
    t0 = time.perf_counter()
    for _ in range(n_iter):
        st, out = block(st, pcm)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    frames_per_s = n_iter * T * B / dt
    streams_realtime = frames_per_s / 100.0  # 100 frames/s per 10 ms stream

    # decode-side throughput on the encoder's own bitstream
    from audio_codec_tpu.models import decoder
    dst = S.dec_state_init(cfg, B)
    dst = jax.device_put(dst, dev)

    # decode_block batches the latency-bound entropy phase over all T*B
    # frames at once; only stateful synthesis scans over T (docs/PERF.md)
    @jax.jit
    def dblock(st, frames):
        return decoder.decode_block(cfg, st, frames)

    frames_in = out.astype(jnp.int32)
    dst2, pcm_out = dblock(dst, frames_in)
    jax.block_until_ready(pcm_out)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        dst, pcm_out = dblock(dst, frames_in)
    jax.block_until_ready(pcm_out)
    ddt = time.perf_counter() - t0
    dec_streams = n_iter * T * B / ddt / 100.0

    print(json.dumps({
        "metric": "realtime_48k_encode_streams_per_chip",
        "value": round(streams_realtime, 1),
        "unit": "streams",
        "vs_baseline": round(streams_realtime / 8.0, 2),
        "decode_streams_per_chip": round(dec_streams, 1),
    }))


if __name__ == "__main__":
    main()
