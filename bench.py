#!/usr/bin/env python3
"""Benchmark: real-time 48 kHz / 10 ms LC3plus encode + decode streams per chip.

Runs the flagship encoder (48 kHz, 10 ms, 64 kbps) over a stream batch on the
available accelerator, measures frames/s, and reports how many concurrent
real-time streams (100 frames/s each) one chip sustains. The decode path is
measured on the encoder's own bitstream via decoder.decode_block.

Measurement protocol (docs/PERF.md):
  * the state-feedback loop is warmed up with the *stepped* state (not just
    the init state) before timing — the stepped state can carry a different
    jit signature, and timing the resulting recompile produced round 4's
    bogus 71-streams decode figure;
  * per-iteration wall times are recorded; the headline uses the median,
    and min/median are emitted for variance grounding;
  * device kind, XLA cost-analysis FLOPs/frame, achieved FLOP/s and an MFU
    estimate vs the chip's documented peak are emitted so the number can be
    checked against hardware limits.

Baseline: the reference RTL design targets 8 concurrent 48 kHz channels in
real time on its accelerator (docs/architecture/system_overview.md:139, see
BASELINE.md), so vs_baseline = streams / 8.

Prints exactly one JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""
import json
import os
import statistics
import time

import numpy as np

# documented peak dense-matmul throughput per device kind (FLOP/s); used only
# for the MFU *estimate* in the grounding fields. bf16 systolic peak.
_PEAK_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def _timed_loop(fn, n_iter, *args):
    """Run fn n_iter times with state feedback (like a real serving loop).

    Two measurements:
      * pipelined: all n_iter calls queued, one block at the end — the
        throughput a serving loop sees (dispatch overlaps device compute);
      * per-iteration: block after every call — grounds the variance
        (min/median) and exposes host->device round-trip latency.
    """
    import jax
    carry = args[0]
    rest = args[1:]
    out = None
    t0 = time.perf_counter()
    for _ in range(n_iter):
        carry, out = fn(carry, *rest)
    jax.block_until_ready(out)
    pipelined = (time.perf_counter() - t0) / n_iter

    times = []
    carry = args[0]
    for _ in range(n_iter):
        t0 = time.perf_counter()
        carry, out = fn(carry, *rest)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return pipelined, times, carry, out


def main() -> None:
    import jax
    import jax.numpy as jnp
    from audio_codec_tpu.config import Config
    from audio_codec_tpu.models import decoder, encoder, state as S

    cfg = Config(fs_in=48000, bitrate=64000)
    dev = jax.devices()[0]
    device_kind = getattr(dev, "device_kind", dev.platform)
    # dispatch-amortized defaults (docs/PERF.md: small batches measure
    # dispatch latency, not codec throughput)
    B = int(os.environ.get("BENCH_STREAMS", "2048"))
    T = int(os.environ.get("BENCH_FRAMES", "32"))
    n_iter = int(os.environ.get("BENCH_ITERS", "8"))

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

    # warmup: compile for the init-state signature AND the stepped-state
    # signature (they must match — tests/test_engine_state.py guards this —
    # but if they ever diverge the recompile lands here, not in the timing)
    st_w, out = block(st, pcm)
    st_w2, out = block(st_w, pcm)
    jax.block_until_ready(out)

    enc_pipe, enc_times, _, out = _timed_loop(block, n_iter, st, pcm)
    enc_med = statistics.median(enc_times)
    frames_per_s = T * B / enc_pipe
    streams_realtime = frames_per_s / 100.0  # 100 frames/s per 10 ms stream

    # XLA's own cost model for the compiled encode block -> FLOPs/frame
    try:
        ca = block.lower(st, pcm).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        enc_flops_block = float(ca.get("flops", 0.0))
    except Exception:
        enc_flops_block = 0.0
    enc_flops_per_s = enc_flops_block / enc_pipe if enc_flops_block else 0.0
    peak = _PEAK_FLOPS.get(device_kind)
    enc_mfu = (enc_flops_per_s / peak) if peak and enc_flops_per_s else None

    # ---- decode-side throughput on the encoder's own bitstream ----
    dst = S.dec_state_init(cfg, B)
    dst = jax.device_put(dst, dev)

    @jax.jit
    def dblock(st, frames):
        return decoder.decode_block(cfg, st, frames)

    frames_in = out.astype(jnp.int32)
    dst_w, pcm_out = dblock(dst, frames_in)
    dst_w2, pcm_out = dblock(dst_w, frames_in)   # stepped-state signature
    jax.block_until_ready(pcm_out)

    dec_pipe, dec_times, _, pcm_out = _timed_loop(dblock, n_iter, dst, frames_in)
    dec_med = statistics.median(dec_times)
    dec_streams = T * B / dec_pipe / 100.0
    try:
        ca = dblock.lower(dst, frames_in).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        dec_flops_block = float(ca.get("flops", 0.0))
    except Exception:
        dec_flops_block = 0.0
    dec_flops_per_s = dec_flops_block / dec_pipe if dec_flops_block else 0.0
    dec_mfu = (dec_flops_per_s / peak) if peak and dec_flops_per_s else None

    # bit-exact fixed decoder (device int64 path) — separate process
    # (needs jax_enable_x64); omitted gracefully on timeout/failure
    fixed_dec_streams = None
    fixed_extra = {}
    try:
        import subprocess
        import sys as _sys
        r = subprocess.run(
            [_sys.executable, "tools/bench_fixed_dev.py"],
            capture_output=True, text=True, timeout=1500,
            cwd=__import__("pathlib").Path(__file__).resolve().parent)
        for line in r.stdout.splitlines():
            if line.startswith("{"):
                row = json.loads(line)
                fixed_dec_streams = row.get("value")
                fixed_extra = {"fixed_decode_block_ms": row.get("block_ms"),
                               "fixed_decode_compile_s": row.get("compile_s")}
    except Exception:
        pass

    print(json.dumps({
        "metric": "realtime_48k_encode_streams_per_chip",
        "value": round(streams_realtime, 1),
        "unit": "streams",
        "vs_baseline": round(streams_realtime / 8.0, 2),
        "decode_streams_per_chip": round(dec_streams, 1),
        "device_kind": device_kind,
        "batch": [T, B],
        "iters": n_iter,
        "encode_ms_pipelined": round(enc_pipe * 1e3, 3),
        "encode_ms_min": round(min(enc_times) * 1e3, 3),
        "encode_ms_median": round(enc_med * 1e3, 3),
        "decode_ms_pipelined": round(dec_pipe * 1e3, 3),
        "decode_ms_min": round(min(dec_times) * 1e3, 3),
        "decode_ms_median": round(dec_med * 1e3, 3),
        "encode_flops_per_frame": round(enc_flops_block / (T * B)) if enc_flops_block else None,
        "decode_flops_per_frame": round(dec_flops_block / (T * B)) if dec_flops_block else None,
        "encode_tflops_per_s": round(enc_flops_per_s / 1e12, 2),
        "decode_tflops_per_s": round(dec_flops_per_s / 1e12, 2),
        "encode_mfu_vs_bf16_peak": round(enc_mfu, 4) if enc_mfu is not None else None,
        "decode_mfu_vs_bf16_peak": round(dec_mfu, 4) if dec_mfu is not None else None,
        "fixed_decode_streams_per_chip": fixed_dec_streams,
        **fixed_extra,
    }))


if __name__ == "__main__":
    main()
