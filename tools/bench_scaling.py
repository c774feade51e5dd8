#!/usr/bin/env python3
"""Scaling benchmark: frames/s at 1 chip, 1 host, N hosts (BASELINE.md
north-star rows).

Emits one JSON line per topology row:
    {"metric": "encode_frames_per_s", "topology": "...", "value": ...,
     "streams": B, "efficiency_vs_1": ...}

Topologies:
  * `--chip`          one accelerator chip (the bench.py configuration);
  * `--hosts N`       an N-process jax.distributed CPU pod (4 devices per
                      process) — the DCN scale-out path. On real TPU pods
                      run the same script once per host with
                      JAX_COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID set
                      and it will measure over ICI+DCN instead.

The multi-host rows measure the true shard_map'd production path; on the
CPU emulation they validate scaling *mechanics* (efficiency should stay
near 1.0 since streams never communicate), while absolute numbers only
mean something on real hardware.
"""
from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _bench_mesh(frames: int, streams: int) -> float:
    """Encode `frames` frames of `streams` streams on the global mesh;
    returns aggregate frames/s (valid on process 0)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from audio_codec_tpu.config import Config
    from audio_codec_tpu.parallel import engine as pe
    from audio_codec_tpu.parallel import mesh as pm

    cfg = Config(fs_in=48000, bitrate=64000)
    mesh = pm.stream_mesh()
    enc = pe.ShardedEncoder(cfg, streams, mesh)
    rng = np.random.default_rng(0)
    pcm = pm.global_streams(mesh, (rng.standard_normal(
        (streams, cfg.frame_length)) * 3000.0).astype(np.float32))
    jax.block_until_ready(enc.step(pcm))  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(frames):
        out = enc.step(pcm)
    jax.block_until_ready(out)
    return frames * streams / (time.perf_counter() - t0)


def _worker(pid: int, nproc: int, port: int, frames: int, streams: int,
            dph: int, cores_per_host: int):
    # equal-resource emulation: every virtual host gets the same CPU-core
    # slice regardless of the row's host count, so efficiency_vs_1
    # measures sharding mechanics, not core oversubscription (round 4's
    # 2-host row ran 2 procs x 4 devices x multithreaded XLA on a 2-core
    # box and recorded 0.302 "efficiency" — that was contention)
    ncores = os.cpu_count() or 1
    cores = [(pid * cores_per_host + c) % ncores
             for c in range(cores_per_host)]
    try:
        os.sched_setaffinity(0, set(cores))
    except (AttributeError, OSError):
        pass
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={dph}").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    from audio_codec_tpu.parallel import mesh as pm
    pm.distributed_init(f"localhost:{port}", nproc, pid)
    fps = _bench_mesh(frames, streams)
    if pid == 0:
        print(json.dumps({"metric": "encode_frames_per_s",
                          "topology": f"{nproc}hosts(cpu-emu)",
                          "value": round(fps, 1), "streams": streams,
                          "devices_per_host": dph,
                          "cores_per_host": cores_per_host,
                          "host_cores_total": ncores,
                          "oversubscribed": nproc * cores_per_host > ncores}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chip", action="store_true", help="1-chip row")
    ap.add_argument("--hosts", type=int, nargs="*", default=None,
                    help="host counts for CPU-pod rows (default: 1 2)")
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--streams", type=int, default=256)
    ap.add_argument("--devices-per-host", type=int, default=None,
                    help="virtual devices per emulated host (default: "
                         "spread host cores across the largest row)")
    ap.add_argument("--_worker", type=int, default=None, help=argparse.SUPPRESS)
    ap.add_argument("--_nproc", type=int, default=None, help=argparse.SUPPRESS)
    ap.add_argument("--_port", type=int, default=None, help=argparse.SUPPRESS)
    ap.add_argument("--_dph", type=int, default=1, help=argparse.SUPPRESS)
    ap.add_argument("--_cph", type=int, default=1, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args._worker is not None:
        _worker(args._worker, args._nproc, args._port, args.frames,
                args.streams, args._dph, args._cph)
        return

    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        # real multi-host launch: one process per host, externally coordinated
        from audio_codec_tpu.parallel import mesh as pm
        pm.distributed_init()
        import jax
        fps = _bench_mesh(args.frames, args.streams)
        if jax.process_index() == 0:
            print(json.dumps({"metric": "encode_frames_per_s",
                              "topology": f"{jax.process_count()}hosts",
                              "value": round(fps, 1),
                              "streams": args.streams}))
        return

    if args.chip:
        import jax
        fps = None
        try:
            dev = jax.devices()[0]
            import numpy as np  # noqa: F401
            fps = _bench_single(args.frames, args.streams, dev)
        except Exception as e:  # no accelerator
            print(json.dumps({"metric": "encode_frames_per_s",
                              "topology": "1chip", "error": str(e)[:120]}))
        if fps is not None:
            print(json.dumps({"metric": "encode_frames_per_s",
                              "topology": "1chip", "value": round(fps, 1),
                              "streams": args.streams}))

    hosts_list = args.hosts if args.hosts else [1, 2]
    ncores = os.cpu_count() or 1
    cph = max(1, ncores // max(hosts_list))
    dph = args.devices_per_host or cph
    base = None
    for n in hosts_list:
        port = _free_port()
        procs = [subprocess.Popen(
            [sys.executable, __file__, f"--_worker={p}", f"--_nproc={n}",
             f"--_port={port}", f"--frames={args.frames}",
             f"--streams={args.streams}", f"--_dph={dph}",
             f"--_cph={cph}"],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
            cwd=REPO, env={**os.environ, "JAX_PLATFORMS": ""})
            for p in range(n)]
        outs = [p.communicate(timeout=1800)[0] for p in procs]
        for line in outs[0].splitlines():
            if line.startswith("{"):
                row = json.loads(line)
                if base is None:
                    base = row["value"] / n
                row["efficiency_vs_1"] = round(row["value"] / (n * base), 3)
                print(json.dumps(row))


def _bench_single(frames: int, streams: int, dev) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from audio_codec_tpu.config import Config
    from audio_codec_tpu.models import encoder, state as S

    cfg = Config(fs_in=48000, bitrate=64000)

    @jax.jit
    def step(st, pcm):
        st, out, _ = encoder.encode_frame(cfg, st, pcm)
        return st, out

    rng = np.random.default_rng(0)
    pcm = jax.device_put(jnp.asarray((rng.standard_normal(
        (streams, cfg.frame_length)) * 3000.0).astype(np.float32)), dev)
    st = jax.device_put(S.enc_state_init(cfg, streams), dev)
    st, out = step(st, pcm)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(frames):
        st, out = step(st, pcm)
    jax.block_until_ready(out)
    return frames * streams / (time.perf_counter() - t0)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


if __name__ == "__main__":
    main()
